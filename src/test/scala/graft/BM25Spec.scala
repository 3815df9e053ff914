package graft

import graft.text.BM25
import org.scalatest.funsuite.AnyFunSuite

/** BM25 vs an independent naive reimplementation of rank_bm25.BM25Okapi
  * (k1=1.5, b=0.75, epsilon=0.25, epsilon-floored idf). */
class BM25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 'the' appears in 4/5 docs → negative raw idf → exercises the eps floor.
  private val corpus = Seq(
    0L -> "the cat sat on the mat",
    1L -> "the dog barked at the cat",
    2L -> "the quick brown fox",
    3L -> "lorem ipsum dolor sit amet",
    4L -> "the cat and the dog")

  /** Naive driver-side BM25Okapi. */
  private def naiveScores(query: String): Map[Long, Double] = {
    val docs = corpus.map { case (id, t) => id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum / n
    val df = docs.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val rawIdf = df.view.mapValues(d => math.log((n - d + 0.5) / (d + 0.5))).toMap
    val avgIdf = rawIdf.values.sum / rawIdf.size
    val idf = rawIdf.view.mapValues(v => if (v < 0) 0.25 * avgIdf else v).toMap
    val qts = query.trim.split("\\s+").filter(_.nonEmpty)
    docs.map { case (id, toks) =>
      val dl = toks.size.toDouble
      id -> qts.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0 || !idf.contains(t)) 0.0
        else idf(t) * tf * 2.5 / (tf + 1.5 * (0.25 + 0.75 * dl / avgdl))
      }.sum
    }.toMap
  }

  private lazy val index = BM25.build(corpus.toDF("id", "doc"), "id", "doc")

  private def check(query: String): Unit = {
    val got = index.score(query).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = naiveScores(query)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) => assert(math.abs(s - want(id)) < 1e-12, s"id=$id got=$s want=${want(id)}") }
  }

  test("scores match naive rank_bm25 (common term, eps floor)") { check("the cat") }
  test("scores match naive (rare terms)") { check("lorem fox") }
  test("query-term multiplicity multiplies contribution") { check("cat cat dog") }
  test("no overlapping terms -> all zero but dense") {
    val got = index.score("zzz qqq").collect()
    assert(got.length == 5 && got.forall(_.getDouble(1) == 0.0))
  }
  test("corpus stats") {
    assert(index.n == 5)
    assert(math.abs(index.avgdl - corpus.map(_._2.split(" ").length).sum / 5.0) < 1e-12)
  }
  test("empty corpus raises on score") {
    val empty = BM25.build(Seq.empty[(Long, String)].toDF("id", "doc"), "id", "doc")
    intercept[IllegalStateException](empty.score("x"))
  }
  test("docs with empty text still rankable at score 0") {
    // 3 docs so the matched term has positive idf (n=2,df=1 → idf=ln(1)=0,
    // which rank_bm25 also scores 0 — not what this test is pinning)
    val idx = BM25.build(
      Seq(0L -> "alpha beta", 1L -> "   ", 2L -> "gamma delta").toDF("id", "doc"), "id", "doc")
    val got = idx.score("alpha").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(0L, 1L, 2L) && got(1L) == 0.0 && got(2L) == 0.0 && got(0L) > 0)
  }

  test("scoreBatchTopK: one-query batch equals the dense score()'s top-k matched docs") {
    import spark.implicits._
    val idx = BM25.build(corpus.toDF("id", "doc"), "id", "doc")
    val q = "cat dog"
    // the heap operator returns the top-k SET unordered; callers sort
    val batch = idx.scoreBatchTopK(Seq(7L -> q), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy { case (_, id, sc) => (-sc, id) }
    val dense = idx.score(q)
      .where(org.apache.spark.sql.functions.col("score") =!= 0.0)
      .orderBy(org.apache.spark.sql.functions.col("score").desc,
        org.apache.spark.sql.functions.col("id").asc)
      .limit(3).collect().map(r => (7L, r.getLong(0), r.getDouble(1))).toSeq
    assert(batch == dense)
    assert(batch.nonEmpty)
  }

  test("scoreBatchTopKFrames: the distributed query side matches the Seq path row for row") {
    import spark.implicits._
    val idx = BM25.build(corpus.toDF("id", "doc"), "id", "doc")
    val qs = Seq(1L -> "the cat", 2L -> "lorem fox dog", 3L -> "cat cat dog",
      4L -> "zzz unseen terms only")
    def norm(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 1e9 + 0.5) / 1e9)).toSeq
        .sortBy { case (q, id, sc) => (q, -sc, id) }
    val seqPath = norm(idx.scoreBatchTopK(qs, k = 2))
    val framePath = norm(idx.scoreBatchTopKFrames(qs.toDF("qid", "text"), "qid", "text", k = 2))
    assert(framePath == seqPath)
    assert(framePath.nonEmpty)
  }
}
