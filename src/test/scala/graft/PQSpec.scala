package graft

import graft.vector.{ExactKNN, PQIndex}
import org.scalatest.funsuite.AnyFunSuite

/** PQ/ADC recall pins — like the reference, approximate indexes are judged
  * on behavior (recall vs exact), never on fixed result contents. */
class PQSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
  private lazy val pq = PQIndex.build(emb, "vec_id", "embedding", dim = 64, m = 16)

  private def queryVec(id: Long): Array[Double] =
    emb.where(emb("vec_id") === id).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray

  test("codes are m bytes per vector, all within codebook range") {
    val rows = pq.codes.collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 16 && cs.forall(c => c >= 0 && c < 256))
    }
  }

  test("ADC recall@10 >= 0.5 vs exact, averaged over 10 queries") {
    val recalls = (0L until 10L).map { i =>
      val q = queryVec(i * 11)
      val exact = ExactKNN.topK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val approx = pq.search(q, 10).collect().map(_.getLong(0)).toSet
      (exact intersect approx).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean ADC recall@10 = $mean (per-query: $recalls)")
  }

  test("the query's own vector ranks first under ADC") {
    // self-distance in ADC is the quantization error — smallest by a margin
    val r = pq.search(queryVec(42), 3).collect()
    assert(r.head.getLong(0) == 42L)
  }

  test("searchBatch: the distributed ADC join matches the per-query driver-table path") {
    import org.apache.spark.sql.functions.col
    val qids = Seq(5L, 42L, 99L)
    val queries = emb.where(col("vec_id").isin(qids.map(Long.box): _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = pq.searchBatch(queries, "qid", "qv", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 1e9 + 0.5) / 1e9)).toSeq
    val single = qids.flatMap { qid =>
      pq.search(queryVec(qid), 4).collect()
        .map(r => (qid, r.getLong(0), math.floor(r.getDouble(1) * 1e9 + 0.5) / 1e9))
    }.sortBy { case (q, id, sc) => (q, -sc, id) }
    assert(batch == single)
  }

  test("anchor-codebook build: codes bounded by anchor count, deterministic") {
    import org.apache.spark.sql.functions.col
    val anchored = PQIndex.buildFromAnchors(emb, "vec_id", "embedding",
      dim = 64, m = 8, anchorFilter = col("vec_id") < 16)
    val rows = anchored.codes.collect()
    assert(rows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 16)))
    val a = anchored.search(queryVec(7), 10).collect().map(_.getLong(0))
    val again = PQIndex.buildFromAnchors(emb, "vec_id", "embedding",
      dim = 64, m = 8, anchorFilter = col("vec_id") < 16)
      .search(queryVec(7), 10).collect().map(_.getLong(0))
    assert(a.sameElements(again))
  }

  test("search restricted to a candidate set never returns outside it") {
    import org.apache.spark.sql.functions.col
    val cand = emb.select(col("vec_id").as("id")).where(col("id") < 100)
    val r = pq.search(queryVec(7), 10, among = Some(cand)).collect().map(_.getLong(0))
    assert(r.nonEmpty && r.forall(_ < 100))
  }

  test("save/load roundtrip preserves codebooks and ADC results") {
    val path = java.nio.file.Files.createTempDirectory("graftpq").toString
    PQIndex.save(pq, path)
    val loaded = PQIndex.load(spark, path)
    assert(loaded.dim == pq.dim && loaded.m == pq.m)
    val q = queryVec(13)
    val a = pq.search(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = loaded.search(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.sameElements(b))
  }
}
