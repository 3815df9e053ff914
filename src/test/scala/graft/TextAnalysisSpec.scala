package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Contract pins for the sequence-packing operator (the text-analysis
  * scalar operators are all oracle-gated; packing's invariants deserve
  * direct pins too). */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(n: Int): String = Seq.fill(n)("tok").mkString(" ")

  test("lmScore: per-doc mean unigram log-prob equals the in-JVM LM oracle") {
    val corpus = Seq(
      (1L, "a b a c"),
      (2L, "a a a"),
      (3L, "b c d d"))
    val docs = corpus.toDF("doc_id", "text")
    // independent oracle: the corpus-wide unigram distribution in plain Scala
    val toks = corpus.flatMap(_._2.split("\\s+"))
    val n = toks.size.toDouble
    val p = toks.groupBy(identity).map { case (t, xs) => t -> xs.size / n }
    val expect = corpus.map { case (id, text) =>
      val ts = text.split("\\s+").toSeq
      val avg = ts.map(t => math.log(p(t))).sum / ts.size
      (id, ts.size.toLong,
        BigDecimal(avg).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(-avg / math.log(2.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val got = graft.text.TextAnalysis.lmScore(docs, "doc_id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expect)
  }

  test("packBudgeted: chunker invariants — totals preserved, bounded overflow, dense packs") {
    val docs = Seq(
      (0L, "en", doc(10)), (1L, "en", doc(25)), (2L, "en", doc(5)),
      (3L, "en", doc(40)), (4L, "en", doc(3)),
      (5L, "de", doc(60)), (6L, "de", doc(2))).toDF("id", "lang", "text")
    val packs = TextAnalysis.packBudgeted(docs, "id", "text", "lang", budget = 32L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // token mass is partitioned, nothing dropped
    assert(packs.map(_._4).sum == 10 + 25 + 5 + 40 + 3 + 60 + 2)
    assert(packs.map(_._3).sum == 7)
    // pack indices dense from 0 within each group
    for ((g, rows) <- packs.groupBy(_._1))
      assert(rows.map(_._2).sorted.sameElements(0L until rows.length.toLong), s"group $g")
    // streaming-chunker bound: a pack exceeds the budget by at most the
    // doc that crossed the boundary (max doc here = 60)
    assert(packs.forall(_._4 <= 32 + 60))
  }

  test("packBudgeted: assignment follows the running total in id order") {
    val docs = Seq(
      (0L, "x", doc(30)), // cum-before 0  -> pack 0
      (1L, "x", doc(30)), // cum-before 30 -> pack 0 (overflows to 60)
      (2L, "x", doc(10)), // cum-before 60 -> pack 1
      (3L, "x", doc(1))   // cum-before 70 -> pack 2 (70/32 = 2)
    ).toDF("id", "lang", "text")
    val got = TextAnalysis.packBudgeted(docs, "id", "text", "lang", budget = 32L)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(0L -> (2L, 60L), 1L -> (1L, 10L), 2L -> (1L, 1L)))
  }

  test("winnow: a shared >= k+w-1 char substring guarantees >= 1 shared fingerprint") {
    val chunk = "quick brown foxes jump over seventeen lazy dogs" // 47 chars >= 23
    val rnd = new scala.util.Random(11)
    def filler(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq(
      (0L, filler(100) + " " + chunk + " " + filler(80)),
      (1L, filler(90) + " " + chunk + " " + filler(120)),
      (2L, filler(200))
    ).toDF("id", "text")
    val fps = TextAnalysis.winnow(docs, "id", "text")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    // the winnowing guarantee (Schleimer 2003): docs 0 and 1 share the chunk
    assert(fps(0L).intersect(fps(1L)).nonEmpty)
    // the random doc shares nothing with either (md5 8-gram collision ~ 0)
    assert(fps(2L).intersect(fps(0L)).isEmpty && fps(2L).intersect(fps(1L)).isEmpty)
    // density: selected fingerprints are a strict subset of the gram count
    docs.collect().foreach { r =>
      val n = r.getString(1).toLowerCase.replaceAll("\\s+", " ").trim.length - 7
      assert(fps(r.getLong(0)).size < n)
    }
  }

  /** The pre-r8 window formulation, kept as the differential reference for
    * the fused-expression + chunking rework: explode every gram, md5 it,
    * min per sliding window of w rows, distinct. */
  private def winnowReference(docs: org.apache.spark.sql.DataFrame,
                              k: Int = 8, w: Int = 16): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = docs.select(col("id").cast("long").as("id"),
        TextAnalysis.normalized(col("text")).as("__nt"))
      .where(length(col("__nt")) >= k + w - 1)
    val grams = base
      .select(col("id"), (length(col("__nt")) - (k - 1)).as("__ngrams"),
        explode(sequence(lit(1), length(col("__nt")) - (k - 1))).as("i"),
        col("__nt"))
      .select(col("id"), col("__ngrams"), col("i"),
        md5(expr(s"substring(__nt, i, $k)")).as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("i"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    grams.select(col("id"), col("i"), col("__ngrams"),
        min(col("h")).over(win).as("fp"))
      .where(col("i") <= col("__ngrams") - (w - 1))
      .select(col("id"), col("fp")).distinct()
  }

  /** Independent in-JVM winnow (plain loops, O(n·w)) — the differential
    * oracle for documents too large for [[winnowReference]], whose
    * explode carries the full text on every gram row (a multi-MB doc
    * explodes to terabytes of row data there — the very pathology the
    * chunked plan removes). */
  private def localWinnow(text: String, k: Int = 8, w: Int = 16): Set[String] = {
    val nt = text.trim.toLowerCase.replaceAll("\\s+", " ")
    if (nt.length < k + w - 1) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = Array.tabulate(nt.length - k + 1) { i =>
      md.digest(nt.substring(i, i + k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    (0 to grams.length - w).map(i => (i until i + w).map(grams(_)).min).toSet
  }

  test("winnow: chunked fused plan ≡ window-formulation reference (multi-chunk + multi-MB doc)") {
    val rnd = new scala.util.Random(17)
    def filler(n: Int) = Seq.fill(n)(if (rnd.nextInt(7) == 0) ' '
      else ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = "a boilerplate chunk every document quotes verbatim at least once"
    // sizes straddle the test chunk width (1000) so seams are exercised:
    // below, exactly at, one-over, and many-chunk; plus repeated text so
    // cross-chunk duplicate fingerprints exist
    val bigBlock = filler(4000) + shared
    val docs = Seq(
      (0L, filler(120) + shared),
      (1L, filler(1000 + 8 + 16 - 2)), // exactly one full chunk of window starts
      (2L, filler(1001 + 8 + 16 - 2)), // one window start into chunk 2
      (3L, (bigBlock * 3) + filler(537)),
      (4L, "short")
    ).toDF("id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val got = asMap(TextAnalysis.winnow(docs, "id", "text", chunkChars = 1000))
    val gotDefault = asMap(TextAnalysis.winnow(docs, "id", "text"))
    val ref = asMap(winnowReference(docs))
    assert(got == ref)        // chunk width 1000: many seams
    assert(gotDefault == ref) // default 64 KB chunks
    assert(!ref.contains(4L)) // sub-window doc yields nothing
  }

  test("winnow: multi-MB document ≡ independent in-JVM oracle, spread over many chunk tasks") {
    val rnd = new scala.util.Random(19)
    def filler(n: Int) = Seq.fill(n)(if (rnd.nextInt(7) == 0) ' '
      else ('a' + rnd.nextInt(26)).toChar).mkString
    val big = Seq.fill(600)(filler(4000)).mkString(" ") // ~2.4 MB, one doc
    val docs = Seq((9L, big)).toDF("id", "text")
    val winnowed = TextAnalysis.winnow(docs, "id", "text")
    // the skew guard: the single doc fans out to > 30 chunk rows at the
    // default 64 KB width, so no one task owns the whole document
    val expectChunks = (big.length - (8 + 16 - 1)) / (1 << 16) + 1
    assert(expectChunks > 30)
    val got = winnowed.collect().map(_.getString(1)).toSet
    assert(got == localWinnow(big))
  }

  test("containmentPairs: shared-count semantics and the boilerplate dfCap guard") {
    val chunk = "quick brown foxes jump over seventeen lazy dogs again and again"
    val rnd = new scala.util.Random(13)
    def filler(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq(
      (0L, filler(60) + " " + chunk),
      (1L, chunk + " " + filler(70)),
      (2L, filler(150))
    ).toDF("id", "text")
    val fps = TextAnalysis.winnow(docs, "id", "text")
    val pairs = TextAnalysis.containmentPairs(fps, minShared = 1, dfCap = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
    // dfCap = 0 drops EVERY fingerprint -> the guard kills all pairs
    assert(TextAnalysis.containmentPairs(fps, minShared = 1, dfCap = 0).isEmpty)
  }

  test("containmentIncremental == full pairs restricted to max-id-in-batch (differential)") {
    val chunk = "quick brown foxes jump over seventeen lazy dogs again and again"
    val rnd = new scala.util.Random(17)
    def filler(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    // ids 0..5 corpus, 6..9 batch; chunk shared across both sides
    val docs = (0L to 9L).map { i =>
      (i, if (i % 3 == 0) filler(50) + " " + chunk + " " + filler(40)
          else filler(120))
    }.toDF("id", "text")
    val fps = TextAnalysis.winnow(docs, "id", "text")
    val cut = 6L
    val inc = TextAnalysis.containmentIncremental(
        fps.where(col("id") < cut), fps.where(col("id") >= cut),
        minShared = 1, dfCap = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = TextAnalysis.containmentPairs(fps, minShared = 1, dfCap = 20)
      .where(col("b") >= cut)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == full && inc.nonEmpty)
  }

  test("repetition: fused expression ≡ the explode-chain reference formula") {
    // hand cases: all-distinct grams, one dominating gram, sub-n doc (drop),
    // null text (drop), repeated-whitespace tokenization
    val rnd = new scala.util.Random(11)
    val vocab = Array("a", "b", "c", "dd", "eee")
    val randomDocs = (10L to 60L).map(id =>
      (id, Seq.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val docs = (Seq(
      (0L, "w x y z"),                        // 2 distinct 3-grams, all c=1
      (1L, "a a a a a a"),                    // one gram "a a a" with c=4
      (2L, "one  two\tthree   one two three"),// whitespace runs collapse
      (3L, "just two"),                       // < 3 tokens — dropped
      (4L, null.asInstanceOf[String])         // null — dropped
    ) ++ randomDocs).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // reference: the pre-r11 chain's arithmetic in plain Scala
    val expect = (Seq((0L, "w x y z"), (1L, "a a a a a a"),
        (2L, "one  two\tthree   one two three")) ++ randomDocs).map { case (id, text) =>
      val ts = text.trim.split("\\s+").filter(_.nonEmpty)
      val grams = ts.sliding(3).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
      def r4(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> ((grams.size.toLong,
        r4(1.0 - counts.size.toDouble / grams.size),
        r4(counts.values.max.toDouble / grams.size)))
    }.toMap
    assert(got == expect)
    assert(!got.contains(3L) && !got.contains(4L))
  }

  test("repetition plans shuffle-free — no exchange, no explode rows") {
    val docs = Seq((0L, "p q r s t")).toDF("doc_id", "text")
    val p = TextAnalysis.repetition(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Generate"),
      s"repetition regressed to the explode+shuffle chain:\n$p")
  }

  test("Grams.tokens == the Catalyst tokenize expression on adversarial whitespace") {
    // the one-source-of-truth claim (round 11) holds only if the JVM
    // kernel and the Column expression agree on every edge: leading /
    // trailing runs, tabs, newlines, empty and all-whitespace strings
    val rnd = new scala.util.Random(23)
    val ws = Array(" ", "  ", "\t", "\n", " \t ")
    val words = Array("a", "bb", "x1", "Ж", "c-d")
    val cases = Seq("", " ", "\t\n", "a", " a ", "a  b", "\ta b\nc ") ++
      (1 to 60).map { _ =>
        val n = rnd.nextInt(8)
        (0 until n).map(_ => ws(rnd.nextInt(ws.length)) + words(rnd.nextInt(words.length)))
          .mkString + (if (rnd.nextBoolean()) ws(rnd.nextInt(ws.length)) else "")
      }
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val sparkSide = df.select(col("id"), graft.text.BM25.tokenize(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(graft.expr.Grams.tokens(t).toList == sparkSide(i.toLong),
        s"case ${i}: ${t.map(_.toInt).mkString(",")}")
    }
  }

  test("decontaminate: distinct shared n-grams per training doc, clean docs absent") {
    val corpus = Seq(
      (10L, "a b c d x y z w"),       // shares "a b c d" once
      (11L, "a b c d e f g h q"),     // shares "a b c d", "b c d e", ... (5 grams)
      (12L, "p q r s t u v"),         // clean
      (13L, "a b c d a b c d e")      // duplicated gram counts ONCE (distinct)
    ).toDF("doc_id", "text")
    val test = Seq((0L, "a b c d e f g h")).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(corpus, "doc_id", "text", test, "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // test grams: {a b c d, b c d e, c d e f, d e f g, e f g h}
    assert(got == Map(10L -> 1L, 11L -> 5L, 13L -> 2L))
  }

  test("decontaminate plans a broadcast join — the corpus is never shuffled by gram") {
    val corpus = Seq((10L, "a b c d x")).toDF("doc_id", "text")
    val test = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val p = TextAnalysis.decontaminate(corpus, "doc_id", "text", test, "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"decontaminate's gram join must broadcast the test side:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus grams re-shuffled by the test join:\n$p")
  }

  test("decontaminateRows (streaming kernel) == decontaminate (relational) on random docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Array("a", "b", "c", "d", "e", "f")
    def txt() = Seq.fill(2 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val corpus = (100L to 160L).map(id => (id, txt())).toDF("doc_id", "text")
    val test = (0L to 5L).map(id => (id, txt())).toDF("doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rel = m(TextAnalysis.decontaminate(corpus, "doc_id", "text", test, "text", n = 3))
    val row = m(TextAnalysis.decontaminateRows(corpus, "doc_id", "text", test, "text", n = 3))
    assert(rel == row && rel.nonEmpty)
  }

  test("containment joins are equi-joins on fp — never a cartesian") {
    val docs = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("id", "text")
    val fps = TextAnalysis.winnow(docs, "id", "text")
    for (plan <- Seq(
        TextAnalysis.containmentPairs(fps, minShared = 1),
        TextAnalysis.containmentIncremental(
          fps.where(col("id") < 1), fps.where(col("id") >= 1), minShared = 1))) {
      val p = plan.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"containment plan degenerated to a cross product:\n$p")
    }
  }
}
