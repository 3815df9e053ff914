package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based differential: for arbitrary equal-length float vectors
  * (including zeros, subnormals-adjacent magnitudes, empties), the fused
  * codegen expressions and the interpreted HOF builtins are BIT-equal
  * (same left-to-right double fold). Length-mismatch semantics diverge by
  * design (HOF null-pads; codegen folds the common prefix) and are excluded.
  */
class VectorExprPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val finiteFloat: Gen[Float] =
    Gen.chooseNum(-1e6f, 1e6f, 0f, 1f, -1f, 1e-6f)

  private def vecPair: Gen[(List[Float], List[Float])] = for {
    n <- Gen.chooseNum(0, 48)
    a <- Gen.listOfN(n, finiteFloat)
    b <- Gen.listOfN(n, finiteFloat)
  } yield (a, b)

  test("WordShingles == tokenize-then-slide reference over arbitrary text (incl. unicode ws)") {
    import spark.implicits._
    // characters chosen to stress the tokenizer contract: ASCII words,
    // whitespace runs (\t, \n, \r, form feed, vertical tab — all in Java
    // regex \s), unicode letters, and NBSP (\u00A0 — NOT \s, must stay
    // inside a token on both paths)
    val ch: Gen[Char] = Gen.frequency(
      6 -> Gen.alphaNumChar, 3 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B'),
      1 -> Gen.oneOf('é', 'ß', '中', '\u00A0', '-', '.'))
    val txt: Gen[String] = Gen.chooseNum(0, 80).flatMap(n => Gen.stringOfN(n, ch))
    val texts = Gen.listOfN(150, txt).sample.get
    // two INDEPENDENT implementations: the plain-Scala sliding-window
    // reference and the original Spark HOF chain (split → filter →
    // transform(sequence) → array_distinct) the fused expression replaced
    def reference(s: String, n: Int): Seq[String] =
      s.split("\\s+").filter(_.nonEmpty).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq.distinct
    for (n <- Seq(1, 2, 3)) {
      val t = graft.text.BM25.tokenize(col("text"))
      val hof = when(size(t) >= n,
        array_distinct(graft.dedup.Dedup.ngrams(t, n)))
        .otherwise(array().cast("array<string>"))
      val got = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "text")
        .select(col("id"),
          graft.expr.TextExpr.wordShingles(col("text"), n).as("g"),
          hof.as("h"))
        .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[String](2))).toMap
      texts.zipWithIndex.foreach { case (s, i) =>
        val (fused, viaHof) = got(i.toLong)
        val want = reference(s, n)
        val hex = s.map(c => f"\\u${c.toInt}%04x").mkString
        assert(fused == want, s"fused vs scala: n=$n text=$hex")
        assert(viaHof == want, s"hof vs scala: n=$n text=$hex")
      }
    }
  }

  test("codegen == HOF for squaredL2/dot/cosine over arbitrary vectors") {
    import spark.implicits._
    val pairs = Gen.listOfN(120, vecPair).sample.get
    val df = pairs.toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
      .cache()
    val rows = df.select(
      squaredL2(col("a"), col("b")), squaredL2Hof(col("a"), col("b")),
      dot(col("a"), col("b")), dotHof(col("a"), col("b"))).collect()
    def same(r: org.apache.spark.sql.Row, i: Int, j: Int): Boolean = {
      val (x, y) = (r.getDouble(i), r.getDouble(j))
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y) ||
        (x.isNaN && y.isNaN)
    }
    rows.foreach(r => assert(same(r, 0, 1) && same(r, 2, 3), r.toString))
    // cosine only over nonzero-norm pairs: the HOF form's Divide THROWS on
    // 0/0 under Spark 4 ANSI mode, while the fused expression yields NaN
    // (numpy-like). Real collections never hold zero vectors; the engine's
    // behavior there is pinned in VectorFunctionsSpec instead.
    val nz = df.where(dot(col("a"), col("a")) > 0 && dot(col("b"), col("b")) > 0)
    val cosRows = nz.select(cosine(col("a"), col("b")), cosineHof(col("a"), col("b"))).collect()
    assert(cosRows.nonEmpty)
    cosRows.foreach(r => assert(same(r, 0, 1), r.toString))
  }

  test("NearestCentroid codegen == driver-side argmin for arbitrary vectors") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(5)
    val centroids = Array.fill(6)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val vecs = (0 until 200).map(i => i -> Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    val got = vecs.toDF("i", "v")
      .select(col("i"), graft.expr.VectorExpr.nearestCentroid(col("v"), centroids).as("c"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    vecs.foreach { case (i, v) =>
      val d = v.map(_.toDouble).toArray
      val want = centroids.zipWithIndex.map { case (cen, c) =>
        (cen.zip(d).map { case (x, y) => (y - x) * (y - x) }.sum, c)
      }.minBy(t => (t._1, t._2))._2
      assert(got(i) == want, s"vec $i")
    }
  }
}
