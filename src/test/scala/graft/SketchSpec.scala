package graft

import graft.expr.SketchAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMinValues (KMV distinct-count sketch) + the gates built on the
  * two-stage aggregation patterns (approx_distinct_kmv, skew_distinct). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("kminValues returns the k smallest distinct values, deduped and sorted") {
    val df = Seq("d", "b", "a", "c", "b", "a", "e").toDF("v")
      .repartition(4) // force partial buffers + merge
    val out = df.agg(SketchAgg.kminValues(col("v"), 3).as("ks"))
      .head().getSeq[String](0)
    assert(out == Seq("a", "b", "c"))
  }

  test("kminValues with fewer distinct values than k returns them all") {
    val out = Seq("b", "a", "b").toDF("v")
      .agg(SketchAgg.kminValues(col("v"), 10).as("ks"))
      .head().getSeq[String](0)
    assert(out == Seq("a", "b"))
  }

  test("kminValues ignores nulls and keeps grouping independent") {
    val df = Seq(("g1", Some("x")), ("g1", None), ("g1", Some("a")),
      ("g2", Some("z"))).toDF("g", "v")
    val out = df.groupBy($"g").agg(SketchAgg.kminValues(col("v"), 2).as("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("g1") == Seq("a", "x"))
    assert(out("g2") == Seq("z"))
  }

  test("kminValues equals the k-prefix of the full distinct sort (differential)") {
    // md5 hashes of ids: a realistic uniform-hash input, many partitions
    val df = spark.range(0, 5000, 1, 16).select(md5($"id".cast("string")).as("h"))
    val viaSketch = df.agg(SketchAgg.kminValues(col("h"), 64)).head().getSeq[String](0)
    val viaSort = df.distinct().orderBy($"h").limit(64).collect().map(_.getString(0)).toSeq
    assert(viaSketch == viaSort)
  }

  test("approx_distinct_kmv: estimate within KMV error bounds of exact") {
    val rows = SparkEntry.queries("approx_distinct_kmv")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("est_kmv")
      // KMV rse ~ 1/sqrt(k-2) ≈ 12.7% at k=64; allow 4 sigma
      assert(math.abs(est - exact) / exact < 0.51,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("skew_distinct: salted two-stage equals naive countDistinct") {
    val out = SparkEntry.queries("skew_distinct")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val naive = graft.sources.Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"), count(lit(1)).as("n"))
      .orderBy($"event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.sameElements(naive))
  }

  test("approx_percentile stays inside the exact q45–q55 band (production quantile path)") {
    // events_quantiles gates EXACT per-group percentiles (O(group) agg
    // state — what the oracle needs); the 100 TB path is approx_percentile
    // (bounded GK sketch state). Pin the approximate median between the
    // exact 45th and 55th percentiles per group.
    import org.apache.spark.sql.functions.{percentile_approx => pa}
    val rows = graft.sources.Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(percentile($"value", lit(0.45)).as("lo"),
        percentile($"value", lit(0.55)).as("hi"),
        pa($"value", lit(0.5), lit(1000)).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, ap) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(ap >= lo && ap <= hi, s"${r.getString(0)}: $ap outside [$lo, $hi]")
    }
  }

  test("sql_knn through the FunctionRegistry equals the DataFrame-path knn_l2") {
    val viaSql = SparkEntry.queries("sql_knn")(spark, sfDir).collect().toSeq
    val viaDf = SparkEntry.queries("knn_l2")(spark, sfDir).collect().toSeq
    assert(viaSql == viaDf)
  }

  test("kminValues orders by UTF-8 binary order, matching Spark's min/sort_array") {
    // U+FFFF (UTF-8: EF BF BF) sorts BELOW U+10000 (F0 90 80 80) in binary
    // UTF-8 order, but a UTF-16 code-unit compare would invert them
    // (surrogate 0xD800 < 0xFFFF)
    val df = Seq("\uFFFF", new String(Character.toChars(0x10000))).toDF("v")
    val viaSketch = df.agg(SketchAgg.kminValues(col("v"), 1)).head().getSeq[String](0)
    val viaMin = df.agg(min(col("v"))).head().getString(0)
    assert(viaSketch == Seq(viaMin))
    assert(viaMin == "\uFFFF")
  }

  test("property: kminValues == sorted distinct prefix over arbitrary string multisets") {
    import org.scalacheck.Gen
    val strGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("", "a", "\u00e9\u00e9", "\uFFFF", new String(Character.toChars(0x10000))))
    val caseGen = for {
      n <- Gen.chooseNum(0, 60)
      vs <- Gen.listOfN(n, strGen)
      k <- Gen.chooseNum(1, 8)
    } yield (vs, k)
    val cases = Gen.listOfN(40, caseGen).sample.get
    cases.zipWithIndex.foreach { case ((vs, k), i) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vs.map(org.apache.spark.sql.Row(_)), 4),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
      val got = df.agg(SketchAgg.kminValues(col("v"), k)).head().getSeq[String](0)
      // reference: Spark's own sort order via sort_array over the distinct set
      val want = df.distinct().agg(sort_array(collect_list(col("v"))))
        .head().getSeq[String](0).take(k)
      assert(got == want, s"case $i: vs=$vs k=$k got=$got want=$want")
    }
  }
}
