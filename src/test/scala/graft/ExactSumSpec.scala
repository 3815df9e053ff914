package graft

import graft.expr.ExactSum
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Differential pins for the LONG-cents fast path (r5 VERDICT #2): every
  * ExactSum form must equal its decimal formulation VALUE-for-value —
  * same DECIMAL(28,6) result, so downstream round/divide ties cannot
  * diverge from the (unchanged) DuckDB oracles.
  */
class ExactSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("centsSum output type is the decimal sum's DECIMAL(28,6)") {
    val df = Seq(1.23, 4.56).toDF("v")
    val t = df.agg(ExactSum.centsSum(col("v"))).schema.head.dataType
    assert(t == DecimalType(28, 6))
  }

  test("centsSum == sum(decimal(18,6)) on events.value, grouped") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val rows = ev.groupBy(col("user_id"))
      .agg(ExactSum.centsSum(col("value")).as("fast"),
        sum(col("value").cast("decimal(18,6)")).as("slow"))
      .where(col("fast") =!= col("slow"))
    assert(rows.count() == 0)
  }

  test("revenue/product myriads == decimal formulation on lineitem") {
    val l = graft.sources.Tables.parquet(spark, sfDir, "lineitem")
    val d = (c: String) => col(c).cast("decimal(18,6)")
    val rows = l.groupBy(col("l_returnflag"))
      .agg(
        ExactSum.revenueSum(col("l_extendedprice"), col("l_discount")).as("rf"),
        sum((d("l_extendedprice") * (lit(java.math.BigDecimal.ONE).cast("decimal(18,6)") -
          d("l_discount"))).cast("decimal(18,6)")).as("rs"),
        ExactSum.productSum(col("l_extendedprice"), col("l_discount")).as("pf"),
        sum((d("l_extendedprice") * d("l_discount")).cast("decimal(18,6)")).as("ps"))
      .where(col("rf") =!= col("rs") || col("pf") =!= col("ps"))
    assert(rows.count() == 0)
  }

  test("round() guards the binary-double cents cast (8.62*100 = 861.999…)") {
    val df = Seq(8.62, 0.29, 1.15, -3.07).toDF("v")
    val got = df.agg(ExactSum.centsSum(col("v")).cast("string")).head().getString(0)
    assert(got == "6.990000")
  }
}
