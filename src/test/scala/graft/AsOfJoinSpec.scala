package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("latest preceding build row per key; <= semantics; no-match dropped") {
    import spark.implicits._
    val build = Seq(
      (1L, 10L, "b10"), (1L, 20L, "b20"), (1L, 30L, "b30"),
      (2L, 100L, "b100")).toDF("k", "ts", "bval")
    val probe = Seq(
      (1L, 25L, "p25"),   // -> b20
      (1L, 20L, "p20"),   // equal ts -> b20 (<= semantics)
      (1L, 5L, "p5"),     // before any build -> dropped
      (2L, 100L, "p100"), // -> b100
      (3L, 50L, "p50"))   // key with no build rows -> dropped
      .toDF("k", "ts", "pval")
    val got = AsOfJoin.asOf(build, probe, Seq("k"), "ts", Seq("bval"))
      .collect().map(r => (r.getAs[String]("pval"), r.getAs[String]("bval"))).toMap
    assert(got == Map("p25" -> "b20", "p20" -> "b20", "p100" -> "b100"))
  }

  test("multiple carried columns stay from the SAME build row") {
    import spark.implicits._
    val build = Seq((1L, 10L, "x", 100.0), (1L, 20L, "y", 200.0))
      .toDF("k", "ts", "name", "amt")
    val probe = Seq((1L, 15L, 7L), (1L, 99L, 8L)).toDF("k", "ts", "pid")
    val got = AsOfJoin.asOf(build, probe, Seq("k"), "ts", Seq("name", "amt"))
      .collect().map(r => r.getAs[Long]("pid") -> (r.getAs[String]("name"), r.getAs[Double]("amt"))).toMap
    assert(got == Map(7L -> ("x", 100.0), 8L -> ("y", 200.0)))
  }

  test("plan has one shuffle (window) and no join node") {
    import spark.implicits._
    val build = Seq((1L, 10L, "a")).toDF("k", "ts", "bval")
    val probe = Seq((1L, 20L, "p")).toDF("k", "ts", "pval")
    val plan = AsOfJoin.asOf(build, probe, Seq("k"), "ts", Seq("bval"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"range-join-free expected:\n$plan")
    assert(plan.contains("Window"), plan)
  }
}
