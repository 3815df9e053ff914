package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (0L until 300L).map(i => (i, s"s${(i % 3)}"))
    .toDF("id", "stratum")

  test("stratified takes exactly n per stratum, deterministically") {
    val s1 = Sampling.stratified(df, "stratum", "id", 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val s2 = Sampling.stratified(df, "stratum", "id", 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.sorted.sameElements(s2.sorted)) // stable under re-runs
    val perStratum = s1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perStratum == Map("s0" -> 10, "s1" -> 10, "s2" -> 10))
    // the draw is the n smallest md5(id) per stratum — check one stratum
    // against a driver-side recomputation
    val expected = (0L until 300L).filter(_ % 3 == 0)
      .sortBy(i => org.apache.spark.unsafe.types.UTF8String.fromString(
        java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString))
      .take(10).toSet
    assert(s1.filter(_._2 == "s0").map(_._1).toSet == expected)
  }

  test("stratified shrinks to the stratum size when it is below n") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "stratum")
    val s = Sampling.stratified(tiny, "stratum", "id", 10).collect()
    assert(s.length == 3)
  }

  test("stratified plans the bounded-heap operator, not a window sort") {
    val p = Sampling.stratified(df, "stratum", "id", 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"expected TopKPerKeyExec in plan:\n$p")
    assert(!p.contains("Window"), s"window formulation leaked into plan:\n$p")
  }

  test("byHash is deterministic, ~fraction-sized, and monotone in fraction") {
    val h10 = Sampling.byHash(df, "id", 0.10).collect().map(_.getLong(0)).toSet
    val h05 = Sampling.byHash(df, "id", 0.05).collect().map(_.getLong(0)).toSet
    assert(h05.subsetOf(h10)) // threshold draw: smaller fraction nests in larger
    assert(Sampling.byHash(df, "id", 0.10).collect().map(_.getLong(0)).toSet == h10)
    assert(h10.size > 10 && h10.size < 60) // 300 rows at 10%: loose 4-sigma band
    assert(Sampling.byHash(df, "id", 0.0).count() == 0)
    assert(Sampling.byHash(df, "id", 1.0).count() == 300)
  }
}
