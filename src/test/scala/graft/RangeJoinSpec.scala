package graft

import java.sql.Timestamp
import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval join: window inclusion, exact boundaries, key isolation") {
    import spark.implicits._
    val l = Seq(
      (1L, ts("2026-01-01 12:00:00"), "p1"),
      (2L, ts("2026-01-01 12:00:00"), "p2"))
      .toDF("k", "lts", "lid")
    val r = Seq(
      (1L, ts("2026-01-01 11:00:00"), "exactly -1h"),   // = lower bound, in
      (1L, ts("2026-01-01 10:59:59"), "before window"), // out
      (1L, ts("2026-01-01 11:30:00"), "inside"),        // in
      (1L, ts("2026-01-01 12:00:00"), "equal"),         // = upper bound, in
      (1L, ts("2026-01-01 12:00:01"), "after"),         // out
      (2L, ts("2026-01-01 11:45:00"), "other key"),     // in, only for k=2
      (3L, ts("2026-01-01 11:45:00"), "no left key"))   // dropped
      .toDF("k", "rts", "rid")
    val j = RangeJoin.preceding(l, r, Seq("k"), "lts", "rts",
        beforeUs = 3600L * 1000000L)
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(j == Set(
      ("p1", "exactly -1h"), ("p1", "inside"), ("p1", "equal"),
      ("p2", "other key")))
  }

  test("bucketed candidates match the naive range predicate on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val base = Timestamp.valueOf("2026-03-01 00:00:00").getTime
    def t(): Timestamp = new Timestamp(base + rnd.nextInt(7200) * 1000L)
    val l = (0 until 60).map(i => (rnd.nextInt(4).toLong, t(), i.toLong)).toDF("k", "lts", "lid")
    val r = (0 until 200).map(i => (rnd.nextInt(4).toLong, t(), i.toLong)).toDF("k", "rts", "rid")
    val beforeUs = 600L * 1000000L
    val afterUs = 300L * 1000000L
    val fast = RangeJoin.interval(l, r, Seq("k"), "lts", "rts", beforeUs, afterUs,
        bucketUs = 450L * 1000000L) // deliberately unaligned bucket width
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.join(r, l("k") === r("k") &&
        unix_micros(col("rts")).between(
          unix_micros(col("lts")) - beforeUs, unix_micros(col("lts")) + afterUs))
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fast == naive, s"missing=${naive -- fast} extra=${fast -- naive}")
  }

  test("plan: candidate generation is an equi-join, not a nested loop") {
    import spark.implicits._
    val l = Seq((1L, ts("2026-01-01 12:00:00"), "p")).toDF("k", "lts", "lid")
    val r = Seq((1L, ts("2026-01-01 11:30:00"), "c")).toDF("k", "rts", "rid")
    val plan = RangeJoin.preceding(l, r, Seq("k"), "lts", "rts", 3600L * 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
