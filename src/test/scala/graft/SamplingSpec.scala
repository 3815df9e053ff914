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

  test("weightedMix applies per-domain rates and the default elsewhere") {
    // per-domain membership must equal byHash at that domain's rate —
    // the draw is the same 32-bit function of id
    val mix = Sampling.weightedMix(df, "stratum", "id",
        Map("s0" -> 1.0, "s1" -> 0.1), 0.0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDomain = mix.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byDomain("s0") == (0L until 300L).filter(_ % 3 == 0).toSet) // rate 1.0
    val h10 = Sampling.byHash(df.where($"stratum" === "s1"), "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(byDomain("s1") == h10)                 // named rate = byHash(0.1)
    assert(!byDomain.contains("s2"))              // default 0.0 drops all
    // rerun is bit-identical (pure function of id)
    val again = Sampling.weightedMix(df, "stratum", "id",
        Map("s0" -> 1.0, "s1" -> 0.1), 0.0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.sorted.sameElements(mix.sorted))
    intercept[IllegalArgumentException](
      Sampling.weightedMix(df, "stratum", "id", Map("s0" -> 1.5), 0.1))
  }

  test("takeUntilBudget keeps the best-first prefix within the budget per domain") {
    // cost 10 each, preference = id asc → budget 35 keeps ids with
    // cumulative 10,20,30 per domain and cuts the 4th (40 > 35)
    val d = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L), (4L, "a", 10L),
                (5L, "b", 30L), (6L, "b", 10L))
      .toDF("id", "dom", "cost")
    val kept = Sampling.takeUntilBudget(d, "dom", Seq($"id".asc), $"cost", 35L, "cum")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(kept == Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 5L -> 30L))
    // a row whose cost overflows the budget is cut, never half-taken:
    // domain b's second row (30 + 10 = 40) is gone even though 5 of its
    // 10 units would "fit"
    assert(!kept.contains(6L))
    intercept[IllegalArgumentException](
      Sampling.takeUntilBudget(d, "dom", Seq($"id".asc), $"cost", 0L))
    // a negative cost silently breaks the prefix contract (the running sum
    // is no longer monotone) — the per-row guard must raise, not mis-keep
    // (round-10 ADVICE)
    val neg = Seq((1L, "a", 10L), (2L, "a", -5L)).toDF("id", "dom", "cost")
    val e = intercept[Exception](
      Sampling.takeUntilBudget(neg, "dom", Seq($"id".asc), $"cost", 35L).collect())
    assert(e.getMessage != null && e.getMessage.contains("negative cost") ||
      String.valueOf(e.getCause).contains("negative cost"))
  }

  test("takeUntilBudget matches a driver-side reference on random inputs") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 400L).map(i =>
      (i, s"d${rnd.nextInt(5)}", (1 + rnd.nextInt(50)).toLong))
    val d = rows.toDF("id", "dom", "cost")
    val budget = 120L
    val got = Sampling.takeUntilBudget(d, "dom", Seq($"id".asc), $"cost", budget, "cum")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // reference: per domain in id order, running total INCLUDING the row
    // must stay <= budget (cum is monotone, so everything after the first
    // overflow is cut too — both sides agree by construction)
    val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_._1).flatMap { case (id, _, c) =>
        cum += c
        if (cum <= budget) Some(id -> cum) else None
      }
    }.toMap
    assert(got == want,
      s"diff: ${(got.toSet diff want.toSet).take(5)} / ${(want.toSet diff got.toSet).take(5)}")
  }
}
