package graft

import graft.dedup.Dedup
import graft.expr.ExactSum
import graft.functions.VectorFunctions._
import graft.text.{BM25, TextAnalysis}
import graft.vector.{ExactKNN, IVFIndex, LSHIndex, PQIndex}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/TPC-H tier: rolling windows, the TPC-H query ports, cohorts, rollup/cube/grouping-sets/pivot/ntile, set ops.
  *
  * One tier of [[Queries]] (split in round 12, r11 VERDICT #7 -
  * maintainability only): members keep their original relative order and
  * semantics, relaxed from `private` to `private[graft]` so the sibling
  * tier traits and the assembling object see them. The self-type gives
  * every tier access to the full mixed-in surface without a dependency
  * graph between the files. */
private[graft] trait QueriesRelational { this: Queries.type =>

  /** Windowed analytics with a RANGE frame: per-user rolling 1-hour mean
    * over event time — the time-decayed feature shape (rolling rates,
    * moving averages) every behavioral pipeline computes. One shuffle on
    * user_id; the frame bound is event-time, not row-count, so sparse and
    * dense users get the same semantics. */
  private[graft] def rollingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("__us"))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    eventsTbl(spark, dir)
      .withColumn("__us", unix_micros(col("ts")))
      .withColumn("roll_avg",
        round(ExactSum.centsToDec(sum(ExactSum.cents(col("value"))).over(w)) /
          count(lit(1)).over(w), 4).cast("double"))
      .select(col("event_id"), col("user_id"), col("roll_avg"))
      .orderBy(col("event_id"))
  }

  /** Relational tier: TPC-H Q6 shape — the pure scan-pushdown query: every
    * predicate reaches the parquet reader, the aggregate is one exact
    * DECIMAL sum; the whole plan is scan → filter → partial/final agg. */
  private[graft] def tpchQ6(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(ExactSum.productSum(col("l_extendedprice"), col("l_discount"))
        .cast("double").as("revenue"))

  /** Relational tier: TPC-H Q5 shape — the six-table join-reorder workout:
    * two fact tables (orders ⨝ lineitem) against four dimension tables
    * with the selective region filter arriving through the nation chain.
    * Dimensions broadcast (region/nation/supplier are tiny); Catalyst
    * orders the fact join; the revenue arithmetic keeps the exact-DECIMAL
    * discipline shared with q3/q6. */
  private[graft] def tpchQ5(spark: SparkSession, dir: String): DataFrame = {
    tbl(spark, dir, "customer")
      .join(tbl(spark, dir, "orders")
          .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
            col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))),
        col("c_custkey") === col("o_custkey"))
      .join(tbl(spark, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(tbl(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(tbl(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(tbl(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(ExactSum.revenueSum(col("l_extendedprice"), col("l_discount"))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** Relational tier: TPC-H Q4 shape — EXISTS decorrelated to a LEFT SEMI
    * join, Catalyst's own rewrite target for correlated EXISTS. The probe
    * side is pre-filtered and projected to the join key alone, so the semi
    * join shuffles only distinct orderkeys and never multiplies rows —
    * at 100 TB the semi side is a fraction of the lineitem fact and AQE
    * can flip it to broadcast when the filter is selective. */
  private[graft] def tpchQ4(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "orders")
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-07-01 00:00:00")))
      .join(tbl(spark, dir, "lineitem")
          .where(col("l_returnflag") === "R").select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** Relational tier: TPC-H Q13 shape — LEFT OUTER join with an ON-clause
    * filter on the null-producing side (the filter must NOT drop customers
    * with zero orders, so it belongs on the right input, not a WHERE), then
    * a two-level aggregation: orders-per-customer, then the distribution of
    * that count. Both aggregations shuffle on their own key; the second is
    * tiny (distinct counts), so the plan is one fact-sized shuffle + noise. */
  private[graft] def tpchQ13(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "customer").select(col("c_custkey"))
      .join(tbl(spark, dir, "orders")
          .where(col("o_orderstatus") =!= "F")
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Relational tier: LEFT ANTI join — the complement of tpch_q4's semi:
    * customers with NO order in the window, profiled per market segment.
    * Same scale shape as the semi (distinct-key probe side only). */
  private[graft] def antiInactiveCustomers(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "customer")
      .join(tbl(spark, dir, "orders")
          .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
            col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_inactive"),
        ExactSum.centsSum(col("c_acctbal")).cast("double").as("total_bal"))
      .orderBy(col("c_mktsegment"))

  /** Relational tier: TPC-H Q22 shape — global-positive-customers SCALAR
    * subquery threshold + NOT EXISTS anti-join + group, adapted to this
    * testdata (no c_phone column ⇒ the 7-country phone-prefix IN becomes a
    * 7-nation n_name IN; same selectivity role, same plan shape). The
    * average-balance predicate is stated WITHOUT a division:
    * `cents · n > Σcents` over exact LONG cents compares bit-identically
    * in any engine, where `c_acctbal > avg(...)` would hinge on each
    * engine's summation order and decimal-division scale. The threshold
    * frame is ONE row (broadcast cross join); the anti-join is the only
    * fact-sized shuffle (orders projected to its key). One more testdata
    * adaptation: every customer here has SOME order (all-time NOT EXISTS
    * is empty at every sf), so the anti-join is windowed to the corpus's
    * final year — "lapsed high-balance customers", the same business
    * reading Q22 gives its never-ordered set. */
  private[graft] def tpchQ22(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_1", "NATION_3", "NATION_5", "NATION_13",
      "NATION_17", "NATION_21", "NATION_23")
    val cust = tbl(spark, dir, "customer")
      .join(broadcast(tbl(spark, dir, "nation")
          .where(col("n_name").isin(nations: _*))
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"), col("c_acctbal"),
        ExactSum.cents(col("c_acctbal")).as("cents"))
    val thr = cust.where(col("c_acctbal") > 0.0)
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
    cust.crossJoin(broadcast(thr))
      .where(col("cents") * col("n") > col("s"))
      .join(tbl(spark, dir, "orders")
          .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2000-08-01 00:00:00")))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        ExactSum.centsSum(col("c_acctbal")).cast("double").as("totacctbal"))
      .orderBy(col("n_name"))
  }

  /** Relational tier: TPC-H Q17 shape — correlated SCALAR subquery
    * decorrelated to a grouped aggregate + equi-join (Catalyst's own
    * rewrite target): the per-part 20%-of-average quantity threshold joins
    * back to lineitem. The threshold frame is part-cardinality (dimension-
    * sized ⇒ broadcastable); integral quantities make the double average
    * exact, so the `<` predicate is engine-portable bit-for-bit. */
  private[graft] def tpchQ17(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
    val thr = li.groupBy(col("l_partkey").as("tp"))
      .agg((avg(col("l_quantity")) * 0.2).as("thr"))
    li.join(thr, col("l_partkey") === col("tp"))
      .where(col("l_quantity") < col("thr"))
      .agg((ExactSum.centsSum(col("l_extendedprice")).cast("double") / 7.0).as("avg_yearly"))
  }

  /** Relational tier: TPC-H Q18 shape — IN over an aggregated-HAVING
    * subquery planned as a semi join against the grouped frame (large-
    * order detection); the per-order re-aggregation after the semi join is
    * fact-sized but key-local, and the top-100 is a bounded TakeOrdered,
    * never a global sort. */
  private[graft] def tpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey").as("bk"))
      .agg(sum(col("l_quantity")).as("tq"))
      .where(col("tq") > 150).select(col("bk"))
    tbl(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("bk"), "left_semi")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_totalprice"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** Relational tier: TPC-H Q14 shape — promotion revenue share: one
    * month of the lineitem fact, parts broadcast, a CONDITIONAL exact
    * sum (promo myriads vs total myriads, both LONG fast-path) and one
    * final double division. At 100 TB: one fact scan with the month
    * filter pushed to parquet, zero shuffles after the broadcast join
    * (the aggregate is a two-scalar global agg). */
  private[graft] def tpchQ14(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-09-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-10-01 00:00:00")))
    li.join(broadcast(tbl(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        ExactSum.myriadsToDec(sum(when(col("p_type") === "PROMO",
            ExactSum.revenueMyriads(col("l_extendedprice"), col("l_discount")))
          .otherwise(lit(0L)))).cast("double").as("__promo"),
        ExactSum.revenueSum(col("l_extendedprice"), col("l_discount"))
          .cast("double").as("__total"))
      .select(round(lit(100.0) * col("__promo") / col("__total"), 4).as("promo_revenue"))
  }

  /** Relational tier: TPC-H Q7 shape — volume shipping between two
    * nations, BOTH directions of the (supplier-nation, customer-nation)
    * pair in one plan: the two nation lookups join the same broadcast
    * dimension under different aliases, the pair disjunction prunes
    * before the aggregate, and the per-(pair, year) revenue is the exact
    * LONG fast path. One fact-sized shuffle (the 3-key group). */
  private[graft] def tpchQ7(spark: SparkSession, dir: String): DataFrame = {
    val n = tbl(spark, dir, "nation")
    val li = tbl(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    li.join(tbl(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(tbl(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(tbl(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .join(broadcast(n.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
             (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(ExactSum.revenueSum(col("l_extendedprice"), col("l_discount"))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Relational tier: TPC-H Q8 shape — national market share: ASIA-region
    * ECONOMY-part order revenue per year, with the target nation's share
    * as a conditional-sum ratio. The part filter broadcasts INTO the fact
    * scan (the most selective dimension first), both nation roles are
    * broadcast aliases, and the share division happens once per year row
    * on exact decimal sums cast to double. */
  private[graft] def tpchQ8(spark: SparkSession, dir: String): DataFrame = {
    val n = tbl(spark, dir, "nation")
    tbl(spark, dir, "lineitem")
      .join(broadcast(tbl(spark, dir, "part").where(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(tbl(spark, dir, "orders")
          .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
            col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(tbl(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n.select(col("n_nationkey").as("cnk"), col("n_regionkey").as("crk"))),
        col("c_nationkey") === col("cnk"))
      .join(broadcast(tbl(spark, dir, "region").where(col("r_name") === "ASIA")),
        col("crk") === col("r_regionkey"))
      .join(broadcast(tbl(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        ExactSum.myriadsToDec(sum(when(col("supp_nation") === "NATION_5",
            ExactSum.revenueMyriads(col("l_extendedprice"), col("l_discount")))
          .otherwise(lit(0L)))).cast("double").as("__n5"),
        ExactSum.revenueSum(col("l_extendedprice"), col("l_discount"))
          .cast("double").as("__tot"))
      .select(col("o_year"), round(col("__n5") / col("__tot"), 4).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Relational tier: TPC-H Q10 shape — returned-item top customers: one
    * quarter of orders, the 'R' returnflag filter pushed to the lineitem
    * scan, customer + nation broadcast, exact revenue per customer, and a
    * bounded TakeOrdered top-20 (never a global sort). */
  private[graft] def tpchQ10(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem").where(col("l_returnflag") === "R")
      .join(tbl(spark, dir, "orders")
          .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
            col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(tbl(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(tbl(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(ExactSum.revenueSum(col("l_extendedprice"), col("l_discount"))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        r4(col("c_acctbal")).as("c_acctbal"), col("n_name"))

  /** Relational tier: TPC-H Q15 shape — top supplier(s) by a quarter's
    * revenue: the per-supplier revenue "view" computed once, its max as a
    * 1-row broadcast, and the equality join back on the EXACT decimal
    * revenue (the LONG-cents sum makes cross-row equality well-defined —
    * a double formulation could drop a tied supplier to summation order).
    * Ties all surface, ordered by s_suppkey, exactly the spec's intent. */
  private[graft] def tpchQ15(spark: SparkSession, dir: String): DataFrame = {
    val rev = tbl(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      .groupBy(col("l_suppkey"))
      .agg(ExactSum.revenueSum(col("l_extendedprice"), col("l_discount")).as("__rev"))
    val mx = rev.agg(max(col("__rev")).as("__mx"))
    rev.join(broadcast(mx), col("__rev") === col("__mx"))
      .join(broadcast(tbl(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("__rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Behavioral analytics: ordered conversion funnel (view → click →
    * purchase by FIRST occurrence per user) — the sequence-matching shape
    * product analytics runs constantly. Two aggregations on user_id (the
    * second reuses the first's partitioning; both map-side combine), one
    * final global count — no joins, no windows. */
  private[graft] def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val firsts = eventsTbl(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .groupBy(col("user_id"), col("event_type")).agg(min(col("ts")).as("t0"))
    val p = firsts.groupBy(col("user_id")).agg(
      max(when(col("event_type") === "view", col("t0"))).as("tv"),
      max(when(col("event_type") === "click", col("t0"))).as("tc"),
      max(when(col("event_type") === "purchase", col("t0"))).as("tp"))
    p.agg(
      count(when(col("tv").isNotNull, 1)).as("s1"),
      count(when(col("tv").isNotNull && col("tc") > col("tv"), 1)).as("s2"),
      count(when(col("tv").isNotNull && col("tc") > col("tv") && col("tp") > col("tc"), 1)).as("s3"))
  }

  /** Behavioral analytics: retention cohorts — users grouped by first-
    * active day, activity counted per (cohort, day offset). The cohort
    * frame is user-cardinality and shares the events' user_id hash
    * partitioning, so the join back is exchange-reusable; the final
    * distinct-count shuffles (cohort, offset) pairs only. */
  private[graft] def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsTbl(spark, dir).select(col("user_id"), to_date(col("ts")).as("d"))
    val c = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
    e.join(c, "user_id")
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("day_offset"), col("active_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** Relational tier: ROLLUP grouping sets (free via Catalyst, §2.6). */
  private[graft] def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        ExactSum.centsSum(col("o_totalprice")).cast("double").as("revenue"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Relational tier: CUBE grouping sets (all four rollup combinations —
    * free via Catalyst's Expand operator, §2.6). */
  private[graft] def cubeRevenue(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        ExactSum.centsSum(col("o_totalprice")).cast("double").as("revenue"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Relational tier: GROUPING SETS in its GENERAL form — the two
    * single-dimension marginals plus the grand total, a set list neither
    * ROLLUP nor CUBE can express (no (status, priority) pair row). Same
    * Expand-operator execution, caller-chosen sets. */
  private[graft] def groupingSetsRevenue(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty[Column]),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        ExactSum.centsSum(col("o_totalprice")).cast("double").as("revenue"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Relational tier: NTILE — equi-depth bucketing by rank (the decile
    * assignment step of a feature pipeline), distinct from row_number/
    * rank (window_top_order) and RANGE frames (rolling_avg). Total order
    * (revenue desc, custkey) makes the tile assignment deterministic;
    * the per-tile rollup emits exact-decimal revenue bounds. */
  private[graft] def ntileRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("revenue").desc, col("c_custkey").asc)
    tbl(spark, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(ExactSum.centsSum(col("o_totalprice")).as("revd"))
      .select(col("c_custkey"), col("revd").cast("double").as("revenue"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_cust"),
        min(col("revenue")).as("min_rev"), max(col("revenue")).as("max_rev"))
      .orderBy(col("decile"))
  }

  /** Relational tier: set operations (INTERSECT / EXCEPT / UNION ALL). */
  private[graft] def setOps(spark: SparkSession, dir: String): DataFrame = {
    val d = docsTbl(spark, dir)
    val en = d.where(col("lang") === "en").select(col("doc_id").as("id"))
    val long = d.where(col("n_chars") >= 300).select(col("doc_id").as("id"))
    en.intersect(long).select(lit("both").as("tag"), col("id"))
      .unionByName(en.except(long).select(lit("en_only").as("tag"), col("id")))
      .orderBy(col("tag"), col("id"))
  }

  /** Relational tier: window top-1 per key. */
  private[graft] def windowTopOrder(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    tbl(spark, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey").asc)
      .limit(100)
  }
}
