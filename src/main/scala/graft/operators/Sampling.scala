package graft.operators

import graft.plans.TopK
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  * Beyond-reference capability (the reference engine has none).
  *
  * Both samplers draw through md5 of the row id — a pseudo-random function
  * of the id, so the sample is (a) uniform, (b) stable under re-runs,
  * retries and repartitioning (no RNG state, no `rand()` non-determinism
  * across task retries — Spark's `sample()` is NOT stable under retry),
  * and (c) bit-reproducible by any engine with md5, which is what lets the
  * DuckDB oracle pin these gates. At 100 TB both are one narrow
  * map-side projection; `stratified` adds one bounded-heap exchange.
  */
object Sampling {

  /** Exactly min(n, |stratum|) rows per distinct `strataCol` value, chosen
    * as the n smallest md5(id) hex strings within the stratum. Runs on the
    * [[graft.plans.TopKPerKey]] operator: per-partition bounded heaps, then
    * one hash exchange of ≤ n · strata · partitions rows — never the
    * row_number() window formulation, whose physical plan fully sorts every
    * stratum before discarding all but n rows. */
  def stratified(df: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame =
    TopK.perKey(
      df.withColumn("__h", md5(col(idCol).cast("string"))),
      Seq(strataCol), Seq(("__h", false)), n)
      .drop("__h")

  /** Deterministic Bernoulli sample: keep a row iff the first 8 md5(id) hex
    * chars — a uniform 32-bit draw — fall below fraction · 2³². Expected
    * |sample| = fraction · |df|; exact membership is a pure function of the
    * id. One codegen projection + filter, no shuffle, no RNG. */
  def byHash(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0, 1]")
    df.where(draw32(idCol) < math.floor(fraction * 4294967296.0).toLong)
  }

  /** The shared 32-bit md5 draw: first 8 hex chars of md5(id) as a LONG in
    * [0, 2³²) — uniform, retry-stable, engine-portable. */
  private def draw32(idCol: String): Column =
    conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")

  /** Training-mixture sampler: per-DOMAIN Bernoulli rates through the same
    * md5 draw as [[byHash]] — the "source weighting" step that turns a raw
    * corpus into a mixture (web 10%, curated source 75%, …). Domains
    * absent from `weights` fall to `defaultWeight`, so an unexpected new
    * domain at 100 TB degrades to a conservative rate instead of flooding
    * the mix. The per-row threshold is one folded CASE over the domain
    * column — a single codegen projection + filter, no shuffle, no RNG,
    * and membership is a pure function of (id, domain weights), so shards
    * resample identically under retries and incremental re-runs. */
  def weightedMix(df: DataFrame, domainCol: String, idCol: String,
                  weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(w => w >= 0 && w <= 1),
      s"weights outside [0, 1]: $weights default=$defaultWeight")
    def thr(w: Double): Column = lit(math.floor(w * 4294967296.0).toLong)
    val cut = weights.toSeq.sortBy(_._1).foldLeft(thr(defaultWeight)) {
      case (acc, (d, w)) => when(col(domainCol) === d, thr(w)).otherwise(acc)
    }
    df.where(draw32(idCol) < cut)
  }

  /** Quality-budget curation cut: within each domain, take rows in the
    * caller's preference order until a cumulative `costCol` budget is
    * spent — "best documents per source until N tokens", the selection
    * step between quality scoring and shard packing (the complement of
    * [[graft.text.TextAnalysis.packBudgeted]], which splits an ALREADY
    * chosen corpus into shards). One window over one hash exchange on
    * `domainCol`; `order` must be a TOTAL order (tiebreak by id) so the
    * default RANGE frame equals ROWS and the running total is engine-
    * portable. At 100 TB the per-domain sort dominates; a skewed giant
    * domain pre-splits by a hash salt with per-salt sub-budgets, the same
    * discipline packBudgeted documents. Output: the kept input rows plus
    * `cumName` (the running cost INCLUDING the row — a row whose cost
    * overflows the budget is cut, never half-taken). Costs must be
    * NON-NEGATIVE: a negative cost makes the running sum non-monotone, so
    * "cum ≤ budget" is no longer a prefix of the preference order
    * (round-10 ADVICE) — enforced per row with a raise_error guard. */
  def takeUntilBudget(df: DataFrame, domainCol: String, order: Seq[Column],
                      costCol: Column, budget: Long,
                      cumName: String = "cum_cost"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    // NULL costs stay legal and ride free AS COST 0 (round-11 review,
    // twice): without the isNull arm `when(cost >= 0)` is null →
    // raise_error(NULL); and without the coalesce a NULL-cost row at the
    // HEAD of its partition made the whole running sum NULL and was
    // silently dropped while the same row later in the order was kept —
    // position-dependent semantics. Only a genuinely NEGATIVE cost aborts.
    val guarded = coalesce(
      when(costCol.isNull || costCol >= 0, costCol)
        .otherwise(raise_error(concat(
          lit("takeUntilBudget: negative cost breaks the prefix contract: "),
          costCol.cast("string")))),
      lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(order: _*)
    df.withColumn(cumName, sum(guarded).over(w)).where(col(cumName) <= budget)
  }
}
