package graft.operators

import graft.plans.TopK
import org.apache.spark.sql.DataFrame
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
    val draw = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    df.where(draw < math.floor(fraction * 4294967296.0).toLong)
  }
}
