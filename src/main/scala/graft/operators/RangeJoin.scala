package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed interval (range) join: pair each left row with the right rows of
  * the same keys whose timestamp falls in
  * `[l.ts − before, l.ts + after]`.
  *
  * A raw `l.join(r, keys && r.ts BETWEEN ...)` gives Catalyst only the key
  * equi-component; within a hot key the range predicate evaluates as a
  * per-key nested loop — quadratic for active keys, the classic range-join
  * trap. This formulation makes candidate generation an EQUI-join end to
  * end (the standard time-bucketing decomposition, as in Flink's interval
  * join and DuckDB/Trino range-join optimizations):
  *
  *  - choose `bucketUs` ≈ the window span; each RIGHT row lands in ONE
  *    bucket `⌊ts/bucket⌋`;
  *  - each LEFT row explodes to the (window/bucket + 2)-bounded set of
  *    buckets its window covers — a tiny, fixed fan-out;
  *  - shuffle-join on (keys, bucket) — co-partitioned, AQE-visible — then
  *    the exact microsecond BETWEEN filter on the (already small)
  *    candidate pairs.
  *
  * Shuffle volume: |L|·(span/bucket + 2) + |R| narrow rows; per-task work
  * is bucket-local. Column name collisions between `left` and `right` are
  * the caller's to resolve (rename before joining), matching Spark join
  * semantics.
  */
object RangeJoin {

  def interval(left: DataFrame, right: DataFrame,
               keyCols: Seq[String], leftTs: String, rightTs: String,
               beforeUs: Long, afterUs: Long,
               bucketUs: Long = 0L): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0 && beforeUs + afterUs > 0,
      "window must be non-negative and non-empty")
    val w = if (bucketUs > 0) bucketUs else math.max(beforeUs + afterUs, 1L)
    val lm = unix_micros(col(leftTs))
    val rm = unix_micros(col(rightTs))
    // exact floor division in LONG arithmetic — a double `/` can land on
    // k − ε at exact multiples of w and floor into the wrong bucket,
    // silently dropping boundary pairs before the exact filter runs
    def fdiv(a: Column, d: Long): Column = ((a - pmod(a, lit(d))) / d).cast("long")
    val l = left.withColumn("__bk",
      explode(sequence(fdiv(lm - beforeUs, w), fdiv(lm + afterUs, w))))
    val r = right.withColumn("__bk", fdiv(rm, w))
    l.join(r, keyCols :+ "__bk")
      .where(rm.between(lm - beforeUs, lm + afterUs))
      .drop("__bk")
  }

  /** Convenience: right rows strictly in the `beforeUs` window preceding
    * (or equal to) each left row — "events leading up to X". */
  def preceding(left: DataFrame, right: DataFrame,
                keyCols: Seq[String], leftTs: String, rightTs: String,
                beforeUs: Long): DataFrame =
    interval(left, right, keyCols, leftTs, rightTs, beforeUs, afterUs = 0L)
}
