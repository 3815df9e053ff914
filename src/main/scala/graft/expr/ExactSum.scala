package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact aggregation of fixed-point (≤2-dp) DOUBLE columns in the LONG
  * fast path (r5 VERDICT #2).
  *
  * The decimal-exact discipline (sum in DECIMAL(18,6) so the result is
  * independent of partial-aggregation merge order) is correct but drops
  * Spark's vectorized hash-aggregate fast path: a decimal sum carries a
  * two-word struct buffer and per-row BigDecimal-ish arithmetic, where a
  * LONG sum stays a single register inside whole-stage codegen — measured
  * 3–7× on the events/revenue aggregates (sessionize 0.32→2.01 s when the
  * decimal sums landed).
  *
  * Both properties at once: the source values are exact at ≤2 decimal
  * places, so `round(v*100)` is an exact integer ("cents") per row, the
  * LONG sum of cents is exact, and dividing the total by 100 *in decimal*
  * rebuilds the exact same DECIMAL(28,6) value that
  * `sum(cast(v as decimal(18,6)))` produces — every downstream
  * divide/round/cast then behaves bit-identically, so the DuckDB oracles
  * (which keep the decimal formulation) still hash-match. `round` before
  * the long cast matters: `8.62*100` is `861.999…` in binary doubles and a
  * bare long cast would truncate to 861.
  *
  * Overflow envelope (documented, not checked — ANSI off wraps silently):
  * the cents sum is exact while a GROUP's total stays under 2⁶³ ≈ 9.2e18
  * cents = 9.2e16 "dollars". TPC-H at ~100 TB (SF ≈ 1.3e5, ~8e11 lineitem
  * rows) puts the largest group sums (q1's four groups) near
  * 2e11 rows × 3.6e6 cents ≈ 7e17 — inside the envelope with ~13× head
  * room. The product form ([[myriadRevenue]], 1e-4 units, per-row values
  * up to ~1e9) has less: ~9e9 rows per group; q3/q5 group cardinalities
  * (per-order / per-nation-year) stay well under it at that scale. Beyond
  * the envelope, flip the affected sum back to the decimal formulation —
  * the oracle SQL never changed.
  */
object ExactSum {

  /** `v` (a ≤2-dp double) as exact integer cents. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** A LONG cents total rebuilt as the DECIMAL(28,6) that
    * `sum(cast(v as decimal(18,6)))` yields — same value, so downstream
    * round/divide ties break identically. The division is exact (the true
    * value has scale 2 ≤ result scale). */
  def centsToDec(sumCents: Column): Column =
    (sumCents.cast("decimal(28,8)") / 100).cast("decimal(28,6)")

  /** Drop-in for `sum(c.cast("decimal(18,6)"))` over a ≤2-dp double. */
  def centsSum(c: Column): Column = centsToDec(sum(cents(c)))

  /** Per-row `price * (1 - discount)` (both ≤2-dp) in exact 1e-4 units
    * ("myriads") — the TPC-H q3/q5 revenue term as a single LONG. */
  def revenueMyriads(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - cents(discount))

  /** Per-row `price * discount` (both ≤2-dp) in exact 1e-4 units — the
    * TPC-H q6 revenue term. */
  def productMyriads(price: Column, discount: Column): Column =
    cents(price) * cents(discount)

  /** A LONG myriads total rebuilt as the DECIMAL(28,6) the decimal
    * formulation (`sum(cast(price*… as decimal(18,6)))`) yields. */
  def myriadsToDec(sumMyriads: Column): Column =
    (sumMyriads.cast("decimal(30,8)") / 10000).cast("decimal(28,6)")

  /** Drop-in for `sum((price.cast(d)* (1-discount).cast(d)).cast(d))`. */
  def revenueSum(price: Column, discount: Column): Column =
    myriadsToDec(sum(revenueMyriads(price, discount)))

  /** Drop-in for `sum((price.cast(d)*discount.cast(d)).cast(d))`. */
  def productSum(price: Column, discount: Column): Column =
    myriadsToDec(sum(productMyriads(price, discount)))
}
