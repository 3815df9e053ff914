package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` columns. The primary
  * implementations are the fused codegen expressions in [[graft.expr]] (one
  * generated loop, no boxing); the `*Hof` twins keep the equivalent
  * `zip_with`/`aggregate` built-in formulations for differential testing —
  * both fold left-to-right in DOUBLE, so they are bit-equal.
  *
  * Distance semantics follow the reference engine
  * (deshwalmahesh/homemade-vector-db): hnswlib `space='l2'` and
  * `faiss.IndexFlatL2` both return *squared* L2 (local_db.py:42–48, 169–176),
  * and scores are `1/(1+d)` (local_db.py:172,176).
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** Σ (a_i − b_i)² — squared L2, the reference's vector distance. */
  def squaredL2(a: Column, b: Column): Column = graft.expr.VectorExpr.squaredL2(a, b)

  /** True (unsquared) L2 — used only by the reference's hybrid small-N path
    * (np.linalg.norm, local_db.py:377). */
  def l2(a: Column, b: Column): Column = sqrt(squaredL2(a, b))

  /** Σ a_i·b_i */
  def dot(a: Column, b: Column): Column = graft.expr.VectorExpr.dot(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NaN-safe only insofar as inputs are non-zero vectors. */
  def cosine(a: Column, b: Column): Column = graft.expr.VectorExpr.cosine(a, b)

  /** Interpreted-builtin twins (differential-test reference). */
  def squaredL2Hof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0),
      (acc, x) => acc + x)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** distance → similarity mapping pinned by the reference (1/(1+d),
    * local_db.py:172,176; range (0,1] pinned by test_local_db.py:456–457). */
  def distToScore(dcol: Column): Column = lit(1.0) / (lit(1.0) + dcol)

  /** A query vector as a literal ARRAY<DOUBLE> column. */
  def vecLit(v: Array[Double]): Column = array(v.map(lit): _*)

  def vecLitF(v: Array[Float]): Column = array(v.map(x => lit(x.toDouble)): _*)
}
