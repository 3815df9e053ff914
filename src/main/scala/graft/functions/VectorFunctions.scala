package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` columns, composed from
  * codegen'd Spark built-ins (`zip_with` / `aggregate` / `transform`) so the
  * whole expression stays inside WholeStageCodegen — no UDFs, no boxing beyond
  * the array lambda machinery. All accumulation is in DOUBLE with a
  * sequential left fold, which makes results deterministic and bit-comparable
  * with an external oracle that folds in the same order.
  *
  * Distance semantics follow the reference engine
  * (deshwalmahesh/homemade-vector-db): hnswlib `space='l2'` and
  * `faiss.IndexFlatL2` both return *squared* L2 (local_db.py:42–48, 169–176),
  * and scores are `1/(1+d)` (local_db.py:172,176).
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** Σ (a_i − b_i)² — squared L2, the reference's vector distance. */
  def squaredL2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0),
      (acc, x) => acc + x)

  /** True (unsquared) L2 — used only by the reference's hybrid small-N path
    * (np.linalg.norm, local_db.py:377). */
  def l2(a: Column, b: Column): Column = sqrt(squaredL2(a, b))

  /** Σ a_i·b_i */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NaN-safe only insofar as inputs are non-zero vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** distance → similarity mapping pinned by the reference (1/(1+d),
    * local_db.py:172,176; range (0,1] pinned by test_local_db.py:456–457). */
  def distToScore(dcol: Column): Column = lit(1.0) / (lit(1.0) + dcol)

  /** A query vector as a literal ARRAY<DOUBLE> column. */
  def vecLit(v: Array[Double]): Column = array(v.map(lit): _*)

  def vecLitF(v: Array[Float]): Column = array(v.map(x => lit(x.toDouble)): _*)
}
