package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests: the fused codegen expressions (graft.expr) must be
  * bit-equal to the zip_with/aggregate built-in formulations. */
class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def randVec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 4 - 2)

  private lazy val pairs = Seq.fill(50)((randVec(64).toSeq, randVec(64).toSeq))
    .toDF("a", "b").cache()

  test("squaredL2 codegen == HOF builtin, bit-exact") {
    val rows = pairs.select(
      squaredL2(col("a"), col("b")).as("x"), squaredL2Hof(col("a"), col("b")).as("y")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("dot codegen == HOF builtin, bit-exact") {
    val rows = pairs.select(
      dot(col("a"), col("b")).as("x"), dotHof(col("a"), col("b")).as("y")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("cosine codegen == HOF builtin, bit-exact") {
    val rows = pairs.select(
      cosine(col("a"), col("b")).as("x"), cosineHof(col("a"), col("b")).as("y")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("known values") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 4f))).toDF("a", "b")
    val r = df.select(
      squaredL2(col("a"), col("b")), dot(col("a"), col("b")),
      l2(col("a"), col("b")), distToScore(lit(1.0))).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 17.0)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.5)
  }

  test("null array and null element propagate") {
    val df = spark.sql(
      "SELECT cast(null as array<float>) a, array(1.0F, 2.0F) b, array(1.0F, cast(null as float)) c")
    val r = df.select(
      squaredL2(col("a"), col("b")), squaredL2(col("c"), col("b")),
      cosine(col("c"), col("b"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("interpreted eval (no-codegen path) matches") {
    // constant folding runs interpreted eval; must equal the codegen result
    val lit1 = array(lit(1.0f), lit(2.0f)); val lit2 = array(lit(3.0f), lit(5.0f))
    val r = spark.range(1).select(squaredL2(lit1, lit2)).head().getDouble(0)
    assert(r == 13.0)
  }
}
