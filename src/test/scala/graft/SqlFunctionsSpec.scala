package graft

import graft.expr.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface: the custom expressions registered in the FunctionRegistry
  * (≙ SURVEY §4.2-2) and the returnScores projection contract
  * (≙ test_local_db.py:408–523, TestReturnScoresFunctionality). */
class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vec_* functions callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_squared_l2(array(1.0F, 2.0F), array(1.0F, 4.0F)) AS d,
        |       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS p,
        |       vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c""".stripMargin).head()
    assert(r.getDouble(0) == 4.0)
    assert(r.getDouble(1) == 11.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("registration errors on wrong arity") {
    GraftFunctions.register(spark)
    intercept[Exception](spark.sql("SELECT vec_dot(array(1.0F))").head())
  }

  test("vec_avg aggregate: elementwise mean, partial-merge path, empty group null") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // spread over many partitions so partial buffers actually merge
    val df = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 4.0f)), (1, Seq(5.0f, 6.0f)),
      (2, Seq(10.0f, 20.0f))).toDF("k", "v").repartition(8)
    df.createOrReplaceTempView("vecavg_in")
    val r = spark.sql(
      "SELECT k, vec_avg(v) AS c FROM vecavg_in GROUP BY k ORDER BY k")
      .collect().map(row => row.getInt(0) -> row.getSeq[Double](1)).toMap
    assert(r(1) == Seq(3.0, 4.0))
    assert(r(2) == Seq(10.0, 20.0))
    // Column API + HashAggregate plan shape (partial + final, no sort agg)
    val agg = df.groupBy($"k").agg(graft.expr.VectorAgg.vecAvg($"v").as("c"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
    // null input vectors are skipped, not poisoning the mean
    val withNull = Seq((1, Some(Seq(2.0f, 2.0f))), (1, None)).toDF("k", "v")
    val m = withNull.groupBy($"k").agg(graft.expr.VectorAgg.vecAvg($"v").as("c"))
      .head().getSeq[Double](1)
    assert(m == Seq(2.0, 2.0))
  }

  test("returnScores=false projects bare ids on all three query paths") {
    val rnd = new scala.util.Random(1)
    val db = VectorDatabase.create(spark, 4, "flat")
    db.add(Seq("alpha beta", "gamma delta", "alpha gamma"),
      Seq.fill(3)(Array.fill(4)(rnd.nextFloat())), None)
    val v = db.queryVector(Array.fill(4)(0.5f), 2, returnScores = false)
    assert(v.columns.sameElements(Seq("id")) && v.collect().length == 2)
    val t = db.queryText("alpha", 2, returnScores = false)
    assert(t.columns.sameElements(Seq("id")))
    val h = db.hybridSearch("alpha", Array.fill(4)(0.5f), 2, returnScores = false)
    assert(h.columns.sameElements(Seq("id")))
  }
}
