package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom TopKPerKey operator vs the window-row_number formulation —
  * identical results under a total order, heap-based physical plan. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val data = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    Seq.tabulate(5000)(i => (i % 37, i.toLong, rnd.nextDouble()))
      .toDF("qid", "id", "score").repartition(8).cache()
  }

  private def windowed(k: Int) = {
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id").asc)
    data.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  private def viaOperator(k: Int) =
    TopK.perKey(data, Seq("qid"), Seq("score" -> true, "id" -> false), k)

  private def normalize(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, -t._3, t._2))

  test("matches window row_number under a total order") {
    assert(normalize(viaOperator(5)).sameElements(normalize(windowed(5))))
    assert(normalize(viaOperator(1)).sameElements(normalize(windowed(1))))
  }

  test("k >= group size returns whole groups") {
    assert(normalize(viaOperator(1000)).sameElements(normalize(data)))
  }

  test("physical plan: two heap phases around one exchange, no SortExec") {
    val plan = viaOperator(3).queryExecution.executedPlan.toString
    assert("TopKPerKey \\d".r.findAllIn(plan).length == 2, plan)
    assert(plan.contains("Exchange") || plan.contains("AQEShuffleRead"), plan)
    assert(!plan.contains("SortExec"), s"unexpected full sort:\n$plan")
  }
}
