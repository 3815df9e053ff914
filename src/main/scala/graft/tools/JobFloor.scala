package graft.tools
import org.apache.spark.sql.SparkSession
object JobFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    (1 to 3).foreach(_ => spark.read.parquet(s"$dir/lineitem.parquet").count())
    def t(label: String, n: Int = 30)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"[floor] $label: ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/iter")
    }
    t("read.parquet(lineitem) handle only")(spark.read.parquet(s"$dir/lineitem.parquet"))
    t("read.parquet(nation) handle only")(spark.read.parquet(s"$dir/nation.parquet"))
    val cached = spark.read.parquet(s"$dir/lineitem.parquet")
    t("cached handle .where.count")(cached.where("l_quantity < 10").select("l_orderkey").count())
    t("fresh handle .where.count")(spark.read.parquet(s"$dir/lineitem.parquet")
      .where("l_quantity < 10").select("l_orderkey").count())
    // pure planning cost: executedPlan on a fresh trivial frame, no action
    t("plan-only: range.groupBy.count")(
      spark.range(1000).selectExpr("id % 7 as k").groupBy("k").count()
        .queryExecution.executedPlan)
    t("exec-only: reuse SAME df.count", 30)(cached.count())
    spark.stop()
  }
}
