package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the unbounded-arm graph search: index build,
  * first search (pays the coverage walk), second search (scoring only) —
  * r8 attribution for the facade/ann cold anomalies. Round 13: optional
  * [nlist] [graphNprobe] args (default −1 −1 = the buildPlan auto-routing)
  * measure the SHARDED build path on the ×10/×100 replicas. */
object GraphWalkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val argNlist = if (args.length > 1) args(1).toInt else -1
    val argNprobe = if (args.length > 2) args(2).toInt else -1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warm-up
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[walkprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val n = emb.count()
    val (nl, np) = graft.vector.GraphIndex.buildPlan(n, argNlist, argNprobe)
    println(s"[walkprobe] n=$n plan: nlist=$nl nprobe=$np" +
      (if (argNlist <= 0) " (auto)" else ""))
    val index = t("build")(
      graft.vector.GraphIndex.build(emb, "vec_id", "embedding",
        k = 8, nlist = argNlist, graphNprobe = argNprobe))
    val q = emb.where(col("vec_id") === 13L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    t("search1_walk")(index.searchBatch(q, "qid", "qv", k = 5, ef = 0).count())
    t("search2_scoring")(index.searchBatch(q, "qid", "qv", k = 5, ef = 0).count())
    spark.stop()
  }
}
