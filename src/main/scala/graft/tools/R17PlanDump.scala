package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path}

/** Round-17 deliverable helper: dumps `.explain("formatted")` for the
  * named gates to plans/r17/<gate>_<tag>.txt (guide §7.2 — the committed
  * before/after plan evidence), and prints a planning-vs-execution wall
  * split per gate (analysis+optimization+physical planning measured as
  * executedPlan materialization on a FRESH frame; execution as the
  * count() that follows). Bench-identical session (local[32], 32 shuffle
  * partitions, UTC). Usage:
  *   runMain graft.tools.R17PlanDump <tag> [sfDir] [gate,gate,...]
  */
object R17PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.length > 0) args(0) else "before"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val gates =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("tpch_q5", "tpch_q7", "tpch_q8", "tpch_q18", "tpch_q10",
        "knn_graph_lsh", "dedup_incremental_durable", "facade_ivfpq_knn",
        "knn_prefilter_ivfpq", "dedup_embedding_incremental", "dedup_semantic",
        "hybrid_batch", "text_bm25", "multimodal_mp4_h264", "knn_batch_sq8",
        "ann_pq_residual_exact", "dedup_semantic_trained", "knn_l2",
        "hybrid_batch_graph", "save_load_pq_residual")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Path.of("plans/r17"))
    graft.Queries.prewarm(spark, sfDir)
    gates.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        fn(spark, sfDir).count() // warm memos/codegen
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        Files.writeString(Path.of(s"plans/r17/${name}_$tag.txt"), plan)
        println(f"[plandump] $name%-30s build+plan=${(t1 - t0) / 1e9}%6.3f s " +
          f"exec=${(t2 - t1) / 1e9}%6.3f s")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
