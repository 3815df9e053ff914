package graft

import org.apache.spark.sql.SparkSession

/** Scratch: dump formatted physical plans for plan-shape auditing. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("knn_l2", "meta_filter", "point_lookup", "tpch_q1", "text_bm25",
        "knn_graph_lsh", "ann_graph", "text_bm25_incremental")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
