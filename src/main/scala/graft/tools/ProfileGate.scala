package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-gate profiler: runs one named gate N times against one sf
  * dir and prints per-run wall seconds plus Spark job counts — the tool
  * behind the "attribute before optimizing" bench discipline (r5 VERDICT
  * #1). Usage: runMain graft.tools.ProfileGate <gate> [sfDir] [runs]. */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val gate = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    val listener = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    sc.addSparkListener(listener)
    val fn = graft.SparkEntry.queries(gate)
    (1 to runs).foreach { i =>
      val j0 = listener.jobs.get()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $gate run $i: $dt%.3f s, rows=$n, jobs=${listener.jobs.get() - j0}")
    }
    spark.stop()
  }
}
