package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-17 whole-surface attribution (guide §1.2 step 1): per gate, the
  * WARM-run Spark job count and wall — at gate data volumes the dominant
  * cost is driver-synchronized rounds (job launches), so this table ranks
  * where plan-shape work (fewer actions, fewer materialized exchanges)
  * can actually move the bench. Protocol: every gate runs once unscored
  * (pays memoized builds + codegen), then once timed; one JVM, one
  * session, prewarm first — the same warm steady state the bench's
  * median-of-3 reads. Usage: runMain graft.tools.JobCountAudit [sfDir]
  */
object JobCountAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    graft.Queries.prewarm(spark, sfDir)
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warm
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Some((name, jobs.get() - j0, dt))
      } catch { case e: Throwable =>
        System.err.println(s"[jobaudit] $name FAILED: ${e.getMessage}"); None
      }
    }
    println(f"${"gate"}%-34s jobs  warm_s")
    rows.sortBy(-_._3).foreach { case (n, j, t) =>
      println(f"[jobaudit] $n%-34s $j%4d  $t%7.3f")
    }
    println(f"[jobaudit] TOTAL jobs=${rows.map(_._2).sum} wall=${rows.map(_._3).sum}%.1f s")
    spark.stop()
  }
}
