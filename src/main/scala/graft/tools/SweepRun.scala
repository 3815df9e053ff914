package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted registry sweep with per-gate walls (round 14, r13 VERDICT
  * #10): runs a caller-chosen gate list against an arbitrary sf dir and
  * prints one line per gate — wall seconds, row count, or the fail-fast
  * message. Exists because Verify writes parquet but does not time, and
  * Bench times but runs its own fixed prewarm + full-registry protocol;
  * the independent-sf10 sweep needs per-gate attribution over a SUBSET
  * (the inherently-quadratic exact arms are excluded by the same pricing
  * rule that guards them — see SCALE.md round 14). Dev harness — not
  * driver contract.
  *
  * Usage: SweepRun <sfDir> <comma-separated gate names> */
object SweepRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown gates: ${unknown.mkString(",")}")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[sweep] $n rows=$c wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        println(f"[sweep] $n FAILED after ${(System.nanoTime() - t0) / 1e9}%.1f s: " +
          Option(e.getMessage).getOrElse(e.getClass.getName).replace('\n', ' ').take(300))
      }
    }
    spark.stop()
  }
}
