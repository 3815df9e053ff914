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
  * Round 15 (r14 VERDICT #5): optional PER-GATE WALL BUDGET. The
  * exclusion list used to be the only protection — a mistakenly
  * included quadratic gate hung the whole sweep. With a budget, each
  * gate runs under its own Spark job group; at the deadline the group
  * is cancelled and the gate reports as a named TIMEOUT row (a refusal
  * with attribution, not a hang), then the sweep continues.
  *
  * Usage: SweepRun <sfDir> <comma-separated gate names> [perGateWallSec] */
object SweepRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val budgetSec = if (args.length > 2) args(2).toInt else 0
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
      def wall = (System.nanoTime() - t0) / 1e9
      try {
        if (budgetSec <= 0) {
          val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
          println(f"[sweep] $n rows=$c wall=$wall%.1f s")
        } else {
          // run under a job group so the deadline can cancel mid-stage;
          // driver-side planning before the first job is not cancellable
          // this way, but every long phase of a gate is Spark jobs
          val worker = new Thread(() => {
            spark.sparkContext.setJobGroup(s"sweep-$n",
              s"SweepRun gate $n", interruptOnCancel = true)
            try {
              val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
              println(f"[sweep] $n rows=$c wall=$wall%.1f s")
            } catch { case e: Throwable =>
              val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              if (msg.contains("cancelled") || msg.contains("sweep-"))
                println(f"[sweep] $n TIMEOUT wall=$wall%.1f s " +
                  s"(budget ${budgetSec}s: job group cancelled — a gate " +
                  "this slow at this sf belongs on the exclusion list or " +
                  "behind its pricing guard)")
              else
                println(f"[sweep] $n FAILED after $wall%.1f s: " +
                  msg.replace('\n', ' ').take(300))
            } finally spark.sparkContext.clearJobGroup()
          }, s"sweep-$n")
          worker.start()
          worker.join(budgetSec * 1000L)
          if (worker.isAlive) {
            // ...AndFutureJobs: a gate still in driver-side planning at
            // the deadline has no active jobs to cancel — plain
            // cancelJobGroup would no-op and the gate's LATER jobs would
            // run to completion anyway (observed on dedup_jaccard)
            spark.sparkContext.cancelJobGroupAndFutureJobs(s"sweep-$n")
            worker.join(30000L) // let the cancel surface in the worker
            if (worker.isAlive)
              println(f"[sweep] $n TIMEOUT wall=$wall%.1f s " +
                s"(budget ${budgetSec}s: cancel did not land within 30 s " +
                "— driver-side planning phase; gate thread abandoned)")
          }
        }
      } catch { case e: Throwable =>
        println(f"[sweep] $n FAILED after $wall%.1f s: " +
          Option(e.getMessage).getOrElse(e.getClass.getName).replace('\n', ' ').take(300))
      }
    }
    spark.stop()
  }
}
