package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Kiveris connected-components scale curve on SYNTHETIC DENSE pair
  * graphs (round 14, r13 VERDICT #1, second half): [[CCCurve]] showed
  * the REAL dedup pair graph is sparse by construction (verified pairs
  * ≈ n/500 at every measured sf — the funnel's candidate guards bound
  * what reaches CC), so the dense-graph decade question needs edges
  * manufactured directly. Two adversarial shapes:
  *
  *  - `random`: m hash-derived edges over n nodes — with m ≫ n·ln n one
  *    giant component emerges, the heaviest star-operation load;
  *  - `chain`: a single n-node path — the DEPTH worst case (naive
  *    min-label propagation needs n rounds; Kiveris O(log² n)).
  *
  * Usage: CCBench <shape> <nodes> <edges> — times the FORCED Kiveris
  * loop (driverThreshold = 0) and the auto dispatch, prints one JSON
  * line with walls + the converged cluster count. Dev harness — not
  * driver contract. */
object CCBench {
  def main(args: Array[String]): Unit = {
    val shape = args.headOption.getOrElse("random")
    val nNodes = if (args.length > 1) args(1).toLong else 1000000L
    val nEdges = if (args.length > 2) args(2).toLong else 4000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = (shape match {
      case "chain" =>
        spark.range(nNodes - 1)
          .select(col("id").as("a"), (col("id") + 1).as("b"))
      case _ => // random: endpoints from xxhash64 streams, self-loops dropped
        spark.range(nEdges)
          .select(pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("a"),
            pmod(xxhash64(col("id"), lit(2)), lit(nNodes)).as("b"))
          .where(col("a") =!= col("b"))
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = edges.count()

    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (nodes, tKiveris) = timed {
      graft.dedup.Dedup.connectedComponents(edges, driverThreshold = 0L).count()
    }
    val (clusters, tAuto) = timed {
      graft.dedup.Dedup.connectedComponents(edges)
        .select(col("cluster")).distinct().count()
    }
    println(s"""{"shape":"$shape","nodes_in":$nNodes,"edges":$m,""" +
      s""""nodes_out":$nodes,"clusters":$clusters,""" +
      s""""kiveris_sec":$tKiveris,"auto_sec":$tAuto}""")
    spark.stop()
  }
}
