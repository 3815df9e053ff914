package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The LINEAR dedup path executed where the exact funnel refuses
  * (round 15, r14 VERDICT #9): at decade scale `jaccardPairs`'s
  * candidate PRICING correctly refuses (ΣC(prefix_df, 2) over the
  * budget), and the documented fallback is banded MinHash candidates →
  * exact-Jaccard verification of candidates only → connected components
  * under a maxEdges budget. This probe RUNS that recipe end to end on
  * an independent corpus and prints per-stage walls — turning the
  * "refuses fast, use the linear path" advice into a measured row
  * (SCALE.md round 15). Dev harness — not driver contract.
  *
  * Usage: LinearDedupProbe <sfDir> [maxEdges (default 50M)] */
object LinearDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxEdges = if (args.length > 1) args(1).toLong else 50000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    println(s"[lineardedup] corpus: $nDocs docs from $sfDir")

    // stage 0: confirm the EXACT funnel's pricing refusal on this corpus
    // (the reason this probe exists); wall includes the estimate only
    val t0 = System.nanoTime()
    try {
      graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text").count()
      println(f"[lineardedup] exact funnel COMPLETED (corpus below pricing " +
        f"threshold) wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    } catch { case e: IllegalArgumentException =>
      println(f"[lineardedup] exact funnel refused in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s: " +
        e.getMessage.replace('\n', ' ').take(220))
    }

    // stage 1: banded MinHash candidates -> verified pairs (linear by
    // construction: 16 hashes, 4 rows/band, bucket cap 2000)
    val t1 = System.nanoTime()
    val pairs = graft.dedup.Dedup.minhashPairs(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    val w1 = (System.nanoTime() - t1) / 1e9
    println(f"[lineardedup] minhashPairs: $nPairs verified pairs wall=$w1%.1f s")

    // stage 2: connected components under the edge budget
    val t2 = System.nanoTime()
    val cc = graft.dedup.Dedup.connectedComponents(
      pairs.select(col("a"), col("b")), maxEdges = maxEdges)
    val nMembers = cc.count()
    val nClusters = cc.agg(countDistinct(col("cluster"))).head().getLong(0)
    val w2 = (System.nanoTime() - t2) / 1e9
    println(f"[lineardedup] connectedComponents(maxEdges=$maxEdges): " +
      f"$nMembers members in $nClusters clusters wall=$w2%.1f s")

    // keep-set arithmetic: drop every member but one per cluster
    val kept = nDocs - (nMembers - nClusters)
    println(f"[lineardedup] keep set: $kept of $nDocs docs " +
      f"(total wall=${w1 + w2}%.1f s)")
    pairs.unpersist()
    spark.stop()
  }
}
