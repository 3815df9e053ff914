package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup arm comparison (round 13, r12 VERDICT #6): drop-set quality
  * of the ANCHOR arm (frozen first-k rows as centroids — the
  * oracle-reproducible gate configuration) vs the TRAINED arm (sample-
  * trained k-means on the unit sphere — the paper's clustering), each
  * measured against the cluster-free IDEAL drop set (a doc drops iff ANY
  * smaller-id doc in the whole corpus clears the threshold — what
  * SemDeDup approximates by only pairing within a cluster). Runs on
  * [[StructuredEmbeddings]]' mixture-of-Gaussians geometry, where
  * clustering quality actually moves the answer (on uniform data every
  * clustering misses equally).
  *
  * Args: [n] [clusters] [k] [threshold]. Dev harness — not driver
  * contract; numbers land in SCALE.md round 13. */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 5000
    val nClusters = if (args.length > 1) args(1).toInt else 20
    val k = if (args.length > 2) args(2).toInt else 20
    val threshold = if (args.length > 3) args(3).toDouble else 0.9
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = StructuredEmbeddings.frame(spark, n, 64, nClusters,
      sigma = 0.1, seed = 42L).cache()
    emb.count()
    def t[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[semprobe] $label: $s%.1f s"); (r, s)
    }
    // cluster-free ideal: exact all-pairs cosine join, larger id drops
    val (ideal, _) = t("ideal (exact all-pairs)")(
      Dedup.embeddingPairs(emb, "vec_id", "embedding", threshold,
          blocks = 32, forceExact = true)
        .select(col("b")).distinct().collect().map(_.getLong(0)).toSet)
    def dropSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("id")).collect().map(_.getLong(0)).toSet
    val (anchor, _) = t("anchor arm")(dropSet(
      Dedup.semanticDrop(emb, "vec_id", "embedding", nAnchors = k, threshold)))
    val (trained, _) = t("trained arm")(dropSet(
      Dedup.semanticDropTrained(emb, "vec_id", "embedding", nClusters = k, threshold)))
    def report(name: String, s: Set[Long]): Unit = {
      val inter = (s intersect ideal).size
      println(f"[semprobe] $name: drops=${s.size} recall_vs_ideal=${
        if (ideal.isEmpty) 1.0 else inter.toDouble / ideal.size}%.3f " +
        f"false_drops=${(s diff ideal).size}")
    }
    println(s"[semprobe] n=$n geomClusters=$nClusters k=$k thr=$threshold ideal_drops=${ideal.size}")
    report("anchor ", anchor)
    report("trained", trained)
    val overlap = (anchor intersect trained).size
    println(f"[semprobe] arm overlap: $overlap of anchor=${anchor.size}/trained=${trained.size}")
    spark.stop()
  }
}
