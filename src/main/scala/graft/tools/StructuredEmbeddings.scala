package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Mixture-of-Gaussians embedding generator (r11 VERDICT #2): the driver's
  * synthetic embeddings are near-uniform, so every ANN recall curve on them
  * degenerates to recall ≈ scanned fraction — the data has no cluster
  * structure for an index to exploit (SCALE.md r4 finding). Real embedding
  * spaces are CLUSTERED (semantic neighborhoods); this generator emits a
  * deterministic mixture-of-Gaussians set with the driver tables' exact
  * schema (vec_id LONG, embedding ARRAY<FLOAT> dim 64, label INT = the
  * generative component), so RecallCurve / GraphRecallCurve / PQProbe run
  * on it unchanged and the recall-vs-scanned-fraction story can be
  * MEASURED on realistic geometry instead of proved around.
  *
  * Geometry: `nClusters` centers uniform in [0,1]^64 (expected inter-center
  * distance ≈ √(64/6) ≈ 3.3), per-point isotropic Gaussian displacement of
  * scale `sigma` (default 0.1 ⇒ intra-cluster distances ≈ σ√(2·64) ≈ 1.1,
  * well inside the inter-center gap — separable but not degenerate).
  * Cluster sizes are Zipf-ish (component i gets weight 1/(1+i mod skewMod))
  * so the index also sees the hub/tail imbalance real corpora have.
  *
  * Dev harness like SfReplicate — not part of the driver contract.
  * Args: [outDir] [n] [nClusters] [sigma] [seed].
  */
object StructuredEmbeddings {

  /** Deterministic driver-side generation: n × dim doubles is tiny (the
    * curves run at n ≤ 20k). Returns rows (vec_id, embedding, label). */
  def rows(n: Int, dim: Int, nClusters: Int, sigma: Double,
           seed: Long): IndexedSeq[(Long, Array[Float], Int)] = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters, dim)(rnd.nextDouble())
    // Zipf-ish component assignment: repeat component i with weight
    // ∝ 1/(1 + i % 7) over a deterministic schedule
    val weights = Array.tabulate(nClusters)(i => 1.0 / (1 + i % 7))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    (0 until n).map { i =>
      val u = rnd.nextDouble() * total
      val c = cum.indexWhere(u <= _) max 0
      val v = Array.tabulate(dim)(d =>
        (centers(c)(d) + sigma * rnd.nextGaussian()).toFloat)
      (i.toLong, v, c)
    }
  }

  def frame(spark: SparkSession, n: Int, dim: Int = 64, nClusters: Int = 50,
            sigma: Double = 0.1, seed: Long = 42L): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("label", IntegerType, nullable = false)))
    val data = rows(n, dim, nClusters, sigma, seed)
      .map { case (id, v, c) => Row(id, v.toSeq, c) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, n / 2000)), schema)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_structured")
    val n = if (args.length > 1) args(1).toInt else 2000
    val nClusters = if (args.length > 2) args(2).toInt else 50
    val sigma = if (args.length > 3) args(3).toDouble else 0.1
    val seed = if (args.length > 4) args(4).toLong else 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    frame(spark, n, 64, nClusters, sigma, seed)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"wrote $out/embeddings.parquet: n=$n clusters=$nClusters sigma=$sigma seed=$seed")
    spark.stop()
  }
}
