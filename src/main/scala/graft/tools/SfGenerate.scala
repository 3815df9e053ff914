package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** INDEPENDENT sf-scale generation of `documents` + `embeddings`
  * (round 13, r12 VERDICT #7 / missing #4): the sf1 verification sweeps
  * so far ran on [[SfReplicate]]'s structured replicas — fine as a
  * scaling probe but correlated with the base data by construction.
  * This tool generates fresh tables with the DRIVER'S schema and
  * measured distributions but an UNRELATED seed and generator:
  *
  *  - documents(doc_id, text, lang, source, n_chars): dense ids; text =
  *    10–100 words drawn from the driver's 31-word vocabulary
  *    (measured: min 10 / max 100 / mean 54 words); lang en ≈ 40%,
  *    de/es/fr/zh ≈ 15% each; source ∈ src0..src19; ~0.2% planted
  *    exact duplicates (the measured distinct-text deficit);
  *  - embeddings(vec_id, embedding float[64], label): unit-norm
  *    Gaussian directions (measured: ‖v‖ = 1 exactly, component
  *    std = 1/8, no label structure), label uniform 0..9.
  *
  * Per-row determinism comes from splittable counter hashing (id-keyed
  * LCG steps), so any row regenerates independently of partitioning.
  * Usage: SfGenerate <outDir> [nDocs] [nVecs] [seed] — writes ONE
  * parquet file per table (the DuckDB-oracle layout), overwriting any
  * replica tables already in the dir. Dev harness — not driver
  * contract. */
object SfGenerate {

  private val vocab = Array("a", "agg", "batch", "big", "column", "customer",
    "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "the", "value", "vector", "window")
  private val langs = Array("en", "de", "es", "fr", "zh")

  /** Deterministic per-(id, stream, step) uniform long — splitmix64 over
    * a combined counter, so rows are independent of partitioning. */
  private def mix(seed: Long, id: Long, stream: Long, step: Long): Long = {
    var z = seed ^ (id * 0x9E3779B97F4A7C15L) ^ (stream * 0xC2B2AE3D27D4EB4FL) ^
      (step * 0x165667B19E3779F9L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def u(seed: Long, id: Long, stream: Long, step: Long, n: Int): Int =
    (((mix(seed, id, stream, step) >>> 1) % n).toInt)

  private[tools] def docText(seed: Long, id: Long): String = {
    // ~0.2% exact duplicates: every 500th id repeats its block head
    val src = if (id % 500 == 499 && id >= 499) id - 499 else id
    val n = 10 + u(seed, src, 1, 0, 91)
    (0 until n).map(k => vocab(u(seed, src, 2, k, vocab.length))).mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_sf1_ind")
    val nDocs = if (args.length > 1) args(1).toLong else 50000L
    val nVecs = if (args.length > 2) args(2).toLong else 20000L
    val seed = if (args.length > 3) args(3).toLong else 20260815L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def wr(df: DataFrame, t: String): Unit = { // one FILE per table
      val tmp = s"$out/_tmp_$t"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dir = new java.io.File(tmp)
      val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      if (parts.length != 1) sys.error(s"expected one part file for $t")
      val dest = new java.io.File(s"$out/$t.parquet")
      if (dest.exists) dest.delete()
      if (!parts.head.renameTo(dest)) sys.error(s"rename failed for $t")
      dir.listFiles().foreach(_.delete()); dir.delete()
    }

    val docs = spark.range(nDocs).as[Long].mapPartitions(_.map { id =>
      val text = docText(seed, id)
      val lr = u(seed, id, 3, 0, 100)
      val lang = if (lr < 40) "en" else langs(1 + (lr - 40) / 15 min 4)
      (id, text, lang, s"src${u(seed, id, 4, 0, 20)}", text.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    wr(docs, "documents")

    val embs = spark.range(nVecs).as[Long].mapPartitions(_.map { id =>
      // Box-Muller over splitmix uniforms: 64 gaussians, unit-normalized
      val g = new Array[Double](64)
      var k = 0
      while (k < 64) {
        val u1 = ((mix(seed, id, 5, k) >>> 11).toDouble + 0.5) / (1L << 53).toDouble
        val u2 = ((mix(seed, id, 6, k) >>> 11).toDouble + 0.5) / (1L << 53).toDouble
        g(k) = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
        k += 1
      }
      val norm = math.sqrt(g.map(x => x * x).sum)
      (id, g.map(x => (x / norm).toFloat).toSeq, u(seed, id, 7, 0, 10))
    }).toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "embedding", "cast(label as int) as label")
    wr(embs, "embeddings")

    val nD = spark.read.parquet(s"$out/documents.parquet").count()
    val nV = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"[sfgen] built $out: documents=$nD embeddings=$nV seed=$seed")
    spark.stop()
  }
}
