package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession

/** Banded embedding-dedup signature sizing probe (round 12): the ×100
  * decade run found [[Dedup.embeddingPairsBanded]]'s DEFAULT 8-bit band
  * signature saturating at 200 k vectors — each band has only 2^8 = 256
  * distinct signatures, so once the corpus far exceeds 2^bits the
  * per-pair collision probability is a CONSTANT (~(1/2)^bits per band for
  * uncorrelated vectors) and candidate volume grows quadratically:
  * n²/2 · bands/2^bits ≈ 1.2 B candidate rows at n = 200 k, which
  * exhausted a 64 GiB heap. The per-bucket occupancy guard (maxBucket)
  * cannot catch this — every bucket is individually small (~n/2^bits);
  * the blow-up is the NUMBER of buckets × quadratic growth within each.
  *
  * The scale rule this probe measures: bitsPerBand must grow with
  * log2(n) — candidates halve per added bit, so bits ≈ log2(n·bands/C)
  * holds candidates at a target C. Since round 13 the rule is ENFORCED:
  * [[Dedup.autoBitsPerBand]] sizes the default from a corpus count, and
  * this probe's default args (bits = 0 = auto) exercise exactly that
  * path — the ×100 kill-run now completes with defaults. Explicit bits
  * (the gates' oracle-pinned 8, or a deliberate mis-size to re-measure
  * the blow-up) are honored verbatim.
  *
  * Args: [dir] [bitsPerBand (0 = auto)] [bands] [threshold]. Prints
  * candidate and result counts + wall seconds. Dev harness — not driver
  * contract. */
object BandedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale12/x100")
    val bits = if (args.length > 1) args(1).toInt else 0
    val bands = if (args.length > 2) args(2).toInt else 16
    val threshold = if (args.length > 3) args(3).toDouble else 0.45
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val t0 = System.nanoTime()
    val pairs = Dedup.embeddingPairsBanded(emb, "vec_id", "embedding",
      threshold, bands = bands, bitsPerBand = bits)
    val rows = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val effBits = if (bits > 0) bits else Dedup.autoBitsPerBand(n, bands)
    println(f"[banded] n=$n bits=$effBits${if (bits == 0) " (auto)" else ""} " +
      f"bands=$bands thr=$threshold pairs=$rows wall=$sec%.1f s " +
      f"(expected occupancy ~ ${n / math.pow(2, effBits)}%.1f/bucket)")
    spark.stop()
  }
}
