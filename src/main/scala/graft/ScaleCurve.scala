package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale curves for the dedup tier (r2 VERDICT next-round #9):
  * build k× replicas of the sf0.1 corpus in /tmp and time each dedup
  * operator at every factor, so the sub-quadratic claims in SCALE.md are
  * measured, not asserted.
  *
  * Replication preserves the dup structure WITHIN each copy and suppresses
  * it ACROSS copies, so ground-truth output (and honest work) grows ~k:
  *  - documents: every whitespace token gets a per-copy suffix — shingle
  *    sets replicate exactly within a copy and are disjoint across copies;
  *  - embeddings: per-copy Rademacher sign flip s_k (md5-derived ±1 per
  *    dim). cos(s_k⊙v, s_k⊙w) = cos(v, w) exactly (s² = 1), while for
  *    j ≠ k the product pattern s_j⊙s_k is ~uniform ±1, driving cross-copy
  *    cosines to ~0 — intra-copy near-dup structure replicates bit-exactly,
  *    cross-copy pairs stay out of the 0.45-threshold result set.
  *
  * Args: [baseSfDir] [outRoot] [factors CSV] [names CSV]. Prints one JSON
  * line per (factor, query) and a summary line. Dev harness (like
  * Profile) — not part of the driver contract. The names arg (round 12,
  * r11 VERDICT #5) points the same replication harness at any doc/
  * embedding-shaped gate subset — e.g. the scale-shaped tier (graph/BM25
  * builds, knn_graph, the dedup funnel) at factors 10,100 for the
  * sf10-equivalent decade probe. */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val factors = (if (args.length > 2) args(2) else "1,2,5,10")
      .split(",").map(_.trim.toInt).toSeq
    val names =
      (if (args.length > 3)
        args(3)
      else "dedup_exact,dedup_jaccard,dedup_minhash,dedup_simhash," +
        "dedup_embedding,dedup_embedding_banded,winnow_fp,containment," +
        "containment_incremental").split(",").map(_.trim).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def signs(k: Int, dim: Int): Array[Double] = Array.tabulate(dim) { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"scale_${k}_$i".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) 1.0 else -1.0
    }

    def build(f: Int): String = {
      val dir = s"$outRoot/x$f"
      if (!new java.io.File(s"$dir/_DONE").exists) {
        val docs = spark.read.parquet(s"$base/documents.parquet")
        val embs = spark.read.parquet(s"$base/embeddings.parquet")
        val idStep = 10000000L
        (0 until f).map { k =>
          docs.withColumn("doc_id", col("doc_id") + lit(k * idStep))
            // suffix EVERY token: within-copy shingles replicate exactly,
            // cross-copy shingle spaces are disjoint
            .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1~c$k"))
        }.reduce(_ unionAll _)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
        (0 until f).map { k =>
          val s = graft.functions.VectorFunctions.vecLit(signs(k, 64))
          embs.withColumn("vec_id", col("vec_id") + lit(k * idStep))
            .withColumn("embedding",
              zip_with(col("embedding").cast("array<double>"), s, (x, sg) => x * sg))
        }.reduce(_ unionAll _)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        new java.io.File(s"$dir/_DONE").createNewFile()
      }
      dir
    }

    val rows = for (f <- factors; dir = build(f); name <- names) yield {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (cold, warm, n) = (runs.head._1, runs.last._1, runs.head._2)
      println(f"""{"factor":$f,"query":"$name","rows":$n,"cold_s":$cold%.2f,"warm_s":$warm%.2f}""")
      (f, name, n, cold, warm)
    }
    println("factor | " + names.mkString(" | "))
    factors.foreach { f =>
      val r = rows.filter(_._1 == f)
      println(f"x$f%-5d | " + names.map(n =>
        f"${r.find(_._2 == n).get._5}%.1fs/${r.find(_._2 == n).get._3}%d").mkString(" | "))
    }
    spark.stop()
  }
}
