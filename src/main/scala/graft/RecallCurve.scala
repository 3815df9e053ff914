package graft

import graft.vector.{ExactKNN, IVFIndex, LSHIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Recall@10 curves for the HNSW capability substitutes at the facade's
  * ef_search mapping (r4 VERDICT #9): IVF with nprobe = efSearch/10 and
  * LSH with multiprobe radius = efSearch/50, measured against the exact
  * scan on the real embeddings and on a ×k Rademacher replica (the
  * SCALE.md scheme: per-copy sign flips preserve intra-copy geometry
  * exactly and randomize cross-copy cosines). Dev harness like Profile —
  * not part of the driver contract.
  *
  * Args: [sfDir] [factor] [nQueries]. Prints one line per configuration. */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 1
    val nQueries = if (args.length > 2) args(2).toInt else 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def signs(k: Int, dim: Int): Array[Double] = Array.tabulate(dim) { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"scale_${k}_$i".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) 1.0 else -1.0
    }

    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val emb =
      if (factor <= 1) base
      else (0 until factor).map { k =>
        val s = signs(k, 64)
        base.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          expr(s"transform(embedding, (x, i) -> cast(x as double) * element_at(array(${s.mkString(",")}), i + 1))")
            .cast("array<float>").as("embedding"))
      }.reduce(_ unionByName _)
    val cached = emb.persist(StorageLevel.MEMORY_AND_DISK)
    val n = cached.count()
    println(s"[recall] corpus $dir x$factor -> $n vectors")

    // deterministic query sample from the ORIGINAL copy
    val queries = base.orderBy(xxhash64(col("vec_id"), lit(7L))).limit(nQueries)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))

    def topIds(df: DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val exact = queries.map { case (qid, q) =>
      qid -> topIds(ExactKNN.topK(cached, "vec_id", "embedding", q, 10))
    }.toMap

    val ivf = IVFIndex.build(cached, "vec_id", "embedding", nlist = 100)
    val clusterSizes = ivf.assignments.groupBy(col("cluster")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (efSearch <- Seq(10, 50, 100, 200, 500, 1000)) {
      val nprobe = math.max(1, efSearch / 10)
      var scanned = 0L
      val r = queries.map { case (qid, q) =>
        scanned += ivf.probeOrder(q).take(nprobe).map(c => clusterSizes.getOrElse(c, 0L)).sum
        topIds(ivf.search(q, 10, nprobe)).intersect(exact(qid)).size / 10.0
      }.sum / queries.length
      val frac = scanned.toDouble / (n * queries.length)
      println(f"[recall] ivf  efSearch=$efSearch%4d nprobe=$nprobe%3d/100  recall@10 = $r%.3f  scanned = ${frac * 100}%5.1f%%")
    }
    ivf.dispose()

    for ((tables, bl) <- Seq((16, 0.25), (4, 0.1), (2, 0.05))) {
      val lsh = LSHIndex.build(cached, "vec_id", "embedding",
        numHashTables = tables, bucketLength = bl)
      for (efSearch <- Seq(0, 50, 100)) {
        val radius = efSearch / 50
        var scanned = 0L
        val r = queries.map { case (qid, q) =>
          scanned += lsh.candidateCount(q, radius)
          topIds(lsh.search(q, 10, probeRadius = radius)).intersect(exact(qid)).size / 10.0
        }.sum / queries.length
        val frac = scanned.toDouble / (n * queries.length)
        println(f"[recall] lsh  efSearch=$efSearch%4d radius=$radius%2d tables=$tables%2d bl=$bl%.2f  recall@10 = $r%.3f  scanned = ${frac * 100}%5.1f%%")
      }
      lsh.dispose()
    }
    spark.stop()
  }
}
