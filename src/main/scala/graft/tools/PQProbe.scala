package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.vector.PQIndex

/** ADC interval-bound pruning diagnostics for SCALE.md (round 10): per
  * query, how many rows survive the codes-only dLo ≤ T filter (the set
  * [[PQIndex.searchExact]] float-reranks), for trained AND anchor
  * codebooks, at a given sf dir. */
object PQProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.count()
    def qv(id: Long): Option[Array[Double]] =
      emb.where(col("vec_id") === id).select("embedding")
        .head(1).headOption
        .map(_.getSeq[Number](0).map(_.doubleValue).toArray)
    for ((name, idx) <- Seq(
        ("trained(m=16)", PQIndex.build(emb, "vec_id", "embedding", dim = 64, m = 16)),
        ("anchor(m=8,16)", PQIndex.buildFromAnchors(emb, "vec_id", "embedding",
          dim = 64, m = 8, anchorFilter = col("vec_id") < 16)))) {
      val t0 = System.nanoTime()
      val radii = idx.cellRadii(emb, "vec_id", "embedding")
      println(f"[pqprobe] $name radii build: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      for (qid <- Seq(3L, 17L, 99L, 256L, 441L)) qv(qid) match {
        case None => println(s"[pqprobe] qid=$qid absent from $sfDir — skipped")
        case Some(q) =>
          val cand = idx.exactCandidateCount(q, 10, Some(radii))
          val t1 = System.nanoTime()
          idx.searchExact(q, 10, emb, "vec_id", "embedding", Some(radii)).collect()
          val sec = (System.nanoTime() - t1) / 1e9
          println(f"[pqprobe] $name qid=$qid cand=$cand (${100.0 * cand / n}%.1f%%) exact=$sec%.2f s")
      }
      idx.dispose()
    }
    // CLUSTERED regime: same corpus size/dim, 20 Gaussian clusters with
    // sigma = 0.05 — the structure real embedding spaces have. On the
    // near-uniform synthetic corpus above, quantization error (~ the
    // inter-point distance spread) makes every bound overlap (candidates
    // ≈ 100%, exactness intact); with cluster structure the row-error
    // bound separates clusters and pruning bites.
    locally {
      import spark.implicits._
      val rnd = new scala.util.Random(7)
      val centers = Array.fill(20, 64)(rnd.nextDouble())
      val rows = (0 until n.toInt).map { i =>
        val c = centers(i % 20)
        (i.toLong, c.map(x => x + 0.05 * rnd.nextGaussian()).toSeq)
      }
      val emb2 = rows.toDF("vec_id", "embedding").cache()
      emb2.count()
      val idx = PQIndex.build(emb2, "vec_id", "embedding", dim = 64, m = 16)
      val radii = idx.cellRadii(emb2, "vec_id", "embedding")
      for (qid <- Seq(3L, 17L, 99L)) {
        val q = rows(qid.toInt)._2.toArray
        val cand = idx.exactCandidateCount(q, 10, Some(radii))
        println(f"[pqprobe] clustered(20,σ=0.05) qid=$qid cand=$cand (${100.0 * cand / n}%.1f%%)")
      }
      // residual encoding vs raw PQ at the same byte cost (round 10)
      val civf = graft.vector.IVFIndex.build(emb2, "vec_id", "embedding", nlist = 20)
      val res = graft.vector.ResidualPQ.build(civf, dim = 64, m = 16)
      val rawErr2 = idx.codes.agg(avg(pow(col("err"), lit(2.0)))).head().getDouble(0)
      println(f"[pqprobe] clustered err2: raw=$rawErr2%.5f residual=${res.meanErr2}%.5f " +
        f"(x${rawErr2 / res.meanErr2}%.1f smaller)")
      for (qid <- Seq(3L, 17L, 99L)) {
        val q = rows(qid.toInt)._2.toArray
        val cand = res.exactCandidateCount(q, 10)
        println(f"[pqprobe] clustered residual qid=$qid cand=$cand (${100.0 * cand / n}%.1f%%)")
      }
      res.dispose(); civf.dispose()
      idx.dispose()
    }
    spark.stop()
  }
}
