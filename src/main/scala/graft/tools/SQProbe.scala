package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.vector.{ExactKNN, SQIndex}

/** SQ8 pruning diagnostics for SCALE.md: per-query candidate fraction
  * (how much of the corpus survives the code-bound filter) and wall-clock
  * of the pruned search vs the flat exact scan, at a given sf dir. */
object SQProbe {
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
    val t0 = System.nanoTime()
    val idx = SQIndex.build(emb, "vec_id", "embedding")
    idx.data.count()
    println(f"[sqprobe] build: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    // element-type-agnostic: the sf dirs store float32 embeddings, the
    // ScaleCurve replica dirs store doubles
    def qv(id: Long): Option[Array[Double]] =
      emb.where(col("vec_id") === id).select("embedding")
        .head(1).headOption
        .map(_.getSeq[Number](0).map(_.doubleValue).toArray)
    // tiny/custom dirs may not carry every diagnostic id — skip informatively
    for (qid <- Seq(3L, 17L, 99L, 256L, 441L)) qv(qid) match {
      case None =>
        println(s"[sqprobe] qid=$qid absent from $sfDir — skipped")
      case Some(q) =>
        val cand = idx.candidateCount(q, 10)
        val t1 = System.nanoTime()
        idx.search(q, 10).collect()
        val sq = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        ExactKNN.topK(emb, "vec_id", "embedding", q, 10).collect()
        val flat = (System.nanoTime() - t2) / 1e9
        println(f"[sqprobe] qid=$qid cand=$cand (${100.0 * cand / n}%.1f%%) sq=$sq%.2f s flat=$flat%.2f s")
    }
    spark.stop()
  }
}
