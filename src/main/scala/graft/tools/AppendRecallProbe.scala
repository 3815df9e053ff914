package graft.tools

import graft.vector.{ExactKNN, GraphIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Intra-batch-neighbor recall for LARGE graph appends (r7 VERDICT #8):
  * `GraphIndex.append` adds no intra-batch k-NN edges by design (hnsw's
  * sequential insert would see earlier batch items; the batched form
  * trades that for one traversal), so batch-internal neighbors are
  * reachable only through ring + old-graph paths. This measures, for a
  * 10% / 30% / 50% append fraction, tuned-beam recall@10 for batch-node
  * queries — overall AND restricted to the true neighbors that are
  * THEMSELVES batch nodes (the population the design choice puts at
  * risk). Dev harness; results recorded in SCALE.md. Args: [sfDir]. */
object AppendRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    for (frac <- Seq(0.1, 0.3, 0.5)) {
      val cut = (n * (1.0 - frac)).toLong
      val base = GraphIndex.build(emb.where(col("vec_id") < cut),
        "vec_id", "embedding", k = 8, nlist = 16, graphNprobe = 4)
      val appended = base.append(emb.where(col("vec_id") >= cut),
        "vec_id", "embedding", k = 8, ef = 64)
      // every 7th batch node as a query — enough mass for stable means
      val qids = (cut until n).filter(i => (i - cut) % 7 == 0)
      val queries = emb.where(col("vec_id") >= cut && (col("vec_id") - cut) % 7 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val exact = ExactKNN.topKBatch(emb, "vec_id", "embedding",
          queries, "qid", "qv", k = 10)
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val got = appended.searchBatch(queries, "qid", "qv", k = 10, ef = 64, maxHops = 6)
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      var num = 0.0; var den = 0.0      // overall recall@10
      var bNum = 0.0; var bDen = 0.0    // recall over intra-batch true neighbors
      qids.foreach { q =>
        val t = exact.getOrElse(q, Set.empty)
        val g = got.getOrElse(q, Set.empty[Long])
        num += (t intersect g).size; den += t.size
        val tb = t.filter(_ >= cut)
        bNum += (tb intersect g).size; bDen += tb.size
      }
      println(f"[appendrecall] frac=$frac%.1f batch=${n - cut} queries=${qids.size} " +
        f"recall@10=${num / den}%.3f intraBatchRecall=${bNum / math.max(1.0, bDen)}%.3f " +
        f"intraBatchShareOfTruth=${bDen / den}%.3f")
      appended.dispose(); base.dispose()
    }
    spark.stop()
  }
}
