package graft.tools

import graft.vector.{ExactKNN, GraphIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tuned-beam recall of the SHARDED graph build at the scale it exists
  * for (round 13, r12 VERDICT #2 done-criterion): mixture-of-Gaussians
  * embeddings at n large enough that `GraphIndex.buildPlan` auto-routes
  * to the sharded construction, recall@10 at ef = 64 against the exact
  * scan. StructuredRecallSpec pins the floor at n = 1 000 with explicit
  * sharded knobs; this probe measures the REAL auto-routed path at
  * 200 k nodes. Args: [n] [clusters] [nQueries]. Dev harness. */
object ShardedRecallProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val nClusters = if (args.length > 1) args(1).toInt else 50
    val nQ = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = StructuredEmbeddings.frame(spark, n, 64, nClusters,
      sigma = 0.1, seed = 42L).cache()
    emb.count()
    val (nl, np) = GraphIndex.buildPlan(n.toLong, -1, -1)
    println(s"[shardedrecall] n=$n plan nlist=$nl nprobe=$np (auto)")
    val t0 = System.nanoTime()
    val gi = GraphIndex.build(emb, "vec_id", "embedding", k = 8)
    println(f"[shardedrecall] build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val qids = (0 until nQ).map(i => ((i * (n / nQ) + 3) % n).toLong)
    val queries = emb.where(col("vec_id").isin(qids.map(Long.box): _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val t1 = System.nanoTime()
    // one batched tuned-beam traversal for all queries (the bounded arm's
    // N-queries-one-walk contract); exact arm via the batch scan
    val got = gi.searchBatch(queries, "qid", "qv", k = 10, ef = 64)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    println(f"[shardedrecall] tuned batch search: ${(System.nanoTime() - t1) / 1e9}%.1f s")
    val exact = ExactKNN.topKBatch(emb, "vec_id", "embedding",
        queries, "qid", "qv", 10)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = qids.map(q => (exact(q) intersect got(q)).size / 10.0)
    println(f"[shardedrecall] recall@10 ef=64: mean ${recalls.sum / recalls.size}%.3f " +
      s"per-query ${recalls.mkString(",")}")
    spark.stop()
  }
}
