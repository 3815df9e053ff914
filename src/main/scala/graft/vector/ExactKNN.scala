package graft.vector

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact (brute-force) K-nearest-neighbor search — the reference's `flat`
  * index (faiss.IndexFlatL2, local_db.py:48, 173–176), re-expressed as a
  * declarative scan-score-topk plan.
  *
  * Physical shape at scale: the distance expression is whole-stage-codegen'd
  * into the Parquet scan projection; `orderBy(dist).limit(k)` is planned as
  * `TakeOrderedAndProject` — per-partition top-k heaps merged at the driver,
  * no global sort, no shuffle of the data. Only (k × partitions) rows ever
  * leave the executors, so this holds at 100 TB as long as k is small.
  */
object ExactKNN {

  sealed trait Metric { def dist(a: Column, b: Column): Column; def score(d: Column): Column }
  /** squared L2 + 1/(1+d) — the reference's scoring (local_db.py:169–176). */
  case object L2Sq extends Metric {
    def dist(a: Column, b: Column): Column = squaredL2(a, b)
    def score(d: Column): Column = distToScore(d)
  }
  /** true L2 + 1/(1+d) — reference hybrid small-N path (local_db.py:377–378). */
  case object L2 extends Metric {
    def dist(a: Column, b: Column): Column = l2(a, b)
    def score(d: Column): Column = distToScore(d)
  }
  /** cosine similarity (higher = closer); dist = −cos so one code path. */
  case object Cosine extends Metric {
    def dist(a: Column, b: Column): Column = -cosine(a, b)
    def score(d: Column): Column = -d
  }

  /** Score every row: (id, score). No top-k — callers compose. */
  def scoreAll(data: DataFrame, idCol: String, vecCol: String,
               query: Array[Double], metric: Metric = L2Sq): DataFrame = {
    val q = vecLit(query)
    data.select(col(idCol).as("id"),
      metric.score(metric.dist(col(vecCol), q)).as("score"))
  }

  /** Single-query top-k: (id, score), score desc, deterministic id-asc
    * tie-break (the reference leaves ties to numpy argsort; we pin them,
    * SURVEY §2.5.7). */
  def topK(data: DataFrame, idCol: String, vecCol: String,
           query: Array[Double], k: Int, metric: Metric = L2Sq): DataFrame =
    scoreAll(data, idCol, vecCol, query, metric)
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)

  /** Batch top-k: every row of `queries` (qidCol, qvecCol) against every row
    * of `data` — the bulk-similarity-join workload Spark is actually good at.
    *
    * Plan: broadcast the (small) query side, so the big side streams through
    * a BroadcastNestedLoopJoin-free `crossJoin(broadcast(...))` with the
    * distance fused into the projection; per-(qid) top-k via window rank.
    * The shuffle is (n_data × n_queries) rows *after* projection to
    * (qid, id, score) — 3 narrow columns — partitioned by qid. For very
    * large n_queries, flip which side is broadcast or use [[IVFIndex]].
    */
  def topKBatch(data: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int, metric: Metric = L2Sq): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id").asc)
    scoredPairs(data, idCol, vecCol, queries, qidCol, qvecCol, metric)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
      .orderBy(col("qid").asc, col("score").desc, col("id").asc)
  }

  /** Same contract as [[topKBatch]], planned through the custom
    * [[graft.plans.TopKPerKey]] operator instead of a window: bounded
    * per-key heaps before AND after the shuffle, so only
    * k × queries × partitions rows shuffle and nothing is fully sorted —
    * the plan shape that survives a 100 TB corpus. Identical results under
    * the (score desc, id asc) total order. */
  def topKBatchHeap(data: DataFrame, idCol: String, vecCol: String,
                    queries: DataFrame, qidCol: String, qvecCol: String,
                    k: Int, metric: Metric = L2Sq): DataFrame =
    graft.plans.TopK.perKey(
      scoredPairs(data, idCol, vecCol, queries, qidCol, qvecCol, metric),
      Seq("qid"), Seq("score" -> true, "id" -> false), k)
      .orderBy(col("qid").asc, col("score").desc, col("id").asc)

  private def scoredPairs(data: DataFrame, idCol: String, vecCol: String,
                          queries: DataFrame, qidCol: String, qvecCol: String,
                          metric: Metric): DataFrame =
    data.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("__qv"))))
      .select(col("qid"), col("id"),
        metric.score(metric.dist(col("__v"), col("__qv"))).as("score"))
}
