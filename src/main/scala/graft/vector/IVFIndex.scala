package graft.vector

import graft.functions.VectorFunctions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** IVF (inverted-file) approximate nearest neighbor — the Spark-native
  * realization of the reference's IVF-PQ coarse quantizer (faiss.IndexIVFPQ,
  * local_db.py:50–52) and the capability substitute for its HNSW index
  * (SURVEY §2.3-K5/K6: a data-parallel graph walk does not exist; IVF's
  * `nprobe` plays the `ef_search` recall-knob role).
  *
  * The index is data, not a live object: `centroids(cluster, centroid)`
  * (≤ nlist rows — driver-collectible by construction, the same way FAISS
  * keeps the coarse quantizer in RAM) and `assignments(id, cluster, vector)`
  * repartitioned by cluster. A probe ranks centroids driver-side (O(nlist)
  * scalar work), then scans only the `nprobe` nearest clusters — at scale,
  * with assignments written `partitionBy(cluster)`, that is partition-pruned
  * I/O, reading nprobe/nlist of the data.
  *
  * Training replicates the reference's degrade ladder (local_db.py:86–111):
  * tiny corpora shrink the cluster count (`max(1, min(4, n/2))`), and
  * anything unclusterable falls back to a single cluster = effectively flat.
  */
final class IVFIndex(val centroids: Array[(Int, Array[Double])],
                     val assignments: DataFrame,
                     val nlist: Int) {

  /** Rank centroids by squared L2 to the query, driver-side. */
  def probeOrder(query: Array[Double]): Array[Int] =
    centroids.sortBy { case (_, c) =>
      var s = 0.0; var i = 0
      while (i < math.min(c.length, query.length)) { val d = c(i) - query(i); s += d * d; i += 1 }
      s
    }.map(_._1)

  /** Exact top-k over the `nprobe` nearest clusters only. Same output
    * contract as [[ExactKNN.topK]]: (id, score), score = 1/(1+d²). */
  def search(query: Array[Double], k: Int, nprobe: Int,
             metric: ExactKNN.Metric = ExactKNN.L2Sq): DataFrame = {
    val probed = probeOrder(query).take(math.max(1, nprobe)).toSeq
    ExactKNN.topK(
      assignments.where(col("cluster").isin(probed: _*)),
      "id", "vector", query, k, metric)
  }
}

object IVFIndex {

  /** Effective cluster count after the reference's tiny-dataset shrink
    * (local_db.py:86–97). */
  def effectiveClusters(n: Long, nlist: Int): Int =
    if (n >= nlist) nlist
    else math.max(1, math.min(4, (n / 2).toInt))

  /** reference nprobe default: max(1, nlist // 10) (local_db.py:52). */
  def defaultNprobe(nlist: Int): Int = math.max(1, nlist / 10)

  /** Fit k-means over (idCol, vecCol) and materialize the index frames.
    * MLlib KMeans is the scalable trainer (map-side cost aggregation); the
    * fitted centers are by definition ≤ nlist vectors, so collecting them is
    * bounded, not data-sized. */
  def build(data: DataFrame, idCol: String, vecCol: String,
            nlist: Int, seed: Long = 42L): IVFIndex = {
    val n = data.count()
    val k = effectiveClusters(n, nlist)
    if (k < 2) {
      // single-cluster degenerate index: everything in cluster 0 — a probe
      // scans the full table, i.e. effectively the flat index (the terminal
      // rung of the reference's fallback ladder, local_db.py:101–111;
      // MLlib KMeans requires k ≥ 2, so no training happens here).
      val assigned = data
        .select(col(idCol).as("id"), col(vecCol).as("vector"), lit(0).as("cluster"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      return new IVFIndex(Array((0, Array.empty[Double])), assigned, 1)
    }
    val feats = data.select(col(idCol).as("id"), col(vecCol).as("vector"),
        array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20).fit(feats)
    val assigned = model.transform(feats)
      .select(col("id"), col("vector"), col("prediction").as("cluster"))
      .repartition(col("cluster"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    assigned.count() // materialize before unpersisting features
    feats.unpersist()
    val centers = model.clusterCenters.zipWithIndex.map { case (v, i) => (i, v.toArray) }
    new IVFIndex(centers, assigned, k)
  }

  /** Restore from frames persisted by save (centroids small, collect). */
  def fromFrames(centroidsDf: DataFrame, assignments: DataFrame, nlist: Int): IVFIndex = {
    val centers = centroidsDf.select(col("cluster"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    new IVFIndex(centers, assignments, nlist)
  }

  def centroidsToDf(spark: SparkSession, index: IVFIndex): DataFrame = {
    import spark.implicits._
    index.centroids.toSeq.toDF("cluster", "centroid")
  }
}
