package graft.vector

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Random-projection LSH ANN — the second capability substitute for the
  * reference's HNSW index (SURVEY §2.3-K5 option (a); IVFIndex is option
  * (b)). MLlib's BucketedRandomProjectionLSH hashes vectors into buckets of
  * `bucketLength`-wide random projections; `numHashTables` plays the
  * `ef_search`-style recall knob (more tables → more candidates → higher
  * recall). A query probes only rows sharing a bucket in some table —
  * candidate-bounded like the IVF probe, but data-independent (no training).
  */
final class LSHIndex(val model: BucketedRandomProjectionLSHModel,
                     val hashed: DataFrame) {

  /** Top-k by LSH candidate filter + exact distance on candidates. Output
    * contract matches [[ExactKNN.topK]]: (id, score), score = 1/(1+d²)
    * (the reference's squared-L2 score discipline, SURVEY §2.5.1). */
  def search(query: Array[Double], k: Int): DataFrame = {
    val knn = model.approxNearestNeighbors(hashed, Vectors.dense(query), k, "dist")
    knn.select(col("id"),
        (lit(1.0) / (lit(1.0) + col("dist") * col("dist"))).as("score"))
      .orderBy(col("score").desc, col("id").asc)
  }
}

object LSHIndex {
  def build(data: DataFrame, idCol: String, vecCol: String,
            numHashTables: Int = 4, bucketLength: Double = 2.0,
            seed: Long = 42L): LSHIndex = {
    val feats = data.select(col(idCol).as("id"),
        array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength)
      .setNumHashTables(numHashTables)
      .setSeed(seed)
      .setInputCol("features")
      .setOutputCol("hashes")
      .fit(feats)
    // pre-hash the corpus once so every query skips the transform
    val hashed = model.transform(feats).persist(StorageLevel.MEMORY_AND_DISK)
    new LSHIndex(model, hashed)
  }
}
