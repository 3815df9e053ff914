package graft.sources

import graft.VectorDatabase
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Dataset access for the driver-generated tables and user collections —
  * the engine's source tier. Centralizes the one genuinely tricky read
  * (TIMESTAMP(NANOS) events) and the canonical-collection ingest path.
  */
object Tables {

  /** Memoized table HANDLES per (session, dir, name) — round-17, guide §6
    * (file-listing/metadata caching): `spark.read.parquet` pays directory
    * listing + parquet-footer schema inference on EVERY call (measured
    * 65–91 ms per handle at sf0.1), and the gate surface re-created 1–3
    * handles per query run. A catalog-backed deployment gets this for
    * free (table metadata is cached; Iceberg/Delta avoid listing
    * entirely — guide §6); this map is the bare-path equivalent. Only the
    * resolved LOGICAL handle is cached — nothing is persisted, every
    * action re-scans the parquet files. Bounded: #tables × #sf-dirs ×
    * #sessions, all ≤ a handful per process. */
  private val handles =
    scala.collection.mutable.HashMap.empty[(SparkSession, String, String), DataFrame]

  def parquet(spark: SparkSession, dir: String, name: String): DataFrame =
    handles.synchronized {
      handles.getOrElseUpdate((spark, dir, name),
        spark.read.parquet(s"$dir/$name.parquet"))
    }

  /** The events table's `ts` column has shipped under two physical parquet
    * schemas, so this reader dispatches on the ACTUAL post-read dtype
    * rather than hard-coding either (a 100 TB lake never has one schema):
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects nanos outright, so the
    *    `nanosAsLong` legacy flag surfaces it as a nanos LONG and we
    *    rebuild a micro timestamp. `div` (integral division) is
    *    load-bearing — `/` would promote the ~1.7e18 nanos LONG to DOUBLE,
    *    whose 2^53 mantissa rounds ±128 ns and shifts some timestamps by a
    *    microsecond. Sub-micro precision is zero in the generator.
    *  - TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false): surfaces as
    *    TIMESTAMP_NTZ; downstream windows/watermarks expect the session-tz
    *    TimestampType, so cast (identity on the stored micros under the
    *    UTC session tz all entry points pin).
    *  - already TimestampType (isAdjustedToUTC=true): pass through.
    *
    * The flag is harmless on non-NANOS files — it only changes how a
    * TIMESTAMP(NANOS) physical column is surfaced. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = parquet(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other (expected nanos-as-LONG, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
  }

  def documents(spark: SparkSession, dir: String): DataFrame =
    parquet(spark, dir, "documents")

  /** Fan a low-partition source out to the cluster's parallelism before an
    * expensive per-row projection (interpreted HOFs like the n-gram
    * `transform` cost ~ms/doc): a small parquet table arrives as ONE input
    * split and would otherwise run the whole projection on a single core.
    * On a production many-split table this is a no-op.
    *
    * Few-file detection reads `inputFiles` off the analyzed plan (r4
    * ADVICE: the previous `df.rdd.getNumPartitions` materialized the whole
    * RDD lineage per call and measured pre-AQE splits anyway). File count
    * lower-bounds split count, so this reliably detects only the
    * few-small-files case — exactly the case that starves; a frame with no
    * file source (in-memory test data) reports zero files and is left
    * alone, matching its already-parallel `parallelize` provenance. */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val nFiles = df.inputFiles.length
    if (nFiles > 0 && nFiles < math.max(2, par / 2)) df.repartition(par) else df
  }

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    parquet(spark, dir, "embeddings")
}

/** Bulk collection ingest: build a [[VectorDatabase]] from any DataFrame
  * source (parquet/csv/json/jdbc — whatever `spark.read` produced) through
  * the dense-id `addBulk` path. The reference has no bulk loader (its `add`
  * is a driver-array call, local_db.py:56); at pipeline scale, loading a
  * collection IS a distributed job, so this is first-class here. */
object CollectionLoader {

  /** `orderCol` defines insert order (⇒ rowids); it should be unique. */
  def load(spark: SparkSession, source: DataFrame, dim: Int,
           docCol: String, vecCol: String, orderCol: String,
           metaJsonCol: Option[String] = None,
           indexType: String = "flat"): VectorDatabase = {
    val db = VectorDatabase.create(spark, dim, indexType)
    db.addBulk(source, docCol, vecCol, metaJsonCol, orderCol)
    db
  }

  /** The docs ⋈ embeddings join of the driver test tables as a collection. */
  def fromTestTables(spark: SparkSession, dir: String, dim: Int = 64,
                     indexType: String = "flat"): VectorDatabase =
    load(spark,
      Tables.documents(spark, dir).join(Tables.embeddings(spark, dir),
        col("doc_id") === col("vec_id")),
      dim, "text", "embedding", "doc_id", None, indexType)
}
