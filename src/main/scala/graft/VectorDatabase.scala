package graft

import graft.model.Manifest
import graft.text.BM25
import graft.vector.{ExactKNN, IVFIndex}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** The reference engine's public API surface (VectorDatabase,
  * local_db.py:11–401), re-expressed over one canonical DataFrame
  *
  * {{{ id LONG, doc STRING, vector ARRAY<FLOAT>, meta STRING (JSON) }}}
  *
  * plus derived index frames (BM25 postings, IVF centroids/assignments) —
  * an "index" here is data, not a live C++ object (SURVEY §1.3).
  *
  * Contracts preserved from the reference (SURVEY §2.5):
  *  - append-only, dense rowids 0..N−1 assigned in insert order (ldb:68)
  *  - metadata exact-match is *typed* ("1250.75" ≠ 1250.75; ldb:308) — values
  *    compare through canonical-JSON rendering of a VARIANT extraction
  *  - `queryMetadata` top_k is a head over ascending ids, not a rank (ldb:317)
  *  - empty-DB: queryVector/queryMetadata/hybridSearch → empty;
  *    queryText → IllegalStateException (ldb:127–128, 158–160, 300, 346)
  *  - IVF degrade ladder on tiny corpora; effective index type is observable
  *    via repr/manifest (ldb:86–111; SURVEY §2.5.8)
  *  - unknown index type on load → flat; missing index artifacts → error
  *    (test_local_db.py:164–220)
  *  - ties break (score desc, id asc) — the reference leaves ties to numpy
  *    argsort; we pin them (SURVEY §2.5.7)
  *
  * Deliberate divergence (SURVEY §2.5.2): `preFilter` is a true pushdown
  * (filter before ranking) by default — strictly better recall than the
  * reference's post-intersection; set `faithfulPreFilter=true` for the
  * reference's search-then-intersect order.
  */
class VectorDatabase private (
    val spark: SparkSession,
    private var df: DataFrame,
    private var manifestVar: Manifest,
    private var nRows: Long) {

  import VectorDatabase._

  def manifest: Manifest = manifestVar
  def dim: Int = manifestVar.dim

  // ---- derived indexes, invalidated on add (≙ full rebuild per add,
  // ldb:73–75 — ours rebuilds lazily on next use) ----
  private var bm25Var: Option[BM25.Index] = None
  private var ivfVar: Option[IVFIndex] = None

  private def bm25: BM25.Index = bm25Var.getOrElse {
    val b = BM25.build(df, "id", "doc"); bm25Var = Some(b); b
  }

  private def ivf: IVFIndex = ivfVar.getOrElse {
    val b = IVFIndex.build(df, "id", "vector", manifestVar.ivfClusters)
    // tiny-corpus shrink is observable: a 1-cluster IVF is effectively flat
    // (≙ the reference mutating index_type on train fallback, ldb:101–111)
    if (b.nlist <= 1 && manifestVar.effectiveType == "ivf")
      manifestVar = manifestVar.copy(effectiveType = "flat")
    ivfVar = Some(b); b
  }

  private def invalidate(): Unit = {
    bm25Var = None
    ivfVar.foreach(_.assignments.unpersist())
    ivfVar = None
  }

  // ---------------------------------------------------------------------
  // S2 add — batch insert with dense-id append (ldb:56–113)
  // ---------------------------------------------------------------------

  /** Driver-side batch append, the reference's `add` signature. */
  def add(docs: Seq[String], vectors: Seq[Array[Float]],
          metas: Option[Seq[Map[String, Any]]] = None): Unit = {
    require(docs.length == vectors.length, "docs and vectors must align")
    vectors.foreach(v => require(v.length == dim,
      s"vector dim ${v.length} != collection dim $dim")) // ≙ ldb:66 assert
    val ms = metas.getOrElse(Seq.fill(docs.length)(Map.empty[String, Any]))
    require(ms.length == docs.length, "metas must align with docs")
    val rows = docs.indices.map { i =>
      Row(nRows + i, docs(i), vectors(i).toSeq, renderJson(ms(i)))
    }
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 10000 + 1)), schema)
    appendFrame(batch, rows.length.toLong)
  }

  /** Bulk distributed append with dense ids, no global sort/window: sort by
    * `orderCol` once (range-partitioned — the total order dense ids require,
    * SURVEY §7.3), then assign `offset + partitionStart + positionInPart`
    * via per-partition counts (O(#partitions) driver state, two passes,
    * no single-task bottleneck — the scalable zipWithIndex shape). */
  def addBulk(batch: DataFrame, docCol: String, vecCol: String,
              metaJsonCol: Option[String], orderCol: String): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val prepared = batch.select(
      col(docCol).cast("string").as("doc"),
      col(vecCol).cast("array<float>").as("vector"),
      metaJsonCol.map(c => col(c).cast("string")).getOrElse(lit("{}")).as("meta"),
      col(orderCol).as("__ord"))
      .sortWithinPartitions(col("__ord"))
      .sort(col("__ord")) // range partition + local sort = total order
    val counts = prepared.select(spark_partition_id().as("p"))
      .groupBy(col("p")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = if (counts.isEmpty) 0 else counts.keys.max + 1
    val offsets = new Array[Long](math.max(nParts, 0))
    var acc = nRows
    for (p <- 0 until nParts) { offsets(p) = acc; acc += counts.getOrElse(p, 0L) }
    val offsetsDf = offsets.toSeq.zipWithIndex.map { case (o, p) => (p, o) }.toDF("p", "__off")
    val withIds = prepared
      .withColumn("p", spark_partition_id())
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("p")).orderBy(col("__ord"))))
      .join(broadcast(offsetsDf), Seq("p"))
      .select((col("__off") + col("__rn") - 1).as("id"),
        col("doc"), col("vector"), col("meta"))
    appendFrame(withIds, acc - nRows)
  }

  private def appendFrame(batch: DataFrame, n: Long): Unit = {
    df = df.unionByName(batch).persist(StorageLevel.MEMORY_AND_DISK)
    nRows += n
    invalidate()
  }

  // ---------------------------------------------------------------------
  // S5–S8 lookups, count, repr (ldb:202–208, 267–274)
  // ---------------------------------------------------------------------

  def getDocument(id: Long): Option[String] =
    df.where(col("id") === id).select(col("doc")).collect().headOption.map(_.getString(0))

  def getMetadata(id: Long): Option[String] =
    df.where(col("id") === id).select(col("meta")).collect().headOption.map(_.getString(0))

  def count: Long = nRows

  override def toString: String =
    s"<VectorDatabase dim=$dim docs=$nRows index_type=${manifestVar.effectiveType}>"

  /** The canonical frame (read-only view). */
  def data: DataFrame = df

  /** Typed accessor for a metadata key as a canonical-JSON string column —
    * numbers render bare, strings quoted, so typed equality is preserved. */
  def metaValue(key: String): Column =
    to_json(try_variant_get(parse_json(col("meta")), s"$$.$key", "variant"))

  // ---------------------------------------------------------------------
  // F1–F4 queryMetadata (ldb:276–321)
  // ---------------------------------------------------------------------

  /** Conjunctive typed exact-match over metadata; `topK` is a HEAD over
    * ascending ids (F4), not a rank. */
  def queryMetadata(conditions: Map[String, Any] = Map.empty,
                    filter: Option[Column] = None,
                    topK: Int = 0): DataFrame = {
    val base =
      if (conditions.nonEmpty)
        df.where(conditions.map { case (k, v) =>
          metaValue(k) === lit(renderJsonValue(v))
        }.reduce(_ && _))
      else filter.map(df.where).getOrElse(df)
    val ids = base.select(col("id")).orderBy(col("id").asc)
    if (topK > 0) ids.limit(topK) else ids
  }

  // ---------------------------------------------------------------------
  // K4–K7, F5–F6 queryVector (ldb:137–200)
  // ---------------------------------------------------------------------

  /** K3 score projection: `returnScores=false` projects ids only — the
    * DataFrame analog of the reference's bare-ids return shape
    * (ldb:197–200; pinned types test:411–457). */
  def queryVector(query: Array[Float], topK: Int = 5,
                  preFilter: Option[Column] = None,
                  postFilter: Option[Column] = None,
                  faithfulPreFilter: Boolean = false,
                  returnScores: Boolean = true): DataFrame = {
    val q = query.map(_.toDouble)
    require(query.length == dim, s"query dim ${query.length} != $dim")
    if (nRows == 0) return emptyResult // ldb:158–160
    val result =
      if (faithfulPreFilter && preFilter.isDefined) {
        // reference order: ANN search first, intersect after (ldb:179–185)
        val top = searchTopK(df, q, topK)
        top.join(df.where(preFilter.get).select(col("id")), Seq("id"), "left_semi")
      } else {
        val base = preFilter.map(df.where).getOrElse(df)
        searchTopK(base, q, topK)
      }
    val post = postFilter match {
      case Some(p) => result.join(df.where(p).select(col("id")), Seq("id"), "left_semi")
      case None => result
    }
    val ordered = post.orderBy(col("score").desc, col("id").asc)
    if (returnScores) ordered else ordered.select(col("id"))
  }

  private def searchTopK(base: DataFrame, q: Array[Double], k: Int): DataFrame =
    manifestVar.effectiveType match {
      case "ivf" if base.eq(df) =>
        ivf.search(q, k, nprobe = math.max(1, manifestVar.efSearch / 10))
      case _ => // flat, or filtered base (IVF assignments don't carry filters)
        ExactKNN.topK(base, "id", "vector", q, k)
    }

  // ---------------------------------------------------------------------
  // K1–K3 queryText (ldb:115–135)
  // ---------------------------------------------------------------------

  def queryText(query: String, topK: Int = 5, returnScores: Boolean = true): DataFrame = {
    if (nRows == 0)
      throw new IllegalStateException("No documents in the database") // ldb:127–128
    val r = bm25.score(query)
      .orderBy(col("score").desc, col("id").asc)
      .limit(topK)
    if (returnScores) r else r.select(col("id"))
  }

  // ---------------------------------------------------------------------
  // K8–K11, F7 hybridSearch (ldb:323–401)
  // ---------------------------------------------------------------------

  /** Weighted fusion of max-normalized BM25 and vector scores; docs failing
    * `filter` (or scoring 0) are never returned (ldb:390–401). Mirrors the
    * reference's physical switch: exact true-L2 brute force at N ≤ 1000,
    * index probe with widened k = max(10·topK, 100) above (ldb:359–378). */
  def hybridSearch(queryText: String, queryVector: Array[Float], topK: Int = 5,
                   vectorWeight: Double = 0.5,
                   filter: Option[Column] = None,
                   returnScores: Boolean = true): DataFrame = {
    if (nRows == 0) return emptyResult // ldb:346–347
    val q = queryVector.map(_.toDouble)
    val t = bm25.score(queryText).withColumnRenamed("score", "ts")
    val v =
      if (nRows <= 1000)
        ExactKNN.scoreAll(df, "id", "vector", q, ExactKNN.L2).withColumnRenamed("score", "vs")
      else {
        val widened = math.min(nRows, math.max(10L * topK, 100L)).toInt // ldb:361
        val probed = searchTopK(df, q, widened).withColumnRenamed("score", "vs")
        df.select(col("id")).join(probed, Seq("id"), "left")
          .select(col("id"), coalesce(col("vs"), lit(0.0)).as("vs")) // score scatter, ldb:365–374
      }
    val tmax = t.agg(max(col("ts")).as("tm"))
    val vmax = v.agg(max(col("vs")).as("vm"))
    val fused = t.join(v, Seq("id"))
      .crossJoin(broadcast(tmax)).crossJoin(broadcast(vmax))
      .select(col("id"),
        (lit(vectorWeight) * when(col("vm") > 0, col("vs") / col("vm")).otherwise(col("vs")) +
         lit(1.0 - vectorWeight) * when(col("tm") > 0, col("ts") / col("tm")).otherwise(col("ts"))).as("score"))
    val masked = filter match {
      case Some(p) => fused.join(df.where(p).select(col("id")), Seq("id"), "left_semi")
      case None => fused
    }
    val r = masked.where(col("score") > 0) // zero-drop, ldb:399–401
      .orderBy(col("score").desc, col("id").asc)
      .limit(topK)
    if (returnScores) r else r.select(col("id"))
  }

  private def emptyResult: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))))

  // ---------------------------------------------------------------------
  // S3 save / S4 load (ldb:210–265)
  // ---------------------------------------------------------------------

  def save(path: String): Unit = {
    df.write.mode("overwrite").parquet(s"$path/data")
    if (manifestVar.effectiveType == "ivf" && nRows > 0) {
      IVFIndex.centroidsToDf(spark, ivf).write.mode("overwrite")
        .parquet(s"$path/index/centroids")
      ivf.assignments.write.mode("overwrite")
        .partitionBy("cluster") // probed-cluster partition pruning at scale
        .parquet(s"$path/index/assignments")
    }
    manifestVar.save(path)
  }
}

object VectorDatabase {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("doc", StringType, nullable = false),
    StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("meta", StringType, nullable = false)))

  /** S1 create — ≙ VectorDatabase(dim, index_type, ...), local_db.py:21–54. */
  def create(spark: SparkSession, dim: Int, indexType: String = "hnsw",
             efConstruction: Int = 200, m: Int = 16, ivfClusters: Int = 100,
             pqCodeSize: Int = 16, efSearch: Int = 50): VectorDatabase = {
    require(Manifest.knownTypes.contains(indexType),
      s"Unknown index type: $indexType") // ≙ ValueError, ldb:53–54
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    new VectorDatabase(spark, empty,
      Manifest(dim, indexType, Manifest.effectiveFor(indexType),
        efConstruction, m, ivfClusters, pqCodeSize, efSearch), 0L)
  }

  /** S4 load. Manifest-driven dispatch; unknown type → flat (handled in
    * Manifest.fromJson); manifest says ivf but index artifacts missing →
    * error (≙ missing faiss.idx crash, test_local_db.py:216–220). */
  def load(spark: SparkSession, path: String): VectorDatabase = {
    val man = Manifest.load(path)
    val data = spark.read.parquet(s"$path/data").persist(StorageLevel.MEMORY_AND_DISK)
    val n = data.count()
    val db = new VectorDatabase(spark, data, man, n)
    if (man.effectiveType == "ivf" && n > 0) {
      val idxPath = new java.io.File(s"$path/index/assignments")
      if (!idxPath.exists())
        throw new IllegalStateException(s"index artifacts missing under $path/index")
      val cents = spark.read.parquet(s"$path/index/centroids")
      val assigns = spark.read.parquet(s"$path/index/assignments")
        .persist(StorageLevel.MEMORY_AND_DISK)
      db.ivfVar = Some(IVFIndex.fromFrames(cents, assigns, man.ivfClusters))
    }
    db
  }

  // ---- canonical JSON rendering (driver-side metadata values) ----

  private[graft] def renderJsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double => if (d == math.floor(d) && !d.isInfinite) f"$d%.1f" else d.toString
    case f: Float => renderJsonValue(f.toDouble)
    case other => renderJsonValue(other.toString)
  }

  private[graft] def renderJson(m: Map[String, Any]): String =
    m.map { case (k, v) => renderJsonValue(k) + ":" + renderJsonValue(v) }
      .mkString("{", ",", "}")
}
