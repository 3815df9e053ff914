package graft

import graft.dedup.Dedup
import graft.expr.ExactSum
import graft.functions.VectorFunctions._
import graft.text.{BM25, TextAnalysis}
import graft.vector.{ExactKNN, IVFIndex, LSHIndex, PQIndex}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis tier: language id, quality scoring, token stats, LM surprisal, fingerprinting, containment, sampling/mixture, decontamination, training export.
  *
  * One tier of [[Queries]] (split in round 12, r11 VERDICT #7 -
  * maintainability only): members keep their original relative order and
  * semantics, relaxed from `private` to `private[graft]` so the sibling
  * tier traits and the assembling object see them. The self-type gives
  * every tier access to the full mixed-in surface without a dependency
  * graph between the files. */
private[graft] trait QueriesText { this: Queries.type =>

  // ---------------------------------------------------------------------------
  // Text analysis (graft.text.TextAnalysis)
  // ---------------------------------------------------------------------------

  private[graft] def docsTbl(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "documents")

  private[graft] def langId(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(docsTbl(spark, dir), "doc_id", "text").orderBy(col("id"))

  private[graft] def qualityScore(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(docsTbl(spark, dir), "doc_id", "text").orderBy(col("id"))

  private[graft] def tokenCount(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCount(docsTbl(spark, dir), "doc_id", "text").orderBy(col("id"))

  /** Unigram-LM document scoring (CCNet-style perplexity proxy, Wenzek
    * 2020): build the corpus' own unigram LM, score every document by its
    * mean token log-probability. The LM is vocab-sized (broadcast at any
    * scale); the per-doc score is one shuffle on doc id. */
  private[graft] def lmScoreQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScore(docsTbl(spark, dir), "doc_id", "text").orderBy(col("id"))

  /** Composed training-data funnel: language gate ∧ quality gate ∧ length
    * gate in ONE pass — the filters a pretraining corpus applies before
    * dedup. Rides [[TextAnalysis.features]] (the single-projection fused
    * extractor) so the whole funnel is one corpus scan, zero joins, zero
    * shuffles before the final order. */
  private[graft] def qualityFunnel(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.features(docsTbl(spark, dir), "doc_id", "text")
      .where(TextAnalysis.funnelKeep)
      .select(col("id"), col("pred_lang"), col("quality"))
      .orderBy(col("id"))

  /** Privacy tier: salted-hash pseudonymization + k-anonymity suppression —
    * the scrub a training pipeline applies to behavioral logs before
    * export. user_id is replaced by a keyed SHA-256 (stable join key, no
    * reversible id), and rows whose (event_type, day) cohort has fewer
    * distinct users than 90% of the mean cohort size are suppressed (an
    * adaptive k so the gate is meaningful at every sf). The cohort frame is
    * group-count-sized — broadcast; the only fact-sized work is one
    * hash projection. */
  private[graft] def pseudonymizeQ(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsTbl(spark, dir)
      .withColumn("dd", to_date(col("ts")))
    val cohorts = e.groupBy(col("event_type"), col("dd"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val thr = cohorts.agg((avg(col("n_users")) * 0.9).as("thr"))
    e.join(broadcast(cohorts.crossJoin(broadcast(thr)).where(col("n_users") >= col("thr"))
        .select(col("event_type").as("ct"), col("dd").as("cd"))),
        col("event_type") === col("ct") && col("dd") === col("cd"))
      .select(col("event_id").as("id"),
        sha2(concat(lit("graft:"), col("user_id").cast("string")), 256).as("uid_hash"),
        col("event_type"))
      .orderBy(col("id"))
  }

  /** Sequence packing: documents → fixed-token-budget packs per language —
    * the corpus-to-training-shard assembly step (streaming-chunker
    * formulation: deterministic, one window, SQL-expressible). */
  private[graft] def packSequences(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.packBudgeted(docsTbl(spark, dir), "doc_id", "text",
        groupCol = "lang", budget = 2048L)
      .select(col("grp").as("lang"), col("pack"), col("n_docs"), col("total_tokens"))
      .orderBy(col("lang").asc, col("pack").asc)

  private[graft] def fingerprintQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(docsTbl(spark, dir), "doc_id", "text").orderBy(col("id"))

  /** Memoized persisted winnowing-fingerprint frame (id, fp) — one
    * explode + per-doc window pass, shared by the per-doc summary gate
    * and the containment pair gate. */
  private[graft] val winnowCache = new Memo[DataFrame](memoMax, "winnowCache")(unp)

  private[graft] def winnowFrame(spark: SparkSession, dir: String): DataFrame =
    winnowCache.get(spark, dir)(
      eager(TextAnalysis.winnow(docsTbl(spark, dir), "doc_id", "text")))

  /** Memoized df-cap-guarded fingerprint frame — the maintained
    * containment index (the boilerplate guard is a corpus property; both
    * containment gates run pure pair joins over it). */
  private[graft] val winnowGuardedCache = new Memo[DataFrame](memoMax, "winnowGuardedCache")(unp)

  private[graft] def winnowGuarded(spark: SparkSession, dir: String): DataFrame =
    winnowGuardedCache.get(spark, dir)(
      eager(TextAnalysis.guardFingerprints(winnowFrame(spark, dir), dfCap = 20)))

  /** Per-doc winnowing summary: selected-fingerprint count + the minimum
    * selected value (pins selection, not just cardinality). */
  private[graft] def winnowFp(spark: SparkSession, dir: String): DataFrame =
    winnowFrame(spark, dir).groupBy(col("id"))
      .agg(count(lit(1)).as("n_fp"), min(col("fp")).as("min_fp"))
      .orderBy(col("id"))

  /** Containment / partial-overlap pairs (MOSS winnowing): ≥ 5 shared
    * selected fingerprints, boilerplate fingerprints (df > 20) dropped
    * before the pair join. */
  /** Memoized containment pair frame ([[jaccardPairsCache]] contract):
    * the fp-pair self-join over the guarded index runs once per
    * (session, dir); repeated queries re-sort the tiny pair frame. */
  private[graft] val containPairsCache = new Memo[DataFrame](memoMax, "containPairsCache")(unp)

  private[graft] def containmentQ(spark: SparkSession, dir: String): DataFrame =
    containPairsCache.get(spark, dir)(
        eager(TextAnalysis.containmentPairs(winnowGuarded(spark, dir), dfCap = Int.MaxValue)))
      .orderBy(col("shared").desc, col("a").asc, col("b").asc)

  /** Incremental containment — the production shape (each arriving batch
    * checked for partial overlap against the indexed corpus + itself,
    * batch-vs-corpus and batch-vs-batch joins only, never
    * corpus-vs-corpus), mirroring dedup_incremental's 90/10 cut. The
    * corpus/batch fingerprint frames are id-slices of the memoized full
    * winnowing frame — fingerprints are strictly per-doc, so the corpus
    * slice IS the reusable corpus index. Equal by construction to the
    * full pair set restricted to max-id-in-batch (batch ids sit above
    * the cut), which is what the SQL oracle states. */
  private[graft] def containmentIncrementalQ(spark: SparkSession, dir: String): DataFrame = {
    val cut = incrementalCut(spark, dir)
    val fps = winnowGuarded(spark, dir)
    TextAnalysis.containmentIncremental(
        fps.where(col("id") < cut), fps.where(col("id") >= cut),
        dfCap = Int.MaxValue)
      .orderBy(col("shared").desc, col("a").asc, col("b").asc)
  }

  // ---------------------------------------------------------------------------
  // Dedup suite (graft.dedup.Dedup)
  // ---------------------------------------------------------------------------

  private[graft] def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docsTbl(spark, dir), "doc_id", "text")

  /** Near-dup clusters: exact-Jaccard pairs → Kiveris alternating-star
    * connected components → (id, cluster-min-id). The end step of a dedup
    * pipeline (pick one representative per cluster = where(id = cluster)). */
  /** Memoized cluster assignment (id → component-min id) over the verified
    * near-dup pairs — shared by the cluster gate and the keep-filter gate. */
  private[graft] val clustersCache = new Memo[DataFrame](memoMax, "clustersCache")(unp)

  private[graft] def clustersFrame(spark: SparkSession, dir: String): DataFrame =
    clustersCache.get(spark, dir)(
      Dedup.connectedComponents(
          jaccardPairsFrame(spark, dir).select(col("a"), col("b")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private[graft] def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    clustersFrame(spark, dir).orderBy(col("id"))

  /** The END of the dedup pipeline: the deduplicated corpus itself — keep
    * every document that is its cluster's representative (the component-min
    * id) or in no cluster at all. One anti-join against the (tiny) non-
    * representative id set; the corpus never shuffles. */
  private[graft] def dedupKeep(spark: SparkSession, dir: String): DataFrame =
    docsTbl(spark, dir).select(col("doc_id").as("id"))
      .join(clustersFrame(spark, dir)
          .where(col("id") =!= col("cluster")).select(col("id")),
        Seq("id"), "left_anti")
      .orderBy(col("id"))

  /** Deterministic stratified sample (20 docs per lang) on the TopKPerKey
    * bounded-heap operator — the training-pipeline subsample step, md5-keyed
    * so the oracle replays the draw (graft.operators.Sampling). */
  private[graft] def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratified(
        docsTbl(spark, dir).select(col("doc_id"), col("lang")), "lang", "doc_id", 20)
      .orderBy(col("lang"), col("doc_id"))

  /** Deterministic 10% Bernoulli sample through an md5 threshold — stable
    * under retries/repartitioning where rand()-based sample() is not. */
  private[graft] def sampleHash(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.byHash(docsTbl(spark, dir).select(col("doc_id")), "doc_id", 0.1)
      .orderBy(col("doc_id"))

  /** Training-mixture construction: per-source Bernoulli rates through the
    * md5 draw (graft.operators.Sampling.weightedMix) — three upweighted
    * sources, everything else at the conservative default; profiled per
    * source so the gate pins both the rates and the membership. */
  private[graft] def sampleWeightedMix(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedMix(
        docsTbl(spark, dir).select(col("doc_id"), col("source"), col("n_chars")),
        "source", "doc_id",
        Map("src1" -> 0.75, "src3" -> 0.5, "src7" -> 0.25), 0.1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))

  /** Streaming twin of sample_weighted_mix — the mixture sampler as
    * FILTER-ON-INGEST: each arriving micro-batch passes the per-domain
    * md5-draw cut (stateless append mode, no state store). Membership is
    * a pure per-row function of (id, domain), so batch slicing cannot
    * change the kept set — the gate aggregates the streamed survivors
    * batch-side and shares the batch gate's oracle verbatim. */
  private[graft] def streamingWeightedMix(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingGates.streamDocsTransform(spark, dir,
        Seq("doc_id", "source", "n_chars")) { stream =>
      graft.operators.Sampling.weightedMix(stream, "source", "doc_id",
        Map("src1" -> 0.75, "src3" -> 0.5, "src7" -> 0.25), 0.1)
    }
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))

  /** Streaming twin of decontaminate — eval-set leakage filtering as
    * FILTER-ON-INGEST: the benchmark gram set is collected once
    * (benchmark-sized, the query-vector boundedness contract) and
    * broadcast; each arriving micro-batch scores per ROW against it
    * (stateless append mode — a document is wholly contained in its row,
    * so batch slicing cannot change n_hits). Shares the batch gate's
    * oracle verbatim. */
  private[graft] def streamingDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val test = docsTbl(spark, dir).where(col("doc_id") < 100)
    graft.streaming.StreamingGates.streamDocsTransform(spark, dir,
        Seq("doc_id", "text", "source", "n_chars")) { stream =>
      graft.text.TextAnalysis.decontaminateRows(
        stream.where(col("doc_id") >= 100), "doc_id", "text", test, "text", n = 4)
    }.orderBy(col("id"))
  }

  /** Quality-budget curation cut: per source, take documents in
    * (quality desc, id) order until 600 whitespace tokens are spent
    * (graft.operators.Sampling.takeUntilBudget over the quality_score
    * features). The emitted cum_tok is the exact integer running total —
    * the strongest hash pin the window's engine-portability can get. */
  private[graft] def tokenBudgetCap(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsTbl(spark, dir)
    val scored = graft.text.TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("id"), col("n_tok"), col("quality"))
      .join(docs.select(col("doc_id").as("id"), col("source")), Seq("id"))
    graft.operators.Sampling.takeUntilBudget(scored, "source",
        Seq(col("quality").desc, col("id").asc), col("n_tok"), 600L, "cum_tok")
      .select(col("id"), col("source"), col("n_tok"), col("quality"), col("cum_tok"))
      .orderBy(col("source"), col("cum_tok"))
  }

  /** Exact per-group value quantiles (linear interpolation — Spark
    * `percentile` ≙ DuckDB `quantile_cont`) over the events stream. */
  private[graft] def eventsQuantiles(spark: SparkSession, dir: String): DataFrame =
    eventsTbl(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(percentile(col("value"), lit(0.25)), 4).as("q25"),
        round(percentile(col("value"), lit(0.5)), 4).as("q50"),
        round(percentile(col("value"), lit(0.9)), 4).as("q90"))
      .orderBy(col("event_type"))

  /** KMV approximate-distinct sketch (graft.expr.KMinValues): per-group
    * distinct-user estimate from the k smallest md5 hashes — an O(k)
    * map-side-combined buffer per group where countDistinct shuffles every
    * distinct value. The hash is md5 hex (caller-chosen), so the oracle
    * reproduces the sketch bit for bit — unlike HLL++ register layouts.
    * The exact count rides along to exhibit the estimate's accuracy; at
    * 100 TB you'd run the sketch alone, with NO pre-distinct pass. */
  private[graft] def approxDistinctKmv(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val hashed = eventsTbl(spark, dir)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
    // the sketch aggregates ALONE: mixing countDistinct into the same agg
    // triggers Catalyst's distinct rewrite, which keys the sketch partials
    // by (group, h) — one buffer per DISTINCT HASH, defeating the O(k)-
    // per-group design (PlanShapeSpec pins the group-only keying). The
    // exact count rides in a separate subtree, joined on the tiny group
    // key — at 100 TB you'd drop that subtree and keep only the sketch.
    val sketch = hashed.groupBy(col("event_type"))
      .agg(graft.expr.SketchAgg.kminValues(col("h"), k).as("hs"))
    val exact = hashed.groupBy(col("event_type"))
      .agg(countDistinct(col("h")).as("n_exact"))
    // 13 hex digits = 52 bits: exact in a double on both engines
    val frac = conv(substring(element_at(col("hs"), k), 1, 13), 16, 10).cast("double") /
      lit(4503599627370496.0)
    sketch.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"),
        round(when(size(col("hs")) < k, col("n_exact").cast("double"))
          .otherwise(lit((k - 1).toDouble) / frac), 4).as("est_kmv"))
      .orderBy(col("event_type"))
  }

  /** Skew-safe salted distinct count: salting BY THE DISTINCT KEY puts
    * each distinct user in exactly one (group, salt) shard, so partial
    * distinct counts SUM exactly. The plan is three shuffles, EACH with
    * bounded fan-in per reducer: by (group, salt, user) to dedup, by
    * (group, salt) to count shards (≤ 1/salts of a hot group's distinct
    * set per reducer — the stage plain countDistinct lacks: its group-
    * keyed count funnels a hot group's whole distinct set into one
    * reducer), and by group to sum ≤ `salts` partial rows. The pattern
    * generalizes to aggregates Catalyst has no distinct-rewrite for
    * (collect_set, typed aggregates); results are exact integers. */
  private[graft] def skewDistinct(spark: SparkSession, dir: String): DataFrame = {
    val salts = 16
    eventsTbl(spark, dir)
      .select(col("event_type"), col("user_id"),
        pmod(xxhash64(col("user_id")), lit(salts)).as("__salt"))
      .groupBy(col("event_type"), col("__salt"))
      .agg(countDistinct(col("user_id")).as("pd"), count(lit(1)).as("pn"))
      .groupBy(col("event_type"))
      .agg(sum(col("pd")).as("n_users"), sum(col("pn")).as("n"))
      .orderBy(col("event_type"))
  }

  /** PIVOT (free via Catalyst's pivot rewrite): order revenue by priority ×
    * status, explicit value list so the plan is a single pass (no
    * distinct-values pre-query) and the output schema is static. */
  private[graft] def pivotRevenue(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(ExactSum.centsSum(col("o_totalprice")).cast("double"))
      .orderBy(col("o_orderpriority"))

  /** The SQL surface (graft.expr.GraftFunctions): the same flat KNN scan
    * issued through `spark.sql` against the REGISTERED `vec_squared_l2`
    * Catalyst expression — pins the FunctionRegistry path a SQL-only
    * client uses (SparkSessionExtensions route in GraftSparkExtensions). */
  private[graft] def sqlKnn(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.GraftFunctions.register(spark)
    tbl(spark, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
    val qlit = qvec(spark, dir, 7).map(d => s"CAST($d AS DOUBLE)")
      .mkString("array(", ", ", ")")
    spark.sql(
      s"""SELECT vec_id AS id,
         |       round(1.0/(1.0 + vec_squared_l2(embedding, $qlit)), 4) AS score
         |FROM graft_embeddings ORDER BY score DESC, id ASC LIMIT 10""".stripMargin)
  }

  private[graft] def repetitionScore(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.repetition(docsTbl(spark, dir), "doc_id", "text")
      .orderBy(col("id"))

  /** Benchmark decontamination (round 11): docs < 100 stand in as the
    * held-out evaluation set, the rest as the training corpus; n = 4
    * plays the production n = 8–13 role against the synthetic tables'
    * small vocabulary. Test grams broadcast; the corpus streams. */
  private[graft] def decontaminateQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docsTbl(spark, dir)
    graft.text.TextAnalysis.decontaminate(
        d.where(col("doc_id") >= 100), "doc_id", "text",
        d.where(col("doc_id") < 100), "text", n = 4)
      .orderBy(col("id"))
  }

  /** Vocabulary heavy hitters: top-20 terms by document frequency — one
    * explode → map-side-combined count → TakeOrdered; the corpus-profiling
    * scan every tokenizer/vocab decision starts from. Exact at any scale:
    * the aggregate state is the vocabulary (bounded), never the corpus. */
  private[graft] def termTopk(spark: SparkSession, dir: String): DataFrame =
    docsTbl(spark, dir)
      .select(col("doc_id").as("id"),
        explode(array_distinct(BM25.tokenize(col("text")))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(20)

  /** The END-TO-END training-data pipeline as ONE declarative plan: start
    * from the corpus, keep only near-dup cluster representatives
    * (dedup_keep), require predicted language 'en' (lang_id) and a quality
    * score ≥ 0.8 (quality_score), and emit the training shard's id/token
    * manifest. Each stage is an already-gated operator; this composition
    * gate pins that they also compose: language + quality come from ONE
    * corpus scan (TextAnalysis.features — joining the two single-feature
    * ops would read the corpus twice), and the keep filter is an anti-join
    * against only the TINY non-representative id set, so the composed plan
    * costs barely more than its most expensive stage. */
  private[graft] def trainingExport(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.features(docsTbl(spark, dir), "doc_id", "text")
      .where(col("pred_lang") === "en" && col("quality") >= 0.8)
      .join(clustersFrame(spark, dir)
          .where(col("id") =!= col("cluster")).select(col("id")),
        Seq("id"), "left_anti")
      .select(col("id"), col("n_tok"), col("quality"))
      .orderBy(col("id"))
}
