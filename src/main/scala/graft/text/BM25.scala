package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25, decomposed relationally. Parameters and fine print replicate
  * the `rank_bm25.BM25Okapi` defaults the reference depends on
  * (local_db.py:38,73–75): k1=1.5, b=0.75, epsilon=0.25, and the epsilon
  * floor — raw idf `ln((N−df+0.5)/(df+0.5))`; terms with negative raw idf get
  * `epsilon · avg(raw idf over the whole vocabulary)` instead.
  *
  * Tokenization replicates Python's argless `str.split()` (local_db.py:74,129):
  * split on runs of any whitespace, dropping empty tokens.
  *
  * The index is three DataFrames — `postings(id, term, tf)`,
  * `termStats(term, df, idf)`, `docLens(id, dl)` — plus a 1-row `corpus`
  * frame (n, avgdl). At 100 TB these are plain shuffled aggregations that
  * Spark executes as map-side-combined hash aggregates; nothing is collected
  * to the driver. Scoring a query is: explode query terms → broadcast-join
  * term stats (a query has few terms, so the term-side join is a broadcast)
  * → join postings on term → groupBy(id) sum.
  */
object BM25 {

  final case class Params(k1: Double = 1.5, b: Double = 0.75, epsilon: Double = 0.25)

  /** `str.split()`-compatible tokenizer: whitespace runs, no empties. */
  def tokenize(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > lit(0))

  /** Index state. `corpus` is 1 row: (n BIGINT, avgdl DOUBLE). */
  final case class Stats(postings: DataFrame, termStats: DataFrame,
                         docLens: DataFrame, corpus: DataFrame)

  /** Build the BM25 statistics frames from (idCol, textCol) of `docs`.
    * Deterministic batch job ≙ the reference's full rebuild on every add
    * (local_db.py:73–75). */
  def build(docs: DataFrame, idCol: String, textCol: String,
            params: Params = Params()): Stats = {
    val toks = docs.select(col(idCol).as("id"), tokenize(col(textCol)).as("toks"))
    val docLens = toks.select(col("id"), size(col("toks")).cast("double").as("dl"))
    val corpus = docLens.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val postings = toks
      .select(col("id"), explode(col("toks")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfByTerm = postings.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val rawIdf = dfByTerm
      .crossJoin(broadcast(corpus))
      .withColumn("raw_idf", log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    // rank_bm25 epsilon floor: avg over ALL terms of raw idf (negatives included),
    // then negative idfs := epsilon * avg_idf.
    val avgIdf = rawIdf.agg(avg(col("raw_idf")).as("avg_idf"))
    val termStats = rawIdf.crossJoin(broadcast(avgIdf))
      .select(col("term"), col("df"),
        when(col("raw_idf") < 0, lit(params.epsilon) * col("avg_idf"))
          .otherwise(col("raw_idf")).as("idf"))
    Stats(postings, termStats, docLens, corpus)
  }

  /** Score every document for `query` → (id, score). Documents sharing no
    * term with the query score 0.0 but are still present (rankable), matching
    * BM25Okapi.get_scores' dense output (local_db.py:130). Query-term
    * multiplicity multiplies the contribution, as in rank_bm25's loop over
    * query tokens. */
  def score(stats: Stats, query: String, params: Params = Params()): DataFrame = {
    val spark = stats.postings.sparkSession
    import spark.implicits._
    val qTerms = query.trim.split("\\s+").filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toDouble).toSeq
      .toDF("term", "qtf")
    val k1 = params.k1; val b = params.b
    val perTerm = stats.postings
      .join(broadcast(qTerms), Seq("term"))
      .join(broadcast(stats.termStats.join(broadcast(qTerms), Seq("term")).select("term", "idf")), Seq("term"))
      .join(stats.docLens, Seq("id"))
      .crossJoin(broadcast(stats.corpus.select("avgdl")))
      .select(col("id"),
        (col("qtf") * col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))).as("contrib"))
    val matched = perTerm.groupBy("id").agg(sum(col("contrib")).as("score"))
    stats.docLens.select("id")
      .join(matched, Seq("id"), "left")
      .select(col("id"), coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** Convenience: build + score in one call over a (id, text) document table. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String, query: String,
                params: Params = Params()): DataFrame =
    score(build(docs, idCol, textCol, params), query, params)
}
