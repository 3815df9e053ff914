package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming ingest for the `events` table — the north-star
  * extension (SURVEY §2.6; the reference is batch-only, README.md:142–148).
  * All transforms are written against plain DataFrames so the SAME code runs
  * batch (finite parquet) and streaming (readStream) — Spark's unified
  * Dataset semantics. At scale the windowed aggregate is an incremental
  * stateful operator with watermark-bounded state; nothing here holds
  * unbounded memory.
  */
object EventStream {

  /** events schema (matches /root/testdata events.parquet modulo the nanos
    * timestamp, which streaming sources deliver as proper timestamps). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of parquet event files. */
  def fromDirectory(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window counts/averages per event_type with a watermark bound —
    * the streaming twin of the batch `events_window` query. State per open
    * window only; late rows beyond `watermark` are dropped. */
  def windowedStats(events: DataFrame, watermark: String = "10 minutes",
                    windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      // exact mean, merge-order independent (a plain double avg flips the
      // 4th decimal at sf0.1 vs the oracle): the 2-dp values sum exactly as
      // LONG cents — graft.expr.ExactSum — which also keeps the streaming
      // state-store agg buffer a single long, not a decimal struct
      .agg(count(lit(1)).as("n"),
        round(graft.expr.ExactSum.centsSum(col("value")) / count(lit(1)), 4)
          .cast("double").as("avg_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("avg_value"))

  /** Start the windowed aggregation into an in-memory sink (for drive-by
    * consumption/testing) or any sink via `format`. */
  def startWindowed(events: DataFrame, queryName: String) =
    windowedStats(events).writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()

  /** Durable sink: watermark-finalized windowed stats appended to parquet
    * with exactly-once file-sink semantics (offset log + file manifest in
    * `checkpoint`). Append mode emits a window once, when the watermark
    * closes it — the contract a downstream batch reader wants. */
  def startWindowedParquet(events: DataFrame, path: String, checkpoint: String,
                           queryName: String) =
    windowedStats(events).writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .queryName(queryName)
      .start()

  /** Gap-based streaming sessionization — the streaming twin of the batch
    * `sessionize` operator (graft.Queries): `session_window` merges events
    * within `gap` of each other into one per-user session that grows across
    * micro-batches; the watermark finalizes sessions once event time passes
    * their close, bounding state to open sessions only. Same output shape
    * as the batch query: (user_id, session_start, n_events, total_value). */
  def sessionized(events: DataFrame, gap: String = "30 minutes",
                  watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"),
        graft.expr.ExactSum.centsSum(col("value")).cast("double").as("total_value"))
      .select(col("user_id"), col("session_start"), col("n_events"), col("total_value"))

  /** Start the sessionization into a named in-memory sink. Append mode:
    * a session row emits once, when the watermark closes it. */
  def startSessionized(events: DataFrame, queryName: String) =
    sessionized(events).writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .start()

  /** Stream-stream interval join — the streaming twin of the batch
    * [[graft.operators.RangeJoin]] gate: purchases matched to the clicks
    * in their preceding `beforeSec` window, per user. Both sides carry a
    * watermark AND the join condition bounds event-time distance, which is
    * exactly what lets Spark expire join state (a click older than
    * max(pts) − beforeSec − watermark can never match again) — without
    * both, stream-stream join state grows unboundedly. Inner joins emit a
    * match as soon as both rows have arrived; no end-of-stream flush is
    * needed. */
  def intervalJoin(purchases: DataFrame, clicks: DataFrame,
                   beforeSec: Long = 3600L,
                   watermark: String = "1 hour"): DataFrame = {
    val p = purchases.withWatermark("pts", watermark)
    val c = clicks.withWatermark("cts", watermark)
    p.join(c,
      p("user_id") === c("user_id") &&
        c("cts") >= p("pts") - expr(s"INTERVAL $beforeSec SECONDS") &&
        c("cts") <= p("pts"))
  }

  /** Streaming ingest into a [[graft.VectorDatabase]]: each micro-batch
    * appends through the bulk dense-id path (SURVEY §7.2-10 north star —
    * the reference's `add` fed by a stream). Dense-id assignment serializes
    * per micro-batch by construction (foreachBatch runs batches in order),
    * which is exactly the total-order guarantee dense rowids need. */
  def ingestInto(db: graft.VectorDatabase, stream: DataFrame,
                 docCol: String, vecCol: String, metaJsonCol: Option[String],
                 orderCol: String, queryName: String) =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) db.addBulk(batch, docCol, vecCol, metaJsonCol, orderCol)
      }
      .start()

  final case class Keyed(key: String, event_id: Long)
  final case class Seen(key: String, event_id: Long, first: Boolean)

  /** Streaming exact-dedup on ingest: keeps only the FIRST row per key
    * (e.g. a document fingerprint), implemented with
    * flatMapGroupsWithState — the custom-state tier of the streaming API
    * (SURVEY's mapGroupsWithState requirement). State per key is one
    * boolean; pass `ttl` (e.g. "1 hour") to expire idle keys via
    * processing-time timeout so state stays bounded on unbounded key
    * domains — at 100 TB/day of documents, unexpired fingerprint state IS
    * the memory bill. A key seen again after expiry re-emits (standard
    * windowed-dedup semantics); omit `ttl` for exact full-history dedup
    * over bounded key spaces. */
  def firstPerKey(events: Dataset[Keyed], ttl: Option[String] = None): Dataset[Seen] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Seen](OutputMode.Update(), timeoutConf) {
        (key: String, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            ttl.foreach(state.setTimeoutDuration)
            Iterator.empty
          } else rows.buffered.headOption match {
            case Some(first) =>
              state.update(true)
              ttl.foreach(state.setTimeoutDuration)
              Iterator.single(Seen(key, first.event_id, first = true))
            case None => Iterator.empty
          }
      }
  }

  /** Deterministic streaming dedup: keep the MINIMUM event_id per key.
    * [[firstPerKey]] keeps the first row SEEN — honest arrival semantics,
    * but the winner depends on partition iteration order, so it can only
    * be spec-pinned set-wise. This variant's winner is a pure function of
    * the DATA (the min id), which is what lets a SQL oracle pin the
    * custom-state executor row-for-row: per batch, a group emits its new
    * min iff it improves on the state (Update-mode retraction-free
    * refinement; a downstream batch min per key collapses multi-batch
    * emissions). Same O(1)-per-key state as firstPerKey. */
  def minPerKey(events: Dataset[Keyed]): Dataset[Keyed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Long, Keyed](OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Keyed], state: GroupState[Long]) =>
          var best = if (state.exists) state.get else Long.MaxValue
          var improved = false
          rows.foreach { r =>
            if (r.event_id < best) { best = r.event_id; improved = true }
          }
          if (improved) { state.update(best); Iterator.single(Keyed(key, best)) }
          else Iterator.empty
      }
  }
}
