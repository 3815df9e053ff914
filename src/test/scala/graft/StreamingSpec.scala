package graft

import java.sql.Timestamp
import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming: windowed aggregation with watermark semantics and
  * stateful first-per-key dedup, driven through MemoryStream micro-batches. */
class StreamingSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val tempDirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  override def afterAll(): Unit = {
    tempDirs.foreach { d =>
      try graft.streaming.StreamingGates.rmrf(d) catch { case _: Throwable => () }
    }
    super.afterAll()
  }

  private def ts(s: String) = Timestamp.valueOf(s)
  final case class Ev(ts: Timestamp, event_type: String, value: Double)
  final case class UEv(ts: Timestamp, user_id: Long, value: Double)

  test("windowedStats aggregates tumbling windows across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.startWindowed(input.toDF(), "win_test")
    try {
      input.addData(
        Ev(ts("2026-01-01 10:05:00"), "click", 1.0),
        Ev(ts("2026-01-01 10:20:00"), "click", 3.0),
        Ev(ts("2026-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_test")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.contains(("2026-01-01 10:00:00.0", "click", 2L, 2.0)))
      assert(rows.contains(("2026-01-01 11:00:00.0", "view", 1L, 5.0)))
      // second batch updates the open 11:00 window incrementally
      input.addData(Ev(ts("2026-01-01 11:40:00"), "view", 7.0))
      q.processAllAvailable()
      val upd = spark.table("win_test").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(upd.contains(("2026-01-01 11:00:00.0", "view", 2L)))
    } finally q.stop()
  }

  test("watermark drops rows arriving too late") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.startWindowed(input.toDF(), "late_test")
    try {
      input.addData(Ev(ts("2026-01-01 12:00:00"), "click", 1.0))
      q.processAllAvailable()
      // advance event time (and thus the watermark) far beyond 10:00
      input.addData(Ev(ts("2026-01-01 15:00:00"), "click", 1.0))
      q.processAllAvailable()
      val before = spark.table("late_test").count()
      // 10:00-window row is now > 10 min behind the watermark → dropped
      input.addData(Ev(ts("2026-01-01 10:00:01"), "click", 99.0))
      q.processAllAvailable()
      val rows = spark.table("late_test").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2)))
      assert(spark.table("late_test").count() == before)
      assert(!rows.contains(("2026-01-01 10:00:00.0", 1L)))
    } finally q.stop()
  }

  final case class PEv(user_id: Long, pts: Timestamp, purchase_id: Long)
  final case class CEv(user_id: Long, cts: Timestamp, click_value: Double)

  test("intervalJoin matches clicks in the preceding window and expires old state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[CEv]
    val purchases = MemoryStream[PEv]
    val q = EventStream.intervalJoin(purchases.toDF(), clicks.toDF(),
        beforeSec = 3600L, watermark = "10 minutes")
      .select($"purchase_id", $"click_value")
      .writeStream.outputMode("append").format("memory")
      .queryName("ij_test").start()
    try {
      clicks.addData(
        CEv(1L, ts("2026-01-01 10:00:00"), 1.0),
        CEv(1L, ts("2026-01-01 10:30:00"), 2.0),
        CEv(2L, ts("2026-01-01 10:30:00"), 4.0))
      purchases.addData(PEv(1L, ts("2026-01-01 10:45:00"), 100L))
      q.processAllAvailable()
      val got = spark.table("ij_test").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      // both user-1 clicks are within the preceding hour; user-2's is not his
      assert(got == Set((100L, 1.0), (100L, 2.0)))

      // advance BOTH watermarks far ahead, then issue a purchase whose
      // preceding window covers the (now expired) early clicks: matches
      // against expired state must NOT appear
      clicks.addData(CEv(9L, ts("2026-01-01 14:00:00"), 0.0))
      purchases.addData(PEv(9L, ts("2026-01-01 14:00:00"), 998L))
      q.processAllAvailable()
      purchases.addData(PEv(1L, ts("2026-01-01 10:50:00"), 999L))
      q.processAllAvailable()
      val after = spark.table("ij_test").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(!after.exists(_._1 == 999L),
        s"late purchase matched against state that should be expired: $after")
    } finally q.stop()
  }

  test("fromDirectory streams parquet event files as they arrive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftevdir").toString
    def writeBatch(sub: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    writeBatch("a", Seq((1L, ts("2026-01-01 10:05:00"), 7L, "click", 2.0, "{}")))
    val q = EventStream.startWindowed(EventStream.fromDirectory(spark, dir), "dirwin_test")
    try {
      q.processAllAvailable()
      // a new file appearing in the directory is picked up incrementally
      writeBatch("b", Seq((2L, ts("2026-01-01 10:40:00"), 8L, "click", 4.0, "{}")))
      q.processAllAvailable()
      val rows = spark.table("dirwin_test").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.contains(("2026-01-01 10:00:00.0", "click", 2L, 3.0)), rows.toSeq.toString)
    } finally q.stop()
  }

  test("sessionized merges events within the gap and closes on watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[UEv]
    val q = EventStream.startSessionized(input.toDF(), "sess_test")
    try {
      // user 1: two events 10 min apart (one session); user 2: one event
      input.addData(
        UEv(ts("2026-01-01 10:00:00"), 1L, 1.0),
        UEv(ts("2026-01-01 10:10:00"), 1L, 2.0),
        UEv(ts("2026-01-01 10:05:00"), 2L, 5.0))
      q.processAllAvailable()
      // sessions still open (watermark hasn't passed close) → nothing emitted
      assert(spark.table("sess_test").isEmpty)
      // user 1 again 2h later: new session AND the watermark advances past
      // the old sessions' close (+30 min gap), finalizing them
      input.addData(UEv(ts("2026-01-01 13:00:00"), 1L, 7.0))
      q.processAllAvailable()
      input.addData(UEv(ts("2026-01-01 15:00:00"), 9L, 0.0)) // push watermark
      q.processAllAvailable()
      val rows = spark.table("sess_test").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
      assert(rows.contains((1L, "2026-01-01 10:00:00.0", 2L, 3.0))) // merged session
      assert(rows.contains((2L, "2026-01-01 10:05:00.0", 1L, 5.0)))
      assert(rows.contains((1L, "2026-01-01 13:00:00.0", 1L, 7.0))) // separate session
    } finally q.stop()
  }

  test("startWindowedParquet appends watermark-closed windows to a durable sink") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graftsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graftsinkck").toString
    val input = MemoryStream[Ev]
    val q = EventStream.startWindowedParquet(input.toDF(), out, ckpt, "pq_sink_test")
    try {
      input.addData(
        Ev(ts("2026-01-01 10:05:00"), "click", 1.0),
        Ev(ts("2026-01-01 10:20:00"), "click", 3.0))
      q.processAllAvailable()
      // advance the watermark past the 10:00 window's close (+10 min)
      input.addData(Ev(ts("2026-01-01 12:00:00"), "view", 5.0))
      q.processAllAvailable()
      input.addData(Ev(ts("2026-01-01 13:00:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.contains(("2026-01-01 10:00:00.0", "click", 2L, 2.0)), rows.toSeq.toString)
    } finally q.stop()
  }

  test("ingestInto appends micro-batches to a VectorDatabase with dense ids") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    final case class Doc(k: Long, d: String, v: Seq[Float])
    val input = MemoryStream[(Long, String, Seq[Float])]
    val db = VectorDatabase.create(spark, 4, "flat")
    val q = EventStream.ingestInto(db,
      input.toDF().toDF("k", "d", "v"), "d", "v", None, "k", "ingest_test")
    try {
      input.addData((0L, "doc zero", Seq(0f, 0f, 0f, 1f)), (1L, "doc one", Seq(0f, 0f, 1f, 0f)))
      q.processAllAvailable()
      assert(db.count == 2)
      input.addData((2L, "doc two", Seq(0f, 1f, 0f, 0f)))
      q.processAllAvailable()
      assert(db.count == 3)
      val ids = db.data.select("id").collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(0L until 3L))
      assert(db.getDocument(2L).contains("doc two"))
      // the appended collection is immediately queryable
      val r = db.queryVector(Array(0f, 1f, 0f, 0f), 1).collect()
      assert(r.head.getLong(0) == 2L)
    } finally q.stop()
  }

  test("qualityFilter: streamed funnel equals the batch funnel (multi-batch, stateless)") {
    // gate dir: 4 input files with maxFilesPerTrigger=2 => >= 2 micro-batches;
    // the kept set must equal the batch funnel regardless of slicing.
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingGates.qualityFilter(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    val batch = graft.text.TextAnalysis
      .features(spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .where(graft.text.TextAnalysis.funnelKeep)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3))).sortBy(_._1).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("firstPerKey keeps only the first occurrence per key across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventStream.Keyed]
    val q = EventStream.firstPerKey(input.toDS()).writeStream
      .outputMode("update").format("memory").queryName("dedup_test").start()
    try {
      input.addData(
        EventStream.Keyed("fpA", 1L), EventStream.Keyed("fpA", 2L),
        EventStream.Keyed("fpB", 3L))
      q.processAllAvailable()
      input.addData(
        EventStream.Keyed("fpA", 4L), // duplicate in later batch → dropped
        EventStream.Keyed("fpC", 5L))
      q.processAllAvailable()
      val seen = spark.table("dedup_test").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(seen == Map("fpA" -> 1L, "fpB" -> 3L, "fpC" -> 5L))
    } finally q.stop()
  }

  test("minPerKey refines the winner across batches; batch-side min collapses emissions") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventStream.Keyed]
    val q = EventStream.minPerKey(input.toDS()).writeStream
      .outputMode("update").format("memory").queryName("minkey_test").start()
    try {
      input.addData(
        EventStream.Keyed("kA", 7L), EventStream.Keyed("kA", 3L),
        EventStream.Keyed("kB", 9L))
      q.processAllAvailable()
      input.addData(
        EventStream.Keyed("kA", 5L), // worse than state 3 → no emission
        EventStream.Keyed("kB", 2L)) // better than state 9 → refines
      q.processAllAvailable()
      val emissions = spark.table("minkey_test").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // kA emitted once (3), kB twice (9 then 2) — the documented
      // Update-mode refinement the gate collapses with min()
      assert(emissions.sorted.toSeq == Seq(("kA", 3L), ("kB", 2L), ("kB", 9L)))
      val collapsed = spark.table("minkey_test")
        .groupBy($"key").agg(org.apache.spark.sql.functions.min($"event_id"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(collapsed == Map("kA" -> 3L, "kB" -> 2L))
    } finally q.stop()
  }

  test("firstPerKey with ttl expires idle state; key re-emits after expiry") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventStream.Keyed]
    val q = EventStream.firstPerKey(input.toDS(), ttl = Some("50 milliseconds"))
      .writeStream.outputMode("update").format("memory")
      .queryName("ttl_test").start()
    // With ProcessingTimeTimeout the engine re-runs (empty) batches
    // continuously to fire timers, so processAllAvailable never settles —
    // poll the sink with a deadline instead.
    def await(pred: => Boolean): Boolean = {
      val t0 = System.currentTimeMillis
      while (!pred && System.currentTimeMillis - t0 < 60000) Thread.sleep(100)
      pred
    }
    def rows() = spark.table("ttl_test").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    try {
      input.addData(EventStream.Keyed("ttlX", 1L))
      assert(await(rows().contains(("ttlX", 1L))), rows().toSeq.toString)
      Thread.sleep(500) // let the timer fire in a background batch → state gone
      input.addData(EventStream.Keyed("ttlX", 3L)) // re-emits after expiry
      assert(await(rows().contains(("ttlX", 3L))), rows().toSeq.toString)
      assert(rows().count(_._1 == "ttlX") == 2, rows().toSeq.toString)
    } finally q.stop()
  }

  // -------------------------------------------------------------------------
  // Batch ≡ streaming differentials (r2 VERDICT next-round #5): the same
  // sf0.01 events parquet driven through the file-source stream must
  // reproduce the oracle-gated batch results row for row. Batch and
  // streaming share the transform code by construction (unified Dataset
  // semantics) but NOT the execution path — these pin the stateful
  // streaming operators (windowed agg, session windows) to the hash-
  // verified batch twins.
  // -------------------------------------------------------------------------

  private val sfDir = "/root/testdata/sf0.01"

  /** The nanos-safe events read rewritten as plain TIMESTAMP(MICROS)
    * parquet, so the file-source stream (whose schema declares
    * TimestampType) reads the exact same rows the batch gates see. */
  private def streamableEvents(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graftevdiff")
    tempDirs += dir
    graft.sources.Tables.events(spark, sfDir)
      .coalesce(4).write.mode("overwrite").parquet(s"$dir/in")
    s"$dir/in"
  }

  test("streaming windowedStats ≡ batch events_window gate on sf0.01 (r2 VERDICT #5)") {
    import org.apache.spark.sql.functions._
    val in = streamableEvents()
    // Complete mode: the memory sink holds the full aggregate state — the
    // apples-to-apples comparison against a batch groupBy (watermark
    // eviction is pinned separately in the late-row test above)
    val q = EventStream.windowedStats(EventStream.fromDirectory(spark, in))
      .writeStream.outputMode("complete").format("memory")
      .queryName("diff_win").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("diff_win")
        .select(col("hour"), col("event_type"), col("n"),
          round(col("avg_value"), 4).as("avg_value"))
        .orderBy(col("hour").asc, col("event_type").asc)
        .collect().toSeq
      val batch = SparkEntry.queries("events_window")(spark, sfDir).collect().toSeq
      assert(stream == batch,
        s"streaming=${stream.take(5)}... batch=${batch.take(5)}...")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming sessionized ≡ batch sessionize gate on sf0.01 (r2 VERDICT #5)") {
    import org.apache.spark.sql.functions._
    val in = streamableEvents()
    val q = EventStream.sessionized(EventStream.fromDirectory(spark, in))
      .writeStream.outputMode("append").format("memory")
      .queryName("diff_sess").start()
    try {
      q.processAllAvailable()
      // Append mode emits a session only once the watermark passes its
      // close: the gates' shared sentinel flush (far-future row, user -1,
      // excluded below) — one implementation, schema-drift-checked there
      graft.streaming.StreamingGates.appendSentinel(spark, sfDir, in)
      q.processAllAvailable()
      val stream = spark.table("diff_sess")
        .where(col("user_id") =!= -1L)
        .select(col("user_id"), col("session_start"), col("n_events"),
          round(col("total_value"), 4).as("total_value"))
        .orderBy(col("user_id"), col("session_start"))
        .collect().toSeq
      val batch = SparkEntry.queries("sessionize")(spark, sfDir).collect().toSeq
      assert(stream == batch,
        s"sizes ${stream.size} vs ${batch.size}; " +
          s"firstDiff=${stream.zip(batch).find(p => p._1 != p._2)}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streamingContainment on a tiny dir (< 3 batch docs) returns the correct pairs (r7 ADVICE)") {
    import spark.implicits._
    // 15 docs -> cut = ceil(0.9 * 15) = 14 -> ONE batch doc (fewer than
    // the 3 paced files the full-size gate asserts). Doc 14 is a verbatim
    // copy of corpus doc 3; every other doc is disjoint noise — so the
    // one correct containment pair is (3, 14), discovered by the single
    // real micro-batch.
    val shared = (0 until 160).map(i => s"tok${i}a").mkString(" ")
    def noise(seed: Int) = (0 until 160).map(i => s"n${seed}x$i").mkString(" ")
    val docs = (0L until 14L).map(i => (i, if (i == 3L) shared else noise(i.toInt))) :+
      ((14L, shared))
    val tmp = java.nio.file.Files.createTempDirectory("graft_tiny_contain")
    tempDirs += tmp
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = graft.streaming.StreamingGates.streamingContainment(spark, tmp.toString)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("shared")))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((3L, 14L)),
      s"expected exactly the (3, 14) copy pair, got ${pairs.toSeq}")
    assert(pairs.head._3 >= 5, "a verbatim copy must share >= minShared fingerprints")
  }
}
