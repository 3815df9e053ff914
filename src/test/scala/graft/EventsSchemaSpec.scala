package graft

import java.nio.file.Files

import graft.sources.Tables
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** The driver has regenerated `events.parquet` with a different physical
  * `ts` schema once already (TIMESTAMP(NANOS) → timestamp[us], round 6 —
  * which DNF'd 13 gates). Pin [[Tables.events]]'s type dispatch against
  * every physical schema the column has shipped under, so the next
  * regeneration can't break the events tier silently.
  */
class EventsSchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Fixture instants, as micros since epoch (UTC). */
  private val micros = Seq(0L, 1700000000123456L, 1700000123456789L)

  /** Read `dir` through the production reader and pin type + values. */
  private def check(dir: String, label: String): Unit = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType, s"$label: ts dtype")
    val got = df.orderBy("event_id").select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == micros, s"$label: values")
  }

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"events-$tag").toString

  test("events reader: TIMESTAMP(NANOS) physical schema (nanos-as-LONG path)") {
    // Spark cannot write TIMESTAMP(NANOS); author the file with parquet-mr
    // directly, exactly as the round-1..5 generator did.
    val dir = tmpDir("nanos")
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,false));
        |}""".stripMargin)
    val conf = new Configuration()
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter.builder(new Path(s"$dir/events.parquet"))
      .withConf(conf).withType(schema)
      .withCompressionCodec(CompressionCodecName.UNCOMPRESSED).build()
    try micros.zipWithIndex.foreach { case (us, i) =>
      writer.write(factory.newGroup().append("event_id", i.toLong).append("ts", us * 1000L))
    } finally writer.close()
    check(dir, "nanos")
  }

  test("events reader: timestamp[us] isAdjustedToUTC=false (TIMESTAMP_NTZ path)") {
    // The round-6 regeneration's schema: pandas/pyarrow naive micros.
    // A Spark TimestampNTZ write produces the same physical annotation.
    val dir = tmpDir("ntz")
    import java.time.{Instant, LocalDateTime, ZoneOffset}
    import spark.implicits._
    micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, LocalDateTime.ofInstant(Instant.EPOCH.plusNanos(us * 1000L), ZoneOffset.UTC))
    }.toDF("event_id", "ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir, "ntz")
  }

  test("events reader: timestamp[us] isAdjustedToUTC=true (TimestampType passthrough)") {
    val dir = tmpDir("utc")
    import java.time.Instant
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, Instant.EPOCH.plusNanos(us * 1000L))
    }.toDF("event_id", "ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    check(dir, "utc")
  }
}
