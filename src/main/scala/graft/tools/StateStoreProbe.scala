package graft.tools

import org.apache.spark.sql.SparkSession

/** State-store floor attribution for SCALE.md (r10 VERDICT #6): the four
  * 2.5–3.6 s streaming gates are claimed to be micro-batch + state-store
  * wall clock, same band since r7. This probe measures that claim: the
  * same gates, same protocol (3 timed runs, median), under the default
  * HDFSBackedStateStoreProvider vs RocksDBStateStoreProvider
  * (SPARK_GRAFT_STATESTORE=rocksdb — a separate JVM run, since forked
  * stream sessions inherit SQL defaults from the SparkContext conf at
  * creation). Either a free win or a documented floor with numbers.
  *
  * Gate volumes are tiny (≤ 100 k events), so the hypothesis is that
  * per-batch fixed costs (micro-batch scheduling, state commit/checkpoint
  * fsync) dominate and the provider swap moves little.
  */
object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val provider = sys.env.getOrElse("SPARK_GRAFT_STATESTORE", "hdfs")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (provider == "rocksdb")
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // codegen warm-up
    val gates = Seq("streaming_sessionize", "streaming_sink_window",
      "dedup_incremental_durable", "streaming_range_join")
    val qmap = graft.SparkEntry.queries
    val out = gates.map { name =>
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        qmap(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = runs.sorted.apply(1)
      f""""$name":{"cold":${runs.head}%.2f,"median":$med%.2f}"""
    }
    println(s"""{"provider":"$provider","sf":"$sfDir","gates":{${out.mkString(",")}}}""")
    spark.stop()
  }
}
