package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build an sf1-equivalent table set from sf0.1 by ×k replication
  * (r10 VERDICT #3 — the full-surface verification sweep one decade above
  * the bench scale). The correctness gate compares Spark vs DuckDB ON THE
  * SAME PARQUET, so any deterministic data works; this construction keeps
  * every gate MEANINGFUL at ×10:
  *
  *  - copy 0 of every table is VERBATIM — gates pinned to specific ids
  *    (doc_id < 50 media assets, vec_id query anchors, BM25 query terms)
  *    still exercise their original rows;
  *  - documents copies k ≥ 1 get per-copy token suffixes (ScaleCurve's
  *    discipline): within-copy shingle/dup structure replicates, cross-copy
  *    token spaces are disjoint — dedup result sets grow ~k, not k²;
  *  - embeddings copies k ≥ 1 get a per-copy Rademacher sign flip
  *    (cos(s⊙v, s⊙w) = cos(v, w) exactly since s² = 1; cross-copy cosines
  *    ~0) — intra-copy geometry is bit-exact, the 0.45-threshold pair set
  *    grows ~k;
  *  - id/key offsets are (max+1)-steps per key domain, so doc_id/vec_id
  *    stay DENSE (the facade's rowid ≡ id oracle-sharing needs density)
  *    and every TPC-H foreign key keeps referencing its own copy;
  *  - region/nation are shared dimensions (fixed 5/25 rows at every TPC-H
  *    sf) — copied verbatim, fact nationkeys keep pointing at them.
  *
  * Dev harness like ScaleCurve — not part of the driver contract.
  */
object SfReplicate {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val f = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (new java.io.File(s"$out/_DONE").exists) { println(s"$out already built"); return }

    def rd(t: String): DataFrame = spark.read.parquet(s"$base/$t.parquet")
    // single FILE per table (the driver's testdata layout; the DuckDB side
    // of the compare reads `<table>.parquet` as one file, not a directory)
    def wr(df: DataFrame, t: String): Unit = {
      val tmp = s"$out/_tmp_$t"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dir = new java.io.File(tmp)
      // coalesce(1) guarantees one part file today; assert it so a future
      // multi-part write fails loudly instead of silently dropping rows
      // through an arbitrary `find` pick (round-12 ADVICE)
      val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      if (parts.length != 1)
        sys.error(s"expected exactly one part file for $t, found ${parts.length}")
      val part = parts.head
      val dest = new java.io.File(s"$out/$t.parquet")
      if (dest.exists) dest.delete()
      if (!part.renameTo(dest)) sys.error(s"rename failed for $t")
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    def step(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L
    /** Union of f copies with the given per-copy column rewrites. */
    def rep(df: DataFrame, shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until f).map(k => shift(df, k)).reduce(_ unionAll _)

    // shared dimensions — verbatim
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    // documents: dense doc_id; copy-0 text verbatim, k>0 token-suffixed
    val docs = rd("documents")
    val dStep = step(docs, "doc_id")
    wr(rep(docs, (d, k) =>
      if (k == 0) d
      else d.withColumn("doc_id", col("doc_id") + lit(k * dStep))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1~c$k"))),
      "documents")

    // embeddings: dense vec_id; copy-0 verbatim, k>0 Rademacher sign flip
    def signs(k: Int): Array[Double] = Array.tabulate(64) { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"sfrep_${k}_$i".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) 1.0 else -1.0
    }
    val embs = rd("embeddings")
    val eStep = step(embs, "vec_id")
    wr(rep(embs, (e, k) =>
      if (k == 0) e
      else {
        val s = graft.functions.VectorFunctions.vecLit(signs(k))
        e.withColumn("vec_id", col("vec_id") + lit(k * eStep))
          .withColumn("embedding",
            zip_with(col("embedding").cast("array<double>"), s, (x, sg) => x * sg)
              .cast("array<float>"))
      }), "embeddings")

    // TPC-H facts: every key domain steps by its own (max+1)
    val cust = rd("customer"); val cStep = step(cust, "c_custkey")
    val ords = rd("orders");   val oStep = step(ords, "o_orderkey")
    val li   = rd("lineitem")
    val part = rd("part");     val pStep = step(part, "p_partkey")
    val supp = rd("supplier"); val sStep = step(supp, "s_suppkey")
    wr(rep(cust, (d, k) => d.withColumn("c_custkey", col("c_custkey") + lit(k * cStep))),
      "customer")
    wr(rep(ords, (d, k) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(k * oStep))
      .withColumn("o_custkey", col("o_custkey") + lit(k * cStep))), "orders")
    wr(rep(li, (d, k) => d
      .withColumn("l_orderkey", col("l_orderkey") + lit(k * oStep))
      .withColumn("l_partkey", col("l_partkey") + lit(k * pStep))
      .withColumn("l_suppkey", col("l_suppkey") + lit(k * sStep))), "lineitem")
    wr(rep(part, (d, k) => d.withColumn("p_partkey", col("p_partkey") + lit(k * pStep))),
      "part")
    wr(rep(supp, (d, k) => d.withColumn("s_suppkey", col("s_suppkey") + lit(k * sStep))),
      "supplier")

    // events: user/event ids step, timestamps unchanged (10× rows per
    // hour/session bucket — the behavioral gates do 10× the work)
    val ev = graft.sources.Tables.events(spark, base)
    val uStep = step(ev, "user_id"); val evStep = step(ev, "event_id")
    wr(rep(ev, (d, k) => d
      .withColumn("event_id", col("event_id") + lit(k * evStep))
      .withColumn("user_id", col("user_id") + lit(k * uStep))), "events")

    new java.io.File(s"$out/_DONE").createNewFile()
    val counts = Seq("documents", "embeddings", "customer", "orders",
      "lineitem", "part", "supplier", "events")
      .map(t => s"$t=${spark.read.parquet(s"$out/$t.parquet").count()}")
    println(s"built $out (x$f): ${counts.mkString(", ")}")
    spark.stop()
  }
}
