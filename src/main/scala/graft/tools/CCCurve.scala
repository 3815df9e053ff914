package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Connected-components scale curve on DENSE pair graphs (round 14,
  * r13 VERDICT #1): `dedup_clusters` is the spine of the dedup
  * end-product, and at independent sf1 (50 k docs where EVERY 3-gram
  * has df ≈ 78) the gate took 472 s with no ×10 measurement at that
  * density and no budget guard on the CC edge volume. This probe runs
  * the gate's exact funnel — [[graft.dedup.Dedup.jaccardPairs]]
  * (n = 3, threshold = 0.8, the dedup_clusters configuration) into
  * [[graft.dedup.Dedup.connectedComponents]] — on an [[SfGenerate]]
  * corpus and reports each stage separately, so the curve attributes
  * super-linearity to the pair funnel vs the Kiveris loop vs the
  * driver union-find dispatch.
  *
  * Usage: CCCurve <docsDir> [forceKiveris]
  *   docsDir      — a dir holding documents.parquet (SfGenerate output)
  *   forceKiveris — "true" to ALSO time the distributed loop
  *                  (driverThreshold = 0) on the same pair frame
  *
  * One JSON line: docs, edges (verified pairs), nodes, clusters,
  * pairs_sec (funnel build + count), cc_auto_sec (the gate's path),
  * cc_kiveris_sec (forced loop, -1 if not requested). Dev harness —
  * not driver contract. */
object CCCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1_ind")
    val forceKiveris = args.length > 1 && args(1).toBoolean
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // Stage 0: the candidate-volume estimate the round-14 budget guard
    // prices the prefix self-join with — reported so the curve shows the
    // quadratic growth the guard exists for.
    val sh = graft.dedup.Dedup.shingles(docs, "doc_id", "text", 3)
    val gramSets = graft.dedup.Dedup.docGramSets(sh)
    val prefixes = graft.dedup.Dedup.corpusPrefixes(sh, gramSets, 0.8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (estCand, tEst) = timed {
      (prefixes.groupBy(col("gram")).agg(count(lit(1)).as("pdf"))
        .agg(sum(col("pdf") * (col("pdf") - 1)).as("est2"))
        .head() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }) / 2
    }

    // Stage 1: the verified near-dup pair frame (the gate's funnel),
    // persisted so the CC timings below never re-run it. Runs with the
    // default candidateBudget — a corpus past the guard reports
    // guarded: true with -1 stage times instead of spilling to death.
    val (pairsOpt, tPairs) = timed {
      try {
        val p = graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text",
            n = 3, threshold = 0.8,
            shingleFrame = Some(sh), gramSetsFrame = Some(gramSets),
            prefixFrame = Some(prefixes))
          .select(col("a"), col("b"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count() // materialize inside the timed window
        Some(p)
      } catch {
        case e: IllegalArgumentException if e.getMessage.contains("candidateBudget") =>
          None
      }
    }
    if (pairsOpt.isEmpty) {
      println(s"""{"docs":$nDocs,"est_candidates":$estCand,"est_sec":$tEst,""" +
        s""""guarded":true,"dir":"$dir"}""")
      spark.stop()
      return
    }
    val pairs = pairsOpt.get
    val nEdges = pairs.count()

    // Stage 2: the gate's own CC path (size-adaptive dispatch).
    val (ccAuto, tAuto) = timed {
      val c = graft.dedup.Dedup.connectedComponents(pairs)
      (c.count(), c.select(col("cluster")).distinct().count())
    }

    // Stage 3 (optional): the distributed Kiveris loop, forced.
    val tKiveris = if (!forceKiveris) -1.0 else
      timed(graft.dedup.Dedup.connectedComponents(pairs, driverThreshold = 0L).count())._2

    println(s"""{"docs":$nDocs,"est_candidates":$estCand,"est_sec":$tEst,""" +
      s""""guarded":false,"edges":$nEdges,"nodes":${ccAuto._1},""" +
      s""""clusters":${ccAuto._2},"pairs_sec":$tPairs,"cc_auto_sec":$tAuto,""" +
      s""""cc_kiveris_sec":$tKiveris,"dir":"$dir"}""")
    spark.stop()
  }
}
