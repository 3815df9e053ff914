package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch micro-profiler for the Jaccard dedup funnel's COLD path (not
  * part of the driver contract). */
object FunnelProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[funnel] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = Dedup.shingles(docs, "doc_id", "text", 3).persist(StorageLevel.MEMORY_AND_DISK)
    t("shingles materialize")(sh.count())
    val gs = Dedup.docGramSetsDirect(docs, "doc_id", "text", 3).persist(StorageLevel.MEMORY_AND_DISK)
    t("gramSets materialize")(gs.count())
    val pref = Dedup.corpusPrefixes(sh, gs, 0.8).persist(StorageLevel.MEMORY_AND_DISK)
    t("prefixes materialize")(pref.count())
    val pairsDf = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8,
        shingleFrame = Some(sh), gramSetsFrame = Some(gs), prefixFrame = Some(pref))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("pairs funnel (one job)")(pairsDf.count())
    val cc = t("connected components")(
      Dedup.connectedComponents(pairsDf.select(col("a"), col("b"))).count())
    println(s"[funnel] cc = $cc  shingleRows = ${sh.count()}")
    spark.stop()
  }
}
