package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the winnow fingerprint build (r8: the
  * containment cold build measured 12 s at sf0.1 for only 1.5M gram rows
  * — attribute which stage pays before optimizing). */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[winnowprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    val k = 8; val w = 16
    val base = docs.select(col("doc_id").cast("long").as("id"),
        graft.text.TextAnalysis.normalized(col("text")).as("__nt"))
      .where(length(col("__nt")) >= k + w - 1)
    t("base")(base)
    val grams = base
      .select(col("id"), (length(col("__nt")) - (k - 1)).as("__ngrams"),
        explode(sequence(lit(1), length(col("__nt")) - (k - 1))).as("i"),
        col("__nt"))
      .select(col("id"), col("__ngrams"), col("i"),
        md5(expr(s"substring(__nt, i, $k)")).as("h"))
    t("grams")(grams)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("i"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    val sel = grams.select(col("id"), col("i"), col("__ngrams"),
        min(col("h")).over(win).as("fp"))
      .where(col("i") <= col("__ngrams") - (w - 1))
    t("window")(sel)
    t("distinct")(sel.select(col("id"), col("fp")).distinct())
    t("full_winnow")(graft.text.TextAnalysis.winnow(docs, "doc_id", "text"))
    t("full_winnow_2nd")(graft.text.TextAnalysis.winnow(docs, "doc_id", "text"))
    spark.stop()
  }
}
