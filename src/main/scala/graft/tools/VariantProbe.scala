package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VariantType shredding/pushdown feasibility probe (r11 VERDICT #8
  * stretch): can Spark 4.1 write the metadata JSON as SHREDDED VARIANT
  * parquet and rewrite `variant_get` predicates into pushed struct-field
  * scans (`PushVariantIntoScan`)? Prints the physical plans + ReadSchema
  * so the facade's canonical-JSON metadata contract can adopt shredding
  * underneath without guessing. Dev harness — not driver contract. */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_variant_probe")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.variant.writeShredding.enabled", "true")
      .config("spark.sql.variant.inferShreddingSchema", "true")
      .config("spark.sql.variant.allowReadingShredded", "true")
      .config("spark.sql.variant.pushVariantIntoScan", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = (0 until 1000).map { i =>
      (i.toLong, s"""{"lang":"${Seq("en", "fr", "de")(i % 3)}","source":"src${i % 5}","n_chars":${100 + i}}""")
    }.toDF("id", "meta")
    docs.select(col("id"), parse_json(col("meta")).as("mv"))
      .write.mode("overwrite").parquet(out)

    // what did the writer produce? (shredded = typed_value group present)
    val meta = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(
          new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet")).head.getPath),
        spark.sparkContext.hadoopConfiguration))
    println("[variant] parquet schema:\n" + meta.getFooter.getFileMetaData.getSchema)
    meta.close()

    val rd = spark.read.parquet(out)

    println("\n[variant] typed extraction filter (variant_get string):")
    rd.where(expr("variant_get(mv, '$.lang', 'string') = 'en'"))
      .select(col("id")).explain("formatted")

    println("\n[variant] cast-safe typed extraction (try_variant_get string):")
    rd.where(try_variant_get(col("mv"), "$.lang", "string") === lit("en"))
      .select(col("id")).explain("formatted")

    println("\n[variant] try_variant_get numeric (bigint) on n_chars:")
    rd.where(try_variant_get(col("mv"), "$.n_chars", "bigint") === lit(150L))
      .select(col("id")).explain("formatted")

    // does a failed typed cast null out (non-match) rather than throw?
    val mis = rd.where(try_variant_get(col("mv"), "$.lang", "double") === lit(1.5)).count()
    println(s"[variant] type-mismatch double-on-string matches = $mis (expect 0, no throw)")

    println("\n[variant] canonical-JSON rendering filter (to_json of variant_get):")
    rd.where(to_json(try_variant_get(col("mv"), "$.lang", "variant")) === lit("\"en\""))
      .select(col("id")).explain("formatted")

    println("\n[variant] typed-vs-canonical equality check (n_chars as number):")
    val a = rd.where(expr("to_json(try_variant_get(mv, '$.n_chars', 'variant')) = '150'")).count()
    val b = rd.where(expr("to_json(try_variant_get(mv, '$.n_chars', 'variant')) = '\"150\"'")).count()
    println(s"[variant] bare-number match = $a (expect 1), quoted-string match = $b (expect 0)")

    spark.stop()
  }
}
