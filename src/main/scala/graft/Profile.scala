package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      t(name)(fn(spark, dir).count())
    }
    spark.stop()
  }
}
