package graft.tools

import org.apache.spark.sql.SparkSession

/** Media-tier throughput probe for SCALE.md (round 10): decode rate of
  * the pure-JVM kernels over a synthetic corpus far larger than the
  * gates' 50 assets — the number that matters at 100 TB is rows/s/core
  * of the per-row kernel, since the stage has no shuffle. */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.multimodal._
    def probe(name: String, mk: Long => Array[Byte],
              decode: Array[Byte] => Option[Any]): Unit = {
      val assets = spark.range(n).map(i => mk(i)).cache()
      assets.count() // materialize the encode outside the timed window
      val t0 = System.nanoTime()
      val ok = assets.map(b => if (decode(b).isDefined) 1L else 0L)
        .reduce(_ + _)
      val sec = (System.nanoTime() - t0) / 1e9
      require(ok == n, s"$name: $ok / $n decoded")
      println(f"[mediaprobe] $name n=$n wall=$sec%.2f s -> ${n / sec}%.0f rows/s (8 cores), ${n / sec / 8}%.0f rows/s/core")
      assets.unpersist()
    }
    // 32x24 px grayscale JPEG (12 blocks), 4x3-block progressive twin,
    // 24x16 RGB PNG, 3-frame MP3, 1-track MP4
    probe("jpeg", i => Jpeg.encodeJpegConstBlocks(
        Array.tabulate(12)(j => ((i + j * 37) % 256).toByte), 4, 3),
      Jpeg.decodeJpeg(_))
    probe("jpeg-progressive", i => Jpeg.encodeJpegProgressiveConstBlocks(
        Array.tabulate(12)(j => ((i + j * 37) % 256).toByte), 4, 3),
      Jpeg.decodeJpeg(_))
    probe("png-rgb", i => Png.encodePng(
        Array.tabulate(24 * 16 * 3)(j => ((i + j) % 256).toByte), 24, 16, 3),
      Png.decodePng(_))
    probe("mp3", i => Mp3.encodeMp3(3, 3, 2,
        Array.tabulate(3 * 212)(j => ((i + j) % 256).toByte)),
      Mp3.parseMp3(_))
    probe("mp4", i => Mp4.encodeMp4(16, 16, 1000L, 5L + (i % 10), 3, 8,
        Array.tabulate(24)(j => ((i + j) % 256).toByte)),
      Mp4.parseMp4(_))
    spark.stop()
  }
}
