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
              decode: Array[Byte] => Option[Any], rows: Int = n): Unit = {
      val assets = spark.range(rows).map(i => mk(i)).cache()
      assets.count() // materialize the encode outside the timed window
      // discarded warm-up pass over a slice (round-15 ADVICE): the first
      // probe of a kernel family otherwise pays its JIT compilation
      // inside the timed window, skewing cross-kernel ratios
      assets.limit(math.min(rows, 2000)).map(b => if (decode(b).isDefined) 1L else 0L)
        .reduce(_ + _)
      val t0 = System.nanoTime()
      val ok = assets.map(b => if (decode(b).isDefined) 1L else 0L)
        .reduce(_ + _)
      val sec = (System.nanoTime() - t0) / 1e9
      require(ok == rows, s"$name: $ok / $rows decoded")
      println(f"[mediaprobe] $name n=$rows wall=$sec%.2f s -> ${rows / sec}%.0f rows/s (8 cores), ${rows / sec / 8}%.0f rows/s/core")
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
    // Caller-supplied-codebook DEMO (round 14, r13 VERDICT #4): frames
    // whose region0 selects REAL ISO id 1 decode to PCM when a user
    // codebook spec is loaded, and strict-reject without — the path a
    // real-corpus deployment takes after pasting its trusted B.7/B.3
    // transcriptions into the documented spec format.
    locally {
      val spec =
        """table 1 linbits 0
          |1 0 0
          |01 1 0
          |001 0 1
          |000 1 1""".stripMargin
      val user = Mp3.parseHuffTablesSpec(spec)
      val merged = Mp3.fixtureTables ++ user
      def frame(i: Long): Array[Byte] = {
        def gi(g: Int, ch: Int) = Mp3.GranuleInfo(0, 8, 170, 9,
          windowSwitching = false, blockType = 0, mixedBlock = false,
          Seq(1, 14, 0), Nil, 3, 7, 0, 0, 1)
        val si = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
          Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
        val is = Array.tabulate(16)(j => (((i + j) % 2) * (if ((i + j) % 3 == 0) -1 else 1)).toInt)
        Mp3.encodeSpectra(si, 2, Seq.fill(2)(Seq.fill(2)(Array.fill(21)(0))),
          Seq.fill(2)(Seq.fill(2)(is)), tables = merged)
      }
      val rejected = Mp3.decodePcm(frame(1L), 2, 0).isEmpty
      probe("mp3-pcm-usercodebook", frame,
        Mp3.decodePcm(_, 2, 0, tables = merged))
      println(s"[mediaprobe] mp3 real-id strict-reject without user codebook: $rejected")
      require(rejected, "real table ids must strict-reject without a supplied codebook")
    }
    // AAC decode throughput + the same caller-supplied contract (round
    // 14): fixture-book SCE frames decode to 1024 PCM samples; frames on
    // REAL book id 11 (escapes included) decode only with the user spec.
    locally {
      def sce(i: Long, cb: Int, books: Map[Int, Aac.AacBook]): Array[Byte] = {
        val maxSfb = 4
        val quant = Array.tabulate(1024) { j =>
          if (j >= 32 * maxSfb) 0
          else if (cb == 12) (((i + j) % 3) * (if ((i + j) % 5 < 2) -1 else 1)).toInt
          else { // book-11 domain incl. escapes
            val base = ((i + j) % 8).toInt
            val mag = if (base == 7) 17 + ((i + j) % 20).toInt
              else if (base == 0 || base == 3) 0 else 1
            if (mag != 0 && (i + j) % 5 < 2) -mag else mag
          }
        }
        Aac.encodeSce(100, maxSfb, Array.fill(maxSfb)(cb),
          Array.fill(maxSfb)(100), quant, books = books)
      }
      probe("aac-pcm", i => sce(i, 12, Aac.fixtureBooks),
        Aac.decodePcm(_))
      val spec =
        """book 11 dim 2 signed 0 escape 1
          |0 0 0
          |100 0 1
          |101 1 0
          |110 1 1
          |11100 0 16
          |11101 16 0
          |111100 1 16
          |111101 16 1
          |111110 16 16""".stripMargin
      val merged = Aac.fixtureBooks ++ Aac.parseAacBooksSpec(spec)
      val rejected = Aac.decodePcm(sce(1L, 11, merged)).isEmpty
      probe("aac-pcm-userbook", i => sce(i, 11, merged),
        Aac.decodePcm(_, books = merged))
      println(s"[mediaprobe] aac real-id strict-reject without user book: $rejected")
      require(rejected, "real book ids must strict-reject without a supplied book")
    }
    // Round-15 codec paths: short windows, KBD shape, TNS, and the
    // H.264 CAVLC Intra_16x16 picture (full YCbCr)
    locally {
      def shortSce(i: Long, shape: Int, tns: Option[Aac.TnsSpec]): Array[Byte] = {
        val info = Aac.IcsInfo(2, 8, Array(2, 2, 2, 2), shape)
        val quant = Array.tabulate(1024) { j =>
          if ((j % 128) / 8 >= 8) 0
          else (((i + j) % 3) * (if ((i + j) % 5 < 2) -1 else 1)).toInt
        }
        Aac.encodeSceWin(info, 100, Array.fill(4, 8)(12), Array.fill(4, 8)(100),
          quant, tns = tns)
      }
      probe("aac-short", i => shortSce(i, 0, None), Aac.decodePcm(_))
      probe("aac-short-kbd", i => shortSce(i, 1, None), Aac.decodePcm(_))
      probe("aac-tns", i => shortSce(i, 0, Some(Aac.TnsSpec(0,
        Seq.fill(8)(Seq(Aac.TnsSpecFilter(12, 2, false, 0, Seq(2, -1))))))),
        Aac.decodePcm(_))
    }
    locally {
      val spsB = H264.encodeSps(66, 30, 0, 0, 0, 1, 1, 1,
        frameMbsOnly = true, crop = None)
      val ppsB = H264.encodePps(0, 0, cabac = false, picInitQp = 26)
      val sps = H264.parseSps(spsB).get
      val pps = H264.parsePps(ppsB).get
      val t = H264Cavlc.fixtureTables
      def pic(i: Long): Array[Byte] = {
        val mbs = (0 until 4).map { m =>
          H264Cavlc.I16MbSpec(Seq(2, 1, 0, 3)(m), m, 0,
            Array.tabulate(16)(k => if ((i + m + k) % 4 == 0) (((i + m + k) % 5) - 2).toInt else 0),
            Array.tabulate(16, 15)((blk, p) =>
              if ((i + m + blk + p) % 6 == 0) (((i + blk * (p + 1) + m) % 5) - 2).toInt else 0)
              .map(_.toArray),
            forceCbpLuma = Some(15),
            chromaDc = Array.tabulate(2, 4)((c, k) =>
              if ((i + m + c + k) % 3 == 0) (((i + m + c + k) % 5) - 2).toInt else 0),
            chromaAc = Array.fill(2, 4)(new Array[Int](15)),
            forceCbpChroma = Some(1))
        }
        H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true,
          (i % 16).toInt, (i % 5).toInt, (i % 16).toInt, 0, mbs, t)
      }
      probe("h264-i16-ycbcr", pic,
        b => H264Cavlc.parseI16x16Slice(b, sps, pps, 3, 5, t))
    }
    // QCIF-class pictures (round 16, r15 VERDICT #9): 11×9 MBs =
    // 176×144 — the 2×2-MB fixtures above rate the KERNEL; these rate
    // the macroblock walk at a real aspect ratio, for all three intra
    // tiers (CAVLC I16, CAVLC mixed I4x4/I16, CABAC mixed). The
    // per-picture pixel count is ~25× the 2×2 rows', so row counts
    // scale down and the metric to compare is MBs/s, printed alongside.
    locally {
      val wMbs = 11; val hMbs = 9
      val spsB = H264.encodeSps(66, 30, 0, 0, 0, 1, wMbs - 1, hMbs - 1,
        frameMbsOnly = true, crop = None)
      val sps = H264.parseSps(spsB).get
      val ppsCavlc = H264.parsePps(H264.encodePps(0, 0, cabac = false, picInitQp = 26)).get
      val ppsCabac = H264.parsePps(H264.encodePps(0, 0, cabac = true, picInitQp = 26)).get
      val t = H264Cavlc.fixtureTables
      def i16mb(i: Long, mbx: Int, mby: Int): H264Cavlc.I16MbSpec = {
        val m = mby * wMbs + mbx
        val pred =
          if (mbx == 0 && mby == 0) 2
          else if (mby == 0) Seq(1, 2)(((i + m) % 2).toInt)
          else if (mbx == 0) Seq(0, 2)(((i + m) % 2).toInt)
          else ((i + m) % 4).toInt
        H264Cavlc.I16MbSpec(pred, 0, 0,
          Array.tabulate(16)(k => if ((i + m + k) % 4 == 0) (((i + m + k) % 5) - 2).toInt else 0),
          Array.tabulate(16, 15)((blk, p) =>
            if ((i + m + blk + p) % 11 == 0) (((i + blk * (p + 1) + m) % 5) - 2).toInt else 0)
            .map(_.toArray),
          forceCbpLuma = Some(15))
      }
      def i4mb(i: Long, mbx: Int, mby: Int): H264Cavlc.I4x4MbSpec = {
        val m = mby * wMbs + mbx
        H264Cavlc.I4x4MbSpec(
          Array.tabulate(16) { blk =>
            val bx = 2 * ((blk / 4) % 2) + blk % 4 % 2
            val by = 2 * ((blk / 4) / 2) + (blk % 4) / 2
            val gx = 4 * mbx + bx; val gy = 4 * mby + by
            val pick = ((i + m + blk) % 9).toInt
            if (gx == 0 && gy == 0) 2
            else if (gy == 0) Seq(1, 2, 8)(pick % 3)
            else if (gx == 0) Seq(0, 2, 3, 7)(pick % 4)
            else pick
          }, 0, 0,
          Array.tabulate(16, 16)((blk, p) =>
            if ((i + m + blk + p) % 11 == 0) (((i + m * (p + 1) + blk) % 5) - 2).toInt else 0)
            .map(_.toArray),
          forceCbpLuma = Some(15))
      }
      def mixedMbs(i: Long): Seq[H264Cavlc.IMbSpec] =
        (0 until wMbs * hMbs).map { m =>
          val mbx = m % wMbs; val mby = m / wMbs
          if ((mbx + mby + i) % 2 == 0) i4mb(i, mbx, mby) else i16mb(i, mbx, mby)
        }
      val rows = math.max(200, n / 25)
      probe("h264-i16-qcif", i => H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3,
          idr = true, (i % 16).toInt, (i % 5).toInt, (i % 16).toInt, 0,
          (0 until wMbs * hMbs).map(m => i16mb(i, m % wMbs, m / wMbs)), t),
        b => H264Cavlc.parseI16x16Slice(b, sps, ppsCavlc, 3, 5, t), rows)
      probe("h264-i4x4mix-qcif", i => H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3,
          idr = true, (i % 16).toInt, (i % 5).toInt, (i % 16).toInt, 0, mixedMbs(i), t),
        b => H264Cavlc.parseI16x16Slice(b, sps, ppsCavlc, 3, 5, t), rows)
      probe("h264-cabac-qcif", i => H264Cabac.encodeISlice(sps, ppsCabac, 3,
          idr = true, (i % 16).toInt, (i % 5).toInt, (i % 16).toInt, 0, mixedMbs(i),
          H264Cabac.fixtureTables),
        b => H264Cabac.parseISlice(b, sps, ppsCabac, 3, 5, H264Cabac.fixtureTables), rows)
      println(s"[mediaprobe] qcif rows carry ${wMbs * hMbs} MBs each: MBs/s = rows/s x ${wMbs * hMbs}")
    }
    spark.stop()
  }
}
