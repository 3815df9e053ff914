package graft

import graft.dedup.Dedup
import graft.expr.ExactSum
import graft.functions.VectorFunctions._
import graft.text.{BM25, TextAnalysis}
import graft.vector.{ExactKNN, IVFIndex, LSHIndex, PQIndex}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal tier: PPM/PNG/JPEG/WAV/MP3/MP4 decode gates, binary asset pipelines, media-collection ingest and KNN.
  *
  * One tier of [[Queries]] (split in round 12, r11 VERDICT #7 -
  * maintainability only): members keep their original relative order and
  * semantics, relaxed from `private` to `private[graft]` so the sibling
  * tier traits and the assembling object see them. The self-type gives
  * every tier access to the full mixed-in surface without a dependency
  * graph between the files. */
/** Serializable home for the MP4 container gates' shared content
  * builders (round 16): these run INSIDE mapPartitions closures, so
  * they live on a standalone module rather than the Queries object.
  * Content formulas here are what mp4H264OracleSql/mp4AacOracleSql
  * restate — the single-track and interleaved-chunk fixtures differ
  * only in container layout. */
private[graft] object Mp4Fixtures extends Serializable {

  /** The container gates' shared SPS/PPS pair (CAVLC, 2×2 MBs). */
  private[graft] def mp4H264SpsPps(): (Array[Byte], Array[Byte]) = (
    graft.multimodal.H264.encodeSps(
      66, 30, spsId = 0, log2MaxFrameNumMinus4 = 0, poc = 0,
      maxRef = 1, pwMbsMinus1 = 1, phMapMinus1 = 1,
      frameMbsOnly = true, crop = None),
    graft.multimodal.H264.encodePps(
      ppsId = 0, spsId = 0, cabac = false, picInitQp = 26))

  /** The container gates' shared slice content (eid = 2·id + sm — the
    * formulas mp4H264OracleSql restates; the single-track and the
    * interleaved-chunk fixtures differ ONLY in container layout). */
  private[graft] def mp4H264SliceRbsp(id: Long, sm: Int,
      sps: graft.multimodal.H264.Sps,
      pps: graft.multimodal.H264.Pps): Array[Byte] = {
    val eid = 2 * id + sm
    val qp = (20 + (5 * eid) % 12).toInt
    def mode(m: Int, blk: Int): Int = {
      val bx = 2 * ((blk / 4) % 2) + blk % 4 % 2
      val by = 2 * ((blk / 4) / 2) + (blk % 4) / 2
      if (m == 1 && by == 0) Seq(1, 2, 8)(((eid + blk) % 3).toInt)
      else if (m == 2 && bx == 0) Seq(0, 2, 3, 7)(((eid + blk) % 4).toInt)
      else if (m == 2) ((eid + 1 + blk) % 9).toInt
      else ((eid + blk) % 9).toInt
    }
    val mb0 = graft.multimodal.H264Cavlc.I16MbSpec(2, 0, 0,
      new Array[Int](16), Array.fill(16)(new Array[Int](15)))
    val i4 = (1 to 3).map { m =>
      graft.multimodal.H264Cavlc.I4x4MbSpec(
        Array.tabulate(16)(mode(m, _)), 0, ((eid + m) % 5).toInt - 2,
        Array.tabulate(16, 16)((blk, p) =>
          if ((eid + m + blk + p) % 7 == 0)
            ((eid + m * (p + 2) + blk) % 5).toInt - 2
          else 0).map(_.toArray),
        forceCbpLuma = Some(15))
    }
    graft.multimodal.H264Cavlc.encodeI16x16Slice(
      sps, pps, nalRefIdc = 3, idr = true,
      frameNum = (eid % 16).toInt, idrPicId = (eid % 5).toInt,
      pocLsb = (eid % 16).toInt, sliceQpDelta = qp - 26, mb0 +: i4,
      tables = graft.multimodal.H264Cavlc.fixtureTables)
  }

  /** The M4A gates' shared raw_data_block content (the formulas
    * mp4AacOracleSql restates). */
  private[graft] def mp4AacRawBlock(id: Long, f: Int): Array[Byte] = {
    val maxSfb = 8
    val gg = (96 + (id + 5 * f) % 8).toInt
    val sectCb = Array.fill(maxSfb)(12)
    val sf = Array.tabulate(maxSfb)(s => (gg + (id + 3 * s + f) % 9).toInt - 4)
    val quant = Array.tabulate(1024) { i =>
      if (i >= 32 * maxSfb) 0
      else {
        val mag = ((id + i + 7 * f) % 3).toInt
        if (mag != 0 && (id + i + f) % 5 < 2) -mag else mag
      }
    }
    graft.multimodal.Aac.encodeSceWin(
      graft.multimodal.Aac.IcsInfo(0, maxSfb, Array(1)), gg,
      Array(sectCb), Array(sf), quant)
  }

}

private[graft] trait QueriesMedia { this: Queries.type =>

  // ---------------------------------------------------------------------------
  // Multimodal plumbing (graft.multimodal) — stub codec, real dataflow
  // ---------------------------------------------------------------------------

  private[graft] def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.imageFeatures(
      graft.multimodal.Multimodal.packDocuments(docsTbl(spark, dir), "doc_id", "text"))
      .toDF().orderBy(col("id"))

  private[graft] def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.sampleFrames(
      graft.multimodal.Multimodal.packDocuments(
        docsTbl(spark, dir).where(col("doc_id") < 50), "doc_id", "text"), every = 2)
      .toDF().orderBy(col("id"), col("frame_idx"))

  private[graft] def multimodalResize(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.resize(
      graft.multimodal.Multimodal.packDocuments(
        docsTbl(spark, dir), "doc_id", "text"), tw = 8, th = 8)
      .toDF().orderBy(col("id"))

  /** Deliberately NON-ASCII payloads (r4 VERDICT #5): 40 chained md5 hex
    * blocks per doc, unhexed to 640 raw bytes spanning 0x00–0xFF — the
    * ASCII-only corpus can no longer make the byte kernels and a character
    * oracle agree by luck. Both engines derive the payload identically
    * (md5 hex is engine-portable); the binary-safe operator variants
    * fingerprint the canonical lowercase-hex rendering, which the VARCHAR-
    * only DuckDB md5 can reproduce. Ingests through [[graft.multimodal
    * .Multimodal.packBinary]] — the real binary-column seam. */
  private[graft] def binaryAssets(spark: SparkSession, dir: String) = {
    val payloadHex = concat((0 until 40).map(i =>
      md5(concat(col("text"), lit(s"_$i")))): _*)
    graft.multimodal.Multimodal.packBinary(
      docsTbl(spark, dir).where(col("doc_id") < 50)
        .select(col("doc_id"), unhex(payloadHex).as("payload")),
      "doc_id", "payload")
  }

  private[graft] def multimodalBinaryResize(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.resizeBinarySafe(binaryAssets(spark, dir), tw = 8, th = 8)
      .toDF().orderBy(col("id"))

  private[graft] def multimodalBinaryFrames(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.sampleFramesBinarySafe(binaryAssets(spark, dir), every = 2)
      .toDF().orderBy(col("id"), col("frame_idx"))

  /** md5-chain hex of `blocks` engine-portable blocks per doc (32 hex
    * chars each) — the deterministic byte source both engines derive
    * identically; `salt` namespaces each gate's payload. */
  private[graft] def md5Chain(salt: String, blocks: Int): Column =
    concat((0 until blocks).map(i => md5(concat(col("text"), lit(s"_${salt}_$i")))): _*)

  /** REAL PPM payloads (r5 VERDICT #4): a complete P6 file per doc —
    * ASCII header built with format_string from per-doc dimensions, pixel
    * bytes unhexed from the md5 chain — so the [[graft.multimodal.Codecs]]
    * parser decodes genuine binary images and the oracle pins header-
    * derived dims AND payload bytes independently in hex space. */
  private[graft] def ppmAssets(spark: SparkSession, dir: String) = {
    val w = (lit(3) + col("doc_id") % 5).cast("int")
    val h = (lit(2) + col("doc_id") % 3).cast("int")
    val pixelHex = md5Chain("p6", 6).substr(lit(1), (w * h * 6).cast("int"))
    graft.multimodal.Multimodal.packBinary(
      docsTbl(spark, dir).where(col("doc_id") < 50)
        .select(col("doc_id"),
          concat(format_string("P6\n%d %d\n255\n", w, h).cast("binary"),
            unhex(pixelHex)).as("payload")),
      "doc_id", "payload")
  }

  private[graft] def multimodalPpmDecode(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.ppmFeatures(ppmAssets(spark, dir))
      .toDF().orderBy(col("id"))

  /** REAL PNG payloads (r9 VERDICT #8 stretch): a complete lossless
    * container per doc — truecolor RGB for even ids, grayscale for odd —
    * zlib-deflated through [[graft.multimodal.Png.encodePng]]. PNG is
    * lossless, so decode recovers the payload bytes EXACTLY and the
    * oracle pins dims, channel count and every decoded sample in hex
    * space with no constant-block seam. The decoder is golden-fixture-
    * pinned in MultimodalSpec (hand-filtered scanlines covering all five
    * filter types), so encoder/decoder bugs cannot cancel. */
  private[graft] def pngAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val w = (lit(3) + col("doc_id") % 5).cast("int")
    val h = (lit(2) + col("doc_id") % 3).cast("int")
    val ch = when(col("doc_id") % 2 === 0, 3).otherwise(1).cast("int")
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id"), w.as("w"), h.as("h"), ch.as("ch"),
        unhex(md5Chain("png8", 6).substr(lit(1), (w * h * ch * 2).cast("int")))
          .as("payload"))
      .as[(Long, Int, Int, Int, Array[Byte])]
    src.mapPartitions(_.map { case (id, pw, ph, pch, payload) =>
      graft.multimodal.Multimodal.Asset(id, "image",
        graft.multimodal.Png.encodePng(payload, pw, ph, pch), 0, 0)
    })
  }

  private[graft] def multimodalPngDecode(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.pngFeatures(pngAssets(spark, dir))
      .toDF().orderBy(col("id"))

  /** Image analog of wav_channels: per-channel exact sums over the fully
    * decoded (inflate + defilter) unsigned samples. */
  private[graft] def multimodalPngStats(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.pngChannelStats(pngAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  /** END-TO-END multimodal pipeline (r10 VERDICT #4 — the media and
    * vector tiers meeting in ONE flow): real PNG binaries → full decode
    * (chunk walk, CRC, inflate, defilter) → fixed-dim feature vector
    * (16-bin high-nibble histogram — constant dimension across image
    * sizes/channel counts) → facade COLLECTION ingest (create → addBulk,
    * dense rowids ≡ doc ids by ingest order) → exact KNN over the image
    * features through the flat index. The oracle recomputes every
    * histogram from the md5-chain hex (the high nibble IS a payload hex
    * digit), then ranks by the engine's 1/(1+‖a−q‖²) score — so the gate
    * pins decoder, featurizer, ingest AND search together; a bug in any
    * tier breaks the hash. Query = image 0's own histogram. */
  private[graft] val pngKnnDbCache = new Memo[VectorDatabase](memoMax, "pngKnnDbCache")(_.close())

  private[graft] def pngKnnDb(spark: SparkSession, dir: String): VectorDatabase =
    pngKnnDbCache.get(spark, dir) {
      val feats = graft.multimodal.Multimodal.pngNibbleHistogram(pngAssets(spark, dir))
        .toDF().select(col("id"), col("features"),
          format_string("png_%d", col("id")).as("doc"))
      graft.sources.CollectionLoader.load(spark, feats, 16, "doc", "features", "id")
    }

  /** The query histogram is memoized beside the collection (round-11
    * review: recomputing it per call re-decoded all 50 PNGs just to read
    * one 16-double vector — the gate should time KNN, not redundant
    * decoding). */
  private[graft] val pngKnnQueryCache = new Memo[Array[Float]](memoMax, "pngKnnQueryCache")(_ => ())

  private[graft] def multimodalKnn(spark: SparkSession, dir: String): DataFrame = {
    // Double→Float is EXACT here because nibble-histogram features are
    // small integer counts (< 2^24); a future featurizer emitting
    // non-integer doubles would silently diverge from the double-precision
    // DuckDB oracle at this cast (round-12 ADVICE)
    val q = pngKnnQueryCache.get(spark, dir)(
      graft.multimodal.Multimodal.pngNibbleHistogram(pngAssets(spark, dir))
        .toDF().where(col("id") === 0L)
        .head().getSeq[Double](1).map(_.toFloat).toArray)
    pngKnnDb(spark, dir).queryVector(q, topK = 10)
      .select(col("id"), r4(col("score")).as("score"))
      .orderBy(col("score").desc, col("id").asc)
  }

  /** REAL MP4 payloads (round 10): a minimal valid ISO BMFF file per doc —
    * ftyp + moov (movie/track/media headers, uniform stsz, stco) + mdat
    * carrying md5-chain sample bytes. The parser extracts every header
    * field and the mdat payload; the oracle recomputes all of them from
    * the same per-doc formulas and pins the payload in hex space. The
    * codec bitstream inside the samples stays the documented stub. */
  private[graft] def mp4Assets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val n = (lit(2) + col("doc_id") % 5).cast("int")
    val s = (lit(8) + col("doc_id") % 8).cast("int")
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id"), n.as("n"), s.as("s"),
        unhex(md5Chain("mp4", 6).substr(lit(1), (n * s * 2).cast("int"))).as("payload"))
      .as[(Long, Int, Int, Array[Byte])]
    src.mapPartitions(_.map { case (id, ns, ss, payload) =>
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.Mp4.encodeMp4(
          width = 16 * (1 + (id % 4)).toInt, height = 16 * (1 + (id % 3)).toInt,
          timescale = 1000L, duration = 100L + id % 50,
          nSamples = ns, sampleSize = ss, samples = payload), 0, 0)
    })
  }

  private[graft] def multimodalMp4Parse(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp4Features(mp4Assets(spark, dir))
      .toDF().orderBy(col("id"))

  /** Container-driven frame sampling: every 2nd SAMPLE of each asset's
    * video track, sliced at the offsets the parsed stsz/stco tables
    * dictate — the oracle rebuilds each sample from the md5-chain hex at
    * the same (uniform-size) positions, so the gate pins that the parser
    * walks the REAL sample table, not a fixed stride. */
  private[graft] def multimodalMp4Samples(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp4SampleFrames(mp4Assets(spark, dir), every = 2)
      .toDF().orderBy(col("id"), col("sample_idx"))

  /** REAL MP3 payloads (round 10): a CBR MPEG-1 Layer III stream per doc —
    * bitrate 32/40/48 kbps (indices 1–3), samplerate 44100/48000/32000,
    * 2–3 frames whose payloads (everything after each 4-byte header) come
    * sequentially from the md5 chain; even ids carry a leading ID3v2 tag
    * the parser must skip. The oracle recomputes the frame length from
    * the public ISO 11172-3 tables (144·br/rate) and pins frame count,
    * rates, integer duration and the concatenated-payload fingerprint. */
  private[graft] def mp3Assets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id"), unhex(md5Chain("mp3", 40)).as("payload"))
      .as[(Long, Array[Byte])]
    src.mapPartitions(_.map { case (id, full) =>
      val bIdx = (1 + id % 3).toInt          // 32, 40, 48 kbps
      val rIdx = (id % 3).toInt              // 44100, 48000, 32000
      val n = (2 + id % 2).toInt
      val br = 32 + 8 * (id % 3).toInt
      val rate = Array(44100, 48000, 32000)(rIdx)
      val flen = 144 * br * 1000 / rate
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Mp3.encodeMp3(n, bIdx, rIdx,
          java.util.Arrays.copyOf(full, n * (flen - 4)),
          id3Bytes = if (id % 2 == 0) 16 else 0), 0, 0)
    })
  }

  private[graft] def multimodalMp3Parse(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp3Features(mp3Assets(spark, dir))
      .toDF().orderBy(col("id"))

  /** Hand-assembled STEREO frames for the Layer III side-info gate
    * (round 12, r11 VERDICT #4): every §2.4.1.7 field is a doc_id formula
    * the oracle restates in SQL, bit-packed through
    * [[graft.multimodal.Mp3.encodeSideInfo]] (whose bit layout is
    * independently golden-pinned in MultimodalSpec against an in-test
    * packer, so an encoder/parser bug pair cannot cancel here). Long
    * blocks, scalefac_compress 9 (slen 2/2), main_data_begin 0
    * (self-contained — the bit reservoir is the DSP seam), granule-1
    * scale factors shared per the id-varied scfsi pattern. One 128 kbps /
    * 44.1 kHz frame per doc: flen = 144·128000/44100 = 417. */
  private[graft] def mp3SideinfoAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val scfsi = Seq.tabulate(2)(ch => Seq.tabulate(4)(b => ((id + ch + b) % 2).toInt))
      def gi(g: Int, ch: Int) = {
        val shared =
          if (g == 0) 0
          else 2 * (6 * scfsi(ch)(0) + 5 * scfsi(ch)(1) + 5 * scfsi(ch)(2) + 5 * scfsi(ch)(3))
        graft.multimodal.Mp3.GranuleInfo(
          part23Length = 42 - shared,
          bigValues = ((7 * id + 13 * g + 3 * ch) % 289).toInt,
          globalGain = ((5 * id + 17 * g + 29 * ch) % 256).toInt,
          scalefacCompress = 9,
          windowSwitching = false, blockType = 0, mixedBlock = false,
          tableSelect = Seq(((id + g + ch) % 32).toInt,
            ((2 * id + g) % 32).toInt, ((id + 5 * ch) % 32).toInt),
          subblockGain = Nil,
          region0Count = (id % 16).toInt, region1Count = ((id + g) % 8).toInt,
          preflag = (id % 2).toInt, scalefacScale = ((id + g) % 2).toInt,
          count1TableSelect = ((id + ch) % 2).toInt)
      }
      val si = graft.multimodal.Mp3.SideInfo(0, (id % 8).toInt, scfsi,
        Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
      val groups = Seq(0 until 6, 6 until 11, 11 until 16, 16 until 21)
      val sfs = Seq.tabulate(2) { g =>
        Seq.tabulate(2) { ch =>
          if (g == 0) Array.tabulate(21)(b => ((id + b) % 4).toInt)
          else groups.zipWithIndex.flatMap { case (grp, gidx) =>
            if (scfsi(ch)(gidx) == 1) Nil
            else grp.map(b => ((id + b + 1) % 4).toInt)
          }.toArray
        }
      }
      val main = graft.multimodal.Mp3.encodeSideInfo(si, 2, sfs)
      val flen = 417
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Mp3.encodeMp3(1, 9, 0,
          java.util.Arrays.copyOf(main, flen - 4)), 0, 0)
    })
  }

  private[graft] def multimodalMp3Sideinfo(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp3SideInfo(mp3SideinfoAssets(spark, dir))
      .toDF().orderBy(col("id"), col("granule"), col("channel"))

  /** Hand-assembled frames for the Layer III HUFFMAN gate (round 13,
    * r12 VERDICT #5): every decoded spectral integer is a doc_id/sample
    * formula the oracle restates in SQL. Stereo 128 kbps / 44.1 kHz,
    * self-contained, long blocks, scfsi all 0 (granule-1 factors
    * re-emitted — the SHARING path is the sideinfo gate's job). Regions:
    * region0_count 3 / region1_count 7 ⇒ region0 = samples 0–15 coded
    * with the id-4 fixture codebook, region1 the rest of big_values
    * (≤ 50 < 74) with the id-14 ESCAPE codebook (|15|+linbits values);
    * count1 alternates fixture-table-A / table-B (the complement-bit
    * table) per (id+g+ch) parity — the VALUES are parity-independent,
    * so the oracle needn't model the encoding, only the decode result.
    * Spectral value formulas (i = sample index):
    *   region0 (i < 16):      mag = (id+i) % 4
    *   region1 (16 ≤ i < nBig): mag ∈ {0, 1, 1, 15+((id+i)%8)} by (id+i)%4
    *   count1 (nBig ≤ i < nBig+nC1): mag = (id+i) % 2
    *   sign: negative iff (id+i) % 5 < 2 (applied to nonzero mags)
    * with nBig = 2·(20 + id%5) and nC1 = 4·(4 + id%3). */
  private[graft] def mp3HuffmanAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val nBig = 2 * (20 + (id % 5)).toInt
      val nC1 = 4 * (4 + (id % 3)).toInt
      def value(i: Int): Int = {
        val mag =
          if (i < 16) ((id + i) % 4).toInt
          else if (i < nBig) ((id + i) % 4).toInt match {
            case 0 => 0
            case 1 | 2 => 1
            case _ => 15 + ((id + i) % 8).toInt
          }
          else ((id + i) % 2).toInt
        if (mag != 0 && (id + i) % 5 < 2) -mag else mag
      }
      val is = Array.tabulate(nBig + nC1)(value)
      def gi(g: Int, ch: Int) = graft.multimodal.Mp3.GranuleInfo(
        part23Length = 0, // recomputed by encodeSpectra
        bigValues = nBig / 2,
        globalGain = ((5 * id + 17 * g + 29 * ch) % 256).toInt,
        scalefacCompress = 9,
        windowSwitching = false, blockType = 0, mixedBlock = false,
        tableSelect = Seq(4, 14, 0), subblockGain = Nil,
        region0Count = 3, region1Count = 7,
        preflag = (id % 2).toInt, scalefacScale = ((id + g) % 2).toInt,
        count1TableSelect = ((id + g + ch) % 2).toInt)
      val si = graft.multimodal.Mp3.SideInfo(0, (id % 8).toInt,
        Seq.fill(2)(Seq.fill(4)(0)),
        Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
      val sfs = Seq.fill(2)(Seq.fill(2)(
        Array.tabulate(21)(b => ((id + b) % 4).toInt)))
      val spectra = Seq.fill(2)(Seq.fill(2)(is))
      val main = graft.multimodal.Mp3.encodeSpectra(si, 2, sfs, spectra)
      val flen = 417
      require(main.length <= flen - 4, s"fixture main data ${main.length} overruns frame")
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Mp3.encodeMp3(1, 9, 0,
          java.util.Arrays.copyOf(main, flen - 4)), 0, 0)
    })
  }

  private[graft] def multimodalMp3Huffman(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp3Spectra(mp3HuffmanAssets(spark, dir))
      .toDF().orderBy(col("id"), col("granule"), col("channel"))

  /** Hand-assembled frames for the PCM gate (round 14, r13 VERDICT #3):
    * the Huffman gate's spectral/scale-factor formulas with a PCM-scaled
    * global_gain — gg = 160 + (5·id + 17·g + 29·ch) % 40 keeps the
    * requantized magnitudes in the range where the synthesized samples
    * span the full 16-bit space (some saturate, pinning the clamp) —
    * and the header mode driving MS stereo: odd ids are joint-stereo
    * with mode_extension bit 1 (MS on), even ids plain stereo. 8 ids
    * keep the oracle's ~1.2 M-cos restatement of the whole DSP chain
    * (requant → MS → alias butterflies → IMDCT/window/overlap →
    * frequency inversion → 64×32 matrixing → windowed FIFO read-out)
    * inside a few seconds of DuckDB time. */
  private[graft] def mp3PcmAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 8)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val nBig = 2 * (20 + (id % 5)).toInt
      val nC1 = 4 * (4 + (id % 3)).toInt
      def value(i: Int): Int = {
        val mag =
          if (i < 16) ((id + i) % 4).toInt
          else if (i < nBig) ((id + i) % 4).toInt match {
            case 0 => 0
            case 1 | 2 => 1
            case _ => 15 + ((id + i) % 8).toInt
          }
          else ((id + i) % 2).toInt
        if (mag != 0 && (id + i) % 5 < 2) -mag else mag
      }
      val is = Array.tabulate(nBig + nC1)(value)
      def gi(g: Int, ch: Int) = graft.multimodal.Mp3.GranuleInfo(
        part23Length = 0, // recomputed by encodeSpectra
        bigValues = nBig / 2,
        globalGain = (160 + (5 * id + 17 * g + 29 * ch) % 40).toInt,
        scalefacCompress = 9,
        windowSwitching = false, blockType = 0, mixedBlock = false,
        tableSelect = Seq(4, 14, 0), subblockGain = Nil,
        region0Count = 3, region1Count = 7,
        preflag = (id % 2).toInt, scalefacScale = ((id + g) % 2).toInt,
        count1TableSelect = ((id + g + ch) % 2).toInt)
      val si = graft.multimodal.Mp3.SideInfo(0, (id % 8).toInt,
        Seq.fill(2)(Seq.fill(4)(0)),
        Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
      val sfs = Seq.fill(2)(Seq.fill(2)(
        Array.tabulate(21)(b => ((id + b) % 4).toInt)))
      val spectra = Seq.fill(2)(Seq.fill(2)(is))
      val main = graft.multimodal.Mp3.encodeSpectra(si, 2, sfs, spectra)
      val flen = 417
      require(main.length <= flen - 4, s"fixture main data ${main.length} overruns frame")
      val ms = id % 2 == 1
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Mp3.encodeMp3(1, 9, 0,
          java.util.Arrays.copyOf(main, flen - 4),
          mode = if (ms) 1 else 0, modeExt = if (ms) 2 else 0), 0, 0)
    })
  }

  /** WINDOW-SWITCHED fixture frames (round 15, r14 VERDICT #2):
    * granule 0 = block_type 1 (start window, long scalefactor layout),
    * granule 1 = block_type 2 PURE SHORT (12 bands × 3 windows,
    * subblock gains, §2.4.3.4.8 reorder, three 12-point IMDCTs per
    * subband). Closed-form per (id, g, ch) with k = id + 11·g:
    *   n_big = 2·(20 + k%5); count1 = 4·(4 + k%3)
    *   is(i): |v| = (k+i)%4 below the FIXED region boundary 36, the
    *          table-14 escape domain to n_big, (k+i)%2 in count1;
    *          negative iff (k+i)%5 < 2
    *   gg = 160 + (5id + 17g + 29ch)%40;  mult by (id+g)%2
    *   long sf(b) = (id+b)%4;  short sf(b,w) = (id+b+w)%4
    *   sbg(w) = (id+2w)%4;  preflag = id%2 on granule 0 only */
  private[graft] def mp3ShortAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 6)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      graft.multimodal.Multimodal.Asset(id, "audio",
        Mp3WindowFixture.frame(id,
          g0 = (1, false, id + 0), g1 = (2, false, id + 11)), 0, 0)
    })
  }

  /** MIXED-BLOCK fixture frames (round 15): granule 0 = block_type 2
    * MIXED (2 long subbands + short bands 3–11; alias butterflies at
    * the single long boundary), granule 1 = block_type 3 (stop window).
    * Same closed forms with k = id + 4 + 13·g; preflag = id%2 on the
    * stop granule only (mixed long bands 0–7 all have pretab 0). */
  private[graft] def mp3MixedAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 6)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      graft.multimodal.Multimodal.Asset(id, "audio",
        Mp3WindowFixture.frame(id,
          g0 = (2, true, id + 4), g1 = (3, false, id + 17)), 0, 0)
    })
  }

  private[graft] def multimodalMp3Short(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp3Pcm(mp3ShortAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  private[graft] def multimodalMp3Mixed(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp3Pcm(mp3MixedAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  /** BIT-RESERVOIR streams for the Layer III stream gate (round 14 —
    * the main_data_begin seam): 3 frames per asset, each frame's
    * spectral/scale-factor formulas the huffman gate's evaluated at
    * k = id + 7·frame, packed by [[graft.multimodal.Mp3.encodeMp3Reservoir]]
    * so frames 1–2's granule data lives in EARLIER frames' slot regions
    * (main_data_begin > 0 — asserted at build time so the gate cannot
    * silently degrade to self-contained frames). The oracle restates
    * only decode RESULTS; the pointer/stuffing layout is the Spark
    * side's to get right, and a misplaced start scrambles every
    * checksum. */
  private[graft] def mp3ReservoirAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 24)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      def frameSpec(f: Int) = {
        val k = id + 7 * f
        val nBig = 2 * (20 + (k % 5)).toInt
        val nC1 = 4 * (4 + (k % 3)).toInt
        def value(i: Int): Int = {
          val mag =
            if (i < 16) ((k + i) % 4).toInt
            else if (i < nBig) ((k + i) % 4).toInt match {
              case 0 => 0
              case 1 | 2 => 1
              case _ => 15 + ((k + i) % 8).toInt
            }
            else ((k + i) % 2).toInt
          if (mag != 0 && (k + i) % 5 < 2) -mag else mag
        }
        val is = Array.tabulate(nBig + nC1)(value)
        def gi(g: Int, ch: Int) = graft.multimodal.Mp3.GranuleInfo(
          part23Length = 0, bigValues = nBig / 2,
          globalGain = ((5 * k + 17 * g + 29 * ch) % 256).toInt,
          scalefacCompress = 9,
          windowSwitching = false, blockType = 0, mixedBlock = false,
          tableSelect = Seq(4, 14, 0), subblockGain = Nil,
          region0Count = 3, region1Count = 7,
          preflag = (k % 2).toInt, scalefacScale = ((k + g) % 2).toInt,
          count1TableSelect = ((k + g) % 2).toInt)
        val si = graft.multimodal.Mp3.SideInfo(0, (k % 8).toInt,
          Seq.fill(2)(Seq.fill(4)(0)),
          Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
        val sfs: Seq[Seq[Array[Int]]] = Seq.fill(2)(Seq.fill(2)(
          Array.tabulate(21)(b => ((k + b) % 4).toInt)))
        val spectra: Seq[Seq[Array[Int]]] = Seq.fill(2)(Seq.fill(2)(is))
        (si, sfs, spectra)
      }
      val bytes = graft.multimodal.Mp3.encodeMp3Reservoir(9, 0,
        (0 until 3).map(frameSpec))
      // the gate exists to exercise the reservoir: frames past the first
      // MUST carry a backward pointer
      val stream = graft.multimodal.Mp3.parseMp3(bytes).get
      stream.framePayloads.drop(1).zipWithIndex.foreach { case (p, i) =>
        val mdb = graft.multimodal.Mp3.parseSideInfo(p, 2).get.mainDataBegin
        require(mdb > 0, s"fixture frame ${i + 1} has main_data_begin 0 — reservoir not exercised")
      }
      graft.multimodal.Multimodal.Asset(id, "audio", bytes, 0, 0)
    })
  }

  private[graft] def multimodalMp3Reservoir(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp3SpectraStream(mp3ReservoirAssets(spark, dir))
      .toDF().orderBy(col("id"), col("frame"), col("granule"), col("channel"))

  /** Hand-assembled ADTS/SCE frames for the AAC gates (round 14 — the
    * rung past transport headers): every decoded value is a doc_id/
    * sample formula the oracle restates in SQL. AAC-LC, mono, 44.1 kHz,
    * ONLY_LONG sine windows, fixture uniform-32 band map, fixture
    * codebook (reserved sect_cb 12) and fixture sf book:
    *   max_sfb = 8 + id%4;   sect_cb(s) = 0 if (id+s)%3 = 0 else 12
    *   global_gain = 96 + id%8
    *   sf(s) = gg + (id + 3s)%9 − 4   (coded bands; DPCM ±4 of gg)
    *   q(i)  = ±((id+i)%3), negative iff (id+i)%5 < 2, coded bands only
    * so q, sf, the dequantized xr and the whole filterbank are
    * closed-form per (id, i). */
  private[graft] def aacSceAssets(spark: SparkSession, dir: String, nIds: Int) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < nIds)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val maxSfb = (8 + id % 4).toInt
      val gg = (96 + id % 8).toInt
      val sectCb = Array.tabulate(maxSfb)(s => if ((id + s) % 3 == 0) 0 else 12)
      val sf = Array.tabulate(maxSfb)(s =>
        if (sectCb(s) == 0) 0 else gg + ((id + 3 * s) % 9).toInt - 4)
      val quant = Array.tabulate(1024) { i =>
        val s = i / 32
        if (s >= maxSfb || sectCb(s) == 0) 0
        else {
          val mag = ((id + i) % 3).toInt
          if (mag != 0 && (id + i) % 5 < 2) -mag else mag
        }
      }
      val payload = graft.multimodal.Aac.encodeSce(gg, maxSfb, sectCb, sf, quant)
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Aac.encodeFrame(1, 4, 1, payload), 0, 0)
    })
  }

  /** Hand-assembled stereo CPE frames (round 15, r14 VERDICT #1): two
    * channel streams under common_window with the MS mask cycling
    * id % 3 ∈ {off, per-band, all-bands}. Closed-form per (id, ch, i):
    *   max_sfb = 6 + id%3;  gg(ch) = 96 + (id + 5·ch)%8
    *   sectCb(ch)(s) = 0 if (id+s+ch)%3 = 0 else 12
    *   sf(ch)(s) = gg(ch) + (id + 3s + 2·ch)%9 − 4   (coded bands)
    *   q(ch)(i)  = ±((id+i+7·ch)%3), negative iff (id+i+ch)%5 < 2
    *   ms_used(s) = (id+s)%2 = 0                     (mask 1 only)
    * so the transmitted integers AND the post-MS dequantized spectra
    * are closed-form for the oracle. */
  private[graft] def aacCpeAssets(spark: SparkSession, dir: String, nIds: Int) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < nIds)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val maxSfb = (6 + id % 3).toInt
      val mask = (id % 3).toInt
      val gg = Array.tabulate(2)(c => (96 + (id + 5 * c) % 8).toInt)
      val sectCb = Array.tabulate(2, maxSfb)((c, s) =>
        if ((id + s + c) % 3 == 0) 0 else 12)
      val sf = Array.tabulate(2, maxSfb)((c, s) =>
        if (sectCb(c)(s) == 0) 0 else gg(c) + ((id + 3 * s + 2 * c) % 9).toInt - 4)
      val quant = Array.tabulate(2, 1024) { (c, i) =>
        val s = i / 32
        if (s >= maxSfb || sectCb(c)(s) == 0) 0
        else {
          val mag = ((id + i + 7 * c) % 3).toInt
          if (mag != 0 && (id + i + c) % 5 < 2) -mag else mag
        }
      }
      val msUsed = Array.tabulate(maxSfb)(s => (id + s) % 2 == 0)
      val payload = graft.multimodal.Aac.encodeCpe(gg.toSeq,
        Seq(maxSfb, maxSfb), sectCb.map(_.toArray).toSeq,
        sf.map(_.toArray).toSeq, quant.map(_.toArray).toSeq,
        commonWindow = true, msMaskPresent = mask,
        msUsed = if (mask == 1) msUsed else Array.empty)
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Aac.encodeFrame(1, 4, 2, payload), 0, 0)
    })
  }

  private[graft] def multimodalAacCpe(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.aacCpePcm(aacCpeAssets(spark, dir, 6))
      .toDF().orderBy(col("id"), col("channel"))

  /** INTENSITY-STEREO CPE fixtures (round 16 — §4.6.8.2, the last LC
    * stereo tool): long common_window frames whose right channel codes
    * bands below isStart = 4 + id%2 normally and the rest with the
    * intensity codebooks. Closed-form per id:
    *   gg = (96 + id%8, 96 + (id+5)%8);  ms_mask_present = 1,
    *   ms_used(s) = (id+s)%2 = 0  (MS below isStart, phase flip above)
    *   left q(i) = ±((id+i)%3) neg iff (id+i)%5 < 2, sf(s) = gg0 + (id+3s)%9 − 4
    *   right coded q(i) = ±((id+i+7)%3) neg iff (id+i+1)%5 < 2,
    *   sf(s) = gg1 + (id+3s+2)%9 − 4
    *   IS bands: cb = 14 if (id+s)%3 = 0 else 15; position = (id+2s)%9 − 4. */
  private[graft] def aacIsAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 6)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val maxSfb = 8
      val isStart = (4 + id % 2).toInt
      val gg = Array((96 + id % 8).toInt, (96 + (id + 5) % 8).toInt)
      val sectCb = Array.tabulate(2, maxSfb)((c, s) =>
        if (c == 1 && s >= isStart) { if ((id + s) % 3 == 0) 14 else 15 }
        else 12)
      val sf = Array.tabulate(2, maxSfb)((c, s) =>
        if (c == 1 && s >= isStart) ((id + 2 * s) % 9).toInt - 4
        else gg(c) + ((id + 3 * s + 2 * c) % 9).toInt - 4)
      val quant = Array.tabulate(2, 1024) { (c, i) =>
        val s = i / 32
        if (s >= maxSfb || (c == 1 && s >= isStart)) 0
        else {
          val mag = ((id + i + 7 * c) % 3).toInt
          if (mag != 0 && (id + i + c) % 5 < 2) -mag else mag
        }
      }
      val msUsed = Array.tabulate(maxSfb)(s => (id + s) % 2 == 0)
      val info = graft.multimodal.Aac.IcsInfo(0, maxSfb, Array(1))
      val payload = graft.multimodal.Aac.encodeCpeWin(Seq(info, info), gg.toSeq,
        sectCb.map(c => Array(c)).toSeq, sf.map(c => Array(c)).toSeq,
        quant.map(_.toArray).toSeq, msMaskPresent = 1, msUsed = Array(msUsed))
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Aac.encodeFrame(1, 4, 2, payload), 0, 0)
    })
  }

  private[graft] def multimodalAacIs(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.aacCpePcm(aacIsAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  /** Hand-assembled WINDOW-SWITCHED ADTS streams (round 15 — r14
    * VERDICT's largest remaining codec gap): three SCE frames per id,
    * LONG_START → EIGHT_SHORT → LONG_STOP, every value closed-form so
    * the oracle restates the whole switched chain:
    *  long frames f ∈ {0, 2}, off = f/2:
    *   maxSfb = 6 + id%3;  gg = 96 + (id + 3·off)%8
    *   sectCb(s) = 0 if (id+s+off)%3 = 0 else 12
    *   sf(s) = gg + (id + 3s + off)%9 − 4   (coded bands)
    *   q(i)  = ±((id+i+off)%3), negative iff (id+i+off)%5 < 2
    *  short frame (frame 1):
    *   groupLen by id%3: [8] / [1,2,5] / [2,2,2,2];  maxSfb = 4 + id%3
    *   gg = 100 + id%6;  sectCb(g,s) = 0 if (id+g+s)%3 = 0 else 12
    *   sf(g,s) = gg + (id + 3s + 2g)%9 − 4
    *   q(i window-major) = ±((id+i)%3), negative iff (id+i)%5 < 2,
    *   coded (group-of-window, sfb-of-bin) only. */
  private[graft] def aacShortAssets(spark: SparkSession, dir: String, nIds: Int) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < nIds)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      def longFrame(seq: Int, off: Int): Array[Byte] = {
        val maxSfb = (6 + id % 3).toInt
        val gg = (96 + (id + 3 * off) % 8).toInt
        val sectCb = Array.tabulate(maxSfb)(s => if ((id + s + off) % 3 == 0) 0 else 12)
        val sf = Array.tabulate(maxSfb)(s =>
          if (sectCb(s) == 0) 0 else gg + ((id + 3 * s + off) % 9).toInt - 4)
        val quant = Array.tabulate(1024) { i =>
          val s = i / 32
          if (s >= maxSfb || sectCb(s) == 0) 0
          else {
            val mag = ((id + i + off) % 3).toInt
            if (mag != 0 && (id + i + off) % 5 < 2) -mag else mag
          }
        }
        graft.multimodal.Aac.encodeSceWin(
          graft.multimodal.Aac.IcsInfo(seq, maxSfb, Array(1)), gg,
          Array(sectCb), Array(sf), quant)
      }
      val groupLen = (id % 3).toInt match {
        case 0 => Array(8)
        case 1 => Array(1, 2, 5)
        case _ => Array(2, 2, 2, 2)
      }
      val info = graft.multimodal.Aac.IcsInfo(2, (4 + id % 3).toInt, groupLen)
      val gg1 = (100 + id % 6).toInt
      val sectCb = Array.tabulate(info.numGroups, info.maxSfb)((g, s) =>
        if ((id + g + s) % 3 == 0) 0 else 12)
      val sf = Array.tabulate(info.numGroups, info.maxSfb)((g, s) =>
        if (sectCb(g)(s) == 0) 0 else gg1 + ((id + 3 * s + 2 * g) % 9).toInt - 4)
      val grpOfWin = groupLen.zipWithIndex.flatMap { case (l, g) => Seq.fill(l)(g) }
      val quant = Array.tabulate(1024) { i =>
        val s = (i % 128) / 8; val g = grpOfWin(i / 128)
        if (s >= info.maxSfb || sectCb(g)(s) == 0) 0
        else {
          val mag = ((id + i) % 3).toInt
          if (mag != 0 && (id + i) % 5 < 2) -mag else mag
        }
      }
      val shortFrame = graft.multimodal.Aac.encodeSceWin(info, gg1,
        sectCb.map(_.toArray), sf.map(_.toArray), quant)
      val bytes =
        graft.multimodal.Aac.encodeFrame(1, 4, 1, longFrame(1, 0)) ++
        graft.multimodal.Aac.encodeFrame(1, 4, 1, shortFrame) ++
        graft.multimodal.Aac.encodeFrame(1, 4, 1, longFrame(3, 1))
      graft.multimodal.Multimodal.Asset(id, "audio", bytes, 0, 0)
    })
  }

  private[graft] def multimodalAacShort(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.aacPcmStream(aacShortAssets(spark, dir, 5))
      .toDF().orderBy(col("id"))

  /** KBD-shaped ADTS streams (late round 15 — the window SHAPE gap):
    * three ONLY_LONG SCE frames per id with shapes [id%2, KBD, sine],
    * so the stream crosses a shape switch in both directions and the
    * §14.3.3 previous-shape rule governs every overlap. Closed-form
    * per (id, f): maxSfb = 6 + (id+f)%3, gg = 96 + (id+2f)%8,
    * sectCb(s) = 0 iff (id+f+s)%3 = 0 else 12,
    * sf(s) = gg + (id+3s+f)%9 − 4, q(i) = ±((id+i+f)%3) (negative iff
    * (id+i+f)%5 < 2) over the coded uniform-32 bands. */
  private[graft] def aacKbdAssets(spark: SparkSession, dir: String, nIds: Int) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < nIds)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      def frame(f: Int, shape: Int): Array[Byte] = {
        val maxSfb = (6 + (id + f) % 3).toInt
        val gg = (96 + (id + 2 * f) % 8).toInt
        val sectCb = Array.tabulate(maxSfb)(s => if ((id + f + s) % 3 == 0) 0 else 12)
        val sf = Array.tabulate(maxSfb)(s =>
          if (sectCb(s) == 0) 0 else gg + ((id + 3 * s + f) % 9).toInt - 4)
        val quant = Array.tabulate(1024) { i =>
          val s = i / 32
          if (s >= maxSfb || sectCb(s) == 0) 0
          else {
            val mag = ((id + i + f) % 3).toInt
            if (mag != 0 && (id + i + f) % 5 < 2) -mag else mag
          }
        }
        graft.multimodal.Aac.encodeSceWin(
          graft.multimodal.Aac.IcsInfo(0, maxSfb, Array(1), shape), gg,
          Array(sectCb), Array(sf), quant)
      }
      val shapes = Seq((id % 2).toInt, 1, 0)
      val bytes = (0 until 3).map(f =>
        graft.multimodal.Aac.encodeFrame(1, 4, 1, frame(f, shapes(f))))
        .reduce(_ ++ _)
      graft.multimodal.Multimodal.Asset(id, "audio", bytes, 0, 0)
    })
  }

  private[graft] def multimodalAacKbd(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.aacPcmStream(aacKbdAssets(spark, dir, 5))
      .toDF().orderBy(col("id"))

  /** TNS-bearing SCE frames (late round 15 — the last "common in real
    * streams" AAC tool): the aacSceAssets spectral formulas with one
    * ORDER-1 TNS filter over SWBs 4..8 (length 28 from the 32-band
    * fixture map top, clipped by maxSfb 8 → samples 128..256), so the
    * decoder's AR recursion has the closed form the oracle restates:
    * y(n) = Σₖ (−a₁)ᵏ·x(n∓k). Per id: coef_res = id%2,
    * coef_compress = 0, direction = id%2 (downward for odd ids), raw
    * coefficient c = ((3·id + 1) % 7) − 3 (negatives exercise the sign
    * extension and the iqfac_m branch),
    * a₁ = sin(c / (c ≥ 0 ? iqfac : iqfac_m)). */
  private[graft] def aacTnsAssets(spark: SparkSession, dir: String, nIds: Int) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < nIds)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val maxSfb = 8
      val gg = (96 + id % 8).toInt
      val sectCb = Array.tabulate(maxSfb)(s => if ((id + s) % 3 == 0) 0 else 12)
      val sf = Array.tabulate(maxSfb)(s =>
        if (sectCb(s) == 0) 0 else gg + ((id + 3 * s) % 9).toInt - 4)
      val quant = Array.tabulate(1024) { i =>
        val s = i / 32
        if (s >= maxSfb || sectCb(s) == 0) 0
        else {
          val mag = ((id + i) % 3).toInt
          if (mag != 0 && (id + i) % 5 < 2) -mag else mag
        }
      }
      val c = ((3 * id + 1) % 7).toInt - 3
      val tns = graft.multimodal.Aac.TnsSpec((id % 2).toInt, Seq(Seq(
        graft.multimodal.Aac.TnsSpecFilter(28, 1, downward = id % 2 == 1,
          coefCompress = 0, coefs = Seq(c)))))
      val payload = graft.multimodal.Aac.encodeSceWin(
        graft.multimodal.Aac.IcsInfo(0, maxSfb, Array(1)), gg,
        Array(sectCb), Array(sf), quant, tns = Some(tns))
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Aac.encodeFrame(1, 4, 1, payload), 0, 0)
    })
  }

  private[graft] def multimodalAacTns(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.aacPcm(aacTnsAssets(spark, dir, 6))
      .toDF().orderBy(col("id"))

  /** pulse_data-bearing SCE frames (late round 15): the aacSceAssets
    * shape with ALL bands coded and 1..4 pulses in the coded region —
    * n = 1 + id%4, start SWB 2 + id%3, offset_j = 1 + (id + 2j)%5
    * (≥ 1, so positions never collide), amp_j = 1 + (id + j)%15. The
    * pulses land on the QUANTIZED integers (sign-preserving add), so
    * [[graft.multimodal.Multimodal.aacSpectra]]'s integer checksums
    * pin them directly. */
  private[graft] def aacPulseAssets(spark: SparkSession, dir: String, nIds: Int) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < nIds)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val maxSfb = 8
      val gg = (96 + id % 8).toInt
      val sectCb = Array.fill(maxSfb)(12)
      val sf = Array.tabulate(maxSfb)(s => gg + ((id + 3 * s) % 9).toInt - 4)
      val quant = Array.tabulate(1024) { i =>
        if (i >= 32 * maxSfb) 0
        else {
          val mag = ((id + i) % 3).toInt
          if (mag != 0 && (id + i) % 5 < 2) -mag else mag
        }
      }
      val n = 1 + (id % 4).toInt
      val pulse = graft.multimodal.Aac.PulseSpec((2 + id % 3).toInt,
        Seq.tabulate(n)(j => (1 + ((id + 2 * j) % 5).toInt, 1 + ((id + j) % 15).toInt)))
      val payload = graft.multimodal.Aac.encodeSceWin(
        graft.multimodal.Aac.IcsInfo(0, maxSfb, Array(1)), gg,
        Array(sectCb), Array(sf), quant, pulse = Some(pulse))
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Aac.encodeFrame(1, 4, 1, payload), 0, 0)
    })
  }

  private[graft] def multimodalAacPulse(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.aacSpectra(aacPulseAssets(spark, dir, 50))
      .toDF().orderBy(col("id"))

  private[graft] def multimodalAacSpectra(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.aacSpectra(aacSceAssets(spark, dir, 50))
      .toDF().orderBy(col("id"))

  private[graft] def multimodalAacPcm(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.aacPcm(aacSceAssets(spark, dir, 8))
      .toDF().orderBy(col("id"))

  /** The AAC CALLER-SUPPLIED-CODEBOOK path end to end: frames coded
    * entirely with REAL ISO book id 11 — escape sequences included, an
    * id the provenance discipline strict-rejects out of the box —
    * decode iff the user supplies the book through the documented
    * [[graft.multimodal.Aac.parseAacBooksSpec]] format (the gate's spec
    * text is a canonical toy stand-in with book 11's {0, 1, ESC}
    * domain; a real deployment pastes the Table A.12 transcription it
    * trusts). Each row pins BOTH halves: the decode with the book
    * (integer checksums restated by the oracle, escape values 17..36
    * exercised) and the strict reject without. */
  private[graft] def multimodalAacCodebook(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id")).as[Long]
    val specText =
      """# user-supplied 2-tuple escape codebook mounted on REAL id 11
        |book 11 dim 2 signed 0 escape 1
        |0 0 0
        |100 0 1
        |101 1 0
        |110 1 1
        |11100 0 16
        |11101 16 0
        |111100 1 16
        |111101 16 1
        |111110 16 16""".stripMargin
    src.mapPartitions { it =>
      val user = graft.multimodal.Aac.parseAacBooksSpec(specText)
      val merged = graft.multimodal.Aac.fixtureBooks ++ user
      it.map { id =>
        val maxSfb = 4 // 4 coded bands x 32 samples, all on book 11
        val sectCb = Array.fill(maxSfb)(11)
        val sf = Array.fill(maxSfb)(100)
        val quant = Array.tabulate(1024) { i =>
          if (i >= 32 * maxSfb) 0
          else {
            val base = ((id + i) % 8).toInt
            val mag =
              if (base == 7) 17 + ((id + i) % 20).toInt // escape range
              else if (base == 0 || base == 3) 0
              else 1
            if (mag != 0 && (id + i) % 5 < 2) -mag else mag
          }
        }
        val payload = graft.multimodal.Aac.encodeSce(100, maxSfb, sectCb,
          sf, quant, books = merged)
        val adts = graft.multimodal.Aac.encodeFrame(1, 4, 1, payload)
        val stream = graft.multimodal.Aac.parse(adts).get
        val withBooks = graft.multimodal.Aac.decodeSpectra(
          stream.frames.head.payload, books = merged)
        val without = graft.multimodal.Aac.decodeSpectra(
          stream.frames.head.payload) // fixture mount only: id 11 rejects
        // checksums via map/getOrElse, NOT .get (r14 review): a decode
        // regression must surface as with_books=0 + zeroed checksums —
        // an oracle VALUE mismatch — not an executor crash
        val (nnz, sq, wq) = withBooks.map { ch =>
          (ch.quant.count(_ != 0),
            ch.quant.foldLeft(0L)(_ + _),
            ch.quant.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
              acc + v.toLong * (i + 1) })
        }.getOrElse((0, 0L, 0L))
        (id, if (withBooks.isDefined) 1 else 0, if (without.isEmpty) 1 else 0,
          nnz, sq, wq)
      }
    }.toDF("id", "with_books", "without_rejects", "n_nonzero", "sum_q", "wsum_q")
      .orderBy(col("id"))
  }

  private[graft] def multimodalMp3Pcm(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp3Pcm(mp3PcmAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  /** Joint-stereo INTENSITY fixtures (round 15 — §2.7(a) closed): one
    * self-contained frame per id, mode 1 with mode_extension 1 (IS
    * only, even ids) or 3 (MS+IS, odd ids). Closed-form per (id, g, ch):
    *   left n_big = 48 samples, right n_big = 16 → the right channel's
    *   zero part starts at 16 = band boundary 4, so bands 4..21 are the
    *   intensity region;
    *   gg = 160 + (5id + 17g + 29ch)%40;  scalefacScale = (id+g)%2
    *   is(i) = ±((id+i+ch)%3), negative iff (id+i+ch)%5 < 2
    *   left sf(b) = (id + 2b + g)%4
    *   right sf(b) = (id + b + g)%4 below band 4;
    *                 IS POSITION (id + b + g)%8 from band 4 (7 = off,
    *                 6 = all-left, else the tan(·π/12) split; band 21
    *                 reuses band 20's position). */
  private[graft] def mp3IntensityAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 8)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      def value(ch: Int)(i: Int): Int = {
        val mag = ((id + i + ch) % 3).toInt
        if (mag != 0 && (id + i + ch) % 5 < 2) -mag else mag
      }
      def gi(g: Int, ch: Int) = graft.multimodal.Mp3.GranuleInfo(
        part23Length = 0, // recomputed by the emitter
        bigValues = if (ch == 0) 24 else 8,
        globalGain = (160 + (5 * id + 17 * g + 29 * ch) % 40).toInt,
        scalefacCompress = 13, // slen (3,3): positions 0..7 transmit
        windowSwitching = false, blockType = 0, mixedBlock = false,
        tableSelect = Seq(4, 4, 0), subblockGain = Nil,
        region0Count = 3, region1Count = 7,
        preflag = 0, scalefacScale = ((id + g) % 2).toInt,
        count1TableSelect = 1)
      val si = graft.multimodal.Mp3.SideInfo(0, 0,
        Seq.fill(2)(Seq.fill(4)(0)),
        Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
      val sfs = Seq.tabulate(2)(g => Seq(
        Array.tabulate(21)(b => ((id + 2 * b + g) % 4).toInt),
        Array.tabulate(21)(b =>
          if (b < 4) ((id + b + g) % 4).toInt
          else ((id + b + g) % 8).toInt)))
      val spectra = Seq.fill(2)(Seq(
        Array.tabulate(48)(value(0)), Array.tabulate(16)(value(1))))
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Mp3.encodeMp3Reservoir(9, 0, Seq((si, sfs, spectra)),
          mode = 1, modeExt = 1 + 2 * (id % 2).toInt), 0, 0)
    })
  }

  private[graft] def multimodalMp3Intensity(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp3Pcm(mp3IntensityAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  /** SHORT-window intensity fixtures (late round 15 — the decided
    * band-granular zero-part rule): both granules pure short for both
    * channels, mode 1 with mode_extension 1 (even ids) / 3 (odd).
    * Closed-form per (id, g, ch):
    *   left n = 48 transmission samples, right n = 12 → the region is
    *   every short band s with 3·bS(s) ≥ 12, i.e. s ≥ 1;
    *   gg = 160 + (5id+17g+29ch)%40;  scalefacScale = (id+g)%2;
    *   subblockGain(w) = (id + 2w + g + ch)%4
    *   is(i) = ±((id+i+ch+7g)%3), negative iff (id+i+ch+g)%5 < 2
    *   left short sf all 0; right sf(b)(w) = (id+b+w+g)%4 for b = 0
    *   (requant of its coded band), INTENSITY POSITION
    *   (id+b+w+g)%8 for b ≥ 1 (band 12 reuses band 11's). */
  private[graft] def mp3IntensityShortAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 6)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      def value(g: Int, ch: Int)(i: Int): Int = {
        val mag = ((id + i + ch + 7 * g) % 3).toInt
        if (mag != 0 && (id + i + ch + g) % 5 < 2) -mag else mag
      }
      def gi(g: Int, ch: Int) = graft.multimodal.Mp3.GranuleInfo(
        part23Length = 0,
        bigValues = if (ch == 0) 24 else 6,
        globalGain = (160 + (5 * id + 17 * g + 29 * ch) % 40).toInt,
        scalefacCompress = 13,
        windowSwitching = true, blockType = 2, mixedBlock = false,
        tableSelect = Seq(4, 4), // short: regions 0/1 only
        subblockGain = Seq.tabulate(3)(w => ((id + 2 * w + g + ch) % 4).toInt),
        region0Count = 7, region1Count = 36,
        preflag = 0, scalefacScale = ((id + g) % 2).toInt,
        count1TableSelect = 1)
      val si = graft.multimodal.Mp3.SideInfo(0, 0,
        Seq.fill(2)(Seq.fill(4)(0)),
        Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
      val sfs = Seq.tabulate(2)(g => Seq(
        new Array[Int](36),
        Array.tabulate(36) { k =>
          val b = k / 3; val w = k % 3
          if (b == 0) ((id + b + w + g) % 4).toInt
          else ((id + b + w + g) % 8).toInt
        }))
      val spectra = Seq.tabulate(2)(g => Seq(
        Array.tabulate(48)(value(g, 0)), Array.tabulate(12)(value(g, 1))))
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Mp3.encodeMp3Reservoir(9, 0, Seq((si, sfs, spectra)),
          mode = 1, modeExt = 1 + 2 * (id % 2).toInt), 0, 0)
    })
  }

  private[graft] def multimodalMp3IntensityShort(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp3Pcm(mp3IntensityShortAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  /** MIXED-block intensity fixtures (round 16 — the long+short band
    * seam, the last §2.7(a) refusal closed): both granules mixed for
    * both channels, mode 1 with mode_extension 1 (even ids) / 3 (odd).
    * Closed-form per (id, g, ch):
    *   left n = 48 transmission samples (the full 36-sample long part +
    *   short band 3); right n = 18 for EVEN ids (the zero part starts
    *   INSIDE the long region: intensity = long bands 5..7, samples
    *   20..36, via the first-boundary-≥-18 rule, plus every short
    *   band) and 42 for ODD ids (long part fully coded: no long
    *   intensity; short bands with 3·bS(s) ≥ 42, i.e. s ≥ 4 — band 3
    *   straddles and stays on the normal/MS path);
    *   gg = 160 + (5id+17g+29ch)%40;  scalefacScale = (id+g)%2;
    *   subblockGain(w) = (id + 2w + g + ch)%4 (short part only);
    *   is(i) = ±((id+i+ch+7g)%3), negative iff (id+i+ch+g)%5 < 2;
    *   left long sf(b) = (id+2b+g)%4, left short sf(b,w) = (id+b+2w+g)%4;
    *   right long sf(b) = (id+b+g)%8 where intensity (even ids, b ≥ 5)
    *   else %4; right short sf(b,w) = (id+b+w+g)%8 where intensity
    *   (even ids, or odd ids with b ≥ 4) else %4; band 12 reuses 11's
    *   positions per window. */
  private[graft] def mp3IntensityMixedAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 6)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      def value(g: Int, ch: Int)(i: Int): Int = {
        val mag = ((id + i + ch + 7 * g) % 3).toInt
        if (mag != 0 && (id + i + ch + g) % 5 < 2) -mag else mag
      }
      def gi(g: Int, ch: Int) = graft.multimodal.Mp3.GranuleInfo(
        part23Length = 0,
        bigValues = if (ch == 0) 24 else if (id % 2 == 0) 9 else 21,
        globalGain = (160 + (5 * id + 17 * g + 29 * ch) % 40).toInt,
        scalefacCompress = 13,
        windowSwitching = true, blockType = 2, mixedBlock = true,
        tableSelect = Seq(4, 4),
        subblockGain = Seq.tabulate(3)(w => ((id + 2 * w + g + ch) % 4).toInt),
        region0Count = 7, region1Count = 36,
        preflag = 0, scalefacScale = ((id + g) % 2).toInt,
        count1TableSelect = 1)
      val si = graft.multimodal.Mp3.SideInfo(0, 0,
        Seq.fill(2)(Seq.fill(4)(0)),
        Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
      // emitter order for mixed: 8 long entries then bands 3..11 × 3
      val sfs = Seq.tabulate(2)(g => Seq(
        Array.tabulate(35) { k =>
          if (k < 8) ((id + 2 * k + g) % 4).toInt
          else {
            val b = 3 + (k - 8) / 3; val w = (k - 8) % 3
            ((id + b + 2 * w + g) % 4).toInt
          }
        },
        Array.tabulate(35) { k =>
          if (k < 8) {
            if (id % 2 == 0 && k >= 5) ((id + k + g) % 8).toInt
            else ((id + k + g) % 4).toInt
          } else {
            val b = 3 + (k - 8) / 3; val w = (k - 8) % 3
            if (id % 2 == 0 || b >= 4) ((id + b + w + g) % 8).toInt
            else ((id + b + w + g) % 4).toInt
          }
        }))
      val spectra = Seq.tabulate(2)(g => Seq(
        Array.tabulate(48)(value(g, 0)),
        Array.tabulate(if (id % 2 == 0) 18 else 42)(value(g, 1))))
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Mp3.encodeMp3Reservoir(9, 0, Seq((si, sfs, spectra)),
          mode = 1, modeExt = 1 + 2 * (id % 2).toInt), 0, 0)
    })
  }

  private[graft] def multimodalMp3IntensityMixed(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp3Pcm(mp3IntensityMixedAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  /** The CALLER-SUPPLIED-CODEBOOK path end to end (round 14, r13
    * VERDICT #4): frames whose region0 selects REAL ISO table id 1 —
    * an id the provenance discipline strict-rejects out of the box —
    * decode iff the user supplies the codebook through the documented
    * [[graft.multimodal.Mp3.parseHuffTablesSpec]] format (the gate's
    * spec text is a canonical toy stand-in with ISO table 1's (x,y) ∈
    * 0..1 domain; a real deployment pastes the B.7 transcription it
    * trusts). Each row pins BOTH halves of the contract: the decode
    * with tables (spectra checksums restated by the oracle) and the
    * strict reject without. */
  private[graft] def multimodalMp3Codebook(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id")).as[Long]
    val specText =
      """# user-supplied big-values codebook mounted on REAL id 1
        |table 1 linbits 0
        |1 0 0
        |01 1 0
        |001 0 1
        |000 1 1""".stripMargin
    src.mapPartitions { it =>
      val user = graft.multimodal.Mp3.parseHuffTablesSpec(specText)
      val merged = graft.multimodal.Mp3.fixtureTables ++ user
      it.map { id =>
        val nBig = 16; val nC1 = 8 // all big values inside region0 (< bands(4))
        def value(i: Int): Int = {
          val mag = ((id + i) % 2).toInt
          if (mag != 0 && (id + i) % 3 == 0) -mag else mag
        }
        val is = Array.tabulate(nBig + nC1)(value)
        def gi(g: Int, ch: Int) = graft.multimodal.Mp3.GranuleInfo(
          part23Length = 0, bigValues = nBig / 2, globalGain = 170,
          scalefacCompress = 9, windowSwitching = false, blockType = 0,
          mixedBlock = false, tableSelect = Seq(1, 14, 0), subblockGain = Nil,
          region0Count = 3, region1Count = 7, preflag = 0,
          scalefacScale = 0, count1TableSelect = ((id + g + ch) % 2).toInt)
        val si = graft.multimodal.Mp3.SideInfo(0, 0,
          Seq.fill(2)(Seq.fill(4)(0)),
          Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
        val sfs = Seq.fill(2)(Seq.fill(2)(Array.fill(21)(0)))
        val main = graft.multimodal.Mp3.encodeSpectra(si, 2, sfs,
          Seq.fill(2)(Seq.fill(2)(is)), tables = merged)
        val flen = 417
        val stream = graft.multimodal.Mp3.parseMp3(
          graft.multimodal.Mp3.encodeMp3(1, 9, 0,
            java.util.Arrays.copyOf(main, flen - 4))).get
        val payload = stream.framePayloads.head
        val withTables = graft.multimodal.Mp3.decodeSpectra(
          payload, stream.channels, 0, tables = merged)
        val without = graft.multimodal.Mp3.decodeSpectra(
          payload, stream.channels, 0) // fixture mount only: id 1 rejects
        // checksums via map/getOrElse, NOT .get (r14 review): a decode
        // regression must surface as decodes_with_tables=0 + zeroed
        // checksums — an oracle VALUE mismatch — not an executor crash
        val (nnz, sq, pq) = withTables.map(_.head.head).map { x =>
          (x.is.count(_ != 0),
            x.is.foldLeft(0L)(_ + _),
            x.is.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
              acc + v.toLong * (i + 1) })
        }.getOrElse((0, 0L, 0L))
        (id, if (withTables.isDefined) 1 else 0, if (without.isEmpty) 1 else 0,
          nnz, sq, pq)
      }
    }.toDF("id", "decodes_with_tables", "rejects_without", "n_nonzero",
        "is_sum", "pos_sum")
      .orderBy(col("id"))
  }

  /** REAL H.264 Annex-B payloads (round 12): SPS + PPS + 1–3 IDR slice
    * NALs per doc, every SPS/PPS field a doc_id formula the oracle
    * restates, bit-packed through [[graft.multimodal.H264.encodeSps]]
    * (whose Exp-Golomb layout is independently golden-pinned in
    * MultimodalSpec against an in-test packer, so an encoder/parser bug
    * pair cannot cancel). Each slice RBSP is PREFIXED with the bytes
    * 00 00 01 00 00 02 — the start-code-emulating pattern the encoder
    * must escape and the parser must unescape, so the fingerprint pins
    * the §7.4.1.1 round trip on every asset — and TERMINATED with 0x80
    * (rbsp trailing bits; also keeps the trailing-zero strip out of the
    * payload). Even ids use all-4-byte start codes, odd ids the mixed
    * 4/3-byte convention. Slice-data entropy decode stays the seam. */
  private[graft] def h264Assets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id"), unhex(md5Chain("h264", 6)).as("chain"))
      .as[(Long, Array[Byte])]
    src.mapPartitions(_.map { case (id, chain) =>
      val profile = Array(66, 77, 100)((id % 3).toInt)
      val level = Array(30, 31, 40, 41, 51)((id % 5).toInt)
      val crop =
        if (id % 2 == 0) Some((0, (id % 3).toInt, 0, ((id / 2) % 2).toInt))
        else None
      val sps = graft.multimodal.H264.encodeSps(
        profile, level, spsId = 0,
        log2MaxFrameNumMinus4 = (id % 8).toInt, poc = 2 * (id % 2).toInt,
        maxRef = (id % 5).toInt, pwMbsMinus1 = (id % 8).toInt,
        phMapMinus1 = (id % 6).toInt, frameMbsOnly = id % 4 != 3, crop = crop)
      val pps = graft.multimodal.H264.encodePps(
        ppsId = 0, spsId = 0, cabac = id % 2 == 1)
      val nSlices = (1 + id % 3).toInt
      val sLen = (8 + id % 5).toInt
      val emul = Array[Byte](0, 0, 1, 0, 0, 2)
      val slices = (0 until nSlices).map { s =>
        val body = java.util.Arrays.copyOfRange(chain, s * sLen, (s + 1) * sLen)
        (3, 5, emul ++ body :+ 0x80.toByte)
      }
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.H264.annexB(
          Seq((3, 7, sps), (3, 8, pps)) ++ slices,
          fourByteAll = id % 2 == 0), 0, 0)
    })
  }

  private[graft] def multimodalH264Sps(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.h264Features(h264Assets(spark, dir))
      .toDF().withColumn("entropy_cabac", col("entropy_cabac").cast("int"))
      .orderBy(col("id"))

  /** Complete Annex-B I_PCM pictures (round 14, r13 VERDICT #7): SPS
    * (baseline 66, poc type 0/2 by id%3, 1–2 MBs wide × 1 high), the
    * full-§7.3.2.2 PPS exercising init-QP / deblocking / redundant
    * branches by id formulas, and ONE IDR slice whose macroblocks are
    * I_PCM with raw samples from the md5 chain — every pixel byte and
    * every header field a formula the oracle restates. */
  private[graft] def h264IPcmAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 30)
      .select(col("doc_id"), unhex(md5Chain("ipcm", 48)).as("chain"))
      .as[(Long, Array[Byte])]
    src.mapPartitions(_.map { case (id, chain) =>
      val nMbs = 1 + (id % 2).toInt
      val pocType = if (id % 3 == 0) 2 else 0
      val spsB = graft.multimodal.H264.encodeSps(
        66, 30, spsId = 0, log2MaxFrameNumMinus4 = 0, poc = pocType,
        maxRef = 1, pwMbsMinus1 = nMbs - 1, phMapMinus1 = 0,
        frameMbsOnly = true, crop = None)
      val ppsB = graft.multimodal.H264.encodePps(
        ppsId = 0, spsId = 0, cabac = false,
        picInitQp = 24 + (id % 5).toInt,
        deblockingPresent = id % 2 == 1,
        redundantPresent = id % 4 == 0)
      val sps = graft.multimodal.H264.parseSps(spsB).get
      val pps = graft.multimodal.H264.parsePps(ppsB).get
      val mbs = (0 until nMbs).map { m =>
        def bytes(off: Int, n: Int): Array[Int] =
          Array.tabulate(n)(j => chain(m * 384 + off + j) & 0xFF)
        graft.multimodal.H264.IPcmMb(bytes(0, 256), bytes(256, 64), bytes(320, 64))
      }
      val slice = graft.multimodal.H264.encodeIPcmSlice(
        sps, pps, nalRefIdc = 3, idr = true,
        frameNum = (id % 16).toInt, idrPicId = (id % 5).toInt,
        pocLsb = if (pocType == 0) (id % 16).toInt else 0,
        sliceQpDelta = (id % 7).toInt - 3, mbs,
        deblockIdc = (id % 3).toInt)
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.H264.annexB(
          Seq((3, 7, spsB), (3, 8, ppsB), (3, 5, slice))), 0, 0)
    })
  }

  private[graft] def multimodalH264IPcm(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.h264IPcm(h264IPcmAssets(spark, dir))
      .toDF().orderBy(col("id"), col("mb"))

  /** Hand-assembled CAVLC Intra_16x16 pictures (round 15, r14 VERDICT
    * #7): 2×2 macroblocks per id covering ALL FOUR §8.3.3 prediction
    * modes in a dependency chain the oracle restates stage by stage —
    * mb0 DC (no neighbors), mb1 Horizontal (left = mb0), mb2 Vertical
    * (top = mb0), mb3 Plane (left/top/top-left decoded). Closed-form:
    *   qp = 20 + (5·id)%12   (slice_qp_delta from pic_init_qp 26)
    *   dcScan(m)(k) = ((id+m+k)%5)−2 if (id+m+k)%4 = 0 else 0
    *   acScan(m)(blk)(p) = ((id+blk·(p+1)+m)%5)−2
    *                        if (id+m+blk+p)%6 = 0 else 0   (CBP luma 15)
    * coded with [[graft.multimodal.H264Cavlc.fixtureTables]] (the
    * canonical stand-in — table provenance per the CavlcTables note). */
  private[graft] def h264I16Assets(spark: SparkSession, dir: String, nIds: Int) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < nIds)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val spsB = graft.multimodal.H264.encodeSps(
        66, 30, spsId = 0, log2MaxFrameNumMinus4 = 0, poc = 0,
        maxRef = 1, pwMbsMinus1 = 1, phMapMinus1 = 1,
        frameMbsOnly = true, crop = None)
      val ppsB = graft.multimodal.H264.encodePps(
        ppsId = 0, spsId = 0, cabac = false, picInitQp = 26)
      val sps = graft.multimodal.H264.parseSps(spsB).get
      val pps = graft.multimodal.H264.parsePps(ppsB).get
      val qp = (20 + (5 * id) % 12).toInt
      val modes = Seq(2, 1, 0, 3)
      val mbs = (0 until 4).map { m =>
        graft.multimodal.H264Cavlc.I16MbSpec(modes(m), 0, 0,
          Array.tabulate(16)(k =>
            if ((id + m + k) % 4 == 0) ((id + m + k) % 5).toInt - 2 else 0),
          Array.tabulate(16, 15)((blk, p) =>
            if ((id + m + blk + p) % 6 == 0)
              ((id + blk * (p + 1) + m) % 5).toInt - 2
            else 0).map(_.toArray),
          forceCbpLuma = Some(15))
      }
      val slice = graft.multimodal.H264Cavlc.encodeI16x16Slice(
        sps, pps, nalRefIdc = 3, idr = true,
        frameNum = (id % 16).toInt, idrPicId = (id % 5).toInt,
        pocLsb = (id % 16).toInt, sliceQpDelta = qp - 26, mbs,
        tables = graft.multimodal.H264Cavlc.fixtureTables)
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.H264.annexB(
          Seq((3, 7, spsB), (3, 8, ppsB), (3, 5, slice))), 0, 0)
    })
  }

  private[graft] def multimodalH264I16x16(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.h264I16Luma(h264I16Assets(spark, dir, 4),
      graft.multimodal.H264Cavlc.fixtureTables)
      .toDF().orderBy(col("id"), col("mb"))

  /** MIXED Intra_4x4 / Intra_16x16 pictures (round 16 — the I_NxN
    * rung): 2×2 MBs per id — mb0 an Intra_16x16 DC macroblock with
    * ZERO residual (flat 128; the I16 residual math is pinned by
    * `multimodal_h264_i16x16`), mbs 1..3 Intra_4x4 with
    * availability-legal closed-form modes that cycle ALL NINE
    * §8.3.1.2 modes, per-MB qp deltas through the conditional
    * mb_qp_delta rule, and formula residual levels on every 8x8
    * (CBP luma 15). Closed-form per (id, m, blk, p):
    *   slice qp = 20 + (5·id)%12;  qpDelta(m) = ((id+m)%5)−2
    *   mode(m=1, by=0 blocks) = [1,2,8][(id+blk)%3]     (no top row)
    *   mode(m=2, bx=0 blocks) = [0,2,3,7][(id+blk)%4]   (no left col)
    *   mode(m=2, else)        = (id+1+blk)%9
    *   mode(m∈{1,3}, else)    = (id+blk)%9
    *   lumaScan(m)(blk)(p) = ((id + m·(p+2) + blk)%5)−2
    *                          if (id+m+blk+p)%7 = 0 else 0
    * coded with the canonical fixture tables (provenance per the
    * CavlcTables note). */
  private[graft] def h264I4x4Assets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 4)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val spsB = graft.multimodal.H264.encodeSps(
        66, 30, spsId = 0, log2MaxFrameNumMinus4 = 0, poc = 0,
        maxRef = 1, pwMbsMinus1 = 1, phMapMinus1 = 1,
        frameMbsOnly = true, crop = None)
      val ppsB = graft.multimodal.H264.encodePps(
        ppsId = 0, spsId = 0, cabac = false, picInitQp = 26)
      val sps = graft.multimodal.H264.parseSps(spsB).get
      val pps = graft.multimodal.H264.parsePps(ppsB).get
      val qp = (20 + (5 * id) % 12).toInt
      def mode(m: Int, blk: Int): Int = {
        val bx = 2 * ((blk / 4) % 2) + blk % 4 % 2
        val by = 2 * ((blk / 4) / 2) + (blk % 4) / 2
        if (m == 1 && by == 0) Seq(1, 2, 8)(((id + blk) % 3).toInt)
        else if (m == 2 && bx == 0) Seq(0, 2, 3, 7)(((id + blk) % 4).toInt)
        else if (m == 2) ((id + 1 + blk) % 9).toInt
        else ((id + blk) % 9).toInt
      }
      val mb0 = graft.multimodal.H264Cavlc.I16MbSpec(2, 0, 0,
        new Array[Int](16), Array.fill(16)(new Array[Int](15)))
      val i4 = (1 to 3).map { m =>
        graft.multimodal.H264Cavlc.I4x4MbSpec(
          Array.tabulate(16)(mode(m, _)), 0, ((id + m) % 5).toInt - 2,
          Array.tabulate(16, 16)((blk, p) =>
            if ((id + m + blk + p) % 7 == 0)
              ((id + m * (p + 2) + blk) % 5).toInt - 2
            else 0).map(_.toArray),
          forceCbpLuma = Some(15))
      }
      val slice = graft.multimodal.H264Cavlc.encodeI16x16Slice(
        sps, pps, nalRefIdc = 3, idr = true,
        frameNum = (id % 16).toInt, idrPicId = (id % 5).toInt,
        pocLsb = (id % 16).toInt, sliceQpDelta = qp - 26, mb0 +: i4,
        tables = graft.multimodal.H264Cavlc.fixtureTables)
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.H264.annexB(
          Seq((3, 7, spsB), (3, 8, ppsB), (3, 5, slice))), 0, 0)
    })
  }

  private[graft] def multimodalH264I4x4(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.h264I4x4Luma(h264I4x4Assets(spark, dir),
      graft.multimodal.H264Cavlc.fixtureTables)
      .toDF().orderBy(col("id"), col("mb"))

  /** Intra_8x8 pictures (round 17 — the High-profile I-frame rung):
    * the i4x4 gate's shape under a transform_8x8 PPS — mb0 a flat-128
    * zero-residual I16 DC MB, mbs 1..3 Intra_8x8 with
    * transform_size_8x8_flag = 1, four §8.3.2 modes per MB chosen
    * availability-legal by closed form, and sparse formula residuals
    * in 8x8 zig-zag scan order:
    *   slice qp = 20 + (5·id)%12;  qpDelta(m) = ((id+m)%5)−2
    *   mode(m=1, by=0) = [1,2,8][(id+b)%3]
    *   mode(m=2, bx=0) = [0,2,3,7][(id+b)%4]
    *   mode(m=2, else) = (id+1+3b)%9;  mode(m∈{1,3}, else) = (id+3b)%9
    *   scan64(m)(b)(p) = ((id + m·(p+3) + b)%5)−2
    *                      iff (id+m+b+p)%13 = 0, forceCbpLuma 15.
    * The oracle restates the §8.3.2.2.1 reference FILTERING (the 121
    * low-pass that distinguishes 8x8 prediction from its 4x4 twins),
    * all nine mode formulas, normAdjust8x8 dequant (both qp branches)
    * and the two-pass 8-point butterfly — hash-exact integers. */
  private[graft] def h264I8x8Assets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 4)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val spsB = graft.multimodal.H264.encodeSps(
        100, 40, spsId = 0, log2MaxFrameNumMinus4 = 0, poc = 0,
        maxRef = 1, pwMbsMinus1 = 1, phMapMinus1 = 1,
        frameMbsOnly = true, crop = None)
      val ppsB = graft.multimodal.H264.encodePps(
        ppsId = 0, spsId = 0, cabac = false, picInitQp = 26,
        transform8x8 = true)
      val sps = graft.multimodal.H264.parseSps(spsB).get
      val pps = graft.multimodal.H264.parsePps(ppsB).get
      val qp = (20 + (5 * id) % 12).toInt
      def mode(m: Int, b: Int): Int = {
        val bx = b % 2; val by = b / 2
        if (m == 1 && by == 0) Seq(1, 2, 8)(((id + b) % 3).toInt)
        else if (m == 2 && bx == 0) Seq(0, 2, 3, 7)(((id + b) % 4).toInt)
        else if (m == 2) ((id + 1 + 3 * b) % 9).toInt
        else ((id + 3 * b) % 9).toInt
      }
      val mb0 = graft.multimodal.H264Cavlc.I16MbSpec(2, 0, 0,
        new Array[Int](16), Array.fill(16)(new Array[Int](15)))
      val i8 = (1 to 3).map { m =>
        graft.multimodal.H264Cavlc.I8x8MbSpec(
          Array.tabulate(4)(mode(m, _)), 0, ((id + m) % 5).toInt - 2,
          Array.tabulate(4, 64)((b, p) =>
            if ((id + m + b + p) % 13 == 0)
              ((id + m * (p + 3) + b) % 5).toInt - 2
            else 0).map(_.toArray),
          forceCbpLuma = Some(15))
      }
      val slice = graft.multimodal.H264Cavlc.encodeI16x16Slice(
        sps, pps, nalRefIdc = 3, idr = true,
        frameNum = (id % 16).toInt, idrPicId = (id % 5).toInt,
        pocLsb = (id % 16).toInt, sliceQpDelta = qp - 26, mb0 +: i8,
        tables = graft.multimodal.H264Cavlc.fixtureTables)
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.H264.annexB(
          Seq((3, 7, spsB), (3, 8, ppsB), (3, 5, slice))), 0, 0)
    })
  }

  private[graft] def multimodalH264I8x8(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.h264I4x4Luma(h264I8x8Assets(spark, dir),
      graft.multimodal.H264Cavlc.fixtureTables)
      .toDF().orderBy(col("id"), col("mb"))

  /** CABAC arithmetic-CORE gate (round 16, r15 VERDICT #2's
    * "stage-by-stage" pin): a deterministic schedule of DecodeDecision
    * (two contexts, 40/41) and DecodeBypass steps over md5-chain
    * bytes, dumping (bin, codIRange, codIOffset) after EVERY step.
    * The DuckDB oracle re-implements §9.3.3.2 — context init from the
    * fixture (m, n) formula at the per-id qp, the integer rangeTabLps
    * formula, LPS/MPS paths with the state transitions, the
    * shift-counted renormalization, and bypass — over the same
    * recomputed bytes, to integer hash equality per step. */
  private[graft] def multimodalH264CabacCore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 8)
      .select(col("doc_id"), unhex(md5Chain("cabac", 8)).as("chain"))
      .as[(Long, Array[Byte])]
    src.mapPartitions(_.flatMap { case (id, chain) =>
      val qp = (20 + (5 * id) % 32).toInt
      // a fixed lead byte keeps the 9-bit init offset below 510 (the
      // engine's structural require) for every md5 chain
      val d = new graft.multimodal.H264Cabac.CabacDecoder(0x42.toByte +: chain, 0,
        graft.multimodal.H264Cabac.fixtureTables, qp)
      (0 until 48).map { k =>
        val kind = if (k % 5 == 4) 1 else 0
        val bin =
          if (kind == 1) d.bypass()
          else d.decision(if (k % 2 == 0) 40 else 41)
        val (rng, off) = d.state
        graft.multimodal.Multimodal.CabacCoreRow(id, k, kind, bin, rng, off)
      }
    }).toDF().orderBy(col("id"), col("step"))
  }

  /** CABAC-coded mixed I4x4/I16 pictures (round 16): the i4x4 gate's
    * shape — mb0 a zero-residual I16 DC MB, mbs 1..3 Intra_4x4 cycling
    * all nine §8.3.1.2 modes — re-coded through the §9.3 arithmetic
    * engine with SHIFTED closed-form constants:
    *   slice qp = 21 + (3·id)%10;  qpDelta(m) = ((id+2m)%5)−2
    *   mode(m=1, by=0) = [1,2,8][(id+1+blk)%3]
    *   mode(m=2, bx=0) = [0,2,3,7][(id+1+blk)%4]
    *   mode(m=2, else) = (id+2+blk)%9;  mode(m∈{1,3}, else) = (id+1+blk)%9
    *   lumaScan(m)(blk)(p) = ((id + m·(p+3) + blk)%5)−2
    *                          if (id+m+blk+p)%6 = 0 else 0
    * An engine desync corrupts every later bin, so the pixel-exact
    * oracle pins the whole CABAC walk end to end. */
  private[graft] def h264CabacAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 4)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val spsB = graft.multimodal.H264.encodeSps(
        66, 30, spsId = 0, log2MaxFrameNumMinus4 = 0, poc = 0,
        maxRef = 1, pwMbsMinus1 = 1, phMapMinus1 = 1,
        frameMbsOnly = true, crop = None)
      val ppsB = graft.multimodal.H264.encodePps(
        ppsId = 0, spsId = 0, cabac = true, picInitQp = 26)
      val sps = graft.multimodal.H264.parseSps(spsB).get
      val pps = graft.multimodal.H264.parsePps(ppsB).get
      val qp = (21 + (3 * id) % 10).toInt
      def mode(m: Int, blk: Int): Int = {
        val bx = 2 * ((blk / 4) % 2) + blk % 4 % 2
        val by = 2 * ((blk / 4) / 2) + (blk % 4) / 2
        if (m == 1 && by == 0) Seq(1, 2, 8)(((id + 1 + blk) % 3).toInt)
        else if (m == 2 && bx == 0) Seq(0, 2, 3, 7)(((id + 1 + blk) % 4).toInt)
        else if (m == 2) ((id + 2 + blk) % 9).toInt
        else ((id + 1 + blk) % 9).toInt
      }
      val mb0 = graft.multimodal.H264Cavlc.I16MbSpec(2, 0, 0,
        new Array[Int](16), Array.fill(16)(new Array[Int](15)))
      val i4 = (1 to 3).map { m =>
        graft.multimodal.H264Cavlc.I4x4MbSpec(
          Array.tabulate(16)(mode(m, _)), 0, ((id + 2 * m) % 5).toInt - 2,
          Array.tabulate(16, 16)((blk, p) =>
            if ((id + m + blk + p) % 6 == 0)
              ((id + m * (p + 3) + blk) % 5).toInt - 2
            else 0).map(_.toArray),
          forceCbpLuma = Some(15))
      }
      val slice = graft.multimodal.H264Cabac.encodeISlice(
        sps, pps, nalRefIdc = 3, idr = true,
        frameNum = (id % 16).toInt, idrPicId = (id % 5).toInt,
        pocLsb = (id % 16).toInt, sliceQpDelta = qp - 26, mb0 +: i4,
        tables = graft.multimodal.H264Cabac.fixtureTables)
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.H264.annexB(
          Seq((3, 7, spsB), (3, 8, ppsB), (3, 5, slice))), 0, 0)
    })
  }

  private[graft] def multimodalH264Cabac(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.h264CabacLuma(h264CabacAssets(spark, dir),
      graft.multimodal.H264Cabac.fixtureTables)
      .toDF().orderBy(col("id"), col("mb"))

  /** H.264-IN-MP4 fixtures (round 16 — the container path a real video
    * corpus takes): each asset is a complete ISO BMFF file whose video
    * track carries an `avc1`/`avcC` sample description (out-of-band
    * SPS/PPS, NAL length-prefix size 4 for even ids / 2 for odd) and
    * TWO length-prefixed IDR samples in mdat, each a CAVLC intra
    * picture with the i4x4 gate's shape seeded by eid = 2·id + sample:
    *   slice qp = 20 + (5·eid)%12;  qpDelta(m) = ((eid+m)%5)−2
    *   mode/residual formulas as in h264I4x4Assets with eid for id.
    * NAL payloads are EBSP-escaped (the real emulation-prevention
    * seam); the CABAC-in-MP4 twin is pinned by the container-parity
    * unit test (the plumbing is entropy-agnostic). */
  private[graft] def mp4H264Assets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 4)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val (spsB, ppsB) = Mp4Fixtures.mp4H264SpsPps()
      val sps = graft.multimodal.H264.parseSps(spsB).get
      val pps = graft.multimodal.H264.parsePps(ppsB).get
      val lengthSize = if (id % 2 == 0) 4 else 2
      val avcc = graft.multimodal.H264Mp4.encodeAvcc(66, 30, lengthSize,
        Seq(graft.multimodal.H264Mp4.nalUnit(3, 7, spsB)),
        Seq(graft.multimodal.H264Mp4.nalUnit(3, 8, ppsB)))
      val stsd = graft.multimodal.H264Mp4.encodeStsdAvc1(32, 32, avcc)
      val samples = (0 until 2).map(sm => graft.multimodal.H264Mp4.sampleOf(
        lengthSize, Seq(graft.multimodal.H264Mp4.nalUnit(3, 5,
          Mp4Fixtures.mp4H264SliceRbsp(id, sm, sps, pps)))))
      val payload = samples.flatten.toArray
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.Mp4.encodeMp4(32, 32, 1000L, 2L, 2, 0, payload,
          stsd = stsd, perSampleSizes = Some(samples.map(_.length).toArray)), 0, 0)
    })
  }

  private[graft] def multimodalMp4H264(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp4H264Pixels(mp4H264Assets(spark, dir),
      graft.multimodal.H264Cavlc.fixtureTables,
      graft.multimodal.H264Cabac.fixtureTables)
      .toDF().orderBy(col("id"), col("sample"), col("mb"))

  /** KEYFRAME-EXTRACTION fixtures (round 17 — stss): each asset is a
    * FOUR-sample MP4 whose stss marks samples 1 and 3 (1-based) as
    * sync. The sync samples are the mp4H264 gate's CAVLC intra slices
    * at sm = 0 and 2 (eid = 2·id + sm, same content formulas); the
    * NON-sync samples carry a NAL-type-1 P slice (slice_type 0) the
    * all-intra decoders strict-reject — exactly a real file's shape,
    * where decode-everything fails but keyframe extraction succeeds.
    * The gate pins BOTH directions: rows exist only for sm ∈ {0, 2}
    * (skipping works) and decoding is attempted on nothing else (one
    * attempted P-sample decode would throw and redden the gate). */
  private[graft] def mp4KeyframeAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 4)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val (spsB, ppsB) = Mp4Fixtures.mp4H264SpsPps()
      val sps = graft.multimodal.H264.parseSps(spsB).get
      val pps = graft.multimodal.H264.parsePps(ppsB).get
      val lengthSize = if (id % 2 == 0) 4 else 2
      val avcc = graft.multimodal.H264Mp4.encodeAvcc(66, 30, lengthSize,
        Seq(graft.multimodal.H264Mp4.nalUnit(3, 7, spsB)),
        Seq(graft.multimodal.H264Mp4.nalUnit(3, 8, ppsB)))
      val stsd = graft.multimodal.H264Mp4.encodeStsdAvc1(32, 32, avcc)
      // P-slice stub: first_mb_in_slice ue(0) + slice_type ue(0) = P —
      // bits "11", a slice the intra parsers reject by name
      val pStub = Array[Byte](0xC0.toByte, 0x00)
      val samples = (0 until 4).map { sm =>
        val nal =
          if (sm % 2 == 0) graft.multimodal.H264Mp4.nalUnit(3, 5,
            Mp4Fixtures.mp4H264SliceRbsp(id, sm, sps, pps))
          else graft.multimodal.H264Mp4.nalUnit(2, 1, pStub)
        graft.multimodal.H264Mp4.sampleOf(lengthSize, Seq(nal))
      }
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.Mp4.encodeMp4(32, 32, 1000L, 4L, 4, 0,
          samples.flatten.toArray, stsd = stsd,
          perSampleSizes = Some(samples.map(_.length).toArray),
          syncSamples = Some(Array(1, 3)),
          // round 17: stts formula deltas + signed ctts offsets — the
          // timestamps/ctts gates read them; the keyframe/pipeline
          // gates ignore them. The offsets span negatives, so the
          // fixture writes the version-1 (signed) ctts real muxers use.
          sampleDeltas = Some(Array.tabulate(4)(s => 1L + (id + s) % 7)),
          ctsOffsets = Some(Array.tabulate(4)(s => (id + 2L * s) % 5 - 2))), 0, 0)
    })
  }

  /** stts decode timestamps (round 17): per-sample DTS resolved from
    * the time-to-sample runs, composed with the stss sync flags — the
    * fields a pipeline needs to sample frames BY TIME and to stamp
    * extracted keyframes. Oracle: dts(s) = Σ_{s'<s} (1 + (id+s')%7),
    * sync ⇔ s even — pure integer restatement. */
  private[graft] def multimodalMp4Timestamps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mp4KeyframeAssets(spark, dir).mapPartitions(_.flatMap { a =>
      val m = graft.multimodal.Mp4.parseMp4(a.bytes)
        .getOrElse(throw new IllegalArgumentException(
          s"asset ${a.id}: not a supported MP4"))
      val t = m.tracks.find(_.kind == "vide").get
      require(t.sampleDts.length == t.sampleSizes.length,
        s"asset ${a.id}: stts missing or desynced")
      t.sampleDts.iterator.zipWithIndex.map { case (dts, s) =>
        (a.id, s, dts, if (t.isSync(s)) 1 else 0, t.timescale)
      }
    }).toDF("id", "sample", "dts", "is_sync", "timescale")
      .orderBy(col("id"), col("sample"))
  }

  /** ctts composition timestamps (round 17): per-sample PTS = DTS +
    * the signed version-1 composition offset — the B-frame reorder
    * surface a pipeline needs to order frames by PRESENTATION time
    * (decode order ≠ display order on real video). Oracle restates
    * pts(s) = dts(s) + ((id + 2s) % 5 − 2) closed-form. */
  private[graft] def multimodalMp4Ctts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mp4KeyframeAssets(spark, dir).mapPartitions(_.flatMap { a =>
      val m = graft.multimodal.Mp4.parseMp4(a.bytes)
        .getOrElse(throw new IllegalArgumentException(
          s"asset ${a.id}: not a supported MP4"))
      val t = m.tracks.find(_.kind == "vide").get
      require(t.samplePts.length == t.sampleSizes.length,
        s"asset ${a.id}: ctts missing or desynced")
      t.samplePts.iterator.zipWithIndex.map { case (pts, s) =>
        (a.id, s, t.sampleDts(s), pts)
      }
    }).toDF("id", "sample", "dts", "pts")
      .orderBy(col("id"), col("sample"))
  }

  /** MULTI-SLICE H.264 fixture (round 17): a 2x2-MB picture split at a
    * MID-ROW boundary — slice 0 = {mb0}, slice 1 = {mb1, mb2, mb3} —
    * so the first MB of slice 1 has a DECODED left neighbor that is
    * nonetheless UNAVAILABLE (other slice). mb0 is Intra_16x16 DC with
    * a DC-only residual (flat at a closed-form value ≠ 128): a decoder
    * that wrongly treats mb0 as available would fold that value into
    * mb1/mb2's DC prediction instead of the 128 fallback, and the
    * hash-exact oracle reddens. Slice 1 is all Intra_4x4 with modes
    * drawn from the per-position LEGAL sets under slice-bound
    * availability; each slice carries its own QP chain. */
  private[graft] def h264MultiSliceAssets(spark: SparkSession, dir: String,
                                          cabac: Boolean) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 4)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      import graft.multimodal.{H264, H264Cavlc, H264Cabac}
      val eid = id.toInt
      val spsB = H264.encodeSps(66, 30, 0, 0, 0, 1, 1, 1,
        frameMbsOnly = true, crop = None)
      val ppsB = H264.encodePps(0, 0, cabac = cabac, picInitQp = 26)
      val sps = H264.parseSps(spsB).get
      val pps = H264.parsePps(ppsB).get
      val mb0 = H264Cavlc.I16MbSpec(2, 0, ((eid + 1) % 5) - 2,
        Array.tabulate(16)(k => if (k == 0) 3 + eid % 4 else 0),
        Array.fill(16)(new Array[Int](15)))
      // per-position legal I4x4 modes under slice-1 availability:
      // mb1/mb2 see no outside-slice neighbor (fresh corner); mb3's
      // blk (0,0) lacks only the corner (it is in mb0)
      def msMode(mbIdx: Int, bx: Int, by: Int, pick: Int): Int = {
        val s =
          if (mbIdx == 3) {
            if (bx == 0 && by == 0) Seq(0, 1, 2, 3, 7, 8) else 0 to 8
          }
          else if (bx == 0 && by == 0) Seq(2)
          else if (by == 0) Seq(1, 2, 8)
          else if (bx == 0) Seq(0, 2, 3, 7)
          else 0 to 8
        s(pick % s.length)
      }
      def msI4(mbIdx: Int, qpd: Int) = H264Cavlc.I4x4MbSpec(
        Array.tabulate(16) { blk =>
          val bx = 2 * ((blk / 4) % 2) + blk % 4 % 2
          val by = 2 * ((blk / 4) / 2) + (blk % 4) / 2
          msMode(mbIdx, bx, by, eid + blk)
        },
        if (mbIdx == 3) eid % 4 else 0, qpd,
        Array.tabulate(16, 16)((blk, p) =>
          if ((eid + mbIdx + blk + p) % 7 == 0)
            ((eid + mbIdx * (p + 2) + blk) % 5) - 2 else 0).map(_.toArray),
        forceCbpLuma = Some(15))
      val sl1 = Seq(msI4(1, ((eid + 3) % 5) - 2), msI4(2, ((eid + 4) % 5) - 2),
        msI4(3, ((eid + 1) % 5) - 2))
      val d0 = (eid % 5) - 2; val d1 = ((eid + 2) % 5) - 2
      val (s0, s1) =
        if (cabac) (
          H264Cabac.encodeISlice(sps, pps, 3, idr = true, 1, 2, 3, d0,
            Seq(mb0), H264Cabac.fixtureTables, firstMb = 0),
          H264Cabac.encodeISlice(sps, pps, 3, idr = true, 1, 2, 3, d1,
            sl1, H264Cabac.fixtureTables, firstMb = 1))
        else (
          H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 1, 2, 3, d0,
            Seq(mb0), H264Cavlc.fixtureTables, firstMb = 0),
          H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 1, 2, 3, d1,
            sl1, H264Cavlc.fixtureTables, firstMb = 1))
      graft.multimodal.Multimodal.Asset(id, "video",
        H264.annexB(Seq((3, 7, spsB), (3, 8, ppsB), (3, 5, s0), (3, 5, s1))),
        0, 0)
    })
  }

  private[graft] def multimodalH264MultiSlice(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.h264MultiSliceLuma(
      h264MultiSliceAssets(spark, dir, cabac = false),
      graft.multimodal.H264Cavlc.fixtureTables,
      graft.multimodal.H264Cabac.fixtureTables, cabac = false)
      .toDF().orderBy(col("id"), col("mb"))

  private[graft] def multimodalH264MultiSliceCabac(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.h264MultiSliceLuma(
      h264MultiSliceAssets(spark, dir, cabac = true),
      graft.multimodal.H264Cavlc.fixtureTables,
      graft.multimodal.H264Cabac.fixtureTables, cabac = true)
      .toDF().orderBy(col("id"), col("mb"))

  /** SCALING-MATRIX fixture (round 17): a 2x2-MB single-slice CAVLC
    * picture whose PPS carries STREAM-CARRIED per-plane weight
    * matrices (formula-derived, no transcription constants) — mb0 is
    * I16 DC with luma-DC and chroma-DC residuals (routing wY(0,0),
    * wCb(0,0), wCr(0,0) through the §8.5.10/.11 DC paths), mbs 1..3
    * are I4x4 with the full wY matrix on every AC coefficient. The QP
    * chain straddles 24, so BOTH §8.5.12.1 branches run — including
    * the sub-24 rounding term the flat path never needed. */
  private[graft] def h264ScalingAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 4)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      import graft.multimodal.{H264, H264Cavlc}
      val eid = id.toInt
      val wY = Array.tabulate(16)(r => 8 + (eid + 3 * (r / 4) + 5 * (r % 4)) % 17)
      val wCb = Array.tabulate(16)(r => 9 + (eid + (r / 4) + 2 * (r % 4)) % 13)
      val wCr = Array.tabulate(16)(r => 10 + (eid + 2 * (r / 4) + (r % 4)) % 11)
      val spsB = H264.encodeSps(66, 30, 0, 0, 0, 1, 1, 1,
        frameMbsOnly = true, crop = None)
      val ppsB = H264.encodePps(0, 0, cabac = false, picInitQp = 26,
        scaling4 = Seq(wY, wCb, wCr))
      val sps = H264.parseSps(spsB).get
      val pps = H264.parsePps(ppsB).get
      val mb0 = H264Cavlc.I16MbSpec(2, 0, ((eid + 1) % 5) - 2,
        Array.tabulate(16)(k => if (k == 0) 3 + eid % 4 else 0),
        Array.fill(16)(new Array[Int](15)),
        chromaDc = Array(
          Array(2 + eid % 3, 0, 0, 0), Array(1 + eid % 4, 0, 0, 0)),
        forceCbpChroma = Some(1))
      def i4(m: Int, qpd: Int) = H264Cavlc.I4x4MbSpec(
        Array.tabulate(16) { blk =>
          val bx = 2 * ((blk / 4) % 2) + blk % 4 % 2
          val by = 2 * ((blk / 4) / 2) + (blk % 4) / 2
          // single-slice availability-legal modes (the mp4 fixture's
          // conventions — the oracle restates the same formulas)
          if (m == 1 && by == 0)
            Seq(1, 2, 8)((eid + blk) % 3)
          else if (m == 2 && bx == 0)
            Seq(0, 2, 3, 7)((eid + blk) % 4)
          else if (m == 2) (eid + 1 + blk) % 9
          else (eid + blk) % 9
        },
        0, qpd,
        Array.tabulate(16, 16)((blk, p) =>
          if ((eid + m + blk + p) % 7 == 0)
            ((eid + m * (p + 2) + blk) % 5) - 2 else 0).map(_.toArray),
        forceCbpLuma = Some(15))
      val mbs = Seq(mb0, i4(1, ((eid + 2) % 5) - 2), i4(2, ((eid + 3) % 5) - 2),
        i4(3, ((eid + 4) % 5) - 2))
      val rbsp = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true,
        1, 2, 3, (eid % 7) - 5, mbs, H264Cavlc.fixtureTables)
      graft.multimodal.Multimodal.Asset(id, "video",
        H264.annexB(Seq((3, 7, spsB), (3, 8, ppsB), (3, 5, rbsp))), 0, 0)
    })
  }

  /** MULTI-PICTURE Annex-B streams (round 17): the mp4 container
    * gates' EXACT per-(id, sm) slice content delivered instead as one
    * elementary stream of two IDR access units — the oracle is the
    * same restatement with the sample axis read as the FRAME axis, so
    * any access-unit mis-grouping shuffles frames and reddens. */
  private[graft] def h264StreamAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 4)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val (spsB, ppsB) = Mp4Fixtures.mp4H264SpsPps()
      val sps = graft.multimodal.H264.parseSps(spsB).get
      val pps = graft.multimodal.H264.parsePps(ppsB).get
      val frames = (0 until 2).map(sm =>
        (3, 5, Mp4Fixtures.mp4H264SliceRbsp(id, sm, sps, pps)))
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.H264.annexB(
          Seq((3, 7, spsB), (3, 8, ppsB)) ++ frames), 0, 0)
    })
  }

  private[graft] def multimodalH264Stream(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.h264StreamLuma(h264StreamAssets(spark, dir),
      graft.multimodal.H264Cavlc.fixtureTables,
      graft.multimodal.H264Cabac.fixtureTables)
      .toDF().orderBy(col("id"), col("frame"), col("mb"))

  private[graft] def multimodalH264Scaling(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.h264ScalingLuma(h264ScalingAssets(spark, dir),
      graft.multimodal.H264Cavlc.fixtureTables)
      .toDF().orderBy(col("id"), col("mb"))

  /** END-TO-END media pipeline (round 17, r16 VERDICT #5 — the media
    * analog of training_export): ONE declarative plan composing the
    * tiers the way a training-data pipeline would —
    *   MP4 container walk → stss keyframe extraction → intra decode →
    *   pooled-luma embedding (all inside one mapPartitions kernel) →
    *   brute-force dot-product KNN (broadcast self-join over the
    *   frame set) → top-1 per frame.
    * Integer dot products and deterministic (n_id, n_sample)
    * tie-breaks keep the oracle hash-exact; the plan stays JOIN-FREE
    * until the final KNN (PlanAudit pins cartesian=0 and a single
    * broadcast join). The fixture is the keyframe gate's — P-sample
    * files where only stss-marked samples decode. */
  private[graft] def mediaPipelineKnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.multimodal.Multimodal.mp4KeyframeEmbeddings(
      mp4KeyframeAssets(spark, dir),
      graft.multimodal.H264Cavlc.fixtureTables,
      graft.multimodal.H264Cabac.fixtureTables).toDF()
    val other = emb.select(col("id").as("n_id"), col("sample").as("n_sample"),
      col("v").as("nv"))
    val pairs = emb.join(org.apache.spark.sql.functions.broadcast(other),
        !(col("id") === col("n_id") && col("sample") === col("n_sample")))
      .withColumn("dot", expr(
        "aggregate(zip_with(v, nv, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"), col("sample"))
      .orderBy(col("dot").desc, col("n_id"), col("n_sample"))
    pairs.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("rn") === 1)
      .select(col("id"), col("sample").cast("int").as("sample"),
        col("n_id"), col("n_sample").cast("int").as("n_sample"),
        col("dot").cast("bigint").as("dot"))
      .orderBy(col("id"), col("sample"))
  }

  private[graft] def multimodalMp4Keyframes(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp4H264Keyframes(mp4KeyframeAssets(spark, dir),
      graft.multimodal.H264Cavlc.fixtureTables,
      graft.multimodal.H264Cabac.fixtureTables)
      .toDF().orderBy(col("id"), col("sample"), col("mb"))

  /** AAC-IN-MP4 (M4A) fixtures (round 16 — the audio container twin):
    * each asset is an ISO BMFF file whose sound track carries an
    * `mp4a`/`esds` sample description (AudioSpecificConfig: LC,
    * rate_idx = id%13, mono) and TWO raw_data_block samples — LONG
    * SCE frames with closed-form spectra, so the PCM stream decode
    * THREADS the overlap-add across the sample boundary (the seam the
    * oracle restates):
    *   gg(f) = 96 + (id + 5f)%8;  sf(f, s) = gg + (id + 3s + f)%9 − 4
    *   quant(f, i) = ±((id+i+7f)%3), negative iff (id+i+f)%5 < 2,
    *                 zero from sample 256 (maxSfb 8). */
  private[graft] def mp4AacAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 6)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val samples = (0 until 2).map(f => Mp4Fixtures.mp4AacRawBlock(id, f))
      val asc = graft.multimodal.AacMp4.encodeAsc((id % 13).toInt, 1)
      val stsd = graft.multimodal.AacMp4.encodeStsdMp4a(1,
        graft.multimodal.Aac.SampleRates((id % 13).toInt),
        graft.multimodal.AacMp4.encodeEsds(asc))
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Mp4.encodeMp4(0, 0, 1000L, 2L, 2, 0,
          samples.flatten.toArray, stsd = stsd,
          perSampleSizes = Some(samples.map(_.length).toArray),
          handler = "soun"), 0, 0)
    })
  }

  private[graft] def multimodalMp4Aac(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp4AacPcm(mp4AacAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  /** GAPLESS m4a fixtures (round 17): the mp4Aac content plus a §8.6.6
    * edit list — one leading EMPTY edit (presentation delay E) and one
    * normal edit (media_time D, duration L), the iTunes priming shape.
    * mvhd/mdhd timescale = the sample rate, so D/E/L are sample
    * counts; D and L are formula-derived and stay inside the
    * 2048-sample decode. */
  private[graft] def mp4GaplessAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 4)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val samples = (0 until 2).map(f => Mp4Fixtures.mp4AacRawBlock(id, f))
      val asc = graft.multimodal.AacMp4.encodeAsc((id % 13).toInt, 1)
      val rate = graft.multimodal.Aac.SampleRates((id % 13).toInt)
      val stsd = graft.multimodal.AacMp4.encodeStsdMp4a(1, rate,
        graft.multimodal.AacMp4.encodeEsds(asc))
      val d = 64 + (id * 37) % 256
      val l = 2048 - d - (id * 29) % 200
      val e = (id + 1) * 10
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Mp4.encodeMp4(0, 0, rate.toLong, 2L, 2, 0,
          samples.flatten.toArray, stsd = stsd,
          perSampleSizes = Some(samples.map(_.length).toArray),
          handler = "soun",
          edits = Some(Seq((e, -1L), (l, d)))), 0, 0)
    })
  }

  private[graft] def multimodalMp4Gapless(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp4AacPcmGapless(mp4GaplessAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  /** INTERLEAVED-CHUNK two-track MP4 fixtures (round 16 — the layout
    * real muxers produce, and precisely what the old contiguous-from-
    * first-chunk read would MIS-SLICE): one file carries a video track
    * (the mp4H264 slices) and an audio track (the mp4Aac raw blocks)
    * whose chunks alternate in mdat as [V0, A0, V1, A1], each track's
    * stsc × stco resolving its own samples across the gaps. Content
    * formulas are IDENTICAL to the single-track gates, so both oracles
    * are reused verbatim — the gates pin the container slicing alone. */
  private[graft] def mp4ChunkedAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 4)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val (spsB, ppsB) = Mp4Fixtures.mp4H264SpsPps()
      val sps = graft.multimodal.H264.parseSps(spsB).get
      val pps = graft.multimodal.H264.parsePps(ppsB).get
      val lengthSize = if (id % 2 == 0) 4 else 2
      val avcc = graft.multimodal.H264Mp4.encodeAvcc(66, 30, lengthSize,
        Seq(graft.multimodal.H264Mp4.nalUnit(3, 7, spsB)),
        Seq(graft.multimodal.H264Mp4.nalUnit(3, 8, ppsB)))
      val stsdV = graft.multimodal.H264Mp4.encodeStsdAvc1(32, 32, avcc)
      val v = (0 until 2).map(sm => graft.multimodal.H264Mp4.sampleOf(
        lengthSize, Seq(graft.multimodal.H264Mp4.nalUnit(3, 5,
          Mp4Fixtures.mp4H264SliceRbsp(id, sm, sps, pps)))))
      val a = (0 until 2).map(f => Mp4Fixtures.mp4AacRawBlock(id, f))
      val asc = graft.multimodal.AacMp4.encodeAsc((id % 13).toInt, 1)
      val stsdA = graft.multimodal.AacMp4.encodeStsdMp4a(1,
        graft.multimodal.Aac.SampleRates((id % 13).toInt),
        graft.multimodal.AacMp4.encodeEsds(asc))
      val mdat = v(0) ++ a(0) ++ v(1) ++ a(1)
      val off = Array(0L, v(0).length.toLong, (v(0).length + a(0).length).toLong,
        (v(0).length + a(0).length + v(1).length).toLong)
      val tracks = Seq(
        graft.multimodal.Mp4.TrackSpec("vide", 32, 32, stsdV,
          Array(v(0).length, v(1).length), Array(1, 1), Array(off(0), off(2))),
        graft.multimodal.Mp4.TrackSpec("soun", 0, 0, stsdA,
          Array(a(0).length, a(1).length), Array(1, 1), Array(off(1), off(3))))
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.Mp4.encodeMp4Multi(1000L, 2L, tracks, mdat), 0, 0)
    })
  }

  private[graft] def multimodalMp4ChunksH264(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp4H264Pixels(mp4ChunkedAssets(spark, dir),
      graft.multimodal.H264Cavlc.fixtureTables,
      graft.multimodal.H264Cabac.fixtureTables)
      .toDF().orderBy(col("id"), col("sample"), col("mb"))

  private[graft] def multimodalMp4ChunksAac(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp4AacPcm(mp4ChunkedAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  /** FRAGMENTED two-track MP4 fixtures (round 17 — moof/tfhd/trun, the
    * DASH/CMAF shape streaming-derived corpora carry): the SAME
    * video/audio content as the chunked gates (mp4H264SliceRbsp /
    * mp4AacRawBlock — both oracles reused verbatim), but delivered as
    * an init segment with EMPTY sample tables + mvex/trex followed by
    * TWO moof+mdat fragments, one video + one audio sample per
    * fragment, resolved through default-base-is-moof + trun
    * data_offset/sizes/flags. The gates pin the fragment walk alone —
    * a desynced trun offset mis-slices a sample and reddens both. */
  private[graft] def mp4FragAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 4)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val (spsB, ppsB) = Mp4Fixtures.mp4H264SpsPps()
      val sps = graft.multimodal.H264.parseSps(spsB).get
      val pps = graft.multimodal.H264.parsePps(ppsB).get
      val lengthSize = if (id % 2 == 0) 4 else 2
      val avcc = graft.multimodal.H264Mp4.encodeAvcc(66, 30, lengthSize,
        Seq(graft.multimodal.H264Mp4.nalUnit(3, 7, spsB)),
        Seq(graft.multimodal.H264Mp4.nalUnit(3, 8, ppsB)))
      val stsdV = graft.multimodal.H264Mp4.encodeStsdAvc1(32, 32, avcc)
      val v = (0 until 2).map(sm => graft.multimodal.H264Mp4.sampleOf(
        lengthSize, Seq(graft.multimodal.H264Mp4.nalUnit(3, 5,
          Mp4Fixtures.mp4H264SliceRbsp(id, sm, sps, pps)))))
      val a = (0 until 2).map(f => Mp4Fixtures.mp4AacRawBlock(id, f))
      val asc = graft.multimodal.AacMp4.encodeAsc((id % 13).toInt, 1)
      val stsdA = graft.multimodal.AacMp4.encodeStsdMp4a(1,
        graft.multimodal.Aac.SampleRates((id % 13).toInt),
        graft.multimodal.AacMp4.encodeEsds(asc))
      val tracks = Seq(
        graft.multimodal.Mp4.FragTrack(1, "vide", 32, 32, stsdV),
        graft.multimodal.Mp4.FragTrack(2, "soun", 0, 0, stsdA))
      val fragments = (0 until 2).map { f =>
        (Seq(
          // round 17 timestamps: explicit durations + signed cts on the
          // video run; fragment 0 anchors with tfdt, fragment 1 omits
          // it (the parser must continue from fragment 0's end); the
          // audio run carries neither (trex default duration 0)
          graft.multimodal.Mp4.FragRun(1, Array(v(f).length), Array(true),
            durations = Array(10L + (id + f) % 3),
            cts = Array((id + f) % 3 - 1),
            tfdt = if (f == 0) Some(id) else None),
          graft.multimodal.Mp4.FragRun(2, Array(a(f).length), Array(true))),
          (v(f) ++ a(f)).toArray)
      }
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.Mp4.encodeMp4Frag(1000L, 2L, tracks, fragments), 0, 0)
    })
  }

  private[graft] def multimodalMp4FragH264(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp4H264Pixels(mp4FragAssets(spark, dir),
      graft.multimodal.H264Cavlc.fixtureTables,
      graft.multimodal.H264Cabac.fixtureTables)
      .toDF().orderBy(col("id"), col("sample"), col("mb"))

  private[graft] def multimodalMp4FragAac(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp4AacPcm(mp4FragAssets(spark, dir))
      .toDF().orderBy(col("id"), col("channel"))

  /** Fragmented timestamps (round 17): DTS from trun durations
    * anchored by tfdt on fragment 0 and by CONTINUATION (previous
    * fragment's end) on fragment 1, PTS from the signed v1 trun
    * composition offsets; the audio track pins the trex
    * default-duration path (no trun durations → all-zero DTS). */
  private[graft] def multimodalMp4FragTimestamps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mp4FragAssets(spark, dir).mapPartitions(_.flatMap { a =>
      val m = graft.multimodal.Mp4.parseMp4(a.bytes)
        .getOrElse(throw new IllegalArgumentException(
          s"asset ${a.id}: not a supported fragmented MP4"))
      m.tracks.iterator.flatMap { t =>
        require(t.sampleDts.length == t.sampleSizes.length &&
          t.samplePts.length == t.sampleSizes.length,
          s"asset ${a.id} track ${t.trackId}: fragmented timestamps missing")
        t.sampleDts.indices.map(s =>
          (a.id, t.trackId, s, t.sampleDts(s), t.samplePts(s)))
      }
    }).toDF("id", "trk", "sample", "dts", "pts")
      .orderBy(col("id"), col("trk"), col("sample"))
  }

  /** CHROMA-bearing Intra_16x16 pictures (late round 15): 2×2 MBs, all
    * four §8.3.4 chroma prediction modes in the dependency chain (mb0
    * DC, mb1 H, mb2 V, mb3 Plane), CBP chroma forced 2 with formula DC
    * and AC levels, chroma_qp_index_offset = 2 in the PPS, and
    * qp = 22 + 3·id so id 3 crosses into the §8.5.8 QPC mapping table:
    *   chromaDc(c)(k)  = ((id+m+c+k)%5)−2   iff (id+m+c+k)%3 = 0
    *   chromaAc(c)(blk)(p) = ((id+blk·(p+1)+c+m)%5)−2
    *                          iff (id+m+c+blk+p)%6 = 0
    * Luma residuals are all-zero (the luma plane is pinned by
    * multimodal_h264_i16x16) — chroma prediction is luma-independent. */
  private[graft] def h264ChromaAssets(spark: SparkSession, dir: String, nIds: Int) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < nIds)
      .select(col("doc_id")).as[Long]
    src.mapPartitions(_.map { id =>
      val spsB = graft.multimodal.H264.encodeSps(
        66, 30, spsId = 0, log2MaxFrameNumMinus4 = 0, poc = 0,
        maxRef = 1, pwMbsMinus1 = 1, phMapMinus1 = 1,
        frameMbsOnly = true, crop = None)
      val ppsB = graft.multimodal.H264.encodePps(
        ppsId = 0, spsId = 0, cabac = false, picInitQp = 26,
        chromaQpOffset = 2)
      val sps = graft.multimodal.H264.parseSps(spsB).get
      val pps = graft.multimodal.H264.parsePps(ppsB).get
      val qp = (22 + 3 * id).toInt
      val lumaModes = Seq(2, 1, 0, 3)
      val mbs = (0 until 4).map { m =>
        graft.multimodal.H264Cavlc.I16MbSpec(lumaModes(m), m, 0,
          new Array[Int](16), Array.fill(16)(new Array[Int](15)),
          chromaDc = Array.tabulate(2, 4)((c, k) =>
            if ((id + m + c + k) % 3 == 0) ((id + m + c + k) % 5).toInt - 2 else 0),
          chromaAc = Array.tabulate(2, 4, 15)((c, blk, p) =>
            if ((id + m + c + blk + p) % 6 == 0)
              ((id + blk * (p + 1) + c + m) % 5).toInt - 2
            else 0).map(_.map(_.toArray)).map(_.toArray),
          forceCbpChroma = Some(2))
      }
      val slice = graft.multimodal.H264Cavlc.encodeI16x16Slice(
        sps, pps, nalRefIdc = 3, idr = true,
        frameNum = (id % 16).toInt, idrPicId = (id % 5).toInt,
        pocLsb = (id % 16).toInt, sliceQpDelta = qp - 26, mbs,
        tables = graft.multimodal.H264Cavlc.fixtureTables)
      graft.multimodal.Multimodal.Asset(id, "video",
        graft.multimodal.H264.annexB(
          Seq((3, 7, spsB), (3, 8, ppsB), (3, 5, slice))), 0, 0)
    })
  }

  private[graft] def multimodalH264I16Chroma(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.h264I16Chroma(h264ChromaAssets(spark, dir, 4),
      graft.multimodal.H264Cavlc.fixtureTables)
      .toDF().orderBy(col("id"), col("mb"))

  /** REAL AAC ADTS payloads (round 12): 2–4 frames per doc, profile/rate/
    * channel formulas the oracle restates, raw_data_block bytes from the
    * md5 chain. Every 4th id carries the protection_absent = 0 layout
    * (16-bit crc_check field between header and payload — skipped, not
    * validated; see [[graft.multimodal.Aac]]), so the variable header
    * length is pinned by the payload fingerprint. */
  private[graft] def aacAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id"), unhex(md5Chain("aac", 6)).as("chain"))
      .as[(Long, Array[Byte])]
    src.mapPartitions(_.map { case (id, chain) =>
      val n = (2 + id % 3).toInt
      val pLen = (16 + id % 7).toInt
      val frames = (0 until n).map { f =>
        val body = java.util.Arrays.copyOfRange(chain, f * pLen, (f + 1) * pLen)
        ((id % 2).toInt, (3 + id % 3).toInt, (1 + id % 2).toInt, body,
          if (id % 4 == 0) Some(((id * 257) % 65536).toInt) else None)
      }
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Aac.encode(frames), 0, 0)
    })
  }

  private[graft] def multimodalAacAdts(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.aacFeatures(aacAssets(spark, dir))
      .toDF().orderBy(col("id"))

  /** The resize kernel over REALLY-DECODED pixels: the P6 header is
    * stripped by the parser, so the stride-gather runs over the raw RGB
    * payload — the oracle's hex arithmetic starts after the header by
    * construction and mismatches if resize ever sees header bytes. */
  private[graft] def multimodalPpmResize(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.resizeBinarySafe(ppmAssets(spark, dir), tw = 4, th = 4)
      .toDF().orderBy(col("id"))

  /** REAL WAV payloads: canonical PCM container per doc (channels/rate
    * vary per doc, 16-bit samples unhexed from the md5 chain), encoded
    * through [[graft.multimodal.Codecs.encodeWav]] — the gate-side
    * fixture builder; the operators only decode, and the decoder is
    * additionally golden-fixture-pinned in MultimodalSpec against
    * hand-written bytes so an encoder/decoder bug pair cannot cancel. */
  private[graft] def wavAssets(spark: SparkSession, dir: String,
                        salt: String, blocks: Int, pcmLen: Column) = {
    import spark.implicits._
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id"),
        (lit(1) + col("doc_id") % 2).cast("int").as("ch"),
        (lit(8000) + (col("doc_id") % 3) * 4000).cast("int").as("rate"),
        unhex(md5Chain(salt, blocks).substr(lit(1), (pcmLen * 2).cast("int"))).as("pcm"))
      .as[(Long, Int, Int, Array[Byte])]
    src.mapPartitions(_.map { case (id, ch, rate, pcm) =>
      graft.multimodal.Multimodal.Asset(id, "audio",
        graft.multimodal.Codecs.encodeWav(pcm, ch, rate, bitsPerSample = 16), 0, 0)
    })
  }

  /** Per-frame MP3 fingerprints over the same CBR assets as the parse
    * gate — pins every frame boundary individually. */
  private[graft] def multimodalMp3Frames(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.mp3FrameFingerprints(mp3Assets(spark, dir))
      .toDF().orderBy(col("id"), col("frame_idx"))

  /** Real PCM arithmetic: per-channel exact amplitude sums over the
    * deinterleaved 16-bit LE samples of the wav_decode assets. */
  private[graft] def multimodalWavChannels(spark: SparkSession, dir: String): DataFrame = {
    val pcmLen = ((lit(30) + col("doc_id") % 7) * (lit(1) + col("doc_id") % 2) * 2).cast("int")
    graft.multimodal.Multimodal.wavChannelStats(
        wavAssets(spark, dir, "wav", 10, pcmLen))
      .toDF().orderBy(col("id"), col("channel"))
  }

  private[graft] def multimodalWavDecode(spark: SparkSession, dir: String): DataFrame = {
    // whole frames for ch ∈ {1,2}: n_samples × ch × 2 bytes
    val pcmLen = ((lit(30) + col("doc_id") % 7) * (lit(1) + col("doc_id") % 2) * 2).cast("int")
    graft.multimodal.Multimodal.wavFeatures(
        wavAssets(spark, dir, "wav", 10, pcmLen))
      .toDF().orderBy(col("id"))
  }

  /** Frame sampling over REALLY-DECODED PCM: the RIFF header and chunk
    * framing are stripped by the parser, so the 256-byte frame windows
    * start at the first sample — the oracle's windows do too. */
  private[graft] def multimodalWavFrames(spark: SparkSession, dir: String): DataFrame = {
    val pcmLen = (lit(400) + (col("doc_id") % 5) * 160).cast("int") // ÷4 ⇒ whole frames
    graft.multimodal.Multimodal.sampleFramesBinarySafe(
        wavAssets(spark, dir, "wavf", 65, pcmLen), every = 2)
      .toDF().orderBy(col("id"), col("frame_idx"))
  }

  /** REAL JPEG payloads (r8 VERDICT #6): a complete baseline grayscale
    * JPEG per doc — each 8×8 block the constant gray of one md5-chain
    * payload byte, unit quant table, standard Huffman tables, real
    * entropy coding — the DC-only construction [[graft.multimodal.Jpeg]]
    * proves decodes back to the payload EXACTLY, so the full decoder
    * (marker walk, Huffman, dequant, IDCT) is oracle-pinned end to end;
    * general (nonzero-AC) decoding is golden-fixture-pinned in
    * MultimodalSpec against hand-assembled bitstreams. */
  private[graft] def jpegAssets(spark: SparkSession, dir: String,
                         restartInterval: Int = 0) = {
    import spark.implicits._
    val bwC = (lit(1) + col("doc_id") % 4).cast("int")
    val bhC = (lit(1) + col("doc_id") % 3).cast("int")
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id"), bwC.as("bw"), bhC.as("bh"),
        unhex(md5Chain("jpg", 1).substr(lit(1), (bwC * bhC * 2).cast("int"))).as("payload"))
      .as[(Long, Int, Int, Array[Byte])]
    src.mapPartitions(_.map { case (id, bw, bh, payload) =>
      graft.multimodal.Multimodal.Asset(id, "image",
        graft.multimodal.Jpeg.encodeJpegConstBlocks(payload, bw, bh, restartInterval),
        0, 0)
    })
  }

  private[graft] def multimodalJpegDecode(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.jpegFeatures(jpegAssets(spark, dir))
      .toDF().orderBy(col("id"))

  /** DECODE-ON-INGEST (round 10): the batch JPEG gate's exact pipeline —
    * md5-chain payload → real entropy encode → full baseline decode →
    * pixel fingerprint — run INSIDE a streaming query over the paced
    * documents source. Stateless append mode (per-row pure function ⇒
    * batch slicing cannot change the result set), so the gate shares
    * multimodal_jpeg_decode's oracle verbatim: streaming ingest provably
    * preserves the media tier, the way streaming_ingest_hybrid pins the
    * vector/text tier. */
  private[graft] def streamingMediaDecode(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingGates.streamDocsTransform(spark, dir) { sdf =>
      import sdf.sparkSession.implicits._
      val bwC = (lit(1) + col("doc_id") % 4).cast("int")
      val bhC = (lit(1) + col("doc_id") % 3).cast("int")
      val src = sdf.where(col("doc_id") < 50)
        .select(col("doc_id"), bwC.as("bw"), bhC.as("bh"),
          unhex(md5Chain("jpg", 1).substr(lit(1), (bwC * bhC * 2).cast("int"))).as("payload"))
        .as[(Long, Int, Int, Array[Byte])]
      graft.multimodal.Multimodal.jpegFeatures(
        src.mapPartitions(_.map { case (id, bw, bh, payload) =>
          graft.multimodal.Multimodal.Asset(id, "image",
            graft.multimodal.Jpeg.encodeJpegConstBlocks(payload, bw, bh), 0, 0)
        })).toDF()
    }.orderBy(col("id"))

  /** The SAME payloads encoded WITH restart intervals (DRI + RSTn every 2
    * MCUs: byte-aligned segments, cycling markers, DC predictors reset) —
    * decode output is identical by construction, so the gate shares
    * multimodal_jpeg_decode's oracle verbatim while exercising the
    * decoder's restart machinery end to end. */
  private[graft] def multimodalJpegRestart(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.jpegFeatures(jpegAssets(spark, dir, restartInterval = 2))
      .toDF().orderBy(col("id"))

  /** The SAME payloads as PROGRESSIVE (SOF2) streams (r9 VERDICT #8): six
    * successive scans — DC first at Al=4, four DC refinement scans
    * carrying REAL payload bits, an AC band scan coded as EOB runs — with
    * restart intervals on half the assets (markers cycle within every
    * scan). Decode output equals the baseline encoding by construction,
    * so the gate shares multimodal_jpeg_decode's oracle verbatim while
    * exercising the whole multi-scan coefficient-accumulation path. */
  private[graft] def multimodalJpegProgressive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bwC = (lit(1) + col("doc_id") % 4).cast("int")
    val bhC = (lit(1) + col("doc_id") % 3).cast("int")
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id"), bwC.as("bw"), bhC.as("bh"),
        unhex(md5Chain("jpg", 1).substr(lit(1), (bwC * bhC * 2).cast("int"))).as("payload"))
      .as[(Long, Int, Int, Array[Byte])]
    graft.multimodal.Multimodal.jpegFeatures(
      src.mapPartitions(_.map { case (id, bw, bh, payload) =>
        graft.multimodal.Multimodal.Asset(id, "image",
          graft.multimodal.Jpeg.encodeJpegProgressiveConstBlocks(payload, bw, bh,
            restartInterval = if (id % 2 == 0) 3 else 0), 0, 0)
      })).toDF().orderBy(col("id"))
  }

  /** Oracle shared by the plain and restart-interval JPEG gates: every
    * pixel of block (bx, by) is the payload byte at index by·bw + bx, so
    * the full-buffer fingerprint expands per pixel q:
    * block = (q // (w·8))·bw + (q % w) // 8, hex pair at block·2 + 1. */
  private[graft] val jpegDecodeSql: String =
    """WITH p AS (
      |  SELECT doc_id AS id, (1 + doc_id % 4) AS bw, (1 + doc_id % 3) AS bh,
      |         md5(text || '_jpg_0') AS hx
      |  FROM documents WHERE doc_id < 50),
      |e AS (SELECT id, bw*8 AS w, bh*8 AS h, bw, hx FROM p)
      |SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |       CAST(w*h AS INT) AS n_pixels,
      |       md5(array_to_string(list_transform(range(0, w*h),
      |         q -> substr(hx, CAST(((q // (w*8)) * bw + (q % w) // 8) * 2 + 1 AS INT), 2)), '')) AS pixel_fp
      |FROM e ORDER BY id""".stripMargin

  /** COLOR JPEG payloads: 3-component 4:4:4 baseline files, each block's
    * constant (Y, Cb, Cr) from three md5-chain bytes — DC-only exactness
    * per component makes the decoded YCbCr the payload bytes exactly, and
    * the JFIF YCbCr→RGB conversion (floor(x+0.5), clamp 0..255 — both
    * engines agree bit-for-bit on it, see [[graft.multimodal.Jpeg]]) is
    * restated by the oracle per block. The fingerprint covers the FULL
    * interleaved RGB buffer. */
  private[graft] def jpegColorAssets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val bwC = (lit(1) + col("doc_id") % 4).cast("int")
    val bhC = (lit(1) + col("doc_id") % 3).cast("int")
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id"), bwC.as("bw"), bhC.as("bh"),
        unhex(md5Chain("jpgc", 3).substr(lit(1), (bwC * bhC * 6).cast("int"))).as("payload"))
      .as[(Long, Int, Int, Array[Byte])]
    src.mapPartitions(_.map { case (id, bw, bh, payload) =>
      val n = bw * bh
      // payload layout: (y, cb, cr) triples per block, row-major blocks
      val y = Array.tabulate(n)(b => payload(3 * b))
      val cb = Array.tabulate(n)(b => payload(3 * b + 1))
      val cr = Array.tabulate(n)(b => payload(3 * b + 2))
      graft.multimodal.Multimodal.Asset(id, "image",
        graft.multimodal.Jpeg.encodeJpegConstBlocksColor(y, cb, cr, bw, bh), 0, 0)
    })
  }

  private[graft] def multimodalJpegColor(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.jpegRgbFeatures(jpegColorAssets(spark, dir))
      .toDF().orderBy(col("id"))

  /** 4:2:0 SUBSAMPLED color assets (r9 VERDICT #3): per doc, mw×mh MCUs of
    * 16×16 px — 6 payload bytes per MCU (four luma block values row-major
    * within the MCU, then cb, cr). Constant blocks keep the lossy pipeline
    * bit-exact per component (DC-only + unit quant), and constant chroma
    * blocks make the replication upsample exact, so the oracle pins the
    * FULL upsampled-and-converted RGB buffer in hex space — the color
    * gate's discipline over a structurally different (subsampled) stream. */
  private[graft] def jpeg420Assets(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val mwC = (lit(1) + col("doc_id") % 3).cast("int")
    val mhC = (lit(1) + col("doc_id") % 2).cast("int")
    val src = docsTbl(spark, dir).where(col("doc_id") < 50)
      .select(col("doc_id"), mwC.as("mw"), mhC.as("mh"),
        unhex(md5Chain("jp420", 3).substr(lit(1), (mwC * mhC * 12).cast("int"))).as("payload"))
      .as[(Long, Int, Int, Array[Byte])]
    src.mapPartitions(_.map { case (id, mw, mh, payload) =>
      val nM = mw * mh
      // per MCU m: bytes 6m..6m+3 = luma blocks (v0*2 + h0), 6m+4/5 = cb/cr
      val y = new Array[Byte](4 * nM)
      val cb = Array.tabulate(nM)(m => payload(6 * m + 4))
      val cr = Array.tabulate(nM)(m => payload(6 * m + 5))
      var m = 0
      while (m < nM) {
        val (my, mx) = (m / mw, m % mw)
        var p = 0
        while (p < 4) {
          y((my * 2 + p / 2) * (mw * 2) + mx * 2 + p % 2) = payload(6 * m + p)
          p += 1
        }
        m += 1
      }
      graft.multimodal.Multimodal.Asset(id, "image",
        graft.multimodal.Jpeg.encodeJpegConstBlocks420(y, cb, cr, mw, mh,
          restartInterval = if (id % 2 == 0) 2 else 0), 0, 0)
    })
  }

  private[graft] def multimodalJpeg420(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.jpegRgbFeatures(jpeg420Assets(spark, dir))
      .toDF().orderBy(col("id"))
}

/** Shared fixture builder for the two window-switched MP3 gates (round
  * 15): a TOP-LEVEL object so the executor closure captures no trait
  * state — one 417-byte 44.1 kHz stereo frame whose granules are
  * (blockType, mixed, k). */
private[graft] object Mp3WindowFixture extends Serializable {
  def frame(id: Long, g0: (Int, Boolean, Long),
            g1: (Int, Boolean, Long)): Array[Byte] = {
    import graft.multimodal.Mp3
    val specs = Array(g0, g1)
    def value(k: Long, nBig: Int)(i: Int): Int = {
      val mag =
        if (i < 36) ((k + i) % 4).toInt
        else if (i < nBig) ((k + i) % 4).toInt match {
          case 0 => 0; case 1 | 2 => 1; case _ => 15 + ((k + i) % 8).toInt
        }
        else ((k + i) % 2).toInt
      if (mag != 0 && (k + i) % 5 < 2) -mag else mag
    }
    def gi(g: Int, ch: Int) = {
      val (bt, mixed, k) = specs(g)
      val nBig = 2 * (20 + (k % 5)).toInt
      Mp3.GranuleInfo(0, nBig / 2,
        (160 + (5 * id + 17 * g + 29 * ch) % 40).toInt, 9,
        windowSwitching = true, blockType = bt, mixedBlock = mixed,
        Seq(4, 14),
        if (bt == 2) Seq.tabulate(3)(w => ((id + 2 * w) % 4).toInt)
        else Seq(0, 0, 0),
        if (bt == 2 && !mixed) 8 else 7, 36,
        preflag = if (bt == 2) 0 else (id % 2).toInt,
        scalefacScale = ((id + g) % 2).toInt,
        count1TableSelect = ((id + g + ch) % 2).toInt)
    }
    val si = Mp3.SideInfo(0, (id % 8).toInt, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
    def sfsFor(g: Int): Array[Int] = {
      val (bt, mixed, _) = specs(g)
      if (bt == 2 && !mixed)
        Array.tabulate(36)(x => ((id + x / 3 + x % 3) % 4).toInt)
      else if (bt == 2)
        Array.tabulate(8)(b => ((id + b) % 4).toInt) ++
          (for (b <- 3 until 12; w <- 0 until 3) yield ((id + b + w) % 4).toInt)
      else Array.tabulate(21)(b => ((id + b) % 4).toInt)
    }
    val sfs: Seq[Seq[Array[Int]]] = Seq.tabulate(2)(g => Seq.fill(2)(sfsFor(g)))
    val spectra: Seq[Seq[Array[Int]]] = Seq.tabulate(2)(g => Seq.fill(2) {
      val k = specs(g)._3
      val nBig = 2 * (20 + (k % 5)).toInt
      val nC1 = 4 * (4 + (k % 3)).toInt
      Array.tabulate(nBig + nC1)(value(k, nBig))
    })
    val main = Mp3.encodeSpectra(si, 2, sfs, spectra)
    val flen = 417
    require(main.length <= flen - 4, s"fixture main data ${main.length} overruns frame")
    Mp3.encodeMp3(1, 9, 0, java.util.Arrays.copyOf(main, flen - 4))
  }
}
