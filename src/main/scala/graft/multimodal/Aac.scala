package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** AAC ADTS (ISO/IEC 13818-7 §6.2 / 14496-3 §1.A.2.2) transport parser:
  * fixed+variable header decode, frame walk via the 13-bit frame_length
  * chain, raw-data-block extraction. This types and fingerprints the audio
  * blobs a training pipeline routes (SURVEY §2.7 multimodal discipline);
  * the raw_data_block itself — section/scale-factor/spectral Huffman and
  * the filterbank below (§§8–14) — is the documented DSP seam, surfaced as
  * an opaque payload exactly like MP3 Layer-III main data.
  *
  * When protection_absent = 0 the 16-bit crc_check field is SKIPPED, not
  * validated (the spec mandates its presence, not decoder-side checking;
  * the CRC generator lives below the seam with the rest of §6.2's
  * error-resilience machinery).
  *
  * Encoder half exists for fixture assembly only, like Jpeg/Mp3/Mp4/H264.
  */
object Aac {

  /** §6.3: sampling_frequency_index → rate. Index 13/14 are reserved,
    * 15 (explicit-frequency escape) is not representable in ADTS. */
  val SampleRates: Array[Int] = Array(
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  final case class AdtsFrame(profile: Int, rateIdx: Int, channels: Int,
                             frameLength: Int, crcPresent: Boolean,
                             nRawBlocks: Int, payload: Array[Byte])

  final case class AacStream(frames: Seq[AdtsFrame]) {
    def sampleRate: Int = SampleRates(frames.head.rateIdx)
    /** 1024 PCM samples per raw_data_block (§8.2). */
    def durationMs: Long = {
      val blocks = frames.map(_.nRawBlocks.toLong).sum
      blocks * 1024L * 1000L / sampleRate
    }
  }

  /** Walk ADTS frames from `off`. Every frame must carry a valid
    * syncword / layer / rate index and fit inside the buffer; anything
    * else fails the whole parse (None) — same strictness as parseMp3. */
  def parse(bytes: Array[Byte], off: Int = 0): Option[AacStream] = try {
    val frames = ArrayBuffer.empty[AdtsFrame]
    var i = off
    while (i < bytes.length) {
      require(i + 7 <= bytes.length, "truncated ADTS header")
      val b = (k: Int) => bytes(i + k) & 0xFF
      require(b(0) == 0xFF && (b(1) & 0xF6) == 0xF0, "bad ADTS syncword/layer")
      val crcAbsent = (b(1) & 1) == 1
      val profile = (b(2) >> 6) & 3
      val rateIdx = (b(2) >> 2) & 0xF
      require(rateIdx < SampleRates.length, s"reserved rate index $rateIdx")
      val channels = ((b(2) & 1) << 2) | ((b(3) >> 6) & 3)
      val frameLen = ((b(3) & 3) << 11) | (b(4) << 3) | ((b(5) >> 5) & 7)
      val nBlocks = (b(6) & 3) + 1
      // CRC + multiple raw data blocks adds per-block position/CRC fields
      // (§6.2 adts_error_check with number_of_raw_data_blocks > 0) — a
      // layout this parser does not decode; reject rather than misparse
      require(crcAbsent || nBlocks == 1,
        "CRC-protected multi-block ADTS frames unsupported")
      val hdrLen = if (crcAbsent) 7 else 9
      require(frameLen >= hdrLen && i + frameLen <= bytes.length,
        s"frame_length $frameLen out of bounds")
      frames += AdtsFrame(profile, rateIdx, channels, frameLen, !crcAbsent,
        nBlocks, java.util.Arrays.copyOfRange(bytes, i + hdrLen, i + frameLen))
      i += frameLen
    }
    if (frames.isEmpty) None
    else {
      // duration and channel reporting read the head frame — a stream
      // whose rate/channel config varies mid-stream would be silently
      // misreported, so reject it (CBR-config streams are the practical
      // universe; same strictness as parseMp3's uniform-header walk)
      require(frames.forall(f => f.rateIdx == frames.head.rateIdx
        && f.channels == frames.head.channels),
        "mixed rate/channel ADTS streams unsupported")
      Some(AacStream(frames.toSeq))
    }
  } catch { case _: Exception => None }

  /** Fixture encoder: one ADTS frame. `crc` is the raw 16-bit field value
    * when present (fixtures use a formula value; see the CRC note above). */
  def encodeFrame(profile: Int, rateIdx: Int, channels: Int,
                  payload: Array[Byte], nRawBlocks: Int = 1,
                  crc: Option[Int] = None): Array[Byte] = {
    require(profile >= 0 && profile < 4 && rateIdx < 13 && channels < 8)
    require(nRawBlocks >= 1 && nRawBlocks <= 4)
    // parse() strictly rejects CRC-protected multi-block frames (the
    // per-block adts_error_check layout is undecoded) — fail at
    // fixture-build time instead of emitting bytes our own parser refuses
    // (round-12 ADVICE)
    require(crc.isEmpty || nRawBlocks == 1,
      "CRC-protected multi-block ADTS frames unsupported by parse()")
    val hdrLen = if (crc.isDefined) 9 else 7
    val frameLen = hdrLen + payload.length
    require(frameLen < (1 << 13), "frame too long for 13-bit length")
    val out = new ArrayBuffer[Byte](frameLen)
    out += 0xFF.toByte
    // MPEG-4 ID (0), layer 00, protection_absent
    out += (0xF0 | (if (crc.isDefined) 0 else 1)).toByte
    out += ((profile << 6) | (rateIdx << 2) | ((channels >> 2) & 1)).toByte
    // private_bit 0, original/copy 0, home 0, copyright bits 0
    out += (((channels & 3) << 6) | ((frameLen >> 11) & 3)).toByte
    out += ((frameLen >> 3) & 0xFF).toByte
    // buffer_fullness 0x7FF = VBR marker
    out += (((frameLen & 7) << 5) | 0x1F).toByte
    out += ((0x3F << 2) | (nRawBlocks - 1)).toByte
    crc.foreach { c => out += ((c >> 8) & 0xFF).toByte; out += (c & 0xFF).toByte }
    out ++= payload
    out.toArray
  }

  def encode(frames: Seq[(Int, Int, Int, Array[Byte], Option[Int])]): Array[Byte] =
    frames.flatMap { case (p, r, c, pl, crc) =>
      encodeFrame(p, r, c, pl, crc = crc)
    }.toArray

  // -------------------------------------------------------------------
  // AAC-LC raw_data_block decode to PCM (round 14 — the last codec that
  // stopped at transport headers). ISO/IEC 13818-7 §§6.3, 8–9, 11:
  // syntactic-element walk (one SCE + TERM), ics_info for
  // ONLY_LONG_SEQUENCE sine-window frames, section data over the 4-bit
  // codebook ids, DPCM scalefactors, spectral Huffman (2/4-tuple books,
  // sign bits for the unsigned books, book-11-style escape sequences),
  // dequantization x = sign·|q|^(4/3)·2^(0.25·(sf−100)), then the
  // 2048-point IMDCT + sine window + (fresh-state) overlap-add.
  //
  // TABLE PROVENANCE — the Mp3.scala never-guess discipline: ISO
  // 13818-7 Tables A.2–A.12 (the 11 spectral codebooks, ~1 500
  // codewords) and Table A.1 (the 121-codeword scalefactor book) are
  // transcription data that cannot be verified in this zero-egress
  // environment, so sect_cb ids 1..11 STRICT-REJECT unless the caller
  // supplies the book ([[parseAacBooksSpec]]); a FIXTURE 4-tuple book
  // mounts on sect_cb 12 — the one id ISO marks reserved — so no real
  // stream's codebook can collide with a fixture decode. The
  // scalefactor book and the per-rate scalefactor-band boundary tables
  // (Table 4.5.x — ~50 entries per rate, unlike MP3's 22-entry B.8)
  // are ARGUMENTS with documented formula fixtures for the same
  // reason. The decode LOGIC (element walk, sections, DPCM, tuple/sign/
  // escape walks, 1024-sample layout, dequantization, filterbank) is
  // complete and golden-pinned with the fixtures. Rounds 15/16: CPE
  // stereo (MS + §4.6.8.2 intensity), all four window sequences, KBD
  // shape, TNS and pulse_data all decode through the same ICS walk.
  // What still strict-rejects (never a misparse) is exactly the
  // permanent set — PNS (decoder-defined noise: no exact oracle can
  // exist), LTP (a different object type), CCE/LFE (multichannel-only
  // elements), DSE/PCE/FIL (no spectral content) — see the SURVEY
  // round-16 element scope table.
  // -------------------------------------------------------------------

  private final class BitReader(bytes: Array[Byte]) {
    private var bit = 0
    def read(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = bytes(bit >> 3) & 0xff
        v = (v << 1) | ((b >> (7 - (bit & 7))) & 1)
        bit += 1; i += 1
      }
      v
    }
    def bitsLeft: Int = bytes.length * 8 - bit
  }

  /** A spectral codebook: `dim` coefficients per codeword (2 or 4);
    * `signed` books carry signs inside the codeword values, unsigned
    * books append one sign bit per nonzero magnitude; `escape` books
    * (ISO book 11's shape) extend magnitude 16 with an escape sequence.
    * `codes` maps '0'/'1' prefix-free strings to value tuples. */
  final case class AacBook(dim: Int, signed: Boolean, escape: Boolean,
                           codes: Map[String, Seq[Int]]) {
    require(dim == 2 || dim == 4, s"codebook dimension $dim not 2/4")
    require(codes.nonEmpty, "empty codebook")
    require(codes.values.forall(_.length == dim), "tuple arity != dim")
    require(!codes.keys.exists(a => codes.keys.exists(b => b != a && b.startsWith(a))),
      "codebook is not prefix-free")
    require(!escape || !signed, "escape books are unsigned-with-signs")
    require(codes.values.forall(t =>
        if (signed) t.forall(v => v.abs <= 16) else t.forall(v => v >= 0 && v <= 16)),
      "codebook values out of range")
    private[multimodal] val maxLen = codes.keys.map(_.length).max
    private[multimodal] val enc: Map[Seq[Int], String] = codes.map(_.swap)
    require(enc.size == codes.size, "duplicate value tuples")
  }

  /** The scalefactor codebook: codes → DPCM index (0..120, offset 60 —
    * §8.3.2's hcod_sf alphabet). */
  final case class SfBook(codes: Map[String, Int]) {
    require(codes.nonEmpty)
    require(codes.values.forall(v => v >= 0 && v <= 120), "dpcm index out of 0..120")
    require(!codes.keys.exists(a => codes.keys.exists(b => b != a && b.startsWith(a))),
      "sf book is not prefix-free")
    private[multimodal] val maxLen = codes.keys.map(_.length).max
    private[multimodal] val enc: Map[Int, String] = codes.map(_.swap)
    require(enc.size == codes.size, "duplicate dpcm indices")
  }

  /** Fixture spectral book on RESERVED sect_cb 12: 4-tuples of
    * magnitudes 0..2, unsigned with sign bits, canonical — (0,0,0,0) =
    * "0", the other 80 tuples enumerate as "1" + 7 index bits. */
  val fixtureSpectralBook: AacBook = AacBook(4, signed = false, escape = false,
    (for { a <- 0 to 2; b <- 0 to 2; c <- 0 to 2; d <- 0 to 2 } yield {
      val k = ((a * 3 + b) * 3 + c) * 3 + d
      val code = if (k == 0) "0"
        else "1" + Integer.toBinaryString(128 | (k - 1)).substring(1)
      code -> Seq(a, b, c, d)
    }).toMap)

  /** The fixture codebook mount: reserved id 12 only. */
  val fixtureBooks: Map[Int, AacBook] = Map(12 -> fixtureSpectralBook)

  /** Fixture scalefactor book: "0" = dpcm 60 (Δ0); "1" + 4 bits b =
    * index 52+b below 60 and 53+b above (Δ−8..−1, Δ+1..+8). */
  val fixtureSfBook: SfBook = SfBook(
    Map("0" -> 60) ++ (0 until 16).map { b =>
      ("1" + Integer.toBinaryString(16 | b).substring(1)) ->
        (if (b < 8) 52 + b else 53 + b)
    }.toMap)

  /** Fixture long-window band map: 32 uniform 32-sample scalefactor
    * bands (a FORMULA map — ISO Table 4.5.x's per-rate boundaries are
    * transcription data; supply them via [[parseAacBandsSpec]] for real
    * corpora). */
  val fixtureBandsLong: Array[Int] = Array.tabulate(33)(_ * 32)

  /** Fixture SHORT-window band map (round 15 — EIGHT_SHORT frames): 16
    * uniform 8-sample scalefactor bands over each 128-line short
    * spectrum (the per-rate Table 4.5.x short boundaries are
    * transcription data; supply them via [[parseAacShortBandsSpec]]). */
  val fixtureBandsShort: Array[Int] = Array.tabulate(17)(_ * 8)

  /** One decoded SCE channel: per-sfb codebook ids and scalefactors,
    * the 1024 quantized integers, and the dequantized spectrum. */
  final case class AacChannel(globalGain: Int, maxSfb: Int,
                              sectCb: Array[Int], sf: Array[Int],
                              quant: Array[Int], xr: Array[Double])

  private def readCode[T](r: BitReader, codes: Map[String, T], maxLen: Int,
                          what: String): T = {
    val sb = new StringBuilder
    while (sb.length <= maxLen) {
      sb.append(if (r.read(1) == 1) '1' else '0')
      codes.get(sb.toString) match {
        case Some(v) => return v
        case None =>
      }
    }
    throw new IllegalArgumentException(s"unmatched $what code '${sb.toString}'")
  }

  private def checkBands(bands: Array[Int], limit: Int = 1024): Unit =
    require(bands.length >= 2 && bands.head == 0 && bands.last <= limit &&
      bands.sliding(2).forall(w => w(0) < w(1)), "malformed band map")

  /** §8.3.2 ics_info for the supported window scope (round 15 — all
    * four window_sequences, sine AND KBD shapes): `groupLen` is the
    * window-group partition decoded from scale_factor_grouping for
    * EIGHT_SHORT frames (entries sum to 8); long sequences carry one
    * group of one 1024-line window. `windowShape` (late round 15): 0 =
    * sine, 1 = Kaiser-Bessel derived — and per §14.3.3 a frame's LEFT
    * window half uses the PREVIOUS frame's shape, so the filterbank
    * takes the threaded prevShape alongside. */
  final case class IcsInfo(windowSequence: Int, maxSfb: Int,
                           groupLen: Array[Int], windowShape: Int = 0) {
    require(windowShape == 0 || windowShape == 1, s"window_shape $windowShape")
    def isShort: Boolean = windowSequence == 2
    def numGroups: Int = groupLen.length
    def numWindows: Int = groupLen.sum
    /** Spectral lines per window: 128 short, 1024 long (§8.2). */
    def linesPerWindow: Int = if (isShort) 128 else 1024
  }

  /** ics_info (§8.3.2) for the supported scope: sine/KBD windows, no
    * predictor, all four window_sequences (round 15). EIGHT_SHORT
    * frames read the 4-bit max_sfb + 7-bit scale_factor_grouping (bit
    * w−1, MSB first, set → window w joins the previous group); long
    * frames read the 6-bit max_sfb + predictor flag. Throws on every
    * seam. */
  private def readIcsInfoWin(r: BitReader, bands: Array[Int],
                             shortBands: Array[Int]): IcsInfo = {
    require(r.read(1) == 0, "ics_reserved_bit set")
    val seq = r.read(2)
    val shape = r.read(1)
    if (seq == 2) {
      val maxSfb = r.read(4)
      require(maxSfb <= shortBands.length - 1,
        s"max_sfb $maxSfb exceeds short band map")
      val grouping = r.read(7)
      val gl = ArrayBuffer(1)
      var w = 1
      while (w < 8) {
        if (((grouping >> (7 - w)) & 1) == 1) gl(gl.length - 1) += 1
        else gl += 1
        w += 1
      }
      IcsInfo(2, maxSfb, gl.toArray, shape)
    } else {
      val maxSfb = r.read(6)
      require(maxSfb <= bands.length - 1, s"max_sfb $maxSfb exceeds band map")
      require(r.read(1) == 0, "predictor_data_present out of scope")
      IcsInfo(seq, maxSfb, Array(1), shape)
    }
  }

  /** The long-only ics_info surface [[decodeSpectra]]/[[decodeCpe]]
    * keep (their AacChannel layout is one 1024-line window, sine
    * shape): any window-switched sequence or KBD shape rejects here —
    * the window-aware PCM paths go through
    * [[decodeSceWin]]/[[decodeCpeWin]]. */
  private def readIcsInfo(r: BitReader, bands: Array[Int]): Int = {
    val info = readIcsInfoWin(r, bands, fixtureBandsShort)
    require(info.windowSequence == 0,
      "window_sequence: only ONLY_LONG_SEQUENCE on the AacChannel surface")
    require(info.windowShape == 0,
      "window_shape: sine only on the AacChannel surface")
    info.maxSfb
  }

  /** One TNS filter (§14.6, late round 15): the SWB range counted DOWN
    * from the map top (`bottomSwb ≤ swb < topSwb`), the filter order,
    * the direction bit (true = downward, §14.6's start-at-the-top
    * walk), and the RESOLVED LPC coefficients a(1..order) (§14.6.2's
    * sign-extend → sin inverse-quant → reflection recursion, done at
    * parse time — formula math). */
  final case class TnsFilter(bottomSwb: Int, topSwb: Int, order: Int,
                             downward: Boolean, lpc: Array[Double])

  /** One decoded individual_channel_stream, window-sequence-aware
    * (round 15): per-GROUP codebook ids and scalefactors; `quant`/`xr`
    * hold the 1024 lines DEINTERLEAVED window-major — short frames put
    * window w's 128 lines at [128w, 128(w+1)), long frames use the
    * natural order. `tns` (late round 15): per-WINDOW filter lists —
    * note `xr` here is PRE-TNS; the decode surfaces apply
    * [[applyTns]] after the stereo tools per the §4.6 decoder order. */
  final case class AacIcs(info: IcsInfo, globalGain: Int,
                          sectCb: Array[Array[Int]], sf: Array[Array[Int]],
                          quant: Array[Int], xr: Array[Double],
                          tns: Array[Array[TnsFilter]] = Array.empty) {
    def hasTns: Boolean = tns.exists(_.nonEmpty)
  }

  /** §14.6 tns_data: per-window filter headers + coefficients, with the
    * §14.6.2 coefficient resolution (sign-extend the
    * (coef_res + 3 − coef_compress)-bit fields, sin inverse-quant with
    * the ± iqfac split, reflection→LPC recursion) resolved here. LC
    * order caps (12 long / 7 short) strict-reject above. */
  private def readTnsData(r: BitReader, info: IcsInfo): Array[Array[TnsFilter]] = {
    val short = info.isShort
    val maxOrder = if (short) 7 else 12
    Array.tabulate(info.numWindows) { _ =>
      val nFilt = r.read(if (short) 1 else 2)
      if (nFilt == 0) Array.empty[TnsFilter]
      else {
        val coefRes = r.read(1)
        val filters = ArrayBuffer.empty[TnsFilter]
        var f = 0
        while (f < nFilt) {
          val length = r.read(if (short) 4 else 6)
          val order = r.read(if (short) 3 else 5)
          require(order <= maxOrder, s"TNS order $order exceeds the LC cap $maxOrder")
          var downward = false
          var lpc = Array.empty[Double]
          if (order > 0) {
            downward = r.read(1) == 1
            val coefCompress = r.read(1)
            val bits = coefRes + 3 - coefCompress
            require(bits >= 2, "TNS coefficient width underflow")
            val coefResBits = coefRes + 3
            val iqfac = ((1 << (coefResBits - 1)) - 0.5) / (math.Pi / 2.0)
            val iqfacM = ((1 << (coefResBits - 1)) + 0.5) / (math.Pi / 2.0)
            val tmp2 = Array.tabulate(order) { _ =>
              val raw = r.read(bits)
              val signed = // sign-extend the bits-wide field
                if ((raw & (1 << (bits - 1))) != 0) raw - (1 << bits) else raw
              math.sin(signed / (if (signed >= 0) iqfac else iqfacM))
            }
            // §14.6.2 reflection → LPC
            val a = new Array[Double](order + 1)
            a(0) = 1.0
            val b = new Array[Double](order + 1)
            var m = 1
            while (m <= order) {
              var i = 1
              while (i < m) { b(i) = a(i) + tmp2(m - 1) * a(m - i); i += 1 }
              i = 1
              while (i < m) { a(i) = b(i); i += 1 }
              a(m) = tmp2(m - 1)
              m += 1
            }
            lpc = a
          }
          // bottomSwb carries the raw LENGTH; applyTns resolves the SWB
          // range by walking down from the band map's top (the map is
          // caller scope, not parse scope)
          filters += TnsFilter(length, -1, order, downward, lpc)
          f += 1
        }
        filters.toArray
      }
    }
  }

  /** Apply the decoded TNS filters to the (post-stereo) spectra —
    * §14.6's all-pole walk: filter ranges count SWBs DOWN from the band
    * map's top (each filter's stored `bottomSwb` field carries its raw
    * LENGTH; the chain top starts at the map's SWB count), clipped to
    * min(maxSfb, tnsMaxBands); the AR recursion runs along the window's
    * lines in the transmitted direction, each output consuming up to
    * `order` PREVIOUS OUTPUTS: y(n) = x(n) − Σⱼ a(j)·y(n − j·inc). */
  private[graft] def applyTns(xr: Array[Double], info: IcsInfo,
                              tns: Array[Array[TnsFilter]],
                              bands: Array[Int], shortBands: Array[Int],
                              tnsMaxBands: Int): Unit = {
    if (tns.isEmpty) return
    val nb = if (info.isShort) shortBands else bands
    val numSwb = nb.length - 1
    val limit = math.min(math.min(info.maxSfb, tnsMaxBands), numSwb)
    var w = 0
    while (w < info.numWindows) {
      var top = numSwb
      val filters = tns(w)
      var f = 0
      while (f < filters.length) {
        val flt = filters(f)
        val bottom = math.max(top - flt.bottomSwb, 0) // bottomSwb carries length
        if (flt.order > 0) {
          val start = nb(math.min(bottom, limit))
          val end = nb(math.min(top, limit))
          val size = end - start
          if (size > 0) {
            val base = w * info.linesPerWindow
            val (pos0, inc) =
              if (flt.downward) (base + end - 1, -1) else (base + start, 1)
            var i = 0
            var pos = pos0
            while (i < size) {
              var acc = xr(pos)
              var j = 1
              while (j <= flt.order && j <= i) {
                acc -= flt.lpc(j) * xr(pos - j * inc)
                j += 1
              }
              xr(pos) = acc
              i += 1
              pos += inc
            }
          }
        }
        top = bottom
        f += 1
      }
      w += 1
    }
  }

  /** The body of one individual_channel_stream AFTER global_gain and
    * ics_info: section data (sect_bits 3 short / 5 long), the DPCM
    * scalefactor chain threading ACROSS window groups, the pulse/tns/
    * gain zero-flags, the spectral tuple walk (window-INTERLEAVED
    * within each group's sfb per §9.3, deinterleaved here to
    * window-major), dequantization with per-(group, sfb) gains — shared
    * by the SCE and CPE walks. Throws on every strict seam; callers
    * convert to None. */
  private def readIcsBodyWin(r: BitReader, globalGain: Int, info: IcsInfo,
                             books: Map[Int, AacBook], sfBook: SfBook,
                             bands: Array[Int], shortBands: Array[Int],
                             allowIntensity: Boolean = false): AacIcs = {
    val nb = if (info.isShort) shortBands else bands
    val maxSfb = info.maxSfb
    val sectBits = if (info.isShort) 3 else 5
    val escVal = (1 << sectBits) - 1
    val nGroups = info.numGroups
    // section_data (§8.3.2), per window group; cb 14/15 (intensity —
    // round 16) are legal only on a CPE's RIGHT channel
    val sectCb = Array.ofDim[Int](nGroups, maxSfb)
    for (g <- 0 until nGroups) {
      var k = 0
      while (k < maxSfb) {
        val cb = r.read(4)
        require(cb == 0 || (cb >= 1 && cb <= 12) ||
          (allowIntensity && (cb == 14 || cb == 15)),
          s"sect_cb $cb (noise, or intensity outside a CPE right channel) out of scope")
        var len = 0; var inc = r.read(sectBits)
        while (inc == escVal) { len += escVal; inc = r.read(sectBits) }
        len += inc
        require(len >= 1 && k + len <= maxSfb, "section overruns max_sfb")
        var j = k
        while (j < k + len) { sectCb(g)(j) = cb; j += 1 }
        k += len
      }
    }
    // scale_factor_data (§8.3.2): TWO DPCM chains threading group-major
    // — the scalefactor chain from global_gain (offset 60), and for
    // intensity bands the §4.6.8.2 dpcm_is_position chain from 0 (same
    // codebook, same offset; positions may be negative). Both values
    // land in `sf(g)(s)` — the band's sect_cb says which one it is.
    val sf = Array.ofDim[Int](nGroups, maxSfb)
    var last = globalGain
    var lastIs = 0
    for (g <- 0 until nGroups; s <- 0 until maxSfb if sectCb(g)(s) != 0) {
      val idx = readCode(r, sfBook.codes, sfBook.maxLen, "scalefactor")
      if (sectCb(g)(s) >= 14) {
        lastIs = lastIs + idx - 60
        require(lastIs >= -155 && lastIs <= 100, s"is_position $lastIs out of range")
        sf(g)(s) = lastIs
      } else {
        last = last + idx - 60
        require(last >= 0 && last <= 255, s"scalefactor $last out of 0..255")
        sf(g)(s) = last
      }
    }
    // pulse_data (§8.3.2/§9.3, late round 15): up to 4 additive pulses
    // on the QUANTIZED values — spec-barred from EIGHT_SHORT frames
    // (strict reject); applied after the spectral walk below
    var pulses: Array[(Int, Int)] = Array.empty // (flat position, amplitude)
    if (r.read(1) == 1) {
      require(!info.isShort, "pulse_data in an EIGHT_SHORT frame")
      val nPulse = r.read(2) + 1
      val startSfb = r.read(6)
      require(startSfb < nb.length - 1, s"pulse_start_sfb $startSfb off the band map")
      var k = nb(startSfb)
      pulses = Array.fill(nPulse) {
        k += r.read(5)
        require(k < 1024, "pulse position past the spectrum")
        (k, r.read(4))
      }
    }
    val tns = // §14.6 tns_data (late round 15)
      if (r.read(1) == 1) readTnsData(r, info)
      else Array.empty[Array[TnsFilter]]
    require(r.read(1) == 0, "gain_control_data out of scope")
    // spectral_data (§8.3.2/§9.3): per group, per coded sfb, one tuple
    // walk over width·groupLen coefficients (window-interleaved: window
    // w's band occupies buf[w·width, (w+1)·width))
    val quant = new Array[Int](1024)
    var winBase = 0
    for (g <- 0 until nGroups) {
      for (s <- 0 until maxSfb if sectCb(g)(s) != 0 && sectCb(g)(s) <= 12) {
        val book = books.getOrElse(sectCb(g)(s), throw new IllegalArgumentException(
          s"sect_cb ${sectCb(g)(s)} has no loaded codebook (ISO Table A transcription pending)"))
        val lo = nb(s); val hi = nb(s + 1)
        val width = hi - lo
        val span = width * info.groupLen(g)
        require(span % book.dim == 0,
          s"group-sfb span $span not a multiple of codebook dim ${book.dim}")
        val buf = new Array[Int](span)
        var i = 0
        while (i < span) {
          val vals = readCode(r, book.codes, book.maxLen, "spectral")
          if (book.signed) {
            var j = 0
            while (j < book.dim) { buf(i + j) = vals(j); j += 1 }
          } else {
            // sign bits for each nonzero magnitude, in tuple order (§9.3)
            val signs = vals.map(v => if (v != 0 && r.read(1) == 1) -1 else 1)
            // then escape sequences for each magnitude 16, in tuple order
            var j = 0
            while (j < book.dim) {
              var mag = vals(j)
              if (book.escape && mag == 16) {
                var n = 0
                while (r.read(1) == 1) { n += 1; require(n <= 8, "escape too long") }
                mag = (1 << (n + 4)) | r.read(n + 4)
              }
              buf(i + j) = signs(j) * mag
              j += 1
            }
          }
          i += book.dim
        }
        // deinterleave to window-major lines
        var w = 0
        while (w < info.groupLen(g)) {
          var b = 0
          while (b < width) {
            quant((winBase + w) * info.linesPerWindow + lo + b) = buf(w * width + b)
            b += 1
          }
          w += 1
        }
      }
      winBase += info.groupLen(g)
    }
    // §9.3 pulse application: |x(k)| grows by amp on nonzero values; a
    // ZERO value takes -amp — the 14496-3 pulse decode as implemented
    // by faad2/ffmpeg is `if (x_quant[k] > 0) += amp else -= amp`
    // (round 16, closing the r15 ADVICE medium: the prior +amp-on-zero
    // rule was self-pinned by its own oracle, invisible to gates). A
    // pulse whose position falls in an UNCODED (sect_cb 0) band — or
    // past max_sfb's extent — strict-rejects: dequantization iterates
    // coded bands only, so the pulsed integer would silently vanish
    // from xr (real decoders disagree on this seam: faad2 dequantizes
    // it at sf 0, ffmpeg drops it — reject-never-misparse).
    pulses.foreach { case (k, amp) =>
      val s = {
        var b = 0
        while (b < maxSfb && nb(b + 1) <= k) b += 1
        b
      }
      require(s < maxSfb && sectCb(0)(s) != 0 && sectCb(0)(s) <= 12,
        s"pulse position $k falls in an uncoded band (sect_cb 0/intensity or past max_sfb)")
      if (quant(k) > 0) quant(k) += amp else quant(k) -= amp
    }
    // dequantization (§10.3): per-(group, sfb) exponent, SF_OFFSET = 100
    val xr = new Array[Double](1024)
    winBase = 0
    for (g <- 0 until nGroups) {
      for (s <- 0 until maxSfb if sectCb(g)(s) != 0 && sectCb(g)(s) <= 12) {
        val gain = math.pow(2.0, 0.25 * (sf(g)(s) - 100))
        var w = 0
        while (w < info.groupLen(g)) {
          var i = (winBase + w) * info.linesPerWindow + nb(s)
          val hi = (winBase + w) * info.linesPerWindow + nb(s + 1)
          while (i < hi) {
            val q = quant(i)
            if (q != 0)
              xr(i) = math.signum(q.toDouble) * math.pow(math.abs(q.toDouble), 4.0 / 3.0) * gain
            i += 1
          }
          w += 1
        }
      }
      winBase += info.groupLen(g)
    }
    AacIcs(info, globalGain, sectCb, sf, quant, xr, tns)
  }

  /** The long-only body surface (one group, AacChannel layout). */
  private def readIcsBody(r: BitReader, globalGain: Int, maxSfb: Int,
                          books: Map[Int, AacBook], sfBook: SfBook,
                          bands: Array[Int]): AacChannel = {
    val ics = readIcsBodyWin(r, globalGain, IcsInfo(0, maxSfb, Array(1)),
      books, sfBook, bands, fixtureBandsShort)
    require(!ics.hasTns, "TNS on the AacChannel surface (use decodeSceWin)")
    AacChannel(globalGain, maxSfb, ics.sectCb(0), ics.sf(0), ics.quant, ics.xr)
  }

  /** END element + byte-align strictness shared by the SCE/CPE walks:
    * only zero byte-align padding is legitimate after END (§6.2's
    * adts_raw_data_block_error_check aside, which this scope rejects at
    * the transport layer) — arbitrary trailing bytes would be silently
    * accepted garbage, the H264 I_PCM trailing-byte discipline (r14
    * ADVICE #4). */
  private def readEnd(r: BitReader, what: String): Unit = {
    require(r.read(3) == 7, s"expected END after $what")
    require(r.bitsLeft < 8, s"${r.bitsLeft} trailing bits after END")
    while (r.bitsLeft > 0)
      require(r.read(1) == 0, "nonzero byte-align padding after END")
  }

  /** Decode one SCE raw_data_block (the [[AdtsFrame.payload]] bytes) to
    * quantized + dequantized spectra. Strict → None on every seam listed
    * in the provenance note: non-SCE leading element, short/KBD windows,
    * predictor/pulse/TNS/gain-control data, noise/intensity or unloaded
    * codebooks, section overruns, scalefactors outside 0..255, a
    * Huffman walk past the payload, or a missing END element. */
  def decodeSpectra(payload: Array[Byte],
                    books: Map[Int, AacBook] = fixtureBooks,
                    sfBook: SfBook = fixtureSfBook,
                    bands: Array[Int] = fixtureBandsLong): Option[AacChannel] = try {
    checkBands(bands)
    val r = new BitReader(payload)
    require(r.read(3) == 0, "leading element is not SCE") // §6.3 id_syn_ele
    r.read(4) // element_instance_tag
    val globalGain = r.read(8)
    val maxSfb = readIcsInfo(r, bands)
    val ch = readIcsBody(r, globalGain, maxSfb, books, sfBook, bands)
    readEnd(r, "the single SCE")
    Some(ch)
  } catch { case _: Exception => None }

  /** Window-sequence-aware SCE decode (round 15 — the surface the PCM
    * paths use): all four window_sequences through the shared ICS body,
    * EIGHT_SHORT frames returning their 8×128 lines window-major.
    * Strict → None on everything [[decodeSpectra]] rejects EXCEPT the
    * long-only window discipline. */
  def decodeSceWin(payload: Array[Byte],
                   books: Map[Int, AacBook] = fixtureBooks,
                   sfBook: SfBook = fixtureSfBook,
                   bands: Array[Int] = fixtureBandsLong,
                   shortBands: Array[Int] = fixtureBandsShort,
                   tnsMaxBands: Int = Int.MaxValue): Option[AacIcs] = try {
    checkBands(bands)
    checkBands(shortBands, 128)
    val r = new BitReader(payload)
    require(r.read(3) == 0, "leading element is not SCE") // §6.3 id_syn_ele
    r.read(4) // element_instance_tag
    val globalGain = r.read(8)
    val info = readIcsInfoWin(r, bands, shortBands)
    val ics = readIcsBodyWin(r, globalGain, info, books, sfBook, bands, shortBands)
    readEnd(r, "the single SCE")
    // §4.6 decoder order: TNS after the (absent) stereo tools
    applyTns(ics.xr, info, ics.tns, bands, shortBands, tnsMaxBands)
    Some(ics)
  } catch { case _: Exception => None }

  /** One decoded CPE (stereo channel_pair_element, §6.3 / §8.3.2 —
    * round 15, r14 VERDICT #1): the per-channel streams plus the
    * common_window/MS-mask header and the POST-MS spectra `xrMs` the
    * filterbank consumes (§12.2: for each ms_used band, l = m + s,
    * r = m − s over the dequantized spectra — AAC's matrix is the plain
    * sum/difference; the ½ lives on the encoder side). */
  final case class AacCpePair(commonWindow: Boolean, msMaskPresent: Int,
                              msUsed: Array[Boolean],
                              left: AacChannel, right: AacChannel,
                              xrMs: Array[Array[Double]])

  /** Window-sequence-aware CPE decode result (round 15): per-channel
    * ICS (each with its own IcsInfo when common_window = 0), the MS
    * mask per (window group × sfb), and the post-MS spectra in the
    * window-major line layout [[AacIcs]] uses. */
  final case class AacCpeIcs(commonWindow: Boolean, msMaskPresent: Int,
                             msUsed: Array[Array[Boolean]],
                             left: AacIcs, right: AacIcs,
                             xrMs: Array[Array[Double]])

  /** Window-sequence-aware CPE decode (round 15): all four
    * window_sequences per channel; under common_window the shared
    * ics_info (including the short-frame grouping) and the §8.3.2 MS
    * mask read GROUP-major (for each window group, max_sfb bits when
    * ms_mask_present = 1). §12.2 MS applies per (group, sfb) over every
    * window in the group. ms_mask_present 3 is reserved → strict
    * reject; strict → None on everything the ICS body rejects. */
  def decodeCpeWin(payload: Array[Byte],
                   books: Map[Int, AacBook] = fixtureBooks,
                   sfBook: SfBook = fixtureSfBook,
                   bands: Array[Int] = fixtureBandsLong,
                   shortBands: Array[Int] = fixtureBandsShort,
                   tnsMaxBands: Int = Int.MaxValue): Option[AacCpeIcs] = try {
    checkBands(bands)
    checkBands(shortBands, 128)
    val r = new BitReader(payload)
    require(r.read(3) == 1, "leading element is not CPE") // §6.3 id_syn_ele
    r.read(4) // element_instance_tag
    val commonWindow = r.read(1) == 1
    var sharedInfo: IcsInfo = null
    var msMaskPresent = 0
    var msUsed: Array[Array[Boolean]] = Array.empty
    if (commonWindow) {
      sharedInfo = readIcsInfoWin(r, bands, shortBands)
      msMaskPresent = r.read(2)
      require(msMaskPresent != 3, "ms_mask_present 3 is reserved")
      // group-major mask bits (§8.3.2): num_window_groups × max_sfb
      msUsed = Array.tabulate(sharedInfo.numGroups, sharedInfo.maxSfb)((_, _) =>
        if (msMaskPresent == 1) r.read(1) == 1 else msMaskPresent == 2)
    }
    def channel(allowIntensity: Boolean): AacIcs = {
      val gg = r.read(8)
      val info = if (commonWindow) sharedInfo else readIcsInfoWin(r, bands, shortBands)
      readIcsBodyWin(r, gg, info, books, sfBook, bands, shortBands, allowIntensity)
    }
    val left = channel(allowIntensity = false)
    val right = channel(allowIntensity = true) // §4.6.8.2: IS lives here
    readEnd(r, "the CPE")
    @inline def isIs(cb: Int): Boolean = cb == 14 || cb == 15
    val hasIs = right.sectCb.exists(_.exists(isIs))
    // intensity bands map left lines onto right lines — only a shared
    // ics_info makes that mapping well-defined
    require(!hasIs || commonWindow, "intensity stereo without common_window")
    val xl = left.xr.clone()
    val xr2 = right.xr.clone()
    if (commonWindow) {
      val nb = if (sharedInfo.isShort) shortBands else bands
      // §12.2 MS over the mask-selected bands — intensity bands are
      // excluded (there ms_used flips the IS phase instead, §4.6.8.2.3)
      var winBase = 0
      for (g <- 0 until sharedInfo.numGroups) {
        for (s <- 0 until sharedInfo.maxSfb
             if msUsed(g)(s) && !isIs(right.sectCb(g)(s))) {
          var w = 0
          while (w < sharedInfo.groupLen(g)) {
            var i = (winBase + w) * sharedInfo.linesPerWindow + nb(s)
            val hi = (winBase + w) * sharedInfo.linesPerWindow + nb(s + 1)
            while (i < hi) {
              val m = xl(i); val sd = xr2(i)
              xl(i) = m + sd; xr2(i) = m - sd
              i += 1
            }
            w += 1
          }
        }
        winBase += sharedInfo.groupLen(g)
      }
      // §4.6.8.2.3 INTENSITY STEREO (round 16 — the last LC stereo
      // tool): right bands coded cb 15 (in phase) / 14 (out of phase)
      // carry no spectra; they reconstruct from the LEFT channel's
      // dequantized lines scaled by 0.5^(is_position/4), the phase
      // flipped by ms_used when ms_mask_present = 1. The left channel
      // is untouched at IS bands (MS skipped them above), so `xl`
      // here is the pure left spectrum.
      winBase = 0
      for (g <- 0 until sharedInfo.numGroups) {
        for (s <- 0 until sharedInfo.maxSfb if isIs(right.sectCb(g)(s))) {
          val scale = math.pow(0.5, 0.25 * right.sf(g)(s))
          val base = if (right.sectCb(g)(s) == 15) 1.0 else -1.0
          val phase =
            if (msMaskPresent == 1 && msUsed(g)(s)) -base else base
          val k = scale * phase
          var w = 0
          while (w < sharedInfo.groupLen(g)) {
            var i = (winBase + w) * sharedInfo.linesPerWindow + nb(s)
            val hi = (winBase + w) * sharedInfo.linesPerWindow + nb(s + 1)
            while (i < hi) {
              xr2(i) = xl(i) * k
              i += 1
            }
            w += 1
          }
        }
        winBase += sharedInfo.groupLen(g)
      }
    }
    // §4.6 decoder order: TNS per channel AFTER the stereo tools
    applyTns(xl, left.info, left.tns, bands, shortBands, tnsMaxBands)
    applyTns(xr2, right.info, right.tns, bands, shortBands, tnsMaxBands)
    Some(AacCpeIcs(commonWindow, msMaskPresent, msUsed, left, right,
      Array(xl, xr2)))
  } catch { case _: Exception => None }

  /** Decode one CPE raw_data_block to two channels' spectra (with MS
    * reconstruction applied). Scope: the SCE walk's long-sine-window
    * discipline per channel (window-switched CPEs go through
    * [[decodeCpeWin]]); common_window 0 (independent ics_infos)
    * and 1 (shared ics_info + ms_mask_present 0/1/2) both decode;
    * ms_mask_present 3 is reserved → strict reject. TNS-bearing frames
    * also strict-reject HERE (round 16, closing the r15 self-filed
    * asymmetry): this surface's per-channel `xr` is PRE-TNS while
    * `xrMs` would be post-TNS, and the SCE twin [[decodeSpectra]]
    * already rejects TNS — TNS consumers use [[decodeCpeWin]], whose
    * AacIcs carries the coherent post-MS-post-TNS pair. Strict → None
    * on everything [[decodeSpectra]] rejects per channel. */
  def decodeCpe(payload: Array[Byte],
                books: Map[Int, AacBook] = fixtureBooks,
                sfBook: SfBook = fixtureSfBook,
                bands: Array[Int] = fixtureBandsLong): Option[AacCpePair] = {
    decodeCpeWin(payload, books, sfBook, bands).flatMap { p =>
      if (p.left.info.windowSequence != 0 || p.right.info.windowSequence != 0) None
      else if (p.left.hasTns || p.right.hasTns) None
      else Some(AacCpePair(p.commonWindow, p.msMaskPresent,
        if (p.commonWindow) p.msUsed(0) else Array.empty,
        AacChannel(p.left.globalGain, p.left.info.maxSfb, p.left.sectCb(0),
          p.left.sf(0), p.left.quant, p.left.xr),
        AacChannel(p.right.globalGain, p.right.info.maxSfb, p.right.sectCb(0),
          p.right.sf(0), p.right.quant, p.right.xr),
        p.xrMs))
    }
  }

  /** 2048-point IMDCT of a 1024-line spectrum (§14.3, N = 2048,
    * n₀ = (N/2+1)/2): x(n) = (2/N)·Σₖ X(k)·cos(2π/N·(n+n₀)(k+½)).
    * This is the DIRECT O(N²) sum — kept as the from-the-spec reference
    * the unit suite compares [[Dsp.imdct2048Full]] against; the decode
    * paths use the FFT factorization (round 15, r14 VERDICT #4). */
  private[graft] def imdct2048(x: Array[Double], n: Int): Double = {
    var s = 0.0
    var k = 0
    while (k < 1024) {
      if (x(k) != 0.0)
        s += x(k) * math.cos(math.Pi / 1024.0 * (n + 512.5) * (k + 0.5))
      k += 1
    }
    s / 1024.0 // 2/N
  }

  /** §14.3.3 sine window, N = 2048: w(n) = sin(π/2048·(n+½)). */
  private[graft] def sineWindow(n: Int): Double =
    math.sin(math.Pi / 2048.0 * (n + 0.5))

  /** §14.3.3 SHORT sine window, N = 256: w(n) = sin(π/256·(n+½)). */
  private[graft] def sineWindowShort(n: Int): Double =
    math.sin(math.Pi / 256.0 * (n + 0.5))

  /** 256-point IMDCT of one 128-line short-window spectrum (§14.3 with
    * N = 256, n₀ = (N/2+1)/2 = 64.5) — the DIRECT O(N²) reference the
    * unit suite compares [[Dsp.imdct256Full]] against. */
  private[graft] def imdct256(x: Array[Double], n: Int): Double = {
    var s = 0.0
    var k = 0
    while (k < 128) {
      if (x(k) != 0.0)
        s += x(k) * math.cos(math.Pi / 128.0 * (n + 64.5) * (k + 0.5))
      k += 1
    }
    s / 128.0 // 2/N
  }

  /** Long-window RISING half value at n ∈ [0, 1024) for a shape. */
  @inline private def winLongRise(shape: Int, n: Int): Double =
    if (shape == 0) sineWindow(n) else Dsp.kbdLong(n)

  /** Long-window FALLING half value at n ∈ [1024, 2048) for a shape
    * (the sine path keeps the direct expression — bit-identical to the
    * pre-KBD code; KBD mirrors its rising half). */
  @inline private def winLongFall(shape: Int, n: Int): Double =
    if (shape == 0) sineWindow(n) else Dsp.kbdLong(2047 - n)

  /** Short-window rising half at k ∈ [0, 128). */
  @inline private def winShortRise(shape: Int, k: Int): Double =
    if (shape == 0) sineWindowShort(k) else Dsp.kbdShort(k)

  /** Short-window falling half at k ∈ [128, 256). */
  @inline private def winShortFall(shape: Int, k: Int): Double =
    if (shape == 0) sineWindowShort(k) else Dsp.kbdShort(255 - k)

  /** The §14.3 WINDOWED 2048-sample time frame z_f for one decoded ICS —
    * the overlap-add-ready form: out(n) = z_f(n) + z_{f−1}(n + 1024).
    * Shape-aware (late round 15): every RISING half (the part that
    * overlaps the previous frame) uses `prevShape` — §14.3.3's
    * previous-block window_shape rule, which is exactly what keeps the
    * overlap Princen-Bradley-exact across a shape switch — and every
    * falling half uses the frame's own shape:
    *  - ONLY_LONG (0): rise [0,1024) prevShape, fall [1024,2048) own;
    *  - LONG_START (1): long rise (prevShape), flat 1 [1024,1472), the
    *    short window's falling half [1472,1600) (own), zero [1600,2048);
    *  - EIGHT_SHORT (2): eight 256-point IMDCTs at offsets 448 + 128w,
    *    window 0's rising half prevShape, everything else own;
    *  - LONG_STOP (3): zero [0,448), short rising half [448,576)
    *    (prevShape), flat 1 [576,1024), long fall (own). */
  private[graft] def windowedFrame(info: IcsInfo, xr: Array[Double],
                                   prevShape: Int = 0): Array[Double] =
    info.windowSequence match {
      case 0 =>
        val x = Dsp.imdct2048Full(xr)
        Array.tabulate(2048) { n =>
          (if (n < 1024) winLongRise(prevShape, n)
           else winLongFall(info.windowShape, n)) * x(n)
        }
      case 1 =>
        val x = Dsp.imdct2048Full(xr)
        Array.tabulate(2048) { n =>
          val w =
            if (n < 1024) winLongRise(prevShape, n)
            else if (n < 1472) 1.0
            else if (n < 1600) winShortFall(info.windowShape, n - 1472 + 128)
            else 0.0
          w * x(n)
        }
      case 3 =>
        val x = Dsp.imdct2048Full(xr)
        Array.tabulate(2048) { n =>
          val w =
            if (n < 448) 0.0
            else if (n < 576) winShortRise(prevShape, n - 448)
            else if (n < 1024) 1.0
            else winLongFall(info.windowShape, n)
          w * x(n)
        }
      case 2 =>
        val z = new Array[Double](2048)
        var w = 0
        while (w < 8) {
          val xs = java.util.Arrays.copyOfRange(xr, w * 128, (w + 1) * 128)
          val y = Dsp.imdct256Full(xs)
          var k = 0
          while (k < 256) {
            val wv =
              if (k < 128) winShortRise(if (w == 0) prevShape else info.windowShape, k)
              else winShortFall(info.windowShape, k)
            z(448 + 128 * w + k) += wv * y(k)
            k += 1
          }
          w += 1
        }
        z
      case other =>
        throw new IllegalArgumentException(s"window_sequence $other")
    }

  /** Full AAC-LC decode of one SCE raw_data_block to 1024 PCM samples:
    * [[decodeSceWin]] → window-sequence-aware filterbank
    * ([[windowedFrame]]) → overlap-add with FRESH zero history (the
    * per-frame state seam [[Mp3.decodePcm]] documents — exact for
    * self-contained fixture frames; a stream decode threads the
    * previous frame's windowed second half here). NOTE the fresh-state
    * seam includes the WINDOW SHAPE: the left half windows with the
    * spec's stream-start sine default, so a KBD frame sliced out of
    * mid-stream decodes its left half differently here than in
    * [[decodePcmStream]] — the stream surface is authoritative. */
  def decodePcm(payload: Array[Byte],
                books: Map[Int, AacBook] = fixtureBooks,
                sfBook: SfBook = fixtureSfBook,
                bands: Array[Int] = fixtureBandsLong,
                shortBands: Array[Int] = fixtureBandsShort,
                tnsMaxBands: Int = Int.MaxValue): Option[Array[Double]] = {
    decodeSceWin(payload, books, sfBook, bands, shortBands, tnsMaxBands).map { ics =>
      val z = windowedFrame(ics.info, ics.xr)
      java.util.Arrays.copyOfRange(z, 0, 1024)
    }
  }

  /** STREAM decode to PCM with THREADED overlap-add (the AAC analog of
    * [[Mp3.decodePcmStream]]'s state seam closure): every ADTS frame's
    * SCE through [[decodeSceWin]] and the window-sequence-aware
    * filterbank — out_f(n) = z_f(n) + z_{f−1}(n + 1024), the previous
    * frame's windowed second half carrying into the next frame (zero
    * only at stream start). Window-SWITCHED streams (LONG_START →
    * EIGHT_SHORT → LONG_STOP) reconstruct through the same seam: the
    * transition windows' flat/zero regions are exactly what makes the
    * short frame's 448-sample lead-in overlap-correct (round 15). */
  def decodePcmStream(stream: AacStream,
                      books: Map[Int, AacBook] = fixtureBooks,
                      sfBook: SfBook = fixtureSfBook,
                      bands: Array[Int] = fixtureBandsLong,
                      shortBands: Array[Int] = fixtureBandsShort,
                      tnsMaxBands: Int = Int.MaxValue): Option[Array[Double]] = try {
    val out = new ArrayBuffer[Double](stream.frames.size * 1024)
    var prev: Array[Double] = null // previous frame's windowed 2048 samples
    var prevShape = 0 // §14.3.3: stream start behaves as after a sine frame
    stream.frames.foreach { fr =>
      val ics = decodeSceWin(fr.payload, books, sfBook, bands, shortBands,
          tnsMaxBands)
        .getOrElse(throw new IllegalArgumentException("undecodable frame"))
      val z = windowedFrame(ics.info, ics.xr, prevShape)
      prevShape = ics.info.windowShape
      var n = 0
      while (n < 1024) {
        val tail = if (prev == null) 0.0 else prev(n + 1024)
        out += z(n) + tail
        n += 1
      }
      prev = z
    }
    Some(out.toArray)
  } catch { case _: Exception => None }

  /** Stereo CPE decode to PCM (round 15): [[decodeCpeWin]]'s post-MS
    * spectra per channel through the window-sequence-aware filterbank →
    * fresh-state overlap as [[decodePcm]]. Returns 2 × 1024 samples. */
  def decodeCpePcm(payload: Array[Byte],
                   books: Map[Int, AacBook] = fixtureBooks,
                   sfBook: SfBook = fixtureSfBook,
                   bands: Array[Int] = fixtureBandsLong,
                   shortBands: Array[Int] = fixtureBandsShort,
                   tnsMaxBands: Int = Int.MaxValue): Option[Seq[Array[Double]]] = {
    decodeCpeWin(payload, books, sfBook, bands, shortBands, tnsMaxBands).map { p =>
      Seq(p.left.info, p.right.info).zipWithIndex.map { case (info, c) =>
        val z = windowedFrame(info, p.xrMs(c))
        java.util.Arrays.copyOfRange(z, 0, 1024)
      }
    }
  }

  /** Stereo STREAM decode to PCM with per-channel threaded overlap-add
    * (the CPE analog of [[decodePcmStream]]): every ADTS frame's CPE
    * through [[decodeCpeWin]], each channel's windowed second half
    * carrying into its next frame (zero only at stream start) — window
    * switching included. Returns 2 arrays of 1024·nFrames samples. */
  def decodeCpePcmStream(stream: AacStream,
                         books: Map[Int, AacBook] = fixtureBooks,
                         sfBook: SfBook = fixtureSfBook,
                         bands: Array[Int] = fixtureBandsLong,
                         shortBands: Array[Int] = fixtureBandsShort,
                         tnsMaxBands: Int = Int.MaxValue): Option[Seq[Array[Double]]] = try {
    val out = Array.fill(2)(new ArrayBuffer[Double](stream.frames.size * 1024))
    var prev: Array[Array[Double]] = null // per channel, windowed 2048 samples
    val prevShape = Array(0, 0) // §14.3.3 stream-start rule, per channel
    stream.frames.foreach { fr =>
      val pair = decodeCpeWin(fr.payload, books, sfBook, bands, shortBands,
          tnsMaxBands)
        .getOrElse(throw new IllegalArgumentException("undecodable CPE frame"))
      val infos = Array(pair.left.info, pair.right.info)
      val zs = Array.tabulate(2) { c =>
        val z = windowedFrame(infos(c), pair.xrMs(c), prevShape(c))
        prevShape(c) = infos(c).windowShape
        z
      }
      var c = 0
      while (c < 2) {
        var n = 0
        while (n < 1024) {
          val tail = if (prev == null) 0.0 else prev(c)(n + 1024)
          out(c) += zs(c)(n) + tail
          n += 1
        }
        c += 1
      }
      prev = zs
    }
    Some(out.toSeq.map(_.toArray))
  } catch { case _: Exception => None }

  /** Fixture TNS spec (encoder side): `coefs` are the RAW SIGNED
    * coefficient values in the (coefRes + 3 − coefCompress)-bit signed
    * domain; `windows` must match the frame's window count. */
  final case class TnsSpecFilter(length: Int, order: Int, downward: Boolean,
                                 coefCompress: Int, coefs: Seq[Int])
  final case class TnsSpec(coefRes: Int, windows: Seq[Seq[TnsSpecFilter]])

  /** Fixture pulse spec (encoder side): start SWB + (offset, amplitude)
    * pairs — §8.3.2 pulse_data's exact fields. */
  final case class PulseSpec(startSfb: Int, pulses: Seq[(Int, Int)])

  /** Fixture/gate encoder: one SCE raw_data_block from per-sfb codebook
    * ids, scalefactors and quantized integers — the exact bit layout
    * [[decodeSpectra]] walks, greedy run-length sections, DPCM
    * scalefactor codes, tuple/sign/escape spectral codes, END, zero
    * byte-align. Inputs must be codable (tuples present in the books,
    * DPCM deltas within the sf book, magnitudes within escape range). */
  def encodeSce(globalGain: Int, maxSfb: Int, sectCb: Array[Int],
                sf: Array[Int], quant: Array[Int],
                books: Map[Int, AacBook] = fixtureBooks,
                sfBook: SfBook = fixtureSfBook,
                bands: Array[Int] = fixtureBandsLong): Array[Byte] =
    encodeSceWin(IcsInfo(0, maxSfb, Array(1)), globalGain,
      Array(sectCb), Array(sf), quant, books, sfBook, bands)

  /** Window-sequence-aware fixture encoder (round 15): one SCE
    * raw_data_block for any of the four window_sequences — per-GROUP
    * codebook ids / scalefactors, `quant` in the DEINTERLEAVED
    * window-major layout [[decodeSceWin]] returns (the emitter
    * re-interleaves each group-sfb block per §9.3). */
  def encodeSceWin(info: IcsInfo, globalGain: Int,
                   sectCb: Array[Array[Int]], sf: Array[Array[Int]],
                   quant: Array[Int],
                   books: Map[Int, AacBook] = fixtureBooks,
                   sfBook: SfBook = fixtureSfBook,
                   bands: Array[Int] = fixtureBandsLong,
                   shortBands: Array[Int] = fixtureBandsShort,
                   tns: Option[TnsSpec] = None,
                   pulse: Option[PulseSpec] = None): Array[Byte] = {
    val bits = new ArrayBuffer[(Int, Int)] // (value, width) — checked below
    def w(v: Int, n: Int): Unit = {
      require(v >= 0 && v < (1 << n), s"field value $v does not fit in $n bits")
      bits += ((v, n))
    }
    w(0, 3) // SCE
    w(0, 4) // element_instance_tag
    w(globalGain, 8)
    emitIcsInfoWin(w, info, bands, shortBands)
    emitIcsBodyWin(w, globalGain, info, sectCb, sf, quant, books, sfBook,
      bands, shortBands, tns, pulse)
    w(7, 3) // END
    packBits(bits)
  }

  /** Fixture/gate encoder for a stereo CPE raw_data_block (round 15 —
    * [[decodeCpe]]'s exact bit layout): channel-pair header with
    * common_window and the §8.3.2 MS mask (`msMaskPresent` 0/1/2; 1
    * requires a per-sfb `msUsed`), then both channels' streams, END,
    * zero byte-align. Per-channel params are 2-element Seqs; under
    * common_window the max_sfbs must agree. NOTE the encoder codes the
    * TRANSMITTED (mid/side) spectra — the decoder's output is post-MS. */
  def encodeCpe(globalGain: Seq[Int], maxSfb: Seq[Int],
                sectCb: Seq[Array[Int]], sf: Seq[Array[Int]],
                quant: Seq[Array[Int]],
                commonWindow: Boolean = true, msMaskPresent: Int = 0,
                msUsed: Array[Boolean] = Array.empty,
                books: Map[Int, AacBook] = fixtureBooks,
                sfBook: SfBook = fixtureSfBook,
                bands: Array[Int] = fixtureBandsLong): Array[Byte] = {
    require(globalGain.length == 2 && maxSfb.length == 2 &&
      sectCb.length == 2 && sf.length == 2 && quant.length == 2,
      "CPE takes exactly two channels")
    require(!commonWindow || maxSfb(0) == maxSfb(1),
      "common_window requires equal max_sfb")
    require(msMaskPresent >= 0 && msMaskPresent <= 2, "ms_mask_present 3 is reserved")
    require(commonWindow || msMaskPresent == 0,
      "the MS mask exists only under common_window")
    require(msMaskPresent != 1 || msUsed.length == maxSfb(0),
      s"ms_used needs ${maxSfb(0)} per-sfb bits")
    val bits = new ArrayBuffer[(Int, Int)]
    def w(v: Int, n: Int): Unit = {
      require(v >= 0 && v < (1 << n), s"field value $v does not fit in $n bits")
      bits += ((v, n))
    }
    w(1, 3) // CPE
    w(0, 4) // element_instance_tag
    w(if (commonWindow) 1 else 0, 1)
    if (commonWindow) {
      emitIcsInfo(w, maxSfb(0), bands)
      w(msMaskPresent, 2)
      if (msMaskPresent == 1) msUsed.foreach(b => w(if (b) 1 else 0, 1))
    }
    for (c <- 0 until 2) {
      w(globalGain(c), 8)
      if (!commonWindow) emitIcsInfo(w, maxSfb(c), bands)
      emitIcsBodyWin(w, globalGain(c), IcsInfo(0, maxSfb(c), Array(1)),
        Array(sectCb(c)), Array(sf(c)), quant(c), books, sfBook, bands,
        fixtureBandsShort)
    }
    w(7, 3) // END
    packBits(bits)
  }

  /** Window-sequence-aware fixture encoder for a CPE raw_data_block
    * (round 15): per-channel [[IcsInfo]]s (equal under common_window),
    * per-GROUP codebook ids / scalefactors, window-major `quant`, and
    * the GROUP-major MS mask (`msUsed(g)(s)` when msMaskPresent = 1).
    * The encoder codes the TRANSMITTED (mid/side) spectra. */
  def encodeCpeWin(infos: Seq[IcsInfo], globalGain: Seq[Int],
                   sectCb: Seq[Array[Array[Int]]], sf: Seq[Array[Array[Int]]],
                   quant: Seq[Array[Int]],
                   commonWindow: Boolean = true, msMaskPresent: Int = 0,
                   msUsed: Array[Array[Boolean]] = Array.empty,
                   books: Map[Int, AacBook] = fixtureBooks,
                   sfBook: SfBook = fixtureSfBook,
                   bands: Array[Int] = fixtureBandsLong,
                   shortBands: Array[Int] = fixtureBandsShort,
                   tns: Seq[Option[TnsSpec]] = Seq(None, None)): Array[Byte] = {
    require(infos.length == 2 && globalGain.length == 2 &&
      sectCb.length == 2 && sf.length == 2 && quant.length == 2,
      "CPE takes exactly two channels")
    require(!commonWindow || (infos(0).windowSequence == infos(1).windowSequence &&
      infos(0).maxSfb == infos(1).maxSfb &&
      infos(0).groupLen.sameElements(infos(1).groupLen)),
      "common_window requires equal ics_infos")
    require(msMaskPresent >= 0 && msMaskPresent <= 2, "ms_mask_present 3 is reserved")
    require(commonWindow || msMaskPresent == 0,
      "the MS mask exists only under common_window")
    require(msMaskPresent != 1 || (msUsed.length == infos(0).numGroups &&
      msUsed.forall(_.length == infos(0).maxSfb)),
      s"ms_used needs ${infos(0).numGroups}×${infos(0).maxSfb} group-major bits")
    // intensity (cb 14/15) is a RIGHT-channel tool under common_window
    // (§4.6.8.2) — the decoder strict-rejects anything else
    require(!sectCb(0).exists(_.exists(cb => cb == 14 || cb == 15)),
      "intensity codebooks on the left channel")
    require(commonWindow || !sectCb(1).exists(_.exists(cb => cb == 14 || cb == 15)),
      "intensity stereo without common_window")
    val bits = new ArrayBuffer[(Int, Int)]
    def w(v: Int, n: Int): Unit = {
      require(v >= 0 && v < (1 << n), s"field value $v does not fit in $n bits")
      bits += ((v, n))
    }
    w(1, 3) // CPE
    w(0, 4) // element_instance_tag
    w(if (commonWindow) 1 else 0, 1)
    if (commonWindow) {
      emitIcsInfoWin(w, infos(0), bands, shortBands)
      w(msMaskPresent, 2)
      if (msMaskPresent == 1)
        for (g <- msUsed; b <- g) w(if (b) 1 else 0, 1)
    }
    for (c <- 0 until 2) {
      w(globalGain(c), 8)
      if (!commonWindow) emitIcsInfoWin(w, infos(c), bands, shortBands)
      emitIcsBodyWin(w, globalGain(c), infos(c), sectCb(c), sf(c), quant(c),
        books, sfBook, bands, shortBands, tns(c))
    }
    w(7, 3) // END
    packBits(bits)
  }

  private def emitIcsInfo(w: (Int, Int) => Unit, maxSfb: Int,
                          bands: Array[Int]): Unit =
    emitIcsInfoWin(w, IcsInfo(0, maxSfb, Array(1)), bands, fixtureBandsShort)

  private def emitIcsInfoWin(w: (Int, Int) => Unit, info: IcsInfo,
                             bands: Array[Int], shortBands: Array[Int]): Unit = {
    w(0, 1) // ics_reserved
    w(info.windowSequence, 2)
    w(info.windowShape, 1)
    if (info.isShort) {
      require(info.maxSfb >= 0 && info.maxSfb < 16 &&
        info.maxSfb <= shortBands.length - 1)
      require(info.numWindows == 8, "EIGHT_SHORT groups must cover 8 windows")
      w(info.maxSfb, 4)
      // scale_factor_grouping: bit w−1 (MSB first) set → window w joins
      // the previous group
      var grouping = 0
      var win = 0
      for (g <- 0 until info.numGroups; k <- 0 until info.groupLen(g)) {
        if (win >= 1 && k > 0) grouping |= 1 << (7 - win)
        win += 1
      }
      w(grouping, 7)
    } else {
      require(info.groupLen.sameElements(Array(1)),
        "long sequences carry one group of one window")
      require(info.maxSfb >= 0 && info.maxSfb < 64 &&
        info.maxSfb <= bands.length - 1)
      w(info.maxSfb, 6)
      w(0, 1) // predictor_data_present
    }
  }

  /** Sections + scalefactors + zero pulse/tns/gain flags + spectra for
    * one channel stream (the [[readIcsBodyWin]] layout, shared by
    * [[encodeSce]]/[[encodeCpe]] and their Win variants). `quant` is
    * window-major; each group-sfb block re-interleaves per §9.3. */
  private def emitIcsBodyWin(w: (Int, Int) => Unit, globalGain: Int,
                             info: IcsInfo, sectCb: Array[Array[Int]],
                             sf: Array[Array[Int]], quant: Array[Int],
                             books: Map[Int, AacBook], sfBook: SfBook,
                             bands: Array[Int], shortBands: Array[Int],
                             tns: Option[TnsSpec] = None,
                             pulse: Option[PulseSpec] = None): Unit = {
    val nb = if (info.isShort) shortBands else bands
    val maxSfb = info.maxSfb
    val sectBits = if (info.isShort) 3 else 5
    val escVal = (1 << sectBits) - 1
    require(sectCb.length == info.numGroups && sf.length == info.numGroups)
    require(sectCb.forall(_.length == maxSfb) && sf.forall(_.length == maxSfb))
    require(globalGain >= 0 && globalGain < 256)
    // greedy sections, per group
    for (g <- 0 until info.numGroups) {
      var k = 0
      while (k < maxSfb) {
        val cb = sectCb(g)(k)
        var len = 1
        while (k + len < maxSfb && sectCb(g)(k + len) == cb) len += 1
        w(cb, 4)
        var rem = len
        while (rem >= escVal) { w(escVal, sectBits); rem -= escVal }
        w(rem, sectBits)
        k += len
      }
    }
    // scalefactors: the DPCM chain across groups, with the §4.6.8.2
    // is_position chain (from 0) interleaved for cb-14/15 bands
    var last = globalGain
    var lastIs = 0
    for (g <- 0 until info.numGroups; s <- 0 until maxSfb if sectCb(g)(s) != 0) {
      val isBand = sectCb(g)(s) >= 14
      val idx = sf(g)(s) - (if (isBand) lastIs else last) + 60
      val code = sfBook.enc.getOrElse(idx, throw new IllegalArgumentException(
        s"dpcm index $idx not codable by the sf book"))
      code.foreach(c => w(if (c == '1') 1 else 0, 1))
      if (isBand) lastIs = sf(g)(s) else last = sf(g)(s)
    }
    pulse match { // pulse_data_present + §8.3.2 pulse_data
      case None => w(0, 1)
      case Some(ps) =>
        require(!info.isShort, "pulse_data is barred from EIGHT_SHORT frames")
        require(ps.pulses.nonEmpty && ps.pulses.length <= 4, "1..4 pulses")
        w(1, 1)
        w(ps.pulses.length - 1, 2)
        w(ps.startSfb, 6)
        ps.pulses.foreach { case (off, amp) => w(off, 5); w(amp, 4) }
    }
    tns match { // tns_data_present + §14.6 tns_data
      case None => w(0, 1)
      case Some(sp) =>
        w(1, 1)
        require(sp.windows.length == info.numWindows,
          s"TNS spec covers ${sp.windows.length} of ${info.numWindows} windows")
        require(sp.coefRes == 0 || sp.coefRes == 1)
        for (wf <- sp.windows) {
          w(wf.size, if (info.isShort) 1 else 2) // n_filt
          if (wf.nonEmpty) {
            w(sp.coefRes, 1)
            for (f <- wf) {
              w(f.length, if (info.isShort) 4 else 6)
              w(f.order, if (info.isShort) 3 else 5)
              if (f.order > 0) {
                w(if (f.downward) 1 else 0, 1)
                w(f.coefCompress, 1)
                val bits2 = sp.coefRes + 3 - f.coefCompress
                require(f.coefs.length == f.order, "coef count != order")
                f.coefs.foreach { c =>
                  require(c >= -(1 << (bits2 - 1)) && c < (1 << (bits2 - 1)),
                    s"TNS coef $c outside the $bits2-bit signed domain")
                  w(c & ((1 << bits2) - 1), bits2)
                }
              }
            }
          }
        }
    }
    w(0, 1) // gain_control_data_present
    // spectra: per group-sfb block, window-interleaved tuple stream
    // (intensity bands cb 14/15 carry no spectral data)
    var winBase = 0
    for (g <- 0 until info.numGroups) {
      for (s <- 0 until maxSfb if sectCb(g)(s) != 0 && sectCb(g)(s) <= 12) {
        val book = books(sectCb(g)(s))
        val lo = nb(s); val width = nb(s + 1) - lo
        val span = width * info.groupLen(g)
        require(span % book.dim == 0,
          s"group-sfb span $span not a multiple of codebook dim ${book.dim}")
        val buf = new Array[Int](span)
        for (wi <- 0 until info.groupLen(g); b <- 0 until width)
          buf(wi * width + b) = quant((winBase + wi) * info.linesPerWindow + lo + b)
        var i = 0
        while (i < span) {
          val tuple = (0 until book.dim).map(j => buf(i + j))
          if (book.signed) {
            val code = book.enc.getOrElse(tuple, throw new IllegalArgumentException(
              s"tuple $tuple not codable by book ${sectCb(g)(s)}"))
            code.foreach(c => w(if (c == '1') 1 else 0, 1))
          } else {
            val mags = tuple.map(v =>
              if (book.escape && v.abs >= 16) 16 else v.abs)
            val code = book.enc.getOrElse(mags, throw new IllegalArgumentException(
              s"magnitudes $mags not codable by book ${sectCb(g)(s)}"))
            code.foreach(c => w(if (c == '1') 1 else 0, 1))
            tuple.foreach(v => if (v != 0) w(if (v < 0) 1 else 0, 1))
            tuple.foreach { v =>
              if (book.escape && v.abs >= 16) {
                val mag = v.abs
                var n = 0
                while (mag >= (1 << (n + 5))) n += 1
                require(n <= 8, s"escape magnitude $mag too large")
                var t = 0
                while (t < n) { w(1, 1); t += 1 }
                w(0, 1)
                w(mag - (1 << (n + 4)), n + 4)
              }
            }
          }
          i += book.dim
        }
      }
      winBase += info.groupLen(g)
    }
  }

  /** Pack MSB-first, zero-pad to a byte boundary. */
  private def packBits(bits: ArrayBuffer[(Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0; var nacc = 0
    bits.foreach { case (v, n) =>
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nacc += 1
        if (nacc == 8) { out.write(acc); acc = 0; nacc = 0 }
        i -= 1
      }
    }
    if (nacc > 0) out.write(acc << (8 - nacc))
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // Caller-supplied resource specs — the Mp3.scala interchange-format
  // discipline applied to AAC's three transcription tables:
  //
  //   # comment (anywhere; blank lines ignored)
  //   book 11 dim 2 signed 0 escape 1   — starts a spectral codebook
  //   101 16 0                          — one codeword: <bits> v…(dim)
  //   sfbook                            — starts the scalefactor book
  //   0111 59                           — one codeword: <bits> <index>
  //   bands 0 4 8 …                     — the long-window swb boundaries
  //   shortbands 0 4 8 …                — the SHORT-window swb boundaries
  //
  // Merge loaded books over the fixtures at the call site
  // (`fixtureBooks ++ loaded`) — the loader never silently overrides.
  // -------------------------------------------------------------------

  /** Parse spectral-codebook sections from the spec format above.
    * Strict: unknown directives, ids outside 1..11, bad dims/values, or
    * a book failing [[AacBook]]'s checks all throw. The parser tracks
    * which SECTION it is inside: content lines are only skipped within
    * an `sfbook` section (that parser's domain); a typo'd top-level
    * directive (`bok 11 dim …`) throws instead of silently yielding a
    * partial book map (r14 ADVICE #2). `bands` is a single-line
    * directive — it does not open a section. */
  def parseAacBooksSpec(text: String): Map[Int, AacBook] = {
    // section state: None = top level, Some(Left(id)) = inside book id,
    // Some(Right(())) = inside the sfbook section (content skipped)
    var cur: Option[Either[Int, Unit]] = None
    val meta = scala.collection.mutable.Map.empty[Int, (Int, Boolean, Boolean)]
    val acc = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Map[String, Seq[Int]]]
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) line.split("\\s+") match {
        case Array("book", id, "dim", d, "signed", sg, "escape", esc) =>
          val i = id.toInt
          require(i >= 1 && i <= 11, s"spectral book id $i out of range 1..11")
          cur = Some(Left(i))
          meta(i) = (d.toInt, sg == "1", esc == "1")
          acc.getOrElseUpdate(i, scala.collection.mutable.Map.empty)
        case Array("sfbook") => cur = Some(Right(()))
        case Array("bands", _*) => cur = None
        case Array("shortbands", _*) => cur = None
        case toks if cur.exists(_.isLeft) =>
          val i = cur.get.swap.toOption.get
          require(toks.length == 1 + meta(i)._1,
            s"codeword line arity ${toks.length - 1} != dim ${meta(i)._1}")
          require(toks(0).forall(c => c == '0' || c == '1'), s"bad code '${toks(0)}'")
          acc(i) += (toks(0) -> toks.drop(1).toSeq.map(_.toInt))
        case _ if cur.exists(_.isRight) => // sfbook content: parseAacSfBookSpec's
        case other => throw new IllegalArgumentException(
          s"unrecognized top-level directive: '${other.mkString(" ")}'")
      }
    }
    acc.map { case (id, codes) =>
      val (d, sg, esc) = meta(id)
      id -> AacBook(d, sg, esc, codes.toMap)
    }.toMap
  }

  /** Parse the `sfbook` section (ISO Table A.1 as the caller transcribed
    * it). */
  def parseAacSfBookSpec(text: String): SfBook = {
    var in = false
    val codes = scala.collection.mutable.Map.empty[String, Int]
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) line.split("\\s+") match {
        case Array("sfbook") => in = true
        case toks if toks(0) == "book" || toks(0) == "bands" ||
          toks(0) == "shortbands" => in = false
        case Array(code, idx) if in =>
          require(code.forall(c => c == '0' || c == '1'), s"bad code '$code'")
          codes += (code -> idx.toInt)
        case _ if !in => // other sections
        case other => throw new IllegalArgumentException(
          s"unparseable sfbook line: '${other.mkString(" ")}'")
      }
    }
    require(codes.nonEmpty, "no sfbook section found")
    SfBook(codes.toMap)
  }

  /** Parse a `bands` directive (Table 4.5.x long-window boundaries as
    * the caller transcribed them). */
  def parseAacBandsSpec(text: String): Array[Int] = {
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.startsWith("bands")) {
        val vals = line.split("\\s+").drop(1).map(_.toInt)
        require(vals.length >= 2 && vals.head == 0 && vals.last <= 1024 &&
          vals.sliding(2).forall(w => w(0) < w(1)), "malformed band map")
        return vals
      }
    }
    throw new IllegalArgumentException("no bands directive found")
  }

  /** Parse a `shortbands` directive (round 15 — Table 4.5.x SHORT-window
    * boundaries, ≤128, as the caller transcribed them). */
  def parseAacShortBandsSpec(text: String): Array[Int] = {
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.startsWith("shortbands")) {
        val vals = line.split("\\s+").drop(1).map(_.toInt)
        require(vals.length >= 2 && vals.head == 0 && vals.last <= 128 &&
          vals.sliding(2).forall(w => w(0) < w(1)), "malformed short band map")
        return vals
      }
    }
    throw new IllegalArgumentException("no shortbands directive found")
  }
}
