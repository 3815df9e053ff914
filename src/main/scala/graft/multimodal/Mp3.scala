package graft.multimodal

/** Pure-JVM MP3 (MPEG-1 Audio Layer III) FRAME parser (round 10): the
  * last stubbed media format, handled at the container level a training
  * pipeline needs — ID3v2 skip, frame-sync walk, header field decode
  * (bitrate/samplerate tables, padding), per-frame payload extraction,
  * duration math — while the Layer III DSP inside the frames (huffman
  * spectral data, MDCT synthesis) stays the documented stub, exactly
  * like [[Mp4]] (boxes real, codec out of scope) and [[Codecs.decodeWav]].
  *
  * Scope: MPEG-1 Layer III, no CRC (protection bit set), bitrate indices
  * 1–14, samplerate indices 0–2, optional leading ID3v2 tag (synchsafe
  * size). Strict → None, never a misparse: broken sync, reserved
  * version/layer/bitrate/samplerate codes, CRC-protected frames, frames
  * overrunning the file, trailing bytes after the last frame, mixed
  * samplerates across frames (duration would be ill-defined). Bitrate
  * MAY vary per frame (VBR) — the reported `bitrateKbps` is the first
  * frame's. */
object Mp3 {

  /** Parsed stream: per-frame payloads are the frame bytes AFTER the
    * 4-byte header (the Layer III side-info + main data — the codec-stub
    * seam); `durationMs` = frames · 1152 · 1000 / sampleRate (integer);
    * `channels` from the first frame's mode field (round 12 — mode 3 =
    * single channel, everything else 2, §2.4.1.3). `mode`/`modeExt` are
    * the first frame's raw 2-bit fields (round 14 — mode 1 = joint
    * stereo, whose mode_extension bit 1 switches MS stereo on,
    * §2.4.2.3); [[msStereo]] derives the §2.4.3.4.9.2 matrix switch. */
  final case class Mp3Stream(nFrames: Int, bitrateKbps: Int, sampleRate: Int,
                             durationMs: Long, framePayloads: Array[Array[Byte]],
                             channels: Int, mode: Int = 0, modeExt: Int = 0) {
    def msStereo: Boolean = mode == 1 && (modeExt & 2) != 0
  }

  // MPEG-1 Layer III bitrate table (kbps), index 1..14 (T.81-style public
  // constants from ISO 11172-3 table B.2); 0 = free and 15 = bad: rejected
  private val bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320, 0)
  private val rates = Array(44100, 48000, 32000, 0)

  def parseMp3(bytes: Array[Byte]): Option[Mp3Stream] = try {
    var p = 0
    // optional ID3v2 tag: "ID3" ver(2) flags(1) synchsafe size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
                 ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      if ((bytes(6) | bytes(7) | bytes(8) | bytes(9)) < 0) return None // non-synchsafe
      p = 10 + size
      if (p > bytes.length) return None
    }
    val payloads = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var firstBitrate = -1
    var sampleRate = -1
    var channels = -1
    var mode = 0
    var modeExt = 0
    while (p < bytes.length) {
      if (p + 4 > bytes.length) return None
      val h0 = bytes(p) & 0xff; val h1 = bytes(p + 1) & 0xff
      val h2 = bytes(p + 2) & 0xff
      val h3 = bytes(p + 3) & 0xff
      if (channels < 0) {
        mode = (h3 & 0xc0) >> 6
        modeExt = (h3 & 0x30) >> 4
        channels = if (mode == 3) 1 else 2
      } else if (((h3 & 0xc0) >> 6) != mode || ((h3 & 0x30) >> 4) != modeExt)
        // real encoders may switch joint-stereo per frame; Mp3Stream
        // carries ONE mode/modeExt, so a mixed stream would silently
        // decode every frame through the first frame's matrix — reject,
        // never misparse (round-14 review)
        return None
      if (h0 != 0xff || (h1 & 0xe0) != 0xe0) return None // broken sync
      val version = (h1 & 0x18) >> 3
      val layer = (h1 & 0x06) >> 1
      val protection = h1 & 0x01
      if (version != 3 || layer != 1) return None // MPEG-1 Layer III only
      if (protection != 1) return None // CRC-protected frames out of scope
      val bIdx = (h2 & 0xf0) >> 4
      val rIdx = (h2 & 0x0c) >> 2
      val padding = (h2 & 0x02) >> 1
      if (bIdx < 1 || bIdx > 14 || rIdx > 2) return None // free/bad codes
      val rate = rates(rIdx)
      if (sampleRate < 0) sampleRate = rate
      else if (sampleRate != rate) return None // mixed rates: duration ill-defined
      if (firstBitrate < 0) firstBitrate = bitrates(bIdx)
      val flen = 144 * bitrates(bIdx) * 1000 / rate + padding
      if (flen < 4 || p + flen > bytes.length) return None // frame overruns file
      payloads += java.util.Arrays.copyOfRange(bytes, p + 4, p + flen)
      p += flen
    }
    if (payloads.isEmpty) return None
    Some(Mp3Stream(payloads.length, firstBitrate, sampleRate,
      payloads.length.toLong * 1152L * 1000L / sampleRate, payloads.toArray,
      channels, mode, modeExt))
  } catch { case _: Exception => None }

  // -------------------------------------------------------------------
  // Layer III side information + scale factors (round 12, r11 VERDICT #4:
  // the pure-integer half before synthesis). ISO/IEC 11172-3 §2.4.1.7:
  // MPEG-1 side info is the first 17 (mono) / 32 (stereo) payload bytes —
  // main_data_begin, per-channel scfsi, and per-(granule, channel) coding
  // parameters. Scale factors follow in the main data, whose START is
  // main_data_begin bytes back into the bit reservoir; reservoir
  // reassembly belongs with the DSP half, so scale-factor parsing is
  // offered for main_data_begin = 0 streams (self-contained frames) and
  // strictly returns None otherwise — a seam, never a misparse.
  // -------------------------------------------------------------------

  /** One granule × channel's coding parameters (§2.4.1.7). `tableSelect`
    * has 2 entries under window switching, 3 otherwise; `subblockGain` is
    * empty unless window switching. */
  final case class GranuleInfo(part23Length: Int, bigValues: Int,
                               globalGain: Int, scalefacCompress: Int,
                               windowSwitching: Boolean, blockType: Int,
                               mixedBlock: Boolean, tableSelect: Seq[Int],
                               subblockGain: Seq[Int], region0Count: Int,
                               region1Count: Int, preflag: Int,
                               scalefacScale: Int, count1TableSelect: Int)

  /** Frame side info: `scfsi(ch)(band)` ∈ {0,1} for the 4 scfsi bands;
    * `granules(g)(ch)` for g ∈ {0,1}. */
  final case class SideInfo(mainDataBegin: Int, privateBits: Int,
                            scfsi: Seq[Seq[Int]],
                            granules: Seq[Seq[GranuleInfo]])

  /** MSB-first bit reader (the JPEG decoder's discipline, no marker
    * stuffing here). */
  private final class BitReader(bytes: Array[Byte], startByte: Int = 0) {
    private var bit = startByte * 8
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
    def bitPos: Int = bit
  }

  /** slen1/slen2 bit widths per scalefac_compress (ISO 11172-3 §2.4.2.7's
    * slen table — public constants like the bitrate table above). */
  private val slenTable: Array[(Int, Int)] = Array(
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

  /** Parse the side info at the start of a frame PAYLOAD (the bytes
    * [[Mp3Stream.framePayloads]] carries — everything after the 4-byte
    * header). Strict → None: short payload, window-switched granule with
    * the forbidden block_type 0 (§2.4.1.7: "block_type ≠ 0 when
    * window_switching_flag = 1"). `channels` is 1 or 2. */
  def parseSideInfo(payload: Array[Byte], channels: Int): Option[SideInfo] = try {
    require(channels == 1 || channels == 2)
    val need = if (channels == 1) 17 else 32
    if (payload.length < need) return None
    val r = new BitReader(payload)
    val mdb = r.read(9)
    val priv = r.read(if (channels == 1) 5 else 3)
    val scfsi = Seq.fill(channels)(Seq.fill(4)(r.read(1)))
    val granules = Seq.fill(2)(Seq.fill(channels) {
      val p23 = r.read(12)
      val bv = r.read(9)
      val gg = r.read(8)
      val sfc = r.read(4)
      val ws = r.read(1) == 1
      if (ws) {
        val bt = r.read(2)
        val mixed = r.read(1) == 1
        val ts = Seq.fill(2)(r.read(5))
        val sbg = Seq.fill(3)(r.read(3))
        if (bt == 0) return None // forbidden combination
        // region counts are NOT transmitted under window switching — the
        // standard fixes them (8 for pure short blocks, else 7; region1
        // spans the rest), so the parsed struct carries the derived values
        GranuleInfo(p23, bv, gg, sfc, ws, bt, mixed, ts, sbg,
          region0Count = if (bt == 2 && !mixed) 8 else 7, region1Count = 36,
          preflag = r.read(1), scalefacScale = r.read(1),
          count1TableSelect = r.read(1))
      } else {
        val ts = Seq.fill(3)(r.read(5))
        val r0 = r.read(4)
        val r1 = r.read(3)
        GranuleInfo(p23, bv, gg, sfc, ws, blockType = 0, mixedBlock = false,
          ts, Nil, r0, r1,
          preflag = r.read(1), scalefacScale = r.read(1),
          count1TableSelect = r.read(1))
      }
    })
    Some(SideInfo(mdb, priv, scfsi, granules))
  } catch { case _: Exception => None }

  /** Scale factors for a SELF-CONTAINED frame (main_data_begin = 0): the
    * main data begins right after the side info, and per (granule,
    * channel) the scale-factor run is the first part2 bits. Long blocks:
    * 21 factors (bands 0–10 at slen1, 11–20 at slen2), granule 1 sharing
    * granule 0's per the scfsi band groups {0–5, 6–10, 11–15, 16–20}.
    * Short blocks (block_type 2, not mixed): 12 bands × 3 windows (0–5 at
    * slen1, 6–11 at slen2), no sharing. Mixed: 8 long + short bands 3–11
    * × 3 windows. Returns factors in read order per granules(g)(ch);
    * None for reservoir-dependent frames (main_data_begin ≠ 0) or a
    * part2 run overrunning the payload. */
  def parseScalefactors(payload: Array[Byte], channels: Int): Option[Seq[Seq[Array[Int]]]] = try {
    val siOpt = parseSideInfo(payload, channels)
    if (siOpt.isEmpty) return None
    val si = siOpt.get
    if (si.mainDataBegin != 0) return None // bit reservoir: the DSP seam
    val siBytes = if (channels == 1) 17 else 32
    val r = new BitReader(java.util.Arrays.copyOfRange(payload, siBytes, payload.length))
    val out = Array.fill(2)(new Array[Array[Int]](channels))
    var bitsUsed = 0
    for (g <- 0 until 2; ch <- 0 until channels) {
      val gi = si.granules(g)(ch)
      val (s1, s2) = slenTable(gi.scalefacCompress)
      val sfs = scala.collection.mutable.ArrayBuffer.empty[Int]
      var read = 0
      def take(n: Int): Int = { read += n; r.read(n) }
      if (gi.windowSwitching && gi.blockType == 2 && !gi.mixedBlock) {
        for (b <- 0 until 12; _ <- 0 until 3)
          sfs += take(if (b < 6) s1 else s2)
      } else if (gi.windowSwitching && gi.blockType == 2) { // mixed
        for (_ <- 0 until 8) sfs += take(s1)
        for (b <- 3 until 12; _ <- 0 until 3)
          sfs += take(if (b < 6) s1 else s2)
      } else {
        // long: scfsi groups share granule 0's factors in granule 1
        val groups = Seq(0 until 6, 6 until 11, 11 until 16, 16 until 21)
        for ((grp, gi2) <- groups.zipWithIndex; b <- grp) {
          if (g == 1 && si.scfsi(ch)(gi2) == 1) sfs += out(0)(ch)(b)
          else sfs += take(if (b < 11) s1 else s2)
        }
      }
      bitsUsed += read
      // the remaining part2_3 bits (Huffman spectral data) are skipped:
      // advance to the next granule/channel's scale-factor run
      if (gi.part23Length < read) return None
      r.read(gi.part23Length - read)
      bitsUsed += gi.part23Length - read
      if (bitsUsed > (payload.length - siBytes) * 8) return None
      out(g)(ch) = sfs.toArray
    }
    Some(out.toSeq.map(_.toSeq))
  } catch { case _: Exception => None }

  /** Fixture encoder for [[parseSideInfo]]/[[parseScalefactors]] (the
    * operators only PARSE): assemble the side-info bits, then per
    * (granule, channel) the scale-factor run followed by zero padding up
    * to part2_3_length bits. part2_3_length in each [[GranuleInfo]] must
    * be ≥ the scale-factor bit count implied by its scalefac_compress and
    * block type. `scalefacs(g)(ch)` must be in read order (21 long /
    * 36 short / 35 mixed values); granule-1 entries shared via scfsi are
    * NOT re-emitted and must not be present. */
  def encodeSideInfo(si: SideInfo, channels: Int,
                     scalefacs: Seq[Seq[Array[Int]]]): Array[Byte] = {
    val bits = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (value, nbits)
    def w(v: Int, n: Int): Unit = { require(v >= 0 && v < (1 << n)); bits += ((v, n)) }
    w(si.mainDataBegin, 9)
    w(si.privateBits, if (channels == 1) 5 else 3)
    for (ch <- 0 until channels; b <- 0 until 4) w(si.scfsi(ch)(b), 1)
    for (g <- 0 until 2; ch <- 0 until channels) {
      val gi = si.granules(g)(ch)
      w(gi.part23Length, 12); w(gi.bigValues, 9); w(gi.globalGain, 8)
      w(gi.scalefacCompress, 4); w(if (gi.windowSwitching) 1 else 0, 1)
      if (gi.windowSwitching) {
        w(gi.blockType, 2); w(if (gi.mixedBlock) 1 else 0, 1)
        gi.tableSelect.take(2).foreach(w(_, 5))
        gi.subblockGain.take(3).foreach(w(_, 3))
      } else {
        gi.tableSelect.take(3).foreach(w(_, 5))
        w(gi.region0Count, 4); w(gi.region1Count, 3)
      }
      w(gi.preflag, 1); w(gi.scalefacScale, 1); w(gi.count1TableSelect, 1)
    }
    // main data: scale-factor runs + zero fill to part2_3_length per run
    for (g <- 0 until 2; ch <- 0 until channels) {
      val gi = si.granules(g)(ch)
      val (s1, s2) = slenTable(gi.scalefacCompress)
      var read = 0
      val it = scalefacs(g)(ch).iterator
      def emit(n: Int): Unit = { w(it.next(), n); read += n }
      if (gi.windowSwitching && gi.blockType == 2 && !gi.mixedBlock)
        for (b <- 0 until 12; _ <- 0 until 3) emit(if (b < 6) s1 else s2)
      else if (gi.windowSwitching && gi.blockType == 2) {
        for (_ <- 0 until 8) emit(s1)
        for (b <- 3 until 12; _ <- 0 until 3) emit(if (b < 6) s1 else s2)
      } else {
        val groups = Seq(0 until 6, 6 until 11, 11 until 16, 16 until 21)
        for ((grp, gi2) <- groups.zipWithIndex; b <- grp)
          if (!(g == 1 && si.scfsi(ch)(gi2) == 1)) emit(if (b < 11) s1 else s2)
      }
      require(!it.hasNext, s"extra scale factors for granule $g channel $ch")
      require(gi.part23Length >= read,
        s"part2_3_length ${gi.part23Length} < $read scale-factor bits")
      var pad = gi.part23Length - read
      while (pad > 0) { val n = math.min(pad, 16); w(0, n); pad -= n }
    }
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
  // Layer III Huffman spectral decode + requantization (round 13,
  // r12 VERDICT #5: the next pure-integer rung after side-info/scale-
  // factors). ISO/IEC 11172-3 §2.4.2.7: after the scale factors, each
  // granule×channel's remaining part2_3 bits are Huffman-coded spectral
  // integers — big_values PAIRS over three region-partitioned code
  // tables (with linbits escapes past |15| and a sign bit per nonzero),
  // then count1 QUADRUPLES until the bit budget runs out, then zeros to
  // sample 576. Requantization turns integers into spectral magnitudes:
  // xr = sign·|is|^(4/3) · 2^((global_gain−210)/4)
  //        · 2^(−mult·(scalefac + preflag·pretab)), mult = 0.5/1.0 by
  // scalefac_scale (§2.4.3.4).
  //
  // CODEBOOK PROVENANCE — the never-guess discipline: Table B.7's 15
  // distinct big-values codebooks and count1 table A are pure DATA
  // (~1 600 codewords); in this zero-egress environment a from-memory
  // transcription cannot be verified against the spec text, so those
  // ids STRICT-REJECT unless the caller supplies the codebook, exactly
  // like the seq_scaling_matrix SPS reject. What ships: table 0 (the
  // all-zeros table — structural, no codewords), count1 table B (§B.7:
  // the 4-bit code is the literal complement of (v,w,x,y) — structural),
  // and FIXTURE codebooks mounted on ids 4 and 14, the two table ids
  // ISO itself defines as "not used" — so no real stream's table id can
  // collide with a fixture decode. The decode LOGIC (region partition,
  // pair/quad walks, escapes, signs, 576-sample layout, requantization)
  // is complete and golden-pinned with these codebooks.
  // -------------------------------------------------------------------

  /** A big-values pair codebook: `codes` maps '0'/'1' prefix-free code
    * strings to (|x|, |y|); `linbits` extends value 15 by that many raw
    * bits (0 = no escape). */
  final case class HuffTable(linbits: Int, codes: Map[String, (Int, Int)]) {
    require(codes.nonEmpty, "empty codebook")
    // prefix-freedom: no code is a prefix of another
    require(!codes.keys.exists(a => codes.keys.exists(b => b != a && b.startsWith(a))),
      "codebook is not prefix-free")
    private[multimodal] val maxLen = codes.keys.map(_.length).max
    private[multimodal] val enc: Map[(Int, Int), String] =
      codes.map(_.swap)
    require(enc.size == codes.size, "duplicate (x, y) entries")
  }

  /** A count1 quadruple codebook: code strings → (v, w, x, y) ∈ {0,1}⁴. */
  final case class Count1Table(codes: Map[String, (Int, Int, Int, Int)]) {
    require(codes.nonEmpty)
    require(!codes.keys.exists(a => codes.keys.exists(b => b != a && b.startsWith(a))),
      "codebook is not prefix-free")
    private[multimodal] val maxLen = codes.keys.map(_.length).max
    private[multimodal] val enc: Map[(Int, Int, Int, Int), String] = codes.map(_.swap)
  }

  /** Fixture codebook on ISO-unused id 4: (x, y) ∈ 0..3, canonical —
    * (0,0) = "0", the other 15 pairs enumerate as "1" + 4 index bits. */
  val fixtureTableSmall: HuffTable = HuffTable(0,
    (for { x <- 0 to 3; y <- 0 to 3 } yield {
      val k = x * 4 + y
      val code = if (k == 0) "0"
        else "1" + Integer.toBinaryString(16 | (k - 1)).substring(1)
      code -> ((x, y))
    }).toMap)

  /** Fixture ESCAPE codebook on ISO-unused id 14: (x, y) ∈ {0, 1, 15}²
    * with linbits = 3 (decoded 15 extends to 15 + read(3) ≤ 22) — the
    * escape path real tables 16–31 use, exercised without transcribing
    * them. */
  val fixtureTableEsc: HuffTable = HuffTable(3, Map(
    "0" -> ((0, 0)), "10" -> ((0, 1)), "110" -> ((1, 0)), "1110" -> ((1, 1)),
    "111100" -> ((0, 15)), "111101" -> ((15, 0)),
    "111110" -> ((1, 15)), "1111110" -> ((15, 1)), "1111111" -> ((15, 15))))

  /** Fixture count1 codebook (mounted when count1table_select = 0, where
    * ISO's table A — transcription data — would sit): all-zeros = "0",
    * the other 15 quads as "1" + the literal (v,w,x,y) bits. */
  val fixtureCount1A: Count1Table = Count1Table(
    (for { q <- 0 to 15 } yield {
      val t = ((q >> 3) & 1, (q >> 2) & 1, (q >> 1) & 1, q & 1)
      (if (q == 0) "0" else "1" + Integer.toBinaryString(16 | q).substring(1)) -> t
    }).toMap)

  /** The fixture codebook mount: ids 4 and 14 (ISO "not used"). */
  val fixtureTables: Map[Int, HuffTable] =
    Map(4 -> fixtureTableSmall, 14 -> fixtureTableEsc)

  /** Long-block scalefactor-band sample boundaries per samplerate index
    * (ISO 11172-3 Table B.8, transcribed — 22 bands, boundary 22 = 576).
    * Used for the region0/region1 sample partition and the per-band
    * requantization exponent. */
  private[multimodal] val sfBandsLong: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
      162, 196, 238, 288, 342, 418, 576), // 44.1 kHz
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
      156, 190, 230, 276, 330, 384, 576), // 48 kHz
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
      194, 240, 296, 364, 448, 576)) // 32 kHz

  /** Short-block scalefactor-band boundaries PER WINDOW per samplerate
    * index (ISO 11172-3 Table B.8's short halves, transcribed like
    * [[sfBandsLong]] — 13 bands, boundary 13 = 192; factors are
    * transmitted for bands 0–11, band 12 is implicitly 0 like long
    * band 21). Round 15 (r14 VERDICT #2): the short-block PCM path. */
  private[multimodal] val sfBandsShort: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192), // 44.1 kHz
    Array(0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192), // 48 kHz
    Array(0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192)) // 32 kHz

  /** preflag's fixed per-band boost (§2.4.3.4 pretab). */
  private[multimodal] val pretab: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

  /** One granule×channel's decoded spectrum: `is` = the 576 Huffman
    * integers (signed, in TRANSMISSION order), `nBig`/`nCount1` =
    * samples decoded by each stage, `xr` = requantized magnitudes in
    * SUBBAND-LINE order (for long blocks transmission order IS subband
    * order; short blocks are reordered from their (band, window, line)
    * transmission layout — §2.4.3.4.8, round 15), `blockType`/`mixed` =
    * the granule's window shape the filterbank consumes, `sf` = the RAW
    * transmitted scalefactors — 21 long entries; for pure-short
    * granules the 12×3 short factors flattened band-major (index
    * 3·band + window); for MIXED granules 8 long entries followed by
    * the 36 flattened short (index 8 + 3·band + window; bands 0..2
    * untransmitted, zero) — §2.4.3.4.9.3 reuses the right channel's
    * values as intensity positions (round 15; short late round 15;
    * mixed round 16). */
  final case class Spectrum(is: Array[Int], nBig: Int, nCount1: Int,
                            xr: Array[Double], blockType: Int = 0,
                            mixed: Boolean = false,
                            sf: Array[Int] = Array.empty)

  /** Decode the Huffman spectral data of a SELF-CONTAINED frame
    * (main_data_begin = 0) — scale factors are read first with the same
    * §2.4.2.7 walk [[parseScalefactors]] pins, then the big-values pair
    * regions and the count1 quadruple run, then requantization (all
    * block types since round 15 — short granules requantize with their
    * subblock gains and come back REORDERED to subband-line order).
    * Strict → None: reservoir frames, unknown table ids (see codebook
    * provenance above), a pair/quad walk crossing part2_3_length, or
    * count1 overrunning sample 576. Result: per granules(g)(ch). */
  def decodeSpectra(payload: Array[Byte], channels: Int, rateIdx: Int,
                    tables: Map[Int, HuffTable] = fixtureTables,
                    count1A: Count1Table = fixtureCount1A): Option[Seq[Seq[Spectrum]]] = try {
    val siOpt = parseSideInfo(payload, channels)
    if (siOpt.isEmpty) return None
    val si = siOpt.get
    if (si.mainDataBegin != 0) return None // use decodeSpectraStream
    val siBytes = if (channels == 1) 17 else 32
    Some(decodeGranules(
      new BitReader(java.util.Arrays.copyOfRange(payload, siBytes, payload.length)),
      si, channels, sfBandsLong(rateIdx), sfBandsShort(rateIdx), tables, count1A))
  } catch { case _: Exception => None }

  /** The shared §2.4.2.7 granule walk behind [[decodeSpectra]] (self-
    * contained frames) and [[decodeSpectraStream]] (bit-reservoir
    * streams): scale factors with scfsi sharing, big-values pair
    * regions, count1 quadruples to the exact part2_3 landing,
    * requantization (+ the §2.4.3.4.8 reorder for short blocks —
    * round 15, r14 VERDICT #2: block_type 2 pure and mixed decode
    * through the full walk; window-switched granules use the fixed
    * region boundary at sample 36). Throws on every strict seam
    * (unknown codebooks, budget-crossing walks, scfsi sharing into or
    * out of a short granule) — callers convert to None. */
  private def decodeGranules(r: BitReader, si: SideInfo, channels: Int,
                             bands: Array[Int], bandsShort: Array[Int],
                             tables: Map[Int, HuffTable],
                             count1A: Count1Table): Seq[Seq[Spectrum]] = {
    val out = Array.fill(2)(new Array[Spectrum](channels))
    val sfSave = Array.fill(2)(new Array[Array[Int]](channels))
    for (g <- 0 until 2; ch <- 0 until channels) {
      val gi = si.granules(g)(ch)
      val isShort = gi.windowSwitching && gi.blockType == 2
      val isMixed = isShort && gi.mixedBlock
      val (s1, s2) = slenTable(gi.scalefacCompress)
      var read = 0
      def take(n: Int): Int = { read += n; r.read(n) }
      // ---- scale factors (§2.4.2.7 layouts; scfsi only between two
      // long-layout granules — sharing into or out of a short granule
      // has no defined band mapping, reject rather than misparse) ----
      var sfsLong: Array[Int] = null          // bands 0..20 (long layouts)
      var sfsShort: Array[Array[Int]] = null  // (band 0..11)(window 0..2)
      if (isShort) {
        if (g == 1) require(si.scfsi(ch).forall(_ == 0),
          "scfsi sharing into a short granule")
        sfsShort = Array.ofDim[Int](12, 3)
        if (isMixed) {
          sfsLong = new Array[Int](21) // long bands 0..7 used
          for (b <- 0 until 8) sfsLong(b) = take(s1)
          for (b <- 3 until 12; w <- 0 until 3)
            sfsShort(b)(w) = take(if (b < 6) s1 else s2)
        } else {
          for (b <- 0 until 12; w <- 0 until 3)
            sfsShort(b)(w) = take(if (b < 6) s1 else s2)
        }
        sfSave(g)(ch) = null // a short granule cannot be shared from
      } else {
        val sfs = new Array[Int](21)
        val groups = Seq(0 until 6, 6 until 11, 11 until 16, 16 until 21)
        for ((grp, gidx) <- groups.zipWithIndex; b <- grp) {
          if (g == 1 && si.scfsi(ch)(gidx) == 1) {
            require(sfSave(0)(ch) != null, "scfsi sharing from a short granule")
            sfs(b) = sfSave(0)(ch)(b)
          } else sfs(b) = take(if (b < 11) s1 else s2)
        }
        sfSave(g)(ch) = sfs
        sfsLong = sfs
      }
      // ---- big_values pair regions ----
      val is = new Array[Int](576)
      val nBig = gi.bigValues * 2
      require(nBig <= 576, "big_values overruns the granule")
      // region sample boundaries: under window switching the standard
      // fixes region0 at sample 36 (8 long bands / 3×short band 3 — the
      // same sample at every rate) and region1 spans the rest; otherwise
      // from the transmitted counts over the long band table
      val b0 =
        if (gi.windowSwitching) 36
        else bands(math.min(gi.region0Count + 1, bands.length - 1))
      val b1 =
        if (gi.windowSwitching) 576
        else bands(math.min(gi.region0Count + 1 + gi.region1Count + 1,
          bands.length - 1))
      def decodePair(t: HuffTable): (Int, Int) = {
        var code = ""
        while (!t.codes.contains(code)) {
          if (code.length >= t.maxLen) throw new IllegalArgumentException("bad code")
          code += (if (take(1) == 1) "1" else "0")
        }
        t.codes(code)
      }
      def signed(mag: Int, linbits: Int): Int = {
        val m = if (mag == 15 && linbits > 0) 15 + take(linbits) else mag
        if (m == 0) 0 else if (take(1) == 1) -m else m
      }
      var sample = 0
      while (sample < nBig) {
        val region = if (sample < b0) 0 else if (sample < b1) 1 else 2
        val tid = gi.tableSelect(region)
        if (tid == 0) { is(sample) = 0; is(sample + 1) = 0 } // table 0: no bits
        else {
          val t = tables.getOrElse(tid, throw new IllegalArgumentException(
            s"table $tid has no loaded codebook (ISO B.7 transcription pending)"))
          val (x, y) = decodePair(t)
          is(sample) = signed(x, t.linbits)
          is(sample + 1) = signed(y, t.linbits)
        }
        sample += 2
      }
      // ---- count1 quadruples until the part2_3 budget is exhausted ----
      var nC1 = 0
      while (read < gi.part23Length && sample + 3 < 576) {
        val (v, w, x, y) =
          if (gi.count1TableSelect == 1) {
            // table B: the 4-bit code is the complement of the values
            val bits = take(4)
            ((~bits >> 3) & 1, (~bits >> 2) & 1, (~bits >> 1) & 1, ~bits & 1)
          } else {
            var code = ""
            while (!count1A.codes.contains(code)) {
              if (code.length >= count1A.maxLen)
                throw new IllegalArgumentException("bad count1 code")
              code += (if (take(1) == 1) "1" else "0")
            }
            count1A.codes(code)
          }
        def sgn(m: Int): Int = if (m == 0) 0 else if (take(1) == 1) -m else m
        is(sample) = sgn(v); is(sample + 1) = sgn(w)
        is(sample + 2) = sgn(x); is(sample + 3) = sgn(y)
        sample += 4; nC1 += 4
      }
      require(read == gi.part23Length, "walk crossed the part2_3 budget")
      // ---- requantization (§2.4.3.4) + short-block reorder ----
      val mult = if (gi.scalefacScale == 0) 0.5 else 1.0
      val xr = new Array[Double](576)
      val longEnd = if (!isShort) 576 else if (isMixed) 36 else 0
      var band = 0
      var i = 0
      while (i < longEnd) {
        while (band < 21 && i >= bands(band + 1)) band += 1
        if (is(i) != 0) {
          // band 21 (the last long band) transmits NO scale factor —
          // implicitly 0 (§2.4.2.7 transmits 21 factors over 22 bands)
          val sf = if (band >= 21) 0 else sfsLong(band)
          val exp = 0.25 * (gi.globalGain - 210) -
            mult * (sf + gi.preflag * pretab(band))
          xr(i) = math.signum(is(i).toDouble) *
            math.pow(math.abs(is(i)).toDouble, 4.0 / 3.0) * math.pow(2.0, exp)
        }
        i += 1
      }
      if (isShort) {
        // transmission order is (short band s, window w, line l) with
        // index 3·bS(s) + w·width(s) + l; requantize with the per-window
        // subblock gain (NO pretab — §2.4.3.4: preflag applies to long
        // bands only) and reorder to subband-line order
        // t = 18·(j/6) + 6·w + (j%6), j = bS(s) + l (§2.4.3.4.8)
        var s = if (isMixed) 3 else 0
        while (s < 13) {
          val lo = bandsShort(s); val width = bandsShort(s + 1) - lo
          var w = 0
          while (w < 3) {
            var l = 0
            while (l < width) {
              val src = 3 * lo + w * width + l
              if (is(src) != 0) {
                val sf = if (s >= 12) 0 else sfsShort(s)(w)
                val exp = 0.25 * (gi.globalGain - 210 - 8 * gi.subblockGain(w)) -
                  mult * sf
                val j = lo + l
                xr(18 * (j / 6) + 6 * w + (j % 6)) =
                  math.signum(is(src).toDouble) *
                    math.pow(math.abs(is(src)).toDouble, 4.0 / 3.0) *
                    math.pow(2.0, exp)
              }
              l += 1
            }
            w += 1
          }
          s += 1
        }
      }
      out(g)(ch) = Spectrum(is, nBig, nC1, xr,
        if (gi.windowSwitching) gi.blockType else 0, isMixed,
        if (isMixed) // 8 long entries then the 36 flattened short (r16)
          Array.tabulate(8)(sfsLong) ++
            Array.tabulate(36)(k => sfsShort(k / 3)(k % 3))
        else if (isShort) Array.tabulate(36)(k => sfsShort(k / 3)(k % 3))
        else sfsLong)
    }
    out.toSeq.map(_.toSeq)
  }

  /** BIT-RESERVOIR stream decode (the main_data_begin ≠ 0 seam closed —
    * most real encoders use the reservoir, so real corpora were stuck at
    * the self-contained [[decodeSpectra]] until now). §2.4.2.3: the
    * logical main-data stream is the concatenation of every frame's
    * post-side-info slot bytes, and frame f's granule data begins
    * main_data_begin BYTES before f's own slot region — the pointer only
    * LOCATES data (stuffing between frames is legal), so each frame
    * decodes from its own computed offset, no reader state threads.
    * Strict → None: a pointer reaching before the stream start, or
    * anything [[decodeSpectra]]'s walk rejects. Result: per
    * frames(f)(g)(ch). */
  def decodeSpectraStream(stream: Mp3Stream, rateIdx: Int,
                          tables: Map[Int, HuffTable] = fixtureTables,
                          count1A: Count1Table = fixtureCount1A): Option[Seq[Seq[Seq[Spectrum]]]] = try {
    val channels = stream.channels
    val siBytes = if (channels == 1) 17 else 32
    val slots = stream.framePayloads.map(p =>
      java.util.Arrays.copyOfRange(p, siBytes, p.length))
    val buf = new Array[Byte](slots.map(_.length).sum)
    var off = 0
    val offsets = slots.map { s =>
      System.arraycopy(s, 0, buf, off, s.length); off += s.length; off - s.length
    }
    val bands = sfBandsLong(rateIdx)
    val bandsS = sfBandsShort(rateIdx)
    Some(stream.framePayloads.zipWithIndex.map { case (payload, f) =>
      val si = parseSideInfo(payload, channels)
        .getOrElse(throw new IllegalArgumentException(s"frame $f: bad side info"))
      val start = offsets(f) - si.mainDataBegin
      require(start >= 0,
        s"frame $f: main_data_begin ${si.mainDataBegin} reaches before the stream")
      // offset reader, no copy: a per-frame copyOfRange of the remaining
      // stream would be O(frames × streamBytes) on real files (r14 review)
      val r = new BitReader(buf, start)
      val spectra = decodeGranules(r, si, channels, bands, bandsS, tables, count1A)
      // frame f's granule walk must END inside frame f's own slot region
      // (§2.4.2.3: main data can come from the PAST, never the future) —
      // without this, a corrupt part2_3_length overruns into later
      // frames' main data and decodes it as valid, a misparse under the
      // reject-never-misparse discipline; encodeMp3Reservoir enforces
      // the same invariant on the encode side (r14 ADVICE #3)
      require(r.bitPos <= (offsets(f) + slots(f).length) * 8,
        s"frame $f: granule data overruns its own slot region")
      spectra
    })
  } catch { case _: Exception => None }

  /** Fixture encoder for [[decodeSpectra]]: assembles side info + scale
    * factors + Huffman-coded spectra into one frame PAYLOAD, deriving
    * each granule×channel's part2_3_length from the bits actually
    * emitted (so the decoder's budget check pins the exact walk).
    * `spectra(g)(ch)` holds the signed integers laid out exactly as the
    * decoder reconstructs them: bigValues·2 pair samples then count1
    * quads (length ≡ nBig + 4·nQuads); sign bits are emitted for every
    * nonzero, linbits escapes for |v| ≥ 15 where the table carries them.
    * The GranuleInfos' part23Length fields are ignored and recomputed. */
  def encodeSpectra(si: SideInfo, channels: Int,
                    scalefacs: Seq[Seq[Array[Int]]],
                    spectra: Seq[Seq[Array[Int]]],
                    tables: Map[Int, HuffTable] = fixtureTables,
                    count1A: Count1Table = fixtureCount1A): Array[Byte] = {
    val (side, main) = encodeFrameParts(si, channels, scalefacs, spectra,
      tables, count1A)
    side ++ main
  }

  /** [[encodeSpectra]]'s two sections SEPARATELY — (side-info bytes,
    * main-data bytes) — so the reservoir encoder can place a frame's
    * main data in EARLIER frames' slot regions (§2.4.2.3). */
  def encodeFrameParts(si: SideInfo, channels: Int,
                       scalefacs: Seq[Seq[Array[Int]]],
                       spectra: Seq[Seq[Array[Int]]],
                       tables: Map[Int, HuffTable] = fixtureTables,
                       count1A: Count1Table = fixtureCount1A): (Array[Byte], Array[Byte]) = {
    val bandsAll = sfBandsLong(0) // fixture frames are 44.1 kHz
    // per (g, ch): emit scalefac + spectral bits into a local buffer to
    // measure part2_3_length, then rebuild the SideInfo and pack for real
    val runs = for (g <- 0 until 2; ch <- 0 until channels) yield {
      val gi = si.granules(g)(ch)
      val (s1, s2) = slenTable(gi.scalefacCompress)
      val bits = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def w(v: Int, n: Int): Unit = { require(n == 0 || (v >= 0 && v < (1 << n))); if (n > 0) bits += ((v, n)) }
      val it = scalefacs(g)(ch).iterator
      // scale-factor layouts per §2.4.2.7 (the parseScalefactors walk):
      // pure short 12×3, mixed 8 long + bands 3..11 ×3, else long+scfsi
      if (gi.windowSwitching && gi.blockType == 2 && !gi.mixedBlock)
        for (b <- 0 until 12; _ <- 0 until 3) w(it.next(), if (b < 6) s1 else s2)
      else if (gi.windowSwitching && gi.blockType == 2) {
        for (_ <- 0 until 8) w(it.next(), s1)
        for (b <- 3 until 12; _ <- 0 until 3) w(it.next(), if (b < 6) s1 else s2)
      } else {
        val groups = Seq(0 until 6, 6 until 11, 11 until 16, 16 until 21)
        for ((grp, gidx) <- groups.zipWithIndex; b <- grp)
          if (!(g == 1 && si.scfsi(ch)(gidx) == 1)) w(it.next(), if (b < 11) s1 else s2)
      }
      require(!it.hasNext, "extra scale factors")
      val is = spectra(g)(ch)
      val nBig = gi.bigValues * 2
      require(is.length >= nBig && (is.length - nBig) % 4 == 0,
        s"spectra length ${is.length} != $nBig big + 4k count1 samples")
      // region boundaries: fixed at sample 36 under window switching
      // (the decodeGranules rule), transmitted counts otherwise
      val b0 = if (gi.windowSwitching) 36
        else bandsAll(math.min(gi.region0Count + 1, bandsAll.length - 1))
      val b1 = if (gi.windowSwitching) 576
        else bandsAll(math.min(gi.region0Count + 1 + gi.region1Count + 1,
          bandsAll.length - 1))
      def wCode(c: String): Unit = c.foreach(ch0 => w(if (ch0 == '1') 1 else 0, 1))
      def wSigned(v: Int, t: HuffTable): Int = { // returns the |mag| written in the code
        val a = math.abs(v)
        val mag = if (t.linbits > 0 && a >= 15) {
          require(a - 15 < (1 << t.linbits), s"|$v| exceeds linbits range")
          15
        } else { require(a <= 15, s"|$v| needs an escape table"); a }
        mag
      }
      var sample = 0
      while (sample < nBig) {
        val region = if (sample < b0) 0 else if (sample < b1) 1 else 2
        val tid = gi.tableSelect(region)
        if (tid == 0) {
          require(is(sample) == 0 && is(sample + 1) == 0, "table 0 region must be zero")
        } else {
          val t = tables(tid)
          val mx = wSigned(is(sample), t); val my = wSigned(is(sample + 1), t)
          wCode(t.enc((mx, my)))
          for (v <- Seq(is(sample), is(sample + 1))) {
            val a = math.abs(v)
            if (t.linbits > 0 && a >= 15) w(a - 15, t.linbits)
            if (a != 0) w(if (v < 0) 1 else 0, 1)
          }
        }
        sample += 2
      }
      while (sample < is.length) {
        val q = (math.abs(is(sample)), math.abs(is(sample + 1)),
          math.abs(is(sample + 2)), math.abs(is(sample + 3)))
        require(q._1 <= 1 && q._2 <= 1 && q._3 <= 1 && q._4 <= 1,
          "count1 samples must be in {-1, 0, 1}")
        if (gi.count1TableSelect == 1)
          w(~(q._1 << 3 | q._2 << 2 | q._3 << 1 | q._4) & 0xF, 4)
        else wCode(count1A.enc(q))
        for (k <- 0 until 4; v = is(sample + k) if v != 0) w(if (v < 0) 1 else 0, 1)
        sample += 4
      }
      ((g, ch), bits.toSeq)
    }
    val p23 = runs.map { case (k, bits) => k -> bits.map(_._2).sum }.toMap
    val si2 = si.copy(granules = Seq.tabulate(2)(g => Seq.tabulate(channels)(ch =>
      si.granules(g)(ch).copy(part23Length = p23((g, ch))))))
    // pack: side info via the pinned encoder layout, then the runs in
    // order. Range-checked like the run-stage writer (round-13 ADVICE:
    // an unchecked pack would silently truncate a computed
    // part2_3_length > 4095 or big_values > 511 into corrupt side info
    // instead of failing fast). Side info is exactly 136/256 bits —
    // byte-aligned by construction — so the two sections pack
    // independently (the reservoir encoder needs them separable).
    def pack(bits: Seq[(Int, Int)]): Array[Byte] = {
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
    val siBits = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def w(v: Int, n: Int): Unit = {
      require(v >= 0 && v < (1 << n), s"field value $v does not fit in $n bits")
      siBits += ((v, n))
    }
    w(si2.mainDataBegin, 9)
    w(si2.privateBits, if (channels == 1) 5 else 3)
    for (ch <- 0 until channels; b <- 0 until 4) w(si2.scfsi(ch)(b), 1)
    for (g <- 0 until 2; ch <- 0 until channels) {
      val gi = si2.granules(g)(ch)
      w(gi.part23Length, 12); w(gi.bigValues, 9); w(gi.globalGain, 8)
      w(gi.scalefacCompress, 4); w(if (gi.windowSwitching) 1 else 0, 1)
      if (gi.windowSwitching) {
        w(gi.blockType, 2); w(if (gi.mixedBlock) 1 else 0, 1)
        gi.tableSelect.take(2).foreach(w(_, 5))
        gi.subblockGain.take(3).foreach(w(_, 3))
      } else {
        gi.tableSelect.take(3).foreach(w(_, 5))
        w(gi.region0Count, 4); w(gi.region1Count, 3)
      }
      w(gi.preflag, 1); w(gi.scalefacScale, 1); w(gi.count1TableSelect, 1)
    }
    (pack(siBits.toSeq), pack(runs.flatMap(_._2)))
  }

  // -------------------------------------------------------------------
  // Layer III DSP to PCM (round 14, r13 VERDICT #3): MS stereo, alias
  // reduction, IMDCT + windowing + overlap-add, frequency inversion,
  // and the polyphase synthesis filterbank — the full §2.4.3.4 chain
  // after requantization, for SELF-CONTAINED long-block frames (the
  // [[decodeSpectra]] scope). Every stage below is FORMULA math from
  // the spec text: the IMDCT basis cos(π/72·(2i+19)(2k+1)), the long
  // window sin(π/36·(i+½)), the synthesis matrix cos((16+o)(2k+1)π/64),
  // the MS matrix (M±S)/√2, and the 8 alias-reduction ci constants
  // (§2.4.3.4.10.1 — the same public-constant class as the bitrate
  // table). The ONE transcription-data table in this chain is ISO
  // Table B.3's 512 synthesis-window coefficients Di — like the B.7
  // codebooks they cannot be verified in this zero-egress environment,
  // so the decoder takes the window as an ARGUMENT: callers supply the
  // ISO table they trust (see [[parseSynthWindowSpec]]); the default
  // [[fixtureSynthWindow]] is a documented formula window that
  // exercises the identical pipeline with pinned-exact output but does
  // NOT alias-cancel like the ISO prototype (fixture audio, not ISO
  // audio — the codebook-provenance discipline applied to a window).
  // Decoder state (overlap-add tails, the V FIFO) is FRESH per frame:
  // exact for the self-contained fixture frames the gates pin; a
  // multi-frame stream decode would thread state across frames at the
  // same seam main_data_begin already guards.
  // -------------------------------------------------------------------

  /** §2.4.3.4.10.1 alias-reduction coefficients ci (8 published
    * constants); cs/ca derive by formula: csᵢ = 1/√(1+cᵢ²),
    * caᵢ = cᵢ/√(1+cᵢ²). */
  private[multimodal] val aliasCi: Array[Double] =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  private[multimodal] val aliasCs: Array[Double] =
    aliasCi.map(c => 1.0 / math.sqrt(1.0 + c * c))
  private[multimodal] val aliasCa: Array[Double] =
    aliasCi.map(c => c / math.sqrt(1.0 + c * c))

  /** Alias-reduction butterflies on a requantized 576-sample spectrum
    * (§2.4.3.4.10.1): at each subband boundary below `maxSb`, 8
    * butterflies mix the last 8 samples of the lower subband with the
    * first 8 of the upper. Long blocks use all 31 boundaries; mixed
    * blocks only the boundary between the two long subbands (maxSb =
    * 2); pure short blocks skip the stage entirely (round 15). */
  private[graft] def aliasReduce(xr: Array[Double], maxSb: Int = 32): Array[Double] = {
    val out = xr.clone()
    var sb = 1
    while (sb < maxSb) {
      var j = 0
      while (j < 8) {
        val ai = 18 * sb - 1 - j
        val bi = 18 * sb + j
        val a = out(ai); val b = out(bi)
        out(ai) = a * aliasCs(j) - b * aliasCa(j)
        out(bi) = b * aliasCs(j) + a * aliasCa(j)
        j += 1
      }
      sb += 1
    }
    out
  }

  /** The §2.4.3.4.10.3 36-point windows by block_type: 0 = long sine,
    * 1 = start (sine rise, flat 18–23, short fall 24–29, zero 30–35),
    * 3 = stop (zero 0–5, short rise 6–11, flat 12–17, sine fall). */
  private[graft] def longWindow(blockType: Int, i: Int): Double = blockType match {
    case 0 => math.sin(math.Pi / 36.0 * (i + 0.5))
    case 1 =>
      if (i < 18) math.sin(math.Pi / 36.0 * (i + 0.5))
      else if (i < 24) 1.0
      else if (i < 30) math.sin(math.Pi / 12.0 * (i - 18 + 0.5))
      else 0.0
    case 3 =>
      if (i < 6) 0.0
      else if (i < 12) math.sin(math.Pi / 12.0 * (i - 6 + 0.5))
      else if (i < 18) 1.0
      else math.sin(math.Pi / 36.0 * (i + 0.5))
    case bt => throw new IllegalArgumentException(s"no long window for block_type $bt")
  }

  /** 36-point IMDCT of one subband's 18 spectral lines, multiplied by
    * the block_type window (§2.4.3.4.10.3; types 0/1/3 — round 15):
    * x(i) = Σₖ X(k)·cos(π/72·(2i+19)(2k+1)). */
  private[graft] def imdct36(x: Array[Double], off: Int,
                             blockType: Int = 0): Array[Double] = {
    val out = new Array[Double](36)
    var i = 0
    while (i < 36) {
      var s = 0.0
      var k = 0
      while (k < 18) {
        s += x(off + k) * math.cos(math.Pi / 72.0 * (2 * i + 19) * (2 * k + 1))
        k += 1
      }
      out(i) = s * longWindow(blockType, i)
      i += 1
    }
    out
  }

  /** Short-block filterbank for one subband (§2.4.3.4.10.2, block_type
    * 2): three 12-point IMDCTs over the subband's 3 windows of 6 lines
    * each (subband-line order after the reorder), short sine window
    * sin(π/12·(i+½)), overlapped into the 36-sample output at
    * out(6 + 6w + i) — zero leading/trailing 6 samples. */
  private[graft] def imdct12x3(x: Array[Double], off: Int): Array[Double] = {
    val out = new Array[Double](36)
    var w = 0
    while (w < 3) {
      var i = 0
      while (i < 12) {
        var s = 0.0
        var k = 0
        while (k < 6) {
          s += x(off + 6 * w + k) *
            math.cos(math.Pi / 24.0 * (2 * i + 7) * (2 * k + 1))
          k += 1
        }
        out(6 + 6 * w + i) += s * math.sin(math.Pi / 12.0 * (i + 0.5))
        i += 1
      }
      w += 1
    }
    out
  }

  /** The formula FIXTURE synthesis window (see the DSP provenance note
    * above): D(i) = sin(π(i+½)/512)/32 — smooth, positive, unit-order
    * output scale. NOT ISO Table B.3; supply that via
    * [[parseSynthWindowSpec]] for real-corpus decoding. */
  val fixtureSynthWindow: Array[Double] =
    Array.tabulate(512)(i => math.sin(math.Pi * (i + 0.5) / 512.0) / 32.0)

  /** Polyphase synthesis filterbank (§2.4.3.4.10.4 structure): per time
    * slot t, matrix the 32 subband samples into 64 V values
    * (V(o) = Σₖ cos((16+o)(2k+1)π/64)·S(k)), push onto a 16-slot FIFO,
    * window by D, and emit 32 PCM samples
    * (pcm(j) = Σₙ D(j+32n)·V_{t−n}(j | 32+j by n parity)). The FIFO is
    * zero-initialized (fresh frame state — see the seam note above).
    * `bands(t)(k)` = time sample t of subband k; output length = 32·|t|. */
  private[graft] def synthesize(bands: Array[Array[Double]],
                                     window: Array[Double]): Array[Double] = {
    require(window.length == 512, s"synthesis window has ${window.length} taps, need 512")
    val nSlots = bands.length
    val v = Array.ofDim[Double](nSlots, 64)
    var t = 0
    while (t < nSlots) {
      var o = 0
      while (o < 64) {
        var s = 0.0
        var k = 0
        while (k < 32) {
          s += math.cos((16 + o) * (2 * k + 1) * math.Pi / 64.0) * bands(t)(k)
          k += 1
        }
        v(t)(o) = s
        o += 1
      }
      t += 1
    }
    val pcm = new Array[Double](nSlots * 32)
    t = 0
    while (t < nSlots) {
      var j = 0
      while (j < 32) {
        var s = 0.0
        var n = 0
        while (n < 16) {
          val src = t - n
          val vv = if (src < 0) 0.0
            else v(src)(if (n % 2 == 0) j else 32 + j)
          s += window(j + 32 * n) * vv
          n += 1
        }
        pcm(t * 32 + j) = s
        j += 1
      }
      t += 1
    }
    pcm
  }

  /** 16-bit quantization with saturation: ⌊x·32768 + ½⌋ clamped to
    * [−32768, 32767] — floor-based so an external SQL oracle's
    * floor(x*32768 + 0.5) reproduces it exactly (round-half-up on both
    * engines; round() would differ on negative halves). */
  def pcm16(x: Double): Int =
    math.max(-32768, math.min(32767, math.floor(x * 32768.0 + 0.5).toInt))

  /** Full Layer III decode of a SELF-CONTAINED long-block frame payload
    * to PCM: [[decodeSpectra]] (Huffman + requantization), optional MS
    * stereo (§2.4.3.4.9.2: L=(M+S)/√2, R=(M−S)/√2, applied to the
    * requantized spectra), [[aliasReduce]], [[imdct36]] + overlap-add
    * across the frame's two granules (fresh zero tail at granule 0 —
    * the per-frame state seam), frequency inversion (odd subband × odd
    * granule-local time sample), then [[synthesize]] over the frame's
    * 36 time slots (granule 1's FIFO sees granule 0's V history).
    * Returns one 1152-sample Array per channel; strict → None on
    * everything [[decodeSpectra]] rejects, or msStereo on mono. */
  def decodePcm(payload: Array[Byte], channels: Int, rateIdx: Int,
                msStereo: Boolean = false,
                tables: Map[Int, HuffTable] = fixtureTables,
                count1A: Count1Table = fixtureCount1A,
                synthWindow: Array[Double] = fixtureSynthWindow,
                intensityStereo: Boolean = false,
                shortIsPerWindow: Boolean = false): Option[Seq[Array[Double]]] = try {
    if ((msStereo || intensityStereo) && channels != 2) return None
    val specOpt = decodeSpectra(payload, channels, rateIdx, tables, count1A)
    if (specOpt.isEmpty) return None
    val spec = specOpt.get
    val isInfo =
      if (!intensityStereo) null
      else Array.tabulate(1, 2) { (_, g) =>
        val r = spec(g)(1)
        require(r.sf.nonEmpty, "intensity stereo without scalefactors")
        (r.nBig + r.nCount1, r.sf)
      }
    val xr = Array.tabulate(1, 2, channels)((_, g, ch) => spec(g)(ch).xr.clone())
    val bt = Array.tabulate(1, 2, channels)(
      (_, g, ch) => (spec(g)(ch).blockType, spec(g)(ch).mixed))
    Some(synthesizeFrames(xr, bt, channels, msStereo, synthWindow,
      isInfo, sfBandsLong(rateIdx), sfBandsShort(rateIdx), shortIsPerWindow))
  } catch { case _: Exception => None }

  /** Shared DSP back half of [[decodePcm]] / [[decodePcmStream]]
    * (one maintained copy — r14 review): MS matrix, alias reduction
    * (31 boundaries long, 1 for mixed, none for pure short), per-block-
    * type IMDCT ([[imdct36]] types 0/1/3, [[imdct12x3]] for short
    * subbands) + overlap-add (the tail threads across every granule
    * passed in, zero only at the start), frequency inversion, synthesis.
    * `xr(f)(g)(ch)` is consumed (MS mutates in place); `bt(f)(g)(ch)` =
    * (blockType, mixed). MS stereo over granules whose two channels
    * have DIFFERENT window shapes has no defined band mapping → throws
    * (callers convert to None). */
  private def synthesizeFrames(xr: Array[Array[Array[Array[Double]]]],
                               bt: Array[Array[Array[(Int, Boolean)]]],
                               channels: Int, msStereo: Boolean,
                               synthWindow: Array[Double],
                               isInfo: Array[Array[(Int, Array[Int])]] = null,
                               bands: Array[Int] = null,
                               bandsShort: Array[Int] = null,
                               shortIsPerWindow: Boolean = false): Seq[Array[Double]] = {
    val nF = xr.length
    if (msStereo || isInfo != null) {
      val s2 = math.sqrt(2.0)
      for (f <- 0 until nF; g <- 0 until 2) {
        require(bt(f)(g)(0) == bt(f)(g)(1),
          "MS stereo across differing block types")
        // §2.4.3.4.9.3 INTENSITY region (round 15): the long scalefactor
        // bands lying wholly inside the right channel's zero part —
        // first band boundary at or above rzeroStart. Inside it, the
        // right channel's raw scalefactor is the intensity position:
        //   is_pos = 7 → intensity off for the band (MS applies if on);
        //   is_pos = 6 → tan(π/2): all energy left (L = L, R = 0);
        //   else ratio = tan(is_pos·π/12), L' = L·ratio/(1+ratio),
        //        R' = L/(1+ratio).
        // Band 21 transmits no scalefactor — it reuses band 20's
        // position (the §2.4.2.7 21-factors-over-22-bands layout).
        @inline def intensityAt(t: Int, isPos: Int): Unit = {
          if (isPos != 7) {
            val l = xr(f)(g)(0)(t)
            if (isPos == 6) xr(f)(g)(1)(t) = 0.0
            else {
              val ratio = math.tan(isPos * math.Pi / 12.0)
              xr(f)(g)(0)(t) = l * (ratio / (1.0 + ratio))
              xr(f)(g)(1)(t) = l * (1.0 / (1.0 + ratio))
            }
          } else if (msStereo) {
            val m = xr(f)(g)(0)(t); val s = xr(f)(g)(1)(t)
            xr(f)(g)(0)(t) = (m + s) / s2
            xr(f)(g)(1)(t) = (m - s) / s2
          }
        }
        val (btype0, mixed0) = bt(f)(g)(0)
        val shortIs = isInfo != null && btype0 == 2 && !mixed0
        val mixedIs = isInfo != null && btype0 == 2 && mixed0
        if (shortIs) {
          // SHORT-window intensity (late round 15) — the DECIDED rule
          // (the §2.4.3.4.9.3 text is ambiguous for short blocks and
          // real decoders differ; this reading is pinned by fixtures
          // and gates but NOT yet validated against a reference
          // decoder's output — see ADVICE round 15): intensity bands
          // are the short sfbs whose ENTIRE transmission block (all 3
          // windows) lies in the right channel's zero part —
          // 3·bS(s) ≥ rzeroStart; a band straddling the boundary stays
          // on the normal/MS path. Positions come from the right
          // channel's per-(band, window) short scalefactors; band 12
          // (untransmitted) reuses band 11's position per window.
          // `shortIsPerWindow` selects the ALTERNATIVE per-window
          // reading (round 16, the validation-harness variant: window
          // w of band s is intensity iff ITS OWN transmission block
          // lies in the zero part, 3·bS(s) + w·width ≥ rzeroStart) —
          // off by default; [[graft.tools.Mp3IntensityProbe]] decodes
          // an external joint-stereo MP3 under both rules against a
          // reference decoder's PCM to decide which one is real.
          val (rzero, sfR) = isInfo(f)(g)
          var sBand = 0
          while (sBand < 13) {
            val lo = bandsShort(sBand)
            val width = bandsShort(sBand + 1) - lo
            val inRegion = 3 * lo >= rzero
            var w2 = 0
            while (w2 < 3) {
              val winRegion =
                if (shortIsPerWindow) 3 * lo + w2 * width >= rzero
                else inRegion
              val isPos =
                if (!winRegion) 7
                else if (sBand >= 12) sfR(3 * 11 + w2)
                else sfR(3 * sBand + w2)
              var l = 0
              while (l < width) {
                val j = lo + l
                intensityAt(18 * (j / 6) + 6 * w2 + (j % 6), isPos)
                l += 1
              }
              w2 += 1
            }
            sBand += 1
          }
        } else if (mixedIs) {
          // MIXED-block intensity (round 16 — the long+short band seam,
          // closing the last §2.7(a) refusal): the long region (samples
          // 0..36, bands 0..7) follows the LONG rule — intensity from
          // the first long-band boundary at or above rzeroStart; the
          // short region (bands 3..12) follows the decided
          // band-granular short rule — a band is intensity iff its
          // whole 3-window transmission block lies in the zero part,
          // 3·bS(s) ≥ rzeroStart. For mixed blocks the transmission
          // index of short band s IS 3·bS(s) (the long part spans
          // exactly 36 = 3·bS(3) samples), so the two rules meet at
          // the seam with no special case — the same zero-part logic,
          // each sub-layout under its own band table. Positions: long
          // sf(b); short sf(8 + 3·band + w) per (band, window), band
          // 12 reusing 11's (the Spectrum.sf mixed layout). Shares the
          // short rule's validation caveat (see ADVICE round 15).
          val (rzero, sfR) = isInfo(f)(g)
          var b = 0
          while (b < 8 && bands(b) < rzero) b += 1
          val isBound = if (b >= 8) Int.MaxValue else bands(b)
          var band = 0
          var i = 0
          while (i < 36) {
            while (band < 7 && i >= bands(band + 1)) band += 1
            intensityAt(i, if (i < isBound) 7 else sfR(band))
            i += 1
          }
          var sBand = 3
          while (sBand < 13) {
            val lo = bandsShort(sBand)
            val width = bandsShort(sBand + 1) - lo
            val inRegion = 3 * lo >= rzero
            var w2 = 0
            while (w2 < 3) {
              val winRegion =
                if (shortIsPerWindow) 3 * lo + w2 * width >= rzero
                else inRegion
              val isPos =
                if (!winRegion) 7
                else if (sBand >= 12) sfR(8 + 3 * 11 + w2)
                else sfR(8 + 3 * sBand + w2)
              var l = 0
              while (l < width) {
                val j = lo + l
                intensityAt(18 * (j / 6) + 6 * w2 + (j % 6), isPos)
                l += 1
              }
              w2 += 1
            }
            sBand += 1
          }
        } else {
          val (isBound, sfR) =
            if (isInfo == null) (Int.MaxValue, null: Array[Int])
            else {
              val (rzero, sfr) = isInfo(f)(g)
              var b = 0
              while (b < 22 && bands(b) < rzero) b += 1
              (if (b >= 22) Int.MaxValue else bands(b), sfr)
            }
          var band = 0
          var i = 0
          while (i < 576) {
            if (sfR != null) while (band < 21 && i >= bands(band + 1)) band += 1
            val isPos =
              if (sfR == null || i < isBound) 7 // outside: normal/MS path
              else if (band >= 21) sfR(20)
              else sfR(band)
            intensityAt(i, isPos)
            i += 1
          }
        }
      }
    }
    (0 until channels).map { ch =>
      // slots(t)(k): stream time slot t (frame·36 + granule·18 + local j)
      // of subband k, after overlap-add and frequency inversion
      val slots = Array.ofDim[Double](36 * nF, 32)
      val prev = Array.ofDim[Double](32, 18) // zero at the start only
      for (f <- 0 until nF; g <- 0 until 2) {
        val (btype, mixed) = bt(f)(g)(ch)
        val a =
          if (btype == 2 && !mixed) xr(f)(g)(ch) // no alias stage
          else if (btype == 2) aliasReduce(xr(f)(g)(ch), maxSb = 2)
          else aliasReduce(xr(f)(g)(ch))
        var sb = 0
        while (sb < 32) {
          // mixed blocks: the two lowest subbands stay long (type-0
          // window); everything else short
          val z =
            if (btype == 2 && !(mixed && sb < 2)) imdct12x3(a, sb * 18)
            else imdct36(a, sb * 18, if (btype == 2) 0 else btype)
          var j = 0
          while (j < 18) {
            var s = z(j) + prev(sb)(j)
            if (sb % 2 == 1 && j % 2 == 1) s = -s
            slots((f * 2 + g) * 18 + j)(sb) = s
            prev(sb)(j) = z(18 + j)
            j += 1
          }
          sb += 1
        }
      }
      synthesize(slots, synthWindow)
    }
  }

  /** STREAM decode to PCM with THREADED state (round 14 — the per-frame
    * fresh-state seam closed alongside the reservoir): spectra via
    * [[decodeSpectraStream]], then ONE DSP pass where the IMDCT
    * overlap-add tail and the synthesis FIFO carry across every granule
    * of every frame (zero only at STREAM start) — gapless, the real
    * decoder contract. Output: 1152·nFrames samples per channel. */
  def decodePcmStream(stream: Mp3Stream, rateIdx: Int,
                      tables: Map[Int, HuffTable] = fixtureTables,
                      count1A: Count1Table = fixtureCount1A,
                      synthWindow: Array[Double] = fixtureSynthWindow,
                      shortIsPerWindow: Boolean = false): Option[Seq[Array[Double]]] = try {
    val specOpt = decodeSpectraStream(stream, rateIdx, tables, count1A)
    if (specOpt.isEmpty) return None
    val spec = specOpt.get
    val channels = stream.channels
    if (stream.msStereo && channels != 2) return None
    // intensity stereo (§2.4.3.4.9.3, mode_extension bit 0 — round 15):
    // the right channel's zero-part bands reconstruct from the left via
    // the tan(is_pos·π/12) split; long, pure-short (late round 15),
    // AND mixed blocks (round 16) all decode — the short/mixed band
    // rules are the decided zero-part readings documented at the
    // synthesizeFrames stage
    val isOn = stream.mode == 1 && (stream.modeExt & 1) != 0
    if (isOn && channels != 2) return None
    val isInfo =
      if (!isOn) null
      else Array.tabulate(spec.length, 2) { (f, g) =>
        val r = spec(f)(g)(1)
        require(r.sf.nonEmpty, "intensity stereo without scalefactors")
        (r.nBig + r.nCount1, r.sf)
      }
    val xr = Array.tabulate(spec.length, 2, channels)(
      (f, g, ch) => spec(f)(g)(ch).xr.clone())
    val bt = Array.tabulate(spec.length, 2, channels)(
      (f, g, ch) => (spec(f)(g)(ch).blockType, spec(f)(g)(ch).mixed))
    Some(synthesizeFrames(xr, bt, channels, stream.msStereo, synthWindow,
      isInfo, sfBandsLong(rateIdx), sfBandsShort(rateIdx), shortIsPerWindow))
  } catch { case _: Exception => None }

  // -------------------------------------------------------------------
  // Caller-supplied resource specs (round 14, r13 VERDICT #4): the
  // never-guess discipline strict-rejects ISO B.7 codebook ids and the
  // Table B.3 synthesis window because transcription data cannot be
  // verified offline — but a USER who holds the spec text can. These
  // parsers define the documented interchange format, so a real corpus
  // decodes end-to-end the moment trusted tables are supplied:
  //
  //   # comment (anywhere; blank lines ignored)
  //   table 16 linbits 1        — starts a big-values codebook section
  //   110 0 0                   — one codeword: <bits> <|x|> <|y|>
  //   count1                    — starts the count1 table-A section
  //   0111 1 0 1 1              — one codeword: <bits> <v> <w> <x> <y>
  //   window                    — starts the synthesis-window section
  //   0.000000000 -0.000015259 …  — 512 whitespace-separated doubles
  //
  // Merge loaded tables over the fixtures at the call site
  // (`fixtureTables ++ loaded`) — the loader never silently overrides.
  // -------------------------------------------------------------------

  /** Parse big-values codebook sections from the spec format above.
    * Strict: unknown directives, magnitudes outside 0..15, linbits
    * outside 0..13 (ISO's max), malformed codes, or a table failing
    * [[HuffTable]]'s prefix-freedom/duplicate checks all throw. */
  def parseHuffTablesSpec(text: String): Map[Int, HuffTable] = {
    var cur: Option[(Int, Int)] = None // (id, linbits)
    val acc = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Map[String, (Int, Int)]]
    val linbitsOf = scala.collection.mutable.Map.empty[Int, Int]
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) line.split("\\s+") match {
        case Array("table", id, "linbits", lb) =>
          val i = id.toInt; val l = lb.toInt
          require(i >= 1 && i <= 31, s"codebook id $i out of range 1..31")
          require(l >= 0 && l <= 13, s"linbits $l out of range 0..13")
          cur = Some((i, l))
          linbitsOf(i) = l
          acc.getOrElseUpdate(i, scala.collection.mutable.Map.empty)
        case Array(code, x, y) if cur.isDefined =>
          require(code.forall(c => c == '0' || c == '1'), s"bad code '$code'")
          val (xv, yv) = (x.toInt, y.toInt)
          require(xv >= 0 && xv <= 15 && yv >= 0 && yv <= 15,
            s"magnitudes ($xv, $yv) out of range 0..15")
          acc(cur.get._1) += (code -> ((xv, yv)))
        case Array("count1") | Array("window") =>
          cur = None // those sections belong to the other parsers
        case _ if cur.isEmpty => // inside a count1/window section: skip
        case other => throw new IllegalArgumentException(
          s"unparseable codebook line: '${other.mkString(" ")}'")
      }
    }
    acc.map { case (id, codes) => id -> HuffTable(linbitsOf(id), codes.toMap) }.toMap
  }

  /** Parse the `count1` section (table A — ISO B.7's last page). */
  def parseCount1Spec(text: String): Count1Table = {
    var in = false
    val codes = scala.collection.mutable.Map.empty[String, (Int, Int, Int, Int)]
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) line.split("\\s+") match {
        case Array("count1") => in = true
        case Array("table", _, "linbits", _) | Array("window") => in = false
        case Array(code, v, w, x, y) if in =>
          require(code.forall(c => c == '0' || c == '1'), s"bad code '$code'")
          val q = (v.toInt, w.toInt, x.toInt, y.toInt)
          require(Seq(q._1, q._2, q._3, q._4).forall(b => b == 0 || b == 1),
            s"count1 values must be bits: $line")
          codes += (code -> q)
        case _ if !in => // other sections
        case other => throw new IllegalArgumentException(
          s"unparseable count1 line: '${other.mkString(" ")}'")
      }
    }
    require(codes.nonEmpty, "no count1 section found")
    Count1Table(codes.toMap)
  }

  /** Parse the `window` section: exactly 512 doubles (ISO Table B.3 as
    * the caller transcribed it). */
  def parseSynthWindowSpec(text: String): Array[Double] = {
    var in = false
    val vals = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) line.split("\\s+") match {
        case Array("window") => in = true
        case Array("table", _, "linbits", _) | Array("count1") => in = false
        case toks if in => toks.foreach(t => vals += t.toDouble)
        case _ => // other sections
      }
    }
    require(vals.length == 512, s"synthesis window needs 512 taps, got ${vals.length}")
    vals.toArray
  }

  /** Gate/fixture encoder (the operators only PARSE): a CBR MPEG-1
    * Layer III stream — `nFrames` frames at the given bitrate/samplerate
    * indices, no padding, payload bytes (side-info + main data position)
    * filled sequentially from `data`; optionally preceded by an ID3v2 tag
    * of `id3Bytes` zero bytes (synchsafe-sized). `data` must hold exactly
    * nFrames · (frameLen − 4) bytes. */
  def encodeMp3(nFrames: Int, bitrateIdx: Int, rateIdx: Int,
                data: Array[Byte], id3Bytes: Int = 0,
                mode: Int = 0, modeExt: Int = 0): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2,
      s"bad table indices ($bitrateIdx, $rateIdx)")
    require(mode >= 0 && mode <= 2 && modeExt >= 0 && modeExt <= 3,
      s"bad mode fields ($mode, $modeExt) — mono (mode 3) frames carry 17-byte side info, not encoded here")
    val flen = 144 * bitrates(bitrateIdx) * 1000 / rates(rateIdx)
    require(nFrames > 0 && data.length == nFrames * (flen - 4),
      s"${data.length} payload bytes != $nFrames x (${flen} - 4)")
    require(id3Bytes >= 0 && id3Bytes < (1 << 28), "bad ID3 size")
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, flags 0
      out.write((id3Bytes >> 21) & 0x7f); out.write((id3Bytes >> 14) & 0x7f)
      out.write((id3Bytes >> 7) & 0x7f); out.write(id3Bytes & 0x7f)
      (0 until id3Bytes).foreach(_ => out.write(0))
    }
    var f = 0
    while (f < nFrames) {
      out.write(0xff)
      out.write(0xfb) // sync + MPEG-1 (11) + Layer III (01) + no CRC (1)
      out.write((bitrateIdx << 4) | (rateIdx << 2)) // no padding, not private
      // mode + mode_extension; no copyright/original/emphasis
      out.write((mode << 6) | (modeExt << 4))
      out.write(data, f * (flen - 4), flen - 4)
      f += 1
    }
    out.toByteArray
  }

  /** Fixture encoder for BIT-RESERVOIR streams ([[decodeSpectraStream]]'s
    * counterpart): per-frame (SideInfo, scalefacs, spectra) packed with
    * each frame's main data as EARLY as the 9-bit pointer allows — frame
    * f's data starts at max(end of frame f−1's data, offsets(f) − 511) —
    * the implied main_data_begin written into the side info and gaps
    * zero-stuffed (spec-legal: the pointer LOCATES data, §2.4.2.3).
    * The SideInfos' mainDataBegin fields are ignored and recomputed.
    * Requires each frame's data to end inside its own slot region (a
    * real encoder's rate-control invariant — data can never come from
    * the future). */
  def encodeMp3Reservoir(bitrateIdx: Int, rateIdx: Int,
                         frames: Seq[(SideInfo, Seq[Seq[Array[Int]]], Seq[Seq[Array[Int]]])],
                         tables: Map[Int, HuffTable] = fixtureTables,
                         count1A: Count1Table = fixtureCount1A,
                         mode: Int = 0, modeExt: Int = 0): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2,
      s"bad table indices ($bitrateIdx, $rateIdx)")
    require(mode >= 0 && mode <= 2, "stereo modes only (32-byte side info)")
    val channels = 2
    val flen = 144 * bitrates(bitrateIdx) * 1000 / rates(rateIdx)
    val siBytes = 32
    val slotLen = flen - 4 - siBytes
    require(slotLen > 0, "frame too small for side info")
    val n = frames.length
    val slotBuf = new Array[Byte](n * slotLen)
    var prevEnd = 0
    val sides = frames.zipWithIndex.map { case ((si0, sfs, sp), f) =>
      val frameOff = f * slotLen
      val start = math.max(prevEnd, frameOff - 511)
      val mdb = frameOff - start // ∈ [0, 511]: prevEnd ≤ frameOff by the
                                 // own-region invariant below
      val (side, main) = encodeFrameParts(si0.copy(mainDataBegin = mdb),
        channels, sfs, sp, tables, count1A)
      require(start + main.length <= frameOff + slotLen,
        s"frame $f: ${main.length} main-data bytes overrun the slot region")
      System.arraycopy(main, 0, slotBuf, start, main.length)
      prevEnd = start + main.length
      side
    }
    val out = new java.io.ByteArrayOutputStream()
    for (f <- 0 until n) {
      out.write(0xff); out.write(0xfb)
      out.write((bitrateIdx << 4) | (rateIdx << 2))
      out.write((mode << 6) | (modeExt << 4))
      out.write(sides(f))
      out.write(slotBuf, f * slotLen, slotLen)
    }
    out.toByteArray
  }
}
