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
    * single channel, everything else 2, §2.4.1.3). */
  final case class Mp3Stream(nFrames: Int, bitrateKbps: Int, sampleRate: Int,
                             durationMs: Long, framePayloads: Array[Array[Byte]],
                             channels: Int)

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
    while (p < bytes.length) {
      if (p + 4 > bytes.length) return None
      val h0 = bytes(p) & 0xff; val h1 = bytes(p + 1) & 0xff
      val h2 = bytes(p + 2) & 0xff
      val h3 = bytes(p + 3) & 0xff
      if (channels < 0) channels = if (((h3 & 0xc0) >> 6) == 3) 1 else 2
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
      channels))
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

  /** Gate/fixture encoder (the operators only PARSE): a CBR MPEG-1
    * Layer III stream — `nFrames` frames at the given bitrate/samplerate
    * indices, no padding, payload bytes (side-info + main data position)
    * filled sequentially from `data`; optionally preceded by an ID3v2 tag
    * of `id3Bytes` zero bytes (synchsafe-sized). `data` must hold exactly
    * nFrames · (frameLen − 4) bytes. */
  def encodeMp3(nFrames: Int, bitrateIdx: Int, rateIdx: Int,
                data: Array[Byte], id3Bytes: Int = 0): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2,
      s"bad table indices ($bitrateIdx, $rateIdx)")
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
      out.write(0x00) // stereo, no mode ext, no copyright/original/emphasis
      out.write(data, f * (flen - 4), flen - 4)
      f += 1
    }
    out.toByteArray
  }
}
