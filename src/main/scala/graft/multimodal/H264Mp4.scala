package graft.multimodal

/** H.264-in-MP4 glue (round 16): the path a real video corpus actually
  * takes — ISO 14496-15 `avc1`/`avcC` sample descriptions carrying the
  * out-of-band SPS/PPS, and mdat samples made of LENGTH-PREFIXED NAL
  * units (no Annex-B start codes inside MP4) — wired to the existing
  * [[H264Cavlc]]/[[H264Cabac]] slice decoders so
  * `MP4 bytes → avcC config → per-sample NAL walk → intra pictures`
  * runs end to end. NAL payloads inside MP4 samples are still EBSP
  * (emulation-prevention escaped), so the walk unescapes through the
  * same [[H264.unescape]] the Annex-B path uses.
  *
  * Strict-reject, never misparse: a malformed stsd/avcC (bad version,
  * truncated parameter-set tables, entry sizes overrunning the box),
  * a sample whose length prefixes do not tile it exactly, or a
  * zero-length NAL all return None. Codec scope is inherited from the
  * slice decoders (all-intra CAVLC/CABAC; everything else keeps their
  * named rejects), and the CAVLC/CABAC table provenance contract is
  * unchanged — the caller still supplies the tables. */
object H264Mp4 {

  /** Parsed avcC: profile/level bytes, the NAL length-prefix size
    * (1/2/4 bytes), and the out-of-band parameter-set NAL units
    * (EBSP bytes INCLUDING the 1-byte NAL header, as stored). */
  final case class AvcConfig(profile: Int, level: Int, nalLengthSize: Int,
                             sps: Seq[Array[Byte]], pps: Seq[Array[Byte]])

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
    ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Parse a track's raw stsd payload ([[Mp4.Track.stsd]]): FullBox
    * header + entry_count, then the first `avc1` VisualSampleEntry's
    * `avcC` child. Strict → None on structural damage. */
  def parseAvcc(stsd: Array[Byte]): Option[AvcConfig] = try {
    if (stsd.length < 8) return None
    if (stsd(0) != 0) return None // version 0 only
    val entries = be32(stsd, 4)
    if (entries < 1) return None
    var p = 8
    var found: Option[AvcConfig] = None
    var e = 0L
    while (e < entries && found.isEmpty) {
      if (p + 8 > stsd.length) return None
      val size = be32(stsd, p)
      if (size < 8 || p + size > stsd.length) return None
      val typ = new String(stsd, p + 4, 4, "US-ASCII")
      if (typ == "avc1") {
        // SampleEntry(8) + VisualSampleEntry fixed part (70) = 78 bytes
        // after the box header, then child boxes
        var q = p + 8 + 78
        if (q > p + size) return None
        while (q < p + size && found.isEmpty) {
          if (q + 8 > p + size) return None
          val cs = be32(stsd, q)
          if (cs < 8 || q + cs > p + size) return None
          if (new String(stsd, q + 4, 4, "US-ASCII") == "avcC") {
            val b = q + 8
            if (q + cs - b < 7) return None
            if (stsd(b) != 1) return None // configurationVersion
            val profile = stsd(b + 1) & 0xff
            val level = stsd(b + 3) & 0xff
            val lengthSize = (stsd(b + 4) & 0x3) + 1
            if (lengthSize == 3) return None // 1, 2 or 4 only (reserved)
            var r = b + 5
            def sets(count: Int): Option[Seq[Array[Byte]]] = {
              val out = Seq.newBuilder[Array[Byte]]
              var i = 0
              while (i < count) {
                if (r + 2 > q + cs) return None
                val len = be16(stsd, r); r += 2
                if (len < 1 || r + len > q + cs) return None
                out += java.util.Arrays.copyOfRange(stsd, r, r + len)
                r += len
                i += 1
              }
              Some(out.result())
            }
            val nSps = stsd(r) & 0x1f; r += 1
            val sps = sets(nSps).getOrElse(return None)
            if (r >= q + cs) return None
            val nPps = stsd(r) & 0xff; r += 1
            val pps = sets(nPps).getOrElse(return None)
            if (sps.isEmpty || pps.isEmpty) return None
            found = Some(AvcConfig(profile, level, lengthSize, sps, pps))
          }
          q += cs.toInt
        }
      }
      p += size.toInt
      e += 1
    }
    found
  } catch { case _: Exception => None }

  /** Split one mdat sample into its NAL units (each returned WITH the
    * 1-byte NAL header, EBSP as stored). Strict → None unless the
    * length prefixes tile the sample exactly. */
  def splitSample(sample: Array[Byte], lengthSize: Int): Option[Seq[Array[Byte]]] = try {
    require(lengthSize == 1 || lengthSize == 2 || lengthSize == 4)
    val out = Seq.newBuilder[Array[Byte]]
    var p = 0
    while (p < sample.length) {
      if (p + lengthSize > sample.length) return None
      var len = 0L
      var i = 0
      while (i < lengthSize) { len = (len << 8) | (sample(p + i) & 0xffL); i += 1 }
      p += lengthSize
      if (len < 1 || p + len > sample.length) return None
      out += java.util.Arrays.copyOfRange(sample, p, p + len.toInt)
      p += len.toInt
    }
    Some(out.result())
  } catch { case _: Exception => None }

  /** A parameter-set NAL's RBSP (strip the 1-byte header, unescape). */
  def nalRbsp(nal: Array[Byte]): Array[Byte] = H264.unescape(nal, 1, nal.length)

  /** Decode one intra picture from an MP4 video sample under the avcC
    * config: collect the slice NALs (type 1/5) in order, unescape,
    * dispatch on the PPS entropy mode to the CAVLC or CABAC
    * PICTURE-level parser (round 17: a sample may carry the picture
    * as several slices; they must tile it exactly). Strict → None on
    * a sample without any slice NAL, on any NAL type outside
    * the whitelist {1, 5, 6, 9, 12} — in-band parameter sets (7/8)
    * could override the avcC config this decode is keyed on, and data
    * partitions / end markers / unknown types are out of scope;
    * silently ignoring any of them would be a misparse seam (real
    * avc1 files keep parameter sets in avcC) — or on either parser's
    * rejects. SEI/AUD/filler NALs (6/9/12) are skipped — they carry
    * no pixels and real encoders emit them. */
  def decodeSamplePicture(sample: Array[Byte], cfg: AvcConfig,
                          sps: H264.Sps, pps: H264.Pps,
                          cavlc: H264Cavlc.CavlcTables,
                          cabac: H264Cabac.CabacTables): Option[H264Cavlc.I16Picture] = {
    splitSample(sample, cfg.nalLengthSize).flatMap { nals =>
      // Whitelist: slices (1/5) decode, SEI/AUD/filler (6/9/12) skip;
      // EVERYTHING else strict-rejects — in-band parameter sets (7/8)
      // could override the avcC config this decode is keyed on, and
      // data partitions (2-4), end-of-seq/stream (10/11), and unknown
      // types are out of scope. Silently dropping them would be a
      // misparse seam.
      if (!nals.forall(n => Set(1, 5, 6, 9, 12).contains(n(0) & 0x1f))) None
      else {
      // round 17: a sample may carry the picture as SEVERAL slice NALs
      // (real encoders slice for parallelism/error resilience) — all
      // slices feed the picture-level parser, which enforces exact
      // coverage and slice-bound availability
      val slices = nals.filter(n => (n(0) & 0x1f) == 1 || (n(0) & 0x1f) == 5)
      if (slices.isEmpty) None
      else {
        val parts = slices.map(n =>
          ((n(0) >> 5) & 3, n(0) & 0x1f, H264.unescape(n, 1, n.length)))
        if (pps.entropyCabac) H264Cabac.parseIPicture(parts, sps, pps, cabac)
        else H264Cavlc.parseI16x16Picture(parts, sps, pps, cavlc)
      }
      }
    }
  }

  // -------------------------------------------------------------------
  // Fixture encoders
  // -------------------------------------------------------------------

  /** avcC payload from parameter-set NAL units (EBSP incl. headers). */
  def encodeAvcc(profile: Int, level: Int, lengthSize: Int,
                 sps: Seq[Array[Byte]], pps: Seq[Array[Byte]]): Array[Byte] = {
    require(lengthSize == 1 || lengthSize == 2 || lengthSize == 4)
    require(sps.nonEmpty && sps.length <= 31 && pps.nonEmpty && pps.length <= 255)
    val out = new java.io.ByteArrayOutputStream()
    out.write(1); out.write(profile); out.write(0); out.write(level)
    out.write(0xfc | (lengthSize - 1))
    out.write(0xe0 | sps.length)
    sps.foreach { n => out.write(n.length >> 8); out.write(n.length & 0xff); out.write(n, 0, n.length) }
    out.write(pps.length)
    pps.foreach { n => out.write(n.length >> 8); out.write(n.length & 0xff); out.write(n, 0, n.length) }
    out.toByteArray
  }

  /** stsd payload with one `avc1` VisualSampleEntry wrapping `avcc`. */
  def encodeStsdAvc1(width: Int, height: Int, avcc: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    u32(0) // version + flags
    u32(1) // entry_count
    val entrySize = 8 + 78 + 8 + avcc.length
    u32(entrySize); out.write("avc1".getBytes("US-ASCII"))
    (0 until 6).foreach(_ => out.write(0)) // reserved
    u16(1) // data_reference_index
    u16(0); u16(0) // pre_defined, reserved
    (0 until 3).foreach(_ => u32(0)) // pre_defined
    u16(width); u16(height)
    u32(0x00480000); u32(0x00480000) // 72 dpi
    u32(0) // reserved
    u16(1) // frame_count
    (0 until 32).foreach(_ => out.write(0)) // compressorname
    u16(24) // depth
    u16(0xffff) // pre_defined = -1
    u32(8L + avcc.length); out.write("avcC".getBytes("US-ASCII"))
    out.write(avcc, 0, avcc.length)
    out.toByteArray
  }

  /** A complete NAL unit from RBSP: header byte + EBSP escape. */
  def nalUnit(refIdc: Int, nalType: Int, rbsp: Array[Byte]): Array[Byte] =
    ((refIdc << 5) | nalType).toByte +: H264.escape(rbsp)

  /** A length-prefixed sample from NAL units. */
  def sampleOf(lengthSize: Int, nals: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    nals.foreach { n =>
      var i = lengthSize - 1
      while (i >= 0) { out.write((n.length >> (8 * i)) & 0xff); i -= 1 }
      out.write(n, 0, n.length)
    }
    out.toByteArray
  }
}
