package graft.multimodal

/** AAC-in-MP4 glue (round 16, the audio twin of [[H264Mp4]]): ISO
  * 14496-1 `esds` sample descriptions — the ES/DecoderConfig/
  * DecoderSpecificInfo descriptor chain carrying the ISO 14496-3
  * AudioSpecificConfig — wired to the existing [[Aac]] decoders, so
  * `M4A bytes → AudioSpecificConfig → per-sample raw_data_blocks →
  * PCM` runs end to end. MP4 audio samples ARE raw_data_blocks (no
  * ADTS headers), so the stream decoders consume them directly with
  * the config's rate/channel facts.
  *
  * Strict-reject, never misparse: descriptor walks that overrun their
  * sizes, an objectTypeIndication other than MPEG-4 audio (0x40), an
  * AudioSpecificConfig outside the decoded scope (AOT ≠ 2 LC,
  * explicit/out-of-table sampling frequencies, channel configs other
  * than 1/2, 960-sample frames, core coders, extensions) all return
  * None — the decode scope then inherits the [[Aac]] strict seams and
  * table provenance contract unchanged. */
object AacMp4 {

  /** Parsed AudioSpecificConfig facts the decode needs. */
  final case class AacConfig(objectType: Int, rateIdx: Int, channels: Int)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
    ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Base-128 descriptor size (1..4 bytes, high-bit continuation). */
  private def descSize(b: Array[Byte], p0: Int): Option[(Int, Int)] = {
    var p = p0
    var size = 0
    var i = 0
    while (i < 4) {
      if (p >= b.length) return None
      val v = b(p) & 0xff
      p += 1
      size = (size << 7) | (v & 0x7f)
      if ((v & 0x80) == 0) return Some((size, p))
      i += 1
    }
    None
  }

  /** Parse a track's raw stsd payload: the first `mp4a` sample entry's
    * `esds` box → ES_Descriptor(0x03) → DecoderConfigDescriptor(0x04,
    * objectTypeIndication 0x40) → DecoderSpecificInfo(0x05) →
    * AudioSpecificConfig. */
  def parseEsds(stsd: Array[Byte]): Option[AacConfig] = try {
    if (stsd.length < 8 || stsd(0) != 0) return None
    val entries = be32(stsd, 4)
    if (entries < 1) return None
    var p = 8
    var found: Option[AacConfig] = None
    var e = 0L
    while (e < entries && found.isEmpty) {
      if (p + 8 > stsd.length) return None
      val size = be32(stsd, p)
      if (size < 8 || p + size > stsd.length) return None
      if (new String(stsd, p + 4, 4, "US-ASCII") == "mp4a") {
        // SampleEntry(8) + AudioSampleEntry fixed part (20) = 28 bytes
        var q = p + 8 + 28
        if (q > p + size) return None
        while (q < p + size && found.isEmpty) {
          if (q + 8 > p + size) return None
          val cs = be32(stsd, q)
          if (cs < 8 || q + cs > p + size) return None
          if (new String(stsd, q + 4, 4, "US-ASCII") == "esds") {
            var r = q + 8 + 4 // FullBox version/flags
            // ES_Descriptor
            if (r >= q + cs || stsd(r) != 0x03) return None
            r = descSize(stsd, r + 1).getOrElse(return None)._2
            if (r + 3 > q + cs) return None
            // streamDependence/URL/OCR flags signal optional fields between
            // here and the DecoderConfigDescriptor — strict-reject so the
            // descriptor walk never proceeds misaligned.
            if ((stsd(r + 2) & 0xE0) != 0) return None
            r += 3 // ES_ID u16 + flags u8 (no optional fields in scope)
            // DecoderConfigDescriptor
            if (r >= q + cs || stsd(r) != 0x04) return None
            r = descSize(stsd, r + 1).getOrElse(return None)._2
            if (r + 13 > q + cs) return None
            if ((stsd(r) & 0xff) != 0x40) return None // MPEG-4 audio
            r += 13 // objectType u8 + stream u8 + buffer u24 + rates u32x2
            // DecoderSpecificInfo = AudioSpecificConfig
            if (r >= q + cs || stsd(r) != 0x05) return None
            val (ascLen, r2) = descSize(stsd, r + 1).getOrElse(return None)
            if (ascLen < 2 || r2 + ascLen > q + cs) return None
            val b0 = stsd(r2) & 0xff; val b1 = stsd(r2 + 1) & 0xff
            val aot = b0 >> 3
            val rateIdx = ((b0 & 7) << 1) | (b1 >> 7)
            val channels = (b1 >> 3) & 0xf
            // GASpecificConfig head: frameLength/dependsOnCore/extension
            val ga = b1 & 7
            if (aot != 2) return None            // AAC-LC only
            if (rateIdx >= 13) return None       // explicit/reserved rates
            if (channels != 1 && channels != 2) return None
            if (ga != 0) return None             // 1024 frames, no core/ext
            found = Some(AacConfig(aot, rateIdx, channels))
          }
          q += cs.toInt
        }
      }
      p += size.toInt
      e += 1
    }
    found
  } catch { case _: Exception => None }

  /** MP4 audio samples (raw_data_blocks) as an [[Aac.AacStream]] the
    * stream decoders consume — the ADTS facts come from the config. */
  def toStream(samples: Seq[Array[Byte]], cfg: AacConfig): Aac.AacStream =
    Aac.AacStream(samples.map(p =>
      Aac.AdtsFrame(1, cfg.rateIdx, cfg.channels, p.length + 7,
        crcPresent = false, nRawBlocks = 1, payload = p)))

  // -------------------------------------------------------------------
  // Fixture encoders
  // -------------------------------------------------------------------

  /** Two-byte AudioSpecificConfig (LC, in-table rate, 1024 frames). */
  def encodeAsc(rateIdx: Int, channels: Int): Array[Byte] = {
    require(rateIdx >= 0 && rateIdx < 13 && (channels == 1 || channels == 2))
    Array((((2 << 3) | (rateIdx >> 1)) & 0xff).toByte,
      ((((rateIdx & 1) << 7) | (channels << 3)) & 0xff).toByte)
  }

  /** esds box payload from an AudioSpecificConfig. */
  def encodeEsds(asc: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0); out.write(0); out.write(0); out.write(0) // FullBox
    val dsi = 2 + asc.length                 // tag 0x05
    val dcd = 2 + 13 + dsi                   // tag 0x04
    out.write(0x03); out.write(2 + 3 + dcd - 2) // ES_Descriptor size
    out.write(0); out.write(1); out.write(0)    // ES_ID 1, flags 0
    out.write(0x04); out.write(13 + dsi)        // DecoderConfigDescriptor
    out.write(0x40); out.write(0x15)            // MPEG-4 audio, audio stream
    out.write(0); out.write(0); out.write(0)    // bufferSizeDB
    (0 until 8).foreach(_ => out.write(0))      // max/avg bitrate
    out.write(0x05); out.write(asc.length)      // DecoderSpecificInfo
    out.write(asc, 0, asc.length)
    out.toByteArray
  }

  /** stsd payload with one `mp4a` AudioSampleEntry wrapping `esds`. */
  def encodeStsdMp4a(channels: Int, sampleRate: Int, esds: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    u32(0); u32(1) // version/flags, entry_count
    val entrySize = 8 + 28 + 8 + esds.length
    u32(entrySize); out.write("mp4a".getBytes("US-ASCII"))
    (0 until 6).foreach(_ => out.write(0)) // reserved
    u16(1) // data_reference_index
    u32(0); u32(0) // reserved
    u16(channels); u16(16) // channelcount, samplesize
    u16(0); u16(0) // pre_defined, reserved
    u32(sampleRate.toLong << 16) // 16.16
    u32(8L + esds.length); out.write("esds".getBytes("US-ASCII"))
    out.write(esds, 0, esds.length)
    out.toByteArray
  }
}
