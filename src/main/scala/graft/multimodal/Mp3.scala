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
    * seam); `durationMs` = frames · 1152 · 1000 / sampleRate (integer). */
  final case class Mp3Stream(nFrames: Int, bitrateKbps: Int, sampleRate: Int,
                             durationMs: Long, framePayloads: Array[Array[Byte]])

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
    while (p < bytes.length) {
      if (p + 4 > bytes.length) return None
      val h0 = bytes(p) & 0xff; val h1 = bytes(p + 1) & 0xff
      val h2 = bytes(p + 2) & 0xff
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
      payloads.length.toLong * 1152L * 1000L / sampleRate, payloads.toArray))
  } catch { case _: Exception => None }

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
