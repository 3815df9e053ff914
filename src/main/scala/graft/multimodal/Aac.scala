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
}
