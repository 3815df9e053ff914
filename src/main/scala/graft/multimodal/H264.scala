package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** H.264/AVC (ITU-T Rec. H.264 / ISO/IEC 14496-10) byte-stream parser:
  * Annex-B start-code scan → NAL unit split → emulation-prevention removal
  * (EBSP→RBSP, §7.4.1.1) → Exp-Golomb header decode of SPS (§7.3.2.1.1)
  * and PPS (§7.3.2.2), with the §7.4.2.1.1 frame-dimension derivation
  * (mb grid minus crop units). This is the container/parameter layer a
  * training-data pipeline needs to type, route and fingerprint video blobs
  * (reference analog: the opaque-binary multimodal columns, SURVEY §2.7).
  *
  * The slice-data layer — CAVLC/CABAC entropy decode and the prediction/
  * transform DSP below it (§§8–9) — is the same documented seam as MP3
  * Layer-III synthesis: slice NALs (types 1/5) are surfaced as typed
  * opaque RBSP payloads, never half-decoded. Unsupported in-scope
  * structures (seq_scaling_matrix_present = 1) return None rather than
  * guessing.
  *
  * The encoder half exists for fixture assembly only (hand-built golden
  * streams in QueriesMedia / MultimodalSpec), mirroring Jpeg/Mp3/Mp4.
  */
object H264 {

  /** One NAL unit: header fields + RBSP (emulation-prevention removed). */
  final case class NalUnit(nalRefIdc: Int, nalType: Int, rbsp: Array[Byte])

  /** Sequence parameter set — the fields the pipeline pins. Width/height
    * are the DERIVED §7.4.2.1.1 values (crop applied), not raw mb counts. */
  final case class Sps(
      profileIdc: Int, levelIdc: Int, spsId: Int,
      chromaFormatIdc: Int, bitDepthLuma: Int,
      log2MaxFrameNum: Int, pocType: Int, maxNumRefFrames: Int,
      picWidthInMbs: Int, picHeightInMapUnits: Int,
      frameMbsOnly: Boolean,
      cropLeft: Int, cropRight: Int, cropTop: Int, cropBottom: Int,
      width: Int, height: Int)

  /** Picture parameter set — identification + entropy mode (the switch
    * that decides which §9 decoder the seam would need). */
  final case class Pps(ppsId: Int, spsId: Int, entropyCabac: Boolean,
                       numSliceGroups: Int)

  final case class H264Stream(nals: Seq[NalUnit], sps: Option[Sps],
                              pps: Option[Pps])

  // ---------------------------------------------------------------------
  // Bit reader with Exp-Golomb (§9.1)
  // ---------------------------------------------------------------------
  private final class BitReader(bytes: Array[Byte]) {
    private var bit = 0
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit + i
        v = (v << 1) | ((bytes(b >> 3) >> (7 - (b & 7))) & 1)
        i += 1
      }
      bit += n
      v
    }
    def flag(): Boolean = u(1) == 1
    /** ue(v): leadingZeroBits zeros, a 1, then leadingZeroBits info bits. */
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        // 30 keeps (1 << zeros) - 1 + info inside Int — larger codes are
        // malformed for every SPS/PPS field and must fail, not wrap
        require(zeros <= 30, "ue(v) exceeds 30 leading zeros")
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    /** se(v) = (-1)^(k+1) · ceil(k/2) over k = ue(v) (§9.1.1). */
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
    def bitsLeft: Int = bytes.length * 8 - bit
  }

  // ---------------------------------------------------------------------
  // Annex-B framing
  // ---------------------------------------------------------------------

  /** EBSP → RBSP: drop each 0x03 that follows 0x00 0x00 (§7.4.1.1 —
    * emulation_prevention_three_byte precedes a byte ≤ 0x03). */
  private[graft] def unescape(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new ArrayBuffer[Byte](until - from)
    var i = from
    var zeros = 0
    while (i < until) {
      val v = b(i)
      if (zeros >= 2 && v == 0x03) {
        // §7.4.1.1 defines the escape only BEFORE a byte ≤ 0x03 — a 0x03
        // followed by anything else is malformed EBSP; throw rather than
        // mis-unescape, caught into None by parse() (round-12 ADVICE: the
        // old `i + 1 <= until` guard was vacuously true and silently
        // stripped invalid escapes). A NAL ENDING in 00 00 03 is not
        // malformed per spec — cabac_zero_words appended after the RBSP
        // can legally leave a stream-final trailing escape (§7.4.2.10) —
        // but it is STRICT-REJECTED here by policy: this parser's scope
        // is CAVLC fixture streams, which never carry cabac_zero_words.
        require(i + 1 < until && (b(i + 1) & 0xFF) <= 0x03,
          "malformed emulation prevention: 0x03 not followed by 00-03")
        // skip the escape byte; zero run restarts after it
        zeros = 0
      } else {
        out += v
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toArray
  }

  /** RBSP → EBSP (encoder side): insert 0x03 after any 00 00 followed by
    * a byte ≤ 0x03. Precondition (asserted by [[annexB]]): the payload's
    * last byte is nonzero — true of every real RBSP, whose
    * rbsp_trailing_bits stop bit (§7.4.2.10) lands in the final byte.
    * Without it, [[parse]]'s trailing-zero strip would eat legitimate
    * payload-final zeros on the round trip (round-12 ADVICE). */
  private[graft] def escape(b: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](b.length + 8)
    var zeros = 0
    var i = 0
    while (i < b.length) {
      val v = b(i)
      if (zeros >= 2 && (v & 0xFF) <= 0x03) {
        out += 0x03
        zeros = 0
      }
      out += v
      zeros = if (v == 0) zeros + 1 else 0
      i += 1
    }
    out.toArray
  }

  /** Split an Annex-B byte stream into NAL units. Start codes are
    * 0x000001 with an optional extra leading zero (4-byte form); trailing
    * zero bytes of each NAL (trailing_zero_8bits / the 4-byte prefix of
    * the next start code) are stripped before unescaping. */
  def parse(bytes: Array[Byte]): Option[H264Stream] = try {
    val starts = ArrayBuffer.empty[Int] // index AFTER each 0x000001
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        starts += i + 3
        i += 3
      } else i += 1
    }
    if (starts.isEmpty) return None
    val nals = starts.zipWithIndex.map { case (s, k) =>
      var end = if (k + 1 < starts.length) starts(k + 1) - 3 else bytes.length
      while (end > s && bytes(end - 1) == 0) end -= 1 // trailing zeros / 4-byte prefix
      require(end > s, "empty NAL unit")
      val hdr = bytes(s) & 0xFF
      require((hdr & 0x80) == 0, "forbidden_zero_bit set")
      NalUnit((hdr >> 5) & 3, hdr & 0x1F, unescape(bytes, s + 1, end))
    }.toSeq
    val sps = nals.find(_.nalType == 7).flatMap(n => parseSps(n.rbsp))
    val pps = nals.find(_.nalType == 8).flatMap(n => parsePps(n.rbsp))
    Some(H264Stream(nals, sps, pps))
  } catch { case _: Exception => None }

  /** Profiles whose SPS carries the chroma/bit-depth block (§7.3.2.1.1). */
  private val highProfiles =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  def parseSps(rbsp: Array[Byte]): Option[Sps] = try {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint_set flags + reserved_zero_2bits
    val level = r.u(8)
    val spsId = r.ue()
    var chroma = 1 // default 4:2:0 when the block is absent
    var bitDepthLuma = 8
    if (highProfiles(profile)) {
      chroma = r.ue()
      if (chroma == 3) r.flag() // separate_colour_plane_flag
      bitDepthLuma = 8 + r.ue()
      r.ue() // bit_depth_chroma_minus8
      r.flag() // qpprime_y_zero_transform_bypass_flag
      if (r.flag()) return None // seq_scaling_matrix: out of scope, never guess
    }
    val log2MaxFrameNum = 4 + r.ue()
    val poc = r.ue()
    if (poc == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
    else if (poc == 1) {
      r.flag() // delta_pic_order_always_zero_flag
      r.se(); r.se()
      val n = r.ue()
      (0 until n).foreach(_ => r.se())
    }
    val maxRef = r.ue()
    r.flag() // gaps_in_frame_num_value_allowed_flag
    val pwMbs = r.ue() + 1
    val phMap = r.ue() + 1
    val fmo = r.flag()
    if (!fmo) r.flag() // mb_adaptive_frame_field_flag
    r.flag() // direct_8x8_inference_flag
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (r.flag()) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    // §7.4.2.1.1: crop units — SubWidthC/SubHeightC by chroma format;
    // monochrome crops in luma samples; vertical unit doubles for fields
    val (subW, subH) = chroma match {
      case 0 => (1, 1)
      case 1 => (2, 2)
      case 2 => (2, 1)
      case _ => (1, 1)
    }
    val unitX = subW
    val unitY = subH * (if (fmo) 1 else 2)
    val heightMbs = (if (fmo) 1 else 2) * phMap
    Some(Sps(profile, level, spsId, chroma, bitDepthLuma,
      log2MaxFrameNum, poc, maxRef, pwMbs, phMap, fmo, cl, cr, ct, cb,
      width = pwMbs * 16 - unitX * (cl + cr),
      height = heightMbs * 16 - unitY * (ct + cb)))
  } catch { case _: Exception => None }

  def parsePps(rbsp: Array[Byte]): Option[Pps] = try {
    val r = new BitReader(rbsp)
    val ppsId = r.ue()
    val spsId = r.ue()
    val cabac = r.flag()
    r.flag() // bottom_field_pic_order_in_frame_present_flag
    val groups = r.ue() + 1
    Some(Pps(ppsId, spsId, cabac, groups))
  } catch { case _: Exception => None }

  // ---------------------------------------------------------------------
  // Encoder (fixture assembly only)
  // ---------------------------------------------------------------------
  private final class BitWriter {
    private val bits = ArrayBuffer.empty[Boolean]
    def u(v: Int, n: Int): Unit = {
      require(v >= 0 && (n == 32 || v < (1L << n)), s"u($v,$n) out of range")
      (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1) == 1)
    }
    def flag(b: Boolean): Unit = bits += b
    def ue(v: Int): Unit = {
      require(v >= 0)
      val k = v + 1
      val n = 32 - Integer.numberOfLeadingZeros(k)
      u(0, n - 1); u(k, n)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** rbsp_stop_one_bit + zero padding to a byte boundary (§7.3.2.11). */
    def stopAndPad(): Array[Byte] = {
      bits += true
      while (bits.length % 8 != 0) bits += false
      bits.grouped(8).map(g =>
        g.zipWithIndex.foldLeft(0) { case (a, (b, i)) =>
          a | (if (b) 1 << (7 - i) else 0)
        }.toByte).toArray
    }
  }

  /** Fixture SPS encoder: writes exactly the fields [[parseSps]] reads.
    * `poc` must be 0 or 2 (type 1's reference-cycle list is not needed by
    * any fixture); high profiles get chroma_format_idc 1 / 8-bit depth. */
  def encodeSps(profile: Int, level: Int, spsId: Int,
                log2MaxFrameNumMinus4: Int, poc: Int, maxRef: Int,
                pwMbsMinus1: Int, phMapMinus1: Int, frameMbsOnly: Boolean,
                crop: Option[(Int, Int, Int, Int)]): Array[Byte] = {
    require(poc == 0 || poc == 2, "fixture SPS supports poc 0/2 only")
    val w = new BitWriter
    w.u(profile, 8); w.u(0, 8); w.u(level, 8)
    w.ue(spsId)
    if (highProfiles(profile)) {
      w.ue(1) // chroma_format_idc 4:2:0
      w.ue(0); w.ue(0) // bit depths 8
      w.flag(false) // transform bypass
      w.flag(false) // scaling matrix absent
    }
    w.ue(log2MaxFrameNumMinus4)
    w.ue(poc)
    if (poc == 0) w.ue(0) // log2_max_pic_order_cnt_lsb_minus4
    w.ue(maxRef)
    w.flag(false) // gaps_in_frame_num
    w.ue(pwMbsMinus1); w.ue(phMapMinus1)
    w.flag(frameMbsOnly)
    if (!frameMbsOnly) w.flag(false) // mb_adaptive
    w.flag(true) // direct_8x8_inference
    crop match {
      case Some((l, r2, t, b)) =>
        w.flag(true); w.ue(l); w.ue(r2); w.ue(t); w.ue(b)
      case None => w.flag(false)
    }
    w.flag(false) // vui absent
    w.stopAndPad()
  }

  def encodePps(ppsId: Int, spsId: Int, cabac: Boolean): Array[Byte] = {
    val w = new BitWriter
    w.ue(ppsId); w.ue(spsId)
    w.flag(cabac)
    w.flag(false) // bottom_field_pic_order_in_frame_present
    w.ue(0) // num_slice_groups_minus1
    w.stopAndPad()
  }

  /** Assemble an Annex-B stream: each (refIdc, type, rbsp) NAL gets
    * emulation prevention + a start code — 4-byte for the first NAL (the
    * access-unit convention), 3-byte after, with `fourByteAll` exercising
    * the all-4-byte variant some muxers emit. */
  def annexB(nals: Seq[(Int, Int, Array[Byte])],
             fourByteAll: Boolean = false): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    nals.zipWithIndex.foreach { case ((ref, typ, rbsp), i) =>
      // rbsp_trailing_bits' stop bit makes every real RBSP end nonzero
      // (§7.4.2.10); a zero-final payload would be corrupted by parse()'s
      // trailing_zero_8bits strip, so fail at fixture-build time
      require(rbsp.nonEmpty && rbsp.last != 0,
        "RBSP must end with a nonzero byte (rbsp_trailing_bits stop bit)")
      if (i == 0 || fourByteAll) out += 0
      out += 0; out += 0; out += 1
      out += ((ref << 5) | typ).toByte
      out ++= escape(rbsp)
    }
    out.toArray
  }
}
