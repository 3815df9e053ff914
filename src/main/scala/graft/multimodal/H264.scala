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
    * are the DERIVED §7.4.2.1.1 values (crop applied), not raw mb counts.
    * `log2MaxPocLsb` (round 14, retained for the slice-header walk) is 0
    * unless pocType = 0. */
  final case class Sps(
      profileIdc: Int, levelIdc: Int, spsId: Int,
      chromaFormatIdc: Int, bitDepthLuma: Int,
      log2MaxFrameNum: Int, pocType: Int, maxNumRefFrames: Int,
      picWidthInMbs: Int, picHeightInMapUnits: Int,
      frameMbsOnly: Boolean,
      cropLeft: Int, cropRight: Int, cropTop: Int, cropBottom: Int,
      width: Int, height: Int, log2MaxPocLsb: Int = 0)

  /** Stream-carried INTRA scaling lists (round 17, §7.3.2.1.1 decoded
    * to RASTER order): `w4Y`/`w4Cb`/`w4Cr` are the 4x4 intra weight
    * matrices (Cb/Cr fall back to the previous intra list per Table
    * 7-2 rule A when absent), `w8Y` the 8x8 intra matrix (present iff
    * the PPS has transform_8x8_mode). Inter lists are walked
    * bit-exactly but unused — the intra decoders never dequantize
    * inter blocks. */
  final case class ScalingLists(w4Y: Array[Int], w4Cb: Array[Int],
                                w4Cr: Array[Int], w8Y: Option[Array[Int]])

  /** Picture parameter set — identification, entropy mode (the switch
    * that decides which §9 decoder the seam would need), and (round 14)
    * the §7.3.2.2 tail fields the slice-header walk branches on. */
  final case class Pps(ppsId: Int, spsId: Int, entropyCabac: Boolean,
                       numSliceGroups: Int, picInitQp: Int = 26,
                       deblockingPresent: Boolean = false,
                       redundantPresent: Boolean = false,
                       bottomFieldPocPresent: Boolean = false,
                       chromaQpOffset: Int = 0,
                       // round 16 — the §7.3.2.2 EXTENSION tail (present
                       // in most high-profile PPSes): silently ignoring
                       // it desynced nothing before I_NxN existed, but
                       // transform_8x8_mode adds a bit per I_NxN MB, so
                       // the flag must be parsed (the slice decoders
                       // strict-reject it as a named scope seam) and the
                       // second chroma QP offset must reach Cr's dequant
                       transform8x8: Boolean = false,
                       chromaQpOffset2: Option[Int] = None,
                       // round 17 — STREAM-CARRIED scaling lists (the
                       // High-profile custom-quant surface). Only the
                       // intra lists feed the intra decoders' dequant;
                       // the "use default matrix" forms (Table 7-3/7-4
                       // transcription constants) stay named rejects
                       // per the provenance discipline.
                       scaling: Option[ScalingLists] = None) {
    /** Cr's §8.5 qp offset: the extension's second offset, else the
      * shared one (§7.4.2.2: inferred equal when absent). */
    def chromaQpOffsetCr: Int = chromaQpOffset2.getOrElse(chromaQpOffset)
  }

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
    /** byte-aligned? (the I_PCM pcm_alignment / rbsp_trailing walks) */
    def aligned: Boolean = (bit & 7) == 0
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
    var log2MaxPocLsb = 0
    if (poc == 0) log2MaxPocLsb = 4 + r.ue()
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
      height = heightMbs * 16 - unitY * (ct + cb),
      log2MaxPocLsb = log2MaxPocLsb))
  } catch { case _: Exception => None }

  /** Round 14: reads through the §7.3.2.2 tail (num_ref_idx defaults,
    * weighting, init QP/QS, chroma offset, the three flags) — the fields
    * the slice-header walk branches on. Slice-group maps (numSliceGroups
    * > 1) stay unread: [[parseIPcmSlice]] rejects them. */
  def parsePps(rbsp: Array[Byte]): Option[Pps] = try {
    val r = new BitReader(rbsp)
    val ppsId = r.ue()
    val spsId = r.ue()
    val cabac = r.flag()
    // retained (r14 review): when set, a frame-coded poc-type-0 slice
    // header carries delta_pic_order_cnt_bottom right after
    // pic_order_cnt_lsb (§7.3.3) — the slice walk must consume it or
    // every later field reads bit-shifted
    val bottomPoc = r.flag() // bottom_field_pic_order_in_frame_present_flag
    val groups = r.ue() + 1
    if (groups == 1) {
      r.ue(); r.ue() // num_ref_idx_l0/l1_default_active_minus1
      r.flag() // weighted_pred_flag
      r.u(2) // weighted_bipred_idc
      val qp = 26 + r.se() // pic_init_qp_minus26
      r.se() // pic_init_qs_minus26
      val cqo = r.se() // chroma_qp_index_offset (late round 15: the
      // chroma-residual QP mapping consumes it)
      require(cqo >= -12 && cqo <= 12, s"chroma_qp_index_offset $cqo")
      val dbf = r.flag() // deblocking_filter_control_present_flag
      r.flag() // constrained_intra_pred_flag
      val red = r.flag() // redundant_pic_cnt_present_flag
      // §7.3.2.2 extension (round 16): rbsp_more_data — the extension
      // exists iff any bit BEYOND the trailing stop bit remains, i.e.
      // the next 1-bit is not the LAST 1-bit of the RBSP. Ignoring it
      // was a misparse seam (transform_8x8_mode changes the slice-data
      // layout); parse it, strict-reject scaling matrices (custom
      // quant weights are outside the flat-16 dequant scope).
      var lastOne = -1
      var bi = rbsp.length * 8 - 1
      while (bi >= 0 && lastOne < 0) {
        if (((rbsp(bi >> 3) >> (7 - (bi & 7))) & 1) == 1) lastOne = bi
        bi -= 1
      }
      val pos = rbsp.length * 8 - r.bitsLeft
      require(lastOne >= pos, "missing rbsp_stop_one_bit")
      var t8 = false
      var cqo2: Option[Int] = None
      var scal: Option[ScalingLists] = None
      if (lastOne > pos) {
        t8 = r.flag() // transform_8x8_mode_flag
        if (r.flag()) { // pic_scaling_matrix_present_flag (round 17)
          // §7.3.2.1.1 scaling lists, STREAM-CARRIED values only: the
          // delta_scale chains decode from the bits; the
          // use-default-matrix escape (first nextScale hitting 0) and
          // the Table 7-2 rule-A fall-back to a DEFAULT matrix (lists
          // 0/6 absent) are Table 7-3/7-4 transcription constants →
          // named rejects. Lists 1/2 fall back to the PREVIOUS intra
          // list (stream-derived → fine); inter lists are walked but
          // unused by the intra decoders.
          def scalingList(size: Int, scan: Array[Int]): Array[Int] = {
            val w = new Array[Int](size)
            var lastScale = 8; var nextScale = 8
            var j = 0
            while (j < size) {
              if (nextScale != 0) {
                nextScale = (lastScale + r.se() + 256) % 256
                require(j > 0 || nextScale != 0,
                  "use_default_scaling_matrix (Table 7-3/7-4) out of scope")
              }
              w(scan(j)) = if (nextScale == 0) lastScale else nextScale
              lastScale = w(scan(j))
              j += 1
            }
            w
          }
          val n = if (t8) 8 else 6
          val present = new Array[Boolean](n)
          val lists = new Array[Array[Int]](n)
          var i = 0
          while (i < n) {
            if (r.flag()) {
              present(i) = true
              lists(i) = scalingList(if (i < 6) 16 else 64,
                if (i < 6) H264Cavlc.zigZag4x4 else H264Cavlc.zigZag8x8)
            }
            i += 1
          }
          require(present(0),
            "fall-back to the default 4x4 intra matrix (Table 7-3) out of scope")
          val w4Y = lists(0)
          val w4Cb = if (present(1)) lists(1) else w4Y
          val w4Cr = if (present(2)) lists(2) else w4Cb
          val w8Y =
            if (t8) {
              require(present(6),
                "fall-back to the default 8x8 intra matrix (Table 7-4) out of scope")
              Some(lists(6))
            } else None
          scal = Some(ScalingLists(w4Y, w4Cb, w4Cr, w8Y))
        }
        val c2 = r.se() // second_chroma_qp_index_offset
        require(c2 >= -12 && c2 <= 12, s"second_chroma_qp_index_offset $c2")
        cqo2 = Some(c2)
      }
      require(r.flag(), "missing rbsp_stop_one_bit")
      require(r.bitsLeft < 8, "trailing bytes after the PPS")
      while (r.bitsLeft > 0)
        require(!r.flag(), "nonzero rbsp_alignment after the PPS")
      Some(Pps(ppsId, spsId, cabac, groups, qp, dbf, red, bottomPoc, cqo,
        t8, cqo2, scal))
    } else
      // slice-group maps sit between num_slice_groups and the tail; the
      // tail fields are unreachable without walking them (out of scope)
      Some(Pps(ppsId, spsId, cabac, groups))
  } catch { case _: Exception => None }

  // ---------------------------------------------------------------------
  // I_PCM slice decode (round 14, r13 VERDICT #7): the first rung of
  // real PIXEL output. I_PCM macroblocks are raw samples after the
  // slice header — exact by construction, no entropy decode — so the
  // scope is the §7.3.3 slice-header Exp-Golomb walk plus the §7.3.5
  // I_PCM branch (byte alignment + sample copy). Strict → None on
  // everything outside it: non-I slices, CABAC (its slice data starts
  // with cabac_alignment, a different §9 world), field coding, 4:2:2+
  // chroma, slice groups, redundant slices, non-I_PCM macroblocks
  // (mb_type ≠ 25 needs the residual decoder — the seam), multi-slice
  // pictures (first_mb_in_slice ≠ 0), or a slice not covering the
  // whole picture.
  // ---------------------------------------------------------------------

  /** One I_PCM macroblock: 256 luma + 2×64 chroma (4:2:0) raw samples
    * as unsigned ints. */
  final case class IPcmMb(luma: Array[Int], cb: Array[Int], cr: Array[Int])

  /** Decoded single-slice I_PCM picture. `sliceQp` = 26 +
    * pic_init_qp_minus26 + slice_qp_delta (§7.4.3 — carried for the
    * header pin; PCM samples bypass quantization entirely). */
  final case class IPcmSlice(sliceType: Int, ppsId: Int, frameNum: Int,
                             idrPicId: Int, pocLsb: Int, sliceQp: Int,
                             mbs: Seq[IPcmMb])

  /** Parse a slice NAL's RBSP as a single-slice I_PCM picture under the
    * given SPS/PPS. `nalType` 5 = IDR (idr_pic_id present), `nalRefIdc`
    * ≠ 0 adds dec_ref_pic_marking (IDR's two flags only). */
  def parseIPcmSlice(rbsp: Array[Byte], sps: Sps, pps: Pps,
                     nalRefIdc: Int, nalType: Int): Option[IPcmSlice] = try {
    if (nalType != 1 && nalType != 5) return None
    if (sps.chromaFormatIdc != 1 || sps.bitDepthLuma != 8) return None // 4:2:0 8-bit scope
    if (!sps.frameMbsOnly) return None // field coding: seam
    if (pps.entropyCabac) return None // CABAC slice data: seam
    if (pps.numSliceGroups != 1) return None
    val r = new BitReader(rbsp)
    if (r.ue() != 0) return None // first_mb_in_slice: single-slice scope
    val sliceType = r.ue()
    if (sliceType != 2 && sliceType != 7) return None // I slices only
    val ppsId = r.ue()
    if (ppsId != pps.ppsId) return None
    val frameNum = r.u(sps.log2MaxFrameNum)
    val idr = nalType == 5
    val idrPicId = if (idr) r.ue() else 0
    var pocLsb = 0
    if (sps.pocType == 0) {
      pocLsb = r.u(sps.log2MaxPocLsb)
      // §7.3.3: frame-coded pictures (frameMbsOnly enforced above) carry
      // delta_pic_order_cnt_bottom when the PPS flag is set — consume it
      // or every later field reads bit-shifted (r14 review)
      if (pps.bottomFieldPocPresent) r.se()
    }
    else if (sps.pocType != 2) return None // poc type 1 deltas: out of scope
    if (pps.redundantPresent && r.ue() != 0) return None // redundant slice
    if (nalRefIdc != 0) {
      if (idr) { r.flag(); r.flag() } // no_output_of_prior_pics, long_term_reference
      else if (r.flag()) return None // adaptive_ref_pic_marking: seam
    }
    val sliceQp = pps.picInitQp + r.se()
    if (pps.deblockingPresent) {
      val idc = r.ue()
      if (idc != 1) { r.se(); r.se() } // alpha/beta offsets
    }
    // slice_data: every macroblock must be I_PCM (mb_type 25 in I slices)
    val picSizeMbs = sps.picWidthInMbs * sps.picHeightInMapUnits
    val mbs = new scala.collection.mutable.ArrayBuffer[IPcmMb](picSizeMbs)
    var mb = 0
    while (mb < picSizeMbs) {
      if (r.ue() != 25) return None // non-I_PCM macroblock: the entropy seam
      while (!r.aligned) require(r.u(1) == 0, "pcm_alignment_zero_bit must be 0")
      val luma = Array.fill(256)(r.u(8))
      val cbS = Array.fill(64)(r.u(8))
      val crS = Array.fill(64)(r.u(8))
      mbs += IPcmMb(luma, cbS, crS)
      mb += 1
    }
    // rbsp_trailing_bits: stop bit + alignment zeros, then nothing
    require(r.u(1) == 1, "missing rbsp_stop_one_bit")
    while (!r.aligned) require(r.u(1) == 0, "nonzero rbsp_alignment_zero_bit")
    require(r.bitsLeft == 0, "trailing bytes after rbsp_trailing_bits")
    Some(IPcmSlice(sliceType, ppsId, frameNum, idrPicId, pocLsb, sliceQp, mbs.toSeq))
  } catch { case _: Exception => None }

  /** Fixture encoder for [[parseIPcmSlice]]: slice header + I_PCM
    * macroblocks, mirrored field for field (checked writers). */
  def encodeIPcmSlice(sps: Sps, pps: Pps, nalRefIdc: Int, idr: Boolean,
                      frameNum: Int, idrPicId: Int, pocLsb: Int,
                      sliceQpDelta: Int, mbs: Seq[IPcmMb],
                      deblockIdc: Int = 1): Array[Byte] = {
    require(mbs.length == sps.picWidthInMbs * sps.picHeightInMapUnits,
      "fixture slice must cover the whole picture")
    val w = new BitWriter
    w.ue(0) // first_mb_in_slice
    w.ue(7) // slice_type: I (all slices of the picture are I)
    w.ue(pps.ppsId)
    w.u(frameNum, sps.log2MaxFrameNum)
    if (idr) w.ue(idrPicId)
    if (sps.pocType == 0) {
      w.u(pocLsb, sps.log2MaxPocLsb)
      if (pps.bottomFieldPocPresent) w.se(0) // delta_pic_order_cnt_bottom
    }
    if (pps.redundantPresent) w.ue(0)
    if (nalRefIdc != 0 && idr) { w.flag(false); w.flag(false) }
    require(nalRefIdc != 0 || !idr, "IDR NALs carry nal_ref_idc != 0")
    w.se(sliceQpDelta)
    if (pps.deblockingPresent) {
      w.ue(deblockIdc)
      if (deblockIdc != 1) { w.se(0); w.se(0) }
    }
    mbs.foreach { m =>
      w.ue(25) // mb_type I_PCM
      w.alignZero()
      m.luma.foreach(v => w.u(v, 8))
      m.cb.foreach(v => w.u(v, 8))
      m.cr.foreach(v => w.u(v, 8))
    }
    w.stopAndPad()
  }

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
    /** pcm_alignment_zero_bits up to the next byte boundary. */
    def alignZero(): Unit = while (bits.length % 8 != 0) bits += false
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

  /** Round 14: writes the complete §7.3.2.2 single-slice-group field
    * list (the earlier truncated form stopped at num_slice_groups; the
    * slice-header walk needs the tail flags). */
  def encodePps(ppsId: Int, spsId: Int, cabac: Boolean,
                picInitQp: Int = 26, deblockingPresent: Boolean = false,
                redundantPresent: Boolean = false,
                bottomFieldPocPresent: Boolean = false,
                chromaQpOffset: Int = 0,
                transform8x8: Boolean = false,
                chromaQpOffset2: Option[Int] = None,
                // round 17: intra scaling lists to WRITE (raster
                // order): up to (w4Y, w4Cb, w4Cr); absent tail lists
                // fall back per Table 7-2 rule A on parse. `scaling8`
                // needs transform8x8. Inter list flags are written 0.
                scaling4: Seq[Array[Int]] = Nil,
                scaling8: Option[Array[Int]] = None): Array[Byte] = {
    val w = new BitWriter
    w.ue(ppsId); w.ue(spsId)
    w.flag(cabac)
    w.flag(bottomFieldPocPresent)
    w.ue(0) // num_slice_groups_minus1
    w.ue(0); w.ue(0) // num_ref_idx_l0/l1_default_active_minus1
    w.flag(false) // weighted_pred_flag
    w.u(0, 2) // weighted_bipred_idc
    w.se(picInitQp - 26) // pic_init_qp_minus26
    w.se(0) // pic_init_qs_minus26
    w.se(chromaQpOffset) // chroma_qp_index_offset
    w.flag(deblockingPresent)
    w.flag(false) // constrained_intra_pred_flag
    w.flag(redundantPresent)
    // §7.3.2.2 extension (round 16): written when any extension field
    // is set — the high-profile layout real encoders emit
    val hasScaling = scaling4.nonEmpty || scaling8.isDefined
    require(scaling8.isEmpty || transform8x8, "scaling8 needs transform8x8")
    require(scaling4.length <= 3 && scaling4.forall(_.length == 16) &&
      scaling8.forall(_.length == 64), "scaling list shapes")
    require(!hasScaling || scaling4.nonEmpty,
      "scaling needs at least the 4x4 intra Y list")
    require((scaling4 ++ scaling8).forall(_.forall(v => v >= 1 && v <= 255)),
      "scaling weights must be 1..255")
    if (transform8x8 || chromaQpOffset2.isDefined || hasScaling) {
      w.flag(transform8x8)
      w.flag(hasScaling) // pic_scaling_matrix_present_flag
      if (hasScaling) {
        def deltaChain(ws: Array[Int], scan: Array[Int]): Unit = {
          var lastScale = 8
          var j = 0
          while (j < ws.length) {
            w.se(ws(scan(j)) - lastScale) // delta_scale
            lastScale = ws(scan(j))
            j += 1
          }
        }
        val n = if (transform8x8) 8 else 6
        var i = 0
        while (i < n) {
          val list: Option[Array[Int]] =
            if (i < 3) scaling4.lift(i)
            else if (i == 6) scaling8
            else None // inter lists (3..5, 7): absent
          list match {
            case Some(ws) =>
              w.flag(true)
              deltaChain(ws, if (i < 6) H264Cavlc.zigZag4x4 else H264Cavlc.zigZag8x8)
            case None => w.flag(false)
          }
          i += 1
        }
      }
      w.se(chromaQpOffset2.getOrElse(chromaQpOffset))
    }
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
