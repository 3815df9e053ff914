package graft.multimodal

/** Pure-JVM BASELINE-SEQUENTIAL JPEG codec (r8 VERDICT #6): moves the
  * dominant real-corpus image format off the documented stub path without
  * any codec library. Scope is the honest minimum that decodes a real
  * baseline grayscale file: SOI/APP/COM/DQT/DHT/SOF0/SOS/EOI marker walk,
  * canonical Huffman decode (DC categories + AC run/size with ZRL/EOB),
  * 0xFF00 byte-unstuffing, zigzag + dequantization, double-precision
  * 2-D IDCT with level shift and clamping. Covers grayscale and
  * 3-component color with per-component sampling factors 1–2 (4:4:4,
  * 4:2:2 and the dominant real-corpus 4:2:0 — general interleaved MCU
  * walk + replication chroma upsample, round 10) plus DRI/RSTn restart
  * intervals. Restrictions (strict → None, never a misdecode): no
  * progressive (SOF2), no arithmetic coding, sampling factors ≤ 2,
  * 8-bit precision.
  *
  * EXACTNESS SEAM (how a lossy codec gets an oracle): for an image whose
  * 8×8 blocks are each CONSTANT gray v, the DCT is DC-only — F(0,0) =
  * 8·(v−128), every AC exactly 0 — so with a unit quantization table the
  * coefficient is an exact integer, the IDCT of a DC-only block is the
  * exact constant F(0,0)/8, and decode(encode(bytes)) == bytes BIT-FOR-BIT.
  * [[encodeJpegConstBlocks]] builds exactly these fixtures (one payload
  * byte per block, standard Annex-K Huffman tables, real entropy coding
  * with byte stuffing); the decoder is fully general over baseline
  * grayscale streams and is additionally golden-fixture-pinned in
  * MultimodalSpec against HAND-ASSEMBLED bitstreams (including nonzero-AC
  * blocks checked against an independently-written reference IDCT), so an
  * encoder/decoder bug pair cannot cancel.
  *
  * Reference anchor: the reference repo has no media tier (local_db.py is
  * text+vector only) — this extends the beyond-reference training-data
  * surface, same contract as [[Codecs.decodePpm]]/[[Codecs.decodeWav]].
  */
object Jpeg {

  /** Grayscale decoded image: one byte per pixel, row-major. */
  final case class Gray(pixels: Array[Byte], width: Int, height: Int)

  // zigzag index -> natural (row*8+col) position, ITU T.81 figure A.6
  val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K.3.1 / K.3.2: the standard luminance Huffman tables.
  val stdDcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val stdDcVals: Array[Int] = (0 to 11).toArray
  val stdAcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val stdAcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman: (code, length) per symbol, assigned in BITS order
    * (T.81 Annex C) — shared by encoder (symbol → code) and DHT parsing
    * (decode tree). */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int, Int)] = {
    // returns (symbol, code, length) triples
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += ((vals(k), code, len))
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.toArray
  }

  // ------------------------------------------------------------- decoder

  /** Huffman decode table: maps (length, code) → symbol via per-length
    * ranges — O(1) per bit-length step, the classic mincode/maxcode walk. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    private val codes = canonicalCodes(bits, vals)
    // per length 1..16: smallest code, largest code + 1, index of first val
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len - 1); k += bits(len - 1)
        maxCode(len) = code // exclusive
        code <<= 1
        len += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.bit()
        len += 1
        if (bits(len - 1) > 0 && code < maxCode(len))
          return vals(valPtr(len) + (code - minCode(len)))
      }
      throw new IllegalArgumentException("invalid Huffman code")
    }
    def codeOf(sym: Int): (Int, Int) = codes.find(_._1 == sym)
      .map(c => (c._2, c._3))
      .getOrElse(throw new IllegalArgumentException(s"symbol $sym not in table"))
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * unstuffing; any other 0xFF-marker inside the scan is a hard stop. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw new IllegalArgumentException("EOF in scan")
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) throw new IllegalArgumentException("EOF after FF")
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte
          else throw new IllegalArgumentException(f"marker FF$m%02x inside scan")
          v = 0xff
        }
        cur = v; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    /** Consume an expected RSTn marker: drop the current byte's remaining
      * padding bits (entropy segments are 1-padded to a byte boundary
      * before a restart, T.81 F.1.2.3) and check FFD0+n. */
    def restart(n: Int): Unit = {
      nbits = 0 // byte-align
      if (pos + 1 >= b.length)
        throw new IllegalArgumentException("EOF at restart")
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + n))
        throw new IllegalArgumentException(
          f"expected RST$n, found ${b(pos) & 0xff}%02x${b(pos + 1) & 0xff}%02x")
      pos += 2
    }

    /** `receive` (T.81 F.2.2.4): read s raw bits MSB-first, unsigned. */
    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** `receive` + `extend` (T.81 F.2.2.1): read s magnitude bits, map to
      * the signed value. */
    def extend(s: Int): Int = {
      if (s == 0) return 0
      val v = receive(s)
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
  }

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Interleaved-RGB decoded image (3 bytes per pixel, row-major) from a
    * 3-component 4:4:4 baseline stream, JFIF YCbCr→RGB converted. */
  final case class Rgb(pixels: Array[Byte], width: Int, height: Int)

  /** Strict baseline GRAYSCALE decode; None on anything out of scope
    * (including color streams — use [[decodeJpegRgb]]). */
  def decodeJpeg(bytes: Array[Byte]): Option[Gray] = {
    try decodeStrict(bytes) match {
      case Some((planes, w, h)) if planes.length == 1 =>
        val out = new Array[Byte](w * h)
        var i = 0
        while (i < out.length) { out(i) = planes(0)(i).toByte; i += 1 }
        Some(Gray(out, w, h))
      case _ => None
    } catch { case _: Exception => None }
  }

  /** Strict baseline 3-component COLOR decode (4:4:4, 4:2:2, 4:2:0):
    * per-component Huffman/quant/DC-predictor state over interleaved
    * MCUs, replication chroma upsample to full resolution, then the
    * JFIF YCbCr→RGB conversion — floor(x + 0.5) rounding and 0..255
    * clamping, the exact arithmetic the DuckDB oracle restates (floor is
    * chosen over round() because the two engines' round() disagree on
    * negative halves; floor(x+0.5) is identical semantics everywhere).
    * None on grayscale streams — use [[decodeJpeg]]. */
  def decodeJpegRgb(bytes: Array[Byte]): Option[Rgb] = {
    try decodeStrict(bytes) match {
      case Some((planes, w, h)) if planes.length == 3 =>
        val out = new Array[Byte](3 * w * h)
        def cl(v: Double): Byte =
          math.max(0, math.min(255, math.floor(v + 0.5).toInt)).toByte
        var i = 0
        while (i < w * h) {
          val y = planes(0)(i); val cb = planes(1)(i); val cr = planes(2)(i)
          out(3 * i) = cl(y + 1.402 * (cr - 128))
          out(3 * i + 1) = cl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
          out(3 * i + 2) = cl(y + 1.772 * (cb - 128))
          i += 1
        }
        Some(Rgb(out, w, h))
      case _ => None
    } catch { case _: Exception => None }
  }

  /** Shared scan decode → one 0..255 Int plane per component. Sequential
    * (SOF0) streams decode in their single SOS case and return there;
    * PROGRESSIVE (SOF2) streams accumulate raw coefficients across
    * multiple scans into per-component buffers and finalize (dequant +
    * IDCT + upsample) at EOI — see [[progressiveScan]] below. */
  private def decodeStrict(b: Array[Byte]): Option[(Array[Array[Int]], Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    val qt = new Array[Array[Int]](4) // up to 4 quant tables, natural order
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var width = 0; var height = 0
    // SOF components in frame order: (component id, h, v, quant table id)
    var comps: Array[(Int, Int, Int, Int)] = null
    var sof = false
    var restartInterval = 0
    // progressive state: raw (not yet dequantized) coefficients per
    // component, NATURAL order within each 64-coef block, blocks laid out
    // on the MCU-padded grid (padBW × padBH blocks)
    var progressive = false
    var anyScan = false
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0
    var padBW: Array[Int] = null; var padBH: Array[Int] = null
    var coefBufs: Array[Array[Int]] = null

    def finalizeProgressive(): Option[(Array[Array[Int]], Int, Int)] = {
      val compPW = Array.tabulate(comps.length)(fi => padBW(fi) * 8)
      val padded = Array.tabulate(comps.length)(fi =>
        new Array[Int](padBW(fi) * 8 * padBH(fi) * 8))
      val coef = new Array[Int](64)
      var fi = 0
      while (fi < comps.length) {
        val q = qt(comps(fi)._4)
        if (q == null) return None
        var by = 0
        while (by < padBH(fi)) {
          var bx = 0
          while (bx < padBW(fi)) {
            val base = (by * padBW(fi) + bx) * 64
            var j = 0
            while (j < 64) { coef(j) = coefBufs(fi)(base + j) * q(j); j += 1 }
            idctBlock(coef, padded(fi), compPW(fi), padBH(fi) * 8, bx * 8, by * 8)
            bx += 1
          }
          by += 1
        }
        fi += 1
      }
      Some((upsamplePlanes(comps, width, height, padded, compPW), width, height))
    }

    /** One progressive scan (T.81 G.2 / the jdphuff.c control flow): DC
      * first (Huffman diffs of dc>>Al) or DC refinement (one raw bit per
      * block), AC first (run/size with EOB-run codes) or AC refinement
      * (±1<<Al insertions + correction bits for every nonzero-history
      * coefficient, including inside EOB runs). DC scans may interleave
      * all components (MCU walk); AC scans are single-component over the
      * component's OWN block grid. Returns the byte offset of the next
      * marker. */
    def progressiveScan(body: Int, len: Int): Int = {
      def inv(msg: String) = throw new IllegalArgumentException(msg)
      val ns = b(body) & 0xff
      if (ns < 1 || ns > comps.length) inv("bad scan component count")
      val scanComps = Array.tabulate(ns) { c =>
        val cid = b(body + 1 + 2 * c) & 0xff
        val fi = comps.indexWhere(_._1 == cid)
        if (fi < 0) inv("unknown component in SOS")
        val tt = b(body + 2 + 2 * c) & 0xff
        (fi, (tt & 0xf0) >> 4, tt & 0x0f)
      }
      val ss = b(body + 1 + 2 * ns) & 0xff
      val se = b(body + 2 + 2 * ns) & 0xff
      val ahal = b(body + 3 + 2 * ns) & 0xff
      val ah = (ahal & 0xf0) >> 4; val al = ahal & 0x0f
      if (al > 13 || ah > 13) inv("bad successive-approximation bits")
      val br = new BitReader(b, body + len - 2)
      val pred = new Array[Int](comps.length)
      var eobrun = 0
      var sinceRestart = 0
      var rstN = 0
      def maybeRestart(): Unit =
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          br.restart(rstN)
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(pred, 0)
          eobrun = 0
          sinceRestart = 0
        }
      // a single-component scan is NON-interleaved: it walks the
      // component's own ceil(compW/8) × ceil(compH/8) grid, NOT the
      // MCU-padded grid (T.81 A.2.2); buffer rows still use the padded
      // stride
      def ownGrid(fi: Int): (Int, Int) = {
        val (sh, sv) = (comps(fi)._2, comps(fi)._3)
        val cw = (width * sh + hmax - 1) / hmax
        val ch = (height * sv + vmax - 1) / vmax
        (((cw + 7) / 8), ((ch + 7) / 8))
      }
      if (ss == 0) { // ---- DC scan
        if (se != 0) inv("DC scan with Se != 0")
        def dcBlock(fi: Int, dcTab: HuffTable, base: Int): Unit =
          if (ah == 0) {
            val s = dcTab.decode(br)
            if (s > 15) inv("bad DC category")
            pred(fi) += br.extend(s)
            coefBufs(fi)(base) = pred(fi) << al
          } else {
            if (br.bit() != 0) coefBufs(fi)(base) |= (1 << al)
          }
        if (ns == 1) {
          val (fi, dct, _) = scanComps(0)
          val dcTab = dcT(dct)
          if (ah == 0 && dcTab == null) inv("missing DC table")
          val (bw, bh) = ownGrid(fi)
          var by = 0
          while (by < bh) {
            var bx = 0
            while (bx < bw) {
              maybeRestart()
              dcBlock(fi, dcTab, (by * padBW(fi) + bx) * 64)
              sinceRestart += 1
              bx += 1
            }
            by += 1
          }
        } else {
          val tabs = scanComps.map { case (fi, dct, _) =>
            val t = dcT(dct)
            if (ah == 0 && t == null) inv("missing DC table")
            (fi, t)
          }
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              maybeRestart()
              var c = 0
              while (c < ns) {
                val (fi, t) = tabs(c)
                val (sh, sv) = (comps(fi)._2, comps(fi)._3)
                var v0 = 0
                while (v0 < sv) {
                  var h0 = 0
                  while (h0 < sh) {
                    dcBlock(fi, t, ((my * sv + v0) * padBW(fi) + mx * sh + h0) * 64)
                    h0 += 1
                  }
                  v0 += 1
                }
                c += 1
              }
              sinceRestart += 1
              mx += 1
            }
            my += 1
          }
        }
      } else { // ---- AC scan
        if (ns != 1 || ss > se || se > 63) inv("bad AC band")
        val (fi, _, act) = scanComps(0)
        val acTab = acT(act)
        if (acTab == null) inv("missing AC table")
        val p1 = 1 << al; val m1 = -(1 << al)
        val buf = coefBufs(fi)
        def refine(idx: Int): Unit =
          if (br.bit() != 0 && (buf(idx) & p1) == 0)
            buf(idx) += (if (buf(idx) >= 0) p1 else m1)
        def acFirstBlock(base: Int): Unit = {
          if (eobrun > 0) { eobrun -= 1; return }
          var k = ss
          while (k <= se) {
            val rs = acTab.decode(br)
            val r = (rs & 0xf0) >> 4; val s = rs & 0x0f
            if (s != 0) {
              k += r
              if (k > se) inv("AC overrun")
              buf(base + zigzag(k)) = br.extend(s) << al
              k += 1
            } else if (r == 15) {
              k += 16 // ZRL
              if (k > se + 1) inv("ZRL overrun")
            } else {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += br.receive(r)
              k = se + 1
            }
          }
        }
        def acRefineBlock(base: Int): Unit = {
          var k = ss
          if (eobrun == 0) {
            var done = false
            while (k <= se && !done) {
              val rs = acTab.decode(br)
              var r = (rs & 0xf0) >> 4
              val s = rs & 0x0f
              var newVal = 0
              if (s == 0) {
                if (r != 15) { // EOBn: rest of this block joins the EOB run
                  eobrun = 1 << r
                  if (r > 0) eobrun += br.receive(r)
                  done = true
                }
                // r == 15: ZRL — skip 16 zero-history slots below
              } else {
                if (s != 1) inv("refinement size != 1")
                newVal = if (br.bit() != 0) p1 else m1
              }
              if (!done) {
                var placed = false
                while (k <= se && !placed) {
                  val idx = base + zigzag(k)
                  if (buf(idx) != 0) refine(idx)
                  else if (r == 0) {
                    if (newVal != 0) buf(idx) = newVal
                    placed = true
                  } else r -= 1
                  k += 1
                }
                if (!placed && newVal != 0) inv("refinement coefficient did not fit")
              }
            }
          }
          if (eobrun > 0) { // EOB region: correction bits for nonzeros only
            while (k <= se) {
              val idx = base + zigzag(k)
              if (buf(idx) != 0) refine(idx)
              k += 1
            }
            eobrun -= 1
          }
        }
        val (bw, bh) = ownGrid(fi)
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            maybeRestart()
            val base = (by * padBW(fi) + bx) * 64
            if (ah == 0) acFirstBlock(base) else acRefineBlock(base)
            sinceRestart += 1
            bx += 1
          }
          by += 1
        }
      }
      // the next marker must start at the very next unread byte (pad bits
      // of a partially-consumed byte are already behind br.pos)
      val pos = br.pos
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff ||
          (b(pos + 1) & 0xff) == 0x00) inv("scan not followed by a marker")
      pos
    }

    while (i + 2 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9) // EOI: finalize a progressive stream, else invalid
        return if (progressive && anyScan) finalizeProgressive() else None
      if (i + 4 > b.length) return None
      val len = be16(b, i + 2)
      val body = i + 4
      if (len < 2 || body + len - 2 > b.length) return None
      var iNext = body + len - 2
      marker match {
        case 0xdb => // DQT: one or more 65/129-byte tables
          val end = body + len - 2
          var p = body
          while (p < end) {
            // a table crossing the declared segment end would read the NEXT
            // segment's bytes as table data — a misdecode with "valid"
            // garbage tables; strict → None (r9 ADVICE)
            if (p + 65 > end) return None
            val pq = (b(p) & 0xf0) >> 4
            val tq = b(p) & 0x0f
            if (pq != 0 || tq > 3) return None // 8-bit tables only
            val t = new Array[Int](64)
            var z = 0
            while (z < 64) { t(zigzag(z)) = b(p + 1 + z) & 0xff; z += 1 }
            qt(tq) = t
            p += 65
          }
          if (p != end) return None // len-2 not a multiple of 65
        case 0xc4 => // DHT: one or more tables
          val end = body + len - 2
          var p = body
          while (p < end) {
            if (p + 17 > end) return None // bits array overruns the segment
            val tc = (b(p) & 0xf0) >> 4
            val th = b(p) & 0x0f
            if (tc > 1 || th > 3) return None
            val bits = (0 until 16).map(j => b(p + 1 + j) & 0xff).toArray
            val n = bits.sum
            if (p + 17 + n > end) return None // values overrun the segment
            val vals = (0 until n).map(j => b(p + 17 + j) & 0xff).toArray
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            p += 17 + n
          }
          if (p != end) return None // trailing bytes after the last table
        case m0 if m0 == 0xc0 || m0 == 0xc2 => // SOF0 baseline / SOF2 progressive
          if (sof) return None // one frame header only
          if ((b(body) & 0xff) != 8) return None // 8-bit precision only
          progressive = m0 == 0xc2
          height = be16(b, body + 1)
          width = be16(b, body + 3)
          val nf = b(body + 5) & 0xff
          if (nf != 1 && nf != 3) return None // grayscale or 3-component color
          comps = Array.tabulate(nf) { c =>
            val cid = b(body + 6 + 3 * c) & 0xff
            val hv = b(body + 7 + 3 * c) & 0xff
            val sh = (hv & 0xf0) >> 4; val sv = hv & 0x0f
            // per-component sampling factors 1..2 cover 4:4:4, 4:2:2 and
            // 4:2:0 (the dominant real-corpus variant, r9 VERDICT #3);
            // factors of 3/4 stay strictly rejected
            if (sh < 1 || sh > 2 || sv < 1 || sv > 2)
              throw new IllegalArgumentException("unsupported sampling factor")
            (cid, sh, sv, b(body + 8 + 3 * c) & 0xff)
          }
          if (nf == 1 && (comps(0)._2 != 1 || comps(0)._3 != 1))
            return None // single-component streams are 1x1 by construction
          if (width <= 0 || height <= 0) return None
          // allocation bound: per-component Int planes (and progressive
          // coefficient buffers) scale with w·h — a crafted 65535×65535
          // header would demand ~17 GB per plane before any entropy data
          // is read. 2^26 pixels (64 Mpx, ~256 MB of plane per component)
          // is far beyond any sane corpus image; strict → None above it.
          if (width.toLong * height > (1L << 26)) return None
          hmax = comps.map(_._2).max
          vmax = comps.map(_._3).max
          mcusX = (width + 8 * hmax - 1) / (8 * hmax)
          mcusY = (height + 8 * vmax - 1) / (8 * vmax)
          padBW = comps.map(c => mcusX * c._2)
          padBH = comps.map(c => mcusY * c._3)
          if (progressive)
            coefBufs = Array.tabulate(comps.length)(fi =>
              new Array[Int](padBW(fi) * padBH(fi) * 64))
          sof = true
        case m if m == 0xc1 || m == 0xc3 ||
                  (m >= 0xc5 && m <= 0xc7) || (m >= 0xc9 && m <= 0xcf) =>
          return None // extended/lossless/arithmetic out of scope
        case 0xdd => // DRI: restart every `ri` MCUs (0 disables)
          if (len != 4) return None
          restartInterval = be16(b, body)
        case 0xda if progressive => // SOS: one of several progressive scans
          if (!sof) return None
          iNext = progressiveScan(body, len)
          anyScan = true
        case 0xda => // SOS: decode the (single) sequential scan
          if (!sof || width <= 0 || height <= 0) return None
          val ns = b(body) & 0xff
          if (ns != comps.length) return None // one interleaved scan only
          // scan components in SOS order, resolved against the frame list
          val order = Array.tabulate(ns) { c =>
            val cid = b(body + 1 + 2 * c) & 0xff
            val fi = comps.indexWhere(_._1 == cid)
            if (fi < 0) throw new IllegalArgumentException("unknown component in SOS")
            val tt = b(body + 2 + 2 * c) & 0xff
            val dc = dcT((tt & 0xf0) >> 4); val ac = acT(tt & 0x0f)
            val q = qt(comps(fi)._4)
            if (dc == null || ac == null || q == null)
              throw new IllegalArgumentException("missing table")
            (fi, dc, ac, q)
          }
          // general interleaved MCU walk (T.81 A.2.3): MCU = h×v blocks per
          // component; per-component planes decode at their NATIVE sampled
          // resolution, padded to whole MCU coverage, and are upsampled to
          // full resolution afterwards
          val hmax = comps.map(_._2).max
          val vmax = comps.map(_._3).max
          val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
          val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
          val compPW = comps.map(c => mcusX * c._2 * 8)
          val compPH = comps.map(c => mcusY * c._3 * 8)
          val padded = Array.tabulate(comps.length)(fi =>
            new Array[Int](compPW(fi) * compPH(fi)))
          val br = new BitReader(b, body + len - 2)
          val coef = new Array[Int](64)
          val pred = new Array[Int](comps.length)
          var mcusSinceRestart = 0
          var rstN = 0
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              // RSTn every `restartInterval` MCUs: byte-align, consume the
              // cycling marker, reset every component's DC predictor
              if (restartInterval > 0 && mcusSinceRestart == restartInterval) {
                br.restart(rstN)
                rstN = (rstN + 1) % 8
                java.util.Arrays.fill(pred, 0)
                mcusSinceRestart = 0
              }
              var c = 0
              while (c < ns) { // h×v blocks per component per MCU
                val (fi, dc, ac, q) = order(c)
                val (sh, sv) = (comps(fi)._2, comps(fi)._3)
                var v0 = 0
                while (v0 < sv) {
                  var h0 = 0
                  while (h0 < sh) {
                    java.util.Arrays.fill(coef, 0)
                    val s = dc.decode(br)
                    if (s > 15) throw new IllegalArgumentException("bad DC category")
                    pred(fi) += br.extend(s)
                    coef(0) = pred(fi) * q(0)
                    var z = 1
                    while (z < 64) {
                      val rs = ac.decode(br)
                      val r = (rs & 0xf0) >> 4
                      val sz = rs & 0x0f
                      if (sz == 0) {
                        if (r == 15) {
                          z += 16 // ZRL: 16 zeros, must leave room for a
                          // following symbol (a terminal zero run is EOB-coded)
                          if (z > 63) throw new IllegalArgumentException("ZRL overrun")
                        } else z = 64 // EOB
                      } else {
                        z += r
                        if (z > 63) throw new IllegalArgumentException("AC overrun")
                        coef(zigzag(z)) = br.extend(sz) * q(zigzag(z))
                        z += 1
                      }
                    }
                    idctBlock(coef, padded(fi), compPW(fi), compPH(fi),
                      (mx * sh + h0) * 8, (my * sv + v0) * 8)
                    h0 += 1
                  }
                  v0 += 1
                }
                c += 1
              }
              mcusSinceRestart += 1
              mx += 1
            }
            my += 1
          }
          return Some((upsamplePlanes(comps, width, height, padded, compPW),
            width, height))
        case m if (m >= 0xe0 && m <= 0xef) || m == 0xfe => () // APPn/COM: skip
        case _ => return None
      }
      i = iNext
    }
    None
  }

  /** Upsample each component to full resolution by sample replication
    * (box filter): pixel (x, y) reads its covering chroma sample at
    * (x·h/hmax, y·v/vmax). For h=v=hmax=vmax this is the identity
    * gather, so 4:4:4/grayscale results are unchanged bit for bit.
    * Shared by the sequential scan and the progressive finalize. */
  private def upsamplePlanes(comps: Array[(Int, Int, Int, Int)],
                             width: Int, height: Int,
                             padded: Array[Array[Int]],
                             compPW: Array[Int]): Array[Array[Int]] = {
    val hmax = comps.map(_._2).max
    val vmax = comps.map(_._3).max
    Array.tabulate(comps.length) { fi =>
      val (sh, sv) = (comps(fi)._2, comps(fi)._3)
      if (sh == hmax && sv == vmax && compPW(fi) == width) padded(fi).take(width * height)
      else {
        val outP = new Array[Int](width * height)
        var yy = 0
        while (yy < height) {
          val srcRow = (yy * sv / vmax) * compPW(fi)
          val dstRow = yy * width
          var xx = 0
          while (xx < width) {
            outP(dstRow + xx) = padded(fi)(srcRow + xx * sh / hmax)
            xx += 1
          }
          yy += 1
        }
        outP
      }
    }
  }

  /** Reference 2-D IDCT (T.81 A.3.3), double precision, with level shift
    * and clamp; writes the block's intersection with the image. O(64·64)
    * per block — correctness-first; at scale the separable/AAN form drops
    * in behind the same contract. */
  private def idctBlock(coef: Array[Int], out: Array[Int],
                        w: Int, h: Int, ox: Int, oy: Int): Unit = {
    var y = 0
    while (y < 8 && oy + y < h) {
      var x = 0
      while (x < 8 && ox + x < w) {
        var sum = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
              val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
              sum += cu * cv * c *
                math.cos((2 * x + 1) * u * math.Pi / 16.0) *
                math.cos((2 * y + 1) * v * math.Pi / 16.0)
            }
            v += 1
          }
          u += 1
        }
        val p = math.round(sum / 4.0 + 128.0).toInt
        out((oy + y) * w + (ox + x)) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------------- encoder

  private final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]
    private var cur = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          buf += cur.toByte
          if (cur == 0xff) buf += 0x00.toByte // byte stuffing
          cur = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Array[Byte] = {
      if (nbits > 0) { // pad with 1s (T.81 F.1.2.3)
        cur = (cur << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        buf += cur.toByte
        if (cur == 0xff) buf += 0x00.toByte
        cur = 0; nbits = 0
      }
      buf.toArray
    }
    /** 1-pad to a byte boundary (STUFFED if the pad byte lands on 0xFF —
      * it is still entropy data the reader loads before aligning), then
      * the raw RSTn marker. */
    def restartMarker(n: Int): Unit = {
      if (nbits > 0) {
        cur = (cur << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        buf += cur.toByte
        if (cur == 0xff) buf += 0x00.toByte
        cur = 0; nbits = 0
      }
      buf += 0xff.toByte
      buf += (0xd0 + n).toByte
    }
  }

  private def category(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Color twin of [[encodeJpegConstBlocks]]: a complete baseline
    * 3-component 4:4:4 JPEG whose 8×8 blocks carry constant (Y, Cb, Cr)
    * given by three payload planes (row-major block order) — interleaved
    * MCUs with per-component DC predictors, unit quant table and the
    * standard Huffman tables for all components. DC-only exactness holds
    * per component, so the decoded YCbCr values equal the payload bytes
    * and the RGB output is the deterministic JFIF conversion of them. */
  def encodeJpegConstBlocksColor(y: Array[Byte], cb: Array[Byte], cr: Array[Byte],
                                 blocksWide: Int, blocksHigh: Int): Array[Byte] = {
    val nB = blocksWide * blocksHigh
    require(blocksWide > 0 && blocksHigh > 0 &&
      y.length == nB && cb.length == nB && cr.length == nB,
      s"plane sizes (${y.length}, ${cb.length}, ${cr.length}) != $blocksWide x $blocksHigh")
    val w = blocksWide * 8; val h = blocksHigh * 8
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(67); u8(0x00) // DQT: table 0, unit steps
    (0 until 64).foreach(_ => u8(1))
    marker(0xc0); u16(8 + 3 * 3) // SOF0: 8-bit, 3 components, all 1x1
    u8(8); u16(h); u16(w); u8(3)
    (1 to 3).foreach { cid => u8(cid); u8(0x11); u8(0) }
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((tc << 4) | 0)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, stdDcBits, stdDcVals)
    dht(1, stdAcBits, stdAcVals)
    marker(0xda); u16(6 + 2 * 3) // SOS: 3 components, DC/AC table 0 each
    u8(3); (1 to 3).foreach { cid => u8(cid); u8(0x00) }
    u8(0); u8(63); u8(0)
    val dcCodes = canonicalCodes(stdDcBits, stdDcVals)
      .map(c => c._1 -> (c._2, c._3)).toMap
    val (eobCode, eobLen) = canonicalCodes(stdAcBits, stdAcVals)
      .collectFirst { case (0x00, c, l) => (c, l) }.get
    val bw = new BitWriter
    val planes = Array(y, cb, cr)
    val pred = new Array[Int](3)
    var blk = 0
    while (blk < nB) { // interleaved MCUs: Y, Cb, Cr per block position
      var c = 0
      while (c < 3) {
        val dc = 8 * ((planes(c)(blk) & 0xff) - 128)
        val diff = dc - pred(c)
        pred(c) = dc
        val s = category(diff)
        val (code, l) = dcCodes(s)
        bw.put(code, l)
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        bw.put(eobCode, eobLen)
        c += 1
      }
      blk += 1
    }
    out.write(bw.flush())
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** 4:2:0 twin of [[encodeJpegConstBlocksColor]] (r9 VERDICT #3): a
    * complete baseline color JPEG with Y sampled 2×2 and Cb/Cr 1×1 — the
    * dominant real-corpus chroma layout. One MCU covers 16×16 pixels:
    * FOUR constant luma blocks (row-major within the MCU) and ONE constant
    * Cb + Cr block each. `y` is the full luma block grid, row-major,
    * (2·mcusWide) × (2·mcusHigh); `cb`/`cr` are the MCU grid, row-major.
    * DC-only exactness holds per coded block, and constant chroma blocks
    * make the decoder's replication upsample exact too, so the decoded
    * YCbCr values equal the payload bytes and the RGB output is the
    * deterministic JFIF conversion — the same oracle seam as the 4:4:4
    * color gate, over a structurally different (subsampled) stream.
    * `restartInterval` counts MCUs, as in [[encodeJpegConstBlocks]]. */
  def encodeJpegConstBlocks420(y: Array[Byte], cb: Array[Byte], cr: Array[Byte],
                               mcusWide: Int, mcusHigh: Int,
                               restartInterval: Int = 0): Array[Byte] = {
    val nM = mcusWide * mcusHigh
    require(mcusWide > 0 && mcusHigh > 0 &&
      y.length == 4 * nM && cb.length == nM && cr.length == nM,
      s"plane sizes (${y.length}, ${cb.length}, ${cr.length}) != 4/1/1 x $mcusWide x $mcusHigh MCUs")
    require(restartInterval >= 0, "restart interval must be >= 0")
    val w = mcusWide * 16; val h = mcusHigh * 16
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(67); u8(0x00) // DQT: table 0, unit steps
    (0 until 64).foreach(_ => u8(1))
    marker(0xc0); u16(8 + 3 * 3) // SOF0: 8-bit, Y 2x2, Cb/Cr 1x1
    u8(8); u16(h); u16(w); u8(3)
    u8(1); u8(0x22); u8(0)
    u8(2); u8(0x11); u8(0)
    u8(3); u8(0x11); u8(0)
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((tc << 4) | 0)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, stdDcBits, stdDcVals)
    dht(1, stdAcBits, stdAcVals)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xda); u16(6 + 2 * 3) // SOS: 3 components, DC/AC table 0 each
    u8(3); (1 to 3).foreach { cid => u8(cid); u8(0x00) }
    u8(0); u8(63); u8(0)
    val dcCodes = canonicalCodes(stdDcBits, stdDcVals)
      .map(c => c._1 -> (c._2, c._3)).toMap
    val (eobCode, eobLen) = canonicalCodes(stdAcBits, stdAcVals)
      .collectFirst { case (0x00, c, l) => (c, l) }.get
    val bw = new BitWriter
    val pred = new Array[Int](3)
    def block(comp: Int, vb: Byte): Unit = {
      val dc = 8 * ((vb & 0xff) - 128)
      val diff = dc - pred(comp)
      pred(comp) = dc
      val s = category(diff)
      val (code, l) = dcCodes(s)
      bw.put(code, l)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      bw.put(eobCode, eobLen)
    }
    var since = 0
    var rstN = 0
    var my = 0
    while (my < mcusHigh) {
      var mx = 0
      while (mx < mcusWide) {
        if (restartInterval > 0 && since == restartInterval) {
          bw.restartMarker(rstN)
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(pred, 0)
          since = 0
        }
        var v0 = 0
        while (v0 < 2) { // four luma blocks, row-major within the MCU
          var h0 = 0
          while (h0 < 2) {
            block(0, y((my * 2 + v0) * (mcusWide * 2) + mx * 2 + h0))
            h0 += 1
          }
          v0 += 1
        }
        block(1, cb(my * mcusWide + mx))
        block(2, cr(my * mcusWide + mx))
        since += 1
        mx += 1
      }
      my += 1
    }
    out.write(bw.flush())
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Progressive-scan AC Huffman table (fixture-encoder side): the
    * baseline Annex-K AC table carries no EOBn (n > 1) symbols —
    * end-of-band RUN codes exist only in progressive streams (T.81
    * G.1.2.2) — so the progressive fixtures declare this tiny canonical
    * table instead: EOB1..EOB16384 (0x00, 0x10 … 0xE0), ZRL (0xF0) and
    * the size-1 run/size symbols 0x01/0x11, all at code length 5. */
  val progAcBits: Array[Int] =
    Array(0, 0, 0, 0, 18, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  val progAcVals: Array[Int] = Array(
    0x00, 0x10, 0x20, 0x30, 0x40, 0x50, 0x60, 0x70,
    0x80, 0x90, 0xa0, 0xb0, 0xc0, 0xd0, 0xe0, 0xf0,
    0x01, 0x11)

  /** PROGRESSIVE (SOF2) twin of [[encodeJpegConstBlocks]] (r9 VERDICT #8):
    * the same constant-block grayscale payload as SIX successive scans —
    * a DC-first scan at Al=4 (Huffman diffs of dc >> 4), four DC
    * refinement scans (one raw bit per block, Al 3→0), and an AC
    * band-1..63 scan coded entirely as EOB runs (every AC is exactly 0
    * for constant blocks). Because dc = 8·(v−128), bits 4..10 vary with
    * the payload, so the refinement scans carry REAL bits — a decoder
    * that drops or mis-ORs them mis-decodes by construction.
    * Reconstruction is exact in two's complement:
    * (dc >> 4) << 4 OR'd with bits 3..0 of dc == dc for every sign.
    * `restartInterval` (in blocks, all scans) exercises per-scan RSTn
    * cycling + EOB-run resets. Decodes bit-identically to the SEQUENTIAL
    * encoding of the same payload — the gate shares the baseline oracle
    * verbatim over a structurally different stream, like the restart
    * gate. */
  def encodeJpegProgressiveConstBlocks(blockBytes: Array[Byte],
                                       blocksWide: Int, blocksHigh: Int,
                                       restartInterval: Int = 0): Array[Byte] = {
    require(blocksWide > 0 && blocksHigh > 0 &&
      blockBytes.length == blocksWide * blocksHigh,
      s"${blockBytes.length} block bytes != $blocksWide x $blocksHigh")
    require(restartInterval >= 0, "restart interval must be >= 0")
    val w = blocksWide * 8; val h = blocksHigh * 8
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(67); u8(0x00) // DQT: table 0, unit steps
    (0 until 64).foreach(_ => u8(1))
    marker(0xc2); u16(11) // SOF2: 8-bit, 1 component, 1x1
    u8(8); u16(h); u16(w); u8(1); u8(1); u8(0x11); u8(0)
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((tc << 4) | 0)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, stdDcBits, stdDcVals)
    dht(1, progAcBits, progAcVals) // AC table 0 = the EOBn-capable table
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    val dcCodes = canonicalCodes(stdDcBits, stdDcVals)
      .map(c => c._1 -> (c._2, c._3)).toMap
    val acCodes = canonicalCodes(progAcBits, progAcVals)
      .map(c => c._1 -> (c._2, c._3)).toMap
    val dcs = blockBytes.map(vb => 8 * ((vb & 0xff) - 128))
    def sos(ss: Int, se: Int, ah: Int, al: Int)(write: BitWriter => Unit): Unit = {
      marker(0xda); u16(8)
      u8(1); u8(1); u8(0x00); u8(ss); u8(se); u8((ah << 4) | al)
      val bw = new BitWriter
      write(bw)
      out.write(bw.flush())
    }
    // scan 1 — DC first at Al=4: Huffman-coded diffs of dc >> 4
    sos(0, 0, 0, 4) { bw =>
      var pred = 0; var since = 0; var rstN = 0
      dcs.foreach { dc =>
        if (restartInterval > 0 && since == restartInterval) {
          bw.restartMarker(rstN); rstN = (rstN + 1) % 8; pred = 0; since = 0
        }
        val v = dc >> 4
        val diff = v - pred; pred = v
        val s = category(diff)
        val (c, l) = dcCodes(s)
        bw.put(c, l)
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        since += 1
      }
    }
    // scans 2–5 — DC refinement, Al = 3, 2, 1, 0: one raw bit per block
    (3 to 0 by -1).foreach { a =>
      sos(0, 0, a + 1, a) { bw =>
        var since = 0; var rstN = 0
        dcs.foreach { dc =>
          if (restartInterval > 0 && since == restartInterval) {
            bw.restartMarker(rstN); rstN = (rstN + 1) % 8; since = 0
          }
          bw.put((dc >> a) & 1, 1)
          since += 1
        }
      }
    }
    // scan 6 — AC band 1..63: all coefficients zero ⇒ pure EOB runs,
    // one run per restart segment (EOB runs may not cross RSTn)
    sos(1, 63, 0, 0) { bw =>
      val total = dcs.length
      var done = 0; var rstN = 0
      while (done < total) {
        val seg =
          if (restartInterval > 0) math.min(restartInterval, total - done)
          else total - done
        var n = seg
        while (n > 0) {
          val run = math.min(n, 32767)
          var r = 0
          while ((1 << (r + 1)) <= run) r += 1 // floor(log2(run))
          val (c, l) = acCodes(r << 4)
          bw.put(c, l)
          if (r > 0) bw.put(run - (1 << r), r)
          n -= run
        }
        done += seg
        if (restartInterval > 0 && done < total) {
          bw.restartMarker(rstN); rstN = (rstN + 1) % 8
        }
      }
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** PROGRESSIVE 4:2:0 COLOR fixture encoder: exercises the one geometry
    * seam unique to subsampled progressive streams — the interleaved DC
    * scan walks the MCU-PADDED grid (mcusX·2 × mcusY·2 luma blocks) while
    * each non-interleaved AC scan walks the component's OWN grid
    * (⌈w/8⌉ × ⌈h/8⌉), which for a width that is not a multiple of 16 is
    * a strict subset. `width`/`height` are arbitrary; `y` is laid out on
    * the luma own grid, `cb`/`cr` on the chroma own grid
    * (⌈⌈w/2⌉/8⌉ × ⌈⌈h/2⌉/8⌉); DC values for padding blocks replicate the
    * clamped edge payload (they decode but never reach the output).
    * Three scans: interleaved DC (Al=0), then one AC EOB-run scan per
    * component. DC-only constant blocks keep decode exact. */
  def encodeJpegProgressive420(y: Array[Byte], cb: Array[Byte], cr: Array[Byte],
                               width: Int, height: Int): Array[Byte] = {
    val mcusX = (width + 15) / 16; val mcusY = (height + 15) / 16
    val yBW = (width + 7) / 8; val yBH = (height + 7) / 8
    val cW = (width + 1) / 2; val cH = (height + 1) / 2
    val cBW = (cW + 7) / 8; val cBH = (cH + 7) / 8
    require(width > 0 && height > 0 && y.length == yBW * yBH &&
      cb.length == cBW * cBH && cr.length == cBW * cBH,
      s"plane sizes (${y.length}, ${cb.length}, ${cr.length}) != own grids ($yBW x $yBH, $cBW x $cBH)")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    marker(0xdb); u16(67); u8(0x00) // DQT: table 0, unit steps
    (0 until 64).foreach(_ => u8(1))
    marker(0xc2); u16(8 + 3 * 3) // SOF2: Y 2x2, Cb/Cr 1x1
    u8(8); u16(height); u16(width); u8(3)
    u8(1); u8(0x22); u8(0)
    u8(2); u8(0x11); u8(0)
    u8(3); u8(0x11); u8(0)
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((tc << 4) | 0)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, stdDcBits, stdDcVals)
    dht(1, progAcBits, progAcVals)
    val dcCodes = canonicalCodes(stdDcBits, stdDcVals)
      .map(c => c._1 -> (c._2, c._3)).toMap
    val acCodes = canonicalCodes(progAcBits, progAcVals)
      .map(c => c._1 -> (c._2, c._3)).toMap
    def dcOf(vb: Byte): Int = 8 * ((vb & 0xff) - 128)
    // scan 1 — interleaved DC over the padded MCU grid
    marker(0xda); u16(6 + 2 * 3)
    u8(3); (1 to 3).foreach { cid => u8(cid); u8(0x00) }
    u8(0); u8(0); u8(0x00) // Ss=0 Se=0 Ah=0 Al=0
    locally {
      val bw = new BitWriter
      val pred = new Array[Int](3)
      def put(comp: Int, dc: Int): Unit = {
        val diff = dc - pred(comp); pred(comp) = dc
        val s = category(diff)
        val (c, l) = dcCodes(s)
        bw.put(c, l)
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var v0 = 0
          while (v0 < 2) {
            var h0 = 0
            while (h0 < 2) { // padding blocks replicate the clamped edge
              val by = math.min(my * 2 + v0, yBH - 1)
              val bx = math.min(mx * 2 + h0, yBW - 1)
              put(0, dcOf(y(by * yBW + bx)))
              h0 += 1
            }
            v0 += 1
          }
          put(1, dcOf(cb(math.min(my, cBH - 1) * cBW + math.min(mx, cBW - 1))))
          put(2, dcOf(cr(math.min(my, cBH - 1) * cBW + math.min(mx, cBW - 1))))
          mx += 1
        }
        my += 1
      }
      out.write(bw.flush())
    }
    // scans 2–4 — per-component AC band 1..63: EOB run over the OWN grid
    (1 to 3).foreach { cid =>
      marker(0xda); u16(8)
      u8(1); u8(cid); u8(0x00); u8(1); u8(63); u8(0x00)
      val bw = new BitWriter
      var n = if (cid == 1) yBW * yBH else cBW * cBH
      while (n > 0) {
        val run = math.min(n, 32767)
        var r = 0
        while ((1 << (r + 1)) <= run) r += 1
        val (c, l) = acCodes(r << 4)
        bw.put(c, l)
        if (r > 0) bw.put(run - (1 << r), r)
        n -= run
      }
      out.write(bw.flush())
    }
    marker(0xd9)
    out.toByteArray
  }

  /** Gate/fixture encoder (the operators only DECODE): a complete baseline
    * grayscale JPEG whose 8×8 blocks are each the constant gray given by
    * one payload byte (row-major block order), unit quant table, standard
    * Annex-K Huffman tables, REAL entropy coding (DC diff categories,
    * EOB per block, byte stuffing) — the DC-only construction the class
    * doc proves decodes back to the payload exactly. */
  def encodeJpegConstBlocks(blockBytes: Array[Byte], blocksWide: Int,
                            blocksHigh: Int,
                            restartInterval: Int = 0): Array[Byte] = {
    require(blocksWide > 0 && blocksHigh > 0 &&
      blockBytes.length == blocksWide * blocksHigh,
      s"${blockBytes.length} block bytes != $blocksWide x $blocksHigh")
    require(restartInterval >= 0, "restart interval must be >= 0")
    val w = blocksWide * 8; val h = blocksHigh * 8
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(67); u8(0x00) // DQT: table 0, unit steps
    (0 until 64).foreach(_ => u8(1))
    marker(0xc0); u16(11) // SOF0: 8-bit, 1 component, 1x1
    u8(8); u16(h); u16(w); u8(1); u8(1); u8(0x11); u8(0)
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((tc << 4) | 0)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, stdDcBits, stdDcVals)
    dht(1, stdAcBits, stdAcVals)
    if (restartInterval > 0) { // DRI: restart every N MCUs
      marker(0xdd); u16(4); u16(restartInterval)
    }
    marker(0xda); u16(8) // SOS
    u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    val dcCodes = canonicalCodes(stdDcBits, stdDcVals)
      .map(c => c._1 -> (c._2, c._3)).toMap
    val (eobCode, eobLen) = canonicalCodes(stdAcBits, stdAcVals)
      .collectFirst { case (0x00, c, l) => (c, l) }.get
    val bw = new BitWriter
    var pred = 0
    var since = 0
    var rstN = 0
    blockBytes.foreach { vb =>
      if (restartInterval > 0 && since == restartInterval) {
        bw.restartMarker(rstN) // byte-align + RSTn, DC predictor resets
        rstN = (rstN + 1) % 8
        pred = 0
        since = 0
      }
      val dc = 8 * ((vb & 0xff) - 128) // exact DC-only coefficient
      val diff = dc - pred
      pred = dc
      val s = category(diff)
      val (c, l) = dcCodes(s)
      bw.put(c, l)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      bw.put(eobCode, eobLen) // all AC zero
      since += 1
    }
    out.write(bw.flush())
    marker(0xd9) // EOI
    out.toByteArray
  }
}
