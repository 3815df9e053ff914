package graft.multimodal

/** Pure-JVM PNG codec (r9 VERDICT #8 stretch): the second-most-common web
  * image format off the stub path with zero codec libraries — DEFLATE is
  * pure-JVM-reachable through `java.util.zip` (Inflater/Deflater/CRC32,
  * public JDK API).
  *
  * Scope: 8-bit greyscale (color type 0) and truecolor RGB (color type 2),
  * non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth,
  * RFC 2083 §6), CRC-32-validated chunks, multi-IDAT concatenation.
  * Strict → None, never a misdecode: palette (type 3), alpha (types 4/6),
  * bit depths ≠ 8, Adam7 interlace, CRC mismatch, inflated size ≠
  * scanline size, unknown CRITICAL chunks, trailing bytes after IEND.
  *
  * Unlike the JPEG tier, PNG is LOSSLESS — no DC-only exactness seam is
  * needed: decode(encode(pixels)) == pixels for every payload, so the
  * gate pins the full decoded buffer against the oracle's payload bytes
  * directly in hex space. The decoder is additionally golden-fixture-
  * pinned in MultimodalSpec against hand-assembled chunks with
  * hand-FILTERED scanlines (every filter type), so encoder/decoder bugs
  * cannot cancel.
  *
  * Reference anchor: the reference repo has no media tier (local_db.py is
  * text+vector only) — this extends the beyond-reference training-data
  * surface, same contract as [[Codecs.decodePpm]]/[[Jpeg]].
  */
object Png {

  /** Decoded image: `channels` ∈ {1 (gray), 3 (RGB)}, row-major,
    * interleaved samples. */
  final case class PngImage(pixels: Array[Byte], width: Int, height: Int,
                            channels: Int)

  private val SIG: Array[Byte] =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
    ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  def decodePng(bytes: Array[Byte]): Option[PngImage] = try {
    if (bytes.length < 8 + 12 || !bytes.take(8).sameElements(SIG)) return None
    var p = 8
    var width = 0; var height = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      if (p + 12 > bytes.length) return None
      val len = be32(bytes, p).toInt
      if (len < 0 || p + 12 + len > bytes.length) return None
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, p + 4, 4 + len) // CRC covers type + data (RFC 2083 §3.4)
      if (crc.getValue != be32(bytes, p + 8 + len)) return None
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          width = be32(bytes, p + 8).toInt
          height = be32(bytes, p + 12).toInt
          val bitDepth = bytes(p + 16) & 0xff
          val colorType = bytes(p + 17) & 0xff
          val compression = bytes(p + 18) & 0xff
          val filterMethod = bytes(p + 19) & 0xff
          val interlace = bytes(p + 20) & 0xff
          if (width <= 0 || height <= 0 || bitDepth != 8 ||
              compression != 0 || filterMethod != 0 || interlace != 0) return None
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case _ => return None // palette/alpha out of scope, strict
          }
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, p + 8, len)
        case "IEND" =>
          if (!seenIhdr || len != 0) return None
          seenIend = true
        case t if t.nonEmpty && t(0) >= 'a' && t(0) <= 'z' =>
          () // ancillary chunk (lowercase first letter): skip by contract
        case _ => return None // unknown CRITICAL chunk, strict
      }
      p += 12 + len
    }
    if (p != bytes.length) return None // trailing bytes after IEND
    // zlib inflate of the concatenated IDAT stream; the output MUST be
    // exactly height filtered scanlines of (1 + width·channels) bytes.
    // ALLOCATION BOUND before trusting the header (a 16-byte file must
    // not demand exabytes): DEFLATE expands at most 1032:1, so scanlines
    // that could never come out of this IDAT reject up front. All size
    // math in Long FIRST — width·channels at Int width 1431655766×3
    // would wrap positive and sneak past the bound (round-10 review).
    val strideL = width.toLong * channels
    val need = (1L + strideL) * height
    if (need > idat.size.toLong * 1032L + 256L || need > Int.MaxValue - 8)
      return None
    val stride = strideL.toInt
    val raw = new Array[Byte]((1 + stride) * height)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // needsDictionary: zlib FDICT — forbidden in PNG (RFC 2083 §2.2)
        // and inflate would otherwise return 0 forever without needing
        // input: an infinite loop, not a None (round-10 review)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      if (off != raw.length) return None
      if (!inf.finished()) { // stream holds MORE than the scanlines
        val extra = new Array[Byte](1)
        if (inf.inflate(extra, 0, 1) != 0 || !inf.finished()) return None
      }
      if (inf.getRemaining != 0) return None // bytes after the zlib stream
    } finally inf.end()
    // defilter (RFC 2083 §6.3–6.9): a/b/c are RECONSTRUCTED neighbors
    val bpp = channels
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val f = raw(y * (stride + 1)) & 0xff
      if (f > 4) return None
      val rowOff = y * (stride + 1) + 1
      val outOff = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + x) & 0xff
        val a = if (x >= bpp) out(outOff + x - bpp) & 0xff else 0
        val b = if (y > 0) out(outOff - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) out(outOff - stride + x - bpp) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 => // Paeth predictor
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        out(outOff + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(PngImage(out, width, height, channels))
  } catch { case _: Exception => None }

  /** Gate/fixture encoder (the operators only DECODE): a complete
    * non-interlaced 8-bit PNG — filter-0 scanlines, one zlib-deflated
    * IDAT, CRC-32 per chunk. `channels` 1 (gray) or 3 (RGB). Lossless,
    * so decode(encode(pixels)) == pixels for EVERY payload — no
    * constant-block construction needed. */
  def encodePng(pixels: Array[Byte], width: Int, height: Int,
                channels: Int): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels not in {1, 3}")
    require(width > 0 && height > 0 && pixels.length == width * height * channels,
      s"${pixels.length} bytes != $width x $height x $channels")
    val stride = width * channels
    val raw = new Array[Byte]((1 + stride) * height)
    var y = 0
    while (y < height) { // filter byte 0 + the literal scanline
      System.arraycopy(pixels, y * stride, raw, y * (1 + stride) + 1, stride)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val compBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) compBuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(SIG, 0, SIG.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def w32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      w32(data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      w32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    def p32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >> 24) & 0xff).toByte; ihdr(off + 1) = ((v >> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >> 8) & 0xff).toByte; ihdr(off + 3) = (v & 0xff).toByte
    }
    p32(0, width); p32(4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (channels == 1) 0 else 2).toByte // color type
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, filter 0, no interlace
    chunk("IHDR", ihdr)
    chunk("IDAT", compBuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
