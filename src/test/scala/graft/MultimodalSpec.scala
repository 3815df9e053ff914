package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docsDf = {
    import spark.implicits._
    Seq(
      (0L, "a" * 700),   // 3 frames (256+256+188)
      (1L, "short doc"),
      (2L, "b" * 256))   // exactly 1 frame
      .toDF("doc_id", "text")
  }

  test("packDocuments: binary payload + typed metadata, schema as declared") {
    val assets = Multimodal.packDocuments(docsDf, "doc_id", "text").collect()
    assert(assets.length == 3)
    val a0 = assets.find(_.id == 0L).get
    assert(a0.bytes.length == 700 && a0.kind == "image")
    assert(a0.width == 700 % 64 + 1 && a0.height == 700 / 64 + 1)
  }

  test("imageFeatures: md5 matches an independent digest; narrow output") {
    val feats = Multimodal.imageFeatures(
      Multimodal.packDocuments(docsDf, "doc_id", "text"))
      .collect().map(f => f.id -> f).toMap
    assert(feats(1L).n_bytes == 9L)
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("short doc".getBytes("UTF-8")).map(x => f"$x%02x").mkString
    assert(feats(1L).fp == want)
  }

  test("sampleFrames: every 2nd fixed-size frame, tail frame truncated") {
    val frames = Multimodal.sampleFrames(
      Multimodal.packDocuments(docsDf, "doc_id", "text"), every = 2)
      .collect().groupBy(_.id)
    // 700 bytes → frames 0,1,2 → sampled 0,2
    assert(frames(0L).map(_.frame_idx).sorted.sameElements(Seq(0, 2)))
    // 9 bytes → frame 0 only
    assert(frames(1L).map(_.frame_idx).sameElements(Seq(0)))
    // 256 bytes → exactly one frame
    assert(frames(2L).map(_.frame_idx).sameElements(Seq(0)))
    // frame 2 of doc 0 is the 188-byte tail
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(("a" * 188).getBytes("UTF-8")).map(x => f"$x%02x").mkString
    assert(frames(0L).find(_.frame_idx == 2).get.frame_fp == want)
  }

  test("resize: stride-sampled fingerprint, bounded output size, stride math") {
    val rs = Multimodal.resize(
      Multimodal.packDocuments(docsDf, "doc_id", "text"), tw = 8, th = 8)
      .collect().map(r => r.id -> r).toMap
    // doc 0: len 700, target 64 -> k = ceil(700/64) = 11, n = ceil(700/11) = 64
    assert(rs(0L).n_sampled == 64 && rs(0L).out_w == 8 && rs(0L).out_h == 8)
    // doc 1: len 9 < target -> k = 1, identity sample of all 9 bytes
    assert(rs(1L).n_sampled == 9)
    val text = "short doc"
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map(x => f"$x%02x").mkString
    assert(rs(1L).resized_fp == expected)
    // constant input -> constant samples: doc 2 is 256 x 'b', k=4, n=64
    assert(rs(2L).n_sampled == 64)
    val bs = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.fill(64)('b'.toByte)).map(x => f"$x%02x").mkString
    assert(rs(2L).resized_fp == bs)
  }

  test("PPM golden fixture: hand-written P6 bytes decode to the exact pixels") {
    import graft.multimodal.Codecs
    val pixels = Array[Byte](0x00, 0x7f, -1, 0x10, 0x20, 0x30)
    val golden = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ pixels
    val img = Codecs.decodePpm(golden).get
    assert(img.width == 2 && img.height == 1)
    assert(img.pixels.sameElements(pixels))
    // the gate-side encoder reproduces the hand-written bytes exactly —
    // an encoder/decoder bug pair cannot cancel against this fixture
    assert(Codecs.encodePpm(pixels, 2, 1).sameElements(golden))
    // comments and flexible whitespace in the header
    val commented = "P6 # a comment\n2\t1 # another\n255\n".getBytes("US-ASCII") ++ pixels
    val img2 = Codecs.decodePpm(commented).get
    assert(img2.width == 2 && img2.height == 1 && img2.pixels.sameElements(pixels))
    // strictness: truncated payload, wrong magic, 16-bit maxval all reject
    assert(Codecs.decodePpm(golden.dropRight(1)).isEmpty)
    assert(Codecs.decodePpm("P5\n2 1\n255\n".getBytes("US-ASCII") ++ pixels).isEmpty)
    assert(Codecs.decodePpm(("P6\n1 1\n65535\n".getBytes("US-ASCII") ++
      Array.fill[Byte](6)(1))).isEmpty)
  }

  test("JPEG golden fixture: hand-assembled baseline bitstream decodes to the exact pixels") {
    import graft.multimodal.Jpeg
    // Hand-built headers: SOI, DQT (unit steps), SOF0 16x8 grayscale,
    // std DC/AC DHTs, SOS — independent of the encoder's writer.
    def headers(w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u8(v: Int): Unit = out.write(v & 0xff)
      def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
      u8(0xff); u8(0xd8)                       // SOI
      u8(0xff); u8(0xdb); u16(67); u8(0x00)    // DQT table 0
      (0 until 64).foreach(_ => u8(1))
      u8(0xff); u8(0xc0); u16(11)              // SOF0
      u8(8); u16(h); u16(w); u8(1); u8(1); u8(0x11); u8(0)
      u8(0xff); u8(0xc4); u16(2 + 17 + Jpeg.stdDcVals.length); u8(0x00)
      Jpeg.stdDcBits.foreach(u8(_)); Jpeg.stdDcVals.foreach(u8(_))
      u8(0xff); u8(0xc4); u16(2 + 17 + Jpeg.stdAcVals.length); u8(0x10)
      Jpeg.stdAcBits.foreach(u8(_)); Jpeg.stdAcVals.foreach(u8(_))
      u8(0xff); u8(0xda); u16(8)               // SOS
      u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
      out.toByteArray
    }
    // Two DC-only blocks, v=130 then v=120. Hand-coded entropy bits:
    //   DC1 diff = 8*(130-128) = 16  -> cat 5: code 110 + 10000; EOB 1010
    //   DC2 diff = -64 - 16   = -80  -> cat 7: code 11110 + 0101111; EOB 1010
    //   = 11010000 10101111 00101111 1010+1111(pad) = D0 AF 2F AF
    val golden = headers(16, 8) ++
      Array(0xd0, 0xaf, 0x2f, 0xaf, 0xff, 0xd9).map(_.toByte)
    val img = Jpeg.decodeJpeg(golden).get
    assert(img.width == 16 && img.height == 8)
    (0 until 8).foreach { y =>
      (0 until 16).foreach { x =>
        val want = if (x < 8) 130 else 120
        assert((img.pixels(y * 16 + x) & 0xff) == want, s"($x,$y)")
      }
    }
    // the gate-side encoder reproduces the hand-assembled stream exactly —
    // an encoder/decoder bug pair cannot cancel against this fixture
    assert(Jpeg.encodeJpegConstBlocks(Array(130.toByte, 120.toByte), 2, 1)
      .sameElements(
        // encoder adds an APP0/JFIF segment after SOI; splice it in
        golden.take(2) ++
        Array(0xff, 0xe0, 0, 16).map(_.toByte) ++ "JFIF".getBytes("US-ASCII") ++
        Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++ golden.drop(2)))
    // Nonzero-AC fixture: one block, DC cat 0 (code 00), then AC rs=0x02
    // (code 01) value 3 (bits 11) at zigzag 1, EOB 1010:
    //   00 01 11 1010 + pad 11 = 00011110 10111111 = 1E BF
    val acGolden = headers(8, 8) ++ Array(0x1e, 0xbf, 0xff, 0xd9).map(_.toByte)
    val acImg = Jpeg.decodeJpeg(acGolden).get
    // independently-written reference IDCT: F(u=1,v=0) = 3, all else 0
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        val expect = math.round(
          (1.0 / math.sqrt(2.0)) * 3.0 *
            math.cos((2 * x + 1) * math.Pi / 16.0) / 4.0 + 128.0).toInt
        assert((acImg.pixels(y * 8 + x) & 0xff) == expect, s"AC ($x,$y)")
      }
    }
    // strictness: progressive SOF2, multi-component, truncated scan reject
    val prog = golden.clone(); prog(headers(16, 8).indexOf(0xc0.toByte, 2)) = 0xc2.toByte
    assert(Jpeg.decodeJpeg(prog).isEmpty)
    assert(Jpeg.decodeJpeg(golden.dropRight(3)).isEmpty)
  }

  test("JPEG malformed DQT/DHT segments reject; well-formed extras decode (r9 ADVICE)") {
    import graft.multimodal.Jpeg
    val enc = Jpeg.encodeJpegConstBlocks(Array(130.toByte), 1, 1)
    def seg(marker: Int, body: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        (((body.length + 2) >> 8) & 0xff).toByte,
        ((body.length + 2) & 0xff).toByte) ++ body
    // (a) DQT whose declared body is 66 bytes — NOT a multiple of 65; the
    // outer length matches the actual bytes, so only the segment-internal
    // consistency check can catch it (the old parser read one byte of the
    // next segment as a second table header)
    val badDqt = enc.take(2) ++
      seg(0xdb, Array.fill[Byte](66)(1).updated(0, 0x01.toByte)) ++ enc.drop(2)
    assert(Jpeg.decodeJpeg(badDqt).isEmpty)
    // (b) DHT whose bits array claims 5 more values than the segment holds
    // (outer length consistent with the actual byte count)
    val dhtBody = Array(0x02.toByte) ++
      Jpeg.stdDcBits.map(_.toByte) ++ Jpeg.stdDcVals.map(_.toByte)
    dhtBody(1) = (dhtBody(1) + 5).toByte
    val badDht = enc.take(2) ++ seg(0xc4, dhtBody) ++ enc.drop(2)
    assert(Jpeg.decodeJpeg(badDht).isEmpty)
    // control: WELL-FORMED extra tables in unused slots still decode — the
    // rejections above are the consistency checks, not extra-segment allergy
    val okDqt = enc.take(2) ++
      seg(0xdb, Array.fill[Byte](65)(1).updated(0, 0x01.toByte)) ++ enc.drop(2)
    val okImg = Jpeg.decodeJpeg(okDqt)
    assert(okImg.isDefined && (okImg.get.pixels(0) & 0xff) == 130)
  }

  test("JPEG roundtrip: constant-block encode/decode is bit-exact for every byte value") {
    import graft.multimodal.Jpeg
    // all-corners payload: extremes and a mid-range walk, 4x3 blocks
    val payload = Array(0, 255, 128, 1, 254, 127, 129, 42, 200, 13, 77, 250)
      .map(_.toByte)
    val enc = Jpeg.encodeJpegConstBlocks(payload, 4, 3)
    val img = Jpeg.decodeJpeg(enc).get
    assert(img.width == 32 && img.height == 24)
    // every pixel of block (bx, by) equals payload(by*4 + bx)
    (0 until 24).foreach { y =>
      (0 until 32).foreach { x =>
        val want = payload((y / 8) * 4 + x / 8) & 0xff
        assert((img.pixels(y * 32 + x) & 0xff) == want, s"($x,$y)")
      }
    }
  }

  test("JPEG restart intervals: DRI + cycling RSTn + predictor resets roundtrip bit-exact") {
    import graft.multimodal.Jpeg
    // 7 blocks, interval 2 -> RST0..RST2 after blocks 2/4/6, final segment
    // of one block with NO trailing marker; values chosen so predictor
    // resets change the DC diffs (a decoder that fails to reset mis-decodes
    // every block after the first marker)
    val payload = Array(200, 10, 250, 0, 128, 255, 77).map(_.toByte)
    val enc = Jpeg.encodeJpegConstBlocks(payload, 7, 1, restartInterval = 2)
    val plain = Jpeg.encodeJpegConstBlocks(payload, 7, 1)
    assert(!enc.sameElements(plain), "restart stream must differ from the plain one")
    val img = Jpeg.decodeJpeg(enc).get
    assert(img.width == 56 && img.height == 8)
    (0 until 8).foreach { y =>
      (0 until 56).foreach { x =>
        assert((img.pixels(y * 56 + x) & 0xff) == (payload(x / 8) & 0xff), s"($x,$y)")
      }
    }
    // a wrong-sequence restart marker rejects (markers cycle RST0..RST7)
    val broken = enc.clone()
    val rst0 = broken.indexOfSlice(Seq(0xff.toByte, 0xd0.toByte))
    assert(rst0 > 0)
    broken(rst0 + 1) = 0xd5.toByte
    assert(Jpeg.decodeJpeg(broken).isEmpty)
  }

  test("JPEG color roundtrip: 4:4:4 constant blocks decode to the exact JFIF RGB conversion") {
    import graft.multimodal.Jpeg
    val y = Array(0, 255, 128, 30, 200, 99).map(_.toByte)
    val cb = Array(128, 0, 255, 77, 128, 10).map(_.toByte)
    val cr = Array(128, 255, 0, 200, 128, 250).map(_.toByte)
    val enc = Jpeg.encodeJpegConstBlocksColor(y, cb, cr, 3, 2)
    val img = Jpeg.decodeJpegRgb(enc).get
    assert(img.width == 24 && img.height == 16)
    def cl(v: Double) = math.max(0, math.min(255, math.floor(v + 0.5).toInt))
    for (py <- 0 until 16; px <- 0 until 24) {
      val b = (py / 8) * 3 + px / 8
      val (yy, cbb, crr) = (y(b) & 0xff, cb(b) & 0xff, cr(b) & 0xff)
      val i = 3 * (py * 24 + px)
      assert((img.pixels(i) & 0xff) == cl(yy + 1.402 * (crr - 128)), s"R($px,$py)")
      assert((img.pixels(i + 1) & 0xff) ==
        cl(yy - 0.344136 * (cbb - 128) - 0.714136 * (crr - 128)), s"G($px,$py)")
      assert((img.pixels(i + 2) & 0xff) == cl(yy + 1.772 * (cbb - 128)), s"B($px,$py)")
    }
    // strict API split: the gray decoder refuses color streams and the
    // color decoder refuses grayscale ones — no silent channel guessing
    assert(Jpeg.decodeJpeg(enc).isEmpty)
    assert(Jpeg.decodeJpegRgb(
      Jpeg.encodeJpegConstBlocks(Array(10.toByte), 1, 1)).isEmpty)
  }

  test("JPEG 4:2:0 roundtrip: subsampled MCUs + replication upsample decode exactly (r9 VERDICT #3)") {
    import graft.multimodal.Jpeg
    // 3x2 MCUs (48x32 px): distinct per-luma-block AND per-chroma values so
    // a block-order or upsample-siting bug shifts pixels visibly
    val mcusW = 3; val mcusH = 2
    val y = Array.tabulate(4 * mcusW * mcusH)(i => ((i * 37 + 11) % 256).toByte)
    val cb = Array.tabulate(mcusW * mcusH)(i => ((i * 53 + 7) % 256).toByte)
    val cr = Array.tabulate(mcusW * mcusH)(i => ((i * 71 + 140) % 256).toByte)
    val enc = Jpeg.encodeJpegConstBlocks420(y, cb, cr, mcusW, mcusH)
    val img = Jpeg.decodeJpegRgb(enc).get
    assert(img.width == 48 && img.height == 32)
    def cl(v: Double) = math.max(0, math.min(255, math.floor(v + 0.5).toInt))
    for (py <- 0 until 32; px <- 0 until 48) {
      val lumaBlock = (py / 8) * (mcusW * 2) + px / 8 // full luma block grid
      val mcu = (py / 16) * mcusW + px / 16
      val (yy, cbb, crr) = (y(lumaBlock) & 0xff, cb(mcu) & 0xff, cr(mcu) & 0xff)
      val i = 3 * (py * 48 + px)
      assert((img.pixels(i) & 0xff) == cl(yy + 1.402 * (crr - 128)), s"R($px,$py)")
      assert((img.pixels(i + 1) & 0xff) ==
        cl(yy - 0.344136 * (cbb - 128) - 0.714136 * (crr - 128)), s"G($px,$py)")
      assert((img.pixels(i + 2) & 0xff) == cl(yy + 1.772 * (cbb - 128)), s"B($px,$py)")
    }
    // restart intervals compose with subsampling: same payloads, interval 2
    // (RSTn after every 2nd 6-block MCU), identical decode
    val encR = Jpeg.encodeJpegConstBlocks420(y, cb, cr, mcusW, mcusH, restartInterval = 2)
    assert(!encR.sameElements(enc))
    assert(Jpeg.decodeJpegRgb(encR).get.pixels.sameElements(img.pixels))
    // gray decoder still refuses color; sampling factors > 2 stay rejected
    assert(Jpeg.decodeJpeg(enc).isEmpty)
    val bad = enc.clone()
    val sof = bad.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    // FF C0 len2 prec h2 w2 nf | cid hv tq ... -> Y's h/v byte at +11
    assert((bad(sof + 11) & 0xff) == 0x22)
    bad(sof + 11) = 0x33.toByte
    assert(Jpeg.decodeJpegRgb(bad).isEmpty)
  }

  test("JPEG progressive (SOF2): successive-approximation scans decode bit-exact (r9 VERDICT #8)") {
    import graft.multimodal.Jpeg
    // (1) encoder roundtrip: six scans (DC@Al=4, four DC refinements, AC
    // EOB runs) decode identically to the SEQUENTIAL stream of the same
    // payload — extremes, mid-walk, 4x3 blocks
    val payload = Array(0, 255, 128, 1, 254, 127, 129, 42, 200, 13, 77, 250)
      .map(_.toByte)
    val prog = Jpeg.encodeJpegProgressiveConstBlocks(payload, 4, 3)
    val seq = Jpeg.encodeJpegConstBlocks(payload, 4, 3)
    assert(!prog.sameElements(seq))
    val a = Jpeg.decodeJpeg(prog).get
    val b = Jpeg.decodeJpeg(seq).get
    assert(a.width == 32 && a.height == 24 && a.pixels.sameElements(b.pixels))
    // restart markers cycle within EVERY scan (and reset the EOB run)
    val progR = Jpeg.encodeJpegProgressiveConstBlocks(payload, 4, 3, restartInterval = 5)
    assert(!progR.sameElements(prog))
    assert(Jpeg.decodeJpeg(progR).get.pixels.sameElements(b.pixels))
    // truncation (no EOI) rejects — a progressive stream finalizes at EOI
    assert(Jpeg.decodeJpeg(prog.dropRight(2)).isEmpty)

    // (2) hand-assembled AC successive approximation: one block, DC 0, one
    // AC coefficient introduced at Al=1 then refined to 3 at Al=0 —
    // checked against the independently-written reference IDCT
    val hdr = {
      val out = new java.io.ByteArrayOutputStream()
      def u8(v: Int): Unit = out.write(v & 0xff)
      def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
      u8(0xff); u8(0xd8)
      u8(0xff); u8(0xdb); u16(67); u8(0x00)
      (0 until 64).foreach(_ => u8(1))
      u8(0xff); u8(0xc2); u16(11) // SOF2 8x8 grayscale
      u8(8); u16(8); u16(8); u8(1); u8(1); u8(0x11); u8(0)
      u8(0xff); u8(0xc4); u16(2 + 17 + Jpeg.stdDcVals.length); u8(0x00)
      Jpeg.stdDcBits.foreach(u8(_)); Jpeg.stdDcVals.foreach(u8(_))
      u8(0xff); u8(0xc4); u16(2 + 17 + Jpeg.progAcVals.length); u8(0x10)
      Jpeg.progAcBits.foreach(u8(_)); Jpeg.progAcVals.foreach(u8(_))
      out.toByteArray
    }
    def sosSeg(ss: Int, se: Int, ahal: Int, entropy: Array[Byte]): Array[Byte] =
      Array(0xff, 0xda, 0, 8, 1, 1, 0x00, ss, se, ahal).map(_.toByte) ++ entropy
    val handProg = hdr ++
      // DC scan Al=0: diff 0 -> category 0, std DC code '00', pad 111111
      sosSeg(0, 0, 0x00, Array(0x3f.toByte)) ++
      // AC first Ss=1 Se=63 Al=1: rs 0x01 = canonical code 10000 (the 17th
      // progAc symbol), magnitude bit 1 (value 1 -> coef 1<<1 = 2), then
      // EOB1 = 00000: bits 10000 1 00000 + pad -> 0x84 0x0F
      sosSeg(1, 63, 0x01, Array(0x84.toByte, 0x0f.toByte)) ++
      // AC refine Ah=1 Al=0: EOB1 (00000) then ONE correction bit 1 for
      // the nonzero coef (2 -> 3): bits 00000 1 + pad 11 -> 0x07
      sosSeg(1, 63, 0x10, Array(0x07.toByte)) ++
      Array(0xff.toByte, 0xd9.toByte)
    val img = Jpeg.decodeJpeg(handProg).get
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        val expect = math.round(
          (1.0 / math.sqrt(2.0)) * 3.0 *
            math.cos((2 * x + 1) * math.Pi / 16.0) / 4.0 + 128.0).toInt
        assert((img.pixels(y * 8 + x) & 0xff) == expect, s"AC ($x,$y)")
      }
    }
    // a decoder that loses the refinement scan would decode coef 2, not 3:
    // prove the refinement scan is load-bearing by dropping it
    val noRefine = hdr ++
      sosSeg(0, 0, 0x00, Array(0x3f.toByte)) ++
      sosSeg(1, 63, 0x01, Array(0x84.toByte, 0x0f.toByte)) ++
      Array(0xff.toByte, 0xd9.toByte)
    val img2 = Jpeg.decodeJpeg(noRefine).get
    assert(!img2.pixels.sameElements(img.pixels))
  }

  test("JPEG 4:2:2 golden fixture: hand-assembled subsampled MCU decodes to the exact pixels") {
    import graft.multimodal.Jpeg
    // 16x8, Y sampled 2x1 (one MCU: Y0, Y1, Cb, Cr) — hand-coded DC-only
    // entropy: Y0=130 (dc 16, cat5: 110+10000), Y1=120 (diff -80, cat7:
    // 11110+0101111), Cb=144 (dc 128, cat8: 111110+10000000), Cr=112
    // (dc -128, cat8: 111110+01111111), EOB 1010 after each = 64 bits
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u8(0xff); u8(0xd8)
    u8(0xff); u8(0xdb); u16(67); u8(0x00)
    (0 until 64).foreach(_ => u8(1))
    u8(0xff); u8(0xc0); u16(8 + 9) // SOF0: Y 2x1, Cb/Cr 1x1
    u8(8); u16(8); u16(16); u8(3)
    u8(1); u8(0x21); u8(0)
    u8(2); u8(0x11); u8(0)
    u8(3); u8(0x11); u8(0)
    u8(0xff); u8(0xc4); u16(2 + 17 + Jpeg.stdDcVals.length); u8(0x00)
    Jpeg.stdDcBits.foreach(u8(_)); Jpeg.stdDcVals.foreach(u8(_))
    u8(0xff); u8(0xc4); u16(2 + 17 + Jpeg.stdAcVals.length); u8(0x10)
    Jpeg.stdAcBits.foreach(u8(_)); Jpeg.stdAcVals.foreach(u8(_))
    u8(0xff); u8(0xda); u16(6 + 2 * 3)
    u8(3); (1 to 3).foreach { cid => u8(cid); u8(0x00) }
    u8(0); u8(63); u8(0)
    Seq(0xd0, 0xaf, 0x2f, 0xaf, 0xa0, 0x2b, 0xe7, 0xfa).foreach(u8)
    u8(0xff); u8(0xd9)
    val img = Jpeg.decodeJpegRgb(out.toByteArray).get
    assert(img.width == 16 && img.height == 8)
    def cl(v: Double) = math.max(0, math.min(255, math.floor(v + 0.5).toInt))
    for (py <- 0 until 8; px <- 0 until 16) {
      val yy = if (px < 8) 130 else 120
      val (cbb, crr) = (144, 112)
      val i = 3 * (py * 16 + px)
      assert((img.pixels(i) & 0xff) == cl(yy + 1.402 * (crr - 128)), s"R($px,$py)")
      assert((img.pixels(i + 1) & 0xff) ==
        cl(yy - 0.344136 * (cbb - 128) - 0.714136 * (crr - 128)), s"G($px,$py)")
      assert((img.pixels(i + 2) & 0xff) == cl(yy + 1.772 * (cbb - 128)), s"B($px,$py)")
    }
  }

  test("JPEG progressive 4:2:0: own-grid AC scans vs MCU-padded DC grid decode exactly") {
    import graft.multimodal.Jpeg
    // 24x24: the luma own grid (3x3 blocks) is a STRICT subset of the
    // padded MCU grid (4x4) — the AC scans must walk 9 blocks while the
    // interleaved DC scan walks 16 (+ padding); a decoder that confuses
    // the grids desynchronizes the scan and fails or shifts pixels
    val y = Array.tabulate(9)(i => ((i * 29 + 40) % 256).toByte)     // 3x3
    val cb = Array.tabulate(4)(i => ((i * 61 + 90) % 256).toByte)    // 2x2
    val cr = Array.tabulate(4)(i => ((i * 97 + 150) % 256).toByte)   // 2x2
    val enc = Jpeg.encodeJpegProgressive420(y, cb, cr, 24, 24)
    val img = Jpeg.decodeJpegRgb(enc).get
    assert(img.width == 24 && img.height == 24)
    def cl(v: Double) = math.max(0, math.min(255, math.floor(v + 0.5).toInt))
    for (py <- 0 until 24; px <- 0 until 24) {
      val yy = y((py / 8) * 3 + px / 8) & 0xff
      val m = (py / 16) * 2 + px / 16
      val (cbb, crr) = (cb(m) & 0xff, cr(m) & 0xff)
      val i = 3 * (py * 24 + px)
      assert((img.pixels(i) & 0xff) == cl(yy + 1.402 * (crr - 128)), s"R($px,$py)")
      assert((img.pixels(i + 1) & 0xff) ==
        cl(yy - 0.344136 * (cbb - 128) - 0.714136 * (crr - 128)), s"G($px,$py)")
      assert((img.pixels(i + 2) & 0xff) == cl(yy + 1.772 * (cbb - 128)), s"B($px,$py)")
    }
  }

  test("PNG golden fixtures: hand-FILTERED scanlines decode to hand-computed pixels (r9 VERDICT #8)") {
    import graft.multimodal.Png
    // chunk assembler with REAL CRCs, so targeted strictness mutations are
    // exercised on CRC-valid streams (CRC catching everything would mask
    // which check fired)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      def b32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      b32(data.length.toLong) ++ tb ++ data ++ b32(crc.getValue)
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream(); val t = new Array[Byte](4096)
      while (!d.finished()) out.write(t, 0, d.deflate(t)); d.end(); out.toByteArray
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def ihdr(w: Int, h: Int, colorType: Int, depth: Int = 8, interlace: Int = 0) =
      Array((w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
        (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
        depth.toByte, colorType.toByte, 0.toByte, 0.toByte, interlace.toByte)
    def png(w: Int, h: Int, colorType: Int, raw: Array[Byte],
            depth: Int = 8, interlace: Int = 0): Array[Byte] =
      sig ++ chunk("IHDR", ihdr(w, h, colorType, depth, interlace)) ++
        chunk("IDAT", deflate(raw)) ++ chunk("IEND", Array.emptyByteArray)
    // fixture 1 — gray 3x3, filters None/Sub/Up; expected pixels hand-
    // computed (Sub wraps mod 256 at x=2, Up wraps at both x=1 and x=2)
    val f1raw = Array(0, 10, 20, 30, 1, 5, 250, 3, 2, 7, 1, 255).map(_.toByte)
    val img1 = Png.decodePng(png(3, 3, 0, f1raw)).get
    assert(img1.width == 3 && img1.height == 3 && img1.channels == 1)
    assert(img1.pixels.map(_ & 0xff).sameElements(
      Array(10, 20, 30, 5, 255, 2, 12, 0, 1)))
    // fixture 2 — gray 2x3, Average then Paeth over the Average row
    val f2raw = Array(0, 100, 200, 3, 10, 20, 4, 1, 2).map(_.toByte)
    val img2 = Png.decodePng(png(2, 3, 0, f2raw)).get
    // Average row: 10+(0+100)/2=60, 20+(60+200)/2=150
    // Paeth row:    1+60=61 (pred=b), 2+150=152 (pred=b)
    assert(img2.pixels.map(_ & 0xff).sameElements(
      Array(100, 200, 60, 150, 61, 152)))
    // fixture 3 — RGB 2x1, Sub at bpp=3: a is the sample 3 BYTES back
    val f3raw = Array(1, 10, 20, 30, 250, 240, 230).map(_.toByte)
    val img3 = Png.decodePng(png(2, 1, 2, f3raw)).get
    assert(img3.channels == 3 && img3.pixels.map(_ & 0xff).sameElements(
      Array(10, 20, 30, 4, 4, 4))) // 10+250=260→4, 20+240→4, 30+230→4
    // strictness on CRC-VALID streams: palette type, 16-bit depth, Adam7,
    // bad filter byte, trailing garbage, truncated IDAT, corrupted CRC
    assert(Png.decodePng(png(3, 3, 3, f1raw)).isEmpty)
    assert(Png.decodePng(png(3, 3, 0, f1raw, depth = 16)).isEmpty)
    assert(Png.decodePng(png(3, 3, 0, f1raw, interlace = 1)).isEmpty)
    assert(Png.decodePng(png(3, 3, 0, f1raw.updated(0, 9.toByte))).isEmpty)
    assert(Png.decodePng(png(3, 3, 0, f1raw) ++ Array(0.toByte)).isEmpty)
    assert(Png.decodePng(png(3, 3, 0, f1raw.dropRight(3))).isEmpty)
    val bad = png(3, 3, 0, f1raw); bad(bad.length - 1) = (bad.last ^ 1).toByte
    assert(Png.decodePng(bad).isEmpty)
    // encoder roundtrip: lossless for every byte value, gray AND RGB
    val all = Array.tabulate(256)(_.toByte)
    val g = Png.decodePng(Png.encodePng(all, 16, 16, 1)).get
    assert(g.channels == 1 && g.pixels.sameElements(all))
    val c = Png.decodePng(Png.encodePng(all ++ all ++ all, 16, 48, 1)).get
    assert(c.pixels.length == 768)
    val rgb = Png.decodePng(Png.encodePng(all ++ all ++ all, 16, 16, 3)).get
    assert(rgb.channels == 3 && rgb.pixels.sameElements(all ++ all ++ all))
    // the Codecs sniff routes PNG payloads to the real decoder
    import graft.multimodal.Codecs
    assert(Codecs.decodedPayload(Png.encodePng(all, 16, 16, 1)).sameElements(all))
  }

  test("wavChannelStats deinterleaves 16-bit LE PCM with exact integer sums (round 10)") {
    import spark.implicits._
    import graft.multimodal.{Codecs, Multimodal}
    // stereo, 2 frames: ch0 = [1000, -2000] (sum -1000), ch1 = [30000, -30000] (sum 0)
    def le16(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val pcm = (le16(1000) ++ le16(30000) ++ le16(-2000) ++ le16(-30000)).toArray
    val wav = Codecs.encodeWav(pcm, channels = 2, sampleRate = 8000, bitsPerSample = 16)
    val assets = Seq(Multimodal.Asset(3L, "audio", wav, 0, 0)).toDS()
    val got = Multimodal.wavChannelStats(assets)
      .collect().map(s => (s.channel, s.n_samples, s.sum_amp, s.mean_amp)).toSeq.sortBy(_._1)
    assert(got == Seq((0, 2, -1000L, -500.0), (1, 2, 0L, 0.0)))
  }

  test("pngChannelStats sums the decoded unsigned samples per channel (round 10)") {
    import spark.implicits._
    import graft.multimodal.{Png, Multimodal}
    // 2×1 RGB: pixels (10, 20, 30), (40, 50, 255) → ch sums 50, 70, 285
    val samples = Array[Byte](10, 20, 30, 40, 50, 255.toByte)
    val png = Png.encodePng(samples, 2, 1, 3)
    val assets = Seq(Multimodal.Asset(4L, "image", png, 0, 0)).toDS()
    val got = Multimodal.pngChannelStats(assets)
      .collect().map(s => (s.channel, s.n_px, s.sum_val, s.mean_val)).toSeq.sortBy(_._1)
    assert(got == Seq((0, 2, 50L, 25.0), (1, 2, 70L, 35.0), (2, 2, 285L, 142.5)))
  }

  test("pngNibbleHistogram: 16-bin high-nibble counts over the decoded samples (round 11)") {
    import spark.implicits._
    import graft.multimodal.{Png, Multimodal}
    // samples 0x0a 0x14 0x1e 0x28 0xff 0xf0 → high nibbles 0,1,1,2,15,15
    val samples = Array[Byte](0x0a, 0x14, 0x1e, 0x28, 0xff.toByte, 0xf0.toByte)
    val png = Png.encodePng(samples, 2, 1, 3)
    val assets = Seq(Multimodal.Asset(7L, "image", png, 0, 0)).toDS()
    val got = Multimodal.pngNibbleHistogram(assets).collect()
    assert(got.length == 1 && got(0).id == 7L)
    val expect = Array.fill(16)(0.0)
    expect(0) = 1; expect(1) = 2; expect(2) = 1; expect(15) = 2
    assert(got(0).features == expect.toSeq)
    // fixed dimension regardless of channel count: grayscale asset too
    val grey = Seq(Multimodal.Asset(8L, "image",
      Png.encodePng(Array[Byte](0x7f, 0x00), 2, 1, 1), 0, 0)).toDS()
    val g = Multimodal.pngNibbleHistogram(grey).collect()(0)
    assert(g.features.size == 16 && g.features(7) == 1.0 && g.features(0) == 1.0)
  }

  test("mp3FrameFingerprints pins each parsed frame payload individually (round 10)") {
    import spark.implicits._
    import graft.multimodal.{Mp3, Multimodal}
    // bitrate idx 1 (32 kbps), rate idx 2 (32000) -> flen 144, payload 140/frame
    val payloads = Array.tabulate(280)(i => ((i * 13 + 5) % 256).toByte)
    val enc = Mp3.encodeMp3(nFrames = 2, bitrateIdx = 1, rateIdx = 2, payloads)
    val assets = Seq(Multimodal.Asset(9L, "audio", enc, 0, 0)).toDS()
    def hexMd5(b: Array[Byte]): String = {
      val hx = b.map(x => f"$x%02x").mkString
      java.security.MessageDigest.getInstance("MD5")
        .digest(hx.getBytes("US-ASCII")).map(x => f"$x%02x").mkString
    }
    val got = Multimodal.mp3FrameFingerprints(assets)
      .collect().map(s => (s.frame_idx, s.frame_len, s.frame_fp)).toSeq.sortBy(_._1)
    assert(got == Seq(
      (0, 140, hexMd5(payloads.slice(0, 140))),
      (1, 140, hexMd5(payloads.slice(140, 280)))))
  }

  test("mp4SampleFrames slices samples at the parsed stsz/stco offsets (round 10)") {
    import spark.implicits._
    import graft.multimodal.{Mp4, Multimodal}
    val samples = Array.tabulate(24)(i => ((i * 7 + 1) % 256).toByte)
    val enc = Mp4.encodeMp4(width = 32, height = 16, timescale = 1000L,
      duration = 50L, nSamples = 3, sampleSize = 8, samples = samples)
    val assets = Seq(Multimodal.Asset(7L, "video", enc, 0, 0)).toDS()
    val got = Multimodal.mp4SampleFrames(assets, every = 2)
      .collect().map(s => (s.sample_idx, s.sample_len, s.sample_fp)).toSeq.sortBy(_._1)
    // every=2 over 3 samples keeps indices 0 and 2; fingerprints must
    // equal md5 of the lowercase-hex rendering of the exact 8-byte slices
    def hexMd5(b: Array[Byte]): String = {
      val hx = b.map(x => f"$x%02x").mkString
      java.security.MessageDigest.getInstance("MD5")
        .digest(hx.getBytes("US-ASCII")).map(x => f"$x%02x").mkString
    }
    assert(got == Seq(
      (0, 8, hexMd5(samples.slice(0, 8))),
      (2, 8, hexMd5(samples.slice(16, 24)))))
    // a sample table overrunning mdat fails loudly, never a misread
    val m = Mp4.parseMp4(enc).get
    assert(m.mdatFileOffset == enc.length - samples.length)
  }

  test("MP4/ISO-BMFF: box walk, headers, sample tables, mdat; strict structural rejections (round 10)") {
    import graft.multimodal.Mp4
    val samples = Array.tabulate(24)(i => ((i * 11 + 3) % 256).toByte)
    val enc = Mp4.encodeMp4(width = 64, height = 48, timescale = 1000L,
      duration = 123L, nSamples = 3, sampleSize = 8, samples = samples)
    val m = Mp4.parseMp4(enc).get
    assert(m.majorBrand == "isom" && m.timescale == 1000L && m.duration == 123L)
    assert(m.tracks.length == 1)
    val t = m.tracks.head
    assert(t.kind == "vide" && t.width == 64 && t.height == 48)
    assert(t.timescale == 1000L && t.duration == 123L)
    assert(t.sampleSizes.toSeq == Seq(8, 8, 8))
    assert(m.mdat.sameElements(samples))
    // the stco chunk offset points exactly at the mdat payload
    assert(t.firstChunkOffset == enc.length - samples.length)
    // unknown boxes are skipped BY SIZE (the format's extension contract):
    // a 'free' box between ftyp and moov changes nothing
    val free = Array(0, 0, 0, 12).map(_.toByte) ++ "free".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    val fl = Mp4ParseHelpers.be32(enc, 0).toInt // end of the ftyp box
    val withFree = enc.take(fl) ++ free ++ enc.drop(fl)
    // stco holds an ABSOLUTE file offset — shift it past the insertion
    // (and pin that an unpatched one is REJECTED: the offset validation
    // catches a desynced sample table instead of misreading mdat)
    assert(Mp4.parseMp4(withFree).isEmpty)
    val stcoW = withFree.indexOfSlice("stco".getBytes("US-ASCII"))
    val oldOff = Mp4ParseHelpers.be32(withFree, stcoW + 12)
    val patched = withFree.clone()
    val no = oldOff + free.length
    patched(stcoW + 12) = ((no >> 24) & 0xff).toByte
    patched(stcoW + 13) = ((no >> 16) & 0xff).toByte
    patched(stcoW + 14) = ((no >> 8) & 0xff).toByte
    patched(stcoW + 15) = (no & 0xff).toByte
    val m2 = Mp4.parseMp4(patched).get
    assert(m2.mdat.sameElements(samples) && m2.tracks.head.width == 64)
    // strictness: truncation, short box size, 64-bit largesize, stsz
    // overcommitting the mdat, chunk offset outside the mdat, no moov
    assert(Mp4.parseMp4(enc.dropRight(1)).isEmpty)
    val shortBox = enc.clone(); shortBox(3) = 5 // ftyp size -> 5 (< 8)
    assert(Mp4.parseMp4(shortBox).isEmpty)
    val large = enc.clone(); large(0) = 0; large(1) = 0; large(2) = 0; large(3) = 1
    assert(Mp4.parseMp4(large).isEmpty)
    // patch stsz count up: total sample bytes > mdat length
    val stsz = enc.indexOfSlice("stsz".getBytes("US-ASCII"))
    assert(stsz > 0)
    val over = enc.clone(); over(stsz + 4 + 8 + 3) = 9 // count 3 -> 9
    assert(Mp4.parseMp4(over).isEmpty)
    val stco = enc.indexOfSlice("stco".getBytes("US-ASCII"))
    val badOff = enc.clone(); badOff(stco + 4 + 8 + 3) = 4 // offset -> 4 (pre-mdat)
    assert(Mp4.parseMp4(badOff).isEmpty)
    // per-TRACK overrun (round-10 ADVICE): offset shifted +8 stays inside
    // the mdat and the cross-track total still fits, but this track's own
    // contiguous run (offset + 24 sample bytes) overruns the mdat end —
    // must be a parse error, not a later slice exception
    val midOff = enc.clone()
    val shifted = Mp4ParseHelpers.be32(enc, stco + 12) + 8
    midOff(stco + 12) = ((shifted >> 24) & 0xff).toByte
    midOff(stco + 13) = ((shifted >> 16) & 0xff).toByte
    midOff(stco + 14) = ((shifted >> 8) & 0xff).toByte
    midOff(stco + 15) = (shifted & 0xff).toByte
    assert(Mp4.parseMp4(midOff).isEmpty)
    val noMoov = {
      val moov = enc.indexOfSlice("moov".getBytes("US-ASCII")) - 4
      val msz = Mp4ParseHelpers.be32(enc, moov).toInt
      enc.take(moov) ++ enc.drop(moov + msz)
    }
    assert(Mp4.parseMp4(noMoov).isEmpty)
  }

  test("MP3 frame walk: ID3 skip, header tables, payload boundaries; strict rejections (round 10)") {
    import graft.multimodal.Mp3
    // 3 frames at 48 kbps / 32000 Hz: flen = 144*48000/32000 = 216
    val flen = 216
    val data = Array.tabulate(3 * (flen - 4))(i => ((i * 7 + 1) % 256).toByte)
    val enc = Mp3.encodeMp3(3, bitrateIdx = 3, rateIdx = 2, data)
    val s = Mp3.parseMp3(enc).get
    assert(s.nFrames == 3 && s.bitrateKbps == 48 && s.sampleRate == 32000)
    assert(s.durationMs == 3L * 1152 * 1000 / 32000) // 108 ms
    assert(s.framePayloads.map(_.length).toSeq == Seq(212, 212, 212))
    assert(s.framePayloads.flatten.sameElements(data))
    // hand-checked header bytes: FF FB (sync + MPEG-1 Layer III, no CRC),
    // then bitrateIdx 3 << 4 | rateIdx 2 << 2 = 0x38
    assert((enc(0) & 0xff) == 0xff && (enc(1) & 0xff) == 0xfb && (enc(2) & 0xff) == 0x38)
    // an ID3v2 tag (synchsafe size) is skipped; payloads identical
    val withId3 = Mp3.parseMp3(Mp3.encodeMp3(3, 3, 2, data, id3Bytes = 200)).get
    assert(withId3.framePayloads.flatten.sameElements(data))
    // strictness: truncated final frame, broken sync, CRC-protected,
    // reserved bitrate (15) / samplerate (3), MPEG-2 version, trailing byte
    assert(Mp3.parseMp3(enc.dropRight(1)).isEmpty)
    val badSync = enc.clone(); badSync(flen) = 0x00 // second frame's sync byte
    assert(Mp3.parseMp3(badSync).isEmpty)
    val crc = enc.clone(); crc(1) = 0xfa.toByte // protection bit 0 = CRC present
    assert(Mp3.parseMp3(crc).isEmpty)
    val badBr = enc.clone(); badBr(2) = 0xf8.toByte // bitrate index 15
    assert(Mp3.parseMp3(badBr).isEmpty)
    val badRate = enc.clone(); badRate(2) = 0x3c.toByte // samplerate index 3
    assert(Mp3.parseMp3(badRate).isEmpty)
    val mpeg2 = enc.clone(); mpeg2(1) = 0xf3.toByte // version bits 10
    assert(Mp3.parseMp3(mpeg2).isEmpty)
    assert(Mp3.parseMp3(enc ++ Array(0x00.toByte)).isEmpty)
    // mixed samplerates across frames reject (duration ill-defined)
    val f1 = Mp3.encodeMp3(1, 3, 2, data.take(212))
    val f2 = Mp3.encodeMp3(1, 3, 1, Array.fill[Byte](144 * 48000 / 48000 - 4)(9))
    assert(Mp3.parseMp3(f1 ++ f2).isEmpty)
  }

  test("decoder fuzz + allocation bombs: mutations never escape the Option contract (round 10)") {
    import graft.multimodal.{Jpeg, Png, Mp4, Mp3}
    // crafted headers demanding huge allocations reject up front (a crawl
    // pipeline meets these; an OOM would kill the executor, not a row)
    val pngBomb = {
      val ok = Png.encodePng(Array.fill[Byte](4)(1), 2, 2, 1)
      // IHDR starts at 8 + 8; patch width/height to 2^30
      val b = ok.clone()
      b(16) = 0x40.toByte; b(17) = 0; b(18) = 0; b(19) = 0
      b(20) = 0x40.toByte; b(21) = 0; b(22) = 0; b(23) = 0
      b // CRC now wrong too, but the dimension bound must not even allocate
    }
    assert(Png.decodePng(pngBomb).isEmpty)
    val jpgBomb = {
      val ok = Jpeg.encodeJpegConstBlocks(Array(1.toByte), 1, 1)
      val sof = ok.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
      val b = ok.clone()
      b(sof + 5) = 0xff.toByte; b(sof + 6) = 0xff.toByte // height 65535
      b(sof + 7) = 0xff.toByte; b(sof + 8) = 0xff.toByte // width 65535
      b
    }
    assert(Jpeg.decodeJpeg(jpgBomb).isEmpty)
    val mp4Bomb = {
      val ok = Mp4.encodeMp4(8, 8, 1000L, 1L, 1, 4, Array.fill[Byte](4)(1))
      val stsz = ok.indexOfSlice("stsz".getBytes("US-ASCII"))
      val b = ok.clone()
      b(stsz + 4 + 8) = 0x7f.toByte // uniform sample count -> ~2^31
      b(stsz + 4 + 9) = 0xff.toByte
      b
    }
    assert(Mp4.parseMp4(mp4Bomb).isEmpty)
    // seeded fuzz: byte flips, truncations, splices — decoders must
    // return (Option) for every input, never throw or crash
    val rnd = new scala.util.Random(20261408)
    def fuzz(name: String, valid: Array[Byte], decode: Array[Byte] => Any): Unit =
      (0 until 400).foreach { i =>
        val b = valid.clone()
        val mutated = rnd.nextInt(3) match {
          case 0 => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte; b
          case 1 => b.take(rnd.nextInt(b.length))
          case _ =>
            val at = rnd.nextInt(b.length)
            b.take(at) ++ Array.fill(rnd.nextInt(16) + 1)(rnd.nextInt(256).toByte) ++ b.drop(at)
        }
        try decode(mutated)
        catch { case e: Throwable => fail(s"$name mutation $i escaped the contract: $e") }
      }
    val pay = Array.tabulate(12)(i => (i * 21 + 5).toByte)
    fuzz("jpeg", Jpeg.encodeJpegConstBlocks(pay, 4, 3), Jpeg.decodeJpeg)
    fuzz("jpeg-prog", Jpeg.encodeJpegProgressiveConstBlocks(pay, 4, 3), Jpeg.decodeJpeg)
    fuzz("jpeg-rgb", Jpeg.encodeJpegConstBlocks420(
      Array.fill[Byte](4)(9), Array(1.toByte), Array(2.toByte), 1, 1), Jpeg.decodeJpegRgb)
    fuzz("png", Png.encodePng(pay ++ pay, 4, 6, 1), Png.decodePng)
    fuzz("mp4", Mp4.encodeMp4(16, 16, 1000L, 5L, 3, 4, pay), Mp4.parseMp4)
    fuzz("mp3", Mp3.encodeMp3(1, 3, 2, Array.fill[Byte](212)(7)), Mp3.parseMp3)
    import graft.multimodal.Codecs
    fuzz("ppm", Codecs.encodePpm(pay, 2, 2), Codecs.decodePpm)
    fuzz("wav", Codecs.encodeWav(pay ++ pay, 2, 8000, 16), Codecs.decodeWav)
  }

  test("WAV golden fixture: hand-written RIFF/PCM bytes decode to the exact samples") {
    import graft.multimodal.Codecs
    val pcm = Array[Byte](0x01, 0x02, 0x03, 0x04) // 2 mono 16-bit frames
    val golden: Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](0x28, 0, 0, 0) ++ // 36 + 4
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ Array[Byte](0x10, 0, 0, 0) ++ // 16
      Array[Byte](0x01, 0) ++ Array[Byte](0x01, 0) ++               // PCM, mono
      Array[Byte](0x40, 0x1f, 0, 0) ++                              // 8000 Hz
      Array[Byte](-0x80, 0x3e, 0, 0) ++                             // 16000 B/s
      Array[Byte](0x02, 0) ++ Array[Byte](0x10, 0) ++               // align, 16-bit
      "data".getBytes("US-ASCII") ++ Array[Byte](0x04, 0, 0, 0) ++ pcm
    val au = Codecs.decodeWav(golden).get
    assert(au.channels == 1 && au.sampleRate == 8000 && au.bitsPerSample == 16)
    assert(au.pcm.sameElements(pcm))
    assert(Codecs.encodeWav(pcm, 1, 8000, 16).sameElements(golden))
    // an unknown chunk between fmt and data is skipped by declared size
    val withJunk = golden.take(36) ++
      "junk".getBytes("US-ASCII") ++ Array[Byte](0x02, 0, 0, 0) ++ Array[Byte](9, 9) ++
      golden.drop(36)
    assert(Codecs.decodeWav(withJunk).get.pcm.sameElements(pcm))
    // strictness: non-PCM format code and ragged data chunk reject
    val nonPcm = golden.clone(); nonPcm(20) = 0x03
    assert(Codecs.decodeWav(nonPcm).isEmpty)
    val ragged = golden.clone(); ragged(40) = 0x03 // 3 bytes ≠ whole frames
    assert(Codecs.decodeWav(ragged.dropRight(1)).isEmpty)
    // sample-level operators run over the DECODED payload
    assert(Codecs.decodedPayload(golden).sameElements(pcm))
  }

  test("binary-safe variants: full 0x00-0xFF payload through packBinary, hex-canonical fp") {
    import spark.implicits._
    def md5s(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("US-ASCII")).map(x => f"$x%02x").mkString
    // every byte value once, plus a tail — nothing ASCII about it
    val payload = (0 until 300).map(i => (i % 256).toByte).toArray
    val assets = Multimodal.packBinary(
      Seq((5L, payload)).toDF("id", "b"), "id", "b")
    // resize: target 64 -> k = ceil(300/64) = 5, n = 60; fp = md5 of the
    // sampled bytes' lowercase hex
    val rz = Multimodal.resizeBinarySafe(assets, tw = 8, th = 8).collect().head
    assert(rz.n_sampled == 60)
    val sampled = (0 until 60).map(j => payload(j * 5))
    assert(rz.resized_fp == md5s(sampled.map(b => f"$b%02x").mkString))
    // frames: 300 bytes -> frames 0 (256 B) and 1 (44 B tail); every=1 keeps both
    val fr = Multimodal.sampleFramesBinarySafe(assets, every = 1)
      .collect().sortBy(_.frame_idx)
    assert(fr.map(_.frame_idx).toSeq == Seq(0, 1))
    assert(fr(0).frame_fp == md5s(payload.take(256).map(b => f"$b%02x").mkString))
    assert(fr(1).frame_fp == md5s(payload.drop(256).map(b => f"$b%02x").mkString))
  }

  // ---- Layer III side info + scale factors (round 12, r11 VERDICT #4) ----

  /** In-TEST bit packer, independent of Mp3.encodeSideInfo — the golden
    * fixture below is assembled with THIS, so an encoder/parser bug pair
    * in Mp3.scala cannot cancel (the wav golden-fixture discipline). */
  private def packBits(fields: Seq[(Int, Int)]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var acc = 0; var n = 0
    fields.foreach { case (v, w) =>
      (w - 1 to 0 by -1).foreach { i =>
        acc = (acc << 1) | ((v >> i) & 1); n += 1
        if (n == 8) { out += acc.toByte; acc = 0; n = 0 }
      }
    }
    if (n > 0) out += (acc << (8 - n)).toByte
    out.toArray
  }

  test("parseSideInfo golden fixture: hand-packed MONO side info, every field (round 12)") {
    import graft.multimodal.Mp3
    // granule 0: long block; granule 1: short (window-switched) block
    val bits = Seq(
      (5, 9),            // main_data_begin
      (2, 5),            // private_bits (mono)
      (1, 1), (0, 1), (1, 1), (0, 1), // scfsi
      // granule 0: p23=100 bv=33 gg=210 sfc=5 ws=0 ts=(1,2,3) r0=4 r1=5 pre=1 ss=0 c1=1
      (100, 12), (33, 9), (210, 8), (5, 4), (0, 1),
      (1, 5), (2, 5), (3, 5), (4, 4), (5, 3), (1, 1), (0, 1), (1, 1),
      // granule 1: p23=60 bv=7 gg=9 sfc=15 ws=1 bt=2 mixed=0 ts=(30,31) sbg=(1,2,3) pre=0 ss=1 c1=0
      (60, 12), (7, 9), (9, 8), (15, 4), (1, 1),
      (2, 2), (0, 1), (30, 5), (31, 5), (1, 3), (2, 3), (3, 3), (0, 1), (1, 1), (0, 1))
    val payload = packBits(bits) ++ Array.fill[Byte](20)(0)
    val si = Mp3.parseSideInfo(payload, channels = 1).get
    assert(si.mainDataBegin == 5 && si.privateBits == 2)
    assert(si.scfsi == Seq(Seq(1, 0, 1, 0)))
    val g0 = si.granules(0)(0)
    assert(g0.part23Length == 100 && g0.bigValues == 33 && g0.globalGain == 210)
    assert(g0.scalefacCompress == 5 && !g0.windowSwitching)
    assert(g0.tableSelect == Seq(1, 2, 3) && g0.region0Count == 4 && g0.region1Count == 5)
    assert(g0.preflag == 1 && g0.scalefacScale == 0 && g0.count1TableSelect == 1)
    val g1 = si.granules(1)(0)
    assert(g1.part23Length == 60 && g1.bigValues == 7 && g1.globalGain == 9)
    assert(g1.scalefacCompress == 15 && g1.windowSwitching && g1.blockType == 2)
    assert(!g1.mixedBlock && g1.tableSelect == Seq(30, 31) && g1.subblockGain == Seq(1, 2, 3))
    assert(g1.region0Count == 8 && g1.region1Count == 36) // derived, not transmitted
    assert(g1.preflag == 0 && g1.scalefacScale == 1 && g1.count1TableSelect == 0)
    // strict rejects: short payload; forbidden block_type 0 under switching
    assert(Mp3.parseSideInfo(payload.take(16), 1).isEmpty)
    val forbidden = packBits(bits.updated(24, (0, 2))) ++ Array.fill[Byte](20)(0)
    assert(Mp3.parseSideInfo(forbidden, 1).isEmpty)
  }

  test("parseScalefactors: long-block stereo with scfsi sharing; reservoir frames rejected (round 12)") {
    import graft.multimodal.Mp3
    // stereo, long blocks, sfc=9 (slen 2/2): ch0 shares groups 0 and 2 in
    // granule 1, ch1 shares nothing
    val scfsi = Seq(Seq(1, 0, 1, 0), Seq(0, 0, 0, 0))
    def gi(p23: Int) = Mp3.GranuleInfo(p23, 17, 99, 9, windowSwitching = false,
      blockType = 0, mixedBlock = false, tableSelect = Seq(4, 5, 6),
      subblockGain = Nil, region0Count = 3, region1Count = 2,
      preflag = 0, scalefacScale = 1, count1TableSelect = 0)
    // granule-1 ch0 reads only groups 1 and 3 (5 + 5 factors x 2 bits)
    val si = Mp3.SideInfo(0, 1, scfsi,
      Seq(Seq(gi(42), gi(42)), Seq(gi(20), gi(42))))
    val g0c0 = Array.tabulate(21)(b => b % 4)
    val g0c1 = Array.tabulate(21)(b => (b + 1) % 4)
    val g1c0 = Array.tabulate(10)(i => (3 - i % 4 + 4) % 4) // groups 1+3 fresh reads
    val g1c1 = Array.tabulate(21)(b => (2 * b) % 4)
    val payload = Mp3.encodeSideInfo(si, 2, Seq(Seq(g0c0, g0c1), Seq(g1c0, g1c1)))
    val sfs = Mp3.parseScalefactors(payload, 2).get
    assert(sfs(0)(0).sameElements(g0c0) && sfs(0)(1).sameElements(g0c1))
    // granule-1 ch0 in band order: groups 0/2 copied from granule 0,
    // groups 1/3 the fresh reads
    val expectG1c0 = (0 until 6).map(g0c0) ++ g1c0.take(5) ++
      (11 until 16).map(g0c0) ++ g1c0.drop(5)
    assert(sfs(1)(0).toSeq == expectG1c0)
    assert(sfs(1)(1).sameElements(g1c1))
    // a reservoir-dependent frame (main_data_begin != 0) is a seam, not a parse
    val res = Mp3.encodeSideInfo(si.copy(mainDataBegin = 7), 2,
      Seq(Seq(g0c0, g0c1), Seq(g1c0, g1c1)))
    assert(Mp3.parseScalefactors(res, 2).isEmpty)
    assert(Mp3.parseSideInfo(res, 2).get.mainDataBegin == 7)
  }

  test("encodeSideInfo <-> parseSideInfo round-trip, stereo with short blocks (round 12)") {
    import graft.multimodal.Mp3
    val long = Mp3.GranuleInfo(90, 200, 128, 9, windowSwitching = false,
      blockType = 0, mixedBlock = false, tableSelect = Seq(7, 8, 9),
      subblockGain = Nil, region0Count = 6, region1Count = 4,
      preflag = 1, scalefacScale = 0, count1TableSelect = 1)
    // short block, sfc=9 (slen 2/2): 36 factors x 2 bits = 72 <= p23
    val short = Mp3.GranuleInfo(80, 11, 64, 9, windowSwitching = true,
      blockType = 2, mixedBlock = false, tableSelect = Seq(12, 13),
      subblockGain = Seq(2, 4, 6), region0Count = 8, region1Count = 36,
      preflag = 0, scalefacScale = 1, count1TableSelect = 0)
    // scfsi sharing applies to LONG granule-1 runs only; use scfsi=0 rows
    // to keep granule 1 fully fresh (short blocks never share)
    val si = Mp3.SideInfo(0, 0, Seq(Seq(0, 0, 0, 0), Seq(0, 0, 0, 0)),
      Seq(Seq(long, long.copy(globalGain = 90)), Seq(short, short.copy(bigValues = 13))))
    val longSf = Array.tabulate(21)(b => (b * 3) % 4)
    val shortSf = Array.tabulate(36)(i => (i + 2) % 4)
    val payload = Mp3.encodeSideInfo(si, 2,
      Seq(Seq(longSf, longSf.reverse), Seq(shortSf, shortSf.map(x => 3 - x))))
    val got = Mp3.parseSideInfo(payload, 2).get
    assert(got == si)
    val sfs = Mp3.parseScalefactors(payload, 2).get
    assert(sfs(0)(0).sameElements(longSf) && sfs(0)(1).sameElements(longSf.reverse))
    assert(sfs(1)(0).sameElements(shortSf) && sfs(1)(1).sameElements(shortSf.map(x => 3 - x)))
  }

  // ---- H.264 Annex-B / SPS / PPS (round 12) ----

  /** In-test ue(v) field builder for [[packBits]] — independent of
    * H264.encodeSps, so an encoder/parser Exp-Golomb bug pair in
    * H264.scala cannot cancel in the golden fixture below. */
  private def ue(v: Int): Seq[(Int, Int)] = {
    val k = v + 1
    val n = 32 - Integer.numberOfLeadingZeros(k)
    if (n == 1) Seq((k, 1)) // v = 0 → single 1 bit
    else Seq((0, n - 1), (k, n))
  }

  test("H264 golden SPS: hand-packed baseline bitstream, every field + crop math (round 12)") {
    import graft.multimodal.H264
    // profile 66, level 30, spsId 0, log2mfn-4 = 3, poc 0 (lsb-4 = 0),
    // maxRef 2, pw-1 = 4, ph-1 = 2, frame_mbs_only, crop (0,1,0,1)
    val bits: Seq[(Int, Int)] =
      Seq((66, 8), (0, 8), (30, 8)) ++ ue(0) ++ ue(3) ++ ue(0) ++ ue(0) ++
        ue(2) ++ Seq((0, 1)) ++ ue(4) ++ ue(2) ++ Seq((1, 1), (1, 1), (1, 1)) ++
        ue(0) ++ ue(1) ++ ue(0) ++ ue(1) ++ Seq((0, 1), (1, 1)) // vui=0, stop bit
    val sps = H264.parseSps(packBits(bits)).get
    assert(sps.profileIdc == 66 && sps.levelIdc == 30 && sps.spsId == 0)
    assert(sps.chromaFormatIdc == 1 && sps.bitDepthLuma == 8)
    assert(sps.log2MaxFrameNum == 7 && sps.pocType == 0 && sps.maxNumRefFrames == 2)
    assert(sps.picWidthInMbs == 5 && sps.picHeightInMapUnits == 3 && sps.frameMbsOnly)
    assert((sps.cropLeft, sps.cropRight, sps.cropTop, sps.cropBottom) == (0, 1, 0, 1))
    assert(sps.width == 5 * 16 - 2 && sps.height == 3 * 16 - 2) // 4:2:0 crop units
    // the library encoder reproduces the hand-packed bytes exactly
    assert(H264.encodeSps(66, 30, 0, 3, 0, 2, 4, 2, frameMbsOnly = true,
      crop = Some((0, 1, 0, 1))).sameElements(packBits(bits)))
  }

  test("H264 high-profile SPS: chroma block read; scaling matrix strictly rejected") {
    import graft.multimodal.H264
    val rt = H264.parseSps(H264.encodeSps(100, 40, 0, 0, 2, 1, 7, 5,
      frameMbsOnly = false, crop = None)).get
    assert(rt.profileIdc == 100 && rt.chromaFormatIdc == 1 && rt.pocType == 2)
    assert(!rt.frameMbsOnly && rt.height == 2 * 6 * 16 && rt.width == 8 * 16)
    // seq_scaling_matrix_present = 1 → None (out of scope, never guessed):
    // flip the flag bit. After the 24 header bits: spsId ue(0) = 1 bit,
    // chroma ue(1) = 3 bits, two depth ue(0)s = 2 bits, bypass u(1) —
    // the scaling flag is stream bit 31, the last bit of byte 3.
    val bytes = H264.encodeSps(100, 40, 0, 0, 2, 1, 7, 5, false, None)
    val flipped = bytes.clone()
    flipped(3) = (flipped(3) ^ 0x01).toByte
    assert(H264.parseSps(flipped).isEmpty)
  }

  test("H264 emulation prevention: escape/unescape golden cases + fuzz round trip") {
    import graft.multimodal.H264
    assert(H264.escape(Array[Byte](0, 0, 1)).sameElements(Array[Byte](0, 0, 3, 1)))
    assert(H264.escape(Array[Byte](0, 0, 0)).sameElements(Array[Byte](0, 0, 3, 0)))
    assert(H264.escape(Array[Byte](0, 0, 4)).sameElements(Array[Byte](0, 0, 4)))
    assert(H264.unescape(Array[Byte](0, 0, 3, 1), 0, 4).sameElements(Array[Byte](0, 0, 1)))
    // 0x03 NOT preceded by two zeros passes through
    assert(H264.unescape(Array[Byte](0, 3, 1), 0, 3).sameElements(Array[Byte](0, 3, 1)))
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val raw = Array.fill(rnd.nextInt(64) + 1)((rnd.nextInt(5) - 2).toByte)
      val esc = H264.escape(raw)
      // no start-code emulation survives escaping: 00 00 00/01/02 are the
      // forbidden EBSP patterns (00 00 03 is the escape itself, §7.4.1.1)
      assert(!esc.sliding(3).exists(w =>
        w.length == 3 && w(0) == 0 && w(1) == 0 && (w(2) & 0xFF) <= 2))
      assert(H264.unescape(esc, 0, esc.length).sameElements(raw))
    }
    // round-12 ADVICE: §7.4.1.1 defines the escape only before 00-03 —
    // invalid EBSP must fail the parse, not silently mis-unescape
    intercept[IllegalArgumentException](
      H264.unescape(Array[Byte](0, 0, 3, 0xFF.toByte), 0, 4))
    intercept[IllegalArgumentException]( // stream-final 0x03: no escaped byte
      H264.unescape(Array[Byte](0, 0, 3), 0, 3))
    // ...and through parse() the strictness lands as None, per contract
    assert(H264.parse(Array[Byte](0, 0, 1, 9, 0, 0, 3, 0x55.toByte)).isEmpty)
  }

  test("H264 annexB rejects zero-final RBSP payloads (round-12 ADVICE)") {
    import graft.multimodal.H264
    // parse()'s trailing_zero_8bits strip would eat legitimate payload-final
    // zeros; real RBSPs end nonzero (rbsp_trailing_bits stop bit), so the
    // fixture assembler fails fast instead of corrupting the round trip
    val e = intercept[IllegalArgumentException](
      H264.annexB(Seq((3, 5, Array[Byte](42, 7, 0)))))
    assert(e.getMessage.contains("nonzero"))
    // ...and the encoder SPS/PPS always satisfy the contract (stop bit in
    // the final byte), so normal fixture assembly is unaffected
    val sps = H264.encodeSps(77, 31, 0, 1, 0, 3, 2, 1, frameMbsOnly = true, crop = None)
    assert(sps.last != 0)
    assert(H264.parse(H264.annexB(Seq((3, 7, sps)))).isDefined)
  }

  test("H264 Annex-B end to end: NAL walk, 4/3-byte start codes, slice RBSP recovery") {
    import graft.multimodal.H264
    val sps = H264.encodeSps(77, 31, 0, 1, 0, 3, 2, 1, frameMbsOnly = true, crop = None)
    val pps = H264.encodePps(0, 0, cabac = true)
    val slice = Array[Byte](0, 0, 1, 0, 0, 2, 42, 7, -1, 0x80.toByte)
    for (four <- Seq(true, false)) {
      val stream = H264.parse(H264.annexB(
        Seq((3, 7, sps), (3, 8, pps), (3, 5, slice)), fourByteAll = four)).get
      assert(stream.nals.map(_.nalType) == Seq(7, 8, 5))
      assert(stream.sps.get.width == 3 * 16 && stream.sps.get.height == 2 * 16)
      assert(stream.pps.get.entropyCabac && stream.pps.get.numSliceGroups == 1)
      assert(stream.nals(2).rbsp.sameElements(slice)) // escape round-tripped
    }
    // strict rejects: no start code; forbidden_zero_bit set
    assert(H264.parse(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(H264.parse(Array[Byte](0, 0, 1, 0x87.toByte, 1)).isEmpty)
  }

  // ---- MP3 Layer III Huffman spectral decode (round 13) ----

  test("MP3 Huffman: encode/decode round trip — regions, escapes, signs, count1 A and B") {
    import graft.multimodal.Mp3
    def gi(bigValues: Int, c1t: Int) = Mp3.GranuleInfo(0, bigValues, 100, 9,
      windowSwitching = false, blockType = 0, mixedBlock = false,
      Seq(4, 14, 0), Nil, region0Count = 3, region1Count = 7,
      preflag = 0, scalefacScale = 0, count1TableSelect = c1t)
    val nBig = 40
    // region0 (samples 0-15): small-table mags 0-3; region1: the escape
    // codebook's {0, 1, 15+linbits} domain; count1: {-1, 0, 1}
    val is = Array.tabulate(nBig + 8) { i =>
      val mag =
        if (i < 16) i % 4
        else if (i < nBig) (i % 4) match {
          case 0 => 0; case 1 | 2 => 1; case _ => 15 + i % 8
        }
        else i % 2
      if (mag != 0 && i % 3 == 0) -mag else mag
    }
    val sfs = Seq.fill(2)(Seq.fill(2)(Array.tabulate(21)(b => b % 4)))
    val si = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(nBig / 2, (g + ch) % 2))))
    val payload = Mp3.encodeSpectra(si, 2, sfs, Seq.fill(2)(Seq.fill(2)(is)))
    val sp = Mp3.decodeSpectra(payload, 2, 0).get
    for (g <- 0 until 2; ch <- 0 until 2) {
      val x = sp(g)(ch)
      assert(x.nBig == nBig && x.nCount1 == 8, s"($g,$ch): ${x.nBig}/${x.nCount1}")
      assert(x.is.take(nBig + 8).sameElements(is), s"($g,$ch) spectra differ")
      assert(x.is.drop(nBig + 8).forall(_ == 0))
    }
  }

  test("MP3 Huffman requantization: power law, scalefac/preflag/pretab exponents") {
    import graft.multimodal.Mp3
    // two nonzero values in band 0 (samples 0-3 < bands(1) = 4):
    // xr = sign·|is|^(4/3)·2^((gg-210)/4)·2^(-mult·sf(0)) with mult 0.5
    val gi = Mp3.GranuleInfo(0, 1, 214, 9, windowSwitching = false,
      blockType = 0, mixedBlock = false, Seq(4, 14, 0), Nil, 3, 7,
      preflag = 0, scalefacScale = 0, count1TableSelect = 1)
    val sfs = Seq.fill(2)(Seq.fill(1)(Array.tabulate(21)(b => if (b == 0) 2 else 0)))
    val si = Mp3.SideInfo(0, 0, Seq.fill(1)(Seq.fill(4)(0)),
      Seq.fill(2)(Seq.fill(1)(gi)))
    val is = Array(3, -1)
    val payload = Mp3.encodeSpectra(si, 1, sfs, Seq.fill(2)(Seq.fill(1)(is)))
    val x = Mp3.decodeSpectra(payload, 1, 0).get.head.head
    // exponent: (214-210)/4 = +1, minus 0.5·sf(0)=1 ⇒ net 0
    assert(math.abs(x.xr(0) - math.pow(3.0, 4.0 / 3.0)) < 1e-12, s"xr0=${x.xr(0)}")
    assert(math.abs(x.xr(1) + 1.0) < 1e-12, s"xr1=${x.xr(1)}")
    assert(x.xr.drop(2).forall(_ == 0.0))
    // preflag shifts bands 11+ only: with preflag=1 and sf=0 everywhere,
    // a value in band 17 (sample 200 at 44.1 kHz: bands 196-237) scales
    // by 2^(-0.5·pretab(17)) = 2^(-1.5) vs its preflag=0 twin
    def one(pre: Int): Double = {
      val n = 101 // bigValues pairs: samples 0..201
      val gi2 = gi.copy(bigValues = n, preflag = pre,
        tableSelect = Seq(4, 4, 4))
      val si2 = Mp3.SideInfo(0, 0, Seq.fill(1)(Seq.fill(4)(0)),
        Seq.fill(2)(Seq.fill(1)(gi2)))
      val is2 = Array.tabulate(2 * n)(i => if (i == 200) 2 else 0)
      val sf0 = Seq.fill(2)(Seq.fill(1)(Array.fill(21)(0)))
      val p = Mp3.encodeSpectra(si2, 1, sf0, Seq.fill(2)(Seq.fill(1)(is2)))
      Mp3.decodeSpectra(p, 1, 0).get.head.head.xr(200)
    }
    assert(math.abs(one(1) / one(0) - math.pow(2.0, -1.5)) < 1e-12)
  }

  test("MP3 Huffman fuzz: byte mutations never escape the Option contract") {
    import graft.multimodal.Mp3
    val gi = Mp3.GranuleInfo(0, 10, 100, 9, windowSwitching = false,
      blockType = 0, mixedBlock = false, Seq(4, 14, 0), Nil, 3, 7,
      preflag = 0, scalefacScale = 0, count1TableSelect = 1)
    val si = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.fill(2)(Seq.fill(2)(gi)))
    val sfs = Seq.fill(2)(Seq.fill(2)(Array.fill(21)(1)))
    val is = Array.tabulate(24)(i => if (i % 3 == 0) 1 else 0)
    val base = Mp3.encodeSpectra(si, 2, sfs, Seq.fill(2)(Seq.fill(2)(is)))
    assert(Mp3.decodeSpectra(base, 2, 0).isDefined)
    val rnd = new scala.util.Random(19)
    (0 until 400).foreach { i =>
      val m = base.clone()
      rnd.nextInt(3) match {
        case 0 => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        case 1 => m(rnd.nextInt(m.length)) = (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
        case _ => // truncation handled below
      }
      val bytes = if (rnd.nextBoolean()) m else m.take(rnd.nextInt(m.length + 1))
      try {
        val r = Mp3.decodeSpectra(bytes, 2, 0)
        // defined results must still honor the layout contract
        r.foreach(_.flatten.foreach(s => assert(s.is.length == 576)))
      } catch { case e: Throwable => fail(s"mutation $i escaped the contract: $e") }
    }
  }

  test("MP3 Huffman strict rejects: unknown table id, reservoir, short blocks, budget cross") {
    import graft.multimodal.Mp3
    def gi(ts: Seq[Int], p23: Int, bv: Int = 1, ws: Boolean = false) =
      Mp3.GranuleInfo(p23, bv, 100, 9, ws, if (ws) 2 else 0, mixedBlock = false,
        if (ws) ts.take(2) else ts, if (ws) Seq(0, 0, 0) else Nil, 3, 7,
        preflag = 0, scalefacScale = 0, count1TableSelect = 1)
    def frame(g0: Mp3.GranuleInfo, mdb: Int = 0): Array[Byte] = {
      val si = Mp3.SideInfo(mdb, 0, Seq.fill(1)(Seq.fill(4)(0)),
        Seq.fill(2)(Seq.fill(1)(g0)))
      val sfs = Seq.fill(2)(Seq.fill(1)(
        Array.fill(if (g0.windowSwitching) 36 else 21)(0)))
      Mp3.encodeSideInfo(si, 1, sfs)
    }
    // ISO table 16: a REAL id whose codebook is transcription-pending —
    // strict-reject, never guess (the codebook-provenance contract)
    assert(Mp3.decodeSpectra(frame(gi(Seq(16, 0, 0), p23 = 60)), 1, 0).isEmpty)
    // bit-reservoir frames: the DSP seam
    assert(Mp3.decodeSpectra(frame(gi(Seq(4, 0, 0), p23 = 60), mdb = 5), 1, 0).isEmpty)
    // a count1 walk that cannot land exactly on part2_3_length
    assert(Mp3.decodeSpectra(frame(gi(Seq(0, 0, 0), p23 = 43, bv = 0)), 1, 0).isEmpty)
    // ...and the same shape with a landable budget decodes (42 sf bits +
    // one table-B quad (4 bits) + its 4 sign bits = 50)
    assert(Mp3.decodeSpectra(frame(gi(Seq(0, 0, 0), p23 = 50, bv = 0)), 1, 0).isDefined)
  }

  // ---- H.264 I_PCM slice decode (round 14) ----

  test("H264 I_PCM: encode/decode round trip across poc/deblocking/redundant branches") {
    import graft.multimodal.H264
    val rnd = new scala.util.Random(13)
    for (pocType <- Seq(0, 2); dbf <- Seq(false, true); red <- Seq(false, true)) {
      val spsB = H264.encodeSps(66, 30, 0, log2MaxFrameNumMinus4 = 1,
        poc = pocType, maxRef = 1, pwMbsMinus1 = 1, phMapMinus1 = 0,
        frameMbsOnly = true, crop = None)
      val ppsB = H264.encodePps(0, 0, cabac = false, picInitQp = 28,
        deblockingPresent = dbf, redundantPresent = red)
      val sps = H264.parseSps(spsB).get
      val pps = H264.parsePps(ppsB).get
      assert(pps.picInitQp == 28 && pps.deblockingPresent == dbf &&
        pps.redundantPresent == red)
      val mbs = Seq.fill(2)(H264.IPcmMb(
        Array.fill(256)(rnd.nextInt(256)), Array.fill(64)(rnd.nextInt(256)),
        Array.fill(64)(rnd.nextInt(256))))
      val rbsp = H264.encodeIPcmSlice(sps, pps, nalRefIdc = 3, idr = true,
        frameNum = 9, idrPicId = 4, pocLsb = if (pocType == 0) 7 else 0,
        sliceQpDelta = -2, mbs, deblockIdc = 0)
      val sl = H264.parseIPcmSlice(rbsp, sps, pps, 3, 5).get
      assert(sl.frameNum == 9 && sl.idrPicId == 4 && sl.sliceQp == 26)
      assert(sl.pocLsb == (if (pocType == 0) 7 else 0))
      assert(sl.mbs.length == 2)
      sl.mbs.zip(mbs).foreach { case (d, e) =>
        assert(d.luma.sameElements(e.luma) && d.cb.sameElements(e.cb) &&
          d.cr.sameElements(e.cr))
      }
      // the full Annex-B round trip through parse()'s escape/unescape
      val stream = H264.parse(H264.annexB(
        Seq((3, 7, spsB), (3, 8, ppsB), (3, 5, rbsp)))).get
      val nal = stream.nals.find(_.nalType == 5).get
      val sl2 = H264.parseIPcmSlice(nal.rbsp, stream.sps.get, stream.pps.get, 3, 5).get
      assert(sl2.mbs.head.luma.sameElements(mbs.head.luma))
    }
  }

  test("H264 I_PCM: bottom_field_pic_order PPS flag round-trips and the slice walk consumes its delta (r14 review)") {
    import graft.multimodal.H264
    val spsB = H264.encodeSps(66, 30, 0, log2MaxFrameNumMinus4 = 1,
      poc = 0, maxRef = 1, pwMbsMinus1 = 0, phMapMinus1 = 0,
      frameMbsOnly = true, crop = None)
    val sps = H264.parseSps(spsB).get
    val pps = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      bottomFieldPocPresent = true)).get
    assert(pps.bottomFieldPocPresent, "PPS flag not retained")
    val mb = Seq(H264.IPcmMb(Array.fill(256)(9), Array.fill(64)(3), Array.fill(64)(5)))
    // the encoder writes delta_pic_order_cnt_bottom when the flag is set,
    // and the walk must consume it — every later field would read
    // bit-shifted otherwise
    val rbsp = H264.encodeIPcmSlice(sps, pps, 3, idr = true,
      frameNum = 5, idrPicId = 2, pocLsb = 3, sliceQpDelta = 1, mb)
    val sl = H264.parseIPcmSlice(rbsp, sps, pps, 3, 5).get
    assert(sl.frameNum == 5 && sl.pocLsb == 3 && sl.sliceQp == 27)
    assert(sl.mbs.head.luma.sameElements(mb.head.luma))
  }

  test("mp3 MPEG-2/2.5 (LSF): version bits strict-reject by name, never misparse (round 17 scope decision)") {
    // r16 VERDICT #6: old corpora carry 22.05/16/11.025 kHz LSF streams
    // (MPEG-2 ID 0b10, MPEG-2.5 0b00). LSF Layer III is a SECOND rule
    // set (9/17-byte side info, one granule, slen[4] scalefactors, its
    // own intensity stereo) with no in-sandbox ground truth — the same
    // validation gap the CABAC schedule carries. DECISION: documented
    // named reject (SURVEY round-17 scope row), like AAC LTP/CCE —
    // this test pins that every non-MPEG-1 version value rejects at
    // the sync walk rather than desyncing the frame-length math
    // (LSF frames are HALF the MPEG-1 length at the same bitrate
    // index: a misparse would slice garbage frames, not fail).
    import graft.multimodal.Mp3
    val good = Mp3.encodeMp3(2, 3, 2, Array.tabulate(2 * 212)(i => (i % 251).toByte))
    assert(Mp3.parseMp3(good).nonEmpty)
    // version field: header byte 1 bits 4..3 (0b11 = MPEG-1)
    for (ver <- Seq(0, 1, 2)) { // 2.5, reserved, MPEG-2
      val bad = good.clone()
      bad(1) = ((bad(1) & 0xE7) | (ver << 3)).toByte
      assert(Mp3.parseMp3(bad).isEmpty, s"version bits $ver accepted")
    }
  }

  test("mp3 per-frame stereo-mode discipline: mixed modes reject; intensity streams refuse PCM decode (r14 review)") {
    import graft.multimodal.Mp3
    val (si, sfs, sp) = mp3FrameSpec(1L)
    val payload = Mp3.encodeSpectra(si, 2, sfs, sp)
    val frame = java.util.Arrays.copyOf(payload, 413)
    // frame 1 plain stereo, frame 2 MS joint stereo: silently decoding
    // both through frame 1's matrix would be a misparse — reject
    val mixed = Mp3.encodeMp3(1, 9, 0, frame, mode = 0, modeExt = 0) ++
      Mp3.encodeMp3(1, 9, 0, frame, mode = 1, modeExt = 2)
    assert(Mp3.parseMp3(mixed).isEmpty, "mixed-mode stream accepted")
    // intensity stereo (mode_extension bit 0) DECODES for long,
    // pure-short (round 15) AND mixed windows (round 16 — the
    // long+short band seam closed; §2.7(a) has no refusals left)
    val intens = Mp3.parseMp3(Mp3.encodeMp3(1, 9, 0, frame, mode = 1, modeExt = 1)).get
    assert(Mp3.decodeSpectraStream(intens, 0).isDefined)
    assert(Mp3.decodePcmStream(intens, 0).isDefined,
      "long-window intensity stereo must decode (round 15)")
    val shortSpec = mp3ShortFrameSpec(2L)
    val shortIntens = Mp3.parseMp3(Mp3.encodeMp3Reservoir(9, 0,
      Seq(shortSpec), mode = 1, modeExt = 1)).get
    assert(Mp3.decodeSpectraStream(shortIntens, 0).isDefined)
    assert(Mp3.decodePcmStream(shortIntens, 0).isDefined,
      "pure-short intensity stereo must decode (late round 15)")
    // MIXED blocks under intensity decode too (round 16)
    def giMixed(g: Int) =
      if (g == 0) Mp3.GranuleInfo(0, 8, 180, 13, windowSwitching = true,
        blockType = 2, mixedBlock = true, Seq(4, 4), Seq(0, 0, 0), 7, 36, 0, 0, 1)
      else Mp3.GranuleInfo(0, 8, 180, 13, windowSwitching = false,
        blockType = 0, mixedBlock = false, Seq(4, 4, 0), Nil, 3, 7, 0, 0, 1)
    val siM = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.tabulate(2)(g => Seq.fill(2)(giMixed(g))))
    val sfsM: Seq[Seq[Array[Int]]] = Seq.tabulate(2)(g => Seq.fill(2)(
      if (g == 0) new Array[Int](8 + 27) else new Array[Int](21)))
    val isM = Array.tabulate(16)(i => ((i % 2) * (if (i % 3 == 0) -1 else 1)))
    val mixedIntens = Mp3.parseMp3(Mp3.encodeMp3Reservoir(9, 0,
      Seq((siM, sfsM, Seq.fill(2)(Seq.fill(2)(isM)))), mode = 1, modeExt = 1)).get
    assert(Mp3.decodeSpectraStream(mixedIntens, 0).isDefined)
    assert(Mp3.decodePcmStream(mixedIntens, 0).isDefined,
      "mixed-block intensity stereo must decode (round 16)")
  }

  test("mp3 intensity validation probe: the per-window variant discriminates and the verdict picks the matching rule (round 16)") {
    import graft.multimodal.Mp3
    import graft.tools.Mp3IntensityProbe
    // pure-short joint-stereo frame whose right channel extends 16
    // transmission samples: band 1's 3-window block spans 12..24, so
    // rule A (3·bS(1) = 12 < 16) keeps the whole band normal while
    // rule B marks windows 1..2 (16 ≥ 16, 20 ≥ 16) intensity — a
    // genuinely discriminating stream
    def gi(bv: Int) = Mp3.GranuleInfo(0, bv, 170, 13,
      windowSwitching = true, blockType = 2, mixedBlock = false,
      Seq(4, 4), Seq(0, 0, 0), 7, 36, 0, 0, 1)
    val si = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.fill(2)(Seq(gi(24), gi(8))))
    def vals(n: Int, off: Int) = Array.tabulate(n) { i =>
      val m = ((i + off) % 3); if (m != 0 && (i + off) % 5 < 2) -m else m
    }
    val sfs: Seq[Seq[Array[Int]]] = Seq.fill(2)(Seq(
      new Array[Int](36), Array.fill(36)(0))) // positions all 0: route L→R
    val payload = Mp3.encodeSpectra(si, 2, sfs, Seq.fill(2)(Seq(vals(48, 0), vals(16, 1))))
    val stream = Mp3.parseMp3(Mp3.encodeMp3(1, 9, 0,
      java.util.Arrays.copyOf(payload, 413), mode = 1, modeExt = 1)).get
    val a = Mp3.decodePcmStream(stream, 0).get
    val b = Mp3.decodePcmStream(stream, 0, shortIsPerWindow = true).get
    assert(!(a(0).sameElements(b(0)) && a(1).sameElements(b(1))),
      "the fixture does not discriminate the two rules")
    def toRef(pcm: Seq[Array[Double]]): Array[Int] =
      Array.tabulate(pcm.head.length * 2)(i => Mp3.pcm16(pcm(i % 2)(i / 2)))
    // reference produced by rule A -> verdict names A; by B -> names B
    val vsA = Mp3IntensityProbe.verdict(
      Mp3IntensityProbe.compare("A", a, toRef(a)),
      Mp3IntensityProbe.compare("B", b, toRef(a)))
    assert(vsA.contains("variant A"), vsA)
    val vsB = Mp3IntensityProbe.verdict(
      Mp3IntensityProbe.compare("A", a, toRef(b)),
      Mp3IntensityProbe.compare("B", b, toRef(b)))
    assert(vsB.contains("variant B"), vsB)
    // an all-long stream cannot discriminate -> INDISCRIMINATE
    val same = Mp3IntensityProbe.verdict(
      Mp3IntensityProbe.compare("A", a, toRef(a)),
      Mp3IntensityProbe.compare("B", a, toRef(a)))
    assert(same.contains("INDISCRIMINATE"), same)
    // the committed rule is the DEFAULT everywhere (the flag is the
    // probe's discriminator, not a behavior change)
    assert(Mp3.decodePcmStream(stream, 0).get.head.sameElements(a.head))
  }

  test("mp3 MIXED-block intensity stereo: the long+short seam rule by spectral surgery (round 16)") {
    import graft.multimodal.Mp3
    // both granules mixed for both channels, same gg + all-zero requant
    // scalefactors/subblock gains, so routing a sample between channels
    // is BIT-EXACT (the surgery discipline of the short/long tests).
    // Emitter sf order for mixed: 8 long then bands 3..11 × 3 windows.
    def gi(bv: Int) = Mp3.GranuleInfo(0, bv, 170, 13,
      windowSwitching = true, blockType = 2, mixedBlock = true,
      Seq(4, 4), Seq(0, 0, 0), 7, 36, 0, 0, 1)
    def fixture(l: Array[Int], r2: Array[Int], rightSf: Array[Int]): Array[Byte] = {
      require(rightSf.length == 35)
      val si = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
        Seq.fill(2)(Seq(gi(l.length / 2), gi(r2.length / 2))))
      val sfs: Seq[Seq[Array[Int]]] = Seq.fill(2)(Seq(
        new Array[Int](35), rightSf.clone()))
      Mp3.encodeSpectra(si, 2, sfs, Seq.fill(2)(Seq(l, r2)))
    }
    def vals(n: Int, off: Int) = Array.tabulate(n) { i =>
      val m = ((i + off) % 3); if (m != 0 && (i + off) % 5 < 2) -m else m
    }
    // left: 48 transmission samples = the full 36-sample long part +
    // short band 3 (windows 0..2, 4 lines each)
    val left = vals(48, 0)
    val sfAll = (pos: Int) => Array.fill(35)(pos)
    // right all-zero -> rzero = 0: every long band AND every short band
    // is the intensity region (the seam rules agree at zero)
    val plain = Mp3.decodePcm(fixture(left, Array.emptyIntArray, sfAll(6)), 2, 0).get
    val pos6 = Mp3.decodePcm(fixture(left, Array.emptyIntArray, sfAll(6)), 2, 0,
      intensityStereo = true).get
    assert(pos6(0).sameElements(plain(0)) && pos6(1).forall(_ == 0.0),
      "mixed is_pos 6 must leave L exact and zero R")
    val pos0 = Mp3.decodePcm(fixture(left, Array.emptyIntArray, sfAll(0)), 2, 0,
      intensityStereo = true).get
    assert(pos0(0).forall(_ == 0.0), "mixed is_pos 0 must zero L")
    assert((0 until 1152).forall(i => pos0(1)(i) == plain(0)(i)),
      "mixed is_pos 0 must route L to R exactly")
    val pos7 = Mp3.decodePcm(fixture(left, Array.emptyIntArray, sfAll(7)), 2, 0,
      intensityStereo = true).get
    assert(pos7(0).sameElements(plain(0)) && pos7(1).forall(_ == 0.0))
    // THE SEAM: right coded 18 samples into the long part -> rzero = 18;
    // long intensity starts at the first boundary >= 18 (bands(5) = 20,
    // so bands 5..7: samples 20..36), samples 18..20 of band 4 straddle
    // and stay put on BOTH sides; every short band is in the region
    // (3·bS(3) = 36 >= 18). is_pos 0 everywhere: L loses the region,
    // R gains it — restate by surgery in transmission order.
    val right18 = vals(18, 1)
    val seam = Mp3.decodePcm(fixture(left, right18, sfAll(0)), 2, 0,
      intensityStereo = true).get
    val leftSurg = left.zipWithIndex.map { case (v, i) => if (i < 20) v else 0 }
    val rightSurg = right18 ++ Array(0, 0) ++ left.drop(20)
    val expect = Mp3.decodePcm(fixture(leftSurg, rightSurg, sfAll(0)), 2, 0).get
    assert((0 until 1152).forall(i => seam(0)(i) == expect(0)(i)), "L seam")
    assert((0 until 1152).forall(i => seam(1)(i) == expect(1)(i)), "R seam")
    // PER-WINDOW short positions with the long part held left: long
    // positions all 6; short window 1 stays left (6), windows 0/2
    // route right (0) — band 3's 12 transmitted lines split by window
    val sfWin = Array.tabulate(35)(k =>
      if (k < 8) 6 else if ((k - 8) % 3 == 1) 6 else 0)
    val perWin = Mp3.decodePcm(fixture(left, Array.emptyIntArray, sfWin), 2, 0,
      intensityStereo = true).get
    def winOf(src: Int): Int = { // short transmission index -> window
      val bS = Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192)
      val s = bS.indices.dropRight(1).filter(b => 3 * bS(b) <= src).max
      (src - 3 * bS(s)) / (bS(s + 1) - bS(s))
    }
    val leftWin = left.zipWithIndex.map { case (v, i) =>
      if (i < 36 || winOf(i) == 1) v else 0 }
    val rightWin = left.zipWithIndex.map { case (v, i) =>
      if (i >= 36 && winOf(i) != 1) v else 0 }
    val expWin = Mp3.decodePcm(fixture(leftWin, rightWin, sfAll(0)), 2, 0).get
    assert((0 until 1152).forall(i => perWin(0)(i) == expWin(0)(i)), "L per-window")
    assert((0 until 1152).forall(i => perWin(1)(i) == expWin(1)(i)), "R per-window")
  }

  test("mp3 SHORT-window intensity stereo: band-granular zero-part rule, per-(band, window) positions (late round 15)") {
    import graft.multimodal.Mp3
    // pure-short stereo frame: per-channel spectra + right short
    // scalefactors (intensity positions); scalefac_compress 13 -> (3,3)
    def fixture(leftN: Int, rightN: Int, rightSf: Array[Int]): Array[Byte] = {
      require(rightSf.length == 36)
      def gi(bv: Int) = Mp3.GranuleInfo(0, bv, 170, 13,
        windowSwitching = true, blockType = 2, mixedBlock = false,
        Seq(4, 4), Seq(0, 0, 0), 7, 36, 0, 0, 1)
      val si = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
        Seq.fill(2)(Seq(gi(leftN / 2), gi(rightN / 2))))
      // encodeSpectra takes short sfs in (band, window) iteration order
      val sfs: Seq[Seq[Array[Int]]] = Seq.fill(2)(Seq(
        new Array[Int](36), rightSf.clone()))
      def vals(n: Int, off: Int) = Array.tabulate(n) { i =>
        val m = ((i + off) % 3); if (m != 0 && (i + off) % 5 < 2) -m else m
      }
      Mp3.encodeSpectra(si, 2, sfs, Seq.fill(2)(Seq(vals(leftN, 0), vals(rightN, 1))))
    }
    // right all-zero: the whole short spectrum is the intensity region
    val sfAll = (pos: Int) => Array.fill(36)(pos)
    val plain = Mp3.decodePcm(fixture(48, 0, sfAll(6)), 2, 0).get
    val pos6 = Mp3.decodePcm(fixture(48, 0, sfAll(6)), 2, 0, intensityStereo = true).get
    assert(pos6(0).sameElements(plain(0)) && pos6(1).forall(_ == 0.0),
      "short is_pos 6 must leave L exact and zero R")
    val pos0 = Mp3.decodePcm(fixture(48, 0, sfAll(0)), 2, 0, intensityStereo = true).get
    assert(pos0(0).forall(_ == 0.0), "short is_pos 0 must zero L")
    assert((0 until 1152).forall(i => pos0(1)(i) == plain(0)(i)),
      "short is_pos 0 must route L to R exactly")
    val pos7 = Mp3.decodePcm(fixture(48, 0, sfAll(7)), 2, 0, intensityStereo = true).get
    assert(pos7(0).sameElements(plain(0)) && pos7(1).forall(_ == 0.0))
    // shared surgery fixture: both channels sf 0 (positions AND
    // requant exponents agree, so content moves between channels
    // bit-exactly)
    def vals(n: Int, off: Int) = Array.tabulate(n) { i =>
      val m = ((i + off) % 3); if (m != 0 && (i + off) % 5 < 2) -m else m
    }
    def fixtureFull(l: Array[Int], r2: Array[Int]): Array[Byte] = {
      def gi(bv: Int) = Mp3.GranuleInfo(0, bv, 170, 13,
        windowSwitching = true, blockType = 2, mixedBlock = false,
        Seq(4, 4), Seq(0, 0, 0), 7, 36, 0, 0, 1)
      val si = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
        Seq.fill(2)(Seq(gi(l.length / 2), gi(r2.length / 2))))
      val sfs: Seq[Seq[Array[Int]]] = Seq.fill(2)(Seq(
        new Array[Int](36), new Array[Int](36)))
      Mp3.encodeSpectra(si, 2, sfs, Seq.fill(2)(Seq(l, r2)))
    }
    // PER-WINDOW positions: window 1 of every band is_pos 6 (stay
    // left), windows 0/2 is_pos 0 (route right) — restate by spectral
    // surgery in TRANSMISSION order
    val sfPerWin = Array.tabulate(36)(k => if (k % 3 == 1) 6 else 0)
    val mixed = Mp3.decodePcm(fixture(48, 0, sfPerWin), 2, 0,
      intensityStereo = true).get
    val leftIs = vals(48, 0)
    val bS = Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192)
    def winOf(src: Int): Int = { // transmission index -> window
      val s = bS.indices.dropRight(1).filter(b => 3 * bS(b) <= src).max
      (src - 3 * bS(s)) / (bS(s + 1) - bS(s))
    }
    val leftOnly = leftIs.zipWithIndex.map { case (v, i) => if (winOf(i) == 1) v else 0 }
    val rightOnly = leftIs.zipWithIndex.map { case (v, i) => if (winOf(i) != 1) v else 0 }
    val surgery = Mp3.decodePcm(fixtureFull(leftOnly, rightOnly), 2, 0).get
    assert((0 until 1152).forall(i => mixed(0)(i) == surgery(0)(i)), "L per-window")
    assert((0 until 1152).forall(i => mixed(1)(i) == surgery(1)(i)), "R per-window")
    // PARTIAL zero part: right nonzero in its first 12 transmission
    // samples (band 0 complete: 3·bS(1) = 12) -> bands >= 1 are the
    // region; band 0 stays untouched on both sides. is_pos 0 there:
    // L loses the region, R gains it — restate by surgery.
    val rightLow = vals(12, 1)
    val partialIs = Mp3.decodePcm(fixtureFull(leftIs, rightLow), 2, 0,
      intensityStereo = true).get
    val leftLow12 = leftIs.zipWithIndex.map { case (v, i) => if (i < 12) v else 0 }
    val rightSurg = rightLow ++ leftIs.drop(12)
    val expect = Mp3.decodePcm(fixtureFull(leftLow12, rightSurg), 2, 0).get
    assert((0 until 1152).forall(i => partialIs(0)(i) == expect(0)(i)), "L partial bound")
    assert((0 until 1152).forall(i => partialIs(1)(i) == expect(1)(i)), "R partial bound")
  }

  test("mp3 intensity stereo: tan(is_pos·π/12) split — 6 all-left, 0 all-right, 3 even, 7 off; partial zero-part bound (round 15)") {
    import graft.multimodal.Mp3
    // stereo self-contained frame: per-channel spectra + right-channel
    // scalefactors (= intensity positions in the zero-part bands);
    // scalefac_compress 13 -> slen (3,3), so positions 0..7 transmit
    def fixture(left: Array[Int], right: Array[Int],
                rightSf: Array[Int]): Array[Byte] = {
      def gi(bv: Int) = Mp3.GranuleInfo(0, bv, 170, 13,
        windowSwitching = false, blockType = 0, mixedBlock = false,
        Seq(4, 4, 0), Nil, 3, 7, preflag = 0, scalefacScale = 0,
        count1TableSelect = 1)
      val si = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
        Seq.fill(2)(Seq(gi(left.length / 2), gi(right.length / 2))))
      val sfs = Seq.fill(2)(Seq(Array.fill(21)(0), rightSf.clone()))
      Mp3.encodeSpectra(si, 2, sfs, Seq.fill(2)(Seq(left, right)))
    }
    val left = Array(3, -2, 1, 0, 2, -3, 1, 2, -1, 3, 0, 1, 2, -2, 3, -1)
    val emptyR = Array.empty[Int]
    // right all-zero -> bound = sample 0: the whole spectrum is intensity
    val plain = Mp3.decodePcm(fixture(left, emptyR, Array.fill(21)(6)), 2, 0).get
    val pos6 = Mp3.decodePcm(fixture(left, emptyR, Array.fill(21)(6)), 2, 0,
      intensityStereo = true).get
    assert(pos6(0).sameElements(plain(0)), "is_pos 6 must leave L exact")
    assert(pos6(1).forall(_ == 0.0), "is_pos 6 must zero R")
    val pos0 = Mp3.decodePcm(fixture(left, emptyR, Array.fill(21)(0)), 2, 0,
      intensityStereo = true).get
    assert(pos0(0).forall(_ == 0.0), "is_pos 0 must zero L")
    assert((0 until 1152).forall(i => pos0(1)(i) == plain(0)(i)),
      "is_pos 0 must route L's signal to R exactly")
    val pos7 = Mp3.decodePcm(fixture(left, emptyR, Array.fill(21)(7)), 2, 0,
      intensityStereo = true).get
    assert(pos7(0).sameElements(plain(0)) && pos7(1).forall(_ == 0.0),
      "is_pos 7 disables intensity for the band")
    val pos3 = Mp3.decodePcm(fixture(left, emptyR, Array.fill(21)(3)), 2, 0,
      intensityStereo = true).get
    val r = math.tan(3 * math.Pi / 12.0)
    val kl = r / (1.0 + r)
    val scale = plain(0).map(math.abs).max
    for (i <- 0 until 1152) {
      assert(math.abs(pos3(0)(i) - kl * plain(0)(i)) / scale < 1e-9, s"L $i")
      assert(math.abs(pos3(1)(i) - (1.0 - kl) * plain(0)(i)) / scale < 2e-9, s"R $i")
    }
    // PARTIAL zero-part: right nonzero in samples 0..15 -> the intensity
    // region starts at the first band boundary >= 16 (band 4). is_pos 0
    // moves L's region content to R; below the bound both stay put —
    // restate by spectral surgery and compare EXACTLY
    val leftWide = left ++ Array(1, -1, 2, 0, 3, -2, 0, 1, 2, -3, 1, -1, 0, 2, -1, 3)
    val rightLow = Array(2, -1, 0, 3, 1, -2, 2, 0, -3, 1, 2, -1, 0, 2, 1, -2)
    val mixed = Mp3.decodePcm(fixture(leftWide, rightLow, Array.fill(21)(0)),
      2, 0, intensityStereo = true).get
    val surgery = Mp3.decodePcm(fixture(leftWide.take(16),
      rightLow ++ leftWide.drop(16), Array.fill(21)(0)), 2, 0).get
    assert((0 until 1152).forall(i => mixed(0)(i) == surgery(0)(i)), "L below bound")
    assert((0 until 1152).forall(i => mixed(1)(i) == surgery(1)(i)), "R spliced region")
    // MS + IS combined (mode_ext 3): all-7 positions reduce to plain MS
    val payload = fixture(leftWide, rightLow,
      Array.tabulate(21)(b => if (b < 4) 0 else 7))
    val msIs = Mp3.decodePcm(payload, 2, 0, msStereo = true,
      intensityStereo = true).get
    val msOnly = Mp3.decodePcm(payload, 2, 0, msStereo = true).get
    assert(msIs(0).sameElements(msOnly(0)) && msIs(1).sameElements(msOnly(1)))
    // mono + intensity strict-rejects
    assert(Mp3.decodePcm(fixture(left, emptyR, Array.fill(21)(6)), 2, 0,
      intensityStereo = true).isDefined)
    // stream twin: a 2-frame intensity stream decodes; frame 0 == decodePcm
    val payload2 = fixture(left, emptyR, Array.fill(21)(3))
    val flen = 144 * 128000 / 44100
    val framed = java.util.Arrays.copyOf(payload2, flen - 4)
    val stream = Mp3.parseMp3(Mp3.encodeMp3(2, 9, 0, framed ++ framed,
      mode = 1, modeExt = 1)).get
    val spcm = Mp3.decodePcmStream(stream, 0).get
    for (c <- 0 until 2; i <- 0 until 1152)
      assert(spcm(c)(i) == pos3(c)(i), s"stream head ch$c sample $i")
  }

  test("H264 I_PCM strict rejects: cabac, slice groups, field coding, pps mismatch, trailing bytes") {
    import graft.multimodal.H264
    val spsB = H264.encodeSps(66, 30, 0, 0, 0, 1, 0, 0, frameMbsOnly = true, crop = None)
    val sps = H264.parseSps(spsB).get
    val pps = H264.parsePps(H264.encodePps(0, 0, cabac = false)).get
    val mb = Seq(H264.IPcmMb(Array.fill(256)(7), Array.fill(64)(1), Array.fill(64)(2)))
    val rbsp = H264.encodeIPcmSlice(sps, pps, 3, idr = true, 0, 0, 0, 0, mb)
    assert(H264.parseIPcmSlice(rbsp, sps, pps, 3, 5).isDefined)
    // CABAC pps: the entropy seam
    assert(H264.parseIPcmSlice(rbsp, sps, pps.copy(entropyCabac = true), 3, 5).isEmpty)
    // slice groups / redundant-pps / field-coded sps / chroma != 4:2:0
    assert(H264.parseIPcmSlice(rbsp, sps, pps.copy(numSliceGroups = 2), 3, 5).isEmpty)
    assert(H264.parseIPcmSlice(rbsp, sps.copy(frameMbsOnly = false), pps, 3, 5).isEmpty)
    assert(H264.parseIPcmSlice(rbsp, sps.copy(chromaFormatIdc = 2), pps, 3, 5).isEmpty)
    // pps id mismatch
    assert(H264.parseIPcmSlice(rbsp, sps, pps.copy(ppsId = 1), 3, 5).isEmpty)
    // non-slice NAL types
    assert(H264.parseIPcmSlice(rbsp, sps, pps, 3, 7).isEmpty)
    // trailing garbage after rbsp_trailing_bits
    assert(H264.parseIPcmSlice(rbsp :+ 0x55.toByte, sps, pps, 3, 5).isEmpty)
    // a picture the slice does not cover (2-MB sps, 1-MB slice)
    val sps2 = H264.parseSps(H264.encodeSps(66, 30, 0, 0, 0, 1, 1, 0,
      frameMbsOnly = true, crop = None)).get
    assert(H264.parseIPcmSlice(rbsp, sps2, pps, 3, 5).isEmpty)
  }

  test("H264 I_PCM fuzz: byte mutations never escape the Option contract") {
    import graft.multimodal.H264
    val sps = H264.parseSps(H264.encodeSps(66, 30, 0, 0, 0, 1, 0, 0,
      frameMbsOnly = true, crop = None)).get
    val pps = H264.parsePps(H264.encodePps(0, 0, cabac = false)).get
    val rnd = new scala.util.Random(59)
    val base = H264.encodeIPcmSlice(sps, pps, 3, idr = true, 3, 1, 5, 1,
      Seq(H264.IPcmMb(Array.tabulate(256)(_ % 251), Array.fill(64)(9), Array.fill(64)(200))))
    var decoded = 0
    for (_ <- 0 until 300) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(3))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      H264.parseIPcmSlice(m, sps, pps, 3, 5) match { // must not throw
        case Some(sl) => decoded += 1; assert(sl.mbs.head.luma.length == 256)
        case None =>
      }
    }
    assert(decoded > 0, "sample-region mutations should still decode")
  }

  // ---- MP3 Layer III DSP to PCM (round 14) ----

  /** A stereo self-contained frame payload with the given per-channel
    * spectra in subband-0..n positions (shared by the DSP tests). */
  private def pcmFixture(isByCh: Seq[Array[Int]], gg: Int = 170): Array[Byte] = {
    import graft.multimodal.Mp3
    def gi(bv: Int) = Mp3.GranuleInfo(0, bv, gg, 9, windowSwitching = false,
      blockType = 0, mixedBlock = false, Seq(4, 14, 0), Nil, 3, 7,
      preflag = 0, scalefacScale = 0, count1TableSelect = 1)
    val si = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.fill(2)(Seq.tabulate(2)(ch => gi(isByCh(ch).length / 2))))
    val sfs = Seq.fill(2)(Seq.fill(2)(Array.fill(21)(0)))
    Mp3.encodeSpectra(si, 2, sfs,
      Seq.fill(2)(Seq.tabulate(2)(ch => isByCh(ch))))
  }

  test("MP3 PCM: shapes, zero spectrum, determinism, strict rejects") {
    import graft.multimodal.Mp3
    val is0 = Array(3, -2, 1, 0, 0, 2, -1, 3) // 4 big-values pairs, subband 0
    val p = pcmFixture(Seq(is0, is0.map(-_)))
    val pcm = Mp3.decodePcm(p, 2, 0).get
    assert(pcm.length == 2 && pcm.forall(_.length == 1152))
    assert(pcm.head.exists(_ != 0.0), "nonzero spectrum must synthesize nonzero PCM")
    // deterministic: decode twice, bit-identical
    val again = Mp3.decodePcm(p, 2, 0).get
    assert(pcm.zip(again).forall { case (a, b) => a.sameElements(b) })
    // zero spectrum -> exactly zero PCM end to end
    val zero = Mp3.decodePcm(pcmFixture(Seq(Array.empty[Int], Array.empty[Int])), 2, 0).get
    assert(zero.forall(_.forall(_ == 0.0)))
    // msStereo on mono strict-rejects
    assert(Mp3.decodePcm(p, 2, 0, msStereo = true).isDefined)
    val mono = {
      def gi = Mp3.GranuleInfo(0, 0, 170, 9, windowSwitching = false,
        blockType = 0, mixedBlock = false, Seq(0, 0, 0), Nil, 3, 7, 0, 0, 1)
      Mp3.encodeSpectra(Mp3.SideInfo(0, 0, Seq.fill(1)(Seq.fill(4)(0)),
          Seq.fill(2)(Seq.fill(1)(gi))), 1,
        Seq.fill(2)(Seq.fill(1)(Array.fill(21)(0))),
        Seq.fill(2)(Seq.fill(1)(Array.empty[Int])))
    }
    assert(Mp3.decodePcm(mono, 1, 0).isDefined)
    assert(Mp3.decodePcm(mono, 1, 0, msStereo = true).isEmpty)
    // a bad synthesis window fails fast
    intercept[IllegalArgumentException] {
      graft.multimodal.Mp3.synthesize(Array.fill(1)(new Array[Double](32)),
        new Array[Double](100))
    }
  }

  test("MP3 MS stereo: identical channels cancel the side channel exactly") {
    import graft.multimodal.Mp3
    val is0 = Array(3, -2, 1, 0, 2, 2, -1, 3)
    // M == S => L = sqrt(2)*M, R = 0 exactly ((m-s)/sqrt2 with m == s)
    val p = pcmFixture(Seq(is0, is0))
    val pcm = Mp3.decodePcm(p, 2, 0, msStereo = true).get
    assert(pcm(1).forall(_ == 0.0), "R channel must cancel to exact zeros")
    assert(pcm(0).exists(_ != 0.0))
    // and the L channel is the plain decode scaled by exactly sqrt(2):
    // (m+s)/sqrt2 = 2m/sqrt2; every later stage is linear in the spectrum
    val plain = Mp3.decodePcm(p, 2, 0).get
    val s2 = math.sqrt(2.0)
    pcm(0).zip(plain(0)).foreach { case (l, m) =>
      assert(math.abs(l - 2.0 * m / s2) <= 1e-12 * math.max(1.0, math.abs(l)))
    }
  }

  test("MP3 alias reduction: butterflies preserve energy and touch only boundary bands") {
    import graft.multimodal.Mp3
    val rnd = new scala.util.Random(7)
    val xr = Array.fill(576)(rnd.nextDouble() * 2 - 1)
    val out = Mp3.aliasReduce(xr)
    // each butterfly is a rotation (cs^2 + ca^2 = 1): total energy invariant
    val e0 = xr.map(v => v * v).sum
    val e1 = out.map(v => v * v).sum
    assert(math.abs(e0 - e1) <= 1e-9 * e0)
    // samples 8..9 of each subband (distance > 7 from both boundaries) pass through
    for (sb <- 0 until 32; j <- 8 to 9) assert(out(18 * sb + j) == xr(18 * sb + j))
    // a boundary sample really changed
    assert(out(17) != xr(17))
  }

  test("MP3 synthesis FIFO: an impulse slot echoes through 16 slots at window positions") {
    import graft.multimodal.Mp3
    // one nonzero slot (t = 0, subband 0 = 1.0): V_0(o) = cos((16+o)pi/64)
    // and pcm(t, j) = D(j + 32t) * V_0(j or 32+j by t parity) for t < 16
    val bands = Array.fill(18)(new Array[Double](32))
    bands(0)(0) = 1.0
    val w = Mp3.fixtureSynthWindow
    val pcm = Mp3.synthesize(bands, w)
    def v0(o: Int): Double = math.cos((16 + o) * 1 * math.Pi / 64.0)
    for (t <- 0 until 18; j <- 0 until 32) {
      val expect =
        if (t >= 16) 0.0
        else w(j + 32 * t) * v0(if (t % 2 == 0) j else 32 + j)
      assert(math.abs(pcm(t * 32 + j) - expect) <= 1e-15,
        s"t=$t j=$j got ${pcm(t * 32 + j)} want $expect")
    }
  }

  test("MP3 pcm16: floor-based half-up rounding with saturation") {
    import graft.multimodal.Mp3
    assert(Mp3.pcm16(0.0) == 0)
    assert(Mp3.pcm16(1.0) == 32767) // 32768 clamps
    assert(Mp3.pcm16(-1.0) == -32768)
    assert(Mp3.pcm16(10.0) == 32767 && Mp3.pcm16(-10.0) == -32768)
    assert(Mp3.pcm16(0.5 / 32768.0) == 1) // floor(0.5 + 0.5) = 1: half rounds up
    assert(Mp3.pcm16(-0.5 / 32768.0) == 0) // floor(-0.5 + 0.5) = 0 (not away-from-zero)
    assert(Mp3.pcm16(0.49999 / 32768.0) == 0)
  }

  test("MP3 PCM fuzz: byte mutations never escape the Option contract") {
    import graft.multimodal.Mp3
    val is0 = Array(3, -2, 1, 0, 0, 2, -1, 3)
    val base = pcmFixture(Seq(is0, is0.map(v => -v)))
    val rnd = new scala.util.Random(41)
    var decoded = 0
    for (_ <- 0 until 300) {
      val m = base.clone()
      val n = 1 + rnd.nextInt(3)
      for (_ <- 0 until n)
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Mp3.decodePcm(m, 2, 0) match { // must not throw
        case Some(pcm) =>
          decoded += 1
          assert(pcm.length == 2 && pcm.forall(_.length == 1152))
          assert(pcm.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
        case None =>
      }
    }
    assert(decoded > 0, "some mutations should still decode (e.g. main-data bit flips)")
  }

  test("MP3 caller-supplied codebooks: spec parses, real id decodes, absent id strict-rejects") {
    import graft.multimodal.Mp3
    // a canonical toy stand-in for ISO table 1 ((x, y) in 0..1, linbits 0):
    // in a real deployment the user pastes the B.7 transcription they trust
    val spec =
      """# user-supplied codebook file
        |table 1 linbits 0
        |1 0 0
        |01 1 0   # trailing comment
        |001 0 1
        |000 1 1
        |count1
        |0111 1 0 1 1
        |window
        |""".stripMargin + (0 until 512).map(i => (i % 3) * 0.25).mkString(" ")
    val tables = Mp3.parseHuffTablesSpec(spec)
    assert(tables.keySet == Set(1) && tables(1).codes.size == 4 && tables(1).linbits == 0)
    val c1 = Mp3.parseCount1Spec(spec)
    assert(c1.codes == Map("0111" -> ((1, 0, 1, 1))))
    val win = Mp3.parseSynthWindowSpec(spec)
    assert(win.length == 512 && win(1) == 0.25 && win(0) == 0.0)
    // a frame whose region0 uses REAL id 1: decodes iff the codebook is supplied
    def gi(bv: Int) = Mp3.GranuleInfo(0, bv, 170, 9, windowSwitching = false,
      blockType = 0, mixedBlock = false, Seq(1, 14, 0), Nil, 3, 7, 0, 0, 1)
    val si = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.fill(2)(Seq.fill(2)(gi(4))))
    val is = Array(1, 0, 0, 1, -1, 1, 1, -1)
    val merged = Mp3.fixtureTables ++ tables
    val payload = Mp3.encodeSpectra(si, 2,
      Seq.fill(2)(Seq.fill(2)(Array.fill(21)(0))),
      Seq.fill(2)(Seq.fill(2)(is)), tables = merged)
    assert(Mp3.decodeSpectra(payload, 2, 0).isEmpty, "id 1 without a codebook must reject")
    val sp = Mp3.decodeSpectra(payload, 2, 0, tables = merged).get
    assert(sp.head.head.is.take(8).sameElements(is))
    assert(Mp3.decodePcm(payload, 2, 0, tables = merged, synthWindow = win).isDefined)
    // malformed specs fail fast
    intercept[IllegalArgumentException](Mp3.parseHuffTablesSpec("table 0 linbits 0\n1 0 0"))
    intercept[IllegalArgumentException](Mp3.parseHuffTablesSpec("table 2 linbits 0\n1 0 99"))
    intercept[IllegalArgumentException](Mp3.parseCount1Spec("count1\n01 2 0 0 0"))
    intercept[IllegalArgumentException](Mp3.parseSynthWindowSpec("window\n1.0 2.0"))
  }

  // ---- AAC ADTS (round 12) ----

  test("AAC golden fixture: hand-computed 7-byte header bytes, fields + duration") {
    import graft.multimodal.Aac
    val payload = Array[Byte](1, 2, 3, 4)
    // LC (1), rateIdx 4 = 44100, stereo, no CRC → frameLen 11:
    // FF F1 | (01)(0100)(0)(0)=0x50 | (10)(00...)=0x80 | len bits
    val golden = Array(0xFF, 0xF1, 0x50, 0x80, 0x01, 0x7F, 0xFC).map(_.toByte) ++ payload
    assert(Aac.encodeFrame(1, 4, 2, payload).sameElements(golden))
    val s = Aac.parse(golden).get
    val f = s.frames.head
    assert(f.profile == 1 && s.sampleRate == 44100 && f.channels == 2)
    assert(f.frameLength == 11 && !f.crcPresent && f.nRawBlocks == 1)
    assert(f.payload.sameElements(payload))
    assert(s.durationMs == 1024L * 1000L / 44100L)
  }

  test("AAC frame walk: CRC-present layout, multi-frame chain, strict rejects") {
    import graft.multimodal.Aac
    val frames = Seq(
      (0, 3, 1, Array[Byte](9, 8, 7), Some(0xBEEF)),      // CRC present: 9-byte header
      (0, 3, 1, Array[Byte](6, 5), None),
      (0, 3, 1, Array.fill[Byte](20)(3), None))
    val bytes = Aac.encode(frames)
    val s = Aac.parse(bytes).get
    assert(s.frames.size == 3)
    assert(s.frames(0).crcPresent && s.frames(0).payload.sameElements(Array[Byte](9, 8, 7)))
    assert(!s.frames(1).crcPresent && s.frames(1).payload.sameElements(Array[Byte](6, 5)))
    assert(s.sampleRate == 48000 && s.durationMs == 3 * 1024L * 1000L / 48000L)
    // strict rejects: bad sync, truncated tail, reserved rate index
    assert(Aac.parse(bytes.updated(0, 0xFE.toByte)).isEmpty)
    assert(Aac.parse(bytes.dropRight(1)).isEmpty)
    val badRate = Aac.encodeFrame(1, 12, 1, Array[Byte](1))
    assert(Aac.parse(badRate.updated(2, (badRate(2) | (13 << 2)).toByte)).isEmpty)
    // CRC + multi-block layout (undecoded §6.2 error-check fields) rejected:
    // flip number_of_raw_data_blocks on a CRC-present frame
    val crcFrame = Aac.encodeFrame(0, 3, 1, Array[Byte](9, 8, 7), crc = Some(0xBEEF))
    assert(Aac.parse(crcFrame.updated(6, (crcFrame(6) | 1).toByte)).isEmpty)
    // mixed rate/channel streams rejected (head-frame reporting would lie)
    val mixed = Aac.encodeFrame(0, 3, 1, Array[Byte](1)) ++
      Aac.encodeFrame(0, 4, 1, Array[Byte](2))
    assert(Aac.parse(mixed).isEmpty)
    // round-12 ADVICE: the encoder must not ASSEMBLE a layout its own
    // parser strictly rejects — CRC + multi-block fails at build time
    val e = intercept[IllegalArgumentException](
      Aac.encodeFrame(0, 3, 1, Array[Byte](1), nRawBlocks = 2, crc = Some(0xBEEF)))
    assert(e.getMessage.contains("multi-block"))
    // each arm alone stays encodable (and parseable)
    assert(Aac.parse(Aac.encodeFrame(0, 3, 1, Array[Byte](1), nRawBlocks = 2)).isDefined)
    assert(Aac.parse(Aac.encodeFrame(0, 3, 1, Array[Byte](1), crc = Some(1))).isDefined)
  }

  // ---- MP3 bit-reservoir stream decode (round 14) ----

  private def mp3FrameSpec(k: Long): (graft.multimodal.Mp3.SideInfo, Seq[Seq[Array[Int]]], Seq[Seq[Array[Int]]]) = {
    import graft.multimodal.Mp3
    val nBig = 2 * (20 + (k % 5)).toInt
    val nC1 = 4 * (4 + (k % 3)).toInt
    def value(i: Int): Int = {
      val mag =
        if (i < 16) ((k + i) % 4).toInt
        else if (i < nBig) ((k + i) % 4).toInt match {
          case 0 => 0; case 1 | 2 => 1; case _ => 15 + ((k + i) % 8).toInt
        }
        else ((k + i) % 2).toInt
      if (mag != 0 && (k + i) % 5 < 2) -mag else mag
    }
    val is = Array.tabulate(nBig + nC1)(value)
    def gi(g: Int, ch: Int) = Mp3.GranuleInfo(0, nBig / 2,
      ((5 * k + 17 * g + 29 * ch) % 256).toInt, 9,
      windowSwitching = false, blockType = 0, mixedBlock = false,
      Seq(4, 14, 0), Nil, 3, 7, (k % 2).toInt, ((k + g) % 2).toInt, ((k + g) % 2).toInt)
    val si = Mp3.SideInfo(0, (k % 8).toInt, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
    (si, Seq.fill(2)(Seq.fill(2)(Array.tabulate(21)(b => ((k + b) % 4).toInt))),
      Seq.fill(2)(Seq.fill(2)(is)))
  }

  test("mp3 reservoir: frames decode from earlier slots; integers round-trip; stream of one mdb=0 frame == decodeSpectra") {
    import graft.multimodal.Mp3
    val specs = (0 until 3).map(f => mp3FrameSpec(11L + 7 * f))
    val bytes = Mp3.encodeMp3Reservoir(9, 0, specs)
    val stream = Mp3.parseMp3(bytes).get
    // the reservoir IS exercised: frames 1..2 point backward
    val mdbs = stream.framePayloads.map(p => Mp3.parseSideInfo(p, 2).get.mainDataBegin)
    assert(mdbs.head == 0 && mdbs.tail.forall(_ > 0), s"mdbs $mdbs")
    val sp = Mp3.decodeSpectraStream(stream, 0).get
    for (f <- 0 until 3; g <- 0 until 2; ch <- 0 until 2) {
      val want = specs(f)._3(g)(ch)
      assert(java.util.Arrays.equals(sp(f)(g)(ch).is.take(want.length), want),
        s"frame $f g$g ch$ch integers differ")
      assert(sp(f)(g)(ch).is.drop(want.length).forall(_ == 0))
    }
    // a 1-frame mdb=0 stream is exactly the self-contained decode
    val one = Mp3.encodeMp3Reservoir(9, 0, specs.take(1))
    val oneStream = Mp3.parseMp3(one).get
    val viaStream = Mp3.decodeSpectraStream(oneStream, 0).get.head
    val viaSelf = Mp3.decodeSpectra(oneStream.framePayloads.head, 2, 0).get
    for (g <- 0 until 2; ch <- 0 until 2) {
      assert(java.util.Arrays.equals(viaStream(g)(ch).is, viaSelf(g)(ch).is))
      assert(viaStream(g)(ch).xr.sameElements(viaSelf(g)(ch).xr))
    }
  }

  test("mp3 reservoir strict rejects: pointer before stream start; mutation fuzz never crashes") {
    import graft.multimodal.Mp3
    val (si, sfs, sp) = mp3FrameSpec(3L)
    // a first frame claiming 5 bytes of history that does not exist
    val payload = Mp3.encodeSpectra(si.copy(mainDataBegin = 5), 2, sfs, sp)
    val bytes = Mp3.encodeMp3(1, 9, 0, java.util.Arrays.copyOf(payload, 413))
    assert(Mp3.decodeSpectraStream(Mp3.parseMp3(bytes).get, 0).isEmpty)
    val good = Mp3.encodeMp3Reservoir(9, 0, (0 until 3).map(f => mp3FrameSpec(4L + 7 * f)))
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 200) {
      val c = good.clone()
      val bit = rnd.nextInt(c.length * 8)
      c(bit >> 3) = (c(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      Mp3.parseMp3(c).foreach(s => Mp3.decodeSpectraStream(s, 0)) // Option contract
    }
  }

  test("mp3 decodePcmStream: threaded state — an all-zero second frame still rings the first frame's tail") {
    import graft.multimodal.Mp3
    // PCM-scaled gain (the formula spec's 30..90 gains give xr ~ 2^-45)
    val base = mp3FrameSpec(6L)
    val loud = base.copy(_1 = base._1.copy(granules = base._1.granules.map(
      _.map(_.copy(globalGain = 190)))))
    // a genuinely-zero frame: zero spectra, zero scale factors
    val zeroGi = Mp3.GranuleInfo(0, 0, 170, 9, windowSwitching = false,
      blockType = 0, mixedBlock = false, Seq(0, 0, 0), Nil, 3, 7, 0, 0, 0)
    val zeroSi = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.fill(2)(Seq.fill(2)(zeroGi)))
    val zero = (zeroSi, Seq.fill(2)(Seq.fill(2)(Array.fill(21)(0))),
      Seq.fill(2)(Seq.fill(2)(Array.empty[Int])))
    val stream = Mp3.parseMp3(Mp3.encodeMp3Reservoir(9, 0, Seq(loud, zero))).get
    val pcm = Mp3.decodePcmStream(stream, 0).get
    assert(pcm.head.length == 2304) // 1152 x 2 frames, gapless
    // fresh-state decode of the zero frame alone is EXACTLY silent...
    val zeroAlone = Mp3.parseMp3(Mp3.encodeMp3Reservoir(9, 0, Seq(zero))).get
    assert(Mp3.decodePcmStream(zeroAlone, 0).get.head.forall(_ == 0.0))
    // ...but after the loud frame, the threaded overlap-add tail + FIFO
    // history make the second frame's samples nonzero
    assert(pcm.head.drop(1152).exists(v => math.abs(v) > 1e-9),
      "second-frame samples are silent — state did not thread across frames")
    // and a 1-frame stream decode equals the per-frame decodePcm bit-for-bit
    val oneStream = Mp3.parseMp3(Mp3.encodeMp3Reservoir(9, 0, Seq(loud))).get
    val a = Mp3.decodePcmStream(oneStream, 0).get
    val b = Mp3.decodePcm(oneStream.framePayloads.head, 2, 0).get
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  // ---- AAC-LC raw_data_block decode (round 14) ----

  private def aacFixtureSce(seed: Long): (Array[Byte], Array[Int], Array[Int], Array[Int]) = {
    import graft.multimodal.Aac
    val maxSfb = (8 + seed % 4).toInt
    val gg = (96 + seed % 8).toInt
    val sectCb = Array.tabulate(maxSfb)(s => if ((seed + s) % 3 == 0) 0 else 12)
    val sf = Array.tabulate(maxSfb)(s =>
      if (sectCb(s) == 0) 0 else gg + ((seed + 3 * s) % 9).toInt - 4)
    val quant = Array.tabulate(1024) { i =>
      val s = i / 32
      if (s >= maxSfb || sectCb(s) == 0) 0
      else {
        val mag = ((seed + i) % 3).toInt
        if (mag != 0 && (seed + i) % 5 < 2) -mag else mag
      }
    }
    (Aac.encodeSce(gg, maxSfb, sectCb, sf, quant), sectCb, sf, quant)
  }

  /** Stereo CPE fixture: per-channel formula streams (sf/quant offset by
    * channel), shared max_sfb, ms mask by seed parity when present. */
  private def aacFixtureCpe(seed: Long, msMaskPresent: Int,
                            commonWindow: Boolean = true):
      (Array[Byte], Array[Array[Int]], Array[Array[Int]], Array[Array[Int]], Array[Boolean]) = {
    import graft.multimodal.Aac
    val maxSfb = (8 + seed % 4).toInt
    val gg = Array.tabulate(2)(c => (96 + (seed + 5 * c) % 8).toInt)
    val sectCb = Array.tabulate(2, maxSfb)((c, s) =>
      if ((seed + s + c) % 3 == 0) 0 else 12)
    val sf = Array.tabulate(2, maxSfb)((c, s) =>
      if (sectCb(c)(s) == 0) 0 else gg(c) + ((seed + 3 * s + 2 * c) % 9).toInt - 4)
    val quant = Array.tabulate(2, 1024) { (c, i) =>
      val s = i / 32
      if (s >= maxSfb || sectCb(c)(s) == 0) 0
      else {
        val mag = ((seed + i + 7 * c) % 3).toInt
        if (mag != 0 && (seed + i + c) % 5 < 2) -mag else mag
      }
    }
    val msUsed = Array.tabulate(maxSfb)(s => (seed + s) % 2 == 0)
    val payload = Aac.encodeCpe(gg.toSeq, Seq(maxSfb, maxSfb),
      sectCb.toSeq, sf.toSeq, quant.toSeq,
      commonWindow = commonWindow, msMaskPresent = msMaskPresent,
      msUsed = if (msMaskPresent == 1) msUsed else Array.empty)
    (payload, sectCb.map(_.toArray), sf.map(_.toArray), quant.map(_.toArray), msUsed)
  }

  test("aac CPE: encode -> decode round-trips both channels; MS mask 0/1/2 reconstructs per band") {
    import graft.multimodal.Aac
    for (seed <- 0L to 5L; mask <- 0 to 2) {
      val (payload, sectCb, sf, quant, msUsed) = aacFixtureCpe(seed, mask)
      val p = Aac.decodeCpe(payload).getOrElse(fail(s"seed $seed mask $mask: no decode"))
      assert(p.commonWindow && p.msMaskPresent == mask)
      for (c <- 0 until 2) {
        val ch = if (c == 0) p.left else p.right
        assert(ch.sectCb.sameElements(sectCb(c)), s"sections ch$c seed $seed")
        assert(ch.sf.sameElements(sf(c)), s"scalefactors ch$c seed $seed")
        assert(ch.quant.sameElements(quant(c)), s"integers ch$c seed $seed")
      }
      // §12.2 per-band MS: l = m + s, r = m − s where the mask is on
      val maxSfb = sectCb(0).length
      for (s <- 0 until maxSfb; i <- s * 32 until (s + 1) * 32) {
        val on = mask == 2 || (mask == 1 && msUsed(s))
        val (wl, wr) =
          if (on) (p.left.xr(i) + p.right.xr(i), p.left.xr(i) - p.right.xr(i))
          else (p.left.xr(i), p.right.xr(i))
        assert(p.xrMs(0)(i) == wl && p.xrMs(1)(i) == wr,
          s"MS mismatch seed $seed mask $mask sfb $s i $i")
      }
    }
  }

  test("aac CPE: common_window = 0 carries two independent ics_infos, no MS") {
    import graft.multimodal.Aac
    val (payload, _, _, quant, _) = aacFixtureCpe(3L, 0, commonWindow = false)
    val p = Aac.decodeCpe(payload).get
    assert(!p.commonWindow && p.msMaskPresent == 0)
    assert(p.left.quant.sameElements(quant(0)) && p.right.quant.sameElements(quant(1)))
    assert(p.xrMs(0).sameElements(p.left.xr) && p.xrMs(1).sameElements(p.right.xr))
  }

  test("aac CPE strict rejects: element-id cross-talk, reserved ms_mask 3, trailing bytes, mutation fuzz") {
    import graft.multimodal.Aac
    val (cpe, _, _, _, _) = aacFixtureCpe(1L, 1)
    val (sce, _, _, _) = aacFixtureSce(1L)
    assert(Aac.decodeCpe(sce).isEmpty, "SCE payload accepted as CPE")
    assert(Aac.decodeSpectra(cpe).isEmpty, "CPE payload accepted as SCE")
    // ms_mask_present sits at bits 19..20 (id 3 + tag 4 + cw 1 + ics_info 11);
    // setting bit 19 turns mask 01 into the reserved 11
    val c = cpe.clone()
    c(19 >> 3) = (c(19 >> 3) | (1 << (7 - (19 & 7)))).toByte
    assert(Aac.decodeCpe(c).isEmpty, "reserved ms_mask_present 3 accepted")
    assert(Aac.decodeCpe(cpe :+ 0x40.toByte).isEmpty, "trailing byte accepted")
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 200) {
      val m = cpe.clone()
      val bit = rnd.nextInt(m.length * 8)
      m(bit >> 3) = (m(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      Aac.decodeCpe(m) // Option contract: None or a decode, never a throw
    }
  }

  test("aac CPE PCM: one frame == stream head; per-channel threaded overlap rings into a silent frame") {
    import graft.multimodal.Aac
    val (payload, _, _, _, _) = aacFixtureCpe(2L, 2)
    val pcm = Aac.decodeCpePcm(payload).get
    assert(pcm.length == 2 && pcm.forall(_.length == 1024))
    assert(pcm(0).exists(_ != 0.0) && pcm(1).exists(_ != 0.0))
    assert(!pcm(0).sameElements(pcm(1)), "stereo channels collapsed")
    val one = Aac.parse(Aac.encodeFrame(1, 4, 2, payload)).get
    val viaStream = Aac.decodeCpePcmStream(one).get
    for (c <- 0 until 2) assert(viaStream(c).sameElements(pcm(c)))
    // silent CPE second frame: both channels still ring the first's tail
    val silent = Aac.encodeCpe(Seq(100, 100), Seq(0, 0),
      Seq(Array.empty, Array.empty), Seq(Array.empty, Array.empty),
      Seq(new Array[Int](1024), new Array[Int](1024)))
    val two = Aac.parse(Aac.encodeFrame(1, 4, 2, payload) ++
      Aac.encodeFrame(1, 4, 2, silent)).get
    val out = Aac.decodeCpePcmStream(two).get
    for (c <- 0 until 2) {
      assert(out(c).length == 2048)
      assert(out(c).drop(1024).exists(v => math.abs(v) > 1e-9),
        s"channel $c tail is silent — overlap did not thread")
    }
  }

  test("aac decodeSpectra: encode -> decode round-trips sections, DPCM scalefactors and every integer") {
    import graft.multimodal.Aac
    for (seed <- 0L to 7L) {
      val (payload, sectCb, sf, quant) = aacFixtureSce(seed)
      val ch = Aac.decodeSpectra(payload).get
      assert(ch.globalGain == (96 + seed % 8).toInt && ch.maxSfb == sectCb.length)
      assert(ch.sectCb.sameElements(sectCb), s"sections differ at seed $seed")
      assert(ch.sf.sameElements(sf), s"scalefactors differ at seed $seed")
      assert(ch.quant.sameElements(quant), s"spectrum differs at seed $seed")
      // dequantization: per-band exponent, SF_OFFSET 100, 4/3 power law
      val i = quant.indexWhere(_ != 0)
      val s = i / 32
      val want = math.signum(quant(i).toDouble) *
        math.pow(math.abs(quant(i).toDouble), 4.0 / 3.0) *
        math.pow(2.0, 0.25 * (sf(s) - 100))
      assert(ch.xr(i) == want)
    }
  }

  test("aac escape path: caller-supplied book 11 decodes 16..36 magnitudes; strict reject without") {
    import graft.multimodal.Aac
    val spec =
      """book 11 dim 2 signed 0 escape 1
        |0 0 0
        |100 0 1
        |101 1 0
        |110 1 1
        |11100 0 16
        |11101 16 0
        |111100 1 16
        |111101 16 1
        |111110 16 16""".stripMargin
    val user = Aac.parseAacBooksSpec(spec)
    assert(user(11).escape && user(11).dim == 2)
    val merged = Aac.fixtureBooks ++ user
    // every escape magnitude 16..36 round-trips (one per pair, partner 1)
    val quant = Array.tabulate(1024)(i =>
      if (i >= 64) 0
      else if (i % 2 == 0) { val m = 16 + (i / 2) % 21; if (i % 4 == 0) -m else m }
      else 1)
    val payload = Aac.encodeSce(100, 2, Array(11, 11), Array(100, 100),
      quant, books = merged)
    val ch = Aac.decodeSpectra(payload, books = merged).get
    assert(ch.quant.sameElements(quant))
    // the provenance contract: id 11 strict-rejects on the fixture mount
    assert(Aac.decodeSpectra(payload).isEmpty)
  }

  test("aac strict rejects: KBD shape, short windows, predictor/pulse bits, non-SCE lead, missing END") {
    import graft.multimodal.Aac
    val (payload, _, _, _) = aacFixtureSce(3L)
    def flipBit(b: Array[Byte], bit: Int): Array[Byte] = {
      val c = b.clone(); c(bit >> 3) = (c(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte; c
    }
    // bit layout: id_syn_ele(3) tag(4) gain(8) reserved(1) winseq(2) shape(1)...
    assert(Aac.decodeSpectra(flipBit(payload, 0)).isEmpty,  "non-SCE lead accepted")
    assert(Aac.decodeSpectra(flipBit(payload, 15)).isEmpty, "ics_reserved accepted")
    assert(Aac.decodeSpectra(flipBit(payload, 16)).isEmpty, "short window accepted")
    assert(Aac.decodeSpectra(flipBit(payload, 18)).isEmpty, "KBD shape accepted")
    assert(Aac.decodeSpectra(flipBit(payload, 25)).isEmpty, "predictor bit accepted")
    // truncation ahead of END: the walk must fail, not misparse
    assert(Aac.decodeSpectra(payload.take(payload.length / 2)).isEmpty)
  }

  test("aac imdct2048: TDAC antisymmetry x(1023-n) = -x(n) and linearity") {
    import graft.multimodal.Aac
    val rnd = new scala.util.Random(7)
    val xr = Array.fill(1024)(if (rnd.nextInt(4) == 0) rnd.nextGaussian() else 0.0)
    for (n <- Seq(0, 13, 200, 511)) {
      val a = Aac.imdct2048(xr, n)
      val b = Aac.imdct2048(xr, 1023 - n)
      assert(math.abs(a + b) < 1e-12, s"TDAC antisymmetry broken at n=$n: $a vs $b")
    }
    val xr2 = xr.map(_ * 2.0)
    assert(math.abs(Aac.imdct2048(xr2, 77) - 2.0 * Aac.imdct2048(xr, 77)) < 1e-12)
  }

  test("aac FFT-factored IMDCT == direct spec sum at <=1e-9 (sparse, dense, impulse, empty)") {
    import graft.multimodal.{Aac, Dsp}
    val rnd = new scala.util.Random(19)
    val spectra = Seq(
      Array.fill(1024)(if (rnd.nextInt(4) == 0) rnd.nextGaussian() * 100 else 0.0),
      Array.fill(1024)(rnd.nextGaussian()),                 // dense
      Array.tabulate(1024)(k => if (k == 0) 1.0 else 0.0),  // DC impulse
      Array.tabulate(1024)(k => if (k == 1023) -3.5 else 0.0),
      new Array[Double](1024))                              // silence
    for (xr <- spectra) {
      val fast = Dsp.imdct2048Full(xr)
      assert(fast.length == 2048)
      val scale = 1.0 + xr.map(math.abs).max
      var worst = 0.0
      for (n <- 0 until 2048) {
        val d = math.abs(fast(n) - Aac.imdct2048(xr, n)) / scale
        if (d > worst) worst = d
      }
      assert(worst <= 1e-9, s"FFT IMDCT diverges from the direct sum: $worst")
    }
  }

  test("aac decodePcm: deterministic, 1024 samples, mutation fuzz never crashes") {
    import graft.multimodal.Aac
    val (payload, _, _, _) = aacFixtureSce(5L)
    val p1 = Aac.decodePcm(payload).get
    val p2 = Aac.decodePcm(payload).get
    assert(p1.length == 1024 && p1.sameElements(p2))
    assert(p1.exists(_ != 0.0))
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val c = payload.clone()
      val bit = rnd.nextInt(c.length * 8)
      c(bit >> 3) = (c(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      Aac.decodePcm(c) // Option contract: None or a decode, never a throw
    }
  }

  test("aac decodePcmStream: threaded overlap-add — one frame == decodePcm; a silent second frame rings the tail") {
    import graft.multimodal.Aac
    val (payload, _, _, _) = aacFixtureSce(2L)
    val one = Aac.parse(Aac.encodeFrame(1, 4, 1, payload)).get
    val viaStream = Aac.decodePcmStream(one).get
    val viaFrame = Aac.decodePcm(payload).get
    assert(viaStream.sameElements(viaFrame)) // zero history at stream start
    // silent frame: max_sfb 0 (no sections, no spectra)
    val silent = Aac.encodeSce(100, 0, Array.empty, Array.empty, new Array[Int](1024))
    val two = Aac.parse(Aac.encodeFrame(1, 4, 1, payload) ++
      Aac.encodeFrame(1, 4, 1, silent)).get
    val pcm = Aac.decodePcmStream(two).get
    assert(pcm.length == 2048)
    assert(Aac.decodePcmStream(Aac.parse(Aac.encodeFrame(1, 4, 1, silent)).get)
      .get.forall(_ == 0.0)) // fresh-state silent frame is exactly silent
    assert(pcm.drop(1024).exists(v => math.abs(v) > 1e-9),
      "second-frame samples are silent — overlap did not thread")
  }

  test("aac strict rejects trailing bytes after END; zero byte-align padding only (r14 ADVICE)") {
    import graft.multimodal.Aac
    val (payload, _, _, _) = aacFixtureSce(4L)
    assert(Aac.decodeSpectra(payload).isDefined) // baseline: clean payload decodes
    // a whole trailing byte after the aligned END is rejected (only the
    // byte-align padding is legitimate there)
    assert(Aac.decodeSpectra(payload :+ 0x00.toByte).isEmpty)
    assert(Aac.decodeSpectra(payload :+ 0x5A.toByte).isEmpty)
    // nonzero alignment padding is rejected: flip the payload's last bit
    // iff END did not land byte-aligned (otherwise appending garbage covers it)
    val c = payload.clone()
    c(c.length - 1) = (c(c.length - 1) | 1).toByte
    if (!java.util.Arrays.equals(c, payload))
      assert(Aac.decodeSpectra(c).isEmpty, "nonzero align padding accepted")
  }

  test("aac parseAacBooksSpec: typo'd top-level directive throws; sfbook content still skipped (r14 ADVICE)") {
    import graft.multimodal.Aac
    // a typo'd directive must throw, not silently yield a partial map
    intercept[IllegalArgumentException](
      Aac.parseAacBooksSpec("bok 11 dim 2 signed 0 escape 1\n0 0 0"))
    intercept[IllegalArgumentException](
      Aac.parseAacBooksSpec("book 5 dim 2 signed 1 escape 0\n0 0 0\nbands-typo 0 4 8"))
    // sfbook section content is still the other parser's domain: skipped
    val m = Aac.parseAacBooksSpec(
      "sfbook\n0 60\n10 59\nbook 5 dim 2 signed 1 escape 0\n0 0 0\n100 1 1\nbands 0 4 8")
    assert(m.keySet == Set(5) && m(5).codes.size == 2)
    // bands is a single-line directive: junk after it is top-level -> throw
    intercept[IllegalArgumentException](
      Aac.parseAacBooksSpec("bands 0 4 8\njunk line here"))
  }

  // ---- AAC EIGHT_SHORT / window switching (round 15) ----

  test("aac imdct256Full matches the direct §14.3 sum at 1e-9") {
    import graft.multimodal.{Aac, Dsp}
    val rnd = new scala.util.Random(61)
    val xr = Array.fill(128)(rnd.nextDouble() * 2 - 1)
    val fast = Dsp.imdct256Full(xr)
    val scale = xr.map(math.abs).max
    for (n <- 0 until 256)
      assert(math.abs(fast(n) - Aac.imdct256(xr, n)) / scale < 1e-9, s"n=$n")
  }

  /** EIGHT_SHORT SCE fixture: grouping + per-group formula streams,
    * quant window-major (the decodeSceWin layout). */
  private def aacFixtureShortSce(seed: Long, groupLen: Array[Int]) = {
    import graft.multimodal.Aac
    require(groupLen.sum == 8)
    val info = Aac.IcsInfo(2, (6 + seed % 4).toInt, groupLen)
    val gg = (96 + seed % 8).toInt
    val sectCb = Array.tabulate(info.numGroups, info.maxSfb)((g, s) =>
      if ((seed + g + s) % 3 == 0) 0 else 12)
    val sf = Array.tabulate(info.numGroups, info.maxSfb)((g, s) =>
      if (sectCb(g)(s) == 0) 0 else gg + ((seed + 3 * s + 2 * g) % 9).toInt - 4)
    // window-major: window w's 128 lines at [128w, 128(w+1))
    val grpOfWin = groupLen.zipWithIndex.flatMap { case (l, g) => Seq.fill(l)(g) }
    val quant = Array.tabulate(1024) { i =>
      val w = i / 128; val bin = i % 128; val s = bin / 8; val g = grpOfWin(w)
      if (s >= info.maxSfb || sectCb(g)(s) == 0) 0
      else {
        val mag = ((seed + i) % 3).toInt
        if (mag != 0 && (seed + i) % 5 < 2) -mag else mag
      }
    }
    (Aac.encodeSceWin(info, gg, sectCb.map(_.toArray), sf.map(_.toArray), quant),
      info, gg, sectCb, sf, quant)
  }

  test("aac EIGHT_SHORT: encode -> decode round-trips grouping, per-group sections/scalefactors, window-major deinterleave") {
    import graft.multimodal.Aac
    for ((gl, seed) <- Seq(Array(8), Array(1, 2, 5), Array(2, 2, 2, 2),
        Array(1, 1, 1, 1, 1, 1, 1, 1)).zipWithIndex) {
      val (payload, info, gg, sectCb, sf, quant) =
        aacFixtureShortSce(seed.toLong, gl)
      val ics = Aac.decodeSceWin(payload).getOrElse(fail(s"groups ${gl.mkString(",")}: no decode"))
      assert(ics.info.windowSequence == 2 && ics.info.maxSfb == info.maxSfb)
      assert(ics.info.groupLen.sameElements(gl), s"grouping ${ics.info.groupLen.mkString(",")}")
      assert(ics.globalGain == gg)
      for (g <- 0 until info.numGroups) {
        assert(ics.sectCb(g).sameElements(sectCb(g)), s"sections g$g")
        assert(ics.sf(g).sameElements(sf(g)), s"scalefactors g$g")
      }
      assert(ics.quant.sameElements(quant), "window-major integers")
      // dequantization uses the (group, sfb) gain of the OWNING window
      val grpOfWin = gl.zipWithIndex.flatMap { case (l, g) => Seq.fill(l)(g) }
      for (i <- 0 until 1024 if quant(i) != 0) {
        val g = grpOfWin(i / 128); val s = (i % 128) / 8
        val want = math.signum(quant(i).toDouble) *
          math.pow(math.abs(quant(i).toDouble), 4.0 / 3.0) *
          math.pow(2.0, 0.25 * (sf(g)(s) - 100))
        assert(ics.xr(i) == want, s"xr($i)")
      }
      // the long-only AacChannel surface keeps rejecting this frame
      assert(Aac.decodeSpectra(payload).isEmpty, "short frame on the long surface")
    }
  }

  test("aac window transitions: windowedFrame + overlap-add is perfect-reconstruction across LONG/START/SHORT/STOP (TDAC)") {
    import graft.multimodal.Aac
    // analysis windows re-derived from the spec formulas, independent of
    // the decoder's synthesis tables
    def wLong(n: Int) = math.sin(math.Pi / 2048.0 * (n + 0.5))
    def wShort(n: Int) = math.sin(math.Pi / 256.0 * (n + 0.5))
    def wSeq(seq: Int, n: Int): Double = seq match {
      case 0 => wLong(n)
      case 1 => if (n < 1024) wLong(n) else if (n < 1472) 1.0
        else if (n < 1600) wShort(n - 1472 + 128) else 0.0
      case 3 => if (n < 448) 0.0 else if (n < 576) wShort(n - 448)
        else if (n < 1024) 1.0 else wLong(n)
    }
    val seqs = Array(0, 1, 2, 3, 0)
    val rnd = new scala.util.Random(67)
    val x = Array.fill(1024 * (seqs.length + 1))(rnd.nextDouble() * 2 - 1)
    // forward MDCT per frame (frame f covers x[1024f, 1024f + 2048))
    val zs = seqs.zipWithIndex.map { case (seq, f) =>
      // §13: the analysis MDCT is X(k) = 2·Σ z(n)·cos(...) — the factor
      // 2 pairs with the synthesis (2/N) for unit round-trip gain
      val xr = new Array[Double](1024)
      if (seq == 2) {
        for (w <- 0 until 8; k <- 0 until 128)
          xr(w * 128 + k) = 2.0 * (0 until 256).map { n =>
            x(1024 * f + 448 + 128 * w + n) * wShort(n) *
              math.cos(math.Pi / 128.0 * (n + 64.5) * (k + 0.5))
          }.sum
      } else {
        for (k <- 0 until 1024)
          xr(k) = 2.0 * (0 until 2048).map { n =>
            x(1024 * f + n) * wSeq(seq, n) *
              math.cos(math.Pi / 1024.0 * (n + 512.5) * (k + 0.5))
          }.sum
      }
      Aac.windowedFrame(Aac.IcsInfo(seq, 0, if (seq == 2) Array(8) else Array(1)), xr)
    }
    // interior frames reconstruct the original signal exactly (TDAC):
    // out_f(n) = z_f(n) + z_{f−1}(n + 1024) == x(1024f + n)
    for (f <- 1 until seqs.length; n <- 0 until 1024) {
      val got = zs(f)(n) + zs(f - 1)(n + 1024)
      assert(math.abs(got - x(1024 * f + n)) < 1e-9,
        s"frame $f (${seqs(f - 1)}->${seqs(f)}) sample $n: $got vs ${x(1024 * f + n)}")
    }
  }

  test("aac window-switched STREAM: START -> EIGHT_SHORT -> STOP decodes gaplessly; short z has the 448-sample zero lead") {
    import graft.multimodal.Aac
    val (shortPayload, _, _, _, _, _) = aacFixtureShortSce(3L, Array(1, 2, 5))
    // a lone short frame: decodePcm's first 448 samples sit before the
    // first short window -> exactly zero
    val head = Aac.decodePcm(shortPayload).get
    assert(head.length == 1024 && head.take(448).forall(_ == 0.0))
    assert(head.drop(448).exists(_ != 0.0))
    // START/STOP frames reuse the long fixture's spectra under the
    // switched ics_info (same 1024-line layout)
    val (maxSfb, gg) = (9, 99)
    val sectCb = Array.tabulate(maxSfb)(s => if (s % 3 == 0) 0 else 12)
    val sf = Array.tabulate(maxSfb)(s => if (sectCb(s) == 0) 0 else gg + (s % 9) - 4)
    val quant = Array.tabulate(1024) { i =>
      val s = i / 32
      if (s >= maxSfb || sectCb(s) == 0) 0
      else { val mag = (i % 3); if (mag != 0 && i % 5 < 2) -mag else mag }
    }
    def longFrame(seq: Int) = Aac.encodeSceWin(
      Aac.IcsInfo(seq, maxSfb, Array(1)), gg, Array(sectCb), Array(sf), quant)
    val stream = Aac.parse(
      Aac.encodeFrame(1, 4, 1, longFrame(1)) ++
      Aac.encodeFrame(1, 4, 1, shortPayload) ++
      Aac.encodeFrame(1, 4, 1, longFrame(3))).get
    val pcm = Aac.decodePcmStream(stream).get
    assert(pcm.length == 3072)
    // frame 1's output must carry BOTH the short frame's head and the
    // START frame's flat-region tail; restate the composition directly
    val zStart = Aac.windowedFrame(Aac.IcsInfo(1, maxSfb, Array(1)),
      Aac.decodeSceWin(longFrame(1)).get.xr)
    val zShort = Aac.windowedFrame(Aac.IcsInfo(2, 0, Array(1, 2, 5)),
      Aac.decodeSceWin(shortPayload).get.xr)
    for (n <- 0 until 1024)
      assert(pcm(1024 + n) == zShort(n) + zStart(n + 1024), s"overlap sample $n")
    // START's zero region beyond 1600 means the short frame's lead-in
    // 576..1023 of the NEXT frame... and the tail into STOP still rings
    assert(pcm.drop(2048).exists(_ != 0.0), "STOP frame silent — tail lost")
  }

  test("aac CPE EIGHT_SHORT: common_window shares grouping; group-major MS mask reconstructs per (group, sfb)") {
    import graft.multimodal.Aac
    val gl = Array(3, 1, 4)
    val info = Aac.IcsInfo(2, 8, gl)
    val gg = Seq(100, 103)
    val sectCb = Seq.tabulate(2)(c => Array.tabulate(info.numGroups, info.maxSfb)(
      (g, s) => if ((c + g + s) % 3 == 0) 0 else 12).map(_.toArray))
    val sf = Seq.tabulate(2)(c => Array.tabulate(info.numGroups, info.maxSfb)(
      (g, s) => if (sectCb(c)(g)(s) == 0) 0 else gg(c) + ((3 * s + 2 * g + c) % 9) - 4)
      .map(_.toArray))
    val grpOfWin = gl.zipWithIndex.flatMap { case (l, g) => Seq.fill(l)(g) }
    val quant = Seq.tabulate(2)(c => Array.tabulate(1024) { i =>
      val w = i / 128; val s = (i % 128) / 8; val g = grpOfWin(w)
      if (s >= info.maxSfb || sectCb(c)(g)(s) == 0) 0
      else { val mag = ((i + 7 * c) % 3); if (mag != 0 && (i + c) % 5 < 2) -mag else mag }
    })
    val msUsed = Array.tabulate(info.numGroups, info.maxSfb)((g, s) => (g + s) % 2 == 0)
    val payload = Aac.encodeCpeWin(Seq(info, info), gg, sectCb, sf, quant,
      commonWindow = true, msMaskPresent = 1, msUsed = msUsed.map(_.toArray))
    val p = Aac.decodeCpeWin(payload).getOrElse(fail("no decode"))
    assert(p.commonWindow && p.msMaskPresent == 1)
    assert(p.left.info.groupLen.sameElements(gl) && p.right.info.groupLen.sameElements(gl))
    for (c <- 0 until 2) {
      val ch = if (c == 0) p.left else p.right
      assert(ch.quant.sameElements(quant(c)), s"integers ch$c")
    }
    for (g <- 0 until info.numGroups; s <- 0 until info.maxSfb)
      assert(p.msUsed(g)(s) == msUsed(g)(s), s"mask g$g s$s")
    // §12.2 over window groups: every line of every window in group g
    for (i <- 0 until 1024) {
      val g = grpOfWin(i / 128); val s = (i % 128) / 8
      val on = s < info.maxSfb && msUsed(g)(s)
      val (wl, wr) =
        if (on) (p.left.xr(i) + p.right.xr(i), p.left.xr(i) - p.right.xr(i))
        else (p.left.xr(i), p.right.xr(i))
      assert(p.xrMs(0)(i) == wl && p.xrMs(1)(i) == wr, s"MS line $i")
    }
    // stereo short PCM decodes through the window-aware filterbank
    val pcm = Aac.decodeCpePcm(payload).get
    assert(pcm.forall(ch => ch.length == 1024 && ch.take(448).forall(_ == 0.0)))
    assert(pcm(0).exists(_ != 0.0) && !pcm(0).sameElements(pcm(1)))
  }

  test("aac SHORT-window intensity stereo: per-(group, sfb) positions through the grouped layout (round 16)") {
    import graft.multimodal.Aac
    // grouped short CPE whose right channel codes band maxSfb-1 of
    // every group with cb 15/14 — the IS reconstruction must follow
    // the window-group line layout exactly like the short MS path
    val gl = Array(3, 1, 4)
    val info = Aac.IcsInfo(2, 4, gl)
    val gg = Seq(100, 103)
    val isBand = info.maxSfb - 1
    val sectCb = Seq.tabulate(2)(c => Array.tabulate(info.numGroups, info.maxSfb)(
      (g, s) => if (c == 1 && s == isBand) { if (g % 2 == 0) 15 else 14 } else 12)
      .map(_.toArray))
    val positions = Array(0, 2, -3)
    val sf = Seq.tabulate(2)(c => Array.tabulate(info.numGroups, info.maxSfb)(
      (g, s) => if (c == 1 && s == isBand) positions(g) else gg(c) + ((3 * s + g + c) % 9) - 4)
      .map(_.toArray))
    val grpOfWin = gl.zipWithIndex.flatMap { case (l, g) => Seq.fill(l)(g) }
    val quant = Seq.tabulate(2)(c => Array.tabulate(1024) { i =>
      val w = i / 128; val s = (i % 128) / 8; val g = grpOfWin(w)
      if (s >= info.maxSfb || (c == 1 && s == isBand)) 0
      else { val mag = ((i + 7 * c) % 3); if (mag != 0 && (i + c) % 5 < 2) -mag else mag }
    })
    val msUsed = Array.tabulate(info.numGroups, info.maxSfb)((g, s) => (g + s) % 2 == 0)
    val payload = Aac.encodeCpeWin(Seq(info, info), gg, sectCb, sf, quant,
      commonWindow = true, msMaskPresent = 1, msUsed = msUsed.map(_.toArray))
    val p = Aac.decodeCpeWin(payload).getOrElse(fail("short IS CPE must decode"))
    for (g <- 0 until info.numGroups)
      assert(p.right.sf(g)(isBand) == positions(g), s"group $g position")
    for (i <- 0 until 1024) {
      val g = grpOfWin(i / 128); val s = (i % 128) / 8
      if (s == isBand) {
        val base = if (g % 2 == 0) 1.0 else -1.0
        val phase = if (msUsed(g)(isBand)) -base else base
        val want = p.left.xr(i) * math.pow(0.5, 0.25 * positions(g)) * phase
        assert(p.xrMs(1)(i) == want, s"short IS line $i (group $g)")
        assert(p.xrMs(0)(i) == p.left.xr(i), s"left touched at IS line $i")
      } else if (s < info.maxSfb && msUsed(g)(s)) {
        assert(p.xrMs(0)(i) == p.left.xr(i) + p.right.xr(i), s"MS line $i")
      }
    }
    // the grouped PCM path carries the IS content
    val pcm = Aac.decodeCpePcm(payload).get
    assert(pcm(1).exists(_ != 0.0) && !pcm(0).sameElements(pcm(1)))
  }

  test("aac KBD windows: Princen-Bradley identity, monotone rise, Bessel sanity (round 15)") {
    import graft.multimodal.Dsp
    // I0 sanity against the series' well-known values
    assert(math.abs(Dsp.besselI0(0.0) - 1.0) < 1e-15)
    assert(math.abs(Dsp.besselI0(1.0) - 1.2660658777520084) < 1e-12)
    // the KBD construction makes w(n)^2 + w(half-1-n)^2 = 1 EXACTLY —
    // the Princen-Bradley condition the overlap-add needs
    for ((half, w) <- Seq((1024, Dsp.kbdLong), (128, Dsp.kbdShort))) {
      assert(w.length == half)
      for (n <- 0 until half) {
        val s = w(n) * w(n) + w(half - 1 - n) * w(half - 1 - n)
        assert(math.abs(s - 1.0) < 1e-12, s"PB at $n/$half: $s")
      }
      for (n <- 1 until half) assert(w(n) > w(n - 1), s"not monotone at $n")
      assert(w(half - 1) <= 1.0 && w(0) > 0.0)
    }
  }

  test("aac KBD: mixed-shape window switching is perfect-reconstruction; shape round-trips; stream threads prevShape") {
    import graft.multimodal.{Aac, Dsp}
    def wLong(sh: Int, n: Int) = // analysis twin of the decoder's halves
      if (n < 1024) { if (sh == 0) math.sin(math.Pi / 2048.0 * (n + 0.5)) else Dsp.kbdLong(n) }
      else { if (sh == 0) math.sin(math.Pi / 2048.0 * (n + 0.5)) else Dsp.kbdLong(2047 - n) }
    def wShortR(sh: Int, k: Int) =
      if (sh == 0) math.sin(math.Pi / 256.0 * (k + 0.5)) else Dsp.kbdShort(k)
    def wShortF(sh: Int, k: Int) =
      if (sh == 0) math.sin(math.Pi / 256.0 * (k + 0.5)) else Dsp.kbdShort(255 - k)
    // frame plan: (sequence, shape); prevShape threads left halves
    val plan = Array((0, 1), (1, 1), (2, 0), (3, 1), (0, 0))
    val rnd = new scala.util.Random(71)
    val x = Array.fill(1024 * (plan.length + 1))(rnd.nextDouble() * 2 - 1)
    var prevShape = 0
    val zs = plan.zipWithIndex.map { case ((seq, shape), f) =>
      def wAt(n: Int): Double = seq match {
        case 0 => if (n < 1024) wLong(prevShape, n) else wLong(shape, n)
        case 1 => if (n < 1024) wLong(prevShape, n) else if (n < 1472) 1.0
          else if (n < 1600) wShortF(shape, n - 1472 + 128) else 0.0
        case 3 => if (n < 448) 0.0 else if (n < 576) wShortR(prevShape, n - 448)
          else if (n < 1024) 1.0 else wLong(shape, n)
      }
      val xr = new Array[Double](1024)
      if (seq == 2) {
        for (w <- 0 until 8; k <- 0 until 128)
          xr(w * 128 + k) = 2.0 * (0 until 256).map { n =>
            val wv = if (n < 128) wShortR(if (w == 0) prevShape else shape, n)
                     else wShortF(shape, n)
            x(1024 * f + 448 + 128 * w + n) * wv *
              math.cos(math.Pi / 128.0 * (n + 64.5) * (k + 0.5))
          }.sum
      } else {
        for (k <- 0 until 1024)
          xr(k) = 2.0 * (0 until 2048).map { n =>
            x(1024 * f + n) * wAt(n) *
              math.cos(math.Pi / 1024.0 * (n + 512.5) * (k + 0.5))
          }.sum
      }
      val z = Aac.windowedFrame(
        Aac.IcsInfo(seq, 0, if (seq == 2) Array(8) else Array(1), shape),
        xr, prevShape)
      prevShape = shape
      z
    }
    for (f <- 1 until plan.length; n <- 0 until 1024) {
      val got = zs(f)(n) + zs(f - 1)(n + 1024)
      assert(math.abs(got - x(1024 * f + n)) < 1e-9,
        s"frame $f (${plan(f - 1)}->${plan(f)}) sample $n")
    }
    // bitstream round-trip of the shape bit, long and short
    val (payload, info, gg, sectCb, sf, quant) = aacFixtureShortSce(2L, Array(4, 4))
    val kbdShort = Aac.encodeSceWin(info.copy(windowShape = 1), gg,
      sectCb.map(_.toArray), sf.map(_.toArray), quant)
    val ics = Aac.decodeSceWin(kbdShort).getOrElse(fail("KBD short frame refused"))
    assert(ics.info.windowShape == 1 && ics.info.isShort)
    assert(ics.quant.sameElements(quant))
    // the long-only AacChannel surface still rejects KBD
    val (sinePayload, _, _, _) = aacFixtureSce(2L)
    assert(Aac.decodeSpectra(sinePayload).isDefined)
    val kbdLong = {
      val maxSfb = (8 + 2L % 4).toInt; val g2 = (96 + 2L % 8).toInt
      val sc = Array.tabulate(maxSfb)(s => if ((2L + s) % 3 == 0) 0 else 12)
      val sfl = Array.tabulate(maxSfb)(s =>
        if (sc(s) == 0) 0 else g2 + ((2L + 3 * s) % 9).toInt - 4)
      val q = Array.tabulate(1024) { i =>
        val s = i / 32
        if (s >= maxSfb || sc(s) == 0) 0
        else { val m = ((2L + i) % 3).toInt; if (m != 0 && (2L + i) % 5 < 2) -m else m }
      }
      Aac.encodeSceWin(Aac.IcsInfo(0, maxSfb, Array(1), 1), g2,
        Array(sc), Array(sfl), q)
    }
    assert(Aac.decodeSpectra(kbdLong).isEmpty, "KBD accepted on the sine-only surface")
    assert(Aac.decodeSceWin(kbdLong).isDefined)
    // stream: a KBD frame's tail rings into the NEXT frame's rise with
    // the correct (previous) shape — decodePcmStream == manual overlap
    val stream = Aac.parse(
      Aac.encodeFrame(1, 4, 1, kbdLong) ++
      Aac.encodeFrame(1, 4, 1, sinePayload)).get
    val pcm = Aac.decodePcmStream(stream).get
    val z0 = Aac.windowedFrame(Aac.decodeSceWin(kbdLong).get.info,
      Aac.decodeSceWin(kbdLong).get.xr, prevShape = 0)
    val i1 = Aac.decodeSceWin(sinePayload).get
    val z1 = Aac.windowedFrame(i1.info, i1.xr, prevShape = 1) // prev was KBD
    for (n <- 0 until 1024) {
      assert(pcm(n) == z0(n), s"head $n")
      assert(pcm(1024 + n) == z1(n) + z0(n + 1024), s"overlap $n")
    }
  }

  test("aac TNS: sign extension + sin inverse-quant + LPC recursion; the AR filter inverts its FIR exactly (round 15)") {
    import graft.multimodal.Aac
    // long SCE, 8 coded bands, one TNS filter over the top 28 SWBs ->
    // clipped to bands 4..8 (samples 128..256) by maxSfb
    val maxSfb = 8; val gg = 100
    val sectCb = Array.fill(maxSfb)(12)
    val sf = Array.fill(maxSfb)(gg)
    val quant = Array.tabulate(1024) { i =>
      if (i >= 32 * maxSfb) 0
      else { val m = (i % 3); if (m != 0 && i % 5 < 2) -m else m }
    }
    def frame(tns: Option[Aac.TnsSpec]) = Aac.encodeSceWin(
      Aac.IcsInfo(0, maxSfb, Array(1)), gg, Array(sectCb), Array(sf), quant,
      tns = tns)
    val pre = Aac.decodeSceWin(frame(None)).get.xr
    for ((coefs, res, compress, down) <- Seq(
        (Seq(1), 0, 0, false),           // order 1, positive
        (Seq(-1), 0, 0, true),           // order 1, negative (sign extend), downward
        (Seq(3, -4, 2), 1, 0, false),    // order 3, 4-bit coefs
        (Seq(1, -2), 0, 1, true))) {     // compress drops a bit (2-bit domain)
      val spec = Aac.TnsSpec(res, Seq(Seq(
        Aac.TnsSpecFilter(28, coefs.length, down, compress, coefs))))
      val ics = Aac.decodeSceWin(frame(Some(spec))).get
      assert(ics.hasTns && ics.tns(0).length == 1)
      val f = ics.tns(0).head
      assert(f.order == coefs.length && f.downward == down)
      // resolved LPC a(1..order): re-derive independently
      val bits = res + 3 - compress
      val iq = ((1 << (res + 3 - 1)) - 0.5) / (math.Pi / 2.0)
      val iqm = ((1 << (res + 3 - 1)) + 0.5) / (math.Pi / 2.0)
      val t = coefs.map(c => math.sin(c / (if (c >= 0) iq else iqm))).toArray
      val a = Array.fill(coefs.length + 1)(0.0); a(0) = 1.0
      for (m <- 1 to coefs.length) {
        val b = a.clone()
        for (i <- 1 until m) b(i) = a(i) + t(m - 1) * a(m - i)
        for (i <- 1 until m) a(i) = b(i)
        a(m) = t(m - 1)
      }
      for (j <- 1 to coefs.length)
        assert(ics.tns(0).head.lpc(j) == a(j), s"lpc($j) for $coefs")
      assert(coefs.forall(c => c >= -(1 << (bits - 1)) && c < (1 << (bits - 1))))
      // the decoder's all-pole output y must invert back to the pre-TNS
      // spectrum through the FIR x(n) = y(n) + sum a(j) y(n - j*inc)
      val y = ics.xr
      val (start, end) = (128, 256)
      val (p0, inc) = if (down) (end - 1, -1) else (start, 1)
      for (i <- 0 until end - start) {
        val pos = p0 + i * inc
        var rec = y(pos)
        for (j <- 1 to coefs.length if j <= i) rec += a(j) * y(pos - j * inc)
        assert(math.abs(rec - pre(pos)) < 1e-12, s"FIR inverse at $pos for $coefs")
      }
      // outside the filter region the spectrum is untouched
      for (i <- 0 until 128) assert(y(i) == pre(i), s"below region $i")
    }
    // two filters chain downward from the map top: SWB ranges abut
    val two = Aac.TnsSpec(0, Seq(Seq(
      Aac.TnsSpecFilter(26, 1, false, 0, Seq(2)),   // swb 6..32 -> clipped 6..8
      Aac.TnsSpecFilter(2, 1, false, 0, Seq(-2))))) // swb 4..6
    val ics2 = Aac.decodeSceWin(frame(Some(two))).get
    assert(ics2.tns(0).length == 2)
    // band 4..6 (samples 128..192) filtered by the SECOND filter
    assert((128 until 192).exists(i => ics2.xr(i) != pre(i)))
    // LC order cap: 13 on a long window strict-rejects
    val big = Aac.TnsSpec(0, Seq(Seq(
      Aac.TnsSpecFilter(28, 13, false, 0, Seq.fill(13)(1)))))
    assert(Aac.decodeSceWin(frame(Some(big))).isEmpty,
      "order 13 accepted past the LC cap")
  }

  test("aac TNS: order cap, AacChannel surface rejects, tnsMaxBands clips, short windows per-window filters, CPE after MS") {
    import graft.multimodal.Aac
    val maxSfb = 8; val gg = 100
    val sectCb = Array.fill(maxSfb)(12)
    val sf = Array.fill(maxSfb)(gg)
    val quant = Array.tabulate(1024) { i =>
      if (i >= 32 * maxSfb) 0
      else { val m = (i % 3); if (m != 0 && i % 5 < 2) -m else m }
    }
    // order 13 long: parses as bits fine but the decoder's LC cap refuses
    val bits13 = {
      val w = new StringBuilder // hand-pack via the encoder with order 12 then bump? simpler: decode path
      Aac.encodeSceWin(Aac.IcsInfo(0, maxSfb, Array(1)), gg, Array(sectCb),
        Array(sf), quant, tns = Some(Aac.TnsSpec(0, Seq(Seq(
          Aac.TnsSpecFilter(28, 12, false, 0, Seq.fill(12)(1)))))))
    }
    assert(Aac.decodeSceWin(bits13).isDefined) // order 12 decodes
    // the AacChannel (decodeSpectra) surface rejects TNS frames
    assert(Aac.decodeSpectra(bits13).isEmpty, "TNS accepted on the plain surface")
    // tnsMaxBands clips the region: limit 4 -> start == end, spectrum untouched
    val one = Aac.encodeSceWin(Aac.IcsInfo(0, maxSfb, Array(1)), gg,
      Array(sectCb), Array(sf), quant,
      tns = Some(Aac.TnsSpec(0, Seq(Seq(Aac.TnsSpecFilter(28, 1, false, 0, Seq(3)))))))
    val pre = Aac.decodeSceWin(Aac.encodeSceWin(Aac.IcsInfo(0, maxSfb, Array(1)),
      gg, Array(sectCb), Array(sf), quant)).get.xr
    val clipped = Aac.decodeSceWin(one, tnsMaxBands = 4).get
    assert(clipped.xr.sameElements(pre), "tnsMaxBands = 4 must clip the filter away")
    assert(!Aac.decodeSceWin(one).get.xr.sameElements(pre), "unclipped filter must act")
    // short windows: filters are PER WINDOW; filter only window 2
    val gl = Array(8)
    val infoS = Aac.IcsInfo(2, 8, gl)
    val sectS = Array.fill(1, 8)(12)
    val sfS = Array.fill(1, 8)(gg)
    val quantS = Array.tabulate(1024) { i =>
      if ((i % 128) / 8 >= 8) 0
      else { val m = (i % 3); if (m != 0 && i % 5 < 2) -m else m }
    }
    val tnsS = Aac.TnsSpec(0, Seq.tabulate(8)(w =>
      if (w == 2) Seq(Aac.TnsSpecFilter(12, 1, false, 0, Seq(2))) else Seq.empty))
    val shortFrame = Aac.encodeSceWin(infoS, gg, sectS.map(_.toArray),
      sfS.map(_.toArray), quantS, tns = Some(tnsS))
    val preS = Aac.decodeSceWin(Aac.encodeSceWin(infoS, gg, sectS.map(_.toArray),
      sfS.map(_.toArray), quantS)).get.xr
    val icsS = Aac.decodeSceWin(shortFrame).get
    assert(icsS.tns.length == 8 && icsS.tns(2).length == 1)
    // windows != 2 untouched; window 2's filtered range (swb 4..8 of its
    // 128 lines under the 16-band fixture map clipped to maxSfb 8) differs
    for (w <- 0 until 8 if w != 2; k <- 0 until 128)
      assert(icsS.xr(w * 128 + k) == preS(w * 128 + k), s"window $w line $k")
    assert((0 until 128).exists(k => icsS.xr(2 * 128 + k) != preS(2 * 128 + k)))
    // CPE: TNS applies AFTER the MS matrix — left-only filter over
    // all-MS spectra: xl == AR(MS-left), xr == MS-right untouched
    val gg2 = Seq(100, 102)
    val sectC = Seq.fill(2)(Array(Array.fill(maxSfb)(12)))
    val sfC = Seq(Array(Array.fill(maxSfb)(100)), Array(Array.fill(maxSfb)(102)))
    val quantC = Seq.tabulate(2)(c => Array.tabulate(1024) { i =>
      if (i >= 32 * maxSfb) 0
      else { val m = ((i + c) % 3); if (m != 0 && (i + c) % 5 < 2) -m else m }
    })
    val info0 = Aac.IcsInfo(0, maxSfb, Array(1))
    val cpePlain = Aac.encodeCpeWin(Seq(info0, info0), gg2,
      sectC, sfC, quantC, msMaskPresent = 2)
    val cpeTns = Aac.encodeCpeWin(Seq(info0, info0), gg2,
      sectC, sfC, quantC, msMaskPresent = 2,
      tns = Seq(Some(Aac.TnsSpec(0, Seq(Seq(
        Aac.TnsSpecFilter(28, 1, false, 0, Seq(2)))))), None))
    val plainP = Aac.decodeCpeWin(cpePlain).get
    val tnsP = Aac.decodeCpeWin(cpeTns).get
    assert(tnsP.xrMs(1).sameElements(plainP.xrMs(1)), "right channel touched")
    // left: manual AR over the POST-MS plain left
    val a1 = tnsP.left.tns(0).head.lpc(1)
    val manual = plainP.xrMs(0).clone()
    for (i <- 0 until 128) {
      var acc = manual(128 + i)
      if (i >= 1) acc -= a1 * manual(128 + i - 1)
      manual(128 + i) = acc
    }
    assert(tnsP.xrMs(0).sameElements(manual), "TNS-after-MS order broken")
    // the long-only decodeCpe surface rejects TNS frames, mirroring the
    // SCE twin decodeSpectra (round 16 — closes the r15 asymmetry: its
    // per-channel xr is pre-TNS, so accepting would hand out a mixed
    // pre/post-TNS pair); TNS consumers use decodeCpeWin above
    assert(Aac.decodeCpe(cpePlain).isDefined, "plain CPE regressed")
    assert(Aac.decodeCpe(cpeTns).isEmpty, "decodeCpe accepted a TNS frame")
  }

  test("aac intensity stereo: 0.5^(pos/4) scaling, cb14/ms_used phase flips, the is_position DPCM chain (round 16)") {
    import graft.multimodal.Aac
    val maxSfb = 8
    val gg = Seq(100, 103)
    val info = Aac.IcsInfo(0, maxSfb, Array(1))
    // left fully coded; right: bands 0..3 coded, 4..7 INTENSITY with
    // cb 15/14 and positions 0, 2, -3, 4 (the DPCM chain crosses sign)
    val leftCb = Array.fill(maxSfb)(12)
    val rightCb = Array(12, 12, 12, 12, 15, 14, 15, 15)
    val positions = Array(0, 2, -3, 4)
    val sfL = Array.tabulate(maxSfb)(s => 100 + (s % 3))
    val sfR = Array.tabulate(maxSfb)(s => if (s < 4) 103 + (s % 2) else positions(s - 4))
    val quant = Seq.tabulate(2)(c => Array.tabulate(1024) { i =>
      val s = i / 32
      if (s >= maxSfb || (c == 1 && s >= 4)) 0
      else { val m = ((i + c) % 3); if (m != 0 && (i + c) % 5 < 2) -m else m }
    })
    // ms mask: flips phase on IS bands 4/6, applies MS on bands 0/2
    val msUsed = Array.tabulate(maxSfb)(s => s % 2 == 0)
    val payload = Aac.encodeCpeWin(Seq(info, info), gg,
      Seq(Array(leftCb), Array(rightCb)), Seq(Array(sfL), Array(sfR)),
      quant, msMaskPresent = 1, msUsed = Array(msUsed))
    val p = Aac.decodeCpeWin(payload).getOrElse(fail("IS CPE must decode"))
    assert(p.right.sectCb(0).sameElements(rightCb))
    assert((4 until 8).forall(s => p.right.sf(0)(s) == positions(s - 4)),
      "is_position chain mismatch")
    // IS bands: xrMs right = left (post-nothing: MS skipped there) x
    // 0.5^(pos/4) x phase; left untouched
    for (s <- 4 until 8; i <- 32 * s until 32 * (s + 1)) {
      val cb15 = rightCb(s) == 15
      val base = if (cb15) 1.0 else -1.0
      val phase = if (msUsed(s)) -base else base
      val want = p.left.xr(i) * math.pow(0.5, 0.25 * positions(s - 4)) * phase
      assert(p.xrMs(1)(i) == want, s"IS band $s line $i")
      assert(p.xrMs(0)(i) == p.left.xr(i), s"left touched at IS band $s")
      assert(p.right.xr(i) == 0.0, "right pre-stereo xr nonzero at IS band")
    }
    // band 4: pos 0 + ms_used (phase-flipped cb15) -> exact NEGATED copy
    assert((128 until 160).forall(i => p.xrMs(1)(i) == -p.left.xr(i)))
    // coded bands: MS on the masked ones, passthrough otherwise
    for (s <- 0 until 4; i <- 32 * s until 32 * (s + 1)) {
      if (msUsed(s)) {
        assert(p.xrMs(0)(i) == p.left.xr(i) + p.right.xr(i))
        assert(p.xrMs(1)(i) == p.left.xr(i) - p.right.xr(i))
      } else assert(p.xrMs(1)(i) == p.right.xr(i))
    }
    // intensity codebooks strict-reject outside a CPE right channel:
    // an SCE with cb 15 must return None on every SCE surface
    val sceIs = Aac.encodeSceWin(info, 100, Array(rightCb), Array(sfR),
      quant(1))
    assert(Aac.decodeSceWin(sceIs).isEmpty, "SCE with intensity cb accepted")
    assert(Aac.decodeSpectra(sceIs).isEmpty)
    // the encoder refuses IS on the left channel or without common_window
    intercept[IllegalArgumentException](Aac.encodeCpeWin(Seq(info, info), gg,
      Seq(Array(rightCb), Array(leftCb)), Seq(Array(sfR), Array(sfL)),
      quant, msMaskPresent = 1, msUsed = Array(msUsed)))
    intercept[IllegalArgumentException](Aac.encodeCpeWin(Seq(info, info), gg,
      Seq(Array(leftCb), Array(rightCb)), Seq(Array(sfL), Array(sfR)),
      quant, commonWindow = false))
    // mutation fuzz: Option contract holds
    val rnd = new scala.util.Random(131)
    for (_ <- 0 until 300) {
      val m = payload.clone()
      val bit = rnd.nextInt(m.length * 8)
      m(bit >> 3) = (m(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      Aac.decodeCpeWin(m)
    }
  }

  test("aac pulse_data: sign-preserving adds at accumulated positions; barred from short frames (round 15)") {
    import graft.multimodal.Aac
    val maxSfb = 8; val gg = 100
    val sectCb = Array.fill(maxSfb)(12)
    val sf = Array.fill(maxSfb)(gg)
    val quant = Array.tabulate(1024) { i =>
      if (i >= 32 * maxSfb) 0
      else { val m = (i % 3); if (m != 0 && i % 5 < 2) -m else m }
    }
    // pulses at band 2 + offsets 3, 2, 4 (accumulating), amps 5, 9, 15
    val ps = Aac.PulseSpec(2, Seq((3, 5), (2, 9), (4, 15)))
    val payload = Aac.encodeSceWin(Aac.IcsInfo(0, maxSfb, Array(1)), gg,
      Array(sectCb), Array(sf), quant, pulse = Some(ps))
    val ics = Aac.decodeSceWin(payload).get
    val want = quant.clone()
    var k = 64 // bands(2)
    for ((off, amp) <- ps.pulses) {
      k += off
      // the 14496-3 rule (faad2/ffmpeg): zero values take -amp
      if (want(k) > 0) want(k) += amp else want(k) -= amp
    }
    // position 69 (offset chain 64+3+2) holds quant 0 — pin the
    // zero-takes-MINUS-amp branch explicitly (r15 ADVICE medium)
    assert(quant(69) == 0 && want(69) == -9, "zero-value pulse branch not exercised")
    assert(ics.quant.sameElements(want), "pulse adds mismatch")
    // DIFFERENTIAL pin (round 17, r16 VERDICT #7 — the audit trail for
    // the round-16 oracle change should be loud): the REJECTED rule
    // (+amp on zero, the pre-r16 self-pinned bug) diverges from the
    // faad2/ffmpeg rule on exactly this fixture, and the decode matches
    // the latter — a regression to the old rule reddens here, not just
    // in the (also-updated) gate oracle.
    val wantOldRule = quant.clone()
    var k2 = 64
    for ((off, amp) <- ps.pulses) {
      k2 += off
      if (wantOldRule(k2) >= 0) wantOldRule(k2) += amp else wantOldRule(k2) -= amp
    }
    assert(wantOldRule(69) == 9 && want(69) == -9,
      "fixture no longer discriminates the two pulse rules")
    assert(!ics.quant.sameElements(wantOldRule),
      "decode matches the rejected +amp-on-zero rule")
    // the dequantized spectrum reflects the pulsed integers
    val k0 = 64 + 3
    val g0 = math.pow(2.0, 0.25 * (gg - 100))
    val expect = math.signum(want(k0).toDouble) *
      math.pow(math.abs(want(k0).toDouble), 4.0 / 3.0) * g0
    assert(ics.xr(k0) == expect)
    // AacChannel surface also carries pulses (they are spectral decode,
    // not a separate tool)
    assert(Aac.decodeSpectra(payload).get.quant.sameElements(want))
    // short frames bar pulse_data — the encoder refuses to build one,
    // and a decoder seeing one must reject (craft by flipping the
    // sequence bits is covered by fuzz; pin the encoder guard here)
    intercept[IllegalArgumentException](Aac.encodeSceWin(
      Aac.IcsInfo(2, 4, Array(8)), gg, Array(Array.fill(4)(0)),
      Array(Array.fill(4)(0)), new Array[Int](1024), pulse = Some(ps)))
    // a pulse position past max_sfb's extent lands in an UNCODED band —
    // dequant would silently drop it from xr, so the decoder rejects
    // (round 16: real decoders disagree here, faad2 dequantizes at sf 0
    // while ffmpeg drops the pulse — reject-never-misparse)
    val far = Aac.PulseSpec(7, Seq((31, 1), (31, 1), (31, 1), (31, 1)))
    val bad = Aac.encodeSceWin(Aac.IcsInfo(0, maxSfb, Array(1)), gg,
      Array(sectCb), Array(sf), quant, pulse = Some(far))
    // 224 + 31 = 255 is still band 7, but 255+31 = 286 >= bands(8) = 256
    assert(Aac.decodeSceWin(bad).isEmpty, "pulse in an uncoded band accepted")
    val far2 = Aac.PulseSpec(31, Seq((31, 1), (31, 1), (31, 1), (31, 1)))
    val bad2 = Aac.encodeSceWin(Aac.IcsInfo(0, maxSfb, Array(1)), gg,
      Array(sectCb), Array(sf), quant, pulse = Some(far2))
    assert(Aac.decodeSceWin(bad2).isEmpty, "pulse past 1024 accepted")
    // a pulse inside max_sfb but on a sect_cb 0 (ZERO_HCB) band rejects:
    // code bands 0..6, leave band 7 uncoded, pulse into band 7
    val holey = sectCb.clone(); holey(7) = 0
    val qz = quant.clone(); java.util.Arrays.fill(qz, 224, 256, 0)
    val inHole = Aac.PulseSpec(7, Seq((0, 3)))
    val bad3 = Aac.encodeSceWin(Aac.IcsInfo(0, maxSfb, Array(1)), gg,
      Array(holey), Array(sf), qz, pulse = Some(inHole))
    assert(Aac.decodeSceWin(bad3).isEmpty, "pulse in a ZERO_HCB band accepted")
  }

  test("aac EIGHT_SHORT strict rejects + mutation fuzz never throws") {
    import graft.multimodal.Aac
    val (payload, _, _, _, _, _) = aacFixtureShortSce(1L, Array(2, 6))
    assert(Aac.decodeSceWin(payload).isDefined) // baseline
    // truncation and trailing bytes reject
    assert(Aac.decodeSceWin(payload.take(payload.length / 2)).isEmpty)
    assert(Aac.decodeSceWin(payload :+ 0x3C.toByte).isEmpty)
    // the encoder refuses grouping that does not cover 8 windows
    intercept[IllegalArgumentException](Aac.encodeSceWin(
      Aac.IcsInfo(2, 4, Array(2, 2)), 100,
      Array.fill(2, 4)(0), Array.fill(2, 4)(0), new Array[Int](1024)))
    // a short band map past 128 lines rejects
    assert(Aac.decodeSceWin(payload,
      shortBands = Array(0, 64, 192)).isEmpty)
    val rnd = new scala.util.Random(29)
    for (_ <- 0 until 300) {
      val m = payload.clone()
      val bit = rnd.nextInt(m.length * 8)
      m(bit >> 3) = (m(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      Aac.decodeSceWin(m) // Option contract: None or a decode, never a throw
      Aac.decodePcm(m)
    }
  }

  /** Window-switched fixture frame: granule 0 = block_type 1 (start,
    * long layout), granule 1 = block_type 2 pure short — the gate
    * fixture's shape (round 15). */
  private def mp3ShortFrameSpec(id: Long) = {
    import graft.multimodal.Mp3
    // region0 is FIXED at sample 36 under window switching, so the
    // escape-range values (table 14) start at i = 36, not 16
    def value(k: Long, nBig: Int)(i: Int): Int = {
      val mag =
        if (i < 36) ((k + i) % 4).toInt
        else if (i < nBig) ((k + i) % 4).toInt match {
          case 0 => 0; case 1 | 2 => 1; case _ => 15 + ((k + i) % 8).toInt
        }
        else ((k + i) % 2).toInt
      if (mag != 0 && (k + i) % 5 < 2) -mag else mag
    }
    def dims(k: Long) = (2 * (20 + (k % 5)).toInt, 4 * (4 + (k % 3)).toInt)
    def gg(g: Int, ch: Int) = (160 + (5 * id + 17 * g + 29 * ch) % 40).toInt
    def gi(g: Int, ch: Int) = {
      val k = id + 11 * g
      val (nBig, _) = dims(k)
      if (g == 0) Mp3.GranuleInfo(0, nBig / 2, gg(g, ch), 9,
        windowSwitching = true, blockType = 1, mixedBlock = false,
        Seq(4, 14), Seq(0, 0, 0), 7, 36,
        (id % 2).toInt, ((id + g) % 2).toInt, ((id + g + ch) % 2).toInt)
      else Mp3.GranuleInfo(0, nBig / 2, gg(g, ch), 9,
        windowSwitching = true, blockType = 2, mixedBlock = false,
        Seq(4, 14), Seq.tabulate(3)(w => ((id + 2 * w) % 4).toInt), 8, 36,
        0, ((id + g) % 2).toInt, ((id + g + ch) % 2).toInt)
    }
    val si = Mp3.SideInfo(0, (id % 8).toInt, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.tabulate(2)(g => Seq.tabulate(2)(ch => gi(g, ch))))
    val sfs: Seq[Seq[Array[Int]]] = Seq.tabulate(2)(g => Seq.fill(2)(
      if (g == 0) Array.tabulate(21)(b => ((id + b) % 4).toInt)
      else Array.tabulate(36)(x => ((id + x / 3 + x % 3) % 4).toInt)))
    val spectra: Seq[Seq[Array[Int]]] = Seq.tabulate(2)(g => Seq.fill(2) {
      val k = id + 11 * g
      val (nBig, nC1) = dims(k)
      Array.tabulate(nBig + nC1)(value(k, nBig))
    })
    (si, sfs, spectra)
  }

  test("mp3 short blocks: integers round-trip, short granule requants+reorders, bt flags surface") {
    import graft.multimodal.Mp3
    for (id <- 0L to 4L) {
      val (si, sfs, sp) = mp3ShortFrameSpec(id)
      val payload = Mp3.encodeSpectra(si, 2, sfs, sp)
      val frame = Mp3.encodeMp3(1, 9, 0, java.util.Arrays.copyOf(payload, 413))
      val dec = Mp3.decodeSpectra(Mp3.parseMp3(frame).get.framePayloads.head, 2, 0).get
      for (g <- 0 until 2; ch <- 0 until 2) {
        val want = sp(g)(ch)
        assert(java.util.Arrays.equals(dec(g)(ch).is.take(want.length), want),
          s"id $id g$g ch$ch integers differ")
        assert(dec(g)(ch).blockType == (if (g == 0) 1 else 2))
        assert(!dec(g)(ch).mixed)
      }
      // short-granule reorder + requant: every transmitted sample lands at
      // t = 18*(j/6) + 6w + (j%6) with the subblock-gain exponent
      val bS = Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192)
      val gi1 = si.granules(1)(1)
      val mult = if (gi1.scalefacScale == 0) 0.5 else 1.0
      val x = dec(1)(1)
      val want = new Array[Double](576)
      for (s <- 0 until 13; w <- 0 until 3; l <- 0 until bS(s + 1) - bS(s)) {
        val src = 3 * bS(s) + w * (bS(s + 1) - bS(s)) + l
        val v = x.is(src)
        if (v != 0) {
          val sf = if (s >= 12) 0 else sfs(1)(1)(s * 3 + w)
          val exp = 0.25 * (gi1.globalGain - 210 - 8 * gi1.subblockGain(w)) - mult * sf
          val j = bS(s) + l
          want(18 * (j / 6) + 6 * w + (j % 6)) =
            math.signum(v.toDouble) * math.pow(math.abs(v).toDouble, 4.0 / 3.0) *
              math.pow(2.0, exp)
        }
      }
      assert(x.xr.sameElements(want), s"id $id short requant/reorder differs")
    }
  }

  test("mp3 mixed blocks: long part requants in place with pretab, short part maps from band 3") {
    import graft.multimodal.Mp3
    val id = 3L
    // granule 0 mixed (8 long + bands 3..11 x3), granule 1 = stop (bt3)
    def gi(g: Int) =
      if (g == 0) Mp3.GranuleInfo(0, 20, 180, 9, windowSwitching = true,
        blockType = 2, mixedBlock = true, Seq(4, 14),
        Seq.tabulate(3)(w => ((id + 2 * w) % 4).toInt), 7, 36, 1, 0, 1)
      else Mp3.GranuleInfo(0, 20, 185, 9, windowSwitching = true,
        blockType = 3, mixedBlock = false, Seq(4, 14), Seq(0, 0, 0),
        7, 36, 1, 1, 1)
    val si = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.tabulate(2)(g => Seq.fill(2)(gi(g))))
    val sfs: Seq[Seq[Array[Int]]] = Seq.tabulate(2)(g => Seq.fill(2)(
      if (g == 0) Array.tabulate(8)(b => ((id + b) % 4).toInt) ++
        (for (b <- 3 until 12; w <- 0 until 3) yield ((id + b + w) % 4).toInt)
      else Array.tabulate(21)(b => ((id + b) % 4).toInt)))
    val is = Array.tabulate(56)(i => {
      // region0 (< 36): table 4's 0..3 domain; region1 + count1: {0,1}
      val m = if (i < 36) ((id + i) % 3).toInt else ((id + i) % 2).toInt
      if (m != 0 && (id + i) % 5 < 2) -m else m })
    val spectra: Seq[Seq[Array[Int]]] = Seq.fill(2)(Seq.fill(2)(is))
    val payload = Mp3.encodeSpectra(si, 2, sfs, spectra)
    val dec = Mp3.decodeSpectra(payload, 2, 0).get
    val x = dec(0)(0)
    assert(x.blockType == 2 && x.mixed)
    assert(dec(1)(0).blockType == 3 && !dec(1)(0).mixed)
    // long half: in place, pretab boost with preflag=1
    val bands = Array(0, 4, 8, 12, 16, 20, 24, 30, 36)
    val pretab = Array(0, 0, 0, 0, 0, 0, 0, 0)
    for (i <- 0 until 36 if x.is(i) != 0) {
      val b = bands.lastIndexWhere(_ <= i)
      val exp = 0.25 * (180 - 210) - 0.5 * (sfs(0)(0)(b) + 1 * pretab(b))
      val want = math.signum(x.is(i).toDouble) *
        math.pow(math.abs(x.is(i)).toDouble, 4.0 / 3.0) * math.pow(2.0, exp)
      assert(x.xr(i) == want, s"mixed long half differs at $i")
    }
    // short half: transmission index maps through (band, window, line)
    val bS = Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192)
    for (src <- 36 until 56 if x.is(src) != 0) {
      val s = bS.indices.dropRight(1).filter(b => 3 * bS(b) <= src).max
      val width = bS(s + 1) - bS(s)
      val off = src - 3 * bS(s)
      val w = off / width; val l = off % width
      val j = bS(s) + l
      val t = 18 * (j / 6) + 6 * w + (j % 6)
      val exp = 0.25 * (180 - 210 - 8 * ((id + 2 * w) % 4).toInt) -
        0.5 * sfs(0)(0)(8 + (s - 3) * 3 + w)
      val want = math.signum(x.is(src).toDouble) *
        math.pow(math.abs(x.is(src)).toDouble, 4.0 / 3.0) * math.pow(2.0, exp)
      assert(x.xr(t) == want, s"mixed short half differs at src $src -> t $t")
    }
  }

  test("mp3 short/mixed PCM: deterministic 1152 samples per channel; stream decode threads state; fuzz") {
    import graft.multimodal.Mp3
    val (si, sfs, sp) = mp3ShortFrameSpec(2L)
    val payload = Mp3.encodeSpectra(si, 2, sfs, sp)
    val frame = Mp3.encodeMp3(1, 9, 0, java.util.Arrays.copyOf(payload, 413))
    val stream = Mp3.parseMp3(frame).get
    val pcm = Mp3.decodePcm(stream.framePayloads.head, 2, 0).get
    assert(pcm.length == 2 && pcm.forall(_.length == 1152))
    assert(pcm(0).exists(_ != 0.0))
    val again = Mp3.decodePcm(stream.framePayloads.head, 2, 0).get
    for (c <- 0 until 2) assert(pcm(c).sameElements(again(c)))
    val viaStream = Mp3.decodePcmStream(stream, 0).get
    for (c <- 0 until 2) assert(viaStream(c).sameElements(pcm(c)))
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 200) {
      val c = frame.clone()
      val bit = rnd.nextInt(c.length * 8)
      c(bit >> 3) = (c(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      Mp3.parseMp3(c).foreach { s =>
        Mp3.decodePcm(s.framePayloads.head, 2, 0) // Option contract
      }
    }
  }

  test("mp3 short strictness: scfsi into a short granule rejects; MS across differing block types rejects") {
    import graft.multimodal.Mp3
    val (si, sfs, sp) = mp3ShortFrameSpec(1L)
    val payload = Mp3.encodeSpectra(si, 2, sfs, sp)
    // granule 1 is short -> no defined scfsi sharing: flip the first
    // scfsi bit of ch 0 in the packed payload (bit 12 = mdb 9 + private 3)
    val c = payload.clone()
    c(12 >> 3) = (c(12 >> 3) | (1 << (7 - (12 & 7)))).toByte
    assert(Mp3.decodeSpectra(c, 2, 0).isEmpty, "scfsi into short granule accepted")
    // MS stereo with per-channel block types differing: granule 0 ch 1
    // long vs ch 0 start-window
    // region0Count 7 puts the region boundary at sample 36 like the
    // window-switched fixture, so the same value formula stays codable
    val giLong = Mp3.GranuleInfo(0, si.granules(0)(1).bigValues,
      si.granules(0)(1).globalGain, 9, windowSwitching = false,
      blockType = 0, mixedBlock = false, Seq(4, 14, 0), Nil, 7, 0,
      0, si.granules(0)(1).scalefacScale, si.granules(0)(1).count1TableSelect)
    val mixedSi = si.copy(granules = Seq(
      Seq(si.granules(0)(0), giLong), si.granules(1)))
    val mixedSfs = Seq(Seq(sfs(0)(0), Array.tabulate(21)(b => ((1L + b) % 4).toInt)),
      sfs(1))
    val p2 = Mp3.encodeSpectra(mixedSi, 2, mixedSfs, sp)
    assert(Mp3.decodePcm(p2, 2, 0, msStereo = true).isEmpty,
      "MS across differing block types accepted")
    assert(Mp3.decodePcm(p2, 2, 0).isDefined, "non-MS decode should still work")
  }

  test("mp3 window formulas: start/stop windows match the spec piecewise; imdct12x3 zero/linearity") {
    import graft.multimodal.Mp3
    for (i <- 0 until 36) {
      val w1 = Mp3.longWindow(1, i)
      val w3 = Mp3.longWindow(3, i)
      if (i < 18) assert(w1 == math.sin(math.Pi / 36 * (i + 0.5)))
      else if (i < 24) assert(w1 == 1.0)
      else if (i < 30) assert(w1 == math.sin(math.Pi / 12 * (i - 18 + 0.5)))
      else assert(w1 == 0.0)
      if (i < 6) assert(w3 == 0.0)
      else if (i < 12) assert(w3 == math.sin(math.Pi / 12 * (i - 6 + 0.5)))
      else if (i < 18) assert(w3 == 1.0)
      else assert(w3 == math.sin(math.Pi / 36 * (i + 0.5)))
    }
    val zero = Mp3.imdct12x3(new Array[Double](576), 0)
    assert(zero.forall(_ == 0.0))
    val x = Array.tabulate(576)(i => if (i < 18) (i + 1).toDouble else 0.0)
    val z1 = Mp3.imdct12x3(x, 0)
    val z2 = Mp3.imdct12x3(x.map(_ * 2.0), 0)
    assert((0 until 36).forall(i => math.abs(z2(i) - 2 * z1(i)) < 1e-12))
    assert((0 until 6).forall(i => z1(i) == 0.0) &&
      (30 until 36).forall(i => z1(i) == 0.0), "short composite edges must be zero")
  }

  test("mp3 stream decode rejects a granule walk overrunning its own slot region (r14 ADVICE)") {
    import graft.multimodal.Mp3
    // 32 kbps frames: flen = 104, slot region = 68 bytes per frame. Frame
    // 0 carries main data LONGER than its own region (spilling forward
    // into frame 1's region — data from the FUTURE, which §2.4.2.3
    // forbids); frame 1 is a zero-bit frame (sfc 0, big_values 0,
    // part2_3 0) that decodes reading nothing, so pre-check the stream
    // would have "decoded" cleanly — a misparse, not a crash.
    val (si, sfs, sp) = mp3FrameSpec(6L)
    val (side0, main0) = Mp3.encodeFrameParts(si.copy(mainDataBegin = 0), 2, sfs, sp)
    assert(main0.length > 68 && main0.length <= 136,
      s"fixture needs 68 < main (${main0.length}) <= 136 to spill exactly one frame")
    val zeroGi = Mp3.GranuleInfo(0, 0, 0, 0, windowSwitching = false,
      blockType = 0, mixedBlock = false, Seq(0, 0, 0), Nil, 0, 0, 0, 0, 0)
    val si1 = Mp3.SideInfo(0, 0, Seq.fill(2)(Seq.fill(4)(0)),
      Seq.fill(2)(Seq.fill(2)(zeroGi)))
    val (side1, main1) = Mp3.encodeFrameParts(si1, 2,
      Seq.fill(2)(Seq.fill(2)(Array.fill(21)(0))),
      Seq.fill(2)(Seq.fill(2)(Array.empty[Int])))
    assert(main1.isEmpty)
    val slots = java.util.Arrays.copyOf(main0, 136)
    val data = side0 ++ slots.slice(0, 68) ++ side1 ++ slots.slice(68, 136)
    val stream = Mp3.parseMp3(Mp3.encodeMp3(2, 1, 0, data)).get
    assert(Mp3.decodeSpectraStream(stream, 0).isEmpty,
      "frame 0's walk past its own slot region must reject")
    // control: the same frame at a bitrate whose region holds it decodes
    val big = Mp3.encodeMp3(1, 9, 0, java.util.Arrays.copyOf(side0 ++ main0, 413))
    assert(Mp3.decodeSpectraStream(Mp3.parseMp3(big).get, 0).isDefined)
  }

  test("aac loaders: sfbook and bands specs round-trip; malformed specs throw") {
    import graft.multimodal.Aac
    val sfb = Aac.parseAacSfBookSpec("sfbook\n0 60\n10 59\n11 61")
    assert(sfb.codes == Map("0" -> 60, "10" -> 59, "11" -> 61))
    val bands = Aac.parseAacBandsSpec("# iso table\nbands 0 4 8 16 1024")
    assert(bands.sameElements(Array(0, 4, 8, 16, 1024)))
    intercept[IllegalArgumentException](Aac.parseAacBandsSpec("bands 4 8"))
    intercept[IllegalArgumentException](
      Aac.parseAacBooksSpec("book 12 dim 4 signed 0 escape 0\n0 0 0 0 0"))
    intercept[IllegalArgumentException]( // not prefix-free
      Aac.parseAacBooksSpec("book 5 dim 2 signed 1 escape 0\n0 0 0\n01 1 1"))
  }

  // ---- H.264 CAVLC Intra_16x16 luma decode (round 15) ----

  private def i16SpsPps(wMbs: Int, hMbs: Int, qp: Int = 26) = {
    import graft.multimodal.H264
    val sps = H264.parseSps(H264.encodeSps(66, 30, 0, 0, 0, 1,
      wMbs - 1, hMbs - 1, frameMbsOnly = true, crop = None)).get
    val pps = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      picInitQp = qp)).get
    (sps, pps)
  }

  test("h264 cavlc residual: emit -> decode round-trips across magnitudes, escapes, runs and nC classes") {
    import graft.multimodal.H264Cavlc
    val t = H264Cavlc.fixtureTables
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 500) {
      val maxCoeffs = Seq(16, 15, 4)(trial % 3)
      val nC = if (maxCoeffs == 4) -1 else Seq(0, 1, 2, 3, 5, 9)(trial % 6)
      val coeffs = new Array[Int](maxCoeffs)
      val n = rnd.nextInt(maxCoeffs + 1)
      rnd.shuffle((0 until maxCoeffs).toList).take(n).foreach { pos =>
        val mag = rnd.nextInt(5) match {
          case 0 => 1
          case 1 => 2
          case 2 => 3 + rnd.nextInt(12)
          case 3 => 16 + rnd.nextInt(200)
          case _ => 500 + rnd.nextInt(1500) // 12-bit escape territory
        }
        coeffs(pos) = if (rnd.nextBoolean()) mag else -mag
      }
      val w = new H264Cavlc.BitWriter
      H264Cavlc.emitResidualBlock(w, coeffs, nC, t)
      val bytes = w.stopAndPad()
      val r = new H264Cavlc.BitReader(bytes)
      val (got, tc) = H264Cavlc.residualBlock(r, nC, maxCoeffs, t)
      assert(got.sameElements(coeffs), s"trial $trial: ${coeffs.mkString(",")} vs ${got.mkString(",")}")
      assert(tc == coeffs.count(_ != 0))
    }
  }

  test("h264 transforms: DC impulse known vectors through Hadamard, scaling and the 4x4 inverse core") {
    import graft.multimodal.H264Cavlc
    // inverse core: d(0,0) = 64 -> all residuals (64 + 32) >> 6 = 1
    val d = new Array[Int](16); d(0) = 64
    assert(H264Cavlc.inverseTransform4x4(d).forall(_ == 1))
    // Hadamard of a DC-corner impulse spreads 1 everywhere
    val c = new Array[Int](16); c(0) = 1
    assert(H264Cavlc.inverseHadamard4x4(c).forall(_ == 1))
    // DC scaling at qp 24 (< 36 branch): (f·16·10 + 2) >> 2 = 40f
    assert(H264Cavlc.scaleLumaDc(1, 24) == 40)
    assert(H264Cavlc.scaleLumaDc(-3, 24) == -120)
    // and the >= 36 branch: qp 40 -> (f·16·16) << (6 - 6) = 256f
    assert(H264Cavlc.scaleLumaDc(2, 40) == 512)
    // AC scaling: c·normAdjust·2^(qp/6); qp 24, position (0,0): 10·16
    assert(H264Cavlc.scaleAc(1, 24, 0, 0) == 160)
    assert(H264Cavlc.scaleAc(-2, 25, 1, 1) == -2 * 18 * 16)
  }

  test("h264 intra16x16 prediction: V/H copy borders, DC averages, Plane fits a linear ramp") {
    import graft.multimodal.H264Cavlc
    // 32x32 plane; decode target is the MB at (1, 1) so all borders exist
    val w = 32
    val plane = Array.tabulate(w * w)(i => (3 * (i % w) + 2 * (i / w) + 10) % 256)
    def at(x: Int, y: Int) = plane(y * w + x)
    val v = H264Cavlc.predictIntra16x16(0, plane, w, 1, 1)
    for (x <- 0 until 16; y <- 0 until 16)
      assert(v(16 * y + x) == at(16 + x, 15), s"V ($x,$y)")
    val hP = H264Cavlc.predictIntra16x16(1, plane, w, 1, 1)
    for (x <- 0 until 16; y <- 0 until 16)
      assert(hP(16 * y + x) == at(15, 16 + y), s"H ($x,$y)")
    val dc = H264Cavlc.predictIntra16x16(2, plane, w, 1, 1)
    val want = ((0 until 16).map(x => at(16 + x, 15)).sum +
      (0 until 16).map(y => at(15, 16 + y)).sum + 16) >> 5
    assert(dc.forall(_ == want))
    // Plane over an exact ramp p = a + 3x + 2y reproduces the ramp
    val ramp = Array.tabulate(w * w)(i => 50 + 3 * (i % w) + 2 * (i / w))
    val pl = H264Cavlc.predictIntra16x16(3, ramp, w, 1, 1)
    for (x <- 0 until 16; y <- 0 until 16)
      assert(math.abs(pl(16 * y + x) - (50 + 3 * (16 + x) + 2 * (16 + y))) <= 1,
        s"Plane ($x,$y): ${pl(16 * y + x)}")
    // modes needing absent neighbors throw (conforming streams never code them)
    intercept[IllegalArgumentException](H264Cavlc.predictIntra16x16(0, plane, w, 1, 0))
    intercept[IllegalArgumentException](H264Cavlc.predictIntra16x16(1, plane, w, 0, 1))
    intercept[IllegalArgumentException](H264Cavlc.predictIntra16x16(3, plane, w, 0, 1))
  }

  test("h264 i16x16 slice: all-zero residual + DC chain reconstructs a flat 128 picture; DC impulse lifts it to 129") {
    import graft.multimodal.{H264, H264Cavlc}
    val (sps, pps) = i16SpsPps(2, 2, qp = 24)
    val t = H264Cavlc.fixtureTables
    def mb(pred: Int, dc0: Int) = H264Cavlc.I16MbSpec(pred, 0, 0,
      Array.tabulate(16)(k => if (k == 0) dc0 else 0), Array.fill(16)(new Array[Int](15)))
    // all-zero: DC pred with no neighbors -> 128 everywhere, then H/V/Plane
    // propagate the flat picture
    val flat = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0,
      Seq(mb(2, 0), mb(1, 0), mb(0, 0), mb(3, 0)), t)
    val p = H264Cavlc.parseI16x16Slice(flat, sps, pps, 3, 5, t).get
    assert(p.sliceQp == 24 && p.widthMbs == 2 && p.heightMbs == 2)
    assert(p.mbs.map(_.predMode) == Seq(2, 1, 0, 3))
    assert(p.luma.forall(_ == 128), "flat decode is not 128")
    // DC impulse on MB 0 only at qp 24 (dc = 40 -> residual +1): MB 0
    // reconstructs 129 and H/V/Plane prediction PROPAGATES it through
    // the zero-residual MBs — the whole picture lifts to 129
    val lifted = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0,
      Seq(mb(2, 1), mb(1, 0), mb(0, 0), mb(3, 0)), t)
    val q = H264Cavlc.parseI16x16Slice(lifted, sps, pps, 3, 5, t).get
    assert(q.luma.forall(_ == 129), "DC impulse decode is not 129")
  }

  test("h264 i16x16 slice: full roundtrip with AC levels, qp deltas and all four prediction modes is deterministic") {
    import graft.multimodal.{H264, H264Cavlc}
    val (sps, pps) = i16SpsPps(2, 2, qp = 28)
    val t = H264Cavlc.fixtureTables
    def mbSpec(seed: Int, pred: Int, qpd: Int) = H264Cavlc.I16MbSpec(pred, 0, qpd,
      Array.tabulate(16)(k => if ((seed + k) % 4 == 0) ((seed + k) % 5) - 2 else 0),
      Array.tabulate(16)(blk => Array.tabulate(15)(pos =>
        if ((seed + blk + pos) % 7 == 0) ((seed + blk * pos) % 5) - 2 else 0)))
    val mbs = Seq(mbSpec(1, 2, -3), mbSpec(2, 1, 2), mbSpec(3, 0, 0), mbSpec(4, 3, 1))
    val rbsp = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 1, 2, 3, 0, mbs, t)
    val p1 = H264Cavlc.parseI16x16Slice(rbsp, sps, pps, 3, 5, t).get
    val p2 = H264Cavlc.parseI16x16Slice(rbsp, sps, pps, 3, 5, t).get
    assert(p1.luma.sameElements(p2.luma))
    assert(p1.frameNum == 1 && p1.idrPicId == 2 && p1.pocLsb == 3)
    assert(p1.mbs.map(_.qp) == Seq(25, 27, 27, 28)) // prev-chained deltas
    assert(p1.mbs.map(_.cbpLuma) == Seq(15, 15, 15, 15))
    assert(p1.luma.forall(v => v >= 0 && v <= 255))
    assert(p1.luma.distinct.length > 4, "reconstruction suspiciously flat")
    // end-to-end through the Annex-B container
    val stream = H264.parse(H264.annexB(Seq(
      (3, 7, H264.encodeSps(66, 30, 0, 0, 0, 1, 1, 1, frameMbsOnly = true, crop = None)),
      (3, 8, H264.encodePps(0, 0, cabac = false, picInitQp = 28)),
      (3, 5, rbsp)))).get
    val slice = stream.nals.find(_.nalType == 5).get
    val viaStream = H264Cavlc.parseI16x16Slice(slice.rbsp, stream.sps.get,
      stream.pps.get, slice.nalRefIdc, slice.nalType, t).get
    assert(viaStream.luma.sameElements(p1.luma))
  }

  test("h264 i16x16 strict rejects: I_PCM mb_type, CABAC, trailing bytes, mutation fuzz") {
    import graft.multimodal.{H264, H264Cavlc}
    val (sps, pps) = i16SpsPps(1, 1)
    val t = H264Cavlc.fixtureTables
    val ok = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0,
      Seq(H264Cavlc.I16MbSpec(2, 0, 0, new Array[Int](16),
        Array.fill(16)(new Array[Int](15)))), t)
    assert(H264Cavlc.parseI16x16Slice(ok, sps, pps, 3, 5, t).isDefined)
    // CABAC PPS rejects before any slice-data read
    val cabacPps = H264.parsePps(H264.encodePps(0, 0, cabac = true)).get
    assert(H264Cavlc.parseI16x16Slice(ok, sps, cabacPps, 3, 5, t).isEmpty)
    // trailing byte after rbsp_trailing_bits rejects
    assert(H264Cavlc.parseI16x16Slice(ok :+ 0x55.toByte, sps, pps, 3, 5, t).isEmpty)
    // I_PCM (mb_type 25) still rejects inside THIS parser (it has its
    // own parser in H264); I_NxN (0) decodes since round 16. Mutation
    // fuzz covers the malformed space.
    val rnd = new scala.util.Random(41)
    for (_ <- 0 until 300) {
      val m = ok.clone()
      val bit = rnd.nextInt(m.length * 8)
      m(bit >> 3) = (m(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      H264Cavlc.parseI16x16Slice(m, sps, pps, 3, 5, t) // never throws
    }
    // nonzero AC with forced CBP luma 0 is a fixture-build error
    intercept[IllegalArgumentException](H264Cavlc.encodeI16x16Slice(
      sps, pps, 3, idr = true, 0, 0, 0, 0,
      Seq(H264Cavlc.I16MbSpec(2, 0, 0, new Array[Int](16),
        Array.fill(16)(Array.tabulate(15)(i => if (i == 0) 1 else 0)),
        forceCbpLuma = Some(0))), t))
  }

  test("h264 intra4x4 prediction: all nine modes against an independent spec restatement (round 16)") {
    import graft.multimodal.H264Cavlc
    val rnd = new scala.util.Random(163)
    val w = 32
    // second transcription of the §8.3.1.2 formulas with an explicit
    // p(x, y) border accessor — offsets/taps typed independently
    def ref(plane: Array[Int], mode: Int, gx: Int, gy: Int,
            htr: Boolean): Array[Int] = {
      def p(x: Int, y: Int): Int =
        if (y == -1) {
          val xx = if (x >= 4 && !htr) 3 else x
          plane((4 * gy - 1) * w + 4 * gx + xx)
        } else plane((4 * gy + y) * w + 4 * gx - 1)
      val o = new Array[Int](16)
      for (y <- 0 until 4; x <- 0 until 4) o(4 * y + x) = mode match {
        case 0 => p(x, -1)
        case 1 => p(-1, y)
        case 2 => ((0 to 3).map(p(_, -1)).sum + (0 to 3).map(p(-1, _)).sum + 4) >> 3
        case 3 =>
          if (x == 3 && y == 3) (p(6, -1) + 3 * p(7, -1) + 2) >> 2
          else (p(x + y, -1) + 2 * p(x + y + 1, -1) + p(x + y + 2, -1) + 2) >> 2
        case 4 =>
          if (x > y) (p(x - y - 2, -1) + 2 * p(x - y - 1, -1) + p(x - y, -1) + 2) >> 2
          else if (x < y) (p(-1, y - x - 2) + 2 * p(-1, y - x - 1) + p(-1, y - x) + 2) >> 2
          else (p(0, -1) + 2 * p(-1, -1) + p(-1, 0) + 2) >> 2
        case 5 => 2 * x - y match {
          case z if z >= 0 && z % 2 == 0 =>
            (p(x - (y >> 1) - 1, -1) + p(x - (y >> 1), -1) + 1) >> 1
          case z if z >= 1 =>
            (p(x - (y >> 1) - 2, -1) + 2 * p(x - (y >> 1) - 1, -1) + p(x - (y >> 1), -1) + 2) >> 2
          case -1 => (p(-1, 0) + 2 * p(-1, -1) + p(0, -1) + 2) >> 2
          case _ => (p(-1, y - 1) + 2 * p(-1, y - 2) + p(-1, y - 3) + 2) >> 2
        }
        case 6 => 2 * y - x match {
          case z if z >= 0 && z % 2 == 0 =>
            (p(-1, y - (x >> 1) - 1) + p(-1, y - (x >> 1)) + 1) >> 1
          case z if z >= 1 =>
            (p(-1, y - (x >> 1) - 2) + 2 * p(-1, y - (x >> 1) - 1) + p(-1, y - (x >> 1)) + 2) >> 2
          case -1 => (p(-1, 0) + 2 * p(-1, -1) + p(0, -1) + 2) >> 2
          case _ => (p(x - 1, -1) + 2 * p(x - 2, -1) + p(x - 3, -1) + 2) >> 2
        }
        case 7 =>
          if (y % 2 == 0) (p(x + (y >> 1), -1) + p(x + (y >> 1) + 1, -1) + 1) >> 1
          else (p(x + (y >> 1), -1) + 2 * p(x + (y >> 1) + 1, -1) + p(x + (y >> 1) + 2, -1) + 2) >> 2
        case 8 => x + 2 * y match {
          case z if z > 5 => p(-1, 3)
          case 5 => (p(-1, 2) + 3 * p(-1, 3) + 2) >> 2
          case z if z % 2 == 0 => (p(-1, y + (x >> 1)) + p(-1, y + (x >> 1) + 1) + 1) >> 1
          case _ =>
            (p(-1, y + (x >> 1)) + 2 * p(-1, y + (x >> 1) + 1) + p(-1, y + (x >> 1) + 2) + 2) >> 2
        }
      }
      o
    }
    for (_ <- 0 until 30) {
      val plane = Array.tabulate(w * w)(_ => rnd.nextInt(256))
      val gx = 1 + rnd.nextInt(6); val gy = 1 + rnd.nextInt(6)
      for (mode <- 0 to 8; htr <- Seq(true, false)) {
        val got = H264Cavlc.predictIntra4x4(mode, plane, w, gx, gy,
          hasLeft = true, hasTop = true, hasCorner = true, hasTopRight = htr)
        val want = ref(plane, mode, gx, gy, htr)
        assert(got.sameElements(want), s"mode $mode htr $htr at ($gx,$gy)")
      }
    }
    // DC fallbacks: left-only, top-only, isolated
    val plane = Array.tabulate(w * w)(_ => rnd.nextInt(256))
    val dcL = H264Cavlc.predictIntra4x4(2, plane, w, 2, 2,
      hasLeft = true, hasTop = false, hasCorner = false, hasTopRight = false)
    assert(dcL.forall(_ == ((0 to 3).map(y => plane((8 + y) * w + 7)).sum + 2) >> 2))
    val dcT = H264Cavlc.predictIntra4x4(2, plane, w, 2, 2,
      hasLeft = false, hasTop = true, hasCorner = false, hasTopRight = false)
    assert(dcT.forall(_ == ((0 to 3).map(x => plane(7 * w + 8 + x)).sum + 2) >> 2))
    val dc0 = H264Cavlc.predictIntra4x4(2, plane, w, 2, 2,
      hasLeft = false, hasTop = false, hasCorner = false, hasTopRight = false)
    assert(dc0.forall(_ == 128))
    // modes needing absent neighbors throw
    intercept[IllegalArgumentException](H264Cavlc.predictIntra4x4(0, plane, w,
      2, 2, hasLeft = true, hasTop = false, hasCorner = false, hasTopRight = false))
    intercept[IllegalArgumentException](H264Cavlc.predictIntra4x4(4, plane, w,
      2, 2, hasLeft = true, hasTop = true, hasCorner = false, hasTopRight = false))
    intercept[IllegalArgumentException](H264Cavlc.predictIntra4x4(8, plane, w,
      2, 2, hasLeft = false, hasTop = true, hasCorner = false, hasTopRight = false))
  }

  test("h264 i4x4 slice: flat-128 known answer, single DC impulse cascades to flat 131 via in-MB DC chains (round 16)") {
    import graft.multimodal.H264Cavlc
    val (sps, pps) = i16SpsPps(2, 2, qp = 24)
    val t = H264Cavlc.fixtureTables
    def mb(scan0: Int) = H264Cavlc.I4x4MbSpec(Array.fill(16)(2), 0, 0,
      Array.tabulate(16, 16)((blk, p) =>
        if (blk == 0 && p == 0) scan0 else 0).map(_.toArray),
      forceCbpLuma = Some(15))
    val flat = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0,
      Seq(mb(0), mb(0), mb(0), mb(0)), t)
    val p = H264Cavlc.parseI16x16Slice(flat, sps, pps, 3, 5, t).get
    assert(p.mbs.forall(m => m.isI4x4 && m.predMode == -1 && m.cbpLuma == 15))
    assert(p.mbs.forall(_.modes4x4.forall(_ == 2)))
    assert(p.luma.forall(_ == 128), "flat i4x4 decode is not 128")
    // one DC level in MB0 blk0 at qp 24: scaleAc(1,24,0,0) = 160,
    // IT -> (160+32)>>6 = +3 on all 16 samples -> blk0 = 131; every
    // later block DC-predicts off reconstructed neighbors, so the
    // whole picture cascades to 131
    val lifted = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0,
      Seq(mb(1), mb(0), mb(0), mb(0)), t)
    val q = H264Cavlc.parseI16x16Slice(lifted, sps, pps, 3, 5, t).get
    assert(q.luma.forall(_ == 131), "i4x4 DC impulse cascade is not 131")
  }

  test("h264 i4x4 slice: mode signalling roundtrip, me(v) CBP, conditional qp delta, I16 mixing, mutation fuzz (round 16)") {
    import graft.multimodal.H264Cavlc
    val (sps, pps) = i16SpsPps(2, 2, qp = 28)
    val t = H264Cavlc.fixtureTables
    val rnd = new scala.util.Random(77)
    // availability-legal mode choice per global block position
    def legalMode(gx: Int, gy: Int, pick: Int): Int = {
      val s = if (gx == 0 && gy == 0) Seq(2)
        else if (gy == 0) Seq(1, 2, 8)
        else if (gx == 0) Seq(0, 2, 3, 7)
        else 0 to 8
      s(pick % s.length)
    }
    def i4mb(mbx: Int, mby: Int, seed: Int, qpd: Int) = H264Cavlc.I4x4MbSpec(
      Array.tabulate(16) { blk =>
        val bx = 2 * ((blk / 4) % 2) + blk % 4 % 2
        val by = 2 * ((blk / 4) / 2) + (blk % 4) / 2
        legalMode(4 * mbx + bx, 4 * mby + by, seed + blk)
      }, 0, qpd,
      Array.tabulate(16, 16)((blk, p) =>
        if ((seed + blk + p) % 6 == 0) ((seed + blk * (p + 1)) % 5) - 2 else 0)
        .map(_.toArray),
      forceCbpLuma = Some(15))
    def i16mb(seed: Int, pred: Int, qpd: Int) = H264Cavlc.I16MbSpec(pred, 0, qpd,
      Array.tabulate(16)(k => if ((seed + k) % 4 == 0) ((seed + k) % 5) - 2 else 0),
      Array.tabulate(16)(blk => Array.tabulate(15)(pos =>
        if ((seed + blk + pos) % 7 == 0) ((seed + blk * pos) % 5) - 2 else 0)))
    // MIXED picture: I4x4, I16, I16, I4x4 — modeGrid -1 inference at
    // the I16/I4x4 seams, qp chaining across both kinds
    val mbs = Seq(i4mb(0, 0, 3, -2), i16mb(5, 1, 3), i16mb(7, 0, 0), i4mb(1, 1, 11, 1))
    val rbsp = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 1, 2, 3, 0, mbs, t)
    val p1 = H264Cavlc.parseI16x16Slice(rbsp, sps, pps, 3, 5, t).get
    val p2 = H264Cavlc.parseI16x16Slice(rbsp, sps, pps, 3, 5, t).get
    assert(p1.luma.sameElements(p2.luma))
    assert(p1.mbs.map(_.isI4x4) == Seq(true, false, false, true))
    assert(p1.mbs(0).modes4x4.sameElements(mbs(0).asInstanceOf[H264Cavlc.I4x4MbSpec].modes))
    assert(p1.mbs(3).modes4x4.sameElements(mbs(3).asInstanceOf[H264Cavlc.I4x4MbSpec].modes))
    assert(p1.mbs.map(_.qp) == Seq(26, 29, 29, 30)) // chained deltas
    assert(p1.luma.forall(v => v >= 0 && v <= 255))
    assert(p1.luma.distinct.length > 4, "reconstruction suspiciously flat")
    // CBP-zero MB carries NO qp delta field: an all-zero I4x4 spec with
    // qpDelta != 0 is a fixture-build error
    intercept[IllegalArgumentException](H264Cavlc.encodeI16x16Slice(
      sps, pps, 3, idr = true, 0, 0, 0, 0,
      Seq(i4mb(0, 0, 3, 0).copy(lumaScan = Array.fill(16)(new Array[Int](16)),
          forceCbpLuma = None, qpDelta = 2),
        i16mb(1, 1, 0), i16mb(2, 0, 0), i4mb(1, 1, 4, 0)), t))
    // and a CBP-zero MB decodes with the previous qp (no delta read)
    val zeroCbp = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, -3,
      Seq(i4mb(0, 0, 3, 0).copy(lumaScan = Array.fill(16)(new Array[Int](16)),
          forceCbpLuma = None),
        i16mb(1, 1, 2), i16mb(2, 0, 0), i4mb(1, 1, 4, 0)), t)
    val pz = H264Cavlc.parseI16x16Slice(zeroCbp, sps, pps, 3, 5, t).get
    assert(pz.mbs(0).cbpLuma == 0 && pz.mbs(0).qp == 25) // slice qp 25, no delta
    assert(pz.mbs(1).qp == 27)
    // forceCbpLuma exercising PARTIAL luma CBP: only 8x8 #2 coded
    val partial = H264Cavlc.I4x4MbSpec(Array.fill(16)(2), 0, 1,
      Array.tabulate(16, 16)((blk, p) =>
        if (blk / 4 == 2 && (blk + p) % 5 == 0) 1 - (p % 3) else 0).map(_.toArray))
    val pr = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0,
      Seq(partial, i16mb(1, 1, 0), i16mb(2, 0, 0), i4mb(1, 1, 4, 0)), t)
    val pp = H264Cavlc.parseI16x16Slice(pr, sps, pps, 3, 5, t).get
    assert(pp.mbs(0).cbpLuma == 4, "derived per-8x8 CBP")
    // mutation fuzz: never throws
    for (_ <- 0 until 300) {
      val m = rbsp.clone()
      val bit = rnd.nextInt(m.length * 8)
      m(bit >> 3) = (m(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      H264Cavlc.parseI16x16Slice(m, sps, pps, 3, 5, t)
    }
    // Table 9-4 is a permutation of 0..47 and the inverse roundtrips
    assert(H264Cavlc.golombToIntra4x4Cbp.sorted.sameElements(0 until 48))
    assert((0 until 48).forall(c =>
      H264Cavlc.golombToIntra4x4Cbp(H264Cavlc.intra4x4CbpToGolomb(c)) == c))
  }

  test("h264 cabac engine: decision/bypass/terminate encode->decode bin-for-bin roundtrip fuzz (round 16)") {
    import graft.multimodal.H264Cabac
    val t = H264Cabac.fixtureTables
    val rnd = new scala.util.Random(211)
    for (trial <- 0 until 40) {
      val qp = rnd.nextInt(52)
      val n = 50 + rnd.nextInt(400)
      // a random schedule of (kind, ctx, bin): 0 decision, 1 bypass;
      // terminate(0) sprinkled in, terminate(1) at the very end
      val script = Seq.tabulate(n) { _ =>
        val kind = rnd.nextInt(10)
        if (kind < 6) (0, rnd.nextInt(399), rnd.nextInt(2))
        else if (kind < 9) (1, 0, rnd.nextInt(2))
        else (2, 0, 0)
      }
      val e = new H264Cabac.CabacEncoder(t, qp)
      script.foreach {
        case (0, ctx, b) => e.decision(if (ctx == 276) 275 else ctx, b)
        case (1, _, b) => e.bypass(b)
        case _ => e.terminate(0)
      }
      e.terminate(1)
      val bytes = e.assemble(Seq.empty)
      val d = new H264Cabac.CabacDecoder(bytes, 0, t, qp)
      script.foreach {
        case (0, ctx, b) =>
          assert(d.decision(if (ctx == 276) 275 else ctx) == b, s"trial $trial decision")
        case (1, _, b) => assert(d.bypass() == b, s"trial $trial bypass")
        case _ => assert(d.terminate() == 0, s"trial $trial terminate(0)")
      }
      assert(d.terminate() == 1, s"trial $trial final terminate")
      // the flush leaves less than a byte of slack — the parser's
      // trailing-strictness bound
      assert(d.bitsLeft < 8, s"trial $trial slack ${d.bitsLeft}")
    }
  }

  test("h264 cabac slice: CROSS-CODER equality — the same MB specs through CAVLC and CABAC decode to identical pictures") {
    import graft.multimodal.{H264, H264Cavlc, H264Cabac}
    val (sps, _) = i16SpsPps(2, 2, qp = 28)
    val ppsCabac = H264.parsePps(H264.encodePps(0, 0, cabac = true, picInitQp = 28)).get
    val ppsCavlc = H264.parsePps(H264.encodePps(0, 0, cabac = false, picInitQp = 28)).get
    def legalMode(gx: Int, gy: Int, pick: Int): Int = {
      val s = if (gx == 0 && gy == 0) Seq(2)
        else if (gy == 0) Seq(1, 2, 8)
        else if (gx == 0) Seq(0, 2, 3, 7)
        else 0 to 8
      s(pick % s.length)
    }
    // chroma modes legal per MB position: mb0 DC only; mb1 (top row)
    // DC/H; mb2 (left col) DC/V; mb3 anything
    def chromaModeAt(mbx: Int, mby: Int, pick: Int): Int =
      if (mbx == 0 && mby == 0) 0
      else if (mby == 0) Seq(0, 1)(pick % 2)
      else if (mbx == 0) Seq(0, 2)(pick % 2)
      else pick % 4
    def i4mb(mbx: Int, mby: Int, seed: Int, qpd: Int) = H264Cavlc.I4x4MbSpec(
      Array.tabulate(16) { blk =>
        val bx = 2 * ((blk / 4) % 2) + blk % 4 % 2
        val by = 2 * ((blk / 4) / 2) + (blk % 4) / 2
        legalMode(4 * mbx + bx, 4 * mby + by, seed + blk)
      }, chromaModeAt(mbx, mby, seed), qpd,
      Array.tabulate(16, 16)((blk, p) =>
        if ((seed + blk + p) % 6 == 0) ((seed + blk * (p + 1)) % 5) - 2 else 0)
        .map(_.toArray),
      forceCbpLuma = Some(15),
      chromaDc = Array.tabulate(2, 4)((c2, k) =>
        if ((seed + c2 + k) % 3 == 0) ((seed + k) % 5) - 2 else 0).map(_.toArray),
      chromaAc = Array.tabulate(2, 4, 15)((c2, b, p) =>
        if ((seed + c2 + b + p) % 9 == 0) ((seed + b + p) % 5) - 2 else 0)
        .map(_.map(_.toArray).toArray),
      forceCbpChroma = Some(2))
    def i16mb(seed: Int, pred: Int, qpd: Int, cmode: Int) = H264Cavlc.I16MbSpec(pred, cmode, qpd,
      Array.tabulate(16)(k => if ((seed + k) % 4 == 0) ((seed + k) % 5) - 2 else 0),
      Array.tabulate(16)(blk => Array.tabulate(15)(pos =>
        if ((seed + blk + pos) % 7 == 0) ((seed + blk * pos) % 5) - 2 else 0)),
      chromaDc = Array.tabulate(2, 4)((c2, k) =>
        if ((seed + c2 + k) % 4 == 0) ((seed + k) % 3) - 1 else 0).map(_.toArray),
      forceCbpChroma = Some(1))
    for (seed <- 1 to 6) {
      // mixed picture, varied qp deltas, chroma CBP 1 and 2 exercised
      val mbs = Seq(i4mb(0, 0, seed, -2),
        i16mb(seed + 4, 1, 3, chromaModeAt(1, 0, seed + 4)),
        i16mb(seed + 6, 0, 0, chromaModeAt(0, 1, seed + 6)),
        i4mb(1, 1, seed + 9, 1))
      val cavlcRbsp = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true,
        1, 2, 3, 0, mbs, H264Cavlc.fixtureTables)
      val cabacRbsp = H264Cabac.encodeISlice(sps, ppsCabac, 3, idr = true,
        1, 2, 3, 0, mbs, H264Cabac.fixtureTables)
      val a = H264Cavlc.parseI16x16Slice(cavlcRbsp, sps, ppsCavlc, 3, 5,
        H264Cavlc.fixtureTables).getOrElse(fail(s"seed $seed: CAVLC decode"))
      val b = H264Cabac.parseISlice(cabacRbsp, sps, ppsCabac, 3, 5,
        H264Cabac.fixtureTables).getOrElse(fail(s"seed $seed: CABAC decode"))
      assert(a.luma.sameElements(b.luma), s"seed $seed: luma differs")
      assert(a.cb.sameElements(b.cb) && a.cr.sameElements(b.cr),
        s"seed $seed: chroma differs")
      assert(a.mbs.map(_.qp) == b.mbs.map(_.qp), s"seed $seed: qp chain")
      assert(a.mbs.map(_.cbpLuma) == b.mbs.map(_.cbpLuma))
      assert(a.mbs.map(_.cbpChroma) == b.mbs.map(_.cbpChroma))
      assert((0 until 4).forall(i =>
        a.mbs(i).modes4x4.sameElements(b.mbs(i).modes4x4)), s"seed $seed: modes")
      assert(a.luma.distinct.length > 4, "reconstruction suspiciously flat")
    }
    // ---- round 17: Intra_8x8 through both coders (transform_8x8 PPS;
    // pictures mixing I8x8 with I4x4 and I16 so the flag, the cat-5
    // residual path, and the mixed-mode predictor all cross-check) ----
    val pps8Cavlc = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      picInitQp = 28, transform8x8 = true)).get
    val pps8Cabac = H264.parsePps(H264.encodePps(0, 0, cabac = true,
      picInitQp = 28, transform8x8 = true)).get
    def legal8(gx8: Int, gy8: Int, pick: Int): Int = {
      val s = if (gx8 == 0 && gy8 == 0) Seq(2)
        else if (gy8 == 0) Seq(1, 2, 8)
        else if (gx8 == 0) Seq(0, 2, 3, 7)
        else 0 to 8
      s(pick % s.length)
    }
    def i8mb(mbx: Int, mby: Int, seed: Int, qpd: Int) = H264Cavlc.I8x8MbSpec(
      Array.tabulate(4) { b =>
        legal8(2 * mbx + b % 2, 2 * mby + b / 2, seed + 2 * b)
      }, chromaModeAt(mbx, mby, seed), qpd,
      Array.tabulate(4, 64)((b, p) =>
        // CABAC cannot code an empty 8x8 (no cbf bin), so pin one
        // nonzero per block and derive the CBP in both coders
        if (p == 62 - b) 1
        else if ((seed + b + p) % 11 == 0) ((seed + b * (p + 1)) % 5) - 2 else 0)
        .map(_.toArray),
      chromaDc = Array.tabulate(2, 4)((c2, k) =>
        if ((seed + c2 + k) % 3 == 0) ((seed + k) % 5) - 2 else 0).map(_.toArray),
      forceCbpChroma = Some(1))
    for (seed <- 1 to 6) {
      val mbs = Seq(i8mb(0, 0, seed, 2),
        i4mb(1, 0, seed + 3, -1),
        i16mb(seed + 5, 0, 1, chromaModeAt(0, 1, seed + 5)),
        i8mb(1, 1, seed + 8, 0))
      val cavlcRbsp = H264Cavlc.encodeI16x16Slice(sps, pps8Cavlc, 3, idr = true,
        1, 2, 3, 0, mbs, H264Cavlc.fixtureTables)
      val cabacRbsp = H264Cabac.encodeISlice(sps, pps8Cabac, 3, idr = true,
        1, 2, 3, 0, mbs, H264Cabac.fixtureTables)
      val a = H264Cavlc.parseI16x16Slice(cavlcRbsp, sps, pps8Cavlc, 3, 5,
        H264Cavlc.fixtureTables).getOrElse(fail(s"8x8 seed $seed: CAVLC decode"))
      val b = H264Cabac.parseISlice(cabacRbsp, sps, pps8Cabac, 3, 5,
        H264Cabac.fixtureTables).getOrElse(fail(s"8x8 seed $seed: CABAC decode"))
      assert(a.luma.sameElements(b.luma), s"8x8 seed $seed: luma differs")
      assert(a.cb.sameElements(b.cb) && a.cr.sameElements(b.cr),
        s"8x8 seed $seed: chroma differs")
      assert(a.mbs.map(_.qp) == b.mbs.map(_.qp), s"8x8 seed $seed: qp chain")
      assert((0 until 4).forall(i =>
        a.mbs(i).modes8x8.sameElements(b.mbs(i).modes8x8) &&
        a.mbs(i).modes4x4.sameElements(b.mbs(i).modes4x4)),
        s"8x8 seed $seed: modes")
      assert(a.mbs(0).isI8x8 && a.mbs(1).isI4x4 && a.mbs(3).isI8x8)
      assert(a.luma.distinct.length > 4, "reconstruction suspiciously flat")
    }
  }

  test("h264 pps extension: transform_8x8/second chroma offset parse; scaling matrix rejects, transform_8x8 PPS decodes (round 17)") {
    import graft.multimodal.{H264, H264Cavlc, H264Cabac}
    // extension roundtrip: both fields reach the parsed Pps
    val extB = H264.encodePps(0, 0, cabac = false, picInitQp = 28,
      transform8x8 = true, chromaQpOffset2 = Some(-3))
    val ext = H264.parsePps(extB).getOrElse(fail("extension PPS must parse"))
    assert(ext.transform8x8 && ext.chromaQpOffset2.contains(-3))
    assert(ext.chromaQpOffsetCr == -3)
    // absent extension: Cr inherits the shared offset (§7.4.2.2)
    val plain = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      chromaQpOffset = 5)).get
    assert(!plain.transform8x8 && plain.chromaQpOffsetCr == 5)
    // transform_8x8 = 0 with a second offset also round-trips
    val ext0 = H264.parsePps(H264.encodePps(0, 0, cabac = true,
      transform8x8 = false, chromaQpOffset2 = Some(7))).get
    assert(!ext0.transform8x8 && ext0.chromaQpOffsetCr == 7)
    // pic_scaling_matrix_present strict-rejects: flip the bit the
    // encoder wrote as 0 (it directly follows transform_8x8_mode_flag)
    // — locate it by re-encoding with the flag as the only difference
    val withMatrix = {
      // hand-build: same as extB but scaling flag 1 — the parser must
      // reject rather than skip unparsed scaling lists
      val base = H264.encodePps(0, 0, cabac = false, picInitQp = 28,
        transform8x8 = true, chromaQpOffset2 = Some(-3))
      // the scaling flag is the bit right after transform_8x8 (itself
      // right after redundant_pic_cnt_present) — find it by diffing
      // against a transform8x8=false encode of the same PPS
      val alt = H264.encodePps(0, 0, cabac = false, picInitQp = 28,
        transform8x8 = false, chromaQpOffset2 = Some(-3))
      // first differing bit = the transform flag; the next bit is the
      // scaling flag
      var bit = -1
      var i = 0
      while (bit < 0 && i < base.length * 8) {
        val b1 = (base(i >> 3) >> (7 - (i & 7))) & 1
        val b2 = (alt(i >> 3) >> (7 - (i & 7))) & 1
        if (b1 != b2) bit = i
        i += 1
      }
      val m = base.clone()
      val sb = bit + 1
      m(sb >> 3) = (m(sb >> 3) ^ (1 << (7 - (sb & 7)))).toByte
      m
    }
    assert(H264.parsePps(withMatrix).isEmpty, "scaling matrix accepted")
    // round 17: a transform_8x8 PPS now DECODES at both slice parsers
    // (Intra_8x8 landed). An Intra_16x16-only slice carries no
    // transform_size_8x8_flag, so it parses identically under either
    // PPS — and byte-identically, since the I16 mb layer is unchanged.
    val (sps, _) = i16SpsPps(1, 1)
    val i16only = Seq(H264Cavlc.I16MbSpec(2, 0, 0, new Array[Int](16),
      Array.fill(16)(new Array[Int](15))))
    val ok = H264Cavlc.encodeI16x16Slice(sps,
      H264.parsePps(H264.encodePps(0, 0, cabac = false)).get, 3,
      idr = true, 0, 0, 0, 0, i16only, H264Cavlc.fixtureTables)
    val t8pps = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      transform8x8 = true)).get
    val underT8 = H264Cavlc.parseI16x16Slice(ok, sps, t8pps, 3, 5,
      H264Cavlc.fixtureTables)
    assert(underT8.nonEmpty && underT8.get.luma.forall(_ == 128),
      "I16-only slice must decode under a transform_8x8 PPS")
    val t8cabac = H264.parsePps(H264.encodePps(0, 0, cabac = true,
      transform8x8 = true)).get
    val okCabac = H264Cabac.encodeISlice(sps,
      H264.parsePps(H264.encodePps(0, 0, cabac = true)).get, 3,
      idr = true, 0, 0, 0, 0, i16only, H264Cabac.fixtureTables)
    assert(H264Cabac.parseISlice(okCabac, sps, t8cabac, 3, 5,
      H264Cabac.fixtureTables).nonEmpty,
      "CABAC I16-only slice must decode under a transform_8x8 PPS")
    // second_chroma_qp_index_offset reaches Cr's dequant: a Cb/Cr DC
    // impulse picture decodes Cr under its own QPC
    val (sps2, _) = i16SpsPps(1, 1, qp = 30)
    val ppsAsym = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      picInitQp = 30, chromaQpOffset = 0, chromaQpOffset2 = Some(-12))).get
    val mbC = H264Cavlc.I16MbSpec(2, 0, 0, new Array[Int](16),
      Array.fill(16)(new Array[Int](15)),
      chromaDc = Array(Array(1, 0, 0, 0), Array(1, 0, 0, 0)),
      forceCbpChroma = Some(1))
    val rb = H264Cavlc.encodeI16x16Slice(sps2, ppsAsym, 3, idr = true,
      0, 0, 0, 0, Seq(mbC), H264Cavlc.fixtureTables)
    val pic = H264Cavlc.parseI16x16Slice(rb, sps2, ppsAsym, 3, 5,
      H264Cavlc.fixtureTables).get
    // qp 30: Cb QPC = chromaQp(30, 0) = table(0) = 29; Cr QPC =
    // chromaQp(30, -12) = 18 — different dequant scales, so the two
    // planes lift 128 by different amounts
    val cbLift = pic.cb(0) - 128; val crLift = pic.cr(0) - 128
    assert(cbLift > 0 && crLift > 0 && cbLift != crLift,
      s"asymmetric chroma offsets must differ: cb +$cbLift cr +$crLift")
  }

  test("h264 cabac slice: strict rejects and mutation fuzz (round 16)") {
    import graft.multimodal.{H264, H264Cavlc, H264Cabac}
    val (sps, _) = i16SpsPps(1, 1)
    val ppsCabac = H264.parsePps(H264.encodePps(0, 0, cabac = true)).get
    val ppsCavlc = H264.parsePps(H264.encodePps(0, 0, cabac = false)).get
    val ok = H264Cabac.encodeISlice(sps, ppsCabac, 3, idr = true, 0, 0, 0, 0,
      Seq(H264Cavlc.I16MbSpec(2, 0, 0, new Array[Int](16),
        Array.fill(16)(new Array[Int](15)))), H264Cabac.fixtureTables)
    val p = H264Cabac.parseISlice(ok, sps, ppsCabac, 3, 5, H264Cabac.fixtureTables)
    assert(p.isDefined && p.get.luma.forall(_ == 128), "flat CABAC picture")
    // a CAVLC PPS rejects before any bin is read
    assert(H264Cabac.parseISlice(ok, sps, ppsCavlc, 3, 5,
      H264Cabac.fixtureTables).isEmpty)
    // trailing garbage bytes reject (flush slack is under a byte)
    assert(H264Cabac.parseISlice(ok :+ 0x55.toByte, sps, ppsCabac, 3, 5,
      H264Cabac.fixtureTables).isEmpty, "trailing byte accepted")
    // the CAVLC parser refuses CABAC PPSes and vice versa
    assert(H264Cavlc.parseI16x16Slice(ok, sps, ppsCabac, 3, 5,
      H264Cavlc.fixtureTables).isEmpty)
    // mutation fuzz: never throws, Option contract holds
    val rnd = new scala.util.Random(97)
    for (_ <- 0 until 300) {
      val m = ok.clone()
      val bit = rnd.nextInt(m.length * 8)
      m(bit >> 3) = (m(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      H264Cabac.parseISlice(m, sps, ppsCabac, 3, 5, H264Cabac.fixtureTables)
    }
    // parseCabacSpec: supplied rows replace fixture rows; typos throw
    val spec = H264Cabac.parseCabacSpec(
      "rangetab 0 100 120 140 160\ntranslps 5 1\ntransmps 5 9\nctxinit 60 3 70")
    assert(spec.rangeTabLps(0).sameElements(Array(100, 120, 140, 160)))
    assert(spec.transIdxLps(5) == 1 && spec.transIdxMps(5) == 9)
    assert(spec.ctxInit(60) == ((3, 70)))
    intercept[IllegalArgumentException](H264Cabac.parseCabacSpec("rangetabb 0 1 2 3 4"))
  }

  test("h264-in-mp4: avcC roundtrip, length-prefix walk, container == Annex-B pixels for BOTH entropy coders (round 16)") {
    import graft.multimodal.{H264, H264Cavlc, H264Cabac, H264Mp4, Mp4}
    val (sps, _) = i16SpsPps(2, 2, qp = 28)
    val spsB = H264.encodeSps(66, 30, 0, 0, 0, 1, 1, 1, frameMbsOnly = true, crop = None)
    val ppsCavlcB = H264.encodePps(0, 0, cabac = false, picInitQp = 28)
    val ppsCabacB = H264.encodePps(0, 0, cabac = true, picInitQp = 28)
    val ppsCavlc = H264.parsePps(ppsCavlcB).get
    val ppsCabac = H264.parsePps(ppsCabacB).get
    def mb(seed: Int) = H264Cavlc.I16MbSpec(if (seed % 2 == 0) 2 else 2, 0, 0,
      Array.tabulate(16)(k => if ((seed + k) % 4 == 0) ((seed + k) % 5) - 2 else 0),
      Array.tabulate(16)(blk => Array.tabulate(15)(pos =>
        if ((seed + blk + pos) % 7 == 0) ((seed + blk * pos) % 5) - 2 else 0)))
    val mbs = Seq(mb(1), mb(2), mb(3), mb(4))
    for ((cabacMode, lengthSize) <- Seq((false, 4), (true, 2), (true, 1))) {
      val pps = if (cabacMode) ppsCabac else ppsCavlc
      val ppsB = if (cabacMode) ppsCabacB else ppsCavlcB
      val rbsp =
        if (cabacMode) H264Cabac.encodeISlice(sps, pps, 3, idr = true, 0, 0, 0, 0,
          mbs, H264Cabac.fixtureTables)
        else H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0,
          mbs, H264Cavlc.fixtureTables)
      // Annex-B reference decode
      val direct =
        if (cabacMode) H264Cabac.parseISlice(rbsp, sps, pps, 3, 5, H264Cabac.fixtureTables).get
        else H264Cavlc.parseI16x16Slice(rbsp, sps, pps, 3, 5, H264Cavlc.fixtureTables).get
      // container: avcC (out-of-band SPS/PPS) + one length-prefixed sample
      val avcc = H264Mp4.encodeAvcc(66, 30, lengthSize,
        Seq(H264Mp4.nalUnit(3, 7, spsB)), Seq(H264Mp4.nalUnit(3, 8, ppsB)))
      val cfg = H264Mp4.parseAvcc(H264Mp4.encodeStsdAvc1(32, 32, avcc)).get
      assert(cfg.nalLengthSize == lengthSize && cfg.profile == 66 && cfg.level == 30)
      assert(H264.parseSps(H264Mp4.nalRbsp(cfg.sps.head)).contains(sps))
      assert(H264.parsePps(H264Mp4.nalRbsp(cfg.pps.head)).contains(pps))
      val sample = H264Mp4.sampleOf(lengthSize, Seq(H264Mp4.nalUnit(3, 5, rbsp)))
      val viaMp4 = H264Mp4.decodeSamplePicture(sample, cfg, sps, pps,
        H264Cavlc.fixtureTables, H264Cabac.fixtureTables).get
      assert(viaMp4.luma.sameElements(direct.luma),
        s"cabac=$cabacMode len=$lengthSize: container pixels differ")
      assert(viaMp4.cb.sameElements(direct.cb) && viaMp4.cr.sameElements(direct.cr))
      // splitSample handles multi-NAL samples and strict-rejects bad tiling
      val two = H264Mp4.sampleOf(lengthSize,
        Seq(H264Mp4.nalUnit(3, 7, spsB), H264Mp4.nalUnit(3, 5, rbsp)))
      assert(H264Mp4.splitSample(two, lengthSize).get.length == 2)
      // IN-BAND parameter sets inside a sample reject (they could
      // override the avcC config the decode is keyed on); SEI NALs
      // are skipped like real decoders do
      assert(H264Mp4.decodeSamplePicture(two, cfg, sps, pps,
        H264Cavlc.fixtureTables, H264Cabac.fixtureTables).isEmpty,
        "in-band SPS accepted")
      val withSei = H264Mp4.sampleOf(lengthSize,
        Seq(H264Mp4.nalUnit(0, 6, Array[Byte](1, 2, 3)),
          H264Mp4.nalUnit(3, 5, rbsp)))
      assert(H264Mp4.decodeSamplePicture(withSei, cfg, sps, pps,
        H264Cavlc.fixtureTables, H264Cabac.fixtureTables).get
        .luma.sameElements(direct.luma), "SEI-bearing sample must decode")
      // NAL types outside the whitelist {1,5,6,9,12} strict-reject —
      // data partitions, end-of-seq/stream, unknown types
      for (badType <- Seq(2, 3, 4, 10, 11, 13)) {
        val withBad = H264Mp4.sampleOf(lengthSize,
          Seq(H264Mp4.nalUnit(0, badType, Array[Byte](0)),
            H264Mp4.nalUnit(3, 5, rbsp)))
        assert(H264Mp4.decodeSamplePicture(withBad, cfg, sps, pps,
          H264Cavlc.fixtureTables, H264Cabac.fixtureTables).isEmpty,
          s"non-whitelisted NAL type $badType accepted")
      }
      assert(H264Mp4.splitSample(two.dropRight(1), lengthSize).isEmpty,
        "truncated sample accepted")
      assert(H264Mp4.splitSample(two :+ 0x01.toByte, lengthSize).isEmpty,
        "overhanging sample accepted")
    }
    // avcC strict rejects: bad version, reserved length size, truncation
    val goodAvcc = H264Mp4.encodeAvcc(66, 30, 4,
      Seq(H264Mp4.nalUnit(3, 7, spsB)), Seq(H264Mp4.nalUnit(3, 8, ppsCavlcB)))
    val stsd = H264Mp4.encodeStsdAvc1(32, 32, goodAvcc)
    assert(H264Mp4.parseAvcc(stsd).isDefined)
    val badVer = stsd.clone(); badVer(8 + 8 + 78 + 8) = 2 // configurationVersion
    assert(H264Mp4.parseAvcc(badVer).isEmpty, "bad avcC version accepted")
    assert(H264Mp4.parseAvcc(stsd.take(stsd.length - 3)).isEmpty,
      "truncated stsd accepted")
    // mutation fuzz over the full stsd: Option contract, never a throw
    val rnd = new scala.util.Random(59)
    for (_ <- 0 until 300) {
      val m = stsd.clone()
      val bit = rnd.nextInt(m.length * 8)
      m(bit >> 3) = (m(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      H264Mp4.parseAvcc(m)
    }
    // end to end through a real MP4 container (variable-size samples)
    val rbsp1 = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true, 0, 0, 0, 0,
      mbs, H264Cavlc.fixtureTables)
    val rbsp2 = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true, 1, 1, 1, -2,
      mbs.reverse, H264Cavlc.fixtureTables)
    val s1 = H264Mp4.sampleOf(4, Seq(H264Mp4.nalUnit(3, 5, rbsp1)))
    val s2 = H264Mp4.sampleOf(4, Seq(H264Mp4.nalUnit(3, 5, rbsp2)))
    val mp4 = Mp4.encodeMp4(32, 32, 1000L, 2L, 2, 0, s1 ++ s2,
      stsd = stsd, perSampleSizes = Some(Array(s1.length, s2.length)))
    val movie = Mp4.parseMp4(mp4).get
    val track = movie.tracks.find(_.kind == "vide").get
    assert(track.sampleSizes.sameElements(Array(s1.length, s2.length)))
    val cfg = H264Mp4.parseAvcc(track.stsd).get
    val base = (track.firstChunkOffset - movie.mdatFileOffset).toInt
    val sampleBytes1 = java.util.Arrays.copyOfRange(movie.mdat, base, base + s1.length)
    val pic1 = H264Mp4.decodeSamplePicture(sampleBytes1, cfg, sps, ppsCavlc,
      H264Cavlc.fixtureTables, H264Cabac.fixtureTables).get
    val ref1 = H264Cavlc.parseI16x16Slice(rbsp1, sps, ppsCavlc, 3, 5,
      H264Cavlc.fixtureTables).get
    assert(pic1.luma.sameElements(ref1.luma), "MP4-extracted sample 0 differs")
  }

  test("aac-in-mp4: esds/AudioSpecificConfig roundtrip, raw_data_block samples decode threaded, stereo parity (round 16)") {
    import graft.multimodal.{Aac, AacMp4, Mp4}
    // ASC roundtrip through a full stsd for every in-scope rate/channels
    for (rate <- 0 until 13; ch <- Seq(1, 2)) {
      val stsd = AacMp4.encodeStsdMp4a(ch, Aac.SampleRates(rate),
        AacMp4.encodeEsds(AacMp4.encodeAsc(rate, ch)))
      assert(AacMp4.parseEsds(stsd).contains(AacMp4.AacConfig(2, rate, ch)),
        s"rate $rate ch $ch")
    }
    // out-of-scope ASCs strict-reject: AOT != LC, 960-frame flag, ch 6
    def asc(b0: Int, b1: Int) = AacMp4.encodeStsdMp4a(2, 44100,
      AacMp4.encodeEsds(Array(b0.toByte, b1.toByte)))
    assert(AacMp4.parseEsds(asc((5 << 3) | 0, 2 << 3)).isEmpty, "AOT 5 accepted")
    assert(AacMp4.parseEsds(asc((2 << 3) | 0, (2 << 3) | 4)).isEmpty,
      "960-frame flag accepted")
    assert(AacMp4.parseEsds(asc((2 << 3) | 0, 6 << 3)).isEmpty, "6 channels accepted")
    // explicit/reserved sampling frequencies strict-reject (round 17,
    // r16 VERDICT #9): ASC rate index 13/14 are reserved and 15 is the
    // explicit-frequency escape (a 24-bit rate follows, shifting every
    // later field — skipping it would misparse the channel config)
    for (rate <- Seq(13, 14, 15)) {
      val b0 = (2 << 3) | (rate >> 1)
      val b1 = ((rate & 1) << 7) | (2 << 3)
      assert(AacMp4.parseEsds(asc(b0, b1)).isEmpty,
        s"ASC rate index $rate accepted")
    }
    // ADTS twin: poke rate index 13 into a valid frame's header
    // (sampling_frequency_index is header byte 2 bits 5..2)
    {
      val frame = Aac.encodeFrame(1, 4, 1, Aac.encodeSceWin(
        Aac.IcsInfo(0, 8, Array(1)), 100, Array(Array.fill(8)(12)),
        Array(Array.fill(8)(100)), new Array[Int](1024)))
      assert(Aac.parse(frame).nonEmpty)
      val bad = frame.clone()
      bad(2) = ((bad(2) & 0xC3) | (13 << 2)).toByte
      assert(Aac.parse(bad).isEmpty, "ADTS reserved rate index accepted")
    }
    // ES_Descriptor optional-field flags (streamDependence/URL/OCR)
    // strict-reject — a set flag means optional fields follow the
    // 3-byte ES_ID+flags and a fixed skip would walk misaligned.
    // stsd layout: 8 (stsd head) + 8 (entry head) + 28 (audio entry)
    // + 8 (esds box head) + 4 (FullBox) + 2 (tag 0x03 + size) +
    // 2 (ES_ID) = byte 60 is the flags byte.
    for (flag <- Seq(0x80, 0x40, 0x20)) {
      val good = AacMp4.encodeStsdMp4a(2, 44100,
        AacMp4.encodeEsds(AacMp4.encodeAsc(4, 2)))
      assert((good(60) & 0xff) == 0, "fixture flags byte not at offset 60")
      val bad = good.clone(); bad(60) = flag.toByte
      assert(AacMp4.parseEsds(bad).isEmpty, f"ES flags 0x$flag%02x accepted")
    }
    // mono container decode == direct ADTS-stream decode (the threaded
    // overlap crosses the SAMPLE boundary identically)
    def sce(f: Int): Array[Byte] = {
      val quant = Array.tabulate(1024) { i =>
        if (i >= 256) 0
        else { val m = ((f + i) % 3); if (m != 0 && (f + i) % 5 < 2) -m else m }
      }
      Aac.encodeSceWin(Aac.IcsInfo(0, 8, Array(1)), 100,
        Array(Array.fill(8)(12)), Array(Array.fill(8)(100)), quant)
    }
    val samples = (0 until 3).map(sce)
    val cfg = AacMp4.AacConfig(2, 4, 1)
    val viaMp4 = Aac.decodePcmStream(AacMp4.toStream(samples, cfg)).get
    val adts = Aac.parse(samples.map(p => Aac.encodeFrame(1, 4, 1, p))
      .reduce(_ ++ _)).get
    val direct = Aac.decodePcmStream(adts).get
    assert(viaMp4.sameElements(direct), "container stream PCM differs from ADTS")
    // stereo: CPE samples through the container path
    def cpe(f: Int): Array[Byte] = {
      val quant = Seq.tabulate(2)(c => Array.tabulate(1024) { i =>
        if (i >= 256) 0
        else { val m = ((f + i + c) % 3); if (m != 0 && (f + i) % 5 < 2) -m else m }
      })
      Aac.encodeCpeWin(Seq.fill(2)(Aac.IcsInfo(0, 8, Array(1))), Seq(100, 102),
        Seq.fill(2)(Array(Array.fill(8)(12))), Seq.fill(2)(Array(Array.fill(8)(100))),
        quant, msMaskPresent = 2)
    }
    val st = (0 until 2).map(cpe)
    val stereo = Aac.decodeCpePcmStream(
      AacMp4.toStream(st, AacMp4.AacConfig(2, 4, 2))).get
    val directSt = Aac.decodeCpePcmStream(
      Aac.parse(st.map(p => Aac.encodeFrame(1, 4, 2, p)).reduce(_ ++ _)).get).get
    assert(stereo(0).sameElements(directSt(0)) && stereo(1).sameElements(directSt(1)))
    // full MP4 file end to end with per-sample sizes + soun handler
    val stsd = AacMp4.encodeStsdMp4a(1, Aac.SampleRates(4),
      AacMp4.encodeEsds(AacMp4.encodeAsc(4, 1)))
    val mp4 = Mp4.encodeMp4(0, 0, 1000L, 3L, 3, 0, samples.flatten.toArray,
      stsd = stsd, perSampleSizes = Some(samples.map(_.length).toArray),
      handler = "soun")
    val movie = Mp4.parseMp4(mp4).get
    val track = movie.tracks.find(_.kind == "soun").get
    assert(track.sampleSizes.toSeq == samples.map(_.length))
    assert(AacMp4.parseEsds(track.stsd).contains(cfg))
    // mutation fuzz on the stsd: Option contract holds
    val rnd = new scala.util.Random(83)
    for (_ <- 0 until 300) {
      val m = track.stsd.clone()
      val bit = rnd.nextInt(m.length * 8)
      m(bit >> 3) = (m(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      AacMp4.parseEsds(m)
    }
  }

  test("mp4 interleaved chunks: stsc x stco resolves per-sample offsets across track-interleaved mdat; desynced tables reject (round 16)") {
    import graft.multimodal.Mp4
    // two tracks whose chunks alternate: [V0 | A0 A1 | V1 | A2] — the
    // old contiguous-from-first-chunk read would hand the video track
    // A0's bytes as its second sample (a silent misparse)
    val v = Seq(Array.tabulate(40)(i => (i + 1).toByte),
      Array.tabulate(56)(i => (i + 101).toByte))
    val a = Seq(Array.tabulate(24)(i => (i + 61).toByte),
      Array.tabulate(16)(i => (i + 86).toByte),
      Array.tabulate(32)(i => (i + 201).toByte))
    val mdat = (v(0) ++ a(0) ++ a(1) ++ v(1) ++ a(2)).toArray
    val vOff = Array(0L, (v(0).length + a(0).length + a(1).length).toLong)
    val aOff = Array(v(0).length.toLong,
      (v(0).length + a(0).length + a(1).length + v(1).length).toLong)
    val tracks = Seq(
      Mp4.TrackSpec("vide", 16, 16, Array.empty, v.map(_.length).toArray,
        Array(1, 1), vOff),
      Mp4.TrackSpec("soun", 0, 0, Array.empty, a.map(_.length).toArray,
        Array(2, 1), aOff))
    val file = Mp4.encodeMp4Multi(1000L, 5L, tracks, mdat)
    val m = Mp4.parseMp4(file).getOrElse(fail("interleaved file must parse"))
    assert(m.tracks.length == 2)
    val vt = m.tracks.find(_.kind == "vide").get
    val at = m.tracks.find(_.kind == "soun").get
    def slice(off: Long, len: Int): Array[Byte] = {
      val s = (off - m.mdatFileOffset).toInt
      java.util.Arrays.copyOfRange(m.mdat, s, s + len)
    }
    for (i <- v.indices)
      assert(slice(vt.sampleOffsets(i), vt.sampleSizes(i)).sameElements(v(i)),
        s"video sample $i mis-sliced")
    for (i <- a.indices)
      assert(slice(at.sampleOffsets(i), at.sampleSizes(i)).sameElements(a(i)),
        s"audio sample $i mis-sliced")
    // the misparse regression: contiguous reading from the first chunk
    // would give v(1) the bytes at v(0).length (= a(0)) — prove the
    // resolved offset differs from the contiguous assumption
    assert(vt.sampleOffsets(1) != vt.sampleOffsets(0) + vt.sampleSizes(0),
      "second video chunk should not be contiguous in this fixture")
    // STRICT rejects: a chunk left half-used (stsc says 3 samples in
    // the audio track's first chunk but stsz only has 3 total with 1
    // in the last chunk -> samples run out mid-chunk)
    val badTracks = tracks.updated(1,
      tracks(1).copy(chunkSampleCounts = Array(3, 1)))
    intercept[IllegalArgumentException](Mp4.encodeMp4Multi(1000L, 5L, badTracks, mdat))
    // craft the same desync at the BITSTREAM level: reuse the good file
    // and corrupt the audio stsc's samples_per_chunk from 2 to 3
    val idx = {
      // the second stsc box in the file belongs to the audio track
      var p = -1; var found = 0
      var i = 0
      while (i < file.length - 4 && p < 0) {
        if (file(i) == 's' && file(i + 1) == 't' && file(i + 2) == 's' && file(i + 3) == 'c') {
          found += 1
          if (found == 2) p = i
        }
        i += 1
      }
      p
    }
    assert(idx > 0, "audio stsc not found")
    val bad = file.clone()
    bad(idx + 4 + 4 + 4 + 4 + 3) = 3 // entry 1 samples_per_chunk LSB: 2 -> 3
    assert(Mp4.parseMp4(bad).isEmpty, "half-used chunk accepted")
    // multi-chunk stco WITHOUT stsc is ambiguous -> reject: excise the
    // audio stsc box by renaming it to a skippable unknown type
    val noStsc = file.clone()
    noStsc(idx) = 'f'.toByte; noStsc(idx + 1) = 'r'.toByte
    noStsc(idx + 2) = 'e'.toByte; noStsc(idx + 3) = 'e'.toByte
    assert(Mp4.parseMp4(noStsc).isEmpty, "multi-chunk without stsc accepted")
    // a chunk offset outside mdat rejects (validated per sample now)
    val farTracks = tracks.updated(0,
      tracks(0).copy(chunkMdatOffsets = Array(0L, mdat.length.toLong)))
    assert(Mp4.parseMp4(Mp4.encodeMp4Multi(1000L, 5L, farTracks, mdat)).isEmpty,
      "sample past mdat accepted")
    // single-chunk legacy files (no stsc needed) still parse: the
    // encodeMp4 path writes a one-run stsc and one-entry stco
    val legacy = Mp4.encodeMp4(8, 8, 1000L, 2L, 2, 8,
      Array.tabulate(16)(_.toByte))
    val lm = Mp4.parseMp4(legacy).get
    assert(lm.tracks.head.sampleOffsets.length == 2)
    assert(lm.tracks.head.sampleOffsets(1) ==
      lm.tracks.head.sampleOffsets(0) + 8)
    // co64 (64-bit chunk offsets — what large real files carry): the
    // same interleaved fixture resolves to IDENTICAL sample offsets
    val file64 = Mp4.encodeMp4Multi(1000L, 5L, tracks, mdat, useCo64 = true)
    val m64 = Mp4.parseMp4(file64).getOrElse(fail("co64 file must parse"))
    val vt64 = m64.tracks.find(_.kind == "vide").get
    for (i <- v.indices) {
      val s = (vt64.sampleOffsets(i) - m64.mdatFileOffset).toInt
      assert(java.util.Arrays.copyOfRange(m64.mdat, s, s + vt64.sampleSizes(i))
        .sameElements(v(i)), s"co64 video sample $i")
    }
    // a truncated co64 table rejects; BOTH stco and co64 present rejects
    val c64idx = {
      var p = -1; var i = 0
      while (i < file64.length - 4 && p < 0) {
        if (file64(i) == 'c' && file64(i + 1) == 'o' && file64(i + 2) == '6' &&
          file64(i + 3) == '4') p = i
        i += 1
      }
      p
    }
    assert(c64idx > 0)
    val shortC = file64.clone()
    shortC(c64idx + 4 + 4 + 3) = 9 // entry_count 2 -> 9: table overruns its box
    assert(Mp4.parseMp4(shortC).isEmpty, "overrunning co64 accepted")
  }

  test("mp4 stss: sync-sample table parses, absent = all-sync, keyframe decode skips non-sync; malformed tables reject (round 17)") {
    import graft.multimodal.{Mp4, H264, H264Mp4, H264Cavlc, H264Cabac}
    // --- parse + isSync semantics on a 4-sample file, sync = {1, 3} ---
    val payload = Array.tabulate(4 * 8)(i => (i + 1).toByte)
    def mk(sync: Option[Array[Int]]) =
      Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload, syncSamples = sync)
    val t = Mp4.parseMp4(mk(Some(Array(1, 3)))).get.tracks.head
    assert(t.syncSamples.exists(_.sameElements(Array(1, 3))))
    assert(t.isSync(0) && !t.isSync(1) && t.isSync(2) && !t.isSync(3))
    // absent stss: every sample is sync (§8.6.2)
    val tAll = Mp4.parseMp4(mk(None)).get.tracks.head
    assert(tAll.syncSamples.isEmpty && (0 until 4).forall(tAll.isSync))
    // an EMPTY stss is valid and means NO sync samples
    val tNone = Mp4.parseMp4(mk(Some(Array.empty[Int]))).get.tracks.head
    assert(tNone.syncSamples.exists(_.isEmpty) && (0 until 4).forall(i => !tNone.isSync(i)))
    // --- strict rejects ---
    assert(Mp4.parseMp4(mk(Some(Array(0, 2)))).isEmpty, "sample number 0 accepted")
    assert(Mp4.parseMp4(mk(Some(Array(3, 2)))).isEmpty, "non-increasing accepted")
    assert(Mp4.parseMp4(mk(Some(Array(2, 2)))).isEmpty, "duplicate entry accepted")
    assert(Mp4.parseMp4(mk(Some(Array(1, 5)))).isEmpty, "entry past sample count accepted")
    // ---- stts decode timestamps (round 17) ----
    val timed = Mp4.parseMp4(Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      syncSamples = Some(Array(1, 3)),
      sampleDeltas = Some(Array(3L, 3L, 5L, 2L)))).get.tracks.head
    assert(timed.sampleDts.sameElements(Array(0L, 3L, 6L, 11L)),
      s"dts ${timed.sampleDts.mkString(",")}")
    assert(mk(None) != null &&
      Mp4.parseMp4(mk(None)).get.tracks.head.sampleDts.isEmpty,
      "absent stts must leave sampleDts empty")
    // stts that does not tile the sample count rejects
    val badTime = Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      sampleDeltas = Some(Array(3L, 3L, 5L, 2L)))
    var tp = -1; var ti = 0
    while (ti < badTime.length - 4 && tp < 0) {
      if (badTime(ti) == 's' && badTime(ti + 1) == 't' && badTime(ti + 2) == 't'
        && badTime(ti + 3) == 's') tp = ti
      ti += 1
    }
    assert(tp > 0, "stts not found")
    // first run count 2 -> 3: run totals 5 != 4 samples
    val overTiled = badTime.clone(); overTiled(tp + 4 + 4 + 4 + 3) = 3
    assert(Mp4.parseMp4(overTiled).isEmpty, "non-tiling stts accepted")
    // ---- ctts composition offsets (round 17) ----
    // negative offsets -> version 1 (signed); PTS = DTS + offset
    val cttsT = Mp4.parseMp4(Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      sampleDeltas = Some(Array(3L, 3L, 5L, 2L)),
      ctsOffsets = Some(Array(2L, -1L, -1L, 0L)))).get.tracks.head
    assert(cttsT.samplePts.sameElements(Array(2L, 2L, 5L, 11L)),
      s"pts ${cttsT.samplePts.mkString(",")}")
    // all-nonnegative offsets -> version 0 (unsigned) round-trips too
    val cttsV0 = Mp4.parseMp4(Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      sampleDeltas = Some(Array(3L, 3L, 5L, 2L)),
      ctsOffsets = Some(Array(0L, 4L, 4L, 1L)))).get.tracks.head
    assert(cttsV0.samplePts.sameElements(Array(0L, 7L, 10L, 12L)),
      s"v0 pts ${cttsV0.samplePts.mkString(",")}")
    assert(timed.samplePts.isEmpty, "absent ctts must leave samplePts empty")
    // ctts without stts: no DTS basis -> reject. Craft it by swapping
    // the stts box type to a skipped unknown type in a valid file.
    val noBasis = Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      sampleDeltas = Some(Array(3L, 3L, 5L, 2L)),
      ctsOffsets = Some(Array(1L, 1L, 1L, 1L)))
    var bp = -1; var bi = 0
    while (bi < noBasis.length - 4 && bp < 0) {
      if (noBasis(bi) == 's' && noBasis(bi + 1) == 't' && noBasis(bi + 2) == 't'
        && noBasis(bi + 3) == 's') bp = bi
      bi += 1
    }
    assert(bp > 0, "stts not found")
    noBasis(bp) = 'x'
    assert(Mp4.parseMp4(noBasis).isEmpty, "ctts without stts accepted")
    // a ctts run that does not tile the sample count rejects: find the
    // single-run-compressed table (offsets all equal -> one run of 4)
    // and shrink its count
    val cttsBad = Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      sampleDeltas = Some(Array(3L, 3L, 5L, 2L)),
      ctsOffsets = Some(Array(1L, 1L, 1L, 1L)))
    var cp = -1; var ci = 0
    while (ci < cttsBad.length - 4 && cp < 0) {
      if (cttsBad(ci) == 'c' && cttsBad(ci + 1) == 't' && cttsBad(ci + 2) == 't'
        && cttsBad(ci + 3) == 's') cp = ci
      ci += 1
    }
    assert(cp > 0, "ctts not found")
    cttsBad(cp + 4 + 4 + 4 + 3) = 3 // run count 4 -> 3: totals 3 != 4
    assert(Mp4.parseMp4(cttsBad).isEmpty, "non-tiling ctts accepted")
    // ctts version >= 2 rejects
    val cttsVer = cttsBad.clone(); cttsVer(cp + 4 + 4 + 4 + 3) = 4 // restore count
    cttsVer(cp + 4) = 2
    assert(Mp4.parseMp4(cttsVer).isEmpty, "ctts version 2 accepted")
    // ---- elst edit lists (round 17): empty-edit delay + normal edit ----
    val edited = Mp4.parseMp4(Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      edits = Some(Seq((40L, -1L), (300L, 100L))))).get.tracks.head
    assert(edited.editDelay == 40 && edited.editMediaTime == 100 &&
      edited.editDuration == 300, "empty+normal edit mis-resolved")
    val edited2 = Mp4.parseMp4(Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      edits = Some(Seq((300L, 100L))))).get.tracks.head
    assert(edited2.editDelay == 0 && edited2.editMediaTime == 100 &&
      edited2.editDuration == 300, "normal-only edit mis-resolved")
    assert(timed.editMediaTime == -1 && timed.editDelay == 0,
      "absent elst must leave the defaults")
    // out-of-scope shapes reject by name
    assert(Mp4.parseMp4(Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      edits = Some(Seq((100L, 0L), (100L, 1024L))))).isEmpty,
      "multi-segment edit list accepted")
    assert(Mp4.parseMp4(Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      edits = Some(Seq((10L, -1L), (10L, -1L), (300L, 0L))))).isEmpty,
      "two empty edits accepted")
    assert(Mp4.parseMp4(Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      edits = Some(Seq((10L, -1L))))).isEmpty, "delay-only edit list accepted")
    assert(Mp4.parseMp4(Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      edits = Some(Seq((10L, -5L))))).isEmpty,
      "negative media_time (not -1) accepted")
    // dwell (rate 0) rejects: clear the 1.0 in the entry's media_rate
    val dwell = Mp4.encodeMp4(16, 16, 1000L, 4L, 4, 8, payload,
      edits = Some(Seq((300L, 100L))))
    var ep = -1; var ei = 0
    while (ei < dwell.length - 4 && ep < 0) {
      if (dwell(ei) == 'e' && dwell(ei + 1) == 'l' && dwell(ei + 2) == 's'
        && dwell(ei + 3) == 't') ep = ei
      ei += 1
    }
    assert(ep > 0, "elst not found")
    val dwell2 = dwell.clone(); dwell2(ep + 4 + 8 + 8 + 1) = 0 // rate 1.0 -> 0
    assert(Mp4.parseMp4(dwell2).isEmpty, "dwell edit accepted")
    // elst version >= 2 rejects
    val evBad = dwell.clone(); evBad(ep + 4) = 2
    assert(Mp4.parseMp4(evBad).isEmpty, "elst version 2 accepted")
    // entry_count overrunning the box
    val good = mk(Some(Array(1, 3)))
    var sp = -1; var i = 0
    while (i < good.length - 4 && sp < 0) {
      if (good(i) == 's' && good(i + 1) == 't' && good(i + 2) == 's' && good(i + 3) == 's') sp = i
      i += 1
    }
    assert(sp > 0, "stss not found")
    val overrun = good.clone(); overrun(sp + 4 + 4 + 3) = 9 // count 2 -> 9
    assert(Mp4.parseMp4(overrun).isEmpty, "overrunning stss accepted")
    // duplicate stss BOX: wrap a second copy is awkward — corrupt version
    val badVer = good.clone(); badVer(sp + 4) = 1
    assert(Mp4.parseMp4(badVer).isEmpty, "stss version 1 accepted")

    // --- keyframe decode path: only sync samples decode ---
    val (spsB, ppsB) = (H264.encodeSps(66, 30, spsId = 0,
      log2MaxFrameNumMinus4 = 0, poc = 0, maxRef = 1, pwMbsMinus1 = 1,
      phMapMinus1 = 1, frameMbsOnly = true, crop = None),
      H264.encodePps(ppsId = 0, spsId = 0, cabac = false, picInitQp = 26))
    val sps = H264.parseSps(spsB).get; val pps = H264.parsePps(ppsB).get
    val mbs = Seq.fill(4)(H264Cavlc.I16MbSpec(2, 0, 0,
      new Array[Int](16), Array.fill(16)(new Array[Int](15))))
    val rbsp = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0,
      mbs, H264Cavlc.fixtureTables)
    val cfg = H264Mp4.parseAvcc(H264Mp4.encodeStsdAvc1(32, 32,
      H264Mp4.encodeAvcc(66, 30, 4, Seq(H264Mp4.nalUnit(3, 7, spsB)),
        Seq(H264Mp4.nalUnit(3, 8, ppsB))))).get
    val iSample = H264Mp4.sampleOf(4, Seq(H264Mp4.nalUnit(3, 5, rbsp)))
    // a P slice (slice_type 0): the intra parsers strict-reject it
    val pSample = H264Mp4.sampleOf(4,
      Seq(H264Mp4.nalUnit(2, 1, Array[Byte](0xC0.toByte, 0x00))))
    assert(H264Mp4.decodeSamplePicture(pSample, cfg, sps, pps,
      H264Cavlc.fixtureTables, H264Cabac.fixtureTables).isEmpty,
      "P slice decoded by the intra path")
    assert(H264Mp4.decodeSamplePicture(iSample, cfg, sps, pps,
      H264Cavlc.fixtureTables, H264Cabac.fixtureTables).nonEmpty)
    // per-track sync filter is what makes the mixed file usable:
    // samples [I P I P], stss {1, 3} -> keyframe walk decodes 0 and 2
    val mixed = Seq(iSample, pSample, iSample, pSample)
    val file = Mp4.encodeMp4(32, 32, 1000L, 4L, 4, 0,
      mixed.flatten.toArray, stsd = H264Mp4.encodeStsdAvc1(32, 32,
        H264Mp4.encodeAvcc(66, 30, 4, Seq(H264Mp4.nalUnit(3, 7, spsB)),
          Seq(H264Mp4.nalUnit(3, 8, ppsB)))),
      perSampleSizes = Some(mixed.map(_.length).toArray),
      syncSamples = Some(Array(1, 3)))
    val movie = Mp4.parseMp4(file).get
    val vt = movie.tracks.head
    val decoded = vt.sampleSizes.indices.filter(vt.isSync).map { sIdx =>
      val off = (vt.sampleOffsets(sIdx) - movie.mdatFileOffset).toInt
      val s = java.util.Arrays.copyOfRange(movie.mdat, off, off + vt.sampleSizes(sIdx))
      sIdx -> H264Mp4.decodeSamplePicture(s, cfg, sps, pps,
        H264Cavlc.fixtureTables, H264Cabac.fixtureTables)
    }
    assert(decoded.map(_._1) == Seq(0, 2))
    assert(decoded.forall(_._2.nonEmpty), "sync samples must decode")
    // decode-everything on the same file fails on sample 1 — the
    // all-or-nothing shape stss rescues
    assert(vt.sampleSizes.indices.exists { sIdx =>
      val off = (vt.sampleOffsets(sIdx) - movie.mdatFileOffset).toInt
      val s = java.util.Arrays.copyOfRange(movie.mdat, off, off + vt.sampleSizes(sIdx))
      H264Mp4.decodeSamplePicture(s, cfg, sps, pps,
        H264Cavlc.fixtureTables, H264Cabac.fixtureTables).isEmpty
    }, "the mixed file should NOT be fully decodable")
  }

  test("h264 intra_8x8: DC-only known answers both qp branches, all nine modes round-trip, mixed 4x4/8x8 predictor, flag-0 still 4x4 (round 17)") {
    import graft.multimodal.{H264, H264Cavlc}
    val spsB = H264.encodeSps(100, 40, spsId = 0, log2MaxFrameNumMinus4 = 0,
      poc = 0, maxRef = 1, pwMbsMinus1 = 1, phMapMinus1 = 1,
      frameMbsOnly = true, crop = None)
    val sps = H264.parseSps(spsB).get
    val pps = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      picInitQp = 26, transform8x8 = true)).get
    assert(pps.transform8x8)
    def decode(mbs: Seq[H264Cavlc.IMbSpec], qpDelta0: Int = 0) = {
      val rbsp = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true,
        0, 0, 0, qpDelta0, mbs, H264Cavlc.fixtureTables)
      H264Cavlc.parseI16x16Slice(rbsp, sps, pps, 3, 5, H264Cavlc.fixtureTables)
    }
    // ---- flat: all-DC 8x8 MBs, zero residual -> uniform 128 ----
    val dcMb = H264Cavlc.I8x8MbSpec(Array(2, 2, 2, 2), 0, 0,
      Array.fill(4)(new Array[Int](64)))
    val flat = decode(Seq.fill(4)(dcMb)).get
    assert(flat.luma.forall(_ == 128) && flat.mbs.forall(_.isI8x8))
    // ---- DC-impulse known answer, BOTH §8.5.13.1 qp branches ----
    for (qp <- Seq(20, 40)) { // 20: rounding branch; 40: shift branch
      val c = 3
      val scan = new Array[Int](64); scan(0) = c
      val one = H264Cavlc.I8x8MbSpec(Array(2, 2, 2, 2), 0, qp - 26,
        Array(scan, new Array[Int](64), new Array[Int](64), new Array[Int](64)))
      val pic = decode(Seq(one, dcMb, dcMb, dcMb)).get
      // LevelScale8x8 = 16 (flat weightScale) x normAdjust8x8 row col 0
      // (round-17 fix: the x16 does not cancel against the 8x8 shifts)
      val v = Seq(20, 22, 26, 28, 32, 36)(qp % 6)
      val d0 = if (qp >= 36) (c * 16 * v) << (qp / 6 - 6)
               else (c * 16 * v + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      val res = (d0 + 32) >> 6
      val want = math.max(0, math.min(255, 128 + res))
      // block 0 of mb0 is the impulse; its 8x8 is uniform `want`
      for (y <- 0 until 8; x <- 0 until 8)
        assert(pic.luma(y * 32 + x) == want, s"qp $qp at ($x,$y)")
      // block 1 (same MB, right) predicted from block 0's right edge
      assert(pic.luma(0 * 32 + 8) != 0)
    }
    // ---- all nine modes with availability-legal placement ----
    def mode8(m: Int, b: Int): Int = {
      val bx = b % 2; val by = b / 2
      if (m == 1 && by == 0) Seq(1, 2, 8)((m + b) % 3)
      else if (m == 2 && bx == 0) Seq(0, 2, 3, 7)((m + b) % 4)
      else if (m == 3) Seq(4, 7, 6, 5)(b) // the corner-needing quartet
      else (m + 3 * b) % 9
    }
    val varied = (1 to 3).map { m =>
      H264Cavlc.I8x8MbSpec(Array.tabulate(4)(mode8(m, _)), 0, ((m * 7) % 5) - 2,
        Array.tabulate(4, 64)((b, p) =>
          if ((m + b + p) % 9 == 0) ((m * (p + 2) + b) % 5) - 2 else 0)
          .map(_.toArray),
        forceCbpLuma = Some(15))
    }
    val mixed = decode(dcMb +: varied).get
    assert(mixed.mbs.length == 4 && mixed.mbs.forall(_.isI8x8))
    // every mode 0..8 appears across the picture
    val used = mixed.mbs.flatMap(_.modes8x8).toSet
    assert((0 to 8).forall(used.contains), s"modes used: $used")
    // deterministic round-trip: re-encode the same specs -> same pixels
    val again = decode(dcMb +: varied).get
    assert(again.luma.sameElements(mixed.luma))
    // ---- mixed 4x4/8x8: an I4x4 MB after an 8x8 one reads the 8x8's
    // mode through the covering cells (and vice versa) ----
    val i4 = H264Cavlc.I4x4MbSpec(
      Array.tabulate(16)(i => if (i % 4 == 0) 2 else (i % 3)), 0, 0,
      Array.fill(16)(new Array[Int](16)))
    val mix2 = decode(Seq(dcMb, i4,
      H264Cavlc.I8x8MbSpec(Array(2, 2, 2, 2), 2, 0, Array.fill(4)(new Array[Int](64))),
      i4)).get
    assert(mix2.mbs(1).isI4x4 && mix2.mbs(2).isI8x8)
    // ---- flag 0 under a transform8x8 PPS still decodes Intra_4x4 ----
    val i4dc = H264Cavlc.I4x4MbSpec(Array.fill(16)(2), 0, 0,
      Array.fill(16)(new Array[Int](16)))
    val only4 = decode(Seq(i4dc, i4, i4dc, i4)).get
    assert(only4.mbs.forall(_.isI4x4))
    // ---- availability reject: vertical on the top row is nonconforming ----
    val badMode = H264Cavlc.I8x8MbSpec(Array(0, 2, 2, 2), 0, 0,
      Array.fill(4)(new Array[Int](64)))
    assert(decode(Seq(badMode, dcMb, dcMb, dcMb)).isEmpty,
      "mode 0 without a top row accepted")
    // ---- the 8x8 zig-zag is the canonical diagonal walk ----
    val zz = H264Cavlc.zigZag8x8
    assert(zz.length == 64 && zz.distinct.length == 64 && zz(0) == 0 &&
      zz(1) == 1 && zz(2) == 8 && zz(3) == 16 && zz(4) == 9 && zz(63) == 63)
  }

  test("mp4 fragmented: moof/tfhd/trun resolve per-fragment samples; sync flags become stss-equivalent; desyncs and out-of-scope shapes reject (round 17)") {
    import graft.multimodal.Mp4
    val v = Seq(Array.tabulate(40)(i => (i + 1).toByte),
      Array.tabulate(56)(i => (i + 101).toByte))
    val a = Seq(Array.tabulate(24)(i => (i + 61).toByte),
      Array.tabulate(16)(i => (i + 86).toByte))
    val tracks = Seq(Mp4.FragTrack(1, "vide", 16, 16, Array.empty),
      Mp4.FragTrack(2, "soun", 0, 0, Array.empty))
    def frag(syncV: Array[Boolean]) = (0 until 2).map { f =>
      (Seq(Mp4.FragRun(1, Array(v(f).length), Array(syncV(f))),
        Mp4.FragRun(2, Array(a(f).length), Array(true))),
        (v(f) ++ a(f)).toArray)
    }
    val file = Mp4.encodeMp4Frag(1000L, 2L, tracks, frag(Array(true, false)))
    val m = Mp4.parseMp4(file).getOrElse(fail("fragmented file must parse"))
    assert(m.mdatFileOffset == 0 && (m.mdat eq null) == false)
    val vt = m.tracks.find(_.kind == "vide").get
    val at = m.tracks.find(_.kind == "soun").get
    def slice(t: Mp4.Track, i: Int): Array[Byte] = {
      val s = (t.sampleOffsets(i) - m.mdatFileOffset).toInt
      java.util.Arrays.copyOfRange(m.mdat, s, s + t.sampleSizes(i))
    }
    for (i <- 0 until 2) {
      assert(slice(vt, i).sameElements(v(i)), s"video sample $i mis-sliced")
      assert(slice(at, i).sameElements(a(i)), s"audio sample $i mis-sliced")
    }
    // sync flags -> explicit stss-equivalent: video sample 2 non-sync
    assert(vt.syncSamples.exists(_.sameElements(Array(1))))
    assert(vt.isSync(0) && !vt.isSync(1))
    assert(at.syncSamples.exists(_.sameElements(Array(1, 2))))
    // ---- strict rejects, byte-level where the encoder can't express ----
    def findNth(b: Array[Byte], t: String, nth: Int): Int = {
      var found = 0; var i = 0
      while (i < b.length - 4) {
        if (b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)) {
          found += 1
          if (found == nth) return i
        }
        i += 1
      }
      -1
    }
    // second mfhd sequence number not increasing
    val mf2 = findNth(file, "mfhd", 2); assert(mf2 > 0)
    val badSeq = file.clone(); badSeq(mf2 + 4 + 4 + 3) = 1 // seq 2 -> 1
    assert(Mp4.parseMp4(badSeq).isEmpty, "non-increasing mfhd accepted")
    // tfhd without any base form (clear default-base-is-moof)
    val tf1 = findNth(file, "tfhd", 1); assert(tf1 > 0)
    val noBase = file.clone(); noBase(tf1 + 4 + 1) = 0 // flags 0x020000 -> 0
    assert(Mp4.parseMp4(noBase).isEmpty, "implicit base chaining accepted")
    // trun data_offset pushed past the fragment's mdat
    val tr1 = findNth(file, "trun", 1); assert(tr1 > 0)
    val farOff = file.clone()
    farOff(tr1 + 4 + 4 + 4 + 2) = 0x7f.toByte // data_offset huge
    assert(Mp4.parseMp4(farOff).isEmpty, "sample outside every mdat accepted")
    // init-segment sample tables must stay consistent: a corrupted
    // stsz count (1 sample claimed, no entry table, no chunks) rejects
    val stz = findNth(file, "stsz", 1); assert(stz > 0)
    val withSamples = file.clone(); withSamples(stz + 4 + 4 + 4 + 3) = 1
    assert(Mp4.parseMp4(withSamples).isEmpty,
      "desynced init stsz accepted")
    // unknown track id in tfhd
    val badTid = file.clone(); badTid(tf1 + 4 + 4 + 3) = 9 // track 1 -> 9
    assert(Mp4.parseMp4(badTid).isEmpty, "traf for unknown track accepted")
    // trex removed (rename to free): fragmented track REQUIRES trex
    val tx1 = findNth(file, "trex", 1); assert(tx1 > 0)
    val noTrex = file.clone()
    noTrex(tx1) = 'f'; noTrex(tx1 + 1) = 'r'; noTrex(tx1 + 2) = 'e'; noTrex(tx1 + 3) = 'e'
    assert(Mp4.parseMp4(noTrex).isEmpty, "traf without trex accepted")
    // trun trailing bytes (count 1 -> 0 leaves the sample entry dangling)
    val shortTrun = file.clone(); shortTrun(tr1 + 4 + 4 + 3) = 0
    assert(Mp4.parseMp4(shortTrun).isEmpty, "non-tiling trun accepted")
    // encoder-level: duplicate traf per track in one moof refuses
    intercept[IllegalArgumentException](Mp4.encodeMp4Frag(1000L, 2L, tracks,
      Seq((Seq(Mp4.FragRun(1, Array(4), Array(true)),
        Mp4.FragRun(1, Array(4), Array(true))), new Array[Byte](8)))))
    // keyframe filter composes: the video track's only sync sample is 0
    assert(vt.sampleSizes.indices.filter(vt.isSync) == Seq(0))
    // ---- fragmented timestamps (round 17): tfdt anchor, continuation,
    // trun durations + signed cts, trex default-duration fallback ----
    val timedFrags = (0 until 2).map { f =>
      (Seq(Mp4.FragRun(1, Array(v(f).length), Array(true),
        durations = Array(10L + f), cts = Array(2L * f - 1),
        tfdt = if (f == 0) Some(5L) else None),
        Mp4.FragRun(2, Array(a(f).length), Array(true))),
        (v(f) ++ a(f)).toArray)
    }
    val timedFile = Mp4.encodeMp4Frag(1000L, 2L, tracks, timedFrags)
    val tm = Mp4.parseMp4(timedFile).getOrElse(fail("timed fragmented file must parse"))
    val tv = tm.tracks.find(_.kind == "vide").get
    val ta = tm.tracks.find(_.kind == "soun").get
    // frag 0: dts = tfdt 5; frag 1: no tfdt -> continues at 5 + 10
    assert(tv.sampleDts.sameElements(Array(5L, 15L)), s"dts ${tv.sampleDts.mkString(",")}")
    // pts = dts + cts: 5 + (-1), 15 + (+1)
    assert(tv.samplePts.sameElements(Array(4L, 16L)), s"pts ${tv.samplePts.mkString(",")}")
    // audio: no trun durations, no tfdt -> trex default duration 0
    assert(ta.sampleDts.sameElements(Array(0L, 0L)) &&
      ta.samplePts.sameElements(Array(0L, 0L)))
    // the untimed file still resolves DTS (all zero) — fragmented
    // durations are always defined, unlike the optional stts
    assert(vt.sampleDts.sameElements(Array(0L, 0L)))
    // trun version 0 reads the SAME cts bytes unsigned (0xFFFFFFFF)
    val trT = findNth(timedFile, "trun", 1); assert(trT > 0)
    val v0cts = timedFile.clone(); v0cts(trT + 4) = 0
    val v0parsed = Mp4.parseMp4(v0cts).getOrElse(fail("v0-cts file must parse"))
    assert(v0parsed.tracks.find(_.kind == "vide").get.samplePts(0) == 5L + 0xffffffffL,
      "v0 cts must read unsigned")
    // tfdt AFTER the traf's trun rejects (it would retroactively move
    // already-stamped samples): swap the tfdt and trun boxes in place
    val td = findNth(timedFile, "tfdt", 1); assert(td > 0)
    val tfdtStart = td - 4 // box size precedes the type
    val tfdtBox = java.util.Arrays.copyOfRange(timedFile, tfdtStart, tfdtStart + 16)
    val trunStart = tfdtStart + 16
    assert(new String(timedFile, trunStart + 4, 4, "US-ASCII") == "trun")
    val trunSize = ((timedFile(trunStart) & 0xff) << 24) |
      ((timedFile(trunStart + 1) & 0xff) << 16) |
      ((timedFile(trunStart + 2) & 0xff) << 8) | (timedFile(trunStart + 3) & 0xff)
    val lateTfdt = timedFile.clone()
    System.arraycopy(timedFile, trunStart, lateTfdt, tfdtStart, trunSize)
    System.arraycopy(tfdtBox, 0, lateTfdt, tfdtStart + trunSize, 16)
    assert(Mp4.parseMp4(lateTfdt).isEmpty, "tfdt after trun accepted")
    // tfhd claiming a default-duration field it does not carry rejects
    // (the box must tile exactly)
    val tfT = findNth(timedFile, "tfhd", 1); assert(tfT > 0)
    val phantomDur = timedFile.clone(); phantomDur(tfT + 4 + 3) = 0x08
    assert(Mp4.parseMp4(phantomDur).isEmpty, "non-tiling tfhd accepted")
  }

  test("H264ValidationProbe: fixture streams align EXACT against their own decode as I420; a corrupted reference localizes the diff to its MB; rejects are named (round 17)") {
    import graft.multimodal.{H264, H264Cavlc, H264Cabac}
    import graft.tools.H264ValidationProbe
    // a 2x2-MB CAVLC picture with crop (l=1, r=0, t=1, b=0) -> 30x30
    val spsB = H264.encodeSps(66, 30, spsId = 0, log2MaxFrameNumMinus4 = 0,
      poc = 0, maxRef = 1, pwMbsMinus1 = 1, phMapMinus1 = 1,
      frameMbsOnly = true, crop = Some((1, 0, 1, 0)))
    val ppsB = H264.encodePps(ppsId = 0, spsId = 0, cabac = false, picInitQp = 26)
    val sps = H264.parseSps(spsB).get; val pps = H264.parsePps(ppsB).get
    assert(sps.width == 30 && sps.height == 30)
    val mbs = (0 until 4).map { m =>
      H264Cavlc.I16MbSpec(2, 0, if (m == 0) 2 else 0,
        Array.tabulate(16)(i => if ((i + m) % 5 == 0) 1 - (i % 3) else 0),
        Array.fill(16)(new Array[Int](15)))
    }
    val rbsp = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0,
      mbs, H264Cavlc.fixtureTables)
    val stream = H264.annexB(Seq((3, 7, spsB), (3, 8, ppsB), (3, 5, rbsp)))
    val (gotSps, pics) = H264ValidationProbe.decodePictures(stream,
      H264Cavlc.fixtureTables, H264Cabac.fixtureTables)
    assert(gotSps == sps && pics.length == 1 && pics.head.isRight)
    val pic = pics.head.toOption.get
    // reference I420 frame from the decode itself, at cropped geometry
    val w = sps.width; val h = sps.height; val stride = 16 * pic.widthMbs
    val ref = new Array[Byte](w * h + 2 * (w / 2) * (h / 2))
    for (y <- 0 until h; x <- 0 until w)
      ref(y * w + x) = pic.luma((y + 2 * sps.cropTop) * stride + x + 2 * sps.cropLeft).toByte
    for (y <- 0 until h / 2; x <- 0 until w / 2) {
      ref(w * h + y * (w / 2) + x) =
        pic.cb((y + sps.cropTop) * (stride / 2) + x + sps.cropLeft).toByte
      ref(w * h + (w / 2) * (h / 2) + y * (w / 2) + x) =
        pic.cr((y + sps.cropTop) * (stride / 2) + x + sps.cropLeft).toByte
    }
    val rep = H264ValidationProbe.compareFrame(0, pic, sps, ref, 0)
    assert(rep.firstDiff.isEmpty && rep.nExact == rep.nPx, s"not exact: $rep")
    // corrupt one luma pixel inside MB (1,1): x=20,y=20 cropped ->
    // uncropped (22,20) -> mb (1,1) = #3
    val bad = ref.clone(); bad(20 * w + 20) = (bad(20 * w + 20) + 7).toByte
    val rep2 = H264ValidationProbe.compareFrame(0, pic, sps, bad, 0)
    val d = rep2.firstDiff.getOrElse(fail("diff not detected"))
    assert(d.plane == "Y" && d.x == 20 && d.y == 20 && d.mbx == 1 && d.mby == 1
      && d.mb == 3, s"bad localization: $d")
    assert(rep2.nExact == rep2.nPx - 1)
    // CABAC twin decodes through the same probe path
    val ppsC = H264.encodePps(ppsId = 0, spsId = 0, cabac = true, picInitQp = 26)
    val rbspC = H264Cabac.encodeISlice(sps, H264.parsePps(ppsC).get, 3,
      idr = true, 0, 0, 0, 0, mbs, H264Cabac.fixtureTables)
    val streamC = H264.annexB(Seq((3, 7, spsB), (3, 8, ppsC), (3, 5, rbspC)))
    val (_, picsC) = H264ValidationProbe.decodePictures(streamC,
      H264Cavlc.fixtureTables, H264Cabac.fixtureTables)
    assert(picsC.length == 1 && picsC.head.isRight)
    assert(picsC.head.toOption.get.luma.sameElements(pic.luma),
      "cross-coder pixels must agree through the probe path")
    // a P slice in the stream reports Left (named reject), not a crash
    val streamP = H264.annexB(Seq((3, 7, spsB), (3, 8, ppsB),
      (2, 1, Array[Byte](0xC8.toByte))))
    val (_, picsP) = H264ValidationProbe.decodePictures(streamP,
      H264Cavlc.fixtureTables, H264Cabac.fixtureTables)
    assert(picsP.length == 1 && picsP.head.isLeft)
    assert(picsP.head.swap.toOption.get.contains("strict-reject"))
  }

  test("h264 chroma: QP mapping, 2x2 Hadamard DC scaling, flat-128 and DC-impulse known answers (round 15)") {
    import graft.multimodal.{H264, H264Cavlc}
    // QP mapping: identity below 30, table above, clamped input
    assert(H264Cavlc.chromaQp(24, 0) == 24)
    assert(H264Cavlc.chromaQp(29, 0) == 29)
    assert(H264Cavlc.chromaQp(30, 0) == 29)
    assert(H264Cavlc.chromaQp(51, 0) == 39)
    assert(H264Cavlc.chromaQp(40, 6) == H264Cavlc.chromaQp(46, 0))
    assert(H264Cavlc.chromaQp(0, -12) == 0)
    // 2x2 DC: impulse at c00, qp 24 -> Hadamard all-1 -> ((160)<<4)>>5 = 80
    assert(H264Cavlc.chromaDcTransform(Array(1, 0, 0, 0), 24).forall(_ == 80))
    // chroma_qp_index_offset round-trips through the PPS
    val pps3 = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      chromaQpOffset = 3)).get
    assert(pps3.chromaQpOffset == 3)
    val (sps, pps) = i16SpsPps(1, 1, qp = 24)
    val t = H264Cavlc.fixtureTables
    def mb(dc0: Int, cbDc: Array[Int]) = H264Cavlc.I16MbSpec(2, 0, 0,
      Array.tabulate(16)(k => if (k == 0) dc0 else 0),
      Array.fill(16)(new Array[Int](15)),
      chromaDc = Array(cbDc, new Array[Int](4)),
      chromaAc = Array.fill(2, 4)(new Array[Int](15)))
    // all-zero: luma 128, chroma DC-pred 128 on both planes
    val flat = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0,
      Seq(mb(0, new Array[Int](4))), t)
    val p = H264Cavlc.parseI16x16Slice(flat, sps, pps, 3, 5, t).get
    assert(p.luma.forall(_ == 128) && p.cb.forall(_ == 128) && p.cr.forall(_ == 128))
    assert(p.cb.length == 64 && p.cr.length == 64)
    assert(p.mbs.head.cbpChroma == 0)
    // Cb DC impulse: residual +1 across the Cb plane only
    val lifted = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0,
      Seq(mb(0, Array(1, 0, 0, 0))), t)
    val q = H264Cavlc.parseI16x16Slice(lifted, sps, pps, 3, 5, t).get
    assert(q.mbs.head.cbpChroma == 1)
    assert(q.cb.forall(_ == 129), "Cb impulse decode is not 129")
    assert(q.cr.forall(_ == 128), "Cr plane touched")
    assert(q.luma.forall(_ == 128))
  }

  test("h264 chroma: prediction modes DC/H/V/Plane propagate across MBs; AC residual + per-component nC round-trips") {
    import graft.multimodal.H264Cavlc
    val (sps, pps) = i16SpsPps(2, 2, qp = 28)
    val t = H264Cavlc.fixtureTables
    def mbSpec(seed: Int, pred: Int, cpm: Int) = H264Cavlc.I16MbSpec(pred, cpm, 0,
      Array.tabulate(16)(k => if ((seed + k) % 4 == 0) ((seed + k) % 5) - 2 else 0),
      Array.fill(16)(new Array[Int](15)),
      chromaDc = Array.tabulate(2, 4)((c, k) =>
        if ((seed + c + k) % 3 == 0) ((seed + c + k) % 5) - 2 else 0),
      chromaAc = Array.tabulate(2, 4, 15)((c, blk, pos) =>
        if ((seed + c + blk + pos) % 7 == 0) ((seed + blk * pos + c) % 5) - 2 else 0)
        .map(_.map(_.toArray)).map(_.toArray),
      forceCbpChroma = Some(2))
    // chroma pred modes: mb0 DC (no neighbors), mb1 H (left), mb2 V (top),
    // mb3 Plane (all three)
    val mbs = Seq(mbSpec(1, 2, 0), mbSpec(2, 1, 1), mbSpec(3, 0, 2), mbSpec(4, 3, 3))
    val rbsp = H264Cavlc.encodeI16x16Slice(sps, pps, 3, idr = true, 0, 0, 0, 0, mbs, t)
    val p1 = H264Cavlc.parseI16x16Slice(rbsp, sps, pps, 3, 5, t).get
    val p2 = H264Cavlc.parseI16x16Slice(rbsp, sps, pps, 3, 5, t).get
    assert(p1.cb.sameElements(p2.cb) && p1.cr.sameElements(p2.cr))
    assert(p1.mbs.map(_.chromaPredMode) == Seq(0, 1, 2, 3))
    assert(p1.mbs.forall(_.cbpChroma == 2))
    assert(p1.cb.length == 256 && p1.cb.forall(v => v >= 0 && v <= 255))
    assert(p1.cb.distinct.length > 4 && p1.cr.distinct.length > 4,
      "chroma reconstruction suspiciously flat")
    assert(!p1.cb.sameElements(p1.cr), "components collapsed")
    // mutation fuzz through the chroma path never throws
    val rnd = new scala.util.Random(83)
    for (_ <- 0 until 200) {
      val m = rbsp.clone()
      val bit = rnd.nextInt(m.length * 8)
      m(bit >> 3) = (m(bit >> 3) ^ (1 << (7 - (bit & 7)))).toByte
      H264Cavlc.parseI16x16Slice(m, sps, pps, 3, 5, t)
    }
    // predictChroma8x8 unit vectors on a known plane
    val w = 16
    val plane = Array.tabulate(w * w)(i => (5 * (i % w) + 3 * (i / w) + 20) % 256)
    val hP = H264Cavlc.predictChroma8x8(1, plane, w, 1, 1)
    for (x <- 0 until 8; y <- 0 until 8)
      assert(hP(8 * y + x) == plane((8 + y) * w + 7), s"H ($x,$y)")
    val vP = H264Cavlc.predictChroma8x8(2, plane, w, 1, 1)
    for (x <- 0 until 8; y <- 0 until 8)
      assert(vP(8 * y + x) == plane(7 * w + 8 + x), s"V ($x,$y)")
    // DC per 4x4 sub-block: corner block (1,0) uses the TOP sum only
    val dcP = H264Cavlc.predictChroma8x8(0, plane, w, 1, 1)
    val wantTR = ((12 until 16).map(x => plane(7 * w + x)).sum + 2) >> 2
    for (x <- 4 until 8; y <- 0 until 4)
      assert(dcP(8 * y + x) == wantTR, s"DC TR ($x,$y)")
    // Plane on an exact ramp reproduces the ramp (within clip+rounding)
    val ramp = Array.tabulate(w * w)(i => 40 + 2 * (i % w) + 5 * (i / w))
    val plP = H264Cavlc.predictChroma8x8(3, ramp, w, 1, 1)
    for (x <- 0 until 8; y <- 0 until 8)
      assert(math.abs(plP(8 * y + x) - (40 + 2 * (8 + x) + 5 * (8 + y))) <= 1,
        s"Plane ($x,$y): ${plP(8 * y + x)}")
    // modes needing absent neighbors throw
    intercept[IllegalArgumentException](H264Cavlc.predictChroma8x8(1, plane, w, 0, 1))
    intercept[IllegalArgumentException](H264Cavlc.predictChroma8x8(2, plane, w, 1, 0))
    intercept[IllegalArgumentException](H264Cavlc.predictChroma8x8(3, plane, w, 0, 0))
  }

  test("h264 parseCavlcSpec: sections load and replace fixture classes; typo'd directives throw") {
    import graft.multimodal.H264Cavlc
    val spec =
      """# a user transcription of one class
        |coefftoken 0
        |1 0 0
        |011 1 1
        |010 1 0
        |0011 2 2
        |totalzeros 1
        |1 0
        |01 1
        |001 2
        |0001 3
        |00001 4
        |000001 5
        |0000001 6
        |00000001 7
        |000000001 8
        |0000000001 9
        |00000000001 10
        |000000000001 11
        |0000000000001 12
        |00000000000001 13
        |000000000000001 14
        |000000000000000 15
        |runbefore 2
        |1 0
        |01 1
        |00 2""".stripMargin
    val t = H264Cavlc.parseCavlcSpec(spec)
    assert(t.coeffToken(0)("011") == ((1, 1)))
    assert(t.totalZeros(1)("000000000000000") == 15)
    assert(t.runBefore(2)("00") == 2)
    // untouched classes fall back to the fixtures
    assert(t.coeffToken(1) == H264Cavlc.fixtureTables.coeffToken(1))
    intercept[IllegalArgumentException](
      H264Cavlc.parseCavlcSpec("coeftoken 0\n1 0 0"))
    intercept[IllegalArgumentException]( // not prefix-free
      H264Cavlc.parseCavlcSpec("runbefore 1\n0 0\n01 1"))
  }

  test("h264 scaling matrices: stream-carried lists parse with rule-A fall-backs, dequant applies per-plane weights, cross-coder parity; default-matrix forms reject (round 17)") {
    import graft.multimodal.{H264, H264Cavlc, H264Cabac}
    val wY = Array.tabulate(16)(r => 8 + (3 * (r / 4) + 5 * (r % 4)) % 17)
    val wCb = Array.tabulate(16)(r => 9 + ((r / 4) + 2 * (r % 4)) % 13)
    val wCr = Array.tabulate(16)(r => 10 + (2 * (r / 4) + (r % 4)) % 11)
    val w8 = Array.tabulate(64)(r => 6 + (2 * (r / 8) + 3 * (r % 8)) % 21)
    // ---- PPS round-trip + Table 7-2 rule-A fall-backs ----
    val pps = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      picInitQp = 26, scaling4 = Seq(wY, wCb, wCr))).get
    val sc = pps.scaling.get
    assert(sc.w4Y.sameElements(wY) && sc.w4Cb.sameElements(wCb) &&
      sc.w4Cr.sameElements(wCr) && sc.w8Y.isEmpty)
    val pps1 = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      scaling4 = Seq(wY))).get
    assert(pps1.scaling.get.w4Cb.sameElements(wY) &&
      pps1.scaling.get.w4Cr.sameElements(wY), "rule-A intra fall-back")
    val pps8 = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      picInitQp = 26, transform8x8 = true, scaling4 = Seq(wY),
      scaling8 = Some(w8))).get
    assert(pps8.scaling.get.w8Y.get.sameElements(w8) && pps8.transform8x8)
    // transform8x8 + scaling WITHOUT the 8x8 list → the fall-back is
    // the DEFAULT 8x8 matrix (Table 7-4 constants) → reject
    assert(H264.parsePps(H264.encodePps(0, 0, cabac = false,
      transform8x8 = true, scaling4 = Seq(wY))).isEmpty,
      "default 8x8 matrix fall-back accepted")
    // use_default_scaling_matrix escape (first delta drives nextScale
    // to 0) and the absent-list-0 default fall-back: hand-built PPSes
    class W { // minimal local RBSP writer
      val bits = scala.collection.mutable.ArrayBuffer.empty[Boolean]
      def u(v: Int, n: Int): Unit =
        (n - 1 to 0 by -1).foreach(i => bits += ((v >> i & 1) == 1))
      def ue(v: Int): Unit = {
        val z = 31 - Integer.numberOfLeadingZeros(v + 1)
        u(0, z); u(1, 1); if (z > 0) u(v + 1 - (1 << z), z)
      }
      def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
      def done(): Array[Byte] = {
        bits += true
        while (bits.length % 8 != 0) bits += false
        bits.grouped(8).map(_.zipWithIndex.foldLeft(0) { case (a, (b, i)) =>
          a | (if (b) 0x80 >> i else 0) }.toByte).toArray
      }
    }
    def ppsHead(w: W): Unit = {
      w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1) // ids, cavlc, bottomPoc
      w.ue(0); w.ue(0); w.ue(0) // groups, ref idx defaults
      w.u(0, 1); w.u(0, 2) // weighting
      w.se(0); w.se(0); w.se(0) // qp, qs, cqo
      w.u(0, 1); w.u(0, 1); w.u(0, 1) // dbf, cip, redundant
    }
    val ud = new W
    ppsHead(ud)
    ud.u(0, 1); ud.u(1, 1) // transform8x8 0, scaling present
    ud.u(1, 1); ud.se(-8) // list 0 present; delta -8 → nextScale 0 at j 0
    (1 until 6).foreach(_ => ud.u(0, 1))
    ud.se(0)
    assert(H264.parsePps(ud.done()).isEmpty, "use_default escape accepted")
    val noL0 = new W
    ppsHead(noL0)
    noL0.u(0, 1); noL0.u(1, 1)
    (0 until 6).foreach(_ => noL0.u(0, 1)) // every list absent
    noL0.se(0)
    assert(H264.parsePps(noL0.done()).isEmpty,
      "default 4x4 intra fall-back accepted")
    // ---- dequant: the SAME slice bytes decode DIFFERENTLY under a
    // scaling PPS vs the flat one (scaling is dequant-only) ----
    val (sps, ppsFlat) = i16SpsPps(2, 2, qp = 26)
    def i16dc(dcv: Int) = H264Cavlc.I16MbSpec(2, 0, 0,
      Array.tabulate(16)(k => if (k == 0) dcv else 0),
      Array.fill(16)(new Array[Int](15)),
      chromaDc = Array(Array(3, 0, 0, 0), Array(2, 0, 0, 0)),
      forceCbpChroma = Some(1))
    val rbsp = H264Cavlc.encodeI16x16Slice(sps, ppsFlat, 3, idr = true,
      0, 0, 0, 0, Seq.fill(4)(i16dc(4)), H264Cavlc.fixtureTables)
    val flatPic = H264Cavlc.parseI16x16Slice(rbsp, sps, ppsFlat, 3, 5,
      H264Cavlc.fixtureTables).get
    val scalPic = H264Cavlc.parseI16x16Slice(rbsp, sps, pps, 3, 5,
      H264Cavlc.fixtureTables).get
    assert(!scalPic.luma.sameElements(flatPic.luma), "wY ignored")
    assert(!scalPic.cb.sameElements(flatPic.cb), "wCb ignored")
    assert(!scalPic.cr.sameElements(flatPic.cr), "wCr ignored")
    // known answer, computed longhand: qp 26 (qp%6=2 → normAdjust 13),
    // DC ls = wY(0,0)·13; d = (4·ls + 2) >> 2; mb0 luma flat 128 + (d+32)>>6
    val lsDc = wY(0) * 13
    val l0 = 128 + (((4 * lsDc + 2) >> 2) + 32 >> 6)
    for (y <- 0 until 16; x <- 0 until 16)
      assert(scalPic.luma(y * 32 + x) == l0, s"mb0 ($x,$y)")
    // chroma DC per component: ls = wC(0,0)·normAdjust(qpc%6=2 → 13)
    val c0b = 128 + ((((3 * wCb(0) * 13) << 4) >> 5) + 32 >> 6)
    val c0r = 128 + ((((2 * wCr(0) * 13) << 4) >> 5) + 32 >> 6)
    assert(scalPic.cb(0) == c0b && scalPic.cr(0) == c0r, "chroma DC weights")
    // ---- 4x4 AC rounding branch (qp < 24) under wY ----
    val ppsLow = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      picInitQp = 20, scaling4 = Seq(wY, wCb, wCr))).get
    val i4 = H264Cavlc.I4x4MbSpec(Array.fill(16)(2), 0, 0,
      Array.tabulate(16, 16)((blk, p) =>
        if (blk == 0 && p == 1 ) 3 else 0).map(_.toArray),
      forceCbpLuma = Some(15))
    val low = H264Cavlc.parseI16x16Slice(
      H264Cavlc.encodeI16x16Slice(sps, ppsLow, 3, idr = true, 0, 0, 0, 0,
        Seq(i4, i4, i4, i4), H264Cavlc.fixtureTables),
      sps, ppsLow, 3, 5, H264Cavlc.fixtureTables).get
    // scan pos 1 → raster (0,1), class 2 → qp20 normAdjust row (13,20,16)
    // → 16; ls = wY(0,1)·16; d = (3·ls + 2^0) >> 1 — the REAL rounding
    // term the flat path never needed
    val lsAc = wY(1) * 16
    val dAc = (3 * lsAc + 1) >> 1
    // block (0,0) of mb0: residual row 0 = inverse transform of
    // d(1)=dAc — pixel (0,0) gets 128 + ((dAc + (dAc>>1)... use the
    // decoder-independent full transform on a delta at raster 1:
    val dArr = new Array[Int](16); dArr(1) = dAc
    val res = H264Cavlc.inverseTransform4x4(dArr)
    for (x <- 0 until 4)
      assert(low.luma(x) == math.max(0, math.min(255, 128 + res(x))),
        s"AC rounding branch at x=$x")
    // ---- 8x8 under w8 ----
    val pps8c = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      picInitQp = 26, transform8x8 = true, scaling4 = Seq(wY),
      scaling8 = Some(w8))).get
    val scan8 = new Array[Int](64); scan8(0) = 2
    val i8 = H264Cavlc.I8x8MbSpec(Array(2, 2, 2, 2), 0, 0,
      Array(scan8, new Array[Int](64), new Array[Int](64), new Array[Int](64)))
    val pic8 = H264Cavlc.parseI16x16Slice(
      H264Cavlc.encodeI16x16Slice(sps, pps8c, 3, idr = true, 0, 0, 0, 0,
        Seq(i8, i8, i8, i8), H264Cavlc.fixtureTables),
      sps, pps8c, 3, 5, H264Cavlc.fixtureTables).get
    // qp 26: qp%6=2 → normAdjust8x8 row (26,23,42,24,33,31) class(0,0)=0
    // → 26; ls = w8(0)·26; d = (2·ls + 2^1) >> 2; block flat (d+32)>>6
    val ls8 = w8(0) * 26
    val want8 = math.max(0, math.min(255,
      128 + ((((2 * ls8 + 2) >> 2) + 32) >> 6)))
    for (y <- 0 until 8; x <- 0 until 8)
      assert(pic8.luma(y * 32 + x) == want8, s"8x8 ($x,$y)")
    // ---- cross-coder parity under scaling ----
    val ppsCb = H264.parsePps(H264.encodePps(0, 0, cabac = true,
      picInitQp = 26, transform8x8 = true, scaling4 = Seq(wY, wCb, wCr),
      scaling8 = Some(w8))).get
    val ppsCv = H264.parsePps(H264.encodePps(0, 0, cabac = false,
      picInitQp = 26, transform8x8 = true, scaling4 = Seq(wY, wCb, wCr),
      scaling8 = Some(w8))).get
    val mix = Seq(i16dc(4), i4, i8, i16dc(-3))
    val a = H264Cavlc.parseI16x16Slice(
      H264Cavlc.encodeI16x16Slice(sps, ppsCv, 3, idr = true, 0, 0, 0, 0,
        mix, H264Cavlc.fixtureTables), sps, ppsCv, 3, 5,
      H264Cavlc.fixtureTables).get
    val b = H264Cabac.parseISlice(
      H264Cabac.encodeISlice(sps, ppsCb, 3, idr = true, 0, 0, 0, 0,
        mix, H264Cabac.fixtureTables), sps, ppsCb, 3, 5,
      H264Cabac.fixtureTables).get
    assert(a.luma.sameElements(b.luma) && a.cb.sameElements(b.cb) &&
      a.cr.sameElements(b.cr), "cross-coder parity under scaling")
    assert(a.luma.distinct.length > 2, "suspiciously flat")
  }

  test("h264 multi-slice pictures: slice-bound availability, CAVLC/CABAC parity, row-aligned slices equal stacked pictures, malformed slice sets reject (round 17)") {
    import graft.multimodal.{H264, H264Cavlc, H264Cabac, H264Mp4}
    val tC = H264Cavlc.fixtureTables
    val tB = H264Cabac.fixtureTables
    val (sps, ppsCavlc) = i16SpsPps(2, 2, qp = 28)
    val ppsCabac = H264.parsePps(H264.encodePps(0, 0, cabac = true,
      picInitQp = 28)).get

    // ---- A: MID-ROW boundary — slice 0 = {mb0}, slice 1 = {mb1..3}.
    // mb0 is I16 DC with a DC-only residual, so its plane is flat at a
    // value ≠ 128; if slice 1 wrongly treated mb0 as available, mb1's
    // DC prediction would average mb0's pixels instead of falling back
    // to 128 — the pin below would redden.
    val mb0 = H264Cavlc.I16MbSpec(2, 0, 1, // DC pred, qp 26+1
      Array.tabulate(16)(k => if (k == 0) 5 else 0),
      Array.fill(16)(new Array[Int](15)))
    // slice-1 I4x4 mode legality: mb1 and mb2 see NO outside-slice
    // neighbors (fresh corner); mb3's blk (0,0) lacks only the corner
    def msMode(mbIdx: Int, bx: Int, by: Int, pick: Int): Int = {
      val s =
        if (mbIdx == 3) { if (bx == 0 && by == 0) Seq(0, 1, 2, 3, 7, 8) else 0 to 8 }
        else if (bx == 0 && by == 0) Seq(2)
        else if (by == 0) Seq(1, 2, 8)
        else if (bx == 0) Seq(0, 2, 3, 7)
        else 0 to 8
      s(pick % s.length)
    }
    def msI4(mbIdx: Int, seed: Int, qpd: Int, blk0Zero: Boolean) = H264Cavlc.I4x4MbSpec(
      Array.tabulate(16) { blk =>
        val bx = 2 * ((blk / 4) % 2) + blk % 4 % 2
        val by = 2 * ((blk / 4) / 2) + (blk % 4) / 2
        msMode(mbIdx, bx, by, seed + blk)
      },
      if (mbIdx == 3) seed % 4 else 0, // chroma: mb1/mb2 have no neighbors
      qpd,
      Array.tabulate(16, 16)((blk, p) =>
        if (blk0Zero && blk == 0) 0
        else if ((seed + blk + p) % 6 == 0) ((seed + blk * (p + 1)) % 5) - 2 else 0)
        .map(_.toArray),
      forceCbpLuma = Some(15))
    for (seed <- 1 to 5) {
      val sl1 = Seq(msI4(1, seed, -2, blk0Zero = true),
        msI4(2, seed + 3, 0, blk0Zero = false),
        msI4(3, seed + 7, 2, blk0Zero = false))
      val s0c = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true,
        1, 2, 3, -2, Seq(mb0), tC, firstMb = 0)
      val s1c = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true,
        1, 2, 3, 1, sl1, tC, firstMb = 1)
      val a = H264Cavlc.parseI16x16Picture(Seq((3, 5, s0c), (3, 5, s1c)),
        sps, ppsCavlc, tC).getOrElse(fail(s"seed $seed: CAVLC multi-slice decode"))
      // mb0 flat at the closed-form DC value (slice QP 26, delta +1)
      val l0 = {
        val s = H264Cavlc.scaleLumaDc(5, 27)
        math.min(255, math.max(0, 128 + ((s + 32) >> 6)))
      }
      assert(l0 != 128, "fixture must make mb0 distinguishable from the DC fallback")
      for (y <- 0 until 16; x <- 0 until 16)
        assert(a.luma(y * 32 + x) == l0, s"mb0 pixel ($x,$y)")
      // mb1's blk (0,0): DC with NO available neighbors (left is mb0,
      // another slice; top is the picture edge) and zero residual
      for (y <- 0 until 4; x <- 16 until 20)
        assert(a.luma(y * 32 + x) == 128, s"seed $seed: mb1 blk0 read across the slice")
      // slice 0: 28−2 then mb0's +1; slice 1 RESTARTS at 28+1 = 29,
      // then −2 / 0 / +2 across mb1..3
      assert(a.mbs.map(_.qp) == Seq(27, 27, 27, 29), s"seed $seed: qp chains")
      // CABAC parity on the same slice set (fresh engine + contexts per slice)
      val s0b = H264Cabac.encodeISlice(sps, ppsCabac, 3, idr = true,
        1, 2, 3, -2, Seq(mb0), tB, firstMb = 0)
      val s1b = H264Cabac.encodeISlice(sps, ppsCabac, 3, idr = true,
        1, 2, 3, 1, sl1, tB, firstMb = 1)
      val b = H264Cabac.parseIPicture(Seq((3, 5, s0b), (3, 5, s1b)),
        sps, ppsCabac, tB).getOrElse(fail(s"seed $seed: CABAC multi-slice decode"))
      assert(a.luma.sameElements(b.luma), s"seed $seed: cross-coder luma")
      assert(a.cb.sameElements(b.cb) && a.cr.sameElements(b.cr),
        s"seed $seed: cross-coder chroma")
      assert(a.mbs.map(_.qp) == b.mbs.map(_.qp))
      // single-slice decode of the SAME specs must differ at mb1 (it
      // sees mb0's flat l0 plane as its left neighbor there)
      val whole = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true,
        1, 2, 3, -2, mb0 +: sl1.map(m => m.copy(qpDelta = m.qpDelta)), tC)
      H264Cavlc.parseI16x16Slice(whole, sps, ppsCavlc, 3, 5, tC) match {
        case Some(w) => assert(!w.luma.sameElements(a.luma),
          "slice boundary must change prediction")
        case None => // some seeds pick modes illegal single-slice (left
          // available changes the predictor): a reject is fine too
      }
      // the MP4 sample seam: one sample, TWO slice NALs
      val avcc = H264Mp4.encodeAvcc(66, 30, 4,
        Seq(H264Mp4.nalUnit(3, 7, H264.encodeSps(66, 30, 0, 0, 0, 1, 1, 1,
          frameMbsOnly = true, crop = None))),
        Seq(H264Mp4.nalUnit(3, 8, H264.encodePps(0, 0, cabac = false, picInitQp = 28))))
      val cfg = H264Mp4.parseAvcc(
        H264Mp4.encodeStsdAvc1(32, 32, avcc)).getOrElse(fail("avcc"))
      val sample = H264Mp4.sampleOf(4, Seq(
        H264Mp4.nalUnit(3, 5, s0c), H264Mp4.nalUnit(3, 5, s1c)))
      val viaMp4 = H264Mp4.decodeSamplePicture(sample, cfg, sps, ppsCavlc, tC, tB)
        .getOrElse(fail(s"seed $seed: MP4 two-slice sample"))
      assert(viaMp4.luma.sameElements(a.luma), s"seed $seed: MP4 path differs")
    }

    // ---- B: ROW-ALIGNED slices ≡ stacked independent pictures (the
    // strongest oracle-free pin: a slice's availability is exactly a
    // fresh picture's, so full-row slices must decode identically to
    // standalone pictures of those rows) ----
    val (sps21, _) = i16SpsPps(2, 1, qp = 28)
    def rowMode(bxInPic: Int, byInRow: Int, pick: Int): Int = {
      val s = if (bxInPic == 0 && byInRow == 0) Seq(2)
        else if (byInRow == 0) Seq(1, 2, 8)
        else if (bxInPic == 0) Seq(0, 2, 3, 7)
        else 0 to 8
      s(pick % s.length)
    }
    def rowI4(mbxInRow: Int, seed: Int, qpd: Int) = H264Cavlc.I4x4MbSpec(
      Array.tabulate(16) { blk =>
        val bx = 2 * ((blk / 4) % 2) + blk % 4 % 2
        val by = 2 * ((blk / 4) / 2) + (blk % 4) / 2
        rowMode(4 * mbxInRow + bx, by, seed + blk)
      },
      if (mbxInRow == 0) 0 else seed % 2, // DC, or DC/H on the right MB
      qpd,
      Array.tabulate(16, 16)((blk, p) =>
        if ((seed + blk + p) % 6 == 0) ((seed + blk * (p + 1)) % 5) - 2 else 0)
        .map(_.toArray),
      forceCbpLuma = Some(15))
    for (seed <- 1 to 3) {
      val top = Seq(rowI4(0, seed, 1), rowI4(1, seed + 2, -1))
      val bot = Seq(rowI4(0, seed + 5, 0), rowI4(1, seed + 8, 2))
      val sTop = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true,
        1, 2, 3, -1, top, tC, firstMb = 0)
      val sBot = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true,
        1, 2, 3, 2, bot, tC, firstMb = 2)
      val multi = H264Cavlc.parseI16x16Picture(Seq((3, 5, sTop), (3, 5, sBot)),
        sps, ppsCavlc, tC).getOrElse(fail(s"seed $seed: row-sliced decode"))
      val pTop = H264Cavlc.parseI16x16Slice(
        H264Cavlc.encodeI16x16Slice(sps21, ppsCavlc, 3, idr = true, 1, 2, 3, -1,
          top, tC), sps21, ppsCavlc, 3, 5, tC).getOrElse(fail("top picture"))
      val pBot = H264Cavlc.parseI16x16Slice(
        H264Cavlc.encodeI16x16Slice(sps21, ppsCavlc, 3, idr = true, 1, 2, 3, 2,
          bot, tC), sps21, ppsCavlc, 3, 5, tC).getOrElse(fail("bottom picture"))
      assert(java.util.Arrays.equals(multi.luma.take(32 * 16), pTop.luma),
        s"seed $seed: top rows")
      assert(java.util.Arrays.equals(multi.luma.drop(32 * 16), pBot.luma),
        s"seed $seed: bottom rows")
      assert(java.util.Arrays.equals(multi.cb.take(16 * 8), pTop.cb) &&
        java.util.Arrays.equals(multi.cb.drop(16 * 8), pBot.cb),
        s"seed $seed: cb rows")
      assert(multi.mbs.map(_.qp) == (pTop.mbs.map(_.qp) ++ pBot.mbs.map(_.qp)),
        s"seed $seed: qp chains restart per slice")
    }

    // ---- C: malformed slice sets reject, never misparse ----
    val s0 = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true,
      1, 2, 3, -2, Seq(mb0), tC, firstMb = 0)
    val s1 = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true,
      1, 2, 3, 1, Seq(msI4(1, 1, -2, blk0Zero = true), msI4(2, 4, 0, blk0Zero = false),
        msI4(3, 8, 2, blk0Zero = false)), tC, firstMb = 1)
    // coverage gap: slice 1 missing
    assert(H264Cavlc.parseI16x16Picture(Seq((3, 5, s0)), sps, ppsCavlc, tC).isEmpty)
    // overlap: slice 0 twice
    assert(H264Cavlc.parseI16x16Picture(Seq((3, 5, s0), (3, 5, s0)),
      sps, ppsCavlc, tC).isEmpty)
    // wrong order
    assert(H264Cavlc.parseI16x16Picture(Seq((3, 5, s1), (3, 5, s0)),
      sps, ppsCavlc, tC).isEmpty)
    // a mid-picture slice through the SINGLE-slice API rejects
    assert(H264Cavlc.parseI16x16Slice(s1, sps, ppsCavlc, 3, 5, tC).isEmpty)
    // picture-identity mismatch: slice 1 with a different frame_num
    val s1Wrong = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true,
      7, 2, 3, 1, Seq(msI4(1, 1, -2, blk0Zero = true), msI4(2, 4, 0, blk0Zero = false),
        msI4(3, 8, 2, blk0Zero = false)), tC, firstMb = 1)
    assert(H264Cavlc.parseI16x16Picture(Seq((3, 5, s0), (3, 5, s1Wrong)),
      sps, ppsCavlc, tC).isEmpty, "frame_num mismatch accepted")
    // encoder refuses a slice past the picture
    intercept[IllegalArgumentException](H264Cavlc.encodeI16x16Slice(sps, ppsCavlc,
      3, idr = true, 1, 2, 3, 0, Seq(mb0, mb0), tC, firstMb = 3))
    // ---- D: an elementary STREAM whose second access unit is
    // multi-slice: AU grouping (first_mb 0 starts a picture) yields
    // two pictures, the second equal to the direct multi-slice decode
    val spsB = H264.encodeSps(66, 30, 0, 0, 0, 1, 1, 1,
      frameMbsOnly = true, crop = None)
    val ppsB = H264.encodePps(0, 0, cabac = false, picInitQp = 28)
    val dcSpec = H264Cavlc.I16MbSpec(2, 0, 0, new Array[Int](16),
      Array.fill(16)(new Array[Int](15)))
    val f0 = H264Cavlc.encodeI16x16Slice(sps, ppsCavlc, 3, idr = true,
      1, 2, 3, 0, Seq.fill(4)(dcSpec), tC)
    val stream = H264.annexB(Seq((3, 7, spsB), (3, 8, ppsB),
      (3, 5, f0), (3, 5, s0), (3, 5, s1)))
    val (_, pics) = graft.tools.H264ValidationProbe.decodePictures(stream, tC, tB)
    assert(pics.length == 2 && pics.forall(_.isRight),
      "stream must group into two decodable access units")
    val direct = H264Cavlc.parseI16x16Picture(Seq((3, 5, s0), (3, 5, s1)),
      sps, ppsCavlc, tC).get
    assert(pics(1).toOption.get.luma.sameElements(direct.luma),
      "multi-slice access unit inside a stream differs from direct decode")
    assert(pics(0).toOption.get.luma.forall(_ == 128))
  }
}

/** Big-endian helper shared by the MP4 spec's byte surgery. */
object Mp4ParseHelpers {
  def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
    ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
}
