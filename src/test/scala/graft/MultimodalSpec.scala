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
}
