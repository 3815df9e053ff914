package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque BINARY plus typed
  * metadata, with decode / feature-extraction / frame-sampling as
  * per-partition imperative transforms (the Scala analog of
  * `mapInPandas`-batched Python UDFs: one iterator per partition, arbitrary
  * native code inside, schema declared up front).
  *
  * The CODECS ARE STUBS — this container ships no image/audio libraries, so
  * `decodeStub` is a clearly-marked deterministic fake (identity bytes +
  * arithmetic width/height). Everything around it — the asset schema, the
  * Dataset[T] encoders, the mapPartitions batch shape, the explode of
  * sampled frames, partition preservation — is the real plumbing a real
  * codec would drop into.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class Asset(id: Long, kind: String, bytes: Array[Byte],
                         width: Int, height: Int)
  final case class ImageFeatures(id: Long, n_bytes: Long, fp: String,
                                 width: Int, height: Int)
  final case class Frame(id: Long, frame_idx: Int, frame_fp: String)

  /** Frame length (bytes) for the fake video codec. */
  val frameLen = 256

  /** STUB — a real build replaces this with an actual decoder (libjpeg,
    * ffmpeg, ...). Deterministic fake: payload is its own "decoded" form,
    * dimensions derive arithmetically from the byte length. */
  def decodeStub(bytes: Array[Byte]): (Array[Byte], Int, Int) =
    (bytes, bytes.length % 64 + 1, bytes.length / 64 + 1)

  private def md5hex(b: Array[Byte], off: Int, len: Int): String = {
    val d = MessageDigest.getInstance("MD5")
    d.update(b, off, len)
    d.digest().map(x => f"$x%02x").mkString
  }

  /** Pack a (id, text) table into binary assets — the ingest seam where real
    * pipelines read image/audio files; here the payload is the UTF-8 text. */
  def packDocuments(docs: DataFrame, idCol: String, textCol: String): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val (_, w, h) = decodeStub(bytes)
        Asset(id, "image", bytes, w, h)
      })
  }

  /** Decode + feature-extract, one partition-batch at a time. Output is
    * narrow (id + scalars) — the pattern that keeps 100 TB of payload bytes
    * from ever being shuffled: features are computed where the bytes sit. */
  def imageFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val (decoded, w, h) = decodeStub(a.bytes)
      ImageFeatures(a.id, decoded.length.toLong, md5hex(decoded, 0, decoded.length), w, h)
    })
  }

  final case class Resized(id: Long, out_w: Int, out_h: Int, n_sampled: Int,
                           resized_fp: String)

  /** "Resize" for the stub codec: deterministic grid subsample of the
    * payload down to ≤ tw×th samples (stride = ⌈len/(tw·th)⌉) — the shape
    * of a real resize kernel (a gather at computed offsets over the
    * decoded buffer) without a codec. Output stays narrow (scalars + a
    * fingerprint of the resized buffer): payload bytes never shuffle.
    *
    * The operator samples BYTES (the honest domain for a binary payload).
    * The `multimodal_resize` gate's SQL oracle reproduces it with
    * per-CHARACTER substr — equivalent only while the packed payloads are
    * ASCII (true of the test corpus); the operator itself is byte-correct
    * for any payload. */
  def resize(assets: Dataset[Asset], tw: Int, th: Int): Dataset[Resized] = {
    import assets.sparkSession.implicits._
    require(tw > 0 && th > 0, "target dims must be positive")
    assets.mapPartitions(_.map { a =>
      val len = a.bytes.length
      val target = tw * th
      val k = math.max(1, (len + target - 1) / target)
      val n = (len + k - 1) / k
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = a.bytes(i * k); i += 1 }
      Resized(a.id, tw, th, n, md5hex(out, 0, n))
    })
  }

  /** Sample every `every`-th fixed-length frame from the payload ("video"
    * frame extraction): per-asset iterator flatMap — no materialized frame
    * list, streaming through each partition. */
  def sampleFrames(assets: Dataset[Asset], every: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      val nFrames = (a.bytes.length + frameLen - 1) / frameLen
      Iterator.range(0, nFrames).filter(_ % every == 0).map { i =>
        val off = i * frameLen
        val len = math.min(frameLen, a.bytes.length - off)
        Frame(a.id, i, md5hex(a.bytes, off, len))
      }
    })
  }
}
