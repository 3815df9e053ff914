package graft.tools

import java.nio.file.{Files, Paths}
import graft.multimodal.Mp3

/** Real-decoder validation harness for the MP3 short-intensity rule
  * (round 16, r15 VERDICT #6 / the open ADVICE item): no real
  * joint-stereo corpus exists in this sandbox, so the decided
  * band-granular rule is VALIDATION-READY rather than validated —
  * this probe is the missing half. Given an externally-supplied
  * joint-stereo MP3 and its reference-decoder PCM (s16le,
  * channel-interleaved — e.g. `ffmpeg -i in.mp3 -f s16le ref.pcm`),
  * plus the ISO table transcriptions the decode needs, it decodes the
  * stream under BOTH candidate rules:
  *
  *   A (committed): a short band is intensity iff its ENTIRE 3-window
  *     transmission block lies in the right channel's zero part
  *     (3·bS(s) ≥ rzeroStart);
  *   B (per-window): window w of band s is intensity iff ITS OWN
  *     transmission block lies in the zero part
  *     (3·bS(s) + w·width ≥ rzeroStart);
  *
  * aligns each against the reference samples, and reports per-variant
  * match statistics — exact 16-bit matches, RMS error, max abs error
  * — plus the verdict on which rule the reference decoder implements.
  * On streams with no short-block intensity frames the two variants
  * coincide and the probe says so.
  *
  * Usage:
  *   Mp3IntensityProbe <in.mp3> <ref.pcm> <rateIdx 0..2> <tables.spec>
  *                     [synthwindow.spec]
  *
  * The spec files use the documented [[Mp3.parseHuffTablesSpec]] /
  * [[Mp3.parseSynthWindowSpec]] formats (ISO B.7 codebooks + the B.3
  * synthesis window — transcription data this environment cannot
  * verify, hence caller-supplied).
  */
object Mp3IntensityProbe {

  final case class VariantReport(name: String, nSamples: Int, nExact: Int,
                                 rms: Double, maxAbs: Int) {
    def exactPct: Double = 100.0 * nExact / math.max(1, nSamples)
    override def toString: String =
      f"$name: exact $nExact/$nSamples ($exactPct%.3f%%), rms $rms%.3f, max |d| $maxAbs"
  }

  /** Compare one decoded variant against reference samples (both
    * channel-interleaved 16-bit), over the overlapping prefix. */
  private[graft] def compare(name: String, decoded: Seq[Array[Double]],
                             ref: Array[Int]): VariantReport = {
    val ch = decoded.length
    val n = math.min(decoded.head.length * ch, ref.length)
    var exact = 0; var se = 0.0; var mx = 0
    var i = 0
    while (i < n) {
      val v = Mp3.pcm16(decoded(i % ch)(i / ch))
      val d = v - ref(i)
      if (d == 0) exact += 1
      se += d.toDouble * d
      if (math.abs(d) > mx) mx = math.abs(d)
      i += 1
    }
    VariantReport(name, n, exact, math.sqrt(se / math.max(1, n)), mx)
  }

  /** The probe verdict from the two reports — which rule the
    * reference decoder implements (ties mean the stream never
    * discriminates: no short-intensity frame with a mid-band zero
    * boundary). */
  private[graft] def verdict(a: VariantReport, b: VariantReport): String =
    if (a.nExact == b.nExact)
      "INDISCRIMINATE: the stream has no frame where the two rules differ " +
        "(no short-block intensity with a mid-band zero boundary) — supply " +
        "a joint-stereo stream with short blocks"
    else if (a.nExact > b.nExact)
      s"variant A (band-granular, the committed rule) matches the reference " +
        s"(${a.exactPct}% vs ${b.exactPct}% exact)"
    else
      s"variant B (per-window) matches the reference " +
        s"(${b.exactPct}% vs ${a.exactPct}% exact) — flip the " +
        "shortIsPerWindow default and update the gate oracles"

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: Mp3IntensityProbe <in.mp3> <ref.pcm> <rateIdx> <tables.spec> [window.spec]")
    val bytes = Files.readAllBytes(Paths.get(args(0)))
    val refBytes = Files.readAllBytes(Paths.get(args(1)))
    val rateIdx = args(2).toInt
    val specText = new String(Files.readAllBytes(Paths.get(args(3))), "UTF-8")
    val tables = Mp3.fixtureTables ++ Mp3.parseHuffTablesSpec(specText)
    val window =
      if (args.length > 4)
        Mp3.parseSynthWindowSpec(new String(Files.readAllBytes(Paths.get(args(4))), "UTF-8"))
      else Mp3.fixtureSynthWindow
    val ref = Array.tabulate(refBytes.length / 2)(i =>
      ((refBytes(2 * i) & 0xFF) | (refBytes(2 * i + 1) << 8)).toShort.toInt)
    val stream = Mp3.parseMp3(bytes).getOrElse(
      sys.error("not a decodable MP3 stream under this scope"))
    println(s"[mp3probe] ${stream.framePayloads.size} frames, " +
      s"mode ${stream.mode}/${stream.modeExt}, ${stream.channels} ch")
    val a = Mp3.decodePcmStream(stream, rateIdx, tables, synthWindow = window)
      .getOrElse(sys.error("variant A decode refused (scope or tables)"))
    val b = Mp3.decodePcmStream(stream, rateIdx, tables, synthWindow = window,
        shortIsPerWindow = true)
      .getOrElse(sys.error("variant B decode refused (scope or tables)"))
    val ra = compare("A band-granular", a, ref)
    val rb = compare("B per-window  ", b, ref)
    println(s"[mp3probe] $ra")
    println(s"[mp3probe] $rb")
    println(s"[mp3probe] verdict: ${verdict(ra, rb)}")
  }
}
