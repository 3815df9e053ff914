package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** H.264 CAVLC slice-data decode for Intra_16x16 LUMA (round 15, r14
  * VERDICT #7 — the first honest rung past I_PCM toward real pixels):
  * §9.2 residual_block_cavlc (coeff_token, trailing-one signs, the
  * adaptive level prefix/suffix walk, total_zeros, run_before), the §9.2.1
  * nC neighbor context over the per-4x4 TotalCoeff grid, §8.5.6 zig-zag,
  * the §8.5.10 DC Hadamard + §8.5.12 scaling and 4x4 inverse core
  * transform, and the four §8.3.3 Intra_16x16 prediction modes
  * (V/H/DC/Plane) over already-reconstructed neighbor pixels.
  *
  * TABLE PROVENANCE — the Mp3/Aac never-guess discipline: the CAVLC VLC
  * tables (Tables 9-5 coeff_token, 9-7/9-8 total_zeros, 9-10 run_before —
  * several hundred codewords) are transcription data that cannot be
  * verified in this zero-egress environment, so [[parseI16x16Slice]]
  * takes its [[CavlcTables]] as a REQUIRED argument with no default.
  * [[fixtureTables]] is a canonical formula-generated stand-in (same
  * symbol alphabets, NOT the ISO codes) for fixtures, tests and gates —
  * pointing it at a real encoder's stream would not decode (and must not
  * be tried: unlike the MP3/AAC books there is no in-band id to mount a
  * fixture on, so table provenance is entirely the caller's contract; a
  * real deployment pastes the Table 9-x transcription it trusts through
  * [[parseCavlcSpec]]). Everything OUTSIDE the VLC tables — the level
  * code arithmetic, run/zeros reconstruction, nC rule, scan, transforms,
  * prediction — is formula math from the spec and is implemented fully.
  *
  * The small §8.5.9 normAdjust4x4 matrix (18 integers; the LevelScale
  * with flat weightScale 16) is shipped inline like MP3's pretab/ci
  * constants — small enough to verify by inspection, unlike the VLC
  * tables.
  *
  * SCOPE (strict-reject, never misparse): CAVLC I slices mixing
  * Intra_16x16, Intra_4x4 (round 16 — all nine §8.3.1.2 prediction
  * modes, prev_intra4x4_pred_mode signalling, the Table 9-4 me(v)
  * CBP, per-4x4 reconstruction order with in-MB neighbor
  * availability) and — round 17 — Intra_8x8 (transform_size_8x8_flag
  * under a transform-8x8 PPS: §8.3.2 prediction over §8.3.2.2.1
  * FILTERED references, the §8.5.13.1 four-4x4 CAVLC interleave,
  * normAdjust8x8 dequant, the §8.5.13.2 8-point butterfly);
  * coded_block_pattern chroma 0/1/2 all decode — the full YCbCr
  * picture reconstructs. Named seams that still reject: mb_type 25
  * I_PCM inside this parser (I_PCM has its own parser in [[H264]]),
  * pic_scaling_matrix (flat-16 lists only, at the PPS), P/B slices. Reference analog: the opaque-binary
  * multimodal columns (SURVEY §2.7); the encoder half exists for
  * fixture assembly only, mirroring Jpeg/Mp3/Aac/H264.
  */
object H264Cavlc {

  // -------------------------------------------------------------------
  // CAVLC code tables (caller-supplied; fixture stand-ins below)
  // -------------------------------------------------------------------

  private def checkPrefixFree[T](codes: Map[String, T], what: String): Unit = {
    require(codes.nonEmpty, s"$what: empty table")
    require(codes.keys.forall(c => c.nonEmpty && c.forall(b => b == '0' || b == '1')),
      s"$what: bad codeword")
    require(!codes.keys.exists(a => codes.keys.exists(b => b != a && b.startsWith(a))),
      s"$what is not prefix-free")
  }

  /** The CAVLC VLC tables §9.2 reads:
    *  - `coeffToken(cls)`: cls 0 (0 ≤ nC < 2), 1 (2 ≤ nC < 4),
    *    2 (4 ≤ nC < 8), 3 (nC ≥ 8), 4 (nC = −1, 4:2:0 chroma DC) →
    *    code → (TotalCoeff, TrailingOnes);
    *  - `totalZeros(tc)`: tc 1..15 (4x4 blocks) → code → total_zeros;
    *  - `totalZerosChromaDc(tc)`: tc 1..3 → code → total_zeros (≤ 4−tc);
    *  - `runBefore(zl)`: zl 1..7, where 7 covers zerosLeft > 6 →
    *    code → run_before. */
  final case class CavlcTables(
      coeffToken: Map[Int, Map[String, (Int, Int)]],
      totalZeros: Map[Int, Map[String, Int]],
      totalZerosChromaDc: Map[Int, Map[String, Int]],
      runBefore: Map[Int, Map[String, Int]]) {
    require(Set(0, 1, 2, 3, 4).subsetOf(coeffToken.keySet),
      "coeff_token needs nC classes 0..3 and 4 (chroma DC)")
    require((1 to 15).forall(totalZeros.contains), "total_zeros needs tc 1..15")
    require((1 to 3).forall(totalZerosChromaDc.contains),
      "chroma-DC total_zeros needs tc 1..3")
    require((1 to 7).forall(runBefore.contains), "run_before needs zl 1..7")
    coeffToken.foreach { case (k, m) =>
      checkPrefixFree(m, s"coeff_token[$k]")
      require(m.values.forall { case (tc, t1) =>
        tc >= 0 && tc <= 16 && t1 >= 0 && t1 <= math.min(3, tc) },
        s"coeff_token[$k]: symbol out of range")
    }
    totalZeros.foreach { case (tc, m) =>
      checkPrefixFree(m, s"total_zeros[$tc]")
      require(m.values.forall(z => z >= 0 && z <= 16 - tc),
        s"total_zeros[$tc]: value out of 0..${16 - tc}")
    }
    totalZerosChromaDc.foreach { case (tc, m) =>
      checkPrefixFree(m, s"tz_chroma[$tc]")
      require(m.values.forall(z => z >= 0 && z <= 4 - tc),
        s"tz_chroma[$tc]: value out of 0..${4 - tc}")
    }
    runBefore.foreach { case (zl, m) =>
      checkPrefixFree(m, s"run_before[$zl]")
      require(m.values.forall(r => r >= 0 && r <= (if (zl < 7) zl else 14)),
        s"run_before[$zl]: run out of range")
    }
    private[multimodal] val ctMaxLen = coeffToken.map { case (k, m) => k -> m.keys.map(_.length).max }
    private[multimodal] val tzMaxLen = totalZeros.map { case (k, m) => k -> m.keys.map(_.length).max }
    private[multimodal] val tzcMaxLen = totalZerosChromaDc.map { case (k, m) => k -> m.keys.map(_.length).max }
    private[multimodal] val rbMaxLen = runBefore.map { case (k, m) => k -> m.keys.map(_.length).max }
    private[multimodal] val ctEnc: Map[Int, Map[(Int, Int), String]] =
      coeffToken.map { case (k, m) => k -> m.map(_.swap) }
    private[multimodal] val tzEnc: Map[Int, Map[Int, String]] =
      totalZeros.map { case (k, m) => k -> m.map(_.swap) }
    private[multimodal] val tzcEnc: Map[Int, Map[Int, String]] =
      totalZerosChromaDc.map { case (k, m) => k -> m.map(_.swap) }
    private[multimodal] val rbEnc: Map[Int, Map[Int, String]] =
      runBefore.map { case (k, m) => k -> m.map(_.swap) }
    require(ctEnc.forall { case (k, m) => m.size == coeffToken(k).size },
      "duplicate coeff_token symbols")
    require(tzEnc.forall { case (k, m) => m.size == totalZeros(k).size },
      "duplicate total_zeros symbols")
    require(rbEnc.forall { case (k, m) => m.size == runBefore(k).size },
      "duplicate run_before symbols")
  }

  /** Canonical fixture code for symbol index k of an alphabet: "0" for
    * k = 0, else "1" + 7 index bits — prefix-free by construction, same
    * shape as [[Aac.fixtureSpectralBook]]. */
  private def fixtureCode(k: Int): String =
    if (k == 0) "0" else "1" + Integer.toBinaryString(128 | (k - 1)).substring(1)

  /** Formula-generated stand-in tables (NOT the ISO codes): every class
    * enumerates its full symbol alphabet with canonical codes, so any
    * legal (TotalCoeff, TrailingOnes, total_zeros, run_before) stream is
    * codable. */
  val fixtureTables: CavlcTables = {
    val ctSyms = for (tc <- 0 to 16; t1 <- 0 to math.min(3, tc)) yield (tc, t1)
    val ct = ctSyms.zipWithIndex.map { case (s, k) => fixtureCode(k) -> s }.toMap
    val ctChroma = ctSyms.filter(_._1 <= 4).zipWithIndex
      .map { case (s, k) => fixtureCode(k) -> s }.toMap
    CavlcTables(
      coeffToken = Map(0 -> ct, 1 -> ct, 2 -> ct, 3 -> ct, 4 -> ctChroma),
      totalZeros = (1 to 15).map(tc =>
        tc -> (0 to 16 - tc).map(z => fixtureCode(z) -> z).toMap).toMap,
      totalZerosChromaDc = (1 to 3).map(tc =>
        tc -> (0 to 4 - tc).map(z => fixtureCode(z) -> z).toMap).toMap,
      runBefore = (1 to 7).map(zl =>
        zl -> (0 to (if (zl < 7) zl else 14)).map(r => fixtureCode(r) -> r).toMap).toMap)
  }

  /** Caller-supplied table spec (the Aac.parseAacBooksSpec discipline):
    *
    *   # comment (anywhere; blank lines ignored)
    *   coefftoken 0            — starts a coeff_token section; class
    *                             0..3 = the nC bands, 4 = chroma DC
    *   0001 3 2                — one codeword: <bits> <TotalCoeff> <T1s>
    *   totalzeros 4            — total_zeros section, tc 1..15
    *   011 5                   — one codeword: <bits> <total_zeros>
    *   tzchroma 2              — chroma-DC total_zeros, tc 1..3
    *   runbefore 3             — run_before, zerosLeft class 1..7
    *
    * Strict: a typo'd top-level directive throws (never a silent
    * partial table); the assembled tables must pass every
    * [[CavlcTables]] check. Sections may be partial — merge over
    * [[fixtureTables]] is the caller's choice, but mixing fixture and
    * transcription codes in one class is rejected at require time only
    * if inconsistent, so a real deployment should supply ALL sections. */
  def parseCavlcSpec(text: String): CavlcTables = {
    // section: (kind, key) — kind 0 coefftoken, 1 totalzeros, 2 tzchroma, 3 runbefore
    var cur: Option[(Int, Int)] = None
    val ct = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Map[String, (Int, Int)]]
    val tz = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Map[String, Int]]
    val tzc = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Map[String, Int]]
    val rb = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Map[String, Int]]
    def bits(s: String): String = {
      require(s.forall(c => c == '0' || c == '1'), s"bad code '$s'")
      s
    }
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) line.split("\\s+") match {
        case Array("coefftoken", k) =>
          val i = k.toInt; require(i >= 0 && i <= 4, s"coeff_token class $i")
          cur = Some((0, i)); ct.getOrElseUpdate(i, scala.collection.mutable.Map.empty)
        case Array("totalzeros", k) =>
          val i = k.toInt; require(i >= 1 && i <= 15, s"total_zeros tc $i")
          cur = Some((1, i)); tz.getOrElseUpdate(i, scala.collection.mutable.Map.empty)
        case Array("tzchroma", k) =>
          val i = k.toInt; require(i >= 1 && i <= 3, s"tz_chroma tc $i")
          cur = Some((2, i)); tzc.getOrElseUpdate(i, scala.collection.mutable.Map.empty)
        case Array("runbefore", k) =>
          val i = k.toInt; require(i >= 1 && i <= 7, s"run_before zl $i")
          cur = Some((3, i)); rb.getOrElseUpdate(i, scala.collection.mutable.Map.empty)
        case Array(code, tc, t1) if cur.exists(_._1 == 0) =>
          ct(cur.get._2) += (bits(code) -> (tc.toInt, t1.toInt))
        case Array(code, v) if cur.exists(c => c._1 >= 1) =>
          cur.get._1 match {
            case 1 => tz(cur.get._2) += (bits(code) -> v.toInt)
            case 2 => tzc(cur.get._2) += (bits(code) -> v.toInt)
            case _ => rb(cur.get._2) += (bits(code) -> v.toInt)
          }
        case other => throw new IllegalArgumentException(
          s"unrecognized CAVLC spec line: '${other.mkString(" ")}'")
      }
    }
    // merge over the fixtures so partial transcriptions still type-check;
    // supplied sections REPLACE the fixture section wholesale
    CavlcTables(
      fixtureTables.coeffToken ++ ct.map { case (k, m) => k -> m.toMap },
      fixtureTables.totalZeros ++ tz.map { case (k, m) => k -> m.toMap },
      fixtureTables.totalZerosChromaDc ++ tzc.map { case (k, m) => k -> m.toMap },
      fixtureTables.runBefore ++ rb.map { case (k, m) => k -> m.toMap })
  }

  // -------------------------------------------------------------------
  // Shared small tables (formula / inline constants)
  // -------------------------------------------------------------------

  /** §8.5.6 zig-zag: scan position → raster index in the 4x4 block. */
  private[graft] val zigZag4x4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** §8.5.9 normAdjust4x4(m, idx): idx 0 = both coords even, 1 = both
    * odd, 2 = mixed. (The LevelScale4x4 with flat weightScale = 16,
    * divided by 16.) 18 integers, shipped inline like MP3's pretab. */
  private[graft] val normAdjust4x4: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  @inline private def vClass(i: Int, j: Int): Int =
    if (i % 2 == 0 && j % 2 == 0) 0 else if (i % 2 == 1 && j % 2 == 1) 1 else 2

  // -------------------------------------------------------------------
  // §9.2 residual_block_cavlc
  // -------------------------------------------------------------------

  private[graft] final class BitReader(bytes: Array[Byte]) {
    private var bit = 0
    def u(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = bit + i
        v = (v << 1) | ((bytes(b >> 3) >> (7 - (b & 7))) & 1)
        i += 1
      }
      bit += n
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) { zeros += 1; require(zeros <= 30, "ue(v) too long") }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
    def bitsLeft: Int = bytes.length * 8 - bit
    def aligned: Boolean = (bit & 7) == 0
    /** §7.2 more_rbsp_data(): true iff data remains BEFORE the
      * rbsp_stop_one_bit — the last 1-bit of the RBSP (round 17, the
      * multi-slice seam: CAVLC slice data has no macroblock count, a
      * slice ends exactly when only the trailing bits remain). */
    private val stopBitPos: Int = {
      var last = bytes.length - 1
      while (last >= 0 && bytes(last) == 0) last -= 1
      if (last < 0) -1
      else {
        var lsb = 0
        while (((bytes(last) >> lsb) & 1) == 0) lsb += 1
        last * 8 + (7 - lsb)
      }
    }
    def moreRbspData: Boolean = bit < stopBitPos
  }

  private def readVlc[T](r: BitReader, codes: Map[String, T], maxLen: Int,
                         what: String): T = {
    val sb = new StringBuilder
    while (sb.length <= maxLen) {
      sb.append(if (r.u(1) == 1) '1' else '0')
      codes.get(sb.toString) match {
        case Some(v) => return v
        case None =>
      }
    }
    throw new IllegalArgumentException(s"unmatched $what code '${sb.toString}'")
  }

  private def ctClass(nC: Int): Int =
    if (nC == -1) 4
    else if (nC < 2) 0
    else if (nC < 4) 1
    else if (nC < 8) 2
    else 3

  /** One §9.2 residual block: returns (levels in coefficient-array
    * order, i.e. index = scan position 0..maxCoeffs−1, TotalCoeff).
    * `nC` per §9.2.1 (−1 = chroma DC). Throws on malformed input. */
  private[graft] def residualBlock(r: BitReader, nC: Int, maxCoeffs: Int,
                                        tables: CavlcTables): (Array[Int], Int) = {
    val cls = ctClass(nC)
    val (totalCoeff, trailingOnes) =
      readVlc(r, tables.coeffToken(cls), tables.ctMaxLen(cls), "coeff_token")
    require(totalCoeff <= maxCoeffs, s"TotalCoeff $totalCoeff > $maxCoeffs")
    val out = new Array[Int](maxCoeffs)
    if (totalCoeff == 0) return (out, 0)
    // levels, highest frequency first (§9.2.2): t1 signs then the
    // adaptive prefix/suffix walk
    val level = new Array[Int](totalCoeff)
    var i = 0
    while (i < trailingOnes) {
      level(i) = if (r.u(1) == 1) -1 else 1
      i += 1
    }
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    while (i < totalCoeff) {
      var prefix = 0
      while (r.u(1) == 0) { prefix += 1; require(prefix <= 32, "level_prefix too long") }
      val suffixSize =
        if (prefix == 14 && suffixLength == 0) 4
        else if (prefix >= 15) prefix - 3
        else suffixLength
      var levelCode = math.min(15, prefix) << suffixLength
      if (suffixSize > 0) levelCode += r.u(suffixSize)
      if (prefix >= 15 && suffixLength == 0) levelCode += 15
      if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096
      if (i == trailingOnes && trailingOnes < 3) levelCode += 2
      level(i) = if (levelCode % 2 == 0) (levelCode + 2) >> 1
                 else (-levelCode - 1) >> 1
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    // total_zeros
    var zerosLeft =
      if (totalCoeff < maxCoeffs) {
        if (nC == -1)
          readVlc(r, tables.totalZerosChromaDc(totalCoeff),
            tables.tzcMaxLen(totalCoeff), "tz_chroma")
        else
          readVlc(r, tables.totalZeros(totalCoeff),
            tables.tzMaxLen(totalCoeff), "total_zeros")
      } else 0
    require(zerosLeft <= maxCoeffs - totalCoeff, "total_zeros overruns block")
    // run_before walk, then place levels (§9.2.3)
    var coeffNum = zerosLeft + totalCoeff - 1
    i = 0
    while (i < totalCoeff) {
      val run =
        if (i == totalCoeff - 1) zerosLeft // last (lowest-freq) level takes the rest
        else if (zerosLeft > 0)
          readVlc(r, tables.runBefore(math.min(zerosLeft, 7)),
            tables.rbMaxLen(math.min(zerosLeft, 7)), "run_before")
        else 0
      require(run <= zerosLeft, "run_before overruns zerosLeft")
      out(coeffNum) = level(i)
      zerosLeft -= run
      coeffNum -= run + 1
      i += 1
    }
    (out, totalCoeff)
  }

  // -------------------------------------------------------------------
  // Transforms + scaling (§8.5)
  // -------------------------------------------------------------------

  /** §8.5.10 inverse Hadamard on the 16 Intra16x16 luma DC coefficients
    * (4x4 raster array in, f array out — exact integers, no rounding). */
  private[graft] def inverseHadamard4x4(c: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var j = 0
    while (j < 4) { // rows
      val a = c(4 * j); val b = c(4 * j + 1); val d = c(4 * j + 2); val e = c(4 * j + 3)
      t(4 * j) = a + b + d + e
      t(4 * j + 1) = a - b + d - e
      t(4 * j + 2) = a + b - d - e
      t(4 * j + 3) = a - b - d + e
      j += 1
    }
    val f = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a = t(i); val b = t(4 + i); val d = t(8 + i); val e = t(12 + i)
      f(i) = a + b + d + e
      f(4 + i) = a - b + d - e
      f(8 + i) = a + b - d - e
      f(12 + i) = a - b - d + e
      i += 1
    }
    f
  }

  /** §8.5.10 DC scaling after the Hadamard: flat weightScale 16, so
    * LevelScale(qP%6, 0, 0) = 16·normAdjust(qP%6, 0). */
  private[graft] def scaleLumaDc(f: Int, qp: Int): Int =
    scaleLumaDcW(f, qp, 16)

  /** §8.5.10 DC scaling with an explicit weightScale(0,0) (round 17 —
    * the scaling-matrix path; `w00` = 16 is the flat case). */
  private[graft] def scaleLumaDcW(f: Int, qp: Int, w00: Int): Int = {
    val ls = w00 * normAdjust4x4(qp % 6)(0)
    if (qp >= 36) (f * ls) << (qp / 6 - 6)
    else (f * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }

  /** §8.5.12.1 AC scaling (flat lists): d = c · normAdjust(qP%6, class)
    * · 2^(qP/6) — exact-equivalent to the spec's two branches when the
    * weightScale is flat 16 (the added rounding term never carries). */
  @inline private[graft] def scaleAc(c: Int, qp: Int, i: Int, j: Int): Int =
    (c * normAdjust4x4(qp % 6)(vClass(i, j))) << (qp / 6)

  /** §8.5.12.1 AC scaling under a STREAM-CARRIED weight matrix (round
    * 17): LevelScale4x4 = w(i,j)·normAdjust, the literal two-branch
    * spec formula — for non-16 weights the ×16-cancels-the-shift
    * simplification above no longer applies and the sub-24 rounding
    * term is real. `w` is the 16-entry raster matrix. */
  @inline private[graft] def scaleAcW(c: Int, qp: Int, i: Int, j: Int,
                                      w: Array[Int]): Int = {
    val ls = w(4 * i + j) * normAdjust4x4(qp % 6)(vClass(i, j))
    if (qp >= 24) (c * ls) << (qp / 6 - 4)
    else (c * ls + (1 << (3 - qp / 6))) >> (4 - qp / 6)
  }

  /** §8.5.12.2 inverse 4x4 core transform: 16 scaled coefficients
    * (raster) → 16 residual samples, final (x + 32) >> 6. */
  private[graft] def inverseTransform4x4(d: Array[Int]): Array[Int] = {
    val h = new Array[Int](16)
    var j = 0
    while (j < 4) { // horizontal (rows)
      val d0 = d(4 * j); val d1 = d(4 * j + 1); val d2 = d(4 * j + 2); val d3 = d(4 * j + 3)
      val e0 = d0 + d2; val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3; val e3 = d1 + (d3 >> 1)
      h(4 * j) = e0 + e3; h(4 * j + 1) = e1 + e2
      h(4 * j + 2) = e1 - e2; h(4 * j + 3) = e0 - e3
      j += 1
    }
    val out = new Array[Int](16)
    var i = 0
    while (i < 4) { // vertical (columns)
      val d0 = h(i); val d1 = h(4 + i); val d2 = h(8 + i); val d3 = h(12 + i)
      val e0 = d0 + d2; val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3; val e3 = d1 + (d3 >> 1)
      out(i) = (e0 + e3 + 32) >> 6
      out(4 + i) = (e1 + e2 + 32) >> 6
      out(8 + i) = (e1 - e2 + 32) >> 6
      out(12 + i) = (e0 - e3 + 32) >> 6
      i += 1
    }
    out
  }

  // -------------------------------------------------------------------
  // 8x8 transform tier (round 17 — transform_size_8x8_flag / Intra_8x8,
  // the High-profile I-frame rung): §8.5.13 scaling + inverse 8x8
  // transform, §8.3.2 prediction with §8.3.2.2.1 reference filtering.
  // -------------------------------------------------------------------

  /** §8.5.6's 8x8 zig-zag scan, GENERATED by the standard diagonal
    * walk (no transcription: the scan is an algorithm, like the 4x4
    * one): scan position → raster index in the 8x8 block. */
  private[graft] val zigZag8x8: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0; var j = 0; var k = 0
    while (k < 64) {
      out(k) = 8 * i + j
      if ((i + j) % 2 == 0) { // moving up-right
        if (j == 7) i += 1
        else if (i == 0) j += 1
        else { i -= 1; j += 1 }
      } else { // moving down-left
        if (i == 7) j += 1
        else if (j == 0) i += 1
        else { i += 1; j -= 1 }
      }
      k += 1
    }
    out
  }

  /** §8.5.13.1 normAdjust8x8(m, k): the 6×6 scale table (36 small spec
    * constants, shipped inline like [[normAdjust4x4]]) with the class
    * index k from [[v8Class]]. */
  private val normAdjust8x8: Array[Array[Int]] = Array(
    Array(20, 18, 32, 19, 25, 24),
    Array(22, 19, 35, 21, 28, 26),
    Array(26, 23, 42, 24, 33, 31),
    Array(28, 25, 45, 26, 35, 33),
    Array(32, 28, 51, 30, 40, 38),
    Array(36, 32, 58, 34, 46, 43))

  /** §8.5.13.1's position-class pattern over (i%4, j%4). */
  private val v8ClassPattern: Array[Int] = Array(
    0, 3, 4, 3, 3, 1, 5, 1, 4, 5, 2, 5, 3, 1, 5, 1)

  @inline private def v8Class(i: Int, j: Int): Int =
    v8ClassPattern(4 * (i % 4) + (j % 4))

  /** §8.5.13.1 8x8 AC scaling (flat weightScale 16): the two-branch
    * spec formula — rounding term below qp 36, left shift above.
    * LevelScale8x8(m, i, j) = weightScale(i, j) · normAdjust8x8(m, …)
    * — the ×16 does NOT cancel against the 8x8 shifts the way the 4x4
    * path's ×16 cancels the −4 shift (round-17 fix: the first cut
    * dropped it, dequantizing every 8x8 residual 16× too small — at
    * qp 0 a level of 1 scaled to 0. Self-pinned: the fixture encoder,
    * the cross-coder test, and the gate oracle all shared the
    * convention, so only an energy audit against the 4x4 path could
    * see it; the oracle was corrected WITH this fix). */
  @inline private[graft] def scaleAc8x8(c: Int, qp: Int, i: Int, j: Int): Int = {
    val ls = 16 * normAdjust8x8(qp % 6)(v8Class(i, j))
    if (qp >= 36) (c * ls) << (qp / 6 - 6)
    else (c * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }

  /** §8.5.13.1 8x8 AC scaling under a stream-carried 64-entry raster
    * weight matrix (round 17). */
  @inline private[graft] def scaleAc8x8W(c: Int, qp: Int, i: Int, j: Int,
                                         w: Array[Int]): Int = {
    val ls = w(8 * i + j) * normAdjust8x8(qp % 6)(v8Class(i, j))
    if (qp >= 36) (c * ls) << (qp / 6 - 6)
    else (c * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }

  /** §8.5.13.2 inverse 8x8 transform: 64 scaled coefficients (raster)
    * → 64 residual samples, final (x + 32) >> 6. Two passes of the
    * integer butterfly (rows then columns). */
  private[graft] def inverseTransform8x8(d: Array[Int]): Array[Int] = {
    val h = new Array[Int](64)
    @inline def butterfly(in: Int => Int, out: (Int, Int) => Unit): Unit = {
      val e0 = in(0) + in(4)
      val e2 = in(0) - in(4)
      val e4 = (in(2) >> 1) - in(6)
      val e6 = in(2) + (in(6) >> 1)
      val b0 = e0 + e6; val b2 = e2 + e4
      val b4 = e2 - e4; val b6 = e0 - e6
      val e1 = -in(3) + in(5) - in(7) - (in(7) >> 1)
      val e3 = in(1) + in(7) - in(3) - (in(3) >> 1)
      val e5 = -in(1) + in(7) + in(5) + (in(5) >> 1)
      val e7 = in(3) + in(5) + in(1) + (in(1) >> 1)
      val b1 = e1 + (e7 >> 2); val b7 = e7 - (e1 >> 2)
      val b3 = e3 + (e5 >> 2); val b5 = (e3 >> 2) - e5
      out(0, b0 + b7); out(7, b0 - b7)
      out(1, b2 + b5); out(6, b2 - b5)
      out(2, b4 + b3); out(5, b4 - b3)
      out(3, b6 + b1); out(4, b6 - b1)
    }
    var j = 0
    while (j < 8) { // horizontal (rows)
      val row = j
      butterfly(i => d(8 * row + i), (i, v) => h(8 * row + i) = v)
      j += 1
    }
    val out = new Array[Int](64)
    var i = 0
    while (i < 8) { // vertical (columns)
      val col = i
      butterfly(y => h(8 * y + col), (y, v) => out(8 * y + col) = (v + 32) >> 6)
      i += 1
    }
    out
  }

  /** §8.3.2 Intra_8x8 prediction, all nine modes, INCLUDING the
    * §8.3.2.2.1 reference-sample filtering that distinguishes the 8x8
    * modes from their 4x4 twins: one 8x8 block at GLOBAL 8x8-grid
    * coords (GX, GY) over the reconstructed luma plane. Availability
    * follows decoding order (the caller's predicates); p[x,−1] for
    * x = 8..15 substitutes p[7,−1] when the top-right block is
    * unavailable and the top row is available, BEFORE filtering, per
    * the spec's substitution-then-filter order. Returns 64 samples,
    * 8x8 raster. */
  private[graft] def predictIntra8x8(mode: Int, plane: Array[Int], w: Int,
                                     gx8: Int, gy8: Int, hasLeft: Boolean,
                                     hasTop: Boolean, hasCorner: Boolean,
                                     hasTopRight: Boolean): Array[Int] = {
    val x0 = 8 * gx8; val y0 = 8 * gy8
    // ---- raw references (substitution for x = 8..15) ----
    @inline def rawT(x: Int): Int =
      if (x <= 7 || hasTopRight) plane((y0 - 1) * w + x0 + x)
      else plane((y0 - 1) * w + x0 + 7)
    @inline def rawL(y: Int): Int = plane((y0 + y) * w + x0 - 1)
    @inline def rawC: Int = plane((y0 - 1) * w + x0 - 1)
    // ---- §8.3.2.2.1 filtered references ----
    val fT = new Array[Int](16) // p'[0..15, -1]
    if (hasTop) {
      fT(0) =
        if (hasCorner) (rawC + 2 * rawT(0) + rawT(1) + 2) >> 2
        else (3 * rawT(0) + rawT(1) + 2) >> 2
      var x = 1
      while (x < 15) { fT(x) = (rawT(x - 1) + 2 * rawT(x) + rawT(x + 1) + 2) >> 2; x += 1 }
      fT(15) = (rawT(14) + 3 * rawT(15) + 2) >> 2
    }
    val fL = new Array[Int](8) // p'[-1, 0..7]
    if (hasLeft) {
      fL(0) =
        if (hasCorner) (rawC + 2 * rawL(0) + rawL(1) + 2) >> 2
        else (3 * rawL(0) + rawL(1) + 2) >> 2
      var y = 1
      while (y < 7) { fL(y) = (rawL(y - 1) + 2 * rawL(y) + rawL(y + 1) + 2) >> 2; y += 1 }
      fL(7) = (rawL(6) + 3 * rawL(7) + 2) >> 2
    }
    val fC = // p'[-1, -1]
      if (!hasCorner) 0
      else if (hasTop && hasLeft) (rawT(0) + 2 * rawC + rawL(0) + 2) >> 2
      else if (hasTop) (3 * rawC + rawT(0) + 2) >> 2
      else if (hasLeft) (3 * rawC + rawL(0) + 2) >> 2
      else rawC
    val out = new Array[Int](64)
    @inline def set(x: Int, y: Int, v: Int): Unit = out(8 * y + x) = v
    mode match {
      case 0 => // Vertical
        require(hasTop, "Intra_8x8_Vertical needs the top row")
        for (y <- 0 until 8; x <- 0 until 8) set(x, y, fT(x))
      case 1 => // Horizontal
        require(hasLeft, "Intra_8x8_Horizontal needs the left column")
        for (y <- 0 until 8; x <- 0 until 8) set(x, y, fL(y))
      case 2 => // DC with fallbacks (§8.3.2.2.4)
        val dc =
          if (hasLeft && hasTop)
            ((0 until 8).map(fT(_)).sum + (0 until 8).map(fL(_)).sum + 8) >> 4
          else if (hasLeft) ((0 until 8).map(fL(_)).sum + 4) >> 3
          else if (hasTop) ((0 until 8).map(fT(_)).sum + 4) >> 3
          else 128
        java.util.Arrays.fill(out, dc)
      case 3 => // Diagonal_Down_Left
        require(hasTop, "Intra_8x8_Diagonal_Down_Left needs the top row")
        for (y <- 0 until 8; x <- 0 until 8)
          set(x, y,
            if (x == 7 && y == 7) (fT(14) + 3 * fT(15) + 2) >> 2
            else (fT(x + y) + 2 * fT(x + y + 1) + fT(x + y + 2) + 2) >> 2)
      case 4 => // Diagonal_Down_Right
        require(hasLeft && hasTop && hasCorner,
          "Intra_8x8_Diagonal_Down_Right needs left, top and corner")
        // index -1 (at |x-y| = 1) is the filtered corner
        for (y <- 0 until 8; x <- 0 until 8) {
          @inline def t(i: Int): Int = if (i == -1) fC else fT(i)
          @inline def l(i: Int): Int = if (i == -1) fC else fL(i)
          set(x, y,
            if (x > y) (t(x - y - 2) + 2 * t(x - y - 1) + t(x - y) + 2) >> 2
            else if (x < y) (l(y - x - 2) + 2 * l(y - x - 1) + l(y - x) + 2) >> 2
            else (fT(0) + 2 * fC + fL(0) + 2) >> 2)
        }
      case 5 => // Vertical_Right
        require(hasLeft && hasTop && hasCorner,
          "Intra_8x8_Vertical_Right needs left, top and corner")
        for (y <- 0 until 8; x <- 0 until 8) {
          val zVR = 2 * x - y
          @inline def t(i: Int): Int = if (i == -1) fC else fT(i)
          set(x, y,
            if (zVR >= 0 && zVR % 2 == 0)
              (t(x - (y >> 1) - 1) + t(x - (y >> 1)) + 1) >> 1
            else if (zVR >= 1)
              (t(x - (y >> 1) - 2) + 2 * t(x - (y >> 1) - 1) + t(x - (y >> 1)) + 2) >> 2
            else if (zVR == -1) (fL(0) + 2 * fC + fT(0) + 2) >> 2
            else { // zVR <= -2; index -1 (at zVR = -2) is the corner
              @inline def l(i: Int): Int = if (i == -1) fC else fL(i)
              (l(y - 2 * x - 1) + 2 * l(y - 2 * x - 2) + l(y - 2 * x - 3) + 2) >> 2
            })
        }
      case 6 => // Horizontal_Down
        require(hasLeft && hasTop && hasCorner,
          "Intra_8x8_Horizontal_Down needs left, top and corner")
        for (y <- 0 until 8; x <- 0 until 8) {
          val zHD = 2 * y - x
          @inline def l(i: Int): Int = if (i == -1) fC else fL(i)
          set(x, y,
            if (zHD >= 0 && zHD % 2 == 0)
              (l(y - (x >> 1) - 1) + l(y - (x >> 1)) + 1) >> 1
            else if (zHD >= 1)
              (l(y - (x >> 1) - 2) + 2 * l(y - (x >> 1) - 1) + l(y - (x >> 1)) + 2) >> 2
            else if (zHD == -1) (fL(0) + 2 * fC + fT(0) + 2) >> 2
            else { // zHD <= -2; index -1 (at zHD = -2) is the corner
              @inline def t(i: Int): Int = if (i == -1) fC else fT(i)
              (t(x - 2 * y - 1) + 2 * t(x - 2 * y - 2) + t(x - 2 * y - 3) + 2) >> 2
            })
        }
      case 7 => // Vertical_Left
        require(hasTop, "Intra_8x8_Vertical_Left needs the top row")
        for (y <- 0 until 8; x <- 0 until 8)
          set(x, y,
            if (y % 2 == 0) (fT(x + (y >> 1)) + fT(x + (y >> 1) + 1) + 1) >> 1
            else (fT(x + (y >> 1)) + 2 * fT(x + (y >> 1) + 1) + fT(x + (y >> 1) + 2) + 2) >> 2)
      case 8 => // Horizontal_Up
        require(hasLeft, "Intra_8x8_Horizontal_Up needs the left column")
        for (y <- 0 until 8; x <- 0 until 8) {
          val zHU = x + 2 * y
          set(x, y,
            if (zHU > 13) fL(7)
            else if (zHU == 13) (fL(6) + 3 * fL(7) + 2) >> 2
            else if (zHU % 2 == 0) (fL(y + (x >> 1)) + fL(y + (x >> 1) + 1) + 1) >> 1
            else (fL(y + (x >> 1)) + 2 * fL(y + (x >> 1) + 1) + fL(y + (x >> 1) + 2) + 2) >> 2)
        }
      case other =>
        throw new IllegalArgumentException(s"Intra8x8PredMode $other")
    }
    out
  }

  /** Table 9-4's me(v) mapping for Intra_4x4 coded_block_pattern
    * (ChromaArrayType 1): codeNum → cbp. 48 small integers, shipped
    * inline like [[normAdjust4x4]]/[[chromaQpTable]] — a mapping
    * permutation verifiable by inspection against the spec table, not
    * a VLC codebook (round 16, the I_NxN rung). */
  private[graft] val golombToIntra4x4Cbp: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  private[graft] val intra4x4CbpToGolomb: Array[Int] = {
    val inv = new Array[Int](48)
    golombToIntra4x4Cbp.zipWithIndex.foreach { case (cbp, code) => inv(cbp) = code }
    inv
  }

  /** §8.5.8's chroma QP mapping for qPI ≥ 30 (22 small integers,
    * shipped inline like [[normAdjust4x4]]); below 30, QPC = qPI. */
  private[graft] val chromaQpTable: Array[Int] = Array(
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
    36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39)

  private[graft] def chromaQp(qpY: Int, offset: Int): Int = {
    val qPI = math.max(0, math.min(51, qpY + offset))
    if (qPI < 30) qPI else chromaQpTable(qPI - 30)
  }

  /** §8.5.11 chroma DC: 2x2 Hadamard (raster c00 c01 c10 c11) then
    * flat-list scaling d = ((f · 16·normAdjust(qPC%6, 0)) << (qPC/6))
    * >> 5 — exact integers. */
  private[graft] def chromaDcTransform(c: Array[Int], qpc: Int,
                                       w00: Int = 16): Array[Int] = {
    val f = Array(
      c(0) + c(1) + c(2) + c(3),
      c(0) - c(1) + c(2) - c(3),
      c(0) + c(1) - c(2) - c(3),
      c(0) - c(1) - c(2) + c(3))
    val ls = w00 * normAdjust4x4(qpc % 6)(0)
    f.map(v => ((v * ls) << (qpc / 6)) >> 5)
  }

  // -------------------------------------------------------------------
  // Intra_16x16 prediction (§8.3.3)
  // -------------------------------------------------------------------

  @inline private def clip255(v: Int): Int = math.max(0, math.min(255, v))

  /** §8.3.4 intra chroma prediction for one 8x8 component plane
    * (mode 0 DC — per-4x4-block neighbor rules — 1 Horizontal,
    * 2 Vertical, 3 Plane). `plane` is the component's reconstructed
    * w/2-wide plane; availability follows raster decode order. */
  private[graft] def predictChroma8x8(mode: Int, plane: Array[Int], w: Int,
                                      mbx: Int, mby: Int,
                                      leftInSlice: Boolean = true,
                                      topInSlice: Boolean = true): Array[Int] = {
    val x0 = 8 * mbx; val y0 = 8 * mby
    // round 17 (multi-slice): a neighbor MB in another slice is
    // UNAVAILABLE for intra prediction (§8.3's availability is
    // slice-bound), exactly like the picture edge
    val hasLeft = mbx > 0 && leftInSlice
    val hasTop = mby > 0 && topInSlice
    @inline def top(x: Int): Int = plane((y0 - 1) * w + x0 + x)
    @inline def left(y: Int): Int = plane((y0 + y) * w + x0 - 1)
    val out = new Array[Int](64)
    mode match {
      case 0 => // DC, per 4x4 sub-block (§8.3.4.1)
        for (by <- 0 until 2; bx <- 0 until 2) {
          val ts = if (hasTop) (4 * bx until 4 * bx + 4).map(top).sum else 0
          val ls = if (hasLeft) (4 * by until 4 * by + 4).map(left).sum else 0
          val dc = (bx, by) match {
            case (0, 0) =>
              if (hasLeft && hasTop) (ts + ls + 4) >> 3
              else if (hasLeft) (ls + 2) >> 2
              else if (hasTop) (ts + 2) >> 2
              else 128
            case (1, 0) =>
              if (hasTop) (ts + 2) >> 2
              else if (hasLeft) (ls + 2) >> 2
              else 128
            case (0, 1) =>
              if (hasLeft) (ls + 2) >> 2
              else if (hasTop) (ts + 2) >> 2
              else 128
            case _ =>
              if (hasLeft && hasTop) (ts + ls + 4) >> 3
              else if (hasLeft) (ls + 2) >> 2
              else if (hasTop) (ts + 2) >> 2
              else 128
          }
          for (y <- 4 * by until 4 * by + 4; x <- 4 * bx until 4 * bx + 4)
            out(8 * y + x) = dc
        }
      case 1 => // Horizontal
        require(hasLeft, "chroma Horizontal needs the left neighbor")
        for (y <- 0 until 8) { val v = left(y); for (x <- 0 until 8) out(8 * y + x) = v }
      case 2 => // Vertical
        require(hasTop, "chroma Vertical needs the top neighbor")
        for (y <- 0 until 8; x <- 0 until 8) out(8 * y + x) = top(x)
      case 3 => // Plane
        require(hasLeft && hasTop, "chroma Plane needs left and top")
        @inline def p(x: Int, y: Int): Int =
          if (y == -1) plane((y0 - 1) * w + x0 + x)
          else plane((y0 + y) * w + x0 - 1)
        var hsum = 0; var vsum = 0
        var k = 0
        while (k < 4) {
          hsum += (k + 1) * (p(4 + k, -1) - (if (k == 3) p(-1, -1) else p(2 - k, -1)))
          vsum += (k + 1) * (p(-1, 4 + k) - (if (k == 3) p(-1, -1) else p(-1, 2 - k)))
          k += 1
        }
        val a = 16 * (p(-1, 7) + p(7, -1))
        val b = (17 * hsum + 16) >> 5
        val c = (17 * vsum + 16) >> 5
        for (y <- 0 until 8; x <- 0 until 8)
          out(8 * y + x) = clip255((a + b * (x - 3) + c * (y - 3) + 16) >> 5)
      case other =>
        throw new IllegalArgumentException(s"intra_chroma_pred_mode $other")
    }
    out
  }

  /** One MB's 16x16 luma prediction from the reconstructed `plane`
    * (width `w` pixels). Availability follows the raster decode order:
    * left iff mbx > 0, top iff mby > 0. Throws if `mode` needs an
    * unavailable neighbor (a conforming stream never codes that). */
  private[graft] def predictIntra16x16(mode: Int, plane: Array[Int], w: Int,
                                       mbx: Int, mby: Int,
                                       leftInSlice: Boolean = true,
                                       topInSlice: Boolean = true): Array[Int] = {
    val x0 = 16 * mbx; val y0 = 16 * mby
    // round 17 (multi-slice): slice-bound availability, like the edge
    val hasLeft = mbx > 0 && leftInSlice
    val hasTop = mby > 0 && topInSlice
    @inline def top(x: Int): Int = plane((y0 - 1) * w + x0 + x)
    @inline def left(y: Int): Int = plane((y0 + y) * w + x0 - 1)
    val out = new Array[Int](256)
    mode match {
      case 0 => // Vertical
        require(hasTop, "Intra_16x16_Vertical needs the top neighbor")
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) { out(16 * y + x) = top(x); x += 1 }; y += 1 }
      case 1 => // Horizontal
        require(hasLeft, "Intra_16x16_Horizontal needs the left neighbor")
        var y = 0
        while (y < 16) { val v = left(y); var x = 0; while (x < 16) { out(16 * y + x) = v; x += 1 }; y += 1 }
      case 2 => // DC
        val dc =
          if (hasLeft && hasTop)
            ((0 until 16).map(top).sum + (0 until 16).map(left).sum + 16) >> 5
          else if (hasLeft) ((0 until 16).map(left).sum + 8) >> 4
          else if (hasTop) ((0 until 16).map(top).sum + 8) >> 4
          else 128
        java.util.Arrays.fill(out, dc)
      case 3 => // Plane
        require(hasLeft && hasTop, "Intra_16x16_Plane needs left and top")
        @inline def p(x: Int, y: Int): Int = // §8.3.3.4's p[x, y] border
          if (y == -1) plane((y0 - 1) * w + x0 + x)
          else plane((y0 + y) * w + x0 - 1)
        var hsum = 0; var vsum = 0
        var k = 0
        while (k < 8) {
          hsum += (k + 1) * (p(8 + k, -1) - p(6 - k, -1))
          vsum += (k + 1) * (p(-1, 8 + k) - p(-1, 6 - k))
          k += 1
        }
        val a = 16 * (p(-1, 15) + p(15, -1))
        val b = (5 * hsum + 32) >> 6
        val c = (5 * vsum + 32) >> 6
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            out(16 * y + x) = clip255((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case other =>
        throw new IllegalArgumentException(s"Intra16x16PredMode $other")
    }
    out
  }

  /** §8.3.1.2 Intra_4x4 prediction, all nine modes (round 16 — the
    * I_NxN rung that real baseline I-frames mix with I_16x16): one 4x4
    * block at GLOBAL 4x4-grid coords (gx, gy) over the reconstructed
    * luma plane. Availability flags follow the decoding order (the
    * caller's done-grid): modes requiring an unavailable neighbor throw
    * (a conforming stream never codes them); the top-right samples
    * p[4..7, −1] substitute p[3, −1] when the top-right block is
    * undecoded/outside and the top row is available (§8.3.1.2's
    * substitution rule). Returns 16 samples, 4x4 raster. */
  private[graft] def predictIntra4x4(mode: Int, plane: Array[Int], w: Int,
                                     gx: Int, gy: Int, hasLeft: Boolean,
                                     hasTop: Boolean, hasCorner: Boolean,
                                     hasTopRight: Boolean): Array[Int] = {
    val x0 = 4 * gx; val y0 = 4 * gy
    // p(x, -1) for x in -1..7 and p(-1, y) for y in 0..3 (§8.3.1.2)
    @inline def pT(x: Int): Int =
      if (x <= 3 || hasTopRight) plane((y0 - 1) * w + x0 + x)
      else plane((y0 - 1) * w + x0 + 3) // substitution: p[3, -1]
    @inline def pL(y: Int): Int = plane((y0 + y) * w + x0 - 1)
    @inline def pC: Int = plane((y0 - 1) * w + x0 - 1) // p[-1, -1]
    val out = new Array[Int](16)
    @inline def set(x: Int, y: Int, v: Int): Unit = out(4 * y + x) = v
    mode match {
      case 0 => // Vertical
        require(hasTop, "Intra_4x4_Vertical needs the top row")
        for (y <- 0 until 4; x <- 0 until 4) set(x, y, pT(x))
      case 1 => // Horizontal
        require(hasLeft, "Intra_4x4_Horizontal needs the left column")
        for (y <- 0 until 4; x <- 0 until 4) set(x, y, pL(y))
      case 2 => // DC with the §8.3.1.2.3 fallbacks
        val dc =
          if (hasLeft && hasTop)
            ((0 until 4).map(pT).sum + (0 until 4).map(pL).sum + 4) >> 3
          else if (hasLeft) ((0 until 4).map(pL).sum + 2) >> 2
          else if (hasTop) ((0 until 4).map(pT).sum + 2) >> 2
          else 128
        java.util.Arrays.fill(out, dc)
      case 3 => // Diagonal_Down_Left
        require(hasTop, "Intra_4x4_Diagonal_Down_Left needs the top row")
        for (y <- 0 until 4; x <- 0 until 4)
          set(x, y,
            if (x == 3 && y == 3) (pT(6) + 3 * pT(7) + 2) >> 2
            else (pT(x + y) + 2 * pT(x + y + 1) + pT(x + y + 2) + 2) >> 2)
      case 4 => // Diagonal_Down_Right
        require(hasLeft && hasTop && hasCorner,
          "Intra_4x4_Diagonal_Down_Right needs left, top and corner")
        for (y <- 0 until 4; x <- 0 until 4)
          set(x, y,
            if (x > y) (pT(x - y - 2) + 2 * pT(x - y - 1) + pT(x - y) + 2) >> 2
            else if (x < y) (pL(y - x - 2) + 2 * pL(y - x - 1) + pL(y - x) + 2) >> 2
            else (pT(0) + 2 * pC + pL(0) + 2) >> 2)
      case 5 => // Vertical_Right
        require(hasLeft && hasTop && hasCorner,
          "Intra_4x4_Vertical_Right needs left, top and corner")
        for (y <- 0 until 4; x <- 0 until 4) {
          val zVR = 2 * x - y
          @inline def t(i: Int): Int = if (i == -1) pC else pT(i)
          set(x, y,
            if (zVR >= 0 && zVR % 2 == 0)
              (t(x - (y >> 1) - 1) + t(x - (y >> 1)) + 1) >> 1
            else if (zVR >= 1) // odd
              (t(x - (y >> 1) - 2) + 2 * t(x - (y >> 1) - 1) + t(x - (y >> 1)) + 2) >> 2
            else if (zVR == -1) (pL(0) + 2 * pC + pT(0) + 2) >> 2
            else (pL(y - 1) + 2 * pL(y - 2) + pL(y - 3) + 2) >> 2) // zVR -2/-3
        }
      case 6 => // Horizontal_Down
        require(hasLeft && hasTop && hasCorner,
          "Intra_4x4_Horizontal_Down needs left, top and corner")
        for (y <- 0 until 4; x <- 0 until 4) {
          val zHD = 2 * y - x
          @inline def l(i: Int): Int = if (i == -1) pC else pL(i)
          set(x, y,
            if (zHD >= 0 && zHD % 2 == 0)
              (l(y - (x >> 1) - 1) + l(y - (x >> 1)) + 1) >> 1
            else if (zHD >= 1) // odd
              (l(y - (x >> 1) - 2) + 2 * l(y - (x >> 1) - 1) + l(y - (x >> 1)) + 2) >> 2
            else if (zHD == -1) (pL(0) + 2 * pC + pT(0) + 2) >> 2
            else (pT(x - 1) + 2 * pT(x - 2) + pT(x - 3) + 2) >> 2) // zHD -2/-3
        }
      case 7 => // Vertical_Left
        require(hasTop, "Intra_4x4_Vertical_Left needs the top row")
        for (y <- 0 until 4; x <- 0 until 4)
          set(x, y,
            if (y % 2 == 0) (pT(x + (y >> 1)) + pT(x + (y >> 1) + 1) + 1) >> 1
            else (pT(x + (y >> 1)) + 2 * pT(x + (y >> 1) + 1) + pT(x + (y >> 1) + 2) + 2) >> 2)
      case 8 => // Horizontal_Up
        require(hasLeft, "Intra_4x4_Horizontal_Up needs the left column")
        for (y <- 0 until 4; x <- 0 until 4) {
          val zHU = x + 2 * y
          set(x, y,
            if (zHU > 5) pL(3)
            else if (zHU == 5) (pL(2) + 3 * pL(3) + 2) >> 2
            else if (zHU % 2 == 0) (pL(y + (x >> 1)) + pL(y + (x >> 1) + 1) + 1) >> 1
            else (pL(y + (x >> 1)) + 2 * pL(y + (x >> 1) + 1) + pL(y + (x >> 1) + 2) + 2) >> 2)
        }
      case other =>
        throw new IllegalArgumentException(s"Intra4x4PredMode $other")
    }
    out
  }

  // -------------------------------------------------------------------
  // Slice decode
  // -------------------------------------------------------------------

  /** One decoded intra macroblock's metadata. For Intra_16x16 MBs
    * `predMode` is the §8.3.3 mode and `modes4x4` is empty; for
    * Intra_4x4 MBs (round 16) `predMode` = −1 and `modes4x4` holds the
    * sixteen §8.3.1.2 modes in luma4x4BlkIdx order. */
  final case class I16Mb(predMode: Int, cbpChroma: Int, cbpLuma: Int,
                         chromaPredMode: Int, qp: Int,
                         modes4x4: Array[Int] = Array.empty,
                         modes8x8: Array[Int] = Array.empty) {
    def isI4x4: Boolean = modes4x4.nonEmpty
    def isI8x8: Boolean = modes8x8.nonEmpty
  }

  /** Decoded single-slice all-Intra_16x16 picture: the LUMA plane
    * (width·height, row-major, 0..255) and — late round 15 — the two
    * CHROMA planes (width/2 · height/2 each, 4:2:0): §8.3.4 intra
    * chroma prediction + the §8.5.11 chroma DC/AC residual path for
    * coded_block_pattern chroma 0/1/2. */
  final case class I16Picture(sliceType: Int, ppsId: Int, frameNum: Int,
                              idrPicId: Int, pocLsb: Int, sliceQp: Int,
                              widthMbs: Int, heightMbs: Int,
                              mbs: Seq[I16Mb], luma: Array[Int],
                              cb: Array[Int] = Array.empty,
                              cr: Array[Int] = Array.empty)

  /** §6.4.3 luma4x4BlkIdx → (bx4, by4) inside the MB. */
  @inline private[multimodal] def blkX(idx: Int): Int = 2 * ((idx / 4) % 2) + (idx % 4) % 2
  @inline private[multimodal] def blkY(idx: Int): Int = 2 * ((idx / 4) / 2) + (idx % 4) / 2

  // -------------------------------------------------------------------
  // Shared §8.x reconstruction (entropy-free — round 16: the CABAC
  // parser feeds the same backend, so both entropy coders provably
  // reconstruct through identical code)
  // -------------------------------------------------------------------

  /** Chroma half of one intra MB: §8.3.4 prediction + the §8.5.11
    * DC-Hadamard/AC residual under the mapped QPC. */
  private[multimodal] def reconstructChroma(cb: Array[Int], cr: Array[Int],
      wc: Int, mbx: Int, mby: Int, cbpChroma: Int, chromaPredMode: Int,
      qp: Int, chromaQpOffset: Int, chromaQpOffsetCr: Int,
      chDcScan: Array[Array[Int]],
      chAcScan: Array[Array[Array[Int]]],
      leftInSlice: Boolean = true, topInSlice: Boolean = true,
      scaling: Option[H264.ScalingLists] = None): Unit = {
    var comp = 0
    while (comp < 2) {
      // per-component QPC (round 16): Cr takes the PPS extension's
      // second_chroma_qp_index_offset when present (§8.5.8)
      val qpc = chromaQp(qp, if (comp == 0) chromaQpOffset else chromaQpOffsetCr)
      // round 17: the per-component intra chroma weight matrix
      val wC = scaling.map(s => if (comp == 0) s.w4Cb else s.w4Cr).orNull
      val plane = if (comp == 0) cb else cr
      val pred = predictChroma8x8(chromaPredMode, plane, wc, mbx, mby,
        leftInSlice, topInSlice)
      val dcC =
        if (cbpChroma >= 1)
          chromaDcTransform(chDcScan(comp), qpc, if (wC == null) 16 else wC(0))
        else new Array[Int](4)
      var cblk = 0
      while (cblk < 4) {
        val bx = cblk % 2; val by = cblk / 2
        val d = new Array[Int](16)
        d(0) = dcC(cblk) // 2x2 DC raster matches the cblk raster
        var p = 1
        while (p < 16) {
          val ri = zigZag4x4(p)
          val c = chAcScan(comp)(cblk)(p - 1)
          if (c != 0) d(ri) =
            if (wC == null) scaleAc(c, qpc, ri / 4, ri % 4)
            else scaleAcW(c, qpc, ri / 4, ri % 4, wC)
          p += 1
        }
        val res = inverseTransform4x4(d)
        var yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) {
            val px = 8 * mbx + 4 * bx + xx
            val py = 8 * mby + 4 * by + yy
            plane(py * wc + px) =
              clip255(pred(8 * (4 * by + yy) + 4 * bx + xx) + res(4 * yy + xx))
            xx += 1
          }
          yy += 1
        }
        cblk += 1
      }
      comp += 1
    }
  }

  /** Full YCbCr reconstruction of one Intra_16x16 MB from its scan
    * levels (DC Hadamard, AC scaling, inverse core transform, §8.3.3
    * prediction); marks the MB's 4x4s in `done`. */
  private[multimodal] def reconstructI16(luma: Array[Int], cb: Array[Int],
      cr: Array[Int], w: Int, wc: Int, mbx: Int, mby: Int, predMode: Int,
      chromaPredMode: Int, qp: Int, chromaQpOffset: Int, chromaQpOffsetCr: Int,
      cbpChroma: Int,
      dcScan: Array[Int], acScan: Array[Array[Int]],
      chDcScan: Array[Array[Int]], chAcScan: Array[Array[Array[Int]]],
      done: Array[Array[Boolean]],
      leftInSlice: Boolean = true, topInSlice: Boolean = true,
      scaling: Option[H264.ScalingLists] = None): Unit = {
    val wY = scaling.map(_.w4Y).orNull // round 17: intra luma weights
    // DC: zig-zag → 4x4 raster → inverse Hadamard → scale
    val dcRaster = new Array[Int](16)
    var k = 0
    while (k < 16) { dcRaster(zigZag4x4(k)) = dcScan(k); k += 1 }
    val f = inverseHadamard4x4(dcRaster)
    val dc = f.map(scaleLumaDcW(_, qp, if (wY == null) 16 else wY(0)))
    val pred = predictIntra16x16(predMode, luma, w, mbx, mby,
      leftInSlice, topInSlice)
    var blk = 0
    while (blk < 16) {
      val bx = blkX(blk); val by = blkY(blk)
      val d = new Array[Int](16)
      // raster index of this 4x4 inside the DC grid is (by, bx)
      d(0) = dc(4 * by + bx)
      var p = 1
      while (p < 16) {
        val ri = zigZag4x4(p)
        val c = acScan(blk)(p - 1)
        if (c != 0) d(ri) =
          if (wY == null) scaleAc(c, qp, ri / 4, ri % 4)
          else scaleAcW(c, qp, ri / 4, ri % 4, wY)
        p += 1
      }
      val res = inverseTransform4x4(d)
      var yy = 0
      while (yy < 4) {
        var xx = 0
        while (xx < 4) {
          val px = 16 * mbx + 4 * bx + xx
          val py = 16 * mby + 4 * by + yy
          luma(py * w + px) = clip255(pred(16 * (4 * by + yy) + 4 * bx + xx) + res(4 * yy + xx))
          xx += 1
        }
        yy += 1
      }
      done(4 * mby + by)(4 * mbx + bx) = true
      blk += 1
    }
    reconstructChroma(cb, cr, wc, mbx, mby, cbpChroma, chromaPredMode, qp,
      chromaQpOffset, chromaQpOffsetCr, chDcScan, chAcScan,
      leftInSlice, topInSlice, scaling)
  }

  /** Full YCbCr reconstruction of one Intra_4x4 MB: per-block §8.3.1.2
    * prediction over the decode-order `done` grid, 16-coefficient
    * dequant (the 4x4's own DC at scan position 0), inverse core
    * transform, blkIdx reconstruction order. */
  private[multimodal] def reconstructI4x4(luma: Array[Int], cb: Array[Int],
      cr: Array[Int], w: Int, wc: Int, wMbs: Int, mbx: Int, mby: Int,
      modes: Array[Int], chromaPredMode: Int, qp: Int, chromaQpOffset: Int,
      chromaQpOffsetCr: Int, cbpChroma: Int, lumaScan: Array[Array[Int]],
      chDcScan: Array[Array[Int]], chAcScan: Array[Array[Array[Int]]],
      done: Array[Array[Boolean]],
      leftInSlice: Boolean = true, topInSlice: Boolean = true,
      scaling: Option[H264.ScalingLists] = None): Unit = {
    val wY = scaling.map(_.w4Y).orNull // round 17: intra luma weights
    var blk = 0
    while (blk < 16) {
      val bx = blkX(blk); val by = blkY(blk)
      val gx = 4 * mbx + bx; val gy = 4 * mby + by
      val hasLeft = gx > 0 && done(gy)(gx - 1)
      val hasTop = gy > 0 && done(gy - 1)(gx)
      val hasCorner = gx > 0 && gy > 0 && done(gy - 1)(gx - 1)
      val hasTR = gy > 0 && gx + 1 < 4 * wMbs && done(gy - 1)(gx + 1)
      val pred = predictIntra4x4(modes(blk), luma, w, gx, gy,
        hasLeft, hasTop, hasCorner, hasTR)
      val d = new Array[Int](16)
      var p = 0
      while (p < 16) {
        val ri = zigZag4x4(p)
        val c = lumaScan(blk)(p)
        if (c != 0) d(ri) =
          if (wY == null) scaleAc(c, qp, ri / 4, ri % 4)
          else scaleAcW(c, qp, ri / 4, ri % 4, wY)
        p += 1
      }
      val res = inverseTransform4x4(d)
      var yy = 0
      while (yy < 4) {
        var xx = 0
        while (xx < 4) {
          val px = 4 * gx + xx; val py = 4 * gy + yy
          luma(py * w + px) = clip255(pred(4 * yy + xx) + res(4 * yy + xx))
          xx += 1
        }
        yy += 1
      }
      done(gy)(gx) = true
      blk += 1
    }
    reconstructChroma(cb, cr, wc, mbx, mby, cbpChroma, chromaPredMode, qp,
      chromaQpOffset, chromaQpOffsetCr, chDcScan, chAcScan,
      leftInSlice, topInSlice, scaling)
  }

  /** §8.3.2 + §8.5.13 Intra_8x8 macroblock reconstruction (round 17):
    * four 8x8 blocks in luma8x8BlkIdx raster order, each predicted
    * from FILTERED references, dequantized through normAdjust8x8 and
    * inverse-transformed with the 8-point butterfly. `lumaScan64` is
    * 4 × 64 levels in 8x8 zig-zag scan order. Marks all four covered
    * 4x4 `done` cells per block (decode-order availability for later
    * 4x4 AND 8x8 neighbors is the same grid). */
  private[multimodal] def reconstructI8x8(luma: Array[Int], cb: Array[Int],
      cr: Array[Int], w: Int, wc: Int, wMbs: Int, mbx: Int, mby: Int,
      modes: Array[Int], chromaPredMode: Int, qp: Int, chromaQpOffset: Int,
      chromaQpOffsetCr: Int, cbpChroma: Int, lumaScan64: Array[Array[Int]],
      chDcScan: Array[Array[Int]], chAcScan: Array[Array[Array[Int]]],
      done: Array[Array[Boolean]],
      leftInSlice: Boolean = true, topInSlice: Boolean = true,
      scaling: Option[H264.ScalingLists] = None): Unit = {
    // round 17: a scaling PPS with transform8x8 always carries the 8x8
    // intra list (the parse rejects otherwise)
    val w8 = scaling.map(_.w8Y.get).orNull
    var b = 0
    while (b < 4) {
      val bx = b % 2; val by = b / 2
      val gx8 = 2 * mbx + bx; val gy8 = 2 * mby + by
      val gx4 = 2 * gx8; val gy4 = 2 * gy8
      val hasLeft = gx4 > 0 && done(gy4)(gx4 - 1)
      val hasTop = gy4 > 0 && done(gy4 - 1)(gx4)
      val hasCorner = gx4 > 0 && gy4 > 0 && done(gy4 - 1)(gx4 - 1)
      val hasTR = gy4 > 0 && gx4 + 2 < 4 * wMbs && done(gy4 - 1)(gx4 + 2)
      val pred = predictIntra8x8(modes(b), luma, w, gx8, gy8,
        hasLeft, hasTop, hasCorner, hasTR)
      val d = new Array[Int](64)
      var p = 0
      while (p < 64) {
        val c = lumaScan64(b)(p)
        if (c != 0) {
          val ri = zigZag8x8(p)
          d(ri) =
            if (w8 == null) scaleAc8x8(c, qp, ri / 8, ri % 8)
            else scaleAc8x8W(c, qp, ri / 8, ri % 8, w8)
        }
        p += 1
      }
      val res = inverseTransform8x8(d)
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          val px = 8 * gx8 + xx; val py = 8 * gy8 + yy
          luma(py * w + px) = clip255(pred(8 * yy + xx) + res(8 * yy + xx))
          xx += 1
        }
        yy += 1
      }
      done(gy4)(gx4) = true; done(gy4)(gx4 + 1) = true
      done(gy4 + 1)(gx4) = true; done(gy4 + 1)(gx4 + 1) = true
      b += 1
    }
    reconstructChroma(cb, cr, wc, mbx, mby, cbpChroma, chromaPredMode, qp,
      chromaQpOffset, chromaQpOffsetCr, chDcScan, chAcScan,
      leftInSlice, topInSlice, scaling)
  }

  /** Parse a slice NAL's RBSP as a single-slice all-INTRA CAVLC picture
    * under the given SPS/PPS and CALLER-SUPPLIED [[CavlcTables]]:
    * macroblocks may mix Intra_16x16 (mb_type 1..24), Intra_4x4
    * (round 16 — mb_type 0: per-block §8.3.1.1 mode signalling, Table
    * 9-4 me(v) CBP, conditional mb_qp_delta, 16-coefficient residual
    * blocks, and the nine §8.3.1.2 prediction modes over the
    * decode-order availability grid) and — round 17 — Intra_8x8
    * (mb_type 0 + transform_size_8x8_flag under a transform-8x8 PPS:
    * four §8.3.2 modes over FILTERED references, the §8.5.13.1
    * four-4x4 CAVLC interleave, normAdjust8x8 dequant and the 8-point
    * butterfly). Strict → None on: CABAC, non-I slices,
    * multi-slice-group, chroma formats ≠ 4:2:0/8-bit, field coding,
    * mb_type 25 (I_PCM — its own parser in [[H264]]), prediction modes
    * whose neighbors are unavailable, malformed VLC walks, or trailing
    * bits. pic_scaling_matrix stays a named reject at [[H264.parsePps]]
    * (flat-16 lists only). The doc above describes the shared slice
    * walk; [[parseI16x16Slice]] is the single-slice entry (the one
    * slice must cover the whole picture) and [[parseI16x16Picture]]
    * the multi-slice one. */
  /** One I-slice header's decoded fields (§7.3.3 within the supported
    * scope) — round 17, the multi-slice seam. */
  private[graft] final case class SliceHeaderI(
    firstMb: Int, sliceType: Int, frameNum: Int, idrPicId: Int,
    pocLsb: Int, sliceQp: Int)

  /** Parse one I-slice header off `r` (shared by CAVLC and CABAC —
    * the header is entropy-coder-independent). None on out-of-scope
    * or malformed fields; first_mb_in_slice is RETURNED, the caller
    * enforces coverage. */
  private[graft] def parseSliceHeaderI(r: BitReader, sps: H264.Sps,
      pps: H264.Pps, nalRefIdc: Int, nalType: Int): Option[SliceHeaderI] = try {
    val firstMb = r.ue()
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
      if (pps.bottomFieldPocPresent) r.se()
    }
    else if (sps.pocType != 2) return None
    if (pps.redundantPresent && r.ue() != 0) return None
    if (nalRefIdc != 0) {
      if (idr) { r.u(1); r.u(1) }
      else if (r.u(1) == 1) return None
    }
    val sliceQp = pps.picInitQp + r.se()
    require(sliceQp >= 0 && sliceQp <= 51, s"slice QP $sliceQp out of 0..51")
    if (pps.deblockingPresent) {
      val idc = r.ue()
      if (idc != 1) { r.se(); r.se() }
    }
    Some(SliceHeaderI(firstMb, sliceType, frameNum, idrPicId, pocLsb, sliceQp))
  } catch { case _: Exception => None }

  /** Accumulates one picture across its CAVLC slices (round 17 —
    * real encoders split pictures into slices for parallelism and
    * error resilience). Planes are picture-level; EVERY availability
    * surface is slice-bound per §8.3/§9.2.1: the nC/done/modeGrid
    * grids are allocated FRESH per slice, and MB-level neighbors gate
    * on `mbIndex >= firstMb` (slices cover contiguous raster ranges,
    * so same-slice ⇔ index ≥ the slice's first MB). */
  private final class CavlcPicture(sps: H264.Sps, pps: H264.Pps,
                                   tables: CavlcTables) {
    val wMbs = sps.picWidthInMbs; val hMbs = sps.picHeightInMapUnits
    private val w = 16 * wMbs; private val wc = 8 * wMbs
    private val luma = new Array[Int](w * 16 * hMbs)
    private val cb = new Array[Int](wc * 8 * hMbs)
    private val cr = new Array[Int](wc * 8 * hMbs)
    private val mbsOut = new ArrayBuffer[I16Mb](wMbs * hMbs)
    private var nextMb = 0
    private var meta: SliceHeaderI = null
    private var metaNalType = -1

    /** Decode one slice NAL's RBSP; false on any reject (including a
      * first_mb that is not exactly the next undecoded MB, or slice
      * headers disagreeing on the picture identity). */
    def decodeSlice(rbsp: Array[Byte], nalRefIdc: Int, nalType: Int): Boolean = {
      val r = new BitReader(rbsp)
      val h = parseSliceHeaderI(r, sps, pps, nalRefIdc, nalType)
        .getOrElse(return false)
      if (h.firstMb != nextMb || nextMb >= wMbs * hMbs) return false
      if (meta == null) { meta = h; metaNalType = nalType }
      else if (nalType != metaNalType || h.sliceType != meta.sliceType ||
        h.frameNum != meta.frameNum || h.idrPicId != meta.idrPicId ||
        h.pocLsb != meta.pocLsb) return false // one picture, one identity
      val firstMb = h.firstMb
      val sliceQp = h.sliceQp
      // ---- slice-local availability state (fresh per slice) ----
      // per-4x4 TotalCoeff grid for the §9.2.1 nC context; a neighbor
      // cell in another slice is UNAVAILABLE (None), not zero
      val nz = Array.fill(4 * hMbs, 4 * wMbs)(0)
      def nCOf(gx: Int, gy: Int): Int = {
        val a = if (gx > 0 && (gy >> 2) * wMbs + ((gx - 1) >> 2) >= firstMb)
          Some(nz(gy)(gx - 1)) else None
        val b = if (gy > 0 && ((gy - 1) >> 2) * wMbs + (gx >> 2) >= firstMb)
          Some(nz(gy - 1)(gx)) else None
        (a, b) match {
          case (Some(na), Some(nb)) => (na + nb + 1) >> 1
          case (Some(na), None) => na
          case (None, Some(nb)) => nb
          case (None, None) => 0
        }
      }
      // per-component chroma 4x4 TotalCoeff grids (2×2 blocks per MB)
      val nzC = Array.fill(2, 2 * hMbs, 2 * wMbs)(0)
      def nCOfC(comp: Int, gx: Int, gy: Int): Int = {
        val a = if (gx > 0 && (gy >> 1) * wMbs + ((gx - 1) >> 1) >= firstMb)
          Some(nzC(comp)(gy)(gx - 1)) else None
        val b = if (gy > 0 && ((gy - 1) >> 1) * wMbs + (gx >> 1) >= firstMb)
          Some(nzC(comp)(gy - 1)(gx)) else None
        (a, b) match {
          case (Some(na), Some(nb)) => (na + nb + 1) >> 1
          case (Some(na), None) => na
          case (None, Some(nb)) => nb
          case (None, None) => 0
        }
      }
      // round 16 (I_NxN): per-4x4 grids threading across macroblocks —
      // `done` marks luma 4x4s reconstructed IN THIS SLICE (§8.3.1.2
      // availability is slice-bound) and `modeGrid` holds each I4x4
      // block's prediction mode (−1 = not an I4x4 block of this slice,
      // which §8.3.1.1 infers as DC for the predictor)
      val done = Array.fill(4 * hMbs, 4 * wMbs)(false)
      val modeGrid = Array.fill(4 * hMbs, 4 * wMbs)(-1)
      val mbs = mbsOut
      var prevQp = sliceQp
      var mb = firstMb
      while (r.moreRbspData) {
      require(mb < wMbs * hMbs, "slice data past the last macroblock")
      val mbx = mb % wMbs; val mby = mb / wMbs
      val mbLeftIn = mbx > 0 && mb - 1 >= firstMb
      val mbTopIn = mby > 0 && mb - wMbs >= firstMb
      // shared chroma halves (§7.3.5.3 parse order and the §8.3.4 +
      // §8.5.11 reconstruction) — identical for I16 and I4x4 MBs
      def parseChroma(cbpChroma: Int): (Array[Array[Int]], Array[Array[Array[Int]]]) = {
        val chDcScan = Array.ofDim[Int](2, 4)
        val chAcScan = Array.ofDim[Int](2, 4, 15)
        if (cbpChroma >= 1) {
          var comp = 0
          while (comp < 2) {
            val (dcl, _) = residualBlock(r, -1, 4, tables) // 4:2:0 chroma DC
            chDcScan(comp) = dcl
            comp += 1
          }
        }
        var comp = 0
        while (comp < 2) {
          var cblk = 0
          while (cblk < 4) {
            val gx = 2 * mbx + cblk % 2; val gy = 2 * mby + cblk / 2
            if (cbpChroma == 2) {
              val (lv, tc) = residualBlock(r, nCOfC(comp, gx, gy), 15, tables)
              chAcScan(comp)(cblk) = lv
              nzC(comp)(gy)(gx) = tc
            } else nzC(comp)(gy)(gx) = 0
            cblk += 1
          }
          comp += 1
        }
        (chDcScan, chAcScan)
      }
      val mbType = r.ue()
      if (mbType == 0 && pps.transform8x8 && { val f = r.u(1); f == 1 }) {
        // ---- I_NxN + transform_size_8x8_flag = Intra_8x8 (round 17,
        // the High-profile I-frame rung) ----
        // mb_pred(): four §8.3.2.1 mode signals in luma8x8BlkIdx
        // order; the predictor reads the covering 4x4 cells (an 8x8
        // block stores its mode in all four, so mixed 4x4/8x8
        // neighborhoods resolve exactly as §8.3.2.1 specifies)
        val modes = new Array[Int](4)
        var b = 0
        while (b < 4) {
          val gx4 = 4 * mbx + 2 * (b % 2); val gy4 = 4 * mby + 2 * (b / 2)
          val a = if (gx4 == 0 || modeGrid(gy4)(gx4 - 1) < 0) 2 else modeGrid(gy4)(gx4 - 1)
          val bb = if (gy4 == 0 || modeGrid(gy4 - 1)(gx4) < 0) 2 else modeGrid(gy4 - 1)(gx4)
          val predicted = math.min(a, bb)
          val mode =
            if (r.u(1) == 1) predicted // prev_intra8x8_pred_mode_flag
            else {
              val rem = r.u(3)
              if (rem < predicted) rem else rem + 1
            }
          modes(b) = mode
          modeGrid(gy4)(gx4) = mode; modeGrid(gy4)(gx4 + 1) = mode
          modeGrid(gy4 + 1)(gx4) = mode; modeGrid(gy4 + 1)(gx4 + 1) = mode
          b += 1
        }
        val chromaPredMode = r.ue()
        require(chromaPredMode <= 3, s"intra_chroma_pred_mode $chromaPredMode")
        val cbpCode = r.ue()
        require(cbpCode < 48, s"coded_block_pattern codeNum $cbpCode")
        val cbp = golombToIntra4x4Cbp(cbpCode)
        val cbpLuma = cbp & 15
        val cbpChroma = cbp >> 4
        val qp =
          if (cbp != 0) {
            val qpDelta = r.se()
            require(qpDelta >= -26 && qpDelta <= 25, s"mb_qp_delta $qpDelta")
            (prevQp + qpDelta + 52) % 52
          } else prevQp
        prevQp = qp
        // luma residual (§8.5.13.1 CAVLC interleave): each coded 8x8
        // block arrives as FOUR 16-coefficient 4x4 CAVLC blocks; the
        // 4x4 block i's scan position k holds 8x8 scan position 4k+i.
        // nC and the TotalCoeff grid use the covering 4x4 cells.
        val lumaScan64 = Array.ofDim[Int](4, 64)
        b = 0
        while (b < 4) {
          if ((cbpLuma >> b & 1) != 0) {
            var i = 0
            while (i < 4) {
              val blk = 4 * b + i
              val gx = 4 * mbx + blkX(blk); val gy = 4 * mby + blkY(blk)
              val (lv, tc) = residualBlock(r, nCOf(gx, gy), 16, tables)
              var k = 0
              while (k < 16) { lumaScan64(b)(4 * k + i) = lv(k); k += 1 }
              nz(gy)(gx) = tc
              i += 1
            }
          } else {
            var i = 0
            while (i < 4) {
              val blk = 4 * b + i
              nz(4 * mby + blkY(blk))(4 * mbx + blkX(blk)) = 0
              i += 1
            }
          }
          b += 1
        }
        val (chDcScan, chAcScan) = parseChroma(cbpChroma)
        reconstructI8x8(luma, cb, cr, w, wc, wMbs, mbx, mby, modes,
          chromaPredMode, qp, pps.chromaQpOffset, pps.chromaQpOffsetCr,
          cbpChroma, lumaScan64, chDcScan, chAcScan, done, mbLeftIn, mbTopIn, pps.scaling)
        mbs += I16Mb(-1, cbpChroma, cbpLuma, chromaPredMode, qp,
          modes8x8 = modes)
      } else if (mbType == 0) {
        // ---- I_NxN = Intra_4x4 (round 16; the transform_size_8x8
        // flag, when the PPS carries it, was read above as 0) ----
        // mb_pred(): sixteen §8.3.1.1 mode signals in blkIdx order;
        // the predictor is min(modeA, modeB) with unavailable or
        // non-I4x4 neighbors inferred as 2 (DC)
        val modes = new Array[Int](16)
        var blk = 0
        while (blk < 16) {
          val gx = 4 * mbx + blkX(blk); val gy = 4 * mby + blkY(blk)
          val a = if (gx == 0 || modeGrid(gy)(gx - 1) < 0) 2 else modeGrid(gy)(gx - 1)
          val b = if (gy == 0 || modeGrid(gy - 1)(gx) < 0) 2 else modeGrid(gy - 1)(gx)
          val predicted = math.min(a, b)
          val mode =
            if (r.u(1) == 1) predicted // prev_intra4x4_pred_mode_flag
            else {
              val rem = r.u(3)
              if (rem < predicted) rem else rem + 1
            }
          modes(blk) = mode
          modeGrid(gy)(gx) = mode
          blk += 1
        }
        val chromaPredMode = r.ue()
        require(chromaPredMode <= 3, s"intra_chroma_pred_mode $chromaPredMode")
        // coded_block_pattern via me(v) + Table 9-4's intra mapping
        val cbpCode = r.ue()
        require(cbpCode < 48, s"coded_block_pattern codeNum $cbpCode")
        val cbp = golombToIntra4x4Cbp(cbpCode)
        val cbpLuma = cbp & 15
        val cbpChroma = cbp >> 4
        // mb_qp_delta only when any residual is coded (§7.3.5)
        val qp =
          if (cbp != 0) {
            val qpDelta = r.se()
            require(qpDelta >= -26 && qpDelta <= 25, s"mb_qp_delta $qpDelta")
            (prevQp + qpDelta + 52) % 52
          } else prevQp
        prevQp = qp
        // luma residual: 16-coefficient blocks (the 4x4's own DC is
        // scan position 0 — no separate DC transform), gated per-8x8
        // by the CBP luma bits
        val lumaScan = Array.ofDim[Int](16, 16)
        blk = 0
        while (blk < 16) {
          val gx = 4 * mbx + blkX(blk); val gy = 4 * mby + blkY(blk)
          if ((cbpLuma >> (blk / 4) & 1) != 0) {
            val (lv, tc) = residualBlock(r, nCOf(gx, gy), 16, tables)
            lumaScan(blk) = lv
            nz(gy)(gx) = tc
          } else nz(gy)(gx) = 0
          blk += 1
        }
        val (chDcScan, chAcScan) = parseChroma(cbpChroma)
        reconstructI4x4(luma, cb, cr, w, wc, wMbs, mbx, mby, modes,
          chromaPredMode, qp, pps.chromaQpOffset, pps.chromaQpOffsetCr,
          cbpChroma, lumaScan, chDcScan, chAcScan, done, mbLeftIn, mbTopIn, pps.scaling)
        mbs += I16Mb(-1, cbpChroma, cbpLuma, chromaPredMode, qp, modes)
      } else {
      require(mbType >= 1 && mbType <= 24,
        s"mb_type $mbType: only I_NxN/Intra_16x16 in scope") // 25 = I_PCM
      val predMode = (mbType - 1) % 4
      val cbpChroma = ((mbType - 1) / 4) % 3
      val cbpLuma = if (mbType - 1 >= 12) 15 else 0
      val chromaPredMode = r.ue()
      require(chromaPredMode <= 3, s"intra_chroma_pred_mode $chromaPredMode")
      val qpDelta = r.se()
      require(qpDelta >= -26 && qpDelta <= 25, s"mb_qp_delta $qpDelta")
      val qp = (prevQp + qpDelta + 52) % 52
      prevQp = qp
      // Intra16x16DCLevel: nC from luma4x4BlkIdx 0's neighbors
      val (dcScan, _) = residualBlock(r, nCOf(4 * mbx, 4 * mby), 16, tables)
      // AC blocks (15 coeffs each) when CBP luma = 15
      val acScan = Array.ofDim[Int](16, 15)
      var blk = 0
      while (blk < 16) {
        val gx = 4 * mbx + blkX(blk); val gy = 4 * mby + blkY(blk)
        if (cbpLuma == 15) {
          val (lv, tc) = residualBlock(r, nCOf(gx, gy), 15, tables)
          acScan(blk) = lv
          nz(gy)(gx) = tc
        } else nz(gy)(gx) = 0
        blk += 1
      }
      val (chDcScan, chAcScan) = parseChroma(cbpChroma)
      reconstructI16(luma, cb, cr, w, wc, mbx, mby, predMode,
        chromaPredMode, qp, pps.chromaQpOffset, pps.chromaQpOffsetCr,
        cbpChroma, dcScan, acScan, chDcScan, chAcScan, done, mbLeftIn, mbTopIn, pps.scaling)
      mbs += I16Mb(predMode, cbpChroma, cbpLuma, chromaPredMode, qp)
      }
      mb += 1
      }
      require(mb > firstMb, "slice with no macroblocks")
      require(r.u(1) == 1, "missing rbsp_stop_one_bit")
      while (!r.aligned) require(r.u(1) == 0, "nonzero rbsp_alignment_zero_bit")
      require(r.bitsLeft == 0, "trailing bytes after rbsp_trailing_bits")
      nextMb = mb
      true
    }

    /** The finished picture — None unless the slices covered every
      * macroblock exactly. Picture-level fields (sliceType, sliceQp)
      * are the FIRST slice's. */
    def result(): Option[I16Picture] = {
      if (meta == null || nextMb != wMbs * hMbs) return None
      Some(I16Picture(meta.sliceType, pps.ppsId, meta.frameNum,
        meta.idrPicId, meta.pocLsb, meta.sliceQp, wMbs, hMbs,
        mbsOut.toSeq, luma, cb, cr))
    }
  }

  /** Parse one picture from its CAVLC slice NALs, in decode order:
    * `slices` is (nal_ref_idc, nal_unit_type, RBSP) per slice. Slices
    * must tile the picture exactly (each first_mb_in_slice is the
    * next undecoded MB; the last slice ends at the last MB) and agree
    * on the picture identity (frame_num, idr_pic_id, POC lsb, NAL
    * type). All §8.3 intra prediction and §9.2.1 nC availability is
    * SLICE-bound — macroblocks of a previous slice are unavailable
    * neighbors, exactly like the picture edge. Everything else
    * (codec scope, strictness) matches [[parseI16x16Slice]]. */
  def parseI16x16Picture(slices: Seq[(Int, Int, Array[Byte])],
                         sps: H264.Sps, pps: H264.Pps,
                         tables: CavlcTables): Option[I16Picture] = try {
    if (slices.isEmpty) return None
    if (sps.chromaFormatIdc != 1 || sps.bitDepthLuma != 8) return None
    if (!sps.frameMbsOnly) return None
    if (pps.entropyCabac) return None
    if (pps.numSliceGroups != 1) return None
    // round 17: pps.transform8x8 decodes (transform_size_8x8_flag +
    // Intra_8x8); pic_scaling_matrix stays a named reject upstream
    val pic = new CavlcPicture(sps, pps, tables)
    slices.foreach { case (refIdc, nalType, rbsp) =>
      if (nalType != 1 && nalType != 5) return None
      if (!pic.decodeSlice(rbsp, refIdc, nalType)) return None
    }
    pic.result()
  } catch { case e: Exception => if (sys.props.contains("graft.h264.debug")) e.printStackTrace(); None }

  def parseI16x16Slice(rbsp: Array[Byte], sps: H264.Sps, pps: H264.Pps,
                       nalRefIdc: Int, nalType: Int,
                       tables: CavlcTables): Option[I16Picture] =
    parseI16x16Picture(Seq((nalRefIdc, nalType, rbsp)), sps, pps, tables)

  // -------------------------------------------------------------------
  // Fixture encoder
  // -------------------------------------------------------------------

  private[graft] final class BitWriter {
    private val bits = ArrayBuffer.empty[Boolean]
    def u(v: Int, n: Int): Unit = {
      require(v >= 0 && v < (1 << n), s"field value $v does not fit in $n bits")
      var i = n - 1
      while (i >= 0) { bits += ((v >> i) & 1) == 1; i -= 1 }
    }
    def ue(v: Int): Unit = {
      require(v >= 0)
      val zeros = 32 - Integer.numberOfLeadingZeros(v + 1) - 1
      var i = 0
      while (i < zeros) { bits += false; i += 1 }
      bits += true
      if (zeros > 0) u(v + 1 - (1 << zeros), zeros)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def code(s: String): Unit = s.foreach(c => bits += (c == '1'))
    /** Raw bit snapshot + count (round 16 — the CABAC fixture encoder
      * assembles its byte-aligned slice header from these). */
    private[multimodal] def rawBits: Seq[Boolean] = bits.toSeq
    private[multimodal] def bitCount: Int = bits.length
    def stopAndPad(): Array[Byte] = {
      bits += true // rbsp_stop_one_bit
      while (bits.length % 8 != 0) bits += false
      val out = new Array[Byte](bits.length / 8)
      var i = 0
      while (i < bits.length) {
        if (bits(i)) out(i / 8) = (out(i / 8) | (1 << (7 - (i % 8)))).toByte
        i += 1
      }
      out
    }
  }

  /** Emit one §9.2 residual block from its coefficient array (scan
    * order, length = maxCoeffs) — the exact walk [[residualBlock]]
    * reads. Levels must respect CAVLC's structural limits (≤ 3 trailing
    * ±1s counted greedily; the adaptive suffix walk codes any Int that
    * fits prefix 15's 12-bit escape at the current suffix length). */
  private[graft] def emitResidualBlock(w: BitWriter, coeffs: Array[Int],
                                            nC: Int, tables: CavlcTables): Int = {
    val maxCoeffs = coeffs.length
    val nzIdx = coeffs.zipWithIndex.filter(_._1 != 0).map(_._2)
    val totalCoeff = nzIdx.length
    // trailing ones: consecutive ±1s at the HIGH-frequency end, max 3
    var trailingOnes = 0
    while (trailingOnes < math.min(3, totalCoeff) &&
      math.abs(coeffs(nzIdx(totalCoeff - 1 - trailingOnes))) == 1) trailingOnes += 1
    val cls = ctClass(nC)
    val ct = tables.ctEnc(cls).getOrElse((totalCoeff, trailingOnes),
      throw new IllegalArgumentException(
        s"coeff_token ($totalCoeff, $trailingOnes) not codable in class $cls"))
    w.code(ct)
    if (totalCoeff == 0) return 0
    // levels, highest frequency first
    var i = 0
    while (i < trailingOnes) {
      w.u(if (coeffs(nzIdx(totalCoeff - 1 - i)) < 0) 1 else 0, 1)
      i += 1
    }
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    while (i < totalCoeff) {
      val level = coeffs(nzIdx(totalCoeff - 1 - i))
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (i == trailingOnes && trailingOnes < 3) {
        require(math.abs(level) >= 2, "level after <3 trailing ones must be |x| >= 2")
        levelCode -= 2
      }
      if (suffixLength == 0) {
        if (levelCode < 14) { var p = 0; while (p < levelCode) { w.u(0, 1); p += 1 }; w.u(1, 1) }
        else if (levelCode < 30) {
          var p = 0; while (p < 14) { w.u(0, 1); p += 1 }; w.u(1, 1)
          w.u(levelCode - 14, 4)
        } else {
          // decode adds min(15, prefix) AND the prefix-15/suffixLength-0
          // +15, so the 12-bit suffix carries levelCode − 30
          require(levelCode - 30 < 4096, s"level $level beyond the 12-bit escape")
          var p = 0; while (p < 15) { w.u(0, 1); p += 1 }; w.u(1, 1)
          w.u(levelCode - 30, 12)
        }
      } else {
        if ((levelCode >> suffixLength) < 15) {
          val prefix = levelCode >> suffixLength
          var p = 0; while (p < prefix) { w.u(0, 1); p += 1 }; w.u(1, 1)
          w.u(levelCode & ((1 << suffixLength) - 1), suffixLength)
        } else {
          require(levelCode - (15 << suffixLength) < 4096,
            s"level $level beyond the 12-bit escape")
          var p = 0; while (p < 15) { w.u(0, 1); p += 1 }; w.u(1, 1)
          w.u(levelCode - (15 << suffixLength), 12)
        }
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    // total_zeros
    val totalZeros = nzIdx(totalCoeff - 1) + 1 - totalCoeff
    if (totalCoeff < maxCoeffs) {
      val enc = if (nC == -1) tables.tzcEnc(totalCoeff) else tables.tzEnc(totalCoeff)
      w.code(enc.getOrElse(totalZeros, throw new IllegalArgumentException(
        s"total_zeros $totalZeros not codable at tc $totalCoeff")))
    } else require(totalZeros == 0)
    // run_before, highest frequency first
    var zerosLeft = totalZeros
    i = totalCoeff - 1
    var prev = nzIdx(totalCoeff - 1)
    var k = totalCoeff - 1
    while (k > 0) {
      val cur = nzIdx(k - 1)
      val run = prev - cur - 1
      val zl = math.min(zerosLeft, 7)
      if (zerosLeft > 0)
        w.code(tables.rbEnc(zl).getOrElse(run, throw new IllegalArgumentException(
          s"run_before $run not codable at zerosLeft $zerosLeft")))
      else require(run == 0)
      zerosLeft -= run
      prev = cur
      k -= 1
    }
    totalCoeff
  }

  /** One intra macroblock's fixture inputs (sealed: I16 or I4x4). */
  sealed trait IMbSpec

  /** One Intra_16x16 macroblock's fixture inputs: prediction mode, qp
    * delta, the 16 DC levels and 16×15 AC levels in ZIG-ZAG SCAN order
    * (the layout [[parseI16x16Slice]] decodes to before dequant).
    * cbpLuma is derived: 15 if any AC level is nonzero else caller's
    * choice via `forceCbpLuma`. Chroma (late round 15): `chromaDc` is
    * 2×4 raster 2x2 DC levels, `chromaAc` 2×4×15 scan levels; CBP
    * chroma derives (2 if any AC, else 1 if any DC, else 0) with
    * `forceCbpChroma` overriding upward. */
  final case class I16MbSpec(predMode: Int, chromaPredMode: Int, qpDelta: Int,
                             dcScan: Array[Int], acScan: Array[Array[Int]],
                             forceCbpLuma: Option[Int] = None,
                             chromaDc: Array[Array[Int]] = Array.empty,
                             chromaAc: Array[Array[Array[Int]]] = Array.empty,
                             forceCbpChroma: Option[Int] = None) extends IMbSpec

  /** One Intra_4x4 macroblock's fixture inputs (round 16): the sixteen
    * §8.3.1.2 modes in blkIdx order, and 16×16 ZIG-ZAG SCAN levels
    * (each block's own DC at scan position 0). CBP luma derives per
    * 8x8 (bit set iff any of its four blocks has a nonzero level);
    * `forceCbpLuma` may set EXTRA bits (coded-but-all-zero 8x8s).
    * mb_qp_delta is only emitted when the derived CBP is nonzero, so
    * `qpDelta` must be 0 for an all-zero-CBP spec. */
  final case class I4x4MbSpec(modes: Array[Int], chromaPredMode: Int, qpDelta: Int,
                              lumaScan: Array[Array[Int]],
                              forceCbpLuma: Option[Int] = None,
                              chromaDc: Array[Array[Int]] = Array.empty,
                              chromaAc: Array[Array[Array[Int]]] = Array.empty,
                              forceCbpChroma: Option[Int] = None) extends IMbSpec

  /** One Intra_8x8 macroblock's fixture inputs (round 17): the four
    * §8.3.2 modes in luma8x8BlkIdx order and 4 × 64 levels in 8x8
    * ZIG-ZAG SCAN order. Needs a PPS with transform_8x8_mode_flag.
    * CBP luma derives per 8x8 block (bit b set iff block b has a
    * nonzero level); `forceCbpLuma` may set EXTRA bits. */
  final case class I8x8MbSpec(modes: Array[Int], chromaPredMode: Int, qpDelta: Int,
                              lumaScan64: Array[Array[Int]],
                              forceCbpLuma: Option[Int] = None,
                              chromaDc: Array[Array[Int]] = Array.empty,
                              chromaAc: Array[Array[Array[Int]]] = Array.empty,
                              forceCbpChroma: Option[Int] = None) extends IMbSpec

  /** Fixture encoder for [[parseI16x16Slice]]/[[parseI16x16Picture]]:
    * slice header + all-intra CAVLC slice data, mirrored field for
    * field. Round 17: `firstMb` + a PARTIAL `mbs` covering
    * [firstMb, firstMb + mbs.length) encodes one slice of a
    * multi-slice picture — availability (nC, mode prediction) is
    * slice-bound exactly as the parser reads it. */
  def encodeI16x16Slice(sps: H264.Sps, pps: H264.Pps, nalRefIdc: Int,
                        idr: Boolean, frameNum: Int, idrPicId: Int,
                        pocLsb: Int, sliceQpDelta: Int,
                        mbs: Seq[IMbSpec], tables: CavlcTables,
                        deblockIdc: Int = 1, firstMb: Int = 0): Array[Byte] = {
    require(firstMb >= 0 && mbs.nonEmpty &&
      firstMb + mbs.length <= sps.picWidthInMbs * sps.picHeightInMapUnits,
      "fixture slice must fit inside the picture")
    val w = new BitWriter
    w.ue(firstMb) // first_mb_in_slice
    w.ue(7) // slice_type: I (all slices of the picture are I)
    w.ue(pps.ppsId)
    w.u(frameNum, sps.log2MaxFrameNum)
    if (idr) w.ue(idrPicId)
    if (sps.pocType == 0) {
      w.u(pocLsb, sps.log2MaxPocLsb)
      if (pps.bottomFieldPocPresent) w.se(0)
    }
    if (pps.redundantPresent) w.ue(0)
    if (nalRefIdc != 0) {
      require(idr, "non-IDR reference fixture slices unsupported")
      w.u(0, 1); w.u(0, 1)
    }
    w.se(sliceQpDelta)
    if (pps.deblockingPresent) {
      w.ue(deblockIdc)
      if (deblockIdc != 1) { w.se(0); w.se(0) }
    }
    val wMbs = sps.picWidthInMbs; val hMbs = sps.picHeightInMapUnits
    // slice-bound availability, mirroring the parser (round 17): a
    // neighbor cell in a previous slice is unavailable, not zero
    val nz = Array.fill(4 * hMbs, 4 * wMbs)(0)
    def nCOf(gx: Int, gy: Int): Int = {
      val a = if (gx > 0 && (gy >> 2) * wMbs + ((gx - 1) >> 2) >= firstMb)
        Some(nz(gy)(gx - 1)) else None
      val b = if (gy > 0 && ((gy - 1) >> 2) * wMbs + (gx >> 2) >= firstMb)
        Some(nz(gy - 1)(gx)) else None
      (a, b) match {
        case (Some(na), Some(nb)) => (na + nb + 1) >> 1
        case (Some(na), None) => na
        case (None, Some(nb)) => nb
        case (None, None) => 0
      }
    }
    val nzC = Array.fill(2, 2 * hMbs, 2 * wMbs)(0)
    def nCOfC(comp: Int, gx: Int, gy: Int): Int = {
      val a = if (gx > 0 && (gy >> 1) * wMbs + ((gx - 1) >> 1) >= firstMb)
        Some(nzC(comp)(gy)(gx - 1)) else None
      val b = if (gy > 0 && ((gy - 1) >> 1) * wMbs + (gx >> 1) >= firstMb)
        Some(nzC(comp)(gy - 1)(gx)) else None
      (a, b) match {
        case (Some(na), Some(nb)) => (na + nb + 1) >> 1
        case (Some(na), None) => na
        case (None, Some(nb)) => nb
        case (None, None) => 0
      }
    }
    val modeGrid = Array.fill(4 * hMbs, 4 * wMbs)(-1)
    def chromaCbpOf(chromaDc: Array[Array[Int]],
                    chromaAc: Array[Array[Array[Int]]],
                    force: Option[Int]): (Int, Array[Array[Int]], Array[Array[Array[Int]]]) = {
      val chDc = if (chromaDc.isEmpty) Array.fill(2)(new Array[Int](4)) else chromaDc
      val chAc = if (chromaAc.isEmpty) Array.fill(2, 4)(new Array[Int](15)) else chromaAc
      require(chDc.length == 2 && chDc.forall(_.length == 4) &&
        chAc.length == 2 && chAc.forall(a => a.length == 4 && a.forall(_.length == 15)),
        "chroma scan array shapes")
      val cbpChroma = force.getOrElse(
        if (chAc.exists(_.exists(_.exists(_ != 0)))) 2
        else if (chDc.exists(_.exists(_ != 0))) 1
        else 0)
      require(cbpChroma >= 0 && cbpChroma <= 2)
      require(cbpChroma == 2 || chAc.forall(_.forall(_.forall(_ == 0))),
        "nonzero chroma AC needs CBP chroma 2")
      require(cbpChroma >= 1 || chDc.forall(_.forall(_ == 0)),
        "nonzero chroma DC needs CBP chroma >= 1")
      (cbpChroma, chDc, chAc)
    }
    def emitChroma(mbx: Int, mby: Int, cbpChroma: Int,
                   chDc: Array[Array[Int]], chAc: Array[Array[Array[Int]]]): Unit = {
      if (cbpChroma >= 1)
        for (comp <- 0 until 2)
          emitResidualBlock(w, chDc(comp), -1, tables)
      for (comp <- 0 until 2; cblk <- 0 until 4) {
        val gx = 2 * mbx + cblk % 2; val gy = 2 * mby + cblk / 2
        if (cbpChroma == 2)
          nzC(comp)(gy)(gx) =
            emitResidualBlock(w, chAc(comp)(cblk), nCOfC(comp, gx, gy), tables)
        else nzC(comp)(gy)(gx) = 0
      }
    }
    mbs.zipWithIndex.foreach {
      case (m: I16MbSpec, idx) =>
        val mbx = (firstMb + idx) % wMbs; val mby = (firstMb + idx) / wMbs
        require(m.dcScan.length == 16 && m.acScan.length == 16 &&
          m.acScan.forall(_.length == 15), "scan array shapes")
        val cbpLuma = m.forceCbpLuma.getOrElse(
          if (m.acScan.exists(_.exists(_ != 0))) 15 else 0)
        require(cbpLuma == 0 || cbpLuma == 15, "Intra_16x16 luma CBP is 0 or 15")
        require(cbpLuma == 15 || m.acScan.forall(_.forall(_ == 0)),
          "nonzero AC levels need CBP luma 15")
        val (cbpChroma, chDc, chAc) =
          chromaCbpOf(m.chromaDc, m.chromaAc, m.forceCbpChroma)
        val mbType = 1 + m.predMode + 4 * cbpChroma + 12 * (cbpLuma / 15)
        w.ue(mbType)
        w.ue(m.chromaPredMode)
        w.se(m.qpDelta)
        emitResidualBlock(w, m.dcScan, nCOf(4 * mbx, 4 * mby), tables)
        var blk = 0
        while (blk < 16) {
          val gx = 4 * mbx + blkX(blk); val gy = 4 * mby + blkY(blk)
          if (cbpLuma == 15)
            nz(gy)(gx) = emitResidualBlock(w, m.acScan(blk), nCOf(gx, gy), tables)
          else nz(gy)(gx) = 0
          blk += 1
        }
        emitChroma(mbx, mby, cbpChroma, chDc, chAc)
      case (m: I4x4MbSpec, idx) =>
        // Intra_4x4 (round 16): mb_type 0, per-block mode signalling
        // against the same §8.3.1.1 predictor the decoder derives
        val mbx = (firstMb + idx) % wMbs; val mby = (firstMb + idx) / wMbs
        require(m.modes.length == 16 && m.modes.forall(md => md >= 0 && md <= 8),
          "sixteen Intra_4x4 modes in 0..8")
        require(m.lumaScan.length == 16 && m.lumaScan.forall(_.length == 16),
          "luma scan array shapes")
        val derived = (0 until 4).map(b8 =>
          if ((4 * b8 until 4 * b8 + 4).exists(b => m.lumaScan(b).exists(_ != 0))) 1 << b8
          else 0).sum
        val cbpLuma = m.forceCbpLuma.getOrElse(derived)
        require((cbpLuma & derived) == derived && cbpLuma < 16,
          "forceCbpLuma must cover every nonzero 8x8")
        val (cbpChroma, chDc, chAc) =
          chromaCbpOf(m.chromaDc, m.chromaAc, m.forceCbpChroma)
        val cbp = cbpLuma | (cbpChroma << 4)
        w.ue(0) // mb_type I_NxN
        if (pps.transform8x8) w.u(0, 1) // transform_size_8x8_flag: 4x4
        var blk = 0
        while (blk < 16) {
          val gx = 4 * mbx + blkX(blk); val gy = 4 * mby + blkY(blk)
          val a = if (gx == 0 || modeGrid(gy)(gx - 1) < 0) 2 else modeGrid(gy)(gx - 1)
          val b = if (gy == 0 || modeGrid(gy - 1)(gx) < 0) 2 else modeGrid(gy - 1)(gx)
          val predicted = math.min(a, b)
          val mode = m.modes(blk)
          if (mode == predicted) w.u(1, 1)
          else {
            w.u(0, 1)
            w.u(if (mode > predicted) mode - 1 else mode, 3)
          }
          modeGrid(gy)(gx) = mode
          blk += 1
        }
        w.ue(m.chromaPredMode)
        w.ue(intra4x4CbpToGolomb(cbp))
        if (cbp != 0) w.se(m.qpDelta)
        else require(m.qpDelta == 0, "mb_qp_delta needs a nonzero CBP")
        blk = 0
        while (blk < 16) {
          val gx = 4 * mbx + blkX(blk); val gy = 4 * mby + blkY(blk)
          if ((cbpLuma >> (blk / 4) & 1) != 0)
            nz(gy)(gx) = emitResidualBlock(w, m.lumaScan(blk), nCOf(gx, gy), tables)
          else nz(gy)(gx) = 0
          blk += 1
        }
        emitChroma(mbx, mby, cbpChroma, chDc, chAc)

      case (m: I8x8MbSpec, idx) =>
        // Intra_8x8 (round 17): mb_type 0 + transform_size_8x8_flag 1,
        // four mode signals, the §8.5.13.1 four-4x4 CAVLC interleave
        require(pps.transform8x8,
          "I8x8MbSpec needs a PPS with transform_8x8_mode_flag")
        val mbx = (firstMb + idx) % wMbs; val mby = (firstMb + idx) / wMbs
        require(m.modes.length == 4 && m.modes.forall(md => md >= 0 && md <= 8),
          "four Intra_8x8 modes in 0..8")
        require(m.lumaScan64.length == 4 && m.lumaScan64.forall(_.length == 64),
          "luma scan64 array shapes")
        val derived = (0 until 4).map(b =>
          if (m.lumaScan64(b).exists(_ != 0)) 1 << b else 0).sum
        val cbpLuma = m.forceCbpLuma.getOrElse(derived)
        require((cbpLuma & derived) == derived && cbpLuma < 16,
          "forceCbpLuma must cover every nonzero 8x8 block")
        val (cbpChroma, chDc, chAc) =
          chromaCbpOf(m.chromaDc, m.chromaAc, m.forceCbpChroma)
        val cbp = cbpLuma | (cbpChroma << 4)
        w.ue(0) // mb_type I_NxN
        w.u(1, 1) // transform_size_8x8_flag
        var b = 0
        while (b < 4) {
          val gx4 = 4 * mbx + 2 * (b % 2); val gy4 = 4 * mby + 2 * (b / 2)
          val a = if (gx4 == 0 || modeGrid(gy4)(gx4 - 1) < 0) 2 else modeGrid(gy4)(gx4 - 1)
          val bb = if (gy4 == 0 || modeGrid(gy4 - 1)(gx4) < 0) 2 else modeGrid(gy4 - 1)(gx4)
          val predicted = math.min(a, bb)
          val mode = m.modes(b)
          if (mode == predicted) w.u(1, 1)
          else {
            w.u(0, 1)
            w.u(if (mode > predicted) mode - 1 else mode, 3)
          }
          modeGrid(gy4)(gx4) = mode; modeGrid(gy4)(gx4 + 1) = mode
          modeGrid(gy4 + 1)(gx4) = mode; modeGrid(gy4 + 1)(gx4 + 1) = mode
          b += 1
        }
        w.ue(m.chromaPredMode)
        w.ue(intra4x4CbpToGolomb(cbp))
        if (cbp != 0) w.se(m.qpDelta)
        else require(m.qpDelta == 0, "mb_qp_delta needs a nonzero CBP")
        b = 0
        while (b < 4) {
          if ((cbpLuma >> b & 1) != 0) {
            var i = 0
            while (i < 4) {
              val blk = 4 * b + i
              val gx = 4 * mbx + blkX(blk); val gy = 4 * mby + blkY(blk)
              val sub = Array.tabulate(16)(k => m.lumaScan64(b)(4 * k + i))
              nz(gy)(gx) = emitResidualBlock(w, sub, nCOf(gx, gy), tables)
              i += 1
            }
          } else {
            var i = 0
            while (i < 4) {
              val blk = 4 * b + i
              nz(4 * mby + blkY(blk))(4 * mbx + blkX(blk)) = 0
              i += 1
            }
          }
          b += 1
        }
        emitChroma(mbx, mby, cbpChroma, chDc, chAc)
    }
    w.stopAndPad()
  }
}
