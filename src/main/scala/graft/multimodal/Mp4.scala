package graft.multimodal

/** Pure-JVM MP4 / ISO BMFF (ISO 14496-12) CONTAINER parser (round 10;
  * round 16 wired the codec seam): box-tree walk, movie/track headers,
  * sample tables with per-sample offsets resolved through stsc × stco
  * (interleaved multi-chunk layouts slice correctly — the old
  * contiguous-from-first-chunk read was a misparse seam on real
  * files), mdat payload, and the raw stsd the codec glue decodes —
  * [[H264Mp4]] (avcC → CAVLC/CABAC intra pictures) and [[AacMp4]]
  * (esds → AAC-LC PCM).
  *
  * Scope: 32-bit box sizes, `ftyp` + `moov`(`mvhd`, `trak`(`tkhd`,
  * `mdia`(`mdhd`, `hdlr`, `minf`/`stbl`(`stsd` raw, `stsz` uniform or
  * per-sample, `stsc` runs, `stco`/`co64`, `stss` sync samples,
  * `stts` decode timestamps, `ctts` composition offsets))))
  * + one `mdat` — OR (round 17) the FRAGMENTED shape: `moov` with
  * empty sample tables + `mvex`/`trex`, then `moof`(`mfhd`,
  * `traf`(`tfhd`, [`tfdt`], `trun`+)) + `mdat` per fragment (explicit
  * base offsets only — base-data-offset-present or
  * default-base-is-moof; sample sync from trun/tfhd/trex flags;
  * per-sample DTS from trun/tfhd/trex durations anchored by `tfdt` —
  * or the previous fragment's end when absent — and PTS from the trun
  * composition offsets, v1 signed).
  * Version-0 full boxes (trun also v1). Multi-chunk tracks REQUIRE an stsc (ambiguous otherwise);
  * a table whose chunks and samples do not tile each other exactly
  * rejects. Unknown boxes are
  * SKIPPED BY SIZE (that is the format's own extension contract —
  * readers must skip boxes they don't know), but structural
  * inconsistencies are strict → None, never a misparse: short/overrun
  * boxes, size < 8, 64-bit largesize, missing required boxes, sample
  * table pointing outside the file, trailing bytes after the box tree.
  *
  * Reference anchor: the reference repo has no media tier — this extends
  * the beyond-reference training-data surface, same contract as
  * [[Codecs.decodeWav]]/[[Png]]/[[Jpeg]].
  */
object Mp4 {

  /** One parsed track: `kind` is the hdlr handler type ("vide"/"soun"/…),
    * `width`/`height` from tkhd 16.16 fixed point (0 for sound),
    * `timescale`/`duration` from mdhd, `sampleSizes` resolved from stsz
    * (uniform size expanded), `firstChunkOffset` from stco, and —
    * round 16, the codec-config seam — `stsd`: the raw payload bytes
    * of the sample-description box (where avc1/avcC lives; empty when
    * the file carries none), decoded by [[H264Mp4.parseAvcc]]. */
  final case class Track(kind: String, width: Int, height: Int,
                         timescale: Long, duration: Long,
                         sampleSizes: Array[Int], firstChunkOffset: Long,
                         stsd: Array[Byte] = Array.empty,
                         sampleOffsets: Array[Long] = Array.empty,
                         syncSamples: Option[Array[Int]] = None,
                         trackId: Long = 0,
                         sampleDts: Array[Long] = Array.empty,
                         samplePts: Array[Long] = Array.empty,
                         editDelay: Long = 0,
                         editMediaTime: Long = -1,
                         editDuration: Long = -1) {
    /** §8.6.2 sync-sample semantics for 0-based sample `i`: an absent
      * stss means EVERY sample is a sync sample (all-intra tracks —
      * real muxers omit the box then); a present stss lists the
      * 1-based sync sample numbers, sorted (parse-validated). Real
      * video is mostly P/B samples, so this is the seam that lets the
      * intra decoders extract exactly the keyframes from a real file
      * instead of rejecting it whole. */
    def isSync(i: Int): Boolean = syncSamples match {
      case None    => true
      case Some(s) => java.util.Arrays.binarySearch(s, i + 1) >= 0
    }
  }

  /** Parsed movie: ftyp major brand, mvhd timescale/duration, tracks in
    * file order, and the raw mdat payload (the codec-stub seam).
    * `mdatFileOffset` is the FILE offset of the mdat payload start —
    * `track.sampleOffsets(i) − mdatFileOffset` rebases into `mdat`,
    * which is what per-sample extraction slices with. For FRAGMENTED
    * files (round 17) `mdat` is the whole file at offset 0 (samples
    * span one mdat box per fragment; offsets stay absolute and the
    * same rebase arithmetic works unchanged). */
  final case class Movie(majorBrand: String, timescale: Long, duration: Long,
                         tracks: Array[Track], mdat: Array[Byte],
                         mdatFileOffset: Long)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
    ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def typ(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  def parseMp4(bytes: Array[Byte]): Option[Movie] = try {
    if (bytes.length < 8) return None
    var brand: String = null
    var mvTimescale = -1L; var mvDuration = -1L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]
    var mdat: Array[Byte] = null
    var mdatOff = -1L // payload start offset of the mdat box in the file
    // fragmented state (round 17 — moof/tfhd/trun; the DASH/CMAF shape):
    // trex defaults per track, accumulated per-fragment sample runs,
    // every mdat payload range (fragmented files carry one per fragment)
    val trex = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)] // id -> (defDur, defSize, defFlags)
    val fragSizes = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.ArrayBuffer[Int]]
    val fragOffs = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    val fragSync = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.ArrayBuffer[Boolean]]
    // fragmented timestamps (round 17): per-sample DTS/PTS from trun
    // durations + composition offsets, anchored by tfdt (or the running
    // end of the previous fragment when tfdt is absent)
    val fragDts = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    val fragPts = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    val nextDts = scala.collection.mutable.Map.empty[Long, Long] // id -> decode-time cursor
    var lastSeq = 0L
    var nMoof = 0
    val mdatRanges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // payload [start, end)

    // walk the children of [start, end); returns false on structural error
    def children(start: Int, end: Int)(f: (String, Int, Int) => Boolean): Boolean = {
      var p = start
      while (p < end) {
        if (p + 8 > end) return false
        val size = be32(bytes, p)
        if (size < 8 || p + size > end) return false // 64-bit/short/overrun: strict
        if (!f(typ(bytes, p + 4), p + 8, p + size.toInt)) return false
        p += size.toInt
      }
      p == end
    }

    def parseTrak(start: Int, end: Int): Boolean = {
      var kind: String = null
      var w = 0; var h = 0
      var tid = -1L
      var ts = -1L; var dur = -1L
      var sizes: Array[Int] = null
      var chunkOffs: Array[Long] = null
      var stscRuns: Array[(Long, Long)] = null // (first_chunk, samples_per_chunk)
      var stsdBytes: Array[Byte] = Array.empty
      var sync: Array[Int] = null // stss 1-based sync sample numbers
      var sttsRuns: Array[(Long, Long)] = null // (sample_count, sample_delta)
      var cttsRuns: Array[(Long, Long)] = null // (sample_count, composition offset)
      var elst: Array[(Long, Long, Long)] = null // (segment_duration, media_time, rate)
      def stbl(s: Int, e: Int): Boolean = children(s, e) { (t, bs, be) =>
        t match {
          case "stsd" =>
            stsdBytes = java.util.Arrays.copyOfRange(bytes, bs, be)
            true
          case "stsc" =>
            // §8.7.4 sample-to-chunk runs (round 16 — real files
            // interleave tracks chunk-wise, so per-sample offsets MUST
            // resolve through this table; the old contiguous-from-
            // first-chunk read was a misparse seam on multi-chunk files)
            if (be - bs < 8) return false
            val n = be32(bytes, bs + 4)
            if (n < 1 || be - bs < 8 + 12 * n) return false
            stscRuns = Array.tabulate(n.toInt) { j =>
              val fc = be32(bytes, bs + 8 + 12 * j)
              val spc = be32(bytes, bs + 8 + 12 * j + 4)
              if (fc < 1 || spc < 1) return false
              (fc, spc)
            }
            // first run must start at chunk 1; runs strictly increasing
            if (stscRuns.head._1 != 1) return false
            var j = 1
            while (j < stscRuns.length) {
              if (stscRuns(j)._1 <= stscRuns(j - 1)._1) return false
              j += 1
            }
            true
          case "stsz" =>
            if (be - bs < 12) return false
            val uniform = be32(bytes, bs + 4)
            val n = be32(bytes, bs + 8)
            // allocation bound: uniform-size counts carry no entry table,
            // so a crafted count could demand gigabytes — but n samples of
            // ≥ 1 byte can never exceed the file itself
            if (n < 0 || n > bytes.length) return false
            if (uniform == 0 && n > (be - bs)) return false // entries must fit
            // sizes are unsigned 32-bit on disk; anything not fitting the
            // FILE is structurally bogus — and a value ≥ 2^31 narrowed to
            // Int would go negative and make the total-vs-mdat check pass
            // vacuously (round-10 review)
            if (uniform != 0) {
              if (uniform > bytes.length) return false
              sizes = Array.fill(n.toInt)(uniform.toInt)
            } else {
              if (be - bs < 12 + 4 * n) return false
              sizes = Array.tabulate(n.toInt) { j =>
                val v = be32(bytes, bs + 12 + 4 * j)
                if (v > bytes.length) return false
                v.toInt
              }
            }
            true
          case "stco" =>
            if (chunkOffs != null) return false // duplicate offset tables
            if (be - bs < 8) return false
            val n = be32(bytes, bs + 4)
            // n == 0 is the fragmented init-segment shape (round 17):
            // all samples arrive via moof/trun
            if (n < 0 || be - bs < 8 + 4 * n) return false
            chunkOffs = Array.tabulate(n.toInt)(j => be32(bytes, bs + 8 + 4 * j))
            true
          case "co64" =>
            // 64-bit chunk offsets (round 16): the table large real
            // files carry — same semantics as stco, wider entries
            if (chunkOffs != null) return false
            if (be - bs < 8) return false
            val n = be32(bytes, bs + 4)
            if (n < 0 || be - bs < 8 + 8 * n) return false
            chunkOffs = Array.tabulate(n.toInt) { j =>
              val hi = be32(bytes, bs + 8 + 8 * j)
              val lo = be32(bytes, bs + 8 + 8 * j + 4)
              val v = (hi << 32) | lo
              if (v < 0) return false // past any in-memory file
              v
            }
            true
          case "stts" =>
            // §8.6.1.2 decoding time-to-sample (round 17): runs of
            // (sample_count, sample_delta); resolved to per-sample DTS
            // at trak end (cumulative from 0, timescale units). Counts
            // must tile the stsz sample count exactly — deferred.
            if (sttsRuns != null) return false // duplicate stts
            if (be - bs < 8 || bytes(bs) != 0) return false
            val nT = be32(bytes, bs + 4)
            if (nT < 0 || be - bs < 8 + 8 * nT) return false
            sttsRuns = Array.tabulate(nT.toInt) { j =>
              val cnt = be32(bytes, bs + 8 + 8 * j)
              val delta = be32(bytes, bs + 8 + 8 * j + 4)
              if (cnt < 1) return false // empty run: malformed
              (cnt, delta)
            }
            true
          case "ctts" =>
            // §8.6.1.3 composition time-to-sample (round 17): runs of
            // (sample_count, sample_offset) — the B-frame reorder
            // surface. Version 0 carries unsigned offsets, version 1
            // signed (the negative-offset form modern muxers write);
            // PTS(i) = DTS(i) + offset(i), resolved at trak end.
            // Requires stts (an offset without a decode-time basis is
            // meaningless) — checked deferred, box order is free.
            if (cttsRuns != null) return false // duplicate ctts
            if (be - bs < 8) return false
            val verC = bytes(bs) & 0xff
            if (verC > 1) return false
            val nC = be32(bytes, bs + 4)
            if (nC < 0 || be - bs < 8 + 8 * nC) return false
            cttsRuns = Array.tabulate(nC.toInt) { j =>
              val cnt = be32(bytes, bs + 8 + 8 * j)
              val raw = be32(bytes, bs + 8 + 8 * j + 4)
              if (cnt < 1) return false // empty run: malformed
              (cnt, if (verC == 1) raw.toInt.toLong else raw)
            }
            true
          case "stss" =>
            // §8.6.2 sync-sample table (round 17): the 1-based sample
            // numbers of the sync (key) frames. Absent box = every
            // sample is sync, per spec. Entries must be ≥ 1 and
            // strictly increasing; the ≤ sample-count bound is checked
            // at trak end (stsz may follow stss in box order).
            if (sync != null) return false // duplicate stss
            if (be - bs < 8 || bytes(bs) != 0) return false // version 0
            val n = be32(bytes, bs + 4)
            if (n < 0 || be - bs < 8 + 4 * n) return false
            sync = Array.tabulate(n.toInt) { j =>
              val v = be32(bytes, bs + 8 + 4 * j)
              if (v < 1 || v > Int.MaxValue) return false
              v.toInt
            }
            var j = 1
            while (j < sync.length) {
              if (sync(j) <= sync(j - 1)) return false
              j += 1
            }
            true
          case _ => true // stts run lengths etc.: not extracted
        }
      }
      def minf(s: Int, e: Int): Boolean = children(s, e) { (t, bs, be) =>
        if (t == "stbl") stbl(bs, be) else true
      }
      def mdia(s: Int, e: Int): Boolean = children(s, e) { (t, bs, be) =>
        t match {
          case "mdhd" =>
            if (be - bs < 24 || bytes(bs) != 0) return false // version 0 only
            ts = be32(bytes, bs + 12); dur = be32(bytes, bs + 16)
            true
          case "hdlr" =>
            if (be - bs < 12) return false
            kind = typ(bytes, bs + 8)
            true
          case "minf" => minf(bs, be)
          case _ => true
        }
      }
      val ok = children(start, end) { (t, bs, be) =>
        t match {
          case "tkhd" =>
            // version 0: ... width/height as 16.16 fixed at +76/+80
            if (be - bs < 84 || bytes(bs) != 0) return false
            tid = be32(bytes, bs + 12) // track_ID (the tfhd reference key)
            w = (be32(bytes, bs + 76) >> 16).toInt
            h = (be32(bytes, bs + 80) >> 16).toInt
            true
          case "mdia" => mdia(bs, be)
          case "edts" =>
            children(bs, be) { (t2, b2, e2) =>
              t2 match {
                case "elst" =>
                  // §8.6.6 edit list (round 17): the presentation-
                  // offset / gapless-trim surface real m4a files carry
                  // (AAC priming). segment_duration is MOVIE-timescale,
                  // media_time MEDIA-timescale (−1 = empty edit, a
                  // presentation delay). media_rate must be 1.0 —
                  // dwell (rate 0) and slow-motion edits reject.
                  if (elst != null) return false // duplicate elst
                  if (e2 - b2 < 8) return false
                  val verE = bytes(b2) & 0xff
                  if (verE > 1) return false
                  val nE = be32(bytes, b2 + 4)
                  val entSz = if (verE == 1) 20 else 12
                  if (nE < 1 || e2 - b2 < 8 + entSz * nE) return false
                  elst = Array.tabulate(nE.toInt) { j =>
                    val p = b2 + 8 + entSz * j
                    if (verE == 1) {
                      val dur = (be32(bytes, p) << 32) | be32(bytes, p + 4)
                      val mt = (be32(bytes, p + 8) << 32) | be32(bytes, p + 12)
                      if (dur < 0) return false // past any representable time
                      (dur, mt, be32(bytes, p + 16))
                    } else
                      (be32(bytes, p), be32(bytes, p + 4).toInt.toLong,
                        be32(bytes, p + 8))
                  }
                  if (elst.exists(_._3 != 0x00010000L)) return false
                  true
                case _ => true
              }
            }
          case _ => true
        }
      }
      if (!ok || kind == null || ts < 0 || sizes == null || chunkOffs == null) return false
      // §8.6.6 edit-list scope (round 17): [optional leading EMPTY
      // edit (media_time −1 — a presentation delay)] + [exactly one
      // normal edit]. Multi-segment lists and negative media times
      // other than −1 reject by name.
      var editDelay = 0L; var editMediaTime = -1L; var editDuration = -1L
      if (elst != null) {
        val (empties, rest) = elst.span(_._2 == -1L)
        if (empties.length > 1 || rest.length != 1) return false
        if (rest.head._2 < 0) return false
        editDelay = empties.headOption.map(_._1).getOrElse(0L)
        editMediaTime = rest.head._2
        editDuration = rest.head._1
      }
      // empty tables (round 17): the fragmented init-segment shape —
      // zero samples, zero chunks, samples arrive via moof/trun. A
      // nonempty side with an empty other side is a desynced table.
      if (sizes.isEmpty || chunkOffs.isEmpty) {
        if (sizes.nonEmpty || chunkOffs.nonEmpty) return false
        if (sync != null && sync.nonEmpty) return false
        if (sttsRuns != null && sttsRuns.nonEmpty) return false
        if (cttsRuns != null && cttsRuns.nonEmpty) return false
        tracks += Track(kind, w, h, ts, dur, sizes, -1L, stsdBytes,
          Array.empty[Long], Option(sync), tid,
          editDelay = editDelay, editMediaTime = editMediaTime,
          editDuration = editDuration)
        return true
      }
      // resolve per-sample FILE offsets through stsc × stco (round 16).
      // Without an stsc the only sound reading is the single-chunk
      // contiguous layout the fixtures use; multi-chunk without stsc
      // is structurally ambiguous → reject.
      val offsets = new Array[Long](sizes.length)
      if (stscRuns == null) {
        if (chunkOffs.length != 1) return false
        var off = chunkOffs(0)
        var i = 0
        while (i < sizes.length) { offsets(i) = off; off += sizes(i); i += 1 }
      } else {
        var sample = 0
        var run = 0
        var chunk = 1L
        while (chunk <= chunkOffs.length && sample < sizes.length) {
          while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk) run += 1
          val spc = stscRuns(run)._2
          var off = chunkOffs((chunk - 1).toInt)
          var j = 0L
          while (j < spc) {
            if (sample >= sizes.length) return false // chunk left half-used
            offsets(sample) = off
            off += sizes(sample)
            sample += 1
            j += 1
          }
          chunk += 1
        }
        if (sample != sizes.length) return false // samples without a chunk
        // and every stco chunk must hold samples: a walk that ran out
        // of samples before the last chunk is a desynced table (it
        // would silently re-slice later chunks' samples contiguously)
        if (chunk != chunkOffs.length + 1L) return false
      }
      // stss entries must reference real samples (deferred: stsz may
      // come after stss in box order)
      if (sync != null && sync.nonEmpty && sync.last > sizes.length) return false
      // stts runs must tile the sample count exactly; resolve to
      // per-sample decode timestamps (cumulative, timescale units)
      var dts: Array[Long] = Array.empty
      if (sttsRuns != null) {
        if (sttsRuns.map(_._1).sum != sizes.length) return false
        dts = new Array[Long](sizes.length)
        var t = 0L; var si = 0
        sttsRuns.foreach { case (cnt, delta) =>
          var j = 0L
          while (j < cnt) { dts(si) = t; t += delta; si += 1; j += 1 }
        }
      }
      // ctts runs must tile the sample count too, and need stts as the
      // decode-time basis: PTS(i) = DTS(i) + offset(i)
      var pts: Array[Long] = Array.empty
      if (cttsRuns != null) {
        if (dts.isEmpty) return false // ctts without stts: no DTS basis
        if (cttsRuns.map(_._1).sum != sizes.length) return false
        pts = new Array[Long](sizes.length)
        var si = 0
        cttsRuns.foreach { case (cnt, off) =>
          var j = 0L
          while (j < cnt) { pts(si) = dts(si) + off; si += 1; j += 1 }
        }
      }
      tracks += Track(kind, w, h, ts, dur, sizes, chunkOffs(0), stsdBytes, offsets,
        Option(sync), tid, dts, pts,
        editDelay = editDelay, editMediaTime = editMediaTime,
        editDuration = editDuration)
      true
    }

    // §8.8.4/.7/.8 moof → traf → tfhd/trun (round 17). Appends each
    // sample's (size, file offset, sync) to the per-track buffers.
    def parseMoof(start: Int, end: Int): Boolean = {
      val moofStart = start - 8L // box header precedes the payload
      var seqSeen = false
      val seenTraf = scala.collection.mutable.Set.empty[Long]
      def parseTraf(s0: Int, e0: Int): Boolean = {
        var tid = -1L
        var base = -1L
        var defSize = -1L; var defFlags = -1L; var defDur = -1L
        var cursor = -1L
        var tCursor = -1L // decode-time cursor (set at first need)
        var sawTrun = false
        val ok = children(s0, e0) { (t, bs, be) =>
          t match {
            case "tfhd" =>
              if (tid >= 0) return false // duplicate tfhd
              if (be - bs < 8 || bytes(bs) != 0) return false // version 0
              val flags = ((bytes(bs + 1) & 0xff) << 16) |
                ((bytes(bs + 2) & 0xff) << 8) | (bytes(bs + 3) & 0xff)
              tid = be32(bytes, bs + 4)
              if (!trex.contains(tid)) return false // fragmented track REQUIRES trex
              if (seenTraf.contains(tid)) return false // one traf per track per moof
              seenTraf += tid
              if ((flags & 0x10000) != 0) return false // duration-is-empty: out of scope
              var p = bs + 8
              if ((flags & 0x01) != 0) { // base_data_offset u64
                if (p + 8 > be) return false
                base = (be32(bytes, p) << 32) | be32(bytes, p + 4)
                if (base < 0 || base > bytes.length) return false
                p += 8
              } else if ((flags & 0x20000) != 0) base = moofStart // default-base-is-moof
              else return false // implicit previous-traf chaining: out of scope
              if ((flags & 0x02) != 0) { // sample_description_index
                if (p + 4 > be) return false
                if (be32(bytes, p) != 1) return false // only stsd entry 1 decodable
                p += 4
              }
              if ((flags & 0x08) != 0) { // default_sample_duration
                if (p + 4 > be) return false
                defDur = be32(bytes, p); p += 4
              }
              if ((flags & 0x10) != 0) { // default_sample_size
                if (p + 4 > be) return false
                defSize = be32(bytes, p)
                if (defSize < 1 || defSize > bytes.length) return false
                p += 4
              }
              if ((flags & 0x20) != 0) { // default_sample_flags
                if (p + 4 > be) return false
                defFlags = be32(bytes, p); p += 4
              }
              if (p != be) return false // tfhd must tile exactly
              cursor = base
              true
            case "tfdt" =>
              // §8.8.12 baseMediaDecodeTime (round 17, now a VALUE, not
              // just structure): the authoritative DTS of the traf's
              // first sample. Must precede the traf's truns — a tfdt
              // after samples were already stamped would retroactively
              // move them (strict-reject, never a misparse).
              if (tid < 0 || sawTrun) return false
              val v = if (be - bs >= 4) bytes(bs) & 0xff else return false
              if (v > 1) return false
              if (be - bs != (if (v == 1) 12 else 8)) return false
              tCursor =
                if (v == 1) {
                  val t = (be32(bytes, bs + 4) << 32) | be32(bytes, bs + 8)
                  if (t < 0) return false // past any representable time
                  t
                } else be32(bytes, bs + 4)
              true
            case "trun" =>
              if (tid < 0) return false // tfhd must precede its truns
              sawTrun = true
              if (be - bs < 8) return false
              val ver = bytes(bs) & 0xff
              if (ver > 1) return false
              val flags = ((bytes(bs + 1) & 0xff) << 16) |
                ((bytes(bs + 2) & 0xff) << 8) | (bytes(bs + 3) & 0xff)
              val n = be32(bytes, bs + 4)
              if (n < 1 || n > bytes.length) return false
              var p = bs + 8
              if ((flags & 0x01) != 0) { // data_offset (SIGNED i32, base-relative)
                if (p + 4 > be) return false
                cursor = base + be32(bytes, p).toInt
                p += 4
              }
              // absent data_offset: this run is contiguous after the
              // previous run (cursor already points there)
              var firstFlags = -1L
              if ((flags & 0x04) != 0) {
                if ((flags & 0x400) != 0) return false // both flag forms: malformed
                if (p + 4 > be) return false
                firstFlags = be32(bytes, p); p += 4
              }
              val (trexDur, trexSize, trexFlags) = trex(tid)
              val szB = fragSizes.getOrElseUpdate(tid, scala.collection.mutable.ArrayBuffer.empty)
              val offB = fragOffs.getOrElseUpdate(tid, scala.collection.mutable.ArrayBuffer.empty)
              val syB = fragSync.getOrElseUpdate(tid, scala.collection.mutable.ArrayBuffer.empty)
              val dtsB = fragDts.getOrElseUpdate(tid, scala.collection.mutable.ArrayBuffer.empty)
              val ptsB = fragPts.getOrElseUpdate(tid, scala.collection.mutable.ArrayBuffer.empty)
              // decode-time anchor: tfdt if the traf carried one, else
              // continue from the track's previous fragment end
              if (tCursor < 0) tCursor = nextDts.getOrElse(tid, 0L)
              var i = 0L
              while (i < n) {
                val dur =
                  if ((flags & 0x100) != 0) { // sample_duration
                    if (p + 4 > be) return false
                    val d = be32(bytes, p); p += 4; d
                  } else if (defDur >= 0) defDur
                  else trexDur
                val sz =
                  if ((flags & 0x200) != 0) {
                    if (p + 4 > be) return false
                    val s = be32(bytes, p); p += 4; s
                  } else if (defSize >= 0) defSize
                  else trexSize
                if (sz < 1 || sz > bytes.length) return false
                val sfl =
                  if ((flags & 0x400) != 0) {
                    if (p + 4 > be) return false
                    val f = be32(bytes, p); p += 4; f
                  } else if (i == 0 && firstFlags >= 0) firstFlags
                  else if (defFlags >= 0) defFlags
                  else trexFlags
                val cts =
                  if ((flags & 0x800) != 0) { // composition offset
                    if (p + 4 > be) return false
                    val raw = be32(bytes, p); p += 4
                    if (ver == 1) raw.toInt.toLong else raw // v1 signed
                  } else 0L
                szB += sz.toInt
                offB += cursor
                syB += ((sfl & 0x10000L) == 0L) // !sample_is_non_sync_sample
                dtsB += tCursor
                ptsB += tCursor + cts
                cursor += sz
                tCursor += dur
                i += 1
              }
              if (p != be) return false // trun must tile exactly
              true
            case _ => true // sbgp/sdtp/etc.: skipped
          }
        }
        if (ok && tid >= 0 && sawTrun) {
          nextDts(tid) = tCursor // next fragment continues here (no tfdt)
          true
        } else false
      }
      children(start, end) { (t, bs, be) =>
        t match {
          case "mfhd" =>
            if (be - bs != 8 || bytes(bs) != 0) false
            else {
              val seq = be32(bytes, bs + 4)
              if (seqSeen || seq <= lastSeq) false // strictly increasing
              else { lastSeq = seq; seqSeen = true; true }
            }
          case "traf" => parseTraf(bs, be)
          case _ => true
        }
      } && seqSeen
    }

    val ok = children(0, bytes.length) { (t, bs, be) =>
      t match {
        case "ftyp" =>
          if (be - bs < 8) return None
          brand = typ(bytes, bs)
          true
        case "moov" =>
          children(bs, be) { (t2, b2, e2) =>
            t2 match {
              case "mvhd" =>
                if (e2 - b2 < 24 || bytes(b2) != 0) false // version 0 only
                else { mvTimescale = be32(bytes, b2 + 12); mvDuration = be32(bytes, b2 + 16); true }
              case "trak" => parseTrak(b2, e2)
              case "mvex" =>
                // §8.8.1 movie-extends: trex per fragmented track —
                // (default_sample_size, default_sample_flags); duration
                // unused, description index must be 1 (the only stsd
                // entry the codec glue decodes)
                children(b2, e2) { (t3, b3, e3) =>
                  t3 match {
                    case "trex" =>
                      if (e3 - b3 != 24 || bytes(b3) != 0) false
                      else {
                        val id = be32(bytes, b3 + 4)
                        if (trex.contains(id)) false // duplicate trex
                        else if (be32(bytes, b3 + 8) != 1) false
                        else {
                          trex(id) = (be32(bytes, b3 + 12),
                            be32(bytes, b3 + 16), be32(bytes, b3 + 20))
                          true
                        }
                      }
                    case _ => true // mehd etc.: skipped
                  }
                }
              case _ => true
            }
          }
        case "moof" =>
          // §8.8 movie fragment (round 17): mfhd sequence + one traf
          // per track, each tfhd/trun run appended to the track's
          // resolved-offset surface — same strict-tiling discipline as
          // stsc×stco. Scope: explicit base offsets only (base-data-
          // offset-present or default-base-is-moof — the pre-2012
          // implicit chaining rule strict-rejects), version-0 tfhd,
          // trun v0/v1, one traf per track per moof.
          nMoof += 1
          if (!parseMoof(bs, be)) return None
          true
        case "mdat" =>
          // one mdat for progressive files; fragmented files carry one
          // per fragment — collect payload ranges only, materialize at
          // the end (copying here would duplicate fragment payloads
          // the fragmented branch never uses)
          mdatRanges += ((bs.toLong, be.toLong))
          true
        case _ => true // free/skip/styp/unknown: skipped by size, by contract
      }
    }
    if (!ok || brand == null || mvTimescale < 0 || mdatRanges.isEmpty || tracks.isEmpty)
      return None
    if (nMoof == 0) {
      if (mdatRanges.length != 1) return None // one mdat for progressive files
      mdatOff = mdatRanges.head._1
      mdat = java.util.Arrays.copyOfRange(bytes, mdatOff.toInt, mdatRanges.head._2.toInt)
      // every resolved sample must land INSIDE the mdat payload —
      // validated per sample (round 16: the stsc×stco resolution makes
      // the old per-track contiguous-run check both too weak for
      // interleaved layouts and unnecessary), so a desynced table is a
      // parse error, not a misread
      val total = tracks.map(_.sampleSizes.map(_.toLong).sum).sum
      tracks.foreach { t =>
        var i = 0
        while (i < t.sampleOffsets.length) {
          val off = t.sampleOffsets(i)
          if (off < mdatOff || off + t.sampleSizes(i) > mdatOff + mdat.length)
            return None
          i += 1
        }
      }
      if (total > mdat.length) return None
      Some(Movie(brand, mvTimescale, mvDuration, tracks.toArray, mdat, mdatOff))
    } else {
      // FRAGMENTED assembly (round 17): pure-fragment scope — a moov
      // carrying its own samples alongside moofs is out of scope (real
      // DASH/CMAF init segments have empty tables), and tfhd dispatch
      // needs unambiguous track ids. Every fragment sample must land
      // inside ONE mdat payload (fragments each carry their own), and
      // sync flags become an EXPLICIT stss-equivalent table.
      if (tracks.exists(_.sampleSizes.nonEmpty)) return None
      if (tracks.map(_.trackId).distinct.length != tracks.length) return None
      if (fragSizes.keys.exists(id => !tracks.exists(_.trackId == id))) return None
      val resolved = tracks.map { t =>
        val sz = fragSizes.get(t.trackId).map(_.toArray).getOrElse(Array.empty[Int])
        val off = fragOffs.get(t.trackId).map(_.toArray).getOrElse(Array.empty[Long])
        val sy = fragSync.get(t.trackId).map(_.toArray).getOrElse(Array.empty[Boolean])
        var i = 0
        while (i < sz.length) {
          if (!mdatRanges.exists { case (s, e) => off(i) >= s && off(i) + sz(i) <= e })
            return None // sample outside every mdat payload: desynced offsets
          i += 1
        }
        val syncIdx = sy.iterator.zipWithIndex.collect { case (true, j) => j + 1 }.toArray
        t.copy(sampleSizes = sz, sampleOffsets = off,
          firstChunkOffset = if (off.isEmpty) -1L else off(0),
          syncSamples = Some(syncIdx),
          // fragmented timestamps are always defined (trex's default
          // duration is a required field), unlike the optional
          // progressive stts/ctts
          sampleDts = fragDts.get(t.trackId).map(_.toArray).getOrElse(Array.empty[Long]),
          samplePts = fragPts.get(t.trackId).map(_.toArray).getOrElse(Array.empty[Long]))
      }
      // the payload surface spans multiple mdats → hand out the whole
      // file at offset 0 (no copy; sample offsets are absolute)
      Some(Movie(brand, mvTimescale, mvDuration, resolved.toArray, bytes, 0L))
    }
  } catch { case _: Exception => None }

  /** Gate/fixture encoder (the operators only PARSE): a minimal valid
    * ISO BMFF file — ftyp(isom) + moov(mvhd + one video trak with
    * uniform-size stsz + stco) + mdat carrying `samples` payload bytes
    * (`nSamples` × `sampleSize` must equal `samples.length`). All boxes
    * version 0, hand-sized. */
  def encodeMp4(width: Int, height: Int, timescale: Long, duration: Long,
                nSamples: Int, sampleSize: Int,
                samples: Array[Byte],
                stsd: Array[Byte] = Array.empty,
                perSampleSizes: Option[Array[Int]] = None,
                handler: String = "vide",
                syncSamples: Option[Array[Int]] = None,
                sampleDeltas: Option[Array[Long]] = None,
                ctsOffsets: Option[Array[Long]] = None,
                edits: Option[Seq[(Long, Long)]] = None): Array[Byte] = {
    sampleDeltas.foreach(d => require(d.length == nSamples,
      "one stts delta per sample"))
    ctsOffsets.foreach { o =>
      require(o.length == nSamples, "one ctts offset per sample")
      require(sampleDeltas.nonEmpty, "ctts needs stts (the DTS basis)")
      o.foreach(v => require(v >= Int.MinValue && v <= Int.MaxValue,
        "ctts offset out of 32-bit range"))
    }
    // round 16: `stsd` (raw payload, e.g. [[H264Mp4.encodeStsdAvc1]])
    // is written verbatim when nonempty; `perSampleSizes` switches stsz
    // to the per-sample entry table (variable-size NAL samples)
    perSampleSizes match {
      case Some(ps) =>
        require(ps.length == nSamples && ps.map(_.toLong).sum == samples.length,
          s"per-sample sizes must cover the ${samples.length} payload bytes")
      case None =>
        require(nSamples * sampleSize == samples.length,
          s"$nSamples x $sampleSize != ${samples.length} payload bytes")
    }
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def box(t: String)(body: => Unit): Unit = {
      val mark = out.size()
      u32(0); ascii(t) // size patched below
      body
      val bytes = out.toByteArray
      val size = bytes.length - mark
      bytes(mark) = ((size >> 24) & 0xff).toByte
      bytes(mark + 1) = ((size >> 16) & 0xff).toByte
      bytes(mark + 2) = ((size >> 8) & 0xff).toByte
      bytes(mark + 3) = (size & 0xff).toByte
      out.reset(); out.write(bytes, 0, bytes.length)
    }
    box("ftyp") { ascii("isom"); u32(512); ascii("isom"); ascii("iso2") }
    box("moov") {
      box("mvhd") {
        u32(0) // version 0 + flags
        u32(0); u32(0) // creation, modification
        u32(timescale); u32(duration)
        u32(0x00010000) // rate 1.0
        out.write(0x01); out.write(0) // volume 1.0 (8.8)
        out.write(0); out.write(0) // reserved(2)
        u32(0); u32(0) // reserved(8)
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(m => u32(m.toLong))
        (0 until 6).foreach(_ => u32(0)) // pre_defined
        u32(2) // next track id
      }
      box("trak") {
        box("tkhd") {
          u32(0x00000007) // version 0, flags: enabled | in movie | in preview
          u32(0); u32(0) // creation, modification
          u32(1) // track id
          u32(0) // reserved
          u32(duration)
          u32(0); u32(0) // reserved
          u32(0); u32(0) // layer+group, volume+reserved
          Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(m => u32(m.toLong))
          u32(width.toLong << 16); u32(height.toLong << 16) // 16.16 fixed
        }
        edits.foreach { es =>
          // (segment_duration, media_time) pairs, version 0, rate 1.0
          box("edts") {
            box("elst") {
              u32(0); u32(es.length.toLong)
              es.foreach { case (dur, mt) =>
                u32(dur); u32(mt & 0xffffffffL); u32(0x00010000L)
              }
            }
          }
        }
        box("mdia") {
          box("mdhd") {
            u32(0); u32(0); u32(0)
            u32(timescale); u32(duration)
            u32(0x55c40000) // language 'und' + pre_defined
          }
          box("hdlr") {
            u32(0); u32(0)
            ascii(handler)
            u32(0); u32(0); u32(0)
            out.write(0) // empty name, NUL
          }
          box("minf") {
            box("stbl") {
              if (stsd.nonEmpty) box("stsd") { out.write(stsd, 0, stsd.length) }
              perSampleSizes match {
                case Some(ps) =>
                  box("stsz") {
                    u32(0); u32(0); u32(nSamples.toLong)
                    ps.foreach(s => u32(s.toLong))
                  }
                case None =>
                  box("stsz") { u32(0); u32(sampleSize.toLong); u32(nSamples.toLong) }
              }
              // single run: all samples in chunk 1 (round 16 — written
              // explicitly now that the parser resolves stsc × stco)
              box("stsc") { u32(0); u32(1); u32(1); u32(nSamples.toLong); u32(1) }
              sampleDeltas.foreach { ds =>
                // compress equal-delta runs into (count, delta)
                val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
                ds.foreach { d =>
                  if (runs.nonEmpty && runs.last._2 == d)
                    runs(runs.length - 1) = (runs.last._1 + 1, d)
                  else runs += ((1L, d))
                }
                box("stts") {
                  u32(0); u32(runs.length.toLong)
                  runs.foreach { case (c2, d2) => u32(c2); u32(d2) }
                }
              }
              ctsOffsets.foreach { os =>
                // compress equal-offset runs; version 1 iff any offset
                // is negative (the signed form), else version 0
                val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
                os.foreach { o =>
                  if (runs.nonEmpty && runs.last._2 == o)
                    runs(runs.length - 1) = (runs.last._1 + 1, o)
                  else runs += ((1L, o))
                }
                val ver = if (os.exists(_ < 0)) 1L else 0L
                box("ctts") {
                  u32(ver << 24); u32(runs.length.toLong)
                  runs.foreach { case (c2, o2) => u32(c2); u32(o2 & 0xffffffffL) }
                }
              }
              syncSamples.foreach { ss =>
                box("stss") { u32(0); u32(ss.length.toLong); ss.foreach(s => u32(s.toLong)) }
              }
              box("stco") { u32(0); u32(1); u32(0) } // offset patched below
            }
          }
        }
      }
    }
    // patch the stco chunk offset now that the moov size is final: the
    // single chunk starts at the mdat payload (moov end + 8-byte header)
    val pre = out.toByteArray
    val mdatPayloadOff = pre.length + 8
    // find the stco box we just wrote (last 16 bytes of moov): search from
    // the end for "stco"
    var sp = pre.length - 4
    while (sp >= 0 && typ(pre, sp) != "stco") sp -= 1
    require(sp > 0, "stco not found")
    val off = sp + 4 + 8 // type + (version/flags + count)
    pre(off) = ((mdatPayloadOff >> 24) & 0xff).toByte
    pre(off + 1) = ((mdatPayloadOff >> 16) & 0xff).toByte
    pre(off + 2) = ((mdatPayloadOff >> 8) & 0xff).toByte
    pre(off + 3) = (mdatPayloadOff & 0xff).toByte
    val fin = new java.io.ByteArrayOutputStream()
    fin.write(pre, 0, pre.length)
    def u32f(v: Long): Unit = {
      fin.write(((v >> 24) & 0xff).toInt); fin.write(((v >> 16) & 0xff).toInt)
      fin.write(((v >> 8) & 0xff).toInt); fin.write((v & 0xff).toInt)
    }
    u32f(8L + samples.length); fin.write("mdat".getBytes("US-ASCII"))
    fin.write(samples, 0, samples.length)
    fin.toByteArray
  }

  /** One track of a MULTI-track, MULTI-chunk fixture (round 16):
    * `chunkSampleCounts(c)` samples live in chunk c, which starts at
    * `chunkMdatOffsets(c)` bytes into the mdat payload — the layout
    * real muxers produce when they interleave audio and video. */
  final case class TrackSpec(handler: String, width: Int, height: Int,
                             stsd: Array[Byte], sampleSizes: Array[Int],
                             chunkSampleCounts: Array[Int],
                             chunkMdatOffsets: Array[Long],
                             syncSamples: Option[Array[Int]] = None)

  /** Multi-track interleaved fixture encoder: same box layout as
    * [[encodeMp4]] per trak, but with REAL stsc runs (compressed from
    * the per-chunk counts) and multi-entry stco tables. Two-pass: box
    * sizes are offset-independent, so the first render measures the
    * mdat payload position and the second writes the absolute chunk
    * offsets. */
  def encodeMp4Multi(timescale: Long, duration: Long,
                     tracks: Seq[TrackSpec], mdat: Array[Byte],
                     useCo64: Boolean = false): Array[Byte] = {
    require(tracks.nonEmpty)
    tracks.foreach { t =>
      require(t.chunkSampleCounts.length == t.chunkMdatOffsets.length &&
        t.chunkSampleCounts.sum == t.sampleSizes.length,
        s"track ${t.handler}: chunks must tile the samples exactly")
    }
    def render(mdatBase: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      def box(t: String)(body: => Unit): Unit = {
        val mark = out.size()
        u32(0); ascii(t)
        body
        val bytes = out.toByteArray
        val size = bytes.length - mark
        bytes(mark) = ((size >> 24) & 0xff).toByte
        bytes(mark + 1) = ((size >> 16) & 0xff).toByte
        bytes(mark + 2) = ((size >> 8) & 0xff).toByte
        bytes(mark + 3) = (size & 0xff).toByte
        out.reset(); out.write(bytes, 0, bytes.length)
      }
      box("ftyp") { ascii("isom"); u32(512); ascii("isom"); ascii("iso2") }
      box("moov") {
        box("mvhd") {
          u32(0); u32(0); u32(0)
          u32(timescale); u32(duration)
          u32(0x00010000)
          out.write(0x01); out.write(0); out.write(0); out.write(0)
          u32(0); u32(0)
          Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(m => u32(m.toLong))
          (0 until 6).foreach(_ => u32(0))
          u32(tracks.length + 1L)
        }
        tracks.zipWithIndex.foreach { case (t, ti) =>
          box("trak") {
            box("tkhd") {
              u32(0x00000007); u32(0); u32(0)
              u32(ti + 1L); u32(0); u32(duration)
              u32(0); u32(0); u32(0); u32(0)
              Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(m => u32(m.toLong))
              u32(t.width.toLong << 16); u32(t.height.toLong << 16)
            }
            box("mdia") {
              box("mdhd") {
                u32(0); u32(0); u32(0)
                u32(timescale); u32(duration)
                u32(0x55c40000)
              }
              box("hdlr") {
                u32(0); u32(0); ascii(t.handler)
                u32(0); u32(0); u32(0); out.write(0)
              }
              box("minf") {
                box("stbl") {
                  if (t.stsd.nonEmpty) box("stsd") { out.write(t.stsd, 0, t.stsd.length) }
                  box("stsz") {
                    u32(0); u32(0); u32(t.sampleSizes.length.toLong)
                    t.sampleSizes.foreach(s => u32(s.toLong))
                  }
                  box("stsc") {
                    // compress equal-count runs into (first_chunk, spc)
                    val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
                    t.chunkSampleCounts.zipWithIndex.foreach { case (c, i) =>
                      if (runs.isEmpty || runs.last._2 != c) runs += ((i + 1, c))
                    }
                    u32(0); u32(runs.length.toLong)
                    runs.foreach { case (fc, spc) =>
                      u32(fc.toLong); u32(spc.toLong); u32(1)
                    }
                  }
                  t.syncSamples.foreach { ss =>
                    box("stss") { u32(0); u32(ss.length.toLong); ss.foreach(s => u32(s.toLong)) }
                  }
                  if (useCo64) box("co64") {
                    u32(0); u32(t.chunkMdatOffsets.length.toLong)
                    t.chunkMdatOffsets.foreach { o =>
                      u32((mdatBase + o) >> 32); u32((mdatBase + o) & 0xffffffffL)
                    }
                  } else box("stco") {
                    u32(0); u32(t.chunkMdatOffsets.length.toLong)
                    t.chunkMdatOffsets.foreach(o => u32(mdatBase + o))
                  }
                }
              }
            }
          }
        }
      }
      u32(8L + mdat.length); ascii("mdat")
      out.write(mdat, 0, mdat.length)
      out.toByteArray
    }
    val probe = render(0L)
    render(probe.length - mdat.length) // mdat payload starts here
  }

  /** Init-segment track info for [[encodeMp4Frag]]. */
  final case class FragTrack(trackId: Long, handler: String, width: Int,
                             height: Int, stsd: Array[Byte])

  /** One track's sample run inside one fragment: per-sample sizes and
    * sync flags (true = sync; becomes trun sample_flags with bit
    * 0x10000 = sample_is_non_sync_sample cleared/set). Round 17
    * timestamps: `durations` (empty = omit the trun duration field —
    * trex's default 0 applies), `cts` composition offsets (empty =
    * omit; any negative → trun version 1), `tfdt` the traf's explicit
    * baseMediaDecodeTime (None = omit the box — the parser continues
    * from the track's previous fragment end). */
  final case class FragRun(trackId: Long, sampleSizes: Array[Int],
                           sync: Array[Boolean],
                           durations: Array[Long] = Array.empty,
                           cts: Array[Long] = Array.empty,
                           tfdt: Option[Long] = None)

  /** FRAGMENTED fixture encoder (round 17): `ftyp` + `moov` with EMPTY
    * sample tables + `mvex`/`trex`, then per fragment a
    * `moof`(`mfhd`, `traf`(`tfhd` default-base-is-moof, `trun` with
    * explicit data_offset + per-sample sizes and flags)) + `mdat` —
    * the DASH/CMAF single-file shape. Each fragment's runs tile its
    * mdat payload exactly, in run order. Two-pass per moof: box sizes
    * are offset-value-independent, so the first render measures the
    * data offsets the second writes. */
  def encodeMp4Frag(timescale: Long, duration: Long,
                    tracks: Seq[FragTrack],
                    fragments: Seq[(Seq[FragRun], Array[Byte])]): Array[Byte] = {
    require(tracks.nonEmpty && fragments.nonEmpty)
    require(tracks.map(_.trackId).distinct.length == tracks.length)
    fragments.foreach { case (runs, payload) =>
      require(runs.nonEmpty &&
        runs.map(_.sampleSizes.map(_.toLong).sum).sum == payload.length,
        "fragment runs must tile the mdat payload exactly")
      runs.foreach(r => require(r.sync.length == r.sampleSizes.length))
      runs.foreach(r => require(r.durations.isEmpty ||
        r.durations.length == r.sampleSizes.length, "one duration per sample"))
      runs.foreach(r => require(r.cts.isEmpty ||
        r.cts.length == r.sampleSizes.length, "one cts offset per sample"))
      runs.foreach(_.cts.foreach(v =>
        require(v >= Int.MinValue && v <= Int.MaxValue, "cts out of 32-bit range")))
      require(runs.map(_.trackId).distinct.length == runs.length)
      runs.foreach(r => require(tracks.exists(_.trackId == r.trackId)))
    }
    // a tiny self-contained writer per byte-level segment
    final class W {
      val out = new java.io.ByteArrayOutputStream()
      def u32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      def box(t: String)(body: => Unit): Unit = {
        val mark = out.size()
        u32(0); ascii(t)
        body
        val b = out.toByteArray
        val size = b.length - mark
        b(mark) = ((size >> 24) & 0xff).toByte
        b(mark + 1) = ((size >> 16) & 0xff).toByte
        b(mark + 2) = ((size >> 8) & 0xff).toByte
        b(mark + 3) = (size & 0xff).toByte
        out.reset(); out.write(b, 0, b.length)
      }
      def bytes: Array[Byte] = out.toByteArray
    }
    val w = new W
    w.box("ftyp") { w.ascii("isom"); w.u32(512); w.ascii("isom"); w.ascii("iso2") }
    w.box("moov") {
      w.box("mvhd") {
        w.u32(0); w.u32(0); w.u32(0)
        w.u32(timescale); w.u32(duration)
        w.u32(0x00010000)
        w.out.write(0x01); w.out.write(0); w.out.write(0); w.out.write(0)
        w.u32(0); w.u32(0)
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(m => w.u32(m.toLong))
        (0 until 6).foreach(_ => w.u32(0))
        w.u32(tracks.map(_.trackId).max + 1)
      }
      tracks.foreach { t =>
        w.box("trak") {
          w.box("tkhd") {
            w.u32(0x00000007); w.u32(0); w.u32(0)
            w.u32(t.trackId); w.u32(0); w.u32(duration)
            w.u32(0); w.u32(0); w.u32(0); w.u32(0)
            Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(m => w.u32(m.toLong))
            w.u32(t.width.toLong << 16); w.u32(t.height.toLong << 16)
          }
          w.box("mdia") {
            w.box("mdhd") {
              w.u32(0); w.u32(0); w.u32(0)
              w.u32(timescale); w.u32(duration)
              w.u32(0x55c40000)
            }
            w.box("hdlr") {
              w.u32(0); w.u32(0); w.ascii(t.handler)
              w.u32(0); w.u32(0); w.u32(0); w.out.write(0)
            }
            w.box("minf") {
              w.box("stbl") {
                if (t.stsd.nonEmpty) w.box("stsd") { w.out.write(t.stsd, 0, t.stsd.length) }
                w.box("stsz") { w.u32(0); w.u32(0); w.u32(0) } // zero samples
                w.box("stco") { w.u32(0); w.u32(0) }           // zero chunks
              }
            }
          }
        }
      }
      w.box("mvex") {
        tracks.foreach { t =>
          w.box("trex") {
            w.u32(0); w.u32(t.trackId)
            w.u32(1) // default_sample_description_index
            w.u32(0) // default_sample_duration
            w.u32(0) // default_sample_size (fixture truns are explicit)
            w.u32(0x00010000L) // default flags: non-sync (truns override)
          }
        }
      }
    }
    var seq = 1L
    fragments.foreach { case (runs, payload) =>
      val runOff = runs.scanLeft(0L)((a, r) => a + r.sampleSizes.map(_.toLong).sum)
      def moofBytes(dataOff: Int => Long): Array[Byte] = {
        val m = new W
        m.box("moof") {
          m.box("mfhd") { m.u32(0); m.u32(seq) }
          runs.zipWithIndex.foreach { case (r, ri) =>
            m.box("traf") {
              m.box("tfhd") {
                m.u32(0x00020000L) // version 0, default-base-is-moof
                m.u32(r.trackId)
              }
              r.tfdt.foreach { t =>
                m.box("tfdt") { m.u32(0); m.u32(t) } // version 0 u32
              }
              m.box("trun") {
                val trunFlags = 0x601L | // data-offset + size + flags
                  (if (r.durations.nonEmpty) 0x100L else 0L) |
                  (if (r.cts.nonEmpty) 0x800L else 0L)
                val trunVer = if (r.cts.exists(_ < 0)) 1L else 0L
                m.u32((trunVer << 24) | trunFlags)
                m.u32(r.sampleSizes.length.toLong)
                m.u32(dataOff(ri)) // SIGNED, but fixture offsets are positive
                var si = 0
                while (si < r.sampleSizes.length) {
                  if (r.durations.nonEmpty) m.u32(r.durations(si))
                  m.u32(r.sampleSizes(si).toLong)
                  m.u32(if (r.sync(si)) 0L else 0x00010000L)
                  if (r.cts.nonEmpty) m.u32(r.cts(si) & 0xffffffffL)
                  si += 1
                }
              }
            }
          }
        }
        m.bytes
      }
      val moofSize = moofBytes(_ => 0L).length
      w.out.write(moofBytes(ri => moofSize + 8L + runOff(ri)), 0, moofSize)
      w.box("mdat") { w.out.write(payload, 0, payload.length) }
      seq += 1
    }
    w.bytes
  }
}
