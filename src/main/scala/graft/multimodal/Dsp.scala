package graft.multimodal

/** Shared DSP kernels for the audio decoders (round 15, r14 VERDICT #4):
  * an iterative radix-2 complex FFT and the AAC IMDCTs factored through
  * it. The direct §14.3 IMDCT sum is O(N²) — ~2 M cosines per AAC long
  * frame, capping real-corpus decode at ~300 frames/s/core — while this
  * factorization is one N-point FFT (~22 k butterflies at N = 2048) plus
  * pre/post twiddles, all FORMULA math:
  *
  *   IMDCT (n₀ = (N/2+1)/2 = m/2 + ½, m = N/2):
  *     y(n) = (2/N)·Σₖ X(k)·cos(π/m·(n + m/2 + ½)(k + ½))
  *   is the DCT-IV extension f(p) = Σₖ X(k)·cos(π/m·(p + ½)(k + ½))
  *   evaluated at p = n + m/2, unfolded by the DCT-IV symmetries
  *   f(2m−1−p) = −f(p) and f(p+2m) = −f(p); the DCT-IV itself is
  *     C(p) = Re[ e^{−iπ(p+½)/(2m)} · Σₖ (X(k)·e^{−iπk/(2m)})·e^{−2πi·pk/(2m)} ]
  *   whose inner sum is a 2m-point DFT of the pre-twiddled (zero-padded)
  *   spectrum. Exactness is pinned two ways: the unit suite compares
  *   against the direct sum at ≤1e-9, and the PCM oracle gates quantize
  *   through the same integer grid either way (the ~1e-12 relative
  *   reordering noise sits 9+ orders below it).
  *
  * Two instances (round 15): the 2048-point long-window kernel and the
  * 256-point short-window kernel EIGHT_SHORT_SEQUENCE frames need
  * (13818-7 §14.2: eight 256-point transforms per short frame).
  */
private[graft] object Dsp {

  /** One IMDCT size: N output samples from N/2 spectral lines, factored
    * through an N-point radix-2 FFT. N must be a power of two. */
  private final class ImdctKernel(N: Int) {
    require(N >= 4 && (N & (N - 1)) == 0, s"IMDCT size $N not a power of two")
    private val levels = Integer.numberOfTrailingZeros(N)
    private val m = N / 2

    // bit-reversal permutation and per-root twiddles, built once
    private val rev: Array[Int] =
      Array.tabulate(N)(i => Integer.reverse(i) >>> (32 - levels))
    private val twC: Array[Double] =
      Array.tabulate(m)(k => math.cos(2.0 * math.Pi * k / N))
    private val twS: Array[Double] =
      Array.tabulate(m)(k => math.sin(2.0 * math.Pi * k / N))
    // IMDCT pre-twiddle e^{−iπk/(2m)} and post-rotation angle π(p+½)/(2m)
    private val preC: Array[Double] =
      Array.tabulate(m)(k => math.cos(math.Pi * k / (2.0 * m)))
    private val preS: Array[Double] =
      Array.tabulate(m)(k => math.sin(math.Pi * k / (2.0 * m)))
    private val postC: Array[Double] =
      Array.tabulate(m)(p => math.cos(math.Pi * (p + 0.5) / (2.0 * m)))
    private val postS: Array[Double] =
      Array.tabulate(m)(p => math.sin(math.Pi * (p + 0.5) / (2.0 * m)))

    /** In-place forward complex FFT: X(n) = Σₖ x(k)·e^{−2πi·nk/N}. */
    def fft(re: Array[Double], im: Array[Double]): Unit = {
      require(re.length == N && im.length == N, s"fft needs length $N")
      var i = 0
      while (i < N) {
        val j = rev(i)
        if (j > i) {
          var t = re(i); re(i) = re(j); re(j) = t
          t = im(i); im(i) = im(j); im(j) = t
        }
        i += 1
      }
      var size = 2
      while (size <= N) {
        val half = size >> 1
        val step = N / size
        var base = 0
        while (base < N) {
          var j = 0
          var tw = 0
          while (j < half) {
            val wr = twC(tw); val wi = -twS(tw)
            val a = base + j; val b = a + half
            val tr = re(b) * wr - im(b) * wi
            val ti = re(b) * wi + im(b) * wr
            re(b) = re(a) - tr; im(b) = im(a) - ti
            re(a) += tr; im(a) += ti
            j += 1; tw += step
          }
          base += size
        }
        size <<= 1
      }
    }

    /** All N IMDCT output samples of an N/2-line spectrum at once —
      * numerically ≡ the direct sum (the unit-test reference). */
    def imdctFull(x: Array[Double]): Array[Double] = {
      require(x.length == m, s"imdct needs $m spectral lines")
      val re = new Array[Double](N)
      val im = new Array[Double](N)
      var k = 0
      while (k < m) {
        re(k) = x(k) * preC(k)
        im(k) = -x(k) * preS(k)
        k += 1
      }
      fft(re, im)
      // C(p) = Re[e^{−iθ}·U(p)] = cosθ·Ur + sinθ·Ui, scaled by 2/N = 1/m
      val out = new Array[Double](N)
      @inline def c(p: Int): Double = (postC(p) * re(p) + postS(p) * im(p)) / m
      var n = 0
      while (n < m / 2)       { out(n) = c(n + m / 2);          n += 1 }
      while (n < 3 * m / 2)   { out(n) = -c(3 * m / 2 - 1 - n); n += 1 }
      while (n < N)           { out(n) = -c(n - 3 * m / 2);     n += 1 }
      out
    }
  }

  private val k2048 = new ImdctKernel(2048)
  private val k256 = new ImdctKernel(256)

  /** In-place forward complex FFT, size 2048 (exposed for the unit
    * suite's DFT cross-check). */
  private[graft] def fft2048(re: Array[Double], im: Array[Double]): Unit =
    k2048.fft(re, im)

  /** All 2048 IMDCT output samples of a 1024-line spectrum at once —
    * numerically ≡ `Aac.imdct2048(x, n)` for n = 0..2047 (the direct
    * sum stays as the unit-test reference), ~100× cheaper. */
  def imdct2048Full(x: Array[Double]): Array[Double] = k2048.imdctFull(x)

  /** All 256 IMDCT output samples of a 128-line spectrum (round 15 —
    * the EIGHT_SHORT_SEQUENCE short-window transform, §14.2/§14.3 with
    * N = 256, n₀ = 64.5) — numerically ≡ `Aac.imdct256(x, n)`. */
  def imdct256Full(x: Array[Double]): Array[Double] = k256.imdctFull(x)

  /** Modified Bessel function I₀ (first kind, order 0) by its power
    * series Σₖ ((x/2)ᵏ/k!)² — converges fast for the KBD arguments
    * (|x| ≤ πα ≈ 19); terminated when a term falls below 1e-17 of the
    * running sum. FORMULA math, not transcription. */
  private[graft] def besselI0(x: Double): Double = {
    var sum = 1.0
    var term = 1.0
    var k = 1
    while (term > sum * 1e-17 && k < 200) {
      val t = x / (2.0 * k)
      term *= t * t
      sum += term
      k += 1
    }
    sum
  }

  /** §14.3.3 Kaiser-Bessel-derived window, LEFT (rising) half: N/2
    * values for transform size N with kernel parameter α (4 for
    * N = 2048, 6 for N = 256 per the spec):
    *   W'(j) = I₀(πα·√(1 − (2j/(N/2) − 1)²)) / I₀(πα), j = 0..N/2
    *   w(n)  = √( Σ_{j≤n} W'(j) / Σ_{j≤N/2} W'(j) ),   n = 0..N/2−1
    * The falling half is the mirror w(N−1−n). Derived entirely from
    * the closed-form kernel — no table transcription involved. */
  private def kbdHalf(n2: Int, alpha: Double): Array[Double] = {
    val kernel = Array.tabulate(n2 + 1) { j =>
      val t = 2.0 * j / n2 - 1.0
      besselI0(math.Pi * alpha * math.sqrt(math.max(0.0, 1.0 - t * t)))
    }
    val total = kernel.sum
    val out = new Array[Double](n2)
    var acc = 0.0
    var n = 0
    while (n < n2) {
      acc += kernel(n)
      out(n) = math.sqrt(acc / total)
      n += 1
    }
    out
  }

  /** KBD left halves, built once: 1024 values (N = 2048, α = 4) and
    * 128 values (N = 256, α = 6). */
  private[graft] val kbdLong: Array[Double] = kbdHalf(1024, 4.0)
  private[graft] val kbdShort: Array[Double] = kbdHalf(128, 6.0)
}
