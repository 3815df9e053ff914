package graft.multimodal

/** Shared DSP kernels for the audio decoders (round 15, r14 VERDICT #4):
  * an iterative radix-2 complex FFT and the 2048-point IMDCT factored
  * through it. The direct §14.3 IMDCT sum is O(N²) — ~2 M cosines per
  * AAC frame, capping real-corpus decode at ~300 frames/s/core — while
  * this factorization is one 2048-point FFT (~22 k butterflies) plus
  * pre/post twiddles, all FORMULA math:
  *
  *   IMDCT (N = 2048, n₀ = (N/2+1)/2 = m/2 + ½, m = 1024):
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
  */
private[graft] object Dsp {
  private val N = 2048
  private val Levels = 11
  private val m = N / 2

  // bit-reversal permutation and per-root twiddles, built once
  private val rev: Array[Int] =
    Array.tabulate(N)(i => Integer.reverse(i) >>> (32 - Levels))
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

  /** In-place forward complex FFT, size 2048:
    * X(n) = Σₖ x(k)·e^{−2πi·nk/N}. */
  private[graft] def fft2048(re: Array[Double], im: Array[Double]): Unit = {
    require(re.length == N && im.length == N, s"fft2048 needs length $N")
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

  /** All 2048 IMDCT output samples of a 1024-line spectrum at once —
    * numerically ≡ `Aac.imdct2048(x, n)` for n = 0..2047 (the direct
    * sum stays as the unit-test reference), ~100× cheaper. */
  def imdct2048Full(x: Array[Double]): Array[Double] = {
    require(x.length == m, s"imdct needs $m spectral lines")
    val re = new Array[Double](N)
    val im = new Array[Double](N)
    var k = 0
    while (k < m) {
      re(k) = x(k) * preC(k)
      im(k) = -x(k) * preS(k)
      k += 1
    }
    fft2048(re, im)
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
