package graft.ms.linalg

/** Gaussian-blur imputation of missing chromatogram values
  * (semantics of decompose_parafac.py:129-153):
  *
  * For each (sample, m/z) time series: convolve the series (NaN→0) with a
  * normalized 5-tap discrete Gaussian (σ=0.5), zero-padded at the edges;
  * replace only the NaN positions with the blurred values; finally clip
  * everything at ≥ 0. Finite original values are kept untouched.
  */
object GaussianImpute {

  /** Normalized discrete Gaussian, sampled at integer offsets centered on
    * zero (astropy Gaussian1DKernel(stddev, x_size) 'center' mode). */
  def kernel(stddev: Double, size: Int): Array[Double] = {
    val half = (size - 1) / 2.0
    val raw = Array.tabulate(size) { i =>
      val x = i - half
      math.exp(-x * x / (2.0 * stddev * stddev))
    }
    val s = raw.sum
    raw.map(_ / s)
  }

  private val k5 = kernel(0.5, 5)

  /** Same-mode convolution with zero padding; NaNs in the input are
    * treated as 0 (astropy nan_treatment='fill', boundary='fill'). */
  def blurZeroFill(series: Array[Double], kern: Array[Double]): Array[Double] = {
    val n = series.length
    val half = (kern.length - 1) / 2
    val out = new Array[Double](n)
    var t = 0
    while (t < n) {
      var acc = 0.0
      var k = 0
      while (k < kern.length) {
        val idx = t + k - half
        if (idx >= 0 && idx < n) {
          val v = series(idx)
          if (!v.isNaN) acc += kern(k) * v
        }
        k += 1
      }
      out(t) = acc
      t += 1
    }
    out
  }

  /** Impute one time series in place-free fashion: NaN positions take the
    * blurred value; all outputs clipped at 0. */
  def imputeSeries(series: Array[Double]): Array[Double] = {
    val blurred = blurZeroFill(series, k5)
    Array.tabulate(series.length) { t =>
      val v = if (series(t).isNaN) blurred(t) else series(t)
      if (v < 0.0) 0.0 else v
    }
  }

  /** Impute a whole (S,T,M) row-major float tensor, per (sample, m/z)
    * chromatogram along the time axis. Returns a new Double array. */
  def imputeTensor(data: Array[Float], s: Int, t: Int, m: Int): Array[Double] = {
    val out = new Array[Double](data.length)
    var is = 0
    while (is < s) {
      var im = 0
      while (im < m) {
        val series = new Array[Double](t)
        var it = 0
        while (it < t) {
          series(it) = data((is * t + it) * m + im).toDouble
          it += 1
        }
        val imp = imputeSeries(series)
        it = 0
        while (it < t) {
          out((is * t + it) * m + im) = imp(it)
          it += 1
        }
        im += 1
      }
      is += 1
    }
    out
  }
}
