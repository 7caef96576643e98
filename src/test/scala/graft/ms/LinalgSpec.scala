package graft.ms

import graft.ms.linalg.{GaussianImpute, RickerCwt}
import org.scalatest.funsuite.AnyFunSuite

class GaussianImputeSpec extends AnyFunSuite {

  test("kernel is a normalized discrete Gaussian (σ=0.5, 5 taps)") {
    val k = GaussianImpute.kernel(0.5, 5)
    assert(math.abs(k.sum - 1.0) < 1e-12)
    assert(k(2) > k(1) && k(1) > k(0))
    assert(k(0) == k(4) && k(1) == k(3))
    // exp(-2)/norm ≈ 0.10645
    assert(math.abs(k(1) - 0.10645) < 1e-4)
  }

  test("imputeSeries fills only NaNs, keeps finite values, clips at 0") {
    val s = Array(1.0, Double.NaN, 3.0, -2.0, Double.NaN)
    val out = GaussianImpute.imputeSeries(s)
    assert(out(0) == 1.0 && out(2) == 3.0)
    assert(out(3) == 0.0) // clipped
    assert(!out(1).isNaN && out(1) > 0.0) // blurred from neighbors 1 and 3
    assert(out.forall(_ >= 0.0))
  }

  test("imputeTensor runs chromatograms along the time axis") {
    // (1 sample, 3 cycles, 2 mz): column 0 has a NaN at t=1
    val data = Array[Float](10f, 5f, Float.NaN, 5f, 10f, 5f)
    val out = GaussianImpute.imputeTensor(data, 1, 3, 2)
    assert(out(0) == 10.0 && out(4) == 10.0)
    assert(out(2) > 0.0 && !out(2).isNaN) // imputed from 10s above/below
    assert(out(1) == 5.0 && out(3) == 5.0 && out(5) == 5.0)
  }
}

class RickerCwtSpec extends AnyFunSuite {

  private def gaussian(n: Int, center: Double, sigma: Double): Array[Double] =
    Array.tabulate(n)(i => math.exp(-(i - center) * (i - center) / (2 * sigma * sigma)))

  test("ricker wavelet shape") {
    val r = RickerCwt.ricker(11, 2.0)
    assert(r(5) == r.max) // peak at center
    assert(r(0) < 0.0 || math.abs(r(0)) < r(5)) // negative lobes
    assert(math.abs(r(4) - r(6)) < 1e-12) // symmetric
  }

  test("convolveSame matches numpy 'same' semantics") {
    // np.convolve([1,2,3,4,5], [1,1,1], 'same') = [3,6,9,12,9]
    val out = RickerCwt.convolveSame(Array(1, 2, 3, 4, 5.0), Array(1, 1, 1.0))
    assert(out.toSeq == Seq(3.0, 6.0, 9.0, 12.0, 9.0))
    // even kernel: np.convolve([1,2,3,4], [1,1], 'same') = [1,3,5,7]
    val out2 = RickerCwt.convolveSame(Array(1, 2, 3, 4.0), Array(1, 1.0))
    assert(out2.toSeq == Seq(1.0, 3.0, 5.0, 7.0))
  }

  test("single Gaussian peak counts as one") {
    val profile = gaussian(40, 20, 2.5)
    assert(RickerCwt.countPeaks(profile, expectedPeakWidth = 4.0) == 1)
  }

  test("two well-separated peaks give two peak clusters") {
    // The scipy-faithful algorithm can emit adjacent duplicate maxima
    // (even-length ricker kernels shift rows by half a sample, which can
    // split a ridge); peak POSITIONS must still cluster at the two true
    // apexes.
    val profile = gaussian(60, 15, 2.0).zip(gaussian(60, 45, 2.0)).map(t => t._1 + t._2)
    val mx = profile.max
    val clipped = profile.map(v => if (v <= mx * 0.1) 0.0 else v)
    val widths = Array.tabulate(7)(i => 1.0 + i)
    val peaks = RickerCwt.findPeaks(clipped, widths)
    assert(peaks.nonEmpty)
    assert(peaks.forall(p => (p - 15).abs <= 1 || (p - 45).abs <= 1),
      s"stray peak in ${peaks.mkString(",")}")
    assert(peaks.exists(p => (p - 15).abs <= 1) && peaks.exists(p => (p - 45).abs <= 1))
  }

  test("zero and empty profiles count zero") {
    assert(RickerCwt.countPeaks(Array.fill(30)(0.0), 4.0) == 0)
    assert(RickerCwt.countPeaks(Array.empty[Double], 4.0) == 0)
  }

  test("percentile matches scipy scoreatpercentile interpolation") {
    assert(RickerCwt.percentile(Array(1.0, 2.0, 3.0, 4.0), 50) == 2.5)
    assert(math.abs(RickerCwt.percentile(Array(1.0, 2.0, 3.0), 10) - 1.2) < 1e-12)
    assert(RickerCwt.percentile(Array(5.0), 10) == 5.0)
  }
}
