package graft.ms.linalg

import scala.collection.mutable.ArrayBuffer

/** Continuous-wavelet-transform peak detection, re-derived from the
  * published SciPy 1.2 `find_peaks_cwt` algorithm (the reference counts
  * elution-profile peaks with it, collect_time_mode_values.py:79-87):
  *
  *  1. CWT matrix: convolve the signal with Ricker ("Mexican hat")
  *     wavelets at each width (kernel length min(10·width, n), 'same').
  *  2. Identify ridge lines by connecting per-row relative maxima from the
  *     largest width down, within max_distances(row) = width/4, allowing
  *     gaps up to ceil(widths(0)) rows.
  *  3. Filter ridge lines: length ≥ ceil(nWidths/4) and SNR ≥ 1, where
  *     noise is the 10th percentile of |row0| in a centered window of
  *     ceil(n/20) points.
  *  4. Peaks = first-row columns of surviving lines.
  */
object RickerCwt {

  /** Ricker wavelet: A(1 − x²/a²)·exp(−x²/2a²), A = 2/(√(3a)·π^¼),
    * sampled at x = i − (points−1)/2. */
  def ricker(points: Int, a: Double): Array[Double] = {
    val amp = 2.0 / (math.sqrt(3.0 * a) * math.pow(math.Pi, 0.25))
    Array.tabulate(points) { i =>
      val x = i - (points - 1) / 2.0
      val xa = x / a
      amp * (1.0 - xa * xa) * math.exp(-x * x / (2.0 * a * a))
    }
  }

  /** 'same'-mode linear convolution (numpy semantics: centered slice of
    * the full convolution, output length = input length; requires
    * kernel.length <= data.length). */
  def convolveSame(data: Array[Double], kern: Array[Double]): Array[Double] = {
    val n = data.length
    val m = kern.length
    val out = new Array[Double](n)
    val off = (m - 1) / 2
    var i = 0
    while (i < n) {
      val full = i + off // index into the full convolution
      var acc = 0.0
      var j = math.max(0, full - m + 1)
      val jMax = math.min(n - 1, full)
      while (j <= jMax) {
        acc += data(j) * kern(full - j)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    out
  }

  def cwt(data: Array[Double], widths: Array[Double]): Array[Array[Double]] =
    widths.map { w =>
      val points = math.min((10 * w).toInt, data.length)
      convolveSame(data, ricker(math.max(points, 1), w))
    }

  /** Strict relative maxima of a row, order 1, edges clipped (an edge
    * point compares against itself and is never a maximum). */
  private def relativeMaxima(row: Array[Double]): Array[Int] = {
    val out = ArrayBuffer.empty[Int]
    var i = 1
    while (i < row.length - 1) {
      if (row(i) > row(i - 1) && row(i) > row(i + 1)) out += i
      i += 1
    }
    out.toArray
  }

  private final class Line(row0: Int, col0: Int) {
    val rows = ArrayBuffer(row0)
    val cols = ArrayBuffer(col0)
    var gap = 0
  }

  /** Linear-interpolated percentile of the given slice (scipy
    * scoreatpercentile semantics). */
  def percentile(values: Array[Double], per: Double): Double = {
    val sorted = values.sorted
    if (sorted.length == 1) return sorted(0)
    val idx = per / 100.0 * (sorted.length - 1)
    val lo = idx.toInt
    val frac = idx - lo
    if (lo + 1 >= sorted.length) sorted.last
    else sorted(lo) * (1 - frac) + sorted(lo + 1) * frac
  }

  /** Peak indices per the pipeline above; `widths` as produced by
    * arange(1, 2·expectedWidth). */
  def findPeaks(
      data: Array[Double],
      widths: Array[Double],
      minSnr: Double = 1.0,
      noisePerc: Double = 10.0): Array[Int] = {
    if (data.isEmpty || widths.isEmpty) return Array.empty

    val mat = cwt(data, widths)
    val gapThresh = math.ceil(widths(0))
    val maxDistances = widths.map(_ / 4.0)

    val maximaPerRow = mat.map(relativeMaxima)
    val hasRelMax = maximaPerRow.zipWithIndex.filter(_._1.nonEmpty).map(_._2)
    if (hasRelMax.isEmpty) return Array.empty

    val startRow = hasRelMax.last
    var ridge = maximaPerRow(startRow).map(c => new Line(startRow, c)).toBuffer
    val finals = ArrayBuffer.empty[Line]

    var row = startRow - 1
    while (row >= 0) {
      ridge.foreach(_.gap += 1)
      // scipy snapshots the line list AND each line's last column before
      // iterating this row's maxima (_identify_ridge_lines builds
      // prev_ridge_cols once per row): lines created or extended earlier
      // in the same row are matched by their pre-row state, never their
      // freshly appended columns.
      val snapshot = ridge.toArray
      val prevCols = snapshot.map(_.cols.last)
      maximaPerRow(row).foreach { colIdx =>
        // connect to the closest pre-row ridge column within range
        // (first index wins ties, like np.argmin)
        var bestIdx = -1
        var bestDiff = Double.MaxValue
        var i = 0
        while (i < prevCols.length) {
          val diff = math.abs(colIdx - prevCols(i)).toDouble
          if (diff < bestDiff) { bestDiff = diff; bestIdx = i }
          i += 1
        }
        if (bestIdx >= 0 && bestDiff <= maxDistances(row)) {
          val best = snapshot(bestIdx)
          best.cols += colIdx
          best.rows += row
          best.gap = 0
        } else {
          ridge += new Line(row, colIdx)
        }
      }
      val (dead, alive) = ridge.partition(_.gap > gapThresh)
      finals ++= dead
      ridge = alive
      row -= 1
    }

    val n = data.length
    val minLength = math.ceil(mat.length / 4.0)
    val windowSize = math.ceil(n / 20.0).toInt
    val hfWindow = windowSize / 2
    val odd = windowSize % 2
    val row0 = mat(0)
    val noises = Array.tabulate(n) { i =>
      val start = math.max(i - hfWindow, 0)
      val end = math.min(i + hfWindow + odd, n)
      percentile(row0.slice(start, end), noisePerc)
    }

    val peaks = (finals ++ ridge).iterator
      .map { line =>
        // sort points by ascending row; the line's anchor is its
        // smallest-width point
        val order = line.rows.zip(line.cols).sortBy(_._1)
        (order.map(_._1).toArray, order.map(_._2).toArray)
      }
      .filter { case (rows, cols) =>
        rows.length >= minLength && {
          val snr = math.abs(mat(rows(0))(cols(0)) / noises(cols(0)))
          snr >= minSnr
        }
      }
      .map(_._2(0))
      .toArray
    peaks.sorted
  }

  /** Reference usage: clip values ≤ 10% of max to zero, then count peaks
    * with widths 1..2·expectedWidth (collect_time_mode_values.py:79-87). */
  def countPeaks(profile: Array[Double], expectedPeakWidth: Double): Int = {
    val mx = if (profile.isEmpty) 0.0 else profile.max
    val clipped = profile.map(v => if (v <= mx * 0.1) 0.0 else v)
    val nWidths = math.ceil(expectedPeakWidth * 2).toInt - 1
    if (nWidths < 1) return 0
    val widths = Array.tabulate(nWidths)(i => 1.0 + i)
    findPeaks(clipped, widths).length
  }
}
