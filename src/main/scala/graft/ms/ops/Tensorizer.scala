package graft.ms.ops

import graft.ms.{AdjustedPeak, SliceTensor}

import scala.collection.mutable

/** Stage-4 tensorization: turn one (swath, rt-window) slice of the peak
  * table into a dense (sample × cycle × m/z-partition) float32 tensor
  * (semantics of generate_slice_tensor.py:34-233).
  *
  * Steps per slice:
  *  1. sample axis = sorted distinct file names
  *  2. per sample, bin rows into scan cycles delimited by that sample's
  *     MS1 acquisition times ([closed, open) bins, last bin closed by
  *     +0.1; rows outside any bin — MS2 "tails" from neighbouring
  *     slices — are dropped)                  (:99-145)
  *  3. greedy ppm m/z partitioning per MS level over the whole slice's
  *     distinct m/z values; label = "%.4f" of the partition start +
  *     "_ms<level>"                           (:181-233)
  *  4. sum intensities per (sample, cycle, partition)   (:170-178)
  *  5. drop partitions whose best-covered sample has < 5 cycles (:154-167)
  *  6. pivot: per sample the rows are its observed cycles in ascending
  *     order; columns are all surviving labels sorted by (level, m/z);
  *     missing entries NaN; samples NaN-padded to the longest (:67-96)
  *
  * This is deliberately a sequential per-slice kernel (the greedy
  * partitioner is order-dependent, SURVEY §7.3): Spark parallelism is
  * ACROSS slices via groupByKey, never within one.
  */
object Tensorizer {

  sealed trait TensorizeError { def message: String }
  case object NoMs1Times extends TensorizeError { val message = "No MS 1 acquisition times found" }
  final case class EmptyMsLevel(level: Int) extends TensorizeError {
    def message = s"MS $level completely empty"
  }
  case object TooFewPoints extends TensorizeError {
    val message = "Too few data points across all samples"
  }

  val MinPointsPerSample = 5

  def ppmTol(mz: Double, ppm: Double): Double = mz * ppm / 1e6

  /** Python-format parity: "{:.Nf}" rounds the EXACT binary value of the
    * double half-even, while Java's %.Nf rounds HALF_UP — a dyadic tie
    * like 100.03125 formats "100.0312" in Python but "100.0313" in Java.
    * new BigDecimal(v) is the exact binary expansion, so setScale(n,
    * HALF_EVEN) reproduces Python/NumPy behavior exactly. */
  def pyFormat(v: Double, scale: Int): String =
    new java.math.BigDecimal(v)
      .setScale(scale, java.math.RoundingMode.HALF_EVEN).toPlainString

  /** The slice partition key: "{:.2f}" of the adjusted lower bound
    * (Python tie behavior) — must stay consistent with
    * WindowOps.withSwathKey's column-level key. */
  def swathKey(lower: Double): String = pyFormat(lower, 2)

  /** Greedy partition starts over a sorted distinct m/z list: open a new
    * partition when the distance from the current start exceeds the ppm
    * tolerance OF THE START (generate_slice_tensor.py:213-229). */
  def partitionStarts(sortedMz: Seq[Double], ppm: Double): Seq[Double] = {
    if (sortedMz.isEmpty) return Nil
    val starts = mutable.ArrayBuffer(sortedMz.head)
    var cur = sortedMz.head
    var tol = ppmTol(cur, ppm)
    sortedMz.foreach { mz =>
      if (mz - cur > tol) {
        starts += mz
        cur = mz
        tol = ppmTol(cur, ppm)
      }
    }
    starts.toSeq
  }

  /** Map each m/z to its partition start (the greatest start ≤ mz). */
  def assignPartition(starts: IndexedSeq[Double], mz: Double): Double = {
    var lo = 0
    var hi = starts.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (starts(mid) <= mz) lo = mid else hi = mid - 1
    }
    starts(lo)
  }

  /** Cycle index for an rt against sorted MS1 times: bin i covers
    * [t(i), t(i+1)) with a final bin [t(last), t(last)+0.1). Returns -1
    * when outside all bins. */
  def cycleOf(ms1Times: IndexedSeq[Double], rt: Double): Int = {
    if (ms1Times.isEmpty || rt < ms1Times.head) return -1
    if (rt >= ms1Times.last + 0.1) return -1
    var lo = 0
    var hi = ms1Times.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (ms1Times(mid) <= rt) lo = mid else hi = mid - 1
    }
    lo
  }

  def label(partitionStart: Double, level: Int): String =
    pyFormat(partitionStart, 4) + "_ms" + level

  /** Parse "350.1284_ms2" → (level, mz) for column ordering. */
  def parseLabel(lbl: String): (Int, Double) = {
    val parts = lbl.split("_ms")
    (parts(1).toInt, parts(0).toDouble)
  }

  /** Tensorize one slice's rows. Pure, deterministic. Consumes the
    * iterator in ONE pass into per-sample buffers (no whole-slice Seq +
    * groupBy double materialization — the slice is stored once). */
  def tensorize(
      swathKey: String,
      rtWindow: Int,
      rows: Iterator[AdjustedPeak],
      mzTolPpm: Double,
      // the reference's remove_infrequent_points threshold
      // (generate_slice_tensor.py:155); parameterized so the resurrected
      // toy golden (whose points are all infrequent) can assert the pure
      // partition/binning/pivot semantics with the filter disabled
      minPointsPerSample: Int = MinPointsPerSample)
      : Either[TensorizeError, SliceTensor] = {

    val rowsBySample = mutable.HashMap.empty[String, mutable.ArrayBuffer[AdjustedPeak]]
    rows.foreach(r =>
      rowsBySample.getOrElseUpdate(r.file, mutable.ArrayBuffer.empty) += r)
    val samples = rowsBySample.keys.toSeq.sorted
    val sampleNo = samples.zipWithIndex.toMap
    val binned = mutable.ArrayBuffer.empty[(Int, Int, Int, Double, Double)]
    // (sampleNo, cycle, level, mz, intensity)
    for (sample <- samples) {
      val sRows = rowsBySample(sample)
      val ms1 = sRows.iterator
        .filter(_.level == 1).map(_.rt.toDouble).toSet.toIndexedSeq.sorted
      if (ms1.isEmpty) return Left(NoMs1Times)
      sRows.foreach { r =>
        val c = cycleOf(ms1, r.rt.toDouble)
        if (c >= 0)
          binned += ((sampleNo(sample), c, r.level, r.mz.toDouble, r.intensity.toDouble))
      }
    }

    // 3. greedy ppm partitioning per level over the whole slice
    val startsByLevel: Map[Int, IndexedSeq[Double]] = (1 to 2).map { lvl =>
      val mzs = binned.iterator.collect { case (_, _, l, mz, _) if l == lvl => mz }
        .toSet.toIndexedSeq.sorted
      if (mzs.isEmpty) return Left(EmptyMsLevel(lvl))
      lvl -> partitionStarts(mzs, mzTolPpm).toIndexedSeq
    }.toMap

    // 4. aggregate intensities per (sample, cycle, label)
    val sums = mutable.LinkedHashMap.empty[(Int, Int, String), Double]
    binned.foreach { case (s, c, lvl, mz, i) =>
      val lbl = label(assignPartition(startsByLevel(lvl), mz), lvl)
      val key = (s, c, lbl)
      sums(key) = sums.getOrElse(key, 0.0) + i
    }

    // 5. infrequent-partition filter: max cycle-count across samples ≥ 5
    val cyclesPerSamplePartition = mutable.Map.empty[(Int, String), Int]
    sums.keysIterator.foreach { case (s, _, lbl) =>
      val k = (s, lbl)
      cyclesPerSamplePartition(k) = cyclesPerSamplePartition.getOrElse(k, 0) + 1
    }
    val maxAcrossSamples = mutable.Map.empty[String, Int]
    cyclesPerSamplePartition.foreach { case ((_, lbl), n) =>
      maxAcrossSamples(lbl) = math.max(maxAcrossSamples.getOrElse(lbl, 0), n)
    }
    val keptLabels = maxAcrossSamples.collect {
      case (lbl, n) if n >= minPointsPerSample => lbl
    }.toSet
    val kept = sums.view.filterKeys { case (_, _, lbl) => keptLabels(lbl) }.toMap
    if (kept.isEmpty) return Left(TooFewPoints)

    // 6. pivot: columns sorted by (level, mz); per-sample observed cycles
    val mzIndices = keptLabels.toSeq.sortBy(parseLabel)
    val colOf = mzIndices.zipWithIndex.toMap
    val cyclesBySample: Map[Int, IndexedSeq[Int]] = kept.keysIterator
      .map { case (s, c, _) => (s, c) }.toSeq.distinct
      .groupBy(_._1).map { case (s, cs) => s -> cs.map(_._2).distinct.sorted.toIndexedSeq }

    val presentSamples = cyclesBySample.keys.toSeq.sorted
    val nCycles = cyclesBySample.values.map(_.length).max
    val nMz = mzIndices.length
    val nS = presentSamples.length
    val data = Array.fill[Float](nS * nCycles * nMz)(Float.NaN)

    val siOf = presentSamples.zipWithIndex.toMap
    val rowOfBySample = cyclesBySample.map { case (s, cs) => s -> cs.zipWithIndex.toMap }
    kept.foreach { case ((s, c, lbl), v) =>
      data((siOf(s) * nCycles + rowOfBySample(s)(c)) * nMz + colOf(lbl)) = v.toFloat
    }

    Right(SliceTensor(
      swath_key = swathKey,
      rt_window = rtWindow,
      samples = presentSamples.map(samples(_)),
      mz_indices = mzIndices,
      n_samples = nS,
      n_cycles = nCycles,
      n_mz = nMz,
      data = data))
  }
}
