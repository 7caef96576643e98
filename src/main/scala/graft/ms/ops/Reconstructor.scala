package graft.ms.ops

import graft.ms.{ParafacModelRow, SliceTensor}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Stage-9 prep: reconstruct the (cycle × m/z) map of one scan (sample)
  * from a model's unimodal components (reconstruct_scan.py:52-134):
  *
  *   map = Σ_{k unimodal} outer(time[:,k], mass[:,k]) · sample[scanIdx,k]
  *   scale = slice[scanIdx][argmax(map)] · R² / max(map)   (argmax clipped
  *   to the sample's slab; first maximum in row-major order)
  *
  * then melted to long (cycle, mz, level, intensity) rows.
  */
object Reconstructor {

  final case class ReconstructedPoint(
      swath_key: String,
      rt_window: Int,
      ncomp: Int,
      cycle: Int,
      mz: String,
      level: Int,
      intensity: Float)

  def reconstructMap(
      model: ParafacModelRow,
      tensor: SliceTensor,
      unimodalComps: Seq[Int],
      scanNum: Int): Seq[ReconstructedPoint] = {
    if (unimodalComps.isEmpty) return Nil
    val t = model.n_cycles
    val m = model.n_mz
    val f = model.ncomp
    // samples are stored sorted, so scanNum indexes directly
    val scanIdx = scanNum

    val map = new Array[Double](t * m)
    unimodalComps.foreach { k =>
      val w = model.sample_mode(scanIdx * f + k).toDouble
      var it = 0
      while (it < t) {
        val tv = model.time_mode(it * f + k).toDouble * w
        var im = 0
        while (im < m) {
          map(it * m + im) += tv * model.mass_mode(im * f + k).toDouble
          im += 1
        }
        it += 1
      }
    }

    var maxV = Double.NegativeInfinity
    var argmax = 0
    var i = 0
    while (i < map.length) {
      if (map(i) > maxV) { maxV = map(i); argmax = i }
      i += 1
    }
    var ax = argmax / m
    var ay = argmax % m
    if (ax >= tensor.n_cycles) ax = tensor.n_cycles - 1
    if (ay >= tensor.n_mz) ay = tensor.n_mz - 1
    val sliceValue = tensor(scanIdx, ax, ay).toDouble
    val scale = if (maxV != 0.0) sliceValue * model.rsq / maxV else 0.0

    val labels = model.mz_indices.map(Tensorizer.parseLabel)
    (0 until t).flatMap { cyc =>
      (0 until m).map { im =>
        val (lvl, mzv) = labels(im)
        ReconstructedPoint(model.swath_key, model.rt_window, model.ncomp,
          // pyFormat for convention; values are parsed 4-dp labels, so
          // re-formatting is an exact round-trip under either tie rule
          cyc, Tensorizer.pyFormat(mzv, 4),
          lvl, (map(cyc * m + im) * scale).toFloat)
      }
    }
  }

  /** Reconstruct scan `scanNum` for every (model ⨝ its slice tensor),
    * restricted to unimodal components (npeaks == 1). */
  def run(
      spark: SparkSession,
      models: Dataset[ParafacModelRow],
      tensors: Dataset[SliceTensor],
      peakCounts: DataFrame,
      scanNum: Int = 0): Dataset[ReconstructedPoint] = {
    import spark.implicits._
    val unimodal = peakCounts
      .filter(org.apache.spark.sql.functions.col("npeaks") === 1)
      .select("swath_key", "rt_window", "ncomp", "comp_num")
      .as[(String, Int, Int, Int)]
      .groupByKey((r: (String, Int, Int, Int)) => (r._1, r._2, r._3))

    val modelsByKey =
      models.groupByKey((mr: ParafacModelRow) => (mr.swath_key, mr.rt_window, mr.ncomp))

    // model ⨝ its unimodal component list (models without one are dropped,
    // reconstruct_scan.py:86-88)
    val withComps = modelsByKey.cogroup(unimodal) { (key, ms, cs) =>
      val comps = cs.map(_._4).toSeq.sorted
      if (comps.isEmpty) Iterator.empty
      else ms.map(m => (key._1, key._2, m, comps))
    }

    val tensorsByKey =
      tensors.groupByKey((st: SliceTensor) => (st.swath_key, st.rt_window))
    val withCompsByKey = withComps.groupByKey(
      (r: (String, Int, ParafacModelRow, Seq[Int])) => (r._1, r._2))

    withCompsByKey.cogroup(tensorsByKey) { (_, mIt, tIt) =>
      val ts = tIt.toSeq
      if (ts.isEmpty) Iterator.empty
      else mIt.flatMap { case (_, _, m, comps) =>
        reconstructMap(m, ts.head, comps, scanNum)
      }
    }
  }
}
