package graft.ms.ops

import graft.ms.{ParafacModelRow, SliceTensor}
import graft.ms.linalg.{GaussianImpute, NNParafac}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Stage-5: non-negative PARAFAC over every (slice, F) pair.
  *
  * Mirrors decompose_parafac.py's main flow: trivial-tensor guard
  * (:289-295), Gaussian NaN imputation (:129-153), then the
  * multiplicative-update ALS at each rank in [fMin, fMax] with seed 123
  * (:73-79, 456). Each (slice, F) decomposition is independent; the
  * reference fanned them out as processes over GPUs via CUDA MPS
  * (decompose_workstation.sh:9-46) — here they are Spark tasks.
  *
  * Scale notes: tensors are exploded to (slice, F) pairs and
  * repartitioned so a 1000-executor cluster load-balances individual
  * decompositions (wall-clock is bounded by the slowest single
  * decomposition, not the slowest slice × |F| chain). The duplicated
  * tensor shuffle is bounded: slice tensors are ≤ a few MB by
  * construction.
  */
object Decomposer {

  def isTrivial(t: SliceTensor): Boolean =
    t.n_samples < 2 || t.n_cycles < 3 || t.n_mz < 3

  /** Impute + decompose one slice at one rank. */
  def decomposeSlice(
      t: SliceTensor,
      rank: Int,
      maxIter: Int,
      tol: Double,
      seed: Long): ParafacModelRow = {
    val x = GaussianImpute.imputeTensor(t.data, t.n_samples, t.n_cycles, t.n_mz)
    val res = NNParafac.decompose(x, t.n_samples, t.n_cycles, t.n_mz,
      rank, maxIter, tol, seed)
    def rowMajor(mi: breeze.linalg.DenseMatrix[Double]): Array[Float] = {
      val out = new Array[Float](mi.rows * mi.cols)
      var r = 0
      while (r < mi.rows) {
        var c = 0
        while (c < mi.cols) { out(r * mi.cols + c) = mi(r, c).toFloat; c += 1 }
        r += 1
      }
      out
    }
    ParafacModelRow(
      swath_key = t.swath_key,
      rt_window = t.rt_window,
      ncomp = rank,
      n_samples = t.n_samples,
      n_cycles = t.n_cycles,
      n_mz = t.n_mz,
      samples = t.samples,
      mz_indices = t.mz_indices,
      sample_mode = rowMajor(res.factors(0)),
      time_mode = rowMajor(res.factors(1)),
      mass_mode = rowMajor(res.factors(2)),
      rsq = NNParafac.rsq(res.recError),
      iterations = res.iterations)
  }

  def run(
      spark: SparkSession,
      slices: Dataset[SliceTensor],
      fMin: Int,
      fMax: Int,
      maxIter: Int = 5000,
      tol: Double = 1e-7,
      seed: Long = 123L): Dataset[ParafacModelRow] = {
    import spark.implicits._
    val nPairs = math.max(spark.sparkContext.defaultParallelism,
      (slices.rdd.getNumPartitions * (fMax - fMin + 1)))
    slices
      .filter((t: SliceTensor) => !isTrivial(t))
      .flatMap(t => (fMin to fMax).map(f => (t, f)))
      .repartition(nPairs)
      .map { case (t, f) => decomposeSlice(t, f, maxIter, tol, seed) }
  }

  /** The reference's `skip_completed` resume (decompose_parafac
    * .py:74-76) over a durable model store: models persist as parquet at
    * `modelStorePath`; a resumed run anti-joins the (slice, F) work list
    * against the store's existing (swath_key, rt_window, ncomp) keys —
    * distributed, no driver-side listing — decomposes only the
    * remainder, and appends. After a partial failure at 100 TB only the
    * missing decompositions recompute. Returns the full store. */
  def runResumable(
      spark: SparkSession,
      slices: Dataset[SliceTensor],
      fMin: Int,
      fMax: Int,
      modelStorePath: String,
      maxIter: Int = 5000,
      tol: Double = 1e-7,
      seed: Long = 123L): Dataset[ParafacModelRow] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val pairs = slices
      .filter((t: SliceTensor) => !isTrivial(t))
      .flatMap(t => (fMin to fMax).map(f => (t, f)))
    val storePath = new org.apache.hadoop.fs.Path(modelStorePath)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val todo =
      if (!fs.exists(storePath)) pairs
      else {
        val done = spark.read.parquet(modelStorePath)
          .select(col("swath_key"), col("rt_window"), col("ncomp"))
          .distinct()
        pairs.toDF().join(done,
          col("_1.swath_key") === done("swath_key") &&
            col("_1.rt_window") === done("rt_window") &&
            col("_2") === done("ncomp"),
          "left_anti").as[(SliceTensor, Int)]
      }
    val nPairs = math.max(spark.sparkContext.defaultParallelism,
      (slices.rdd.getNumPartitions * (fMax - fMin + 1)))
    todo
      .repartition(nPairs)
      .map { case (t, f) => decomposeSlice(t, f, maxIter, tol, seed) }
      .write.mode("append").parquet(modelStorePath)
    spark.read.parquet(modelStorePath).as[ParafacModelRow]
  }
}
