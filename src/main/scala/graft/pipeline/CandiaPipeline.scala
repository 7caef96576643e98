package graft.pipeline

import graft.ms.{AdjustedPeak, ComponentPeaks, ParafacModelRow, SliceTensor}
import graft.ms.ops.{Decomposer, Indexing, TensorizeOp, WindowOps}
import graft.sources.{MzMLSource, MzXMLWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline configuration — the keys of the reference's experiment YAML
  * that drive stages 1–9 (test/test_experiment/config/candia.yaml:1-64). */
/** Stage-9 identification settings — the crux branch of the experiment
  * YAML (id_models_concat.py:43-49; candia.yaml `database` /
  * `decoy_database` / `decoy_prefix` / `percolator_fdr`). */
final case class IdentifyConfig(
    database: String,
    decoyDatabase: String,
    decoyPrefix: String = "reverse_",
    percolatorFdr: Double = 0.01)

final case class CandiaConfig(
    minScanIntensity: Double = 1.0, // candia.yaml: min_scan_intensity
    windowSizeSec: Double = 60.0, //   candia.yaml: window_size_sec
    massTolPpm: Double = 40.0, //      candia.yaml: mass_tol_ppm
    parafacMinComp: Int = 10, //       candia.yaml: parafac_min_comp
    parafacMaxComp: Int = 14, //       candia.yaml: parafac_max_comp
    parafacMaxIter: Int = 5000, //     candia.yaml: parafac_max_iter
    parafacTol: Double = 1e-7, //      candia.yaml: parafac_min_error_diff
    avgPeakFwhmSec: Double = 5.0, //   candia.yaml: avg_peak_fwhm_sec
    intensityCutoffBin: Int = 1, //    candia.yaml: intensity_lower_percentage_cutoff
    seed: Long = 123L)

/** Stage outputs of one end-to-end run (the in-engine replacements of
  * the reference's on-disk inter-stage artifacts). */
final case class CandiaResult(
    peaks: Dataset[AdjustedPeak],
    tensors: Dataset[SliceTensor],
    models: Dataset[ParafacModelRow],
    peakCounts: Dataset[ComponentPeaks],
    bestModels: DataFrame,
    spectrumIndex: DataFrame)

/** The whole CANDIA dataflow (reference driver script `candia:1-69`,
  * SURVEY §3.1) as ONE Spark program: the reference's 9 process-per-file
  * / process-per-slice stages with filesystem hand-offs collapse into a
  * single lineage over one SparkSession — process boundaries become
  * shuffle boundaries, Snakemake scheduling becomes Spark task
  * scheduling, and every intermediate is a Dataset that can be
  * checkpointed to partitioned parquet instead of ~10⁶ tiny files.
  */
object CandiaPipeline {

  /** Stages 1–3: mzML → tagged, RT-windowed peak table. */
  def ingest(
      spark: SparkSession,
      mzmlFiles: Seq[String],
      config: CandiaConfig): Dataset[AdjustedPeak] = {
    import spark.implicits._
    val raw = MzMLSource.read(spark, mzmlFiles,
      minIntensity = config.minScanIntensity).toDF()
    val windows = WindowOps.adjustedWindows(raw)
    WindowOps.assignRtWindows(
      WindowOps.applyAdjustment(raw, windows), config.windowSizeSec)
      .select(col("file"), col("spectrum_index"), col("level"),
        col("rt").cast("float").as("rt"),
        col("mz").cast("float").as("mz"),
        col("intensity").cast("float").as("intensity"),
        col("prec_mz").cast("float").as("prec_mz"),
        col("swath_lower_adjusted").cast("float").as("swath_lower_adjusted"),
        col("swath_upper_adjusted").cast("float").as("swath_upper_adjusted"),
        col("rt_window"))
      .as[AdjustedPeak]
  }

  /** Persist the sliced peak table to its partitioned layout and read it
    * back — the durable stage-3/4 boundary (the reference's slice
    * directories): downstream stages resume from disk and partition
    * pruning serves per-slice reads. */
  def checkpointSlices(
      spark: SparkSession,
      peaks: Dataset[AdjustedPeak],
      path: String): Dataset[AdjustedPeak] = {
    import spark.implicits._
    WindowOps.writeSlices(WindowOps.withSwathKey(peaks.toDF()), path)
    WindowOps.readSlices(spark, path)
      .select(col("file"), col("spectrum_index"), col("level"),
        col("rt"), col("mz"), col("intensity"), col("prec_mz"),
        col("swath_lower_adjusted"), col("swath_upper_adjusted"),
        col("rt_window"))
      .as[AdjustedPeak]
  }

  /** Stages 1–8: mzML files → models + best-model selection. Passing
    * `slicesPath` routes the peak table through the partitioned on-disk
    * slice layout between stages 3 and 4; passing `tensorStorePath` /
    * `modelStorePath` / `countStorePath` makes the tensorize,
    * decomposition, and CWT peak-count stages RESUMABLE (Snakemake
    * parity with the reference's file-existence DAG, `candia:6-68` +
    * `skip_completed`): a re-run anti-joins each stage's work list
    * against its store and recomputes only what's missing — with all
    * three set, a failure anywhere in the chain restarts without
    * repeating any completed stage work. */
  def run(
      spark: SparkSession,
      mzmlFiles: Seq[String],
      config: CandiaConfig = CandiaConfig(),
      slicesPath: Option[String] = None,
      modelStorePath: Option[String] = None,
      tensorStorePath: Option[String] = None,
      countStorePath: Option[String] = None): CandiaResult = {
    import spark.implicits._
    val ingested = ingest(spark, mzmlFiles, config)
    val peaks = slicesPath match {
      case Some(p) => checkpointSlices(spark, ingested, p)
      case None => ingested
    }
    val tensors = (tensorStorePath match {
      case Some(p) =>
        TensorizeOp.tensorizeResumable(spark, peaks, config.massTolPpm, p)
      case None => TensorizeOp.tensorize(spark, peaks, config.massTolPpm)
    }).persist()
    val models = (modelStorePath match {
      case Some(p) => Decomposer.runResumable(spark, tensors,
        config.parafacMinComp, config.parafacMaxComp, p,
        maxIter = config.parafacMaxIter, tol = config.parafacTol,
        seed = config.seed)
      case None => Decomposer.run(spark, tensors,
        config.parafacMinComp, config.parafacMaxComp,
        maxIter = config.parafacMaxIter, tol = config.parafacTol,
        seed = config.seed)
    }).persist()
    val counts = (countStorePath match {
      case Some(p) => Indexing.countTimeModePeaksResumable(spark, models,
        config.avgPeakFwhmSec, config.windowSizeSec, p)
      case None => Indexing.countTimeModePeaks(spark, models,
        config.avgPeakFwhmSec, config.windowSizeSec)
    }).persist()

    val windows = peaks.toDF()
      .select(col("swath_lower_adjusted")).distinct()
    val nRt = peaks.toDF().agg(max(col("rt_window"))).head().getInt(0) + 1
    val index = Indexing.modelIndex(spark, windows, nRt,
      config.parafacMinComp, config.parafacMaxComp)
    val best = Indexing.bestModels(
      Indexing.peakCountsWithModelId(counts, index), index)

    CandiaResult(peaks, tensors, models, counts, best,
      Indexing.spectrumIndex(index))
  }

  /** Stage 8 (collect_sample_modes.py:40-76): stack the SAMPLE mode of
    * every BEST model — the reference loads only the model files listed
    * in best_models.csv — with the per-component population CV, then key
    * each component by its global spectrum-index `scan` ordinal.
    * Returns (sample_modes, spectra_with_sample_abundance): the first is
    * the feather-analog long table, the second the (scan, sample_num,
    * abundance) table that search-engine PSMs quantify against. */
  def collectSampleModes(
      spark: SparkSession,
      result: CandiaResult): (DataFrame, DataFrame) = {
    val bestKeys = result.bestModels
      .select(col("swath_start_key"), col("rt_window"), col("ncomp"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val best = result.models.filter((m: ParafacModelRow) =>
      bestKeys.contains((m.swath_key, m.rt_window, m.ncomp)))
    val sm = Indexing.sampleModes(spark, best)
    (sm, Indexing.spectraWithSampleAbundance(sm, result.spectrumIndex))
  }

  /** Stage 9 prep: export EVERY mass-mode component of each best model
    * as an mzXML scan (id_models_concat.py:58-119 iterates the full
    * mass-mode matrix — unimodality picks the best MODELS upstream, it
    * does not filter components): component spectrum = the mass-mode
    * column over the slice's m/z labels; each scan is stamped with the
    * GLOBAL spectrum-index ordinal (models.py:81-117) — the same `scan`
    * spectraWithSampleAbundance keys abundances by, so search-engine
    * PSMs (which carry mzXML scan numbers) join back to the right
    * components. Returns the number of scans written (some components
    * drop out of the export via the MS2 intensity cutoff). */
  def exportBestSpectra(
      spark: SparkSession,
      result: CandiaResult,
      path: String,
      config: CandiaConfig = CandiaConfig()): Int = {
    val intensityCutoffBin = config.intensityCutoffBin
    import spark.implicits._
    val bestKeys = result.bestModels
      .select(col("swath_start_key"), col("rt_window"), col("ncomp"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .toSet
    // adjusted-window midpoints: the MS1-absent pseudo-precursor sits at
    // (lower + upper) / 2 (id_models_concat.py:85-89), NOT at the lower
    // bound
    val centerOf: Map[String, Double] = result.peaks.toDF()
      .select(col("swath_lower_adjusted"), col("swath_upper_adjusted"))
      .distinct().collect()
      .map { r =>
        val lo = r.getFloat(0).toDouble
        (graft.ms.ops.Tensorizer.swathKey(lo),
          (lo + r.getFloat(1).toDouble) / 2.0)
      }.toMap

    // global scan ids for the best models' components only (filter the
    // index on the cluster; the collected map stays |best|·F-sized)
    val scanOf: Map[(Long, Int, Int, Long), Long] = result.spectrumIndex
      .join(broadcast(result.bestModels
          .select("swath_start", "rt_window", "ncomp").distinct()),
        Seq("swath_start", "rt_window", "ncomp"))
      .select("swath_start", "rt_window", "ncomp", "spectrum_num", "scan")
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)),
        r.getLong(4)))
      .toMap

    val comps = result.models
      .filter((m: ParafacModelRow) =>
        bestKeys.contains((m.swath_key, m.rt_window, m.ncomp)))
      .collect()
      .flatMap { m =>
        val labels = m.mz_indices.map(graft.ms.ops.Tensorizer.parseLabel)
        val lower = m.swath_key.toDouble
        val cents = math.rint(lower * 100).toLong // half-even, like centsKey
        val center = centerOf.getOrElse(m.swath_key, lower)
        (0 until m.ncomp).map { k =>
          MzXMLWriter.Component(
            scanId = scanOf((cents, m.rt_window, m.ncomp, k.toLong)),
            points = labels.zipWithIndex.map { case ((lvl, mzv), i) =>
              (mzv, lvl, m.mass_mode(i * m.ncomp + k).toDouble)
            },
            isolationWindowCenter = center)
        }
      }
      .sortBy(_.scanId)
    MzXMLWriter.write(path, comps.toSeq, intensityCutoffBin)
  }

  /** Stage 9 END-TO-END (the crux branch of id_models_concat.py:37-55):
    * export the best models' component spectra to one mzXML, search it
    * with comet against the TARGET and DECOY databases, separate with
    * percolator at the configured FDR, and gather the resulting PSM
    * table back as a DataFrame. Tool execution stays behind the
    * [[graft.ext.ToolRunner]] seam — production passes
    * [[graft.ext.ProcessToolRunner]]; tests pass a mock that writes
    * golden PSM files — so the flow is testable without the binaries.
    * Directory layout mirrors the reference: `<workDir>/crux_out/
    * comet_target`, `.../comet_decoy`, percolator output in
    * `<workDir>/crux_out`. Returns (scans exported, gathered PSMs). */
  def identifyBestSpectra(
      spark: SparkSession,
      result: CandiaResult,
      workDir: String,
      id: IdentifyConfig,
      runner: graft.ext.ToolRunner,
      config: CandiaConfig = CandiaConfig()): (Int, DataFrame) = {
    import graft.ext.ToolCommands
    val mzxml = s"$workDir/best_models.mzXML"
    val cruxDir = s"$workDir/crux_out"
    val targetDir = s"$cruxDir/comet_target"
    val decoyDir = s"$cruxDir/comet_decoy"
    val nScans = exportBestSpectra(spark, result, mzxml, config)
    def runOrDie(cmd: Seq[String]): Unit = {
      val rc = runner.run(cmd)
      if (rc != 0) throw new IllegalStateException(
        s"stage 9: '${cmd.take(2).mkString(" ")}' exited with $rc")
    }
    runOrDie(ToolCommands.comet(mzxml, targetDir, id.database,
      config.massTolPpm))
    runOrDie(ToolCommands.comet(mzxml, decoyDir, id.decoyDatabase,
      config.massTolPpm))
    runOrDie(ToolCommands.percolator(
      s"$targetDir/comet.target.txt", s"$decoyDir/comet.target.txt",
      cruxDir, id.percolatorFdr, id.decoyPrefix))
    (nScans, graft.sources.PsmGather.readPsmTables(spark,
      Seq(s"$cruxDir/percolator.target.psms.txt")))
  }
}
