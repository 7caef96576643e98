package graft.ext

/** One step of an external-tool chain: a named command with its input
  * and output artifact paths. `command` is a thunk because some argv
  * values are read from a PREDECESSOR's output artifact at chain-run
  * time (the reference computes SpectraST's probability cutoff from
  * Mayu's mFDR table in the rule shell, build_library.Snakefile:75-101)
  * — evaluating it before the predecessor ran would read a missing
  * file. */
final case class ToolStep(
    name: String,
    command: () => Seq[String],
    inputs: Seq[String],
    outputs: Seq[String],
    env: Map[String, String] = Map.empty)

/** Stages 10–12 as DECLARATIVE tool chains — the rule-dependency
  * ordering of the reference's Snakefiles (`build_library.Snakefile`,
  * `diann.Snakefile`, `sequence_best_models.Snakefile`) encoded as
  * ordered [[ToolStep]] sequences over the [[ToolCommands]] builders,
  * executed behind the [[ToolRunner]] seam. [[LibraryBuildPlan.run]]
  * reproduces Snakemake's file-existence semantics: a step whose
  * outputs all exist is skipped on a resumed run.
  */
object LibraryBuildPlan {

  /** Stage-10 configuration (candia.yaml's quant-library block). */
  final case class LibraryConfig(
      libDir: String,
      bestModelsMzxml: String,
      mixedDatabase: String,
      decoyPrefix: String,
      massTolPpm: Double,
      mayuFdr: Double,
      mayuPath: String,
      swathWindowsTsv: String,
      quantLibraryTsv: String,
      lowerMzFrag: Double = 350,
      upperMzFrag: Double = 2000,
      maxFragAnnotErr: Double = 0.05)

  /** Minimum iProphet probability at which the protein FDR clears the
    * threshold: the smallest value of the 5th column of Mayu's mFDR
    * PSM table (the `sort -g | head -1` of the spectrast rule). */
  def mayuCutoff(mayuCsvPath: String): Double = {
    val src = scala.io.Source.fromFile(mayuCsvPath)
    try src.getLines().drop(1)
      .map(_.split(",")(4).toDouble).min
    finally src.close()
  }

  /** Stage 10 (build_library.Snakefile:14-131): Comet on the mixed
    * target-decoy database → PeptideProphet significance → Mayu
    * protein-level FDR → SpectraST library at the Mayu-derived
    * probability cutoff → OpenSWATH transition TSV. */
  def libraryChain(c: LibraryConfig): Seq[ToolStep] = {
    val pepXml = s"${c.libDir}/comet.target.pep.xml"
    val mayuBase = s"${c.libDir}/comet.target"
    val mayuCsv = s"${mayuBase}_psm_mFDR${ToolCommands.fmt(
      c.mayuFdr)}_t_1.08.csv"
    val libBasename = s"${c.libDir}/best_models_library.xml"
    val sptxt = s"$libBasename.sptxt"
    Seq(
      ToolStep("comet",
        () => ToolCommands.comet(c.bestModelsMzxml, c.libDir,
          c.mixedDatabase, c.massTolPpm),
        inputs = Seq(c.bestModelsMzxml),
        outputs = Seq(pepXml)),
      ToolStep("peptide_prophet",
        () => ToolCommands.peptideProphet(pepXml, c.decoyPrefix),
        inputs = Seq(pepXml),
        outputs = Seq(s"${c.libDir}/peptide_prophet.DONE")),
      ToolStep("mayu",
        () => ToolCommands.mayu(c.mayuPath, pepXml, c.mixedDatabase,
          c.decoyPrefix, c.mayuFdr, mayuBase),
        inputs = Seq(pepXml, s"${c.libDir}/peptide_prophet.DONE"),
        outputs = Seq(s"${c.libDir}/mayu.DONE", mayuCsv)),
      ToolStep("spectrast",
        () => ToolCommands.spectrast(libBasename, mayuCutoff(mayuCsv),
          pepXml),
        inputs = Seq(pepXml, mayuCsv),
        outputs = Seq(sptxt)),
      ToolStep("spectrast2openswath",
        () => ToolCommands.spectrast2openswath(c.lowerMzFrag,
          c.upperMzFrag, c.maxFragAnnotErr, c.swathWindowsTsv,
          c.quantLibraryTsv, sptxt),
        inputs = Seq(sptxt, c.swathWindowsTsv),
        outputs = Seq(c.quantLibraryTsv)))
  }

  /** Stage 11, library-free mode (diann.Snakefile `diann_library_free`):
    * one DIA-NN invocation producing report + spectral library. */
  def diannLibraryFreeChain(
      inputFiles: Seq[String], outDir: String, fasta: String,
      trainLib: String, threads: Int): Seq[ToolStep] = {
    val report = s"$outDir/report_libfree.tsv"
    val library = s"$outDir/library.tsv"
    val genes = s"$outDir/report.genes.tsv"
    Seq(ToolStep("diann_library_free",
      () => ToolCommands.diannLibraryFree(inputFiles, report, genes,
        library, fasta, trainLib, threads),
      inputs = inputFiles,
      outputs = Seq(report, library, genes)))
  }

  /** Stage 11, quantification mode (diann.Snakefile `diann_quant`): the
    * stage-10 transition library feeds DIA-NN over the sample scans. */
  def diannQuantChain(
      inputFiles: Seq[String], library: String, fasta: String,
      outDir: String, threads: Int): Seq[ToolStep] = {
    val report = s"$outDir/report.tsv"
    val genes = s"$outDir/report.genes.tsv"
    Seq(ToolStep("diann_quant",
      () => ToolCommands.diannQuant(inputFiles, library, fasta, report,
        genes, threads),
      inputs = inputFiles :+ library,
      outputs = Seq(report, genes)))
  }

  /** Stage 12 (sequence_best_models.Snakefile): mzXML → MGF conversion,
    * then the configured de novo sequencer. The DeepNovo branch passes
    * its input through the environment (the reference's
    * DEEPNOVO_INPUT), not argv. */
  def denovoChain(
      bestModelsMzxml: String, sequencer: String,
      sequencerOutput: String,
      novorParamFile: Option[String] = None): Seq[ToolStep] = {
    val mgf = s"$bestModelsMzxml.mgf"
    val convert = ToolStep("mzxml2mgf",
      () => ToolCommands.fileConverter(bestModelsMzxml, mgf),
      inputs = Seq(bestModelsMzxml),
      outputs = Seq(mgf))
    val seqStep = sequencer match {
      case "novor" => ToolStep("sequencer",
        () => ToolCommands.novor(novorParamFile.getOrElse(
          sys.error("novor sequencer needs a parameter file")),
          sequencerOutput, mgf),
        inputs = Seq(mgf),
        outputs = Seq(sequencerOutput))
      case "deepnovo" => ToolStep("sequencer",
        () => ToolCommands.deepnovo(),
        inputs = Seq(mgf),
        outputs = Seq(sequencerOutput),
        env = ToolCommands.deepnovoEnv(mgf))
      case other => sys.error(s"unknown sequencer '$other'")
    }
    Seq(convert, seqStep)
  }

  /** DIA-Umpire identification chain (crux_diaumpire.Snakefile): one
    * signal-extraction step per sample map (producing the three
    * quality-tier MGFs), then one comet search per (map, Q) pseudo-
    * spectrum file. Collation back to one table is ENGINE-side —
    * [[graft.sources.PsmGather.readPsmTables]] over the per-tier
    * outputs (the reference's pandas concat loop) — so the chain ends
    * at the search artifacts. The per-file steps are independent:
    * Snakemake's `--jobs` fan-out maps to running them as cluster
    * tasks. */
  def diaumpireCruxChain(
      jarDir: String, mzmlFiles: Seq[String], outDir: String,
      paramFile: String, database: String,
      massTolPpm: Double): Seq[ToolStep] = {
    def stem(p: String) =
      p.split('/').last.stripSuffix(".mzML")
    val extract = mzmlFiles.map { f =>
      ToolStep(s"diaumpire:${stem(f)}",
        () => ToolCommands.diaUmpire(jarDir, f, paramFile),
        inputs = Seq(f),
        outputs = (1 to 3).map(q => s"$outDir/${stem(f)}_Q$q.mgf"))
    }
    val search = for {
      f <- mzmlFiles
      q <- 1 to 3
    } yield {
      val mgf = s"$outDir/${stem(f)}_Q$q.mgf"
      ToolStep(s"crux:${stem(f)}_Q$q",
        () => ToolCommands.comet(mgf, s"$outDir/${stem(f)}_Q$q.crux_out",
          database, massTolPpm),
        inputs = Seq(mgf),
        outputs = Seq(s"$outDir/${stem(f)}_Q${q}_crux.tsv"))
    }
    extract ++ search
  }

  /** DIA-Umpire → MS-GF+ PTM search (diaumpire_ptm_search.Snakefile):
    * per pseudo-spectrum MGF, one MS-GF+ run followed by the mzid→TSV
    * conversion the reference always chains after it
    * (wrappers.py:133-135); collation via `PsmGather.readPsmTables`
    * as above. */
  def diaumpireMsgfChain(
      msgfJar: String, mgfFiles: Seq[String], outDir: String,
      database: String, decoyPrefix: String, massTolPpm: Double,
      threads: Int): Seq[ToolStep] =
    mgfFiles.flatMap { mgf =>
      val stem = mgf.split('/').last.stripSuffix(".mgf")
      val mzid = mgf.stripSuffix(".mgf") + ".mzid"
      Seq(
        ToolStep(s"msgf:$stem",
          () => ToolCommands.msgf(msgfJar, mgf, database, decoyPrefix,
            massTolPpm, threads),
          inputs = Seq(mgf),
          outputs = Seq(mzid)),
        ToolStep(s"mzid2tsv:$stem",
          () => ToolCommands.msgfMzidToTsv(msgfJar, mzid),
          inputs = Seq(mzid),
          outputs = Seq(s"$outDir/$stem.tsv")))
    }

  /** Execute a chain in rule order behind the runner. With
    * `skipCompleted` (the Snakemake resume), a step whose declared
    * outputs ALL exist is skipped. `.DONE` flag outputs (Snakemake's
    * `touch()`) are created after a successful step; real tool outputs
    * are the tool's responsibility. A nonzero exit aborts the chain
    * loudly, naming the step. Returns the names of the steps that
    * actually ran. */
  def run(
      steps: Seq[ToolStep], runner: ToolRunner,
      skipCompleted: Boolean = true): Seq[String] = {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    steps.foreach { step =>
      val complete = skipCompleted && step.outputs.nonEmpty &&
        step.outputs.forall(p => new java.io.File(p).exists())
      if (!complete) {
        val rc = runner.run(step.command(), step.env)
        if (rc != 0) throw new IllegalStateException(
          s"tool chain: step '${step.name}' exited with $rc")
        step.outputs.filter(_.endsWith(".DONE")).foreach { p =>
          val f = new java.io.File(p)
          Option(f.getParentFile).foreach(_.mkdirs())
          f.createNewFile()
        }
        ran += step.name
      }
    }
    ran.toSeq
  }
}
