package graft.ext

/** The external-tool boundary (SURVEY §7.1 module 11): stages 9–12 call
  * closed-source search engines and quantifiers that are not
  * reimplementable. The engine's contract with them is the COMMAND LINE —
  * these builders reproduce the reference's argument lists exactly
  * (wrappers.py:25-166) while leaving execution behind [[ToolRunner]] so
  * tests (and clusters without the binaries) never fork processes.
  *
  * Results flow back into the engine through ordinary readers (TSV/CSV →
  * DataFrames, e.g. [[graft.sources.SeqIO]]), keeping the tools outside
  * the correctness surface.
  */
object ToolCommands {

  /** crux comet target/decoy search (wrappers.py:72-96). */
  def comet(
      inputFile: String, outDir: String, database: String,
      massTolPpm: Double = 40, cruxParamFile: Option[String] = None): Seq[String] =
    Seq("crux", "comet") ++
      cruxParamFile.toSeq.flatMap(p => Seq("--parameter-file", p)) ++
      Seq("--peptide_mass_units", "2",
        "--peptide_mass_tolerance", fmt(massTolPpm),
        "--overwrite", "T",
        "--output-dir", outDir, inputFile, database)

  /** crux percolator FDR separation (wrappers.py:99-112), seed 123. */
  def percolator(
      targetsFile: String, decoysFile: String, outDir: String,
      fdr: Double, decoyPrefix: String): Seq[String] =
    Seq("crux", "percolator", "--percolator-seed", "123",
      "--overwrite", "T", "--pepxml-output", "T", "--mzid-output", "T",
      "--output-dir", outDir, "--decoy-prefix", decoyPrefix,
      "--test-fdr", fmt(fdr), targetsFile, decoysFile)

  /** MS-GF+ search (wrappers.py:115-137); decoy prefix loses its
    * trailing separator exactly as the reference slices it. */
  def msgf(
      jarPath: String, inputFile: String, database: String,
      decoyPrefix: String, massTolPpm: Double, threads: Int,
      modifications: Option[String] = None): Seq[String] =
    Seq("java", "-Xmx3500M", "-jar", jarPath,
      "-s", inputFile, "-d", database,
      "-tda", "1", "-decoy", decoyPrefix.dropRight(1),
      "-t", s"${fmt(massTolPpm)}ppm", "-inst", "2",
      "-thread", threads.toString) ++
      modifications.toSeq.flatMap(m => Seq("-mod", m))

  /** MS-GF+ mzid → TSV conversion (wrappers.py:133-135) — the
    * reference runs it immediately after every MS-GF+ search; `-i`
    * takes the search's `.mzid` sibling of the input file. */
  def msgfMzidToTsv(jarPath: String, mzidFile: String): Seq[String] =
    Seq("java", "-Xmx3500M", "-cp", jarPath, "edu.ucsd.msjava.ui.MzIDToTsv",
      "-i", mzidFile, "-unroll", "1")

  /** DIA-Umpire signal extraction (wrappers.py:25-33). */
  def diaUmpire(
      jarDir: String, inputFile: String, paramFile: String): Seq[String] =
    Seq("java", "-jar", "-Xmx8G", s"$jarDir/DIA_Umpire_SE.jar",
      inputFile, paramFile)

  /** DIA-NN library-free search + spectral-library generation
    * (diann.Snakefile `diann_library_free`): per-input `--f` pairs, then
    * outputs, FASTA, learn-lib, and the reference's fixed digest/mz
    * parameter block. */
  def diannLibraryFree(
      inputFiles: Seq[String], report: String, geneStats: String,
      library: String, fasta: String, trainLib: String,
      threads: Int): Seq[String] =
    Seq("diann-linux") ++
      inputFiles.flatMap(f => Seq("--f", f)) ++
      Seq("--out", report, "--out-gene", geneStats, "--out-lib", library,
        "--fasta", fasta, "--learn-lib", trainLib,
        "--gen-spec-lib", "--lib", "",
        "--qvalue", "1", "--fasta-search",
        "--min-fr-mz", "200", "--max-fr-mz", "1800",
        "--met-excision", "--cut-after", "KR", "--missed-cleavages", "1",
        "--min-pep-len", "7", "--max-pep-len", "30",
        "--min-pr-mz", "300", "--max-pr-mz", "1800",
        "--unimod4", "--no-quant-files",
        "--threads", threads.toString, "--verbose", "3")

  /** DIA-NN quantification against an existing spectral library
    * (diann.Snakefile `diann_quant`). */
  def diannQuant(
      inputFiles: Seq[String], library: String, fasta: String,
      report: String, geneStats: String, threads: Int): Seq[String] =
    Seq("diann-linux") ++
      inputFiles.flatMap(f => Seq("--f", f)) ++
      Seq("--lib", library, "--fasta", fasta,
        "--out", report, "--out-gene", geneStats,
        "--qvalue", "1", "--met-excision", "--no-quant-files",
        "--threads", threads.toString, "--verbose", "3")

  /** PeptideProphet significance on mixed target-decoy Comet PSMs
    * (build_library.Snakefile:27-35). */
  def peptideProphet(pepXml: String, decoyPrefix: String): Seq[String] =
    Seq("PeptideProphetParser", pepXml, s"DECOY=$decoyPrefix")

  /** Mayu protein-level FDR (build_library.Snakefile:38-59): -G max PSM
    * FDR, -H analysis steps, -P filtered-id output, -M file-name base. */
  def mayu(
      mayuPath: String, pepXml: String, mixedDatabase: String,
      decoyPrefix: String, fdr: Double, outBase: String): Seq[String] =
    Seq("perl", s"-I$mayuPath/lib", s"$mayuPath/Mayu.pl",
      "-verbose", "-A", pepXml, "-C", mixedDatabase, "-E", decoyPrefix,
      "-G", fmt(fdr), "-P", s"mFDR=${fmt(fdr)}:t", "-H", "51",
      "-M", outBase)

  /** SpectraST library build from significant PSMs
    * (build_library.Snakefile:75-101): CID-QTOF settings, iProphet
    * probability cutoff from Mayu's mFDR table. */
  def spectrast(
      libBasename: String, probabilityCutoff: Double,
      cometPepXml: String): Seq[String] =
    Seq("spectrast", s"-cN$libBasename", "-cICID-QTOF",
      s"-cP${fmt(probabilityCutoff)}", "-c_RDY", "-co", cometPepXml)

  /** SpectraST → OpenSWATH transition TSV (build_library
    * .Snakefile:104-131): b/y ions, charges 2/3, 4–6 ions per peptide. */
  def spectrast2openswath(
      lowerMzFrag: Double, upperMzFrag: Double, maxFragAnnotErr: Double,
      swathWindowsTsv: String, outFile: String,
      sptxtLib: String): Seq[String] =
    Seq("spectrast2tsv.py",
      "-l", s"${fmt(lowerMzFrag)},${fmt(upperMzFrag)}",
      "-s", "b,y", "-x", "2,3", "-o", "4", "-n", "6",
      "-p", fmt(maxFragAnnotErr), "-d",
      "-w", swathWindowsTsv, "-k", "openswath", "-a", outFile, sptxtLib)

  /** OpenMS FileConverter, the reference's mzXML → MGF step
    * (sequence_best_models.Snakefile `mzxml2mgf`). */
  def fileConverter(inputFile: String, outputFile: String): Seq[String] =
    Seq("FileConverter", "-in", inputFile, "-out", outputFile)

  /** Novor de novo sequencing (sequence_best_models.Snakefile
    * `sequencer`, novor branch). */
  def novor(paramFile: String, outputFile: String, inputMgf: String): Seq[String] =
    Seq("novor.sh", "-f", "-p", paramFile, "-o", outputFile, inputMgf)

  /** DeepNovo beam-search decoding (sequence_best_models.Snakefile
    * `sequencer`, deepnovo branch; the input MGF travels via
    * DEEPNOVO_INPUT in the environment, not argv — pass
    * [[deepnovoEnv]] to the runner alongside this command). */
  def deepnovo(trainDir: String = "train.example",
      beamSize: Int = 5): Seq[String] =
    Seq("python", "deepnovo_main.py", "--train_dir", trainDir,
      "--decode", "--beam_search", "--beam_size", beamSize.toString)

  /** The environment DeepNovo reads its input from. */
  def deepnovoEnv(inputMgf: String): Map[String, String] =
    Map("DEEPNOVO_INPUT" -> inputMgf)

  /** msconvert vendor-file conversion (msconvert_parallel.py:26-40):
    * 32-bit zlib-compressed peak-picked output. */
  def msconvert(
      format: String, outputDir: String, inputPath: String,
      outputFile: String): Seq[String] =
    Seq("msconvert.exe", s"--$format", "--32", "--zlib", "--noindex",
      "--filter", "peakPicking vendor msLevel=1-2",
      "-o", outputDir, inputPath, "--outfile", outputFile)

  /** Argv number formatting (integral doubles print without a decimal);
    * `private[ext]` so chain encodings can derive artifact names (e.g.
    * Mayu's mFDR CSV) with identical formatting. */
  private[ext] def fmt(d: Double): String =
    if (d == math.rint(d)) d.toLong.toString else d.toString
}

/** Execution seam: production wires a process runner; tests assert on
  * the command lines (and env) only. */
trait ToolRunner {
  def run(command: Seq[String], env: Map[String, String] = Map.empty): Int
}

object ProcessToolRunner extends ToolRunner {
  override def run(
      command: Seq[String], env: Map[String, String] = Map.empty): Int = {
    val pb = new ProcessBuilder(command: _*).inheritIO()
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.start().waitFor()
  }
}
