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

  /** DIA-Umpire signal extraction (wrappers.py:25-33). */
  def diaUmpire(
      jarDir: String, inputFile: String, paramFile: String): Seq[String] =
    Seq("java", "-jar", "-Xmx8G", s"$jarDir/DIA_Umpire_SE.jar",
      inputFile, paramFile)

  private def fmt(d: Double): String =
    if (d == math.rint(d)) d.toLong.toString else d.toString
}

/** Execution seam: production wires a process runner; tests assert on
  * the command lines only. */
trait ToolRunner {
  def run(command: Seq[String]): Int
}

object ProcessToolRunner extends ToolRunner {
  override def run(command: Seq[String]): Int =
    new ProcessBuilder(command: _*).inheritIO().start().waitFor()
}
