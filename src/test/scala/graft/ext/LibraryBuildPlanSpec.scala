package graft.ext

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Stage 10–12 rule chains: ordering and artifact handoff must match
  * the reference Snakefiles (build_library.Snakefile:14-131,
  * diann.Snakefile, sequence_best_models.Snakefile) — each step's argv
  * consumes its predecessors' declared outputs, and a resumed run
  * skips steps whose outputs exist (Snakemake file-existence
  * semantics). */
class LibraryBuildPlanSpec extends AnyFunSuite with Matchers {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-lbp").toString

  private def config(dir: String) = LibraryBuildPlan.LibraryConfig(
    libDir = dir,
    bestModelsMzxml = s"$dir/best_models.mzXML",
    mixedDatabase = "mixed.fasta",
    decoyPrefix = "reverse_",
    massTolPpm = 40,
    mayuFdr = 0.01,
    mayuPath = "/opt/mayu",
    swathWindowsTsv = s"$dir/swaths.tsv",
    quantLibraryTsv = s"$dir/quant_library.tsv")

  test("stage-10 library chain orders comet → prophet → mayu → spectrast → openswath with artifact handoff") {
    val dir = tmpDir()
    val c = config(dir)
    val steps = LibraryBuildPlan.libraryChain(c)
    steps.map(_.name) shouldBe Seq("comet", "peptide_prophet", "mayu",
      "spectrast", "spectrast2openswath")

    val pepXml = s"$dir/comet.target.pep.xml"
    val mayuCsv = s"$dir/comet.target_psm_mFDR0.01_t_1.08.csv"
    val sptxt = s"$dir/best_models_library.xml.sptxt"

    // comet searches the exported mzXML against the MIXED database
    steps(0).command() should contain(c.bestModelsMzxml)
    steps(0).command().last shouldBe "mixed.fasta"
    steps(0).outputs shouldBe Seq(pepXml)
    // prophet and mayu consume comet's pepXML
    steps(1).command() should contain(pepXml)
    steps(2).command() should contain(pepXml)
    steps(2).command() should contain("-M")
    steps(2).command() should contain(s"$dir/comet.target")
    steps(2).outputs should contain(mayuCsv)
    // spectrast's probability cutoff is READ from Mayu's mFDR table:
    // the min of column 5 (sort -g | head -1 in the reference rule)
    Files.write(Paths.get(mayuCsv),
      "a,b,c,d,prob\nx,0,0,0,0.93\nx,0,0,0,0.87\nx,0,0,0,0.91\n"
        .getBytes("UTF-8"))
    steps(3).command() should contain("-cP0.87")
    steps(3).command().last shouldBe pepXml
    steps(3).outputs shouldBe Seq(sptxt)
    // openswath conversion consumes the sptxt and writes the final TSV
    steps(4).command() should contain(sptxt)
    steps(4).command() should contain(c.quantLibraryTsv)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("run() executes in order, honors skipCompleted, touches .DONE flags, fails loudly") {
    val dir = tmpDir()
    val c = config(dir)
    val mayuCsv = s"$dir/comet.target_psm_mFDR0.01_t_1.08.csv"
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val mock = new ToolRunner {
      override def run(cmd: Seq[String], env: Map[String, String]): Int = {
        calls += cmd
        // fake tools create their real outputs (the mock search engine
        // convention of CandiaPipelineSpec)
        cmd.head match {
          case "crux" =>
            Files.write(Paths.get(s"$dir/comet.target.pep.xml"),
              "<pepxml/>".getBytes("UTF-8"))
          case "perl" =>
            Files.write(Paths.get(mayuCsv),
              "a,b,c,d,prob\nx,0,0,0,0.95\n".getBytes("UTF-8"))
          case "spectrast" =>
            Files.write(Paths.get(s"$dir/best_models_library.xml.sptxt"),
              "lib".getBytes("UTF-8"))
          case "spectrast2tsv.py" =>
            Files.write(Paths.get(c.quantLibraryTsv),
              "tsv".getBytes("UTF-8"))
          case _ => ()
        }
        0
      }
    }
    val ran = LibraryBuildPlan.run(LibraryBuildPlan.libraryChain(c), mock)
    ran shouldBe Seq("comet", "peptide_prophet", "mayu", "spectrast",
      "spectrast2openswath")
    // the spectrast call picked up the cutoff Mayu just wrote
    calls.map(_.head) shouldBe Seq("crux", "PeptideProphetParser", "perl",
      "spectrast", "spectrast2tsv.py")
    calls(3) should contain("-cP0.95")
    // prophet's Snakemake touch() flag exists
    Files.exists(Paths.get(s"$dir/peptide_prophet.DONE")) shouldBe true

    // resumed run: every output exists → nothing re-runs
    LibraryBuildPlan.run(LibraryBuildPlan.libraryChain(c), mock) shouldBe
      Seq.empty
    calls should have length 5

    // a failing step aborts the chain with its name
    Files.delete(Paths.get(c.quantLibraryTsv))
    val failing = new ToolRunner {
      override def run(cmd: Seq[String], env: Map[String, String]): Int = 3
    }
    val ex = intercept[IllegalStateException] {
      LibraryBuildPlan.run(LibraryBuildPlan.libraryChain(c), failing)
    }
    ex.getMessage should include("spectrast2openswath")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("stage-11 DIA-NN chains: library-free and quant against the stage-10 library") {
    val free = LibraryBuildPlan.diannLibraryFreeChain(
      Seq("a.mzML", "b.mzML"), "/out", "db.fasta", "train.lib", 8)
    free.map(_.name) shouldBe Seq("diann_library_free")
    free.head.command() should contain allOf ("--gen-spec-lib",
      "--fasta-search", "a.mzML", "b.mzML")
    val quant = LibraryBuildPlan.diannQuantChain(
      Seq("a.mzML"), "/lib/quant_library.tsv", "db.fasta", "/out", 8)
    quant.head.inputs should contain("/lib/quant_library.tsv")
    quant.head.command() should contain("/lib/quant_library.tsv")
    quant.head.command() should not contain "--fasta-search"
  }

  test("DIA-Umpire chains fan out per map and per quality tier") {
    val crux = LibraryBuildPlan.diaumpireCruxChain(
      "/opt/dia", Seq("/m/a.mzML", "/m/b.mzML"), "/out", "du.params",
      "db.fasta", 40)
    crux.map(_.name) shouldBe Seq("diaumpire:a", "diaumpire:b",
      "crux:a_Q1", "crux:a_Q2", "crux:a_Q3",
      "crux:b_Q1", "crux:b_Q2", "crux:b_Q3")
    // each search consumes the tier MGF its extraction step declared
    crux.head.outputs should contain("/out/a_Q1.mgf")
    crux(2).inputs shouldBe Seq("/out/a_Q1.mgf")
    crux(2).command() should contain("/out/a_Q1.mgf")
    crux(2).command().last shouldBe "db.fasta"

    val msgf = LibraryBuildPlan.diaumpireMsgfChain(
      "/opt/msgf.jar", Seq("/out/a_Q1.mgf"), "/msgf_out",
      "db.fasta", "reverse_", 40, 4)
    msgf.map(_.name) shouldBe Seq("msgf:a_Q1", "mzid2tsv:a_Q1")
    msgf.head.command() should contain("-tda")
    // the converter consumes the search's .mzid sibling (the
    // reference's with_suffix('') + '.mzid')
    msgf.head.outputs shouldBe Seq("/out/a_Q1.mzid")
    msgf(1).command() should contain("edu.ucsd.msjava.ui.MzIDToTsv")
    msgf(1).command() should contain("/out/a_Q1.mzid")
    msgf(1).outputs shouldBe Seq("/msgf_out/a_Q1.tsv")
  }

  test("stage-12 denovo chains: converter feeds the sequencer; deepnovo input travels via env") {
    val novor = LibraryBuildPlan.denovoChain(
      "/x/best.mzXML", "novor", "/x/out.csv", Some("/x/novor.params"))
    novor.map(_.name) shouldBe Seq("mzxml2mgf", "sequencer")
    novor(0).command() shouldBe
      Seq("FileConverter", "-in", "/x/best.mzXML", "-out", "/x/best.mzXML.mgf")
    novor(1).command() should contain("/x/best.mzXML.mgf")
    novor(1).command() should contain("/x/out.csv")

    val deep = LibraryBuildPlan.denovoChain(
      "/x/best.mzXML", "deepnovo", "/x/decode.tab")
    deep(1).env shouldBe Map("DEEPNOVO_INPUT" -> "/x/best.mzXML.mgf")
    deep(1).command() should contain("--beam_search")
  }
}
