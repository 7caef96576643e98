package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ToolCommandsSpec extends AnyFunSuite with Matchers {

  test("comet command mirrors the reference argument list") {
    ToolCommands.comet("scan.mzXML", "/tmp/out", "db.fasta") shouldBe Seq(
      "crux", "comet", "--peptide_mass_units", "2",
      "--peptide_mass_tolerance", "40", "--overwrite", "T",
      "--output-dir", "/tmp/out", "scan.mzXML", "db.fasta")
    ToolCommands.comet("s", "o", "d", 40, Some("p.params"))
      .slice(2, 4) shouldBe Seq("--parameter-file", "p.params")
  }

  test("percolator command carries seed 123 and fdr") {
    val cmd = ToolCommands.percolator("t.txt", "d.txt", "/tmp/out",
      0.01, "decoy_")
    cmd.take(4) shouldBe Seq("crux", "percolator", "--percolator-seed", "123")
    cmd should contain inOrder ("--decoy-prefix", "decoy_")
    cmd should contain inOrder ("--test-fdr", "0.01")
    cmd.takeRight(2) shouldBe Seq("t.txt", "d.txt")
  }

  test("msgf command strips the decoy prefix separator") {
    val cmd = ToolCommands.msgf("msgf.jar", "in.mgf", "db.fasta",
      "decoy_", 40, 18, Some("mods.txt"))
    cmd should contain inOrder ("-decoy", "decoy")
    cmd should contain inOrder ("-t", "40ppm")
    cmd should contain inOrder ("-thread", "18")
    cmd.takeRight(2) shouldBe Seq("-mod", "mods.txt")
  }

  test("dia-umpire command") {
    ToolCommands.diaUmpire("/opt/du", "scan.mzXML", "se.params") shouldBe
      Seq("java", "-jar", "-Xmx8G", "/opt/du/DIA_Umpire_SE.jar",
        "scan.mzXML", "se.params")
  }

  test("diann library-free command carries per-file --f pairs and the digest block") {
    val cmd = ToolCommands.diannLibraryFree(
      Seq("a.mzML", "b.mzML"), "rep_libfree.tsv", "rep.genes.tsv",
      "lib.tsv", "db.fasta", "train.lib", threads = 16)
    cmd.head shouldBe "diann-linux"
    cmd.slice(1, 5) shouldBe Seq("--f", "a.mzML", "--f", "b.mzML")
    cmd should contain inOrder ("--out", "rep_libfree.tsv")
    cmd should contain inOrder ("--out-lib", "lib.tsv")
    cmd should contain inOrder ("--learn-lib", "train.lib")
    cmd should contain inOrder ("--cut-after", "KR")
    cmd should contain inOrder ("--min-pep-len", "7")
    cmd should contain ("--gen-spec-lib")
    cmd should contain inOrder ("--threads", "16")
  }

  test("diann quant command searches against the given library") {
    val cmd = ToolCommands.diannQuant(
      Seq("a.mzML"), "lib.tsv", "db.fasta", "rep.tsv", "rep.genes.tsv", 8)
    cmd should contain inOrder ("--lib", "lib.tsv")
    cmd should contain inOrder ("--out", "rep.tsv")
    cmd should contain ("--no-quant-files")
    (cmd should not).contain("--gen-spec-lib")
  }

  test("peptide prophet command") {
    ToolCommands.peptideProphet("comet.target.pep.xml", "decoy_") shouldBe
      Seq("PeptideProphetParser", "comet.target.pep.xml", "DECOY=decoy_")
  }

  test("mayu command mirrors the reference flags") {
    val cmd = ToolCommands.mayu("/opt/mayu", "comet.target.pep.xml",
      "mixed.fasta", "decoy_", 0.01, "/lib/comet.target")
    cmd.take(3) shouldBe Seq("perl", "-I/opt/mayu/lib", "/opt/mayu/Mayu.pl")
    cmd should contain inOrder ("-A", "comet.target.pep.xml")
    cmd should contain inOrder ("-G", "0.01")
    cmd should contain inOrder ("-P", "mFDR=0.01:t")
    cmd should contain inOrder ("-H", "51")
    cmd.takeRight(2) shouldBe Seq("-M", "/lib/comet.target")
  }

  test("spectrast command packs options in -cX form") {
    ToolCommands.spectrast("/lib/best_models_library.xml", 0.97,
      "comet.target.pep.xml") shouldBe Seq(
      "spectrast", "-cN/lib/best_models_library.xml", "-cICID-QTOF",
      "-cP0.97", "-c_RDY", "-co", "comet.target.pep.xml")
  }

  test("spectrast2openswath command carries ion/charge settings") {
    val cmd = ToolCommands.spectrast2openswath(
      200, 1800, 0.05, "windows.tsv", "lib_openswath.tsv", "lib.sptxt")
    cmd.head shouldBe "spectrast2tsv.py"
    cmd should contain inOrder ("-l", "200,1800")
    cmd should contain inOrder ("-s", "b,y")
    cmd should contain inOrder ("-x", "2,3")
    cmd should contain inOrder ("-o", "4")
    cmd should contain inOrder ("-n", "6")
    cmd should contain inOrder ("-p", "0.05")
    cmd should contain inOrder ("-k", "openswath")
    cmd.last shouldBe "lib.sptxt"
  }

  test("file converter, novor, deepnovo commands") {
    ToolCommands.fileConverter("best.mzXML", "best.mgf") shouldBe
      Seq("FileConverter", "-in", "best.mzXML", "-out", "best.mgf")
    ToolCommands.novor("novor.params", "out.csv", "best.mgf") shouldBe
      Seq("novor.sh", "-f", "-p", "novor.params", "-o", "out.csv", "best.mgf")
    ToolCommands.deepnovo() shouldBe Seq("python", "deepnovo_main.py",
      "--train_dir", "train.example", "--decode", "--beam_search",
      "--beam_size", "5")
    // DeepNovo reads its input from the environment, not argv
    ToolCommands.deepnovoEnv("best.mgf") shouldBe
      Map("DEEPNOVO_INPUT" -> "best.mgf")
  }

  test("msconvert command carries the vendor peak-picking filter") {
    val cmd = ToolCommands.msconvert("mzML", "/out", "in.wiff", "in.mzML")
    cmd.take(2) shouldBe Seq("msconvert.exe", "--mzML")
    cmd should contain inOrder ("--filter", "peakPicking vendor msLevel=1-2")
    cmd should contain inOrder ("-o", "/out")
    cmd.takeRight(3) shouldBe Seq("in.wiff", "--outfile", "in.mzML")
  }
}
