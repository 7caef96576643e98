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
}
