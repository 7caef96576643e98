package graft.sources

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MzXMLWriterSpec extends AnyFunSuite with Matchers {

  test("peaks base64 is byte-exact vs the reference encoder") {
    // golden value from numpy: float32 big-endian interleaved pairs of
    // mz=[100.5, 200.25], int=[10.0, 20.0] (msproc.py:511-521)
    MzXMLWriter.peaksBase64(Array(100.5, 200.25), Array(10.0, 20.0)) shouldBe
      "QskAAEEgAABDSEAAQaAAAA=="
  }

  test("component with MS1 points uses idxmax pseudo-precursor") {
    val c = MzXMLWriter.Component(
      scanId = 7,
      points = Seq(
        (450.1, 1, 5.0), (451.2, 1, 50.0), // MS1: max at 451.2
        // MS2, unsorted; the min-intensity point (150.0, 1.0) falls on
        // the bin-0 histogram edge and is dropped (strict >, msproc.py:681)
        (200.0, 2, 3.0), (100.0, 2, 2.0), (150.0, 2, 1.0)),
      isolationWindowCenter = 630.0)
    val xml = MzXMLWriter.componentXml(c).get
    xml should include("""<scan num="7"""")
    xml should include("msLevel=\"2\"")
    xml should include("peaksCount=\"2\"")
    // precursor from MS1 idxmax
    xml should include("""<precursorMz precursorIntensity="50.0">451.2</precursorMz>""")
    // MS2 sorted by mz: low=100, high=200
    xml should include("lowMz=\"100.0\" highMz=\"200.0\"")
  }

  test("component with no MS2 points is dropped; no MS1 falls back to window center") {
    MzXMLWriter.componentXml(MzXMLWriter.Component(1,
      Seq((450.0, 1, 5.0)), 630.0)) shouldBe None
    val xml = MzXMLWriter.componentXml(MzXMLWriter.Component(2,
      Seq((100.0, 2, 3.0)), 630.0)).get
    xml should include(">630.05</precursorMz>")
  }

  test("MS2 lower-percent cutoff drops low bins; emptied spectrum drops the scan") {
    val pts = Seq((100.0, 2, 1.0), (110.0, 2, 5.0), (120.0, 2, 100.0))
    // bin 0: cutoff = histogram edge[0] = min → strict > drops the min point
    val x0 = MzXMLWriter.componentXml(MzXMLWriter.Component(1, pts, 630.0)).get
    x0 should include("peaksCount=\"2\"")
    // bin 10: cutoff = 1 + 99·10/100 = 10.9 → only the 100.0 point survives
    val x10 = MzXMLWriter.componentXml(
      MzXMLWriter.Component(1, pts, 630.0), intensityCutoffBin = 10).get
    x10 should include("peaksCount=\"1\"")
    x10 should include("lowMz=\"120.0\"")
    // bin = bins: cutoff = max → spectrum empties, scan dropped
    MzXMLWriter.componentXml(
      MzXMLWriter.Component(1, pts, 630.0), intensityCutoffBin = 100) shouldBe None
  }

  test("finalized file carries scanCount, offset index, indexOffset") {
    val tmp = Files.createTempFile("graft", ".mzXML").toString
    val comps = Seq(
      MzXMLWriter.Component(0, Seq((100.0, 2, 1.0), (450.0, 1, 2.0)), 630.0),
      MzXMLWriter.Component(1, Seq((110.0, 2, 4.0)), 630.0))
    MzXMLWriter.write(tmp, comps)
    val content = new String(Files.readAllBytes(Paths.get(tmp)), "ISO-8859-1")
    content should include("<msRun scanCount=\"2\">")
    content should include("<index name = \"scan\">")
    content should include("</mzXML>\n")
    // every recorded offset points at a '<scan' byte position
    val offs = "<offset id = \"(\\d+)\">(\\d+)</offset>".r
      .findAllMatchIn(content).map(m => (m.group(1).toLong, m.group(2).toInt)).toSeq
    offs should have size 2
    offs.foreach { case (_, off) =>
      content.substring(off, off + 5) shouldBe "<scan"
    }
    // indexOffset points at the index element
    val io = "<indexOffset>(\\d+)</indexOffset>".r
      .findFirstMatchIn(content).get.group(1).toInt
    content.substring(io, io + 6) shouldBe "<index"
    Files.delete(Paths.get(tmp))
  }

  test("MGF writer emits a full charge-2 pass then a full charge-3 pass") {
    val tmp = Files.createTempFile("graft", ".mgf").toString
    def sp(scan: Long) = MgfWriter.MgfSpectrum(
      scan = scan, precMz = 630.5, precIntensity = 42.0,
      mzs = Array(100.0, 200.0), ints = Array(1.0, 2.0))
    MgfWriter.write(tmp, Seq(sp(5), sp(7)), forDeepNovo = true)
    val content = new String(Files.readAllBytes(Paths.get(tmp)), "ISO-8859-1")
    "BEGIN IONS".r.findAllIn(content).size shouldBe 4
    // two sequential passes (adjust_mgf_files.py:40-52), not interleaved
    val charges = "CHARGE=(\\d)\\+".r.findAllMatchIn(content)
      .map(_.group(1).toInt).toSeq
    charges shouldBe Seq(2, 2, 3, 3)
    // title/scans are the bare scan number
    val titles = "TITLE=(\\S+)".r.findAllMatchIn(content)
      .map(_.group(1)).toSeq
    titles shouldBe Seq("5", "7", "5", "7")
    content should include("SCANS=5")
    content should include("PEPMASS=630.5 42.0")
    // DeepNovo stamps: rtinseconds = 10 + ordinal, RESTARTING per pass
    val rts = "RTINSECONDS=(\\d+)".r.findAllMatchIn(content)
      .map(_.group(1).toInt).toSeq
    rts shouldBe Seq(10, 11, 10, 11)
    content should include("SEQ=PEPTIDE")
    Files.delete(Paths.get(tmp))
  }

  test("MGF fragment values carry the %.10g/%.8g rounding") {
    val tmp = Files.createTempFile("graft", ".mgf").toString
    MgfWriter.write(tmp, Seq(MgfWriter.MgfSpectrum(
      scan = 1, precMz = 630.5, precIntensity = 42.0,
      mzs = Array(123.45678901234567), ints = Array(9876.543219876))))
    val content = new String(Files.readAllBytes(Paths.get(tmp)), "ISO-8859-1")
    // 10 significant digits for m/z, 8 for intensity (msproc.py:438)
    content should include("123.456789 9876.5432")
    Files.delete(Paths.get(tmp))
  }
}
