package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64

import scala.collection.mutable.ArrayBuffer

/** mzXML + MGF export of deconvolved mass-mode spectra.
  *
  * Driver-side writers (the reference streams all best models into ONE
  * mzXML file for the search engines, id_models_concat.py:58-119 — a
  * single small output, so a distributed sink is the wrong shape; the
  * upstream mass-mode DataFrame is collected and streamed here).
  *
  * Byte-compatibility with the reference encoder (msproc.py:229-421):
  *  - `<peaks>` payload is base64 of BIG-ENDIAN float32 interleaved
  *    (mz, intensity) pairs (as_base64_string, msproc.py:511-521) —
  *    byte-exact;
  *  - `<msRun scanCount>` is rewritten after all scans are appended
  *    (record_scan_count, msproc.py:366-390);
  *  - a trailing `<index name="scan">` of byte offsets plus
  *    `<indexOffset>` is appended (index_mzxml_file, msproc.py:393-420);
  *  - MS1-absent components fall back to a pseudo-precursor at the
  *    isolation-window center; the reference jitters it with np.random
  *    (msproc.py:306-307) — here the jitter is a documented deterministic
  *    0.05/0.5 midpoint so reruns are reproducible.
  *
  * Numeric attribute text uses Scala's shortest-round-trip double
  * formatting (Python repr is also shortest-round-trip; both re-parse to
  * identical doubles).
  */
object MzXMLWriter {

  private val Header =
    "<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?>\n" +
      "<mzXML xmlns=\"http://sashimi.sourceforge.net/schema_revision/mzXML_3.2\"\n" +
      "xmlns:xsi=\"http://www.w3.org/2001/XMLSchema-instance\"\n" +
      "xsi:schemaLocation=\"http://sashimi.sourceforge.net/schema_revision/mzXML_3.2" +
      " http://sashimi.sourceforge.net/schema_revision/mzXML_3.2/mzXML_idx_3.2.xsd\">\n" +
      "<msRun scanCount=\"N/A\">\n"

  /** base64(big-endian float32 interleaved (mz, int) pairs) — byte-exact
    * mirror of as_base64_string (msproc.py:511-521). */
  def peaksBase64(mzs: Array[Double], ints: Array[Double]): String = {
    val bb = ByteBuffer.allocate(mzs.length * 8).order(ByteOrder.BIG_ENDIAN)
    var i = 0
    while (i < mzs.length) {
      bb.putFloat(mzs(i).toFloat)
      bb.putFloat(ints(i).toFloat)
      i += 1
    }
    Base64.getEncoder.encodeToString(bb.array())
  }

  /** One `<scan>` element (spectrum_to_xml, msproc.py:330-363). */
  def scanXml(
      mzs: Array[Double], ints: Array[Double], level: Int, scanNo: Long,
      precMz: Double, precIntensity: Double): String = {
    require(mzs.nonEmpty, "empty spectrum")
    val iMax = ints.indices.maxBy(ints)
    val sb = new StringBuilder
    sb ++= s"""<scan num="$scanNo" scanType="Full"\n"""
    sb ++= s"""msLevel="$level"\npeaksCount="${mzs.length}"\n"""
    sb ++= s"""lowMz="${mzs.min}" highMz="${mzs.max}" basePeakMz="${mzs(iMax)}"\n"""
    sb ++= s"""basePeakIntensity="${ints(iMax)}"\ntotIonCurrent="${ints.sum}"\n>\n"""
    if (level == 2)
      sb ++= s"""<precursorMz precursorIntensity="$precIntensity">$precMz</precursorMz>\n"""
    sb ++= "<peaks compressionType=\"none\"\ncompressedLen=\"0\"\nprecision=\"32\"\n"
    sb ++= "byteOrder=\"network\"\ncontentType=\"m/z-int\">"
    sb ++= peaksBase64(mzs, ints)
    sb ++= "</peaks>\n</scan>\n"
    sb.toString
  }

  /** One mass-mode component: (mz, level, intensity) points. */
  final case class Component(
      scanId: Long,
      points: Seq[(Double, Int, Double)],
      isolationWindowCenter: Double)

  /** Render one component as an MS2 scan: MS2 points below the lower
    * intensity-histogram cutoff are discarded first
    * (filter_out_MS2_entries_with_intensity_in_lower_percent,
    * msproc.py:660-685: cutoff = np.histogram edge[cutoffBin] over the
    * UNfiltered MS2 intensities, strict `>`; an emptied spectrum drops
    * the scan). MS1 points provide the pseudo-precursor (idxmax;
    * deterministic fallback at the window center), surviving MS2 points
    * (sorted by m/z) form the spectrum
    * (convert_mass_mode_component_to_mzxml, msproc.py:288-329). */
  def componentXml(
      c: Component, intensityCutoffBin: Int = 0,
      bins: Int = 100): Option[String] = {
    val ms1 = c.points.filter(_._2 == 1)
    val ms2All = c.points.filter(_._2 == 2)
    if (ms2All.isEmpty) None
    else {
      val ints = ms2All.map(_._3)
      var lo = ints.min
      var hi = ints.max
      if (lo == hi) { lo -= 0.5; hi += 0.5 } // np.histogram zero-range rule
      val cutoff = lo + (hi - lo) * intensityCutoffBin / bins
      val ms2 = ms2All.filter(_._3 > cutoff).sortBy(_._1)
      if (ms2.isEmpty) None
      else {
        val (precMz, precInt) =
          if (ms1.nonEmpty) { val p = ms1.maxBy(_._3); (p._1, p._3) }
          else (c.isolationWindowCenter + 0.05, 300.5)
        Some(scanXml(ms2.map(_._1).toArray, ms2.map(_._3).toArray,
          level = 2, scanNo = c.scanId, precMz = precMz, precIntensity = precInt))
      }
    }
  }

  /** Write components to `path`, then finalize: rewrite scanCount, append
    * the byte-offset scan index and `<indexOffset>`. Returns the number
    * of scans written (components emptied by the MS2 cutoff are skipped). */
  def write(
      path: String, components: Seq[Component],
      intensityCutoffBin: Int = 0): Int = {
    val sb = new StringBuilder(Header)
    components.flatMap(componentXml(_, intensityCutoffBin)).foreach(sb ++= _)
    sb ++= "</msRun>\n</mzXML>\n"
    // scanCount rewrite (record_scan_count)
    val nScans = "<scan".r.findAllMatchIn(sb).length
    val content = sb.toString.replaceFirst(
      "<msRun scanCount=\"N/A\">", s"""<msRun scanCount="$nScans">""")
    // offset index (index_mzxml_file): byte offset of each <scan
    val woEnd = content.stripSuffix("</mzXML>\n")
    val offsets = ArrayBuffer.empty[(Long, Long)]
    val pat = "<scan num=\"(\\d+)\"".r
    pat.findAllMatchIn(woEnd).foreach { m =>
      // ISO-8859-1 is one byte per char, so the char index IS the byte offset
      offsets += ((m.group(1).toLong, m.start.toLong))
    }
    val idx = new StringBuilder
    idx ++= "<index name = \"scan\">\n"
    offsets.foreach { case (id, off) =>
      idx ++= s"""<offset id = "$id">$off</offset>\n"""
    }
    idx ++= "</index>\n"
    val indexOffset = woEnd.length // ISO-8859-1: char count == byte count
    val out = woEnd + idx.toString +
      s"<indexOffset>$indexOffset</indexOffset>\n</mzXML>\n"
    Files.write(Paths.get(path), out.getBytes(StandardCharsets.ISO_8859_1))
    nScans
  }
}

/** MGF export with the charge-duplication transform the de novo tools
  * need (convert_mzxml_to_mgf msproc.py:423-440 +
  * adjust_mgf_files.py:40-66). The adjustment's exact contract:
  *  - the file holds TWO passes over the spectra IN ORDER — every
  *    spectrum at charge 2 first, then every spectrum again at
  *    charge 3 (two sequential reader loops, not per-spectrum
  *    interleave);
  *  - TITLE and SCANS are both the bare scan number (the original
  *    "scan=N_…" title is cut down to N);
  *  - DeepNovo mode adds RTINSECONDS = 10 + i where i is the ordinal
  *    WITHIN the charge pass (both passes restart at 10), and the
  *    placeholder SEQ=PEPTIDE its reader requires. */
object MgfWriter {

  final case class MgfSpectrum(
      scan: Long, precMz: Double, precIntensity: Double,
      mzs: Array[Double], ints: Array[Double], rtSeconds: Double = 0.0)

  /** C "%.Ng" VALUE parity: the reference's intermediate MGF formats
    * fragments '%.10g %.8g' (msproc.py:438) and the adjustment pass
    * re-parses those strings — the significant-digit rounding is
    * carried in the final values. %g rounds the exact binary value
    * to-nearest-even, which is BigDecimal's exact-binary constructor +
    * HALF_EVEN MathContext. */
  private def sigRound(v: Double, n: Int): Double =
    if (v == 0.0 || v.isNaN || v.isInfinite) v
    else new java.math.BigDecimal(v)
      .round(new java.math.MathContext(n, java.math.RoundingMode.HALF_EVEN))
      .doubleValue()

  def spectrumBlock(
      s: MgfSpectrum, charge: Int, ordinalInPass: Int,
      forDeepNovo: Boolean): String = {
    val sb = new StringBuilder
    sb ++= "BEGIN IONS\n"
    sb ++= s"TITLE=${s.scan}\n"
    sb ++= s"PEPMASS=${s.precMz} ${s.precIntensity}\n"
    sb ++= s"CHARGE=$charge+\n"
    sb ++= s"SCANS=${s.scan}\n"
    if (forDeepNovo) {
      sb ++= s"RTINSECONDS=${10 + ordinalInPass}\n"
      sb ++= "SEQ=PEPTIDE\n"
    }
    var i = 0
    while (i < s.mzs.length) {
      sb ++= s"${sigRound(s.mzs(i), 10)} ${sigRound(s.ints(i), 8)}\n"
      i += 1
    }
    sb ++= "END IONS\n"
    sb.toString
  }

  /** Write the adjusted MGF: one full charge-2 pass, then one full
    * charge-3 pass (adjust_mgf_files.py:40-52). */
  def write(
      path: String, spectra: Seq[MgfSpectrum],
      forDeepNovo: Boolean = false): Unit = {
    val sb = new StringBuilder
    Seq(2, 3).foreach { ch =>
      spectra.zipWithIndex.foreach { case (s, i) =>
        sb ++= spectrumBlock(s, ch, i, forDeepNovo)
      }
    }
    Files.write(Paths.get(path),
      sb.toString.getBytes(StandardCharsets.ISO_8859_1))
  }
}
