package graft.sources

import java.io.{BufferedInputStream, FileInputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64
import java.util.zip.Inflater
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** One peak row as emitted by the mzML source (stage-1 output schema,
  * reference msproc.py:35-42). */
final case class RawPeak(
    file: String,
    spectrum_index: Int,
    level: Int,
    rt: Double,
    mz: Double,
    intensity: Double,
    prec_mz: Double,
    prec_isolation_window_start: Double,
    prec_isolation_window_end: Double)

/** mzML ingestion: an executor-side StAX pull parser → `Dataset[RawPeak]`.
  *
  * Re-expresses `msproc.mzml_to_csv` (reference msproc.py:65-201) and
  * `get_swath_intervals_from_mzml` (msproc.py:524-556) Spark-first: the
  * driver only lists file paths; each executor task parses whole files
  * (mzML is a row-ordered container — one file is the natural split), so
  * ingest scales linearly with executor count exactly like the
  * reference's one-process-per-file Snakemake fan-out (mzml2csv
  * .Snakefile:29-41), minus the process overhead and the CSV
  * intermediate.
  *
  * Faithful semantics:
  *  - RT normalized to seconds (unit "minute" ⇒ ×60, msproc.py:135-137)
  *    and rounded half-even to 4 dp; m/z to 10 dp; intensity to 8 dp
  *    (np.around is half-even; RT_DIGITS/MZ_DIGITS/I_DIGITS,
  *    msproc.py:31-33);
  *  - MS1 rows: prec_mz := mz (msproc.py:158-160); MS2 rows: prec_mz :=
  *    isolation window target m/z [MS:1000827] (msproc.py:144-147);
  *  - MS2 peaks below `minIntensity` dropped at parse time
  *    (msproc.py:156-157) — predicate pushdown into the source;
  *  - rows whose prec_mz falls in no isolation window are discarded;
  *    multi-match resolves to the lowest window start (msproc.py:164-170);
  *  - spectra missing scan time / MS2 without precursor info skipped
  *    (msproc.py:128-141);
  *  - binary arrays: base64, little-endian, 32/64-bit floats
  *    [MS:1000521/MS:1000523], optional zlib [MS:1000574].
  */
object MzMLSource {

  // ------------------------------------------------------------- rounding
  /** np.around parity, bit-exact: numpy rounds float64 by SCALING —
    * rint(v·10^d)/10^d (numpy.around docs call out the inexactness) —
    * which differs from decimal half-even whenever the scaled product
    * falls on the other side of .5 (np.around(4.435, 2) = 4.43 but the
    * decimal tie rule gives 4.44, np.around(2.675, 2) = 2.68 but the
    * exact binary rounds to 2.67). Math.rint is ties-to-even like
    * np.rint; verified against np.around on 200k random values at
    * d ∈ {4, 8, 10} (msproc.py:137-160 uses these digit counts). */
  def roundHalfEven(v: Double, digits: Int): Double =
    if (v.isNaN || v.isInfinite) v
    else {
      val p = math.pow(10, digits)
      math.rint(v * p) / p
    }

  private val RtDigits = 4
  private val MzDigits = 10
  private val IDigits = 8

  // ------------------------------------------------------------ container
  private final case class BinaryArray(
      isMz: Boolean, is64: Boolean, zlib: Boolean, b64: StringBuilder)

  /** Decode one <binaryDataArray> payload to doubles. */
  private def decode(a: BinaryArray): Array[Double] = {
    var bytes = Base64.getMimeDecoder.decode(a.b64.toString.trim)
    if (a.zlib) {
      val inf = new Inflater()
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](8192)
      var truncated = false
      while (!inf.finished() && !truncated) {
        val n = inf.inflate(buf)
        out.write(buf, 0, n)
        // truncated/corrupt payload: stop instead of spinning
        if (n == 0 && inf.needsInput()) truncated = true
      }
      inf.end()
      bytes = out.toByteArray
    }
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (a.is64) {
      val out = new Array[Double](bytes.length / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getDouble(i * 8); i += 1 }
      out
    } else {
      val out = new Array[Double](bytes.length / 4)
      var i = 0
      while (i < out.length) { out(i) = bb.getFloat(i * 4).toDouble; i += 1 }
      out
    }
  }

  private final class Spectrum {
    var index: Int = -1
    var level: Int = -1
    var rt: Double = Double.NaN
    var rtUnitMinute: Boolean = false
    var target: Double = Double.NaN
    var lowerOff: Double = Double.NaN
    var upperOff: Double = Double.NaN
    var mzArr: Array[Double] = null
    var intArr: Array[Double] = null
  }

  private trait SpectrumIterator extends Iterator[Spectrum] with AutoCloseable

  /** Incremental pull cursor: advances the StAX reader only far enough to
    * produce the next complete `<spectrum>` — memory stays O(one
    * spectrum). The reader closes at document end, or via `close()` when
    * a consumer stops early. With `parseBinary=false` the peak arrays are
    * neither accumulated nor decoded (header-only scans). */
  private def pullSpectra(
      path: String, parseBinary: Boolean = true): SpectrumIterator = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    val in = new BufferedInputStream(new FileInputStream(path), 1 << 20)
    val r: XMLStreamReader = f.createXMLStreamReader(in)

    new SpectrumIterator {
      private var nextSp: Spectrum = null
      private var done = false
      private var sp: Spectrum = null
      private var curArr: BinaryArray = null
      private var inBinary = false
      private var inIsolationWindow = false

      override def close(): Unit =
        if (!done) { done = true; r.close(); in.close() }

      /** Run the cursor until one spectrum completes or EOF. */
      private def advance(): Unit = {
        while (nextSp == null && !done && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "spectrum" =>
                  sp = new Spectrum
                  sp.index = r.getAttributeValue(null, "index").toInt
                case "isolationWindow" => inIsolationWindow = true
                case "binaryDataArray" =>
                  curArr = BinaryArray(isMz = false, is64 = false,
                    zlib = false, new StringBuilder)
                case "binary" => inBinary = curArr != null
                case "cvParam" if sp != null =>
                  val acc = r.getAttributeValue(null, "accession")
                  val value = r.getAttributeValue(null, "value")
                  acc match {
                    case "MS:1000511" => sp.level = value.toInt
                    case "MS:1000016" =>
                      sp.rt = value.toDouble
                      sp.rtUnitMinute =
                        r.getAttributeValue(null, "unitName") == "minute"
                    case "MS:1000827" if inIsolationWindow =>
                      sp.target = value.toDouble
                    case "MS:1000828" if inIsolationWindow =>
                      sp.lowerOff = value.toDouble
                    case "MS:1000829" if inIsolationWindow =>
                      sp.upperOff = value.toDouble
                    case "MS:1000514" if curArr != null =>
                      curArr = curArr.copy(isMz = true)
                    case "MS:1000523" if curArr != null =>
                      curArr = curArr.copy(is64 = true)
                    case "MS:1000574" if curArr != null =>
                      curArr = curArr.copy(zlib = true)
                    case _ =>
                  }
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS if inBinary =>
              if (parseBinary) curArr.b64.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "isolationWindow" => inIsolationWindow = false
                case "binary" => inBinary = false
                case "binaryDataArray" =>
                  if (parseBinary && curArr != null && sp != null) {
                    val arr = decode(curArr)
                    if (curArr.isMz) sp.mzArr = arr else sp.intArr = arr
                  }
                  curArr = null
                case "spectrum" =>
                  nextSp = sp
                  sp = null
                case _ =>
              }
            case _ =>
          }
        }
        if (nextSp == null) close()
      }

      override def hasNext: Boolean = {
        if (nextSp == null && !done) advance()
        nextSp != null
      }

      override def next(): Spectrum = {
        if (!hasNext) throw new NoSuchElementException(path)
        val out = nextSp
        nextSp = null
        out
      }
    }
  }

  /** Sample name from a path (file stem, as the reference uses). */
  private def stem(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  /** Expand one parsed spectrum into peak rows (reference parse-time
    * semantics: filters, rounding, window tagging by sorted-first match). */
  private def spectrumPeaks(
      sample: String,
      sp: Spectrum,
      windows: Array[(Double, Double)],
      minIntensity: Double): Seq[RawPeak] = {
    val skip = sp.rt.isNaN ||
      (sp.level == 2 && sp.target.isNaN) ||
      sp.mzArr == null || sp.intArr == null
    if (skip) return Nil
    val out = ArrayBuffer.empty[RawPeak]
    val rtSec = roundHalfEven(if (sp.rtUnitMinute) sp.rt * 60 else sp.rt,
      RtDigits)
    val precMzMs2 =
      if (sp.level == 2) roundHalfEven(sp.target, MzDigits) else Double.NaN
    var i = 0
    val n = math.min(sp.mzArr.length, sp.intArr.length)
    while (i < n) {
      val rawInt = sp.intArr(i)
      if (!(sp.level == 2 && rawInt < minIntensity)) {
        val mz = roundHalfEven(sp.mzArr(i), MzDigits)
        val intensity = roundHalfEven(rawInt, IDigits)
        val precMz = if (sp.level == 1) mz else precMzMs2
        // first (lowest-start) window containing prec_mz
        var w = 0
        var hit = -1
        while (hit < 0 && w < windows.length) {
          if (precMz >= windows(w)._1 && precMz < windows(w)._2) hit = w
          w += 1
        }
        if (hit >= 0) {
          out += RawPeak(sample, sp.index, sp.level, rtSec, mz, intensity,
            precMz, windows(hit)._1, windows(hit)._2)
        }
      }
      i += 1
    }
    out.toSeq
  }

  /** Parse one file into peak rows LAZILY — one spectrum is expanded at a
    * time as the task iterator pulls, so peak memory is one spectrum's
    * arrays, not the whole file (mzML files can be tens of GB). */
  def parseFile(
      path: String,
      windows: Array[(Double, Double)],
      minIntensity: Double): Iterator[RawPeak] with AutoCloseable = {
    val sample = stem(path)
    new Iterator[RawPeak] with AutoCloseable {
      // the pull cursor advances the XML reader one spectrum at a time
      private val spectra = pullSpectra(path)
      private var buf: Iterator[RawPeak] = Iterator.empty
      private def advance(): Unit = {
        while (!buf.hasNext && spectra.hasNext) {
          buf = spectrumPeaks(sample, spectra.next(), windows,
            minIntensity).iterator
        }
      }
      override def hasNext: Boolean = { advance(); buf.hasNext }
      override def next(): RawPeak = { advance(); buf.next() }
      override def close(): Unit = spectra.close()
    }
  }

  /** Continuous ingestion of a landing directory — the streaming form of
    * [[read]]: Structured Streaming's file source discovers new `*.mzML`
    * files per micro-batch, and each task runs the same lazy pull parser
    * over its file. Only the `path` column is selected from the
    * binaryFile source, so file BYTES never materialize into rows — the
    * parser streams from storage exactly as the batch path does, and a
    * 10 GB instrument file costs one spectrum of memory, not 10 GB.
    * Downstream transforms (slicing, windowed aggregation) are ordinary
    * streaming operators; see `q_ms_stream_slices` for the slicing stage
    * run this way. Windows must be supplied up front (they come from the
    * first sample in the reference, a 1-file batch call). */
  def readStream(
      spark: SparkSession,
      dir: String,
      windows: Seq[(Double, Double)],
      minIntensity: Double = 0.0): Dataset[RawPeak] = {
    import spark.implicits._
    val ws = windows.sortBy(_._1).toArray
    val bc = spark.sparkContext.broadcast(ws)
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.mzML")
      // the binaryFile source's fixed schema, required explicitly by
      // streaming file sources; only `path` is ever read (pruned scan)
      .schema("path STRING, modificationTime TIMESTAMP, " +
        "length LONG, content BINARY")
      .load(dir)
      .select("path").as[String]
      .flatMap { uri =>
        val p =
          if (uri.startsWith("file:")) new java.net.URI(uri).getPath else uri
        val it = parseFile(p, bc.value, minIntensity)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => it.close()))
        it
      }
  }

  /** Derive the isolation-window set from MS2 headers:
    * [target − lowerOffset, target + upperOffset) (msproc.py:524-556). */
  def deriveWindowsLocal(path: String): Seq[(Double, Double)] = {
    val set = scala.collection.mutable.SortedSet.empty[(Double, Double)]
    // header-only scan: binary payloads are skipped, not decoded
    val it = pullSpectra(path, parseBinary = false)
    try it.foreach { sp =>
      if (sp.level == 2 && !sp.target.isNaN && !sp.lowerOff.isNaN)
        set += ((sp.target - sp.lowerOff, sp.target + sp.upperOff))
    } finally it.close()
    set.toSeq
  }

  /** Distributed read: one task per file. Windows are derived from the
    * first file when not supplied (reference convert_mzml2csv.py:19-27 /
    * mzml2csv.Snakefile:19-26 use the first sample's windows for all). */
  def read(
      spark: SparkSession,
      paths: Seq[String],
      windows: Option[Seq[(Double, Double)]] = None,
      minIntensity: Double = 0.0): Dataset[RawPeak] = {
    import spark.implicits._
    val ws = windows.getOrElse(deriveWindowsLocal(paths.head))
      .sortBy(_._1).toArray
    val bc = spark.sparkContext.broadcast(ws)
    spark.createDataset(paths).repartition(paths.length)
      .flatMap { p =>
        val it = parseFile(p, bc.value, minIntensity)
        // release the file handle even when the task stops early
        // (limit/take/abort) — EOF-close alone would leak it
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => it.close()))
        it
      }
  }
}
