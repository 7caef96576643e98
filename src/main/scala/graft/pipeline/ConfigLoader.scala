package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Loader for the reference's flat experiment YAML
  * (test/test_experiment/config/candia.yaml:1-64 — scalar `key: value`
  * pairs only, no nesting). Implemented as a YAML-subset parser so the
  * engine stays dependency-free; `$VARS` in values expand from the
  * environment like the reference's os.path.expandvars.
  */
object ConfigLoader {

  /** Parse flat YAML text into a key → string map. Comments (#…),
    * document markers (---) and blank lines are ignored; quotes are
    * stripped; env vars in values are expanded. */
  def parseFlatYaml(
      text: String,
      env: Map[String, String] = sys.env): Map[String, String] =
    text.linesIterator
      .map(_.takeWhile(_ != '#').trim)
      .filter(l => l.nonEmpty && l != "---" && l.contains(':'))
      .map { l =>
        val i = l.indexOf(':')
        val k = l.substring(0, i).trim
        var v = l.substring(i + 1).trim
        if (v.length >= 2 &&
          ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
          v = v.substring(1, v.length - 1)
        v = "\\$\\{?(\\w+)\\}?".r.replaceAllIn(v,
          m => java.util.regex.Matcher.quoteReplacement(
            env.getOrElse(m.group(1), m.matched)))
        k -> v
      }
      .toMap

  /** Build a [[CandiaConfig]] from the reference YAML's keys, falling
    * back to the reference defaults for absent keys. */
  def candiaConfig(yaml: Map[String, String]): CandiaConfig = {
    def d(k: String, dflt: Double) = yaml.get(k).map(_.toDouble).getOrElse(dflt)
    def i(k: String, dflt: Int) = yaml.get(k).map(_.trim.toInt).getOrElse(dflt)
    CandiaConfig(
      minScanIntensity = d("min_scan_intensity", 1.0),
      windowSizeSec = d("window_size_sec", 60.0),
      massTolPpm = d("mass_tol_ppm", 40.0),
      parafacMinComp = i("parafac_min_comp", 10),
      parafacMaxComp = i("parafac_max_comp", 14),
      parafacMaxIter = i("parafac_max_iter", 5000),
      parafacTol = d("parafac_min_error_diff", 1e-7),
      avgPeakFwhmSec = d("avg_peak_fwhm_sec", 5.0))
  }

  def load(path: String): CandiaConfig =
    candiaConfig(parseFlatYaml(new String(
      Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)))
}
