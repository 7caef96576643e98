package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 9–10 result gathering: search-engine output tables back into
  * the engine as DataFrames.
  *
  * Two reference shapes:
  *  - crux/percolator PSM TSVs collated with provenance
  *    (crux_diaumpire.Snakefile:46-62): each tab-separated table tagged
  *    with its source file and the trailing digit of its `_Q<n>`
  *    quality tag, then unioned.
  *  - per-slice result CSV gather (gather_model_evaluation_results
  *    .py:31-137): every `<sliceDir>/<name>` under the slice layout,
  *    optionally stamped with (swath_start, rt_window) parsed from the
  *    `key=value/` path segments, swath_start normalized to the 2-dp
  *    string key and ordinals to int — the reference's pool.map +
  *    pd.concat becomes one distributed CSV scan.
  *
  * Scale notes: both readers are plain file-source scans — Spark lists
  * and reads the (many small) result files across executors; no
  * driver-side loops, no collect. Schema inference costs one extra pass
  * over what are tiny driver artifacts.
  */
object PsmGather {

  /** Collate crux/percolator PSM TSVs: `file` = source path, `quality` =
    * trailing digit of the `_Q<n>` filename tag (the reference keeps
    * only the last digit: `findall('_Q\\d+')[0][-1]`). */
  def readPsmTables(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true")
      .option("inferSchema", "true")
      .csv(paths: _*)
      .withColumn("file", input_file_name())
      .withColumn("quality",
        regexp_extract(input_file_name(), "_Q\\d*(\\d)", 1))

  /** Gather one result CSV per slice directory from a partitioned slice
    * layout (`.../<swath key>=<v>/rt_window=<v>/<filename>`). With
    * `addSliceParams` the slice coordinates come from the path (the
    * reference's decomp_measures.csv case); without it the file already
    * carries swath_start/rt_window columns (the id_results.csv case).
    * Either way swath_start normalizes to the reference's 2-dp string
    * key and rt_window/ncomp to ints
    * (gather_model_evaluation_results.py:95-121). */
  def gatherSliceResults(
      spark: SparkSession,
      root: String,
      filename: String,
      addSliceParams: Boolean): DataFrame = {
    val base = spark.read
      .option("header", "true").option("inferSchema", "true")
      .option("recursiveFileLookup", "true") // treat layout dirs as plain dirs
      .option("pathGlobFilter", filename)
      .csv(root)
    val f = input_file_name()
    val withParams =
      if (addSliceParams)
        base
          // anchored on the swath partition column name (matches both
          // `swath_lower_adjusted=` and `swath_key=`) — an unanchored
          // first `=value/` would capture unrelated key=value segments
          // earlier in the root path
          .withColumn("swath_start",
            regexp_extract(f, "swath[^/=]*=([^/]*)/", 1).cast("double"))
          .withColumn("rt_window",
            regexp_extract(f, "rt_window=([^/]*)/", 1).cast("double"))
      else base
    val normalized = withParams
      .withColumn("swath_start",
        format_string("%.2f", bround(col("swath_start").cast("double"), 2)))
      .withColumn("rt_window", col("rt_window").cast("int"))
    if (normalized.columns.contains("ncomp"))
      normalized.withColumn("ncomp", col("ncomp").cast("int"))
    else normalized
  }
}
