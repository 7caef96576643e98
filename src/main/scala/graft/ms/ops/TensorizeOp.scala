package graft.ms.ops

import graft.ms.{AdjustedPeak, SliceTensor}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Spark wrapper for stage-4 tensorization: group the sliced peak table
  * by (swath_key, rt_window) and build one dense tensor per group.
  *
  * Scale notes: this is the natural `groupByKey.mapGroups` shape — one
  * shuffle clustered on the slice key, then an independent sequential
  * kernel per slice (the greedy partitioner is order-dependent, so
  * intra-slice parallelism is impossible by construction; the reference
  * ran one OS process per slice instead, generate_slice_tensors
  * .Snakefile:35-43). Slices are bounded (≤ a few MB) regardless of total
  * data volume, so at 100 TB this becomes O(10⁶) uniform tasks with no
  * driver involvement. Failed slices (the reference's "Could not
  * tensorize" sentinel JSON) are dropped here and can be collected via
  * [[errors]].
  */
object TensorizeOp {

  /** peaks must carry: file, spectrum_index, level, rt, mz, intensity,
    * prec_mz, swath_lower_adjusted, swath_upper_adjusted, rt_window. */
  def tensorize(
      spark: SparkSession,
      peaks: Dataset[AdjustedPeak],
      mzTolPpm: Double): Dataset[SliceTensor] = {
    import spark.implicits._
    peaks
      .groupByKey(p =>
        (Tensorizer.swathKey(p.swath_lower_adjusted.toDouble), p.rt_window))
      .mapGroups((key: (String, Int), rows: Iterator[AdjustedPeak]) =>
        Tensorizer.tensorize(key._1, key._2, rows, mzTolPpm))
      .flatMap(_.toOption)
  }

  /** Snakemake-parity resume for the tensorize stage (the reference's
    * file-existence DAG, `candia:29-44`, skips every slice whose tensor
    * artifact exists): tensors persist as parquet at `tensorStorePath`;
    * a resumed run anti-joins the peak table's slice keys against the
    * store's existing (swath_key, rt_window) keys — distributed, no
    * driver-side listing — tensorizes only the missing slices, and
    * appends. After a partial failure at 100 TB only the missing slices
    * re-read their peaks. Returns the full store. */
  def tensorizeResumable(
      spark: SparkSession,
      peaks: Dataset[AdjustedPeak],
      mzTolPpm: Double,
      tensorStorePath: String): Dataset[SliceTensor] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val storePath = new org.apache.hadoop.fs.Path(tensorStorePath)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val todo =
      if (!fs.exists(storePath)) peaks
      else {
        val done = spark.read.parquet(tensorStorePath)
          .select(col("swath_key"), col("rt_window")).distinct()
        WindowOps.withSwathKey(peaks.toDF())
          .join(done, Seq("swath_key", "rt_window"), "left_anti")
          .drop("swath_key")
          .as[AdjustedPeak]
      }
    tensorize(spark, todo, mzTolPpm)
      .write.mode("append").parquet(tensorStorePath)
    spark.read.parquet(tensorStorePath).as[SliceTensor]
  }

  /** Per-slice tensorization failures (slice key → reason). */
  def errors(
      spark: SparkSession,
      peaks: Dataset[AdjustedPeak],
      mzTolPpm: Double): Dataset[(String, Int, String)] = {
    import spark.implicits._
    peaks
      .groupByKey(p =>
        (Tensorizer.swathKey(p.swath_lower_adjusted.toDouble), p.rt_window))
      .mapGroups((key: (String, Int), rows: Iterator[AdjustedPeak]) =>
        Tensorizer.tensorize(key._1, key._2, rows, mzTolPpm) match {
          case Left(err) => Some((key._1, key._2, err.message))
          case Right(_)  => None
        })
      .flatMap(identity)
  }
}
