package graft.ms

import graft.ms.ops.{TensorizeOp, WindowOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the tensorize chain (not a test). */
object TensorProfile {

  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").appName("tensor-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    def rawPeaks = graft.Tables.lineitem(spark, d).select(
      concat(lit("s"), col("l_suppkey") % 3).as("file"),
      (col("l_orderkey") % 500).cast("int").as("spectrum_index"),
      (lit(1) + col("l_linenumber") % 2).cast("int").as("level"),
      ((col("l_orderkey") % 1000) * 0.6).as("rt"),
      (lit(400.0) + (col("l_partkey") % 200) * 2.0).as("mz"),
      (col("l_quantity") * 100.0).as("intensity"),
      (lit(400.0) + (col("l_partkey") % 10) * 40.0)
        .as("prec_isolation_window_start"),
      (lit(441.0) + (col("l_partkey") % 10) * 40.0)
        .as("prec_isolation_window_end"))
      .withColumn("prec_mz", col("prec_isolation_window_start") + 20.0)

    def adjusted = {
      val raw = rawPeaks
      val windows = WindowOps.adjustedWindows(raw)
      WindowOps.assignRtWindows(
        WindowOps.applyAdjustment(raw, windows), 60.0)
        .select(col("file"), col("spectrum_index"), col("level"),
          col("rt").cast("float").as("rt"), col("mz").cast("float").as("mz"),
          col("intensity").cast("float").as("intensity"),
          col("prec_mz").cast("float").as("prec_mz"),
          col("swath_lower_adjusted").cast("float").as("swath_lower_adjusted"),
          col("swath_upper_adjusted").cast("float").as("swath_upper_adjusted"),
          col("rt_window"))
        .as[AdjustedPeak]
    }

    time("lineitem count")(rawPeaks.count())
    time("adjusted count")(adjusted.count())
    time("adjusted count again")(adjusted.count())
    time("tensorize")(TensorizeOp.tensorize(spark, adjusted, 2000.0).count())
    time("tensorize again")(TensorizeOp.tensorize(spark, adjusted, 2000.0).count())
    spark.stop()
  }
}
