package graft.ms

import org.apache.spark.sql.SparkSession

/** Scratch probe: slice-tensor census per scale factor (not a test). */
object TensorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("tensor-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val ts = MsPipeline.tensors(spark, d).collect()
    println(s"TOTAL=${ts.length}")
    println(s"NONTRIVIAL=${ts.count(t => !graft.ms.ops.Decomposer.isTrivial(t))}")
    ts.sortBy(t => (t.swath_key, t.rt_window)).take(8).foreach(t =>
      println(s"PROBE ${t.swath_key} ${t.rt_window} s=${t.n_samples} " +
        s"c=${t.n_cycles} m=${t.n_mz}"))
    spark.stop()
  }
}
