package graft.ms

import org.apache.spark.sql.SparkSession

/** Scratch profiling harness for the ms stage chain (not a test). */
object MsChainProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[msprof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("ms-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/lineitem.parquet").count()
    time("tensors cache") {
      MsPipeline.tensors(spark, d).count()
    }
    time("q_ms_decompose (models)") {
      graft.SparkEntry.queries("q_ms_decompose")(spark, d).count()
    }
    time("q_ms_best_models") {
      graft.SparkEntry.queries("q_ms_best_models")(spark, d).count()
    }
    time("q_ms_best_models warm") {
      graft.SparkEntry.queries("q_ms_best_models")(spark, d).count()
    }
    spark.stop()
  }
}
