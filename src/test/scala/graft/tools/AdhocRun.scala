package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query runner for local iteration:
  * Test/runMain graft.tools.AdhocRun <queryName> <sfDir> */
object AdhocRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val rows = graft.SparkEntry.queries(name)(spark, dir).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"ADHOC $name rows=${rows.length} sec=$sec%.2f")
    rows.take(5).foreach(r => println(s"  $r"))
    spark.stop()
  }
}
