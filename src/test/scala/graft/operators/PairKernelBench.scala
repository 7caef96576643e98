package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B of pair-generation kernels (not a test). */
object PairKernelBench {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[pk] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("pk-bench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()

    val sh = Dedup.shinglesCached(spark, d)
    sh.count()

    (1 to 2).foreach { rep =>
      val typed = time(s"typed groupByKey rep$rep") {
        val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") > 1000).select("s")
        val capped = sh.join(broadcast(hot), Seq("s"), "left_anti")
          .select(col("doc_id"), col("s"))
        capped.as[(Long, String)]
          .groupByKey(_._2)
          .flatMapGroups { (_, it) =>
            val ids = it.map(_._1).toArray
            if (ids.length > 1000) Iterator.empty
            else {
              java.util.Arrays.sort(ids)
              new Iterator[(Long, Long)] {
                private var i = 0
                private var j = 1
                def hasNext: Boolean = ids.length > 1 && i < ids.length - 1
                def next(): (Long, Long) = {
                  val p = (ids(i), ids(j))
                  j += 1
                  if (j >= ids.length) { i += 1; j = i + 1 }
                  p
                }
              }
            }
          }.toDF("d1", "d2").groupBy("d1", "d2")
          .agg(count(lit(1)).as("c")).count()
      }
      val hof = time(s"HOF collect_list rep$rep") {
        val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") > 1000).select("s")
        val capped = sh.join(broadcast(hot), Seq("s"), "left_anti")
          .select(col("doc_id"), col("s"))
        capped.groupBy("s").agg(sort_array(collect_list("doc_id")).as("ids"))
          .filter(size(col("ids")).between(2, 1000))
          .select(explode(expr(
            "flatten(transform(ids, (x, i) -> " +
              "transform(slice(ids, i + 2, size(ids) - i - 1), " +
              "y -> struct(x AS d1, y AS d2))))")).as("p"))
          .select(col("p.d1"), col("p.d2"))
          .groupBy("d1", "d2").agg(count(lit(1)).as("c")).count()
      }
      println(s"[pk] counts equal-ish check: typed=$typed hof=$hof")
    }
    spark.stop()
  }
}
