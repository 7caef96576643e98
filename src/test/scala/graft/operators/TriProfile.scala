package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the triangle chain (not a test). */
object TriProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[tprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/target/scale10x")
    val spark = SparkSession.builder()
      .master("local[32]").appName("tri-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/lineitem.parquet").count()

    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val e0 = time("edge derivation") {
      val e = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct().persist()
      println(s"[tprof]   edges = ${e.count()}")
      e
    }
    val deg = time("degrees") {
      val dg = e0.select(col("u").as("x"))
        .unionByName(e0.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("dg")).persist()
      println(s"[tprof]   nodes = ${dg.count()}")
      dg
    }
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oe = time("orientation") {
      val o = e0
        .join(broadcast(deg.select(col("x").as("u"), col("dg").as("du"))), "u")
        .join(broadcast(deg.select(col("x").as("v"), col("dg").as("dv"))), "v")
        .select(when(lowFirst, col("u")).otherwise(col("v")).as("a"),
          when(lowFirst, col("v")).otherwise(col("u")).as("b"),
          when(lowFirst, col("dv")).otherwise(col("du")).as("db"))
        .persist()
      o.count()
      o
    }
    val adj = time("adjacency build") {
      val a = oe.groupBy(col("a"))
        .agg(sort_array(collect_list(col("b"))).as("nb")).persist()
      a.count()
      a
    }
    time("closure") {
      val n = oe.select(col("a"), col("b"))
        .join(adj.select(col("a"), col("nb").as("na")), Seq("a"))
        .join(adj.select(col("a").as("b"), col("nb").as("nbb")),
          Seq("b"), "left")
        .select(size(array_intersect(col("na"),
          coalesce(col("nbb"), array()))).cast("long").as("t"))
        .agg(coalesce(sum(col("t")), lit(0L))).head().getLong(0)
      println(s"[tprof]   triangles = $n")
    }
    spark.stop()
  }
}
