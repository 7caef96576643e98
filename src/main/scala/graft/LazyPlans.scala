package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy plan builders for registry queries whose `run` materializes its
  * (aggregate-sized) output and releases its working caches — for those,
  * explaining the registry entry shows only a LocalTableScan, so the
  * plan audit (graft.Explain, plans/rNN artifacts) reads the REAL
  * computation from here instead. Builders return (lazy output, caches
  * to release); Explain never executes them, so the caches stay cold. */
object LazyPlans {
  val builders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scale_heavy_hitters" -> ((s, d) =>
      operators.ScaleOps.heavyHittersPlan(s, d)._1),
    "q_scale_secondary_index" -> ((s, d) =>
      operators.ScaleOps.secondaryIndexPlan(s, d)._1),
    "q_graph_lift" -> ((s, d) =>
      operators.GraphOps.liftPlan(s, d)._1),
    "q_graph_triangles" -> ((s, d) =>
      operators.GraphOps.trianglesPlan(s, d)._1),
    "q_graph_triangles_capped" -> ((s, d) =>
      operators.GraphOps.trianglesCappedPlan(s, d)._1)
  )
}
