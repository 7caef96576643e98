package org.apache.spark.sql.graftinternal

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Wraps a custom LogicalPlan into a DataFrame. `Dataset.ofRows` is
  * `private[sql]`, so this one-liner lives in a subpackage of
  * `org.apache.spark.sql` — the standard technique every library that
  * contributes logical operators uses (Delta, Sedona, GraphFrames all
  * ship an identical bridge). Nothing else in the repo reaches into
  * Spark internals this way. */
private[graftinternal] object BridgeImpl {
  def ofRows(
      s: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}

object Bridge {
  def ofRows(
      s: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    BridgeImpl.ofRows(s, plan)
}
