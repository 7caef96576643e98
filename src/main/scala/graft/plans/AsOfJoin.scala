package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** Backward as-of join (pandas `merge_asof` / time-series ASOF JOIN):
  * for every left row (by, t) emit the single right row with the same
  * `by` key and the greatest right time ≤ t — LEFT OUTER semantics
  * (unmatched left rows keep nulls on the right), deterministic
  * tie-break by the sort order (time, then right row's time column
  * duplicates resolved by the build sort's secondary key — callers
  * pass a unique right time or accept max-time row with the greatest
  * tiebreak value).
  *
  * This is the whole-operator tier of SURVEY §2.3's nearest-value
  * family: the aggregate formulation (`q_join_asof`, min-of-struct
  * argmin) is the shuffle-friendly general form; THIS operator is the
  * broadcast form — right side collected once per query, grouped by
  * key, time-sorted, probed by binary search in O(log n) per left row
  * with the left side streaming in place (no exchange, no per-row
  * candidate explosion). At 100 TB with a broadcastable right side
  * (reference prices, config snapshots, model versions) this is the
  * shape you want; a non-broadcastable right side falls back to the
  * aggregate form.
  *
  * Times and keys are LongType (epoch micros / ids): exact total order,
  * no NaN corner (contrast [[IntervalJoinExec]]'s Double handling).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Attribute,
    leftOn: Attribute,
    rightBy: Attribute,
    rightOn: Attribute,
    rightTie: Attribute)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftBy: Attribute,
    leftOn: Attribute,
    rightBy: Attribute,
    rightOn: Attribute,
    rightTie: Attribute,
    nullableRightOutput: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ nullableRightOutput

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numBuildRows" -> SQLMetrics.createMetric(sparkContext,
      "number of broadcast build rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val byB = BindReferences.bindReference(rightBy: Expression, right.output)
    val onB = BindReferences.bindReference(rightOn: Expression, right.output)
    val tieB = BindReferences.bindReference(rightTie: Expression, right.output)
    // The build collects the right side to the driver. Stream it
    // partition-at-a-time with a hard row ceiling so an oversized right
    // side fails loudly (pointing at the shuffle-friendly aggregate
    // form) instead of OOMing the driver mid-executeCollect.
    val maxBuildRows = conf
      .getConfString("spark.graft.asof.maxBuildRows", "5000000").toLong
    val rowsIt =
      org.apache.spark.sql.graftinternal.Bridge.executeToIterator(right)
    val buf =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, InternalRow)]
    var seen = 0L
    while (rowsIt.hasNext) {
      val r = rowsIt.next()
      seen += 1
      if (seen > maxBuildRows) throw new IllegalStateException(
        s"as-of join: build (right) side exceeds " +
          s"spark.graft.asof.maxBuildRows=$maxBuildRows rows. The broadcast " +
          "as-of form collects the right side to the driver; for a large " +
          "right side use the aggregate as-of formulation (min-of-struct " +
          "argmin, see q_join_asof) or raise the ceiling.")
      // null key/time rows can never be an as-of match — drop at build
      val k = byB.eval(r); val t = onB.eval(r); val tb = tieB.eval(r)
      if (k != null && t != null)
        buf += ((k.asInstanceOf[Long], t.asInstanceOf[Long],
          if (tb == null) Long.MinValue else tb.asInstanceOf[Long], r.copy()))
    }
    val built: Map[Long, (Array[Long], Array[InternalRow])] =
      buf.groupBy(_._1)
        .map { case (k, rows) =>
          val sorted = rows.sortBy(x => (x._2, x._3))
          k -> (sorted.map(_._2).toArray, sorted.map(_._4).toArray)
        }
    longMetric("numBuildRows").add(built.valuesIterator.map(_._1.length).sum)
    val bc = sparkContext.broadcast(built)
    val lByB = BindReferences.bindReference(leftBy: Expression, left.output)
    val lOnB = BindReferences.bindReference(leftOn: Expression, left.output)
    val outAttrs = output
    val nRight = nullableRightOutput.length
    left.execute().mapPartitions({ it =>
      val groups = bc.value
      val joiner = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(nRight)
      it.map { lrow =>
        val k = lByB.eval(lrow)
        val t = lOnB.eval(lrow)
        val matched: InternalRow =
          if (k == null || t == null) nullRight
          else groups.get(k.asInstanceOf[Long]) match {
            case None => nullRight
            case Some((times, rows)) =>
              val x = t.asInstanceOf[Long]
              // last index with times(i) <= x (ties resolved by the
              // build sort: equal times are ordered by tiebreak, and
              // the binary search lands past the last of them)
              var lo = 0; var hi = times.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= x) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (ans < 0) nullRight else rows(ans)
          }
        numOutputRows += 1
        proj(joiner(lrow, matched))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for [[AsOfJoinPlan]] (the node is only constructible
  * through [[AsOfJoin.join]], which gates on intent — the strategy
  * always plans it). */
object AsOfJoinStrategy extends SparkStrategy {
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(this))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this
  }
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lBy, lOn, rBy, rOn, rTie) =>
      AsOfJoinExec(lBy, lOn, rBy, rOn, rTie,
        r.output.map(_.withNullability(true)),
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public API: `AsOfJoin.join(left, right, "user_id", "t", "user_id",
  * "t", "event_id")` — column-name based; all five columns must be
  * LongType. */
object AsOfJoin {
  def join(
      left: DataFrame, right: DataFrame,
      leftBy: String, leftOn: String,
      rightBy: String, rightOn: String, rightTie: String): DataFrame = {
    val s = left.sparkSession
    AsOfJoinStrategy.install(s)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"as-of join: no column '$n' in ${p.output.map(_.name)}"))
    def long(a: Attribute): Attribute = {
      require(a.dataType == LongType,
        s"as-of join: column '${a.name}' must be LongType, was ${a.dataType}")
      a
    }
    val plan = AsOfJoinPlan(lPlan, rPlan,
      long(attr(lPlan, leftBy)), long(attr(lPlan, leftOn)),
      long(attr(rPlan, rightBy)), long(attr(rPlan, rightOn)),
      long(attr(rPlan, rightTie)))
    org.apache.spark.sql.graftinternal.Bridge.ofRows(s, plan)
  }

  /** Convenience: new Column over the joined frame. */
  def col(df: DataFrame, name: String): Column = df(name)
}
