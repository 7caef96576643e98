package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
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
  * broadcast form — right side shipped through a broadcast exchange
  * and indexed per executor ([[AsOfJoinExec.buildIndex]]): grouped by
  * key, time-sorted, probed by binary search in O(log n) per left row
  * with the left side streaming in place (no shuffle of the probe
  * side, no per-row candidate explosion). At 100 TB with a
  * broadcastable right side
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

object AsOfJoinExec {
  /** Per-executor probe-index cache: the broadcast ships RAW build rows
    * (IdentityBroadcastMode — the exchange only accepts HashedRelation
    * or Array[InternalRow] from a mode's transform, so the index can't
    * be built inside it), and each executor builds the by-key →
    * time-sorted index ONCE per broadcast, not once per partition.
    * WeakHashMap keyed on the broadcast handle: entries die with the
    * broadcast, so a long session never accumulates stale indexes. */
  private val indexCache = new java.util.WeakHashMap[
    AnyRef, Map[Long, (Array[Long], Array[InternalRow])]]()

  private[plans] def buildIndex(
      bc: org.apache.spark.broadcast.Broadcast[Array[InternalRow]],
      byIdx: Int, onIdx: Int, tieIdx: Int, maxBuildRows: Long)
      : Map[Long, (Array[Long], Array[InternalRow])] =
    indexCache.synchronized {
      val cached = indexCache.get(bc)
      if (cached != null) cached
      else {
        val rows = bc.value
        // a second, lower ceiling under Spark's own broadcast limits,
        // kept for the loud error pointing at the shuffle-friendly
        // alternative (an as-of build is usually reference data; a
        // huge one is a wrong-operator smell well before it is a
        // memory problem)
        if (rows.length > maxBuildRows) throw new IllegalStateException(
          s"as-of join: build (right) side exceeds " +
            s"spark.graft.asof.maxBuildRows=$maxBuildRows rows. For a " +
            "large right side use the aggregate as-of formulation " +
            "(min-of-struct argmin, see q_join_asof) or raise the ceiling.")
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, InternalRow)]
        rows.foreach { r =>
          // null key/time rows can never be an as-of match — drop at
          // build (broadcast rows are materialized copies, safe to keep)
          if (!r.isNullAt(byIdx) && !r.isNullAt(onIdx))
            buf += ((r.getLong(byIdx), r.getLong(onIdx),
              if (r.isNullAt(tieIdx)) Long.MinValue else r.getLong(tieIdx),
              r))
        }
        val built = buf.groupBy(_._1)
          .map { case (k, rs) =>
            val sorted = rs.sortBy(x => (x._2, x._3))
            k -> ((sorted.map(_._2).toArray, sorted.map(_._4).toArray))
          }
        indexCache.put(bc, built)
        built
      }
    }
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

  // the probe streams in place, so the left child's sort order survives —
  // declaring it lets the planner elide a downstream re-sort
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  private def buildOrdinal(a: Attribute): Int = {
    val i = right.output.indexWhere(_.exprId == a.exprId)
    require(i >= 0,
      s"as-of join: '${a.name}' not in build-side output ${right.output}")
    i
  }

  /** The build side is a BROADCAST child: EnsureRequirements plants a
    * BroadcastExchangeExec, so this operator never collects rows to the
    * driver itself — the build runs under Spark's broadcast thresholds
    * and memory accounting, and the probe index is built per executor
    * from the broadcast rows ([[AsOfJoinExec.buildIndex]]). */
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numBuildRows" -> SQLMetrics.createMetric(sparkContext,
      "number of broadcast build rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numBuildRows = longMetric("numBuildRows")
    val bc = right.executeBroadcast[Array[InternalRow]]()
    val byIdx = buildOrdinal(rightBy)
    val onIdx = buildOrdinal(rightOn)
    val tieIdx = buildOrdinal(rightTie)
    val maxBuildRows = conf
      .getConfString("spark.graft.asof.maxBuildRows", "5000000").toLong
    val lByB = BindReferences.bindReference(leftBy: Expression, left.output)
    val lOnB = BindReferences.bindReference(leftOn: Expression, left.output)
    val outAttrs = output
    val nRight = nullableRightOutput.length
    left.execute().mapPartitionsWithIndex({ (pidx, it) =>
      val groups =
        AsOfJoinExec.buildIndex(bc, byIdx, onIdx, tieIdx, maxBuildRows)
      if (pidx == 0) // once, not per partition
        numBuildRows.add(groups.valuesIterator.map(_._1.length.toLong).sum)
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
