package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.DoubleType

/** Physical point-in-interval join against a small DATA-DERIVED interval
  * table — the execution tier below [[IntervalLookupJoinRule]].
  *
  * The logical rule covers literal (LocalRelation) interval tables only:
  * its rewrite bakes the bounds into the plan as arrays, which is
  * impossible when the intervals are computed from data (the reference
  * derives its isolation windows from the scans themselves —
  * msproc.py:89-91 builds the IntervalTree from parsed window bounds, and
  * the engine's adjusted-window table is an aggregate, not a literal).
  * For that shape Spark plans a BroadcastNestedLoopJoin: every fact row
  * compares against every interval, O(W) per row, in a non-codegen
  * operator.
  *
  * This operator keeps the relational contract (INNER join, arbitrary —
  * including overlapping — intervals, multi-match, exact null semantics)
  * but probes in O(log W + matches) per row: the dim side is collected
  * once (gated to broadcast-sized inputs by the strategy), sorted by
  * lower bound with a prefix-max of upper bounds, and each fact row
  * binary-searches to the last candidate and walks back only while the
  * prefix-max proves further matches are possible — the classic sorted
  * interval-stabbing structure, built once per query and shipped as a
  * broadcast.
  *
  * Results are bit-identical to the join it replaces:
  * [[IntervalJoinStrategySpec]] checks equivalence against Spark's own
  * default plan on overlapping/duplicate/null/NaN inputs, and the
  * `q_join_interval_stats_bands` oracle states the plain join in DuckDB.
  */
case class IntervalJoinExec(
    point: Expression,
    lo: Attribute,
    hi: Attribute,
    lowerInclusive: Boolean,
    upperInclusive: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // probe side streams in place — partitioning is the fact side's
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numIntervals" -> SQLMetrics.createMetric(sparkContext,
      "number of broadcast intervals"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val loB = BindReferences.bindReference(lo: Expression, right.output)
    val hiB = BindReferences.bindReference(hi: Expression, right.output)
    // a NULL bound can never satisfy the join predicate — drop at build
    val dim = right.executeCollect().flatMap { r =>
      val lv = loB.eval(r)
      val hv = hiB.eval(r)
      if (lv == null || hv == null) None
      else Some((lv.asInstanceOf[Double], hv.asInstanceOf[Double], r.copy()))
    }
    // Scala's TotalOrdering sorts NaN last — consistent with cmp's
    // NaN-greatest, so the lo array stays binary-searchable under cmp
    val sorted = dim.sortBy(_._1)
    val lows = sorted.map(_._1)
    val highs = sorted.map(_._2)
    val rows: Array[InternalRow] = sorted.map(_._3)
    val prefixMaxHi = new Array[Double](highs.length)
    var acc = Double.NegativeInfinity
    var i = 0
    while (i < highs.length) {
      // cmp-max: a NaN upper bound IS the maximum (Spark's total order),
      // so it must dominate the prefix — a primitive `>` would skip it
      // and the walk would stop before rows a NaN-bounded interval
      // matches under Spark semantics
      if (IntervalJoinExec.cmp(highs(i), acc) > 0) acc = highs(i)
      prefixMaxHi(i) = acc
      i += 1
    }
    longMetric("numIntervals").add(lows.length)
    val bc = sparkContext.broadcast((lows, highs, prefixMaxHi, rows))
    val lInc = lowerInclusive
    val uInc = upperInclusive
    val boundPoint = BindReferences.bindReference(point, left.output)
    val outAttrs = output
    left.execute().mapPartitions({ it =>
      val (ls, hs, pm, rs) = bc.value
      val joiner = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      it.flatMap { lrow =>
        val v = boundPoint.eval(lrow)
        if (v == null || ls.isEmpty) Iterator.empty
        else {
          // all compares go through cmp = Spark's SQL double order
          // (NaN greatest, NaN == NaN) — a raw Java compare silently
          // loses the rows where either side is NaN, which DO match
          // under Spark's BroadcastNestedLoopJoin (e.g. x < NaN is TRUE
          // for finite x)
          val x = v.asInstanceOf[Double]
          var loI = 0
          var hiI = ls.length - 1
          var ub = -1
          while (loI <= hiI) {
            val mid = (loI + hiI) >>> 1
            val c = IntervalJoinExec.cmp(ls(mid), x)
            val ok = if (lInc) c <= 0 else c < 0
            if (ok) { ub = mid; loI = mid + 1 } else hiI = mid - 1
          }
          if (ub < 0) Iterator.empty
          else new Iterator[InternalRow] {
            private var j = ub
            private var pending = -1
            private def upperOk(k: Int): Boolean = {
              val c = IntervalJoinExec.cmp(x, hs(k))
              if (uInc) c <= 0 else c < 0
            }
            // prefix-max proof that some k' <= k can still match
            private def reachable(k: Int): Boolean = {
              val c = IntervalJoinExec.cmp(pm(k), x)
              if (uInc) c >= 0 else c > 0
            }
            private def advance(): Unit = {
              pending = -1
              while (j >= 0 && reachable(j)) {
                val k = j
                j -= 1
                if (upperOk(k)) { pending = k; return }
              }
              j = -1
            }
            advance()
            override def hasNext: Boolean = pending >= 0
            override def next(): InternalRow = {
              val r = proj(joiner(lrow, rs(pending)))
              numOutputRows += 1
              advance()
              r
            }
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinExec {
  /** Spark SQL's double comparison (SQLOrderingUtil.compareDoubles
    * semantics): NaN is greater than every value and equal to itself,
    * -0.0 == 0.0. The operator replaces a join whose codegen compares
    * through this order — matching it exactly is what makes the two
    * plans bit-identical on NaN bounds and NaN points. */
  private[plans] def cmp(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else if (a == b) 0
    else if (java.lang.Double.isNaN(a)) { if (java.lang.Double.isNaN(b)) 0 else 1 }
    else -1
}

/** Planner strategy: route `fact JOIN dim ON point {>,>=} dim.lo AND
  * point {<,<=} dim.hi` through [[IntervalJoinExec]] when the dim side is
  * explicitly broadcast-hinted or stats-small. Opt-in via
  * [[IntervalJoinStrategy.install]] or `GraftExtensions`
  * (injectPlannerStrategy); extra strategies run before the built-ins, so
  * matching joins skip the BroadcastNestedLoopJoin the default planner
  * would choose. Literal dims are normally consumed upstream by
  * [[IntervalLookupJoinRule]] (join-free codegen probe — strictly better
  * when it applies); this strategy is the general-case tier below it.
  */
object IntervalJoinStrategy extends SparkStrategy {

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(this))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(cond), hint) if broadcastable(right, hint.rightHint) =>
      extract(left, right, cond) match {
        case Some((p, loA, hiA, lInc, uInc)) =>
          IntervalJoinExec(p, loA, hiA, lInc, uInc,
            planLater(left), planLater(right)) :: Nil
        case None => Nil
      }
    case _ => Nil
  }

  private def broadcastable(
      right: LogicalPlan,
      rightHint: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo])
      : Boolean =
    rightHint.flatMap(_.strategy).contains(BROADCAST) || {
      val sz = right.stats.sizeInBytes
      sz >= 0 && sz <= org.apache.spark.sql.internal.SQLConf.get
        .autoBroadcastJoinThreshold
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x         => Seq(x)
  }

  /** Returns (point, loAttr, hiAttr, lowerInclusive, upperInclusive). */
  private def extract(
      left: LogicalPlan,
      right: LogicalPlan,
      cond: Expression)
      : Option[(Expression, Attribute, Attribute, Boolean, Boolean)] = {
    def isPoint(e: Expression): Boolean =
      e.deterministic && e.dataType == DoubleType &&
        e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def dimAttr(e: Expression): Option[Attribute] = e match {
      case a: Attribute
        if right.outputSet.contains(a) && a.dataType == DoubleType => Some(a)
      case _ => None
    }
    // lower bound: point >= lo / lo <= point (inclusive), point > lo /
    // lo < point (strict) — (point, attr, inclusive)
    def asLower(e: Expression): Option[(Expression, Attribute, Boolean)] =
      e match {
        case GreaterThanOrEqual(p, a) if isPoint(p) =>
          dimAttr(a).map((p, _, true))
        case LessThanOrEqual(a, p) if isPoint(p) =>
          dimAttr(a).map((p, _, true))
        case GreaterThan(p, a) if isPoint(p) => dimAttr(a).map((p, _, false))
        case LessThan(a, p) if isPoint(p)    => dimAttr(a).map((p, _, false))
        case _                               => None
      }
    // upper bound: point < hi / hi > point (strict), point <= hi /
    // hi >= point (inclusive)
    def asUpper(e: Expression): Option[(Expression, Attribute, Boolean)] =
      e match {
        case LessThan(p, a) if isPoint(p)    => dimAttr(a).map((p, _, false))
        case GreaterThan(a, p) if isPoint(p) => dimAttr(a).map((p, _, false))
        case LessThanOrEqual(p, a) if isPoint(p) =>
          dimAttr(a).map((p, _, true))
        case GreaterThanOrEqual(a, p) if isPoint(p) =>
          dimAttr(a).map((p, _, true))
        case _ => None
      }
    val cs = conjuncts(cond)
    if (cs.length != 2) return None
    val lowers = cs.flatMap(asLower)
    val uppers = cs.flatMap(asUpper)
    // a conjunct can only read as one role (the dim attr fixes the side),
    // so 1+1 means the two conjuncts split cleanly into lower and upper
    if (lowers.length != 1 || uppers.length != 1) return None
    val (p1, loA, lInc) = lowers.head
    val (p2, hiA, uInc) = uppers.head
    if (!p1.semanticEquals(p2)) return None
    if (loA.exprId == hiA.exprId) return None
    Some((p1, loA, hiA, lInc, uInc))
  }
}
