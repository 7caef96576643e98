package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LocalRelation, LogicalPlan, Project, ResolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Binary search of a point into a static sorted set of disjoint
  * half-open intervals `[lowers(i), uppers(i))`; returns the interval
  * ordinal or NULL when no interval contains the point.
  *
  * This is the lookup kernel behind [[IntervalLookupJoinRule]]: the
  * reference tags every peak with its isolation window via an
  * IntervalTree probe (candia msproc.py:89-91, 164-170), i.e. an O(log W)
  * search per row — Spark's relational planning of the same predicate is
  * a broadcast nested loop, O(W) per row. This expression restores the
  * O(log W) probe and runs inside whole-stage codegen, so the scan never
  * leaves the fused loop.
  */
case class IntervalIndex(
    child: Expression,
    lowers: Array[Double],
    uppers: Array[Double])
  extends UnaryExpression {

  require(lowers.length == uppers.length && lowers.nonEmpty)

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_interval_index"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val x = v.asInstanceOf[Double]
    var lo = 0
    var hi = lowers.length - 1
    var ans = -1
    while (lo <= hi) {
      val m = (lo + hi) >>> 1
      if (lowers(m) <= x) { ans = m; lo = m + 1 } else hi = m - 1
    }
    if (ans >= 0 && x < uppers(ans)) java.lang.Integer.valueOf(ans) else null
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loArr = ctx.addReferenceObj("lowers", lowers, "double[]")
    val hiArr = ctx.addReferenceObj("uppers", uppers, "double[]")
    val childGen = child.genCode(ctx)
    val x = ctx.freshName("x")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val m = ctx.freshName("m")
    val ans = ctx.freshName("ans")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = -1;
        if (!${childGen.isNull}) {
          double $x = ${childGen.value};
          int $lo = 0;
          int $hi = $loArr.length - 1;
          int $ans = -1;
          while ($lo <= $hi) {
            int $m = ($lo + $hi) >>> 1;
            if ($loArr[$m] <= $x) { $ans = $m; $lo = $m + 1; }
            else { $hi = $m - 1; }
          }
          if ($ans >= 0 && $x < $hiArr[$ans]) {
            ${ev.isNull} = false;
            ${ev.value} = $ans;
          }
        }
      """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): IntervalIndex = copy(child = newChild)
}

/** Optimizer rule: rewrite a point-in-interval INNER join against a
  * small literal interval table into a binary-search projection.
  *
  * Matches `fact JOIN dim ON point >= dim.lo AND point < dim.hi` where
  * `dim` is a LocalRelation (optionally under a broadcast hint) whose
  * `[lo, hi)` intervals are pairwise disjoint — the isolation-window /
  * value-band shape (SURVEY §2.3; flagged as the optional-polish rule in
  * SURVEY §4.3). Disjointness makes the join ≤1-match per fact row, so
  * it is equivalent to: compute `idx = interval_index(point)`, drop rows
  * with no interval (inner-join semantics, also discards NULL points),
  * and fill the dim columns by indexing literal arrays.
  *
  * Why this matters at 100 TB: the relational form plans a
  * BroadcastNestedLoopJoin — every fact row is compared against every
  * interval (O(W) per row) in a separate non-codegen operator. The
  * rewrite is join-free: one codegen'd O(log W) probe per row fused into
  * the scan's whole-stage-codegen loop, no broadcast exchange, no join
  * operator at all. Results are bit-identical to the join (the oracle
  * states the join form).
  *
  * Registered via [[graft.functions.GraftExtensions]] for
  * `spark.sql.extensions` sessions and [[IntervalLookupJoinRule.install]]
  * for imperative ones.
  */
object IntervalLookupJoinRule extends Rule[LogicalPlan] {

  /** Bail out above this many intervals: the literal arrays live in the
    * plan (and every task's codegen references), so this stays a
    * small-dimension optimization — big interval sets belong to the
    * bucketed-equi-join path (`q_join_interval_overlap`). */
  private val MaxIntervals = 4096

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      rewrite(left, right, cond).getOrElse(j)
  }

  private def asLocal(p: LogicalPlan): Option[LocalRelation] = p match {
    case l: LocalRelation    => Some(l)
    case ResolvedHint(c, _)  => asLocal(c)
    case _                   => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x         => Seq(x)
  }

  private def rewrite(
      left: LogicalPlan,
      right: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val rel = asLocal(right).getOrElse(return None)
    if (rel.data.isEmpty || rel.data.length > MaxIntervals) return None

    def isPoint(e: Expression): Boolean =
      e.deterministic && e.dataType == DoubleType &&
        e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def dimAttr(e: Expression): Option[Attribute] = e match {
      case a: Attribute
        if right.outputSet.contains(a) && a.dataType == DoubleType => Some(a)
      case _ => None
    }
    // point >= lo  (either operand order)
    def asLower(e: Expression): Option[(Expression, Attribute)] = e match {
      case GreaterThanOrEqual(p, a) if isPoint(p) => dimAttr(a).map((p, _))
      case LessThanOrEqual(a, p) if isPoint(p)    => dimAttr(a).map((p, _))
      case _                                      => None
    }
    // point < hi  (either operand order)
    def asUpper(e: Expression): Option[(Expression, Attribute)] = e match {
      case LessThan(p, a) if isPoint(p)    => dimAttr(a).map((p, _))
      case GreaterThan(a, p) if isPoint(p) => dimAttr(a).map((p, _))
      case _                               => None
    }

    val cs = conjuncts(cond)
    if (cs.length != 2) return None
    val lowerM = cs.flatMap(asLower)
    val upperM = cs.flatMap(asUpper)
    if (lowerM.length != 1 || upperM.length != 1) return None
    val (point, loAttr) = lowerM.head
    val (point2, hiAttr) = upperM.head
    if (!point.semanticEquals(point2)) return None
    if (loAttr.exprId == hiAttr.exprId) return None

    val out = rel.output
    val loIdx = out.indexWhere(_.exprId == loAttr.exprId)
    val hiIdx = out.indexWhere(_.exprId == hiAttr.exprId)
    if (loIdx < 0 || hiIdx < 0) return None
    if (rel.data.exists(r => r.isNullAt(loIdx) || r.isNullAt(hiIdx)))
      return None

    val sorted = rel.data.sortBy(_.getDouble(loIdx))
    val lowers = sorted.map(_.getDouble(loIdx)).toArray
    val uppers = sorted.map(_.getDouble(hiIdx)).toArray
    // require non-empty, disjoint [lo, hi): the ≤1-match precondition.
    // NaN bounds fail `lo < hi` and bail too.
    var i = 0
    while (i < lowers.length) {
      if (!(lowers(i) < uppers(i))) return None
      if (i > 0 && uppers(i - 1) > lowers(i)) return None
      i += 1
    }

    val idxAlias = Alias(IntervalIndex(point, lowers, uppers),
      "__graft_interval_idx")()
    val idxRef = idxAlias.toAttribute
    val probed = Filter(IsNotNull(idxRef),
      Project(left.output :+ idxAlias, left))
    // dim columns become literal-array lookups, aliased to the ORIGINAL
    // exprIds so every parent reference keeps resolving
    val dimCols: Seq[NamedExpression] = out.zipWithIndex.map {
      case (a, ci) =>
        val vals = sorted.map(_.get(ci, a.dataType)).toArray[Any]
        val arr = Literal(new GenericArrayData(vals),
          ArrayType(a.dataType, vals.contains(null)))
        Alias(GetArrayItem(arr, idxRef), a.name)(exprId = a.exprId)
    }
    Some(Project(left.output ++ dimCols, probed))
  }
}
