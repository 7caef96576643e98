package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: |a ∩ b| for two SORTED-ascending,
  * duplicate-free ARRAY<BIGINT> columns, as a fused two-pointer merge.
  *
  * The composable form — `size(array_intersect(a, b))` — is the hot
  * expression of the engine's two steepest scale kernels (the triangle
  * closure's per-edge adjacency intersection and PPJoin's candidate
  * verification), and it does strictly more work than the semantics
  * need: array_intersect builds a hash set of one side, probes every
  * element of the other, MATERIALIZES the intersection as a new array,
  * and then `size` reads only its length — per-row allocation and
  * hashing on a path executed once per oriented edge / candidate pair.
  * Both call sites guarantee sorted distinct inputs (adjacency lists
  * are `sort_array(collect_list(...))` over distinct neighbors; the
  * prefix store's `tids` are sorted distinct integer ids), so the
  * count is a single O(n+m) merge scan with ZERO allocation, emitted
  * inside whole-stage codegen.
  *
  * CONTRACT: both inputs sorted ascending and duplicate-free — under
  * it the result equals `size(array_intersect(a, b))` exactly
  * (`SortedIntersectCountSpec` proves the equivalence on random and
  * adversarial inputs), so the DuckDB oracles are unaffected. On
  * unsorted input the merge undercounts; callers own the invariant,
  * the same discipline as every other integer-exact kernel contract.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_ixcount"

  // The function is registered SESSION-WIDE (any SQL can call it), and
  // getLong over a 4-byte-element UnsafeArrayData returns garbage
  // rather than throwing — so unlike the engine-internal expressions,
  // wrong input types here must be an ANALYSIS error, not a silently
  // wrong count. (ExpectsInputTypes is unavailable — AbstractDataType
  // is private[sql] — so the check is spelled out.)
  // containsNull=true element types are rejected for the same reason:
  // getLong on a null slot reads whatever bits sit in the slot — a
  // silently wrong count on a LEGAL SQL input, the exact class the
  // type guard exists to kill. Engine call sites always pass
  // sort_array(collect_list(...)) arrays, whose element type is
  // non-null by construction; ad-hoc SQL over nullable arrays gets
  // the fix spelled out in the error instead of garbage.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def check(side: String, dt: DataType): Option[String] = dt match {
      case org.apache.spark.sql.types.ArrayType(LongType, false) => None
      case org.apache.spark.sql.types.ArrayType(LongType, true) => Some(
        s"$prettyName $side argument has nullable elements " +
          s"(${dt.catalogString}); a null slot would be counted as " +
          "garbage bits. Drop nulls first, e.g. filter(x, v -> v IS NOT " +
          "NULL), or build the array with collect_list/sort_array")
      case _ => Some(
        s"$prettyName expects ARRAY<BIGINT> arguments, $side is " +
          dt.catalogString)
    }
    check("left", left.dataType).orElse(check("right", right.dataType))
      .map(TypeCheckResult.TypeCheckFailure(_))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
