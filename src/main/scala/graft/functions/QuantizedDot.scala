package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: cosine over int8-quantized vectors.
  *
  * `graft_qcos(a, b)` takes two ARRAY<BIGINT> quantized vectors and
  * returns qdot / (√Σa² · √Σb²) in one fused loop. All accumulation is
  * 64-bit integer arithmetic — order-independent, so the value is
  * bit-identical to any other evaluation order (the cross-engine parity
  * property the quantized ANN pack relies on) — and the expression
  * stays inside whole-stage codegen, unlike a typed mapPartitions
  * kernel which forces a serialization boundary around the join.
  */
case class QuantizedCos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_qcos"

  // an ARRAY<DOUBLE> passed by mistake would otherwise reinterpret raw
  // double bits as longs and return plausible-looking garbage — reject
  // anything but ARRAY<BIGINT> at analysis time
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "graft_qcos requires ARRAY<BIGINT> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var nx = 0L
    var ny = 0L
    var i = 0
    while (i < n) {
      val xv = x.getLong(i)
      val yv = y.getLong(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    dot.toDouble / (math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L; long $nx = 0L; long $ny = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = (double) $dot /
         |  (java.lang.Math.sqrt((double) $nx) * java.lang.Math.sqrt((double) $ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCos =
    copy(left = newLeft, right = newRight)
}
