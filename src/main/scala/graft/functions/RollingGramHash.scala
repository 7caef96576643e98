package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: `graft_roll64(ws, L)` — the Karp-Rabin
  * rolling 64-bit hash of every L-token window of an ARRAY<STRING>
  * column, returned as ARRAY<BIGINT> (n − L + 1 entries; empty when
  * n < L).
  *
  * This is the Θ(1)-per-position gram SCREEN the ExactSubstr dedup
  * kernel (Dedup.scala, `q_dedup_exact_substr`) calls for: the md5
  * form it replaces re-serialized and digested the full L-token window
  * at every position — Θ(L·n) bytes hashed per document at L = 50 —
  * where the rolling form hashes each token ONCE (xxh64 over its
  * UTF-8 bytes) and rolls the window polynomial in two multiplies and
  * an add per position:
  *   h(i+1) = (h(i) − x(i)·B^(L−1))·B + x(i+L)  (mod 2^64,
  * the JVM's natural wrapping arithmetic). Equal windows always hash
  * equal (token-exact), so the duplicate screen over these hashes is a
  * SUPERSET of the true duplicated-window set. Unequal windows collide
  * heuristically at ~2^-64 on NON-ADVERSARIAL data — a polynomial hash
  * mod 2^64 is not a universal family (structured token-hash
  * differences, e.g. differences divisible by high powers of 2,
  * collide far more often than a uniform bound suggests), so callers
  * must ALWAYS re-screen where exactness matters, never treat the
  * rolled hash as a fingerprint. The oracled ExactSubstr query does
  * exactly that: it re-screens surviving candidates with md5 over the
  * space-joined window — sound THERE because its tokens come from
  * split-on-space with empties filtered (separator-free, null-free),
  * the precondition under which join-text equality IS token equality —
  * restoring bit-exact agreement with the DuckDB oracle while paying
  * Θ(L) only on candidates instead of every position. The 8-byte hash
  * is also a 4× narrower exchange key than the 32-char md5 hex digest
  * the screen used to shuffle.
  *
  * The per-row kernel lives in [[RollingGramHash.roll]] (a static
  * helper both eval and the generated code call — one implementation,
  * no interpreted/codegen drift) and the expression stays inside
  * whole-stage codegen.
  */
case class RollingGramHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_roll64"

  // Session-wide SQL surface ⇒ wrong SHAPES must be ANALYSIS errors
  // (the graft_ixcount discipline): a non-literal L would make the
  // window width row-varying — not a meaningful call. Nullable
  // ELEMENTS are accepted, unlike graft_ixcount: there a null slot
  // reads silently-wrong bits; here it hashes to a fixed sentinel
  // (deterministic, null == null window equality preserved), and
  // rejecting nullable schemas would bar every encoder-built
  // ARRAY<STRING> (toDF arrays are containsNull=true regardless of
  // content).
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    left.dataType match {
      case ArrayType(StringType, _) =>
        right.dataType match {
          case IntegerType if right.foldable =>
            val l = right.eval()
            if (l == null || l.asInstanceOf[Int] < 2)
              TypeCheckResult.TypeCheckFailure(
                s"$prettyName window length must be a literal >= 2, got $l")
            else TypeCheckResult.TypeCheckSuccess
          case IntegerType => TypeCheckResult.TypeCheckFailure(
            s"$prettyName window length must be a literal (foldable), " +
              "got a non-foldable expression")
          case dt => TypeCheckResult.TypeCheckFailure(
            s"$prettyName window length must be INT, got ${dt.catalogString}")
        }
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<STRING> tokens, got ${dt.catalogString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    RollingGramHash.roll(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.RollingGramHash.roll($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingGramHash =
    copy(left = newLeft, right = newRight)
}

object RollingGramHash {
  /** Odd 64-bit polynomial base (the FNV-1a prime); odd ⇒ invertible
    * mod 2^64, so windows don't systematically cancel. */
  final val Base = 0x100000001b3L
  private final val Seed = 42L

  /** Fixed sentinel hash for a null token slot — deterministic, so
    * null-containing windows still compare null == null. */
  final val NullToken = 0x9e3779b97f4a7c15L

  private val Empty = new GenericArrayData(Array.empty[Long])

  /** The per-document kernel: token hashes once, then the rolling
    * recurrence — Θ(n) for n tokens regardless of L. */
  def roll(arr: ArrayData, l: Int): ArrayData = {
    val n = arr.numElements()
    if (n < l) return Empty
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) {
      xs(i) =
        if (arr.isNullAt(i)) NullToken
        else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      i += 1
    }
    var blm1 = 1L // B^(L-1), for evicting the leftmost token
    i = 0
    while (i < l - 1) { blm1 *= Base; i += 1 }
    val out = new Array[Long](n - l + 1)
    var h = 0L
    i = 0
    while (i < l) { h = h * Base + xs(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= n - l) {
      h = (h - xs(i - 1) * blm1) * Base + xs(i + l - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
