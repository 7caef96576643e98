package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic contract of the binary-search probe: for ANY disjoint
  * sorted interval set, IntervalIndex.eval must agree with the obvious
  * linear scan — the same containment the relational join predicate
  * states. */
object IntervalIndexProps extends Properties("plans.interval_index") {

  /** Random disjoint half-open intervals: cumulative positive gaps and
    * widths guarantee lo(i) < hi(i) <= lo(i+1). */
  private val intervalsGen: Gen[(Array[Double], Array[Double])] = for {
    n <- Gen.choose(1, 40)
    gaps <- Gen.listOfN(n, Gen.choose(0.0, 10.0))
    widths <- Gen.listOfN(n, Gen.choose(0.1, 10.0))
  } yield {
    val lowers = new Array[Double](n)
    val uppers = new Array[Double](n)
    var edge = -100.0
    var i = 0
    while (i < n) {
      lowers(i) = edge + gaps(i)
      uppers(i) = lowers(i) + widths(i)
      edge = uppers(i)
      i += 1
    }
    (lowers, uppers)
  }

  property("eval agrees with the linear containment scan") =
    forAll(intervalsGen, Gen.choose(-120.0, 600.0)) { case ((lo, hi), x) =>
      val got = IntervalIndex(Literal(x), lo, hi).eval(null)
      val want = lo.indices.find(i => lo(i) <= x && x < hi(i))
      Prop(got == want.map(Integer.valueOf).orNull)
    }

  property("every interval's own bounds probe correctly") =
    forAll(intervalsGen) { case (lo, hi) =>
      Prop(lo.indices.forall { i =>
        IntervalIndex(Literal(lo(i)), lo, hi).eval(null) ==
          Integer.valueOf(i) &&
        IntervalIndex(Literal(hi(i) - 1e-9), lo, hi).eval(null) ==
          Integer.valueOf(i)
      })
    }

  property("null input probes to null") =
    forAll(intervalsGen) { case (lo, hi) =>
      Prop(IntervalIndex(
        Literal.create(null, org.apache.spark.sql.types.DoubleType),
        lo, hi).eval(null) == null)
    }
}
