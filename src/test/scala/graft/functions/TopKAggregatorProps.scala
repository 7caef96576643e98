package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** The bounded-state top-k must equal the global sort-and-take under ANY
  * partitioning and merge order — that is the claim that makes it safe
  * as a distributed partial aggregate. */
object TopKAggregatorProps extends Properties("functions.cheapest_k") {

  private val rows: Gen[List[(Double, Long)]] = Gen.listOf(for {
    v <- Gen.chooseNum(-1e6, 1e6)
    id <- Gen.chooseNum(0L, 1000L)
  } yield (v, id))

  property("any partitioning + merge order equals global sorted take-k") =
    forAll(rows, Gen.choose(1, 5), Gen.choose(0L, Long.MaxValue)) {
      (xs, k, seed) =>
        val agg = new CheapestK(k)
        val rnd = new scala.util.Random(seed)
        // random partitioning
        val parts = xs.grouped(math.max(1, rnd.nextInt(4) + 1)).toList
        // fold each partition with reduce, then merge in shuffled order
        val buffers = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = rnd.shuffle(buffers)
          .foldLeft(agg.zero)(agg.merge)
        Prop(agg.finish(merged) == xs.sorted.take(k))
    }

  property("duplicate values tie-break by id deterministically") =
    forAll(Gen.choose(1, 4)) { k =>
      val agg = new CheapestK(k)
      val xs = List((1.0, 9L), (1.0, 2L), (1.0, 5L), (0.5, 7L))
      val r = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      Prop(r == xs.sorted.take(k))
    }
}
