package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state per-group top-k: keep the k smallest (value, id) pairs.
  *
  * The relational form — `row_number() OVER (PARTITION BY g ORDER BY v)`
  * then `rn <= k` — SORTS every partition in full: at 100 TB that is a
  * shuffle of the whole fact table followed by an O(n log n) sort per
  * group just to discard all but k rows. This Aggregator is the
  * general-group form of TakeOrderedAndProject: O(k) state per group,
  * partial aggregation map-side, so the exchange carries at most
  * k × tasks rows per group and nothing is ever globally sorted.
  *
  * Determinism: ordering is the total order (value, id) — merges are
  * associative and commutative over it, so the result is independent of
  * partitioning and merge order (the window form with the same
  * tie-break is the oracle).
  *
  * @param k number of smallest pairs to keep (small constant: the
  *          buffer lives in the aggregation hash map per group)
  */
class CheapestK(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  require(k > 0)

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sorted.take(k) // tuple order = (value, id): the deterministic total order

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(
      b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    // cheap guard: only re-sort when the candidate can enter the top-k
    if (b.length == k && Ordering[(Double, Long)].lteq(b.last, a)) b
    else trim(b :+ a)

  override def merge(
      b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(b1 ++ b2)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r.sorted

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
