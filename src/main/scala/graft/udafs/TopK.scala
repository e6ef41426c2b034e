package graft.udafs

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-K — the window-free answer to "K smallest ids
  * per key" that stays SKEW-PROOF at any group size: a `row_number`
  * window drags a hot group's every row into one task (AQE splits
  * skewed joins, not windows), and `collect_list`+slice buffers the
  * whole group; this aggregator's state is capped at K values per
  * partial, merges trim to K, and partial aggregation combines
  * map-side — a 10⁸-row group costs each task O(K) memory and the
  * final reduce sees only per-partition K-prefixes. Per-row insert is
  * O(K) (binary-search + copy of a tiny vector): sized for the
  * cap-the-fan-out use (K ≲ a few hundred), not for top-million. */
object TopK {

  class SmallestK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k >= 1, s"k must be positive: $k")
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], in: Long): Seq[Long] =
      if (b.size >= k && in >= b.last) b
      else {
        val i = b.indexWhere(_ > in) match { case -1 => b.size; case x => x }
        val v = (b.take(i) :+ in) ++ b.drop(i)
        if (v.size > k) v.take(k) else v
      }
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(reduce)
    def finish(b: Seq[Long]): Seq[Long] = b
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** K smallest values of `c` per group, as a sorted array. */
  def smallestK(c: Column, k: Int): Column =
    udaf(new SmallestK(k), ExpressionEncoder[Long]()).apply(c)
}
