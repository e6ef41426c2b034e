package graft.udafs

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items summaries (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012) — the sketch
  * that FINDS the heavy hitters. The family division of labor:
  * HLL answers "how many distinct", CMS answers "how often is THIS
  * token" (a point query — the caller must already know the token),
  * Misra–Gries returns the candidate set itself with deterministic
  * bounds and no randomness at all:
  *
  *  - `est(t) ≤ true(t)` — counters only ever lose weight
  *  - `true(t) − est(t) ≤ N/(k+1)` — each of the ≤ N/(k+1) trims
  *    removes ≥ (k+1) units of total weight
  *  - every token with `true(t) > N/(k+1)` is present in the summary
  *
  * Both bounds survive merges unchanged (PODS 2012): merge = pointwise
  * counter sum, then subtract the (k+1)-th largest counter from all and
  * drop the non-positive — the same `trim` the insert path uses.
  *
  * At 100 TB the shape is the HLL/CMS one: `groupBy(day).agg(mgAgg)`
  * partial-aggregates map-side, so each task ships AT MOST k counters
  * regardless of vocabulary size — a global top-k candidate set over a
  * 10⁹-token vocabulary with no full sort and no token-keyed shuffle —
  * and the per-day k-entry maps persist small and re-aggregate through
  * [[FreqItems.mgMergeAgg]] without rescanning raw data. Exactness
  * regime: while a summary's map never exceeds k entries (vocabulary ≤
  * k), no trim ever fires and the counters are plain order-free sums —
  * bit-exact equal to the true counts, which is what the oracle gate
  * pins (the KLL below-capacity convention).
  */
object FreqItems {

  /** Subtract the (k+1)-th largest counter from all and drop the
    * non-positive — the single primitive both insert and merge use.
    * No-op while the map holds ≤ k entries. */
  private[graft] def trim(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      val d = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.collect { case (t, c) if c - d > 0L => t -> (c - d) }
    }

  /** Weighted Misra–Gries over `(token, n)` pairs. Input may be raw
    * occurrences (n = 1) or pre-counted `(token, count)` rows — counter
    * addition is associative, so both land the same summary bounds. */
  class MgAgg(k: Int) extends Aggregator[
      (String, Long), Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"summary size must be positive: $k")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], in: (String, Long)): Map[String, Long] =
      if (in == null || in._1 == null || in._2 <= 0L) b
      else trim(b.updated(in._1, b.getOrElse(in._1, 0L) + in._2), k)
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
      trim(small.foldLeft(big) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }, k)
    }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Merge a column of k-bounded summaries into one — the
    * `hll_union_agg` analog for frequent items. All inputs should share
    * k (a larger-k input merges soundly but the result only carries
    * this aggregator's k-bound guarantee). */
  class MgMergeAgg(k: Int) extends Aggregator[
      Map[String, Long], Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"summary size must be positive: $k")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], in: Map[String, Long]): Map[String, Long] =
      if (in == null) b
      else trim(in.foldLeft(b) { case (m, (t, c)) =>
        if (t == null || c <= 0L) m else m.updated(t, m.getOrElse(t, 0L) + c)
      }, k)
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      reduce(a, b)
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** `(token, n)` columns → `map<token, est>` summary of ≤ k entries. */
  def mgAgg(token: Column, n: Column, k: Int): Column =
    udaf(new MgAgg(k),
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .apply(token, n)

  /** Summary-map column → merged `map<token, est>` of ≤ k entries. */
  def mgMergeAgg(summary: Column, k: Int): Column =
    udaf(new MgMergeAgg(k),
      ExpressionEncoder[Map[String, Long]]())
      .apply(summary)
}
