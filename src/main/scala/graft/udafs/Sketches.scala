package graft.udafs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A10 — HyperLogLog sketch layer + F12 bucketing.
  *
  * The reference registers `hllCreate`/`hllCardinality` scalar functions and
  * HLL merge aggregates from the external spark-hyperloglog library
  * (reference: src/main/scala/com/mozilla/telemetry/utils/udfs.scala:6-27).
  * Spark ≥3.5 ships Apache DataSketches HLL natively — persistable,
  * mergeable sketch columns with codegen'd implementations — so the rebuild
  * uses those instead of a custom TypedImperativeAggregate:
  *
  *  - create+merge in one agg:   `hllSketch(c)`   (hll_sketch_agg)
  *  - merge stored sketches:     `hllMerge(c)`    (hll_union_agg)
  *  - sketch → cardinality:      `hllCardinality` (hll_sketch_estimate)
  *
  * At 100 TB this is the key pattern: per-partition/day sketch tables are
  * small and re-aggregable without rescanning raw data.
  */
object Sketches {
  /** Aggregate raw values into a binary HLL sketch. lgK 12 ⇒ ~1.6% stderr. */
  def hllSketch(c: Column, lgConfigK: Int = 12): Column =
    hll_sketch_agg(c, lit(lgConfigK))

  /** Merge a column of serialized sketches into one. */
  def hllMerge(c: Column): Column =
    hll_union_agg(c, lit(false))

  /** Condition-gated sketch union — the reference's
    * `FilteredHyperLogLogMerge` (registered at utils/udfs.scala:15): only
    * sketches from rows where `cond` holds join the union. `hll_union_agg`
    * ignores nulls, so gating with `when` keeps the whole aggregate
    * codegen'd — no separate filtered pre-pass over the sketch table. */
  def hllMergeFiltered(cond: Column, sk: Column): Column =
    hll_union_agg(when(cond, sk), lit(false))

  /** Estimated distinct count from a serialized sketch. */
  def hllCardinality(c: Column): Column = hll_sketch_estimate(c)

  /** Count-min sketch over the whitespace tokens of `textCol` — the
    * mergeable POINT-FREQUENCY sketch (Cormode & Muthukrishnan 2005),
    * complementing HLL (cardinalities) and approx_top_k (heavy hitters):
    * `estimateCount(w)` is never below the true count and exceeds it by
    * at most ε·N with probability 1−δ. Built distributed through the
    * public `DataFrameStatFunctions` API (one explode + one mergeable
    * aggregate, O(width·depth) state per task). At 100 TB the pattern is
    * the HLL one for frequencies: per-day sketches persist small and
    * `mergeInPlace` into corpus totals without rescanning raw data —
    * same (eps, confidence, seed) ⇒ merge is exact. */
  def tokenCms(docs: org.apache.spark.sql.DataFrame, textCol: String,
               eps: Double, confidence: Double,
               seed: Int): org.apache.spark.util.sketch.CountMinSketch =
    docs.select(explode(graft.text.TextOps.tokens(col(textCol))).as("__w"))
      .stat.countMinSketch("__w", eps, confidence, seed)

  /** F12 — `bucketed(value, splits)`: first split ≥ value, else max+1.
    * Reference: src/main/scala/com/mozilla/telemetry/utils/udfs.scala:17-19.
    * Expressed as a when-chain (codegen'd), not a UDF. */
  def bucketed(c: Column, splits: Seq[Double]): Column = {
    require(splits.nonEmpty, "bucketed needs at least one split")
    val sorted = splits.sorted
    val chain = sorted.foldRight(lit(sorted.max + 1)) { (split, rest) =>
      when(c <= split, lit(split)).otherwise(rest)
    }
    // a null value must stay null — every `c <= split` is null for it, so
    // the raw chain would fall through to the overflow bucket
    when(c.isNull, lit(null).cast("double")).otherwise(chain)
  }
}
