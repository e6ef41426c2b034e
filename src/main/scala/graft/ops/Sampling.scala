package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines: exact
  * per-stratum top-n and weighted corpus mixing.
  *
  * Both operators key every decision off a cryptographic hash of the row's
  * id — not `rand()` — so results are reproducible run-to-run, partition-
  * layout-independent, and verifiable against any engine that computes the
  * same md5 hex digest (which is all of them). Reproducible sampling is a
  * hard requirement for training-data work: a resumed or re-run pipeline
  * must emit the identical corpus.
  *
  * Scale notes:
  *  - `stratifiedSample` is one shuffle (hash partition by stratum) + a
  *    per-group sort bounded by the window; with n ≪ group size the
  *    dominant cost is the sort, so for tiny n over huge groups prefer
  *    rank-free pre-filtering (e.g. `hashRatio < p` with p chosen from
  *    group counts) before ranking.
  *  - `weightedMixture` is shuffle-FREE: a per-row hash threshold filter
  *    per source, then a union — every source scans once, filters push
  *    down nothing but also cost nothing beyond the md5.
  */
object Sampling {

  /** Uniform-in-[0,1) deterministic score for a row id: the first 8 hex
    * digits of md5(id-as-string), compared lexicographically. Hex strings
    * compare like the numbers they encode (fixed width, 0-9 < a-f in both
    * Spark's binary string ordering and ANSI SQL collation). */
  def hashScore(id: Column): Column = substring(md5(id.cast("string")), 1, 8)

  /** Threshold hex literal for probability p: rows with
    * `hashScore < hexThreshold(p)` are kept with probability ~p
    * (exact to 1/2^32). */
  def hexThreshold(p: Double): String = {
    require(p >= 0.0 && p <= 1.0, s"probability out of range: $p")
    f"${math.round(p * 4294967296.0).min(4294967295L)}%08x"
  }

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen by hash order of `idCol` — a deterministic simple random
    * sample per group. Ties broken by id so the result is total-ordered
    * even under (astronomically unlikely) hash-prefix collisions. */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], n: Int,
                       idCol: String): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(hashScore(col(idCol)), col(idCol))
    df.withColumn("rn", row_number().over(w)).where(col("rn") <= n).drop("rn")
  }

  /** Weighted mixture of corpora: each source is kept with its own
    * probability, then all survivors union — the standard way to re-weight
    * heterogeneous training sources (e.g. upsample curated text against a
    * web crawl) without a shuffle. Weights > 1 are not materialized as
    * duplication here (dedup-safety: downstream exact-dedupe would fold
    * them); callers wanting true upsampling should add an epoch column. */
  def weightedMixture(sources: Seq[(DataFrame, Double)], idCol: String): DataFrame =
    sources.map { case (df, p) =>
      if (p >= 1.0) df
      else df.where(hashScore(col(idCol)) < lit(hexThreshold(p)))
    }.reduce(_ unionAll _)
}
