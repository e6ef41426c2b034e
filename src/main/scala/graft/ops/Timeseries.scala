package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key time-series smoothing + anomaly flags — the metrics-monitor
  * capability of the OLAP engines (exponential moving averages over
  * per-bucket counts, spike verdicts against the smoothed history).
  * Extension beyond the reference (its event analytics stop at per-day
  * counts).
  *
  * The smoother is an INTEGER half-life fold: `E₀ = n₀,
  * Eᵢ = (Eᵢ₋₁ + nᵢ) div 2` — α = ½ EWMA in exact longs, so the series
  * replays bit-for-bit on any engine (a double EWMA would couple the
  * gate to multiplication order). The fold runs inside one aggregate
  * per key via the `aggregate` higher-order function over the sorted
  * per-key series — NO window functions, no per-row shuffles: state per
  * task is the key's bucket series (time-range-bounded — days, not
  * events; a year of daily buckets is 365 structs), the same
  * collect-and-fold discipline as the DSIR weight fold. Gaps are
  * OBSERVED-ONLY (absent buckets do not contribute zeros — the SQL
  * replay does the same); zero-fill composes upstream via a `sequence`
  * fan-out if absence-as-zero semantics are wanted.
  */
object Timeseries {

  /** Per-(key, bucket) counts → the smoothed series with spike flags:
    * `(key, bucket, n, ewma_prev, spike)` where `ewma_prev` is the
    * integer EWMA of STRICTLY EARLIER buckets (null for each key's
    * first bucket — no history, no verdict) and
    * `spike = n > spikeFactor · ewma_prev`. Judging against the prior
    * smoothed level (not one including the current bucket) is what
    * makes a genuine spike flaggable at all — folding the spike into
    * its own baseline would mask it. */
  def ewmaAnomalies(counts: DataFrame, keyCol: String, bucketCol: String,
                    nCol: String, spikeFactor: Long = 3L): DataFrame = {
    require(spikeFactor >= 1L, s"spikeFactor must be >= 1: $spikeFactor")
    val series = counts.groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(
        col(bucketCol).cast("long").as("bucket"),
        col(nCol).cast("long").as("n")))).as("__arr"))
    // one pass over the sorted series: carry the running EWMA, emit each
    // element with the PRIOR level attached
    val folded = series.withColumn("__out", expr(
      """aggregate(
           __arr,
           struct(cast(null as bigint) as e,
                  cast(array() as array<struct<bucket: bigint, n: bigint,
                                               ewma_prev: bigint>>) as out),
           (acc, x) -> struct(
             if(acc.e is null, x.n, (acc.e + x.n) div 2) as e,
             concat(acc.out,
               array(struct(x.bucket as bucket, x.n as n,
                            acc.e as ewma_prev))) as out),
           acc -> acc.out)"""))
    folded.select(col(keyCol), explode(col("__out")).as("__e"))
      .select(col(keyCol), col("__e.bucket").as("bucket"),
        col("__e.n").as("n"), col("__e.ewma_prev").as("ewma_prev"),
        (col("__e.n") > lit(spikeFactor) * col("__e.ewma_prev"))
          .as("spike"))
  }

  /** Events → per-(key, epoch-bucket) counts — the standard front half
    * (integer `div` bucketing; nano epochs exceed the double mantissa). */
  def bucketCounts(events: DataFrame, keyCol: String, tsCol: String,
                   bucketNanos: Long): DataFrame =
    events.select(col(keyCol), expr(s"`$tsCol` div ${bucketNanos}L").as("bucket"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Rolling-window quantiles over mergeable KLL sketches — the
    * "rolling p95 latency" metrics shape at any event volume: ONE pass
    * builds a per-bucket KLL sketch (the persistable daily artifact,
    * mergeable without raw rescans — the HLL rolling-actives
    * discipline applied to QUANTILES), the `sequence` fan-out ships one
    * sketch row per (bucket, window end), and each window's estimate
    * comes from `kll_merge_agg` + `get_quantile`. Task state is
    * O(k) per sketch regardless of volume. Returns
    * `(bucket, quantile_est)` for every window end up to the newest
    * bucket (the rollingActive clamp).
    *
    * KLL compaction is randomized, so past ~k values per window the
    * ESTIMATE is not run-deterministic — but its normalized RANK error
    * is bounded (~1.65 % at k = 200, 99 % conf.). Gates therefore pin
    * the exact order-statistic half and a rank-band verdict (the
    * q142/q63 bounded-anchor pattern), never the raw estimate. */
  def rollingQuantileSketch(events: DataFrame, valueCol: String,
                            tsCol: String, bucketNanos: Long,
                            windowBuckets: Int, q: Double,
                            kllK: Int = 200): DataFrame = {
    require(windowBuckets >= 1, "window must span at least one bucket")
    require(q > 0.0 && q < 1.0, s"quantile must be in (0, 1): $q")
    val perBucket = events
      .select(col(valueCol).cast("double").as("__v"),
        expr(s"`$tsCol` div ${bucketNanos}L").as("__b"))
      .groupBy(col("__b"))
      .agg(kll_sketch_agg_double(col("__v"), lit(kllK)).as("__sk"))
    val newest = perBucket.agg(max(col("__b")).as("__mb"))
    perBucket.crossJoin(broadcast(newest))
      .select(col("__sk"), explode(sequence(col("__b"),
        least(col("__b") + lit(windowBuckets - 1L), col("__mb"))))
        .as("bucket"))
      .groupBy(col("bucket"))
      .agg(kll_sketch_get_quantile_double(
        kll_merge_agg_double(col("__sk"), lit(kllK)), lit(q))
        .as("quantile_est"))
  }
}
