package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming forms of the batch views (SURVEY.md §2.9).
  *
  * The reference has NO streaming — its incremental model is per-day batch
  * overwrite driven by a date loop. These are the Spark-native streaming
  * equivalents of its two incremental patterns, offered as the
  * modernization path:
  *  - day-partition re-run → file-source stream + `Trigger.AvailableNow`
  *    (idempotent catch-up runs, exactly the batch loop's semantics);
  *  - dedupe-against-history (S6+J1+A1) → `dropDuplicates` over the key
  *    with a watermark bounding state (the reference instead re-reads all
  *    prior output every day — unbounded at 100 TB; watermarked state is
  *    the scale-correct form).
  */
object StreamingViews {

  /** File-source stream over a directory of parquet drops. */
  def fileStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Windowed per-key counts with late-data watermark. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     window_ : String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming incremental dedupe: first occurrence per key wins; state
    * bounded by the watermark horizon. */
  def streamingDedupe(events: DataFrame, tsCol: String, keys: Seq[String],
                      watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)

  /** Streaming dedupe against a STATIC history corpus: drop stream rows
    * whose key already exists in `history` (a stream-static left-anti
    * join — stateless, re-planned per micro-batch, so a small history
    * broadcasts and a huge one sort-merges), then first-occurrence dedupe
    * within the stream bounded by the watermark. The streaming twin of
    * the batch incremental-ingest exact stage
    * ([[graft.text.Corpus.cleanIncremental]]'s fingerprint anti-join):
    * history is the already-deduped output of prior days; the stream is
    * today's arrivals. */
  def streamingDedupeAgainstHistory(events: DataFrame, history: DataFrame,
                                    tsCol: String, keys: Seq[String],
                                    watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .join(history.select(keys.map(org.apache.spark.sql.functions.col): _*).distinct(),
        keys, "left_anti")
      .dropDuplicates(keys :+ tsCol)

  /** [[streamingDedupeAgainstHistory]] with the history compressed into a
    * Bloom filter (built once with `Dedup.keyBloom(history, keys, n)` and
    * shipped as bytes): the membership test becomes a stateless codegen
    * PREDICATE, so no stream-static join and no per-micro-batch history
    * scan at all — the stream's only state is the watermark-bounded
    * in-stream dedupe. Exactly the batch `bloomAntiJoin(confirm = false)`
    * trade: never keeps a history duplicate (no false negatives), drops
    * ~fpp of genuinely-new rows. The right shape when history is too big
    * to rescan every few seconds. */
  def streamingDedupeBloom(events: DataFrame, historyBloom: Array[Byte],
                           tsCol: String, keys: Seq[String],
                           watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions.{col, struct}
    events.withWatermark(tsCol, watermark)
      .where(!graft.dedup.Dedup.bloomMightContain(
        historyBloom, struct(keys.map(col): _*)))
      .dropDuplicates(keys :+ tsCol)
  }

  case class SessionEvent(userId: Long, tsMillis: Long, value: Double)
  case class SessionSummary(userId: Long, nEvents: Long, sumValue: Double,
                            startMillis: Long, endMillis: Long)
  /** Per-user state: every session the watermark has not yet sealed.
    * Size is bounded by the delivery skew — at most
    * ⌈watermarkDelay / gap⌉ + 1 tentative sessions per user. */
  case class SessionState(sessions: Seq[SessionSummary])

  /** Custom-state sessionization via `flatMapGroupsWithState`: events are
    * folded into per-user TENTATIVE sessions; a session emits only once
    * the EVENT-TIME watermark passes its `end + gapMillis` — the proof
    * that no admissible future event (anything older is dropped by Spark
    * at the watermark) can merge into or extend it. Emitting any earlier
    * (e.g. data-driven, when a later event arrives beyond the gap) is
    * WRONG under a nonzero `watermarkDelay`: an out-of-order event in a
    * later micro-batch may bridge two already-split sessions, and
    * append-mode output cannot be retracted. This watermark-sealed
    * discipline makes the streaming output equal a batch replay
    * ([[graft.ops.Relational.sessionize]]) of the same admitted events
    * for EVERY partition of the stream into micro-batches — asserted as a
    * randomized property in StreamingSpec.
    *
    * Event-time (not processing-time) timeouts are deliberate: they are
    * deterministic and replayable — a backfill over historical data
    * closes the same sessions as the live run, and a test can drive
    * closure by advancing the watermark with data instead of sleeping
    * wall-clock. `watermarkDelay` is the out-of-order budget: with the
    * 0 ms default any cross-batch late event is dropped before this
    * function runs; size it to the pipeline's real delivery skew. */
  def sessionize(events: Dataset[SessionEvent], gapMillis: Long,
                 watermarkDelay: String = "0 milliseconds"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          // one body serves both data batches and timeouts (rows is empty
          // on timeout): merge carried sessions + new events as
          // time-sorted intervals, splitting on every gap > gapMillis
          val items = state.getOption.map(_.sessions).getOrElse(Seq.empty) ++
            rows.map(e => SessionSummary(userId, 1L, e.value, e.tsMillis, e.tsMillis))
          val sorted = items.sortBy(s => (s.startMillis, s.endMillis)).toList
          val merged = sorted match {
            case Nil => Nil
            case head :: tail => tail.foldLeft(List(head)) { (acc, s) =>
              val c = acc.head
              if (s.startMillis - c.endMillis > gapMillis) s :: acc
              else SessionSummary(userId, c.nEvents + s.nEvents,
                c.sumValue + s.sumValue,
                math.min(c.startMillis, s.startMillis),
                math.max(c.endMillis, s.endMillis)) :: acc.tail
            }.reverse
          }
          // sealed = watermark proves immutability; open sessions wait for
          // either more data or the timeout at the earliest seal point
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) = merged.partition(_.endMillis + gapMillis < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionState(open))
            // must stay ahead of the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(open.map(_.endMillis).min + gapMillis, wm + 1))
          }
          closed.iterator
      }
  }

  case class FunnelEvent(userId: Long, step: Int, tsMillis: Long)
  /** Buffered step events the watermark has not yet ruled in or out. */
  case class FunnelBuffer(events: Seq[(Int, Long)])
  /** One row per user: stepTimes(k) = completion millis of step k+1, -1
    * where the chain stopped. */
  case class FunnelResult(userId: Long, stepTimes: Seq[Long], maxStep: Int)

  /** The greedy-earliest chain over buffered events — EXACTLY
    * [[graft.ops.Funnel.funnelTimes]]'s semantics (t₁ = min first-step
    * ts; tₖ = min step-k ts with tₖ > tₖ₋₁ and tₖ ≤ t₁ + window). */
  private def funnelChain(evts: Seq[(Int, Long)], nSteps: Int,
                          windowMillis: Long): FunnelResult = {
    val times = Array.fill(nSteps)(-1L)
    times(0) = evts.collect { case (0, ts) => ts }.min
    var k = 1
    var done = false
    while (k < nSteps && !done) {
      val cand = evts.collect {
        case (s, ts) if s == k && ts > times(k - 1) &&
          ts <= times(0) + windowMillis => ts
      }
      if (cand.isEmpty) done = true else { times(k) = cand.min; k += 1 }
    }
    FunnelResult(0L, times.toSeq, k) // userId filled by the caller
  }

  /** Streaming [[graft.ops.Funnel.funnelTimes]]: per-user step events are
    * BUFFERED until the event-time watermark proves the chain immutable,
    * then the batch chain computation runs once and emits — so the live
    * result is bit-equal to a batch replay of the admitted events
    * (asserted in StreamingSpec). Emitting any earlier would be wrong
    * under a nonzero watermark delay: an out-of-order earlier first-step
    * event re-anchors the window and can change every later step.
    *
    * Seal/eviction discipline (all event-time, deterministic):
    *  - a user WITH a first-step event seals once `wm > t1 + window` —
    *    no admissible event can lower t1 (it would be older than the
    *    watermark) or join the window (likewise);
    *  - a user with only later-step events keeps them while `wm < max
    *    ts`: a future first-step must arrive at ts ≥ wm and chains only
    *    strictly forward, so older buffered events become dead state and
    *    are dropped at their own timestamps.
    * State per user is its step-relevant events inside the out-of-order
    * horizon — bounded by delivery skew, never the full history. One
    * result row per user per chain lifetime (the batch operator is the
    * re-analysis path). */
  def streamingFunnel(events: Dataset[FunnelEvent], nSteps: Int,
                      windowMillis: Long,
                      watermarkDelay: String = "0 milliseconds"): Dataset[FunnelResult] = {
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelBuffer, FunnelResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelBuffer]) =>
          val wm = state.getCurrentWatermarkMs()
          val buf = state.getOption.map(_.events).getOrElse(Seq.empty) ++
            rows.filter(e => e.step >= 0 && e.step < nSteps)
              .map(e => (e.step, e.tsMillis))
          val firsts = buf.collect { case (0, ts) => ts }
          if (firsts.nonEmpty && wm > firsts.min + windowMillis) {
            state.remove()
            Iterator.single(
              funnelChain(buf, nSteps, windowMillis).copy(userId = userId))
          } else {
            // drop dead later-step events (no buffered t1 at or before
            // them, and any future t1 arrives at ts ≥ wm)
            val live = buf.filter { case (s, ts) =>
              s == 0 || ts >= wm || firsts.exists(_ <= ts)
            }
            if (live.isEmpty) { state.remove(); Iterator.empty }
            else {
              state.update(FunnelBuffer(live))
              val sealAt =
                if (firsts.nonEmpty) firsts.min + windowMillis + 1
                else live.map(_._2).max
              state.setTimeoutTimestamp(math.max(sealAt, wm + 1))
              Iterator.empty
            }
          }
      }
  }

  case class ActivityEvent(userId: Long, tsMillis: Long)
  /** Distinct contributors the watermark has not yet sealed, per target
    * bucket. */
  case class BucketContributors(users: Seq[Long])
  case class ActiveCount(bucket: Long, nActive: Long)
  /** Internal fan-out row of [[streamingRollingActive]] (public for the
    * typed deserializer's codegen). */
  case class FanRow(userId: Long, bucket: Long, tsMillis: Long)

  /** Streaming [[graft.ops.Funnel.rollingActive]]: each event fans out
    * STATELESSLY to the `windowBuckets` window ends its activity bucket
    * contributes to; per target bucket a distinct-contributor set
    * accumulates until the event-time watermark passes the last
    * admissible contributor (`(bucket+1)·bucketMillis`), then the count
    * emits ONCE — equal to the batch operator over the admitted events
    * (asserted in StreamingSpec). Buckets whose seal time lies past the
    * watermark stay pending, which is the stream-edge analogue of the
    * batch operator's newest-bucket clamp.
    *
    * Late rows (event time below the current watermark) are dropped in
    * the group function — the fan-out projects the watermark-tagged
    * column away, so the engine's own late filter cannot apply, and
    * without the guard a straggler could resurrect a sealed bucket's
    * state and emit the bucket twice (append mode cannot retract).
    *
    * State per in-flight bucket is its EXACT distinct key set — the
    * irreducible cost of an exact streaming distinct (≤ window + delay
    * horizon buckets in flight, × that bucket's actives); swap the set
    * for a sketch to trade exactness for O(1) state, as the batch sketch
    * layer does with HLL. */
  def streamingRollingActive(events: Dataset[ActivityEvent],
                             bucketMillis: Long, windowBuckets: Int,
                             watermarkDelay: String = "0 milliseconds")
      : Dataset[ActiveCount] = {
    import events.sparkSession.implicits._
    require(windowBuckets >= 1, "window must span at least one bucket")
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      // eventTime stays in the projection: the analyzer requires the
      // watermark-tagged attribute in the fMGWS input (the typed
      // deserializer reads only FanRow's fields)
      .select(col("userId"),
        explode(sequence(expr(s"tsMillis div ${bucketMillis}L"),
          expr(s"tsMillis div ${bucketMillis}L") + lit(windowBuckets - 1L)))
          .as("bucket"),
        col("tsMillis"), col("eventTime"))
      .as[FanRow]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketContributors, ActiveCount](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, rows: Iterator[FanRow], state: GroupState[BucketContributors]) =>
          val wm = state.getCurrentWatermarkMs()
          val sealAt = bucket * bucketMillis + bucketMillis
          val fresh = rows.filter(_.tsMillis >= wm).map(_.userId)
          // carried state is ALREADY distinct: only dedup the new keys
          // against it (a re-distinct of the whole set per micro-batch
          // would pay O(|state|) extra on every hot bucket)
          val prev = state.getOption.map(_.users).getOrElse(Seq.empty)
          val prevSet = prev.toSet
          val users = prev ++ fresh.filterNot(prevSet).toSeq.distinct
          if (wm >= sealAt) {
            state.remove()
            if (users.nonEmpty) Iterator.single(ActiveCount(bucket, users.size.toLong))
            else Iterator.empty
          } else if (users.isEmpty) {
            state.remove()
            Iterator.empty
          } else {
            state.update(BucketContributors(users))
            state.setTimeoutTimestamp(math.max(sealAt, wm + 1))
            Iterator.empty
          }
      }
  }

  /** The watermark-sealed HLL sketch for one in-flight bucket —
    * DataSketches updatable serialization, O(2^lgK) bytes regardless of
    * key cardinality. */
  case class BucketSketch(sketch: Array[Byte])
  case class ActiveEstimate(bucket: Long, nActiveApprox: Long)

  /** [[streamingRollingActive]]'s sketch path — the streaming twin of
    * [[graft.ops.Funnel.rollingActiveApprox]]: the same stateless
    * `sequence` fan-out to window ends, but per-bucket state is ONE
    * updatable HLL sketch (the same DataSketches `HllSketch(lgK,
    * HLL_8)` Spark's `hll_sketch_agg` builds, so stream and batch
    * estimates agree exactly — HLL registers are order-independent
    * maxima, asserted in StreamingSpec) instead of the exact distinct
    * key set. State per in-flight bucket drops from O(actives) to
    * O(2^lgK) bytes — the 10⁹-actives regime the batch sketch path
    * exists for; the exact operator remains the verification path.
    * Seal/late-row discipline is identical to the exact variant. */
  def streamingRollingActiveApprox(events: Dataset[ActivityEvent],
                                   bucketMillis: Long, windowBuckets: Int,
                                   lgConfigK: Int = 12,
                                   watermarkDelay: String = "0 milliseconds")
      : Dataset[ActiveEstimate] = {
    import events.sparkSession.implicits._
    import org.apache.datasketches.hll.{HllSketch, TgtHllType}
    require(windowBuckets >= 1, "window must span at least one bucket")
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .select(col("userId"),
        explode(sequence(expr(s"tsMillis div ${bucketMillis}L"),
          expr(s"tsMillis div ${bucketMillis}L") + lit(windowBuckets - 1L)))
          .as("bucket"),
        col("tsMillis"), col("eventTime"))
      .as[FanRow]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketSketch, ActiveEstimate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, rows: Iterator[FanRow], state: GroupState[BucketSketch]) =>
          val wm = state.getCurrentWatermarkMs()
          val sealAt = bucket * bucketMillis + bucketMillis
          val sketch = state.getOption
            .map(s => HllSketch.heapify(s.sketch))
            .getOrElse(new HllSketch(lgConfigK, TgtHllType.HLL_8))
          rows.filter(_.tsMillis >= wm).foreach(r => sketch.update(r.userId))
          if (wm >= sealAt) {
            state.remove()
            if (sketch.isEmpty) Iterator.empty
            else Iterator.single(
              ActiveEstimate(bucket, Math.round(sketch.getEstimate)))
          } else if (sketch.isEmpty) {
            state.remove()
            Iterator.empty
          } else {
            state.update(BucketSketch(sketch.toUpdatableByteArray))
            state.setTimeoutTimestamp(math.max(sealAt, wm + 1))
            Iterator.empty
          }
      }
  }

  /** Per-key EWMA state: the running smoothed level (one long for the
    * key's whole lifetime — EWMA memory is the point) plus the counts
    * of buckets the watermark has not yet sealed. */
  case class EwmaState(e: Option[Long], pending: Map[Long, Long])
  case class EwmaPoint(key: Long, bucket: Long, n: Long,
                       ewmaPrev: Option[Long], spike: Option[Boolean])

  /** Streaming [[graft.ops.Timeseries.ewmaAnomalies]]: per-key bucket
    * counts accumulate until the event-time watermark seals a bucket,
    * then buckets fold into the integer half-life EWMA IN ORDER and
    * emit with the prior level + spike verdict — equal to the batch
    * fold over the admitted events (asserted in StreamingSpec).
    * Sealing strictly bucket-ordered is what preserves batch parity:
    * the fold is sequential, so emitting a later bucket before an
    * earlier one finishes would change every subsequent level.
    *
    * State per key is the pending in-horizon bucket counts (bounded by
    * delivery skew) plus ONE long of smoothed history — the streaming
    * EWMA's whole memory, regardless of how long the key lives. */
  def streamingEwma(events: Dataset[ActivityEvent], bucketMillis: Long,
                    spikeFactor: Long = 3L,
                    watermarkDelay: String = "0 milliseconds")
      : Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    require(spikeFactor >= 1L, s"spikeFactor must be >= 1: $spikeFactor")
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .as[ActivityEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[ActivityEvent], state: GroupState[EwmaState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(EwmaState(None, Map.empty))
          // late rows (below the watermark) are dropped: their bucket is
          // sealed and append mode cannot retract its point
          val pending = rows.filter(_.tsMillis >= wm).foldLeft(st.pending) {
            (m, r) =>
              val b = r.tsMillis / bucketMillis
              m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          val (ripe, open) =
            pending.partition { case (b, _) => (b + 1L) * bucketMillis <= wm }
          var e = st.e
          val out = ripe.keys.toSeq.sorted.map { b =>
            val n = ripe(b)
            val prev = e
            e = Some(prev.fold(n)(p => (p + n) / 2))
            EwmaPoint(key, b, n, prev, prev.map(p => n > spikeFactor * p))
          }
          state.update(EwmaState(e, open))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              (open.keys.min + 1L) * bucketMillis, wm + 1))
          // no pending buckets → no timeout: the long-lived level waits
          // for the key's next event (state is one long + an empty map)
          out.iterator
      }
  }

  /** Per-key CUSUM state: the warmup accumulator until μ exists, then
    * the two one-sided sums — plus the unsealed bucket counts. */
  case class CusumState(warmCount: Int, warmSum: Long, mu: Option[Long],
                        sPos: Long, sNeg: Long, pending: Map[Long, Long])
  case class CusumPoint(key: Long, bucket: Long, n: Long, mu: Option[Long],
                        sPos: Option[Long], sNeg: Option[Long],
                        shiftUp: Option[Boolean], shiftDown: Option[Boolean])

  /** Streaming [[graft.ops.Timeseries.cusumShifts]]: buckets seal at
    * the watermark IN ORDER (the [[streamingEwma]] discipline — the
    * fold is sequential) and feed the same integer CUSUM — μ from the
    * first `warmup` sealed buckets, then `S⁺/S⁻` accumulate and flag.
    * Equal to the batch fold over the admitted events on every sum and
    * verdict column (StreamingSpec); the ONE divergence is μ on warmup
    * rows — batch backfills it retroactively, the stream cannot know
    * it yet, and both leave the sums/verdicts null there. State per
    * key is three longs + the in-horizon pending counts. */
  def streamingCusum(events: Dataset[ActivityEvent], bucketMillis: Long,
                     warmup: Int, slack: Long, threshold: Long,
                     watermarkDelay: String = "0 milliseconds")
      : Dataset[CusumPoint] = {
    import events.sparkSession.implicits._
    require(warmup >= 1, s"warmup must be positive: $warmup")
    require(slack >= 0L, s"slack must be non-negative: $slack")
    require(threshold >= 1L, s"threshold must be positive: $threshold")
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .as[ActivityEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[ActivityEvent], state: GroupState[CusumState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st = state.getOption
            .getOrElse(CusumState(0, 0L, None, 0L, 0L, Map.empty))
          val pending = rows.filter(_.tsMillis >= wm).foldLeft(st.pending) {
            (m, r) =>
              val b = r.tsMillis / bucketMillis
              m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          val (ripe, open) =
            pending.partition { case (b, _) => (b + 1L) * bucketMillis <= wm }
          var (wc, ws, mu, sp, sn) =
            (st.warmCount, st.warmSum, st.mu, st.sPos, st.sNeg)
          val out = ripe.keys.toSeq.sorted.map { b =>
            val n = ripe(b)
            if (mu.isEmpty) {
              wc += 1; ws += n
              if (wc == warmup) mu = Some(ws / warmup)
              CusumPoint(key, b, n, None, None, None, None, None)
            } else {
              sp = math.max(0L, sp + n - mu.get - slack)
              sn = math.max(0L, sn + mu.get - n - slack)
              CusumPoint(key, b, n, mu, Some(sp), Some(sn),
                Some(sp > threshold), Some(sn > threshold))
            }
          }
          state.update(CusumState(wc, ws, mu, sp, sn, open))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              (open.keys.min + 1L) * bucketMillis, wm + 1))
          out.iterator
      }
  }

  case class SegmentEvent(seg: String, userId: Long, tsMillis: Long)
  /** One in-flight (segment, bucket) theta sketch — DataSketches
    * updatable serialization, O(2^lgK) bytes at any key cardinality. */
  case class SegSketch(sketch: Array[Byte])
  /** A watermark-sealed per-(segment, bucket) audience sketch: compact
    * bytes ready for [[graft.ops.Audience.mergeSegmentSketches]] /
    * `theta_union_agg`, plus the distinct estimate. */
  case class SealedSegmentSketch(seg: String, bucket: Long,
                                 sketch: Array[Byte], nApprox: Long)

  /** Streaming producer of [[graft.ops.Audience]]'s daily artifacts:
    * per-(segment, time-bucket) THETA sketches accumulate in state and
    * emit ONCE the event-time watermark seals the bucket — the sealed
    * compact bytes are exactly what the batch set-algebra layer
    * consumes (`mergeSegmentSketches` unions them across days, then
    * `segmentOverlap` answers ∩/∪/∖ — spec-pinned equal to a batch
    * build over the same events). Late rows below the watermark drop
    * (the sealed sketch cannot be retracted in append mode). State per
    * in-flight (segment, bucket) is one updatable theta sketch —
    * bounded by the out-of-order horizon × segment count, never by
    * user cardinality. */
  def streamingSegmentSketches(events: Dataset[SegmentEvent],
                               bucketMillis: Long, lgK: Int = 12,
                               watermarkDelay: String = "0 milliseconds")
      : Dataset[SealedSegmentSketch] = {
    import events.sparkSession.implicits._
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.UpdateSketch
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .as[SegmentEvent]
      .groupByKey(e => (e.seg, e.tsMillis / bucketMillis))
      .flatMapGroupsWithState[SegSketch, SealedSegmentSketch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, Long), rows: Iterator[SegmentEvent],
         state: GroupState[SegSketch]) =>
          val (seg, bucket) = key
          val wm = state.getCurrentWatermarkMs()
          val sealAt = (bucket + 1L) * bucketMillis
          val sketch = state.getOption
            .map(s => UpdateSketch.heapify(Memory.wrap(s.sketch)))
            .getOrElse(UpdateSketch.builder()
              .setNominalEntries(1 << lgK).build())
          rows.filter(_.tsMillis >= wm).foreach(r => sketch.update(r.userId))
          if (wm >= sealAt) {
            state.remove()
            if (sketch.getRetainedEntries(true) == 0) Iterator.empty
            else {
              val compact = sketch.compact()
              Iterator.single(SealedSegmentSketch(seg, bucket,
                compact.toByteArray, Math.round(compact.getEstimate)))
            }
          } else if (sketch.getRetainedEntries(true) == 0) {
            state.remove()
            Iterator.empty
          } else {
            state.update(SegSketch(sketch.toByteArray))
            state.setTimeoutTimestamp(math.max(sealAt, wm + 1))
            Iterator.empty
          }
      }
  }

  case class MeasureEvent(value: Double, tsMillis: Long)
  /** One in-flight per-bucket KLL sketch — DataSketches serialization,
    * O(k) bytes at any event volume. */
  case class BucketKll(sketch: Array[Byte])
  /** A watermark-sealed per-bucket quantile sketch: bytes ready for
    * `kll_merge_agg_double` /
    * [[graft.ops.Timeseries.rollingQuantileFromSketches]], plus the
    * sealed value count. */
  case class SealedBucketQuantile(bucket: Long, sketch: Array[Byte], n: Long)

  /** Streaming producer of [[graft.ops.Timeseries.bucketQuantileSketches]]'s
    * daily artifacts — completing the sketch-family symmetry (HLL
    * actives, theta segments and EWMA all have streaming twins): one
    * KLL doubles sketch per time bucket accumulates in state and emits
    * ONCE the event-time watermark seals the bucket; the sealed bytes
    * are exactly what the batch window layer consumes
    * (`rollingQuantileFromSketches` — spec-pinned equal to a batch
    * build over the same admitted events in the below-k exact regime,
    * where KLL retains everything and no randomized compaction runs).
    * Late rows below the watermark drop (append mode cannot retract a
    * sealed sketch). State per in-flight bucket is O(k) bytes
    * regardless of event volume — the irreducible cost of streaming
    * quantiles, vs O(events) for an exact buffer. */
  def streamingBucketQuantileSketches(events: Dataset[MeasureEvent],
                                      bucketMillis: Long, kllK: Int = 200,
                                      watermarkDelay: String = "0 milliseconds")
      : Dataset[SealedBucketQuantile] = {
    import events.sparkSession.implicits._
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .as[MeasureEvent]
      .groupByKey(e => Math.floorDiv(e.tsMillis, bucketMillis))
      .flatMapGroupsWithState[BucketKll, SealedBucketQuantile](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, rows: Iterator[MeasureEvent], state: GroupState[BucketKll]) =>
          val wm = state.getCurrentWatermarkMs()
          val sealAt = (bucket + 1L) * bucketMillis
          val sketch = state.getOption
            .map(s => KllDoublesSketch.heapify(Memory.wrap(s.sketch)))
            .getOrElse(KllDoublesSketch.newHeapInstance(kllK))
          rows.filter(_.tsMillis >= wm).foreach(r => sketch.update(r.value))
          if (wm >= sealAt) {
            state.remove()
            if (sketch.isEmpty) Iterator.empty
            else Iterator.single(SealedBucketQuantile(bucket,
              sketch.toByteArray, sketch.getN))
          } else if (sketch.isEmpty) {
            state.remove()
            Iterator.empty
          } else {
            state.update(BucketKll(sketch.toByteArray))
            state.setTimeoutTimestamp(math.max(sealAt, wm + 1))
            Iterator.empty
          }
      }
  }

  /** Internal fan row of [[streamingTokenCms]] (public for the typed
    * deserializer's codegen). */
  case class TokenFreqEvent(token: String, tsMillis: Long)
  /** One in-flight per-bucket count-min sketch — Spark's
    * `util.sketch.CountMinSketch` serialization, O(depth·width)
    * counters at any token volume. */
  case class BucketCmsState(sketch: Array[Byte])
  /** A watermark-sealed per-bucket token-frequency sketch plus the
    * sealed token count. Bytes are `CountMinSketch.readFrom`-able and
    * `mergeInPlace`-compatible with the batch
    * [[graft.udafs.Sketches.tokenCms]] artifacts (same eps/confidence/
    * seed). */
  case class SealedBucketCms(bucket: Long, sketch: Array[Byte], nTokens: Long)

  /** Streaming producer of the token-frequency CMS — the FREQUENCY
    * family's streaming twin (HLL actives, theta segments, EWMA and
    * KLL quantiles all have one): docs tokenize STATELESSLY with the
    * same `TextOps.tokens` expression the batch sketch uses, each
    * token fans to its time bucket, and one updatable count-min sketch
    * per in-flight bucket accumulates until the event-time watermark
    * seals it. CMS counters are SUMS — commutative and
    * order-independent — so sealed per-bucket sketches `mergeInPlace`
    * to BYTE-IDENTICAL artifacts vs a batch [[graft.udafs.Sketches
    * .tokenCms]] build over the same admitted docs (spec-pinned),
    * exactness no other sketch family's twin can claim. Late rows
    * below the watermark drop (append mode cannot retract). State per
    * in-flight bucket is the fixed counter grid — O(depth·width)
    * bytes at any token volume. */
  def streamingTokenCms(docs: DataFrame, textCol: String, tsCol: String,
                        bucketMillis: Long, eps: Double, confidence: Double,
                        seed: Int,
                        watermarkDelay: String = "0 milliseconds")
      : Dataset[SealedBucketCms] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.util.sketch.CountMinSketch
    docs
      .withColumn("eventTime", timestamp_millis(col(tsCol).cast("long")))
      .withWatermark("eventTime", watermarkDelay)
      .select(explode(graft.text.TextOps.tokens(col(textCol))).as("token"),
        col(tsCol).cast("long").as("tsMillis"), col("eventTime"))
      .as[TokenFreqEvent]
      .groupByKey(e => Math.floorDiv(e.tsMillis, bucketMillis))
      .flatMapGroupsWithState[BucketCmsState, SealedBucketCms](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, rows: Iterator[TokenFreqEvent],
         state: GroupState[BucketCmsState]) =>
          val wm = state.getCurrentWatermarkMs()
          val sealAt = (bucket + 1L) * bucketMillis
          val sketch = state.getOption
            .map(s => CountMinSketch.readFrom(
              new java.io.ByteArrayInputStream(s.sketch)))
            .getOrElse(CountMinSketch.create(eps, confidence, seed))
          rows.filter(_.tsMillis >= wm).foreach(r => sketch.addString(r.token))
          def bytes(): Array[Byte] = {
            val bos = new java.io.ByteArrayOutputStream()
            sketch.writeTo(bos)
            bos.toByteArray
          }
          if (wm >= sealAt) {
            state.remove()
            if (sketch.totalCount() == 0L) Iterator.empty
            else Iterator.single(
              SealedBucketCms(bucket, bytes(), sketch.totalCount()))
          } else if (sketch.totalCount() == 0L) {
            state.remove()
            Iterator.empty
          } else {
            state.update(BucketCmsState(bytes()))
            state.setTimeoutTimestamp(math.max(sealAt, wm + 1))
            Iterator.empty
          }
      }
  }

  /** One in-flight per-bucket Misra–Gries summary (≤ k counters). */
  case class BucketMgState(summary: Map[String, Long])
  /** A watermark-sealed per-bucket frequent-items summary. Maps are
    * [[graft.udafs.FreqItems.mgMergeAgg]]-compatible with batch
    * artifacts built under the same k. */
  case class SealedBucketMg(bucket: Long, summary: Map[String, Long])

  /** Streaming producer of per-bucket Misra–Gries frequent-items
    * summaries — the HEAVY-HITTER family's streaming twin (HLL actives,
    * theta segments, CMS frequencies, EWMA, CUSUM and KLL quantiles all
    * have one): docs tokenize statelessly with the same
    * `TextOps.tokens` expression the batch aggregator consumes, each
    * token fans to its time bucket, and one ≤ k-counter summary per
    * in-flight bucket accumulates until the event-time watermark seals
    * it. The deterministic MG guarantee (est ≤ true, true − est ≤
    * N_bucket/(k+1), heavy ⇒ present) is ORDER-FREE, so it holds for
    * sealed buckets regardless of arrival order; while a bucket's
    * vocabulary stays ≤ k no trim fires and the sealed summary is
    * bit-exact equal to a batch [[graft.udafs.FreqItems.mgAgg]] build
    * over the same admitted docs (spec-pinned — the KLL below-capacity
    * convention). Late rows below the watermark drop (append mode
    * cannot retract). State per in-flight bucket is AT MOST k counters
    * at any token volume. */
  def streamingTokenHeavyHitters(docs: DataFrame, textCol: String,
                                 tsCol: String, bucketMillis: Long, k: Int,
                                 watermarkDelay: String = "0 milliseconds")
      : Dataset[SealedBucketMg] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k >= 1, s"summary size must be positive: $k")
    docs
      .withColumn("eventTime", timestamp_millis(col(tsCol).cast("long")))
      .withWatermark("eventTime", watermarkDelay)
      .select(explode(graft.text.TextOps.tokens(col(textCol))).as("token"),
        col(tsCol).cast("long").as("tsMillis"), col("eventTime"))
      .as[TokenFreqEvent]
      .groupByKey(e => Math.floorDiv(e.tsMillis, bucketMillis))
      .flatMapGroupsWithState[BucketMgState, SealedBucketMg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, rows: Iterator[TokenFreqEvent],
         state: GroupState[BucketMgState]) =>
          val wm = state.getCurrentWatermarkMs()
          val sealAt = (bucket + 1L) * bucketMillis
          val summary = rows.filter(_.tsMillis >= wm)
            .foldLeft(state.getOption.map(_.summary).getOrElse(Map.empty)) {
              (m, r) => graft.udafs.FreqItems.trim(
                m.updated(r.token, m.getOrElse(r.token, 0L) + 1L), k)
            }
          if (wm >= sealAt) {
            state.remove()
            if (summary.isEmpty) Iterator.empty
            else Iterator.single(SealedBucketMg(bucket, summary))
          } else if (summary.isEmpty) {
            state.remove()
            Iterator.empty
          } else {
            state.update(BucketMgState(summary))
            state.setTimeoutTimestamp(math.max(sealAt, wm + 1))
            Iterator.empty
          }
      }
  }

  /** One in-flight per-bucket AGMS counter grid + admitted-row count. */
  case class BucketAgmsState(sketch: Array[Byte], n: Long)
  /** A watermark-sealed per-bucket AGMS join-size sketch plus the
    * sealed row count. Bytes are [[graft.udafs.JoinSize.deserialize]]-
    * able and merge counter-wise with batch artifacts under the same
    * (depth, width, seed). */
  case class SealedBucketAgms(bucket: Long, sketch: Array[Byte], n: Long)

  /** Streaming producer of per-bucket AGMS join-size sketches — the
    * OPTIMIZER-STATISTICS family's streaming twin (HLL actives, theta
    * segments, CMS frequencies, MG heavy hitters, EWMA, CUSUM and KLL
    * quantiles all have one): each row's key updates one signed-counter
    * grid per in-flight time bucket until the event-time watermark
    * seals it. AGMS updates are signed SUMS — commutative and
    * order-independent — so sealed per-bucket sketches merge
    * counter-wise to BYTE-IDENTICAL artifacts vs a batch
    * [[graft.udafs.JoinSize.agmsAgg]] build over the same admitted rows
    * (spec-pinned, the CMS twin's exactness claim): the day's
    * join-cardinality planning questions ("should this broadcast, is it
    * skew-exploded") answer from kilobytes of streamed artifacts with
    * no batch re-scan. Late rows below the watermark drop (append mode
    * cannot retract). State per in-flight bucket is the fixed
    * depth×width grid at any row volume. */
  def streamingKeyAgms(rows: DataFrame, keyCol: String, tsCol: String,
                       bucketMillis: Long, depth: Int, width: Int, seed: Int,
                       watermarkDelay: String = "0 milliseconds")
      : Dataset[SealedBucketAgms] = {
    val spark = rows.sparkSession
    import spark.implicits._
    import graft.udafs.JoinSize
    rows
      .withColumn("eventTime", timestamp_millis(col(tsCol).cast("long")))
      .withWatermark("eventTime", watermarkDelay)
      .select(col(keyCol).cast("string").as("token"),
        col(tsCol).cast("long").as("tsMillis"), col("eventTime"))
      .as[TokenFreqEvent]
      .groupByKey(e => Math.floorDiv(e.tsMillis, bucketMillis))
      .flatMapGroupsWithState[BucketAgmsState, SealedBucketAgms](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, rs: Iterator[TokenFreqEvent],
         state: GroupState[BucketAgmsState]) =>
          val wm = state.getCurrentWatermarkMs()
          val sealAt = (bucket + 1L) * bucketMillis
          val (counters, n0) = state.getOption
            .map(s => (JoinSize.deserialize(s.sketch)._4, s.n))
            .getOrElse((new Array[Long](depth * width), 0L))
          var n = n0
          rs.filter(_.tsMillis >= wm).foreach { r =>
            if (r.token != null) {
              JoinSize.addInto(counters, r.token, 1L, depth, width, seed)
              n += 1L
            }
          }
          def bytes(): Array[Byte] =
            JoinSize.serialize(depth, width, seed, counters)
          if (wm >= sealAt) {
            state.remove()
            if (n == 0L) Iterator.empty
            else Iterator.single(SealedBucketAgms(bucket, bytes(), n))
          } else if (n == 0L) {
            state.remove()
            Iterator.empty
          } else {
            state.update(BucketAgmsState(bytes(), n))
            state.setTimeoutTimestamp(math.max(sealAt, wm + 1))
            Iterator.empty
          }
      }
  }

  /** Internal fan row of [[streamingCentroidSums]]. */
  case class VecEvent(embedding: Seq[Float], tsMillis: Long)
  /** One in-flight per-bucket centroid accumulator: micro element sums
    * + vector count. */
  case class BucketVecState(sums: Seq[Long], n: Long)
  /** A watermark-sealed per-bucket centroid-sum artifact — exactly
    * [[graft.sim.VectorAgg.vectorSumElements]]'s row shape, one row
    * per dimension. */
  case class SealedBucketVec(bucket: Long, pos: Int, elem_sum_micro: Long,
                             n_vectors: Long)

  /** Streaming producer of per-bucket centroid-sum artifacts — the
    * VECTOR family's streaming twin: embeddings quantize to micro
    * longs with the same `round(v·10⁶)` the batch layer uses, each
    * vector adds into its time bucket's element-sum accumulator, and
    * the watermark seals the bucket into
    * [[graft.sim.VectorAgg.vectorSumElements]]-shaped rows. Integer
    * element sums are order-free, so sealed artifacts are BIT-EXACT
    * equal to a batch build over the same admitted vectors
    * (spec-pinned) — [[graft.sim.VectorAgg.centroidDrift]] and the
    * outlier screen consume them unchanged, so the drift alarm runs
    * live off the stream with state = one long per dimension per
    * in-flight bucket. Ragged lengths extend the accumulator
    * (the batch zero-pad convention); late rows below the watermark
    * drop. */
  def streamingCentroidSums(vecs: DataFrame, vecCol: String, tsCol: String,
                            bucketMillis: Long,
                            watermarkDelay: String = "0 milliseconds")
      : Dataset[SealedBucketVec] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs
      .where(col(vecCol).isNotNull)
      .withColumn("eventTime", timestamp_millis(col(tsCol).cast("long")))
      .withWatermark("eventTime", watermarkDelay)
      .select(col(vecCol).as("embedding"),
        col(tsCol).cast("long").as("tsMillis"), col("eventTime"))
      .as[VecEvent]
      .groupByKey(e => Math.floorDiv(e.tsMillis, bucketMillis))
      .flatMapGroupsWithState[BucketVecState, SealedBucketVec](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, rows: Iterator[VecEvent],
         state: GroupState[BucketVecState]) =>
          val wm = state.getCurrentWatermarkMs()
          val sealAt = (bucket + 1L) * bucketMillis
          var st = state.getOption.getOrElse(BucketVecState(Vector.empty, 0L))
          rows.filter(_.tsMillis >= wm).foreach { r =>
            if (r.embedding != null) {
              // BigDecimal HALF_UP matches Spark's `round` exactly —
              // math.round floors half-values toward +∞ on negatives
              val micro = r.embedding.map(v =>
                BigDecimal(v.toDouble * 1e6)
                  .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
              val base =
                if (st.sums.length >= micro.length) st.sums
                else st.sums ++ Vector.fill(micro.length - st.sums.length)(0L)
              val sums = base.zipWithIndex.map { case (s, i) =>
                if (i < micro.length) s + micro(i) else s
              }
              st = BucketVecState(sums, st.n + 1L)
            }
          }
          if (wm >= sealAt) {
            state.remove()
            if (st.n == 0L) Iterator.empty
            else st.sums.iterator.zipWithIndex.map { case (s, i) =>
              SealedBucketVec(bucket, i, s, st.n)
            }
          } else if (st.n == 0L) {
            state.remove()
            Iterator.empty
          } else {
            state.update(st)
            state.setTimeoutTimestamp(math.max(sealAt, wm + 1))
            Iterator.empty
          }
      }
  }

  /** Input row of [[streamingScd2]]. */
  case class ChangeEvent(key: Long, tsMillis: Long, attr: String)
  /** Per-key SCD2 state: the currently-open interval + the in-horizon
    * pending changes (ts → attr). */
  case class Scd2State(openFrom: Option[Long], openAttr: Option[String],
                       pending: Map[Long, String])
  /** A CLOSED validity interval ([[streamingScd2]] emits nothing for a
    * key's still-open current row — append mode cannot retract it). */
  case class Scd2Interval(key: Long, attr: String,
                          validFrom: Long, validTo: Long)

  /** Streaming twin of [[graft.ops.Relational.scd2]]: closed validity
    * intervals sealed live from a change stream. Like
    * [[streamingEwma]], sealing is STRICTLY ORDERED — interval bounds
    * depend on each key's change order, so a change at `ts` processes
    * only once the watermark passes it (any still-missing earlier
    * change would be late-and-dropped by then). Consecutive unchanged
    * attrs collapse exactly like the batch operator; each key's current
    * open interval lives in state (O(1) + the in-horizon pending
    * changes) and is never emitted — the batch operator over the
    * compacted log owns the point-in-time read including open rows.
    * Duplicate (key, ts) changes fail the query loudly (the batch
    * guard's discipline — silent last-write-wins would corrupt
    * bounds). */
  def streamingScd2(changes: Dataset[ChangeEvent],
                    watermarkDelay: String = "0 milliseconds")
      : Dataset[Scd2Interval] = {
    import changes.sparkSession.implicits._
    changes
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .as[ChangeEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Scd2State, Scd2Interval](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[ChangeEvent], state: GroupState[Scd2State]) =>
          val wm = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(Scd2State(None, None, Map.empty))
          val pending = rows.filter(_.tsMillis >= wm).foldLeft(st.pending) {
            (m, r) =>
              if (m.contains(r.tsMillis))
                throw new IllegalStateException(
                  s"duplicate change at (key=$key, ts=${r.tsMillis}) — " +
                    "interval bounds would be ambiguous; dedupe upstream")
              m.updated(r.tsMillis, r.attr)
          }
          // strictly-below-watermark changes are final: no earlier row
          // can still arrive between them (it would be late and dropped)
          val (ripe, open) = pending.partition { case (ts, _) => ts < wm }
          var from = st.openFrom
          var attr = st.openAttr
          val out = Vector.newBuilder[Scd2Interval]
          ripe.keys.toSeq.sorted.foreach { ts =>
            val a = pending(ts)
            (from, attr) match {
              case (Some(_), Some(pa)) if pa == a => () // unchanged: collapse
              case (Some(f), Some(pa)) =>
                out += Scd2Interval(key, pa, f, ts); from = Some(ts); attr = Some(a)
              case _ => from = Some(ts); attr = Some(a)
            }
          }
          state.update(Scd2State(from, attr, open))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(open.keys.min + 1, wm + 1))
          out.result().iterator
      }
  }

  case class CdcChangeEvent(key: Long, tsMillis: Long, op: String, value: Long)
  /** The in-flight best change of one `(key, day)` — O(1) state. */
  case class DayChangeState(tsMillis: Long, op: String, value: Long)
  /** A watermark-sealed net change: the day's WINNING op/payload for
    * one key, `seq` carrying the winning change's timestamp so
    * downstream [[graft.ops.Cdc.cdcApply]] replays latest-wins across
    * days exactly. */
  case class SealedDayChange(key: Long, day: Long, seq: Long, op: String,
                             value: Long)

  /** Streaming producer of the DAILY COMPACTED CHANGELOG — the CDC
    * family's streaming twin ([[graft.ops.Cdc]]): a change stream
    * compacts to one net change per `(key, day)`, sealed once the
    * event-time watermark passes the day boundary; the sealed rows are
    * exactly what the batch [[graft.ops.Cdc.cdcApply]] consumes to roll
    * a snapshot forward day by day (spec-pinned: applying a sealed day
    * == applying that day's raw changes). Latest-wins is ORDER-FREE —
    * the winner is the max `(tsMillis, op, value)` tuple, the same
    * total order as `cdcApply`'s `max_by struct(seq, op, payload)`
    * (ASCII op codes compare identically in both) — so unlike the
    * EWMA/SCD2 twins no ordered sealing is needed; any arrival order
    * inside the horizon yields the same sealed row. Late rows below
    * the watermark drop (append mode cannot retract a sealed change —
    * the batch operator over the raw log is the corrector). State per
    * in-flight `(key, day)` is ONE change — O(keys churning today),
    * not O(changes). */
  def streamingDailyChangelog(changes: Dataset[CdcChangeEvent],
                              bucketMillis: Long,
                              watermarkDelay: String = "0 milliseconds")
      : Dataset[SealedDayChange] = {
    import changes.sparkSession.implicits._
    require(bucketMillis > 0L, s"bucketMillis must be positive: $bucketMillis")
    def beats(a: DayChangeState, b: DayChangeState): Boolean =
      Ordering.Tuple3[Long, String, Long].gt(
        (a.tsMillis, a.op, a.value), (b.tsMillis, b.op, b.value))
    changes
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .as[CdcChangeEvent]
      .groupByKey(e => (e.key, Math.floorDiv(e.tsMillis, bucketMillis)))
      .flatMapGroupsWithState[DayChangeState, SealedDayChange](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((key, day), rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          val sealAt = (day + 1L) * bucketMillis
          var best = state.getOption.orNull
          rows.filter(_.tsMillis >= wm).foreach { r =>
            val cand = DayChangeState(r.tsMillis, r.op, r.value)
            if (best == null || beats(cand, best)) best = cand
          }
          if (best == null) { state.remove(); Iterator.empty }
          else if (wm >= sealAt) {
            state.remove()
            Iterator.single(
              SealedDayChange(key, day, best.tsMillis, best.op, best.value))
          } else {
            state.update(best)
            state.setTimeoutTimestamp(math.max(sealAt, wm + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming twin of [[graft.ops.Relational.intervalJoin]]: match
    * each point event to the live intervals containing it — session
    * windows enriching their clicks, deployment windows claiming their
    * errors — as a native STREAM-STREAM inner join. Spark's state
    * cleanup needs a time-range bound between the two EVENT-TIME
    * columns, so the caller declares `maxIntervalLen` (an interval
    * literal, e.g. `"3 days"`): the join condition carries
    * `point < start + maxIntervalLen` alongside the exact containment
    * `start ≤ point < end`, which lets both sides' buffers purge at
    * the watermark instead of growing forever. Intervals longer than
    * `maxIntervalLen` are truncated (matches past the bound drop) —
    * size it at the schema's maximum interval length. Both inputs
    * carry epoch-MILLIS longs (`startCol`/`endCol`/`tsCol`); output is
    * every interval column + the point `payload` columns, exactly the
    * batch operator's shape. */
  def streamingIntervalJoin(intervals: DataFrame, points: DataFrame,
                            keys: Seq[String], startCol: String,
                            endCol: String, tsCol: String,
                            payload: Seq[String], maxIntervalLen: String,
                            watermarkDelay: String = "0 milliseconds")
      : DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one equi-key")
    val iCols = intervals.columns.toSeq
    require(!iCols.exists(payload.contains),
      s"payload ${payload.mkString(",")} collides with an interval column")
    val i = intervals
      .withColumn("__istart", timestamp_millis(col(startCol).cast("long")))
      .withWatermark("__istart", watermarkDelay)
    val p = points
      .select(keys.map(k => col(k).as(s"__k_$k")) ++ Seq(
        col(tsCol).cast("long").as("__pmillis"),
        struct(payload.map(col): _*).as("__p")): _*)
      .withColumn("__pts", timestamp_millis(col("__pmillis")))
      .withWatermark("__pts", watermarkDelay)
    val cond = keys.map(k => col(k) === col(s"__k_$k")).reduce(_ && _) &&
      col("__pts") >= col("__istart") &&
      col("__pts") < col("__istart") + expr(s"INTERVAL $maxIntervalLen") &&
      col("__pmillis") >= col(startCol) && col("__pmillis") < col(endCol)
    i.join(p, cond)
      .select(iCols.map(col) ++ payload.map(c => col(s"__p.$c").as(c)): _*)
  }

  /** Streaming corpus ingest: the stateless prefix of
    * [[graft.text.Corpus.cleanIncremental]] as a live stream —
    *
    *   quality gate → (optional) Bloom history filter → watermarked
    *   first-fingerprint-wins dedupe
    *
    * Every stage keeps the scale shape of its batch twin: the quality
    * gate and fingerprint are pure codegen expressions on the scan, the
    * history test is a stateless predicate (no stream-static join, no
    * per-micro-batch history scan), and the only state is the
    * watermark-bounded in-stream fingerprint dedupe. Near-dup clustering
    * is deliberately NOT here: PPJoin + connected components need the
    * whole batch's candidate graph, so the streaming pipeline lands
    * cleaned docs and the nightly `cleanIncremental` run clusters them —
    * the standard lambda split for dedup state too big to keep hot.
    *
    * Emits the input columns plus `fp` (the md5 fingerprint, for
    * downstream history maintenance). Quality failures and duplicates are
    * dropped, not flagged — append-mode streams cannot retract a flag. */
  def streamingClean(docs: DataFrame, textCol: String, tsCol: String,
                     stopwords: Seq[String],
                     historyBloom: Option[Array[Byte]] = None,
                     watermark: String = "1 hour"): DataFrame = {
    val gated = docs
      .where(graft.text.Corpus.qualityKeep(col(textCol), stopwords))
      .withColumn("fp", graft.text.TextOps.fingerprint(col(textCol)))
    val unseen = historyBloom.fold(gated)(b =>
      gated.where(!graft.dedup.Dedup.bloomMightContain(b, col("fp"))))
    // WithinWatermark (not dropDuplicates(fp, ts)): a re-crawled dup
    // carries a DIFFERENT timestamp, so ts must not be part of the key —
    // any same-fp arrival inside the watermark horizon drops, and state
    // still expires at the horizon
    unseen.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("fp"))
  }

  /** Streaming URL-frontier dedup: [[graft.text.UrlOps.canonicalizeUrl]]
    * as a scan-side expression (a pure codegen projection, so it streams
    * unchanged), an optional Bloom of already-crawled canonical URLs as
    * a stateless predicate, then watermarked first-canonical-URL-wins
    * dedupe — the streaming twin of [[graft.text.UrlOps.urlDedupe]]'s
    * keeper rule under arrival order. Same state discipline as
    * [[streamingClean]]: the only state is the watermark-bounded key
    * set; a re-crawl carries a different timestamp, so the key is
    * `url_canon` alone (WithinWatermark semantics). Emits input columns
    * plus `url_canon` for downstream history maintenance. */
  def streamingUrlDedupe(docs: DataFrame, urlCol: String, tsCol: String,
                         historyBloom: Option[Array[Byte]] = None,
                         watermark: String = "1 hour"): DataFrame = {
    val keyed = docs.withColumn("url_canon",
      graft.text.UrlOps.canonicalizeUrl(col(urlCol)))
    val unseen = historyBloom.fold(keyed)(b =>
      keyed.where(!graft.dedup.Dedup.bloomMightContain(b, col("url_canon"))))
    unseen.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("url_canon"))
  }

  /** Streaming domain-blocklist gate — the robots/opt-out check a live
    * crawl frontier runs before fetching: the streaming twin of
    * [[graft.text.UrlOps.domainBlocklistFilter]]. Entirely STATELESS: the
    * host's label-suffix chain is a scan-side HOF over the projected
    * label array, and the verdict is one codegen `arrays_overlap` against
    * the pattern list as an array literal (opt-out lists are rows of
    * domains — driver-list-sized by nature; re-deploy the query to pick
    * up list changes). No stream-static join, no watermark, no state
    * store: the gate adds zero bytes of streaming state and cannot delay
    * the frontier. Emits input columns plus `blocked` (append-safe — a
    * flag never needs retracting); filter `!blocked` for the gate. Same
    * matching rules as the batch form: lowercased, port-blind,
    * dot-boundary suffixes only, blank patterns dropped. */
  def streamingDomainBlocklist(docs: DataFrame, urlCol: String,
                               patterns: Seq[String]): DataFrame = {
    // same loud guard as the batch twin — "same matching rules as the
    // batch form" includes not silently overwriting caller columns
    require(!docs.columns.contains("blocked"),
      "input already has the reserved output column 'blocked'")
    require(!docs.columns.contains("__lbl"),
      "input already has the reserved intermediate column '__lbl'")
    // patterns normalize through the SAME SQL lower(trim(...)) the batch
    // gate applies — inside the expression, not Java trim/toLowerCase:
    // SQL trim strips only U+0020 while String.trim eats all controls,
    // and SQL lower's one-to-one mapping differs from Java's full
    // casefold on e.g. dotted-capital İ — either gap would break the
    // pinned batch==streaming equality on non-ASCII patterns
    val pats = array_distinct(filter(
      transform(typedLit(patterns), p => lower(trim(p))),
      p => length(p) > 0))
    val labels = split(graft.text.UrlOps.urlHost(col(urlCol)), "\\.")
    val suffixes = transform(sequence(lit(0), size(col("__lbl")) - 1),
      i => array_join(slice(col("__lbl"), i + 1, size(col("__lbl")) - i), "."))
    docs.withColumn("__lbl", labels)
      // coalesce: a null URL must report blocked=false like the batch
      // twin's left-join arm, not a NULL that a !blocked filter drops
      .withColumn("blocked",
        coalesce(arrays_overlap(suffixes, pats), lit(false)))
      .drop("__lbl")
  }

  /** One-shot catch-up run into a day-partitioned view — the streaming
    * equivalent of the reference's per-day batch loop. */
  def availableNowWriter(df: DataFrame, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
