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

  case class SessionEvent(userId: Long, tsMillis: Long, value: Double)
  case class SessionSummary(userId: Long, nEvents: Long, sumValue: Double,
                            startMillis: Long, endMillis: Long)

  /** Custom-state sessionization via `flatMapGroupsWithState`: events are
    * folded into per-user session state; a session closes (and emits a
    * summary row) once the EVENT-TIME watermark passes the session's last
    * event + `gapMillis`. The `KeyValueGroupedDataset` state API is the
    * escape hatch for semantics watermarked aggregation can't express.
    *
    * Event-time (not processing-time) timeouts are deliberate: they are
    * deterministic and replayable — a backfill over historical data closes
    * the same sessions as the live run, and a test can drive closure by
    * advancing the watermark with data instead of sleeping wall-clock.
    * Sessions close two ways: a later event for the SAME user beyond the
    * gap (emitted immediately), or the watermark passing end+gap for an
    * idle user (timeout). `watermarkDelay` is also the out-of-order
    * budget: with the 0 ms default, any cross-batch event older than the
    * watermark is DROPPED by Spark before this function runs — size it to
    * the pipeline's real delivery skew in production. */
  def sessionize(events: Dataset[SessionEvent], gapMillis: Long,
                 watermarkDelay: String = "0 milliseconds"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionSummary, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionSummary]) =>
          if (state.hasTimedOut) {
            val out = state.get
            state.remove()
            Iterator.single(out)
          } else {
            // Merge the carried session and this batch's events as
            // time-sorted intervals, splitting on every gap > gapMillis —
            // between batch events, against the carried state, AND for
            // events OLDER than the carried session start (admitted by a
            // nonzero watermarkDelay): an event more than a gap before the
            // session start closes as its own earlier session instead of
            // extending the session backwards, matching a batch replay of
            // the same data. Without the forward split, a user whose data
            // keeps arriving would never close a session (the timeout only
            // fires for idle groups) and a single-batch backfill would
            // emit one giant session.
            val items = state.getOption.toList ++
              rows.map(e => SessionSummary(userId, 1L, e.value, e.tsMillis, e.tsMillis))
            val sorted = items.sortBy(s => (s.startMillis, s.endMillis))
            val merged = sorted.tail.foldLeft(List(sorted.head)) { (acc, s) =>
              val c = acc.head
              if (s.startMillis - c.endMillis > gapMillis) s :: acc
              else SessionSummary(userId, c.nEvents + s.nEvents,
                c.sumValue + s.sumValue,
                math.min(c.startMillis, s.startMillis),
                math.max(c.endMillis, s.endMillis)) :: acc.tail
            }.reverse
            val open = merged.last
            val closed = merged.init
            state.update(open)
            // setTimeoutTimestamp must stay ahead of the current watermark;
            // late-arriving groups time out on the next batch.
            state.setTimeoutTimestamp(
              math.max(open.endMillis + gapMillis, state.getCurrentWatermarkMs + 1))
            closed.iterator
          }
      }
  }

  /** One-shot catch-up run into a day-partitioned view — the streaming
    * equivalent of the reference's per-day batch loop. */
  def availableNowWriter(df: DataFrame, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
