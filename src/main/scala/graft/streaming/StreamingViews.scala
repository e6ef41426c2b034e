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
            // fold events in TIME order and split on every gap > gapMillis
            // — both against the carried state and between batch events.
            // Without this, a user whose data keeps arriving would never
            // close a session (the timeout only fires for idle groups),
            // and a single-batch backfill would emit one giant session.
            val closed = scala.collection.mutable.Buffer.empty[SessionSummary]
            var cur = state.getOption
            rows.toSeq.sortBy(_.tsMillis).foreach { e =>
              cur = cur match {
                case Some(s) if e.tsMillis - s.endMillis > gapMillis =>
                  closed += s
                  Some(SessionSummary(userId, 1L, e.value, e.tsMillis, e.tsMillis))
                case Some(s) =>
                  Some(SessionSummary(userId, s.nEvents + 1, s.sumValue + e.value,
                    math.min(s.startMillis, e.tsMillis), math.max(s.endMillis, e.tsMillis)))
                case None =>
                  Some(SessionSummary(userId, 1L, e.value, e.tsMillis, e.tsMillis))
              }
            }
            val open = cur.get
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
