package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
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

  /** One-shot catch-up run into a day-partitioned view — the streaming
    * equivalent of the reference's per-day batch loop. */
  def availableNowWriter(df: DataFrame, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
