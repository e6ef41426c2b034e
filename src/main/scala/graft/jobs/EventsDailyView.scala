package graft.jobs

import java.time.{LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Demo view job: daily per-(user, event_type) rollup of the events table —
  * the reference's view pattern (a `main` that backfills day-partitioned
  * aggregates, e.g. views/MainEventsView.scala) composed from this repo's
  * pieces: Tables scan → day filter → one-shuffle aggregate →
  * BatchView dynamic-partition overwrite.
  *
  * The day filter is a closed-form range on the raw nanos column, so it
  * pushes down to the parquet scan (`PushedFilters: [GreaterThanOrEqual(ts,..),
  * LessThan(ts,..)]`) — each daily run reads only that day's row groups,
  * which is what makes per-day backfill viable at 100 TB.
  */
object EventsDailyView extends BatchJob {

  override def jobName: String = "events_daily"

  private val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** UTC day bounds as nanos-since-epoch (events.ts is TIMESTAMP(NANOS),
    * surfaced as LongType under nanosAsLong). */
  def dayBoundsNanos(day: String): (Long, Long) = {
    val start = LocalDate.parse(day, fmt).atStartOfDay(ZoneOffset.UTC).toEpochSecond * 1000000000L
    (start, start + 24L * 3600 * 1000000000L)
  }

  override def transform(spark: SparkSession, inputDir: String, day: String): DataFrame = {
    val (lo, hi) = dayBoundsNanos(day)
    Tables.events(spark, inputDir)
      .where(col("ts") >= lo && col("ts") < hi)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
  }
}
