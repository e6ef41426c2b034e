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

  /** UTC day bounds as nanos-since-epoch (the LongType branch of the
    * `ts` contract; see [[dayRange]]). */
  def dayBoundsNanos(day: String): (Long, Long) = {
    val start = LocalDate.parse(day, fmt).atStartOfDay(ZoneOffset.UTC).toEpochSecond * 1000000000L
    (start, start + 24L * 3600 * 1000000000L)
  }

  /** Pushdown-preserving filter for `ts ∈ [fromDay 00:00, toDayExcl 00:00)`
    * UTC, dispatched on the column's physical type (the testdata has
    * stored `ts` both as TIMESTAMP(NANOS)→LongType and as
    * timestamp[us]→TIMESTAMP_NTZ across regenerations). The comparison
    * stays on the RAW column against literals of its own type — never a
    * conversion expression on the column side, which would strand the
    * filter above the scan (`PushedFilters` must show the ts range; each
    * daily run reads only its day's row groups at 100 TB). */
  def dayRange(events: DataFrame, fromDay: String, toDayExcl: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    events.schema("ts").dataType match {
      case LongType =>
        val lo = dayBoundsNanos(fromDay)._1
        val hi = dayBoundsNanos(toDayExcl)._1
        col("ts") >= lo && col("ts") < hi
      case TimestampNTZType =>
        val lo = LocalDate.parse(fromDay, fmt).atStartOfDay()
        val hi = LocalDate.parse(toDayExcl, fmt).atStartOfDay()
        col("ts") >= lit(lo) && col("ts") < lit(hi)
      case _ =>
        val lo = LocalDate.parse(fromDay, fmt).atStartOfDay(ZoneOffset.UTC).toInstant
        val hi = LocalDate.parse(toDayExcl, fmt).atStartOfDay(ZoneOffset.UTC).toInstant
        col("ts") >= lit(lo) && col("ts") < lit(hi)
    }
  }

  private def nextDay(day: String): String =
    LocalDate.parse(day, fmt).plusDays(1).format(fmt)

  override def transform(spark: SparkSession, inputDir: String, day: String): DataFrame = {
    val e = Tables.events(spark, inputDir)
    e.where(dayRange(e, day, nextDay(day)))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
  }
}
