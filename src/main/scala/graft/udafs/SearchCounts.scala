package graft.udafs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A8 — filtered pivot-sum over an array-of-structs column.
  *
  * Reference: src/main/scala/com/mozilla/telemetry/utils/udfs/AggSearchCounts.scala:10-86 —
  * input `Array[Struct{engine, source, count}]`; per group, sums `count`
  * for rows with `count > 0` and `source` in an allowlist into a struct
  * `{prefix_all, prefix_src1, …}`.
  *
  * Spark-first: explode is unnecessary — per-row partial sums via `aggregate`
  * higher-order functions would also work, but the clearest scale-friendly
  * plan is conditional aggregation, which gets map-side partial aggregation
  * for free (one shuffle, no UDAF).
  */
object SearchCounts {

  /** Sum of `count` over array elements with count > 0 whose source passes
    * `sourcePred`. */
  private def sumFor(arr: Column, sourcePred: Column => Column): Column = {
    val matches = filter(arr, s =>
      s.getField("count") > 0 && sourcePred(s.getField("source")))
    coalesce(org.apache.spark.sql.functions.aggregate(
      matches, lit(0L), (acc, s) => acc + s.getField("count")), lit(0L))
  }

  /** Per-row pivot columns: `prefix_all` + one `prefix_<source>` each.
    * `all` counts ONLY allowlisted sources, like the reference — its UDAF
    * bumps the `all` bucket inside the `validSources.contains(source)`
    * branch (AggSearchCounts.scala:64-71), so an unknown source contributes
    * to nothing. */
  def pivotColumns(arr: Column, prefix: String, validSources: Seq[String]): Seq[Column] =
    sumFor(arr, src => src.isin(validSources.map(lit): _*)).as(s"${prefix}_all") +:
      validSources.map(s => sumFor(arr, src => src === s).as(s"${prefix}_$s"))

  /** Grouped form: group by `keys`, summing the per-row pivots — partial
    * aggregation keeps the shuffle narrow (one long per source per group). */
  def aggregate(df: DataFrame, keys: Seq[String], arrCol: String, prefix: String,
                validSources: Seq[String]): DataFrame = {
    val perRow = df.select(keys.map(col) ++ pivotColumns(col(arrCol), prefix, validSources): _*)
    val sums = (s"${prefix}_all" +: validSources.map(s => s"${prefix}_$s"))
      .map(c => sum(col(c)).as(c))
    perRow.groupBy(keys.map(col): _*).agg(sums.head, sums.tail: _*)
  }
}
