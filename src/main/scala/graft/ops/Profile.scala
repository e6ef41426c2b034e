package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the ANALYZE-style one-pass table summary every
  * ingest pipeline runs before trusting a new source: per column, the
  * row count, null count, EXACT distinct count, and min/max (as
  * strings, for a uniform long schema). Complements
  * [[Comparator.nullCounts]] (wide, null-only) with the long-format
  * full profile, and the HLL sketches ([[graft.udafs.Sketches]]) own
  * the approximate regime when exact distincts are too hot.
  *
  * ONE scan: all columns' aggregates ride a single `agg` — Spark plans
  * the multiple DISTINCT aggregates through one Expand (the standard
  * multi-distinct strategy: the scan is read once and expanded
  * |columns| ways into partial aggregates, all map-side combined),
  * then one `stack` unpivots the single result row to long format —
  * a 1×k row, so the unpivot is free. At 100 TB the Expand factor is
  * the knob: profile the columns you need, not `*`. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such column(s): ${missing.mkString(",")}")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__null_$c`, `__dist_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    row.selectExpr("__n",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_null, n_distinct, min_value, max_value)")
      .select(col("col_name"), col("__n").as("n"), col("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
