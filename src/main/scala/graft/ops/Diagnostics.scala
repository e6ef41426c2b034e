package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight skew diagnostics — the questions you ask BEFORE keying a
  * 100 TB shuffle: which values of a prospective join/group key are hot,
  * and how unbalanced is the current partitioning.
  *
  * Both are single-aggregate passes. Heavy-key counting is exact
  * (`groupBy(key).count` — map-side partials absorb the very hot keys
  * being hunted) with a TakeOrdered top-k, the same shape as the vocab
  * queries; swap in `approx_top_k` when the key is unbounded-cardinality
  * and ±error is acceptable. */
object Diagnostics {

  /** Top-`k` heaviest values per candidate key column, with counts and
    * corpus fraction: one row (column, value, n, frac) per heavy value,
    * heaviest first. Values are rendered as strings (one report covers
    * mixed-type columns); nulls report as the string "NULL" so they are
    * visible — a null-heavy key is the classic silent straggler. */
  def skewReport(df: DataFrame, keyCols: Seq[String], k: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val total = df.count().toDouble
    keyCols.map { c =>
      df.groupBy(coalesce(col(c).cast("string"), lit("NULL")).as("value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("value"))
        .limit(k)
        .select(lit(c).as("column"), col("value"), col("n"),
          (col("n") / lit(total)).as("frac"))
    }.reduce(_ unionByName _)
  }

  /** Rows per physical partition of the CURRENT distribution — run after
    * a repartition/join to see whether AQE left stragglers. One row per
    * non-empty partition: (partition, n). */
  def partitionStats(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("partition"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc)
}
