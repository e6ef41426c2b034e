package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Retrieval

/** Daily BM25 index maintenance — the operational form of
  * [[Retrieval.bm25IndexMerge]], mirroring [[DailyCorpusJob]]'s shape
  * for the retrieval artifacts:
  *
  *   1. index the day's docs (`bm25Index` — the only raw-text pass);
  *   2. APPEND the day's postings and doc lengths into the persisted
  *      token-bucketed / plain tables (doc sets are disjoint across
  *      days, so appends ARE the union — and bucketed appends keep the
  *      layout, so every probe join stays exchange-free on the corpus
  *      side, spec-verified);
  *   3. REWRITE the vocab-sized df and 1-row stats tables from the
  *      merged aggregates (cheap at any corpus size; `localCheckpoint`
  *      severs lineage so the rewrite can overwrite its own input).
  *
  * Re-run semantics, stated honestly: unlike [[DailyCorpusJob]]'s
  * dynamic-partition overwrite, plain appends are NOT idempotent — a
  * re-run would double the day's postings. Every appended row carries
  * its `day`, so recovery is a filter-out-and-rewrite of the postings
  * table (or run the same job over a table format with partition-level
  * overwrite); the scoring layer itself is day-agnostic.
  */
object RetrievalIndexJob {

  val PostingsTable = "bm25_postings"
  val DfTable = "bm25_df"
  val DlTable = "bm25_dl"
  val StatsTable = "bm25_stats"

  /** Ingest one day's docs into the persisted index artifacts. */
  def runDay(spark: SparkSession, dayDocs: DataFrame, day: String,
             textCol: String, idCol: String, buckets: Int = 64): Unit = {
    val (post, dfreq, dl, stats) = Retrieval.bm25Index(dayDocs, textCol, idCol)
    val postDay = post.withColumn("day", lit(day))
    val dlDay = dl.withColumn("day", lit(day))
    if (!spark.catalog.tableExists(PostingsTable)) {
      postDay.write.format("parquet")
        .bucketBy(buckets, "token").sortBy("token")
        .saveAsTable(PostingsTable)
      dlDay.write.format("parquet").saveAsTable(DlTable)
      dfreq.write.format("parquet").saveAsTable(DfTable)
      stats.write.format("parquet").saveAsTable(StatsTable)
    } else {
      postDay.write.mode("append").format("parquet")
        .bucketBy(buckets, "token").sortBy("token")
        .saveAsTable(PostingsTable)
      dlDay.write.mode("append").format("parquet").saveAsTable(DlTable)
      val mergedDf = spark.table(DfTable).unionByName(dfreq)
        .groupBy(col("token")).agg(sum(col("df")).as("df"))
        .localCheckpoint(eager = true)
      mergedDf.write.mode("overwrite").format("parquet").saveAsTable(DfTable)
      val mergedStats = spark.table(StatsTable).unionByName(stats)
        .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
        .localCheckpoint(eager = true)
      mergedStats.write.mode("overwrite").format("parquet")
        .saveAsTable(StatsTable)
    }
  }

  /** Score a query suite against the persisted artifacts — no raw-text
    * touch, exchange-free on the postings side. */
  def score(spark: SparkSession, queries: DataFrame,
            textCol: String, idCol: String): DataFrame =
    Retrieval.bm25OddsScoresPrebuilt(
      Retrieval.queryTerms(queries, textCol, idCol),
      spark.table(PostingsTable).drop("day"),
      spark.table(DfTable),
      spark.table(DlTable).drop("day"),
      spark.table(StatsTable))
}
