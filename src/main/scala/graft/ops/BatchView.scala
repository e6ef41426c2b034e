package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Day-partitioned "batch view" writer/reader (SURVEY.md §2.1 K1-K3, §1).
  *
  * The reference materializes each day by constructing the partition path
  * manually and overwriting it (reference: SyncView.scala:87-103, with the
  * rationale comment at :88-98 — `partitionBy` in Spark 2 couldn't
  * overwrite a single day). Spark 3+ dynamic partition overwrite replaces
  * that trick: `partitionBy(dayCol)` + `partitionOverwriteMode=dynamic`
  * rewrites ONLY the partitions present in the incoming data — same
  * idempotent re-run semantics, no path arithmetic.
  *
  * Scale settings baked in:
  *  - `maxRecordsPerFile` bounds file size instead of `repartition(1)`
  *    (reference: MainEventsView.scala:59) — a single-task write is a
  *    scale bottleneck; AQE coalescing keeps file counts low without one;
  *  - `_SUCCESS` markers off via the output-committer config (reference
  *    deletes them post-hoc, MainEventsView.scala:65-66).
  */
object BatchView {

  /** Versioned view root: `<base>/<name>/v<version>`. */
  def viewPath(base: String, name: String, version: Int): String =
    s"$base/$name/v$version"

  def write(df: DataFrame, base: String, name: String, version: Int,
            partitionCols: Seq[String], maxRecordsPerFile: Long = 5000000L): Unit = {
    val spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "snappy")
      .partitionBy(partitionCols: _*)
      .parquet(viewPath(base, name, version))
  }

  /** Read a view; partition-column predicates prune directories via
    * Catalyst (`PruneFileSourcePartitions`) — the Spark-native form of the
    * reference's path-constructed day reads. */
  def read(spark: SparkSession, base: String, name: String, version: Int,
           mergeSchema: Boolean = false): DataFrame =
    spark.read.option("mergeSchema", mergeSchema.toString)
      .parquet(viewPath(base, name, version))
}
