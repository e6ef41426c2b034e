package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: a persistable per-file min/max manifest over
  * chosen columns, and a manifest-pruned read that opens ONLY the files
  * a range predicate can touch — the Iceberg/Delta data-skipping pattern
  * rebuilt on plain parquet directories.
  *
  * Parquet footers already carry row-group min/max, but at 100 TB the
  * scan still LISTS and OPENS every file to learn it is skippable —
  * planning cost linear in the file count, paid per query. A manifest
  * table inverts that: one build scan amortizes into footer-free
  * planning for every later read, and the file list a query actually
  * opens shrinks to the zones its predicate intersects. On a layout
  * sorted or Z-ordered by the zone columns ([[graft.ops.ZOrder]]), the
  * zones are narrow and pruning approaches partition-level selectivity
  * without the small-partition explosion.
  *
  * The pruning is CONSERVATIVE by construction — a file is dropped only
  * when its zone PROVES no row can match (`max < lo` or `min > hi`;
  * min/max ignore nulls, and a range predicate never matches null) — so
  * `prunedRead` is exactly `read.filter(...)`, cheaper. The manifest is
  * file-count-sized; the pruned file list is collected on the driver
  * (the Iceberg planning step — thousands of entries, never data-sized).
  */
object ZoneMaps {

  /** Build the manifest for `dir` over `cols`: one row per parquet file
    * with `(file, rows)` and, per column c, `c_min`/`c_max` (native
    * type, null iff the file is all-null in c) and `c_nnull` (non-null
    * count). ONE scan of the table produces every zone — a groupBy on
    * `input_file_name()` with map-side partial min/max, exchanging only
    * file-count-sized partials. Persist the result next to the data and
    * hand it to [[prunedRead]]. */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zone maps need at least one column")
    val df = spark.read.parquet(dir)
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        count(col(c)).as(s"${c}_nnull"))
    }
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"), aggs: _*)
  }

  /** The manifest rows whose zone intersects `[lo, hi]` on column `c` —
    * the files a `c BETWEEN lo AND hi` scan must open. Files with a
    * null zone (all-null in c) are dropped: no row in them can satisfy
    * a range predicate. */
  def pruneRange(manifest: DataFrame, c: String, lo: Any, hi: Any): DataFrame =
    manifest.where(col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi))

  /** Read `dir` through the manifest: keep only the files
    * [[pruneRange]] retains for `[lo, hi]` on `c`, then apply the EXACT
    * predicate to the surviving rows — identical to
    * `spark.read.parquet(dir).where(c between lo and hi)` because the
    * pruning is conservative. An empty surviving list short-circuits to
    * an empty frame with the table's schema (no zero-path read error).
    * The file-list collect is manifest-sized (planning metadata, never
    * rows); `basePath` keeps partition-directory columns intact. */
  def prunedRead(spark: SparkSession, dir: String, manifest: DataFrame,
                 c: String, lo: Any, hi: Any): DataFrame = {
    val files = pruneRange(manifest, c, lo, hi)
      .select(col("file")).collect().map(_.getString(0))
    val full = spark.read.option("basePath", dir).parquet(dir)
    val pruned =
      if (files.isEmpty) full.where(lit(false))
      else spark.read.option("basePath", dir).parquet(files.toSeq: _*)
    pruned.where(col(c) >= lit(lo) && col(c) <= lit(hi))
  }

  /** Prune statistics for a predicate — `(files_total, files_kept)` —
    * the observability hook a planner logs to prove skipping works. */
  def pruneStats(manifest: DataFrame, c: String, lo: Any, hi: Any): (Long, Long) =
    (manifest.count(), pruneRange(manifest, c, lo, hi).count())

  /** Incremental manifest maintenance: scan ONLY the files `dir` has
    * that `existing` lacks and union their fresh zones in — the append
    * pattern (a streaming sink, a daily batch drop) pays one scan of
    * the NEW bytes, never a rebuild of the 100 TB history. Files that
    * disappeared (compaction, retention) drop out of the result; the
    * surviving rows carry over byte-identical, so update ∘ update ≡
    * one [[build]] of the final state. `cols` must match the existing
    * manifest's columns (the zone schema is part of the artifact's
    * contract — fail loudly, never a half-schema manifest). */
  def update(spark: SparkSession, dir: String, existing: DataFrame,
             cols: Seq[String]): DataFrame = {
    val expected = "file" +: "rows" +: cols.flatMap(c =>
      Seq(s"${c}_min", s"${c}_max", s"${c}_nnull"))
    require(existing.columns.toSeq == expected,
      s"existing manifest columns ${existing.columns.toSeq} don't match " +
        s"the zone schema for $cols: $expected")
    // inputFiles is a driver-side LISTING (no data scan); manifest keys
    // came from input_file_name() — normalize both to scheme-free paths
    // before comparing (file:///x vs file:/x)
    def norm(f: String): String = new java.net.URI(f).getPath
    val current = spark.read.parquet(dir).inputFiles.map(norm).toSet
    val existingFiles = existing.select(col("file")).collect()
      .map(_.getString(0))
    val fresh = (current -- existingFiles.map(norm)).toArray.sorted
    val keptNames = existingFiles.filter(f => current.contains(norm(f)))
    val kept = existing.join(
      spark.createDataset(keptNames.toSeq)(
        org.apache.spark.sql.Encoders.STRING).toDF("file"),
      Seq("file"), "left_semi")
    if (fresh.isEmpty) kept
    else {
      val df = spark.read.option("basePath", dir)
        .parquet(fresh.toSeq: _*)
      val aggs = cols.flatMap { c =>
        Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
          count(col(c)).as(s"${c}_nnull"))
      }
      kept.unionByName(df.groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("rows"), aggs: _*))
    }
  }
}
