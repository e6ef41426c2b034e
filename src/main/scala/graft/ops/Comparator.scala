package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-diff tool: schema diff, row counts, one-pass per-column null
  * counts, except-based value diff, and a same/different verdict.
  * Reference: src/main/scala/com/mozilla/telemetry/utils/DatasetComparator.scala:40-161.
  *
  * Scale notes: null counts are ONE aggregation pass over each side (not
  * one job per column); the value diff restricts to the common-column
  * projection before `except`, so the shuffle carries only compared data.
  */
object Comparator {

  case class Report(
      leftCount: Long, rightCount: Long,
      columnsOnlyLeft: Seq[String], columnsOnlyRight: Seq[String],
      nullCountsLeft: Map[String, Long], nullCountsRight: Map[String, Long],
      rowsOnlyLeft: Long, rowsOnlyRight: Long,
      rowsMultiplicityDiff: Long) {
    // rowsMultiplicityDiff covers what the EXCEPT-style only-counts miss:
    // [X,X,Y] vs [X,Y,Y] has empty excepts but differing per-row counts
    def same: Boolean =
      leftCount == rightCount && columnsOnlyLeft.isEmpty && columnsOnlyRight.isEmpty &&
        rowsOnlyLeft == 0 && rowsOnlyRight == 0 && rowsMultiplicityDiff == 0
  }

  /** One-pass per-column null counts (A3). */
  def nullCounts(df: DataFrame, cols: Seq[String]): Map[String, Long] = {
    if (cols.isEmpty) return Map.empty
    // coalesce: sum over an EMPTY frame is null, and getLong would NPE
    val aggs = cols.map(c =>
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }

  /** Single-pass row diff: tag-union both sides, group once on a 16-byte
    * PAIR of independently-streamed `xxhash64` fingerprints of the full
    * row, derive (leftCount, rightCount, onlyLeft, onlyRight) from the
    * per-fingerprint multiplicities. ONE shuffle + final reduce, vs the
    * naive count + count + except.count + except.count = 4 jobs /
    * 4 shuffles (`only*` match EXCEPT's distinct semantics).
    *
    * Hashing first keeps the shuffle narrow — 16 bytes per row instead of
    * every column of the table, which at 100 TB is the difference between
    * a diff job and re-shuffling the whole dataset. A SINGLE 64-bit hash
    * was the round-11 advisory: its n²/2⁶⁵ birthday bound reaches ≈3% at
    * 10⁹ distinct rows, each collision silently cancelling an only-left
    * against an only-right row — the paired 128-bit identity pushes that
    * below 10⁻¹⁸ at any realistic scale for 8 extra bytes of shuffle.
    *
    * `xxhash64` SKIPS null fields (seed passes through unchanged) — at
    * every nesting level — and does not encode array boundaries, so a raw
    * hash would conflate rows differing only in which (possibly nested)
    * field is null, or in element grouping ([[1],[2]] vs [[1,2]]). Two
    * defenses: top-level columns get an interleaved `isnull` marker, and
    * complex-typed columns (struct/array/map) are serialized through
    * `to_json` with explicit nulls — a null-distinguishing, boundary-
    * preserving encoding — before hashing. This makes distinct values
    * hash distinctly up to JSON fidelity (binary inside nested types and
    * map key order are the remaining caveats) rather than injectively. */
  /** The diff/checksum row fingerprint: `xxhash64` over the row with
    * interleaved null markers and JSON-serialized complex columns (the
    * null-distinguishing, boundary-preserving encoding [[diffCounts]]
    * documents). COLUMN ORDER is part of the fingerprint — project both
    * sides identically before comparing. */
  def rowFingerprint(df: DataFrame): Column = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val complex = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[StructType] ||
        f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] => f.name
    }.toSet
    def enc(c: String): Column =
      if (complex(c)) to_json(col(c), Map("ignoreNullFields" -> "false"))
      else col(c)
    xxhash64(struct(df.columns.toSeq.flatMap(c => Seq(isnull(col(c)), enc(c))): _*))
  }

  /** Second, independently-streamed 64-bit fingerprint (a salt literal
    * prepended shifts the whole xxhash64 accumulation chain). Grouping by
    * the PAIR gives an effective 128-bit row identity: a single 64-bit
    * hash has ~n²/2⁶⁵ birthday-collision odds — ≈3% at 10⁹ distinct rows,
    * each collision silently conflating an only-left with an only-right
    * row — while the pair pushes it below 10⁻¹⁸ at any realistic scale. */
  private def rowFingerprint2(df: DataFrame): Column = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val complex = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[StructType] ||
        f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] => f.name
    }.toSet
    def enc(c: String): Column =
      if (complex(c)) to_json(col(c), Map("ignoreNullFields" -> "false"))
      else col(c)
    xxhash64(struct(lit("graft-fp2") +:
      df.columns.toSeq.flatMap(c => Seq(isnull(col(c)), enc(c))): _*))
  }

  def diffCounts(lProj: DataFrame, rProj: DataFrame): (Long, Long, Long, Long, Long) = {
    val tagged = lProj.select(rowFingerprint(lProj).as("r"),
        rowFingerprint2(lProj).as("r2"), lit(1).as("side"))
      .unionAll(rProj.select(rowFingerprint(rProj).as("r"),
        rowFingerprint2(rProj).as("r2"), lit(2).as("side")))
    val row = tagged.groupBy(col("r"), col("r2"))
      .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("ln"),
        sum(when(col("side") === 2, 1L).otherwise(0L)).as("rn"))
      // coalesce: zero groups (both inputs empty) sum to null, not 0
      .agg(coalesce(sum(col("ln")), lit(0L)), coalesce(sum(col("rn")), lit(0L)),
        count(when(col("ln") > 0 && col("rn") === 0, 1)),
        count(when(col("rn") > 0 && col("ln") === 0, 1)),
        count(when(col("ln") =!= col("rn"), 1)))
      .head()
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
  }

  /** Both sides' null counts in ONE job over the tag-union (the naive form
    * is one aggregation job per side). */
  def nullCountsBoth(lProj: DataFrame, rProj: DataFrame,
                     cols: Seq[String]): (Map[String, Long], Map[String, Long]) = {
    if (cols.isEmpty) return (Map.empty, Map.empty)
    val tagged = lProj.withColumn("__side", lit(1))
      .unionAll(rProj.withColumn("__side", lit(2)))
    val aggs = cols.flatMap(c => Seq(
      coalesce(sum(when(col(c).isNull && col("__side") === 1, 1L).otherwise(0L)), lit(0L)).as(s"l_$c"),
      coalesce(sum(when(col(c).isNull && col("__side") === 2, 1L).otherwise(0L)), lit(0L)).as(s"r_$c")))
    val row = tagged.agg(aggs.head, aggs.tail: _*).head()
    val l = cols.zipWithIndex.map { case (c, i) => c -> row.getLong(2 * i) }.toMap
    val r = cols.zipWithIndex.map { case (c, i) => c -> row.getLong(2 * i + 1) }.toMap
    (l, r)
  }

  def compare(left: DataFrame, right: DataFrame): Report = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val common = lCols.intersect(rCols)
    val lProj = left.select(common.map(col): _*)
    val rProj = right.select(common.map(col): _*)
    val (lCount, rCount, onlyLeft, onlyRight, multDiff) = diffCounts(lProj, rProj)
    val (nullsL, nullsR) = nullCountsBoth(lProj, rProj, common)
    Report(
      leftCount = lCount,
      rightCount = rCount,
      columnsOnlyLeft = lCols.diff(rCols),
      columnsOnlyRight = rCols.diff(lCols),
      nullCountsLeft = nullsL,
      nullCountsRight = nullsR,
      rowsOnlyLeft = onlyLeft,
      rowsOnlyRight = onlyRight,
      rowsMultiplicityDiff = multDiff)
  }

  /** Report as a 1-row DataFrame (the reference writes this as its JSON
    * result sink, DatasetComparator.scala:53-55). Per-column null counts
    * are surfaced like the reference's report (DatasetComparator.scala:113-123)
    * as "col=n" lists, restricted to columns that actually have nulls. */
  def compareToDF(spark: SparkSession, left: DataFrame, right: DataFrame): DataFrame = {
    val r = compare(left, right)
    def fmtNulls(m: Map[String, Long]): String =
      m.toSeq.filter(_._2 > 0).sortBy(_._1).map { case (c, n) => s"$c=$n" }.mkString(",")
    import spark.implicits._
    Seq((r.leftCount, r.rightCount, r.columnsOnlyLeft.mkString(","),
      r.columnsOnlyRight.mkString(","), fmtNulls(r.nullCountsLeft), fmtNulls(r.nullCountsRight),
      r.rowsOnlyLeft, r.rowsOnlyRight, r.same))
      .toDF("left_count", "right_count", "cols_only_left", "cols_only_right",
        "nulls_left", "nulls_right", "rows_only_left", "rows_only_right", "same")
  }

  /** Per-bucket table checksums — the ANTI-ENTROPY artifact for
    * comparing a 100 TB table against its replica/derived copy without
    * moving rows: `(bucket, n, checksum)` where `checksum` is the SUM
    * of the [[rowFingerprint]]s (order-free, so any partitioning
    * produces the same value) under a caller-supplied bucket expression
    * (a key hash, a day, `key % 1024` — anything both sides compute
    * identically). Publish each side's checksum table (kilobytes),
    * join them ([[checksumDiff]]), and only buckets that DISAGREE need
    * a row-level [[diffCounts]] — the Merkle-tree idea, one level deep,
    * in two aggregates. Multiset-sensitive (a duplicated row changes
    * the sum) but order-blind; differing buckets that sum-collide are
    * the usual 64-bit birthday caveat, amplified by summation —
    * adversarial inputs can cancel, honest drift cannot (documented
    * like [[diffCounts]]'s bound). */
  def bucketChecksums(df: DataFrame, bucket: Column): DataFrame =
    df.groupBy(bucket.cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        // decimal(38,0) accumulator: a sum of ±2⁶³ hashes overflows a
        // long under ANSI after two rows; 38 digits hold ~10¹⁹ rows per
        // bucket before the same cliff (size buckets well before that)
        sum(rowFingerprint(df).cast("decimal(38,0)")).as("checksum"))

  /** Join two [[bucketChecksums]] tables: `(bucket, n_a, n_b,
    * consistent)` per bucket present on EITHER side (absent side counts
    * 0, never consistent). The inputs must have been built over
    * identically-projected rows — column order is part of the
    * fingerprint. */
  def checksumDiff(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bucket"), col("n").as("n_a"), col("checksum").as("__ca"))
      .join(b.select(col("bucket"), col("n").as("n_b"),
        col("checksum").as("__cb")), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        (coalesce(col("n_a"), lit(0L)) === coalesce(col("n_b"), lit(0L)) &&
          col("__ca") <=> col("__cb")).as("consistent"))
}
