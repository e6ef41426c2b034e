package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate STRING matching — the entity-resolution / fuzzy-dedup
  * capability that complements the token-level near-dup family
  * (MinHash/SimHash work on token sets; edit distance catches
  * character-level noise: typos, OCR errors, transliteration drift —
  * the record-linkage shape every ingest pipeline hits on names, titles
  * and identifiers). Extension beyond the reference (its string utils
  * stop at normalization, e.g. utils/package.scala's camelize/snakify).
  *
  * Scale shape — the classic blocking discipline: an unblocked fuzzy
  * join is O(|A|·|B|) string comparisons, dead at any scale. Candidates
  * here must share a cheap EQUI-JOIN key (a character suffix — chosen
  * over a prefix because shared prefixes are how structured identifiers
  * and titles pile up in one block) plus a length band, so the pairs
  * that reach the edit-distance kernel are block-bounded and the join
  * itself is a plain hash join on the block key. The kernel is Spark's
  * built-in `levenshtein` WITH the threshold argument — the banded
  * O(len·maxDist) early-exit form, not the full O(len²) matrix.
  *
  * Blocking trades recall, stated plainly: a pair whose edits touch the
  * suffix lands in different blocks and is never compared (the standard
  * multi-pass answer — union a second pass on a prefix or sorted-
  * neighborhood key — composes by unioning two calls' outputs).
  */
object Fuzzy {

  /** Suffix-blocked edit-distance join: `(id_a, id_b, dist)` for every
    * cross-set pair sharing the last-`suffixLen`-chars block whose
    * lengths differ by ≤ `lenTol` and whose Levenshtein distance is
    * ≤ `maxDist`. `dist` is the exact distance (the threshold only
    * bounds the kernel's work). */
  def blockedEditJoin(a: DataFrame, aText: String, aId: String,
                      b: DataFrame, bText: String, bId: String,
                      suffixLen: Int, lenTol: Int, maxDist: Int): DataFrame = {
    require(suffixLen >= 1, s"suffixLen must be positive: $suffixLen")
    require(lenTol >= 0 && maxDist >= 0, "tolerances must be non-negative")
    val left = a.select(col(aId).as("id_a"), col(aText).as("s_a"),
      substring(col(aText), -suffixLen, suffixLen).as("__blk"))
    val right = b.select(col(bId).as("id_b"), col(bText).as("s_b"),
      substring(col(bText), -suffixLen, suffixLen).as("__blk"))
    // length band BEFORE the kernel: a length gap > maxDist can never
    // pass, and the cheap filter keeps the banded kernel off those pairs
    val d = levenshtein(col("s_a"), col("s_b"), maxDist)
    left.join(right, Seq("__blk"))
      .where(abs(length(col("s_a")) - length(col("s_b"))) <= lit(lenTol))
      .select(col("id_a"), col("id_b"), d.as("dist"))
      .where(col("dist") >= 0) // threshold form returns -1 above maxDist
  }

  /** Self-join form for fuzzy DEDUP candidate pairs: `(id_a, id_b,
    * dist)` with `id_a < id_b` (each unordered pair once, no self
    * pairs). Feed the pairs into [[graft.dedup.Dedup]]'s connected
    * components for cluster assignment — same composition as the
    * MinHash/SimHash families. */
  def editDistancePairs(df: DataFrame, textCol: String, idCol: String,
                        suffixLen: Int, lenTol: Int, maxDist: Int): DataFrame =
    blockedEditJoin(df, textCol, idCol, df, textCol, idCol,
      suffixLen, lenTol, maxDist)
      .where(col("id_a") < col("id_b"))

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    * second standard blocking pass, recovering exactly the pairs a
    * character-block pass can miss (edits touching the block key):
    * rows are totally ordered by `(text, id)` and every row is paired
    * with its next `window` neighbors in that order, then the banded
    * kernel filters to `dist ≤ maxDist`. Union with
    * [[editDistancePairs]] for the classic multi-pass candidate set.
    *
    * Shape: NO global window function — the total order comes from a
    * range repartition + within-partition sort and `zipWithIndex`
    * (deterministic: range boundaries and partition-local indices are
    * functions of the data), and the neighbor pairing is a `sequence`
    * explode (×window) equi-joined on position — the rolling-actives
    * fan-out pattern, so hot regions split across tasks and candidate
    * volume is exactly n·window. */
  def sortedNeighborPairs(df: DataFrame, textCol: String, idCol: String,
                          window: Int, maxDist: Int,
                          numPartitions: Int = 32): DataFrame = {
    require(window >= 1, s"window must be positive: $window")
    val spark = df.sparkSession
    val sorted = df
      .select(col(textCol).cast("string").as("s"), col(idCol).cast("long").as("id"))
      .repartitionByRange(numPartitions, col("s"), col("id"))
      .sortWithinPartitions(col("s"), col("id"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val withPos = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row(
          if (r.isNullAt(0)) null else r.getString(0),
          if (r.isNullAt(1)) null else r.getLong(1), i)
      }, schema)
    val d = levenshtein(col("s_a"), col("s_b"), maxDist)
    withPos
      .select(col("id").as("id_a"), col("s").as("s_a"),
        explode(sequence(col("pos") + 1L, col("pos") + window.toLong))
          .as("__tgt"))
      .join(withPos.select(col("id").as("id_b"), col("s").as("s_b"),
        col("pos").as("__tgt")), Seq("__tgt"))
      .select(col("id_a"), col("id_b"), d.as("dist"))
      .where(col("dist") >= 0)
  }
}
