package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity screens — the re-identification gates a
  * training-data pipeline runs before a corpus with user-derived fields
  * ships. A row is k-anonymous when its quasi-identifier combination
  * (the columns an adversary can link externally — region, age bucket,
  * segment) is shared by at least k rows; a group is l-diverse when the
  * sensitive column takes at least l distinct values inside it (k alone
  * still leaks when all k rows share the secret). Extension beyond the
  * reference (no privacy surface there).
  *
  * Scale shape: every operator is one quasi-key aggregate plus a
  * flag-back join keyed on the same columns — the corpus-clean
  * discipline (never a window over the quasi key; hot combinations
  * absorb in map-side partials and the join is AQE-skew-splittable).
  * Generalize FIRST ([[generalizeNum]]) — coarser quasi keys both
  * shrink the group count and raise k. */
object Privacy {

  /** Rows whose quasi-identifier combination occurs at least k times —
    * the SUPPRESSION form: under-k rows are dropped entirely. Null is a
    * value (two rows with null region still link to each other), which
    * the null-safe join key preserves. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs at least one quasi column")
    require(k >= 1, s"k must be positive: $k")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__qcount"))
      .where(col("__qcount") >= k)
      .drop("__qcount")
    semiKeep(df, counts, quasiCols)
  }

  /** Null-SAFE semi join on the quasi columns: groupBy above counted the
    * null combination as a real group, so the keep-join must match it
    * too (`<=>`) — a plain equi-join would silently suppress every
    * null-bearing row regardless of its group's size. */
  private def semiKeep(df: DataFrame, keep: DataFrame,
                       quasiCols: Seq[String]): DataFrame = {
    val renamed = quasiCols.foldLeft(keep)(
      (a, c) => a.withColumnRenamed(c, s"__keep_$c"))
    val cond = quasiCols.map(c => col(c) <=> col(s"__keep_$c"))
      .reduce(_ && _)
    df.join(renamed, cond, "left_semi")
  }

  /** Per-combination audit: every quasi-identifier combination with its
    * row count, distinct-sensitive count, and the verdicts —
    * `(quasi..., rows, sensitive_distinct, k_ok, l_ok)`. The report a
    * release review reads; [[kAnonymize]]/[[lDiversify]] enforce it. */
  def anonymityReport(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "the report needs at least one quasi column")
    require(k >= 1 && l >= 1, s"k and l must be positive: k=$k l=$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("rows"),
        count_distinct(col(sensitiveCol)).as("sensitive_distinct"))
      .withColumn("k_ok", col("rows") >= k)
      .withColumn("l_ok", col("sensitive_distinct") >= l)
  }

  /** Rows in groups that are BOTH k-anonymous and l-diverse on the
    * sensitive column — the release filter. Distinct-counting ignores
    * nulls (an all-null secret group has diversity 0, not 1). */
  def lDiversify(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 k: Int, l: Int): DataFrame = {
    val ok = anonymityReport(df, quasiCols, sensitiveCol, k, l)
      .where(col("k_ok") && col("l_ok"))
      .select(quasiCols.map(col): _*)
    semiKeep(df, ok, quasiCols)
  }

  /** Numeric generalization: floor `v` to width-`w` buckets
    * (`(v div w) * w`, exact floor division so negatives bucket down,
    * matching SQL `//`) — the coarsening step that trades precision for
    * anonymity before the quasi key forms. */
  def generalizeNum(df: DataFrame, c: String, w: Long): DataFrame = {
    require(w >= 1L, s"bucket width must be positive: $w")
    // v − pmod(v, w) = floor(v/w)·w in pure 64-bit integer arithmetic
    // (a double round-trip would corrupt beyond 2⁵³)
    df.withColumn(c, col(c).cast("long") - pmod(col(c).cast("long"), lit(w)))
  }
}
