package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY checks — the dbt-test/Great-Expectations
  * surface as plain DataFrame operators: each check returns its
  * VIOLATION rows (empty = pass), and [[report]] folds any set of
  * checks into one `(check_name, n_violations)` summary frame a pipeline
  * gates on ([[graft.jobs.DailyCorpusJob]]-style jobs assert it before
  * publishing a day). Violations-as-rows (not assertions) is
  * deliberate: at 100 TB you quarantine and inspect offenders, not
  * re-run a failed boolean.
  *
  * Each check is a single aggregate or anti-join — partial-aggregable,
  * broadcast-friendly, no windows. */
object Checks {

  /** Rows of `keys` groups that occur more than once:
    * `(keys..., n_copies)`. One hash aggregate. */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "uniqueness needs at least one key column")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_copies"))
      .where(col("n_copies") > 1L)
  }

  /** Child rows whose key has no parent — a plain left-anti equi-join
    * (AQE broadcasts a small parent key set). Null child keys are
    * violations too (they reference nothing): anti-join semantics drop
    * them from the join, so they are added back explicitly. */
  def referentialViolations(child: DataFrame, childKeys: Seq[String],
                            parent: DataFrame,
                            parentKeys: Seq[String]): DataFrame = {
    require(childKeys.nonEmpty && childKeys.size == parentKeys.size,
      s"key lists must align: $childKeys vs $parentKeys")
    val parentSet = parent
      .select(parentKeys.zip(childKeys)
        .map { case (p, c) => col(p).as(c) }: _*)
      .distinct()
    val nonNull = childKeys.map(col(_).isNotNull).reduce(_ && _)
    child.where(nonNull)
      .join(parentSet, childKeys, "left_anti")
      .unionByName(child.where(!nonNull))
  }

  /** Rows with a null in any of `cols`. */
  def nullViolations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "null check needs at least one column")
    df.where(cols.map(col(_).isNull).reduce(_ || _))
  }

  /** Rows where `cond` does NOT hold (null counts as a violation —
    * an unevaluable expectation is not a pass). */
  def expectViolations(df: DataFrame, cond: org.apache.spark.sql.Column)
      : DataFrame =
    df.where(!coalesce(cond, lit(false)))

  /** Fold named checks into one `(check_name, n_violations)` frame —
    * each check contributes a 1-row aggregate, unioned. */
  def report(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.map { case (name, v) =>
      v.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }.reduce(_ unionByName _)
  }
}
