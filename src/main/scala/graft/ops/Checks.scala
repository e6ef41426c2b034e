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

  /** Robust per-group outlier annotation by median / MAD (the
    * modified-z-score discipline, integer-exact): each row of
    * `(keyCol, valCol)` comes back as `(key, v, med, mad, outlier)`
    * where `med` is the group's LOWER MEDIAN (the order statistic at
    * rank `⌈n/2⌉` — exact, no interpolated doubles on either engine),
    * `mad` the lower median of `|v − med|`, and
    * `outlier = |v − med|·10 > kDeci · mad`. Median/MAD resist the
    * contamination that wrecks mean/stddev fences: one 10⁹ sentinel in
    * a group shifts a mean-based fence past every real value, while the
    * median never moves — the standard robust screen for sensor
    * glitches, price typos and unit mix-ups. A group that is > 50 %
    * one constant has `mad = 0` and every deviating row flags —
    * that is the textbook caveat, documented rather than papered over.
    *
    * Values must already be integers (scale decimals upstream — a
    * double→long cast TRUNCATES in Spark but ROUNDS in DuckDB, so
    * feeding raw doubles couples results to the engine). Two per-KEY
    * window passes (rank + count share one exchange each) and two
    * key-sized joins — groups hash-partition by key and sorts stream/
    * spill per group, so a skewed key slows only its own partition
    * (AQE-splittable), never a global window. */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
                  kDeci: Long = 50L): DataFrame = {
    require(kDeci >= 1L, s"kDeci must be >= 1: $kDeci")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val inType = df.schema(valCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(inType),
      s"value column `$valCol` must be integral, got $inType — scale " +
        "decimals upstream (a double→long cast truncates in Spark but " +
        "rounds in DuckDB)")
    val v = df.select(col(keyCol).as("k"), col(valCol).cast("long").as("v"))
    def lowerMedian(in: DataFrame, c: String): DataFrame = {
      val w = Window.partitionBy(col("k")).orderBy(col(c))
      in.select(col("k"), col(c),
          row_number().over(w).as("__rn"),
          count(lit(1)).over(Window.partitionBy(col("k"))).as("__cnt"))
        .where(col("__rn") === expr("(__cnt + 1) div 2"))
        .select(col("k"), col(c).as("__m"))
    }
    val med = lowerMedian(v, "v").select(col("k"), col("__m").as("med"))
    val dev = v.join(med, Seq("k"))
      .withColumn("__absdev", abs(col("v") - col("med")))
    val mad = lowerMedian(dev.select(col("k"), col("__absdev")), "__absdev")
      .select(col("k"), col("__m").as("mad"))
    dev.join(mad, Seq("k"))
      .select(col("k").as(keyCol), col("v"), col("med"), col("mad"),
        (col("__absdev") * lit(10L) > lit(kDeci) * col("mad")).as("outlier"))
  }

  /** Functional-dependency violations (`det → dep`): determinant
    * values mapping to MORE than one dependent value — the "one order
    * ships one date", "one user has one country" contract check. One
    * pair-distinct pass + one determinant-keyed aggregate; returns
    * `(det..., n_dep_values, dep_sample_a, dep_sample_b)` for
    * violating determinants only — two concrete witnesses (the
    * extreme dependents, deterministic) so the report is actionable
    * without a second scan. Nulls: a null dependent is a VALUE here
    * (two rows, one null dep + one real, ARE a violation — the
    * contract said one value); null determinants group together like
    * SQL GROUP BY. */
  def fdViolations(df: DataFrame, det: Seq[String],
                   dep: String): DataFrame = {
    require(det.nonEmpty, "need at least one determinant column")
    val k = det.map(col)
    df.select(k :+ col(dep): _*).distinct()
      .groupBy(k: _*)
      .agg(count(lit(1)).as("n_dep_values"),
        min(col(dep)).cast("string").as("dep_sample_a"),
        max(col(dep)).cast("string").as("dep_sample_b"))
      .where(col("n_dep_values") > 1L)
  }

  /** Winsorize at EXACT per-group order statistics — the robust
    * feature-scaling step ([[madOutliers]]' sibling: MAD flags, this
    * clamps): per group, the lower fence is the rank-⌈lo·n/1000⌉ value
    * and the upper the rank-⌈hi·n/1000⌉ value (1-based ascending —
    * never an interpolation, the equi-depth cut discipline), and
    * values clamp into `[lo_fence, hi_fence]`. Integral inputs only
    * (same truncate-vs-round hazard as MAD). Returns every row with
    * the fences and the clamped value — bit-replayable rank
    * arithmetic. Same execution shape as [[madOutliers]]: one
    * window pass per fence table (group-partitioned — for
    * billion-row single groups, feed the KLL sketch quantiles
    * instead and accept the estimate), one group-keyed join back. */
  def winsorize(df: DataFrame, keyCol: String, valCol: String,
                loPermille: Long = 50L, hiPermille: Long = 950L): DataFrame = {
    require(loPermille >= 0L && hiPermille <= 1000L &&
        loPermille < hiPermille,
      s"fences must satisfy 0 <= lo < hi <= 1000: $loPermille, $hiPermille")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val inType = df.schema(valCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(inType),
      s"value column `$valCol` must be integral, got $inType — scale " +
        "decimals upstream")
    val v = df.select(col(keyCol).as("k"), col(valCol).cast("long").as("v"))
    val w = Window.partitionBy(col("k")).orderBy(col("v"))
    val ranked = v.select(col("k"), col("v"),
      row_number().over(w).as("__rn"),
      count(lit(1)).over(Window.partitionBy(col("k"))).as("__cnt"))
    def fence(p: Long, name: String): DataFrame = ranked
      .where(col("__rn") ===
        greatest(expr(s"(__cnt * $p + 999) div 1000"), lit(1L)))
      .select(col("k"), col("v").as(name))
    v.join(fence(loPermille, "lo_fence"), Seq("k"))
      .join(fence(hiPermille, "hi_fence"), Seq("k"))
      .select(col("k").as(keyCol), col("v"),
        col("lo_fence"), col("hi_fence"),
        greatest(col("lo_fence"), least(col("hi_fence"), col("v")))
          .as("v_winsor"))
  }

  /** Benford's-law first-digit permilles (Newcomb 1881 / Benford 1938,
    * P(d) = log₁₀(1 + 1/d)). */
  private[graft] val benfordPermille =
    Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)

  /** Benford first-digit audit — the fraud/fabrication screen for
    * naturally-occurring magnitudes (amounts, populations, counts):
    * observed first-digit distribution of `|⌊value⌋| ≥ 1` beside the
    * Benford expectation, all integer permilles (the irrational
    * log₁₀(1+1/d) is pinned as the standard rounded-permille table).
    * Returns exactly nine rows `(digit, n_obs, obs_permille,
    * exp_permille)` — digits that never occur emit 0 rows rather than
    * vanishing (absence is the loudest Benford violation). The REPORT
    * is the deliverable: whether deviation means fraud or just a
    * non-Benford domain (uniform prices, bounded ids) is the analyst's
    * call, so no verdict column pretends otherwise. One codegen'd
    * projection + one 9-group aggregate + a 1-row broadcast total;
    * corpus-sized input, kilobyte output. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df
      .select(floor(abs(col(valueCol))).cast("long").as("__v"))
      .where(col("__v") >= 1L)
      .select(substring(col("__v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum(col("n_obs")).as("__n"))
    val exp = df.sparkSession.range(1)
      .select(explode(typedLit(
        benfordPermille.zipWithIndex.map { case (p, i) => (i + 1, p) }))
        .as("e"))
      .select(col("e._1").as("digit"), col("e._2").as("exp_permille"))
    exp.join(digits, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        expr("coalesce(n_obs, 0) * 1000 div __n").as("obs_permille"),
        col("exp_permille"))
      .orderBy(col("digit"))
  }
}
