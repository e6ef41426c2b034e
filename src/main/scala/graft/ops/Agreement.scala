package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the QA gate on human-labeled data
  * (preference pairs, quality labels, safety annotations) before it
  * trains or evaluates anything: a label set whose raters don't agree
  * above chance is noise, and the pipeline must measure that BEFORE
  * the labels fan out into training mixtures.
  *
  * Both statistics are computed in EXACT INTEGERS (chance-corrected
  * agreement is a ratio of two integer-valued sums once multiplied
  * through by the marginal denominators), with the final micro-unit
  * ratio on the shifted floor-division (the
  * [[Timeseries.autocorr]] discipline: |κ| ≤ 1, so a +2·10⁶ shift
  * keeps the numerator non-negative and truncate == floor on both
  * engines) — bit-replayable, no libm.
  *
  * Long-regime bound: terms reach `10⁶ · (N·R)²`; exact through
  * ~2·10⁶ annotation rows (ANSI sessions fail loudly past it — lift
  * to DECIMAL beyond, which no human-annotation table reaches).
  */
object Agreement {

  /** Inline null gate: grouping silently turns a NULL item/rater/label
    * into its own group — an agreement score over them would be
    * confidently wrong, so the scan fails loudly instead. */
  private def loud(c: Column, what: String): Column =
    when(c.isNull, raise_error(lit(
      s"Agreement: null $what — clean the annotation table first")))
      .otherwise(c.cast("string"))

  /** Fleiss' κ (Fleiss 1971) over a LONG-form annotation table — one
    * row per (item, rater, label), every item rated by the SAME number
    * of raters R ≥ 2 (the statistic's own requirement; unequal counts
    * or a duplicate (item, rater) pair fail loudly — silently averaging
    * over them is how agreement numbers lie).
    *
    * Returns ONE row: `(n_items, n_raters, n_categories, kappa_num,
    * kappa_den, kappa_micro)` where with `A = Σ_items Σ_labels n_il²`,
    * `C_j` the per-label totals, and `NR = n_items·R`:
    * {{{
    * kappa_num = (A − NR)·NR − (R−1)·ΣC_j²          // κ numerator · NR(R−1)(NR)²⁻¹…
    * kappa_den = (R−1)·((NR)² − ΣC_j²)              // …same scale: κ = num/den exactly
    * }}}
    * `kappa_den = 0` means every rating used one category — chance
    * agreement is 1 and κ is undefined: NULL, not an invented 0.
    *
    * Scale shape: two partial-aggregable hash aggregates over the
    * annotation table (per-(item,label) cells + per-(item,rater) dup
    * guard), then label-count- and 1-row-sized frames only. */
  def fleissKappa(ann: DataFrame, itemCol: String, raterCol: String,
                  labelCol: String): DataFrame = {
    val src = ann.select(loud(col(itemCol), "item").as("i"),
      loud(col(raterCol), "rater").as("r"), loud(col(labelCol), "label").as("l"))
    val cells = src.groupBy(col("i"), col("l"))
      .agg(count(lit(1)).as("n_il"))
    val items = cells.groupBy(col("i"))
      .agg(sum(col("n_il")).as("r_i"),
        sum(col("n_il") * col("n_il")).as("sq_i"))
    val itemStats = items.agg(count(lit(1)).as("n_items"),
      min(col("r_i")).as("rmin"), max(col("r_i")).as("rmax"),
      sum(col("sq_i")).as("a"))
    val labelStats = cells.groupBy(col("l"))
      .agg(sum(col("n_il")).as("c_j"))
      .agg(sum(col("c_j") * col("c_j")).as("sumc2"),
        count(lit(1)).as("n_categories"))
    val dupStats = src.groupBy(col("i"), col("r"))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("maxdup"))
    // ALL guards live inside the one R expression every value column
    // reads: a caller selecting only kappa_micro lets column pruning
    // drop any guard that lives in a sibling column (the passAtK
    // lesson) — threading R through kappa_num/kappa_den makes the
    // raise_error un-prunable wherever a kappa value survives.
    val rGuarded =
      when(col("maxdup") > 1L, raise_error(lit("fleissKappa: duplicate " +
          "(item, rater) rating rows — dedupe or re-key the table")))
        .when(col("n_items") === 0L, raise_error(lit(
          "fleissKappa: empty annotation table — nothing to agree on")))
        .when(col("rmin") =!= col("rmax"), raise_error(concat(
          lit("fleissKappa: items rated by between "),
          col("rmin").cast("string"),
          lit(" and "), col("rmax").cast("string"),
          lit(" raters — Fleiss requires a constant rater count; " +
            "filter to fully-rated items first, or use " +
            "krippendorffAlpha, the incomplete-design statistic"))))
        .when(col("rmin") < 2L, raise_error(lit(
          "fleissKappa: needs at least 2 raters per item")))
        .otherwise(col("rmax"))
    itemStats.crossJoin(labelStats).crossJoin(dupStats)
      .select(
        rGuarded.as("__r"),
        // n_items keeps its own dup guard (as pre-refactor): selecting
        // ONLY n_items must still raise on a duplicate-keyed table
        when(col("maxdup") > 1L, raise_error(lit("fleissKappa: duplicate " +
            "(item, rater) rating rows — dedupe or re-key the table")))
          .otherwise(col("n_items")).as("n_items"),
        col("n_categories"), col("a"), col("sumc2"))
      .select(
        col("n_items"),
        col("__r").as("n_raters"),
        col("n_categories"),
        ((col("a") - col("n_items") * col("__r")) *
          (col("n_items") * col("__r")) -
          (col("__r") - 1L) * col("sumc2")).as("kappa_num"),
        ((col("__r") - 1L) *
          ((col("n_items") * col("__r")) * (col("n_items") * col("__r")) -
            col("sumc2"))).as("kappa_den"))
      .select(col("n_items"), col("n_raters"), col("n_categories"),
        col("kappa_num"), col("kappa_den"),
        when(col("kappa_den") > 0L,
          expr("(kappa_num * 1000000 + 2000000 * kappa_den) " +
            "div kappa_den - 2000000")).as("kappa_micro"))
  }

  /** Krippendorff's α (nominal metric; Krippendorff 2011, "Computing
    * Krippendorff's Alpha-Reliability") over a LONG-form annotation
    * table — the INCOMPLETE-design statistic [[fleissKappa]]'s
    * unequal-rater error points at: real annotation tables are rarely
    * fully crossed (raters rotate, items get 2–5 ratings), and α is the
    * standard agreement measure that handles exactly that. Items with
    * fewer than 2 ratings carry no agreement information and are
    * DROPPED (α's own convention — reported in `n_items` so the drop is
    * visible, never silent).
    *
    * Computation (coincidence-matrix form, nominal weights): per kept
    * item `A_i = n_i² − Σ_c c_ic²` (ordered disagreeing pairs), and with
    * `n = Σ n_i`, `n_c` the per-label totals over kept items:
    * {{{
    * D_o ∝ Σ_i A_i/(n_i−1)        — observed disagreement
    * D_e ∝ (n² − Σ_c n_c²)/(n−1)  — chance disagreement
    * α = 1 − D_o/D_e
    * }}}
    * Integer discipline: the per-item 1/(n_i−1) weights have no common
    * denominator in an incomplete design, so each item's term is scaled
    * to micro units with ONE floor div (`do_scaled = Σ 10⁶·A_i div
    * (n_i−1)` — deterministic, bit-replayable, ≤1 micro-unit
    * quantization per item against the true rational; the exact-rational
    * route of [[fleissKappa]] needs the constant-R special case).
    * `alpha_micro = 10⁶ − ((n−1)·do_scaled) div de_num` with
    * `de_num = n² − Σn_c²`; `de_num = 0` (one category used) → NULL.
    *
    * Returns ONE row: `(n_items, n_ratings, n_categories, do_scaled,
    * de_num, alpha_micro)`. Duplicate (item, rater) rows and null fields
    * fail loudly — guards threaded through every value column (the
    * pruning-hazard discipline). Long-regime bound: `(n−1)·do_scaled` ≈
    * 2·10⁶·n² — exact through ~2·10⁶ ratings, ANSI fails loudly past.
    * Scale shape: two partial-aggregable hash aggregates over the
    * annotation table + one item-keyed join, then label-count- and
    * 1-row-sized frames only. */
  def krippendorffAlpha(ann: DataFrame, itemCol: String, raterCol: String,
                        labelCol: String): DataFrame = {
    val src = ann.select(loud(col(itemCol), "item").as("i"),
      loud(col(raterCol), "rater").as("r"), loud(col(labelCol), "label").as("l"))
    val cells = src.groupBy(col("i"), col("l"))
      .agg(count(lit(1)).as("c"))
    val items = cells.groupBy(col("i"))
      .agg(sum(col("c")).as("n_i"), sum(col("c") * col("c")).as("sq"))
    val kept = items.where(col("n_i") >= 2L)
    val itemTot = kept.agg(count(lit(1)).as("n_items"),
      coalesce(sum(col("n_i")), lit(0L)).as("n_ratings"),
      coalesce(sum(expr(
        "(1000000L * (n_i * n_i - sq)) div (n_i - 1)")), lit(0L))
        .as("do_scaled"))
    val labelTot = cells.join(kept.select(col("i")), Seq("i"))
      .groupBy(col("l")).agg(sum(col("c")).as("n_c"))
      .agg(coalesce(sum(col("n_c") * col("n_c")), lit(0L)).as("sumc2"),
        count(lit(1)).as("n_categories"))
    val dupStats = src.groupBy(col("i"), col("r"))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("maxdup"))
    // guards applied to EVERY value column (un-prunable wherever an α
    // value survives — the fleissKappa discipline)
    def guard(c: Column): Column =
      when(col("maxdup") > 1L, raise_error(lit("krippendorffAlpha: " +
          "duplicate (item, rater) rating rows — dedupe or re-key the table")))
        .when(col("n_items") === 0L, raise_error(lit(
          "krippendorffAlpha: no item has 2 or more ratings — " +
            "nothing to measure agreement on")))
        .otherwise(c)
    // the counts too (n_items / n_categories): a bare item count from a
    // duplicate-keyed table is still a lie, and column pruning would
    // drop a guard living only in the sibling value columns (the
    // fleissKappa n_items treatment)
    itemTot.crossJoin(labelTot).crossJoin(dupStats)
      .select(guard(col("n_items")).as("n_items"),
        guard(col("n_ratings")).as("n_ratings"),
        guard(col("n_categories")).as("n_categories"),
        guard(col("do_scaled")).as("do_scaled"),
        guard(col("n_ratings") * col("n_ratings") - col("sumc2"))
          .as("de_num"))
      .select(col("n_items"), col("n_ratings"), col("n_categories"),
        col("do_scaled"), col("de_num"),
        when(col("de_num") > 0L, expr(
          "1000000L - ((n_ratings - 1) * do_scaled) div de_num"))
          .as("alpha_micro"))
  }

  /** Krippendorff's α with the INTERVAL metric — [[krippendorffAlpha]]
    * for NUMERIC ratings (Likert quality scores, 1–10 harmlessness
    * grades: the dominant LLM-annotation shape), where disagreement is
    * squared distance `(x−y)²`, not mere inequality: raters saying 4 vs
    * 5 agree far more than 1 vs 5, and the nominal metric can't see it.
    * Same incomplete-design contract: items with <2 ratings drop
    * visibly; duplicate (item, rater) rows and null values fail loudly.
    *
    * Coincidence form over kept items (per item `S1=Σx, S2=Σx²`, so the
    * ordered-pair squared-distance sum is `A_i = 2(n_i·S2_i − S1_i²)`):
    * {{{
    * D_o ∝ Σ_i A_i/(n_i−1)                — micro-scaled per item
    * D_e ∝ 2(n·ΣX² − (ΣX)²)/(n−1)         — all-pairs squared distance
    * α = 1 − D_o/D_e
    * }}}
    * Returns ONE row: `(n_items, n_ratings, n_values, do_scaled, de_num,
    * alpha_micro)`; `de_num = 0` (all ratings one value) → NULL. Exact
    * integers with the per-item micro floor ([[krippendorffAlpha]]'s
    * documented quantization). Long-regime bound: terms reach
    * `10⁶·n²·v²` for rating magnitude v — exact through ~10⁶ ratings on
    * a 1–10 scale (ANSI fails loudly past); keep ratings in small
    * integer scales, which is what interval α is FOR. Scale shape:
    * identical to the nominal form — two partial-aggregable hash
    * aggregates, then 1-row frames. */
  def krippendorffAlphaInterval(ann: DataFrame, itemCol: String,
                                raterCol: String, valueCol: String)
      : DataFrame = {
    // non-integral ratings would silently TRUNCATE through the long
    // cast (4.5 → 4, skewing α) while every other misuse fails loudly —
    // so fractional values get the same loud treatment; interval α is
    // for small integer scales by its own long-regime bound
    val vLoud = when(col(valueCol).isNull, raise_error(lit(
        "Agreement: null value — clean the annotation table first")))
      .when(col(valueCol).cast("double") =!=
          floor(col(valueCol).cast("double")).cast("double"),
        raise_error(concat(lit("krippendorffAlphaInterval: non-integral " +
          "rating "), col(valueCol).cast("string"),
          lit(" — scale to integers first (e.g. half-points ×2); the " +
            "integer discipline cannot truncate silently"))))
      .otherwise(col(valueCol).cast("long"))
    val src = ann.select(loud(col(itemCol), "item").as("i"),
      loud(col(raterCol), "rater").as("r"), vLoud.as("v"))
    val items = src.groupBy(col("i"))
      .agg(count(lit(1)).as("n_i"), sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
    val kept = items.where(col("n_i") >= 2L)
    val itemTot = kept.agg(count(lit(1)).as("n_items"),
      coalesce(sum(col("n_i")), lit(0L)).as("n_ratings"),
      coalesce(sum(col("s1")), lit(0L)).as("gs1"),
      coalesce(sum(col("s2")), lit(0L)).as("gs2"),
      coalesce(sum(expr(
        "(1000000L * (2 * (n_i * s2 - s1 * s1))) div (n_i - 1)")), lit(0L))
        .as("do_scaled"))
    // kept items only — the same universe every other output column
    // describes (the nominal twin's n_categories does likewise)
    val valueTot = src.join(kept.select(col("i")), Seq("i"))
      .agg(countDistinct(col("v")).as("n_values"))
    val dupStats = src.groupBy(col("i"), col("r"))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("maxdup"))
    def guard(c: Column): Column =
      when(col("maxdup") > 1L, raise_error(lit("krippendorffAlphaInterval: " +
          "duplicate (item, rater) rating rows — dedupe or re-key the table")))
        .when(col("n_items") === 0L, raise_error(lit(
          "krippendorffAlphaInterval: no item has 2 or more ratings — " +
            "nothing to measure agreement on")))
        .otherwise(c)
    // n_items / n_values guarded too — the nominal-twin discipline
    itemTot.crossJoin(valueTot).crossJoin(dupStats)
      .select(guard(col("n_items")).as("n_items"),
        guard(col("n_ratings")).as("n_ratings"),
        guard(col("n_values")).as("n_values"),
        guard(col("do_scaled")).as("do_scaled"),
        guard(lit(2L) * (col("n_ratings") * col("gs2") -
          col("gs1") * col("gs1"))).as("de_num"))
      .select(col("n_items"), col("n_ratings"), col("n_values"),
        col("do_scaled"), col("de_num"),
        when(col("de_num") > 0L, expr(
          "1000000L - ((n_ratings - 1) * do_scaled) div de_num"))
          .as("alpha_micro"))
  }

  /** Krippendorff's α with the ORDINAL metric — the textbook-correct
    * choice for Likert-style RANKED labels (1–5 quality grades), which
    * completes the α family: nominal ([[krippendorffAlpha]]) ignores
    * closeness entirely, interval ([[krippendorffAlphaInterval]])
    * assumes equal spacing, ordinal weighs a (c, k) disagreement by the
    * squared CUMULATIVE-MARGINAL distance (Krippendorff 2011 §E):
    * {{{
    * δ_ck = ( Σ_{g=c..k} n_g − (n_c + n_k)/2 )²
    * }}}
    * — how many RATINGS apart the two categories sit in the observed
    * distribution, so sparse middle categories compress and heavy ones
    * stretch the scale. Same incomplete-design contract as the
    * siblings: items with <2 ratings drop visibly; duplicate
    * (item, rater) rows, null fields and non-integral values fail
    * loudly (values must be integers — their ORDER is all that is
    * used, but the loud integral gate keeps 4.5-style half-points from
    * silently truncating).
    *
    * Integer discipline: positions are normalized to micro units of
    * the total rating mass — `e_ck = (10⁶·(2·Σ_{c..k} n_g − n_c −
    * n_k)) div (2n)` (ONE floor, ≤1 micro of the [0, 1] scale) — and
    * the weight `w_ck = e_ck²` is exact (≤ 10¹²; the uniform 1/(2n)²
    * normalization cancels in D_o/D_e). Because the weights carry a
    * 10¹² scale, EVERY downstream sum — the per-item
    * `A_i = 2·Σ_{c<k} n_ic·n_ik·w_ck`, the global D_o accumulation,
    * the chance side `de_num = 2·Σ_{c<k} n_c·n_k·w_ck`, and the final
    * combine — rides DECIMAL(38) exactly (DuckDB replays them as
    * HUGEINT); the only 64-bit step is the per-item `A_i div (n_i−1)`
    * floor (exact while a SINGLE item has ≲10⁶ raters, absurd-proof;
    * its quantization loses <1 w-unit per item — far below micro
    * resolution):
    * {{{
    * alpha_micro = 10⁶ − (10⁶·(n−1)·D_o) div de_num
    * }}}
    * Returns ONE row: `(n_items, n_ratings, n_values, do_scaled,
    * de_scaled, alpha_micro)` — the two REPORTING columns are the
    * DECIMAL accumulators floored to long (`do_scaled` exceeds 64
    * bits only past ~4·10⁶ ratings and then fails loudly;
    * `alpha_micro` itself is computed from the decimals and is exact
    * far beyond); `de_num = 0` (one value used) → NULL. On the
    * q260-style graded fixture this lands within 1 micro of the
    * exact-rational α (AgreementSpec pins the quantization).
    *
    * Scale shape: two partial-aggregable hash aggregates over the
    * annotation table, an item-keyed self-join of the per-item CELL
    * table (≤ V cells per item — the pair expansion is per-item V²,
    * bounded by the category alphabet, never corpus²), and a
    * category-sized weight frame built on ONE row (no global window —
    * the cumulative marginal rides a sorted collect_list over ≤ V
    * categories) broadcast back as a V²-row equi-join. */
  def krippendorffAlphaOrdinal(ann: DataFrame, itemCol: String,
                               raterCol: String, valueCol: String)
      : DataFrame = {
    val vLoud = integralLoud(valueCol, "krippendorffAlphaOrdinal")
    // e_ck = (10⁶ · (2·Σ_{g=c..k} n_g − n_c − n_k)) div (2n): the
    // cumulative-marginal position distance in micro units of n
    alphaPairWeighted(ann, itemCol, raterCol, vLoud,
      "krippendorffAlphaOrdinal", (p, fld, rangeSum, n) =>
        call_function("div",
          lit(1000000L) * (lit(2L) * rangeSum(p) -
            fld(p, "ai", "n_g") - fld(p, "bi", "n_g")),
          lit(2L) * n))
  }

  /** Krippendorff's α with the RATIO metric — the fourth and last
    * standard member of the α family (nominal / ordinal / interval /
    * ratio), for ZERO-ANCHORED scales where relative error is what
    * matters: error counts, durations, token budgets. Disagreement is
    * the squared RELATIVE distance (Krippendorff 2011 §E):
    * {{{
    * δ_xy = ((x − y) / (x + y))²
    * }}}
    * so raters saying 1-vs-2 disagree exactly as much as 10-vs-20 (the
    * invariant AgreementSpec pins — interval α cannot express it).
    * Values must be non-negative integers (a ratio scale has a true
    * zero; negatives fail loudly, like nulls/duplicates/fractions).
    *
    * Integer discipline: the weight is `w_xy = e_xy²` with
    * `e_xy = (10⁶·(y−x)) div (x+y)` — one floor, ≤1 micro of the
    * [0, 1] relative-distance scale; within 1 micro of the exact
    * rational α on the gate fixture. Unlike [[krippendorffAlphaOrdinal]]
    * the weights need no cumulative marginal (they depend only on the
    * value pair), but the distribution shape is identical: a
    * category-sized weight table built on ONE row, broadcast back as a
    * V²-row equi-join against the per-item cell pairs (per-item V²,
    * never corpus²), with every w-scaled sum in DECIMAL(38)/HUGEINT
    * (the [[krippendorffAlphaOrdinal]] overflow discipline — the
    * per-item div is the single 64-bit step). Returns ONE row
    * `(n_items, n_ratings,
    * n_values, do_scaled, de_scaled, alpha_micro)`; `de_num = 0` →
    * NULL. Two partial-aggregable hash aggregates + one item-keyed
    * self-join; scan volume unbounded. */
  def krippendorffAlphaRatio(ann: DataFrame, itemCol: String,
                             raterCol: String, valueCol: String)
      : DataFrame = {
    val vLoud = when(col(valueCol) < 0,
        raise_error(concat(lit("krippendorffAlphaRatio: negative rating "),
          col(valueCol).cast("string"),
          lit(" — a ratio scale has a true zero; use the interval or " +
            "ordinal metric for signed values"))))
      .otherwise(integralLoud(valueCol, "krippendorffAlphaRatio"))
    // e_xy = (10⁶ · (y − x)) div (x + y): the relative distance in
    // micro units (reads only the value pair — no cumulative walk)
    alphaPairWeighted(ann, itemCol, raterCol, vLoud,
      "krippendorffAlphaRatio", (p, fld, _, _) =>
        call_function("div",
          lit(1000000L) * (fld(p, "bi", "v") - fld(p, "ai", "v")),
          fld(p, "ai", "v") + fld(p, "bi", "v")))
  }

  /** The loud integral-value gate shared by the numeric α metrics:
    * nulls and fractional ratings (which the long cast would silently
    * truncate) both raise. */
  private def integralLoud(valueCol: String, fname: String): Column =
    when(col(valueCol).isNull, raise_error(lit(
        "Agreement: null value — clean the annotation table first")))
      .when(col(valueCol).cast("double") =!=
          floor(col(valueCol).cast("double")).cast("double"),
        raise_error(concat(lit(s"$fname: non-integral rating "),
          col(valueCol).cast("string"),
          lit(" — scale to integers first (e.g. half-points ×2); the " +
            "integer discipline cannot truncate silently"))))
      .otherwise(col(valueCol).cast("long"))

  /** Shared machinery for the PAIR-WEIGHTED α metrics (ordinal, ratio):
    * identical incomplete-design staging to the nominal/interval twins
    * (cells → kept items → marginals, loud dup/empty guards threaded
    * through every output column), with the caller supplying only the
    * micro-normalized pair distance `e` — evaluated per ORDERED value
    * pair on the ONE-row sorted-marginal frame (≤ V categories from a
    * bounded `collect_list`; no single-partition window), squared into
    * the weight `w = e²` (exact, ≤ 10¹²) and broadcast back as a
    * V²-row equi-join against the per-item cell pairs (per-item V²,
    * never corpus²). Every w-scaled sum — per-item A_i, the global
    * D_o, the chance side, the final combine — rides DECIMAL(38)
    * (HUGEINT in the oracles); the per-item `A_i div (n_i−1)` floor is
    * the single 64-bit step (exact while one item has ≲10⁶ raters). */
  private def alphaPairWeighted(ann: DataFrame, itemCol: String,
      raterCol: String, vLoud: Column, fname: String,
      eOf: (Column, (Column, String, String) => Column,
            Column => Column, Column) => Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val src = ann.select(loud(col(itemCol), "item").as("i"),
      loud(col(raterCol), "rater").as("r"), vLoud.as("v"))
    val cells = src.groupBy(col("i"), col("v"))
      .agg(count(lit(1)).as("c"))
    val items = cells.groupBy(col("i")).agg(sum(col("c")).as("n_i"))
    val kept = items.where(col("n_i") >= 2L)
    val cellsK = cells.join(kept, Seq("i"))
    val itemTot = kept.agg(count(lit(1)).as("n_items"),
      coalesce(sum(col("n_i")), lit(0L)).as("n_ratings"))
    val valueTot = src.join(kept.select(col("i")), Seq("i"))
      .agg(countDistinct(col("v")).as("n_values"))
    val dupStats = src.groupBy(col("i"), col("r"))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("maxdup"))
    // category marginals collapsed to ONE sorted row — the cumulative
    // sums a window would compute, without the single-partition window
    // the plan gate forbids (V is the category alphabet, ≤ dozens)
    val mgRow = cellsK.groupBy(col("v")).agg(sum(col("c")).as("n_g"))
      .agg(sort_array(collect_list(struct(col("v"), col("n_g")))).as("arr"),
        coalesce(sum(col("n_g")), lit(0L)).as("n"))
    val vCount = size(col("arr"))
    val allIdx = flatten(transform(sequence(lit(1), vCount), a =>
      transform(sequence(lit(1), vCount), b =>
        struct(a.as("ai"), b.as("bi")))))
    def fld(p: Column, idx: String, f: String): Column =
      element_at(col("arr"), p(idx).cast("int"))(f)
    def rangeSum(p: Column): Column =
      aggregate(slice(col("arr"), p("ai"), p("bi") - p("ai") + 1),
        lit(0L), (acc, x) => acc + x("n_g"))
    val ePairs = transform(filter(allIdx, p => p("bi") > p("ai")), p =>
      struct(fld(p, "ai", "v").as("vc"), fld(p, "bi", "v").as("vk"),
        fld(p, "ai", "n_g").as("na"), fld(p, "bi", "n_g").as("nb"),
        eOf(p, fld, rangeSum, col("n")).as("e")))
    val pairsRow = mgRow.select(
      when(vCount < 2,
          array().cast("array<struct<vc:bigint,vk:bigint," +
            "na:bigint,nb:bigint,e:bigint>>"))
        .otherwise(ePairs).as("pairs"))
    val weightTbl = pairsRow
      .select(explode(col("pairs")).as("p"))
      .select(col("p")("vc").as("vc"), col("p")("vk").as("vk"),
        col("p")("na").as("na"), col("p")("nb").as("nb"),
        (col("p")("e") * col("p")("e")).as("w"))
    val deRow = weightTbl.agg(
      coalesce(sum(lit(2).cast(dec38) * col("na") * col("nb") * col("w")),
        lit(0).cast(dec38)).as("de_num"))
    val ca = cellsK.select(col("i"), col("n_i"), col("v").as("va"),
      col("c").as("ca"))
    val cb = cellsK.select(col("i"), col("v").as("vb"), col("c").as("cb"))
    // A_i accumulates in DECIMAL (terms reach ca·cb·10¹²); the per-item
    // div floors back to long (exact while one item has ≲10⁶ raters),
    // and the global D_o re-accumulates in DECIMAL
    val doRow = ca.join(cb, Seq("i")).where(col("va") < col("vb"))
      .join(broadcast(weightTbl),
        col("va") === col("vc") && col("vb") === col("vk"))
      .groupBy(col("i"))
      .agg(max(col("n_i")).as("n_i"),
        sum(lit(2).cast(dec38) * col("ca") * col("cb") * col("w")).as("a2"))
      .agg(coalesce(sum(
        call_function("div", col("a2"), col("n_i") - 1L).cast(dec38)),
        lit(0).cast(dec38)).as("do_dec"))
    def guard(c: Column): Column =
      when(col("maxdup") > 1L, raise_error(lit(s"$fname: " +
          "duplicate (item, rater) rating rows — dedupe or re-key the table")))
        .when(col("n_items") === 0L, raise_error(lit(
          s"$fname: no item has 2 or more ratings — " +
            "nothing to measure agreement on")))
        .otherwise(c)
    itemTot.crossJoin(valueTot).crossJoin(doRow).crossJoin(deRow)
      .crossJoin(dupStats)
      .select(guard(col("n_items")).as("n_items"),
        guard(col("n_ratings")).as("n_ratings"),
        guard(col("n_values")).as("n_values"),
        guard(call_function("div", col("do_dec"),
          lit(1L).cast(dec38))).as("do_scaled"),
        guard(call_function("div", col("de_num"),
          lit(1000000L).cast(dec38))).as("de_scaled"),
        guard(when(col("de_num") > 0,
          lit(1000000L) - call_function("div",
            (lit(1000000L) * (col("n_ratings") - 1L)).cast(dec38) *
              col("do_dec"),
            col("de_num")))).as("alpha_micro"))
  }

  /** Per-annotator agreement-with-consensus report — the operational
    * follow-up to a low κ: WHICH rater diverges. Consensus per item is
    * the modal label with deterministic ties (highest votes, then
    * lexicographically smallest label — the replayable `min_by` argmax
    * over `(-votes, label)`); each rater then scores
    * `(rater, n_items, n_majority, agree_micro = 10⁶·agree div n)`.
    * A rater that disagrees with consensus everywhere scores 0 even
    * when κ is moderate — this is the table a re-training decision
    * reads. Unlike [[fleissKappa]], unequal per-item rater counts are
    * FINE (consensus is per-item); duplicate (item, rater) rows and
    * null fields still fail loudly. Three partial-aggregable hash
    * aggregates + one item-keyed join; no windows. */
  def annotatorReport(ann: DataFrame, itemCol: String, raterCol: String,
                      labelCol: String): DataFrame = {
    val src = ann.select(loud(col(itemCol), "item").as("i"),
      loud(col(raterCol), "rater").as("r"), loud(col(labelCol), "label").as("l"))
    val dedup = src.groupBy(col("i"), col("r"))
      .agg(count(lit(1)).as("c"), min(col("l")).as("l"))
      .select(col("i"),
        when(col("c") > 1L, raise_error(concat(
            lit("annotatorReport: duplicate (item, rater) rating for item "),
            col("i"), lit(", rater "), col("r"))))
          .otherwise(col("r")).as("r"),
        col("l"))
    val majority = src.groupBy(col("i"), col("l"))
      .agg(count(lit(1)).as("__v"))
      .groupBy(col("i"))
      .agg(min_by(struct((-col("__v")).as("nv"), col("l").as("a")),
        struct((-col("__v")).as("nv"), col("l").as("a"))).as("__top"))
      .select(col("i"), col("__top")("a").as("__maj"))
    dedup.join(majority, Seq("i"))
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("l") === col("__maj"), 1L).otherwise(0L))
          .as("n_majority"))
      .select(col("r").as("rater"), col("n_items"), col("n_majority"),
        expr("(1000000 * n_majority) div n_items").as("agree_micro"))
  }

  /** Cohen's κ (Cohen 1960) over a WIDE two-rater table — one row per
    * item with both raters' labels. The two-annotator special case
    * keeps each rater's OWN marginal (Fleiss pools them), which is the
    * right chance model when the two raters are systematically
    * different (a model judge vs a human, the common LLM-eval pairing).
    *
    * Returns ONE row: `(n_items, n_agree, pe_num, kappa_num, kappa_den,
    * kappa_micro)` with `pe_num = Σ_j C_aj·C_bj`:
    * {{{
    * kappa_num = n_agree·N − pe_num      // (p_o − p_e) · N²
    * kappa_den = N² − pe_num             // (1 − p_e) · N²
    * }}}
    * `kappa_den = 0` (both raters constant and identical) → NULL.
    * Null labels fail loudly. Scale shape: one count + two
    * marginal aggregates (category-sized), one category join. */
  def cohenKappa(pairs: DataFrame, labelACol: String, labelBCol: String)
      : DataFrame = {
    val src = pairs.select(loud(col(labelACol), "label_a").as("la"),
      loud(col(labelBCol), "label_b").as("lb"))
    val base = src.agg(count(lit(1)).as("n_items"),
      sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_agree"))
    val margA = src.groupBy(col("la")).agg(count(lit(1)).as("ca"))
    val margB = src.groupBy(col("lb")).agg(count(lit(1)).as("cb"))
    val pe = margA.join(margB, col("la") === col("lb"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("pe_num"))
    // guard inside the N every value column reads (the fleissKappa
    // pruning hazard): selecting only kappa_micro must still raise on
    // an empty table, not return a silent NULL
    val nGuarded = when(col("n_items") === 0L, raise_error(lit(
        "cohenKappa: empty annotation table — nothing to agree on")))
      .otherwise(col("n_items"))
    base.crossJoin(pe)
      .select(
        nGuarded.as("__n"),
        col("n_agree"), col("pe_num"))
      .select(
        col("__n").as("n_items"),
        col("n_agree"), col("pe_num"),
        (col("n_agree") * col("__n") - col("pe_num")).as("kappa_num"),
        (col("__n") * col("__n") - col("pe_num")).as("kappa_den"))
      .select(col("n_items"), col("n_agree"), col("pe_num"),
        col("kappa_num"), col("kappa_den"),
        when(col("kappa_den") > 0L,
          expr("(kappa_num * 1000000 + 2000000 * kappa_den) " +
            "div kappa_den - 2000000")).as("kappa_micro"))
  }
}
