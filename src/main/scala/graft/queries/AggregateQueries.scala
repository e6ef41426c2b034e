package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.udafs.{CollectOps, MapAggregators, SearchCounts, Sketches}

/** Query surface for the custom-aggregate suite (SURVEY.md §2.4 A5-A10,
  * §2.6 O1, F12). The testdata tables carry no map/array columns, so each
  * query constructs them in-flight (map()/struct()/array()) and unnests the
  * aggregate result back to plain rows — which keeps every aggregator
  * oracle-checkable by plain SQL.
  */
object AggregateQueries {
  type Q = (SparkSession, String) => DataFrame

  private lazy val mapSum   = udaf(new MapAggregators.MapSum())
  private lazy val mapFirst = udaf(new MapAggregators.MapFirst())

  val queries: Map[String, Q] = Map(
    // ───── A6: AggMapSum — pointwise map sum, exploded back to rows ─────
    "q13_map_sum" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), map(col("event_type"), lit(1L)).as("m"))
        .groupBy(col("user_id"))
        .agg(mapSum(col("m")).as("summed"))
        .select(col("user_id"), explode(col("summed")).as(Seq("key", "n")))
        .orderBy(col("user_id"), col("key"))
    }),

    // ───── A5: AggMapFirst — first non-null per key. "First" is encounter
    // order (nondeterministic after a shuffle, as in the reference), so for
    // oracle determinism the input is pre-reduced to one row per (user, key)
    // with min_by(ts); MapFirst then merges disjoint maps — same aggregator
    // path, order-independent result at any scale. ─────
    "q14_map_first" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min_by(col("props"), col("ts")).as("first_props"))
        .select(col("user_id"), map(col("event_type"), col("first_props")).as("m"))
        .groupBy(col("user_id"))
        .agg(mapFirst(col("m")).as("firsts"))
        .select(col("user_id"), explode(col("firsts")).as(Seq("key", "first_props")))
        .orderBy(col("user_id"), col("key"))
    }),

    // ───── A7: AggRowFirst — dedupe rows by id field, keeping the first in
    // sorted-array order. That order is exactly min(struct(...)), so the
    // query needs ONE hash aggregate and never materializes a per-user
    // array (rowFirstByPos stays as the operator form for callers that
    // already hold array columns; AggregatorsSpec covers it). ─────
    "q15_row_first" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(struct(col("event_id"), col("event_type"), col("value"))).as("first"))
        .select(col("user_id"), col("event_type"),
          col("first.event_id").as("first_event_id"), col("first.value").as("first_value"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // ───── A9/O1: CollectList — null-retaining sorted top-k collect ─────
    "q16_collect_top3" -> ((s, d) => {
      val cols = CollectOps.sortedCollect(
        Seq(col("value"), col("event_id")),
        Seq("event_ids" -> col("event_id"), "values" -> col("value")),
        maxLength = 3)
      val collected = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(cols.head, cols.tail: _*)
      collected
        .select(col("user_id"),
          posexplode(arrays_zip(col("event_ids"), col("values"))).as(Seq("pos", "z")))
        .select(col("user_id"), (col("pos") + 1).as("rnk"),
          col("z.event_ids").as("event_id"), col("z.values").as("value"))
        .orderBy(col("user_id"), col("rnk"))
    }),

    // ───── A8: AggSearchCounts — filtered pivot-sum over struct arrays ─────
    "q17_search_counts" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("user_id"),
        array(struct(col("event_type").as("engine"), col("event_type").as("source"),
          lit(1L).as("count"))).as("searches"))
      SearchCounts.aggregate(e, Seq("user_id"), "searches", "search",
          Seq("click", "view", "purchase"))
        .orderBy(col("user_id"))
    }),

    // ───── A10: HLL sketch create → merge → estimate (no SQL oracle:
    // DuckDB's approx_count_distinct is a different sketch; accuracy is
    // asserted in ScalaTest instead) ─────
    "q18_hll_cardinality" -> ((s, d) => {
      val perType = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(Sketches.hllSketch(col("user_id")).as("sk"))
      perType
        .agg(Sketches.hllCardinality(Sketches.hllMerge(col("sk"))).as("est_users"))
        .select(col("est_users"))
    }),

    // ───── A10: FilteredHyperLogLogMerge — condition-gated sketch union
    // (rows-only like q18; exact anchor = q40, accuracy in ScalaTest) ─────
    "q39_hll_filtered_merge" -> ((s, d) => {
      val perType = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(Sketches.hllSketch(col("user_id")).as("sk"))
      perType
        .agg(Sketches.hllCardinality(
          Sketches.hllMergeFiltered(
            col("event_type").isin("click", "view"), col("sk"))).as("est_users"))
        .select(col("est_users"))
    }),

    // ───── exact-distinct anchor for the q39 filtered-merge shape ─────
    "q40_filtered_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .where(col("event_type").isin("click", "view"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // ───── derived-oracle anchor for q18/q39: the exact distinct counts
    // are honestly cross-checked against DuckDB, and the `*_ok` columns
    // are DOCUMENTED BOUNDED CHECKS (the oracle pins the expected
    // verdicts): the HLL estimate — both the plain merge and the
    // condition-gated filtered merge — must land within 3% of its exact
    // count. At gate-scale cardinalities the DataSketches HLL is still in
    // its exact sparse regime, so the bound is tight there and a real
    // accuracy gate at any scale. ─────
    "q63_hll_verify" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val perType = ev.groupBy(col("event_type"))
        .agg(Sketches.hllSketch(col("user_id")).as("sk"))
      val ests = perType.agg(
        Sketches.hllCardinality(Sketches.hllMerge(col("sk"))).as("__est"),
        Sketches.hllCardinality(Sketches.hllMergeFiltered(
          col("event_type").isin("click", "view"), col("sk"))).as("__est_f"))
      val exacts = ev.agg(
        countDistinct(col("user_id")).as("n_users_exact"),
        countDistinct(when(col("event_type").isin("click", "view"),
          col("user_id"))).as("n_filtered_exact"))
      exacts.crossJoin(ests).select(
        col("n_users_exact"), col("n_filtered_exact"),
        (abs(col("__est") - col("n_users_exact")) <=
          col("n_users_exact") * 0.03).as("hll_ok"),
        (abs(col("__est_f") - col("n_filtered_exact")) <=
          col("n_filtered_exact") * 0.03).as("hll_filtered_ok"))
    }),

    // ───── AGMS join-size estimation gate (the q63 bounded-anchor
    // shape): exact |orders_even ⋈ lineitem| on the orderkey honestly
    // computed on both engines; the sketch estimate — deterministic
    // under the fixed seed — must sit inside the 4σ AGMS band
    // (est − exact)²·width ≤ 16·F₂a·F₂b, pinned TRUE ─────
    "q186_join_size" -> ((s, d) => {
      import graft.udafs.JoinSize
      val oc = Tables.orders(s, d).where(col("o_orderkey") % 2 === 0)
        .groupBy(col("o_orderkey").cast("string").as("k"))
        .agg(count(lit(1)).as("na"))
      val lc = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").cast("string").as("k"))
        .agg(count(lit(1)).as("nb"))
      val skA = oc.agg(
        JoinSize.agmsAgg(col("k"), col("na"), 7, 2048, 42).as("ska"),
        sum(col("na") * col("na")).as("f2a"))
      val skB = lc.agg(
        JoinSize.agmsAgg(col("k"), col("nb"), 7, 2048, 42).as("skb"),
        sum(col("nb") * col("nb")).as("f2b"))
      val exact = oc.join(lc, Seq("k"))
        .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("exact_n"))
      exact.crossJoin(skA).crossJoin(skB)
        .select(col("exact_n"),
          JoinSize.estimateCol(col("ska"), col("skb")).as("__est"),
          col("f2a"), col("f2b"))
        .select(col("exact_n"),
          ((col("__est") - col("exact_n")) * (col("__est") - col("exact_n"))
            * lit(2048L) <= lit(16L) * col("f2a") * col("f2b"))
            .as("within_band"))
    }),

    // ───── exact-distinct anchor for the same shape as q18 ─────
    "q19_count_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // ───── F12: bucketed(value, splits) ─────
    "q20_bucketed" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(Sketches.bucketed(col("l_quantity"), Seq(10, 20, 30, 40, 50)).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q186_join_size" ->
      """WITH oc AS (SELECT CAST(o_orderkey AS VARCHAR) AS k,
                       CAST(count(*) AS BIGINT) AS na
                     FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
          lc AS (SELECT CAST(l_orderkey AS VARCHAR) AS k,
                   CAST(count(*) AS BIGINT) AS nb
                 FROM lineitem GROUP BY 1)
          SELECT CAST(COALESCE((SELECT sum(oc.na * lc.nb)
                                FROM oc JOIN lc ON oc.k = lc.k), 0)
            AS BIGINT) AS exact_n,
          TRUE AS within_band""",
    "q13_map_sum" ->
      """SELECT user_id, event_type AS key, COUNT(*) AS n
         FROM events GROUP BY user_id, event_type ORDER BY user_id, key""",
    "q14_map_first" ->
      """SELECT user_id, event_type AS key, arg_min(props, ts) AS first_props
         FROM events GROUP BY user_id, event_type ORDER BY user_id, key""",
    "q15_row_first" ->
      """SELECT user_id, event_type, arg_min(event_id, event_id) AS first_event_id,
         arg_min(value, event_id) AS first_value
         FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""",
    "q16_collect_top3" ->
      """SELECT user_id, CAST(rn AS INT) AS rnk, event_id, value FROM (
           SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
           FROM events) WHERE rn <= 3 ORDER BY user_id, rnk""",
    "q17_search_counts" ->
      """SELECT user_id,
         CAST(SUM(CASE WHEN event_type IN ('click','view','purchase') THEN 1 ELSE 0 END) AS BIGINT) AS search_all,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS search_click,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS search_view,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS search_purchase
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q19_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q40_filtered_distinct" ->
      """SELECT COUNT(DISTINCT user_id) AS n_users
         FROM events WHERE event_type IN ('click','view')""",
    // exact counts honest; *_ok pin the expected HLL-accuracy verdicts
    "q63_hll_verify" ->
      """SELECT COUNT(DISTINCT user_id) AS n_users_exact,
         COUNT(DISTINCT CASE WHEN event_type IN ('click','view') THEN user_id END) AS n_filtered_exact,
         true AS hll_ok, true AS hll_filtered_ok
         FROM events""",
    "q20_bucketed" ->
      """SELECT CAST(CASE WHEN l_quantity <= 10 THEN 10.0 WHEN l_quantity <= 20 THEN 20.0
                WHEN l_quantity <= 30 THEN 30.0 WHEN l_quantity <= 40 THEN 40.0
                WHEN l_quantity <= 50 THEN 50.0 ELSE 51.0 END AS DOUBLE) AS bucket,
         COUNT(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY bucket"""
  )
}
