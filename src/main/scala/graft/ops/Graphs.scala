package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality — the graph-based quality-weighting signal of
  * web-corpus pipelines (host/page centrality as a crawl-quality prior,
  * the role harmonic/PageRank centrality plays in Common-Crawl-derived
  * dataset curation). Complements [[graft.dedup.Dedup]]'s connected
  * components (cluster structure) with an IMPORTANCE ranking. Extension
  * beyond the reference (no graph analytics there).
  *
  * The iteration is PageRank in 64-bit FIXED POINT (micro units of a
  * 10¹² total mass): ranks and contributions are longs, every division
  * is a floor `div` of non-negative operands, and long sums are
  * order-independent — so the result is bit-replayable on any ANSI
  * engine (the same discipline as the odds-idf BM25 scorer; doubles
  * would make the fixture gate flake on summation order). Dangling-node
  * mass is dropped rather than redistributed — the standard simplified
  * variant; rank ORDERING of connected structure is unaffected, and
  * redistribution would cost one extra broadcast scalar per iteration
  * if a caller needs stochastic-matrix semantics.
  *
  * Scale shape: one edge-sized pass per iteration — contributions ride
  * a (ranks ⋈ outdeg) node-sized join fanned onto the edge list, then
  * one hash aggregate on `dst`; every exchange keys on node ids, so at
  * 100 TB the edges and rank table pre-bucket on the id
  * (`BatchView.writeBucketed`) and iterations plan exchange-free on
  * the edge side. Each iteration is `localCheckpoint`ed: k iterations
  * stay k linear jobs instead of one exponentially nested plan. */
object Graphs {

  /** Map STRING node keys (hosts, canonical URLs — the web-corpus graph
    * keys the centrality operators exist for) to stable long ids via a
    * collision-checked xxhash64 dictionary. Returns `(mappedEdges,
    * dict)`: the edge frame with `srcCol`/`dstCol` replaced by longs
    * (other columns pass through), and the `(node_id, node_key)`
    * mapping frame to join ranks back to keys.
    *
    * A hash dictionary (not a dense rank) is deliberate at scale: dense
    * ids need a GLOBAL row-number — a single-partition window or a
    * zipWithIndex seam — while the hash is a pure codegen projection
    * and the collision check is one vocab-sized aggregate. A collision
    * among node keys fails LOUDLY (at 10⁹ nodes the 64-bit birthday
    * bound is ~3·10⁻²; rerun with a salt suffix on the keys if one ever
    * fires). Null node keys fail loudly too — an inner-join mapping
    * would silently drop those edges. */
  def withNodeIds(edges: DataFrame, srcCol: String, dstCol: String): (DataFrame, DataFrame) = {
    val e = edges
      .withColumn(srcCol, col(srcCol).cast("string"))
      .withColumn(dstCol, col(dstCol).cast("string"))
      .localCheckpoint(eager = true) // scanned for the guard, dict + mapping
    val nullKeys = e.where(col(srcCol).isNull || col(dstCol).isNull).count()
    require(nullKeys == 0L,
      s"$nullKeys edge rows have null node keys — clean the edge list " +
        "before building the id dictionary")
    val dict = e.select(col(srcCol).as("node_key"))
      .union(e.select(col(dstCol).as("node_key")))
      .distinct()
      .select(xxhash64(col("node_key")).as("node_id"), col("node_key"))
      .localCheckpoint(eager = true)
    val collisions = dict.groupBy(col("node_id"))
      .agg(count(lit(1)).as("c")).where(col("c") > 1L).count()
    require(collisions == 0L,
      s"$collisions xxhash64 collisions among node keys — salt the keys " +
        "(e.g. prefix a constant) and rebuild the dictionary")
    val mapped = e
      .join(dict.select(col("node_key").as(srcCol), col("node_id").as("__src_id")), Seq(srcCol))
      .join(dict.select(col("node_key").as(dstCol), col("node_id").as("__dst_id")), Seq(dstCol))
      .drop(srcCol, dstCol)
      .withColumnRenamed("__src_id", srcCol)
      .withColumnRenamed("__dst_id", dstCol)
    (mapped, dict)
  }

  /** Fixed-point PageRank: `(node, rank_micro)` over the directed edge
    * list, `iterations` synchronous steps at damping `dampMilli`/1000.
    *
    * Per step, all integer:
    * {{{
    * base    = ((1000 − damp) · 10¹²) div 1000 div n
    * contrib = r(u) div outdeg(u)                  // per out-edge
    * r'(v)   = base + (damp · Σ_{u→v} contrib(u)) div 1000
    * }}} */
  def pageRankFixed(edges: DataFrame, srcCol: String, dstCol: String,
                    iterations: Int, dampMilli: Long = 850L): DataFrame =
    pageRankFixedImpl(
      edges.select(tryLong(srcCol).as("src"),
        tryLong(dstCol).as("dst"), lit(1L).as("w")),
      iterations, dampMilli, weighted = false)

  /** `try_cast` (not `cast`): under ANSI a garbage id would throw a
    * generic CAST error mid-job; the null it yields here instead is
    * caught by the impl's guard with the actionable message (use
    * [[withNodeIds]]), and non-ANSI sessions behave identically. */
  private def tryLong(c: String) = expr(s"try_cast(`$c` as bigint)")

  /** Edge-WEIGHTED fixed-point PageRank: a node splits its rank over
    * out-edges proportionally to weight — `contrib(u→v) = (r(u) · w)
    * div W(u)` with `W(u) = Σ out-weights` — the co-occurrence /
    * interaction-strength centrality. Weights must be positive longs;
    * keep them modest (r·w rides an int64: w ≤ ~10⁶ is safe at the
    * 10¹² mass scale). `pageRankFixed` is the all-weights-1 special
    * case of the same iteration. */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, iterations: Int,
                       dampMilli: Long = 850L): DataFrame =
    pageRankFixedImpl(
      edges.select(tryLong(srcCol).as("src"),
        tryLong(dstCol).as("dst"),
        tryLong(weightCol).as("w")),
      iterations, dampMilli, weighted = true)

  private def pageRankFixedImpl(edgesW: DataFrame, iterations: Int,
                                dampMilli: Long,
                                weighted: Boolean): DataFrame = {
    require(iterations >= 1, s"iterations must be positive: $iterations")
    require(dampMilli >= 0L && dampMilli <= 1000L,
      s"dampMilli must be in [0, 1000]: $dampMilli")
    val eAll = edgesW.localCheckpoint(eager = true) // walked every iteration
    // a non-numeric node id (string hosts/URLs — the operator's primary
    // documented use) long-casts to NULL; without this guard every
    // unparseable id would collapse into one null node and the rank
    // table would be silently garbage. Same loud-error discipline as
    // Audience's cardinality guard; one cheap pass over checkpointed data.
    val badIds = eAll.where(col("src").isNull || col("dst").isNull ||
      (if (weighted) col("w").isNull else lit(false))).count()
    require(badIds == 0L,
      s"$badIds edge rows have null node ids/weights after the long cast " +
        "— string node keys? map them through Graphs.withNodeIds first")
    val e = if (weighted) eAll.where(col("w") > 0L) else eAll
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = true)
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
      .localCheckpoint(eager = true)
    // n is a driver scalar by necessity (it seeds every rank literal);
    // one count over the node table, not the edges
    val n = nodes.count()
    require(n > 0L, "edge list is empty" +
      (if (weighted) " (or all weights are non-positive)" else "") +
      " — nothing to rank")
    val init = 1000000000000L / n
    val base = (1000L - dampMilli) * 1000000000000L / 1000L / n
    var ranks = nodes.select(col("node"), lit(init).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = ranks
        .join(outw, ranks("node") === outw("src"))
        .select(col("src"), col("r"), col("outw"))
        .join(e, Seq("src"))
        .select(col("dst"), expr("(r * w) div outw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampMilli * coalesce(s, cast(0 as bigint))) div 1000"))
            .as("r"))
        .localCheckpoint(eager = true)
    }
    ranks.select(col("node"), col("r").as("rank_micro"))
  }
}
