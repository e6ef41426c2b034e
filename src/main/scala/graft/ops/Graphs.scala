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
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), lit(1L).as("w")),
      iterations, dampMilli, weighted = false)

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
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w")),
      iterations, dampMilli, weighted = true)

  private def pageRankFixedImpl(edgesW: DataFrame, iterations: Int,
                                dampMilli: Long,
                                weighted: Boolean): DataFrame = {
    require(iterations >= 1, s"iterations must be positive: $iterations")
    require(dampMilli >= 0L && dampMilli <= 1000L,
      s"dampMilli must be in [0, 1000]: $dampMilli")
    val e0 = if (weighted) edgesW.where(col("w") > 0L) else edgesW
    val e = e0.localCheckpoint(eager = true) // walked every iteration
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = true)
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
      .localCheckpoint(eager = true)
    // n is a driver scalar by necessity (it seeds every rank literal);
    // one count over the node table, not the edges
    val n = nodes.count()
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
