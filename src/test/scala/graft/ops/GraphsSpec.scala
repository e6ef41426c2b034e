package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Fixed-point PageRank ([[Graphs]]): bit-equality against a
  * driver-side integer model, plus ranking sanity on known shapes. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  /** The documented integer iteration, replayed sequentially. */
  private def model(edges: Seq[(Long, Long)], iters: Int,
                    damp: Long): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val init = 1000000000000L / n
    val base = (1000L - damp) * 1000000000000L / 1000L / n
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val s = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      r = nodes.map(v => v -> (base + damp * s.getOrElse(v, 0L) / 1000L)).toMap
    }
    r
  }

  test("pageRankFixed matches the driver-side integer model exactly") {
    val rnd = new Random(1234)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val got = Graphs.pageRankFixed(edges.toDF("src", "dst"), "src", "dst",
        iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === model(edges, 4, 850L))
  }

  /** Weighted integer iteration replayed sequentially. */
  private def modelW(edges: Seq[(Long, Long, Long)], iters: Int,
                     damp: Long): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val init = 1000000000000L / n
    val base = (1000L - damp) * 1000000000000L / 1000L / n
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val s = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _, w) => r(u) * w / outw(u) }.sum).toMap
      r = nodes.map(v => v -> (base + damp * s.getOrElse(v, 0L) / 1000L)).toMap
    }
    r
  }

  test("pageRankWeighted matches the model; all-weights-1 equals unweighted") {
    val rnd = new Random(555)
    val edges = (0 until 200).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
        rnd.nextInt(9).toLong + 1L))
      .filter { case (a, b, _) => a != b }
      .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq // unique (src,dst)
    val got = Graphs.pageRankWeighted(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === modelW(edges, 4, 850L))
    // weight 1 everywhere collapses to the unweighted operator exactly
    val ones = edges.map { case (a, b, _) => (a, b, 1L) }
    val viaW = Graphs.pageRankWeighted(ones.toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 3)
      .as[(Long, Long)].collect().toMap
    val plain = Graphs.pageRankFixed(
        ones.map(e => (e._1, e._2)).toDF("src", "dst"), "src", "dst",
        iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(viaW === plain)
  }

  test("weight dominance: the heavier-weighted target accrues more rank") {
    // u 0 links to 1 (weight 9) and 2 (weight 1)
    val edges = Seq((0L, 1L, 9L), (0L, 2L, 1L))
    val ranks = Graphs.pageRankWeighted(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(ranks(1L) > ranks(2L))
  }

  test("string node ids error loudly instead of null-casting to garbage") {
    // without the guard every unparseable id long-casts to null and
    // collapses into ONE node — the rank table would be silently wrong
    val edges = Seq(("example.com", "other.org"), ("other.org", "example.com"))
      .toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graphs.pageRankFixed(edges, "src", "dst", iterations = 1).collect()
    }
    assert(e.getMessage.contains("withNodeIds"))
    val ew = intercept[IllegalArgumentException] {
      Graphs.pageRankWeighted(edges.withColumn("w", lit(1L)),
        "src", "dst", "w", iterations = 1).collect()
    }
    assert(ew.getMessage.contains("withNodeIds"))
  }

  test("an empty edge list errors loudly instead of dividing by zero") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graphs.pageRankFixed(empty, "src", "dst", iterations = 1).collect()
    }
    assert(e.getMessage.contains("empty"))
    // weighted: all-nonpositive weights leave no rankable edge either
    val nonpos = Seq((1L, 2L, 0L), (2L, 3L, -5L)).toDF("src", "dst", "w")
    val ew = intercept[IllegalArgumentException] {
      Graphs.pageRankWeighted(nonpos, "src", "dst", "w",
        iterations = 1).collect()
    }
    assert(ew.getMessage.contains("empty"))
  }

  test("withNodeIds: string-keyed PageRank equals the model through the dictionary") {
    val rnd = new Random(77)
    val hosts = (0 until 30).map(i => s"host$i.example")
    val edges = (0 until 200).map(_ =>
      (hosts(rnd.nextInt(30)), hosts(rnd.nextInt(30))))
      .filter { case (a, b) => a != b }.distinct
    val (mapped, dict) = Graphs.withNodeIds(
      edges.toDF("src", "dst"), "src", "dst")
    // the dictionary is a bijection over the node keys
    val d = dict.as[(Long, String)].collect()
    assert(d.map(_._2).toSet === (edges.map(_._1) ++ edges.map(_._2)).toSet)
    assert(d.map(_._1).distinct.length === d.length)
    val ranks = Graphs.pageRankFixed(mapped, "src", "dst", iterations = 3)
      .join(dict, col("node") === col("node_id"))
      .select(col("node_key"), col("rank_micro"))
      .as[(String, Long)].collect().toMap
    // model over LONG ids via the same dictionary: ids are opaque to the
    // iteration, so keyed results must agree exactly
    val toId = d.map { case (id, k) => k -> id }.toMap
    val want = model(edges.map { case (a, b) => (toId(a), toId(b)) }, 3, 850L)
    assert(ranks.map { case (k, r) => toId(k) -> r } === want)
  }

  test("withNodeIds fails loudly on null node keys") {
    val edges = Seq(("a", "b"), (null, "b")).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graphs.withNodeIds(edges, "src", "dst")
    }
    assert(e.getMessage.contains("null node keys"))
  }

  test("a star hub outranks its spokes; dangling mass just leaks") {
    // spokes 1..5 all link to hub 0; hub links nowhere (dangling)
    val edges = (1L to 5L).map(u => (u, 0L))
    val ranks = Graphs.pageRankFixed(edges.toDF("src", "dst"), "src", "dst",
        iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(u => ranks(0L) > ranks(u)))
    assert((1L to 5L).map(ranks).toSet.size === 1, "spokes tie exactly")
    // total mass only shrinks (floor divisions + dropped dangling mass)
    assert(ranks.values.sum <= 1000000000000L)
  }
}
