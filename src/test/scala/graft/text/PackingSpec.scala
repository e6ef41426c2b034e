package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing: the distributed prefix sum against a sequential
  * scan, the concat-and-chunk map against a straight-line reference
  * packer, and the materialized-text composition. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference: walk docs in id order carrying a running
    * token offset; emit every (doc, seq) slice. */
  private def referencePack(docs: Seq[(Long, Long)], capacity: Long): Seq[(Long, Long, Long, Long, Long)] = {
    var cum = 0L
    docs.sortBy(_._1).flatMap { case (id, n) =>
      val slices = if (n <= 0) Seq.empty else {
        val s0 = cum / capacity
        val s1 = (cum + n - 1) / capacity
        (s0 to s1).map { seq =>
          val docStart = math.max(seq * capacity - cum, 0L)
          val docEnd = math.min(n, (seq + 1) * capacity - cum)
          val seqStart = math.max(cum - seq * capacity, 0L)
          (id, seq, docStart, docEnd, seqStart)
        }
      }
      if (n > 0) cum += n
      slices
    }
  }

  test("withExclusivePrefixSum equals a sequential scan under many partitions") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(50).toLong))
    val df = spark.createDataFrame(rows).toDF("id", "n").repartition(13)
    val got = Packing.withExclusivePrefixSum(df, "id", col("n"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (id, n) => val c = acc; acc += n; (id, c) }
    assert(got.toSeq == want)
  }

  test("packSequences matches the straight-line packer on random corpora") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val cap = Seq(7L, 64L, 1000L)(trial)
      // lengths span 0, tiny, about-capacity, many-times-capacity
      val docs = (0L until 200L).map(i => (i, rnd.nextInt(3) match {
        case 0 => rnd.nextInt(5).toLong
        case 1 => (cap - 2 + rnd.nextInt(5)).max(0)
        case _ => (cap * (1 + rnd.nextInt(4)) + rnd.nextInt(10))
      }))
      val df = spark.createDataFrame(docs).toDF("id", "n").repartition(9)
      val got = Packing.packSequences(df, "id", "n", cap)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq == referencePack(docs, cap), s"trial $trial cap $cap")
    }
  }

  test("packSequences invariants: full coverage, full sequences, in-sequence tiling") {
    val rnd = new scala.util.Random(3)
    val cap = 128L
    val docs = (0L until 300L).map(i => (i, rnd.nextInt(400).toLong))
    val df = spark.createDataFrame(docs).toDF("id", "n")
    val rows = Packing.packSequences(df, "id", "n", cap)
      .as[(Long, Long, Long, Long, Long)].collect()
    // every token of every doc covered exactly once, in order
    val byDoc = rows.groupBy(_._1)
    for ((id, n) <- docs if n > 0) {
      val slices = byDoc(id).sortBy(_._2).map(r => (r._3, r._4))
      assert(slices.head._1 == 0L && slices.last._2 == n)
      slices.sliding(2).foreach {
        case Array((_, e), (s, _)) => assert(e == s)
        case _ =>
      }
    }
    assert(byDoc.keySet == docs.filter(_._2 > 0).map(_._1).toSet)
    // every sequence except the last holds exactly `cap` tokens
    val bySeq = rows.groupBy(_._2).view.mapValues(_.map(r => r._4 - r._3).sum)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, tot) =>
      if (seq < lastSeq) assert(tot == cap, s"seq $seq") else assert(tot <= cap)
    }
    // slices tile each sequence contiguously from offset 0
    rows.groupBy(_._2).foreach { case (seq, rs) =>
      val tiles = rs.sortBy(_._5).map(r => (r._5, r._5 + (r._4 - r._3)))
      assert(tiles.head._1 == 0L)
      tiles.sliding(2).foreach {
        case Array((_, e), (s, _)) => assert(e == s, s"gap in seq $seq")
        case _ =>
      }
    }
  }

  test("packGreedy: never splits, bounded overflow, id-order monotone") {
    val rnd = new scala.util.Random(5)
    val cap = 100L
    val docs = (0L until 250L).map(i => (i, (1 + rnd.nextInt(60)).toLong))
    val df = spark.createDataFrame(docs).toDF("id", "n").repartition(7)
    val got = Packing.packGreedy(df, "id", "n", cap)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // one row per doc; seq assignment matches the running-offset rule
    assert(got.map(_._1).toSeq == docs.map(_._1))
    var cum = 0L
    docs.foreach { case (id, n) =>
      val r = got(id.toInt)
      assert(r._2 == cum / cap && r._3 == cum % cap && r._4 == n)
      cum += n
    }
    // overflow bound: each sequence's total < cap + its max doc length
    got.groupBy(_._2).foreach { case (seq, rs) =>
      val tot = rs.map(_._4).sum
      assert(tot < cap + rs.map(_._4).max, s"seq $seq total $tot")
    }
  }

  test("shuffled packing = the straight-line packer over (md5, id) order") {
    def md5hex8(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val rnd = new scala.util.Random(19)
    val cap = 50L
    val docs = (0L until 150L).map(i => (i, (1 + rnd.nextInt(40)).toLong))
    val df = spark.createDataFrame(docs).toDF("id", "n").repartition(11)
    val got = Packing.packSequences(df, "id", "n", cap, shuffled = true)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // reference walks docs in (hash, id) order
    var cum = 0L
    val want = docs.sortBy { case (id, _) => (md5hex8(id), id) }.flatMap { case (id, n) =>
      val s0 = cum / cap; val s1 = (cum + n - 1) / cap
      val slices = (s0 to s1).map { seq =>
        (id, seq, math.max(seq * cap - cum, 0L), math.min(n, (seq + 1) * cap - cum),
          math.max(cum - seq * cap, 0L))
      }
      cum += n
      slices
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want)
    // a genuine shuffle: differs from id-order packing
    val plain = Packing.packSequences(df, "id", "n", cap)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(plain.toSeq != got.toSeq)
  }

  test("packSequences edge cases: empty input, all-zero counts, null counts") {
    val empty = spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("id", "n")
    assert(Packing.packSequences(empty, "id", "n", 10L).count() == 0)
    val zeros = spark.createDataFrame(Seq((1L, 0L), (2L, 0L))).toDF("id", "n")
    assert(Packing.packSequences(zeros, "id", "n", 10L).count() == 0)
    val nulls = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
    val df = spark.createDataFrame(nulls).toDF("id", "n")
    val rows = Packing.packSequences(df, "id", "n", 10L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // null-count doc occupies nothing; 5+7 tokens pack into seqs 0,1
    assert(rows.toSeq == Seq((1L, 0L, 0L, 5L, 0L), (3L, 0L, 0L, 5L, 5L), (3L, 1L, 5L, 7L, 0L)))
  }

  test("packBestFit: no overflow, exact coverage, deterministic, beats greedy fill") {
    val rnd = new scala.util.Random(29)
    val cap = 100L
    val docs = (0L until 400L).map(i => (i, (1 + rnd.nextInt(90)).toLong))
    val df = spark.createDataFrame(docs).toDF("id", "n")
    def run() = Packing.packBestFit(df, "id", "n", cap, numPartitions = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val got = run()
    // every doc exactly once, with its own token count
    assert(got.map(_._1).toSeq == docs.map(_._1))
    assert(got.map(r => r._1 -> r._4).toMap == docs.toMap)
    // bins never exceed capacity; starts tile each bin contiguously
    got.groupBy(_._2).foreach { case (bin, rs) =>
      assert(rs.map(_._4).sum <= cap, s"bin $bin overflows")
      val tiles = rs.sortBy(_._3).map(r => (r._3, r._3 + r._4))
      assert(tiles.head._1 == 0L)
      tiles.sliding(2).foreach {
        case Array((_, e), (s, _)) => assert(e == s, s"gap in bin $bin")
        case _ =>
      }
    }
    // deterministic re-run
    assert(run().toSeq == got.toSeq)
    // fill efficiency: BFD should not use more bins than greedy's
    // straddle-overflow bound implies (greedy averages cap per bin but
    // BFD back-fills; require >= 90% mean fill here)
    val nBins = got.map(_._2).distinct.length
    val total = docs.map(_._2).sum.toDouble
    assert(total / (nBins * cap) >= 0.9, s"fill ${total / (nBins * cap)}")
  }

  test("packBestFit: oversize docs get dedicated bins, zero/null counts drop") {
    val docs = Seq((1L, Some(250L)), (2L, Some(40L)), (3L, None), (4L, Some(0L)), (5L, Some(60L)))
    val df = spark.createDataFrame(docs).toDF("id", "n")
    val got = Packing.packBestFit(df, "id", "n", 100L, numPartitions = 1)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 5L))
    val oversize = got.find(_._1 == 1L).get
    assert(oversize._3 == 0L && oversize._4 == 250L)
    // nothing shares the oversize bin
    assert(got.count(_._2 == oversize._2) == 1)
    // 40 + 60 back-fill one bin exactly
    assert(got.filter(_._1 != 1L).map(_._2).distinct.length == 1)
  }

  test("plan shape: the prefix sum never plans a single-partition window") {
    val df = spark.createDataFrame((0L until 100L).map(i => (i, i % 7)))
      .toDF("id", "n")
    for (plan <- Seq(
      Packing.packSequences(df, "id", "n", 64L).queryExecution.executedPlan,
      Packing.packSequences(df, "id", "n", 64L, shuffled = true).queryExecution.executedPlan,
      Packing.packGreedy(df, "id", "n", 64L).queryExecution.executedPlan)) {
      val globals = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(globals.isEmpty, s"global window in:\n$plan")
    }
  }

  test("packedText round-trips the token stream") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta"),
      (3L, "eta theta iota kappa lambda mu nu xi"),
      (4L, "omicron"))
    val df = spark.createDataFrame(docs).toDF("id", "text")
    val counted = df.select(col("id"), TextOps.tokenCount(col("text")).as("n"))
    val map = Packing.packSequences(counted, "id", "n", 5L)
    val out = Packing.packedText(map, df, "id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val stream = docs.sortBy(_._1).flatMap(_._2.split("\\s+"))
    val want = stream.grouped(5).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" "), g.length.toLong) }.toSeq
    assert(out.toSeq == want)
  }

  test("packingReport: fill, padding, overflow and per-mille on a hand map") {
    // capacity 10; greedy map: seq 0 = docs of 6 + 7 tokens (fill 13,
    // OVERFLOW — pads nothing), seq 1 = 4 + 2 (fill 6, pads 4),
    // seq 2 = 3 (fill 3, pads 7)
    val map = Seq(
      (1L, 0L, 6L), (2L, 0L, 7L),
      (3L, 1L, 4L), (4L, 1L, 2L),
      (5L, 2L, 3L)).toDF("id", "seq", "n_tokens")
    val r = Packing.packingReport(map, capacity = 10L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // (n_seqs, n_docs, n_tokens, n_overflow_seqs, padding_tokens, fpm)
    assert(r === ((3L, 5L, 22L, 1L, 11L, 22L * 1000 / 30)))
    // consistency with a real greedy packing: tokens conserved, and with
    // no overflow, padding = n_seqs*capacity - n_tokens exactly
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("id", "n")
    val g = Packing.packingReport(Packing.packGreedy(docs, "id", "n", 8L), 8L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(g._3 === 12L && g._4 === 0L && g._5 === g._1 * 8L - 12L)
  }

  test("packGreedyBy: custom order co-locates a topic; id order scatters it") {
    // two interleaved topics, 4 docs each, 4 tokens per doc, capacity 16:
    // keyed by topic the pack puts each topic in ONE sequence; keyed by
    // id the topics interleave across both sequences
    val docs = Seq(
      (1L, "a", 4L), (2L, "b", 4L), (3L, "a", 4L), (4L, "b", 4L),
      (5L, "a", 4L), (6L, "b", 4L), (7L, "a", 4L), (8L, "b", 4L))
      .toDF("id", "topic", "n")
    val byTopic = Packing.packGreedyBy(docs, "id", "n", 16L,
        Seq(col("topic"), col("id")))
      .select(col("id"), col("seq")).as[(Long, Long)].collect().toMap
    assert(Seq(1L, 3L, 5L, 7L).map(byTopic).distinct.size === 1)
    assert(Seq(2L, 4L, 6L, 8L).map(byTopic).distinct.size === 1)
    assert(byTopic(1L) != byTopic(2L))
    // the default order is the packGreedyBy(id) special case, verbatim
    val a = Packing.packGreedy(docs, "id", "n", 16L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Packing.packGreedyBy(docs, "id", "n", 16L, Seq(col("id")))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
    // minShingleKey: identical docs share the key; it is the md5 of the
    // doc's minimum-hashing shingle (engine-replayable)
    val keys = Seq((1L, "x y z w"), (2L, "x y z w"), (3L, "p q r s"))
      .toDF("id", "t")
      .select(col("id"), graft.text.TextOps.tokens(col("t")).as("__toks"))
      .select(col("id"),
        graft.dedup.Dedup.minShingleKey(col("__toks"), 3).as("k"))
      .as[(Long, String)].collect().toMap
    assert(keys(1L) === keys(2L)); assert(keys(1L) !== keys(3L))
    assert(keys(1L).length === 32)
  }
}
