package graft.udafs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  /** The three deterministic MG guarantees against exact counts. */
  private def checkBounds(summary: Map[String, Long],
                          exact: Map[String, Long], k: Int): Unit = {
    val n = exact.values.sum
    val band = n / (k + 1)
    assert(summary.size <= k, s"summary exceeds k: ${summary.size} > $k")
    summary.foreach { case (t, est) =>
      val tru = exact.getOrElse(t, 0L)
      assert(est <= tru, s"$t overestimated: $est > $tru")
      assert(est >= 1L, s"$t retained with non-positive counter")
    }
    exact.foreach { case (t, tru) =>
      val est = summary.getOrElse(t, 0L)
      assert(tru - est <= band, s"$t outside band: $tru - $est > $band")
      if (tru > band)
        assert(summary.contains(t), s"heavy token $t (count $tru) absent")
    }
  }

  /** Zipf-ish skewed stream: token i appears ~ 4000/(i+1) times — the
    * shape MG exists for, with a long uniform tail forcing trims. */
  private def skewed: Seq[String] =
    (0 until 40).flatMap(i => Seq.fill(4000 / (i + 1))(s"tok_$i")) ++
      (0 until 3000).map(i => s"tail_${i % 1500}")

  test("mgAgg under forced trims: est <= true, band, heavy present") {
    val exact = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(4, 16, 64)) {
      val got = skewed.toDF("token")
        .repartition(7) // partial summaries merge across tasks
        .agg(FreqItems.mgAgg(col("token"), lit(1L), k).as("mg"))
        .as[Map[String, Long]].head()
      checkBounds(got, exact, k)
      // trims demonstrably fired: far fewer counters than vocabulary
      // (which token survives a trim is merge-order-dependent — only
      // the bounds are order-free, and checkBounds pinned those)
      assert(got.size < exact.size)
    }
  }

  test("pre-counted (token, n) pairs obey the same bounds") {
    val exact = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = exact.toSeq.toDF("token", "n")
      .repartition(5)
      .agg(FreqItems.mgAgg(col("token"), col("n"), 8).as("mg"))
      .as[Map[String, Long]].head()
    checkBounds(got, exact, 8)
  }

  test("mgMergeAgg over per-shard summaries keeps the k-bound guarantee") {
    val exact = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val merged = skewed.zipWithIndex.toDF("token", "i")
      .groupBy((col("i") % 6).as("shard"))
      .agg(FreqItems.mgAgg(col("token"), lit(1L), 12).as("mg"))
      .agg(FreqItems.mgMergeAgg(col("mg"), 12).as("mg"))
      .as[Map[String, Long]].head()
    checkBounds(merged, exact, 12)
  }

  test("exact regime: vocabulary <= k means no trim ever fires") {
    val data = (0 until 500).map(i => s"tok_${i % 20}")
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = data.toDF("token").repartition(3)
      .agg(FreqItems.mgAgg(col("token"), lit(1L), 20).as("mg"))
      .as[Map[String, Long]].head()
    assert(got === exact)
    // and the two-level shard -> merge build lands the same exact sums
    val twoLevel = data.zipWithIndex.toDF("token", "i")
      .groupBy((col("i") % 4).as("shard"))
      .agg(FreqItems.mgAgg(col("token"), lit(1L), 20).as("mg"))
      .agg(FreqItems.mgMergeAgg(col("mg"), 20).as("mg"))
      .as[Map[String, Long]].head()
    assert(twoLevel === exact)
  }

  test("randomized: bounds hold for every k on every draw") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 5) {
      val vocab = 30 + rnd.nextInt(80)
      val data = (0 until 4000).map { _ =>
        // quadratic skew: low ids dominate
        val i = (math.pow(rnd.nextDouble(), 2.0) * vocab).toInt
        s"w$i"
      }
      val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      for (k <- Seq(3, 10, 40)) {
        val got = data.toDF("token").repartition(1 + rnd.nextInt(8))
          .agg(FreqItems.mgAgg(col("token"), lit(1L), k).as("mg"))
          .as[Map[String, Long]].head()
        checkBounds(got, exact, k)
      }
    }
  }

  test("rolling window merges keep the MG bounds under forced trims") {
    val rnd = new scala.util.Random(99)
    // 6 buckets of skewed text, vocabulary ~60 > k=10: every bucket
    // summary trims, and so does every window merge
    val docs = (0 until 6).flatMap { b =>
      (0 until 80).map { _ =>
        val i = (math.pow(rnd.nextDouble(), 2.0) * 60).toInt
        (b.toLong, s"w$i w${(i * 7) % 60}")
      }
    }
    val df = docs.toDF("bucket", "text")
    val win = 3; val k = 10
    val got = graft.ops.Timeseries.rollingHeavyHittersFromSummaries(
        graft.ops.Timeseries.bucketTokenHeavyHitters(df, "text", "bucket", k),
        "bucket", "summary", k, win)
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    // exact windowed counts per window end
    val tok = docs.flatMap { case (b, t) => t.split(" ").map(b -> _) }
    val maxB = docs.map(_._1).max
    for (wend <- 0L to maxB) {
      val inWin = tok.filter { case (b, _) =>
        b >= wend - (win - 1) && b <= wend }
      val exact = inWin.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      checkBounds(got.getOrElse(wend, Map.empty), exact, k)
      assert(got(wend).size < exact.size) // trims fired in the window
    }
  }

  test("nulls and non-positive weights are ignored; empty input is empty") {
    val got = Seq(("a", 1L), (null, 5L), ("b", 0L), ("c", -2L), ("a", 2L))
      .toDF("token", "n")
      .agg(FreqItems.mgAgg(col("token"), col("n"), 4).as("mg"))
      .as[Map[String, Long]].head()
    assert(got === Map("a" -> 3L))
    val empty = Seq.empty[(String, Long)].toDF("token", "n")
      .agg(FreqItems.mgAgg(col("token"), col("n"), 4).as("mg"))
      .as[Map[String, Long]].head()
    assert(empty === Map.empty[String, Long])
  }
}
