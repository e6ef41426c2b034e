package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance selection + Stupid Backoff LM scoring: hand-computed
  * models on tiny corpora, a randomized driver-side replay of the DSIR
  * fold product, and internal consistency between the rational pico path
  * and the production log/perplexity path. */
class DsirLmSpec extends SparkSpec {
  import spark.implicits._

  // driver-side twin of Dsir.bucketOf / HashingVector.bucket
  private def bucket(g: String, dim: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8"))
    val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (v % dim).toInt
  }

  private def localBigrams(text: String): Seq[String] = {
    val t = text.trim.split("\\s+").toSeq
    if (t.length < 2) Seq.empty else t.sliding(2).map(_.mkString(" ")).toSeq
  }

  test("Dsir: fitRatios matches a driver-side count replay") {
    val docs = Seq(
      (1L, "en", "spark scan fast spark scan"),
      (2L, "en", "fast scan fast scan"),
      (3L, "de", "merge window stream merge"),
      (4L, "de", "stream merge stream")).toDF("doc_id", "lang", "text")
    val dim = 8
    val ratios = Dsir.fitRatios(docs, col("lang") === "en", "text", dim)
    val all = Seq("spark scan fast spark scan", "fast scan fast scan",
      "merge window stream merge", "stream merge stream")
    val tgt = all.take(2)
    val rawC = new Array[Long](dim); val tgtC = new Array[Long](dim)
    all.foreach(t => localBigrams(t).foreach(g => rawC(bucket(g, dim)) += 1))
    tgt.foreach(t => localBigrams(t).foreach(g => tgtC(bucket(g, dim)) += 1))
    val expected = Array.tabulate(dim) { b =>
      ((tgtC(b) + 1L) * (rawC.sum + dim)).toDouble /
        ((rawC(b) + 1L) * (tgtC.sum + dim)).toDouble
    }
    assert(ratios.toSeq === expected.toSeq)
  }

  test("Dsir: weight is the exact positional fold product; empty docs are neutral") {
    val docs = Seq(
      (1L, "en", "spark scan fast spark scan"),
      (2L, "de", "merge window stream merge"),
      (3L, "en", "solo"),
      (4L, "en", "")).toDF("doc_id", "lang", "text")
    val dim = 8
    val ratios = Dsir.fitRatios(docs, col("lang") === "en", "text", dim)
    val got = docs
      .select(col("doc_id"), Dsir.importanceWeight(col("text"), ratios, dim)
        .as("w"))
      .as[(Long, Double)].collect().toMap
    def expected(t: String): Double =
      localBigrams(t).foldLeft(1.0)((acc, g) => acc * ratios(bucket(g, dim)))
    assert(got(1L) === expected("spark scan fast spark scan"))
    assert(got(2L) === expected("merge window stream merge"))
    assert(got(3L) === 1.0 && got(4L) === 1.0)
    // the target-language doc must outrank the off-target doc
    assert(got(1L) > got(2L))
  }

  test("Dsir: randomized docs replay the fold product bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val texts = (1L to 60L).map { id =>
      val n = 1 + rnd.nextInt(12)
      (id, if (id % 3 == 0) "tgt" else "raw",
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = texts.toDF("doc_id", "src", "text")
    val dim = 16
    val ratios = Dsir.fitRatios(docs, col("src") === "tgt", "text", dim)
    val got = docs.select(col("doc_id"),
        Dsir.importanceWeight(col("text"), ratios, dim).as("w"))
      .as[(Long, Double)].collect().toMap
    texts.foreach { case (id, _, t) =>
      val exp = localBigrams(t).foldLeft(1.0)((acc, g) => acc * ratios(bucket(g, dim)))
      assert(got(id) === exp, s"doc $id text '$t'")
    }
    // the compiled bigram array equals the interpreted HOF twin
    val bg = docs.select(col("doc_id"), Dsir.bigrams(col("text")).as("a"),
        Dsir.bigramsHof(col("text")).as("b"))
      .as[(Long, Seq[String], Seq[String])].collect()
    bg.foreach { case (id, a, b) => assert(a === b, s"bigrams mismatch doc $id") }
    // the compiled expression and its interpreted HOF twin agree to the
    // last bit (same hash, same fold order, same double multiplies)
    val hof = docs.select(col("doc_id"),
        Dsir.importanceWeightHof(col("text"), ratios, dim).as("w"))
      .as[(Long, Double)].collect().toMap
    texts.foreach { case (id, _, t) =>
      assert(java.lang.Double.doubleToLongBits(got(id)) ===
        java.lang.Double.doubleToLongBits(hof(id)), s"codegen≠HOF for doc $id '$t'")
    }
    // top-k selection orders by weight desc then id
    val sel = Dsir.select(docs, col("src") === "tgt", "text", "doc_id",
      dim, k = 10).as[(Long, Double)].collect()
    val expTop = texts.map { case (id, _, t) =>
      (id, localBigrams(t).foldLeft(1.0)((a, g) => a * ratios(bucket(g, dim))))
    }.sortBy { case (id, w) => (-w, id) }.take(10)
    assert(sel.toSeq === expTop.toSeq)
  }

  test("NgramLm: hand-computed Stupid Backoff scores on a tiny corpus") {
    // train: "a b c" and "a b d" → trigrams (a,b,c), (a,b,d); N=6, V=4
    val train = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val model = NgramLm.fit(train, "text")
    val score = Seq((10L, "a b c"), (11L, "a b x"), (12L, "z a b"))
      .toDF("doc_id", "text")
    val got = NgramLm.scoreTokens(score, model, "text", "doc_id")
      .select(col("doc_id"), col("pos"), col("level"), col("score"))
      .as[(Long, Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val n = 6.0; val v = 4.0
    // "a b c": pos0 unigram (2+1)/(N+V); pos1 c2(a,b)/c1(a)=2/2; pos2 c3/c2ctx=1/2
    assert(got((10L, 0)) === ((1, 3.0 / (n + v))))
    assert(got((10L, 1)) === ((2, 2.0 / 2.0)))
    assert(got((10L, 2)) === ((3, 1.0 / 2.0)))
    // "a b x": pos2 trigram (a,b,x) unseen → α·S2; bigram (b,x) unseen →
    // α·S1(x); x unseen → Laplace (0+1)/(N+V)
    assert(got((11L, 2)) === ((1, 0.4 * (0.4 * (1.0 / (n + v))))))
    // "z a b": pos0 z unseen → 1/(N+V); pos1 bigram (z,a) unseen →
    // α·S1(a) = 0.4·3/(N+V); pos2 trigram (z,a,b) unseen, bigram (a,b)
    // SEEN → level 2 via backoff: α·(c2(a,b)/c1(a)) = 0.4·1.0
    assert(got((12L, 0)) === ((1, 1.0 / (n + v))))
    assert(got((12L, 1)) === ((1, 0.4 * (3.0 / (n + v)))))
    assert(got((12L, 2)) === ((2, 0.4 * (2.0 / 2.0))))
  }

  test("NgramLm: filterByScore picos equal a driver-side requantization; perplexity agrees") {
    val docs = Seq(
      (1L, "en", "the fast scan the fast scan the fast scan"),
      (2L, "en", "the fast scan runs the fast scan runs again"),
      (3L, "de", "merge window stream merge window stream")).toDF("doc_id", "lang", "text")
    val model = NgramLm.fit(docs.where(col("lang") === "en"), "text")
    val perTok = NgramLm.scoreTokens(docs, model, "text", "doc_id")
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect()
    val expPico = perTok.groupBy(_._1).view.mapValues(ts =>
      (ts.length.toLong, ts.map(t => math.round(t._2 * 1e12)).sum)).toMap
    val got = NgramLm.filterByScore(docs, model, "text", "doc_id",
        tauNum = 1L, tauDen = 20L)
      .select(col("doc_id"), col("n_scored"), col("score_sum_pico"), col("keep"))
      .as[(Long, Long, Long, Boolean)].collect()
    got.foreach { case (id, nSc, pico, keep) =>
      assert((nSc, pico) === expPico(id), s"doc $id")
      assert(keep === (pico * 20L >= nSc * 1000000000000L), s"doc $id keep")
    }
    // production path: finite positive perplexity, and the on-model en
    // docs score lower perplexity than the off-model de doc
    val ppl = NgramLm.perDocPerplexity(docs, model, "text", "doc_id")
      .select(col("doc_id"), col("perplexity")).as[(Long, Double)].collect().toMap
    ppl.values.foreach(p => assert(p > 0 && java.lang.Double.isFinite(p)))
    assert(ppl(1L) < ppl(3L) && ppl(2L) < ppl(3L))
  }

  test("NgramLm: ccnetBuckets cuts at exact tertiles with head = most target-like") {
    // 6 docs, clearly ordered by en-model fit: the on-model docs land in
    // head, the off-model ones in tail
    val docs = Seq(
      (1L, "en", "the fast scan the fast scan the fast scan"),
      (2L, "en", "the fast scan the fast scan runs"),
      (3L, "en", "the fast scan runs again and again"),
      (4L, "de", "merge window stream merge window stream"),
      (5L, "de", "merge window stream plan"),
      (6L, "de", "zzz qqq vvv kkk")).toDF("doc_id", "lang", "text")
    val model = NgramLm.fit(docs.where(col("lang") === "en"), "text")
    val out = NgramLm.ccnetBuckets(docs, model, "text", "doc_id")
      .select(col("doc_id"), col("n_scored"), col("score_sum_pico"), col("bucket"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // labels replay from the returned picos: mean = pico/n, order-stat cut
    val means = out.map(r => r._1 -> r._3.toDouble / r._2).toMap
    val sorted = means.values.toSeq.sorted
    val n = sorted.size
    // thresholds are the observed means at rank ceil(n/3) / ceil(2n/3)
    // (1-based ascending) — never interpolated values
    val tLo = sorted(math.ceil(n / 3.0).toInt - 1)
    val tHi = sorted(math.ceil(n * 2 / 3.0).toInt - 1)
    out.foreach { case (id, _, _, b) =>
      val want = if (means(id) >= tHi) "head"
        else if (means(id) >= tLo) "middle" else "tail"
      assert(b === want, s"doc $id")
    }
    // on-model docs outrank off-model ones (within the off-model group,
    // LONGER docs mean lower — more α²-floored positions)
    val byBucket = out.groupBy(_._4).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBucket("head").subsetOf(Set(1L, 2L, 3L)))
    assert(byBucket("tail").subsetOf(Set(4L, 5L, 6L)))
  }

  test("bigrams and bigramsHof agree on null/empty/single-token docs") {
    // the compiled form must be ratio-neutral on null text exactly like
    // the HOF twin (empty array, NOT null) — no isNotNull pre-filter
    // required for agreement
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "one"),
      (4L, "two tokens here")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Dsir.bigrams(col("text")).as("b"),
        Dsir.bigramsHof(col("text")).as("h"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1), r.getSeq[String](2))).toMap
    got.foreach { case (id, (b, h)) => assert(b === h, s"doc $id") }
    assert(got(1L)._1 === Seq.empty)
    assert(got(4L)._1 === Seq("two tokens", "tokens here"))
  }

  test("ccnetBuckets: Approx cut agrees with Exact on the sf0.001 fixture") {
    // the production (mergeable-sketch) tertile cut vs the oracle
    // (order-statistic) cut on the real fixture: at n << accuracy the
    // sketch holds every value, so both paths pick observed order
    // statistics — they can differ only by the two rank conventions'
    // one-element offset at a tertile boundary
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val model = NgramLm.fit(docs.where(col("lang") === "en"), "text")
    def run(cut: NgramLm.TertileCut): Map[Long, (String, Double)] =
      NgramLm.ccnetBuckets(docs, model, "text", "doc_id", cut = cut)
        .withColumn("mean", col("score_sum_pico").cast("double") / col("n_scored"))
        .select(col("doc_id"), col("bucket"), col("mean"))
        .as[(Long, String, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = run(NgramLm.TertileCut.Exact)
    val approx = run(NgramLm.TertileCut.Approx())
    assert(exact.keySet === approx.keySet)
    val n = exact.size
    val disagree = exact.keys.filter(id => exact(id)._1 != approx(id)._1).toSeq
    // boundary-only drift: every disagreement is a one-step bucket move,
    // and there are at most a handful (docs between the interpolated and
    // the snapped threshold)
    val rank = Map("tail" -> 0, "middle" -> 1, "head" -> 2)
    disagree.foreach { id =>
      assert(math.abs(rank(exact(id)._1) - rank(approx(id)._1)) === 1,
        s"doc $id jumped ${exact(id)._1} -> ${approx(id)._1}")
    }
    assert(disagree.size <= math.max(2, n / 50),
      s"${disagree.size}/$n docs disagree: $disagree")
    // both cuts produce three non-degenerate buckets of ~n/3
    Seq(exact, approx).foreach { m =>
      val sizes = m.values.groupBy(_._1).view.mapValues(_.size).toMap
      Seq("head", "middle", "tail").foreach { b =>
        assert(sizes.getOrElse(b, 0) > n / 6, s"$b degenerate: $sizes")
      }
    }
  }

  test("ccnetBucketsGrouped: per-language tertiles partition each language ~ in thirds") {
    // the grouped cut's defining property: EVERY language lands ~n/3 per
    // bucket, even languages the ungrouped (global-threshold) cut labels
    // mostly tail because the en-trained LM scores them off-scale
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val model = NgramLm.fit(docs.where(col("lang") === "en"), "text")
    val out = NgramLm.ccnetBucketsGrouped(docs, model, "text", "doc_id", "lang")
      .select(col("doc_id"), col("lang"), col("n_scored"),
        col("score_sum_pico"), col("bucket"))
      .as[(Long, String, Long, Long, String)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val n = rows.size
      val sizes = rows.groupBy(_._5).view.mapValues(_.size).toMap
      Seq("head", "middle", "tail").foreach { b =>
        assert(sizes.getOrElse(b, 0) >= n / 6,
          s"lang $lang bucket $b degenerate: $sizes")
      }
      // labels replay from the returned picos against this language's own
      // order-statistic cut (means at rank ceil(n/3) / ceil(2n/3))
      val means = rows.map(r => r._1 -> (r._4.toDouble / r._3)).toMap
      val sorted = means.values.toSeq.sorted
      val tLo = sorted(math.ceil(sorted.size / 3.0).toInt - 1)
      val tHi = sorted(math.ceil(sorted.size * 2 / 3.0).toInt - 1)
      rows.foreach { case (id, _, _, _, b) =>
        val want = if (means(id) >= tHi) "head"
          else if (means(id) >= tLo) "middle" else "tail"
        assert(b === want, s"lang $lang doc $id")
      }
    }
    // grouped on a CONSTANT group column degrades to the ungrouped cut
    val global = NgramLm.ccnetBuckets(docs, model, "text", "doc_id")
      .select(col("doc_id"), col("bucket")).as[(Long, String)].collect().toMap
    val constGrouped = NgramLm.ccnetBucketsGrouped(
        docs.withColumn("one", lit("x")), model, "text", "doc_id", "one")
      .select(col("doc_id"), col("bucket")).as[(Long, String)].collect().toMap
    assert(constGrouped === global)
  }

  test("semanticDedupIncremental with empty history degrades to in-batch semanticDedup") {
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0.999f, 0.01f, 0f)), // near-dups
      (3L, Seq(0f, 1f, 0f)))
    val model = graft.sim.Ivf.IvfModel(Array(Array(1.0, 0, 0), Array(0, 1.0, 0)))
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val out = graft.sim.Similarity.semanticDedupIncremental(
        vecs.toDF("vec_id", "embedding"), empty, "embedding", "vec_id", model, 0.9)
      .select("vec_id", "keep_vs_history", "component", "keep")
      .as[(Long, Boolean, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, true, 1L, true), (2L, true, 1L, false), (3L, true, 3L, true)))
  }
}
