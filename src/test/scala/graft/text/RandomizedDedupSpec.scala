package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.Dedup
import graft.sim.Similarity

/** Randomized model checks for the pair-generation operators that claim
  * EXACTNESS despite their sub-quadratic plans: the PPJoin prefix filter
  * (rare-first candidate pruning must lose no pair), the salted
  * shuffle-hash cosine join (each pair must meet exactly once), and the
  * confirmed-MinHash subset property. Seeded random corpora drawn from a
  * small vocabulary so near-duplicates are dense and hot shingles exist.
  */
class RandomizedDedupSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "the", "of")

  private def randomDocs(rnd: scala.util.Random, nDocs: Int): Seq[(Long, String)] =
    (1L to nDocs.toLong).map { i =>
      // clusters of mutated copies: base doc from a few templates, then
      // light word substitution — yields a realistic mix of exact dups,
      // near dups, and unrelated docs
      val base = Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(4 + (i % 3).toInt)))
      val mutated = base.map(w =>
        if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocab.size)) else w)
      (i, mutated.mkString(" "))
    }

  private def bruteJaccard(docs: Seq[(Long, String)], n: Int): Map[(Long, Long), Double] = {
    def sh(t: String): Set[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.size < n) Set(toks.mkString(" "))
      else toks.sliding(n).map(_.mkString(" ")).toSet
    }
    val shingled = docs.map { case (id, t) => id -> sh(t) }
    (for {
      (ia, sa) <- shingled; (ib, sb) <- shingled if ia < ib
      inter = (sa & sb).size
    } yield (ia, ib) -> inter.toDouble / (sa.size + sb.size - inter)).toMap
  }

  test("ngramJaccardPairs prefix filter is exact on random near-dup corpora") {
    val rnd = new scala.util.Random(101L)
    for (round <- 1 to 3) {
      val docs = randomDocs(rnd, 40)
      val t = 0.3 + 0.2 * rnd.nextInt(3) // 0.3 / 0.5 / 0.7
      val out = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          "text", "doc_id", Nil, 3, t)
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val model = bruteJaccard(docs, 3).filter(_._2 >= t)
      assert(out.keySet === model.keySet, s"round $round t=$t")
      out.foreach { case (k, j) =>
        assert(math.abs(j - model(k)) < 1e-12, s"round $round pair $k") }
    }
  }

  test("confirmed MinHash pairs are an exact-Jaccard subset on random corpora") {
    val rnd = new scala.util.Random(211L)
    val docs = randomDocs(rnd, 40)
    val out = Dedup.minhashLshPairs(docs.toDF("doc_id", "text"), "text",
        "doc_id", n = 3, bands = 16, rowsPerBand = 4, confirmThreshold = Some(0.7))
      .as[(Long, Long, Double)].collect()
    val model = bruteJaccard(docs, 3).filter(_._2 >= 0.7)
    out.foreach { case (a, b, j) =>
      assert(model.contains((a, b)), s"($a,$b) not a true pair")
      assert(math.abs(j - model((a, b))) < 1e-12)
    }
  }

  test("ngramJaccardJoin matches the brute-force model on random corpora") {
    val rnd = new scala.util.Random(811L)
    def sh(t: String): Set[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.size < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    for (round <- 1 to 3) {
      val left = randomDocs(rnd, 20)
      val right = randomDocs(rnd, 20).map { case (id, t) => (id + 100, t) }
      val t = 0.3 + 0.2 * rnd.nextInt(3)
      val out = Dedup.ngramJaccardJoin(left.toDF("doc_id", "text"),
          right.toDF("doc_id", "text"), "text", "doc_id", 3, t)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val model = (for {
        (ia, ta) <- left; (ib, tb) <- right
        inter = (sh(ta) & sh(tb)).size
        j = inter.toDouble / (sh(ta).size + sh(tb).size - inter) if j >= t
      } yield (ia, ib) -> j).toMap
      assert(out.keySet === model.keySet, s"round $round t=$t")
      out.foreach { case (k, j) => assert(math.abs(j - model(k)) < 1e-12, s"$k") }
    }
  }

  test("containmentJoin matches the brute-force model on random corpora") {
    val rnd = new scala.util.Random(409L)
    def sh(t: String): Set[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.size < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    for (round <- 1 to 3) {
      val probe = randomDocs(rnd, 15)
      // corpus docs embed some probe docs verbatim inside longer text —
      // the contamination shape Jaccard misses but containment must catch
      val corpus = (101L to 115L).map { i =>
        val pad = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        val inner = if (rnd.nextBoolean()) probe(rnd.nextInt(probe.size))._2 else ""
        (i, s"$pad $inner $pad".trim)
      }
      val t = 0.7
      val out = Dedup.containmentJoin(probe.toDF("doc_id", "text"),
          corpus.toDF("doc_id", "text"), "text", "doc_id", 3, t)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val model = (for {
        (ia, ta) <- probe; (ib, tb) <- corpus
        c = (sh(ta) & sh(tb)).size.toDouble / sh(ta).size if c >= t
      } yield (ia, ib) -> c).toMap
      assert(out.keySet === model.keySet, s"round $round")
      out.foreach { case (k, c) => assert(math.abs(c - model(k)) < 1e-12, s"$k") }
    }
  }

  test("chunkRows matches the sliding-window model on random docs") {
    val rnd = new scala.util.Random(701L)
    for (round <- 1 to 3) {
      val size = 4 + rnd.nextInt(12)
      val overlap = rnd.nextInt(size)
      val step = size - overlap
      val docs = (1L to 25L).map(i =>
        (i, Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val out = graft.text.TextOps.chunkRows(docs.toDF("doc_id", "text"),
          "text", "doc_id", size, overlap)
        .as[(Long, Int, String, Int)].collect().toSet
      val model = docs.flatMap { case (id, t) =>
        val toks = t.trim.split("\\s+").toSeq
        val starts = Iterator.from(0, step)
          .takeWhile(s => s < math.max(toks.size - overlap, 1)).toSeq
        starts.zipWithIndex.map { case (s, ci) =>
          val c = toks.slice(s, s + size)
          (id, ci, c.mkString(" "), c.size)
        }
      }.toSet
      assert(out === model, s"round $round size=$size overlap=$overlap")
    }
  }

  test("Corpus.clean matches a quality+union-find model on random corpora") {
    val rnd = new scala.util.Random(503L)
    val stop = Seq("the", "of")
    def sh(t: String): Set[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.size < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    for (round <- 1 to 2) {
      val docs = randomDocs(rnd, 35).map { case (id, t) =>
        // sprinkle quality failures: short docs and stopword floods
        if (id % 11 == 0) (id, "the of the")
        else if (id % 13 == 0) (id, t.split(" ").take(4).mkString(" "))
        else (id, t)
      }
      val out = graft.text.Corpus.clean(docs.toDF("doc_id", "text"),
          "text", "doc_id", Nil, stop, n = 3, threshold = 0.5)
        .select("doc_id", "keep_quality", "keep_exact", "keep")
        .as[(Long, Boolean, Boolean, Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      // model
      def kq(t: String): Boolean = {
        val toks = t.trim.split("\\s+").toSeq
        toks.size >= 10 &&
          toks.count(stop.contains).toDouble / toks.size <= 0.5 &&
          toks.distinct.size.toDouble / toks.size >= 0.3
      }
      val quality = docs.filter(d => kq(d._2))
      val byFp = quality.groupBy(_._2.trim.split("\\s+").mkString(" ").toLowerCase)
      val exact = byFp.values.map(_.map(_._1).min).toSet
      val survivors = quality.filter(d => exact(d._1))
      val pairs = for {
        (ia, ta) <- survivors; (ib, tb) <- survivors if ia < ib
        inter = (sh(ta) & sh(tb)).size
        if inter.toDouble / (sh(ta).size + sh(tb).size - inter) >= 0.5
      } yield (ia, ib)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val model = docs.map { case (id, t) =>
        val q = kq(t); val e = q && exact(id)
        id -> (q, e, e && find(id) == id)
      }.toMap
      assert(out === model, s"round $round")
    }
  }

  test("cleanIncremental matches a staged model on random batch + history") {
    val rnd = new scala.util.Random(601L)
    val stop = Seq("the", "of")
    def toks(t: String) = t.trim.split("\\s+").toSeq
    def sh(t: String): Set[String] = {
      val ts = toks(t)
      if (ts.size < 3) Set(ts.mkString(" ")) else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    def kq(t: String): Boolean = {
      val ts = toks(t)
      ts.size >= 10 && ts.count(stop.contains).toDouble / ts.size <= 0.5 &&
        ts.distinct.size.toDouble / ts.size >= 0.3
    }
    def jac(a: String, b: String): Double = {
      val (sa, sb) = (sh(a), sh(b)); val i = (sa & sb).size
      i.toDouble / (sa.size + sb.size - i)
    }
    for (round <- 1 to 2) {
      val history = randomDocs(rnd, 12).map { case (id, t) => (id + 500, t) }
      val batch = randomDocs(rnd, 25).map { case (id, t) =>
        if (id % 9 == 0) (id, "the of") else (id, t) // planted quality fails
      }
      val out = graft.text.Corpus.cleanIncremental(
          batch.toDF("doc_id", "text"), history.toDF("doc_id", "text"),
          "text", "doc_id", stop, n = 3, threshold = 0.5)
        .select("doc_id", "keep_quality", "keep_exact", "keep_vs_history", "keep")
        .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
      // staged model
      val histFps = history.map(_._2).map(t => toks(t).mkString(" ").toLowerCase).toSet
      val q = batch.filter(d => kq(d._2))
      val byFp = q.groupBy(d => toks(d._2).mkString(" ").toLowerCase)
      val exact = q.filter { case (id, t) =>
        val fp = toks(t).mkString(" ").toLowerCase
        !histFps(fp) && byFp(fp).map(_._1).min == id
      }.map(_._1).toSet
      val kh = batch.filter { case (id, t) => exact(id) &&
        !history.exists(h => jac(t, h._2) >= 0.5) }.map(_._1).toSet
      val khDocs = batch.filter(d => kh(d._1))
      val pairs = for {
        (ia, ta) <- khDocs; (ib, tb) <- khDocs if ia < ib && jac(ta, tb) >= 0.5
      } yield (ia, ib)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val model = batch.map { case (id, t) =>
        val e = exact(id); val h = kh(id)
        id -> (kq(t), e, h, h && find(id) == id)
      }.toMap
      assert(out === model, s"round $round")
    }
  }

  test("salted cosinePairs meets each pair exactly once on random blocks") {
    val rnd = new scala.util.Random(307L)
    for (round <- 1 to 3) {
      val vecs = (1L to 60L).map { i =>
        (i, Seq.fill(8)(rnd.nextGaussian().toFloat), s"b${rnd.nextInt(2)}")
      }
      val out = Similarity.cosinePairs(vecs.toDF("vec_id", "embedding", "label"),
          "embedding", "vec_id", "label", threshold = 0.2)
        .as[(Long, Long, Double)].collect().toSeq
      // exactly once: no duplicate (a, b) rows from the salt replication
      assert(out.map(r => (r._1, r._2)).distinct.size === out.size, s"round $round dups")
      val byId = vecs.map(v => v._1 -> v).toMap
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
        dot / (na * nb)
      }
      val model = (for {
        (ia, va, ba) <- vecs; (ib, vb, bb) <- vecs
        if ia < ib && ba == bb && cos(va, vb) >= 0.2
      } yield (ia, ib)).toSet
      assert(out.map(r => (r._1, r._2)).toSet === model, s"round $round")
      out.foreach { case (a, b, c) =>
        assert(math.abs(c - cos(byId(a)._2, byId(b)._2)) < 1e-9, s"($a,$b)") }
    }
  }

  test("substringDedup matches the brute-force span model on random corpora") {
    val rnd = new scala.util.Random(97L)
    def model(docs: Seq[(Long, String)], k: Int, keepFirst: Boolean)
        : Map[Long, (String, Int, Int)] = {
      val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
      val occs = for {
        (id, tk) <- toks; p <- 0 to tk.length - k
      } yield (tk.slice(p, p + k).mkString(" "), id, p)
      val removable = occs.groupBy(_._1).values.flatMap { os =>
        if (os.size < 2) Nil
        else if (keepFirst) os.sortBy(o => (o._2, o._3)).tail else os
      }.map(o => (o._2, o._3)).toSet
      toks.map { case (id, tk) =>
        val rem = tk.indices.filter(p =>
          (math.max(0, p - k + 1) to p).exists(s => removable((id, s)))).toSet
        id -> (tk.indices.filterNot(rem).map(tk).mkString(" "),
               rem.size, tk.length)
      }.toMap
    }
    for (round <- 1 to 4; keepFirst <- Seq(true, false)) {
      val k = 2 + rnd.nextInt(3)
      // tiny vocabulary + repeated templates → dense duplicated spans,
      // including within-doc repeats; plus empty + whitespace-only docs
      val docs = randomDocs(rnd, 40) ++
        Seq((98L, ""), (99L, "   "), (100L, "alpha beta"))
      val got = SubstringDedup.substringDedup(
          docs.toDF("doc_id", "text"), "text", "doc_id", k, keepFirst)
        .as[(Long, String, Int, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === model(docs, k, keepFirst),
        s"round $round k=$k keepFirst=$keepFirst")
    }
  }

  test("substringDedupAgainstHistory matches the staged model on random splits") {
    val rnd = new scala.util.Random(98L)
    for (round <- 1 to 4) {
      val k = 2 + rnd.nextInt(3)
      val all = randomDocs(rnd, 40)
      val (hist, batch) = all.partition(_._1 % 2 == 0)
      def gramsOf(tk: Seq[String]): Seq[(Int, String)] =
        (0 to tk.length - k).map(p => p -> tk.slice(p, p + k).mkString(" "))
      val histGrams = hist.flatMap { case (_, t) =>
        gramsOf(t.trim.split("\\s+").toSeq).map(_._2) }.toSet
      val toks = batch.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
      val occs = for ((id, tk) <- toks; (p, g) <- gramsOf(tk)) yield (g, id, p)
      val firstIn = occs.groupBy(_._1).map { case (g, os) =>
        g -> os.map(o => (o._2, o._3)).min }
      val batchCnt = occs.groupBy(_._1).map { case (g, os) => g -> os.size }
      val removable = occs.filter { case (g, id, p) =>
        histGrams(g) || (batchCnt(g) >= 2 && firstIn(g) != ((id, p)))
      }.map(o => (o._2, o._3)).toSet
      val expect = toks.map { case (id, tk) =>
        val rem = tk.indices.filter(p =>
          (math.max(0, p - k + 1) to p).exists(s => removable((id, s)))).toSet
        id -> ((tk.indices.filterNot(rem).map(tk).mkString(" "),
                rem.size, tk.length))
      }.toMap
      val got = SubstringDedup.substringDedupAgainstHistory(
          batch.toDF("doc_id", "text"),
          SubstringDedup.gramIndex(hist.toDF("doc_id", "text"), "text", "doc_id", k),
          "text", "doc_id", k)
        .as[(Long, String, Int, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === expect, s"round $round k=$k")
    }
  }

  test("scrubContaminatedSpans matches the brute-force taint model on " +
       "random corpora (interval union, per-mille gate)") {
    val rnd = new scala.util.Random(505L)
    for (round <- 1 to 3) {
      val n = 2 + rnd.nextInt(3) // 2..4
      val cap = Seq(0, 100, 500, 1000)(rnd.nextInt(4))
      val corpus = randomDocs(rnd, 35)
      val bench = randomDocs(rnd, 8).map(_._2)
      // driver model: single-space split, bench n-gram set, every corpus
      // position starting a bench gram taints [p, p+n-1]
      def grams(toks: Array[String]): Seq[(Int, String)] =
        if (toks.length < n) Seq.empty
        else (0 to toks.length - n).map(p => p -> toks.slice(p, p + n).mkString(" "))
      val benchSet = bench.flatMap(t => grams(t.split(" ", -1)).map(_._2)).toSet
      val expect = corpus.map { case (id, t) =>
        val toks = t.split(" ", -1)
        val tainted = grams(toks).collect {
          case (p, g) if benchSet(g) => p until (p + n)
        }.flatten.toSet
        val kept = toks.indices.filterNot(tainted)
        val removed = toks.length - kept.size
        id -> ((kept.map(toks).mkString(" "), removed.toLong, toks.length.toLong,
          removed * 1000L <= cap.toLong * toks.length))
      }.toMap
      val got = Dedup.scrubContaminatedSpans(
          corpus.toDF("doc_id", "text"), bench.toDF("text"),
          "text", "doc_id", n, cap)
        .as[(Long, String, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(got === expect, s"round $round n=$n cap=$cap")
    }
  }
}
