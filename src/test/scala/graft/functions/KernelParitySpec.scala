package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized parity pins for the round-16 native eval kernels
  * (TokenNgrams / CharNgrams / ClippedOverlapCount / LcsTokenLength)
  * against independent driver-side models — the codegen path is what
  * the scan runs, so each kernel is exercised through a real projection
  * (whole-stage codegen), not just interpreted eval. Unicode edges are
  * deliberate: multibyte BMP text everywhere, and a supplementary-plane
  * pin for CharNgrams' codepoint walk (the `split(s, "")` regex form
  * would shear the surrogate pair). */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  private val alphabet =
    Vector("a", "b", "ab", "ba", "é", "中", "ß", "Ω", "x1", "zz")

  test("TokenNgrams matches the sliding-window model on random token " +
      "arrays, orders 1-5") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 80).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ =>
        alphabet(rnd.nextInt(alphabet.size))))
    }
    val df = rows.toDF("id", "toks")
    for (n <- 1 to 5) {
      val out = df.select(col("id"),
          TextExpressions.tokenNgrams(col("toks"), n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      rows.foreach { case (id, toks) =>
        val model = if (toks.size < n) Seq.empty[String]
          else toks.sliding(n).map(_.mkString(" ")).toSeq
        assert(out(id) === model, s"n=$n id=$id toks=$toks")
      }
    }
  }

  test("CharNgrams matches the codepoint sliding-window model; " +
      "supplementary-plane codepoints stay whole") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 80).map { i =>
      (i.toLong, (0 until rnd.nextInt(15)).map(_ =>
        alphabet(rnd.nextInt(alphabet.size))).mkString)
    }
    val df = rows.toDF("id", "s")
    for (n <- 1 to 4) {
      val out = df.select(col("id"),
          TextExpressions.charNgrams(col("s"), n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      rows.foreach { case (id, s) =>
        val cps = s.codePoints().toArray.toSeq
          .map(Character.toChars(_).mkString)
        val model = if (cps.size < n) Seq.empty[String]
          else cps.sliding(n).map(_.mkString).toSeq
        assert(out(id) === model, s"n=$n id=$id s=$s")
      }
    }
    // 𝄞 is U+1D11E (two UTF-16 units, one codepoint): bigrams of "a𝄞b"
    // are "a𝄞","𝄞b" — never a bare surrogate half
    val clef = Seq((1L, "a𝄞b")).toDF("id", "s")
      .select(TextExpressions.charNgrams(col("s"), 2))
      .as[Seq[String]].head()
    assert(clef === Seq("a𝄞", "𝄞b"))
  }

  test("ClippedOverlapCount matches the driver multiset-min model and " +
      "is symmetric, random multibyte grams") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 120).map { i =>
      def arr() = (0 until rnd.nextInt(25)).map(_ =>
        alphabet(rnd.nextInt(4)))  // small vocab → real clipping
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(col("id"),
        TextExpressions.clippedOverlapCount(col("a"), col("b")).as("ab"),
        TextExpressions.clippedOverlapCount(col("b"), col("a")).as("ba"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (id, a, b) =>
      val (ca, cb) = (a.groupBy(identity), b.groupBy(identity))
      val model = ca.keys.toSeq
        .map(g => math.min(ca(g).size, cb.getOrElse(g, Nil).size)).sum.toLong
      assert(out(id)._1 === model, s"id=$id")
      assert(out(id)._2 === model, s"symmetry id=$id")
    }
  }

  test("ClippedOverlapMaxCount matches the driver min-of-max-multiset " +
      "model on random reference sets; reduces to ClippedOverlapCount " +
      "for one reference; null/empty references contribute nothing") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 120).map { i =>
      def arr() = (0 until rnd.nextInt(20)).map(_ =>
        alphabet(rnd.nextInt(4)))  // small vocab → real clipping
      (i.toLong, arr(), (0 until 1 + rnd.nextInt(4)).map(_ => arr()))
    }
    val df = rows.toDF("id", "cand", "refs")
    val out = df.select(col("id"),
        TextExpressions.clippedOverlapMaxCount(col("cand"), col("refs"))
          .as("o"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, cand, refs) =>
      val cc = cand.groupBy(identity).map { case (g, v) => g -> v.size }
      val model = cc.map { case (g, c) =>
        math.min(c, refs.map(_.count(_ == g)).max).toLong }.sum
      assert(out(id) === model, s"id=$id cand=$cand refs=$refs")
    }
    // one reference: exactly the pairwise clipped overlap
    val one = rows.map { case (id, cand, refs) => (id, cand, Seq(refs.head)) }
    val pair = one.toDF("id", "cand", "refs")
      .select(col("id"),
        TextExpressions.clippedOverlapMaxCount(col("cand"), col("refs"))
          .as("m"),
        TextExpressions.clippedOverlapCount(col("cand"),
          element_at(col("refs"), 1)).as("p"))
      .as[(Long, Long, Long)].collect()
    pair.foreach { case (id, m, p) => assert(m === p, s"id=$id") }
    // a null reference element never raises and never clips
    val withNull = Seq((1L, Seq("a", "a"), Seq(null, Seq("a"))))
      .toDF("id", "cand", "refs")
      .select(TextExpressions.clippedOverlapMaxCount(col("cand"), col("refs")))
      .as[Long].head()
    assert(withNull === 1L)
  }

  test("TokenEditDistance matches the driver Levenshtein model and " +
      "respects the LCS lower bound d ≥ max(|a|,|b|) − LCS") {
    val rnd = new scala.util.Random(37)
    val rows = (1 to 120).map { i =>
      def arr() = (0 until rnd.nextInt(18)).map(_ =>
        alphabet(rnd.nextInt(5)))
      (i.toLong, arr(), arr())
    }
    def editModel(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.size + 1, b.size + 1)
      for (i <- 0 to a.size) dp(i)(0) = i
      for (j <- 0 to b.size) dp(0)(j) = j
      for (i <- 1 to a.size; j <- 1 to b.size)
        dp(i)(j) = math.min(
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1),
          math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1)
      dp(a.size)(b.size)
    }
    val out = rows.toDF("id", "a", "b")
      .select(col("id"),
        TextExpressions.tokenEditDistance(col("a"), col("b")).as("d"),
        TextExpressions.tokenEditDistance(col("b"), col("a")).as("dr"),
        TextExpressions.lcsLen(col("a"), col("b")).as("lcs"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    rows.foreach { case (id, a, b) =>
      val (d, dr, lcs) = out(id)
      assert(d === editModel(a, b).toLong, s"id=$id a=$a b=$b")
      assert(d === dr, s"symmetry id=$id")
      assert(d >= math.max(a.size, b.size).toLong - lcs, s"LCS bound id=$id")
      assert(d <= math.max(a.size, b.size).toLong)
    }
  }

  test("LcsTokenLength is bounded by clipped overlap and by both sizes " +
      "(LCS ≤ multiset intersection ≤ min side) on random arrays") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 120).map { i =>
      def arr() = (0 until rnd.nextInt(20)).map(_ =>
        alphabet(rnd.nextInt(5)))
      (i.toLong, arr(), arr())
    }
    val out = rows.toDF("id", "a", "b")
      .select(col("id"),
        TextExpressions.lcsLen(col("a"), col("b")).as("lcs"),
        TextExpressions.clippedOverlapCount(col("a"), col("b")).as("o"),
        size(col("a")).as("na"), size(col("b")).as("nb"))
      .as[(Long, Long, Long, Int, Int)].collect()
    out.foreach { case (id, lcs, o, na, nb) =>
      assert(lcs <= o, s"id=$id: LCS $lcs > clipped overlap $o")
      assert(lcs <= math.min(na, nb))
      assert(lcs >= 0L)
    }
    // and the common-prefix lower bound: identical arrays reach min side
    val eq = Seq((1L, Seq("x", "y", "x"), Seq("x", "y", "x")))
      .toDF("id", "a", "b")
      .select(TextExpressions.lcsLen(col("a"), col("b"))).as[Long].head()
    assert(eq === 3L)
  }
}
