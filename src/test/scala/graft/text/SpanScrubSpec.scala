package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.Dedup
import graft.ops.Sampling

/** Span-level decontamination ([[Dedup.scrubContaminatedSpans]]) and the
  * UniMax epoch-capped mixture ([[Sampling.epochCappedMixture]]). */
class SpanScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(corpus: Seq[(Long, String)], bench: Seq[String], n: Int,
                    cap: Int = 1000) =
    Dedup.scrubContaminatedSpans(
        corpus.toDF("doc_id", "text"), bench.toDF("text"),
        "text", "doc_id", n, cap)
      .orderBy(col("doc_id"))
      .select(col("clean_text"), col("removed_tokens"), col("total_tokens"),
        col("kept"))
      .as[(String, Long, Long, Boolean)].collect().toSeq

  test("matched n-gram span is cut, surroundings kept") {
    val r = scrub(Seq(1L -> "keep one SECRET EVAL SPAN here keep two"),
      Seq("x SECRET EVAL SPAN y"), n = 3)
    assert(r === Seq(("keep one here keep two", 3L, 8L, true)))
  }

  test("overlapping matches merge into one interval (no double-count)") {
    // bench contains "a b c d" → corpus grams at pos 1 ("a b c") and
    // pos 2 ("b c d") both match; union covers positions 1-4, not 6 tokens
    val r = scrub(Seq(1L -> "z a b c d z"), Seq("a b c d"), n = 3)
    assert(r === Seq(("z z", 4L, 6L, true)))
  }

  test("clean docs, short docs, and empty bench pass through unchanged") {
    val r = scrub(
      Seq(1L -> "nothing shared here at all", 2L -> "ab"),
      Seq("completely different benchmark text"), n = 3)
    assert(r === Seq(("nothing shared here at all", 0L, 5L, true),
      ("ab", 0L, 1L, true)))
  }

  test("fully-covered doc empties; per-mille gate flags it") {
    val r = scrub(Seq(1L -> "a b c d", 2L -> "a b x y z p q r s t"),
      Seq("a b c d"), n = 4, cap = 300)
    // doc 1 is the benchmark verbatim → all 4 tokens cut, kept=false
    // doc 2 shares no 4-gram → untouched
    assert(r === Seq(("", 4L, 4L, false),
      ("a b x y z p q r s t", 0L, 10L, true)))
  }

  test("per-mille gate is integer-exact at the boundary") {
    // 1 of 10 tokens removed = exactly 100 per-mille: kept at cap 100,
    // dropped at cap 99 (strict integer compare, no float rounding) —
    // n=1 so the cut is exactly one token
    val one = scrub(Seq(1L -> "S z1 z2 z3 z4 z5 z6 z7 z8 z9"), Seq("S"),
      n = 1, cap = 100)
    assert(one.head._2 === 1L && one.head._4 === true)
    val strict = scrub(Seq(1L -> "S z1 z2 z3 z4 z5 z6 z7 z8 z9"), Seq("S"),
      n = 1, cap = 99)
    assert(strict.head._4 === false)
  }

  test("unimax waterfill: caps bind ascending, slack waterfalls, budget spent") {
    // tokens: a=10, b=100, c=1000; budget=600, maxEpochs=2
    // ascending: a caps at 20 (share 200), b caps at 200 (share 290),
    // c takes the rest 380 (share 380 < cap 2000)
    val docs = (1 to 1) .map(i => ("a", i.toLong, 10L)) ++
      (11 to 12).map(i => ("b", i.toLong, 50L)) ++
      (21 to 30).map(i => ("c", i.toLong, 100L))
    val df = docs.toDF("dom", "id", "n")
    val out = Sampling.epochCappedMixture(df, "dom", "id", "n",
      budgetTokens = 600.0, maxEpochs = 2.0)
    val copies = out.groupBy(col("dom")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // a: rate 2.0 → every doc exactly 2 copies
    assert(copies("a") === 2L)
    // b: rate 2.0 → 4 copies (2 docs × 2)
    assert(copies("b") === 4L)
    // c: rate 0.38 → Bernoulli keeps a subset, never more than 10
    assert(copies("c") <= 10L && copies("c") >= 1L)
    // tokens spent: the capped domains are exact (a 20 + b 200); c's
    // Bernoulli contributes exactly 100 per kept copy (deterministic
    // md5 draws — at 10 docs the realized count may sit far from the
    // 0.38·1000 expectation, which is fine: the EXPECTED spend equals
    // the allocation, the realization is pinned by the hash)
    val spent = out.agg(sum(col("n"))).as[Long].head()
    assert(spent === 220L + copies("c") * 100L)
  }

  test("unimax epochs are 0-based and deterministic across reruns") {
    val df = (1L to 20L).map(i => ("d", i, 10L)).toDF("dom", "id", "n")
    val run1 = Sampling.epochCappedMixture(df, "dom", "id", "n", 260.0, 3.0)
      .orderBy(col("id"), col("epoch"))
      .select(col("id"), col("epoch")).as[(Long, Long)].collect().toSeq
    val run2 = Sampling.epochCappedMixture(df, "dom", "id", "n", 260.0, 3.0)
      .orderBy(col("id"), col("epoch"))
      .select(col("id"), col("epoch")).as[(Long, Long)].collect().toSeq
    assert(run1 === run2)
    // rate = 260/200 = 1.3: every doc has epoch 0, some have epoch 1
    val byId = run1.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byId.size === 20 && byId.values.forall(_.head === 0L))
    assert(run1.count(_._2 === 1L) > 0)
    assert(run1.forall(_._2 <= 1L))
  }

  test("unimax excludes null domains and zero-token domains") {
    val df = Seq((Option("a"), 1L, 10L), (None, 2L, 10L), (Option("z"), 3L, 0L))
      .toDF("dom", "id", "n")
    val out = Sampling.epochCappedMixture(df, "dom", "id", "n", 100.0, 5.0)
      .select(col("id")).as[Long].collect().toSeq
    assert(out.forall(_ === 1L) && out.nonEmpty)
  }

  test("unimax maxDomains guard: a crawl-scale domain key fails loudly, " +
       "not as a silent driver-memory bottleneck") {
    val df = (1L to 50L).map(i => (s"host$i.example", i, 10L))
      .toDF("dom", "id", "n")
    val e = intercept[IllegalArgumentException] {
      Sampling.epochCappedMixture(df, "dom", "id", "n", 100.0, 2.0,
        maxDomains = 40).collect()
    }
    assert(e.getMessage.contains("maxDomains") &&
      e.getMessage.contains("mixture SOURCES"))
    // at or under the cap the waterfill proceeds unchanged
    val ok = Sampling.epochCappedMixture(df, "dom", "id", "n", 1000.0, 2.0,
      maxDomains = 50)
    assert(ok.select(col("dom")).distinct().count() === 50L)
  }
}
