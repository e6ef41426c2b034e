package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.Dedup

/** Null/empty-text contracts across the text-keyed dedup families — the
  * q220/q25 adversarial class stated as operator-level pins. Every
  * operator that joins or groups on a text-derived key must have a
  * DEFINED behavior for content-less docs, because that is exactly where
  * engines diverge: SQL's PARTITION BY/GROUP BY put all NULLs in one
  * group while an equi-join drops NULL keys entirely, and the synthetic
  * fixture corpus (no null text) would mask either choice.
  *
  * The pinned contracts:
  *  - fingerprint/exact: NULL ≡ '' ≡ whitespace-only → md5(''), one group;
  *  - paragraph + substring cleaners: NULL-text docs come out ("",0,0) —
  *    a cleaning operator never silently loses a doc;
  *  - near-dup pair generators: NULL-text docs have no shingles and never
  *    pair (content-less docs are the quality gate's job, and pairing
  *    them would be the classic LSH skew bomb — 10⁶ empty docs in one
  *    bucket is 10¹² pairs); ''-docs pair only via literal equality of
  *    their degenerate single-shingle set, like any identical docs. */
class NullTextContractSpec extends SparkSpec {
  import spark.implicits._

  private val emptyFp = "d41d8cd98f00b204e9800998ecf8427e" // md5("")

  private def docs = Seq(
    (1L, Option("alpha beta gamma delta epsilon zeta")),
    (2L, Option("alpha beta gamma delta epsilon zeta")), // exact dup of 1
    (3L, Option.empty[String]),   // NULL text
    (4L, Option.empty[String]),   // second NULL doc
    (5L, Option("")),             // empty
    (6L, Option("   ")),          // whitespace-only
    (7L, Option("totally different unrelated content"))
  ).toDF("doc_id", "text")

  test("fingerprint: NULL, empty, whitespace-only all hash to md5('') — " +
       "never a NULL key") {
    val fps = docs
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    Seq(3L, 4L, 5L, 6L).foreach(id => assert(fps(id) === emptyFp, s"doc $id"))
    assert(fps.values.forall(_ != null))
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== emptyFp)
  }

  test("Dedup.exact: content-less docs form ONE group, keeper = min id") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .select(col("fp"), col("doc_id"), col("n_copies"))
      .as[(String, Long, Long)].collect()
    val blank = out.filter(_._1 == emptyFp)
    assert(blank.toSeq === Seq((emptyFp, 3L, 4L)))
    assert(out.map(_._3).sum === 7L) // every doc accounted for
  }

  test("paragraphDedupe: NULL-text docs come out ('', 0, 0), not dropped") {
    val out = Dedup.paragraphDedupe(docs, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === (1L to 7L).toSet)
    Seq(3L, 4L, 5L, 6L).foreach(id => assert(out(id) === (("", 0L, 0L)), s"doc $id"))
    // the real dup pair still behaves: doc 1 keeps, doc 2's paragraph drops
    assert(out(1L)._2 === 1L && out(2L) === (("", 0L, 1L)))
  }

  test("substringDedup: NULL-text docs come out ('', 0, 0), not dropped") {
    val out = graft.text.SubstringDedup.substringDedup(docs, "text", "doc_id", k = 3)
      .as[(Long, String, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === (1L to 7L).toSet)
    Seq(3L, 4L).foreach(id => assert(out(id) === (("", 0, 0)), s"doc $id"))
    // '' / whitespace-only docs have ONE empty token — present, nothing removed
    Seq(5L, 6L).foreach(id => assert(out(id) === (("", 0, 1)), s"doc $id"))
    // the duplicated 6-gram run: doc 1 keeps its copy, doc 2 is scrubbed
    assert(out(1L)._2 === 0 && out(2L)._2 === 6)
  }

  test("near-dup pair generators: NULL-text docs never pair") {
    def nullFree(pairs: org.apache.spark.sql.DataFrame): Unit = {
      val ids = pairs.select(col("id_a"), col("id_b"))
        .as[(Long, Long)].collect().flatMap(p => Seq(p._1, p._2)).toSet
      assert(!ids.contains(3L) && !ids.contains(4L), s"null doc paired: $ids")
      assert(ids.contains(1L) && ids.contains(2L), "real dup pair missing")
    }
    nullFree(Dedup.minhashLshPairs(docs, "text", "doc_id",
      n = 3, bands = 16, rowsPerBand = 4, confirmThreshold = Some(0.8)))
    nullFree(Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 3, tables = 4))
    nullFree(Dedup.ngramJaccardPairs(
      docs.withColumn("blk", lit("all")), "text", "doc_id",
      Seq("blk"), n = 3, threshold = 0.8))
  }
}
