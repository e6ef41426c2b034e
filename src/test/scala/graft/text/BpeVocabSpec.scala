package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** BPE merge learning: hand-computed merges on a tiny corpus, the greedy
  * overlap semantics, early stop, and doc-level segmentation rollup. */
class BpeVocabSpec extends SparkSpec {
  import spark.implicits._

  test("train learns hand-computed merges and stops when no pair repeats") {
    // word counts: "ab" ×3, "ac" ×2 → pairs (a,b):3, (a,c):2
    val docs = Seq((1L, "ab ab ac"), (2L, "ab ac")).toDF("doc_id", "text")
    val merges = BpeVocab.train(docs, "text", numMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.count)) ===
      Seq(("a", "b", 3L), ("a", "c", 2L)))
    // after both merges every word is a single symbol → early stop at 2
  }

  test("greedy pass counts overlaps per position but merges non-overlapping") {
    // "aaa": pairs (a,a) at two positions → count 2; the merge pass is
    // greedy left-to-right, so aaa → [aa, a] (not [a, aa])
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val merges = BpeVocab.train(docs, "text", numMerges = 1)
    assert(merges.map(m => (m.left, m.right, m.count)) === Seq(("a", "a", 4L)))
    assert(BpeVocab.applyMerge(Vector("a", "a", "a"), "a", "a") === Vector("aa", "a"))
  }

  test("tie-break is (count desc, left, right) binary order") {
    // (a,b) and (b,a) both occur twice → (a,b) wins the tie
    val docs = Seq((1L, "ab ab ba ba")).toDF("doc_id", "text")
    val merges = BpeVocab.train(docs, "text", numMerges = 1)
    assert(merges.head.left === "a" && merges.head.right === "b")
  }

  test("subwordStats rolls segmentation back to documents") {
    val docs = Seq((1L, "ab ab ac"), (2L, "ab ac")).toDF("doc_id", "text")
    val merges = BpeVocab.train(docs, "text", numMerges = 5)
    val out = BpeVocab.subwordStats(docs, "text", "doc_id", merges)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long)].collect().toSeq
    // ab → [ab] (1 subword), ac → [ac] (1 subword after merge 2)
    assert(out === Seq((1L, 3L, 3L), (2L, 2L, 2L)))
    // with NO merges every word splits to characters
    val raw = BpeVocab.subwordStats(docs, "text", "doc_id", Nil)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(raw === Seq((1L, 3L, 6L), (2L, 2L, 4L)))
  }

  test("codepoints splits astral-plane characters whole") {
    assert(BpeVocab.codepoints("a😀b") === Vector("a", "😀", "b"))
  }
}
