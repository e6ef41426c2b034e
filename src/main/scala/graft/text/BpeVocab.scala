package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction (Sennrich et al. 2016,
  * arXiv:1508.07909): learn the top-k byte-pair merges from a corpus —
  * the tokenizer-training half of a training-data pipeline, next to the
  * BPE-ish COUNTING that `TextOps.bpeTokens` already does.
  *
  * Faithful to the published algorithm on the word-table compression:
  * merges operate over DISTINCT words weighted by corpus frequency, so
  * each iteration's work is O(|vocab|), not O(corpus). Per merge:
  *
  *   1. adjacent symbol pairs of every word, weighted by word count,
  *      overlapping occurrences counted per position (`zip(ss, ss.tail)`
  *      — the reference implementation's counting);
  *   2. best pair = max total count, ties by (left, right) binary string
  *      order — deterministic on any engine (Spark UTF8String and DuckDB
  *      VARCHAR both compare bytewise);
  *   3. apply = ONE left-to-right greedy pass merging non-overlapping
  *      occurrences ("a a a" + (a,a) → ["aa","a"]) — exactly the
  *      semantics of a non-regex string `replace`, which is what the
  *      DuckDB oracle uses to replay it.
  *
  * Scale shape (100 TB): the word table is the distinct-word vocabulary
  * (Zipf-bounded — ~10⁸ rows for web scale, orders of magnitude under
  * the corpus), built with ONE corpus scan + one groupBy. Each merge
  * iteration is one map over the word table, one pair-count shuffle with
  * map-side partials, and a 1-ROW TakeOrdered collect; lineage is
  * truncated by per-iteration lazy checkpoints with the previous
  * iteration unpersisted (the connectedComponents discipline). The typed
  * per-word merge application is deliberately JVM code — the table is
  * model-sized, not corpus-sized, the same justification as IVF/PQ
  * training. Symbols must not contain U+001F (the oracle's separator);
  * whitespace tokenization guarantees that for any sane corpus.
  */
object BpeVocab {

  final case class Merge(left: String, right: String, count: Long)

  /** Distinct words with corpus occurrence counts — one scan, one
    * shuffle; the only corpus-sized step of training. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Unicode-codepoint split (parity with DuckDB's
    * `regexp_split_to_array(word, '')`). */
  private[text] def codepoints(w: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toIndexedSeq
  }

  /** One greedy left-to-right merge pass (non-overlapping, the
    * `replace`-semantics the oracle replays). */
  private[text] def applyMerge(ss: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < ss.length) {
      if (i + 1 < ss.length && ss(i) == a && ss(i + 1) == b) { out += (a + b); i += 2 }
      else { out += ss(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Learn up to `numMerges` merges. Stops early when no pair occurs
    * twice (a pair seen once compresses nothing). */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol).as[(String, Long)]
      .map { case (w, c) => (w, c, codepoints(w)) }
      .toDF("word", "cnt", "syms")
      .localCheckpoint(eager = false)
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val top = words.as[(String, Long, Seq[String])]
        .flatMap { case (_, c, ss) => ss.iterator.zip(ss.iterator.drop(1)).map(p => (p._1, p._2, c)) }
        .toDF("a", "b", "c")
        .groupBy(col("a"), col("b")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      top.headOption match {
        case Some(Row(a: String, b: String, cnt: Long)) if cnt >= 2 =>
          merges += Merge(a, b, cnt)
          val next = words.as[(String, Long, Seq[String])]
            .map { case (w, c, ss) => (w, c, applyMerge(ss.toIndexedSeq, a, b)) }
            .toDF("word", "cnt", "syms")
            .localCheckpoint(eager = false)
          // this iteration's TakeOrdered materialized `words`; once `next`
          // exists the grandparent's blocks are dead — bound storage to
          // two checkpointed generations (the CC unpersist discipline)
          prev.foreach(_.unpersist())
          prev = Some(words)
          words = next
        case _ => done = true
      }
      i += 1
    }
    prev.foreach(_.unpersist())
    words.unpersist()
    merges.toSeq
  }

  /** Segment every distinct word with a learned merge list and roll the
    * subword counts back up to documents: (idCol, n_words, n_subwords).
    * The merge application runs once per DISTINCT word (model-sized);
    * documents only pay an explode + a word-table join (broadcast when
    * the vocabulary fits, AQE decides). */
  def subwordStats(docs: DataFrame, textCol: String, idCol: String,
                   merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val seg = wordTable(docs, textCol).select(col("word")).as[String]
      .map { w =>
        var ss = codepoints(w)
        merges.foreach(m => ss = applyMerge(ss, m.left, m.right))
        (w, ss.length.toLong)
      }
      .toDF("word", "n_sub")
    docs.where(col(textCol).isNotNull)
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .join(seg, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
  }
}
