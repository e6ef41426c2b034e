package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring removal — the ExactSubstr half of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et al.,
  * 2021), re-expressed token-level and Spark-declarative. Long verbatim
  * spans repeated across a crawl (boilerplate, licenses, quoted articles)
  * survive whole-document dedup because the *documents* differ; this
  * operator removes the repeated span itself.
  *
  * Semantics (deterministic, engine-replayable):
  *  - A doc's tokens are `TextOps.tokens` (whitespace split of trimmed
  *    text); every k-token window at 0-based position p ∈ [0, n−k] is a
  *    "gram".
  *  - A gram occurring ≥ 2 times in the corpus (across or within docs) is
  *    duplicated. With `keepFirst = true` (default) its canonical
  *    occurrence — minimum (id, pos) — is retained; every other occurrence
  *    is removable. With `keepFirst = false` every occurrence is removable
  *    (drop-all: safer when any repetition is suspect).
  *  - A token is removed iff some removable window covers it. Output is
  *    one row per input doc: the surviving tokens rejoined with single
  *    spaces (whitespace-normalized, like [[TextOps.fingerprint]]), plus
  *    removed/total token counts. Docs under k tokens pass through.
  *    NULL-text docs have no token rows and come out as ("", 0, 0) — a
  *    cleaning operator never silently loses a doc.
  *
  * Scale shape (the reason this is not a suffix array): every stage is a
  * standard shuffle Spark already handles at 100 TB —
  *  - per-doc windows (`lead` × (k−1), coverage flags) partition by the
  *    doc id: bounded by the longest document, never by corpus size;
  *  - gram occurrence counting is `groupBy(hash).count` — map-side partial
  *    aggregation absorbs Zipfian hot grams (a boilerplate sentence in 10⁸
  *    docs arrives at the reducer as ~one partial row per map task), and
  *    min(struct(id,pos)) is partially aggregable the same way;
  *  - the occurrence→gram-stats join-back keys on the gram hash and is
  *    AQE-skew-splittable;
  *  - coverage is NOT a token×window join: removable starts and tokens
  *    union into one event stream and a per-doc RANGE frame
  *    (`max(start_flag) over [pos−k+1, pos]`) marks covered tokens — one
  *    exchange by id, no quadratic blow-up on long duplicated runs.
  *
  * Grams are compared via `xxhash64` of the window text (64-bit): two
  * distinct grams colliding within one corpus needs ~10¹⁵ grams; the
  * DuckDB oracle groups by the gram string itself and agrees unless a
  * collision actually occurs (same documented trade as
  * [[graft.dedup.Dedup.shingleRows]]).
  *
  * Gram construction concatenates k tokens per position — O(k) bytes
  * through the hash per position, the standard token-level ExactSubstr
  * cost. A Rabin–Karp rolling hash would amortize that to O(1) (prefix
  * sums mod 2⁶⁴ with an odd-base modular inverse are expressible in pure
  * Long arithmetic), at the price of a weaker hash and the inverse
  * machinery — consciously deferred until a profile shows the concat
  * dominating; at the k=8–20 used for span dedup it does not.
  */
object SubstringDedup {

  /** @return (idCol, clean_text, n_removed, n_tokens) — one row per doc. */
  def substringDedup(docs: DataFrame, textCol: String, idCol: String,
                     k: Int, keepFirst: Boolean = true): DataFrame = {
    val grams = gramRows(docs, textCol, idCol, k)
    // gram stats: corpus occurrence count + canonical (first) occurrence.
    // Both partially aggregable — hot grams combine map-side.
    val stats = grams.groupBy(col("g")).agg(
      count(lit(1)).as("cnt"),
      min(struct(col(idCol), col("pos"))).as("first"))
    val removable = grams.join(stats, "g")
      .where(col("cnt") >= 2 &&
        (if (keepFirst) struct(col(idCol), col("pos")) =!= col("first")
         else lit(true)))
      .select(col(idCol), col("pos"))
    rebuild(docs, textCol, idCol, k, removable)
  }

  /** History gram state for [[substringDedupAgainstHistory]]: one row per
    * DISTINCT k-gram hash — 8 bytes of state per unique gram, the honest
    * minimum for exact cross-batch span dedup. Persist it bucketed by `g`
    * ([[graft.ops.BatchView.writeBucketed]]) and the per-batch lookup
    * plans with no exchange on the history side; after each batch, union
    * in the batch's own `gramIndex` to advance the state. */
  def gramIndex(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    gramRows(docs, textCol, idCol, k).select(col("g")).distinct()

  /** Incremental ExactSubstr: spans in `batch` that duplicate HISTORY
    * grams are removed outright (history kept its copy once — it always
    * wins), and spans duplicated within the batch keep their first
    * (id, pos) occurrence, exactly like [[substringDedup]]. History
    * streams through one semi-join-shaped lookup; its text is never
    * touched. */
  def substringDedupAgainstHistory(batch: DataFrame, historyGrams: DataFrame,
                                   textCol: String, idCol: String,
                                   k: Int): DataFrame = {
    val grams = gramRows(batch, textCol, idCol, k)
    val stats = grams.groupBy(col("g")).agg(
      count(lit(1)).as("cnt"),
      min(struct(col(idCol), col("pos"))).as("first"))
    // one left join carries both signals: in-batch stats + history hit
    // (the join-back keys on `g` — AQE-skew-splittable, and exchange-free
    // on the history side when `historyGrams` is bucketed by `g`)
    val removable = grams.join(stats, "g")
      .join(historyGrams.select(col("g"), lit(1).as("hist")), Seq("g"), "left")
      .where(col("hist").isNotNull ||
        (col("cnt") >= 2 && struct(col(idCol), col("pos")) =!= col("first")))
      .select(col(idCol), col("pos"))
    rebuild(batch, textCol, idCol, k, removable)
  }

  /** (id, pos, g): the xxhash64 of the k-token window at every position.
    * Built scan-side by the compiled [[graft.functions.TokenNgrams]]
    * kernel (exact `concat_ws(" ", window)` parity) + `posexplode`, so
    * gram construction pays NO exchange at all — the pre-kernel
    * lead-window form shuffled and sorted the whole token stream (the
    * corpus-sized intermediate) once per call just to line up the k
    * window words. Positions are 0-based gram starts [0, n−k], identical
    * to the old form; docs with < k tokens yield no gram rows (kernel
    * returns an empty array, as the lead-null filter did). */
  private def gramRows(docs: DataFrame, textCol: String, idCol: String,
                       k: Int): DataFrame = {
    require(k >= 2, s"window must span at least 2 tokens: $k")
    val reserved = Seq("pos", "w", "g", "cnt", "first", "hist", "s", "rem")
    require(!docs.columns.exists(reserved.contains),
      s"input reserves column names ${reserved.mkString(", ")}")
    TextOps.spreadByKey(docs.select(col(idCol), col(textCol)), col(idCol))
      // id-hash spread of the raw text (the Dedup.shingleRows rationale):
      // kernel work + the gram-stats aggregate's map-side partials run
      // cluster-wide; the old window form shuffled AND sorted the bigger
      // token stream to the same end
      .select(col(idCol),
        posexplode(graft.functions.TextExpressions
          .tokenNgrams(TextOps.tokens(col(textCol)), k)).as(Seq("pos", "g0")))
      .select(col(idCol), col("pos"), xxhash64(col("g0")).as("g"))
  }

  private def tokenRows(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "w")))

  /** Coverage + reassembly shared by both forms (see class doc for the
    * event-union RANGE-frame shape). */
  private def rebuild(docs: DataFrame, textCol: String, idCol: String,
                      k: Int, removable: DataFrame): DataFrame = {
    val toks = tokenRows(docs, textCol, idCol)

    // Coverage: token at p is removed iff a removable window starts in
    // [p−k+1, p]. Start events (s=1) union with token events (s=0); a
    // per-doc RANGE frame takes the max flag over the k-wide lookback —
    // duplicate pos values (token + start at the same p) are exactly why
    // this is a range frame, not a rows frame.
    val events = toks.withColumn("s", lit(0)) unionByName
      removable.select(col(idCol), col("pos"), lit(null).cast("string").as("w"),
        lit(1).as("s"))
    val covWin = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rangeBetween(-(k - 1).toLong, 0L)
    val flagged = events
      .withColumn("rem", max(col("s")).over(covWin))
      .where(col("s") === 0)

    // Rebuild: collect_list skips nulls, so gating the struct on the keep
    // flag collects ONLY surviving tokens; array_sort orders by pos (first
    // struct field); per-doc arrays are bounded by doc length.
    val agged = flagged.groupBy(col(idCol)).agg(
      concat_ws(" ", transform(
        array_sort(collect_list(when(col("rem") === 0, struct(col("pos"), col("w"))))),
        x => x("w"))).as("clean_text"),
      sum(col("rem")).cast("int").as("n_removed"),
      count(lit(1)).cast("int").as("n_tokens"))
    // NULL-text docs have no token rows; the left join keeps them in the
    // output as ("", 0, 0) — the [[graft.dedup.Dedup]] paragraph
    // reassemble contract — instead of silently dropping rows from a
    // CLEANING operator (the skinny id-keyed join is the price of never
    // losing a doc)
    docs.select(col(idCol))
      .join(agged, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_removed"), lit(0)).as("n_removed"),
        coalesce(col("n_tokens"), lit(0)).as("n_tokens"))
  }
}
