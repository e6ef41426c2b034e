package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** The flagship end-to-end corpus-cleaning pipeline: the composition a
  * training-data user actually runs, as one call —
  *
  *   quality gate → exact dedupe → near-dup clustering → survivor pick
  *
  * Returns one row per input doc with per-stage keep flags (a lineage
  * audit, not just the surviving set — corpus curation needs to report
  * WHY each doc dropped):
  *   `keep_quality` — passed the heuristic quality filters;
  *   `keep_exact`   — also the min-id representative of its exact
  *                    fingerprint group (evaluated among quality passers);
  *   `keep`         — also the min-id survivor of its near-dup cluster
  *                    (n-gram Jaccard pairs → connected components,
  *                    evaluated among exact survivors).
  *
  * Scale shape: stages only narrow the data — the quality gate is
  * scan-side (pure expressions), exact dedupe is one window over the
  * 16-byte fingerprint, and the expensive near-dup join runs on the
  * already-deduped survivor set. Each stage reuses the operator the
  * library exposes individually (`TextOps.qualitySignals`, `TextOps
  * .fingerprint`, `Dedup.ngramJaccardPairs`, `Dedup.connectedComponents`),
  * so the composition is exactly as scalable as its parts.
  */
object Corpus {

  /** q22's keep rule, factored for reuse. */
  def qualityKeep(text: Column, stopwords: Seq[String],
                  minTokens: Int = 10, maxStopwordRatio: Double = 0.5,
                  minDistinctRatio: Double = 0.3): Column = {
    val sig = TextOps.qualitySignals(text, stopwords).toMap
    sig("n_tokens") >= minTokens &&
      sig("stopword_ratio") <= maxStopwordRatio &&
      sig("distinct_token_ratio") >= minDistinctRatio
  }

  /** Partition key for the exact-dedupe window: the md5 fingerprint for
    * quality passers, a per-doc sentinel for failures. Never null — a
    * shared null (or any shared sentinel) would funnel EVERY rejected doc
    * into one window partition, and at crawl scale (~30% failures) a
    * single task would sort a third of the corpus. Unique sentinels keep
    * failure rows in singleton partitions that hash-spread like real
    * fingerprints; the `keep_quality` guard already excludes them from
    * `keep_exact` regardless of key. */
  def exactKey(text: Column, keepQuality: Column, id: Column): Column =
    when(keepQuality, TextOps.fingerprint(text))
      // coalesce: a NULL id would null the whole concat and funnel every
      // null-id failure back into one shared-null partition — fall back to
      // a per-row unique value (the key only needs uniqueness; failures
      // never pass the keep_quality guard regardless of key)
      .otherwise(concat(lit("__fail_"),
        coalesce(id.cast("string"), hex(monotonically_increasing_id()))))

  def clean(docs: DataFrame, textCol: String, idCol: String,
            blockCols: Seq[String], stopwords: Seq[String],
            n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val withQ = docs.withColumn("keep_quality",
      qualityKeep(col(textCol), stopwords))
    val withE = withQ
      .withColumn("fp", exactKey(col(textCol), col("keep_quality"), col(idCol)))
      .withColumn("keep_exact", col("keep_quality") &&
        col(idCol) === min(col(idCol)).over(Window.partitionBy(col("fp"))))
    val pairs = Dedup.ngramJaccardPairs(
      withE.where(col("keep_exact")), textCol, idCol, blockCols, n, threshold)
    val cc = Dedup.connectedComponents(pairs)
    withE.join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("keep", col("keep_exact") &&
        coalesce(col("component"), col(idCol)) === col(idCol))
      .drop("fp", "component")
  }

  /** The full training-mix assembly — the composition this library exists
    * for, as one call:
    *
    *   weighted source mixing → corpus clean (quality / exact / near-dup)
    *   → token-budget subsample → context-window chunking
    *
    * Returns one row per training chunk: (idCol, chunk_id, chunk_text,
    * n_chunk_tokens). Every stage is the individually-exposed (and
    * individually oracle-gated) operator, so the composition inherits
    * their scale shapes: the mixture is shuffle-free, the clean stages
    * only narrow, the budget pass windows over ~2× the budget, and
    * chunking is scan-side. Deterministic end-to-end — same sources,
    * same budget, same corpus out, byte for byte. */
  def assemble(sources: Seq[(DataFrame, Double)], textCol: String,
               idCol: String, blockCols: Seq[String], stopwords: Seq[String],
               n: Int = 3, threshold: Double = 0.5,
               tokenBudget: Long = Long.MaxValue,
               chunkSize: Int = 1024, overlap: Int = 0): DataFrame = {
    val mixed = graft.ops.Sampling.weightedMixture(sources, idCol)
    val cleaned = clean(mixed, textCol, idCol, blockCols, stopwords, n, threshold)
    val keptRaw = cleaned.where(col("keep"))
      .withColumn("__n_tokens", TextOps.tokenCount(col(textCol)).cast("long"))
    // under a real budget, tokenBudgetSample fires two driver-side sizing
    // aggregates before the final consumer pass — lazily checkpoint so the
    // mixture→quality→dedupe→CC pipeline upstream executes once, not 3×
    // (mirrors cleanIncremental's shingled-ONCE discipline); with no budget
    // the sample is an identity with zero actions, so skip the checkpoint
    val kept = if (tokenBudget == Long.MaxValue) keptRaw
               else keptRaw.localCheckpoint(eager = false)
    val budgeted = graft.ops.Sampling.tokenBudgetSample(
      kept, idCol, "__n_tokens", tokenBudget)
    TextOps.chunkRows(budgeted, textCol, idCol, chunkSize, overlap)
  }

  /** The incremental form of [[clean]] — the shape daily ingest actually
    * runs at corpus scale: clean a NEW batch against an accumulated
    * (already-clean) history without re-cleaning the history. Stages only
    * ever touch the batch plus one streaming pass over history:
    *
    *   `keep_quality`    — batch doc passed the quality gate;
    *   `keep_exact`      — also: its fingerprint is NOT in history (anti
    *                       semantics via a fingerprint join — at scale,
    *                       store history fingerprints bucketed and this
    *                       side of the join is shuffle-free) AND it is the
    *                       min-id representative of its in-batch
    *                       fingerprint group;
    *   `keep_vs_history` — also: no n-gram Jaccard near-dup in history
    *                       ([[Dedup.ngramJaccardJoin]] — the cross-corpus
    *                       PPJoin, never a history self-join);
    *   `keep`            — also: the min-id survivor of its in-batch
    *                       near-dup cluster (clusters computed over the
    *                       docs that survived the history stages).
    *
    * History is taken as-is (assumed already deduplicated — it is the
    * OUTPUT of previous rounds); both frames must carry `textCol` and
    * `idCol` under the same names. */
  def cleanIncremental(incoming: DataFrame, history: DataFrame,
                       textCol: String, idCol: String, stopwords: Seq[String],
                       n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val withQ = incoming.withColumn("keep_quality",
      qualityKeep(col(textCol), stopwords))
    val histFp = history
      .select(TextOps.fingerprint(col(textCol)).as("fp")).distinct()
      .withColumn("__in_hist", lit(true))
    val withE = withQ
      .withColumn("fp", exactKey(col(textCol), col("keep_quality"), col(idCol)))
      .join(histFp, Seq("fp"), "left")
      .withColumn("keep_exact", col("keep_quality") && col("__in_hist").isNull &&
        col(idCol) === min(col(idCol)).over(Window.partitionBy(col("fp"))))
    // The batch is shingled ONCE into a checkpointed index that feeds both
    // near-dup stages (each consumes its index several times — the PPJoin
    // prefix plus both verification sides — which would otherwise
    // re-execute the shingle pipeline AND the window+join upstream ~6×).
    // Batch-sized state only, by the incremental contract; history is
    // never materialized — it streams through its own shingle pass and
    // the fingerprint join exactly once.
    val survRows = Dedup.shingleRows(
        withE.where(col("keep_exact")).select(col(idCol), col(textCol)),
        textCol, idCol, Nil, n)
      .localCheckpoint(eager = false)
    val histRows = Dedup.shingleRows(history, textCol, idCol, Nil, n)
    val crossDup = Dedup.ngramJaccardJoinFromRows(
        survRows, histRows, idCol, threshold)
      .select(col("id_l").as(idCol)).distinct()
      .withColumn("__hist_dup", lit(true))
    val withH = withE.join(crossDup, Seq(idCol), "left")
      .withColumn("keep_vs_history",
        col("keep_exact") && col("__hist_dup").isNull)
      .localCheckpoint(eager = false)
    val pairs = Dedup.ngramJaccardPairsFromRows(
      survRows.join(withH.where(col("keep_vs_history")).select(col(idCol)),
        Seq(idCol), "left_semi"),
      idCol, Nil, threshold)
    val cc = Dedup.connectedComponents(pairs)
    withH.join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("keep", col("keep_vs_history") &&
        coalesce(col("component"), col(idCol)) === col(idCol))
      .drop("fp", "component", "__in_hist", "__hist_dup")
  }
}
