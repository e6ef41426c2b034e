package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: map a corpus of
  * variable-length documents onto fixed-capacity training sequences.
  *
  * Two standard shapes:
  *  - [[packSequences]] — GPT-style "concat and chunk": the corpus is one
  *    virtual token stream in a deterministic document order, cut every
  *    `capacity` tokens; documents straddle sequence boundaries. Every
  *    sequence except the last holds exactly `capacity` tokens — zero
  *    padding waste.
  *  - [[packGreedy]] — whole-document greedy fill: each document lands in
  *    the sequence where its first token falls; documents are never split.
  *    Sequences average `capacity` tokens and overflow by at most one
  *    document's length — chunk long documents first ([[TextOps.chunkRows]])
  *    when a hard cap matters.
  *
  * Both emit a PACKING MAP (doc id → sequence id + token offsets), not
  * materialized text: the map is what a tokenizer-side loader consumes, it
  * is orders of magnitude smaller than the corpus, and building it never
  * moves document bodies through a shuffle. [[packedText]] materializes
  * sequence text from the map when an engine-side corpus is wanted.
  *
  * Scale design: the only global state is an EXCLUSIVE PREFIX SUM of token
  * counts in document order. A naive `sum().over(Window.orderBy(...))` is a
  * single-partition window — one task sorts and scans the whole corpus.
  * [[withExclusivePrefixSum]] instead range-partitions by the order key,
  * windows WITHIN each partition, and shifts each partition by the total of
  * its predecessors (one tiny driver-side action over #partitions rows) —
  * the classic two-phase parallel scan. Identical values, no global sort on
  * one task, and the per-partition windows ride the range exchange that
  * ordering needed anyway.
  */
object Packing {

  /** `out` = sum of `value` over all rows STRICTLY BEFORE this row in
    * `orderCol` order (0 for the first row) — the distributed exclusive
    * prefix sum.
    *
    * `orderCol` must be a TOTAL order (unique per row): rows tied on the
    * order key would otherwise receive order-dependent sums. Null order
    * keys sort last. `value` is read as long; null values count 0.
    *
    * Plan shape: ONE range exchange (the sort the ordering semantics
    * require anyway), a per-partition pre-aggregate collected to the
    * driver (#partitions rows), and a broadcast joined offset per
    * partition. The ranged frame is lazily checkpointed because range
    * partitioning SAMPLES its boundaries — the offsets action and the
    * output action must see the same partitioning or offsets would shift
    * between passes. */
  def withExclusivePrefixSum(df: DataFrame, orderCol: String, value: Column,
                             out: String): DataFrame =
    withExclusivePrefixSumBy(df, Seq(col(orderCol)), value, out)

  /** Multi-key form of [[withExclusivePrefixSum]]: the order is the
    * lexicographic composite of `orderCols` (must be total across rows —
    * make the last key unique). */
  def withExclusivePrefixSumBy(df: DataFrame, orderCols: Seq[Column],
                               value: Column, out: String): DataFrame = {
    val spark = df.sparkSession
    val ord = orderCols.map(_.asc_nulls_last)
    val ranged = df
      .withColumn("__v", coalesce(value.cast("long"), lit(0L)))
      .repartitionByRange(ord: _*)
      .localCheckpoint(eager = false)
      .withColumn("__pid", spark_partition_id())
    val partSums = ranged.groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__s"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    // exclusive scan over partition totals: partition k's offset is the
    // sum of totals of partitions 0..k-1 (range partitions are ordered)
    val offsets = partSums.scanLeft((0, 0L)) {
      case ((_, acc), (pid, s)) => (pid + 1, acc + s)
    }.init.zip(partSums).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid"))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offDf), Seq("__pid"))
      .withColumn(out, col("__off") + coalesce(sum(col("__v")).over(w), lit(0L)))
      .drop("__pid", "__off", "__v")
  }

  /** Concat-and-chunk packing map: documents concatenate in ascending
    * `idCol` order into one virtual token stream, cut every `capacity`
    * tokens. Emits one row per (document, sequence) overlap:
    *
    *   (idCol, seq, doc_tok_start, doc_tok_end, seq_tok_start)
    *
    * where `seq` is the 0-based sequence id, `[doc_tok_start,
    * doc_tok_end)` the 0-based token slice of THIS document placed there,
    * and `seq_tok_start` the slice's offset inside the sequence. Every
    * token of every counted document appears in exactly one slice; every
    * sequence except the last is exactly full.
    *
    * `tokenCountCol` is the caller's tokenizer-of-record count
    * ([[TextOps.tokenCount]], [[TextOps.bpeTokenCount]], a real tokenizer's
    * output — the map is tokenizer-agnostic). Rows with null/zero/negative
    * counts occupy no tokens and emit no slices. `shuffled = true` packs
    * in deterministic-shuffle order — ([[graft.ops.Sampling.hashScore]],
    * id) instead of raw id order — the reproducible random document order
    * training runs want, at identical cost (the prefix sum just range-
    * partitions on the hash key; a re-run, any partition layout, or an
    * external engine replays the same order).
    *
    * idCol must be unique and non-null (the packing order). */
  def packSequences(docs: DataFrame, idCol: String, tokenCountCol: String,
                    capacity: Long, shuffled: Boolean = false): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val counted = docs
      .select(col(idCol), coalesce(col(tokenCountCol).cast("long"), lit(0L)).as("__n"))
      .where(col("__n") > 0)
    // long-exact sequence ids: `div` (integral divide), never floor(a/b)
    // (double division truncates past 2^53 — corpus token totals reach it)
    withExclusivePrefixSumBy(counted, packOrder(idCol, shuffled), col("__n"), "__cum0")
      .select(col(idCol), col("__n"), col("__cum0"),
        explode(sequence(
          expr(s"__cum0 div ${capacity}L"),
          expr(s"(__cum0 + __n - 1) div ${capacity}L"))).as("seq"))
      .select(col(idCol), col("seq"),
        greatest(col("seq") * capacity - col("__cum0"), lit(0L)).as("doc_tok_start"),
        least(col("__n"), (col("seq") + 1) * capacity - col("__cum0")).as("doc_tok_end"),
        greatest(col("__cum0") - col("seq") * capacity, lit(0L)).as("seq_tok_start"))
  }

  /** Packing order: raw id, or the deterministic shuffle (hash, id) —
    * the id tiebreak keeps the order total under 32-bit hash-prefix
    * collisions. */
  private def packOrder(idCol: String, shuffled: Boolean): Seq[Column] =
    if (shuffled) Seq(graft.ops.Sampling.hashScore(col(idCol)), col(idCol))
    else Seq(col(idCol))

  /** Whole-document greedy packing map: in ascending `idCol` order, each
    * document goes to the sequence where its first token falls —
    * `seq = floor(prefix_tokens / capacity)`. Emits one row per document:
    *
    *   (idCol, seq, seq_tok_start, n_tokens)
    *
    * Documents are never split, so a document whose tokens straddle the
    * boundary overflows its sequence: sequences average `capacity` tokens
    * and exceed it by less than their last document's length. The standard
    * no-split trade; pre-chunk with [[TextOps.chunkRows]] for a hard cap.
    * Zero/null-count documents are dropped (they occupy no tokens). */
  def packGreedy(docs: DataFrame, idCol: String, tokenCountCol: String,
                 capacity: Long, shuffled: Boolean = false): DataFrame =
    packGreedyBy(docs, idCol, tokenCountCol, capacity,
      packOrder(idCol, shuffled))

  /** [[packGreedy]] under a CALLER-SUPPLIED packing order — the hook for
    * similarity-adjacent ("in-context") packing: order by a content key
    * (e.g. [[graft.dedup.Dedup.minShingleKey]], a MinHash bucket, or a
    * cluster id) and related documents land in the same context windows,
    * the scalable approximation of in-context pretraining's
    * retrieval-ordered batches. `orderCols` must be a TOTAL order — make
    * the last key the unique id; ties would otherwise receive
    * order-dependent sequence assignments. Same plan shape as
    * [[packGreedy]]: the one range exchange the ordering needs anyway,
    * per-partition windows, #partitions-row driver offsets. */
  def packGreedyBy(docs: DataFrame, idCol: String, tokenCountCol: String,
                   capacity: Long, orderCols: Seq[Column]): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    // evaluate the order keys ONCE into a narrow projection: the prefix
    // sum localCheckpoints its range exchange, and a checkpoint blocks
    // column pruning — carrying the caller's full row (text bodies!)
    // through it would be a width regression
    val keyed = orderCols.zipWithIndex.map { case (c, i) => c.as(s"__k$i") }
    val counted = docs
      .select(col(idCol) +: keyed :+
        coalesce(col(tokenCountCol).cast("long"), lit(0L)).as("__n"): _*)
      .where(col("__n") > 0)
    withExclusivePrefixSumBy(counted,
        keyed.indices.map(i => col(s"__k$i")), col("__n"), "__cum0")
      .select(col(idCol),
        expr(s"__cum0 div ${capacity}L").as("seq"),
        (col("__cum0") - expr(s"__cum0 div ${capacity}L") * capacity).as("seq_tok_start"),
        col("__n").as("n_tokens"))
  }

  /** Whole-document BEST-FIT-DECREASING packing: the high-fill-efficiency
    * no-split variant ([[packGreedy]] leaves the boundary-straddling gap
    * unfilled; BFD back-fills it with smaller documents). Documents hash-
    * distribute across `numPartitions` tasks; each task sorts its slice
    * size-descending and best-fits into open bins (tightest remaining
    * capacity that fits, via a TreeMap — O(n log bins) per task, never
    * the naive first-fit scan). Emits one row per doc:
    *
    *   (idCol, seq, seq_tok_start, n_tokens)
    *
    * No bin ever exceeds `capacity` — an oversize document (n > capacity)
    * gets a dedicated overflow bin (`seq_tok_start` 0) rather than being
    * dropped or split; pre-chunk with [[TextOps.chunkRows]] if oversize
    * docs should split instead.
    *
    * Bin ids are `(partition << 32) | localBin` — non-contiguous by
    * design (contiguity would serialize the packing). Packing is
    * deterministic for a fixed `numPartitions` (hash placement + in-task
    * sort order are both keyed on (size, id)); unlike the stream shapes
    * it is NOT partition-layout-independent — pin `numPartitions` when
    * the artifact must be reproducible. Scale: each task's open-bin index
    * is O(its bins) longs; no shuffle carries document bodies. */
  def packBestFit(docs: DataFrame, idCol: String, tokenCountCol: String,
                  capacity: Long, numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val spark = docs.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val counted = docs
      .select(col(idCol), coalesce(col(tokenCountCol).cast("long"), lit(0L)).as("__n"))
      .where(col("__n") > 0)
      .repartition(parts, col(idCol))
      .sortWithinPartitions(col("__n").desc, col(idCol).asc_nulls_last)
    val outSchema = org.apache.spark.sql.types.StructType(
      counted.schema.fields.filterNot(_.name == "__n") ++ Seq(
        org.apache.spark.sql.types.StructField("seq",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("seq_tok_start",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType, nullable = false)))
    counted.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      // remaining capacity -> bin ids at that remaining (LIFO; ties are
      // deterministic because insertion order follows the sorted input)
      val open = new java.util.TreeMap[Long, java.util.ArrayDeque[Long]]()
      var nextBin = 0L
      val fill = scala.collection.mutable.LongMap.empty[Long] // bin -> used
      rows.map { r =>
        val n = r.getLong(1)
        val entry = open.ceilingEntry(n)
        val bin = if (entry == null || n > capacity) {
          val b = nextBin; nextBin += 1; fill(b) = 0L; b
        } else {
          val q = entry.getValue
          val b = q.pop()
          if (q.isEmpty) open.remove(entry.getKey)
          b
        }
        val start = fill(bin)
        fill(bin) = start + n
        val rem = capacity - fill(bin)
        if (rem > 0) open.computeIfAbsent(rem, _ => new java.util.ArrayDeque[Long]()).push(bin)
        org.apache.spark.sql.Row(r.get(0), (pid << 32) | bin, start, n)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Packing-efficiency audit over a WHOLE-DOCUMENT packing map
    * ([[packGreedy]] / [[packBestFit]] output — one row per doc with
    * `seq` and `n_tokens`): the padding-waste numbers a training run
    * budgets against before committing a capacity. ONE row:
    *
    *   (n_seqs, n_docs, n_tokens, n_overflow_seqs, padding_tokens,
    *    fill_per_mille)
    *
    * where a sequence's fill is its docs' token sum, `padding_tokens`
    * counts `capacity − fill` over non-overflow sequences (an overflow
    * sequence — greedy boundary straddle or a dedicated oversize bin —
    * pads nothing), and `fill_per_mille` is the integer
    * `n_tokens·1000 div (n_seqs·capacity)` (can exceed 1000 when
    * overflow dominates — exact, engine-replayable, no float drift).
    *
    * Scale: one `groupBy(seq)` with map-side partials + a global
    * single-row aggregate — nothing data-sized on the driver. */
  def packingReport(map: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val perSeq = map.groupBy(col("seq"))
      .agg(sum(col("n_tokens").cast("long")).as("__fill"),
        count(lit(1)).as("__docs"))
    perSeq.agg(
        count(lit(1)).as("n_seqs"),
        sum(col("__docs")).as("n_docs"),
        sum(col("__fill")).as("n_tokens"),
        sum(when(col("__fill") > capacity, 1L).otherwise(0L))
          .as("n_overflow_seqs"),
        sum(when(col("__fill") < capacity, lit(capacity) - col("__fill"))
          .otherwise(0L)).as("padding_tokens"))
      .withColumn("fill_per_mille",
        expr(s"(n_tokens * 1000L) div (n_seqs * ${capacity}L)"))
  }

  /** Materialize sequence text from a [[packSequences]] map: slice each
    * document's whitespace tokens per the map, assemble each sequence's
    * slices in offset order. Emits (seq, seq_text, n_seq_tokens).
    *
    * The join moves only (id, slice bounds) against the docs scan, slices
    * BEFORE the sequence shuffle (a sequence's slices are bounded by
    * `capacity` tokens — never a whole-document array through the group),
    * and reassembles with the same order-preserving collect the corpus
    * cleaners use. Whitespace tokens only — for a real tokenizer, apply
    * the map loader-side instead. */
  def packedText(map: DataFrame, docs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val toksed = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
    map.join(toksed, Seq(idCol))
      .select(col("seq"), col("seq_tok_start"),
        concat_ws(" ", slice(col("__toks"), col("doc_tok_start") + 1,
          col("doc_tok_end") - col("doc_tok_start"))).as("__piece"),
        (col("doc_tok_end") - col("doc_tok_start")).as("__pn"))
      .groupBy(col("seq"))
      .agg(
        // sortedCollect orders DESCENDING — negate for offset order
        graft.udafs.CollectOps.sortedCollect(
          Seq(-col("seq_tok_start")), Seq("__pieces" -> col("__piece")), Int.MaxValue)
          .head.as("__ordered"),
        sum(col("__pn")).as("n_seq_tokens"))
      .select(col("seq"), concat_ws(" ", col("__ordered")).as("seq_text"),
        col("n_seq_tokens"))
  }
}
