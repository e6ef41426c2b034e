package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw documents whose hashed-n-gram
  * distribution matches a small target corpus, without training a model.
  *
  * The published recipe: featurize each document as a bag of hashed
  * n-grams (unigrams+bigrams → buckets), fit two bag-of-buckets unigram
  * models (target vs raw), weight each raw document by its importance
  * ratio `Π_g p_target(bucket(g)) / p_raw(bucket(g))`, and resample
  * proportionally. This implementation keeps the engine's oracle-parity
  * discipline — no `ln()` (libm last-ulp divergence breaks hash parity;
  * see q58's note) — by carrying the RATIO PRODUCT itself rather than a
  * log-sum:
  *
  *   - per-bucket ratio = ONE double division of exact integer products
  *     (Laplace-smoothed counts; identical bits on any IEEE engine);
  *   - per-document weight = left-to-right sequential fold over the
  *     document's bigrams multiplying the looked-up ratios — the compiled
  *     [[graft.functions.DsirWeight]] loop, the `aggregate` HOF twin, and
  *     DuckDB's `list_reduce` all fold left, so the product's bits match
  *     exactly across all three;
  *   - selection = deterministic top-k by weight (the paper's top-k
  *     variant), `TakeOrdered` on the driver — no global sort.
  *
  * Scale shape (100 TB): the fit is ONE scan → explode bigrams → bucket →
  * `groupBy(bucket)` with map-side partial aggregation into `dim`
  * buckets (dim ≪ corpus; the paper uses 10⁴) — the aggregate state is
  * O(dim) per task regardless of corpus size. The model is a dim-sized
  * double array shipped to scorers as a LITERAL (no join, no shuffle);
  * weighting is then a pure per-row projection and selection is
  * TakeOrdered (per-partition top-k, driver merge of k·partitions rows).
  * Nothing in the pipeline shuffles except the dim-bucket aggregate.
  *
  * The product stays in double range because ratios are Laplace-smoothed
  * toward 1: a 10⁵-token document drifts at most ~`max|log₂ r|·10⁵` bits
  * of exponent — for pathological corpora (every bigram in one bucket,
  * ratio ≫ 2¹⁰) prefer capping document length upstream; double overflow
  * saturates to `Infinity` which still sorts above finite weights (and
  * identically in both engines).
  */
object Dsir {

  /** Whitespace-token bigrams as strings in position order (the fold
    * order the weight product depends on). Single-token and empty
    * documents get an empty list → weight 1.0 (ratio-neutral). One
    * compiled pass ([[graft.functions.BigramArray]]); [[bigramsHof]] is
    * the interpreted twin the spec cross-checks. */
  def bigrams(text: Column): Column =
    graft.functions.TextExpressions.bigramArray(TextOps.tokens(text))

  /** Higher-order-function twin of [[bigrams]] — interpreted; kept as the
    * independently-derived reference for the parity spec. */
  def bigramsHof(text: Column): Column = {
    val t = TextOps.tokens(text)
    when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))
  }

  /** Engine-replayable bucket: first 8 md5 hex digits as an unsigned int,
    * mod dim — `CAST('0x' || substr(md5(g),1,8) AS BIGINT) % dim` in
    * DuckDB (the [[graft.functions.HashingVector]] bucket function). */
  def bucketOf(gram: Column, dim: Int): Column =
    conv(substring(md5(encode(gram, "UTF-8")), 1, 8), 16, 10)
      .cast("long") % dim

  /** Fit the per-bucket importance ratios in ONE corpus scan.
    *
    * `targetPred` marks the target rows inside `docs` (e.g. a trusted
    * source or language): counting raw and target per bucket in the same
    * aggregate avoids a second scan of the big corpus. Returns the
    * dim-sized ratio model
    *
    *   r[b] = ((cTarget[b]+1)·(totalRaw+dim)) / ((cRaw[b]+1)·(totalTarget+dim))
    *
    * — Laplace smoothing keeps unseen buckets finite, and each ratio is a
    * single division of exactly-representable integer products. The
    * collect is dim rows (the model), nothing more.
    */
  def fitRatios(docs: DataFrame, targetPred: Column, textCol: String,
                dim: Int): Array[Double] = {
    require(dim > 0, s"dim must be positive: $dim")
    // gram→bucket compiled in ONE pass (DsirBuckets): no gram-string
    // materialization, no SQL hex/substring/radix chain — the explode
    // carries 4-byte ints and the groupBy state stays O(dim). The narrow
    // (flag, text) projection fans out first so the hashing uses every
    // core even when the source is a single-split file (no-op at scale).
    val perBucket = TextOps.fanOutSmall(docs
        .where(col(textCol).isNotNull)
        .select(targetPred.as("__t"), col(textCol).as("__text")))
      .select(col("__t"),
        explode(graft.functions.TextExpressions.dsirBuckets(
          TextOps.tokens(col("__text")), dim)).as("__b"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__raw"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__tgt"))
      .collect()
    val raw = new Array[Long](dim)
    val tgt = new Array[Long](dim)
    perBucket.foreach { r =>
      raw(r.getInt(0)) = r.getLong(1)
      tgt(r.getInt(0)) = r.getLong(2)
    }
    val rawTot = raw.sum
    val tgtTot = tgt.sum
    Array.tabulate(dim) { b =>
      ((tgt(b) + 1L) * (rawTot + dim)).toDouble /
        ((raw(b) + 1L) * (tgtTot + dim)).toDouble
    }
  }

  /** Per-document importance weight: left-to-right product of the bucket
    * ratios of the document's bigrams. The model rides the plan as a
    * referenced `double[]` — a per-row projection with no join, and a
    * COMPILED one: [[graft.functions.DsirWeight]] hashes and folds in one
    * codegen pass (the interpreted `aggregate`/`transform` HOF form,
    * preserved as [[importanceWeightHof]], re-ran the lambda interpreter
    * per bigram and was ~20× slower at the same bits). */
  def importanceWeight(text: Column, ratios: Array[Double], dim: Int): Column = {
    require(ratios.length == dim, s"model dim ${ratios.length} != $dim")
    graft.functions.TextExpressions.dsirWeight(TextOps.tokens(text), ratios)
  }

  /** The higher-order-function twin of [[importanceWeight]] — interpreted,
    * kept as the independently-derived reference the spec checks the
    * compiled expression against bit-for-bit (and as the form an engine
    * without expression extension points would run). */
  def importanceWeightHof(text: Column, ratios: Array[Double], dim: Int): Column = {
    require(ratios.length == dim, s"model dim ${ratios.length} != $dim")
    val rl = array(ratios.map(lit).toSeq: _*)
    aggregate(bigramsHof(text), lit(1.0),
      (acc, g) => acc * element_at(rl, (bucketOf(g, dim) + 1).cast("int")))
  }

  /** Fit + weight + deterministic top-k: the DSIR selection pass. Output
    * is `(idCol, dsir_weight)` for the k highest-ratio documents, ties
    * broken by id. */
  def select(docs: DataFrame, targetPred: Column, textCol: String,
             idCol: String, dim: Int, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val ratios = fitRatios(docs, targetPred, textCol, dim)
    TextOps.fanOutSmall(docs.where(col(textCol).isNotNull)
        .select(col(idCol), col(textCol)))
      .select(col(idCol), importanceWeight(col(textCol), ratios, dim)
        .as("dsir_weight"))
      .orderBy(col("dsir_weight").desc, col(idCol))
      .limit(k)
  }
}
