package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped vector pooling — the aggregation side of the embedding
  * toolkit: chunk embeddings → document embedding, per-class centroids,
  * IVF retraining inputs. Two shapes, same semantics:
  *
  *  - [[vectorSum]] / [[vectorMean]]: a typed mergeable `Aggregator` over
  *    `array<float>` — element-wise double accumulation in ONE buffer per
  *    group per partition (map-side partial aggregation; a group's
  *    vectors never co-locate before combining). The hot path for wide
  *    aggregations.
  *  - [[vectorSumRows]]: the same sum as a relational plan (posexplode →
  *    groupBy(keys, pos) → decimal sum → re-collect) — exact decimal
  *    arithmetic, so the result is bit-reproducible regardless of
  *    partitioning or merge order, and a DuckDB oracle can replay it
  *    (float summation order across rows is engine-dependent; decimal
  *    addition is associative). Use for audits/oracles; the Aggregator
  *    for throughput.
  *
  * Vectors of differing lengths within a group aggregate over the union
  * length, missing tails contributing nothing (the [[Similarity]]
  * zero-pad convention); null vectors are skipped. */
object VectorAgg {

  private type Buf = (Array[Double], Long)

  private def accumulate(b: Buf, in: Seq[Float]): Buf = {
    if (in == null) return b
    val arr = if (b._1.length >= in.length) b._1
      else java.util.Arrays.copyOf(b._1, in.length)
    var i = 0
    while (i < in.length) { arr(i) += in(i); i += 1 }
    (arr, b._2 + 1)
  }

  private def combine(a: Buf, b: Buf): Buf = {
    val (big, small) = if (a._1.length >= b._1.length) (a._1, b._1) else (b._1, a._1)
    val out = java.util.Arrays.copyOf(big, big.length)
    var i = 0
    while (i < small.length) { out(i) += small(i); i += 1 }
    (out, a._2 + b._2)
  }

  /** Element-wise sum Aggregator; finish returns array<double>. */
  class VectorSum extends Aggregator[Seq[Float], Buf, Seq[Double]] {
    def zero: Buf = (Array.emptyDoubleArray, 0L)
    def reduce(b: Buf, in: Seq[Float]): Buf = accumulate(b, in)
    def merge(a: Buf, b: Buf): Buf = combine(a, b)
    def finish(b: Buf): Seq[Double] = b._1.toSeq
    def bufferEncoder: Encoder[Buf] = Encoders.tuple(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
      Encoders.scalaLong)
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Element-wise mean Aggregator (sum / vector count). */
  class VectorMean extends VectorSum {
    override def finish(b: Buf): Seq[Double] =
      if (b._2 == 0) Nil else b._1.map(_ / b._2).toSeq
  }

  /** Column form: `vectorSum(col("embedding"))`. */
  def vectorSum(vec: Column): Column = udaf(new VectorSum).apply(vec)

  /** Column form: `vectorMean(col("embedding"))`. */
  def vectorMean(vec: Column): Column = udaf(new VectorMean).apply(vec)

  /** Exact relational element-wise sum, one row per (keys, element
    * position): `pos` (0-based), `elem_sum_micro` (the element quantized
    * to fixed-point MICRO-units — `round(double(v) × 10⁶)` — and summed
    * as BIGINT) and the group's `n_vectors`. Integer accumulation is
    * associative AND the quantization is two IEEE double ops every engine
    * performs identically, so the result is bit-reproducible under any
    * partitioning and replayable by a SQL oracle. (A DECIMAL(p,6) cast is
    * NOT portable: engines disagree on float→decimal tie rounding at the
    * last place — measured on real data.) The audit/oracle twin of
    * [[vectorSum]]. */
  def vectorSumElements(df: DataFrame, vecCol: String, keys: Seq[String]): DataFrame = {
    val k = keys.map(col)
    val counts = df.where(col(vecCol).isNotNull)
      .groupBy(k: _*).agg(count(lit(1)).as("n_vectors"))
    df.where(col(vecCol).isNotNull)
      .select(k :+ posexplode(col(vecCol)).as(Seq("pos", "__v")): _*)
      .groupBy(k :+ col("pos"): _*)
      .agg(sum(round(col("__v").cast("double") * 1000000L).cast("long"))
        .as("elem_sum_micro"))
      .join(counts, keys)
  }

  /** Embedding-drift monitor between CONSECUTIVE buckets (days,
    * ingest shards): the exact integer L1 distance between bucket
    * centroid vectors in micro units — the "did the upstream encoder
    * or corpus shift" MLOps alarm. The whole computation stays in
    * exact longs via the common-denominator trick: per dimension,
    * `|mean_a − mean_b| = |sum_a·n_b − sum_b·n_a| / (n_a·n_b)`, so the
    * per-pair fold is `Σ_pos |sa·nb − sb·na|` (one truncating div by
    * `n_a·n_b` at the very end) — no float accumulation order, no
    * sqrt, bit-replayable. Input is [[vectorSumElements]]'s artifact
    * shape, so daily centroid-sum tables persist small and drift
    * replays from artifacts without rescanning vectors. Returns
    * `(bucket, bucket_next, n_a, n_b, l1_micro)` per consecutive
    * present pair (a missing day breaks the chain rather than
    * pretending adjacency). Longs bound the regime: |sums| ≲ 10⁶·n and
    * the product needs `10⁶·n²  < 2⁶³` — fine through ~10⁸-vector
    * buckets; beyond that, lift the two products to DECIMAL(38,0). */
  def centroidDrift(df: DataFrame, vecCol: String,
                    bucketCol: String): DataFrame =
    centroidDriftFromSums(
      vectorSumElements(df, vecCol, Seq(bucketCol)), bucketCol)

  /** [[centroidDrift]]'s read side over an EXISTING centroid-sum
    * table — batch-persisted or streaming-sealed
    * ([[graft.streaming.StreamingViews.streamingCentroidSums]] emits
    * this exact row shape): `(bucketCol, pos, elem_sum_micro,
    * n_vectors)` rows in, consecutive-pair drift rows out. */
  def centroidDriftFromSums(sumsTable: DataFrame,
                            bucketCol: String): DataFrame = {
    // self-join with FULLY renamed sides (fresh aliases mint fresh
    // attributes, so references resolve uniquely — the plain
    // using-columns self-join off a streaming memory view trips
    // conflicting-reference resolution)
    val left = sumsTable
      .select(col(bucketCol).cast("long").as("__xb"), col("pos").as("__xp"),
        col("elem_sum_micro").as("__xs"), col("n_vectors").as("__xn"))
    val right = sumsTable
      .select(col(bucketCol).cast("long").as("__yb"), col("pos").as("__yp"),
        col("elem_sum_micro").as("__ys"), col("n_vectors").as("__yn"))
    left.join(right,
        col("__yb") === col("__xb") + 1L && col("__yp") === col("__xp"))
      .groupBy(col("__xb"), col("__xn"), col("__yn"))
      .agg(sum(abs(col("__xs") * col("__yn") - col("__ys") * col("__xn")))
        .as("__l1s"))
      .select(col("__xb").as("bucket"), (col("__xb") + 1L).as("bucket_next"),
        col("__xn").as("n_a"), col("__yn").as("n_b"),
        expr("__l1s div (__xn * __yn)").as("l1_micro"))
  }

  /** Centroid-distance outlier screen — the mislabeled/corrupt-vector
    * detector: per group (label, day), flag vectors whose squared
    * distance from the group centroid exceeds `threshold`. Exact
    * integer arithmetic end to end: vectors quantize to micro units
    * (the [[vectorSumElements]] convention), and the per-dimension
    * deviation from the mean uses the common-denominator form
    * `(n·v − s) / n` in micro units. The numerator can be negative,
    * where Spark's `div` (truncate) and replay engines' `//` (floor)
    * disagree — so both sides compute the SHIFTED form
    * `((n·v − s) + 10⁷·n) div n − 10⁷`, whose numerator is
    * non-negative whenever the deviation is within 10 units (floor ==
    * truncate there; far beyond any unit-ish embedding), making
    * `d2_micro2 = Σ_pos dev²` bit-replayable — no float accumulation,
    * overflow-safe (per-dim ~10¹², Σ over dims ≪ 2⁶³).
    * Returns every vector with its group size and score plus the
    * verdict — downstream decides whether to drop, re-embed, or audit.
    * One element fan-out + one (group, pos) aggregate + one
    * group-keyed join back; no windows, no pair joins. */
  def centroidOutliers(df: DataFrame, vecCol: String, idCol: String,
                       keys: Seq[String], threshold: Long): DataFrame = {
    require(threshold >= 0L, s"threshold must be non-negative: $threshold")
    val k = keys.map(col)
    val sums = vectorSumElements(df, vecCol, keys)
      .select(k :+ col("pos") :+ col("elem_sum_micro").as("__s") :+
        col("n_vectors").as("__n"): _*)
    df.where(col(vecCol).isNotNull)
      .select(k :+ col(idCol) :+
        posexplode(col(vecCol)).as(Seq("pos", "__v")): _*)
      .withColumn("__vm", round(col("__v").cast("double") * 1000000L)
        .cast("long"))
      .join(sums, keys :+ "pos")
      .withColumn("__d",
        expr("((__n * __vm - __s) + 10000000L * __n) div __n - 10000000L"))
      .groupBy(k :+ col(idCol) :+ col("__n"): _*)
      .agg(sum(col("__d") * col("__d")).as("d2_micro2"))
      .select(k :+ col(idCol) :+ col("__n").as("n_vectors") :+
        col("d2_micro2") :+
        (col("d2_micro2") > threshold).as("outlier"): _*)
  }

  /** [[vectorSumElements]] re-collected to one `vec_sum_micro:
    * array<long>` row per group (index order preserved). */
  def vectorSumRows(df: DataFrame, vecCol: String, keys: Seq[String]): DataFrame =
    vectorSumElements(df, vecCol, keys)
      .groupBy(keys.map(col) :+ col("n_vectors"): _*)
      .agg(graft.udafs.CollectOps.sortedCollect(
        Seq(-col("pos")), Seq("vec_sum_micro" -> col("elem_sum_micro")), Int.MaxValue)
        .head.as("vec_sum_micro"))
      .select(keys.map(col) :+ col("vec_sum_micro") :+ col("n_vectors"): _*)
}
