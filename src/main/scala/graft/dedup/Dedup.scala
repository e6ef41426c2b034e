package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - exact dedupe is one hash-groupBy (min_by) — single shuffle on the
  *    16-byte fingerprint, map-side partial aggregation;
  *  - pairwise similarity NEVER does a full cross join: candidates come
  *    from either content-blocking keys or LSH band buckets, so the
  *    self-join shuffles on a high-cardinality key and AQE handles skewed
  *    buckets (hot bands) with skew-join splitting;
  *  - all hashing is expression-level (crc32/xxhash64/md5 built-ins) —
  *    codegen'd, no UDFs.
  */
object Dedup {

  /** Exact dedupe: keep the row with min `idCol` per normalized-text
    * fingerprint. One shuffle; returns surviving (id, fingerprint). */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles (distinct), the unit set for Jaccard/MinHash. */
  def shingles(text: Column, n: Int): Column = {
    val t = TextOps.tokens(text)
    array_distinct(
      when(size(t) < n, array(concat_ws(" ", t)))
        .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", slice(t, i, lit(n))))))
  }

  /** Jaccard similarity of two distinct-element arrays — exact |∩|/|∪|
    * integer-ratio division (deterministic across engines). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** N-gram Jaccard near-dup pairs within blocking keys.
    * Self-join on `blockCols` (never a cross join); emits (id_a, id_b,
    * jaccard) for pairs ≥ threshold. Block keys must be chosen so block
    * sizes stay bounded (e.g. lang × source); skewed blocks are split by
    * AQE skew-join handling. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        blockCols: Seq[String], n: Int, threshold: Double): DataFrame = {
    val sh = docs.select(
      (blockCols.map(col) :+ col(idCol) :+ shingles(col(textCol), n).as("sh")): _*)
    val a = sh.select(blockCols.map(col) :+ col(idCol).as("id_a") :+ col("sh").as("sh_a"): _*)
    val b = sh.select(blockCols.map(col) :+ col(idCol).as("id_b") :+ col("sh").as("sh_b"): _*)
    a.join(b, blockCols)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash signature: for each of `numHashes` hash functions
    * h_i(s) = (a_i * x + b_i) mod p over base hash x = xxhash64(shingle),
    * take the min across the document's shingles. Pure expressions
    * (no UDF); deterministic given the seeded parameter family. */
  def minhashSignature(shinglesCol: Column, numHashes: Int, seed: Long = 42L): Column = {
    // 2^31 - 1 (Mersenne prime): a*x < 2^62 keeps the modular multiply
    // inside Long under ANSI arithmetic (no overflow).
    val p = 2147483647L
    val rnd = new scala.util.Random(seed)
    val params = Seq.fill(numHashes)((rnd.nextInt((p - 1).toInt).toLong + 1L,
      rnd.nextInt(p.toInt).toLong))
    val base = transform(shinglesCol, s => pmod(xxhash64(s), lit(p)))
    array(params.map { case (a, b) =>
      array_min(transform(base, x => pmod(x * lit(a) + lit(b), lit(p))))
    }: _*)
  }

  /** MinHash+LSH near-dup candidate pairs: signature → `bands` bands of
    * `rowsPerBand` → explode to (band, bandHash) bucket keys → self-join on
    * buckets → distinct pairs, with optional exact-Jaccard confirmation.
    *
    * The plan at scale: one narrow projection per doc (signature is
    * `bands × rowsPerBand` longs), explode ×bands, shuffle on
    * (band, bucket) — high cardinality, well distributed — then pair-join
    * only within buckets. This is the standard sub-quadratic path; the
    * pairwise confirm only touches candidate pairs.
    */
  def minhashLshPairs(docs: DataFrame, textCol: String, idCol: String,
                      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                      confirmThreshold: Option[Double] = None): DataFrame = {
    val sig = docs.select(col(idCol),
      shingles(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), bands * rowsPerBand))
    val banded = sig.select(col(idCol), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        bnd => xxhash64(concat_ws("_",
          bnd, concat_ws(",", slice(col("sig"), bnd * rowsPerBand + 1, lit(rowsPerBand)))))))
        .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("bucket"), col(idCol).as("id_b"), col("sh").as("sh_b"))
    val cand = l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
    val confirmed = confirmThreshold match {
      case Some(t) => cand.withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
        .where(col("jaccard") >= t)
        .select(col("id_a"), col("id_b"), col("jaccard"))
      case None => cand.select(col("id_a"), col("id_b"))
    }
    confirmed
  }

  /** 64-bit SimHash over token hashes: sign-sum of each bit position,
    * expression-only (unrolled over 64 bits via bit ops on xxhash64). */
  def simhash(text: Column): Column = {
    val hashes = transform(TextOps.tokens(text), w => xxhash64(w))
    (0 until 64).map { bit =>
      val votes = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the high `prefixBits` bits (near-dups
    * share prefixes with high probability), confirm with full Hamming
    * distance ≤ maxDist. Sub-quadratic like LSH banding. */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxDist: Int = 3, prefixBits: Int = 16): DataFrame = {
    val h = docs.select(col(idCol), simhash(col(textCol)).as("sh"))
      .withColumn("blk", shiftrightunsigned(col("sh"), 64 - prefixBits))
    val l = h.select(col("blk"), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val r = h.select(col("blk"), col(idCol).as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("blk")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sh_a"), col("sh_b")).as("dist"))
      .where(col("dist") <= maxDist)
  }
}
