package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All are pure Column expressions (`functions._` built-ins only) — they
  * stay inside whole-stage codegen and vectorize over the parquet scan; no
  * UDFs, no shuffles. Designed for the `documents` table but generic over
  * any string column.
  */
object TextOps {

  /** Whitespace tokenization (leading/trailing space trimmed). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Mean token length — exact int/int double division (oracle-stable). */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t)
  }

  /** Fraction of tokens found in `words` (e.g. stopwords). */
  def wordSetRatio(text: Column, words: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isInCollection(words))).cast("double") / size(t)
  }

  /** Quality heuristics bundle: length bounds + stopword presence +
    * all-distinct-token ratio. Mirrors common pretraining-corpus filters
    * (Gopher/C4-style rules) with fully deterministic arithmetic. */
  def qualitySignals(text: Column, stopwords: Seq[String]): Seq[(String, Column)] = Seq(
    "n_tokens" -> tokenCount(text),
    "n_chars" -> charCount(text),
    "mean_token_len" -> meanTokenLen(text),
    "stopword_ratio" -> wordSetRatio(text, stopwords),
    "distinct_token_ratio" ->
      (size(array_distinct(tokens(text))).cast("double") / size(tokens(text)))
  )

  /** Language-ID by marker-word voting: score per language = count of
    * tokens in that language's marker set; argmax wins, ties broken by
    * alphabetical language code (deterministic). N-gram-free variant of the
    * classic stopword-profile detector. */
  def langId(text: Column, markers: Map[String, Seq[String]]): Column = {
    val t = tokens(text)
    // argmax by (score, -alphabetical rank): array_max over structs compares
    // fields in order, so ties on score resolve to the alphabetically first
    // language — deterministic on both engines.
    val ranked = markers.keys.toSeq.sorted.zipWithIndex.toMap
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(t, w => w.isInCollection(words))).as("score"),
        lit(-ranked(lang)).as("nrank"), lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lower-cased
    * text — the exact-dedupe key. */
  def fingerprint(text: Column): Column =
    md5(encode(lower(concat_ws(" ", tokens(text))), "UTF-8"))

  /** Polynomial rolling hash over tokens (base-31 Horner form mod 2^31-1 —
    * modular to stay inside Long under ANSI arithmetic). Order-sensitive
    * unlike `fingerprint`'s normalization-insensitive md5 — detects
    * reorderings; used by shingle pipelines. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) =>
      pmod(acc * lit(31L) + crc32(encode(w, "UTF-8")).cast("long"), lit(2147483647L)))
}
