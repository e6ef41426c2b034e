package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader over a scale-factor directory
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Mirrors the reference's path-constructed parquet scans
  * (reference: src/main/scala/com/mozilla/telemetry/views/MainEventsView.scala:52) —
  * reads go through `spark.read.parquet` so Catalyst predicate pushdown,
  * column pruning and partition pruning all apply to every downstream query.
  *
  * NOTE on `events.ts`: the file stores TIMESTAMP(NANOS); sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true`, so in Spark `ts` is a
  * nanos-since-epoch LongType. Ordering/comparisons are equivalent to
  * DuckDB's TIMESTAMP_NS; queries must not emit `ts` raw unless the oracle
  * side converts with `epoch_ns(ts)`.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
