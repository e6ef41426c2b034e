package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping —
  * the lakehouse layout technique for tables filtered on TWO independent
  * columns at once (e.g. events by (user, day), documents by
  * (domain-hash, quality-bucket)).
  *
  * A range-partition + sort on a single column gives perfect row-group
  * min/max pruning on that column and none on any other. Sorting instead
  * on the bit-interleaved key gives BOTH columns locality: any query box
  * `a ∈ [a₀,a₁] ∧ b ∈ [b₀,b₁]` touches O(√files) instead of all of them,
  * because parquet footer min/max stats on the plain columns stay tight
  * when the data is Morton-ordered. Extension beyond the reference (its
  * only layout control is day partitioning + repartition(1) file sizing —
  * MainEventsView.scala:59); standard technique from the public lakehouse
  * engines.
  *
  * Everything is built-in bit arithmetic (shiftleft / bitwiseAND / OR) —
  * codegen'd scan-side, ANSI-SQL-replayable, no UDF.
  */
object ZOrder {

  /** Spread the low 31 bits of a long so bit i lands at position 2i
    * (the classic 5-step mask-shift; even positions). 31 bits, not 32:
    * the interleaved key must stay clear of the long's sign bit or
    * ordering flips for large second-dimension values. */
  private def spreadBits(x: Column): Column = {
    val m = Seq(
      281470681808895L,     // 0x0000FFFF0000FFFF after | x<<16
      71777214294589695L,   // 0x00FF00FF00FF00FF after | x<<8
      1085102592571150095L, // 0x0F0F0F0F0F0F0F0F after | x<<4
      3689348814741910323L, // 0x3333333333333333 after | x<<2
      6148914691236517205L) // 0x5555555555555555 after | x<<1
    val shifts = Seq(16, 8, 4, 2, 1)
    shifts.zip(m).foldLeft(x.bitwiseAND(lit(2147483647L))) {
      case (acc, (s, mask)) =>
        acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(mask))
    }
  }

  /** Morton key of two dimension columns: bits of `a` at even positions,
    * `b` at odd. Inputs are taken modulo 2³¹ (callers hash or bucket
    * wider domains first — interleaving only needs RELATIVE order, so any
    * monotone 31-bit binning of the real domain works). */
  def zorderKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** 3-way spread: bit i of the low 21 bits lands at position 3i (the
    * standard 3-D Morton mask chain). */
  private def spreadBits3(x: Column): Column = {
    val steps = Seq(
      (32, 0x1f00000000ffffL),
      (16, 0x1f0000ff0000ffL),
      (8, 0x100f00f00f00f00fL),
      (4, 0x10c30c30c30c30c3L),
      (2, 0x1249249249249249L))
    steps.foldLeft(x.bitwiseAND(lit(0x1fffffL))) {
      case (acc, (s, mask)) =>
        acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(mask))
    }
  }

  /** Three-dimension Morton key (21 bits per dimension — 63 bits total,
    * sign-bit-safe): `a` at positions 3i, `b` at 3i+1, `c` at 3i+2.
    * Same binning contract as [[zorderKey]], modulo 2²¹ per dimension. */
  def zorderKey3(a: Column, b: Column, c: Column): Column =
    spreadBits3(a)
      .bitwiseOR(shiftleft(spreadBits3(b), 1))
      .bitwiseOR(shiftleft(spreadBits3(c), 2))

  /** Re-layout for a Z-ordered write: range-partition on the Morton key
    * (disjoint key ranges per output file → tight per-file min/max on
    * BOTH dimensions), sort within partitions, drop the key. Pay this
    * one sort at write time; every later two-dimensional filter prunes
    * row groups instead of scanning the table. `numPartitions` sizes the
    * output files (at 100 TB: total bytes / target file size). */
  def cluster(df: DataFrame, a: String, b: String,
              numPartitions: Int): DataFrame = {
    require(!df.columns.contains("__z"),
      "cluster uses a scratch column named __z; rename the input's")
    df.withColumn("__z", zorderKey(col(a), col(b)))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
