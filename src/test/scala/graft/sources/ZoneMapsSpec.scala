package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** File-level zone maps ([[ZoneMaps]]): the manifest-pruned read must
  * (a) equal the plain filtered read exactly and (b) actually SKIP
  * files on a range-clustered layout — the property the oracle gate
  * (q193) can't see from row content alone. */
class ZoneMapsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-zm").toString

  test("pruned read equals the filtered read and skips files") {
    val dir = tmp()
    (0L until 1000L).map(i => (i, s"r$i")).toDF("k", "s")
      .repartitionByRange(8, col("k"))
      .write.mode("overwrite").parquet(dir)
    val manifest = ZoneMaps.build(spark, dir, Seq("k"))
    val (total, kept) = ZoneMaps.pruneStats(manifest, "k", 100L, 220L)
    assert(total === 8L)
    assert(kept < total) // range layout → most zones disjoint from [100,220]
    val got = ZoneMaps.prunedRead(spark, dir, manifest, "k", 100L, 220L)
      .as[(Long, String)].collect().toSet
    val exp = spark.read.parquet(dir).where(col("k").between(100L, 220L))
      .as[(Long, String)].collect().toSet
    assert(got === exp)
    assert(got.size === 121)
  }

  test("all-null zones are skipped; nulls never match a range anyway") {
    val dir = tmp()
    val withK = (0L until 50L).map(i => (Some(i), s"a$i"))
    val nullK = (0 until 50).map(i => (None: Option[Long], s"b$i"))
    withK.toDF("k", "s").coalesce(1).write.mode("overwrite").parquet(dir)
    nullK.toDF("k", "s").coalesce(1).write.mode("append").parquet(dir)
    val manifest = ZoneMaps.build(spark, dir, Seq("k"))
    assert(manifest.count() === 2L)
    val (_, kept) = ZoneMaps.pruneStats(manifest, "k", 10L, 20L)
    assert(kept === 1L) // the all-null file's zone is (null, null): dropped
    val got = ZoneMaps.prunedRead(spark, dir, manifest, "k", 10L, 20L)
      .as[(Option[Long], String)].collect().toSet
    assert(got === withK.filter(r => r._1.get >= 10 && r._1.get <= 20).toSet)
  }

  test("an empty surviving list short-circuits with the table schema") {
    val dir = tmp()
    (0L until 100L).map(i => (i, i * 2)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    val manifest = ZoneMaps.build(spark, dir, Seq("k"))
    val got = ZoneMaps.prunedRead(spark, dir, manifest, "k", 5000L, 6000L)
    assert(got.columns.toSeq === Seq("k", "v"))
    assert(got.count() === 0L)
  }

  test("partition-directory columns survive the pruned read") {
    val dir = tmp()
    (0L until 200L).map(i => (i, s"d${i % 2}")).toDF("k", "day")
      .repartitionByRange(4, col("k"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val manifest = ZoneMaps.build(spark, dir, Seq("k"))
    val got = ZoneMaps.prunedRead(spark, dir, manifest, "k", 0L, 40L)
      .select(col("k"), col("day")).as[(Long, String)].collect().toSet
    val exp = (0L to 40L).map(i => (i, s"d${i % 2}")).toSet
    assert(got === exp)
  }
}
