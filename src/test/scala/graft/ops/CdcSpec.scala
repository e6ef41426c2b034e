package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot⇄changelog algebra ([[Cdc]]): hand-checked I/U/D
  * classification, null-safe payload comparison, latest-wins apply,
  * and the round-trip identity `apply(base, diff(base, next)) == next`
  * the two operators are documented to satisfy. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val base = Seq(
    (1L, "alice", 10L), (2L, "bob", 20L), (3L, "carol", 30L),
    (4L, "dave", 40L)).toDF("id", "name", "v")
  private val next = Seq(
    (1L, "alice", 10L),          // unchanged — no changelog row
    (2L, "bob", 25L),            // payload changed — U
    (4L, "dan", 40L),            // payload changed — U
    (5L, "erin", 50L))           // new key — I; key 3 gone — D
    .toDF("id", "name", "v")

  test("snapshotDiff classifies I/U/D and drops unchanged rows") {
    val got = rows(Cdc.snapshotDiff(base, next, Seq("id")))
    assert(got === Set(
      Seq(2L, "bob", 25L, "U"),
      Seq(4L, "dan", 40L, "U"),
      Seq(5L, "erin", 50L, "I"),
      Seq(3L, "carol", 30L, "D")))
  }

  test("payload comparison is null-safe: null→value is U, null→null is not") {
    val b = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "name")
    val n = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("id", "name")
    val got = rows(Cdc.snapshotDiff(b, n, Seq("id")))
    assert(got === Set(Seq(2L, "x", "U")))
  }

  test("null-key rows are excluded from the diff, not phantom-matched") {
    val b = Seq((Option(1L), "a"), (Option.empty[Long], "ghost"))
      .toDF("id", "name")
    val n = Seq((Option(1L), "a"), (Option.empty[Long], "other"))
      .toDF("id", "name")
    assert(rows(Cdc.snapshotDiff(b, n, Seq("id"))) === Set.empty)
  }

  test("snapshotDiff rejects mismatched schemas loudly") {
    val bad = base.withColumnRenamed("v", "w")
    val e = intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(base, bad, Seq("id"))
    }
    assert(e.getMessage.contains("schemas differ"))
  }

  test("cdcApply: latest change per key wins, D deletes, I/U upsert") {
    val changes = Seq(
      // key 2: updated at seq 1, deleted at seq 2 — delete wins
      (2L, "bob2", 21L, "U", 1L), (2L, "bob", 20L, "D", 2L),
      // key 3: deleted then re-inserted — the re-insert wins
      (3L, "carol", 30L, "D", 1L), (3L, "carol2", 31L, "I", 2L),
      // key 5: plain insert; key 4: U on existing key (upsert)
      (5L, "erin", 50L, "I", 1L), (4L, "dan", 41L, "U", 1L)
    ).toDF("id", "name", "v", "op", "seq")
    val got = rows(Cdc.cdcApply(base, changes, Seq("id"), "seq"))
    assert(got === Set(
      Seq(1L, "alice", 10L),   // untouched
      Seq(3L, "carol2", 31L),
      Seq(4L, "dan", 41L),
      Seq(5L, "erin", 50L)))
  }

  test("cdcApply rejects a changelog missing op/seq columns") {
    val e = intercept[IllegalArgumentException] {
      Cdc.cdcApply(base, base, Seq("id"), "seq")
    }
    assert(e.getMessage.contains("missing columns"))
  }

  test("round trip: cdcApply(base, snapshotDiff(base, next)) == next") {
    val diff = Cdc.snapshotDiff(base, next, Seq("id"))
      .withColumn("seq", lit(1L))
    val got = Cdc.cdcApply(base, diff, Seq("id"), "seq")
    assert(rows(got) === rows(next))
  }

  test("round trip holds on a randomized churn fixture") {
    val rnd = new scala.util.Random(77)
    val b = (0 until 400).map(i => (i.toLong, rnd.nextInt(50).toLong))
    val n = (0 until 500).flatMap { i =>
      if (i < 400 && rnd.nextBoolean()) None // deletes
      else Some((i.toLong, rnd.nextInt(50).toLong)) // keeps/updates/inserts
    }
    val bDf = b.toDF("id", "v")
    val nDf = n.toDF("id", "v")
    val diff = Cdc.snapshotDiff(bDf, nDf, Seq("id"))
      .withColumn("seq", lit(1L))
    assert(rows(Cdc.cdcApply(bDf, diff, Seq("id"), "seq")) === rows(nDf))
  }
}
