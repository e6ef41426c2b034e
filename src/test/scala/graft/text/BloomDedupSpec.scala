package graft.text

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  test("keyBloom has no false negatives: every inserted key hits") {
    val hist = (1L to 500L).map(i => (i, s"doc $i")).toDF("id", "k")
    val bloom = Dedup.keyBloom(hist, col("k"), expectedItems = 500)
    val hits = hist.where(Dedup.bloomMightContain(bloom, col("k"))).count()
    assert(hits === 500L)
  }

  test("bloomAntiJoin confirm=true == plain anti-join; approx is a no-false-negative subset") {
    val rnd = new scala.util.Random(606L)
    val hist = (1L to 300L).map(i => (i, s"h${rnd.nextInt(200)}")).toDF("id", "k")
    val batch = (1000L to 1400L).map { i =>
      (i, if (rnd.nextBoolean()) s"h${rnd.nextInt(400)}" else s"b$i")
    }.toDF("id", "k")
    val expected = batch.join(hist.select("k"), Seq("k"), "left_anti")
      .select("id").as[Long].collect().toSet
    val got = Dedup.bloomAntiJoin(batch, hist, "k", expectedItems = 0L, confirm = true)
      .select("id").as[Long].collect().toSet
    assert(got === expected)
    // approx mode never keeps a true duplicate (bloom false negatives are
    // impossible); it may drop ~fpp of genuinely-new rows
    val approx = Dedup.bloomAntiJoin(batch, hist, "k", expectedItems = 0L, confirm = false)
      .select("id").as[Long].collect().toSet
    assert(approx.subsetOf(expected))
    val dropped = expected.size - approx.size
    assert(dropped <= math.max(5, expected.size / 10),
      s"approx mode dropped $dropped of ${expected.size} clean rows — fpp way off spec")
  }

  test("empty history bootstrap: the filter contains nothing, the batch passes whole") {
    // BloomFilterAggregate returns NULL at zero items — a null literal
    // would nullify the predicate and silently drop EVERY batch row on
    // the first incremental run; keyBloom must return a valid
    // contains-nothing filter instead
    val empty = Seq.empty[(Long, String)].toDF("id", "k")
    val bloom = Dedup.keyBloom(empty, col("k"), expectedItems = 1)
    val batch = (1L to 50L).map(i => (i, s"doc$i")).toDF("id", "k")
    assert(batch.where(Dedup.bloomMightContain(bloom, col("k"))).count() === 0L)
    val out = Dedup.bloomAntiJoin(batch, empty, "k", bloom, confirm = true)
    assert(out.count() === 50L)
    assert(Dedup.bloomAntiJoin(batch, empty, "k", bloom, confirm = false).count() === 50L)
  }

  test("prebuilt filter bytes are a portable artifact; sizing guards hold") {
    val hist = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "k")
    val bloom = Dedup.keyBloom(hist, col("k"), expectedItems = 100)
    // a filter built in one session works as a literal in any other plan
    val batch = Seq((1L, "v5"), (2L, "brand-new")).toDF("id", "k")
    val out = Dedup.bloomAntiJoin(batch, hist, "k", bloom, confirm = true)
      .select("id").as[Long].collect().toSet
    assert(out === Set(2L))
    intercept[IllegalArgumentException] {
      Dedup.keyBloom(hist, col("k"), expectedItems = 0)
    }
    // an over-sized request clamps to the session caps (degrading fpp)
    // instead of failing Catalyst's checkInputDataTypes
    val huge = Dedup.keyBloom(hist, col("k"), expectedItems = Long.MaxValue / 16)
    assert(huge.nonEmpty)
  }
}
