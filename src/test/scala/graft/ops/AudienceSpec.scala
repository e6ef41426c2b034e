package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Theta-sketch audience set algebra ([[Audience]]): exact below
  * nominal capacity, banded above it, day-merge == single pass. */
class AudienceSpec extends SparkSpec {
  import spark.implicits._

  private def exactModel(events: Seq[(Long, String)])
      : Map[(String, String), (Long, Long, Long, Long, Long)] = {
    val sets = events.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val segs = sets.keys.toSeq.sorted
    (for (a <- segs; b <- segs if a < b) yield {
      val (sa, sb) = (sets(a), sets(b))
      (a, b) -> (sa.size.toLong, sb.size.toLong, (sa & sb).size.toLong,
        (sa | sb).size.toLong, (sa -- sb).size.toLong)
    }).toMap
  }

  test("overlap matrix is exact below the sketch's nominal capacity") {
    val rnd = new Random(7)
    val events = (0 until 3000).map(_ =>
      (rnd.nextInt(400).toLong, s"seg${rnd.nextInt(4)}"))
    val got = Audience.segmentOverlapFromEvents(
        events.toDF("user_id", "seg"), "user_id", "seg")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7)))
      .toMap
    assert(got === exactModel(events))
  }

  test("estimates stay within 5% in the approximate regime") {
    // two segments of 30k distinct users with a known 10k overlap —
    // far past lgK 12's 4096 nominal entries
    val a = (0L until 30000L).map(u => (u, "A"))
    val b = (20000L until 50000L).map(u => (u, "B"))
    val got = Audience.segmentOverlapFromEvents(
        (a ++ b).toDF("user_id", "seg"), "user_id", "seg")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().head
    def near(est: Long, truth: Long): Boolean =
      math.abs(est - truth).toDouble <= 0.05 * truth
    assert(near(got._3, 30000L), s"n_a=${got._3}")
    assert(near(got._4, 30000L), s"n_b=${got._4}")
    assert(near(got._5, 10000L), s"n_both=${got._5}")
    assert(near(got._6, 50000L), s"n_union=${got._6}")
    assert(near(got._7, 20000L), s"n_only_a=${got._7}")
  }

  test("merged per-day sketch tables equal a single-pass build") {
    val rnd = new Random(21)
    val all = (0 until 2000).map(_ =>
      (rnd.nextInt(300).toLong, s"seg${rnd.nextInt(3)}"))
    val (day1, day2) = all.splitAt(900)
    val merged = Audience.mergeSegmentSketches(Seq(
      Audience.segmentSketches(day1.toDF("user_id", "seg"), "user_id", "seg"),
      Audience.segmentSketches(day2.toDF("user_id", "seg"), "user_id", "seg")))
    val key = Seq(col("seg_a"), col("seg_b"))
    assert(
      Audience.segmentOverlap(merged).orderBy(key: _*).collect().toSeq ===
        Audience.segmentOverlapFromEvents(
          all.toDF("user_id", "seg"), "user_id", "seg")
          .orderBy(key: _*).collect().toSeq)
  }

  test("null segments drop at the sketch build; a null-keyed sketch table errors") {
    val events = Seq((1L, "A"), (2L, "A"), (3L, null.asInstanceOf[String]))
      .toDF("user_id", "seg")
    val sk = Audience.segmentSketches(events, "user_id", "seg")
    assert(sk.select("seg").as[String].collect().toSeq === Seq("A"))
    // a sketch table that DOES carry a null key (built elsewhere) fails
    // with a descriptive error, not a driver NPE from sorting
    val withNull = sk.unionByName(
      sk.withColumn("seg", lit(null).cast("string")))
    val e = intercept[IllegalArgumentException] {
      Audience.segmentOverlap(withNull)
    }
    assert(e.getMessage.contains("null segment"))
  }

  test("a key-cardinality segment column fails loudly instead of OOMing") {
    val df = (0L until 2000L).map(u => (u, s"u$u")).toDF("user_id", "seg")
    val e = intercept[IllegalArgumentException] {
      Audience.segmentOverlapFromEvents(df, "user_id", "seg")
    }
    assert(e.getMessage.contains("maxSegments"))
  }

  test("bucketChurn: hand-checked kept/gone/new; missing day breaks the chain") {
    // day 0: {1,2,3}; day 1: {2,3,4,5}; day 3: {9} (day 2 missing)
    val events = Seq(
      (1L, 0L), (2L, 0L), (3L, 0L),
      (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (9L, 3L)).toDF("user_id", "day")
    val got = Audience.bucketChurn(
        Audience.segmentSketches(events, "user_id", "day"), "seg")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // exact regime (3-5 keys ≪ 2^12): kept {2,3}=2, gone {1}=1,
    // new {4,5}=2; no 1→2 or 2→3 row — absence, not zeros
    assert(got === Seq((0L, 1L, 3L, 4L, 2L, 1L, 2L)))
  }
}
