package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // (user, ts, event_id, kind)
    (1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"), (1L, 150L, 3L, "a"),
    (2L, 50L, 4L, "c"), (2L, 60L, 5L, "c")
  ).toDF("user", "ts", "event_id", "kind")

  test("latestPerKey keeps exactly the max-order row per key") {
    val out = Relational.latestPerKey(events, Seq("user"),
      Seq(col("ts").desc, col("event_id").desc))
      .select("user", "event_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 2L -> 5L))
  }

  test("argminPerKey returns earliest payload per key with partial agg") {
    val out = Relational.argminPerKey(events, Seq("user", "kind"), col("ts"), Seq("event_id"))
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set((1L, "a", 1L), (1L, "b", 2L), (2L, "c", 4L)))
  }

  test("antiJoinDedupe drops rows whose key exists in history") {
    val history = Seq((1L, "a"), (2L, "c")).toDF("user", "kind")
    val out = Relational.antiJoinDedupe(events, history, Seq("user", "kind"))
      .select("event_id").as[Long].collect().toSet
    assert(out === Set(2L)) // only (1,b) survives
  }

  test("incrementalDedupe = anti-join then earliest-per-key") {
    val history = Seq((9L, "zz")).toDF("user", "kind") // nothing matches
    val out = Relational.incrementalDedupe(events, history, Seq("user", "kind"),
      col("ts"), Seq("event_id"))
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set((1L, "a", 1L), (1L, "b", 2L), (2L, "c", 4L)))
  }
}
