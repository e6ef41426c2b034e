package graft.json

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Fixture pings cover the reference's variant categories (FIXTURES.md §3):
  * old-style single-sync, new-style multi-sync, engines with validation/
  * outgoing, top-level ids (Android), and positional event lists — written
  * fresh for this suite. */
class SyncPingSpec extends SparkSpec {
  import spark.implicits._

  private val newStyle =
    """{"application":{"name":"TestApp","channel":"release"},
       "payload":{"version":1,"os":{"name":"Linux","version":"6.1","locale":"en-US"},
        "syncs":[
         {"when":1000,"took":50,"uid":"u1","deviceID":"d1",
          "status":{"sync":"success","service":"ok"},"why":"schedule",
          "engines":[
            {"name":"bookmarks","took":10,"status":"ok",
             "incoming":{"applied":3,"failed":1,"newFailed":0,"reconciled":2},
             "outgoing":[{"sent":5,"failed":0},{"sent":2,"failed":1}],
             "validation":{"version":2,"checked":100,"took":9,
               "problems":[{"name":"orphans","count":3},{"name":"missing","count":2}]}},
            {"name":"history","took":20,"status":"ok"}],
          "devices":[{"id":"d1","version":"99","os":"Linux"},
                     {"id":"d2","version":"98","os":"Android"}]},
         {"when":2000,"took":60,"uid":"u1","deviceID":"d1"}]}}""".replaceAll("\n\\s*", "")

  private val oldStyle =
    """{"payload":{"when":500,"took":30,"uid":"u2","status":{"sync":"fail"},
        "engines":[{"name":"tabs","took":5}]}}""".replaceAll("\n\\s*", "")

  // `outgoing` as a bare object instead of an array — the reference counts
  // it as ONE batch with its sent/failed (SyncPingConversion.scala:262-276)
  private val bareOutgoing =
    """{"payload":{"when":700,"took":9,"uid":"u5",
        "engines":[{"name":"passwords","took":3,"outgoing":{"sent":5}}]}}"""
      .replaceAll("\n\\s*", "")

  private val topLevelIds =
    """{"uid":"u3","deviceID":"d9","os":{"name":"Android","version":"14"},
       "payload":{"syncs":[{"when":3000,"took":10}]}}""".replaceAll("\n\\s*", "")

  private val eventPing =
    """{"uid":"u4","payload":{"deviceID":"d1",
        "syncs":[{"when":1,"uid":"u4","devices":[{"id":"d1","version":"7","os":"iOS"}]}],
        "events":[[123,"sync","displayURI","sendcommand","tabX"],
                  [456,"sync","open","uri"],
                  ["bad"]]}}""".replaceAll("\n\\s*", "")

  private def parsed = SyncPing.parse(
    Seq(newStyle, oldStyle, bareOutgoing, topLevelIds, eventPing).toDF("json"), "json")

  test("nestedRows: one row per sync, old-style + top-level-id fallbacks") {
    val rows = SyncPing.nestedRows(parsed)
    val byUid = rows.select("uid", "when", "os_name").as[(String, Long, String)]
      .collect().groupBy(_._1)
    assert(byUid("u1").map(_._2).toSet === Set(1000L, 2000L))
    assert(byUid("u2").head._2 === 500L)
    assert(byUid("u3").head._2 === 3000L)      // uid hoisted from top level
    assert(byUid("u3").head._3 === "Android")  // os hoisted from top level
    assert(byUid("u1").head._3 === "Linux")
  }

  test("flatRows: per-engine explode with outgoing/validation rollups") {
    val flat = SyncPing.flatRows(parsed)
    val bk = flat.where(col("engine_name") === "bookmarks").head()
    assert(bk.getAs[Long]("engine_outgoing_batches") === 2L)
    assert(bk.getAs[Long]("engine_outgoing_sent") === 7L)
    assert(bk.getAs[Long]("engine_outgoing_failed") === 1L)
    assert(bk.getAs[Long]("engine_validation_problems") === 5L)
    assert(bk.getAs[Long]("engine_incoming_applied") === 3L)
    // engine-less sync (u1/when=2000) survives via explode_outer
    assert(SyncPing.flatRows(parsed).where(col("when") === 2000).count() === 1)
    // no-outgoing engine: nulls, not zero
    val hist = flat.where(col("engine_name") === "history").head()
    assert(hist.isNullAt(hist.fieldIndex("engine_outgoing_sent")))
    // bare-object outgoing = ONE batch, its sent/failed (failed absent -> 0)
    val pw = flat.where(col("engine_name") === "passwords").head()
    assert(pw.getAs[Long]("engine_outgoing_batches") === 1L)
    assert(pw.getAs[Long]("engine_outgoing_sent") === 5L)
    assert(pw.getAs[Long]("engine_outgoing_failed") === 0L)
  }

  test("eventRows: positional decode + row-local device lookup join") {
    val ev = SyncPing.eventRows(parsed).orderBy("event_timestamp")
    val rows = ev.collect()
    assert(rows.length === 2) // ["bad"] rejected by arity guard
    val first = rows(0)
    assert(first.getAs[String]("uid") === "u4")
    assert(first.getAs[Long]("event_timestamp") === 123L)
    assert(first.getAs[String]("event_string_value") === "tabX")
    assert(first.getAs[String]("device_version") === "7")  // looked up from devices
    assert(first.getAs[String]("device_os") === "iOS")
    assert(rows(1).getAs[String]("event_string_value") === null) // 4-ary
  }

  test("observeShredding: processed/ignored/failed triple") {
    val docs = Seq(
      newStyle,                                  // processed
      oldStyle,                                  // processed
      """{"payload":{"version":1}}""",           // parses, no syncs -> ignored
      """{"payload":{"syncs":[{"took":5}]}}""",  // sync without when/uid -> ignored
      """not json at all {{{""")                 // unparseable -> failed
    val obs = new org.apache.spark.sql.Observation("shred")
    val observed = SyncPing.observeShredding(
      SyncPing.parse(docs.toDF("json"), "json"), obs)
    val out = SyncPing.nestedRows(observed)
    assert(out.count() === 3) // u1 x2 + u2
    val m = obs.get
    assert(m("processed") === 2L)
    assert(m("ignored") === 2L)
    assert(m("failed") === 1L)
  }

  test("Events.fromJsonList: arity dispatch, coercion, rejects") {
    val evs = Events.fromJsonList(
      """[[1,"c","m","o","s",{"k":1,"s":"x","n":null,"b":true}],
          [2,"c","m","o","s"],[3,"c","m","o],[4,"c","m","o"],
          [5,"c","m","o",null,{}], ["x"], [6,"c","m","o","s",{},"extra"]]"""
        .replaceAll("\n\\s*", ""))
    // note: [3,...] above has a malformed string on purpose → whole list
    // fails to parse? no — malformed JSON -> empty
    assert(evs.isEmpty)
    val good = Events.fromJsonList(
      """[[1,"c","m","o","s",{"k":1,"s":"x","n":null,"b":true}],
          [2,"c","m","o","s"],[4,"c","m","o"],
          [5,"c","m","o",null,{}], ["x"], [6,"c","m","o","s",{},"extra"]]"""
        .replaceAll("\n\\s*", ""))
    assert(good.map(_.timestamp) === Seq(1L, 2L, 4L, 5L))
    assert(good.head.mapValues.get === Map("k" -> "1", "s" -> "x", "n" -> "null", "b" -> "true"))
    assert(good(3).stringValue === None)
    assert(good.head.withProcess("parent").mapValues.get("telemetry_process") === "parent")
  }
}
