package graft.json

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChatOpsSpec extends SparkSpec {
  import spark.implicits._

  private case class Stats(nTurns: Option[Int], nSystem: Option[Int],
    nUser: Option[Int], nAssistant: Option[Int], startsUser: Option[Boolean],
    alternates: Option[Boolean], endsAssistant: Option[Boolean],
    contentsOk: Option[Boolean], sysPrefixViolated: Option[Boolean],
    valid: Boolean)

  private def stats(js: Seq[String]): Map[Long, Stats] = {
    val df = js.zipWithIndex.map { case (j, i) => (i.toLong, j) }
      .toDF("id", "j")
    val cols = ChatOps.chatStats(col("j"))
    df.select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .collect().map { r =>
        def oi(i: Int) = Option(r.get(i)).map(_.asInstanceOf[Int])
        def ob(i: Int) = Option(r.get(i)).map(_.asInstanceOf[Boolean])
        r.getLong(0) -> Stats(oi(1), oi(2), oi(3), oi(4), ob(5), ob(6),
          ob(7), ob(8), ob(9), r.getBoolean(10))
      }.toMap
  }

  private val good =
    """[{"role":"system","content":"be brief"},
       {"role":"user","content":"hi"},
       {"role":"assistant","content":"hello"},
       {"role":"user","content":"thanks"},
       {"role":"assistant","content":"np"}]""".replaceAll("\n\\s*", "")

  test("a well-formed conversation is valid with exact counts") {
    val s = stats(Seq(good))(0L)
    assert(s === Stats(Some(5), Some(1), Some(2), Some(2), Some(true),
      Some(true), Some(true), Some(true), Some(false), valid = true))
  }

  test("system prefix rule: all-system is NOT violated, mid-system is") {
    // array_position returns 0 (not NULL) on no match: an all-system
    // transcript must still read as un-violated — the whole conversation
    // IS the prefix (it fails validity via starts_user, honestly)
    val allSys =
      """[{"role":"system","content":"a"},{"role":"system","content":"b"}]"""
    val midSys =
      """[{"role":"user","content":"a"},{"role":"system","content":"x"},
         {"role":"assistant","content":"b"}]""".replaceAll("\n\\s*", "")
    val out = stats(Seq(allSys, midSys, "not json", "[]"))
    assert(out(0L).sysPrefixViolated === Some(false) && !out(0L).valid)
    assert(out(1L).sysPrefixViolated === Some(true) && !out(1L).valid)
    assert(out(2L).sysPrefixViolated === None)
    assert(out(3L).sysPrefixViolated === Some(false))
  }

  test("protocol violations each flip exactly their flag") {
    val doubleUser =
      """[{"role":"user","content":"a"},{"role":"user","content":"b"},
         {"role":"assistant","content":"c"}]""".replaceAll("\n\\s*", "")
    val startsAssistant =
      """[{"role":"assistant","content":"a"},{"role":"user","content":"b"}]"""
    val emptyContent =
      """[{"role":"user","content":"a"},{"role":"assistant","content":"  "}]"""
    val nullContent =
      """[{"role":"user","content":"a"},{"role":"assistant","content":null}]"""
    val midSystem =
      """[{"role":"user","content":"a"},{"role":"system","content":"x"},
         {"role":"assistant","content":"b"}]""".replaceAll("\n\\s*", "")
    val badRole =
      """[{"role":"user","content":"a"},{"role":"bot","content":"b"}]"""
    val out = stats(Seq(doubleUser, startsAssistant, emptyContent,
      nullContent, midSystem, badRole))
    assert(out(0L).alternates === Some(false) && !out(0L).valid)
    assert(out(1L).startsUser === Some(false) &&
      out(1L).endsAssistant === Some(false) && !out(1L).valid)
    assert(out(2L).contentsOk === Some(false) && !out(2L).valid)
    assert(out(3L).contentsOk === Some(false) && !out(3L).valid)
    // mid-conversation system: alternation of the non-system tail still
    // holds (user/assistant), but the prefix rule kills validity
    assert(out(4L).alternates === Some(true) && !out(4L).valid)
    assert(!out(5L).valid)
  }

  test("system-only prefix conversations: legal leading block, no exchange") {
    val sysOnly = """[{"role":"system","content":"x"}]"""
    val s = stats(Seq(sysOnly))(0L)
    // no non-system turn: starts_user false -> invalid, but no crash
    assert(s.nTurns === Some(1) && s.startsUser === Some(false) && !s.valid)
  }

  test("empty conversation '[]' is parsed, invalid, and crash-free") {
    val s = stats(Seq("[]"))(0L)
    assert(s.nTurns === Some(0) && s.nUser === Some(0) &&
      s.startsUser === Some(false) && s.alternates === Some(true) &&
      s.contentsOk === Some(true) && !s.valid)
    assert(ChatOps.chatTurns(
      Seq((1L, "[]")).toDF("id", "j"), "j", "id").count() === 0L)
  }

  test("malformed JSON: NULL stats, valid = false, zero exploded turns") {
    val out = stats(Seq("not json at all", "{\"role\":\"user\"}"))
    val s = out(0L)
    assert(s.nTurns === None && s.startsUser === None &&
      s.alternates === None && !s.valid)
    // a bare JSON OBJECT is not corrupt: from_json wraps it into a
    // one-element array (Spark's JSON-source convention) — it parses,
    // then fails the protocol (no assistant turn, no content)
    val w = out(1L)
    assert(w.nTurns === Some(1) && w.nUser === Some(1) &&
      w.contentsOk === Some(false) && !w.valid)
    val turns = ChatOps.chatTurns(
      Seq((1L, "not json"), (2L, good)).toDF("id", "j"), "j", "id")
    assert(turns.where(col("id") === 1L).count() === 0L)
    assert(turns.where(col("id") === 2L).count() === 5L)
  }

  test("chatTurns explodes in order with 1-based turn index") {
    val turns = ChatOps.chatTurns(Seq((1L, good)).toDF("id", "j"), "j", "id")
      .orderBy("turn").as[(Long, Int, String, String)].collect()
    assert(turns.map(_._2).toSeq === Seq(1, 2, 3, 4, 5))
    assert(turns.map(_._3).toSeq ===
      Seq("system", "user", "assistant", "user", "assistant"))
    assert(turns(1)._4 === "hi")
  }

  test("sftSignals: ratios, truncation, echo, null contract, guard") {
    val rows = Seq(
      (1L, "What is the answer to this question", "The answer is 42."),
      (2L, "What is the answer to this question",
        "What is the answer to this question indeed."),
      (3L, "Prompt here", "this just stops"),
      (4L, "Prompt here", "He said \"stop.\""),
      (5L, "Prompt here", null.asInstanceOf[String]),
      (6L, null.asInstanceOf[String], "An answer."),
      (7L, "P", "ends with bracket.)  "))
      .toDF("id", "prompt", "response")
    val out = ChatOps.sftSignals(rows, "prompt", "response")
      .drop("prompt", "response")
      .as[(Long, Long, Long, Option[Long], Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // (id, p_toks, r_toks, ratio, empty, terminal, echo)
    assert(out(1L) === ((1L, 7L, 4L, Some(571428L), false, true, false)))
    assert(out(2L)._7 === true && out(2L)._6 === true) // echo + terminal
    assert(out(3L)._6 === false)                        // truncation
    assert(out(4L)._6 === true)                         // ." counts
    assert(out(5L) === ((5L, 2L, 0L, Some(0L), true, false, false)))
    assert(out(6L)._2 === 0L && out(6L)._4 === None && !out(6L)._7)
    assert(out(7L)._6 === true)                         // .) + spaces
    val e = intercept[IllegalArgumentException] {
      ChatOps.sftSignals(rows.withColumnRenamed("id", "echoes_prompt"),
        "prompt", "response")
    }
    assert(e.getMessage.contains("reserves column names"))
  }

  test("sftSignals len_ratio is long arithmetic: a 3000-token response " +
      "against a 1-token prompt does not overflow INT under ANSI") {
    val long = Seq((1L, "p", Array.fill(3000)("w").mkString(" ")))
      .toDF("id", "prompt", "response")
    val r = ChatOps.sftSignals(long, "prompt", "response")
      .select("len_ratio_micro").as[Long].head()
    assert(r === 3000L * 1000000L)
  }

  test("flattenChat renders role tags, null content as empty, null json as null") {
    val out = Seq((1L, good), (2L, "nope"),
        (3L, """[{"role":"user","content":null}]"""))
      .toDF("id", "j")
      .select(col("id"), ChatOps.flattenChat(col("j")).as("flat"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some(
      "<|system|>be brief\n<|user|>hi\n<|assistant|>hello\n" +
        "<|user|>thanks\n<|assistant|>np"))
    assert(out(2L) === None)
    assert(out(3L) === Some("<|user|>"))
  }
}
