package graft.json

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chat-transcript operators — the SFT/RLHF data-prep stage: parse a
  * conversation JSON column (the ShareGPT/OpenAI-messages shape: an
  * array of `{role, content}` turns), validate its protocol, and
  * flatten it to a training string. Everything is `from_json` + HOFs
  * over the parsed array — scan-side Column expressions, no UDF, no
  * shuffle, streams unchanged.
  *
  * The validity contract (pinned in ChatOpsSpec and the q244 gate):
  *  - every role ∈ {system, user, assistant}
  *  - system turns only as a leading prefix
  *  - after the system prefix, roles strictly alternate, starting with
  *    user and ending with assistant (so ≥ 1 exchange exists)
  *  - every turn's content non-null and non-blank
  * Malformed JSON parses to NULL → stats NULL, `valid` FALSE — the
  * honest verdict, never a crash (quarantine-don't-rerun discipline).
  */
object ChatOps {

  val turnSchema: ArrayType = ArrayType(new StructType()
    .add("role", StringType).add("content", StringType))

  /** Parsed turn array, NULL on malformed JSON. A bare JSON OBJECT is
    * not corrupt: Spark's JSON convention wraps it into a one-element
    * array — it parses, then fails the protocol gates (pinned in
    * ChatOpsSpec). */
  def parseChat(j: Column): Column = from_json(j, turnSchema)

  /** Per-conversation protocol stats over the RAW json column:
    * `(n_turns, n_system, n_user, n_assistant, starts_user,
    * alternates, ends_assistant, contents_ok, valid)`. */
  def chatStats(j: Column): Seq[(String, Column)] = {
    val a = parseChat(j)
    def ifParsed(c: Column): Column = when(a.isNotNull, c)
    def roleCount(r: String): Column =
      size(filter(a, t => t("role") <=> lit(r)))
    // non-system tail: the exchange the alternation contract governs
    val rest = filter(a, t => !(t("role") <=> lit("system")))
    val rolesOk = forall(a,
      t => t("role").isin("system", "user", "assistant"))
    val alternates = when(size(rest) >= 2,
        forall(sequence(lit(1), size(rest) - 1),
          i => !(element_at(rest, i)("role") <=>
            element_at(rest, i + 1)("role"))))
      .when(size(rest).isNotNull, lit(true))
    // try_element_at: an empty tail must read as "no first/last turn"
    // (NULL → <=> false), never an ANSI out-of-bounds error
    val startsUser = ifParsed(
      try_element_at(rest, lit(1))("role") <=> lit("user"))
    val endsAssistant = ifParsed(
      try_element_at(rest, greatest(size(rest), lit(1)))("role") <=>
        lit("assistant"))
    val contentsOk = forall(a,
      t => t("content").isNotNull && length(trim(t("content"))) > 0)
    Seq(
      "n_turns" -> size(a),
      "n_system" -> roleCount("system"),
      "n_user" -> roleCount("user"),
      "n_assistant" -> roleCount("assistant"),
      "starts_user" -> startsUser,
      "alternates" -> alternates,
      "ends_assistant" -> endsAssistant,
      "contents_ok" -> contentsOk,
      "valid" -> coalesce(
        rolesOk && !sysPrefixViolated(a) && alternates && startsUser &&
          endsAssistant && contentsOk,
        lit(false)))
  }

  /** TRUE iff a system turn appears past the leading prefix. */
  private def sysPrefixViolated(a: Column): Column = {
    // index of the first non-system turn (1-based; size+1 if all system):
    // any system turn AT or PAST it violates the prefix rule. exists+lag
    // free: compare each system position against the first non-system one.
    val firstNonSys = coalesce(
      array_position(transform(a, t => t("role") <=> lit("system")),
        lit(false)),
      (size(a) + 1).cast("long"))
    // size >= 1 guard: sequence(1, 0) is DESCENDING in Spark, and an
    // empty conversation ("[]") must read as un-violated, not feed
    // element_at an out-of-bounds index under ANSI
    when(size(a) >= 1,
        exists(sequence(lit(1), size(a)),
          i => (element_at(a, i)("role") <=> lit("system")) &&
            i.cast("long") > firstNonSys))
      .when(size(a).isNotNull, lit(false))
  }

  /** Training-string flattening: `<|role|>content` lines joined by
    * newline; null contents render empty (audit form — validity is
    * [[chatStats]]' job). NULL on malformed JSON. */
  def flattenChat(j: Column): Column = {
    val a = parseChat(j)
    array_join(transform(a, t => concat(lit("<|"), t("role"), lit("|>"),
      coalesce(t("content"), lit("")))), "\n")
  }

  /** Exploded turn view: one row per (id, turn 1-based, role, content).
    * Malformed conversations contribute NO rows (posexplode drops the
    * null array) — pair with [[chatStats]] for the universe verdict. */
  def chatTurns(df: org.apache.spark.sql.DataFrame, jsonCol: String,
                idCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), posexplode(parseChat(col(jsonCol))).as(Seq("i", "t")))
      .select(col(idCol), (col("i") + 1).as("turn"),
        col("t")("role").as("role"), col("t")("content").as("content"))
}
