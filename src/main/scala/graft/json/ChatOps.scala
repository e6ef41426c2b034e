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
    * alternates, ends_assistant, contents_ok, sys_prefix_violated,
    * valid)`. */
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
      "sys_prefix_violated" -> sysPrefixViolated(a),
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
    // array_position returns 0 — not NULL — when nothing matches, so the
    // all-system case must route through nullif before the coalesce
    // fallback (else first_non_sys reads 0 and every system turn
    // "violates" a prefix that is in fact the whole conversation).
    val firstNonSys = coalesce(
      nullif(array_position(transform(a, t => t("role") <=> lit("system")),
        lit(false)), lit(0L)),
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

  /** SFT pair-quality signals over (prompt, response) columns — the
    * instruction-data sibling of the C4/Gopher document gates: appends
    * `(prompt_tokens, response_tokens, len_ratio_micro, empty_response,
    * ends_terminal, echoes_prompt)`.
    *
    *  - `len_ratio_micro` = 10⁶·response div prompt tokens (NULL when
    *    the prompt has none — undefined, not infinite);
    *  - `ends_terminal`: the response's last non-space text ends in
    *    sentence punctuation (optionally followed by closing
    *    quotes/brackets) — a FALSE here is the truncation signature;
    *  - `echoes_prompt`: the response opens by repeating the prompt's
    *    first 8 tokens (case-folded) — the lazy-completion degeneracy.
    *
    * A DataFrame operator with staged token arrays (the q240 lesson:
    * token splits referenced from several output columns re-run per
    * reference when inline). NULL prompt/response read as zero tokens.
    * Scan-side only; streams unchanged. */
  def sftSignals(pairs: org.apache.spark.sql.DataFrame, promptCol: String,
                 responseCol: String): org.apache.spark.sql.DataFrame = {
    val reserved = Seq("prompt_tokens", "response_tokens", "len_ratio_micro",
      "empty_response", "ends_terminal", "echoes_prompt", "__pt", "__rt")
    val clashes = pairs.columns.filter(reserved.contains)
    require(clashes.isEmpty,
      s"sftSignals reserves column names ${reserved.mkString(", ")}; " +
        s"input already has ${clashes.mkString(", ")}")
    val passthrough = pairs.columns.toSeq.map(col)
    def toks(c: Column): Column =
      filter(split(trim(coalesce(c, lit(""))), "\\s+"), t => length(t) > 0)
    val p = col("__pt")
    val r = col("__rt")
    pairs
      .select(passthrough :+ toks(col(promptCol)).as("__pt") :+
        toks(col(responseCol)).as("__rt"): _*)
      .select(passthrough :+
        size(p).cast("long").as("prompt_tokens") :+
        size(r).cast("long").as("response_tokens") :+
        // long arithmetic: 10⁶·size in INT overflows (ANSI: throws) at a
        // ≥2148-token response — well inside real SFT data
        when(size(p) > 0,
          expr("(1000000L * cast(size(__rt) as bigint)) div " +
            "cast(size(__pt) as bigint)")).as("len_ratio_micro") :+
        (size(r) === 0).as("empty_response") :+
        // Java∩RE2: no lookarounds; closing quotes/brackets may follow
        // the terminal mark
        (size(r) > 0 && coalesce(col(responseCol), lit(""))
          .rlike("[.!?][\"')\\]]*[ \\t\\r\\n]*$")).as("ends_terminal") :+
        (size(p) > 0 && size(r) > 0 &&
          lower(concat_ws(" ", r)).startsWith(
            lower(concat_ws(" ", slice(p, 1, 8))))).as("echoes_prompt"): _*)
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
