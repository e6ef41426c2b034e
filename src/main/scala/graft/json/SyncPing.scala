package graft.json

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sync-ping shredding: JSON ping documents → nested per-sync rows, flat
  * per-(sync, engine) rows, and per-event rows (SURVEY.md §2.8 G3-G5, §1).
  *
  * Spark-first redesign of the reference's hand-built Row trees
  * (reference: src/main/scala/com/mozilla/telemetry/utils/SyncPingConversion.scala):
  * the declared `StructType` drives `from_json`, variant shapes are handled
  * with `coalesce` column logic instead of imperative dispatch, and the
  * explode stages are Catalyst `Generate` nodes — the whole pipeline stays
  * in whole-stage codegen and pushes down through the scan.
  *
  * Variant handling reproduced (reference file:line):
  *  - old-style single-sync payload vs new-style `payload.syncs[]`
  *    (SyncPingConversion.scala:643-653) → `coalesce(syncs, array(payload))`;
  *  - `uid`/`deviceID`/`os` at payload OR ping top level (Android;
  *    :431-445, :452-461) → per-field `coalesce`;
  *  - `outgoing` as array OR bare object (:262-276 — an object counts as
  *    one batch): the schema captures the raw JSON subtree as a string
  *    (declaring `StringType` on a JSON object/array field yields its raw
  *    text), and a per-engine `from_json` with an ARRAY schema normalizes
  *    both forms — the root-level JSON parser wraps a bare object into a
  *    one-element array, exactly the reference's `JObject` branch.
  */
object SyncPing {

  // ── schemas (explicit and hand-maintained, like the reference's) ──

  val problemType: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("count", LongType, nullable = false)))

  val validationType: StructType = StructType(Seq(
    StructField("version", LongType),
    StructField("checked", LongType),
    StructField("took", LongType),
    StructField("failureReason", StringType),
    StructField("problems", ArrayType(problemType))))

  val outgoingType: StructType = StructType(Seq(
    StructField("sent", LongType),
    StructField("failed", LongType)))

  val engineType: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("took", LongType),
    StructField("status", StringType),
    StructField("failureReason", StringType),
    StructField("incoming", StructType(Seq(
      StructField("applied", LongType),
      StructField("failed", LongType),
      StructField("newFailed", LongType),
      StructField("reconciled", LongType)))),
    // raw JSON text: array form AND bare-object form both arrive in
    // real pings; normalized in flatRows via from_json(ArrayType)
    StructField("outgoing", StringType),
    StructField("validation", validationType)))

  val deviceType: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("version", StringType),
    StructField("os", StringType)))

  val syncType: StructType = StructType(Seq(
    StructField("when", LongType),
    StructField("took", LongType),
    StructField("uid", StringType),
    StructField("deviceID", StringType),
    StructField("status", StructType(Seq(
      StructField("sync", StringType),
      StructField("service", StringType)))),
    StructField("why", StringType),
    StructField("engines", ArrayType(engineType)),
    StructField("devices", ArrayType(deviceType))))

  /** Full ping envelope: old-style fields live directly on `payload`,
    * new-style pings carry `payload.syncs`; ids may sit at top level. */
  val pingType: StructType = StructType(Seq(
    StructField("application", StructType(Seq(
      StructField("displayVersion", StringType),
      StructField("buildId", StringType),
      StructField("name", StringType),
      StructField("version", StringType),
      StructField("channel", StringType)))),
    StructField("payload", StructType(
      StructField("version", LongType) +:
        StructField("os", StructType(Seq(
          StructField("name", StringType),
          StructField("version", StringType),
          StructField("locale", StringType)))) +:
        StructField("syncs", ArrayType(syncType)) +:
        StructField("events", ArrayType(ArrayType(StringType))) +:
        syncType.fields.toSeq)),
    StructField("uid", StringType),
    StructField("deviceID", StringType),
    StructField("os", StructType(Seq(
      StructField("name", StringType),
      StructField("version", StringType),
      StructField("locale", StringType))))))

  // ── shredding pipelines ──

  /** Parse a JSON-string column into the ping envelope. The schema carries
    * a corrupt-record capture field: PERMISSIVE `from_json` yields a struct
    * of nulls (not a null struct) for malformed documents, so without it an
    * unparseable ping is indistinguishable from `{}` — [[observeShredding]]
    * needs the distinction for its `failed` counter. */
  def parse(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("ping", from_json(col(jsonCol),
      pingType.add(StructField("_corrupt_record", StringType)),
      Map("columnNameOfCorruptRecord" -> "_corrupt_record")))

  private def syncFromPayload: Column = struct(
    col("ping.payload.when").as("when"),
    col("ping.payload.took").as("took"),
    coalesce(col("ping.payload.uid"), col("ping.uid")).as("uid"),
    coalesce(col("ping.payload.deviceID"), col("ping.deviceID")).as("deviceID"),
    col("ping.payload.status").as("status"),
    col("ping.payload.why").as("why"),
    col("ping.payload.engines").as("engines"),
    col("ping.payload.devices").as("devices"))

  /** The sync list a ping shreds to: new-style `payload.syncs[]`, or the
    * payload itself as a single old-style sync (when it carries `when`).
    * Shared by [[nestedRows]] and [[observeShredding]] so the metrics can
    * never desynchronize from the rows actually produced. */
  private def syncsCol: Column = coalesce(col("ping.payload.syncs"),
    when(col("ping.payload.when").isNotNull, array(syncFromPayload)))

  /** Required-field survival rule for one sync (same sharing rationale):
    * a sync yields a row iff it has a `when` and a uid (its own or the
    * ping's). */
  private def syncSurvives(s: Column): Column =
    coalesce(s.getField("uid"), col("ping.uid")).isNotNull &&
      s.getField("when").isNotNull

  /** G3 — one row per sync: new-style `payload.syncs[]`, or the payload
    * itself as a single old-style sync (when it carries `when`). */
  def nestedRows(parsed: DataFrame, keep: Seq[Column] = Nil): DataFrame =
    parsed
      .withColumn("sync", explode(syncsCol))
      .where(syncSurvives(col("sync"))) // required fields
      .select(keep ++ Seq(
        coalesce(col("sync.uid"), col("ping.uid")).as("uid"),
        coalesce(col("sync.deviceID"), col("ping.deviceID")).as("device_id"),
        col("sync.when").as("when"),
        col("sync.took").as("took"),
        col("sync.why").as("why"),
        col("sync.status.sync").as("status_sync"),
        col("sync.status.service").as("status_service"),
        coalesce(col("ping.payload.os.name"), col("ping.os.name")).as("os_name"),
        coalesce(col("ping.payload.os.version"), col("ping.os.version")).as("os_version"),
        col("sync.engines").as("engines"),
        col("sync.devices").as("devices")): _*)

  /** A11 — the reference's processed/ignored/failed record triple
    * (SyncView.scala:49-51,64-83) as query-observed metrics, with no second
    * action over the data: `failed` = unparseable document (`from_json`
    * yields a null ping — the reference's exception branch), `ignored` =
    * parses but would shred to zero sync rows (the reference's `Nil`
    * branch), `processed` = contributes rows. Attach to the parsed frame
    * before [[nestedRows]]/[[flatRows]]; read `obs.get` after an action. */
  def observeShredding(parsed: DataFrame, obs: Observation): DataFrame = {
    val failed = col("ping._corrupt_record").isNotNull
    // the SAME syncs column and survival rule nestedRows shreds with
    val yieldsRows = coalesce(exists(syncsCol, syncSurvives), lit(false))
    parsed.observe(obs,
      count(when(failed, 1)).as("failed"),
      count(when(!failed && !yieldsRows, 1)).as("ignored"),
      count(when(!failed && yieldsRows, 1)).as("processed"))
  }

  /** G4 — flat per-(sync, engine) rows with outgoing rollups folded by
    * higher-order functions (no UDAF, no second explode). The `outgoing`
    * field parses per engine from its raw text: `from_json` with an array
    * schema accepts both the array form and the bare-object form (wrapped
    * into a one-element array = one batch, reference
    * SyncPingConversion.scala:262-276). */
  def flatRows(parsed: DataFrame, keep: Seq[Column] = Nil): DataFrame = {
    val sumField = (arr: Column, f: String) =>
      coalesce(aggregate(arr, lit(0L), (acc, o) => acc + coalesce(o.getField(f), lit(0L))), lit(0L))
    nestedRows(parsed, keep)
      .withColumn("engine", explode_outer(col("engines")))
      .withColumn("outgoing_arr", from_json(col("engine.outgoing"), ArrayType(outgoingType)))
      .select(
        col("uid"), col("device_id"), col("when"), col("took"), col("why"),
        col("status_sync"), col("status_service"), col("os_name"), col("os_version"),
        col("engine.name").as("engine_name"),
        col("engine.took").as("engine_took"),
        col("engine.status").as("engine_status"),
        col("engine.failureReason").as("engine_failure_reason"),
        col("engine.incoming.applied").as("engine_incoming_applied"),
        col("engine.incoming.failed").as("engine_incoming_failed"),
        col("engine.incoming.newFailed").as("engine_incoming_new_failed"),
        col("engine.incoming.reconciled").as("engine_incoming_reconciled"),
        when(col("outgoing_arr").isNull, lit(null).cast(LongType))
          .otherwise(size(col("outgoing_arr")).cast(LongType)).as("engine_outgoing_batches"),
        when(col("outgoing_arr").isNull, lit(null).cast(LongType))
          .otherwise(sumField(col("outgoing_arr"), "sent")).as("engine_outgoing_sent"),
        when(col("outgoing_arr").isNull, lit(null).cast(LongType))
          .otherwise(sumField(col("outgoing_arr"), "failed")).as("engine_outgoing_failed"),
        col("engine.validation.version").as("engine_validation_version"),
        col("engine.validation.checked").as("engine_validation_checked"),
        col("engine.validation.took").as("engine_validation_took"),
        when(col("engine.validation.problems").isNull, lit(null).cast(LongType))
          .otherwise(sumField(col("engine.validation.problems"), "count"))
          .as("engine_validation_problems"))
  }

  /** G5/J4 — per-event rows: explode `payload.events`, decode positionally
    * (array-of-strings form of F16), and resolve the event's device via a
    * row-local map lookup over the sync's own `devices` array — the
    * reference's per-document "join" (SyncEventView.scala:216-265)
    * expressed with `map_from_entries` + `element_at`. */
  def eventRows(parsed: DataFrame, keep: Seq[Column] = Nil): DataFrame = {
    val devices = coalesce(
      col("ping.payload.devices"),
      element_at(col("ping.payload.syncs"), 1).getField("devices"))
    val deviceMap = map_from_entries(transform(devices, d =>
      struct(d.getField("id"), struct(d.getField("version").as("version"),
        d.getField("os").as("os")))))
    parsed
      .withColumn("ev", explode(col("ping.payload.events")))
      .where(size(col("ev")) >= 4 && size(col("ev")) <= 6)
      .withColumn("device_id", coalesce(col("ping.payload.deviceID"), col("ping.deviceID")))
      .select(keep ++ Seq(
        coalesce(col("ping.payload.uid"), col("ping.uid")).as("uid"),
        col("device_id"),
        // try_cast, not cast: a non-numeric timestamp is an unparseable
        // EVENT (dropped by the null filter below, the reference's lenient
        // decode), never a query-killing ANSI cast error — found by the
        // SyncPingPropertySpec generator, not a fixture
        element_at(col("ev"), 1).try_cast(LongType).as("event_timestamp"),
        element_at(col("ev"), 2).as("event_category"),
        element_at(col("ev"), 3).as("event_method"),
        element_at(col("ev"), 4).as("event_object"),
        when(size(col("ev")) >= 5, element_at(col("ev"), 5)).as("event_string_value"),
        element_at(deviceMap, col("device_id")).getField("version").as("device_version"),
        element_at(deviceMap, col("device_id")).getField("os").as("device_os")): _*)
      .where(col("uid").isNotNull && col("event_timestamp").isNotNull &&
        col("event_category").isNotNull && col("event_method").isNotNull &&
        col("event_object").isNotNull)
  }
}
