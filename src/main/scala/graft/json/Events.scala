package graft.json

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._
import scala.util.Try

/** Positional event-array decoding with the reference's lenient coercion
  * discipline (SURVEY.md §2.7 F15/F16/F17).
  *
  * An event is a heterogeneous JSON array
  * `[timestamp, category, method, object, stringValue?, mapValues?]` with
  * arity dispatch (4/5/6 elements); extra elements reject the row; map
  * values are stringified with `null → "null"`.
  * Reference: src/main/scala/com/mozilla/telemetry/utils/Events.scala:31-80.
  *
  * Jackson (shipped with Spark) instead of a JSON DSL; decoding runs in a
  * typed `flatMap` on executors — these variant shapes are exactly the
  * cases `from_json` cannot express.
  */
object Events {

  case class Event(
      timestamp: Long,
      category: String,
      method: String,
      obj: String,
      stringValue: Option[String],
      mapValues: Option[Map[String, String]]) {
    /** F17 — prepend the process tag to the map. */
    def withProcess(process: String): Event =
      copy(mapValues = Some(Map("telemetry_process" -> process) ++ mapValues.getOrElse(Map.empty)))
  }

  private val mapper = new ObjectMapper()

  /** Any scalar → string; JSON null → "null" (map-value discipline,
    * reference Events.scala:42-58). */
  private def valueToString(n: JsonNode): String =
    if (n == null || n.isNull) "null"
    else if (n.isTextual) n.asText()
    else n.toString

  /** Nullable string position: JSON null → None, scalar → coerced string. */
  private def optString(n: JsonNode): Option[String] =
    if (n == null || n.isNull) None else Some(valueToString(n))

  /** Decode one positional array; None ⇒ rejected (wrong arity / types). */
  def fromArray(node: JsonNode): Option[Event] = {
    if (node == null || !node.isArray) return None
    val arr = node.elements().asScala.toVector
    if (arr.size < 4 || arr.size > 6) return None
    val ts = arr(0)
    if (!ts.isNumber) return None
    val fixed = arr.slice(1, 4)
    if (fixed.exists(e => e.isNull || !e.isValueNode)) return None
    val strValue = if (arr.size >= 5) optString(arr(4)) else None
    val mapValues = if (arr.size == 6) {
      val m = arr(5)
      if (!m.isObject) return None
      Some(m.properties().asScala.map(e => e.getKey -> valueToString(e.getValue)).toMap)
    } else None
    Some(Event(ts.asLong(), valueToString(arr(1)), valueToString(arr(2)),
      valueToString(arr(3)), strValue, mapValues))
  }

  /** Decode a JSON string holding a list of positional event arrays;
    * malformed elements are dropped (not the whole list). */
  def fromJsonList(json: String): Seq[Event] =
    Try(mapper.readTree(json)).toOption.toSeq
      .filter(_.isArray)
      .flatMap(_.elements().asScala.flatMap(fromArray))
}
