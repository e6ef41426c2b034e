package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.spark.sql.types._

/** Avro-schema migration shim — the Spark-native closure of the
  * reference's Avro-driven ingestion (K6).
  *
  * Reference: telemetry-batch-view's `avro/JSON2Avro.scala:103-133` +
  * `parquet/ParquetFile.scala:23-51` build Avro `GenericRecord`s from
  * JSON under a hand-written Avro schema and write them through
  * parquet-avro. On Spark that whole plane is obsolete: `StructType` is
  * the schema system, `spark.read.schema(...).json` is the typed decoder,
  * and the parquet sink is built in. What a migrating user still owns is
  * the `.avsc` FILES — this converter turns them into the `StructType`
  * those native readers want, so existing Avro schemas keep driving
  * ingestion without the Avro runtime in the data path.
  *
  * Supported: records (→ struct), all Avro primitives, enums/fixed
  * (→ string/binary), arrays, string-keyed maps, `[null, T]` unions
  * (→ nullable T), and the common logical types (date,
  * timestamp-millis/micros, decimal over bytes/fixed). General unions
  * have no Spark analogue and are rejected loudly rather than silently
  * stringified.
  */
object AvroSchemas {

  /** Parse an Avro schema JSON (`.avsc` content) into the equivalent
    * Spark schema. The top-level schema must be a record. */
  def toStructType(avsc: String): StructType = {
    val schema = new Schema.Parser().parse(avsc)
    require(schema.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${schema.getType}")
    toStruct(schema, Set.empty)
  }

  /** `seen` holds the record full-names on the CURRENT descent path —
    * revisiting one means the schema is recursive (legal Avro, e.g. a
    * linked list), which has no finite StructType analogue and must be
    * rejected loudly rather than overflow the stack. Non-recursive reuse
    * of a named record across sibling branches stays legal (the set is
    * path-scoped, not global). */
  private def toStruct(record: Schema, seen: Set[String]): StructType = {
    if (seen.contains(record.getFullName))
      throw new IllegalArgumentException(
        s"recursive Avro record '${record.getFullName}' has no StructType analogue")
    val inner = seen + record.getFullName
    StructType(record.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toDataType(f.schema(), inner)
      StructField(f.name(), dt, nullable)
    })
  }

  /** (DataType, nullable) — nullability comes from `[null, T]` unions. */
  private def toDataType(s: Schema, seen: Set[String]): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val (nulls, rest) = branches.partition(_.getType == Schema.Type.NULL)
      require(nulls.nonEmpty && rest.size == 1,
        s"only [null, T] unions map to Spark (nullable T); got $s")
      (toDataType(rest.head, seen)._1, true)
    case Schema.Type.RECORD => (toStruct(s, seen), false)
    case Schema.Type.ARRAY =>
      val (elem, elemNullable) = toDataType(s.getElementType, seen)
      (ArrayType(elem, containsNull = elemNullable), false)
    case Schema.Type.MAP =>
      val (value, valueNullable) = toDataType(s.getValueType, seen)
      (MapType(StringType, value, valueContainsNull = valueNullable), false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.INT =>
      s.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _ => (IntegerType, false)
      }
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          (TimestampType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case other =>
      throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }
}
