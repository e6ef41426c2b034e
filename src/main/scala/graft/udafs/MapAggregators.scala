package graft.udafs

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Map-typed aggregates, reimplementing the reference's deprecated
  * `UserDefinedAggregateFunction`s as typed `Aggregator`s (registered via
  * `functions.udaf`) — the Spark 3+ idiom; buffers use product/map encoders
  * so they stay in Tungsten rows, no Kryo round-trips.
  */
object MapAggregators {

  /** A5 — first non-null value per map key wins; earlier buffer wins on
    * merge. Like the reference, "first" is encounter order, so results are
    * only deterministic on deterministically-ordered input (the reference
    * declares itself non-deterministic too).
    * Reference: src/main/scala/com/mozilla/telemetry/utils/udfs/AggMapFirst.scala:10-54. */
  class MapFirst extends Aggregator[Map[String, String], Map[String, String], Map[String, String]] {
    def zero: Map[String, String] = Map.empty
    def reduce(b: Map[String, String], in: Map[String, String]): Map[String, String] =
      if (in == null) b
      else b ++ in.filter { case (k, v) => v != null && !b.contains(k) }
    def merge(b1: Map[String, String], b2: Map[String, String]): Map[String, String] =
      b2 ++ b1 // earlier buffer's entries win
    def finish(b: Map[String, String]): Map[String, String] = b
    def bufferEncoder: Encoder[Map[String, String]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, String]] = ExpressionEncoder()
  }

  /** A6 — pointwise sum of map values; null MAPS are skipped. Null map
    * VALUES must be pre-filtered by the caller (`map_filter(m, (_, v) ->
    * v is not null)`): the primitive Long encoder rejects them at
    * deserialization, before reduce could skip anything. Widened to Long
    * (the reference's IntegerType overflows at 100 TB row counts).
    * Reference: src/main/scala/com/mozilla/telemetry/utils/udfs/AggMapSum.scala:10-58. */
  class MapSum extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], in: Map[String, Long]): Map[String, Long] =
      if (in == null) b else merge(b, in)
    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      if (b1.isEmpty) b2
      else if (b2.isEmpty) b1
      else b2.foldLeft(b1) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
    }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }
}
