package graft

import org.apache.spark.sql.types._

/** Schema contract over the driver-generated testdata: the assumptions
  * every query makes about `/root/testdata/sf*` tables, asserted in
  * `sbt test` so a silent fixture regeneration fails HERE, loudly, not
  * at the driver's correctness gate. (Round 6 regressed exactly this
  * way: `events.ts` flipped TIMESTAMP(NANOS) → timestamp[us] and three
  * consumers failed analysis at the driver with no red test.) */
class TestdataContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cols(name: String): Map[String, DataType] =
    Tables(spark, sf, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("all ten tables open and carry the columns the queries project") {
    val required: Map[String, Seq[String]] = Map(
      "region"   -> Seq("r_regionkey", "r_name"),
      "nation"   -> Seq("n_nationkey", "n_regionkey", "n_name"),
      "customer" -> Seq("c_custkey", "c_nationkey", "c_mktsegment", "c_name", "c_acctbal"),
      "supplier" -> Seq("s_suppkey", "s_nationkey"),
      "part"     -> Seq("p_partkey"),
      "orders"   -> Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
      "lineitem" -> Seq("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate", "l_returnflag", "l_linestatus"),
      "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents"  -> Seq("doc_id", "text", "lang", "source"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    required.foreach { case (t, needed) =>
      val have = cols(t).keySet
      val missing = needed.filterNot(have)
      assert(missing.isEmpty, s"$t missing columns: $missing (has $have)")
    }
  }

  test("events.ts is tsNanos-dispatchable (long | timestamp | timestamp_ntz)") {
    val e = Tables.events(spark, sf)
    val dt = e.schema("ts").dataType
    assert(dt == LongType || dt == TimestampType || dt == TimestampNTZType,
      s"events.ts arrived as $dt — Tables.tsNanos and EventsDailyView.dayRange " +
        "only dispatch long/timestamp/timestamp_ntz; extend both before shipping")
    // the normalized value must be nanos-since-epoch at a sane magnitude
    // (2001-09-09..2033-05-18 in nanos) — catches unit regressions (ms/us
    // mistaken for ns) no matter which physical type the fixture uses
    import org.apache.spark.sql.functions._
    val row = e.select(min(Tables.tsNanos(e)).as("lo"), max(Tables.tsNanos(e)).as("hi"))
      .head()
    assert(row.getLong(0) > 1000000000000000000L && row.getLong(1) < 2000000000000000000L,
      s"Tables.tsNanos out of nanos range: ${row.getLong(0)}..${row.getLong(1)}")
  }

  test("documents/embeddings value contracts hold") {
    val d = cols("documents")
    assert(d("doc_id") == LongType && d("text") == StringType)
    val em = Tables(spark, sf, "embeddings")
    em.schema("embedding").dataType match {
      case ArrayType(FloatType | DoubleType, _) => ()
      case t => fail(s"embeddings.embedding must be array<float|double>, got $t")
    }
    // every similarity operator assumes a fixed embedding dimension
    import org.apache.spark.sql.functions._
    val dims = em.select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.length == 1 && dims.head > 0, s"ragged embedding dims: ${dims.toSeq}")
  }
}
