package graft.udafs

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("MapFirst keeps first non-null value per key (single partition)") {
    val df = Seq(
      (1, Map("a" -> "x", "b" -> "y")),
      (1, Map("a" -> "ignored", "c" -> "z")),
      (1, Map[String, String]("d" -> null))
    ).toDF("g", "m").coalesce(1)
    val out = df.groupBy("g").agg(udaf(new MapAggregators.MapFirst()).apply(col("m")).as("r"))
      .select("r").as[Map[String, String]].head()
    assert(out === Map("a" -> "x", "b" -> "y", "c" -> "z")) // null value dropped
  }

  test("MapSum sums pointwise, skipping missing keys") {
    val df = Seq(
      (1, Map("a" -> 1L, "b" -> 2L)),
      (1, Map("a" -> 10L, "c" -> 5L))
    ).toDF("g", "m")
    val out = df.groupBy("g").agg(udaf(new MapAggregators.MapSum()).apply(col("m")).as("r"))
      .select("r").as[Map[String, Long]].head()
    assert(out === Map("a" -> 11L, "b" -> 2L, "c" -> 5L))
  }

  test("sortedCollect retains nulls, sorts desc, trims to k") {
    val df = Seq[(Int, java.lang.Long, String)](
      (1, 5L, "p5"), (1, null, "pnull"), (1, 9L, "p9"), (1, 7L, "p7")
    ).toDF("g", "score", "payload")
    val cols = CollectOps.sortedCollect(
      Seq(col("score")), Seq("scores" -> col("score"), "payloads" -> col("payload")), 3)
    val row = df.coalesce(1).groupBy("g").agg(cols.head, cols.tail: _*).head()
    // desc with nulls LAST: 9, 7, 5 (null trimmed out by k=3)
    assert(row.getSeq[java.lang.Long](1) === Seq(9L, 7L, 5L))
    assert(row.getSeq[String](2) === Seq("p9", "p7", "p5"))
  }

  test("sortedCollect keeps nulls when k allows (nulls-last)") {
    val df = Seq[(Int, java.lang.Long)]((1, 5L), (1, null), (1, 9L))
      .toDF("g", "score")
    val cols = CollectOps.sortedCollect(Seq(col("score")), Seq("scores" -> col("score")), 10)
    val row = df.coalesce(1).groupBy("g").agg(cols.head, cols.tail: _*).head()
    assert(row.getSeq[java.lang.Long](1) === Seq(9L, 5L, null))
  }

  test("arrayDedupeById keeps first struct per id in array order") {
    val df = Seq(Tuple1(Seq(("a", 1L), ("b", 2L), ("a", 3L)))).toDF("arr")
      .select(col("arr").cast("array<struct<id:string,v:bigint>>").as("arr"))
    val out = df.select(CollectOps.arrayDedupeById(col("arr"), "id").as("d"))
      .selectExpr("transform(d, x -> x.v) as vs").as[Seq[Long]].head()
    assert(out === Seq(1L, 2L))
  }

  test("arrayDedupeById keeps the FIRST null-id struct like any other key") {
    val df = Seq(Tuple1(Seq((Option.empty[String], 1L), (Option.empty[String], 2L),
      (Option("a"), 3L)))).toDF("arr")
      .select(col("arr").cast("array<struct<id:string,v:bigint>>").as("arr"))
    val out = df.select(CollectOps.arrayDedupeById(col("arr"), "id").as("d"))
      .selectExpr("transform(d, x -> x.v) as vs").as[Seq[Long]].head()
    assert(out === Seq(1L, 3L)) // null key deduped, not dropped
  }

  test("rowFirstByPos keeps earliest struct per id in array order") {
    val df = Seq(
      (1, Seq(("a", 1L), ("b", 2L), ("a", 3L))),
      (2, Seq(("a", 9L)))
    ).toDF("g", "arr")
      .select(col("g"), col("arr").cast("array<struct<id:string,v:bigint>>").as("arr"))
    val out = CollectOps.rowFirstByPos(df, Seq("g"), "arr", "id")
      .select(col("g"), col("first.id").as("id"), col("first.v").as("v"))
      .as[(Int, String, Long)].collect().toSet
    assert(out === Set((1, "a", 1L), (1, "b", 2L), (2, "a", 9L)))
  }

  test("SearchCounts sums only allowlisted sources with count > 0") {
    val df = Seq(
      (1, Seq(("g", "urlbar", 3L), ("g", "urlbar", -1L), ("g", "abouthome", 2L), ("g", "other", 9L)))
    ).toDF("g", "searches")
      .select(col("g"), col("searches")
        .cast("array<struct<engine:string,source:string,count:bigint>>").as("searches"))
    val out = SearchCounts.aggregate(df, Seq("g"), "searches", "search",
      Seq("urlbar", "abouthome")).head()
    // all = 3 + 2 (count>0 AND allowlisted — 'other' and count<=0 excluded,
    // matching reference AggSearchCounts.scala:64-71); urlbar = 3; abouthome = 2
    assert(out.getLong(1) === 5L && out.getLong(2) === 3L && out.getLong(3) === 2L)
  }

  test("filtered HLL merge unions only gated sketches") {
    val df = (1 to 4000).map(i => (i % 4, i)).toDF("g", "x")
    val sk = df.groupBy(col("g")).agg(Sketches.hllSketch(col("x")).as("sk"))
    // merging only g<=1 sketches must equal sketching the g<=1 subset directly
    val filtered = sk.agg(Sketches.hllCardinality(
      Sketches.hllMergeFiltered(col("g") <= 1, col("sk")))).head().getLong(0)
    val direct = df.where(col("g") <= 1)
      .agg(Sketches.hllCardinality(Sketches.hllSketch(col("x")))).head().getLong(0)
    assert(filtered === direct)
    assert(math.abs(filtered - 2000) <= 100) // exact = 2000 values with g<=1
  }

  test("HLL estimate within 5% of exact; bucketed edge cases") {
    val df = (1 to 10000).toDF("x")
    val est = df.agg(Sketches.hllCardinality(Sketches.hllSketch(col("x")))).head().getLong(0)
    assert(math.abs(est - 10000) <= 500)
    val b = Seq(5.0, 10.0, 10.5, 51.0).toDF("v")
      .select(Sketches.bucketed(col("v"), Seq(10, 20, 30, 40, 50)).as("b"))
      .as[Double].collect().toSeq
    assert(b === Seq(10.0, 10.0, 20.0, 51.0))
    // null value -> null bucket, never the overflow bucket
    val nb = Seq(Option(5.0), None).toDF("v")
      .select(Sketches.bucketed(col("v"), Seq(10.0)).as("b"))
      .as[Option[Double]].collect().toSeq
    assert(nb === Seq(Some(10.0), None))
  }

  test("TopK.smallestK: bounded per-group top-K matches full-sort model") {
    val rnd = new scala.util.Random(4711L)
    val rows = (0 until 2000).map(_ =>
      (rnd.nextInt(7).toLong, rnd.nextLong() % 10000L))
    val got = rows.toDF("g", "v").repartition(8)
      .groupBy(col("g")).agg(TopK.smallestK(col("v"), 5).as("top"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = rows.groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.take(5)).toMap
    assert(got === want)
    // groups smaller than K return all values, still sorted
    val small = Seq((1L, 3L), (1L, 1L)).toDF("g", "v")
      .groupBy(col("g")).agg(TopK.smallestK(col("v"), 10).as("top"))
      .as[(Long, Seq[Long])].collect().head
    assert(small._2 === Seq(1L, 3L))
  }
}
