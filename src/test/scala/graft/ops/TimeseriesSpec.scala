package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Integer EWMA smoothing + spike flags ([[Timeseries]]) against a
  * driver-side fold. */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def model(series: Seq[(Long, Long)], factor: Long)
      : Seq[(Long, Long, Option[Long], Boolean)] = {
    var e: Option[Long] = None
    series.sortBy(_._1).map { case (b, n) =>
      val prev = e
      e = Some(prev.fold(n)(p => (p + n) / 2))
      (b, n, prev, prev.exists(p => n > factor * p))
    }
  }

  test("ewmaAnomalies equals the sequential integer fold per key") {
    val rnd = new Random(55)
    val counts = for (k <- 0L until 6L; b <- 0L until 30L if rnd.nextInt(10) > 1)
      yield (k, b, rnd.nextInt(100).toLong + 1L)
    val got = Timeseries.ewmaAnomalies(
        counts.toDF("k", "bucket", "n"), "k", "bucket", "n")
      .as[(Long, Long, Long, Option[Long], Option[Boolean])]
      .collect().toSeq
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3, r._4,
        r._5.getOrElse(false)))).toMap
    val want = counts.groupBy(_._1).view
      .mapValues(s => model(s.map(x => (x._2, x._3)), 3L)).toMap
    assert(got.keySet === want.keySet)
    got.keySet.foreach(k => assert(got(k) === want(k), s"key $k"))
  }

  test("a genuine spike flags against the PRIOR level, first bucket never flags") {
    val counts = Seq(
      (1L, 0L, 10L), (1L, 1L, 12L), (1L, 2L, 100L), // spike at bucket 2
      (1L, 3L, 12L))                                // post-spike, vs raised level
    val got = Timeseries.ewmaAnomalies(
        counts.toDF("k", "bucket", "n"), "k", "bucket", "n")
      .orderBy(col("bucket"))
      .as[(Long, Long, Long, Option[Long], Option[Boolean])]
      .collect().toSeq
    // E: 10, (10+12)/2=11, (11+100)/2=55, (55+12)/2=33
    assert(got.map(_._4) === Seq(None, Some(10L), Some(11L), Some(55L)))
    assert(got.map(_._5) === Seq(None, Some(false), Some(true), Some(false)))
  }

  test("bucketCounts uses integer div bucketing") {
    val events = Seq((1L, 999L), (1L, 1000L), (1L, 1999L), (2L, 0L))
      .toDF("k", "tn")
    val got = Timeseries.bucketCounts(events, "k", "tn", bucketNanos = 1000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 0L, 1L), (1L, 1L, 2L), (2L, 0L, 1L)))
  }
}
