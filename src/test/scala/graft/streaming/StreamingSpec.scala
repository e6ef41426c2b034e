package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.concurrent.{Signaler, ThreadSignaler, TimeLimitedTests}
import org.scalatest.time.{Minutes, Span}
import graft.SparkSpec

class StreamingSpec extends SparkSpec with TimeLimitedTests {
  import spark.implicits._

  // A wedged streaming query must FAIL the suite, not hang sbt test forever.
  override val timeLimit: Span = Span(5, Minutes)
  override val defaultTestSignaler: Signaler = ThreadSignaler

  test("file stream → windowed counts → memory sink (batch-driven)") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val data = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), "view", 3.0)
    ).toDF("ts", "event_type", "value")
    data.write.parquet(s"$dir/in")

    val stream = StreamingViews.fileStream(spark, s"$dir/in", data.schema)
    val agg = StreamingViews.windowedCounts(stream, "ts", "event_type")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("wc").start()
    try {
      q.processAllAvailable()
      val out = spark.table("wc").select("event_type", "n").as[(String, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(out === Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("sessionize folds events into per-user state and emits on watermark timeout") {
    val dir = Files.createTempDirectory("graft_stream3").toString
    Seq(
      StreamingViews.SessionEvent(1L, 1000L, 2.0),
      StreamingViews.SessionEvent(1L, 2000L, 3.0),
      StreamingViews.SessionEvent(2L, 1500L, 7.0)
    ).toDF.write.parquet(s"$dir/in")
    val stream = StreamingViews.fileStream(spark, s"$dir/in",
      Seq(StreamingViews.SessionEvent(0L, 0L, 0.0)).toDF.schema)
      .as[StreamingViews.SessionEvent]
    val sessions = StreamingViews.sessionize(stream, gapMillis = 100L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess").start()
    try {
      q.processAllAvailable() // batch 1: state for users 1, 2; watermark → 2000
      // user 1's events are 1000 ms apart with gap=100: the first session
      // closes DATA-DRIVEN inside batch 1 (no timeout needed); the open
      // sessions (1@2000, 2@1500) need the watermark advanced past their
      // gap — drop a second file, deterministic, no wall-clock sleep.
      Seq(StreamingViews.SessionEvent(99L, 1000000L, 0.0))
        .toDF.write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val deadline = System.nanoTime() + 60L * 1000000000L
      def emitted() = spark.table("sess")
        .where(col("userId") < 99) // user 99 only advances the watermark
        .select("userId", "nEvents", "sumValue").as[(Long, Long, Double)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
      var out = emitted()
      while (out.size < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100) // no-data micro-batch fires the event-time timeouts
        q.processAllAvailable()
        out = emitted()
      }
      assert(out === Seq((1L, 1L, 2.0), (1L, 1L, 3.0), (2L, 1L, 7.0)))
    } finally q.stop()
  }

  test("streaming dedupe keeps first occurrence per key") {
    val dir = Files.createTempDirectory("graft_stream2").toString
    val data = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "k1", "first"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "k1", "first"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), "k2", "other")
    ).toDF("ts", "key", "payload")
    data.write.parquet(s"$dir/in")

    val stream = StreamingViews.fileStream(spark, s"$dir/in", data.schema)
    val deduped = StreamingViews.streamingDedupe(stream, "ts", Seq("key"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dd").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dd").count() === 2)
    } finally q.stop()
  }
}
