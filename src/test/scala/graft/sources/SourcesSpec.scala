package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("dimensionPredicate composes equalities with normalizers") {
    val df = Seq(("sync", "20180607", 1), ("main", "20180607", 2), ("sync", "20180608", 3))
      .toDF("docType", "submissionDate", "v")
    val out = df.where(Sources.dimensionPredicate(
      Map("docType" -> "sync", "submissionDate" -> "2018-06-07"),
      normalize = Map("submissionDate" ->
        (c => regexp_replace(c, "(\\d{4})(\\d{2})(\\d{2})", "$1-$2-$3")))))
      .select("v").as[Int].collect().toSeq
    assert(out === Seq(1))
  }

  test("generic format load round-trips") {
    val dir = Files.createTempDirectory("graft_src").toString
    Seq((1, "a"), (2, "b")).toDF("id", "s").write.json(s"$dir/j")
    val back = Sources.load(spark, "json", s"$dir/j")
    assert(back.count() === 2)
  }

  test("PartitionDimensions path model snakifies with suffix") {
    val pd = PartitionDimensions.parse("submissionDate=20180607/docType=sync")
    assert(pd.pathFor() === "submission_date_s3=20180607/doc_type_s3=sync")
    assert(pd.columns === Seq("submission_date_s3", "doc_type_s3"))
  }

  test("S5/K4/K5 built-ins: SQL temp-view scan, JSON sink, gzip text sink") {
    val dir = Files.createTempDirectory("graft_sinks").toString
    val df = Seq((1, "alpha"), (2, "beta")).toDF("id", "s")
    // S5: SQL scan over a registered table
    df.createOrReplaceTempView("sinks_t")
    assert(spark.sql("SELECT sum(id) FROM sinks_t").head().getLong(0) === 3L)
    // K4: JSON sink round-trip
    df.write.json(s"$dir/j")
    assert(spark.read.json(s"$dir/j").count() === 2)
    // K5: text sink with codec — files really gzip'd, content round-trips
    df.select(concat_ws(",", col("id"), col("s")).as("value"))
      .write.option("compression", "gzip").text(s"$dir/t")
    val gzFiles = new java.io.File(s"$dir/t").listFiles.filter(_.getName.endsWith(".txt.gz"))
    assert(gzFiles.nonEmpty)
    assert(spark.read.text(s"$dir/t").as[String].collect().toSet
      === Set("1,alpha", "2,beta"))
  }

  test("dimensionedScan prunes partition dirs via predicates") {
    val dir = Files.createTempDirectory("graft_src2").toString
    Seq((1L, "20180607"), (2L, "20180608")).toDF("id", "submission_date")
      .write.partitionBy("submission_date").parquet(s"$dir/t")
    val out = Sources.dimensionedScan(spark, s"$dir/t",
      Map("submission_date" -> "20180607"))
    assert(out.select("id").as[Long].collect().toSeq === Seq(1L))
  }
}
