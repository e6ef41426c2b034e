package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity ([[Privacy]]): suppression thresholds,
  * null-combination semantics, and the exact-integer generalization. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (id, region, segment, secret)
    (1L, "eu", "a", "x"), (2L, "eu", "a", "y"), (3L, "eu", "a", "z"),
    (4L, "eu", "b", "x"), (5L, "eu", "b", "x"),
    (6L, "us", "a", "x")).toDF("id", "region", "segment", "secret")

  test("kAnonymize keeps exactly the ≥k combinations") {
    val got = Privacy.kAnonymize(rows, Seq("region", "segment"), k = 2)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 4L, 5L)) // (us,a) has 1 row: suppressed
    assert(Privacy.kAnonymize(rows, Seq("region", "segment"), k = 4)
      .count() === 0L)
  }

  test("a null quasi combination counts as a group, not auto-suppressed") {
    val withNulls = Seq((1L, Some("eu")), (2L, None: Option[String]),
      (3L, None: Option[String])).toDF("id", "region")
    val got = Privacy.kAnonymize(withNulls, Seq("region"), k = 2)
      .select("id").as[Long].collect().toSet
    assert(got === Set(2L, 3L)) // the two null rows link to each other
  }

  test("anonymityReport verdicts and lDiversify filter") {
    val rep = Privacy.anonymityReport(rows, Seq("region", "segment"),
        "secret", k = 2, l = 3)
      .select("region", "segment", "rows", "sensitive_distinct", "k_ok",
        "l_ok")
      .as[(String, String, Long, Long, Boolean, Boolean)].collect().toSet
    assert(rep === Set(
      ("eu", "a", 3L, 3L, true, true),
      ("eu", "b", 2L, 1L, true, false), // k ok, but every secret is "x"
      ("us", "a", 1L, 1L, false, false)))
    val released = Privacy.lDiversify(rows, Seq("region", "segment"),
        "secret", k = 2, l = 3)
      .select("id").as[Long].collect().toSet
    assert(released === Set(1L, 2L, 3L))
  }

  test("an all-null secret group has diversity 0") {
    val df = Seq((1L, "eu", None: Option[String]),
      (2L, "eu", None: Option[String])).toDF("id", "region", "secret")
    assert(Privacy.lDiversify(df, Seq("region"), "secret", k = 1, l = 1)
      .count() === 0L)
  }

  test("generalizeNum floors toward -infinity in pure integer math") {
    val df = Seq(-3L, -2L, -1L, 0L, 1L, 2L, 3L).toDF("v")
    val got = Privacy.generalizeNum(df, "v", 2L).as[Long].collect().toSeq
    assert(got === Seq(-4L, -2L, -2L, 0L, 0L, 2L, 2L))
  }
}
