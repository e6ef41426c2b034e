package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("vectorSum/vectorMean: element-wise over groups, null vectors skipped") {
    val df = Seq(
      ("a", Seq(1f, 2f, 3f)), ("a", Seq(10f, 20f, 30f)),
      ("b", Seq(5f, 5f)), ("b", null.asInstanceOf[Seq[Float]])
    ).toDF("label", "embedding")
    val out = df.groupBy($"label")
      .agg(VectorAgg.vectorSum($"embedding").as("s"),
        VectorAgg.vectorMean($"embedding").as("m"))
      .as[(String, Seq[Double], Seq[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a")._1 === Seq(11.0, 22.0, 33.0))
    assert(out("a")._2 === Seq(5.5, 11.0, 16.5))
    // the null vector is skipped entirely — and does NOT count toward the
    // mean's denominator
    assert(out("b")._1 === Seq(5.0, 5.0))
    assert(out("b")._2 === Seq(5.0, 5.0))
  }

  test("ragged lengths aggregate over the union length (zero-pad convention)") {
    val df = Seq(("a", Seq(1f, 1f)), ("a", Seq(1f, 1f, 4f))).toDF("label", "embedding")
    val s = df.groupBy($"label").agg(VectorAgg.vectorSum($"embedding").as("s"))
      .select("s").as[Seq[Double]].head()
    assert(s === Seq(2.0, 2.0, 4.0))
  }

  test("Aggregator agrees with the exact decimal relational path on real embeddings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val fast = emb.groupBy($"label")
      .agg(VectorAgg.vectorSum($"embedding").as("s"), count(lit(1)).as("n"))
      .as[(String, Seq[Double], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = VectorAgg.vectorSumRows(emb, "embedding", Seq("label"))
      .select($"label", $"vec_sum_micro", $"n_vectors")
      .as[(String, Seq[Long], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fast.keySet === exact.keySet)
    fast.foreach { case (label, (s, n)) =>
      val (es, en) = exact(label)
      assert(n === en)
      assert(s.size === es.size)
      // float-order sums vs micro-unit fixed point: within the per-row
      // quantization (0.5e-6 each) plus accumulated float error
      s.zip(es).foreach { case (a, bMicro) =>
        assert(math.abs(a - bMicro / 1e6) < 1e-2, s"$label: $a vs $bMicro") }
    }
  }

  test("centroidDrift: hand-checked L1, missing bucket breaks the chain") {
    import spark.implicits._
    // bucket 0: means (2, 3); bucket 1: means (2, 2) → L1 = 1.0 = 10⁶ µ
    val df = Seq(
      (0L, Seq(1.0f, 2.0f)), (0L, Seq(3.0f, 4.0f)),
      (1L, Seq(2.0f, 2.0f)),
      (3L, Seq(9.0f, 9.0f))) // bucket 2 missing: 1→2 and 2→3 absent
      .toDF("bucket", "embedding")
    val got = VectorAgg.centroidDrift(df, "embedding", "bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((0L, 1L, 2L, 1L, 1000000L)))
    // identical consecutive buckets drift exactly 0
    val same = VectorAgg.centroidDrift(
        Seq((0L, Seq(1.5f, -2.0f)), (1L, Seq(1.5f, -2.0f)))
          .toDF("bucket", "embedding"),
        "embedding", "bucket")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(same === ((0L, 1L, 1L, 1L, 0L)))
  }

  test("centroidOutliers: hand-checked scores, negative deviations exact") {
    import spark.implicits._
    // label 0: three vectors, one far off; mean = (1, 0)
    // v1 (0,0):  dev (-1e6, 0)     → d2 = 1e12
    // v2 (0,-3): dev (-1e6, -3e6)  → d2 = 1e13  (flagged)
    // v3 (3,3):  dev (2e6, 3e6)    → d2 = 1.3e13 (flagged)
    val df = Seq(
      (1L, 0, Seq(0.0f, 0.0f)),
      (2L, 0, Seq(0.0f, -3.0f)),
      (3L, 0, Seq(3.0f, 3.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = VectorAgg.centroidOutliers(df, "embedding", "vec_id",
        Seq("label"), threshold = 5000000000000L)
      .select(col("vec_id"), col("d2_micro2"), col("outlier"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 1000000000000L, false),
      (2L, 10000000000000L, true),
      (3L, 13000000000000L, true)))
  }
}
