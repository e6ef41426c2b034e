package graft.udafs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCms: never underestimates, within eps*N, and merges exactly") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val eps = 1e-4
    val full = Sketches.tokenCms(docs, "text", eps, 0.99, seed = 42)
    val exact = docs
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    assert(full.totalCount() === exact.values.sum)
    val budget = math.ceil(eps * full.totalCount()).toLong
    exact.foreach { case (w, n) =>
      val est = full.estimateCount(w)
      assert(est >= n, s"underestimate for $w")
      assert(est <= n + budget, s"$w: $est vs $n (+$budget)")
    }
    // the 100 TB pattern: per-shard sketches with the SAME (eps, conf,
    // seed) merge into exactly the sketch of the union
    val odd = Sketches.tokenCms(docs.where(col("doc_id") % 2 === 1),
      "text", eps, 0.99, seed = 42)
    val even = Sketches.tokenCms(docs.where(col("doc_id") % 2 === 0),
      "text", eps, 0.99, seed = 42)
    odd.mergeInPlace(even)
    assert(odd.totalCount() === full.totalCount())
    exact.keys.foreach { w =>
      assert(odd.estimateCount(w) === full.estimateCount(w), w)
    }
  }

  test("bucketTokenCms artifacts merge byte-identical to the whole-frame sketch") {
    import org.apache.spark.util.sketch.CountMinSketch
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(expr("doc_id div 100").as("bucket"), col("text"), col("doc_id"))
    val (eps, conf, seed) = (1e-3, 0.99, 7)
    val perBucket = graft.ops.Timeseries.bucketTokenCms(
      docs, "text", "bucket", eps, conf, seed)
    // n_tokens is the exact per-bucket token count
    val exactPerBucket = docs
      .select(col("bucket"), explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .groupBy("bucket").count().as[(Long, Long)].collect().toMap
    val got = perBucket.select(col("bucket"), col("n_tokens"))
      .as[(Long, Long)].collect().toMap
    assert(got === exactPerBucket)
    // weighted adds land the identical counter grid: merging every
    // bucket's sketch == one whole-frame tokenCms build, byte for byte
    val merged = perBucket.select(col("sketch")).as[Array[Byte]].collect()
      .map(b => CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    val whole = Sketches.tokenCms(docs, "text", eps, conf, seed)
    def bytes(s: CountMinSketch): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      s.writeTo(bos)
      bos.toByteArray
    }
    assert(java.util.Arrays.equals(bytes(merged), bytes(whole)))
  }

  test("rollingTokenFreqFromSketches windows honor the CMS guarantee") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(expr("doc_id div 100").as("bucket"), col("text"))
    val (eps, conf, seed) = (1e-3, 0.99, 7)
    val watch = Seq("the", "of", "zzz_absent_zzz")
    val win = 3
    val sk = graft.ops.Timeseries.bucketTokenCms(
      docs, "text", "bucket", eps, conf, seed)
    val est = graft.ops.Timeseries.rollingTokenFreqFromSketches(
        sk, "bucket", "sketch", watch, win, eps, conf, seed)
      .as[(Long, String, Long)].collect()
    val tok = docs
      .select(col("bucket"), explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .as[(Long, String)].collect()
    val buckets = tok.map(_._1).distinct.sorted
    // every (window end, watch token) pair appears exactly once
    assert(est.map(r => (r._1, r._2)).toSet ===
      (for (b <- buckets; t <- watch) yield (b, t)).toSet)
    est.foreach { case (wend, t, e) =>
      val inWin = tok.filter { case (b, _) =>
        b >= wend - (win - 1) && b <= wend }
      val exact = inWin.count(_._2 == t).toLong
      val budget = math.ceil(eps * inWin.length).toLong
      assert(e >= exact, s"underestimate for ($wend, $t)")
      assert(e <= exact + budget, s"($wend, $t): $e vs $exact (+$budget)")
    }
  }
}
