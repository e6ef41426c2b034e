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
}
