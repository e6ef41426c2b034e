package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(99L)
  private val goodVocab = Vector("the", "model", "learns", "from", "clean",
    "prose", "with", "sentences", "and", "structure", "data", "quality")
  private def goodDoc(): String =
    (0 until 20).map(_ => goodVocab(rnd.nextInt(goodVocab.size))).mkString(" ") + "."
  // a fixed noise vocabulary: BoW features only generalize in-distribution
  // (unseen tokens hash to untrained weights and land at the intercept)
  private val badVocab = Vector.fill(50)(rnd.alphanumeric.take(2 + rnd.nextInt(8)).mkString)
  private def badDoc(): String =
    (0 until 20).map(_ => badVocab(rnd.nextInt(badVocab.size))).mkString(" ")

  test("separates planted clean prose from gibberish on held-out docs") {
    val train = ((1 to 60).map(i => (goodDoc(), 1.0)) ++
      (1 to 60).map(i => (badDoc(), 0.0))).toDF("text", "label")
    val model = QualityClassifier.train(train, "text", "label",
      numFeatures = 1 << 12, maxIter = 30)
    val held = ((1L to 20L).map(i => (i, goodDoc(), true)) ++
      (21L to 40L).map(i => (i, badDoc(), false))).toDF("doc_id", "text", "expect")
    val out = QualityClassifier.score(model, held)
      .select(col("doc_id"), col("quality_keep"), col("expect"), col("quality_prob"))
      .as[(Long, Boolean, Boolean, Double)].collect()
    assert(out.length === 40)
    val wrong = out.filter(r => r._2 !== r._3)
    assert(wrong.length <= 2, // near-perfect on cleanly-separable planted data
      s"misclassified ${wrong.length}/40: ${wrong.take(5).mkString(",")}")
    out.foreach { case (_, _, _, p) => assert(p >= 0.0 && p <= 1.0) }
  }

  test("scoring is a pure projection: schema preserved + two new columns") {
    val train = ((1 to 20).map(_ => (goodDoc(), 1.0)) ++
      (1 to 20).map(_ => (badDoc(), 0.0))).toDF("text", "label")
    val model = QualityClassifier.train(train, "text", "label",
      numFeatures = 1 << 10, maxIter = 10)
    val docs = Seq((1L, goodDoc(), "en")).toDF("doc_id", "text", "lang")
    val scored = QualityClassifier.score(model, docs)
    assert(scored.columns.toSet ===
      Set("doc_id", "text", "lang", "quality_prob", "quality_keep"))
    // user columns named like ML defaults must survive untouched
    val tricky = Seq((1L, goodDoc(), 42.0)).toDF("doc_id", "text", "prediction")
    val scored2 = QualityClassifier.score(model, tricky)
    assert(scored2.select("prediction").head().getDouble(0) === 42.0)
  }
}
