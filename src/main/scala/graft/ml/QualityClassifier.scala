package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the fastText/CCNet pattern
  * (Wenzek et al. 2020: a linear classifier over bag-of-words features
  * separates "looks like the target corpus" from crawl noise) expressed on
  * Spark ML: RegexTokenizer → HashingTF (feature hashing keeps the space
  * fixed at any vocabulary, no fitted dictionary to ship) → logistic
  * regression. Complements the heuristic gates ([[graft.text.TextOps
  * .qualitySignals]], repetition/rare-token signals): heuristics catch
  * structural junk; the classifier learns topical/stylistic quality from
  * labeled examples.
  *
  * Scale shape: training is one cached pass over the (small, labeled)
  * example set per L-BFGS iteration; SCORING — the part that touches the
  * 100 TB corpus — is a single `PipelineModel.transform` projection
  * (hashing + one dot product per row, no shuffle, no state). */
object QualityClassifier {

  /** Train on labeled examples: `labelCol` ∈ {0.0, 1.0} (1 = keep). */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1 << 18, maxIter: Int = 50,
            regParam: Double = 1e-3): PipelineModel = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__words")
      .setPattern("\\s+") // split on whitespace — matches TextOps.tokens
    val tf = new HashingTF()
      .setInputCol("__words").setOutputCol("__features")
      .setNumFeatures(numFeatures)
    val lr = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam)
      // every intermediate column __-prefixed: transform() must never
      // clobber (or collide with) a user column named "prediction" etc.
      .setProbabilityCol("__prob")
      .setRawPredictionCol("__raw_pred")
      .setPredictionCol("__pred")
    new Pipeline().setStages(Array(tok, tf, lr)).fit(labeled)
  }

  /** Score `docs`: adds `quality_prob` (P(keep)) and `quality_keep`
    * (prob ≥ threshold). Pure projection over the corpus. */
  def score(model: PipelineModel, docs: DataFrame,
            threshold: Double = 0.5): DataFrame =
    model.transform(docs)
      .withColumn("quality_prob", vector_to_array(col("__prob")).getItem(1))
      .withColumn("quality_keep", col("quality_prob") >= threshold)
      .drop("__words", "__features", "__prob", "__raw_pred", "__pred")
}
