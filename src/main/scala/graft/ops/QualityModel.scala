package graft.ops

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the discriminative gate every large
  * pretraining pipeline runs after the cheap heuristics (GPT-3's
  * LR-over-features quality classifier, LLaMA's fastText filter,
  * RefinedWeb's "judge" models): train a linear classifier to recognize
  * "looks like the trusted corpus", then score the raw corpus at scan
  * speed.
  *
  * The engine-shaped design:
  *  - **Features**: hashed bag-of-words (`HashingTF`, binary=false) over
  *    the engine-wide whitespace+lowercase tokenization — the fastText
  *    feature class, no vocabulary state to ship.
  *  - **Fit**: MLlib `LogisticRegression` — distributed LBFGS; the model
  *    is one weight vector (KBs), deterministic for a fixed input
  *    partitioning (no random init, no sampling).
  *  - **Score**: `model.transform` is a per-row projection — scan-stage,
  *    no shuffle; the weight vector ships in the closure.
  *  - **Bootstrap labels**: [[weakLabels]] derives them from the
  *    heuristic gate ([[TextAnalytics.qualityScore]]) so the classifier
  *    generalizes the heuristic to inputs the hand rules miss — the
  *    standard cold-start (curated positives vs crawl negatives slot in
  *    the same `label` column when available).
  *
  * Complements [[TextAnalytics.bigramLmScore]]: that is the generative
  * (perplexity) gate, this the discriminative one; CCNet runs both.
  */
object QualityModel {

  /** Heuristic bootstrap labels: 1.0 where the hand-rule quality score
    * clears `threshold`, else 0.0.
    */
  def weakLabels(
      docs: DataFrame,
      textCol: String = "text",
      threshold: Double = 0.7): DataFrame =
    docs.withColumn("label",
      (TextAnalytics.qualityScore(col(textCol)) >= threshold).cast("double"))

  private def pipeline(textCol: String, numFeatures: Int) = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__words")
      .setPattern("\\s+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("__words").setOutputCol("__feats")
      .setNumFeatures(numFeatures)
    (tok, tf)
  }

  /** Fit the classifier on `(textCol, label)` rows. `numFeatures` is the
    * hashing width (collisions trade accuracy for a fixed-size model —
    * the fastText trade).
    */
  def fit(
      labeled: DataFrame,
      textCol: String = "text",
      numFeatures: Int = 1 << 12,
      maxIter: Int = 30,
      regParam: Double = 1e-3): LogisticRegressionModel = {
    val (tok, tf) = pipeline(textCol, numFeatures)
    val feats = tf.transform(tok.transform(labeled))
    new LogisticRegression()
      .setFeaturesCol("__feats").setLabelCol("label")
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(feats)
  }

  /** Score a corpus: adds `quality_prob` (P[high quality]). Pure per-row
    * work — the weight vector rides the closure, nothing shuffles.
    */
  def score(
      docs: DataFrame,
      model: LogisticRegressionModel,
      textCol: String = "text",
      numFeatures: Int = 1 << 12): DataFrame = {
    val (tok, tf) = pipeline(textCol, numFeatures)
    val feats = tf.transform(tok.transform(docs))
    val prob1 = udf { v: org.apache.spark.ml.linalg.Vector => v(1) }
    model.transform(feats)
      .withColumn("quality_prob", prob1(col(model.getProbabilityCol)))
      .drop("__words", "__feats",
        model.getRawPredictionCol, model.getProbabilityCol,
        model.getPredictionCol)
  }
}
