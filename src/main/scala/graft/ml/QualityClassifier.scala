package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the classifier stage real
  * pretraining pipelines run between heuristic gates and the final mix
  * (GPT-3 appendix A: a logistic-regression classifier over hashed
  * text features, positives = a known-good reference corpus, scores
  * then threshold/sample the crawl; CCNet and successors keep the same
  * shape). The heuristic signals ([[graft.operators.TextAnalysis]]'s
  * quality score) are cheap but blind to fluent spam; a trained
  * classifier generalizes from a good-corpus seed. The reference
  * project has no counterpart (its GBT trains on tabular loan
  * features, model_operations.py) — this is a scale-pipeline addition
  * built from the same public MLlib surface as [[Training]].
  *
  * Scale shape: tokenization and feature hashing are MAP-SIDE
  * (RegexTokenizer + HashingTF — a fixed-width sparse vector per doc,
  * no vocabulary fit, no shuffle, no driver state); LR training is
  * MLlib's distributed L-BFGS (gradients tree-aggregated per
  * iteration — the only exchanges are coefficient-sized); SCORING is
  * one map-side pass with broadcast coefficients, so filtering 100 TB
  * costs exactly one scan. Hashing collisions at 2^18 features over a
  * ~10^5-token effective vocabulary cost a little accuracy, never
  * correctness of the plumbing — the standard trade the hashing trick
  * makes to avoid a fitted (driver-resident, shuffle-built) vocab. */
object QualityClassifier {

  /** Train on weak labels: `labelCol` ∈ {0.0, 1.0} (1 = known-good —
    * in production, docs from a trusted reference corpus; in tests,
    * synthetic clean-vs-junk). Seeded and deterministic. */
  def train(docs: DataFrame, labelCol: String, textCol: String,
            numFeatures: Int = 1 << 18, maxIter: Int = 20,
            regParam: Double = 1e-3): PipelineModel = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("_qc_toks")
      .setPattern("\\s+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("_qc_toks").setOutputCol("_qc_tf")
      .setNumFeatures(numFeatures)
    val lr = new LogisticRegression()
      .setFeaturesCol("_qc_tf").setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam)
    new Pipeline().setStages(Array(tok, tf, lr)).fit(docs)
  }

  /** Score a corpus: input columns plus `quality_p` = P(label = 1).
    * Map-side — broadcast coefficients, one pass, intermediate feature
    * columns dropped so the output schema is the input's + one.
    * `quality_p` is rounded to 6 decimals for stable display/oracle
    * comparison; [[filterByQuality]] gates on the UNROUNDED
    * probability (see there). */
  def score(model: PipelineModel, corpus: DataFrame): DataFrame =
    scoreRaw(model, corpus).drop("_quality_p_raw")

  /** Shared scoring tail: emits both the unrounded probability
    * (`_quality_p_raw`, the filter's gate column) and the 6-decimal
    * `quality_p` (the emitted/displayed column). */
  private def scoreRaw(model: PipelineModel, corpus: DataFrame): DataFrame =
    model.transform(corpus)
      .withColumn("_quality_p_raw",
        element_at(vector_to_array(col("probability")), 2))
      .withColumn("quality_p", round(col("_quality_p_raw"), 6))
      .drop("_qc_toks", "_qc_tf", "rawPrediction", "probability",
        "prediction")

  /** The filter stage: keep docs scoring ≥ threshold. Deliberately a
    * hard cut — GPT-3's Pareto-sampled acceptance trades determinism
    * for a smoother quality gradient, and this engine's convention is
    * deterministic gates (RNG-free, replay-identical); calibrate the
    * threshold on a held-out slice instead. The gate compares the
    * UNROUNDED P(label = 1) to the threshold — rounding first would
    * admit docs with true probability up to 5e-7 below it — and only
    * the emitted `quality_p` column is rounded. */
  def filterByQuality(model: PipelineModel, corpus: DataFrame,
                      threshold: Double): DataFrame =
    scoreRaw(model, corpus).filter(col("_quality_p_raw") >= threshold)
      .drop("_quality_p_raw")
}
