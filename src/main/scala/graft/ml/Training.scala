package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, OneVsRest, RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML lifecycle surface (SURVEY §2.10 M3, M10–M12).
  *
  * Training itself is the one unavoidable much-smaller-than-the-data
  * step (the reference collects ~720k rows to the driver for LightGBM,
  * model_operations.py:46); here it stays behind a trait with two
  * Spark-native distributed backends — gradient-boosted trees via
  * OneVsRest (honoring the reference's "gradient-boosted, 7 classes",
  * SURVEY §2.10 M11) and RandomForest (the cheaper single-ensemble
  * multiclass alternative) — and the feature matrix never leaves the
  * cluster.
  */
object Training {

  /** Feature assembly: numeric columns → MLlib vector. */
  def assemble(df: DataFrame, featureCols: Seq[String],
               labelCol: String): DataFrame =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("keep")
      .transform(df)
      .select(col("features"), col(labelCol).cast("double").as("label"))

  /** Swappable training backend (M11). */
  trait Backend {
    def fitPredict(train: DataFrame, test: DataFrame): DataFrame
  }

  /** Spark-native multiclass backend: distributed fit, distributed
    * scoring; seeded for determinism. */
  final class RandomForestBackend(numTrees: Int = 50, maxDepth: Int = 6,
                                  seed: Long = 42L) extends Backend {
    def fitPredict(train: DataFrame, test: DataFrame): DataFrame = {
      val rf = new RandomForestClassifier()
        .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
        .setLabelCol("label").setFeaturesCol("features")
      rf.fit(train).transform(test)
    }
  }

  /** Gradient-boosted backend (M11): the reference's core trainer is
    * LightGBM/CatBoost multiclass (LightGBM_training_run.py:125–153 —
    * max_depth 4, lr 0.1, 150 estimators). MLlib's GBTClassifier is
    * binary-only, so the 7-class target goes through OneVsRest: 7
    * independent boosted ensembles, each a distributed fit. Defaults
    * mirror the reference's shape; maxIter is the estimator count.
    *
    * Early stopping mirrors the reference's `early_stopping_rounds=15`
    * against a held-out eval set (LightGBM_training_run.py:131): a seeded
    * `validationFraction` slice of the training set is flagged via
    * `validationIndicatorCol` (OneVsRest passes the column through to
    * each binary fit), and boosting stops once the validation-measure
    * improvement drops below `validationTol` — MLlib's stop rule bounds
    * compute the same way, though it has no round-count patience knob.
    * `validationFraction = 0` disables the hold-out and always runs
    * maxIter rounds. */
  final class GradientBoostedBackend(maxIter: Int = 150, maxDepth: Int = 4,
                                     stepSize: Double = 0.1,
                                     seed: Long = 42L,
                                     validationFraction: Double = 0.2,
                                     validationTol: Double = 0.01) extends Backend {
    /** Distributed OneVsRest fit; exposed (not just fitPredict) so
      * callers can inspect the per-class ensembles — e.g. how many
      * rounds each ran before the validation stop. */
    def fit(train: DataFrame): org.apache.spark.ml.classification.OneVsRestModel = {
      val gbt = new GBTClassifier()
        .setMaxIter(maxIter).setMaxDepth(maxDepth).setStepSize(stepSize)
        .setSeed(seed)
        .setLabelCol("label").setFeaturesCol("features")
      require(validationFraction >= 0 && validationFraction < 1,
        s"validationFraction must be in [0, 1): $validationFraction")
      val fitOn = if (validationFraction > 0) {
        gbt.setValidationIndicatorCol("is_val")
        gbt.set(gbt.validationTol, validationTol)
        // hash-based membership, not rand(): rand(seed) depends on the
        // physical partition layout, so the same data repartitioned
        // would train a different model — content hashing keeps the
        // split (and the fitted model) reproducible across layouts,
        // reusing Sampling.hashBucket's membership idiom. Percent is
        // rounded and clamped to [1, 99] so quantization can never
        // DETERMINISTICALLY empty the validation set (MLlib crashes
        // averaging validation error over zero rows) or the training
        // set; a tiny dataset can still land zero rows in the hash
        // bucket — use validationFraction = 0 there.
        val pct = math.min(99, math.max(1, math.round(validationFraction * 100).toInt))
        train.withColumn("is_val",
          graft.ops.Sampling.hashBucket(
            struct(col("features"), col("label")), seed.toString) < pct)
      } else train
      // materialize the assembled (features, label, is_val) frame ONCE
      // across the per-class binary fits: each OneVsRest slot relabels
      // and re-scans it per boosting pass, and an uncached lineage would
      // re-run the upstream assembly/hash-split for every one of them.
      // (OneVsRest's own handlePersistence only kicks in on ITS derived
      // projection per fit; caching here shares the blocks across all
      // slots.)
      val preCached =
        fitOn.storageLevel != org.apache.spark.storage.StorageLevel.NONE
      if (!preCached)
        fitOn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // one slot per DISTINCT label, derived from the data (capped at
      // 16 so a high-cardinality label can't flood the scheduler) — the
      // fits are iterative many-small-stage jobs, so concurrent slots
      // fill the scheduler instead of serializing nClasses × maxIter
      // rounds; a hard-coded constant would silently under-fill or
      // over-provision the pool when the cardinality differs. The
      // distinct-count job runs on the frame just cached above.
      val nClasses = fitOn.select("label").distinct().count().toInt
      val ovr = new OneVsRest().setClassifier(gbt)
        .setLabelCol("label").setFeaturesCol("features")
        .setParallelism(math.min(16, math.max(1, nClasses)))
      try ovr.fit(fitOn)
      finally if (!preCached) fitOn.unpersist(false)
    }

    def fitPredict(train: DataFrame, test: DataFrame): DataFrame =
      fit(train).transform(test)
  }

  /** M10 — area under ROC for a binary target given scores. */
  def binaryAuc(scored: DataFrame, labelCol: String, scoreCol: String): Double =
    new BinaryClassificationEvaluator()
      .setLabelCol(labelCol).setRawPredictionCol(scoreCol)
      .setMetricName("areaUnderROC")
      .evaluate(scored)

  /** M12 — model selection: argmax macro-F1 over candidate runs. */
  def selectBest(runs: Seq[(String, Double)]): (String, Double) =
    runs.maxBy { case (name, f1) => (f1, name) }

  /** Deterministic hyperparameter search — the engine's counterpart of
    * the reference's hyperopt-TPE retrain variant
    * (utils/model_operations.py:87–159: 20 TPE evals over learning
    * rate / depth / leaves, best refit and registered). TPE's adaptive
    * proposals are RNG-driven and order-dependent; the engine's
    * convention is replay-identical runs, so the search is an EXPLICIT
    * candidate list evaluated in its given order — a grid
    * ([[gbtGrid]]/[[rfGrid]], composable with `++`) or any
    * caller-fixed sequence — under the same `selectBest` contract
    * (argmax score, name tie-break) and the same registry wiring
    * downstream ([[Lifecycle]] unchanged: register the winner, promote
    * on improvement).
    *
    * Each candidate is a full distributed fit; `score` maps its test
    * predictions to the selection metric (macro-F1 in the reference's
    * contract — pass
    * `Classification.summarize(confusion(...), classes).macroF1`).
    * Returns (winner, every run's (name, score)) so callers can log
    * the whole search the way the reference logs each TPE trial.
    * Candidates run sequentially: each fit is itself cluster-parallel,
    * and MLlib estimators fitting concurrently on one session contend
    * for the scheduler with no wall-clock win at this layer. */
  def searchBest(candidates: Seq[(String, Backend)],
                 train: DataFrame, test: DataFrame,
                 score: DataFrame => Double)
      : ((String, Double), Seq[(String, Double)]) = {
    require(candidates.nonEmpty, "searchBest needs at least one candidate")
    require(candidates.map(_._1).distinct.size == candidates.size,
      "candidate names must be unique (they key the search log and registry)")
    val runs = candidates.map { case (name, backend) =>
      (name, score(backend.fitPredict(train, test)))
    }
    (selectBest(runs), runs)
  }

  /** GBT candidate grid over the reference's TPE dimensions (lr ×
    * depth; MLlib GBT has no leaf-count knob — maxIter stands in for
    * the compute axis). Names encode the config so a registry entry is
    * self-describing. */
  def gbtGrid(maxIters: Seq[Int] = Seq(150),
              maxDepths: Seq[Int] = Seq(3, 4, 6),
              stepSizes: Seq[Double] = Seq(0.05, 0.1),
              seed: Long = 42L,
              validationFraction: Double = 0.2): Seq[(String, Backend)] =
    for { i <- maxIters; d <- maxDepths; s <- stepSizes }
      yield (f"gbt_i${i}_d${d}_lr$s%.3f",
        new GradientBoostedBackend(i, d, s, seed, validationFraction))

  /** RandomForest candidate grid (trees × depth). */
  def rfGrid(numTrees: Seq[Int] = Seq(50, 100),
             maxDepths: Seq[Int] = Seq(6, 10),
             seed: Long = 42L): Seq[(String, Backend)] =
    for { t <- numTrees; d <- maxDepths }
      yield (s"rf_t${t}_d${d}", new RandomForestBackend(t, d, seed))

  /** M1–M4 reference-compat mode: per-batch StringIndexer(keep) +
    * OneHotEncoder(dropLast=false) + vector_to_array flattening —
    * bit-compatible with gold_feature_store.py:114–123 for oracle
    * equivalence tests. The engine-native path (fixed dictionaries,
    * ColumnOps.oneHot) is preferred; this exists because the reference's
    * column meanings are frequency-dependent per batch. */
  def compatOneHot(df: DataFrame, c: String): DataFrame = {
    val pipeline = new Pipeline().setStages(Array(
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("keep"),
      new OneHotEncoder().setInputCols(Array(s"${c}_idx"))
        .setOutputCols(Array(s"${c}_vec")).setDropLast(false)))
    val model = pipeline.fit(df)
    val labels = model.stages(0)
      .asInstanceOf[org.apache.spark.ml.feature.StringIndexerModel]
      .labelsArray(0)
    val flat = model.transform(df)
      .withColumn("_arr", vector_to_array(col(s"${c}_vec")))
    labels.zipWithIndex.foldLeft(flat) { case (acc, (_, i)) =>
      acc.withColumn(s"${c}_ohe_$i", element_at(col("_arr"), i + 1).cast("int"))
    }.drop(s"${c}_idx", s"${c}_vec", "_arr")
  }
}
