package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Model-quality parity measurement — the engine's counterpart of the
  * reference's recorded quality envelope (LightGBM macro-F1 0.9122 on
  * ~577 k rows / CatBoost 45.6 s,
  * utils/model_bank/baseline_metrics_20250623_072546.json): train both
  * distributed backends on the credit-shaped parity fixture
  * ([[graft.queries.PipelineE2E.parityFrame]] — silver→gold store
  * assembly with a learnable, noise-bounded grade), record macro-F1 and
  * wall-clock, print one JSON line per backend. Everything is seeded
  * and RNG-free (hash split, fixed backend seeds), so the recorded
  * numbers replay exactly; the committed results live in NOTES.md
  * ("Model-quality parity run").
  *
  * Usage: tools/run.sh graft.ParityRun [nLoans] — default 600000,
  * mirroring the envelope's ~577 k training rows.
  */
object ParityRun {
  def main(args: Array[String]): Unit = {
    val nLoans = args.headOption.map(_.toInt).getOrElse(600000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-parity")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val grades = "ABCDEFG".map(_.toString)
    // label = grade index (the persisted gradeMapping); features = every
    // numeric store column. Nulls the gold imputation leaves behind are
    // zero-filled — MLlib trees reject NaN/null vectors.
    val frame = graft.queries.PipelineE2E.parityFrame(spark, nLoans)
      .withColumn("label",
        (array_position(array(grades.map(lit): _*), col("grade")) - 1)
          .cast("double"))
    // grade_encoded is the M6 label encoding riding the feature store
    // (reference shape) — it IS the target, so it must not be a feature
    val featureCols = frame.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
        && f.name != "label" && f.name != "grade_encoded" => f.name
    }.toSeq
    val clean = frame.na.fill(0.0, featureCols).na.fill(0, featureCols)
    // hash-split on the loan id BEFORE assembly so the split is
    // layout-independent (a synthesized monotonically_increasing_id
    // would depend on partitioning)
    val (train, test) = {
      val split = graft.ops.Sampling.hashSplit(clean, "id", testPct = 20)
      (graft.ml.Training.assemble(split._1, featureCols, "label"),
        graft.ml.Training.assemble(split._2, featureCols, "label"))
    }
    train.cache(); test.cache()
    val (nTrain, nTest) = (train.count(), test.count())

    def macroF1(pred: org.apache.spark.sql.DataFrame): Double =
      graft.metrics.Classification.summarize(
        graft.metrics.Classification.confusion(
          pred.select(col("label").cast("string").as("l"),
            col("prediction").cast("string").as("p")), "l", "p"),
        (0 until 7).map(i => s"$i.0")).macroF1

    def run(name: String, config: String,
            backend: graft.ml.Training.Backend): Unit = {
      val t0 = System.nanoTime()
      val f1 = macroF1(backend.fitPredict(train, test))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"backend":"$name","macro_f1":$f1%.4f,"wall_sec":$sec%.1f,"rows_train":$nTrain,"rows_test":$nTest,"n_features":${featureCols.size},"config":"$config","seed":42}""")
    }
    // reference-mirroring shapes: GBT 150 rounds / depth 4 / lr 0.1
    // (LightGBM_training_run.py:125-153), RF as the cheaper alternative
    run("gbt_ovr", "maxIter=150,maxDepth=4,stepSize=0.1,valFrac=0.2",
      new graft.ml.Training.GradientBoostedBackend(150, 4, 0.1, 42L, 0.2))
    run("random_forest", "numTrees=50,maxDepth=6",
      new graft.ml.Training.RandomForestBackend(50, 6, 42L))
    spark.stop()
  }
}
