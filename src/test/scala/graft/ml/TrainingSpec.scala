package graft.ml

import graft.SparkSpec
import graft.metrics.Classification
import graft.ops.Sampling
import org.apache.spark.sql.functions._

class TrainingSpec extends SparkSpec {
  import spark.implicits._

  // learnable synthetic task: label = f(x1, x2) with noise-free rule
  private lazy val data = spark.range(2000)
    .select(
      (col("id") % 17 / 17.0).as("x1"),
      (col("id") % 23 / 23.0).as("x2"),
      (col("id") % 5 / 5.0).as("x3"),
      col("id"))
    .withColumn("label_raw",
      when(col("x1") + col("x2") > 1.0, 2)
        .when(col("x1") > 0.5, 1).otherwise(0))

  test("RandomForest backend learns a separable multiclass rule") {
    val assembled = Training.assemble(
      data.withColumnRenamed("label_raw", "y"), Seq("x1", "x2", "x3"), "y")
      .withColumn("id", monotonically_increasing_id())
    val (train, test) = Sampling.hashSplit(assembled, "id", testPct = 25)
    val pred = new Training.RandomForestBackend(numTrees = 20, maxDepth = 5)
      .fitPredict(train.drop("id"), test.drop("id"))
    val summary = Classification.summarize(
      Classification.confusion(
        pred.select(col("label").cast("string").as("l"),
          col("prediction").cast("string").as("p")), "l", "p"),
      Seq("0.0", "1.0", "2.0"))
    assert(summary.accuracy > 0.95, s"accuracy ${summary.accuracy}")
    assert(summary.macroF1 > 0.9, s"macroF1 ${summary.macroF1}")
  }

  test("gradient-boosted backend (OneVsRest GBT) beats-or-ties RF on the same split") {
    val assembled = Training.assemble(
      data.withColumnRenamed("label_raw", "y"), Seq("x1", "x2", "x3"), "y")
      .withColumn("id", monotonically_increasing_id())
    val (train, test) = Sampling.hashSplit(assembled, "id", testPct = 25)
    def f1Of(backend: Training.Backend): Double = {
      val pred = backend.fitPredict(train.drop("id"), test.drop("id"))
      Classification.summarize(
        Classification.confusion(
          pred.select(col("label").cast("string").as("l"),
            col("prediction").cast("string").as("p")), "l", "p"),
        Seq("0.0", "1.0", "2.0")).macroF1
    }
    val gbtF1 = f1Of(new Training.GradientBoostedBackend(maxIter = 20, maxDepth = 5))
    val rfF1 = f1Of(new Training.RandomForestBackend(numTrees = 20, maxDepth = 5))
    assert(gbtF1 > 0.9, s"GBT macroF1 $gbtF1")
    assert(gbtF1 >= rfF1, s"GBT macroF1 $gbtF1 should beat-or-tie RF $rfF1")
    // seeded determinism: same seed, same split -> identical metric
    val gbtF1Again = f1Of(new Training.GradientBoostedBackend(maxIter = 20, maxDepth = 5))
    assert(gbtF1Again == gbtF1)
  }

  test("searchBest: deterministic grid search beats-or-ties both fixed backends, replays identically") {
    val assembled = Training.assemble(
      data.withColumnRenamed("label_raw", "y"), Seq("x1", "x2", "x3"), "y")
      .withColumn("id", monotonically_increasing_id())
    val (train, test) = Sampling.hashSplit(assembled, "id", testPct = 25)
    val (tr, te) = (train.drop("id").cache(), test.drop("id").cache())
    def f1(pred: org.apache.spark.sql.DataFrame): Double =
      Classification.summarize(
        Classification.confusion(
          pred.select(col("label").cast("string").as("l"),
            col("prediction").cast("string").as("p")), "l", "p"),
        Seq("0.0", "1.0", "2.0")).macroF1
    // 6 candidates spanning both families; includes both fixed-default
    // shapes used elsewhere in this suite, so the winner can't lose to
    // them — the verdict contract for replacing a fixed-param retrain
    val grid = Training.gbtGrid(Seq(20), Seq(3, 5), Seq(0.1, 0.3)) ++
      Training.rfGrid(Seq(20), Seq(5)) ++ Training.rfGrid(Seq(10), Seq(3))
    assert(grid.size >= 6, s"grid must span >= 6 configs, got ${grid.size}")
    val ((bestName, bestF1), runs) = Training.searchBest(grid, tr, te, f1)
    assert(runs.size == grid.size, "every candidate must be evaluated")
    val fixedGbt = f1(new Training.GradientBoostedBackend(
      maxIter = 20, maxDepth = 5).fitPredict(tr, te))
    val fixedRf = f1(new Training.RandomForestBackend(20, 5).fitPredict(tr, te))
    assert(bestF1 >= fixedGbt, s"search $bestName=$bestF1 lost to fixed GBT $fixedGbt")
    assert(bestF1 >= fixedRf, s"search $bestName=$bestF1 lost to fixed RF $fixedRf")
    // replay-identical: same candidates, same split, same scores/winner
    val ((bestName2, bestF12), runs2) = Training.searchBest(grid, tr, te, f1)
    assert((bestName2, bestF12) == ((bestName, bestF1)) && runs2 == runs,
      "the search must be replay-identical")
    // the winner flows into the registry exactly like a fixed backend's
    // run — selectBest is the shared contract
    assert(Training.selectBest(runs) == ((bestName, bestF1)))
    tr.unpersist(); te.unpersist()
  }

  test("GBT early stopping halts before maxIter on a converged task without losing F1") {
    import org.apache.spark.ml.classification.GBTClassificationModel
    val assembled = Training.assemble(
      data.withColumnRenamed("label_raw", "y"), Seq("x1", "x2", "x3"), "y")
      .withColumn("id", monotonically_increasing_id())
    val (train, test) = Sampling.hashSplit(assembled, "id", testPct = 25)
    def f1Of(pred: org.apache.spark.sql.DataFrame): Double =
      Classification.summarize(
        Classification.confusion(
          pred.select(col("label").cast("string").as("l"),
            col("prediction").cast("string").as("p")), "l", "p"),
        Seq("0.0", "1.0", "2.0")).macroF1
    val es = new Training.GradientBoostedBackend(maxIter = 60, maxDepth = 5,
      validationTol = 0.05)
    val model = es.fit(train.drop("id"))
    val trees = model.models.map(_.asInstanceOf[GBTClassificationModel].getNumTrees)
    assert(trees.exists(_ < 60),
      s"expected at least one ensemble to stop before maxIter, got ${trees.toSeq}")
    val f1Es = f1Of(model.transform(test.drop("id")))
    val f1Full = f1Of(new Training.GradientBoostedBackend(
      maxIter = 60, maxDepth = 5, validationFraction = 0.0)
      .fitPredict(train.drop("id"), test.drop("id")))
    assert(f1Es >= f1Full - 0.02,
      s"early stopping F1 $f1Es fell below full-run F1 $f1Full")
  }

  test("binary AUC on a separable score is ~1, on a constant score ~0.5") {
    val scored = (1 to 200).map(i => (if (i % 2 == 0) 1.0 else 0.0, (1 - i % 2) * 0.8 + 0.1))
      .toDF("y", "score")
    assert(Training.binaryAuc(scored, "y", "score") > 0.99)
    val flat = (1 to 200).map(i => (if (i % 2 == 0) 1.0 else 0.0, 0.5))
      .toDF("y", "score")
    val aucFlat = Training.binaryAuc(flat, "y", "score")
    assert(math.abs(aucFlat - 0.5) < 0.05)
  }

  test("selectBest picks argmax F1 with name tie-break") {
    assert(Training.selectBest(Seq("lgbm" -> 0.91, "cb" -> 0.86)) == ("lgbm" -> 0.91))
    assert(Training.selectBest(Seq("a" -> 0.9, "b" -> 0.9)) == ("b" -> 0.9))
  }

  test("compatOneHot matches reference per-batch OHE semantics") {
    val df = Seq("RENT", "RENT", "RENT", "OWN", "OWN", "MORTGAGE")
      .toDF("home_ownership")
    val out = Training.compatOneHot(df, "home_ownership")
    // frequency order: RENT(idx0), OWN(idx1), MORTGAGE(idx2)
    val cols = out.columns.filter(_.startsWith("home_ownership_ohe_"))
    assert(cols.sorted.toSeq == Seq("home_ownership_ohe_0", "home_ownership_ohe_1", "home_ownership_ohe_2"))
    val rent = out.filter($"home_ownership" === "RENT")
      .select("home_ownership_ohe_0").distinct().as[Int].collect()
    assert(rent.toSeq == Seq(1))
    // dropLast=false: exactly one 1 per row
    val ones = out.select(cols.map(col).reduce(_ + _).as("s")).as[Int].collect()
    assert(ones.forall(_ == 1))
  }
}
