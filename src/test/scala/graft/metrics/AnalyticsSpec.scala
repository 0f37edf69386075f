package graft.metrics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // FIXTURES.md §6: >=3 models x >=10 weeks, one (model, week) pair
  // evaluated twice
  private lazy val metrics = {
    val rows = for {
      w <- 1 to 10; m <- Seq("lgbm", "catboost", "rf")
      rep <- if (w == 1 && m == "lgbm") Seq(0, 1) else Seq(0)
    } yield (f"2024_01_$w%02d", m, s"run_${m}_${w}_$rep",
      0.8 + (w % 3) * 0.01, 0.85 + ((w * 7 + m.length) % 10) / 100.0,
      0.86, 1000L + w, s"2024-01-${w}T0$rep:00:00")
    rows.toDF("week_date", "model_name", "mlflow_run_id", "accuracy",
      "macro_f1", "weighted_f1", "total_samples", "evaluation_date")
  }

  test("modelSummary aggregates per model, ordered by avg F1") {
    val out = Analytics.modelSummary(metrics).collect()
    assert(out.length == 3)
    val avgs = out.map(_.getAs[Double]("avg_macro_f1"))
    assert(avgs.zip(avgs.tail).forall { case (a, b) => a >= b })
    assert(out.map(_.getAs[Long]("total_evaluations")).sum == 31)
  }

  test("recentWeeks keeps only the N latest weeks") {
    val out = Analytics.recentWeeks(metrics, 3)
    val weeks = out.select("week_date").distinct().as[String].collect().toSet
    assert(weeks == Set("2024_01_08", "2024_01_09", "2024_01_10"))
  }

  test("bestModelPerWeek returns one winner per week with max F1") {
    val out = Analytics.bestModelPerWeek(metrics)
    assert(out.count() == 10)
    val joined = out.as("b").join(metrics.as("m"), Seq("week_date"))
      .groupBy("week_date")
      .agg(max($"m.macro_f1").as("mx"), first($"b.macro_f1").as("won"))
      .filter($"mx" =!= $"won")
    assert(joined.count() == 0)
  }

  test("latestForWeek picks the newest evaluation") {
    val out = Analytics.latestForWeek(metrics, "2024_01_01")
      .select("evaluation_date").as[String].collect()
    assert(out.toSeq == Seq("2024-01-1T01:00:00"))
  }

  test("HLL distinct sketches: per-week estimates and mergeable union") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, sf)
      .withColumn("week", date_trunc("week", col("ts")))
    val weekly = Analytics.distinctSketchByPeriod(ev, "week", "user_id")
    val exactWeekly = ev.groupBy("week")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    weekly.collect().foreach { r =>
      val est = r.getLong(1); val exact = exactWeekly(r.get(0))
      assert(math.abs(est - exact) <= math.max(2, exact * 0.05),
        s"week ${r.get(0)}: est $est vs exact $exact")
    }
    // union of weekly sketches ≈ exact overall distinct — the
    // incremental path never rescans history
    val total = Analytics.distinctSketchTotal(weekly)
    val exactTotal = ev.agg(countDistinct("user_id")).head().getLong(0)
    assert(math.abs(total - exactTotal) <= math.max(2, exactTotal * 0.05),
      s"union est $total vs exact $exactTotal")
  }

  test("accuracy counts correct predictions outside the class set (sklearn parity)") {
    val pred = Seq(("A", "A"), ("H", "H"), ("H", "H"), ("A", "B"))
      .toDF("label", "prediction")
    val s = Classification.summarize(
      Classification.confusion(pred, "label", "prediction"), Seq("A", "B"))
    assert(math.abs(s.accuracy - 3.0 / 4) < 1e-12) // H hits count
    // weighted F1 normalizes by the GIVEN labels' support (2 A rows)
    val aF1 = s.perClass.find(_.cls == "A").get.f1
    assert(math.abs(s.weightedF1 - aF1) < 1e-12)
  }

  test("classification metrics match hand-computed values") {
    // confusion: A: 3 correct, 1 as B; B: 2 correct, 1 as A; C absent
    val pred = Seq(
      ("A", "A"), ("A", "A"), ("A", "A"), ("A", "B"),
      ("B", "B"), ("B", "B"), ("B", "A")).toDF("label", "prediction")
    val s = Classification.summarize(
      Classification.confusion(pred, "label", "prediction"), Seq("A", "B", "C"))
    assert(math.abs(s.accuracy - 5.0 / 7) < 1e-12)
    val a = s.perClass.find(_.cls == "A").get
    assert(math.abs(a.precision - 0.75) < 1e-12) // 3 of 4 predicted-A
    assert(math.abs(a.recall - 0.75) < 1e-12)    // 3 of 4 true-A
    val c = s.perClass.find(_.cls == "C").get
    assert(c.f1 == 0.0) // absent class scores 0 (grade_mapping semantics)
    assert(s.macroF1 < s.weightedF1) // zero-support class drags macro down
  }

  test("perClassMetrics (distributed) agrees with summarize (driver matrix)") {
    val pred = Seq(
      ("A", "A"), ("A", "A"), ("A", "A"), ("A", "B"),
      ("B", "B"), ("B", "B"), ("B", "A"),
      ("C", "A")).toDF("label", "prediction") // C: present label, never predicted
    val conf = Classification.confusion(pred, "label", "prediction")
    val s = Classification.summarize(conf, Seq("A", "B", "C"))
    val dist = Classification.perClassMetrics(conf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    s.perClass.foreach { pc =>
      val (p, r, f1, support) = dist(pc.cls)
      assert(math.abs(p - pc.precision) < 5e-7, s"${pc.cls} precision")
      assert(math.abs(r - pc.recall) < 5e-7, s"${pc.cls} recall")
      assert(math.abs(f1 - pc.f1) < 5e-7, s"${pc.cls} f1")
      assert(support == pred.filter($"label" === pc.cls).count())
    }
    // no collect in the distributed plan's data path: output is one row
    // per class straight from the joins
    assert(dist.size == 3)
  }

  test("retrievalMetrics: hand-computed recall/MRR/nDCG, empty qrels score 0") {
    import spark.implicits._
    // q1: relevant {a,b,c}; retrieved [a, x, b] → hits 2, recall 2/3,
    // MRR 1 (first hit at rank 1), DCG 1/log2(2)+1/log2(4) = 1.5,
    // IDCG = 1 + 1/log2(3) + 1/log2(4) (3 ideal hits at k=3)
    // q2: no qrels at all → all-zero row, still emitted
    val results = Seq(
      (1L, 1, "a"), (1L, 2, "x"), (1L, 3, "b"),
      (2L, 1, "p"), (2L, 2, "q"), (2L, 3, "r")
    ).toDF("q_id", "rank", "n_id")
    val qrels = Seq((1L, "a"), (1L, "b"), (1L, "c")).toDF("q_id", "n_id")
    val out = Classification.retrievalMetrics(results, qrels, k = 3)
      .collect().map(r => r.getAs[Long]("q_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_rel") == 3L && r1.getAs[Long]("hits") == 2L)
    assert(math.abs(r1.getAs[Double]("recall_at_k") - 2.0 / 3) < 5e-7)
    assert(r1.getAs[Double]("mrr") == 1.0)
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(math.abs(r1.getAs[Double]("ndcg_at_k") - 1.5 / idcg) < 5e-7)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_rel") == 0L && r2.getAs[Long]("hits") == 0L)
    assert(r2.getAs[Double]("recall_at_k") == 0.0)
    assert(r2.getAs[Double]("mrr") == 0.0 && r2.getAs[Double]("ndcg_at_k") == 0.0)
  }
}
