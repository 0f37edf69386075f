package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's metrics-store analytics (query_model_performance.py)
  * over a model_performance_metrics-shaped DataFrame
  * (FIXTURES.md §6 DDL): per-model summary, recent-weeks comparison,
  * best-model-per-week.
  */
object Analytics {

  /** A6 — per-model summary (query_model_performance.py:29–43). */
  def modelSummary(metrics: DataFrame): DataFrame =
    metrics.groupBy("model_name")
      .agg(
        count(lit(1)).as("total_evaluations"),
        round(avg("accuracy"), 6).as("avg_accuracy"),
        round(avg("macro_f1"), 6).as("avg_macro_f1"),
        round(min("macro_f1"), 6).as("min_macro_f1"),
        round(max("macro_f1"), 6).as("max_macro_f1"),
        round(stddev("macro_f1"), 6).as("std_macro_f1"),
        sum("total_samples").as("total_predictions"))
      .orderBy(desc("avg_macro_f1"), asc("model_name"))

  /** W2 — metrics restricted to the N most recent weeks
    * (query_model_performance.py:96–103): IN-subquery as a broadcast
    * semi-join against distinct-orderBy-limit. */
  def recentWeeks(metrics: DataFrame, n: Int): DataFrame = {
    val recent = metrics.select("week_date").distinct()
      .orderBy(desc("week_date")).limit(n)
    metrics.join(broadcast(recent), Seq("week_date"), "left_semi")
      .groupBy("week_date", "model_name")
      .agg(round(avg("macro_f1"), 6).as("avg_macro_f1"))
      .orderBy("week_date", "model_name")
  }

  /** W1 — best model per week (query_model_performance.py:147–166). */
  def bestModelPerWeek(metrics: DataFrame): DataFrame = {
    val w = Window.partitionBy("week_date")
      .orderBy(desc("macro_f1"), asc("model_name"))
    metrics.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("week_date", "model_name", "macro_f1")
      .orderBy("week_date")
  }

  /** O3 — latest evaluation for a week (dag_functions.py:392–401). */
  def latestForWeek(metrics: DataFrame, week: String): DataFrame =
    metrics.filter(col("week_date") === week)
      .orderBy(desc("evaluation_date"), asc("model_name")).limit(1)

  /** Per-period distinct-count SKETCHES (DataSketches HLL): the
    * 100 TB-incremental pattern for "distinct users per week / overall".
    * Each period keeps a mergeable fixed-size sketch; totals over any
    * period range are a sketch UNION — no rescan of history, no exact
    * distinct shuffle over the full corpus. Returns
    * (periodCol, n_distinct_approx, sketch). */
  def distinctSketchByPeriod(df: DataFrame, periodCol: String,
                             keyCol: String): DataFrame =
    df.groupBy(periodCol)
      .agg(hll_sketch_agg(col(keyCol)).as("sketch"))
      .select(col(periodCol),
        hll_sketch_estimate(col("sketch")).cast("long").as("n_distinct_approx"),
        col("sketch"))

  /** Union of period sketches → overall approximate distinct count
    * (0 for an empty sketch set — the union aggregate yields null). */
  def distinctSketchTotal(sketches: DataFrame): Long =
    sketches.agg(
        coalesce(hll_sketch_estimate(hll_union_agg(col("sketch")))
          .cast("long"), lit(0L)))
      .head().getLong(0)
}

/** M9 — classification metrics computed distributed: the confusion
  * matrix is ONE groupBy over (label, prediction); every F1-family
  * number derives from that tiny matrix on the driver. No per-class
  * jobs, no collect of predictions (the reference collects all
  * predictions into sklearn, model_inference_utils.py:71–94).
  */
object Classification {

  /** Confusion counts: (label, prediction, n). */
  def confusion(pred: DataFrame, labelCol: String, predCol: String): DataFrame =
    pred.groupBy(col(labelCol).as("label"), col(predCol).as("prediction"))
      .agg(count(lit(1)).as("n"))

  case class ClassMetrics(cls: String, precision: Double, recall: Double, f1: Double)
  case class Summary(accuracy: Double, macroF1: Double, weightedF1: Double,
                     perClass: Seq[ClassMetrics], total: Long)

  /** One metrics-store row (model_performance_metrics shape,
    * model_inference_utils.py:103–118): the flat scalars plus the two
    * JSONB-shaped columns — per-grade F1 and the predicted-grade
    * distribution — as MapType columns (SURVEY §1.1 maps JSONB to
    * `MapType(String, Double/Long)`). `predDist` is the per-prediction
    * count, i.e. the column sums of the confusion matrix. */
  def metricsRow(spark: SparkSession, weekDate: String, modelName: String,
                 evaluationDate: String, summary: Summary,
                 predDist: Map[String, Long]): DataFrame = {
    import spark.implicits._
    Seq((weekDate, modelName, evaluationDate, summary.accuracy,
      summary.macroF1, summary.weightedF1, summary.total,
      summary.perClass.map(c => c.cls -> c.f1).toMap, predDist))
      .toDF("week_date", "model_name", "evaluation_date", "accuracy",
        "macro_f1", "weighted_f1", "total_samples", "f1_by_grade",
        "predictions_distribution")
  }

  /** Full metric family from the confusion counts. `classes` fixes the
    * class set (absent classes score 0) — the persisted grade_mapping
    * semantics (SURVEY §7.4 sklearn-parity note). */
  def summarize(confusion: DataFrame, classes: Seq[String]): Summary = {
    val m = confusion.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val total = m.values.sum
    // accuracy counts EVERY correct prediction, including labels outside
    // `classes` (sklearn accuracy_score has no labels restriction); only
    // the F1 family is scoped to the persisted class set
    val correct = m.collect { case ((l, p), n) if l == p => n }.sum
    val per = classes.map { c =>
      val tp = m.getOrElse((c, c), 0L).toDouble
      val fp = m.collect { case ((l, p), n) if p == c && l != c => n }.sum.toDouble
      val fn = m.collect { case ((l, p), n) if l == c && p != c => n }.sum.toDouble
      val prec = if (tp + fp == 0) 0.0 else tp / (tp + fp)
      val rec = if (tp + fn == 0) 0.0 else tp / (tp + fn)
      val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
      ClassMetrics(c, prec, rec, f1)
    }
    val support = classes.map(c =>
      c -> m.collect { case ((l, _), n) if l == c => n }.sum.toDouble).toMap
    // sklearn f1_score(labels=classes, average='weighted') normalizes by
    // the support of the GIVEN labels, not the batch total
    val supportSum = support.values.sum
    val weighted =
      if (supportSum == 0) 0.0
      else per.map(p => p.f1 * support(p.cls)).sum / supportSum
    Summary(
      accuracy = if (total == 0) 0.0 else correct.toDouble / total,
      macroF1 = per.map(_.f1).sum / classes.size,
      weightedF1 = weighted,
      perClass = per,
      total = total)
  }

  /** Per-class precision/recall/F1 fully DISTRIBUTED from the confusion
    * counts — the scale shape for metric families too wide for
    * `summarize`'s driver-side matrix (fine at 7 grades, wrong at 10⁵
    * labels): three reductions of (label, prediction, n) joined back on
    * the class, no collect anywhere. Classes = labels ∪ predictions;
    * precision/recall are 0 where undefined (sklearn zero_division=0).
    * Output: (cls, precision, recall, f1, support), metrics at 6 dp. */
  def perClassMetrics(confusion: DataFrame): DataFrame = {
    // four reductions read the confusion table — persist it (≤ |classes|²
    // rows) so the upstream prediction scan runs ONCE, not four times.
    // Keyed by logical plan, so repeated runs reuse one copy; long-lived
    // sessions can spark.catalog.clearCache() (same policy as the dedup
    // operators' shingle projections).
    val conf = confusion.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val classes = conf.select(col("label").as("cls"))
      .union(conf.select(col("prediction").as("cls"))).distinct()
    val tp = conf.filter(col("label") === col("prediction"))
      .select(col("label").as("cls"), col("n").as("tp"))
    val byLabel = conf.groupBy(col("label").as("cls"))
      .agg(sum("n").as("support"))
    val byPred = conf.groupBy(col("prediction").as("cls"))
      .agg(sum("n").as("pred_n"))
    val p = when(col("pred_n") === 0, 0.0).otherwise(col("tp") / col("pred_n"))
    val r = when(col("support") === 0, 0.0).otherwise(col("tp") / col("support"))
    classes
      .join(tp, Seq("cls"), "left")
      .join(byLabel, Seq("cls"), "left")
      .join(byPred, Seq("cls"), "left")
      .na.fill(0L, Seq("tp", "support", "pred_n"))
      .withColumn("_p", p).withColumn("_r", r)
      .select(col("cls"),
        round(col("_p"), 6).as("precision"),
        round(col("_r"), 6).as("recall"),
        // f1 from the UNROUNDED ratios (ratios of exact integer counts are
        // bit-identical across engines; rounding first would not be)
        round(when(col("_p") + col("_r") === 0.0, 0.0)
          .otherwise(lit(2.0) * col("_p") * col("_r") / (col("_p") + col("_r"))), 6)
          .as("f1"),
        col("support"))
  }

  /** Retrieval evaluation — recall@k, MRR, nDCG@k per query: the
    * standard IR metrics every ANN/RAG stack is judged by (the
    * evaluation leg the similarity operators feed). `results` is any
    * ranked frame (qCol, nCol, rankCol) — bruteForceTopK / ivfTopK /
    * pqTopKReranked emit exactly this shape; `qrels` is the binary
    * relevance set (qCol, nCol).
    *
    * Per query: recall@k = |retrieved∩relevant| / |relevant|;
    * MRR = 1/rank of the first relevant hit (0 when none);
    * nDCG@k = Σ_hits 1/log2(rank+1) over the ideal Σ_{i≤min(|rel|,k)}
    * 1/log2(i+1). A query with an empty relevance set scores 0 across
    * the board (emitted, not dropped — silent drops would inflate
    * macro averages). All three rounded to 6 dp; inputs to the ratios
    * stay unrounded (the m9 discipline).
    *
    * Scale shape: results is queries×k rows — the tiny side — so the
    * relevance join broadcasts it; per-query state is ≤ k rows and the
    * IDCG is a closed-form fold over ≤ k terms. Nothing here touches
    * the corpus. */
  def retrievalMetrics(results: DataFrame, qrels: DataFrame, k: Int,
                       qCol: String = "q_id", nCol: String = "n_id",
                       rankCol: String = "rank"): DataFrame = {
    val res = results.filter(col(rankCol) <= k)
      .select(col(qCol).as("_q"), col(nCol).as("_n"),
        col(rankCol).cast("long").as("_r"))
    // distinct: a duplicated qrel row would otherwise fan out the left
    // join and inflate hits/DCG — qrels are a set, enforce it
    val rel = qrels.select(col(qCol).as("_q"), col(nCol).as("_n"))
      .distinct().withColumn("_rel", lit(1L))
    val nRel = rel.groupBy("_q").agg(count(lit(1)).as("n_rel"))
    val perQ = res.join(rel, Seq("_q", "_n"), "left")
      .withColumn("_hit", coalesce(col("_rel"), lit(0L)))
      .groupBy("_q")
      .agg(sum(col("_hit")).as("hits"),
        // max(1/r over hits) = 1/min(hit rank) — the reciprocal rank
        coalesce(max(when(col("_hit") === 1L, lit(1.0) / col("_r"))),
          lit(0.0)).as("_mrr"),
        sum(when(col("_hit") === 1L, lit(1.0) / log2(col("_r") + 1))
          .otherwise(lit(0.0))).as("_dcg"))
    val withRel = perQ.join(nRel, Seq("_q"), "left")
      .na.fill(0L, Seq("n_rel"))
    // IDCG over min(n_rel, k) ideal hits; sequence needs a ≥1 bound on
    // the n_rel=0 branch (guarded to 0 output below)
    val idcg = aggregate(
      transform(sequence(lit(1L),
        greatest(least(col("n_rel"), lit(k.toLong)), lit(1L))),
        i => lit(1.0) / log2(i.cast("double") + 1.0)),
      lit(0.0), (acc, x) => acc + x)
    withRel.select(col("_q").as(qCol), col("n_rel"), col("hits"),
      round(when(col("n_rel") > 0, col("hits").cast("double") / col("n_rel"))
        .otherwise(0.0), 6).as("recall_at_k"),
      round(col("_mrr"), 6).as("mrr"),
      round(when(col("n_rel") > 0, col("_dcg") / idcg).otherwise(0.0), 6)
        .as("ndcg_at_k"))
  }
}
