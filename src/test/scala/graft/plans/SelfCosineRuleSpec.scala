package graft.plans

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SelfCosineRuleSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim(x, x) folds to 1.0 via the optimizer rule") {
    // the shared test session wasn't built with the extensions config, so
    // inject the rule the way spark.sql.extensions would
    GraftFunctions.register(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SelfCosineRule
    try {
      val e = Tables.embeddings(spark, sf).limit(50)
      val q = e.select(GraftFunctions.cosineSim($"embedding", $"embedding").as("c"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cosine_sim"),
        s"self-cosine should be folded away:\n$optimized")
      assert(q.as[Double].collect().forall(v => v == 1.0))
      // non-self cosine is untouched
      val q2 = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id").limit(10)
        .select(GraftFunctions.cosineSim($"a.embedding", $"b.embedding").as("c"))
      assert(q2.queryExecution.optimizedPlan.toString.contains("cosine_sim"))
      // the rewrite must preserve the kernel's NaN on zero vectors —
      // an optimizer rule may not change results
      val zeros = Seq(Array(0.0f, 0.0f), Array(1.0f, 0.0f)).toDF("v")
      val out = zeros.select(GraftFunctions.cosineSim($"v", $"v").as("c"))
        .as[Double].collect()
      assert(out(0).isNaN && out(1) == 1.0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SelfCosineRule)
    }
  }
}
