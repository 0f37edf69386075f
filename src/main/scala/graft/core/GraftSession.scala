package graft.core

import org.apache.spark.sql.SparkSession

/** Canonical session builder: the engine's recommended configuration,
  * sized for local[N] testing but expressing the knobs that matter on a
  * real cluster.
  */
object GraftSession {

  /** @param cores        local parallelism (executor count × cores on a cluster)
    * @param shufflePartitions match total cores locally; on a cluster size
    *                     so each shuffle partition lands well under
    *                     executor memory (≈128–200 MB of data per task)
    */
  def build(appName: String = "graft",
            cores: Int = 32,
            shufflePartitions: Int = 32): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // AQE: runtime coalescing, skew-join splitting, plan re-optimization
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime bloom-filter injection: a selective filter on one join
      // side plants a bloom filter on the other side's key, killing most
      // probe rows BEFORE the shuffle. ON by default in Spark ≥3.4 —
      // pinned here explicitly because the engine's join-pruning story
      // depends on it (injection is additionally gated by size
      // thresholds sized for real tables; see PlanShapeSpec)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // scan partition sizing: default 128m; keep explicit — it is the
      // other half of the memory-per-task contract
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
