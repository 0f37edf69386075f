package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Distributed per-group ranking — the TeraSort idiom applied to
  * `row_number().over(Window.partitionBy(g).orderBy(o))`.
  *
  * The plain window is a SCALE-KILLER on skewed group columns: Spark
  * hash-partitions on the group key, so every row of the dominant
  * group lands in ONE task and is sorted by ONE thread. A real crawl
  * is ~45% one language (CCNet shards per language for exactly this
  * reason — Wenzek et al. 2019 §3), so at 100 TB the English
  * partition is billions of rows in a single sort.
  *
  * This primitive computes the SAME rank (and optional running sum)
  * with no per-group single-partition sort:
  *
  *   1. `repartitionByRange` on (group, orderKeys…) — each range
  *      partition holds ≤ ~N/parts rows regardless of group skew;
  *      the frame is `localCheckpoint`ed so the sampled range
  *      boundaries are pinned (the counts job and the main job MUST
  *      observe one partitioning — a re-sampled exchange between the
  *      two jobs would mis-align every offset).
  *   2. per-(partition, group) counts/sums → a bounded driver
  *      collect: range partitioning on (group, …) makes each group a
  *      CONTIGUOUS partition span, so there are at most
  *      parts + groups − 1 rows (the modes convention).
  *   3. running offsets per group in partition order, broadcast back
  *      and joined on (partition id, group) — null-safe on the group
  *      so a NULL group ranks exactly as the window would rank it.
  *   4. a partition-LOCAL window over (partition id, group): every
  *      window group is bounded by the range-partition size, never by
  *      the group's row count. rank = local row_number + offset;
  *      running sum = local sum + offset sum.
  *
  * The result is semantically IDENTICAL to the global window whenever
  * (group, orderKeys…) is a total order (callers tie-break on a
  * unique id), so oracle gates over the windowed rank are unchanged to
  * the bit. Cost: one extra skinny-row exchange (the hash shuffle feeding
  * the local window) plus the checkpoint materialization — the price
  * of surviving a 90%-one-group corpus.
  */
object DistributedRank {

  /** Attach `_rk` (1-based rank within `partCol` under `orderCols`),
    * `_n` (group row count), and — when `sumCol` is set — `_cum`
    * (running inclusive sum of the LongType column `sumCol`) to `df`.
    * `orderCols` with the caller's unique-id tie-break must be a
    * total order within each group.
    *
    * Contracts: `sumCol` values must be NON-NULL (a NULL inside a
    * group that spans range partitions would make the local window
    * sum NULL while the plain window skips it — guard with coalesce
    * at the call site); column names `_pid`/`_opid`/`_okey`/`_rkoff`/
    * `_cumoff`/`_rk`/`_cum`/`_n` are reserved by this primitive. */
  def withRankAndCumsum(df: DataFrame, partCol: String,
                        orderCols: Seq[Column],
                        sumCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val np = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = df
      .repartitionByRange(np, (col(partCol) +: orderCols): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // pin the sampled range boundaries

    // bounded by construction: ≤ np + #groups − 1 rows (contiguity)
    val sumAgg = sumCol.map(c => sum(col(c)).as("_s"))
      .getOrElse(lit(0L).as("_s"))
    val perPart = ranged.groupBy(col("_pid"), col(partCol))
      .agg(count(lit(1)).as("_c"), sumAgg)
      .collect()

    // running offsets per group value, in partition (= range) order
    val byKey = perPart.groupBy(r => Option(r.get(1)))
    val offRows = byKey.iterator.flatMap { case (_, rows) =>
      var rkOff = 0L
      var cumOff = 0L
      var nTot = 0L
      rows.foreach(r => nTot += r.getLong(2))
      rows.sortBy(_.getInt(0)).map { r =>
        val out = Row(r.getInt(0), r.get(1), rkOff, cumOff, nTot)
        rkOff += r.getLong(2)
        cumOff += (if (r.isNullAt(3)) 0L else r.getLong(3))
        out
      }
    }.toSeq
    val keyField = df.schema(partCol)
    val offSchema = StructType(Seq(
      StructField("_opid", IntegerType, nullable = false),
      StructField("_okey", keyField.dataType, nullable = true),
      StructField("_rkoff", LongType, nullable = false),
      StructField("_cumoff", LongType, nullable = false),
      StructField("_n", LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)

    // partition-LOCAL window: groups bounded by range-partition size
    val lw = Window.partitionBy(col("_pid"), col(partCol))
      .orderBy(orderCols: _*)
    val joined = ranged.join(broadcast(offDf),
      ranged("_pid") === offDf("_opid") &&
        ranged(partCol) <=> offDf("_okey"), "left")
    val withRank = joined
      .withColumn("_rk",
        row_number().over(lw).cast("long") + col("_rkoff"))
    val withCum = sumCol match {
      case Some(c) => withRank.withColumn("_cum",
        sum(col(c)).over(
          lw.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          + col("_cumoff"))
      case None => withRank
    }
    withCum.drop("_opid", "_okey", "_rkoff", "_cumoff", "_pid")
  }
}
