package graft.pipeline

import graft.SparkSpec
import graft.sources.Sources
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end weekly lifecycle (SURVEY §3.1): four weeks of loan data
  * arrive, the ordered runner processes each exactly once, each week's
  * silver/gold stores land as week partitions, and the per-week label
  * stores union back to the full corpus.
  */
class WeeklyLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("ordered weekly runs build per-week stores exactly once") {
    val root = Files.createTempDirectory("lifecycle").toString
    val raw = FixtureGen.table(spark, Schemas.loanTermsRaw, 300).cache()
    val weeks = raw.select(date_format($"snapshot_date", "yyyy-MM-dd"))
      .distinct().as[String].collect().sorted.toSeq
    assert(weeks.size == 4)

    val ledger = scala.collection.mutable.Set[String]()
    val done = EventStream.runWeeklyOrdered(weeks, ledger) { w =>
      val weekDf = Bronze.weekFilter(raw, w)
      val silver = Silver.loanTerms(weekDf)
      Sources.writeParquet(Gold.labelStore(silver),
        s"$root/label_store_week_${w.replace('-', '_')}")
    }
    assert(done == weeks)

    // re-run: ledger makes it a no-op (exactly-once)
    assert(EventStream.runWeeklyOrdered(weeks, ledger)(_ => fail()).isEmpty)

    // the catalog sees all four partitions; their union equals the
    // all-at-once label store
    val parts = Sources.listPartitions(spark, root, "label_store_week_")
    assert(parts.size == 4)
    val unioned = Sources.parquet(spark, parts.map(p => s"$root/$p"): _*)
    val direct = Gold.labelStore(Silver.loanTerms(raw))
    assert(unioned.count() == direct.count())
    assert(unioned.except(direct).count() == 0)
  }

  test("SQL interface answers the same query as the DataFrame API") {
    graft.core.Tables.lineitem(spark, sf).createOrReplaceTempView("li")
    val sqlOut = spark.sql(
      """SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty
        |FROM li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    val dfOut = graft.core.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"))
      .orderBy("l_returnflag")
    assert(sqlOut.collect().toSeq == dfOut.collect().toSeq)
  }
}
