package graft.sources

import graft.SparkSpec
import graft.metrics.Analytics
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S7/S8 executed against a real JDBC engine: embedded Derby (in-process,
  * ships with Spark for the Hive metastore — no network, no server).
  * Mirrors the reference's weekly metrics round-trip: append per week,
  * read back, latest-evaluation-for-week query
  * (model_inference_utils.py:103–136; dag_functions.py:392–401).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  test("JDBC metrics store round-trips through embedded Derby (S7/S8)") {
    System.setProperty("derby.stream.error.file",
      Files.createTempDirectory("derbylog").toString + "/derby.log")
    val dir = Files.createTempDirectory("derby").toString
    val url = s"jdbc:derby:$dir/metricsdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    // Derby would map StringType to CLOB (not comparable, not filterable)
    props.setProperty("createTableColumnTypes",
      "week_date VARCHAR(10), model_name VARCHAR(64), evaluation_date VARCHAR(19)")
    val store = new JdbcMetricsStore(url, "model_performance_metrics", props)

    def week(wk: String, model: String, f1: Double, evalTs: String) =
      Seq((wk, model, f1, 0.93, 1000L, evalTs)).toDF(
        "week_date", "model_name", "macro_f1", "accuracy", "total_samples",
        "evaluation_date")

    store.append(week("2024-01-07", "lgbm", 0.91, "2024-01-07 06:15:00"))
    store.append(week("2024-01-07", "catboost", 0.86, "2024-01-07 06:20:00"))
    store.append(week("2024-01-14", "lgbm", 0.89, "2024-01-14 06:15:00"))

    val back = store.read(spark)
    assert(back.count() == 3)
    assert(back.schema.fieldNames.toSet.contains("macro_f1"))

    // S8 shape: latest evaluation for a week, through the JDBC scan
    val latest = Analytics.latestForWeek(back, "2024-01-07")
      .select("model_name", "macro_f1").as[(String, Double)].collect()
    assert(latest.toSeq == Seq(("catboost", 0.86)))

    // the equality predicate reaches the JDBC source as a pushed filter
    val filtered = back.filter(col("week_date") === "2024-01-14")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("week_date"),
      s"expected week_date filter pushed to JDBC:\n$scan")
    assert(filtered.count() == 1)

    // appends accumulate (reference appends one row per weekly eval)
    store.append(week("2024-01-21", "lgbm", 0.88, "2024-01-21 06:15:00"))
    assert(store.read(spark).count() == 4)
  }

  test("map metrics columns round-trip through Derby as JSON strings") {
    import org.apache.spark.sql.types.{DoubleType, LongType, MapType, StringType}
    import graft.metrics.Classification
    val dir = Files.createTempDirectory("derbymap").toString
    val url = s"jdbc:derby:$dir/metricsdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    props.setProperty("createTableColumnTypes",
      "week_date VARCHAR(10), model_name VARCHAR(64), " +
        "evaluation_date VARCHAR(19), f1_by_grade VARCHAR(512), " +
        "predictions_distribution VARCHAR(512)")
    val store = new JdbcMetricsStore(url, "model_performance_metrics", props)

    // the reference's JSONB columns, built from a real confusion matrix
    val conf = Classification.confusion(
      Seq(("A", "A"), ("A", "B"), ("B", "B"), ("B", "B"), ("C", "C"))
        .toDF("grade", "pred"), "grade", "pred")
    val summary = Classification.summarize(conf, Seq("A", "B", "C"))
    val predDist = conf.groupBy("prediction").agg(sum("n").as("n"))
      .as[(String, Long)].collect().toMap
    store.append(Classification.metricsRow(spark, "2024-01-07", "lgbm",
      "2024-01-07 06:15:00", summary, predDist))

    val back = store.read(spark, Map(
      "f1_by_grade" -> MapType(StringType, DoubleType),
      "predictions_distribution" -> MapType(StringType, LongType)))
    assert(back.schema("f1_by_grade").dataType ===
      MapType(StringType, DoubleType))
    val row = back.select(
        col("f1_by_grade"), col("predictions_distribution"),
        element_at(col("f1_by_grade"), "B").as("f1_b"))
      .as[(Map[String, Double], Map[String, Long], Double)].head()
    assert(row._1 == summary.perClass.map(c => c.cls -> c.f1).toMap)
    assert(row._2 == predDist)
    assert(row._3 == summary.perClass.find(_.cls == "B").get.f1)
  }

  test("S7/S8 against real Postgres — asserted environment skip") {
    // The reference's metrics store is Postgres JSONB
    // (model_inference_utils.py:103–136); the Derby twins above carry
    // the engine-side S7/S8 semantics. A REAL Postgres round-trip is
    // environmentally impossible here, and this test pins exactly why:
    // the container ships postgres 15 server binaries
    // (/usr/local/bin/{postgres,pg_ctl,initdb}) but NO org.postgresql
    // JDBC driver jar exists in /opt/spark/jars or the offline coursier
    // cache, the build runs with zero egress (COURSIER_MODE=offline),
    // and Spark's JDBC source cannot open a Postgres socket without the
    // driver class. The skip ACTIVATES the moment a driver lands on the
    // classpath: this test then fails loudly, demanding the real
    // round-trip be implemented against the container's binaries.
    val driverPresent =
      try { Class.forName("org.postgresql.Driver"); true }
      catch { case _: ClassNotFoundException => false }
    assume(driverPresent,
      "org.postgresql.Driver absent — zero-egress container, no driver " +
        "jar in /opt/spark/jars or the offline coursier cache; Derby " +
        "twins cover S7/S8 engine semantics")
    fail("org.postgresql.Driver is now on the classpath — implement the " +
      "real-Postgres S7/S8 round-trip (initdb + pg_ctl + JDBC) here")
  }
}
