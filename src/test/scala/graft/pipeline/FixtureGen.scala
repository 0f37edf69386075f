package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic fixture generator for the four raw source tables
  * (FIXTURES.md shapes): every imputed/flagged column gets planted nulls,
  * keys align across tables so the store joins produce rows.
  */
object FixtureGen {

  private def genericValue(f: StructField, id: Column, i: Int): Column = {
    val base = f.dataType match {
      case IntegerType => ((id * 7 + i) % 20).cast("int")
      case FloatType   => (((id * 13 + i) % 300) / 7.0).cast("float")
      case DateType    => date_add(to_date(lit("2023-01-01")), ((id + i) % 28).cast("int"))
      case _           => concat(lit(s"v${i}_"), (id % 9).cast("string"))
    }
    // plant nulls on a deterministic lattice (never on key columns)
    if (Set("member_id", "snapshot_date", "id")(f.name)) base
    else when((id + i) % 11 === 0, lit(null)).otherwise(base)
  }

  private val special: Map[String, Column => Column] = Map(
    // one row per (member_id, snapshot_date) per source — the reference's
    // snapshot-table cardinality (75 members x 4 weekly snapshots)
    "member_id" -> (id => concat(lit("m"), (id % 75).cast("string"))),
    "id" -> (id => concat(lit("loan"), id.cast("string"))),
    "snapshot_date" -> (id =>
      date_add(to_date(lit("2023-01-01")),
        (((id / 75).cast("long") % 4) * 7).cast("int"))),
    "earliest_cr_line" -> (id =>
      when(id % 11 === 3, lit(null)).otherwise(
        concat(element_at(array(Seq("Jan", "Mar", "Aug", "Nov").map(lit): _*),
          (id % 4 + 1).cast("int")), lit("-"), (lit(1999) + id % 20).cast("string")))),
    "emp_length" -> (id =>
      element_at(array(Seq("10+ years", "< 1 year", "3 years", "7 years", "missing")
        .map(lit) :+ lit(null).cast("string"): _*), (id % 6 + 1).cast("int"))),
    "emp_title" -> (id =>
      when(id % 7 === 0, lit(null)).otherwise(
        concat(lit("title"), (id % 15).cast("string")))),
    "home_ownership" -> (id =>
      element_at(array((Schemas.homeOwnershipCats.take(5).map(lit) :+
        lit(null).cast("string")): _*), (id % 6 + 1).cast("int"))),
    "verification_status" -> (id =>
      element_at(array(Schemas.verificationStatusCats.map(lit): _*), (id % 3 + 1).cast("int"))),
    "application_type" -> (id =>
      element_at(array(Schemas.applicationTypeCats.map(lit): _*), (id % 2 + 1).cast("int"))),
    "addr_state" -> (id =>
      element_at(array(Seq("CA", "NY", "TX", "WA").map(lit): _*), (id % 4 + 1).cast("int"))),
    "term" -> (id =>
      element_at(array(lit("36 months"), lit("60 months")), (id % 2 + 1).cast("int"))),
    "grade" -> (id =>
      when(id % 13 === 5, lit(null)).otherwise(
        element_at(array("ABCDEFG".map(c => lit(c.toString)): _*), (id % 7 + 1).cast("int")))),
    "pymnt_plan" -> (id => element_at(array(lit("y"), lit("n")), (id % 2 + 1).cast("int"))),
    "debt_settlement_flag" -> (id => element_at(array(lit("Y"), lit("N")), (id % 2 + 1).cast("int"))),
    "initial_list_status" -> (id => element_at(array(lit("w"), lit("f")), (id % 2 + 1).cast("int"))),
    "disbursement_method" -> (id => element_at(array(lit("Cash"), lit("DirectPay")), (id % 2 + 1).cast("int"))),
    "purpose" -> (id =>
      element_at(array(Seq("car", "house", "debt", "other").map(lit): _*), (id % 4 + 1).cast("int"))),
    "loan_status" -> (id =>
      element_at(array(Seq("Current", "Fully Paid", "Charged Off").map(lit): _*), (id % 3 + 1).cast("int"))))

  def table(spark: SparkSession, schema: StructType, n: Int): DataFrame = {
    val base = spark.range(n.toLong).toDF("row_id")
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      special.get(f.name)
        .map(g => g(col("row_id")).cast(f.dataType).as(f.name))
        .getOrElse(genericValue(f, col("row_id"), i).cast(f.dataType).as(f.name))
    }
    base.select(cols: _*)
  }
}
