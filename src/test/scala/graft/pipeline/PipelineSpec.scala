package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rawCredit = FixtureGen.table(spark, Schemas.creditHistoryRaw, 300).cache()
  private lazy val rawDemo = FixtureGen.table(spark, Schemas.demographicRaw, 300).cache()
  private lazy val rawFin = FixtureGen.table(spark, Schemas.financialRaw, 300).cache()
  private lazy val rawLoan = FixtureGen.table(spark, Schemas.loanTermsRaw, 300).cache()

  test("silver credit history: drops, flags, parses, imputes") {
    val out = Silver.creditHistory(rawCredit)
    Schemas.creditDropped.foreach(c => assert(!out.columns.contains(c)))
    // imputed sets contain no nulls (FIXTURES §7)
    (Schemas.creditModeImputed ++ Schemas.creditFillMinus1 ++
      Seq("mort_acc", "months_since_earliest_cr_line")).foreach { c =>
      assert(out.filter(col(c).isNull).count() == 0, s"nulls left in $c")
    }
    // flag equals isNull of pre-imputation mort_acc
    val mism = out.select("mort_acc_missing").as[Int].collect().sum
    val rawNulls = rawCredit.filter($"mort_acc".isNull).count()
    assert(mism == rawNulls)
    // parsed date type
    assert(out.schema("earliest_cr_line").dataType.typeName == "date")
  }

  test("silver credit history survives malformed date strings (ANSI mode)") {
    val bad = rawCredit.withColumn("earliest_cr_line",
      when($"member_id" === "m1", lit("Unknown")).otherwise($"earliest_cr_line"))
    val out = Silver.creditHistory(bad)
    // malformed -> null parse -> 999 fill, NOT a CANNOT_PARSE crash
    assert(out.filter($"member_id" === "m1" &&
      $"months_since_earliest_cr_line" === 999.0).count() > 0)
  }

  test("silver demographic: normalize + MISSING fills") {
    val out = Silver.demographic(rawDemo)
    assert(out.filter($"emp_title".isNull || $"emp_length".isNull ||
      $"home_ownership".isNull).count() == 0)
    assert(out.filter($"emp_title" =!= upper($"emp_title")).count() == 0)
    assert(out.filter($"emp_title" === "MISSING").count() > 0)
  }

  test("silver financial: flags match pre-impute nulls; fills applied") {
    val out = Silver.financial(rawFin)
    assert(out.filter($"dti".isNull).count() == 0)
    val flagged = out.filter($"all_util_missing" === 1).count()
    assert(flagged == rawFin.filter($"all_util".isNull).count())
    assert(out.filter($"all_util_missing" === 1 && $"all_util" =!= 0.0).count() == 0)
    assert(out.filter($"il_util_missing" === 1 && $"il_util" =!= -1.0).count() == 0)
    (Schemas.financialFill0 ++ Schemas.financialFillMinus1)
      .foreach(c => assert(out.filter(col(c).isNull).count() == 0, s"nulls in $c"))
  }

  test("silver loan terms: 37 drops + binary encodes") {
    val out = Silver.loanTerms(rawLoan)
    Schemas.loanDropped.foreach(c => assert(!out.columns.contains(c)))
    Seq("pymnt_plan", "debt_settlement_flag", "initial_list_status",
      "disbursement_method").foreach { c =>
      val vals = out.select(c).distinct().as[Int].collect().toSet
      assert(vals.subsetOf(Set(0, 1)), s"$c not binary: $vals")
    }
  }

  test("gold demographic: one-hot partitions, emp_length parsed") {
    val out = Gold.demographic(Silver.demographic(rawDemo), Seq("CA", "NY", "TX", "WA"))
    val empCols = out.columns.filter(_.startsWith("emp_title_ohe_"))
    assert(empCols.length == 11) // top-10 + OTHER
    val oneSum = out.select(empCols.map(c => col(c)).reduce(_ + _).as("s"))
      .as[Int].collect()
    assert(oneSum.forall(_ == 1), "emp_title OHE must partition")
    val hoCols = Schemas.homeOwnershipCats.map(c => s"home_ownership_ohe_$c")
    hoCols.foreach(c => assert(out.columns.contains(c)))
    assert(Gold.nonNumericColumns(out, Set("member_id", "snapshot_date")).isEmpty)
  }

  test("compat-mode demographic OHE partitions like the native path") {
    val silver = Silver.demographic(rawDemo)
    val compat = Gold.demographicCompat(silver)
    // per category column family: dropLast=false handleInvalid=keep OHE
    // still partitions — exactly one 1 per row per family
    Seq("home_ownership", "verification_status", "application_type").foreach { fam =>
      val cols = compat.columns.filter(_.startsWith(s"${fam}_ohe_"))
      assert(cols.nonEmpty, s"no compat OHE columns for $fam")
      val sums = compat.select(cols.map(c => col(c)).reduce(_ + _).as("s"))
        .as[Int].collect()
      assert(sums.forall(_ == 1), s"$fam compat OHE must partition")
    }
    assert(compat.count() == silver.count())
  }

  test("gold loan terms: term digits + grade bijection") {
    val out = Gold.loanTerms(Silver.loanTerms(rawLoan),
      Seq("car", "house", "debt", "other"),
      Seq("Current", "Fully Paid", "Charged Off"))
    assert(out.select("term_months").distinct().as[Int].collect().toSet == Set(36, 60))
    val pairs = out.filter($"grade".isNotNull)
      .select("grade", "grade_encoded").distinct()
      .as[(String, Int)].collect().toMap
    assert(pairs == Schemas.gradeMapping.toMap)
  }

  test("feature store + label store invariants") {
    val loanSilver = Silver.loanTerms(rawLoan)
    val gl = Gold.loanTerms(loanSilver, Seq("car", "house", "debt", "other"),
      Seq("Current", "Fully Paid", "Charged Off"))
    val gd = Gold.demographic(Silver.demographic(rawDemo), Seq("CA", "NY", "TX", "WA"))
    val gf = Gold.financial(Silver.financial(rawFin))
    val gc = Gold.creditHistory(Silver.creditHistory(rawCredit))
    val fs = Gold.featureStore(gl, gd, gf, gc)
    val ls = Gold.labelStore(loanSilver)

    assert(fs.count() <= gl.count())                 // left spine + distinct
    Seq("member_id", "snapshot_date", "grade").foreach(c =>
      assert(!fs.columns.contains(c)))
    assert(Gold.nonNumericColumns(fs, Set("id")).isEmpty, "feature store must be numeric")
    assert(ls.filter($"grade".isNull).count() == 0)
    // every feature-store id has a label
    assert(fs.select("id").except(ls.select("id")).count() == 0)
  }

  test("bronze: week filter + partitioned landing round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("bronze").toString
    val week = Bronze.weekFilter(rawLoan, "2023-01-08")
    val dates = week.select(date_format($"snapshot_date", "yyyy-MM-dd"))
      .distinct().as[String].collect().toSet
    assert(dates == Set("2023-01-08")) // fixture dates are week-starts only
    Bronze.landPartitioned(rawLoan.select("id", "member_id", "snapshot_date"), dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == rawLoan.count())
    assert(back.select("week_start").distinct().count() == 4)
    // partition pruning works on the layout
    val pruned = back.filter($"week_start" === "2023-01-08")
    assert(pruned.count() == rawLoan.filter($"snapshot_date" === to_date(lit("2023-01-08"))).count())
  }
}
