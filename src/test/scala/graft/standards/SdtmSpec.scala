package graft.standards

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SdtmSpec extends SparkSpec {
  import spark.implicits._

  private val runTs = to_timestamp(lit("2024-06-01 00:00:00"))

  test("mapDm coerces bad AGE to null (P2 null-on-failure)") {
    val raw = Seq(
      ("STUDY001", "SUBJ0001", "PLACEBO", "M", "42"),
      ("STUDY001", "SUBJ0002", null, "F", "not-a-number"))
      .toDF("STUDYID", "SUBJID", "ARM", "SEX", "AGE")
    val out = Sdtm.mapDm(raw).orderBy("SUBJID").collect()
    assert(out(0).getAs[Double]("AGE") == 42.0)
    assert(out(1).isNullAt(out(1).fieldIndex("AGE")))
  }

  test("mapAe coerces timestamps and nullable boolean AESER") {
    val raw = Seq(
      ("STUDY001", "S1", "2024-01-05", "garbage", "SEVERE", "true", "RECOVERED"),
      ("STUDY001", "S2", null, null, null, null, null))
      .toDF("STUDYID", "SUBJID", "AESTDTC", "AEENDTC", "AESEV", "AESER", "AEOUT")
    val out = Sdtm.mapAe(raw).orderBy("SUBJID").collect()
    assert(out(0).getAs[java.sql.Timestamp]("AESTDTC") != null)
    assert(out(0).isNullAt(out(0).fieldIndex("AEENDTC"))) // garbage -> null
    assert(out(0).getAs[Boolean]("AESER"))
    assert(out(1).isNullAt(out(1).fieldIndex("AESER"))) // nullable boolean
  }

  test("age groups follow the categorize_age macro") {
    val df = Seq(10.0, 18.0, 64.0, 65.0, 90.0).toDF("age")
      .select(Sdtm.ageGroup(col("age")).as("g"))
    assert(df.as[String].collect().toSeq ==
      Seq("PEDIATRIC", "ADULT", "ADULT", "ELDERLY", "ELDERLY"))
  }

  test("vital clinical flags match flag_abnormal_vital boundaries") {
    val rows = Seq(
      ("SYSBP", 89.0, "HYPOTENSIVE"), ("SYSBP", 90.0, "NORMAL"),
      ("SYSBP", 140.0, "HYPERTENSIVE"), ("SYSBP", 180.0, "SEVERE_HYPERTENSIVE"),
      ("HR", 59.0, "BRADYCARDIA"), ("HR", 100.0, "NORMAL"), ("HR", 101.0, "TACHYCARDIA"),
      ("TEMP", 38.5, "HIGH_FEVER"), ("WEIGHT", 70.0, "N/A"))
    val df = rows.toDF("code", "v", "expected")
      .withColumn("got", Sdtm.vitalClinicalFlag(col("code"), col("v")))
    assert(df.filter(col("got") =!= col("expected")).count() == 0)
  }

  test("lab result flags + normalization match the macros") {
    val df = Seq(
      (5.0, 7.0, 56.0, "LOW"), (60.0, 7.0, 56.0, "HIGH"),
      (30.0, 7.0, 56.0, "NORMAL"), (Double.NaN, 7.0, 56.0, "MISSING"))
      .toDF("v", "lo", "hi", "expected")
      .withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))
      .withColumn("got", Sdtm.labResultFlag(col("v"), col("lo"), col("hi")))
    assert(df.filter(col("got") =!= col("expected")).count() == 0)
    val norm = Seq((30.0, 10.0, 50.0)).toDF("v", "lo", "hi")
      .select(Sdtm.normalizedLabResult(col("v"), col("lo"), col("hi")).as("n"))
      .as[Double].head()
    assert(norm == 0.5)
  }

  test("stgExposure dose/treatment categorization matches stg_exposure.sql") {
    val ex = Seq(
      ("STUDY001", "S1", "PLACEBO", 5.0, "2024-01-01", "2024-01-10"),
      ("STUDY001", "S2", "ACTIVE DRUG", 50.0, "2024-01-01", null),
      ("STUDY001", "S3", "OTHERTHING", 500.0, null, null))
      .toDF("STUDYID", "SUBJID", "EXTRT", "EXDOSE", "EXSTDTC", "EXENDTC")
      .withColumn("EXSTDTC", col("EXSTDTC").cast("timestamp"))
      .withColumn("EXENDTC", col("EXENDTC").cast("timestamp"))
    val out = Sdtm.stgExposure(ex, "STUDY001", runTs).orderBy("subjid").collect()
    assert(out(0).getAs[String]("treatment_category") == "PLACEBO")
    assert(out(0).getAs[String]("dose_category") == "LOW_DOSE")
    assert(out(0).getAs[Int]("treatment_duration_days") == 10) // datediff + 1
    assert(out(0).getAs[String]("treatment_status") == "COMPLETED")
    assert(out(1).getAs[String]("treatment_category") == "ACTIVE_TREATMENT")
    assert(out(1).getAs[Boolean]("is_ongoing_treatment"))
    assert(out(1).getAs[String]("treatment_status") == "ONGOING")
    assert(out(2).getAs[String]("dose_category") == "HIGH_DOSE")
    assert(out(2).getAs[String]("treatment_status") == "NOT_STARTED")
  }

  test("synthetic generator is deterministic: same seed => identical frames") {
    val a = SyntheticSdtm.allDomains(spark, 50, 42L)
    val b = SyntheticSdtm.allDomains(spark, 50, 42L)
    Sdtm.Domains.foreach { d =>
      assert(a(d).exceptAll(b(d)).count() == 0 && b(d).exceptAll(a(d)).count() == 0,
        s"domain $d not frame-equal across runs")
    }
    // different seed differs
    val c = SyntheticSdtm.dm(spark, 50, 43L)
    assert(a("DM").exceptAll(c).count() > 0)
  }

  test("synthetic AE honors the 0-3 rows/subject contract (zero means ZERO)") {
    import org.apache.spark.sql.functions._
    val ae = SyntheticSdtm.ae(spark, 200, 42L)
    val perSubject = ae.groupBy("SUBJID").count()
      .select("count").as[Long].collect()
    assert(perSubject.forall(c => c >= 1 && c <= 3),
      "no subject may exceed 3 AE rows")
    // some subjects hash to zero AEs and must be ABSENT from the frame
    // (sequence(1,0) is [1,0], not empty — the regression this guards)
    assert(ae.select("SUBJID").distinct().count() < 200,
      "0-AE subjects must produce no rows")
  }

  test("synthetic DM carries the seeded invalid SEX='X' at row 0") {
    val dm = SyntheticSdtm.dm(spark, 20, 42L)
    assert(dm.filter(col("SUBJID") === "SUBJ0000" && col("SEX") === "X").count() == 1)
  }
}
