package graft.warehouse

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.standards.{Sdtm, SyntheticSdtm}

class StarSpec extends SparkSpec {
  import spark.implicits._

  private val runTs = to_timestamp(lit("2024-06-01 00:00:00"))
  private lazy val domains = SyntheticSdtm.allDomains(spark, 40, 42L)
  private lazy val stgDm = Sdtm.stgDemographics(domains("DM"), "STUDY001", runTs)
  private lazy val stgAe = Sdtm.stgAdverseEvents(domains("AE"), "STUDY001", runTs)
  private lazy val stgLb = Sdtm.stgLaboratory(domains("LB"), "STUDY001", runTs)
  private lazy val stgVs = Sdtm.stgVitalSigns(domains("VS"), "STUDY001", runTs)
  private lazy val stgEx = Sdtm.stgExposure(domains("EX"), "STUDY001", runTs)

  test("dim_subject mints dense surrogate keys in SUBJID order (W3)") {
    val dim = Star.dimSubject(domains("DM"))
    assert(dim.count() == 40)
    val sks = dim.orderBy("subject_id").select("subject_sk").as[Long].collect()
    assert(sks.toSeq == (1L to 40L))
  }

  test("fact tables resolve surrogate keys via natural-key join (J3)") {
    val dim = Star.dimSubject(domains("DM"))
    val fact = Star.factAdverseEvents(domains("AE"), dim)
    assert(fact.count() == domains("AE").count()) // every AE row keyed
    assert(fact.filter(col("subject_sk").isNull).count() == 0)
  }

  test("int_subject_summary: one row per subject, zero-filled aggregates") {
    val summary = Star.intSubjectSummary(stgDm, stgAe, stgLb, stgVs, stgEx)
    assert(summary.count() == 40)
    assert(summary.filter(col("total_lab_tests") === 3).count() == 40) // 3 labs each
    // a subject with no AEs gets zeros + NO_EVENTS
    val noAe = summary.filter(col("total_adverse_events") === 0)
    assert(noAe.filter(col("safety_risk_category") =!= "NO_EVENTS").count() == 0)
    // risk category respects the macro
    val highRisk = summary.filter(col("serious_adverse_events") > 0 ||
      col("severe_adverse_events") > 0)
    assert(highRisk.filter(col("safety_risk_category") =!= "HIGH_RISK").count() == 0)
  }

  test("fact_subject_outcomes: md5 key, completeness, quality buckets") {
    val summary = Star.intSubjectSummary(stgDm, stgAe, stgLb, stgVs, stgEx)
    val outcomes = Star.factSubjectOutcomes(summary, runTs)
    val r = outcomes.filter(col("subjid") === "SUBJ0001").collect()(0)
    assert(r.getAs[String]("subject_key") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("SUBJ0001".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val s = outcomes.select("data_completeness_score").as[Double].collect()
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(outcomes.filter(col("data_completeness_score") >= 0.8 &&
      col("participation_quality") =!= "HIGH_QUALITY").count() == 0)
  }

  test("dim_study_overview aggregates the mart (A13) with exact median") {
    val summary = Star.intSubjectSummary(stgDm, stgAe, stgLb, stgVs, stgEx)
    val outcomes = Star.factSubjectOutcomes(summary, runTs)
    val study = Star.dimStudyOverview(outcomes, "Demo Study", runTs).collect()(0)
    assert(study.getAs[Long]("total_subjects") == 40)
    assert(study.getAs[Long]("male_subjects") + study.getAs[Long]("female_subjects")
      <= 40)
    val medianAge = study.getAs[Double]("median_age")
    assert(medianAge >= 18 && medianAge <= 85)
    assert(Seq("ONGOING", "COMPLETED").contains(study.getAs[String]("study_status")))
  }

  test("ae_rates_by_arm runs on the star (J1+A3+F5 end-to-end)") {
    val dim = Star.dimSubject(domains("DM"))
    val factAe = Star.factAdverseEvents(domains("AE"), dim)
    val rates = graft.analytics.ClinicalAnalytics.aeRatesByArm(factAe, dim)
    val rows = rates.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("severe_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      val day = r.getAs[Int]("visit_day")
      assert(day >= 1 && day <= 31) // day-of-month, not day-of-year (F5)
    }
  }
}
