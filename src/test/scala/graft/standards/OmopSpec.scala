package graft.standards

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OmopSpec extends SparkSpec {

  private val today = to_date(lit("2024-06-01"))
  private lazy val person = Omop.person(spark, 100, 42L)
  private lazy val visits = Omop.visitOccurrence(spark, 100, "2024-06-01", 42L)
  private lazy val conditions = Omop.conditionOccurrence(visits, 42L)
  private lazy val measurements = Omop.measurement(visits, 42L)

  test("generator respects the reference's ranges and determinism") {
    assert(person.count() == 100)
    val yob = person.agg(min("year_of_birth"), max("year_of_birth")).collect()(0)
    assert(yob.getLong(0) >= 1920 && yob.getLong(1) <= 2010)
    assert(person.filter(!col("gender_concept_id").isin(8507L, 8532L)).count() == 0)
    val perPerson = visits.groupBy("person_id").count()
    val rng = perPerson.agg(min("count"), max("count")).collect()(0)
    assert(rng.getLong(0) >= 1 && rng.getLong(1) <= 10)
    // determinism
    assert(Omop.person(spark, 100, 42L).exceptAll(person).count() == 0)
    // PKs unique
    assert(visits.groupBy("visit_occurrence_id").count()
      .filter(col("count") > 1).count() == 0)
    assert(measurements.groupBy("measurement_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("staging: visit types, length of stay, quality flags") {
    val stg = Omop.stagingVisitOccurrence(visits)
    assert(stg.filter(col("visit_concept_id") === 9202L &&
      col("length_of_stay_days") =!= 0).count() == 0) // outpatient 0 days
    assert(stg.filter(col("visit_concept_id") === 9201L &&
      (col("length_of_stay_days") < 1 || col("length_of_stay_days") > 5))
      .count() == 0)
    assert(stg.filter(col("visit_quality_flag").isNotNull).count() == 0)
    val p = Omop.stagingPerson(person, today)
    assert(p.filter(col("age_years") =!= (lit(2024) - col("year_of_birth")))
      .count() == 0)
  }

  test("mart_patient_summary: spine join, zero-fill, complexity score") {
    val mart = Omop.martPatientSummary(
      Omop.stagingPerson(person, today),
      Omop.stagingVisitOccurrence(visits), conditions, measurements)
    assert(mart.count() == 100)
    // every person has ≥1 visit by construction → all Good
    assert(mart.filter(col("data_quality_status") =!= "Good").count() == 0)
    // complexity = 0.1·visits + 0.5·uniq_conditions + 2·inpatient
    val bad = mart.filter(
      abs(col("complexity_score") - (col("total_visits") * 0.1 +
        col("unique_conditions") * 0.5 + col("inpatient_visits") * 2.0)) > 1e-12)
    assert(bad.count() == 0)
    // FK closure: conditions joined in are all counted
    val totalCond = mart.agg(sum("total_conditions")).collect()(0).getLong(0)
    assert(totalCond == conditions.count())
  }
}
