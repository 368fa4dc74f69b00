package graft.standards

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OMOP CDM — the reference's second data model (SURVEY §1.1, reference
  * `data_adapters/public_cdm.py:375-525` and the dbt models under
  * `analytics/dbt/models/public_cdm/`): person / visit_occurrence /
  * condition_occurrence / measurement tables, staging views and the
  * patient-summary mart.
  *
  * The generator mirrors the reference's scales (FIXTURES.md B): 1–10
  * visits/person over 730 days, 0–5 conditions and 2–15 measurements per
  * visit, deterministic under a seed (hash-based per-row PRNG, no driver
  * loop). `today` is injected everywhere the reference uses
  * `current_date()` so runs are reproducible (SURVEY §7.3 #2).
  */
object Omop {

  val GenderConcepts: Seq[Long] = Seq(8507L, 8532L)
  val RaceConcepts: Seq[Long] = Seq(8527L, 8516L, 8515L, 8557L)
  val EthnicityConcepts: Seq[Long] = Seq(38003563L, 38003564L)
  val ConditionConcepts: Seq[Long] = Seq(401267002L, 44054006L, 13645005L,
    22298006L, 40481000119105L, 56717001L, 195967001L)
  val MeasurementConcepts: Seq[(Long, Double, Double)] = Seq(
    (3000963L, 13.5, 2.0), (3013682L, 7.5, 2.5), (3004249L, 95.0, 15.0),
    (3027018L, 1.0, 0.3), (3028437L, 190.0, 40.0), (3027114L, 140.0, 3.0),
    (3019550L, 4.0, 0.5))

  private def h(seed: Long, stream: String, id: Column, mod: Long): Column =
    pmod(xxhash64(lit(seed), lit(stream), id), lit(mod))

  private def pick(seed: Long, stream: String, id: Column, xs: Seq[Long]): Column =
    xs.zipWithIndex.foldLeft(lit(xs.head)) { case (acc, (v, i)) =>
      when(h(seed, stream, id, xs.size) === i, v).otherwise(acc)
    }

  /** person table (reference `public_cdm.py:375-420` shape). */
  def person(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val id = col("id") + 1
    spark.range(n).select(
      id.as("person_id"),
      pick(seed, "gender", id, GenderConcepts).as("gender_concept_id"),
      (lit(1920) + h(seed, "yob", id, 91)).cast("long").as("year_of_birth"),
      (lit(1) + h(seed, "mob", id, 12)).cast("long").as("month_of_birth"),
      (lit(1) + h(seed, "dob", id, 28)).cast("long").as("day_of_birth"),
      pick(seed, "race", id, RaceConcepts).as("race_concept_id"),
      pick(seed, "eth", id, EthnicityConcepts).as("ethnicity_concept_id"))
  }

  /** visit_occurrence: 1–10 visits/person over the 730 days before
    * `anchorDate`; 9201 inpatient stays 1–5 days, 9202 outpatient 0 days. */
  def visitOccurrence(spark: SparkSession, n: Int, anchorDate: String,
      seed: Long = 42L): DataFrame = {
    val pid = col("id") + 1
    val persons = spark.range(n).select(pid.as("person_id"),
      (lit(1) + h(seed, "nvisits", pid, 10)).cast("int").as("n_visits"))
    val rows = persons
      .select(col("person_id"), explode(sequence(lit(1), col("n_visits"))).as("k"))
    val vid = col("person_id") * 100 + col("k")
    val isInpatient = h(seed, "vtype", vid, 4) === 0
    val start = date_sub(to_date(lit(anchorDate)),
      h(seed, "vstart", vid, 730).cast("int"))
    val stay = when(isInpatient, (lit(1) + h(seed, "stay", vid, 5)).cast("int"))
      .otherwise(0)
    rows.select(
      vid.cast("long").as("visit_occurrence_id"),
      col("person_id"),
      when(isInpatient, 9201L).otherwise(9202L).as("visit_concept_id"),
      start.as("visit_start_date"),
      date_add(start, stay).as("visit_end_date"),
      lit(44818517L).as("visit_type_concept_id"))
  }

  /** condition_occurrence: 0–5 per visit, concept drawn per row. */
  def conditionOccurrence(visits: DataFrame, seed: Long = 42L): DataFrame = {
    val vid = col("visit_occurrence_id")
    val rows = visits
      .withColumn("n_cond", h(seed, "ncond", vid, 6).cast("int"))
      .filter(col("n_cond") > 0)
      .withColumn("k", explode(sequence(lit(1), col("n_cond"))))
    val cid = vid * 10 + col("k")
    rows.select(
      cid.cast("long").as("condition_occurrence_id"),
      col("person_id"),
      pick(seed, "concept", cid, ConditionConcepts).as("condition_concept_id"),
      col("visit_start_date").as("condition_start_date"),
      col("visit_end_date").as("condition_end_date"),
      lit(32020L).as("condition_type_concept_id"),
      vid.as("visit_occurrence_id"))
  }

  /** measurement: 2–15 per visit, N(μ,σ)-ish values rounded to 2 dp. */
  def measurement(visits: DataFrame, seed: Long = 42L): DataFrame = {
    val vid = col("visit_occurrence_id")
    val rows = visits
      .withColumn("n_meas", (lit(2) + h(seed, "nmeas", vid, 14)).cast("int"))
      .withColumn("k", explode(sequence(lit(1), col("n_meas"))))
    val mid = vid * 100 + col("k")
    val concept = MeasurementConcepts.zipWithIndex.foldLeft(lit(MeasurementConcepts.head._1)) {
      case (acc, ((c, _, _), i)) =>
        when(h(seed, "mconcept", mid, MeasurementConcepts.size) === i, c).otherwise(acc)
    }
    // crude normal approx: mean of 4 uniforms, occasionally 3σ outliers
    val u = (1 to 4).map(i =>
      h(seed, s"mv$i", mid, 1000).cast("double") / 1000.0).reduce(_ + _) / 4.0
    val z = (u - 0.5) * 6.93 // var(mean of 4 U(0,1)) = 1/48 → ~N(0,1)
    val (means, sds) = (MeasurementConcepts.map(_._2), MeasurementConcepts.map(_._3))
    val mu = MeasurementConcepts.zipWithIndex.foldLeft(lit(means.head)) {
      case (acc, ((_, m, _), i)) =>
        when(h(seed, "mconcept", mid, MeasurementConcepts.size) === i, m).otherwise(acc)
    }
    val sd = MeasurementConcepts.zipWithIndex.foldLeft(lit(sds.head)) {
      case (acc, ((_, _, s), i)) =>
        when(h(seed, "mconcept", mid, MeasurementConcepts.size) === i, s).otherwise(acc)
    }
    val outlier = when(h(seed, "mout", mid, 20) === 0, 3.0).otherwise(1.0)
    rows.select(
      mid.cast("long").as("measurement_id"),
      col("person_id"),
      concept.as("measurement_concept_id"),
      greatest(round(mu + z * sd * outlier, 2), lit(0.0)).as("value_as_number"),
      col("visit_start_date").as("measurement_date"),
      lit(44818701L).as("measurement_type_concept_id"),
      vid.as("visit_occurrence_id"))
  }

  // ---- staging views (analytics/dbt/models/public_cdm/*.sql)

  /** `staging_person.sql` with injected `today`. */
  def stagingPerson(person: DataFrame, today: Column): DataFrame =
    person
      .filter(col("person_id").isNotNull)
      .withColumn("age_years", year(today) - col("year_of_birth"))
      .withColumn("birth_year_quality_flag",
        when(col("year_of_birth").isNull, "Missing birth year")
          .when(col("year_of_birth") < 1900 || col("year_of_birth") > year(today),
            "Invalid birth year"))

  /** `staging_visit_occurrence.sql`. */
  def stagingVisitOccurrence(visits: DataFrame): DataFrame =
    visits
      .filter(col("visit_occurrence_id").isNotNull && col("person_id").isNotNull)
      .withColumn("length_of_stay_days",
        datediff(col("visit_end_date"), col("visit_start_date")))
      .withColumn("visit_type_name",
        when(col("visit_concept_id") === 9201L, "Inpatient Visit")
          .when(col("visit_concept_id") === 9202L, "Outpatient Visit")
          .when(col("visit_concept_id") === 9203L, "Emergency Room Visit")
          .otherwise("Other"))
      .withColumn("visit_quality_flag",
        when(col("visit_start_date").isNull, "Missing start date")
          .when(col("visit_end_date").isNull, "Missing end date")
          .when(col("visit_end_date") < col("visit_start_date"), "End before start")
          .when(datediff(col("visit_end_date"), col("visit_start_date")) > 365,
            "Excessive length of stay"))

  /** `mart_patient_summary.sql`'s visit_summary CTE: per-person visit
    * patterns over the staged visits. Exposed on its own (not just inside
    * the mart) so the aggregate is independently oracle-checkable. */
  def visitSummary(stgVisits: DataFrame): DataFrame =
    stgVisits.groupBy("person_id").agg(
      count(lit(1)).as("total_visits"),
      countDistinct(col("visit_concept_id")).as("unique_visit_types"),
      min(col("visit_start_date")).as("first_visit_date"),
      max(col("visit_end_date")).as("last_visit_date"),
      sum(col("length_of_stay_days")).as("total_los_days"),
      avg(col("length_of_stay_days")).as("avg_los_days"),
      sum(when(col("visit_type_name") === "Inpatient Visit", 1L).otherwise(0L))
        .as("inpatient_visits"),
      sum(when(col("visit_type_name") === "Outpatient Visit", 1L).otherwise(0L))
        .as("outpatient_visits"),
      sum(when(col("visit_type_name") === "Emergency Room Visit", 1L).otherwise(0L))
        .as("er_visits"))

  /** `mart_patient_summary.sql`: person spine ⟕ visit/condition/measurement
    * aggregates + complexity score (the OMOP twin of int_subject_summary). */
  def martPatientSummary(stgPerson: DataFrame, stgVisits: DataFrame,
      conditions: DataFrame, measurements: DataFrame): DataFrame = {
    val visitAgg = visitSummary(stgVisits)
    val condAgg = conditions.groupBy("person_id").agg(
      count(lit(1)).as("total_conditions"),
      countDistinct(col("condition_concept_id")).as("unique_conditions"))
    val measAgg = measurements.groupBy("person_id").agg(
      count(lit(1)).as("total_measurements"),
      countDistinct(col("measurement_concept_id")).as("unique_measurement_types"))

    stgPerson.select("person_id", "gender_concept_id", "year_of_birth",
      "race_concept_id", "ethnicity_concept_id", "age_years",
      "birth_year_quality_flag")
      .join(visitAgg, Seq("person_id"), "left")
      .join(condAgg, Seq("person_id"), "left")
      .join(measAgg, Seq("person_id"), "left")
      .select(
        col("person_id"), col("gender_concept_id"), col("year_of_birth"),
        col("race_concept_id"), col("ethnicity_concept_id"), col("age_years"),
        coalesce(col("total_visits"), lit(0L)).as("total_visits"),
        coalesce(col("unique_visit_types"), lit(0L)).as("unique_visit_types"),
        col("first_visit_date"), col("last_visit_date"),
        coalesce(col("total_los_days"), lit(0L)).as("total_los_days"),
        coalesce(col("avg_los_days"), lit(0.0)).as("avg_los_days"),
        coalesce(col("inpatient_visits"), lit(0L)).as("inpatient_visits"),
        coalesce(col("outpatient_visits"), lit(0L)).as("outpatient_visits"),
        coalesce(col("er_visits"), lit(0L)).as("er_visits"),
        coalesce(col("total_conditions"), lit(0L)).as("total_conditions"),
        coalesce(col("unique_conditions"), lit(0L)).as("unique_conditions"),
        coalesce(col("total_measurements"), lit(0L)).as("total_measurements"),
        coalesce(col("unique_measurement_types"), lit(0L))
          .as("unique_measurement_types"),
        (coalesce(col("total_visits"), lit(0L)) * 0.1 +
          coalesce(col("unique_conditions"), lit(0L)) * 0.5 +
          coalesce(col("inpatient_visits"), lit(0L)) * 2.0).as("complexity_score"),
        when(col("birth_year_quality_flag").isNotNull, col("birth_year_quality_flag"))
          .when(coalesce(col("total_visits"), lit(0L)) === 0, "No visits recorded")
          .otherwise("Good").as("data_quality_status"))
  }
}
