package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.standards.Omop

/** The OMOP public-CDM pipeline (graft.standards.Omop — the reference's
  * second data model, `data_adapters/public_cdm.py` + the dbt models under
  * `analytics/dbt/models/public_cdm/`) pushed through the driver's oracle
  * gate, mirroring the ClinicalQueries pattern: the TPC-H-ish testdata is
  * mapped deterministically onto OMOP table shapes (customer → person,
  * orders → visit_occurrence, lineitem⋈orders → condition_occurrence /
  * measurement), then the REAL library code (`Omop.stagingPerson`,
  * `Omop.stagingVisitOccurrence`, `Omop.visitSummary`,
  * `Omop.martPatientSummary`) runs on top, and the DuckDB oracle replicates
  * mapping + staging + mart in SQL (reference `staging_person.sql:32-40`,
  * `staging_visit_occurrence.sql`, `mart_patient_summary.sql:14-99`).
  * The mapping deliberately mints rows for every staging quality-flag
  * branch (missing/invalid birth year, end-before-start and missing-end
  * visits, all three visit types, person with zero visits).
  */
object OmopQueries {

  /** Injected "today" — the reference uses current_date() in
    * staging_person.sql; pinned for reproducibility (SURVEY §7.3 #2). */
  private val today = to_date(lit("2024-06-01"))
  private val sqlToday = "DATE '2024-06-01'"

  /** concept drawn by `id % xs.size`, as a Column and its SQL twin. */
  private def pickMod(id: Column, xs: Seq[Long]): Column = {
    val m = id % xs.size
    xs.zipWithIndex.tail.foldLeft(when(m === 0, xs.head)) {
      case (acc, (v, i)) => acc.when(m === i, v)
    }
  }
  private def sqlPickMod(id: String, xs: Seq[Long]): String =
    xs.zipWithIndex
      .map { case (v, i) => s"WHEN $id % ${xs.size} = $i THEN CAST($v AS BIGINT)" }
      .mkString("CASE ", " ", " END")

  // ---- deterministic OMOP mappings over testdata (Spark + SQL twins)

  /** customer → person. Modular branches mint every birth-year quality
    * case: NULL (%97), pre-1900 (%89=3), future (%83=5). */
  private def personFrom(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").as("person_id"),
      when(col("c_custkey") % 2 === 0, 8507L).otherwise(8532L)
        .as("gender_concept_id"),
      when(col("c_custkey") % 97 === 0, lit(null).cast("long"))
        .when(col("c_custkey") % 89 === 3, 1880L)
        .when(col("c_custkey") % 83 === 5, 2030L)
        .otherwise(lit(1920L) + col("c_custkey") % 91).as("year_of_birth"),
      (lit(1L) + col("c_custkey") % 12).as("month_of_birth"),
      (lit(1L) + col("c_custkey") % 28).as("day_of_birth"),
      pickMod(col("c_custkey"), Omop.RaceConcepts).as("race_concept_id"),
      when(col("c_custkey") % 3 === 0, Omop.EthnicityConcepts.head)
        .otherwise(Omop.EthnicityConcepts(1)).as("ethnicity_concept_id"))

  private val sqlPerson =
    s"""SELECT c_custkey AS person_id,
               CASE WHEN c_custkey % 2 = 0 THEN CAST(8507 AS BIGINT)
                    ELSE CAST(8532 AS BIGINT) END AS gender_concept_id,
               CASE WHEN c_custkey % 97 = 0 THEN NULL
                    WHEN c_custkey % 89 = 3 THEN CAST(1880 AS BIGINT)
                    WHEN c_custkey % 83 = 5 THEN CAST(2030 AS BIGINT)
                    ELSE 1920 + c_custkey % 91 END AS year_of_birth,
               1 + c_custkey % 12 AS month_of_birth,
               1 + c_custkey % 28 AS day_of_birth,
               ${sqlPickMod("c_custkey", Omop.RaceConcepts)} AS race_concept_id,
               CASE WHEN c_custkey % 3 = 0 THEN CAST(${Omop.EthnicityConcepts.head} AS BIGINT)
                    ELSE CAST(${Omop.EthnicityConcepts(1)} AS BIGINT)
                    END AS ethnicity_concept_id
        FROM customer"""

  /** orders → visit_occurrence. Priority → visit type (urgent/high =
    * inpatient 9201, low = ER 9203, else outpatient 9202); inpatient stays
    * 1–5 days; %101 mints end-before-start, %103 missing end date; persons
    * with custkey %50 = 3 get NO visits (exercises the mart's
    * 'No visits recorded' branch — every custkey has orders in testdata). */
  private def visitsFrom(s: SparkSession, d: String): DataFrame = {
    val start = col("o_orderdate").cast("date")
    val inpatient = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, d).filter(col("o_custkey") % 50 =!= 3).select(
      col("o_orderkey").as("visit_occurrence_id"),
      col("o_custkey").as("person_id"),
      when(inpatient, 9201L)
        .when(col("o_orderpriority") === "5-LOW", 9203L)
        .otherwise(9202L).as("visit_concept_id"),
      start.as("visit_start_date"),
      when(col("o_orderkey") % 101 === 0, date_sub(start, 1))
        .when(col("o_orderkey") % 103 === 0, lit(null).cast("date"))
        .when(inpatient,
          date_add(start, (lit(1) + col("o_orderkey") % 5).cast("int")))
        .otherwise(start).as("visit_end_date"))
  }

  private val sqlVisits =
    """SELECT o_orderkey AS visit_occurrence_id,
              o_custkey AS person_id,
              CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN CAST(9201 AS BIGINT)
                   WHEN o_orderpriority = '5-LOW' THEN CAST(9203 AS BIGINT)
                   ELSE CAST(9202 AS BIGINT) END AS visit_concept_id,
              CAST(o_orderdate AS DATE) AS visit_start_date,
              CASE WHEN o_orderkey % 101 = 0 THEN CAST(o_orderdate AS DATE) - 1
                   WHEN o_orderkey % 103 = 0 THEN NULL
                   WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                   THEN CAST(o_orderdate AS DATE)
                        + CAST(1 + o_orderkey % 5 AS INTEGER)
                   ELSE CAST(o_orderdate AS DATE) END AS visit_end_date
       FROM orders WHERE o_custkey % 50 != 3"""

  /** lineitem⋈orders → condition_occurrence (~2/3 of lines). */
  private def conditionsFrom(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_partkey") % 3 =!= 0)
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("condition_occurrence_id"),
        col("o_custkey").as("person_id"),
        pickMod(col("l_partkey"), Omop.ConditionConcepts).as("condition_concept_id"),
        col("o_orderdate").cast("date").as("condition_start_date"))

  private val sqlConditions =
    s"""SELECT l_orderkey * 10 + l_linenumber AS condition_occurrence_id,
               o_custkey AS person_id,
               ${sqlPickMod("l_partkey", Omop.ConditionConcepts)} AS condition_concept_id,
               CAST(o_orderdate AS DATE) AS condition_start_date
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_partkey % 3 != 0"""

  /** lineitem⋈orders → measurement. */
  private def measurementsFrom(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("measurement_id"),
        col("o_custkey").as("person_id"),
        pickMod(col("l_suppkey"), Omop.MeasurementConcepts.map(_._1))
          .as("measurement_concept_id"),
        col("l_quantity").as("value_as_number"),
        col("o_orderdate").cast("date").as("measurement_date"))

  private val sqlMeasurements =
    s"""SELECT l_orderkey * 10 + l_linenumber AS measurement_id,
               o_custkey AS person_id,
               ${sqlPickMod("l_suppkey", Omop.MeasurementConcepts.map(_._1))}
                 AS measurement_concept_id,
               l_quantity AS value_as_number,
               CAST(o_orderdate AS DATE) AS measurement_date
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""

  // ---- SQL twins of the staging views / mart (reference dbt models)

  private val sqlStgPerson =
    s"""SELECT *,
               EXTRACT(YEAR FROM $sqlToday) - year_of_birth AS age_years,
               CASE WHEN year_of_birth IS NULL THEN 'Missing birth year'
                    WHEN year_of_birth < 1900
                         OR year_of_birth > EXTRACT(YEAR FROM $sqlToday)
                    THEN 'Invalid birth year' END AS birth_year_quality_flag
        FROM ($sqlPerson) WHERE person_id IS NOT NULL"""

  private val sqlStgVisits =
    s"""SELECT *,
               date_diff('day', visit_start_date, visit_end_date)
                 AS length_of_stay_days,
               CASE WHEN visit_concept_id = 9201 THEN 'Inpatient Visit'
                    WHEN visit_concept_id = 9202 THEN 'Outpatient Visit'
                    WHEN visit_concept_id = 9203 THEN 'Emergency Room Visit'
                    ELSE 'Other' END AS visit_type_name
        FROM ($sqlVisits)
        WHERE visit_occurrence_id IS NOT NULL AND person_id IS NOT NULL"""

  private val sqlVisitSummary =
    s"""SELECT person_id,
               COUNT(*) AS total_visits,
               CAST(COUNT(DISTINCT visit_concept_id) AS BIGINT) AS unique_visit_types,
               MIN(visit_start_date) AS first_visit_date,
               MAX(visit_end_date) AS last_visit_date,
               CAST(SUM(length_of_stay_days) AS BIGINT) AS total_los_days,
               AVG(length_of_stay_days) AS avg_los_days,
               CAST(SUM(CASE WHEN visit_type_name = 'Inpatient Visit'
                             THEN 1 ELSE 0 END) AS BIGINT) AS inpatient_visits,
               CAST(SUM(CASE WHEN visit_type_name = 'Outpatient Visit'
                             THEN 1 ELSE 0 END) AS BIGINT) AS outpatient_visits,
               CAST(SUM(CASE WHEN visit_type_name = 'Emergency Room Visit'
                             THEN 1 ELSE 0 END) AS BIGINT) AS er_visits
        FROM ($sqlStgVisits) GROUP BY person_id"""

  // ---- Spark-side pipeline built from the REAL library

  private def mart(s: SparkSession, d: String): DataFrame =
    Omop.martPatientSummary(
      Omop.stagingPerson(personFrom(s, d), today),
      Omop.stagingVisitOccurrence(visitsFrom(s, d)),
      conditionsFrom(s, d),
      measurementsFrom(s, d))

  val all: Seq[Q] = Seq(

    Q("om1_person_staging",
      (s, d) => Omop.stagingPerson(personFrom(s, d), today)
        .select(col("person_id"), col("gender_concept_id"),
          col("year_of_birth"), col("month_of_birth"), col("day_of_birth"),
          col("race_concept_id"), col("ethnicity_concept_id"),
          col("age_years"), col("birth_year_quality_flag"))
        .orderBy("person_id"),
      Some(s"""SELECT person_id, gender_concept_id, year_of_birth,
                      month_of_birth, day_of_birth, race_concept_id,
                      ethnicity_concept_id, age_years, birth_year_quality_flag
               FROM ($sqlStgPerson) ORDER BY person_id""")),

    Q("om2_visit_summary",
      (s, d) => Omop.visitSummary(
        Omop.stagingVisitOccurrence(visitsFrom(s, d)))
        .withColumn("avg_los_days", round(col("avg_los_days"), 6))
        .orderBy("person_id"),
      Some(s"""SELECT person_id, total_visits, unique_visit_types,
                      first_visit_date, last_visit_date, total_los_days,
                      ROUND(avg_los_days, 6) AS avg_los_days,
                      inpatient_visits, outpatient_visits, er_visits
               FROM ($sqlVisitSummary) ORDER BY person_id""")),

    Q("om3_mart_patient_summary",
      (s, d) => mart(s, d)
        .withColumn("avg_los_days", round(col("avg_los_days"), 6))
        .withColumn("complexity_score", round(col("complexity_score"), 6))
        .orderBy("person_id"),
      Some(s"""WITH p AS ($sqlStgPerson),
                    v AS ($sqlVisitSummary),
                    c AS (SELECT person_id, COUNT(*) AS total_conditions,
                                 CAST(COUNT(DISTINCT condition_concept_id) AS BIGINT)
                                   AS unique_conditions
                          FROM ($sqlConditions) GROUP BY person_id),
                    m AS (SELECT person_id, COUNT(*) AS total_measurements,
                                 CAST(COUNT(DISTINCT measurement_concept_id) AS BIGINT)
                                   AS unique_measurement_types
                          FROM ($sqlMeasurements) GROUP BY person_id)
               SELECT p.person_id, p.gender_concept_id, p.year_of_birth,
                      p.race_concept_id, p.ethnicity_concept_id, p.age_years,
                      CAST(COALESCE(v.total_visits, 0) AS BIGINT) AS total_visits,
                      CAST(COALESCE(v.unique_visit_types, 0) AS BIGINT)
                        AS unique_visit_types,
                      v.first_visit_date, v.last_visit_date,
                      CAST(COALESCE(v.total_los_days, 0) AS BIGINT) AS total_los_days,
                      ROUND(COALESCE(v.avg_los_days, 0.0), 6) AS avg_los_days,
                      CAST(COALESCE(v.inpatient_visits, 0) AS BIGINT)
                        AS inpatient_visits,
                      CAST(COALESCE(v.outpatient_visits, 0) AS BIGINT)
                        AS outpatient_visits,
                      CAST(COALESCE(v.er_visits, 0) AS BIGINT) AS er_visits,
                      CAST(COALESCE(c.total_conditions, 0) AS BIGINT)
                        AS total_conditions,
                      CAST(COALESCE(c.unique_conditions, 0) AS BIGINT)
                        AS unique_conditions,
                      CAST(COALESCE(m.total_measurements, 0) AS BIGINT)
                        AS total_measurements,
                      CAST(COALESCE(m.unique_measurement_types, 0) AS BIGINT)
                        AS unique_measurement_types,
                      ROUND(CAST(COALESCE(v.total_visits, 0) AS DOUBLE) * CAST(0.1 AS DOUBLE)
                            + CAST(COALESCE(c.unique_conditions, 0) AS DOUBLE) * CAST(0.5 AS DOUBLE)
                            + CAST(COALESCE(v.inpatient_visits, 0) AS DOUBLE) * CAST(2.0 AS DOUBLE),
                            6) AS complexity_score,
                      CASE WHEN p.birth_year_quality_flag IS NOT NULL
                           THEN p.birth_year_quality_flag
                           WHEN COALESCE(v.total_visits, 0) = 0
                           THEN 'No visits recorded'
                           ELSE 'Good' END AS data_quality_status
               FROM p
               LEFT JOIN v ON p.person_id = v.person_id
               LEFT JOIN c ON p.person_id = c.person_id
               LEFT JOIN m ON p.person_id = m.person_id
               ORDER BY p.person_id""")))
}
