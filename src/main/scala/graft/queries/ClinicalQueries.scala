package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.standards.Sdtm
import graft.warehouse.Star

/** The clinical staging + warehouse pipeline (graft.standards / graft
  * .warehouse) pushed through the driver's oracle gate: the TPC-H-ish
  * testdata is mapped deterministically onto SDTM domain shapes (customer →
  * DM, orders → AE, lineitem → LB/VS, customer → EX), then the REAL
  * library code (`Sdtm.stg*`, `Star.intSubjectSummary`,
  * `Star.factSubjectOutcomes`, `Star.dimStudyOverview`) runs on top, and
  * the DuckDB oracle replicates mapping + staging + marts in SQL. This
  * hash-checks the clinical engine itself, not a re-implementation.
  */
object ClinicalQueries {

  private val runTs = to_timestamp(lit("2024-06-01 00:00:00"), "yyyy-MM-dd HH:mm:ss")

  // ---- deterministic SDTM mappings over testdata (Spark + SQL twins)

  private def dmFrom(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      lit("STUDY001").as("STUDYID"),
      concat(lit("C"), lpad(col("c_custkey").cast("string"), 7, "0")).as("SUBJID"),
      col("c_mktsegment").as("ARM"),
      when(col("c_custkey") % 3 === 0, "M")
        .when(col("c_custkey") % 3 === 1, "F")
        .when(col("c_custkey") % 7 === 2, lit(null).cast("string"))
        .otherwise("U").as("SEX"),
      (lit(14) + col("c_custkey") % 60).cast("double").as("AGE"))

  private val sqlDm =
    """SELECT 'STUDY001' AS studyid,
              'C' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS subjid,
              c_mktsegment AS arm,
              CASE WHEN c_custkey % 3 = 0 THEN 'M'
                   WHEN c_custkey % 3 = 1 THEN 'F'
                   WHEN c_custkey % 7 = 2 THEN NULL
                   ELSE 'U' END AS sex,
              CAST(14 + c_custkey % 60 AS DOUBLE) AS age
       FROM customer"""

  private def aeFrom(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      lit("STUDY001").as("STUDYID"),
      concat(lit("C"), lpad(col("o_custkey").cast("string"), 7, "0")).as("SUBJID"),
      col("o_orderkey").as("AEID"),
      col("o_orderdate").as("AESTDTC"),
      when(col("o_orderkey") % 4 =!= 0,
        expr("timestampadd(DAY, CAST(o_orderkey % 15 AS INT), o_orderdate)"))
        .as("AEENDTC"),
      when(col("o_orderpriority") === "1-URGENT", "SERIOUS")
        .when(col("o_orderpriority") === "2-HIGH", "SEVERE")
        .when(col("o_orderpriority") === "3-MEDIUM", "MODERATE")
        .when(col("o_orderkey") % 11 === 0, lit(null).cast("string"))
        .otherwise("MILD").as("AESEV"),
      when(col("o_orderstatus") === "P", lit(null).cast("boolean"))
        .otherwise(col("o_totalprice") > 150000).as("AESER"),
      when(col("o_orderstatus") === "F", "RECOVERED")
        .when(col("o_orderstatus") === "O", "RECOVERING").as("AEOUT"))

  private val sqlAe =
    """SELECT 'STUDY001' AS studyid,
              'C' || lpad(CAST(o_custkey AS VARCHAR), 7, '0') AS subjid,
              o_orderkey AS aeid,
              o_orderdate AS aestdtc,
              CASE WHEN o_orderkey % 4 != 0
                   THEN o_orderdate + to_days(CAST(o_orderkey % 15 AS INTEGER))
                   END AS aeendtc,
              CASE WHEN o_orderpriority = '1-URGENT' THEN 'SERIOUS'
                   WHEN o_orderpriority = '2-HIGH' THEN 'SEVERE'
                   WHEN o_orderpriority = '3-MEDIUM' THEN 'MODERATE'
                   WHEN o_orderkey % 11 = 0 THEN NULL
                   ELSE 'MILD' END AS aesev,
              CASE WHEN o_orderstatus = 'P' THEN NULL
                   ELSE o_totalprice > 150000 END AS aeser,
              CASE WHEN o_orderstatus = 'F' THEN 'RECOVERED'
                   WHEN o_orderstatus = 'O' THEN 'RECOVERING' END AS aeout
       FROM orders"""

  private def lbFrom(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        lit("STUDY001").as("STUDYID"),
        concat(lit("C"), lpad(col("o_custkey").cast("string"), 7, "0")).as("SUBJID"),
        when(col("l_linenumber") % 3 === 0, "ALT")
          .when(col("l_linenumber") % 3 === 1, "AST")
          .otherwise("CREAT").as("LBTESTCD"),
        when(col("l_partkey") % 29 === 0, lit(null).cast("double"))
          .otherwise(col("l_quantity")).as("LBORRES"),
        lit("U/L").as("LBORRESU"),
        lit(10.0).as("LBLNOR"), lit(45.0).as("LBHNOR"))

  private val sqlLb =
    """SELECT 'STUDY001' AS studyid,
              'C' || lpad(CAST(o_custkey AS VARCHAR), 7, '0') AS subjid,
              CASE WHEN l_linenumber % 3 = 0 THEN 'ALT'
                   WHEN l_linenumber % 3 = 1 THEN 'AST'
                   ELSE 'CREAT' END AS test_code_raw,
              CASE WHEN l_partkey % 29 = 0 THEN NULL ELSE l_quantity END AS result_value,
              'U/L' AS unit_raw,
              CAST(10.0 AS DOUBLE) AS normal_low, CAST(45.0 AS DOUBLE) AS normal_high
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""

  private def vsFrom(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        lit("STUDY001").as("STUDYID"),
        concat(lit("C"), lpad(col("o_custkey").cast("string"), 7, "0")).as("SUBJID"),
        when(col("l_linenumber") % 2 === 0, "HR").otherwise("SYSBP").as("VSTESTCD"),
        when(col("l_linenumber") % 2 === 0, (lit(40) + col("l_partkey") % 90))
          .otherwise(lit(80) + col("l_partkey") % 110)
          .cast("double").as("VSORRES"),
        when(col("l_linenumber") % 2 === 0, "bpm").otherwise("mmHg").as("VSORRESU"))

  private val sqlVs =
    """SELECT 'STUDY001' AS studyid,
              'C' || lpad(CAST(o_custkey AS VARCHAR), 7, '0') AS subjid,
              CASE WHEN l_linenumber % 2 = 0 THEN 'HR' ELSE 'SYSBP' END AS test_code,
              CAST(CASE WHEN l_linenumber % 2 = 0 THEN 40 + l_partkey % 90
                        ELSE 80 + l_partkey % 110 END AS DOUBLE) AS result_value,
              CASE WHEN l_linenumber % 2 = 0 THEN 'bpm' ELSE 'mmHg' END AS unit_raw
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""

  private def exFrom(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_custkey") % 4 =!= 0)
      .select(
        lit("STUDY001").as("STUDYID"),
        concat(lit("C"), lpad(col("c_custkey").cast("string"), 7, "0")).as("SUBJID"),
        when(col("c_mktsegment") === "BUILDING", "PLACEBO ARM")
          .when(col("c_mktsegment") === "MACHINERY", "ACTIVE DRUG")
          .when(col("c_custkey") % 13 === 0, lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("EXTRT"),
        (col("c_custkey") % 120).cast("double").as("EXDOSE"),
        to_timestamp(lit("2024-01-01 00:00:00"), "yyyy-MM-dd HH:mm:ss").as("EXSTDTC"),
        when(col("c_custkey") % 5 =!= 0,
          expr("timestampadd(DAY, CAST(c_custkey % 90 AS INT), TIMESTAMP '2024-01-01 00:00:00')"))
          .as("EXENDTC"))

  private val sqlEx =
    """SELECT 'STUDY001' AS studyid,
              'C' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS subjid,
              CASE WHEN c_mktsegment = 'BUILDING' THEN 'PLACEBO ARM'
                   WHEN c_mktsegment = 'MACHINERY' THEN 'ACTIVE DRUG'
                   WHEN c_custkey % 13 = 0 THEN NULL
                   ELSE c_mktsegment END AS extrt,
              CAST(c_custkey % 120 AS DOUBLE) AS exdose,
              TIMESTAMP '2024-01-01 00:00:00' AS exstdtc,
              CASE WHEN c_custkey % 5 != 0
                   THEN TIMESTAMP '2024-01-01 00:00:00'
                        + to_days(CAST(c_custkey % 90 AS INTEGER)) END AS exendtc
       FROM customer WHERE c_custkey % 4 != 0"""

  // ---- staging SQL twins (mirror Sdtm.stg*, minus audit timestamps)

  private val sqlStgAe =
    s"""SELECT subjid, aeid,
               upper(COALESCE(aesev, 'UNKNOWN')) AS severity,
               COALESCE(aeser, false) AS is_serious,
               upper(COALESCE(aeout, 'UNKNOWN')) AS outcome,
               CASE WHEN aestdtc IS NOT NULL AND aeendtc IS NOT NULL
                    THEN CAST(date_diff('day', CAST(aestdtc AS DATE),
                                        CAST(aeendtc AS DATE)) AS INTEGER)
                    END AS duration_days,
               CASE WHEN aeendtc IS NULL
                     AND NOT (upper(COALESCE(aeout, 'UNKNOWN')) = 'FATAL')
                    THEN true ELSE false END AS is_ongoing,
               CASE WHEN aesev = 'MILD' THEN 1 WHEN aesev = 'MODERATE' THEN 2
                    WHEN aesev = 'SEVERE' THEN 3 ELSE 0 END AS severity_rank
        FROM ($sqlAe)"""

  private val sqlStgLb =
    s"""SELECT subjid, upper(test_code_raw) AS test_code, result_value,
               CASE WHEN result_value IS NULL THEN 'MISSING'
                    WHEN result_value < normal_low THEN 'LOW'
                    WHEN result_value > normal_high THEN 'HIGH'
                    WHEN result_value >= normal_low AND result_value <= normal_high
                    THEN 'NORMAL' ELSE 'UNKNOWN' END AS result_flag,
               CASE WHEN test_code_raw IN ('ALT','AST','BILI','ALP') THEN 'LIVER_FUNCTION'
                    WHEN test_code_raw IN ('CREAT','BUN','UREA') THEN 'KIDNEY_FUNCTION'
                    ELSE 'OTHER' END AS test_category
        FROM ($sqlLb)"""

  private val sqlStgVs =
    s"""SELECT subjid, test_code, result_value,
               CASE WHEN test_code = 'SYSBP' AND result_value IS NOT NULL THEN
                      CASE WHEN result_value < 90 THEN 'HYPOTENSIVE'
                           WHEN result_value >= 90 AND result_value < 140 THEN 'NORMAL'
                           WHEN result_value >= 140 AND result_value < 180 THEN 'HYPERTENSIVE'
                           WHEN result_value >= 180 THEN 'SEVERE_HYPERTENSIVE'
                           ELSE 'UNKNOWN' END
                    WHEN test_code = 'HR' AND result_value IS NOT NULL THEN
                      CASE WHEN result_value < 60 THEN 'BRADYCARDIA'
                           WHEN result_value >= 60 AND result_value <= 100 THEN 'NORMAL'
                           WHEN result_value > 100 THEN 'TACHYCARDIA'
                           ELSE 'UNKNOWN' END
                    ELSE 'N/A' END AS clinical_flag
        FROM ($sqlVs)"""

  private val sqlStgEx =
    s"""SELECT subjid,
               CASE WHEN exstdtc IS NOT NULL AND exendtc IS NOT NULL
                    THEN CAST(date_diff('day', CAST(exstdtc AS DATE),
                                        CAST(exendtc AS DATE)) AS BIGINT) + 1
                    END AS treatment_duration_days,
               CASE WHEN exendtc IS NULL THEN true ELSE false END AS is_ongoing_treatment,
               CASE WHEN lower(extrt) LIKE '%placebo%' THEN 'PLACEBO'
                    WHEN lower(extrt) LIKE '%active%' OR lower(extrt) LIKE '%drug%'
                    THEN 'ACTIVE_TREATMENT'
                    WHEN extrt IS NULL THEN 'UNKNOWN'
                    ELSE 'OTHER' END AS treatment_category
        FROM ($sqlEx)"""

  private val sqlStgDm =
    s"""SELECT studyid, subjid,
               COALESCE(arm, 'UNKNOWN') AS treatment_arm,
               upper(COALESCE(raw_sex, 'U')) AS sex,
               age,
               CASE WHEN age < 18 THEN 'PEDIATRIC'
                    WHEN age >= 18 AND age < 65 THEN 'ADULT'
                    WHEN age >= 65 THEN 'ELDERLY'
                    ELSE 'UNKNOWN' END AS age_group,
               CASE WHEN raw_sex = 'M' THEN 'MALE' WHEN raw_sex = 'F' THEN 'FEMALE'
                    ELSE 'UNKNOWN' END AS sex_desc
        FROM (SELECT studyid, subjid, arm, sex AS raw_sex, age FROM ($sqlDm))"""

  /** The int_subject_summary twin (`int_subject_summary.sql`), shared by
    * cp3/cp4/cp5 oracles. Matches Star.intSubjectSummary column for column
    * (minus audit timestamps). */
  private val sqlSummary =
    s"""SELECT d.studyid, d.subjid, d.treatment_arm, d.sex, d.sex_desc, d.age,
               d.age_group,
               CAST(COALESCE(ae.total_aes, 0) AS BIGINT) AS total_adverse_events,
               CAST(COALESCE(ae.serious_aes, 0) AS BIGINT) AS serious_adverse_events,
               CAST(COALESCE(ae.severe_aes, 0) AS BIGINT) AS severe_adverse_events,
               CAST(COALESCE(ae.ongoing_aes, 0) AS BIGINT) AS ongoing_adverse_events,
               CAST(COALESCE(ae.max_severity_rank, 0) AS INTEGER) AS max_ae_severity_rank,
               COALESCE(ae.has_serious_ae, 0) > 0 AS has_serious_adverse_event,
               CAST(COALESCE(lb.total_lab_tests, 0) AS BIGINT) AS total_lab_tests,
               CAST(COALESCE(lb.unique_lab_tests, 0) AS BIGINT) AS unique_lab_tests,
               CAST(COALESCE(lb.abnormal_lab_results, 0) AS BIGINT) AS abnormal_lab_results,
               CAST(COALESCE(lb.lab_categories_tested, 0) AS BIGINT) AS lab_categories_tested,
               CASE WHEN lb.total_lab_tests > 0
                    THEN ROUND(CAST(lb.abnormal_lab_results AS DOUBLE)
                               / CAST(lb.total_lab_tests AS DOUBLE), 3)
                    ELSE 0.0 END AS abnormal_lab_rate,
               CAST(COALESCE(vs.total_vital_measurements, 0) AS BIGINT)
                 AS total_vital_measurements,
               CAST(COALESCE(vs.unique_vital_tests, 0) AS BIGINT) AS unique_vital_tests,
               CAST(COALESCE(vs.abnormal_vitals, 0) AS BIGINT) AS abnormal_vitals,
               CASE WHEN vs.total_vital_measurements > 0
                    THEN ROUND(CAST(vs.abnormal_vitals AS DOUBLE)
                               / CAST(vs.total_vital_measurements AS DOUBLE), 3)
                    ELSE 0.0 END AS abnormal_vital_rate,
               CAST(COALESCE(ex.total_exposures, 0) AS BIGINT) AS total_exposures,
               CAST(COALESCE(ex.max_treatment_duration, 0) AS BIGINT)
                 AS max_treatment_duration,
               CAST(COALESCE(ex.ongoing_treatments, 0) AS BIGINT) AS ongoing_treatments,
               COALESCE(ex.treatment_categories, 'NONE') AS treatment_categories,
               CASE WHEN ae.serious_aes > 0 OR ae.severe_aes > 0 THEN 'HIGH_RISK'
                    WHEN ae.total_aes > 5 THEN 'MEDIUM_RISK'
                    WHEN ae.total_aes > 0 THEN 'LOW_RISK'
                    ELSE 'NO_EVENTS' END AS safety_risk_category,
               CASE WHEN ae.total_aes > 0 THEN 1 ELSE 0 END AS has_ae_data,
               CASE WHEN lb.total_lab_tests > 0 THEN 1 ELSE 0 END AS has_lab_data,
               CASE WHEN vs.total_vital_measurements > 0 THEN 1 ELSE 0 END AS has_vital_data,
               CASE WHEN ex.total_exposures > 0 THEN 1 ELSE 0 END AS has_exposure_data
        FROM ($sqlStgDm) d
        LEFT JOIN (SELECT subjid, COUNT(*) AS total_aes,
                          CAST(SUM(CASE WHEN is_serious THEN 1 ELSE 0 END) AS BIGINT) AS serious_aes,
                          CAST(SUM(CASE WHEN severity = 'SEVERE' THEN 1 ELSE 0 END) AS BIGINT) AS severe_aes,
                          CAST(SUM(CASE WHEN is_ongoing THEN 1 ELSE 0 END) AS BIGINT) AS ongoing_aes,
                          MAX(severity_rank) AS max_severity_rank,
                          COUNT(DISTINCT CASE WHEN is_serious THEN subjid END)
                            AS has_serious_ae
                   FROM ($sqlStgAe) GROUP BY subjid) ae ON d.subjid = ae.subjid
        LEFT JOIN (SELECT subjid, COUNT(*) AS total_lab_tests,
                          COUNT(DISTINCT test_code) AS unique_lab_tests,
                          CAST(SUM(CASE WHEN result_flag = 'ABNORMAL' THEN 1 ELSE 0 END) AS BIGINT) AS abnormal_lab_results,
                          COUNT(DISTINCT test_category) AS lab_categories_tested
                   FROM ($sqlStgLb) GROUP BY subjid) lb ON d.subjid = lb.subjid
        LEFT JOIN (SELECT subjid, COUNT(*) AS total_vital_measurements,
                          COUNT(DISTINCT test_code) AS unique_vital_tests,
                          CAST(SUM(CASE WHEN clinical_flag NOT IN ('NORMAL','N/A')
                                   THEN 1 ELSE 0 END) AS BIGINT) AS abnormal_vitals
                   FROM ($sqlStgVs) GROUP BY subjid) vs ON d.subjid = vs.subjid
        LEFT JOIN (SELECT subjid, COUNT(*) AS total_exposures,
                          MAX(treatment_duration_days) AS max_treatment_duration,
                          COUNT(CASE WHEN is_ongoing_treatment THEN 1 END)
                            AS ongoing_treatments,
                          string_agg(treatment_category, ', ' ORDER BY treatment_category)
                            AS treatment_categories
                   FROM (SELECT DISTINCT subjid, treatment_category,
                                treatment_duration_days, is_ongoing_treatment
                         FROM ($sqlStgEx)) x
                   GROUP BY subjid) ex ON d.subjid = ex.subjid"""

  // ---- Spark-side pipeline built from the REAL library

  /** `int_subject_summary` is an INTERMEDIATE dbt model in the reference —
    * materialized once and read by every downstream mart
    * (`fact_subject_outcomes.sql` and `dim_study_overview.sql` both select
    * from {{ ref('int_subject_summary') }}), never re-derived per mart.
    * Reproduce that DAG shape: one persisted copy per (session, sf dir),
    * shared by cp3/cp4/cp5. The cached frame is subject-dim-scale (one row
    * per subject — 1,500 at sf0.1), never fact-scale, so the persist is
    * safe at any SF; the expensive part (two lineitem⋈orders derivations +
    * four per-domain aggregates) runs once per process instead of three
    * times. Entries of stopped sessions are swept on each miss. */
  private val summaryCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def summary(s: SparkSession, d: String): DataFrame = {
    val hit = summaryCache.get((s, d))
    if (hit != null) return hit
    summaryCache.keySet.removeIf(_._1.sparkContext.isStopped)
    summaryCache.computeIfAbsent((s, d), _ => {
      val stgDm = Sdtm.stgDemographics(dmFrom(s, d), "STUDY001", runTs)
      val stgAe = Sdtm.stgAdverseEvents(aeFrom(s, d).drop("AEID"), "STUDY001", runTs)
      val stgLb = Sdtm.stgLaboratory(lbFrom(s, d), "STUDY001", runTs)
      val stgVs = Sdtm.stgVitalSigns(vsFrom(s, d), "STUDY001", runTs)
      val stgEx = Sdtm.stgExposure(exFrom(s, d), "STUDY001", runTs)
      Star.intSubjectSummary(stgDm, stgAe, stgLb, stgVs, stgEx)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  val all: Seq[Q] = Seq(

    // M1 features through graft.ml.RiskModel.subjectFeatures.
    Q("cp6_ml_risk_features",
      (s, d) => graft.ml.RiskModel.subjectFeatures(dmFrom(s, d), aeFrom(s, d))
        .select(col("SUBJID"), col("AGE"),
          col("AE_COUNT").cast("long").as("AE_COUNT"),
          col("SEVERE_AE_COUNT").cast("long").as("SEVERE_AE_COUNT"), col("label"))
        .orderBy("SUBJID"),
      Some(s"""SELECT d.subjid AS "SUBJID", d.age AS "AGE",
                      CAST(COALESCE(ac.n, 0) AS BIGINT) AS "AE_COUNT",
                      CAST(COALESCE(sc.n, 0) AS BIGINT) AS "SEVERE_AE_COUNT",
                      CAST(COALESCE(sc.n, 0) > 0 AS DOUBLE) AS label
               FROM ($sqlDm) d
               LEFT JOIN (SELECT subjid, COUNT(*) AS n FROM ($sqlAe)
                          GROUP BY subjid) ac ON d.subjid = ac.subjid
               LEFT JOIN (SELECT subjid, COUNT(*) AS n FROM ($sqlAe)
                          WHERE aesev IN ('SEVERE','SERIOUS')
                          GROUP BY subjid) sc ON d.subjid = sc.subjid
               ORDER BY d.subjid""")),

    // M7: the batch-scoring inference path (`ml/infer.py:15-26`) under the
    // hash gate. The model is the pinned Frozen artifact (RiskModel.Frozen:
    // scaler means/stds + LR weights as constants — the saved-pipeline
    // analog, since a freshly fitted model's weights cannot appear in a
    // static oracle); MlSpec proves scoreBatchFrozen ≡ scoreBatch over a
    // real PipelineModel carrying the same parameters. The gated surface
    // is integer micro-units via floor(x*1e6 + 0.5): the 1e-6
    // granularity absorbs the libm-exp last-ulp difference between
    // engines (the f14 rationale), and floor — unlike ROUND, whose tie
    // algorithm differs between Spark (decimal HALF_UP) and DuckDB
    // (binary away-from-zero) — is exact IEEE in both (r9 review).
    Q("m7_batch_score",
      (s, d) => {
        val feats = graft.ml.RiskModel.subjectFeatures(dmFrom(s, d), aeFrom(s, d))
        graft.ml.RiskModel.scoreBatchFrozen(feats)
          .select(col("SUBJID"),
            floor(col("RISK") * 1e6 + 0.5).cast("long").as("risk_micro"))
          .orderBy("SUBJID")
      },
      Some(s"""SELECT d.subjid AS "SUBJID",
                      CAST(floor((1.0 / (1.0 + exp(-(
                        -1.5
                        + 0.02 * ((d.age - 43.5) / 17.25)
                        + 0.12 * ((COALESCE(ac.n, 0) - 10.0) / 6.5)
                        + 0.45 * ((COALESCE(sc.n, 0) - 3.0) / 2.5))))) * 1e6 + 0.5)
                        AS BIGINT) AS risk_micro
               FROM ($sqlDm) d
               LEFT JOIN (SELECT subjid, COUNT(*) AS n FROM ($sqlAe)
                          GROUP BY subjid) ac ON d.subjid = ac.subjid
               LEFT JOIN (SELECT subjid, COUNT(*) AS n FROM ($sqlAe)
                          WHERE aesev IN ('SEVERE','SERIOUS')
                          GROUP BY subjid) sc ON d.subjid = sc.subjid
               ORDER BY d.subjid""")),

    // CP7: ADaM ADSL (reference standards/adam/build_adsl.py) — the wide
    // subject-level analysis table: full DM plus zero-filled AE counts
    // and the severe-AE dropout-risk flag.
    Q("cp7_adsl",
      (s, d) => graft.standards.Adam.buildAdsl(dmFrom(s, d), aeFrom(s, d))
        .select(col("STUDYID"), col("SUBJID"), col("ARM"), col("SEX"),
          col("AGE"),
          col("AE_COUNT").cast("long").as("AE_COUNT"),
          col("SEVERE_AE_COUNT").cast("long").as("SEVERE_AE_COUNT"),
          col("DROPOUT_RISK").cast("long").as("DROPOUT_RISK"))
        .orderBy("SUBJID"),
      Some(s"""SELECT d.studyid AS "STUDYID", d.subjid AS "SUBJID",
                      d.arm AS "ARM", d.sex AS "SEX", d.age AS "AGE",
                      CAST(COALESCE(ac.n, 0) AS BIGINT) AS "AE_COUNT",
                      CAST(COALESCE(sc.n, 0) AS BIGINT) AS "SEVERE_AE_COUNT",
                      CAST(COALESCE(sc.n, 0) > 0 AS BIGINT) AS "DROPOUT_RISK"
               FROM ($sqlDm) d
               LEFT JOIN (SELECT subjid, COUNT(*) AS n FROM ($sqlAe)
                          GROUP BY subjid) ac ON d.subjid = ac.subjid
               LEFT JOIN (SELECT subjid, COUNT(*) AS n FROM ($sqlAe)
                          WHERE aesev IN ('SEVERE','SERIOUS')
                          GROUP BY subjid) sc ON d.subjid = sc.subjid
               ORDER BY d.subjid""")),

    // P7: the subject-browse API surface (`api/endpoints.py:373-390`) —
    // optional boolean-mask filters composed with deterministic
    // pagination, run against the REAL outcomes mart (cp4's frame). One
    // filter is deliberately None so the optional-predicate fold is
    // exercised, not just the all-filters path; offset+limit land inside
    // the filtered set at every scale (arm ≈ 1/5 of subjects, age ≥ 30 ≈
    // 72% of the 14–73 uniform).
    Q("p7_subject_page",
      (s, d) => graft.analytics.ClinicalAnalytics.subjectPage(
          Star.factSubjectOutcomes(summary(s, d), runTs),
          arm = Some("BUILDING"), riskCategory = None, minAge = Some(30),
          offset = 10, limit = 25)
        .select("subjid", "treatment_arm", "safety_risk_category", "age"),
      Some(s"""SELECT subjid, treatment_arm, safety_risk_category, age
               FROM ($sqlSummary)
               WHERE treatment_arm = 'BUILDING' AND age >= 30
               ORDER BY subjid LIMIT 25 OFFSET 10""")),

    Q("cp1_stg_demographics",
      (s, d) => Sdtm.stgDemographics(dmFrom(s, d), "STUDY001", runTs)
        .select("subjid", "treatment_arm", "sex", "age", "age_group", "sex_desc")
        .orderBy("subjid"),
      Some(s"""SELECT subjid, treatment_arm, sex, age, age_group, sex_desc
               FROM ($sqlStgDm) ORDER BY subjid""")),

    Q("cp2_stg_adverse_events",
      (s, d) => aeFrom(s, d).select(
        col("SUBJID").as("subjid"), col("AEID").as("aeid"),
        upper(coalesce(col("AESEV"), lit("UNKNOWN"))).as("severity"),
        coalesce(col("AESER"), lit(false)).as("is_serious"),
        upper(coalesce(col("AEOUT"), lit("UNKNOWN"))).as("outcome"),
        Sdtm.daysBetween(col("AESTDTC"), col("AEENDTC")).as("duration_days"),
        Sdtm.aeIsOngoing(col("AEENDTC"), col("AEOUT")).as("is_ongoing"),
        Sdtm.aeSeverityRank(col("AESEV")).as("severity_rank"))
        .orderBy("subjid", "aeid"),
      Some(s"""SELECT subjid, aeid, severity, is_serious, outcome, duration_days,
                      is_ongoing, severity_rank
               FROM ($sqlStgAe) ORDER BY subjid, aeid""")),

    Q("cp3_subject_summary",
      (s, d) => summary(s, d)
        .drop("dbt_updated_at", "dbt_study_id", "studyid")
        .orderBy("subjid"),
      Some(s"""SELECT * EXCLUDE (studyid) FROM ($sqlSummary) ORDER BY subjid""")),

    Q("cp4_subject_outcomes",
      (s, d) => Star.factSubjectOutcomes(summary(s, d), runTs)
        .select("subject_key", "subjid", "treatment_arm", "safety_risk_category",
          "data_completeness_score", "clinical_profile", "participation_quality")
        .orderBy("subjid"),
      Some(s"""SELECT md5(COALESCE(CAST(subjid AS VARCHAR), '')) AS subject_key,
                      subjid, treatment_arm, safety_risk_category,
                      CAST(has_ae_data + has_lab_data + has_vital_data + has_exposure_data
                           AS DOUBLE) / 4.0 AS data_completeness_score,
                      CASE WHEN abnormal_lab_rate > 0.3 AND abnormal_vital_rate > 0.2
                           THEN 'MULTIPLE_ABNORMALITIES'
                           WHEN abnormal_lab_rate > 0.5 THEN 'HIGH_LAB_ABNORMALITIES'
                           WHEN abnormal_vital_rate > 0.3 THEN 'HIGH_VITAL_ABNORMALITIES'
                           WHEN has_serious_adverse_event THEN 'SERIOUS_SAFETY_CONCERN'
                           ELSE 'NORMAL_PROFILE' END AS clinical_profile,
                      CASE WHEN CAST(has_ae_data + has_lab_data + has_vital_data
                                     + has_exposure_data AS DOUBLE) / 4.0 >= 0.8
                           THEN 'HIGH_QUALITY'
                           WHEN CAST(has_ae_data + has_lab_data + has_vital_data
                                     + has_exposure_data AS DOUBLE) / 4.0 >= 0.5
                           THEN 'MEDIUM_QUALITY'
                           ELSE 'LOW_QUALITY' END AS participation_quality
               FROM ($sqlSummary) ORDER BY subjid""")),

    Q("cp5_study_overview",
      (s, d) => Star.dimStudyOverview(
        Star.factSubjectOutcomes(summary(s, d), runTs), "Demo Study", runTs)
        .select(col("study_id"), col("total_subjects"), col("treatment_arms_count"),
          col("male_subjects"), col("female_subjects"),
          col("pediatric_subjects"), col("adult_subjects"), col("elderly_subjects"),
          col("mean_age"), round(col("median_age"), 6).as("median_age"),
          col("min_age"), col("max_age"),
          col("total_adverse_events_study"), col("total_serious_aes_study"),
          col("subjects_with_serious_aes"),
          round(col("avg_data_completeness"), 6).as("avg_data_completeness"),
          col("high_quality_subjects"), col("medium_quality_subjects"),
          col("low_quality_subjects"), col("normal_profile_subjects"),
          col("safety_concern_subjects"), col("multiple_abnormalities_subjects"),
          col("subjects_with_ongoing_treatment"), col("total_lab_tests_study"),
          col("total_vital_measurements_study"),
          col("male_percentage"), col("female_percentage"),
          col("serious_ae_rate_percent"), col("study_status"),
          col("overall_safety_profile"), col("data_quality_assessment")),
      Some(s"""WITH outcomes AS (
                 SELECT *, 'STUDY001' AS dbt_study_id,
                        CAST(has_ae_data + has_lab_data + has_vital_data
                             + has_exposure_data AS DOUBLE) / 4.0
                          AS data_completeness_score,
                        CASE WHEN abnormal_lab_rate > 0.3 AND abnormal_vital_rate > 0.2
                             THEN 'MULTIPLE_ABNORMALITIES'
                             WHEN abnormal_lab_rate > 0.5 THEN 'HIGH_LAB_ABNORMALITIES'
                             WHEN abnormal_vital_rate > 0.3 THEN 'HIGH_VITAL_ABNORMALITIES'
                             WHEN has_serious_adverse_event THEN 'SERIOUS_SAFETY_CONCERN'
                             ELSE 'NORMAL_PROFILE' END AS clinical_profile
                 FROM ($sqlSummary)),
               outcomes2 AS (
                 SELECT *,
                        CASE WHEN data_completeness_score >= 0.8 THEN 'HIGH_QUALITY'
                             WHEN data_completeness_score >= 0.5 THEN 'MEDIUM_QUALITY'
                             ELSE 'LOW_QUALITY' END AS participation_quality
                 FROM outcomes),
               m AS (
                 SELECT dbt_study_id AS study_id,
                        COUNT(*) AS total_subjects,
                        COUNT(DISTINCT treatment_arm) AS treatment_arms_count,
                        COUNT(CASE WHEN sex = 'M' THEN 1 END) AS male_subjects,
                        COUNT(CASE WHEN sex = 'F' THEN 1 END) AS female_subjects,
                        COUNT(CASE WHEN age_group = 'PEDIATRIC' THEN 1 END)
                          AS pediatric_subjects,
                        COUNT(CASE WHEN age_group = 'ADULT' THEN 1 END) AS adult_subjects,
                        COUNT(CASE WHEN age_group = 'ELDERLY' THEN 1 END)
                          AS elderly_subjects,
                        ROUND(AVG(age), 1) AS mean_age,
                        ROUND(quantile_cont(age, 0.5), 6) AS median_age,
                        MIN(age) AS min_age, MAX(age) AS max_age,
                        CAST(SUM(total_adverse_events) AS BIGINT)
                          AS total_adverse_events_study,
                        CAST(SUM(serious_adverse_events) AS BIGINT)
                          AS total_serious_aes_study,
                        COUNT(CASE WHEN has_serious_adverse_event THEN 1 END)
                          AS subjects_with_serious_aes,
                        ROUND(AVG(data_completeness_score), 6) AS avg_data_completeness,
                        COUNT(CASE WHEN participation_quality = 'HIGH_QUALITY' THEN 1 END)
                          AS high_quality_subjects,
                        COUNT(CASE WHEN participation_quality = 'MEDIUM_QUALITY' THEN 1 END)
                          AS medium_quality_subjects,
                        COUNT(CASE WHEN participation_quality = 'LOW_QUALITY' THEN 1 END)
                          AS low_quality_subjects,
                        COUNT(CASE WHEN clinical_profile = 'NORMAL_PROFILE' THEN 1 END)
                          AS normal_profile_subjects,
                        COUNT(CASE WHEN clinical_profile = 'SERIOUS_SAFETY_CONCERN' THEN 1 END)
                          AS safety_concern_subjects,
                        COUNT(CASE WHEN clinical_profile = 'MULTIPLE_ABNORMALITIES' THEN 1 END)
                          AS multiple_abnormalities_subjects,
                        COUNT(CASE WHEN ongoing_treatments > 0 THEN 1 END)
                          AS subjects_with_ongoing_treatment,
                        CAST(SUM(total_lab_tests) AS BIGINT) AS total_lab_tests_study,
                        CAST(SUM(total_vital_measurements) AS BIGINT)
                          AS total_vital_measurements_study
                 FROM outcomes2 GROUP BY dbt_study_id)
               SELECT study_id, total_subjects, treatment_arms_count, male_subjects,
                      female_subjects, pediatric_subjects, adult_subjects,
                      elderly_subjects, mean_age, median_age, min_age, max_age,
                      total_adverse_events_study, total_serious_aes_study,
                      subjects_with_serious_aes, avg_data_completeness,
                      high_quality_subjects, medium_quality_subjects,
                      low_quality_subjects, normal_profile_subjects,
                      safety_concern_subjects, multiple_abnormalities_subjects,
                      subjects_with_ongoing_treatment, total_lab_tests_study,
                      total_vital_measurements_study,
                      ROUND(CAST(male_subjects AS DOUBLE)
                            / CAST(total_subjects AS DOUBLE) * 100, 1) AS male_percentage,
                      ROUND(CAST(female_subjects AS DOUBLE)
                            / CAST(total_subjects AS DOUBLE) * 100, 1) AS female_percentage,
                      ROUND(CAST(subjects_with_serious_aes AS DOUBLE)
                            / CAST(total_subjects AS DOUBLE) * 100, 1)
                        AS serious_ae_rate_percent,
                      CASE WHEN subjects_with_ongoing_treatment > 0 THEN 'ONGOING'
                           ELSE 'COMPLETED' END AS study_status,
                      CASE WHEN ROUND(CAST(subjects_with_serious_aes AS DOUBLE)
                                      / CAST(total_subjects AS DOUBLE) * 100, 1) > 20
                           THEN 'HIGH_SAFETY_CONCERN'
                           WHEN ROUND(CAST(subjects_with_serious_aes AS DOUBLE)
                                      / CAST(total_subjects AS DOUBLE) * 100, 1) > 10
                           THEN 'MODERATE_SAFETY_CONCERN'
                           ELSE 'LOW_SAFETY_CONCERN' END AS overall_safety_profile,
                      CASE WHEN ROUND(avg_data_completeness * 100, 1) >= 80
                           THEN 'HIGH_QUALITY_DATA'
                           WHEN ROUND(avg_data_completeness * 100, 1) >= 60
                           THEN 'MEDIUM_QUALITY_DATA'
                           ELSE 'LOW_QUALITY_DATA' END AS data_quality_assessment
               FROM m"""))
  )
}
