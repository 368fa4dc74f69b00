package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.standards.Sdtm

/** Star-schema warehouse builders (SURVEY.md §2.3/§2.4/§2.5, reference
  * `warehouse/loaders.py:19-57`, `sql/warehouse_ddl.sql:66-191`) plus the
  * dbt marts (`int_subject_summary.sql`, `fact_subject_outcomes.sql`,
  * `dim_study_overview.sql`).
  *
  * Scale notes: `dim_subject` is dim-scale (one row per subject) so the
  * global ROW_NUMBER surrogate key is acceptable (single-partition window —
  * documented reference semantics, `loaders.py:31`); facts join to it via
  * broadcast. The subject spine (J2) is a shuffle join on `subjid`; at
  * 100 TB both sides would be bucketed on `subjid` so the five-way spine
  * co-locates without re-shuffling.
  */
object Star {

  /** `dim_subject` (`loaders.py:28-40`): ROW_NUMBER surrogate key, pinned
    * to an explicit SUBJID ordering for determinism (SURVEY §7.3 #2). */
  def dimSubject(dm: DataFrame): DataFrame =
    dm.select(
      row_number().over(Window.orderBy("SUBJID")).cast("long").as("subject_sk"),
      col("SUBJID").as("subject_id"),
      lit(1L).as("study_sk"),
      col("ARM").as("arm"), col("SEX").as("sex"),
      col("AGE").cast("int").as("age"))

  /** `fact_adverse_events` (`loaders.py:42-56`): surrogate-key resolution
    * via broadcast join on the natural key (J3). */
  def factAdverseEvents(ae: DataFrame, dimSubj: DataFrame): DataFrame =
    ae.join(broadcast(dimSubj), ae("SUBJID") === dimSubj("subject_id"))
      .select(col("subject_sk"), lit(1L).as("study_sk"),
        col("AESTDTC").cast("date").as("ae_start"),
        col("AEENDTC").cast("date").as("ae_end"),
        col("AESEV").as("severity"), col("AESER").as("seriousness"),
        col("AEOUT").as("outcome"))

  /** `fact_labs` (`sql/warehouse_ddl.sql:122-138` shape). */
  def factLabs(lb: DataFrame, dimSubj: DataFrame): DataFrame =
    lb.join(broadcast(dimSubj), lb("SUBJID") === dimSubj("subject_id"))
      .select(col("subject_sk"), lit(1L).as("study_sk"),
        col("LBTESTCD").as("code"), col("LBORRES").as("value"),
        col("LBORRESU").as("unit"),
        col("LBLNOR").as("low_norm"), col("LBHNOR").as("high_norm"))

  /** `fact_vitals` + `dim_measurement` (`warehouse_ddl.sql:141-160`). */
  def dimMeasurement(vs: DataFrame): DataFrame =
    vs.select(col("VSTESTCD").as("code")).distinct()
      .select(row_number().over(Window.orderBy("code")).cast("long")
        .as("measurement_sk"), col("code"))

  def factVitals(vs: DataFrame, dimSubj: DataFrame, dimMeas: DataFrame): DataFrame =
    vs.join(broadcast(dimSubj), vs("SUBJID") === dimSubj("subject_id"))
      .join(broadcast(dimMeas), vs("VSTESTCD") === dimMeas("code"))
      .select(col("subject_sk"), col("measurement_sk"), lit(1L).as("study_sk"),
        col("VSORRES").as("value"), col("VSORRESU").as("unit"))

  /** `int_subject_summary.sql`: demographics spine ⟕ four per-domain
    * aggregates (J2+J4+A2/A5/A7/A8). Note the reference counts
    * `result_flag = 'ABNORMAL'` which never matches its own flag domain
    * {LOW,HIGH,NORMAL,MISSING,UNKNOWN} — reproduced faithfully
    * (`int_subject_summary.sql:28`). */
  def intSubjectSummary(stgDm: DataFrame, stgAe: DataFrame, stgLb: DataFrame,
      stgVs: DataFrame, stgEx: DataFrame): DataFrame = {
    val aeAgg = stgAe.groupBy("subjid").agg(
      count(lit(1)).as("total_aes"),
      sum(when(col("is_serious"), 1L).otherwise(0L)).as("serious_aes"),
      sum(when(col("severity") === "SEVERE", 1L).otherwise(0L)).as("severe_aes"),
      sum(when(col("is_ongoing"), 1L).otherwise(0L)).as("ongoing_aes"),
      max(col("severity_rank")).as("max_severity_rank"),
      // 0/1 any-serious flag. The dbt model spells it COUNT(DISTINCT CASE
      // WHEN is_serious THEN subjid END), but grouped BY subjid that count
      // can only be 0 or 1 — MAX over a 0/1 indicator is value-identical
      // and avoids planting a distinct-aggregate Expand (3x row blowup
      // before the shuffle) in the hottest agg of the pipeline.
      max(when(col("is_serious"), 1L).otherwise(0L)).as("has_serious_ae"))
    val lbAgg = stgLb.groupBy("subjid").agg(
      count(lit(1)).as("total_lab_tests"),
      countDistinct(col("test_code")).as("unique_lab_tests"),
      sum(when(col("result_flag") === "ABNORMAL", 1L).otherwise(0L))
        .as("abnormal_lab_results"),
      countDistinct(col("test_category")).as("lab_categories_tested"))
    val vsAgg = stgVs.groupBy("subjid").agg(
      count(lit(1)).as("total_vital_measurements"),
      countDistinct(col("test_code")).as("unique_vital_tests"),
      sum(when(!col("clinical_flag").isin("NORMAL", "N/A"), 1L).otherwise(0L))
        .as("abnormal_vitals"))
    val exAgg = stgEx.groupBy("subjid").agg(
      count(lit(1)).as("total_exposures"),
      max(col("treatment_duration_days")).as("max_treatment_duration"),
      count(when(col("is_ongoing_treatment"), 1)).as("ongoing_treatments"),
      concat_ws(", ", array_sort(collect_set(col("treatment_category"))))
        .as("treatment_categories"))

    stgDm.as("d")
      .join(aeAgg.as("ae"), Seq("subjid"), "left")
      .join(lbAgg.as("lb"), Seq("subjid"), "left")
      .join(vsAgg.as("vs"), Seq("subjid"), "left")
      .join(exAgg.as("ex"), Seq("subjid"), "left")
      .select(
        col("d.studyid"), col("subjid"), col("d.treatment_arm"), col("d.sex"),
        col("d.sex_desc"), col("d.age"), col("d.age_group"),
        coalesce(col("total_aes"), lit(0L)).as("total_adverse_events"),
        coalesce(col("serious_aes"), lit(0L)).as("serious_adverse_events"),
        coalesce(col("severe_aes"), lit(0L)).as("severe_adverse_events"),
        coalesce(col("ongoing_aes"), lit(0L)).as("ongoing_adverse_events"),
        coalesce(col("max_severity_rank"), lit(0)).as("max_ae_severity_rank"),
        (coalesce(col("has_serious_ae"), lit(0L)) > 0).as("has_serious_adverse_event"),
        coalesce(col("total_lab_tests"), lit(0L)).as("total_lab_tests"),
        coalesce(col("unique_lab_tests"), lit(0L)).as("unique_lab_tests"),
        coalesce(col("abnormal_lab_results"), lit(0L)).as("abnormal_lab_results"),
        coalesce(col("lab_categories_tested"), lit(0L)).as("lab_categories_tested"),
        when(col("total_lab_tests") > 0,
          round(col("abnormal_lab_results").cast("double") /
            col("total_lab_tests").cast("double"), 3)).otherwise(0.0)
          .as("abnormal_lab_rate"),
        coalesce(col("total_vital_measurements"), lit(0L)).as("total_vital_measurements"),
        coalesce(col("unique_vital_tests"), lit(0L)).as("unique_vital_tests"),
        coalesce(col("abnormal_vitals"), lit(0L)).as("abnormal_vitals"),
        when(col("total_vital_measurements") > 0,
          round(col("abnormal_vitals").cast("double") /
            col("total_vital_measurements").cast("double"), 3)).otherwise(0.0)
          .as("abnormal_vital_rate"),
        coalesce(col("total_exposures"), lit(0L)).as("total_exposures"),
        coalesce(col("max_treatment_duration"), lit(0)).cast("long")
          .as("max_treatment_duration"),
        coalesce(col("ongoing_treatments"), lit(0L)).as("ongoing_treatments"),
        coalesce(when(length(col("treatment_categories")) > 0,
          col("treatment_categories")), lit("NONE")).as("treatment_categories"),
        Sdtm.safetyRiskCategory(coalesce(col("total_aes"), lit(0L)),
          coalesce(col("serious_aes"), lit(0L)),
          coalesce(col("severe_aes"), lit(0L))).as("safety_risk_category"),
        when(col("total_aes") > 0, 1).otherwise(0).as("has_ae_data"),
        when(col("total_lab_tests") > 0, 1).otherwise(0).as("has_lab_data"),
        when(col("total_vital_measurements") > 0, 1).otherwise(0).as("has_vital_data"),
        when(col("total_exposures") > 0, 1).otherwise(0).as("has_exposure_data"),
        col("d.dbt_updated_at"), col("d.dbt_study_id"))
  }

  /** `fact_subject_outcomes.sql`: md5 surrogate key (F10), completeness
    * score (F8), clinical profile + participation quality buckets. */
  def factSubjectOutcomes(summary: DataFrame, runTs: Column): DataFrame = {
    val completeness = (col("has_ae_data") + col("has_lab_data") +
      col("has_vital_data") + col("has_exposure_data")).cast("double") / 4.0
    summary
      .withColumn("subject_key",
        md5(coalesce(col("subjid").cast("string"), lit(""))))
      .withColumn("data_completeness_score", completeness)
      .withColumn("clinical_profile",
        when(col("abnormal_lab_rate") > 0.3 && col("abnormal_vital_rate") > 0.2,
          "MULTIPLE_ABNORMALITIES")
          .when(col("abnormal_lab_rate") > 0.5, "HIGH_LAB_ABNORMALITIES")
          .when(col("abnormal_vital_rate") > 0.3, "HIGH_VITAL_ABNORMALITIES")
          .when(col("has_serious_adverse_event"), "SERIOUS_SAFETY_CONCERN")
          .otherwise("NORMAL_PROFILE"))
      .withColumn("participation_quality",
        when(col("data_completeness_score") >= 0.8, "HIGH_QUALITY")
          .when(col("data_completeness_score") >= 0.5, "MEDIUM_QUALITY")
          .otherwise("LOW_QUALITY"))
      .withColumn("record_created_at", runTs)
  }

  /** `dim_study_overview.sql`: second-level aggregate over the subject mart
    * (A13) with exact median (A6 pinned exact per SURVEY §7.3 #1). */
  def dimStudyOverview(outcomes: DataFrame, studyName: String, runTs: Column): DataFrame = {
    val m = outcomes.groupBy(col("dbt_study_id").as("study_id"))
      .agg(
        count(lit(1)).as("total_subjects"),
        countDistinct(col("treatment_arm")).as("treatment_arms_count"),
        count(when(col("sex") === "M", 1)).as("male_subjects"),
        count(when(col("sex") === "F", 1)).as("female_subjects"),
        count(when(col("age_group") === "PEDIATRIC", 1)).as("pediatric_subjects"),
        count(when(col("age_group") === "ADULT", 1)).as("adult_subjects"),
        count(when(col("age_group") === "ELDERLY", 1)).as("elderly_subjects"),
        round(avg(col("age")), 1).as("mean_age"),
        expr("percentile(age, 0.5)").as("median_age"),
        min(col("age")).as("min_age"),
        max(col("age")).as("max_age"),
        sum(col("total_adverse_events")).as("total_adverse_events_study"),
        sum(col("serious_adverse_events")).as("total_serious_aes_study"),
        count(when(col("has_serious_adverse_event"), 1)).as("subjects_with_serious_aes"),
        avg(col("data_completeness_score")).as("avg_data_completeness"),
        count(when(col("participation_quality") === "HIGH_QUALITY", 1))
          .as("high_quality_subjects"),
        count(when(col("participation_quality") === "MEDIUM_QUALITY", 1))
          .as("medium_quality_subjects"),
        count(when(col("participation_quality") === "LOW_QUALITY", 1))
          .as("low_quality_subjects"),
        count(when(col("clinical_profile") === "NORMAL_PROFILE", 1))
          .as("normal_profile_subjects"),
        count(when(col("clinical_profile") === "SERIOUS_SAFETY_CONCERN", 1))
          .as("safety_concern_subjects"),
        count(when(col("clinical_profile") === "MULTIPLE_ABNORMALITIES", 1))
          .as("multiple_abnormalities_subjects"),
        avg(col("max_treatment_duration")).as("avg_treatment_duration"),
        max(col("max_treatment_duration")).as("max_treatment_duration_overall"),
        count(when(col("ongoing_treatments") > 0, 1))
          .as("subjects_with_ongoing_treatment"),
        sum(col("total_lab_tests")).as("total_lab_tests_study"),
        avg(col("abnormal_lab_rate")).as("avg_abnormal_lab_rate"),
        sum(col("total_vital_measurements")).as("total_vital_measurements_study"),
        avg(col("abnormal_vital_rate")).as("avg_abnormal_vital_rate"))
      .withColumn("study_name", lit(studyName))
      .withColumn("analysis_timestamp", runTs)
    val pct = (n: Column) =>
      round(n.cast("double") / col("total_subjects").cast("double") * 100.0, 1)
    m.withColumn("male_percentage", pct(col("male_subjects")))
      .withColumn("female_percentage", pct(col("female_subjects")))
      .withColumn("serious_ae_rate_percent", pct(col("subjects_with_serious_aes")))
      .withColumn("safety_concern_rate_percent", pct(col("safety_concern_subjects")))
      .withColumn("high_quality_rate_percent", pct(col("high_quality_subjects")))
      .withColumn("avg_data_completeness_percent",
        round(col("avg_data_completeness") * 100.0, 1))
      .withColumn("study_status",
        when(col("subjects_with_ongoing_treatment") > 0, "ONGOING")
          .otherwise("COMPLETED"))
      .withColumn("overall_safety_profile",
        when(col("serious_ae_rate_percent") > 20, "HIGH_SAFETY_CONCERN")
          .when(col("serious_ae_rate_percent") > 10, "MODERATE_SAFETY_CONCERN")
          .otherwise("LOW_SAFETY_CONCERN"))
      .withColumn("data_quality_assessment",
        when(col("avg_data_completeness_percent") >= 80, "HIGH_QUALITY_DATA")
          .when(col("avg_data_completeness_percent") >= 60, "MEDIUM_QUALITY_DATA")
          .otherwise("LOW_QUALITY_DATA"))
  }
}
