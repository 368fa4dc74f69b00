package graft.standards

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDISC SDTM domain schemas, mappers and staging derivations.
  *
  * Faithful Spark re-expression of:
  *  - domain select/rename/coerce mappers (reference
  *    `standards/cdisc_sdtm_mapping.py:13-94`),
  *  - the dbt staging models (`dbt/clinical_dbt/models/staging/stg_*.sql`)
  *    and the clinical_utils macros (`macros/clinical_utils.sql:3-108`),
  *    which are the canonical bucketing spec (SURVEY.md F3).
  *
  * Everything is a pure `DataFrame => DataFrame` / `Column` function —
  * no SQL strings, fully codegen'd, pushdown-friendly.
  */
object Sdtm {

  /** The five SDTM domains of the reference (DOMAIN_MAPPERS,
    * `cdisc_sdtm_mapping.py:88-94`). */
  val Domains: Seq[String] = Seq("DM", "AE", "LB", "VS", "EX")

  // ---- §1.2 declared schemas (standards/sdtm_schemas/*.json, FIXTURES.md A)

  val dmSchema: StructType = StructType(Seq(
    StructField("STUDYID", StringType, nullable = false),
    StructField("SUBJID", StringType, nullable = false),
    StructField("ARM", StringType),
    StructField("SEX", StringType),
    StructField("AGE", DoubleType)))

  val aeSchema: StructType = StructType(Seq(
    StructField("STUDYID", StringType, nullable = false),
    StructField("SUBJID", StringType, nullable = false),
    StructField("AESTDTC", TimestampType),
    StructField("AEENDTC", TimestampType),
    StructField("AESEV", StringType),
    StructField("AESER", BooleanType),
    StructField("AEOUT", StringType)))

  val lbSchema: StructType = StructType(Seq(
    StructField("STUDYID", StringType, nullable = false),
    StructField("SUBJID", StringType, nullable = false),
    StructField("LBTESTCD", StringType, nullable = false),
    StructField("LBORRES", DoubleType),
    StructField("LBORRESU", StringType),
    StructField("LBLNOR", DoubleType),
    StructField("LBHNOR", DoubleType)))

  val vsSchema: StructType = StructType(Seq(
    StructField("STUDYID", StringType, nullable = false),
    StructField("SUBJID", StringType, nullable = false),
    StructField("VSTESTCD", StringType, nullable = false),
    StructField("VSORRES", DoubleType),
    StructField("VSORRESU", StringType)))

  val exSchema: StructType = StructType(Seq(
    StructField("STUDYID", StringType, nullable = false),
    StructField("SUBJID", StringType, nullable = false),
    StructField("EXTRT", StringType),
    StructField("EXDOSE", DoubleType),
    StructField("EXSTDTC", TimestampType),
    StructField("EXENDTC", TimestampType)))

  val schemas: Map[String, StructType] = Map(
    "DM" -> dmSchema, "AE" -> aeSchema, "LB" -> lbSchema,
    "VS" -> vsSchema, "EX" -> exSchema)

  // ---- §2.2 domain mappers: fixed column list + null-on-failure coercion

  private def s(c: String): Column = col(c).cast(StringType)
  private def num(c: String): Column = expr(s"try_cast($c AS DOUBLE)").as(c)
  private def ts(c: String): Column = expr(s"try_cast($c AS TIMESTAMP)").as(c)
  private def bool(c: String): Column = expr(s"try_cast($c AS BOOLEAN)").as(c)

  /** DM mapper (`cdisc_sdtm_mapping.py:13-24`). */
  def mapDm(raw: DataFrame): DataFrame =
    raw.select(s("STUDYID").as("STUDYID"), s("SUBJID").as("SUBJID"),
      s("ARM").as("ARM"), s("SEX").as("SEX"), num("AGE"))

  /** AE mapper (`cdisc_sdtm_mapping.py:26-43`): timestamps + nullable
    * boolean AESER (SURVEY §7.3 risk #3). */
  def mapAe(raw: DataFrame): DataFrame =
    raw.select(s("STUDYID").as("STUDYID"), s("SUBJID").as("SUBJID"),
      ts("AESTDTC"), ts("AEENDTC"), s("AESEV").as("AESEV"),
      bool("AESER"), s("AEOUT").as("AEOUT"))

  /** LB mapper (`cdisc_sdtm_mapping.py:45-60`). */
  def mapLb(raw: DataFrame): DataFrame =
    raw.select(s("STUDYID").as("STUDYID"), s("SUBJID").as("SUBJID"),
      s("LBTESTCD").as("LBTESTCD"), num("LBORRES"),
      s("LBORRESU").as("LBORRESU"), num("LBLNOR"), num("LBHNOR"))

  /** VS mapper (`cdisc_sdtm_mapping.py:62-71`). */
  def mapVs(raw: DataFrame): DataFrame =
    raw.select(s("STUDYID").as("STUDYID"), s("SUBJID").as("SUBJID"),
      s("VSTESTCD").as("VSTESTCD"), num("VSORRES"), s("VSORRESU").as("VSORRESU"))

  /** EX mapper (`cdisc_sdtm_mapping.py:73-86`). */
  def mapEx(raw: DataFrame): DataFrame =
    raw.select(s("STUDYID").as("STUDYID"), s("SUBJID").as("SUBJID"),
      s("EXTRT").as("EXTRT"), num("EXDOSE"), ts("EXSTDTC"), ts("EXENDTC"))

  val mappers: Map[String, DataFrame => DataFrame] = Map(
    "DM" -> mapDm, "AE" -> mapAe, "LB" -> mapLb, "VS" -> mapVs, "EX" -> mapEx)

  // ---- clinical_utils macros as Column functions (the F3 bucketing spec)

  /** `categorize_age` (`clinical_utils.sql:3-10`). */
  def ageGroup(age: Column): Column =
    when(age < 18, "PEDIATRIC")
      .when(age >= 18 && age < 65, "ADULT")
      .when(age >= 65, "ELDERLY")
      .otherwise("UNKNOWN")

  /** `flag_abnormal_vital` + TEMP branch (`stg_vital_signs.sql:19-55`). */
  def vitalClinicalFlag(testCode: Column, v: Column): Column =
    when(testCode === "SYSBP" && v.isNotNull,
      when(v < 90, "HYPOTENSIVE").when(v >= 90 && v < 140, "NORMAL")
        .when(v >= 140 && v < 180, "HYPERTENSIVE").when(v >= 180, "SEVERE_HYPERTENSIVE")
        .otherwise("UNKNOWN"))
      .when(testCode === "DIABP" && v.isNotNull,
        when(v < 60, "HYPOTENSIVE").when(v >= 60 && v < 90, "NORMAL")
          .when(v >= 90 && v < 110, "HYPERTENSIVE").when(v >= 110, "SEVERE_HYPERTENSIVE")
          .otherwise("UNKNOWN"))
      .when(testCode === "HR" && v.isNotNull,
        when(v < 60, "BRADYCARDIA").when(v >= 60 && v <= 100, "NORMAL")
          .when(v > 100, "TACHYCARDIA").otherwise("UNKNOWN"))
      .when(testCode === "TEMP" && v.isNotNull,
        when(v < 36.1, "HYPOTHERMIA").when(v >= 36.1 && v <= 37.2, "NORMAL")
          .when(v > 37.2 && v <= 38.0, "LOW_FEVER").when(v > 38.0, "HIGH_FEVER")
          .otherwise("UNKNOWN"))
      .otherwise("N/A")

  /** `lab_result_flag` (`clinical_utils.sql:66-76`). */
  def labResultFlag(v: Column, lo: Column, hi: Column): Column =
    when(v.isNull, "MISSING")
      .when(lo.isNotNull && v < lo, "LOW")
      .when(hi.isNotNull && v > hi, "HIGH")
      .when(lo.isNotNull && hi.isNotNull && v >= lo && v <= hi, "NORMAL")
      .otherwise("UNKNOWN")

  /** `normalize_lab_result` (`clinical_utils.sql:57-63`). */
  def normalizedLabResult(v: Column, lo: Column, hi: Column): Column =
    when(lo.isNotNull && hi.isNotNull && v.isNotNull, (v - lo) / (hi - lo))

  /** `safety_risk_category` (`clinical_utils.sql:49-55`). */
  def safetyRiskCategory(totalAes: Column, seriousAes: Column, severeAes: Column): Column =
    when(seriousAes > 0 || severeAes > 0, "HIGH_RISK")
      .when(totalAes > 5, "MEDIUM_RISK")
      .when(totalAes > 0, "LOW_RISK")
      .otherwise("NO_EVENTS")

  /** `calculate_days_between` (`clinical_utils.sql:41-47`). */
  def daysBetween(start: Column, end: Column): Column =
    when(start.isNotNull && end.isNotNull,
      datediff(end.cast(DateType), start.cast(DateType)))

  // ---- dbt staging models (each = one view-shaped DataFrame function)

  /** `stg_demographics.sql` (study filter pushed to the scan → P4). */
  def stgDemographics(dm: DataFrame, studyId: String, runTs: Column): DataFrame =
    dm.filter(col("STUDYID") === studyId)
      .select(
        col("STUDYID").as("studyid"), col("SUBJID").as("subjid"),
        coalesce(col("ARM"), lit("UNKNOWN")).as("treatment_arm"),
        upper(coalesce(col("SEX"), lit("U"))).as("sex"),
        col("AGE").as("age"),
        ageGroup(col("AGE")).as("age_group"),
        when(col("SEX") === "M", "MALE").when(col("SEX") === "F", "FEMALE")
          .otherwise("UNKNOWN").as("sex_desc"),
        runTs.as("dbt_updated_at"), lit(studyId).as("dbt_study_id"))

  /** AE ongoing flag (`stg_adverse_events.sql:27-30`): no end date and the
    * (coalesced) outcome is not FATAL. */
  def aeIsOngoing(aeendtc: Column, aeout: Column): Column =
    when(aeendtc.isNull &&
      !(upper(coalesce(aeout, lit("UNKNOWN"))) === "FATAL"), true)
      .otherwise(false)

  /** AE severity rank (`stg_adverse_events.sql:32-37`). */
  def aeSeverityRank(aesev: Column): Column =
    when(aesev === "MILD", 1).when(aesev === "MODERATE", 2)
      .when(aesev === "SEVERE", 3).otherwise(0)

  /** `stg_adverse_events.sql`. */
  def stgAdverseEvents(ae: DataFrame, studyId: String, runTs: Column): DataFrame =
    ae.filter(col("STUDYID") === studyId)
      .select(
        col("STUDYID").as("studyid"), col("SUBJID").as("subjid"),
        col("AESTDTC").as("aestdtc"), col("AEENDTC").as("aeendtc"),
        upper(coalesce(col("AESEV"), lit("UNKNOWN"))).as("severity"),
        coalesce(col("AESER"), lit(false)).as("is_serious"),
        upper(coalesce(col("AEOUT"), lit("UNKNOWN"))).as("outcome"),
        daysBetween(col("AESTDTC"), col("AEENDTC")).as("duration_days"),
        aeIsOngoing(col("AEENDTC"), col("AEOUT")).as("is_ongoing"),
        aeSeverityRank(col("AESEV")).as("severity_rank"),
        runTs.as("dbt_updated_at"), lit(studyId).as("dbt_study_id"))

  /** `stg_laboratory.sql`. */
  def stgLaboratory(lb: DataFrame, studyId: String, runTs: Column): DataFrame =
    lb.filter(col("STUDYID") === studyId)
      .select(
        col("STUDYID").as("studyid"), col("SUBJID").as("subjid"),
        upper(col("LBTESTCD")).as("test_code"),
        col("LBORRES").as("result_value"),
        upper(coalesce(col("LBORRESU"), lit("UNKNOWN"))).as("result_unit"),
        col("LBLNOR").as("normal_low"), col("LBHNOR").as("normal_high"),
        labResultFlag(col("LBORRES"), col("LBLNOR"), col("LBHNOR")).as("result_flag"),
        normalizedLabResult(col("LBORRES"), col("LBLNOR"), col("LBHNOR"))
          .as("normalized_result"),
        when(col("LBTESTCD").isin("ALT", "AST", "BILI", "ALP"), "LIVER_FUNCTION")
          .when(col("LBTESTCD").isin("CREAT", "BUN", "UREA"), "KIDNEY_FUNCTION")
          .when(col("LBTESTCD").isin("HGB", "HCT", "RBC", "WBC", "PLT"), "HEMATOLOGY")
          .when(col("LBTESTCD").isin("GLUC", "HBA1C"), "GLUCOSE_METABOLISM")
          .when(col("LBTESTCD").isin("CHOL", "LDL", "HDL", "TRIG"), "LIPID_PANEL")
          .otherwise("OTHER").as("test_category"),
        runTs.as("dbt_updated_at"), lit(studyId).as("dbt_study_id"))

  /** `stg_vital_signs.sql`. */
  def stgVitalSigns(vs: DataFrame, studyId: String, runTs: Column): DataFrame =
    vs.filter(col("STUDYID") === studyId)
      .select(
        col("STUDYID").as("studyid"), col("SUBJID").as("subjid"),
        upper(col("VSTESTCD")).as("test_code"),
        col("VSORRES").as("result_value"),
        upper(coalesce(col("VSORRESU"), lit("UNKNOWN"))).as("result_unit"),
        vitalClinicalFlag(col("VSTESTCD"), col("VSORRES")).as("clinical_flag"),
        when(col("VSTESTCD").isin("SYSBP", "DIABP"), "BLOOD_PRESSURE")
          .when(col("VSTESTCD") === "HR", "HEART_RATE")
          .when(col("VSTESTCD") === "TEMP", "TEMPERATURE")
          .when(col("VSTESTCD") === "WEIGHT", "WEIGHT")
          .when(col("VSTESTCD") === "HEIGHT", "HEIGHT")
          .when(col("VSTESTCD") === "RESP", "RESPIRATORY_RATE")
          .otherwise("OTHER").as("vital_category"),
        when(col("VSTESTCD") === "SYSBP", "Systolic Blood Pressure")
          .when(col("VSTESTCD") === "DIABP", "Diastolic Blood Pressure")
          .when(col("VSTESTCD") === "HR", "Heart Rate")
          .when(col("VSTESTCD") === "TEMP", "Temperature")
          .when(col("VSTESTCD") === "WEIGHT", "Weight")
          .when(col("VSTESTCD") === "HEIGHT", "Height")
          .when(col("VSTESTCD") === "RESP", "Respiratory Rate")
          .otherwise(col("VSTESTCD")).as("test_description"),
        runTs.as("dbt_updated_at"), lit(studyId).as("dbt_study_id"))

  /** `stg_exposure.sql`. */
  def stgExposure(ex: DataFrame, studyId: String, runTs: Column): DataFrame =
    ex.filter(col("STUDYID") === studyId)
      .select(
        col("STUDYID").as("studyid"), col("SUBJID").as("subjid"),
        upper(coalesce(col("EXTRT"), lit("UNKNOWN"))).as("treatment_name"),
        col("EXDOSE").as("dose_amount"),
        col("EXSTDTC").as("start_date"), col("EXENDTC").as("end_date"),
        (daysBetween(col("EXSTDTC"), col("EXENDTC")) + 1).as("treatment_duration_days"),
        when(col("EXENDTC").isNull, true).otherwise(false).as("is_ongoing_treatment"),
        when(lower(col("EXTRT")).like("%placebo%"), "PLACEBO")
          .when(lower(col("EXTRT")).like("%active%") ||
            lower(col("EXTRT")).like("%drug%"), "ACTIVE_TREATMENT")
          .when(col("EXTRT").isNull, "UNKNOWN")
          .otherwise("OTHER").as("treatment_category"),
        when(col("EXDOSE").isNull, "UNKNOWN")
          .when(col("EXDOSE") === 0, "ZERO_DOSE")
          .when(col("EXDOSE") > 0 && col("EXDOSE") <= 10, "LOW_DOSE")
          .when(col("EXDOSE") > 10 && col("EXDOSE") <= 100, "MEDIUM_DOSE")
          .when(col("EXDOSE") > 100, "HIGH_DOSE")
          .otherwise("UNKNOWN").as("dose_category"),
        when(col("EXSTDTC").isNotNull && col("EXENDTC").isNotNull, "COMPLETED")
          .when(col("EXSTDTC").isNotNull && col("EXENDTC").isNull, "ONGOING")
          .when(col("EXSTDTC").isNull, "NOT_STARTED")
          .otherwise("UNKNOWN").as("treatment_status"),
        runTs.as("dbt_updated_at"), lit(studyId).as("dbt_study_id"))
}
