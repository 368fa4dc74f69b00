package graft.standards

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic seeded SDTM data generator (SURVEY.md S12; reference
  * `scripts/generate_synthetic_data.py:11-123`): same seed ⇒ identical
  * frames (the reference asserts frame-equality across runs,
  * `tests/test_public_cdm_smoke.py:279-296`).
  *
  * Implementation is pure column expressions over `spark.range(n)` — the
  * per-row PRNG is `xxhash64(seed, stream, id)`, so generation distributes
  * across executors with no driver-side loop and no RNG state.
  */
object SyntheticSdtm {

  private def h(seed: Long, stream: String, id: Column): Column =
    pmod(xxhash64(lit(seed), lit(stream), id), lit(1000000L))

  /** Uniform double in [0,1) from the hash stream. */
  private def u(seed: Long, stream: String, id: Column): Column =
    h(seed, stream, id).cast("double") / 1000000.0

  private def subjid(id: Column): Column =
    concat(lit("SUBJ"), lpad(id.cast("string"), 4, "0"))

  private val study = "STUDY001"
  private val baseDate = "2024-01-01"

  /** DM: one row per subject; ARM ∈ {PLACEBO, ACTIVE, null}, SEX ∈
    * {M, F, U, null} with one seeded invalid 'X' at row 0 (FIXTURES.md A),
    * AGE ∈ [18, 85]. */
  def dm(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val id = col("id")
    spark.range(n).select(
      lit(study).as("STUDYID"),
      subjid(id).as("SUBJID"),
      when(u(seed, "arm", id) < 0.45, "PLACEBO")
        .when(u(seed, "arm", id) < 0.9, "ACTIVE").as("ARM"),
      when(id === 0, "X")
        .when(u(seed, "sex", id) < 0.45, "M")
        .when(u(seed, "sex", id) < 0.9, "F")
        .when(u(seed, "sex", id) < 0.95, "U").as("SEX"),
      (floor(u(seed, "age", id) * 68) + 18).cast("double").as("AGE"))
  }

  /** AE: 0–3 rows/subject; start = base + 0–60 d, end = start + 0–10 d or
    * null (ongoing); AESEV ∈ {MILD, MODERATE, SEVERE, SERIOUS, null};
    * AESER nullable boolean; AEOUT ∈ {RECOVERED, RECOVERING,
    * NOT RECOVERED, null}. */
  def ae(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val id = col("id")
    val subjects = spark.range(n).select(id,
      floor(u(seed, "naes", id) * 4).cast("int").as("n_aes"))
    // sequence(1, 0) is the DESCENDING array [1, 0], not empty — without
    // the filter every 0-AE subject would get two phantom rows (same trap
    // Omop.conditionOccurrence guards at Omop.scala:80)
    val rows = subjects.filter(col("n_aes") > 0)
      .select(id, explode(sequence(lit(1), col("n_aes"))).as("k"))
    val rid = concat(col("id"), lit("_"), col("k"))
    val start = date_add(to_date(lit(baseDate)),
      floor(u(seed, "aest", rid) * 61).cast("int"))
    rows.select(
      lit(study).as("STUDYID"),
      subjid(id).as("SUBJID"),
      start.cast("timestamp").as("AESTDTC"),
      when(u(seed, "ongoing", rid) < 0.8,
        date_add(start, floor(u(seed, "aedur", rid) * 11).cast("int"))
          .cast("timestamp")).as("AEENDTC"),
      when(u(seed, "sev", rid) < 0.4, "MILD")
        .when(u(seed, "sev", rid) < 0.7, "MODERATE")
        .when(u(seed, "sev", rid) < 0.85, "SEVERE")
        .when(u(seed, "sev", rid) < 0.95, "SERIOUS").as("AESEV"),
      when(u(seed, "ser", rid) < 0.8, u(seed, "serv", rid) < 0.2).as("AESER"),
      when(u(seed, "out", rid) < 0.5, "RECOVERED")
        .when(u(seed, "out", rid) < 0.75, "RECOVERING")
        .when(u(seed, "out", rid) < 0.9, "NOT RECOVERED").as("AEOUT"))
  }

  /** LB: 3 rows/subject (ALT, AST, CREAT) with unit + normal range;
    * result uniform in [0.5·lo, 1.8·hi]. */
  def lb(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val tests = Seq(("ALT", 7.0, 56.0, "U/L"), ("AST", 10.0, 40.0, "U/L"),
      ("CREAT", 0.6, 1.2, "mg/dL"))
    val id = col("id")
    val testDf = tests.zipWithIndex.map { case ((code, lo, hi, unit), i) =>
      spark.range(n).select(
        lit(study).as("STUDYID"), subjid(id).as("SUBJID"),
        lit(code).as("LBTESTCD"),
        when(u(seed, s"lb$i", id) < 0.97,
          round((lit(0.5 * lo) + u(seed, s"lbv$i", id) * (1.8 * hi - 0.5 * lo))
            .cast("double"), 2)).as("LBORRES"),
        lit(unit).as("LBORRESU"),
        lit(lo).as("LBLNOR"), lit(hi).as("LBHNOR"))
    }
    testDf.reduce(_ unionByName _)
  }

  /** VS: 2 rows/subject (HR bpm, SBP mmHg → code SYSBP for the staging
    * flags to fire). */
  def vs(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val id = col("id")
    val hr = spark.range(n).select(
      lit(study).as("STUDYID"), subjid(id).as("SUBJID"),
      lit("HR").as("VSTESTCD"),
      round(lit(45.0) + u(seed, "hr", id) * 75.0, 1).as("VSORRES"),
      lit("bpm").as("VSORRESU"))
    val sbp = spark.range(n).select(
      lit(study).as("STUDYID"), subjid(id).as("SUBJID"),
      lit("SYSBP").as("VSTESTCD"),
      round(lit(85.0) + u(seed, "sbp", id) * 100.0, 1).as("VSORRES"),
      lit("mmHg").as("VSORRESU"))
    hr.unionByName(sbp)
  }

  /** EX: ≤1 row/subject, only when ARM is non-null; EXTRT = ARM value. */
  def ex(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val base = dm(spark, n, seed).filter(col("ARM").isNotNull)
      .select(col("STUDYID"), col("SUBJID"), col("ARM"))
    val rid = col("SUBJID")
    val start = date_add(to_date(lit(baseDate)),
      pmod(xxhash64(lit(seed), lit("exst"), rid), lit(30L)).cast("int"))
    base.select(
      col("STUDYID"), col("SUBJID"),
      col("ARM").as("EXTRT"),
      when(pmod(xxhash64(lit(seed), lit("dose?"), rid), lit(10L)) < 9,
        round((pmod(xxhash64(lit(seed), lit("dose"), rid), lit(9000L))
          .cast("double") / 100.0 + 10.0), 2)).as("EXDOSE"),
      start.cast("timestamp").as("EXSTDTC"),
      when(pmod(xxhash64(lit(seed), lit("exend?"), rid), lit(10L)) < 8,
        date_add(start, pmod(xxhash64(lit(seed), lit("exdur"), rid), lit(60L))
          .cast("int")).cast("timestamp")).as("EXENDTC"))
  }

  /** All five domains keyed by domain code (DOMAIN_MAPPERS shape). */
  def allDomains(spark: SparkSession, n: Int, seed: Long = 42L): Map[String, DataFrame] =
    Map("DM" -> dm(spark, n, seed), "AE" -> ae(spark, n, seed),
      "LB" -> lb(spark, n, seed), "VS" -> vs(spark, n, seed),
      "EX" -> ex(spark, n, seed))
}
