package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's curated analytics queries (`analytics/queries.py:11-68`)
  * and performance-example windows (`sql/performance_examples.sql`), as
  * DataFrame programs over the star schema built by [[graft.warehouse.Star]].
  */
object ClinicalAnalytics {

  /** `ae_rates_by_arm` (`queries.py:11-31`): severe/serious AE rate per
    * (arm, day-of-month of AE start). NB DuckDB `DATE_PART('day', …)` is
    * day-of-month (SURVEY F5) — `dayofmonth`, not `dayofyear`. */
  def aeRatesByArm(factAe: DataFrame, dimSubject: DataFrame): DataFrame =
    factAe.join(broadcast(dimSubject), Seq("subject_sk"))
      .select(col("arm"), col("severity"),
        dayofmonth(col("ae_start")).as("visit_day"))
      .groupBy("arm", "visit_day")
      .agg(avg(when(col("severity").isin("SEVERE", "SERIOUS"), 1).otherwise(0))
        .as("severe_rate"))
      .orderBy("arm", "visit_day")

  /** `lab_abnormality_rates` (`queries.py:34-48`). */
  def labAbnormalityRates(factLabs: DataFrame, dimSubject: DataFrame): DataFrame =
    factLabs.join(broadcast(dimSubject), Seq("subject_sk"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n"),
        avg(when(col("value") > col("high_norm") || col("value") < col("low_norm"), 1)
          .otherwise(0)).as("abn_rate"))
      .orderBy(col("abn_rate").desc)

  /** `vital_trend_summaries` (`queries.py:51-68`): DuckDB STDDEV = sample
    * stddev → `stddev_samp`. */
  def vitalTrendSummaries(factVitals: DataFrame, dimSubject: DataFrame,
      dimMeasurement: DataFrame): DataFrame =
    factVitals
      .join(broadcast(dimSubject), Seq("subject_sk"))
      .join(broadcast(dimMeasurement), Seq("measurement_sk"))
      .groupBy(col("arm"), col("code").as("vs_code"))
      .agg(avg(col("value")).as("mean_value"),
        stddev_samp(col("value")).as("sd_value"),
        count(lit(1)).as("n"))
      .orderBy("arm", "vs_code")

  /** `sql/performance_examples.sql:4-12`: running AE count per subject. */
  def runningAeCountPerSubject(factAe: DataFrame): DataFrame = {
    val w = Window.partitionBy("subject_sk").orderBy("ae_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    factAe.select(col("subject_sk"), col("ae_start"),
      count(lit(1)).over(w).as("aes_so_far"))
  }

  /** `sql/warehouse_ddl.sql:240-250` view: arm distribution with
    * percent-of-total window over a grouped count (W2). */
  def armDistribution(dimSubject: DataFrame): DataFrame = {
    val grouped = dimSubject.groupBy("arm").agg(count(lit(1)).as("n"))
    grouped.select(col("arm"), col("n"),
      round(col("n").cast("double") * 100.0 /
        sum(col("n")).over(Window.partitionBy()).cast("double"), 1).as("pct"))
      .orderBy("arm")
  }

  /** `ui/dashboard.py:643-647`: arm × category crosstab, row-normalized. */
  def riskCrosstab(outcomes: DataFrame): DataFrame = {
    val counts = outcomes.groupBy("treatment_arm", "safety_risk_category")
      .agg(count(lit(1)).as("n"))
    counts.withColumn("share",
      col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("treatment_arm")).cast("double"))
      .orderBy("treatment_arm", "safety_risk_category")
  }

  /** `api/endpoints.py:373-390`: subject browse — boolean-mask filters +
    * deterministic pagination (P7/P8). */
  def subjectPage(outcomes: DataFrame, arm: Option[String], riskCategory: Option[String],
      minAge: Option[Int], offset: Int, limit: Int): DataFrame = {
    val filtered = Seq(
      arm.map(a => col("treatment_arm") === a),
      riskCategory.map(r => col("safety_risk_category") === r),
      minAge.map(a => col("age") >= a))
      .flatten.foldLeft(outcomes)((df, p) => df.filter(p))
    filtered.orderBy("subjid").offset(offset).limit(limit)
  }
}
