package graft.standards

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ADaM layer (reference `standards/adam/build_adsl.py:10-27`): ADSL, the
  * subject-level analysis dataset — full DM ⟕ AE counts ⟕ severe-AE
  * counts, zero-filled, plus the severe-AE-proxy `DROPOUT_RISK` flag.
  *
  * Same join shape as `ml.RiskModel.subjectFeatures` (M1) but keeps EVERY
  * DM column (ADSL is the analysis-ready wide table, not a feature
  * frame) and emits the reference's int flag instead of a double label.
  * Scale: two partial-aggregated count joins on the subject key; at
  * 100 TB both sides arrive subject-partitioned from silver, so these
  * joins ride the same bucketed layout as the j2/cp3 spine.
  */
object Adam {

  def buildAdsl(dm: DataFrame, ae: DataFrame): DataFrame = {
    val aeAny = ae.groupBy("STUDYID", "SUBJID")
      .agg(count(lit(1)).as("AE_COUNT"))
    val aeSev = ae.filter(col("AESEV").isin("SEVERE", "SERIOUS"))
      .groupBy("STUDYID", "SUBJID")
      .agg(count(lit(1)).as("SEVERE_AE_COUNT"))
    dm.join(aeAny, Seq("STUDYID", "SUBJID"), "left")
      .join(aeSev, Seq("STUDYID", "SUBJID"), "left")
      .na.fill(0L, Seq("AE_COUNT", "SEVERE_AE_COUNT"))
      .withColumn("DROPOUT_RISK", (col("SEVERE_AE_COUNT") > 0).cast("int"))
  }
}
