package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical tests (SURVEY.md F15, reference `analytics/stats_utils.py`):
  * Welch's t with a normal-approximation p-value and Pearson χ² with the
  * Wilson–Hilferty p-value approximation. The group moments are computed
  * distributed (one aggregation pass); only the final scalar math runs on
  * tiny aggregate frames.
  */
object Stats {

  /** Std-normal CDF via erf (Abramowitz–Stegun 7.1.26 polynomial — the
    * standard public approximation; the reference uses math.erf). */
  def normalCdf(z: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * abs(z) / sqrt(lit(2.0)))
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) + t *
      (lit(1.421413741) + t * (lit(-1.453152027) + t * lit(1.061405429)))))
    val x = abs(z) / sqrt(lit(2.0))
    val erf = lit(1.0) - poly * exp(-x * x)
    lit(0.5) * (lit(1.0) + when(z >= 0, erf).otherwise(-erf))
  }

  /** Welch t-test (`stats_utils.py:9-23`): per-group n/mean/var in one
    * pass, then t = (m1−m2)/√(v1/n1 + v2/n2) and a two-sided
    * normal-approximation p-value. Returns one row:
    * (n1, n2, mean1, mean2, t_stat, p_value). */
  def welchT(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    val moments = df
      .filter(col(groupCol).isin(groupA, groupB))
      .groupBy(groupCol)
      .agg(count(lit(1)).cast("double").as("n"),
        avg(col(valueCol)).as("m"),
        var_samp(col(valueCol)).as("v"))
    val a = moments.filter(col(groupCol) === groupA)
      .select(col("n").as("n1"), col("m").as("m1"), col("v").as("v1"))
    val b = moments.filter(col(groupCol) === groupB)
      .select(col("n").as("n2"), col("m").as("m2"), col("v").as("v2"))
    val se = sqrt(col("v1") / col("n1") + col("v2") / col("n2"))
    // stats_utils.py:20 — t = 0.0 if se == 0 (constant-valued groups)
    val t = when(se === 0, lit(0.0)).otherwise((col("m1") - col("m2")) / se)
    a.crossJoin(b).select(
      col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
      col("m1").as("mean1"), col("m2").as("mean2"),
      t.as("t_stat"),
      (lit(2.0) * (lit(1.0) - normalCdf(abs(t)))).as("p_value"))
  }

  /** Pearson χ² over the DENSE r×c contingency table
    * (`stats_utils.py:26-41`): the reference operates on a full matrix, so
    * zero-count cells still contribute (0−e)²/e = e. We materialize the
    * dense cell grid as distinct-rows × distinct-cols (cross join of two
    * tiny aggregate frames) and left-join the observed counts with
    * coalesce(o, 0). Expected = row_total·col_total/grand_total,
    * χ² = Σ (o−e)²/e, p via Wilson–Hilferty cube-root normal approx,
    * two-sided like the reference: p = 2·(1 − Φ(|z|)), with z = 0 when
    * dof = 0 (stats_utils.py:39). */
  def chiSquare(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    // Rows with a NULL category are excluded up front (standard
    // contingency-table practice, and what pandas crosstab does in the
    // reference): a null group would contribute to the marginals but the
    // null-unsafe dense-grid join could never match it back, silently
    // inflating χ² by its full expected mass.
    val obs = df.filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .groupBy(rowCol, colCol).agg(count(lit(1)).cast("double").as("o"))
    val rowTot = obs.groupBy(rowCol).agg(sum(col("o")).as("rt"))
    val colTot = obs.groupBy(colCol).agg(sum(col("o")).as("ct"))
    val grand = obs.agg(sum(col("o")).as("gt"))
    val cells = rowTot.crossJoin(colTot)
      .join(obs, Seq(rowCol, colCol), "left")
      .crossJoin(grand)
      .withColumn("e", col("rt") * col("ct") / col("gt"))
      .withColumn("contrib", pow(coalesce(col("o"), lit(0.0)) - col("e"), 2) / col("e"))
    val dims = cells.agg(
      sum(col("contrib")).as("chi2"),
      countDistinct(col(rowCol)).cast("double").as("r"),
      countDistinct(col(colCol)).cast("double").as("c"))
    val dof = (col("r") - 1) * (col("c") - 1)
    // Wilson–Hilferty: (χ²/k)^(1/3) ≈ N(1 − 2/(9k), 2/(9k))
    val z = when(dof > 0,
      (pow(col("chi2") / dof, 1.0 / 3.0) - (lit(1.0) - lit(2.0) / (lit(9.0) * dof))) /
        sqrt(lit(2.0) / (lit(9.0) * dof))).otherwise(lit(0.0))
    dims.select(col("chi2"), dof.cast("long").as("dof"),
      (lit(2.0) * (lit(1.0) - normalCdf(abs(z)))).as("p_value"))
  }
}
