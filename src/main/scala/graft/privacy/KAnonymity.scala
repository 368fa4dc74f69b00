package graft.privacy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-anonymity over quasi-identifier columns — the aggregate-privacy dual
  * of the row-level PHI redaction/tokenization surface (reference
  * `compliance/phi_redaction.py`): a release is k-anonymous when every
  * combination of quasi-identifiers (age band × sex × site…) matches at
  * least k rows, so no individual is isolated by linkage. `report` finds
  * the violating groups; `suppress` nulls the quasi-identifiers of rows
  * in under-k groups (generalize-or-suppress, the standard remediation).
  *
  * Scale shape: one hash aggregation on the quasi-identifier key for the
  * report; suppression is a window count over the same key (small
  * partitions — quasi-identifier groups are bounded by definition, that
  * being the point of k-anonymity).
  */
object KAnonymity {

  /** Group sizes over the quasi-identifier columns with the at-risk flag
    * (`group_size < k`). NULL quasi-identifier values form their own
    * group, as in SQL GROUP BY — absent attributes still link. */
  def report(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(quasi.nonEmpty && k >= 2, "need quasi-identifier columns and k >= 2")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("at_risk", col("group_size") < k)
  }

  /** One-row summary: total rows/groups, the dataset's achieved
    * k-anonymity (min group size), and the at-risk group/row counts. */
  def summary(df: DataFrame, quasi: Seq[String], k: Int): DataFrame =
    report(df, quasi, k).agg(
      sum(col("group_size")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("group_size")).as("k_anonymity"),
      sum(when(col("at_risk"), 1L).otherwise(0L)).as("n_at_risk_groups"),
      sum(when(col("at_risk"), col("group_size")).otherwise(0L)).as("n_at_risk_rows"))

  /** Null out the quasi-identifier columns of every row whose group is
    * smaller than k (row count and all other columns preserved).
    * Suppressed rows merge into one all-NULL group; re-run `report` on
    * the output to confirm that group itself reaches k (it can stay
    * under when very few rows needed suppression — the standard residual
    * a release review checks). */
  def suppress(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(quasi.nonEmpty && k >= 2, "need quasi-identifier columns and k >= 2")
    val size = count(lit(1)).over(Window.partitionBy(quasi.map(col): _*))
    df.select(df.columns.toSeq.map { c =>
      if (quasi.contains(c))
        when(size >= k, col(c)).otherwise(lit(null).cast(df.schema(c).dataType)).as(c)
      else col(c)
    }: _*)
  }
}
