package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` bridge the library needs: materialize a Dataset
  * from a hand-built logical plan (for the custom operators under
  * `graft.plans`). Standard extension-library technique — the object lives
  * in the `org.apache.spark.sql` package purely for access, everything
  * else stays in `graft.*`.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
