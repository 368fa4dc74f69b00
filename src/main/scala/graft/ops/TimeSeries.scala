package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: calendar-spine gap filling. Event data is
  * sparse (days without observations simply have no rows); dashboards,
  * window features, and forecasting inputs need a REGULAR series. The
  * spine is generated per key from its own first..last observation
  * (`sequence` + `explode` — no driver-side calendar), missing days carry
  * the last observed value forward.
  *
  * 100 TB shape: the spine explode is linear in keys × days and stays
  * partitioned by key; the fill is one window per key ordered by day
  * (thousands of small partitions, no global sort). The bounds aggregate
  * is group-cardinality, broadcast back implicitly by the join planner.
  */
object TimeSeries {

  /** One row per `keyCol` per day in [min(dayCol), max(dayCol)] of that
    * key; `valueCol` forward-filled from the last observed day,
    * `is_observed` marks real rows. `dayCol` must be a DATE column of
    * daily-aggregated data (one row per key per observed day). */
  def gapFillDaily(daily: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val spine = daily.groupBy(keyCol)
      .agg(min(col(dayCol)).as("__d0"), max(col(dayCol)).as("__d1"))
      .select(col(keyCol), explode(sequence(col("__d0"), col("__d1"))).as(dayCol))
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(keyCol, dayCol), "left")
      .withColumn("is_observed", col(valueCol).isNotNull)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }
}
