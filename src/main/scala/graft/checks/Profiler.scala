package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling + numeric anomaly scanning — the data-quality
  * reconnaissance pass a pipeline runs BEFORE declaring a check suite
  * (the reference's GE bootstrap flow: profile first, then pin
  * expectations). Everything is one or two aggregation passes; nothing
  * collects data-sized frames.
  */
object Profiler {

  /** One profile row per column: name, row/null/distinct counts, min/max
    * (stringified so mixed column types share one schema).
    *
    * One aggregation pass over the table computes every column's metrics
    * at once; the per-column rows are then exploded from the single
    * result row (driver-free pivot). `exactDistinct = false` swaps
    * COUNT(DISTINCT) — whose multi-column form expands the input
    * #cols× — for the mergeable HLL sketch; at 100 TB that is the
    * default a profiler wants (counts are reconnaissance, not results).
    *
    * Stringified min/max caveat: cast DOUBLE columns to DECIMAL first if
    * the profile must be engine-portable — double→string formatting is
    * engine-specific, decimal/long/date/string are not. */
  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }

  /** Per-group z-score outlier rate of a numeric column: rows with
    * |x − mean| > `sigmas`·stddev, where mean/stddev derive from EXACT
    * decimal sums (x and x² summed in decimal, one double division /
    * sqrt at the end) — so the result is bit-stable under parallel
    * partial aggregation and engine-portable. Two passes: a group-stats
    * aggregate (broadcast back — group-cardinality rows) and the
    * outlier count. `valueCol` must already be exact (cast to decimal
    * upstream). */
  def zscoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
      sigmas: Double = 3.0): DataFrame = {
    val x = col(valueCol)
    val stats = df.groupBy(groupCol).agg(
      count(lit(1)).as("__n"),
      sum(x).as("__s"),
      sum(x * x).as("__s2"))
    val n = col("__n").cast("double")
    val s = col("__s").cast("double")
    val s2 = col("__s2").cast("double")
    val mean = s / n
    val std = sqrt((s2 - s * s / n) / (n - 1.0))
    // null-safe join: a NULL group key is a real slice (often the dirty
    // one an anomaly scan most needs to see) — an equi-join would
    // silently drop it from the report
    val statsR = stats.withColumnRenamed(groupCol, "__g")
    df.join(broadcast(statsR), col(groupCol) <=> col("__g"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        sum(when(abs(x.cast("double") - mean) > lit(sigmas) * std, 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_rate",
        round(col("n_outliers").cast("double") / col("n").cast("double"), 6))
  }
}
