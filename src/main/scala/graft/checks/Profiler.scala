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
    * Two plan shapes, both driver-free:
    *  - `exactDistinct = false` (the 100 TB default — counts are
    *    reconnaissance, not results): ONE aggregation pass computes every
    *    column's metrics with mergeable HLL sketches, then the per-column
    *    rows are exploded from the single result row.
    *  - `exactDistinct = true` (the oracle-gated shape): one
    *    single-distinct aggregate PER COLUMN, unioned. Multiple exact
    *    COUNT(DISTINCT)s in one aggregate force Catalyst's Expand —
    *    input replicated (#cols+1)× through the first aggregate and the
    *    expanded distinct keys shuffled — while each single-distinct
    *    branch plans the cheap two-phase partial-distinct over a
    *    column-pruned scan (total parquet bytes unchanged: each branch
    *    reads only its column). Measured at sf0.1: 2.38 s (Expand) →
    *    0.87 s (union), exact values identical.
    *
    * Stringified min/max caveat: cast DOUBLE columns to DECIMAL first if
    * the profile must be engine-portable — double→string formatting is
    * engine-specific, decimal/long/date/string are not. */
  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    if (exactDistinct) {
      cols.map { c =>
        df.select(col(c)).agg(
          count(lit(1)).as("__n"),
          count(col(c)).as("__nn"),
          countDistinct(col(c)).as("__nd"),
          min(col(c)).cast("string").as("__min"),
          max(col(c)).cast("string").as("__max"))
          .select(lit(c).as("col_name"),
            col("__n").as("n_rows"),
            (col("__n") - col("__nn")).as("n_null"),
            col("__nd").as("n_distinct"),
            col("__min").as("min_value"),
            col("__max").as("max_value"))
      }.reduce(_ unionByName _)
    } else {
      val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
        Seq(
          count(col(c)).as(s"__nn_$c"),
          approx_count_distinct(col(c)).as(s"__nd_$c"),
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
