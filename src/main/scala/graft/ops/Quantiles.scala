package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantile-cutoff bucketing — the scale path for NTILE-style tiering
  * (curriculum buckets, quality tiers, length deciles).
  *
  * `NTILE(n) OVER (ORDER BY v)` is a GLOBAL sort: every row moves through a
  * single partition, which is the canonical 100 TB scale-killer. When exact
  * equal-count tiles aren't required (tiering rarely needs them), the same
  * shape is: one aggregation pass for n−1 quantile cutoffs, broadcast the
  * 1-row cutoff array, and assign `bucket = 1 + #{cutoffs < v}` in a
  * codegen'd scan — no sort, no window, no second shuffle over the data.
  *
  * Two cutoff modes:
  *   - `exact = false` (default, the production path): `approx_percentile`
  *     (Greenwald–Khanna sketch) — mergeable partial aggregate, bounded
  *     memory at any scale; cutoff error ≤ 1/accuracy quantile mass.
  *   - `exact = true`: the exact `percentile` aggregate (type-7 linear
  *     interpolation at rank p·(n−1), same definition as DuckDB
  *     `quantile_cont`) — buffers values on the final reduce, so only for
  *     test-scale oracles and small frames.
  *
  * Tie semantics: every row with the same value lands in the same bucket
  * (unlike NTILE, which splits ties across tiles to force equal counts) —
  * the property you actually want for reproducible tier assignment.
  */
object Quantiles {

  /** Append `bucketCol` ∈ [1, n] assigned by quantile cutoffs of
    * `valueCol`. See object doc for `exact` semantics. */
  def quantileBuckets(df: DataFrame, valueCol: String, n: Int,
      bucketCol: String = "bucket", exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(n >= 2, "need at least 2 buckets")
    val probs = typedlit((1 until n).map(_.toDouble / n))
    val v = col(valueCol).cast("double")
    val cutAgg =
      if (exact) percentile(v, probs)
      else percentile_approx(v, probs, lit(accuracy))
    val cuts = df.agg(cutAgg.cast("array<double>").as("__cuts"))
    // null values get a NULL bucket (the percentile aggregate ignored
    // them when computing cutoffs, so silently assigning them to tier 1
    // would skew the lowest tier's population)
    df.crossJoin(broadcast(cuts))
      .withColumn(bucketCol,
        when(v.isNotNull,
          (lit(1) + size(filter(col("__cuts"), c => c < v))).cast("long")))
      .drop("__cuts")
  }
}
