package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One oracle-checked query: a Spark DataFrame program plus (optionally) the
  * ANSI-SQL equivalent the driver runs in DuckDB on the same parquet tables.
  *
  * Exact-match discipline (SURVEY.md §7.3 risk #1):
  *  - every query ends in ORDER BY on a unique key set → identical row order
  *    in both engines;
  *  - double aggregates go through exact DECIMAL sums and a single final
  *    double division / cast, so Spark's parallel partial aggregation and
  *    DuckDB's sequential sum produce bit-identical doubles;
  *  - output columns are only STRING / BIGINT / DOUBLE / DATE / BOOLEAN
  *    (timestamps are formatted to strings: Spark writes parquet timestamps
  *    UTC-adjusted, which DuckDB would read back as TIMESTAMPTZ and
  *    mismatch a naive oracle timestamp).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact sum of a ≤`scale`-decimal double column: cast to decimal, sum
    * (exact, associative → partial-agg safe), cast back to double. Matches
    * DuckDB `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)` bit-for-bit. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Exact mean: exact decimal sum, one double division by the count. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double") / count(c).cast("double")

  /** SQL-side twin of [[dsum]]. */
  def sqlDsum(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** SQL-side twin of [[davg]]. */
  def sqlDavg(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE) / CAST(COUNT($x) AS DOUBLE)"
}
