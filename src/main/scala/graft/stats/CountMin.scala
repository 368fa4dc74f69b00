package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as pure relational
  * arithmetic: d pairwise-independent hash rows h_i(x) = ((a_i·x + b_i)
  * mod p) mod w over the Mersenne prime p = 2³¹−1, cell counts by
  * group-by, and the point estimate `min_i cell(i, h_i(x))`. The sketch
  * guarantees est ≥ true always, and est ≤ true + εN with probability
  * 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Because the hash parameters are FIXED integers and every step is
  * BIGINT arithmetic, the entire sketch — cells and estimates — is
  * deterministic and replayable in ANSI SQL, so the estimates themselves
  * sit under the cross-engine hash gate (stronger than the usual
  * contract-only gate for randomized sketches; the a_i/b_i here are
  * arbitrary fixed odd constants, not per-run randomness).
  *
  * Scale: building the sketch is ONE map-side-combinable group-by over
  * (i, bucket) — d·w cells total (a few KB) regardless of input size —
  * the textbook mergeable-summary shape: per-partition sketches combine
  * by cell-wise addition, which is exactly what partial aggregation
  * does here. Point queries join the k probe keys (broadcast) against
  * the tiny cell table.
  */
object CountMin {

  val P: Long = 2147483647L // 2^31 − 1, Mersenne prime

  /** Fixed odd multipliers/offsets for the d hash rows. */
  val Params: Seq[(Int, Long, Long)] = Seq(
    (0, 1000003L, 12345L),
    (1, 999983L, 54321L),
    (2, 777767L, 98765L),
    (3, 333667L, 13579L))

  private def paramsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Params.toDF("i", "a", "b")
  }

  /** Cell counts (i, bucket, c) for the sketch of `keys` (one BIGINT
    * column `k`, one row per occurrence) at width `w`. */
  def cells(spark: SparkSession, keys: DataFrame, w: Int): DataFrame =
    keys.crossJoin(broadcast(paramsDf(spark)))
      .select(col("i"),
        expr(s"((a * k + b) % ${P}L) % ${w}L").as("bucket"))
      .groupBy("i", "bucket").agg(count(lit(1)).as("c"))

  /** Point estimates for `probes` (one BIGINT column `k`, distinct):
    * (k, est) with est = min_i cell(i, h_i(k)); absent cells read 0 —
    * unseen keys estimate 0 unless all d cells collide. */
  def estimate(spark: SparkSession, cellsDf: DataFrame,
      probes: DataFrame, w: Int): DataFrame =
    probes.crossJoin(broadcast(paramsDf(spark)))
      .select(col("k"), col("i"),
        expr(s"((a * k + b) % ${P}L) % ${w}L").as("bucket"))
      .join(cellsDf, Seq("i", "bucket"), "left")
      .groupBy("k").agg(min(coalesce(col("c"), lit(0L))).as("est"))
}
