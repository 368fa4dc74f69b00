package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Deterministic, engine-portable sampling / split assignment for
  * training-data pipelines.
  *
  * `rand()`-based splits change membership whenever the run, partitioning,
  * or cluster size changes — poison for reproducible training sets and
  * for dedup-after-split guarantees. Hash-based assignment gives every
  * row a stable bucket derived only from its id: the same doc lands in
  * the same split on every engine, every run, at every scale, and adding
  * data never reshuffles existing assignments. (Same portable 60-bit md5
  * scheme as the MinHash/fingerprint operators — `TextFunctions.hash60`;
  * DuckDB twin `CAST(('0x' || substr(md5(seed||'|'||id),1,15)) AS BIGINT)`.)
  */
object Sampling {

  /** Stable bucket in [0, granularity) from (seed, id). A NULL id hashes
    * like the empty string — ONE deterministic bucket, identical across
    * `splitColumn` and `hashSample` (without the coalesce the two APIs
    * disagreed: splits routed null ids to the last label while sampling
    * silently dropped them). Callers wanting nulls distributed should
    * assign real ids first. */
  def bucket(id: Column, seed: Int, granularity: Int = 10000): Column =
    pmod(TextFunctions.hash60(coalesce(id.cast("string"), lit("")), seed),
      lit(granularity.toLong))

  /** Split assignment from cumulative fractions, e.g.
    * `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)` (must sum to 1;
    * the last label absorbs the remainder so rounding can't drop rows). */
  def splitColumn(id: Column, cuts: Seq[(String, Double)], seed: Int = 7,
      granularity: Int = 10000): Column = {
    require(cuts.size >= 2 && math.abs(cuts.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val b = bucket(id, seed, granularity)
    val thresholds = cuts.init.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * granularity))
    cuts.init.zip(thresholds)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cut)) =>
        Some(acc.fold(when(b < cut, name))(_.when(b < cut, name)))
      }.get.otherwise(cuts.last._1)
  }

  /** Deterministic fractional sample: keep rows whose bucket falls below
    * fraction·granularity. Supersets nest: a 1% sample is contained in
    * the 10% sample at the same seed — handy for scale-up experiments. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Int = 7, granularity: Int = 10000): DataFrame =
    df.filter(bucket(col(idCol), seed, granularity) <
      math.round(fraction * granularity))
}
