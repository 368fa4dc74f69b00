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

  /** Corpus mixing: downsample strata so the kept corpus matches a target
    * composition (`Seq("web" -> 0.6, "books" -> 0.4)`) as closely as the
    * data allows — the training-mix step of an LLM data pipeline. The kept
    * size is maximized: C = min over strata of n_s / p_s, and each stratum
    * keeps ≈k_s = ⌊C·p_s⌋ rows IN EXPECTATION — the hash-bucket filter
    * admits each row independently, so non-binding strata land within
    * sampling noise of k_s rather than exactly on it (SamplingSpec's loose
    * bounds pin this); only the binding stratum, kept whole, is exact.
    * Membership is deterministic by hash bucket, stable across
    * runs/engines, and nests across re-mixes at the same seed. Strata
    * absent from `targets` are dropped (share 0); the keep rule is exact
    * integer arithmetic (bucket·n_s < granularity·k_s — no floating
    * thresholds in the row filter).
    *
    * 100 TB shape: one group-cardinality count aggregate, targets and
    * per-stratum thresholds broadcast, then a stateless per-row filter —
    * no shuffle of the data itself and no driver-side collect. */
  def mixToTarget(df: DataFrame, strataCol: String, idCol: String,
      targets: Seq[(String, Double)], seed: Int = 7,
      granularity: Int = 10000): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0) &&
      math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
      "target shares must be positive and sum to 1")
    require(targets.map(_._1).distinct.size == targets.size,
      "duplicate stratum in targets") // a dup would double-join its rows
    val spark = df.sparkSession
    import spark.implicits._
    val t = targets.toDF(strataCol, "__p")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val withP = counts.join(broadcast(t), strataCol)
    val cap = withP.select(
      min(col("__n").cast("double") / col("__p")).as("__c"))
    // +1e-9 guards the 1-ulp floor underflow: for the binding stratum
    // C·p equals n exactly in real arithmetic, but the double product can
    // land at n − 1ulp and floor would silently drop its last keep slot
    // (or the whole stratum when k would be 1). least(n, ·) re-caps the
    // epsilon's other direction. The oracle replays identical arithmetic.
    val thr = withP.crossJoin(broadcast(cap))
      .select(col(strataCol), col("__n"),
        least(col("__n"),
          floor(col("__c") * col("__p") + lit(1e-9)).cast("long")).as("__k"))
    df.join(broadcast(thr), strataCol)
      .filter(bucket(col(idCol), seed, granularity) * col("__n") <
        lit(granularity.toLong) * col("__k"))
      .drop("__n", "__k")
  }

  /** Temperature-based stratum rebalancing — the mT5 / XLM-R multilingual
    * sampling rule (Xue et al. 2021 §3.1; Conneau et al. 2020 §3):
    * stratum s gets a share ∝ n_s^α with α = 1/τ < 1, which BOOSTS
    * low-resource strata above their natural share (where [[mixToTarget]]
    * needs explicit target proportions, this DERIVES them from the
    * counts). Exposed at τ = 2 (α = 0.5) because sqrt is the one
    * fractional power IEEE requires correctly rounded — the weights, and
    * therefore the quotas, are bit-identical in any engine; a general-α
    * build would route through integer nano-unit exp/ln like
    * [[graft.text.Dsir]]. Quotas for a kept budget `targetTotal`:
    * k_s = min(n_s, ⌊target·w_s/W + 1e-9⌋), w_s = round(√n_s, 6), W an
    * exact decimal sum (the 1e-9 is [[mixToTarget]]'s floor-underflow
    * guard). Membership is RANK-pinned, not expectation-based: exactly
    * the k_s lowest-hash60 rows (id tie-break) of each stratum survive —
    * deterministic across engines, runs and partitionings.
    *
    * 100 TB shape: one stratum-count aggregate broadcast back, then a
    * per-stratum top-k window — WindowGroupLimit territory (the o5/t39
    * plan shape), rows never sort beyond their stratum's k. */
  /** Weighted sample WITHOUT replacement — Efraimidis–Spirakis A-Res
    * (IPL 2006, the standard one-pass distributed weighted reservoir):
    * each row draws key u^(1/w) with u uniform in (0,1] and the k LARGEST
    * keys win; equivalently (monotone) rank by ln(u)/w, which is what we
    * compute — no pow(), whose last-ulp behavior differs across libm
    * implementations. u is the portable hash-uniform
    * (hash60(id)+1)/2^60, so membership is a pure function of (id, seed):
    * same sample every run, every engine, every cluster size. The key is
    * rounded to 6 decimals (the repo's ln discipline — BM25 idf
    * precedent) with ties broken on id.
    *
    * This is the QUALITY-WEIGHTED subsample step of a curation pipeline
    * (weight = quality score, token count, dedup multiplicity…) —
    * distinct from uniform splits ([[hashSample]]) and stratum quotas
    * ([[temperatureSample]]): here every row competes globally with
    * probability proportional to weight.
    *
    * 100 TB shape: one narrow projection + a TakeOrdered top-k — no
    * shuffle of the corpus, O(k) driver memory. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      k: Int, seed: Int = 7): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    df.withColumn("__u",
        (TextFunctions.hash60(col(idCol).cast("string"), seed) + 1)
          .cast("double") / lit(1152921504606846976.0)) // 2^60
      .withColumn("weight", weight.cast("long"))
      .withColumn("es_key", round(log(col("__u")) / col("weight").cast("double"), 6))
      .drop("__u")
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  def temperatureSample(df: DataFrame, strataCol: String, idCol: String,
      targetTotal: Long, seed: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetTotal > 0, s"need targetTotal > 0, got $targetTotal")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
      .withColumn("__w", round(sqrt(col("__n").cast("double")), 6))
    val tot = counts.agg(
      sum(col("__w").cast("decimal(28,6)")).cast("double").as("__wsum"))
    val quotas = counts.crossJoin(broadcast(tot))
      .select(col(strataCol), col("__n"),
        least(col("__n"),
          floor(lit(targetTotal.toDouble) * col("__w") / col("__wsum")
            + lit(1e-9)).cast("long")).as("__k"))
    df.withColumn("__rnk", row_number().over(
        Window.partitionBy(strataCol)
          .orderBy(TextFunctions.hash60(col(idCol).cast("string"), seed),
            col(idCol))))
      .join(broadcast(quotas), strataCol)
      .filter(col("__rnk") <= col("__k"))
      .drop("__rnk", "__n", "__k")
  }
}
