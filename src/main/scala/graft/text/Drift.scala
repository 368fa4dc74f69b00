package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus distribution-shift monitoring: KL divergence between the
  * hashed-unigram bucket distributions of two corpus slices — the check
  * a training-data team runs when a new crawl batch, a re-split, or a
  * filtered subset is about to join the mix ("does the incoming slice
  * still look like the reference corpus?"). Same estimator family as
  * the SlimPajama/DoReMi-style domain-weight diagnostics: token stream →
  * hashing trick into B buckets (vocabulary never materializes) →
  * add-one-smoothed bucket distributions → KL both directions.
  *
  *   KL(Q‖P) = Σ_b q_b · ln(q_b/p_b),  q_b = (c_q[b]+1)/(N_q+B)
  *
  * 100 TB design: ONE corpus scan — the token explode aggregates to a
  * ≤ B-row bucket table (map-side combine bounds every task's state at
  * B), and the divergence math runs on that bounded table driver-side
  * (the [[Dsir]] model-build discipline; B = 1024 by default). Nothing
  * scales past the token count.
  *
  * Determinism across engines (hash-gate exact, the Dsir convention):
  * per-bucket log-ratios in integer NANO-units (one ln per bucket,
  * operand order mirrored in the oracle; HALF_UP = DuckDB ROUND), and
  * the gated surfaces are the exact BIGINT sums
  * Σ_b (c_q[b]+1)·llrNano[b] (and its mirror) — the real-valued KLs are
  * derived columns. Unobserved buckets still contribute (smoothing
  * gives them mass), so the sums run over all B buckets.
  */
object Drift {

  private def round9(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One-row drift report between `isRef` (P, the reference slice) and
    * its complement (Q, the incoming slice):
    * (n_ref_tokens, n_new_tokens, n_buckets,
    *  kl_new_ref_nano = Σ_b (c_q+1)·llrNano,  kl_ref_new_nano mirror,
    *  kl_new_ref = KL(Q‖P) rounded to 9,      kl_ref_new = KL(P‖Q)). */
  def bucketDrift(docs: DataFrame, isRef: Column, textCol: String = "text",
      nBuckets: Int = 1024, seed: Int = 31): DataFrame = {
    require(nBuckets > 0 && nBuckets <= (1 << 20),
      s"nBuckets=$nBuckets outside the driver-collect bound (2^20)")
    val toksB = transform(TextFunctions.tokens(col(textCol)),
      t => pmod(TextFunctions.hash60(t, seed), lit(nBuckets.toLong)))
    val byB = docs.select(isRef.as("ref"), explode(toksB).as("b"))
      .groupBy("b")
      .agg(sum(when(col("ref"), 1L).otherwise(0L)).as("c_p"),
        sum(when(col("ref"), 0L).otherwise(1L)).as("c_q"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nP = byB.valuesIterator.map(_._1).sum
    val nQ = byB.valuesIterator.map(_._2).sum
    val bD = nBuckets.toDouble
    // accumulate in BigInt: at the 100 TB / 10^11-token scale a single
    // term (c+1)·nano can reach ~5e20 and overflow Long silently, where
    // DuckDB would error loudly on BIGINT overflow — desynchronizing the
    // engines. BigInt keeps the sum exact; the gated BIGINT surfaces then
    // require it to fit (loud, SYMMETRIC failure: DuckDB's oracle sum
    // errors at the same magnitude). Bound: the gate holds while
    // Σ(c+1)·|llrNano| < 2^63, i.e. roughly total tokens × max|ln ratio|
    // < 9.2e9 token-nats — past that, report the derived real-valued KLs
    // without the integer gate columns.
    var kqp = BigInt(0)
    var kpq = BigInt(0)
    var b = 0
    while (b < nBuckets) {
      val (cp, cq) = byB.getOrElse(b.toLong, (0L, 0L))
      // operand shape mirrored verbatim in the oracle SQL
      val x = ((cq + 1.0) * (nP + bD)) / ((cp + 1.0) * (nQ + bD))
      val nano = new java.math.BigDecimal(math.log(x) * 1e9)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      kqp += BigInt(cq + 1L) * BigInt(nano)
      kpq += BigInt(cp + 1L) * BigInt(-nano)
      b += 1
    }
    require(kqp.isValidLong && kpq.isValidLong,
      s"nano-unit KL sums ($kqp, $kpq) exceed BIGINT — corpus too large " +
        "for the integer gate columns (see the bound in the scaladoc)")
    val klQP = round9(kqp.toDouble / 1e9 / (nQ + bD))
    val klPQ = round9(kpq.toDouble / 1e9 / (nP + bD))
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((nP, nQ, nBuckets.toLong, kqp.toLong, kpq.toLong, klQP, klPQ))
      .toDF("n_ref_tokens", "n_new_tokens", "n_buckets",
        "kl_new_ref_nano", "kl_ref_new_nano", "kl_new_ref", "kl_ref_new")
  }
}
