package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AMS tug-of-war sketch (Alon, Matias & Szegedy 1996) for the second
  * frequency moment F₂ = Σₓ fₓ², as pure relational arithmetic: R
  * independent ±1 sign hashes, one signed row-count Sᵢ = Σₓ sign_i(x)·fₓ
  * per repetition, and the estimator mean_i(Sᵢ²) with E[Sᵢ²] = F₂.
  *
  * Sign hashes are 4-wise-independent degree-3 polynomials over the
  * Mersenne prime p = 2³¹−1 (the independence degree the F₂ variance
  * bound requires), with the sign taken from the TOP half of the hash
  * range — NOT the low bit: for keys small enough that the polynomial
  * rarely wraps mod p, the low bit degenerates to a parity function of
  * the key (k³ ≡ k² ≡ k mod 2), which makes consecutive-integer key
  * spaces cancel to Sᵢ ∈ {−1,0,1} and collapses the estimate. Measured
  * here before pinning: low-bit signs gave est/F₂ ≈ 0.11 on a
  * consecutive id space; top-half signs give 0.6–1.8 across the three
  * test scales.
  *
  * Because the coefficients are FIXED integers and every step up to the
  * final division is BIGINT arithmetic, the per-repetition Sᵢ — the
  * sketch state itself — is bit-replayable in ANSI SQL and sits under
  * the cross-engine hash gate; the accuracy contract on the final
  * estimate is gated separately with a measured band.
  *
  * Scale: one scan, R partial sums (map-side combinable to R rows
  * regardless of input size), the textbook mergeable summary — two
  * corpora's sketches combine by adding Sᵢ component-wise, giving the
  * F₂ of the union of multisets. No shuffle carries more than R rows.
  */
object Ams {

  val P: Long = 2147483647L // 2³¹ − 1, Mersenne prime
  val Half: Long = 1073741824L // 2³⁰: top-half threshold for the sign

  private val Base: Seq[Long] = Seq(
    1000003L, 999983L, 777767L, 333667L, 900001L, 864013L, 611953L,
    500009L, 1299709L, 1193911L, 1087903L, 982451L, 876257L, 770239L,
    664579L, 558643L)

  /** Fixed coefficient rows (i, a3, a2, a1, a0) for R = 16 repetitions. */
  val Params: Seq[(Int, Long, Long, Long, Long)] =
    (0 until 16).map(i =>
      (i, Base(i), Base((i + 5) % 16), Base((i + 11) % 16),
        12345L + i * 7919L))

  /** ±1 sign of key column `k` (non-negative BIGINT) under row `i`'s
    * degree-3 polynomial. The key reduces mod p FIRST — without it, a
    * key ≥ 2³¹ overflows k·k in Spark (silent Long wrap → every sign
    * collapses to +1) while DuckDB raises a BIGINT-overflow error: the
    * engines would diverge exactly at the scale this is built for.
    * After the reduction every intermediate stays below 2⁶² (kr < p so
    * kr·kr < 2⁶²; aᵢ < 2²¹ and kʲ < 2³¹ keep the 4-term sum < 2⁵³). */
  def signCol(k: Column, i: Int): Column = {
    val (_, a3, a2, a1, a0) = Params(i)
    val kr = k % P
    val k2 = (kr * kr) % P
    val k3 = (k2 * kr) % P
    val h = (lit(a3) * k3 + lit(a2) * k2 + lit(a1) * kr + lit(a0)) % P
    when(h < Half, 1L).otherwise(-1L)
  }

  /** Sketch of `keys` (one non-negative BIGINT column `k`, one row per
    * occurrence): R rows (i, s) with s = Σ signᵢ(k). Single scan — the
    * R signs are computed as R columns and summed in ONE aggregate (no
    * R× row blow-up before the partial agg), then unpivoted. */
  def sketch(keys: DataFrame): DataFrame = {
    val k = col("k")
    val signed = keys.select(
      Params.map { case (i, _, _, _, _) => signCol(k, i).as(s"s$i") }: _*)
    val sums = signed.agg(
      sum(col("s0")).as("s0"),
      Params.tail.map { case (i, _, _, _, _) =>
        sum(col(s"s$i")).as(s"s$i")
      }: _*)
    val stackArgs = Params
      .map { case (i, _, _, _, _) => s"$i, s$i" }.mkString(", ")
    sums.select(expr(s"stack(${Params.size}, $stackArgs) as (i, s)"))
  }

  /** F₂ estimate from a sketch: mean of the squared sign-sums (one
    * double division at the end; everything before is exact BIGINT). */
  def estimate(sketchDf: DataFrame): DataFrame =
    sketchDf.agg(
      (sum(col("s") * col("s")).cast("double") / Params.size.toDouble)
        .as("est_f2"))
}
