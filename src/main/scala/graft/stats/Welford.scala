package graft.stats

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass streaming moments via Welford/Chan parallel merge — the
  * optional custom `Aggregator` from SURVEY §4.2: one buffer of
  * (count, mean, M2) per group replaces the two built-in aggregates of
  * the Welch-t moment pass. Numerically stable (no sum-of-squares
  * cancellation) and mergeable, so partial aggregation works map-side.
  */
object Welford {

  final case class Moments(n: Long, mean: Double, m2: Double) {
    def variance: Double = if (n < 2) Double.NaN else m2 / (n - 1)
    def stddev: Double = math.sqrt(variance)
  }

  val zero: Moments = Moments(0L, 0.0, 0.0)

  def update(s: Moments, x: Double): Moments = {
    val n = s.n + 1
    val delta = x - s.mean
    val mean = s.mean + delta / n
    Moments(n, mean, s.m2 + delta * (x - mean))
  }

  /** Chan et al. parallel combine. */
  def merge(a: Moments, b: Moments): Moments =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      Moments(n,
        a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n)
    }

  /** Typed aggregator: `ds.groupByKey(...).agg(Welford.moments)`. */
  val moments: TypedColumn[Double, Moments] =
    new Aggregator[Double, Moments, Moments] {
      def zero: Moments = Welford.zero
      def reduce(b: Moments, a: Double): Moments = update(b, a)
      def merge(b1: Moments, b2: Moments): Moments = Welford.merge(b1, b2)
      def finish(r: Moments): Moments = r
      def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
    }.toColumn
}
