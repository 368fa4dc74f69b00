package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.ArrayDotProduct
import graft.plans.{AsOfJoinStrategy, RangeJoinStrategy}
import graft.privacy.{HmacDetokenize, HmacSha256Base64}

/** SparkSessionExtensions entry point: enable with
  * `spark.sql.extensions=graft.GraftExtensions` to get the engine's custom
  * Catalyst expressions in every session (SQL + DataFrame API) without
  * runtime registration calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("hmac_tokenize"),
      new ExpressionInfo(classOf[HmacSha256Base64].getName, "hmac_tokenize"),
      (children: Seq[Expression]) => HmacSha256Base64(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("hmac_detokenize"),
      new ExpressionInfo(classOf[HmacDetokenize].getName, "hmac_detokenize"),
      (children: Seq[Expression]) => HmacDetokenize(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => ArrayDotProduct(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_hplanes"),
      new ExpressionInfo(classOf[graft.functions.HyperplaneBucket].getName, "graft_hplanes"),
      (children: Seq[Expression]) => graft.functions.HyperplaneBucket.build(children)))
    ext.injectFunction((FunctionIdentifier("graft_bands"),
      new ExpressionInfo(classOf[graft.functions.BandedHyperplanes].getName, "graft_bands"),
      (children: Seq[Expression]) => graft.functions.BandedHyperplanes.build(children)))
    ext.injectFunction((FunctionIdentifier("graft_char_entropy"),
      new ExpressionInfo(classOf[graft.functions.CharEntropy].getName, "graft_char_entropy"),
      (children: Seq[Expression]) => graft.functions.CharEntropy.build(children)))
    ext.injectFunction((FunctionIdentifier("graft_shingle_stats"),
      new ExpressionInfo(classOf[graft.functions.ShingleStats].getName, "graft_shingle_stats"),
      (children: Seq[Expression]) => graft.functions.ShingleStats.build(children)))
    ext.injectFunction((FunctionIdentifier("graft_bloom"),
      new ExpressionInfo(classOf[graft.functions.Bloom.BloomAgg].getName,
        "graft_bloom"),
      (children: Seq[Expression]) => (children(1), children(2)) match {
        case (org.apache.spark.sql.catalyst.expressions.Literal(b: Int,
            org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.catalyst.expressions.Literal(h: Int,
            org.apache.spark.sql.types.IntegerType)) =>
          graft.functions.Bloom.BloomAgg(children(0), b, h)
        case other => throw new IllegalArgumentException(
          s"graft_bloom numBits/numHashes must be integer literals, got $other")
      }))
    ext.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[graft.functions.Bloom.BloomContains].getName,
        "graft_bloom_contains"),
      (children: Seq[Expression]) =>
        graft.functions.Bloom.BloomContains(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[graft.functions.HeavyHittersAgg].getName, "graft_heavy_hitters"),
      (children: Seq[Expression]) => children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) =>
          graft.functions.HeavyHittersAgg(children(0), v)
        case other => throw new IllegalArgumentException(
          s"graft_heavy_hitters k must be an integer literal, got $other")
      }))
    ext.injectFunction((FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[graft.functions.NgramGenerator].getName, "graft_ngrams"),
      (children: Seq[Expression]) => graft.functions.NgramGenerator.build(children)))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[graft.functions.SimHashAgg].getName, "graft_simhash"),
      (children: Seq[Expression]) => graft.functions.SimHashAgg(children(0))))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[graft.functions.MinHashAgg].getName, "graft_minhash"),
      (children: Seq[Expression]) => children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) =>
          graft.functions.MinHashAgg(children(0), v)
        case other => throw new IllegalArgumentException(
          s"graft_minhash k must be an integer literal, got $other")
      }))
    // Whole-operator extension: plans graft.plans.AsOfJoinPlan as
    // BroadcastAsOfJoinExec (custom physical as-of join).
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => RangeJoinStrategy)
    // Optimizer rule: hmac_detokenize(hmac_tokenize(x, k), k) → x.
    ext.injectOptimizerRule(_ => graft.privacy.EliminateHmacRoundTrip)
    // Optimizer rule: aggregate-over-base-table → re-aggregate over a
    // registered materialized view (graft.plans.Mv). No-op until a session
    // registers an MV; Mv.enable is the runtime twin for extension-less
    // sessions.
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
  }
}
