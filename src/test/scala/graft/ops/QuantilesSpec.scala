package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def sample = (1 to 1000).map(i => (i.toLong, (i * 7919 % 997)))
    .toDF("id", "v")

  test("buckets span [1, n] and every row keeps its bucket") {
    val out = Quantiles.quantileBuckets(sample, "v", 10, exact = true)
    assert(out.count() == 1000)
    val range = out.agg(min("bucket"), max("bucket")).as[(Long, Long)].head()
    assert(range == ((1L, 10L)))
    // roughly equal mass per decile (ties may skew counts slightly)
    val counts = out.groupBy("bucket").count().as[(Long, Long)].collect().toMap
    assert(counts.size == 10)
    assert(counts.values.forall(c => c >= 80 && c <= 120))
  }

  test("plan contains no window (the point of the scale path)") {
    val out = Quantiles.quantileBuckets(sample, "v", 10)
    val hasWindow = out.queryExecution.executedPlan.exists(_.isInstanceOf[WindowExec])
    assert(!hasWindow, "cutoff bucketing must not plan a window/global sort")
  }

  test("approx mode at high accuracy assigns the same buckets as exact") {
    val exact = Quantiles.quantileBuckets(sample, "v", 10, exact = true)
      .select("id", "bucket")
    val approx = Quantiles.quantileBuckets(sample, "v", 10, accuracy = 100000)
      .select("id", "bucket")
    assert(exact.except(approx).isEmpty && approx.except(exact).isEmpty)
  }

  test("ties land in one bucket (unlike NTILE)") {
    val tied = Seq.fill(100)(5).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val out = Quantiles.quantileBuckets(tied, "v", 10, exact = true)
    assert(out.select("bucket").distinct().count() == 1)
  }
}
