package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Proves the engine's skew story engages Spark's RUNTIME re-planning,
  * not just the manual salting path (`Scale.saltedJoin`): with AQE on, a
  * skewed sort-merge join partition is split by OptimizeSkewedJoin and
  * the final plan is marked `skew=true`. At 100 TB this is the zero-code
  * path for moderate skew; salting remains for the pathological keys.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition (skew=true in plan)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one pathological key (0) carrying half of all rows, fat payloads
      val left = spark.range(0, 60000).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id") % 97 + 1).as("k"),
        concat(lit("x" * 200), col("id")).as("v"))
      val right = (0L to 97L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // collect() (not count()) so THIS QueryExecution runs to its AQE
      // final plan — count() clones into a separate aggregate QE
      assert(joined.collect().length == 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.contains("skew=true"),
        "OptimizeSkewedJoin did not engage:\n" + plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
