package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AmsSpec extends SparkSpec {
  import spark.implicits._

  test("unbiasedness shape: estimate tracks exact F2 within the AMS " +
      "variance band on a multi-frequency stream") {
    // 400 keys with frequencies 1..5 → F2 = Σ f² known exactly.
    val keys = (0L until 400L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
      .toDF("k")
    val exactF2 = keys.groupBy("k").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head().getLong(0)
    val est = Ams.estimate(Ams.sketch(keys)).head().getDouble(0)
    // sd(mean of 16) ≈ sqrt(2/16)·F2 ≈ 0.35·F2; 3σ band.
    assert(est > exactF2 * 0.2 && est < exactF2 * 2.2,
      s"est $est vs exact $exactF2")
  }

  test("mergeability: component-wise sum of two sketches equals the " +
      "sketch of the concatenated stream") {
    val p1 = (0L until 200L).toDF("k")
    val p2 = (100L until 400L).toDF("k")
    val whole = Ams.sketch(p1.unionAll(p2))
    val merged = Ams.sketch(p1).unionAll(Ams.sketch(p2))
      .groupBy("i").agg(sum("s").as("s"))
    assert(whole.exceptAll(merged).count() == 0
      && merged.exceptAll(whole).count() == 0)
  }

  test("sign hash is balanced on a consecutive-integer key space (the " +
      "low-bit parity degeneracy stays fixed)") {
    // Regression for the pitfall documented on Ams: low-bit signs make
    // consecutive ids cancel pairwise (every Sᵢ ∈ {−1,0,1}), flooring
    // the estimate at ~0. Top-half signs must leave |Sᵢ| ≈ √n noise —
    // assert the 16 sign-sums are NOT all within ±1 of zero and the
    // estimate is within an order of magnitude of F2 = n (all f = 1).
    val n = 4096L
    val keys = (0L until n).toDF("k")
    val sums = Ams.sketch(keys).select("s").as[Long].collect()
    assert(sums.exists(s => math.abs(s) > 1),
      s"sign sums degenerate: ${sums.mkString(",")}")
    val est = Ams.estimate(Ams.sketch(keys)).head().getDouble(0)
    assert(est > n * 0.1 && est < n * 10.0, s"est $est vs F2 $n")
  }

  test("sketch is deterministic and exactly 16 rows regardless of " +
      "partitioning") {
    val keys = (0L until 1000L).toDF("k")
    val a = Ams.sketch(keys.repartition(1)).orderBy("i").collect()
    val b = Ams.sketch(keys.repartition(13)).orderBy("i").collect()
    assert(a.length == 16 && a.sameElements(b))
  }
}
