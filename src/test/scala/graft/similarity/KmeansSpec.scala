package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def toDf(vs: Seq[(Long, Seq[Float])]) =
    vs.toDF("vec_id", "embedding")

  test("k=1 assigns everything to the single centroid") {
    val df = toDf(Seq(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), 2L -> Seq(1f, 1f)))
    val out = Kmeans.lloyd(df, "vec_id", "embedding", k = 1, iters = 2)
    assert(out.select("cluster").distinct().as[Long].collect().toSeq == Seq(0L))
    assert(out.count() == 3)
  }

  test("two well-separated direction groups converge to their own " +
      "clusters in two iterations") {
    // ids 0,1 seed the centroids; 0,2,3 point along +x, 1,4,5 along +y
    val df = toDf(Seq(
      0L -> Seq(10f, 1f), 1L -> Seq(1f, 10f),
      2L -> Seq(8f, 0.5f), 3L -> Seq(12f, 2f),
      4L -> Seq(0.5f, 9f), 5L -> Seq(2f, 11f)))
    val out = Kmeans.lloyd(df, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(Set(out(0L), out(2L), out(3L)).size == 1)
    assert(Set(out(1L), out(4L), out(5L)).size == 1)
    assert(out(0L) != out(1L))
  }

  test("spherical objective (mean cosine to assigned centroid) is " +
      "non-decreasing across iterations, up to source rounding") {
    val vs = (0L until 60L).map { i =>
      i -> Seq.tabulate(8)(d =>
        (math.sin(i * 37 + d * 101).toFloat + (if (d == (i % 3)) 2f else 0f)))
    }
    val df = toDf(vs)
    def objective(iters: Int): Double =
      Kmeans.lloyd(df, "vec_id", "embedding", k = 4, iters = iters)
        .agg(avg(col("cos"))).head().getDouble(0)
    val o1 = objective(1); val o2 = objective(2); val o3 = objective(3)
    assert(o2 >= o1 - 1e-5, s"$o1 -> $o2")
    assert(o3 >= o2 - 1e-5, s"$o2 -> $o3")
  }

  test("deterministic: two runs produce identical assignments") {
    val vs = (0L until 40L).map { i =>
      i -> Seq.tabulate(6)(d => math.cos(i * 13 + d * 7).toFloat)
    }
    val df = toDf(vs)
    def run() = Kmeans.lloyd(df, "vec_id", "embedding", k = 5, iters = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(run() == run())
  }

  test("an emptied cluster drops out of the codebook without error") {
    // id 1's seed direction is identical to id 0's, so after the first
    // update one centroid owns everything it seeded
    val df = toDf(Seq(0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f),
      2L -> Seq(0.9f, 0.1f)))
    val out = Kmeans.lloyd(df, "vec_id", "embedding", k = 2, iters = 3)
    assert(out.count() == 3)
    // ties broke to centroid 0 in iteration 1, so cluster 1 emptied
    assert(out.select("cluster").distinct().as[Long].collect().toSeq == Seq(0L))
  }
}
