package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 2000L).toDF("id")

  test("split fractions land near their targets and cover every row") {
    val counts = ids
      .groupBy(Sampling.splitColumn(col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") - 1600L) < 100)
    assert(math.abs(counts("val") - 200L) < 60)
    assert(math.abs(counts("test") - 200L) < 60)
  }

  test("assignment is deterministic and partitioning-independent") {
    val a = ids.repartition(13)
      .select(col("id"), Sampling.splitColumn(col("id"),
        Seq("train" -> 0.9, "test" -> 0.1)).as("s"))
    val b = ids.repartition(3)
      .select(col("id"), Sampling.splitColumn(col("id"),
        Seq("train" -> 0.9, "test" -> 0.1)).as("s"))
    assert(a.exceptAll(b).count() == 0)
  }

  test("hash samples nest: 1% sample is a subset of the 10% sample") {
    val one = Sampling.hashSample(ids, "id", 0.01).select("id")
    val ten = Sampling.hashSample(ids, "id", 0.10).select("id")
    assert(one.exceptAll(ten).count() == 0)
    assert(one.count() < ten.count())
  }

  test("different seeds give different assignments") {
    val s1 = Sampling.hashSample(ids, "id", 0.5, seed = 1).select("id")
    val s2 = Sampling.hashSample(ids, "id", 0.5, seed = 2).select("id")
    assert(s1.exceptAll(s2).count() > 0)
  }

  test("bad fractions are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(lit(1L), Seq("a" -> 0.5, "b" -> 0.6))
    }
  }
}
