package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("one-sided error: est >= true count for every key, exact when " +
      "width dwarfs the key space") {
    val keys = (Seq.fill(50)(1L) ++ Seq.fill(20)(2L) ++ Seq.fill(3)(7L)
      ++ (100L to 140L)).toDF("k")
    val cells = CountMin.cells(spark, keys, w = 4096)
    val probes = keys.distinct()
    val est = CountMin.estimate(spark, cells, probes, w = 4096)
    val exact = keys.groupBy("k").agg(count(lit(1)).as("cnt"))
    val joined = exact.join(est, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(joined.forall { case (_, cnt, e) => e >= cnt })
    // 44 distinct keys into 4 x 4096 cells: collisions vanishingly
    // unlikely under the fixed hash family — and deterministically absent
    // here (est == cnt observed is pinned; params are constants)
    assert(joined.forall { case (_, cnt, e) => e == cnt })
  }

  test("narrow sketch still never underestimates; unseen key estimates 0 " +
      "when its cells are empty") {
    val keys = (0L until 600L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
      .toDF("k")
    val cells = CountMin.cells(spark, keys, w = 16) // heavy collisions
    val exact = keys.groupBy("k").agg(count(lit(1)).as("cnt"))
    val est = CountMin.estimate(spark, cells, exact.select("k"), w = 16)
    val bad = exact.join(est, "k").filter(col("est") < col("cnt")).count()
    assert(bad == 0)
    // sketch cells total mass equals the stream length, d times over
    val mass = cells.groupBy("i").agg(sum("c").as("m"))
      .select(countDistinct("m"), first("m")).head()
    assert(mass.getLong(0) == 1 && mass.getLong(1) == keys.count())
  }

  test("mergeability: sketch of a union equals cell-wise sum of the " +
      "part sketches") {
    val p1 = (0L until 200L).toDF("k")
    val p2 = (100L until 400L).toDF("k")
    val whole = CountMin.cells(spark, p1.unionAll(p2), w = 64)
    val merged = CountMin.cells(spark, p1, w = 64)
      .unionAll(CountMin.cells(spark, p2, w = 64))
      .groupBy("i", "bucket").agg(sum("c").as("c"))
    assert(whole.exceptAll(merged).count() == 0
      && merged.exceptAll(whole).count() == 0)
  }
}
