package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("K4 has 4 triangles, every node in 3; adding a pendant edge " +
      "changes nothing") {
    val k4 = (for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)) :+ ((3L, 9L)) // pendant 3-9 joins no triangle
    val pn = Triangles.perNode(k4.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pn == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(pn.values.sum / 3 == 4)
  }

  test("triangle-free bipartite graph counts zero") {
    val e = (for { a <- 0L to 3L; b <- 10L to 13L } yield (a, b))
      .toDF("src", "dst")
    assert(Triangles.perNode(e).count() == 0)
  }

  test("each triangle counted exactly once regardless of partitioning") {
    val rnd = new scala.util.Random(11)
    val ed = (0 until 400).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 < p._2).distinct
    val df = ed.toDF("src", "dst")
    val t1 = Triangles.perNode(df).agg(sum("tri")).head().getLong(0)
    val t2 = Triangles.perNode(df.repartition(17))
      .agg(sum("tri")).head().getLong(0)
    assert(t1 == t2 && t1 % 3 == 0 && t1 > 0)
  }
}
