package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  test("two components converge to their min ids; a path graph at few " +
      "rounds shows the distance-k semantics") {
    // component A: path 1-2-3-4; component B: triangle 10-11-12
    val ed = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L))
    val sym = (ed ++ ed.map(_.swap)).toDF("src", "dst")
    val conv = LabelPropagation.run(sym, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    // one round on the path: node 4 only sees distance-1 labels (min 3)
    val one = LabelPropagation.run(sym, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(4L) == 3L && one(3L) == 2L && one(2L) == 1L)
  }

  test("deterministic under repartitioning (pure BIGINT MIN surface)") {
    val rnd = new scala.util.Random(7)
    val ed = (0 until 300).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2).distinct
    val sym = (ed ++ ed.map(_.swap)).distinct.toDF("src", "dst")
    val a = LabelPropagation.run(sym, "src", "dst", iters = 3)
      .orderBy("node").collect().toSeq
    val b = LabelPropagation.run(sym.repartition(13), "src", "dst", iters = 3)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }
}
