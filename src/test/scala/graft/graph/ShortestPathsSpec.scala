package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShortestPathsSpec extends SparkSpec {
  import spark.implicits._

  // path graph 1-2-3-4 with weights 5,1,2 plus a heavy shortcut 1-4 (w=9)
  private def pathEdges = Seq(
    (1L, 2L, 5L), (2L, 1L, 5L),
    (2L, 3L, 1L), (3L, 2L, 1L),
    (3L, 4L, 2L), (4L, 3L, 2L),
    (1L, 4L, 9L), (4L, 1L, 9L)).toDF("src", "dst", "w")

  test("exact distances on a weighted path with a worse shortcut") {
    val src = Seq(1L).toDF("node")
    val d = ShortestPaths.run(pathEdges, "src", "dst", "w", src, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1→4 direct is 9; via 2,3 is 5+1+2 = 8
    assert(d == Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 8L))
  }

  test("k rounds bound path LENGTH: the 3-edge route only wins once " +
      "round 3 relaxes it") {
    val src = Seq(1L).toDF("node")
    val d2 = ShortestPaths.run(pathEdges, "src", "dst", "w", src, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d2(4L) == 9L, "2 rounds must still hold the direct edge")
    val d3 = ShortestPaths.run(pathEdges, "src", "dst", "w", src, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3(4L) == 8L, "3 rounds must relax the 3-edge route")
  }

  test("frontier stays sparse: nodes beyond k hops carry NO row") {
    // long chain 1-2-3-4-5-6, unit weights
    val chain = (1L to 5L).flatMap(i =>
      Seq((i, i + 1, 1L), (i + 1, i, 1L))).toDF("src", "dst", "w")
    val d2 = ShortestPaths.run(chain, "src", "dst", "w",
      Seq(1L).toDF("node"), iters = 2)
    assert(d2.count() == 3, "2 rounds from node 1 reach exactly {1,2,3}")
  }

  test("multi-source: each node takes the nearest source") {
    val chain = (1L to 5L).flatMap(i =>
      Seq((i, i + 1, 1L), (i + 1, i, 1L))).toDF("src", "dst", "w")
    val d = ShortestPaths.run(chain, "src", "dst", "w",
      Seq(1L, 6L).toDF("node"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L,
      6L -> 0L))
  }

  test("an edgeless source still reports (node, 0) — the contract that " +
      "the source is reachable at zero edges") {
    val d = ShortestPaths.run(pathEdges, "src", "dst", "w",
      Seq(99L).toDF("node"), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(99L -> 0L))
  }

  test("deterministic under repartitioning") {
    val src = Seq(1L).toDF("node")
    val a = ShortestPaths.run(pathEdges.repartition(7), "src", "dst", "w",
      src, iters = 4).orderBy("node").collect()
    val b = ShortestPaths.run(pathEdges.repartition(1), "src", "dst", "w",
      src, iters = 4).orderBy("node").collect()
    assert(a.sameElements(b))
  }
}
