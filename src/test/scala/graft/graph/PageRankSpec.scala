package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("star graph: the hub outranks every leaf; ranks are exact " +
      "integers invariant under repartitioning") {
    // undirected star: hub 0 <-> leaves 1..6
    val e0 = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val r = PageRank.run(e0, "src", "dst", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 7)
    val hub = r(0L)
    assert((1L to 6L).forall(l => r(l) < hub), s"hub must dominate: $r")
    // leaves are symmetric: identical ranks
    assert((1L to 6L).map(r).toSet.size == 1)
    // exact-integer determinism: a different physical partitioning of the
    // same edges yields bit-identical ranks (zero float surface)
    val r2 = PageRank.run(e0.repartition(7), "src", "dst", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2 == r)
  }

  test("rank mass is conserved up to the documented floor loss") {
    val rnd = new scala.util.Random(3)
    val ed = (0 until 200).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2).distinct
    val sym = (ed ++ ed.map(_.swap)).distinct.toDF("src", "dst")
    val iters = 4
    val out = PageRank.run(sym, "src", "dst", iters)
    val n = out.count()
    val total = out.agg(sum(col("rank_nano"))).head().getLong(0)
    // per iteration each node loses < deg nano-units to contribution
    // floors, < 1 to the damping floor, < 1 to the teleport floor; the
    // initial split loses < n. Bound generously:
    val edges = sym.count()
    val bound = n + iters * (edges + 2 * n)
    assert(total <= 1000000000L && total >= 1000000000L - bound,
      s"mass $total outside [1e9 - $bound, 1e9]")
  }

  test("two disconnected equal cliques: symmetric nodes tie exactly") {
    val clique = (0L to 2L).flatMap(a => (0L to 2L).filter(_ != a).map(a -> _))
    val e = (clique ++ clique.map { case (a, b) => (a + 10L, b + 10L) })
      .toDF("src", "dst")
    val r = PageRank.run(e, "src", "dst", iters = 3)
      .select("rank_nano").as[Long].collect()
    assert(r.toSet.size == 1, s"all six symmetric nodes must tie: ${r.toSeq}")
  }
}
