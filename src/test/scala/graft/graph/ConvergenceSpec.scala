package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Run-to-convergence forms (r11 VERDICT item 4): fixpoint ≡ fixed-round
  * at the graph's natural horizon, monotone improvement, honest maxIters
  * cutoff, and bounded plan depth on long chains (the Iterate
  * checkpoint rule, inert below 8 rounds, finally firing). */
class ConvergenceSpec extends SparkSpec {
  import spark.implicits._

  // two components: a 5-chain {1..5} and a triangle {10,11,12}
  private def ccEdges = ((1L to 4L).flatMap(i =>
    Seq((i, i + 1), (i + 1, i))) ++
    Seq((10L, 11L), (11L, 10L), (11L, 12L), (12L, 11L), (10L, 12L),
      (12L, 10L))).toDF("src", "dst")

  private def chainW(n: Long) = (1L until n).flatMap(i =>
    Seq((i, i + 1, 1L), (i + 1, i, 1L))).toDF("src", "dst", "w")

  test("SSSP runUntil reaches the Bellman-Ford fixpoint: equals the " +
      "fixed-round form at the eccentricity, rounds = ecc + 1 probe") {
    val src = Seq(1L).toDF("node")
    val (d, rounds) = ShortestPaths.runUntil(chainW(6), "src", "dst", "w",
      src, maxIters = 32)
    val want = ShortestPaths.run(chainW(6), "src", "dst", "w", src,
      iters = 5).orderBy("node").collect()
    assert(d.orderBy("node").collect().sameElements(want))
    // 5 improving rounds reach node 6; round 6 is the zero-change probe
    assert(rounds == 6, s"rounds: $rounds")
    assert(d.count() == 6)
  }

  test("SSSP runUntil maxIters cutoff is honest: stops early with the " +
      "k-edge-bounded distances, not the fixpoint") {
    val src = Seq(1L).toDF("node")
    val (d, rounds) = ShortestPaths.runUntil(chainW(10), "src", "dst", "w",
      src, maxIters = 3)
    assert(rounds == 3)
    assert(d.count() == 4, "3 rounds from node 1 reach exactly {1,2,3,4}")
  }

  test("LabelPropagation runUntil IS connected components; agrees with " +
      "the fixed-round form at the diameter") {
    val (labels, rounds) = LabelPropagation.runUntil(ccEdges, "src", "dst",
      maxIters = 32)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    // the 5-chain needs 4 improving rounds (+1 zero-change probe)
    assert(rounds == 5, s"rounds: $rounds")
    val fixed = LabelPropagation.run(ccEdges, "src", "dst", iters = 4)
      .orderBy("node").collect()
    assert(labels.orderBy("node").collect().sameElements(fixed))
  }

  test("PageRank runUntil: max-norm delta is monotone non-increasing " +
      "across probed rounds, the stop round is within tolerance, and " +
      "the result equals the fixed-round form at roundsRun") {
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val sym = e0.unionAll(e0.select(col("dst").as("src"),
      col("src").as("dst"))).distinct()
    val (ranks, rounds) = PageRank.runUntil(sym, "src", "dst",
      tolNano = 1000L, maxIters = 40)
    assert(rounds < 40, s"should converge well before 40: $rounds")
    // the stopping claim itself: one more round moves nothing past tol
    val fixedAtStop = PageRank.run(sym, "src", "dst", iters = rounds)
    assert(ranks.orderBy("node").collect()
      .sameElements(fixedAtStop.orderBy("node").collect()),
      "fixpoint form must equal the fixed-round form at roundsRun")
    val next = PageRank.run(sym, "src", "dst", iters = rounds + 1)
    assert(PageRank.maxDeltaNano(fixedAtStop, next) <= 1000L)
    // monotone max-norm deltas over the first probed rounds
    val deltas = (1 to rounds).map { i =>
      PageRank.maxDeltaNano(
        PageRank.run(sym, "src", "dst", iters = i),
        PageRank.run(sym, "src", "dst", iters = i + 1))
    }
    assert(deltas.zip(deltas.tail).forall { case (a, b) => b <= a },
      s"deltas not monotone: $deltas")
  }

  test("PageRank runUntil survives DIRECTED graphs where zero-in-degree " +
      "nodes vanish from the rank frame (the full-outer delta rule)") {
    // single directed edge 1→2: after round 1 only node 2 carries a
    // rank row; an inner-join delta probe would compute max over an
    // EMPTY join (NPE) and, on larger graphs, silently exclude vanished
    // nodes — declaring convergence while the node set still shrinks
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val (ranks, rounds) = PageRank.runUntil(e, "src", "dst",
      tolNano = 0L, maxIters = 10)
    // the leaking semantics drain this degenerate graph completely:
    // round 1 leaves only node 2 ranked, round 2 empties the frame (2
    // has no out-edge to feed anyone — an inner-join probe would NPE
    // HERE on max over the empty join), round 3 probes {} vs {} → stop.
    // Each vanish must COUNT as a delta, never as convergence.
    assert(rounds == 3, s"vanish rounds must count as deltas: $rounds")
    assert(ranks.count() == 0L, "total leak drains the rank table")
    // delta between two empty frames is 0 (converged), not an NPE
    assert(PageRank.maxDeltaNano(ranks, ranks) == 0L)
  }

  test("32 fixed rounds keep the plan BOUNDED (the every-8th-round " +
      "checkpoint) and stay exact on a converged graph") {
    val labels = LabelPropagation.run(ccEdges, "src", "dst", iters = 32)
    // plan depth: a checkpointed chain ends at a LogicalRDD a few joins
    // deep; an unbounded 32-round chain would carry 32 joins + 32 aggs
    val planLines = labels.queryExecution.optimizedPlan.toString
      .linesIterator.size
    assert(planLines < 40, s"plan grew linearly: $planLines lines")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 1L && got(12L) == 10L)
  }
}
