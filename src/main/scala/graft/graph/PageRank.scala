package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Brin & Page 1998) in FIXED-POINT integer
  * arithmetic — the canonical iterative graph workload, expressed so the
  * fit itself sits under a cross-engine hash gate (the Dsir/NgramLm
  * nano-unit discipline): ranks are BIGINT nano-units (×10⁹), a node's
  * per-edge contribution is `rank_nano div degree` (floor division —
  * exact in any engine), the damping step is `(Σ contrib × 17) div 20`
  * (0.85 as a rational), and the teleport term is `(0.15 × 10⁹) div N`.
  * Zero float surface anywhere in the iteration, so aggregation order
  * can never perturb a single bit; a real-valued `rank` column is
  * derived once at the end. (Floor-division mass loss is ≤ 1 nano-unit
  * per edge per iteration — the fixed-point analog of float rounding,
  * identical in both engines by construction.)
  *
  * Scale shape per iteration (the classic one): one equi-join of the
  * edge list against the current rank table (both keyed on the source
  * node) and ONE shuffle — the contribution aggregation on the
  * destination node. The edge+degree table is built once and persisted;
  * the rank frame is eagerly localCheckpointed per iteration so plan
  * depth stays constant in the iteration count (the t33 lineage rule).
  * At 100 TB the same plan holds with the edge list bucketed by source
  * so the per-iteration join is co-partitioned.
  *
  * Dangling nodes: callers pass a symmetrized edge list when they want
  * none (an undirected graph has outdegree ≥ 1 everywhere); with
  * directed edges, dangling mass simply leaks (the standard simplified
  * variant) — document per use.
  */
object PageRank {

  /** Edge list + degrees + initial uniform rank — the shared setup of
    * both iteration forms. Returns (step, init) where step is ONE
    * fixed-point round (one edge⋈rank equi-join + one dst shuffle,
    * referencing the rank frame exactly once — the [[Iterate]] rule). */
  private def prepared(edges: DataFrame, srcCol: String, dstCol: String)
      : (DataFrame => DataFrame, DataFrame) = {
    val e = graft.ops.Caches.tracked(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // degree folded INTO the persisted edge list ONCE — each round is
    // then a single edge⋈rank join instead of re-paying the e⋈deg join
    // every iteration (measured ~2× on the 10-round g5 row); the window
    // avoids a second scan-and-shuffle of e to build a separate deg table
    val ed = graft.ops.Caches.tracked(
      e.withColumn("deg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val teleportNano = 150000000L / n // (0.15 × 10⁹) ÷ N, floor — exact
    val step = (ranks: DataFrame) => ed
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"),
        expr("rank_nano div deg").as("c")) // BIGINT floor div, exact
      .groupBy("node")
      .agg(sum(col("c")).as("s"))
      .select(col("node"),
        (lit(teleportNano) + expr("(s * 17) div 20")).as("rank_nano"))
    (step, nodes.withColumn("rank_nano", lit(1000000000L / n)))
  }

  /** Run `iters` fixed-point iterations over `edges` (src, dst — already
    * distinct). Returns (node, rank_nano, rank) for every node appearing
    * in the edge list. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    val (step, init) = prepared(edges, srcCol, dstCol)
    withRank(Iterate.fixedRounds(init, iters)(step))
  }

  /** Run to CONVERGENCE: iterate until no node's rank moved by more than
    * `tolNano` nano-units in a round (max-norm — the standard PageRank
    * stopping rule, exact here because ranks are integers), or `maxIters`
    * rounds ran. Returns (ranks, roundsRun). The probe is one
    * prev⋈next equi-join + a max aggregate per round — O(|V|), never
    * touching the edge list. */
  def runUntil(edges: DataFrame, srcCol: String, dstCol: String,
      tolNano: Long, maxIters: Int): (DataFrame, Int) = {
    require(tolNano >= 0, s"tolNano: $tolNano")
    val (step, init) = prepared(edges, srcCol, dstCol)
    val (ranks, rounds) = Iterate.untilFixpoint(init, maxIters)(step) {
      (prev, next) => maxDeltaNano(prev, next) <= tolNano
    }
    (withRank(ranks), rounds)
  }

  /** Largest per-node |rank_nano| move between two rank frames. FULL
    * OUTER + coalesce(0): on a symmetrized graph both frames carry every
    * node, but with DIRECTED edges (documented-supported — dangling mass
    * leaks) a zero-in-degree node VANISHES from the next round's frame;
    * its delta is then its whole previous rank, and a node the frames
    * merely disagree on must never be silently excluded from the max
    * (an inner join would declare convergence while the node set still
    * shrinks — or NPE outright when a round empties the frame). */
  def maxDeltaNano(prev: DataFrame, next: DataFrame): Long = {
    val row = prev.select(col("node"), col("rank_nano").as("p"))
      .join(next.select(col("node"), col("rank_nano").as("q")),
        Seq("node"), "full_outer")
      .agg(max(abs(coalesce(col("q"), lit(0L)) - coalesce(col("p"), lit(0L))))
        .as("d"))
      .collect()(0)
    if (row.isNullAt(0)) 0L else row.getLong(0) // both empty → converged
  }

  private def withRank(ranks: DataFrame): DataFrame =
    ranks.select(col("node"), col("rank_nano"),
      round(col("rank_nano").cast("double") / 1e9, 9).as("rank"))
}
