package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING — the step after pair generation in a real
  * training-data dedup pipeline: fold the pair list (from MinHash/LSH,
  * n-gram Jaccard, or embedding cosine) into connected components, then
  * keep one canonical document per component.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014 — public
  * literature). Converges in O(log n) rounds; every round is two
  * aggregate+join passes over the edge list, i.e. plain shuffles that
  * scale horizontally — no driver-side graph, no vertex state that must
  * fit anywhere. This is the standard way to cluster billions of near-dup
  * pairs; at 100 TB the edge list is itself a distributed table.
  *
  * Formulation note: the textbook description groups each node with its
  * neighbor list (collect_list) — a hub node would then materialize one
  * giant array (skew). Here each star round is expressed relationally
  * (groupBy-min + join back), so a hub's neighborhood is never collected
  * into a single buffer and AQE's skew handling applies.
  */
object Clusters {

  /** Connected components over an undirected edge list of BIGINT node ids.
    * Returns (node, component) for every node that appears in an edge,
    * where component = the smallest node id in the component.
    *
    * Size-adaptive, the same way AQE converts a shuffle join to a
    * broadcast join once a runtime size is known: an edge list at or under
    * `driverThreshold` (default 2^20 edges ≈ 16 MB of longs) is collected
    * and solved with path-compressed union-find — one job instead of
    * O(log n) shuffle rounds, each of which costs scheduler fixed time
    * that would dominate a small graph. Above the threshold the
    * alternating-star loop runs fully distributed; each round is
    * `localCheckpoint`ed to cut lineage (the loop would otherwise stack
    * O(rounds) of plan on every iteration); swap for a reliable
    * checkpoint dir in long multi-hour jobs.
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 25, driverThreshold: Long = 1L << 20): DataFrame = {
    require(maxIter > 0)
    val spark = edges.sparkSession
    val clean = edges.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)

    if (clean.count() <= driverThreshold) {
      val pairs = clean.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      pairs.foreach { case (x, y) =>
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
      val nodes = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
      import spark.implicits._
      // parallelize rather than a local Seq: at the threshold boundary
      // the assignment is ~2×2^20 rows, which as a LocalRelation would be
      // embedded in every downstream plan
      return spark.sparkContext
        .parallelize(nodes.iterator.map(x => (x, find(x))).toSeq)
        .toDF("node", "component")
    }

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy("a").agg(min(col("b")).as("mb"))
        .select(col("a"), least(col("mb"), col("a")).as("m"))
      sym.join(mins, "a").filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      val oriented = sym.filter(col("b") < col("a"))
      val mins = oriented.groupBy("a").agg(min(col("b")).as("m"))
      oriented.join(mins, "a")
        .filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .unionAll(mins.select(col("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    }

    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(sum(hash(col("a"), col("b")).cast("long")), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    var cur = clean
    var prev = (-1L, 0L)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      cur = smallStar(largeStar(cur)).localCheckpoint(true)
      val sig = checksum(cur)
      converged = sig == prev
      prev = sig
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // After convergence the edge set is a star forest (node → root).
    val roots = cur.select(col("b")).distinct()
      .join(cur.select(col("a")), col("b") === col("a"), "left_anti")
      .select(col("b").as("node"), col("b").as("component"))
    cur.select(col("a").as("node"), col("b").as("component"))
      .unionAll(roots)
      .distinct()
  }

  /** Dedup keep-list: one canonical doc (smallest id) per near-dup
    * cluster, everything else marked as a duplicate of it. Nodes absent
    * from `pairs` are implicitly their own singleton cluster — callers
    * left-join this onto the corpus and coalesce. */
  def canonicalAssignment(pairs: DataFrame, src: String, dst: String): DataFrame =
    connectedComponents(pairs, src, dst)
      .select(col("node").as("doc_id"), col("component").as("cluster_id"),
        (col("node") === col("component")).as("is_canonical"))
}
