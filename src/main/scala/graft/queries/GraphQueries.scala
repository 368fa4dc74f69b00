package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables

/** Graph algorithms over relational data — the iterative-workload family
  * beyond t9's connected components: PageRank over the customer↔supplier
  * trade graph, in the fixed-point integer discipline that lets the
  * ITERATION itself sit under the DuckDB hash gate (see
  * [[graft.graph.PageRank]]).
  */
object GraphQueries {

  val all: Seq[Q] = Seq(

    // G1: PageRank (3 fixed-point iterations) over the symmetrized
    // customer↔supplier trade graph (an edge per distinct trading pair
    // from orders ⋈ lineitem; node ids disjointified as 2·cust / 2·supp+1).
    // Every iteration is EXACT BIGINT arithmetic (contribution =
    // rank_nano div degree, damping = ·17 div 20, teleport =
    // 0.15e9 div N — zero float surface, the Dsir/t32 discipline), so
    // the oracle replays all three iterations as a CTE chain and the
    // gated surface is the top-20 rank_nano values VERBATIM — a single
    // bit of aggregation-order drift anywhere in the fit would
    // hash-fail. Symmetrized edges mean no dangling mass; per iteration
    // the plan is one edge⋈rank equi-join + one shuffle on the
    // destination (the canonical distributed-PageRank shape, edge list
    // persisted, ranks localCheckpointed).
    Q("g1_pagerank",
      (s, d) => {
        val edges0 = Tables.orders(s, d)
          .select(col("o_orderkey").cast("long").as("ok"),
            (col("o_custkey").cast("long") * 2L).as("src"))
          .join(Tables.lineitem(s, d)
            .select(col("l_orderkey").cast("long").as("ok"),
              (col("l_suppkey").cast("long") * 2L + 1L).as("dst")), "ok")
          .select("src", "dst").distinct()
        val sym = edges0.unionAll(
          edges0.select(col("dst").as("src"), col("src").as("dst")))
        graft.graph.PageRank.run(sym, "src", "dst", iters = 3)
          .orderBy(col("rank_nano").desc, col("node"))
          .limit(20)
      },
      Some {
        def iter(i: Int): String = {
          val prev = if (i == 1) "r0" else s"r${i - 1}"
          s"""r$i AS (SELECT e.dst AS node,
                             t.t + (SUM($prev.rank_nano // deg.deg) * 17) // 20
                               AS rank_nano
                      FROM e
                      JOIN deg ON deg.src = e.src
                      JOIN $prev ON $prev.node = e.src
                      CROSS JOIN t
                      GROUP BY e.dst, t.t)"""
        }
        s"""WITH e0 AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS src,
                               CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
                        FROM orders
                        JOIN lineitem ON l_orderkey = o_orderkey),
                e AS (SELECT src, dst FROM e0
                      UNION ALL SELECT dst, src FROM e0),
                deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
                nodes AS (SELECT DISTINCT src AS node FROM e),
                n AS (SELECT COUNT(*) AS n FROM nodes),
                t AS (SELECT 150000000 // n AS t FROM n),
                r0 AS (SELECT node, 1000000000 // n.n AS rank_nano
                       FROM nodes, n),
                ${iter(1)},
                ${iter(2)},
                ${iter(3)}
           SELECT node, rank_nano,
                  ROUND(CAST(rank_nano AS DOUBLE) / 1e9, 9) AS rank
           FROM r3
           ORDER BY rank_nano DESC, node LIMIT 20"""
      })
  )
}
