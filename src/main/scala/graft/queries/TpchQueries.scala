package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import Q.{dsum, sqlDsum}

/** The classic TPC-H analytics shapes (Q3 / Q5 / Q10, adapted to the
  * testdata's column subset) as end-to-end flagship queries — the
  * canonical multi-join + aggregate + top-k OLAP patterns every engine
  * is measured by, composed from operators the board already gates
  * individually (broadcast dim joins j1/j6, exact decimal aggregation
  * a9/a10, fused top-k o2).
  *
  * Plan shapes (the 100 TB story): every dimension side — customer,
  * supplier, nation⋈region — broadcasts (dims are MBs at any SF); the
  * only shuffle is the lineitem⋈orders fact join keyed on l_orderkey
  * plus the final small aggregation; date filters push to the parquet
  * scans, so each query reads exactly the fact fraction its predicate
  * selects. Revenue follows the a9 exactness discipline: the per-row
  * double product l_extendedprice·(1−l_discount) is IEEE-identical in
  * both engines, then summed EXACTLY as DECIMAL(18,4) — partial
  * aggregation order can never move a bit.
  */
object TpchQueries {

  val all: Seq[Q] = Seq(

    // Q3: shipping priority — revenue of not-yet-shipped BUILDING-segment
    // orders, top 10.
    Q("q3_shipping_priority",
      (s, d) => {
        val cutoff = lit("1998-06-01").cast("date")
        val cust = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate").cast("date") < cutoff)
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
        Tables.lineitem(s, d)
          .filter(col("l_shipdate").cast("date") > cutoff)
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(dsum(expr("l_extendedprice * (1 - l_discount)"), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
                      CAST(o_orderdate AS DATE) AS o_orderdate,
                      ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)}
                        AS revenue
               FROM customer
               JOIN orders ON o_custkey = c_custkey
               JOIN lineitem ON l_orderkey = o_orderkey
               WHERE c_mktsegment = 'BUILDING'
                 AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
                 AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
               GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
               ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // Q5: local supplier volume — revenue shipped within each ASIA
    // nation where customer and supplier share the nation, 1997 orders.
    Q("q5_local_supplier_volume",
      (s, d) => {
        val asiaNations = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "ASIA").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate").cast("date") >= lit("1997-01-01").cast("date")
            && col("o_orderdate").cast("date") < lit("1998-01-01").cast("date"))
          .select("o_orderkey", "o_custkey")
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey")
            && col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(dsum(expr("l_extendedprice * (1 - l_discount)"), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name,
                      ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)}
                        AS revenue
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN supplier ON l_suppkey = s_suppkey
                            AND s_nationkey = c_nationkey
               JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'ASIA'
                 AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
                 AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
               GROUP BY n_name
               ORDER BY revenue DESC, n_name""")),

    // Q10: returned-item reporting — top 20 customers by revenue lost to
    // returns in 1997 Q4.
    Q("q10_returned_items",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate").cast("date") >= lit("1997-10-01").cast("date")
            && col("o_orderdate").cast("date") < lit("1998-01-01").cast("date"))
          .select("o_orderkey", "o_custkey")
        val custNation = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)
              .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey", "c_name", "c_acctbal", "n_name")
        Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(dsum(expr("l_extendedprice * (1 - l_discount)"), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
                      c_acctbal, n_name,
                      ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)}
                        AS revenue
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               WHERE l_returnflag = 'R'
                 AND CAST(o_orderdate AS DATE) >= DATE '1997-10-01'
                 AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
               GROUP BY c_custkey, c_name, c_acctbal, n_name
               ORDER BY revenue DESC, c_custkey LIMIT 20"""))
  )
}
