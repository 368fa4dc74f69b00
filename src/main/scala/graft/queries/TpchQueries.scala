package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import Q.{davg, dsum, sqlDavg, sqlDsum}

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
               ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // Q1: pricing summary — THE canonical scan-heavy aggregate every
    // engine leads its benchmark page with: one full fact scan, a
    // 4-group hash aggregate with 8 measures, everything map-side
    // partial. All sums ride the exact-decimal discipline (the triple
    // product disc_price·(1+tax) is ONE double expression identical in
    // both engines, then cast to DECIMAL(18,6) before summing), and the
    // averages are exact decimal-sum / count — partial-aggregation
    // order can never move a bit anywhere in the row.
    Q("q1_pricing_summary",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") <= lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(expr("l_extendedprice * (1 - l_discount)"), 4)
            .as("sum_disc_price"),
          dsum(expr("l_extendedprice * (1 - l_discount) * (1 + l_tax)"), 6)
            .as("sum_charge"),
          davg(col("l_quantity"), 2).as("avg_qty"),
          davg(col("l_extendedprice"), 2).as("avg_price"),
          davg(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
                      ${sqlDsum("l_quantity", 2)} AS sum_qty,
                      ${sqlDsum("l_extendedprice", 2)} AS sum_base_price,
                      ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)}
                        AS sum_disc_price,
                      ${sqlDsum(
                        "l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)}
                        AS sum_charge,
                      ${sqlDavg("l_quantity", 2)} AS avg_qty,
                      ${sqlDavg("l_extendedprice", 2)} AS avg_price,
                      ${sqlDavg("l_discount", 2)} AS avg_disc,
                      COUNT(*) AS count_order
               FROM lineitem
               WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
               GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""")),

    // Q6: forecasting revenue change — the pure predicate-pushdown
    // flagship: a conjunctive filter (date window, discount band,
    // quantity cap) that must reach the parquet scan, one global
    // decimal-exact sum, zero joins and zero shuffles beyond the final
    // single-row combine. PlanSpec pins all three predicates pushed.
    Q("q6_forecast_revenue",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") >= lit("1997-01-01").cast("date")
          && col("l_shipdate").cast("date") < lit("1998-01-01").cast("date")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(dsum(expr("l_extendedprice * l_discount"), 4).as("revenue")),
      Some(s"""SELECT ${sqlDsum("l_extendedprice * l_discount", 4)} AS revenue
               FROM lineitem
               WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
                 AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
                 AND l_discount BETWEEN 0.05 AND 0.07
                 AND l_quantity < 24""")),

    // Q4: order-priority checking — orders in a three-quarter window with
    // at least one late lineitem (shipped > 60 days after the order),
    // counted by priority. The EXISTS shape: a fact↔fact LEFT SEMI join
    // on the order key — deliberately NOT broadcast (both sides scale
    // with the fact at 100 TB); one shuffle per side on l_orderkey, then
    // a 5-row aggregate. The 60-day lateness predicate lives in the join
    // condition, so each order counts once however many lines are late.
    Q("q4_order_priority",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey"),
            col("o_orderdate").cast("date").as("o_date"),
            col("o_orderpriority"))
          .filter(col("o_date") >= lit("1997-01-01").cast("date") &&
            col("o_date") < lit("1997-10-01").cast("date"))
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate").cast("date").as("l_date"))
        ord.join(li,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_date") > date_add(col("o_date"), 60),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
              FROM orders
              WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
                AND CAST(o_orderdate AS DATE) < DATE '1997-10-01'
                AND EXISTS (SELECT 1 FROM lineitem
                            WHERE l_orderkey = o_orderkey
                              AND CAST(l_shipdate AS DATE)
                                  > CAST(o_orderdate AS DATE) + 60)
              GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // Q17: small-quantity-order revenue — average yearly revenue lost if
    // orders below 20% of a part's average quantity were not filled, for
    // one brand×type slice. The correlated-subquery shape: the per-part
    // average broadcasts back onto the same filtered fact slice. Plan:
    // the brand×type part list broadcasts into the fact scan FIRST (so
    // the per-part average aggregates only the slice's lines — the
    // correlation never touches the full fact twice), then one partkey
    // shuffle for the average and a second broadcast join back. The
    // threshold is exact: decimal sum / count, one double multiply —
    // bit-identical across engines, so row membership can't flip.
    Q("q17_small_qty_revenue",
      (s, d) => {
        val pr = Tables.part(s, d)
          .filter(col("p_brand") === "Brand#17" && col("p_type") === "ECONOMY")
          .select("p_partkey")
        val lines = Tables.lineitem(s, d)
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .join(broadcast(pr), col("l_partkey") === col("p_partkey"))
        val thr = lines.groupBy("p_partkey")
          .agg((davg(col("l_quantity")) * 0.2).as("qty_thr"))
        lines.join(broadcast(thr), Seq("p_partkey"))
          .filter(col("l_quantity") < col("qty_thr"))
          .agg((dsum(col("l_extendedprice"), 2) / 7.0).as("avg_yearly"))
      },
      Some(s"""SELECT ${sqlDsum("l_extendedprice", 2)} / 7.0 AS avg_yearly
               FROM lineitem JOIN part ON p_partkey = l_partkey
               WHERE p_brand = 'Brand#17' AND p_type = 'ECONOMY'
                 AND l_quantity < (SELECT 0.2 * (${sqlDavg("l2.l_quantity")})
                                   FROM lineitem l2
                                   WHERE l2.l_partkey = p_partkey)""")),

    // Q18: large-volume customers — orders whose total quantity exceeds
    // the threshold, with their customer. The HAVING-subquery shape: one
    // fact shuffle keyed on l_orderkey for the quantity sum, the
    // surviving ~0.5% of orders join orders/customer WITHOUT broadcast
    // hints (at 100 TB the filtered set and both dims all scale — AQE
    // picks broadcast at test scale, shuffle join at fleet scale). The
    // quantity sum is exact decimal, so the > 250 cut is engine-stable.
    Q("q18_large_volume_orders",
      (s, d) => {
        val qty = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty_dec"))
          .filter(col("sum_qty_dec") > 250)
        val ord = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        val cust = Tables.customer(s, d).select("c_custkey", "c_name")
        ord.join(qty, col("o_orderkey") === col("l_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"),
            col("sum_qty_dec").cast("double").as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
                     CAST(o_orderkey AS BIGINT) AS o_orderkey,
                     CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
                     CAST(sum_qty_dec AS DOUBLE) AS sum_qty
              FROM (SELECT l_orderkey,
                           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec
                    FROM lineitem GROUP BY l_orderkey
                    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) q
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // Q7: volume shipping between nation groups — the ROLE-PLAYING
    // dimension shape: nation joins the fact TWICE under different
    // roles (supplier's nation, customer's nation), revenue grouped by
    // the directed (supp_nation, cust_nation, year) triple. Nation
    // broadcasts (25 rows at any SF); the supplier/customer joins stay
    // unhinted — both scale with the fact at 100 TB, AQE picks
    // broadcast at test scale. Adapted selectivity: supplier nations
    // 0–4 shipping to customer nations 20–24 (the named-pair form of
    // TPC-H Q7 selects zero rows at sf0.001's 15-customer population).
    Q("q7_nation_trade",
      (s, d) => {
        val n = Tables.nation(s, d)
        val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
          .join(broadcast(n.filter(col("n_nationkey") < 5)
              .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
          .join(broadcast(n.filter(col("n_nationkey") >= 20)
              .select(col("n_nationkey").as("cnk"),
                col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("cnk"))
          .select("c_custkey", "cust_nation")
        val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey")
          .join(cust, col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "cust_nation")
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount")
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(dsum(expr("l_extendedprice * (1 - l_discount)"), 4)
            .as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                      CAST(date_part('year', l_shipdate) AS BIGINT)
                        AS l_year,
                      ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)}
                        AS revenue
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN customer ON c_custkey = o_custkey
               JOIN nation n1 ON n1.n_nationkey = s_nationkey
               JOIN nation n2 ON n2.n_nationkey = c_nationkey
               WHERE n1.n_nationkey < 5 AND n2.n_nationkey >= 20
               GROUP BY 1, 2, 3
               ORDER BY supp_nation, cust_nation, l_year""")),

    // Q19: discounted revenue under a DISJUNCTION of conjunctive
    // clauses — the predicate-normalization shape: three OR'd
    // brand/type × quantity-band conditions spanning BOTH join sides.
    // The join key stays a clean equi-join; the DNF filter evaluates
    // post-join with its single-side implications (quantity bounds)
    // available for scan pushdown. Part broadcasts at test scale.
    Q("q19_disjunctive_revenue",
      (s, d) => {
        val pr = Tables.part(s, d).select("p_partkey", "p_brand", "p_type")
        Tables.lineitem(s, d)
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
          .join(broadcast(pr), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#17" && col("l_quantity") < 15) ||
            (col("p_brand") === "Brand#2" &&
              col("l_quantity").between(10, 30)) ||
            (col("p_type") === "ECONOMY" && col("l_quantity") > 40))
          .agg(dsum(expr("l_extendedprice * (1 - l_discount)"), 4)
              .as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)}
                        AS revenue,
                      COUNT(*) AS n_lines
               FROM lineitem JOIN part ON p_partkey = l_partkey
               WHERE (p_brand = 'Brand#17' AND l_quantity < 15)
                  OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30)
                  OR (p_type = 'ECONOMY' AND l_quantity > 40)""")),

    // Q15: top supplier — the ARGMAX-BY-SUBQUERY shape: an aggregate
    // view (per-supplier revenue), then equality against the view's own
    // MAX. The equality is on the EXACT decimal sum, so the argmax set
    // can never flip on a last-bit difference; the one-row max
    // broadcasts back onto the view.
    Q("q15_top_supplier",
      (s, d) => {
        // rev feeds TWO consumers (its own MAX and the equality join) —
        // persisted so the lineitem fact is scanned and aggregated ONCE;
        // the cached frame is |suppliers| rows, not fact-sized
        val rev = graft.ops.Caches.tracked(Tables.lineitem(s, d)
          .groupBy(col("l_suppkey").as("s_key"))
          .agg(sum(expr("l_extendedprice * (1 - l_discount)")
            .cast("decimal(18,4)")).as("rev_dec"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val top = rev.agg(max(col("rev_dec")).as("max_rev"))
        rev.join(broadcast(top), col("rev_dec") === col("max_rev"))
          .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
            col("s_key") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("rev_dec").cast("double").as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH r AS (SELECT l_suppkey,
                                 SUM(CAST(l_extendedprice * (1 - l_discount)
                                          AS DECIMAL(18,4))) AS rev
                          FROM lineitem GROUP BY l_suppkey)
               SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey, s_name,
                      CAST(rev AS DOUBLE) AS total_revenue
               FROM r JOIN supplier ON s_suppkey = l_suppkey
               WHERE rev = (SELECT MAX(rev) FROM r)
               ORDER BY s_suppkey""")),

    // Q22: global-sales opportunity — above-average-balance customers
    // with no RECENT order (every synthetic customer has SOME order, so
    // the anti-join is against the date-filtered fact), grouped by
    // nation. Shapes composed: scalar-subquery threshold (a one-row
    // broadcast), date-filtered LEFT ANTI join on the fact, small agg.
    // The average is exact decimal/count so the balance cut can't flip.
    Q("q22_inactive_customers",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val thr = cust.filter(col("c_acctbal") > 0)
          .agg(davg(col("c_acctbal")).as("avg_bal"))
        val recent = Tables.orders(s, d)
          .filter(col("o_orderdate").cast("date") >= lit("2000-01-01").cast("date"))
          .select("o_custkey")
        cust.crossJoin(broadcast(thr))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_custs"), dsum(col("c_acctbal"), 2).as("total_bal"))
          .orderBy("c_nationkey")
      },
      Some(s"""SELECT c_nationkey, COUNT(*) AS n_custs,
                      ${sqlDsum("c_acctbal", 2)} AS total_bal
               FROM customer
               WHERE c_acctbal > (SELECT ${sqlDavg("c_acctbal")}
                                  FROM customer WHERE c_acctbal > 0)
                 AND NOT EXISTS (SELECT 1 FROM orders
                                 WHERE o_custkey = c_custkey
                                   AND CAST(o_orderdate AS DATE)
                                       >= DATE '2000-01-01')
               GROUP BY c_nationkey ORDER BY c_nationkey"""))
  )
}
