package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import Q.{dsum, sqlDsum}

/** SURVEY.md §2.3 joins (J1–J6).
  * Reference semantics: star fact↔dim equi-joins (`analytics/queries.py:22,
  * 44,62-64`), multi-way left-join subject spine (`int_subject_summary.sql:
  * 118-122`), surrogate-key lookup (`warehouse/loaders.py:43-56`), left join
  * + zero-fill (`analytics/feature_eng.py:38-41`), referential-integrity
  * anti-join (dbt `relationships` tests).
  *
  * Scale notes: dims (region/nation/supplier, and customer up to ~10 M rows)
  * are explicit `broadcast()` candidates → BroadcastHashJoin, no shuffle of
  * the fact side. The customer⟕orders spine join shuffles on the key both
  * sides; at 100 TB that is the place to bucket both tables on the key.
  */
object JoinQueries {

  val all: Seq[Q] = Seq(

    // J1: fact ⋈ dims star join with broadcast dims, grouped revenue.
    Q("j1_star_join_broadcast",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            dsum(expr("l_extendedprice * (1 - l_discount)"), 4).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""SELECT r_name, n_name,
                      ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
                      COUNT(*) AS n_items
               FROM lineitem
               JOIN orders   ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation   ON c_nationkey = n_nationkey
               JOIN region   ON n_regionkey = r_regionkey
               GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // J2 + J4: left-join spine with per-domain aggregates and zero-fill.
    Q("j2_left_join_spine",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        val orderAgg = o.groupBy("o_custkey").agg(
          count(lit(1)).as("order_cnt"),
          dsum(col("o_totalprice")).as("total_spent"))
        val itemAgg = li.join(o.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey").agg(count(lit(1)).as("item_cnt"))
        c.select(col("c_custkey"), col("c_mktsegment"))
          .join(orderAgg, col("c_custkey") === orderAgg("o_custkey"), "left")
          .drop("o_custkey")
          .join(itemAgg, col("c_custkey") === itemAgg("o_custkey"), "left")
          .drop("o_custkey")
          .select(col("c_custkey"), col("c_mktsegment"),
            coalesce(col("order_cnt"), lit(0L)).as("order_cnt"),
            coalesce(col("total_spent"), lit(0.0)).as("total_spent"),
            coalesce(col("item_cnt"), lit(0L)).as("item_cnt"))
          .orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_mktsegment,
                      COALESCE(oa.order_cnt, 0) AS order_cnt,
                      COALESCE(oa.total_spent, 0.0) AS total_spent,
                      COALESCE(ia.item_cnt, 0) AS item_cnt
               FROM customer
               LEFT JOIN (SELECT o_custkey, COUNT(*) AS order_cnt,
                                 ${sqlDsum("o_totalprice")} AS total_spent
                          FROM orders GROUP BY o_custkey) oa
                 ON c_custkey = oa.o_custkey
               LEFT JOIN (SELECT o_custkey, COUNT(*) AS item_cnt
                          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          GROUP BY o_custkey) ia
                 ON c_custkey = ia.o_custkey
               ORDER BY c_custkey""")),

    // J2b: the SAME spine as j2 on a bucketed layout — the declared form
    // of the 100 TB answer PERF.md names for the nightly spine rebuild.
    // Customer and both aggregate sides are materialized bucketed+sorted
    // on the join key (ops.Scale.writeBucketed, 8 buckets each side);
    // Catalyst recognizes the shared HashPartitioning and plans the
    // three-way left join with ZERO exchanges — asserted in-query on the
    // join subtree (the final ORDER BY for the oracle adds its own range
    // exchange, as any ordered output must). The oracle is the PLAIN j2
    // SQL: bucketing must be invisible in the result, and the hash gate
    // proves it.
    Q("j2b_bucketed_spine_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        val orderAgg = o.groupBy("o_custkey").agg(
          count(lit(1)).as("order_cnt"),
          dsum(col("o_totalprice")).as("total_spent"))
        val itemAgg = li.join(o.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey").agg(count(lit(1)).as("item_cnt"))
        graft.ops.Scale.writeBucketed(
          c.select("c_custkey", "c_mktsegment"), "graft_j2b_cust", "c_custkey", 8)
        graft.ops.Scale.writeBucketed(orderAgg, "graft_j2b_ord", "o_custkey", 8)
        graft.ops.Scale.writeBucketed(itemAgg, "graft_j2b_item", "o_custkey", 8)
        // hint("merge") pins sort-merge on all sides: at test scale the
        // planner would otherwise broadcast the small sides (a
        // BroadcastExchange — correct there, but then the query would not
        // demonstrate the exchange-free bucketed plan it exists to pin)
        val cb = s.table("graft_j2b_cust").hint("merge")
        val ob = s.table("graft_j2b_ord").hint("merge")
        val ib = s.table("graft_j2b_item").hint("merge")
        val joined = cb
          .join(ob, cb("c_custkey") === ob("o_custkey"), "left")
          .drop("o_custkey")
          .join(ib, cb("c_custkey") === ib("o_custkey"), "left")
          .drop("o_custkey")
          .select(col("c_custkey"), col("c_mktsegment"),
            coalesce(col("order_cnt"), lit(0L)).as("order_cnt"),
            coalesce(col("total_spent"), lit(0.0)).as("total_spent"),
            coalesce(col("item_cnt"), lit(0L)).as("item_cnt"))
        require(!joined.queryExecution.executedPlan.toString.contains("Exchange"),
          "j2b bucketed spine join planned an exchange — bucket layout not used")
        joined.orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_mktsegment,
                      COALESCE(oa.order_cnt, 0) AS order_cnt,
                      COALESCE(oa.total_spent, 0.0) AS total_spent,
                      COALESCE(ia.item_cnt, 0) AS item_cnt
               FROM customer
               LEFT JOIN (SELECT o_custkey, COUNT(*) AS order_cnt,
                                 ${sqlDsum("o_totalprice")} AS total_spent
                          FROM orders GROUP BY o_custkey) oa
                 ON c_custkey = oa.o_custkey
               LEFT JOIN (SELECT o_custkey, COUNT(*) AS item_cnt
                          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          GROUP BY o_custkey) ia
                 ON c_custkey = ia.o_custkey
               ORDER BY c_custkey""")),

    // J3: natural-key lookup join (surrogate-key resolution shape).
    Q("j3_key_lookup_join",
      (s, d) => Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, s_name, n_name
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              ORDER BY s_suppkey""")),

    // J5: anti join — referential orphan detection shape.
    Q("j5_anti_join",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    // J7 (extension): explicit skew-salted join (ops.Scale.saltedJoin) —
    // the big side takes a random salt, the small side is exploded
    // salts×, so one pathological key spreads over `salts` reducers. The
    // oracle is the PLAIN join: salting must be invisible in the result,
    // and the hash gate proves it.
    Q("j7_salted_join_skew",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        graft.ops.Scale.saltedJoin(Tables.orders(s, d), cust, "o_custkey", salts = 8)
          .groupBy("c_mktsegment", "o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("c_mktsegment", "o_orderpriority")
      },
      Some(s"""SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n,
                      ${sqlDsum("o_totalprice")} AS total
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY 1, 2 ORDER BY c_mktsegment, o_orderpriority""")),

    // J-extension: Bloom runtime prefilter — the dim side's keys
    // aggregate into a broadcast bloom bitset and the fact side is
    // pruned by the codegen'd probe BEFORE the join, so rows that
    // cannot match never reach the shuffle (the explicit form of AQE's
    // runtime bloom filters). False positives are removed by the real
    // join; the oracle is the PLAIN join, and the hash gate proves the
    // prefilter is invisible in the result.
    Q("j8_bloom_prefilter_join",
      (s, d) => {
        val dim = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey", "c_name")
        val pre = graft.ops.Scale.bloomSemiFilter(
          Tables.orders(s, d), "o_custkey", dim, "c_custkey")
        pre.join(broadcast(dim), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, c_name, o_totalprice
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
              ORDER BY o_orderkey""")),

    // J6: semi join — existence filter without multiplying rows.
    Q("j6_semi_join",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority = '1-URGENT')
              ORDER BY c_custkey"""))
  )
}
