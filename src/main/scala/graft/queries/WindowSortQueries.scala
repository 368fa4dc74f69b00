package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import Q.{dsum, sqlDsum}

/** SURVEY.md §2.5 windows (W1–W3), §2.6 sorts/limits (O1–O4), §2.7 set ops
  * (U1 + intersect/except extensions).
  * Reference semantics: running count per partition
  * (`sql/performance_examples.sql:4-12`), percent-of-partition-total
  * (`warehouse_ddl.sql:247`), ROW_NUMBER surrogate key
  * (`warehouse/loaders.py:31` — pinned to an explicit ordering per SURVEY
  * §7.3 risk #2), multi-key / aggregate / CASE-custom sorts
  * (`analytics/queries.py:28,46`, `warehouse_ddl.sql:262-268`), head-N
  * (`ui/dashboard.py:296`), chunk concat UNION ALL (`ingest_csv.py:99-109`).
  *
  * Window partitions here are per-customer / per-status — bounded key
  * cardinality with small per-key row counts, so no single-partition window
  * bottleneck at scale. The only global window (surrogate key) is documented
  * as dim-scale-only.
  */
object WindowSortQueries {

  val all: Seq[Q] = Seq(

    Q("w1_running_count",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            count(lit(1)).over(w).as("running_orders"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
                     COUNT(*) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS running_orders
              FROM orders ORDER BY o_custkey, o_orderkey""")),

    Q("w2_pct_of_partition",
      (s, d) => {
        val grouped = Tables.orders(s, d)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
        grouped
          .withColumn("pct", round(
            col("n").cast("double") * 100.0 /
              sum(col("n")).over(Window.partitionBy("o_orderstatus")).cast("double"),
            6))
          .orderBy("o_orderstatus", "o_orderpriority")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, n,
                     ROUND(CAST(n AS DOUBLE) * 100.0 /
                           CAST(SUM(n) OVER (PARTITION BY o_orderstatus) AS DOUBLE), 6)
                       AS pct
              FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
                    FROM orders GROUP BY o_orderstatus, o_orderpriority)
              ORDER BY o_orderstatus, o_orderpriority""")),

    // W3: surrogate key minting — explicit unique ordering for determinism.
    Q("w3_row_number_surrogate",
      (s, d) => Tables.supplier(s, d)
        .select(col("s_suppkey"),
          row_number().over(Window.orderBy("s_suppkey")).cast("long").as("supplier_sk"))
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey,
                     CAST(ROW_NUMBER() OVER (ORDER BY s_suppkey) AS BIGINT) AS supplier_sk
              FROM supplier ORDER BY s_suppkey""")),

    // W5 (extension): SCD2 dimension derived from the event log — runs of
    // consecutive identical event_type per user become [valid_from,
    // valid_to) versions (graft.warehouse.Scd2). Oracle replays the
    // gaps-and-islands formulation in DuckDB.
    Q("w5_scd2_dimension",
      (s, d) => graft.warehouse.Scd2.fromHistory(
          Tables.events(s, d).select(col("user_id"), col("event_type"),
            col("ts"), col("event_id")),
          key = "user_id", attrs = Seq("event_type"),
          ts = "ts", tieBreak = "event_id")
        .select(col("user_id"), col("event_type"),
          col("valid_from").cast("long").as("valid_from_sec"),
          col("valid_to").cast("long").as("valid_to_sec"),
          col("is_current"))
        .orderBy("user_id", "valid_from_sec"),
      Some("""WITH ordered AS (
                SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t, event_id,
                       CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                            THEN 1 ELSE 0 END AS chg
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              runs AS (
                SELECT user_id, event_type, t,
                       SUM(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
                FROM ordered),
              vers AS (
                SELECT user_id, event_type, run, MIN(t) AS vf
                FROM runs GROUP BY 1, 2, 3),
              dim AS (
                SELECT user_id, event_type, vf,
                       lead(vf) OVER (PARTITION BY user_id ORDER BY vf, run) AS vt
                FROM vers)
              SELECT user_id, event_type,
                     CAST(floor(epoch(vf)) AS BIGINT) AS valid_from_sec,
                     CAST(floor(epoch(vt)) AS BIGINT) AS valid_to_sec,
                     vt IS NULL AS is_current
              FROM dim ORDER BY user_id, valid_from_sec""")),

    // W6 (extension): RANGE-frame rolling window — 30-day trailing order
    // count and exact spend per customer, keyed on day number so the
    // frame is value-based (RANGE), not row-based.
    Q("w6_rolling_30d_spend",
      (s, d) => {
        val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("__day"))
          .rangeBetween(-29, 0)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            day.as("__day"))
          .withColumn("n_30d", count(lit(1)).over(w))
          .withColumn("spend_30d",
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
              .cast("double"))
          .select(col("o_orderkey"), col("o_custkey"), col("n_30d"), col("spend_30d"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
                     COUNT(*) OVER w AS n_30d,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                       AS spend_30d
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                           RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
              ORDER BY o_orderkey""")),

    // A16 (extension): native pivot — order counts by priority with one
    // column per status. Missing combinations are zero-filled so the
    // shape matches the conditional-aggregation oracle exactly.
    Q("a16_pivot_status_counts",
      (s, d) => {
        val p = Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .count()
        p.select(col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("n_f"),
            coalesce(col("O"), lit(0L)).as("n_o"),
            coalesce(col("P"), lit(0L)).as("n_p"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
                     CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                     CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
                     CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    Q("o1_multikey_sort",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate").cast("date").as("order_date"))
        .orderBy(col("o_orderpriority"), col("o_orderdate").desc, col("o_orderkey"))
        .limit(100),
      Some("""SELECT o_orderkey, o_orderpriority, CAST(o_orderdate AS DATE) AS order_date
              FROM orders
              ORDER BY o_orderpriority, o_orderdate DESC, o_orderkey LIMIT 100""")),

    Q("o2_sort_by_aggregate",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(dsum(expr("l_extendedprice * (1 - l_discount)"), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey"))
        .limit(20),
      Some(s"""SELECT l_partkey,
                      ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
               FROM lineitem GROUP BY l_partkey
               ORDER BY revenue DESC, l_partkey LIMIT 20""")),

    // O3: CASE-expression custom sort (quality-bucket ordering shape).
    Q("o3_case_custom_sort",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .withColumn("prio_rank",
          when(col("o_orderpriority") === "1-URGENT", 1L)
            .when(col("o_orderpriority") === "2-HIGH", 2L)
            .when(col("o_orderpriority") === "3-MEDIUM", 3L)
            .otherwise(9L))
        .orderBy("prio_rank", "o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
                     CAST(CASE o_orderpriority
                       WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                       WHEN '3-MEDIUM' THEN 3 ELSE 9 END AS BIGINT) AS prio_rank
              FROM orders GROUP BY o_orderpriority
              ORDER BY prio_rank, o_orderpriority""")),

    Q("o4_top_n",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // O-extension: deterministic per-group inspection sample — k docs per
    // language ranked by a portable seeded hash of the id (the "pull 3
    // examples per slice for review" shape; hash order makes the sample
    // stable across runs/engines, unlike TABLESAMPLE). The rank-limit
    // filter rewrites to WindowGroupLimit (emb8's pattern): each task
    // keeps only k rows per group BEFORE the shuffle, so no per-group
    // sort of data-sized partitions ever materializes.
    Q("o5_deterministic_group_sample",
      (s, d) => {
        val h = graft.text.TextFunctions.hash60(
          col("doc_id").cast("string"), 11)
        val w = Window.partitionBy("lang").orderBy(h.asc, col("doc_id").asc)
        Tables.documents(s, d)
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("lang"), col("rk"), col("doc_id"))
          .orderBy("lang", "rk")
      },
      Some("""SELECT lang, rk, doc_id
              FROM (SELECT lang, doc_id,
                           ROW_NUMBER() OVER (PARTITION BY lang
                             ORDER BY CAST(('0x' || substr(md5('11|' ||
                                 CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                               doc_id) AS rk
                    FROM documents)
              WHERE rk <= 3 ORDER BY lang, rk""")),

    // W-extension: interval-census sweep — items in transit per day (the
    // occupancy/on-study-census shape). Transit windows are derived
    // deterministically (ship date + linenumber%7 days — the testdata has
    // no receipt date) so the oracle replays them exactly. The data-sized
    // work collapses to per-day net deltas in one map-side-combined
    // shuffle; the cumulative window then runs over DISTINCT DAYS only
    // (~2.5k rows for 7 years), so the ordered global window is
    // dimension-scale by construction — the sweep-line answer to interval
    // overlap counting without an interval join.
    Q("w7_interval_census",
      (s, d) => graft.ops.TimeSeries.intervalCensus(
          Tables.lineitem(s, d).select(
            col("l_shipdate").cast("date").as("ship_day"),
            date_add(col("l_shipdate").cast("date"), col("l_linenumber") % 7)
              .as("receipt_day")),
          "ship_day", "receipt_day")
        .orderBy("day"),
      Some("""WITH iv AS (SELECT CAST(l_shipdate AS DATE) AS s,
                                 CAST(l_shipdate AS DATE) + (l_linenumber % 7) AS e
                          FROM lineitem),
                   deltas AS (SELECT s AS day, 1 AS d FROM iv
                              UNION ALL
                              SELECT e + 1, -1 FROM iv),
                   net AS (SELECT day, SUM(d) AS net FROM deltas GROUP BY day
                           HAVING SUM(d) <> 0)
              SELECT day, CAST(SUM(net) OVER (ORDER BY day) AS BIGINT) AS census
              FROM net ORDER BY day""")),

    // W-extension: cumulative distinct users by day — the "total users
    // to date" growth curve. COUNT(DISTINCT) under a running window is a
    // data-scale quadratic trap; the first-seen trick makes it two
    // group-cardinality aggregations (min day per user, then new-users
    // per day) and a cumulative sum over DISTINCT DAYS — the same
    // dimension-scale window argument as w7.
    Q("w8_cumulative_uniques",
      (s, d) => {
        val firstSeen = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(min(col("o_orderdate")).as("day"))
        firstSeen.groupBy("day").agg(count(lit(1)).as("new_customers"))
          .withColumn("cum_customers",
            sum(col("new_customers")).over(Window.orderBy("day")))
          .select(col("day"), col("new_customers"), col("cum_customers"))
          .orderBy("day")
      },
      Some("""WITH fs AS (SELECT o_custkey, MIN(o_orderdate) AS day
                          FROM orders GROUP BY o_custkey),
                   nu AS (SELECT day, COUNT(*) AS new_customers
                          FROM fs GROUP BY day)
              SELECT day, new_customers,
                     CAST(SUM(new_customers) OVER (ORDER BY day) AS BIGINT)
                       AS cum_customers
              FROM nu ORDER BY day""")),

    // W9: NTILE decile bucketing — the standard spend-segmentation shape
    // (customer lifetime value deciles). Ties at bucket boundaries are
    // pinned by the unique (spend DESC, custkey) order, so NTILE's
    // remainder-to-front allocation is deterministic and both engines
    // agree verbatim. The global window sorts the per-customer AGGREGATE
    // (dim-scale: one row per customer, 15k at sf0.1 — never the fact
    // table); at 100 TB the pre-aggregation is the shuffle and the
    // decile sort stays a single slim stage.
    Q("w9_ntile_deciles",
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(dsum(col("o_totalprice")).as("spend"))
        perCust
          .withColumn("decile", ntile(10).over(
            Window.orderBy(col("spend").desc, col("o_custkey"))).cast("long"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_customers"),
            dsum(col("spend")).as("decile_spend"),
            min(col("spend")).as("floor_spend"),
            max(col("spend")).as("ceil_spend"))
          .orderBy("decile")
      },
      Some(s"""WITH pc AS (SELECT o_custkey,
                                  ${sqlDsum("o_totalprice")} AS spend
                           FROM orders GROUP BY o_custkey),
                   dd AS (SELECT spend,
                                 NTILE(10) OVER (ORDER BY spend DESC,
                                                 o_custkey) AS decile
                          FROM pc)
               SELECT CAST(decile AS BIGINT) AS decile,
                      COUNT(*) AS n_customers,
                      ${sqlDsum("spend")} AS decile_spend,
                      MIN(spend) AS floor_spend,
                      MAX(spend) AS ceil_spend
               FROM dd GROUP BY decile ORDER BY decile""")),

    // W10: relative-standing windows — percent_rank and cume_dist per
    // market segment over the per-customer order spend, top 5 spenders
    // per segment. Both are exact small-integer ratios ((rank−1)/(n−1),
    // rank_with_ties/n) so the doubles are bit-identical across engines.
    // The window partitions by segment over the ALREADY-aggregated
    // per-customer frame (orders-count rows, not fact rows) — the same
    // dim-scale-window discipline as w9.
    Q("w10_percent_rank",
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(dsum(col("o_totalprice")).as("spend"))
          .join(broadcast(Tables.customer(s, d)
            .select("c_custkey", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("spend").desc, col("o_custkey"))
        perCust
          .withColumn("pct_rank", round(percent_rank().over(w), 6))
          .withColumn("cume", round(cume_dist().over(w), 6))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("c_mktsegment"), col("rn").cast("long").as("rn"),
            col("o_custkey"), col("spend"), col("pct_rank"), col("cume"))
          .orderBy("c_mktsegment", "rn")
      },
      Some(s"""WITH pc AS (SELECT o_custkey,
                                  ${sqlDsum("o_totalprice")} AS spend
                           FROM orders GROUP BY o_custkey),
                   ranked AS (SELECT c_mktsegment, o_custkey, spend,
                                ROUND(PERCENT_RANK() OVER win, 6) AS pct_rank,
                                ROUND(CUME_DIST() OVER win, 6) AS cume,
                                ROW_NUMBER() OVER win AS rn
                              FROM pc JOIN customer ON c_custkey = o_custkey
                              WINDOW win AS (PARTITION BY c_mktsegment
                                             ORDER BY spend DESC, o_custkey))
               SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, o_custkey,
                      spend, pct_rank, cume
               FROM ranked WHERE rn <= 5
               ORDER BY c_mktsegment, rn""")),

    Q("u1_union_all",
      (s, d) => {
        val o = Tables.orders(s, d)
        val high = o.filter(col("o_totalprice") > 300000)
          .select(lit("high_value").as("src"), col("o_orderkey"))
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
          .select(lit("urgent").as("src"), col("o_orderkey"))
        high.unionByName(urgent).orderBy("src", "o_orderkey")
      },
      Some("""SELECT 'high_value' AS src, o_orderkey FROM orders WHERE o_totalprice > 300000
              UNION ALL
              SELECT 'urgent' AS src, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
              ORDER BY src, o_orderkey""")),

    // U-extension: union across drifted schemas — a legacy extract
    // without a column concatenated with a modern one that has it
    // (unionByName + allowMissingColumns null-fills by NAME, where
    // positional unionAll would silently misalign).
    Q("u4_union_schema_drift",
      (s, d) => {
        val o = Tables.orders(s, d)
        val legacy = o.filter(month(col("o_orderdate")) === 1)
          .select(col("o_orderkey"), col("o_totalprice"))
        val modern = o.filter(month(col("o_orderdate")) === 2)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"))
        legacy.unionByName(modern, allowMissingColumns = true)
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice,
                     CAST(NULL AS VARCHAR) AS o_orderpriority
              FROM orders WHERE date_part('month', o_orderdate) = 1
              UNION ALL
              SELECT o_orderkey, o_totalprice, o_orderpriority
              FROM orders WHERE date_part('month', o_orderdate) = 2
              ORDER BY o_orderkey""")),

    Q("u2_intersect",
      (s, d) => {
        val o = Tables.orders(s, d)
        val jan = o.filter(month(col("o_orderdate")) === 1).select("o_custkey")
        val feb = o.filter(month(col("o_orderdate")) === 2).select("o_custkey")
        jan.intersect(feb).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE date_part('month', o_orderdate) = 1
              INTERSECT
              SELECT o_custkey FROM orders WHERE date_part('month', o_orderdate) = 2
              ORDER BY o_custkey""")),

    Q("u3_except",
      (s, d) => {
        val o = Tables.orders(s, d)
        val jan = o.filter(month(col("o_orderdate")) === 1).select("o_custkey")
        val feb = o.filter(month(col("o_orderdate")) === 2).select("o_custkey")
        jan.except(feb).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE date_part('month', o_orderdate) = 1
              EXCEPT
              SELECT o_custkey FROM orders WHERE date_part('month', o_orderdate) = 2
              ORDER BY o_custkey"""))
  )
}
