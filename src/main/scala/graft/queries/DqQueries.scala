package graft.queries

import org.apache.spark.sql.functions._
import graft.checks._
import graft.io.Tables

/** SURVEY.md §2.9 validation operators (V1–V8), executed through the
  * [[graft.checks.Checks]] engine so the oracle gate exercises the same code
  * paths the ingest pipeline uses.
  */
object DqQueries {

  val all: Seq[Q] = Seq(

    // V1 + V3 + V4 + V5 + V6 in one single-pass suite over events.
    Q("v1_check_suite_events",
      (s, d) => Checks.evaluate(Tables.events(s, d), Seq(
        NotNull("event_type"),
        NotNull("value"),
        InSet("event_type", Seq("click", "view", "purchase", "signup", "error")),
        InRange("value", 0.0, 1000.0),
        MaxLength("event_type", 16),
        MatchesRegex("event_type", "^[a-z_]+$"),
        CrossColumn("purchase_value_positive",
          !(col("event_type") === "purchase") || col("value") > 0))),
      Some("""SELECT
                CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type_null,
                CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_null,
                CAST(SUM(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
                         ('click','view','purchase','signup','error')
                         THEN 1 ELSE 0 END) AS BIGINT) AS event_type_not_in_set,
                CAST(SUM(CASE WHEN value IS NOT NULL AND (value < 0.0 OR value > 1000.0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS value_out_of_range,
                CAST(SUM(CASE WHEN event_type IS NOT NULL AND length(event_type) > 16
                         THEN 1 ELSE 0 END) AS BIGINT) AS event_type_too_long,
                CAST(SUM(CASE WHEN event_type IS NOT NULL
                          AND NOT regexp_matches(event_type, '^[a-z_]+$')
                         THEN 1 ELSE 0 END) AS BIGINT) AS event_type_bad_format,
                CAST(SUM(CASE WHEN (NOT (event_type = 'purchase') OR value > 0) IS NOT NULL
                          AND NOT (NOT (event_type = 'purchase') OR value > 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS purchase_value_positive
              FROM events""")),

    // V1/V4/V6 red-green pair on lineitem (violations intentionally > 0).
    Q("v4_check_suite_lineitem",
      (s, d) => Checks.evaluate(Tables.lineitem(s, d), Seq(
        InRange("l_discount", 0.0, 0.05),
        InRange("l_quantity", 1.0, 50.0),
        CrossColumn("price_at_least_qty", col("l_extendedprice") >= col("l_quantity")))),
      Some("""SELECT
                CAST(SUM(CASE WHEN l_discount IS NOT NULL
                          AND (l_discount < 0.0 OR l_discount > 0.05)
                         THEN 1 ELSE 0 END) AS BIGINT) AS l_discount_out_of_range,
                CAST(SUM(CASE WHEN l_quantity IS NOT NULL
                          AND (l_quantity < 1.0 OR l_quantity > 50.0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity_out_of_range,
                CAST(SUM(CASE WHEN NOT (l_extendedprice >= l_quantity)
                         THEN 1 ELSE 0 END) AS BIGINT) AS price_at_least_qty
              FROM lineitem""")),

    // V2: duplicate-key counters (PK uniqueness).
    Q("v2_unique_violations",
      (s, d) => {
        val dupOrders = Checks.duplicateKeyCount(Tables.orders(s, d), Seq("o_orderkey"))
        val dupLines = Checks.duplicateKeyCount(
          Tables.lineitem(s, d), Seq("l_orderkey", "l_linenumber"))
        dupOrders.crossJoin(dupLines)
      },
      Some("""SELECT
                (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                   GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS o_orderkey_dup_keys,
                (SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem
                   GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
                  AS l_orderkey_l_linenumber_dup_keys""")),

    // V7: row-count sanity bounds (reference: 100 ≤ persons ≤ 10 000).
    Q("v7_rowcount_bounds",
      (s, d) => Checks.rowCountInBounds(Tables.customer(s, d), 10L, 10000000L),
      Some("""SELECT COUNT(*) AS n_rows,
                     COUNT(*) >= 10 AND COUNT(*) <= 10000000 AS in_bounds
              FROM customer""")),

    // V8: referential-integrity orphan counts (dbt relationships test).
    Q("v8_referential_orphans",
      (s, d) => {
        val orders = Tables.orders(s, d)
        val orphanOrders = Checks
          .orphans(orders, "o_custkey", Tables.customer(s, d), "c_custkey")
          .agg(count(lit(1)).as("orphan_orders"))
        val orphanItems = Checks
          .orphans(Tables.lineitem(s, d), "l_orderkey", orders, "o_orderkey")
          .agg(count(lit(1)).as("orphan_lineitems"))
        orphanOrders.crossJoin(orphanItems)
      },
      Some("""SELECT
                (SELECT COUNT(*) FROM orders WHERE NOT EXISTS
                  (SELECT 1 FROM customer WHERE c_custkey = o_custkey)) AS orphan_orders,
                (SELECT COUNT(*) FROM lineitem WHERE NOT EXISTS
                  (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
                  AS orphan_lineitems""")),

    // V10 (extension): per-group z-score outlier rate — the numeric
    // anomaly scan a profiling pass runs before pinning range checks.
    // Mean/stddev derive from EXACT decimal sums (x and x² summed in
    // decimal, double math only at the end), so the rate is bit-stable
    // under partial aggregation and the oracle replays it exactly.
    Q("v10_outlier_zscore",
      (s, d) => Profiler.zscoreOutliers(
          Tables.lineitem(s, d).select(col("l_returnflag"),
            col("l_extendedprice").cast("decimal(18,2)").as("x")),
          "l_returnflag", "x", sigmas = 3.0)
        .orderBy("l_returnflag"),
      Some("""WITH li AS (SELECT l_returnflag,
                                 CAST(l_extendedprice AS DECIMAL(18,2)) AS x
                          FROM lineitem),
                   st AS (SELECT l_returnflag, COUNT(*) AS sn,
                                 SUM(x) AS s, SUM(x * x) AS s2
                          FROM li GROUP BY 1)
              SELECT li.l_returnflag, COUNT(*) AS n,
                     CAST(SUM(CASE WHEN abs(CAST(x AS DOUBLE)
                                  - CAST(s AS DOUBLE) / CAST(sn AS DOUBLE))
                                > 3.0 * sqrt((CAST(s2 AS DOUBLE)
                                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                      / CAST(sn AS DOUBLE))
                                  / (CAST(sn AS DOUBLE) - 1.0))
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                     ROUND(CAST(SUM(CASE WHEN abs(CAST(x AS DOUBLE)
                                  - CAST(s AS DOUBLE) / CAST(sn AS DOUBLE))
                                > 3.0 * sqrt((CAST(s2 AS DOUBLE)
                                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                      / CAST(sn AS DOUBLE))
                                  / (CAST(sn AS DOUBLE) - 1.0))
                              THEN 1 ELSE 0 END) AS DOUBLE)
                           / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate
              FROM li JOIN st
                ON li.l_returnflag IS NOT DISTINCT FROM st.l_returnflag
              GROUP BY li.l_returnflag ORDER BY li.l_returnflag""")),

    // V11 (extension): table profiler — per-column row/null/distinct
    // counts and stringified min/max in ONE aggregation pass (the GE
    // bootstrap flow: profile first, then pin expectations). The double
    // price column is cast to decimal first because double→string
    // formatting is engine-specific; long/string/date/decimal are not.
    Q("v11_profile",
      (s, d) => Profiler.profile(
          Tables.orders(s, d).withColumn("o_totalprice_d",
            col("o_totalprice").cast("decimal(18,2)")),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
            "o_totalprice_d"))
        .orderBy("col_name"),
      Some {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_orderdate", "o_totalprice_d")
        val branches = cols.map { c =>
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
                     COUNT(*) - COUNT($c) AS n_null,
                     COUNT(DISTINCT $c) AS n_distinct,
                     CAST(MIN($c) AS VARCHAR) AS min_value,
                     CAST(MAX($c) AS VARCHAR) AS max_value
              FROM t"""
        }.mkString(" UNION ALL ")
        s"""WITH t AS (SELECT *, CAST(o_totalprice AS DECIMAL(18,2))
                         AS o_totalprice_d FROM orders)
            $branches ORDER BY col_name"""
      }),

    // V12: CROSS-TABLE reconciliation — the warehouse parity check the
    // single-table suites (v1–v11) cannot express: each order's header
    // total against the exact decimal sum of its lineitems, drift
    // bucketed by status. One fact↔fact shuffle keyed on the order key
    // (the honest shape — neither side broadcasts at 100 TB); the
    // lineitem side pre-aggregates BEFORE the join so the shuffle
    // carries one row per order, not per line. The synthetic header
    // totals deliberately do not reconcile — the operator's job is to
    // MEASURE that, and the drift numbers themselves sit under the
    // hash (exact decimal line sums; identical double ratio both
    // engines).
    Q("v12_cross_table_reconciliation",
      (s, d) => {
        val lineSums = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("line_total"))
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
          .join(lineSums, col("o_orderkey") === col("l_orderkey"), "left")
          .withColumn("rel_drift",
            abs(coalesce(col("line_total"), lit(0.0)) - col("o_totalprice"))
              / col("o_totalprice"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("line_total").isNull, 1L).otherwise(0L))
              .as("n_headerless"),
            sum(when(col("rel_drift") > 0.05, 1L).otherwise(0L))
              .as("n_drifted"),
            round(max(col("rel_drift")), 6).as("max_rel_drift"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH ls AS (SELECT l_orderkey,
                                 CAST(SUM(CAST(l_extendedprice
                                               AS DECIMAL(18,2)))
                                      AS DOUBLE) AS line_total
                          FROM lineitem GROUP BY l_orderkey),
                   j AS (SELECT o_orderstatus, line_total,
                                ABS(COALESCE(line_total, 0.0)
                                    - o_totalprice) / o_totalprice
                                  AS rel_drift
                         FROM orders LEFT JOIN ls
                           ON o_orderkey = l_orderkey)
              SELECT o_orderstatus, COUNT(*) AS n_orders,
                     CAST(SUM(CASE WHEN line_total IS NULL
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_headerless,
                     CAST(SUM(CASE WHEN rel_drift > 0.05
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_drifted,
                     ROUND(MAX(rel_drift), 6) AS max_rel_drift
              FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus"""))
  )
}
