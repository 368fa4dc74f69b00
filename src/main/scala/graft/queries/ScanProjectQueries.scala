package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables

/** SURVEY.md §2.1 scans + §2.2 projections/filters/predicates (S3, P1–P10).
  * Reference semantics: column select+rename (`cdisc_sdtm_mapping.py:14-23`),
  * null-on-failure coercion (`:22,54-55` / `:37-38`), literal/IN/not-null
  * filters (`stg_demographics.sql:37`, `feature_eng.py:34`,
  * `api/endpoints.py:373-390`), DISTINCT (`stg_subjects.sql:5-10`),
  * WHERE 1=0 schema template (`warehouse_ddl.sql:59`).
  */
object ScanProjectQueries {

  val all: Seq[Q] = Seq(

    Q("s3_scan_project",
      (s, d) => Tables.region(s, d)
        .select($cast("r_regionkey"), col("r_name"))
        .orderBy("r_regionkey"),
      Some("""SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
              FROM region ORDER BY r_regionkey""")),

    Q("p1_rename_project",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey").as("cust_id"),
          upper(col("c_name")).as("cust_name"),
          col("c_mktsegment").as("segment"))
        .orderBy("cust_id"),
      Some("""SELECT c_custkey AS cust_id, upper(c_name) AS cust_name,
                     c_mktsegment AS segment
              FROM customer ORDER BY cust_id""")),

    Q("p2_numeric_coerce",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          expr("try_cast(substr(p_brand, 7) AS DOUBLE)").as("brand_num"),
          expr("try_cast(p_type AS DOUBLE)").as("type_num"),
          col("p_size").cast("double").as("size_d"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     TRY_CAST(substr(p_brand, 7) AS DOUBLE) AS brand_num,
                     TRY_CAST(p_type AS DOUBLE) AS type_num,
                     CAST(p_size AS DOUBLE) AS size_d
              FROM part ORDER BY p_partkey""")),

    Q("p3_timestamp_coerce",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd")
            .cast("date").as("order_date"),
          expr("try_to_timestamp(o_orderpriority, 'yyyy-MM-dd')").isNull
            .as("bad_parse_is_null"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                     CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE)
                       AS order_date,
                     TRY_CAST(o_orderpriority AS TIMESTAMP) IS NULL AS bad_parse_is_null
              FROM orders ORDER BY o_orderkey""")),

    Q("p4_filter_eq",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
        .select(col("l_orderkey"), $cast("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
              FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'
              ORDER BY l_orderkey, l_linenumber LIMIT 500""")),

    Q("p5_in_list_filter",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, COUNT(*) AS n FROM orders
              WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    Q("p6_null_guard_filter",
      (s, d) => Tables.events(s, d)
        .filter(col("value").isNotNull && col("props").isNotNull)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n FROM events
              WHERE value IS NOT NULL AND props IS NOT NULL
              GROUP BY event_type ORDER BY event_type""")),

    Q("p8_pagination",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
        .offset(100).limit(50),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_orderkey LIMIT 50 OFFSET 100""")),

    Q("p9_distinct_projection",
      (s, d) => Tables.customer(s, d)
        .select(col("c_mktsegment"), $cast("c_nationkey"))
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey"),
      Some("""SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey
              FROM customer ORDER BY c_mktsegment, c_nationkey""")),

    Q("p10_empty_template",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))
        .filter(lit(false)),
      Some("SELECT c_custkey, c_name FROM customer WHERE 1 = 0"))
  )

  /** int32 column cast to BIGINT so Spark/oracle schemas agree. */
  private def $cast(c: String) = col(c).cast("long").as(c)
}
