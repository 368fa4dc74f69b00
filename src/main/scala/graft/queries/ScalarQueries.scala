package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import Q.{davg, sqlDavg}

/** SURVEY.md §2.8 scalar functions (F1–F16).
  * Reference semantics: upper/coalesce defaults (`stg_adverse_events.sql:
  * 16-18`), lower+LIKE categorization (`stg_exposure.sql:33-35`), CASE-WHEN
  * bucketing (`clinical_utils.sql:3-108`), day date-diff
  * (`stg_adverse_events.sql:21-25`), date-part (`analytics/queries.py:21`),
  * casts, round, arithmetic normalization (`stg_laboratory.sql:30-34`),
  * md5 surrogate keys (`fact_subject_outcomes.sql:19`), salted sha-256
  * (`security/phi_redaction.py:10-15`), regex validation predicates
  * (`pandera_schemas.py:24-25`), logistic scoring (`api/main.py:174-192`),
  * Welch t statistic (`analytics/stats_utils.py:9-23`), JSON field
  * extraction (manifest/report handling shape, `public_cdm.py:83-101`).
  */
object ScalarQueries {

  val all: Seq[Q] = Seq(

    Q("f1_upper_coalesce",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          upper(col("c_name")).as("name_uc"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("UNKNOWN"))
            .as("segment_or_unknown"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, upper(c_name) AS name_uc,
                     COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN')
                       AS segment_or_unknown
              FROM customer ORDER BY c_custkey""")),

    Q("f2_like_categorize",
      (s, d) => Tables.part(s, d)
        .withColumn("category",
          when(lower(col("p_type")).like("%economy%"), "ECONOMY_LINE")
            .when(lower(col("p_type")).like("%standard%"), "STANDARD_LINE")
            .when(lower(col("p_type")).like("%small%"), "SMALL_LINE")
            .otherwise("OTHER"))
        .groupBy("category").agg(count(lit(1)).as("n"))
        .orderBy("category"),
      Some("""SELECT CASE WHEN lower(p_type) LIKE '%economy%' THEN 'ECONOMY_LINE'
                          WHEN lower(p_type) LIKE '%standard%' THEN 'STANDARD_LINE'
                          WHEN lower(p_type) LIKE '%small%' THEN 'SMALL_LINE'
                          ELSE 'OTHER' END AS category,
                     COUNT(*) AS n
              FROM part GROUP BY 1 ORDER BY category""")),

    // F3: CASE-WHEN bucketing — the reference's workhorse (age bands, dose
    // bands, clinical flags) re-expressed as balance/size bands.
    Q("f3_case_bucketing",
      (s, d) => Tables.customer(s, d)
        .withColumn("bal_band",
          when(col("c_acctbal") < 0, "NEGATIVE")
            .when(col("c_acctbal") < 3000, "LOW")
            .when(col("c_acctbal") < 7000, "MEDIUM")
            .otherwise("HIGH"))
        .groupBy("bal_band").agg(count(lit(1)).as("n"))
        .orderBy("bal_band"),
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
                          WHEN c_acctbal < 3000 THEN 'LOW'
                          WHEN c_acctbal < 7000 THEN 'MEDIUM'
                          ELSE 'HIGH' END AS bal_band,
                     COUNT(*) AS n
              FROM customer GROUP BY 1 ORDER BY bal_band""")),

    // F4: day difference (AE duration shape); avg of exact ints is exact.
    Q("f4_date_diff_days",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("ship_delay"), col("o_orderstatus"))
        .groupBy("o_orderstatus")
        .agg(avg(col("ship_delay")).as("avg_delay"),
          max(col("ship_delay")).as("max_delay"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
                     AVG(CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                        CAST(l_shipdate AS DATE)) AS BIGINT)) AS avg_delay,
                     MAX(CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                        CAST(l_shipdate AS DATE)) AS BIGINT)) AS max_delay,
                     COUNT(*) AS n
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    Q("f5_date_part",
      (s, d) => Tables.orders(s, d)
        .groupBy(month(col("o_orderdate")).cast("long").as("order_month"),
          dayofmonth(col("o_orderdate")).cast("long").as("order_dom"))
        .agg(count(lit(1)).as("n"))
        .orderBy("order_month", "order_dom"),
      Some("""SELECT CAST(date_part('month', o_orderdate) AS BIGINT) AS order_month,
                     CAST(date_part('day', o_orderdate) AS BIGINT) AS order_dom,
                     COUNT(*) AS n
              FROM orders GROUP BY 1, 2 ORDER BY order_month, order_dom""")),

    // F6: cast matrix. NB double→int differs between engines (Spark
    // truncates, DuckDB rounds) so the truncation is made explicit.
    Q("f6_cast_matrix",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          floor(col("o_totalprice")).cast("long").as("price_floor"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_orderdate").cast("date").as("order_date"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                     CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
                     CAST(o_orderkey AS VARCHAR) AS key_str,
                     CAST(o_orderdate AS DATE) AS order_date
              FROM orders ORDER BY o_orderkey""")),

    // F7: round via exact decimal (half-up agrees in both engines on exact
    // decimals; rounding raw doubles would be representation-dependent).
    Q("f7_round_decimal",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          round(col("o_totalprice").cast("decimal(18,2)"), 1).cast("double")
            .as("price_round1"),
          round(col("o_totalprice").cast("decimal(18,2)"), -2).cast("double")
            .as("price_round_hundreds"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                     CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE)
                       AS price_round1,
                     CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), -2) AS DOUBLE)
                       AS price_round_hundreds
              FROM orders ORDER BY o_orderkey""")),

    // F8: arithmetic normalization (lab-range shape) — exact decimal algebra.
    Q("f8_arith_normalize",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE)""").as("charge"))
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                          * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS charge
              FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000""")),

    // F10: md5 surrogate key (dbt_utils.generate_surrogate_key shape).
    Q("f10_md5_surrogate",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          md5(coalesce(col("c_custkey").cast("string"), lit(""))).as("cust_sk"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                     md5(COALESCE(CAST(c_custkey AS VARCHAR), '')) AS cust_sk
              FROM customer ORDER BY c_custkey""")),

    // F11: salted SHA-256 irreversible hash (PHI pseudonymization shape).
    Q("f11_sha2_tokenize",
      (s, d) => Tables.supplier(s, d)
        .select(col("s_suppkey"),
          sha2(concat(lit("pepper::"), col("s_name")), 256).as("name_token"))
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, sha256('pepper::' || s_name) AS name_token
              FROM supplier ORDER BY s_suppkey""")),

    // F13: regex validation predicates as violation counters.
    Q("f13_regex_validate",
      (s, d) => Tables.customer(s, d)
        .agg(
          sum(when(col("c_name").rlike("^Customer#[0-9]+$"), 0L).otherwise(1L))
            .as("bad_name_format"),
          sum(when(col("c_mktsegment") === upper(col("c_mktsegment")), 0L).otherwise(1L))
            .as("not_uppercase"),
          sum(when(length(col("c_name")) <= 25, 0L).otherwise(1L)).as("too_long")),
      Some("""SELECT CAST(SUM(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]+$')
                              THEN 0 ELSE 1 END) AS BIGINT) AS bad_name_format,
                     CAST(SUM(CASE WHEN c_mktsegment = upper(c_mktsegment)
                              THEN 0 ELSE 1 END) AS BIGINT) AS not_uppercase,
                     CAST(SUM(CASE WHEN length(c_name) <= 25 THEN 0 ELSE 1 END) AS BIGINT) AS too_long
              FROM customer""")),

    // F14: logistic risk score (api/main.py:174-192 shape); exp() may differ
    // in the last ulp between libm implementations → round 6.
    Q("f14_logistic_score",
      (s, d) => {
        val feats = Tables.customer(s, d)
          .join(Tables.orders(s, d).groupBy("o_custkey")
              .agg(count(lit(1)).as("order_cnt")),
            col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            coalesce(col("order_cnt"), lit(0L)).as("order_cnt"),
            col("c_acctbal"))
        feats.select(col("c_custkey"),
          round(lit(1.0) /
            (lit(1.0) + exp(-(lit(0.0001) * col("c_acctbal")
              + lit(0.3) * col("order_cnt") - lit(2.0)))), 6).as("risk"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
                     ROUND(1.0 / (1.0 + exp(-(0.0001 * c_acctbal
                                              + 0.3 * COALESCE(oc.order_cnt, 0) - 2.0))), 6)
                       AS risk
              FROM customer
              LEFT JOIN (SELECT o_custkey, COUNT(*) AS order_cnt
                         FROM orders GROUP BY o_custkey) oc
                ON c_custkey = oc.o_custkey
              ORDER BY c_custkey""")),

    // F15: Welch t statistic between two cohorts from grouped aggregates.
    Q("f15_welch_t",
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        val g = c.groupBy("c_mktsegment").agg(
          count(lit(1)).cast("double").as("n"),
          davg(col("c_acctbal")).as("m"),
          var_samp(col("c_acctbal")).as("v"))
        val a = g.filter(col("c_mktsegment") === "BUILDING")
          .select(col("n").as("n1"), col("m").as("m1"), col("v").as("v1"))
        val b = g.filter(col("c_mktsegment") === "MACHINERY")
          .select(col("n").as("n2"), col("m").as("m2"), col("v").as("v2"))
        a.crossJoin(b).select(
          round((col("m1") - col("m2")) /
            sqrt(col("v1") / col("n1") + col("v2") / col("n2")), 4).as("t_stat"))
      },
      Some(s"""SELECT ROUND((a.m1 - b.m2) / sqrt(a.v1 / a.n1 + b.v2 / b.n2), 4) AS t_stat
               FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS n1,
                            ${sqlDavg("c_acctbal")} AS m1,
                            VAR_SAMP(c_acctbal) AS v1
                     FROM customer WHERE c_mktsegment = 'BUILDING') a,
                    (SELECT CAST(COUNT(*) AS DOUBLE) AS n2,
                            ${sqlDavg("c_acctbal")} AS m2,
                            VAR_SAMP(c_acctbal) AS v2
                     FROM customer WHERE c_mktsegment = 'MACHINERY') b""")),

    // F15b: Pearson χ² over the dense status×priority contingency table
    // (reference `analytics/stats_utils.py:26-41`). The oracle replicates
    // the dense-matrix semantics (zero cells contribute e) and the
    // Wilson–Hilferty + erf-polynomial p-value with the same arithmetic
    // shape, so round(4)/round(6) absorb only sum-order ulps.
    Q("f15b_chi_square",
      (s, d) => graft.stats.Stats
        .chiSquare(Tables.orders(s, d), "o_orderstatus", "o_orderpriority")
        .select(round(col("chi2"), 4).as("chi2"), col("dof"),
          round(col("p_value"), 6).as("p_value")),
      Some("""WITH obs AS (SELECT o_orderstatus AS r, o_orderpriority AS c,
                                  CAST(COUNT(*) AS DOUBLE) AS o
                           FROM orders GROUP BY 1, 2),
                   rt AS (SELECT r, SUM(o) AS rtot FROM obs GROUP BY r),
                   ct AS (SELECT c, SUM(o) AS ctot FROM obs GROUP BY c),
                   g  AS (SELECT SUM(o) AS gt FROM obs),
                   cells AS (SELECT COALESCE(obs.o, 0) AS o,
                                    rt.rtot * ct.ctot / g.gt AS e
                             FROM rt CROSS JOIN ct CROSS JOIN g
                             LEFT JOIN obs ON obs.r = rt.r AND obs.c = ct.c),
                   dims AS (SELECT SUM(POW(o - e, 2) / e) AS chi2,
                                   (SELECT CAST(COUNT(DISTINCT r) AS DOUBLE) FROM obs) AS r,
                                   (SELECT CAST(COUNT(DISTINCT c) AS DOUBLE) FROM obs) AS c
                            FROM cells),
                   zc AS (SELECT chi2, (r - 1) * (c - 1) AS dof,
                                 CASE WHEN (r - 1) * (c - 1) > 0 THEN
                                   (POW(chi2 / ((r - 1) * (c - 1)), 1.0 / 3.0)
                                     - (1.0 - 2.0 / (9.0 * (r - 1) * (c - 1))))
                                   / SQRT(2.0 / (9.0 * (r - 1) * (c - 1)))
                                 ELSE 0.0 END AS z
                          FROM dims),
                   p1 AS (SELECT chi2, dof, ABS(z) AS az FROM zc),
                   p2 AS (SELECT chi2, dof, az,
                                 1.0 / (1.0 + 0.3275911 * az / SQRT(2.0)) AS t,
                                 az / SQRT(2.0) AS x
                          FROM p1),
                   p3 AS (SELECT chi2, dof,
                                 1.0 - (t * (0.254829592 + t * (-0.284496736
                                   + t * (1.421413741 + t * (-1.453152027
                                   + t * 1.061405429))))) * EXP(-x * x) AS erf
                          FROM p2)
              SELECT ROUND(chi2, 4) AS chi2, CAST(dof AS BIGINT) AS dof,
                     ROUND(2.0 * (1.0 - 0.5 * (1.0 + erf)), 6) AS p_value
              FROM p3""")),

    // F16: JSON field extraction from the events props payload.
    Q("f16_json_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .groupBy("k_val").agg(count(lit(1)).as("n"))
        // null order pinned: Spark defaults NULLS FIRST, DuckDB NULLS
        // LAST — a null k_val group (unparseable props) would otherwise
        // sort differently per engine
        .orderBy(asc_nulls_first("k_val")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
                     COUNT(*) AS n
              FROM events GROUP BY 1 ORDER BY k_val NULLS FIRST""")),

    // F17: explode / lateral flattening as the OUTPUT shape (one row per
    // token of the 50 shortest docs) — DuckDB twin is UNNEST.
    Q("f17_explode_tokens",
      (s, d) => {
        val short50 = Tables.documents(s, d)
          .orderBy(col("n_chars"), col("doc_id")).limit(50)
        short50.select(col("doc_id"),
            posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "token")))
          .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
          .orderBy("doc_id", "pos")
      },
      Some("""WITH short50 AS (SELECT doc_id, text FROM documents
                               ORDER BY n_chars, doc_id LIMIT 50),
                   tok AS (SELECT doc_id,
                                  unnest(regexp_split_to_array(trim(text), '\s+')) AS token,
                                  generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1 AS pos
                           FROM short50)
              SELECT doc_id, CAST(pos AS BIGINT) AS pos, token
              FROM tok ORDER BY doc_id, pos""")),

    // F18: higher-order array functions as scalar surface — transform
    // (clip), filter (positives), aggregate (fold sum) over the embedding
    // vector; DuckDB twins are list_transform/list_filter/list_sum.
    // round(,6) because the fold accumulates floats (engine-identical
    // here per the Q discipline: both fold left-to-right over the same
    // values — verified bit-identical in round 1 for graft_dot/list_sum).
    Q("f18_array_higher_order",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(filter(col("embedding"), x => x > 0f)).cast("long").as("n_pos"),
          round(aggregate(
            transform(col("embedding"), x =>
              least(greatest(x.cast("double"), lit(-0.5)), lit(0.5))),
            lit(0.0), (acc, x) => acc + x), 6).as("clipped_sum"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
                     CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
                     ROUND(list_sum(list_transform(embedding,
                         x -> least(greatest(CAST(x AS DOUBLE), -0.5), 0.5))), 6)
                       AS clipped_sum
              FROM embeddings ORDER BY vec_id""")),

    // F20: VARIANT semi-structured path (Spark 4's shredded binary JSON —
    // the 100 TB answer to string-JSON columns: parse ONCE into a typed
    // binary encoding, then path extraction is a cheap binary probe, not a
    // per-access reparse like f16's get_json_object). The gate pins typed
    // extraction, the missing-path null contract (try_variant_get), and
    // the is_variant_null/typeof surfaces; the oracle replays from the
    // JSON text.
    Q("f20_variant_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          parse_json(col("props")).as("v"))
        .select(col("event_id"),
          try_variant_get(col("v"), "$.k", "long").as("k_val"),
          try_variant_get(col("v"), "$.missing", "long").as("absent"),
          schema_of_variant(col("v")).as("vschema"),
          is_variant_null(col("v")).as("v_is_null"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
                     CAST(NULL AS BIGINT) AS absent,
                     'OBJECT<k: BIGINT>' AS vschema,
                     FALSE AS v_is_null
              FROM events ORDER BY event_id"""))
  )
}
