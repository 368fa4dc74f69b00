package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import Q.{dsum, sqlDsum}

/** Time-series / event-stream operators over the `events` table.
  * Reference semantics: day-bucketed AE rates (`analytics/queries.py:21-30`)
  * → tumbling-window counts; freshness SLI (`src/common/freshness.py:33-57`)
  * → max-timestamp lag, with the "now" anchor injected for determinism;
  * sessionization extends the event model the way the streaming §7 extension
  * does with watermarked windows (batch twin here, streaming twin in
  * `graft.streaming`).
  *
  * Timestamps are formatted to strings in outputs: Spark writes
  * UTC-adjusted parquet timestamps that DuckDB would read as TIMESTAMPTZ and
  * mismatch the naive oracle values.
  */
object EventQueries {

  val all: Seq[Q] = Seq(

    // Tumbling 1-hour window counts (batch twin of the streaming agg).
    Q("e1_hourly_rollup",
      (s, d) => Tables.events(s, d)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
        .orderBy("hour", "event_type"),
      Some(s"""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                               '%Y-%m-%d %H:%M:%S') AS hour,
                      event_type, COUNT(*) AS n,
                      ${sqlDsum("value", 6)} AS sum_value
               FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // Gap-based sessionization: new session when the per-user gap > 30 min.
    Q("e2_sessionization",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L)
              .otherwise(0L))
          .groupBy("user_id")
          .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
                     COUNT(*) AS n_events
              FROM (SELECT user_id,
                           CASE WHEN prev_ts IS NULL
                                 OR floor(epoch(CAST(ts AS TIMESTAMP)))
                                    - floor(epoch(prev_ts)) > 1800
                                THEN 1 ELSE 0 END AS new_session
                    FROM (SELECT user_id, ts, event_id,
                                 LAG(CAST(ts AS TIMESTAMP), 1) OVER
                                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                          FROM events))
              GROUP BY user_id ORDER BY user_id""")),

    // Per-user daily activity with conditional purchase metrics.
    Q("e3_user_daily_activity",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
          dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)), 6)
            .as("purchase_value"))
        .orderBy("user_id", "day"),
      Some(s"""SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
                      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                      ${sqlDsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END", 6)}
                        AS purchase_value
               FROM events GROUP BY 1, 2 ORDER BY user_id, day""")),

    // V10 freshness SLI with an injected deterministic anchor.
    Q("e4_freshness_lag",
      (s, d) => graft.checks.Checks.freshnessLagMinutes(
        Tables.events(s, d), "ts",
        to_timestamp(lit("2024-03-01 00:00:00"), "yyyy-MM-dd HH:mm:ss")),
      Some("""SELECT CAST(floor((epoch(TIMESTAMP '2024-03-01 00:00:00')
                                 - floor(epoch(max(CAST(ts AS TIMESTAMP))))) / 60)
                       AS BIGINT) AS lag_minutes
              FROM events""")),

    // Day-over-day retention: users active on day d AND d+1 (self-join on
    // a derived key — the J-family shape the star schema lacks).
    Q("e6_retention",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("date").as("day"))
          .distinct()
        val next = daily.select(col("user_id"),
          date_sub(col("day"), 1).as("day"))
        daily.join(next, Seq("user_id", "day"))
          .groupBy("day").agg(count(lit(1)).as("retained_users"))
          .orderBy("day")
      },
      Some("""SELECT a.day, COUNT(*) AS retained_users
              FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events) a
              JOIN (SELECT DISTINCT user_id, CAST(ts AS DATE) - 1 AS day
                    FROM events) b
                ON a.user_id = b.user_id AND a.day = b.day
              GROUP BY a.day ORDER BY a.day""")),

    // Top spenders with their purchase share of the whole (A + W over agg).
    Q("e7_top_spenders",
      (s, d) => {
        val spend = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(dsum(col("value"), 6).as("spend"), count(lit(1)).as("n_purchases"))
        val total = spend.agg(sum(col("spend")).as("total"))
        spend.crossJoin(total)
          .select(col("user_id"), col("spend"), col("n_purchases"),
            round(col("spend") / col("total"), 6).as("share"))
          .orderBy(col("spend").desc, col("user_id"))
          .limit(20)
      },
      Some(s"""WITH spend AS (SELECT user_id, ${sqlDsum("value", 6)} AS spend,
                                     COUNT(*) AS n_purchases
                              FROM events WHERE event_type = 'purchase'
                              GROUP BY user_id)
               SELECT user_id, spend, n_purchases,
                      ROUND(spend / (SELECT SUM(spend) FROM spend), 6) AS share
               FROM spend ORDER BY spend DESC, user_id LIMIT 20""")),

    // V9: proportion + recency thresholds through the checks engine.
    Q("v9_proportion_recency",
      (s, d) => {
        val prop = graft.checks.Checks.proportionAtLeast(
          Tables.events(s, d), col("value") >= 0, 0.95)
        val rec = graft.checks.Checks.recency(
          Tables.events(s, d), "ts",
          to_timestamp(lit("2024-02-15 00:00:00"), "yyyy-MM-dd HH:mm:ss"), 30)
          .select(col("passed").as("recency_passed"))
        prop.crossJoin(rec)
      },
      Some("""SELECT COUNT(*) AS n_rows,
                     CAST(SUM(CASE WHEN value >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_satisfied,
                     CAST(SUM(CASE WHEN value >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS proportion,
                     CAST(SUM(CASE WHEN value >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) >= 0.95 AS passed,
                     (SELECT date_diff('day', CAST(max(CAST(ts AS TIMESTAMP)) AS DATE),
                                       DATE '2024-02-15') <= 30
                      FROM events) AS recency_passed
              FROM events""")),

    // Event funnel: users reaching each stage (signup → view → purchase).
    Q("e5_funnel",
      (s, d) => {
        val e = Tables.events(s, d)
        val stages = e.groupBy("user_id").agg(
          max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("did_signup"),
          max(when(col("event_type") === "view", 1L).otherwise(0L)).as("did_view"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("did_purchase"))
        stages.agg(
          sum(col("did_signup")).as("n_signup"),
          sum(col("did_view")).as("n_view"),
          sum(col("did_purchase")).as("n_purchase"),
          sum(when(col("did_view") === 1 && col("did_purchase") === 1, 1L).otherwise(0L))
            .as("n_view_and_purchase"))
      },
      Some("""SELECT CAST(SUM(did_signup) AS BIGINT) AS n_signup,
                     CAST(SUM(did_view) AS BIGINT) AS n_view,
                     CAST(SUM(did_purchase) AS BIGINT) AS n_purchase,
                     CAST(SUM(CASE WHEN did_view = 1 AND did_purchase = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_view_and_purchase
              FROM (SELECT user_id,
                           MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS did_signup,
                           MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS did_view,
                           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS did_purchase
                    FROM events GROUP BY user_id)""")),

    // E9 (extension): calendar-spine gap fill — sparse per-user daily
    // spend regularized to one row per day between the user's first and
    // last purchase, missing days forward-filled (ops.TimeSeries). The
    // spine is sequence+explode per key (no driver calendar); the fill
    // is a per-key window. The oracle replays generate_series +
    // last_value IGNORE NULLS.
    Q("e9_gap_fill",
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(dsum(col("value"), 6).as("daily_spend"))
        graft.ops.TimeSeries.gapFillDaily(daily, "user_id", "day", "daily_spend")
          .select(col("user_id"), col("day"), col("is_observed"),
            col("daily_spend"))
          .orderBy("user_id", "day")
      },
      Some(s"""WITH daily AS (SELECT user_id,
                                     CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                                     ${sqlDsum("value", 6)} AS daily_spend
                              FROM events WHERE event_type = 'purchase'
                              GROUP BY 1, 2),
                    bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
                               FROM daily GROUP BY user_id),
                    spine AS (SELECT user_id,
                                     CAST(UNNEST(generate_series(
                                       CAST(d0 AS TIMESTAMP),
                                       CAST(d1 AS TIMESTAMP),
                                       INTERVAL 1 DAY)) AS DATE) AS day
                              FROM bounds)
               SELECT s.user_id, s.day,
                      d.daily_spend IS NOT NULL AS is_observed,
                      last_value(d.daily_spend IGNORE NULLS) OVER (
                        PARTITION BY s.user_id ORDER BY s.day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS daily_spend
               FROM spine s LEFT JOIN daily d
                 ON s.user_id = d.user_id AND s.day = d.day
               ORDER BY s.user_id, s.day""")),

    // E11: consecutive-day activity streaks — the gaps-and-islands
    // shape (day − row_number() is constant within a maximal
    // consecutive run), the canonical way to sessionize at DAY
    // granularity without a self-join. Two small shuffles over the
    // DISTINCT (user, day) frame, never fact rows; all integer.
    Q("e11_activity_streaks",
      (s, d) => {
        val days = Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("date").as("day"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        days
          .withColumn("grp",
            (datediff(col("day"), lit("2024-01-01").cast("date"))
              - row_number().over(w)).cast("long"))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max(col("len")).as("longest_streak"),
            count(lit(1)).as("n_streaks"))
          .orderBy(col("longest_streak").desc, col("user_id"))
          .limit(20)
      },
      Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                            FROM events),
                   isl AS (SELECT user_id,
                                  CAST(day - DATE '2024-01-01' AS BIGINT)
                                    - ROW_NUMBER() OVER (PARTITION BY user_id
                                                         ORDER BY day) AS grp
                           FROM days),
                   runs AS (SELECT user_id, grp, COUNT(*) AS len
                            FROM isl GROUP BY 1, 2)
              SELECT user_id, MAX(len) AS longest_streak,
                     COUNT(*) AS n_streaks
              FROM runs GROUP BY user_id
              ORDER BY longest_streak DESC, user_id LIMIT 20""")),

    // E10: seasonal-naive forecast baseline + backtest — the standard
    // first forecasting yardstick (forecast(d) = actual(d−7 observed
    // points)) scored as per-type MAE over the whole daily series. All
    // integer until the one final division, so the backtest sits under
    // the hash. Observed-day semantics: calendar gaps are an upstream
    // concern (e9's spine gap-fill composes in front when needed). The
    // window runs over the per-(type, day) AGGREGATE — days × types
    // rows, never fact rows.
    Q("e10_seasonal_naive",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
        daily.withColumn("forecast", lag(col("n"), 7).over(w))
          .filter(col("forecast").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_scored_days"),
            sum(abs(col("n") - col("forecast"))).as("total_abs_err"),
            (sum(abs(col("n") - col("forecast"))).cast("double")
              / count(lit(1)).cast("double")).as("mae"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                                    COUNT(*) AS n
                             FROM events GROUP BY 1, 2),
                   f AS (SELECT event_type, n,
                                LAG(n, 7) OVER (PARTITION BY event_type
                                                ORDER BY day) AS forecast
                         FROM daily)
              SELECT event_type, COUNT(*) AS n_scored_days,
                     CAST(SUM(ABS(n - forecast)) AS BIGINT)
                       AS total_abs_err,
                     CAST(SUM(ABS(n - forecast)) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS mae
              FROM f WHERE forecast IS NOT NULL
              GROUP BY event_type ORDER BY event_type""")),

    // E12: HOPPING (sliding) window aggregate — Spark's native
    // window(ts, "2 hours", "1 hour"): every event lands in exactly two
    // overlapping epoch-aligned windows (length/slide = 2). Complements
    // e1 (tumbling) and e8/st2 (session); the oracle replays the window
    // assignment as trunc-hour minus {0,1} hours. Same shape runs
    // unchanged as a Structured Streaming agg with a watermark.
    Q("e12_sliding_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type"),
      Some(s"""WITH hops AS (
                 SELECT date_trunc('hour', CAST(ts AS TIMESTAMP))
                          - to_hours(h) AS wstart,
                        event_type, value
                 FROM events CROSS JOIN (VALUES (0), (1)) AS t(h))
               SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
                      event_type, COUNT(*) AS n,
                      ${sqlDsum("value", 6)} AS sum_value
               FROM hops
               GROUP BY 1, 2 ORDER BY window_start, event_type"""))
  )
}
