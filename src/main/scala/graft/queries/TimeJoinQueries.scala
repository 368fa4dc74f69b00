package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.TimeJoins

/** As-of and time-range joins over the events table, oracle-checked
  * against DuckDB's native `ASOF JOIN` and a ground-truth inequality
  * join (the Spark side uses the scalable union-window / bucket-prejoin
  * formulations in [[graft.ops.TimeJoins]]).
  */
object TimeJoinQueries {

  val all: Seq[Q] = Seq(

    // For every purchase: the user's most recent view at-or-before it.
    Q("aj1_asof_join",
      (s, d) => {
        val e = Tables.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
        TimeJoins.asofJoinBackward(purchases, views,
          key = "user_id", ts = "ts", valueCol = "view_id", tieBreak = "view_id")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("asof_view_id").as("view_id"),
            (col("ts").cast("long") - col("asof_ts").cast("long"))
              .as("view_to_purchase_secs"))
          .orderBy("purchase_id")
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id,
                     v.event_id AS view_id,
                     CAST(floor(epoch(CAST(p.ts AS TIMESTAMP)))
                          - floor(epoch(CAST(v.ts AS TIMESTAMP))) AS BIGINT)
                       AS view_to_purchase_secs
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              ASOF JOIN (SELECT user_id, ts, MAX(event_id) AS event_id
                         FROM events WHERE event_type = 'view'
                         GROUP BY user_id, ts) v
                ON p.user_id = v.user_id AND v.ts <= p.ts
              ORDER BY purchase_id""")),

    // Same as-of semantics through the custom physical operator
    // (BroadcastAsOfJoinExec: right side broadcast, left never shuffled)
    // — checked against DuckDB's native ASOF JOIN like aj1, proving the
    // custom exec and the engine-portable formulation agree exactly.
    Q("aj3_asof_join_broadcast",
      (s, d) => {
        val e = Tables.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
        TimeJoins.asofJoinBroadcast(purchases, views,
          key = "user_id", ts = "ts", valueCol = "view_id", tieBreak = "view_id")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("asof_view_id").as("view_id"),
            (col("ts").cast("long") - col("asof_ts").cast("long"))
              .as("view_to_purchase_secs"))
          .orderBy("purchase_id")
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id,
                     v.event_id AS view_id,
                     CAST(floor(epoch(CAST(p.ts AS TIMESTAMP)))
                          - floor(epoch(CAST(v.ts AS TIMESTAMP))) AS BIGINT)
                       AS view_to_purchase_secs
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              ASOF JOIN (SELECT user_id, ts, MAX(event_id) AS event_id
                         FROM events WHERE event_type = 'view'
                         GROUP BY user_id, ts) v
                ON p.user_id = v.user_id AND v.ts <= p.ts
              ORDER BY purchase_id""")),

    // Pairs of error events within 10 minutes of each other per user,
    // rolled up to a per-user burst count.
    Q("aj2_time_range_join",
      (s, d) => {
        val errors = Tables.events(s, d)
          .filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"))
        TimeJoins.rangeJoinBucketed(errors, errors, "user_id", "ts", 600L)
          .groupBy("user_id").agg(count(lit(1)).as("n_burst_pairs"))
          .orderBy("user_id")
      },
      Some("""SELECT a.user_id, COUNT(*) AS n_burst_pairs
              FROM (SELECT DISTINCT user_id,
                           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS a_sec
                    FROM events WHERE event_type = 'error') a
              JOIN (SELECT DISTINCT user_id,
                           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS b_sec
                    FROM events WHERE event_type = 'error') b
                ON a.user_id = b.user_id
                   AND b.b_sec > a.a_sec AND b.b_sec - a.a_sec <= 600
              GROUP BY a.user_id ORDER BY a.user_id""")),

    // Same range-join semantics through the custom physical operator
    // (BroadcastRangeJoinExec: broadcast right, per-key range probe,
    // left never shuffled) — same oracle as aj2, proving the exec and
    // the bucket-explode formulation agree exactly.
    Q("aj4_range_join_broadcast",
      (s, d) => {
        val errors = Tables.events(s, d)
          .filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"))
        TimeJoins.rangeJoinBroadcast(errors, errors, "user_id", "ts", 600L)
          .groupBy("user_id").agg(count(lit(1)).as("n_burst_pairs"))
          .orderBy("user_id")
      },
      Some("""SELECT a.user_id, COUNT(*) AS n_burst_pairs
              FROM (SELECT DISTINCT user_id,
                           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS a_sec
                    FROM events WHERE event_type = 'error') a
              JOIN (SELECT DISTINCT user_id,
                           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS b_sec
                    FROM events WHERE event_type = 'error') b
                ON a.user_id = b.user_id
                   AND b.b_sec > a.a_sec AND b.b_sec - a.a_sec <= 600
              GROUP BY a.user_id ORDER BY a.user_id""")),

    // AJ5: INTERVAL OVERLAP join — the remaining time-join shape (aj1/aj3
    // = as-of point→latest, aj2/aj4 = point-pair range): both sides are
    // INTERVALS and the match is overlap. Per-user daily activity
    // intervals ([min,max] event second per user-day) of views vs
    // errors; the join explodes each interval to hour-grid cells, joins
    // equi on (user, cell), and emits each pair from exactly ONE cell
    // (the one containing the overlap's start — the spatial-join dedup
    // rule, no distinct pass), so no per-key cartesian is ever planned.
    // Rolled up per user: overlap-pair count + total overlap seconds
    // (inclusive bounds; both engines replay the interval aggregation
    // and the overlap arithmetic exactly).
    Q("aj5_interval_overlap_join",
      (s, d) => {
        val e = Tables.events(s, d)
        def daily(t: String) = e.filter(col("event_type") === t)
          .select(col("user_id"), col("ts").cast("long").as("sec"),
            to_date(col("ts")).as("day"))
          .groupBy("user_id", "day")
          .agg(min(col("sec")).as("start"), max(col("sec")).as("end"))
          .drop("day")
        TimeJoins.intervalOverlapJoin(daily("view"), daily("error"),
            "user_id", "start", "end", bucketWidth = 3600L)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_overlaps"),
            sum(least(col("a_end"), col("b_end"))
              - greatest(col("a_start"), col("b_start")) + 1L)
              .as("overlap_secs"))
          .orderBy("user_id")
      },
      Some("""WITH iv AS (SELECT user_id, event_type,
                                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                                 MIN(CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
                                     AS BIGINT)) AS s,
                                 MAX(CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
                                     AS BIGINT)) AS e
                          FROM events
                          WHERE event_type IN ('view', 'error')
                          GROUP BY 1, 2, 3)
              SELECT a.user_id, COUNT(*) AS n_overlaps,
                     CAST(SUM(least(a.e, b.e) - greatest(a.s, b.s) + 1)
                          AS BIGINT) AS overlap_secs
              FROM (SELECT * FROM iv WHERE event_type = 'view') a
              JOIN (SELECT * FROM iv WHERE event_type = 'error') b
                ON a.user_id = b.user_id
                   AND a.s <= b.e AND b.s <= a.e
              GROUP BY a.user_id ORDER BY a.user_id"""))
  )
}
