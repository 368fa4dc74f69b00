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
              GROUP BY a.user_id ORDER BY a.user_id"""))
  )
}
