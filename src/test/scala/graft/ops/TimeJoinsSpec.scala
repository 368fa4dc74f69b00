package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TimeJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:00:30"), 101L),
    (1L, ts("2024-01-01 10:05:00"), 102L),
    (2L, ts("2024-01-01 09:00:00"), 201L)) // before any quote
    .toDF("key", "ts", "trade_id")

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 11L),
    (1L, ts("2024-01-01 10:00:30"), 12L), // tie with trade 101 → inclusive
    (1L, ts("2024-01-01 10:04:00"), 13L),
    (2L, ts("2024-01-01 09:30:00"), 21L))
    .toDF("key", "ts", "quote_id")

  test("asof backward join picks greatest right ts <= left ts (inclusive)") {
    val joined = TimeJoins.asofJoinBackward(trades, quotes,
      "key", "ts", "quote_id", "quote_id")
      .select("trade_id", "asof_quote_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(joined(101L) == 12L) // equal-ts quote matches (inclusive)
    assert(joined(102L) == 13L) // most recent prior
    assert(!joined.contains(201L)) // no prior quote → dropped (inner)
  }

  test("range join equals the naive theta join") {
    val errors = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")),
      (1L, ts("2024-01-01 10:12:00")), (1L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val bucketed = TimeJoins.rangeJoinBucketed(errors, errors, "user_id", "ts", 600L)
      .select("user_id", "a_sec", "b_sec")
    val a = errors.select(col("user_id"), col("ts").cast("long").as("a_sec"))
    val b = errors.select(col("user_id").as("u2"), col("ts").cast("long").as("b_sec"))
    val naive = a.join(b, col("user_id") === col("u2") &&
        col("b_sec") > col("a_sec") && col("b_sec") - col("a_sec") <= 600L)
      .select("user_id", "a_sec", "b_sec").distinct()
    assert(bucketed.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(bucketed).count() == 0)
    // expected pairs: (10:00,10:05), (10:05,10:12) — NOT (10:00,10:12) (720s)
    assert(bucketed.count() == 2)
  }
}
