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

  test("broadcast as-of exec matches the window formulation on the unit fixture") {
    val viaExec = TimeJoins.asofJoinBroadcast(trades, quotes,
      "key", "ts", "quote_id", "quote_id")
      .select("trade_id", "asof_quote_id", "asof_ts")
    val viaWindow = TimeJoins.asofJoinBackward(trades, quotes,
      "key", "ts", "quote_id", "quote_id")
      .select("trade_id", "asof_quote_id", "asof_ts")
    assert(viaExec.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaExec).count() == 0)
    assert(viaExec.count() == 2)
  }

  test("broadcast as-of exec matches the window formulation on events (self-carved)") {
    val e = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val viaExec = TimeJoins.asofJoinBroadcast(purchases, views,
      "user_id", "ts", "view_id", "view_id")
    val viaWindow = TimeJoins.asofJoinBackward(purchases, views,
      "user_id", "ts", "view_id", "view_id")
    val cols = Seq("event_id", "user_id", "asof_view_id")
    val a = viaExec.select(cols.map(col): _*)
    val b = viaWindow.select(cols.map(col): _*)
    assert(a.count() > 0)
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("broadcast as-of plan: BroadcastExchange on right, no shuffle of the left side") {
    val df = TimeJoins.asofJoinBroadcast(trades, quotes,
      "key", "ts", "quote_id", "quote_id")
    df.collect() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"))
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("ShuffleExchange"), s"unexpected shuffle in:\n$plan")
  }

  test("broadcast as-of runs INSIDE whole-stage codegen (starred in plan)") {
    val df = TimeJoins.asofJoinBroadcast(trades, quotes,
      "key", "ts", "quote_id", "quote_id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefix = operator compiled into a WholeStageCodegen stage
    assert("""\*\(\d+\) BroadcastAsOfJoin""".r.findFirstIn(plan).isDefined, plan)
  }

  test("broadcast as-of interpreted fallback (codegen off) matches") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaExec = TimeJoins.asofJoinBroadcast(trades, quotes,
        "key", "ts", "quote_id", "quote_id")
        .select("trade_id", "asof_quote_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaExec == Map(101L -> 12L, 102L -> 13L))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("broadcast as-of null keys/ts never match and null right values are skipped") {
    val l = Seq(
      (Option(1L), Option(ts("2024-01-01 10:01:00")), 1L),
      (Option.empty[Long], Option(ts("2024-01-01 10:01:00")), 2L),
      (Option(1L), Option.empty[Timestamp], 3L))
      .toDF("key", "ts", "id")
    val r = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:00")), Option.empty[Long], 1L),
      (Option(1L), Option(ts("2024-01-01 09:00:00")), Option(9L), 2L))
      .toDF("key", "ts", "v", "tb")
    val out = TimeJoins.asofJoinBroadcast(l, r, "key", "ts", "v", "tb")
      .select("id", "asof_v").collect()
    // null-valued 10:00 right row is excluded from the build, so id=1
    // falls back to the 09:00 row; null left key/ts rows drop out
    assert(out.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((1L, 9L)))
  }

  test("as-of/range execs reject mismatched key types loudly, not with empty output") {
    // int-keyed probe vs long-keyed build would box to Integer vs Long
    // and hash-miss every lookup — the execs must throw, never return
    // a silently empty (wrong) result
    val l = Seq((1, ts("2024-01-01 10:01:00"), 1L)).toDF("key", "ts", "id")
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 9L, 1L)).toDF("key", "ts", "v", "tb")
    val asOfErr = intercept[Throwable] {
      TimeJoins.asofJoinBroadcast(l, r, "key", "ts", "v", "tb").collect()
    }
    assert(asOfErr.getMessage.contains("key types must match"))

    val ls = Seq((1, 100L)).toDF("key", "ts")
    val rs = Seq((1L, 150L)).toDF("key", "ts")
    val rangeErr = intercept[Throwable] {
      TimeJoins.rangeJoinBroadcast(ls, rs, "key", "ts", 100L).collect()
    }
    assert(rangeErr.getMessage.contains("key types must match"))
  }

  test("property: as-of exec matches a driver-side reference on random data") {
    val rnd = new scala.util.Random(2026L)
    (1 to 3).foreach { _ =>
      val lefts = Seq.fill(200)((rnd.nextInt(8).toLong,
        1000L + rnd.nextInt(500), rnd.nextLong().abs))
      val rights = Seq.fill(120)((rnd.nextInt(10).toLong,
        1000L + rnd.nextInt(500), rnd.nextLong().abs))
      // driver-side reference: greatest right ts <= left ts, ties by max id
      val expected = lefts.flatMap { case (k, t, id) =>
        val cands = rights.filter(r => r._1 == k && r._2 <= t)
        if (cands.isEmpty) None
        else {
          val best = cands.maxBy(r => (r._2, r._3))
          Some((id, best._3, best._2))
        }
      }.toSet
      val l = lefts.toDF("key", "sec", "lid")
        .select(col("key"), col("sec").cast("timestamp").as("ts"), col("lid"))
      val r = rights.toDF("key", "sec", "rid")
        .select(col("key"), col("sec").cast("timestamp").as("ts"), col("rid"))
      val got = TimeJoins.asofJoinBroadcast(l, r, "key", "ts", "rid", "rid")
        .select(col("lid"), col("asof_rid"), col("asof_ts").cast("long"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      assert(got == expected)
    }
  }

  test("broadcast range-join exec equals the bucketed formulation on events") {
    val errors = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"))
    // 1-day window: 85 ground-truth pairs at sf0.001 (600 s has zero)
    val viaExec = TimeJoins.rangeJoinBroadcast(errors, errors, "user_id", "ts", 86400L)
    val viaBuckets = TimeJoins.rangeJoinBucketed(errors, errors, "user_id", "ts", 86400L)
      .select("user_id", "a_sec", "b_sec")
    assert(viaExec.count() == 85)
    assert(viaExec.exceptAll(viaBuckets).count() == 0)
    assert(viaBuckets.exceptAll(viaExec).count() == 0)
    // plan: broadcast exchange on the right, no shuffle of the probe side
    viaExec.collect()
    val plan = viaExec.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), plan)
  }

  test("broadcast range-join exec: boundary semantics (exclusive start, inclusive end)") {
    val a = Seq((1L, 1000L), (2L, 1000L)).toDF("k", "sec")
      .select(col("k"), col("sec").cast("timestamp").as("ts"))
    val b = Seq(
      (1L, 1000L),  // == a_sec → excluded (strictly after)
      (1L, 1001L),  // in window
      (1L, 1600L),  // == a_sec + 600 → included (inclusive end)
      (1L, 1601L),  // past window
      (3L, 1001L))  // wrong key
      .toDF("k", "sec")
      .select(col("k"), col("sec").cast("timestamp").as("ts"))
    val got = TimeJoins.rangeJoinBroadcast(a, b, "k", "ts", 600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1000L, 1001L), (1L, 1000L, 1600L)))
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

  test("intervalOverlapJoin equals the naive overlap join on random " +
      "intervals (short/long vs bucket, zero-length, touching endpoints)") {
    val rnd = new scala.util.Random(11)
    val mk = (n: Int) => (0 until n).map { i =>
      val k = (rnd.nextInt(4) + 1).toLong
      val start = rnd.nextInt(5000).toLong
      // mix: zero-length, sub-bucket, and multi-bucket intervals
      val len = rnd.nextInt(3) match {
        case 0 => 0L
        case 1 => rnd.nextInt(80).toLong
        case _ => (100 + rnd.nextInt(900)).toLong
      }
      (k, start, start + len, i.toLong)
    }
    val a = mk(60).toDF("k", "s", "e", "aid")
    val b = mk(60).toDF("k", "s", "e", "bid")
    val grid = TimeJoins.intervalOverlapJoin(a, b, "k", "s", "e",
        bucketWidth = 100L)
      .select("k", "a_aid", "b_bid")
    val naive = a.select(col("k"), col("s").as("as1"), col("e").as("ae"),
        col("aid"))
      .join(b.select(col("k").as("k2"), col("s").as("bs"), col("e").as("be"),
        col("bid")),
        col("k") === col("k2") && col("as1") <= col("be") &&
          col("bs") <= col("ae"))
      .select(col("k"), col("aid").as("a_aid"), col("bid").as("b_bid"))
    assert(grid.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(grid).count() == 0)
    // exactly-once emission: no pair appears twice
    assert(grid.count() == grid.distinct().count())
    // touching endpoints (inclusive bounds) do match
    val ta = Seq((1L, 100L, 200L, 0L)).toDF("k", "s", "e", "aid")
    val tb = Seq((1L, 200L, 300L, 0L)).toDF("k", "s", "e", "bid")
    assert(TimeJoins.intervalOverlapJoin(ta, tb, "k", "s", "e", 50L)
      .count() == 1L)
  }
}
