package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillDaily: spine covers each key's own range, values carry forward") {
    val daily = Seq(
      (1L, Date.valueOf("2024-01-01"), 10.0),
      (1L, Date.valueOf("2024-01-04"), 40.0),   // 2 missing days before
      (2L, Date.valueOf("2024-02-10"), 7.0))    // single-day key
      .toDF("k", "day", "v")
    val filled = TimeSeries.gapFillDaily(daily, "k", "day", "v")
      .orderBy("k", "day").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Date]("day").toString,
        r.getAs[Boolean]("is_observed"), r.getAs[Double]("v")))
    assert(filled.toSeq == Seq(
      (1L, "2024-01-01", true, 10.0),
      (1L, "2024-01-02", false, 10.0),
      (1L, "2024-01-03", false, 10.0),
      (1L, "2024-01-04", true, 40.0),
      (2L, "2024-02-10", true, 7.0)))
  }

  test("gapFillDaily on dense data is the identity (all observed)") {
    val daily = Seq(
      (1L, Date.valueOf("2024-01-01"), 1.0),
      (1L, Date.valueOf("2024-01-02"), 2.0))
      .toDF("k", "day", "v")
    val filled = TimeSeries.gapFillDaily(daily, "k", "day", "v")
    assert(filled.filter(!col("is_observed")).count() == 0)
    assert(filled.count() == 2)
  }

  test("intervalCensus counts covering intervals per change day, ends inclusive") {
    // [1..3], [2..2], [5..6]: census 1,2 on days 1,2; back to 1 on day 3
    // (the [2..2] interval ENDS inclusive on day 2); 0 on day 4; 1 on 5.
    val iv = Seq(
      (Date.valueOf("2024-01-01"), Date.valueOf("2024-01-03")),
      (Date.valueOf("2024-01-02"), Date.valueOf("2024-01-02")),
      (Date.valueOf("2024-01-05"), Date.valueOf("2024-01-06")))
      .toDF("s", "e")
    val out = TimeSeries.intervalCensus(iv, "s", "e").orderBy("day").collect()
      .map(r => r.getAs[Date]("day").toString -> r.getAs[Long]("census"))
    assert(out.toSeq == Seq(
      "2024-01-01" -> 1L, "2024-01-02" -> 2L, "2024-01-03" -> 1L,
      "2024-01-04" -> 0L, "2024-01-05" -> 1L, "2024-01-07" -> 0L))
  }

  test("intervalCensus emits no row when a day's starts cancel its ends") {
    // [1..2] ends as [3..5] starts: day 3's net is 0 — the census holds
    // at 1, so the change-days contract demands NO row for day 3
    val iv = Seq(
      (Date.valueOf("2024-01-01"), Date.valueOf("2024-01-02")),
      (Date.valueOf("2024-01-03"), Date.valueOf("2024-01-05")))
      .toDF("s", "e")
    val out = TimeSeries.intervalCensus(iv, "s", "e").orderBy("day").collect()
      .map(r => r.getAs[Date]("day").toString -> r.getAs[Long]("census"))
    assert(out.toSeq == Seq("2024-01-01" -> 1L, "2024-01-06" -> 0L))
  }

  test("intervalCensus drops inverted intervals (end < start)") {
    val iv = Seq(
      (Date.valueOf("2024-01-01"), Date.valueOf("2024-01-02")),
      (Date.valueOf("2024-01-05"), Date.valueOf("2024-01-03"))) // inverted
      .toDF("s", "e")
    val out = TimeSeries.intervalCensus(iv, "s", "e").collect()
      .map(r => r.getAs[Date]("day").toString -> r.getAs[Long]("census")).toMap
    assert(out == Map("2024-01-01" -> 1L, "2024-01-03" -> 0L))
  }

  test("intervalCensus drops NULL-bounded intervals and never goes negative") {
    val iv = Seq(
      (Date.valueOf("2024-01-01"), Date.valueOf("2024-01-02")),
      (null.asInstanceOf[Date], Date.valueOf("2024-01-09")),
      (Date.valueOf("2024-01-05"), null.asInstanceOf[Date]))
      .toDF("s", "e")
    val out = TimeSeries.intervalCensus(iv, "s", "e").collect()
      .map(r => r.getAs[Date]("day").toString -> r.getAs[Long]("census")).toMap
    assert(out == Map("2024-01-01" -> 1L, "2024-01-03" -> 0L))
    assert(out.values.forall(_ >= 0))
  }
}
