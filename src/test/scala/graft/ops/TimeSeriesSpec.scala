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
}
