package graft.checks

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one row per column with null/distinct/min/max") {
    val df = Seq(
      (1L, Some("a"), 10),
      (2L, None, 20),
      (3L, Some("a"), 30),
      (4L, Some("b"), 30))
      .toDF("id", "tag", "v")
    val p = Profiler.profile(df, Seq("id", "tag", "v"))
      .collect().map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
          r.getAs[Long]("n_distinct"), r.getAs[String]("min_value"),
          r.getAs[String]("max_value"))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("tag") == ((4L, 1L, 2L, "a", "b")))  // distinct excludes null
    assert(p("v") == ((4L, 0L, 3L, "10", "30")))
  }

  test("profile: approximate distinct mode stays within HLL error") {
    val df = spark.range(1000).toDF("id")
    val approx = Profiler.profile(df, Seq("id"), exactDistinct = false)
      .collect()(0).getAs[Long]("n_distinct")
    assert(math.abs(approx - 1000L) <= 150L)
  }

  test("zscoreOutliers flags the planted spike and nothing in tight groups") {
    // group A: 100 values at 10.00 plus one at 1000.00 (clear outlier);
    // group B: constant (stddev 0 -> no outliers, no division blowup)
    val a = (1 to 100).map(_ => ("A", BigDecimal("10.00"))) :+
      (("A", BigDecimal("1000.00")))
    val b = (1 to 50).map(_ => ("B", BigDecimal("5.00")))
    val df = (a ++ b).toDF("g", "x")
      .select(col("g"), col("x").cast("decimal(18,2)").as("x"))
    val out = Profiler.zscoreOutliers(df, "g", "x")
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_outliers"))).toMap
    assert(out("A") == ((101L, 1L)))
    assert(out("B") == ((50L, 0L)))
  }

  test("zscoreOutliers reports the NULL group instead of dropping it") {
    // missing group labels are often the dirtiest slice — the null-safe
    // join must keep them in the report
    val df = ((1 to 20).map(_ => (null.asInstanceOf[String], BigDecimal("10.00"))) :+
      ((null.asInstanceOf[String], BigDecimal("500.00"))))
      .toDF("g", "x")
      .select(col("g"), col("x").cast("decimal(18,2)").as("x"))
    val out = Profiler.zscoreOutliers(df, "g", "x").collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("g")))
    assert(out.head.getAs[Long]("n") == 21L)
    assert(out.head.getAs[Long]("n_outliers") == 1L)
  }
}
