package graft.checks

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("S1", "M", 30.0, "ABC-1"),
    ("S2", "F", 200.0, "abc"),   // age out of range, bad format
    ("S3", null, -5.0, "XYZ-9"), // null sex, age out of range
    (null, "X", 40.0, null))     // null id, sex not in set
    .toDF("id", "sex", "age", "code")

  test("single-pass suite counts each violation kind (V1/V3/V4/V5)") {
    val row = Checks.evaluate(df, Seq(
      NotNull("id"), NotNull("sex"),
      InSet("sex", Seq("M", "F", "U")),
      InRange("age", 0, 150),
      MatchesRegex("code", "^[A-Z]+-[0-9]$"))).collect()(0)
    assert(row.getAs[Long]("id_null") == 1)
    assert(row.getAs[Long]("sex_null") == 1)
    assert(row.getAs[Long]("sex_not_in_set") == 1) // X; nulls don't count
    assert(row.getAs[Long]("age_out_of_range") == 2)
    assert(row.getAs[Long]("code_bad_format") == 1)
  }

  test("cross-column check is null-safe (V6)") {
    val d = Seq((1.0, 2.0), (5.0, 3.0), (Double.NaN, 2.0)).toDF("lo", "hi")
      .withColumn("lo", when(isnan(col("lo")), lit(null)).otherwise(col("lo")))
    val row = Checks.evaluate(d,
      Seq(CrossColumn("range_order", col("lo") <= col("hi")))).collect()(0)
    assert(row.getAs[Long]("range_order") == 1) // only the 5>3 row
  }

  test("duplicate keys + referential orphans (V2/V8)") {
    val child = Seq((1, "a"), (2, "b"), (2, "c"), (9, "d")).toDF("k", "v")
    val parent = Seq(1, 2).toDF("k")
    assert(Checks.duplicateKeys(child, Seq("k")).count() == 1)
    assert(Checks.orphans(child, "k", parent, "k").count() == 1)
  }

  test("row-count bounds + freshness lag (V7/V10)") {
    val d = Seq(1, 2, 3).toDF("x")
    val row = Checks.rowCountInBounds(d, 2, 10).collect()(0)
    assert(row.getAs[Long]("n_rows") == 3 && row.getAs[Boolean]("in_bounds"))
    val ts = Seq("2024-01-01 00:00:00").toDF("ts")
      .select(col("ts").cast("timestamp").as("ts"))
    val lag = Checks.freshnessLagMinutes(ts, "ts",
      to_timestamp(lit("2024-01-01 02:00:00"))).as[Long].head()
    assert(lag == 120L)
  }

  test("sampleFailures: per-check offending rows, capped at n, multi-tagged") {
    val d = Seq(
      ("S1", 42), ("S2", 200), ("S3", 210), ("S4", 220),
      (null.asInstanceOf[String], 300), ("S6", 55)
    ).toDF("subj", "age")
    val checks = Seq(NotNull("subj"), InRange("age", 0, 150))
    val samples = Checks.sampleFailures(d, checks, n = 2)
    // null subj row violates BOTH checks → appears under both names
    assert(samples("subj_null").size == 1)
    assert(samples("subj_null").head.contains("\"age\":300"))
    // 4 range violations capped at 2, deterministic (sorted JSON order:
    // the null-subj row serializes as {"age":300} and sorts first)
    assert(samples("age_out_of_range") ==
      Seq("""{"age":300}""", """{"subj":"S2","age":200}"""))
  }
}
