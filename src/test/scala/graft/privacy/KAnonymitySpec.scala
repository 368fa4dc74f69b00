package graft.privacy

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KAnonymitySpec extends SparkSpec {
  import spark.implicits._

  // (age_band, sex) quasi-identifiers; the ("40-49","F") group has 1 row
  private lazy val df = Seq(
    (1L, "30-39", "M", "x"), (2L, "30-39", "M", "y"), (3L, "30-39", "M", "z"),
    (4L, "30-39", "F", "x"), (5L, "30-39", "F", "y"),
    (6L, "40-49", "F", "x"))
    .toDF("id", "age_band", "sex", "payload")

  test("report flags under-k groups; summary aggregates them") {
    val rep = KAnonymity.report(df, Seq("age_band", "sex"), k = 2)
      .collect().map(r => (r.getAs[String]("age_band"), r.getAs[String]("sex")) ->
        (r.getAs[Long]("group_size"), r.getAs[Boolean]("at_risk"))).toMap
    assert(rep(("30-39", "M")) == ((3L, false)))
    assert(rep(("30-39", "F")) == ((2L, false)))
    assert(rep(("40-49", "F")) == ((1L, true)))
    val s = KAnonymity.summary(df, Seq("age_band", "sex"), k = 2).collect()(0)
    assert(s.getAs[Long]("n_rows") == 6L)
    assert(s.getAs[Long]("n_groups") == 3L)
    assert(s.getAs[Long]("k_anonymity") == 1L)
    assert(s.getAs[Long]("n_at_risk_groups") == 1L)
    assert(s.getAs[Long]("n_at_risk_rows") == 1L)
  }

  test("suppress nulls quasi-identifiers only for under-k rows, keeps count") {
    val sup = KAnonymity.suppress(df, Seq("age_band", "sex"), k = 2)
    assert(sup.count() == 6L)
    val suppressed = sup.filter(col("age_band").isNull).collect()
    assert(suppressed.length == 1)
    assert(suppressed(0).getAs[Long]("id") == 6L)
    assert(suppressed(0).getAs[String]("sex") == null)
    assert(suppressed(0).getAs[String]("payload") == "x") // non-quasi kept
    // untouched rows keep their values
    assert(sup.filter(col("id") === 1L).collect()(0)
      .getAs[String]("age_band") == "30-39")
  }

  test("NULL quasi values form their own linkable group") {
    val withNulls = df.unionByName(Seq(
      (7L, null.asInstanceOf[String], "M", "x"),
      (8L, null.asInstanceOf[String], "M", "y"))
      .toDF("id", "age_band", "sex", "payload"))
    val rep = KAnonymity.report(withNulls, Seq("age_band", "sex"), k = 2)
      .filter(col("age_band").isNull).collect()
    assert(rep.length == 1 && rep(0).getAs[Long]("group_size") == 2L)
  }
}
