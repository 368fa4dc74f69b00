package graft.stats

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("Welch t matches precomputed values (stats_utils.py semantics)") {
    val df = (Seq(5.1, 4.9, 6.2, 5.8, 5.5, 6.0).map(("a", _)) ++
      Seq(4.2, 4.0, 4.8, 4.4).map(("b", _))).toDF("g", "v")
    val row = Stats.welchT(df, "v", "g", "a", "b").collect()(0)
    assert(row.getAs[Long]("n1") == 6 && row.getAs[Long]("n2") == 4)
    assert(math.abs(row.getAs[Double]("t_stat") - 4.5717352677925955) < 1e-9)
    assert(math.abs(row.getAs[Double]("mean1") - 5.583333333333333) < 1e-12)
    // normal-approx p with the A&S erf polynomial (|eps| < 1.5e-7)
    assert(math.abs(row.getAs[Double]("p_value") - 4.837017980374725e-06) < 1e-6)
  }

  test("chi-square matches precomputed table (Wilson–Hilferty two-sided p)") {
    val rows =
      Seq.fill(20)(("A", "X")) ++ Seq.fill(10)(("A", "Y")) ++
        Seq.fill(5)(("B", "X")) ++ Seq.fill(25)(("B", "Y"))
    val df = rows.toDF("r", "c")
    val out = Stats.chiSquare(df, "r", "c").collect()(0)
    assert(math.abs(out.getAs[Double]("chi2") - 15.42857142857143) < 1e-9)
    assert(out.getAs[Long]("dof") == 1)
    // reference: p = 2·(1 − Φ(|z|)), stats_utils.py:40
    assert(math.abs(out.getAs[Double]("p_value") - 0.00028225091033928784) < 1e-5)
  }

  test("chi-square counts zero-observed cells via the dense matrix") {
    // contingency [[8,4],[0,6]] — cell (B,X) never occurs in the data but
    // still contributes (0−e)²/e = e in the reference's dense formulation
    val rows =
      Seq.fill(8)(("A", "X")) ++ Seq.fill(4)(("A", "Y")) ++ Seq.fill(6)(("B", "Y"))
    val out = Stats.chiSquare(rows.toDF("r", "c"), "r", "c").collect()(0)
    assert(math.abs(out.getAs[Double]("chi2") - 7.2) < 1e-9)
    assert(out.getAs[Long]("dof") == 1)
    assert(math.abs(out.getAs[Double]("p_value") - 0.01443273568412673) < 1e-5)
  }

  test("Welch t with zero standard error returns t=0, p=1 (se guard)") {
    val df = (Seq.fill(3)(("a", 3.0)) ++ Seq.fill(2)(("b", 3.0))).toDF("g", "v")
    val row = Stats.welchT(df, "v", "g", "a", "b").collect()(0)
    assert(row.getAs[Double]("t_stat") == 0.0)
    // A&S polynomial: |erf(0)| ≈ 1e-9, so p is 1 up to the approximation
    assert(math.abs(row.getAs[Double]("p_value") - 1.0) < 1e-7)
  }

  test("p-values stay in [0,1] and t is antisymmetric") {
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++ Seq(2.0, 3.0, 4.0).map(("b", _)))
      .toDF("g", "v")
    val ab = Stats.welchT(df, "v", "g", "a", "b").collect()(0)
    val ba = Stats.welchT(df, "v", "g", "b", "a").collect()(0)
    assert(math.abs(ab.getAs[Double]("t_stat") + ba.getAs[Double]("t_stat")) < 1e-12)
    Seq(ab, ba).foreach { r =>
      val p = r.getAs[Double]("p_value")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("Welford single-pass moments match var_samp / avg across partitions") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .repartition(4)
    val builtin = df.agg(avg("c_acctbal"), var_samp("c_acctbal"))
      .collect()(0)
    val ds = df.select(col("c_acctbal")).as[Double]
    val m = ds.groupByKey(_ => 1).agg(Welford.moments).collect()(0)._2
    assert(m.n == df.count())
    assert(math.abs(m.mean - builtin.getDouble(0)) < 1e-9)
    assert(math.abs(m.variance - builtin.getDouble(1)) < 1e-6)
    // merge is order-insensitive up to fp noise
    val a = Seq(1.0, 2.0, 3.0).foldLeft(Welford.zero)(Welford.update)
    val b = Seq(10.0, 11.0).foldLeft(Welford.zero)(Welford.update)
    val ab = Welford.merge(a, b)
    val all = Seq(1.0, 2.0, 3.0, 10.0, 11.0).foldLeft(Welford.zero)(Welford.update)
    assert(math.abs(ab.variance - all.variance) < 1e-12)
  }
}
