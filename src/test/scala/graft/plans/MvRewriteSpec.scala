package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.SparkSpec

/** MV auto-rewrite: the rule fires exactly on the supported shapes, the
  * rewritten plan scans the MV (not the base), results are bit-identical to
  * the base plan, and every unsupported shape falls through UNREWRITTEN
  * (never a wrong rewrite). */
class MvRewriteSpec extends SparkSpec {

  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
  private lazy val basePath = s"$root/base"
  private lazy val mvPath = s"$root/mv"

  /** 4 groups × uneven sizes, nulls in the counted column. */
  private lazy val entry: Mv.Entry = {
    import scala.jdk.CollectionConverters._
    val rows = (1 to 400).map { i =>
      org.apache.spark.sql.Row(
        if (i % 2 == 0) "A" else "B",
        if (i % 3 == 0) "x" else "y",
        i.toDouble / 4.0,
        if (i % 7 == 0) null else s"s$i")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g1", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("g2", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("qty", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("tag", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(basePath)
    Mv.enable(spark)
    Mv.create(spark, basePath, mvPath,
      groupCols = Seq("g1", "g2"),
      measures = Seq(
        ("sum", "qty", Some(DecimalType(18, 2))),
        ("min", "qty", None),
        ("max", "qty", None),
        ("count", "tag", None)))
  }

  private def scansMv(df: DataFrame): Boolean = {
    val paths = Mv.scanPaths(df)
    paths.contains(Mv.canonical(mvPath)) && !paths.contains(entry.basePath)
  }

  private def scansBaseOnly(df: DataFrame): Boolean = {
    val paths = Mv.scanPaths(df)
    paths.contains(entry.basePath) && !paths.contains(Mv.canonical(mvPath))
  }

  /** The same logical query with the rewrite suppressed (scan via a path
    * alias DataFrame built from unregistered location is impossible here, so
    * compare against manually computed base numbers by reading base into a
    * local view without the rule firing: the rule keys on the scan path, so
    * reading base through a LIMIT-less union trick is unnecessary — just
    * compute from the MV-disabled registry-free aggregate over a renamed
    * copy). Simpler: compute expected with plain Scala over collected rows. */
  private lazy val baseRows: Seq[(String, String, Double, String)] = {
    entry // force build
    spark.read.parquet(basePath).collect().toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getString(3)))
  }

  test("same-grain aggregate rewrites to the MV and matches the base result") {
    entry
    val df = spark.read.parquet(basePath)
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("cnt"),
        graft.queries.Q.dsum(col("qty")).as("sum_qty"),
        min("qty").as("min_q"), max("qty").as("max_q"),
        count(col("tag")).as("cnt_tag"))
    assert(scansMv(df), df.queryExecution.optimizedPlan.toString)
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
    val exp = baseRows.groupBy(t => (t._1, t._2)).map { case ((a, b), rs) =>
      val sumQ = rs.map(t => BigDecimal(t._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (a, b, rs.size.toLong, sumQ.toDouble, rs.map(_._3).min, rs.map(_._3).max,
        rs.count(_._4 != null).toLong)
    }.toSet
    assert(got == exp)
  }

  test("subset grouping + filter on an MV group column rolls up from the MV") {
    entry
    val df = spark.read.parquet(basePath)
      .where(col("g2") === "x")
      .groupBy("g1")
      .agg(count(lit(1)).as("cnt"), max("qty").as("max_q"))
    assert(scansMv(df), df.queryExecution.optimizedPlan.toString)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val exp = baseRows.filter(_._2 == "x").groupBy(_._1).map { case (a, rs) =>
      (a, rs.size.toLong, rs.map(_._3).max)
    }.toSet
    assert(got == exp)
  }

  test("global (no group-by) aggregate rewrites too") {
    entry
    val df = spark.read.parquet(basePath).agg(count(lit(1)).as("n"))
    assert(scansMv(df), df.queryExecution.optimizedPlan.toString)
    assert(df.collect().head.getLong(0) == 400L)
  }

  test("filter on a NON-grouping column blocks the rewrite (falls back, stays correct)") {
    entry
    val df = spark.read.parquet(basePath)
      .where(col("qty") > 50.0)
      .groupBy("g1").agg(count(lit(1)).as("cnt"))
    assert(scansBaseOnly(df), df.queryExecution.optimizedPlan.toString)
    val exp = baseRows.filter(_._3 > 50.0).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == exp)
  }

  test("unregistered agg shapes block the rewrite: DISTINCT, AVG, expression child, unknown cast") {
    entry
    val base = spark.read.parquet(basePath)
    val shapes = Seq(
      base.groupBy("g1").agg(countDistinct(col("g2")).as("v")),
      base.groupBy("g1").agg(avg(col("qty")).as("v")),
      base.groupBy("g1").agg(sum(col("qty") * 2).as("v")),
      base.groupBy("g1").agg(sum(col("qty").cast("decimal(20,3)")).as("v")),
      base.groupBy("g1").agg(sum(col("qty")).as("v")))
    for (df <- shapes)
      assert(scansBaseOnly(df), df.queryExecution.optimizedPlan.toString)
  }

  test("AVG folds from SUM/COUNT partials bit-identically to the base plan " +
      "(decimal rounding boundaries, nulls, all-null group, negatives)") {
    import scala.jdk.CollectionConverters._
    val avgBase = s"$root/avg_base"
    val avgRef = s"$root/avg_ref" // identical rows, UNREGISTERED
    val avgMv = s"$root/avg_mv"
    // awkward divisions: group sizes 1..13, cent-grained and negative
    // values, a null measure inside a group, one ALL-NULL group
    val rows = ((1 to 403).map { i =>
      val g = s"g${i % 13}"
      val q: java.lang.Double =
        if (i % 41 == 0) null
        else (i * 7919 % 1000000).toDouble / 100.0 * (if (i % 5 == 0) -1 else 1)
      org.apache.spark.sql.Row(g, q)
    } ++ Seq(org.apache.spark.sql.Row("allnull", null),
             org.apache.spark.sql.Row("allnull", null))).asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("qty",
        org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(avgBase)
    // byte-identical reference copy, never registered
    spark.read.parquet(avgBase).write.mode("overwrite").parquet(avgRef)
    Mv.enable(spark)
    Mv.create(spark, avgBase, avgMv,
      groupCols = Seq("g"),
      measures = Seq(
        ("sum", "qty", Some(DecimalType(18, 2))),
        ("count", "qty", Some(DecimalType(18, 2))),
        ("sum", "qty", None),
        ("count", "qty", None)))
    def q(path: String) = spark.read.parquet(path)
      .groupBy("g")
      .agg(
        avg(col("qty").cast(DecimalType(18, 2))).as("avg_dec"),
        avg(col("qty")).as("avg_dbl"),
        avg(col("qty").cast(DecimalType(18, 2))).cast("double")
          .as("avg_dec_dbl"))
      .orderBy("g")
    val rewritten = q(avgBase)
    assert(Mv.scanPaths(rewritten).contains(Mv.canonical(avgMv)) &&
      !Mv.scanPaths(rewritten).contains(Mv.canonical(avgBase)),
      rewritten.queryExecution.optimizedPlan.toString)
    val got = rewritten.collect().toSeq
    val want = q(avgRef).collect().toSeq
    assert(got == want, s"\nfold: ${got.mkString("\n")}\n" +
      s"base: ${want.mkString("\n")}")
    // result types preserved exactly (Decimal(22,6) for the decimal avg)
    assert(rewritten.schema("avg_dec").dataType == DecimalType(22, 6))
    // global (no group-by) AVG folds too
    val g2 = spark.read.parquet(avgBase)
      .agg(avg(col("qty").cast(DecimalType(18, 2))).as("a"))
    assert(Mv.scanPaths(g2).contains(Mv.canonical(avgMv)))
    assert(g2.collect().toSeq ==
      spark.read.parquet(avgRef)
        .agg(avg(col("qty").cast(DecimalType(18, 2))).as("a"))
        .collect().toSeq)
  }

  test("versioned-base MV: rewrites the pinned snapshot, declines stale, " +
      "re-fires after refreshVersioned; time travel matches exactly") {
    val tdir = s"$root/vmv_table"
    import graft.ops.Versioned
    Versioned.commit(
      spark.range(0, 100).select(
        (col("id") % 4).cast("string").as("g"), col("id").as("k")),
      tdir)
    val e1 = Mv.createVersioned(spark, tdir, s"$root/vmv_v1",
      groupCols = Seq("g"),
      measures = Seq(("sum", "k", Some(DecimalType(18, 0))),
        ("count", "k", None)))
    assert(e1.baseVersion.contains(1))
    Mv.enable(spark)
    def q() = spark.read.format("graft-versioned").option("path", tdir)
      .load().groupBy("g")
      .agg(sum(col("k").cast(DecimalType(18, 0))).as("s"),
        count(col("k")).as("n"))
      .orderBy("g")
    // fires on the head scan (pinned v1 == MV base version)
    val r1 = q()
    assert(Mv.scanPaths(r1).contains(Mv.canonical(s"$root/vmv_v1")) &&
      !Mv.scanPaths(r1).contains(Mv.canonical(tdir)),
      r1.queryExecution.optimizedPlan.toString)
    val want1 = (0 until 4).map(g =>
      (g.toString, (0 until 100).filter(_ % 4 == g).sum, 25L))
    assert(r1.collect().map(r => (r.getString(0),
      r.getDecimal(1).longValueExact(), r.getLong(2))).toSeq == want1)
    // STALE after an append: the rewrite must DECLINE and the base plan
    // must serve the full (new) data
    Versioned.commit(
      spark.range(100, 120).select(
        (col("id") % 4).cast("string").as("g"), col("id").as("k")),
      tdir)
    val r2 = q()
    assert(!Mv.scanPaths(r2).contains(Mv.canonical(s"$root/vmv_v1")),
      r2.queryExecution.optimizedPlan.toString)
    assert(r2.collect().map(_.getLong(2)).sum == 120L)
    // refresh folds ONLY the appended group, re-fires at the new pin
    val e2 = Mv.refreshVersioned(spark, e1, s"$root/vmv_v2")
    assert(e2.baseVersion.contains(2))
    val r3 = q()
    assert(Mv.scanPaths(r3).contains(Mv.canonical(s"$root/vmv_v2")) &&
      !Mv.scanPaths(r3).contains(Mv.canonical(tdir)),
      r3.queryExecution.optimizedPlan.toString)
    val want3 = (0 until 4).map(g =>
      (g.toString, (0 until 120).filter(_ % 4 == g).sum, 30L))
    assert(r3.collect().map(r => (r.getString(0),
      r.getDecimal(1).longValueExact(), r.getLong(2))).toSeq == want3)
    // time travel to v1 now pins version 1 ≠ MV base 2 → declines (and
    // stays correct on the historical rows)
    val r4 = spark.read.format("graft-versioned").option("path", tdir)
      .option("versionAsOf", "1").load().groupBy("g")
      .agg(count(col("k")).as("n"))
    assert(!Mv.scanPaths(r4).contains(Mv.canonical(s"$root/vmv_v2")))
    assert(r4.collect().map(_.getLong(1)).sum == 100L)
    // refresh at head is a no-op
    assert(Mv.refreshVersioned(spark, e2, s"$root/vmv_v3") eq e2)
  }

  test("a NON-DETERMINISTIC filter blocks the rewrite (would re-evaluate per group)") {
    entry
    val df = spark.read.parquet(basePath)
      .where(rand(7) < 0.5 && col("g2") === "x")
      .groupBy("g1").agg(count(lit(1)).as("cnt"))
    assert(scansBaseOnly(df), df.queryExecution.optimizedPlan.toString)
  }

  test("grouping by a non-MV column blocks the rewrite") {
    entry
    val df = spark.read.parquet(basePath)
      .groupBy("tag").agg(count(lit(1)).as("cnt"))
    assert(scansBaseOnly(df), df.queryExecution.optimizedPlan.toString)
  }

  test("aggregates over unregistered paths are untouched") {
    entry
    val other = s"$root/other"
    spark.read.parquet(basePath).write.mode("overwrite").parquet(other)
    val df = spark.read.parquet(other).groupBy("g1").agg(count(lit(1)).as("cnt"))
    val paths = Mv.scanPaths(df)
    assert(paths.contains(Mv.canonical(other)))
    assert(!paths.contains(Mv.canonical(mvPath)))
  }

  test("distinct-preserving MV: COUNT/SUM/AVG/MAX(DISTINCT x) fold exactly " +
      "per-group and on the global rollup; unregistered columns and " +
      "stale pinned versions decline") {
    val r2 = java.nio.file.Files.createTempDirectory("graft-mv-distinct").toString
    // versioned base: 2 statuses × overlapping customer sets, nulls in the
    // distinct column (COUNT DISTINCT skips them — the MV grain keeps a
    // null row per group, Count skips it identically)
    val o = spark.range(0, 300).select(
      when(col("id") % 2 === 0, "O").otherwise("F").as("st"),
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 37).as("cust"),
      (col("id") % 10).cast("double").as("amt"))
    val dir = s"$r2/tbl"
    graft.ops.Versioned.commit(o, dir)
    Mv.enable(spark)
    val e = Mv.createVersioned(spark, dir, s"$r2/mv",
      groupCols = Seq("st"),
      measures = Seq(("sum", "amt", Some(DecimalType(18, 2)))),
      distinctCols = Seq("cust"))
    def conn() = spark.read.format("graft-versioned").option("path", dir).load()
    def usesMv(df: DataFrame): Boolean = {
      val p = Mv.scanPaths(df)
      p.contains(Mv.canonical(e.mvPath)) && !p.contains(Mv.canonical(dir))
    }
    def declines(df: DataFrame): Boolean =
      !Mv.scanPaths(df).contains(Mv.canonical(e.mvPath))
    // the MV grain is |st × cust| (≤ 2×38 rows), not |base|
    assert(spark.read.parquet(e.mvPath).count() ==
      o.select("st", "cust").distinct().count())
    val per = conn().groupBy("st").agg(
      countDistinct(col("cust")).as("u"), count(lit(1)).as("cnt"),
      sum(col("amt").cast(DecimalType(18, 2))).as("s"))
    assert(usesMv(per), per.queryExecution.optimizedPlan.toString)
    val expPer = o.groupBy("st").agg(
      countDistinct(col("cust")).as("u"), count(lit(1)).as("cnt"),
      sum(col("amt").cast(DecimalType(18, 2))).as("s"))
    assert(per.orderBy("st").collect().toSeq ==
      expPer.orderBy("st").collect().toSeq)
    val global = conn().agg(countDistinct(col("cust")).as("u"))
    assert(usesMv(global), global.queryExecution.optimizedPlan.toString)
    assert(global.head().getLong(0) ==
      o.agg(countDistinct(col("cust"))).head().getLong(0))
    // every distinct aggregate over the REGISTERED column folds — the
    // grain preserves exactly the distinct (st, cust) pairs, so the
    // replayed distinct agg sees the base's post-dedup value set
    val sdAd = conn().groupBy("st").agg(
      sum_distinct(col("cust")).as("sd"),
      expr("avg(DISTINCT cust)").as("ad"),
      expr("max(DISTINCT cust)").as("mx"))
    assert(usesMv(sdAd), sdAd.queryExecution.optimizedPlan.toString)
    val sdAdExp = o.groupBy("st").agg(
      sum_distinct(col("cust")).as("sd"),
      expr("avg(DISTINCT cust)").as("ad"),
      expr("max(DISTINCT cust)").as("mx"))
    assert(sdAd.orderBy("st").collect().toSeq ==
      sdAdExp.orderBy("st").collect().toSeq)
    // declines — never a wrong rewrite: a distinct over a column
    // outside distinctCols is not preserved by the grain (it dedups
    // (st, cust), not (st, amt))
    assert(declines(conn().groupBy("st")
      .agg(sum_distinct(col("amt")).as("v"))))
    assert(declines(conn().groupBy("st")
      .agg(countDistinct(col("amt")).as("v"))))
    // staleness: an append moves the pinned version past the MV's —
    // the query falls through to the base plan and serves the NEW rows
    graft.ops.Versioned.commit(spark.range(1000, 1010).select(
      lit("O").as("st"), col("id").as("cust"), lit(1.0).as("amt")), dir)
    val stale = conn().groupBy("st").agg(countDistinct(col("cust")).as("u"))
    assert(declines(stale), stale.queryExecution.optimizedPlan.toString)
    assert(stale.filter(col("st") === "O").head().getLong(1) ==
      graft.ops.Versioned.read(spark, dir).filter(col("st") === "O")
        .agg(countDistinct(col("cust"))).head().getLong(0))
  }

  test("re-registration claiming columns a cached MV artifact lacks " +
      "DECLINES instead of crashing the optimizer (review r15)") {
    val r3 = java.nio.file.Files.createTempDirectory("graft-mv-stale").toString
    val o = spark.range(0, 100).select(
      when(col("id") % 2 === 0, "A").otherwise("B").as("g"),
      (col("id") % 7).as("x"), col("id").cast("double").as("amt"))
    o.write.mode("overwrite").parquet(s"$r3/base")
    Mv.enable(spark)
    // build WITHOUT distinctCols → artifact grain is (g) only
    Mv.create(spark, s"$r3/base", s"$r3/mv", groupCols = Seq("g"),
      measures = Seq(("sum", "amt", Some(DecimalType(18, 2)))))
    // re-register the SAME artifact claiming a distinct grain it lacks:
    // create() sees _SUCCESS and skips the rebuild
    Mv.create(spark, s"$r3/base", s"$r3/mv", groupCols = Seq("g"),
      measures = Seq(("sum", "amt", Some(DecimalType(18, 2)))),
      distinctCols = Seq("x"))
    val q = spark.read.parquet(s"$r3/base").groupBy("g")
      .agg(countDistinct(col("x")).as("u"))
    // fall-through-to-base, correct answer, no optimizer crash
    val paths = Mv.scanPaths(q)
    assert(!paths.contains(Mv.canonical(s"$r3/mv")), paths.mkString(","))
    assert(q.orderBy("g").collect().map(_.getLong(1)).toSeq == Seq(7L, 7L))
    // the lying registration declines EVERY shape (the artifact is not
    // what the entry describes); an honest re-registration serves again
    val lied = spark.read.parquet(s"$r3/base").groupBy("g")
      .agg(sum(col("amt").cast(DecimalType(18, 2))).as("s"))
    assert(!Mv.scanPaths(lied).contains(Mv.canonical(s"$r3/mv")))
    Mv.create(spark, s"$r3/base", s"$r3/mv", groupCols = Seq("g"),
      measures = Seq(("sum", "amt", Some(DecimalType(18, 2)))))
    val ok = spark.read.parquet(s"$r3/base").groupBy("g")
      .agg(sum(col("amt").cast(DecimalType(18, 2))).as("s"))
    assert(Mv.scanPaths(ok).contains(Mv.canonical(s"$r3/mv")))
  }

  test("downstream operators over the rewritten aggregate keep resolving (sort + projection)") {
    entry
    val df = spark.read.parquet(basePath)
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 0)
      .select(col("g1"), (col("cnt") * 2).as("cnt2"))
      .orderBy("g1", "cnt2")
    assert(scansMv(df), df.queryExecution.optimizedPlan.toString)
    assert(df.collect().length == 4)
  }
}
