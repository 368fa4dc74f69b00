package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Versioned

/** SQL row-level DML through the catalog — UPDATE / MERGE INTO /
  * predicate DELETE as group-based copy-on-write
  * ([[VersionedRowLevelOperation]]): Spark's rewrite rules plan the
  * operation, runtime group filtering narrows the scan to the file
  * groups holding matches, and the commit carries every untouched group
  * BY NAME — asserted against the manifest, which is exactly the COW
  * narrowing contract (a group name surviving verbatim proves its bytes
  * were neither read nor rewritten). */
class VersionedRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("rl_wh").toString
  private val cat = "rlcat"
  spark.conf.set(s"spark.sql.catalog.$cat",
    classOf[VersionedCatalog].getName)
  spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
  spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")

  /** A table with three disjoint-range groups c1/c2/c3 (k-quartiles with
    * manifest stats on k), created through pure SQL. */
  private def mkTable(name: String): String = {
    val t = s"$cat.ns.$name"
    spark.range(0, 100).select(col("id").as("k"), (col("id") * 10).as("v"))
      .createOrReplaceTempView(s"src_${name}_1")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v BIGINT)
                  TBLPROPERTIES ('statsCol'='k')""")
    Seq((0, 100), (100, 200), (200, 300)).foreach { case (lo, hi) =>
      spark.range(lo, hi).select(col("id").as("k"), (col("id") * 10).as("v"))
        .createOrReplaceTempView(s"src_$name")
      spark.sql(s"INSERT INTO $t SELECT * FROM src_$name")
    }
    val dir = s"$warehouse/ns/$name"
    assert(Versioned.groupNames(dir) == Seq("c1", "c2", "c3"))
    t
  }

  private def dirOf(name: String) = s"$warehouse/ns/$name"

  test("SQL UPDATE rewrites only the matching group; others carry by name") {
    val t = mkTable("upd")
    spark.sql(s"UPDATE $t SET v = v + 100000 WHERE k >= 120 AND k <= 130")
    // COW narrowing pinned in the MANIFEST: c1 and c3 survive verbatim —
    // their bytes were never read or rewritten; only c2 (the group whose
    // rows matched) was replaced
    assert(Versioned.groupNames(dirOf("upd")).sorted == Seq("c1", "c3", "c4"),
      s"narrowing failed: ${Versioned.groupNames(dirOf("upd"))}")
    val df = spark.sql(s"SELECT * FROM $t")
    assert(df.count() == 300L)
    assert(df.filter(col("v") >= 100000L).count() == 11L)
    assert(df.filter(col("k") === 125L).select("v").as[Long].head() ==
      125L * 10 + 100000L)
    // non-matching rows byte-identical
    assert(df.filter(col("k") === 50L).select("v").as[Long].head() == 500L)
    assert(df.agg(sum("k")).as[Long].head() == (0L until 300L).sum)
    // time travel still serves the pre-UPDATE snapshot (v3 = last INSERT)
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 3")
      .filter(col("v") >= 100000L).count() == 0L)
  }

  test("SQL MERGE INTO: matched updates + unmatched inserts, one group rewritten") {
    val t = mkTable("mrg")
    spark.range(0, 20).select(
      (col("id") + 245).as("k"), lit(-1L).as("v"))
      .createOrReplaceTempView("mrg_updates") // keys 245..264, all in c3
    spark.sql(s"""MERGE INTO $t AS tgt USING mrg_updates AS s
                  ON tgt.k = s.k
                  WHEN MATCHED THEN UPDATE SET v = s.v
                  WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    // all 20 source keys match inside c3 → only c3 rewritten
    assert(Versioned.groupNames(dirOf("mrg")).sorted == Seq("c1", "c2", "c4"))
    val df = spark.sql(s"SELECT * FROM $t")
    assert(df.count() == 300L)
    assert(df.filter(col("v") === -1L).count() == 20L)
    spark.range(0, 10).select((col("id") + 500).as("k"), lit(-2L).as("v"))
      .createOrReplaceTempView("mrg_inserts") // keys 500..509: all new
    spark.sql(s"""MERGE INTO $t AS tgt USING mrg_inserts AS s
                  ON tgt.k = s.k
                  WHEN MATCHED THEN UPDATE SET v = s.v
                  WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val after = spark.sql(s"SELECT * FROM $t")
    assert(after.count() == 310L)
    assert(after.filter(col("v") === -2L).count() == 10L)
    // a pure-insert merge removes nothing: every prior group carries
    val groups = Versioned.groupNames(dirOf("mrg")).sorted
    assert(groups.contains("c1") && groups.contains("c2") &&
      groups.contains("c4"), s"pure-insert merge rewrote groups: $groups")
  }

  test("SQL DELETE with a non-translatable predicate goes row-level, narrowed") {
    val t = mkTable("del")
    // k % 2 = 0 cannot become a source Filter → SupportsDelete declines,
    // the row-level COW path runs; matches live only in c3
    spark.sql(s"DELETE FROM $t WHERE k % 2 = 0 AND k >= 200")
    assert(Versioned.groupNames(dirOf("del")).sorted == Seq("c1", "c2", "c4"),
      s"narrowing failed: ${Versioned.groupNames(dirOf("del"))}")
    val df = spark.sql(s"SELECT * FROM $t")
    assert(df.count() == 250L)
    assert(df.filter(col("k") >= 200 && col("k") % 2 === 0).count() == 0L)
    assert(df.filter(col("k") < 200).count() == 200L)
  }

  test("translatable-predicate DELETE takes the NARROWED row-level path") {
    // r13: SupportsDelete declines every predicate, so even a simple
    // range DELETE — previously a full survivor rewrite — now rewrites
    // only the groups holding matches
    val t = mkTable("deltr")
    spark.sql(s"DELETE FROM $t WHERE k >= 250 AND k <= 260")
    assert(Versioned.groupNames(dirOf("deltr")).sorted ==
      Seq("c1", "c2", "c4"),
      s"narrowing failed: ${Versioned.groupNames(dirOf("deltr"))}")
    val df = spark.sql(s"SELECT * FROM $t")
    assert(df.count() == 289L)
    assert(df.filter(col("k").between(250, 260)).count() == 0L)
    assert(df.filter(col("k") < 250).count() == 250L)
  }

  test("DELETE FROM with no WHERE refuses: a snapshot cannot be empty") {
    val t = mkTable("trunc")
    // Spark special-cases the TRUE condition onto the metadata
    // SupportsDelete path, which this table declines entirely — the
    // refusal is Spark's "Cannot delete from table"; a predicate that
    // happens to match every row is caught later by the commit's own
    // truncate guard ("would truncate the table to empty")
    val e = intercept[Exception] { spark.sql(s"DELETE FROM $t") }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(e0 =>
        Option(e0.getMessage).toSeq ++ msgs(e0.getCause))
    assert(msgs(e).exists(m => m.contains("Cannot delete from table") ||
      m.contains("truncate the table to empty")), s"unexpected: ${msgs(e)}")
    // nothing published; the table still serves all rows
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 300L)
    assert(Versioned.groupNames(dirOf("trunc")) == Seq("c1", "c2", "c3"))
    // ...and the all-rows-matching PREDICATE form hits the commit guard
    val e2 = intercept[Exception] { spark.sql(s"DELETE FROM $t WHERE k >= 0") }
    assert(msgs(e2).exists(_.contains("truncate the table to empty")),
      s"unexpected: ${msgs(e2)}")
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 300L)
  }

  test("MERGE INTO an EMPTY (v0) table inserts as the first commit") {
    val t = s"$cat.ns.emptymrg"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.range(0, 10).select(col("id").as("k"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("emptymrg_src")
    // legal SQL: a pure-insert MERGE against an empty table must land,
    // not die on 'nothing to replace' (ADVICE r13)
    spark.sql(s"""MERGE INTO $t AS tgt USING emptymrg_src AS s
                  ON tgt.k = s.k
                  WHEN MATCHED THEN UPDATE SET v = s.v
                  WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(Versioned.latestVersion(dirOf("emptymrg")) == 1)
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 10L)
    assert(spark.sql(s"SELECT sum(v) FROM $t").as[Long].head() == 90L)
    // a second MERGE now exercises the normal group-based COW path
    spark.sql(s"""MERGE INTO $t AS tgt USING emptymrg_src AS s
                  ON tgt.k = s.k
                  WHEN MATCHED THEN UPDATE SET v = 0""")
    assert(spark.sql(s"SELECT sum(v) FROM $t").as[Long].head() == 0L)
  }

  test("row-level DML matching nothing on an EMPTY table is a no-op") {
    val t = s"$cat.ns.emptyupd"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.sql(s"UPDATE $t SET v = 0 WHERE k = 1") // no rows, no staged files
    assert(Versioned.latestVersion(dirOf("emptyupd")) == 0)
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 0L)
  }

  test("UPDATE matching nothing leaves the table content intact") {
    val t = mkTable("noop")
    val before = spark.sql(s"SELECT * FROM $t").agg(sum("v")).as[Long].head()
    spark.sql(s"UPDATE $t SET v = 0 WHERE k > 100000")
    assert(spark.sql(s"SELECT * FROM $t").agg(sum("v")).as[Long].head()
      == before)
    assert(spark.sql(s"SELECT * FROM $t").count() == 300L)
  }
}
