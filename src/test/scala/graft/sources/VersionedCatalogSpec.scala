package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Versioned

class VersionedCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("graft_cat_wh").toString
    spark.conf.set("spark.sql.catalog.lakecat",
      classOf[VersionedCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakecat.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.ns")
    w
  }

  test("CREATE TABLE + INSERT INTO + SELECT round-trip through pure SQL") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.t1 (k BIGINT, v DOUBLE, tag STRING)")
    // pre-commit table: declared schema served from the sidecar
    assert(spark.table("lakecat.ns.t1").schema.fieldNames.toSeq ==
      Seq("k", "v", "tag"))
    assert(spark.table("lakecat.ns.t1").count() == 0L)
    spark.sql(
      """INSERT INTO lakecat.ns.t1
         SELECT id AS k, id * 0.5 AS v, concat('s', id % 3) AS tag
         FROM range(0, 30)""")
    assert(Versioned.latestVersion(s"$warehouse/ns/t1") == 1)
    assert(spark.sql("SELECT sum(k) FROM lakecat.ns.t1").as[Long].head()
      == (0L until 30L).sum)
    // second INSERT = append commit
    spark.sql(
      """INSERT INTO lakecat.ns.t1
         SELECT id AS k, id * 0.5 AS v, 'x' AS tag FROM range(30, 40)""")
    assert(Versioned.latestVersion(s"$warehouse/ns/t1") == 2)
    assert(spark.table("lakecat.ns.t1").count() == 40L)
  }

  test("SQL VERSION AS OF time travel serves historical snapshots") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.tt (k BIGINT)")
    spark.sql("INSERT INTO lakecat.ns.tt SELECT id FROM range(0, 5)")
    spark.sql("INSERT INTO lakecat.ns.tt SELECT id FROM range(5, 12)")
    assert(spark.sql("SELECT count(*) FROM lakecat.ns.tt VERSION AS OF 1")
      .as[Long].head() == 5L)
    assert(spark.sql("SELECT count(*) FROM lakecat.ns.tt VERSION AS OF 2")
      .as[Long].head() == 12L)
  }

  test("INSERT OVERWRITE commits a fresh snapshot; filtered overwrite refused") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.ow (k BIGINT)")
    spark.sql("INSERT INTO lakecat.ns.ow SELECT id FROM range(0, 10)")
    spark.sql("INSERT OVERWRITE lakecat.ns.ow SELECT id FROM range(100, 103)")
    assert(spark.table("lakecat.ns.ow").as[Long].collect().sorted.toSeq ==
      Seq(100L, 101L, 102L))
    // history intact underneath
    assert(Versioned.read(spark, s"$warehouse/ns/ow", 1).count() == 10L)
  }

  test("CTAS creates and populates in one statement") {
    warehouse
    spark.sql(
      """CREATE TABLE lakecat.ns.ctas AS
         SELECT id AS k, id * 2 AS dbl FROM range(0, 8)""")
    assert(spark.sql("SELECT sum(dbl) FROM lakecat.ns.ctas").as[Long].head()
      == (0L until 8L).map(_ * 2).sum)
  }

  test("DROP / RENAME / list surfaces") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.gone (k BIGINT)")
    spark.sql("INSERT INTO lakecat.ns.gone SELECT id FROM range(0, 3)")
    // the RENAME TO target is catalog-relative (Spark reuses the source
    // catalog; a catalog-qualified target would nest it as a namespace)
    spark.sql("ALTER TABLE lakecat.ns.gone RENAME TO ns.kept")
    assert(spark.table("lakecat.ns.kept").count() == 3L)
    assert(!spark.catalog.tableExists("lakecat.ns.gone"))
    spark.sql("DROP TABLE lakecat.ns.kept")
    assert(!spark.catalog.tableExists("lakecat.ns.kept"))
    val listed = spark.sql("SHOW TABLES IN lakecat.ns")
      .select("tableName").as[String].collect().toSet
    assert(!listed.contains("kept") && !listed.contains("gone"))
  }

  test("SQL DELETE FROM commits a survivor snapshot; history retained") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.del (k BIGINT, tag STRING)")
    spark.sql(
      """INSERT INTO lakecat.ns.del
         SELECT id AS k, concat('s', id % 2) AS tag FROM range(0, 20)""")
    spark.sql("DELETE FROM lakecat.ns.del WHERE k < 5 OR tag = 's1'")
    val kept = spark.table("lakecat.ns.del").select("k").as[Long]
      .collect().sorted.toSeq
    assert(kept == (5L until 20L).filter(_ % 2 == 0))
    // the delete is a new version; pre-delete snapshot intact
    assert(Versioned.latestVersion(s"$warehouse/ns/del") == 2)
    assert(spark.sql("SELECT count(*) FROM lakecat.ns.del VERSION AS OF 1")
      .as[Long].head() == 20L)
  }

  test("SQL DELETE keeps rows where the predicate is NULL (three-valued logic)") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.nulldel (k BIGINT, tag STRING)")
    Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b"))
      .toDF("k", "tag").createOrReplaceTempView("nulldel_src")
    spark.sql("INSERT INTO lakecat.ns.nulldel SELECT * FROM nulldel_src")
    spark.sql("DELETE FROM lakecat.ns.nulldel WHERE tag = 'a'")
    // SQL deletes only TRUE predicates: the NULL-tag row must SURVIVE
    assert(spark.table("lakecat.ns.nulldel").select("k").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("VERSION AS OF 0 refuses instead of silently serving latest") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.v0 (k BIGINT)")
    spark.sql("INSERT INTO lakecat.ns.v0 SELECT id FROM range(0, 4)")
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM lakecat.ns.v0 VERSION AS OF 0").collect()
    }
    assert(e.getMessage.contains("versions start at 1"))
  }

  test("versionAtTimestamp tie-breaks toward the highest version") {
    val d = java.nio.file.Files.createTempDirectory("vts").toString
    Versioned.commit(spark.range(0, 3).select(col("id").as("k")), d,
      commitTs = Some(1000L))
    Versioned.commit(spark.range(3, 5).select(col("id").as("k")), d,
      commitTs = Some(2000L))
    Versioned.commit(spark.range(5, 6).select(col("id").as("k")), d,
      commitTs = Some(2000L)) // same stamp as v2 — pinned-clock replay
    assert(Versioned.versionAtTimestamp(d, 1000L) == 1)
    assert(Versioned.versionAtTimestamp(d, 1999L) == 1)
    assert(Versioned.versionAtTimestamp(d, 2000L) == 3) // newest of the tie
    intercept[IllegalArgumentException] {
      Versioned.versionAtTimestamp(d, 999L)
    }
  }

  test("identifier charset and partition transforms are refused") {
    warehouse
    intercept[Exception] {
      spark.sql("CREATE TABLE lakecat.ns.`bad/name` (k BIGINT)")
    }
    intercept[Exception] {
      spark.sql(
        "CREATE TABLE lakecat.ns.parted (k BIGINT) PARTITIONED BY (k)")
    }
  }

  test("catalog tables ride the connector: pushdown + stats pruning intact") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.pruned (k BIGINT) TBLPROPERTIES ('statsCol'='k')")
    spark.sql("INSERT INTO lakecat.ns.pruned SELECT id FROM range(0, 100)")
    spark.sql("INSERT INTO lakecat.ns.pruned SELECT id FROM range(100, 200)")
    // planned FILES, not partitions — bins re-split to parallelism (r15)
    def parts(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collectFirst {
        case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          s.partitions.flatten.collect {
            case p: VersionedFilePartition => p.files.size
          }.sum
      }.get
    val all = parts(spark.table("lakecat.ns.pruned"))
    val few = parts(spark.table("lakecat.ns.pruned").filter(col("k") >= 150L))
    assert(few > 0 && few < all, s"stats pruning inactive: $few of $all")
    assert(spark.sql("SELECT count(*) FROM lakecat.ns.pruned WHERE k >= 150")
      .as[Long].head() == 50L)
  }

  test("SQL ALTER TABLE ADD COLUMN DEFAULT: metadata-only, old groups serve the default") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.alt (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO lakecat.ns.alt SELECT id, id * 0.5 FROM range(0, 10)")
    val dir = s"$warehouse/ns/alt"
    val groupsBefore = Versioned.groupNames(dir)
    spark.sql("ALTER TABLE lakecat.ns.alt ADD COLUMN status STRING DEFAULT 'new'")
    // O(1): no data group was written or rewritten
    assert(Versioned.groupNames(dir) == groupsBefore)
    assert(spark.table("lakecat.ns.alt").schema.fieldNames.toSeq ==
      Seq("k", "v", "status"))
    // pre-ALTER rows serve the default through the CONNECTOR read
    assert(spark.sql("SELECT count(*) FROM lakecat.ns.alt WHERE status = 'new'")
      .as[Long].head() == 10L)
    // post-ALTER INSERT materializes the column physically; both cohorts
    // read under one scan
    spark.sql("""INSERT INTO lakecat.ns.alt
                 SELECT id, id * 0.5, concat('s', id) FROM range(10, 13)""")
    assert(spark.table("lakecat.ns.alt").count() == 13L)
    assert(spark.sql(
      "SELECT count(*) FROM lakecat.ns.alt WHERE status = 'new'")
      .as[Long].head() == 10L)
    assert(spark.sql(
      "SELECT status FROM lakecat.ns.alt WHERE k = 11").as[String].head()
      == "s11")
    // time travel: the pre-ALTER version has no such column
    assert(!spark.sql("SELECT * FROM lakecat.ns.alt VERSION AS OF 1")
      .schema.fieldNames.contains("status"))
    // ADD COLUMN without DEFAULT refuses with guidance
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lakecat.ns.alt ADD COLUMN nodefault BIGINT")
    }
    assert(e.getMessage.contains("DEFAULT"))
  }

  test("SQL ALTER TABLE RENAME COLUMN: metadata-only, reads and pushdown follow") {
    warehouse
    spark.sql("""CREATE TABLE lakecat.ns.ren (k BIGINT, v DOUBLE)
                 TBLPROPERTIES ('statsCol'='k')""")
    (0 to 1).foreach(i => spark.sql(
      s"INSERT INTO lakecat.ns.ren SELECT id, id*1.0 FROM range(${i*100}, ${i*100+100})"))
    val dir = s"$warehouse/ns/ren"
    val groupsBefore = Versioned.groupNames(dir)
    spark.sql("ALTER TABLE lakecat.ns.ren RENAME COLUMN k TO key_id")
    assert(Versioned.groupNames(dir) == groupsBefore) // zero data moved
    assert(spark.table("lakecat.ns.ren").schema.fieldNames.toSeq ==
      Seq("key_id", "v"))
    assert(spark.sql(
      "SELECT sum(key_id) FROM lakecat.ns.ren").as[Long].head()
      == (0L until 200L).sum)
    // manifest-stats pruning still plans fewer FILES on the NEW name
    // (bins re-split to parallelism, so partition count is no proxy, r15)
    def parts(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.partitions.flatten.collect {
            case p: VersionedFilePartition => p.files.size
          }.sum
      }.max
    val all = parts(spark.table("lakecat.ns.ren"))
    val few = parts(spark.table("lakecat.ns.ren")
      .filter(col("key_id") >= 150L))
    assert(few > 0 && few < all, s"pruning lost after rename: $few of $all")
    assert(spark.sql(
      "SELECT count(*) FROM lakecat.ns.ren WHERE key_id >= 150")
      .as[Long].head() == 50L)
    // INSERT after a pending rename COMMITS: the staged writer
    // translates logical→physical at the write boundary, so the new
    // group keeps the original physical name and the snapshot stays
    // homogeneous (round 16 — the write-side twin of the evolved read)
    spark.sql(
      "INSERT INTO lakecat.ns.ren SELECT id, 0.0 FROM range(200, 210)")
    assert(spark.table("lakecat.ns.ren").count() == 210L)
    assert(spark.sql(
      "SELECT sum(key_id) FROM lakecat.ns.ren").as[Long].head()
      == (0L until 210L).sum)
    // metadata-only pins intact: the new group's files carry the
    // PHYSICAL name 'k' on disk, no prior group was touched
    val lastGroup = Versioned.groupNames(dir).last
    assert(spark.read.parquet(s"$dir/data/$lastGroup")
      .columns.contains("k"))
  }

  test("SQL TRUNCATE TABLE: O(1) tombstone, time travel intact, re-insert works") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.tr (k BIGINT, v DOUBLE)")
    // legal SQL on an EMPTY (v0) table: a no-op, not an error
    spark.sql("TRUNCATE TABLE lakecat.ns.tr")
    assert(Versioned.latestVersion(s"$warehouse/ns/tr") == 0)
    assert(spark.table("lakecat.ns.tr").count() == 0L)
    spark.sql("INSERT INTO lakecat.ns.tr SELECT id, id*1.0 FROM range(0, 10)")
    spark.sql("INSERT INTO lakecat.ns.tr SELECT id, id*1.0 FROM range(10, 20)")
    val dir = s"$warehouse/ns/tr"
    spark.sql("TRUNCATE TABLE lakecat.ns.tr")
    // metadata-only: one new version, zero groups, data files untouched
    assert(Versioned.latestVersion(dir) == 3)
    assert(Versioned.groupNames(dir).isEmpty)
    assert(new java.io.File(s"$dir/data/c1").exists(),
      "TRUNCATE must not delete data files (VACUUM's job)")
    // the tombstone serves a TYPED empty frame on both read surfaces
    assert(spark.table("lakecat.ns.tr").count() == 0L)
    assert(spark.table("lakecat.ns.tr").schema.fieldNames.toSeq ==
      Seq("k", "v"))
    assert(Versioned.read(spark, dir).count() == 0L)
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("k", "v"))
    // every pre-truncate version still time-travels
    assert(spark.sql("SELECT * FROM lakecat.ns.tr VERSION AS OF 2")
      .count() == 20L)
    assert(spark.sql("SELECT * FROM lakecat.ns.tr VERSION AS OF 1")
      .count() == 10L)
    // appends after the truncate are ordinary first-group commits
    spark.sql(
      "INSERT INTO lakecat.ns.tr SELECT id, id*1.0 FROM range(100, 105)")
    assert(spark.table("lakecat.ns.tr").count() == 5L)
    assert(spark.sql("SELECT sum(k) FROM lakecat.ns.tr").as[Long].head()
      == (100L until 105L).sum)
    // the truncate step is an overwrite — the streaming source refuses it
    assert(!Versioned.stepIsAppend(dir, 3))
  }

  test("ALTER TABLE ADD COLUMN with a non-literal DEFAULT refuses clearly") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.nldef (k BIGINT)")
    spark.sql("INSERT INTO lakecat.ns.nldef SELECT id FROM range(0, 3)")
    val e = intercept[Exception] {
      spark.sql(
        "ALTER TABLE lakecat.ns.nldef ADD COLUMN r DOUBLE DEFAULT rand()")
    }
    // either Spark's own constant-folding gate or the catalog's
    // foldable-literal require — never a bare NPE (ADVICE r13)
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(!msgs(e).exists(_.isEmpty) || msgs(e).exists(_.nonEmpty))
    assert(msgs(e).exists(m => m.contains("foldable literal") ||
      m.toLowerCase.contains("default")), s"unexpected: ${msgs(e)}")
    assert(spark.table("lakecat.ns.nldef").schema.fieldNames.toSeq ==
      Seq("k"))
  }

  test("SQL ALTER TABLE DROP COLUMN: metadata-only, time travel keeps it") {
    warehouse
    spark.sql("CREATE TABLE lakecat.ns.dr (k BIGINT, v DOUBLE, junk STRING)")
    spark.sql("""INSERT INTO lakecat.ns.dr
                 SELECT id, id*1.0, 'x' FROM range(0, 10)""")
    spark.sql("ALTER TABLE lakecat.ns.dr DROP COLUMN junk")
    assert(spark.table("lakecat.ns.dr").schema.fieldNames.toSeq ==
      Seq("k", "v"))
    assert(spark.table("lakecat.ns.dr").count() == 10L)
    // pre-DROP version still reads the column (files keep the bytes)
    assert(spark.sql("SELECT junk FROM lakecat.ns.dr VERSION AS OF 1")
      .distinct().as[String].head() == "x")
    // appends after the drop simply omit the column
    spark.sql("INSERT INTO lakecat.ns.dr SELECT id, id*1.0 FROM range(10, 12)")
    assert(spark.table("lakecat.ns.dr").count() == 12L)
  }
}
