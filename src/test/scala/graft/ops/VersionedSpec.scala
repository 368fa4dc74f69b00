package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-versioned").toString + "/tbl"

  test("append commit adds a file group; time travel sees each version " +
      "byte-stable") {
    val dir = freshDir()
    val v1 = Versioned.commit(Seq(1L, 2L, 3L).toDF("id"), dir)
    val v2 = Versioned.commit(Seq(4L, 5L).toDF("id"), dir)
    assert((v1, v2) == (1, 2))
    assert(Versioned.latestVersion(dir) == 2)
    // historical version unchanged by the later commit
    assert(Versioned.read(spark, dir, 1).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    assert(Versioned.read(spark, dir, 2).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 5L))
    // default read = latest
    assert(Versioned.read(spark, dir).count() == 5L)
  }

  test("overwrite commit starts a fresh file-group set; old versions " +
      "still readable") {
    val dir = freshDir()
    Versioned.commit(Seq(1L, 2L).toDF("id"), dir)
    Versioned.commit(Seq(9L).toDF("id"), dir, overwrite = true)
    assert(Versioned.read(spark, dir, 2).as[Long].collect().toSeq == Seq(9L))
    assert(Versioned.read(spark, dir, 1).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
  }

  test("manifest stats prune non-intersecting groups; pruned read equals " +
      "full-scan filter") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10L), (2L, 19L)).toDF("id", "k"), dir,
      statsCol = Some("k"))
    Versioned.commit(Seq((3L, 20L), (4L, 29L)).toDF("id", "k"), dir,
      statsCol = Some("k"))
    Versioned.commit(Seq((5L, 30L), (6L, 39L)).toDF("id", "k"), dir,
      statsCol = Some("k"))
    val (df, planned, total) = Versioned.prunedRead(spark, dir, "k", 20L, 25L)
    assert((planned, total) == (1, 3))
    assert(df.select("id").as[Long].collect().toSeq == Seq(3L))
    val full = Versioned.read(spark, dir)
      .filter(col("k") >= 20L && col("k") <= 25L)
      .select("id").as[Long].collect().toSeq
    assert(full == Seq(3L))
    // disjoint range: zero groups planned, empty result
    val (edf, p0, _) = Versioned.prunedRead(spark, dir, "k", 100L, 200L)
    assert(p0 == 0 && edf.count() == 0L)
  }

  test("a data write without a published manifest is invisible") {
    val dir = freshDir()
    Versioned.commit(Seq(1L).toDF("id"), dir)
    // simulate a crashed commit: data files land, manifest never published
    Seq(99L).toDF("id").write.parquet(s"$dir/data/c99_orphan")
    assert(Versioned.latestVersion(dir) == 1)
    assert(Versioned.read(spark, dir).as[Long].collect().toSeq == Seq(1L))
  }
}
