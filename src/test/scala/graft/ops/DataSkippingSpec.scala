package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-skip").toString + "/t"

  test("pruned read equals the full filtered scan and actually skips files") {
    val dir = freshDir()
    val df = (1L to 10000L).map(i => (i, i % 97, s"v$i")).toDF("k", "grp", "s")
    DataSkipping.writeClustered(df, dir, "k", nFiles = 8)
    val (scan, nRead, nTotal) = DataSkipping.prunedRead(
      spark, dir, "k", lit(2000L), lit(2999L))
    val got = scan.select("k").as[Long].collect().sorted
    assert(got.toSeq == (2000L to 2999L))
    assert(nTotal == 8 && nRead < nTotal && nRead >= 1)
  }

  test("boundary values are inclusive and out-of-range reads are empty") {
    val dir = freshDir()
    DataSkipping.writeClustered(
      (1L to 100L).toDF("k"), dir, "k", nFiles = 4)
    val (one, _, _) = DataSkipping.prunedRead(spark, dir, "k", lit(100L), lit(100L))
    assert(one.count() == 1)
    val (none, nRead, _) = DataSkipping.prunedRead(spark, dir, "k", lit(500L), lit(600L))
    assert(none.count() == 0 && nRead == 0)
  }

  test("manifest covers every row exactly once") {
    val dir = freshDir()
    DataSkipping.writeClustered(
      (1L to 5000L).toDF("k"), dir, "k", nFiles = 8)
    val m = spark.read.parquet(s"$dir/_manifest")
    assert(m.agg(sum("rows")).head().getLong(0) == 5000L)
    // clustered write → file ranges are disjoint (sound AND selective)
    val ranges = m.select("min_v", "max_v").as[(Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ => ()
    }
  }

  test("unclustered data stays correct (skips nothing, loses nothing)") {
    val dir = freshDir()
    val df = (1L to 1000L).map(i => (i * 7919L) % 1000L).toDF("k")
    // bypass clustering: write shuffled, then manifest via the same pass
    df.repartition(4).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("k")).as("min_v"), max(col("k")).as("max_v"),
        count(lit(1)).as("rows"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_manifest")
    val (scan, nRead, nTotal) = DataSkipping.prunedRead(
      spark, dir, "k", lit(100L), lit(199L))
    assert(scan.count() ==
      spark.read.parquet(dir).filter(col("k").between(100L, 199L)).count())
    assert(nRead == nTotal) // zone maps on random data skip nothing — honestly
  }

  test("bloom manifest prunes point lookups where zone maps cannot " +
      "(unclustered high-cardinality key)") {
    val dir = freshDir()
    val df = spark.range(0, 20000).toDF("id")
    DataSkipping.writeWithBloom(df, dir, "id", nFiles = 16,
      numBits = 1 << 15, numHashes = 7)
    // present key: exactly its one home file (+ rare false positives)
    val (hit, read, total) = DataSkipping.bloomPrunedRead(spark, dir, "id", "12345")
    assert(total == 16 && read >= 1 && read < total, s"read=$read of $total")
    assert(hit.select("id").as[Long].collect().toSeq == Seq(12345L))
    // absent key: bloom answers definitely-not-here for (almost) all files
    val (miss, readM, _) = DataSkipping.bloomPrunedRead(spark, dir, "id", "999999")
    assert(miss.count() == 0)
    assert(readM <= 2, s"absent key matched $readM files — fpp way off")
    // zone maps on the SAME layout are useless for this lookup: every
    // file's [min,max] contains the key
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("id")).as("min_v"), max(col("id")).as("max_v"),
        count(lit(1)).as("rows"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_manifest")
    val (_, zRead, zTotal) = DataSkipping.prunedRead(
      spark, dir, "id", lit(12345L), lit(12345L))
    assert(zRead == zTotal)
  }
}
