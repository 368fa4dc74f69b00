package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton code interleaves bits (known values)") {
    val rows = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3),
      (0xffffffff, 0)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z")).as[Long].collect()
    // interleave(a,b): a in even bits, b in odd bits
    assert(rows.toSeq == Seq(0L, 1L, 2L, 3L, 4L, 8L, 15L, 0x5555555555555555L))
  }

  test("property: zDecode inverts zValue over random 32-bit pairs") {
    val rnd = new scala.util.Random(42L)
    val pairs = Seq.fill(200)((rnd.nextInt() & 0xffffffffL, rnd.nextInt() & 0xffffffffL)) ++
      Seq((0L, 0L), (0xffffffffL, 0xffffffffL), (0L, 0xffffffffL))
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
    val (da, db) = ZOrder.zDecode(col("z"))
    val bad = df.select(col("a"), col("b"), da.as("da"), db.as("db"))
      .filter(col("a") =!= col("da") || col("b") =!= col("db"))
    assert(bad.count() == 0)
  }

  /** Mean per-file span of a column across the written files — the proxy
    * for how much a min/max predicate can skip. */
  private def meanSpan(path: String, colName: String): Double = {
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(colName)).cast("long"), max(col(colName)).cast("long"))
        .collect()(0)
      (r.getLong(1) - r.getLong(0)).toDouble
    }.sum / files.length
  }

  test("z-ordered layout bounds BOTH dimensions per file; 1-d sort only one") {
    val root = java.nio.file.Files.createTempDirectory("graft-zorder")
    // deterministic uniform grid walk over (0..1023)^2
    val df = spark.range(0, 20000).select(
      (pmod(hash(col("id")), lit(1024))).cast("int").as("x"),
      (pmod(hash(col("id"), lit(1)), lit(1024))).cast("int").as("y"))
    val nFiles = 16

    ZOrder.writeZOrdered(df, "x", "y", s"$root/z", nFiles)
    df.withColumn("__s", col("x"))
      .repartitionByRange(nFiles, col("__s")).sortWithinPartitions("__s")
      .drop("__s").write.mode("overwrite").parquet(s"$root/by_x")

    val (zx, zy) = (meanSpan(s"$root/z", "x"), meanSpan(s"$root/z", "y"))
    val (sx, sy) = (meanSpan(s"$root/by_x", "x"), meanSpan(s"$root/by_x", "y"))
    // 1-d sort: x is tight but y spans the full domain
    assert(sx < 150, s"sx=$sx")
    assert(sy > 900, s"sy=$sy")
    // z-order: both dimensions bounded well under the full 1024 domain
    assert(zx < 600, s"zx=$zx")
    assert(zy < 600, s"zy=$zy")
    // The per-file covered AREA is invariant (total cells / files) — what
    // z-order buys is balance: the worst dimension's span shrinks from
    // the full domain to ~sqrt(area), so min/max pruning works for
    // predicates on EITHER column instead of only the sort column.
    assert(math.max(zx, zy) < 0.6 * math.max(sx, sy),
      s"z worst-dim ${math.max(zx, zy)} vs 1-d worst-dim ${math.max(sx, sy)}")
  }

  test("boxPrunedRead skips files on either dimension and matches the " +
      "full-scan filter") {
    val root = java.nio.file.Files.createTempDirectory("graft-zorder-box")
    val df = spark.range(0, 20000).select(
      col("id"),
      (pmod(hash(col("id")), lit(1024))).cast("int").as("x"),
      (pmod(hash(col("id"), lit(1)), lit(1024))).cast("int").as("y"))
    ZOrder.writeZOrderedWithManifest(df, "x", "y", s"$root/z", 16)

    def fullScan(aLo: Long, aHi: Long, bLo: Long, bHi: Long): Long =
      spark.read.parquet(s"$root/z")
        .filter(col("x") >= aLo && col("x") <= aHi &&
          col("y") >= bLo && col("y") <= bHi).count()

    // small 2-d box: most files pruned
    val (box, read, total) =
      ZOrder.boxPrunedRead(spark, s"$root/z", "x", "y", 0, 127, 0, 127)
    assert(total == 16 && read < total, s"read=$read of $total")
    assert(box.count() == fullScan(0, 127, 0, 127))

    // single-dimension predicate on the SECOND column still prunes —
    // the property a 1-d sort by x cannot give
    val (byY, readY, _) =
      ZOrder.boxPrunedRead(spark, s"$root/z", "x", "y", 0, 1023, 0, 127)
    assert(readY < 16, s"readY=$readY")
    assert(byY.count() == fullScan(0, 1023, 0, 127))

    // empty box
    val (none, read0, _) =
      ZOrder.boxPrunedRead(spark, s"$root/z", "x", "y", 5000, 6000, 0, 1023)
    assert(read0 == 0 && none.count() == 0)
  }
}
