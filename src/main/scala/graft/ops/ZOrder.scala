package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional data skipping.
  *
  * Sorting a table by one column gives tight parquet row-group min/max
  * bounds — and therefore scan-time skipping — for that column only.
  * Interleaving the bits of two key columns and range-sorting by the
  * result gives *simultaneous* locality in both dimensions: every output
  * file covers a small rectangle of (a, b) space, so predicates on EITHER
  * column prune files. This is the layout trick behind Delta/Iceberg
  * Z-ORDER clustering, built here from plain column expressions (the bit
  * spread is five shift-or-mask steps, fully codegen'd — no UDF).
  *
  * Inputs are 32-bit non-negative ints (callers bucket/rank wider
  * domains first — standard practice, since z-order on raw skewed values
  * wastes bits).
  */
object ZOrder {

  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000ffff0000ffffL,
    8 -> 0x00ff00ff00ff00ffL,
    4 -> 0x0f0f0f0f0f0f0f0fL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 32 bits of `c` into the even bit positions of a
    * 64-bit value (Morton encoding half). */
  def spread(c: Column): Column =
    Masks.foldLeft(c.cast("long").bitwiseAND(lit(0xffffffffL))) {
      case (x, (shift, mask)) =>
        (x.bitwiseOR(shiftleft(x, shift))).bitwiseAND(lit(mask))
    }

  /** 64-bit Morton code of two 32-bit non-negative ints. */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  private val UnspreadLadder: Seq[(Int, Long)] = Seq(
    1 -> 0x3333333333333333L,
    2 -> 0x0f0f0f0f0f0f0f0fL,
    4 -> 0x00ff00ff00ff00ffL,
    8 -> 0x0000ffff0000ffffL,
    16 -> 0x00000000ffffffffL)

  /** Inverse of [[spread]]: collapse the even bit positions back to the
    * low 32 bits (the reversed mask ladder). */
  def unspread(c: Column): Column =
    UnspreadLadder.foldLeft(c.bitwiseAND(lit(0x5555555555555555L))) {
      case (x, (shift, mask)) =>
        (x.bitwiseOR(shiftright(x, shift))).bitwiseAND(lit(mask))
    }

  /** Decode a Morton code back to its (a, b) components — the inverse of
    * [[zValue]]; handy for mapping a file's z-range back to the key
    * rectangle it covers. */
  def zDecode(z: Column): (Column, Column) =
    (unspread(z), unspread(shiftright(z, 1)))

  /** Write `df` z-ordered on (aCol, bCol): range-partition by the Morton
    * code into `nFiles` and sort within partitions, so each parquet file
    * covers one z-range — a small (a, b) rectangle. */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String,
      path: String, nFiles: Int): Unit = {
    val z = zValue(col(aCol), col(bCol)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** [[writeZOrdered]] plus a per-file TWO-dimensional min/max manifest
    * (`_manifest/`, one row per file: min/max of BOTH key columns) — the
    * [[DataSkipping.writeClustered]] zone map generalized to the z-layout.
    * Because every file covers a small (a, b) rectangle, the manifest
    * rectangles are tight in BOTH dimensions, which is the entire point of
    * Z-ORDER clustering: a predicate on EITHER column prunes files, where a
    * linear sort gives tight bounds on its sort column only. Manifest built
    * by one distributed pass over the written files. */
  def writeZOrderedWithManifest(df: DataFrame, aCol: String, bCol: String,
      path: String, nFiles: Int): Unit = {
    writeZOrdered(df, aCol, bCol, path, nFiles)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(aCol)).as("min_a"), max(col(aCol)).as("max_a"),
        min(col(bCol)).as("min_b"), max(col(bCol)).as("max_b"),
        count(lit(1)).as("rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** Scan planned over only the files whose manifest rectangle intersects
    * the query box [aLo,aHi]×[bLo,bHi] (pass the full domain on one axis
    * for a single-dimension predicate), residual predicate applied.
    * Returns (frame, filesRead, filesTotal) so callers can assert the
    * pruning actually happened — the [[DataSkipping.prunedRead]] contract
    * in two dimensions. The manifest collect is one row per FILE (bounded
    * by layout, not data). */
  def boxPrunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
      aCol: String, bCol: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long)
      : (DataFrame, Int, Int) = {
    val rows = spark.read.parquet(s"$path/_manifest")
      .select(col("file"),
        (col("max_a") >= aLo && col("min_a") <= aHi &&
          col("max_b") >= bLo && col("min_b") <= bHi).as("keep"))
      .collect()
    val files = rows.filter(_.getBoolean(1)).map(_.getString(0)).toSeq
    val residual = (d: DataFrame) => d
      .filter(col(aCol) >= aLo && col(aCol) <= aHi &&
        col(bCol) >= bLo && col(bCol) <= bHi)
    val df =
      if (files.isEmpty) residual(spark.read.parquet(path)).filter(lit(false))
      else residual(spark.read.parquet(files: _*))
    (df, files.size, rows.length)
  }
}
