package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level MERGE (upsert): the table-format "MERGE INTO" expressed as a
  * plain relational plan — one full-outer join on the key, matched rows
  * take the update's columns, unmatched keep/insert. The reference's
  * loads are whole-partition overwrites (S9, dynamic partition
  * overwrite); row-level merge is what replaces them once updates stop
  * aligning with partition boundaries.
  *
  * Scale shape: one shuffle of each side on the key (or zero with
  * co-bucketed layouts — see `ops.Scale.writeBucketed`), output written
  * back partition-aligned. Deletes ride the same plan: pass a `deleted`
  * marker column in `updates` and filter after merge.
  */
object Upsert {

  /** Merge `updates` into `target` by `key`: a matched row takes the
    * update's columns wholesale (a NULL in the update still wins — true
    * MERGE semantics, via a presence marker rather than coalesce), new
    * keys are inserted, unmatched target rows pass through. Both frames
    * must share the schema.
    *
    * Precondition (same as SQL MERGE): `updates` must be unique on `key`.
    * SQL MERGE raises "multiple source rows matched" at runtime; a lazy
    * plan builder cannot, so a duplicate-keyed source would instead fan
    * out the matched target rows. Deduplicate first —
    * [[latestPerKey]] is the standard last-write-wins reduction. */
  def merge(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(target.columns.sameElements(updates.columns),
      s"schema mismatch: ${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val t = target.columns.filter(_ != key)
      .foldLeft(target)((d, c) => d.withColumnRenamed(c, s"__t_$c"))
    val u = updates.columns.filter(_ != key)
      .foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
      .withColumn("__upd", lit(true))
    val joined = t.join(u, Seq(key), "full_outer")
    target.columns.filter(_ != key).foldLeft(joined) { (d, c) =>
      d.withColumn(c,
          when(col("__upd").isNotNull, col(s"__u_$c")).otherwise(col(s"__t_$c")))
        .drop(s"__u_$c", s"__t_$c")
    }.select(target.columns.map(col): _*)
  }

  /** Last-write-wins reduction of an update batch to one row per key:
    * the row with the greatest (`orderCol`, then `tieBreak`) survives.
    * Run this before [[merge]] when the batch may carry multiple updates
    * for one key (CDC streams do). One shuffle on the key. */
  def latestPerKey(updates: DataFrame, key: String, orderCol: String,
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    updates
      .withColumn("__rn", row_number().over(
        Window.partitionBy(key)
          .orderBy(col(orderCol).desc, col(tieBreak).desc)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
