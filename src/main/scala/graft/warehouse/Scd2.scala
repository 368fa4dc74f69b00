package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: versioned dimension rows with
  * [valid_from, valid_to) ranges and an is_current flag.
  *
  * The reference's warehouse keeps type-1 dims only (`sql/warehouse_ddl
  * .sql:21-38` — overwrite on load); SCD2 extends the star schema the
  * way every production clinical warehouse eventually must (audit trail:
  * "what did this subject's record say when the model scored it?").
  *
  * One formulation covers both rebuild and incremental merge:
  * [[fromHistory]] derives the dimension from a change-event log, and
  * because it collapses consecutive identical attribute tuples, feeding
  * it (current dimension version-starts ∪ new events) is an idempotent
  * incremental merge ([[merge]]). Cost: one shuffle+sort per key — two
  * window passes over the same partitioning (Catalyst reuses the sort),
  * then a group-by on (key, run) that shuffles nothing new.
  */
object Scd2 {

  /** Build the SCD2 dimension from a change-event history: one row per
    * run of consecutive identical `attrs` per `key` (ordered by `ts`,
    * ties by `tieBreak`), with `valid_from` = first ts of the run,
    * `valid_to` = start of the next run (null = open), `is_current`.
    * Attribute comparison is null-safe (`eqNullSafe`).
    */
  def fromHistory(events: DataFrame, key: String, attrs: Seq[String],
      ts: String, tieBreak: String): DataFrame = {
    require(attrs.nonEmpty)
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    val tuple = struct(attrs.map(col): _*)
    val prev = lag(tuple, 1).over(w)
    val changed = when(prev.isNull || !prev.eqNullSafe(tuple), 1L).otherwise(0L)
    val runs = events
      .withColumn("__run", sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((col(key) +: col("__run") +: attrs.map(col)): _*)
      .agg(min(col(ts)).as("valid_from"))
    // __run as tie-break keeps version order deterministic even when two
    // adjacent runs start at the same ts (possible under ts ties)
    val wv = Window.partitionBy(key).orderBy(col("valid_from"), col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
  }

  /** Incremental SCD2 merge: current dimension + new change events →
    * next dimension. Each existing version re-enters as a synthetic
    * change event at its `valid_from`; [[fromHistory]] then re-collapses,
    * so replayed/unchanged updates produce no new versions (idempotent).
    */
  def merge(dim: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], ts: String, tieBreak: String): DataFrame = {
    val asEvents = dim.select(
      (col(key) +: col("valid_from").as(ts) +: attrs.map(col)): _*)
      .withColumn(tieBreak, lit(null).cast(updates.schema(tieBreak).dataType))
    val upd = updates.select(
      (col(key) +: col(ts) +: attrs.map(col)) :+ col(tieBreak): _*)
    fromHistory(asEvents.unionByName(upd), key, attrs, ts, tieBreak)
  }
}
