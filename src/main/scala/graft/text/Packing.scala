package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: the concat-and-chunk layout LLM pretraining
  * uses to turn a document corpus into fixed-length token sequences —
  * documents are laid end-to-end in a pinned global order and the token
  * stream is cut every `seqLen` tokens. The planning query computes, per
  * document, its token offset interval and which sequences it lands in
  * (the metadata a loader needs to materialize shards and the curation
  * signal for boundary-crossing rates).
  *
  * The core primitive is a GLOBAL prefix sum over the pinned order. A
  * naive `Window.orderBy(id)` funnels the whole corpus through ONE
  * partition (the w3 smell — fine for a dim table, fatal at 100 TB). This
  * is the classic two-phase distributed scan instead:
  *   1. range-partition by the order key; per-partition running sum (a
  *      partitioned window — parallel, no global sort);
  *   2. per-partition totals (one row per partition) → cumulative bases
  *      via a window over the partition INDEX (bounded by the partition
  *      count, not the data) → broadcast back.
  * The result is invariant to where the sampled range boundaries fall —
  * the offset of a row is the sum over all smaller keys regardless of the
  * partitioning — so the output is deterministic even though
  * `repartitionByRange` samples. */
object Packing {

  /** Adds `start_offset` = sum of `nCol` over all rows with a smaller
    * `idCol` (the exclusive prefix sum), via the two-phase distributed
    * scan. `parts` bounds phase-2 state (one row per partition). */
  def withStartOffsets(df: DataFrame, idCol: String, nCol: String,
      parts: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(parts, col(idCol))
      .withColumn("__pid", spark_partition_id().cast("long"))
    val wLocal = Window.partitionBy("__pid").orderBy(idCol)
    val local = ranged.withColumn("__run", sum(col(nCol)).over(wLocal))
    // one row per partition; the cumulative-base window is bounded by
    // `parts`, never by the data
    val wPid = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = local.groupBy("__pid").agg(sum(col(nCol)).as("__ptot"))
      .withColumn("__base", sum(col("__ptot")).over(wPid) - col("__ptot"))
      .select("__pid", "__base")
    local.join(broadcast(bases), "__pid")
      .withColumn("start_offset", col("__base") + col("__run") - col(nCol))
      .drop("__pid", "__run", "__base")
  }

  /** Per-document packing plan for sequence length `seqLen`: offset
    * interval, first/last sequence index, boundary-crossing flag.
    * `last_seq` indexes the sequence holding the document's LAST token
    * ((start + n − 1) div L — for the degenerate zero-token document it
    * degrades to the sequence before `first_seq`, a convention both
    * engines compute identically). */
  def packingPlan(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Long, parts: Int = 32): DataFrame = {
    val toks = docs.select(col(idCol),
      TextFunctions.bpeishTokenCount(col(textCol)).as("n_tokens"))
    withStartOffsets(toks, idCol, "n_tokens", parts)
      .withColumn("first_seq", expr(s"start_offset DIV $seqLen"))
      .withColumn("last_seq", expr(s"(start_offset + n_tokens - 1) DIV $seqLen"))
      .withColumn("crosses_boundary", col("last_seq") > col("first_seq"))
      .select(col(idCol), col("n_tokens"), col("start_offset"),
        col("first_seq"), col("last_seq"), col("crosses_boundary"))
  }
}
