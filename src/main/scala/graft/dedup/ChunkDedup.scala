package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact substring-level deduplication at fixed chunk granularity — the
  * tractable relational form of Lee et al., "Deduplicating Training Data
  * Makes Language Models Better" (ACL 2022), which removes repeated
  * substrings ACROSS documents, not just whole-document dups (t5) or
  * near-dups (t7/t12): boilerplate headers, license blocks and quoted
  * passages repeat verbatim inside otherwise-distinct pages. Suffix-array
  * matching at arbitrary offsets doesn't relationalize; fixed word-chunks
  * are the standard approximation (dedup keys every k words).
  *
  * Pipeline: tokenize → chunk each doc's words into fixed-width windows
  * (array slices — no explode of words, no nondeterministic collect) →
  * keep only the FIRST occurrence of each distinct chunk text, "first" =
  * lexicographic min of (doc_id, chunk_idx) — a deterministic global
  * rule — → reassemble each doc from its surviving chunks in order.
  *
  * Scale shape (three linear shuffles, all map-side combinable or
  * key-bounded): (1) first-occurrence is a groupBy on the chunk DIGEST
  * with a struct-min — partial aggregation does the per-partition
  * argmin, shuffle volume is one 16-byte digest + one (long,long) per
  * distinct chunk, never the chunk text; (2) the keep decision joins
  * back on the digest; (3) reassembly shuffles kept chunks by doc_id.
  * No window over the full corpus, no sort. At 100 TB the digest
  * group-by is the classic dedup shuffle — AQE-safe, salting-free
  * (digests are uniform).
  */
object ChunkDedup {

  /** Per-document dedup summary: (doc_id, n_chunks, n_kept, kept_md5)
    * where kept_md5 fingerprints the reassembled surviving text (NULL if
    * every chunk of the doc appeared earlier elsewhere). */
  def firstOccurrence(docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int): DataFrame = {
    require(chunkWords >= 1, s"chunkWords: $chunkWords")
    val words = docs.select(col(idCol).cast("long").as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("w"))
    val chunks = words
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0),
          expr(s"(size(w) + ${chunkWords - 1}) div $chunkWords - 1")
            .cast("int"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(slice(col("w"),
          col("chunk_idx") * chunkWords + 1, lit(chunkWords)), " ").as("chunk"))
      .withColumn("dig", md5(col("chunk")))
    val firsts = chunks
      .groupBy("dig")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("loc"))
      .select(col("dig"), col("loc.doc_id").as("kdoc"),
        col("loc.chunk_idx").as("kidx"))
    val kept = chunks.join(firsts,
      chunks("dig") === firsts("dig")
        && col("doc_id") === col("kdoc") && col("chunk_idx") === col("kidx"))
    val agg = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      md5(array_join(
        transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          x => x.getField("chunk")), " ")).as("kept_md5"))
    words
      .select(col("doc_id"),
        expr(s"(size(w) + ${chunkWords - 1}) div $chunkWords")
          .cast("long").as("n_chunks"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("kept_md5"))
  }
}
