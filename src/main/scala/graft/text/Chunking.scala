package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the context-window preparation step of
  * a RAG / training-data pipeline: each document becomes overlapping
  * fixed-token-budget chunks (window `w` tokens, stride `s` < w → `w - s`
  * tokens of overlap), so no token span longer than the overlap is ever cut
  * across a chunk boundary.
  *
  * Reference scope: the reference has no chunker (its texts are short
  * clinical strings); this is one of the beyond-reference LLM-pipeline
  * operators the engine treats as first-class (builder brief), sitting
  * upstream of embedding (emb-family), packing (t28) and chunk dedup (t44).
  *
  * Chunk grammar (pinned by the t46 oracle): tokens are whitespace splits;
  * chunk starts are 0, s, 2s, … strictly below the token count; each chunk
  * takes min(w, n - start) tokens. A document shorter than the window yields
  * exactly one chunk; blank (empty-after-trim) documents yield none.
  *
  * 100 TB shape: pure per-row narrow work — tokenize once per document
  * (one projected array column, never re-inlined into lambdas), explode the
  * start sequence, slice. No shuffle, no UDF, whole-stage codegen end to
  * end; output size is input size × (1 + overlap ratio), which the caller
  * controls via `stride`.
  */
object Chunking {

  /** Overlapping chunks of `textCol`, one output row per chunk:
    * (idCol, chunk_idx, tok_start, n_tok, chunk_text). */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__w"))
      .withColumn("__n", size(col("__w")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__w"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("tok_start"),
        slice(col("__w"), col("col") + 1, lit(window)).as("__chunk"))
      .select(
        col(idCol), col("chunk_idx"), col("tok_start"),
        size(col("__chunk")).cast("long").as("n_tok"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
