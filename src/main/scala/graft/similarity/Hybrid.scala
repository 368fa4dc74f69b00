package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — Reciprocal Rank Fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009): combine the ranked lists of several retrievers
  * (lexical BM25, vector ANN, …) by
  *
  *   rrf(d) = Σ_sources 1 / (k0 + rank_source(d))
  *
  * the standard first stage of a modern RAG / search stack (sparse ⊕ dense).
  * Rank-based fusion needs no score calibration between retrievers, which is
  * why it beats naive score averaging across heterogeneous scorers.
  *
  * Determinism discipline (the repo's oracle rules): each contribution is
  * ROUND(1/(k0+rank), 9) summed in exact DECIMAL, so partial-aggregation
  * order can never perturb a total even with many sources; final ordering
  * ties break on the document id.
  *
  * 100 TB shape: inputs are the retrievers' top-N lists — k-row frames, NOT
  * corpus-sized (each retriever already did its own scale-safe top-k). The
  * fusion itself is a union + one tiny group-by; the corpus is touched only
  * inside the retrievers.
  */
object Hybrid {

  /** Fuse ranked lists. Each source frame must carry `idCol` and a 1-based
    * `rank` column; `name` tags which sources hit each doc in the output's
    * `sources` column. Returns (idCol, rrf, n_sources, sources) top-`topK`
    * by fused score. */
  def rrf(sources: Seq[(String, DataFrame)], idCol: String,
      k0: Int = 60, topK: Int = 20): DataFrame = {
    require(sources.nonEmpty, "need at least one ranked source")
    val contribs = sources.map { case (name, df) =>
      df.select(col(idCol),
        round(lit(1.0) / (col("rank") + lit(k0)), 9)
          .cast("decimal(18,9)").as("__c"),
        lit(name).as("__src"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("__rrf_dec"),
        count(lit(1)).as("n_sources"),
        concat_ws(",", sort_array(collect_list(col("__src")))).as("sources"))
      .orderBy(col("__rrf_dec").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), col("__rrf_dec").cast("double").as("rrf"),
        col("n_sources"), col("sources"))
  }

  /** 1-based rank column over a retriever's ALREADY-top-k frame by
    * (score desc, id asc). The window is global but runs on a k-row frame —
    * never call this on a corpus-sized input. */
  def ranked(topk: DataFrame, idCol: String, scoreCol: String): DataFrame =
    topk.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col(scoreCol).desc, col(idCol))).cast("long"))
}
