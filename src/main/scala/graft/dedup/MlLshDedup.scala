package graft.dedup

import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** MinHash dedup on the MLlib standard path (SURVEY §7.1 step 9:
  * `MinHashLSH.approx_similarity_join`): shingle → CountVectorizer(binary)
  * → MinHashLSH → approxSimilarityJoin on Jaccard distance.
  *
  * Complements [[Dedup.minhashLshPairs]] (the engine-portable md5-based
  * variant that the DuckDB oracle can replicate): this one rides MLlib's
  * implementation — use it when interoperating with MLlib pipelines; use
  * the portable one when results must be reproducible outside Spark.
  */
object MlLshDedup {

  /** Candidate near-dup pairs with Jaccard distance ≤ `maxDistance`.
    * `vocabSize` bounds the CountVectorizer vocabulary — the library
    * default (2^18) silently truncates to the most frequent shingles on
    * any real corpus, computing Jaccard over boilerplate only; size it
    * ≥ the expected distinct-shingle count (the native `Dedup` path has
    * no vocabulary at all and is the primary at scale). */
  def approxJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashTables: Int, maxDistance: Double,
      seed: Long = 42L, vocabSize: Int = 1 << 22): DataFrame = {
    val shingled = df.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("shingles",
        expr(s"transform(sequence(0, greatest(size(toks) - $n, 0)), " +
          s"i -> concat_ws(' ', slice(toks, i + 1, $n)))"))
      .filter(size(col("toks")) >= n)
    val cv = new CountVectorizer()
      .setInputCol("shingles").setOutputCol("features").setBinary(true)
      .setVocabSize(vocabSize)
    val model: CountVectorizerModel = cv.fit(shingled)
    val vectorized = model.transform(shingled)
      // MinHashLSH requires ≥1 non-zero entry. Column-level predicate on
      // the vector's internal representation (unwrap_udt → struct(type,
      // size, indices, values); sparse type=0 carries only non-zeros, so
      // non-empty ⇔ indices non-empty) — the repo's last Scala UDF
      // removed (r9 VERDICT item 8): no serialization wall, stays inside
      // codegen.
      .filter {
        val u = unwrap_udt(col("features"))
        when(u.getField("type") === 0, size(u.getField("indices")) > 0)
          .otherwise(exists(u.getField("values"), _ =!= lit(0.0)))
      }
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val lshModel = lsh.fit(vectorized)
    lshModel
      .approxSimilarityJoin(vectorized, vectorized, maxDistance, "jaccard_dist")
      .select(col(s"datasetA.$idCol").as("id1"),
        col(s"datasetB.$idCol").as("id2"),
        col("jaccard_dist"))
      .filter(col("id1") < col("id2"))
  }
}
