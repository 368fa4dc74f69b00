package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage by blocked fuzzy matching — the patient-matching /
  * master-data shape of a clinical platform: find record pairs whose
  * names/identifiers are within a small edit distance, without ever
  * forming the O(n²) pair space. Candidates exist only INSIDE a blocking
  * key (first name token, zip prefix, soundex…) — the classic
  * record-linkage blocking bound: pair cost is Σ block², tunable by key
  * granularity, exactly the LSH-band trade dressed in linkage clothes.
  *
  * Levenshtein is Spark's native codegen'd expression (no UDF); at 100 TB
  * the blocked join hash-partitions on the blocking key, and a hot block
  * (everyone named "MARIA") is the salting/AQE-skew case, same as any
  * skewed join key.
  */
object Linkage {

  /** All intra-block pairs with edit distance ≤ `maxDistance`:
    * (id1, id2, distance), id1 < id2. `blockingKey` is any deterministic
    * Column over the row (rows with a NULL key never match — SQL join
    * semantics, matching the oracle).
    *
    * Two prunes keep the per-pair cost bounded even when a block is hot:
    * a length band (|len(a)−len(b)| ≤ d is necessary for distance ≤ d,
    * and costs one comparison instead of a DP table), then Spark's
    * THRESHOLDED levenshtein (3-arg form, banded DP that abandons a pair
    * the moment the running distance exceeds the cap — O(d·n) per pair
    * instead of O(n²)). */
  def fuzzyPairs(df: DataFrame, idCol: String, textCol: String,
      blockingKey: Column, maxDistance: Int): DataFrame = {
    val a = df.select(blockingKey.as("__block"), col(idCol).as("id1"),
      col(textCol).as("t1"))
    val b = df.select(blockingKey.as("__block"), col(idCol).as("id2"),
      col(textCol).as("t2"))
    prunedDistance(a.join(b, "__block").filter(col("id1") < col("id2")),
      "t1", "t2", maxDistance)
      .select("id1", "id2", "distance")
  }

  /** The shared match core both entry points apply to their joined pair
    * frame: length-band prune, thresholded levenshtein, -1-sentinel
    * filter — one place to tune, both paths stay in lockstep. */
  private def prunedDistance(pairs: DataFrame, t1: String, t2: String,
      maxDistance: Int): DataFrame =
    pairs
      .filter(abs(length(col(t1)) - length(col(t2))) <= maxDistance)
      .withColumn("distance",
        levenshtein(col(t1), col(t2), maxDistance).cast("long"))
      .filter(col("distance") >= 0) // thresholded form yields -1 above cap

  /** The composition that actually survives 100 TB: exact-dedup the text
    * to DISTINCT values first (one shuffle, output ∝ |vocabulary|, not
    * |records|), fuzzy-link the distinct values, and carry each value's
    * record count so cluster mass is recoverable without touching the
    * base table again. Pairwise linkage over raw records is quadratic in
    * the hottest name ("MARIA", "red bolt") — over distinct values it is
    * quadratic only in vocabulary, which grows sub-linearly with data.
    *
    * `blockingKey` must be a deterministic function of `textCol` alone
    * (it is grouped alongside the text). Output: (name1, name2, distance,
    * n1, n2), name1 < name2 lexicographically. */
  def linkDistinct(df: DataFrame, textCol: String, blockingKey: Column,
      maxDistance: Int): DataFrame = {
    val d = df.groupBy(col(textCol).as("__text"), blockingKey.as("__block"))
      .agg(count(lit(1)).as("__n"))
    val a = d.select(col("__block"), col("__text").as("name1"), col("__n").as("n1"))
    val b = d.select(col("__block"), col("__text").as("name2"), col("__n").as("n2"))
    prunedDistance(a.join(b, "__block").filter(col("name1") < col("name2")),
      "name1", "name2", maxDistance)
      .select("name1", "name2", "distance", "n1", "n2")
  }
}
