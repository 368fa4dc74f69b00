package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** K-Minimum-Values sketches over hashed element sets (Bar-Yossef et al.
  * 2002; set operations per Beyer et al. 2007, the Theta-sketch family's
  * public ancestor) — the distinct-counting sketch that, unlike HLL,
  * supports INTERSECTION estimation: keep the k smallest 60-bit hashes of
  * a set; the k-th minimum estimates the distinct count
  * (n̂ = (k−1)·2⁶⁰ ⁄ kthMin), and for two sets the Jaccard estimator is
  * the fraction of the UNION sketch's members (k smallest of the merged
  * sketches) present in both input sketches — |A∩B| then follows as
  * Ĵ·n̂(A∪B).
  *
  * Everything is DETERMINISTIC given the hash (the MinHash/Dsir
  * convention: hash60 = the md5-substring integer both engines compute
  * identically), so the sketch VALUES — k-th minima, union-sketch
  * intersection count — sit directly under a cross-engine hash gate;
  * the real-valued estimates are derived columns.
  *
  * Scale shape: one scan per side → a k-row sketch via partial top-k
  * (sort-limit = TakeOrderedAndProject, per-partition heaps); merging
  * sketches is k-row arithmetic. The sketch of a 10¹¹-element corpus is
  * k rows — the "how much does crawl B overlap crawl A" answer without
  * ever joining the corpora.
  */
object Kmv {

  /** The k smallest distinct hash60 values of `elem` over `df` — the KMV
    * sketch, as a k-row frame (h: LONG). */
  def sketch(df: DataFrame, elem: Column, k: Int, seed: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.select(TextFunctions.hash60(elem, seed).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
  }

  /** k-th minimum of a sketch (its largest member when the set had ≥ k
    * distinct elements — callers gate that). */
  def kthMin(sk: DataFrame): Long =
    sk.agg(max(col("h"))).head().getLong(0)

  /** Distinct-count estimate from a k-th minimum over the 60-bit hash
    * space: (k−1)·2⁶⁰ ⁄ kthMin. */
  def estimateDistinct(k: Int, kthMinVal: Long): Double =
    (k - 1).toDouble * math.pow(2.0, 60) / kthMinVal.toDouble

  /** Jaccard + intersection machinery for two sketches of width k:
    * returns (unionSketch, bothCount) where `unionSketch` is the k
    * smallest of the merged sketches and `bothCount` how many of its
    * members occur in BOTH inputs — Ĵ = bothCount ⁄ k. All integer
    * surfaces (k-row frames, one count). */
  def unionIntersect(a: DataFrame, b: DataFrame, k: Int)
      : (DataFrame, Long) = {
    val union = a.unionAll(b).distinct().orderBy(col("h")).limit(k)
    val both = union
      .join(a.withColumnRenamed("h", "ha"), col("h") === col("ha"), "left_semi")
      .join(b.withColumnRenamed("h", "hb"), col("h") === col("hb"), "left_semi")
      .count()
    (union, both)
  }
}
