package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR hashed importance weighting (graft.text.Dsir): ranking semantics,
  * feature accounting, and determinism of the integer-nano weight path. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target distribution talks about cats; off-target about bonds
  private def corpus = Seq(
    (1L, "the cat sat on the mat", "tgt"),
    (2L, "a cat and a cat again", "tgt"),
    (3L, "cats cat mat cat sat", "src"),        // target-LIKE but not marked
    (4L, "yield curves price the bond", "src"),
    (5L, "bond yield duration convexity", "src"),
    (6L, "", "src")
  ).toDF("doc_id", "text", "grp")

  test("target-like documents outrank off-target documents") {
    val w = Dsir.importanceWeights(corpus, col("grp") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 3 shares cat/sat/mat features with the target model; docs 4/5
    // only ever hit source-side buckets
    assert(w(3L) > w(4L), s"expected target-like 3 above bond doc 4: $w")
    assert(w(3L) > w(5L), s"expected target-like 3 above bond doc 5: $w")
    // the target docs themselves score above everything off-target
    assert(w(1L) > w(4L) && w(2L) > w(5L))
  }

  test("n_feats = 2·tokens − 1 (unigrams + bigrams); empty text = 1 feat") {
    val got = Dsir.importanceWeights(corpus, col("grp") === "tgt")
      .select("doc_id", "n_feats").as[(Long, Long)].collect().toMap
    assert(got(1L) == 11L) // 6 tokens → 6 + 5
    assert(got(2L) == 11L)
    assert(got(6L) == 1L)  // "" tokenizes to [""] → 1 unigram, 0 bigrams
  }

  test("weights are deterministic across runs and repartitionings") {
    val a = Dsir.importanceWeights(corpus, col("grp") === "tgt")
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(corpus.repartition(7), col("grp") === "tgt")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("bucket collisions change estimates, not totals: Σ n_feats invariant") {
    val big = Dsir.importanceWeights(corpus, col("grp") === "tgt",
      nBuckets = 4096)
    val tiny = Dsir.importanceWeights(corpus, col("grp") === "tgt",
      nBuckets = 8)
    val sb = big.agg(sum("n_feats")).head().getLong(0)
    val st = tiny.agg(sum("n_feats")).head().getLong(0)
    assert(sb == st && sb == 11 + 11 + 9 + 9 + 7 + 1)
  }
}
