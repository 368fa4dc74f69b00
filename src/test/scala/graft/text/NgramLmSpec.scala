package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hashed bigram LM cross-entropy (graft.text.NgramLm): discrimination,
  * smoothing fallbacks, edge accounting, determinism. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // training rows repeat a tight phrase distribution; the odd ones out
  // share no bigrams with it
  private def corpus = Seq(
    (1L, "the cat sat on the mat", true),
    (2L, "the cat sat on the rug", true),
    (3L, "the dog sat on the mat", true),
    (4L, "the cat sat on the mat", false),  // in-distribution, not trained on
    (5L, "zzq qqz zqz qzq zzq qqz", false), // out-of-distribution
    (6L, "one", false),                     // 1 token → no bigrams
    (7L, "", false)                         // tokenizes to [""] → no bigrams
  ).toDF("doc_id", "text", "is_train")

  private def ce = NgramLm.crossEntropy(corpus, col("is_train"))
    .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
    .toMap

  test("in-distribution documents score lower cross-entropy than OOD") {
    val w = ce
    assert(w(4L).get < w(5L).get,
      s"expected trained-phrase doc 4 below gibberish doc 5: $w")
    // training docs themselves are in-distribution too
    assert(w(1L).get < w(5L).get)
  }

  test("docs without bigrams get NULL scores and n_bigrams = 0") {
    val rows = NgramLm.crossEntropy(corpus, col("is_train"))
      .filter(col("doc_id") >= 6L).orderBy("doc_id")
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 0L, s"n_bigrams: $r")
      assert(r.isNullAt(2), s"nll_nano should be NULL: $r")
      assert(r.isNullAt(3), s"ce should be NULL: $r")
    }
  }

  test("ce is exactly the derived nll_nano / 1e9 / n_bigrams, rounded") {
    NgramLm.crossEntropy(corpus, col("is_train"))
      .filter(col("n_bigrams") > 0).collect().foreach { r =>
      // BigDecimal.valueOf (shortest-repr) — Spark's Round semantics,
      // NOT new BigDecimal(double) (exact binary expansion)
      val derived = java.math.BigDecimal
        .valueOf(r.getLong(2).toDouble / 1e9 / r.getLong(1))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(r.getDouble(3) == derived, s"ce vs derived: $r")
    }
  }

  test("n_bigrams = tokens − 1") {
    val got = NgramLm.crossEntropy(corpus, col("is_train"))
      .select("doc_id", "n_bigrams").as[(Long, Long)].collect().toMap
    assert(got(1L) == 5L && got(5L) == 5L && got(6L) == 0L)
  }

  test("deterministic across repartitionings") {
    val a = NgramLm.crossEntropy(corpus, col("is_train"))
      .orderBy("doc_id").collect().toSeq
    val b = NgramLm.crossEntropy(corpus.repartition(5), col("is_train"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
