package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("termFrequencies counts occurrences per (carry, id, term)") {
    val docs = Seq((1L, "en", "a b a"), (2L, "en", "b b")).toDF("doc_id", "lang", "text")
    val tf = Corpus.termFrequencies(docs, "doc_id", "text", carry = Seq("lang"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        r.getAs[Long]("tf")).toMap
    assert(tf((1L, "a")) == 2L && tf((1L, "b")) == 1L && tf((2L, "b")) == 2L)
  }

  test("tfidfTopTerms: corpus-wide df, smoothed idf, exact decimal sums") {
    // 3 docs; "common" in all (df=3, idf=ln(4/4)+1=1), "rare" in one (idf=ln(2)+1)
    val docs = Seq(
      (1L, "g1", "common rare"),
      (2L, "g1", "common"),
      (3L, "g2", "common"))
      .toDF("doc_id", "grp", "text")
    val top = Corpus.tfidfTopTerms(docs, "doc_id", "text", "grp", k = 5)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[String]("term")) ->
        (r.getAs[Long]("term_rank"), r.getAs[Double]("tfidf"), r.getAs[Long]("df"))).toMap
    // common in g1: tf 2 * idf 1.0 = 2.0 -> rank 1;
    // rare: tf 1 * idf (ln(4/2)+1 = 1.693147) -> rank 2
    val idfRare = math.round((math.log(4.0 / 2.0) + 1.0) * 1e6) / 1e6
    assert(top(("g1", "common"))._1 == 1L && top(("g1", "common"))._2 == 2.0)
    assert(top(("g1", "rare")) == ((2L, idfRare, 1L)))
    assert(top(("g2", "common")) == ((1L, 1.0, 3L)))
  }

  test("tfidfTopTerms keeps only k terms per group, ties broken by term") {
    val docs = Seq((1L, "g", "a b c d e f")).toDF("doc_id", "grp", "text")
    val top = Corpus.tfidfTopTerms(docs, "doc_id", "text", "grp", k = 3)
      .orderBy("term_rank").collect()
    assert(top.length == 3)
    // all terms tie on tf*idf -> alphabetical order
    assert(top.map(_.getAs[String]("term")).toSeq == Seq("a", "b", "c"))
  }

  test("splitDrift computes exact OOV rates against the train vocabulary") {
    val docs = Seq(
      (1L, "alpha beta gamma"),   // train
      (2L, "alpha beta"),         // train
      (3L, "alpha novel1 novel1 novel2"))  // test: 4 tokens, 2 oov terms, 3 oov tokens
      .toDF("doc_id", "text")
    val split = when(col("doc_id") <= 2, "train").otherwise("test")
    val drift = Corpus.splitDrift(docs, "text", split).collect()
    assert(drift.length == 1)
    val r = drift(0)
    assert(r.getAs[String]("split") == "test")
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("n_terms") == 3L)
    assert(r.getAs[Long]("n_oov_terms") == 2L)
    assert(r.getAs[Long]("n_oov_tokens") == 3L)
    assert(r.getAs[Double]("oov_term_rate") == 0.666667)
    assert(r.getAs[Double]("oov_token_rate") == 0.75)
  }

  test("charEntropy: 0 for single-char runs, ln(k) for uniform distributions") {
    val docs = Seq(
      (1L, "aaaaaaaa"),           // degenerate: one symbol, entropy 0
      (2L, "abababab"),           // uniform over 2 → ln 2
      (3L, "abcd"))               // uniform over 4 → ln 4
      .toDF("doc_id", "text")
    val out = Corpus.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chars"), r.getAs[Long]("n_distinct_chars"),
          r.getAs[Double]("entropy")))).toMap
    assert(out(1L) == ((8L, 1L, 0.0)))
    assert(out(2L)._3 == math.rint(math.log(2) * 1e6) / 1e6) // 0.693147
    assert(out(3L)._1 == 4L && out(3L)._2 == 4L)
    assert(math.abs(out(3L)._3 - math.log(4)) < 1e-5)
    // low-entropy junk scores strictly below varied text
    assert(out(1L)._3 < out(2L)._3 && out(2L)._3 < out(3L)._3)
  }

  test("fused graft_char_entropy is bit-identical to the relational form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rel = Corpus.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chars"), r.getAs[Long]("n_distinct_chars"),
          r.getAs[Double]("entropy")))).toMap
    val fused = Corpus.charEntropyFused(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chars"), r.getAs[Long]("n_distinct_chars"),
          r.getAs[Double]("entropy")))).toMap
    assert(fused == rel) // exact, including every rounded entropy double
    // degenerate inputs: relational emits no row; fused filters to match
    val edge = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "ab"))
      .toDF("doc_id", "text")
    val fusedEdge = Corpus.charEntropyFused(edge, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(fusedEdge == Set(3L))
    // non-ASCII spill path: multi-byte code points count once each
    val uni = Seq((1L, "éé日")).toDF("doc_id", "text")
    val r = Corpus.charEntropyFused(uni, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_chars") == 3L && r.getAs[Long]("n_distinct_chars") == 2L)
  }

  test("boilerplateRatio flags cross-document common shingles, not unique content") {
    // docs 1-3 share the planted template "copyright footer text legal";
    // doc 4 is entirely unique → ratio 0 (and survives the left join)
    val docs = Seq(
      (1L, "alpha beta gamma copyright footer text legal"),
      (2L, "delta epsilon zeta copyright footer text legal"),
      (3L, "eta theta iota copyright footer text legal"),
      (4L, "unique words only nothing shared here at all"))
      .toDF("doc_id", "text")
    val out = Corpus.boilerplateRatio(docs, "doc_id", "text", n = 3, minDf = 3L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_boiler"),
          r.getAs[Double]("boilerplate_ratio")))).toMap
    // 7 tokens → 5 distinct 3-gram shingles per doc; exactly the two
    // shingles fully inside the 4-token template reach df = 3
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id) == ((5L, 2L, 0.4)), s"doc $id: ${out(id)}")
    }
    assert(out(4L) == ((6L, 0L, 0.0)))
  }

  test("bpeMergeCandidates: frequency-weighted pair counts, greedy order") {
    // "abab" ×3 occurrences, "ab" ×2, "cd" ×1, "x" contributes nothing
    val docs = Seq(
      (1L, "abab ab x"),
      (2L, "abab ab cd"),
      (3L, "abab")).toDF("doc_id", "text")
    val got = Corpus.bpeMergeCandidates(docs, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // abab: ab,ba,ab → ab twice + ba once, ×3 words; ab word: ab ×2
    val expected = Map("ab" -> 8L, "ba" -> 3L, "cd" -> 1L)
    assert(got.toMap == expected, s"got ${got.toSeq}")
    // greedy merge order: count desc, pair asc
    assert(got.map(_._1).toSeq == Seq("ab", "ba", "cd"))
  }

  test("bpeMergeCandidates: deterministic top-k boundary on count ties") {
    val docs = Seq((1L, "xy zw xy zw")).toDF("doc_id", "text")
    val got = Corpus.bpeMergeCandidates(docs, "text", k = 1).collect()
    assert(got.length == 1 && got(0).getString(0) == "xy" &&
      got(0).getLong(1) == 2L, s"tie must cut by pair asc: ${got.toSeq}")
  }

  test("bm25 ranks term-dense short docs first and skips non-matching docs") {
    val docs = Seq(
      (1L, "spark spark stream"),
      (2L, "spark filler filler filler filler filler filler filler"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val got = Corpus.bm25TopDocs(docs, "doc_id", "text",
        terms = Seq("spark", "stream"), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("bm25"), r.getAs[Long]("n_terms_hit"))).toMap
    assert(got.keySet == Set(1L, 2L), s"got $got")       // doc 3 never scores
    assert(got(1L)._2 == 2L && got(2L)._2 == 1L)         // terms hit
    assert(got(1L)._1 > got(2L)._1)                      // tf + length norm
    assert(got.values.forall(_._1 > 0.0))
  }
}
