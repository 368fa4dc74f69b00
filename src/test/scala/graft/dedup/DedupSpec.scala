package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),    // exact dup of 1
    (3L, "THE  QUICK  BROWN fox jumps over the lazy dog"),  // normalized dup of 1
    (4L, "the quick brown fox jumps over the sleepy dog"),  // near dup (1 word)
    (5L, "completely different content about spark engines entirely"))
    .toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, keeper = min id") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    assert(groups.count() == 3) // {1,2,3}, {4}, {5}
    val g = groups.filter(col("n_docs") === 3).collect()(0)
    assert(g.getAs[Long]("keeper") == 1L)
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 4L, 5L))
  }

  test("null-text rows pass through dedup untouched (absent != duplicate)") {
    val withNulls = docs.select(col("doc_id"), col("text"))
      .unionByName(Seq((10L, null.asInstanceOf[String]),
        (11L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    // null texts are excluded from grouping, not collapsed to one keeper
    assert(Dedup.exactGroups(withNulls, "doc_id", "text").count() == 3)
    val kept = Dedup.exactDedup(withNulls, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L, 10L, 11L))
  }

  test("df-capped jaccard is the jaccard of the FILTERED sets") {
    // two identical docs sharing a shingle that exceeds the df cap:
    // with sizes from the unfiltered sets the pair would score < 1.0
    val common = "x y z" // appears in every doc -> df 4 > cap 3
    val d = Seq(
      (1L, s"$common a b c d e"), (2L, s"$common a b c d e"),
      (3L, s"$common p q r s t"), (4L, s"$common u v w j k"))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(d, "doc_id", "text", n = 3,
      minJaccard = 0.9, maxShingleDf = 3L)
      .select("id1", "id2", "jaccard").collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(pairs(0).getDouble(2) == 1.0)
  }

  test("word shingles: size-n sliding window, distinct per doc") {
    val sh = Dedup.wordShingles(docs.filter(col("doc_id") === 1), "doc_id", "text", 3)
    // 9 tokens -> 7 trigrams, all distinct here
    assert(sh.count() == 7)
    assert(sh.filter(col("shingle") === "the quick brown").count() == 1)
  }

  test("jaccard pairs find the near-dup and skip unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
        r.getAs[Double]("jaccard"))).toSeq
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 2L))) // identical => jaccard 1.0
    assert(ids.contains((1L, 4L)) || ids.contains((2L, 4L))) // near dup
    assert(!ids.exists(p => p._1 == 5L || p._2 == 5L)) // unrelated
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 == 1.0)
  }

  test("minhash LSH: estimated jaccard 1.0 for identical docs, candidates ⊆ pairs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, k = 12, rowsPerBand = 3, minEstJaccard = 0.25)
      .collect().map(r => ((r.getAs[Long]("id1"), r.getAs[Long]("id2")),
        r.getAs[Double]("est_jaccard"))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("simhash: identical docs equal, near-dups close, unrelated far") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(4L)) < ham(sh(1L), sh(5L)))
    // all values fit in 60 bits (engine-portable positive bigint)
    assert(sh.values.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("LSH-then-exact composition finds the planted near-dups with true jaccard") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .collect().map(r => ((r.getAs[Long]("id1"), r.getAs[Long]("id2")),
        r.getAs[Double]("jaccard"))).toMap
    val composed = Dedup.lshThenExactPairs(docs, "doc_id", "text",
      n = 3, k = 12, rowsPerBand = 3, minJaccard = 0.3)
      .collect().map(r => ((r.getAs[Long]("id1"), r.getAs[Long]("id2")),
        r.getAs[Double]("jaccard"))).toMap
    // precision: every composed pair appears in exact with the same jaccard
    composed.foreach { case (pair, j) =>
      assert(exact.contains(pair) && math.abs(exact(pair) - j) < 1e-9)
    }
    // recall on the planted identical pair is guaranteed (est jaccard 1.0)
    assert(composed.contains((1L, 2L)))
  }

  test("incremental dedup: drops corpus-known digests, keeps min-id within batch") {
    import spark.implicits._
    val seen = Seq((100L, "the quick brown fox"), (101L, "historic text"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "THE  QUICK   brown fox"), // normalizes to a seen digest → dropped
      (2L, "brand new text"),
      (3L, "brand  NEW text"),        // in-batch dup of 2 → dropped (min id kept)
      (4L, null.asInstanceOf[String])) // null text passes through
      .toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstCorpus(batch, seen, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
  }

  test("jaccardPairs auto-prune path emits the same rows as the all-pairs path") {
    def rows(threshold: Long) =
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3,
        lshPruneThreshold = threshold)
        .collect().map(r => ((r.getAs[Long]("id1"), r.getAs[Long]("id2")),
          (r.getAs[Long]("inter"), r.getAs[Long]("sz1"), r.getAs[Long]("sz2"),
            r.getAs[Double]("jaccard")))).toMap
    val exact = rows(Long.MaxValue)
    val pruned = rows(0L) // force the banded-candidate strategy
    // precision contract: every pruned pair is an exact pair with the SAME
    // df-capped inter/sz/jaccard values (recall at moderate jaccard is the
    // probabilistic banding capture — the fixture's 0.4–0.56 pairs may be
    // missed by design; the J=1.0 planted pair is guaranteed)
    pruned.foreach { case (pair, vals) =>
      assert(exact.get(pair).contains(vals), s"pair $pair values differ")
    }
    assert(pruned.contains((1L, 2L)))
  }

  test("fused SimHash aggregate is bit-identical to the Column formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(7) // partial vote buffers must merge across partitions
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    val fused = keyed(Dedup.simhash(docs, "doc_id", "text"))
    val columns = keyed(Dedup.simhashColumns(docs, "doc_id", "text"))
    assert(fused == columns)
    assert(fused.nonEmpty)
  }

  test("fused MinHash aggregate is bit-identical to the relational formulation") {
    // the custom TypedImperativeAggregate must reproduce the posexplode/
    // groupBy signatures exactly — same md5 scheme, same 60-bit parse —
    // on real corpus text (covers multi-partition partial aggregation)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(7) // force partial buffers to merge across partitions
    val sh = Dedup.wordShingles(docs, "doc_id", "text", 3)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("j")) -> r.getAs[Long]("mh"))
      .toMap
    val fused = keyed(Dedup.signaturesFromShingles(sh, "doc_id", 12))
    val relational = keyed(Dedup.signaturesFromShinglesRelational(sh, "doc_id", 12))
    assert(fused == relational)
    assert(fused.nonEmpty)
  }

  test("dedupAgainstDigests: the slim fingerprint-table path matches the text path") {
    import spark.implicits._
    val seen = Seq((100L, "the quick brown fox"), (101L, "historic text"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "THE  QUICK   brown fox"),
      (2L, "brand new text"),
      (3L, "brand  NEW text"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val digests = seen
      .select(graft.text.TextFunctions.fingerprint(col("text")).as("digest"))
    val viaDigests = Dedup.dedupAgainstDigests(batch, "doc_id", "text", digests)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaText = Dedup.dedupAgainstCorpus(batch, seen, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaDigests == viaText && viaDigests == Set(2L, 4L))
  }

  test("containment catches a sub-document Jaccard misses") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon zeta"
    val long = ("one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty " +
      quote) // short doc quoted whole at the end of a long one
    val dd = Seq((1L, quote), (2L, long)).toDF("doc_id", "text")
    // jaccard is small (union dominated by the long doc)…
    assert(Dedup.jaccardPairs(dd, "doc_id", "text", 3, 0.5).count() == 0)
    // …but containment of the quote in the long doc is 1.0
    val c = Dedup.containmentPairs(dd, "doc_id", "text", 3, 0.9).collect()
    assert(c.length == 1)
    assert(c.head.getAs[Double]("c1_in_2") == 1.0)
    assert(c.head.getAs[Double]("c2_in_1") < 0.5)
  }

  test("containment prefix-filter path is LOSSLESS: identical output to exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // prefixPruneThreshold = 0 forces the prefix path; MaxValue pins exact.
    // The prefix filter is provably lossless, so FULL equality — pairs AND
    // every verified value — must hold at several thresholds (the prefix
    // length depends on c, so each threshold exercises a different bound).
    for (c <- Seq(0.5, 0.6, 0.9)) {
      val exact = Dedup.containmentPairs(docs, "doc_id", "text", 3, c,
          prefixPruneThreshold = Long.MaxValue)
        .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
          (r.getAs[Long]("inter"), r.getAs[Double]("c1_in_2"),
            r.getAs[Double]("c2_in_1"))).toMap
      val prefix = Dedup.containmentPairs(docs, "doc_id", "text", 3, c,
          prefixPruneThreshold = 0L, docCount = Some(500L))
        .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
          (r.getAs[Long]("inter"), r.getAs[Double]("c1_in_2"),
            r.getAs[Double]("c2_in_1"))).toMap
      assert(prefix == exact, s"prefix path diverged at c=$c")
      assert(exact.nonEmpty || c > 0.8)
    }
  }

  test("cross-corpus pairs form only across sides and carry true jaccard") {
    import spark.implicits._
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),   // dup of corpus 1
      (102L, "totally novel content never seen before anywhere"),
      (103L, "the quick brown fox jumps over the lazy dog"))   // intra-batch dup of 101
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),     // intra-corpus dup of 1
      (3L, "unrelated corpus material about distributed joins"))
      .toDF("doc_id", "text")
    val pairs = Dedup.crossCorpusPairs(batch, corpus, "doc_id", "text",
      n = 3, k = 12, rowsPerBand = 3, minJaccard = 0.5)
      .collect().map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id")) ->
        r.getAs[Double]("jaccard")).toMap
    // both identical batch docs hit both identical corpus docs; the
    // intra-batch (101,103) and intra-corpus (1,2) pairs never appear
    assert(pairs.keySet == Set((101L, 1L), (101L, 2L), (103L, 1L), (103L, 2L)))
    assert(pairs.values.forall(_ == 1.0))
  }
}
