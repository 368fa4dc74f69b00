package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 2000L).toDF("id")

  test("split fractions land near their targets and cover every row") {
    val counts = ids
      .groupBy(Sampling.splitColumn(col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") - 1600L) < 100)
    assert(math.abs(counts("val") - 200L) < 60)
    assert(math.abs(counts("test") - 200L) < 60)
  }

  test("assignment is deterministic and partitioning-independent") {
    val a = ids.repartition(13)
      .select(col("id"), Sampling.splitColumn(col("id"),
        Seq("train" -> 0.9, "test" -> 0.1)).as("s"))
    val b = ids.repartition(3)
      .select(col("id"), Sampling.splitColumn(col("id"),
        Seq("train" -> 0.9, "test" -> 0.1)).as("s"))
    assert(a.exceptAll(b).count() == 0)
  }

  test("hash samples nest: 1% sample is a subset of the 10% sample") {
    val one = Sampling.hashSample(ids, "id", 0.01).select("id")
    val ten = Sampling.hashSample(ids, "id", 0.10).select("id")
    assert(one.exceptAll(ten).count() == 0)
    assert(one.count() < ten.count())
  }

  test("different seeds give different assignments") {
    val s1 = Sampling.hashSample(ids, "id", 0.5, seed = 1).select("id")
    val s2 = Sampling.hashSample(ids, "id", 0.5, seed = 2).select("id")
    assert(s1.exceptAll(s2).count() > 0)
  }

  test("bad fractions are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(lit(1L), Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("mixToTarget: binding stratum kept whole, others downsampled to k=⌊C·p⌋") {
    import spark.implicits._
    // 100 web, 50 books, 10 wiki; targets 0.5/0.3/0.2 → wiki binds:
    // C = 10/0.2 = 50 → k = 25/15/10
    val docs = ((1 to 100).map(i => (i.toLong, "web")) ++
      (101 to 150).map(i => (i.toLong, "books")) ++
      (151 to 160).map(i => (i.toLong, "wiki"))).toDF("doc_id", "stratum")
    val kept = Sampling.mixToTarget(docs, "stratum", "doc_id",
      Seq("web" -> 0.5, "books" -> 0.3, "wiki" -> 0.2))
    val byStratum = kept.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("wiki") == 10L) // binding stratum survives whole
    // hash thresholds hit ⌊C·p⌋ only in expectation; bounds are loose but
    // the determinism/exactness of the rule is pinned by the t23 oracle
    assert(byStratum("web") >= 15L && byStratum("web") <= 35L)
    assert(byStratum("books") >= 8L && byStratum("books") <= 22L)
    // deterministic: same call, same membership
    val again = Sampling.mixToTarget(docs, "stratum", "doc_id",
      Seq("web" -> 0.5, "books" -> 0.3, "wiki" -> 0.2))
    assert(kept.exceptAll(again).count() == 0)
  }

  test("mixToTarget: binding stratum survives floor's 1-ulp underflow") {
    import spark.implicits._
    // C = 1/0.09 = 11.11…; C·0.09 computes to 0.9999999999999999 in
    // doubles — without the epsilon guard floor drops the binding
    // stratum's only keep slot and 'a' vanishes from the mix
    val docs = ((1 to 1).map(i => (i.toLong, "a")) ++
      (2 to 21).map(i => (i.toLong, "b"))).toDF("doc_id", "stratum")
    val kept = Sampling.mixToTarget(docs, "stratum", "doc_id",
      Seq("a" -> 0.09, "b" -> 0.91))
    assert(kept.filter(col("stratum") === "a").count() == 1L)
  }

  test("mixToTarget rejects duplicate strata (a dup would double-join rows)") {
    import spark.implicits._
    val docs = Seq((1L, "web")).toDF("doc_id", "stratum")
    intercept[IllegalArgumentException] {
      Sampling.mixToTarget(docs, "stratum", "doc_id",
        Seq("web" -> 0.5, "web" -> 0.5))
    }
  }

  test("mixToTarget drops strata absent from the targets") {
    import spark.implicits._
    val docs = Seq((1L, "web"), (2L, "spam"), (3L, "web"))
      .toDF("doc_id", "stratum")
    val kept = Sampling.mixToTarget(docs, "stratum", "doc_id",
      Seq("web" -> 1.0))
    assert(kept.filter(col("stratum") === "spam").count() == 0)
    assert(kept.count() == 2)
  }

  test("temperatureSample boosts the low-resource stratum above its " +
      "natural share and pins exact quota counts") {
    import spark.implicits._
    // 900 'big' vs 100 'small': natural share 10%; √-weights give small
    // 10/(30+10) = 25% of the kept budget
    val docs = ((1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 1000).map(i => (i.toLong, "small"))).toDF("doc_id", "stratum")
    val kept = Sampling.temperatureSample(docs, "stratum", "doc_id",
      targetTotal = 200)
    val bySt = kept.groupBy("stratum").count().as[(String, Long)]
      .collect().toMap
    // w_big = 30, w_small = 10, W = 40 → quotas 150 and 50, exactly
    assert(bySt == Map("big" -> 150L, "small" -> 50L))
    val smallShare = bySt("small").toDouble / (bySt("big") + bySt("small"))
    assert(smallShare > 0.1 && smallShare < 0.5)
  }

  test("temperatureSample membership is rank-pinned: deterministic " +
      "across runs and repartitionings, and a quota can't exceed n") {
    import spark.implicits._
    val docs = ((1 to 50).map(i => (i.toLong, "a")) ++
      (51 to 54).map(i => (i.toLong, "b"))).toDF("doc_id", "stratum")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureSample(df, "stratum", "doc_id", targetTotal = 40)
        .select("doc_id").as[Long].collect().toSet
    val a = ids(docs)
    val b = ids(docs.repartition(7))
    assert(a == b)
    // stratum b has only 4 rows; its quota is capped at 4
    assert(a.count(_ > 50) <= 4)
  }

  test("weightedSample: heavier rows dominate, membership is deterministic " +
      "across repartitionings, k >= n keeps everything") {
    import spark.implicits._
    // ids 1..20 weight 1000, ids 21..200 weight 1 — the heavy ids should
    // crowd the top of a k=25 sample (A-Res: P(win) ∝ weight)
    val docs = ((1L to 20L).map(i => (i, 1000L)) ++
      (21L to 200L).map(i => (i, 1L))).toDF("doc_id", "w")
    def sample(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(df, "doc_id", col("w"), k = 25)
        .select("doc_id").as[Long].collect().toSet
    val got = sample(docs)
    assert(got.size == 25)
    assert((1L to 20L).toSet.subsetOf(got),
      s"heavy rows must all survive a k=25 draw: $got")
    assert(sample(docs.repartition(9)) == got)
    val all = Sampling.weightedSample(docs, "doc_id", col("w"), k = 500)
    assert(all.count() == 200)
    // weight must be recorded verbatim
    assert(all.filter(col("doc_id") === 1L).select("weight")
      .as[Long].head() == 1000L)
  }
}
