package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plain = df.groupBy(col("o_custkey").as("k"))
      .agg(sum("o_totalprice").as("sum_v"), count(lit(1)).as("cnt"))
    val salted = Scale.saltedSumCount(df, col("o_custkey"), col("o_totalprice"), 8)
    // join and compare (double sums: same addend multiset, tolerance compare)
    val joined = plain.as("p").join(salted.as("s"), "k")
    assert(joined.filter(col("p.cnt") =!= col("s.cnt")).count() == 0)
    assert(joined.filter(abs(col("p.sum_v") - col("s.sum_v")) > 1e-6).count() == 0)
    assert(plain.count() == salted.count())
  }

  test("salted join equals plain join") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
    val salted = Scale.saltedJoin(orders, customer, "o_custkey", 4)
    assert(plain.count() == salted.count())
    assert(plain.select("o_orderkey", "c_name")
      .exceptAll(salted.select("o_orderkey", "c_name")).count() == 0)
  }

  test("bucketed tables join without an exchange on the join key") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    Scale.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Scale.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer",
      "o_custkey", 8)
    val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
    // disable broadcast so the join strategy is SMJ over buckets
    val plan = joined.queryExecution.executedPlan.toString
    assert(joined.count() == orders.count())
    // no shuffle exchange on the join key: bucketed SMJ reads co-located buckets
    val smjPart = plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
    assert(smjPart.isEmpty, s"unexpected shuffle in bucketed join plan:\n$plan")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
  }

  test("MLlib MinHashLSH finds the planted near-dup pair") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (2L, "the quick brown fox jumps over the lazy dog and runs away quickly"),
      (3L, "completely different words about distributed query engines here"))
      .toDF("doc_id", "text")
    val pairs = graft.dedup.MlLshDedup
      .approxJaccardPairs(docs, "doc_id", "text", n = 3,
        numHashTables = 8, maxDistance = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("IVF k-means ANN: probing all cells equals brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = graft.similarity.Ivf.build(emb, "vec_id", "embedding", nCells = 4)
    val ivfAll = graft.similarity.Ivf.knn(index, "vec_id", "embedding",
      queryId = 0L, k = 5, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    val brute = graft.similarity.Ann.knnBruteForce(emb, "vec_id", "embedding",
      queryId = 0L, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivfAll == brute) // full probe = exact
    // nProbe=1 trades recall for a 4x scan cut; results still rank correctly
    // within the probed cell
    val ivf1 = graft.similarity.Ivf.knn(index, "vec_id", "embedding",
      queryId = 0L, k = 5, nProbe = 1)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf1.nonEmpty)
  }

  test("IVF recall@10 improves monotonically with nProbe (fixed seed)") {
    // Synthetic embeddings are unclustered — the hardest case for a
    // coarse quantizer — so the bounds are intentionally loose; the
    // property under test is probe-budget monotonicity, not absolute
    // recall (measured at seed 42: p2≈0.38, p4≈0.60, p8≈0.80 mean).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = graft.similarity.Ivf.build(emb, "vec_id", "embedding", nCells = 16)
    val qids = Seq(1L, 5L, 9L, 13L, 17L)
    def meanRecall(nProbe: Int): Double = qids.map { qid =>
      val bf = graft.similarity.Ann.knnBruteForce(emb, "vec_id", "embedding", qid, 10)
        .select("vec_id").as[Long].collect().toSet
      val iv = graft.similarity.Ivf.knn(index, "vec_id", "embedding", qid, 10, nProbe)
        .select("vec_id").as[Long].collect().toSet
      bf.intersect(iv).size / 10.0
    }.sum / qids.size
    val (r2, r8) = (meanRecall(2), meanRecall(8))
    assert(r8 >= r2)
    assert(r8 >= 0.5)
  }

  test("IVF-ADC knn: full probe + exact refine reproduces brute force; " +
      "ADC order stays near exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = graft.similarity.Ivf.build(emb, "vec_id", "embedding", nCells = 4)
    val brute = graft.similarity.Ann.knnBruteForce(emb, "vec_id", "embedding",
        queryId = 0L, k = 10)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("score"))
    // all cells probed, generous refine window: the exact-refine stage must
    // fully absorb int8 quantization error (the emb15 all_cells_exact gate)
    val adc = graft.similarity.Ivf.adcKnn(index, "vec_id", "embedding",
        queryId = 0L, k = 10, nProbe = 4, rerank = 100)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score"),
        r.getAs[Double]("adc_score")))
    assert(adc.map(_._1).toSeq == brute.map(_._1).toSeq)
    adc.zip(brute).foreach { case ((_, refined, adcScore), (_, exact)) =>
      assert(math.abs(refined - exact) < 1e-12) // refine IS the exact cosine
      assert(math.abs(adcScore - exact) < 0.02) // int8 ADC error band
    }
    // narrow probe returns k rows ranked by refined score descending
    val adc1 = graft.similarity.Ivf.adcKnn(index, "vec_id", "embedding",
        queryId = 0L, k = 10, nProbe = 1, rerank = 40)
      .collect().map(_.getAs[Double]("score")).toSeq
    assert(adc1.nonEmpty && adc1 == adc1.sorted.reverse)
  }
}
