package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("funnel is monotone and splits partition the final corpus") {
    val f = Curation.funnel(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    val chain = Seq("00_raw", "10_quality", "20_lang", "30_exact_dedup",
      "40_near_dup").map(f)
    assert(chain.zip(chain.tail).forall { case (a, b) => b <= a },
      s"funnel must shrink monotonically: $chain")
    assert(chain.head == docs.count())
    val splitTotal = f.collect { case (k, v) if k.startsWith("50_split_") => v }.sum
    assert(splitTotal == f("40_near_dup"),
      "split counts must partition the curated corpus")
  }

  test("curate output carries the survivors with deterministic splits") {
    val out = Curation.curate(docs, "doc_id", "text")
    val f = Curation.funnel(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(out.count() == f("40_near_dup"))
    assert(out.columns.contains("split"))
    // re-running assigns identical splits (pure hash, no RNG)
    val again = Curation.curate(docs, "doc_id", "text")
      .select("doc_id", "split")
    assert(out.select("doc_id", "split").except(again).isEmpty)
  }

  test("pipeline: packed corpus is contiguous, audited, and deterministic") {
    val out = Curation.pipeline(docs, "doc_id", "text").orderBy("doc_id")
      .collect()
    assert(out.nonEmpty)
    // packing invariant: offsets are the exclusive prefix sum in id order
    var expected = 0L
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("start_offset")) == expected, s"$r")
      expected += r.getLong(r.fieldIndex("n_tokens"))
    }
    // audit columns present and scored (selection stages actually ran)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_bigrams")) > 0)
      assert(!r.isNullAt(r.fieldIndex("weight_nano")))
      assert(!r.isNullAt(r.fieldIndex("nll_nano")))
    }
    // deterministic end to end (hash splits + rank selection, no RNG)
    val again = Curation.pipeline(docs, "doc_id", "text").orderBy("doc_id")
      .collect()
    assert(out.toSeq == again.toSeq)
  }

  test("pipeline: final plan reads materialized stage boundaries, not " +
      "a re-derived funnel (lineage truncated at each localCheckpoint)") {
    val out = Curation.pipeline(docs, "doc_id", "text")
    // every upstream stage ran eagerly at construction; the returned
    // frame's plan must bottom out in checkpointed RDD scans with ZERO
    // parquet re-scans — the no-re-derivation guarantee, and the reason
    // plan stringification stays O(stage) instead of exponential
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Relation") || !plan.contains("parquet"),
      s"final plan must not re-scan source parquet:\n$plan")
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      s"expected checkpointed scan leaves:\n$plan")
  }

  test("pipelineFunnel: nine monotone stages consistent with the packed output") {
    val f = Curation.pipelineFunnel(docs, "doc_id", "text")
      .as[(String, Long)].collect()
    assert(f.map(_._1).toSeq == Seq("00_raw", "10_quality", "20_lang",
      "30_exact_dedup", "40_near_dup", "50_train_split", "60_decontaminated",
      "70_dsir_selected", "80_perplexity_kept"))
    val counts = f.map(_._2).toSeq
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel must shrink monotonically: $counts")
    // the terminal stage is exactly the packed corpus
    assert(counts.last == Curation.pipeline(docs, "doc_id", "text").count())
  }

  private def topFractionIds(df: org.apache.spark.sql.DataFrame,
      desc: Boolean, num: Int, den: Int, parts: Int = 4): Set[Long] = {
    val m = Curation.getClass.getDeclaredMethods
      .find(_.getName == "topFraction").get
    m.setAccessible(true)
    m.invoke(Curation, df, col("score"), Boolean.box(desc), "doc_id",
        Int.box(num), Int.box(den), Int.box(parts))
      .asInstanceOf[org.apache.spark.sql.DataFrame]
      .select("doc_id").as[Long].collect().toSet
  }

  test("topFraction keeps ceil(n*num/den) rows by rank with id tie-break") {
    val df = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 20L), (5L, 5L))
      .toDF("doc_id", "score")
    // top ceil(5*1/2)=3 by score desc: 30(id2), 30(id3), 20(id4)
    assert(topFractionIds(df, desc = true, 1, 2) == Set(2L, 3L, 4L))
    // top ceil(5*2/3)=4 adds 10(id1)
    assert(topFractionIds(df, desc = true, 2, 3) == Set(1L, 2L, 3L, 4L))
  }

  test("topFraction distributed rank equals the single-partition window " +
      "and is invariant to the partition count") {
    // 257 rows with HEAVY score ties (score = id % 7): correctness rides
    // entirely on the (score, id) composite order crossing partition
    // boundaries; compare against the reference window formulation
    val df = spark.range(0, 257)
      .select(col("id").as("doc_id"), (col("id") % 7).as("score"))
    def reference(desc: Boolean, num: Int, den: Int): Set[Long] = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(
        (if (desc) col("score").desc else col("score").asc), col("doc_id"))
      df.withColumn("__rk", row_number().over(w))
        .filter(expr(s"__rk <= (257 * $num + ${den - 1}) DIV $den"))
        .select("doc_id").as[Long].collect().toSet
    }
    for (desc <- Seq(true, false); (num, den) <- Seq((1, 3), (9, 10));
         parts <- Seq(1, 5, 32)) {
      assert(topFractionIds(df, desc, num, den, parts) ==
        reference(desc, num, den),
        s"mismatch at desc=$desc $num/$den parts=$parts")
    }
  }

  test("topFraction plans no single-task global sort") {
    val df = spark.range(0, 1000)
      .select(col("id").as("doc_id"), (col("id") % 13).as("score"))
    val m = Curation.getClass.getDeclaredMethods
      .find(_.getName == "topFraction").get
    m.setAccessible(true)
    val out = m.invoke(Curation, df, col("score"), Boolean.box(true),
        "doc_id", Int.box(1), Int.box(2), Int.box(8))
      .asInstanceOf[org.apache.spark.sql.DataFrame]
    // the data-sized frame must never pass through a GLOBAL SortExec
    // (single task); range-partitioned local sorts are the design
    val globalSorts = out.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.isEmpty,
      s"found global sort(s): ${globalSorts.map(_.simpleStringWithNodeId())}")
    assert(out.count() == 500L)
  }

  test("near-dup stage drops a planted near-duplicate, keeps the original") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "the fox runs away to the forest where it is safe and sound today"
    val nearDup = base.replace("today", "tonight")
    val planted = Seq(
      (1L, base), (2L, nearDup),
      (3L, "the cat sat on the mat and the dog sat on the log while " +
        "it is raining outside and the fire is warm inside the house"))
      .toDF("doc_id", "text")
    val s = Curation.stages(planted, "doc_id", "text",
      Curation.Config(minQuality = 0.0))
    val kept = s.nearDup.select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(2L), s"kept=$kept")
    assert(kept.contains(3L))
  }
}
