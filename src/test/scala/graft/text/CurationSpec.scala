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
