package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val train = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "one two three four five six"))
    .toDF("doc_id", "text")

  test("fully-leaked doc scores 1.0, disjoint doc 0.0, partial in between") {
    val heldout = Seq(
      (10L, "alpha beta gamma delta"),         // both shingles in train
      (11L, "nothing here overlaps at all"),   // zero overlap
      (12L, "zzz yyy one two three"))          // 1 of 3 shingles in train
      .toDF("doc_id", "text")
    val report = Contamination.ngramOverlap(heldout, train, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("contamination"))).toMap
    assert(report(10L) == ((2L, 2L, 1.0)))
    assert(report(11L) == ((3L, 0L, 0.0)))
    assert(report(12L) == ((3L, 1L, 0.333333)))
  }

  test("docs with fewer than n tokens have no shingles and are absent") {
    val heldout = Seq((20L, "too short"), (21L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val ids = Contamination.ngramOverlap(heldout, train, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(21L))
  }

  test("contaminatedIds applies the threshold") {
    val heldout = Seq(
      (10L, "alpha beta gamma delta"),
      (12L, "zzz yyy one two three"))
      .toDF("doc_id", "text")
    val dropped = Contamination
      .contaminatedIds(heldout, train, "doc_id", "text", n = 3, threshold = 0.8)
      .as[Long].collect().toSet
    assert(dropped == Set(10L))
  }
}
