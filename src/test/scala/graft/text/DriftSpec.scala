package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical slices → exactly zero drift (all log-ratios vanish)") {
    val docs = Seq((1L, "alpha beta gamma", true),
      (2L, "alpha beta gamma", false)).toDF("doc_id", "text", "ref")
    val r = Drift.bucketDrift(docs, col("ref")).head()
    assert(r.getAs[Long]("n_ref_tokens") == 3L)
    assert(r.getAs[Long]("n_new_tokens") == 3L)
    assert(r.getAs[Long]("kl_new_ref_nano") == 0L)
    assert(r.getAs[Long]("kl_ref_new_nano") == 0L)
    assert(r.getAs[Double]("kl_new_ref") == 0.0)
  }

  test("a diverged slice drifts more than a near-identical one, and " +
      "KL is non-negative") {
    val ref = (1 to 40).map(i => (i.toLong, "the quick brown fox jumps", true))
    val near = (41 to 60).map(i => (i.toLong, "the quick brown fox rests", false))
    val far = (41 to 60).map(i => (i.toLong, "zzz qqq www vvv kkk", false))
    def kl(rows: Seq[(Long, String, Boolean)]): Double =
      Drift.bucketDrift(rows.toDF("doc_id", "text", "ref"), col("ref"))
        .head().getAs[Double]("kl_new_ref")
    val kNear = kl(ref ++ near)
    val kFar = kl(ref ++ far)
    assert(kNear >= 0.0 && kFar >= 0.0)
    assert(kFar > kNear, s"far=$kFar near=$kNear")
  }

  test("deterministic across partitionings") {
    val rows = (1 to 200).map(i =>
      (i.toLong, s"tok${i % 17} tok${i % 5} filler", i % 3 != 0))
    val df = rows.toDF("doc_id", "text", "ref")
    val a = Drift.bucketDrift(df, col("ref")).head()
    val b = Drift.bucketDrift(df.repartition(13), col("ref")).head()
    assert(a == b)
  }
}
