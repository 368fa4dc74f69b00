package graft.similarity

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  test("drops within-cluster near-duplicates, keeps the lowest id") {
    // two tight clusters along the axes; within each, the higher-id
    // vector is a near-duplicate (cos ≈ 0.99) of the lower-id one
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0L),
      (2L, Array(0.99f, 0.14f), 0L),
      (3L, Array(0.0f, 1.0f), 1L),
      (4L, Array(0.1f, 0.99f), 1L))
      .toDF("vec_id", "embedding", "label")
    val got = Ann.semanticDedup(emb, "vec_id", "embedding", "label",
        minCosine = 0.9)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 2L, 1L, 1L), (1L, 2L, 1L, 1L)))
  }

  test("cross-cluster near-duplicates are NOT dropped (cluster-bounded by design)") {
    // identical vectors but labels force them into different clusters —
    // SemDeDup's pair space is within-cluster only, so neither drops
    val emb = Seq(
      (1L, Array(1.0f, 0.05f), 0L),
      (2L, Array(1.0f, 0.05f), 0L),
      (3L, Array(0.05f, 1.0f), 1L),
      (4L, Array(-1.0f, -0.05f), 2L),
      (5L, Array(-1.0f, -0.05f), 2L))
      .toDF("vec_id", "embedding", "label")
    val got = Ann.semanticDedup(emb, "vec_id", "embedding", "label",
        minCosine = 0.99)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // within cluster 0: ids 1,2 identical → drop 2; within cluster 2:
    // ids 4,5 identical → drop 5; id 3 alone in its cluster
    assert(got(0L) == ((2L, 1L, 1L)))
    assert(got(2L) == ((2L, 1L, 1L)))
    assert(got(1L) == ((1L, 0L, 1L)))
  }
}
