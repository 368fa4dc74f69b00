package graft.similarity

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-vecidx").toString + "/idx"

  // two tight direction groups (±x-ish and ±y-ish) so the 2-cell Lloyd
  // codebook separates them deterministically
  private val corpus = Seq(
    (1L, Array(1.0f, 0.05f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.95f, 0.0f, 0.1f)),
    (11L, Array(0.0f, 1.0f, 0.05f)),
    (12L, Array(0.1f, 0.9f, 0.0f)),
    (13L, Array(0.0f, 0.95f, 0.1f)))
    .toDF("vec_id", "embedding")

  test("build + knn: probing ONE cell of two answers from the query's " +
      "own direction group; exact over both groups agrees on top hits") {
    val dir = freshDir()
    VectorIndex.build(corpus, "vec_id", "embedding", nCells = 2,
      iters = 3, dir = dir)
    val got = VectorIndex.knn(spark, dir, "vec_id", queryId = 1L,
      k = 2, nProbe = 1).select("vec_id").as[Long].collect().toSet
    assert(got == Set(2L, 3L), s"got $got")
    val exact = VectorIndex.knnExact(spark, dir, "vec_id", 1L, k = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(exact == Set(2L, 3L))
  }

  test("appendIdempotent quantizes new vectors with the ORIGINAL " +
      "codebook (no refit) and a zombie replay is a no-op") {
    val dir = freshDir()
    VectorIndex.build(corpus, "vec_id", "embedding", nCells = 2,
      iters = 3, dir = dir)
    val batch = Seq((21L, Array(0.05f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    assert(VectorIndex.appendIdempotent(spark, batch, "vec_id",
      "embedding", dir, "ingest", 0L))
    val v = graft.ops.Versioned.latestVersion(dir)
    assert(!VectorIndex.appendIdempotent(spark, batch, "vec_id",
      "embedding", dir, "ingest", 0L), "replay must skip")
    assert(graft.ops.Versioned.latestVersion(dir) == v)
    // the appended y-direction vector is served from the y cell: a
    // 1-cell probe from 11 finds it ahead of nothing outside the group
    val got = VectorIndex.knn(spark, dir, "vec_id", queryId = 11L,
      k = 3, nProbe = 1).select("vec_id").as[Long].collect().toSet
    assert(got == Set(12L, 13L, 21L), s"got $got")
    // exactly once: the vector exists ONCE in the stored table
    assert(graft.ops.Versioned.read(spark, dir)
      .filter(col("kind") === "v" && col("vec_id") === 21L).count() == 1L)
  }

  test("knn frame is pinned to the index version at call time") {
    val dir = freshDir()
    VectorIndex.build(corpus, "vec_id", "embedding", nCells = 2,
      iters = 3, dir = dir)
    val before = VectorIndex.knn(spark, dir, "vec_id", 11L, k = 5,
      nProbe = 2)
    VectorIndex.appendIdempotent(spark,
      Seq((22L, Array(0.0f, 0.99f, 0.02f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, "ingest", 0L)
    assert(!before.select("vec_id").as[Long].collect().contains(22L),
      "a later append leaked into a pre-append frame")
  }
}
