package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Range, tag: String) = n.map(i => s"$tag$i")

  test("a chunk repeated across docs survives only at its first " +
      "(doc_id, chunk_idx); docs reassemble in chunk order") {
    val boiler = (0 until 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (0L, (words(0 until 10, "x") :+ boiler).mkString(" ")
        .split(" ").mkString(" ")),
      (1L, boiler + " " + words(0 until 10, "y").mkString(" ")),
      (2L, boiler)) // entirely boilerplate -> fully dropped
      .toDF("doc_id", "text")
    val out = ChunkDedup.firstOccurrence(docs, "doc_id", "text", 10)
      .orderBy("doc_id").collect()
    // doc 0: 2 chunks, both kept (owns the first boiler occurrence)
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 2)
    // doc 1: boiler chunk at idx 0 deduped away, y-chunk kept
    assert(out(1).getLong(1) == 2 && out(1).getLong(2) == 1)
    // doc 2: nothing survives -> null fingerprint
    assert(out(2).getLong(1) == 1 && out(2).getLong(2) == 0
      && out(2).isNullAt(3))
  }

  test("duplicate-free corpus is untouched and fingerprints are " +
      "partitioning-invariant") {
    val docs = (0L until 40L)
      .map(i => (i, words(0 until 25, s"d${i}w").mkString(" ")))
      .toDF("doc_id", "text")
    val a = ChunkDedup.firstOccurrence(docs, "doc_id", "text", 10)
    assert(a.filter(col("n_kept") =!= col("n_chunks")).count() == 0)
    val b = ChunkDedup.firstOccurrence(
      docs.repartition(9), "doc_id", "text", 10)
    assert(a.orderBy("doc_id").collect().toSeq
      == b.orderBy("doc_id").collect().toSeq)
  }

  test("intra-doc repetition dedups to the earliest chunk_idx") {
    val ch = words(0 until 10, "r").mkString(" ")
    val docs = Seq((5L, s"$ch $ch $ch")).toDF("doc_id", "text")
    val out = ChunkDedup.firstOccurrence(docs, "doc_id", "text", 10)
      .head()
    assert(out.getLong(1) == 3 && out.getLong(2) == 1)
  }
}
