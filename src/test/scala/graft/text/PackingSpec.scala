package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("distributed prefix sum equals the single-partition window result") {
    val df = (1L to 257L).map(i => (i, i % 7 + 1)).toDF("id", "n")
    val got = Packing.withStartOffsets(df, "id", "n", parts = 8)
      .select("id", "start_offset").as[(Long, Long)].collect().toMap
    var acc = 0L
    (1L to 257L).foreach { i =>
      assert(got(i) == acc, s"offset of $i")
      acc += i % 7 + 1
    }
  }

  test("prefix sum is invariant to the partition count") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "n")
    val a = Packing.withStartOffsets(df, "id", "n", parts = 1)
      .select("id", "start_offset").as[(Long, Long)].collect().toSet
    val b = Packing.withStartOffsets(df, "id", "n", parts = 13)
      .select("id", "start_offset").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("packing plan marks exactly the documents straddling a cut") {
    // three docs of 1000 tokens each, seqLen 1024: doc 2 spans the first
    // cut (offsets 1000..1999), doc 3 spans the second (2000..2999)? no —
    // 2048..2999 crosses cut at 2048 only if it starts before it; doc 3
    // starts at 2000 < 2048 and ends at 2999 > 2048 → crosses.
    val docs = Seq(
      (1L, Seq.fill(1000)("tok").mkString(" ")),
      (2L, Seq.fill(1000)("tok").mkString(" ")),
      (3L, Seq.fill(1000)("tok").mkString(" "))).toDF("doc_id", "text")
    val plan = Packing.packingPlan(docs, "doc_id", "text", seqLen = 1024L)
      .select("doc_id", "start_offset", "first_seq", "last_seq", "crosses_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(plan(0) == ((1L, 0L, 0L, 0L, false)))
    assert(plan(1) == ((2L, 1000L, 0L, 1L, true)))
    assert(plan(2) == ((3L, 2000L, 1L, 2L, true)))
  }
}
