package graft.text

import graft.SparkSpec

/** Chunk-grammar edge cases for [[Chunking.slidingChunks]] (the t46 oracle
  * pins the bulk behavior; these pin the boundaries). */
class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  private def chunksOf(text: String, w: Int, s: Int): Seq[(Long, Long, Long, String)] =
    Chunking.slidingChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", w, s)
      .orderBy("chunk_idx")
      .collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))

  test("doc shorter than the window yields exactly one full-doc chunk") {
    assert(chunksOf("a b c", 10, 8) == Seq((0L, 0L, 3L, "a b c")))
  }

  test("empty and whitespace-only docs yield no chunks") {
    assert(chunksOf("", 10, 8).isEmpty)
    assert(chunksOf("   ", 10, 8).isEmpty)
  }

  test("stride walks starts 0,s,2s,… strictly below n; tail chunk is short") {
    val toks = (1 to 10).map(i => s"t$i").mkString(" ") // n=10
    val got = chunksOf(toks, 4, 3)
    assert(got.map(_._2) == Seq(0L, 3L, 6L, 9L)) // starts < 10
    assert(got.map(_._3) == Seq(4L, 4L, 4L, 1L)) // last chunk truncated
    assert(got.head._4 == "t1 t2 t3 t4")
    assert(got.last._4 == "t10")
  }

  test("consecutive chunks overlap by window - stride tokens") {
    val toks = (1 to 9).map(i => s"t$i").mkString(" ")
    val got = chunksOf(toks, 4, 2)
    val pairs = got.map(_._4.split(" ").toSeq)
    for (Seq(a, b) <- pairs.sliding(2).toSeq if b.length >= 2)
      assert(a.takeRight(2) == b.take(2), s"$a vs $b")
  }

  test("n exactly a multiple of stride does not emit an empty chunk at n") {
    val toks = (1 to 6).map(i => s"t$i").mkString(" ") // n=6, stride 3
    val got = chunksOf(toks, 4, 3)
    assert(got.map(_._2) == Seq(0L, 3L))
    assert(got.last._3 == 3L)
  }
}
