package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit pins for the round-13 retrieval ops: RRF fusion math and int8
  * quantization edges (the t47/emb22 oracles gate the bulk behavior). */
class HybridQuantizeSpec extends SparkSpec {

  import spark.implicits._

  test("rrf: doc in both lists gets both contributions; order and sources are right") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val b = Seq((2L, 1L), (9L, 2L)).toDF("doc_id", "rank")
    val got = Hybrid.rrf(Seq("a" -> a, "b" -> b), "doc_id", k0 = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    // doc 2: 1/62 + 1/61 — the only two-source doc, must rank first
    assert(got.head._1 == 2L && got.head._3 == 2L && got.head._4 == "a,b")
    val exp2 = BigDecimal(1.0 / 62).setScale(9, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(1.0 / 61).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(math.abs(got.head._2 - exp2.toDouble) < 1e-12)
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 9L, 3L)) // 1/61 > 1/62(b) > 1/63
  }

  test("rrf: ties in fused score break on doc id") {
    val a = Seq((5L, 1L), (3L, 1L)).toDF("doc_id", "rank") // identical ranks →
    val got = Hybrid.rrf(Seq("a" -> a.where(col("doc_id") === 5),
        "b" -> a.where(col("doc_id") === 3)), "doc_id", 60, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 5L))
  }

  test("int8: quantization clamps to ±127 and the max-|v| component hits 127") {
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f))).toDF("id", "v")
    val q = Quantize.int8(df, "v").select("qvec", "scale").collect().head
    val qv = q.getSeq[Int](0)
    assert(qv == Seq(64, -127, 32)) // scale = 1/127; 0.5*127=63.5 → floor(+0.5)=64
    assert(math.abs(q.getDouble(1) - 1.0 / 127) < 1e-15)
  }

  test("int8: zero vector quantizes to zeros (no div-by-zero)") {
    val df = Seq((1L, Array(0.0f, 0.0f))).toDF("id", "v")
    val qv = Quantize.int8(df, "v").select("qvec").collect().head.getSeq[Int](0)
    assert(qv == Seq(0, 0))
  }

  test("knnInt8: integer dot is exact and self is excluded") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),   // identical direction → q=(127,0), dot=16129
      (2L, Array(0.0f, 1.0f)),   // orthogonal → dot 0
      (3L, Array(-1.0f, 0.0f))). // opposite → dot -16129
      toDF("vec_id", "embedding")
    val got = Quantize.knnInt8(df, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 16129L), (2L, 0L), (3L, -16129L)))
  }
}
