package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage/serving compression an
  * embedding store runs at scale (4× smaller than float32, integer dot
  * products): per-vector symmetric quantization
  *
  *   scale = max_i |v_i| / 127        q_i = clamp(round(v_i / scale), ±127)
  *
  * and approximate similarity  v·w ≈ (q_v · q_w) · scale_v · scale_w.
  * (The per-vector-scale scheme FAISS calls SQ8 / "scalar quantizer";
  * Jégou et al.'s PQ — emb17/emb20 — is the codebook alternative.)
  *
  * Determinism discipline: rounding is floor(x + 0.5) SPELLED OUT (not the
  * engine's round(), whose half-way tie rule differs across engines), the
  * integer dot is an exact BIGINT surface under the oracle hash, and the
  * dequantized score is one fixed-shape double product.
  *
  * 100 TB shape: quantization is pure narrow per-row column work (one
  * transform + one array_max, codegen'd, no shuffle); the int dot scan is
  * the brute-force baseline — compose with the IVF/LSH front-ends
  * (emb6/emb15/emb20) to bound the candidate set, then score candidates on
  * int8 codes.
  */
object Quantize {

  private val Eps = 1e-30 // zero-vector guard, mirrored in the oracle SQL

  /** Add (`qvec` array<int>, `scale` double) for `vecCol`. */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.withColumn("scale",
        greatest(array_max(transform(v, x => abs(x))) / lit(127.0), lit(Eps)))
      .withColumn("qvec",
        transform(v, x =>
          least(greatest(floor(x / col("scale") + lit(0.5)), lit(-127L)),
            lit(127L)).cast("int")))
  }

  /** Exact top-k by DEQUANTIZED int8 similarity against `queryId`'s vector:
    * one broadcast of the quantized query row, one integer-dot scan.
    * Returns (idCol, score_int, approx). */
  def knnInt8(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q8 = int8(emb, vecCol)
    val q = q8.filter(col(idCol) === queryId)
      .select(col("qvec").as("__q0"), col("scale").as("__s0"))
    q8.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("score_int",
        aggregate(zip_with(col("qvec"), col("__q0"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .withColumn("__ss", col("scale") * col("__s0"))
      .withColumn("approx", col("score_int").cast("double") * col("__ss"))
      .orderBy(col("approx").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score_int"), col("approx"))
  }
}
