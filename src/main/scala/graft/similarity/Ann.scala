package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ArrayDotProduct

/** Similarity search over embedding columns (`Array[Float]`): brute-force
  * cosine top-k as the exact baseline and an LSH-bucketed variant as the
  * scale path.
  *
  * The inner product is the native codegen'd [[graft.functions
  * .ArrayDotProduct]] expression (`graft_dot`) — Spark's higher-order
  * `zip_with`/`aggregate` lambdas run interpreted and were the bench
  * bottleneck. Division order `dot / norm(a) / norm(b)` is kept identical
  * to the DuckDB oracle formula, and the dot accumulates sequentially in
  * double, so results stay bit-identical across engines.
  *
  * 100 TB notes: brute force is a broadcast of the query vector + one scan
  * (fine per query, linear). The LSH path buckets vectors by
  * random-hyperplane signs once (shuffle on bucket id), then probes only
  * matching buckets — the standard sub-linear ANN layout. An IVF layout
  * (k-means coarse quantizer) would swap the plane-sign bucketer for
  * learned centroids; the probe/join shape is identical. Norms are
  * precomputed per row, never per pair.
  */
object Ann {

  /** Codegen'd sequential-fold dot product (registers `graft_dot`). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Reference fold-based dot (interpreted; kept for equivalence tests). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / norm(a) / norm(b)

  /** Cosine with precomputed norms and a zero-norm guard: a zero vector
    * (failed encoder output — they exist in real corpora) has no
    * direction, so its similarity to anything is defined as 0 rather
    * than a DIVIDE_BY_ZERO error (ANSI mode) or NaN. The `when` guards
    * the division itself — the branch is only evaluated when both norms
    * are positive. Surfaced by the 2× scale rehearsal, whose negated
    * embedding copies make every label centroid exactly zero. */
  private[similarity] def cosineOrZero(d: Column, n1: Column, n2: Column): Column =
    when(n1 > 0.0 && n2 > 0.0, d / n1 / n2).otherwise(lit(0.0))

  private def withRegistry(df: DataFrame): DataFrame = {
    ArrayDotProduct.register(df.sparkSession)
    graft.functions.HyperplaneBucket.register(df.sparkSession)
    df
  }

  /** Exact top-k by cosine against the embedding of `queryId`.
    * The single query row (with precomputed norm) is broadcast; the corpus
    * is scanned once with one dot + one cached norm per row — no shuffle. */
  def knnBruteForce(emb0: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val emb = withRegistry(emb0)
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"), norm(col(vecCol)).as("__qnorm"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        cosineOrZero(dot(col(vecCol), col("__qvec")), norm(col(vecCol)),
          col("__qnorm")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic integer-weight "random" hyperplane: weight of plane p at
    * dimension d is ((p*131 + d*37) mod 7) − 3 ∈ [−3, 3]. Integer weights
    * make the float·int products exact in double, so the sign of the dot
    * product — hence the bucket — is engine-portable. */
  def planeWeight(p: Int, d: Int): Double = ((p * 131 + d * 37) % 7 - 3).toDouble

  /** Johnson–Lindenstrauss-style random projection: the `dims` plane
    * dot-products BEFORE the sign — a deterministic dimensionality
    * reduction (64 → `dims` components) that approximately preserves
    * pairwise distances, the standard shrink-then-search preprocessing
    * for ANN at corpus scale. Same integer [[planeWeight]] scheme as the
    * LSH bucket, so the components are engine-portable exactly like the
    * emb3 bucket proof. Per-vector cost is dims×maxDims codegen'd
    * multiply-adds (`graft_dot`), no shuffle, no data-sized explode. */
  def randomProjection(vec: Column, dims: Int, maxDims: Int = 64): Seq[Column] = {
    val v = vec.cast("array<double>")
    (0 until dims).map { p =>
      val weights = typedlit((0 until maxDims).map(d => planeWeight(p, d)))
      dot(v, weights)
    }
  }

  /** Shrink-then-search near-dup pairs — [[randomProjection]] composed
    * into a working pipeline: candidate pairs are generated on the short
    * `dims`-component projections (dims multiply-adds per pair instead
    * of 64, and only ids + short vectors flow through the pair join),
    * then ONLY the survivors rejoin the full vectors for the exact
    * cosine rerank. The projections are deterministic, so the prefilter
    * is engine-replayable and the composed result stays hash-checkable;
    * recall vs the unfiltered scan is governed by `minProjCosine`
    * (set it ≤ −1 to disable pruning — then output ≡ the exact scan,
    * AnnSpec pins this). */
  def projectedNearDupPairs(emb0: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, dims: Int = 8,
      minProjCosine: Double = 0.0, bucketed: Boolean = false,
      planes: Int = 8): DataFrame = {
    val emb = withRegistry(emb0)
    val proj = emb.select(col(idCol).as("__id"),
      array(randomProjection(col(vecCol), dims): _*).as("__proj"),
      col(vecCol).as("__vec"))
    // candidate enumeration: all-pairs (exact recall, O(n²) — fine while
    // the cheap 8-dim prefilter dominates) or hyperplane-bucketed (the
    // emb5 composition — pairs exist only inside sign buckets, the
    // O(n²) space never materializes; recall traded per bucket split)
    val pairSource =
      if (!bucketed) {
        val pa = proj.select(col("__id").as("id1"), col("__proj").as("p1"))
        val pb = proj.select(col("__id").as("id2"), col("__proj").as("p2"))
        pa.crossJoin(pb)
      } else {
        val b = proj.withColumn("__bucket", hyperplaneBucket(col("__vec"), planes))
        b.select(col("__id").as("id1"), col("__proj").as("p1"), col("__bucket"))
          .join(b.select(col("__id").as("id2"), col("__proj").as("p2"),
            col("__bucket")), Seq("__bucket"))
      }
    val cands = pairSource.filter(col("id1") < col("id2"))
      .filter(cosineOrZero(dot(col("p1"), col("p2")),
        norm(col("p1")), norm(col("p2"))) >= minProjCosine)
      .select("id1", "id2")
    val full1 = emb.select(col(idCol).as("id1"), col(vecCol).as("v1"),
      norm(col(vecCol)).as("n1"))
    val full2 = emb.select(col(idCol).as("id2"), col(vecCol).as("v2"),
      norm(col(vecCol)).as("n2"))
    cands.join(full1, "id1").join(full2, "id2")
      .select(col("id1"), col("id2"),
        cosineOrZero(dot(col("v1"), col("v2")), col("n1"), col("n2"))
          .as("score"))
      .filter(col("score") >= minCosine)
      .select(col("id1"), col("id2"), round(col("score"), 6).as("score"))
  }

  /** Sign-bucket id from `planes` hyperplanes (bit p = 1 iff dot_p ≥ 0):
    * the single-pass codegen'd [[graft.functions.HyperplaneBucket]]
    * expression (`graft_hplanes`). `maxDims` must be ≥ the vector length
    * (extra dims are ignored). Callers must have registered the function
    * (every `Ann` entry point does via `withRegistry`). */
  def hyperplaneBucket(vec: Column, planes: Int, maxDims: Int = 64): Column =
    call_function("graft_hplanes", vec, lit(planes), lit(maxDims))

  /** The composed formulation (one `graft_dot` against a literal weight
    * array per plane): kept as the equivalence reference for
    * [[hyperplaneBucket]]'s fused expression — AnnSpec asserts identical
    * buckets over the corpus. */
  def hyperplaneBucketComposed(vec: Column, planes: Int, maxDims: Int = 64): Column = {
    val v = vec.cast("array<double>")
    val bits = (0 until planes).map { p =>
      val weights = typedlit((0 until maxDims).map(d => planeWeight(p, d)))
      when(dot(v, weights) >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN: assign every vector (and the query) to its hyperplane
    * bucket, probe only the query's bucket, brute-force inside it. Recall
    * is traded for a ~2^planes reduction in scanned vectors; callers can
    * lower `planes` to widen the probe. */
  def knnLshBucketed(emb0: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, planes: Int): DataFrame = {
    val emb = withRegistry(emb0)
    val bucketed = emb.withColumn("__bucket", hyperplaneBucket(col(vecCol), planes))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"), norm(col(vecCol)).as("__qnorm"),
        col("__bucket"))
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(q), Seq("__bucket"))
      .select(col(idCol),
        cosineOrZero(dot(col(vecCol), col("__qvec")), norm(col(vecCol)),
          col("__qnorm")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Batch ANN — the production shape of similarity search: MANY query
    * vectors answered by ONE corpus scan, instead of one scan per query.
    * Corpus and queries are both bucketed by hyperplane sign; candidates
    * form only inside shared buckets; per-query top-k comes from a
    * row_number window partitioned by query id (Catalyst plans the k-limit
    * as WindowGroupLimit — partial top-k before the shuffle, so the full
    * candidate list never crosses the wire). The query batch is broadcast
    * (thousands of queries are still dim-scale); for a query set too big
    * to broadcast, drop the hint and the same plan shuffles both sides on
    * the bucket key. */
  def knnBatchLsh(emb0: DataFrame, queries0: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int): DataFrame = {
    val emb = withRegistry(emb0)
    val corpus = emb
      .withColumn("__bucket", hyperplaneBucket(col(vecCol), planes))
      .select(col(idCol), col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"),
        col("__bucket"))
    val q = withRegistry(queries0)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm(col(vecCol)).as("__qn"),
        hyperplaneBucket(col(vecCol), planes).as("__bucket"))
    val scored = corpus.join(broadcast(q), Seq("__bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        cosineOrZero(dot(col("__cv"), col("__qv")), col("__cn"), col("__qn"))
          .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Nearest-centroid assignment: compute per-label centroids (the emb2
    * definition — per-dimension double mean rounded to 6 decimals, so the
    * codebook is engine-portable), broadcast the codebook, assign every
    * vector to its max-cosine centroid, and emit the (label, assigned)
    * confusion counts. The k-means-scoring shape: at 100 TB the codebook
    * is dim-scale (labels × dims doubles), the corpus is scanned once with
    * one codegen'd dot per centroid, and the only shuffles are the
    * centroid aggregation and the per-vector argmax (tiny hash partitions
    * keyed by vector id — no global sort). Cosine ties break toward the
    * smaller centroid label so the argmax is total. */
  def centroidAssign(emb0: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val emb = withRegistry(emb0)
    val centroids = emb
      .select(col(labelCol).cast("long").as("c_label"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "v")))
      .groupBy("c_label", "dim")
      .agg(round(avg(col("v")), 6).as("cv"))
      .groupBy("c_label")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
        x => x("cv")).as("centroid"))
    val scored = emb
      .select(col(idCol).as("__vid"), col(labelCol).cast("long").as("label"),
        col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(broadcast(centroids))
      .select(col("__vid"), col("label"), col("c_label"),
        cosineOrZero(dot(col("__v"), col("centroid")), norm(col("__v")),
          norm(col("centroid"))).as("__cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__vid").orderBy(col("__cos").desc, col("c_label"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col("label"), col("c_label").as("assigned"))
      .agg(count(lit(1)).as("n"))
  }

  /** All pairs with cosine ≥ `minCosine` (embedding near-duplicate
    * detection). Per-row norms are computed once on each side of the join;
    * each pair costs exactly one codegen'd dot. `exact=false` bounds the
    * pair space with LSH buckets (pairs only form inside a bucket). */
  def cosineNearDupPairs(emb0: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, exact: Boolean = true, planes: Int = 8): DataFrame = {
    val emb = withRegistry(emb0)
    val a = emb.select(col(idCol).as("id1"), col(vecCol).as("v1"),
      norm(col(vecCol)).as("n1"))
    val b = emb.select(col(idCol).as("id2"), col(vecCol).as("v2"),
      norm(col(vecCol)).as("n2"))
    val pairs =
      if (exact) a.crossJoin(b)
      else {
        val ba = a.withColumn("__bucket", hyperplaneBucket(col("v1"), planes))
        val bb = b.withColumn("__bucket", hyperplaneBucket(col("v2"), planes))
        ba.join(bb, Seq("__bucket"))
      }
    pairs.filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        cosineOrZero(dot(col("v1"), col("v2")), col("n1"), col("n2"))
          .as("score"))
      .filter(col("score") >= minCosine)
      .select(col("id1"), col("id2"), round(col("score"), 6).as("score"))
  }
}
