package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style hashed importance weighting for training-data selection
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023 — public method). Given a corpus and a
  * TARGET predicate (the distribution you want more of), score every
  * document by the log-likelihood ratio of its hashed n-gram features
  * under a bag-of-buckets model of target vs corpus:
  *
  *   weight(doc) = Σ_b n_doc[b] · [ ln((c_t[b]+1)/(N_t+B)) −
  *                                  ln((c_s[b]+1)/(N_s+B)) ]
  *
  * where features are unigrams + bigrams of the whitespace tokenizer,
  * hashed into B buckets (hashing trick — the vocabulary never
  * materializes), c_t/c_s are per-bucket feature counts over the target
  * subset / whole corpus, and +1 / +B is add-one smoothing. Documents
  * that look like the target get positive weights; downstream selection
  * is a top-k or threshold over this column.
  *
  * 100 TB design: TWO corpus scans. Pass 1 aggregates the token stream
  * to the ≤ B-row bucket-statistics table (map-side combine collapses
  * each task to ≤ B partials) and builds the log-ratio model driver-side
  * from that bounded collect. Pass 2 is the one data-sized shuffle —
  * per-(doc, bucket) counts broadcast-joined to the B-row model, then
  * the per-doc weight aggregation. Nothing in the plan grows faster
  * than the token count, and no driver-side state exists beyond the
  * B-row model.
  *
  * Determinism across engines (the oracle gate compares EXACTLY): the
  * per-bucket log-ratio is computed once per bucket from exact integer
  * counts, scaled to integer NANO-units (round(lr·1e9) as BIGINT), and
  * the per-doc weight is the exact integer sum Σ n_b·lrNano_b — an
  * order-independent BIGINT aggregation, immune to float summation
  * reorder across partitions. The only cross-engine float surface is one
  * ln() per bucket (identical IEEE inputs; a last-ulp divergence would
  * have to land within rounding distance of a .5 nano boundary to
  * change any output).
  *
  * Reference anchor: the reference curates training corpora with quality
  * scores + dedup (clinical-data-platform analytics layer); importance
  * weighting extends that curation surface with distribution matching.
  */
object Dsir {

  /** Per-document importance weights.
    *
    * @param docs     corpus with `idCol` and `textCol`
    * @param isTarget row predicate marking the target-distribution subset
    * @param nBuckets hashed feature space size B (power of two not
    *                 required; collisions are part of the estimator)
    * @param seed     hash seed (keeps feature hashing independent from
    *                 the t10 split hash, which uses seed 7)
    * @return (idCol, n_feats BIGINT, weight_nano BIGINT) — weight in
    *         integer nano-units; divide by 1e9 for the real-valued score
    */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      idCol: String = "doc_id", textCol: String = "text",
      nBuckets: Int = 1024, seed: Int = 31): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(nBuckets <= (1 << 20),
      s"nBuckets=$nBuckets exceeds the driver-collect bound (2^20)")
    // One md5 per TOKEN, not per feature: bigram buckets derive from the
    // two token hashes by integer combine (h1·31 + h2 mod 2^30, bounded
    // well inside BIGINT so the oracle's overflow-checked arithmetic
    // matches Spark's wraparound-free range). Feature hashing needs
    // uniformity, not a crypto hash per feature string — hashing the
    // 2N−1 feature STRINGS measured ~2.6× slower than N token hashes +
    // arithmetic combine (md5 ~60% of the explode stage, bigram string
    // building most of the rest). The hashed-token array materializes
    // once behind a projection so the tokenizer runs once per row.
    val M = 1073741824L // 2^30 combine modulus
    val toksH = transform(TextFunctions.tokens(col(textCol)),
      t => pmod(TextFunctions.hash60(t, seed), lit(M)))
    val bucketOf = (h: Column) => pmod(h, lit(nBuckets.toLong))
    val feats = docs.select(
        col(idCol), isTarget.as("tgt"), toksH.as("h"))
      .select(col(idCol), col("tgt"),
        explode(concat(
          transform(col("h"), bucketOf),
          zip_with(
            slice(col("h"), lit(1), size(col("h")) - 1),
            slice(col("h"), lit(2), size(col("h")) - 1),
            (a, b) => bucketOf(pmod(a * 31 + b, lit(M)))))).as("b"))

    // Pass 1: per-bucket counts — map-side combine collapses the token
    // stream to ≤ B partials per task, the reduce output is ≤ B rows
    // (constant, not data-sized), and the collect is bounded by the
    // require above. Building the model driver-side keeps the whole
    // corpus at TWO scans total; leaving it as a dependent subtree made
    // Catalyst re-expand the explode+aggregate under every consumer
    // (three full scans in the physical plan).
    val bucketRows = feats.groupBy("b")
      .agg(count(lit(1)).as("c_s"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("c_t"))
      .collect()
    val nS = bucketRows.map(_.getLong(1)).sum
    val nT = bucketRows.map(_.getLong(2)).sum
    val bD = nBuckets.toDouble
    // lr = ln( ((c_t+1)(N_s+B)) / ((c_s+1)(N_t+B)) ) in integer
    // nano-units. Operand shape (two products, one divide, one ln) is
    // mirrored verbatim in the oracle SQL so the IEEE intermediates
    // match; Math.log is the same function Spark's log expression uses.
    // HALF_UP via BigDecimal: math.round rounds toward +∞ for negative
    // halves, DuckDB ROUND rounds away from zero.
    val lrRows = bucketRows.map { r =>
      val x = ((r.getLong(2) + 1.0) * (nS + bD)) /
        ((r.getLong(1) + 1.0) * (nT + bD))
      val nano = new java.math.BigDecimal(math.log(x) * 1e9)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      (r.getLong(0), nano)
    }.toSeq
    val spark = docs.sparkSession
    import spark.implicits._
    val lrTable = lrRows.toDF("b", "lr_nano")

    // Pass 2: the one data-sized shuffle — per-(doc, bucket) counts with
    // map-side combine, broadcast-joined to the B-row model, then the
    // per-doc exact integer sum (order-independent, float-free).
    feats.groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(lrTable), "b")
      .groupBy(col(idCol))
      .agg(sum("n").as("n_feats"),
        sum(col("n") * col("lr_nano")).as("weight_nano"))
  }
}
