package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Versioned

/** PERSISTENT near-duplicate index — the stored-index evolution of
  * [[Dedup.crossCorpusPairs]] its scaladoc promises: the corpus side's
  * MinHash band buckets, shingle sets and shingle counts live as three
  * [[graft.ops.Versioned]] tables an ingest run maintains, so a
  * recurring crawl pays O(new batch + touched buckets) per step instead
  * of re-sketching the whole corpus (the t14 digest-index pattern,
  * lifted from exact to NEAR dedup — the shape RefinedWeb/CCNet-style
  * pipelines actually run at crawl cadence).
  *
  * Per [[ingest]] step: sketch the batch once (one cached shingle scan
  * feeds signatures, verification and the survivor append), probe the
  * stored bands for candidates, verify exactly against the stored
  * shingles (never the estimate — the [[Dedup.lshThenExactPairs]]
  * precision contract), then append ONLY the non-duplicate survivors'
  * bands/shingles/counts as new index versions. Recall is bounded by
  * the banding probability; precision is exact.
  *
  * 100 TB notes: the stored shingle table is the big side — bucket it by
  * doc id so the per-probe verification join co-partitions (the
  * candidate set carries batch-bounded distinct corpus ids); the bands
  * table shuffles on (band, band_hash) — the same key the probe joins
  * on. The three commits per step are sequential, not one cross-table
  * transaction: a crashed ingest can leave bands ahead of shingles —
  * re-running the SAME batch re-probes against the richer bands and
  * re-appends survivors idempotently at the pair level (dup pairs only
  * grow), the honest limitation short of a multi-table commit log.
  * Within-batch near-duplicates are NOT this verb's job (both survive —
  * run [[Dedup.lshThenExactPairs]] inside the batch first).
  */
object NearDupIndex {

  /** Sketch parameters — must stay FIXED for the index's lifetime (a
    * probe with different n/k/rowsPerBand reads buckets the stored side
    * never wrote and silently finds nothing). */
  final case class Params(n: Int, k: Int, rowsPerBand: Int,
      minJaccard: Double) {
    require(n >= 1 && k >= 1 && rowsPerBand >= 1 && k % rowsPerBand == 0,
      s"bands must tile the signature: n=$n k=$k rowsPerBand=$rowsPerBand")
    require(minJaccard > 0 && minJaccard <= 1, s"minJaccard: $minJaccard")
  }

  private def bandsDir(dir: String) = s"$dir/bands"
  private def shinglesDir(dir: String) = s"$dir/shingles"
  private def sizesDir(dir: String) = s"$dir/sizes"

  /** (bands, shingles, sizes) of one document frame, all fed by ONE
    * cached shingle scan. */
  private def sketch(df: DataFrame, idCol: String, textCol: String,
      p: Params): (DataFrame, DataFrame, DataFrame) = {
    val sh = Dedup.tracked(
      Dedup.wordShingles(df, idCol, textCol, p.n).cache())
    val bands = Dedup.bandBuckets(
      Dedup.signaturesFromShingles(sh, idCol, p.k), idCol, p.rowsPerBand)
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("sz"))
    (bands, sh, sizes)
  }

  private def append(bands: DataFrame, sh: DataFrame, sizes: DataFrame,
      dir: String): Unit = {
    Versioned.commit(bands, bandsDir(dir))
    Versioned.commit(sh, shinglesDir(dir))
    Versioned.commit(sizes, sizesDir(dir))
  }

  /** Initialize the index from the existing corpus (version 1 of each
    * index table). */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      p: Params, dir: String): Unit = {
    val (bands, sh, sizes) = sketch(corpus, idCol, textCol, p)
    append(bands, sh, sizes, dir)
  }

  /** Probe from an ALREADY-built batch sketch — the shared core of
    * [[probe]] and [[ingest]], so ingest never sketches twice. */
  private def probeWith(spark: SparkSession, idCol: String,
      bands: DataFrame, sh: DataFrame, sizes: DataFrame, p: Params,
      dir: String): DataFrame = {
    val bB = bands.select(col(idCol).as("batch_id"), col("band"),
      col("band_hash"))
    val bC = Versioned.read(spark, bandsDir(dir))
      .select(col(idCol).as("corpus_id"), col("band"), col("band_hash"))
    val cands = bB.join(bC, Seq("band", "band_hash"))
      .select("batch_id", "corpus_id").distinct()
    val shC = Versioned.read(spark, shinglesDir(dir))
    val inter = cands
      .join(sh.select(col(idCol).as("batch_id"), col("shingle")), "batch_id")
      .join(shC.select(col(idCol).as("corpus_id"), col("shingle")),
        Seq("corpus_id", "shingle"))
      .groupBy("batch_id", "corpus_id").agg(count(lit(1)).as("inter"))
    val szB = sizes.select(col(idCol).as("batch_id"), col("sz").as("sz1"))
    val szC = Versioned.read(spark, sizesDir(dir))
      .select(col(idCol).as("corpus_id"), col("sz").as("sz2"))
    inter.join(szB, "batch_id").join(szC, "corpus_id")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= p.minJaccard)
      .select(col("batch_id"), col("corpus_id"), col("inter"), col("sz1"),
        col("sz2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Which batch documents near-duplicate the INDEXED corpus — reads the
    * stored index, never re-sketches it. Returns
    * (batch_id, corpus_id, inter, sz1, sz2, jaccard), exact-verified.
    * The returned frame is pinned to the index version visible at call
    * time (Versioned reads plan concrete file groups), so a subsequent
    * [[ingest]] append cannot leak into it. */
  def probe(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, p: Params, dir: String): DataFrame = {
    val (bands, sh, sizes) = sketch(batch, idCol, textCol, p)
    probeWith(spark, idCol, bands, sh, sizes, p, dir)
  }

  /** One recurring-crawl step: probe, then append the NON-duplicate
    * survivors' sketch to the index (new versions of all three tables).
    * The batch is sketched ONCE — the survivor append anti-joins the
    * probe's own cached sketch frames by the dup ids instead of
    * re-tokenizing — and the returned pairs frame is persisted, so the
    * probe's candidate+verification joins run once even though both the
    * survivor derivation and the caller consume it. */
  def ingest(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, p: Params, dir: String): DataFrame = {
    val (bands, sh, sizes) = sketch(batch, idCol, textCol, p)
    val pairs = Dedup.tracked(
      probeWith(spark, idCol, bands, sh, sizes, p, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dupIds = pairs.select(col("batch_id").as(idCol)).distinct()
    def surv(f: DataFrame) = f.join(dupIds, idCol :: Nil, "left_anti")
    append(surv(bands), surv(sh), surv(sizes), dir)
    pairs
  }
}
