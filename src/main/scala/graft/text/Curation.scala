package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.ops.Sampling

/** End-to-end training-data curation: the composition the individual
  * operators exist FOR — quality filter → language filter → exact dedup →
  * LSH-pruned near-dup dedup → deterministic split assignment. One
  * pipeline call takes a raw document corpus to train/val/test-ready
  * shards.
  *
  * Scale shape (each stage is the already-audited operator, composed
  * lazily so Catalyst fuses the filters into the scan):
  *  - quality + language are codegen'd per-row predicates — they prune
  *    BEFORE any shuffle, exactly where 100 TB wants its selectivity;
  *  - exact dedup shuffles once on the md5 fingerprint;
  *  - near-dup runs LSH banding over the survivors (bucket join, never
  *    all-pairs) and exact-verifies only candidates;
  *  - split assignment is a stateless hash — no shuffle, reproducible
  *    across engines and runs.
  * Stage order is the cost gradient: cheapest-per-row and most-selective
  * first, so each shuffle sees only what survived the scans.
  */
object Curation {

  final case class Config(
      minQuality: Double = 0.3,
      langs: Seq[String] = Seq("en"),
      shingleSize: Int = 3,
      minhashes: Int = 12,
      rowsPerBand: Int = 3,
      minJaccard: Double = 0.5,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      splitSeed: Int = 7)

  /** Every intermediate corpus, for inspection/reporting. */
  final case class Stages(raw: DataFrame, quality: DataFrame, lang: DataFrame,
      exactDedup: DataFrame, nearDup: DataFrame)

  def stages(df: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): Stages = {
    val q = df.filter(TextFunctions.qualityScore(col(textCol)) >= cfg.minQuality)
    val lg = q.filter(TextFunctions.detectLang(col(textCol)).isin(cfg.langs: _*))
    // Persisted: the near-dup machinery consumes `ex` from four distinct
    // subplans (shingles, signatures, sizes, anti-join target) — without
    // the cache each one re-runs the quality+langid scan and the
    // fingerprint shuffle. MEMORY_AND_DISK, LRU-evicted under pressure;
    // the cached set is the already-filtered corpus, not the raw input.
    val ex = Dedup.exactDedup(lg, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Greedy near-dup prune: drop the higher id of every verified pair
    // (id1 < id2 by construction). Survivors are pairwise non-similar
    // w.r.t. the verified pairs; this is NOT cluster-min
    // canonicalization — for pairs {(3,10),(5,10)} greedy keeps 3 AND 5,
    // while `Clusters.canonicalAssignment` (the CC alternative, oracle-
    // tested in t9) would keep only 3. Greedy retains more data and
    // needs no iterative CC rounds — the usual curation trade.
    val drops = Dedup.lshThenExactPairs(ex, idCol, textCol, cfg.shingleSize,
        cfg.minhashes, cfg.rowsPerBand, cfg.minJaccard)
      .select(col("id2").as(idCol)).distinct()
    // nd persisted for the same reason: the funnel counts it AND splits
    // it, and each branch would otherwise re-run the whole LSH pipeline
    val nd = ex.join(drops, Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Stages(df, q, lg, ex, nd)
  }

  /** The curated corpus: survivors of all four stages, plus their split
    * assignment. */
  def curate(df: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame =
    stages(df, idCol, textCol, cfg).nearDup
      .withColumn("split",
        Sampling.splitColumn(col(idCol), cfg.splits, cfg.splitSeed))

  /** Funnel report: documents surviving each stage, then per-split counts
    * of the final corpus — the at-a-glance answer to "where did my data
    * go". One lazy union of per-stage aggregates. */
  def funnel(df: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val s = stages(df, idCol, textCol, cfg)
    val stageCounts = Seq(
      "00_raw" -> s.raw, "10_quality" -> s.quality, "20_lang" -> s.lang,
      "30_exact_dedup" -> s.exactDedup, "40_near_dup" -> s.nearDup)
      .map { case (name, d) =>
        d.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs"))
      }
      .reduce(_.unionAll(_))
    val splitCounts = s.nearDup
      .groupBy(Sampling.splitColumn(col(idCol), cfg.splits, cfg.splitSeed).as("s"))
      .agg(count(lit(1)).as("n_docs"))
      .select(concat(lit("50_split_"), col("s")).as("stage"), col("n_docs"))
    stageCounts.unionAll(splitCounts).orderBy("stage")
  }
}
