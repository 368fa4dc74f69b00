package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free spine joins — the 100 TB scale
  * path PERF.md claims for the subject-spine shape (`j2`/`cp3`: one wide
  * left-join spine per subject, reference `analytics/dbt/models/
  * subject_summary.sql`).
  *
  * A repeated fact-to-fact equi-join (spine ⟕ per-domain aggregates, all
  * keyed by subject) shuffles BOTH sides on every run when the inputs are
  * plain parquet. Writing each side bucketed on the join key moves that
  * shuffle to write time, ONCE: every later join between tables bucketed
  * on the same key with the same bucket count plans as a zero-exchange
  * sort-merge join (Catalyst recognizes `HashPartitioning(key, n)` from
  * the bucket spec on both sides). At 1000 executors this converts the
  * nightly spine rebuild from two full-table shuffles per domain into
  * local per-bucket merges.
  *
  * Sizing rule: buckets ≈ total bytes / target partition size (128–256 MB)
  * at the LARGEST table's scale; all members of a join family must share
  * the count. ShuffleAuditSpec proves the zero-shuffle property by
  * measurement, not assertion-from-vibes.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session catalog.
    * Bucketing metadata lives in the catalog (this is what makes the plan
    * recognize co-partitioning), so the write goes through `saveAsTable`,
    * not a bare path. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (plain catalog lookup; present for
    * symmetry and discoverability). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
