package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided TPC-H-ish testdata (TESTDATA.md) plus
  * generic medallion IO helpers (SURVEY.md §2.1, S1–S11).
  *
  * Reference behavior being reproduced: the platform reads CSV/Parquet into
  * dataframes and registers warehouse views over parquet files
  * (reference `sql/warehouse_ddl.sql:21-38`, `warehouse/loaders.py:37,53`).
  * Here the scan layer is Spark's vectorized parquet reader; partition
  * pruning and column pruning come from Catalyst.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Analyzed-plan cache: repeated reads of the same (session, dir, table)
    * reuse one DataFrame, so file listing + footer schema resolution happen
    * once per session instead of once per query — at 97 queries that fixed
    * cost dominates small-SF benchmarks, and on a real cluster it's a
    * namenode/object-store round trip saved per query. DataFrames are
    * immutable plans, so sharing is safe; the testdata tables are
    * immutable, so the cached file index cannot go stale (mutable paths —
    * e.g. medallion roots — do not go through this cache).
    *
    * Lifecycle: entries strongly reference their session (a DataFrame pins
    * its session anyway), so the cache self-evicts — every access drops
    * entries whose SparkContext has stopped, and a hard entry bound guards
    * the pathological many-live-sessions case so the map can never pin an
    * unbounded set of plans/file indexes for the JVM lifetime.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
  private val MaxEntries = 512

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = (spark, dir, name)
    val hit = cache.get(key)
    if (hit != null) return hit
    // maintenance only on miss (the hot path is a plain map get): drop
    // entries of stopped sessions; if 512 LIVE entries remain after the
    // sweep (50+ concurrent sessions), evict just enough arbitrary
    // entries to get under the bound — never the whole map, so a steady
    // state above the bound degrades to partial re-lists instead of
    // wiping every session's file index on every miss.
    cache.keySet.removeIf(_._1.sparkContext.isStopped)
    val excess = cache.size - (MaxEntries - 1)
    if (excess > 0) {
      val it = cache.keySet.iterator()
      var n = excess
      while (n > 0 && it.hasNext) { it.next(); it.remove(); n -= 1 }
    }
    cache.computeIfAbsent(key, _ => load(spark, dir, name))
  }

  /** Read one testdata table. `events.parquet` stores INT64
    * TIMESTAMP(NANOS), which Spark's parquet reader rejects outright
    * (PARQUET_TYPE_ILLEGAL). We read nanos as a plain long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds,
    * which is exactly what DuckDB's `CAST(ts_ns AS TIMESTAMP)` does — so
    * oracle comparisons stay bit-identical.
    */
  private def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // Leave the conf set for the session: it only affects parquet files
      // that actually contain nanosecond timestamps (events is the only one),
      // and execution may consult it again after planning.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case n =>
      spark.read.parquet(s"$dir/$n.parquet")
  }

  /** Row-count cache for the immutable testdata tables, keyed like the
    * plan cache above. Library operators that auto-select a strategy on
    * corpus size (Ann near-dup banding, Dedup.jaccardPairs) need the
    * count at plan-construction time; without a cache each declared query
    * re-runs a full-scan count job per invocation — noise at sf0.1, a
    * full 100 TB scan to learn a number the pipeline already knows at
    * scale (VERDICT r5 item 3). On a real deployment this is the
    * catalog's table statistics; here the first access pays one count
    * job and every later invocation is a map get. Only immutable
    * testdata dirs go through this cache (same contract as the plan
    * cache — mutable medallion roots never do). */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), java.lang.Long]()

  def cachedCount(spark: SparkSession, dir: String, name: String): Long = {
    val key = (spark, dir, name)
    val hit = countCache.get(key)
    if (hit != null) return hit
    // same maintenance discipline as the plan cache: sweep stopped
    // sessions, bound live entries so the map can never pin an unbounded
    // set of SparkSession references
    countCache.keySet.removeIf(_._1.sparkContext.isStopped)
    val excess = countCache.size - (MaxEntries - 1)
    if (excess > 0) {
      val it = countCache.keySet.iterator()
      var n = excess
      while (n > 0 && it.hasNext) { it.next(); it.remove(); n -= 1 }
    }
    // run the count job OUTSIDE any map lock — a Spark job inside
    // computeIfAbsent's mapping function would hold the bin lock for the
    // job's whole duration and block unrelated keys hashing to the same
    // bin. A racing thread may duplicate the (idempotent) count;
    // putIfAbsent keeps exactly one value.
    val counted = java.lang.Long.valueOf(apply(spark, dir, name).count())
    val prev = countCache.putIfAbsent(key, counted)
    if (prev != null) prev else counted
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
