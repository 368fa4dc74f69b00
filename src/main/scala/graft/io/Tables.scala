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

  /** Read one testdata table. The `events` table is a LOGICAL table whose
    * physical `ts` layout has shipped in two different forms across
    * testdata generations:
    *
    *  - INT64 TIMESTAMP(NANOS): Spark's parquet reader rejects this
    *    outright (PARQUET_TYPE_ILLEGAL) unless
    *    `spark.sql.legacy.parquet.nanosAsLong` reads the ticks as a plain
    *    long; we then truncate to microseconds — exactly what DuckDB's
    *    `CAST(ts_ns AS TIMESTAMP)` does, so oracle comparisons stay
    *    bit-identical.
    *  - INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads this
    *    natively as TIMESTAMP_NTZ; with the session timezone pinned to UTC
    *    (every entrypoint does), casting to TimestampType is value-identical
    *    and keeps every downstream operator on the single timestamp type
    *    they were written against.
    *
    * A reader must dispatch on what the FILE says, not on what last
    * round's files happened to contain — hard-coding one physical layout
    * for a logical table is exactly the brittleness a 100 TB lakehouse
    * cannot afford (schema evolution across years of landed files is the
    * norm, not the exception). So: read the parquet footer first, then
    * pick the decode path. The legacy-nanos session conf is now set ONLY
    * when the footer actually shows NANOS — a plain read no longer mutates
    * session state as a side effect.
    */
  private def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" => loadEvents(spark, s"$dir/events.parquet")
    case n =>
      spark.read.parquet(s"$dir/$n.parquet")
  }

  /** Schema-adaptive events read; see `load`. Public so the layout spec
    * can drive it against fixture files of both physical layouts. */
  private[graft] def loadEvents(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (tsFooterIsNanos(spark, path)) {
      // Nanos files are unreadable without the legacy conf; it must stay
      // set for the session because the scan consults it at execution
      // time, not just analysis. It is a no-op for non-nanos files.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      val raw = spark.read.parquet(path)
      raw.schema("ts").dataType match {
        case TimestampType => raw
        case TimestampNTZType =>
          // session tz is UTC at every entrypoint → cast is value-identical
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case LongType =>
          // unannotated INT64 with a footer that does NOT say NANOS: the
          // tick unit is unknowable from metadata. Guessing nanos would
          // silently collapse unannotated-micros data to ~1970 timestamps;
          // fail loudly instead (true NANOS files are handled by the
          // footer-dispatch branch above, which never reaches here).
          throw new IllegalStateException(
            s"events.ts is unannotated INT64 at $path — tick unit unknown; " +
              "refusing to guess (annotate as TIMESTAMP(NANOS|MICROS))")
        case other =>
          throw new IllegalStateException(
            s"events.ts has unsupported physical type $other at $path — " +
              "expected TIMESTAMP(NANOS|MICROS)")
      }
    }
  }

  /** True iff the parquet footers store `ts` as INT64 TIMESTAMP(NANOS) —
    * the one layout Spark's reader cannot ingest without the legacy conf.
    * For a directory, EVERY data file's footer is probed and disagreement
    * is a loud error: a mixed NANOS/MICROS directory would otherwise be
    * silently misdecoded by whichever branch the first file selected
    * (multi-writer schema drift — exactly what a 100 TB lakehouse sees).
    * Footer reads happen once per (session, dir) table load (the plan
    * cache above makes this once-per-session); on a real deployment this
    * is the table format's metadata, not a per-file probe.
    */
  private def tsFooterIsNanos(spark: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit, TimestampLogicalTypeAnnotation}
    val conf = spark.sessionState.newHadoopConf()
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .sortBy(_.getName)
          .toSeq
      else Seq(p)
    if (files.isEmpty) return false
    def probe(file: HPath): Boolean = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        if (!schema.containsField("ts")) return false
        // int-index overload: getType(String) is ambiguous in Scala 2.13
        // between MessageType.getType(String*) and GroupType.getType(String)
        val t = schema.getType(schema.getFieldIndex("ts"))
        t.isPrimitive && (t.asPrimitiveType().getLogicalTypeAnnotation match {
          case ts: TimestampLogicalTypeAnnotation => ts.getUnit == TimeUnit.NANOS
          case _ => false
        })
      } finally reader.close()
    }
    val verdicts = files.map(probe)
    if (verdicts.distinct.size > 1)
      throw new IllegalStateException(
        s"events at $path mixes TIMESTAMP(NANOS) and non-NANOS part files " +
          s"(${verdicts.count(identity)} of ${files.size} are NANOS) — " +
          "refusing to decode a mixed-layout directory with one rule")
    verdicts.head
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
