package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming extension (SURVEY.md §7.1 step 9): the reference's
  * chunked CSV ingestion (`ingestion/ingest_csv.py:32-34`) becomes a file
  * source with `maxFilesPerTrigger`; day-bucketed AE rates
  * (`analytics/queries.py:21`) become watermarked tumbling windows; the
  * freshness SLI (`src/common/freshness.py`) becomes a streaming max-ts
  * monitor; and gap-based sessions use `flatMapGroupsWithState` (the
  * batch twin is `graft.queries.EventQueries` e2).
  *
  * All aggregations are keyed (no global state), watermarks bound state
  * size — the 120-minute SLO tolerance is exactly the watermark delay, so
  * late events inside the SLO are still counted (SURVEY §7.3 #5).
  */
object Streaming {

  /** S1 as a stream: micro-batch CSV ingestion with schema pinned up front
    * (a streaming source cannot infer schemas). */
  def csvFileStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)

  /** Watermarked tumbling-window event counts (the streaming twin of the
    * e1 hourly rollup). */
  def windowedCounts(events: DataFrame, tsCol: String, window_ : String = "1 hour",
      watermark: String = "120 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Freshness monitor: latest event timestamp per micro-batch → lag is
    * evaluated by the sink against the SLO (ok ≤ slo, warning ≤ 1.25·slo,
    * breach beyond — `freshness.py:52-57`). */
  def freshnessState(events: DataFrame, tsCol: String): DataFrame =
    events.groupBy(lit("silver").as("layer")).agg(max(col(tsCol)).as("latest_ts"))

  def freshnessStatus(lagMinutes: Long, sloMinutes: Long = 120L): String =
    if (lagMinutes <= sloMinutes) "ok"
    else if (lagMinutes <= (sloMinutes * 1.25).toLong) "warning"
    else "breach"

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(nSessions: Long, nEvents: Long, lastTsSecs: Long)
  final case class SessionOut(user_id: Long, n_sessions: Long, n_events: Long)

  /** Custom keyed state (`mapGroupsWithState`): per-user gap-based session
    * counting — a new session starts when the gap since the previous event
    * exceeds `gapSecs`. Each micro-batch emits the user's running totals
    * (Update mode); state is one tiny record per active user, so it scales
    * with distinct users, not events. Batch twin: `EventQueries` e2. */
  def sessionize(events: DataFrame, gapSecs: Long = 1800L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "ts").as[SessionEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val batch = rows.toSeq.sortBy(_.ts.getTime)
          var s = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
          batch.foreach { e =>
            val t = e.ts.getTime / 1000L
            val newSession = s.lastTsSecs == Long.MinValue || t - s.lastTsSecs > gapSecs
            // lastTs only advances: a cross-batch late event joins the
            // current session but must not rewind the high-water mark —
            // otherwise the next on-time event reads an inflated gap and
            // fabricates a phantom session
            s = SessionState(s.nSessions + (if (newSession) 1 else 0),
              s.nEvents + 1, math.max(s.lastTsSecs, t))
          }
          state.update(s)
          SessionOut(userId, s.nSessions, s.nEvents)
      }.toDF()
  }

  /** Streaming exact dedup: drop duplicate `keyCols` within the watermark
    * horizon (the streaming twin of `graft.dedup.Dedup.exactDedup` —
    * state holds one entry per distinct key seen inside the watermark,
    * so state size is bounded by arrival rate × horizon, not history).
    * Default is key-ONLY dedup (`dropDuplicatesWithinWatermark`): an
    * at-least-once redelivery that restamps `tsCol` is still dropped.
    * That is only correct when `keyCols` is a true event identity —
    * two genuinely distinct events sharing `keyCols` inside the horizon
    * would be collapsed. Callers whose keys are NOT unique per event must
    * pass `tsIsIdentity = true` to restore key+ts dedup semantics (at the
    * cost of letting restamped redeliveries through). The choice is an
    * explicit parameter so the semantics are visible at every call site. */
  def dedupStream(events: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String = "1 hour", tsIsIdentity: Boolean = false): DataFrame = {
    val keys = if (tsIsIdentity) keyCols :+ tsCol else keyCols
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)
  }

  /** Stream-stream inner join with bounded state: both sides watermarked,
    * the time-range condition lets Spark evict state older than the
    * horizon (views ↔ purchases attribution inside `windowSecs`). */
  def streamStreamJoin(views: DataFrame, purchases: DataFrame,
      keyCol: String, tsCol: String, windowSecs: Long,
      watermark: String = "1 hour"): DataFrame = {
    val v = views.select(col(keyCol).as("view_k"), col(tsCol).as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases.select(col(keyCol).as("purchase_k"), col(tsCol).as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    v.join(p, expr(
      s"""view_k = purchase_k AND purchase_ts >= view_ts AND
          purchase_ts <= view_ts + interval $windowSecs seconds"""))
  }

  /** Stream-stream attribution join carrying event identities: every
    * (view, purchase) pair for the same key with the purchase inside
    * `windowSecs` of the view. Both sides watermarked so join state is
    * evicted once the watermark clears a row's match horizon; an inner
    * join emits eagerly (a pair appears as soon as both sides have
    * arrived), so the emitted set is exactly the batch join — monotone,
    * no flush event needed. [[streamStreamJoin]] keeps the minimal
    * (key, ts) shape; this variant is the gate/pipeline form. */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      keyCol: String, tsCol: String, idCol: String, windowSecs: Long,
      watermark: String = "1 hour"): DataFrame = {
    val v = views.select(col(keyCol).as("view_k"), col(tsCol).as("view_ts"),
      col(idCol).as("view_event"))
      .withWatermark("view_ts", watermark)
    val p = purchases.select(col(keyCol).as("purchase_k"),
      col(tsCol).as("purchase_ts"), col(idCol).as("purchase_event"))
      .withWatermark("purchase_ts", watermark)
    v.join(p, expr(
      s"""view_k = purchase_k AND purchase_ts >= view_ts AND
          purchase_ts <= view_ts + interval $windowSecs seconds"""))
  }

  /** LEFT OUTER [[attributionJoin]] — the unconverted-view funnel: every
    * (view, purchase) pair PLUS every view with no purchase inside
    * `windowSecs`, emitted with a null purchase side. Unlike the inner
    * join's eager monotone emission, an unmatched left row can only be
    * emitted once BOTH watermarks prove no match can still arrive
    * (watermark > view_ts + window), i.e. null-emission rides state
    * EVICTION — the semantics under test. The caller must ensure the
    * event-time high-water mark advances past every real row's match
    * horizon (the st-family flush sentinel) or tail views sit in state
    * unemitted forever. */
  def attributionJoinOuter(views: DataFrame, purchases: DataFrame,
      keyCol: String, tsCol: String, idCol: String, windowSecs: Long,
      watermark: String = "1 hour"): DataFrame = {
    val v = views.select(col(keyCol).as("view_k"), col(tsCol).as("view_ts"),
      col(idCol).as("view_event"))
      .withWatermark("view_ts", watermark)
    val p = purchases.select(col(keyCol).as("purchase_k"),
      col(tsCol).as("purchase_ts"), col(idCol).as("purchase_event"))
      .withWatermark("purchase_ts", watermark)
    v.join(p, expr(
      s"""view_k = purchase_k AND purchase_ts >= view_ts AND
          purchase_ts <= view_ts + interval $windowSecs seconds"""),
      "left_outer")
  }

  /** Streaming medallion landing: a foreachBatch bronze writer with
    * dead-letter routing. The batch path ([[graft.io.Medallion.landToBronze]])
    * fail-fasts on a failed domain like the reference's ingest
    * (`ingest_csv.py:128-131`); a stream must keep running, so per
    * micro-batch the violating rows (same [[graft.checks.Check]] suite)
    * are appended to a quarantine path tagged with `batch_id`, and the
    * clean rows land hive-partitioned under (study_id, domain) exactly
    * like the batch writer — the downstream silver reader is identical
    * for both paths.
    *
    * Delivery: the checkpoint makes foreachBatch effectively-once per
    * batch id under normal operation; on recovery a batch may replay, and
    * the `batch_id` column on both sinks is what a compacting consumer
    * dedupes on (append-only parquet has no atomic upsert — at 100 TB
    * this sink would be a transactional table format instead).
    */
  def bronzeStreamWriter(stream: DataFrame, studyId: String, domain: String,
      bronzeRoot: String, quarantineRoot: String,
      checkpointDir: String): StreamingQuery = {
    val checks = graft.io.Medallion.domainChecks.getOrElse(domain, Nil)
    stream.writeStream
      .queryName(s"bronze_$domain")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, batchId, checks, studyId, domain, bronzeRoot, quarantineRoot)
      }
      .start()
  }

  /** Streaming SCD2 dimension maintenance: each micro-batch of change
    * events is merged into the versioned dimension with
    * [[graft.warehouse.Scd2.merge]] (idempotent — replayed batches
    * produce no new versions, which is exactly the at-least-once
    * foreachBatch contract's failure mode). Each batch writes a full
    * dimension snapshot under `v_<batchId>`; [[readCurrentDim]] reads the
    * latest. Snapshot-per-batch is the plain-parquet stand-in for a
    * transactional table format's commit — at 100 TB the dimension is
    * orders of magnitude smaller than the fact stream it versions, and
    * old snapshots are retention-pruned like any table-format history.
    */
  def scd2StreamSink(updates: DataFrame, key: String, attrs: Seq[String],
      ts: String, tieBreak: String, dimDir: String,
      checkpointDir: String): StreamingQuery =
    updates.writeStream
      .queryName("scd2_dim")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // Read the latest snapshot STRICTLY BEFORE this batch id: a
        // replayed batch (crash before checkpoint commit) must not read
        // its own previous — possibly partial — v_<batchId> output and
        // then overwrite the path it is reading from.
        val cur = readDimBefore(spark, dimDir, batchId)
        val merged = cur match {
          case Some(dim) => graft.warehouse.Scd2.merge(dim, batch, key, attrs, ts, tieBreak)
          case None => graft.warehouse.Scd2.fromHistory(batch, key, attrs, ts, tieBreak)
        }
        merged.write.mode("overwrite").parquet(f"$dimDir/v_$batchId%012d")
      }
      .start()

  /** Batch catch-up through the streaming path: run a landing query with
    * `Trigger.AvailableNow` — process everything currently in the source
    * (checkpoint-resumable, rate-limited into micro-batches like a live
    * stream) and stop. One code path serves both the nightly backfill and
    * the continuous stream; at 100 TB this is how a new study's history
    * is loaded without a separate batch writer drifting out of sync.
    */
  def bronzeCatchUp(stream: DataFrame, studyId: String, domain: String,
      bronzeRoot: String, quarantineRoot: String, checkpointDir: String,
      timeoutMs: Long = 120000L): Boolean = {
    val checks = graft.io.Medallion.domainChecks.getOrElse(domain, Nil)
    val q = stream.writeStream
      .queryName(s"bronze_catchup_$domain")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, batchId, checks, studyId, domain, bronzeRoot, quarantineRoot)
      }
      .start()
    // On timeout (or await failure) the AvailableNow query must not be
    // left running in the background: a later caller reusing the same
    // checkpoint dir would collide with the zombie. Stop is idempotent
    // and checkpoint-safe — the next run resumes from the last commit.
    try q.awaitTermination(timeoutMs)
    finally { if (q.isActive) q.stop() }
  }

  /** Shared micro-batch landing: violations → quarantine (tagged with
    * batch_id), clean rows → hive-partitioned bronze. */
  private def landBatch(batch: DataFrame, batchId: Long,
      checks: Seq[graft.checks.Check], studyId: String, domain: String,
      bronzeRoot: String, quarantineRoot: String): Unit = {
    val bad = checks.map(_.violation).reduceOption(_ || _).getOrElse(lit(false))
    val tagged = batch.withColumn("__bad", bad).persist()
    try {
      val quarantined = tagged.filter(col("__bad")).drop("__bad")
        .withColumn("batch_id", lit(batchId))
      if (quarantined.limit(1).count() > 0)
        quarantined.write.mode("append").parquet(quarantineRoot)
      tagged.filter(!col("__bad")).drop("__bad")
        .withColumn("batch_id", lit(batchId))
        .withColumn("study_id", lit(studyId))
        .withColumn("domain", lit(domain))
        .write.mode("append")
        .partitionBy("study_id", "domain")
        .parquet(bronzeRoot)
    } finally { tagged.unpersist(); () }
  }

  /** Latest SCD2 snapshot under `dimDir` (None before the first commit).
    * `v_` dirs are zero-padded so lexicographic max = latest batch. */
  def readCurrentDim(spark: SparkSession, dimDir: String): Option[DataFrame] =
    latestVersion(spark, dimDir, beforeName = None)
      .map(v => spark.read.parquet(s"$dimDir/$v"))

  /** Latest snapshot with version < `batchId` (replay safety — see
    * [[scd2StreamSink]]). */
  private def readDimBefore(spark: SparkSession, dimDir: String,
      batchId: Long): Option[DataFrame] =
    latestVersion(spark, dimDir, beforeName = Some(f"v_$batchId%012d"))
      .map(v => spark.read.parquet(s"$dimDir/$v"))

  private def latestVersion(spark: SparkSession, dimDir: String,
      beforeName: Option[String]): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(dimDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) None
    else Option(fs.listStatus(root))
      .map(_.filter(s => s.isDirectory && s.getPath.getName.startsWith("v_"))
        .map(_.getPath.getName)
        .filter(n => beforeName.forall(n < _)).sorted)
      .filter(_.nonEmpty)
      .map(_.last)
  }

  /** Start a windowed-count query writing to an in-memory sink (used by
    * tests and local monitoring dashboards). */
  def startMemorySink(df: DataFrame, queryName: String,
      intervalMs: Long = 500L): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .start()
}
