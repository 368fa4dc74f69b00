package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Manifest-based snapshot versioning over plain parquet — the minimal
  * Spark-first form of the lakehouse time-travel mechanism (Delta's
  * transaction log / Iceberg's snapshot manifests, public designs):
  * every commit writes its rows as a NEW immutable file group under
  * `data/` and records a manifest listing the file groups visible at
  * that version. Readers plan ONLY the groups in their version's
  * manifest, so:
  *
  *  - historical versions stay byte-stable forever (time travel);
  *  - an append never rewrites existing data (file groups are the unit
  *    of addition, exactly Iceberg's add-files commit);
  *  - a failed write is invisible (the manifest is published LAST, via
  *    atomic temp-file rename — no manifest, no version).
  *
  * Manifests live under `_manifests/` (underscore: invisible to Spark's
  * file index, so a naive `spark.read.parquet(dir)` of the table root
  * cannot half-read metadata). At 100 TB the same layout holds — the
  * manifest grows with file-group count, not rows, and a read is one
  * manifest fetch + a planned multi-path parquet scan. Concurrent
  * writers are served by [[commitAppendOcc]] (optimistic retry on the
  * version pointer with append-append auto-rebase — the Delta/Iceberg
  * OCC protocol); cross-table zero-copy forks by [[cloneShallow]].
  * File-level statistics compose with [[DataSkipping]].
  */
object Versioned {

  private def manifestDir(dir: String): Path = Paths.get(dir, "_manifests")
  private def manifestPath(dir: String, v: Int): Path =
    manifestDir(dir).resolve(s"v$v.json")

  /** A manifest group entry is normally a commit-dir NAME under this
    * table's `data/`; a shallow clone ([[cloneShallow]]) instead records
    * foreign groups as absolute paths/URIs, used verbatim. */
  private def resolveGroup(dir: String, g: String): String =
    if (g.startsWith("/") || g.contains("://")) g else s"$dir/data/$g"

  /** Largest committed version, or 0 if the table does not exist yet. */
  def latestVersion(dir: String): Int = {
    val md = manifestDir(dir)
    if (!Files.isDirectory(md)) return 0
    Files.list(md).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  private def readManifest(dir: String, v: Int): Seq[String] = {
    val p = manifestPath(dir, v)
    require(Files.exists(p), s"no manifest for version $v at $p")
    val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    // groups are commit-dir names (no quotes/commas inside by construction)
    "\"groups\":\\[([^\\]]*)\\]".r.findFirstMatchIn(json)
      .map(_.group(1).split(",").map(_.trim.stripPrefix("\"")
        .stripSuffix("\"")).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
  }

  private def readStats(dir: String, v: Int): Map[String, (Long, Long)] = {
    val p = manifestPath(dir, v)
    require(Files.exists(p), s"no manifest for version $v at $p")
    val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    "\"(c[0-9]+)\":\\[(-?[0-9]+),(-?[0-9]+)\\]".r.findAllMatchIn(json)
      .map(m => m.group(1) -> (m.group(2).toLong, m.group(3).toLong)).toMap
  }

  /** Commit `df` as the next version. `overwrite = false` (append)
    * makes the new version = parent's file groups + the new group;
    * `overwrite = true` makes it the new group alone. Returns the
    * committed version number. The data write happens fully BEFORE the
    * manifest is published (atomic rename), so readers can never see a
    * partial commit.
    *
    * `statsCol` (a LONG column — cast dates to epoch-day etc. at the
    * caller) records the new group's min/max in the manifest — the
    * Iceberg-manifest statistics that let [[prunedRead]] plan only
    * intersecting groups. Parent groups keep whatever stats their own
    * commits recorded. */
  def commit(df: DataFrame, dir: String, overwrite: Boolean = false,
      statsCol: Option[String] = None, txn: Option[(String, Long)] = None,
      commitTs: Option[Long] = None): Int = {
    val parent = latestVersion(dir)
    val v = parent + 1
    val group = s"c$v"
    df.write.mode("errorifexists").parquet(s"$dir/data/$group")
    val groups =
      (if (overwrite || parent == 0) Seq.empty
       else readManifest(dir, parent)) :+ group
    val parentStats =
      if (overwrite || parent == 0) Map.empty[String, (Long, Long)]
      else readStats(dir, parent)
    val newStats = statsCol.flatMap { c =>
      // stats come from the WRITTEN files, not the input plan — the
      // manifest must describe what is on disk
      val row = df.sparkSession.read.parquet(s"$dir/data/$group")
        .selectExpr(s"min($c)", s"max($c)").head()
      if (row.isNullAt(0)) None else Some(group -> (row.getLong(0), row.getLong(1)))
    }
    val stats = parentStats ++ newStats
    Files.createDirectories(manifestDir(dir))
    val statsJson =
      if (stats.isEmpty) ""
      else s""","stats":{${stats.toSeq.sortBy(_._1).map { case (g, (lo, hi)) =>
        s""""$g":[$lo,$hi]""" }.mkString(",")}}"""
    val txnJson = txn.map { case (app, tv) =>
      s""","txn":{"app":"$app","v":$tv}""" }.getOrElse("")
    val tsJson = commitTs.map(ts => s""","ts":$ts""").getOrElse("")
    val json =
      s"""{"version":$v,"parent":$parent,"overwrite":$overwrite,""" +
        s""""groups":[${groups.map(g => "\"" + g + "\"").mkString(",")}]""" +
        statsJson + txnJson + tsJson + "}"
    val tmp = manifestDir(dir).resolve(s".v$v.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(dir, v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Highest `txnVersion` this `appId` has committed to the table, or
    * None — the read half of [[idempotentCommit]]. Scans the retained
    * manifests (bounded by commit count, not data). */
  def lastTxnVersion(dir: String, appId: String): Option[Long] = {
    val md = manifestDir(dir)
    if (!Files.isDirectory(md)) return None
    val pat = ("\"txn\":\\{\"app\":\"" +
      java.util.regex.Pattern.quote(appId) + "\",\"v\":(-?[0-9]+)\\}").r
    val vs = Files.list(md).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("v"))
      .flatMap { p =>
        val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        pat.findFirstMatchIn(json).map(_.group(1).toLong)
      }.toSeq
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** IDEMPOTENT commit under an (appId, txnVersion) pair — the Delta
    * `txnAppId`/`txnVersion` mechanism that makes a streaming foreachBatch
    * sink (or any at-least-once writer) exactly-once on the table: a
    * RETRY of an already-committed transaction is a no-op, because the
    * manifest log remembers the highest txnVersion each app committed.
    * Returns Some(tableVersion) when the commit landed, None when it was
    * skipped as a replay (txnVersion ≤ the recorded high-water mark).
    * The writer's txnVersions must be monotone per app (a micro-batch id
    * is). */
  def idempotentCommit(df: DataFrame, dir: String, appId: String,
      txnVersion: Long, overwrite: Boolean = false): Option[Int] = {
    if (lastTxnVersion(dir, appId).exists(_ >= txnVersion)) None
    else Some(commit(df, dir, overwrite, txn = Some((appId, txnVersion))))
  }

  private def readTs(dir: String, v: Int): Option[Long] = {
    val p = manifestPath(dir, v)
    require(Files.exists(p), s"no manifest for version $v at $p")
    val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    "\"ts\":(-?[0-9]+)".r.findFirstMatchIn(json).map(_.group(1).toLong)
  }

  /** Time travel BY TIMESTAMP (`SELECT ... TIMESTAMP AS OF`): read the
    * latest version whose recorded commit timestamp is ≤ `ts`. Commit
    * timestamps are caller-INJECTED (`commit(..., commitTs = ...)`) per
    * the repo's F9 discipline — wall clocks are nondeterministic, tables
    * whose history must replay pin their clocks. Versions without a
    * recorded ts are ignored; fails when `ts` precedes every stamped
    * commit (exactly Delta's behaviour). */
  def readAsOfTimestamp(spark: SparkSession, dir: String, ts: Long)
      : DataFrame = {
    val stamped = (1 to latestVersion(dir))
      .flatMap(v => readTs(dir, v).map(v -> _))
    val eligible = stamped.filter(_._2 <= ts)
    require(eligible.nonEmpty,
      s"no commit at or before ts=$ts at $dir (stamped: $stamped)")
    read(spark, dir, eligible.maxBy(_._2)._1)
  }

  /** Statistics-pruned snapshot read: plan only the file groups whose
    * recorded [min,max] of `statsCol` intersects [lo,hi] (a group
    * without stats is conservatively read), then apply the residual
    * predicate. Returns (frame, groupsPlanned, groupsTotal) — the
    * manifest-planning half of an Iceberg scan over this log. */
  def prunedRead(spark: SparkSession, dir: String, statsCol: String,
      lo: Long, hi: Long, version: Int = 0): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.col
    val v = if (version == 0) latestVersion(dir) else version
    val groups = readManifest(dir, v)
    val stats = readStats(dir, v)
    val planned = groups.filter(g =>
      stats.get(g).forall { case (glo, ghi) => ghi >= lo && glo <= hi })
    val df =
      if (planned.isEmpty)
        read(spark, dir, v).filter(col(statsCol) >= lo && col(statsCol) <= hi)
          .filter(org.apache.spark.sql.functions.lit(false))
      else
        spark.read.parquet(planned.map(resolveGroup(dir, _)): _*)
          .filter(col(statsCol) >= lo && col(statsCol) <= hi)
    (df, planned.size, groups.size)
  }

  /** MERGE INTO the versioned table (the Delta/Iceberg row-level MERGE
    * shape over this manifest log): read the latest snapshot, merge
    * `updates` by `key` ([[Upsert.merge]] semantics — matched rows take
    * the update wholesale, new keys insert, the rest pass through), and
    * commit the result as a new OVERWRITE version. Historical versions
    * stay readable — an auditor can diff pre- and post-merge snapshots
    * forever. One key-shuffle of each side + one rewrite of the merged
    * table; at 100 TB the rewrite narrows to the touched partitions
    * (compose with a partition-pruned read + dynamic partition
    * overwrite). Returns the committed version. */
  def mergeCommit(updates: DataFrame, dir: String, key: String): Int = {
    val merged = Upsert.merge(read(updates.sparkSession, dir), updates, key)
    commit(merged, dir, overwrite = true)
  }

  /** OPTIMIZE: rewrite the latest snapshot's (possibly many, possibly
    * small) file groups into ONE compacted group published as a new
    * overwrite version — the lakehouse compaction verb (Delta OPTIMIZE /
    * Iceberg rewrite_data_files). Content is invariant by construction
    * (the new group is a read of the old ones); history stays readable,
    * so the pre-compaction layout remains auditable. `statsCol` re-records
    * manifest statistics for the compacted group (compaction must not
    * lose the planning metadata). Returns the new version. */
  def compact(spark: SparkSession, dir: String,
      statsCol: Option[String] = None): Int = {
    val v = latestVersion(dir)
    require(v > 0, s"nothing to compact at $dir")
    commit(read(spark, dir, v).coalesce(1), dir, overwrite = true,
      statsCol = statsCol)
  }

  private def manifestIsOverwrite(dir: String, v: Int): Boolean = {
    val p = manifestPath(dir, v)
    require(Files.exists(p), s"no manifest for version $v at $p")
    val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    json.contains("\"overwrite\":true")
  }

  /** True when commit `v` was an append (its manifest extends the parent's
    * file-group list), so [[changes]] serves that step FILE-LEVEL — reading
    * only the added groups, never diffing snapshots. v=1 counts: the first
    * commit's change set is its own group. */
  def stepIsAppend(dir: String, v: Int): Boolean =
    v == 1 || !manifestIsOverwrite(dir, v)

  /** Key-level diff of two snapshots — the change rows that turn `before`
    * into `after`: `insert` (key only in after), `delete` (key only in
    * before), and `update_preimage`/`update_postimage` pairs (key in both,
    * any column differs; null-safe). Unchanged rows are suppressed. One
    * key-shuffle of each side, change rows built in a single pass (the
    * conditional row-array is inlined and exploded — the joined plan is
    * never re-evaluated per change type). */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String)
      : DataFrame = {
    import org.apache.spark.sql.functions._
    require(before.columns.sameElements(after.columns),
      s"schema mismatch: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val cols = before.columns.toSeq
    val vals = cols.filter(_ != key)
    val b = vals.foldLeft(before)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
      .withColumn("__b", lit(true))
    val a = vals.foldLeft(after)((d, c) => d.withColumnRenamed(c, s"__a_$c"))
      .withColumn("__a", lit(true))
    val joined = b.join(a, Seq(key), "full_outer")
    def side(prefix: String, tag: String) = struct(
      lit(tag).as("_change_type") +:
        cols.map(c => (if (c == key) col(c) else col(s"$prefix$c")).as(c)): _*)
    val changed = vals
      .map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .foldLeft(lit(false))(_ || _)
    import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
    val rowType = StructType(
      StructField("_change_type", StringType, nullable = false) +:
        cols.map(c => before.schema(c).copy(nullable = true)))
    val emptyRows = array().cast(ArrayType(rowType))
    val rows =
      when(col("__b").isNull, array(side("__a_", "insert")))
        .when(col("__a").isNull, array(side("__b_", "delete")))
        .when(changed, array(side("__b_", "update_preimage"),
          side("__a_", "update_postimage")))
        .otherwise(emptyRows)
    joined.select(explode(rows).as("__chg"))
      .select(cols.map(c => col(s"__chg.$c")) :+ col("__chg._change_type"): _*)
  }

  /** Change-data feed between two committed versions — the incremental-read
    * verb of the lakehouse formats (Delta CDF / Iceberg incremental scan):
    * every commit step in (fromVersion, toVersion] contributes its change
    * rows, tagged `_change_type` + `_commit_version`.
    *
    * Scale shape — the reason CDC exists at 100 TB: an APPEND step is
    * served file-level (scan ONLY the groups that commit added; cost
    * bounded by the new data, the table is never touched), and only an
    * OVERWRITE step (merge/compaction) pays a key-shuffle snapshot diff.
    * A compaction step correctly yields ZERO change rows (content
    * invariance is what s22 gates). */
  def changes(spark: SparkSession, dir: String, fromVersion: Int,
      toVersion: Int, key: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val latest = latestVersion(dir)
    require(fromVersion >= 0 && fromVersion < toVersion && toVersion <= latest,
      s"need 0 <= from < to <= $latest, got ($fromVersion, $toVersion)")
    // canonical column order for the union (all commits share the schema)
    val dataCols = read(spark, dir, toVersion).columns.toSeq
    val steps = ((fromVersion + 1) to toVersion).map { v =>
      val step =
        if (stepIsAppend(dir, v)) {
          val added =
            readManifest(dir, v).toSet -- (
              if (v == 1) Set.empty[String] else readManifest(dir, v - 1).toSet)
          spark.read.parquet(added.toSeq.sorted.map(resolveGroup(dir, _)): _*)
            .withColumn("_change_type", lit("insert"))
        } else snapshotDiff(read(spark, dir, v - 1), read(spark, dir, v), key)
      step.select((dataCols :+ "_change_type").map(col): _*)
        .withColumn("_commit_version", lit(v.toLong))
    }
    steps.reduce(_ unionAll _)
  }

  /** Apply a change feed to a base snapshot — the CONSUMER side of
    * [[changes]]: reconstructs the later snapshot from an older one plus
    * the feed, which is the contract that makes CDC useful (a downstream
    * table can follow the log without ever re-reading it). Multi-step
    * feeds collapse to the LAST change per key by commit version
    * (ties broken toward the post-image): a trailing `delete` removes the
    * key, a trailing `insert`/`update_postimage` is its final row,
    * `update_preimage` rows are informational only. One key-shuffle of
    * each side — the same cost shape as [[Upsert.merge]]. */
  def applyChanges(base: DataFrame, feed: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dataCols = base.columns.toSeq
    // pre-images are informational; among the effective classes a key
    // appears at most once per commit (diff semantics), so the version
    // alone orders the reduction — the tie-break column never fires
    val last = Upsert.latestPerKey(
      feed.filter(col("_change_type") =!= "update_preimage"),
      key, "_commit_version", "_change_type")
    val touched = last.select(col(key)).distinct()
    val untouched = base.join(touched, Seq(key), "left_anti")
    val finalRows = last.filter(col("_change_type") =!= "delete")
      .select(dataCols.map(col): _*)
    untouched.unionByName(finalRows)
  }

  /** VACUUM: expire every version below `retainFromVersion` and delete the
    * file groups no retained manifest references — the storage-reclaim verb
    * (Delta VACUUM / Iceberg expire_snapshots + remove_orphan_files).
    * Time travel to an expired version fails (its manifest is gone);
    * retained versions are untouched. Returns
    * (manifestsRemoved, groupsRemoved). At 100 TB the group sweep is a
    * listing + set difference over file-GROUP names (bounded by commit
    * count, not data) and a batch delete of whole directories. */
  def vacuum(spark: SparkSession, dir: String, retainFromVersion: Int)
      : (Int, Int) = {
    val latest = latestVersion(dir)
    require(retainFromVersion >= 1 && retainFromVersion <= latest,
      s"need 1 <= retainFrom <= $latest, got $retainFromVersion")
    val retained = (retainFromVersion to latest)
      .flatMap(v => readManifest(dir, v)).toSet
    val expired = (1 until retainFromVersion)
      .filter(v => Files.deleteIfExists(manifestPath(dir, v)))
    val dataRoot = new org.apache.hadoop.fs.Path(s"$dir/data")
    val fs = dataRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk =
      if (!fs.exists(dataRoot)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(dataRoot)
    val orphans = onDisk.filter(st =>
      st.isDirectory && !retained.contains(st.getPath.getName))
    orphans.foreach(st => fs.delete(st.getPath, true))
    (expired.size, orphans.length)
  }

  /** Row-level DELETE — the remaining CRUD verb over the log (Delta/
    * Iceberg `DELETE FROM ... WHERE`): read the latest snapshot, drop the
    * matching rows, publish the survivors as a new OVERWRITE version.
    * History stays readable (the audit property every destructive verb
    * here preserves); [[changes]] across the delete step emits exactly
    * the deleted rows as `delete` change rows. At 100 TB the rewrite
    * narrows to the file groups whose stats intersect the predicate —
    * compose with [[prunedRead]]'s planning the way [[mergeCommit]]'s
    * note describes. Returns the committed version. */
  def deleteCommit(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column): Int =
    commit(read(spark, dir).filter(!predicate), dir, overwrite = true)

  /** [[read]] with parquet schema merging — SCHEMA EVOLUTION across
    * commits: a later append may carry ADDED columns; the merged read
    * reconciles all groups' footers and null-fills columns an older
    * group never wrote (exactly the s15 mechanism, now over the
    * version log's planned file set). Readers of OLD versions still see
    * that version's schema — evolution is additive, never retroactive. */
  def readMerged(spark: SparkSession, dir: String, version: Int = 0)
      : DataFrame = {
    val v = if (version == 0) latestVersion(dir) else version
    val groups = readManifest(dir, v)
    require(groups.nonEmpty, s"version $v has an empty manifest")
    spark.read.option("mergeSchema", "true")
      .parquet(groups.map(resolveGroup(dir, _)): _*)
  }

  /** File-group count of a version's manifest (layout observability). */
  def groupCount(dir: String, version: Int = 0): Int = {
    val v = if (version == 0) latestVersion(dir) else version
    readManifest(dir, v).size
  }

  /** Read a specific version (time travel), or the latest when `version`
    * is 0. Plans only the file groups in that version's manifest. */
  def read(spark: SparkSession, dir: String, version: Int = 0): DataFrame = {
    val v = if (version == 0) latestVersion(dir) else version
    val groups = readManifest(dir, v)
    require(groups.nonEmpty, s"version $v has an empty manifest")
    spark.read.parquet(groups.map(resolveGroup(dir, _)): _*)
  }

  private def manifestJson(v: Int, parent: Int, overwrite: Boolean,
      groups: Seq[String]): String =
    s"""{"version":$v,"parent":$parent,"overwrite":$overwrite,""" +
      s""""groups":[${groups.map(g => "\"" + g + "\"").mkString(",")}]}"""

  /** Publish `json` as version `v`'s manifest IFF no manifest for `v`
    * exists yet — the put-if-absent primitive optimistic concurrency
    * needs. A plain rename(2) silently REPLACES an existing target (a
    * lost update); hard-link creation is atomic and fails loudly on an
    * existing target, which is exactly the Delta-log "put if absent"
    * contract. Returns false when another writer already owns `v`. */
  private[ops] def publishIfAbsent(dir: String, v: Int, json: String)
      : Boolean = {
    Files.createDirectories(manifestDir(dir))
    val tmp = Files.createTempFile(manifestDir(dir), s".v$v-", ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    try { Files.createLink(manifestPath(dir, v), tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.delete(tmp)
  }

  /** Concurrent-writer APPEND with optimistic conflict resolution — the
    * lakehouse OCC protocol (Delta's commitInfo retry loop / Iceberg's
    * snapshot CAS): write the data group ONCE under a writer-unique name
    * (data never conflicts and is never rewritten), then try to publish
    * the manifest at `latest + 1` via [[publishIfAbsent]]. Losing the
    * race to another APPEND is a FALSE conflict — appends commute — so
    * the loser rebases: re-read the winner's manifest, extend ITS group
    * list with the already-written group, publish at the next version.
    * An OVERWRITE landing in the race window is a TRUE conflict (the
    * snapshot this append was based on no longer exists) and aborts with
    * `ConcurrentModificationException` — serializable-append semantics.
    *
    * `beforePublish` is a deterministic race-injection seam for tests
    * (runs after the data write, before the first publish attempt).
    * Liveness: a failed attempt means some other writer COMMITTED, so
    * with W concurrent appenders every writer lands within W attempts. */
  def commitAppendOcc(df: DataFrame, dir: String, writerId: String,
      maxAttempts: Int = 64, beforePublish: () => Unit = () => ()): Int = {
    val group = s"w_$writerId"
    df.write.mode("errorifexists").parquet(s"$dir/data/$group")
    var parent = latestVersion(dir)
    beforePublish() // race window: parent is captured, nothing published

    var attempts = 0
    while (attempts < maxAttempts) {
      val v = parent + 1
      val groups =
        (if (parent == 0) Seq.empty else readManifest(dir, parent)) :+ group
      if (publishIfAbsent(dir, v, manifestJson(v, parent, overwrite = false,
          groups))) return v
      attempts += 1
      val newLatest = latestVersion(dir)
      ((parent + 1) to newLatest).foreach { w =>
        if (manifestIsOverwrite(dir, w))
          throw new java.util.ConcurrentModificationException(
            s"append by '$writerId' based on v$parent conflicts with " +
              s"overwrite commit v$w at $dir")
      }
      parent = newLatest
    }
    throw new IllegalStateException(
      s"writer '$writerId' lost $maxAttempts straight races at $dir")
  }

  /** SHALLOW CLONE (Delta `CLONE ... SHALLOW` / an Iceberg snapshot ref
    * materialized as a new table): create `dstDir` whose v1 manifest
    * references the SOURCE's current file groups by absolute path —
    * zero data copied, metadata only, O(commit count) not O(rows).
    * The clone then evolves independently: its own commits add groups
    * under its own `data/`, and source commits never change it (the
    * clone's manifest pinned the group list at clone time). The clone's
    * [[vacuum]] can never delete source data (the orphan sweep only
    * considers directories under the clone's own `data/`). Documented
    * hazard, same as the real systems: vacuuming the SOURCE can orphan
    * groups a clone still references — expire sources only after deep-
    * copying or re-cloning. Manifest statistics are keyed by local group
    * name and deliberately not carried over (cloned groups read
    * conservatively). Returns the clone's version (always 1). */
  def cloneShallow(srcDir: String, dstDir: String): Int = {
    require(latestVersion(dstDir) == 0, s"clone target $dstDir already exists")
    val v = latestVersion(srcDir)
    require(v > 0, s"nothing to clone at $srcDir")
    // a relative srcDir would yield group refs the reader mistakes for
    // local names — pin them absolute (URIs pass through verbatim)
    val absSrc =
      if (srcDir.contains("://")) srcDir
      else Paths.get(srcDir).toAbsolutePath.toString
    val groups = readManifest(srcDir, v).map(resolveGroup(absSrc, _))
    Files.createDirectories(manifestDir(dstDir))
    val tmp = manifestDir(dstDir).resolve(".v1.json.tmp")
    Files.write(tmp, manifestJson(1, 0, overwrite = true, groups)
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(dstDir, 1), StandardCopyOption.ATOMIC_MOVE)
    1
  }
}
