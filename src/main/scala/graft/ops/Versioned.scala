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
  * manifest fetch + a planned multi-path parquet scan. What this
  * deliberately omits from the real systems: concurrent-writer conflict
  * resolution (optimistic re-try on the latest pointer) and file-level
  * statistics in the manifest (compose with [[DataSkipping]] for that).
  */
object Versioned {

  private def manifestDir(dir: String): Path = Paths.get(dir, "_manifests")
  private def manifestPath(dir: String, v: Int): Path =
    manifestDir(dir).resolve(s"v$v.json")

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
      statsCol: Option[String] = None): Int = {
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
    val json =
      s"""{"version":$v,"parent":$parent,"overwrite":$overwrite,""" +
        s""""groups":[${groups.map(g => "\"" + g + "\"").mkString(",")}]""" +
        statsJson + "}"
    val tmp = manifestDir(dir).resolve(s".v$v.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(dir, v), StandardCopyOption.ATOMIC_MOVE)
    v
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
        spark.read.parquet(planned.map(g => s"$dir/data/$g"): _*)
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
    spark.read.parquet(groups.map(g => s"$dir/data/$g"): _*)
  }
}
