package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-TABLE atomic transactions over [[Versioned]] tables — the catalog
  * commit protocol (Iceberg catalog pointer swap / Nessie commit): a single
  * per-table log can make ONE table's commit atomic, but a load that must
  * publish, say, a fact batch AND its audit row together needs a commit
  * object ABOVE the tables. Here that object is a txn record in
  * `<root>/_txnlog/t<N>.json` pinning `{table -> version}` for every
  * enrolled table; records are published with the same put-if-absent
  * hard-link primitive as table manifests ([[Versioned.publishIfAbsent]]'s
  * contract), so exactly one txn wins each catalog version.
  *
  * Protocol per transaction:
  *   1. STAGE: run each table's write as a normal [[Versioned.commit]]
  *      (append). These versions exist in the per-table logs but are NOT
  *      visible through the catalog yet.
  *   2. PUBLISH: write one txn record = previous record's pins overlaid
  *      with the staged versions. Atomic put-if-absent.
  *
  * A crash between 1 and 2 leaves every staged table invisible through the
  * catalog — readers ([[read]]) resolve a table to its PINNED version, so
  * the halted transaction exposes nothing in ANY table (all-or-nothing).
  * Staged-but-never-pinned versions are garbage in the table log; recovery
  * is [[vacuumOrphans]] (drop every unpinned version — catalog-invisible by
  * definition) followed by re-running the transaction.
  *
  * Contract: tables enrolled in a catalog are read THROUGH the catalog
  * (exactly Iceberg's rule — the table pointer lives in the catalog, going
  * around it reads uncommitted state). Appends-only in this verb: two txns
  * racing on disjoint tables both land (the loser re-pins on retry); a race
  * on the SAME table is detected — the loser's staged version no longer
  * sits at `pinned + 1`, a true conflict → loud abort, retry re-stages.
  *
  * 100 TB shape: a txn record is O(#tables) bytes; staging is the tables'
  * own data-parallel writes; publish is one metadata put. Nothing here
  * scales with data volume.
  */
object MultiTxn {

  private def logDir(root: String) = Paths.get(root, "_txnlog")
  private def recPath(root: String, n: Int) = logDir(root).resolve(s"t$n.json")

  /** Latest committed txn number (0 = empty catalog). */
  def latestTxn(root: String): Int = {
    val d = logDir(root)
    if (!Files.isDirectory(d)) return 0
    val stream = Files.list(d)
    try {
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("t") && s.endsWith(".json") =>
          s.stripPrefix("t").stripSuffix(".json").toInt }
        .foldLeft(0)(math.max)
    } finally stream.close()
  }

  /** Pins of txn `n` (or the latest): table name → pinned version. */
  def pins(root: String, n: Int = 0): Map[String, Int] = {
    val t = if (n == 0) latestTxn(root) else n
    if (t == 0) return Map.empty
    val json = new String(Files.readAllBytes(recPath(root, t)),
      StandardCharsets.UTF_8)
    // flat {"table":version,...} object written by this module only
    """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toInt).toMap
  }

  /** One write of a transaction: enrolled table name + its rows. */
  final case class Write(table: String, df: DataFrame)

  /** Table names flow into filesystem paths AND the txn record's JSON
    * (regex-parsed back by [[pins]]); the same loud charset gate
    * `Versioned` applies to ids that flow into paths/manifests. A `../`
    * would stage data OUTSIDE the catalog root; a quote/colon would
    * corrupt the record en route to silently-wrong pins. */
  private def requireTable(t: String): Unit =
    require(t.nonEmpty && t.length <= 128 &&
      t.forall(c => c.isLetterOrDigit || c == '_' || c == '-') &&
      t != "_txnlog",
      s"table name must be [A-Za-z0-9_-]{1,128} and not _txnlog, got '$t'")

  /** Atomically publish `writes` (appends) across their tables. Returns the
    * committed txn number. `crashBeforePublish` is the deterministic
    * fault-injection seam (stage everything, then stop — simulating a
    * coordinator crash between stage and publish). */
  def commit(root: String, writes: Seq[Write],
      crashBeforePublish: Boolean = false): Int = {
    require(writes.nonEmpty, "empty transaction")
    writes.foreach(w => requireTable(w.table))
    require(writes.map(_.table).distinct.size == writes.size,
      "a transaction writes each table at most once")
    val before = latestTxn(root)
    val basePins = pins(root, before)
    // 1. STAGE: per-table appends through the table's own log. Capture the
    //    staged version and its parent for the conflict check below.
    val staged = writes.map { w =>
      val dir = s"$root/${w.table}"
      val parent = Versioned.latestVersion(dir)
      val pinned = basePins.getOrElse(w.table, 0)
      // the table may only have moved by OUR catalog's txns; a parent
      // beyond the pin means an unpinned staged orphan or a foreign writer
      // — both make this txn's basis unclear → refuse before writing
      require(parent == pinned,
        s"table ${w.table} at version $parent but catalog pins $pinned — " +
          "unpinned staged version present (crashed txn?); re-run recovery " +
          "or vacuum the orphan first")
      w.table -> Versioned.commit(w.df, dir)
    }
    if (crashBeforePublish) return -1 // coordinator died: nothing published
    // 2. PUBLISH: one record, put-if-absent. A loser re-reads and retries
    //    IFF its staged tables are untouched by the winner (append races on
    //    disjoint tables commute); same-table races abort.
    var attempt = before + 1
    while (true) {
      val prior = pins(root, attempt - 1)
      for ((t, v) <- staged) {
        val p = prior.getOrElse(t, 0)
        if (p >= v) throw new java.util.ConcurrentModificationException(
          s"txn race on table $t: staged version $v already pinned/passed " +
            s"by txn ${attempt - 1} (pin $p)")
      }
      val merged = prior ++ staged
      val json = merged.toSeq.sortBy(_._1)
        .map { case (t, v) => s""""$t":$v""" }.mkString("{", ",", "}")
      Files.createDirectories(logDir(root))
      val tmp = Files.createTempFile(logDir(root), s".t$attempt-", ".tmp")
      Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
      val won =
        try { Files.createLink(recPath(root, attempt), tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
        finally Files.delete(tmp)
      if (won) return attempt
      attempt += 1
    }
    -1 // unreachable
  }

  /** Recovery half of the crash story: drop every UNPINNED table version
    * (manifest file + its own `c<v>` data group) left behind by a crashed
    * coordinator, so the per-table logs line back up with the catalog and
    * the transaction can simply be re-run. Safe only with no live stagers
    * (the standard lakehouse VACUUM caveat); unpinned versions are by
    * definition invisible through the catalog, so nothing a catalog reader
    * can see is touched. Returns (table, droppedVersion) pairs. */
  def vacuumOrphans(root: String): Seq[(String, Int)] = {
    val pinned = pins(root)
    // never-pinned tables (a txn that crashed before its FIRST publish)
    // are swept back to version 0
    val tableDirs: Seq[String] = {
      val r = Paths.get(root)
      if (!Files.isDirectory(r)) Seq.empty
      else {
        val stream = Files.list(r)
        try stream.iterator().asScala
          .filter(p => Files.isDirectory(p) &&
            p.getFileName.toString != "_txnlog")
          .map(_.getFileName.toString).toList
        finally stream.close()
      }
    }
    val targets = tableDirs.map(t => t -> pinned.getOrElse(t, 0)).toMap
    val dropped = Seq.newBuilder[(String, Int)]
    for ((table, pin) <- targets) {
      val dir = s"$root/$table"
      var v = Versioned.latestVersion(dir)
      while (v > pin) {
        Files.deleteIfExists(Paths.get(dir, "_manifests", s"v$v.json"))
        // a staged append's own group is c<v>; carried groups belong to
        // pinned ancestors and stay
        val g = Paths.get(dir, "data", s"c$v")
        if (Files.isDirectory(g)) {
          val stream = Files.walk(g)
          try stream.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(Files.deleteIfExists(_))
          finally stream.close()
        }
        dropped += table -> v
        v -= 1
      }
    }
    dropped.result()
  }

  /** Snapshot read THROUGH the catalog: the table at its pinned version
    * (empty frame contract deliberately absent — an unenrolled table is a
    * caller bug, refused loudly). */
  def read(spark: SparkSession, root: String, table: String,
      txnNumber: Int = 0): DataFrame = {
    val p = pins(root, txnNumber)
    val v = p.getOrElse(table,
      throw new IllegalArgumentException(
        s"table $table has no pinned version in txn ${if (txnNumber == 0) latestTxn(root) else txnNumber}"))
    Versioned.read(spark, s"$root/$table", v)
  }
}
