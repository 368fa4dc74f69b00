package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-versioned").toString + "/tbl"

  test("append commit adds a file group; time travel sees each version " +
      "byte-stable") {
    val dir = freshDir()
    val v1 = Versioned.commit(Seq(1L, 2L, 3L).toDF("id"), dir)
    val v2 = Versioned.commit(Seq(4L, 5L).toDF("id"), dir)
    assert((v1, v2) == (1, 2))
    assert(Versioned.latestVersion(dir) == 2)
    // historical version unchanged by the later commit
    assert(Versioned.read(spark, dir, 1).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    assert(Versioned.read(spark, dir, 2).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 5L))
    // default read = latest
    assert(Versioned.read(spark, dir).count() == 5L)
  }

  test("overwrite commit starts a fresh file-group set; old versions " +
      "still readable") {
    val dir = freshDir()
    Versioned.commit(Seq(1L, 2L).toDF("id"), dir)
    Versioned.commit(Seq(9L).toDF("id"), dir, overwrite = true)
    assert(Versioned.read(spark, dir, 2).as[Long].collect().toSeq == Seq(9L))
    assert(Versioned.read(spark, dir, 1).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
  }

  test("manifest stats prune non-intersecting groups; pruned read equals " +
      "full-scan filter") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10L), (2L, 19L)).toDF("id", "k"), dir,
      statsCol = Some("k"))
    Versioned.commit(Seq((3L, 20L), (4L, 29L)).toDF("id", "k"), dir,
      statsCol = Some("k"))
    Versioned.commit(Seq((5L, 30L), (6L, 39L)).toDF("id", "k"), dir,
      statsCol = Some("k"))
    val (df, planned, total) = Versioned.prunedRead(spark, dir, "k", 20L, 25L)
    assert((planned, total) == (1, 3))
    assert(df.select("id").as[Long].collect().toSeq == Seq(3L))
    val full = Versioned.read(spark, dir)
      .filter(col("k") >= 20L && col("k") <= 25L)
      .select("id").as[Long].collect().toSeq
    assert(full == Seq(3L))
    // disjoint range: zero groups planned, empty result
    val (edf, p0, _) = Versioned.prunedRead(spark, dir, "k", 100L, 200L)
    assert(p0 == 0 && edf.count() == 0L)
  }

  test("changes: append steps are file-level inserts; overwrite steps " +
      "diff snapshots; compaction yields zero change rows") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"), dir)
    Versioned.commit(Seq((3L, 30.0)).toDF("id", "x"), dir) // append
    // overwrite: update id=1, delete id=2, keep id=3, insert id=4
    Versioned.commit(Seq((1L, 11.0), (3L, 30.0), (4L, 40.0)).toDF("id", "x"),
      dir, overwrite = true)
    assert(Versioned.stepIsAppend(dir, 2))
    assert(!Versioned.stepIsAppend(dir, 3))

    val step2 = Versioned.changes(spark, dir, 1, 2, "id")
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(step2 == Set((3L, "insert", 2L)))

    val step3 = Versioned.changes(spark, dir, 2, 3, "id")
      .select("id", "x", "_change_type")
      .as[(Long, Double, String)].collect().toSet
    assert(step3 == Set(
      (1L, 10.0, "update_preimage"), (1L, 11.0, "update_postimage"),
      (2L, 20.0, "delete"), (4L, 40.0, "insert")))

    // multi-step feed = union of the steps, unchanged rows suppressed
    assert(Versioned.changes(spark, dir, 1, 3, "id").count() == 5L)

    // compaction is content-invariant => empty change set for its step
    // (append once more so the table has two packable groups — OPTIMIZE
    // of a single-group table is a no-op and mints no version)
    Versioned.commit(Seq((5L, 50.0)).toDF("id", "x"), dir) // append, v4
    assert(Versioned.compact(spark, dir) == 5)
    assert(Versioned.changes(spark, dir, 4, 5, "id").count() == 0L)
    // single-group no-op: nothing to pack, no version minted
    assert(Versioned.compact(spark, dir) == 5)
  }

  test("snapshotDiff is null-safe on value columns") {
    val before = Seq((1L, Option("a")), (2L, None: Option[String]))
      .toDF("id", "s")
    val after = Seq((1L, None: Option[String]), (2L, None: Option[String]))
      .toDF("id", "s")
    val d = Versioned.snapshotDiff(before, after, "id")
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    // id=2 null==null => unchanged; id=1 "a" -> null => update pair
    assert(d == Set((1L, "update_preimage"), (1L, "update_postimage")))
  }

  test("vacuum expires old manifests and deletes unreferenced groups; " +
      "retained versions stay readable, expired reads fail") {
    val dir = freshDir()
    Versioned.commit(Seq(1L, 2L).toDF("id"), dir)
    Versioned.commit(Seq(3L).toDF("id"), dir) // append: groups c1,c2
    Versioned.compact(spark, dir)             // v3 = overwrite group c3
    val (manifests, groups) = Versioned.vacuum(spark, dir, 3, orphanGraceMs = 0)
    assert((manifests, groups) == (2, 2)) // v1,v2 manifests; c1,c2 groups
    assert(Versioned.read(spark, dir).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] { Versioned.read(spark, dir, 1) }
    // idempotent: nothing left to remove
    assert(Versioned.vacuum(spark, dir, 3, orphanGraceMs = 0) == (0, 0))
  }

  test("deleteCommit drops matching rows in a new version; history " +
      "intact; changes emits the deleted rows") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "x"), dir)
    Versioned.deleteCommit(spark, dir, col("id") === 2L)
    assert(Versioned.read(spark, dir).select("id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L))
    assert(Versioned.read(spark, dir, 1).count() == 3L)
    val chg = Versioned.changes(spark, dir, 1, 2, "id")
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    assert(chg == Set((2L, "delete")))
  }

  test("readMerged reconciles an added column across commits; old rows " +
      "null-fill; old-version reads keep the old schema") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 1.0)).toDF("id", "x"), dir)
    Versioned.commit(Seq((2L, 2.0, 9L)).toDF("id", "x", "flag"), dir)
    val merged = Versioned.readMerged(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("flag", "id", "x"))
    assert(merged.filter(col("flag").isNull).select("id").as[Long]
      .collect().toSeq == Seq(1L))
    assert(Versioned.read(spark, dir, 1).columns.sorted.toSeq == Seq("id", "x"))
  }

  test("applyChanges reconstructs any later snapshot from an older one " +
      "plus the feed (multi-step, all change classes)") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"), dir)
    Versioned.commit(Seq((3L, 30.0)).toDF("id", "x"), dir) // append
    Versioned.commit(Seq((1L, 11.0), (3L, 30.0), (4L, 40.0)).toDF("id", "x"),
      dir, overwrite = true) // update 1, delete 2, insert 4
    Versioned.deleteCommit(spark, dir, col("id") === 4L) // delete 4
    for (from <- 1 to 3; to <- (from + 1) to 4) {
      val rebuilt = Versioned.applyChanges(
        Versioned.read(spark, dir, from),
        Versioned.changes(spark, dir, from, to, "id"), "id")
        .as[(Long, Double)].collect().toSet
      val expected = Versioned.read(spark, dir, to)
        .as[(Long, Double)].collect().toSet
      assert(rebuilt == expected, s"from=$from to=$to")
    }
  }

  test("OCC append rebases onto a racing append: data written once, " +
      "both groups land, loser gets the next version") {
    val dir = freshDir()
    Versioned.commit(Seq(1L).toDF("id"), dir)
    // writer B captures parent=1; A commits v2 in B's race window
    val vB = Versioned.commitAppendOcc(Seq(3L).toDF("id"), dir, "B",
      beforePublish = () =>
        assert(Versioned.commitAppendOcc(Seq(2L).toDF("id"), dir, "A") == 2))
    assert(vB == 3)
    assert(Versioned.read(spark, dir).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    // B's rebased manifest extends A's: v3 ⊃ v2 ⊃ v1, one group each step
    assert((1 to 3).map(Versioned.groupCount(dir, _)) == Seq(1, 2, 3))
    // and v2 (A's win) does NOT contain B's rows — serial history
    assert(Versioned.read(spark, dir, 2).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
  }

  test("OCC append aborts on a racing OVERWRITE (true conflict)") {
    val dir = freshDir()
    Versioned.commit(Seq(1L, 2L).toDF("id"), dir)
    intercept[java.util.ConcurrentModificationException] {
      Versioned.commitAppendOcc(Seq(3L).toDF("id"), dir, "B",
        beforePublish = () =>
          Versioned.commit(Seq(9L).toDF("id"), dir, overwrite = true))
    }
    // the aborted writer published nothing: latest is still the overwrite
    assert(Versioned.latestVersion(dir) == 2)
    assert(Versioned.read(spark, dir).as[Long].collect().toSeq == Seq(9L))
  }

  test("OCC: 8 genuinely concurrent appenders all land; final snapshot " +
      "is the union; versions form a serial history") {
    val dir = freshDir()
    Versioned.commit(Seq(0L).toDF("id"), dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int =
            Versioned.commitAppendOcc(Seq(i.toLong).toDF("id"), dir, s"w$i")
        })
      }
      assert(futures.map(_.get()).sorted == (2 to 9))
    } finally pool.shutdown()
    assert(Versioned.latestVersion(dir) == 9)
    assert(Versioned.read(spark, dir).as[Long].collect().sorted.toSeq
      == (0L to 8L))
    // every intermediate version is a strictly growing group list
    assert((1 to 9).map(Versioned.groupCount(dir, _)) == (1 to 9))
  }

  test("shallow clone: zero data copied, content pinned at clone time, " +
      "both sides evolve independently") {
    val src = freshDir()
    val dst = freshDir()
    Versioned.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"), src)
    Versioned.commit(Seq((3L, 30.0)).toDF("id", "x"), src)
    assert(Versioned.cloneShallow(src, dst) == 1)
    // zero copy: the clone has no data directory of its own yet
    assert(!Files.isDirectory(java.nio.file.Paths.get(dst, "data")))
    assert(Versioned.read(spark, dst).as[(Long, Double)].collect().toSet
      == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // source evolution is invisible to the clone...
    Versioned.commit(Seq((4L, 40.0)).toDF("id", "x"), src)
    assert(Versioned.read(spark, dst).count() == 3)
    // ...and clone evolution (delete + append) is invisible to the source
    Versioned.deleteCommit(spark, dst, col("id") === 2L)
    Versioned.commit(Seq((9L, 90.0)).toDF("id", "x"), dst)
    assert(Versioned.read(spark, dst).as[(Long, Double)].collect().toSet
      == Set((1L, 10.0), (3L, 30.0), (9L, 90.0)))
    assert(Versioned.read(spark, src).count() == 4)
    // clone vacuum reclaims only clone-local storage, never source data
    Versioned.vacuum(spark, dst, Versioned.latestVersion(dst), orphanGraceMs = 0)
    assert(Versioned.read(spark, dst).count() == 3)
    assert(Versioned.read(spark, src).count() == 4)
  }

  test("clone of a clone resolves verbatim absolute refs") {
    val a = freshDir(); val b = freshDir(); val c = freshDir()
    Versioned.commit(Seq(1L, 2L).toDF("id"), a)
    Versioned.cloneShallow(a, b)
    Versioned.commit(Seq(3L).toDF("id"), b)
    Versioned.cloneShallow(b, c)
    assert(Versioned.read(spark, c).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("idempotentCommit: a replayed transaction is a no-op; per-app " +
      "high-water marks are independent") {
    val dir = freshDir()
    val b1 = Seq(1L, 2L).toDF("id")
    assert(Versioned.idempotentCommit(b1, dir, "loader", 1L).contains(1))
    // at-least-once retry of the SAME batch: skipped, nothing duplicated
    assert(Versioned.idempotentCommit(b1, dir, "loader", 1L).isEmpty)
    assert(Versioned.idempotentCommit(Seq(3L).toDF("id"), dir, "loader", 2L)
      .contains(2))
    // a stale replay below the high-water mark is also skipped
    assert(Versioned.idempotentCommit(b1, dir, "loader", 1L).isEmpty)
    // a DIFFERENT app has its own txn sequence
    assert(Versioned.idempotentCommit(Seq(9L).toDF("id"), dir, "backfill", 1L)
      .contains(3))
    assert(Versioned.read(spark, dir).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 9L))
    assert(Versioned.lastTxnVersion(dir, "loader").contains(2L))
    assert(Versioned.lastTxnVersion(dir, "backfill").contains(1L))
    assert(Versioned.lastTxnVersion(dir, "nobody").isEmpty)
  }

  test("readAsOfTimestamp picks the latest commit at or before ts; " +
      "unstamped commits are invisible to it; too-early ts fails") {
    val dir = freshDir()
    Versioned.commit(Seq(1L).toDF("id"), dir, commitTs = Some(1000L))
    Versioned.commit(Seq(2L).toDF("id"), dir, commitTs = Some(2000L))
    Versioned.commit(Seq(3L).toDF("id"), dir) // unstamped (e.g. compaction)
    Versioned.commit(Seq(4L).toDF("id"), dir, commitTs = Some(3000L))
    def ids(ts: Long) = Versioned.readAsOfTimestamp(spark, dir, ts)
      .as[Long].collect().sorted.toSeq
    assert(ids(1000L) == Seq(1L))
    assert(ids(2500L) == Seq(1L, 2L))
    assert(ids(3000L) == Seq(1L, 2L, 3L, 4L))
    assert(ids(999999L) == Seq(1L, 2L, 3L, 4L))
    intercept[IllegalArgumentException] {
      Versioned.readAsOfTimestamp(spark, dir, 999L)
    }
  }

  test("a data write without a published manifest is invisible") {
    val dir = freshDir()
    Versioned.commit(Seq(1L).toDF("id"), dir)
    // simulate a crashed commit: data files land, manifest never published
    Seq(99L).toDF("id").write.parquet(s"$dir/data/c99_orphan")
    assert(Versioned.latestVersion(dir) == 1)
    assert(Versioned.read(spark, dir).as[Long].collect().toSeq == Seq(1L))
  }

  // ---- round 11: file-granularity COW, bin-packed/z-order OPTIMIZE,
  // manifest hardening, atomic idempotent commits, vacuum-safe ts travel

  /** Three stats-carrying key-range commits: [0,9], [10,19], [20,29]. */
  private def threeRangeCommits(dir: String): Unit =
    Seq(0L, 10L, 20L).foreach { lo =>
      Versioned.commit(
        (lo until lo + 10L).map(k => (k, k * 1.0)).toDF("k", "x"), dir,
        statsCol = Some("k"))
    }

  test("COW merge rewrites only the groups whose stats intersect the " +
      "update keys; untouched groups carry over verbatim, stats intact") {
    val dir = freshDir()
    threeRangeCommits(dir)
    val pre = Versioned.groupNames(dir)
    assert(pre.size == 3)
    // updates hit only the middle group's range [10,19]
    val updates = Seq((12L, 999.0), (15L, 999.0)).toDF("k", "x")
    val (v, rewritten, carried) = Versioned.mergeCommitCow(
      updates, dir, "k", "k")
    assert(v == 4)
    assert(rewritten == Seq(pre(1)) && carried == Seq(pre(0), pre(2)))
    // untouched groups appear VERBATIM (same names) in the new manifest
    val post = Versioned.groupNames(dir)
    assert(post.take(2) == carried && post.size == 3)
    // merge semantics hold over the whole snapshot
    val got = Versioned.read(spark, dir).as[(Long, Double)].collect().toMap
    assert(got(12L) == 999.0 && got(15L) == 999.0 && got(11L) == 11.0
      && got(0L) == 0.0 && got(25L) == 25.0 && got.size == 30)
    // carried stats still prune: a [0,9] pruned read plans 1 of 3 groups
    val (_, planned, total) = Versioned.prunedRead(spark, dir, "k", 0L, 9L)
    assert(planned == 1 && total == 3)
    // history intact: the pre-merge snapshot still shows the old values
    assert(Versioned.read(spark, dir, 3).as[(Long, Double)]
      .collect().toMap.apply(12L) == 12.0)
  }

  test("COW merge with keys outside every range commits as a pure append " +
      "(changes serves it file-level); inserts land") {
    val dir = freshDir()
    threeRangeCommits(dir)
    val (v, rewritten, carried) = Versioned.mergeCommitCow(
      Seq((100L, 1.0)).toDF("k", "x"), dir, "k", "k")
    assert(v == 4 && rewritten.isEmpty && carried.size == 3)
    assert(Versioned.stepIsAppend(dir, 4)) // no group dropped => append
    assert(Versioned.changes(spark, dir, 3, 4, "k")
      .select("k", "_change_type").as[(Long, String)].collect().toSet
      == Set((100L, "insert")))
    assert(Versioned.read(spark, dir).count() == 31)
  }

  test("COW delete rewrites only intersecting groups; non-intersecting " +
      "delete is a metadata no-op version; changes emits the deletions") {
    val dir = freshDir()
    threeRangeCommits(dir)
    val pre = Versioned.groupNames(dir)
    val (v, rewritten, carried) =
      Versioned.deleteCommitCow(spark, dir, "k", 15L, 24L)
    assert(v == 4)
    assert(rewritten == Seq(pre(1), pre(2)) && carried == Seq(pre(0)))
    assert(Versioned.read(spark, dir).as[(Long, Double)].collect()
      .map(_._1).sorted.toSeq == ((0L to 14L) ++ (25L to 29L)))
    assert(Versioned.changes(spark, dir, 3, 4, "k")
      .filter(col("_change_type") === "delete").count() == 10L)
    // a delete range no group intersects: nothing rewritten, version minted
    val (v2, rw2, c2) = Versioned.deleteCommitCow(spark, dir, "k", 500L, 600L)
    assert(v2 == 5 && rw2.isEmpty && c2 == Versioned.groupNames(dir, 4))
    assert(Versioned.read(spark, dir).count() == 20L)
  }

  test("bin-packed OPTIMIZE packs only under-target groups into " +
      "ceil(bytes/target) files; large groups carry over by name") {
    val dir = freshDir()
    // two big groups (3000 rows) + three small ones (10 rows)
    Versioned.commit((0L until 3000L).map(k => (k, "a" * 50)).toDF("k", "s"),
      dir, statsCol = Some("k"))
    Versioned.commit((3000L until 6000L).map(k => (k, "b" * 50)).toDF("k", "s"),
      dir, statsCol = Some("k"))
    Seq(6000L, 6010L, 6020L).foreach(lo =>
      Versioned.commit((lo until lo + 10L).map(k => (k, "c")).toDF("k", "s"),
        dir, statsCol = Some("k")))
    val sizes = Versioned.groupSizes(spark, dir).toMap
    val pre = Versioned.groupNames(dir)
    val bigs = pre.take(2)
    val target = bigs.map(sizes).min // both bigs are >= target: carried
    val (v, bins, packed, carried) =
      Versioned.compactBinPacked(spark, dir, Some("k"), target)
    assert(v == 6 && packed == pre.drop(2) && carried == bigs)
    val smallBytes = pre.drop(2).map(sizes).sum
    assert(bins == ((smallBytes + target - 1) / target).toInt.max(1))
    // manifest: carried names verbatim + one packed group
    val post = Versioned.groupNames(dir)
    assert(post.take(2) == bigs && post.size == 3)
    // the packed group holds exactly `bins` parquet files
    val packedFiles = new java.io.File(s"$dir/data/${post.last}")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(packedFiles == bins)
    // content invariant + carried stats still prune
    assert(Versioned.read(spark, dir).count() == 6030L)
    val (_, planned, total) = Versioned.prunedRead(spark, dir, "k", 0L, 10L)
    assert(planned == 1 && total == 3)
  }

  test("OPTIMIZE ZORDER BY re-clusters into z-bucket groups with 2-d " +
      "stats; box reads prune on either dimension; content invariant") {
    val dir = freshDir()
    // 16x16 grid committed in 4 UNCLUSTERED slices (k mod 4): every
    // group spans the full (a, b) domain, so nothing can prune pre-opt
    val rows = for (a <- 0L until 16L; b <- 0L until 16L)
      yield (a * 16 + b, a, b)
    (0 until 4).foreach(r => Versioned.commit(
      rows.filter(_._1 % 4 == r).toDF("id", "a", "b"), dir))
    val (_, pPre, tPre) =
      Versioned.boxPrunedRead(spark, dir, "a", "b", 0L, 7L, 0L, 7L)
    assert(pPre == 4 && tPre == 4) // no stats2 => conservative full plan
    val (v, nGroups) = Versioned.compactZOrder(spark, dir, "a", "b",
      gridBits = 4, bucketBits = 2)
    assert(v == 5 && nGroups == 4)
    // the low-left quadrant box is exactly one z-bucket
    val (box, pPost, tPost) =
      Versioned.boxPrunedRead(spark, dir, "a", "b", 0L, 7L, 0L, 7L)
    assert(pPost == 1 && tPost == 4)
    assert(box.count() == 64L)
    // single-dimension predicates prune too (the point of z-order)
    val (_, pa, _) =
      Versioned.boxPrunedRead(spark, dir, "a", "b", 0L, 7L, 0L, 15L)
    val (_, pb, _) =
      Versioned.boxPrunedRead(spark, dir, "a", "b", 0L, 15L, 0L, 7L)
    assert(pa == 2 && pb == 2)
    // content invariant under the rewrite; compaction step diffs to zero
    assert(Versioned.read(spark, dir).count() == 256L)
    assert(Versioned.changes(spark, dir, 4, 5, "id").count() == 0L)
    // vacuum keeps the z-bucket groups (they share one commit dir)
    Versioned.vacuum(spark, dir, 5, orphanGraceMs = 0)
    assert(Versioned.read(spark, dir).count() == 256L)
  }

  test("hostile writer/app ids and group refs are rejected loudly") {
    val dir = freshDir()
    Versioned.commit(Seq(1L).toDF("id"), dir)
    for (bad <- Seq("a\"b", "a,b", "a/b", "", "a b", "a\nb"))
      intercept[IllegalArgumentException] {
        Versioned.commitAppendOcc(Seq(2L).toDF("id"), dir, bad)
      }
    intercept[IllegalArgumentException] {
      Versioned.idempotentCommit(Seq(2L).toDF("id"), dir, "x\"y", 1L)
    }
    intercept[IllegalArgumentException] {
      Versioned.commit(Seq(2L).toDF("id"), dir, txn = Some(("x,y", 1L)))
    }
    // benign ids with dots/dashes round-trip
    assert(Versioned.idempotentCommit(Seq(2L).toDF("id"), dir,
      "app-1.loader_x", 7L).contains(2))
    assert(Versioned.lastTxnVersion(dir, "app-1.loader_x").contains(7L))
  }

  test("two concurrent replays of the same (app, txnVersion) commit " +
      "exactly once; the loser cleans up its orphaned group") {
    val dir = freshDir()
    Versioned.commit(Seq(0L).toDF("id"), dir)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futures = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Option[Int]] {
          def call(): Option[Int] = Versioned.idempotentCommit(
            Seq(1L, 2L).toDF("id"), dir, "zombie", 1L,
            // both replays pass the pre-check and write data before
            // either publishes — the exact double-commit race
            beforePublish = () => { barrier.await(); () })
        })
      }
      val outcomes = futures.map(_.get())
      assert(outcomes.count(_.isDefined) == 1, s"outcomes: $outcomes")
      assert(outcomes.flatten == Seq(2))
    } finally pool.shutdown()
    // the batch landed exactly once...
    assert(Versioned.read(spark, dir).as[Long].collect().sorted.toSeq
      == Seq(0L, 1L, 2L))
    assert(Versioned.latestVersion(dir) == 2)
    // ...and the loser's orphaned data group was deleted
    val dataDirs = new java.io.File(s"$dir/data").listFiles().map(_.getName)
    assert(dataDirs.count(_.startsWith("t_zombie_1_")) == 1)
  }

  test("idempotentCommit aborts on a racing OVERWRITE even when its own " +
      "commit is an overwrite (read-merge-overwrite lost-update guard)") {
    val dir = freshDir()
    Versioned.commit(Seq(1L, 2L).toDF("id"), dir)
    // an IVM-style writer reads v1, merges, and overwrites — but a
    // concurrent OVERWRITE (e.g. a RESTORE or compaction) lands in its
    // publish window. Silently rebasing would republish a merge computed
    // from the DEAD v1 snapshot, discarding the racing writer's changes.
    intercept[java.util.ConcurrentModificationException] {
      Versioned.idempotentCommit(Seq(9L).toDF("id"), dir, "ivm", 1L,
        overwrite = true,
        beforePublish = () =>
          Versioned.commit(Seq(7L).toDF("id"), dir, overwrite = true))
    }
    // the racing overwrite survives untouched; the loser published
    // nothing, recorded no txn marker, and swept its orphaned group
    assert(Versioned.latestVersion(dir) == 2)
    assert(Versioned.read(spark, dir).as[Long].collect().toSeq == Seq(7L))
    assert(Versioned.lastTxnVersion(dir, "ivm").isEmpty)
    val dataDirs = new java.io.File(s"$dir/data").listFiles().map(_.getName)
    assert(!dataDirs.exists(_.startsWith("t_ivm_")),
      s"orphaned group not cleaned: ${dataDirs.toSeq}")
    // ...and the writer's honest retry (re-read, re-merge, re-commit)
    // lands cleanly on the new basis
    assert(Versioned.idempotentCommit(Seq(8L).toDF("id"), dir, "ivm", 1L,
      overwrite = true).contains(3))
    assert(Versioned.read(spark, dir).as[Long].collect().toSeq == Seq(8L))
  }

  test("a label is never stamped over carried UNLABELED legacy stats — " +
      "append and rewrite refuse; unlabeled appends still work") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10L), (2L, 20L)).toDF("id", "ts"), dir,
      statsCol = Some("ts"))
    // simulate a legacy manifest written before stats labels existed:
    // stats present, scol absent
    val mp = java.nio.file.Paths.get(dir, "_manifests", "v1.json")
    val legacy = new String(java.nio.file.Files.readAllBytes(mp))
      .replaceAll(""","scol":"ts"""", "")
    java.nio.file.Files.write(mp, legacy.getBytes)
    assert(Versioned.readStatsCol(dir, 1).isEmpty, "legacy sim failed")
    // stamping a label over the carried unknown-column stats would
    // re-enable exactly the wrong-column pruning labels prevent
    intercept[IllegalArgumentException] {
      Versioned.commit(Seq((3L, 30L)).toDF("id", "ts"), dir,
        statsCol = Some("id"))
    }
    intercept[IllegalArgumentException] {
      Versioned.commit(Seq((3L, 30L)).toDF("id", "ts"), dir,
        statsCol = Some("ts")) // even the "right" name is unprovable
    }
    // unlabeled append over legacy stats stays fine (readers conservative)
    assert(Versioned.commit(Seq((3L, 30L)).toDF("id", "ts"), dir) == 2)
    // an overwrite carries nothing, so it may re-key the statistics
    assert(Versioned.commit(Seq((4L, 40L)).toDF("id", "ts"), dir,
      overwrite = true, statsCol = Some("id")) == 3)
    assert(Versioned.readStatsCol(dir, 3).contains("id"))
  }

  test("manifest publish is put-if-absent: a racing publish at the same " +
      "version loses and the winner's manifest is byte-untouched") {
    val dir = freshDir()
    Versioned.commit(Seq(1L).toDF("id"), dir)
    val winner =
      """{"version":2,"parent":1,"overwrite":false,"groups":["c1"]}"""
    assert(Versioned.publishIfAbsent(dir, 2, winner))
    // the loser's publish (what a racing commit() attempts) fails — the
    // pre-hardening ATOMIC_MOVE would have silently REPLACED the winner
    assert(!Versioned.publishIfAbsent(dir, 2,
      """{"version":2,"parent":1,"overwrite":false,"groups":["evil"]}"""))
    assert(Versioned.groupNames(dir, 2) == Seq("c1"))
  }

  test("timestamp travel still works within retained history after " +
      "vacuum expires early stamped versions") {
    val dir = freshDir()
    Versioned.commit(Seq(1L).toDF("id"), dir, commitTs = Some(1000L))
    Versioned.commit(Seq(2L).toDF("id"), dir, commitTs = Some(2000L))
    Versioned.commit(Seq(3L).toDF("id"), dir, commitTs = Some(3000L))
    Versioned.vacuum(spark, dir, retainFromVersion = 2, orphanGraceMs = 0)
    // ts resolving to a RETAINED version: fine (expired v1 is ignored)
    assert(Versioned.readAsOfTimestamp(spark, dir, 2500L)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(Versioned.readAsOfTimestamp(spark, dir, 3000L)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // ts before every retained stamp: fails (that history is gone)
    intercept[IllegalArgumentException] {
      Versioned.readAsOfTimestamp(spark, dir, 1500L)
    }
  }

  test("merge-on-read delete: zero rewrite, reads mask the keys, appends " +
      "carry the delete files, apply folds them in narrowly") {
    val dir = freshDir()
    threeRangeCommits(dir) // [0,9], [10,19], [20,29] with k-stats
    val pre = Versioned.groupNames(dir)
    // MOR delete of four keys: no data group rewritten
    val v4 = Versioned.deleteCommitMor(
      Seq(5L, 15L, 16L, 25L).toDF("k"), dir, "k")
    assert(v4 == 4 && Versioned.groupNames(dir) == pre) // data untouched
    assert(Versioned.readDeletes(dir, 4)._1 == Seq("d4"))
    assert(Versioned.read(spark, dir).as[(Long, Double)].collect()
      .map(_._1).sorted.toSeq == (0L to 29L).filterNot(Set(5L, 15L, 16L, 25L)))
    // pruned reads mask too
    val (pr, planned, _) = Versioned.prunedRead(spark, dir, "k", 0L, 9L)
    assert(planned == 1 && pr.count() == 9L)
    // time travel to the pre-delete snapshot still sees everything
    assert(Versioned.read(spark, dir, 3).count() == 30L)
    // a second MOR delete accumulates; an append carries both forward
    Versioned.deleteCommitMor(Seq(6L).toDF("k"), dir, "k")
    Versioned.commit((100L until 105L).map(k => (k, k * 1.0)).toDF("k", "x"),
      dir, statsCol = Some("k"))
    assert(Versioned.readDeletes(dir, 6)._1 == Seq("d4", "d5"))
    assert(Versioned.read(spark, dir).count() == 30L - 5L + 5L)
    // an appended row whose key was MOR-deleted earlier stays masked
    Versioned.commit(Seq((5L, 999.0)).toDF("k", "x"), dir,
      statsCol = Some("k"))
    assert(Versioned.read(spark, dir).filter(col("k") === 5L).count() == 0L)
    // rewrite verbs refuse to run over pending deletes (resurrection)
    intercept[IllegalArgumentException] {
      Versioned.compactBinPacked(spark, dir, None, 1L << 20)
    }
    intercept[IllegalArgumentException] {
      Versioned.mergeCommitCow(Seq((1L, 0.0)).toDF("k", "x"), dir, "k", "k")
    }
    // apply: only the groups containing deleted keys rewrite; the
    // appended [100,104] group (and the masked 5-row append) intersect
    // nothing... the masked append DOES contain key 5 -> touched
    val (v8, rewritten, carried) = Versioned.applyDeletesCommit(spark, dir)
    assert(v8 == 8)
    assert(Versioned.readDeletes(dir, v8)._1.isEmpty)
    assert(carried.contains("c6")) // [100,104]: no deleted key in range
    assert(rewritten.toSet == Set("c1", "c2", "c3", "c7"))
    assert(Versioned.read(spark, dir).as[(Long, Double)].collect()
      .map(_._1).sorted.toSeq ==
      ((0L to 29L).filterNot(Set(5L, 6L, 15L, 16L, 25L)) ++ (100L to 104L)))
    // post-apply the rewrite verbs work again
    assert(Versioned.compactBinPacked(spark, dir, Some("k"), 1L << 20)._1 == 9)
  }

  test("changes serves a MOR-delete step as the masked rows (semi-join " +
      "fast path) and tags the apply step with zero change rows") {
    val dir = freshDir()
    threeRangeCommits(dir)
    Versioned.deleteCommitMor(Seq(5L, 15L).toDF("k"), dir, "k") // v4
    val step = Versioned.changes(spark, dir, 3, 4, "k")
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(step == Set((5L, "delete"), (15L, "delete")))
    // a key deleted twice emits once, at its first delete step
    Versioned.deleteCommitMor(Seq(5L, 25L).toDF("k"), dir, "k") // v5
    val step5 = Versioned.changes(spark, dir, 4, 5, "k")
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(step5 == Set((25L, "delete")))
    // apply is content-invariant => zero change rows for its step
    val (v6, _, _) = Versioned.applyDeletesCommit(spark, dir)
    assert(Versioned.changes(spark, dir, 5, v6, "k").count() == 0L)
    // the full feed applied to the v3 snapshot rebuilds the latest
    val rebuilt = Versioned.applyChanges(Versioned.read(spark, dir, 3),
      Versioned.changes(spark, dir, 3, v6, "k"), "k")
    assert(rebuilt.as[(Long, Double)].collect().toSet ==
      Versioned.read(spark, dir).as[(Long, Double)].collect().toSet)
  }

  test("RESTORE republishes an old snapshot zero-copy; changes across " +
      "the restore step is the undo diff; history stays readable") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"), dir)
    Versioned.commit(Seq((3L, 30.0)).toDF("k", "x"), dir) // v2
    Versioned.deleteCommit(spark, dir, col("k") === 2L)   // v3
    val v4 = Versioned.restore(spark, dir, 2)
    assert(v4 == 4)
    // zero copy: the restored manifest is v2's group list verbatim
    assert(Versioned.groupNames(dir, 4) == Versioned.groupNames(dir, 2))
    assert(Versioned.read(spark, dir).as[(Long, Double)].collect().toSet
      == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // the restore step's change set undoes the delete
    val step = Versioned.changes(spark, dir, 3, 4, "k")
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(step == Set((2L, "insert")))
    // the aborted timeline (v3) is still readable
    assert(Versioned.read(spark, dir, 3).count() == 2L)
    // restore also reinstates pending MOR state when the target had it
    Versioned.deleteCommitMor(Seq(1L).toDF("k"), dir, "k") // v5
    Versioned.restore(spark, dir, 4)                       // v6: pre-MOR
    assert(Versioned.readDeletes(dir, 6)._1.isEmpty)
    assert(Versioned.read(spark, dir).count() == 3L)
    Versioned.restore(spark, dir, 5)                       // v7: MOR again
    assert(Versioned.readDeletes(dir, 7)._1 == Seq("d5"))
    assert(Versioned.read(spark, dir).count() == 2L)
  }

  test("vacuum retains MOR delete files referenced by retained manifests") {
    val dir = freshDir()
    threeRangeCommits(dir)
    Versioned.deleteCommitMor(Seq(5L).toDF("k"), dir, "k") // v4
    Versioned.commit(Seq((50L, 1.0)).toDF("k", "x"), dir)  // v5 carries d4
    val (m, g) = Versioned.vacuum(spark, dir, 4, orphanGraceMs = 0)
    assert(m == 3 && g == 0) // d4 still referenced: nothing orphaned
    assert(Versioned.read(spark, dir, 4).count() == 29L)
    // once the delete is applied and old versions expire, d4 sweeps
    val (v6, _, _) = Versioned.applyDeletesCommit(spark, dir)
    val (_, g2) = Versioned.vacuum(spark, dir, v6, orphanGraceMs = 0)
    assert(g2 > 0)
    assert(!new java.io.File(s"$dir/data/d4").exists())
    assert(Versioned.read(spark, dir).count() == 30L)
  }

  test("clone carries the source's pending MOR delete files") {
    val src = freshDir(); val dst = freshDir()
    threeRangeCommits(src)
    Versioned.deleteCommitMor(Seq(5L, 15L).toDF("k"), src, "k")
    Versioned.cloneShallow(src, dst)
    assert(Versioned.read(spark, dst).count() == 28L)
    assert(Versioned.readDeletes(dst, 1)._1.size == 1)
  }

  test("changes over a 64-commit history plans (balanced union, no " +
      "linear-depth analyzer recursion) and replays every step") {
    val dir = freshDir()
    (0 until 64).foreach(i =>
      Versioned.commit(Seq((i.toLong, i * 10.0)).toDF("id", "x"), dir))
    val feed = Versioned.changes(spark, dir, 0, 64, "id")
    assert(feed.count() == 64L)
    assert(feed.filter(col("_change_type") === "insert").count() == 64L)
    // the union tree the analyzer walks is logarithmic, not 64 deep
    def depth(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      if (p.children.isEmpty) 1 else 1 + p.children.map(depth).max
    assert(depth(feed.queryExecution.logical) < 40,
      s"plan depth ${depth(feed.queryExecution.logical)}")
    // apply reconstructs the final snapshot from the empty base
    val base = Versioned.read(spark, dir, 1).filter(lit(false))
    val rebuilt = Versioned.applyChanges(base, feed, "id")
    assert(rebuilt.count() == 64L)
  }

  test("CHECK constraints: violating batch refused atomically, NULL " +
      "passes (ANSI), retroactively-false constraint refused, hostile " +
      "predicate/name rejected at the edge") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"), dir)
    Versioned.addConstraintCommit(spark, dir, "x_positive", "x > 0.0")
    assert(Versioned.constraints(dir) == Seq("x_positive" -> "x > 0.0"))
    // clean batch flows; NULL predicate result passes (unknown ≠ false)
    Versioned.commitChecked(
      Seq((3L, Some(5.0)), (4L, None)).toDF("id", "x"), dir)
    assert(Versioned.read(spark, dir).count() == 4L)
    // violating batch refused BEFORE any state lands
    val before = Versioned.latestVersion(dir)
    val ex = intercept[IllegalArgumentException] {
      Versioned.commitChecked(Seq((5L, -1.0)).toDF("id", "x"), dir)
    }
    assert(ex.getMessage.contains("x_positive"))
    assert(Versioned.latestVersion(dir) == before)
    assert(Versioned.read(spark, dir).count() == 4L)
    // a constraint the current snapshot violates cannot be added
    intercept[IllegalArgumentException] {
      Versioned.addConstraintCommit(spark, dir, "x_cap", "x < 15.0")
    }
    assert(Versioned.constraints(dir).map(_._1) == Seq("x_positive"))
    // hostile inputs rejected loudly at the API edge
    intercept[IllegalArgumentException] {
      Versioned.addConstraintCommit(spark, dir, "bad name", "x > 0.0")
    }
    intercept[IllegalArgumentException] {
      Versioned.addConstraintCommit(spark, dir, "q", "x > \"0\"")
    }
    // duplicate name rejected
    intercept[IllegalArgumentException] {
      Versioned.addConstraintCommit(spark, dir, "x_positive", "x > 1.0")
    }
  }

  test("RENAME COLUMN: metadata-only, time travel keeps old names, " +
      "appends translate to physical, rewrite verbs guarded until " +
      "the mapping is materialized") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"), dir,
      statsCol = Some("id"))
    val preGroups = Versioned.groupNames(dir)
    val v2 = Versioned.renameColumnCommit(spark, dir, "amount", "price")
    assert(v2 == 2)
    // zero data rewritten: same groups by name
    assert(Versioned.groupNames(dir) == preGroups)
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("id", "price"))
    // time travel: v1 still reads under the OLD name
    assert(Versioned.read(spark, dir, 1).columns.toSeq
      == Seq("id", "amount"))
    // appends speak the LOGICAL schema; files stay physical
    Versioned.commit(Seq((3L, 30.0)).toDF("id", "price"), dir,
      statsCol = Some("id"))
    val out = Versioned.read(spark, dir).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getDouble(1)).toSeq == Seq(10.0, 20.0, 30.0))
    // pruned read filters on the logical name over carried stats
    val (pf, planned, total) = Versioned.prunedRead(spark, dir, "id", 3L, 9L)
    assert(planned == 1 && total == 2 && pf.count() == 1)
    // rename chain composes back to the ORIGINAL physical key
    Versioned.renameColumnCommit(spark, dir, "price", "cost")
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("id", "cost"))
    assert(Versioned.readRenames(dir, Versioned.latestVersion(dir))
      == Map("amount" -> "cost"))
    // group-carrying rewrite verbs refuse over a pending mapping
    intercept[IllegalArgumentException] {
      Versioned.compactBinPacked(spark, dir)
    }
    intercept[IllegalArgumentException] {
      Versioned.deleteCommitMor(Seq(1L).toDF("id"), dir, "id")
    }
    intercept[IllegalArgumentException] {
      Versioned.changes(spark, dir, 0, Versioned.latestVersion(dir), "id")
    }
    // materialize: one rewrite clears the mapping and unblocks OPTIMIZE
    val v5 = Versioned.applyRenamesCommit(spark, dir)
    assert(Versioned.readRenames(dir, v5).isEmpty)
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("id", "cost"))
    assert(Versioned.read(spark, dir).count() == 3)
    Versioned.compactBinPacked(spark, dir)
    // renaming to an existing column or a missing column fails loudly
    intercept[IllegalArgumentException] {
      Versioned.renameColumnCommit(spark, dir, "id", "cost")
    }
    intercept[IllegalArgumentException] {
      Versioned.renameColumnCommit(spark, dir, "ghost", "g2")
    }
  }

  test("ADD COLUMN DEFAULT: metadata-only, pre-ALTER groups read the " +
      "default, post-ALTER appends materialize it, genuine values and " +
      "NULLs survive, time travel is per-version") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"), dir)
    val preGroups = Versioned.groupNames(dir)
    val v2 = Versioned.addColumnCommit(spark, dir, "channel", "string", "store")
    assert(v2 == 2)
    // zero data rewritten: same groups by name
    assert(Versioned.groupNames(dir) == preGroups)
    // pre-ALTER rows read the default
    val r2 = Versioned.read(spark, dir).orderBy("id").collect()
    assert(r2.map(_.getString(2)).toSeq == Seq("store", "store"))
    // time travel: v1 has NO such column
    assert(!Versioned.read(spark, dir, 1).columns.contains("channel"))
    // append WITH the column keeps its values (including a genuine NULL)
    Versioned.commit(Seq((3L, 30.0, "web"), (4L, 40.0, null: String))
      .toDF("id", "amount", "channel"), dir)
    // append WITHOUT the column gets the write-path fill
    Versioned.commit(Seq((5L, 50.0)).toDF("id", "amount"), dir)
    val out = Versioned.read(spark, dir).orderBy("id").collect()
    assert(out.map(r => Option(r.getString(2)).getOrElse("∅")).toSeq
      == Seq("store", "store", "web", "∅", "store"))
    // the v4 group is physically complete (no read-side fill needed)
    assert(spark.read.parquet(s"$dir/data/c4").columns.contains("channel"))
    // rewrite verbs + RENAME + a feed crossing the ALTER refuse
    intercept[IllegalArgumentException] {
      Versioned.compactBinPacked(spark, dir)
    }
    intercept[IllegalArgumentException] {
      Versioned.renameColumnCommit(spark, dir, "amount", "price")
    }
    intercept[IllegalArgumentException] {
      Versioned.changes(spark, dir, 1, Versioned.latestVersion(dir), "id")
    }
    // a feed entirely AFTER the ALTER works and is schema-complete
    val feed = Versioned.changes(spark, dir, 2,
      Versioned.latestVersion(dir), "id")
    assert(feed.count() == 3 &&
      feed.columns.contains("channel"))
    // duplicate add fails loudly
    intercept[IllegalArgumentException] {
      Versioned.addColumnCommit(spark, dir, "channel", "string", "x")
    }
    // materialize: one rewrite clears the map and unblocks OPTIMIZE
    val vM = Versioned.applyDefaultsCommit(spark, dir)
    assert(Versioned.readDefaults(dir, vM).isEmpty)
    assert(Versioned.read(spark, dir).count() == 5)
    Versioned.compactBinPacked(spark, dir)
    val after = Versioned.read(spark, dir).orderBy("id").collect()
    assert(after.map(r => Option(r.getString(2)).getOrElse("∅")).toSeq
      == Seq("store", "store", "web", "∅", "store"))
  }

  test("DROP COLUMN: metadata-only, reads project it out, time travel " +
      "keeps it, appends carrying it are stripped, re-add refused, " +
      "materialization unblocks rewrite verbs") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10.0, "a"), (2L, 20.0, "b"))
      .toDF("id", "amount", "tag"), dir)
    val preGroups = Versioned.groupNames(dir)
    val v2 = Versioned.dropColumnCommit(spark, dir, "tag")
    assert(v2 == 2)
    // zero data rewritten; the column is gone from the latest read
    assert(Versioned.groupNames(dir) == preGroups)
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("id", "amount"))
    // time travel: v1 still reads the column
    assert(Versioned.read(spark, dir, 1).columns.contains("tag"))
    // an append still carrying the column is stripped at write
    Versioned.commit(Seq((3L, 30.0, "stale"))
      .toDF("id", "amount", "tag"), dir)
    assert(!spark.read.parquet(s"$dir/data/c3").columns.contains("tag"))
    // an append without it works as-is
    Versioned.commit(Seq((4L, 40.0)).toDF("id", "amount"), dir)
    assert(Versioned.read(spark, dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // re-adding the dropped name would resurrect stale values: refused
    intercept[IllegalArgumentException] {
      Versioned.addColumnCommit(spark, dir, "tag", "string", "fresh")
    }
    // rewrite verbs + a feed crossing the DROP refuse
    intercept[IllegalArgumentException] {
      Versioned.compactBinPacked(spark, dir)
    }
    intercept[IllegalArgumentException] {
      Versioned.changes(spark, dir, 1, Versioned.latestVersion(dir), "id")
    }
    // a feed entirely after the DROP is schema-clean
    val feed = Versioned.changes(spark, dir, 2,
      Versioned.latestVersion(dir), "id")
    assert(feed.count() == 2 && !feed.columns.contains("tag"))
    // materialize: drops clear, bytes reclaimed, re-add now legal
    val vM = Versioned.applyDropsCommit(spark, dir)
    assert(Versioned.readDrops(dir, vM).isEmpty)
    Versioned.compactBinPacked(spark, dir)
    Versioned.addColumnCommit(spark, dir, "tag", "string", "fresh")
    assert(Versioned.read(spark, dir).orderBy("id")
      .collect().map(_.getString(2)).toSeq
      == Seq("fresh", "fresh", "fresh", "fresh"))
  }

  test("a 64-commit defaulted table reads through the per-group " +
      "normalized union with BOUNDED plan depth and correct fills") {
    val dir = freshDir()
    Versioned.commit(Seq((0L, 0.0)).toDF("id", "amount"), dir)
    Versioned.addColumnCommit(spark, dir, "src", "string", "legacy")
    // 62 post-ALTER appends, each physically complete via write fill
    (1L to 62L).foreach(i =>
      Versioned.commit(Seq((i, i * 1.0)).toDF("id", "amount"), dir))
    val df = Versioned.read(spark, dir)
    assert(df.count() == 63)
    // pre-ALTER row reads the default; fills land everywhere
    assert(df.filter(col("src") =!= "legacy").count() == 0)
    // the pairwise union keeps the ANALYZED plan logarithmic in groups —
    // a left-deep fold would nest ~63 Union nodes; pairwise nests ~6.
    def depth(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      if (p.children.isEmpty) 1 else 1 + p.children.map(depth).max
    assert(depth(df.queryExecution.analyzed) < 30,
      s"plan depth ${depth(df.queryExecution.analyzed)} not bounded")
  }

  test("manifest stats carry their column identity: pruning on a " +
      "different column is refused, and applyDeletesCommit folds " +
      "conservatively instead of resurrecting deleted rows") {
    val dir = freshDir()
    // stats recorded on ts (values ~1e9); MOR delete keyed on id (1..3)
    Versioned.commit(Seq((1L, 1000000001L), (2L, 1000000002L),
      (3L, 1000000003L)).toDF("id", "ts"), dir, statsCol = Some("ts"))
    assert(Versioned.readStatsCol(dir, 1).contains("ts"))
    // pruning on the WRONG column is refused loudly, not planned wrong
    intercept[IllegalArgumentException] {
      Versioned.prunedRead(spark, dir, "id", 1L, 3L)
    }
    // the delete key never intersects any ts-range: a stats-blind fold
    // would take the no-intersection fast path and RESURRECT id=2
    Versioned.deleteCommitMor(Seq(2L).toDF("id"), dir, "id")
    val (_, rewritten, carriedG) = Versioned.applyDeletesCommit(spark, dir)
    assert(rewritten.nonEmpty && carriedG.isEmpty,
      "mismatched stats identity must fold conservatively")
    assert(Versioned.read(spark, dir).select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L),
      "deleted row resurrected")
    // COW verbs refuse the mismatch outright
    intercept[IllegalArgumentException] {
      Versioned.deleteCommitCow(spark, dir, "ts", 0L, 1L)
    }
  }

  test("timestamp travel with tied stamps resolves to the HIGHEST " +
      "version (pinned-clock replays stamp commits identically)") {
    val dir = freshDir()
    Versioned.commit(Seq(1L).toDF("id"), dir, commitTs = Some(1000L))
    Versioned.commit(Seq(2L).toDF("id"), dir, commitTs = Some(1000L))
    val got = Versioned.readAsOfTimestamp(spark, dir, 1000L)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L), s"tie broke to the older version: $got")
  }

  test("COW verbs refuse over pending schema actions even on the " +
      "no-touch path; a malformed default type is rejected before " +
      "anything publishes") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10.0, "a")).toDF("id", "amount", "tag"),
      dir, statsCol = Some("id"))
    Versioned.dropColumnCommit(spark, dir, "tag")
    val vBefore = Versioned.latestVersion(dir)
    // a COW delete whose range touches NOTHING mints its own manifest —
    // it must refuse too, or the pending drop silently clears and the
    // column resurrects with stale values
    intercept[IllegalArgumentException] {
      Versioned.deleteCommitCow(spark, dir, "id", 900L, 999L)
    }
    intercept[IllegalArgumentException] {
      Versioned.mergeCommitCow(Seq((1L, 11.0)).toDF("id", "amount"),
        dir, "id", "id")
    }
    assert(Versioned.latestVersion(dir) == vBefore,
      "refused verbs must publish nothing")
    assert(Versioned.readDrops(dir, vBefore) == Set("tag"))
    // a typo'd default type passes the charset check but must fail the
    // evaluate-once probe BEFORE the manifest publishes
    intercept[IllegalArgumentException] {
      Versioned.addColumnCommit(spark, dir, "c", "strng", "x")
    }
    assert(Versioned.latestVersion(dir) == vBefore)
  }

  test("defaults survive clone and restore; hostile default literals " +
      "are rejected loudly") {
    val dir = freshDir()
    Versioned.commit(Seq((1L, 10.0)).toDF("id", "amount"), dir)
    Versioned.addColumnCommit(spark, dir, "src", "string", "seed")
    Versioned.commit(Seq((2L, 20.0, "live")).toDF("id", "amount", "src"), dir)
    // clone carries the default map (pre-ALTER groups referenced by path)
    val cl = freshDir()
    Versioned.cloneShallow(dir, cl)
    val c = Versioned.read(spark, cl).orderBy("id").collect()
    assert(c.map(_.getString(2)).toSeq == Seq("seed", "live"))
    // restore to the post-ALTER metadata version keeps the default
    val vr = Versioned.restore(spark, dir, 2)
    val r = Versioned.read(spark, dir, vr).collect()
    assert(r.map(_.getString(2)).toSeq == Seq("seed"))
    // hostile literal/type rejected before anything publishes
    intercept[IllegalArgumentException] {
      Versioned.addColumnCommit(spark, dir, "evil", "string", "a\",\"b")
    }
    intercept[IllegalArgumentException] {
      Versioned.addColumnCommit(spark, dir, "evil", "str\"ing", "x")
    }
    // SINGLE-quote payloads must be rejected BEFORE the evaluate-once
    // probe runs — interpolated into expr() text, a quote would close
    // the literal and splice an arbitrary SQL expression (e.g.
    // java_method reflection) into the probe's evaluation
    intercept[IllegalArgumentException] {
      Versioned.addColumnCommit(spark, dir, "evil", "string",
        "' || java_method('java.lang.System','getenv') || '")
    }
    intercept[IllegalArgumentException] {
      Versioned.addColumnCommit(spark, dir, "evil",
        "string) from x --", "v")
    }
    assert(Versioned.latestVersion(dir) == vr,
      "refused ALTERs must publish nothing")
  }
}
