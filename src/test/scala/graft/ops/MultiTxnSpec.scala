package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cross-table atomic commit protocol (ops.MultiTxn): all-or-nothing
  * visibility through the catalog, crash recovery via orphan vacuum,
  * catalog-level time travel, and the dirty-basis refusal. */
class MultiTxnSpec extends SparkSpec {

  import spark.implicits._
  import MultiTxn.Write

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-mtxn-spec").toString

  private def rows(n: Int, tag: String) =
    (1 to n).map(i => (i.toLong, tag)).toDF("k", "tag")

  test("a transaction publishes both tables together") {
    val root = freshRoot()
    val t = MultiTxn.commit(root,
      Seq(Write("a", rows(3, "x")), Write("b", rows(2, "x"))))
    assert(t == 1)
    assert(MultiTxn.read(spark, root, "a").count() == 3)
    assert(MultiTxn.read(spark, root, "b").count() == 2)
    assert(MultiTxn.pins(root) == Map("a" -> 1, "b" -> 1))
  }

  test("a crash between stage and publish exposes NOTHING in any table") {
    val root = freshRoot()
    MultiTxn.commit(root, Seq(Write("a", rows(3, "x")), Write("b", rows(1, "x"))))
    val r = MultiTxn.commit(root,
      Seq(Write("a", rows(5, "y")), Write("b", rows(1, "y"))),
      crashBeforePublish = true)
    assert(r == -1)
    // staged versions exist in the per-table logs…
    assert(Versioned.latestVersion(s"$root/a") == 2)
    // …but the catalog still reads the pinned snapshot of BOTH tables
    assert(MultiTxn.read(spark, root, "a").count() == 3)
    assert(MultiTxn.read(spark, root, "b").count() == 1)
  }

  test("recovery: dirty basis refused, vacuum sweeps orphans, re-run lands") {
    val root = freshRoot()
    MultiTxn.commit(root, Seq(Write("a", rows(3, "x")), Write("b", rows(1, "x"))))
    MultiTxn.commit(root, Seq(Write("a", rows(5, "y"))), crashBeforePublish = true)
    // staging anything touching the dirty table refuses loudly
    val e = intercept[IllegalArgumentException] {
      MultiTxn.commit(root, Seq(Write("a", rows(5, "y"))))
    }
    assert(e.getMessage.contains("unpinned staged version"))
    val swept = MultiTxn.vacuumOrphans(root)
    assert(swept == Seq("a" -> 2))
    assert(Versioned.latestVersion(s"$root/a") == 1)
    val t = MultiTxn.commit(root, Seq(Write("a", rows(5, "y"))))
    assert(t == 2)
    assert(MultiTxn.read(spark, root, "a").count() == 8)
    // untouched table keeps its pin through the new record
    assert(MultiTxn.read(spark, root, "b").count() == 1)
  }

  test("a crash before the FIRST publish is vacuumable back to version 0") {
    val root = freshRoot()
    MultiTxn.commit(root, Seq(Write("a", rows(4, "x"))), crashBeforePublish = true)
    assert(MultiTxn.latestTxn(root) == 0)
    assert(Versioned.latestVersion(s"$root/a") == 1)
    assert(MultiTxn.vacuumOrphans(root) == Seq("a" -> 1))
    assert(Versioned.latestVersion(s"$root/a") == 0)
    val t = MultiTxn.commit(root, Seq(Write("a", rows(4, "x"))))
    assert(t == 1 && MultiTxn.read(spark, root, "a").count() == 4)
  }

  test("catalog time travel: a historical txn number reads the OLD pins of every table") {
    val root = freshRoot()
    MultiTxn.commit(root, Seq(Write("a", rows(2, "x")), Write("b", rows(1, "x"))))
    MultiTxn.commit(root, Seq(Write("a", rows(3, "y"))))
    assert(MultiTxn.read(spark, root, "a").count() == 5)
    assert(MultiTxn.read(spark, root, "a", txnNumber = 1).count() == 2)
    assert(MultiTxn.pins(root, 1) == Map("a" -> 1, "b" -> 1))
    assert(MultiTxn.pins(root, 2) == Map("a" -> 2, "b" -> 1))
  }

  test("disjoint-table transactions both land; audit invariant holds per txn") {
    val root = freshRoot()
    MultiTxn.commit(root, Seq(Write("a", rows(2, "x"))))
    MultiTxn.commit(root, Seq(Write("b", rows(7, "y"))))
    assert(MultiTxn.pins(root) == Map("a" -> 1, "b" -> 1))
    assert(MultiTxn.latestTxn(root) == 2)
    assert(MultiTxn.read(spark, root, "a").count() == 2)
    assert(MultiTxn.read(spark, root, "b").count() == 7)
  }

  test("table names that would escape the root or corrupt the record JSON are refused") {
    val root = freshRoot()
    for (bad <- Seq("../elsewhere", "a\",\"b\":9", "", "_txnlog", "a/b"))
      intercept[IllegalArgumentException] {
        MultiTxn.commit(root, Seq(Write(bad, rows(1, "x"))))
      }
    // nothing staged, nothing published
    assert(MultiTxn.latestTxn(root) == 0)
  }

  test("reading an unenrolled table refuses") {
    val root = freshRoot()
    MultiTxn.commit(root, Seq(Write("a", rows(1, "x"))))
    intercept[IllegalArgumentException] {
      MultiTxn.read(spark, root, "nope")
    }
  }
}
