package graft.ops

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("merge: update wins wholesale (even nulls), inserts new, keeps rest") {
    val target = Seq(
      (1L, Option("a"), Option(10.0)),
      (2L, Option("b"), Option(20.0)),
      (3L, Option("c"), Option(30.0))).toDF("k", "s", "v")
    val updates = Seq(
      (2L, Option("B"), Option.empty[Double]), // matched: null v must WIN
      (4L, Option("d"), Option(40.0)))         // new key: insert
      .toDF("k", "s", "v")
    val got = Upsert.merge(target, updates, "k")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toSet
    assert(got == Set(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("B"), None),       // update's null overwrote 20.0
      (3L, Some("c"), Some(30.0)),
      (4L, Some("d"), Some(40.0))))
  }

  test("merge rejects mismatched schemas") {
    val t = Seq((1L, "a")).toDF("k", "s")
    val u = Seq((1L, "a", 1.0)).toDF("k", "s", "v")
    intercept[IllegalArgumentException] { Upsert.merge(t, u, "k") }
  }

  test("property: merge matches a driver-side map merge on random frames") {
    val rnd = new scala.util.Random(7L)
    (1 to 3).foreach { _ =>
      val target = (1L to 300L).map(k => (k, s"t$k", rnd.nextInt(1000).toDouble))
      val updates = rnd.shuffle((1L to 400L).toList).take(150)
        .map(k => (k, s"u$k", rnd.nextInt(1000).toDouble))
      val expected = (target.map(r => r._1 -> r).toMap ++
        updates.map(r => r._1 -> r).toMap).values.toSet
      val got = Upsert.merge(
          target.toDF("k", "s", "v"), updates.toDF("k", "s", "v"), "k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == expected)
    }
  }

  test("merge is idempotent for identical updates") {
    val t = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val u = Seq((2L, "B")).toDF("k", "s")
    val once = Upsert.merge(t, u, "k")
    val twice = Upsert.merge(once, u, "k")
    assert(once.exceptAll(twice).count() == 0)
    assert(twice.exceptAll(once).count() == 0)
  }

  test("latestPerKey reduces a CDC batch to last-write-wins before merge") {
    val batch = Seq(
      (1L, 100L, 1L, "old"), (1L, 200L, 1L, "new"),
      (2L, 100L, 1L, "a"), (2L, 100L, 2L, "b"), // ts tie -> tieBreak wins
      (3L, 50L, 1L, "only")
    ).toDF("k", "ts", "op_id", "v")
    val latest = Upsert.latestPerKey(batch, "k", "ts", "op_id")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(latest == Set((1L, "new"), (2L, "b"), (3L, "only")))
    // composed with merge: target keys stay unique
    val t = Seq((1L, 0L, 0L, "t1"), (9L, 0L, 0L, "t9")).toDF("k", "ts", "op_id", "v")
    val merged = Upsert.merge(t,
      Upsert.latestPerKey(batch, "k", "ts", "op_id"), "k")
    assert(merged.count() == 4)
    assert(merged.select("k").distinct().count() == 4)
  }
}
