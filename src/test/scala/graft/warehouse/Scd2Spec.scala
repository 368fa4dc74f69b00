package graft.warehouse

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val history = Seq(
    (1L, "trial_a", ts("2024-01-01 00:00:00"), 10L),
    (1L, "trial_a", ts("2024-01-05 00:00:00"), 11L), // unchanged → same run
    (1L, "trial_b", ts("2024-02-01 00:00:00"), 12L), // change → v2
    (1L, "trial_a", ts("2024-03-01 00:00:00"), 13L), // back to a → v3 (not merged with v1)
    (2L, "trial_a", ts("2024-01-02 00:00:00"), 20L))
    .toDF("subj", "arm", "ts", "eid")

  test("fromHistory collapses runs into [valid_from, valid_to) versions") {
    val dim = Scd2.fromHistory(history, "subj", Seq("arm"), "ts", "eid")
      .orderBy("subj", "valid_from")
      .select("subj", "arm", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getBoolean(4)))
    assert(dim.toSeq == Seq(
      (1L, "trial_a", ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"), false),
      (1L, "trial_b", ts("2024-02-01 00:00:00"), ts("2024-03-01 00:00:00"), false),
      (1L, "trial_a", ts("2024-03-01 00:00:00"), null, true),
      (2L, "trial_a", ts("2024-01-02 00:00:00"), null, true)))
  }

  test("versions per key tile the timeline: valid_to == next valid_from") {
    val dim = Scd2.fromHistory(history, "subj", Seq("arm"), "ts", "eid")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("subj").orderBy("valid_from")
    val gaps = dim.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
    assert(gaps.count() == 0)
    // exactly one open version per key
    val open = dim.filter(col("is_current")).groupBy("subj").count()
      .filter(col("count") =!= 1)
    assert(open.count() == 0)
  }

  test("merge is idempotent and only opens a version on real change") {
    val dim = Scd2.fromHistory(history, "subj", Seq("arm"), "ts", "eid")
    // replaying an already-known state at a later ts: no new version
    val replay = Seq((1L, "trial_a", ts("2024-04-01 00:00:00"), 14L))
      .toDF("subj", "arm", "ts", "eid")
    val afterReplay = Scd2.merge(dim, replay, "subj", Seq("arm"), "ts", "eid")
    assert(afterReplay.count() == dim.count())
    // a real change closes the open version and opens a new one
    val change = Seq((2L, "trial_c", ts("2024-05-01 00:00:00"), 21L))
      .toDF("subj", "arm", "ts", "eid")
    val afterChange = Scd2.merge(dim, change, "subj", Seq("arm"), "ts", "eid")
    assert(afterChange.count() == dim.count() + 1)
    val subj2 = afterChange.filter(col("subj") === 2L)
      .orderBy("valid_from")
      .select("arm", "is_current").as[(String, Boolean)].collect().toSeq
    assert(subj2 == Seq(("trial_a", false), ("trial_c", true)))
  }

  test("property: generated histories match a driver-side reference fold") {
    // driver-side ground truth: sort per key, collapse runs, tile timeline
    def reference(rows: Seq[(Long, String, Long)]): Set[(Long, String, Long, Option[Long])] =
      rows.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.sortBy(r => (r._3, r._2)).map(r => (r._2, r._3))
        val runs = sorted.foldLeft(Vector.empty[(String, Long)]) { (acc, cur) =>
          if (acc.nonEmpty && acc.last._1 == cur._1) acc else acc :+ cur
        }
        runs.zipWithIndex.map { case ((arm, vf), i) =>
          (k, arm, vf, runs.lift(i + 1).map(_._2))
        }
      }.toSet

    val rnd = new scala.util.Random(20260812L)
    (1 to 4).foreach { _ =>
      // distinct ts per key (the data contract) via shuffled day offsets;
      // tieBreak = ts itself keeps the reference's (ts) order unambiguous
      val rows = (1L to 5L).flatMap { k =>
        rnd.shuffle((1 to 20).toList).take(rnd.nextInt(15) + 3)
          .map(d => (k, s"arm_${rnd.nextInt(3)}", d.toLong * 86400))
      }
      val df = rows.toDF("subj", "arm", "sec")
      val got = Scd2.fromHistory(df, "subj", Seq("arm"), "sec", "sec")
        .collect().map { r =>
          (r.getAs[Long]("subj"), r.getAs[String]("arm"),
            r.getAs[Long]("valid_from"),
            Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong))
        }.toSet
      assert(got == reference(rows))
    }
  }

  test("null-safe attribute comparison: null runs collapse") {
    val h = Seq(
      (1L, Option.empty[String], ts("2024-01-01 00:00:00"), 1L),
      (1L, Option.empty[String], ts("2024-01-02 00:00:00"), 2L),
      (1L, Option("x"), ts("2024-01-03 00:00:00"), 3L))
      .toDF("subj", "arm", "ts", "eid")
    val dim = Scd2.fromHistory(h, "subj", Seq("arm"), "ts", "eid")
    assert(dim.count() == 2)
  }
}
