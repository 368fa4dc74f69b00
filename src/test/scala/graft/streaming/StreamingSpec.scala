package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  final case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling-window counts aggregate by hour") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val counts = Streaming.windowedCounts(input.toDF(), "ts")
    val query = counts.writeStream.format("memory")
      .queryName("win_counts").outputMode("update").start()
    try {
      input.addData(
        Ev(ts("2024-01-01 10:05:00"), "click", 1.0, 1L),
        Ev(ts("2024-01-01 10:55:00"), "click", 2.0, 1L),
        Ev(ts("2024-01-01 11:05:00"), "click", 4.0, 2L))
      query.processAllAvailable()
      val rows = spark.table("win_counts")
        .select(col("window.start").cast("string").as("w"), col("n"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", 2L, 3.0),
        ("2024-01-01 11:00:00", 1L, 4.0)))
    } finally query.stop()
  }

  test("streaming hourly rollup equals the batch rollup on real events (kappa parity)") {
    // the same declarative aggregation must give the same answer whether
    // the events arrive as a table or as chronological micro-batches —
    // the property that lets one codebase serve both batch and streaming
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_type"), col("value"), col("user_id"))
    val rows = ev.orderBy("ts", "event_type", "user_id").collect()
      .map(r => Ev(r.getTimestamp(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val input = MemoryStream[Ev]
    val query = Streaming.windowedCounts(input.toDF(), "ts").writeStream
      .format("memory").queryName("parity_counts").outputMode("complete").start()
    try {
      // three chronological chunks: watermark advances between batches but
      // never past data still to come, so nothing is dropped as late
      rows.grouped(rows.length / 3 + 1).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        query.processAllAvailable()
      }
      def keyed(df: org.apache.spark.sql.DataFrame) = df
        .select(col("window.start").cast("string").as("h"), col("event_type"),
          col("n"), col("sum_value"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val streamed = keyed(spark.table("parity_counts"))
      val batch = keyed(ev
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value")))
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, (n, s)) =>
        val (bn, bs) = batch(k)
        assert(n == bn, s"count mismatch at $k")
        // double sums are order-dependent across partitions/micro-batches;
        // parity is exact counts + numerically-equal sums
        assert(math.abs(s - bs) <= 1e-9 * math.max(1.0, math.abs(bs)),
          s"sum mismatch at $k")
      }
    } finally query.stop()
  }

  test("freshness status bands follow the 120-minute SLO") {
    assert(Streaming.freshnessStatus(60) == "ok")
    assert(Streaming.freshnessStatus(120) == "ok")
    assert(Streaming.freshnessStatus(140) == "warning")
    assert(Streaming.freshnessStatus(150) == "warning") // 1.25x boundary
    assert(Streaming.freshnessStatus(151) == "breach")
  }

  test("mapGroupsWithState sessionization counts gap-separated sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = Streaming.sessionize(input.toDF())
    val query = sessions.writeStream.format("memory")
      .queryName("sessions").outputMode("update").start()
    try {
      // user 1: two events close together, then a 2-hour gap -> 2nd session
      input.addData(
        Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
        Ev(ts("2024-01-01 10:10:00"), "view", 1.0, 1L))
      query.processAllAvailable()
      input.addData(Ev(ts("2024-01-01 12:30:00"), "click", 1.0, 1L))
      query.processAllAvailable()
      val last = spark.table("sessions").collect().last
      assert(last.getAs[Long]("n_sessions") == 2L)
      assert(last.getAs[Long]("n_events") == 3L) // state survived across batches
      // a LATE event (before the 12:30 high-water mark) joins the current
      // session without rewinding lastTs...
      input.addData(Ev(ts("2024-01-01 11:00:00"), "view", 1.0, 1L))
      query.processAllAvailable()
      // ...so the next on-time event 5 min after 12:30 must NOT read an
      // inflated gap and fabricate a phantom third session
      input.addData(Ev(ts("2024-01-01 12:35:00"), "click", 1.0, 1L))
      query.processAllAvailable()
      val fin = spark.table("sessions").collect().last
      assert(fin.getAs[Long]("n_sessions") == 2L,
        "late event must not rewind the session high-water mark")
      assert(fin.getAs[Long]("n_events") == 5L)
    } finally query.stop()
  }

  test("file-source csv stream ingests with pinned schema (S1 as stream)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val schema = graft.standards.Sdtm.dmSchema
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/batch1.csv"),
      "STUDYID,SUBJID,ARM,SEX,AGE\nSTUDY001,S1,PLACEBO,M,42\nSTUDY001,S2,ACTIVE,F,55\n")
    val stream = Streaming.csvFileStream(spark, tmp, schema)
    assert(stream.isStreaming)
    val query = stream.writeStream.format("memory")
      .queryName("dm_stream").outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.table("dm_stream").count() == 2)
    } finally query.stop()
  }

  test("streaming dedup drops exact duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val deduped = Streaming.dedupStream(input.toDF(), "ts",
      Seq("user_id", "event_type"))
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    try {
      input.addData(
        Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
        Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L), // exact dup
        Ev(ts("2024-01-01 10:00:00"), "view", 2.0, 1L))
      query.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
      // same key again in a later batch, same ts → still deduped by state
      input.addData(Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 1L))
      query.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
      // at-least-once redelivery with a RESTAMPED ts (still inside the
      // watermark): key-only dedup must drop it too
      input.addData(Ev(ts("2024-01-01 10:05:00"), "click", 1.0, 1L))
      query.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
    } finally query.stop()
  }

  test("stream-stream join attributes purchases to recent views") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = Streaming.streamStreamJoin(
      views.toDF(), purchases.toDF(), "user_id", "ts", windowSecs = 600L)
    val query = joined.writeStream.format("memory")
      .queryName("attributed").outputMode("append").start()
    try {
      views.addData(Ev(ts("2024-01-01 10:00:00"), "view", 0.0, 1L))
      purchases.addData(
        Ev(ts("2024-01-01 10:05:00"), "purchase", 9.0, 1L), // within 10 min
        Ev(ts("2024-01-01 11:00:00"), "purchase", 9.0, 1L)) // too late
      query.processAllAvailable()
      val rows = spark.table("attributed").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("view_k") == 1L)
    } finally query.stop()
  }

  final case class Vs(SUBJID: String, VSTESTCD: String, VSORRES: Double)

  test("foreachBatch bronze writer lands clean rows, quarantines violations") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-bronze-stream")
    val (bronze, quarantine, ckpt) =
      (s"$root/bronze", s"$root/quarantine", s"$root/ckpt")
    val input = MemoryStream[Vs]
    val query = Streaming.bronzeStreamWriter(input.toDF(),
      studyId = "S1", domain = "VS", bronzeRoot = bronze,
      quarantineRoot = quarantine, checkpointDir = ckpt)
    try {
      input.addData(
        Vs("P1", "SYSBP", 120.0),
        Vs(null, "DIABP", 80.0))            // NotNull(SUBJID) violation
      query.processAllAvailable()
      input.addData(
        Vs("P2", "HEARTRATE99", 70.0),      // MaxLength(VSTESTCD, 8) violation
        Vs("P3", "PULSE", 64.0))
      query.processAllAvailable()

      val landed = spark.read.parquet(bronze)
      // partition columns round-trip and only clean rows land
      assert(landed.select("SUBJID").as[String].collect().toSet == Set("P1", "P3"))
      assert(landed.select("study_id").distinct().as[String].collect().toSeq == Seq("S1"))
      assert(landed.select("domain").distinct().as[String].collect().toSeq == Seq("VS"))
      // batch ids are distinct per micro-batch (replay-dedup handle)
      assert(landed.select("batch_id").distinct().count() == 2)

      val dead = spark.read.parquet(quarantine)
      assert(dead.count() == 2)
      assert(dead.select("VSTESTCD").as[String].collect().toSet ==
        Set("DIABP", "HEARTRATE99"))
    } finally query.stop()
  }

  test("AvailableNow catch-up lands a backlog through the streaming path and stops") {
    val root = java.nio.file.Files.createTempDirectory("graft-catchup")
    val src = s"$root/incoming"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$src/day1.csv"),
      "STUDYID,SUBJID,ARM,SEX,AGE\nSTUDY001,S1,PLACEBO,M,42\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$src/day2.csv"),
      "STUDYID,SUBJID,ARM,SEX,AGE\nSTUDY001,S2,ACTIVE,F,55\nSTUDY001,,ACTIVE,F,31\n")
    val stream = Streaming.csvFileStream(spark, src, graft.standards.Sdtm.dmSchema)
    val done = Streaming.bronzeCatchUp(stream, "STUDY001", "DM",
      s"$root/bronze", s"$root/quarantine", s"$root/ckpt")
    assert(done) // AvailableNow terminated on its own after draining
    val landed = spark.read.parquet(s"$root/bronze")
    assert(landed.count() == 2) // null-SUBJID row quarantined
    assert(spark.read.parquet(s"$root/quarantine").count() == 1)
  }

  final case class Chg(subj: Long, arm: String, ts: Timestamp, eid: Long)

  test("streaming SCD2 sink versions the dimension across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-scd2-stream")
    val (dimDir, ckpt) = (s"$root/dim", s"$root/ckpt")
    val input = MemoryStream[Chg]
    val query = Streaming.scd2StreamSink(input.toDF(),
      key = "subj", attrs = Seq("arm"), ts = "ts", tieBreak = "eid",
      dimDir = dimDir, checkpointDir = ckpt)
    try {
      input.addData(
        Chg(1L, "trial_a", ts("2024-01-01 00:00:00"), 1L),
        Chg(2L, "trial_a", ts("2024-01-02 00:00:00"), 2L))
      query.processAllAvailable()
      val v1 = Streaming.readCurrentDim(spark, dimDir).get
      assert(v1.count() == 2)
      assert(v1.filter(col("is_current")).count() == 2)

      input.addData(
        Chg(1L, "trial_b", ts("2024-02-01 00:00:00"), 3L), // real change
        Chg(2L, "trial_a", ts("2024-02-02 00:00:00"), 4L)) // no-op state replay
      query.processAllAvailable()
      val v2 = Streaming.readCurrentDim(spark, dimDir).get
      assert(v2.count() == 3) // subj 1 gains a version, subj 2 does not
      val s1 = v2.filter(col("subj") === 1L).orderBy("valid_from")
        .select("arm", "is_current").as[(String, Boolean)].collect().toSeq
      assert(s1 == Seq(("trial_a", false), ("trial_b", true)))
    } finally query.stop()
  }
}
