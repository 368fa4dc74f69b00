package graft.streaming

import graft.SparkSpec
import graft.queries.{EventQueries, PrivacyMiscQueries, StreamingQueries}
import org.apache.spark.sql.functions._

/** The declared streaming-gate queries (st1–st3) must be exactly
  * batch-equivalent: a REAL file-source micro-batch execution with
  * watermarks, checkpoint, and AvailableNow produces the same table as the
  * declarative batch twin. The DuckDB oracle proves the same thing against
  * an independent engine; this spec pins it inside sbt where it can run on
  * every build.
  */
class StreamingGateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(fam: Seq[graft.queries.Q], name: String) =
    fam.find(_.name == name).get.run(spark, sf)

  test("st1 streaming hourly rollup equals the e1 batch rollup") {
    val streamed = q(StreamingQueries.all, "st1_stream_hourly_rollup").collect()
    val batch = q(EventQueries.all, "e1_hourly_rollup").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("st2 streaming session_window equals the e8 batch session_window") {
    val streamed = q(StreamingQueries.all, "st2_stream_session_window").collect()
    val batch = q(PrivacyMiscQueries.all, "e8_session_window").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("st4 stream-stream attribution join equals the batch self-join") {
    val streamed = q(StreamingQueries.all, "st4_stream_attribution_join").collect()
    val ev = graft.io.Tables.events(spark, sf)
    val v = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("view_event"), col("ts").as("vts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event"), col("ts").as("pts"))
    val batch = v.join(p, Seq("user_id"))
      .filter(col("pts") >= col("vts") &&
        col("pts") <= col("vts") + expr("interval 3600 seconds"))
      .select(col("user_id"), col("view_event"), col("purchase_event"),
        date_format(col("vts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format(col("pts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
      .orderBy("view_event", "purchase_event").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("st5 stream-static enrichment equals the batch join + daily rollup") {
    val streamed = q(StreamingQueries.all, "st5_stream_static_enrichment").collect()
    val ev = graft.io.Tables.events(spark, sf).filter(col("event_type") === "purchase")
    val dim = graft.io.Tables.customer(spark, sf)
      .join(graft.io.Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("n_name").as("nation"))
    val batch = ev.join(dim, "user_id")
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("nation"))
      .agg(count(lit(1)).as("n_purchases"),
        graft.queries.Q.dsum(col("value"), 6).as("sum_value"))
      .orderBy("day", "nation").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("warm checkpoint resume is exactly-once: a re-run appends nothing " +
      "and returns the identical table") {
    // first invocation in this (session, sink) replays the full history;
    // the second resumes the committed checkpoint, finds no new files,
    // and must leave the sink byte-identical — a duplicate-appending
    // restart would change the row multiset here (and the Verify hash)
    val r1 = q(StreamingQueries.all, "st1_stream_hourly_rollup").collect()
    val r2 = q(StreamingQueries.all, "st1_stream_hourly_rollup").collect()
    assert(r1.nonEmpty)
    assert(r1.toSeq == r2.toSeq)
  }

  test("st3 streaming dedup equals global DISTINCT on the digest") {
    val streamed = q(StreamingQueries.all, "st3_stream_dedup").collect()
    val batch = graft.io.Tables.documents(spark, sf)
      .select(md5(col("text").cast("binary")).as("digest"))
      .distinct().orderBy("digest").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }
}
