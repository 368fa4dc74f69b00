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

  test("st3 streaming dedup equals global DISTINCT on the digest") {
    val streamed = q(StreamingQueries.all, "st3_stream_dedup").collect()
    val batch = graft.io.Tables.documents(spark, sf)
      .select(md5(col("text").cast("binary")).as("digest"))
      .distinct().orderBy("digest").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }
}
