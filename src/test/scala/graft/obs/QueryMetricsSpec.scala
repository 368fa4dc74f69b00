package graft.obs

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QueryMetricsSpec extends SparkSpec {

  test("listener captures duration, output rows and scan rows per action") {
    val metrics = QueryMetrics.attach(spark)
    try {
      metrics.clear()
      val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      df.collect()
      // QueryExecutionListener events are posted asynchronously
      var tries = 0
      while (metrics.snapshot.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val recs = metrics.snapshot
      assert(recs.nonEmpty, "no metrics captured")
      val r = recs.last
      assert(!r.failed)
      assert(r.durationMs >= 0)
      assert(r.scanRows == 1500L, s"scan rows ${r.scanRows}") // full orders scan
      val json = metrics.toJsonLines
      assert(json.contains("\"scan_rows\":1500"))
    } finally spark.listenerManager.unregister(metrics)
  }
}
