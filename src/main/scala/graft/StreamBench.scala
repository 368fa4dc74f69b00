package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streaming

/** Streaming throughput probe (not part of the driver bench contract):
  * pushes N synthetic events through the watermarked windowed-count
  * query via MemoryStream and reports end-to-end rows/sec — the
  * micro-batch pipeline cost (state store + shuffle + sink), not source
  * IO. Results recorded in PERF.md.
  */
object StreamBench {
  final case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Ev]
    val counts = Streaming.windowedCounts(input.toDF(), "ts")
    val query = counts.writeStream.format("memory")
      .queryName("sb_counts").outputMode("update").start()
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val batchSize = 50000
    // warmup batch
    input.addData((0 until 1000).map(i =>
      Ev(new Timestamp(base + i * 1000L), "e", 1.0, i % 100L)))
    query.processAllAvailable()

    val t0 = System.nanoTime()
    var sent = 0
    while (sent < n) {
      val m = math.min(batchSize, n - sent)
      input.addData((0 until m).map { i =>
        val j = sent + i
        Ev(new Timestamp(base + (j % 864000) * 100L), "e", 1.0, j % 5000L)
      })
      sent += m
    }
    query.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"stream_rows_per_sec","value":${n / sec}%.0f,"rows":$n,"sec":$sec%.2f}""")
    query.stop()
    spark.stop()
  }
}
