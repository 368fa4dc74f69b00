package graft

import org.apache.spark.sql.SparkSession
import graft.obs.ShuffleAudit

/** Plan-audit diagnostic (builder tooling, not part of the driver
  * contract): prints the formatted physical plan of one or more declared
  * queries plus a measured ShuffleAudit row for each — the raw material
  * for PERF.md's plan table.
  *
  * Usage: runMain graft.Explain <queryName>[,<queryName>…] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      println(s"\n================ $name @ $sfDir ================")
      val df = fn(spark, sfDir)
      df.explain("formatted")
      // warmup, then audited run — steady-state shuffle volume, not
      // first-run footer/codegen noise
      df.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      val (_, audit) = ShuffleAudit.measure(spark) {
        df.write.format("noop").mode("overwrite").save()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[audit] $name: ${sec}%.2f s, " +
        f"shuffleRead=${audit.shuffleReadBytes / 1024.0 / 1024.0}%.2f MB, " +
        f"shuffleWrite=${audit.shuffleWriteBytes / 1024.0 / 1024.0}%.2f MB, " +
        f"memSpill=${audit.memorySpillBytes}, diskSpill=${audit.diskSpillBytes}, " +
        f"tasks=${audit.tasks}")
    }
    spark.stop()
  }
}
