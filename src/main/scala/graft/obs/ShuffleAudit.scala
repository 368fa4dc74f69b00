package graft.obs

import org.apache.spark.GraftSparkShims
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measured shuffle/spill accounting for one action — "measure, don't
  * guess" for the plan properties PERF.md claims. A broadcast star join
  * should show ~0 shuffle bytes; a fact-to-fact spine join shows the
  * shuffled key+payload volume; partial aggregation shows shuffle volume
  * bounded by groups × partitions, not input rows.
  *
  * Implementation: a task-level SparkListener summing TaskMetrics over
  * exactly the jobs triggered inside `measure`'s thunk (driver-side
  * counters, no executor cost). The listener bus is drained before the
  * totals are read.
  */
object ShuffleAudit {

  final case class Audit(
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      memorySpillBytes: Long,
      diskSpillBytes: Long,
      tasks: Long)

  def measure[A](spark: SparkSession)(action: => A): (A, Audit) = {
    val sc = spark.sparkContext
    var read, write, memSpill, diskSpill, tasks = 0L
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          read += m.shuffleReadMetrics.totalBytesRead
          write += m.shuffleWriteMetrics.bytesWritten
          memSpill += m.memoryBytesSpilled
          diskSpill += m.diskBytesSpilled
          tasks += 1
        }
      }
    }
    sc.addSparkListener(listener)
    try {
      val result = action
      GraftSparkShims.waitUntilListenerBusEmpty(sc)
      (result, Audit(read, write, memSpill, diskSpill, tasks))
    } finally sc.removeSparkListener(listener)
  }
}
