package graft.obs

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability: per-query execution metrics via a
  * `QueryExecutionListener` (the engine twin of the reference's pipeline
  * metrics + structured logging demo, `src/pipelines/base.py`,
  * `logging_utils.py`). Collects name, wall duration, output rows, scan
  * rows and shuffle bytes from the executed plan's SQL metrics — the
  * numbers a 1000-executor deployment exports to its metrics backend.
  */
final class QueryMetrics extends QueryExecutionListener {

  final case class Record(
      name: String, durationMs: Long, outputRows: Long,
      scanRows: Long, shuffleBytesWritten: Long, failed: Boolean)

  private val records = new ConcurrentLinkedQueue[Record]()

  /** Flatten the executed plan, unwrapping AQE containers (their
    * re-planned subtrees are not `children`, so plain foreach misses
    * them). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: QueryStageExec => q +: allNodes(q.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  private def metricSum(qe: QueryExecution, nodeFilter: String => Boolean,
      metricName: String): Long =
    allNodes(qe.executedPlan)
      .filter(n => nodeFilter(n.nodeName))
      .flatMap(_.metrics.get(metricName))
      .map(_.value).sum

  /** numOutputRows of the first node (root-down) that carries one — the
    * ROOT executedPlan is an AQE wrapper (or WholeStageCodegen) with no
    * such metric, so reading it directly would always report 0. */
  private def rootOutputRows(qe: QueryExecution): Long =
    allNodes(qe.executedPlan)
      .flatMap(_.metrics.get("numOutputRows"))
      .headOption.map(_.value).getOrElse(0L)

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    records.add(Record(
      name = funcName,
      durationMs = durationNs / 1000000L,
      outputRows = rootOutputRows(qe),
      scanRows = metricSum(qe, _.toLowerCase.contains("scan"), "numOutputRows"),
      shuffleBytesWritten = metricSum(qe, _.contains("Exchange"), "shuffleBytesWritten"),
      failed = false))

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    records.add(Record(funcName, 0L, 0L, 0L, 0L, failed = true))

  def snapshot: Seq[Record] = records.asScala.toSeq

  def clear(): Unit = records.clear()

  /** One JSON line per record (the reference's metrics-artifact shape). */
  def toJsonLines: String = snapshot.map { r =>
    s"""{"name":"${r.name}","duration_ms":${r.durationMs},""" +
      s""""output_rows":${r.outputRows},"scan_rows":${r.scanRows},""" +
      s""""shuffle_bytes":${r.shuffleBytesWritten},"failed":${r.failed}}"""
  }.mkString("\n")
}

object QueryMetrics {
  /** Attach a collector to the session; returns it for snapshotting. */
  def attach(spark: SparkSession): QueryMetrics = {
    val m = new QueryMetrics
    spark.listenerManager.register(m)
    m
  }
}
