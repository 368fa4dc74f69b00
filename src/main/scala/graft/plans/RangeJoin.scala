package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** Whole-operator bounded time-range join, broadcast build side — the
  * sibling of [[AsOfJoinPlan]]/[[BroadcastAsOfJoinExec]] (same extension
  * tier, different match shape: MULTIPLE matches per probe row).
  *
  * Semantics match `TimeJoins.rangeJoinBucketed` before its distinct:
  * for each left row (key, aSec), every right row with equal key and
  * bSec ∈ (aSec, aSec + windowSecs]. The composed formulation explodes
  * each right row into two coarse buckets and shuffles BOTH sides; when
  * the right side is broadcast-small this operator does one binary
  * search per probe row over per-key sorted second arrays and the left
  * side never moves.
  *
  * Interpreted execution only, by design: the single-match codegen
  * pattern is demonstrated by [[BroadcastAsOfJoinExec]]; the multi-match
  * loop adds codegen complexity without a new lesson, so this operator
  * stays on the iterator path (still vectorized-scan fed, still
  * shuffle-free).
  */
case class RangeJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftSec: Attribute,
    rightSec: Attribute,
    windowSecs: Long,
    bSecOut: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ bSecOut

  override def producedAttributes: AttributeSet = AttributeSet(Seq(bSecOut))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: RangeJoinPlan =>
      BroadcastRangeJoinExec(j.leftKey, j.rightKey, j.leftSec, j.rightSec,
        j.windowSecs, j.bSecOut, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Per-key sorted epoch-second timelines with range search. */
final class RangeIndex(
    ranges: java.util.HashMap[Any, Array[Int]], secs: Array[Long]) {

  /** First slot for `key` with sec > `lo`, or -1 if none in range. */
  def lowerBound(key: AnyRef, lo: Long): Int = {
    val r = ranges.get(key)
    if (r == null) return -1
    var a = r(0); var b = r(1) - 1; var ans = -1
    while (a <= b) {
      val mid = (a + b) >>> 1
      if (secs(mid) > lo) { ans = mid; b = mid - 1 } else a = mid + 1
    }
    ans
  }
  def endOf(key: AnyRef): Int = {
    val r = ranges.get(key)
    if (r == null) -1 else r(1)
  }
  def sec(slot: Int): Long = secs(slot)
}

case class BroadcastRangeJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftSec: Attribute,
    rightSec: Attribute,
    windowSecs: Long,
    bSecOut: AttributeReference,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ bSecOut

  override def producedAttributes: AttributeSet = AttributeSet(Seq(bSecOut))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  private def ordinal(attrs: Seq[Attribute], a: Attribute): Int = {
    val i = attrs.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"attribute $a not found in ${attrs.mkString(",")}")
    i
  }

  /** Same contract as [[BroadcastAsOfJoinExec]]: boxed-key hash lookups
    * and raw-long second comparisons require exact type agreement, or the
    * join silently returns empty instead of failing. */
  private def validateTypes(): Unit = {
    require(leftKey.dataType == rightKey.dataType,
      s"range-join key types must match: ${leftKey.dataType} vs ${rightKey.dataType}")
    Seq(leftSec, rightSec).foreach { a =>
      require(a.dataType == LongType,
        s"range-join epoch-second column must be BIGINT, got ${a.dataType} (${a.name})")
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    validateTypes()
    val numOutputRows = longMetric("numOutputRows")
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val rKeyIdx = ordinal(right.output, rightKey)
    val rSecIdx = ordinal(right.output, rightSec)
    val lKeyIdx = ordinal(left.output, leftKey)
    val lSecIdx = ordinal(left.output, leftSec)
    val keyType = rightKey.dataType
    val outTypes = output.map(_.dataType).toArray
    val window = windowSecs

    left.execute().mapPartitions({ iter =>
      val byKey = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[Long]]()
      broadcastRows.value.foreach { row =>
        if (!row.isNullAt(rKeyIdx) && !row.isNullAt(rSecIdx)) {
          byKey.computeIfAbsent(row.get(rKeyIdx, keyType),
            _ => scala.collection.mutable.ArrayBuffer.empty[Long]) += row.getLong(rSecIdx)
        }
      }
      var total = 0
      byKey.forEach((_, b) => total += b.length)
      val secs = new Array[Long](total)
      val ranges = new java.util.HashMap[Any, Array[Int]](byKey.size * 2)
      var pos = 0
      byKey.forEach { (k, buf) =>
        val start = pos
        buf.sortInPlace().foreach { s => secs(pos) = s; pos += 1 }
        ranges.put(k, Array(start, pos))
      }
      val index = new RangeIndex(ranges, secs)

      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow()
      val attach = new GenericInternalRow(1)
      iter.flatMap { lrow =>
        if (lrow.isNullAt(lKeyIdx) || lrow.isNullAt(lSecIdx)) Iterator.empty
        else {
          val key = lrow.get(lKeyIdx, keyType).asInstanceOf[AnyRef]
          val aSec = lrow.getLong(lSecIdx)
          val start = index.lowerBound(key, aSec)
          if (start < 0) Iterator.empty
          else {
            val end = index.endOf(key)
            Iterator.range(start, end)
              .takeWhile(i => index.sec(i) - aSec <= window)
              .map { i =>
                attach.update(0, index.sec(i))
                numOutputRows += 1
                proj(joined(lrow, attach))
              }
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)
}
