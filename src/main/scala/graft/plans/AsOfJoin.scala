package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator as-of join as a first-class Catalyst citizen (SURVEY
  * §2.11 preference order, tier (c): custom `LogicalPlan` + `SparkStrategy`
  * + `SparkPlan`).
  *
  * The composed formulation (`TimeJoins.asofJoinBackward`: union + one
  * window pass) costs a full shuffle+sort of BOTH sides on the key. When
  * the right side is broadcast-small — the common "attach latest dimension
  * state / last prior event" shape — that shuffle is pure waste: this
  * operator broadcasts the right side through Spark's own
  * `BroadcastExchange` (so it shows up in the UI / AQE like any broadcast
  * join), builds one sorted per-key timeline per executor, and probes it
  * with a binary search per left row. The left (fact) side is never
  * shuffled and keeps its partitioning, exactly like `BroadcastHashJoin`.
  *
  * Semantics (match `asofJoinBackward` and DuckDB `ASOF JOIN` with
  * `r.ts <= l.ts`): for each left row, the right row with equal key and
  * the greatest ts ≤ left ts; ties on ts resolved to the greatest
  * `tieBreak`; left rows with no match are dropped (inner). Right rows
  * with a null key, ts, or value are excluded from the build, mirroring
  * `last(value, ignoreNulls = true)` in the window formulation.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightValue: Attribute,
    rightTieBreak: Attribute,
    asofValue: AttributeReference,
    asofTs: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ asofValue :+ asofTs

  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(asofValue, asofTs))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinPlan → BroadcastAsOfJoinExec. Injected via
  * `GraftExtensions` (spark.sql.extensions) or lazily through
  * `TimeJoins.asofJoinBroadcast`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      BroadcastAsOfJoinExec(j.leftKey, j.rightKey, j.leftTs, j.rightTs,
        j.rightValue, j.rightTieBreak, j.asofValue, j.asofTs,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join, broadcast build side.
  *
  * Build (once per executor, from the broadcast rows): per-key arrays of
  * (ts, tieBreak, value) sorted by (ts, tieBreak). Probe: per left row,
  * upper-bound binary search for the last entry with ts ≤ left ts —
  * O(log m) per row, no shuffle, no sort of the probe side.
  */
case class BroadcastAsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightValue: Attribute,
    rightTieBreak: Attribute,
    asofValue: AttributeReference,
    asofTs: AttributeReference,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofValue :+ asofTs

  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(asofValue, asofTs))

  /** Left stays wherever it is; right must arrive as one broadcast array
    * of rows — EnsureRequirements inserts the BroadcastExchange. */
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

  private def tsLong(row: InternalRow, i: Int): Long = row.getLong(i)

  override protected def doExecute(): RDD[InternalRow] = {
    require(leftTs.dataType == TimestampType || leftTs.dataType == LongType,
      s"as-of ts must be TIMESTAMP or BIGINT, got ${leftTs.dataType}")
    val numOutputRows = longMetric("numOutputRows")
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()

    val rKeyIdx = ordinal(right.output, rightKey)
    val rTsIdx = ordinal(right.output, rightTs)
    val rValIdx = ordinal(right.output, rightValue)
    val rTbIdx = ordinal(right.output, rightTieBreak)
    val lKeyIdx = ordinal(left.output, leftKey)
    val lTsIdx = ordinal(left.output, leftTs)
    val keyType = rightKey.dataType
    val valType = rightValue.dataType
    val tbType = rightTieBreak.dataType
    val outTypes = output.map(_.dataType).toArray

    left.execute().mapPartitions({ iter =>
      // Build the per-key timelines from the broadcast array. Built once
      // per task but shared rows live in the broadcast block; the index
      // itself is small (right side is broadcast-small by contract).
      val tbOrd = TypeUtils.getInterpretedOrdering(tbType)
      val index = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[(Long, Any, Any)]]()
      broadcastRows.value.foreach { row =>
        if (!row.isNullAt(rKeyIdx) && !row.isNullAt(rTsIdx) && !row.isNullAt(rValIdx)) {
          val k = row.get(rKeyIdx, keyType)
          val buf = index.computeIfAbsent(k,
            _ => scala.collection.mutable.ArrayBuffer.empty[(Long, Any, Any)])
          buf += ((tsLong(row, rTsIdx), row.get(rTbIdx, tbType), row.get(rValIdx, valType)))
        }
      }
      val sorted = new java.util.HashMap[Any, (Array[Long], Array[Any])]()
      index.forEach { (k, buf) =>
        val arr = buf.sortInPlace()(Ordering.Tuple2(Ordering.Long, tbOrd.asInstanceOf[Ordering[Any]]).on[(Long, Any, Any)](t => (t._1, t._2)))
        sorted.put(k, (arr.map(_._1).toArray, arr.map(_._3).toArray[Any]))
      }

      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow()
      val attach = new GenericInternalRow(2)
      iter.flatMap { lrow =>
        if (lrow.isNullAt(lKeyIdx) || lrow.isNullAt(lTsIdx)) Iterator.empty
        else {
          val timeline = sorted.get(lrow.get(lKeyIdx, keyType))
          if (timeline == null) Iterator.empty
          else {
            val (tss, vals) = timeline
            val t = tsLong(lrow, lTsIdx)
            // upper bound: last index with tss(i) <= t
            var lo = 0; var hi = tss.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tss(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ans < 0) Iterator.empty
            else {
              attach.update(0, vals(ans))
              attach.update(1, tss(ans))
              numOutputRows += 1
              Iterator.single(proj(joined(lrow, attach)))
            }
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
