package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom physical operator: broadcast RANGE-LOOKUP join.
  *
  * The reference's interval joins probe a tiny interval table (64 discount
  * windows, 13_InsertSalesAndOrders.sql:43) with a date per fact row.
  * Spark plans `fact JOIN dims ON d BETWEEN lo AND hi` as a broadcast
  * nested-loop join — O(|intervals|) comparisons per probe row. This
  * operator sorts the collected interval side by `lo` once and
  * binary-searches per probe row, scanning back only while a prefix-max of
  * `hi` can still cover the probe: O(log n + matches) per row.
  *
  * Integration is strategy-only — users declare the ordinary join; the
  * planner swaps the physical operator when the shape matches. No custom
  * logical node, no API change: exactly how Catalyst extensions are meant
  * to slot in (SparkSessionExtensions.injectPlannerStrategy via
  * [[GraftExtensions]], or runtime [[RangeLookupJoin.install]]).
  */
case class RangeLookupJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    probe: Expression,
    lo: Expression,
    hi: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def doExecute(): RDD[InternalRow] = {
    val ordering = TypeUtils.getInterpretedOrdering(probe.dataType)

    // small side: collect, evaluate bounds once, sort by lo, prefix-max hi
    val rightRows = right.executeCollect()
    val loEval    = BindReferences.bindReference(lo, right.output)
    val hiEval    = BindReferences.bindReference(hi, right.output)
    val intervals = rightRows
      .map(r => (loEval.eval(r), hiEval.eval(r), r))
      .filter(t => t._1 != null && t._2 != null)
      .sortWith((a, b) => ordering.lt(a._1, b._1))
    val prefixMaxHi = new Array[Any](intervals.length)
    var i = 0
    var runningMax: Any = null
    while (i < intervals.length) {
      if (runningMax == null || ordering.gt(intervals(i)._2, runningMax)) runningMax = intervals(i)._2
      prefixMaxHi(i) = runningMax
      i += 1
    }
    val bcIntervals = sparkContext.broadcast((intervals, prefixMaxHi))

    val probeExpr = BindReferences.bindReference(probe, left.output)
    left.execute().mapPartitions { iter =>
      val (ivs, maxHi) = bcIntervals.value
      val joined       = new JoinedRow
      // Parent operators (Sort, Exchange, executeCollect/executeTake) cast
      // emitted rows to UnsafeRow — project every joined row through an
      // UnsafeProjection, exactly as BroadcastNestedLoopJoinExec does. The
      // projection reuses one buffer, which is safe under the standard
      // join-iterator contract (consumer reads/copies before next()).
      val toUnsafe = UnsafeProjection.create(output, output)
      iter.flatMap { lrow =>
        val d = probeExpr.eval(lrow)
        if (d == null || ivs.isEmpty) Iterator.empty
        else {
          // binary search: last interval with lo <= d
          var loIdx = 0
          var hiIdx = ivs.length - 1
          var last  = -1
          while (loIdx <= hiIdx) {
            val mid = (loIdx + hiIdx) >>> 1
            if (ordering.lteq(ivs(mid)._1, d)) { last = mid; loIdx = mid + 1 }
            else hiIdx = mid - 1
          }
          // scan back while some interval in the prefix can still reach d;
          // matches are gathered first and joined lazily on consumption —
          // the shared JoinedRow must not mutate before the consumer reads
          // the current row (standard join-iterator contract).
          var idx = last
          val matches = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          while (idx >= 0 && ordering.gteq(maxHi(idx), d)) {
            if (ordering.gteq(ivs(idx)._2, d)) matches += ivs(idx)._3
            idx -= 1
          }
          matches.iterator.map(rrow => toUnsafe(joined(lrow, rrow)))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: match `left JOIN right ON probe BETWEEN lo AND hi`
  * where probe references only the left side, lo/hi only the (small)
  * right side. */
object RangeLookupJoinStrategy extends SparkStrategy {

  /** Only swap in for genuinely-small interval sides. */
  val MaxRightBytes = 8L * 1024 * 1024

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, Inner, Some(And(GreaterThanOrEqual(p1, lo), LessThanOrEqual(p2, hi))), _)
        if p1.semanticEquals(p2)
          && sideOf(p1, l, r).contains(true)
          && sideOf(lo, l, r).contains(false)
          && sideOf(hi, l, r).contains(false)
          && r.stats.sizeInBytes <= MaxRightBytes =>
      RangeLookupJoinExec(planLater(l), planLater(r), p1, lo, hi) :: Nil
    case _ => Nil
  }
}

object RangeLookupJoin {
  /** Inject the strategy into a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraStrategies
    if (!existing.contains(RangeLookupJoinStrategy)) {
      spark.experimental.extraStrategies = existing :+ RangeLookupJoinStrategy
    }
  }
}
