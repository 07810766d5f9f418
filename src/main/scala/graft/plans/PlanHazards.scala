package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{RangeExec, SparkPlan}
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.{ExpandExec, SparkPlan => SP}

/** Typed plan-hazard inventory shared by the [[graft.PlanAudit]] tool
  * and the PlanHazardsSpec regression gate — walks the PHYSICAL plan
  * tree (node identity, not formatted-string substrings, so no
  * tree-vs-details double counting and no "Window (" pattern misses),
  * descending into cached relations, and reports the operators that
  * historically hid real costs in this engine:
  *
  *   - SortAggregate: an aggregate whose buffer is hash-ineligible
  *     (string min/max, struct-max elections) — harmless over natural
  *     grains, a silent sort-the-world when it sits ABOVE an Expand
  *     (the etl_dq_profile round-13 finding: string min/max buffers
  *     pushed a 5× expanded fact through two SortAggregates). That
  *     specific combination is surfaced as [[Hazards.sortAggOverExpand]]
  *     and spec-banned outright;
  *   - Expand: grouping-set/multi-distinct row multiplication;
  *   - CartesianProduct / BroadcastNestedLoopJoin: non-equi joins —
  *     legitimate when one side is provably GRAIN-BOUNDED (an
  *     aggregate, a literal frame, a bounded range/limit: the 1-row
  *     stat-broadcast pattern), a red flag anywhere both sides are
  *     corpus-proportional — surfaced as [[Hazards.unboundedCross]];
  *   - Window: partition-local sorts (informational).
  */
object PlanHazards {

  final case class Hazards(
      sortAgg: Int, expand: Int, cartesian: Int, bnlj: Int, window: Int,
      sortAggOverExpand: Boolean, unboundedCross: Seq[String]) {
    def any: Boolean = sortAgg + expand + cartesian + bnlj > 0
  }

  /** Every node of `p`, descending into the plans cached relations and
    * adaptive wrappers hide (both are childless to `collect`: an
    * InMemoryRelation's cachedPlan is typically an AdaptiveSparkPlanExec
    * whose real tree sits in `inputPlan`). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect { case n => n }
    here ++ here.flatMap {
      case s: InMemoryTableScanExec => allNodes(s.relation.cachedPlan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.inputPlan)
      // a reused exchange is a childless reference to another subtree —
      // without the descent, a broadcast whose ORIGINAL was a bounded
      // local frame reads as an opaque (hence "unbounded") side
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        allNodes(r.child)
      case _ => Nil
    }
  }

  private def isAggregate(n: SparkPlan): Boolean = n match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
    case _ => false
  }

  /** A join side is grain-bounded when its subtree reduces to an
    * aggregate, a literal local frame, or a bounded range — the shapes
    * every legitimate 1-row/stat broadcast in this engine takes. A side
    * that only scans/filters/projects a table is corpus-proportional. */
  private def bounded(side: SparkPlan): Boolean =
    allNodes(side).exists {
      case n if isAggregate(n)    => true
      case _: LocalTableScanExec  => true
      case r: RangeExec           => r.numElements <= BigInt(8192)
      case g: org.apache.spark.sql.execution.GlobalLimitExec => g.limit <= 8192
      // the QueryCap discipline: a deterministic id-ordered top-k is the
      // engine's standard bounded-query-batch shape (sim_*/eval_* ops)
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t.limit <= 8192
      // trained-artifact reads (persisted centroids/codebooks/dicts under
      // Artifacts.Root): sized by model config (K, m×k, top-V), never by
      // the corpus — the eval_* oracles deliberately re-read these from
      // parquet so DuckDB replays identical bytes
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.forall(_.toString.contains(graft.Artifacts.Root))
      case _                      => false
    }

  def of(plan: SparkPlan): Hazards = {
    val nodes = allNodes(plan)
    val sortAggs = nodes.collect { case n: SortAggregateExec => n }
    val crosses: Seq[(String, SparkPlan, SparkPlan)] = nodes.collect {
      case n: CartesianProductExec        => ("CartesianProduct", n.left, n.right)
      case n: BroadcastNestedLoopJoinExec => ("BroadcastNestedLoopJoin", n.left, n.right)
    }
    Hazards(
      sortAgg = sortAggs.size,
      expand = nodes.count(_.isInstanceOf[ExpandExec]),
      cartesian = nodes.count(_.isInstanceOf[CartesianProductExec]),
      bnlj = nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      window = nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      sortAggOverExpand = sortAggs.exists(sa => sa.exists(_.isInstanceOf[ExpandExec])),
      unboundedCross = crosses.collect {
        case (kind, l, r) if !bounded(l) && !bounded(r) =>
          // leaf inventory per side, so a gate failure names the actual
          // frames instead of an anonymous operator
          def leaves(s: SparkPlan) = allNodes(s).filter(_.children.isEmpty)
            .map(_.nodeName).distinct.mkString("+")
          s"$kind[${leaves(l)} × ${leaves(r)}]"
      })
  }

  /** Hazards of a DataFrame's pre-AQE physical plan (analysis +
    * planning only; nothing executes beyond what the op's own
    * construction already ran). */
  def of(df: DataFrame): Hazards = of(df.queryExecution.sparkPlan)
}
