package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The PlanAudit inventory promoted to a regression GATE (VERDICT r13
  * #5): every registered query's physical plan is walked with the
  * typed [[PlanHazards]] detector and two hazards fail the build
  * outright —
  *
  *   1. SortAggregate above an Expand: the sort-the-multiplied-world
  *      pathology (etl_dq_profile burned 2.3 s on it in r13 — string
  *      min/max buffers are HashAggregate-ineligible, and a 5× Expand
  *      beneath means the sort runs over five copies of the fact);
  *   2. a CartesianProduct / BroadcastNestedLoopJoin where NEITHER side
  *      is grain-bounded (no aggregate / literal / bounded-limit in the
  *      subtree): the only legitimate cross joins in this engine
  *      broadcast 1-row stat frames or literal bounds.
  *
  * Poisoned-plan self-checks build each pathology deliberately and
  * assert the detector fires — so a silent detector regression cannot
  * green-light the gate (the PlanQualitySpec discipline). */
class PlanHazardsSpec extends SparkSuite {

  test("poisoned plan: the detector fires on SortAggregate over Expand") {
    // count(DISTINCT x) + string min/max over grouping sets: the exact
    // shape that planned etl_dq_profile into SortAggregate-over-Expand
    val df = spark.range(100)
      .select(col("id"), (col("id") % 7).as("g"), concat(lit("s"), col("id")).as("s"))
      .cube(col("g"))
      .agg(countDistinct(col("id")).as("nd"), min(col("s")).as("lo"), max(col("s")).as("hi"))
    val h = PlanHazards.of(df)
    assert(h.sortAgg > 0 && h.expand > 0, s"poison plan did not produce the shape: $h")
    assert(h.sortAggOverExpand, "detector must flag SortAggregate above Expand")
  }

  test("poisoned plan: the detector fires on an unbounded cross join") {
    val a = spark.range(1000000).toDF("x")
    val b = spark.range(1000000).toDF("y")
    val h = PlanHazards.of(a.crossJoin(b))
    assert(h.cartesian + h.bnlj > 0)
    assert(h.unboundedCross.nonEmpty, "detector must flag a corpus×corpus cross join")
    // and the SAFE shape stays quiet: crossing a 1-row aggregate frame
    val safe = PlanHazards.of(a.crossJoin(broadcast(b.agg(sum(col("y")).as("t")))))
    assert(safe.unboundedCross.isEmpty, "a grain-bounded stat broadcast is legitimate")
  }

  test("no registered query plans SortAggregate over Expand or an unbounded cross join") {
    // build EVERY query's physical plan at spec scale; collect failures
    // so one bad plan reports alongside the rest, not instead of them
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val h = PlanHazards.of(fn(spark, sf001))
        if (h.sortAggOverExpand) bad += s"$name: SortAggregate over Expand"
        if (h.unboundedCross.nonEmpty)
          bad += s"$name: unbounded ${h.unboundedCross.mkString(",")}"
      } catch {
        case e: Throwable => bad += s"$name: PLAN-ERROR ${e.toString.take(80)}"
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    assert(bad.isEmpty, s"plan hazards reintroduced:\n  ${bad.mkString("\n  ")}")
  }
}
