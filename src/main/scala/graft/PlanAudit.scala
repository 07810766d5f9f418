package graft

import org.apache.spark.sql.SparkSession

/** Plan-hazard inventory: builds every registered query's physical plan
  * (analysis only — nothing executes) and reports the operators that
  * historically hid real costs in this engine:
  *
  *   - SortAggregate: an aggregate whose buffer is hash-ineligible
  *     (string min/max, struct-max elections) — harmless over small
  *     frames, a silent sort-the-world when it lands above an Expand
  *     (the etl_dq_profile round-13 finding: string min/max buffers
  *     pushed a 5× expanded fact through two SortAggregates);
  *   - Expand: grouping-set/multi-distinct row multiplication;
  *   - CartesianProduct / BroadcastNestedLoopJoin: non-equi joins —
  *     legitimate for 1-row scalar broadcasts and bounded frames, a
  *     red flag anywhere corpus-proportional;
  *   - Window: partition-local sorts.
  *
  * Counts are raw substring occurrences in the formatted plan (each
  * operator appears in both the tree and the details section, so read
  * them as ~2× the operator count). Usage: runMain graft.PlanAudit
  * [sfDir] — prints one line per query that contains any hazard.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", graft.Artifacts.Root + "/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = graft.SparkEntry.queries.keys.toSeq.sorted
    keys.foreach { k =>
      try {
        val df = graft.SparkEntry.queries(k)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        def c(tok: String) = plan.sliding(tok.length).count(_ == tok)
        val sa = c("SortAggregate")
        val ex = c("Expand")
        val cart = c("CartesianProduct")
        val bnl = c("BroadcastNestedLoopJoin")
        val win = c("Window (") + c("Window(")
        if (sa + ex + cart + bnl > 0)
          println(f"[audit] $k%-36s SortAgg=$sa Expand=$ex Cartesian=$cart BNLJ=$bnl Window=$win")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      } catch {
        case e: Throwable => println(s"[audit] $k PLAN-ERROR: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
