package graft

import org.apache.spark.sql.SparkSession

/** Plan-hazard inventory: builds every registered query's physical plan
  * (analysis + planning only — nothing executes beyond what op
  * construction itself runs) and reports the operators that
  * historically hid real costs in this engine, via the TYPED tree walk
  * in [[graft.plans.PlanHazards]] (node identity, not formatted-string
  * substrings — the r13 version double-counted tree+details sections
  * and missed some Window renderings). The same walker backs the
  * PlanHazardsSpec regression gate: `sbt test` fails outright if any
  * query reintroduces SortAggregate-over-Expand (the etl_dq_profile
  * round-13 pathology) or an unbounded cross join; this tool remains
  * for eyeballing the full inventory.
  *
  * Usage: runMain graft.PlanAudit [sfDir] — prints one line per query
  * that contains any hazard.
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
        val h = graft.plans.PlanHazards.of(df)
        if (h.any) {
          val flags = (if (h.sortAggOverExpand) " !!SORTAGG-OVER-EXPAND" else "") +
            (if (h.unboundedCross.nonEmpty) s" !!UNBOUNDED-CROSS(${h.unboundedCross.mkString(",")})" else "")
          println(f"[audit] $k%-36s SortAgg=${h.sortAgg} Expand=${h.expand} " +
            f"Cartesian=${h.cartesian} BNLJ=${h.bnlj} Window=${h.window}$flags")
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      } catch {
        case e: Throwable => println(s"[audit] $k PLAN-ERROR: ${e.toString.take(100)}")
      }
    }
    spark.stop()
  }
}
