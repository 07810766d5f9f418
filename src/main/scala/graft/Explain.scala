package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: prints `.explain("formatted")` for the named queries
  * (or a representative default set) so partition pruning, filter
  * pushdown, broadcast choices, and whole-stage-codegen spans can be
  * reviewed.
  *
  * Usage: runMain graft.Explain [sfDir] [key ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val keys  = if (args.length > 1) args.drop(1).toSeq
                else Seq("q1_genre_sales", "join_inner_equi", "filter_basic", "sim_cosine_topk", "dedup_minhash_lsh")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach {
      case "year_rule_demo" =>
        // graft.plans.YearPredicateRewrite before/after: the year() filter
        // becomes a pushed scan range once the rule is installed.
        import org.apache.spark.sql.functions.{col, year}
        val orders = Tables(spark, sfDir).orders
        println("\n========== year_rule_demo (rule OFF) ==========")
        orders.filter(year(col("o_orderdate")).between(1995, 1996)).explain("formatted")
        graft.plans.YearPredicateRewrite.install(spark)
        println("\n========== year_rule_demo (rule ON) ==========")
        orders.filter(year(col("o_orderdate")).between(1995, 1996)).explain("formatted")
      case k =>
        println(s"\n========== $k ==========")
        SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
