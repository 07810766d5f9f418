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
                else Seq("q1_genre_sales", "join_inner_equi", "filter_basic", "sim_cosine_topk",
                         "dedup_minhash_lsh", "etl_fine_payment_pipeline", "events_funnel", "sim_topk_ivf_kmeans",
                         "join_asof", "io_bucketed_join", "text_tfidf", "join_dpp_prune", "setop_family",
                         "join_bloom_runtime_filter", "sim_knn_graph", "etl_table_diff",
                         "graph_pagerank", "graph_triangles", "join_interval_overlap",
                         "agg_overlap_sketch", "agg_freq_sketch", "graph_khop_reach",
                         "sim_topk_mips", "q4_customer_rfm", "events_anomaly_mad",
                         "win_ntile_grouped", "agg_gini_grouped", "graph_ktruss")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same planner configuration as Verify/Bench — this tool must show
      // the plans the measured path actually runs (the year_rule_demo /
      // range_join_demo keys still print their own before/after contrast
      // from a rule-free child session)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", graft.Artifacts.Root + "/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach {
      case "year_rule_demo" =>
        // graft.plans.YearPredicateRewrite (active via spark.sql.extensions):
        // the analyzed plan still holds the year() predicate, the optimized
        // plan holds the rewritten raw date range the scan can push.
        import org.apache.spark.sql.functions.{col, year}
        val orders = Tables(spark, sfDir).orders
        val q = orders.filter(year(col("o_orderdate")).between(1995, 1996))
        println("\n========== year_rule_demo (analyzed: year() predicate) ==========")
        println(q.queryExecution.analyzed.toString)
        println("========== year_rule_demo (optimized: pushed date range) ==========")
        q.explain("formatted")
      case "range_join_demo" =>
        // graft.plans.RangeLookupJoinStrategy (active via
        // spark.sql.extensions): the interval join that would otherwise
        // plan as BroadcastNestedLoop is the binary-search operator.
        import org.apache.spark.sql.functions.{col, count, lit, to_date}
        import spark.implicits._
        val windows = Seq(("1995-01-01", "1995-06-30", "H1"), ("1995-07-01", "1995-12-31", "H2"))
          .toDF("s", "e", "label")
          .select(col("s").cast("date").as("win_start"), col("e").cast("date").as("win_end"), col("label"))
        def q = Tables(spark, sfDir).orders
          .join(windows, to_date(col("o_orderdate")).between(col("win_start"), col("win_end")))
          .groupBy("label").agg(count(lit(1)).as("n"))
        println("\n========== range_join_demo (RangeLookupJoinExec planned) ==========")
        q.explain()
        q.show()
      case k =>
        println(s"\n========== $k ==========")
        SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
