package graft.ops

import graft.{SparkEntry, SparkSuite}

/** Plan-shape and resource checks for the round-3 extension ops (value
  * correctness is the DuckDB gate, replicated by tools/check.py). */
class ExtOpsSpec extends SparkSuite {

  test("io_bucketed_join joins the bucketed tables without shuffling them") {
    // at sf0.001 AQE broadcasts the tiny orders side, hiding the bucketed
    // path this test is about — disable broadcast to see the large-scale plan
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      checkBucketedPlan()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def checkBucketedPlan(): Unit = {
    val df = SparkEntry.queries("io_bucketed_join")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join of the bucketed tables:\n$plan")
    // everything under the join reads bucket-partitioned files — the only
    // exchange in the whole plan is the one feeding the final groupBy,
    // which sits ABOVE the join in the printed tree
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"bucketed join inputs were re-shuffled:\n$belowJoin")
  }

  test("join_asof emits one row per click and no pair blowup plan") {
    val df = SparkEntry.queries("join_asof")(spark, sf0001)
    val clicks = graft.Tables(spark, sf0001).events
      .filter(org.apache.spark.sql.functions.col("event_type") === "click").count()
    assert(df.count() == clicks, "as-of join must preserve the probe side 1:1")
    // the scale-safe shape is union + running max — a join-based as-of
    // would show a Join node here
    assert(!df.queryExecution.optimizedPlan.toString.contains("Join"),
      "as-of should be window-based, not a pair join")
  }

  test("io_compact_small_files reduces the file count without losing rows") {
    val df = SparkEntry.queries("io_compact_small_files")(spark, sf0001)
    val total = df.agg(org.apache.spark.sql.functions.sum("n_events")).head.getLong(0)
    assert(total == graft.Tables(spark, sf0001).events.count(),
      "compaction must be lossless")
    def files(name: String) = {
      val p = new java.io.File(CoreOps.scratch(sf0001, name))
      p.listFiles((_, n) => n.endsWith(".parquet")).length
    }
    assert(files("compact_src") == 48, "fragmented layout should have 48 files")
    assert(files("compact_out") <= 4, "compaction should leave at most 4 files")
  }

  test("join_dpp_prune plans a dynamic pruning filter on the partitioned scan") {
    val df = SparkEntry.queries("join_dpp_prune")(spark, sf0001)
    assert(df.count() > 0)
    // the partition filter must be the runtime (join-derived) kind — a
    // static filter can't know the top-2 ship years
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the yr-partitioned fact scan:\n$plan")
  }

  test("agg_grouping_sets emits exactly the three requested slices") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("agg_grouping_sets")(spark, sf0001)
    // (pri,status) detail + (status) subtotal + () grand total — and no
    // (pri)-only level, which neither rollup nor cube could skip
    assert(df.filter(col("g_pri") === 0 && col("g_status") === 0).count() > 0)
    assert(df.filter(col("g_pri") === 1 && col("g_status") === 0).count() > 0)
    assert(df.filter(col("g_pri") === 1 && col("g_status") === 1).count() == 1)
    assert(df.filter(col("g_pri") === 0 && col("g_status") === 1).count() == 0,
      "the (priority)-only slice was not requested and must not appear")
  }

  test("text_domain_quota ranks via WindowGroupLimit and respects the cap") {
    import org.apache.spark.sql.functions.{col, max}
    val df = SparkEntry.queries("text_domain_quota")(spark, sf0001)
    assert(df.agg(max(col("rn"))).head.getLong(0) <= 50)
    // the rn <= 50 filter must reach the window operator as a group limit
    // (ranks beyond 50 are never computed — the at-scale win)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "quota filter should plan as WindowGroupLimit")
  }

  test("text_contamination splits bench and train disjointly") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("text_contamination")(spark, sf0001)
    // flagged docs are train docs — none may be in the 5% bench split
    val inBench = df.filter(
      graft.Norm.hashBucket(col("doc_id"), 100) < 5).count()
    assert(inBench == 0, "a benchmark doc may never be flagged as train-side")
  }

  test("io_sorted_layout clusters each file to a narrow shipdate span") {
    import org.apache.spark.sql.functions.{col, max, min}
    SparkEntry.queries("io_sorted_layout")(spark, sf0001).count()
    val path = CoreOps.scratch(sf0001, "sorted_layout")
    def spanSecs(r: org.apache.spark.sql.Row): Long = {
      val zone = java.time.ZoneOffset.UTC
      r.getAs[java.time.LocalDateTime](1).toEpochSecond(zone) -
        r.getAs[java.time.LocalDateTime](0).toEpochSecond(zone)
    }
    val globalSpan = spanSecs(
      spark.read.parquet(path).agg(min("l_shipdate"), max("l_shipdate")).head)
    val files = new java.io.File(path).listFiles((_, n) => n.endsWith(".parquet"))
    // range clustering must leave most files covering a small slice of
    // the global range — that tightness is what zone-map skipping uses
    val narrow = files.count { f =>
      spanSecs(spark.read.parquet(f.getAbsolutePath)
        .agg(min("l_shipdate"), max("l_shipdate")).head) * 4 < globalSpan
    }
    assert(narrow >= files.length - 2,
      s"only $narrow of ${files.length} files are range-clustered")
  }

  test("join_hint_shuffle_hash plans a ShuffledHashJoin, not a sort-merge") {
    // disable auto-broadcast so the hint (not the tiny test SF) decides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("join_hint_shuffle_hash")(spark, sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"),
        s"hint should force a shuffled hash join:\n$plan")
      assert(!plan.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("connected components frees every checkpoint it creates") {
    import spark.implicits._
    val sc = spark.sparkContext
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 13L))
      .toDF("a", "b")
    val before = sc.getPersistentRDDs.keySet
    val res = graft.algo.ConnectedComponents.components(edges)
    assert(res.count() == 7)
    val added = sc.getPersistentRDDs.keySet -- before
    // the edge artifact and all superseded generations are unpersisted
    // inside the loop; only the final generation may remain
    assert(added.size <= 1, s"leaked checkpoint generations: $added")
    graft.algo.ConnectedComponents.release(res)
    assert(sc.getPersistentRDDs.keySet.intersect(added).isEmpty,
      "release() must free the final generation")
  }
}
