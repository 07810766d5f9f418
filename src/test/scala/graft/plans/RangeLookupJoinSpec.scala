package graft.plans

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class RangeLookupJoinSpec extends SparkSuite {
  import spark.implicits._

  private def windows = Seq(
    ("1995-01-01", "1995-03-31", "Q1"),
    ("1995-04-01", "1995-06-30", "Q2"),
    ("1995-02-15", "1995-05-15", "OVERLAP"), // overlapping window: multi-match
    ("1995-07-01", "1995-09-30", "Q3")
  ).toDF("s", "e", "label")
    .select(col("s").cast("date").as("win_start"), col("e").cast("date").as("win_end"), col("label"))

  private def rangeJoin = {
    val orders = Tables(spark, sf0001).orders
    orders.join(windows, to_date(col("o_orderdate")).between(col("win_start"), col("win_end")))
  }

  test("strategy swaps in RangeLookupJoinExec and results match the default plan") {
    // baseline with the default planner (broadcast nested loop)
    val baseline = rangeJoin.groupBy("label")
      .agg(count(lit(1)).as("n")).orderBy("label")
      .as[(String, Long)].collect().toSeq
    assert(baseline.nonEmpty)

    RangeLookupJoin.install(spark)
    try {
      val planned = rangeJoin
      val physical = planned.queryExecution.executedPlan.toString
      assert(physical.contains("RangeLookupJoin"), s"strategy did not fire:\n$physical")
      val got = planned.groupBy("label").agg(count(lit(1)).as("n")).orderBy("label")
        .as[(String, Long)].collect().toSeq
      assert(got == baseline, s"custom operator changed results: $got vs $baseline")
      // the overlapping window matched rows that also matched Q1/Q2
      assert(got.exists(_._1 == "OVERLAP"))
    } finally {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == RangeLookupJoinStrategy)
    }
  }

  test("join output survives direct collect/orderBy (UnsafeRow contract)") {
    // executeCollect and SortExec cast emitted rows to UnsafeRow — consume
    // the join with NO aggregate above it so the operator's raw output
    // contract is what's under test.
    RangeLookupJoin.install(spark)
    try {
      val planned = rangeJoin.select(col("o_orderkey"), col("label"))
      assert(planned.queryExecution.executedPlan.toString.contains("RangeLookupJoin"))
      val direct = planned.collect()
      assert(direct.nonEmpty)
      val sorted = planned.orderBy(col("o_orderkey"), col("label")).collect()
      assert(sorted.length == direct.length)
      // rows must be distinct materialized values, not one shared buffer
      assert(direct.map(r => (r.getLong(0), r.getString(1))).distinct.length == direct.length)
      assert(planned.limit(3).collect().length == 3)
    } finally {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == RangeLookupJoinStrategy)
    }
  }

  test("strategy leaves non-matching joins and large right sides alone") {
    RangeLookupJoin.install(spark)
    try {
      val t = Tables(spark, sf0001)
      // equi-join: not a range shape
      val equi = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      assert(!equi.queryExecution.executedPlan.toString.contains("RangeLookupJoin"))
    } finally {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == RangeLookupJoinStrategy)
    }
  }
}
