package graft.etl

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSuite {

  private def formattedPlan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  /** Shuffle exchanges only (BroadcastExchange is not a shuffle). */
  private def hasShuffle(plan: String): Boolean =
    plan.replace("BroadcastExchange", "").contains("Exchange")

  test("bucketed fact-to-fact join runs without a shuffle exchange") {
    val t = Tables(spark, sf0001)
    Bucketing.writeBucketed(t.orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(t.lineitem.select("l_orderkey", "l_quantity", "l_extendedprice"),
      "b_lineitem", "l_orderkey", 4)

    // at test scale the planner would broadcast instead (also shuffle-free,
    // but it bypasses buckets); disable it to exercise the bucketed path
    // that matters at fact×fact scale.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey")
      val plan   = formattedPlan(joined)
      assert(!hasShuffle(plan), s"bucketed join still shuffles:\n$plan")

      // identical result to the plain (shuffling) join
      val plain = t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() == plain.count())

      // and aggregation on the bucket key reuses the layout too
      val agg     = spark.table("b_lineitem").groupBy("l_orderkey").agg(sum("l_quantity"))
      val aggPlan = formattedPlan(agg)
      assert(!hasShuffle(aggPlan), s"bucketed groupBy still shuffles:\n$aggPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
