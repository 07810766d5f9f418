package graft.ops

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Semantic checks for join_interval_overlap: the month-binned physical
  * strategy must emit exactly what the direct (unbinned) inequality join
  * emits, and the binning fan-out must stay at its contract bound. */
class IntervalOverlapSpec extends SparkSuite {

  test("binned overlap join equals the direct inequality join") {
    val binned = SparkEntry.queries("join_interval_overlap")(spark, sf0001)
    // the direct plan: same intervals, per-supplier quadratic join with
    // no bin key and no bin-claim dedup — the semantics, unoptimized
    val iv = JoinOps.intervals(Tables(spark, sf0001).lineitem)
    val a = iv.columns.foldLeft(iv)((d, c) => d.withColumnRenamed(c, "a_" + c))
    val b = iv.columns.foldLeft(iv)((d, c) => d.withColumnRenamed(c, "b_" + c))
    val ovDays = datediff(least(col("a_e"), col("b_e")), greatest(col("a_s"), col("b_s"))) + 1
    val direct = a.join(b,
        col("a_l_suppkey") === col("b_l_suppkey") &&
          (col("a_l_orderkey") < col("b_l_orderkey") ||
            (col("a_l_orderkey") === col("b_l_orderkey") &&
              col("a_l_linenumber") < col("b_l_linenumber"))) &&
          col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .groupBy(col("a_l_suppkey").as("l_suppkey"))
      .agg(
        count(lit(1)).as("n_pairs"),
        max(ovDays).cast("long").as("max_overlap_days"),
        sum(ovDays).cast("long").as("total_overlap_days"))
    val got = binned.collect().map(_.toSeq).toSet
    val want = direct.collect().map(_.toSeq).toSet
    assert(got == want, "binning is physical strategy only — results must be identical")
    assert(got.nonEmpty, "the fixture must actually exercise overlaps")
  }

  test("month binning fan-out stays at its ≤2-bins-per-interval bound") {
    // per ROW (the key is not unique — see JoinOps.intervals): a ≤24-day
    // transit interval can straddle at most one month boundary
    val iv = JoinOps.intervals(Tables(spark, sf0001).lineitem)
    assert(iv.filter(datediff(col("e"), col("s")) > 24).count() == 0,
      "the derived transit must respect its ≤24-day contract")
    assert(iv.filter(
        months_between(date_trunc("month", col("e")), date_trunc("month", col("s"))) > 1).count() == 0,
      "a ≤24-day interval can touch at most two month bins")
  }
}
