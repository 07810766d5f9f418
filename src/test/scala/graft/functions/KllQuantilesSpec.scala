package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The agg_quantile_sketch oracle row pins the exact values; the sketch's
  * own guarantees — bounded rank error, mergeability across arbitrary
  * partitionings, exactness below capacity — are asserted here. */
class KllQuantilesSpec extends SparkSuite {

  private val probs = Seq(0.25, 0.5, 0.75, 0.95)

  /** Max |true_rank(estimate)/n − p| over groups × probes. */
  private def maxRankErr(df: org.apache.spark.sql.DataFrame): Double = {
    val est = df.groupBy("g")
      .agg(expr(s"kll_quantiles(x, 256, ${probs.mkString(", ")})").as("est"),
        count(lit(1)).as("n"))
      .select(col("g"), col("n"), posexplode(col("est")))
      .withColumnRenamed("pos", "p_idx").withColumnRenamed("col", "est_v")
    df.join(est, Seq("g"))
      .groupBy("g", "p_idx", "n", "est_v")
      .agg(sum(when(col("x") <= col("est_v"), 1L).otherwise(0L)).as("r_est"))
      .withColumn("p", element_at(typedlit(probs), col("p_idx") + 1))
      .agg(max(abs(col("r_est").cast("double") / col("n") - col("p"))))
      .head.getDouble(0)
  }

  test("rank error stays within eps on real per-group distributions") {
    KllQuantiles.register(spark)
    val t = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
    val err = maxRankErr(t)
    assert(err <= 0.05, s"KLL rank error above the advertised eps: $err")
  }

  test("merging partials from an adversarial partitioning keeps the bound") {
    KllQuantiles.register(spark)
    val base = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
    // sorted-by-value partitions are the worst case for summary merges:
    // every partial covers a disjoint value range, so the merge path —
    // not the single-stream path — produces the final sketch
    val sorted = base.repartitionByRange(13, col("x"))
    val err = maxRankErr(sorted)
    assert(err <= 0.05, s"KLL rank error after range-partitioned merge: $err")
  }

  test("rank error holds at 1M rows of sorted input (worst case for compaction)") {
    KllQuantiles.register(spark)
    // range() delivers each partition fully sorted — the adversarial
    // input for a compacting summary (every compaction keeps alternate
    // elements of a sorted run) — and values 1..n make the true rank of
    // an estimate the estimate itself, so no verification join is needed
    val n = 1000000L
    val est = spark.range(1, n + 1)
      .select(lit("g").as("g"), col("id").cast("double").as("x"))
      .groupBy("g")
      .agg(expr(s"kll_quantiles(x, 256, ${probs.mkString(", ")})").as("est"))
      .select(posexplode(col("est")))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    est.foreach { case (i, v) =>
      val err = math.abs(v / n - probs(i))
      assert(err <= 0.05, s"p=${probs(i)}: estimate $v rank error $err at n=$n")
    }
  }

  test("a group below compactor capacity is answered exactly") {
    KllQuantiles.register(spark)
    import spark.implicits._
    // 100 distinct values < k=256: no compaction ever fires, so the
    // sketch degrades to the exact discrete quantile
    val t = (1 to 100).map(i => ("only", i.toDouble)).toDF("g", "x")
    val est = t.groupBy("g")
      .agg(expr(s"kll_quantiles(x, 256, ${probs.mkString(", ")})").as("est"))
      .select(explode(col("est"))).as[Double].collect().toSeq
    assert(est == Seq(25.0, 50.0, 75.0, 95.0), s"sub-capacity sketch not exact: $est")
  }
}
