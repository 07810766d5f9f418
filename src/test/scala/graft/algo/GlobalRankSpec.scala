package graft.algo

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank must reproduce the partition-less window bit-for-bit —
  * the whole point is replacing `Window.orderBy` (single-partition
  * sort) without changing a single output row. */
class GlobalRankSpec extends SparkSuite {

  import spark.implicits._

  // keys unique (total order); values heavily tied so range boundaries
  // land inside tie runs unless the tiebreak column does its job
  private lazy val df = spark
    .range(0, 4001)
    .select(
      col("id").as("k"),
      pmod(col("id") * 2654435761L, lit(97)).as("v"))
    .repartition(7) // adversarial input partitioning
    .cache()

  test("rank equals the global-window row_number, asc and desc, any partition count") {
    for {
      p <- Seq(1, 3, 16)
      order <- Seq(Seq(col("v").asc, col("k").asc), Seq(col("v").desc, col("k").asc))
    } {
      val got = GlobalRank.withRowNumber(df, order, "r", "n", p)
      val want = df.withColumn("r", row_number().over(Window.orderBy(order: _*)).cast("long"))
      assert(
        got.select("k", "r").except(want.select("k", "r")).isEmpty
          && want.select("k", "r").except(got.select("k", "r")).isEmpty,
        s"rank mismatch at p=$p order=$order")
      assert(got.select("n").distinct().as[Long].head() == df.count())
    }
  }

  test("ntileOfRank matches SQL ntile for every bucket count and ragged n") {
    // n = 4001 with b in 2..7 exercises both branch arms and every
    // remainder class; n < b exercises the size-1-bucket edge
    for (b <- 2 to 7) {
      val ranked = GlobalRank.withRowNumber(df, Seq(col("v").asc, col("k").asc), "r", "n")
      val got = ranked.select(col("k"), GlobalRank.ntileOfRank(col("r"), col("n"), b).as("t"))
      val want = df.select(
        col("k"),
        ntile(b).over(Window.orderBy(col("v").asc, col("k").asc)).cast("long").as("t"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"ntile($b) mismatch")
    }
    val tiny = df.limit(3)
    val r3 = GlobalRank.withRowNumber(tiny, Seq(col("k").asc), "r", "n")
    val gotTiny = r3.select(GlobalRank.ntileOfRank(col("r"), col("n"), 5).as("t"))
      .as[Long].collect().sorted.toSeq
    assert(gotTiny == Seq(1L, 2L, 3L), "n < b puts each row in its own bucket")
  }

  test("no partition-less WindowExec over the data: offsets window sees <= P rows") {
    // the only Window.orderBy in the helper runs on the P-row counts
    // frame; the data-side window is partitioned by range-partition id.
    // Assert the executed plan has no Window node whose child exchange
    // is SinglePartition over the full frame.
    val out = GlobalRank.withRowNumber(df, Seq(col("v").asc, col("k").asc), "r", "n", 8)
    val plan = out.queryExecution.executedPlan.toString
    // the data window must be hash-partitioned by __gr_pid, never a
    // global sort of the input
    assert(plan.contains("hashpartitioning(__gr_pid"), plan.take(2000))
  }

  test("withGroupedRowNumber equals the per-group window, any partition count") {
    // 5 groups over 4001 rows — exactly the low-cardinality-partition-
    // key shape where Window.partitionBy(grp) sorts ~n/5 rows per task
    val g = df.withColumn("grp", pmod(col("k"), lit(5)))
    val order = Seq(col("v").asc, col("k").asc)
    val want = g
      .withColumn(
        "r",
        row_number().over(Window.partitionBy("grp").orderBy(order: _*)).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      .select("k", "grp", "r", "n")
    for (p <- Seq(1, 3, 16)) {
      val got = GlobalRank
        .withGroupedRowNumber(g, Seq("grp"), order, "r", "n", p)
        .select("k", "grp", "r", "n")
      assert(
        got.except(want).isEmpty && want.except(got).isEmpty,
        s"grouped rank mismatch at p=$p")
    }
  }

  test("withGroupedRowNumber fails loudly on a null group key") {
    // the cell join is null-unsafe; without the in-plan guard a null
    // key's rows would silently vanish from the output — assert the
    // guard converts that into a job failure naming the remedy
    val g = df.withColumn(
      "grp",
      when(col("k") === 17, lit(null).cast("long")).otherwise(pmod(col("k"), lit(5))))
    val ranked = GlobalRank
      .withGroupedRowNumber(g, Seq("grp"), Seq(col("v").asc, col("k").asc), "r", "n", 8)
    val ex = intercept[Exception] { ranked.count() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(
      chain(ex).exists(t =>
        Option(t.getMessage).exists(_.contains("null group key"))),
      s"expected the null-group-key assert, got: $ex")
  }

  test("withGroupedRowNumber: every data-side window is pid-partitioned") {
    val g = df.withColumn("grp", pmod(col("k"), lit(5)))
    val out = GlobalRank
      .withGroupedRowNumber(g, Seq("grp"), Seq(col("v").asc, col("k").asc), "r", "n", 8)
    val windows = out.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the only window touching data rows partitions by the range id; the
    // offset windows run on the bounded cell/group aggregate frames
    val dataWindows = windows.filterNot { w =>
      val aggBelow = w.children.exists(_.exists {
        case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
        case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
        case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
        case _ => false
      })
      aggBelow || w.partitionSpec.exists(_.references.exists(_.name == "__gg_pid"))
    }
    assert(dataWindows.isEmpty,
      s"un-aggregated data rows must only meet pid-partitioned windows:\n${dataWindows.mkString("\n")}")
  }

  test("withPrefixSum: exact exclusive running totals across range partitions") {
    import spark.implicits._
    // deterministic values with ties and skew; weights vary per row
    val rows = (0 until 5000).map { i =>
      val v = (i * 2654435761L) % 200 // 200 distinct sort keys with heavy ties
      (v, i.toLong, (i % 7 + 1).toLong)
    }
    val df = spark.sparkContext.parallelize(rows, 16).toDF("v", "id", "w")
    val got = GlobalRank
      .withPrefixSum(df, Seq(col("v").asc, col("id").asc), col("w"), "ps", 8)
      .select(col("id"), col("ps")).as[(Long, Long)].collect().toMap
    // driver-side reference: exclusive prefix sums over the same order
    var acc = 0L
    val want = rows.sortBy(r => (r._1, r._2)).map { case (_, id, w) =>
      val out = (id, acc); acc += w; out
    }.toMap
    assert(got == want, "prefix sums must match the sequential reference exactly")
    // the helper's data-side window must be partitioned by the range id
    val plan = GlobalRank
      .withPrefixSum(df, Seq(col("v").asc, col("id").asc), col("w"), "ps", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__gp_pid"), plan.take(2000))
  }
}
