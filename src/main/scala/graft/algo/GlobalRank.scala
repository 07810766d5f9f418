package graft.algo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact global `row_number` without the single-partition WindowExec.
  *
  * `Window.orderBy(...)` with no `partitionBy` moves EVERY row to one
  * partition and sorts it on one task — the classic global-ranking
  * scale failure (Spark itself logs a WindowExec warning). The
  * TeraSort-shaped alternative implemented here keeps the sort
  * parallel and exact:
  *
  *   1. `repartitionByRange` on the sort key — each partition holds a
  *      contiguous key range, sorted locally in parallel;
  *   2. count rows per range partition (a P-row metadata frame);
  *   3. cumulative offsets over that P-row frame (the only
  *      partition-less window left runs on ≤ P rows, a constant);
  *   4. broadcast-join the offsets back and add the partition-local
  *      `row_number` — global rank = local rank + offset.
  *
  * Requirements: `sortCols` must be a TOTAL order (include a unique
  * tiebreak column) — equal keys could otherwise straddle a range
  * boundary and the local ranks would not compose. The input is
  * persisted (MEMORY_AND_DISK) for the duration of the plan because
  * the range exchange is consumed by two jobs and the partition ids
  * must be the same in both.
  *
  * Reference frame: the reference's global RANK()/NTILE reports
  * (LQY_query2.txt:57-215) run inside one Oracle instance; at 100 TB
  * this range-partitioned rank is the distributed equivalent.
  */
object GlobalRank {

  /** Adds `out` = exact 1-based global row_number by `sortCols`, and
    * `outTotal` = the frame's total row count (every row; handy for
    * rank→quantile arithmetic without a second aggregation pass). */
  def withRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      out: String,
      outTotal: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df
      .repartitionByRange(p, sortCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = parted.groupBy(col("__gr_pid")).agg(count(lit(1)).as("__gr_c"))
    // cumulative offsets + grand total over the P-row counts frame: the
    // window is partition-less but its input is bounded by the partition
    // count, never by the data
    val offs = counts
      .withColumn(
        "__gr_off",
        coalesce(
          sum(col("__gr_c")).over(
            Window.orderBy(col("__gr_pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn(outTotal, sum(col("__gr_c")).over())
      .select(col("__gr_pid"), col("__gr_off"), col(outTotal))
    parted
      .join(broadcast(offs), Seq("__gr_pid"))
      .withColumn(
        out,
        row_number()
          .over(Window.partitionBy(col("__gr_pid")).orderBy(sortCols: _*))
          .cast("long") + col("__gr_off"))
      .drop("__gr_pid", "__gr_off")
  }

  /** Exact global EXCLUSIVE prefix sum of `weight` by `sortCols` — the
    * running-total twin of [[withRowNumber]], same TeraSort shape:
    * range partition, per-partition weight totals (a P-row frame),
    * cumulative offsets over that constant-size frame, broadcast back,
    * partition-local running sum + offset. `out` = Σ weight over all
    * rows STRICTLY before this row in the total order (0 for the
    * first). Same total-order requirement as withRowNumber. This is
    * the primitive rank-statistics need (Mann–Whitney's cum-counts,
    * CDF lookups) that `sum().over(Window.orderBy(...))` would compute
    * on a single task. */
  def withPrefixSum(
      df: DataFrame,
      sortCols: Seq[Column],
      weight: Column,
      out: String,
      numPartitions: Int = 0): DataFrame =
    withPrefixSums(df, sortCols, Seq(weight -> out), numPartitions)

  /** Multi-weight form of [[withPrefixSum]]: every (weight, out) pair
    * rides the SAME range exchange, per-partition totals frame, and
    * partition-local window — N running totals for one shuffle (the
    * two-sample statistics need both groups' CDFs over one pooled
    * order). */
  def withPrefixSums(
      df: DataFrame,
      sortCols: Seq[Column],
      weights: Seq[(Column, String)],
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val wcols = weights.zipWithIndex.map { case ((_, _), i) => s"__gp_w$i" }
    var parted0 = df.repartitionByRange(p, sortCols: _*)
    weights.zip(wcols).foreach { case ((w, _), wc) =>
      parted0 = parted0.withColumn(wc, w.cast("long"))
    }
    val parted = parted0
      .withColumn("__gp_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = parted.groupBy(col("__gp_pid"))
      .agg(sum(col(wcols.head)).as("__gp_t0"),
        wcols.tail.zipWithIndex.map { case (wc, i) => sum(col(wc)).as(s"__gp_t${i + 1}") }: _*)
    var offs = counts
    wcols.indices.foreach { i =>
      offs = offs.withColumn(
        s"__gp_off$i",
        coalesce(
          sum(col(s"__gp_t$i")).over(
            Window.orderBy(col("__gp_pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    }
    var out = parted.join(
      broadcast(offs.select(col("__gp_pid") +: wcols.indices.map(i => col(s"__gp_off$i")): _*)),
      Seq("__gp_pid"))
    weights.zip(wcols).zipWithIndex.foreach { case (((_, name), wc), i) =>
      out = out.withColumn(
        name,
        coalesce(
          sum(col(wc)).over(
            Window.partitionBy(col("__gp_pid")).orderBy(sortCols: _*)
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) + col(s"__gp_off$i"))
    }
    out.drop("__gp_pid" +: (wcols ++ wcols.indices.map(i => s"__gp_off$i")): _*)
  }

  /** Exact per-group `row_number() OVER (PARTITION BY groupCols ORDER BY
    * sortCols)` WITHOUT a per-group WindowExec — the shape for
    * LOW-CARDINALITY group keys over data-proportional groups, where
    * `Window.partitionBy(groupCols)` would sort ~n/|groups| rows on one
    * task each (the events_anomaly_mad / class-balance failure mode at
    * 100 TB; each group can be billions of rows).
    *
    * One [[withRowNumber]] over the COMPOSITE (groupCols ++ sortCols)
    * order does all the sorting TeraSort-shaped; the per-group rank is
    * then pure arithmetic: rank − (group's min rank) + 1, with the
    * per-group min-rank/count frame a broadcast aggregate bounded by
    * the group cardinality. Adds `out` = 1-based rank within the
    * group and `outN` = the group's row count.
    *
    * One shape, not a composition: range-partition on the composite
    * order, ONE aggregate to the (range partition, group) CELL grain —
    * bounded by P × |groups| — then pure arithmetic on that broadcast
    * frame: a row's per-group rank = (partition offset + local
    * row_number) − (group offset). The data is touched exactly twice
    * (cell counts, final pass), the same cost as the ungrouped
    * [[withRowNumber]]; composing withRowNumber + a min-rank aggregate
    * would pay a third windowed pass.
    *
    * Requirements: groupCols ++ sortCols must be a TOTAL order (unique
    * tiebreak in sortCols); the group cardinality must be
    * broadcast-bounded (it is the caller's partition-key cardinality —
    * the exact premise that made the window variant pathological); and
    * group key values must be non-null (the cell join is
    * null-unsafe — coalesce a sentinel first if needed). The last
    * requirement is ENFORCED in-plan: a null group key fails the plan
    * loudly (assert_true) instead of silently dropping the row at the
    * cell join — this is a library primitive and the next consumer may
    * not have read the scaladoc. */
  def withGroupedRowNumber(
      df: DataFrame,
      groupCols: Seq[String],
      sortCols: Seq[Column],
      out: String,
      outN: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val composite = groupCols.map(col) ++ sortCols
    // in-plan null-key guard (the events_decay_counts assert_true
    // idiom): assert_true returns NULL on success, so the filter keeps
    // every valid row and a single null key aborts the job with the
    // remedy in the message. Codegen'd per-row null checks — no shuffle.
    val nonNull = groupCols.map(g => s"`$g` IS NOT NULL").mkString(" AND ")
    val guarded = df.filter(expr(
      s"isnull(assert_true($nonNull, 'GlobalRank.withGroupedRowNumber: " +
        "null group key — coalesce a sentinel before ranking'))"))
    val parted = guarded
      .repartitionByRange(p, composite: _*)
      .withColumn("__gg_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // (partition, group) cell counts — P × |groups| rows, the only
    // aggregation pass; both offset frames derive from it window-free
    // in data terms (the two windows below run on the bounded cell /
    // group frames, never the data)
    val cells = parted
      .groupBy(col("__gg_pid") +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("__gg_c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // partition offsets: rows in range partitions strictly before pid
    // (pid order IS the global composite order)
    val pidOffs = cells.groupBy(col("__gg_pid")).agg(sum(col("__gg_c")).as("__gg_pc"))
      .withColumn(
        "__gg_poff",
        coalesce(
          sum(col("__gg_pc")).over(
            Window.orderBy(col("__gg_pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__gg_pid"), col("__gg_poff"))
    // group offsets + totals: rows in groups strictly before g in group
    // order (the composite sort's leading prefix, so "before g" in
    // group order = "before g's first row" in global order)
    val grpOffs = cells.groupBy(groupCols.map(col): _*).agg(sum(col("__gg_c")).as(outN))
      .withColumn(
        "__gg_goff",
        coalesce(
          sum(col(outN)).over(
            Window.orderBy(groupCols.map(col): _*).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    val cellFrame = cells
      .join(pidOffs, Seq("__gg_pid"))
      .join(grpOffs, groupCols)
      .select(col("__gg_pid") +: groupCols.map(col) :+ col("__gg_poff") :+ col("__gg_goff") :+ col(outN): _*)
    parted
      .join(broadcast(cellFrame), "__gg_pid" +: groupCols)
      .withColumn(
        out,
        row_number()
          .over(Window.partitionBy(col("__gg_pid")).orderBy(composite: _*))
          .cast("long") + col("__gg_poff") - col("__gg_goff"))
      .drop("__gg_pid", "__gg_poff", "__gg_goff")
  }

  /** SQL `ntile(b)` of a 1-based global rank, as pure integer
    * arithmetic — the first `n mod b` buckets take `n div b + 1` rows,
    * the rest `n div b` (the ANSI ntile contract both engines share).
    * With [[withRowNumber]] this reproduces a partition-less
    * `ntile(b).over(orderBy(...))` bit-for-bit, window-free. */
  def ntileOfRank(rank: Column, n: Column, b: Int): Column = {
    val q = floor(n / lit(b)).cast("long") // n div b; exact below 2^53
    val rem = pmod(n, lit(b))
    val headRows = (q + lit(1)) * rem
    when(rank <= headRows, floor((rank - 1) / (q + lit(1))).cast("long") + 1)
      .otherwise(rem + floor((rank - headRows - 1) / q).cast("long") + 1)
  }
}
