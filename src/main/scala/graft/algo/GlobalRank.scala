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
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df
      .repartitionByRange(p, sortCols: _*)
      .withColumn("__gp_w", weight.cast("long"))
      .withColumn("__gp_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = parted.groupBy(col("__gp_pid")).agg(sum(col("__gp_w")).as("__gp_t"))
    val offs = counts
      .withColumn(
        "__gp_off",
        coalesce(
          sum(col("__gp_t")).over(
            Window.orderBy(col("__gp_pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__gp_pid"), col("__gp_off"))
    parted
      .join(broadcast(offs), Seq("__gp_pid"))
      .withColumn(
        out,
        coalesce(
          sum(col("__gp_w")).over(
            Window.partitionBy(col("__gp_pid")).orderBy(sortCols: _*)
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) + col("__gp_off"))
      .drop("__gp_pid", "__gp_off", "__gp_w")
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
