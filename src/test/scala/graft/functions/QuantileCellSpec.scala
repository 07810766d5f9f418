package graft.functions

import graft.SparkSuite

/** The z-order rank-cell expression: strict-below counting over the
  * (sorted, repeats-kept) boundary array, binary-searched — interpreted
  * and codegen paths agree, duplicates weight proportionally. */
class QuantileCellSpec extends SparkSuite {
  import spark.implicits._

  test("countBelow: strict-below semantics, duplicates kept, edges") {
    val bs = Array(1.0, 2.0, 2.0, 2.0, 5.0)
    assert(QuantileCell.countBelow(bs, 0.5) == 0L)
    assert(QuantileCell.countBelow(bs, 1.0) == 0L, "equal is not below")
    assert(QuantileCell.countBelow(bs, 1.5) == 1L)
    assert(QuantileCell.countBelow(bs, 2.0) == 1L)
    assert(QuantileCell.countBelow(bs, 2.5) == 4L, "all three duplicates count")
    assert(QuantileCell.countBelow(bs, 9.0) == 5L)
    assert(QuantileCell.countBelow(Array.emptyDoubleArray, 3.0) == 0L)
  }

  test("quantile_cell evaluates through codegen and matches the driver-side count") {
    import org.apache.spark.sql.functions.{call_function, col, lit}
    QuantileCell.register(spark)
    val bs = Array(10.0, 20.0, 20.0, 30.0)
    val rows = Seq(5.0, 10.0, 15.0, 20.0, 25.0, 35.0).toDF("v")
      .select(col("v"), call_function("quantile_cell", col("v"), lit(bs)).as("c"))
      .as[(Double, Long)].collect().toMap
    assert(rows == Map(5.0 -> 0L, 10.0 -> 0L, 15.0 -> 1L, 20.0 -> 1L,
      25.0 -> 3L, 35.0 -> 4L))
    // null flows through null-intolerant evaluation
    val n = Seq[Option[Double]](None).toDF("v")
      .select(call_function("quantile_cell", col("v"), lit(bs)).as("c"))
      .collect().head
    assert(n.isNullAt(0), "null in, null out")
  }
}
