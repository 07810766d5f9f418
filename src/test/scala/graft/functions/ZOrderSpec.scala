package graft.functions

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Morton interleave: bit-exact unit values, codegen fusion, and the
  * layout property the curve exists for — secondary-dimension file
  * pruning that a single-key sort cannot provide. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("bit_interleave weaves bits exactly") {
    assert(ZOrder.interleave(0L, 0L) == 0L)
    assert(ZOrder.interleave(1L, 0L) == 1L) // a occupies even bits
    assert(ZOrder.interleave(0L, 1L) == 2L) // b occupies odd bits
    assert(ZOrder.interleave(0xffffL, 0L) == 0x55555555L)
    assert(ZOrder.interleave(0L, 0xffffL) == 0xaaaaaaaaL)
    assert(ZOrder.interleave(0xffffL, 0xffffL) == 0xffffffffL)
    // only the low 16 bits participate
    assert(ZOrder.interleave(0x10000L, 0L) == 0L)
    // interleaving is monotone per dimension when the other is fixed
    val codes = (0L to 255L).map(ZOrder.interleave(_, 7L))
    assert(codes == codes.sorted)
  }

  test("bit_interleave runs fused in whole-stage codegen") {
    ZOrder.register(spark)
    val df = spark.range(100)
      .select(call_function("bit_interleave", col("id"), col("id") + 1).as("z"))
      .filter(col("z") >= 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("bit_interleave") && l.contains("*(")),
      s"expression fell out of codegen:\n$plan")
    // spot-check through the engine path too
    val viaEngine = Seq((3L, 5L)).toDF("a", "b")
      .select(call_function("bit_interleave", col("a"), col("b"))).head().getLong(0)
    assert(viaEngine == ZOrder.interleave(3L, 5L))
  }

  // the layout-pruning property test lives in PipelineOpsSpec (package
  // graft.ops) because it reads the op's scratch path
}
