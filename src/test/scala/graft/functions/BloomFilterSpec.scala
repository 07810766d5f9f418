package graft.functions

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter: algebraic guarantees (no false negatives, sized FP
  * rate, OR-mergeability) and the contamination op built on it. */
class BloomFilterSpec extends SparkSuite {
  import spark.implicits._

  private val numBits   = 1 << 17 // 16 KiB
  private val numHashes = 5

  test("no false negatives, FP rate near the sized bound") {
    BloomFilter.register(spark)
    val inserted = (0 until 2000).map(i => s"member_$i")
    val bloom = inserted.toDF("s")
      .agg(expr(s"bloom_build(s, $numBits, $numHashes)")).head().getAs[Array[Byte]](0)
    // every inserted item must probe true — the property the prefilter rests on
    assert(inserted.forall(s => BloomProbe.contains(bloom, numHashes, UTF8String.fromString(s))))
    // FP rate for n=2000, m=2^17, k=5: (1 - e^{-kn/m})^k ~ 2e-6 — allow slack
    val fps = (0 until 20000).count(i =>
      BloomProbe.contains(bloom, numHashes, UTF8String.fromString(s"absent_$i")))
    assert(fps < 20, s"FP rate blew past the sizing: $fps/20000")
  }

  test("distributed build merges partials to the same bitset as a local build") {
    BloomFilter.register(spark)
    val items = (0 until 5000).map(i => s"item_$i")
    val distributed = items.toDF("s").repartition(16)
      .agg(expr(s"bloom_build(s, $numBits, $numHashes)")).head().getAs[Array[Byte]](0)
    val local = new Array[Byte](numBits / 8)
    items.foreach(s => BloomProbe.add(local, numHashes, UTF8String.fromString(s)))
    assert(java.util.Arrays.equals(distributed, local),
      "bitwise-OR merge must be layout-independent")
  }

  test("bloom_contains evaluates inside whole-stage codegen") {
    BloomFilter.register(spark)
    val bloom = Seq("x").toDF("s")
      .agg(expr(s"bloom_build(s, 64, 2)")).head().getAs[Array[Byte]](0)
    val probed = spark.range(100).toDF("id")
      .filter(call_function("bloom_contains", lit(bloom), concat(lit("v"), col("id")), lit(2)))
    val plan = probed.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l => l.contains("Filter bloom_contains") && l.contains("*(")),
      s"probe fell out of codegen:\n$plan")
  }

  test("text_contamination_bloom equals the exact containment result") {
    val bloomed = SparkEntry.queries("text_contamination_bloom")(spark, sf0001)
    // the exact path: text_contamination's shared-gram count per train doc
    val exact = SparkEntry.queries("text_contamination")(spark, sf0001)
      .select(col("doc_id"), col("n_shared_grams"))
    assert(bloomed.count() > 0, "sf0.001 should have contaminated docs")
    assert(bloomed.except(exact).count() == 0 && exact.except(bloomed).count() == 0,
      "bloom prefilter must not change the exact result")
  }
}
