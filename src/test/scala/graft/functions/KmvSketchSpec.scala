package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The agg_overlap_sketch oracle row pins the exact overlap values; the
  * KMV sketch's own guarantees — it IS the k smallest distinct hashes,
  * partials merge with plain array arithmetic, sub-k sketches are
  * complete, the cardinality estimator meets its error bound, bad input
  * fails loudly — are asserted here.
  */
class KmvSketchSpec extends SparkSuite {

  private val k = 256
  private val twoP63 = 9.223372036854776e18

  private def hashed(n: Long): DataFrame =
    spark.range(n).select(expr("shiftrightunsigned(xxhash64(id), 1)").as("h"))

  private def sketchOf(df: DataFrame): Array[Long] = {
    KmvSketch.register(spark)
    df.agg(expr(s"kmv_sketch(h, $k)").as("sk")).head.getSeq[Long](0).toArray
  }

  test("sketch is exactly the k smallest distinct hash values, sorted ascending") {
    val df = hashed(5000)
    val sk = sketchOf(df)
    val exact = df.distinct().orderBy("h").limit(k).collect().map(_.getLong(0))
    assert(sk.length == k)
    assert(sk.sameElements(exact), "sketch diverged from the true k-min set")
    assert(sk.sameElements(sk.sorted), "sketch must iterate ascending")
  }

  test("a sub-k sketch is the complete distinct-hash set (no information discarded)") {
    val df = hashed(40).union(hashed(40)) // duplicates must collapse
    val sk = sketchOf(df)
    val exact = df.distinct().orderBy("h").collect().map(_.getLong(0))
    assert(sk.sameElements(exact))
  }

  test("partials merge with plain array arithmetic into the whole-data sketch") {
    KmvSketch.register(spark)
    val df = hashed(20000)
    // adversarial partitioning: sorted ranges, so every partial covers a
    // disjoint hash range and the merge path does the work
    val partials = df.repartitionByRange(13, col("h"))
      .groupBy(spark_partition_id().as("p"))
      .agg(expr(s"kmv_sketch(h, $k)").as("sk"))
    val merged = partials
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))), 1, k).as("sk"))
      .head.getSeq[Long](0).toArray
    assert(merged.sameElements(sketchOf(df)),
      "array-merged partials must equal the single-pass sketch")
  }

  test("cardinality estimator stays within 4/sqrt(k) relative error") {
    for (n <- Seq(2000L, 50000L)) {
      val sk = sketchOf(hashed(n))
      val est = (k - 1).toDouble * twoP63 / sk.last
      val relErr = math.abs(est - n) / n.toDouble
      assert(relErr <= 4.0 / math.sqrt(k), s"n=$n est=$est relErr=$relErr")
    }
  }

  test("negative input fails loudly instead of silently biasing the sample") {
    KmvSketch.register(spark)
    val bad = spark.range(10).select((col("id") - 5).as("h"))
    val e = intercept[Exception] {
      bad.agg(expr(s"kmv_sketch(h, $k)")).collect()
    }
    assert(e.getMessage != null)
  }

  test("k outside [16, 2^20] is rejected at construction") {
    KmvSketch.register(spark)
    intercept[Exception] {
      hashed(10).agg(expr("kmv_sketch(h, 4)")).collect()
    }
  }
}
