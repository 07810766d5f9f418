package graft

import org.apache.spark.sql.functions._

class NormSpec extends SparkSuite {
  import spark.implicits._

  test("hashBucket is overflow-safe and matches the documented DuckDB arithmetic at any key magnitude") {
    val keys = Seq(0L, 1L, 12345L, Int.MaxValue.toLong, Int.MaxValue.toLong + 1,
      1L << 40, Long.MaxValue / 3)
    val got = keys.toDF("k").select(Norm.hashBucket(col("k"), 100).as("b"))
      .as[Long].collect().toSeq
    val want = keys.map { k =>
      // ((k % 2^31) * 2654435761) % 100 in exact integer arithmetic
      ((BigInt(k) % BigInt(2147483648L)) * BigInt(2654435761L) % 100).toLong
    }
    assert(got == want)
  }

  test("hashBucket sampling rate stays ~uniform") {
    val buckets = spark.range(1, 100001).toDF("k")
      .select(Norm.hashBucket(col("k"), 100).as("b"))
      .filter(col("b") < 10).count()
    assert(math.abs(buckets / 100000.0 - 0.10) < 0.01)
  }
}
