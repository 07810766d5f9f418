package graft.functions

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Bitmap distinct: exactness vs count_distinct, layout-independent
  * merging, and the hard domain guard. */
class BitmapDistinctSpec extends SparkSuite {
  import spark.implicits._

  test("equals COUNT(DISTINCT) on every group and every layout") {
    BitmapDistinct.register(spark)
    val events = Tables(spark, sf0001).events
    def viaBitmap(parts: Int) = events.repartition(parts)
      .groupBy("event_type")
      .agg(expr("bitmap_distinct(user_id, 1048576)").as("n"))
    val exact = events.groupBy("event_type").agg(countDistinct("user_id").as("n"))
    Seq(1, 7, 32).foreach { parts =>
      val bm = viaBitmap(parts)
      assert(bm.except(exact).count() == 0 && exact.except(bm).count() == 0,
        s"bitmap disagreed with count_distinct at $parts partitions")
    }
  }

  test("out-of-domain keys fail loudly instead of answering wrong") {
    BitmapDistinct.register(spark)
    val ex = intercept[Exception] {
      Seq(5L, 1048576L).toDF("k")
        .agg(expr("bitmap_distinct(k, 1048576)")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => Option(c.getMessage).exists(_.contains("outside dense domain"))),
      s"expected the domain-guard message, got: $ex")
  }

  test("nulls are ignored like COUNT(DISTINCT)") {
    BitmapDistinct.register(spark)
    val n = Seq(Some(1L), None, Some(2L), Some(1L)).toDF("k")
      .agg(expr("bitmap_distinct(k, 64)")).head().getLong(0)
    assert(n == 2L)
  }
}
