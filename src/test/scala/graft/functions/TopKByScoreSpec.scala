package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TopKByScoreSpec extends SparkSuite {
  import spark.implicits._

  private def topOf(df: org.apache.spark.sql.DataFrame, k: Int) = {
    TopKByScore.register(spark)
    df.groupBy("g")
      .agg(expr(s"topk_by_score(s, i, $k)").as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rn"), col("col.score"), col("col.id"))
      .as[(String, Int, Double, Long)]
      .collect()
      .toSeq
      .sortBy(t => (t._1, t._2))
  }

  test("keeps the k highest scores per group, score DESC then id ASC") {
    val df = Seq(
      ("a", 1.0, 10L), ("a", 5.0, 11L), ("a", 3.0, 12L), ("a", 5.0, 9L),
      ("b", 2.0, 20L)
    ).toDF("g", "s", "i").repartition(4)
    val top = topOf(df, 2)
    // ties at 5.0 break by id ASC: id 9 before id 11
    assert(top == Seq(("a", 1, 5.0, 9L), ("a", 2, 5.0, 11L), ("b", 1, 2.0, 20L)))
  }

  test("groups smaller than k return all rows, still ordered") {
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 2L)).toDF("g", "s", "i")
    assert(topOf(df, 5) == Seq(("g", 1, 2.0, 2L), ("g", 2, 1.0, 1L)))
  }

  test("matches row_number over a large skewed input across many partitions") {
    // deterministic pseudo-random scores with deliberate ties
    val rows = (0 until 5000).map { i =>
      val g = s"g${i % 7}"
      val s = ((i * 2654435761L) % 97).toDouble // heavy ties: 97 distinct scores
      (g, s, i.toLong)
    }
    val df = spark.sparkContext.parallelize(rows, 32).toDF("g", "s", "i")
    val got = topOf(df, 10)
    val want = rows
      .groupBy(_._1)
      .toSeq
      .flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(10).zipWithIndex.map { case ((_, s, i), idx) =>
          (g, idx + 1, s, i)
        }
      }
      .sortBy(t => (t._1, t._2))
    assert(got == want)
  }

  test("NaN scores rank first under the SQL total double order, no sort crash") {
    // java.lang.Double.compare semantics: NaN > +Inf — matches Spark's
    // and DuckDB's ORDER BY score DESC. A partial-order comparator here
    // either throws in TimSort or silently mis-ranks the NaN rows.
    val rows = (1 to 200).map(i => ("g", i.toDouble, i.toLong)) ++
      Seq(("g", Double.NaN, 900L), ("g", Double.NaN, 901L),
        ("g", Double.PositiveInfinity, 800L))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("g", "s", "i")
    val top = topOf(df, 4)
    assert(top.map(t => t._4) == Seq(900L, 901L, 800L, 200L),
      s"NaN/Inf ordering wrong: $top")
  }

  test("state stays bounded: serialized partial never exceeds k entries") {
    val agg = TopKByScore(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        1, org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.catalyst.expressions.Literal(4))
    val buf = agg.createAggregationBuffer()
    (0 until 1000).foreach { i =>
      agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(i.toDouble, i.toLong))
    }
    val bytes = agg.serialize(buf)
    // 4 bytes count + 16 bytes per entry, k = 4
    assert(bytes.length <= 4 + 16 * 4)
    val back = agg.deserialize(bytes)
    assert(back.size <= 4)
    assert(back.map(_._1).max == 999.0)
  }
}
