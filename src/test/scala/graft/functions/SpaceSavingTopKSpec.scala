package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SpaceSavingTopKSpec extends SparkSuite {
  import spark.implicits._

  private def topOf(df: org.apache.spark.sql.DataFrame, k: Int, cap: Int) = {
    SpaceSavingTopK.register(spark)
    df.agg(expr(s"spacesaving_topk(v, $k, $cap)").as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.item"), col("t.est_count"), col("t.max_err"))
      .as[(String, Long, Long)].collect()
  }

  test("heavy items survive aggressive eviction with valid error bounds") {
    // 1000 × "hot", 200 × "warm", 800 distinct singletons; capacity 16 ≪ 1002 distinct
    val data = (Seq.fill(1000)("hot") ++ Seq.fill(200)("warm")
      ++ (1 to 800).map(i => s"cold_$i"))
    val df = spark.sparkContext.parallelize(data, 8).toDF("v")
    val top = topOf(df, 5, 16)
    val byItem = top.map(t => t._1 -> t).toMap
    // guarantee: freq > n/capacity (2000/16 = 125) ⇒ present
    assert(byItem.contains("hot") && byItem.contains("warm"))
    // bounds: est ≥ true ≥ est − err
    val (_, hotEst, hotErr) = byItem("hot")
    assert(hotEst >= 1000 && hotEst - hotErr <= 1000)
    val (_, warmEst, warmErr) = byItem("warm")
    assert(warmEst >= 200 && warmEst - warmErr <= 200)
    // the top entry is the true heaviest
    assert(top.head._1 == "hot")
  }

  test("exact mode: capacity above distinct count gives exact counts, zero error") {
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("v").repartition(4)
    val top = topOf(df, 3, 100).toSeq
    assert(top == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }
}
