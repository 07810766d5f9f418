package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The skew guard's two contracts: (1) the emitted pair set is EXACTLY
  * the naive blocked self-join's, (2) a pathological hot block (every doc
  * sharing one opening — endemic boilerplate in crawl data) spreads over
  * many tasks with bounded per-task pair counts instead of collapsing
  * into one straggler. */
class BlockedPairsSpec extends SparkSuite {
  import spark.implicits._

  test("pair set identical to the naive blocked self-join, ids normalized") {
    // one hot block (60 rows, cap 8 ⇒ 8 sub-groups) + several small blocks
    val rows = (0L until 60L).map(i => (i, "hot")) ++
      (60L until 88L).map(i => (i, s"b${i % 7}"))
    val df = rows.toDF("id", "bk")
    val guarded = BlockedPairs.pairs(df, Seq("bk"), "id", cap = 8)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .as[(Long, Long)].collect()
    val naive = df.as("x").join(df.as("y"), col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id")).as[(Long, Long)].collect().toSet
    assert(guarded.length == naive.size, "duplicate or missing pairs")
    assert(guarded.toSet == naive)
    assert(guarded.forall { case (a, b) => a < b })
  }

  test("adversarial corpus: 1200 docs sharing one 32-char opening stay task-bounded") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // observe the raw shuffle layout
    try {
      val opening = "the quick brown fox jumps over!!" // 32 chars — one shared block key
      val docs = spark.range(1200).toDF("doc_id")
        .select(col("doc_id"), concat(lit(opening), lit(" tail "), col("doc_id")).as("text"))
        .withColumn("bk", md5(substring(col("text"), 1, 32)))
      val cand = BlockedPairs.pairs(docs, Seq("bk"), "doc_id", cap = 64)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      val total = 1200L * 1199 / 2
      assert(cand.count() == total, "triangular split lost or duplicated pairs")
      // the unguarded join puts all pairs in the block key's ONE shuffle
      // partition; the guard must spread them with no dominant task
      val sizes = cand.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect()
      assert(sizes.count(_ > 0) >= 3, s"pairs concentrated: ${sizes.mkString(",")}")
      assert(sizes.max <= total * 2 / sizes.count(_ > 0),
        s"per-task pair count unbounded: max ${sizes.max} of $total")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
