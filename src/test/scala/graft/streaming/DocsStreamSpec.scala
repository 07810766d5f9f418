package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class DocsStreamSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again until done"

  private def corpus = Seq(
    (0L, base, "en", "s", base.length.toLong),
    (1L, base, "en", "s", base.length.toLong),                  // exact dup of 0
    (2L, base.replace("lazy", "late"), "en", "s", 70L),          // near dup of 0/1
    (3L, "completely different content about spark query engines and shuffles", "en", "s", 68L),
    (4L, "another unrelated short text entirely", "en", "s", 38L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("streaming near-dup emits the same pairs as the batch LSH on the same corpus") {
    val staged = java.nio.file.Files.createTempDirectory("graft_docs_stream").toString
    corpus.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)

    val q = DocsStream.start(spark, staged, "neardup_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("neardup_test")
        .select("a_id", "b_id").distinct().as[(Long, Long)].collect().toSet
      assert(streamed.contains((0L, 1L))) // exact dup agrees on all 16 hashes
      // no pair among the unrelated docs
      assert(streamed.subsetOf(Set((0L, 1L), (0L, 2L), (1L, 2L))))
      // agreement counts are consistent: exact dup agrees on 16/16
      val full = spark.table("neardup_test")
        .filter(col("a_id") === 0L && col("b_id") === 1L)
        .select(max("n_agree")).as[Int].collect().head
      assert(full == 16)
    } finally q.stop()
  }

  test("band state stays bounded: re-delivering the corpus emits no self-pairs and respects the cap") {
    val staged = java.nio.file.Files.createTempDirectory("graft_docs_stream2").toString
    corpus.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    corpus.coalesce(1).write.mode(SaveMode.Append).parquet(staged) // re-delivery

    val q = DocsStream.start(spark, staged, "neardup_redeliver")
    try {
      q.processAllAvailable()
      val pairs = spark.table("neardup_redeliver").select("a_id", "b_id").as[(Long, Long)].collect()
      assert(pairs.forall { case (a, b) => a < b }) // never a self-pair, ordered ids
    } finally q.stop()
  }
}
