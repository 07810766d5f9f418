package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.SaveMode

/** Dedup operators on a hand-built corpus with known duplicate structure,
  * written to a temp dir so the ops run through their real (dir-based)
  * entry points. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dedup_spec").toString
    val base = "the quick brown fox jumps over the lazy dog again and again until done"
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src0", base.length.toLong),                    // exact dup of 0
      (2L, base.replace("lazy", "late"), "en", "src0", 70L),           // near dup of 0
      (3L, "completely different content about spark query engines and shuffles", "en", "src1", 68L),
      (4L, "another unrelated short text", "en", "src1", 28L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    d
  }

  private def run(key: String) = SparkEntry_TestAccess.run(key)(spark, dir)

  test("dedup_exact groups identical texts under the lowest doc_id") {
    val rows = run("dedup_exact").orderBy("keep_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect()
    assert(rows.toSeq == Seq((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("dedup_minhash_lsh finds the exact and near duplicates, not the unrelated docs") {
    val pairs = run("dedup_minhash_lsh")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))          // exact dup: est_jaccard = 1
    assert(pairs.subsetOf(Set((0L, 1L), (0L, 2L), (1L, 2L)))) // no false pairs with 3/4
  }

  test("dedup_ngram_jaccard scores the exact pair 1.0 and near pair < 1.0") {
    val scored = run("dedup_ngram_jaccard")
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(scored((0L, 1L)) == 1.0)
    scored.get((0L, 2L)).foreach(j => assert(j > 0.5 && j < 1.0))
  }

  test("dedup_simhash pairs exact duplicates at hamming 0") {
    val rows = run("dedup_simhash")
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect()
    assert(rows.exists { case (a, b, h) => (a, b) == ((0L, 1L)) && h == 0 })
  }
}

/** Test access to the queries map without going through SparkEntry's full
  * assembly in every call site. */
object SparkEntry_TestAccess {
  def run(key: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    graft.SparkEntry.queries(key)
}
