package graft.etl

import graft.SparkSuite

class MergeUpsertSpec extends SparkSuite {
  import spark.implicits._

  private def existing = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
  private def incoming = Seq((2L, "B", 99.0), (3L, "c", 30.0)).toDF("k", "s", "v")

  test("upsert: incoming wins on collision, unmatched existing survives") {
    val out = MergeUpsert.upsert(existing, incoming, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0)))
  }

  test("insertMissing: existing wins, only new keys append, idempotent") {
    val once = MergeUpsert.insertMissing(existing, incoming, Seq("k"))
    assert(once.orderBy("k").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    val twice = MergeUpsert.insertMissing(once, incoming, Seq("k"))
    assert(twice.count() == once.count()) // re-running the same batch is a no-op
  }

  test("updateMatched: listed columns replaced, others pass through") {
    val updates = Seq((1L, 111.0)).toDF("k", "v")
    val out = MergeUpsert.updateMatched(existing, updates, Seq("k"), Seq("v"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "a", 111.0), (2L, "b", 20.0)))
  }
}
