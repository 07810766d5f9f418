package graft.ops

import graft.{SparkEntry, SparkSuite, Tables}

/** Conservation + composition checks for pipeline_media_v1 — the media
  * funnel's accounting identities must hold exactly (value parity with
  * DuckDB is the oracle gate; this spec pins the invariants that make
  * the funnel MEANINGFUL: stages chain, drops conserve, the pack stage
  * packs what survived), plus the composition contract: each stage's
  * survivor count is consistent with its standalone sibling's semantics
  * on the same corpus.
  */
class PipelineMediaSpec extends SparkSuite {

  test("pipeline_media_v1: stages chain and drops conserve exactly") {
    val rows = SparkEntry.queries("pipeline_media_v1")(spark, sf0001)
      .orderBy("stage_id").collect()
    assert(rows.length == 4, "the funnel is exactly four stages")
    val stages = rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
    val nDocs = Tables(spark, sf0001).documents.count()
    assert(stages.head._3 == nDocs, s"stage 1 docs_in must be the corpus: $nDocs")
    stages.foreach { case (id, name, in, kept, dropped, _) =>
      assert(dropped == in - kept, s"stage $id $name: dropped != in - kept")
      assert(kept >= 0 && kept <= in, s"stage $id $name: kept out of [0, in]")
    }
    stages.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._4, s"stage ${b._1} docs_in must equal stage ${a._1} docs_kept")
    }
    assert(stages.map(_._5).sum + stages.last._4 == nDocs,
      "sum of drops plus final survivors must equal the corpus")
    // bytes_kept never grows along the funnel
    stages.map(_._6).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, "bytes_kept must be monotone non-increasing")
    }
    assert(stages.last._4 > 0, "some payloads must survive the pipeline")
    // the pack stage reorganizes, never filters, and produces shards
    val pack = rows.last
    assert(pack.getString(1) == "shard_pack" && pack.getLong(4) == 0L)
    val nShards = pack.getLong(6)
    assert(nShards >= 1, "survivors must pack into at least one shard")
    assert(nShards <= pack.getLong(3), "more shards than surviving payloads")
    // offset packing: shard count == floor(last offset / 16 KiB) + 1 ==
    // at most ceil(total bytes / 16 KiB) distinct offsets' shards; the
    // loose-but-exact bound is ceil((bytes - max_payload) / 16384) <=
    // n_shards — checked via the simple direction instead: every shard
    // id is offset div 16384 with offsets < total bytes
    assert(nShards <= pack.getLong(5) / 16384 + 1,
      "shard ids exceed the byte-offset range")
  }

  test("pipeline_media_v1: stage 2 equals multimodal_dedup's election on gated docs") {
    // composition contract: the number of stage-2 survivors must equal
    // the number of distinct content hashes among gate-surviving docs
    // (one elected canonical copy per sha — multimodal_dedup's grain)
    val rows = SparkEntry.queries("pipeline_media_v1")(spark, sf0001)
      .orderBy("stage_id").collect()
    val kept2 = rows(1).getLong(3)
    val docs = Tables(spark, sf0001).documents
    import org.apache.spark.sql.functions._
    val want = docs
      .filter(octet_length(col("text").cast("binary")) >= 50)
      .select(sha2(col("text"), 256)).distinct().count()
    assert(kept2 == want,
      s"stage 2 must keep exactly one copy per content sha: got $kept2, want $want")
  }
}
