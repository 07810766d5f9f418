package graft.ops

import graft.{SparkEntry, SparkSuite, Tables}

/** Conservation + composition checks for pipeline_pretrain_v2 — the
  * funnel's accounting identities must hold exactly (value parity with
  * DuckDB is the oracle gate; this spec pins the invariants that make
  * the funnel MEANINGFUL: stages chain, drops conserve, the pack stage
  * packs what survived). */
class PipelineV2Spec extends SparkSuite {

  test("pipeline_pretrain_v2: stages chain and drops conserve exactly") {
    val rows = SparkEntry.queries("pipeline_pretrain_v2")(spark, sf0001)
      .orderBy("stage_id").collect()
    assert(rows.length == 7, "the funnel is exactly seven stages")
    val stages = rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
    // stage 1 starts from the whole corpus
    val nDocs = Tables(spark, sf0001).documents.count()
    assert(stages.head._3 == nDocs, s"stage 1 docs_in must be the corpus: $nDocs")
    // per-stage conservation: dropped = in - kept, and never negative
    stages.foreach { case (id, name, in, kept, dropped, _) =>
      assert(dropped == in - kept, s"stage $id $name: dropped != in - kept")
      assert(kept >= 0 && kept <= in, s"stage $id $name: kept out of [0, in]")
    }
    // stages CHAIN: docs_in(k+1) == docs_kept(k)
    stages.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._4, s"stage ${b._1} docs_in must equal stage ${a._1} docs_kept")
    }
    // global conservation: every input doc is either dropped at some
    // stage or survives to the end (Σ drops + survivors = input)
    assert(stages.map(_._5).sum + stages.last._4 == nDocs,
      "sum of drops plus final survivors must equal the corpus")
    // tokens_kept never grows along the funnel
    stages.map(_._6).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, "tokens_kept must be monotone non-increasing")
    }
    // the funnel is non-degenerate on this corpus: something survives,
    // and at least one GATE stage (1-5, scale-independent thresholds)
    // actually drops — a funnel that drops nothing tests nothing
    assert(stages.last._4 > 0, "some documents must survive the pipeline")
    assert(stages.take(5).map(_._5).sum > 0, "at least one gate stage must drop")
    // the pack stage reorganizes, never filters, and produces shards
    val pack = rows.last
    assert(pack.getString(1) == "seqlen_pack" && pack.getLong(4) == 0L)
    val nPacks = pack.getLong(6)
    assert(nPacks >= 1, "survivors must pack into at least one shard")
    // shard count is bounded by survivors (a shard holds >= 1 doc) and
    // below by total tokens / budget (a shard holds <= 512 tokens of
    // whole docs, so ceil(tokens/512) <= n_packs)
    assert(nPacks <= pack.getLong(3), "more shards than surviving docs")
    assert(nPacks >= (pack.getLong(5) + 511) / 512,
      "too few shards for the surviving token mass")
  }
}
