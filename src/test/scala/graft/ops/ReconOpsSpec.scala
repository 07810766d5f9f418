package graft.ops

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-6 depth ops: gaps-and-islands, snapshot
  * reconciliation, and the top-n-gram repetition gate. (Value parity with
  * DuckDB is the oracle gate, replicated by tools/check.py.) */
class ReconOpsSpec extends SparkSuite {

  test("win_islands: islands are maximal, disjoint, and conserve events") {
    val df = SparkEntry.queries("win_islands")(spark, sf0001).cache()
    // island arithmetic: a run of consecutive days has length = span
    assert(df.filter(datediff(col("end_day"), col("start_day")) + 1 =!= col("n_days")).count() == 0,
      "n_days must equal the day span — islands must be gap-free inside")
    // conservation: every purchase event lands in exactly one island
    val purchases = Tables(spark, sf0001).events.filter(col("event_type") === "purchase")
    assert(df.agg(sum("n_events")).head.getLong(0) == purchases.count(),
      "islands must partition the purchase events")
    val dayCount = purchases.select(col("user_id"), to_date(col("ts")).as("d")).distinct().count()
    assert(df.agg(sum("n_days")).head.getLong(0) == dayCount,
      "islands must partition the distinct (user, day) grid")
    // maximality: no two islands of one user touch (end+1 = next start
    // would mean the row_number trick failed to merge them)
    val touching = df.as("a").join(df.as("b"),
      col("a.user_id") === col("b.user_id")
        && date_add(col("a.end_day"), 1) === col("b.start_day"))
    assert(touching.count() == 0, "adjacent islands must have been merged")
    // disjointness: islands of one user never overlap
    val overlapping = df.as("a").join(df.as("b"),
      col("a.user_id") === col("b.user_id")
        && col("a.start_day") < col("b.start_day")
        && col("a.end_day") >= col("b.start_day"))
    assert(overlapping.count() == 0, "islands of one user must be disjoint")
    df.unpersist()
  }

  test("etl_table_diff: classification matches the churn predicates exactly") {
    val df = SparkEntry.queries("etl_table_diff")(spark, sf0001).cache()
    val keys = Tables(spark, sf0001).orders.select(col("o_orderkey").as("k")).cache()
    // expected sets, derived independently from the churn predicates:
    // %97=0 dropped (removed), %101=0 re-keyed (added), %89=0 among the
    // survivors re-prioritized (changed; priorities are non-palindromic
    // so reverse() always changes the hash — asserted below)
    val removed = keys.filter(col("k") % 97 === 0)
    val added = keys.filter(col("k") % 101 === 0)
    val changed = keys.filter(col("k") % 89 === 0 && col("k") % 97 =!= 0)
    val palindromes = Tables(spark, sf0001).orders
      .filter(reverse(col("o_orderpriority")) === col("o_orderpriority"))
    assert(palindromes.count() == 0, "churn fixture needs non-palindromic priorities")
    def got(kind: String) = df.filter(col("diff_kind") === kind).select("o_orderkey")
    assert(got("removed").exceptAll(removed).count() == 0
      && removed.exceptAll(got("removed")).count() == 0, "removed set mismatch")
    assert(got("changed").exceptAll(changed).count() == 0
      && changed.exceptAll(got("changed")).count() == 0, "changed set mismatch")
    assert(got("added").exceptAll(added.select(col("k") + 10000000L)).count() == 0
      && added.select(col("k") + 10000000L).exceptAll(got("added")).count() == 0,
      "added set mismatch")
    // scale shape: the join must see only (key, hash) — the scan prunes
    // to the 5 hashed columns and o_totalprice never leaves the reader
    val scans = df.queryExecution.executedPlan.toString
    assert(!scans.contains("o_totalprice"), "diff must not read unhashed columns")
    keys.unpersist(); df.unpersist()
  }

  test("etl_cdc_apply: compaction equals an independent replay of the feed") {
    val df = SparkEntry.queries("etl_cdc_apply")(spark, sf0001).cache()
    val o = Tables(spark, sf0001).orders
    // replay the documented feed by hand: deletes (%5=0) win; survivors
    // carry the update's reversed priority iff %3=0; seq/n follow
    val expected = o.filter(col("o_orderkey") % 5 =!= 0).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 3 === 0, 2L).otherwise(1L).as("last_seq"),
      when(col("o_orderkey") % 3 === 0, 2L).otherwise(1L).as("n_changes"),
      when(col("o_orderkey") % 3 === 0, reverse(col("o_orderpriority")))
        .otherwise(col("o_orderpriority")).as("final_priority"))
    assert(df.exceptAll(expected).count() == 0 && expected.exceptAll(df).count() == 0,
      "compacted state must equal the single-threaded replay")
    // delete-wins even though 'D' carries the max seq AND a null payload
    assert(df.filter(col("o_orderkey") % 5 === 0).count() == 0)
    df.unpersist()
  }

  test("agg_hll_partial_merge: bucketed partials merge to the single-pass sketch") {
    val df = SparkEntry.queries("agg_hll_partial_merge")(spark, sf0001).cache()
    // the hash-gated audit column must hold (drift would also fail the oracle)
    assert(df.filter(!col("within_3pct")).count() == 0)
    // re-aggregation invariance — the property that makes persisted
    // partials USEFUL: merging the 8 bucket sketches gives the same
    // estimate as one sketch over the raw column (same lgK ⇒ same
    // register state under union)
    val orders = Tables(spark, sf0001).orders
    val direct = orders.groupBy("o_orderstatus")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 14))").as("d"))
    val merged = orders
      .groupBy(col("o_orderstatus"), graft.Norm.hashBucket(col("o_orderkey"), 8).as("b"))
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"))
      .groupBy("o_orderstatus")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("m"))
    assert(direct.join(merged, Seq("o_orderstatus")).filter(col("d") =!= col("m")).count() == 0,
      "bucketed union must reproduce the single-pass sketch estimate")
    df.unpersist()
  }

  test("events_markov_transitions: rows normalize and transitions are conserved") {
    val df = SparkEntry.queries("events_markov_transitions")(spark, sf0001).cache()
    val ev = Tables(spark, sf0001).events
    // conservation: every event except each user's first is a transition
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(df.agg(sum("n")).head.getLong(0) == expected,
      "transition counts must partition the non-initial events")
    // each from-row of the matrix is a probability distribution
    val rows = df.groupBy("from_type").agg(sum("p").as("sp")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"row ${r.getString(0)} does not normalize: ${r.getDouble(1)}"))
    assert(df.filter(col("p") <= 0 || col("p") > 1).count() == 0)
    df.unpersist()
  }

  test("agg_distinct_overlap: intersections match set arithmetic per pair") {
    val df = SparkEntry.queries("agg_distinct_overlap")(spark, sf0001).cache()
    val o = Tables(spark, sf0001).orders
    def segment(st: String) = o.filter(col("o_orderstatus") === st)
      .select("o_custkey").distinct()
    // recompute every emitted pair with plain set intersection
    df.collect().foreach { r =>
      val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b, "pairs must be emitted once, ordered")
      val expected = segment(a).intersect(segment(b)).count()
      assert(n == expected, s"overlap($a,$b)=$n, set intersection says $expected")
      assert(n <= math.min(segment(a).count(), segment(b).count()))
    }
    df.unpersist()
  }

  test("text_repetition_topngram: argmax matches a single-threaded reference") {
    val df = SparkEntry.queries("text_repetition_topngram")(spark, sf0001).cache()
    val docs = Tables(spark, sf0001).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(df.count() == docs.size, "every document (all have ≥4 words here) must be scored")
    // a 3-gram occurrence contains its prefix 2-gram, so max2 ≥ max3
    assert(df.filter(col("top2_cnt") < col("top3_cnt")).count() == 0)
    assert(df.filter(col("top2_frac") <= 0 || col("top2_frac") > 1).count() == 0)
    // keep equals its published predicate row by row
    assert(df.filter((col("keep") === 1) =!=
      (col("top2_frac") <= 0.04 && col("top3_frac") <= 0.025)).count() == 0)
    // and the gate splits the corpus
    assert(df.select("keep").distinct().count() == 2, "gate must discriminate")
    // spot-check the distributed argmax against a plain-Scala reference
    def topGram(words: Array[String], n: Int): (String, Long) = {
      val counts = words.sliding(n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, occ) => g -> occ.size.toLong }
      counts.toSeq.minBy { case (g, c) => (-c, g) }
    }
    val sample = df.orderBy("doc_id").limit(25).collect()
    sample.foreach { row =>
      val words = docs(row.getLong(0)).trim.split(" ")
      val (g2, c2) = topGram(words, 2)
      val (g3, c3) = topGram(words, 3)
      assert(row.getAs[String]("top2_gram") == g2 && row.getAs[Long]("top2_cnt") == c2,
        s"doc ${row.getLong(0)}: expected 2-gram ($g2,$c2)")
      assert(row.getAs[String]("top3_gram") == g3 && row.getAs[Long]("top3_cnt") == c3,
        s"doc ${row.getLong(0)}: expected 3-gram ($g3,$c3)")
    }
    // window-free: the per-doc argmax is a struct-min aggregation
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "argmax must stay an aggregation, not a window")
    df.unpersist()
  }
}
