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
