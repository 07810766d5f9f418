package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable MATCH_RECOGNIZE analog (the Oracle 12c row-pattern clause the
  * reference's dialect ships — `MATCH_RECOGNIZE ... PATTERN (...) DEFINE
  * ...` — re-expressed for Spark; ref usage surface: the analytic
  * reports, e.g. LQY_query1.txt:39-111's per-genre ranked windows, are
  * the dialect surface whose sequential form this clause serves).
  *
  * The DEFINE clause maps each row to a one-character symbol (an
  * arbitrary classifier Column — a `when` chain, a map lookup, a
  * substring); the PATTERN clause is a plain regex over the per-key
  * symbol string, counted non-overlapping left-to-right — the same
  * greedy semantics MATCH_RECOGNIZE's `AFTER MATCH SKIP PAST LAST ROW`
  * produces.
  *
  * Scale shape: ONE shuffle on the partition key; collect_list merges
  * partials map-side; array_sort imposes the total (orderCols) order so
  * both engines' regex sees identical strings. The per-key sequence must
  * be bounded by contract (sessionize first when a key's history is
  * unbounded — events_sessionize is the upstream op for that).
  */
object PatternMatch {

  /** Count non-overlapping `pattern` matches per `key` over the symbol
    * string formed by `symbol` (must emit exactly one character per row)
    * ordered by `orderCols`. The pattern is a plain regex — whole
    * matches (group 0) are counted, so no capture group is required.
    * Returns (key, seq_len, n_matches).
    */
  def count(
      events: DataFrame,
      key: String,
      orderCols: Seq[String],
      symbol: Column,
      pattern: String): DataFrame =
    seqDf(events, key, orderCols, symbol)
      .select(
        col(key),
        length(col("seq")).cast("long").as("seq_len"),
        size(regexp_extract_all(col("seq"), lit(pattern), lit(0))).cast("long").as("n_matches"))

  /** ONE ROW PER MATCH with MEASURES — the Oracle 12c
    * `MATCH_RECOGNIZE ... MEASURES match_number(), ... ONE ROW PER MATCH`
    * analog: every non-overlapping match of `pattern` (same greedy
    * left-to-right semantics as [[count]]) emits a row
    * (key, match_no, matched, match_len), where `match_no` numbers the
    * key's matches in sequence order, `matched` is the matched symbol
    * string (the per-row classifier trace, MATCH_RECOGNIZE's
    * `classifier()` concatenated over the match), and `match_len` is the
    * number of events the match consumed. Keys with no match emit
    * nothing, exactly like ONE ROW PER MATCH.
    *
    * Scale shape: identical to [[count]] — one shuffle on the partition
    * key, map-side-merged collect_list partials — plus a narrow
    * posexplode of the per-key match array (bounded by the per-key
    * sequence contract). */
  def measures(
      events: DataFrame,
      key: String,
      orderCols: Seq[String],
      symbol: Column,
      pattern: String): DataFrame =
    seqDf(events, key, orderCols, symbol)
      .select(col(key), posexplode(regexp_extract_all(col("seq"), lit(pattern), lit(0))))
      .select(
        col(key),
        (col("pos") + 1).cast("long").as("match_no"),
        col("col").as("matched"),
        length(col("col")).cast("long").as("match_len"))

  /** The shared DEFINE/ORDER step both entry points build on — one
    * (key, seq) row per key, where seq is the classifier trace in total
    * (orderCols) order: collect_list → array_sort → symbol projection →
    * join, as one aggregate expression (partials merge map-side). Any
    * change to the ordering or classifier contract lands here once, so
    * count and measures can never disagree on match boundaries. */
  private def seqDf(
      events: DataFrame, key: String, orderCols: Seq[String], symbol: Column): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must impose a total per-key order")
    val ordStruct = struct((orderCols.map(col) :+ symbol.as("i")): _*)
    events
      .groupBy(col(key))
      .agg(array_join(transform(array_sort(collect_list(ordStruct)), x => x.getField("i")), "")
        .as("seq"))
  }
}
