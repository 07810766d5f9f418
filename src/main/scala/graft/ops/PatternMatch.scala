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

  /** ALL ROWS PER MATCH — the third MATCH_RECOGNIZE output shape: every
    * EVENT consumed by some match of `pattern` comes back as its own row,
    * tagged with (match_no, seq_idx), i.e. which match consumed it and
    * where it sits in the key's total order. Returns the original event
    * columns plus those two.
    *
    * Match offsets are derived without any per-row regex state machine:
    * `split(seq, pattern)` yields the inter-match segments, and two
    * running sums over (segment length, match length) reconstruct each
    * match's start offset — the same arithmetic in both engines, so the
    * result stays hash-checkable. The per-match rows then explode to
    * per-position rows and join back to the events on the row_number of
    * the same (orderCols) total order. `pattern` must not match the
    * empty string (offset arithmetic needs ≥1 consumed symbol per
    * match — every funnel-shaped pattern satisfies this).
    *
    * Scale shape: the same single key-shuffle as [[count]] for the
    * sequence build, one window-function pass per key for the offsets
    * (rows = matches per key, bounded by the sequence contract), and one
    * co-partitioned join back on (key, seq_idx). */
  def allRows(
      events: DataFrame,
      key: String,
      orderCols: Seq[String],
      symbol: Column,
      pattern: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Zero-width matches break the offset reconstruction in a way no
    // arithmetic can repair: java.util.regex's split (which both engines'
    // split delegates to) SKIPS a leading zero-width match while the
    // extract_all find() loop counts it, so segments and matches
    // desynchronize. Fail fast on the statically checkable case (a
    // pattern matching the empty string) and fail LOUDLY at runtime on
    // the rest (mid-string lookahead matches) — a wrong (match_no,
    // seq_idx) tag is strictly worse than an error.
    require(!"".matches(pattern), "pattern must not match the empty string")
    val exploded = seqDf(events, key, orderCols, symbol)
      .select(col(key), col("seq"),
        posexplode(regexp_extract_all(col("seq"), lit(pattern), lit(0))))
      .select(col(key), col("pos"), col("col").as("m"),
        // the assert_true rides INSIDE seg_len (adds 0 on success) so
        // column pruning can never optimize the check away
        (length(element_at(split(col("seq"), pattern), col("pos") + 1)) +
          coalesce(
            assert_true(length(col("col")) > 0,
              lit("allRows: zero-width match — the pattern must consume at least " +
                "one symbol per match")).cast("int"),
            lit(0))).as("seg_len"))
    val w = Window.partitionBy(col(key)).orderBy(col("pos"))
    val cumSeg = sum(col("seg_len")).over(w) // segments up to AND incl. this match's
    val cumMatchPrev = coalesce(
      sum(length(col("m"))).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val perPos = exploded
      .withColumn("start_pos", (cumSeg + cumMatchPrev + 1).cast("long"))
      .select(col(key), (col("pos") + 1).cast("long").as("match_no"),
        explode(sequence(col("start_pos"),
          col("start_pos") + length(col("m")).cast("long") - 1)).as("seq_idx"))
    val ev = events.withColumn("seq_idx",
      row_number().over(Window.partitionBy(col(key)).orderBy(orderCols.map(col): _*)).cast("long"))
    ev.join(perPos, Seq(key, "seq_idx"))
  }

  /** The shared DEFINE/ORDER step all three entry points build on — one
    * (key, seq) row per key, where seq is the classifier trace in total
    * (orderCols) order: collect_list → array_sort → symbol projection →
    * join, as one aggregate expression (partials merge map-side). Any
    * change to the ordering or classifier contract lands here once, so
    * count, measures, and allRows can never disagree on match
    * boundaries. */
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
