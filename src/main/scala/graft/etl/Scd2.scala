package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 maintenance.
  *
  * Reference: the SCD2 procedures at /root/reference/06_Type2_DimBook.sql:22-113
  * and 06_Type2_DimMembers.sql:4-117 — close the current version
  * (expiration_date := changeDate - 1, curr_ind := 'N') and append a new
  * current version when any tracked attribute changed.
  *
  * Spark realization: a single batch rewrite. No row-at-a-time MERGE —
  * the dim is joined once against the change set on the business key,
  * split into (unchanged ∪ closed-old ∪ new-version), and written back.
  * At scale this is one shuffle on the business key (zero if the dim is
  * bucketed by it); the change set is usually small → AQE broadcasts it.
  */
object Scd2 {

  val EndOfTime = "9999-12-31"

  /** Initialize a dim from a source snapshot: version 1, open-ended. */
  def initial(src: DataFrame, effectiveDate: String): DataFrame =
    src
      .withColumn("effective_date", lit(effectiveDate).cast("date"))
      .withColumn("expiration_date", lit(EndOfTime).cast("date"))
      .withColumn("curr_ind", lit("Y"))

  /** Apply a change set to an SCD2 dim.
    *
    * @param dim        current dim rows carrying effective_date /
    *                   expiration_date / curr_ind
    * @param changes    new attribute values, one row per business key
    * @param keyCols    business key columns
    * @param trackedCols attribute columns whose change forces a new version
    * @param changeDate effective date of the new versions (yyyy-MM-dd)
    */
  def apply(dim: DataFrame, changes: DataFrame, keyCols: Seq[String], trackedCols: Seq[String], changeDate: String): DataFrame =
    applyTagged(dim, changes, keyCols, trackedCols, changeDate).drop(ActionCol)

  /** Name of the action column [[applyTagged]] appends. */
  val ActionCol = "__scd2_action"

  /** Like [[apply]], but each output row carries [[ActionCol]] ∈
    * ('keep' | 'close' | 'open') so callers can post-process the new
    * current versions — e.g. assign them fresh surrogate keys
    * ([[IncrementalLoad]]).
    *
    * Single pass: each joined row is tagged with the action(s) it expands
    * to — ['keep'] for untouched rows, ['close','open'] for a superseded
    * current version — then exploded and projected conditionally on the
    * tag. One join, one projection, no cache (an earlier three-branch
    * union needed a cached join and leaked one cache entry per
    * incremental load into the shared session). */
  def applyTagged(dim: DataFrame, changes: DataFrame, keyCols: Seq[String], trackedCols: Seq[String], changeDate: String): DataFrame = {
    val chg = changes.select((keyCols ++ trackedCols).map(c => col(c).as(s"__chg_$c")): _*)

    val joinCond: Column = keyCols.map(k => col(k) === col(s"__chg_$k")).reduce(_ && _)
    val differs: Column = trackedCols
      .map(c => !(col(c) <=> col(s"__chg_$c"))) // null-safe inequality
      .reduce(_ || _)

    val isCurrentAndChanged = col("curr_ind") === "Y" && col(s"__chg_${keyCols.head}").isNotNull && differs

    // No broadcast hint: the change set is OFTEN small (daily deltas) but
    // can be dim-sized (full-snapshot diff loads) — a hard hint would then
    // force a dim-sized broadcast. AQE broadcasts the small case at
    // runtime from observed sizes; the big case gets the shuffle join it
    // needs. Plan and contract stay in agreement for both regimes.
    val action = col(ActionCol)
    val tagged = dim.join(chg, joinCond, "left_outer")
      .withColumn(ActionCol, explode(
        when(isCurrentAndChanged, array(lit("close"), lit("open"))).otherwise(array(lit("keep")))))

    val outCols = dim.columns.map { c =>
      val out = c match {
        case _ if trackedCols.contains(c) =>
          when(action === "open", col(s"__chg_$c")).otherwise(col(c))
        case "effective_date" =>
          when(action === "open", lit(changeDate).cast("date")).otherwise(col(c))
        case "expiration_date" =>
          when(action === "open", lit(EndOfTime).cast("date"))
            .when(action === "close", date_sub(lit(changeDate).cast("date"), 1))
            .otherwise(col(c))
        case "curr_ind" =>
          when(action === "open", lit("Y"))
            .when(action === "close", lit("N"))
            .otherwise(col(c))
        case _ => col(c)
      }
      out.as(c)
    }.toIndexedSeq

    tagged.select(outCols :+ action.as(ActionCol): _*)
  }

  /** Retroactively CORRECT an SCD2 dim — the "we recorded the wrong
    * attribute back then" repair the close-old/open-new machinery of
    * [[apply]] cannot express: for each business key in `corrections`,
    * the version whose [effective_date, expiration_date] interval
    * CONTAINS `correctionDate` is SPLIT at that date — the original
    * attributes survive on [eff, corrDate−1] (no longer current ⇒ 'N'),
    * the corrected attributes take [corrDate, exp] and inherit the
    * original row's curr_ind. A version whose effective_date equals the
    * correction date has no left piece and is overwritten in place.
    * Versions after the containing one are untouched by contract — they
    * record LATER real-world changes; restating them is a different
    * operation. Same single-pass tag-explode shape as [[applyTagged]]
    * (one key join, no cache), and like it a no-op for versions already
    * carrying the corrected values.
    */
  def correct(
      dim: DataFrame,
      corrections: DataFrame,
      keyCols: Seq[String],
      trackedCols: Seq[String],
      correctionDate: String): DataFrame = {
    val chg0 = corrections.select((keyCols ++ trackedCols).map(c => col(c).as(s"__chg_$c")): _*)
    // in-plan one-row-per-key guard: two correction rows for the same
    // business key would fan out EVERY version of that key through the
    // left join below and silently emit conflicting history. The guard
    // joins the (small) corrections frame against its own per-key counts
    // and aborts loudly on a duplicate (assert_true is NULL on success,
    // so the filter keeps every valid row); AQE broadcasts the count
    // side at change-set size.
    val chgKeys = keyCols.map(k => s"__chg_$k")
    // null business keys would slip PAST the count join below (the
    // equi-join is null-unsafe, so null-keyed rows vanish before the
    // assert sees them) and are malformed anyway — fail them first
    val keysNonNull = chgKeys.map(k => s"`$k` IS NOT NULL").mkString(" AND ")
    val chg = chg0
      .filter(expr(s"isnull(assert_true($keysNonNull, " +
        "'Scd2.correct: corrections must not carry null business keys'))"))
      .join(
        chg0.groupBy(chgKeys.map(col): _*).agg(count(lit(1)).as("__chg_n")),
        chgKeys)
      .filter(expr("isnull(assert_true(__chg_n = 1, " +
        "'Scd2.correct: corrections must carry exactly one row per business key'))"))
      .drop("__chg_n")
    val joinCond: Column = keyCols.map(k => col(k) === col(s"__chg_$k")).reduce(_ && _)
    val cd = lit(correctionDate).cast("date")
    val differs: Column = trackedCols
      .map(c => !(col(c) <=> col(s"__chg_$c")))
      .reduce(_ || _)
    val contains = col("effective_date") <= cd && col("expiration_date") >= cd &&
      col(s"__chg_${keyCols.head}").isNotNull && differs

    val action = col(ActionCol)
    val tagged = dim.join(chg, joinCond, "left_outer")
      .withColumn(ActionCol, explode(
        when(contains && col("effective_date") < cd,
          array(lit("truncate"), lit("corrected")))
          .when(contains, array(lit("overwrite")))
          .otherwise(array(lit("keep")))))
    val outCols = dim.columns.map { c =>
      val out = c match {
        case _ if trackedCols.contains(c) =>
          when(action.isin("corrected", "overwrite"), col(s"__chg_$c")).otherwise(col(c))
        case "effective_date" =>
          when(action === "corrected", cd).otherwise(col(c))
        case "expiration_date" =>
          when(action === "truncate", date_sub(cd, 1)).otherwise(col(c))
        case "curr_ind" =>
          when(action === "truncate", lit("N")).otherwise(col(c))
        case _ => col(c)
      }
      out.as(c)
    }.toIndexedSeq
    tagged.select(outCols: _*)
  }
}
