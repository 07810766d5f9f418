package graft.streaming

import graft.etl.MergeUpsert
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming ingest path (SURVEY §2.9 stretch scope).
  *
  * The reference has no streaming — its incremental story is re-runnable
  * batch (NOT-EXISTS-guarded inserts, 07_SubsequentLoading.sql). This
  * module is the streaming analog of the same contract: an events source →
  * watermark → tumbling-window aggregation, with a `foreachBatch` hook
  * that can feed graft.etl.MergeUpsert for idempotent sink maintenance.
  *
  * At scale: the windowed aggregation keeps per-(window, event_type) state
  * only; the 1-hour watermark bounds state size; the sink merge is keyed on
  * the window start so replays are idempotent — exactly the reference's
  * MERGE semantics, applied continuously.
  */
object EventsStream {

  /** Schema of the events table (TESTDATA.md), ts as epoch-micros long
    * (parquet TIMESTAMP(NANOS) is pre-converted by the caller). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Windowed aggregation over a streaming DataFrame: 1-hour tumbling
    * windows per event type with a 1-hour watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("total_value"))

  // ── stateful sessionization ────────────────────────────────────────────

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  final case class SessionState(start: Long, lastTs: Long, n: Int)
  final case class Session(user_id: Long, session_start_ms: Long, session_end_ms: Long, n_events: Int)

  val GapMs = 30 * 60 * 1000L

  /** Gap-based sessionization with explicit state
    * (`flatMapGroupsWithState`): a >30 min silence closes the session.
    * Sessions still open when the stream ends stay in state (they would be
    * flushed by the processing-time timeout in a live deployment).
    *
    * State per user is three longs — bounded regardless of corpus size —
    * and the stream shuffles once on user_id: the scalable shape for
    * billions of events.
    *
    * Delivery contract (deliberately LOOSER than the ordered per-event
    * feeds' — gap semantics don't need a total order): arrivals sort
    * within a delivery; across deliveries, an event at or before the
    * open session's end joins that session WITHOUT moving its end
    * backward (max below — a regressed end could split later events
    * spuriously), and a closed session is never re-opened. */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) => {
          val sorted = evs.map(_.ts.getTime).toArray.sorted
          var st     = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          sorted.foreach { t =>
            st match {
              case Some(s) if t - s.lastTs <= GapMs =>
                st = Some(s.copy(lastTs = math.max(s.lastTs, t), n = s.n + 1))
              case Some(s) =>
                closed += Session(userId, s.start, s.lastTs, s.n)
                st = Some(SessionState(t, t, 1))
              case None =>
                st = Some(SessionState(t, t, 1))
            }
          }
          st.foreach(state.update)
          closed.iterator
        })
  }

  /** Start stateful sessionization from a parquet directory into a memory
    * sink. */
  def startSessionize(spark: SparkSession, sourceDir: String, queryName: String): StreamingQuery = {
    import spark.implicits._
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
      .select("event_id", "ts", "user_id").as[Ev]
    sessionize(src).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── streaming journey transitions ──────────────────────────────────────

  final case class EvT(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String)
  final case class TransState(lastMicros: Long, lastEventId: Long, lastType: String)
  final case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Full-precision epoch micros — the granularity Spark timestamps carry.
    * getTime alone is MILLIS and would collapse sub-ms orderings that the
    * batch op's (ts, event_id) window sort distinguishes. */
  private def tsMicros(t: java.sql.Timestamp): Long =
    // floorDiv, not /: truncation-toward-zero would order a pre-epoch
    // timestamp's sub-second part POSITIVE, colliding with post-epoch ones
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** The shared per-delivery ordering both stateful feeds sort arrivals
    * by — the batch ops' exact (ts, event_id) total order. */
  private def orderedArrivals(evs: Iterator[EvT]): Array[EvT] =
    evs.toArray.sortBy(e => (tsMicros(e.ts), e.event_id))

  /** The shared late-regression predicate: an arrival at (m, id) that is
    * not strictly after the stored (lastMicros, lastEventId) position is
    * a re-delivery or out-of-order straggler and is dropped
    * deterministically — one rule for both ORDERED per-event feeds
    * (transitions, funnelMatches), so their delivery contracts cannot
    * drift apart. (sessionize is deliberately not under this rule: gap
    * semantics tolerate reordering — see its own contract note.) */
  private def isLate(lastMicros: Long, lastEventId: Long, m: Long, id: Long): Boolean =
    lastMicros > m || (lastMicros == m && lastEventId >= id)

  /** Streaming event-type transitions — the incremental feed of the batch
    * `events_markov_transitions` matrix: each arriving event emits one
    * (from, to) bigram against its user's previous event, held in state.
    * State per user is one (micros, id, type) triple — bounded regardless
    * of volume — and the stream shuffles once on user_id. Within a
    * delivery events sort by (micros, event_id), the batch op's exact
    * order; across deliveries an event that regresses behind the stored
    * state is LATE and is dropped deterministically (the watermark-style
    * choice: a deterministic drop beats silently emitting a backwards
    * bigram the batch op would never produce), so replay equivalence
    * holds exactly under in-order delivery per user — the same delivery
    * contract the SCD2 sink documents. */
  def transitions(events: Dataset[EvT]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[EvT], state: GroupState[TransState]) => {
          val sorted = orderedArrivals(evs)
          var st     = state.getOption
          val out    = scala.collection.mutable.ArrayBuffer.empty[Transition]
          sorted.foreach { e =>
            val m = tsMicros(e.ts)
            val late = st.exists(s => isLate(s.lastMicros, s.lastEventId, m, e.event_id))
            if (!late) {
              st.foreach(s => out += Transition(userId, s.lastType, e.event_type))
              st = Some(TransState(m, e.event_id, e.event_type))
            } // else: regressed behind state (earlier delivery) — dropped
          }
          st.foreach(state.update)
          out.iterator
        })
  }

  /** Start the transition feed from a parquet directory into a memory
    * sink. */
  def startTransitions(spark: SparkSession, sourceDir: String, queryName: String): StreamingQuery = {
    import spark.implicits._
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
      .select("event_id", "ts", "user_id", "event_type").as[EvT]
    transitions(src).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── streaming funnel pattern matching ─────────────────────────────────

  final case class FunnelState(
      lastMicros: Long, lastEventId: Long, candidate: Boolean, nMatches: Long)
  final case class FunnelMatch(user_id: Long, match_no: Long)

  /** Streaming MATCH_RECOGNIZE — the incremental form of the batch
    * win_pattern_match: each completed V C* P funnel emits (user_id,
    * match_no) the moment its purchase arrives, against O(1) state per
    * user (a two-state automaton + the match counter), not a buffered
    * event history.
    *
    * The automaton replays the batch regex scan's leftmost
    * non-overlapping semantics exactly for this pattern shape: candidacy
    * opens at a view, survives clicks AND further views (a later view
    * restarts the candidate window, which consumes the same purchase the
    * regex's later start position would), closes into a match at a
    * purchase, and any other symbol resets it. Non-overlap falls out of
    * the reset-on-match. The equivalence argument is per-pattern — a
    * general streaming regex needs an NFA state vector; the funnel DFA
    * is the shape production journeys overwhelmingly use — and the
    * replay spec holds the count equal to the batch engine's on real
    * files. Delivery contract and late handling are identical to
    * [[transitions]]: in-order per user within a delivery, deterministic
    * drop of regressions. */
  def funnelMatches(events: Dataset[EvT]): Dataset[FunnelMatch] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[EvT], state: GroupState[FunnelState]) => {
          val sorted = orderedArrivals(evs)
          var st     = state.getOption.getOrElse(FunnelState(Long.MinValue, Long.MinValue, false, 0L))
          val out    = scala.collection.mutable.ArrayBuffer.empty[FunnelMatch]
          sorted.foreach { e =>
            val m = tsMicros(e.ts)
            val late = isLate(st.lastMicros, st.lastEventId, m, e.event_id)
            if (!late) {
              val sym = e.event_type match {
                case "view" => 'v'; case "click" => 'c'; case "purchase" => 'p'; case _ => 'x'
              }
              st = sym match {
                case 'v' => st.copy(lastMicros = m, lastEventId = e.event_id, candidate = true)
                case 'c' => st.copy(lastMicros = m, lastEventId = e.event_id)
                case 'p' if st.candidate =>
                  out += FunnelMatch(userId, st.nMatches + 1)
                  FunnelState(m, e.event_id, false, st.nMatches + 1)
                case _ => st.copy(lastMicros = m, lastEventId = e.event_id, candidate = false)
              }
            } // else: regressed behind state (earlier delivery) — dropped
          }
          state.update(st)
          out.iterator
        })
  }

  /** Start the streaming funnel matcher from a parquet directory into a
    * memory sink. */
  def startFunnelMatches(spark: SparkSession, sourceDir: String,
                         queryName: String): StreamingQuery = {
    import spark.implicits._
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
      .select("event_id", "ts", "user_id", "event_type").as[EvT]
    funnelMatches(src).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── streaming per-user SES forecasting ────────────────────────────────

  /** NAMED state-schema version of every flatMapGroupsWithState state in
    * this module ([[SesState]], [[HoltState]], HwState). The state
    * encoder is POSITIONAL: a checkpoint written under a different
    * shape of these case classes cannot restore into the current code
    * — it dies inside Spark's state deserializer with an internal error
    * that names neither the query nor the cause. BUMP this constant on
    * ANY field change to one of the state classes (r13's addition of
    * (lastMicros, lastEventId) is version 2's break), and route durable
    * checkpoint locations through [[versionedCheckpoint]]: a restart
    * across a bump then resolves a FRESH checkpoint path — a clean,
    * explained re-read of the source — instead of an unnamed crash, and
    * the stale directory remains on disk for inspection. The memory-sink
    * start helpers in this file use ephemeral checkpoints and are
    * unaffected; this is for callers composing sesDays/holtDays/hwDays
    * with their own durable sinks. */
  val StateVersion: Int = 2

  /** The state-schema-qualified checkpoint location for a durable sink
    * over the stateful day-fold queries — see [[StateVersion]]. */
  def versionedCheckpoint(checkpointDir: String): String =
    s"$checkpointDir/state-v$StateVersion"

  final case class SesState(curDay: Long, curCount: Long, level: Long, closedDays: Long,
      lastMicros: Long, lastEventId: Long)
  final case class SesDay(user_id: Long, day: Long, n: Long, level: Long,
      forecast: Option[Long])

  /** Streaming per-user SES — the incremental feed of the grouped
    * forecasting fold (events_forecast_ses_grouped's recursion, run as
    * each day CLOSES instead of over a collected day array): state per
    * user is ONE (open day, its running count, the level through the
    * last closed day) triple plus the last (micros, event_id) position,
    * and a day closes the moment a later-day event for that user
    * arrives — emitting its (n, level, forecast = previous level) row,
    * with interior silent days closing as n = 0 steps so the recursion
    * advances exactly like the batch day spine. The final open day
    * never emits (its count is not yet complete; a live deployment
    * flushes it by timeout).
    *
    * Domain contract: the recursion starts at each USER's first observed
    * day — a stream cannot know the corpus-global spine start the batch
    * grid uses — so replay equivalence is against [[graft.ops.EventsOps
    * .sesLevels]] over the user's own observed span (the spec pins
    * exactly that). Late handling matches [[transitions]] EXACTLY: the
    * stored (micros, event_id) position drops any non-strictly-after
    * arrival, so an at-least-once RE-DELIVERY of an event on the still
    * open day cannot double-count it (day-level regression checks alone
    * would) — counts are exact under per-user in-order delivery,
    * re-deliveries of already-seen positions included. `day` rides as
    * epoch days (tsMicros div 86.4e9 — micros are UTC, matching the
    * batch ops' session timezone).
    *
    * State-schema note: [[SesState]] gained (lastMicros, lastEventId)
    * in r13 — the flatMapGroupsWithState state encoder is positional,
    * so a checkpoint written by the PRE-r13 four-field SesState cannot
    * restore into this query. That break is now NAMED: [[StateVersion]]
    * (bumped to 2 by exactly that change) + [[versionedCheckpoint]]
    * give durable-sink callers a checkpoint path that rolls cleanly
    * across state-schema bumps instead of dying inside Spark's state
    * deserializer with an unnamed internal error. */
  def sesDays(events: Dataset[EvT]): Dataset[SesDay] = {
    import events.sparkSession.implicits._
    val dayUs = 86400L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[EvT], state: GroupState[SesState]) => {
          val sorted = orderedArrivals(evs)
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[SesDay]
          // close the open day: emit its row and fold it into the level
          def close(s: SesState, n: Long, day: Long): SesState = {
            val (level, fc) =
              if (s.closedDays == 0L) (n, None)
              else (Math.floorDiv(n + 3 * s.level, 4), Some(s.level))
            out += SesDay(userId, day, n, level, fc)
            s.copy(curDay = day, curCount = 0L, level = level, closedDays = s.closedDays + 1)
          }
          sorted.foreach { e =>
            val m = tsMicros(e.ts)
            val day = Math.floorDiv(m, dayUs)
            if (st == null) st = SesState(day, 1L, 0L, 0L, m, e.event_id)
            else if (isLate(st.lastMicros, st.lastEventId, m, e.event_id)) {
              // re-delivery or out-of-order straggler — dropped (the
              // shared ordered-feed rule; covers both an already-closed
              // day AND a re-delivered event on the still-open day)
            } else if (day == st.curDay)
              st = st.copy(curCount = st.curCount + 1, lastMicros = m, lastEventId = e.event_id)
            else {
              // strictly-after position ⇒ day > curDay here
              st = close(st, st.curCount, st.curDay)
              var gap = st.curDay + 1
              while (gap < day) { st = close(st, 0L, gap); gap += 1 }
              st = st.copy(curDay = day, curCount = 1L, lastMicros = m, lastEventId = e.event_id)
            }
          }
          if (st != null) state.update(st)
          out.iterator
        })
  }

  /** Start the streaming SES feed from a parquet directory into a memory
    * sink. */
  def startSesDays(spark: SparkSession, sourceDir: String,
                   queryName: String): StreamingQuery = {
    import spark.implicits._
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
      .select("event_id", "ts", "user_id", "event_type").as[EvT]
    sesDays(src).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── streaming per-user Holt forecasting ───────────────────────────────

  final case class HoltState(curDay: Long, curCount: Long, levelU: Long, trendU: Long,
      closedDays: Long, lastMicros: Long, lastEventId: Long)
  final case class HoltDay(user_id: Long, day: Long, n: Long, level_u: Long,
      trend_u: Long, fc_u: Option[Long])

  /** Streaming per-user Holt — [[sesDays]]'s single-state recursion
    * extended to the DOUBLE (level, trend) recursion of
    * events_forecast_holt_grouped, run incrementally as each day
    * closes: state per user grows from one smoothing value to the
    * (levelU, trendU) pair in 2²⁰ fixed-point micro-units, and each
    * closing day folds exactly the batch step — fc = L + T, L' =
    * floor((n·2²⁰ + 3·fc) / 4), T' = floor((L' − L + 3·T) / 4), all
    * floorDiv because the trend (hence numerators) can go negative
    * where truncating division is not portable. Day-close mechanics,
    * silent-day n = 0 steps, the user's-first-observed-day domain
    * contract, and the shared (micros, event_id) late-drop rule are
    * [[sesDays]]'s verbatim; replay equivalence is against
    * [[graft.ops.EventsOps.holtLevels]] over each user's observed span
    * (the spec pins it across micro-batches, so the double recursion
    * provably continues from the state store). */
  def holtDays(events: Dataset[EvT]): Dataset[HoltDay] = {
    import events.sparkSession.implicits._
    val dayUs = 86400L * 1000000L
    val unit  = 1L << 20
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[EvT], state: GroupState[HoltState]) => {
          val sorted = orderedArrivals(evs)
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[HoltDay]
          def close(s: HoltState, n: Long, day: Long): HoltState = {
            val (lvl, tr, fc) =
              if (s.closedDays == 0L) (n * unit, 0L, None)
              else {
                val f  = s.levelU + s.trendU
                val nl = Math.floorDiv(n * unit + 3 * f, 4)
                (nl, Math.floorDiv(nl - s.levelU + 3 * s.trendU, 4), Some(f))
              }
            out += HoltDay(userId, day, n, lvl, tr, fc)
            s.copy(curDay = day, curCount = 0L, levelU = lvl, trendU = tr,
              closedDays = s.closedDays + 1)
          }
          sorted.foreach { e =>
            val m = tsMicros(e.ts)
            val day = Math.floorDiv(m, dayUs)
            if (st == null) st = HoltState(day, 1L, 0L, 0L, 0L, m, e.event_id)
            else if (isLate(st.lastMicros, st.lastEventId, m, e.event_id)) {
              // re-delivery or straggler — dropped (shared ordered-feed rule)
            } else if (day == st.curDay)
              st = st.copy(curCount = st.curCount + 1, lastMicros = m, lastEventId = e.event_id)
            else {
              st = close(st, st.curCount, st.curDay)
              var gap = st.curDay + 1
              while (gap < day) { st = close(st, 0L, gap); gap += 1 }
              st = st.copy(curDay = day, curCount = 1L, lastMicros = m, lastEventId = e.event_id)
            }
          }
          if (st != null) state.update(st)
          out.iterator
        })
  }

  /** Start the streaming Holt feed from a parquet directory into a
    * memory sink. */
  def startHoltDays(spark: SparkSession, sourceDir: String,
                    queryName: String): StreamingQuery = {
    import spark.implicits._
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
      .select("event_id", "ts", "user_id", "event_type").as[EvT]
    holtDays(src).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── streaming per-user Holt–Winters forecasting ───────────────────────

  final case class HwState(curDay: Long, curCount: Long, levelU: Long, trendU: Long,
      ring: Seq[Long], closedDays: Long, lastMicros: Long, lastEventId: Long)
  final case class HwDay(user_id: Long, day: Long, n: Long, level_u: Long,
      trend_u: Long, seas_u: Long, fc_u: Option[Long])

  /** Streaming per-user Holt–Winters — the recursion family's streaming
    * capstone: [[holtDays]]'s state pair grows to (levelU, trendU, a
    * 7-slot seasonal RING), so every batch fold shape (single-state
    * SES, double Holt, ring-buffer HW) now has an incremental twin.
    * Each closing day folds exactly the batch step of
    * [[graft.ops.EventsOps.hwLevels]]: sm = due slot; fc = L + T + sm;
    * L' = floor((n·2²⁰ − sm + 3(L+T)) / 4); T' = floor((L' − L + 3T) /
    * 4); S' = floor((n·2²⁰ − L' + 3·sm) / 4); ring rotates S' in.
    * State per user is 9 longs + the 7-slot ring — still O(1) and
    * bounded at any event rate. Day-close mechanics, silent-day n = 0
    * steps, the first-observed-day domain contract, and the
    * (micros, event_id) late-drop rule are [[sesDays]]'s verbatim;
    * the replay spec pins hwLevels equivalence across micro-batches,
    * proving the ring rotates correctly through the state store. */
  def hwDays(events: Dataset[EvT]): Dataset[HwDay] = {
    import events.sparkSession.implicits._
    val dayUs = 86400L * 1000000L
    val unit  = 1L << 20
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[EvT], state: GroupState[HwState]) => {
          val sorted = orderedArrivals(evs)
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[HwDay]
          def close(s: HwState, n: Long, day: Long): HwState = {
            val (lvl, tr, sn, fc, ring) =
              if (s.closedDays == 0L)
                (n * unit, 0L, 0L, None, s.ring)
              else {
                val sm = s.ring.head
                val f  = s.levelU + s.trendU + sm
                val nl = Math.floorDiv(n * unit - sm + 3 * (s.levelU + s.trendU), 4)
                val nt = Math.floorDiv(nl - s.levelU + 3 * s.trendU, 4)
                val ns = Math.floorDiv(n * unit - nl + 3 * sm, 4)
                (nl, nt, ns, Some(f), s.ring.tail :+ ns)
              }
            out += HwDay(userId, day, n, lvl, tr, sn, fc)
            s.copy(curDay = day, curCount = 0L, levelU = lvl, trendU = tr,
              ring = ring, closedDays = s.closedDays + 1)
          }
          sorted.foreach { e =>
            val m = tsMicros(e.ts)
            val day = Math.floorDiv(m, dayUs)
            if (st == null)
              st = HwState(day, 1L, 0L, 0L, Vector.fill(7)(0L), 0L, m, e.event_id)
            else if (isLate(st.lastMicros, st.lastEventId, m, e.event_id)) {
              // re-delivery or straggler — dropped (shared ordered-feed rule)
            } else if (day == st.curDay)
              st = st.copy(curCount = st.curCount + 1, lastMicros = m, lastEventId = e.event_id)
            else {
              st = close(st, st.curCount, st.curDay)
              var gap = st.curDay + 1
              while (gap < day) { st = close(st, 0L, gap); gap += 1 }
              st = st.copy(curDay = day, curCount = 1L, lastMicros = m, lastEventId = e.event_id)
            }
          }
          if (st != null) state.update(st)
          out.iterator
        })
  }

  /** Start the streaming Holt–Winters feed from a parquet directory into
    * a memory sink. */
  def startHwDays(spark: SparkSession, sourceDir: String,
                  queryName: String): StreamingQuery = {
    import spark.implicits._
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
      .select("event_id", "ts", "user_id", "event_type").as[EvT]
    hwDays(src).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── streaming windowed heavy hitters ──────────────────────────────────

  /** Windowed streaming heavy hitters — the same mergeable SpaceSaving
    * TypedImperativeAggregate the batch text_heavy_hitters op uses,
    * running unchanged inside a watermarked 6-hour tumbling window over
    * the event property values. This is the point of building sketches
    * as mergeable aggregates: streaming state per window is the fixed
    * O(capacity) counter summary, partials combine map-side within each
    * micro-batch, and the watermark retires window state — bounded
    * memory at any event rate. Per-item estimates are merge-order-
    * dependent (documented on the batch op too); the replay-equivalence
    * spec checks the order-independent guarantees instead: summary size
    * and guaranteed-heavy membership match the batch aggregation. */
  def windowedTopK(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .select(window(col("ts"), "6 hours").as("w"),
        regexp_extract(col("props"), "([0-9]+)", 1).as("k_prop"))
      .groupBy("w")
      .agg(expr("spacesaving_topk(k_prop, 32, 32)").as("top"))
      .select(col("w.start").as("window_start"), col("top"))

  /** Start the windowed top-k sketch from a parquet directory into a
    * memory sink. UPDATE mode, deliberately: complete mode never lets the
    * watermark evict window state (Spark retains every window's aggregate
    * forever there), which would contradict the bounded-memory claim
    * above — in update mode the watermark retires windows and the sink
    * receives each window's summary as it is revised. A window may
    * therefore appear once per micro-batch that touched it; readers take
    * the latest row per window (the test harness stages one time-sorted
    * file, so each window appears exactly once). */
  def startWindowedTopK(spark: SparkSession, sourceDir: String, queryName: String): StreamingQuery = {
    graft.functions.SpaceSavingTopK.register(spark)
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
    windowedTopK(src).writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── streaming windowed quantiles ──────────────────────────────────────

  /** Windowed streaming quantiles — the mergeable KLL aggregate the batch
    * agg_quantile_sketch op uses, running unchanged inside the same
    * watermarked 6-hour tumbling window as [[windowedTopK]]. Streaming
    * state per open window is one fixed O(k·log n) sketch, partials
    * combine map-side within each micro-batch, and the watermark retires
    * window state — the second demonstration that the sketch family's
    * mergeability is what buys bounded-state streaming for free. The
    * per-window estimates depend on merge order (compaction is
    * randomized-by-structure, documented on the batch op), but the KLL
    * rank guarantee does NOT: every emitted estimate sits within ε of
    * its target rank against the window's exact value distribution
    * regardless of how partials merged — which is exactly what the
    * replay spec asserts per window. */
  def windowedQuantiles(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .select(window(col("ts"), "6 hours").as("w"), col("value"))
      .groupBy("w")
      .agg(expr("kll_quantiles(value, 256, 0.25, 0.5, 0.75, 0.95)").as("q"))
      .select(col("w.start").as("window_start"), col("q"))

  /** Start the windowed quantile sketch from a parquet directory into a
    * memory sink — UPDATE mode for the same watermark-eviction reason as
    * [[startWindowedTopK]]. */
  def startWindowedQuantiles(spark: SparkSession, sourceDir: String,
                             queryName: String): StreamingQuery = {
    graft.functions.KllQuantiles.register(spark)
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
    windowedQuantiles(src).writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── streaming windowed distinct sketches ──────────────────────────────

  /** Windowed streaming distinct-user sketches — the mergeable KMV
    * aggregate the batch agg_overlap_sketch op uses, running unchanged
    * inside the same watermarked 6-hour tumbling window as
    * [[windowedTopK]]. One fixed 8·k-byte sketch per (window, event
    * type) is the whole streaming state, and downstream consumers
    * INTERSECT the emitted sketches with plain array arithmetic
    * ("how many users both viewed and purchased this window") without
    * touching the raw stream again. Unlike SpaceSaving and KLL, the KMV
    * sketch is exactly merge-order-independent — the k smallest distinct
    * hashes of a window are one set no matter how micro-batches sliced
    * it — so the replay spec asserts BIT-IDENTICAL sketches against the
    * batch aggregation, not just preserved guarantees. */
  def windowedDistinctSketch(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .select(window(col("ts"), "6 hours").as("w"), col("event_type"),
        expr("shiftrightunsigned(xxhash64(user_id), 1)").as("h"))
      .groupBy("w", "event_type")
      .agg(expr("kmv_sketch(h, 256)").as("sk"))
      .select(col("w.start").as("window_start"), col("event_type"), col("sk"))

  /** Start the windowed distinct sketch from a parquet directory into a
    * memory sink — UPDATE mode for the same watermark-eviction reason as
    * [[startWindowedTopK]]. `maxFilesPerTrigger` slices the backlog into
    * one-file micro-batches (the replay specs use it to force the
    * cross-batch state-store merge path; readers then take the LAST row
    * per window, each batch's revision superseding the previous). */
  def startWindowedDistinctSketch(spark: SparkSession, sourceDir: String,
                                  queryName: String,
                                  maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    graft.functions.KmvSketch.register(spark)
    val rd = spark.readStream.schema(eventSchema)
    val src = maxFilesPerTrigger.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    windowedDistinctSketch(src).writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── streaming windowed frequency grids ────────────────────────────────

  /** Windowed streaming Count-Min grids — the same linear-sketch
    * aggregate the batch agg_freq_sketch op uses, one fixed 64 KiB
    * (d=4 × w=2048) counter grid per watermarked 6-hour window as the
    * whole streaming state. Downstream consumers answer "how often did
    * THIS key occur in THAT window" with cm_estimate against the emitted
    * grid — no raw-stream replay. Like KMV (and unlike SpaceSaving/KLL),
    * the grid is exactly merge-order independent: element-wise addition
    * commutes, so the replay spec asserts BIT-IDENTICAL grids against
    * the batch aggregation. */
  def windowedFreqSketch(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .select(window(col("ts"), "6 hours").as("w"), col("user_id"))
      .groupBy("w")
      .agg(expr("cm_sketch(user_id, 4, 2048)").as("sk"))
      .select(col("w.start").as("window_start"), col("sk"))

  /** Start the windowed frequency grid from a parquet directory into a
    * memory sink — UPDATE mode for the same watermark-eviction reason as
    * [[startWindowedTopK]]; `maxFilesPerTrigger` as in
    * [[startWindowedDistinctSketch]]. */
  def startWindowedFreqSketch(spark: SparkSession, sourceDir: String,
                              queryName: String,
                              maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    graft.functions.CountMinSketch.register(spark)
    val rd = spark.readStream.schema(eventSchema)
    val src = maxFilesPerTrigger.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    windowedFreqSketch(src).writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── streaming sliding-window distinct sketches ────────────────────────

  /** SLIDING-window streaming distinct-user sketches — the streaming twin
    * of the batch events_sliding_distinct op: window(ts, 24h, 6h) assigns
    * each event to its 4 overlapping windows and one mergeable KMV
    * partial accumulates per window — state is 4 fixed 8·k-byte sketches
    * per open 6-hour stride regardless of event rate, and the watermark
    * retires them. This is the trailing-DAU feed computed ON ARRIVAL
    * instead of by the batch op's anchor range join; KMV's exact
    * merge-order independence means the replay spec asserts BIT-IDENTICAL
    * sketches against a batch aggregation over the same sliding grid. */
  def slidingDistinctSketch(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .select(window(col("ts"), "24 hours", "6 hours").as("w"),
        expr("shiftrightunsigned(xxhash64(user_id), 1)").as("h"))
      .groupBy("w")
      .agg(expr("kmv_sketch(h, 256)").as("sk"))
      .select(col("w.start").as("window_start"), col("sk"))

  /** Start the sliding distinct sketch from a parquet directory into a
    * memory sink — UPDATE mode for the same watermark-eviction reason as
    * [[startWindowedTopK]]; `maxFilesPerTrigger` as in
    * [[startWindowedDistinctSketch]]. */
  def startSlidingDistinctSketch(spark: SparkSession, sourceDir: String,
                                 queryName: String,
                                 maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    graft.functions.KmvSketch.register(spark)
    val rd = spark.readStream.schema(eventSchema)
    val src = maxFilesPerTrigger.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    slidingDistinctSketch(src).writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── streaming windowed exact top-k ────────────────────────────────────

  /** Windowed streaming exact top-k — the mergeable TopKByScore aggregate
    * the batch agg_topk_heap op uses, running unchanged inside the same
    * watermarked 6-hour tumbling window as [[windowedTopK]]: the
    * highest-value events per (window, event type), O(k) state per open
    * group, partials combined map-side within each micro-batch. This is
    * the top-N that ROW_NUMBER cannot express on a stream (WindowExec is
    * unsupported on streaming Datasets) — the aggregate algebra is the
    * only shape that works both at 100 TB batch and on the live stream.
    * Under the total order (score DESC, id ASC) the top-k of a multiset
    * is uniquely determined, so like KMV/Count-Min (and unlike
    * SpaceSaving/KLL) the result is exactly merge-order independent and
    * the replay spec asserts BIT-IDENTICAL lists against the batch
    * aggregation. */
  def windowedExactTopK(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .select(window(col("ts"), "6 hours").as("w"), col("event_type"),
        col("value"), col("event_id"))
      .groupBy("w", "event_type")
      .agg(expr("topk_by_score(value, event_id, 3)").as("top"))
      .select(col("w.start").as("window_start"), col("event_type"), col("top"))

  /** Start the windowed exact top-k from a parquet directory into a
    * memory sink — UPDATE mode for the same watermark-eviction reason as
    * [[startWindowedTopK]]; `maxFilesPerTrigger` as in
    * [[startWindowedDistinctSketch]]. */
  def startWindowedExactTopK(spark: SparkSession, sourceDir: String,
                             queryName: String,
                             maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    graft.functions.TopKByScore.register(spark)
    val rd = spark.readStream.schema(eventSchema)
    val src = maxFilesPerTrigger.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    windowedExactTopK(src).writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  /** [[windowedExactTopK]] as a DURABLE upsert-to-files sink: each
    * micro-batch's updated (window, type) rows append to `outDir`
    * stamped with the batch id, and the reader takes the max-batch-id
    * revision per key — the standard foreachBatch upsert shape for
    * sinks without native streaming support. Unlike the memory sink
    * (debug-only; Spark refuses to recover it from a checkpoint), this
    * query RESTARTS from `checkpointDir`: offsets resume, the state
    * store reloads the open windows, and batch ids continue — the
    * crash-recovery contract the replay spec kills and resumes. */
  def startWindowedExactTopKToDir(spark: SparkSession, sourceDir: String,
                                  outDir: String, checkpointDir: String,
                                  maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    graft.functions.TopKByScore.register(spark)
    val rd = spark.readStream.schema(eventSchema)
    val src = maxFilesPerTrigger.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    windowedExactTopK(src).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch_id", lit(id))
          .coalesce(1).write.mode("append").parquet(outDir)
      }
      .start()
  }

  // ── streaming exact dedup ──────────────────────────────────────────────

  /** Streaming exact deduplication — the ingest-side shape of the batch
    * `dedup_exact` operator: drop re-deliveries of the same content hash
    * as they arrive, instead of re-scanning the corpus later. State is one
    * entry per distinct (hash-bucketed) key and the watermark lets Spark
    * expire state for hashes older than the event-time horizon — without
    * it, streaming dedup state grows without bound (the classic 100 TB
    * ingest failure mode). Dedup key = (content hash, event type); the
    * payload hash stands in for md5(text) of the documents pipeline. */
  def dedupExact(events: DataFrame): DataFrame =
    events
      .withColumn("content_hash", md5(concat_ws("|", col("event_type"), col("props"))))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")

  /** Start streaming dedup from a parquet directory into a memory sink. */
  def startDedup(spark: SparkSession, sourceDir: String, queryName: String): StreamingQuery = {
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
    dedupExact(src).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── stream-static enrichment join ──────────────────────────────────────

  /** Enrich the event stream with a STATIC dimension. No watermark and no
    * join state — a static join never buffers the stream side, which is
    * what makes it the right shape for firehose-scale enrichment; the
    * stateful alternatives (stream-stream join, mapGroupsWithState
    * lookup) pay state-store costs a static dim never needs.
    *
    * The dim's file listing is pinned when the DataFrame is created: to
    * pick up a refreshed dim table, re-create the dim DataFrame (or call
    * `spark.catalog.refreshByPath`) and restart the query — this join
    * does NOT see files that appear under the dim path mid-stream. No
    * broadcast hint: statistics choose broadcast for dim-sized sides and
    * fall back to a shuffle join when the dim outgrows the threshold. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(dim, Seq("user_id"), "left")

  /** Start stream-static enrichment into a memory sink; the dim is the
    * distinct user set of `dimSourceDir` hashed into 4 segments. */
  def startEnrich(spark: SparkSession, sourceDir: String, dimSourceDir: String,
                  queryName: String): StreamingQuery = {
    val dim = spark.read.schema(eventSchema).parquet(dimSourceDir)
      .select(col("user_id")).distinct()
      .withColumn("segment", concat(lit("S"), pmod(col("user_id"), lit(4))))
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
    enrichWithDim(src, dim).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── stream-stream interval join ────────────────────────────────────────

  /** Watermarked stream-stream self-join: attribute each click to the
    * views of the same user in the preceding 10 minutes. The time-bound
    * join condition plus both-side watermarks let Spark expire join
    * state — each side buffers at most (watermark + interval) of data
    * per user, the bounded-state requirement for an unbounded stream.
    * One shuffle per side on user_id. */
  def clickAttribution(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    views.join(
        clicks,
        col("v_user") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("interval 10 minutes"))
      .select(
        col("c_user").as("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Start the attribution join from a parquet directory into a memory
    * sink. */
  def startAttribution(spark: SparkSession, sourceDir: String, queryName: String): StreamingQuery = {
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
    clickAttribution(src).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── foreachBatch + MERGE sink ──────────────────────────────────────────

  /** Continuous refresh of a parquet aggregate table: each micro-batch's
    * windowed counts MERGE-upsert into the target keyed on
    * (window_start, event_type) — the streaming version of the reference's
    * idempotent subsequent load (07_SubsequentLoading.sql MERGE contract).
    * Replayed batches overwrite with identical values, so the sink is
    * effectively exactly-once at the aggregate grain. */
  def startMergeSink(spark: SparkSession, sourceDir: String, targetDir: String): StreamingQuery = {
    val src = spark.readStream.schema(eventSchema).parquet(sourceDir)
    windowedCounts(src).writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // The target is aggregate-grain (small); snapshot it into memory
        // before overwriting so no lazy scan races the rewrite. A real
        // deployment would use a transactional table format's MERGE here —
        // the upsert semantics (graft.etl.MergeUpsert) are the same.
        val target = try {
          val d = spark.read.parquet(targetDir)
          spark.createDataFrame(d.collectAsList(), d.schema)
        } catch {
          case _: Throwable =>
            spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), batch.schema)
        }
        MergeUpsert.upsert(target, batch, Seq("window_start", "event_type"))
          .write.mode("overwrite").parquet(targetDir)
        spark.catalog.refreshByPath(targetDir)
      }
      .start()
  }

  /** Start the stream from a directory of parquet event files into an
    * in-memory sink (used by tests; swap format for a real sink). */
  def start(spark: SparkSession, sourceDir: String, queryName: String): StreamingQuery = {
    val src = spark.readStream
      .schema(eventSchema)
      .parquet(sourceDir)
    windowedCounts(src).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
