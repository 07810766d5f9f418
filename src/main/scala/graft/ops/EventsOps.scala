package graft.ops

import graft.{Norm, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators over the `events` table — the batch analogs of
  * the Structured Streaming path (graft.streaming.EventsStream runs the
  * same window aggregation incrementally with a watermark; SURVEY §2.9).
  */
object EventsOps {

  val ops: Seq[OpQuery] = Seq(
    // ── events_funnel: event-sequence (funnel) analysis — per user, the
    // first view, the first click strictly after it, and the first
    // purchase strictly after that; stage_reached counts completed steps.
    // Three conditional min-aggregations chained by joins, all
    // co-partitioned on user_id (one shuffle, reused across stages).
    OpQuery.checked(
      "events_funnel",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM events
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
        |      WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
        |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
        |       CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
        |                 WHEN c.t_click IS NOT NULL THEN 2
        |                 WHEN v.t_view IS NOT NULL THEN 1
        |                 ELSE 0 END AS BIGINT) AS stage_reached
        |FROM u
        |  LEFT JOIN v ON v.user_id = u.user_id
        |  LEFT JOIN c ON c.user_id = u.user_id
        |  LEFT JOIN p ON p.user_id = u.user_id""".stripMargin
    ) { (spark, dir) =>
      val ev = Tables(spark, dir).events
      val users = ev.select("user_id").distinct()
      val view = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
      val click = ev.filter(col("event_type") === "click").as("e")
        .join(view, Seq("user_id"))
        .filter(col("ts") > col("t_view"))
        .groupBy("user_id").agg(min(col("ts")).as("t_click"))
      val purchase = ev.filter(col("event_type") === "purchase").as("e")
        .join(click, Seq("user_id"))
        .filter(col("ts") > col("t_click"))
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
      users
        .join(view, Seq("user_id"), "left_outer")
        .join(click, Seq("user_id"), "left_outer")
        .join(purchase, Seq("user_id"), "left_outer")
        .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
          when(col("t_purchase").isNotNull, 3L)
            .when(col("t_click").isNotNull, 2L)
            .when(col("t_view").isNotNull, 1L)
            .otherwise(0L).as("stage_reached"))
    },

    // ── events_window_agg: tumbling-window aggregation (1 h) per event
    // type — the micro-batch equivalent of the streaming windowed count.
    OpQuery.checked(
      "events_window_agg",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |       event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          Norm.dsum6(col("value")).as("total_value"))
    },

    // ── events_sessionize: gap-based sessionization — lag per user, a
    // >30 min gap opens a session, session id = running sum of open flags.
    // One shuffle on user_id; the two windows share the same partitioning.
    OpQuery.checked(
      "events_sessionize",
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > 1800000 OR lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, event_id, ts_ms,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(min(ts_ms) AS BIGINT) AS session_start_ms,
        |       CAST(max(ts_ms) AS BIGINT) AS session_end_ms
        |FROM sessions GROUP BY user_id, session_seq""".stripMargin
    ) { (spark, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      Tables(spark, dir).events
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
        .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 1800000L, 1).otherwise(0))
        .withColumn("session_seq",
          sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .groupBy("user_id", "session_seq")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts_ms")).cast("long").as("session_start_ms"),
          max(col("ts_ms")).cast("long").as("session_end_ms"))
    },

    // ── win_islands: gaps-and-islands — consecutive purchase-day runs
    // per user via the row_number-difference trick (day_num - rn is
    // constant within a consecutive run). The classic DW streak /
    // coverage-hole analysis (reference analog: the LQY reports'
    // per-member activity grain, LQY_query2.txt). Day numbers are
    // integer datediffs from a fixed epoch so the island key is exact
    // integer arithmetic in both engines. The only event-volume shuffle
    // is the (user, day) pre-aggregation, which combines map-side — a
    // hot user costs one counter per day per task. Everything after it
    // (the row_number window and the island rollup) moves per-day rows,
    // bounded by users × calendar span regardless of corpus size, and
    // the window partition is days-per-user, never raw events.
    OpQuery.checked(
      "win_islands",
      """WITH d AS (
        |  SELECT user_id,
        |         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_num,
        |         CAST(count(*) AS BIGINT) AS n_events
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, day_num, n_events,
        |         day_num - row_number() OVER (PARTITION BY user_id ORDER BY day_num) AS island_key
        |  FROM d)
        |SELECT user_id,
        |       DATE '2024-01-01' + CAST(min(day_num) AS INT) AS start_day,
        |       DATE '2024-01-01' + CAST(max(day_num) AS INT) AS end_day,
        |       CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(n_events) AS BIGINT) AS n_events
        |FROM r GROUP BY user_id, island_key""".stripMargin
    ) { (spark, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
      Tables(spark, dir).events
        .filter(col("event_type") === "purchase")
        .groupBy(
          col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("day_num"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("island_key", col("day_num") - row_number().over(byUser))
        .groupBy("user_id", "island_key")
        .agg(
          date_add(lit("2024-01-01").cast("date"), min(col("day_num")).cast("int")).as("start_day"),
          date_add(lit("2024-01-01").cast("date"), max(col("day_num")).cast("int")).as("end_day"),
          count(lit(1)).as("n_days"),
          sum(col("n_events")).as("n_events"))
        .drop("island_key")
    },

    // ── events_markov_transitions: the journey transition matrix —
    // bigram counts of consecutive event types per user, with row-
    // normalized probabilities. The per-user lag window is bounded by
    // events-per-user (bucket by (user, day) at 100 TB, as sessionize
    // documents); the transition count is a map-side-combining hash agg
    // whose output grain is event-type², so the normalizing window runs
    // on a constant-size frame no matter the corpus. p is a single
    // BIGINT/BIGINT division ⇒ engine-exact (the window sum is cast
    // back to BIGINT before dividing — DuckDB widens to HUGEINT). The
    // oracle orders by the MICROSECOND-truncated timestamp (CAST from
    // the parquet's nanosecond type) so both engines resolve ties at
    // the same precision before the event_id tiebreak — Spark truncates
    // to micros on read, and without the cast DuckDB would break
    // sub-microsecond "ties" by nanos that Spark cannot see.
    OpQuery.checked(
      "events_markov_transitions",
      """WITH seq AS (
        |  SELECT event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT prev_type AS from_type, event_type AS to_type,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       n / CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p
        |FROM c""".stripMargin
    ) { (spark, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val byFrom = Window.partitionBy(col("from_type"))
      Tables(spark, dir).events
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n") / sum(col("n")).over(byFrom).cast("long"))
    },

    // ── events_user_path_topk: most-traveled 3-step journeys — the
    // trigram extension of events_markov_transitions' bigram matrix (the
    // path-mining view funnels are designed from). Two lead() taps on
    // the same per-user bounded window, then a map-side-combining count
    // at event-type³ grain; the global top-20 window runs on that
    // constant-size frame, never on events. Full (n desc, path asc)
    // total order keeps cross-engine ranking exact.
    OpQuery.checked(
      "events_user_path_topk",
      """WITH seq AS (
        |  SELECT event_type AS s1,
        |         lead(event_type, 1) OVER (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS s2,
        |         lead(event_type, 2) OVER (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS s3
        |  FROM events),
        |paths AS (
        |  SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE s2 IS NOT NULL AND s3 IS NOT NULL GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY n DESC, s1, s2, s3) AS BIGINT) AS rnk
        |  FROM paths)
        |SELECT s1, s2, s3, n, rnk FROM ranked WHERE rnk <= 20""".stripMargin
    ) { (spark, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(spark, dir).events
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("s1"))
        .withColumn("s2", lead(col("s1"), 1).over(byUser))
        .withColumn("s3", lead(col("s1"), 2).over(byUser))
        .filter(col("s2").isNotNull && col("s3").isNotNull)
        .groupBy("s1", "s2", "s3").agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))).cast("long"))
        .filter(col("rnk") <= 20)
    },

    // ── events_json_props: semi-structured property extraction — regex
    // field pull from the JSON props column, aggregated per event type.
    OpQuery.checked(
      "events_json_props",
      """WITH parsed AS (
        |  SELECT event_type,
        |         CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(sum(k) AS DOUBLE) / count(*) AS avg_k
        |FROM parsed GROUP BY event_type""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).events
        .select(col("event_type"), regexp_extract(col("props"), "([0-9]+)", 1).cast("long").as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("sum_k"),
          (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"))
    },

    // ── events_sliding_distinct: trailing-7-day distinct users per day —
    // the sliding-window cardinality every DAU/WAU dashboard needs, and
    // the aggregate DISTINCT breaks: distinct is not additive, so a naive
    // plan re-scans 7 days of raw events per anchor day (7× the corpus at
    // 100 TB). The scale shape is grain reduction THEN window assembly:
    //   (1) exact branch — dedup once to the (day, user) grain with a
    //       map-side-combining distinct, range-join the 7-day window
    //       ANCHORS onto that grain (fan-out 7 × |user-days|, never
    //       7 × |events|), distinct-count per anchor;
    //   (2) sketch branch — one mergeable HLL partial per day (constant
    //       rows: |days|), each anchor unions its 7 day-sketches — at
    //       100 TB only this branch runs, the union cost is |days| × 7
    //       sketch merges, independent of event volume.
    // The in-plan within_3pct audit hash-gates the sketch against the
    // exact branch (the verification-scale pass), like
    // agg_hll_partial_merge does for the group-merge case.
    OpQuery.checked(
      "events_sliding_distinct",
      """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d FROM ud)
        |SELECT days.d AS day,
        |       CAST(count(DISTINCT ud.user_id) AS BIGINT) AS n_users_7d,
        |       TRUE AS within_3pct
        |FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
        |GROUP BY 1""".stripMargin
    ) { (spark, dir) =>
      val grain = Tables(spark, dir).events
        .select(to_date(col("ts")).as("d"), col("user_id"))
        .distinct() // (day, user) grain: the one pass over raw events
      val anchors = grain.select(col("d").as("day")).distinct()
      // exact branch: anchor ← user-day grain range join (7 × grain rows)
      val exact = anchors
        .join(grain, col("d").between(date_sub(col("day"), 6), col("day")))
        .groupBy("day")
        .agg(countDistinct(col("user_id")).as("n_users_7d"))
      // sketch branch: one HLL partial per day, 7-way union per anchor —
      // the only branch that touches events is the per-day partial build
      val dailySk = Tables(spark, dir).events
        .select(to_date(col("ts")).as("d"), col("user_id"))
        .groupBy("d")
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      val est = anchors
        .join(dailySk, col("d").between(date_sub(col("day"), 6), col("day")))
        .groupBy("day")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      exact.join(est, Seq("day"))
        .select(col("day"), col("n_users_7d"),
          (abs(col("est") - col("n_users_7d")).cast("double")
            <= col("n_users_7d").cast("double") * 0.03).as("within_3pct"))
    },

    // ── events_autocorr: lag-1..3 autocorrelation of the daily event
    // rate per type — the seasonality probe a forecasting/alerting
    // pipeline runs before fitting anything (a strong lag-7 would say
    // "weekday effect"; here lags 1-3 over the 30-day window). Exactness
    // falls out of the GRAIN: the series values are daily COUNTS, i.e.
    // BIGINTs, so every Pearson power sum (Σx, Σy, Σxy, Σx², Σy²) is
    // exact integer arithmetic in both engines and r = (n·Σxy − Σx·Σy)
    // / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) is three mirrored double ops at
    // the very edge (NULL when a side is constant, via nullif). Scale
    // shape: one map-side-combined count to the (type, day) grain —
    // constant in corpus size — then three lag self-joins and the power
    // sums all live on that bounded frame (the events_cusum posture).
    // Gaps pair only EXISTING days (documented; gap-fill first via
    // win_gap_fill if a strict shift is wanted).
    OpQuery.checked(
      "events_autocorr",
      """WITH pd AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type, l.lag, a.n AS x, b.n AS y
        |  FROM pd a
        |  CROSS JOIN (SELECT CAST(unnest(range(1, 4)) AS BIGINT) AS lag) l
        |  JOIN pd b ON b.event_type = a.event_type AND b.d = a.d + CAST(l.lag AS INT)),
        |s AS (
        |  SELECT event_type, lag,
        |         CAST(count(*) AS BIGINT) AS np,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sx2, CAST(sum(y * y) AS BIGINT) AS sy2
        |  FROM pairs GROUP BY 1, 2)
        |SELECT event_type, lag, np,
        |       CAST(np * sxy - sx * sy AS DOUBLE)
        |         / nullif(sqrt(CAST(np * sx2 - sx * sx AS DOUBLE))
        |                  * sqrt(CAST(np * sy2 - sy * sy AS DOUBLE)), 0) AS r
        |FROM s""".stripMargin
    ) { (spark, dir) =>
      val pd = Tables(spark, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val lags = spark.range(1, 4).select(col("id").as("lag"))
      // three lag self-joins of the bounded daily frame: the cross join
      // multiplies a |types|×|days| frame by 3 — still constant-size
      val pairs = pd.toDF("event_type", "d", "x")
        .crossJoin(broadcast(lags))
        .join(pd.toDF("event_type", "d2", "y"), Seq("event_type"))
        .filter(expr("d2 = date_add(d, cast(lag as int))"))
        .select(col("event_type"), col("lag"), col("x"), col("y"))
      val den =
        sqrt((col("np") * col("sx2") - col("sx") * col("sx")).cast("double")) *
          sqrt((col("np") * col("sy2") - col("sy") * col("sy")).cast("double"))
      pairs.groupBy("event_type", "lag")
        .agg(
          count(lit(1)).as("np"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sx2"), sum(col("y") * col("y")).as("sy2"))
        .select(col("event_type"), col("lag"), col("np"),
          ((col("np") * col("sxy") - col("sx") * col("sy")).cast("double")
            / when(den =!= 0, den)).as("r"))
    },

    // ── events_decay_counts: exponentially time-decayed activity counts
    // per event type (half-life = 1 day, evaluated at the corpus's last
    // day) — the recency weighting behind trending/decayed-popularity
    // feeds. Scale shape: the decay NEVER touches raw events — one
    // map-side-combined count to the (type, day) grain first, then the
    // weighted sum runs on that constant-size frame (|types| × |days|
    // rows at 100 TB). Cross-engine exactness: with half-life 1 day the
    // weights are powers of two, so the numerator Σ n_day · 2^(day − d0)
    // is BIGINT (exact in both engines; fits while span + log2(rows) <
    // 63 — 30-day testdata ⇒ ≤ 2^46), and the final ÷ 2^span only
    // shifts the IEEE exponent (numerator < 2^53 ⇒ the double is
    // exact). At production spans the same grain-reduced frame would
    // use float weights exp(−λ·age) — error at the |types|×|days|
    // grain, not per event; the power-of-2 branch is the verification
    // form. Bounds come from a 1-row broadcast aggregate, not a collect.
    OpQuery.checked(
      "events_decay_counts",
      """WITH pd AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(d) AS d0, max(d) AS dT FROM pd)
        |SELECT pd.event_type,
        |       CAST(sum(pd.n) AS BIGINT) AS n_total,
        |       CAST(sum(pd.n * (CAST(1 AS BIGINT) << datediff('day', b.d0, pd.d))) AS BIGINT)
        |         AS decay_num,
        |       CAST(sum(pd.n * (CAST(1 AS BIGINT) << datediff('day', b.d0, pd.d))) AS DOUBLE)
        |         / CAST(CAST(1 AS BIGINT) << datediff('day', b.d0, b.dT) AS DOUBLE)
        |         AS decayed
        |FROM pd, b
        |GROUP BY pd.event_type, b.d0, b.dT""".stripMargin
    ) { (spark, dir) =>
      val pd = Tables(spark, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val bounds = pd.agg(min(col("d")).as("d0"), max(col("d")).as("dT"))
        // in-plan range guard: shiftleft takes the shift count mod 64, so
        // a span >= 62 would silently WRAP the weights (and DuckDB's <<
        // behaves differently) — fail loudly instead of corrupting; the
        // production form for wide spans is the float-weight branch
        // documented above. assert_true returns NULL on success, so the
        // filter keeps the row iff the span is in range.
        .filter(expr("isnull(assert_true(datediff(dT, d0) <= 61, " +
          "'events_decay_counts: day span exceeds the exact power-of-two range (<= 61)'))"))
      pd.crossJoin(broadcast(bounds))
        .withColumn("w", expr("shiftleft(1L, datediff(d, d0))"))
        .groupBy("event_type")
        .agg(
          sum(col("n")).cast("long").as("n_total"),
          sum(col("n") * col("w")).cast("long").as("decay_num"),
          (sum(col("n") * col("w")).cast("double")
            / first(expr("cast(shiftleft(1L, datediff(dT, d0)) as double)")))
            .as("decayed"))
    },

    // ── events_heavy_change: heavy CHANGERS between two periods (the
    // deltoid question of Cormode & Muthukrishnan 2005: which keys'
    // frequencies moved most, not which are big) — the drift alarm a
    // training-data ingest runs between snapshots. Scale shape, three
    // pieces: (1) per-user period counts as ONE map-side-combined
    // conditional aggregation (cutoff = midpoint day from a broadcast
    // 1-row bounds frame, never a collect); (2) the top-10 |delta|
    // selection through the MERGEABLE topk_by_score aggregate — O(k)
    // state per task, no window, no global sort (the aggregate built for
    // exactly this); (3) a per-period Count-Min grid pair whose delta
    // estimate rides the plan for the selected keys, audited against the
    // exact deltas with the one-sided εN bound per side — at 100 TB the
    // grids alone answer "did anything move" before the exact pass runs.
    OpQuery.checked(
      "events_heavy_change",
      """WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS dT FROM events),
        |pc AS (
        |  SELECT e.user_id,
        |         CAST(sum(CASE WHEN CAST(e.ts AS DATE) < b.d0 + CAST(CEIL(datediff('day', b.d0, b.dT) / 2.0) AS INTEGER)
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN CAST(e.ts AS DATE) >= b.d0 + CAST(CEIL(datediff('day', b.d0, b.dT) / 2.0) AS INTEGER)
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM events e, b GROUP BY 1),
        |r AS (
        |  SELECT user_id, n_a, n_b, n_b - n_a AS delta,
        |         CAST(ROW_NUMBER() OVER (ORDER BY abs(n_b - n_a) DESC, user_id ASC) AS BIGINT) AS rn
        |  FROM pc)
        |SELECT rn, user_id, n_a, n_b, delta, TRUE AS within_bound
        |FROM r WHERE rn <= 10""".stripMargin
    ) { (spark, dir) =>
      graft.functions.TopKByScore.register(spark)
      graft.functions.CountMinSketch.register(spark)
      val (d, w) = (4, 2048)
      val ev = Tables(spark, dir).events
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("dT"))
        .select(col("d0"),
          expr("date_add(d0, cast(ceil(datediff(dT, d0) / 2.0) as int))").as("cut"))
      val tagged = ev.crossJoin(broadcast(bounds))
      // (1) one conditional aggregation to the user grain; consumed twice
      // (top-k selection + the stats join back) — persist the grain, not
      // the raw events, so the second consumer re-reads user-proportional
      // state instead of rescanning the corpus (MEMORY_AND_DISK: user
      // grain is still data-proportional at 100 TB, and the level
      // degrades to disk under pressure without forcing the round-trip
      // when it fits — the text_dedup_substring storage story)
      val pc = tagged.groupBy("user_id")
        .agg(
          sum(when(col("day") < col("cut"), 1L).otherwise(0L)).cast("long").as("n_a"),
          sum(when(col("day") >= col("cut"), 1L).otherwise(0L)).cast("long").as("n_b"))
        .withColumn("delta", col("n_b") - col("n_a"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // (2) top-10 movers through the mergeable aggregate — no window
      // (abs(delta) is BIGINT — a primitive numeric the aggregate's
      // checkInputDataTypes admits and its update() widens at eval)
      val top = pc
        .agg(expr("topk_by_score(abs(delta), user_id, 10)").as("top"))
        .select(posexplode(col("top")))
        .select((col("pos") + 1).cast("long").as("rn"), col("col.id").as("user_id"))
        .join(pc, Seq("user_id"))
      // (3) per-period Count-Min grids as ONE always-1-row conditional
      // aggregate (a grouped variant would lose the row — and annihilate
      // the crossJoin output — whenever a period is empty; cm_sketch
      // skips the CASE's nulls, so an empty period is a zero grid)
      val grids = tagged.agg(
        expr(s"cm_sketch(case when day < cut then user_id end, $d, $w)").as("sk_a"),
        expr(s"cm_sketch(case when day >= cut then user_id end, $d, $w)").as("sk_b"),
        sum(when(col("day") < col("cut"), 1L).otherwise(0L)).as("na_tot"),
        sum(when(col("day") >= col("cut"), 1L).otherwise(0L)).as("nb_tot"))
      top.crossJoin(broadcast(grids))
        .select(col("rn"), col("user_id"), col("n_a"), col("n_b"), col("delta"),
          (expr(s"cm_estimate(sk_b, user_id, $d, $w)")
            - expr(s"cm_estimate(sk_a, user_id, $d, $w)")).as("delta_est"),
          col("na_tot"), col("nb_tot"))
        .select(col("rn"), col("user_id"), col("n_a"), col("n_b"), col("delta"),
          (col("delta_est").cast("double")
            >= col("delta").cast("double") - col("na_tot").cast("double") * (8.0 / w)
            && col("delta_est").cast("double")
            <= col("delta").cast("double") + col("nb_tot").cast("double") * (8.0 / w))
            .as("within_bound"))
    },

    // ── events_markov_perplexity: journey anomaly scoring — each user's
    // event sequence scored by the corpus transition matrix (the
    // bot/fraud screen: a journey whose transitions the population
    // rarely makes earns high surprisal). The text_lm_surprisal trick
    // makes it portable: MLE transition probabilities c2(s1,s2)/c1(s1)
    // become INTEGER surprisal bits ilog2(c1) − ilog2(c2) (exact in
    // both engines), per-user BIGINT sums, one final division. Scale
    // shape: the lead() window is partitioned by user_id (millions of
    // small partitions — the events_user_path_topk posture), the count
    // frames live at event-type² grain (≤ |types|² rows, broadcast),
    // and every join is 1:1 per transition.
    OpQuery.checked(
      "events_markov_perplexity",
      """WITH tr AS (
        |  SELECT user_id, event_type AS s1,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2
        |  FROM events),
        |t2 AS (SELECT user_id, s1, s2 FROM tr WHERE s2 IS NOT NULL),
        |c2 AS (SELECT s1, s2, CAST(count(*) AS BIGINT) AS c2 FROM t2 GROUP BY 1, 2),
        |c1 AS (SELECT s1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |j AS (
        |  SELECT t2.user_id,
        |         (length(bin(c1.c1)) - 1) - (length(bin(c2.c2)) - 1) AS bits
        |  FROM t2 JOIN c2 USING (s1, s2) JOIN c1 USING (s1))
        |SELECT user_id,
        |       CAST(count(*) AS BIGINT) AS n_trans,
        |       CAST(sum(bits) AS BIGINT) AS bits_total,
        |       CAST(sum(bits) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS bits_per_trans
        |FROM j GROUP BY 1""".stripMargin
    ) { (spark, dir) =>
      import graft.Norm.ilog2
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val t2 = Tables(spark, dir).events
        .select(col("user_id"), col("event_type").as("s1"),
          lead(col("event_type"), 1).over(w).as("s2"))
        .filter(col("s2").isNotNull)
      val c2 = t2.groupBy("s1", "s2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy("s1").agg(sum(col("c2")).cast("long").as("c1"))
      t2.join(broadcast(c2), Seq("s1", "s2"))
        .join(broadcast(c1), Seq("s1"))
        .select(col("user_id"), (ilog2(col("c1")) - ilog2(col("c2"))).as("bits"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_trans"),
          sum(col("bits")).cast("long").as("bits_total"),
          (sum(col("bits")).cast("double") / count(lit(1)).cast("double"))
            .as("bits_per_trans"))
    },

    // ── events_burst_kleinberg: burst detection over the daily event
    // series — Kleinberg's two-state automaton (Kleinberg, KDD'02,
    // "Bursty and Hierarchical Structure in Streams"): a low state
    // expecting the base rate, a high state expecting 2× it, a cost γ
    // to ENTER the high state, and the minimum-cost state sequence
    // (Viterbi) labels the burst intervals — the principled alternative
    // to per-day thresholding, because isolated spikes don't pay for γ
    // but sustained ones do. Integer-exact variant: emission costs are
    // L1 deviations in "2·D units" — cost_low = |2·D·n_t − 2·N|,
    // cost_high = |2·D·n_t − 4·N| (N = type total, D = day count, so
    // the targets N/D and 2N/D need no division), γ = 2·N — and every
    // tie prefers the low/staying state, making the DP a pure BIGINT
    // computation both engines replay bit-for-bit.
    //
    // Scale shape: the corpus-touching work is ONE map-side-combined
    // aggregate to the (type, day) grain plus the day-spine outer join;
    // the Viterbi itself runs on that BOUNDED frame (|types| × |days|,
    // constant in corpus size — the events_decay/cusum grain-reduction
    // contract). The DP is inherently sequential per type, so it runs
    // as a bounded driver computation (the P×|groups| cell-frame
    // class); the oracle replays it as a forward recursive CTE carrying
    // (cost_low, cost_high, predecessor flags) plus a backward
    // recursion re-walking the argmin decisions.
    OpQuery.checked(
      "events_burst_kleinberg",
      s"""WITH RECURSIVE $dailyGridSql,
        |par AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nd
        |        FROM grid GROUP BY 1),
        |c AS (
        |  SELECT g.event_type, g.t, g.d, g.n,
        |         abs(2 * p.nd * g.n - 2 * p.tot) AS cl,
        |         abs(2 * p.nd * g.n - 4 * p.tot) AS ch,
        |         2 * p.tot AS gam
        |  FROM grid g JOIN par p USING (event_type)),
        |fwd AS (
        |  SELECT event_type, t, cl AS lc, gam + ch AS hc,
        |         CAST(NULL AS BOOLEAN) AS predl, CAST(NULL AS BOOLEAN) AS predh
        |  FROM c WHERE t = 1
        |  UNION ALL
        |  SELECT c.event_type, c.t,
        |         least(f.lc, f.hc) + c.cl,
        |         least(f.lc + c.gam, f.hc) + c.ch,
        |         f.lc <= f.hc,
        |         f.hc <= f.lc + c.gam
        |  FROM fwd f JOIN c ON c.event_type = f.event_type AND c.t = f.t + 1),
        |bwd AS (
        |  SELECT f.event_type, f.t, f.lc <= f.hc AS is_low
        |  FROM fwd f JOIN (SELECT event_type, max(t) AS mt FROM fwd GROUP BY 1) m
        |    ON m.event_type = f.event_type AND m.mt = f.t
        |  UNION ALL
        |  SELECT w.event_type, w.t - 1,
        |         CASE WHEN w.is_low THEN f.predl ELSE NOT f.predh END
        |  FROM bwd w JOIN fwd f ON f.event_type = w.event_type AND f.t = w.t
        |  WHERE w.t > 1)
        |SELECT g.event_type, g.d, g.n,
        |       CAST(CASE WHEN w.is_low THEN 0 ELSE 1 END AS BIGINT) AS burst
        |FROM grid g JOIN bwd w ON w.event_type = g.event_type AND w.t = g.t""".stripMargin
    ) { (spark, dir) =>
      // bounded driver read: |types| × |days| rows, constant in corpus
      // size; Viterbi is sequential in t by nature, per type
      val byType = dailyGrid(Tables(spark, dir).events).collect()
        .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
        .groupBy(_._1)
      // dailyGrid excludes null types by contract; the Option-sort is
      // defense in depth against a future grid change NPE-ing here
      val out = byType.toSeq.sortBy(t => Option(t._1)).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(_._2.toLocalDate.toEpochDay)
        val states = kleinbergStates(sorted.map(_._3).toIndexedSeq)
        sorted.zip(states).map { case ((tp, d, n), hi) =>
          (tp, d, n, if (hi) 1L else 0L)
        }
      }
      spark.createDataFrame(out).toDF("event_type", "d", "n", "burst")
    },

    // ── events_forecast_ses: one-step-ahead forecasting of the daily
    // event rate by simple exponential smoothing (Brown 1956; the
    // baseline every forecasting comparison starts from): level_t =
    // α·n_t + (1−α)·level_{t−1} with α = 1/4, realized as the INTEGER
    // recursion level_t = (n_t + 3·level_{t−1}) div 4 — truncating
    // division on non-negative counts is identical in both engines, so
    // the whole smoothed series, the one-step-ahead forecast
    // (= yesterday's level), and the residual are exact BIGINTs.
    // Same shape as events_burst_kleinberg: the corpus collapses to
    // the bounded (type, day) grid in one map-side-combined pass, the
    // inherently-sequential recursion runs driver-side on that frame,
    // and the oracle replays it as a forward recursive CTE.
    OpQuery.checked(
      "events_forecast_ses",
      s"""WITH RECURSIVE $dailyGridSql,
        |${sesFwdSql("fwd")}
        |SELECT event_type, d, n, CAST(level AS BIGINT) AS level, forecast,
        |       CAST(n - forecast AS BIGINT) AS resid
        |FROM fwd""".stripMargin
    ) { (spark, dir) =>
      val byType = dailyGrid(Tables(spark, dir).events).collect()
        .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
        .groupBy(_._1)
      // dailyGrid excludes null types by contract; the Option-sort is
      // defense in depth against a future grid change NPE-ing here
      val out = byType.toSeq.sortBy(t => Option(t._1)).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(_._2.toLocalDate.toEpochDay)
        val levels = sesLevels(sorted.map(_._3).toIndexedSeq)
        sorted.zip(levels).map { case ((tp, d, n), (level, fc)) =>
          (tp, d, n, level, fc, fc.map(n - _))
        }
      }
      spark.createDataFrame(out)
        .toDF("event_type", "d", "n", "level", "forecast", "resid")
    },

    // ── events_forecast_holt: one-step-ahead forecasting with Holt's
    // linear trend (Holt 1957) — the rung above events_forecast_ses on
    // the same bounded (type, day) grid: a LEVEL and a TREND double
    // recursion with α = β = 1/4, so a steadily growing series stops
    // lagging the way SES does. The state rides 2²⁰ FIXED-POINT
    // micro-units: at unit granularity the floor makes every integer
    // trend in 1..slope a spurious fixpoint (measured: a slope-4 ramp
    // stuck at trend 1), while micro-unit floors lose < 2⁻²⁰ per step
    // and the recursion converges like the real-valued one. Every
    // smoothing step is FLOOR division realized as floor(x / 4.0) —
    // NOT truncating `div`, because the trend (and hence a numerator)
    // can go negative, where truncation is not portable — and the
    // power-of-two idiom makes it exact: the BIGINT numerator is exact
    // in a double while |x| < 2⁵³ (counts up to ~2³¹/day fit), /4
    // shifts the exponent, floor is bit-identical in both engines.
    //   L₁ = n₁·2²⁰, T₁ = 0
    //   fcₜ = Lₜ₋₁ + Tₜ₋₁                       (micro-units)
    //   Lₜ = ⌊(nₜ·2²⁰ + 3·fcₜ)/4⌋
    //   Tₜ = ⌊(Lₜ − Lₜ₋₁ + 3·Tₜ₋₁)/4⌋
    // forecast = ⌊fcₜ/2²⁰⌋ back at count scale. Corpus work is one
    // map-side-combined pass to the bounded grid; the sequential DP
    // runs driver-side on that constant frame; the oracle replays it
    // as a forward recursive CTE (the new level expression is repeated
    // inside the trend term — a recursive CTE row cannot reference its
    // own aliases).
    OpQuery.checked(
      "events_forecast_holt",
      s"""WITH RECURSIVE $dailyGridSql,
        |${holtFwdSql("fwd")}
        |SELECT event_type, d, n, CAST(level_u AS BIGINT) AS level_u, trend_u,
        |       CAST(floor(fc_u / 1048576.0) AS BIGINT) AS forecast,
        |       CAST(n - floor(fc_u / 1048576.0) AS BIGINT) AS resid
        |FROM fwd""".stripMargin
    ) { (spark, dir) =>
      val byType = dailyGrid(Tables(spark, dir).events).collect()
        .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
        .groupBy(_._1)
      // dailyGrid excludes null types by contract; the Option-sort is
      // defense in depth against a future grid change NPE-ing here
      val out = byType.toSeq.sortBy(t => Option(t._1)).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(_._2.toLocalDate.toEpochDay)
        val states = holtLevels(sorted.map(_._3).toIndexedSeq)
        sorted.zip(states).map { case ((tp, d, n), (lu, tu, fcU)) =>
          val fc = fcU.map(Math.floorDiv(_, HoltUnit))
          (tp, d, n, lu, tu, fc, fc.map(n - _))
        }
      }
      spark.createDataFrame(out)
        .toDF("event_type", "d", "n", "level_u", "trend_u", "forecast", "resid")
    },

    // ── events_burst_grouped: Kleinberg burst detection PER USER — the
    // scale path for when the group key is high-cardinality and the
    // |groups| × |days| grid no longer fits the driver (events_burst_
    // kleinberg's |types| grid does; a per-user / per-domain grid grows
    // with the corpus). Identical automaton, different physical shape:
    // the sequential Viterbi runs INSIDE the plan as Catalyst
    // higher-order folds over each group's bounded day array —
    // `aggregate()` carries (lc, hc, pred-flag arrays) forward, a
    // second fold walks the argmin decisions backward — so the DP is
    // distributed by group key with ZERO driver sequencing and no UDF
    // (native HigherOrderFunction expressions; per-group state is
    // O(|days|), bounded by the analysis window). Corpus work is one
    // map-side-combined pass to (user, day) plus the spine join; the
    // per-group array is |days| elements (30 here; a year-long window
    // is 365 — still constant per group). The oracle replays the exact
    // fwd/bwd recursion as recursive CTEs keyed by user — the
    // events_burst_kleinberg oracle with the group key swapped, so the
    // two ops share their decision-for-decision tie contract, and the
    // grouped spec cross-checks the in-plan fold against the pinned
    // driver-side kleinbergStates on every group.
    OpQuery.checked(
      "events_burst_grouped",
      s"""$userGridSql,
        |par AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nd
        |        FROM grid GROUP BY 1),
        |c AS (
        |  SELECT g.user_id, g.t, g.d, g.n,
        |         abs(2 * p.nd * g.n - 2 * p.tot) AS cl,
        |         abs(2 * p.nd * g.n - 4 * p.tot) AS ch,
        |         2 * p.tot AS gam
        |  FROM grid g JOIN par p USING (user_id)),
        |fwd AS (
        |  SELECT user_id, t, cl AS lc, gam + ch AS hc,
        |         CAST(NULL AS BOOLEAN) AS predl, CAST(NULL AS BOOLEAN) AS predh
        |  FROM c WHERE t = 1
        |  UNION ALL
        |  SELECT c.user_id, c.t,
        |         least(f.lc, f.hc) + c.cl,
        |         least(f.lc + c.gam, f.hc) + c.ch,
        |         f.lc <= f.hc,
        |         f.hc <= f.lc + c.gam
        |  FROM fwd f JOIN c ON c.user_id = f.user_id AND c.t = f.t + 1),
        |bwd AS (
        |  SELECT f.user_id, f.t, f.lc <= f.hc AS is_low
        |  FROM fwd f JOIN (SELECT user_id, max(t) AS mt FROM fwd GROUP BY 1) m
        |    ON m.user_id = f.user_id AND m.mt = f.t
        |  UNION ALL
        |  SELECT w.user_id, w.t - 1,
        |         CASE WHEN w.is_low THEN f.predl ELSE NOT f.predh END
        |  FROM bwd w JOIN fwd f ON f.user_id = w.user_id AND f.t = w.t
        |  WHERE w.t > 1)
        |SELECT g.user_id, g.d, g.n,
        |       CAST(CASE WHEN w.is_low THEN 0 ELSE 1 END AS BIGINT) AS burst
        |FROM grid g JOIN bwd w ON w.user_id = g.user_id AND w.t = g.t""".stripMargin
    ) { (spark, dir) =>
      // null group keys excluded on BOTH sides (the dailyGrid contract,
      // applied to user_id)
      userDayArrays(Tables(spark, dir).events)
        .withColumn("nd", size(col("ns")).cast("long"))
        .withColumn("tot", expr("aggregate(ns, cast(0 as bigint), (a, x) -> a + x)"))
        // forward Viterbi: fold t = 2..nd carrying (lc, hc) and the
        // per-step predecessor flags (placeholder at position 1 keeps
        // the arrays aligned with the 1-indexed step number)
        .withColumn("fwd", expr(
          """aggregate(
            |  slice(ns, 2, cast(nd - 1 as int)),
            |  named_struct(
            |    'lc', abs(2 * nd * element_at(ns, 1) - 2 * tot),
            |    'hc', 2 * tot + abs(2 * nd * element_at(ns, 1) - 4 * tot),
            |    'predl', array(false),
            |    'predh', array(false)),
            |  (s, x) -> named_struct(
            |    'lc', least(s.lc, s.hc) + abs(2 * nd * x - 2 * tot),
            |    'hc', least(s.lc + 2 * tot, s.hc) + abs(2 * nd * x - 4 * tot),
            |    'predl', concat(s.predl, array(s.lc <= s.hc)),
            |    'predh', concat(s.predh, array(s.hc <= s.lc + 2 * tot))))""".stripMargin))
        // backward walk: prepend high(t-1) decided by high(t) and the
        // forward flags — exactly kleinbergStates' backward loop
        .withColumn("labels", expr(
          """case when nd = 1 then array(not (fwd.lc <= fwd.hc))
            |else aggregate(
            |  sequence(cast(nd as int) - 1, 1, -1),
            |  array(not (fwd.lc <= fwd.hc)),
            |  (acc, t) -> concat(
            |    array(case when not element_at(acc, 1)
            |               then not element_at(fwd.predl, t + 1)
            |               else element_at(fwd.predh, t + 1) end),
            |    acc))
            |end""".stripMargin))
        .select(col("user_id"), explode(expr("arrays_zip(ds, ns, labels)")).as("z"))
        .select(col("user_id"), col("z.ds").as("d"), col("z.ns").as("n"),
          when(col("z.labels"), 1L).otherwise(0L).as("burst"))
    },

    // ── events_forecast_ses_grouped: SES forecasting PER USER — the
    // events_burst_grouped treatment applied to the forecasting tier:
    // when the series key is high-cardinality (one series per user /
    // customer / domain — the real workload shape), the |groups|×|days|
    // grid outgrows the driver, so the inherently-sequential smoothing
    // recursion runs INSIDE the plan as a Catalyst higher-order fold
    // over each group's bounded day array (O(|days|) state per group,
    // zero driver sequencing, no UDF). Identical integer recursion to
    // events_forecast_ses — level₁ = n₁, levelₜ = (nₜ + 3·levelₜ₋₁)
    // div 4, forecastₜ = levelₜ₋₁ — on the same per-user day spine as
    // events_burst_grouped. The oracle is the sesFwdSql recursive CTE
    // keyed by user; the grouped spec cross-checks the fold against
    // the pinned sesLevels recursion on every group.
    OpQuery.checked(
      "events_forecast_ses_grouped",
      s"""$userGridSql,
        |fwd AS (
        |  SELECT user_id, t, d, n, n AS level, CAST(NULL AS BIGINT) AS forecast
        |  FROM grid WHERE t = 1
        |  UNION ALL
        |  SELECT g.user_id, g.t, g.d, g.n,
        |         (g.n + 3 * f.level) // 4,
        |         f.level
        |  FROM fwd f JOIN grid g ON g.user_id = f.user_id AND g.t = f.t + 1)
        |SELECT user_id, d, n, CAST(level AS BIGINT) AS level, forecast,
        |       CAST(n - forecast AS BIGINT) AS resid
        |FROM fwd""".stripMargin
    ) { (spark, dir) =>
      // same bounded per-user grid as events_burst_grouped: null keys
      // excluded both sides, day spine broadcast from the corpus bounds
      userDayArrays(Tables(spark, dir).events)
        .withColumn("nd", size(col("ns")))
        // the SES recursion as a fold: acc = the level series so far,
        // each step appends (nₜ + 3·last) div 4 — truncating div is
        // portable on the non-negative counts
        .withColumn("levels", expr(sesFoldSql))
        // forecastₜ = levelₜ₋₁: null at t = 1, then the levels shifted
        .withColumn("fcs", expr(
          "concat(array(cast(null as bigint)), slice(levels, 1, nd - 1))"))
        .select(col("user_id"), explode(expr("arrays_zip(ds, ns, levels, fcs)")).as("z"))
        .select(col("user_id"), col("z.ds").as("d"), col("z.ns").as("n"),
          col("z.levels").as("level"), col("z.fcs").as("forecast"),
          (col("z.ns") - col("z.fcs")).as("resid"))
    },

    // ── events_forecast_holt_grouped: Holt linear-trend forecasting PER
    // USER — the fold pattern's hardest forecasting instance: a DOUBLE
    // recursion (level + trend, each step reading both predecessors)
    // carried through the plan as ONE struct-of-arrays fold per group.
    // Identical fixed-point recursion to events_forecast_holt (2²⁰
    // micro-units, floor(x/4.0) smoothing steps — floor division
    // because the trend can go negative where truncation is not
    // portable; exact while the BIGINT numerator sits under 2⁵³), on
    // the events_burst_grouped day spine. Oracle = holtFwdSql's
    // recursive CTE keyed by user; the grouped spec cross-checks the
    // fold against the pinned holtLevels recursion on every group.
    OpQuery.checked(
      "events_forecast_holt_grouped",
      s"""$userGridSql,
        |fwd AS (
        |  SELECT user_id, t, d, n, n * 1048576 AS level_u,
        |         CAST(0 AS BIGINT) AS trend_u, CAST(NULL AS BIGINT) AS fc_u
        |  FROM grid WHERE t = 1
        |  UNION ALL
        |  SELECT g.user_id, g.t, g.d, g.n,
        |         CAST(floor((g.n * 1048576 + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT),
        |         CAST(floor((CAST(floor((g.n * 1048576 + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT)
        |                     - f.level_u + 3 * f.trend_u) / 4) AS BIGINT),
        |         f.level_u + f.trend_u
        |  FROM fwd f JOIN grid g ON g.user_id = f.user_id AND g.t = f.t + 1)
        |SELECT user_id, d, n, CAST(level_u AS BIGINT) AS level_u, trend_u,
        |       CAST(floor(fc_u / 1048576.0) AS BIGINT) AS forecast,
        |       CAST(n - floor(fc_u / 1048576.0) AS BIGINT) AS resid
        |FROM fwd""".stripMargin
    ) { (spark, dir) =>
      userDayArrays(Tables(spark, dir).events)
        .withColumn("nd", size(col("ns")))
        // the double recursion as one struct-of-arrays fold: each step
        // reads the LAST level and trend, appends the forecast fc =
        // L+T, the new level, and the new trend; floor(x / 4.0) is the
        // exact-portable smoothing step (see events_forecast_holt)
        .withColumn("st", expr(holtFoldSql))
        .select(col("user_id"), col("ds"), col("ns"),
          col("st.lus").as("lus"), col("st.tus").as("tus"),
          expr("concat(array(cast(null as bigint)), st.fcs)").as("fcs"))
        .select(col("user_id"),
          explode(expr("arrays_zip(ds, ns, lus, tus, fcs)")).as("z"))
        .select(col("user_id"), col("z.ds").as("d"), col("z.ns").as("n"),
          col("z.lus").as("level_u"), col("z.tus").as("trend_u"),
          expr("cast(floor(z.fcs / 1048576.0) as bigint)").as("forecast"))
        .withColumn("resid", col("n") - col("forecast"))
    },

    // ── events_forecast_hw_grouped: Holt–Winters additive seasonal
    // forecasting PER USER — the grouped-fold family's capstone: a
    // TRIPLE recursion (level + trend + a 7-slot seasonal RING BUFFER,
    // each step reading the slot that falls due and rotating a new one
    // in) carried through the plan as one struct-of-arrays fold per
    // group. SQL lambdas have no `let`, so the step binds its
    // intermediates (the due slot, the two predecessors, then the new
    // level) through two nested single-element transform()s before
    // building the next accumulator — the fold stays a pure
    // expression, zero driver sequencing, zero UDF. Identical
    // fixed-point recursion to events_forecast_hw (2²⁰ micro-units,
    // floor(x/4.0) steps, seasonal slots warm up from 0). Oracle =
    // hwFwdSql's recursive CTE keyed by user (the seasonal ring
    // threads through the CTE as an array column); the grouped spec
    // cross-checks the fold against the pinned hwLevels on every group.
    OpQuery.checked(
      "events_forecast_hw_grouped",
      s"""$userGridSql,
        |fwd AS (
        |  SELECT user_id, t, d, n, n * 1048576 AS level_u,
        |         CAST(0 AS BIGINT) AS trend_u,
        |         [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS seas,
        |         CAST(0 AS BIGINT) AS seas_u,
        |         CAST(NULL AS BIGINT) AS fc_u
        |  FROM grid WHERE t = 1
        |  UNION ALL
        |  SELECT g.user_id, g.t, g.d, g.n,
        |         CAST(floor((g.n * 1048576 - f.seas[1] + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT),
        |         CAST(floor((CAST(floor((g.n * 1048576 - f.seas[1] + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT)
        |                     - f.level_u + 3 * f.trend_u) / 4) AS BIGINT),
        |         list_append(f.seas[2:7],
        |           CAST(floor((g.n * 1048576
        |                       - CAST(floor((g.n * 1048576 - f.seas[1] + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT)
        |                       + 3 * f.seas[1]) / 4) AS BIGINT)),
        |         CAST(floor((g.n * 1048576
        |                     - CAST(floor((g.n * 1048576 - f.seas[1] + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT)
        |                     + 3 * f.seas[1]) / 4) AS BIGINT),
        |         f.level_u + f.trend_u + f.seas[1]
        |  FROM fwd f JOIN grid g ON g.user_id = f.user_id AND g.t = f.t + 1)
        |SELECT user_id, d, n, CAST(level_u AS BIGINT) AS level_u, trend_u, seas_u,
        |       CAST(floor(fc_u / 1048576.0) AS BIGINT) AS forecast,
        |       CAST(n - floor(fc_u / 1048576.0) AS BIGINT) AS resid
        |FROM fwd""".stripMargin
    ) { (spark, dir) =>
      userDayArrays(Tables(spark, dir).events)
        .withColumn("nd", size(col("ns")))
        .withColumn("st", expr(hwFoldSql))
        .select(col("user_id"), col("ds"), col("ns"),
          col("st.lus").as("lus"), col("st.tus").as("tus"), col("st.sus").as("sus"),
          expr("concat(array(cast(null as bigint)), st.fcs)").as("fcs"))
        .select(col("user_id"),
          explode(expr("arrays_zip(ds, ns, lus, tus, sus, fcs)")).as("z"))
        .select(col("user_id"), col("z.ds").as("d"), col("z.ns").as("n"),
          col("z.lus").as("level_u"), col("z.tus").as("trend_u"),
          col("z.sus").as("seas_u"),
          expr("cast(floor(z.fcs / 1048576.0) as bigint)").as("forecast"))
        .withColumn("resid", col("n") - col("forecast"))
    },

    // ── events_seasonal_decompose: classical trend/seasonal/residual
    // decomposition of the daily series (the moving-average step of
    // STL's ancestor, Macaulay 1931 / the "classical decomposition" of
    // every forecasting text): trend = centered 7-day moving average,
    // seasonal = per-day-of-week mean of the detrended series, residual
    // = the rest. Everything rides a ×7 integer scale so no division
    // happens until the seasonal mean, and THAT division is the
    // portable floor-div identity (a − ((a%b + b) % b)) / b — both
    // engines truncate `%` toward the dividend, so the non-negative
    // remainder subtracts exactly and the remaining division is exact.
    // dow = days-since-epoch mod 7 (0 = Thursday) rather than either
    // engine's dayofweek(), which disagree on week start.
    //
    // Scale shape: unlike the recursive forecasting ops this one is
    // FULLY in-plan — the corpus collapses to the bounded grid in one
    // map-side-combined pass, the centered window runs over that
    // aggregated frame (|types| × |days|, constant in corpus size; the
    // group-key-window detector allows windows above an aggregate by
    // construction), and the seasonal profile is a broadcast-sized
    // (|types| × 7) join back. No driver sequencing at all — the
    // decomposition would run identically on a 1000-executor grid.
    OpQuery.checked(
      "events_seasonal_decompose",
      s"""WITH RECURSIVE $dailyGridSql,
        |win AS (
        |  SELECT event_type, d, n,
        |         sum(n) OVER (PARTITION BY event_type ORDER BY t
        |                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w7,
        |         count(*) OVER (PARTITION BY event_type ORDER BY t
        |                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7,
        |         (CAST(d AS DATE) - DATE '1970-01-01') % 7 AS dow
        |  FROM grid),
        |det AS (SELECT event_type, d, n, w7, dow, 7 * n - w7 AS detr
        |        FROM win WHERE c7 = 7),
        |seas AS (
        |  SELECT event_type, dow, CAST(sum(detr) AS BIGINT) AS s_num,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM det GROUP BY 1, 2)
        |SELECT det.event_type, det.d, det.n,
        |       CAST(det.w7 AS BIGINT) AS trend_x7,
        |       CAST((s_num - ((s_num % cnt + cnt) % cnt)) // cnt AS BIGINT) AS seas_x7,
        |       CAST(det.detr - (s_num - ((s_num % cnt + cnt) % cnt)) // cnt AS BIGINT) AS resid_x7
        |FROM det JOIN seas ON seas.event_type = det.event_type AND seas.dow = det.dow""".stripMargin
    ) { (spark, dir) =>
      val w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
      val det = dailyGrid(Tables(spark, dir).events)
        .withColumn("w7", sum(col("n")).over(w))
        .withColumn("c7", count(lit(1)).over(w))
        .filter(col("c7") === 7)
        .withColumn("detr", lit(7L) * col("n") - col("w7"))
        .withColumn("dow", expr("datediff(d, DATE'1970-01-01') % 7"))
      val seas = det.groupBy("event_type", "dow")
        .agg(sum(col("detr")).as("s_num"), count(lit(1)).as("cnt"))
        .withColumn("seas_x7",
          expr("(s_num - ((s_num % cnt + cnt) % cnt)) div cnt"))
        .select("event_type", "dow", "seas_x7")
      det.join(broadcast(seas), Seq("event_type", "dow"))
        .select(col("event_type"), col("d"), col("n"),
          col("w7").as("trend_x7"), col("seas_x7"),
          (col("detr") - col("seas_x7")).as("resid_x7"))
    },

    // ── events_forecast_hw: one-step-ahead forecasting with additive
    // Holt–Winters (Winters 1960) — the seasonal rung above
    // events_forecast_holt on the same bounded grid, period m = 7
    // (day-of-week), α = β = γ = 1/4, the same 2²⁰ fixed-point
    // micro-units and portable-floor discipline:
    //   fcₜ = Lₜ₋₁ + Tₜ₋₁ + Sₜ₋₇
    //   Lₜ = ⌊(nₜ·2²⁰ − Sₜ₋₇ + 3·(Lₜ₋₁+Tₜ₋₁))/4⌋
    //   Tₜ = ⌊(Lₜ − Lₜ₋₁ + 3·Tₜ₋₁)/4⌋
    //   Sₜ = ⌊(nₜ·2²⁰ − Lₜ + 3·Sₜ₋₇)/4⌋
    // Seasonal slots warm up from 0 — deterministic on both sides. The
    // oracle's recursive CTE threads the last seven seasonal values
    // forward as a BIGINT list (a constant-width ring buffer in the
    // row), because a recursive CTE can only see the previous
    // iteration — there is no joining back to t−7.
    OpQuery.checked(
      "events_forecast_hw",
      s"""WITH RECURSIVE $dailyGridSql,
        |${hwFwdSql("fwd")}
        |SELECT event_type, d, n, CAST(level_u AS BIGINT) AS level_u, trend_u, seas_u,
        |       CAST(floor(fc_u / 1048576.0) AS BIGINT) AS forecast,
        |       CAST(n - floor(fc_u / 1048576.0) AS BIGINT) AS resid
        |FROM fwd""".stripMargin
    ) { (spark, dir) =>
      val byType = dailyGrid(Tables(spark, dir).events).collect()
        .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
        .groupBy(_._1)
      // dailyGrid excludes null types by contract; the Option-sort is
      // defense in depth against a future grid change NPE-ing here
      val out = byType.toSeq.sortBy(t => Option(t._1)).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(_._2.toLocalDate.toEpochDay)
        val states = hwLevels(sorted.map(_._3).toIndexedSeq)
        sorted.zip(states).map { case ((tp, d, n), (lu, tu, su, fcU)) =>
          val fc = fcU.map(Math.floorDiv(_, HoltUnit))
          (tp, d, n, lu, tu, su, fc, fc.map(n - _))
        }
      }
      spark.createDataFrame(out)
        .toDF("event_type", "d", "n", "level_u", "trend_u", "seas_u", "forecast", "resid")
    },

    // ── eval_forecast_backtest: the forecasting tier measures ITSELF —
    // a rolling-origin backtest (the standard one-step-ahead holdout
    // evaluation, Hyndman & Athanasopoulos §5.10) of all four methods
    // (naive = yesterday's count, SES, Holt, Holt–Winters) on the last
    // 7 days of the shared grid. Every method's forecast at step t uses
    // only data before t by construction, so the full-series recursions
    // ARE the rolling backtest — no re-training per origin. The error
    // totals are sums of |n − forecast| over the holdout: pure BIGINTs,
    // so the comparison is exact, and the eval family (langid, dedup,
    // score, retrieval ×3, pHash) now covers forecasting too. The
    // oracle instantiates the SES/Holt/HW recursive CTEs next to each
    // other — the exact fragments the standalone ops check — plus a
    // lag() for naive, and aggregates the same tail.
    OpQuery.checked(
      "eval_forecast_backtest",
      s"""WITH RECURSIVE $dailyGridSql,
        |${sesFwdSql("fses")},
        |${holtFwdSql("fholt")},
        |${hwFwdSql("fhw")},
        |nd AS (SELECT event_type, max(t) AS nd FROM grid GROUP BY 1),
        |naive AS (
        |  SELECT event_type, t, n,
        |         lag(n) OVER (PARTITION BY event_type ORDER BY t) AS forecast
        |  FROM grid),
        |allm AS (
        |  SELECT event_type, t, n, 'naive' AS method, forecast FROM naive
        |  UNION ALL
        |  SELECT event_type, t, n, 'ses', forecast FROM fses
        |  UNION ALL
        |  SELECT event_type, t, n, 'holt',
        |         CAST(floor(fc_u / 1048576.0) AS BIGINT) FROM fholt
        |  UNION ALL
        |  SELECT event_type, t, n, 'hw',
        |         CAST(floor(fc_u / 1048576.0) AS BIGINT) FROM fhw)
        |SELECT a.event_type, a.method,
        |       CAST(count(*) AS BIGINT) AS n_eval,
        |       CAST(sum(abs(a.n - a.forecast)) AS BIGINT) AS abs_err
        |FROM allm a JOIN nd ON nd.event_type = a.event_type
        |WHERE a.t > nd.nd - 7 AND a.forecast IS NOT NULL
        |GROUP BY 1, 2""".stripMargin
    ) { (spark, dir) =>
      val byType = dailyGrid(Tables(spark, dir).events).collect()
        .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
        .groupBy(_._1)
      val out = byType.toSeq.sortBy(t => Option(t._1)).flatMap { case (tp, rs) =>
        val ns = rs.sortBy(_._2.toLocalDate.toEpochDay).map(_._3).toIndexedSeq
        val nd = ns.length
        val fcs: Seq[(String, IndexedSeq[Option[Long]])] = Seq(
          "naive" -> ns.indices.map(i => if (i == 0) None else Some(ns(i - 1))),
          "ses"   -> sesLevels(ns).map(_._2),
          "holt"  -> holtLevels(ns).map(_._3.map(Math.floorDiv(_, HoltUnit))),
          "hw"    -> hwLevels(ns).map(_._4.map(Math.floorDiv(_, HoltUnit))))
        // flatMap + emptiness guard, not map: on a degenerate series
        // (one day — every forecast NULL at t=1) the oracle's
        // WHERE-then-GROUP BY emits no group at all, so emitting an
        // (event_type, method, 0, 0) row here would diverge
        fcs.flatMap { case (m, fc) =>
          val tail = (0 until nd).filter(i => i + 1 > nd - 7 && fc(i).isDefined)
          if (tail.isEmpty) None
          else Some((tp, m, tail.size.toLong, tail.map(i => math.abs(ns(i) - fc(i).get)).sum))
        }
      }
      spark.createDataFrame(out).toDF("event_type", "method", "n_eval", "abs_err")
    }
  )

  // ── the grouped-fold expressions ─────────────────────────────────────
  // The in-plan recursions of events_forecast_{ses,holt,hw}_grouped as
  // reusable SQL over a group's (ns, nd) day-count array. COST BOUND:
  // each fold step appends to its accumulator arrays via concat, which
  // COPIES the prior array — O(|days|) longs per step, O(|days|²) per
  // group total (NOT the O(|days|) of the recursion itself; only the
  // LIVE state is O(1..9) values). Bounded by the day spine, never the
  // event count: ≈ 6.7M copied longs per group at a 10-year span
  // (3650²/2), ~54 MiB of transient copying per group per array —
  // real but tolerable, and ForecastSpec pins correctness + completion
  // at a decade-long spine. The alternative (emitting via an index
  // transform so the accumulator carries O(1) state) does not exist in
  // SQL: transform's lambda cannot read its own prior outputs, which is
  // the definition of this recursion — so the quadratic append is the
  // price of running a sequential recursion as a pure expression, paid
  // in L1-bandwidth array copies rather than driver round trips.

  /** events_forecast_ses_grouped's fold: the level series over (ns, nd). */
  private[graft] def sesFoldSql: String =
    """aggregate(
      |  slice(ns, 2, nd - 1),
      |  array(element_at(ns, 1)),
      |  (acc, x) -> concat(acc, array((x + 3 * element_at(acc, size(acc))) div 4)))""".stripMargin

  /** events_forecast_holt_grouped's fold: the (lus, tus, fcs)
    * struct-of-arrays double recursion over (ns, nd). */
  private[graft] def holtFoldSql: String =
    """aggregate(
      |  slice(ns, 2, nd - 1),
      |  named_struct(
      |    'lus', array(element_at(ns, 1) * 1048576L),
      |    'tus', array(0L),
      |    'fcs', cast(array() as array<bigint>)),
      |  (acc, x) -> named_struct(
      |    'lus', concat(acc.lus, array(
      |       cast(floor((x * 1048576L
      |                   + 3 * (element_at(acc.lus, size(acc.lus))
      |                          + element_at(acc.tus, size(acc.tus)))) / 4.0) as bigint))),
      |    'tus', concat(acc.tus, array(
      |       cast(floor((cast(floor((x * 1048576L
      |                   + 3 * (element_at(acc.lus, size(acc.lus))
      |                          + element_at(acc.tus, size(acc.tus)))) / 4.0) as bigint)
      |                   - element_at(acc.lus, size(acc.lus))
      |                   + 3 * element_at(acc.tus, size(acc.tus))) / 4.0) as bigint))),
      |    'fcs', concat(acc.fcs, array(
      |       element_at(acc.lus, size(acc.lus)) + element_at(acc.tus, size(acc.tus))))))""".stripMargin

  /** events_forecast_hw_grouped's fold: the (lus, tus, sus, fcs, ring)
    * triple recursion with the 7-slot seasonal ring over (ns, nd). */
  private[graft] def hwFoldSql: String =
    """aggregate(
      |  slice(ns, 2, nd - 1),
      |  named_struct(
      |    'lus', array(element_at(ns, 1) * 1048576L),
      |    'tus', array(0L),
      |    'sus', array(0L),
      |    'fcs', cast(array() as array<bigint>),
      |    'ring', array(0L, 0L, 0L, 0L, 0L, 0L, 0L)),
      |  (acc, x) -> element_at(transform(
      |    array(named_struct(
      |      'sm', element_at(acc.ring, 1),
      |      'll', element_at(acc.lus, size(acc.lus)),
      |      'lt', element_at(acc.tus, size(acc.tus)))),
      |    v -> element_at(transform(
      |      array(cast(floor((x * 1048576L - v.sm + 3 * (v.ll + v.lt)) / 4.0) as bigint)),
      |      nl -> named_struct(
      |        'lus', concat(acc.lus, array(nl)),
      |        'tus', concat(acc.tus, array(
      |          cast(floor((nl - v.ll + 3 * v.lt) / 4.0) as bigint))),
      |        'sus', concat(acc.sus, array(
      |          cast(floor((x * 1048576L - nl + 3 * v.sm) / 4.0) as bigint))),
      |        'fcs', concat(acc.fcs, array(v.ll + v.lt + v.sm)),
      |        'ring', concat(slice(acc.ring, 2, 6), array(
      |          cast(floor((x * 1048576L - nl + 3 * v.sm) / 4.0) as bigint))))), 1)), 1))""".stripMargin

  /** The integer SES recursion behind events_forecast_ses: returns
    * (level_t, forecast_t = level_{t−1}) per step; level_1 = n_1,
    * level_t = (n_t + 3·level_{t−1}) div 4. */
  private[graft] def sesLevels(counts: IndexedSeq[Long]): IndexedSeq[(Long, Option[Long])] = {
    require(counts.nonEmpty, "at least one step")
    var level = counts(0)
    counts.zipWithIndex.map { case (n, i) =>
      if (i == 0) (level, None)
      else {
        val fc = level
        level = (n + 3 * level) / 4
        (level, Some(fc))
      }
    }
  }

  /** Fixed-point scale for the Holt recursion (2²⁰ micro-units). */
  private[ops] val HoltUnit = 1L << 20

  /** The fixed-point Holt recursion behind events_forecast_holt:
    * returns (Lₜ, Tₜ, fcₜ = Lₜ₋₁ + Tₜ₋₁), all in [[HoltUnit]]
    * micro-units. Math.floorDiv — NOT `/` — because the trend (and
    * hence a numerator) can be negative, and the oracle's
    * floor(x / 4.0) floors. */
  private[graft] def holtLevels(counts: IndexedSeq[Long]): IndexedSeq[(Long, Long, Option[Long])] = {
    require(counts.nonEmpty, "at least one step")
    var level = counts(0) * HoltUnit
    var trend = 0L
    counts.zipWithIndex.map { case (n, i) =>
      if (i == 0) (level, trend, None)
      else {
        val fc = level + trend
        val nl = Math.floorDiv(n * HoltUnit + 3 * fc, 4)
        trend = Math.floorDiv(nl - level + 3 * trend, 4)
        level = nl
        (level, trend, Some(fc))
      }
    }
  }

  /** The indexed daily (type, day, count) grid both sequential-DP
    * events ops run on — one map-side-combined aggregate to the
    * (type, day) grain plus a zero-filled day spine; bounded
    * (|types| × |days|, constant in corpus size). A `def` (not a val
    * interpolated into ops built during object init). */
  /** The per-GROUP day-spine grid as a CTE block, parameterized by the
    * group key — ONE definition serves both grid families (the bounded
    * per-event_type grid the driver-side recursions collect, and the
    * high-cardinality per-user_id grid the in-plan folds consume), so
    * the null-key exclusion and corpus-bounds contracts cannot drift
    * between them. */
  private def groupGridSql(key: String): String =
    s"""pd AS (
      |  SELECT $key, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
      |  FROM events WHERE $key IS NOT NULL GROUP BY 1, 2),
      |b AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS dT
      |      FROM events WHERE $key IS NOT NULL),
      |ks AS (SELECT DISTINCT $key FROM events WHERE $key IS NOT NULL),
      |spine AS (
      |  SELECT k.$key, CAST(u.dd AS DATE) AS d
      |  FROM ks k, b, unnest(generate_series(b.d0, b.dT, INTERVAL 1 DAY)) AS u(dd)),
      |grid AS (
      |  SELECT s.$key, s.d, COALESCE(pd.n, 0) AS n,
      |         CAST(row_number() OVER (PARTITION BY s.$key ORDER BY s.d) AS BIGINT) AS t
      |  FROM spine s LEFT JOIN pd ON pd.$key = s.$key AND pd.d = s.d)""".stripMargin

  private def dailyGridSql: String = groupGridSql("event_type")

  /** The SES forward recursion as a recursive-CTE fragment over `grid`
    * (named so [[eval_forecast_backtest]] can instantiate it next to the
    * Holt and Holt–Winters recursions in one oracle query). */
  private def sesFwdSql(name: String): String =
    s"""$name AS (
      |  SELECT event_type, t, d, n, n AS level, CAST(NULL AS BIGINT) AS forecast
      |  FROM grid WHERE t = 1
      |  UNION ALL
      |  SELECT g.event_type, g.t, g.d, g.n,
      |         (g.n + 3 * f.level) // 4,
      |         f.level
      |  FROM $name f JOIN grid g ON g.event_type = f.event_type AND g.t = f.t + 1)""".stripMargin

  /** The fixed-point Holt forward recursion as a recursive-CTE fragment
    * over `grid` — the new level expression is repeated inside the trend
    * term because a recursive CTE row cannot reference its own aliases. */
  private def holtFwdSql(name: String): String =
    s"""$name AS (
      |  SELECT event_type, t, d, n, n * 1048576 AS level_u,
      |         CAST(0 AS BIGINT) AS trend_u, CAST(NULL AS BIGINT) AS fc_u
      |  FROM grid WHERE t = 1
      |  UNION ALL
      |  SELECT g.event_type, g.t, g.d, g.n,
      |         CAST(floor((g.n * 1048576 + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT),
      |         CAST(floor((CAST(floor((g.n * 1048576 + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT)
      |                     - f.level_u + 3 * f.trend_u) / 4) AS BIGINT),
      |         f.level_u + f.trend_u
      |  FROM $name f JOIN grid g ON g.event_type = f.event_type AND g.t = f.t + 1)""".stripMargin

  /** The fixed-point additive Holt–Winters forward recursion (period 7)
    * as a recursive-CTE fragment over `grid`. The row carries the last
    * seven seasonal micro-unit values as a BIGINT list — `seas[1]` is
    * S_{t−7}, the slot this step consumes; the new S_t appends and the
    * head drops, so the list is a constant-width ring buffer the
    * recursion threads forward. The new level expression is repeated
    * (three times) for the same no-self-alias reason as Holt's. */
  private def hwFwdSql(name: String): String =
    s"""$name AS (
      |  SELECT event_type, t, d, n, n * 1048576 AS level_u,
      |         CAST(0 AS BIGINT) AS trend_u,
      |         [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS seas,
      |         CAST(0 AS BIGINT) AS seas_u,
      |         CAST(NULL AS BIGINT) AS fc_u
      |  FROM grid WHERE t = 1
      |  UNION ALL
      |  SELECT g.event_type, g.t, g.d, g.n,
      |         CAST(floor((g.n * 1048576 - f.seas[1] + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT),
      |         CAST(floor((CAST(floor((g.n * 1048576 - f.seas[1] + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT)
      |                     - f.level_u + 3 * f.trend_u) / 4) AS BIGINT),
      |         list_append(f.seas[2:7],
      |           CAST(floor((g.n * 1048576
      |                       - CAST(floor((g.n * 1048576 - f.seas[1] + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT)
      |                       + 3 * f.seas[1]) / 4) AS BIGINT)),
      |         CAST(floor((g.n * 1048576
      |                     - CAST(floor((g.n * 1048576 - f.seas[1] + 3 * (f.level_u + f.trend_u)) / 4) AS BIGINT)
      |                     + 3 * f.seas[1]) / 4) AS BIGINT),
      |         f.level_u + f.trend_u + f.seas[1]
      |  FROM $name f JOIN grid g ON g.event_type = f.event_type AND g.t = f.t + 1)""".stripMargin

  /** The fixed-point additive Holt–Winters recursion (period m = 7,
    * α = β = γ = 1/4) behind events_forecast_hw: returns
    * (Lₜ, Tₜ, Sₜ, fcₜ = Lₜ₋₁ + Tₜ₋₁ + Sₜ₋₇), all in [[HoltUnit]]
    * micro-units. Seasonal slots warm up from 0 (the first seven steps
    * forecast with no seasonal term — deterministic, and both engines
    * share it), so a day-of-week pattern is fully absorbed from the
    * second week on. Math.floorDiv for the same negative-numerator
    * portability reason as [[holtLevels]]. */
  private[graft] def hwLevels(counts: IndexedSeq[Long]): IndexedSeq[(Long, Long, Long, Option[Long])] = {
    require(counts.nonEmpty, "at least one step")
    var level = counts(0) * HoltUnit
    var trend = 0L
    // invariant: after step t this holds [S_{t−6} … S_t]; S_{≤1} = 0
    var seas = Vector.fill(7)(0L)
    counts.zipWithIndex.map { case (n, i) =>
      if (i == 0) (level, trend, 0L, None)
      else {
        val sm = seas.head
        val fc = level + trend + sm
        val nl = Math.floorDiv(n * HoltUnit - sm + 3 * (level + trend), 4)
        trend = Math.floorDiv(nl - level + 3 * trend, 4)
        val ns = Math.floorDiv(n * HoltUnit - nl + 3 * sm, 4)
        level = nl
        seas = seas.tail :+ ns
        (level, trend, ns, Some(fc))
      }
    }
  }

  /** The per-user day-spine grid as a recursive-CTE-ready SQL prefix —
    * [[dailyGridSql]] with the group key swapped to user_id. The FOUR
    * grouped fold ops (burst, SES, Holt, HW) interpolate this one
    * definition, so the null-key exclusion and corpus-bounds contracts
    * cannot drift per-op between their engine and oracle sides. */
  private def userGridSql: String = "WITH RECURSIVE " + groupGridSql("user_id")

  /** Engine side of [[userGridSql]], reduced to what every grouped fold
    * starts from: (user_id, ds, ns) — each user's sorted day array and
    * the matching zero-filled counts on the shared corpus-bounds spine.
    * Null user keys excluded on BOTH sides by the dailyGrid contract. */
  /** Engine side of [[groupGridSql]]: (key, d, n) rows on the shared
    * corpus-bounds spine, null keys excluded on both sides. */
  private def groupGrid(ev0: org.apache.spark.sql.DataFrame, key: String): org.apache.spark.sql.DataFrame = {
    val ev = ev0.filter(col(key).isNotNull)
    val pd = ev.groupBy(col(key), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val bounds = ev.agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("dT"))
    val spine = ev.select(key).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(key), explode(expr("sequence(d0, dT, interval 1 day)")).as("d"))
    spine.join(pd, Seq(key, "d"), "left_outer")
      .select(col(key), col("d"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** [[groupGrid]] at the user key, reduced to what every grouped fold
    * starts from: (user_id, ds, ns) — each user's sorted day array and
    * the matching zero-filled counts. */
  private def userDayArrays(ev0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    groupGrid(ev0, "user_id")
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("d"), col("n")))).as("s"))
      .select(col("user_id"),
        expr("transform(s, x -> x.d)").as("ds"),
        expr("transform(s, x -> x.n)").as("ns"))

  /** Engine side of [[dailyGridSql]]'s `grid` (without the index —
    * consumers collect the bounded frame and sort). */
  private def dailyGrid(ev0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    groupGrid(ev0, "event_type")

  /** The integer Viterbi behind events_burst_kleinberg: two states
    * (low = base rate N/D, high = 2×), L1 deviation emission costs in
    * 2·D units, entry cost γ = 2·N, ties prefer low/staying. Returns
    * the high-state flag per step. Mirrors the oracle's fwd/bwd
    * recursive CTEs decision-for-decision — any asymmetry in a tie
    * rule here would hash-fail the driver compare. */
  private[ops] def kleinbergStates(counts: IndexedSeq[Long]): IndexedSeq[Boolean] = {
    val nd = counts.length
    require(nd > 0, "at least one step")
    val tot = counts.sum
    val gam = 2L * tot
    def cl(n: Long) = math.abs(2L * nd * n - 2L * tot)
    def ch(n: Long) = math.abs(2L * nd * n - 4L * tot)
    var lc = cl(counts(0))
    var hc = gam + ch(counts(0))
    val predl = new Array[Boolean](nd)
    val predh = new Array[Boolean](nd)
    for (t <- 1 until nd) {
      val nlc = math.min(lc, hc) + cl(counts(t))
      val nhc = math.min(lc + gam, hc) + ch(counts(t))
      predl(t) = lc <= hc
      predh(t) = hc <= lc + gam
      lc = nlc; hc = nhc
    }
    val high = new Array[Boolean](nd)
    high(nd - 1) = !(lc <= hc)
    for (t <- nd - 1 to 1 by -1)
      high(t - 1) = if (!high(t)) !predl(t) else predh(t)
    high.toIndexedSeq
  }
}
