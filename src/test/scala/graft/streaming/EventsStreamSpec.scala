package graft.streaming

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class EventsStreamSpec extends SparkSuite {
  import spark.implicits._

  test("stateful sessionize emits every closed session (open ones stay in state)") {
    val staged = java.nio.file.Files.createTempDirectory("graft_sess_spec").toString
    val events = Tables(spark, sf0001).events
    events.coalesce(2).write.mode(SaveMode.Overwrite).parquet(staged)

    val q = EventsStream.startSessionize(spark, staged, "sess_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_test").count()
      // batch equivalent: all sessions except each user's last (still open)
      val batchSessions = graft.SparkEntry.queries("events_sessionize")(spark, sf0001).count()
      val users = events.select("user_id").distinct().count()
      assert(streamed == batchSessions - users,
        s"streamed=$streamed batch=$batchSessions users=$users")
    } finally q.stop()
  }

  test("streaming transitions replay to the batch markov matrix on real input files") {
    val staged = java.nio.file.Files.createTempDirectory("graft_trans_spec").toString
    // in-order delivery per the documented contract: one time-sorted file
    Tables(spark, sf0001).events
      .orderBy("ts", "event_id").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(staged)

    val q = EventsStream.startTransitions(spark, staged, "trans_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("trans_test")
        .groupBy("from_type", "to_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = graft.SparkEntry.queries("events_markov_transitions")(spark, sf0001)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        s"streamed transition counts diverge from the batch matrix: " +
          s"onlyStream=${streamed.keySet -- batch.keySet} onlyBatch=${batch.keySet -- streamed.keySet}")
    } finally q.stop()
  }

  test("streaming windowed heavy hitters keep the SpaceSaving guarantees per window") {
    val staged = java.nio.file.Files.createTempDirectory("graft_hh_spec").toString
    Tables(spark, sf0001).events.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)

    graft.functions.SpaceSavingTopK.register(spark)
    val q = EventsStream.startWindowedTopK(spark, staged, "hh_test")
    try {
      q.processAllAvailable()
      val rows = spark.table("hh_test")
        .select(col("window_start"), col("top.item").as("items"), size(col("top")).as("n_tracked"))
        .collect()
      // update mode emits one row per (window, touching micro-batch); the
      // single staged file makes that exactly one — assert it so a future
      // multi-batch refactor revisits the latest-row logic here
      assert(rows.map(_.getTimestamp(0)).distinct.length == rows.length,
        "expected a single update per window from the one-file stage")
      val streamed = rows.map(r => r.getTimestamp(0) -> (r.getSeq[String](1).toSet, r.getInt(2))).toMap
      // batch reference: exact per-window counts on the same files
      val exact = spark.read.parquet(staged)
        .select(window(col("ts"), "6 hours")("start").as("ws"),
          regexp_extract(col("props"), "([0-9]+)", 1).as("k_prop"))
        .groupBy("ws", "k_prop").count()
        .collect().groupBy(_.getTimestamp(0))
      assert(streamed.keySet == exact.keySet, "window grids must match")
      exact.foreach { case (ws, rows) =>
        val (items, nTracked) = streamed(ws)
        val universe = rows.length
        val total = rows.map(_.getLong(2)).sum
        // order-independent summary size: min(capacity, universe)
        assert(nTracked == math.min(32, universe),
          s"window $ws tracked $nTracked of universe $universe")
        // SpaceSaving guarantee: every item with count > total/capacity
        // is in the summary, regardless of merge order
        val mustHave = rows.filter(_.getLong(2) > total / 32).map(_.getString(1)).toSet
        assert(mustHave.subsetOf(items),
          s"window $ws lost guaranteed-heavy items: ${mustHave -- items}")
      }
    } finally q.stop()
  }

  test("streaming funnel matcher replays to the batch pattern engine on real input files") {
    val staged = java.nio.file.Files.createTempDirectory("graft_funnel_stream").toString
    // in-order delivery per the documented contract: one time-sorted file
    Tables(spark, sf0001).events
      .orderBy("ts", "event_id").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(staged)

    val q = EventsStream.startFunnelMatches(spark, staged, "funnel_dfa_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("funnel_dfa_test").groupBy("user_id")
        .agg(max("match_no").as("n"), count(lit(1)).as("rows"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // batch reference: the regex engine with the same DEFINE + PATTERN
      val batch = graft.ops.PatternMatch.count(
          Tables(spark, sf0001).events, "user_id", Seq("ts", "event_id"),
          when(col("event_type") === "view", "v")
            .when(col("event_type") === "click", "c")
            .when(col("event_type") === "purchase", "p")
            .otherwise("x"),
          "vc*p")
        .filter(col("n_matches") > 0)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_matches")).toMap
      assert(batch.nonEmpty, "the fixture must contain completed funnels")
      assert(streamed.keySet == batch.keySet,
        "exactly the users the batch engine matches must emit streaming matches")
      batch.foreach { case (u, n) =>
        assert(streamed(u) == ((n, n)),
          s"user $u: batch counts $n matches, stream emitted ${streamed(u)} — " +
            "match_no must be dense 1..n with one row per match")
      }
    } finally q.stop()
  }

  test("streaming windowed quantiles keep the KLL rank guarantee per window") {
    val staged = java.nio.file.Files.createTempDirectory("graft_kll_stream").toString
    Tables(spark, sf0001).events.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)

    val q = EventsStream.startWindowedQuantiles(spark, staged, "kllw_test")
    try {
      q.processAllAvailable()
      val rows = spark.table("kllw_test").collect()
      assert(rows.map(_.getTimestamp(0)).distinct.length == rows.length,
        "expected a single update per window from the one-file stage")
      val streamed = rows.map(r => r.getTimestamp(0) -> r.getSeq[Double](1)).toMap
      // exact per-window value distributions on the same files (the
      // sketch skips nulls, so the reference must too)
      val exact = spark.read.parquet(staged)
        .filter(col("value").isNotNull)
        .select(window(col("ts"), "6 hours")("start").as("ws"), col("value"))
        .collect().groupBy(_.getTimestamp(0))
        .map { case (ws, rs) => ws -> rs.map(_.getDouble(1)).sorted }
      assert(streamed.keySet == exact.keySet, "window grids must match")
      val probs = Seq(0.25, 0.5, 0.75, 0.95)
      exact.foreach { case (ws, vals) =>
        val n = vals.length
        probs.zip(streamed(ws)).foreach { case (p, est) =>
          // order-independent KLL guarantee: whatever merge order the
          // micro-batch partials took, the estimate's realized rank must
          // sit within the batch op's audited ε (+ discretization slack)
          val rank = vals.count(_ <= est).toDouble / n
          assert(math.abs(rank - p) <= 0.05 + 1.0 / n,
            s"window $ws p=$p est=$est realized rank=$rank over n=$n")
        }
      }
    } finally q.stop()
  }

  /** Stage events as three sequential time-range files so that, with
    * maxFilesPerTrigger=1, the stream replays as three watermark-safe
    * micro-batches (each file strictly later than the previous — no
    * late-drop ambiguity) and the cross-batch state-store merge path is
    * actually exercised. Sequential writes order the modification times
    * the file source sorts by. */
  private def stageTimeSliced(prefix: String): String = {
    val staged = java.nio.file.Files.createTempDirectory(prefix).toString
    val ev = Tables(spark, sf0001).events
    val b = ev.agg(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (b.getTimestamp(0).getTime, b.getTimestamp(1).getTime)
    val t1 = new java.sql.Timestamp(lo + (hi - lo) / 3)
    val t2 = new java.sql.Timestamp(lo + 2 * (hi - lo) / 3)
    ev.filter(col("ts") <= lit(t1)).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(staged)
    ev.filter(col("ts") > lit(t1) && col("ts") <= lit(t2)).coalesce(1)
      .write.mode(SaveMode.Append).parquet(staged)
    ev.filter(col("ts") > lit(t2)).coalesce(1)
      .write.mode(SaveMode.Append).parquet(staged)
    staged
  }

  test("streaming windowed distinct sketches replay bit-identical to batch KMV") {
    val staged = stageTimeSliced("graft_kmv_stream")

    val q = EventsStream.startWindowedDistinctSketch(spark, staged, "kmvw_test",
      maxFilesPerTrigger = Some(1))
    try {
      q.processAllAvailable()
      // update mode re-emits a window each micro-batch that touches it;
      // toMap keeps the LAST (batch-ordered) revision per key — the
      // complete sketch
      val streamed = spark.table("kmvw_test").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getSeq[Long](2)).toMap
      // the batch aggregation over the same files, same window grid
      graft.functions.KmvSketch.register(spark)
      val batch = spark.read.parquet(staged)
        .select(window(col("ts"), "6 hours")("start").as("ws"), col("event_type"),
          expr("shiftrightunsigned(xxhash64(user_id), 1)").as("h"))
        .groupBy("ws", "event_type").agg(expr("kmv_sketch(h, 256)").as("sk"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getSeq[Long](2)).toMap
      assert(streamed.keySet == batch.keySet, "window x type grids must match")
      // KMV is merge-order independent: the k smallest distinct hashes of
      // a window are one well-defined set, so streaming micro-batching
      // must not change a single element
      streamed.foreach { case (key, sk) =>
        assert(sk == batch(key), s"sketch for $key diverged from batch replay")
      }
      // and the emitted sketches answer cross-type overlap: at this
      // scale every per-(window, type) sketch is sub-k (complete), so
      // the sketch set-intersection must equal the EXACT distinct-user
      // overlap computed from the staged files — the downstream
      // consumption path, verified end to end
      val exactUsers = spark.read.parquet(staged)
        .select(window(col("ts"), "6 hours")("start").as("ws"), col("event_type"),
          expr("shiftrightunsigned(xxhash64(user_id), 1)").as("h"))
        .collect().groupBy(r => (r.getTimestamp(0), r.getString(1)))
        .map { case (key, rs) => key -> rs.map(_.getLong(2)).toSet }
      var pairsChecked = 0
      streamed.keys.groupBy(_._1).values.filter(_.size >= 2).foreach { ks =>
        for (Seq(a, b) <- ks.toSeq.sortBy(_._2).combinations(2)) {
          assert(streamed(a).size < 256 && streamed(b).size < 256,
            "fixture assumption: sub-k sketches (raise k or shrink the stage otherwise)")
          val skInter = streamed(a).toSet.intersect(streamed(b).toSet)
          val exact = exactUsers(a).intersect(exactUsers(b))
          assert(skInter == exact,
            s"complete-sketch intersection must BE the exact overlap for $a x $b")
          pairsChecked += 1
        }
      }
      assert(pairsChecked > 0, "the stage must produce at least one same-window type pair")
    } finally q.stop()
  }

  test("streaming windowed Count-Min grids replay bit-identical to batch") {
    // three one-file micro-batches: a grid whose merge overwrote instead
    // of adding (or whose state-store byte round-trip slipped) would
    // diverge here — a single-batch stage would pass vacuously
    val staged = stageTimeSliced("graft_cm_stream")

    val q = EventsStream.startWindowedFreqSketch(spark, staged, "cmw_test",
      maxFilesPerTrigger = Some(1))
    try {
      q.processAllAvailable()
      val streamed = spark.table("cmw_test").collect()
        .map(r => r.getTimestamp(0) -> r.getStruct(1).getSeq[Long](2)).toMap
      graft.functions.CountMinSketch.register(spark)
      val batch = spark.read.parquet(staged)
        .select(window(col("ts"), "6 hours")("start").as("ws"), col("user_id"))
        .groupBy("ws").agg(expr("cm_sketch(user_id, 4, 2048)").as("sk"))
        .collect().map(r => r.getTimestamp(0) -> r.getStruct(1).getSeq[Long](2)).toMap
      assert(streamed.keySet == batch.keySet, "window grids must match")
      // element-wise addition commutes — micro-batch slicing must not
      // change a single counter
      streamed.foreach { case (ws, grid) =>
        assert(grid == batch(ws), s"grid for window $ws diverged from batch replay")
      }
      // and the grids answer per-window point queries: each window's
      // estimate for a present user is >= its exact in-window count
      val perWindow = spark.read.parquet(staged)
        .select(window(col("ts"), "6 hours")("start").as("ws"), col("user_id"))
        .groupBy("ws", "user_id").count().collect()
        .groupBy(_.getTimestamp(0))
      perWindow.foreach { case (ws, rows) =>
        val grid = streamed(ws)
        rows.take(20).foreach { r =>
          val (uid, exact) = (r.getLong(1), r.getLong(2))
          var best = Long.MaxValue
          for (d <- 0 until 4) {
            val c = grid(d * 2048 + graft.functions.CmHash.slot(uid, d, 2048))
            if (c < best) best = c
          }
          assert(best >= exact, s"window $ws user $uid: est $best < exact $exact")
        }
      }
    } finally q.stop()
  }

  test("streaming sliding-window distinct sketches replay bit-identical to batch") {
    val staged = stageTimeSliced("graft_slide_stream")

    val q = EventsStream.startSlidingDistinctSketch(spark, staged, "slide_test",
      maxFilesPerTrigger = Some(1))
    try {
      q.processAllAvailable()
      val streamed = spark.table("slide_test").collect()
        .map(r => r.getTimestamp(0) -> r.getSeq[Long](1)).toMap
      graft.functions.KmvSketch.register(spark)
      val batch = spark.read.parquet(staged)
        .select(window(col("ts"), "24 hours", "6 hours")("start").as("ws"),
          expr("shiftrightunsigned(xxhash64(user_id), 1)").as("h"))
        .groupBy("ws").agg(expr("kmv_sketch(h, 256)").as("sk"))
        .collect().map(r => r.getTimestamp(0) -> r.getSeq[Long](1)).toMap
      assert(streamed.keySet == batch.keySet, "sliding window grid must match")
      // each event lands in exactly 4 overlapping 24h/6h windows — the
      // grid must be denser than a tumbling one (vacuity guard)
      assert(streamed.size > spark.read.parquet(staged)
        .select(window(col("ts"), "24 hours")("start")).distinct().count(),
        "sliding grid no denser than tumbling — window(slide) not in effect")
      streamed.foreach { case (ws, sk) =>
        assert(sk == batch(ws), s"sketch for window $ws diverged from batch replay")
      }
    } finally q.stop()
  }

  test("streaming windowed exact top-k replays bit-identical to batch") {
    // one-file micro-batches force the cross-batch state-store merge: a
    // compaction that dropped a potential top-k entry, or a serialize
    // path that shipped more than k, would diverge from the batch run
    val staged = stageTimeSliced("graft_topk_stream")

    val q = EventsStream.startWindowedExactTopK(spark, staged, "xtopk_test",
      maxFilesPerTrigger = Some(1))
    try {
      q.processAllAvailable()
      def asList(r: org.apache.spark.sql.Row) =
        r.getSeq[org.apache.spark.sql.Row](2).map(e => (e.getDouble(0), e.getLong(1)))
      val streamed = spark.table("xtopk_test").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> asList(r)).toMap
      graft.functions.TopKByScore.register(spark)
      val batch = spark.read.parquet(staged)
        .select(window(col("ts"), "6 hours")("start").as("ws"), col("event_type"),
          col("value"), col("event_id"))
        .groupBy("ws", "event_type")
        .agg(expr("topk_by_score(value, event_id, 3)").as("top"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> asList(r)).toMap
      assert(streamed.keySet == batch.keySet, "window x type keys must match")
      // top-k under a total order is uniquely determined — micro-batch
      // slicing must not change a single entry or its rank
      streamed.foreach { case (key, top) =>
        assert(top == batch(key), s"top-k for $key diverged from batch replay")
      }
      // and against first principles: the exact per-group sort of the
      // staged files, (value DESC, event_id ASC), truncated to 3
      val exact = spark.read.parquet(staged)
        .select(window(col("ts"), "6 hours")("start").as("ws"), col("event_type"),
          col("value"), col("event_id"))
        .collect().groupBy(r => (r.getTimestamp(0), r.getString(1)))
        .map { case (key, rs) =>
          key -> rs.map(r => (r.getDouble(2), r.getLong(3)))
            .sortBy(t => (-t._1, t._2)).take(3).toSeq
        }
      streamed.foreach { case (key, top) =>
        assert(top == exact(key), s"top-k for $key diverged from the exact sort")
      }
    } finally q.stop()
  }

  test("windowed exact top-k survives a kill-and-restart from its checkpoint") {
    // the one streaming property the replay suites did not exercise:
    // stop the stateful query MID-FEED, deliver the rest of the data,
    // restart from the same checkpoint, and require the final per-key
    // state to equal the batch aggregation — which can only happen if
    // the restarted query RELOADED the open windows' top-k state (a
    // fresh state store would rebuild straddling windows from only the
    // post-restart files and diverge).
    val staged = java.nio.file.Files.createTempDirectory("graft_topk_crash_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_topk_crash_out").toString + "/u"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_topk_crash_ck").toString + "/c"
    val ev = Tables(spark, sf0001).events
    // the kill point must provably land INSIDE an open window key or the
    // recovery assertion is vacuous (a midpoint cut on this sparse feed
    // usually splits between keys): pick a (window, type) key with 2-3
    // events spread over distinct timestamps and cut at its FIRST event
    // — phase 1 then holds that event, phase 2 holds the key's rest, and
    // with ≤ 3 events the whole key is its own top-3, so the recovered
    // state MUST surface the phase-1 event in the post-restart revision
    val pick = ev
      .select(window(col("ts"), "6 hours")("start").as("ws"),
        col("event_type").as("et"), col("ts"))
      .groupBy("ws", "et")
      .agg(count(lit(1)).as("n"), min(col("ts")).as("t0"), max(col("ts")).as("tN"))
      .filter(col("n").between(2, 3) && col("tN") > col("t0"))
      .orderBy(col("ws"), col("et")).limit(1).collect()
    assert(pick.nonEmpty, "no 2-3 event straddleable key in the feed — fixture too sparse")
    val (pickWs, pickEt, t1) =
      (pick(0).getTimestamp(0), pick(0).getString(1), pick(0).getTimestamp(3))

    // phase 1: first half of the feed, then a clean kill
    ev.filter(col("ts") <= lit(t1)).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(staged)
    val q1 = EventsStream.startWindowedExactTopKToDir(spark, staged, outDir, ckpt,
      maxFilesPerTrigger = Some(1))
    try q1.processAllAvailable() finally q1.stop()
    val phase1MaxBatch = spark.read.parquet(outDir)
      .agg(max(col("batch_id"))).head().getLong(0)

    // phase 2: rest of the feed, restart from the SAME checkpoint
    ev.filter(col("ts") > lit(t1)).coalesce(1)
      .write.mode(SaveMode.Append).parquet(staged)
    val q2 = EventsStream.startWindowedExactTopKToDir(spark, staged, outDir, ckpt,
      maxFilesPerTrigger = Some(1))
    try q2.processAllAvailable() finally q2.stop()

    def asList(r: org.apache.spark.sql.Row) =
      r.getSeq[org.apache.spark.sql.Row](2).map(e => (e.getDouble(0), e.getLong(1)))
    // upsert semantics: the max-batch-id revision per key is the state
    val all = spark.read.parquet(outDir).collect()
      .groupBy(r => (r.getTimestamp(0), r.getString(1)))
      .map { case (k, rs) =>
        val last = rs.maxBy(_.getLong(3))
        k -> (asList(last), last.getLong(3))
      }
    graft.functions.TopKByScore.register(spark)
    val batch = spark.read.parquet(staged)
      .select(window(col("ts"), "6 hours")("start").as("ws"), col("event_type"),
        col("value"), col("event_id"))
      .groupBy("ws", "event_type")
      .agg(expr("topk_by_score(value, event_id, 3)").as("top"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> asList(r)).toMap
    assert(all.keySet == batch.keySet, "window x type keys must match after restart")
    all.foreach { case (key, (top, _)) =>
      assert(top == batch(key), s"top-k for $key diverged after checkpoint recovery")
    }
    // non-vacuity: batch ids must have CONTINUED (the restart resumed the
    // checkpoint, not a fresh query), and the deliberately-straddled key
    // must have been finalized AFTER the restart with its phase-1 event
    // still in the list — direct evidence the recovered state, not just
    // post-restart data, produced the final revision
    assert(all.values.exists(_._2 > phase1MaxBatch),
      "restart produced no new batches — the kill point left nothing to replay")
    val phase1Ids = ev.filter(col("ts") <= lit(t1))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val (pickTop, pickBid) = all((pickWs, pickEt))
    assert(pickBid > phase1MaxBatch,
      s"the straddled key ($pickWs, $pickEt) was not revised after the restart")
    assert(pickTop.exists(e => phase1Ids.contains(e._2)),
      s"the straddled key's post-restart top-k lost its pre-crash event: $pickTop")
  }

  test("streaming dedup drops re-delivered content and keeps one row per hash") {
    val staged = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    val events = Tables(spark, sf0001).events
    // deliver the source twice: second copy is pure re-delivery
    events.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    events.coalesce(1).write.mode(SaveMode.Append).parquet(staged)

    val q = EventsStream.startDedup(spark, staged, "dedup_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_test")
      val distinctHashes = events
        .select(md5(concat_ws("|", col("event_type"), col("props"))).as("h"))
        .distinct().count()
      assert(streamed.count() == distinctHashes,
        s"streamed=${streamed.count()} distinct=$distinctHashes")
      // no hash appears twice in the output
      assert(streamed.groupBy("content_hash").count().filter(col("count") > 1).count() == 0)
    } finally q.stop()
  }

  test("foreachBatch merge sink converges to the batch aggregate and is idempotent") {
    val staged = java.nio.file.Files.createTempDirectory("graft_merge_spec").toString
    val target = java.nio.file.Files.createTempDirectory("graft_merge_target").toString + "/agg"
    val events = Tables(spark, sf0001).events
    events.coalesce(2).write.mode(SaveMode.Overwrite).parquet(staged)

    def runOnce(): Unit = {
      val q = EventsStream.startMergeSink(spark, staged, target)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val expected = EventsStream.windowedCounts(events)
    // materialize before the replay overwrites the target files
    val count1 = spark.read.parquet(target).count()
    val diff1  = spark.read.parquet(target).except(expected).count() +
      expected.except(spark.read.parquet(target)).count()
    assert(count1 == expected.count())
    assert(diff1 == 0)
    // replay the same source: the MERGE keeps the sink unchanged
    runOnce()
    spark.catalog.refreshByPath(target)
    val got2 = spark.read.parquet(target)
    assert(got2.count() == count1)
    assert(got2.except(expected).count() == 0)
  }

  test("stream-stream attribution join matches the batch interval join") {
    val staged = java.nio.file.Files.createTempDirectory("graft_attr_spec").toString
    val events = Tables(spark, sf0001).events
    events.coalesce(2).write.mode(SaveMode.Overwrite).parquet(staged)

    val q = EventsStream.startAttribution(spark, staged, "attr_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_test")
      val views = events.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      val batch = views.join(
        clicks,
        col("v_user") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("interval 10 minutes"))
      assert(streamed.count() == batch.count())
      assert(streamed.count() > 0, "expected at least one attributed click in the window")
      // every attributed pair respects the 10-minute window
      assert(streamed.filter(
        col("click_ts") < col("view_ts") ||
          col("click_ts") > col("view_ts") + expr("interval 10 minutes")).count() == 0)
    } finally q.stop()
  }

  test("stream-static enrichment joins every event to its dim segment") {
    val staged = java.nio.file.Files.createTempDirectory("graft_enrich_spec").toString
    val events = Tables(spark, sf0001).events
    events.coalesce(2).write.mode(SaveMode.Overwrite).parquet(staged)

    val q = EventsStream.startEnrich(spark, staged, staged, "enrich_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_test")
      // 1:1 with the stream side (static join buffers nothing, drops nothing)
      assert(streamed.count() == events.count())
      // every event got a segment, and it is the hash the dim derivation uses
      assert(streamed.filter(col("segment").isNull).count() == 0)
      val bad = streamed
        .filter(col("segment") =!= concat(lit("S"), pmod(col("user_id"), lit(4))))
        .count()
      assert(bad == 0, "segment must match the dim derivation for every row")
    } finally q.stop()
  }

  test("streaming windowed counts match the batch equivalent") {
    // stage events as TimestampType parquet (source table is TIMESTAMP(NANOS))
    val staged = java.nio.file.Files.createTempDirectory("graft_stream_spec").toString
    val events = Tables(spark, sf0001).events
    events.coalesce(2).write.mode(SaveMode.Overwrite).parquet(staged)

    val q = EventsStream.start(spark, staged, "stream_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_test")
      val batch = events
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val s = streamed.select("window_start", "event_type", "n_events")
        .orderBy("window_start", "event_type").collect().toSeq
      val b = batch.orderBy("window_start", "event_type").collect().toSeq
      assert(s.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))) ==
        b.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))))
    } finally q.stop()
  }

  test("streaming per-user SES replays the pinned recursion over each user's observed span") {
    val staged = java.nio.file.Files.createTempDirectory("graft_ses_stream").toString
    // two waves split mid-corpus: the recursion must continue across
    // micro-batches from the state store, not restart per delivery
    val ev = Tables(spark, sf0001).events
      .filter($"user_id".isNotNull)
      .orderBy("ts", "event_id")
    val n = ev.count()
    val rows = ev.collect()
    spark.createDataFrame(spark.sparkContext.parallelize(rows.take((n / 2).toInt).toSeq), ev.schema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q = EventsStream.startSesDays(spark, staged, "ses_stream_test")
    try {
      q.processAllAvailable()
      spark.createDataFrame(spark.sparkContext.parallelize(rows.drop((n / 2).toInt).toSeq), ev.schema)
        .coalesce(1).write.mode(SaveMode.Append).parquet(staged)
      q.processAllAvailable()
      val streamed = spark.table("ses_stream_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .groupBy(_._1)
      assert(streamed.nonEmpty && streamed.size > 5, "needs many user series")
      // reference: sesLevels over each user's own observed day span,
      // zero-filled, excluding the final (still open) day
      val byUser = rows
        .map(r => (r.getLong(r.fieldIndex("user_id")),
          Math.floorDiv(r.getTimestamp(r.fieldIndex("ts")).getTime, 86400000L)))
        .groupBy(_._1)
      streamed.foreach { case (uid, emitted) =>
        val days = byUser(uid).map(_._2)
        val d0 = days.min
        val dN = days.max
        val counts = (d0 until dN).map(d => days.count(_ == d).toLong).toIndexedSeq
        val want = graft.ops.EventsOps.sesLevels(counts)
          .zipWithIndex.map { case ((lvl, fc), i) =>
            (uid, d0 + i, counts(i), lvl, fc) }
        val got = emitted.sortBy(_._2).toIndexedSeq
        assert(got == want, s"user $uid: streamed SES diverges from sesLevels")
      }
    } finally q.stop()
  }

  test("streaming SES drops at-least-once re-deliveries instead of double-counting the open day") {
    val staged = java.nio.file.Files.createTempDirectory("graft_ses_redeliver").toString
    val ev = Tables(spark, sf0001).events
      .filter($"user_id".isNotNull)
      .orderBy("ts", "event_id")
    val n = ev.count()
    val rows = ev.collect()
    val wave1 = rows.take((n / 2).toInt).toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(wave1), ev.schema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q = EventsStream.startSesDays(spark, staged, "ses_redeliver_test")
    try {
      q.processAllAvailable()
      // an at-least-once source re-delivers wave 1 VERBATIM — every event
      // sits at or before each user's stored (micros, event_id) position,
      // including events on the still-open day, and must be dropped (the
      // pre-fix state only rejected whole-day regressions, so open-day
      // re-deliveries double-counted)
      spark.createDataFrame(spark.sparkContext.parallelize(wave1), ev.schema)
        .coalesce(1).write.mode(SaveMode.Append).parquet(staged)
      q.processAllAvailable()
      spark.createDataFrame(spark.sparkContext.parallelize(rows.drop((n / 2).toInt).toSeq), ev.schema)
        .coalesce(1).write.mode(SaveMode.Append).parquet(staged)
      q.processAllAvailable()
      val streamed = spark.table("ses_redeliver_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .groupBy(_._1)
      // the reference is the CLEAN single-delivery recursion: re-delivery
      // must change nothing
      val byUser = rows
        .map(r => (r.getLong(r.fieldIndex("user_id")),
          Math.floorDiv(r.getTimestamp(r.fieldIndex("ts")).getTime, 86400000L)))
        .groupBy(_._1)
      streamed.foreach { case (uid, emitted) =>
        val days = byUser(uid).map(_._2)
        val d0 = days.min
        val counts = (d0 until days.max).map(d => days.count(_ == d).toLong).toIndexedSeq
        val want = graft.ops.EventsOps.sesLevels(counts)
          .zipWithIndex.map { case ((lvl, fc), i) => (uid, d0 + i, counts(i), lvl, fc) }
        assert(emitted.sortBy(_._2).toIndexedSeq == want,
          s"user $uid: re-delivery skewed the SES recursion")
      }
    } finally q.stop()
  }

  test("streaming per-user Holt replays the pinned double recursion across micro-batches") {
    val staged = java.nio.file.Files.createTempDirectory("graft_holt_stream").toString
    // two waves split mid-corpus: the (level, trend) pair must continue
    // across micro-batches from the state store, not restart per delivery
    val ev = Tables(spark, sf0001).events
      .filter($"user_id".isNotNull)
      .orderBy("ts", "event_id")
    val n = ev.count()
    val rows = ev.collect()
    spark.createDataFrame(spark.sparkContext.parallelize(rows.take((n / 2).toInt).toSeq), ev.schema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q = EventsStream.startHoltDays(spark, staged, "holt_stream_test")
    try {
      q.processAllAvailable()
      spark.createDataFrame(spark.sparkContext.parallelize(rows.drop((n / 2).toInt).toSeq), ev.schema)
        .coalesce(1).write.mode(SaveMode.Append).parquet(staged)
      q.processAllAvailable()
      val streamed = spark.table("holt_stream_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
        .groupBy(_._1)
      assert(streamed.nonEmpty && streamed.size > 5, "needs many user series")
      // reference: holtLevels over each user's own observed day span,
      // zero-filled, excluding the final (still open) day
      val byUser = rows
        .map(r => (r.getLong(r.fieldIndex("user_id")),
          Math.floorDiv(r.getTimestamp(r.fieldIndex("ts")).getTime, 86400000L)))
        .groupBy(_._1)
      streamed.foreach { case (uid, emitted) =>
        val days = byUser(uid).map(_._2)
        val d0 = days.min
        val counts = (d0 until days.max).map(d => days.count(_ == d).toLong).toIndexedSeq
        val want = graft.ops.EventsOps.holtLevels(counts)
          .zipWithIndex.map { case ((lvl, tr, fc), i) =>
            (uid, d0 + i, counts(i), lvl, tr, fc) }
        val got = emitted.sortBy(_._2).toIndexedSeq
        assert(got == want, s"user $uid: streamed Holt diverges from holtLevels")
      }
    } finally q.stop()
  }

  test("streaming per-user Holt-Winters replays the pinned ring-buffer recursion across micro-batches") {
    val staged = java.nio.file.Files.createTempDirectory("graft_hw_stream").toString
    // two waves split mid-corpus: level, trend AND the 7-slot seasonal
    // ring must continue across micro-batches from the state store
    val ev = Tables(spark, sf0001).events
      .filter($"user_id".isNotNull)
      .orderBy("ts", "event_id")
    val n = ev.count()
    val rows = ev.collect()
    spark.createDataFrame(spark.sparkContext.parallelize(rows.take((n / 2).toInt).toSeq), ev.schema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q = EventsStream.startHwDays(spark, staged, "hw_stream_test")
    try {
      q.processAllAvailable()
      spark.createDataFrame(spark.sparkContext.parallelize(rows.drop((n / 2).toInt).toSeq), ev.schema)
        .coalesce(1).write.mode(SaveMode.Append).parquet(staged)
      q.processAllAvailable()
      val streamed = spark.table("hw_stream_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), if (r.isNullAt(6)) None else Some(r.getLong(6))))
        .groupBy(_._1)
      assert(streamed.nonEmpty && streamed.size > 5, "needs many user series")
      val byUser = rows
        .map(r => (r.getLong(r.fieldIndex("user_id")),
          Math.floorDiv(r.getTimestamp(r.fieldIndex("ts")).getTime, 86400000L)))
        .groupBy(_._1)
      streamed.foreach { case (uid, emitted) =>
        val days = byUser(uid).map(_._2)
        val d0 = days.min
        val counts = (d0 until days.max).map(d => days.count(_ == d).toLong).toIndexedSeq
        val want = graft.ops.EventsOps.hwLevels(counts)
          .zipWithIndex.map { case ((lvl, tr, sn, fc), i) =>
            (uid, d0 + i, counts(i), lvl, tr, sn, fc) }
        val got = emitted.sortBy(_._2).toIndexedSeq
        assert(got == want, s"user $uid: streamed HW diverges from hwLevels")
      }
    } finally q.stop()
  }
}
