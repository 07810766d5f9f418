package graft.ops

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Semantic + plan-shape checks for the round-4 pipeline ops (value
  * parity with DuckDB is the oracle gate, replicated by tools/check.py). */
class PipelineOpsSpec extends SparkSuite {

  test("text_gopher_quality: signals are consistent and keep applies the gate") {
    val df = SparkEntry.queries("text_gopher_quality")(spark, sf0001).cache()
    assert(df.count() == Tables(spark, sf0001).documents.count(),
      "quality gate must score every document")
    // signal domains
    assert(df.filter(col("dup_word_frac") < 0 || col("dup_word_frac") > 1).count() == 0)
    assert(df.filter(col("stop_frac") < 0 || col("stop_frac") > 1).count() == 0)
    assert(df.filter(col("distinct_words") > col("n_words")).count() == 0)
    // keep == the documented predicate, row by row; reconstruct the
    // integer stop_hits with round() — a bare stop_frac * n_words float
    // round-trip lands at 1.999… for many (2, n) pairs
    val inconsistent = df.filter(
      (col("keep") === 1) =!=
        (col("n_words").between(50, 100000) && col("mean_word_len").between(3, 10)
          && round(col("stop_frac") * col("n_words")).cast("long") >= 2))
    assert(inconsistent.count() == 0, "keep flag must equal its published predicate")
    // the gate must actually split the corpus (word-salad docs vary in stopwords)
    val keeps = df.groupBy("keep").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keeps.keySet == Set(0L, 1L), s"expected both verdicts, got $keeps")
    // zero-shuffle projection: no Exchange anywhere in the plan
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "quality scoring must stay a scan-speed projection")
    df.unpersist()
  }

  test("text_seqlen_pack: shards respect the token budget and partition bounds") {
    val df = SparkEntry.queries("text_seqlen_pack")(spark, sf0001).cache()
    // every document lands in exactly one shard
    val src = Tables(spark, sf0001).documents
      .select(expr("CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)").as("n_tokens"))
    assert(df.agg(sum("n_docs")).head.getLong(0) == src.count())
    // a shard only overflows 512 by its LAST doc (tokens_before < 512·(shard+1)
    // for every member) — so shard_tokens < 512 + the largest document,
    // bounded from the DATA, not an assumed doc size
    val maxDoc = src.agg(max("n_tokens")).head.getLong(0)
    assert(df.filter(col("shard_tokens") >= 512 + maxDoc).count() == 0,
      "a shard absorbed more than budget + one document")
    // shards are dense per (lang, bucket): 0..max with no holes — valid
    // only while no single doc jumps multiple 512 boundaries
    if (maxDoc < 512) {
      val holes = df.groupBy("lang", "bucket")
        .agg(countDistinct("shard").as("n"), max("shard").as("mx"))
        .filter(col("n") =!= col("mx") + 1)
      assert(holes.count() == 0, "shard ids must be dense per packing partition")
    }
    df.unpersist()
  }

  test("dedup_source_priority: one winner per key, lowest source number wins") {
    val df = SparkEntry.queries("dedup_source_priority")(spark, sf0001).cache()
    val docs = Tables(spark, sf0001).documents
      .select(col("doc_id"), col("source"), substring(col("text"), 1, 40).as("prefix_key"),
        substring(col("source"), 4, 10).cast("int").as("priority")).cache()
    // exactly one representative per distinct prefix key
    assert(df.count() == docs.select("prefix_key").distinct().count())
    assert(df.select("prefix_key").distinct().count() == df.count())
    // the winner carries the minimum priority of its group
    val minPrio = docs.groupBy("prefix_key").agg(min("priority").as("min_prio"))
    val winners = df.join(docs.select(col("doc_id"), col("priority")), "doc_id")
      .join(minPrio, "prefix_key")
    assert(winners.filter(col("priority") =!= col("min_prio")).count() == 0,
      "a lower-priority source beat a higher-priority one")
    // group sizes add back up to the corpus
    assert(df.agg(sum("group_n")).head.getLong(0) == docs.count())
    // skew posture: the canonical pick must be an aggregation (map-side
    // partials absorb hot boilerplate keys), never a row_number window
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"hot-key-unsafe window in dedup plan:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial"),
      s"expected a partial aggregate before the shuffle:\n$plan")
    docs.unpersist(); df.unpersist()
  }

  test("sample_hash_split: deterministic, exhaustive, and ~90/5/5") {
    val df = SparkEntry.queries("sample_hash_split")(spark, sf0001).cache()
    val docs = Tables(spark, sf0001).documents.count()
    assert(df.agg(sum("n_docs")).head.getLong(0) == docs, "every doc gets a split")
    val bySplit = df.groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit("train").toDouble / docs > 0.8, s"train share collapsed: $bySplit")
    assert(bySplit.getOrElse("test", 0L) + bySplit.getOrElse("val", 0L) > 0,
      s"holdout splits empty at n=$docs: $bySplit")
    // determinism: a re-run assigns identical splits (no rand() anywhere)
    val again = SparkEntry.queries("sample_hash_split")(spark, sf0001)
    assert(df.except(again).count() == 0 && again.except(df).count() == 0)
    df.unpersist()
  }

  test("io_zorder_layout: z files prune on the secondary dimension where 1-D sort cannot") {
    // run the op once so the z-clustered files exist
    SparkEntry.queries("io_zorder_layout")(spark, sf0001).collect()
    val zPath = CoreOps.scratch(sf0001, "zorder_layout")

    // a shipdate-sorted layout of the same data, same file count
    val sortedPath = java.nio.file.Files.createTempDirectory("graft_zorder_cmp").toString
    Tables(spark, sf0001).lineitem
      .select("l_shipdate", "l_suppkey", "l_returnflag", "l_extendedprice")
      .repartitionByRange(16, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(sortedPath)

    // a suppkey-only predicate: how many files hold matching rows?
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("l_suppkey").between(5, 8))
        .select(input_file_name()).distinct().count()
    def filesTotal(path: String): Long =
      spark.read.parquet(path).select(input_file_name()).distinct().count()

    val (zTouched, zTotal) = (filesTouched(zPath), filesTotal(zPath))
    val (sTouched, sTotal) = (filesTouched(sortedPath), filesTotal(sortedPath))
    // the 1-D shipdate sort scatters every suppkey across ~all files…
    assert(sTouched >= sTotal - 1, s"expected no suppkey clustering, got $sTouched/$sTotal")
    // …while the curve confines the suppkey range to a strict subset
    assert(zTouched < sTouched,
      s"z-order must prune secondary-dim files: z=$zTouched/$zTotal sorted=$sTouched/$sTotal")
    // 5..8 of 10 suppkeys straddles the rank-space midpoint, so the box
    // spans both supp half-tiles — still must stay well under full scan
    assert(zTouched <= zTotal * 2 / 3,
      s"a 4-suppkey box should cluster into ≤ 2/3 of the z files: $zTouched/$zTotal")
  }

  test("adversarial skew: one-token corpus keeps unigram scoring exact") {
    import spark.implicits._
    // 2,000 docs of the SAME 50-token text: the vocabulary collapses to a
    // single token key, so the frequency join is total skew — the case a
    // window-based count dies on and the partial-agg + AQE shape survives
    val staged = java.nio.file.Files.createTempDirectory("graft_skew_docs").toString
    val text = Seq.fill(50)("spark").mkString(" ")
    (0L until 2000L).map(i => (i, text, "en", "src0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8).write.mode("overwrite").parquet(s"$staged/documents.parquet")
    val scored = SparkEntry.queries("text_unigram_score")(spark, staged).cache()
    assert(scored.count() == 2000)
    // freq("spark") = 100,000 ⇒ every doc: n_tokens=50, freq_sum=5e6
    val bad = scored.filter(
      col("n_tokens") =!= 50L || col("freq_sum") =!= 5000000L
        || col("avg_token_freq") =!= 100000.0)
    assert(bad.count() == 0, "skewed vocabulary changed the exact counts")
    scored.unpersist()
    // the quality gate on the same corpus: pure repetition is caught
    val q = SparkEntry.queries("text_gopher_quality")(spark, staged)
    assert(q.filter(col("dup_word_frac") < 0.9).count() == 0)
    assert(q.filter(col("keep") === 1).count() == 0, "pure repetition must not pass the gate")
  }

  test("dedup_incremental: arriving docs dedup against history and within the batch") {
    import spark.implicits._
    // constructed corpus with real cross-split collisions: 200 docs over
    // 60 distinct texts, split 80/20 by the op's own doc-id hash
    val staged = java.nio.file.Files.createTempDirectory("graft_incdedup").toString
    // lang/source vary per doc so a chimera (fields stitched from
    // different duplicates) would break the winner-row assertions below
    val docs = (0L until 200L).map(i =>
      (i, s"text body ${i % 60}", s"l${i % 3}", s"src${i % 7}", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$staged/documents.parquet")

    val out = SparkEntry.queries("dedup_incremental")(spark, staged).cache()
    val hashed = docs.select(col("doc_id"), col("text"),
      graft.Norm.hashBucket(col("doc_id"), 100).as("b"))
    val existingTexts = hashed.filter(col("b") < 80).select("text").distinct()
    val arriving = hashed.filter(col("b") >= 80)
    // survivors = arriving texts never seen in history, one row per text
    val expectedTexts = arriving.select("text").distinct()
      .except(existingTexts)
    assert(out.count() == expectedTexts.count(), "one survivor per genuinely-new text")
    // every survivor's batch_copies equals that text's multiplicity in the batch
    val mult = arriving.groupBy("text").count()
    val joined = out.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .join(mult, "text")
    assert(joined.filter(col("batch_copies") =!= col("count")).count() == 0)
    // the winner is a REAL row: its lang/source must match its doc_id's
    val winners = out.join(
      docs.select(col("doc_id"), col("lang").as("src_lang"), col("source").as("src_source")),
      "doc_id")
    assert(winners.filter(
      col("lang") =!= col("src_lang") || col("source") =!= col("src_source")).count() == 0,
      "survivor fields stitched from different duplicate rows")
    // and nothing that history already had survives
    assert(out.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .join(existingTexts, Seq("text"), "left_semi").count() == 0)
    out.unpersist()
  }

  test("io_nested_prune: the scan reads only the two touched leaves") {
    val df = SparkEntry.queries("io_nested_prune")(spark, sf0001)
    assert(df.count() > 0)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // pruned: the struct leaves we touch survive…
    assert(scan.contains("event_type") && scan.contains("value"),
      s"expected the touched leaves in ReadSchema: $scan")
    // …and the untouched heavy leaves are gone from the scan entirely
    assert(!scan.contains("props") && !scan.contains("user_id"),
      s"nested pruning regressed — scan reads untouched leaves: $scan")
  }

  test("dedup_containment: flags a constructed embedded document asymmetrically") {
    import spark.implicits._
    // B embeds A verbatim inside extra text: containment(A→B) = 1, but
    // containment(B→A) is low — the asymmetry Jaccard misses. Shingle df
    // stays ≥2 only for the shared region, and a filler doc C shares none.
    val staged = java.nio.file.Files.createTempDirectory("graft_contain").toString
    val core = (1 to 30).map(i => s"w$i").mkString(" ")
    val extra = (1 to 60).map(i => s"x$i").mkString(" ")
    Seq(
      (1L, core, "en", "src0", core.length.toLong),
      (2L, s"$extra $core", "en", "src1", 10L),
      (3L, (1 to 40).map(i => s"z$i").mkString(" "), "en", "src2", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$staged/documents.parquet")
    val out = SparkEntry.queries("dedup_containment")(spark, staged)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("containment")).toMap
    assert(out.get((1L, 2L)).contains(1.0), s"A⊆B must score 1.0, got $out")
    assert(!out.contains((2L, 1L)), "B→A is low-containment and must not pass the 0.8 gate")
    assert(!out.keys.exists { case (a, b) => a == 3L || b == 3L }, "unrelated doc paired")
  }

  test("text_mixture_weights: shares sum to 1 and weights rebalance to uniform") {
    val df = SparkEntry.queries("text_mixture_weights")(spark, sf0001).cache()
    val rows = df.collect()
    assert(rows.length == df.select("lang").distinct().count())
    // shares partition the corpus
    assert(math.abs(rows.map(_.getAs[Double]("actual_share")).sum - 1.0) < 1e-9)
    // applying the weights makes every language contribute the same
    // expected token mass: weight × n_tokens is constant across langs
    val masses = rows.map(r => r.getAs[Double]("sample_weight") * r.getAs[Long]("n_tokens"))
    assert((masses.max - masses.min) / masses.max < 1e-9,
      s"weights do not rebalance to uniform: ${masses.mkString(",")}")
    // under-represented languages up-weight, over-represented down-weight
    rows.foreach { r =>
      val share = r.getAs[Double]("actual_share")
      val w = r.getAs[Double]("sample_weight")
      assert((share < 1.0 / rows.length) == (w > 1.0) || math.abs(w - 1.0) < 1e-9,
        s"lang ${r.getString(0)}: share=$share weight=$w")
    }
    df.unpersist()
  }

  test("sample_weighted: inclusion probability increases with weight (A-ES property)") {
    import spark.implicits._
    val docs = Tables(spark, sf0001).documents.select("doc_id", "n_chars").cache()
    val n = docs.count()
    val k = (n / 5).toInt // 20% sample per trial
    // 64 independent trials: re-derive u from a salted md5 each time —
    // the deterministic sampler's analog of re-running with a new seed
    val salts = (0 until 64).toDF("salt")
    val trials = docs.crossJoin(salts)
      .withColumn("u",
        (expr("conv(substr(md5(concat(cast(doc_id as string), '_', cast(salt as string))), 1, 8), 16, 10)")
          .cast("long") + 1) / lit(4294967296.0))
      .withColumn("aes", log(col("u")) / col("n_chars"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("salt")
          .orderBy(col("aes").desc, col("doc_id").asc)))
      .filter(col("rn") <= k)
    val inclusion = trials.groupBy("doc_id").agg(count(lit(1)).as("n_sel"))
    val byQuartile = docs.join(inclusion, Seq("doc_id"), "left").na.fill(0L, Seq("n_sel"))
      .withColumn("q", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("n_chars"), col("doc_id"))))
      .groupBy("q").agg(avg("n_sel").as("rate"))
      .orderBy("q").select("rate").as[Double].collect()
    assert(byQuartile.length == 4)
    // heavier documents must be selected strictly more often, quartile
    // over quartile — the defining A-ES property
    byQuartile.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi > lo, s"inclusion rate not increasing with weight: ${byQuartile.mkString(",")}")
    }
    docs.unpersist()
  }

  test("allRows rejects zero-width-capable patterns instead of mis-tagging events") {
    val events = Tables(spark, sf0001).events
    // static guard: an empty-matching pattern fails at construction
    intercept[IllegalArgumentException] {
      graft.ops.PatternMatch.allRows(
        events, "user_id", Seq("ts", "event_id"), lit("v"), "c*")
    }
    // runtime guard: a mid-string zero-width (lookahead) match passes the
    // static check but must abort the job — split() and extract_all
    // disagree on it, so the offsets would silently desynchronize
    val ex = intercept[Exception] {
      graft.ops.PatternMatch.allRows(
        events, "user_id", Seq("ts", "event_id"),
        when(col("event_type") === "view", "v").otherwise("x"), "(?=v)|vx")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("zero-width")),
      s"expected the zero-width abort, got: ${messages(ex).mkString(" | ")}")
  }

  test("win_pattern_match: funnel counts equal a hand-walked scan of each sequence") {
    val df = SparkEntry.queries("win_pattern_match")(spark, sf0001).cache()
    val events = Tables(spark, sf0001).events
    assert(df.count() == events.select("user_id").distinct().count())
    assert(df.agg(sum("seq_len")).head.getLong(0) == events.count(),
      "every event contributes exactly one letter")
    // independent verification: rebuild each user's sequence driver-side
    // with the op's own explicit classifier and count v c* p matches
    // with a hand-rolled walk (no regex)
    val seqs = events
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .otherwise("x").as("i"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        u -> rows.sortBy { r =>
          val t = r.getTimestamp(1).toInstant
          (t.getEpochSecond, t.getNano.toLong, r.getLong(2))
        }.map(_.getString(3)).mkString
      }
    def walkCount(s: String): Long = {
      var n = 0L; var i = 0
      while (i < s.length) {
        if (s(i) == 'v') {
          var j = i + 1
          while (j < s.length && s(j) == 'c') j += 1
          if (j < s.length && s(j) == 'p') { n += 1; i = j + 1 } else i += 1
        } else i += 1
      }
      n
    }
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    seqs.foreach { case (u, s) =>
      assert(got(u) == walkCount(s), s"user $u: regex=${got(u)} walk=${walkCount(s)} seq=$s")
    }
    assert(got.values.sum > 0, "fixture should contain at least one funnel")
    df.unpersist()
  }

  test("text_boilerplate_strip: counts are consistent and flagged blocks truly recur") {
    val df = SparkEntry.queries("text_boilerplate_strip")(spark, sf0001).cache()
    // internal consistency of every row
    assert(df.filter(col("n_boiler") > col("n_blocks")).count() == 0)
    assert(df.filter(col("clean_tokens") =!= (col("n_blocks") - col("n_boiler")) * 8).count() == 0)
    // total block count equals an independent tiling of the corpus
    val expectedBlocks = Tables(spark, sf0001).documents
      .select(expr("size(split(text, ' ')) DIV 8").as("nb"))
      .agg(sum("nb")).head.getLong(0)
    assert(df.agg(sum("n_blocks")).head.getLong(0) == expectedBlocks,
      "every full 8-word block must be tiled exactly once")
    // the corpus actually contains cross-doc boilerplate, and flagging is
    // symmetric: total flagged occurrences exceed the distinct flagged
    // blocks (each boilerplate block is stripped from >= 2 docs)
    val boiler = df.agg(sum("n_boiler")).head.getLong(0)
    assert(boiler > 0, "fixture should contain recurring blocks")
    val blocks = Tables(spark, sf0001).documents
      .select(col("doc_id"), explode(expr(
        "transform(filter(transform(sequence(1, size(split(text, ' ')), 8), i -> slice(split(text, ' '), i, 8)), b -> size(b) = 8), b -> concat_ws(' ', b))"
      )).as("gr"))
    val distinctBoiler = blocks.groupBy("gr")
      .agg(countDistinct("doc_id").as("df")).filter(col("df") >= 2).count()
    assert(boiler >= 2 * distinctBoiler,
      s"flagged occurrences ($boiler) must cover every doc of each of the $distinctBoiler recurring blocks")
    df.unpersist()
  }

  test("PatternMatch generalizes: a second pattern over a custom classifier") {
    val events = Tables(spark, sf0001).events
    // DEFINE: a coarser two-class alphabet (purchase vs anything else);
    // PATTERN: at least two non-purchases then a purchase — different
    // classifier AND different regex than the shipped funnel op
    val df = PatternMatch.count(
      events, key = "user_id", orderCols = Seq("ts", "event_id"),
      symbol = when(col("event_type") === "purchase", "p").otherwise("o"),
      pattern = "(oo+p)").cache()
    assert(df.count() == events.select("user_id").distinct().count())
    // independent driver-side walk with the same greedy non-overlap rule
    val seqs = events
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", "p").otherwise("o").as("i"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        u -> rows.sortBy { r =>
          val t = r.getTimestamp(1).toInstant
          (t.getEpochSecond, t.getNano.toLong, r.getLong(2))
        }.map(_.getString(3)).mkString
      }
    def walkCount(s: String): Long = {
      var n = 0L; var i = 0
      while (i < s.length) {
        if (s(i) == 'o') {
          var j = i
          while (j < s.length && s(j) == 'o') j += 1
          if (j - i >= 2 && j < s.length && s(j) == 'p') { n += 1; i = j + 1 } else i = j
        } else i += 1
      }
      n
    }
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    seqs.foreach { case (u, s) =>
      assert(got(u) == walkCount(s), s"user $u: regex=${got(u)} walk=${walkCount(s)} seq=$s")
    }
    assert(got.values.sum > 0, "fixture should contain at least one oo+p match")
    df.unpersist()
  }

  test("win_pattern_abandon: abandonment counts are bounded by views and disjoint from conversions") {
    val events = Tables(spark, sf0001).events
    val abandoned = SparkEntry.queries("win_pattern_abandon")(spark, sf0001).cache()
    assert(abandoned.count() == events.select("user_id").distinct().count())
    assert(abandoned.agg(sum("seq_len")).head.getLong(0) == events.count())
    // every match consumes exactly one view: per user, abandoned runs
    // (and abandoned + converted runs combined) can never exceed views
    val views = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(count(lit(1)).as("n_views"))
    val funnels = SparkEntry.queries("win_pattern_match")(spark, sf0001)
      .select(col("user_id"), col("n_funnels"))
    val joined = abandoned.join(views, Seq("user_id"), "left")
      .join(funnels, Seq("user_id"))
      .na.fill(0L, Seq("n_views"))
    assert(joined.filter(col("n_abandoned") + col("n_funnels") > col("n_views")).count() == 0,
      "pattern matches exceeded available views — runs must be disjoint")
    assert(abandoned.agg(sum("n_abandoned")).head.getLong(0) > 0,
      "fixture should contain at least one interrupted funnel")
    abandoned.unpersist()
  }

  test("fn_json_shred: the re-read plan parses no JSON and prunes to the typed leaf") {
    val df = SparkEntry.queries("fn_json_shred")(spark, sf0001)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // parse-once: the query over the shredded table must not re-parse
    assert(!plan.contains("from_json"), s"query re-parses JSON:\n$plan")
    val scan = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("p:struct<k:bigint"), s"typed struct leaf missing from scan: $scan")
    // exactness: shredded aggregate equals parsing at query time
    val direct = Tables(spark, sf0001).events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        min(get_json_object(col("props"), "$.k").cast("long")).as("min_k"),
        max(get_json_object(col("props"), "$.k").cast("long")).as("max_k"))
    assert(df.except(direct).count() == 0 && direct.except(df).count() == 0)
  }

  test("text_unigram_score: frequencies weight every token and scores stay in range") {
    val df = SparkEntry.queries("text_unigram_score")(spark, sf0001).cache()
    val docs = Tables(spark, sf0001).documents.count()
    assert(df.count() == docs)
    // avg_token_freq is bounded by [1, total tokens] and freq_sum/n_tokens exactly
    val bad = df.filter(
      col("avg_token_freq") < 1 ||
        col("avg_token_freq") =!= col("freq_sum") / col("n_tokens"))
    assert(bad.count() == 0)
    // a doc of corpus-common tokens outscores one of rare tokens: the
    // max-avg doc must use tokens with higher average count than the min-avg doc
    val mx = df.agg(max("avg_token_freq"), min("avg_token_freq")).head()
    assert(mx.getDouble(0) > mx.getDouble(1), "scores must discriminate documents")
    df.unpersist()
  }

  test("sample_class_balance keeps exactly the minority count in every class") {
    val df = SparkEntry.queries("sample_class_balance")(spark, sf0001).cache()
    val counts = Tables(spark, sf0001).embeddings
      .groupBy("label").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min
    val kept = df.groupBy("label").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(kept.keySet == counts.keySet, "every class survives")
    assert(kept.values.forall(_ == nMin), s"every class must keep exactly $nMin rows: $kept")
    // determinism: the hash-ranked keep set is a function of the data alone
    val again = SparkEntry.queries("sample_class_balance")(spark, sf0001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(again == df.select("vec_id").collect().map(_.getLong(0)).toSet)
    df.unpersist()
  }

  test("text_dedup_substring emits maximal duplicated spans >= 50 chars") {
    val out = SparkEntry.queries("text_dedup_substring")(spark, sf0001).cache()
    assert(out.count() > 0, "the corpus is known to contain repeated sentences")
    assert(out.filter(col("span_len") < 50).count() == 0, "spans are at least shingle-length")
    // maximality: two spans of one doc can never touch or overlap — a
    // touching pair would have merged into one island
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.values.foreach { spans =>
      val sorted = spans.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, s1, l1), (_, s2, _)) =>
          assert(s1 + l1 < s2 + 50,
            "adjacent spans with overlapping shingle runs must have merged")
        case _ =>
      }
    }
    // the op slices bytes (O(1)) and reports byte offsets; this corpus
    // is pure ASCII, so the char-based checks below line up — assert
    // that premise so a future non-ASCII testdata generation fails here
    // instead of silently shifting offsets
    assert(Tables(spark, sf0001).documents
      .filter(octet_length(col("text").cast("binary")) =!= length(col("text"))).count() == 0,
      "byte-offset spans assume an ASCII corpus")
    // ground truth on the real data: every span's text occurs at least
    // twice in the corpus (spot-check the longest span)
    val top = out.orderBy(col("span_len").desc).head()
    val doc = Tables(spark, sf0001).documents
      .filter(col("doc_id") === top.getLong(0)).head().getAs[String]("text")
    val spanText = doc.substring(top.getLong(1).toInt - 1, (top.getLong(1) + top.getLong(2) - 1).toInt)
    val occurrences = Tables(spark, sf0001).documents
      .filter(col("text").contains(spanText)).count()
    val selfRepeats = doc.sliding(spanText.length).count(_ == spanText)
    assert(occurrences >= 2 || selfRepeats >= 2,
      s"the longest emitted span must actually recur (docs=$occurrences, self=$selfRepeats)")
    out.unpersist()
  }

  test("text_dedup_substring_incr replays the full-corpus result on the batch slice") {
    import graft.Norm
    // batch-replay equivalence, the dedup_incremental contract: the
    // incremental predicate (index hit OR batch recurrence) equals the
    // full-corpus count >= 2 predicate restricted to batch docs —
    // hist >= 1 makes any batch occurrence total >= 2, and with no
    // history the total IS the batch count. So the incremental spans
    // must be row-identical to the full op's spans for arriving docs.
    val incr = SparkEntry.queries("text_dedup_substring_incr")(spark, sf0001)
    val batchDocs = Tables(spark, sf0001).documents
      .filter(Norm.hashBucket(col("doc_id"), 100) >= 80).select("doc_id")
    val full = SparkEntry.queries("text_dedup_substring")(spark, sf0001)
      .join(batchDocs, Seq("doc_id"))
    assert(incr.count() > 0, "the corpus is known to contain cross-bucket repeats")
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty,
      "incremental spans must replay the full-corpus spans on batch docs")
    // and history must genuinely participate at this SF — some batch
    // position is duplicated ONLY via the index (its gram is unique
    // within the batch), otherwise the index probe was never exercised
    val docs = Tables(spark, sf0001).documents
      .select(col("doc_id"), col("text"), length(col("text")).as("n"),
        Norm.hashBucket(col("doc_id"), 100).as("b"))
      .filter(col("n") >= 50)
    val g = docs
      .select(col("doc_id"), col("b"), col("text"),
        explode(expr("sequence(1, n - 49)")).as("p"))
      .select(col("doc_id"), col("b"), col("p"),
        md5(expr("substring(text, p, 50)")).as("h"))
    val bat = g.filter(col("b") >= 80)
    val batc = bat.groupBy("h").agg(count(lit(1)).as("c"))
    val batchOnly = bat.join(batc.filter(col("c") >= 2), Seq("h")).select("doc_id", "p")
    val viaHist = bat.join(g.filter(col("b") < 80).select("h").distinct(), Seq("h"), "left_semi")
      .select("doc_id", "p")
    assert(viaHist.exceptAll(batchOnly).count() > 0,
      "history contributes duplicated positions beyond batch-internal recurrence")
  }
}
