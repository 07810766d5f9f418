package graft.ops

import graft.{Norm, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-4 training-data pipeline operators: corpus quality gating
  * (Gopher-style repetition/stopword signals), token-budget sequence
  * packing, cross-source priority dedup, deterministic hash-based
  * train/val/test splits, and unigram-frequency document scoring.
  *
  * All five are oracle-checked: every signal is built from integer
  * counts and single int/int divisions so Spark and DuckDB produce
  * bit-identical doubles (see fn_array_pack's float-parity note —
  * the same discipline, applied to text stats).
  *
  * Scale posture: everything here is a per-row codegen'd projection, a
  * map-side-combined aggregate, or a window over a bounded composite
  * key. The only shuffles are on (doc-key) grains the operator
  * genuinely needs; nothing materializes the corpus on the driver.
  */
object PipelineOps {

  /** BPE training config, baked into [[BpeDictDir]]'s name so a change
    * misses the skip-if-present `_SUCCESS` gate mechanically (the
    * corpus fingerprint partition keys the data, the dir name keys the
    * config). */
  private[ops] val BpeVocabCap = 2048
  private[ops] val BpeMerges = 24

  /** Parquet location for text_bpe_tokenize's trained dictionary —
    * under [[graft.Artifacts.Root]] so any checkout path works; engine
    * write and oracle read interpolate the same constant (the
    * [[LibraryOracleOps.DataDir]] pattern), and the training config is
    * part of the name. */
  val BpeDictDir =
    graft.Artifacts.Root + s"/bpedata/bpe_pieces_v${BpeVocabCap}m$BpeMerges.parquet"

  /** The learned-quality-classifier holdout frame shared by
    * text_quality_learned and the eval family: (doc_id, n_tokens, score,
    * label) for every odd-doc_id holdout document — stopword-ratio
    * teacher labels, even-split-trained Laplace fixed-point weights,
    * dictionary-join scoring (the full scale rationale lives on the
    * text_quality_learned op). */
  private def learnedHoldout(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val stops = Seq("a", "the", "of", "and", "to", "in", "is", "it")
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"),
        explode(expr("split(trim(lower(text)), '\\\\s+')")).as("tok"))
    val lab = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tok").isin(stops: _*), 1L).otherwise(0L)).as("n_stop"))
      .select(col("doc_id"), col("n_tokens"),
        when(lit(100) * col("n_stop") >= lit(6) * col("n_tokens"), 1L)
          .otherwise(0L).as("label"))
    val train = toks.join(lab.select("doc_id", "label"), Seq("doc_id"))
      .filter(pmod(col("doc_id"), lit(2)) === 0)
    val prior = train.agg(
      expr("(1000 * (sum(label) + 1)) div (count(*) + 2)").as("q0"))
    val wts = train.groupBy("tok")
      .agg(sum(col("label")).as("pos"), count(lit(1)).as("n"))
      .crossJoin(broadcast(prior))
      .select(col("tok"),
        expr("(1000 * (pos + 1)) div (n + 2) - q0").as("w"))
    toks.filter(pmod(col("doc_id"), lit(2)) === 1)
      .join(wts, Seq("tok"), "left_outer")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("w"), lit(0L))).as("score"))
      .join(lab, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("score"), col("label"))
  }

  /** The shared oracle-side CTE prefix producing the same holdout frame
    * `h(doc_id, n_tokens, score, label)` — interpolated into every
    * consumer's SQL so the two sides can never drift apart. */
  private def learnedHoldoutSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(str_split_regex(trim(lower(text)), '\s+')) AS tok
      |  FROM documents),
      |lab AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |         CASE WHEN 100 * sum(CASE WHEN tok IN ('a','the','of','and','to','in','is','it')
      |                                  THEN 1 ELSE 0 END) >= 6 * count(*)
      |              THEN 1 ELSE 0 END AS label
      |  FROM toks GROUP BY doc_id),
      |train AS (
      |  SELECT t.tok, l.label FROM toks t JOIN lab l USING (doc_id)
      |  WHERE t.doc_id % 2 = 0),
      |prior AS (
      |  SELECT (1000 * (sum(label) + 1)) // (count(*) + 2) AS q0 FROM train),
      |wts AS (
      |  SELECT tok,
      |         CAST((1000 * (sum(label) + 1)) // (count(*) + 2)
      |              - (SELECT q0 FROM prior) AS BIGINT) AS w
      |  FROM train GROUP BY tok),
      |sc AS (
      |  SELECT t.doc_id, CAST(sum(COALESCE(w.w, 0)) AS BIGINT) AS score
      |  FROM toks t LEFT JOIN wts w ON w.tok = t.tok
      |  WHERE t.doc_id % 2 = 1 GROUP BY t.doc_id),
      |h AS (SELECT s.doc_id, l.n_tokens, s.score, CAST(l.label AS BIGINT) AS label
      |      FROM sc s JOIN lab l USING (doc_id))""".stripMargin

  val ops: Seq[OpQuery] = Seq(
    // ── text_gopher_quality: the repetition + stopword quality gate of
    // Gopher/MassiveText (Rae et al. 2021, §A1.1) as one codegen'd
    // projection — word count, mean word length, duplicate-word
    // fraction, stopword fraction, and the keep verdict. No shuffle at
    // all: at 100 TB this runs scan-speed and the verdict column
    // partitions the corpus for every downstream op. Ratios are
    // int/int single divisions ⇒ engine-exact.
    OpQuery.checked(
      "text_gopher_quality",
      """WITH f AS (
        |  SELECT doc_id, lang,
        |         str_split_regex(trim(text), '\s+') AS words,
        |         CAST(length(regexp_replace(trim(text), '\s', '', 'g')) AS BIGINT) AS word_chars
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |         CAST(len(words) AS BIGINT) AS n_words,
        |         CAST(len(list_distinct(words)) AS BIGINT) AS distinct_words,
        |         word_chars,
        |         CAST(len(list_filter(words, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS BIGINT) AS stop_hits
        |  FROM f)
        |SELECT doc_id, lang, n_words, distinct_words,
        |       word_chars / n_words AS mean_word_len,
        |       (n_words - distinct_words) / n_words AS dup_word_frac,
        |       stop_hits / n_words AS stop_frac,
        |       CAST(CASE WHEN n_words BETWEEN 50 AND 100000
        |                  AND word_chars / n_words BETWEEN 3 AND 10
        |                  AND stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM s""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(
          col("doc_id"), col("lang"),
          expr("split(trim(text), '\\\\s+')").as("words"),
          length(regexp_replace(trim(col("text")), "\\s", "")).cast("long").as("word_chars"))
        .select(
          col("doc_id"), col("lang"),
          size(col("words")).cast("long").as("n_words"),
          size(array_distinct(col("words"))).cast("long").as("distinct_words"),
          col("word_chars"),
          expr("CAST(size(filter(words, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS BIGINT)")
            .as("stop_hits"))
        .select(
          col("doc_id"), col("lang"), col("n_words"), col("distinct_words"),
          (col("word_chars") / col("n_words")).as("mean_word_len"),
          ((col("n_words") - col("distinct_words")) / col("n_words")).as("dup_word_frac"),
          (col("stop_hits") / col("n_words")).as("stop_frac"),
          when(col("n_words").between(50, 100000)
            && (col("word_chars") / col("n_words")).between(3, 10)
            && col("stop_hits") >= 2, 1L).otherwise(0L).as("keep"))
    },

    // ── text_repetition_topngram: the OTHER half of the Gopher
    // repetition gate (Rae et al. 2021, §A1.1) — the fraction of the
    // document consumed by its single most frequent 2-gram / 3-gram
    // (text_gopher_quality covers the duplicate-word fraction). Grams
    // are built inside the array column (no self-join), counted with a
    // hash aggregation whose partial combine absorbs repetitive docs
    // map-side, and the per-doc argmax is a struct-min aggregation
    // (count desc, gram asc tie-break) — window-free, so a pathological
    // doc never pins a window partition. Cost is linear in corpus
    // tokens: two shuffles carrying (doc_id, gram) pairs, then a 1:1
    // co-partitioned join of the two gram sizes. Fractions are
    // long/long single divisions ⇒ engine-exact. Thresholds tuned to
    // the synthetic corpus (occurrence fraction, not Gopher's
    // char fraction — documented deviation).
    OpQuery.checked(
      "text_repetition_topngram",
      """WITH w AS (
        |  SELECT doc_id, str_split(trim(text), ' ') AS ws
        |  FROM documents WHERE len(str_split(trim(text), ' ')) >= 4),
        |g2 AS (
        |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |         unnest(list_transform(generate_series(1, len(ws)-1),
        |                               i -> ws[i] || ' ' || ws[i+1])) AS gram
        |  FROM w),
        |c2 AS (
        |  SELECT doc_id, n_words, gram, CAST(count(*) AS BIGINT) AS cnt
        |  FROM g2 GROUP BY 1, 2, 3),
        |t2 AS (
        |  SELECT doc_id, n_words, gram AS top2_gram, cnt AS top2_cnt
        |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                    ORDER BY cnt DESC, gram) AS rn FROM c2)
        |  WHERE rn = 1),
        |g3 AS (
        |  SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(ws)-2),
        |                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
        |  FROM w),
        |c3 AS (
        |  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt
        |  FROM g3 GROUP BY 1, 2),
        |t3 AS (
        |  SELECT doc_id, gram AS top3_gram, cnt AS top3_cnt
        |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                    ORDER BY cnt DESC, gram) AS rn FROM c3)
        |  WHERE rn = 1)
        |SELECT t2.doc_id, n_words, top2_gram, top2_cnt,
        |       top2_cnt / (n_words - 1) AS top2_frac,
        |       top3_gram, top3_cnt,
        |       top3_cnt / (n_words - 2) AS top3_frac,
        |       CAST(CASE WHEN top2_cnt / (n_words - 1) <= 0.04
        |                  AND top3_cnt / (n_words - 2) <= 0.025
        |                 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM t2 JOIN t3 ON t3.doc_id = t2.doc_id""".stripMargin
    ) { (spark, dir) =>
      val docs = Tables(spark, dir).documents
        .select(col("doc_id"), expr("split(trim(text), ' ')").as("ws"))
        .filter(size(col("ws")) >= 4)
      def topGram(n: Int, prefix: String) = {
        val gramExpr =
          s"""transform(sequence(1, size(ws) - ${n - 1}),
             |          i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(ws, i + $j)").mkString(", ")}))"""
            .stripMargin
        docs
          .select(col("doc_id"), size(col("ws")).cast("long").as("n_words"),
            explode(expr(gramExpr)).as("gram"))
          .groupBy("doc_id", "n_words", "gram")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id", "n_words")
          .agg(min(struct((-col("cnt")).as("neg"), col("gram").as("g"))).as("top"))
          .select(col("doc_id"), col("n_words"),
            col("top.g").as(s"${prefix}_gram"), (-col("top.neg")).as(s"${prefix}_cnt"))
      }
      topGram(2, "top2")
        .join(topGram(3, "top3").drop("n_words"), Seq("doc_id"))
        .select(
          col("doc_id"), col("n_words"), col("top2_gram"), col("top2_cnt"),
          (col("top2_cnt") / (col("n_words") - 1)).as("top2_frac"),
          col("top3_gram"), col("top3_cnt"),
          (col("top3_cnt") / (col("n_words") - 2)).as("top3_frac"),
          when((col("top2_cnt") / (col("n_words") - 1)) <= 0.04
            && (col("top3_cnt") / (col("n_words") - 2)) <= 0.025, 1L)
            .otherwise(0L).as("keep"))
    },

    // ── text_seqlen_pack: pack documents into fixed token-budget shards
    // (the pretraining sequence-packing step). The scalable shape is
    // two-level: a deterministic bucket key (doc_id % B) bounds every
    // packing partition, then a running token sum within (lang, bucket)
    // assigns shard = floor(tokens-before / budget). Parallelism is
    // langs × B regardless of corpus size — raise B for 100 TB and the
    // window never sees an unbounded partition; there is exactly one
    // shuffle (the window's) plus the final tiny per-shard rollup.
    OpQuery.checked(
      "text_seqlen_pack",
      """WITH t AS (
        |  SELECT doc_id, lang, doc_id % 4 AS bucket,
        |         CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, bucket, n_tokens,
        |         COALESCE(sum(n_tokens) OVER (PARTITION BY lang, bucket ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM t)
        |SELECT lang, bucket, CAST(tokens_before // 512 AS BIGINT) AS shard,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        |       CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM c
        |GROUP BY lang, bucket, shard""".stripMargin
    ) { (spark, dir) =>
      val w = Window.partitionBy("lang", "bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(spark, dir).documents
        .select(
          col("doc_id"), col("lang"),
          pmod(col("doc_id"), lit(4L)).as("bucket"),
          expr("CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)").as("n_tokens"))
        .withColumn("tokens_before", coalesce(sum("n_tokens").over(w), lit(0L)))
        .withColumn("shard", expr("tokens_before DIV 512"))
        .groupBy("lang", "bucket", "shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("shard_tokens"),
          min("doc_id").as("first_doc"))
    },

    // ── dedup_source_priority: cross-source exact dedup that keeps ONE
    // canonical copy per boilerplate key, chosen by source priority
    // (lower src number wins) with doc_id as the deterministic
    // tie-break — the "prefer wikipedia over commoncrawl" rule of
    // corpus assembly. Deliberately an AGGREGATION (min over a
    // lexicographic struct + count), not a row_number window: partial
    // aggregation combines map-side, so a boilerplate key shared by
    // millions of docs costs one counter per task instead of shipping
    // every duplicate row into a single window partition — the hot-key
    // guard the blocked dedups need, for free. Group sizes are carried
    // so downstream weighting can up-sample canonical docs.
    OpQuery.checked(
      "dedup_source_priority",
      """WITH k AS (
        |  SELECT doc_id, lang, source,
        |         substr(text, 1, 40) AS prefix_key,
        |         CAST(substr(source, 4) AS INT) AS priority
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, source, prefix_key,
        |         row_number() OVER (PARTITION BY prefix_key ORDER BY priority, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY prefix_key) AS group_n
        |  FROM k)
        |SELECT doc_id, lang, source, prefix_key, CAST(group_n AS BIGINT) AS group_n
        |FROM r WHERE rn = 1""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(
          col("doc_id"), col("lang"), col("source"),
          substring(col("text"), 1, 40).as("prefix_key"),
          expr("substring(source, 4)").cast("int").as("priority"))
        .groupBy("prefix_key")
        .agg(
          // struct min = lexicographic (priority, doc_id) — the window's
          // ORDER BY, computed with map-side partials instead
          min(struct(col("priority"), col("doc_id"), col("lang"), col("source"))).as("w"),
          count(lit(1)).as("group_n"))
        .select(
          col("w.doc_id").as("doc_id"), col("w.lang").as("lang"),
          col("w.source").as("source"), col("prefix_key"), col("group_n"))
    },

    // ── sample_hash_split: deterministic train/val/test assignment from
    // md5(doc_id) — the split survives re-runs, repartitions, and
    // incremental corpus growth (a doc's split never changes), which
    // `rand()` cannot promise. Pure projection + map-side-combined
    // rollup: zero-shuffle assignment, one tiny aggregate. The hex
    // thresholds give ~5% test / ~5% val / ~90% train.
    OpQuery.checked(
      "sample_hash_split",
      """WITH s AS (
        |  SELECT lang, n_chars,
        |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'test'
        |              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'val'
        |              ELSE 'train' END AS split
        |  FROM documents)
        |SELECT split, lang,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM s GROUP BY split, lang""".stripMargin
    ) { (spark, dir) =>
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
      Tables(spark, dir).documents
        .select(
          col("lang"), col("n_chars"),
          when(bucket < "0d", "test").when(bucket < "1a", "val").otherwise("train").as("split"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
    },

    // ── sample_weighted: weighted sampling WITHOUT replacement that
    // materializes the mixture text_mixture_weights only computes —
    // deterministic A-ES (Efraimidis & Spirakis 2006: keep the k items
    // maximizing u^(1/w)), with u derived from md5(doc_id) instead of
    // rand() so the sample survives re-runs and repartitions (the
    // sample_hash_split trick), and the ordering done on the monotone
    // equivalent ln(u)/w — u is exactly (hex64(md5)+1)/2^32 in both
    // engines, so the ranking is engine-stable. Weight = n_chars: long
    // documents are proportionally more likely to survive, which is the
    // token-mass-preserving sampling a training mixture wants. Top-k per
    // lang stratum via row_number → Catalyst plans a WindowGroupLimit
    // (per-partition top-k before the shuffle): zero extra shuffles
    // beyond the stratum key, no driver state, any corpus size.
    OpQuery.checked(
      "sample_weighted",
      """WITH s AS (
        |  SELECT lang, doc_id, n_chars,
        |         ln((CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
        |            / 4294967296.0) / n_chars AS aes
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY lang ORDER BY aes DESC, doc_id ASC) AS rn
        |  FROM s)
        |SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 10""".stripMargin
    ) { (spark, dir) =>
      val u = (expr("conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10)").cast("long") + 1) /
        lit(4294967296.0)
      Tables(spark, dir).documents
        .select(col("lang"), col("doc_id"), col("n_chars"),
          (log(u) / col("n_chars")).as("aes"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("aes").desc, col("doc_id").asc)).cast("long"))
        .filter(col("rn") <= 10)
        .select(col("lang"), col("doc_id"), col("n_chars"), col("rn"))
    },

    // ── sample_class_balance: balanced per-class downsampling — every
    // label keeps exactly the minority class's row count (the class-
    // rebalancing step before contrastive / classifier training). The
    // per-label keep set is a deterministic hash-rank (md5 of the id —
    // the sample_hash_split trick), so the sample survives re-runs and
    // repartitions, and the cutoff n_min arrives as a 1-row aggregate
    // broadcast, not a driver-side collect. The per-label window sorts
    // only within its label partition; at a grain where even that hurts,
    // the rank would come from a per-label quantile threshold on the
    // hash (the agg_quantile_sketch machinery) instead of row_number.
    OpQuery.checked(
      "sample_class_balance",
      """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        |nm AS (SELECT CAST(min(n) AS BIGINT) AS n_min FROM c),
        |rk AS (
        |  SELECT vec_id, label,
        |         row_number() OVER (PARTITION BY label
        |             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rnk
        |  FROM embeddings)
        |SELECT rk.vec_id, rk.label, CAST(rk.rnk AS BIGINT) AS rnk
        |FROM rk CROSS JOIN nm WHERE rk.rnk <= nm.n_min""".stripMargin
    ) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings.select("vec_id", "label")
      val nMin = emb.groupBy("label").agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("n_min"))
      emb
        .withColumn("rnk", row_number().over(
          Window.partitionBy("label")
            .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))).cast("long"))
        .crossJoin(broadcast(nMin))
        .filter(col("rnk") <= col("n_min"))
        .select(col("vec_id"), col("label"), col("rnk"))
    },

    // ── sample_class_balance_threshold: the WINDOW-FREE balanced
    // sampler — the shape that survives when even a per-label window
    // partition is too big (one label = billions of rows at 100 TB).
    // The per-label keep set becomes a THRESHOLD JOIN: the (hash, id)
    // pair at per-label rank n_min — selected by
    // [[graft.algo.GlobalRank]]'s range-partitioned parallel rank over
    // the composite (label, hash, id) order, per-label rank = global
    // rank − the label's broadcast offset, so no WindowExec ever sees
    // the data — broadcasts as an n_labels-row frame, and the scoring
    // pass over the corpus is one broadcast join + pair comparison
    // with no rank column on the data at all. At 100 TB the thresholds
    // come from the per-label KLL sketch instead (the n_min/n_label
    // hash quantile) and the selection pass never runs; those sketch
    // estimates ride THIS plan hash-gated by the tie-safe rank-range
    // audit (within_eps), the score_rfm_threshold contract. The
    // sketch's quantile probabilities must be plan-time literals, so
    // the per-label row counts arrive via a label-cardinality-bounded
    // metadata read (the k-means-sample pattern: 10 label rows, never
    // the data).
    OpQuery.checked(
      "sample_class_balance_threshold",
      """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        |nm AS (SELECT CAST(min(n) AS BIGINT) AS n_min FROM c),
        |rk AS (
        |  SELECT vec_id, label,
        |         row_number() OVER (PARTITION BY label
        |             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rnk
        |  FROM embeddings)
        |SELECT rk.vec_id, rk.label, TRUE AS within_eps
        |FROM rk CROSS JOIN nm WHERE rk.rnk <= nm.n_min""".stripMargin
    ) { (spark, dir) =>
      graft.functions.KllQuantiles.register(spark)
      val emb = Tables(spark, dir).embeddings
        .select(col("vec_id"), col("label"), md5(col("vec_id").cast("string")).as("h"))
      val counts = emb.groupBy("label").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val nMin = counts.map(_._2).min
      val pOf = (n: Long) => nMin.toDouble / n
      val probs = counts.map { case (_, n) => pOf(n) }.distinct.sorted
      val lk = spark.createDataFrame(counts.toSeq.map { case (l, n) =>
        (l, n, probs.indexOf(pOf(n)) + 1, pOf(n))
      }).toDF("label", "n", "pos", "p")
      // exact selection pass (oracle-scale verification): one GlobalRank
      // over the composite order; the only partition-less window left
      // runs on the n_labels-row offsets frame
      val ranked = graft.algo.GlobalRank.withRowNumber(
        emb, Seq(col("label").asc, col("h").asc, col("vec_id").asc), "grnk", "gn")
      val offs = lk
        .withColumn("off", coalesce(sum(col("n")).over(
          Window.orderBy("label").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("label"), col("off"))
      val thr = ranked.join(broadcast(offs), "label")
        .filter(col("grnk") - col("off") === nMin)
        .select(col("label"), col("h").as("t_h"), col("vec_id").as("t_id"))
      // sketch branch: per-label hash-quantile estimates at p_l over the
      // 60-bit numeric hash view (order-compatible with the md5 string;
      // the audit compares the SAME view on both sides, so the double
      // rounding at 2^60 > 2^53 cannot skew the rank counts)
      val hd = conv(substring(col("h"), 1, 15), 16, 10).cast("double")
      val est = emb.groupBy("label")
        .agg(expr(s"kll_quantiles(cast(conv(substring(h, 1, 15), 16, 10) as double), 256, ${probs.mkString(", ")})").as("ests"))
        .join(broadcast(lk), "label")
        .select(col("label"), element_at(col("ests"), col("pos")).as("est_v"),
          col("n"), col("p"))
      val audit = emb.select(col("label"), hd.as("hd"))
        .join(broadcast(est), "label")
        .groupBy("label", "n", "p")
        .agg(sum(when(col("hd") < col("est_v"), 1L).otherwise(0L)).as("lo"),
          sum(when(col("hd") <= col("est_v"), 1L).otherwise(0L)).as("hi"))
        .agg(bool_and(
          col("lo").cast("double") <= (col("p") + 0.05) * col("n") + 4 &&
            col("hi").cast("double") >= (col("p") - 0.05) * col("n") - 4)
          .as("within_eps"))
      // scoring pass: broadcast threshold join + pair comparison
      emb.join(broadcast(thr), "label")
        .filter(col("h") < col("t_h") ||
          (col("h") === col("t_h") && col("vec_id") <= col("t_id")))
        .crossJoin(broadcast(audit))
        .select(col("vec_id"), col("label"), col("within_eps"))
    },

    // ── text_unigram_score: unigram-frequency document scoring (the
    // cheap stand-in for perplexity filtering: documents whose tokens
    // are corpus-rare score low). Two map-side-combined aggregates and
    // one shuffle join on the token key; the vocabulary aggregate is
    // zipfian-skewed by nature, which is exactly the AQE skew-join
    // case, and the per-doc rollup returns to doc grain. Scores stay
    // engine-exact: BIGINT sums + one int/int division.
    OpQuery.checked(
      "text_unigram_score",
      """WITH toks AS (
        |  SELECT doc_id, unnest(str_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |freq AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok)
        |SELECT t.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(f.cnt) AS BIGINT) AS freq_sum,
        |       sum(f.cnt) / count(*) AS avg_token_freq
        |FROM toks t JOIN freq f ON t.tok = f.tok
        |GROUP BY t.doc_id""".stripMargin
    ) { (spark, dir) =>
      val toks = Tables(spark, dir).documents
        .select(col("doc_id"),
          explode(expr("split(trim(lower(text)), '\\\\s+')")).as("tok"))
      val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum("cnt").as("freq_sum"),
          (sum("cnt") / count(lit(1))).as("avg_token_freq"))
    },

    // ── text_quality_learned: LEARNED quality gating — the fastText-
    // style linear classifier over token features (Joulin et al. 2016,
    // "Bag of Tricks for Efficient Text Classification") production
    // pipelines run where text_unigram_score is the frequency stand-in.
    // Self-supervised setup: a cheap heuristic teacher (stopword ratio
    // ≥ 6%, the corpus median, so labels split near 50/50 — integer
    // arithmetic) labels the TRAIN split (even doc_ids);
    // training is one token-grain aggregate over the train split that
    // turns occurrence counts into fixed-point posterior weights
    // centered at the TRAIN PRIOR, w(t) = q(t) − q₀ with
    // q(t) = 1000·(pos_t+1) div (pos_t+neg_t+2) and q₀ the same
    // smoothed fixed-point posterior over all train occurrences — a
    // token votes by how far it shifts the odds from the corpus base
    // rate, the Naive-Bayes evidence term (the +1/+2 is Laplace
    // smoothing; every quantity BIGINT so both engines agree
    // bit-for-bit — the float log-odds variant is the same plan with
    // ln, traded away here for hash-exactness). Scoring the
    // HOLDOUT split (odd doc_ids) is a dictionary left-join + one
    // doc-grain sum: linear in corpus tokens, the same zipf-skewed
    // token join shape as text_unigram_score (AQE skew-join territory;
    // map-side-combined aggregates on both sides; at 100 TB the weight
    // dictionary is the broadcast side or becomes the fastText hashing
    // trick over fixed buckets). Unseen tokens score 0 (the centered
    // prior). `correct` lands in the hash-checked output, so holdout
    // agreement with the teacher is pinned, not sampled.
    OpQuery.checked(
      "text_quality_learned",
      s"""$learnedHoldoutSql
        |SELECT doc_id, n_tokens, score, label,
        |       CAST(score > 0 AS BIGINT) AS predicted,
        |       CAST((score > 0) = (label = 1) AS BIGINT) AS correct
        |FROM h""".stripMargin
    ) { (spark, dir) =>
      learnedHoldout(spark, dir)
        .select(col("doc_id"), col("n_tokens"), col("score"), col("label"),
          when(col("score") > 0, 1L).otherwise(0L).as("predicted"),
          when((col("score") > 0) === (col("label") === 1), 1L).otherwise(0L).as("correct"))
    },

    // ── eval_score_auc: EXACT ROC-AUC of the learned quality score on
    // its holdout — the threshold-free eval the accuracy column of
    // text_quality_learned cannot give (AUC says whether the SCORE
    // ORDERS positives above negatives at every operating point). The
    // whole statistic is integer arithmetic via the Mann–Whitney
    // identity AUC = U/(n⁺·n⁻) with tie midranks: at the distinct-score
    // grain, 2U = Σ_s n⁺_s · (2·cumNeg(<s) + n⁻_s) — a BIGINT both
    // engines agree on — and the one double division happens at the
    // edge. The cumulative negative count comes from
    // GlobalRank.withPrefixSum over the score grain (the agg_ks_test
    // shape: range-partitioned running totals, never a partition-less
    // window), so the eval itself is 100 TB-shaped even though scores
    // here are holdout-sized.
    OpQuery.checked(
      "eval_score_auc",
      s"""$learnedHoldoutSql,
        |g AS (
        |  SELECT score,
        |         CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |         CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nn
        |  FROM h GROUP BY score),
        |c AS (
        |  SELECT np, nn,
        |         CAST(coalesce(sum(nn) OVER (ORDER BY score
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cneg
        |  FROM g)
        |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
        |       CAST(sum(nn) AS BIGINT) AS n_neg,
        |       CAST(sum(np * (2 * cneg + nn)) AS BIGINT) AS u2,
        |       CAST(sum(np * (2 * cneg + nn)) AS DOUBLE)
        |         / CAST(2 * sum(np) * sum(nn) AS DOUBLE) AS auc
        |FROM c""".stripMargin
    ) { (spark, dir) =>
      val g = learnedHoldout(spark, dir).groupBy("score")
        .agg(
          sum(when(col("label") === 1, 1L).otherwise(0L)).as("np"),
          sum(when(col("label") === 0, 1L).otherwise(0L)).as("nn"))
      graft.algo.GlobalRank
        .withPrefixSum(g, Seq(col("score").asc), col("nn"), "cneg")
        .agg(
          sum(col("np")).as("n_pos"),
          sum(col("nn")).as("n_neg"),
          sum(col("np") * (lit(2) * col("cneg") + col("nn"))).as("u2"))
        .select(col("n_pos"), col("n_neg"), col("u2"),
          (col("u2").cast("double")
            / (lit(2) * col("n_pos") * col("n_neg")).cast("double")).as("auc"))
    },

    // ── eval_calibration_bins: calibration of the learned quality score
    // — bin the holdout into global score DECILES and compare each
    // bin's observed positive rate to its mean score (a well-calibrated
    // ranker is monotone here; the reliability-diagram table). The
    // decile is the window-free GlobalRank + ntileOfRank pair — the
    // q4_customer_rfm machinery, bit-identical to the SQL ntile — and
    // every metric is integer sums with one edge division per column.
    OpQuery.checked(
      "eval_calibration_bins",
      s"""$learnedHoldoutSql,
        |r AS (
        |  SELECT label, score,
        |         CAST(ntile(10) OVER (ORDER BY score, doc_id) AS BIGINT) AS decile
        |  FROM h)
        |SELECT decile,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(label) AS BIGINT) AS n_pos,
        |       CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pos_rate,
        |       CAST(sum(score) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_score
        |FROM r GROUP BY decile""".stripMargin
    ) { (spark, dir) =>
      graft.algo.GlobalRank
        .withRowNumber(learnedHoldout(spark, dir),
          Seq(col("score").asc, col("doc_id").asc), "rnk", "n_all")
        .select(col("label"), col("score"),
          graft.algo.GlobalRank.ntileOfRank(col("rnk"), col("n_all"), 10).as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), sum(col("label")).as("n_pos"), sum(col("score")).as("s"))
        .select(col("decile"), col("n"), col("n_pos"),
          (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"),
          (col("s").cast("double") / col("n").cast("double")).as("mean_score"))
    },

    // ── text_bpe_tokenize: REAL subword token counting — a deterministic
    // byte-pair-encoding tokenizer (Sennrich et al. 2016) trained on the
    // corpus's own word-frequency vocabulary, where every other token
    // count in this library (text_tokens, text_seqlen_pack,
    // text_mixture_weights) is a whitespace proxy. Three-tier scale
    // shape: (1) TRAIN on the bounded top-V vocabulary — a distributed
    // top-V by (count, token) via TakeOrdered, then the merge-table
    // learner runs driver-side on those 2048 rows (the k-means-sample
    // pattern: work is V·|word|·merges, independent of corpus size).
    // The persisted dictionary is KEYED by a corpus fingerprint
    // (total text length — content-sensitive where the doc COUNT is
    // not: sf0.001 and sf0.01 both hold 500 docs) as a hive partition,
    // and the oracle selects ITS corpus's partition via the same
    // count — so a later run against another scale (a bench at sf0.1,
    // a smoke test at sf0.001) can never clobber the dictionary the
    // pending compare depends on;
    // (2) ENCODE each DISTINCT token exactly once, executor-side over
    // the vocabulary grain with the broadcast merge ranks (imperative
    // per-token loop ⇒ mapPartitions is the honest tier, the multimodal
    // extractor precedent); (3) the corpus only ever sees the
    // token→n_pieces DICTIONARY JOIN (the text_unigram_score zipf
    // shape) and a doc-grain sum. No SQL engine can replay BPE
    // TRAINING — but it doesn't have to: the trained (token, n_pieces)
    // dictionary is persisted to parquet (the LibraryOracleOps
    // mechanism) and both engines read the SAME dictionary bytes, so
    // the corpus-side join + doc-grain arithmetic is fully
    // rows+schema+hash-checked; BpeSpec pins the training algorithm
    // itself (reference merge order, round-trip identity, rank-greedy
    // inference, unseen-pair behavior).
    OpQuery.checked(
      "text_bpe_tokenize",
      s"""WITH t AS (
        |  SELECT doc_id, unnest(str_split_regex(trim(lower(text)), '\\s+')) AS tok
        |  FROM documents),
        |p AS (SELECT tok, n_pieces
        |      FROM read_parquet('$BpeDictDir/corpus_fp=*/*.parquet', hive_partitioning=1)
        |      WHERE corpus_fp = (SELECT sum(length(text) * (1 + doc_id % 97)) FROM documents))
        |SELECT t.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(p.n_pieces) AS BIGINT) AS n_bpe_tokens,
        |       CAST(sum(length(t.tok)) AS DOUBLE) / CAST(sum(p.n_pieces) AS DOUBLE)
        |         AS chars_per_token
        |FROM t JOIN p USING (tok)
        |GROUP BY t.doc_id""".stripMargin
    ) { (spark, dir) =>
      import spark.implicits._
      val toks = Tables(spark, dir).documents
        .select(col("doc_id"),
          explode(expr("split(trim(lower(text)), '\\\\s+')")).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val top = vocab.orderBy(col("cnt").desc, col("tok").asc).limit(BpeVocabCap)
        .as[(String, Long)].collect() // bounded: top-V vocabulary only
      // merge budget: real corpora train 32k+; this synthetic corpus has
      // a ~31-word vocabulary that ~100 merges would memorize outright
      // (every word one piece), so 24 keeps actual subword structure in
      // the output — frequent words collapse, rare ones stay split
      val ranks = graft.functions.Bpe.train(top.toSeq, BpeMerges).zipWithIndex.toMap
      val bRanks = spark.sparkContext.broadcast(ranks)
      // the dictionary is vocabulary-grain (tiny) and a pure function of
      // the corpus: persist it so the DuckDB oracle replays the corpus
      // arithmetic against the identical dictionary bytes; re-read so the
      // Spark side consumes the same files the oracle will. The write
      // lands in THIS corpus's fingerprint partition — Σ length(text) ×
      // (1 + doc_id mod 97), mirrored by the oracle's corpus_fp
      // subquery: the doc-id mix makes a stale-reuse collision need
      // matching per-document length PROFILES, not just a matching
      // total (Σ length alone got weaker once the _SUCCESS gate started
      // SKIPPING re-writes; the plain doc count would not even
      // distinguish sf0.001 from sf0.01). Runs against other corpora
      // land in their own partition, so a pending compare at this
      // scale stays consistent.
      val corpusFp = Tables(spark, dir).documents
        .agg(sum(length(col("text")) * (lit(1L) + pmod(col("doc_id"), lit(97L)))))
        .head().getLong(0)
      val pieces = PipelineOps.synchronized {
        val part = s"$BpeDictDir/corpus_fp=$corpusFp"
        // byte-deterministic + fingerprint-keyed ⇒ skip the re-write
        // when this corpus's partition already completed (_SUCCESS)
        if (!graft.Artifacts.ready(spark, part))
          vocab.select("tok").as[String]
            .mapPartitions { it =>
              val r = bRanks.value
              it.map(t => (t, graft.functions.Bpe.encode(t, r).length.toLong))
            }.toDF("tok", "n_pieces")
            .coalesce(1).write.mode("overwrite").parquet(part)
        spark.read.parquet(part)
      }
      toks.join(pieces, Seq("tok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_bpe_tokens"),
          sum(length(col("tok")).cast("long")).as("n_word_chars"))
        .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
          (col("n_word_chars").cast("double") / col("n_bpe_tokens").cast("double"))
            .as("chars_per_token"))
    },

    // ── text_lm_surprisal: n-gram LM quality gating — the CCNet-style
    // "perplexity bucket" filter (Wenzek et al. 2020) production
    // pipelines run between the heuristic gates and the learned
    // classifier: score each document by how surprising its token
    // stream is under a corpus-trained bigram LM with stupid backoff
    // (Brants et al. 2007 — score, don't smooth: seen bigrams score by
    // count ratio, unseen ones back off to the target unigram with a
    // fixed penalty). Engine-exactness trick: the log-probs that make
    // real perplexity non-portable (libm log last-bit drift, order-
    // dependent double sums) become INTEGER surprisal bits —
    // ilog2(x) = length(bin(x)) − 1, exact in both engines — so
    // per-bigram bits are BIGINTs, the doc score is a BIGINT sum, and
    // the only double is one final division. Train/score split on
    // doc_id parity (the text_quality_learned pattern) keeps the
    // backoff branch genuinely exercised — an LM trained on its own
    // scoring set never meets an unseen bigram.
    //
    // Scale shape: two map-side-combined count aggregates at token /
    // bigram grain (zipf-skewed ⇒ AQE skew territory, arriving
    // pre-reduced); the scored side pre-aggregates to (doc, bigram,
    // occurrences) before the dictionary joins, and every join is 1:1
    // per distinct key — no fan-out; the only broadcast is the 1-row
    // token total.
    OpQuery.checked(
      "text_lm_surprisal",
      """WITH t AS (
        |  SELECT doc_id, str_split_regex(trim(lower(text)), '\s+') AS ws FROM documents),
        |bgs AS (
        |  SELECT doc_id,
        |         split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2
        |  FROM (SELECT doc_id,
        |               unnest(list_transform(range(1, len(ws)),
        |                 i -> ws[i] || ' ' || ws[i+1])) AS b
        |        FROM t)),
        |c1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1
        |       FROM (SELECT unnest(ws) AS tok FROM t WHERE doc_id % 2 = 0) GROUP BY tok),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n_total FROM c1),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        |       FROM bgs WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |sb AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS m
        |       FROM bgs WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
        |j AS (
        |  SELECT sb.doc_id, sb.m, c2.c2, a.c1 AS c1w1, b.c1 AS c1w2, tot.n_total
        |  FROM sb LEFT JOIN c2 USING (w1, w2)
        |          LEFT JOIN c1 a ON a.tok = sb.w1
        |          LEFT JOIN c1 b ON b.tok = sb.w2
        |          CROSS JOIN tot),
        |sc AS (
        |  SELECT doc_id, m, c2,
        |         CASE WHEN c2 IS NOT NULL
        |                THEN (length(bin(c1w1)) - 1) - (length(bin(c2)) - 1)
        |              WHEN c1w2 IS NOT NULL
        |                THEN (length(bin(n_total)) - 1) - (length(bin(c1w2)) - 1) + 1
        |              ELSE (length(bin(n_total)) - 1) + 2 END AS bits
        |  FROM j)
        |SELECT doc_id,
        |       CAST(sum(m) AS BIGINT) AS n_bigrams,
        |       CAST(sum(CASE WHEN c2 IS NULL THEN m ELSE 0 END) AS BIGINT) AS n_unseen,
        |       CAST(sum(bits * m) AS BIGINT) AS surprisal_bits,
        |       CAST(sum(bits * m) AS DOUBLE) / CAST(sum(m) AS DOUBLE) AS bits_per_bigram
        |FROM sc GROUP BY doc_id""".stripMargin
    ) { (spark, dir) =>
      import graft.Norm.ilog2
      val toks = Tables(spark, dir).documents
        .select(col("doc_id"), expr("split(trim(lower(text)), '\\\\s+')").as("ws"))
      // size >= 2 guard: Spark's sequence(1, 0) DESCENDS instead of
      // returning empty, so a 1-token doc must be filtered before the
      // transform (DuckDB's range(1, 1) is empty and needs no guard)
      val bigrams = toks.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c1 = toks.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(explode(col("ws")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c1"))
      val tot = c1.agg(sum("c1").as("n_total"))
      val c2 = bigrams.filter(pmod(col("doc_id"), lit(2)) === 0)
        .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val sb = bigrams.filter(pmod(col("doc_id"), lit(2)) === 1)
        .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
      val joined = sb
        .join(c2, Seq("w1", "w2"), "left_outer")
        .join(c1.toDF("w1", "c1w1"), Seq("w1"), "left_outer")
        .join(c1.toDF("w2", "c1w2"), Seq("w2"), "left_outer")
        .crossJoin(broadcast(tot))
      val bits = when(col("c2").isNotNull, ilog2(col("c1w1")) - ilog2(col("c2")))
        .when(col("c1w2").isNotNull, ilog2(col("n_total")) - ilog2(col("c1w2")) + 1)
        .otherwise(ilog2(col("n_total")) + 2)
      joined.groupBy("doc_id")
        .agg(sum(col("m")).as("n_bigrams"),
          sum(when(col("c2").isNull, col("m")).otherwise(0L)).as("n_unseen"),
          sum(bits * col("m")).as("surprisal_bits"))
        .withColumn("bits_per_bigram",
          col("surprisal_bits").cast("double") / col("n_bigrams").cast("double"))
    },

    // ── text_contamination_bloom: benchmark decontamination with a native
    // Bloom prefilter (graft.functions.BloomFilter) in front of the exact
    // verify join. Same semantics as text_contamination's 8-gram
    // containment, different physical strategy: the benchmark's distinct
    // gram set (bounded by suite size, not corpus size) aggregates into
    // one 128 KiB bitset via a mergeable TypedImperativeAggregate, the
    // driver ships it back as a literal, and the corpus side probes it
    // INSIDE whole-stage codegen before any exchange — so the shuffle
    // carries only candidate grams (exact matches + the sized FP rate),
    // not the corpus. Bloom FPs never reach the output: survivors still
    // exact-join the bench gram set, which is why the result is
    // engine-neutral and the oracle is plain containment SQL. The one
    // collect is the bitset itself — fixed 128 KiB at any corpus scale.
    OpQuery.checked(
      "text_contamination_bloom",
      """WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, md5(gr) AS gh FROM (
        |    SELECT doc_id,
        |           unnest(list_distinct(list_transform(
        |             range(1, greatest(len(ws) - 7, 1) + 1),
        |             i -> array_to_string(ws[CAST(i AS INT):CAST(i AS INT) + 7], ' ')))) AS gr
        |    FROM w)),
        |bench AS (SELECT DISTINCT gh FROM g
        |          WHERE (doc_id % 2147483648) * 2654435761 % 100 < 5),
        |train AS (SELECT doc_id, gh FROM g
        |          WHERE (doc_id % 2147483648) * 2654435761 % 100 >= 5)
        |SELECT t.doc_id,
        |       CAST(count(DISTINCT t.gh) AS BIGINT) AS n_shared_grams
        |FROM train t JOIN bench b USING (gh)
        |GROUP BY t.doc_id""".stripMargin
    ) { (spark, dir) =>
      graft.functions.BloomFilter.register(spark)
      val grams = Tables(spark, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(1, greatest(size(ws) - 7, 1)), i -> concat_ws(' ', slice(ws, i, 8))))"
        )).as("gr"))
        .select(col("doc_id"), md5(col("gr")).as("gh"))
      // NOT persisted (r18, measured +0.2 s): a cache boundary here
      // forces the distinct to fully materialize inside the eager bloom
      // head(), where the unpersisted form lets the bloom aggregate
      // fold over the distinct's partials — and the verify join's
      // re-derivation runs concurrently with the train-side scan anyway
      // (the score_rfm_threshold lesson: caching a cheap parallel
      // branch serializes more than it saves).
      val benchGh = grams.filter(Norm.hashBucket(col("doc_id"), 100) < 5)
        .select("gh").distinct()
      val bloom = benchGh
        .agg(expr("bloom_build(gh, 1048576, 5)").as("bf"))
        .head().getAs[Array[Byte]](0)
      grams.filter(Norm.hashBucket(col("doc_id"), 100) >= 5)
        .filter(call_function("bloom_contains", lit(bloom), col("gh"), lit(5)))
        .join(benchGh, "gh")
        .groupBy("doc_id")
        .agg(countDistinct("gh").as("n_shared_grams"))
    },

    // ── io_zorder_layout: Morton-curve (Z-order) clustering — the
    // multi-column generalization of io_sorted_layout. Both filter dims
    // scale to rank-space bytes (min/max bounds: one tiny agg here;
    // table statistics at 100 TB), interleave via the codegen'd
    // bit_interleave expression, and one range shuffle on the curve
    // position writes files whose zone maps are narrow in BOTH
    // l_shipdate and l_suppkey — so either dimension's predicates skip
    // row groups, where a single-key sort serves only its leading
    // column (the file-pruning advantage is asserted in ZOrderSpec).
    // The query result is layout-independent; the oracle checks the
    // two-sided box predicate losslessly.
    OpQuery.checked(
      "io_zorder_layout",
      """SELECT l_returnflag,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_suppkey BETWEEN 5 AND 8
        |  AND l_shipdate >= DATE '1995-06-01' AND l_shipdate < DATE '1995-09-01'
        |GROUP BY 1""".stripMargin
    ) { (spark, dir) =>
      graft.functions.ZOrder.register(spark)
      val path = CoreOps.scratch(dir, "zorder_layout")
      // the clustered layout is an INGEST-time artifact (a production
      // table is z-ordered once, then queried many times) — skip the
      // rewrite when a committed layout for this corpus already exists,
      // the coGraph/BPE artifact discipline; the checked RESULT is
      // layout-independent either way, and ZOrderSpec keeps asserting
      // the pruning property on the written files
      if (!graft.Artifacts.ready(spark, path)) {
        val src = Tables(spark, dir).lineitem
          .select("l_shipdate", "l_suppkey", "l_returnflag", "l_extendedprice")
          .withColumn("day", datediff(col("l_shipdate"), lit("1992-01-01").cast("date")).cast("long"))
          .withColumn("supp", col("l_suppkey").cast("long"))
        val b = src.agg(min("day"), max("day"), min("supp"), max("supp")).head()
        def scaled(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
          if (hi > lo) floor(((c - lit(lo)) * 255) / lit(hi - lo)).cast("long") else lit(0L)
        src
          .withColumn("z", call_function("bit_interleave",
            scaled(col("day"), b.getLong(0), b.getLong(1)),
            scaled(col("supp"), b.getLong(2), b.getLong(3))))
          .repartitionByRange(16, col("z"))
          .sortWithinPartitions("z")
          .write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
        .filter(col("l_suppkey").between(5, 8)
          && col("l_shipdate") >= lit("1995-06-01").cast("date")
          && col("l_shipdate") < lit("1995-09-01").cast("date"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), Norm.dsum(col("l_extendedprice")).as("revenue"))
    },

    // ── io_nested_prune: nested-schema pruning — events re-laid-out as
    // structs (meta{user_id, event_type} / payload{props, value}), then
    // a query touching two leaves. The scan must read ONLY those leaf
    // columns (`ReadSchema` carries the pruned struct — asserted in
    // PipelineOpsSpec): at 100 TB the difference between reading
    // payload.value and deserializing the whole payload struct (with
    // its heavy props string) is the scan cost itself. Columnar formats
    // store each leaf separately; pruning is free — IF the plan asks
    // for leaves, which flattening-then-projecting does not.
    OpQuery.checked(
      "io_nested_prune",
      """SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY event_type""".stripMargin
    ) { (spark, dir) =>
      val path = CoreOps.scratch(dir, "nested_prune")
      Tables(spark, dir).events
        .select(
          col("event_id"), col("ts"),
          struct(col("user_id"), col("event_type")).as("meta"),
          struct(col("props"), col("value")).as("payload"))
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
        .groupBy(col("meta.event_type").as("event_type"))
        .agg(count(lit(1)).as("n"), Norm.dsum(col("payload.value")).as("total_value"))
    },

    // ── dedup_incremental: dedup an ARRIVING batch against the corpus
    // already ingested — the production shape, where re-scanning 100 TB
    // per delivery is off the table. The historical side reduces to its
    // narrow content-hash index (one md5 column — at scale this is the
    // pre-built, bucketed index the ingest job maintains); the batch
    // left-anti joins it, then collapses its own internal duplicates
    // with the same skew-immune struct-min aggregation as
    // dedup_source_priority. Corpus split = deterministic doc-id hash
    // (80% existing / 20% arriving).
    OpQuery.checked(
      "dedup_incremental",
      """WITH hashed AS (
        |  SELECT doc_id, lang, source, md5(text) AS h,
        |         (doc_id % 2147483648) * 2654435761 % 100 AS b
        |  FROM documents),
        |existing AS (SELECT DISTINCT h FROM hashed WHERE b < 80),
        |arriving AS (SELECT doc_id, lang, source, h FROM hashed WHERE b >= 80),
        |fresh AS (
        |  SELECT a.* FROM arriving a LEFT JOIN existing e USING (h)
        |  WHERE e.h IS NULL),
        |winners AS (
        |  SELECT h, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS batch_copies
        |  FROM fresh GROUP BY h)
        |SELECT w.doc_id, f.lang, f.source, w.h, w.batch_copies
        |FROM winners w JOIN fresh f ON f.doc_id = w.doc_id""".stripMargin
    ) { (spark, dir) =>
      val hashed = Tables(spark, dir).documents
        .select(col("doc_id"), col("lang"), col("source"), md5(col("text")).as("h"),
          graft.Norm.hashBucket(col("doc_id"), 100).as("b"))
      val existing = hashed.filter(col("b") < 80).select("h").distinct()
      val arriving = hashed.filter(col("b") >= 80).drop("b")
      arriving
        .join(existing, Seq("h"), "left_anti")
        .groupBy("h")
        .agg(
          // struct-min: doc_id leads, so lang/source come from the SAME
          // winning row — independent per-column mins would stitch a
          // chimera record out of different duplicates
          min(struct(col("doc_id"), col("lang"), col("source"))).as("w"),
          count(lit(1)).as("batch_copies"))
        .select(
          col("w.doc_id").as("doc_id"), col("w.lang").as("lang"),
          col("w.source").as("source"), col("h"), col("batch_copies"))
    },

    // ── dedup_containment: asymmetric near-dup detection — documents
    // mostly CONTAINED in another (quotes, partial mirrors, embedded
    // reposts), which symmetric Jaccard under-scores when sizes differ.
    // containment(A→B) = |shingles(A)∩shingles(B)| / |shingles(A)| over
    // the 8-word-gram inverted index, with the standard stop-shingle cut
    // (document frequency 2..20): df=1 grams can't pair, and high-df
    // boilerplate grams are exactly the hot keys that would explode the
    // self-join at 100 TB — dropping them bounds every gram's pair
    // fan-out by df², which the cap makes ≤400. One shuffle on gram
    // hash, one on the pair key; integer counts + one division keep it
    // engine-exact.
    OpQuery.checked(
      "dedup_containment",
      """WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, md5(gr) AS gh FROM (
        |    SELECT doc_id, unnest(list_distinct(list_transform(
        |      range(1, greatest(len(ws) - 7, 1) + 1),
        |      i -> array_to_string(ws[CAST(i AS INT):CAST(i AS INT) + 7], ' ')))) AS gr
        |    FROM w)),
        |df AS (SELECT gh, count(*) AS c FROM g GROUP BY gh),
        |keep AS (SELECT g.doc_id, g.gh FROM g JOIN df USING (gh) WHERE df.c BETWEEN 2 AND 20),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS a_grams FROM g GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(count(*) AS BIGINT) AS shared
        |          FROM keep a JOIN keep b USING (gh)
        |          WHERE a.doc_id <> b.doc_id GROUP BY 1, 2)
        |SELECT p.a_id, p.b_id, p.shared, s.a_grams,
        |       p.shared / s.a_grams AS containment
        |FROM pairs p JOIN sizes s ON s.doc_id = p.a_id
        |WHERE p.shared / s.a_grams >= 0.8""".stripMargin
    ) { (spark, dir) =>
      val grams = Tables(spark, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(1, greatest(size(ws) - 7, 1)), i -> concat_ws(' ', slice(ws, i, 8))))"
        )).as("gr"))
        .select(col("doc_id"), md5(col("gr")).as("gh"))
        .distinct()
      val df = grams.groupBy("gh").agg(count(lit(1)).as("c"))
      val keep = grams.join(df.filter(col("c").between(2, 20)), "gh")
      // denominator = the doc's FULL distinct gram count: the df cut only
      // bounds the pair join, it must not shrink |A| (else a doc whose
      // unique grams were all df=1 would look fully contained everywhere)
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("a_grams"))
      val pairs = keep.select(col("gh"), col("doc_id").as("a_id"))
        .join(keep.select(col("gh"), col("doc_id").as("b_id")), "gh")
        .filter(col("a_id") =!= col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("shared"))
      pairs
        .join(sizes.withColumnRenamed("doc_id", "a_id"), "a_id")
        .withColumn("containment", col("shared") / col("a_grams"))
        .filter(col("containment") >= 0.8)
        .select("a_id", "b_id", "shared", "a_grams", "containment")
    },

    // ── text_mixture_weights: training-mixture reweighting — per-language
    // token shares vs a uniform target, and the sampling weight that
    // rebalances the corpus to it (the data-mixing step of pretraining
    // corpus assembly; cf. the sampling-proportion tables of the public
    // LLM reports). One map-side-combined rollup to language grain, then
    // arithmetic on a handful of rows — the weights table is dims-sized
    // at any corpus scale and broadcasts to the sampler for free.
    // Divisions chain int/int → double in the same order both engines,
    // so the doubles match bit-for-bit.
    OpQuery.checked(
      "text_mixture_weights",
      """WITH stats AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT)) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang),
        |tot AS (
        |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |         CAST(count(*) AS BIGINT) AS n_langs
        |  FROM stats)
        |SELECT s.lang, s.n_docs, s.n_tokens,
        |       s.n_tokens / t.total_tokens AS actual_share,
        |       (t.total_tokens / t.n_langs) / s.n_tokens AS sample_weight
        |FROM stats s CROSS JOIN tot t""".stripMargin
    ) { (spark, dir) =>
      val stats = Tables(spark, dir).documents
        .select(col("lang"),
          expr("CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)").as("tok"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
      val tot = stats.agg(
        sum("n_tokens").as("total_tokens"), count(lit(1)).as("n_langs"))
      stats.crossJoin(tot).select(
        col("lang"), col("n_docs"), col("n_tokens"),
        (col("n_tokens") / col("total_tokens")).as("actual_share"),
        ((col("total_tokens") / col("n_langs")) / col("n_tokens")).as("sample_weight"))
    },

    // ── text_boilerplate_strip: cross-document boilerplate removal (the
    // RefinedWeb/CCNet line-dedup step, block-granular): tile each doc
    // into non-overlapping 8-word blocks, count each block's document
    // frequency, and strip blocks appearing verbatim in ≥2 documents —
    // headers, footers, navigation chrome at web scale. Emits per doc
    // the block count, stripped count, and surviving token budget.
    //
    // Scale shape: linear, not pairwise — the df aggregate has map-side
    // partials, and the index join back is 1:1 per block occurrence (a
    // block shared by a million docs joins each occurrence to ONE df
    // row — no fan-out), so unlike pair-building dedups this needs no
    // blocking cap. Two shuffles (block hash, doc_id), both on natural
    // grains; only (doc_id, 16-byte hash) rides them.
    OpQuery.checked(
      "text_boilerplate_strip",
      """WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
        |b AS (
        |  SELECT doc_id, md5(gr) AS bh FROM (
        |    SELECT doc_id,
        |           unnest(list_transform(list_filter(list_transform(range(1, len(ws)+1, 8),
        |             i -> ws[CAST(i AS INT):CAST(i AS INT)+7]),
        |             x -> len(x) = 8), x -> array_to_string(x, ' '))) AS gr
        |    FROM w)),
        |f AS (SELECT bh, count(DISTINCT doc_id) AS df FROM b GROUP BY bh)
        |SELECT b.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_blocks,
        |       CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |       CAST((count(*) - sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END)) * 8 AS BIGINT) AS clean_tokens
        |FROM b JOIN f USING (bh)
        |GROUP BY b.doc_id""".stripMargin
    ) { (spark, dir) =>
      val blocks = Tables(spark, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          "transform(filter(transform(sequence(1, size(ws), 8), i -> slice(ws, i, 8)), b -> size(b) = 8), b -> concat_ws(' ', b))"
        )).as("gr"))
        .select(col("doc_id"), md5(col("gr")).as("bh"))
      val dfreq = blocks.groupBy("bh").agg(countDistinct("doc_id").as("df"))
      blocks.join(dfreq, "bh")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_blocks"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_boiler"),
          ((count(lit(1)) - sum(when(col("df") >= 2, 1L).otherwise(0L))) * 8).as("clean_tokens"))
    },

    // ── text_dedup_substring: EXACT substring-span dedup — the
    // strongest training-data dedup (Lee et al. 2022, "Deduplicating
    // Training Data Makes Language Models Better": remove repeated
    // sequences ≥ threshold chars wherever they recur). Their suffix
    // array is single-machine; the distributed re-expression anchors
    // every 50-char shingle by md5, counts global occurrences with
    // map-side partials, and merges each doc's duplicated anchor
    // positions into MAXIMAL spans with the islands trick (consecutive
    // positions share p − row_number) — a run of k consecutive
    // duplicated shingles IS a duplicated span of k+49 chars, emitted
    // once at its full extent. Output: one row per maximal span ≥ 50
    // chars, the span list a cleaning pass would cut.
    //
    // Scale shape: linear in corpus BYTES (shingle fan-out = n−49 rows
    // per doc, no pairs anywhere); two shuffles — gram hash (8-byte
    // xxhash64 + count, zipf-skewed ⇒ AQE skew-join territory, but the
    // count aggregate is map-side-combined so hot grams arrive
    // pre-reduced) and doc_id for the per-doc islands window (bounded
    // by doc length). The 1:1 count join back has no fan-out — a gram
    // shared by a million docs joins each occurrence to ONE count row.
    // Spans are BYTE offsets and the Spark shingles slice the BINARY
    // payload: byte slicing is O(1) where UTF-8 char substring is
    // O(position) — a quadratic-per-document scan cost at shingle
    // fan-out (the switch plus the gram cache took the op 12.7 s →
    // 2.5 s at sf0.1). Lee et al. dedup byte/token streams, not chars,
    // so the byte grain is the honest semantics. DuckDB cannot slice
    // BLOBs, so the oracle shingles chars — equivalent on this corpus
    // (pure ASCII, asserted by the spec, so char md5 = byte md5 and
    // char offsets = byte offsets).
    OpQuery.checked(
      "text_dedup_substring",
      """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) >= 50),
        |sh AS (SELECT doc_id, unnest(range(1, n - 48)) AS p FROM t),
        |g AS (SELECT s.doc_id, s.p, md5(substr(t.text, CAST(s.p AS INT), 50)) AS h
        |      FROM sh s JOIN t ON t.doc_id = s.doc_id),
        |cnt AS (SELECT h, count(*) AS c FROM g GROUP BY 1),
        |dup AS (SELECT g.doc_id, g.p FROM g JOIN cnt ON cnt.h = g.h WHERE cnt.c >= 2),
        |runs AS (SELECT doc_id, p,
        |                p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        |         FROM dup),
        |spans AS (SELECT doc_id, min(p) AS s0, max(p) + 49 AS e0 FROM runs GROUP BY doc_id, grp)
        |SELECT doc_id, CAST(s0 AS BIGINT) AS span_start,
        |       CAST(e0 - s0 + 1 AS BIGINT) AS span_len
        |FROM spans""".stripMargin
    ) { (spark, dir) =>
      val t = Tables(spark, dir).documents
        .select(col("doc_id"), col("text").cast("binary").as("bt"))
        .withColumn("n", octet_length(col("bt")))
        .filter(col("n") >= 50)
      // anchor hash: xxhash64 (codegen'd, 8-byte key) — the oracle uses
      // md5 but only the DUPLICATE SET must agree, and both hashes
      // detect the same recurring grams (a 64-bit collision on this
      // corpus is astronomically unlikely and deterministic if ever hit)
      // position fan-out in two bounded explodes: a single
      // sequence(1, n-49) materializes an O(doc-length) int array per row
      // BEFORE exploding — a per-row memory spike on long documents. The
      // chunk/offset nesting caps every materialized array at
      // max(n/4096, 4096) elements regardless of doc length, and the
      // generated positions are identical.
      val chunk = 4096
      val g = t
        .select(col("doc_id"), col("bt"), col("n"),
          explode(expr(s"sequence(0, (n - 50) div $chunk)")).as("ci"))
        .select(col("doc_id"), col("bt"),
          explode(expr(
            s"sequence(ci * $chunk + 1, least((ci + 1) * $chunk, n - 49))")).as("p"))
        .select(col("doc_id"), col("p"), xxhash64(expr("substring(bt, p, 50)")).as("h"))
        // (doc_id, p, h) = 24 bytes/gram, consumed twice (count + join):
        // persisting beats re-running the shingle scan. MEMORY_AND_DISK,
        // not DISK_ONLY (the r12 v2 lesson): the frame is
        // corpus-proportional (~24 B per corpus character), and under
        // storage pressure MEMORY_AND_DISK degrades to exactly
        // DISK_ONLY's behavior — while DISK_ONLY forces the disk
        // round-trip even when the frame fits, which is pure tax at
        // every scale where memory is provisioned for the working set
        .persist(StorageLevel.MEMORY_AND_DISK)
      val cnt = g.groupBy("h").agg(count(lit(1)).as("c"))
      val dup = g.join(cnt.filter(col("c") >= 2), Seq("h")).select("doc_id", "p")
      dup
        .withColumn("grp", col("p") - row_number().over(
          Window.partitionBy("doc_id").orderBy("p")))
        .groupBy("doc_id", "grp")
        .agg(min(col("p")).as("s0"), (max(col("p")) + 49).as("e0"))
        .select(col("doc_id"), col("s0").cast("long").as("span_start"),
          (col("e0") - col("s0") + 1).cast("long").as("span_len"))
    },

    // ── text_dedup_substring_incr: substring-span dedup for an ARRIVING
    // batch — the dedup_incremental pattern applied to the Lee-et-al
    // span dedup, because re-shingling 100 TB of already-ingested corpus
    // per delivery is off the table. The historical side reduces to its
    // gram-hash INDEX (distinct 8-byte anchors — at scale the pre-built,
    // bucketed index the ingest job maintains and appends to); only the
    // BATCH is shingled. A batch position is duplicated iff its gram
    // hits the index OR recurs within the batch itself — exactly the
    // full-corpus count ≥ 2 predicate restricted to batch docs
    // (hist ≥ 1 ⇒ total ≥ 2; else total = batch count), an equivalence
    // PipelineOpsSpec replays structurally. Shuffle story: the index
    // semi-join and the batch count join are both on the gram-hash key,
    // batch-proportional, never corpus-proportional; the islands window
    // stays bounded by doc length. Corpus split = deterministic doc-id
    // hash (80% ingested / 20% arriving), as dedup_incremental.
    OpQuery.checked(
      "text_dedup_substring_incr",
      """WITH t AS (SELECT doc_id, text, length(text) AS n,
        |                  (doc_id % 2147483648) * 2654435761 % 100 AS b
        |           FROM documents WHERE length(text) >= 50),
        |sh AS (SELECT doc_id, b, unnest(range(1, n - 48)) AS p FROM t),
        |g AS (SELECT s.doc_id, s.b, s.p, md5(substr(t.text, CAST(s.p AS INT), 50)) AS h
        |      FROM sh s JOIN t ON t.doc_id = s.doc_id),
        |hist AS (SELECT DISTINCT h FROM g WHERE b < 80),
        |bat AS (SELECT doc_id, p, h FROM g WHERE b >= 80),
        |bc AS (SELECT h, count(*) AS c FROM bat GROUP BY 1),
        |dup AS (SELECT bat.doc_id, bat.p FROM bat
        |        LEFT JOIN hist ON hist.h = bat.h
        |        JOIN bc ON bc.h = bat.h
        |        WHERE hist.h IS NOT NULL OR bc.c >= 2),
        |runs AS (SELECT doc_id, p,
        |                p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        |         FROM dup),
        |spans AS (SELECT doc_id, min(p) AS s0, max(p) + 49 AS e0 FROM runs GROUP BY doc_id, grp)
        |SELECT doc_id, CAST(s0 AS BIGINT) AS span_start,
        |       CAST(e0 - s0 + 1 AS BIGINT) AS span_len
        |FROM spans""".stripMargin
    ) { (spark, dir) =>
      val chunk = 4096
      val t = Tables(spark, dir).documents
        .select(col("doc_id"), col("text").cast("binary").as("bt"),
          Norm.hashBucket(col("doc_id"), 100).as("b"))
        .withColumn("n", octet_length(col("bt")))
        .filter(col("n") >= 50)
      // same bounded two-explode shingle scan as text_dedup_substring
      def grams(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), col("bt"), col("n"),
          explode(expr(s"sequence(0, (n - 50) div $chunk)")).as("ci"))
        .select(col("doc_id"), col("bt"),
          explode(expr(
            s"sequence(ci * $chunk + 1, least((ci + 1) * $chunk, n - 49))")).as("p"))
        .select(col("doc_id"), col("p"), xxhash64(expr("substring(bt, p, 50)")).as("h"))
      // the persisted historical index: distinct gram hashes only — 8
      // bytes per distinct gram, not 24 per occurrence, and at 100 TB it
      // is read, not rebuilt
      val hist = grams(t.filter(col("b") < 80)).select("h").distinct()
      // batch grams consumed twice (self-count + index probe):
      // MEMORY_AND_DISK, batch-proportional — the text_dedup_substring
      // storage story (degrades to disk under pressure, no forced
      // round-trip when the batch fits)
      val bat = grams(t.filter(col("b") >= 80)).persist(StorageLevel.MEMORY_AND_DISK)
      val bc = bat.groupBy("h").agg(count(lit(1)).as("c"))
      val dup = bat.join(bc, Seq("h"))
        .join(hist.withColumn("in_hist", lit(1)), Seq("h"), "left")
        .filter(col("in_hist").isNotNull || col("c") >= 2)
        .select("doc_id", "p")
      dup
        .withColumn("grp", col("p") - row_number().over(
          Window.partitionBy("doc_id").orderBy("p")))
        .groupBy("doc_id", "grp")
        .agg(min(col("p")).as("s0"), (max(col("p")) + 49).as("e0"))
        .select(col("doc_id"), col("s0").cast("long").as("span_start"),
          (col("e0") - col("s0") + 1).cast("long").as("span_len"))
    },

    // ── win_pattern_match: MATCH_RECOGNIZE-style sequence detection
    // through the reusable [[PatternMatch]] analog: per user, the event
    // stream collapses to an ordered symbol string (DEFINE = an explicit
    // classifier mapping view/click/purchase to v/c/p and EVERYTHING
    // else to 'x', so new event types can never alias into the funnel
    // alphabet) and the funnel PATTERN (V C* P) — view, any clicks,
    // purchase, strictly contiguous — counts via non-overlapping regex.
    // PatternMatch.count owns the scale shape (one user_id shuffle,
    // map-side partials, session-bounded keys by contract); a second
    // pattern over a different classifier is exercised in
    // PipelineOpsSpec.
    OpQuery.checked(
      "win_pattern_match",
      """WITH s AS (
        |  SELECT user_id,
        |         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |                    WHEN 'purchase' THEN 'p' ELSE 'x' END,
        |                    '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |       CAST(length(seq) AS BIGINT) AS seq_len,
        |       CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_funnels
        |FROM s""".stripMargin
    ) { (spark, dir) =>
      PatternMatch.count(
        Tables(spark, dir).events,
        key = "user_id", orderCols = Seq("ts", "event_id"),
        symbol = when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .otherwise("x"),
        pattern = "vc*p")
        .withColumnRenamed("n_matches", "n_funnels")
    },

    // ── win_pattern_abandon: the same PatternMatch engine under a second
    // DEFINE + PATTERN — a four-class alphabet (view/click/purchase/
    // other) and the interrupted-funnel shape (V C* O): a view and its
    // click run terminated by a non-purchase event. Together with
    // win_pattern_match this oracle-checks the analog's two moving parts
    // (classifier and pattern) independently.
    OpQuery.checked(
      "win_pattern_abandon",
      """WITH s AS (
        |  SELECT user_id,
        |         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |                    WHEN 'purchase' THEN 'p' ELSE 'o' END,
        |                    '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |       CAST(length(seq) AS BIGINT) AS seq_len,
        |       CAST(len(regexp_extract_all(seq, 'vc*o')) AS BIGINT) AS n_abandoned
        |FROM s""".stripMargin
    ) { (spark, dir) =>
      PatternMatch.count(
        Tables(spark, dir).events,
        key = "user_id", orderCols = Seq("ts", "event_id"),
        symbol = when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .otherwise("o"),
        pattern = "vc*o")
        .withColumnRenamed("n_matches", "n_abandoned")
    },

    // ── win_pattern_measures: MATCH_RECOGNIZE's ONE ROW PER MATCH +
    // MEASURES surface (the reference dialect's 12c analog) — funnels
    // usually need "which match, over which events", not just "how
    // many". Each non-overlapping V C* P match emits (user_id, match_no,
    // matched, match_len): match_number(), the concatenated classifier
    // trace, and the event count the match consumed. Same engine and
    // scale shape as win_pattern_match (PatternMatch.measures); the
    // oracle re-derives the per-match rows from the same regex via
    // DuckDB's zipped unnests.
    OpQuery.checked(
      "win_pattern_measures",
      """WITH s AS (
        |  SELECT user_id,
        |         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |                    WHEN 'purchase' THEN 'p' ELSE 'x' END,
        |                    '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id),
        |m AS (SELECT user_id, regexp_extract_all(seq, 'vc*p') AS ms FROM s)
        |SELECT user_id,
        |       CAST(match_no AS BIGINT) AS match_no,
        |       matched,
        |       CAST(length(matched) AS BIGINT) AS match_len
        |FROM (SELECT user_id,
        |             unnest(generate_series(1, len(ms))) AS match_no,
        |             unnest(ms) AS matched
        |      FROM m)""".stripMargin
    ) { (spark, dir) =>
      PatternMatch.measures(
        Tables(spark, dir).events,
        key = "user_id", orderCols = Seq("ts", "event_id"),
        symbol = when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .otherwise("x"),
        pattern = "vc*p")
    },

    // ── win_pattern_allrows: MATCH_RECOGNIZE's third output shape, ALL
    // ROWS PER MATCH — every event a V C* P match consumed comes back as
    // its own row tagged (match_no, seq_idx), which is what a funnel
    // drill-down actually joins on ("show me the events of user X's 2nd
    // conversion"). Match offsets are rebuilt from split() segment
    // lengths + two running sums (PatternMatch.allRows) — pure integer
    // arithmetic both engines evaluate identically, no per-row regex
    // state machine; the oracle re-derives the same offsets with zipped
    // unnests and the same two window sums (HUGEINT-cast).
    OpQuery.checked(
      "win_pattern_allrows",
      """WITH s AS (
        |  SELECT user_id,
        |         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |                    WHEN 'purchase' THEN 'p' ELSE 'x' END,
        |                    '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id),
        |m AS (SELECT user_id, regexp_extract_all(seq, 'vc*p') AS ms,
        |             str_split_regex(seq, 'vc*p') AS segs
        |      FROM s),
        |z AS (SELECT user_id,
        |             unnest(generate_series(1, len(ms))) AS match_no,
        |             unnest(ms) AS matched,
        |             unnest(segs[1:len(ms)]) AS seg
        |      FROM m),
        |o AS (SELECT user_id, match_no, matched,
        |             CAST(sum(length(seg)) OVER (PARTITION BY user_id ORDER BY match_no)
        |                  + COALESCE(sum(length(matched)) OVER (PARTITION BY user_id ORDER BY match_no
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |                  + 1 AS BIGINT) AS start_pos
        |      FROM z),
        |r AS (SELECT user_id, match_no,
        |             unnest(generate_series(start_pos, start_pos + length(matched) - 1)) AS seq_idx
        |      FROM o),
        |ev AS (SELECT user_id, event_id, event_type,
        |              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq_idx
        |       FROM events)
        |SELECT r.user_id, CAST(r.match_no AS BIGINT) AS match_no,
        |       CAST(r.seq_idx AS BIGINT) AS seq_idx, ev.event_id, ev.event_type
        |FROM r JOIN ev ON ev.user_id = r.user_id AND ev.seq_idx = r.seq_idx""".stripMargin
    ) { (spark, dir) =>
      PatternMatch.allRows(
        Tables(spark, dir).events,
        key = "user_id", orderCols = Seq("ts", "event_id"),
        symbol = when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .otherwise("x"),
        pattern = "vc*p")
        .select(col("user_id"), col("match_no"), col("seq_idx"),
          col("event_id"), col("event_type"))
    },

    // ── fn_json_shred: parse-once JSON shredding — semi-structured props
    // parse with an explicit schema (from_json, no sampling job) into a
    // typed struct column, land shredded in parquet, and every
    // downstream read touches the TYPED column: the re-read plan
    // contains no JSON parsing at all (spec-asserted). At 100 TB this
    // is the difference between parsing the JSON once at ingest and
    // re-parsing it in every query — and the shredded struct leaves
    // prune like any other column (io_nested_prune). The oracle
    // re-derives the same aggregates via DuckDB's JSON extraction.
    OpQuery.checked(
      "fn_json_shred",
      """SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events
        |GROUP BY event_type""".stripMargin
    ) { (spark, dir) =>
      val path = CoreOps.scratch(dir, "json_shred")
      Tables(spark, dir).events
        .select(col("event_id"), col("event_type"), col("user_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))).as("p"))
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("p.k")).as("sum_k"),
          min(col("p.k")).as("min_k"),
          max(col("p.k")).as("max_k"))
    },

    // ── agg_bitmap_distinct: exact distinct users per event type through
    // the native bitmap aggregate (graft.functions.BitmapDistinct) —
    // fixed-size partials merged by OR, vs COUNT(DISTINCT)'s shuffle of
    // every distinct value. The oracle is plain COUNT(DISTINCT): the
    // bitmap is exact on its dense domain, so the results are equal by
    // construction, making a native sketch oracle-checkable for once.
    OpQuery.checked(
      "agg_bitmap_distinct",
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM events
        |GROUP BY event_type""".stripMargin
    ) { (spark, dir) =>
      graft.functions.BitmapDistinct.register(spark)
      Tables(spark, dir).events
        .groupBy("event_type")
        .agg(
          expr("bitmap_distinct(user_id, 2097152)").as("n_users"),
          count(lit(1)).as("n_events"))
    },

    // ── sample_temporal_split: leakage-guarded temporal train/test split
    // — the split a time-series/recsys training pipeline must make, and
    // random sampling gets wrong: a user with events on both sides of
    // the cutoff leaks future behavior into training. Cutoff = first day
    // whose cumulative event count reaches 80% — computed on the DAY
    // grain (|days| rows after one map-side-combined count; the
    // cumulative window never sees raw events) and broadcast as a 1-row
    // frame. Then one user-grain aggregate classifies: all-before →
    // train, all-after → test, spanning → span_drop (the leakage guard:
    // such users are excluded, not truncated, so neither side sees a
    // partial history). Everything is counts and comparisons — BIGINT-
    // exact in both engines.
    OpQuery.checked(
      "sample_temporal_split",
      """WITH pd AS (
        |  SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1),
        |cum AS (
        |  SELECT d, sum(n) OVER (ORDER BY d) AS c,
        |         (SELECT sum(n) FROM pd) AS tot FROM pd),
        |cut AS (SELECT min(d) AS cutoff FROM cum WHERE c * 5 >= tot * 4),
        |u AS (
        |  SELECT user_id,
        |         sum(CASE WHEN CAST(ts AS DATE) <  (SELECT cutoff FROM cut)
        |                  THEN 1 ELSE 0 END) AS n_before,
        |         sum(CASE WHEN CAST(ts AS DATE) >= (SELECT cutoff FROM cut)
        |                  THEN 1 ELSE 0 END) AS n_after
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |       CAST(n_before AS BIGINT) AS n_before,
        |       CAST(n_after AS BIGINT) AS n_after,
        |       CASE WHEN n_after = 0 THEN 'train'
        |            WHEN n_before = 0 THEN 'test'
        |            ELSE 'span_drop' END AS split
        |FROM u""".stripMargin
    ) { (spark, dir) =>
      val ev = Tables(spark, dir).events.select(col("user_id"), to_date(col("ts")).as("d"))
      // day grain first: the cumulative window runs on |days| rows
      val pd  = ev.groupBy("d").agg(count(lit(1)).as("n"))
      val cut = pd
        .withColumn("c", sum(col("n")).over(Window.orderBy("d")))
        .withColumn("tot", sum(col("n")).over(Window.partitionBy()))
        .filter(col("c") * 5 >= col("tot") * 4)
        .agg(min(col("d")).as("cutoff"))
      ev.crossJoin(broadcast(cut))
        .groupBy("user_id")
        .agg(
          sum(when(col("d") < col("cutoff"), 1L).otherwise(0L)).cast("long").as("n_before"),
          sum(when(col("d") >= col("cutoff"), 1L).otherwise(0L)).cast("long").as("n_after"))
        .select(col("user_id"), col("n_before"), col("n_after"),
          when(col("n_after") === 0L, "train")
            .when(col("n_before") === 0L, "test")
            .otherwise("span_drop").as("split"))
    },

    // ── text_pmi_phrases: collocation mining by pointwise mutual
    // information (the word2vec-phrases recipe, Mikolov et al. 2013) —
    // which word pairs co-occur far beyond chance, the phrase-vocabulary
    // builder a tokenizer pipeline runs before BPE. score =
    // n·c(w1,w2) / (c(w1)·c(w2)) with a min-count gate; the ranking
    // score is one mirrored double division (products first, one
    // divide), and an INTEGER bits companion rides along
    // (ilog2(n·c2) − ilog2(c1·c1') — exact in both engines, the
    // text_lm_surprisal idiom). Scale shape: map-side-combined bigram/
    // token counts (corpus-proportional ONCE), then everything —
    // dictionary joins included — lives on the ≤ vocab² candidate grain
    // (min-count-gated; the top-20 window runs on that bounded frame,
    // never on the corpus; with an open vocabulary the rank would come
    // from topk_by_score instead).
    OpQuery.checked(
      "text_pmi_phrases",
      """WITH t AS (
        |  SELECT doc_id, str_split_regex(trim(lower(text)), '\s+') AS ws FROM documents),
        |bgs AS (
        |  SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2
        |  FROM (SELECT unnest(list_transform(range(1, len(ws)),
        |          i -> ws[i] || ' ' || ws[i+1])) AS b
        |        FROM t)),
        |c1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1
        |       FROM (SELECT unnest(ws) AS tok FROM t) GROUP BY tok),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n FROM c1),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        |       FROM bgs GROUP BY 1, 2 HAVING count(*) >= 5),
        |sc AS (
        |  SELECT c2.w1, c2.w2, c2.c2 AS n_pair,
        |         (CAST(c2.c2 AS DOUBLE) * CAST(tot.n AS DOUBLE))
        |           / (CAST(a.c1 AS DOUBLE) * CAST(b.c1 AS DOUBLE)) AS lift,
        |         CAST((length(bin(c2.c2 * tot.n)) - 1)
        |              - (length(bin(a.c1 * b.c1)) - 1) AS BIGINT) AS pmi_bits
        |  FROM c2 JOIN c1 a ON a.tok = c2.w1
        |          JOIN c1 b ON b.tok = c2.w2
        |          CROSS JOIN tot)
        |SELECT * FROM (
        |  SELECT w1, w2, n_pair, lift, pmi_bits,
        |         CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, w1 ASC, w2 ASC) AS BIGINT) AS rnk
        |  FROM sc) WHERE rnk <= 20""".stripMargin
    ) { (spark, dir) =>
      import graft.Norm.ilog2
      val toks = Tables(spark, dir).documents
        .select(col("doc_id"), expr("split(trim(lower(text)), '\\\\s+')").as("ws"))
      val bigrams = toks.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> struct(element_at(ws, i) as w1, element_at(ws, i + 1) as w2))")).as("b"))
        .select(col("b.w1"), col("b.w2"))
      val c1 = toks.select(explode(col("ws")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c1"))
      val tot = c1.agg(sum(col("c1")).cast("long").as("n"))
      val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        .filter(col("c2") >= 5)
      val sc = c2
        .join(c1.toDF("w1", "c1a"), Seq("w1"))
        .join(c1.toDF("w2", "c1b"), Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("c2").as("n_pair"),
          ((col("c2").cast("double") * col("n").cast("double"))
            / (col("c1a").cast("double") * col("c1b").cast("double"))).as("lift"),
          (ilog2(col("c2") * col("n")) - ilog2(col("c1a") * col("c1b"))).as("pmi_bits"))
      sc.withColumn("rnk", row_number().over(
          Window.orderBy(col("lift").desc, col("w1").asc, col("w2").asc)).cast("long"))
        .filter(col("rnk") <= 20)
    },

    // ── text_token_entropy: per-document token-distribution entropy —
    // the information-density quality signal (low-entropy docs are
    // template/boilerplate/keyword-stuffed even when the Gopher ratio
    // gates pass; pairs with text_repetition_topngram, which only sees
    // CONSECUTIVE repeats). Integer-exactness: Shannon entropy's
    // Σ (m/M)·log2(M/m) becomes INTEGER "entropy bits" via the ilog2
    // idiom, and the per-doc sum needs no per-token join at all:
    // Σ m·(ilog2(M) − ilog2(m)) = M·ilog2(M) − Σ m·ilog2(m), so one
    // (doc, token)-grain count and one doc-grain re-aggregate produce
    // an exact BIGINT; the only doubles are two final divisions
    // (bits/token, type-token ratio). Scale shape: two map-side-
    // combined aggregates, no joins, no windows — scan-speed at 100 TB.
    OpQuery.checked(
      "text_token_entropy",
      """WITH t AS (
        |  SELECT doc_id, unnest(str_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |m AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS m FROM t GROUP BY 1, 2),
        |a AS (SELECT doc_id,
        |             CAST(sum(m) AS BIGINT) AS n_tokens,
        |             CAST(count(*) AS BIGINT) AS n_distinct,
        |             CAST(sum(m * (length(bin(m)) - 1)) AS BIGINT) AS s
        |      FROM m GROUP BY 1)
        |SELECT doc_id, n_tokens, n_distinct,
        |       CAST(n_tokens * (length(bin(n_tokens)) - 1) - s AS BIGINT) AS entropy_bits,
        |       CAST(n_tokens * (length(bin(n_tokens)) - 1) - s AS DOUBLE)
        |         / CAST(n_tokens AS DOUBLE) AS bits_per_token,
        |       CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
        |FROM a""".stripMargin
    ) { (spark, dir) =>
      import graft.Norm.ilog2
      val m = Tables(spark, dir).documents
        .select(col("doc_id"),
          explode(expr("split(trim(lower(text)), '\\\\s+')")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("m"))
      m.groupBy("doc_id")
        .agg(
          sum(col("m")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(col("m") * ilog2(col("m"))).as("s"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          (col("n_tokens") * ilog2(col("n_tokens")) - col("s")).as("entropy_bits"),
          ((col("n_tokens") * ilog2(col("n_tokens")) - col("s")).cast("double")
            / col("n_tokens").cast("double")).as("bits_per_token"),
          (col("n_distinct").cast("double") / col("n_tokens").cast("double")).as("ttr"))
    },

    // ── text_winnowing_fingerprint: winnowing document fingerprints
    // (Schleimer, Wilkerson & Aiken 2003 — the MOSS algorithm): hash
    // every k-gram (k=8), then keep only each w-window's MINIMUM hash
    // (w=4) — the guaranteed-coverage selection (any shared substring
    // of length ≥ k+w−1 contributes a shared fingerprint) at expected
    // density 2/(w+1), the local-deduplicatable alternative to minhash
    // when POSITION coverage matters (plagiarism/contamination spans,
    // not whole-doc similarity). Portability: the hash is the md5-hex
    // STRING and "minimum" is lexicographic — the min_md5_salted
    // discipline — so no numeric conversion exists to drift. Scale
    // shape: pure per-row array work (transform → window-min → distinct),
    // ZERO shuffles; the fingerprint SET stays document-local and
    // summary stats are emitted at doc grain.
    OpQuery.checked(
      "text_winnowing_fingerprint",
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 11),
        |g AS (SELECT doc_id,
        |             list_transform(range(1, length(text) - 7 + 1),
        |               i -> md5(substr(text, CAST(i AS INT), 8))) AS hs
        |      FROM d),
        |w AS (SELECT doc_id, len(hs) AS n_grams,
        |             list_distinct(list_transform(range(1, len(hs) - 3 + 1),
        |               j -> list_aggregate(
        |                      list_slice(hs, CAST(j AS INT), CAST(j + 3 AS INT)), 'min'))) AS fps
        |      FROM g WHERE len(hs) >= 4)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |       CAST(len(fps) AS BIGINT) AS n_fps,
        |       list_aggregate(fps, 'min') AS fp_min,
        |       list_aggregate(fps, 'max') AS fp_max
        |FROM w""".stripMargin
    ) { (spark, dir) =>
      // winnow_fps_chars: the native one-pass expression — identical
      // fingerprint set to the composed transform/substring/md5 +
      // window-min/distinct form (TextExprs scaladoc), but each gram is
      // hashed straight out of the row's UTF-8 buffer via a code-point
      // offset table, so the scan allocates per FINGERPRINT, not per
      // POSITION. n_grams stays derivable as char_length - 7.
      graft.functions.TextExprs.register(spark)
      Tables(spark, dir).documents
        .filter(length(col("text")) >= 11)
        .select(col("doc_id"),
          (length(col("text")) - 7).cast("long").as("n_grams"),
          expr("winnow_fps_chars(text, 8, 4)").as("fps"))
        .filter(col("fps").isNotNull)
        .select(col("doc_id"), col("n_grams"),
          size(col("fps")).cast("long").as("n_fps"),
          array_min(col("fps")).as("fp_min"),
          array_max(col("fps")).as("fp_max"))
    },

    // ── sample_mixture_temperature: temperature-scaled source mixing —
    // the data-mixture sampler of multilingual/multi-source training
    // (sample source s with probability ∝ n_s^α, α < 1, so small
    // sources are up-weighted relative to their share; the T5/mT5
    // recipe). α = 1/2 deliberately: sqrt is an IEEE correctly-rounded
    // primitive in BOTH engines, where a general pow(x, 0.7) is not —
    // the same engine-exactness reasoning that picked power-of-two
    // decay weights. Per-source keep thresholds in millionths are pure
    // BIGINT arithmetic (fixed-point √n weights, the centroid-drift
    // idiom, summed exactly; one integer division), and the row-level
    // keep is the deterministic multiplicative hash every sampler here
    // uses — reproducible, re-runnable, engine-portable. Scale shape:
    // one count to the |sources| grain, thresholds broadcast, the
    // corpus pass is a filter.
    OpQuery.checked(
      "sample_mixture_temperature",
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS nh
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source, nh,
        |             CAST(floor(sqrt(CAST(nh AS DOUBLE)) * 1048576) AS BIGINT) AS wfp
        |      FROM c),
        |t AS (SELECT CAST(sum(wfp) AS BIGINT) AS wtot FROM w),
        |thr AS (SELECT source,
        |               CAST((200 * CAST(wfp AS HUGEINT) * 1000000)
        |                    // (CAST(wtot AS HUGEINT) * nh) AS BIGINT) AS t_micro
        |        FROM w, t)
        |SELECT d.doc_id, d.source, thr.t_micro
        |FROM documents d JOIN thr USING (source)
        |WHERE ((d.doc_id % 2147483648) * 2654435761) % 1000000 < thr.t_micro""".stripMargin
    ) { (spark, dir) =>
      val d = Tables(spark, dir).documents.select("doc_id", "source")
      val cnt = d.groupBy("source").agg(count(lit(1)).as("nh"))
        .withColumn("wfp", floor(sqrt(col("nh").cast("double")) * 1048576).cast("long"))
      val tot = cnt.agg(sum(col("wfp")).as("wtot"))
      // threshold numerator 200·wfp·10⁶ in 64-bit would wrap around
      // ~10¹² rows per source (wfp = ⌊√n⌋·2²⁰) — Spark (non-ANSI) wraps
      // silently where DuckDB raises, a silent cross-engine divergence
      // at exactly the scale this op targets. Route the wide products
      // through DECIMAL(38,0) ↔ HUGEINT (the agg_chi2_independence
      // discipline); div on positive operands truncates identically.
      val thr = cnt.crossJoin(broadcast(tot))
        .select(col("source"),
          expr("(200 * cast(wfp as decimal(38,0)) * 1000000) " +
            "div (cast(wtot as decimal(38,0)) * nh)").as("t_micro"))
      d.join(broadcast(thr), "source")
        .filter(Norm.hashBucket(col("doc_id"), 1000000) < col("t_micro"))
        .select(col("doc_id"), col("source"), col("t_micro"))
    },

    // ── sample_dsir: data selection by importance resampling (DSIR —
    // Xie et al., NeurIPS 2023, "Data Selection for Language Models
    // via Importance Resampling"): pick raw documents whose HASHED
    // n-gram feature distribution looks like a target domain, the
    // principled scale-path alternative to training a quality
    // classifier per domain. Feature space = bigrams hashed into 1024
    // buckets with the portable md5-lower-64 hash (bucket = low 10
    // bits — Spark's `& 1023` on the signed long and DuckDB's
    // `% 1024` on the same bits rendered unsigned agree exactly);
    // importance weight = Σ_bigrams [ilog2(tc_b+1) − ilog2(rc_b+1) +
    // ilog2(R+1) − ilog2(T+1)] — the integer-bits log-likelihood
    // ratio log p̂_target(b)/p̂_raw(b) with Laplace smoothing, the
    // normalizers constant per corpus (T, R = total target/raw bigram
    // mass). Target = the doc_id hash bucket < 5 (the same
    // corpus-level device the decontamination stage uses for its
    // bench set); raw docs keep when the summed bits are positive —
    // more target-like than raw-like. Deterministic: no sampling
    // noise, re-runnable, engine-portable.
    //
    // Scale shape: ONE corpus pass explodes bigrams to the (doc,
    // bucket) grain (map-side combined); the two count tables are
    // bounded at 1024 rows each and BROADCAST; the weight sum is a
    // second map-side-combined aggregate at doc grain. Nothing
    // corpus-proportional ever sits on the driver or a broadcast.
    OpQuery.checked(
      "sample_dsir",
      """WITH tt AS (
        |  SELECT doc_id,
        |         ((doc_id % 2147483648) * 2654435761) % 100 AS hb,
        |         str_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |bgs AS (
        |  SELECT doc_id, hb, md5_number_lower(b) % 1024 AS bkt
        |  FROM (SELECT doc_id, hb, unnest(list_transform(range(1, len(ws)),
        |                i -> ws[i] || ' ' || ws[i+1])) AS b FROM tt)),
        |tc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS tcnt FROM bgs WHERE hb < 5 GROUP BY 1),
        |rc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS rcnt FROM bgs WHERE hb >= 5 GROUP BY 1),
        |tot AS (SELECT CAST(sum(CASE WHEN hb < 5 THEN 1 ELSE 0 END) AS BIGINT) AS t_all,
        |               CAST(sum(CASE WHEN hb >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS r_all
        |        FROM bgs),
        |db AS (SELECT doc_id, bkt, CAST(count(*) AS BIGINT) AS m
        |       FROM bgs WHERE hb >= 5 GROUP BY 1, 2),
        |w AS (
        |  SELECT db.doc_id,
        |         CAST(sum(db.m) AS BIGINT) AS nb,
        |         CAST(sum(db.m * ((length(bin(COALESCE(tc.tcnt, 0) + 1)) - 1)
        |                        - (length(bin(COALESCE(rc.rcnt, 0) + 1)) - 1)
        |                        + (length(bin(t.r_all + 1)) - 1)
        |                        - (length(bin(t.t_all + 1)) - 1))) AS BIGINT) AS w_bits
        |  FROM db LEFT JOIN tc USING (bkt) LEFT JOIN rc USING (bkt) CROSS JOIN tot t
        |  GROUP BY 1)
        |SELECT doc_id, nb, w_bits, w_bits > 0 AS kept FROM w""".stripMargin
    ) { (spark, dir) =>
      import graft.Norm.ilog2
      graft.functions.TextExprs.register(spark)
      val tt = Tables(spark, dir).documents
        .select(col("doc_id"), Norm.hashBucket(col("doc_id"), 100).as("hb"),
          expr("split(trim(lower(text)), '\\\\s+')").as("ws"))
      val bgs = tt.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), col("hb"), explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))")).as("b"))
        .select(col("doc_id"), col("hb"), expr("md5_lower64(b) & 1023").as("bkt"))
        .persist() // three aggregates read the hashed-bigram frame
      val tc = bgs.filter(col("hb") < 5).groupBy("bkt").agg(count(lit(1)).as("tcnt"))
      val rc = bgs.filter(col("hb") >= 5).groupBy("bkt").agg(count(lit(1)).as("rcnt"))
      val tot = bgs.agg(
        sum(when(col("hb") < 5, 1L).otherwise(0L)).as("t_all"),
        sum(when(col("hb") >= 5, 1L).otherwise(0L)).as("r_all"))
      val db = bgs.filter(col("hb") >= 5).groupBy("doc_id", "bkt").agg(count(lit(1)).as("m"))
      db
        .join(broadcast(tc), Seq("bkt"), "left_outer")
        .join(broadcast(rc), Seq("bkt"), "left_outer")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("m"),
          (ilog2(coalesce(col("tcnt"), lit(0L)) + 1)
            - ilog2(coalesce(col("rcnt"), lit(0L)) + 1)
            + ilog2(col("r_all") + 1) - ilog2(col("t_all") + 1)).as("bits"))
        .groupBy("doc_id")
        .agg(sum("m").as("nb"), sum(col("m") * col("bits")).as("w_bits"))
        .select(col("doc_id"), col("nb"), col("w_bits"), (col("w_bits") > 0).as("kept"))
    },

    // ── eval_dsir: the selection tier measuring itself — does DSIR's
    // hashed-bigram log-likelihood ratio actually ORDER domain members
    // above non-members? sample_dsir's own target is a hash bucket
    // (the right device for a deterministic selection op, but
    // definitionally indistinguishable from the raw corpus), and this
    // corpus's lang/source columns label text drawn from ONE shared
    // vocabulary (measured: all five langs emit the same 31 words) —
    // so the eval targets the one profile with recoverable signal:
    // the learned-quality gate's stopword-teacher labels (the
    // text_quality_learned fixture). Train the 1024-bucket integer-
    // bits ratio on the even-doc_id half (target = label-1 evens),
    // score the odd-doc_id holdout with exactly sample_dsir's weight
    // arithmetic, and measure the RANKING — threshold-free exact AUC
    // (the Mann–Whitney tie-midrank identity of eval_score_auc) plus
    // precision at the target-prevalence budget (DSIR in production
    // keeps a budget of top-weighted docs, so "of the top n_pos docs
    // by weight, how many are true positives" is its operating
    // point; kept_pos is the integer numerator, one edge division).
    // The raw keep-rule (w_bits > 0) rides along as kept_sign — its
    // near-total keep rate on this fixture is itself a finding the
    // AUC puts in context.
    //
    // Scale shape: identical to sample_dsir — one corpus pass to the
    // (doc, bucket) grain, 1024-row count tables broadcast — then the
    // AUC prefix-sum and the budget rank both ride GlobalRank (range-
    // partitioned, never a partition-less window). Holdout docs with
    // fewer than two tokens have no bigram features and sit out on
    // both engines by construction.
    OpQuery.checked(
      "eval_dsir",
      """WITH tt AS (
        |  SELECT doc_id, doc_id % 2 AS split,
        |         str_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |lab AS (
        |  SELECT doc_id, split, ws,
        |         CASE WHEN 100 * len(list_filter(ws,
        |                x -> x IN ('a','the','of','and','to','in','is','it')))
        |              >= 6 * len(ws) THEN 1 ELSE 0 END AS is_t
        |  FROM tt),
        |bgs AS (
        |  SELECT doc_id, is_t, split, md5_number_lower(b) % 1024 AS bkt
        |  FROM (SELECT doc_id, is_t, split, unnest(list_transform(range(1, len(ws)),
        |                i -> ws[i] || ' ' || ws[i+1])) AS b FROM lab)),
        |tc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS tcnt
        |       FROM bgs WHERE split = 0 AND is_t = 1 GROUP BY 1),
        |rc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS rcnt
        |       FROM bgs WHERE split = 0 AND is_t = 0 GROUP BY 1),
        |tot AS (SELECT CAST(sum(CASE WHEN is_t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t_all,
        |               CAST(sum(CASE WHEN is_t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r_all
        |        FROM bgs WHERE split = 0),
        |db AS (SELECT doc_id, is_t, bkt, CAST(count(*) AS BIGINT) AS m
        |       FROM bgs WHERE split = 1 GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT db.doc_id, db.is_t,
        |         CAST(sum(db.m * ((length(bin(COALESCE(tc.tcnt, 0) + 1)) - 1)
        |                        - (length(bin(COALESCE(rc.rcnt, 0) + 1)) - 1)
        |                        + (length(bin(t.r_all + 1)) - 1)
        |                        - (length(bin(t.t_all + 1)) - 1))) AS BIGINT) AS w_bits
        |  FROM db LEFT JOIN tc USING (bkt) LEFT JOIN rc USING (bkt) CROSS JOIN tot t
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT w_bits,
        |         CAST(sum(is_t) AS BIGINT) AS np,
        |         CAST(sum(1 - is_t) AS BIGINT) AS nn
        |  FROM w GROUP BY w_bits),
        |c AS (
        |  SELECT np, nn,
        |         CAST(coalesce(sum(nn) OVER (ORDER BY w_bits
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cneg
        |  FROM g),
        |auc AS (
        |  SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
        |         CAST(sum(np * (2 * cneg + nn)) AS BIGINT) AS u2
        |  FROM c),
        |topk AS (
        |  SELECT CAST(sum(is_t) AS BIGINT) AS kept_pos
        |  FROM (SELECT is_t, row_number() OVER (ORDER BY w_bits DESC, doc_id) AS rn FROM w)
        |  WHERE rn <= (SELECT n_pos FROM auc))
        |SELECT n_pos + n_neg AS n_eval, n_pos, n_neg, u2,
        |       CAST(u2 AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc,
        |       kept_pos,
        |       CAST(kept_pos AS DOUBLE) / CAST(n_pos AS DOUBLE) AS prec_at_prevalence,
        |       (SELECT CAST(sum(CASE WHEN w_bits > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM w) AS kept_sign
        |FROM auc, topk""".stripMargin
    ) { (spark, dir) =>
      import graft.Norm.ilog2
      graft.functions.TextExprs.register(spark)
      val stops = Seq("a", "the", "of", "and", "to", "in", "is", "it")
      val tt = Tables(spark, dir).documents
        .select(col("doc_id"), pmod(col("doc_id"), lit(2)).as("split"),
          expr("split(trim(lower(text)), '\\\\s+')").as("ws"))
      val lab = tt.select(col("doc_id"), col("split"), col("ws"),
        when(lit(100) * size(filter(col("ws"),
            x => x.isin(stops.map(lit(_)): _*))) >= lit(6) * size(col("ws")), 1L)
          .otherwise(0L).as("is_t"))
      val bgs = lab.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), col("is_t"), col("split"), explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))")).as("b"))
        .select(col("doc_id"), col("is_t"), col("split"),
          expr("md5_lower64(b) & 1023").as("bkt"))
        .persist() // the train counts and the holdout features share it
      val train = bgs.filter(col("split") === 0)
      val tc = train.filter(col("is_t") === 1).groupBy("bkt").agg(count(lit(1)).as("tcnt"))
      val rc = train.filter(col("is_t") === 0).groupBy("bkt").agg(count(lit(1)).as("rcnt"))
      val tot = train.agg(
        sum(when(col("is_t") === 1, 1L).otherwise(0L)).as("t_all"),
        sum(when(col("is_t") === 0, 1L).otherwise(0L)).as("r_all"))
      val db = bgs.filter(col("split") === 1)
        .groupBy("doc_id", "is_t", "bkt").agg(count(lit(1)).as("m"))
      val w = db
        .join(broadcast(tc), Seq("bkt"), "left_outer")
        .join(broadcast(rc), Seq("bkt"), "left_outer")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("is_t"), col("m"),
          (ilog2(coalesce(col("tcnt"), lit(0L)) + 1)
            - ilog2(coalesce(col("rcnt"), lit(0L)) + 1)
            + ilog2(col("r_all") + 1) - ilog2(col("t_all") + 1)).as("bits"))
        .groupBy("doc_id", "is_t")
        .agg(sum(col("m") * col("bits")).as("w_bits"))
        .persist() // the AUC grain, the budget rank, and the sign count share it
      // exact tie-midrank AUC at the distinct-score grain (eval_score_auc)
      val g = w.groupBy("w_bits").agg(
        sum(col("is_t")).as("np"),
        sum(lit(1) - col("is_t")).as("nn"))
      val auc = graft.algo.GlobalRank
        .withPrefixSum(g, Seq(col("w_bits").asc), col("nn"), "cneg")
        .agg(
          sum(col("np")).as("n_pos"),
          sum(col("nn")).as("n_neg"),
          sum(col("np") * (lit(2) * col("cneg") + col("nn"))).as("u2"))
      // precision at the target-prevalence budget: top-n_pos by weight
      val keptPos = graft.algo.GlobalRank
        .withRowNumber(w, Seq(col("w_bits").desc, col("doc_id").asc), "rn", "n_all")
        .crossJoin(broadcast(auc.select(col("n_pos").as("budget"))))
        .filter(col("rn") <= col("budget"))
        .agg(sum(col("is_t")).as("kept_pos"))
      val keptSign = w.agg(
        sum(when(col("w_bits") > 0, 1L).otherwise(0L)).as("kept_sign"))
      auc.crossJoin(broadcast(keptPos)).crossJoin(broadcast(keptSign))
        .select(
          (col("n_pos") + col("n_neg")).as("n_eval"),
          col("n_pos"), col("n_neg"), col("u2"),
          (col("u2").cast("double")
            / (lit(2) * col("n_pos") * col("n_neg")).cast("double")).as("auc"),
          col("kept_pos"),
          (col("kept_pos").cast("double") / col("n_pos").cast("double"))
            .as("prec_at_prevalence"),
          col("kept_sign"))
    },

    // ── sample_bootstrap_poisson: the distributed bootstrap — estimator
    // uncertainty without resampling shuffles (Poisson bootstrap,
    // Chamandy et al. 2012 / Efron's classic with Poisson(1) replicate
    // weights): each row draws its count in replica b from a
    // DETERMINISTIC hash uniform against the Poisson(1) inverse-CDF
    // thresholds, so every replica is a reproducible reweighted pass,
    // not a shuffle — the only way to bootstrap at 100 TB. Engine
    // exactness: u = hex(md5)/2⁶⁰ is the class-balance numeric-hash
    // view (same integer, same one double rounding, same division in
    // both engines), the CDF thresholds are identical double literals,
    // counts are integers, and revenue accumulates as exact DECIMAL
    // with the VARCHAR-route cast at the edge. Scale shape: one
    // explode(×B) fan-out feeding a map-side-combined aggregate to the
    // B-row replica grain; B is a constant (8), so the whole op is one
    // bounded-fan-out scan.
    OpQuery.checked(
      "sample_bootstrap_poisson",
      """WITH r AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS replica),
        |d AS (
        |  SELECT r.replica, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |         CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '-' ||
        |                  CAST(r.replica AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
        |           / 1152921504606846976.0 AS u
        |  FROM orders CROSS JOIN r),
        |c AS (
        |  SELECT replica, price,
        |         CASE WHEN u < 0.36787944117144233 THEN 0
        |              WHEN u < 0.7357588823428847 THEN 1
        |              WHEN u < 0.9196986029286058 THEN 2
        |              WHEN u < 0.9810118431238462 THEN 3
        |              WHEN u < 0.9963401531726563 THEN 4
        |              ELSE 5 END AS cnt
        |  FROM d)
        |SELECT replica,
        |       CAST(sum(cnt) AS BIGINT) AS n_draws,
        |       CAST(CAST(sum(cnt * price) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM c GROUP BY replica""".stripMargin
    ) { (spark, dir) =>
      val o = Tables(spark, dir).orders
        .select(col("o_orderkey"), graft.Norm.dec(col("o_totalprice")).as("price"))
        .withColumn("replica", explode(expr("sequence(cast(0 as bigint), cast(7 as bigint))")))
      val u = (expr("cast(conv(substring(md5(concat(cast(o_orderkey as string), '-', " +
        "cast(replica as string))), 1, 15), 16, 10) as bigint)").cast("double")
        / lit(1152921504606846976.0))
      o.withColumn(
          "cnt",
          when(u < 0.36787944117144233, 0L)
            .when(u < 0.7357588823428847, 1L)
            .when(u < 0.9196986029286058, 2L)
            .when(u < 0.9810118431238462, 3L)
            .when(u < 0.9963401531726563, 4L)
            .otherwise(5L))
        .groupBy("replica")
        .agg(
          sum(col("cnt")).as("n_draws"),
          sum(col("cnt") * col("price")).as("rev_dec"))
        .select(col("replica"), col("n_draws"),
          col("rev_dec").cast("string").cast("double").as("revenue"))
    },

    // ── pipeline_pretrain_v2: the COMPOSED pretraining pipeline — the
    // current gate suite as ONE DAG with per-stage drop accounting,
    // because a real pretraining user runs the composition, not twenty
    // separate gates. Seven stages, each the exact semantics of its
    // standalone op restricted to the surviving set:
    //   1 quality_learned   keep score > 0 under the even-split-trained
    //                       Laplace fixed-point classifier
    //                       (text_quality_learned's weights, applied to
    //                       the WHOLE corpus — the teacher labels only
    //                       ever touch the train split)
    //   2 lm_surprisal      keep docs within ±0.1 bits/bigram of the
    //                       corpus-mean surprisal under the even-split
    //                       bigram LM (too predictable = boilerplate,
    //                       too surprising = gibberish) — the band is
    //                       RELATIVE, CCNet-style, because the backoff
    //                       penalty scales with ilog2(vocab) and an
    //                       absolute window empties as the corpus
    //                       grows; integer form 10·|sbits·N − S·nb| ≤
    //                       nb·N, and bigram-less docs (< 2 tokens)
    //                       drop here
    //   3 token_entropy     keep entropy ≥ 3.2 bits/token
    //                       (5·entropy_bits ≥ 16·n_tokens)
    //   4 dedup_substring   drop docs where merged duplicated-span load
    //                       covers ≥ half the doc — duplicate grams
    //                       counted WITHIN the surviving corpus (the
    //                       pipeline dedups what it is about to train
    //                       on, not what it already discarded)
    //   5 decontaminate     drop the benchmark bucket itself (hash
    //                       bucket < 5 — those ARE the eval suite) and
    //                       every doc sharing a WINNOWED word-8-gram
    //                       fingerprint with it (k=8 words, w=4: any
    //                       shared run ≥ 11 words is guaranteed a
    //                       shared fingerprint at 2/5 the probe
    //                       density); engine = Bloom prefilter inside
    //                       codegen + exact verify join, oracle = plain
    //                       containment — FPs never reach the result
    //   6 mixture_temperature  α=1/2 temperature sampling over survivor
    //                       source counts, target 100 docs (the
    //                       sample_mixture_temperature fixed-point
    //                       DECIMAL(38,0) thresholds — undersized
    //                       sources saturate past 10⁶ and keep all)
    //   7 seqlen_pack       pack survivors into 512-token shards per
    //                       (lang, doc_id%4) and report the shard count
    // Output = the 7-row funnel (docs_in, docs_kept, docs_dropped,
    // tokens_kept, n_packs), so conservation is checkable in-result:
    // docs_in(k+1) = docs_kept(k) and Σ drops + survivors = input
    // (PipelineV2Spec pins it). Scale shape: every stage is the
    // standalone op's shape (map-side-combined token/gram aggregates,
    // the chunked two-explode shingle scan, broadcast thresholds); the
    // survivor sets persisted between stages are doc_id-grain — bytes
    // per doc, never corpus-proportional — and the funnel rows are
    // crossed 1-row aggregates.
    OpQuery.checked(
      "pipeline_pretrain_v2",
      """WITH base AS (SELECT doc_id, source, lang, text FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(str_split_regex(trim(lower(text)), '\s+')) AS tok FROM base),
        |ntok AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM toks GROUP BY doc_id),
        |lab AS (
        |  SELECT doc_id,
        |         CASE WHEN 100 * sum(CASE WHEN tok IN ('a','the','of','and','to','in','is','it')
        |                                  THEN 1 ELSE 0 END) >= 6 * count(*)
        |              THEN 1 ELSE 0 END AS label
        |  FROM toks GROUP BY doc_id),
        |train AS (SELECT t.tok, l.label FROM toks t JOIN lab l USING (doc_id)
        |          WHERE t.doc_id % 2 = 0),
        |prior AS (SELECT (1000 * (sum(label) + 1)) // (count(*) + 2) AS q0 FROM train),
        |wts AS (SELECT tok, CAST((1000 * (sum(label) + 1)) // (count(*) + 2)
        |                         - (SELECT q0 FROM prior) AS BIGINT) AS w
        |        FROM train GROUP BY tok),
        |k1 AS (SELECT t.doc_id FROM toks t LEFT JOIN wts w ON w.tok = t.tok
        |       GROUP BY t.doc_id HAVING sum(COALESCE(w.w, 0)) > 0),
        |tt AS (SELECT doc_id, str_split_regex(trim(lower(text)), '\s+') AS ws FROM base),
        |bgs AS (
        |  SELECT doc_id, split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |                 i -> ws[i] || ' ' || ws[i+1])) AS b FROM tt)),
        |c1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1
        |       FROM (SELECT unnest(ws) AS tok FROM tt WHERE doc_id % 2 = 0) GROUP BY tok),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n_total FROM c1),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        |       FROM bgs WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |sb AS (SELECT g.doc_id, g.w1, g.w2, CAST(count(*) AS BIGINT) AS m
        |       FROM bgs g JOIN k1 USING (doc_id) GROUP BY 1, 2, 3),
        |jj AS (
        |  SELECT sb.doc_id, sb.m, c2.c2, a.c1 AS c1w1, bb.c1 AS c1w2, tot.n_total
        |  FROM sb LEFT JOIN c2 USING (w1, w2)
        |          LEFT JOIN c1 a ON a.tok = sb.w1
        |          LEFT JOIN c1 bb ON bb.tok = sb.w2
        |          CROSS JOIN tot),
        |surp AS (
        |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS nb,
        |         CAST(sum(m * CASE WHEN c2 IS NOT NULL
        |                THEN (length(bin(c1w1)) - 1) - (length(bin(c2)) - 1)
        |              WHEN c1w2 IS NOT NULL
        |                THEN (length(bin(n_total)) - 1) - (length(bin(c1w2)) - 1) + 1
        |              ELSE (length(bin(n_total)) - 1) + 2 END) AS BIGINT) AS sbits
        |  FROM jj GROUP BY doc_id),
        |gl AS (SELECT CAST(sum(sbits) AS BIGINT) AS s_all, CAST(sum(nb) AS BIGINT) AS n_all FROM surp),
        |k2 AS (SELECT doc_id FROM surp CROSS JOIN gl
        |       WHERE 10 * abs(sbits * n_all - s_all * nb) <= nb * n_all),
        |ment AS (SELECT t.doc_id, t.tok, CAST(count(*) AS BIGINT) AS m
        |         FROM toks t JOIN k2 USING (doc_id) GROUP BY 1, 2),
        |ent AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS nt,
        |               CAST(sum(m * (length(bin(m)) - 1)) AS BIGINT) AS s
        |        FROM ment GROUP BY 1),
        |k3 AS (SELECT doc_id FROM ent
        |       WHERE 5 * (nt * (length(bin(nt)) - 1) - s) >= 16 * nt),
        |t4 AS (SELECT b.doc_id, b.text, length(b.text) AS n FROM base b JOIN k3 USING (doc_id)),
        |sh4 AS (SELECT doc_id, unnest(range(1, n - 48)) AS p FROM t4 WHERE n >= 50),
        |g4 AS (SELECT s.doc_id, s.p, md5(substr(t.text, CAST(s.p AS INT), 50)) AS h
        |       FROM sh4 s JOIN t4 t ON t.doc_id = s.doc_id),
        |cnt4 AS (SELECT h, count(*) AS c FROM g4 GROUP BY 1),
        |dup4 AS (SELECT g.doc_id, g.p FROM g4 g JOIN cnt4 ON cnt4.h = g.h WHERE cnt4.c >= 2),
        |runs4 AS (SELECT doc_id, p,
        |                 p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        |          FROM dup4),
        |spans4 AS (SELECT doc_id, min(p) AS s0, max(p) + 49 AS e0 FROM runs4 GROUP BY doc_id, grp),
        |dl AS (SELECT doc_id, CAST(sum(e0 - s0 + 1) AS BIGINT) AS dupload FROM spans4 GROUP BY doc_id),
        |k4 AS (SELECT t.doc_id FROM t4 t LEFT JOIN dl USING (doc_id)
        |       WHERE 2 * COALESCE(dl.dupload, 0) < t.n),
        |w5 AS (SELECT doc_id, (doc_id % 2147483648) * 2654435761 % 100 AS b,
        |              str_split(text, ' ') AS ws FROM base),
        |g5 AS (SELECT doc_id, b,
        |              list_transform(range(1, greatest(len(ws) - 7, 1) + 1),
        |                i -> md5(array_to_string(ws[CAST(i AS INT):CAST(i AS INT) + 7], ' '))) AS hs
        |       FROM w5),
        |f5 AS (SELECT doc_id, b,
        |              unnest(list_distinct(list_transform(range(1, len(hs) - 3 + 1),
        |                j -> list_aggregate(
        |                       list_slice(hs, CAST(j AS INT), CAST(j + 3 AS INT)), 'min')))) AS fp
        |       FROM g5 WHERE len(hs) >= 4),
        |bench AS (SELECT DISTINCT fp FROM f5 WHERE b < 5),
        |contam AS (SELECT DISTINCT f.doc_id FROM f5 f JOIN bench USING (fp) WHERE f.b >= 5),
        |k5 AS (SELECT k4.doc_id FROM k4 JOIN w5 USING (doc_id)
        |       LEFT JOIN contam c ON c.doc_id = k4.doc_id
        |       WHERE w5.b >= 5 AND c.doc_id IS NULL),
        |c6 AS (SELECT d.source, CAST(count(*) AS BIGINT) AS nh
        |       FROM base d JOIN k5 USING (doc_id) GROUP BY 1),
        |w6 AS (SELECT source, nh,
        |              CAST(floor(sqrt(CAST(nh AS DOUBLE)) * 1048576) AS BIGINT) AS wfp
        |       FROM c6),
        |t6 AS (SELECT CAST(sum(wfp) AS BIGINT) AS wtot FROM w6),
        |thr AS (SELECT source,
        |               CAST((100 * CAST(wfp AS HUGEINT) * 1000000)
        |                    // (CAST(wtot AS HUGEINT) * nh) AS BIGINT) AS t_micro
        |        FROM w6, t6),
        |k6 AS (SELECT d.doc_id FROM base d JOIN k5 USING (doc_id) JOIN thr USING (source)
        |       WHERE ((d.doc_id % 2147483648) * 2654435761) % 1000000 < thr.t_micro),
        |p7 AS (SELECT d.doc_id, d.lang, d.doc_id % 4 AS bucket, n.n_tokens
        |       FROM base d JOIN k6 USING (doc_id) JOIN ntok n USING (doc_id)),
        |c7 AS (SELECT lang, bucket, n_tokens,
        |              COALESCE(sum(n_tokens) OVER (PARTITION BY lang, bucket ORDER BY doc_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |       FROM p7),
        |packs AS (SELECT DISTINCT lang, bucket, tokens_before // 512 AS shard FROM c7)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_id, 'quality_learned' AS stage,
        |         CAST((SELECT count(*) FROM base) AS BIGINT) AS docs_in,
        |         CAST((SELECT count(*) FROM k1) AS BIGINT) AS docs_kept,
        |         CAST((SELECT count(*) FROM base) - (SELECT count(*) FROM k1) AS BIGINT) AS docs_dropped,
        |         CAST((SELECT COALESCE(sum(n.n_tokens), 0) FROM k1 JOIN ntok n USING (doc_id)) AS BIGINT) AS tokens_kept,
        |         CAST(NULL AS BIGINT) AS n_packs
        |  UNION ALL
        |  SELECT 2, 'lm_surprisal',
        |         (SELECT count(*) FROM k1), (SELECT count(*) FROM k2),
        |         (SELECT count(*) FROM k1) - (SELECT count(*) FROM k2),
        |         CAST((SELECT COALESCE(sum(n.n_tokens), 0) FROM k2 JOIN ntok n USING (doc_id)) AS BIGINT), NULL
        |  UNION ALL
        |  SELECT 3, 'token_entropy',
        |         (SELECT count(*) FROM k2), (SELECT count(*) FROM k3),
        |         (SELECT count(*) FROM k2) - (SELECT count(*) FROM k3),
        |         CAST((SELECT COALESCE(sum(n.n_tokens), 0) FROM k3 JOIN ntok n USING (doc_id)) AS BIGINT), NULL
        |  UNION ALL
        |  SELECT 4, 'dedup_substring',
        |         (SELECT count(*) FROM k3), (SELECT count(*) FROM k4),
        |         (SELECT count(*) FROM k3) - (SELECT count(*) FROM k4),
        |         CAST((SELECT COALESCE(sum(n.n_tokens), 0) FROM k4 JOIN ntok n USING (doc_id)) AS BIGINT), NULL
        |  UNION ALL
        |  SELECT 5, 'decontaminate',
        |         (SELECT count(*) FROM k4), (SELECT count(*) FROM k5),
        |         (SELECT count(*) FROM k4) - (SELECT count(*) FROM k5),
        |         CAST((SELECT COALESCE(sum(n.n_tokens), 0) FROM k5 JOIN ntok n USING (doc_id)) AS BIGINT), NULL
        |  UNION ALL
        |  SELECT 6, 'mixture_temperature',
        |         (SELECT count(*) FROM k5), (SELECT count(*) FROM k6),
        |         (SELECT count(*) FROM k5) - (SELECT count(*) FROM k6),
        |         CAST((SELECT COALESCE(sum(n.n_tokens), 0) FROM k6 JOIN ntok n USING (doc_id)) AS BIGINT), NULL
        |  UNION ALL
        |  SELECT 7, 'seqlen_pack',
        |         (SELECT count(*) FROM k6), (SELECT count(*) FROM k6),
        |         0,
        |         CAST((SELECT COALESCE(sum(n.n_tokens), 0) FROM k6 JOIN ntok n USING (doc_id)) AS BIGINT),
        |         (SELECT count(*) FROM packs))""".stripMargin
    ) { (spark, dir) =>
      import graft.Norm.ilog2
      import org.apache.spark.sql.DataFrame
      graft.functions.BloomFilter.register(spark)
      graft.functions.TextExprs.register(spark)
      // dev instrumentation: GRAFT_STAGE_TIMING=1 forces each stage's
      // materialization eagerly and prints its wall time to stderr —
      // the lazy DAG otherwise interleaves stage costs inside the first
      // funnel action, making the composition unprofilable
      def mark(name: String)(df: DataFrame): DataFrame = {
        if (sys.env.contains("GRAFT_STAGE_TIMING")) {
          val t0 = System.nanoTime()
          val c = df.count()
          System.err.println(f"[v2-stage] $name%-18s rows=$c%-8d ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
        df
      }
      val base = Tables(spark, dir).documents.select("doc_id", "source", "lang", "text")
      val toks = base.select(col("doc_id"),
        explode(expr("split(trim(lower(text)), '\\\\s+')")).as("tok"))
      // doc_id-grain frames are persisted between stages: each survivor
      // set feeds the next stage AND two funnel aggregates, and without
      // the persist every funnel row would re-run the full upstream
      // chain (including the S4 shingle scan). Bytes per doc, never
      // corpus-proportional.
      val ntok = mark("ntok")(toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens")).persist())
      // S1: train the Laplace fixed-point classifier on the even split,
      // score EVERYONE (text_quality_learned trains identically)
      val stops = Seq("a", "the", "of", "and", "to", "in", "is", "it")
      val lab = toks.groupBy("doc_id")
        .agg(count(lit(1)).as("nt"),
          sum(when(col("tok").isin(stops: _*), 1L).otherwise(0L)).as("n_stop"))
        .select(col("doc_id"),
          when(lit(100) * col("n_stop") >= lit(6) * col("nt"), 1L).otherwise(0L).as("label"))
      val train = toks.join(lab, Seq("doc_id")).filter(pmod(col("doc_id"), lit(2)) === 0)
      val prior = train.agg(expr("(1000 * (sum(label) + 1)) div (count(*) + 2)").as("q0"))
      val wts = train.groupBy("tok")
        .agg(sum(col("label")).as("pos"), count(lit(1)).as("n"))
        .crossJoin(broadcast(prior))
        .select(col("tok"), expr("(1000 * (pos + 1)) div (n + 2) - q0").as("w"))
      // k1-k3/k6 stay PERSIST, not the k4/k5 localCheckpoint: an A/B
      // (r14) measured eager checkpoints here at +1.5 s — each one is a
      // separate serial job, while the lazy persists let Spark schedule
      // the S1-S3 subtrees inside the downstream actions' DAGs. The
      // plan-growth hazard the k4/k5 checkpoints cut only bites once the
      // composed lineage multiplies (f5/contam re-reads), not at these
      // linear depths.
      val k1 = toks.join(wts, Seq("tok"), "left_outer")
        .groupBy("doc_id").agg(sum(coalesce(col("w"), lit(0L))).as("score"))
        .filter(col("score") > 0).select("doc_id").persist()
      mark("k1_quality")(k1)
      // S2: even-split bigram LM (text_lm_surprisal), scored over k1
      val tt = base.select(col("doc_id"), expr("split(trim(lower(text)), '\\\\s+')").as("ws"))
      val bigrams = tt.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c1 = tt.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(explode(col("ws")).as("tok")).groupBy("tok").agg(count(lit(1)).as("c1"))
      val tot = c1.agg(sum("c1").as("n_total"))
      val c2 = bigrams.filter(pmod(col("doc_id"), lit(2)) === 0)
        .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val sb = bigrams.join(k1, Seq("doc_id"))
        .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
      val bits = when(col("c2").isNotNull, ilog2(col("c1w1")) - ilog2(col("c2")))
        .when(col("c1w2").isNotNull, ilog2(col("n_total")) - ilog2(col("c1w2")) + 1)
        .otherwise(ilog2(col("n_total")) + 2)
      val surp2 = sb
        .join(c2, Seq("w1", "w2"), "left_outer")
        .join(c1.toDF("w1", "c1w1"), Seq("w1"), "left_outer")
        .join(c1.toDF("w2", "c1w2"), Seq("w2"), "left_outer")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(sum(col("m")).as("nb"), sum(bits * col("m")).as("sbits"))
        .persist()
      // relative band: |bits/bigram − corpus mean| ≤ 0.1, the CCNet
      // posture — an absolute band is scale-dependent (the backoff
      // penalty grows with ilog2(vocab total), so the whole
      // distribution shifts up as the corpus grows and a fixed window
      // empties out). Integer-exact: with S = Σsbits, N = Σnb over the
      // scored survivors, keep 10·|sbits·N − S·nb| ≤ nb·N. Magnitudes:
      // sbits ≈ 5·nb, so sbits·N ≈ 5·nb_doc·N — under 10¹⁸ until
      // N ≈ 10¹⁴ bigrams (≫ 100 TB of text), BIGINT-safe.
      val gl2 = surp2.agg(sum("sbits").as("s_all"), sum("nb").as("n_all"))
      val k2 = surp2.crossJoin(broadcast(gl2))
        .filter(lit(10) * abs(col("sbits") * col("n_all") - col("s_all") * col("nb"))
          <= col("nb") * col("n_all"))
        .select("doc_id").persist()
      mark("k2_surprisal")(k2)
      // S3: entropy floor (text_token_entropy) over k2
      val k3 = toks.join(k2, Seq("doc_id"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("m"))
        .groupBy("doc_id")
        .agg(sum(col("m")).as("nt"), sum(col("m") * ilog2(col("m"))).as("s"))
        .filter(lit(5) * (col("nt") * ilog2(col("nt")) - col("s")) >= lit(16) * col("nt"))
        .select("doc_id").persist()
      mark("k3_entropy")(k3)
      // S4: substring-span load within survivors (text_dedup_substring's
      // chunked two-explode scan; xxhash64 anchors — only the dup SET
      // must agree with the oracle's md5, same reasoning as the
      // standalone op)
      val chunk = 4096
      val t4 = base.join(k3, Seq("doc_id"))
        .select(col("doc_id"), col("text").cast("binary").as("bt"))
        .withColumn("n", octet_length(col("bt")))
      val g4 = t4.filter(col("n") >= 50)
        .select(col("doc_id"), col("bt"), col("n"),
          explode(expr(s"sequence(0, (n - 50) div $chunk)")).as("ci"))
        .select(col("doc_id"), col("bt"),
          explode(expr(
            s"sequence(ci * $chunk + 1, least((ci + 1) * $chunk, n - 49))")).as("p"))
        // MEMORY_AND_DISK, not DISK_ONLY: the gram frame is ~24 bytes/
        // position (id, p, hash) — tens of MiB at sf0.1, and at cluster
        // scale the spill path degrades gracefully; r11's DISK_ONLY
        // forced a disk round-trip on every one of cnt4's and dl's reads
        // where the standalone op keeps the same frame in memory
        .select(col("doc_id"), col("p"), xxhash64(expr("substring(bt, p, 50)")).as("h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      mark("g4_grams")(g4)
      val cnt4 = g4.groupBy("h").agg(count(lit(1)).as("c"))
      val dl = g4.join(cnt4.filter(col("c") >= 2), Seq("h")).select("doc_id", "p")
        .withColumn("grp", col("p") - row_number().over(
          Window.partitionBy("doc_id").orderBy("p")))
        .groupBy("doc_id", "grp")
        .agg((max(col("p")) - min(col("p")) + 50).as("span_len"))
        .groupBy("doc_id").agg(sum("span_len").as("dupload"))
      // localCheckpoint, not persist: from S4 on, stages reference their
      // predecessors 2-3× each (f5 embeds k4; contam reads f5 twice;
      // thr crosses c6 with its own total; every funnel row re-reads two
      // stages) — persist truncates EXECUTION but not the analyzed plan,
      // so the composed lineage grows multiplicatively and Catalyst
      // analysis alone OOMs the driver. Checkpointing cuts the plan at
      // the stage boundary; frames are doc_id-grain (bytes per doc). On
      // a real cluster, point spark.checkpoint.dir at durable storage
      // and use .checkpoint() for executor-loss tolerance.
      val k4 = t4.join(dl, Seq("doc_id"), "left_outer")
        .filter(lit(2) * coalesce(col("dupload"), lit(0L)) < col("n"))
        .select("doc_id").localCheckpoint(true)
      mark("k4_substr")(k4)
      // S5: winnowed word-8-gram decontamination — Bloom prefilter in
      // codegen, exact verify join kills FPs (text_contamination_bloom
      // physical strategy, text_winnowing_fingerprint selection)
      val w5 = base.select(col("doc_id"),
        Norm.hashBucket(col("doc_id"), 100).as("b"), split(col("text"), " ").as("ws"))
      // fingerprint only the docs the stage can actually consult: the
      // bench bucket (b < 5 — ALL of it, the bench set is a corpus-level
      // definition) plus the k4 survivors it screens. The oracle
      // fingerprints every doc, but contam is only ever intersected
      // with k4, so the restriction is result-equivalent — and it stops
      // the pipeline paying the full-corpus winnowing scan (the single
      // most expensive per-row expression in the DAG) for docs earlier
      // stages already dropped. Persisted once: benchFp, the Bloom
      // build, and the verify join all read the same materialization.
      // winnow_fps_words: the native one-pass winnowing expression —
      // bit-identical fingerprints to the composed
      // transform/slice/md5 + window-min/distinct form (TextExprs
      // scaladoc has the equivalence argument), at per-FINGERPRINT
      // instead of per-POSITION allocation; it returns null below w
      // grams, so explode performs the size(hs) >= 4 gate
      // the two winnowed sides are built separately (r18) so the bench
      // fingerprints — consumed by the eager bloom build below AND the
      // verify join — never depend on a filter being pushed through the
      // union into the k4-join arm; each side persists once and every
      // consumer reads exactly its own side
      def winnowed(side: DataFrame) = side
        .select(col("doc_id"), col("b"),
          explode(expr("winnow_fps_words(ws, 8, 4)")).as("fp"))
        .persist()
      val benchSide = winnowed(w5.filter(col("b") < 5))
      val trainSide = winnowed(w5.filter(col("b") >= 5).join(k4, Seq("doc_id")))
      val benchFp = benchSide.select("fp").distinct()
      // the one collect: the fixed 128 KiB bitset, constant at any scale
      val tBloom = System.nanoTime()
      val bloom = benchFp.agg(expr("bloom_build(fp, 1048576, 5)").as("bf"))
        .head().getAs[Array[Byte]](0)
      if (sys.env.contains("GRAFT_STAGE_TIMING"))
        System.err.println(f"[v2-stage] bloom_build       ${(System.nanoTime() - tBloom) / 1e9}%.2f s")
      val contam = trainSide
        .filter(call_function("bloom_contains", lit(bloom), col("fp"), lit(5)))
        .join(benchFp, Seq("fp"))
        .select("doc_id").distinct()
      val k5 = k4.join(w5.select("doc_id", "b"), Seq("doc_id"))
        .filter(col("b") >= 5)
        .join(contam.withColumn("hit", lit(1)), Seq("doc_id"), "left_outer")
        .filter(col("hit").isNull)
        .select("doc_id").localCheckpoint(true)  // see k4: plan-growth cut
      mark("k5_decontam")(k5)
      // S6: α=1/2 temperature thresholds over SURVIVOR source counts
      // (sample_mixture_temperature's DECIMAL(38,0) wide products)
      val d6 = base.select("doc_id", "source").join(k5, Seq("doc_id"))
      val c6 = d6.groupBy("source").agg(count(lit(1)).as("nh"))
        .withColumn("wfp", floor(sqrt(col("nh").cast("double")) * 1048576).cast("long"))
      val t6 = c6.agg(sum(col("wfp")).as("wtot"))
      val thr = c6.crossJoin(broadcast(t6))
        .select(col("source"),
          expr("(100 * cast(wfp as decimal(38,0)) * 1000000) " +
            "div (cast(wtot as decimal(38,0)) * nh)").as("t_micro"))
      val k6 = d6.join(broadcast(thr), Seq("source"))
        .filter(Norm.hashBucket(col("doc_id"), 1000000) < col("t_micro"))
        .select("doc_id").persist()
      mark("k6_mixture")(k6)
      // S7: pack survivors into 512-token shards (text_seqlen_pack)
      val w7 = Window.partitionBy("lang", "bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val packs = base.select(col("doc_id"), col("lang")).join(k6, Seq("doc_id"))
        .join(ntok, Seq("doc_id"))
        .withColumn("bucket", pmod(col("doc_id"), lit(4L)))
        .withColumn("tokens_before", coalesce(sum("n_tokens").over(w7), lit(0L)))
        .select(col("lang"), col("bucket"), expr("tokens_before DIV 512").as("shard"))
        .distinct()
      // the funnel: ONE pass, not 22 crossed 1-row aggregates. The r11
      // shape ran 2 counts + a tokens join per stage row (≈22 Spark
      // jobs); per-job scheduling overhead is noise in isolation but
      // multiplies under a long sweep's GC pressure — it was the
      // single biggest slice of the 28.5 s driver-sweep reading (the
      // stages themselves profile at ≈3.5 s warm). Instead: left-join
      // the six survivor sets onto the doc spine as 0/1 flags, fold
      // ALL funnel stats in one aggregate (count + 6 survivor sums +
      // 6 flag-masked token sums), and explode the 7 rows from the
      // single result row — 1 job over doc_id-grain frames, and at
      // cluster scale one co-partitioned shuffle instead of 22 rounds.
      def flag(df: DataFrame, as: String) =
        df.withColumn(as, lit(1L))
      val flags = base.select(col("doc_id"))
        .join(ntok, Seq("doc_id"), "left_outer")
        .join(flag(k1, "f1"), Seq("doc_id"), "left_outer")
        .join(flag(k2, "f2"), Seq("doc_id"), "left_outer")
        .join(flag(k3, "f3"), Seq("doc_id"), "left_outer")
        .join(flag(k4, "f4"), Seq("doc_id"), "left_outer")
        .join(flag(k5, "f5"), Seq("doc_id"), "left_outer")
        .join(flag(k6, "f6"), Seq("doc_id"), "left_outer")
        .select(coalesce(col("n_tokens"), lit(0L)).as("nt") +:
          (1 to 6).map(i => coalesce(col(s"f$i"), lit(0L)).as(s"f$i")): _*)
      val statExprs = count(lit(1)).as("n0") +: (1 to 6).flatMap(i => Seq(
        coalesce(sum(col(s"f$i")), lit(0L)).as(s"n$i"),
        coalesce(sum(col(s"f$i") * col("nt")), lit(0L)).as(s"t$i")))
      val stats = flags.agg(statExprs.head, statExprs.tail: _*)
      val row = stats.crossJoin(
        broadcast(packs.agg(count(lit(1)).cast("long").as("np"))))
      mark("flags_funnel")(flags)
      mark("packs")(packs)
      val names = Seq("quality_learned", "lm_surprisal", "token_entropy",
        "dedup_substring", "decontaminate", "mixture_temperature")
      val stageRows = names.zipWithIndex.map { case (nm, ix) =>
        val i = ix + 1
        struct(lit(i.toLong).as("stage_id"), lit(nm).as("stage"),
          col(s"n${i - 1}").as("docs_in"), col(s"n$i").as("docs_kept"),
          (col(s"n${i - 1}") - col(s"n$i")).as("docs_dropped"),
          col(s"t$i").as("tokens_kept"),
          lit(null).cast("long").as("n_packs"))
      } :+ struct(lit(7L).as("stage_id"), lit("seqlen_pack").as("stage"),
        col("n6").as("docs_in"), col("n6").as("docs_kept"),
        lit(0L).as("docs_dropped"), col("t6").as("tokens_kept"),
        col("np").as("n_packs"))
      row.select(explode(array(stageRows: _*)).as("r")).select("r.*")
    })
}
