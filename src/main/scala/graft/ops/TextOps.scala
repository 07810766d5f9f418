package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** LLM-training-data text operators over the `documents` table
  * (BASELINE.json north-star scope): language ID, quality scoring, token
  * counting, document fingerprinting, exact + n-gram-Jaccard near dedup.
  *
  * 100 TB design rule: per-document work (shingling, hashing, scoring) is
  * expressed as array higher-order functions — partition-local, no shuffle,
  * whole-stage-codegen'd. Only candidate-pair generation shuffles, and it
  * shuffles on the banded fingerprint (tiny keys), never on raw text.
  */
object TextOps {

  /** Parquet location for eval_dedup_pr's exact-Jaccard gold-pair set —
    * the [[GraphOps.coGraph]] artifact discipline applied to the eval's
    * one expensive input: the capped 500²-pair ground truth is a pure
    * deterministic function of the capped sample, so it is built ONCE
    * per corpus (content-fingerprint hive partition, `_SUCCESS`-gated)
    * and every later sweep reads it back instead of re-paying the
    * quadratic verify. The eval config (cap 500, 8-gram shingles,
    * J ≥ 0.5) is baked into the name so a config change misses the
    * skip gate mechanically. The DuckDB oracle keeps deriving gold
    * independently — a stronger check than replaying persisted bytes. */
  val DedupGoldDir =
    graft.Artifacts.Root + "/dedupdata/gold_pairs_c500n8j50.parquet"

  /** 8-char shingle array of a document (distinct, document-local). */
  private val shingleArr =
    "array_distinct(transform(sequence(1, greatest(char_length(text) - 7, 1)), i -> substr(text, i, 8)))"

  /** Salted min-md5 shingle fingerprint — the portable (Spark == DuckDB)
    * minhash primitive: min over 8-char shingles of md5(salt || shingle).
    * Computed by the native single-pass expression (graft.functions
    * .MinMd5Salted); bit-identical to the interpreted HOF form. */
  private def minFp(salt: String): String = s"min_md5_salted(shingles, '$salt')"

  private def tables(spark: org.apache.spark.sql.SparkSession, dir: String): Tables = {
    graft.functions.TextExprs.register(spark)
    Tables(spark, dir)
  }

  /** Shared shingle artifact: (doc_id, text, shingles), cached once and
    * reused by every dedup/fingerprint op (Spark's CacheManager matches the
    * cached subplan inside each derived query, so repeated calls share ONE
    * entry per dir rather than accumulating). In a production pipeline
    * this is a persisted parquet artifact — shingling 100 TB once, not once
    * per consumer — and the cache models exactly that. A long-lived session
    * that is done with a corpus calls [[release]] to return the storage. */
  private def docBase(spark: org.apache.spark.sql.SparkSession, dir: String) =
    tables(spark, dir).documents
      .select(col("doc_id"), col("text"), expr(shingleArr).as("shingles"))
      .cache()

  /** Unpersist the shared per-corpus artifacts ([[docBase]]/[[fpBase]]). */
  def release(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    fpBase(spark, dir).unpersist(false)
    docBase(spark, dir).unpersist(false)
  }

  /** Shared fingerprint artifact: (doc_id, h = md5(text), f1, f2) — the
    * tiny (4 × 32-byte) table every candidate-pair join shuffles on. */
  private def fpBase(spark: org.apache.spark.sql.SparkSession, dir: String) =
    docBase(spark, dir)
      .select(
        col("doc_id"), md5(col("text")).as("h"),
        expr(minFp("s1")).as("f1"), expr(minFp("s2")).as("f2"))
      .cache()

  private def duckMinFp(salt: String): String =
    s"list_aggregate(list_transform(range(1, greatest(length(text)-7, 1) + 1), i -> md5('$salt' || substr(text, CAST(i AS INT), 8))), 'min')"

  /** Shared oracle for both cluster ops: the DuckDB recursive-CTE fixpoint
    * of the same exact+near edge set, component = min doc_id. */
  private lazy val clusterOracle: String =
    s"""WITH RECURSIVE fp AS (
       |  SELECT doc_id, md5(text) AS h, ${duckMinFp("s1")} AS f1, ${duckMinFp("s2")} AS f2,
       |         list_distinct(list_transform(range(1, greatest(length(text)-7, 1) + 1), i -> substr(text, CAST(i AS INT), 8))) AS sh
       |  FROM documents),
       |edges AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b
       |  FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
       |  UNION
       |  SELECT a.doc_id, b.doc_id
       |  FROM fp a JOIN fp b ON a.f1 = b.f1 AND a.f2 = b.f2 AND a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
       |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
       |reach AS (
       |  SELECT a AS id, b AS r FROM sym
       |  UNION
       |  SELECT s.a, re.r FROM sym s JOIN reach re ON s.b = re.id),
       |comp AS (
       |  SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id)
       |SELECT d.doc_id,
       |       CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS cluster_id,
       |       CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS is_canonical
       |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id""".stripMargin

  /** Shared cluster pipeline: build the verified dup-edge list, resolve
    * components with the given algorithm, emit (doc_id, cluster_id,
    * is_canonical) for every document.
    *
    * Candidate-pair joins run over the 4×32-byte fingerprint artifact
    * only — the shingle arrays never ride through a self-join shuffle.
    * Shingles are fetched just for the (few) candidate pairs; AQE
    * broadcasts the tiny candidate side at runtime. */
  private def clusterWith(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      cc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
    : org.apache.spark.sql.DataFrame = {
    val docs = tables(spark, dir).documents
    val sh   = docBase(spark, dir).select(col("doc_id"), col("shingles"))
    val fp   = fpBase(spark, dir)
    // exact-dup edges as a STAR (group-min → member), not all pairs: the
    // component structure is identical, but a content replicated m times
    // contributes m−1 edges instead of m(m−1)/2 — the all-pairs form is
    // quadratic in exactly the hot-duplicate case dedup exists for
    val exact = fp
      .withColumn("root", min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("doc_id") =!= col("root"))
      .select(col("root").as("a"), col("doc_id").as("b"))
    // near-dup candidates through the skew-guarded block join
    val near = BlockedPairs
      .pairs(fp.select("doc_id", "f1", "f2"), Seq("f1", "f2"), "doc_id", BlockedPairs.DefaultCap)
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .join(sh.select(col("doc_id").as("a"), col("shingles").as("sh_a")), "a")
      .join(sh.select(col("doc_id").as("b"), col("shingles").as("sh_b")), "b")
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jac",
        col("n_inter").cast("double") / (size(col("sh_a")) + size(col("sh_b")) - col("n_inter")))
      .filter(col("jac") >= 0.8)
      .select(col("a"), col("b"))
    // the verified edge list is tiny (near-dup pairs only) — cache it so
    // the CC loop's seed checkpoint doesn't replay the verify pipeline.
    val edges = exact.unionByName(near).distinct().cache()
    val comp  = cc(edges)
    docs.select("doc_id")
      .join(comp, docs("doc_id") === comp("id"), "left_outer")
      .select(
        col("doc_id"),
        coalesce(col("component"), col("doc_id")).cast("long").as("cluster_id"),
        when(coalesce(col("component"), col("doc_id")) === col("doc_id"), 1L).otherwise(0L).as("is_canonical"))
  }

  val ops: Seq[OpQuery] = Seq(
    // ── text_langid: n-gram-marker language ID — per-language function-word
    // counts, argmax with fixed tie preference. Pure projection (no shuffle).
    OpQuery.checked(
      "text_langid",
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5 AS BIGINT) AS en_score,
        |    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' la ', ''))) / 4 AS BIGINT) AS es_score,
        |    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' der ', ''))) / 5 AS BIGINT) AS de_score,
        |    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' le ', ''))) / 4 AS BIGINT) AS fr_score
        |  FROM documents)
        |SELECT doc_id, lang, en_score, es_score, de_score, fr_score,
        |       CASE WHEN en_score >= es_score AND en_score >= de_score AND en_score >= fr_score THEN 'en'
        |            WHEN es_score >= de_score AND es_score >= fr_score THEN 'es'
        |            WHEN de_score >= fr_score THEN 'de'
        |            ELSE 'fr' END AS pred_lang
        |FROM scored""".stripMargin
    ) { (spark, dir) =>
      def score(marker: String) = {
        val padded = concat(lit(" "), col("text"), lit(" "))
        ((length(padded) - length(regexp_replace(padded, marker, ""))) / marker.length).cast("long")
      }
      Tables(spark, dir).documents
        .select(
          col("doc_id"), col("lang"),
          score(" the ").as("en_score"), score(" la ").as("es_score"),
          score(" der ").as("de_score"), score(" le ").as("fr_score"))
        .withColumn("pred_lang",
          when(col("en_score") >= col("es_score") && col("en_score") >= col("de_score")
            && col("en_score") >= col("fr_score"), "en")
            .when(col("es_score") >= col("de_score") && col("es_score") >= col("fr_score"), "es")
            .when(col("de_score") >= col("fr_score"), "de")
            .otherwise("fr"))
    },

    // ── eval_langid_confusion: per-class evaluation of the langid model
    // against the gold `lang` column — the MODEL-EVAL op every gate in
    // this library implies but none emitted: per class, (tp, fp, fn) via
    // two grouped counts full-outer-joined on the class label (the
    // pred-side and gold-side marginals; gold classes the model can
    // never predict, e.g. 'zh' here, surface with tp = 0 rather than
    // vanishing). Exactness: precision/recall/F1 are each ONE integer
    // division — F1 deliberately in its single-ratio form
    // 2·tp/(2·tp+fp+fn), not 2pr/(p+r), so no composed double
    // arithmetic exists to drift; degenerate denominators go NULL
    // identically via nullif semantics. Scale shape: one projection
    // pass for predictions, two map-side-combined class-grain counts,
    // a |classes|-row join — scan-speed at any corpus size.
    OpQuery.checked(
      "eval_langid_confusion",
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5 AS BIGINT) AS en_score,
        |    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' la ', ''))) / 4 AS BIGINT) AS es_score,
        |    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' der ', ''))) / 5 AS BIGINT) AS de_score,
        |    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' le ', ''))) / 4 AS BIGINT) AS fr_score
        |  FROM documents),
        |p AS (
        |  SELECT lang AS gold,
        |         CASE WHEN en_score >= es_score AND en_score >= de_score AND en_score >= fr_score THEN 'en'
        |              WHEN es_score >= de_score AND es_score >= fr_score THEN 'es'
        |              WHEN de_score >= fr_score THEN 'de'
        |              ELSE 'fr' END AS pred
        |  FROM scored),
        |pm AS (SELECT pred AS cls, CAST(count(*) AS BIGINT) AS n_pred,
        |              CAST(sum(CASE WHEN pred = gold THEN 1 ELSE 0 END) AS BIGINT) AS tp
        |       FROM p GROUP BY 1),
        |gm AS (SELECT gold AS cls, CAST(count(*) AS BIGINT) AS n_gold FROM p GROUP BY 1)
        |SELECT coalesce(pm.cls, gm.cls) AS cls,
        |       coalesce(pm.tp, 0) AS tp,
        |       coalesce(pm.n_pred, 0) - coalesce(pm.tp, 0) AS fp,
        |       coalesce(gm.n_gold, 0) - coalesce(pm.tp, 0) AS fn,
        |       CAST(coalesce(pm.tp, 0) AS DOUBLE) / nullif(coalesce(pm.n_pred, 0), 0) AS precision_,
        |       CAST(coalesce(pm.tp, 0) AS DOUBLE) / nullif(coalesce(gm.n_gold, 0), 0) AS recall_,
        |       CAST(2 * coalesce(pm.tp, 0) AS DOUBLE)
        |         / nullif(coalesce(pm.n_pred, 0) + coalesce(gm.n_gold, 0), 0) AS f1
        |FROM pm FULL OUTER JOIN gm ON pm.cls = gm.cls""".stripMargin
    ) { (spark, dir) =>
      def score(marker: String) = {
        val padded = concat(lit(" "), col("text"), lit(" "))
        ((length(padded) - length(regexp_replace(padded, marker, ""))) / marker.length).cast("long")
      }
      val p = tables(spark, dir).documents
        .select(col("lang").as("gold"),
          score(" the ").as("en"), score(" la ").as("es"),
          score(" der ").as("de"), score(" le ").as("fr"))
        .select(col("gold"),
          when(col("en") >= col("es") && col("en") >= col("de") && col("en") >= col("fr"), "en")
            .when(col("es") >= col("de") && col("es") >= col("fr"), "es")
            .when(col("de") >= col("fr"), "de")
            .otherwise("fr").as("pred"))
      val pm = p.groupBy(col("pred").as("cls"))
        .agg(count(lit(1)).as("n_pred"),
          sum(when(col("pred") === col("gold"), 1L).otherwise(0L)).as("tp"))
      val gm = p.groupBy(col("gold").as("cls")).agg(count(lit(1)).as("n_gold"))
      val tp = coalesce(col("tp"), lit(0L))
      val np = coalesce(col("n_pred"), lit(0L))
      val ng = coalesce(col("n_gold"), lit(0L))
      pm.join(gm, Seq("cls"), "full_outer")
        .select(col("cls"), tp.as("tp"), (np - tp).as("fp"), (ng - tp).as("fn"),
          (tp.cast("double") / when(np =!= 0, np)).as("precision_"),
          (tp.cast("double") / when(ng =!= 0, ng)).as("recall_"),
          ((tp * 2).cast("double") / when(np + ng =!= 0, np + ng)).as("f1"))
    },

    // ── text_quality: length / lexical-ratio quality signals + a composite
    // keep/drop score — the standard pretraining-corpus filter features.
    OpQuery.checked(
      "text_quality",
      """WITH feats AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars_m,
        |    CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS alpha_chars,
        |    CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5
        |       + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS BIGINT) AS stop_hits
        |  FROM documents)
        |SELECT doc_id, n_chars_m, n_tokens, alpha_chars, stop_hits,
        |       CAST(alpha_chars AS DOUBLE) / n_chars_m AS alpha_ratio,
        |       CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio,
        |       CAST(CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1 ELSE 0 END
        |          + CASE WHEN CAST(alpha_chars AS DOUBLE) / n_chars_m > 0.7 THEN 1 ELSE 0 END
        |          + CASE WHEN stop_hits > 0 THEN 1 ELSE 0 END AS BIGINT) AS quality_score
        |FROM feats""".stripMargin
    ) { (spark, dir) =>
      val padded = concat(lit(" "), col("text"), lit(" "))
      def hits(m: String) = (length(padded) - length(regexp_replace(padded, m, ""))) / m.length
      Tables(spark, dir).documents
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars_m"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("alpha_chars"),
          (hits(" the ") + hits(" a ")).cast("long").as("stop_hits"))
        .withColumn("alpha_ratio", col("alpha_chars").cast("double") / col("n_chars_m"))
        .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
        .withColumn("quality_score",
          (when(col("n_tokens").between(10, 1000), 1).otherwise(0)
            + when(col("alpha_ratio") > 0.7, 1).otherwise(0)
            + when(col("stop_hits") > 0, 1).otherwise(0)).cast("long"))
    },

    // ── text_tokens: token counting — whitespace, regex word tokens, and a
    // chars/4 BPE-budget estimate (the standard LLM context-cost proxy).
    OpQuery.checked(
      "text_tokens",
      """SELECT doc_id,
        |       CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS word_tokens,
        |       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
        |       CAST(length(text) AS DOUBLE) / len(regexp_extract_all(text, '[a-z0-9]+')) AS chars_per_word
        |FROM documents""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).documents.select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast("long").as("word_tokens"),
        ceil(length(col("text")) / 4.0).cast("long").as("est_bpe_tokens"),
        (length(col("text")).cast("double") / size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")))
          .as("chars_per_word"))
    },

    // ── text_fingerprint: shingle fingerprinting (winnowing-lite) — min/max
    // salted-md5 over 8-char shingles + distinct-shingle cardinality.
    // Entirely partition-local (array HOFs): zero shuffle at any scale.
    OpQuery.checked(
      "text_fingerprint",
      s"""SELECT doc_id,
         |       ${duckMinFp("s1")} AS fp_min,
         |       list_aggregate(list_transform(range(1, greatest(length(text)-7, 1) + 1), i -> md5('s1' || substr(text, CAST(i AS INT), 8))), 'max') AS fp_max,
         |       CAST(len(list_distinct(list_transform(range(1, greatest(length(text)-7, 1) + 1), i -> substr(text, CAST(i AS INT), 8)))) AS BIGINT) AS n_distinct_shingles
         |FROM documents""".stripMargin
    ) { (spark, dir) =>
      docBase(spark, dir)
        .select(
          col("doc_id"),
          expr(minFp("s1")).as("fp_min"),
          expr("max_md5_salted(shingles, 's1')").as("fp_max"),
          size(col("shingles")).cast("long").as("n_distinct_shingles"))
    },

    // ── dedup_exact: exact dedup by content hash — groupBy md5(text), keep
    // lowest doc_id (the canonical survivor), count duplicates.
    OpQuery.checked(
      "dedup_exact",
      """SELECT md5(text) AS content_hash,
        |       CAST(min(doc_id) AS BIGINT) AS keep_id,
        |       CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).documents
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).cast("long").as("keep_id"), count(lit(1)).as("n_copies"))
    },

    // ── eval_dedup_pr: precision/recall of the banded-MinHash near-dup
    // detector against exact-Jaccard ground truth — the second eval-
    // family op (after eval_langid_confusion), and the number a dedup
    // rollout actually needs before trusting LSH at scale. Ground truth
    // is inherently quadratic, so the eval runs on a HARD-CAPPED
    // deterministic sample — top-500 docs by (md5(doc_id), doc_id), the
    // sim_* QueryCap posture: 500² candidate pairs is a CONSTANT at any
    // corpus size, and the cap is a GlobalLimit in the plan, not a
    // comment. Gold = capped pairs with true 8-gram-shingle Jaccard
    // ≥ 0.5; predicted = the SAME 16-hash 4×4-band construction as
    // dedup_minhash_lsh (band collision + ≥ 8/16 signature agreement —
    // the estimator calibrated at J = 0.5) restricted to the sample.
    // precision/recall are single integer divisions and F1 is the
    // one-ratio 2·tp/(n_pred+n_gold) form; degenerate denominators go
    // NULL identically in both engines.
    OpQuery.checked(
      "eval_dedup_pr", {
        val sigList = (1 to 16)
          .map(k => s"list_aggregate(list_transform(shingles, s -> md5('s$k' || s)), 'min')")
          .mkString("[", ", ", "]")
        s"""WITH capd AS (
           |  SELECT doc_id, text FROM documents
           |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 500),
           |sh AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text)-7, 1) + 1),
           |           i -> substr(text, CAST(i AS INT), 8))) AS shingles
           |  FROM capd),
           |gold AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           |        / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
           |        >= 0.5),
           |fp AS (SELECT doc_id, $sigList AS sig FROM sh),
           |banded AS (
           |  SELECT doc_id, b,
           |         md5(sig[CAST(b*4+1 AS INT)] || '|' || sig[CAST(b*4+2 AS INT)] || '|' ||
           |             sig[CAST(b*4+3 AS INT)] || '|' || sig[CAST(b*4+4 AS INT)]) AS bh
           |  FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
           |pred AS (
           |  SELECT DISTINCT c.a_id, c.b_id FROM (
           |    SELECT a.doc_id AS a_id, b.doc_id AS b_id
           |    FROM banded a JOIN banded b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id) c
           |  JOIN fp fa ON fa.doc_id = c.a_id JOIN fp fb ON fb.doc_id = c.b_id
           |  WHERE len(list_filter(range(1, 17), k -> fa.sig[CAST(k AS INT)] = fb.sig[CAST(k AS INT)])) >= 8),
           |m AS (
           |  SELECT CAST((SELECT count(*) FROM gold) AS BIGINT) AS n_gold,
           |         CAST((SELECT count(*) FROM pred) AS BIGINT) AS n_pred,
           |         CAST((SELECT count(*) FROM gold g JOIN pred p
           |               ON g.a_id = p.a_id AND g.b_id = p.b_id) AS BIGINT) AS tp)
           |SELECT CAST((SELECT count(*) FROM capd) AS BIGINT) AS n_docs,
           |       n_gold, n_pred, tp,
           |       CAST(tp AS DOUBLE) / nullif(n_pred, 0) AS precision_,
           |       CAST(tp AS DOUBLE) / nullif(n_gold, 0) AS recall_,
           |       CAST(2 * tp AS DOUBLE) / nullif(n_pred + n_gold, 0) AS f1
           |FROM m""".stripMargin
      }
    ) { (spark, dir) =>
      // repartition after the cap: LIMIT leaves the 500 rows on ONE
      // partition, and the all-pairs gold verify would run single-task
      // (measured 53 s vs ~3 s at sf0.1); spreading the LEFT side
      // parallelizes the nested-loop probe across the cluster. Shingle
      // AFTER the cap — the shared docBase artifact would shingle the
      // whole corpus to keep 500 rows
      val capDocs = tables(spark, dir).documents
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id")).limit(500)
        .select(col("doc_id"), col("text"))
      val capd = capDocs
        .select(col("doc_id"), expr(shingleArr).as("shingles"))
        .repartition(col("doc_id"))
        .cache()
      // gold pairs from the persisted artifact (build-once per corpus):
      // fingerprint = XOR of xxhash64(doc_id, text) over the CAPPED
      // sample — a CONTENT hash, not a length profile: an edit that
      // preserves per-doc lengths must invalidate the artifact too (a
      // stale reuse only ever surfaced later as an opaque oracle hash
      // mismatch). bit_xor, not sum: an i64 SUM of hashes overflows
      // under ANSI mode (it's a cache key, not a statistic, and XOR of
      // per-row-unique hashes keys content just as well). Null-safe
      // read: an empty capped sample leaves the aggregate NULL.
      val goldFp = Option(capDocs
        .agg(expr("bit_xor(xxhash64(doc_id, text))"))
        .head().getAs[java.lang.Long](0)).map(_.longValue).getOrElse(0L)
      val goldPath = s"$DedupGoldDir/corpus_fp=$goldFp"
      val gold = TextOps.synchronized {
        if (!graft.Artifacts.ready(spark, goldPath))
          capd.toDF("a_id", "sa")
            .join(broadcast(capd.toDF("b_id", "sb")), col("a_id") < col("b_id"))
            .withColumn("ni", size(array_intersect(col("sa"), col("sb"))))
            .filter(col("ni").cast("double")
              / (size(col("sa")) + size(col("sb")) - col("ni")) >= 0.5)
            .select(col("a_id"), col("b_id"))
            .coalesce(1).write.mode("overwrite").parquet(goldPath)
        spark.read.parquet(goldPath)
      }
      val fp = capd.select(col("doc_id"), expr("min_md5_multi(shingles, 16)").as("sig"))
      val banded = fp.select(
        col("doc_id"),
        explode(expr(
          "transform(sequence(0, 3), b -> named_struct('band', b, 'bh', md5(concat_ws('|', slice(sig, b*4+1, 4)))))")).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      val pred = banded.toDF("a_id", "band", "bh")
        .join(banded.toDF("b_id", "band", "bh"), Seq("band", "bh"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
        .join(fp.toDF("a_id", "siga"), "a_id")
        .join(fp.toDF("b_id", "sigb"), "b_id")
        .filter(expr("size(filter(sequence(1, 16), k -> element_at(siga, k) = element_at(sigb, k))) >= 8"))
        .select("a_id", "b_id")
      // ONE pass over gold ∪ pred for all three pair counts: the old
      // shape crossed three separate aggregates, which evaluated the
      // (uncached) banded-LSH pred pipeline twice — once for n_pred,
      // once inside the tp join. A full-outer flag join computes
      // n_gold / n_pred / tp from a single evaluation of each side
      // (both are distinct pair sets, so sums of 0/1 flags are exact).
      val m = gold.select(col("a_id"), col("b_id"), lit(1L).as("g"))
        .join(pred.select(col("a_id"), col("b_id"), lit(1L).as("p")),
          Seq("a_id", "b_id"), "full_outer")
        .agg(
          coalesce(sum(col("g")), lit(0L)).as("n_gold"),
          coalesce(sum(col("p")), lit(0L)).as("n_pred"),
          coalesce(sum(col("g") * col("p")), lit(0L)).as("tp"))
        .crossJoin(capd.agg(count(lit(1)).as("n_docs")))
      m.select(col("n_docs"), col("n_gold"), col("n_pred"), col("tp"),
        (col("tp").cast("double") / when(col("n_pred") =!= 0, col("n_pred"))).as("precision_"),
        (col("tp").cast("double") / when(col("n_gold") =!= 0, col("n_gold"))).as("recall_"),
        ((col("tp") * 2).cast("double")
          / when(col("n_pred") + col("n_gold") =!= 0, col("n_pred") + col("n_gold"))).as("f1"))
    },

    // ── dedup_ngram_jaccard: near-dup detection — banded minhash blocking
    // (2 salted min-fingerprints must both collide) → exact 8-gram Jaccard
    // on the candidate pairs only. The classic MinHash-LSH→verify pipeline:
    // candidate generation shuffles on 32-byte fingerprints, never on text;
    // verification joins exploded distinct shingles per candidate pair.
    OpQuery.checked(
      "dedup_ngram_jaccard",
      s"""WITH fp AS (
         |  SELECT doc_id, ${duckMinFp("s1")} AS f1, ${duckMinFp("s2")} AS f2 FROM documents),
         |cand AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM fp a JOIN fp b ON a.f1 = b.f1 AND a.f2 = b.f2 AND a.doc_id < b.doc_id),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(length(text)-7, 1) + 1), i -> substr(text, CAST(i AS INT), 8)))) AS shingle
         |  FROM documents),
         |card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.a_id, c.b_id, count(*) AS n_inter
         |  FROM cand c
         |    JOIN sh sa ON sa.doc_id = c.a_id
         |    JOIN sh sb ON sb.doc_id = c.b_id AND sb.shingle = sa.shingle
         |  GROUP BY c.a_id, c.b_id)
         |SELECT i.a_id, i.b_id,
         |       CAST(i.n_inter AS BIGINT) AS n_inter,
         |       CAST(ca.n_sh AS BIGINT) AS n_a,
         |       CAST(cb.n_sh AS BIGINT) AS n_b,
         |       CAST(i.n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_inter) AS jaccard
         |FROM inter i
         |  JOIN card ca ON ca.doc_id = i.a_id
         |  JOIN card cb ON cb.doc_id = i.b_id""".stripMargin
    ) { (spark, dir) =>
      // Shingle sets ride as per-doc arrays: fingerprints are one native
      // pass each, candidate pairs join on 32-byte fingerprints only, and
      // the Jaccard verify is a partition-local array_intersect — no
      // exploded-shingle shuffle. (For unbounded document sizes the
      // explode+join formulation wins; for bounded docs this is ~5× faster.)
      // NO broadcast hints: every join side is corpus-derived (grows with
      // the data), so the scale-safe physical plan is a shuffle join on
      // the 32-byte fingerprint / doc_id keys. AQE still elects broadcast
      // at runtime when the candidate side turns out tiny — its call.
      val sh = docBase(spark, dir)
      val fp = fpBase(spark, dir)
      // skew-guarded band self-join (common boilerplate ⇒ hot fingerprint
      // blocks): BlockedPairs caps per-cell pair counts, same pair set
      val cand = BlockedPairs
        .pairs(fp.select("doc_id", "f1", "f2"), Seq("f1", "f2"), "doc_id", BlockedPairs.DefaultCap)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      cand
        .join(sh.select(col("doc_id").as("a_id"), col("shingles").as("sh_a")), "a_id")
        .join(sh.select(col("doc_id").as("b_id"), col("shingles").as("sh_b")), "b_id")
        .select(
          col("a_id"), col("b_id"),
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("n_inter"),
          size(col("sh_a")).cast("long").as("n_a"),
          size(col("sh_b")).cast("long").as("n_b"))
        .withColumn("jaccard",
          col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
    },

    // ── dedup_cluster: pairs → groups. Union exact-dup edges (same md5)
    // with verified near-dup edges (banded candidates at 8-gram Jaccard
    // ≥ 0.8), run connected components (min-label propagation), emit every
    // document with its cluster id and canonical flag. The DuckDB oracle
    // computes the same fixpoint with a recursive CTE — both sides
    // converge to component = min doc_id, so results hash-match.
    OpQuery.checked("dedup_cluster", clusterOracle) { (spark, dir) =>
      clusterWith(spark, dir, graft.algo.ConnectedComponents.components(_))
    },

    // ── dedup_cluster_star: the same pairs→groups contract resolved with
    // the two-phase star-contraction loop (Kiveris et al. SoCC'14,
    // `ConnectedComponents.componentsStar`) — O(log² n) rounds regardless
    // of component diameter, the extreme-scale path where min-label
    // propagation's O(diameter) degrades. Identical output, identical
    // oracle: the algorithm swap is the only difference.
    OpQuery.checked("dedup_cluster_star", clusterOracle) { (spark, dir) =>
      clusterWith(spark, dir, graft.algo.ConnectedComponents.componentsStar(_))
    },

    // ── text_ngram_freq: corpus-level n-gram frequency — top-20 word
    // bigrams with deterministic tiebreak; the vocabulary/statistics pass
    // of a training-data pipeline (map-side partial counts, one shuffle
    // on the bigram).
    OpQuery.checked(
      "text_ngram_freq",
      """WITH words AS (
        |  SELECT doc_id, str_split(trim(text), ' ') AS w FROM documents),
        |bigrams AS (
        |  SELECT unnest(list_transform(range(1, len(w)), i ->
        |    w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1])) AS bigram
        |  FROM words WHERE len(w) > 1),
        |counted AS (
        |  SELECT bigram, count(*) AS n FROM bigrams GROUP BY bigram)
        |SELECT bigram, CAST(n AS BIGINT) AS n,
        |       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, bigram ASC) AS BIGINT) AS rnk
        |FROM counted ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin
    ) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables(spark, dir).documents
        .select(split(trim(col("text")), " ").as("w"))
        .filter(size(col("w")) > 1)
        .select(explode(expr("transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))")).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(Window.orderBy(col("n").desc, col("bigram").asc)).cast("long"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20)
    },

    // ── text_chunk: fixed-window document chunking with overlap — the
    // canonical pre-training segmentation (chunk = 50 tokens, stride = 40,
    // so consecutive chunks share 10 tokens). Pure per-document array
    // arithmetic: tokenize once, explode a computed chunk-index range,
    // slice the token array per chunk. No shuffle at any scale; output
    // rows ≈ corpus tokens / stride.
    OpQuery.checked(
      "text_chunk",
      """WITH toks AS (
        |  SELECT doc_id, str_split(trim(text), ' ') AS tokens FROM documents),
        |chunks AS (
        |  SELECT doc_id, len(tokens) AS n_tokens,
        |         unnest(range(0, greatest(CAST(ceil((len(tokens) - 10) / 40.0) AS BIGINT), 1))) AS chunk_idx,
        |         tokens
        |  FROM toks)
        |SELECT doc_id,
        |       CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |       CAST(chunk_idx * 40 + 1 AS BIGINT) AS tok_start,
        |       array_to_string(tokens[CAST(chunk_idx*40+1 AS INT):CAST(chunk_idx*40+50 AS INT)], ' ') AS chunk_text,
        |       CAST(len(tokens[CAST(chunk_idx*40+1 AS INT):CAST(chunk_idx*40+50 AS INT)]) AS BIGINT) AS chunk_tokens
        |FROM chunks""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(col("doc_id"), split(trim(col("text")), " ").as("tokens"))
        .withColumn("n_tokens", size(col("tokens")).cast("long"))
        .withColumn("chunk_idx",
          explode(expr("sequence(CAST(0 AS BIGINT), greatest(CAST(ceil((n_tokens - 10) / 40.0) AS BIGINT), 1) - 1)")))
        .select(
          col("doc_id"), col("n_tokens"), col("chunk_idx"),
          (col("chunk_idx") * 40 + 1).cast("long").as("tok_start"),
          concat_ws(" ", expr("slice(tokens, CAST(chunk_idx*40+1 AS INT), 50)")).as("chunk_text"),
          size(expr("slice(tokens, CAST(chunk_idx*40+1 AS INT), 50)")).cast("long").as("chunk_tokens"))
    },

    // ── agg_approx_distinct: HyperLogLog++ distinct estimation — the
    // 100 TB alternative to exact COUNT(DISTINCT) when ±2% is acceptable.
    // The raw estimate is an engine-specific sketch value, so the checked
    // projection is the exact count plus `within_5pct` — the estimate's
    // error-bound flag, which a correctly-working HLL++ at rsd=0.02 pins
    // to 1 deterministically (the sketch is hash-based, not randomized).
    // The estimate itself stays in the plan because the flag derives from
    // it.
    OpQuery.checked(
      "agg_approx_distinct",
      """SELECT o_orderpriority,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
        |       CAST(1 AS BIGINT) AS within_5pct
        |FROM orders GROUP BY o_orderpriority""".stripMargin
    ) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .groupBy("o_orderpriority")
        .agg(
          approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
          countDistinct(col("o_custkey")).as("exact_cust"))
        .select(
          col("o_orderpriority"), col("exact_cust"),
          when(abs(col("approx_cust") - col("exact_cust")) <= col("exact_cust") * 0.05, 1L)
            .otherwise(0L).as("within_5pct"))
    },

    // ── pipeline_pretrain: the composed training-data pipeline as ONE
    // DAG — quality gate (token count + alpha ratio + stopword signal) →
    // language gate (n-gram marker argmax = 'en') → exact dedup (md5
    // groupBy, lowest doc_id survives) → fixed-window chunking. This is
    // how the individual operators are actually consumed; the whole
    // composition stays two shuffles (dedup groupBy + nothing else — the
    // gates and chunking are narrow), and the oracle checks the composed
    // semantics end-to-end.
    OpQuery.checked(
      "pipeline_pretrain",
      """WITH feats AS (
        |  SELECT doc_id, text,
        |    CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
        |    (length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5 AS en_score,
        |    (length(' '||text||' ') - length(replace(' '||text||' ', ' la ', ''))) / 4 AS es_score,
        |    (length(' '||text||' ') - length(replace(' '||text||' ', ' der ', ''))) / 5 AS de_score,
        |    (length(' '||text||' ') - length(replace(' '||text||' ', ' le ', ''))) / 4 AS fr_score
        |  FROM documents),
        |kept AS (
        |  SELECT doc_id, text, n_tokens FROM feats
        |  WHERE n_tokens BETWEEN 10 AND 1000 AND alpha_ratio > 0.5
        |    AND en_score >= es_score AND en_score >= de_score AND en_score >= fr_score),
        |deduped AS (
        |  SELECT min(doc_id) AS doc_id, min(text) AS text, min(n_tokens) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS n_copies
        |  FROM kept GROUP BY md5(text)),
        |toks AS (SELECT doc_id, n_copies, str_split(trim(text), ' ') AS tokens FROM deduped),
        |chunks AS (
        |  SELECT doc_id, n_copies, len(tokens) AS n_tokens,
        |         unnest(range(0, greatest(CAST(ceil((len(tokens) - 10) / 40.0) AS BIGINT), 1))) AS chunk_idx,
        |         tokens
        |  FROM toks)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, n_copies,
        |       CAST(len(tokens[CAST(chunk_idx*40+1 AS INT):CAST(chunk_idx*40+50 AS INT)]) AS BIGINT) AS chunk_tokens,
        |       md5(array_to_string(tokens[CAST(chunk_idx*40+1 AS INT):CAST(chunk_idx*40+50 AS INT)], ' ')) AS chunk_hash
        |FROM chunks""".stripMargin
    ) { (spark, dir) =>
      val padded = concat(lit(" "), col("text"), lit(" "))
      def hits(m: String) = (length(padded) - length(regexp_replace(padded, m, ""))) / m.length
      val kept = Tables(spark, dir).documents
        .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast("long"))
        .withColumn("alpha_ratio",
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") / length(col("text")))
        .withColumn("en_score", hits(" the ")).withColumn("es_score", hits(" la "))
        .withColumn("de_score", hits(" der ")).withColumn("fr_score", hits(" le "))
        .filter(col("n_tokens").between(10, 1000) && col("alpha_ratio") > 0.5
          && col("en_score") >= col("es_score") && col("en_score") >= col("de_score")
          && col("en_score") >= col("fr_score"))
        .select("doc_id", "text", "n_tokens")
      val deduped = kept
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("text")).as("text"),
          min(col("n_tokens")).as("n_tokens"), count(lit(1)).as("n_copies"))
      deduped
        .select(col("doc_id"), col("n_copies"), split(trim(col("text")), " ").as("tokens"))
        .withColumn("chunk_idx",
          explode(expr("sequence(CAST(0 AS BIGINT), greatest(CAST(ceil((size(tokens) - 10) / 40.0) AS BIGINT), 1) - 1)")))
        .select(
          col("doc_id"), col("chunk_idx"), col("n_copies"),
          size(expr("slice(tokens, CAST(chunk_idx*40+1 AS INT), 50)")).cast("long").as("chunk_tokens"),
          md5(concat_ws(" ", expr("slice(tokens, CAST(chunk_idx*40+1 AS INT), 50)"))).as("chunk_hash"))
    },

    // ── text_heavy_hitters: SpaceSaving word-bigram summary — the
    // bounded-memory alternative to text_ngram_freq's exact count when
    // the distinct-ngram universe exceeds memory (100 TB corpora). The
    // summary is a native TypedImperativeAggregate (map-side partials,
    // mergeable-summary counter algebra, one shuffle of O(partitions ×
    // capacity) counters). The hash-checked projection is engine-neutral:
    // the exact top-20 (the sketch's quality target) plus the summary's
    // pinned size — min(capacity, observed universe), which any merge
    // order yields. The merge-order-dependent est/err values stay OUT of
    // the checked output; their bound guarantees (est ≥ true ≥ est − err,
    // heavy items always present) are property-tested on a skewed corpus
    // in SpaceSavingTopKSpec, which this corpus — near-uniform bigrams —
    // cannot exercise.
    OpQuery.checked(
      "text_heavy_hitters",
      """WITH words AS (
        |  SELECT doc_id, str_split(trim(text), ' ') AS w FROM documents),
        |bigrams AS (
        |  SELECT unnest(list_transform(range(1, len(w)), i ->
        |    w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1])) AS bigram
        |  FROM words WHERE len(w) > 1),
        |counted AS (
        |  SELECT bigram, count(*) AS n FROM bigrams GROUP BY bigram)
        |SELECT bigram, CAST(n AS BIGINT) AS exact_count,
        |       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, bigram ASC) AS BIGINT) AS rnk,
        |       (SELECT CAST(least(400, count(*)) AS BIGINT) FROM counted) AS n_tracked
        |FROM counted ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin
    ) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      graft.functions.SpaceSavingTopK.register(spark)
      val bigrams = Tables(spark, dir).documents
        .select(split(trim(col("text")), " ").as("w"))
        .filter(size(col("w")) > 1)
        .select(explode(expr("transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))")).as("bigram"))
      // summary size is deterministic (min(capacity, universe)) even
      // though per-item estimates are merge-order-dependent; carrying it
      // into the output keeps the sketch aggregation IN the checked plan
      // instead of letting column pruning drop it
      val sketchSize = bigrams
        .agg(expr("spacesaving_topk(bigram, 400, 400)").as("top"))
        .select(size(col("top")).cast("long").as("n_tracked"))
      val exactTop = bigrams.groupBy("bigram").agg(count(lit(1)).as("exact_count"))
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("exact_count").desc, col("bigram").asc)).cast("long"))
        .filter(col("rnk") <= 20)
      exactTop.crossJoin(broadcast(sketchSize)) // 1-row side
        .select(col("bigram"), col("exact_count"), col("rnk"), col("n_tracked"))
    },

    // ── dedup_minhash_lsh: full MinHash + banded LSH — 16 hash functions
    // → 4 bands of 4 → band-bucket join → estimated Jaccard = fraction of
    // agreeing minhashes. The signature is the PORTABLE md5 construction
    // (graft.functions.MinMd5Multi, one pass per doc), so the band keys,
    // candidate set, and agreement counts are all reproducible in ANSI SQL
    // and the whole op is hash-checked against the oracle (the xxhash64
    // MinHashSig remains the cheaper engine-native option, used by the
    // streaming LSH where no cross-engine check exists).
    OpQuery.checked(
      "dedup_minhash_lsh", {
        val sigList = (1 to 16)
          .map(k => s"list_aggregate(list_transform(shingles, s -> md5('s$k' || s)), 'min')")
          .mkString("[", ", ", "]")
        s"""WITH sh AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text)-7, 1) + 1), i -> substr(text, CAST(i AS INT), 8))) AS shingles
           |  FROM documents),
           |fp AS (SELECT doc_id, $sigList AS sig FROM sh),
           |banded AS (
           |  SELECT doc_id, b,
           |         md5(sig[CAST(b*4+1 AS INT)] || '|' || sig[CAST(b*4+2 AS INT)] || '|' || sig[CAST(b*4+3 AS INT)] || '|' || sig[CAST(b*4+4 AS INT)]) AS bh
           |  FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           |  FROM banded a JOIN banded b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id)
           |SELECT c.a_id, c.b_id,
           |       CAST(len(list_filter(range(1, 17), k -> fa.sig[CAST(k AS INT)] = fb.sig[CAST(k AS INT)])) AS BIGINT) AS n_agree,
           |       CAST(len(list_filter(range(1, 17), k -> fa.sig[CAST(k AS INT)] = fb.sig[CAST(k AS INT)])) AS DOUBLE) / 16 AS est_jaccard
           |FROM cand c JOIN fp fa ON fa.doc_id = c.a_id JOIN fp fb ON fb.doc_id = c.b_id
           |WHERE len(list_filter(range(1, 17), k -> fa.sig[CAST(k AS INT)] = fb.sig[CAST(k AS INT)])) >= 8""".stripMargin
      }
    ) { (spark, dir) =>
      // Signature is one native pass per doc; banding/joins carry only
      // (doc_id, 32-byte band hash) — the text never shuffles. This is the
      // shape that holds at 100 TB: corpus-size work is embarrassingly
      // parallel, shuffle volume is O(docs × bands × 32B).
      val withSig = docBase(spark, dir)
        .select(col("doc_id"), expr("min_md5_multi(shingles, 16)").as("sig"))
        .cache()
      // band hash = md5 of the band's 4 signature slots
      val banded = withSig.select(
        col("doc_id"),
        explode(expr("transform(sequence(0, 3), b -> named_struct('band', b, 'bh', md5(concat_ws('|', slice(sig, b*4+1, 4)))))")).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("band_hash"))
      // skew-guarded shuffle joins on (band, band_hash) / doc_id — all
      // sides are corpus-sized, so no broadcast hints (AQE decides at
      // runtime); BlockedPairs bounds hot LSH buckets (common boilerplate
      // collapses many docs into one band hash).
      val pairs = BlockedPairs
        .pairs(banded, Seq("band", "band_hash"), "doc_id", BlockedPairs.DefaultCap)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .dropDuplicates("a_id", "b_id")
      pairs
        .join(withSig.select(col("doc_id").as("a_id"), col("sig").as("sig_a")), "a_id")
        .join(withSig.select(col("doc_id").as("b_id"), col("sig").as("sig_b")), "b_id")
        .select(
          col("a_id"), col("b_id"),
          expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))").cast("long").as("n_agree"))
        .withColumn("est_jaccard", col("n_agree").cast("double") / 16)
        .filter(col("n_agree") >= 8) // est_jaccard ≥ 0.5, compared in integers
    },

    // ── dedup_simhash: 64-bit SimHash over word tokens + Hamming-distance
    // near-dup pairs, band-blocked on 16-bit slices (a pair within Hamming
    // ≤ 3 of 64 bits must agree exactly on at least one of 4 slices — the
    // blocking is LOSSLESS, so the pair set is fully determined by the
    // simhash values). The token hash is the portable md5-lower-64
    // construction (graft.functions.SimHashMd5 == DuckDB
    // md5_number_lower), so the oracle reproduces the simhashes exactly
    // and verifies the pair set via a direct all-pairs join (feasible at
    // oracle scale; the engine side keeps the sliced blocking).
    OpQuery.checked(
      "dedup_simhash",
      """WITH toks AS (
        |  SELECT doc_id, unnest(str_split_regex(trim(text), '\s+')) AS tok FROM documents),
        |th AS (SELECT doc_id, md5_number_lower(tok) AS h FROM toks),
        |bits AS (
        |  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS c
        |  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bs GROUP BY doc_id, b),
        |sh AS (
        |  SELECT doc_id, sum(CASE WHEN c > 0 THEN CAST(1 AS UBIGINT) << CAST(b AS INT) ELSE CAST(0 AS UBIGINT) END) AS sim
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(bit_count(xor(CAST(a.sim AS UBIGINT), CAST(b.sim AS UBIGINT))) AS BIGINT) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(CAST(a.sim AS UBIGINT), CAST(b.sim AS UBIGINT))) <= 3""".stripMargin
    ) { (spark, dir) =>
      // simhash: per bit, sign of Σ_tokens (bit set ? +1 : -1) — one native
      // pass over the token array.
      val sim = tables(spark, dir).documents.select(
        col("doc_id"),
        expr("simhash64_md5(split(trim(text), '\\\\s+'))").as("simhash"))
      // persisted: BlockedPairs references its input three times (block
      // counts + both join sides), and each reference re-ran the
      // simhash64_md5 tokenize+hash pass over the corpus (4 document
      // scans in the r18 plan audit). The frame is (doc_id, 8-byte
      // simhash) × 4 slices — bytes per document at any scale.
      val sliced = sim.select(
        col("doc_id"), col("simhash"),
        explode(expr("transform(sequence(0, 3), s -> named_struct('slice', s, 'sv', (simhash >> (s * 16)) & 65535))")).as("x"))
        .select(col("doc_id"), col("simhash"), col("x.slice").as("slice"), col("x.sv").as("slice_val"))
        .persist()
      // skew-guarded shuffle join on (slice, slice_val) — both sides
      // corpus-sized, no broadcast hint; BlockedPairs bounds hot slices
      // (near-identical corpora collapse many docs into one 16-bit value).
      BlockedPairs.pairs(sliced, Seq("slice", "slice_val"), "doc_id", BlockedPairs.DefaultCap)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
        .dropDuplicates("a_id", "b_id")
        .filter(col("hamming") <= 3)
    },

    // ── text_collapse_repeats: intra-document repetition REMOVAL — the
    // rewrite counterpart of text_repetition_topngram's signal: runs of
    // consecutive duplicate tokens collapse to one occurrence (the
    // C4/Gopher-family cleanup for stutter artifacts, scraper echo, and
    // generation loops). Scale shape is the best possible: pure
    // codegen'd array arithmetic per row — split → position filter
    // (keep i=1 and every i where ws[i] ≠ ws[i−1]) → rejoin — ZERO
    // shuffles, zero windows, zero explodes; the whole op is one
    // WholeStageCodegen map over the corpus scan, trivially linear at
    // 100 TB.
    OpQuery.checked(
      "text_collapse_repeats",
      """WITH t AS (SELECT doc_id, str_split(trim(text), ' ') AS ws FROM documents),
        |c AS (
        |  SELECT doc_id, ws,
        |         list_concat(
        |           ws[1:1],
        |           list_filter(
        |             list_transform(generate_series(2, len(ws)),
        |               i -> CASE WHEN ws[i] <> ws[i-1] THEN ws[i] END),
        |             x -> x IS NOT NULL)) AS kept
        |  FROM t)
        |SELECT doc_id,
        |       CAST(len(ws) AS BIGINT) AS n_tokens,
        |       CAST(len(kept) AS BIGINT) AS n_kept,
        |       array_to_string(kept, ' ') AS text_clean
        |FROM c""".stripMargin
    ) { (spark, dir) =>
      tables(spark, dir).documents
        .select(col("doc_id"), split(trim(col("text")), " ").as("ws"))
        .select(
          col("doc_id"), col("ws"),
          // size < 2 guard: Spark's sequence(2, 1) DESCENDS instead of
          // being empty (DuckDB's generate_series is empty there)
          expr("""case when size(ws) < 2 then ws else concat(
                 |  slice(ws, 1, 1),
                 |  filter(
                 |    transform(sequence(2, size(ws)),
                 |      i -> case when element_at(ws, i) <> element_at(ws, i - 1)
                 |                then element_at(ws, i) end),
                 |    x -> x is not null)) end""".stripMargin).as("kept"))
        .select(
          col("doc_id"),
          size(col("ws")).cast("long").as("n_tokens"),
          size(col("kept")).cast("long").as("n_kept"),
          array_join(col("kept"), " ").as("text_clean"))
    }
  )
}
