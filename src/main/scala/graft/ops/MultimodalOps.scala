package graft.ops

import graft.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json north-star scope): media
  * payloads ride as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs as partition-local batch functions.
  *
  * The real decode step (image/audio libs) is STUBBED with a deterministic
  * fake — this container has no media codecs — but the Spark-side plumbing
  * (schema, binary columns, per-partition batch processing, feature-vector
  * output shape) is real and tested. At 100 TB the same shape holds: binary
  * payloads stay columnar in parquet, the extractor is a narrow map (no
  * shuffle), and feature vectors are ArrayType columns feeding the
  * similarity ops (SimOps).
  */
object MultimodalOps {

  import org.apache.spark.sql.{Column, DataFrame}

  /** The ONE band-geometry definition every pHash consumer shares —
    * explode a (doc_id, ph) frame into 4 bands of 4 nibbles; any pair
    * within Hamming ≤ 3 shares ≥ 1 intact band by pigeonhole. The
    * detector (multimodal_neardup_phash), the composed media pipeline,
    * and the eval that PINS the guarantee (eval_phash_pr) all call this
    * — a geometry change moves all three together instead of silently
    * leaving the eval validating a geometry nothing ships. */
  private def phashBands(p: DataFrame): DataFrame =
    p.select(col("doc_id"), col("ph"),
        explode(expr("sequence(cast(0 as bigint), cast(3 as bigint))")).as("bi"))
      .withColumn("bv", expr("substring(ph, cast(bi * 4 + 1 as int), 4)"))

  /** Exact 16-nibble Hamming distance between hash columns `pa`/`pb` —
    * the verify the band candidates feed. */
  private def nibbleHamming: Column =
    expr("size(filter(sequence(1, 16), i -> substring(pa, i, 1) != substring(pb, i, 1)))")

  val ops: Seq[OpQuery] = Seq(
    // ── multimodal_meta: binary payload + typed metadata projection —
    // content length, content hash, and the (stubbed) decoded media
    // dimensions derived deterministically from the payload.
    OpQuery.checked(
      "multimodal_meta",
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS content_sha,
        |       CAST(100 + octet_length(CAST(text AS BLOB)) % 800 AS BIGINT) AS decoded_width,
        |       CAST(100 + (octet_length(CAST(text AS BLOB)) * 7) % 600 AS BIGINT) AS decoded_height,
        |       CAST(1 + octet_length(CAST(text AS BLOB)) % 30 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin
    ) { (spark, dir) =>
      val payload = col("text").cast("binary")
      Tables(spark, dir).documents.select(
        col("doc_id"),
        octet_length(payload).cast("long").as("n_bytes"),
        sha2(col("text"), 256).as("content_sha"),
        (lit(100) + octet_length(payload) % 800).cast("long").as("decoded_width"),
        (lit(100) + (octet_length(payload) * 7) % 600).cast("long").as("decoded_height"),
        (lit(1) + octet_length(payload) % 30).cast("long").as("n_frames"))
    },

    // ── multimodal_frame_sample: frame sampling over (stub-)decoded video
    // payloads — every 5th frame index up to the decoded frame count, the
    // standard stride-sampling shape (explode over a bounded sequence;
    // partition-local, no shuffle).
    OpQuery.checked(
      "multimodal_frame_sample",
      """WITH meta AS (
        |  SELECT doc_id, CAST(1 + octet_length(CAST(text AS BLOB)) % 30 AS BIGINT) AS n_frames
        |  FROM documents)
        |SELECT doc_id, n_frames,
        |       CAST(unnest(range(0, n_frames, 5)) AS BIGINT) AS frame_idx
        |FROM meta""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(col("doc_id"),
          (lit(1) + octet_length(col("text").cast("binary")) % 30).cast("long").as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          explode(expr("sequence(cast(0 as bigint), n_frames - 1, cast(5 as bigint))")).as("frame_idx"))
    },

    // ── multimodal_features: per-partition batch feature extraction over
    // binary payloads — the mapPartitions shape a Pandas-UDF/mapInPandas
    // extractor takes. The "model" is a stub (8-bin byte histogram —
    // bin = byte >> 5); the batching, binary input, and per-bin feature
    // output are the real contract. Output is posexploded to one row per
    // (doc_id, bin) so it is flat-typed (harness-sortable) and oracle-
    // checkable: weight = round(count/len, 6) is one IEEE double division
    // of exact integers — bit-identical across engines.
    OpQuery.checked(
      "multimodal_features",
      """WITH b AS (
        |  SELECT doc_id,
        |         octet_length(CAST(text AS BLOB)) AS n,
        |         hex(CAST(text AS BLOB)) AS h
        |  FROM documents),
        |bins AS (
        |  SELECT doc_id, n,
        |         list_transform(range(0, n), i ->
        |           (strpos('0123456789ABCDEF', h[CAST(2*i+1 AS INT):CAST(2*i+1 AS INT)]) - 1) // 2) AS bl
        |  FROM b)
        |SELECT doc_id,
        |       CAST(n AS BIGINT) AS n_bytes,
        |       CAST(bin AS BIGINT) AS bin,
        |       CAST(len(list_filter(bl, x -> x = bin)) AS BIGINT) AS byte_count,
        |       ROUND(CAST(len(list_filter(bl, x -> x = bin)) AS DOUBLE) / greatest(n, 1), 6) AS weight
        |FROM bins CROSS JOIN (SELECT unnest(range(0, 8)) AS bin) bins8""".stripMargin
    ) { (spark, dir) =>
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n_bytes", LongType, nullable = false),
        StructField("hist", ArrayType(LongType, containsNull = false), nullable = false),
        StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      val src = Tables(spark, dir).documents.select(col("doc_id"), col("text").cast("binary").as("payload"))
      src.mapPartitions { rows =>
        // batch-at-a-time extractor: in production this boundary hosts the
        // codec / model call; here a deterministic byte histogram.
        rows.map { r =>
          val id      = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val hist    = new Array[Long](8)
          var i = 0
          while (i < payload.length) { hist((payload(i) & 0xff) >> 5) += 1L; i += 1 }
          val n = math.max(payload.length, 1).toFloat
          Row(id, payload.length.toLong, hist.toSeq, hist.map(_ / n).toSeq)
        }
      }(enc)
        // flatten the feature vector: one (doc_id, bin) row per histogram
        // slot — narrow map over the extractor output, still zero-shuffle.
        .select(col("doc_id"), col("n_bytes"), posexplode(col("hist")).as(Seq("bin", "byte_count")))
        .select(
          col("doc_id"), col("n_bytes"), col("bin").cast("long").as("bin"), col("byte_count"),
          round(col("byte_count").cast("double") / greatest(col("n_bytes"), lit(1L)), 6).as("weight"))
    },

    // ── multimodal_resize: fit the (stub-)decoded image into a 224×224
    // box preserving aspect ratio, and stride-resample the payload to the
    // reduced pixel budget. All geometry is integer arithmetic (BIGINT
    // multiply, floor divide) so the oracle checks it exactly; the byte
    // resample itself runs in the same mapPartitions extractor boundary
    // as multimodal_features (narrow map, no shuffle) and its output
    // length must land exactly on the checked ((n-1)/stride)+1 formula.
    OpQuery.checked(
      "multimodal_resize",
      """WITH meta AS (
        |  SELECT doc_id,
        |         octet_length(CAST(text AS BLOB)) AS n,
        |         100 + octet_length(CAST(text AS BLOB)) % 800 AS w,
        |         100 + (octet_length(CAST(text AS BLOB)) * 7) % 600 AS h
        |  FROM documents),
        |geo AS (
        |  SELECT doc_id, n, w, h,
        |         CASE WHEN w >= h THEN 224 ELSE greatest(1, (w * 224) // h) END AS new_w,
        |         CASE WHEN w >= h THEN greatest(1, (h * 224) // w) ELSE 224 END AS new_h
        |  FROM meta),
        |st AS (
        |  SELECT *, greatest(1, (w * h) // (new_w * new_h)) AS stride FROM geo)
        |SELECT doc_id,
        |       CAST(w AS BIGINT) AS orig_w, CAST(h AS BIGINT) AS orig_h,
        |       CAST(new_w AS BIGINT) AS new_w, CAST(new_h AS BIGINT) AS new_h,
        |       CAST(stride AS BIGINT) AS stride,
        |       CAST((n - 1) // stride + 1 AS BIGINT) AS n_bytes_out
        |FROM st""".stripMargin
    ) { (spark, dir) =>
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("orig_w", LongType, nullable = false),
        StructField("orig_h", LongType, nullable = false),
        StructField("new_w", LongType, nullable = false),
        StructField("new_h", LongType, nullable = false),
        StructField("stride", LongType, nullable = false),
        StructField("resized", BinaryType, nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      val src = Tables(spark, dir).documents.select(col("doc_id"), col("text").cast("binary").as("payload"))
      src.mapPartitions { rows =>
        rows.map { r =>
          val id      = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val n       = payload.length.toLong
          val w       = 100L + n % 800L
          val h       = 100L + (n * 7L) % 600L
          val newW    = if (w >= h) 224L else math.max(1L, w * 224L / h)
          val newH    = if (w >= h) math.max(1L, h * 224L / w) else 224L
          val stride  = math.max(1L, (w * h) / (newW * newH))
          // the actual media op this stubs: decode → scale → re-encode;
          // here a stride byte-resample with the same size contract
          val out = Array.range(0, n.toInt, stride.toInt).map(payload(_))
          Row(id, w, h, newW, newH, stride, out)
        }
      }(enc)
        .select(
          col("doc_id"), col("orig_w"), col("orig_h"), col("new_w"), col("new_h"), col("stride"),
          octet_length(col("resized")).cast("long").as("n_bytes_out"))
    },

    // ── multimodal_dedup: exact binary-content dedup with canonical-copy
    // election and storage accounting — the first thing a media ingest
    // does at 100 TB (re-crawled images/videos are byte-identical far
    // more often than text is). Differs from text dedup_exact in what a
    // pipeline needs from it: the winner is elected by the
    // lexicographically-smallest source|doc_id key — a plain min
    // aggregation, hot-key-safe, no window — and the op reports the
    // bytes reclaimed per content hash,
    // the number dedup dashboards actually track. One map-side-combined
    // aggregation at the content-hash grain; payload bytes never
    // shuffle (the hash and length are computed in the scan projection).
    OpQuery.checked(
      "multimodal_dedup",
      """SELECT sha256(text) AS content_sha,
        |       CAST(min(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes,
        |       CAST(count(*) AS BIGINT) AS n_copies,
        |       min(source || '|' || CAST(doc_id AS VARCHAR)) AS keep_key,
        |       CAST((count(*) - 1) * min(octet_length(CAST(text AS BLOB))) AS BIGINT)
        |         AS bytes_reclaimed
        |FROM documents GROUP BY 1""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(
          sha2(col("text"), 256).as("content_sha"),
          octet_length(col("text").cast("binary")).cast("long").as("nb"),
          // concat, NOT concat_ws: the oracle's `||` null-propagates, and
          // concat_ws would silently DROP a null source/doc_id, electing
          // a different canonical copy than DuckDB on nullable inputs
          concat(col("source"), lit("|"), col("doc_id").cast("string")).as("kk"))
        .groupBy("content_sha")
        .agg(
          min(col("nb")).as("n_bytes"),
          count(lit(1)).as("n_copies"),
          min(col("kk")).as("keep_key"))
        .select(col("content_sha"), col("n_bytes"), col("n_copies"), col("keep_key"),
          ((col("n_copies") - 1) * col("n_bytes")).as("bytes_reclaimed"))
    },

    // ── multimodal_neardup_phash: NEAR-duplicate media detection by
    // banded perceptual-hash join — multimodal_dedup's sibling for
    // re-encoded/resized copies that are not byte-identical. The
    // 16-nibble pHash here is a deterministic STUB over the payload
    // bytes (the real DCT perceptual hash needs the codec libs this
    // container lacks — the multimodal decode contract); the Spark-side
    // plumbing is the real thing: band the hash into 4×4 nibbles, join
    // candidates on band equality (any pair within Hamming ≤ 3 shares
    // ≥ 1 intact band by pigeonhole — the dedup_simhash guarantee),
    // verify exact nibble-Hamming on candidates only. The output is the
    // full CANDIDATE audit — every band-colliding pair with its exact
    // Hamming distance and the ≤ 3 verdict — because that is what a
    // dedup pipeline actually persists (the verdict threshold is a
    // downstream policy knob, and the candidate:accept ratio is the
    // tuning signal for the band geometry). Scale shape: the join key
    // is (band idx, 4 nibbles) — 16 bits × 4 bands of buckets,
    // candidate cost ∝ bucket collisions, never all-pairs; payload
    // bytes never shuffle (only the 16-char hash rides the exchange).
    OpQuery.checked(
      "multimodal_neardup_phash",
      """WITH p AS (SELECT doc_id, substr(md5(text), 1, 16) AS ph FROM documents),
        |b AS (SELECT doc_id, ph, CAST(unnest(range(0, 4)) AS BIGINT) AS bi FROM p),
        |bb AS (SELECT doc_id, ph, bi,
        |              substr(ph, CAST(bi * 4 + 1 AS INT), 4) AS bv FROM b),
        |pr AS (SELECT DISTINCT a.doc_id AS doc_a, a.ph AS pa,
        |                       c.doc_id AS doc_b, c.ph AS pb
        |       FROM bb a JOIN bb c
        |         ON a.bi = c.bi AND a.bv = c.bv AND a.doc_id < c.doc_id),
        |h AS (SELECT doc_a, doc_b,
        |             CAST(len(list_filter(range(1, 17),
        |               i -> substr(pa, CAST(i AS INT), 1) <> substr(pb, CAST(i AS INT), 1)))
        |               AS BIGINT) AS hamming
        |      FROM pr)
        |SELECT doc_a, doc_b, hamming, hamming <= 3 AS is_neardup FROM h""".stripMargin
    ) { (spark, dir) =>
      val p = Tables(spark, dir).documents
        .select(col("doc_id"), substring(md5(col("text")), 1, 16).as("ph"))
      val bands = phashBands(p)
      val pairs = bands.toDF("doc_a", "pa", "bi", "bv")
        .join(bands.toDF("doc_b", "pb", "bi", "bv"), Seq("bi", "bv"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("pa"), col("doc_b"), col("pb"))
        .distinct()
      pairs
        .withColumn("hamming", nibbleHamming.cast("long"))
        .select(col("doc_a"), col("doc_b"), col("hamming"),
          (col("hamming") <= 3).as("is_neardup"))
    },

    // ── multimodal_shard_pack: pack media payloads into ~16 KiB shards
    // by CONTIGUOUS byte offsets — the webdataset/tar-shard layout step
    // every multimodal training pipeline runs before the data loader
    // (samples must land in few, sequential-read shards; shard id must
    // be reproducible). Greedy bin packing is inherently sequential, so
    // the scalable form is offset packing: fix a deterministic total
    // order (doc_id), take each payload's exact global running byte
    // offset from GlobalRank.withPrefixSum — the TeraSort-shaped
    // exclusive prefix sum, NO partition-less window over the corpus —
    // and shard_id = offset div target (a shard may overhang by less
    // than one payload, the standard contract). All-BIGINT ⇒ hash-exact.
    OpQuery.checked(
      "multimodal_shard_pack",
      """WITH p AS (
        |  SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_bytes,
        |         CAST(coalesce(sum(n_bytes) OVER (ORDER BY doc_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |           AS byte_offset
        |  FROM p)
        |SELECT doc_id, n_bytes, byte_offset,
        |       byte_offset // 16384 AS shard_id,
        |       byte_offset % 16384 AS offset_in_shard
        |FROM c""".stripMargin
    ) { (spark, dir) =>
      val p = Tables(spark, dir).documents
        .select(col("doc_id"),
          octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      graft.algo.GlobalRank
        .withPrefixSum(p, Seq(col("doc_id").asc), col("n_bytes"), "byte_offset")
        .select(col("doc_id"), col("n_bytes"), col("byte_offset"),
          expr("byte_offset div 16384").as("shard_id"),
          pmod(col("byte_offset"), lit(16384L)).as("offset_in_shard"))
    },

    // ── eval_phash_pr: precision/recall of multimodal_neardup_phash's
    // BANDED candidate generation against exact nibble-Hamming ground
    // truth — the media row of the eval family (text: eval_dedup_pr,
    // retrieval: eval_retrieval_recall_*). Ground truth is inherently
    // quadratic, so the eval runs on the eval_dedup_pr posture: a
    // HARD-CAPPED deterministic sample (top-500 docs by (md5(doc_id),
    // doc_id) — a GlobalLimit in the plan, 500² pairs CONSTANT at any
    // corpus size). Gold = capped pairs with exact 16-nibble Hamming
    // ≤ 3; predicted = the detector's band-collision candidates (4×4
    // nibbles) restricted to the sample, BEFORE its Hamming verify —
    // so recall measures the pigeonhole guarantee (Hamming ≤ 3 leaves
    // ≥ 1 of 4 bands intact ⇒ recall must read 1.0; a future band-
    // geometry change that breaks the guarantee hash-fails here), and
    // precision is the candidate:accept ratio, THE tuning signal for
    // the band geometry. Ratios are single integer divisions; degenerate
    // denominators go NULL identically in both engines.
    OpQuery.checked(
      "eval_phash_pr",
      """WITH capd AS (
        |  SELECT doc_id, substr(md5(text), 1, 16) AS ph FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 500),
        |gold AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM capd a JOIN capd b ON a.doc_id < b.doc_id
        |  WHERE len(list_filter(range(1, 17),
        |          i -> substr(a.ph, CAST(i AS INT), 1) <> substr(b.ph, CAST(i AS INT), 1))) <= 3),
        |bb AS (
        |  SELECT doc_id, substr(ph, CAST(bi * 4 + 1 AS INT), 4) AS bv, bi
        |  FROM capd CROSS JOIN (SELECT unnest(range(0, 4)) AS bi) bs),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, c.doc_id AS b_id
        |  FROM bb a JOIN bb c ON a.bi = c.bi AND a.bv = c.bv AND a.doc_id < c.doc_id),
        |m AS (
        |  SELECT CAST((SELECT count(*) FROM gold) AS BIGINT) AS n_gold,
        |         CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
        |         CAST((SELECT count(*) FROM gold g JOIN cand c
        |               ON g.a_id = c.a_id AND g.b_id = c.b_id) AS BIGINT) AS tp)
        |SELECT CAST((SELECT count(*) FROM capd) AS BIGINT) AS n_docs,
        |       n_gold, n_cand, tp,
        |       CAST(tp AS DOUBLE) / nullif(n_cand, 0) AS precision_,
        |       CAST(tp AS DOUBLE) / nullif(n_gold, 0) AS recall_,
        |       CAST(2 * tp AS DOUBLE) / nullif(n_cand + n_gold, 0) AS f1
        |FROM m""".stripMargin
    ) { (spark, dir) =>
      // repartition after the cap (the eval_dedup_pr lesson): LIMIT
      // leaves the 500 rows on ONE partition and the all-pairs gold
      // verify would run single-task; spreading the left side
      // parallelizes the nested-loop probe
      val capd = Tables(spark, dir).documents
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id")).limit(500)
        .select(col("doc_id"), substring(md5(col("text")), 1, 16).as("ph"))
        .repartition(col("doc_id"))
        .cache()
      val gold = capd.toDF("a_id", "pa")
        .join(broadcast(capd.toDF("b_id", "pb")), col("a_id") < col("b_id"))
        .filter(nibbleHamming <= 3)
        .select(col("a_id"), col("b_id"))
      val bands = phashBands(capd).select("doc_id", "bi", "bv")
      val cand = bands.toDF("a_id", "bi", "bv")
        .join(bands.toDF("b_id", "bi", "bv"), Seq("bi", "bv"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      val m = gold.agg(count(lit(1)).as("n_gold"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(gold.join(cand, Seq("a_id", "b_id")).agg(count(lit(1)).as("tp")))
        .crossJoin(capd.agg(count(lit(1)).as("n_docs")))
      m.select(col("n_docs"), col("n_gold"), col("n_cand"), col("tp"),
        (col("tp").cast("double") / when(col("n_cand") =!= 0, col("n_cand"))).as("precision_"),
        (col("tp").cast("double") / when(col("n_gold") =!= 0, col("n_gold"))).as("recall_"),
        ((col("tp") * 2).cast("double")
          / when(col("n_cand") + col("n_gold") =!= 0, col("n_cand") + col("n_gold"))).as("f1"))
    },

    // ── pipeline_media_v1: the COMPOSED media-ingest pipeline — the
    // multimodal sibling of pipeline_pretrain_v2, applying its lessons
    // from the start (one-pass flag-join funnel, no per-stage crossed
    // aggregates; budget ≤ 5 s). Four stages, each the semantics of its
    // standalone op restricted to the surviving set:
    //   1 decode_gate     keep payloads ≥ 50 bytes — the decode
    //                     CONTRACT's validity floor (a payload below
    //                     the magic-bytes + header size cannot decode;
    //                     the real codec check is stubbed, the gate
    //                     shape is real)
    //   2 dedup_exact     canonical-copy election per content sha
    //                     (multimodal_dedup's min(source|doc_id) key):
    //                     only the elected copy survives
    //   3 neardup_phash   banded perceptual-hash join among survivors
    //                     (multimodal_neardup_phash's 4×4-nibble bands,
    //                     Hamming ≤ 3 verify): the LARGER doc_id of a
    //                     verified pair drops — deterministic, and the
    //                     smaller id is stage 2's election order too
    //   4 shard_pack      pack survivors into ~16 KiB shards by exact
    //                     global byte offset (multimodal_shard_pack's
    //                     TeraSort-shaped prefix sum — no partition-less
    //                     window over the corpus)
    // Output = the 4-row funnel (docs_in/kept/dropped, bytes_kept,
    // n_shards); PipelineMediaSpec pins the chain/conservation
    // identities. Scale shape: payload bytes never shuffle (hashes and
    // lengths computed in the scan projection ride the exchanges);
    // survivor sets persist at doc_id grain; the banded join's key is
    // (band idx, 4 nibbles) — candidate cost ∝ bucket collisions, never
    // all-pairs; the funnel is ONE flag-join aggregate pass.
    OpQuery.checked(
      "pipeline_media_v1",
      """WITH p AS (
        |  SELECT doc_id,
        |         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |         substr(md5(text), 1, 16) AS ph,
        |         sha256(text) AS sha,
        |         source || '|' || CAST(doc_id AS VARCHAR) AS kk
        |  FROM documents),
        |k1 AS (SELECT doc_id FROM p WHERE n_bytes >= 50),
        |w2 AS (SELECT p.* FROM p JOIN k1 USING (doc_id)),
        |c2 AS (SELECT sha, min(kk) AS keep FROM w2 GROUP BY 1),
        |k2 AS (SELECT w2.doc_id FROM w2 JOIN c2 ON c2.sha = w2.sha AND c2.keep = w2.kk),
        |b3 AS (
        |  SELECT s.doc_id, s.ph, s.bi,
        |         substr(s.ph, CAST(s.bi * 4 + 1 AS INT), 4) AS bv
        |  FROM (SELECT w2.doc_id, w2.ph, CAST(unnest(range(0, 4)) AS BIGINT) AS bi
        |        FROM w2 JOIN k2 USING (doc_id)) s),
        |pr3 AS (SELECT DISTINCT a.doc_id AS da, a.ph AS pa, c.doc_id AS db, c.ph AS pb
        |        FROM b3 a JOIN b3 c ON a.bi = c.bi AND a.bv = c.bv AND a.doc_id < c.doc_id),
        |drop3 AS (
        |  SELECT DISTINCT db AS doc_id FROM pr3
        |  WHERE len(list_filter(range(1, 17),
        |          i -> substr(pa, CAST(i AS INT), 1) <> substr(pb, CAST(i AS INT), 1))) <= 3),
        |k3 AS (SELECT k2.doc_id FROM k2 LEFT JOIN drop3 USING (doc_id)
        |       WHERE drop3.doc_id IS NULL),
        |c4 AS (
        |  SELECT p.doc_id, p.n_bytes,
        |         CAST(coalesce(sum(p.n_bytes) OVER (ORDER BY p.doc_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |  FROM p JOIN k3 USING (doc_id)),
        |shards AS (SELECT DISTINCT off // 16384 AS shard FROM c4)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_id, 'decode_gate' AS stage,
        |         CAST((SELECT count(*) FROM p) AS BIGINT) AS docs_in,
        |         CAST((SELECT count(*) FROM k1) AS BIGINT) AS docs_kept,
        |         CAST((SELECT count(*) FROM p) - (SELECT count(*) FROM k1) AS BIGINT) AS docs_dropped,
        |         CAST((SELECT COALESCE(sum(p.n_bytes), 0) FROM p JOIN k1 USING (doc_id)) AS BIGINT) AS bytes_kept,
        |         CAST(NULL AS BIGINT) AS n_shards
        |  UNION ALL
        |  SELECT 2, 'dedup_exact',
        |         (SELECT count(*) FROM k1), (SELECT count(*) FROM k2),
        |         (SELECT count(*) FROM k1) - (SELECT count(*) FROM k2),
        |         CAST((SELECT COALESCE(sum(p.n_bytes), 0) FROM p JOIN k2 USING (doc_id)) AS BIGINT), NULL
        |  UNION ALL
        |  SELECT 3, 'neardup_phash',
        |         (SELECT count(*) FROM k2), (SELECT count(*) FROM k3),
        |         (SELECT count(*) FROM k2) - (SELECT count(*) FROM k3),
        |         CAST((SELECT COALESCE(sum(p.n_bytes), 0) FROM p JOIN k3 USING (doc_id)) AS BIGINT), NULL
        |  UNION ALL
        |  SELECT 4, 'shard_pack',
        |         (SELECT count(*) FROM k3), (SELECT count(*) FROM k3),
        |         0,
        |         CAST((SELECT COALESCE(sum(p.n_bytes), 0) FROM p JOIN k3 USING (doc_id)) AS BIGINT),
        |         (SELECT count(*) FROM shards))""".stripMargin
    ) { (spark, dir) =>
      import org.apache.spark.sql.DataFrame
      // one scan projection computes every hash/length the stages need;
      // persisted at (doc_id, small-fixed-width) grain — payload bytes
      // are read once and never shuffle
      val p = Tables(spark, dir).documents
        .select(col("doc_id"),
          octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
          substring(md5(col("text")), 1, 16).as("ph"),
          sha2(col("text"), 256).as("sha"),
          // concat, not concat_ws: null source must null-propagate like
          // the oracle's || (multimodal_dedup's election contract)
          concat(col("source"), lit("|"), col("doc_id").cast("string")).as("kk"))
        .persist()
      val k1 = p.filter(col("n_bytes") >= 50).select("doc_id").persist()
      val w2 = p.join(k1, Seq("doc_id"))
      val c2 = w2.groupBy("sha").agg(min(col("kk")).as("keep"))
      val k2 = w2.join(c2, w2("sha") === c2("sha") && w2("kk") === c2("keep"))
        .select(w2("doc_id")).persist()
      val b3 = phashBands(w2.join(k2, Seq("doc_id")).select("doc_id", "ph"))
      val drop3 = b3.toDF("da", "pa", "bi", "bv")
        .join(b3.toDF("db", "pb", "bi", "bv"), Seq("bi", "bv"))
        .filter(col("da") < col("db"))
        .select("da", "pa", "db", "pb").distinct()
        .filter(nibbleHamming <= 3)
        .select(col("db").as("doc_id")).distinct()
      val k3 = k2.join(drop3, Seq("doc_id"), "left_anti").persist()
      val packed = graft.algo.GlobalRank.withPrefixSum(
        p.join(k3, Seq("doc_id")).select("doc_id", "n_bytes"),
        Seq(col("doc_id").asc), col("n_bytes"), "byte_offset")
      val shards = packed.select(expr("byte_offset div 16384").as("shard")).distinct()
      // the funnel: the v2 lesson applied from day one — one flag-join
      // aggregate pass, 4 rows exploded from the single result row
      def flag(df: DataFrame, as: String) = df.withColumn(as, lit(1L))
      val flags = p.select(col("doc_id"), col("n_bytes"))
        .join(flag(k1, "f1"), Seq("doc_id"), "left_outer")
        .join(flag(k2, "f2"), Seq("doc_id"), "left_outer")
        .join(flag(k3, "f3"), Seq("doc_id"), "left_outer")
        .select(col("n_bytes").as("nb") +:
          (1 to 3).map(i => coalesce(col(s"f$i"), lit(0L)).as(s"f$i")): _*)
      val statExprs = count(lit(1)).as("n0") +: (1 to 3).flatMap(i => Seq(
        coalesce(sum(col(s"f$i")), lit(0L)).as(s"n$i"),
        coalesce(sum(col(s"f$i") * col("nb")), lit(0L)).as(s"b$i")))
      val row = flags.agg(statExprs.head, statExprs.tail: _*)
        .crossJoin(broadcast(shards.agg(count(lit(1)).cast("long").as("ns"))))
      val names = Seq("decode_gate", "dedup_exact", "neardup_phash")
      val stageRows = names.zipWithIndex.map { case (nm, ix) =>
        val i = ix + 1
        struct(lit(i.toLong).as("stage_id"), lit(nm).as("stage"),
          col(s"n${i - 1}").as("docs_in"), col(s"n$i").as("docs_kept"),
          (col(s"n${i - 1}") - col(s"n$i")).as("docs_dropped"),
          col(s"b$i").as("bytes_kept"),
          lit(null).cast("long").as("n_shards"))
      } :+ struct(lit(4L).as("stage_id"), lit("shard_pack").as("stage"),
        col("n3").as("docs_in"), col("n3").as("docs_kept"),
        lit(0L).as("docs_dropped"), col("b3").as("bytes_kept"),
        col("ns").as("n_shards"))
      row.select(explode(array(stageRows: _*)).as("r")).select("r.*")
    }
  )
}
