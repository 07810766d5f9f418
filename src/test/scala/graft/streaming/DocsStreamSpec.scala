package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class DocsStreamSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again until done"

  private def corpus = Seq(
    (0L, base, "en", "s", base.length.toLong),
    (1L, base, "en", "s", base.length.toLong),                  // exact dup of 0
    (2L, base.replace("lazy", "late"), "en", "s", 70L),          // near dup of 0/1
    (3L, "completely different content about spark query engines and shuffles", "en", "s", 68L),
    (4L, "another unrelated short text entirely", "en", "s", 38L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  /** With ProcessingTimeTimeout the stateful operator always schedules a
    * future timeout batch, so the stream never quiesces and
    * processAllAvailable would block forever — await the condition with a
    * deadline instead. All input files exist before start, so the file
    * source packs them into one micro-batch: once any row is visible,
    * the whole delivery has committed. */
  private def awaitUntil(what: String, timeoutMs: Long = 120000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (!cond && System.currentTimeMillis < deadline) Thread.sleep(200)
    assert(cond, s"not observed within ${timeoutMs}ms: $what")
  }

  test("streaming near-dup emits the same pairs as the batch LSH on the same corpus") {
    val staged = java.nio.file.Files.createTempDirectory("graft_docs_stream").toString
    corpus.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)

    val q = DocsStream.start(spark, staged, "neardup_test")
    try {
      awaitUntil("exact-dup pair (0,1) with 16/16 agreement") {
        spark.table("neardup_test")
          .filter(col("a_id") === 0L && col("b_id") === 1L && col("n_agree") === 16)
          .limit(1).count() == 1
      }
      val streamed = spark.table("neardup_test")
        .select("a_id", "b_id").distinct().as[(Long, Long)].collect().toSet
      assert(streamed.contains((0L, 1L))) // exact dup agrees on all 16 hashes
      // no pair among the unrelated docs
      assert(streamed.subsetOf(Set((0L, 1L), (0L, 2L), (1L, 2L))))
    } finally q.stop()
  }

  test("band state stays bounded: re-delivering the corpus emits no self-pairs and respects the cap") {
    val staged = java.nio.file.Files.createTempDirectory("graft_docs_stream2").toString
    corpus.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    corpus.coalesce(1).write.mode(SaveMode.Append).parquet(staged) // re-delivery

    val q = DocsStream.start(spark, staged, "neardup_redeliver")
    try {
      awaitUntil("re-delivered corpus emits pairs") {
        spark.table("neardup_redeliver").limit(1).count() == 1
      }
      val pairs = spark.table("neardup_redeliver").select("a_id", "b_id").as[(Long, Long)].collect()
      assert(pairs.forall { case (a, b) => a < b }) // never a self-pair, ordered ids
    } finally q.stop()
  }

  test("streaming decontamination drops exactly the docs sharing benchmark 8-grams") {
    graft.functions.BloomFilter.register(spark)
    // benchmark = doc 0's gram set; doc 1 (exact dup) shares every gram,
    // while doc 2's one changed word sits inside ALL of its 8-grams
    // (14-word text ⇒ every gram spans word 8), so 2 is clean at 8-gram
    // granularity — the n-gram decontamination contract exactly
    val bench = corpus.filter(col("doc_id") === 0L)
      .select(explode(expr("array_distinct(transform(" +
        "sequence(1, greatest(size(split(text, ' ')) - 7, 1)), " +
        "i -> md5(concat_ws(' ', slice(split(text, ' '), i, 8)))))")).as("gh"))
    val bloom = bench.agg(expr("bloom_build(gh, 131072, 5)")).head().getAs[Array[Byte]](0)

    val staged = java.nio.file.Files.createTempDirectory("graft_docs_decon").toString
    corpus.filter(col("doc_id") > 0L).coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val src = spark.readStream.schema(DocsStream.docSchema).parquet(staged)
    val q = DocsStream.decontaminate(src, bloom, 5)
      .writeStream.outputMode("append").format("memory").queryName("decon_test").start()
    try {
      q.processAllAvailable() // stateless filter: the stream quiesces normally
      val kept = spark.table("decon_test").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(2L, 3L, 4L),
        s"expected contaminated doc 1 dropped and clean 2,3,4 kept, got $kept")
    } finally q.stop()
  }

  test("replay equivalence on real input files: streamed decontamination == batch") {
    graft.functions.BloomFilter.register(spark)
    // the bitset the oracle-checked op (text_contamination_bloom) builds:
    // benchmark = the hash-bucketed 5% of documents, 8-gram md5 universe
    val docsPath = s"$sf0001/documents.parquet"
    val batchDocs = spark.read.parquet(docsPath)
    val grams = batchDocs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, greatest(size(ws) - 7, 1)), i -> concat_ws(' ', slice(ws, i, 8))))"
      )).as("gr"))
      .select(col("doc_id"), md5(col("gr")).as("gh"))
    val bloom = grams.filter(graft.Norm.hashBucket(col("doc_id"), 100) < 5)
      .select("gh").distinct()
      .agg(expr("bloom_build(gh, 1048576, 5)")).head().getAs[Array[Byte]](0)

    // the SAME transform driven by the streaming and the batch reader
    // over the SAME files must keep the same documents (byte-copied into
    // a directory: the streaming file source wants a dir, not one file)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_decon_replay")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(docsPath), streamDir.resolve("documents.parquet"))
    val src = spark.readStream.schema(DocsStream.docSchema).parquet(streamDir.toString)
    val q = DocsStream.decontaminate(src, bloom, 5)
      .writeStream.outputMode("append").format("memory").queryName("decon_replay").start()
    try {
      q.processAllAvailable()
      val streamKept = spark.table("decon_replay").select("doc_id").as[Long].collect().toSet
      val batchKept = DocsStream.decontaminate(batchDocs, bloom, 5)
        .select("doc_id").as[Long].collect().toSet
      assert(streamKept == batchKept, "stream and batch keep sets diverged on identical input")
      // and the oracle-checked batch op's contaminated docs are all gone:
      // the Bloom has no false negatives, so nothing flagged survives
      val contaminated = graft.SparkEntry.queries("text_contamination_bloom")(spark, sf0001)
        .select("doc_id").as[Long].collect().toSet
      assert(contaminated.nonEmpty, "fixture should flag at least one contaminated doc")
      assert(streamKept.intersect(contaminated).isEmpty,
        s"contaminated docs survived decontamination: ${streamKept.intersect(contaminated)}")
    } finally q.stop()
  }

  test("incremental shard packing reproduces the batch per-source prefix-sum packing") {
    // two sources interleaved across two deliveries: chains must pack in
    // parallel per source, and each source's running offset must carry
    // across the micro-batch boundary through the state store
    def doc(id: Long, src: String, len: Int) =
      (id, "x" * len, "en", src, len.toLong)
    val wave1 = Seq(doc(0, "a", 9000), doc(1, "b", 5000), doc(2, "a", 9000), doc(3, "b", 4000))
    val wave2 = Seq(doc(4, "a", 2000), doc(5, "b", 9000), doc(6, "a", 500))
    val staged = java.nio.file.Files.createTempDirectory("graft_shard_pack").toString

    wave1.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q = DocsStream.startShardPack(spark, staged, "shard_pack_test")
    try {
      q.processAllAvailable()
      wave2.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode(SaveMode.Append).parquet(staged)
      q.processAllAvailable()

      val got = spark.table("shard_pack_test")
        .select("source", "doc_id", "n_bytes", "byte_offset", "shard_id", "offset_in_shard")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet

      // sequential reference: per-source prefix sums in delivery order
      // (= doc_id order here) — exactly the batch op's per-source form
      val want = (wave1 ++ wave2).groupBy(_._4).flatMap { case (src, docs) =>
        var off = 0L
        docs.sortBy(_._1).map { case (id, text, _, _, _) =>
          val nb = text.getBytes("UTF-8").length.toLong
          val o = off; off += nb
          (src, id, nb, o, o / DocsStream.ShardBytes, o % DocsStream.ShardBytes)
        }
      }.toSet
      assert(got == want, s"packing diverged:\n got=$got\nwant=$want")
      // the cross-batch carry actually happened: doc 4 ("a", third in its
      // chain) starts at 18000, inside shard 1 — not back at offset 0
      assert(got.contains(("a", 4L, 2000L, 18000L, 1L, 1616L)))
    } finally q.stop()
  }

  test("shard packing survives a kill-and-restart from its checkpoint") {
    // the running per-source offset lives in the state store; killing
    // the query between waves and restarting from the same checkpoint
    // must CONTINUE each source's byte chain — a fresh state store
    // would restart every source at offset 0 and the packing would
    // collide with wave 1's shards
    def doc(id: Long, src: String, len: Int) = (id, "x" * len, "en", src, len.toLong)
    val wave1 = Seq(doc(0, "a", 9000), doc(1, "b", 5000), doc(2, "a", 9000))
    val wave2 = Seq(doc(3, "a", 2000), doc(4, "b", 9000))
    val staged = java.nio.file.Files.createTempDirectory("graft_pack_crash_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_pack_crash_out").toString + "/u"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pack_crash_ck").toString + "/c"

    wave1.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q1 = DocsStream.startShardPackToDir(spark, staged, outDir, ckpt,
      maxFilesPerTrigger = Some(1))
    try q1.processAllAvailable() finally q1.stop()
    val phase1MaxBatch = spark.read.parquet(outDir)
      .agg(max(col("batch_id"))).head().getLong(0)

    wave2.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Append).parquet(staged)
    val q2 = DocsStream.startShardPackToDir(spark, staged, outDir, ckpt,
      maxFilesPerTrigger = Some(1))
    try q2.processAllAvailable() finally q2.stop()

    // a replayed batch recomputes identical rows — dedupe by key and
    // assert the packing values never conflict across revisions
    val rows = spark.read.parquet(outDir)
      .select("source", "doc_id", "n_bytes", "byte_offset", "shard_id",
        "offset_in_shard", "batch_id")
      .collect()
    val byKey = rows.groupBy(r => (r.getString(0), r.getLong(1)))
    byKey.foreach { case (k, rs) =>
      assert(rs.map(r => (r.getLong(3), r.getLong(4), r.getLong(5))).distinct.length == 1,
        s"conflicting packing revisions for $k")
    }
    val got = byKey.map { case ((s, id), rs) =>
      (s, id, rs.head.getLong(2), rs.head.getLong(3), rs.head.getLong(4), rs.head.getLong(5))
    }.toSet
    val want = (wave1 ++ wave2).groupBy(_._4).flatMap { case (src, docs) =>
      var off = 0L
      docs.sortBy(_._1).map { case (id, text, _, _, _) =>
        val nb = text.getBytes("UTF-8").length.toLong
        val o = off; off += nb
        (src, id, nb, o, o / DocsStream.ShardBytes, o % DocsStream.ShardBytes)
      }
    }.toSet
    assert(got == want, s"packing diverged after restart:\n got=$got\nwant=$want")
    // non-vacuity: new batches ran after the restart, and the restarted
    // chains continued — source a's wave-2 doc starts at 18000 (inside
    // shard 1), source b's at 5000, neither back at 0: direct evidence
    // the reloaded state store, not a fresh one, produced the offsets
    val maxBatch = rows.map(_.getLong(6)).max
    assert(maxBatch > phase1MaxBatch, "restart produced no new batches")
    assert(got.contains(("a", 3L, 2000L, 18000L, 1L, 1616L)))
    assert(got.contains(("b", 4L, 9000L, 5000L, 0L, 5000L)))
  }
}
