package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Streaming near-duplicate detection — the ingest-side counterpart of the
  * batch `dedup_minhash_lsh` operator: as documents arrive, each is
  * fingerprinted once (native `minhash_sig`), banded, and compared ONLY
  * against the documents already seen in its LSH band. Candidate pairs
  * surface immediately instead of waiting for a batch re-scan of the
  * corpus.
  *
  * Scale shape: state is keyed by (band, band_hash) — the stream shuffles
  * 16-byte band keys, never text — and each band's state is a bounded
  * FIFO of recent (doc_id, signature) entries (`MaxPerBand`). Per-key
  * size alone does not bound TOTAL state: distinct content keeps minting
  * new band keys forever, so idle band buckets are expired with a
  * processing-time timeout (`IdleTimeoutMs`) — total state is
  * O(bands touched in the recency window × MaxPerBand × 16 longs) on an
  * unbounded stream. Near dups overwhelmingly collide while close
  * together in ingest order (re-crawls, mirrored posts), which is what a
  * bounded recency window catches; the periodic batch pass remains the
  * completeness backstop.
  */
object DocsStream {

  val NumBands = 4
  val RowsPerBand = 4
  val MaxPerBand = 64
  val MinAgree = 8 // of 16 minhashes ⇒ est. Jaccard ≥ 0.5
  val IdleTimeoutMs: Long = 10 * 60 * 1000L // expire band buckets idle this long

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  final case class BandedDoc(band: Int, band_hash: Long, doc_id: Long, sig: Seq[Long])
  final case class DocSig(doc_id: Long, sig: Seq[Long])
  final case class BandState(docs: List[DocSig])
  final case class NearDupPair(a_id: Long, b_id: Long, band: Int, n_agree: Int)

  /** Fingerprint + band a (streaming or batch) documents frame. */
  def banded(docs: DataFrame): Dataset[BandedDoc] = {
    val spark = docs.sparkSession
    graft.functions.TextExprs.register(spark)
    import spark.implicits._
    docs
      .select(col("doc_id"),
        expr("minhash_sig(array_distinct(transform(sequence(1, greatest(char_length(text) - 7, 1)), i -> substr(text, i, 8))))")
          .as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(expr(s"transform(sequence(0, ${NumBands - 1}), b -> named_struct(" +
          s"'band', b, 'bh', xxhash64(sig[b*$RowsPerBand], sig[b*$RowsPerBand+1], sig[b*$RowsPerBand+2], sig[b*$RowsPerBand+3])))")).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bh").as("band_hash"), col("doc_id"), col("sig"))
      .as[BandedDoc]
  }

  /** Ingest-side benchmark decontamination: drop arriving documents that
    * share any word 8-gram with the benchmark Bloom bitset (built once,
    * batch-side, by `bloom_build` — see text_contamination_bloom). The
    * filter is STATELESS: the bitset rides along as a literal inside
    * whole-stage codegen, so the probe costs no state store, no
    * watermark, and no shuffle — the shape that keeps a firehose
    * ingest path at scan speed. Bloom false positives (at the sized FP
    * rate) drop a clean doc; false negatives never happen, so nothing
    * contaminated slips through — the right asymmetry for training
    * corpora, where benchmark leakage costs more than a lost document.
    */
  def decontaminate(docs: DataFrame, bloom: Array[Byte], numHashes: Int): DataFrame = {
    graft.functions.BloomFilter.register(docs.sparkSession)
    // same gram shape as the batch ops (text_contamination*)
    val grams = expr("array_distinct(transform(" +
      "sequence(1, greatest(size(split(text, ' ')) - 7, 1)), " +
      "i -> concat_ws(' ', slice(split(text, ' '), i, 8))))")
    docs.filter(!exists(grams,
      gram => call_function("bloom_contains", lit(bloom), md5(gram), lit(numHashes))))
  }

  /** Stateful pair emission: compare each arriving doc against the band's
    * recent members, emit pairs agreeing on ≥ MinAgree of 16 minhashes. */
  def nearDupPairs(docs: Dataset[BandedDoc]): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => (d.band, d.band_hash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (key: (Int, Long), in: Iterator[BandedDoc], state: GroupState[BandState]) => {
          if (state.hasTimedOut) {
            // band bucket saw no arrivals for IdleTimeoutMs — drop it so
            // total state stays bounded by the active-band working set
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.map(_.docs).getOrElse(Nil)
            val out  = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
            // deterministic processing order within the micro-batch
            in.toArray.sortBy(_.doc_id).foreach { d =>
              seen.foreach { s =>
                if (s.doc_id != d.doc_id) {
                  var agree = 0
                  var i = 0
                  while (i < s.sig.length) { if (s.sig(i) == d.sig(i)) agree += 1; i += 1 }
                  if (agree >= MinAgree)
                    out += NearDupPair(math.min(s.doc_id, d.doc_id), math.max(s.doc_id, d.doc_id), key._1, agree)
                }
              }
              seen = (DocSig(d.doc_id, d.sig) :: seen).take(MaxPerBand) // FIFO recency window
            }
            state.update(BandState(seen))
            state.setTimeoutDuration(IdleTimeoutMs)
            out.iterator
          }
        })
  }

  /** Start the near-dup stream from a parquet directory into a memory
    * sink. A pair colliding in several bands is emitted once per band —
    * consumers dedupe on (a_id, b_id) (stacking a second stateful
    * dropDuplicates on the stream would double the state for a purely
    * cosmetic gain). */
  def start(spark: SparkSession, sourceDir: String, queryName: String): StreamingQuery = {
    val src = spark.readStream.schema(docSchema).parquet(sourceDir)
    nearDupPairs(banded(src))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  // ── Incremental shard packing — the streaming twin of the batch
  // `multimodal_shard_pack` operator: payloads are assigned contiguous
  // byte offsets (shard_id = offset div ShardBytes) AS THEY ARRIVE,
  // instead of re-running the batch prefix sum over the whole corpus.
  //
  // Contiguous offsets are inherently sequential, so the scale-honest
  // unit of sequence is the SOURCE: each source packs its own shard
  // chain (the webdataset convention — shards don't mix sources anyway,
  // so per-source chains are what the loader wants), sources pack in
  // parallel, and the state per source is a SINGLE running offset —
  // O(1), no timeout needed, total state = one long per live source.
  // Within a micro-batch arrivals are ordered by doc_id so a replay
  // delivering the same files yields byte-identical packing; across
  // micro-batches the offset carries in the state store (the
  // crash-recovery story is the state store's, same as sessionize).
  //
  // Replay contract (asserted in DocsStreamSpec): delivering the corpus
  // in doc_id order reproduces exactly the batch per-source prefix-sum
  // packing — the batch op IS the oracle for the incremental one.

  val ShardBytes = 16384L

  final case class PackedDoc(source: String, doc_id: Long, n_bytes: Long,
    byte_offset: Long, shard_id: Long, offset_in_shard: Long)
  final case class PackState(offset: Long)

  def shardPack(docs: DataFrame): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs
      // null-safety contract: a null text packs as 0 bytes (mirrors the
      // batch op, where a NULL n_bytes contributes nothing to the
      // running offset) — without the coalesce the primitive-Long tuple
      // encoder throws on the null and kills the query; a null source
      // has no shard chain to join, so those rows are dropped rather
      // than minting a null state-store key
      .filter(col("source").isNotNull)
      .select(col("source"), col("doc_id"),
        coalesce(octet_length(col("text").cast("binary")).cast("long"), lit(0L))
          .as("n_bytes"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (src: String, in: Iterator[(String, Long, Long)], state: GroupState[PackState]) => {
          var off = state.getOption.map(_.offset).getOrElse(0L)
          val out = in.toArray.sortBy(_._2).map { case (_, id, nb) =>
            val o = off
            off += nb
            PackedDoc(src, id, nb, o, o / ShardBytes, o % ShardBytes)
          }
          state.update(PackState(off))
          out.iterator
        })
  }

  def startShardPack(spark: SparkSession, sourceDir: String, queryName: String): StreamingQuery = {
    val src = spark.readStream.schema(docSchema).parquet(sourceDir)
    shardPack(src)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  /** Durable variant for the crash-recovery contract (the
    * startWindowedExactTopKToDir pattern — the memory sink cannot
    * restart from a checkpoint): batch-id-stamped parquet appends. A
    * replayed batch after a restart recomputes IDENTICAL rows from the
    * reloaded state version, so readers dedupe by (source, doc_id). */
  def startShardPackToDir(spark: SparkSession, sourceDir: String,
      outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val rd = spark.readStream.schema(docSchema)
    val src = maxFilesPerTrigger.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    shardPack(src).toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch_id", lit(id))
          .coalesce(1).write.mode("append").parquet(outDir)
      }
      .start()
  }
}
