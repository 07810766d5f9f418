package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal manifest-pointer table format — the lightweight native
  * answer to the "Delta/Iceberg ACID sink" scope decision (SURVEY
  * §7.3): versioned snapshot directories promoted by atomically-claimed
  * monotonic manifest files, giving crash-safe commits, readers that
  * never observe a torn write, O(1) time travel, and (since r14)
  * FILE-LEVEL manifests so an incremental refresh commits only its new
  * files and reuses the previous version's by reference — without any
  * dependency beyond the filesystem.
  *
  * Protocol (single writer; multi-writer via [[retryingPromote]]):
  *   - each commit writes a fresh `snapshot-<id>-<nonce>/` directory
  *     (never overwriting one a live manifest references), then
  *     promotes it by atomically CLAIMING `manifest-<id>` with
  *     create-no-overwrite (O_EXCL through java.io on the local
  *     filesystem, `fs.create(p, overwrite = false)` elsewhere — atomic
  *     on HDFS, the store's conditional-put on object stores). The
  *     earlier tmp+rename protocol was dropped because POSIX rename(2)
  *     silently REPLACES an existing destination, so rename success
  *     never proved exclusive ownership on a local filesystem (the
  *     r13 ADVICE finding); an exclusive create does. A reader that
  *     lists a just-claimed manifest before its content lands sees an
  *     empty/torn manifest and resolves past it — the commit point is
  *     "content readable AND snapshot `_SUCCESS` present";
  *   - manifest ids are strictly monotonic and always move PAST every
  *     id already listed — committed or debris (`max(preferredId,
  *     max listed id + 1)`): no manifest is ever deleted or rewritten
  *     on the commit path, there is no instant without a committed
  *     pointer, and torn debris squatting on an id can never wedge the
  *     table into recomputing the same colliding id on every retry
  *     (resolution still walks COMMITTED manifests only);
  *   - a manifest records the commit's PRIMARY snapshot directory plus
  *     optional metadata: an as-of TIMESTAMP (epoch micros, pinned by
  *     the caller — the engine's `asOfDate` determinism discipline,
  *     never wall clock) that [[readAsOf]] resolves for timestamp
  *     travel, and an optional explicit FILE LIST (`f <path relative
  *     to the table root>` lines) mixing files from the primary
  *     directory with files REUSED from earlier versions' directories.
  *     A manifest without a file list means "every data file of the
  *     primary directory" — the r13 format, still written by full
  *     promotes and still readable;
  *   - readers resolve the NEWEST manifest whose primary snapshot
  *     carries the `_SUCCESS` marker its writing job left, falling back
  *     past any torn write; `readVersion` resolves an exact id the
  *     same way;
  *   - GC (best-effort, inside the commit) retains the newest `keep`
  *     committed manifests and every FILE they reference — file-level:
  *     a directory whose own manifest aged out survives in part as long
  *     as newer commits reuse some of its files. `keep = Int.MaxValue`
  *     turns the table into a full time-travel log;
  *   - writer FENCING (optional): [[acquireFence]] mints a monotonic
  *     fence id by the same exclusive-create device; a promote carrying
  *     a fence fails by contract when a NEWER fence exists — a zombie
  *     writer that stalled across a failover dies loudly before its
  *     claim, instead of racing it;
  *   - OPTIMISTIC CONCURRENCY (optional): a promote carrying
  *     `expectCurrent` fails with [[ConflictException]] when the
  *     committed head moved past what the writer's merge read — and the
  *     exclusive manifest claim is the final arbiter for the race the
  *     pre-check cannot see. [[retryingPromote]] wraps the
  *     re-read → re-merge → re-promote loop so two genuine writers both
  *     commit, exactly once each, instead of ping-ponging exceptions.
  *
  * Read laziness contract: [[read]]/[[readVersion]]/[[readAsOf]] return
  * a LAZY DataFrame over the resolved snapshot files — the caller
  * must run its action while the version is still retained. With a
  * small `keep`, further promotes can GC the files out from under a
  * parked frame (the scan then fails loudly mid-action, never returns
  * wrong rows). Callers that hold results across commits either
  * materialize promptly (the [[graft.streaming.Scd2Stream]] sink
  * collects each dim snapshot before its next promote) or pass a
  * retention bound that covers their read window.
  *
  * [[graft.streaming.Scd2Stream]] commits its dimension through this
  * store; `etl_snapshot_timetravel` demonstrates the batch-side
  * version/timestamp travel, `etl_incremental_versioned` the crash-safe
  * batch refresh, and VersionedLoadSpec pins the file-reuse commit
  * (unchanged files byte-identical across a refresh).
  */
object SnapshotStore {

  private val ManifestPrefix = "manifest-"
  private val SnapshotPrefix = "snapshot-"
  private val FencePrefix    = "fence-"

  /** Sentinel for [[promote]]'s `expectCurrent`: the writer read an
    * empty (never-committed) table. */
  val NoVersion: Long = -1L

  /** Default [[vacuum]] retention window: 7 days in epoch micros (the
    * Delta VACUUM default). */
  val DefaultVacuumRetentionMicros: Long = 7L * 24 * 3600 * 1000000L

  /** [[vacuum]] refuses a retention below this floor (1 hour) unless
    * the caller passes `enforceRetention = false` — the Delta
    * retentionDurationCheck shape: an aggressive vacuum under live
    * readers is the format's one documented footgun, so crossing the
    * floor must be deliberate. */
  val MinVacuumRetentionMicros: Long = 3600L * 1000000L

  /** A promote carrying a stale fence observed a newer writer's fence
    * and refused to race it. */
  final class FencedException(msg: String) extends IllegalStateException(msg)

  /** A promote lost an optimistic-concurrency race: the committed head
    * moved (or the manifest id was claimed) after the writer read its
    * base state. Retry by re-reading and re-merging —
    * [[retryingPromote]] does exactly that. */
  final class ConflictException(msg: String) extends IllegalStateException(msg)

  /** A promote carrying a `txn` marker found the table already at (or
    * past) that transaction version — the commit was applied by an
    * earlier run and must NOT re-apply. Callers treat this as success
    * ([[VersionedLoad.idempotent]] maps it to None). */
  final class TxnAlreadyAppliedException(msg: String) extends IllegalStateException(msg)

  /** Per-file column statistics carried by a manifest: the min/max of
    * one LONG column over one data file — the data-skipping index the
    * heavyweight formats keep per file, in its smallest honest form
    * (a single numeric column, normally the table's grain key). */
  final case class FileStat(file: String, col: String, min: Long, max: Long)

  /** Typed per-file stats for the non-integral stat columns (r15 —
    * Delta/Iceberg keep these for every leading column):
    * `kind == "date"` → `lo`/`hi` are epoch-day longs rendered as
    * decimal strings (exact bounds, `hiTrunc` always false);
    * `kind == "ts"` → epoch-micros longs, same encoding (r15);
    * `kind == "str"` → `lo`/`hi` are Base64 of the value's UTF-8 bytes
    * truncated to [[StatPrefixBytes]] — a truncated `lo` is still a
    * valid LOWER bound (a byte prefix sorts ≤ every extension), and a
    * truncated `hi` (`hiTrunc = true`) bounds values strictly below the
    * prefix with its last byte incremented. All string pruning
    * comparisons run in unsigned UTF-8 BYTE order — exactly the order
    * Spark's UTF8String (and DuckDB's default binary collation) compare
    * in, so the prune decision and the exact filter can never disagree
    * on exotic code points. */
  final case class TypedFileStat(file: String, col: String, kind: String,
      lo: String, hi: String, hiTrunc: Boolean)

  /** String stat bounds keep at most this many UTF-8 bytes per side —
    * manifests stay metadata-sized on long-document tables; truncation
    * only widens the recorded range, never narrows it. */
  val StatPrefixBytes: Int = 64

  /** A partition spec (r16 — the Iceberg hidden-partitioning shape): a
    * TRANSFORM over one column whose per-file VALUES the manifest
    * records, letting readers prune whole files by partition value
    * BEFORE any file stat is consulted. Supported transforms:
    * `identity` (integral column — the value itself), `year` /
    * `month` over a date column (`year(c)`; `year(c)*100 + month(c)`,
    * both monotone in the date so range queries stay ranges), and
    * `div<W>` over an integral column (floor(c / W), the Iceberg
    * truncate[W] family — `div10000` turns a yyyymmdd long date_key
    * into its year, the reference reports' `&p_year` grain), and
    * `bucket<N>` over an integral column (Murmur3 seed-42 of the long
    * value mod N — the Iceberg bucket[N] family, r17: point-lookup
    * pruning on a high-cardinality grain key, and the shared layout
    * two co-bucketed store tables join bucket-by-bucket under). A
    * table may declare SEVERAL specs (r17, ordered — see the
    * multi-column manifest format below). The specs are versioned WITH
    * the data — each manifest carries its own `p` header(s) — so
    * partition pruning composes with version and timestamp travel,
    * and a spec CHANGE (partition evolution) is just newer manifests
    * carrying different headers: old versions keep pruning by the
    * spec they were written under; files written before the new spec
    * carry no value line under it and safely degrade to must-scan. */
  final case class PartitionSpec(transform: String, col: String)

  /** One file's recorded partition values under the manifest's spec
    * list, positionally — `values(d)` is the file's value under spec
    * dimension `d`; `None` (the `?` manifest token, r17) marks a
    * dimension the file is MULTI-VALUED in (it must-scan on that
    * dimension but still prunes on its concrete ones). A file
    * multi-valued in EVERY dimension gets no line at all — the
    * absence-means-must-scan rule. */
  final case class FilePartition(file: String, values: Seq[Option[Long]]) {
    /** Leading-dimension value — the single-spec (r16) accessor; throws
      * on a `?`-valued leading dimension. */
    def value: Long = values.head.get
  }

  /** Per-file NULL COUNT for one stat column (r17 — the Delta nullCount
    * shape): with the file's row count (`r` lines), it answers the two
    * prunes min/max never can — `IS NULL` (nulls = 0 → no match) and
    * `IS NOT NULL` (nulls = rowCount → no match). */
  final case class FileNullStat(file: String, col: String, nulls: Long)

  /** One committed manifest's content: the primary snapshot directory,
    * the optional pinned as-of instant, the optional explicit file
    * list (table-root-relative; empty = all data files of `snap`),
    * optional per-file column stats, and whether the content carried
    * the `end` terminator line. The terminator is what makes the
    * exclusive-create protocol safe against TORN CONTENT: the claim is
    * atomic but the write after it is not, so a crash (or a racing
    * reader) can observe a prefix that still parses — without the
    * terminator requirement a truncated file list would resolve as a
    * committed SUBSET of the version and GC would collect the
    * truncated-away files. Only fully-terminated manifests commit. */
  private final case class ManifestData(
      snap: String, asOf: Option[Long], files: Seq[String],
      stats: Seq[FileStat], typedStats: Seq[TypedFileStat],
      specs: Seq[PartitionSpec], partVals: Seq[FilePartition],
      rowCounts: Map[String, Long], nullStats: Seq[FileNullStat],
      schemaJson: Option[String],
      txns: Map[String, Long], terminated: Boolean) {
    /** The commit's recorded table schema, if its `c` line parses. */
    def schema: Option[org.apache.spark.sql.types.StructType] =
      schemaJson.flatMap(j => scala.util.Try(
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
  }

  private def manifestId(name: String): Option[Long] =
    if (name.startsWith(ManifestPrefix))
      scala.util.Try(name.stripPrefix(ManifestPrefix).toLong).toOption
    else None

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Manifest FILES under `tgt` as (id, path), newest first — one
    * directory listing, NO content reads: resolution is lazy so reads
    * and commits stay O(1)-ish in retained history instead of opening
    * every manifest (a full time-travel log would otherwise pay one
    * filesystem round trip per retained version per operation). */
  private def manifestFiles(fs: FileSystem, tgt: Path): Seq[(Long, Path)] = {
    if (!fs.exists(tgt)) return Nil
    fs.listStatus(tgt).toIndexedSeq
      .flatMap(st => manifestId(st.getPath.getName).map(id => (id, st.getPath)))
      .sortBy(-_._1)
  }

  /** Manifest CONTENT reads performed since JVM start — test
    * instrumentation for the resolution-cost contract (see the
    * "checkpointing" note on the object scaladoc): every manifest is
    * SELF-CONTAINED (full file list + stats + specs + txns — each
    * commit IS its own checkpoint, Delta's log+checkpoint rolled into
    * one), so resolving the head parses exactly 1 + (torn debris
    * above it) manifests REGARDLESS of retained history length.
    * ResolutionCostSpec pins that bound with this counter. */
  private[etl] val contentReads = new java.util.concurrent.atomic.AtomicLong(0L)

  private def readContent(fs: FileSystem, p: Path): Option[String] = {
    contentReads.incrementAndGet(): Unit
    scala.util.Try {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
    }.toOption.filter(_.nonEmpty)
  }

  /** Manifest content: line 1 = primary snapshot dir name; line 2
    * (optional, may be blank) = the commit's pinned as-of timestamp in
    * epoch micros; lines 3+ (optional) = `f <relative path>` explicit
    * file list, `s <col> <min> <max> <relative path>` per-file LONG
    * column stats, and `t <kind> <col> <lo> <hi> <E|T> <relative
    * path>` per-file TYPED stats (path LAST on every line — it is the
    * only token that could ever grow a delimiter; stat column names
    * are whitespace-rejected at write time), plus (r17)
    * `r <rowCount> <relative path>` per-file row counts and
    * `n <col> <nullCount> <relative path>` per-file null counts — the
    * IS NULL / IS NOT NULL skipping index [[readNullFilter]] prunes
    * with — and `c <base64(StructType.json)>`, the commit's recorded
    * TABLE schema (readers plan with zero footer reads; see
    * readManifest); final line = the `end`
    * terminator (required for the manifest to commit — see
    * [[ManifestData]]). Unknown line prefixes are ignored, so a reader
    * from before a line type existed still resolves the manifest (and
    * one from after tolerates its absence) — `t` lines ride on exactly
    * this rule past r14 readers.
    *
    * PARTITION SPEC (r16 — the r15 design note become code): a header
    * line `p <transform> <col>` (e.g. `p year date_key`) declares the
    * manifest's [[PartitionSpec]], and one `v <value> <relative path>`
    * line per SINGLE-VALUED file binds it to its partition value.
    * Because the lines live in each version's manifest, the spec is
    * versioned WITH the data: partition pruning composes with time
    * travel (a readAsOf resolves the manifest first, then prunes by
    * that manifest's own `v` lines), and a spec CHANGE is just newer
    * manifests carrying a different header — old versions keep pruning
    * by the spec they were written under, the Iceberg
    * partition-evolution behavior; files from before the change carry
    * no `v` line under the new spec and degrade to must-scan.
    *
    * MULTI-COLUMN SPECS (r17 — the r16 design note become code; the
    * Iceberg spec = an ordered transform LIST): repeated `p` headers
    * declare the dimensions IN ORDER, and each `v` line carries one
    * value PER DIMENSION positionally — `v <v1> <v2> ... <path>` —
    * with `?` marking a dimension the file is multi-valued in (it
    * must-scans on that dimension, prunes on its concrete ones).
    * Pruning intersects the per-dimension keep sets exactly like the
    * dual-pruning intersections do; a single-spec r16 manifest parses
    * as the one-dimension case unchanged. A MALFORMED `p` line (a
    * column name that would misparse the space-split, an empty
    * transform) voids the WHOLE spec list — dropping one header would
    * silently renumber every `v` tuple's dimensions, so the sound
    * degrade is "unpartitioned: every file must-scans" (defense in
    * depth for hand-edited manifests; the write path rejects such
    * specs before committing). */
  private def parseManifest(content: String): ManifestData = {
    val lines = content.split("\n", -1)
    val asOf = if (lines.length >= 2) scala.util.Try(lines(1).trim.toLong).toOption else None
    val files = lines.drop(2).collect { case l if l.startsWith("f ") => l.drop(2).trim }
    val rawSpecs = lines.drop(2).filter(_.startsWith("p ")).toIndexedSeq.map { l =>
      l.drop(2).trim.split(" ", 2) match {
        case Array(tr, c) if tr.nonEmpty && c.nonEmpty && !tr.exists(_.isWhitespace) &&
            !c.trim.exists(_.isWhitespace) && !c.contains("`") =>
          Some(PartitionSpec(tr, c.trim))
        case _ => None
      }
    }
    val specs: Seq[PartitionSpec] =
      if (rawSpecs.forall(_.isDefined)) rawSpecs.flatten else Nil
    // v tuple lines: exactly specs.size value tokens, path LAST (split
    // with limit so a path containing spaces survives); parsed only
    // when a valid spec list gives the tuple its meaning
    val partVals: Seq[FilePartition] = if (specs.isEmpty) Nil
    else lines.drop(2).toIndexedSeq.collect { case l if l.startsWith("v ") =>
      val toks = l.drop(2).trim.split(" ", specs.size + 1)
      if (toks.length == specs.size + 1 && toks.last.nonEmpty) {
        val vals = toks.dropRight(1).toIndexedSeq.map {
          case "?" => Some(None)
          case s   => scala.util.Try(s.toLong).toOption.map(Some(_))
        }
        if (vals.forall(_.isDefined)) Some(FilePartition(toks.last.trim, vals.map(_.get)))
        else None
      } else None
    }.flatten
    // `r <rowCount> <path>` / `n <col> <nullCount> <path>` (r17): the
    // row-count + null-count index IS NULL / IS NOT NULL pruning reads
    val rowCounts: Map[String, Long] = lines.drop(2).collect { case l if l.startsWith("r ") =>
      l.drop(2).trim.split(" ", 2) match {
        case Array(c, p) if p.nonEmpty => scala.util.Try(p.trim -> c.toLong).toOption
        case _ => None
      }
    }.flatten.toMap
    val nullStats = lines.drop(2).collect { case l if l.startsWith("n ") =>
      l.drop(2).trim.split(" ", 3) match {
        case Array(c, nn, p) if p.nonEmpty =>
          scala.util.Try(FileNullStat(p.trim, c, nn.toLong)).toOption
        case _ => None
      }
    }.flatten
    // `c <base64(StructType.json)>` (r17 — the Delta schema-in-the-log
    // shape): the commit's TABLE schema, recorded so readers plan with
    // zero parquet-footer reads; an undecodable line degrades to the
    // footer-merging read, never a wrong schema
    val schemaJson = lines.drop(2).collectFirst { case l if l.startsWith("c ") =>
      scala.util.Try(new String(
        java.util.Base64.getDecoder.decode(l.drop(2).trim), "UTF-8")).toOption
    }.flatten
    // `x <appId> <version>` — idempotent-transaction markers (r16, the
    // Delta txnAppId/txnVersion shape): latest version per application
    // id, carried forward by every commit
    val txns: Map[String, Long] = lines.drop(2).collect { case l if l.startsWith("x ") =>
      l.drop(2).trim.split(" ", 2) match {
        case Array(app, ver) => scala.util.Try(app -> ver.trim.toLong).toOption
        case _ => None
      }
    }.flatten.toMap
    val stats = lines.drop(2).collect { case l if l.startsWith("s ") =>
      l.drop(2).trim.split(" ", 4) match {
        case Array(c, mn, mx, p) =>
          scala.util.Try(FileStat(p, c, mn.toLong, mx.toLong)).toOption
        case _ => None
      }
    }.flatten
    val typed = lines.drop(2).collect { case l if l.startsWith("t ") =>
      l.drop(2).trim.split(" ", 6) match {
        case Array(kind, c, lo, hi, flag, p) if flag == "E" || flag == "T" =>
          Some(TypedFileStat(p, c, kind, lo, hi, flag == "T"))
        case _ => None
      }
    }.flatten
    ManifestData(lines(0).trim, asOf, files.toIndexedSeq, stats.toIndexedSeq,
      typed.toIndexedSeq, specs, partVals, rowCounts, nullStats.toIndexedSeq,
      schemaJson, txns, lines.last.trim == "end")
  }

  /** The width W of a `div<W>` transform name, if it is one (W ≥ 1). */
  private[graft] def divWidth(transform: String): Option[Long] =
    if (transform.startsWith("div"))
      scala.util.Try(transform.stripPrefix("div").toLong).toOption.filter(_ >= 1L)
    else None

  /** The bucket count N of a `bucket<N>` transform name, if it is one
    * (N ≥ 1) — the Iceberg bucket[N] hash-partition family (r17). */
  private[graft] def bucketN(transform: String): Option[Int] =
    if (transform.startsWith("bucket"))
      scala.util.Try(transform.stripPrefix("bucket").toInt).toOption.filter(_ >= 1)
    else None

  /** The bucket a LONG key falls in under `bucket<N>`, computed
    * DRIVER-SIDE: Murmur3 (x86_32, seed 42) of the long — byte-for-byte
    * the hash `functions.hash(col.cast("long"))` computes per row, so a
    * driver-side point probe and the column-side transform can never
    * disagree (BucketSpec pins the parity). */
  def bucketValue(key: Long, n: Int): Long = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(key, 42)
    (((h.toLong % n) + n) % n)
  }

  /** `df` range-clustered BY ITS PARTITION-SPEC VALUES — the write-side
    * layout helper (r17): range-partitioning on the ordered transform
    * columns makes each written file single-valued in as many leading
    * dimensions as the data allows, so the manifest records concrete
    * `v` tuples instead of `?` must-scans. Callers pass the SAME spec
    * list to [[promote]]/[[VersionedLoad.bootstrap]]; a straggler file
    * spanning two values in some dimension degrades to `?` there — a
    * pruning loss, never a correctness edge. */
  def clusterBySpecs(df: DataFrame, specs: Seq[PartitionSpec],
      numFiles: Int): DataFrame = {
    require(specs.nonEmpty, "SnapshotStore.clusterBySpecs: empty spec list")
    df.repartitionByRange(numFiles, specs.map(transformColumn(_, df)): _*)
  }

  /** The partition-transform column for `spec` over `df`'s schema —
    * the ONE definition of every transform's semantics, shared by the
    * write-side value recorder, the read-side exact filter, and the
    * copy-on-write batch-span prune, so they can never drift. Throws
    * on an unknown transform or a column type it cannot take — and,
    * defense in depth, on a column name that would misparse or escape
    * the quoted `expr()` route (the promote-side guard re-checked here
    * because a spec can also arrive PARSED from a hand-edited
    * manifest; r16 ADVICE). */
  private[etl] def transformColumn(spec: PartitionSpec,
      df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, month, year}
    import org.apache.spark.sql.types._
    if (spec.col.exists(_.isWhitespace) || spec.col.contains("`") ||
        spec.transform.exists(_.isWhitespace))
      throw new IllegalArgumentException(
        s"SnapshotStore: partition spec '$spec' carries whitespace or a backtick — " +
          "rejected everywhere a spec is consumed, not only at promote")
    (spec.transform, df.schema(spec.col).dataType) match {
      case ("identity", ByteType | ShortType | IntegerType | LongType) =>
        col(spec.col).cast("long")
      case ("year", DateType)  => year(col(spec.col)).cast("long")
      case ("month", DateType) =>
        (year(col(spec.col)) * 100 + month(col(spec.col))).cast("long")
      case (t, ByteType | ShortType | IntegerType | LongType) if bucketN(t).isDefined =>
        // Murmur3(seed 42) of the value AS LONG, mod N into [0, N):
        // functions.hash on a long column IS Murmur3_x86_32.hashLong,
        // so [[bucketValue]] reproduces this exactly driver-side. The
        // cast-to-long first makes int/long key columns hash alike.
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(col(spec.col).cast("long")),
          org.apache.spark.sql.functions.lit(bucketN(t).get)).cast("long")
      case (t, ByteType | ShortType | IntegerType | LongType) if divWidth(t).isDefined =>
        // FLOOR division in EXACT long arithmetic: subtract the
        // non-negative pmod first (the numerator is then exactly
        // divisible, so SQL `div`'s truncation equals floor and matches
        // the driver-side Math.floorDiv for negatives too); a double
        // route would lose exactness above 2^53
        val w = divWidth(t).get
        org.apache.spark.sql.functions.expr(
          s"CAST((CAST(`${spec.col}` AS BIGINT) - " +
            s"pmod(CAST(`${spec.col}` AS BIGINT), $w)) div $w AS BIGINT)")
      case (t, dt) => throw new IllegalArgumentException(
        s"SnapshotStore: partition transform $t is not applicable to ${spec.col}: $dt — " +
          "identity/div<W>/bucket<N> take an integral column; year/month take a date column")
    }
  }

  /** Resolve ONE manifest to its committed content: it parses WITH the
    * content terminator and the PRIMARY snapshot directory carries
    * `_SUCCESS` — a manifest whose write raced a crash (no content, or
    * a truncated prefix of it) resolves to None. */
  /** Parsed-manifest memo (r18). Committed manifests are WRITE-ONCE by
    * the claim protocol (create-no-overwrite + content + terminator;
    * no rewrite path exists), so a parse keyed by (path, length,
    * mtime) can be reused for the session — a metadata-heavy op (the
    * CDC/purge read path resolves the same manifest ~10× per
    * invocation) pays one read+parse per manifest instead. Resolution
    * SEMANTICS are unchanged: only terminated manifests are memoized
    * (a torn write that completes later must re-read), and the primary
    * dir's `_SUCCESS` liveness check still runs on every call, so a
    * GC'd version resolves None exactly as before. Bounded: cleared
    * wholesale past 512 entries (a session touches far fewer). */
  private val manifestMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), ManifestData]()
  private[etl] def clearManifestMemo(): Unit = manifestMemo.clear()

  private def resolve(fs: FileSystem, tgt: Path, manifest: Path): Option[ManifestData] = {
    val key = scala.util.Try {
      val st = fs.getFileStatus(manifest)
      (manifest.toString, st.getLen, st.getModificationTime)
    }.toOption
    val parsed = key.flatMap(k => Option(manifestMemo.get(k))).orElse {
      val p = readContent(fs, manifest)
        .map(parseManifest)
        .filter(m => m.terminated && m.snap.nonEmpty)
      for (k <- key; m <- p) {
        if (manifestMemo.size > 512) manifestMemo.clear()
        manifestMemo.put(k, m): Unit
      }
      p
    }
    parsed.filter(m => fs.exists(new Path(new Path(tgt, m.snap), "_SUCCESS")))
  }

  /** The data files a committed manifest references, table-root
    * relative: the explicit list if present, else every visible file of
    * the primary directory. */
  private def manifestDataFiles(fs: FileSystem, tgt: Path, m: ManifestData): Seq[String] =
    if (m.files.nonEmpty) m.files
    else dirDataFiles(fs, tgt, m.snap)

  /** Visible (non-marker) files of one snapshot dir, root-relative. */
  private def dirDataFiles(fs: FileSystem, tgt: Path, snap: String): Seq[String] = {
    val d = new Path(tgt, snap)
    if (!fs.exists(d)) return Nil
    fs.listStatus(d).toIndexedSeq.map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .map(n => s"$snap/$n")
  }

  private def readManifest(spark: SparkSession, tgt: Path, fs: FileSystem,
      m: ManifestData): DataFrame = {
    val paths =
      if (m.files.nonEmpty) m.files.map(f => new Path(tgt, f).toString)
      else Seq(new Path(tgt, m.snap).toString)
    m.schema match {
      // recorded table schema (r17, the Delta schema-in-the-log shape):
      // the read plans with ZERO parquet-footer reads — at 100k files
      // the mergeSchema fallback's one-footer-per-file planning cost is
      // the largest remaining metadata-scale term, and the recorded
      // schema removes it. A file that predates an additive evolution
      // projects its missing column as null, exactly like the merged
      // read; a type conflict fails loudly AT SCAN (the additive-only
      // evolution contract, enforced at promote since r17).
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      // mergeSchema fallback (pre-r17 manifests, undecodable c line): a
      // version's file list may mix schema generations after an
      // ADDITIVE evolution — the union schema projects the missing
      // column as null in old files. Cost: one footer read per listed
      // file. Conflicting TYPE changes on one column fail the read
      // loudly — evolution here is additive by contract, never
      // coercive.
      case None => spark.read.option("mergeSchema", "true").parquet(paths: _*)
    }
  }

  /** The newest COMMITTED manifest — walks newest-first and stops at the
    * first manifest that resolves (normally the very first). */
  private def currentManifest(fs: FileSystem, tgt: Path): Option[(Long, ManifestData)] =
    manifestFiles(fs, tgt).iterator
      .map { case (id, p) => (id, resolve(fs, tgt, p)) }
      .collectFirst { case (id, Some(m)) => (id, m) }

  private[graft] def currentSnapshot(fs: FileSystem, tgt: Path): Option[(Long, Path)] =
    currentManifest(fs, tgt).map { case (id, m) => (id, new Path(tgt, m.snap)) }

  /** Latest committed version id, if any commit ever succeeded. */
  def currentVersion(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentManifest(fs, tgt).map(_._1)
  }

  /** One committed version's audit metadata — the DESCRIBE HISTORY row
    * of the heavyweight formats: its id, pinned as-of instant (None for
    * untimestamped commits), referenced data-file count, and primary
    * snapshot directory name. */
  final case class HistoryEntry(version: Long, asOfMicros: Option[Long],
      numFiles: Int, primarySnapshot: String)

  /** The RETAINED committed history, newest first — every version still
    * resolvable (torn debris skipped, GC'd manifests gone). Metadata
    * only: one manifest read per retained version, no data file is
    * opened, so the call is manifest-count-scale like GC itself. The
    * audit surface a versioned store owes its operators: what committed,
    * when (by the pinned as-of), and how big (by file count). */
  def history(spark: SparkSession, dir: String): Seq[HistoryEntry] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFiles(fs, tgt).flatMap { case (id, p) =>
      resolve(fs, tgt, p).map(m =>
        HistoryEntry(id, m.asOf, manifestDataFiles(fs, tgt, m).size, m.snap))
    }
  }

  /** The current committed version's pinned as-of instant, if it has
    * one — writers that must keep the as-of timeline MONOTONE (the
    * streaming fact sink clamping a late batch) read it before
    * committing. */
  def currentAsOf(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentManifest(fs, tgt).flatMap(_._2.asOf)
  }

  /** The current committed version's per-file column stats (empty when
    * the head commit carries none) — the data-skipping index
    * [[VersionedLoad.merge]] prunes its touched-file scan with. */
  def currentFileStats(spark: SparkSession, dir: String): Seq[FileStat] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentManifest(fs, tgt).toSeq.flatMap(_._2.stats)
  }

  /** Version `id`'s per-file column stats (empty when that commit
    * carries none or the version is not retained). */
  def filesForVersionStats(spark: SparkSession, dir: String, id: Long): Seq[FileStat] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFiles(fs, tgt).find(_._1 == id)
      .flatMap { case (_, p) => resolve(fs, tgt, p) }
      .toSeq.flatMap(_.stats)
  }

  /** The current committed version's TYPED per-file stats (date /
    * string columns — empty when the head commit carries none). */
  def currentTypedFileStats(spark: SparkSession, dir: String): Seq[TypedFileStat] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentManifest(fs, tgt).toSeq.flatMap(_._2.typedStats)
  }

  /** Version `id`'s TYPED per-file stats (empty when that commit
    * carries none or the version is not retained). */
  def filesForVersionTypedStats(spark: SparkSession, dir: String, id: Long): Seq[TypedFileStat] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFiles(fs, tgt).find(_._1 == id)
      .flatMap { case (_, p) => resolve(fs, tgt, p) }
      .toSeq.flatMap(_.typedStats)
  }

  /** The current committed version's data files, table-root relative —
    * the reuse list an incremental commit passes back to [[promote]].
    * Empty when nothing was ever committed. */
  def currentFiles(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentManifest(fs, tgt).toSeq
      .flatMap { case (_, m) => manifestDataFiles(fs, tgt, m) }
  }

  /** Version `id`'s data files, table-root relative — the file-level
    * view [[VersionedLoad.restore]] and [[VersionedLoad.changesBetween]]
    * build on. None when the version is not committed/retained. */
  def filesForVersion(spark: SparkSession, dir: String, id: Long): Option[Seq[String]] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFiles(fs, tgt).find(_._1 == id)
      .flatMap { case (_, p) => resolve(fs, tgt, p) }
      .map(m => manifestDataFiles(fs, tgt, m))
  }

  /** Read an explicit file list (as returned by [[filesForVersion]] /
    * [[currentFiles]]) lazily. Empty list → None. Footer-merging (the
    * caller has no manifest to take a recorded schema from); the
    * manifest-aware readers route through the recorded schema
    * instead — see readManifest. */
  def readFiles(spark: SparkSession, dir: String, files: Seq[String]): Option[DataFrame] =
    readFilesAs(spark, dir, files, None)

  /** [[readFiles]] with an optional RECORDED schema (from the resolved
    * manifest's `c` line): schema given → zero footer reads at plan
    * time; absent → mergeSchema fallback. */
  private def readFilesAs(spark: SparkSession, dir: String, files: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType]): Option[DataFrame] =
    if (files.isEmpty) None
    else Some(schema match {
      case Some(s) => spark.read.schema(s)
        .parquet(files.map(f => new Path(dir, f).toString): _*)
      case None => spark.read.option("mergeSchema", "true")
        .parquet(files.map(f => new Path(dir, f).toString): _*) // see readManifest
    })

  /** Resolve the pruned readers' target manifest: the committed head,
    * or — when `version` is given — exactly that retained committed
    * version (None if unretained). Pruned reads thus compose with
    * version travel: "point lookup in yesterday's snapshot" opens only
    * that version's matching files, because a version's manifest
    * carries its own stats. */
  private def manifestFor(fs: FileSystem, tgt: Path,
      version: Option[Long]): Option[ManifestData] = version match {
    case None => currentManifest(fs, tgt).map(_._2)
    case Some(id) => manifestFiles(fs, tgt).find(_._1 == id)
      .flatMap { case (_, p) => resolve(fs, tgt, p) }
  }

  /** Read the latest committed state restricted to `column` ∈
    * [lo, hi] — the data-skipping read: files whose recorded min/max
    * range cannot intersect [lo, hi] are never opened (listed files
    * without a stat line always scan), and the EXACT filter is applied
    * on top of the pruned scan, so correctness never depends on the
    * stats — they only cut IO. With a key-clustered layout a point or
    * range lookup touches O(matching files) instead of the table. None
    * when nothing was ever committed; a table with no stats degrades
    * to a filtered full scan. Lazy — see the read-laziness contract. */
  def readKeyRange(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long, version: Option[Long] = None): Option[DataFrame] = {
    import org.apache.spark.sql.functions.col
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).flatMap { m =>
      val files = manifestDataFiles(fs, tgt, m)
      val stats = m.stats.filter(st => st.col == column)
      val statted = stats.map(_.file).toSet
      val statKeep = (files.filterNot(statted) ++
        stats.filter(st => st.max >= lo && st.min <= hi).map(_.file)).toSet
      // dual pruning (r16; per-dimension since r17): an identity/div
      // partition spec on the SAME column adds its v-line keep set — a
      // valued file outside the range prunes even when it carries no
      // stat line (bucket specs never join: a hash is not monotone, so
      // a key range maps to no bucket range)
      val keepSet = m.specs.zipWithIndex.collectFirst {
        case (ps, d) if ps.col == column &&
            (ps.transform == "identity" || divWidth(ps.transform).isDefined) =>
          val w = divWidth(ps.transform).getOrElse(1L)
          statKeep.intersect(partitionKeep(m, files, d,
            Math.floorDiv(lo, w), Math.floorDiv(hi, w)))
      }.getOrElse(statKeep)
      val keep = files.filter(keepSet).sorted
      // an ALL-PRUNED range is an EMPTY RESULT, not a missing table:
      // plan over the full list and cut the scan with limit(0)
      // (PropagateEmptyRelation — no row reads; with a recorded `c`
      // schema not even footers, closing the r16 every-footer nit)
      readFilesAs(spark, dir, if (keep.isEmpty) files.sorted else keep, m.schema).map { df =>
        // the stat writer refuses non-integral columns loudly; the
        // reader must match — a silent cast("long") on a double column
        // TRUNCATES (5.7 passes a [1,5] filter) and returns rows
        // outside the requested range (r14 ADVICE)
        df.schema(column).dataType match {
          case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
          case dt => throw new IllegalArgumentException(
            s"SnapshotStore.readKeyRange: $column is $dt, not an integral column — " +
              "use readDateRange/readStringRange for typed keys")
        }
        val exact = df.filter(col(column).cast("long").between(lo, hi))
        if (keep.isEmpty) exact.limit(0) else exact
      }
    }
  }

  /** [[readKeyRange]] for a DATE column: read the latest committed
    * state restricted to `column` ∈ [loDate, hiDate] (ISO `yyyy-MM-dd`
    * strings, inclusive), pruning by the manifest's `t date` per-file
    * stats — files whose recorded epoch-day span cannot intersect the
    * range are never opened; listed files without a stat line always
    * scan, and the exact filter runs on top, so the stats only cut IO.
    * None when nothing was ever committed. Lazy — see the read-laziness
    * contract. */
  def readDateRange(spark: SparkSession, dir: String, column: String,
      loDate: String, hiDate: String, version: Option[Long] = None): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, lit}
    val lo = java.time.LocalDate.parse(loDate).toEpochDay
    val hi = java.time.LocalDate.parse(hiDate).toEpochDay
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).flatMap { m =>
      val files = manifestDataFiles(fs, tgt, m)
      val stats = m.typedStats.filter(st => st.col == column && st.kind == "date")
        .flatMap(st => scala.util.Try((st.file, st.lo.toLong, st.hi.toLong)).toOption)
      val statted = stats.map(_._1).toSet
      val statKeep = (files.filterNot(statted) ++
        stats.filter { case (_, mn, mx) => mx >= lo && mn <= hi }.map(_._1)).toSet
      // dual pruning (r16; per-dimension since r17): a year/month
      // partition spec on the SAME column adds its v-line keep set —
      // the transform is monotone in the date, so the query window
      // maps to a transform-value range
      val keepSet = m.specs.zipWithIndex.collectFirst {
        case (ps, d) if (ps.transform == "year" || ps.transform == "month")
            && ps.col == column =>
          def tx(dt: java.time.LocalDate): Long =
            if (ps.transform == "year") dt.getYear.toLong
            else dt.getYear.toLong * 100 + dt.getMonthValue
          statKeep.intersect(partitionKeep(m, files, d,
            tx(java.time.LocalDate.parse(loDate)), tx(java.time.LocalDate.parse(hiDate))))
      }.getOrElse(statKeep)
      val keep = files.filter(keepSet).sorted
      // all-pruned = empty result, not a missing table (see readKeyRange)
      readFilesAs(spark, dir, if (keep.isEmpty) files.sorted else keep, m.schema).map { df =>
        df.schema(column).dataType match {
          case org.apache.spark.sql.types.DateType => ()
          case dt => throw new IllegalArgumentException(
            s"SnapshotStore.readDateRange: $column is $dt, not a date column")
        }
        val exact =
          df.filter(col(column).between(lit(loDate).cast("date"), lit(hiDate).cast("date")))
        if (keep.isEmpty) exact.limit(0) else exact
      }
    }
  }

  /** [[readKeyRange]] for a TIMESTAMP column: `column` ∈ [loMicros,
    * hiMicros] (epoch micros, inclusive — the engine's asOfDate
    * determinism discipline: callers pass instants, never wall clock),
    * pruning by the manifest's `t ts` per-file stats; exact filter on
    * top via unix_micros, which is session-timezone-independent like
    * the recorded bounds. All-pruned → empty frame; None only when
    * never committed. Lazy. */
  def readTimestampRange(spark: SparkSession, dir: String, column: String,
      loMicros: Long, hiMicros: Long, version: Option[Long] = None): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).flatMap { m =>
      val files = manifestDataFiles(fs, tgt, m)
      val stats = m.typedStats.filter(st => st.col == column && st.kind == "ts")
        .flatMap(st => scala.util.Try((st.file, st.lo.toLong, st.hi.toLong)).toOption)
      val statted = stats.map(_._1).toSet
      val keep = (files.filterNot(statted) ++
        stats.filter { case (_, mn, mx) => mx >= loMicros && mn <= hiMicros }
          .map(_._1)).sorted
      // all-pruned = empty result, not a missing table (see readKeyRange)
      readFilesAs(spark, dir, if (keep.isEmpty) files.sorted else keep, m.schema).map { df =>
        df.schema(column).dataType match {
          case org.apache.spark.sql.types.TimestampType => ()
          case dt => throw new IllegalArgumentException(
            s"SnapshotStore.readTimestampRange: $column is $dt, not a timestamp column")
        }
        val exact = df.filter(unix_micros(col(column)).between(loMicros, hiMicros))
        if (keep.isEmpty) exact.limit(0) else exact
      }
    }
  }

  /** The newest committed version id whose pinned as-of instant is ≤
    * `asOfMicros` — [[readAsOf]]'s resolution exposed as an ID, so
    * timestamp travel composes with the version-pinned PRUNED readers:
    * `readKeyRange(..., version = versionAsOf(t))` is "point lookup in
    * the table as of t", opening only that version's matching files.
    * None when no retained commit qualifies. */
  def versionAsOf(spark: SparkSession, dir: String, asOfMicros: Long): Option[Long] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFiles(fs, tgt).iterator
      .map { case (id, p) => (id, resolve(fs, tgt, p)) }
      .collectFirst { case (id, Some(m)) if m.asOf.exists(_ <= asOfMicros) => id }
  }

  /** [[readKeyRange]] for a STRING column: read the latest committed
    * state restricted to `column` ∈ [lo, hi] (inclusive, UTF-8 byte
    * order — Spark's native string comparison), pruning by the
    * manifest's `t str` per-file prefix stats. Soundness under
    * truncation: a stored `lo` prefix sorts ≤ the true min (so `hi` <
    * prefix proves no match), and a TRUNCATED `hi` prefix bounds every
    * value strictly below the prefix with its last byte incremented —
    * a file is pruned only when the query range provably clears both.
    * Unparseable stat lines and unstatted files always scan (absence =
    * "must scan"). None when nothing was ever committed. Lazy. */
  def readStringRange(spark: SparkSession, dir: String, column: String,
      lo: String, hi: String, version: Option[Long] = None): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, lit}
    val loB = lo.getBytes("UTF-8")
    val hiB = hi.getBytes("UTF-8")
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).flatMap { m =>
      val files = manifestDataFiles(fs, tgt, m)
      val stats = m.typedStats.filter(st => st.col == column && st.kind == "str")
      val statted = stats.map(_.file).toSet
      val candidates = stats.filter { st =>
        scala.util.Try {
          val stLo = decB64(st.lo)
          if (cmpBytes(hiB, stLo) < 0) false // hi < min's prefix ≤ every value
          else {
            val stHi = decB64(st.hi)
            if (!st.hiTrunc) cmpBytes(loB, stHi) <= 0 // exact max: keep iff lo ≤ max
            // truncated max: values < incr(prefix); keep iff lo < that
            // bound (or no finite bound exists — all-0xFF prefix)
            else incrBytes(stHi).forall(ub => cmpBytes(loB, ub) < 0)
          }
        }.getOrElse(true) // undecodable stat → must scan, never prune
      }.map(_.file)
      val keep = (files.filterNot(statted) ++ candidates).sorted
      // all-pruned = empty result, not a missing table (see readKeyRange)
      readFilesAs(spark, dir, if (keep.isEmpty) files.sorted else keep, m.schema).map { df =>
        df.schema(column).dataType match {
          case org.apache.spark.sql.types.StringType => ()
          case dt => throw new IllegalArgumentException(
            s"SnapshotStore.readStringRange: $column is $dt, not a string column")
        }
        val exact = df.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
        if (keep.isEmpty) exact.limit(0) else exact
      }
    }
  }

  /** Files of `files` a partition-range probe [lo, hi] on dimension
    * `dim` keeps under manifest `m`'s `v` lines: files with a CONCRETE
    * dim value inside the range, plus every file without one (no `v`
    * line at all — pre-evolution — or a `?` on this dimension: a
    * multi-valued file prunes on its concrete dimensions and
    * must-scans here). A sound superset of the matching files. */
  private def partitionKeep(m: ManifestData, files: Seq[String], dim: Int,
      lo: Long, hi: Long): Set[String] = {
    val fileSet = files.toSet
    val vals = m.partVals.filter(pv => fileSet.contains(pv.file))
    val judged = vals.filter(_.values.lift(dim).exists(_.isDefined))
    val valued = judged.map(_.file).toSet
    (files.filterNot(valued) ++
      judged.filter(_.values(dim).exists(v => v >= lo && v <= hi)).map(_.file)).toSet
  }

  /** Files a partition-range probe keeps judged by the FILE STATS on
    * the spec's underlying column instead of the `v` lines — the other
    * half of dual pruning: every supported transform is MONOTONE in its
    * column, so a file's recorded column range maps to a transform
    * range and prunes against [lo, hi] directly. Covers exactly the
    * files the `v` index cannot: pre-evolution and multi-valued files
    * that still carry stats. Unstatted files keep (must-scan). */
  private def specStatsKeep(m: ManifestData, files: Seq[String],
      spec: PartitionSpec, lo: Long, hi: Long): Set[String] = spec.transform match {
    case t if t == "identity" || divWidth(t).isDefined =>
      val tx: Long => Long = divWidth(t).fold(identity[Long] _)(w => Math.floorDiv(_, w))
      val stats = m.stats.filter(_.col == spec.col)
      val statted = stats.map(_.file).toSet
      (files.filterNot(statted) ++
        stats.filter(st => tx(st.max) >= lo && tx(st.min) <= hi).map(_.file)).toSet
    case "year" | "month" =>
      val stats = m.typedStats.filter(st => st.col == spec.col && st.kind == "date")
        .flatMap(st => scala.util.Try((st.file, st.lo.toLong, st.hi.toLong)).toOption)
      val statted = stats.map(_._1).toSet
      def tx(epochDay: Long): Long = {
        val d = java.time.LocalDate.ofEpochDay(epochDay)
        if (spec.transform == "year") d.getYear.toLong
        else d.getYear.toLong * 100 + d.getMonthValue
      }
      (files.filterNot(statted) ++
        stats.filter { case (_, mn, mx) => tx(mx) >= lo && tx(mn) <= hi }
          .map(_._1)).toSet
    // bucket<N> (a hash is not monotone — a column range maps to no
    // bucket range) and unknown transforms: no sound stats mapping —
    // every file must-scans on this half of the dual prune
    case _ => files.toSet
  }

  /** Partition-pruned read (r16): the committed state restricted to
    * partition values ∈ [lo, hi] under the resolved manifest's OWN
    * [[PartitionSpec]] — files whose recorded `v` value falls outside
    * the range are NEVER OPENED, before any file stat is consulted;
    * files without a value line (pre-evolution files, multi-valued
    * files) are then judged by their FILE STATS on the spec column
    * (dual pruning — every transform is monotone, so a column range
    * maps to a transform range), and only files neither index can
    * clear are scanned; the exact transform filter runs on top, so the
    * indexes only cut IO, never correctness. With `version` (or a
    * [[versionAsOf]]-resolved id) the prune applies under THAT
    * manifest's spec and values — partition pruning composes with time
    * travel, the year-sliced report read (`BETWEEN &p_year_from AND
    * &p_year_to`) on yesterday's snapshot. Throws when the resolved
    * manifest carries no spec (asking for a partition read of an
    * unpartitioned table is a wiring bug); None when nothing was ever
    * committed. All-pruned → empty frame. Lazy — see the read-laziness
    * contract. */
  def readPartitionRange(spark: SparkSession, dir: String, lo: Long, hi: Long,
      version: Option[Long] = None): Option[DataFrame] =
    readPartitionRanges(spark, dir, Seq(Some((lo, hi))), version)

  /** Multi-dimension partition-pruned read (r17): `ranges(d)` probes
    * spec dimension `d` with an inclusive transform-value range (None
    * = unconstrained); fewer ranges than dimensions leaves the tail
    * unconstrained. Pruning INTERSECTS the per-dimension keep sets —
    * each dimension's `v`-tuple index AND its file-stats mapping (dual
    * pruning per dimension) — so a file survives only when EVERY
    * constrained dimension could hold matching rows; the exact
    * transform filters run on top, so the indexes only cut IO, never
    * correctness. The reference's Q2/Q3 two-dimension report filters
    * (year + supplier/state — LQY_query2.txt:79-81, LQY_query3.txt:92)
    * are exactly this shape over a (year, dim2)-partitioned fact.
    * Composes with version/timestamp travel like the r16 reader; same
    * no-spec throw, all-pruned → empty frame, lazy contract. */
  def readPartitionRanges(spark: SparkSession, dir: String,
      ranges: Seq[Option[(Long, Long)]],
      version: Option[Long] = None): Option[DataFrame] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).flatMap { m =>
      if (m.specs.isEmpty) throw new IllegalStateException(
        s"SnapshotStore.readPartitionRanges: $dir carries no partition spec" +
          version.fold(" at the committed head")(v => s" at version $v"))
      if (ranges.size > m.specs.size) throw new IllegalArgumentException(
        s"SnapshotStore.readPartitionRanges: ${ranges.size} ranges probe a " +
          s"${m.specs.size}-dimension spec ${m.specs.mkString(", ")}")
      val files = manifestDataFiles(fs, tgt, m)
      val dims = ranges.zipWithIndex.collect { case (Some((lo, hi)), d) => (d, lo, hi) }
      val keepSet = dims.foldLeft(files.toSet) { case (acc, (d, lo, hi)) =>
        acc.intersect(partitionKeep(m, files, d, lo, hi))
          .intersect(specStatsKeep(m, files, m.specs(d), lo, hi))
      }
      val keep = files.filter(keepSet).sorted
      // all-pruned = empty result, not a missing table (see readKeyRange);
      // a zero-file version resolves None like every other reader
      readFilesAs(spark, dir, if (keep.isEmpty) files.sorted else keep, m.schema).map { df =>
        val exact = dims
          .map { case (d, lo, hi) => transformColumn(m.specs(d), df).between(lo, hi) }
          .reduceOption(_ && _)
          .fold(df)(df.filter)
        if (keep.isEmpty) exact.limit(0) else exact
      }
    }
  }

  /** The LEADING partition-spec dimension the head (or `version`'s)
    * manifest was written under, if any — the r16 single-spec view;
    * multi-dimension tables report their full ordered list through
    * [[partitionSpecsOf]]. */
  def partitionSpecOf(spark: SparkSession, dir: String,
      version: Option[Long] = None): Option[PartitionSpec] =
    partitionSpecsOf(spark, dir, version).headOption

  /** The ORDERED partition-spec list the head (or `version`'s)
    * manifest was written under (empty = unpartitioned) — what a
    * writer consults before choosing how to shape a commit, and what
    * the partition-evolution spec pins. */
  def partitionSpecsOf(spark: SparkSession, dir: String,
      version: Option[Long] = None): Seq[PartitionSpec] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).toSeq.flatMap(_.specs)
  }

  /** The per-file partition values the head (or `version`'s) manifest
    * records (empty when unpartitioned) — metadata only, for specs and
    * operators auditing the layout. */
  def filePartitionsOf(spark: SparkSession, dir: String,
      version: Option[Long] = None): Seq[FilePartition] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).toSeq.flatMap(_.partVals)
  }

  /** The head (or `version`'s) per-file NULL-COUNT stats (empty when
    * the commit carries none) — metadata only, the IS NULL index. */
  def fileNullStats(spark: SparkSession, dir: String,
      version: Option[Long] = None): Seq[FileNullStat] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).toSeq.flatMap(_.nullStats)
  }

  /** The head (or `version`'s) per-file ROW COUNTS (file → rows; empty
    * when the commit carries none) — metadata only, what turns a null
    * count into an IS NOT NULL prune (nulls = rows → no non-null row). */
  def fileRowCounts(spark: SparkSession, dir: String,
      version: Option[Long] = None): Map[String, Long] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).map(_.rowCounts).getOrElse(Map.empty)
  }

  /** One resolved version's FULL metadata view, from a SINGLE manifest
    * resolution (r17 — for the DSv2 planner, whose scan build needs
    * files + every index at once: seven separate accessor calls would
    * re-list and re-parse per call, and a commit landing between two
    * of them could pair one version's file list with another's specs). */
  private[graft] final case class TableMeta(files: Seq[String],
      stats: Seq[FileStat], typedStats: Seq[TypedFileStat],
      specs: Seq[PartitionSpec], partVals: Seq[FilePartition],
      rowCounts: Map[String, Long], nullStats: Seq[FileNullStat],
      schema: Option[org.apache.spark.sql.types.StructType])

  /** The committed head's (version, file list) from ONE manifest
    * resolution — the atomic read an OCC append bases itself on
    * (separate currentVersion/currentFiles calls could straddle a
    * concurrent commit and pair one version's id with another's
    * files; review r17). */
  private[graft] def headState(spark: SparkSession,
      dir: String): Option[(Long, Seq[String])] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentManifest(fs, tgt).map { case (id, m) =>
      (id, manifestDataFiles(fs, tgt, m))
    }
  }

  private[graft] def tableMeta(spark: SparkSession, dir: String,
      version: Option[Long]): Option[TableMeta] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).map(m => TableMeta(
      manifestDataFiles(fs, tgt, m), m.stats, m.typedStats, m.specs,
      m.partVals, m.rowCounts, m.nullStats, m.schema))
  }

  /** NULL-predicate pruned read (r17 — what min/max stats can never
    * answer, recorded per file as `n`/`r` lines the way Delta keeps
    * nullCount): the committed state restricted to `column IS NULL`
    * (`isNull = true`) or `column IS NOT NULL`, opening only the files
    * that can hold a matching row — for IS NULL a file with a recorded
    * null count of 0 prunes; for IS NOT NULL a file whose null count
    * EQUALS its recorded row count (all-null) prunes. Files without
    * both lines must-scan (absence is never a prune), and the exact
    * predicate runs on top, so the index only cuts IO. The reference's
    * open-loan measures (`returnDate IS NULL`,
    * 05_InitialLoading.sql:375-390) are the structural consumer.
    * Composes with version travel; None when never committed;
    * all-pruned → empty frame; lazy. */
  def readNullFilter(spark: SparkSession, dir: String, column: String,
      isNull: Boolean, version: Option[Long] = None): Option[DataFrame] = {
    import org.apache.spark.sql.functions.col
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).flatMap { m =>
      val files = manifestDataFiles(fs, tgt, m)
      val nulls = m.nullStats.filter(_.col == column).map(st => st.file -> st.nulls).toMap
      val keep = files.filter { f =>
        nulls.get(f) match {
          case None => true // unstatted → must scan
          case Some(n) =>
            if (isNull) n > 0L
            else m.rowCounts.get(f).forall(_ != n) // no row count → must scan
        }
      }.sorted
      // all-pruned = empty result, not a missing table (see readKeyRange)
      readFilesAs(spark, dir, if (keep.isEmpty) files.sorted else keep, m.schema).map { df =>
        val exact = df.filter(if (isNull) col(column).isNull else col(column).isNotNull)
        if (keep.isEmpty) exact.limit(0) else exact
      }
    }
  }

  /** The latest transaction version the table recorded for `appId`
    * (the Delta txn lookup): what an at-least-once driver consults to
    * decide where to resume a multi-table transaction. None when no
    * commit ever carried the marker. Growth bound: markers carry
    * forever (dropping one would re-enable the duplicate it guards
    * against — Delta expires them only under an explicit retention
    * config), one ~50-byte line per distinct writer identity; writer
    * identities are per-table-per-checkpoint and only multiply on
    * deliberate checkpoint recreation, so manifests stay
    * metadata-scale. */
  def lastTxnVersion(spark: SparkSession, dir: String, appId: String): Option[Long] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentManifest(fs, tgt).flatMap(_._2.txns.get(appId))
  }

  /** UTF-8 bytes of `s` truncated to ≤ [[StatPrefixBytes]]; ._2 =
    * whether bytes were dropped. Truncation may split a multi-byte
    * codepoint — harmless, because every stat comparison (write-side
    * and prune-side) runs in raw byte space, never through a decode. */
  private def truncBytes(s: String): (Array[Byte], Boolean) = {
    val b = s.getBytes("UTF-8")
    if (b.length <= StatPrefixBytes) (b, false)
    else (java.util.Arrays.copyOf(b, StatPrefixBytes), true)
  }

  /** Smallest byte string strictly greater than EVERY string carrying
    * prefix `p`: drop trailing 0xFF bytes, increment the last remaining
    * byte. None when p is all-0xFF (no finite upper bound exists). */
  private[etl] def incrBytes(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == -1) i -= 1
    if (i < 0) None
    else {
      val r = java.util.Arrays.copyOf(p, i + 1)
      r(i) = ((r(i) & 0xFF) + 1).toByte
      Some(r)
    }
  }

  /** Unsigned lexicographic byte compare (memcmp order — identical to
    * Spark UTF8String / parquet binary / DuckDB default collation). */
  private[etl] def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Every nested level forced nullable — the shape a mergeSchema read
    * produces and the only sound recording for a file list that mixes
    * schema generations (a pre-evolution file projects the evolved
    * column as null; a non-null recorded field over actual nulls would
    * be a codegen correctness hazard, not just a lie). */
  private def asNullable(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = asNullable(f.dataType), nullable = true)))
      case a: ArrayType => a.copy(elementType = asNullable(a.elementType), containsNull = true)
      case m: MapType => m.copy(valueType = asNullable(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  /** prev ∪ next, ADDITIVELY: every prev field keeps its position and
    * type (a field the delta dropped stays — reused files still carry
    * it, exactly like the merged-footer read); next-only fields append.
    * A same-name field whose type differs (recursively, ignoring
    * nullability) violates the additive-evolution contract and throws —
    * at WRITE time since r17, where the mergeSchema fallback could only
    * fail at read. */
  private[etl] def mergeSchemas(prev: org.apache.spark.sql.types.StructType,
      next: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType = {
    val nextByName = next.fields.map(f => f.name -> f).toMap
    val kept = prev.fields.map { pf =>
      nextByName.get(pf.name).foreach { nf =>
        // structural equality after recursive nullability normalization
        // (DataType.sameType is private[sql])
        if (asNullable(pf.dataType) != asNullable(nf.dataType))
          throw new IllegalArgumentException(
            s"SnapshotStore: column ${pf.name} changes type ${pf.dataType.simpleString} → " +
              s"${nf.dataType.simpleString} across a file-reuse commit — evolution is " +
              "additive by contract, never coercive")
      }
      pf
    }
    val prevNames = prev.fieldNames.toSet
    val added = next.fields.filterNot(f => prevNames.contains(f.name))
    org.apache.spark.sql.types.StructType(kept ++ added)
  }

  /** The table schema the head (or `version`'s) manifest records, if
    * its commit carried a `c` line — what readers plan with (zero
    * footer reads); None on pre-r17 manifests. */
  def tableSchema(spark: SparkSession, dir: String,
      version: Option[Long] = None): Option[org.apache.spark.sql.types.StructType] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFor(fs, tgt, version).flatMap(_.schema)
  }

  /** Base64 with a `-` sentinel for the empty string (standard Base64
    * never emits `-`, and an empty token would break the space-split). */
  private def encB64(b: Array[Byte]): String = {
    val s = java.util.Base64.getEncoder.encodeToString(b)
    if (s.isEmpty) "-" else s
  }

  private[etl] def decB64(s: String): Array[Byte] =
    if (s == "-") Array.emptyByteArray else java.util.Base64.getDecoder.decode(s)

  /** Read the latest committed state. None when nothing was ever
    * committed. Lazy — see the read-laziness contract above. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentManifest(fs, tgt).map { case (_, m) => readManifest(spark, tgt, fs, m) }
  }

  /** Time travel: read exactly version `id` (committed), if its manifest
    * and files are still retained — short-circuits on the id before
    * any content read. Lazy — see the read-laziness contract above. */
  def readVersion(spark: SparkSession, dir: String, id: Long): Option[DataFrame] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFiles(fs, tgt).find(_._1 == id)
      .flatMap { case (_, p) => resolve(fs, tgt, p) }
      .map(m => readManifest(spark, tgt, fs, m))
  }

  /** Timestamp travel: the newest committed version whose pinned as-of
    * timestamp is ≤ `asOfMicros` — "the table as of yesterday". Commits
    * without timestamp metadata never match (a timestamp query against
    * an untimestamped commit has no defined answer); None when no
    * retained commit qualifies (asking before the first commit).
    * Resolution walks newest-first and stops at the first qualifying
    * commit, so the common "as of now" query reads one manifest. Lazy —
    * see the read-laziness contract above. */
  def readAsOf(spark: SparkSession, dir: String, asOfMicros: Long): Option[DataFrame] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFiles(fs, tgt).iterator
      .map { case (_, p) => resolve(fs, tgt, p) }
      .collectFirst { case Some(m) if m.asOf.exists(_ <= asOfMicros) =>
        readManifest(spark, tgt, fs, m) }
  }

  /** Atomically claim `p` by create-no-overwrite and write `content`.
    * Returns false when the path already exists (someone else claimed
    * it). On the local filesystem Hadoop's `create(p, overwrite =
    * false)` is a non-atomic exists()+truncating-open AND rename(2)
    * silently replaces — so the `file` scheme routes through
    * java.io.File.createNewFile, which the JDK guarantees atomic
    * (O_CREAT|O_EXCL). Other schemes use `fs.create(p, false)`: atomic
    * on HDFS; object stores supply their own conditional-put. The
    * content write AFTER the claim is not atomic — readers tolerate a
    * torn manifest (resolves None until content + `_SUCCESS` agree). */
  private def claimFile(fs: FileSystem, p: Path, content: Array[Byte]): Boolean = {
    val isLocal = Option(p.toUri.getScheme).forall(s => s == "file") &&
      fs.getUri.getScheme == "file"
    if (isLocal) {
      val f = new java.io.File(fs.makeQualified(p).toUri.getPath)
      if (!f.createNewFile()) return false
      val out = new java.io.FileOutputStream(f)
      try out.write(content) finally out.close()
      true
    } else {
      // ONLY an already-exists outcome means "claimed" — a permission/
      // quota/network IOException must propagate, or acquireFence would
      // hot-loop forever and promote would report a phantom conflict
      val out =
        try fs.create(p, false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
          case _: java.nio.file.FileAlreadyExistsException        => return false
        }
      try out.write(content) finally out.close()
      true
    }
  }

  private def fenceFiles(fs: FileSystem, tgt: Path): Seq[Long] = {
    if (!fs.exists(tgt)) return Nil
    fs.listStatus(tgt).toIndexedSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith(FencePrefix))
        scala.util.Try(n.stripPrefix(FencePrefix).toLong).toOption
      else None
    }
  }

  /** Mint a writer fence: the returned token is newer than every fence
    * ever minted on this table, established by the same atomic
    * exclusive-create device the commit path uses (a collision means
    * another writer just fenced — retry past it). A promote passing
    * this token fails with [[FencedException]] once any NEWER fence
    * exists — the zombie-writer failure mode becomes an explicit
    * contract violation instead of a filesystem race. Fence files are
    * tiny and never GC'd (one per writer generation, not per commit). */
  def acquireFence(spark: SparkSession, dir: String): Long = {
    val (fs, tgt) = fsOf(spark, dir)
    if (!fs.exists(tgt)) fs.mkdirs(tgt)
    var attempt = fenceFiles(fs, tgt).foldLeft(-1L)(math.max) + 1
    while (true) {
      if (claimFile(fs, new Path(tgt, f"$FencePrefix$attempt%020d"), Array.emptyByteArray))
        return attempt
      attempt = math.max(attempt + 1, fenceFiles(fs, tgt).foldLeft(-1L)(math.max) + 1)
    }
    -1L // unreachable
  }

  /** Commit `df` as the next version and return its id.
    *
    * `preferredId` seeds the monotonic id (a stream passes its batchId
    * so fresh checkpoints over old tables continue PAST the old ids
    * rather than colliding below them); `keep` bounds the retained
    * history; `asOfMicros` pins the commit's as-of timestamp for
    * [[readAsOf]] (caller-supplied, never wall clock — replays must
    * commit identical metadata); `fence` ties the commit to an
    * [[acquireFence]] token.
    *
    * `reuseFiles` (root-relative, normally [[currentFiles]]) makes the
    * commit INCREMENTAL: `df` carries only the NEW rows, which land in
    * this commit's primary directory, and the manifest's explicit file
    * list references the reused files in place — an unchanged file is
    * never rewritten, the refresh's write cost is O(delta) instead of
    * O(table). The files must belong to still-retained versions (they
    * always do when taken from [[currentFiles]] under this commit's own
    * `keep`).
    *
    * `expectCurrent` (use [[NoVersion]] for "table was empty") turns
    * the commit optimistic: if the committed head no longer equals the
    * version the caller's merge was computed FROM, the promote throws
    * [[ConflictException]] instead of committing a lost update; the
    * exclusive manifest claim backstops the window the pre-check cannot
    * see (two writers racing past the same head: exactly one claim
    * succeeds, the loser conflicts).
    *
    * `txn` records an idempotent-transaction marker (the Delta
    * txnAppId/txnVersion shape): a commit whose (appId, version) the
    * table already carries at-or-past throws
    * [[TxnAlreadyAppliedException]] — treat as success. NOTE the
    * concurrency contract: the pre-check/re-check alone closes the
    * duplicate window only for SEQUENTIAL re-runs (crash → rerun).
    * TWO CONCURRENT writers carrying the same (appId, version) can
    * BOTH land when torn debris above the head bumps one writer's
    * claimed id past the other's — exactly-once under concurrency
    * additionally requires `expectCurrent` (occ), whose head pin
    * turns the race into a [[ConflictException]] whose retry then
    * hits the marker; [[VersionedLoad.idempotent]] composed with
    * occ + [[VersionedLoad.withConflictRetry]] is the supported
    * combination (r16 ADVICE).
    *
    * `partitionSpec` / `partitionSpecs` declare the table's ordered
    * partition-spec dimensions (single + extra tail, mirroring
    * statsCol/statsCols); see [[PartitionSpec]]. */
  def promote(spark: SparkSession, dir: String, df: DataFrame,
      preferredId: Long = 0L, keep: Int = 2,
      asOfMicros: Option[Long] = None, fence: Option[Long] = None,
      reuseFiles: Seq[String] = Nil, expectCurrent: Option[Long] = None,
      statsCol: Option[String] = None, statsCols: Seq[String] = Nil,
      partitionSpec: Option[PartitionSpec] = None,
      partitionSpecs: Seq[PartitionSpec] = Nil,
      txn: Option[(String, Long)] = None): Long = {
    val (fs, tgt) = fsOf(spark, dir)
    val effCols = (statsCol.toSeq ++ statsCols).distinct
    val callerSpecs = partitionSpec.toSeq ++ partitionSpecs
    // idempotent-transaction pre-check (r16 — the Delta txnAppId/
    // txnVersion shape): a commit carrying a txn marker the table
    // already recorded at (or past) that version was applied by an
    // earlier run — refuse BEFORE the slow snapshot write. The check
    // re-runs on every retry of an occ loop, so a crash-rerun or a
    // raced duplicate converges on exactly-once per table.
    txn.foreach { case (app, ver) =>
      if (app.isEmpty || app.exists(_.isWhitespace))
        throw new IllegalArgumentException(
          s"SnapshotStore.promote: txn appId '$app' is empty or contains whitespace — " +
            "x manifest lines are space-delimited")
      if (currentManifest(fs, tgt).exists(_._2.txns.get(app).exists(_ >= ver)))
        throw new TxnAlreadyAppliedException(
          s"SnapshotStore: txn ($app, $ver) is already applied on $dir — " +
            "an earlier run committed it; treat as success")
    }
    // partition-spec validation BEFORE the slow snapshot write, like the
    // stat columns: an unknown transform or a type mismatch must not
    // leave an orphaned snapshot directory behind. transformColumn is
    // the shared write/read builder, so a spec that validates here
    // prunes identically on read.
    callerSpecs.foreach { ps =>
      if (ps.col.exists(_.isWhitespace) || ps.transform.exists(_.isWhitespace) ||
          ps.col.contains("`"))
        throw new IllegalArgumentException(
          s"SnapshotStore.promote: partition spec '$ps' contains whitespace or a " +
            "backtick — the p/v manifest lines are space-delimited and the div " +
            "transform quotes the column name")
      transformColumn(ps, df): Unit
    }
    // stat-column validation BEFORE the (slow) snapshot write — a bad
    // stat request must not leave an orphaned snapshot directory behind
    effCols.foreach { c =>
      // stat lines are space-delimited with the column name in a token
      // position — a whitespace-bearing name would misparse on read
      // (Try → None: a safe must-scan degrade, but an UNDETECTABLE loss
      // of the skipping index; r14 ADVICE)
      if (c.exists(_.isWhitespace))
        throw new IllegalArgumentException(
          s"SnapshotStore.promote: statsCol '$c' contains whitespace — " +
            "stat lines are space-delimited and the name would misparse on read")
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.DateType | org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.StringType => ()
        case dt => throw new IllegalArgumentException(
          s"SnapshotStore.promote: statsCol $c must be an integral, date, timestamp, " +
            s"or string column, got $dt")
      }
    }
    // the id moves past EVERY listed manifest, not just the committed
    // head: debris squatting at committed-head + 1 would otherwise make
    // the claim below fail with the SAME recomputed id on every retry,
    // wedging the table until manual cleanup (resolution, by contrast,
    // rightly trusts committed manifests only)
    val maxListed = manifestFiles(fs, tgt).headOption.map(_._1)
    val nextId = math.max(preferredId, maxListed.map(_ + 1).getOrElse(0L))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val snapName = f"$SnapshotPrefix$nextId%020d-$nonce"
    df.write.mode("overwrite").parquet(new Path(tgt, snapName).toString)
    // fence + expectation checks AFTER the (slow) snapshot write,
    // immediately before the claim: the narrowest window a zombie or a
    // raced merge can slip through; the exclusive create remains the
    // final arbiter regardless
    fence.foreach { f =>
      val newest = fenceFiles(fs, tgt).foldLeft(-1L)(math.max)
      if (newest > f)
        throw new FencedException(
          s"SnapshotStore: fence $f superseded by $newest — a newer writer owns $dir; " +
            s"this writer's snapshot $snapName is unpromoted and GC-eligible")
    }
    expectCurrent.foreach { exp =>
      val head = currentManifest(fs, tgt).map(_._1).getOrElse(NoVersion)
      if (head != exp)
        throw new ConflictException(
          s"SnapshotStore: committed head is $head but this merge was computed from $exp — " +
            s"re-read and re-merge; snapshot $snapName is unpromoted and GC-eligible")
      // a CLAIMED manifest above the head is a mid-flight commit whose
      // content may land after this check — skipping past it (as the
      // debris-proof id rule otherwise would) could commit a merge that
      // silently shadows those rows once they resolve. OCC refuses to
      // race an in-flight claim; the cost is that torn debris above the
      // head blocks expectCurrent promotes until a non-OCC writer moves
      // past it or the debris is cleaned — correctness over
      // availability, and only in the optional OCC mode (plain promotes
      // keep the debris-proof behavior unchanged).
      val maxNow = manifestFiles(fs, tgt).headOption.map(_._1).getOrElse(NoVersion)
      if (maxNow > head)
        throw new ConflictException(
          s"SnapshotStore: manifest id $maxNow is claimed above head $head (in-flight or torn " +
            s"commit) — refusing to race it; snapshot $snapName is unpromoted and GC-eligible")
    }
    val ownFiles = dirDataFiles(fs, tgt, snapName)
    val fileLines =
      if (reuseFiles.isEmpty) ""
      else (reuseFiles ++ ownFiles).map("\nf " + _).mkString
    // per-file column stats (statsCol/statsCols): min/max per stat
    // column — computed for THIS commit's own files by ONE scan of the
    // just-written delta regardless of column count (O(delta), and the
    // files are page-cache warm), CARRIED FORWARD from the previous
    // manifest for reused files (a reused file's content is immutable
    // by construction, so its stats never go stale — ALL its carried
    // stats stay valid, whichever columns this commit stats). All-null
    // files carry no stat line and are never prunable — absence means
    // "must scan", the safe default. Integral columns record `s`
    // (long) lines; date and string columns record typed `t` lines
    // ([[TypedFileStat]]); anything else fails loudly — a lossy cast
    // would record bounds the true values escape, and a pruner
    // trusting them would silently skip a file it must scan.
    // reused files keep their stats UNCONDITIONALLY — even a commit
    // that stats nothing itself (restore's metadata-only promote, a
    // plain refresh without statsCol) must not silently drop the
    // skipping index its reused files already carry
    // one head-manifest read serves the carried metadata: txn markers
    // and the PARTITION SPEC carry UNCONDITIONALLY (both are table
    // metadata surviving even a full overwrite — a merge whose batch
    // touches every file commits with reuseFiles = Nil, and dropping
    // the spec there would silently lose the partition index; Delta
    // keeps txn versions and partitioning across any commit the same
    // way); stats and per-file partition VALUES carry only with file
    // reuse (they describe immutable reused files)
    val prevAny: Option[ManifestData] = currentManifest(fs, tgt).map(_._2)
    val prevManifest: Option[ManifestData] =
      if (reuseFiles.isEmpty) None else prevAny
    // effective partition specs: the caller's ordered list, or — for an
    // incremental commit — CARRIED from the head manifest, so a chain of
    // refreshes/merges keeps its table partitioned without re-declaring
    // the specs on every commit. A caller-passed list that differs from
    // the head's is partition EVOLUTION: it applies from this commit
    // forward. The carried list survives ALL-OR-NOTHING: a FULL REWRITE
    // (no reuse) that dropped or retyped ANY spec column defines a table
    // the spec list can no longer describe — carrying a partial list
    // would silently renumber the dimensions, and carrying the full one
    // would make every readPartitionRanges throw forever; dropping the
    // whole list (the only way to shed specs, and the sound one) leaves
    // an unpartitioned head.
    val effSpecs: Seq[PartitionSpec] =
      if (callerSpecs.nonEmpty) callerSpecs
      else prevAny.map(_.specs).getOrElse(Nil) match {
        case carried if carried.nonEmpty && (reuseFiles.nonEmpty ||
            carried.forall(ps => scala.util.Try(transformColumn(ps, df)).isSuccess)) =>
          carried
        case _ => Nil
      }
    val carriedLines: Seq[String] = if (reuseFiles.isEmpty) Nil else {
      val reused = reuseFiles.toSet
      prevManifest.toSeq.flatMap(_.stats)
        .filter(st => reused.contains(st.file))
        .map(st => s"s ${st.col} ${st.min} ${st.max} ${st.file}") ++
      prevManifest.toSeq.flatMap(_.typedStats)
        .filter(st => reused.contains(st.file))
        .map(st => s"t ${st.kind} ${st.col} ${st.lo} ${st.hi} ${if (st.hiTrunc) "T" else "E"} ${st.file}") ++
      // row/null counts describe immutable reused files like min/max
      // stats do — carried unconditionally (r17)
      prevManifest.toSeq.flatMap(_.rowCounts.toSeq.sortBy(_._1))
        .filter { case (f, _) => reused.contains(f) }
        .map { case (f, rc) => s"r $rc $f" } ++
      prevManifest.toSeq.flatMap(_.nullStats)
        .filter(st => reused.contains(st.file))
        .map(st => s"n ${st.col} ${st.nulls} ${st.file}")
    }
    // reused files keep their partition values ONLY when the spec list
    // is unchanged: after an evolution the old `v` tuples were computed
    // under the old transforms (or carry the wrong arity) and would
    // prune wrongly — dropping them degrades pre-evolution files to
    // must-scan, the sound default (Iceberg's old-data-keeps-old-spec,
    // expressed per manifest)
    val carriedPartLines: Seq[String] =
      if (reuseFiles.isEmpty || effSpecs.isEmpty) Nil
      else if (prevManifest.exists(_.specs == effSpecs)) {
        val reused = reuseFiles.toSet
        prevManifest.toSeq.flatMap(_.partVals)
          .filter(pv => reused.contains(pv.file))
          .map(pv => s"v ${pv.values.map(_.fold("?")(_.toString)).mkString(" ")} ${pv.file}")
      } else Nil
    val (ownLines, ownPartLines): (Seq[String], Seq[String]) = {
      import org.apache.spark.sql.functions.{col => fcol, count => fcount, datediff,
        expr, lit, max => fmax, min => fmin}
      import org.apache.spark.sql.types.{DateType, StringType}
      if (ownFiles.isEmpty || (effCols.isEmpty && effSpecs.isEmpty)) (Nil, Nil)
      else {
        val reread = spark.read.parquet(new Path(tgt, snapName).toString)
        // a CARRIED spec may reference a column this commit's own rows
        // lack or cannot transform (additive-evolution edge): its own
        // files then record no value on that DIMENSION (`?` when other
        // dimensions are concrete, no line when none is) and must-scan
        // there — absence, never a wrong value
        val specTxs: Seq[Option[org.apache.spark.sql.Column]] = effSpecs.map(ps =>
          scala.util.Try(transformColumn(ps, reread)).toOption)
        val availDims = specTxs.zipWithIndex.collect { case (Some(tx), d) => (tx, d) }
        // ONE O(delta) scan computes everything per file: row count
        // (`r`), per stat column min/max + NON-NULL count (`s`/`t` +
        // `n` — nulls = rows − non-nulls; count(col) is null-skipping
        // exactly like min/max, and null-ness is transform-independent
        // so the raw column serves every stat kind), and per spec
        // dimension the transform's min/max (a `v` component exactly
        // when single-valued and non-null)
        val statAggs = effCols.zipWithIndex.flatMap { case (c, i) =>
          val base = df.schema(c).dataType match {
            case StringType => fcol(c)
            // epoch days via datediff, no java.sql.Date round trip
            case DateType => datediff(fcol(c), lit("1970-01-01").cast("date")).cast("long")
            // epoch micros — exact, session-TZ-independent
            case org.apache.spark.sql.types.TimestampType =>
              org.apache.spark.sql.functions.unix_micros(fcol(c))
            case _        => fcol(c).cast("long")
          }
          Seq(fmin(base).as(s"__mn$i"), fmax(base).as(s"__mx$i"),
            fcount(fcol(c)).as(s"__nn$i"))
        }
        val specAggs = availDims.flatMap { case (tx, d) =>
          Seq(fmin(tx).as(s"__pmn$d"), fmax(tx).as(s"__pmx$d")) }
        val aggs = Seq(fcount(lit(1)).as("__rc")) ++ statAggs ++ specAggs
        if (statAggs.isEmpty && specAggs.isEmpty) (Nil, Nil)
        else {
          val selCols = (effCols ++ effSpecs.map(_.col)).distinct
            .filter(reread.columns.contains)
          val rows = reread
            .select(expr("regexp_extract(input_file_name(), '([^/]+/[^/]+)$', 1)").as("__f")
              +: selCols.map(fcol): _*)
            .groupBy("__f")
            .agg(aggs.head, aggs.tail: _*)
            .collect().toSeq
          // row layout: 0 = __f, 1 = __rc, stat col i at (2+3i, 3+3i,
          // 4+3i), then available spec dim j at (base+2j, base+2j+1)
          val pBase = 2 + 3 * effCols.size
          val statLs = rows.flatMap { r =>
            val file = r.getString(0)
            val rc   = r.getLong(1)
            Seq(s"r $rc $file") ++
            effCols.zipWithIndex.flatMap { case (c, i) =>
              val (mnI, mxI, nnI) = (2 + 3 * i, 3 + 3 * i, 4 + 3 * i)
              val nullLine = s"n $c ${rc - r.getLong(nnI)} $file"
              val rangeLine =
                if (r.isNullAt(mnI) || r.isNullAt(mxI)) None
                else df.schema(c).dataType match {
                  case StringType =>
                    val (loP, _)    = truncBytes(r.getString(mnI))
                    val (hiP, hiT)  = truncBytes(r.getString(mxI))
                    Some(s"t str $c ${encB64(loP)} ${encB64(hiP)} ${if (hiT) "T" else "E"} $file")
                  case DateType =>
                    Some(s"t date $c ${r.getLong(mnI)} ${r.getLong(mxI)} E $file")
                  case org.apache.spark.sql.types.TimestampType =>
                    Some(s"t ts $c ${r.getLong(mnI)} ${r.getLong(mxI)} E $file")
                  case _ =>
                    Some(s"s $c ${r.getLong(mnI)} ${r.getLong(mxI)} $file")
                }
              rangeLine.toSeq :+ nullLine
            }
          }
          val availIdx: Map[Int, Int] = availDims.map(_._2).zipWithIndex.toMap
          val partLs = if (availDims.isEmpty) Nil else rows.flatMap { r =>
            val vals: Seq[Option[Long]] = effSpecs.indices.map { d =>
              availIdx.get(d).flatMap { j =>
                val (pmnI, pmxI) = (pBase + 2 * j, pBase + 2 * j + 1)
                if (r.isNullAt(pmnI) || r.isNullAt(pmxI) ||
                    r.getLong(pmnI) != r.getLong(pmxI)) None
                else Some(r.getLong(pmnI))
              }
            }
            if (vals.forall(_.isEmpty)) None
            else Some(s"v ${vals.map(_.fold("?")(_.toString)).mkString(" ")} ${r.getString(0)}")
          }
          // a zero-ROW own file produces no group row above (the agg
          // emits no frame row for it) but its row count is still a
          // KNOWN fact — record `r 0` (Delta's numRecords=0 shape) so
          // the count index stays COMPLETE: the DSv2 metadata-only
          // aggregates require a row count for every file, and a full
          // delete's empty rewrite must not silently break them
          val statted = rows.map(_.getString(0)).toSet
          val zeroRowLs = ownFiles.filterNot(statted).map(f => s"r 0 $f")
          (statLs ++ zeroRowLs, partLs)
        }
      }
    }
    val statLines = (ownLines ++ carriedLines).map("\n" + _).mkString
    val specLine  = effSpecs.map(ps => s"\np ${ps.transform} ${ps.col}").mkString
    val partLines = (ownPartLines ++ carriedPartLines).map("\n" + _).mkString
    // recorded table schema (r17 — see readManifest): a full rewrite
    // records the delta's own schema; a file-reuse commit records
    // prev ∪ delta additively (type conflicts throw — better at write
    // than the fallback's at-read failure). Reuse over a manifest with
    // NO recorded schema records nothing — the reused files' union is
    // unknowable without the footer reads this feature exists to avoid,
    // and absence just keeps the mergeSchema fallback for this version.
    val schemaLine: String = {
      val recorded: Option[org.apache.spark.sql.types.StructType] =
        if (reuseFiles.isEmpty) Some(df.schema)
        else prevAny.flatMap(_.schema).map(ps => mergeSchemas(ps, df.schema))
      recorded.map(s => "\nc " + java.util.Base64.getEncoder.encodeToString(
        asNullable(s).asInstanceOf[org.apache.spark.sql.types.StructType]
          .json.getBytes("UTF-8"))).getOrElse("")
    }
    // re-check the txn marker against the freshest head read (narrows
    // the pre-check→claim window; the exclusive claim + occ remain the
    // final arbiter for what this check cannot see)
    txn.foreach { case (app, ver) =>
      if (prevAny.exists(_.txns.get(app).exists(_ >= ver)))
        throw new TxnAlreadyAppliedException(
          s"SnapshotStore: txn ($app, $ver) was applied concurrently on $dir — " +
            s"treat as success; snapshot $snapName is unpromoted and GC-eligible")
    }
    val txnLines = (prevAny.map(_.txns).getOrElse(Map.empty) ++ txn.toMap)
      .toSeq.sortBy(_._1).map { case (a, v) => s"\nx $a $v" }.mkString
    // the `end` terminator line commits the content: the exclusive
    // create is atomic but this write is not, and a truncated file list
    // must never resolve as a committed subset (see ManifestData)
    val content = snapName + "\n" + asOfMicros.fold("")(_.toString) +
      fileLines + schemaLine + specLine + statLines + partLines + txnLines + "\nend"
    val mPath = new Path(tgt, f"$ManifestPrefix$nextId%020d")
    if (!claimFile(fs, mPath, content.getBytes("UTF-8"))) {
      val msg = s"SnapshotStore: manifest id $nextId was claimed concurrently — " +
        s"snapshot $snapName is unpromoted and GC-eligible"
      if (expectCurrent.isDefined) throw new ConflictException(msg)
      else throw new IllegalStateException(msg + " (concurrent writer?)")
    }
    gc(fs, tgt, keep, snapName)
    nextId
  }

  /** Best-effort retention, file-granular: keep the newest `keep`
    * COMMITTED manifests and every file they reference; a reader that
    * just resolved a retained manifest still finds its files intact.
    * Skipped entirely while the manifest count fits the retention bound
    * (orphan snapshot dirs from crashed writes linger until the first
    * GC-triggering commit — and forever in the keep = Int.MaxValue
    * full-log mode, where nothing is ever collected). Retention counts
    * COMMITTED manifests: torn debris with ids above the head must not
    * occupy keep slots, or a couple of junk files could push every
    * committed manifest — including the one just promoted — into the
    * dropped set and destroy the table's whole history. The cutoff is
    * the keep-th newest committed id; manifests at or above it
    * (committed or debris) are left alone, manifests below it go, and
    * snapshot files go exactly when NO retained manifest references
    * them — so a directory whose own manifest aged out keeps just the
    * files newer commits still reuse. */
  private def gc(fs: FileSystem, tgt: Path, keep: Int, justPromoted: String): Unit =
    try {
      val all = manifestFiles(fs, tgt)
      if (all.size > keep) {
        val committed = all.iterator
          .map { case (id, p) => (id, resolve(fs, tgt, p)) }
          .collect { case (id, Some(m)) => (id, m) }
          .take(keep).toSeq
        if (committed.size == keep) {
          val cutoff = committed.last._1
          // referenced = every root-relative file a retained committed
          // manifest reads, plus the whole just-promoted dir (its
          // manifest is by construction at/above the cutoff)
          val referenced = committed.flatMap { case (_, m) => manifestDataFiles(fs, tgt, m) }.toSet
          val primaries  = committed.map(_._2.snap).toSet + justPromoted
          all.filter(_._1 < cutoff).foreach { case (_, p) => fs.delete(p, false) }
          fs.listStatus(tgt).foreach { st =>
            val n = st.getPath.getName
            if (n.startsWith(SnapshotPrefix) && !primaries.contains(n)) {
              // a dir above the cutoff whose manifest was unreadable
              // this pass must survive whole (it may be mid-commit);
              // everything else keeps exactly its referenced files
              val claimedAbove = all.filter(_._1 >= cutoff).exists { case (_, p) =>
                readContent(fs, p).exists(parseManifest(_).snap == n)
              }
              if (!claimedAbove) {
                val files = dirDataFiles(fs, tgt, n)
                val (kept, dead) = files.partition(referenced.contains)
                if (kept.isEmpty) fs.delete(st.getPath, true)
                else dead.foreach(f => fs.delete(new Path(tgt, f), false))
              }
            }
          }
        }
      }
    } catch { case _: java.io.IOException => () }

  /** Standalone storage hygiene — the VACUUM of the heavyweight
    * formats: apply the commit-path retention WITHOUT committing
    * anything. Collects (a) manifests below the keep-th newest
    * committed id (only when a full keep set exists — the commit-path
    * rule), and (b) snapshot directories/files that NO retained
    * committed manifest references and NO still-listed manifest claims
    * — which is exactly the debris crashed writers leave: a snapshot
    * written but never claimed lingers FOREVER under normal operation
    * (the in-commit GC only fires when the manifest count exceeds
    * `keep`, and never in the keep = Int.MaxValue full-log mode).
    *
    * Contract: run QUIESCED (no in-flight writer on this table) — a
    * just-written, not-yet-claimed snapshot is indistinguishable from
    * crashed-writer debris and would be collected; a dir any listed
    * manifest names (committed or torn) survives whole, like the
    * commit-path rule. Best-effort like GC: IO errors are swallowed,
    * the table stays consistent regardless of where the sweep stops.
    *
    * RETENTION GUARD (r16 — the Delta VACUUM retention-duration check):
    * readers may park a version pin and read lazily, so collecting a
    * recent version loses files mid-read. With `nowMicros` supplied
    * (caller-pinned instant, never wall clock — the store's asOfDate
    * determinism discipline), every committed version whose pinned
    * as-of lies within `retentionMicros` of it is PROTECTED even past
    * the `keep` bound — a pin inside the retention window survives the
    * vacuum. Asking for a retention below [[MinVacuumRetentionMicros]]
    * throws unless `enforceRetention = false` is passed deliberately
    * (the Delta retentionDurationCheck escape hatch). Untimestamped
    * commits carry no age and rely on `keep` alone.
    *
    * TIME DOMAIN (r16 ADVICE): `nowMicros` must live in the SAME
    * LOGICAL time domain as the commits' pinned `asOfMicros` — age is
    * judged by their difference, so a wall-clock `now` against
    * historical business-time pins protects everything (or nothing)
    * rather than "the last 7 days". With `nowMicros` ABSENT the
    * retention window cannot apply at all, so the below-floor check is
    * skipped too: `keep` alone governs, and no floor error fires for
    * a parameter that has no effect. */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 16,
      nowMicros: Option[Long] = None,
      retentionMicros: Long = DefaultVacuumRetentionMicros,
      enforceRetention: Boolean = true): Unit = {
    if (nowMicros.isDefined && enforceRetention &&
        retentionMicros < MinVacuumRetentionMicros)
      throw new IllegalArgumentException(
        s"SnapshotStore.vacuum: retention ${retentionMicros}us is below the " +
          s"${MinVacuumRetentionMicros}us floor — a reader holding a recent version pin " +
          "would lose files mid-read; pass enforceRetention = false to override deliberately")
    try {
      val (fs, tgt) = fsOf(spark, dir)
      if (!fs.exists(tgt)) return
      val all = manifestFiles(fs, tgt)
      val committed = all.iterator
        .map { case (id, p) => (id, resolve(fs, tgt, p)) }
        .collect { case (id, Some(m)) => (id, m) }.toSeq
      val horizon = nowMicros.map(_ - retentionMicros)
      def young(m: ManifestData): Boolean = horizon.exists(h => m.asOf.exists(_ >= h))
      val byKeep = committed.take(keep)
      // retained = the keep-newest committed set, widened to every
      // version still inside the retention window; the cutoff is the
      // oldest protected id, and everything at/above it survives
      // (conservative — committed is newest-first, so the protected set
      // is effectively a prefix)
      val protectedIds = byKeep.map(_._1) ++ committed.filter(c => young(c._2)).map(_._1)
      val retained =
        if (protectedIds.isEmpty) committed.take(0)
        else { val cutoff = protectedIds.min; committed.filter(_._1 >= cutoff) }
      if (byKeep.size == keep && retained.nonEmpty) {
        val cutoff = retained.last._1
        all.filter(_._1 < cutoff).foreach { case (_, p) => fs.delete(p, false): Unit }
      }
      val referenced = retained.flatMap { case (_, m) => manifestDataFiles(fs, tgt, m) }.toSet
      val claimed = manifestFiles(fs, tgt)
        .flatMap { case (_, p) => readContent(fs, p).map(parseManifest(_).snap) }.toSet
      val protectWhole = retained.map(_._2.snap).toSet ++ claimed
      fs.listStatus(tgt).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(SnapshotPrefix) && !protectWhole.contains(n)) {
          val files = dirDataFiles(fs, tgt, n)
          val (kept, dead) = files.partition(referenced.contains)
          if (kept.isEmpty) fs.delete(st.getPath, true): Unit
          else dead.foreach(f => fs.delete(new Path(tgt, f), false): Unit)
        }
      }
    } catch { case _: java.io.IOException => () }
  }

  /** Optimistic multi-writer commit: re-read → re-merge → re-promote
    * until the commit lands or `maxAttempts` genuine conflicts pass.
    * `compute` receives the CURRENT committed state (None when the
    * table is empty) and returns the full desired next state; each
    * attempt fences (so stalled writers die loudly) and pins
    * `expectCurrent` to the version it read (so a commit that lands
    * between read and claim surfaces as a conflict, never a lost
    * update). Two genuine writers interleaving both commit, exactly
    * once each — the loser's merge re-runs on top of the winner's
    * state (spec: SnapshotStoreSpec "two writers both commit"). */
  def retryingPromote(spark: SparkSession, dir: String,
      compute: Option[DataFrame] => DataFrame,
      keep: Int = 2, asOfMicros: Option[Long] = None,
      maxAttempts: Int = 5): Long = {
    var attempt = 0
    while (true) {
      attempt += 1
      val fence = acquireFence(spark, dir)
      val (fs, tgt) = fsOf(spark, dir)
      val base = currentManifest(fs, tgt)
      val df = compute(base.map { case (_, m) => readManifest(spark, tgt, fs, m) })
      try {
        return promote(spark, dir, df, keep = keep, asOfMicros = asOfMicros,
          fence = Some(fence), expectCurrent = Some(base.map(_._1).getOrElse(NoVersion)))
      } catch {
        case e: FencedException   => if (attempt >= maxAttempts) throw e
        case e: ConflictException => if (attempt >= maxAttempts) throw e
      }
    }
    -1L // unreachable
  }
}
