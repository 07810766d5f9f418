package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal manifest-pointer table format — the lightweight native
  * answer to the "Delta/Iceberg ACID sink" scope decision (SURVEY
  * §7.3): versioned snapshot directories promoted by atomic renames of
  * monotonic manifest files, giving crash-safe commits, readers that
  * never observe a torn write, and O(1) time travel — without any
  * dependency beyond the filesystem.
  *
  * Protocol (single writer):
  *   - each commit writes a fresh `snapshot-<id>-<nonce>/` directory
  *     (never overwriting one a live manifest references), then
  *     promotes it by renaming a hidden temp file to `manifest-<id>` —
  *     rename-to-new-name, atomic on HDFS and POSIX;
  *   - manifest ids are strictly monotonic and always move PAST every
  *     id already listed — committed or debris (`max(preferredId,
  *     max listed id + 1)`): no manifest is ever deleted or rewritten
  *     on the commit path, there is no instant without a committed
  *     pointer, and torn debris squatting on an id can never wedge the
  *     table into recomputing the same colliding id on every retry
  *     (resolution still walks COMMITTED manifests only);
  *   - a manifest records the snapshot name plus optional commit
  *     metadata: an as-of TIMESTAMP (epoch micros, pinned by the
  *     caller — the engine's `asOfDate` determinism discipline, never
  *     wall clock) that [[readAsOf]] resolves for timestamp travel;
  *   - readers resolve the NEWEST manifest whose snapshot carries the
  *     `_SUCCESS` marker its writing job left, falling back past any
  *     torn write; `readVersion` resolves an exact id the same way;
  *   - GC (best-effort, inside the commit) retains the newest `keep`
  *     manifests and the snapshots they reference — `keep =
  *     Int.MaxValue` turns the table into a full time-travel log;
  *   - writer FENCING (optional): [[acquireFence]] mints a monotonic
  *     fence id by the same rename-to-new-name device; a promote
  *     carrying a fence fails by contract when a NEWER fence exists —
  *     a zombie writer that stalled across a failover dies loudly
  *     before its rename, instead of racing it. The manifest rename
  *     stays the final arbiter either way.
  *
  * Read laziness contract: [[read]]/[[readVersion]]/[[readAsOf]] return
  * a LAZY DataFrame over the resolved snapshot directory — the caller
  * must run its action while the version is still retained. With a
  * small `keep`, further promotes can GC the directory out from under a
  * parked frame (the scan then fails loudly mid-action, never returns
  * wrong rows). Callers that hold results across commits either
  * materialize promptly (the [[graft.streaming.Scd2Stream]] sink
  * collects each dim snapshot before its next promote) or pass a
  * retention bound that covers their read window.
  *
  * [[graft.streaming.Scd2Stream]] commits its dimension through this
  * store; `etl_snapshot_timetravel` demonstrates the batch-side
  * version/timestamp travel and `etl_incremental_versioned` the
  * crash-safe batch refresh.
  */
object SnapshotStore {

  private val ManifestPrefix = "manifest-"
  private val SnapshotPrefix = "snapshot-"
  private val FencePrefix    = "fence-"

  /** A promote carrying a stale fence observed a newer writer's fence
    * and refused to race it. */
  final class FencedException(msg: String) extends IllegalStateException(msg)

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

  private def readContent(fs: FileSystem, p: Path): Option[String] =
    scala.util.Try {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
    }.toOption.filter(_.nonEmpty)

  /** Manifest content: line 1 = snapshot dir name; line 2 (optional) =
    * the commit's pinned as-of timestamp in epoch micros. Commits
    * predating the metadata line parse with no timestamp. */
  private def parseManifest(content: String): (String, Option[Long]) = {
    val lines = content.split("\n", -1)
    val asOf = if (lines.length >= 2) scala.util.Try(lines(1).trim.toLong).toOption else None
    (lines(0).trim, asOf)
  }

  /** Resolve ONE manifest to its committed (snapshot name, asOf): content
    * parses and the snapshot directory carries `_SUCCESS` — a manifest
    * whose write raced a crash resolves to None. */
  private def resolve(fs: FileSystem, tgt: Path, manifest: Path): Option[(String, Option[Long])] =
    readContent(fs, manifest)
      .map(parseManifest)
      .filter { case (snap, _) => fs.exists(new Path(new Path(tgt, snap), "_SUCCESS")) }

  /** The newest COMMITTED snapshot — walks newest-first and stops at the
    * first manifest that resolves (normally the very first). */
  private[graft] def currentSnapshot(fs: FileSystem, tgt: Path): Option[(Long, Path)] =
    manifestFiles(fs, tgt).iterator
      .map { case (id, p) => (id, resolve(fs, tgt, p)) }
      .collectFirst { case (id, Some((snap, _))) => (id, new Path(tgt, snap)) }

  /** Latest committed version id, if any commit ever succeeded. */
  def currentVersion(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentSnapshot(fs, tgt).map(_._1)
  }

  /** Read the latest committed state. None when nothing was ever
    * committed. Lazy — see the read-laziness contract above. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentSnapshot(fs, tgt).map { case (_, snap) => spark.read.parquet(snap.toString) }
  }

  /** Time travel: read exactly version `id` (committed), if its manifest
    * and snapshot are still retained — short-circuits on the id before
    * any content read. Lazy — see the read-laziness contract above. */
  def readVersion(spark: SparkSession, dir: String, id: Long): Option[DataFrame] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFiles(fs, tgt).find(_._1 == id)
      .flatMap { case (_, p) => resolve(fs, tgt, p) }
      .map { case (snap, _) => spark.read.parquet(new Path(tgt, snap).toString) }
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
      .collectFirst { case Some((snap, Some(ts))) if ts <= asOfMicros =>
        spark.read.parquet(new Path(tgt, snap).toString) }
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
    * rename-to-new-name device the commit path uses (a collision means
    * another writer just fenced — retry past it). A promote passing
    * this token fails with [[FencedException]] once any NEWER fence
    * exists — the zombie-writer failure mode becomes an explicit
    * contract violation instead of a rename race. Fence files are tiny
    * and never GC'd (one per writer generation, not per commit). */
  def acquireFence(spark: SparkSession, dir: String): Long = {
    val (fs, tgt) = fsOf(spark, dir)
    if (!fs.exists(tgt)) fs.mkdirs(tgt)
    var attempt = fenceFiles(fs, tgt).foldLeft(-1L)(math.max) + 1
    while (true) {
      val tmp = new Path(tgt, f".$FencePrefix$attempt%020d.tmp")
      val out = fs.create(tmp, true)
      try out.write(Array.emptyByteArray) finally out.close()
      if (fs.rename(tmp, new Path(tgt, f"$FencePrefix$attempt%020d"))) return attempt
      fs.delete(tmp, false)
      attempt = math.max(attempt + 1, fenceFiles(fs, tgt).foldLeft(-1L)(math.max) + 1)
    }
    -1L // unreachable
  }

  /** Commit `df` as the next version and return its id. `preferredId`
    * seeds the monotonic id (a stream passes its batchId so fresh
    * checkpoints over old tables continue PAST the old ids rather than
    * colliding below them); `keep` bounds the retained history;
    * `asOfMicros` pins the commit's as-of timestamp for [[readAsOf]]
    * (caller-supplied, never wall clock — replays must commit identical
    * metadata); `fence` ties the commit to an [[acquireFence]] token. */
  def promote(spark: SparkSession, dir: String, df: DataFrame,
      preferredId: Long = 0L, keep: Int = 2,
      asOfMicros: Option[Long] = None, fence: Option[Long] = None): Long = {
    val (fs, tgt) = fsOf(spark, dir)
    // the id moves past EVERY listed manifest, not just the committed
    // head: debris squatting at committed-head + 1 would otherwise make
    // the rename below fail with the SAME recomputed id on every retry,
    // wedging the table until manual cleanup (resolution, by contrast,
    // rightly trusts committed manifests only)
    val maxListed = manifestFiles(fs, tgt).headOption.map(_._1)
    val nextId = math.max(preferredId, maxListed.map(_ + 1).getOrElse(0L))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val snapName = f"$SnapshotPrefix$nextId%020d-$nonce"
    df.write.mode("overwrite").parquet(new Path(tgt, snapName).toString)
    // fence check AFTER the (slow) snapshot write, immediately before
    // the rename: the narrowest window a zombie can slip through; the
    // rename-to-new-name remains the final arbiter regardless
    fence.foreach { f =>
      val newest = fenceFiles(fs, tgt).foldLeft(-1L)(math.max)
      if (newest > f)
        throw new FencedException(
          s"SnapshotStore: fence $f superseded by $newest — a newer writer owns $dir; " +
            s"this writer's snapshot $snapName is unpromoted and GC-eligible")
    }
    val tmp = new Path(tgt, f".$ManifestPrefix$nextId%020d.$nonce.tmp")
    val out = fs.create(tmp, true)
    val content = snapName + asOfMicros.fold("")("\n" + _)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val mPath = new Path(tgt, f"$ManifestPrefix$nextId%020d")
    if (!fs.rename(tmp, mPath))
      throw new IllegalStateException(
        s"SnapshotStore: failed to promote $snapName via $mPath (concurrent writer?)")
    // GC, best-effort: a reader that just resolved a retained manifest
    // still finds its directory intact. Skipped entirely while the
    // manifest count fits the retention bound (orphan snapshot dirs from
    // crashed writes linger until the first GC-triggering commit — and
    // forever in the keep = Int.MaxValue full-log mode, where nothing is
    // ever collected). Retention counts COMMITTED manifests: torn
    // debris with ids above the head must not occupy keep slots, or a
    // couple of junk files could push every committed manifest —
    // including the one just promoted — into the dropped set and
    // destroy the table's whole history. The cutoff is the keep-th
    // newest committed id; everything at or above it (committed or
    // debris) is left alone, everything below it goes.
    try {
      val all = manifestFiles(fs, tgt)
      if (all.size > keep) {
        val committed = all.iterator
          .map { case (id, p) => (id, resolve(fs, tgt, p)) }
          .collect { case (id, Some((snap, _))) => (id, snap) }
          .take(keep).toSeq
        if (committed.size == keep) {
          val cutoff = committed.last._1
          val keepSnaps = committed.map(_._2).toSet + snapName
          all.filter(_._1 < cutoff).foreach { case (_, p) => fs.delete(p, false) }
          fs.listStatus(tgt).foreach { st =>
            val n = st.getPath.getName
            if (n.startsWith(SnapshotPrefix) && !keepSnaps.contains(n)) {
              // only sweep snapshots BELOW the cutoff or never promoted:
              // a dir referenced by a retained (>= cutoff) manifest must
              // survive even if its manifest was unreadable this pass
              val referencedAbove = all.filter(_._1 >= cutoff)
                .exists { case (_, p) => readContent(fs, p).exists(parseManifest(_)._1 == n) }
              if (!referencedAbove) fs.delete(st.getPath, true)
            }
          }
        }
      }
    } catch { case _: java.io.IOException => () }
    nextId
  }
}
