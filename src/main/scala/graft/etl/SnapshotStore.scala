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
  *   - manifest ids are strictly monotonic (`max(preferredId,
  *     lastId + 1)`), so no manifest is ever deleted or rewritten on
  *     the commit path and there is no instant without a committed
  *     pointer;
  *   - readers resolve the NEWEST manifest whose snapshot carries the
  *     `_SUCCESS` marker its writing job left, falling back past any
  *     torn write; `readVersion` resolves an exact id the same way;
  *   - GC (best-effort, inside the commit) retains the newest `keep`
  *     manifests and the snapshots they reference — `keep =
  *     Int.MaxValue` turns the table into a full time-travel log.
  *
  * [[graft.streaming.Scd2Stream]] commits its dimension through this
  * store; `etl_snapshot_timetravel` demonstrates the batch-side
  * version-travel read.
  */
object SnapshotStore {

  private val ManifestPrefix = "manifest-"
  private val SnapshotPrefix = "snapshot-"

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

  /** Resolve ONE manifest to its committed snapshot name: content parses
    * and the snapshot directory carries `_SUCCESS` — a manifest whose
    * write raced a crash resolves to None. */
  private def resolve(fs: FileSystem, tgt: Path, manifest: Path): Option[String] =
    readContent(fs, manifest)
      .filter(snap => fs.exists(new Path(new Path(tgt, snap), "_SUCCESS")))

  /** The newest COMMITTED snapshot — walks newest-first and stops at the
    * first manifest that resolves (normally the very first). */
  private[graft] def currentSnapshot(fs: FileSystem, tgt: Path): Option[(Long, Path)] =
    manifestFiles(fs, tgt).iterator
      .map { case (id, p) => (id, resolve(fs, tgt, p)) }
      .collectFirst { case (id, Some(snap)) => (id, new Path(tgt, snap)) }

  /** Latest committed version id, if any commit ever succeeded. */
  def currentVersion(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentSnapshot(fs, tgt).map(_._1)
  }

  /** Read the latest committed state. None when nothing was ever committed. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val (fs, tgt) = fsOf(spark, dir)
    currentSnapshot(fs, tgt).map { case (_, snap) => spark.read.parquet(snap.toString) }
  }

  /** Time travel: read exactly version `id` (committed), if its manifest
    * and snapshot are still retained — short-circuits on the id before
    * any content read. */
  def readVersion(spark: SparkSession, dir: String, id: Long): Option[DataFrame] = {
    val (fs, tgt) = fsOf(spark, dir)
    manifestFiles(fs, tgt).find(_._1 == id)
      .flatMap { case (_, p) => resolve(fs, tgt, p) }
      .map(snap => spark.read.parquet(new Path(tgt, snap).toString))
  }

  /** Commit `df` as the next version and return its id. `preferredId`
    * seeds the monotonic id (a stream passes its batchId so fresh
    * checkpoints over old tables continue PAST the old ids rather than
    * colliding below them); `keep` bounds the retained history. */
  def promote(spark: SparkSession, dir: String, df: DataFrame,
      preferredId: Long = 0L, keep: Int = 2): Long = {
    val (fs, tgt) = fsOf(spark, dir)
    val current = currentSnapshot(fs, tgt)
    val nextId = math.max(preferredId, current.map(_._1 + 1).getOrElse(0L))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val snapName = f"$SnapshotPrefix$nextId%020d-$nonce"
    df.write.mode("overwrite").parquet(new Path(tgt, snapName).toString)
    val tmp = new Path(tgt, f".$ManifestPrefix$nextId%020d.$nonce.tmp")
    val out = fs.create(tmp, true)
    try out.write(snapName.getBytes("UTF-8")) finally out.close()
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
          .collect { case (id, Some(snap)) => (id, snap) }
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
                .exists { case (_, p) => readContent(fs, p).contains(n) }
              if (!referencedAbove) fs.delete(st.getPath, true)
            }
          }
        }
      }
    } catch { case _: java.io.IOException => () }
    nextId
  }
}
