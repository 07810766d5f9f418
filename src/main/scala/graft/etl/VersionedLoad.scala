package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's subsequent-load contract (07_SubsequentLoading.sql:
  * 324-442 — re-runnable NOT-EXISTS-guarded fact refresh) committed
  * through [[SnapshotStore]]: each refresh is one atomic versioned
  * commit, so the batch path gets exactly the crash-safety the
  * streaming SCD2 sink has — a refresh that dies mid-write leaves the
  * previous version current (readers never observe a half-appended
  * fact), a retry simply re-runs the refresh on top of it, and every
  * pre/post state stays time-travelable for audit.
  *
  * Scale shape: the refresh writes ONLY the delta. The anti-join of the
  * batch against the existing fact on its grain key (the
  * [[MergeUpsert.insertMissing]] NOT-EXISTS guard; the batch side
  * broadcasts when small) produces the genuinely-new rows, those land
  * as this commit's files, and the manifest reuses every existing file
  * BY REFERENCE ([[SnapshotStore.currentFiles]] → `promote(reuseFiles)`)
  * — the reference's MERGE-touches-only-new-rows contract
  * (07_SubsequentLoading.sql:331-355) applied to the storage layer. An
  * unchanged file is never rewritten (byte-identity across refreshes is
  * spec-pinned), so at 100 TB a daily refresh costs O(delta) write, not
  * O(table). [[merge]] extends the same file-reuse discipline to the
  * UPDATE arm (copy-on-write: only files containing a matched key are
  * rewritten), and [[compact]] is the complementary full rewrite that
  * heals the small-file accumulation many incremental commits leave
  * behind.
  */
object VersionedLoad {

  /** First load: commit `initial` as the table's version 0.
    * `statsCol` (an integral column, normally the grain key) makes
    * this and every downstream commit record per-file min/max stats —
    * the data-skipping index [[merge]] prunes with. */
  def bootstrap(spark: SparkSession, table: String, initial: DataFrame,
      asOfMicros: Long, keep: Int = 16, statsCol: Option[String] = None): Long =
    SnapshotStore.promote(spark, table, initial,
      preferredId = 0L, keep = keep, asOfMicros = Some(asOfMicros),
      statsCol = statsCol)

  /** Compact the CURRENT version's files into `numFiles` as a NEW
    * commit — the table-format answer to small-file accumulation (many
    * incremental refreshes each writing a few files): readers never
    * observe a half-compacted directory (the rewrite is invisible until
    * its manifest promotes), the pre-compaction version stays
    * time-travelable until GC, and a crash mid-rewrite leaves only an
    * unreferenced snapshot directory. Pass the compacted version's own
    * `asOfMicros` so the LOGICAL timeline is unchanged: readAsOf at
    * that instant resolves the compacted (newest) physical version.
    * Content is identical by construction — coalesce only merges
    * partitions. After a chain of file-reuse refreshes, compaction also
    * collapses the reference chain: the new manifest owns all its files
    * directly, letting GC reclaim the chain's spread-out debris. */
  def compact(spark: SparkSession, table: String, numFiles: Int,
      asOfMicros: Option[Long] = None, keep: Int = 16,
      statsCol: Option[String] = None): Long = {
    val current = SnapshotStore.read(spark, table).getOrElse(
      throw new IllegalStateException(
        s"VersionedLoad.compact: $table has no committed version"))
    SnapshotStore.promote(spark, table, current.coalesce(numFiles),
      keep = keep, asOfMicros = asOfMicros, statsCol = statsCol)
  }

  /** One incremental refresh: anti-join `batch` against the CURRENT
    * committed version on `keys` (replaying an overlapping batch is a
    * no-op — the reference's re-runnable contract), write ONLY the new
    * rows, commit them plus the current version's files by reference as
    * the next version, and return its id. Throws when the table was
    * never bootstrapped — refreshing nothing is a pipeline wiring bug,
    * not an implicit bootstrap. */
  def refresh(spark: SparkSession, table: String, batch: DataFrame,
      keys: Seq[String], asOfMicros: Long, keep: Int = 16,
      statsCol: Option[String] = None): Long =
    refreshOpt(spark, table, batch, keys, Some(asOfMicros), keep, statsCol)

  /** ROLLBACK as a forward commit (the RESTORE of the heavyweight
    * formats): re-promote version `version`'s state as the NEW head —
    * a METADATA-ONLY commit, because the new manifest references the
    * old version's files in place; no data is rewritten regardless of
    * table size (the commit's own primary directory holds only the
    * empty-schema marker write). History stays append-only: the rolled-
    * back-over versions remain travelable until GC, and the restore
    * itself is one more auditable version. Throws when `version` is not
    * committed/retained. */
  def restore(spark: SparkSession, table: String, version: Long,
      asOfMicros: Option[Long] = None, keep: Int = 16): Long = {
    val files = SnapshotStore.filesForVersion(spark, table, version).getOrElse(
      throw new IllegalStateException(
        s"VersionedLoad.restore: version $version of $table is not committed/retained"))
    val state = SnapshotStore.readVersion(spark, table, version).getOrElse(
      throw new IllegalStateException(
        s"VersionedLoad.restore: version $version of $table is unreadable"))
    SnapshotStore.promote(spark, table, state.limit(0),
      keep = keep, asOfMicros = asOfMicros, reuseFiles = files)
  }

  /** Incremental consumption between two committed versions: the rows
    * in files `toVersion` references that `fromVersion` does not — for
    * an append-only file-reuse chain (every [[refresh]] commit) this IS
    * the set of rows inserted between the versions, computed at
    * O(delta) read cost from the manifest file-list DIFF, never a scan
    * or join over the full table (the CDC-read pattern of the
    * heavyweight formats, for the insert-only contract this load
    * implements). Precondition: no [[compact]]/[[restore]]/[[merge]]
    * commit strictly between the two versions — a rewrite re-homes
    * unchanged rows into new files, so the file diff would return them
    * as "changes" (for merge: the touched files' survivors); diff
    * across rewrite boundaries per leg instead.
    * None when nothing changed. */
  def changesBetween(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): Option[DataFrame] = {
    val newFiles = (filesOf(spark, table, toVersion, "changesBetween")
      -- filesOf(spark, table, fromVersion, "changesBetween")).toSeq.sorted
    SnapshotStore.readFiles(spark, table, newFiles)
  }

  private def filesOf(spark: SparkSession, table: String, v: Long, op: String): Set[String] =
    SnapshotStore.filesForVersion(spark, table, v).getOrElse(
      throw new IllegalStateException(
        s"VersionedLoad.$op: version $v of $table is not committed/retained")).toSet

  /** Value-exact CDC between two committed versions: every row of
    * `toVersion` that `fromVersion` did not contain — inserts AND the
    * new values of updates (this table format never deletes). Unlike
    * [[changesBetween]]'s O(delta) file diff, this read is CORRECT
    * across ANY commit chain — [[merge]] re-homes touched files'
    * unchanged survivors and [[compact]]/[[restore]] re-home
    * everything, and the multiset difference cancels every re-homed
    * row exactly.
    *
    * Cost: the new files' rows (file diff, O(delta) for refresh/merge
    * chains; O(table) across a compaction) differenced against the
    * from-version — `statsCol` prunes the from-side read to the files
    * whose key range intersects the new rows' span (one O(delta)
    * min/max scan + the manifest stats), because a from-row outside
    * every new row's key range can cancel nothing. None when nothing
    * changed. */
  def upsertsBetween(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long,
      statsCol: Option[String] = None): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, count, lit, max => fmax, min => fmin}
    val fromFiles = filesOf(spark, table, fromVersion, "upsertsBetween")
    val newFiles = (filesOf(spark, table, toVersion, "upsertsBetween") -- fromFiles)
      .toSeq.sorted
    SnapshotStore.readFiles(spark, table, newFiles).flatMap { newRows =>
      val fromSide: Option[DataFrame] = {
        val pruned = for {
          c <- statsCol
          if isIntegral(newRows, c)
          stats = SnapshotStore.filesForVersionStats(spark, table, fromVersion)
            .filter(st => st.col == c && fromFiles.contains(st.file))
          if stats.nonEmpty
          r = newRows.agg(
            fmin(col(c).cast("long")), fmax(col(c).cast("long")),
            (count(lit(1)) - count(col(c))).as("nulls")).head()
          // a null new-row key could only be cancelled by a null
          // from-row key, which no stat range describes — skip pruning
          // entirely rather than risk a missed cancellation
          if !r.isNullAt(0) && !r.isNullAt(1) && r.getLong(2) == 0L
        } yield {
          val (lo, hi) = (r.getLong(0), r.getLong(1))
          val statted = stats.map(_.file).toSet
          val candidates = stats.filter(st => st.max >= lo && st.min <= hi).map(_.file)
          val keep = (fromFiles.filterNot(statted) ++ candidates).toSeq.sorted
          SnapshotStore.readFiles(spark, table, keep)
        }
        pruned.getOrElse(SnapshotStore.readFiles(spark, table, fromFiles.toSeq.sorted))
      }
      // align the from-side to the new rows' schema, projecting columns
      // an additive evolution introduced as nulls — a survivor re-homed
      // with only a null-valued new column is logically unchanged and
      // must cancel
      val changed = fromSide.fold(newRows) { f =>
        val have = f.columns.toSet
        val sel = newRows.schema.fields.map { fd =>
          if (have.contains(fd.name)) col(fd.name)
          else org.apache.spark.sql.functions.lit(null).cast(fd.dataType).as(fd.name)
        }
        newRows.exceptAll(f.select(sel.toIndexedSeq: _*))
      }
      Some(changed)
    }
  }

  /** [[refresh]] with optional as-of metadata — a commit without a
    * pinned instant is invisible to timestamp travel but fully version-
    * travelable (the streaming fact sink uses this when no event-time
    * column is configured). */
  def refreshOpt(spark: SparkSession, table: String, batch: DataFrame,
      keys: Seq[String], asOfMicros: Option[Long], keep: Int = 16,
      statsCol: Option[String] = None): Long = {
    val current = SnapshotStore.read(spark, table).getOrElse(
      throw new IllegalStateException(
        s"VersionedLoad.refresh: $table has no committed version — bootstrap first"))
    val newRows = batch.join(current, keys, "left_anti")
    SnapshotStore.promote(spark, table, newRows,
      keep = keep, asOfMicros = asOfMicros,
      reuseFiles = SnapshotStore.currentFiles(spark, table),
      statsCol = statsCol)
  }

  /** Copy-on-write MERGE — the full upsert at the storage layer, where
    * [[refresh]] implements only the insert arm: matched keys take the
    * batch's row, unmatched existing rows survive, unmatched batch rows
    * insert, all as ONE atomic versioned commit. The reference splits
    * this across two statement shapes — its MERGEs carry only the
    * NOT-MATCHED insert arm (07_SubsequentLoading.sql:331-355) while
    * updates arrive through correlated UPDATEs against the same facts
    * (07_SubsequentLoading.sql:288-322, the update_correlated
    * contract); merge() is the combined shape both compose into once
    * commits must be atomic and versioned.
    *
    * Scale shape: only the files that CONTAIN a matched key are
    * rewritten — their surviving rows re-land with the batch in this
    * commit's primary directory, every untouched file is reused by
    * reference, so the write cost is O(delta + touched files), never
    * O(table); with a key-clustered layout (bucketing, the sorted-
    * layout op) the touched set concentrates instead of spraying
    * across every file. Locating the matched keys costs one semi-join
    * scan of the current version (the batch's distinct keys broadcast
    * when small); the touched-file list itself is metadata-scale
    * (bounded by the file count, like the manifest).
    *
    * Precondition: `batch` is key-unique — dedupe first (the streaming
    * fact sink's deterministic min-struct winner is the supported way).
    * Duplicate keys across EXISTING files (impossible through
    * bootstrap + refresh/merge, possible through raw promotes) are
    * healed as a side effect: every copy's file is touched, every old
    * copy drops, exactly the batch row survives.
    *
    * Concurrency: like [[refresh]], single-writer by default — a
    * commit landing between this merge's read and its promote would be
    * silently overwritten (the lost-update race every read-merge-write
    * has). `occ = true` pins the promote to the head this merge read:
    * the race then surfaces as [[SnapshotStore.ConflictException]] to
    * retry, at the documented OCC cost that torn debris above the head
    * blocks the commit (which is why the streaming sink, whose crash
    * recovery depends on promoting PAST its own debris, keeps the
    * default).
    *
    * Throws when the table was never bootstrapped — merging into
    * nothing is a pipeline wiring bug, not an implicit bootstrap. */
  def merge(spark: SparkSession, table: String, batch: DataFrame,
      keys: Seq[String], asOfMicros: Option[Long], keep: Int = 16,
      statsCol: Option[String] = None, occ: Boolean = false): Long = {
    import org.apache.spark.sql.functions.{broadcast, col, expr}
    val base = SnapshotStore.currentVersion(spark, table)
    val expect = if (occ) Some(base.getOrElse(SnapshotStore.NoVersion)) else None
    val files = SnapshotStore.currentFiles(spark, table)
    if (files.isEmpty)
      throw new IllegalStateException(
        s"VersionedLoad.merge: $table has no committed version — bootstrap first")
    val batchKeys = batch.select(keys.map(col): _*).distinct()
    // DATA SKIPPING: when the head manifest carries per-file min/max
    // stats on the (single, integral) merge key, a file whose range
    // cannot contain ANY batch key needs no scan at all — the
    // touched-file location drops from one full-table read to a read
    // of the range-candidate files (with a key-clustered layout:
    // O(touched)). Files without a stat line always scan — absence
    // means "must scan", never "prunable". The candidate check is one
    // broadcast range probe of the batch keys against the file ranges
    // (file count is metadata-scale, like the manifest itself).
    val scanFiles: Seq[String] =
      if (keys.size != 1 || !isIntegral(batch, keys.head)) files
      else {
        val keyCol = keys.head
        val fileSet = files.toSet
        val stats = SnapshotStore.currentFileStats(spark, table)
          .filter(st => st.col == keyCol && fileSet.contains(st.file))
        if (stats.isEmpty) files
        else {
          val statted = stats.map(_.file).toSet
          val unstatted = files.filterNot(statted)
          import spark.implicits._
          val ranges = stats.map(st => (st.file, st.min, st.max))
            .toDF("__file", "__mn", "__mx")
          val candidates = batchKeys
            .join(broadcast(ranges),
              col(keyCol).cast("long") >= col("__mn") &&
                col(keyCol).cast("long") <= col("__mx"))
            .select("__file").distinct()
            .collect().map(_.getString(0)).toSet
          (unstatted ++ files.filter(candidates)).sorted
        }
      }
    // root-relative id of each scanned row's file: snapshot dirs are
    // direct children of the table root, so the trailing two path
    // segments of input_file_name() are exactly the manifest's
    // file-list entry for that file
    val relFile = expr("regexp_extract(input_file_name(), '([^/]+/[^/]+)$', 1)")
    val touched =
      if (scanFiles.isEmpty) Set.empty[String]
      else SnapshotStore.readFiles(spark, table, scanFiles).get
        .withColumn("__file", relFile)
        .join(batchKeys, keys, "left_semi")
        .select("__file").distinct()
        .collect().map(_.getString(0)).toSet
    if (touched.isEmpty)
      // pure insert: nothing to rewrite, reuse every file by reference
      return SnapshotStore.promote(spark, table, batch,
        keep = keep, asOfMicros = asOfMicros, reuseFiles = files,
        statsCol = statsCol, expectCurrent = expect)
    val untouched = files.filterNot(touched)
    // survivors: rows of the touched files whose key the batch does NOT
    // carry — read ONLY those files, not the table
    val survivors = SnapshotStore.readFiles(spark, table, touched.toSeq.sorted).get
      .join(batchKeys, keys, "left_anti")
    // allowMissingColumns: ADDITIVE schema evolution — a batch carrying
    // a new column unions with survivors that predate it (null there),
    // and the store's mergeSchema reads project it as null in every
    // reused file; see SnapshotStore.readManifest
    SnapshotStore.promote(spark, table, batch.unionByName(survivors, allowMissingColumns = true),
      keep = keep, asOfMicros = asOfMicros, reuseFiles = untouched,
      statsCol = statsCol, expectCurrent = expect)
  }

  /** Stats-based pruning is only sound for integral keys: the stat
    * writer casts to long, and a lossy cast (double, string) would
    * record bounds the true values can escape. */
  private def isIntegral(df: DataFrame, c: String): Boolean =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
}
