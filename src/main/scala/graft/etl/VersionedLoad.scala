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
  * Scale shape: the refresh itself is [[MergeUpsert.insertMissing]] —
  * one anti-join of the delta against the existing fact on its grain
  * key (the delta side broadcasts when small). The store adds no data
  * movement beyond the snapshot write the load was already doing; at
  * 100 TB the snapshot write is the same partitioned parquet write,
  * and a real deployment would swap per-version full snapshots for
  * partition-level manifests without changing this API.
  */
object VersionedLoad {

  /** First load: commit `initial` as the table's version 0. */
  def bootstrap(spark: SparkSession, table: String, initial: DataFrame,
      asOfMicros: Long, keep: Int = 16): Long =
    SnapshotStore.promote(spark, table, initial,
      preferredId = 0L, keep = keep, asOfMicros = Some(asOfMicros))

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
    * partitions. */
  def compact(spark: SparkSession, table: String, numFiles: Int,
      asOfMicros: Option[Long] = None, keep: Int = 16): Long = {
    val current = SnapshotStore.read(spark, table).getOrElse(
      throw new IllegalStateException(
        s"VersionedLoad.compact: $table has no committed version"))
    SnapshotStore.promote(spark, table, current.coalesce(numFiles),
      keep = keep, asOfMicros = asOfMicros)
  }

  /** One incremental refresh: anti-join `batch` against the CURRENT
    * committed version on `keys` (replaying an overlapping batch is a
    * no-op — the reference's re-runnable contract), commit the merged
    * state as the next version, and return its id. Throws when the
    * table was never bootstrapped — refreshing nothing is a pipeline
    * wiring bug, not an implicit bootstrap. */
  def refresh(spark: SparkSession, table: String, batch: DataFrame,
      keys: Seq[String], asOfMicros: Long, keep: Int = 16): Long = {
    val current = SnapshotStore.read(spark, table).getOrElse(
      throw new IllegalStateException(
        s"VersionedLoad.refresh: $table has no committed version — bootstrap first"))
    SnapshotStore.promote(spark, table,
      MergeUpsert.insertMissing(current, batch, keys),
      keep = keep, asOfMicros = Some(asOfMicros))
  }
}
