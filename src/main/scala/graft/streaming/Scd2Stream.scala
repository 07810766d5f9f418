package graft.streaming

import graft.etl.Scd2
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Continuous SCD2 dimension maintenance from a change stream — the
  * streaming form of the reference's Type-2 subsequent load
  * (06_Type2_DimMembers.sql): each micro-batch of change records closes
  * superseded versions, opens new ones, and appends brand-new business
  * keys, all through the same [[graft.etl.Scd2]] single-pass engine the
  * batch path uses.
  *
  * Contract: rows carry a `change_date` (yyyy-MM-dd string) and at most
  * one change per (business key, change_date); a batch may span several
  * dates — they apply in ascending order, so replays and out-of-order
  * file arrivals inside a batch stay deterministic.
  *
  * Scale shape: dimensions are bounded by definition (the reference's
  * dims are thousands of rows; even a 100 TB warehouse's dims fit in
  * memory), so the target snapshots driver-side per batch exactly like
  * the aggregate-grain merge sink — the FACT-sized path never goes
  * through this operator. A transactional table format's MERGE would
  * replace the snapshot protocol below; the SCD2 semantics are unchanged.
  *
  * Durability protocol (single writer): the target directory is never
  * overwritten in place — a crash mid-`mode("overwrite")` would leave a
  * moment with no committed files at all, and a restart would then
  * "bootstrap" over the destroyed history. Instead each batch writes a
  * fresh `snapshot-<id>-<nonce>/` subdirectory and PROMOTES it by
  * renaming a hidden temp file to `manifest-<id>` (rename-to-new-name:
  * atomic on HDFS and POSIX). Manifest ids are strictly monotonic
  * (`max(batchId, lastId + 1)`), so no manifest is ever deleted or
  * rewritten on the commit path and there is no window where the
  * current pointer is missing; readers resolve the NEWEST manifest
  * whose snapshot has a `_SUCCESS` marker (see [[readDim]]). The
  * previous snapshot + manifest are retained until the next promotion,
  * older ones are garbage-collected best-effort.
  */
object Scd2Stream {

  import graft.etl.SnapshotStore

  /** Read the current committed state of a streamed SCD2 dimension —
    * the reader half of the snapshot/manifest protocol (see
    * [[graft.etl.SnapshotStore]], which owns the format). Returns None
    * when no snapshot has ever been committed. */
  def readDim(spark: SparkSession, targetDir: String): Option[DataFrame] =
    SnapshotStore.read(spark, targetDir)

  /** Start maintaining `targetDir` as an SCD2 dim from parquet change
    * files appearing under `sourceDir`.
    *
    * `checkpointDir` makes the sink RESTARTABLE: on a kill-and-restart
    * from the same checkpoint, committed source files are never re-read
    * (their versions are already in the target parquet) and only
    * not-yet-committed deliveries apply on top of the reloaded dimension
    * — the durable-sink posture the shard packer uses, proven by the
    * crash spec in Scd2StreamSpec. Without it Spark falls back to a
    * per-run temp checkpoint (fine for fire-once jobs, no restart
    * contract). `maxFilesPerTrigger` bounds a batch for test
    * choreography and backpressure. */
  def startScd2Sink(
      spark: SparkSession,
      sourceDir: String,
      targetDir: String,
      schema: StructType,
      keyCols: Seq[String],
      trackedCols: Seq[String],
      checkpointDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val rd = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val wr = src.writeStream
      .outputMode("append")
    checkpointDir.foreach(wr.option("checkpointLocation", _))
    wr
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        // Bit-identical duplicate rows are harmless (a restart or backlog
        // can coalesce several individually-valid deliveries into one
        // micro-batch, replaying the same change file twice) — drop them
        // BEFORE the contract check so only genuinely conflicting rows
        // trip it.
        val changes = batch.dropDuplicates()
        // Enforce the documented contract instead of trusting it: a
        // duplicate (business key, change_date) with CONFLICTING tracked
        // values would silently mint duplicate open versions through
        // Scd2.initial / Scd2.apply. Fail the batch loudly — the retry
        // surfaces the producer bug instead of corrupting the dimension.
        // (One tiny extra aggregate per batch; deliveries are
        // dim-bounded.) Note this failure is not retryable by design:
        // the checkpoint replays the same files, so recovery requires an
        // operator to remove or correct the offending source files —
        // which is the right outcome, because no ordering of two
        // different same-day values for one key is defensible.
        val dup = changes
          .groupBy((keyCols :+ "change_date").map(col).toIndexedSeq: _*)
          .count().filter(col("count") > 1)
          .limit(5).collect()
        if (dup.nonEmpty)
          throw new IllegalStateException(
            "Scd2Stream contract violation: conflicting (key, change_date) rows in one delivery " +
              "(remove or fix the offending source files; retry alone cannot succeed): " +
              dup.mkString("; "))
        val rawDates = changes.select("change_date").distinct()
          .collect().map(_.getString(0))
        // a NULL change_date has no defined position in the apply order
        // and its rows could never be selected by the per-date filter
        // below — they would be silently LOST (and a multi-date delivery
        // would NPE inside the sort as an unattributed stack trace on
        // every retry). Same posture as the duplicate-key guard: fail
        // the batch loudly and name the producer-side fix.
        if (rawDates.contains(null))
          throw new IllegalStateException(
            "Scd2Stream contract violation: a delivery carries a NULL change_date " +
              "(remove or fix the offending source files; retry alone cannot succeed)")
        val dates = rawDates.sorted
        // Bootstrap ONLY when no snapshot was ever PROMOTED: a first
        // write that died mid-job leaves an un-manifested snapshot dir
        // (or one without _SUCCESS) — bootstrapping again is the correct
        // recovery, since no history was ever committed. Once a manifest
        // points at a committed snapshot, a read failure must fail the
        // batch (and be retried) — falling through to the bootstrap path
        // would destroy the dimension's history.
        // snapshot the (dim-sized) state into memory so no lazy scan
        // races the snapshot-directory GC inside the next promote
        var dim: DataFrame = SnapshotStore.read(sp, targetDir) match {
          case None => null
          case Some(d) => sp.createDataFrame(d.collectAsList(), d.schema)
        }
        for (date <- dates) {
          val chg = changes.filter(col("change_date") === date).drop("change_date")
          dim = if (dim == null) {
            Scd2.initial(chg, date)
          } else {
            val existing = dim.select(keyCols.map(col).toIndexedSeq: _*).distinct()
            val fresh = chg.join(existing, keyCols, "left_anti")
            Scd2.apply(dim, chg, keyCols, trackedCols, date)
              .unionByName(Scd2.initial(fresh, date))
          }
        }
        if (dim != null && dates.nonEmpty) {
          // Commit through the store: a NEW snapshot dir promoted by an
          // atomic rename to a NEVER-EXISTING monotonic manifest (ids =
          // max(batchId, last + 1): a replay of batch N after a
          // crash-after-promote gets N's successor, a fresh checkpoint
          // over an old target continues past the old ids). Every crash
          // window leaves either the new manifest (promoted) or the
          // previous one (still current). The previous snapshot is
          // retained until the next promotion (keep = 2).
          SnapshotStore.promote(sp, targetDir, dim, preferredId = batchId): Unit
        }
      }
      .start()
  }
}
