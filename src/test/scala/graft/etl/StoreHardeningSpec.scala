package graft.etl

import graft.SparkSuite

/** r16 store hardening: the r15 ADVICE closures (null-safe CDC ops,
  * key-only delete probes, union-schema additive checks, overflow-free
  * z-order, working-column collision guards), multi-component
  * touched-file pruning, rank-scaled z-order under skew, and the
  * vacuum retention guard. */
class StoreHardeningSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_harden").toString + "/t"

  private def manifest(t: String, version: Long): Seq[String] =
    new String(java.nio.file.Files.readAllBytes(
      new java.io.File(new java.io.File(t), f"manifest-$version%020d").toPath), "UTF-8")
      .split("\n").toSeq

  private def destroy(t: String, file: String): Unit =
    java.nio.file.Files.write(new java.io.File(new java.io.File(t), file).toPath,
      "not a parquet file".getBytes("UTF-8")): Unit

  test("applyCdc: a NULL op upserts per the documented contract — never a silent delete") {
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      asOfMicros = 1000L)
    // key 1 arrives with op NULL (malformed feed): it must REPLACE the
    // row, not vanish — the r15 `=!= "D"` dropped it from the upsert arm
    // while its key still anti-joined the old row away
    val batch = Seq((1L, "A2", null: String), (2L, "", "D")).toDF("k", "v", "_op")
    VersionedLoad.applyCdc(spark, t, batch, Seq("k"), "_op", asOfMicros = Some(2000L))
    assert(SnapshotStore.read(spark, t).get.as[(Long, String)].collect().toSet ==
      Set(1L -> "A2"),
      "null op upserted, explicit D deleted")
  }

  test("cdcBetween ignores a NON-KEY statsCol in the delete probe — an update that moves the column is not a false delete") {
    val t = freshTable()
    // one file; stats recorded on the non-key column s
    VersionedLoad.bootstrap(spark, t,
      Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "v", "s").coalesce(1),
      asOfMicros = 1000L, statsCols = Seq("s"))
    // update BOTH keys, moving s far outside the old span — the to-side
    // new file's s-range [100,200] cannot intersect the candidates'
    // [1,2], so an s-pruned existence probe would miss the new values
    // and report both updates as deletes (r15 ADVICE)
    VersionedLoad.merge(spark, t,
      Seq((1L, "A2", 100L), (2L, "B2", 200L)).toDF("k", "v", "s"),
      Seq("k"), asOfMicros = Some(2000L), statsCols = Seq("s"))
    val cdc = VersionedLoad.cdcBetween(spark, t, 0L, 1L, Seq("k"), Some("s")).get
    assert(cdc.filter(cdc("_change_type") === "delete").count() == 0,
      "no false delete: the probe must not prune by a non-key column")
    assert(cdc.filter(cdc("_change_type") === "upsert").count() == 2)
  }

  test("upsertsBetween: a delete that rewrites only pre-evolution files does not spuriously fail the additive check") {
    val t = freshTable()
    // v0: pre-evolution file (k, v)
    VersionedLoad.bootstrap(spark, t, Seq((1L, "a"), (3L, "c")).toDF("k", "v").coalesce(1),
      asOfMicros = 1000L)
    // v1: additive evolution — an INSERT carrying new column w lands in
    // its own file; the pre-evolution file rides along by reference
    VersionedLoad.merge(spark, t, Seq((2L, "b", 9L)).toDF("k", "v", "w"),
      Seq("k"), asOfMicros = Some(2000L))
    // v2: DELETE key 1 — rewrites ONLY the pre-evolution file, so v2's
    // NEW file lacks w while another v2 file still carries it; the r14
    // newRows-only check threw 'chain is not additive' here
    VersionedLoad.delete(spark, t, Seq(Tuple1(1L)).toDF("k"), Seq("k"),
      asOfMicros = Some(3000L))
    val cdc = VersionedLoad.cdcBetween(spark, t, 1L, 2L, Seq("k")).get
    val byType = cdc.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType.getOrElse("delete", 0L) == 1L && byType.getOrElse("upsert", 0L) == 0L,
      s"the only change between v1 and v2 is the delete of key 1, got $byType")
    assert(cdc.filter(cdc("_change_type") === "delete").select("k").as[Long]
      .collect().toSeq == Seq(1L))
    // a GENUINELY non-additive chain still fails loudly: v3 drops w via
    // a raw full promote, and the diff across it must refuse
    SnapshotStore.promote(spark, t,
      SnapshotStore.read(spark, t).get.select("k", "v"), keep = 16,
      asOfMicros = Some(4000L))
    intercept[IllegalStateException] {
      VersionedLoad.upsertsBetween(spark, t, 1L, 3L).foreach(_.count())
    }
  }

  test("locateTouched intersects EVERY statted grain component: in-range on the leading one, out-of-range on another → never opened") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    // two files clustered by k, each covering a DISJOINT date window:
    // low file (k 1-2, Jan-Feb), high file (k 100-101, Mar-Apr)
    val rows = Seq(
      (1L, "1995-01-01", "a"), (2L, "1995-02-01", "b"),
      (100L, "1995-03-01", "c"), (101L, "1995-04-01", "d"))
      .toDF("k", "ds", "v").selectExpr("k", "CAST(ds AS DATE) AS d", "v")
    VersionedLoad.bootstrap(spark, t, rows.repartitionByRange(2, col("k")),
      asOfMicros = 1000L, statsCols = Seq("d", "k"))
    // the batch grain (d=1995-03-01, k=1) is IN-RANGE on the LEADING
    // statted component (d: the high file's Mar-Apr window) but
    // out-of-range on k (the high file holds 100-101): the r15
    // first-component-only prune would scan the high file; the r16
    // intersection proves no file can hold the tuple at all. Destroying
    // the high file makes "never opened" observable.
    val highFile = manifest(t, 0L).filter(_.startsWith("s k "))
      .map(_.split(" ", 5)).find(_(2).toLong == 100L).get(4)
    destroy(t, highFile)
    val batch = Seq((1L, "1995-03-01", "A2")).toDF("k", "ds", "v")
      .selectExpr("k", "CAST(ds AS DATE) AS d", "v")
    VersionedLoad.merge(spark, t, batch, Seq("d", "k"), asOfMicros = Some(2000L),
      statsCols = Seq("d", "k"))
    // no existing row carries that grain: the merge is a pure insert and
    // the destroyed file rides along by reference — proof it was never
    // opened (the intersection emptied the candidate set)
    assert(manifest(t, 1L).filter(_.startsWith("f ")).exists(_.contains(highFile)))
    // read back through the k-pruned reader (the destroyed file prunes
    // out again): the insert landed, the low file is intact
    assert(SnapshotStore.readKeyRange(spark, t, "k", 1L, 2L).get
      .select("k", "v").as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 1L -> "A2", 2L -> "b"))
  }

  test("vacuum: a retention below the floor throws; a version pin inside retention survives keep pressure") {
    val base = 1000000000000000L
    val hour = 3600L * 1000000L
    val t = freshTable()
    // three independent commits, one hour apart
    SnapshotStore.promote(spark, t, Seq((1L, "a")).toDF("k", "v"),
      keep = 16, asOfMicros = Some(base))
    SnapshotStore.promote(spark, t, Seq((2L, "b")).toDF("k", "v"),
      keep = 16, asOfMicros = Some(base + 2 * hour))
    SnapshotStore.promote(spark, t, Seq((3L, "c")).toDF("k", "v"),
      keep = 16, asOfMicros = Some(base + 3 * hour))
    intercept[IllegalArgumentException] {
      SnapshotStore.vacuum(spark, t, keep = 1, nowMicros = Some(base + 3 * hour),
        retentionMicros = 1000L)
    }
    assert(SnapshotStore.readVersion(spark, t, 0L).isDefined,
      "a refused vacuum collects nothing")
    // retention = exactly the floor (allowed): v1 (1h old) is inside the
    // window and SURVIVES keep=1; v0 (3h old) ages out
    SnapshotStore.vacuum(spark, t, keep = 1, nowMicros = Some(base + 3 * hour),
      retentionMicros = hour)
    assert(SnapshotStore.readVersion(spark, t, 1L).get.count() == 1,
      "a version pin inside the retention window survives the vacuum")
    assert(SnapshotStore.readVersion(spark, t, 0L).isEmpty,
      "a version beyond both keep and retention is collected")
    // the escape hatch stays available and deliberate
    SnapshotStore.vacuum(spark, t, keep = 1, nowMicros = Some(base + 3 * hour),
      retentionMicros = 0L, enforceRetention = false)
    assert(SnapshotStore.readVersion(spark, t, 1L).isEmpty &&
      SnapshotStore.read(spark, t).get.count() == 1)
  }

  test("z-order compact RANK-scales: a long-tail dim with far outliers still yields per-file spans narrow in BOTH dims") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    // bulk: k = 1..248 (uniform); outliers: 8 keys near 5e17 — wide
    // enough that the r15 linear scale arithmetic ((c-lo)*255) would
    // overflow Long AND collapse the whole bulk into cell 0
    val rows = ((1 to 248).map(i => (i.toLong, i % 248)) ++
      (1 to 8).map(i => (500000000000000000L + i, (i * 31) % 248)))
      .map { case (k, di) => (k, java.time.LocalDate.ofEpochDay(9131L + di).toString) }
      .toDF("k", "ds").selectExpr("k", "CAST(ds AS DATE) AS d")
    VersionedLoad.bootstrap(spark, t, rows.repartition(8), asOfMicros = 1000L,
      statsCol = Some("k"), statsCols = Seq("d"))
    VersionedLoad.compact(spark, t, numFiles = 4, asOfMicros = Some(1000L),
      statsCol = Some("k"), statsCols = Seq("d"), zorderBy = Seq("k", "d"))
    val m = manifest(t, 1L)
    val kSpans = m.filter(_.startsWith("s k ")).map(_.split(" ", 5))
      .map(a => (a(2).toLong, a(3).toLong))
    val dSpans = m.filter(_.startsWith("t date d ")).map(_.split(" ", 7))
      .map(a => (a(3).toLong, a(4).toLong))
    assert(kSpans.size == 4 && dSpans.size == 4, s"4 files expected, got $m")
    // bulk-only files (no outlier) must be narrow on k: under linear
    // scaling every file spans ~the whole bulk because all bulk rows
    // share cell 0 and the curve degenerates to the date sort
    val bulkFiles = kSpans.filter(_._2 <= 248L)
    assert(bulkFiles.nonEmpty &&
      bulkFiles.forall { case (mn, mx) => mx - mn <= 160L },
      s"bulk k-spans must stay narrow under rank scaling, got $kSpans")
    // and the date dim must ALSO be served: not every file may span the
    // full date range (a single-key sort on k would make them all)
    assert(dSpans.exists { case (mn, mx) => mx - mn <= 200L },
      s"some file must be date-narrow too, got $dSpans")
    // content identical regardless of layout
    assert(SnapshotStore.read(spark, t).get.count() == 256)
    // pruned reads serve BOTH dims on the compacted layout
    assert(SnapshotStore.readKeyRange(spark, t, "k", 1L, 10L).get.count() == 10)
  }

  test("idempotent multi-table transaction: a crash-rerun applies each table exactly once (the txnAppId/txnVersion shape)") {
    val tA = freshTable(); val tB = freshTable()
    VersionedLoad.bootstrap(spark, tA, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      asOfMicros = 1000L)
    VersionedLoad.bootstrap(spark, tB, Seq((10L, "x"), (20L, "y")).toDF("k", "v"),
      asOfMicros = 1000L)
    val txn = "purge-member-42"
    def stepA() = VersionedLoad.idempotent(VersionedLoad.withConflictRetry() {
      VersionedLoad.delete(spark, tA, Seq(Tuple1(1L)).toDF("k"), Seq("k"),
        asOfMicros = Some(2000L), occ = true, txn = Some((txn, 1L)))
    })
    def stepB() = VersionedLoad.idempotent(VersionedLoad.withConflictRetry() {
      VersionedLoad.delete(spark, tB, Seq(Tuple1(10L)).toDF("k"), Seq("k"),
        asOfMicros = Some(2000L), occ = true, txn = Some((txn, 1L)))
    })
    // first run applies table A, then "crashes" before table B
    assert(stepA().isDefined)
    // the at-least-once driver reruns BOTH steps: A skips, B applies —
    // the transaction converges all-or-nothing
    assert(stepA().isEmpty, "an already-applied table skips, never re-applies")
    assert(stepB().isDefined)
    // a third full rerun is a complete no-op
    assert(stepA().isEmpty && stepB().isEmpty)
    assert(SnapshotStore.read(spark, tA).get.count() == 1)
    assert(SnapshotStore.read(spark, tB).get.count() == 1)
    assert(SnapshotStore.currentVersion(spark, tA).get == 1L,
      "exactly ONE delete commit landed on A despite three runs")
    // markers survive unrelated later commits; a HIGHER version applies
    VersionedLoad.refresh(spark, tA, Seq((3L, "c")).toDF("k", "v"), Seq("k"),
      asOfMicros = 3000L)
    assert(SnapshotStore.lastTxnVersion(spark, tA, txn) == Some(1L),
      "the txn marker carries across unrelated commits")
    assert(VersionedLoad.idempotent(VersionedLoad.delete(spark, tA,
      Seq(Tuple1(2L)).toDF("k"), Seq("k"), asOfMicros = Some(4000L),
      txn = Some((txn, 2L)))).isDefined, "a higher txn version applies")
    assert(SnapshotStore.lastTxnVersion(spark, tA, txn) == Some(2L))
  }

  test("working-column collision guards: __z on a z-order compact and __file on copy-on-write ops fail loudly") {
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t,
      Seq((1L, 2L, "x")).toDF("k", "__z", "v"), asOfMicros = 1000L)
    intercept[IllegalArgumentException] {
      VersionedLoad.compact(spark, t, numFiles = 1, zorderBy = Seq("k", "__z"))
    }
    val t2 = freshTable()
    VersionedLoad.bootstrap(spark, t2,
      Seq((1L, "f1", "x")).toDF("k", "__file", "v"), asOfMicros = 1000L)
    intercept[IllegalArgumentException] {
      VersionedLoad.merge(spark, t2, Seq((1L, "f2", "y")).toDF("k", "__file", "v"),
        Seq("k"), asOfMicros = Some(2000L))
    }
  }
}
