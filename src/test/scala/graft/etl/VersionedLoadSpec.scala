package graft.etl

import graft.SparkSuite

/** The versioned batch incremental load's contract: re-runnable merge
  * semantics (overlap is a no-op), both pre/post states time-travelable,
  * and — the reason it exists — a refresh that crashes between its
  * snapshot write and its manifest promotion leaves the previous version
  * current, readable, and cleanly retryable. */
class VersionedLoadSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_vload").toString + "/t"

  private def fact(rows: (Long, String)*) = rows.toSeq.toDF("k", "v")

  test("bootstrap + refresh: overlapping batch rows are a no-op, both versions readable") {
    val t = freshTable()
    val id0 = VersionedLoad.bootstrap(spark, t, fact(1L -> "a", 2L -> "b"), asOfMicros = 1000L)
    assert(id0 == 0L)
    // batch overlaps key 2 (conflicting value — must NOT overwrite) and adds key 3
    val id1 = VersionedLoad.refresh(spark, t, fact(2L -> "X", 3L -> "c"),
      Seq("k"), asOfMicros = 2000L)
    assert(id1 == 1L)
    val v1 = SnapshotStore.readVersion(spark, t, 1L).get.as[(Long, String)].collect().sorted
    assert(v1.toSeq == Seq(1L -> "a", 2L -> "b", 3L -> "c"),
      "existing rows win; only genuinely new keys append")
    assert(SnapshotStore.readVersion(spark, t, 0L).get.count() == 2,
      "the pre-refresh state stays time-travelable")
    // replaying the SAME batch commits a new version with IDENTICAL content
    val id2 = VersionedLoad.refresh(spark, t, fact(2L -> "X", 3L -> "c"),
      Seq("k"), asOfMicros = 3000L)
    val v2 = SnapshotStore.readVersion(spark, t, id2).get.as[(Long, String)].collect().sorted
    assert(v2.toSeq == v1.toSeq, "replay is a content no-op — the re-runnable contract")
  }

  test("a refresh crashed between snapshot write and promotion: previous version stays current, retry succeeds") {
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, fact(1L -> "a"), asOfMicros = 1000L)
    // simulate the torn window: the refresh wrote its snapshot (without
    // _SUCCESS — the job died mid-write) AND its manifest landed; this is
    // the worst crash point, because a naive reader would follow the
    // newest manifest into garbage
    val torn = new java.io.File(t, "snapshot-00000000000000000001-dead")
    torn.mkdirs()
    java.nio.file.Files.write(new java.io.File(torn, "part-torn.parquet").toPath, Array[Byte](7))
    java.nio.file.Files.write(
      new java.io.File(t, "manifest-00000000000000000001").toPath,
      "snapshot-00000000000000000001-dead".getBytes("UTF-8"))
    // readers resolve past the torn write to the committed bootstrap
    assert(SnapshotStore.read(spark, t).get.as[(Long, String)].collect().toSeq == Seq(1L -> "a"))
    // the RETRY merges against that committed state and promotes PAST the
    // debris id (the debris-proof monotonic rule) — no manual cleanup
    val id = VersionedLoad.refresh(spark, t, fact(2L -> "b"), Seq("k"), asOfMicros = 2000L)
    assert(id == 2L, "retry moves past the torn manifest id")
    assert(SnapshotStore.read(spark, t).get.as[(Long, String)].collect().sorted.toSeq ==
      Seq(1L -> "a", 2L -> "b"))
  }

  test("compaction commits a content-identical version with fewer files; the logical timeline is unchanged") {
    val t = freshTable()
    val rows = (1L to 100L).map(k => (k, s"v$k"))
    VersionedLoad.bootstrap(spark, t,
      rows.toDF("k", "v").repartition(8), asOfMicros = 5000L)
    def dataFiles(version: Long): Int = {
      val dir = new java.io.File(t)
      val manifest = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f"manifest-$version%020d").toPath), "UTF-8")
      val snap = manifest.split("\n")(0).trim
      new java.io.File(dir, snap).listFiles().count(_.getName.endsWith(".parquet"))
    }
    assert(dataFiles(0L) == 8, "the bootstrap is deliberately fragmented")
    val id = VersionedLoad.compact(spark, t, numFiles = 2, asOfMicros = Some(5000L))
    assert(id == 1L)
    assert(dataFiles(1L) <= 2, "compaction merges the files")
    // content identical, fragmented version still travelable
    val v0 = SnapshotStore.readVersion(spark, t, 0L).get.as[(Long, String)].collect().sorted
    val v1 = SnapshotStore.readVersion(spark, t, 1L).get.as[(Long, String)].collect().sorted
    assert(v0.toSeq == rows && v1.toSeq == rows, "compaction is a pure rewrite")
    // the shared pinned timestamp resolves to the COMPACTED (newest)
    // physical version - same logical instant, healed layout
    assert(SnapshotStore.readAsOf(spark, t, 5000L).get.inputFiles.length <= 2)
  }

  test("refresh reuses the previous version's files by reference — unchanged files are byte-identical, not rewritten") {
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, fact(1L -> "a", 2L -> "b"), asOfMicros = 1000L)
    val dir = new java.io.File(t)
    def manifest(version: Long): Seq[String] =
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f"manifest-$version%020d").toPath), "UTF-8").split("\n").toSeq
    def snapDirOf(version: Long): String = manifest(version).head.trim
    val v0snap = snapDirOf(0L)
    val v0files = new java.io.File(dir, v0snap).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getName -> (f.lastModified(), f.length(),
        java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(f.toPath)))).toMap
    assert(v0files.nonEmpty)
    val id1 = VersionedLoad.refresh(spark, t, fact(3L -> "c"), Seq("k"), asOfMicros = 2000L)
    // the v1 manifest lists v0's files BY REFERENCE plus v1's own new files
    val fileLines = manifest(id1).filter(_.startsWith("f ")).map(_.drop(2).trim)
    assert(fileLines.nonEmpty, "the refresh commit carries an explicit file list")
    v0files.keys.foreach { n =>
      assert(fileLines.contains(s"$v0snap/$n"), s"reused file $v0snap/$n missing from the manifest") }
    assert(fileLines.exists(_.startsWith(snapDirOf(id1))),
      "the delta's own files are in the list too")
    // the reused files were NOT rewritten: same mtime, size, and bytes
    v0files.foreach { case (n, (mtime, len, hash)) =>
      val f = new java.io.File(dir, s"$v0snap/$n")
      assert(f.lastModified() == mtime && f.length() == len &&
        java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(f.toPath)) == hash,
        s"reused file $n was rewritten by the refresh")
    }
    // and the merged read is complete
    assert(SnapshotStore.read(spark, t).get.as[(Long, String)].collect().sorted.toSeq ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // the delta directory holds ONLY the new row — O(delta) write cost
    assert(SnapshotStore.readVersion(spark, t, id1).get.count() == 3)
    val deltaRows = spark.read.parquet(s"$t/${snapDirOf(id1)}").count()
    assert(deltaRows == 1, s"refresh wrote $deltaRows rows; the delta is 1")
  }

  test("merge rewrites ONLY files containing matched keys: updates replace, survivors re-land, untouched files byte-identical") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    // two files with disjoint key ranges: file A = keys 1-2, file B = keys 3-4
    VersionedLoad.bootstrap(spark, t,
      fact(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d").repartitionByRange(2, col("k")),
      asOfMicros = 1000L)
    val dir = new java.io.File(t)
    def manifest(version: Long): Seq[String] =
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f"manifest-$version%020d").toPath), "UTF-8").split("\n").toSeq
    val v0snap = manifest(0L).head.trim
    val v0files = new java.io.File(dir, v0snap).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.lastModified(), f.length(),
        java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(f.toPath)))).toMap
    assert(v0files.size == 2, "the bootstrap landed as two key-disjoint files")
    // which physical file holds key 1?
    val touchedName = v0files.keys.find { n =>
      spark.read.parquet(s"$t/$v0snap/$n").as[(Long, String)].collect().exists(_._1 == 1L)
    }.get
    val untouchedName = (v0files.keySet - touchedName).head
    // the merge updates key 1 and inserts key 5
    val id1 = VersionedLoad.merge(spark, t, fact(1L -> "A2", 5L -> "e"),
      Seq("k"), asOfMicros = Some(2000L))
    assert(id1 == 1L)
    // upsert semantics: 1 replaced, 2-4 survive, 5 inserted
    assert(SnapshotStore.read(spark, t).get.as[(Long, String)].collect().sorted.toSeq ==
      Seq(1L -> "A2", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e"))
    // the manifest reuses the untouched file by reference and drops the touched one
    val fileLines = manifest(id1).filter(_.startsWith("f ")).map(_.drop(2).trim)
    assert(fileLines.contains(s"$v0snap/$untouchedName"),
      "the key-3/4 file is reused by reference")
    assert(!fileLines.contains(s"$v0snap/$touchedName"),
      "the file containing the matched key is no longer referenced")
    // the untouched file was not rewritten: same mtime, size, bytes
    val (mtime, len, hash) = v0files(untouchedName)
    val f = new java.io.File(dir, s"$v0snap/$untouchedName")
    assert(f.lastModified() == mtime && f.length() == len &&
      java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(f.toPath)) == hash,
      "the untouched file was rewritten by the merge")
    // O(delta + touched): the commit's own directory holds exactly the
    // batch (2 rows) plus the touched file's survivor (key 2)
    val v1snap = manifest(id1).head.trim
    val commitRows = spark.read.parquet(s"$t/$v1snap").as[(Long, String)].collect().sorted
    assert(commitRows.toSeq == Seq(1L -> "A2", 2L -> "b", 5L -> "e"),
      s"merge wrote ${commitRows.length} rows; expected batch + survivors only")
    // the pre-merge state stays travelable with the ORIGINAL value
    assert(SnapshotStore.readVersion(spark, t, 0L).get.as[(Long, String)]
      .collect().sorted.toSeq.contains(1L -> "a"))
  }

  test("merge with no matched keys is a pure insert: zero files rewritten, all reused by reference") {
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, fact(1L -> "a", 2L -> "b"), asOfMicros = 1000L)
    val dir = new java.io.File(t)
    def manifest(version: Long): Seq[String] =
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f"manifest-$version%020d").toPath), "UTF-8").split("\n").toSeq
    val v0snap = manifest(0L).head.trim
    val id1 = VersionedLoad.merge(spark, t, fact(3L -> "c"), Seq("k"), asOfMicros = Some(2000L))
    val fileLines = manifest(id1).filter(_.startsWith("f ")).map(_.drop(2).trim)
    val v0names = new java.io.File(dir, v0snap).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    v0names.foreach(n => assert(fileLines.contains(s"$v0snap/$n"),
      s"pure-insert merge must reuse $n by reference"))
    assert(SnapshotStore.read(spark, t).get.as[(Long, String)].collect().sorted.toSeq ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("statsCol records per-file min/max in the manifest and carries forward across file-reuse commits") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t,
      fact(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d").repartitionByRange(2, col("k")),
      asOfMicros = 1000L, statsCol = Some("k"))
    def statLines(version: Long): Seq[String] =
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(new java.io.File(t), f"manifest-$version%020d").toPath), "UTF-8")
        .split("\n").toSeq.filter(_.startsWith("s "))
    val s0 = statLines(0L)
    assert(s0.size == 2, s"one stat line per file expected, got $s0")
    // ranges cover the two key-disjoint files: {1,2} and {3,4}
    val ranges = s0.map(_.split(" ")).map(a => (a(2).toLong, a(3).toLong)).sorted
    assert(ranges == Seq((1L, 2L), (3L, 4L)), s"per-file min/max expected, got $ranges")
    // a refresh reuses both files: their stats carry forward verbatim,
    // and the delta's own file gains a fresh line
    val id1 = VersionedLoad.refresh(spark, t, fact(9L -> "z"), Seq("k"),
      asOfMicros = 2000L, statsCol = Some("k"))
    val s1 = statLines(id1)
    assert(s1.size == 3, s"carried + fresh stats expected, got $s1")
    assert(s0.forall(s1.contains), "reused files' stat lines carry forward verbatim")
    assert(s1.map(_.split(" ")).exists(a => a(2).toLong == 9L && a(3).toLong == 9L))
  }

  test("merge prunes its touched-file scan with the stats: a file outside every batch key's range is never read") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t,
      fact(1L -> "a", 2L -> "b", 100L -> "c", 101L -> "d").repartitionByRange(2, col("k")),
      asOfMicros = 1000L, statsCol = Some("k"))
    val dir = new java.io.File(t)
    def manifest(version: Long): Seq[String] =
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f"manifest-$version%020d").toPath), "UTF-8").split("\n").toSeq
    val v0snap = manifest(0L).head.trim
    // find the file holding the {100,101} range and DESTROY its content:
    // a merge whose batch keys all fall in the other file's range must
    // never open it — data skipping made observable (without stats the
    // touched-file location scans every file and would fail here)
    val highFile = manifest(0L).filter(_.startsWith("s "))
      .map(_.split(" ", 5)).find(_(2).toLong == 100L).get(4)
    java.nio.file.Files.write(new java.io.File(dir, highFile).toPath,
      "not a parquet file".getBytes("UTF-8"))
    val id1 = VersionedLoad.merge(spark, t, fact(1L -> "A2", 5L -> "e"),
      Seq("k"), asOfMicros = Some(2000L), statsCol = Some("k"))
    // the commit landed: batch + the low file's survivor, high file
    // reused by reference (unread), its stats carried forward
    val fileLines = manifest(id1).filter(_.startsWith("f ")).map(_.drop(2).trim)
    assert(fileLines.contains(highFile), "the pruned file is reused by reference")
    val v1snap = manifest(id1).head.trim
    assert(spark.read.parquet(s"$t/$v1snap").as[(Long, String)].collect().sorted.toSeq ==
      Seq(1L -> "A2", 2L -> "b", 5L -> "e"),
      "commit dir = batch + the scanned file's survivor only")
    assert(manifest(id1).filter(_.startsWith("s "))
      .exists(_.contains(highFile)), "the pruned file's stats carry forward")
  }

  test("upsertsBetween is value-exact CDC: re-homed survivors cancel, updates and inserts emit, correct across compaction") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t,
      fact(1L -> "a", 2L -> "b", 100L -> "c", 101L -> "d").repartitionByRange(2, col("k")),
      asOfMicros = 1000L, statsCol = Some("k"))
    val id1 = VersionedLoad.merge(spark, t, fact(1L -> "A2", 5L -> "e"),
      Seq("k"), asOfMicros = Some(2000L), statsCol = Some("k"))
    // the merge's commit dir carries {1->A2, 5->e} plus the re-homed
    // survivor 2->b; the multiset difference must cancel the survivor
    def ups(from: Long, to: Long, stats: Option[String]): Seq[(Long, String)] =
      VersionedLoad.upsertsBetween(spark, t, from, to, stats).get
        .as[(Long, String)].collect().sorted.toSeq
    assert(ups(0L, id1, Some("k")) == Seq(1L -> "A2", 5L -> "e"),
      "updates emit their new value, inserts emit, survivors cancel")
    assert(ups(0L, id1, None) == Seq(1L -> "A2", 5L -> "e"),
      "the unpruned path agrees with the stats-pruned one")
    // across a compaction every row re-homes; value-exact CDC returns
    // EMPTY (changesBetween's file diff would over-report here — the
    // documented trade)
    val id2 = VersionedLoad.compact(spark, t, numFiles = 1,
      asOfMicros = Some(2000L), statsCol = Some("k"))
    assert(VersionedLoad.upsertsBetween(spark, t, id1, id2, Some("k")).get.count() == 0,
      "a pure rewrite has no value changes")
  }

  test("readKeyRange skips files outside the range and still applies the exact filter inside candidates") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t,
      fact(1L -> "a", 2L -> "b", 100L -> "c", 101L -> "d").repartitionByRange(2, col("k")),
      asOfMicros = 1000L, statsCol = Some("k"))
    // exactness inside a candidate file: [2, 50] overlaps the low file's
    // range {1,2} but must return only k=2
    assert(SnapshotStore.readKeyRange(spark, t, "k", 2L, 50L).get
      .as[(Long, String)].collect().toSeq == Seq(2L -> "b"))
    // destroy the high file's bytes: a range read confined to the low
    // file's span must never open it — the skip made observable
    val dir = new java.io.File(t)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, f"manifest-${0L}%020d").toPath), "UTF-8").split("\n").toSeq
    val highFile = manifest.filter(_.startsWith("s "))
      .map(_.split(" ", 5)).find(_(2).toLong == 100L).get(4)
    java.nio.file.Files.write(new java.io.File(dir, highFile).toPath,
      "not a parquet file".getBytes("UTF-8"))
    assert(SnapshotStore.readKeyRange(spark, t, "k", 1L, 5L).get
      .as[(Long, String)].collect().sorted.toSeq == Seq(1L -> "a", 2L -> "b"),
      "an out-of-range file is never opened")
  }

  test("additive schema evolution: a merge batch with a new column unions with old files, old versions keep their shape") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t,
      fact(1L -> "a", 2L -> "b", 100L -> "c", 101L -> "d").repartitionByRange(2, col("k")),
      asOfMicros = 1000L, statsCol = Some("k"))
    val batch = Seq((1L, "A2", 10L), (5L, "e", 50L)).toDF("k", "v", "w")
    val id1 = VersionedLoad.merge(spark, t, batch, Seq("k"),
      asOfMicros = Some(2000L), statsCol = Some("k"))
    val head = SnapshotStore.read(spark, t).get
    assert(head.columns.sorted.toSeq == Seq("k", "v", "w"),
      "the union schema surfaces the new column")
    val rows = head.select("k", "v", "w").as[(Long, String, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, "A2", Some(10L)), (2L, "b", None), (5L, "e", Some(50L)),
      (100L, "c", None), (101L, "d", None)),
      "batch rows carry the new column; survivors and reused files project null")
    // the pre-evolution version still reads with its original shape
    assert(SnapshotStore.readVersion(spark, t, 0L).get.columns.sorted.toSeq == Seq("k", "v"))
    // value-exact CDC across the evolution: a survivor re-homed with a
    // null new column is logically unchanged and cancels
    val ups = VersionedLoad.upsertsBetween(spark, t, 0L, id1, Some("k")).get
      .select("k", "v", "w").as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(ups == Seq((1L, "A2", Some(10L)), (5L, "e", Some(50L))),
      s"only the genuine upserts emit across the schema change, got $ups")
  }

  test("statsCol on an unsupported column type fails loudly instead of recording lossy bounds") {
    val t = freshTable()
    // strings and dates are supported typed stats since r15; a DOUBLE is
    // the lossy-cast hazard that must still be refused
    intercept[IllegalArgumentException] {
      VersionedLoad.bootstrap(spark, t, Seq((1L, 5.7)).toDF("k", "x"),
        asOfMicros = 1000L, statsCol = Some("x"))
    }
  }

  test("occ merge refuses to race an in-flight claim; the default merge keeps the debris-proof recovery") {
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, fact(1L -> "a"), asOfMicros = 1000L)
    // torn debris above the head: a crashed writer's claimed-but-unlanded manifest
    java.nio.file.Files.write(
      new java.io.File(t, "manifest-00000000000000000001").toPath,
      "snapshot-00000000000000000001-dead".getBytes("UTF-8"))
    intercept[SnapshotStore.ConflictException] {
      VersionedLoad.merge(spark, t, fact(1L -> "A2"), Seq("k"),
        asOfMicros = Some(2000L), occ = true)
    }
    // the single-writer default (the streaming sink's posture) promotes
    // PAST the debris — its own crash recovery depends on it
    val id = VersionedLoad.merge(spark, t, fact(1L -> "A2"), Seq("k"),
      asOfMicros = Some(2000L))
    assert(id == 2L, "the default merge moves past the torn manifest id")
    assert(SnapshotStore.read(spark, t).get.as[(Long, String)].collect().toSeq ==
      Seq(1L -> "A2"))
  }

  test("merge into a never-bootstrapped table fails loudly") {
    val t = freshTable()
    intercept[IllegalStateException] {
      VersionedLoad.merge(spark, t, fact(1L -> "a"), Seq("k"), asOfMicros = Some(1L))
    }
  }

  test("file-level GC: files reused by retained manifests survive their own manifest aging out") {
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, fact(1L -> "a"), asOfMicros = 1000L, keep = 2)
    val dir = new java.io.File(t)
    val v0snap = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, f"manifest-${0L}%020d").toPath), "UTF-8").split("\n").head.trim
    // three refreshes at keep = 2: manifests 0 and 1 age out, but v0's
    // FILES stay referenced by every newer file-list commit
    (2L to 4L).foreach { i =>
      VersionedLoad.refresh(spark, t, fact(i -> s"v$i"), Seq("k"),
        asOfMicros = 1000L * i, keep = 2)
    }
    assert(!new java.io.File(dir, f"manifest-${0L}%020d").exists(),
      "the bootstrap manifest ages out at keep = 2")
    val v0dir = new java.io.File(dir, v0snap)
    assert(v0dir.exists() && v0dir.listFiles().exists(_.getName.endsWith(".parquet")),
      "the bootstrap's DATA FILES survive — the head still references them")
    // the full state reads correctly through the reference chain
    assert(SnapshotStore.read(spark, t).get.as[(Long, String)].collect().sorted.toSeq ==
      Seq(1L -> "a", 2L -> "v2", 3L -> "v3", 4L -> "v4"))
    // compaction collapses the chain: after it, a further refresh + GC can
    // finally reclaim the bootstrap's files once nothing references them
    VersionedLoad.compact(spark, t, numFiles = 1, asOfMicros = Some(5000L), keep = 2)
    VersionedLoad.refresh(spark, t, fact(9L -> "z"), Seq("k"), asOfMicros = 9000L, keep = 2)
    VersionedLoad.refresh(spark, t, fact(10L -> "z2"), Seq("k"), asOfMicros = 9500L, keep = 2)
    assert(!v0dir.exists() || !v0dir.listFiles().exists(_.getName.endsWith(".parquet")),
      "once no retained manifest references them, the old files are collected")
    assert(SnapshotStore.read(spark, t).get.count() == 6)
  }

  test("restore is a metadata-only rollback: zero data rewritten, every version still travelable") {
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, fact(1L -> "a", 2L -> "b"), asOfMicros = 1000L)
    VersionedLoad.refresh(spark, t, fact(3L -> "c"), Seq("k"), asOfMicros = 2000L)
    val id2 = VersionedLoad.restore(spark, t, version = 0L, asOfMicros = Some(3000L))
    assert(id2 == 2L)
    // the head IS version 0's state again
    assert(SnapshotStore.read(spark, t).get.as[(Long, String)].collect().sorted.toSeq ==
      Seq(1L -> "a", 2L -> "b"))
    // metadata-only: the restore commit's own primary directory carries
    // no data rows — its manifest references v0's files in place
    val dir = new java.io.File(t)
    val m2 = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, f"manifest-${2L}%020d").toPath), "UTF-8").split("\n")
    val ownDir = m2.head.trim
    val ownRows = Option(new java.io.File(dir, ownDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")) match {
      case fs if fs.isEmpty => 0L
      case fs => spark.read.parquet(fs.map(_.getAbsolutePath).toIndexedSeq: _*).count()
    }
    assert(ownRows == 0L, s"restore wrote $ownRows data rows; the rollback must be metadata-only")
    // the rolled-back-over version stays travelable (append-only history)
    assert(SnapshotStore.readVersion(spark, t, 1L).get.count() == 3)
    // and the head reads THROUGH v0's physical files (plus at most the
    // restore's own zero-row schema marker, already asserted empty)
    val v0snap = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, f"manifest-${0L}%020d").toPath), "UTF-8").split("\n").head.trim
    val headFiles = SnapshotStore.read(spark, t).get.inputFiles
    assert(headFiles.exists(_.contains(v0snap)) &&
      headFiles.forall(f => f.contains(v0snap) || f.contains(ownDir)),
      s"the restored head must reference version 0's files in place: ${headFiles.mkString(", ")}")
  }

  test("changesBetween reads ONLY the delta files and returns exactly the inserted rows") {
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, fact(1L -> "a"), asOfMicros = 1000L)
    VersionedLoad.refresh(spark, t, fact(1L -> "dup", 2L -> "b"), Seq("k"), asOfMicros = 2000L)
    VersionedLoad.refresh(spark, t, fact(2L -> "dup", 3L -> "c", 4L -> "d"),
      Seq("k"), asOfMicros = 3000L)
    val chg = VersionedLoad.changesBetween(spark, t, 1L, 2L).get
    assert(chg.as[(Long, String)].collect().sorted.toSeq == Seq(3L -> "c", 4L -> "d"),
      "changes are exactly the rows the second refresh genuinely inserted")
    // O(delta) read: every scanned file belongs to v2's own delta
    // directory — none of v0/v1's reused files are touched
    val dir = new java.io.File(t)
    val v2snap = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, f"manifest-${2L}%020d").toPath), "UTF-8").split("\n").head.trim
    assert(chg.inputFiles.nonEmpty && chg.inputFiles.forall(_.contains(v2snap)),
      s"changes scanned beyond the delta files: ${chg.inputFiles.mkString(", ")}")
    // a refresh that inserted nothing yields no changes at all
    VersionedLoad.refresh(spark, t, fact(3L -> "c"), Seq("k"), asOfMicros = 4000L)
    val none = VersionedLoad.changesBetween(spark, t, 2L, 3L)
    assert(none.isEmpty || none.get.count() == 0,
      "a pure-overlap refresh contributes no changed rows")
  }

  test("refreshing a never-bootstrapped table fails loudly") {
    val t = freshTable()
    intercept[IllegalStateException] {
      VersionedLoad.refresh(spark, t, fact(1L -> "a"), Seq("k"), asOfMicros = 1000L)
    }
  }
}
