package graft.etl

import graft.SparkSuite

/** The manifest-pointer table format's contract: monotonic version ids,
  * exact time travel, bounded GC that never collects a retained
  * version, and torn-write resilience (the reader skips a promoted
  * manifest whose snapshot never committed). */
class SnapshotStoreSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snapstore").toString + "/t"

  test("promote returns monotonic ids and read resolves the newest commit") {
    val t = freshTable()
    val id0 = SnapshotStore.promote(spark, t, Seq((1L, "a")).toDF("k", "v"), keep = 16)
    val id1 = SnapshotStore.promote(spark, t, Seq((1L, "b")).toDF("k", "v"), keep = 16)
    // preferredId below the current id must still move FORWARD
    val id2 = SnapshotStore.promote(spark, t, Seq((1L, "c")).toDF("k", "v"),
      preferredId = 0L, keep = 16)
    assert(id0 == 0L && id1 == 1L && id2 == 2L)
    assert(SnapshotStore.currentVersion(spark, t).contains(2L))
    assert(SnapshotStore.read(spark, t).get.select("v").head().getString(0) == "c")
  }

  test("readVersion time-travels to exactly the requested commit") {
    val t = freshTable()
    SnapshotStore.promote(spark, t, Seq((1L, "a")).toDF("k", "v"), keep = 16)
    SnapshotStore.promote(spark, t, Seq((1L, "b"), (2L, "b2")).toDF("k", "v"), keep = 16)
    assert(SnapshotStore.readVersion(spark, t, 0L).get.count() == 1)
    assert(SnapshotStore.readVersion(spark, t, 1L).get.count() == 2)
    assert(SnapshotStore.readVersion(spark, t, 9L).isEmpty, "an uncommitted version reads as absent")
  }

  test("GC retains exactly the keep newest versions") {
    val t = freshTable()
    (0 until 5).foreach { i =>
      SnapshotStore.promote(spark, t, Seq((i.toLong, s"v$i")).toDF("k", "v"), keep = 2)
    }
    assert(SnapshotStore.currentVersion(spark, t).contains(4L))
    assert(SnapshotStore.readVersion(spark, t, 4L).isDefined)
    assert(SnapshotStore.readVersion(spark, t, 3L).isDefined,
      "the previous version must survive until the next promotion")
    assert(SnapshotStore.readVersion(spark, t, 2L).isEmpty, "older versions are collected")
  }

  test("torn debris above the head cannot push committed history out of the GC keep set") {
    // retention must count COMMITTED manifests: if raw id order picked
    // the keep set, two junk manifests with huge ids would occupy both
    // keep slots and the next promote's GC would delete every committed
    // manifest - including the one it just wrote
    val t = freshTable()
    SnapshotStore.promote(spark, t, Seq((1L, "a")).toDF("k", "v"), keep = 2)
    SnapshotStore.promote(spark, t, Seq((1L, "b")).toDF("k", "v"), keep = 2)
    for (id <- Seq("98", "99")) {
      val torn = new java.io.File(t, s"snapshot-000000000000000000$id-dead")
      torn.mkdirs()
      java.nio.file.Files.write(new java.io.File(torn, "junk.parquet").toPath, Array[Byte](1))
      java.nio.file.Files.write(
        new java.io.File(t, s"manifest-000000000000000000$id").toPath,
        s"snapshot-000000000000000000$id-dead".getBytes("UTF-8"))
    }
    val id = SnapshotStore.promote(spark, t, Seq((1L, "c")).toDF("k", "v"), keep = 2)
    assert(id == 100L, "the id moves past every LISTED manifest, debris included")
    assert(SnapshotStore.read(spark, t).get.select("v").head().getString(0) == "c",
      "the just-promoted commit must survive its own GC")
    assert(SnapshotStore.readVersion(spark, t, 1L).isDefined,
      "the previous committed version must survive despite the debris")
    assert(SnapshotStore.readVersion(spark, t, 0L).isEmpty,
      "normal retention still collects beyond keep")
  }

  test("a torn write (manifest ahead of data) is skipped by every reader") {
    val t = freshTable()
    SnapshotStore.promote(spark, t, Seq((1L, "good")).toDF("k", "v"), keep = 16)
    // debris: a newer manifest pointing at a snapshot without _SUCCESS
    val torn = new java.io.File(t, "snapshot-00000000000000000099-dead")
    torn.mkdirs()
    java.nio.file.Files.write(new java.io.File(torn, "part-junk.parquet").toPath,
      Array[Byte](9))
    java.nio.file.Files.write(
      new java.io.File(t, "manifest-00000000000000000099").toPath,
      "snapshot-00000000000000000099-dead".getBytes("UTF-8"))
    assert(SnapshotStore.read(spark, t).get.select("v").head().getString(0) == "good")
    assert(SnapshotStore.currentVersion(spark, t).contains(0L))
    assert(SnapshotStore.readVersion(spark, t, 99L).isEmpty)
    // and the NEXT promotion moves PAST the torn id — if it recomputed
    // committed-head + 1 = 1 forever while debris squatted there, a
    // debris file at exactly that id would wedge every retry (the
    // ADVICE-flagged failure; here debris sits at 99, so the promotion
    // must land at 100)
    val id = SnapshotStore.promote(spark, t, Seq((1L, "next")).toDF("k", "v"), keep = 16)
    assert(id == 100L, "promotion always moves past listed debris")
    assert(SnapshotStore.read(spark, t).get.select("v").head().getString(0) == "next")
  }

  test("debris squatting at the next id cannot wedge promotion") {
    val t = freshTable()
    SnapshotStore.promote(spark, t, Seq((1L, "a")).toDF("k", "v"), keep = 16)
    // an unresolvable manifest at exactly committed-head + 1: the old
    // committed-head rule would recompute nextId = 1, fail the rename,
    // and fail identically on every retry
    java.nio.file.Files.write(
      new java.io.File(t, "manifest-00000000000000000001").toPath,
      "snapshot-gone".getBytes("UTF-8"))
    val id = SnapshotStore.promote(spark, t, Seq((1L, "b")).toDF("k", "v"), keep = 16)
    assert(id == 2L)
    assert(SnapshotStore.read(spark, t).get.select("v").head().getString(0) == "b")
  }

  test("readAsOf resolves the newest commit at or before the pinned timestamp") {
    val t = freshTable()
    SnapshotStore.promote(spark, t, Seq((1L, "jan")).toDF("k", "v"),
      keep = 16, asOfMicros = Some(1000L))
    SnapshotStore.promote(spark, t, Seq((1L, "jun")).toDF("k", "v"),
      keep = 16, asOfMicros = Some(5000L))
    // exact hit on a commit timestamp
    assert(SnapshotStore.readAsOf(spark, t, 1000L).get.select("v").head().getString(0) == "jan")
    assert(SnapshotStore.readAsOf(spark, t, 5000L).get.select("v").head().getString(0) == "jun")
    // between two commits -> the earlier one
    assert(SnapshotStore.readAsOf(spark, t, 4999L).get.select("v").head().getString(0) == "jan")
    // after the last -> the head
    assert(SnapshotStore.readAsOf(spark, t, Long.MaxValue).get.select("v").head().getString(0) == "jun")
    // before the first commit -> absent
    assert(SnapshotStore.readAsOf(spark, t, 999L).isEmpty)
  }

  test("untimestamped commits are invisible to timestamp travel but fine for version travel") {
    val t = freshTable()
    SnapshotStore.promote(spark, t, Seq((1L, "old")).toDF("k", "v"), keep = 16)
    SnapshotStore.promote(spark, t, Seq((1L, "new")).toDF("k", "v"),
      keep = 16, asOfMicros = Some(7000L))
    assert(SnapshotStore.readAsOf(spark, t, 6999L).isEmpty,
      "an untimestamped commit has no defined as-of position")
    assert(SnapshotStore.readAsOf(spark, t, 7000L).get.select("v").head().getString(0) == "new")
    assert(SnapshotStore.readVersion(spark, t, 0L).get.select("v").head().getString(0) == "old")
  }

  test("a stale expectCurrent fails with ConflictException instead of committing a lost update") {
    val t = freshTable()
    SnapshotStore.promote(spark, t, Seq((1L, "base")).toDF("k", "v"), keep = 16)
    // writer W read version 0 and merged from it; meanwhile another
    // commit moved the head to 1 — W's promote must refuse
    SnapshotStore.promote(spark, t, Seq((1L, "interloper")).toDF("k", "v"), keep = 16)
    intercept[SnapshotStore.ConflictException] {
      SnapshotStore.promote(spark, t, Seq((1L, "lost-update")).toDF("k", "v"),
        keep = 16, expectCurrent = Some(0L))
    }
    assert(SnapshotStore.read(spark, t).get.select("v").head().getString(0) == "interloper",
      "the refused commit left the head untouched")
    // the expectation sentinel for an empty table works the same way
    intercept[SnapshotStore.ConflictException] {
      SnapshotStore.promote(spark, t, Seq((1L, "x")).toDF("k", "v"),
        keep = 16, expectCurrent = Some(SnapshotStore.NoVersion))
    }
  }

  test("two writers through retryingPromote both commit, exactly once each") {
    val t = freshTable()
    SnapshotStore.promote(spark, t, Seq((0L, "base")).toDF("k", "v"), keep = 16)
    // writer A's merge: append row 1 to whatever it reads. The FIRST
    // attempt's compute sneaks writer B's full commit in before A's
    // promote — so A's expectCurrent pre-check sees the moved head,
    // conflicts, re-reads B's state, and re-merges on top of it.
    var aAttempts = 0
    val idA = SnapshotStore.retryingPromote(spark, t, { base =>
      aAttempts += 1
      if (aAttempts == 1) {
        // interleaved writer B: read-merge-commit completes first
        SnapshotStore.retryingPromote(spark, t, { bBase =>
          bBase.get.unionByName(Seq((2L, "from-B")).toDF("k", "v"))
        }, keep = 16): Unit
      }
      base.get.unionByName(Seq((1L, "from-A")).toDF("k", "v"))
    }, keep = 16)
    assert(aAttempts == 2, "A's first attempt must lose the race and retry")
    assert(idA == SnapshotStore.currentVersion(spark, t).get)
    val rows = SnapshotStore.read(spark, t).get.as[(Long, String)].collect().toSeq.sorted
    assert(rows == Seq(0L -> "base", 1L -> "from-A", 2L -> "from-B"),
      "both writers' rows land exactly once — no lost update, no double apply")
  }

  test("a zombie writer's promote fails by fence contract; exactly one writer wins") {
    val t = freshTable()
    val fenceA = SnapshotStore.acquireFence(spark, t)
    // writer B takes over (failover): its fence supersedes A's
    val fenceB = SnapshotStore.acquireFence(spark, t)
    assert(fenceB > fenceA)
    // zombie A wakes up and tries to promote — dies loudly pre-rename
    intercept[SnapshotStore.FencedException] {
      SnapshotStore.promote(spark, t, Seq((1L, "zombie")).toDF("k", "v"),
        keep = 2, fence = Some(fenceA))
    }
    // B promotes fine; A's unpromoted snapshot is orphan debris that the
    // next GC-triggering commit may sweep (never referenced by a manifest)
    val id = SnapshotStore.promote(spark, t, Seq((1L, "b")).toDF("k", "v"),
      keep = 2, fence = Some(fenceB))
    assert(id == 0L)
    assert(SnapshotStore.read(spark, t).get.select("v").head().getString(0) == "b")
    val orphans = new java.io.File(t).listFiles().map(_.getName)
      .filter(_.startsWith("snapshot-")).toSeq
    assert(orphans.size == 2, "the zombie's snapshot dir exists but is unreferenced")
  }
}
