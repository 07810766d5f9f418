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
    assert(id == 2L)
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
    // and the NEXT promotion moves past the torn id rather than under it
    val id = SnapshotStore.promote(spark, t, Seq((1L, "next")).toDF("k", "v"), keep = 16)
    assert(id == 1L, "ids derive from the newest COMMITTED version")
  }
}
