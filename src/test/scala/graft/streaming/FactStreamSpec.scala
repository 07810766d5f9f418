package graft.streaming

import graft.SparkSuite
import graft.etl.SnapshotStore
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types._

/** The streaming versioned fact sink's contract: per-batch anti-join
  * merge on the grain (existing keys win), atomic versioned commits,
  * replayed deliveries are content no-ops after a kill-and-restart,
  * and every pre-state stays time-travelable. */
class FactStreamSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("versioned fact sink: grain merge, restart, replay no-op, travelable history") {
    val root = java.nio.file.Files.createTempDirectory("graft_factstream").toString
    val src  = s"$root/src"; val tbl = s"$root/tbl"; val cp = s"$root/cp"
    new java.io.File(src).mkdirs()

    def deliver(name: String, rows: (Long, String)*): Unit =
      rows.toSeq.toDF("k", "v").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$src/$name")
    def stage(name: String, rows: (Long, String)*): Unit = {
      // the stream reads the flat src dir; stage each delivery as one file
      deliver(s".stage_$name", rows: _*)
      val staged = new java.io.File(s"$src/.stage_$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(staged.toPath, new java.io.File(s"$src/$name.parquet").toPath)
    }
    def state(): Set[(Long, String)] =
      FactStream.readFact(spark, tbl).get.as[(Long, String)].collect().toSet

    stage("f1", 1L -> "a", 2L -> "b")
    val q = FactStream.startVersionedFactSink(spark, src, tbl, schema, Seq("k"),
      checkpointDir = Some(cp), maxFilesPerTrigger = Some(1))
    try {
      q.processAllAvailable()
      assert(state() == Set(1L -> "a", 2L -> "b"))
      // second delivery overlaps key 2 with a CONFLICTING value — the
      // existing row must win; key 3 is genuinely new
      stage("f2", 2L -> "X", 3L -> "c")
      q.processAllAvailable()
      assert(state() == Set(1L -> "a", 2L -> "b", 3L -> "c"),
        "existing grain keys win; only new keys append")
    } finally q.stop()

    val verBefore = SnapshotStore.currentVersion(spark, tbl).get
    // kill-and-restart from the same checkpoint; a new file re-delivers
    // f2's exact content (the at-least-once source) — its rows must
    // anti-join away into a content-identical commit
    stage("f3", 2L -> "X", 3L -> "c")
    val q2 = FactStream.startVersionedFactSink(spark, src, tbl, schema, Seq("k"),
      checkpointDir = Some(cp), maxFilesPerTrigger = Some(1))
    try {
      q2.processAllAvailable()
      assert(state() == Set(1L -> "a", 2L -> "b", 3L -> "c"),
        "a replayed delivery is a content no-op")
      assert(SnapshotStore.currentVersion(spark, tbl).get > verBefore,
        "the no-op still commits a new auditable version")
    } finally q2.stop()
    // the very first delivery's state remains time-travelable
    assert(SnapshotStore.readVersion(spark, tbl, 0L).get.count() == 2,
      "the bootstrap state stays travelable")
  }
}
