package graft.streaming

import graft.SparkSuite
import graft.etl.Scd2
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming SCD2 sink: micro-batched change delivery must land the
  * exact dimension the batch engine computes from the same changes. */
class Scd2StreamSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("member_id", LongType),
    StructField("city", StringType),
    StructField("change_date", StringType)))

  test("streamed change batches converge to the batch SCD2 result") {
    val staged = java.nio.file.Files.createTempDirectory("graft_scd2_src").toString
    val target = java.nio.file.Files.createTempDirectory("graft_scd2_tgt").toString + "/dim"

    val day1 = Seq((1L, "Ipoh", "2024-01-01"), (2L, "Kuching", "2024-01-01"))
      .toDF("member_id", "city", "change_date")
    val day2 = Seq((1L, "Penang", "2024-02-01"), (3L, "Johor", "2024-02-01"))
      .toDF("member_id", "city", "change_date")

    day1.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q = Scd2Stream.startScd2Sink(spark, staged, target, schema,
      keyCols = Seq("member_id"), trackedCols = Seq("city"))
    try {
      q.processAllAvailable()
      day2.coalesce(1).write.mode(SaveMode.Append).parquet(staged)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = Scd2Stream.readDim(spark, target).get
    // the batch engine over the same deliveries
    val expected = {
      val init = Scd2.initial(day1.drop("change_date"), "2024-01-01")
      val chg  = day2.drop("change_date")
      Scd2.apply(init, chg.filter($"member_id" === 1L), Seq("member_id"), Seq("city"), "2024-02-01")
        .unionByName(Scd2.initial(chg.filter($"member_id" === 3L), "2024-02-01"))
    }
    assert(streamed.count() == 4) // 1: closed+current, 2: current, 3: current
    assert(streamed.except(expected).count() == 0 && expected.except(streamed).count() == 0,
      "stream must equal batch SCD2")
    // member 1's history: closed Ipoh version, open Penang version
    val m1 = streamed.filter($"member_id" === 1L).orderBy("effective_date")
      .select("city", "curr_ind", "expiration_date").collect()
    assert(m1.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("Ipoh", "N"), ("Penang", "Y")))
    assert(m1.head.getDate(2).toString == "2024-01-31") // closed the day before
  }

  test("replaying the same delivery is idempotent at the version grain") {
    val staged = java.nio.file.Files.createTempDirectory("graft_scd2_replay").toString
    val target = java.nio.file.Files.createTempDirectory("graft_scd2_rt").toString + "/dim"
    val day1 = Seq((7L, "Melaka", "2024-03-01")).toDF("member_id", "city", "change_date")
    day1.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)

    val q = Scd2Stream.startScd2Sink(spark, staged, target, schema,
      keyCols = Seq("member_id"), trackedCols = Seq("city"))
    try {
      q.processAllAvailable()
      // identical change content arrives again (new file, same rows):
      // the differs-check sees no tracked-attribute change -> no new version
      day1.coalesce(1).write.mode(SaveMode.Append).parquet(staged)
      q.processAllAvailable()
    } finally q.stop()

    val dim = Scd2Stream.readDim(spark, target).get
    assert(dim.count() == 1, "replay minted a spurious version")
    assert(dim.filter($"curr_ind" === "Y" && $"city" === "Melaka").count() == 1)
  }

  test("duplicate (key, change_date) rows in one delivery fail the batch loudly") {
    val staged = java.nio.file.Files.createTempDirectory("graft_scd2_dup").toString
    val target = java.nio.file.Files.createTempDirectory("graft_scd2_dt").toString + "/dim"
    // same member, same date, two conflicting cities in ONE delivery
    Seq((9L, "Ipoh", "2024-04-01"), (9L, "Kuantan", "2024-04-01"))
      .toDF("member_id", "city", "change_date")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q = Scd2Stream.startScd2Sink(spark, staged, target, schema,
      keyCols = Seq("member_id"), trackedCols = Seq("city"))
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("contract violation") ||
        Option(e.getCause).exists(_.getMessage.contains("contract violation")))
    } finally q.stop()
    // nothing was committed to the dimension
    assert(Scd2Stream.readDim(spark, target).isEmpty,
      "a failed batch must not promote a snapshot")
  }

  test("a NULL change_date in a delivery fails the batch loudly (not silent row loss)") {
    // a null date has no defined position in the apply order and its
    // rows can never match the per-date filter — without the guard they
    // would be silently dropped (single-date delivery) or NPE inside
    // the sort as an unattributed stack trace (multi-date delivery)
    val staged = java.nio.file.Files.createTempDirectory("graft_scd2_nulldate").toString
    val target = java.nio.file.Files.createTempDirectory("graft_scd2_ndt").toString + "/dim"
    Seq((3L, "Ipoh", Option.empty[String]), (4L, "Kuching", Option("2024-06-01")))
      .toDF("member_id", "city", "change_date")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q = Scd2Stream.startScd2Sink(spark, staged, target, schema,
      keyCols = Seq("member_id"), trackedCols = Seq("city"))
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("NULL change_date") ||
        Option(e.getCause).exists(_.getMessage.contains("NULL change_date")))
    } finally q.stop()
    assert(Scd2Stream.readDim(spark, target).isEmpty,
      "a failed batch must not promote a snapshot")
  }

  test("bit-identical duplicate rows in one coalesced delivery are harmless") {
    val staged = java.nio.file.Files.createTempDirectory("graft_scd2_bitdup").toString
    val target = java.nio.file.Files.createTempDirectory("graft_scd2_bt").toString + "/dim"
    // a restart/backlog can coalesce two individually-valid deliveries
    // carrying the SAME rows into one micro-batch — that must not trip
    // the conflicting-values guard (it would be a poison pill: the
    // checkpoint replays the same files on every retry)
    Seq((5L, "Sibu", "2024-05-01"), (5L, "Sibu", "2024-05-01"))
      .toDF("member_id", "city", "change_date")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q = Scd2Stream.startScd2Sink(spark, staged, target, schema,
      keyCols = Seq("member_id"), trackedCols = Seq("city"))
    try q.processAllAvailable() finally q.stop()
    val dim = Scd2Stream.readDim(spark, target).get
    assert(dim.count() == 1, "bit-identical duplicates must collapse to one version")
    assert(dim.filter($"curr_ind" === "Y" && $"city" === "Sibu").count() == 1)
  }

  test("replay equivalence on real input files: stream == the oracle-checked etl_scd2_apply") {
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_mktsegment", StringType),
      StructField("change_date", StringType)))
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
    val staged = java.nio.file.Files.createTempDirectory("graft_scd2_real").toString
    val target = java.nio.file.Files.createTempDirectory("graft_scd2_rt2").toString + "/dim"

    // delivery 1: the full customer dim as day-one changes (bootstrap)
    cust.withColumn("change_date", lit("1992-01-01"))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q = Scd2Stream.startScd2Sink(spark, staged, target, custSchema,
      keyCols = Seq("c_custkey"), trackedCols = Seq("c_mktsegment"))
    try {
      q.processAllAvailable()
      // delivery 2: the exact change set of the oracle-checked batch op —
      // every 10th customer moves to MACHINERY on 1996-06-01
      cust.filter($"c_custkey" % 10 === 0)
        .withColumn("c_mktsegment", lit("MACHINERY"))
        .withColumn("change_date", lit("1996-06-01"))
        .coalesce(1).write.mode(SaveMode.Append).parquet(staged)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = Scd2Stream.readDim(spark, target).get
    val batch = graft.SparkEntry.queries("etl_scd2_apply")(spark, sf0001)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0,
      "streamed SCD2 dim must equal the batch op on the same inputs")
  }

  test("a torn snapshot write cannot destroy committed history (crash-mid-write window)") {
    // the r11 sink overwrote the target in place: a crash between the
    // delete and the commit of mode("overwrite") left ZERO committed
    // files, and the next restart re-bootstrapped over the destroyed
    // history. The snapshot/manifest protocol must make that window
    // unobservable: simulate the torn write's debris — a snapshot dir
    // with no _SUCCESS plus a manifest pointing at it, both NEWER than
    // the committed state — and the reader and a restarted sink must
    // both resolve the last COMMITTED snapshot.
    val staged = java.nio.file.Files.createTempDirectory("graft_scd2_torn_src").toString
    val target = java.nio.file.Files.createTempDirectory("graft_scd2_torn_tgt").toString + "/dim"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_scd2_torn_ck").toString + "/c"
    val day1 = Seq((1L, "Ipoh", "2024-01-01"), (2L, "Kuching", "2024-01-01"))
      .toDF("member_id", "city", "change_date")
    day1.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q1 = Scd2Stream.startScd2Sink(spark, staged, target, schema,
      keyCols = Seq("member_id"), trackedCols = Seq("city"),
      checkpointDir = Some(ckpt))
    try q1.processAllAvailable() finally q1.stop()
    assert(Scd2Stream.readDim(spark, target).get.count() == 2)

    // torn-write debris: partial snapshot (no _SUCCESS), manifest already
    // promoted to it (the worst ordering — pointer ahead of data)
    val torn = new java.io.File(target, "snapshot-00000000000000000099-dead")
    torn.mkdirs()
    java.nio.file.Files.write(new java.io.File(torn, "part-junk.parquet").toPath,
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(
      new java.io.File(target, "manifest-00000000000000000099").toPath,
      "snapshot-00000000000000000099-dead".getBytes("UTF-8"))

    // reader: falls back past the un-committed snapshot
    val dim = Scd2Stream.readDim(spark, target).get
    assert(dim.count() == 2 && dim.filter($"curr_ind" === "Y").count() == 2,
      "reader must resolve the last committed snapshot, not the torn one")

    // restarted sink: applies day 2 ON TOP of the committed history —
    // a re-bootstrap would leave member 2 gone and Penang as the only row
    Seq((1L, "Penang", "2024-02-01")).toDF("member_id", "city", "change_date")
      .coalesce(1).write.mode(SaveMode.Append).parquet(staged)
    val q2 = Scd2Stream.startScd2Sink(spark, staged, target, schema,
      keyCols = Seq("member_id"), trackedCols = Seq("city"),
      checkpointDir = Some(ckpt))
    try q2.processAllAvailable() finally q2.stop()
    val after = Scd2Stream.readDim(spark, target).get
    assert(after.count() == 3, "history must survive the torn write")
    assert(after.filter($"member_id" === 1L && $"curr_ind" === "N" && $"city" === "Ipoh").count() == 1)
    assert(after.filter($"member_id" === 2L && $"curr_ind" === "Y").count() == 1)
  }

  test("SCD2 sink survives a kill-and-restart from its checkpoint mid-history") {
    // the kill lands where the state is most intricate: member 1's
    // version is OPEN at the cut, and the post-restart delivery must
    // CLOSE it — a restart that wrongly re-bootstrapped would overwrite
    // the history (one open Penang version, member 2 gone); a restart
    // with a fresh checkpoint would re-read the committed wave-1 file
    val staged = java.nio.file.Files.createTempDirectory("graft_scd2_crash_src").toString
    val target = java.nio.file.Files.createTempDirectory("graft_scd2_crash_tgt").toString + "/dim"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_scd2_crash_ck").toString + "/c"
    val day1 = Seq((1L, "Ipoh", "2024-01-01"), (2L, "Kuching", "2024-01-01"))
      .toDF("member_id", "city", "change_date")
    val day2 = Seq((1L, "Penang", "2024-02-01"), (3L, "Johor", "2024-02-01"))
      .toDF("member_id", "city", "change_date")

    day1.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q1 = Scd2Stream.startScd2Sink(spark, staged, target, schema,
      keyCols = Seq("member_id"), trackedCols = Seq("city"),
      checkpointDir = Some(ckpt), maxFilesPerTrigger = Some(1))
    try q1.processAllAvailable() finally q1.stop() // the kill
    val atCut = Scd2Stream.readDim(spark, target).get
    assert(atCut.count() == 2 && atCut.filter($"curr_ind" === "Y").count() == 2,
      "the cut must straddle two open versions")
    // checkpoint state at the cut: committed offsets + the file-source
    // log naming the wave-1 files (numInputRows is useless here —
    // foreachBatch's multiple actions re-scan the source, multiplying
    // the metric — so the evidence reads the checkpoint itself)
    def entries(sub: String) = Option(new java.io.File(ckpt, sub).list())
      .fold(Set.empty[String])(_.toSet)
      .filterNot(_.startsWith(".")) // hadoop .crc shadows
    val offsetsAtCut = entries("offsets")
    val srcLogAtCut = entries("sources/0")
    val wave1Files = new java.io.File(staged).list().filter(_.endsWith(".parquet")).toSet
    assert(offsetsAtCut.nonEmpty && srcLogAtCut.nonEmpty, "wave 1 must commit to the checkpoint")

    day2.coalesce(1).write.mode(SaveMode.Append).parquet(staged)
    val wave2Files = new java.io.File(staged).list().filter(_.endsWith(".parquet")).toSet -- wave1Files
    val q2 = Scd2Stream.startScd2Sink(spark, staged, target, schema,
      keyCols = Seq("member_id"), trackedCols = Seq("city"),
      checkpointDir = Some(ckpt), maxFilesPerTrigger = Some(1))
    try q2.processAllAvailable() finally q2.stop()
    // direct checkpoint evidence: the restart EXTENDED this checkpoint
    // (new committed offsets on top of wave 1's, not a fresh log), and
    // every post-restart source-log entry lists only wave-2 files — the
    // committed wave-1 file was never re-read
    val newOffsets = entries("offsets") -- offsetsAtCut
    assert(newOffsets.nonEmpty, "restart must extend the same checkpoint's offset log")
    val newSrcEntries = entries("sources/0") -- srcLogAtCut
    assert(newSrcEntries.nonEmpty, "restart must log its newly discovered files")
    newSrcEntries.foreach { e =>
      val txt = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(ckpt, s"sources/0/$e").toPath))
      assert(!wave1Files.exists(txt.contains),
        s"post-restart source log $e re-lists a committed wave-1 file")
      assert(wave2Files.exists(txt.contains),
        s"post-restart source log $e must list the wave-2 file")
    }

    // the post-restart history equals the batch Scd2 chain ...
    val streamed = Scd2Stream.readDim(spark, target).get
    val expected = {
      val init = Scd2.initial(day1.drop("change_date"), "2024-01-01")
      val chg = day2.drop("change_date")
      Scd2.apply(init, chg.filter($"member_id" === 1L), Seq("member_id"), Seq("city"), "2024-02-01")
        .unionByName(Scd2.initial(chg.filter($"member_id" === 3L), "2024-02-01"))
    }
    assert(streamed.count() == 4)
    assert(streamed.except(expected).count() == 0 && expected.except(streamed).count() == 0,
      "post-restart dimension must equal the batch SCD2 chain")
    // ... and is CONTIGUOUS across the cut: the version open at the
    // kill closed the day before its successor opened, one current
    // version per key
    val m1 = streamed.filter($"member_id" === 1L).orderBy("effective_date")
      .select("city", "curr_ind", "effective_date", "expiration_date").collect()
    assert(m1.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("Ipoh", "N"), ("Penang", "Y")))
    assert(m1.head.getDate(3).toLocalDate.plusDays(1) == m1.last.getDate(2).toLocalDate,
      "the straddled version must close contiguously with its successor")
    val perKey = streamed.filter($"curr_ind" === "Y").groupBy("member_id").count()
    assert(perKey.filter($"count" =!= 1).count() == 0, "exactly one current version per key")
  }
}
