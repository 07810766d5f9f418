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

    val streamed = spark.read.parquet(target)
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

    val dim = spark.read.parquet(target)
    assert(dim.count() == 1, "replay minted a spurious version")
    assert(dim.filter($"curr_ind" === "Y" && $"city" === "Melaka").count() == 1)
  }
}
