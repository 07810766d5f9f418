package graft.streaming

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class EventsStreamSpec extends SparkSuite {

  test("streaming windowed counts match the batch equivalent") {
    // stage events as TimestampType parquet (source table is TIMESTAMP(NANOS))
    val staged = java.nio.file.Files.createTempDirectory("graft_stream_spec").toString
    val events = Tables(spark, sf0001).events
    events.coalesce(2).write.mode(SaveMode.Overwrite).parquet(staged)

    val q = EventsStream.start(spark, staged, "stream_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_test")
      val batch = events
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val s = streamed.select("window_start", "event_type", "n_events")
        .orderBy("window_start", "event_type").collect().toSeq
      val b = batch.orderBy("window_start", "event_type").collect().toSeq
      assert(s.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))) ==
        b.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))))
    } finally q.stop()
  }
}
