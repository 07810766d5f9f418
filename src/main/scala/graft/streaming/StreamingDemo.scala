package graft.streaming

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Runnable demo of the streaming paths: stages the events table as a
  * file-stream source, then runs (1) watermarked windowed counts,
  * (2) stateful gap sessionization, (3) the foreachBatch MERGE sink —
  * printing row counts and samples from each.
  *
  * Usage: runMain graft.streaming.StreamingDemo [sfDir]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val staged = java.nio.file.Files.createTempDirectory("graft_stream_demo").toString
    Tables(spark, sfDir).events.coalesce(2).write.mode("overwrite").parquet(staged)

    val qWin = EventsStream.start(spark, staged, "demo_windows")
    qWin.processAllAvailable(); qWin.stop()
    println(s"windowed counts: ${spark.table("demo_windows").count()} rows")
    spark.table("demo_windows").orderBy("window_start", "event_type").show(5)

    val qSess = EventsStream.startSessionize(spark, staged, "demo_sessions")
    qSess.processAllAvailable(); qSess.stop()
    println(s"closed sessions: ${spark.table("demo_sessions").count()} rows")
    spark.table("demo_sessions").orderBy("user_id", "session_start_ms").show(5)

    val target = java.nio.file.Files.createTempDirectory("graft_stream_demo_tgt").toString + "/agg"
    val qMerge = EventsStream.startMergeSink(spark, staged, target)
    qMerge.processAllAvailable(); qMerge.stop()
    println(s"merge-sink aggregate: ${spark.read.parquet(target).count()} rows")
    spark.read.parquet(target).orderBy("window_start", "event_type").show(5)

    spark.stop()
  }
}
