package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only empirical profiler (guide §1): runs the named queries with the
  * Bench session configuration and reports, per query, the warm cost
  * decomposition the disabled UI would otherwise show — jobs launched,
  * stages, tasks, summed executor task time, GC time, shuffle bytes
  * read/written, and records shuffled. Methodology matches Bench (same
  * session confs, warmup action, `.count()` as the measured action,
  * cache/persistent-RDD cleanup between queries); numbers are from the
  * SECOND run of each query so one-time artifact builds and codegen drop
  * out.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.Profile <sfDir> key..."
  */
object Profile {
  final class Acc extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val gcMs = new AtomicLong
    val shufReadB = new AtomicLong
    val shufWriteB = new AtomicLong
    val shufReadRec = new AtomicLong
    val inputB = new AtomicLong
    val spillB = new AtomicLong
    var maxTaskMs = 0L
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0); gcMs.set(0)
      shufReadB.set(0); shufWriteB.set(0); shufReadRec.set(0); inputB.set(0); spillB.set(0)
      maxTaskMs = 0
    }
    override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = e.taskMetrics
      if (m != null) {
        taskTimeMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufReadRec.addAndGet(m.shuffleReadMetrics.recordsRead)
        inputB.addAndGet(m.inputMetrics.bytesRead)
        spillB.addAndGet(m.memoryBytesSpilled)
        synchronized { maxTaskMs = math.max(maxTaskMs, m.executorRunTime) }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = if (args.length > 1) args.drop(1).toSeq else Seq("q1_genre_sales")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", graft.Artifacts.Root + "/spark-warehouse")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
    // A/B experiment hook: GRAFT_EXTRA_CONFS="k=v;k=v" layers candidate
    // settings over the Bench baseline so their effect is measurable in
    // isolation before they are promoted into the Bench session itself.
    sys.env.get("GRAFT_EXTRA_CONFS").foreach(_.split(';').filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val repeats = sys.env.getOrElse("GRAFT_PROFILE_RUNS", "2").toInt
    println(f"${"query"}%-34s ${"sec"}%7s ${"jobs"}%5s ${"stg"}%4s ${"task"}%5s ${"taskSec"}%8s ${"gcMs"}%6s ${"shRdMB"}%7s ${"shWrMB"}%7s ${"shRdRec"}%9s ${"inMB"}%7s ${"spillMB"}%7s ${"maxTask"}%7s")
    keys.foreach { name =>
      var last = 0.0
      // cleanup BETWEEN queries only (matching Bench): repeat 2+ runs with
      // whatever intra-query caches repeat 1 populated, which is exactly
      // the state Bench's min-of-N measures.
      (1 to repeats).foreach { i =>
        System.gc()
        acc.reset()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        val buildJobs = acc.jobs.get
        df.count()
        last = (System.nanoTime() - t0) / 1e9
        if (i == repeats) System.err.println(f"[profile] $name%-34s build=$tBuild%.3f ($buildJobs jobs) action=${last - tBuild}%.3f")
        // let straggler listener events drain before reading the counters
        Thread.sleep(200)
        if (i == repeats)
          println(f"$name%-34s $last%7.3f ${acc.jobs.get}%5d ${acc.stages.get}%4d ${acc.tasks.get}%5d ${acc.taskTimeMs.get / 1000.0}%8.2f ${acc.gcMs.get}%6d ${acc.shufReadB.get / 1e6}%7.1f ${acc.shufWriteB.get / 1e6}%7.1f ${acc.shufReadRec.get}%9d ${acc.inputB.get / 1e6}%7.1f ${acc.spillB.get / 1e6}%7.1f ${acc.maxTaskMs}%7d")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
