package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: restrict the dump to these query keys (dev
    // iteration; the driver always passes exactly two args).
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the library's own session extensions (year()-predicate pushdown
      // rewrite + range-lookup planner strategy) are part of the surface
      // under test — the checked results must hold with them active
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // bucketed-table demos (io_bucketed_join) need a catalog warehouse;
      // keep it inside the repo regardless of the launch cwd
      .config("spark.sql.warehouse.dir", graft.Artifacts.Root + "/spark-warehouse")
      // match Bench: the 100-entry default generated-class cache is
      // smaller than one composed pipeline's codegen-unit count, so a
      // 240-query dump would re-janino shared subtrees continuously
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // exercise the t1 flagship path too, so a broken entry surfaces here
    try System.err.println(s"[verify] entry rows=${SparkEntry.entry(spark).count()}")
    catch { case e: Throwable => System.err.println(s"[verify] entry FAILED: ${e.getMessage}") }
    SparkEntry.queries.filter(kv => only.isEmpty || only(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // ops that cache large intermediates (shingle gram frames, graph
      // edge sets, sketch frames) never unpersist — without this the
      // 165-op dump accumulates every op's cached storage (the same
      // 4-20x memory-pressure problem Bench clears between queries);
      // the second line additionally drops localCheckpoint'd RDDs,
      // which live outside the CacheManager (see Bench)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
