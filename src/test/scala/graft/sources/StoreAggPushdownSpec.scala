package graft.sources

import graft.SparkSuite
import graft.etl.{SnapshotStore, VersionedLoad}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pushed aggregates on the store DSv2 source ([[StoreScanBuilder]]
  * `SupportsPushDownAggregates`): COUNT(*) / COUNT(col) / MIN / MAX —
  * optionally grouped by identity-partition columns — answered
  * ENTIRELY from manifest `r`/`n`/`s`/`t date` lines as a driver-side
  * [[org.apache.spark.sql.connector.read.LocalScan]]. The flagship
  * device: EVERY data file destroyed, the aggregate still answers —
  * under any data-path plan that is impossible. Fallback gates are
  * proved by plan shape: anything the stats cannot answer exactly
  * keeps its Aggregate over a real scan and stays correct. */
class StoreAggPushdownSpec extends SparkSuite {
  import spark.implicits._

  private val Fmt = "graft.sources.StoreSource"

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_aggpush").toString + "/t"

  /** Overwrite every data file with garbage — a read that opens ANY of
    * them fails loudly. */
  private def destroyAllData(t: String): Unit = {
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(walk)
      else if (!f.getName.startsWith("manifest-") && !f.getName.startsWith("."))
        java.nio.file.Files.write(f.toPath,
          "not a parquet file".getBytes("UTF-8")): Unit
    new java.io.File(t).listFiles().foreach(walk)
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertPushed(df: DataFrame): Unit = {
    val p = planOf(df)
    assert(!p.contains("Aggregate"),
      s"aggregate must be answered by the source, not planned:\n$p")
    assert(p.contains("LocalTableScan"),
      s"a pushed aggregate plans as a driver-side LocalTableScan:\n$p")
  }

  private def assertNotPushed(df: DataFrame): Unit = {
    val p = planOf(df)
    assert(p.contains("Aggregate"),
      s"this aggregate must stay on the data path:\n$p")
  }

  /** 60 rows: g = k%4 (identity dim), k statted, od a date, maybe
    * nullable (k%3==0), price double (unstatted), v a string. */
  private def sample(lo: Long, hi: Long): DataFrame =
    (lo to hi).map(k => (k % 4, k, (k % 13).toInt, k, k * 1.5, s"v$k"))
      .toDF("g", "k", "dd", "mk", "price", "v")
      .select(col("g"), col("k"),
        date_add(lit(java.sql.Date.valueOf("2020-01-01")), col("dd")).as("od"),
        when(col("mk") % 3 === 0, col("mk")).as("maybe"),
        col("price"), col("v"))

  private def bootstrap(t: String, df: DataFrame): Unit =
    VersionedLoad.bootstrap(spark, t,
      SnapshotStore.clusterBySpecs(df,
        Seq(SnapshotStore.PartitionSpec("identity", "g")), 4),
      asOfMicros = 1000L,
      statsCol = Some("k"), statsCols = Seq("od", "maybe", "g"),
      partitionSpec = Some(SnapshotStore.PartitionSpec("identity", "g"))): Unit

  private def globalAgg(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      count(col("maybe")).as("n_maybe"),
      min(col("k")).as("min_k"),
      max(col("k")).as("max_k"),
      min(col("od")).as("min_od"),
      max(col("od")).as("max_od"))

  test("global aggregates answer from the manifest with EVERY data file destroyed; version pins compose") {
    val t = freshTable()
    val df0 = sample(1L, 60L)
    val df1 = sample(101L, 180L)
    bootstrap(t, df0)
    // full-rewrite second commit — two generations of files on disk
    SnapshotStore.promote(spark, t,
      SnapshotStore.clusterBySpecs(df1,
        Seq(SnapshotStore.PartitionSpec("identity", "g")), 4),
      asOfMicros = Some(2000L),
      statsCol = Some("k"), statsCols = Seq("od", "maybe", "g"),
      partitionSpec = Some(SnapshotStore.PartitionSpec("identity", "g"))): Unit
    val exp0 = globalAgg(df0).collect().toSeq
    val exp1 = globalAgg(df1).collect().toSeq
    destroyAllData(t)
    val head = globalAgg(spark.read.format(Fmt).load(t))
    assertPushed(head)
    assert(head.collect().toSeq == exp1,
      "head aggregate over destroyed files must equal the relational answer")
    val v0 = globalAgg(spark.read.format(Fmt).option("version", "0").load(t))
    assertPushed(v0)
    assert(v0.collect().toSeq == exp0,
      "version-pinned aggregate replays the OLD generation's stats")
  }

  test("grouped aggregates by an identity partition column are metadata-only; a null-bearing group column gates off") {
    val t = freshTable()
    val df = sample(1L, 60L)
    bootstrap(t, df)
    val exp = df.groupBy("g")
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("od")).as("max_od"))
      .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
    destroyAllData(t)
    val got = spark.read.format(Fmt).load(t).groupBy("g")
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("od")).as("max_od"))
    assertPushed(got)
    assert(got.collect().map(_.toSeq).sortBy(_.head.toString).toSeq == exp)

    // the null gate: g2 carries a NULL on one row, so its file's
    // recorded tuple value (min==max over NON-null rows) cannot stand
    // for every row — group-by must NOT push, and the data-path answer
    // (which includes the null group) must be exact
    val t2 = freshTable()
    val df2 = (1L to 40L).map(k => (k, k)).toDF("k", "kk")
      .select(when(col("k") =!= 7L, col("k") % 4).as("g"), col("k"))
    VersionedLoad.bootstrap(spark, t2,
      SnapshotStore.clusterBySpecs(df2,
        Seq(SnapshotStore.PartitionSpec("identity", "g")), 4),
      asOfMicros = 1000L,
      statsCol = Some("k"), statsCols = Seq("g"),
      partitionSpec = Some(SnapshotStore.PartitionSpec("identity", "g"))): Unit
    val grouped2 = spark.read.format(Fmt).load(t2).groupBy("g")
      .agg(count(lit(1)).as("n"))
    assertNotPushed(grouped2)
    assert(grouped2.collect().map(r => (Option(r.get(0)), r.getLong(1))).toMap ==
      df2.groupBy("g").agg(count(lit(1))).collect()
        .map(r => (Option(r.get(0)), r.getLong(1))).toMap)
  }

  test("fallbacks stay on the data path: filters, SUM, DISTINCT, unstatted and string columns") {
    val t = freshTable()
    val df = sample(1L, 60L)
    bootstrap(t, df)
    val r = spark.read.format(Fmt).load(t)
    // a filter keeps every aggregate off the metadata path (pruning is
    // best-effort; residual filters need rows)
    val filtered = r.filter(col("k") > 30L).agg(count(lit(1)).as("n"))
    assertNotPushed(filtered)
    assert(filtered.as[Long].head() == 30L)
    // SUM has no manifest index
    val summed = r.agg(sum(col("k")).as("s"))
    assertNotPushed(summed)
    assert(summed.as[Long].head() == (1L to 60L).sum)
    // DISTINCT cannot come from min/max/rows
    val distinctCount = r.agg(countDistinct(col("g")).as("n"))
    assertNotPushed(distinctCount)
    assert(distinctCount.as[Long].head() == 4L)
    // price is unstatted (double); v's string stats are TRUNCATED
    // prefixes — bounds, not values — so neither may push
    val dmin = r.agg(min(col("price")).as("m"))
    assertNotPushed(dmin)
    assert(dmin.as[Double].head() == 1.5)
    val smin = r.agg(min(col("v")).as("m"))
    assertNotPushed(smin)
    assert(smin.as[String].head() == df.agg(min(col("v"))).as[String].head())
  }

  test("a fully-deleted table answers count 0 / null min as one metadata row") {
    // a zero-ROW physical file carries no stats rows (the one-scan agg
    // emits no frame row for it) and honestly must-scans; a zero-FILE
    // version — the shape a full delete leaves — answers metadata-only
    val t = freshTable()
    val df = sample(1L, 60L)
    bootstrap(t, df)
    VersionedLoad.delete(spark, t, df.select("k").distinct(), Seq("k"),
      asOfMicros = Some(2000L), statsCol = Some("k"),
      statsCols = Seq("od", "maybe", "g")): Unit
    destroyAllData(t)
    val r = globalAgg(spark.read.format(Fmt).load(t))
    assertPushed(r)
    val row = r.collect() match { case Array(x) => x }
    assert(row.getLong(0) == 0L && row.isNullAt(2) && row.isNullAt(4))
  }
}
