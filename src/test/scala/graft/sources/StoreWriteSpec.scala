package graft.sources

import graft.SparkSuite
import graft.etl.{SnapshotStore, VersionedLoad}
import org.apache.spark.sql.functions._

/** The DSv2 WRITE path (r17): append / INSERT OVERWRITE through
  * Spark's V1Write bridge committing via [[SnapshotStore.promote]],
  * and the catalog DDL route (CREATE TABLE ... PARTITIONED BY, CTAS
  * via `writeTo(...).create()`, DROP TABLE). The store's commit
  * discipline must ride along: appends are incremental (head files
  * REUSED, not rewritten), carried partition specs record `v` tuples
  * for the new files, `statsCols` writes the skipping index
  * (destroyed-file proved), version travel spans API and DSv2
  * commits, and version pins refuse writes. */
class StoreWriteSpec extends SparkSuite {
  import spark.implicits._

  private val Fmt = "graft.sources.StoreSource"

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_dsv2w").toString + "/t"

  private def manifest(t: String, v: Long): Seq[String] =
    new String(java.nio.file.Files.readAllBytes(
      new java.io.File(new java.io.File(t), f"manifest-$v%020d").toPath), "UTF-8")
      .split("\n").toSeq

  private def withCatalog[A](body: => A): A = {
    spark.conf.set("spark.sql.catalog.graftstore", "graft.sources.StoreCatalog")
    try body finally spark.conf.unset("spark.sql.catalog.graftstore")
  }

  test("append reuses the head's files; overwrite rewrites; version travel spans both; pins refuse writes") {
    val t = freshTable()
    val v0files = {
      VersionedLoad.bootstrap(spark, t,
        (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v").repartition(2),
        asOfMicros = 1000L, statsCol = Some("k")): Unit
      SnapshotStore.currentFiles(spark, t)
    }
    // append: v1 = v0 files REUSED + the delta's own files
    (21L to 30L).map(k => (k, s"v$k")).toDF("k", "v")
      .write.format(Fmt).option("statsCol", "k").mode("append").save(t)
    assert(SnapshotStore.currentVersion(spark, t).contains(1L))
    val m1 = manifest(t, 1L)
    assert(v0files.forall(f => m1.contains(s"f $f")),
      "an append must REUSE the head's files, not rewrite them")
    assert(spark.read.format(Fmt).load(t).count() == 30L)
    // the appended files carry stats: destroy v0's files, a pruned
    // low-range read over the append's keys still answers... and vice
    // versa — here prove the APPEND's stats exist in the manifest
    assert(m1.exists(l => l.startsWith("s k ") && !v0files.exists(l.endsWith)),
      "statsCol on the DSv2 append must stat the new files")
    // overwrite: v2 is a full rewrite; v1/v0 still travel
    (101L to 110L).map(k => (k, s"v$k")).toDF("k", "v")
      .write.format(Fmt).mode("overwrite").save(t)
    assert(spark.read.format(Fmt).load(t).agg(sum($"k")).as[Long].head() ==
      (101L to 110L).sum)
    assert(spark.read.format(Fmt).option("version", "1").load(t).count() == 30L)
    assert(spark.read.format(Fmt).option("version", "0").load(t).count() == 20L)
    // a version pin refuses writes
    val err = intercept[Exception] {
      (1L to 3L).map(k => (k, "x")).toDF("k", "v")
        .write.format(Fmt).option("version", "0").mode("append").save(t)
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(_.contains("version pin")))
  }

  test("catalog DDL: CREATE TABLE PARTITIONED BY, INSERT INTO records v tuples, INSERT OVERWRITE, DROP TABLE") {
    withCatalog {
      val t = freshTable()
      spark.sql(s"CREATE TABLE graftstore.`$t` (g BIGINT, k BIGINT) PARTITIONED BY (g)")
      assert(SnapshotStore.currentVersion(spark, t).contains(0L))
      assert(SnapshotStore.partitionSpecsOf(spark, t, None) ==
        Seq(SnapshotStore.PartitionSpec("identity", "g")))
      // INSERT INTO: the carried spec must record concrete v tuples —
      // one single-valued insert per g (hash repartitioning may fold
      // distinct values into one multi-valued `?` file otherwise)
      spark.sql(s"INSERT INTO graftstore.`$t` SELECT 0L AS g, id AS k FROM range(1, 11)")
      spark.sql(s"INSERT INTO graftstore.`$t` SELECT 1L AS g, id + 10 AS k FROM range(1, 11)")
      assert(spark.table(s"graftstore.`$t`").count() == 20L)
      assert(manifest(t, 1L).exists(_.startsWith("v 0 ")),
        "appended files under a declared identity spec must record partition values")
      // INSERT OVERWRITE truncates
      spark.sql(s"INSERT OVERWRITE graftstore.`$t` VALUES (9L, 900L), (9L, 901L)")
      assert(spark.table(s"graftstore.`$t`").agg(sum($"k")).as[Long].head() == 1801L)
      assert(spark.read.format(Fmt).option("version", "2").load(t).count() == 20L,
        "the overwritten version must still travel")
      // DROP TABLE removes a real store table; a non-table path is untouched
      spark.sql(s"DROP TABLE graftstore.`$t`")
      assert(!new java.io.File(t).exists())
      val plain = java.nio.file.Files.createTempDirectory("graft_nottable").toString
      assert(!new StoreCatalog().dropTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, plain)))
      assert(new java.io.File(plain).exists(),
        "a directory that is not a store table must never be dropped")
    }
  }

  test("CTAS via writeTo(...).partitionedBy(bucket).create(); appends keep the spec; metadata aggregates compose") {
    withCatalog {
      val t = freshTable()
      (1L to 40L).map(k => (k % 8, k)).toDF("g", "x")
        .writeTo(s"graftstore.`$t`")
        .partitionedBy(org.apache.spark.sql.functions.bucket(4, $"g"))
        .option("statsCol", "x")
        .create()
      assert(SnapshotStore.partitionSpecsOf(spark, t, None) ==
        Seq(SnapshotStore.PartitionSpec("bucket4", "g")))
      assert(spark.table(s"graftstore.`$t`").count() == 40L)
      // a later append carries the spec without re-declaring it
      (41L to 50L).map(k => (k % 8, k)).toDF("g", "x")
        .writeTo(s"graftstore.`$t`").option("statsCol", "x").append()
      assert(SnapshotStore.partitionSpecsOf(spark, t, None) ==
        Seq(SnapshotStore.PartitionSpec("bucket4", "g")))
      // every commit statted x → the metadata-only aggregate composes
      // with the DSv2 WRITE route end to end
      val agg = spark.table(s"graftstore.`$t`")
        .agg(count(lit(1)).as("n"), min($"x").as("mn"), max($"x").as("mx"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Aggregate") && p.contains("LocalTableScan"),
        s"count/min/max over the written table must answer from the manifest:\n$p")
      assert(agg.as[(Long, Long, Long)].head() == ((50L, 1L, 50L)))
    }
  }
}
