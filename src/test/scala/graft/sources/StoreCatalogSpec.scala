package graft.sources

import graft.SparkSuite
import graft.etl.{SnapshotStore, VersionedLoad}

/** Catalog-loaded store tables ([[StoreCatalog]]) and the BUCKET
  * storage-partitioned join: the catalog's V2 `bucket` function (bound
  * to [[SnapshotStore.bucketValue]]) lets the planner resolve the
  * scans' reported bucket KeyGroupedPartitioning, and two
  * bucket-co-partitioned store tables join with NO shuffle Exchange —
  * the gap the path-loaded route documents (no relation catalog → no
  * function resolution → unknown partitioning). */
class StoreCatalogSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_cat").toString + "/t"

  test("bucket-co-partitioned catalog tables join with NO Exchange; result matches the plain join") {
    import org.apache.spark.sql.functions.col
    val n = 4
    val ta = freshTable(); val tb = freshTable()
    def build(t: String, df: org.apache.spark.sql.DataFrame, key: String): Unit = {
      val spec = SnapshotStore.PartitionSpec(s"bucket$n", key)
      VersionedLoad.bootstrap(spark, t,
        SnapshotStore.clusterBySpecs(df, Seq(spec), n),
        asOfMicros = 1000L, partitionSpec = Some(spec)): Unit
    }
    val left  = (1L to 60L).map(k => (k, k * 10)).toDF("k", "a")
    val right = (21L to 80L).map(k => (k, k * 100)).toDF("k2", "b")
    build(ta, left, "k")
    build(tb, right, "k2")
    val confs = Seq(
      "spark.sql.catalog.graftstore" -> "graft.sources.StoreCatalog",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val l = spark.table(s"graftstore.`$ta`")
      val r = spark.table(s"graftstore.`$tb`")
      val joined = l.join(r, col("k") === col("k2"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-co-partitioned catalog scans must join without any Exchange:\n$plan")
      val got = joined.select("k", "a", "b").as[(Long, Long, Long)].collect().toSet
      val want = left.join(right, col("k") === col("k2"))
        .select("k", "a", "b").as[(Long, Long, Long)].collect().toSet
      assert(got == want && want.size == 40, "bucket routing is invisible in the result")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("the catalog's bucket function agrees with the store's recorded values; destructive DDL is guarded") {
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](4, 7L))
    assert(StoreCatalog.BucketFn.produceResult(row) ==
      SnapshotStore.bucketValue(7L, 4).toInt)
    val cat = new StoreCatalog
    cat.initialize("g", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap()))
    // DROP of anything that is not a store table is a guarded no-op
    // (r17 — the catalog became writable; see StoreWriteSpec for the
    // full DDL surface), and rename/alter stay unsupported
    assert(!cat.dropTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty, "/nope")))
    intercept[UnsupportedOperationException] {
      cat.renameTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "/a"),
        org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "/b"))
    }
  }
}
