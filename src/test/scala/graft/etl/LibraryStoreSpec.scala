package graft.etl

import graft.SparkSuite

/** The lib_q1_versioned read path in miniature (r17): a report-shaped
  * DAG — partition-pruned fact → broadcast dim join → pivot-style agg →
  * window rank — over a year-partitioned store table, with the
  * destroyed-file device proving the report itself never opens
  * out-of-window year partitions (the production property: Q1's
  * `BETWEEN &p_year_from AND &p_year_to` answered from metadata). */
class LibraryStoreSpec extends SparkSuite {
  import spark.implicits._

  test("a report DAG over readPartitionRange never opens out-of-window year partitions") {
    import org.apache.spark.sql.functions._
    val t = java.nio.file.Files.createTempDirectory("graft_libstore").toString + "/t"
    // date_key yyyymmdd fact across four years, div10000 spec = year
    val fact = Seq(
      (20050315L, 1L, 10.0), (20051103L, 2L, 20.0),
      (20100315L, 1L, 30.0), (20101103L, 2L, 40.0),
      (20150315L, 1L, 50.0), (20151103L, 2L, 60.0),
      (20240315L, 1L, 70.0), (20241103L, 2L, 80.0))
      .toDF("date_key", "book_key", "amount")
      .repartitionByRange(4, expr("date_key div 10000"))
    VersionedLoad.bootstrap(spark, t, fact, asOfMicros = 1000L,
      statsCol = Some("date_key"),
      partitionSpec = Some(SnapshotStore.PartitionSpec("div10000", "date_key")))
    // destroy BOTH out-of-window years (2005, 2024)
    val vs = manifest(t).filter(_.startsWith("v ")).map(_.split(" ", 3))
    vs.filter(a => a(1).toLong == 2005L || a(1).toLong == 2024L)
      .foreach(a => java.nio.file.Files.write(
        new java.io.File(new java.io.File(t), a(2)).toPath,
        "garbage".getBytes("UTF-8")): Unit)
    val dimBook = Seq((1L, "SciFi"), (2L, "Poetry")).toDF("book_key", "genre")
    // the report DAG over the pruned read — 2010..2015 window
    val rpt = SnapshotStore.readPartitionRange(spark, t, 2010L, 2015L).get
      .join(broadcast(dimBook), Seq("book_key"))
      .groupBy(expr("date_key div 10000").as("yr"), col("genre"))
      .agg(sum(col("amount")).as("rev"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("yr")).orderBy(col("rev").desc)))
      .filter(col("rn") === 1)
    assert(rpt.select("yr", "genre").as[(Long, String)].collect().toSet ==
      Set((2010L, "Poetry"), (2015L, "Poetry")),
      "the report answers exactly from the in-window partitions only")
  }

  private def manifest(t: String): Seq[String] =
    new String(java.nio.file.Files.readAllBytes(
      new java.io.File(new java.io.File(t), f"manifest-${0L}%020d").toPath), "UTF-8")
      .split("\n").toSeq
}
