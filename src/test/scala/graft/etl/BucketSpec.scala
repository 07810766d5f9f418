package graft.etl

import graft.SparkSuite

/** The bucket<N> partition transform (r17 — Iceberg's bucket[N]
  * family): Murmur3-seed-42 of the key AS LONG, mod N. Pins the
  * driver/column parity ([[SnapshotStore.bucketValue]] ==
  * `functions.hash(col.cast("long"))` pmod N), point-lookup pruning
  * with the destroyed-file device, the write-path bucket-SET prune,
  * and the co-bucketed join's correctness invariant (equal keys share
  * a bucket). */
class BucketSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_bucket").toString + "/t"

  private def manifest(t: String, version: Long): Seq[String] =
    new String(java.nio.file.Files.readAllBytes(
      new java.io.File(new java.io.File(t), f"manifest-$version%020d").toPath), "UTF-8")
      .split("\n").toSeq

  private def destroy(t: String, file: String): Unit =
    java.nio.file.Files.write(new java.io.File(new java.io.File(t), file).toPath,
      "not a parquet file".getBytes("UTF-8")): Unit

  private val spec = SnapshotStore.PartitionSpec("bucket4", "k")

  private def bucketed(n: Int, df: org.apache.spark.sql.DataFrame, key: String) = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    df.repartitionByRange(n, pmod(hash(col(key).cast("long")), lit(n)))
  }

  test("driver-side bucketValue equals the column-side transform for every key") {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val keys = (-50L to 50L) ++ Seq(Long.MinValue, Long.MaxValue, 0L)
    val byCol = keys.toDF("k")
      .select(col("k"), pmod(hash(col("k").cast("long")), lit(4)).cast("long").as("b"))
      .as[(Long, Long)].collect().toMap
    keys.foreach { k =>
      assert(SnapshotStore.bucketValue(k, 4) == byCol(k),
        s"driver and column bucket disagree for key $k")
    }
  }

  test("bucket v lines record per-file buckets; a point read never opens other buckets (destroyed-file)") {
    val t = freshTable()
    val df = (1L to 40L).map(k => (k, s"v$k")).toDF("k", "v")
    VersionedLoad.bootstrap(spark, t, bucketed(4, df, "k"), asOfMicros = 1000L,
      partitionSpec = Some(spec))
    val vs = manifest(t, 0L).filter(_.startsWith("v ")).map(_.split(" ", 3))
    assert(vs.map(_(1).toLong).toSet.subsetOf((0L to 3L).toSet) && vs.nonEmpty,
      s"bucket values in [0,4) expected, got $vs")
    // point lookup: key 7's bucket; destroy every OTHER bucket's file
    val b7 = SnapshotStore.bucketValue(7L, 4)
    vs.filterNot(_(1).toLong == b7).foreach(a => destroy(t, a(2)))
    val got = SnapshotStore.readPartitionRange(spark, t, b7, b7).get
      .filter(org.apache.spark.sql.functions.col("k") === 7L)
      .select("v").as[String].collect().toSeq
    assert(got == Seq("v7"), "a point lookup opens only its key's bucket")
  }

  test("the write path prunes by the batch keys' bucket SET, not their span") {
    val t = freshTable()
    val df = (1L to 40L).map(k => (k, s"v$k")).toDF("k", "v")
    VersionedLoad.bootstrap(spark, t, bucketed(4, df, "k"), asOfMicros = 1000L,
      statsCol = Some("k"), partitionSpec = Some(spec))
    val vs = manifest(t, 0L).filter(_.startsWith("v ")).map(_.split(" ", 3))
    // one-key merge: only the key's own bucket may rewrite — k stats are
    // useless here (span 1..40 covers every file), so a prune proves the
    // bucket index worked. Destroying the other buckets' files makes
    // "never opened" observable... but merge must READ the touched file,
    // so instead assert by the manifest: other buckets' files ride along
    // as references (f lines), the touched bucket's file does not.
    val b7 = SnapshotStore.bucketValue(7L, 4)
    val f7 = vs.find(_(1).toLong == b7).get(2)
    vs.filterNot(_(1).toLong == b7).foreach(a => destroy(t, a(2)))
    val up = Seq((7L, "V7")).toDF("k", "v")
    VersionedLoad.merge(spark, t, up, Seq("k"), asOfMicros = Some(2000L))
    val m1 = manifest(t, 1L)
    assert(!m1.filter(_.startsWith("f ")).exists(_.endsWith(f7)),
      "the touched bucket's file was rewritten, not reused")
    assert(vs.filterNot(_(1).toLong == b7).forall(a =>
      m1.filter(_.startsWith("f ")).exists(_.endsWith(a(2)))),
      "untouched buckets ride along by reference — their destroyed files were never read")
  }

  test("co-bucketed union-of-joins equals the plain join") {
    import org.apache.spark.sql.functions.col
    val n = 4
    val left  = (1L to 30L).map(k => (k, k * 10)).toDF("k", "a")
    val right = (16L to 45L).map(k => (k, k * 100)).toDF("k2", "b")
    val lt = freshTable(); val rt = freshTable()
    VersionedLoad.bootstrap(spark, lt, bucketed(n, left, "k"), asOfMicros = 1000L,
      partitionSpec = Some(SnapshotStore.PartitionSpec("bucket4", "k")))
    VersionedLoad.bootstrap(spark, rt, bucketed(n, right, "k2"), asOfMicros = 1000L,
      partitionSpec = Some(SnapshotStore.PartitionSpec("bucket4", "k2")))
    val perBucket = (0 until n).map { b =>
      SnapshotStore.readPartitionRange(spark, lt, b.toLong, b.toLong).get
        .join(SnapshotStore.readPartitionRange(spark, rt, b.toLong, b.toLong).get,
          col("k") === col("k2"))
    }.reduce(_.unionByName(_)).select("k", "a", "b").as[(Long, Long, Long)].collect().toSet
    val plain = left.join(right, col("k") === col("k2"))
      .select("k", "a", "b").as[(Long, Long, Long)].collect().toSet
    assert(perBucket == plain && plain.size == 15,
      "bucket routing is invisible in the join result")
  }

  test("invalid bucket specs fail loudly before writing") {
    val t = freshTable()
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      VersionedLoad.bootstrap(spark, t, df, asOfMicros = 1000L,
        partitionSpec = Some(SnapshotStore.PartitionSpec("bucket0", "k")))
    }
    intercept[IllegalArgumentException] {
      VersionedLoad.bootstrap(spark, t,
        df.selectExpr("CAST('1995-01-01' AS DATE) AS d", "v"), asOfMicros = 1000L,
        partitionSpec = Some(SnapshotStore.PartitionSpec("bucket4", "d")))
    }
  }
}
