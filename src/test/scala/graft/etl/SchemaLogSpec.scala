package graft.etl

import graft.SparkSuite

/** The recorded table schema (r17 — Delta's schema-in-the-log shape,
  * the manifest `c` line): readers plan with ZERO parquet-footer
  * reads, additive evolution records prev ∪ delta (type conflicts now
  * fail at WRITE), pre-r17 manifests fall back to the footer-merging
  * read. The all-files-destroyed device proves the zero-footer claim:
  * an all-pruned read over a table whose EVERY data file holds garbage
  * still answers — impossible under the mergeSchema fallback, which
  * must open footers to learn the schema. */
class SchemaLogSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_schemalog").toString + "/t"

  private def manifestPath(t: String, v: Long) =
    new java.io.File(new java.io.File(t), f"manifest-$v%020d").toPath

  private def destroy(t: String, file: String): Unit =
    java.nio.file.Files.write(new java.io.File(new java.io.File(t), file).toPath,
      "not a parquet file".getBytes("UTF-8")): Unit

  private def names(s: org.apache.spark.sql.types.StructType) =
    s.fields.map(f => (f.name, f.dataType.simpleString)).toSeq

  test("bootstrap records the schema; an all-pruned read answers with EVERY data file destroyed") {
    import org.apache.spark.sql.functions.{col, year}
    val t = freshTable()
    val df = Seq((1L, "1995-01-01", "a"), (2L, "1997-01-01", "b"))
      .toDF("k", "ds", "v").selectExpr("k", "CAST(ds AS DATE) AS d", "v")
      .repartitionByRange(2, year(col("d")))
    VersionedLoad.bootstrap(spark, t, df, asOfMicros = 1000L,
      partitionSpec = Some(SnapshotStore.PartitionSpec("year", "d")))
    assert(SnapshotStore.tableSchema(spark, t).map(names).contains(
      Seq(("k", "bigint"), ("d", "date"), ("v", "string"))),
      "the c line records the table schema")
    // destroy EVERY data file: with the recorded schema, an all-pruned
    // range still plans and answers empty — no footer is ever opened
    SnapshotStore.currentFiles(spark, t).foreach(f => destroy(t, f))
    val empty = SnapshotStore.readPartitionRange(spark, t, 1800L, 1801L).get
    assert(empty.count() == 0L && empty.columns.toSeq == Seq("k", "d", "v"),
      "zero-footer planning: schema comes from the manifest, not the files")
    // and a PRUNED read that keeps one (destroyed) candidate plans fine
    // too — only execution over that file would fail, proving nothing
    // else was opened at plan time
    SnapshotStore.readPartitionRange(spark, t, 1995L, 1995L).get: Unit
  }

  test("additive evolution: a reuse commit with a new column records prev ∪ delta; old files project null") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, Seq((1L, "a")).toDF("k", "v"),
      asOfMicros = 1000L)
    val evolved = Seq((2L, "b", 9.5)).toDF("k", "v", "score")
    SnapshotStore.promote(spark, t, evolved, keep = 16, asOfMicros = Some(2000L),
      reuseFiles = SnapshotStore.currentFiles(spark, t))
    assert(SnapshotStore.tableSchema(spark, t).map(names).contains(
      Seq(("k", "bigint"), ("v", "string"), ("score", "double"))),
      "the recorded schema is the additive union")
    val head = SnapshotStore.read(spark, t).get
    assert(head.filter(col("k") === 1L).select("score").first().isNullAt(0),
      "pre-evolution files project the evolved column as null")
    assert(head.count() == 2L)
    // the OLD version still reads in its original shape
    assert(SnapshotStore.readVersion(spark, t, 0L).get.columns.toSeq == Seq("k", "v"))
  }

  test("a type change across a reuse commit throws at write; a full rewrite may retype") {
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, Seq((1L, "a")).toDF("k", "v"),
      asOfMicros = 1000L)
    intercept[IllegalArgumentException] {
      SnapshotStore.promote(spark, t, Seq((2, "b")).toDF("k", "v"), // k: int ≠ bigint
        keep = 16, reuseFiles = SnapshotStore.currentFiles(spark, t))
    }
    assert(SnapshotStore.currentVersion(spark, t).contains(0L),
      "the rejected commit left no version behind")
    // a FULL rewrite (no reuse) legitimately redefines the table
    SnapshotStore.promote(spark, t, Seq((2, "b")).toDF("k", "v"), keep = 16): Unit
    assert(SnapshotStore.tableSchema(spark, t).map(names).contains(
      Seq(("k", "int"), ("v", "string"))))
  }

  test("a manifest without a c line (pre-r17) falls back to the footer-merging read") {
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      asOfMicros = 1000L)
    // strip the c line in place (the manifest is a plain file on disk)
    val p = manifestPath(t, 0L)
    val stripped = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .split("\n").filterNot(_.startsWith("c ")).mkString("\n")
    java.nio.file.Files.write(p, stripped.getBytes("UTF-8")): Unit
    assert(SnapshotStore.tableSchema(spark, t).isEmpty)
    assert(SnapshotStore.read(spark, t).get.count() == 2L,
      "the fallback read still serves pre-r17 manifests")
    // and a reuse commit over the schemaless head records nothing (the
    // reused files' union is unknowable without footers) but still works
    VersionedLoad.refresh(spark, t, Seq((3L, "c")).toDF("k", "v"), Seq("k"),
      asOfMicros = 2000L)
    assert(SnapshotStore.tableSchema(spark, t).isEmpty,
      "reuse over a schemaless manifest degrades to absence, never guesses")
    assert(SnapshotStore.read(spark, t).get.count() == 3L)
  }

  test("a column dropped by a full rewrite disappears at head; a reuse commit keeps it for the reused files") {
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    VersionedLoad.bootstrap(spark, t, Seq((1L, "a", 5.0)).toDF("k", "v", "x"),
      asOfMicros = 1000L)
    // reuse commit whose delta LACKS x: the union keeps x (reused files
    // still carry it) — matching what the merged-footer read would show
    SnapshotStore.promote(spark, t, Seq((2L, "b")).toDF("k", "v"),
      keep = 16, reuseFiles = SnapshotStore.currentFiles(spark, t)): Unit
    val head = SnapshotStore.read(spark, t).get
    assert(head.columns.toSeq == Seq("k", "v", "x"))
    assert(head.filter(col("k") === 2L).select("x").first().isNullAt(0))
    // full rewrite without x: the column is gone
    SnapshotStore.promote(spark, t, Seq((9L, "z")).toDF("k", "v"), keep = 16): Unit
    assert(SnapshotStore.read(spark, t).get.columns.toSeq == Seq("k", "v"))
  }
}
