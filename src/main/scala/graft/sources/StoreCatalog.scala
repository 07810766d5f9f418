package graft.sources

import java.util.{Map => JMap}

import graft.etl.SnapshotStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog plugin exposing versioned-store tables BY PATH plus the V2
  * `bucket` function the storage-partitioned-join planner resolves
  * transforms against (r17). Register once:
  *
  *   spark.conf: spark.sql.catalog.graftstore = graft.sources.StoreCatalog
  *   spark.table("graftstore.`/path/to/table`")
  *
  * Loading through the CATALOG (instead of `.format(...).load`) is
  * what lets Catalyst resolve a reported `bucket(N, col)`
  * KeyGroupedPartitioning: the rule that converts a scan's reported
  * partitioning to catalyst expressions looks the function up in the
  * RELATION's own catalog — path-loaded relations have none, so their
  * bucket reports degrade to unknown partitioning (documented on
  * [[StoreScan.outputPartitioning]]), while catalog-loaded scans of
  * two bucket-co-partitioned store tables join with NO shuffle
  * Exchange (StoreCatalogSpec pins the plan). Catalog-loaded tables
  * are always partition-grouped — that is the point of loading them
  * this way. Identity transforms need no function and work on both
  * routes. */
class StoreCatalog extends TableCatalog with FunctionCatalog {

  private var catalogName: String = "graftstore"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def loadTable(ident: Identifier): Table = {
    val dir = ident.name()
    val spark = SparkSession.active
    val schema = SnapshotStore.tableSchema(spark, dir).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident))
    new StoreTable(dir, None, grouped = true, schema)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: enumeration is not meaningful

  /** CREATE TABLE (r17 — the DDL route into the store): commits an
    * EMPTY version 0 carrying the schema (`c` line) and the declared
    * partition spec, so `df.writeTo(...).create()`, plain
    * `CREATE TABLE graftstore.\`/path\` (...) PARTITIONED BY (...)`,
    * and the INSERTs that follow all work through standard Spark
    * APIs. Transforms map onto the store's spec family —
    * identity / bucket(N) / years / months; anything else is
    * refused loudly (days/hours have no store transform). */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val dir = ident.name()
    val spark = SparkSession.active
    if (SnapshotStore.currentVersion(spark, dir).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Seq(name(), dir))
    val specs = partitions.toSeq.map(StoreCatalog.specOf)
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    SnapshotStore.promote(spark, dir, empty, partitionSpecs = specs): Unit
    new StoreTable(dir, None, grouped = true, schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft-store: ALTER TABLE is not supported — schema evolves additively at write")

  /** DROP TABLE — honest and guarded: removes the directory only when
    * it actually IS a store table (holds a manifest); anything else
    * returns false untouched, so a mistyped path can never vanish.
    * Deletion goes through the SAME Hadoop FileSystem every other
    * store operation resolves paths with — a java.io.File delete
    * would silently no-op on URI-form or non-local paths while still
    * reporting success (review r17). */
  override def dropTable(ident: Identifier): Boolean = {
    val dir = ident.name()
    val spark = SparkSession.active
    if (SnapshotStore.currentVersion(spark, dir).isEmpty) false
    else {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(p, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft-store: tables are path-addressed — rename by moving the directory")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) StoreCatalog.UnboundBucket
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
}

object StoreCatalog {

  /** A declared V2 transform as a store [[SnapshotStore.PartitionSpec]]. */
  private[sources] def specOf(t: Transform): SnapshotStore.PartitionSpec = {
    // exactly ONE referenced column: silently keeping references()(0)
    // of a multi-column transform (bucket(4, c1, c2) parses) would
    // commit a spec the user never declared (review r17)
    if (t.references().length != 1)
      throw new UnsupportedOperationException(
        s"graft-store: partition transforms take exactly one column, got $t")
    val col = t.references()(0).fieldNames().mkString(".")
    t.name().toLowerCase match {
      case "identity" => SnapshotStore.PartitionSpec("identity", col)
      case "bucket" =>
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value.toString.toInt
        }.getOrElse(throw new IllegalArgumentException(
          s"graft-store: bucket transform needs a literal bucket count: $t"))
        SnapshotStore.PartitionSpec(s"bucket$n", col)
      case "years" | "year"   => SnapshotStore.PartitionSpec("year", col)
      case "months" | "month" => SnapshotStore.PartitionSpec("month", col)
      case other => throw new UnsupportedOperationException(
        s"graft-store: unsupported partition transform $other — " +
          "use identity, bucket(N), years or months")
    }
  }

  /** The V2 `bucket(numBuckets, key)` function — BOUND semantics are
    * exactly [[SnapshotStore.bucketValue]] (Murmur3 seed 42 of the
    * long key, mod N), so the values the planner would compute agree
    * with the partition keys the manifests record and the scans
    * report. */
  object UnboundBucket extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, key): graft-store hash partition (Murmur3 seed 42 mod N)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 2)
        throw new UnsupportedOperationException(
          s"bucket takes (numBuckets int, key long), got $inputType")
      BucketFn
    }
  }

  object BucketFn extends ScalarFunction[Int] {
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): Int =
      SnapshotStore.bucketValue(input.getLong(1), input.getInt(0)).toInt
  }
}
