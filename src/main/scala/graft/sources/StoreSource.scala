package graft.sources

import java.util.{Map => JMap}

import graft.etl.SnapshotStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The versioned store as a FIRST-CLASS Spark DataSource v2 (r17):
  * `spark.read.format("graft.sources.StoreSource").load(tableDir)`
  * plans over the manifest alone — schema from the recorded `c` line
  * (zero footer reads at plan time), FILE PRUNING from pushed filters
  * against the manifest's per-file stats / partition values / null
  * counts, column pruning pushed into the parquet reader, and — when
  * the caller opts into partition-grouped tasks — a reported
  * [[KeyGroupedPartitioning]] that lets Catalyst plan a STORAGE-
  * PARTITIONED JOIN between two co-partitioned store tables with NO
  * shuffle Exchange (`spark.sql.sources.v2.bucketing.enabled=true`;
  * StoreSourceSpec asserts the Exchange-free plan).
  *
  * This is the preference-order answer the hand-called readers
  * ([[SnapshotStore.readKeyRange]] ff.) cannot give: inside the
  * planner, the pruning composes with everything Catalyst does —
  * `df.filter(...)` reaches the source as pushed filters, EXPLAIN
  * shows the decision, and joins see the layout.
  *
  * Options: `path` (table root), `version` (pin a committed version),
  * `partitionGrouped` (= "true": one task per partition-value tuple,
  * required for the storage-partitioned join; default one task per
  * file — better parallelism for plain scans).
  *
  * Scope (documented, enforced loudly): the table must carry a
  * recorded `c` schema (any r17+ commit does); files missing an
  * additively-evolved column project it as null. The executor-side
  * reader is Spark's own vectorized parquet reader driven per file;
  * its simple-path initializer builds a fresh local Hadoop config, so
  * this source targets filesystems reachable with default config
  * (local/HDFS-default) — the store's own contract. Partitioning is
  * REPORTED only when every dimension is `identity` (resolvable
  * without a function catalog) or `bucket<N>` and every file carries a
  * concrete tuple; anything else degrades to unknown partitioning,
  * never a wrong one. */
class StoreSource extends TableProvider
    with sources.CreatableRelationProvider {

  override def supportsExternalMetadata(): Boolean = false

  /** `df.write.format(...).mode(...).save(dir)` — Spark routes a
    * TableProvider without BATCH_WRITE through the V1 write command,
    * which needs this interface (the JDBC pattern). Append reuses the
    * head's files, Overwrite rewrites, ErrorIfExists/Ignore honor the
    * table's existence; the commit itself is the same
    * [[StoreWrites.commit]] the catalog DML route uses. NEW tables
    * cannot start here (the read-side schema inference needs a
    * manifest) — create through the catalog
    * (`writeTo(...).create()` / CREATE TABLE) or bootstrap. */
  override def createRelation(sqlContext: org.apache.spark.sql.SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): sources.BaseRelation = {
    val dir = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-store: .save(<table dir>) is required"))
    parameters.get("version").foreach(v => throw new IllegalArgumentException(
      s"graft-store: cannot write to version pin $v of $dir — versions are immutable"))
    val spark = data.sparkSession
    val exists = SnapshotStore.currentVersion(spark, dir).isDefined
    import org.apache.spark.sql.SaveMode._
    mode match {
      case ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graft-store: $dir already exists (SaveMode.ErrorIfExists)")
      case Ignore if exists => ()
      case m => StoreWrites.commit(spark, dir, data,
        overwrite = m == Overwrite, opt = parameters.get)
    }
    val out = sqlContext
    new sources.BaseRelation {
      override def sqlContext: org.apache.spark.sql.SQLContext = out
      override def schema: StructType = data.schema
    }
  }

  private def dirOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).filter(_.nonEmpty)
    p.getOrElse(throw new IllegalArgumentException(
      "graft-store: .load(<table dir>) is required"))
  }

  private def versionOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("version")).map(_.toLong)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val dir = dirOf(options)
    SnapshotStore.tableSchema(spark, dir, versionOf(options)).getOrElse(
      throw new IllegalStateException(
        s"graft-store: $dir carries no recorded schema (`c` manifest line) — " +
          "commit once with an r17+ writer, or read through SnapshotStore.read"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val ci = new CaseInsensitiveStringMap(properties)
    new StoreTable(dirOf(ci), versionOf(ci),
      Option(ci.get("partitionGrouped")).exists(_.equalsIgnoreCase("true")),
      schema)
  }
}

private[sources] class StoreTable(dir: String, version: Option[Long],
    grouped: Boolean, tableSchema: StructType) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"graft-store:$dir" + version.fold("")(v => s"@v$v")
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  /** Writes ride Spark's V1Write bridge (the JDBC-v2 pattern): the
    * planned input lands as a DataFrame on the DRIVER-side insert,
    * which commits through [[SnapshotStore.promote]] — append reuses
    * the head's files (incremental add), truncate/overwrite rewrites.
    * The store's whole commit discipline comes for free: carried
    * partition specs compute `v` tuples for the new files, carried
    * stats survive on reused files, own-file stats via the
    * `statsCol`/`statsCols` write options, GC via `keep`. Writing to
    * a version PIN is refused — the past is immutable. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    version.foreach(v => throw new IllegalArgumentException(
      s"graft-store: cannot write to version pin $v of $dir — versions are immutable"))
    new StoreWriteBuilder(dir, info)
  }

  override def partitioning(): Array[Transform] = {
    val spark = SparkSession.active
    val specs = SnapshotStore.partitionSpecsOf(spark, dir, version)
    val mapped = specs.map { ps =>
      ps.transform match {
        case "identity" => Some(Expressions.identity(ps.col))
        case t => SnapshotStore.bucketN(t).map(n => Expressions.bucket(n, ps.col))
        // year/month/div: real transforms, but unexpressible here
        // without a function catalog
      }
    }
    // ALL-OR-NOTHING like StoreScan.outputPartitioning: dropping only
    // the unexpressible dimensions would CLAIM a coarser layout the
    // files do not have — a mixed-spec table reports no partitioning
    // rather than a wrong one (review r17)
    if (mapped.forall(_.isDefined)) mapped.flatten.toArray else Array.empty
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StoreScanBuilder(dir, version, grouped ||
      Option(options.get("partitionGrouped")).exists(_.equalsIgnoreCase("true")),
      tableSchema)
}

/** The write side of the connector. Append (the default) promotes the
  * batch WITH the head's files reused — O(delta) like every
  * incremental store commit; truncate (INSERT OVERWRITE /
  * mode("overwrite")) promotes a full rewrite. Options: `statsCol` /
  * `statsCols` (comma-separated) stat the new files, `asOfMicros`
  * pins the commit's business instant, `keep` the GC retention.
  * Concurrency: the exclusive manifest claim arbitrates as always;
  * exactly-once / OCC writes stay on the SnapshotStore API where
  * txn markers and expectCurrent live. */
private[sources] class StoreWriteBuilder(dir: String,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  private var overwrite = false

  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    overwrite = true; this
  }

  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.V1Write {
      override def toInsertableRelation: sources.InsertableRelation =
        new sources.InsertableRelation {
          override def insert(data: org.apache.spark.sql.DataFrame,
              ignored: Boolean): Unit =
            StoreWrites.commit(data.sparkSession, dir, data,
              overwrite = overwrite,
              opt = k => Option(info.options.get(k)))
        }
    }
}

/** The ONE commit both write routes (catalog DML via V1Write,
  * `format(...).save` via CreatableRelationProvider) share — a
  * drifting copy would give the two routes different semantics.
  *
  * Appends are OCC: the head (version, files) comes from ONE manifest
  * resolution and the promote carries `expectCurrent` on it, so two
  * concurrent appends cannot both land on the same base — the loser
  * fails with ConflictException and retries, instead of silently
  * dropping the winner's files from the new head (the lost-update
  * Delta surfaces as ConcurrentAppendException; review r17).
  * Overwrites replace everything BY INTENT and stay non-OCC. */
private[sources] object StoreWrites {
  def commit(spark: SparkSession, dir: String,
      data: org.apache.spark.sql.DataFrame, overwrite: Boolean,
      opt: String => Option[String]): Unit = {
    val statsCol = opt("statsCol").map(_.trim).filter(_.nonEmpty)
    val statsCols = opt("statsCols").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val asOf = opt("asOfMicros").map(_.toLong)
    val keep = opt("keep").map(_.toInt).getOrElse(16)
    val (expect, reuse) =
      if (overwrite) (None, Nil)
      else SnapshotStore.headState(spark, dir) match {
        case Some((v, files)) => (Some(v), files)
        case None             => (Some(SnapshotStore.NoVersion), Nil)
      }
    SnapshotStore.promote(spark, dir, data, keep = keep,
      asOfMicros = asOf, reuseFiles = reuse, expectCurrent = expect,
      statsCol = statsCol, statsCols = statsCols): Unit
  }
}

/** Driver-side planning: collects pushed filters, prunes the manifest's
  * file list by every index it carries (per-column long stats,
  * partition-value tuples through the monotone/bucket transforms, null
  * counts), and prunes columns. All filters stay RESIDUAL (Spark
  * re-applies them on the scan output) — the indexes only cut IO,
  * never correctness, the store's standing contract. */
private[sources] class StoreScanBuilder(dir: String, version: Option[Long],
    grouped: Boolean, tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var required: StructType = tableSchema
  private var pushed: Array[sources.Filter] = Array.empty
  private var aggAnswer: Option[(StructType, Array[InternalRow])] = None
  private var limit: Option[Int] = None

  /** LIMIT n truncates the PLANNED file list once the manifest's known
    * row counts reach n — `df.limit(100)` over a 10k-file table plans
    * one file, not 10k tasks. Sound only on a filterless scan (any
    * residual filter could reject every row the kept files hold — and
    * Spark's rule only offers the limit then; re-checked as defense)
    * and only for per-file tasks (partition-grouped scans report a
    * layout whose per-tuple file sets must stay whole). Files without
    * a recorded count are kept and bound nothing. Spark re-applies
    * the exact limit on top (isPartiallyPushed). */
  override def pushLimit(n: Int): Boolean = {
    if (pushed.nonEmpty || grouped) false
    else { limit = Some(n); true }
  }

  override def isPartiallyPushed(): Boolean = true

  /** ONE manifest resolution serves the whole builder — aggregate
    * probing, file pruning, and the final build all read the SAME
    * resolved version (separate accessor calls could pair one
    * version's file list with a concurrently-committed version's
    * specs; review r17). */
  private lazy val metaOpt: Option[SnapshotStore.TableMeta] =
    SnapshotStore.tableMeta(SparkSession.active, dir, version)

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the table's field order — the reader builds rows in
    // readSchema order, and an empty projection (count(*)) keeps one
    // narrowest column to drive row counts
    required = {
      val want = requiredSchema.fieldNames.toSet
      val kept = StructType(tableSchema.fields.filter(f => want.contains(f.name)))
      if (kept.fields.nonEmpty) kept
      else StructType(tableSchema.fields.sortBy(_.dataType.defaultSize).take(1))
    }

  private def integral(c: String): Boolean =
    tableSchema.fields.find(_.name == c).map(_.dataType).exists {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  private def dateCol(c: String): Boolean =
    tableSchema.fields.find(_.name == c)
      .exists(_.dataType == org.apache.spark.sql.types.DateType)

  /** A comparison value as epoch days, for DATE-column pushdown (v1
    * filters carry java.sql.Date, or java.time.LocalDate under the
    * java8 datetime API). */
  private def epochDay(v: Any): Option[Long] = v match {
    case d: java.sql.Date        => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate  => Some(d.toEpochDay)
    case _                       => None
  }

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    // a filter is "pushed" when some manifest index can act on it; it
    // is ALWAYS also returned as residual (the parquet-source pattern:
    // best-effort pushdown, exact re-application on top)
    // integral columns admit only WHOLE-number literals: a fractional
    // bound truncated via longValue would shift GreaterThan/LessThan's
    // ±1 adjustment across a real value and prune files holding
    // matching rows (review r17) — rejecting it keeps the filter
    // residual-only, which is always sound
    def cmpValue(c: String, v: Any): Boolean = v match {
      case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
           _: java.lang.Long => integral(c)
      case other => dateCol(c) && epochDay(other).isDefined
    }
    pushed = filters.filter {
      case sources.EqualTo(c, v) => cmpValue(c, v)
      case sources.GreaterThan(c, v) => cmpValue(c, v)
      case sources.GreaterThanOrEqual(c, v) => cmpValue(c, v)
      case sources.LessThan(c, v) => cmpValue(c, v)
      case sources.LessThanOrEqual(c, v) => cmpValue(c, v)
      case sources.In(c, vs) => vs.nonEmpty && vs.forall(cmpValue(c, _))
      case sources.IsNull(_) | sources.IsNotNull(_) => true
      case _ => false
    }
    filters
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  /** Metadata-only aggregates (r17): COUNT(*) / COUNT(col) /
    * MIN(col) / MAX(col) — optionally grouped by identity-partition
    * LONG columns — answered ENTIRELY from the manifest's `r` (row
    * count), `n` (null count), `s` (long min/max) and `t date`
    * (epoch-day min/max) lines, the Delta/Iceberg metadata-aggregate
    * move: a COUNT(*) over 100 TB becomes one manifest read and ZERO
    * tasks. Soundness gates, each degrading to the normal scan (never
    * a wrong answer):
    *
    *  - Spark offers aggregate pushdown only when NO post-scan filter
    *    remains; this source keeps every filter residual, so only
    *    filterless queries arrive (`pushed.isEmpty` re-checked as
    *    defense).
    *  - COUNT(*) needs a recorded row count for EVERY file; COUNT(col)
    *    additionally the col's null count (rows − nulls is exact —
    *    count(col) is null-skipping exactly like the stats scan that
    *    wrote the lines). DISTINCT never pushes.
    *  - MIN/MAX need the col statted on every file holding rows:
    *    integral via the `s` index, DATE via the exact `t date` index.
    *    String stats are PREFIX-TRUNCATED bounds, not values — never
    *    pushed. min/max-of-per-file-min/max is exact because the file
    *    stats are null-skipping like SQL MIN/MAX.
    *  - GROUP BY cols must each be an `identity` spec dimension over a
    *    LONG column where every file carries a concrete tuple value
    *    AND a recorded null count of 0 — the recorded value is
    *    min==max over NON-NULL rows, so without the null gate a file
    *    could smuggle null-group rows into its tuple's counts. Groups
    *    come from files; a group whose files hold 0 rows is not
    *    emitted (relationally it does not exist). */
  // Spark calls supportCompletePushDown then pushAggregation with the
  // SAME Aggregation instance; memoizing on identity avoids building
  // the full answer (stat maps, groups, result rows) twice per query
  // (review r17). A different instance just recomputes — still correct.
  private var memoAgg: Aggregation = _
  private var memoAnswer: Option[(StructType, Array[InternalRow])] = None

  private def answerMemo(agg: Aggregation): Option[(StructType, Array[InternalRow])] = {
    if (!(agg eq memoAgg)) { memoAgg = agg; memoAnswer = answerFromStats(agg) }
    memoAnswer
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    answerMemo(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    // complete-or-nothing: answerMemo is the SAME test
    // supportCompletePushDown ran, so a partial-rewrite retry (which
    // would need merge semantics we don't implement) can never be
    // accepted here
    aggAnswer = answerMemo(agg)
    aggAnswer.isDefined
  }

  private def answerFromStats(agg: Aggregation): Option[(StructType, Array[InternalRow])] = {
    import org.apache.spark.sql.types._
    if (pushed.nonEmpty) return None
    val meta = metaOpt.getOrElse(return None)
    val files = meta.files
    val rowsOf = meta.rowCounts
    // every aggregate below needs to classify files as row-bearing or
    // empty; an unrecorded count is unknowable — bail
    if (!files.forall(rowsOf.contains)) return None
    val live = files.filter(f => rowsOf(f) > 0L)
    def fieldOf(c: String) = tableSchema.fields.find(_.name == c)
    def nameOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames()(0))
        case _ => None
      }
    // ── group dimensions
    val specIdx: Map[String, Int] = meta.specs.zipWithIndex.collect {
      case (ps, d) if ps.transform == "identity" => ps.col -> d
    }.toMap
    val byFile = meta.partVals.map(pv => pv.file -> pv.values).toMap
    val groupCols: Seq[String] =
      agg.groupByExpressions.toSeq.map(e => nameOf(e).getOrElse(return None))
    val groupDims: Seq[Int] = groupCols.map { c =>
      if (!fieldOf(c).exists(_.dataType == LongType)) return None
      val d = specIdx.getOrElse(c, return None)
      val nulls = meta.nullStats.filter(_.col == c).map(st => st.file -> st.nulls).toMap
      val ok = live.forall(f =>
        byFile.get(f).exists(_.lift(d).exists(_.isDefined)) && nulls.get(f).contains(0L))
      if (!ok) return None
      d
    }
    val groups: Seq[(Seq[Long], Seq[String])] =
      if (groupDims.isEmpty) Seq((Nil, live))
      else live.groupBy(f => groupDims.map(d => byFile(f)(d).get))
        .toSeq.sortBy(_._1.mkString(","))
    // ── one evaluator per aggregate: group's files → exact value
    type Eval = Seq[String] => Option[Any]
    def minMax(colRef: org.apache.spark.sql.connector.expressions.Expression,
        wantMin: Boolean): Option[(StructField, Eval)] =
      nameOf(colRef).flatMap(c => fieldOf(c)).flatMap { f =>
        def pick(vals: Seq[Long]): Long = if (wantMin) vals.min else vals.max
        f.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            val st = meta.stats.filter(_.col == f.name)
              .map(s => s.file -> (if (wantMin) s.min else s.max)).toMap
            Some((StructField(s"${if (wantMin) "min" else "max"}(${f.name})", f.dataType),
              (fs: Seq[String]) =>
                if (!fs.forall(st.contains)) None
                else Some(if (fs.isEmpty) null else {
                  val v = pick(fs.map(st))
                  f.dataType match {
                    case ByteType    => Byte.box(v.toByte)
                    case ShortType   => Short.box(v.toShort)
                    case IntegerType => Int.box(v.toInt)
                    case _           => Long.box(v)
                  }
                })))
          case DateType =>
            val st = meta.typedStats.filter(s => s.col == f.name && s.kind == "date")
              .flatMap(s => scala.util.Try(
                s.file -> (if (wantMin) s.lo.toLong else s.hi.toLong)).toOption).toMap
            Some((StructField(s"${if (wantMin) "min" else "max"}(${f.name})", DateType),
              (fs: Seq[String]) =>
                if (!fs.forall(st.contains)) None
                else Some(if (fs.isEmpty) null else Int.box(pick(fs.map(st)).toInt))))
          case _ => None // doubles unstatted; string stats are truncated prefixes
        }
      }
    val evals: Seq[(StructField, Eval)] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        (StructField("count(*)", LongType, nullable = false),
          (fs: Seq[String]) => Some(Long.box(fs.map(rowsOf).sum)): Option[Any])
      case c: Count if !c.isDistinct => c.column match {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] if l.value != null =>
          // count(1) — the CountStar shape the DataFrame API emits
          (StructField("count(1)", LongType, nullable = false),
            (fs: Seq[String]) => Some(Long.box(fs.map(rowsOf).sum)): Option[Any])
        case ref =>
          val name = nameOf(ref).getOrElse(return None)
          val nulls = meta.nullStats.filter(_.col == name)
            .map(st => st.file -> st.nulls).toMap
          (StructField(s"count($name)", LongType, nullable = false),
            (fs: Seq[String]) =>
              if (!fs.forall(nulls.contains)) None
              else Some(Long.box(fs.map(f => rowsOf(f) - nulls(f)).sum)))
      }
      case m: Min => minMax(m.column, wantMin = true).getOrElse(return None)
      case m: Max => minMax(m.column, wantMin = false).getOrElse(return None)
      case _ => return None
    }
    // evaluate every group up front — ANY gap anywhere degrades the
    // WHOLE query to the normal scan (a per-group fallback would need
    // merge semantics complete pushdown forbids)
    val rows: Array[InternalRow] = groups.map { case (key, fs) =>
      val vals = evals.map { case (_, ev) => ev(fs).getOrElse(return None) }
      new GenericInternalRow((key.map(Long.box(_): Any) ++ vals).toArray): InternalRow
    }.toArray
    val schema = StructType(
      groupCols.map(c => StructField(c, LongType)) ++ evals.map(_._1))
    Some((schema, rows))
  }

  override def build(): Scan = {
    val meta = metaOpt.getOrElse(
      throw new IllegalStateException(version.fold(
        s"graft-store: $dir has no committed version")(v =>
        s"graft-store: version $v of $dir is not committed/retained")))
    aggAnswer.foreach { case (schema, rows) =>
      return new StoreAggScan(dir, schema, rows)
    }
    val files = meta.files
    // per-column conjunctive ranges from the pushed comparisons — one
    // numeric domain per column: raw longs for integral columns, EPOCH
    // DAYS for date columns (matching the `t date` stat encoding)
    val ranges = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def tighten(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = ranges.getOrElse(c, (Long.MinValue, Long.MaxValue))
      ranges(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    def numValue(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue)
      case other => other match {
        case d: java.sql.Date       => Some(d.toLocalDate.toEpochDay)
        case d: java.time.LocalDate => Some(d.toEpochDay)
        case _                      => None
      }
    }
    var nullPreds = List.empty[(String, Boolean)] // (col, isNull)
    pushed.foreach {
      case sources.EqualTo(c, v) => numValue(v).foreach(l => tighten(c, l, l))
      case sources.GreaterThan(c, v) => numValue(v).foreach(l =>
        tighten(c, if (l == Long.MaxValue) l else l + 1, Long.MaxValue))
      case sources.GreaterThanOrEqual(c, v) => numValue(v).foreach(tighten(c, _, Long.MaxValue))
      case sources.LessThan(c, v) => numValue(v).foreach(l =>
        tighten(c, Long.MinValue, if (l == Long.MinValue) l else l - 1))
      case sources.LessThanOrEqual(c, v) => numValue(v).foreach(tighten(c, Long.MinValue, _))
      case sources.In(c, vs) =>
        val ls = vs.flatMap(numValue(_).toSeq)
        if (ls.nonEmpty) tighten(c, ls.min, ls.max)
      case sources.IsNull(c) => nullPreds ::= (c, true)
      case sources.IsNotNull(c) => nullPreds ::= (c, false)
      case _ => ()
    }
    val fileSet = files.toSet
    var keep: Set[String] = fileSet
    def isDate(c: String): Boolean =
      tableSchema.fields.find(_.name == c)
        .exists(_.dataType == org.apache.spark.sql.types.DateType)
    // per-column stats: integral columns via the `s` long index, date
    // columns via the `t date` epoch-day index (unstatted files keep —
    // absence = must-scan)
    val stats = meta.stats.filter(st => fileSet.contains(st.file))
    val typedStats = meta.typedStats.filter(st => fileSet.contains(st.file))
    ranges.foreach { case (c, (lo, hi)) =>
      val cs: Seq[(String, Long, Long)] =
        if (isDate(c))
          typedStats.filter(st => st.col == c && st.kind == "date")
            .flatMap(st => scala.util.Try((st.file, st.lo.toLong, st.hi.toLong)).toOption)
        else stats.filter(_.col == c).map(st => (st.file, st.min, st.max))
      if (cs.nonEmpty) {
        val statted = cs.map(_._1).toSet
        keep = keep.intersect(
          (files.filterNot(statted) ++
            cs.filter { case (_, mn, mx) => mx >= lo && mn <= hi }.map(_._1)).toSet)
      }
    }
    // partition-value tuples through the transforms (identity/div by
    // range; bucket by the EqualTo/In value set — a hash has no range)
    val specs = meta.specs
    val partVals = meta.partVals.filter(pv => fileSet.contains(pv.file))
    def dimKeep(d: Int, pred: Long => Boolean): Set[String] = {
      val judged = partVals.filter(_.values.lift(d).exists(_.isDefined))
      val valued = judged.map(_.file).toSet
      (files.filterNot(valued) ++
        judged.filter(_.values(d).exists(pred)).map(_.file)).toSet
    }
    specs.zipWithIndex.foreach { case (ps, d) =>
      ranges.get(ps.col).foreach { case (lo, hi) =>
        SnapshotStore.divWidth(ps.transform) match {
          case Some(w) =>
            keep = keep.intersect(dimKeep(d,
              v => v >= Math.floorDiv(lo, w) && v <= Math.floorDiv(hi, w)))
          case None if ps.transform == "identity" =>
            keep = keep.intersect(dimKeep(d, v => v >= lo && v <= hi))
          case None if (ps.transform == "year" || ps.transform == "month") && isDate(ps.col) =>
            // the date range (epoch days) maps through the monotone
            // calendar transform; beyond ±1e6 days (≈ ±2700 CE span)
            // a bound degrades to unconstrained — sound, never narrow
            def tx(day: Long): Long = {
              val dte = java.time.LocalDate.ofEpochDay(day)
              if (ps.transform == "year") dte.getYear.toLong
              else dte.getYear.toLong * 100 + dte.getMonthValue
            }
            val tLo = if (lo < -1000000L) Long.MinValue else tx(lo)
            val tHi = if (hi > 1000000L) Long.MaxValue else tx(hi)
            keep = keep.intersect(dimKeep(d, v => v >= tLo && v <= tHi))
          case None => SnapshotStore.bucketN(ps.transform).foreach { n =>
            // only a point/set probe maps through a hash
            val pts = pushed.collect {
              case sources.EqualTo(c, v: Number) if c == ps.col => Seq(v.longValue)
              case sources.In(c, vs) if c == ps.col =>
                vs.collect { case x: Number => x.longValue }.toSeq
            }.flatten
            if (pts.nonEmpty) {
              val bs = pts.map(SnapshotStore.bucketValue(_, n)).toSet
              keep = keep.intersect(dimKeep(d, bs.contains))
            }
          }
        }
      }
    }
    // null counts (IS NULL: nulls=0 prunes; IS NOT NULL: nulls=rows)
    val nullStats = meta.nullStats
    val rowCounts = meta.rowCounts
    nullPreds.foreach { case (c, isNull) =>
      val byFile = nullStats.filter(_.col == c).map(st => st.file -> st.nulls).toMap
      keep = keep.intersect(files.filter { f =>
        byFile.get(f) match {
          case None => true
          case Some(n) => if (isNull) n > 0L else rowCounts.get(f).forall(_ != n)
        }
      }.toSet)
    }
    val keptFiles = files.filter(keep).sorted
    val limited = limit match {
      case Some(n) if pushed.isEmpty && !grouped =>
        val rc = meta.rowCounts
        var acc = 0L
        val b = Seq.newBuilder[String]
        val it = keptFiles.iterator
        while (it.hasNext && acc < n) {
          val f = it.next(); b += f; acc += rc.getOrElse(f, 0L)
        }
        b.result()
      case _ => keptFiles
    }
    new StoreScan(dir, limited, required, tableSchema, specs, partVals, grouped)
  }
}

/** A pushed-aggregate result: the answer was computed on the DRIVER
  * from manifest lines alone, so the scan is a [[LocalScan]] — Spark
  * plans it as a LocalTableScanExec with ZERO tasks and ZERO data
  * files opened (StoreAggPushdownSpec proves it with every data file
  * destroyed). */
private[sources] class StoreAggScan(dir: String, schema: StructType,
    resultRows: Array[InternalRow]) extends Scan with LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = resultRows
  override def description(): String =
    s"graft-store $dir metadata-only aggregate (${resultRows.length} rows from manifest stats)"
}

/** One task per file (default) or per concrete partition tuple
  * (`partitionGrouped` — each task owns one tuple's files and reports
  * it as the partition key, the storage-partitioned-join shape). */
private[sources] class StoreScan(dir: String, files: Seq[String],
    readSchemaV: StructType, tableSchema: StructType,
    specs: Seq[SnapshotStore.PartitionSpec],
    partVals: Seq[SnapshotStore.FilePartition], grouped: Boolean)
    extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = readSchemaV
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-store $dir (${files.size} files after pruning)"

  /** (tuple → its files), defined only when EVERY kept file carries a
    * fully-concrete value tuple — the precondition for partition-
    * grouped tasks and for reporting the layout to Catalyst. */
  private lazy val tuples: Option[Seq[(Seq[Long], Seq[String])]] = {
    val byFile = partVals.map(pv => pv.file -> pv.values).toMap
    val concrete = specs.nonEmpty && files.forall(f =>
      byFile.get(f).exists(vs => vs.size == specs.size && vs.forall(_.isDefined)))
    if (!concrete) None
    else Some(files.map(f => (byFile(f).map(_.get), f))
      .groupBy(_._1).toSeq.map { case (k, fs) => (k, fs.map(_._2).sorted) }
      .sortBy(_._1.mkString(",")))
  }

  override def planInputPartitions(): Array[InputPartition] =
    if (grouped && tuples.isDefined)
      tuples.get.map { case (key, fs) =>
        // per-dimension key value types match the reported transform's
        // result type: identity → long (the column), bucket → int (the
        // V2 bucket function's resultType) — a mismatched partition-key
        // row type would break the planner's value comparisons
        val typed: Seq[Any] = key.zip(specs).map { case (v, ps) =>
          if (SnapshotStore.bucketN(ps.transform).isDefined) Int.box(v.toInt)
          else Long.box(v)
        }
        StoreKeyedPartition(fs.map(f => new Path(dir, f).toString), typed)
          : InputPartition
      }.toArray
    else files.map(f =>
      StoreFilePartition(Seq(new Path(dir, f).toString)): InputPartition).toArray

  /** Reported only for dimensions Catalyst can resolve WITHOUT a
    * function catalog (identity over a LONG column — the partition key
    * rows carry longs) plus bucket<N>; year/month/div degrade to
    * unknown partitioning, never a wrong report. */
  override def outputPartitioning(): Partitioning = {
    def reportable(ps: SnapshotStore.PartitionSpec): Boolean =
      (ps.transform == "identity" &&
        tableSchema.fields.find(_.name == ps.col)
          .exists(_.dataType == org.apache.spark.sql.types.LongType)) ||
      SnapshotStore.bucketN(ps.transform).isDefined
    if (grouped && tuples.exists(_.nonEmpty) && specs.forall(reportable))
      new KeyGroupedPartitioning(
        specs.map(ps => ps.transform match {
          case "identity" => Expressions.identity(ps.col)
            : org.apache.spark.sql.connector.expressions.Expression
          case t => Expressions.bucket(SnapshotStore.bucketN(t).get, ps.col)
        }).toArray,
        tuples.get.size)
    else new UnknownPartitioning(
      if (grouped && tuples.isDefined) tuples.get.size else files.size)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StoreReaderFactory(readSchemaV)
}

private[sources] case class StoreFilePartition(paths: Seq[String])
    extends InputPartition

private[sources] case class StoreKeyedPartition(paths: Seq[String],
    key: Seq[Any]) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(key.toArray)
}

/** Executor-side: Spark's own vectorized parquet reader driven per
  * file (the simple-path initializer — fresh local Hadoop config, the
  * documented scope), required columns pushed into the parquet
  * projection, rows copied out of the reused columnar batch, columns a
  * file predates projected as null. */
private[sources] class StoreReaderFactory(schema: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val paths = partition match {
      case StoreFilePartition(ps)     => ps
      case StoreKeyedPartition(ps, _) => ps
      case other => throw new IllegalStateException(s"graft-store: foreign partition $other")
    }
    new PartitionReader[InternalRow] {
      import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader

      private val queue = scala.collection.mutable.Queue(paths: _*)
      private var reader: VectorizedParquetRecordReader = _
      private var proj: Array[Int] = _ // output ordinal → input ordinal, -1 = null
      private var row: InternalRow = _

      /** Open the next queued file; false when none remain. */
      private def openNext(): Boolean = {
        if (queue.isEmpty) return false
        val path = queue.dequeue()
        // the file's present subset of the required columns, requested
        // in OUR order (the vectorized reader builds its row in exactly
        // the requested order); a column the file predates projects null
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(path), conf)
        val pr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val fileSchema = try pr.getFileMetaData.getSchema finally pr.close()
        val present = schema.fields.filter(f => fileSchema.containsField(f.name))
        val idx = present.map(_.name).zipWithIndex.toMap
        proj = schema.fields.map(f => idx.getOrElse(f.name, -1))
        reader = new VectorizedParquetRecordReader(false, 4096)
        if (present.isEmpty) {
          // a file predating EVERY required column: read all columns
          // just to drive the row count; the projection nulls everything
          reader.initialize(path, null)
        } else {
          val names = new java.util.ArrayList[String]()
          present.foreach(f => names.add(f.name): Unit)
          reader.initialize(path, names)
        }
        true
      }

      override def next(): Boolean = {
        while (true) {
          if (reader == null && !openNext()) return false
          if (reader.nextKeyValue()) {
            val in = reader.getCurrentValue.asInstanceOf[InternalRow]
            val out = new Array[Any](schema.fields.length)
            var o = 0
            while (o < proj.length) {
              val i = proj(o)
              out(o) =
                if (i < 0 || in.isNullAt(i)) null
                else in.get(i, schema.fields(o).dataType) match {
                  // copy values aliasing the reused batch memory
                  case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
                  case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
                  case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
                  case r: InternalRow => r.copy()
                  case other => other
                }
              o += 1
            }
            row = new GenericInternalRow(out)
            return true
          }
          reader.close()
          reader = null
        }
        false // unreachable
      }

      override def get(): InternalRow = row

      override def close(): Unit = {
        if (reader != null) { reader.close(); reader = null }
      }
    }
  }
}
