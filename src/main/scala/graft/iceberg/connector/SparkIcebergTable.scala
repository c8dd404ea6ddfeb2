package graft.iceberg.connector

import java.util.{OptionalLong, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => StreamingOffset}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.iceberg.{DataFileEntry, IcebergTable, IcebergWriter, TableCommitter}

/** DataSource V2 face of an [[IcebergTable]] — the counterpart of the
  * reference's `impl TableProvider for DataFusionTable`
  * (`datafusion_iceberg/src/table.rs:74-296`):
  *
  *  - projection / filter / limit pushdown via the `SupportsPushDown*`
  *    mixins (reference `scan` args, `table.rs:94-100`);
  *  - pushed filters drive two-level manifest/file pruning *before* any
  *    task is scheduled — at 100 TB the win is that pruned files never
  *    appear in the scan's file list at all;
  *  - post-pruning statistics via `SupportsReportStatistics` (A11), summing
  *    manifest `record_count` — deliberately not the reference's
  *    files-as-rows bug (`statistics.rs:29-31`) — so Catalyst's broadcast
  *    and CBO decisions see real cardinalities;
  *  - `partitioning()` reports identity transforms (A6).
  *
  * Execution delegates to Spark's parquet source through a `V1Scan`
  * relation: the inner DataFrame re-applies the pushed predicate so
  * parquet footer pushdown still happens, and Spark re-checks all filters
  * above the scan, keeping pruning strictly an optimization.
  */
final class SparkIcebergTable(tableName: String, val table: IcebergTable,
    writable: Boolean = true,
    /** Commit transport override — None = the default filesystem
      * committer on `table.tableDir`; a REST-backed catalog passes its
      * `RestCommitter` so data commits POST to the service that owns the
      * metadata pointer. */
    val committerOpt: Option[TableCommitter] = None,
    /** Fresh metadata fetch for STREAMING reads (per micro-batch):
      * filesystem tables re-read metadata.json; REST tables have none on
      * disk, so the catalog passes a store-backed reload. */
    reload: () => IcebergTable = null)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  override def name(): String = tableName

  override def schema(): StructType = table.metadata.schema

  /** Iceberg's reserved row-identity metadata columns: `_file` (data file
    * path) and `_pos` (row position in it) — served from the parquet
    * source's `_metadata` struct with no extra IO. They are the rowId the
    * merge-on-read delta operations write position deletes against, and
    * they're user-queryable (`SELECT _file, _pos FROM t`) like upstream. */
  override def metadataColumns():
      Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_file"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
        override def comment(): String = "data file path of the row"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_pos"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = false
        override def comment(): String = "row position in its data file"
      }) ++
      // v3 row lineage: `_row_id` — materialized column of rewritten
      // files, else manifest first_row_id + position; null for rows
      // predating the v3 upgrade. Served on v3 AND declared-v3 tables
      // (property set, metadata not yet upgraded: lineage is assigned
      // from the first commit, so the read side must already answer) —
      // the same predicate the writer's assignment uses.
      (if (!graft.iceberg.IcebergWriter.wantsLineage(table.metadata))
         Array.empty[org.apache.spark.sql.connector.catalog.MetadataColumn]
       else Array[org.apache.spark.sql.connector.catalog.MetadataColumn](
        new org.apache.spark.sql.connector.catalog.MetadataColumn {
          override def name(): String = "_row_id"
          override def dataType(): org.apache.spark.sql.types.DataType =
            org.apache.spark.sql.types.LongType
          override def isNullable: Boolean = true
          override def comment(): String =
            "v3 row lineage id (stable across rewrites)"
          /** Merge-on-read updates are delete + REINSERT
            * (`representUpdateAsDeleteAndInsert`); the spec's "updates
            * preserve row ids" therefore needs the reinserted row to
            * carry its `_row_id` through the delta write — Spark's
            * default nulls metadata on reinsert, this opts out.
            * PRESERVE_ON_UPDATE/DELETE stay at their (true) defaults,
            * which the copy-on-write path relies on. */
          override def metadataInJSON(): String =
            s"""{"${org.apache.spark.sql.connector.catalog.MetadataColumn.PRESERVE_ON_REINSERT}": true}"""
        },
        new org.apache.spark.sql.connector.catalog.MetadataColumn {
          override def name(): String =
            graft.iceberg.IcebergTable.LastUpdCol
          override def dataType(): org.apache.spark.sql.types.DataType =
            org.apache.spark.sql.types.LongType
          override def isNullable: Boolean = true
          override def comment(): String =
            "v3 row lineage: sequence number of the commit that last " +
              "wrote the row (null in files inherits the file's data " +
              "sequence number)"
          /** Copy-on-write rewrites: COPIED rows preserve their old
            * value (PRESERVE_ON_UPDATE default true would also keep it
            * on UPDATED rows — wrong: the spec says an updated row takes
            * the updating commit's sequence, which writing null achieves
            * via per-file inheritance). Merge-on-read reinserts keep
            * Spark's null-on-reinsert default for the same reason. */
          override def metadataInJSON(): String =
            s"""{"${org.apache.spark.sql.connector.catalog.MetadataColumn.PRESERVE_ON_UPDATE}": false}"""
        }))

  /** Writes go through the V1 bridge ([[GraftWriteBuilder]]): the commit
    * protocol is driver-side metadata bookkeeping around a distributed
    * `df.write.parquet`, which `InsertableRelation` expresses exactly.
    * Time-travel-pinned tables are read-only (writing "into the past"
    * would fork history). */
  override def capabilities(): JSet[TableCapability] =
    (if (canWrite)
       Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
         TableCapability.V1_BATCH_WRITE, TableCapability.BATCH_WRITE,
         TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
         TableCapability.OVERWRITE_DYNAMIC)
     else Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)).asJava

  private def canWrite: Boolean = writable && table.pinnedSnapshotId.isEmpty

  /** The FULL default spec as DSv2 transforms (identity, bucket, days, …)
    * — what `SHOW CREATE TABLE` / `DESCRIBE` print and what Catalyst's
    * distribution reasoning sees. A transform the connector vocabulary
    * cannot express drops out (report less, never wrong). */
  override def partitioning(): Array[Transform] = {
    val idToName = table.metadata.fieldIds.map(_.swap)
    table.metadata.partitionSpec.flatMap(p =>
      idToName.get(p.sourceId).flatMap(src =>
        SparkIcebergTable.v2Transform(p.transform, src))).toArray
  }

  override def properties(): java.util.Map[String, String] =
    (table.metadata.properties + ("format" -> "iceberg/parquet") +
      ("location" -> table.tableDir)).asJava

  /** A `branch` read option pins batch scans to the ref's head (the
    * option form of `VERSION AS OF '<ref>'`) and points STREAMING reads
    * at the ref's lineage — `readStream.option("branch", "audit")`
    * follows commits staged on the branch (the read half of
    * write-audit-publish: audit a staging stream before publishing). */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxFiles = Option(options.get("maxFilesPerTrigger")).map { v =>
      val n = v.toInt
      require(n > 0, s"maxFilesPerTrigger must be positive, got $n")
      n
    }
    // row-weighted admission, the changelog stream's twin: cap each
    // micro-batch at ~N appended ROWS (snapshot-granular, >=1 snapshot)
    val maxRows = Option(options.get("maxRowsPerTrigger")).map { v =>
      val n = v.toLong
      require(n > 0, s"maxRowsPerTrigger must be positive, got $n")
      n
    }
    // `snapshot-id` / `as-of-timestamp`: the DataFrame-reader twins of
    // `VERSION AS OF` / `TIMESTAMP AS OF` (upstream Iceberg's option
    // names). Mutually exclusive with each other and with `branch`.
    val pins = Seq(
      Option(options.get("branch")),
      Option(options.get("snapshot-id")),
      Option(options.get("as-of-timestamp"))).count(_.isDefined)
    require(pins <= 1,
      "read options branch / snapshot-id / as-of-timestamp are mutually exclusive")
    // streamRef = "" (un-streamable sentinel): these pins freeze a batch
    // state; a stream has no frontier to follow from them, and the
    // micro-batch planner would otherwise silently walk the LIVE lineage
    Option(options.get("snapshot-id")).foreach(id =>
      return new GraftScanBuilder(table.atSnapshot(id.toLong),
        streamRef = "", maxFilesPerTrigger = maxFiles))
    Option(options.get("as-of-timestamp")).foreach(ms =>
      return new GraftScanBuilder(table.asOfTimestamp(ms.toLong),
        streamRef = "", maxFilesPerTrigger = maxFiles))
    Option(options.get("branch")) match {
      case None => new GraftScanBuilder(table, maxFilesPerTrigger = maxFiles,
        reload = reload, maxRowsPerTrigger = maxRows)
      case Some(ref) =>
        val head = table.metadata.refs.getOrElse(ref,
          throw new IllegalArgumentException(
            s"ref '$ref' not found on $tableName " +
              s"(have: ${table.metadata.refs.keys.mkString(", ")})"))
        new GraftScanBuilder(table.atSnapshot(head), ref, maxFiles,
          reload = reload, maxRowsPerTrigger = maxRows)
    }
  }

  /** SQL DELETE without a data rewrite: equality predicates commit an
    * Iceberg v2 equality-delete file; an empty predicate truncates; any
    * other column-expressible predicate (ranges, LIKE, mixed ORs) takes
    * [[IcebergWriter.positionDeleteWhere]]'s per-file strategy (drop
    * fully-matched files metadata-only, position-delete small fractions,
    * rewrite large ones). Only predicates we cannot express as columns —
    * or tables whose identity partition values live only in metadata,
    * where re-reading the raw files would mis-evaluate the predicate —
    * fall through to Spark's generic row-level rewrite. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    canWrite && (filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]) ||
      IcebergWriter.equalityTuples(schema(), filters.toSeq).isDefined ||
      (filters.forall(f => IcebergTable.filterToColumn(f).isDefined) &&
        table.missingPartitionColumns(org.apache.spark.sql.SparkSession.active,
          table.planFiles(filters.toSeq)).isEmpty))

  override def deleteWhere(filters: Array[Filter]): Unit = {
    if (!canWrite) throw new UnsupportedOperationException(
      s"$tableName is read-only")
    val spark = org.apache.spark.sql.SparkSession.active
    // write-audit-publish: `SET spark.wap.branch = audit; DELETE …`
    // stages the delete on the branch, same as INSERT — main unchanged
    val branch = SparkIcebergTable.wapBranch(spark)
    val effective = filters.toSeq
      .filterNot(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
    if (effective.isEmpty ||
        IcebergWriter.equalityTuples(schema(), effective).isDefined)
      IcebergWriter.deleteWhere(spark, table.tableDir, filters.toSeq,
        committerOpt, branch)
    else {
      // write.delete.mode=merge-on-read pins the per-file strategy to
      // position deletes only: heavily-matched files are never rewritten
      // (fully-matched files still drop metadata-only — strictly cheaper
      // than position-deleting every row)
      val fraction =
        if (table.metadata.properties.get("write.delete.mode")
            .contains("merge-on-read")) 1.0
        else 0.3
      IcebergWriter.positionDeleteWhere(spark, table.tableDir, effective,
        maxPosDeleteFraction = fraction,
        committer = committerOpt, branch = branch)
    }
  }

  /** SQL UPDATE / MERGE INTO / non-equality DELETE: Spark's group-based
    * rewrites over a copy-on-write scan+write pair ([[RowLevelOps]]).
    * Must not throw here — the analyzer builds one for EVERY delete
    * before `OptimizeMetadataOnlyDeleteFromTable` can route equality
    * predicates back to [[deleteWhere]]'s merge-on-read path. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new GraftRowLevelOperationBuilder(tableName, table, writable, info, committerOpt)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (!canWrite) throw new UnsupportedOperationException(
      if (table.pinnedSnapshotId.nonEmpty)
        s"$tableName is pinned to snapshot ${table.pinnedSnapshotId.get}; " +
          "time-travel reads are read-only"
      else s"$tableName is read-only")
    new GraftWriteBuilder(table, committerOpt,
      Option(info.options.get("branch")))
  }
}

object SparkIcebergTable {
  /** Apply catalog-vended per-table overrides to a fresh Hadoop conf
    * (the session conf stays untouched). */
  private[connector] def withOverrides(
      c: org.apache.hadoop.conf.Configuration,
      overrides: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    overrides.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** The session's write-audit-publish staging branch (the Iceberg
    * `spark.wap.branch` convention); `main` when unset. */
  def wapBranch(spark: org.apache.spark.sql.SparkSession): String =
    Option(spark.conf.get("spark.wap.branch", null))
      .filter(_.nonEmpty).getOrElse("main")

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Iceberg transform string → DSv2 connector expression over `src`,
    * when the connector vocabulary can express it (it resolves through
    * [[GraftCatalog]]'s FunctionCatalog — the same functions SPJ uses). */
  def v2Transform(transform: String, src: String): Option[Transform] =
    transform match {
      case "identity" => Some(Expressions.identity(src))
      case "year" => Some(Expressions.years(src))
      case "month" => Some(Expressions.months(src))
      case "day" => Some(Expressions.days(src))
      case "hour" => Some(Expressions.hours(src))
      case BucketRe(n) => Some(Expressions.bucket(n.toInt, src))
      case TruncateRe(w) => Some(Expressions.apply("truncate",
        Expressions.literal(Integer.valueOf(w.toInt)), Expressions.column(src)))
      case _ => None
    }

  /** Clustering requirement for a DSv2 write onto this table —
    * `write.distribution-mode` hash (the partitioned-table default):
    * cluster incoming rows by the partition transforms so replacement /
    * delta-insert files are one-per-tuple, not one-per-(task, tuple).
    * Unspecified when the mode opts out, a transform is not expressible,
    * or a source column is missing from the write schema (a delta DELETE
    * carries only row ids — nothing to cluster by). */
  def writeDistribution(table: IcebergTable, writeSchema: StructType)
      : org.apache.spark.sql.connector.distributions.Distribution = {
    import org.apache.spark.sql.connector.distributions.Distributions
    val meta = table.metadata
    val mode = meta.properties.getOrElse("write.distribution-mode",
      if (meta.partitionSpec.nonEmpty) "hash" else "none")
    if (mode == "none" || meta.partitionSpec.isEmpty)
      return Distributions.unspecified()
    val idToName = meta.fieldIds.map(_.swap)
    val exprs = meta.partitionSpec.flatMap { p =>
      idToName.get(p.sourceId)
        .filter(src => writeSchema.fieldNames.contains(src))
        .flatMap(src => v2Transform(p.transform, src))
    }
    if (exprs.size != meta.partitionSpec.size) Distributions.unspecified()
    else Distributions.clustered(
      exprs.toArray[org.apache.spark.sql.connector.expressions.Expression])
  }
}

/** INSERT INTO (append snapshot) and INSERT OVERWRITE (truncate snapshot)
  * onto the [[IcebergWriter]] commit protocol. The reference has no write
  * path at all (SURVEY §2.C) — this is the extension a real lakehouse
  * user needs first after reads.
  *
  * Write-audit-publish: a `branch` write option
  * (`df.writeTo(t).option("branch", "audit")`) or the `spark.wap.branch`
  * session conf (the Iceberg convention — reaches SQL `INSERT INTO` too)
  * routes the commit to that branch; `main` and every reader not pinned
  * to the branch see nothing until [[IcebergWriter.fastForward]]
  * publishes it.
  */
final class GraftWriteBuilder(table: IcebergTable,
    committerOpt: Option[TableCommitter] = None,
    branchOpt: Option[String] = None)
    extends WriteBuilder with SupportsTruncate
    with org.apache.spark.sql.connector.write.SupportsOverwrite
    with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {

  private var truncateFirst = false
  private var staticFilters: Option[Array[Filter]] = None
  private var dynamic = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  /** Static INSERT OVERWRITE: an all-AlwaysTrue filter set is the plain
    * truncating overwrite; anything else pins the partitions to replace
    * ([[IcebergWriter.overwriteWhere]] validates identity alignment). */
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    val effective = filters
      .filterNot(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
    if (effective.isEmpty) truncateFirst = true
    else staticFilters = Some(effective)
    this
  }

  /** Dynamic partition overwrite (`partitionOverwriteMode = dynamic`):
    * replace exactly the partitions the incoming rows land in. Needs a
    * real DSv2 batch write — Spark has no V1 fallback for it — so
    * [[build]] returns [[GraftDynamicOverwriteWrite]]'s executor-written
    * fanout files instead of the V1 `InsertableRelation`. */
  override def overwriteDynamicPartitions(): WriteBuilder = {
    dynamic = true
    this
  }

  override def build(): Write =
    if (dynamic)
      new GraftDynamicOverwriteWrite(table, committerOpt, branchOpt)
    else new V1Write {
      override def toInsertableRelation: InsertableRelation = new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          val branch = branchOpt
            .getOrElse(SparkIcebergTable.wapBranch(data.sparkSession))
          staticFilters match {
            case Some(fs) =>
              IcebergWriter.overwriteWhere(data.sparkSession, table.tableDir,
                data, fs.toSeq, committer = committerOpt, branch = branch)
            case None if truncateFirst || overwrite =>
              IcebergWriter.overwrite(data.sparkSession, table.tableDir, data,
                committer = committerOpt, branch = branch)
            case None =>
              IcebergWriter.append(data.sparkSession, table.tableDir, data,
                committer = committerOpt, branch = branch)
          }
          ()
        }
      }
    }
}

final class GraftScanBuilder(table: IcebergTable,
    /** Ref whose lineage a STREAMING read follows (batch scans are
      * already pinned by the caller); `main` = the default stream. */
    streamRef: String = "main",
    /** Streaming admission control: cap each micro-batch at ~this many
      * appended files (snapshot-granular; ≥1 snapshot per batch). */
    maxFilesPerTrigger: Option[Int] = None,
    /** store-backed fresh metadata fetch for streams (REST tables) */
    reload: () => IcebergTable = null,
    /** Streaming admission control: cap each micro-batch at ~this many
      * appended ROWS (snapshot-granular; composes with the file cap). */
    maxRowsPerTrigger: Option[Long] = None)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var filters: Array[Filter] = Array.empty
  private var requiredSchema: StructType = table.metadata.schema
  private var limit: Option[Int] = None
  // (name, type, value) per pushed agg func — value is Catalyst-internal
  private var pushedAgg: Option[Seq[(String, org.apache.spark.sql.types.DataType, Any)]] = None

  /** `SELECT COUNT(*) / MIN(c) / MAX(c) FROM t` answered from manifest
    * metadata (`record_count` sums; per-file lower/upper bounds) —
    * METADATA-ONLY: at 100 TB the scan never touches a data file (A11's
    * statistics, promoted to a complete aggregate answer). Only taken
    * when EXACT: no residual filters (ours are all residual — Spark
    * would re-filter the answer row), no grouping, no limit, no
    * merge-on-read deletes (manifest stats can't see anti-joined rows).
    * MIN/MAX additionally require a fixed-width type whose bounds the
    * spec forbids truncating (int/long/date/timestamp — never strings,
    * never NaN-bearing floats), a bound present on EVERY file (a
    * missing one means unknown, not empty), AND the
    * `graft.exact-bounds=true` table property: the Iceberg spec only
    * requires bounds to be conservative (<=/>= all values), so a foreign
    * writer's loose-but-legal bounds would make MIN/MAX silently wrong
    * while COUNT(*) stayed right. This framework's creation paths stamp
    * the property (our bounds come from parquet footers — exact); a
    * foreign table earns it only by the user asserting it. */
  private def metadataAggAnswer(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Seq[(String, org.apache.spark.sql.types.DataType, Any)]] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.types._
    if (filters.nonEmpty || limit.nonEmpty || agg.groupByExpressions.nonEmpty ||
        agg.aggregateExpressions.isEmpty || table.hasDeletes) return None

    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          Some(nr.fieldNames.head)
        case _ => None
      }
    def boundSafe(name: String): Option[(Int, DataType)] =
      if (!table.metadata.properties.get("graft.exact-bounds").contains("true"))
        None // bounds only known conservative ⇒ MIN/MAX not answerable
      else table.metadata.fieldIds.get(name).flatMap { id =>
        table.metadata.schema.fields.find(_.name == name).map(_.dataType) match {
          case Some(dt @ (IntegerType | LongType | DateType |
                          TimestampType | TimestampNTZType)) => Some((id, dt))
          case _ => None
        }
      }
    lazy val files = table.planFiles()
    def bound(id: Int, dt: DataType, lower: Boolean): Option[Option[Any]] = {
      // Some(None) = table empty (answer null); None = not answerable
      if (files.isEmpty) return Some(None)
      val perFile = files.map { f =>
        (if (lower) f.lowerBounds else f.upperBounds)
          .get(id).flatMap(graft.iceberg.SingleValue.decode(_, dt))
      }
      if (perFile.exists(_.isEmpty)) None
      else Some(Some(perFile.flatten.reduce { (a, b) =>
        val cmp = (a, b) match {
          case (x: Int, y: Int) => x.compareTo(y)
          case (x: Long, y: Long) => x.compareTo(y)
          case _ => return None
        }
        if ((cmp <= 0) == lower) a else b
      }))
    }

    val answers = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        Some(("count(*)", LongType: DataType, table.rowCount(): Any))
      case m: Min =>
        for {
          name <- colOf(m.column)
          (id, dt) <- boundSafe(name)
          v <- bound(id, dt, lower = true)
        } yield (s"min($name)", dt, v.orNull: Any)
      case m: Max =>
        for {
          name <- colOf(m.column)
          (id, dt) <- boundSafe(name)
          v <- bound(id, dt, lower = false)
        } yield (s"max($name)", dt, v.orNull: Any)
      case _ => None
    }
    if (answers.forall(_.isDefined)) Some(answers.flatten) else None
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    metadataAggAnswer(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    pushedAgg = metadataAggAnswer(agg)
    pushedAgg.isDefined
  }

  /** Accept every filter for pruning but return them all as residual so
    * Spark re-evaluates above the scan — pruning soundness does not depend
    * on our stats decoding (SURVEY §7.4).
    */
  override def pushFilters(fs: Array[Filter]): Array[Filter] = { filters = fs; fs }

  override def pushedFilters(): Array[Filter] = filters

  override def pruneColumns(s: StructType): Unit = requiredSchema = s

  /** Partial limit pushdown (A8): cap the inner scan, let Spark keep its
    * own global limit (hence `false`). */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); false }

  /** Path choice: when every identity-partition source column is
    * materialized in the data files (the common writer behavior, one
    * footer read decides), build the native DSv2 Batch scan — it plans as
    * `BatchScanExec`, which is the only physical node that invokes
    * `SupportsRuntimeFiltering.filter` for dynamic file pruning. Tables
    * needing metadata partition re-injection fall back to the V1 bridge,
    * whose union-of-literal-groups plan a single parquet Batch cannot
    * express.
    */
  override def build(): Scan = {
    val spark = org.apache.spark.sql.SparkSession.active
    pushedAgg.foreach(answers => return new GraftMetadataAggScan(answers))
    val staticFiles = table.planFiles(filters.toSeq)
    // merge-on-read tables take the V1 bridge: delete application is an
    // anti-join AROUND the file scan, which a single parquet Batch cannot
    // express (toDF builds it)
    // name-mapped (id-less) tables also take the V1 bridge: the native
    // batch scan pushes the field-id read schema straight to the parquet
    // source, which would null renamed columns of files without ids —
    // toDF applies the schema.name-mapping.default alias instead
    // _file/_pos metadata columns also take the V1 bridge: they project
    // off the parquet _metadata struct, which the raw batch scan's read
    // schema cannot carry
    // a DATA column named like a metadata column shadows it (Spark's
    // conflict rule) and must stay on the native batch path
    val dataColNames = table.metadata.schema.fieldNames.toSet
    val wantsRowId = requiredSchema.fieldNames
      .exists(n => (n == "_file" || n == "_pos" || n == "_row_id" ||
          n == graft.iceberg.IcebergTable.LastUpdCol) &&
        !dataColNames.contains(n))
    // ORC imports (add_files) also take the V1 bridge: the native Batch
    // is Spark's parquet reader — toDF dispatches per-format scans
    if (table.missingPartitionColumns(spark, staticFiles).isEmpty &&
        limit.isEmpty && !table.hasDeletes && !wantsRowId &&
        staticFiles.forall(_.fileFormat.equalsIgnoreCase("PARQUET")) &&
        !table.needsNameMapping(spark, staticFiles))
      new GraftBatchScan(spark, table, filters, requiredSchema, staticFiles,
        streamRef, maxFilesPerTrigger, reload, maxRowsPerTrigger)
    else
      new GraftScan(table, filters, requiredSchema, limit, Some(staticFiles),
        streamRef, maxFilesPerTrigger, reload, maxRowsPerTrigger)
  }
}

/** A persistent SQL view served as a table provider — the reference's own
  * trick: its `TableProvider::scan` hits the `Relation::View` arm, re-plans
  * the stored SQL and delegates with the outer projection/filters
  * (`table.rs:102-112`). Spark's analyzer never consults `ViewCatalog` for
  * SELECT resolution, so `GraftCatalog.loadTable` returns this for view
  * directories; outer filters/projections are replayed onto the inner plan
  * where Catalyst pushes them through the view naturally.
  */
final class GraftSqlViewTable(
    viewName: String,
    viewSql: String,
    declaredSchema: StructType,
    viewCatalog: String = null,
    viewNamespace: Array[String] = Array.empty)
    extends Table with SupportsRead {

  override def name(): String = viewName

  /** Analyze the view SQL in the context it was created in: relative table
    * names inside the stored SQL must resolve against the view's own
    * catalog/namespace, not the caller's current ones. The context switch
    * happens on a CLONED session (forked session state, own
    * CatalogManager, shared SparkContext + temp views + conf), so the
    * caller's session state is never mutated — concurrent queries on the
    * original session cannot observe the view's context, which the
    * previous swap-and-restore version could briefly expose. The clone is
    * driver-side analysis machinery only; the returned plan executes on
    * the shared SparkContext.
    */
  private def analyzeInViewContext(
      spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    if (viewCatalog == null || viewCatalog.isEmpty) return spark.sql(viewSql)
    val analysisSession = org.apache.spark.sql.GraftColumnShim.cloneSession(spark)
    val cm = analysisSession.sessionState.catalogManager
    cm.setCurrentCatalog(viewCatalog)
    if (viewNamespace != null && viewNamespace.nonEmpty)
      cm.setCurrentNamespace(viewNamespace)
    analysisSession.sql(viewSql)
  }

  override def schema(): StructType =
    if (declaredSchema.nonEmpty) declaredSchema
    else analyzeInViewContext(org.apache.spark.sql.SparkSession.active).schema

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def properties(): java.util.Map[String, String] =
    Map("view-sql" -> viewSql).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with SupportsPushDownFilters
      with SupportsPushDownRequiredColumns {
      private var filters: Array[Filter] = Array.empty
      private var required: StructType = schema()

      override def pushFilters(fs: Array[Filter]): Array[Filter] = { filters = fs; fs }
      override def pushedFilters(): Array[Filter] = filters
      override def pruneColumns(s: StructType): Unit = required = s

      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = required
        override def toV1TableScan[T <: BaseRelation with TableScan](ctx: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = required
            override def toString: String = s"GraftView($viewName)"
            override def needConversion: Boolean = false // InternalRow pass-through
            override def buildScan(): RDD[Row] = {
              var df = analyzeInViewContext(ctx.sparkSession)
              val preds = filters.toSeq.flatMap(IcebergTable.filterToColumn)
              if (preds.nonEmpty) df = df.filter(preds.reduce(_ && _))
              // Cast to the declared view schema: with needConversion=false
              // the rows pass through as InternalRows, so if the underlying
              // table's types drifted since CREATE VIEW, serving them under
              // the stored schema would reinterpret memory silently — the
              // cast makes drift produce correct values (or an analysis
              // error), never corruption.
              df.select(required.fields.toSeq.map(f =>
                  col(f.name).cast(f.dataType).as(f.name)): _*)
                .queryExecution.toRdd.asInstanceOf[RDD[Row]]
            }
          }.asInstanceOf[T]
      }
    }
}

/** The native DSv2 batch path: Spark's vectorized `ParquetScan` over the
  * pruned file list (columnar batches straight into `BatchScanExec`, no
  * V1 row bridge), plus `SupportsRuntimeFiltering` — at execution time a
  * dim-side join filter arrives as In/EqualTo values and shrinks the file
  * set via manifest-entry bounds BEFORE tasks are scheduled (dynamic file
  * pruning, the DSv2 analogue of DPP). Pruning is best-effort by design:
  * rows from spuriously-kept files are dropped by the join that produced
  * the filter, so soundness never depends on bounds decoding.
  */
/** The metadata-answered aggregate (COUNT(*)/MIN/MAX): one driver-local
  * row, planned as a `LocalTableScan` — no task, no file, no shuffle. */
final class GraftMetadataAggScan(
    answers: Seq[(String, org.apache.spark.sql.types.DataType, Any)])
    extends Scan with org.apache.spark.sql.connector.read.LocalScan {

  override def readSchema(): StructType = StructType(
    answers.map { case (name, dt, v) =>
      org.apache.spark.sql.types.StructField(name, dt, nullable = v == null)
    })

  override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
    Array(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      answers.map(_._3).toArray))

  override def description(): String =
    s"GraftMetadataAggScan(${answers.map { case (n, _, v) => s"$n=$v" }
      .mkString(", ")}, metadata-only)"
}

final class GraftBatchScan(
    spark: org.apache.spark.sql.SparkSession,
    table: IcebergTable,
    filters: Array[Filter],
    requiredSchema: StructType,
    staticFiles: Seq[DataFileEntry],
    streamRef: String = "main",
    maxFilesPerTrigger: Option[Int] = None,
    reload: () => IcebergTable = null,
    maxRowsPerTrigger: Option[Long] = None)
    extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeFiltering
    with SupportsReportPartitioning {

  @volatile private var runtimeFilters: Array[Filter] = Array.empty
  @volatile private var cached: (Seq[DataFileEntry], Scan) = _

  private[graft] def currentFiles: Seq[DataFileEntry] =
    table.pruneFiles(staticFiles, runtimeFilters.toSeq)

  /** Filters safe to hand the parquet reader: parquet-mr matches filter
    * columns by NAME, so predicates on columns whose field id shifted
    * across schema evolution could row-group-prune against an old file's
    * same-named different-id column. They stay in OUR id-keyed pruning
    * and in Spark's re-check above the scan — only the parquet layer
    * loses them. */
  private def parquetSafe(fs: Array[Filter]): Array[Filter] = {
    val unsafe = table.metadata.idShiftedNames
    if (unsafe.isEmpty) fs
    else fs.filter(_.references.forall(c => !unsafe.contains(c)))
  }

  private def delegate: Scan = synchronized {
    val files = currentFiles
    if (cached == null || cached._1 != files)
      cached = (files, org.apache.spark.sql.execution.datasources.GraftScanShims
        .parquetBatchScan(spark,
          files.map(f => (table.resolve(f.filePath), f.fileSizeInBytes)),
          table.metadata.schema, requiredSchema,
          parquetSafe(filters ++ runtimeFilters),
          confOverrides = table.vended))
    cached._2
  }

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this

  // ---- storage-partitioned joins -----------------------------------------
  //
  // When the table is partitioned and `spark.sql.sources.v2.bucketing
  // .enabled` is on, report `KeyGroupedPartitioning` over the spec's
  // transforms and plan input partitions grouped by partition tuple
  // (`HasPartitionKey`). Two tables partitioned by the same transform of
  // their join key then join with ZERO shuffle — Catalyst proves
  // co-partitioning by resolving the transforms through [[GraftFunctions]]
  // (the same murmur3/truncation the writer clustered by, so the proof is
  // sound by construction). At 100 TB this turns a fact-fact join from
  // "re-shuffle both tables" into a metadata decision.
  //
  // Reporting is best-effort and self-disabling: an unsupported transform,
  // a file missing a spec value (written under an older spec), or a
  // partition value we can't type → UnknownPartitioning / ungrouped
  // planning, never a wrong key.

  private def spjEnabled: Boolean =
    spark.conf.get("spark.sql.sources.v2.bucketing.enabled", "false").toBoolean

  /** (spec field, key type, DSv2 transform) per partition field, when the
    * whole spec is SPJ-expressible. */
  private lazy val spjFields: Option[Seq[(graft.iceberg.PartitionField,
      org.apache.spark.sql.types.DataType, Transform)]] = {
    val meta = table.metadata
    val nameById = meta.fieldIds.map(_.swap)
    val spec = meta.partitionSpec
    if (spec.isEmpty) None
    else {
      val fields = spec.flatMap { pf =>
        for {
          src <- nameById.get(pf.sourceId)
          srcType <- meta.schema.fields.find(_.name == src).map(_.dataType)
          keyType = graft.iceberg.PartitionTransforms.resultType(pf.transform, srcType)
          if keyType != org.apache.spark.sql.types.NullType
          transform <- SparkIcebergTable.v2Transform(pf.transform, src)
        } yield (pf, keyType, transform)
      }
      if (fields.length == spec.length) Some(fields) else None
    }
  }

  /** Manifest partition value → Catalyst internal value of `keyType`;
    * None = not convertible (disables SPJ for the scan). */
  private def keyValue(v: Any, keyType: org.apache.spark.sql.types.DataType): Option[Any] = {
    import org.apache.spark.sql.types._
    (v, keyType) match {
      case (null, _) => Some(null)
      case (i: Int, IntegerType | DateType) => Some(i)
      case (l: Long, LongType | TimestampType | TimestampNTZType) => Some(l)
      case (i: Int, LongType | TimestampType | TimestampNTZType) => Some(i.toLong)
      case (s: String, StringType) =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      case (b: Boolean, BooleanType) => Some(b)
      case _ => None
    }
  }

  /** Files grouped by partition tuple, keys as InternalRows in spec
    * order. None when SPJ is off or any file/value is not expressible. */
  private def spjGroups(): Option[Seq[(org.apache.spark.sql.catalyst.InternalRow,
      Seq[(String, Long)])]] =
    if (!spjEnabled) None
    else spjFields.flatMap { fields =>
      val files = currentFiles
      val keyed: Seq[Option[(Seq[Any], (String, Long))]] = files.map { f =>
        // name-keyed lookup is only meaningful under the spec that wrote
        // the file: after partition evolution an old file's same-named
        // value may belong to a different transform (e.g. bucket[4] vs
        // bucket[8]) — grouping on it would co-locate the wrong rows
        if (f.specId != table.metadata.defaultSpecId) None
        else {
          val vals = fields.map { case (pf, keyType, _) =>
            f.partition.get(pf.name).flatMap(keyValue(_, keyType))
          }
          if (vals.exists(_.isEmpty)) None
          else Some((vals.map(_.get), (table.resolve(f.filePath), f.fileSizeInBytes)))
        }
      }
      if (files.isEmpty || keyed.exists(_.isEmpty)) None
      else Some(keyed.flatten
        .groupBy(_._1)
        .toSeq
        .map { case (key, fs) =>
          (new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            key.toArray): org.apache.spark.sql.catalyst.InternalRow,
            fs.map(_._2))
        })
    }

  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spjGroups() match {
      case Some(groups) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          spjFields.get.map(_._3: org.apache.spark.sql.connector.expressions.Expression).toArray,
          groups.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  override def planInputPartitions(): Array[InputPartition] =
    spjGroups() match {
      case Some(groups) =>
        org.apache.spark.sql.execution.datasources.GraftScanShims
          .keyedFilePartitions(spark, groups)
      case None => delegate.toBatch.planInputPartitions()
    }

  override def createReaderFactory(): PartitionReaderFactory =
    delegate.toBatch.createReaderFactory()

  override def description(): String =
    s"GraftIcebergScan(files=${currentFiles.size}, pushed=${filters.mkString(", ")}, " +
      s"runtime=${runtimeFilters.mkString(", ")})"

  /** Post-static-pruning statistics (A11) — runtime filters arrive after
    * planning, so they deliberately don't feed CBO here. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(staticFiles.map(_.fileSizeInBytes).sum)
    override def numRows(): OptionalLong =
      OptionalLong.of(staticFiles.map(_.recordCount).sum)
    override def columnStats(): java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
      // O(columns × files) driver walk over manifest bound maps — only
      // worth paying when the CBO will actually read the result
      if (!spark.sessionState.conf.cboEnabled)
        java.util.Collections.emptyMap()
      else GraftColumnStats.build(table, staticFiles, requiredSchema)
  }

  /** Every top-level column in the read schema can answer a runtime
    * filter: manifest entries carry per-field bounds, not just partition
    * values. (Restricted to the pruned output — Spark resolves these
    * against the relation's columns and errors on absent ones.) */
  override def filterAttributes(): Array[NamedReference] =
    requiredSchema.fieldNames.map(Expressions.column)

  // ---- observability: what did planning prune? ---------------------------
  override def supportedCustomMetrics(): Array[
      org.apache.spark.sql.connector.metric.CustomMetric] =
    GraftScanMetrics.supported()

  /** Driver-side pruning counters for the SQL UI — all from metadata the
    * scan already holds (manifest-list summaries + planned entry stats):
    * zero extra IO at any table size. */
  override def reportDriverMetrics(): Array[
      org.apache.spark.sql.connector.metric.CustomTaskMetric] = {
    val (kept, total) = table.manifestPruneCounts(filters.toSeq)
    val planned = currentFiles
    Array(
      GraftScanMetrics.taskMetric(GraftScanMetrics.ManifestsTotal, total),
      GraftScanMetrics.taskMetric(GraftScanMetrics.ManifestsKept, kept),
      GraftScanMetrics.taskMetric(GraftScanMetrics.FilesStatic, planned.size),
      GraftScanMetrics.taskMetric(GraftScanMetrics.FilesRuntimePruned,
        staticFiles.size - planned.size),
      GraftScanMetrics.taskMetric(GraftScanMetrics.RecordsPlanned,
        planned.map(_.recordCount).sum),
      GraftScanMetrics.taskMetric(GraftScanMetrics.BytesPlanned,
        planned.map(_.fileSizeInBytes).sum))
  }

  override def filter(fs: Array[Filter]): Unit = { runtimeFilters = fs }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // `branch` has explicit streaming semantics (follow that ref's
    // lineage); the snapshot-id / as-of-timestamp pins do NOT — they
    // arrive with the "" streamRef sentinel, and the micro-batch planner
    // would otherwise silently follow the LIVE lineage. Refuse rather
    // than stream the whole live table.
    require(streamRef.nonEmpty,
      "readStream with snapshot-id / as-of-timestamp is not supported: a " +
        "stream follows the live table (or a branch via the `branch` " +
        "option); a pinned snapshot has no append frontier to follow")
    new GraftMicroBatchStream(spark, table, requiredSchema, filters, streamRef,
      maxFilesPerTrigger, reload, maxRowsPerTrigger)
  }
}

/** `spark.readStream.table(...)` over an Iceberg table: each micro-batch
  * is the file set APPENDED between two snapshots (the batch
  * [[IcebergTable.appendedFilesBetween]] planning), so a batch reads
  * exactly the new files — never a table rescan. Offsets carry snapshot
  * IDS but are ordered by snapshot-log POSITION
  * ([[TableMetadata.snapshotLineage]]): the Iceberg spec lets writers
  * pick random 64-bit ids, so an externally-written table's ids carry no
  * order — comparing them raw would silently stall the stream or plan a
  * wrong window. A checkpointed frontier whose snapshot has left the
  * lineage (expired, or the history rewritten underneath the stream)
  * fails LOUDLY instead of resuming somewhere wrong — keep expiration
  * horizons longer than checkpoint lag.
  *
  * Append-only semantics, enforced not assumed: a window containing a
  * delete/overwrite/compaction fails the stream loudly rather than
  * emitting wrong increments. Filters pushed by the streaming planner
  * drive the same parquet-level pushdown as batch scans (pruning
  * re-checked above the scan, as everywhere).
  */
final class GraftMicroBatchStream(
    spark: org.apache.spark.sql.SparkSession,
    table: IcebergTable,
    requiredSchema: StructType,
    filters: Array[Filter],
    /** Ref whose commits the stream follows: `main`, or a branch staged
      * by write-audit-publish (`readStream.option("branch", "audit")`).
      * A non-main ref's lineage is its parent-snapshot-id chain. */
    ref: String = "main",
    /** `maxFilesPerTrigger` read option: admission control. Without it
      * the FIRST micro-batch is the entire backlog — on a 100 TB table
      * one batch reading everything. With it, each batch advances the
      * frontier snapshot-by-snapshot until ~N appended files accumulate
      * (snapshot-granular: always ≥1 snapshot, so progress is guaranteed
      * and a snapshot is never split across batches). */
    maxFilesPerTrigger: Option[Int] = None,
    /** store-backed fresh metadata fetch (REST tables have no
      * metadata.json on disk to re-read per batch) */
    reload: () => IcebergTable = null,
    /** `maxRowsPerTrigger`: the row-weighted twin — each batch advances
      * the frontier until ~N appended ROWS accumulate (snapshot-granular
      * like the file cap; composes with it, tighter bound wins). */
    maxRowsPerTrigger: Option[Long] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  /** `Trigger.AvailableNow` target: without this, Spark's wrapper for
    * non-AvailableNow sources IGNORES read limits and processes the whole
    * backlog in one batch — exactly what `maxFilesPerTrigger` exists to
    * prevent. Pinning the head here makes AvailableNow "drain up to THIS
    * offset, paced", immune to commits landing mid-drain. */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(head(fresh()))

  override def getDefaultReadLimit: ReadLimit =
    StreamReadLimits.default(maxFilesPerTrigger, maxRowsPerTrigger)

  override def reportLatestOffset(): StreamingOffset =
    GraftStreamOffset(availableNowTarget.getOrElse(head(fresh())))

  override def latestOffset(start: StreamingOffset, limit: ReadLimit): StreamingOffset = {
    val t = fresh()
    val headId = availableNowTarget.getOrElse(head(t))
    // flatten the limit into (file cap, row budget); both compose —
    // whichever bound fills first ends the batch
    val (maxF, maxR) = StreamReadLimits.flatten(limit)
    if (maxF.isEmpty && maxR.isEmpty) return GraftStreamOffset(headId)
    val s = start.asInstanceOf[GraftStreamOffset].snapshotId
    if (headId == s || headId == GraftStreamOffset.BeforeAnySnapshot)
      return GraftStreamOffset(headId)
    val lineage = t.metadata.branchLineage(ref)
    val sPos = lineagePos(lineage, s, "start")
    val hPos = lineagePos(lineage, headId, "end")
    if (hPos <= sPos) return GraftStreamOffset(headId) // rollback window
    var pos = sPos
    var files = 0L
    var rows = 0L
    // advance at least one snapshot; stop once EITHER budget is spent.
    // per-snapshot counts come from the same manifest-level diff planning
    // uses; a non-append snapshot ends the batch here and fails LOUDLY in
    // planInputPartitions (same contract as before)
    def spent: Boolean =
      maxF.exists(files >= _) || maxR.exists(rows >= _)
    while (pos < hPos && (pos == sPos || !spent)) {
      val prevId = if (pos == 0) 0L else lineage(pos - 1)
      val curId = lineage(pos) // snapshot at 1-based position pos+1
      try {
        val appended = t.appendedFilesBetween(prevId, curId)
        files += appended.size
        rows += appended.map(_.recordCount).sum
      } catch {
        case _: UnsupportedOperationException =>
          files = Long.MaxValue; rows = Long.MaxValue
      }
      pos += 1
    }
    GraftStreamOffset(lineage(pos - 1))
  }

  private val freshTable: () => IcebergTable = Option(reload)
    .getOrElse(() => new IcebergTable(table.tableDir, table.conf))

  private def fresh(): IcebergTable = freshTable()

  private def head(t: IcebergTable): Long =
    if (ref == "main")
      t.metadata.currentSnapshotId.filter(_ != -1L)
        .getOrElse(GraftStreamOffset.BeforeAnySnapshot)
    else t.metadata.refs.getOrElse(ref, throw new IllegalStateException(
      s"streaming ref '$ref' no longer exists on ${t.tableDir} " +
        s"(have: ${t.metadata.refs.keys.mkString(", ")}) — it was dropped " +
        "or published-and-removed; restart the stream against the " +
        "published ref"))

  override def initialOffset(): StreamingOffset =
    GraftStreamOffset(GraftStreamOffset.BeforeAnySnapshot)

  override def latestOffset(): StreamingOffset = GraftStreamOffset(head(fresh()))

  override def deserializeOffset(json: String): StreamingOffset =
    GraftStreamOffset(json.trim.toLong)

  /** 1-based position of snapshot `id` in the commit lineage (0 = before
    * any snapshot). `lastIndexOf`: after a rollback the log repeats an
    * id, and the frontier means its most recent occurrence. A missing id
    * is a hard error — resuming a checkpoint against a rewritten or
    * expired history has no safe answer. */
  private def lineagePos(lineage: Seq[Long], id: Long, which: String): Int =
    if (id == GraftStreamOffset.BeforeAnySnapshot) 0
    else lineage.lastIndexOf(id) match {
      case -1 => throw new IllegalStateException(
        s"streaming $which offset: snapshot $id is no longer in the " +
          s"table's snapshot lineage (${lineage.mkString(", ")}) — it was " +
          "expired or the history was rewritten; this checkpoint cannot " +
          "be resumed safely. Restart the stream from a fresh checkpoint.")
      case i => i + 1
    }

  /** Pushed filters minus those on columns whose field id shifted across
    * schema evolution: parquet-mr's row-group/page pruning is NAME-keyed,
    * so on an old file a same-named different-id column could prune rows
    * silently (same guard as the batch path's parquetSafe). */
  private def safeFilters(t: IcebergTable): Array[Filter] = {
    val unsafe = t.metadata.idShiftedNames
    if (unsafe.isEmpty) filters
    else filters.filter(_.references.forall(c => !unsafe.contains(c)))
  }

  override def planInputPartitions(
      start: StreamingOffset, end: StreamingOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].snapshotId
    val e = end.asInstanceOf[GraftStreamOffset].snapshotId
    if (e == s) return Array.empty
    val t = fresh()
    val lineage = t.metadata.branchLineage(ref)
    val sPos = lineagePos(lineage, s, "start")
    val ePos = lineagePos(lineage, e, "end")
    if (ePos <= sPos) return Array.empty // rollback window: nothing appended
    val files = t.appendedFilesBetween(
      if (s == GraftStreamOffset.BeforeAnySnapshot) 0L else s, e)
    if (files.isEmpty) return Array.empty
    // per-format micro-batches: an ALL-AVRO window (declared-avro
    // streaming table) reads through the row-based avro batch; parquet
    // windows keep the vectorized scan. A MIXED window (or ORC, which
    // has no row-capable source here) refuses — Spark's scan exec
    // cannot mix row and columnar partitions, and decoding garbage is
    // worse than stopping. Each trigger plans its own exec, so
    // per-window homogeneity is the right granularity.
    if (files.forall(_.fileFormat.equalsIgnoreCase("AVRO"))) {
      // a mid-stream import whose identity-partition values live only
      // in manifests would stream those columns as silent NULLs (the
      // avro batch has no metadata re-injection) — refuse the window
      val missing = t.missingPartitionColumns(spark, files)
      if (missing.nonEmpty)
        throw new UnsupportedOperationException(
          s"streaming window holds avro files whose partition columns " +
            s"(${missing.mkString(", ")}) live only in metadata — the " +
            "micro-batch reader cannot re-inject them; rewrite_data_files " +
            "to materialize the columns")
      AvroGroupBatch(files.map(f => t.resolve(f.filePath)),
          t.avroFieldSpecs(requiredSchema.fields.toSeq),
          new graft.iceberg.SerializableHadoopConf(
            SparkIcebergTable.withOverrides(
              spark.sessionState.newHadoopConf(), t.vended)))
        .planInputPartitions()
    }
    else {
      files.find(!_.fileFormat.equalsIgnoreCase("PARQUET")).foreach { f =>
        throw new UnsupportedOperationException(
          s"streaming read reached ${f.fileFormat} file ${f.filePath} in " +
            "a mixed or ORC window — the micro-batch reader serves " +
            "all-parquet or all-avro windows; rewrite_data_files to " +
            "unify formats (batch reads of this table still work)")
      }
      org.apache.spark.sql.execution.datasources.GraftScanShims
        .parquetBatchScan(spark,
          files.map(f => (t.resolve(f.filePath), f.fileSizeInBytes)),
          t.metadata.schema, requiredSchema, safeFilters(t),
          confOverrides = t.vended)
        .toBatch.planInputPartitions()
    }
  }

  /** File-list-independent (schema + conf only), so one factory serves
    * every micro-batch's partitions. Must push the same SAFE filter set
    * as planInputPartitions: ParquetScan applies pushedFilters in the
    * reader factory (name-keyed row-group/page pruning per file), so an
    * id-shifted column's filter here would drop rows silently. Computed
    * from FRESH metadata, same as planning — a schema evolution landing
    * mid-stream must shrink the safe set on BOTH paths, or the factory
    * would keep pushing a filter planning just excluded. */
  override def createReaderFactory(): PartitionReaderFactory = {
    val pq = org.apache.spark.sql.execution.datasources.GraftScanShims
      .parquetBatchScan(spark, Nil, table.metadata.schema, requiredSchema,
        safeFilters(fresh()), confOverrides = table.vended)
      .toBatch.createReaderFactory()
    val av = AvroGroupBatch(Nil,
        fresh().avroFieldSpecs(requiredSchema.fields.toSeq),
        new graft.iceberg.SerializableHadoopConf(
          SparkIcebergTable.withOverrides(
            spark.sessionState.newHadoopConf(), table.vended)))
      .createReaderFactory()
    // dispatch by the partition type planInputPartitions emitted —
    // per-window homogeneity keeps row/columnar consistent within a plan
    new PartitionReaderFactory {
      override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
          : org.apache.spark.sql.connector.read.PartitionReader[
            org.apache.spark.sql.catalyst.InternalRow] = p match {
        case _: AvroGroupBatch.AvroFileInput => av.createReader(p)
        case _ => pq.createReader(p)
      }
      override def createColumnarReader(
          p: org.apache.spark.sql.connector.read.InputPartition)
          : org.apache.spark.sql.connector.read.PartitionReader[
            org.apache.spark.sql.vectorized.ColumnarBatch] =
        pq.createColumnarReader(p)
      override def supportColumnarReads(
          p: org.apache.spark.sql.connector.read.InputPartition): Boolean =
        p match {
          case _: AvroGroupBatch.AvroFileInput => false
          case _ => pq.supportColumnarReads(p)
        }
    }
  }

  override def commit(end: StreamingOffset): Unit = ()
  override def stop(): Unit = ()
}

final case class GraftStreamOffset(snapshotId: Long) extends StreamingOffset {
  override def json: String = snapshotId.toString
}

/** Shared ReadLimit handling for the snapshot-lineage streams (the
  * append-only table stream and the CDC changelog stream): flatten a
  * possibly-composite limit into (file/snapshot cap, row budget) and
  * build the default limit from the configured options — ONE definition,
  * so limit semantics cannot diverge between the two streams. */
private[connector] object StreamReadLimits {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadLimit, ReadMaxFiles, ReadMaxRows}

  def flatten(l: ReadLimit): (Option[Int], Option[Long]) = l match {
    case mf: ReadMaxFiles => (Some(mf.maxFiles), None)
    case mr: ReadMaxRows => (None, Some(mr.maxRows))
    case c: CompositeReadLimit =>
      val parts = c.getReadLimits.toSeq.map(flatten)
      (parts.flatMap(_._1).minOption, parts.flatMap(_._2).minOption)
    case _ => (None, None)
  }

  def default(maxFiles: Option[Int], maxRows: Option[Long]): ReadLimit = {
    val lims = maxFiles.map(n => ReadLimit.maxFiles(n)).toSeq ++
      maxRows.map(n => ReadLimit.maxRows(n)).toSeq
    lims match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }
}

object GraftStreamOffset {
  /** Initial-offset sentinel: NOT a snapshot id. The Iceberg spec lets an
    * external writer pick any 64-bit snapshot id — including 0 — so the
    * sentinel must live outside the plausible id space ([[TableMetadata]]
    * parsing rejects a table that actually uses it). Using id 0 here
    * would re-plan a table whose frontier snapshot genuinely has id 0
    * from the table start, duplicating every row. */
  val BeforeAnySnapshot: Long = Long.MinValue
}

final class GraftScan(
    table: IcebergTable,
    filters: Array[Filter],
    requiredSchema: StructType,
    limit: Option[Int],
    precomputedFiles: Option[Seq[DataFileEntry]] = None,
    streamRef: String = "main",
    maxFilesPerTrigger: Option[Int] = None,
    reload: () => IcebergTable = null,
    maxRowsPerTrigger: Option[Long] = None)
    extends V1Scan with SupportsReportStatistics {

  /** Plan once: manifests are read a single time per query, shared by
    * statistics and execution. */
  private lazy val files: Seq[DataFileEntry] =
    precomputedFiles.getOrElse(table.planFiles(filters.toSeq))

  override def readSchema(): StructType = requiredSchema

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // the V1 bridge serves tables the NATIVE batch path cannot — for
    // streaming, only the APPEND-ONLY subset of those can follow a
    // frontier: declared-avro tables (per-window row-based batches) and
    // name-mapped tables stream fine; deletes / metadata-only partition
    // values / LIMIT / row-identity projections cannot
    val spark = org.apache.spark.sql.SparkSession.active
    require(streamRef.nonEmpty,
      "readStream with snapshot-id / as-of-timestamp is not supported: a " +
        "stream follows the live table (or a branch via the `branch` " +
        "option); a pinned snapshot has no append frontier to follow")
    def refuse(why: String): Nothing = throw new UnsupportedOperationException(
      s"streaming reads need an append-only table: $why; compact or " +
        "rewrite the table first")
    if (table.hasDeletes) refuse("this table carries v2 delete files")
    if (limit.nonEmpty) refuse("a LIMIT pushdown cannot follow a frontier")
    if (requiredSchema.fieldNames.exists(n =>
        n == "_file" || n == "_pos" || n == "_row_id" ||
          n == graft.iceberg.IcebergTable.LastUpdCol))
      refuse("_file/_pos/_row_id/_last_updated_sequence_number " +
        "row-identity projections are parquet-batch-only")
    if (table.missingPartitionColumns(spark, files).nonEmpty)
      refuse("partition values live only in metadata (re-injection is a " +
        "batch-plan shape)")
    // id-less PARQUET files resolve renames through name-mapping aliases
    // that the micro-batch parquet reader cannot apply — streaming them
    // would silently null renamed columns (avro windows are safe: their
    // reader resolves by field id / candidate names)
    val pq = files.filter(_.fileFormat.equalsIgnoreCase("PARQUET"))
    if (pq.nonEmpty && table.needsNameMapping(spark, pq))
      refuse("id-less parquet files need schema.name-mapping.default, " +
        "which the micro-batch reader cannot apply")
    // ORC has no row-capable micro-batch source here — refuse at
    // readStream time, not at the first trigger (a started-then-dead
    // stream leaves a checkpoint behind)
    if (files.exists(_.fileFormat.equalsIgnoreCase("ORC")))
      refuse("ORC files have no micro-batch reader; rewrite_data_files " +
        "them to parquet")
    new GraftMicroBatchStream(spark, table, requiredSchema, filters,
      streamRef, maxFilesPerTrigger, reload, maxRowsPerTrigger)
  }

  override def description(): String =
    s"GraftIcebergScan(files=${files.size}, pushed=${filters.mkString(", ")})"

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(files.map(_.fileSizeInBytes).sum)
    override def numRows(): OptionalLong =
      OptionalLong.of(files.map(_.recordCount).sum)
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](ctx: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = requiredSchema
      override def toString: String = description()
      /** false = buildScan returns InternalRow-encoded rows (the documented
        * fast path for sources that already produce Spark's internal
        * format): the inner vectorized parquet pipeline's UnsafeRows flow
        * straight into the parent plan with no external-Row
        * materialization — measured ~2x on full scans vs `df.rdd`. */
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] = {
        val spark = ctx.sparkSession
        // `_file`/`_pos` metadata columns ride the same row-identity
        // machinery merge-on-read uses (parquet `_metadata`, no extra IO).
        // A DATA column named `_file`/`_pos` shadows the metadata column
        // (Spark's conflict rule), so only non-schema names map.
        val dataCols = table.metadata.schema.fieldNames.toSet
        val isMetaCol = (n: String) =>
          (n == "_file" || n == "_pos" || n == "_row_id" ||
            n == graft.iceberg.IcebergTable.LastUpdCol) &&
            !dataCols.contains(n)
        val wantsRowId = requiredSchema.fieldNames
          .exists(n => isMetaCol(n) && (n == "_file" || n == "_pos"))
        val wantsLineage = requiredSchema.fieldNames
          .exists(n => isMetaCol(n) && (n == "_row_id" ||
            n == graft.iceberg.IcebergTable.LastUpdCol))
        var df = table.toDF(spark, filters.toSeq, precomputed = Some(files),
          keepIds = wantsRowId, keepLineage = wantsLineage)
        // Re-apply pushed predicates inside the inner plan so the parquet
        // reader gets footer/row-group pushdown as well (A9) — except on
        // columns whose field id shifted across schema evolution: the
        // inner plan's parquet pushdown matches by name and could prune
        // old files' same-named different-id columns. Spark re-evaluates
        // every pushed filter above this scan, so dropping them here
        // only costs pushdown, never correctness.
        val unsafe = table.metadata.idShiftedNames
        val residual = filters.toSeq
          .filter(_.references.forall(c => !unsafe.contains(c)))
          .flatMap(IcebergTable.filterToColumn)
        if (residual.nonEmpty) df = df.filter(residual.reduce(_ && _))
        df = df.select(requiredSchema.fieldNames.toSeq.map {
          case n if isMetaCol(n) && n == "_file" =>
            col(IcebergTable.FpCol).as("_file")
          case n if isMetaCol(n) && n == "_pos" =>
            col(IcebergTable.PosCol).as("_pos")
          case n => col(n) // data columns; `_row_id` arrives under its own name
        }: _*)
        limit.foreach(n => df = df.limit(n))
        df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
      }
    }.asInstanceOf[T]
}

/** Column-level statistics for the cost-based optimizer, served through
  * DSv2 `Statistics.columnStats` (Spark's `transformV2Stats` folds them
  * into catalyst `ColumnStat` when `spark.sql.cbo.enabled`):
  *
  *  - `nullCount` and `min`/`max` come from MANIFEST aggregates — always
  *    fresh, zero data IO. min/max follow the same soundness rules as the
  *    metadata-answered aggregates: `graft.exact-bounds` tables only,
  *    fixed-width never-truncated types, a bound on EVERY file. A column
  *    missing a stat on any file serves no value (unknown ≠ zero).
  *  - `distinctCount` / `avgLen` / `maxLen` come from the
  *    `graft.stats.*` table properties written by
  *    `CALL cat.system.analyze_table(...)` — one distributed
  *    approx-distinct pass, stored once, read every plan. NDV is capped
  *    by the current row count (an append after ANALYZE cannot push the
  *    estimate above what the table now holds; CBO stats are estimates
  *    by contract, so serving slightly-stale NDV is sound where serving
  *    a wrong MIN for a query ANSWER would not be).
  */
private[connector] object GraftColumnStats {
  import java.util.{Optional, OptionalLong}
  import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
  import org.apache.spark.sql.types._

  def build(table: IcebergTable, files: Seq[DataFileEntry],
            schema: StructType): java.util.Map[NamedReference, ColumnStatistics] = {
    val out = new java.util.HashMap[NamedReference, ColumnStatistics]()
    if (files.isEmpty) return out
    val props = table.metadata.properties
    val numRows = files.map(_.recordCount).sum
    val exact = props.get("graft.exact-bounds").contains("true")
    def longProp(k: String): Option[Long] =
      props.get(k).flatMap(v => scala.util.Try(v.toLong).toOption)
    // Spec-standard NDV source first: `statistics` entries' theta blobs,
    // whose mirrored `ndv` property serves without opening the Puffin
    // file (the same thing Iceberg's own planner reads); `graft.stats.*`
    // properties remain the pre-Puffin fallback. Entry selection is
    // SNAPSHOT-AWARE — statistics files are keyed to snapshots exactly
    // so a time-travel scan is not served a later analyze's numbers:
    // exact match on the scanned snapshot first, else the latest entry
    // at-or-before it in commit order (a stale-but-older estimate),
    // never a younger one.
    val statNdv: Map[Int, Long] = {
      val md = table.metadata
      val scanned = table.snapshot.map(_.snapshotId)
        .orElse(md.currentSnapshotId.filter(_ != -1L))
      val lineage = md.snapshotLineage
      val chosen = scanned.flatMap { sid =>
        md.statistics.find(_.snapshotId == sid).orElse {
          val pos = lineage.lastIndexOf(sid)
          if (pos < 0) None
          else {
            val visible = lineage.take(pos + 1).toSet
            md.statistics.filter(s => visible(s.snapshotId)).lastOption
          }
        }
      }.orElse(md.statistics.lastOption)
      chosen
        .map(_.blobs.filter(_.blobType == graft.iceberg.Puffin.ThetaBlobType)
          .flatMap(b => b.fields.headOption.flatMap(fid =>
            b.properties.get("ndv").flatMap(_.toLongOption).map(fid -> _)))
          .toMap)
        .getOrElse(Map.empty)
    }

    schema.fields.foreach { f =>
      val idOpt = table.metadata.fieldIds.get(f.name)
      val nulls: Option[Long] = idOpt.flatMap { id =>
        val per = files.map(_.nullValueCounts.get(id))
        if (per.exists(_.isEmpty)) None else Some(per.flatten.sum)
      }
      val mm: Option[(Any, Any)] = idOpt.flatMap { id =>
        f.dataType match {
          case dt @ (IntegerType | LongType | DateType | TimestampType |
                     TimestampNTZType) if exact =>
            // decode yields catalyst-internal forms (days Int, micros
            // Long) — exactly what ColumnStat.min/max store
            val lows = files.map(_.lowerBounds.get(id)
              .flatMap(graft.iceberg.SingleValue.decode(_, dt)))
            val highs = files.map(_.upperBounds.get(id)
              .flatMap(graft.iceberg.SingleValue.decode(_, dt)))
            if (lows.exists(_.isEmpty) || highs.exists(_.isEmpty)) None
            else {
              def num(a: Any): Long = a match {
                case i: Int => i.toLong
                case l: Long => l
              }
              Some((lows.flatten.minBy(num), highs.flatten.maxBy(num)))
            }
          case _ => None
        }
      }
      val ndv = idOpt.flatMap(statNdv.get)
        .orElse(longProp(s"graft.stats.ndv.${f.name}"))
        .map(math.min(_, numRows))
      val avgL = longProp(s"graft.stats.avglen.${f.name}")
      val maxL = longProp(s"graft.stats.maxlen.${f.name}")
      if (nulls.nonEmpty || mm.nonEmpty || ndv.nonEmpty ||
          avgL.nonEmpty || maxL.nonEmpty) {
        def ol(o: Option[Long]): OptionalLong =
          o.fold(OptionalLong.empty())(OptionalLong.of)
        out.put(Expressions.column(f.name), new ColumnStatistics {
          override def distinctCount(): OptionalLong = ol(ndv)
          override def min(): Optional[Object] =
            mm.fold(Optional.empty[Object]())(p =>
              Optional.of(p._1.asInstanceOf[Object]))
          override def max(): Optional[Object] =
            mm.fold(Optional.empty[Object]())(p =>
              Optional.of(p._2.asInstanceOf[Object]))
          override def nullCount(): OptionalLong = ol(nulls)
          override def avgLen(): OptionalLong = ol(avgL)
          override def maxLen(): OptionalLong = ol(maxL)
        })
      }
    }
    out
  }
}
