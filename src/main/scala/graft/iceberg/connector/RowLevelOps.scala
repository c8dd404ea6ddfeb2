package graft.iceberg.connector

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import java.util.OptionalLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{MetadataBuilder, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.iceberg.{DataFileEntry, IcebergTable, IcebergWriter}

/** Group-based (copy-on-write) row-level operations: SQL `UPDATE`,
  * `MERGE INTO`, and `DELETE` with predicates equality deletes cannot
  * express. Spark's own analyzer rewrites (`RewriteUpdateTable`,
  * `RewriteMergeIntoTable`, `RewriteDeleteFromTable`) own ALL row
  * semantics — this class only supplies the two physical halves:
  *
  *  - a scan over the affected file GROUPS ([[GraftGroupScan]]): pushed
  *    command predicates are used exclusively for manifest/file-level
  *    pruning, NEVER as row filters — copy-on-write must read every row
  *    of a matched file (the non-matching ones are written back
  *    verbatim), so even parquet page-level skipping on the condition
  *    would silently drop rows;
  *  - a distributed replacement write ([[GraftReplaceWrite]]): executors
  *    stream the rewritten rows to parquet, and the driver commit swaps
  *    exactly the scanned files for the new ones in one snapshot
  *    ([[IcebergWriter.replaceFiles]]).
  *
  * At 100 TB the cost model is: files whose stats disprove the condition
  * are never read OR rewritten (static group pruning); the rest are
  * rewritten in full — the textbook copy-on-write trade. Equality
  * `DELETE`s never reach this path: Spark's
  * `OptimizeMetadataOnlyDeleteFromTable` routes them back to
  * [[SparkIcebergTable.deleteWhere]]'s merge-on-read delete files.
  *
  * The reference engine is read-only (SURVEY §2.C) — this is extension
  * surface, same as the INSERT path.
  */
final class GraftRowLevelOperationBuilder(
    tableName: String, table: IcebergTable, writable: Boolean,
    info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(tableName, table, writable, info.command)
}

final class GraftRowLevelOperation(
    tableName: String, table: IcebergTable, writable: Boolean,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  /** The scan Spark configured for this operation's `ReplaceData`
    * relation — the write's commit replaces exactly its planned file
    * set. Spark builds it once per operation (the runtime group-filter
    * subquery, if any, scans through the BASE table's regular builder,
    * not this one). */
  @volatile private var configuredScan: GraftGroupScan = _

  override def command(): RowLevelOperation.Command = cmd

  /** Analysis-time construction must not throw (every DELETE builds one
    * of these before the metadata-only optimization runs) — capability
    * guards live here, at scan-build time, reached only when a
    * copy-on-write rewrite is actually planned. */
  private def checkSupported(): Unit = {
    if (!writable || table.pinnedSnapshotId.nonEmpty)
      throw new UnsupportedOperationException(
        s"$tableName is read-only: ${cmd.name} needs a committable table " +
          "(not time-travel-pinned, not REST-backed)")
    if (table.hasDeletes)
      throw new UnsupportedOperationException(
        s"$tableName has outstanding v2 delete files: rewritten data files " +
          "would take a new sequence number and escape them, resurrecting " +
          s"deleted rows. Materialize deletes first (IcebergWriter.compact), "
          + s"then re-run the ${cmd.name}")
    val spark = SparkSession.active
    val missing = table.missingPartitionColumns(spark, table.planFiles())
    if (missing.nonEmpty)
      throw new UnsupportedOperationException(
        s"$tableName stores partition values only in metadata (columns " +
          s"${missing.mkString(", ")} absent from data files); rewriting " +
          "such files would lose them")
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
        with SupportsPushDownRequiredColumns {
      private var filters: Array[Filter] = Array.empty
      private var required: StructType = table.metadata.schema

      /** Report every filter as residual: for a group-based operation the
        * pushed condition is a pruning HINT (which groups can match), and
        * the rewrite plan re-derives row semantics itself. */
      override def pushFilters(fs: Array[Filter]): Array[Filter] = { filters = fs; fs }
      override def pushedFilters(): Array[Filter] = filters
      override def pruneColumns(s: StructType): Unit = required = s

      override def build(): Scan = {
        checkSupported()
        val scan = new GraftGroupScan(SparkSession.active, table, filters, required)
        configuredScan = scan
        scan
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GraftReplaceWrite(table, () => configuredScan, info.schema())
    }
}

/** The affected-group scan: Spark's vectorized parquet batch over the
  * statically pruned file list, with NO data filters handed to the
  * reader (see [[GraftRowLevelOperation]] — group semantics require every
  * row of every kept file). Statistics are reported so a MERGE's join
  * over this relation still gets broadcast/CBO decisions.
  */
final class GraftGroupScan(
    spark: SparkSession,
    table: IcebergTable,
    filters: Array[Filter],
    requiredSchema: StructType)
    extends Scan with SupportsReportStatistics {

  /** Planned once, immutable: the write commit and the executed scan must
    * agree on the exact file set. */
  val plannedFiles: Seq[DataFileEntry] = table.planFiles(filters.toSeq)

  private lazy val delegate: Scan =
    org.apache.spark.sql.execution.datasources.GraftScanShims.parquetBatchScan(
      spark,
      plannedFiles.map(f => (table.resolve(f.filePath), f.fileSizeInBytes)),
      table.metadata.schema, requiredSchema, pushedFilters = Array.empty)

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = delegate.toBatch

  override def description(): String =
    s"GraftGroupScan(files=${plannedFiles.size}, groupFilters=${filters.mkString(", ")})"

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(plannedFiles.map(_.fileSizeInBytes).sum)
    override def numRows(): OptionalLong =
      OptionalLong.of(plannedFiles.map(_.recordCount).sum)
  }
}

/** `Configuration` is not `Serializable`; it is `Writable`. Spark's own
  * wrapper is `private[spark]`, so this is the same three-liner on the
  * graft side. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = value.write(out)
  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[connector] final case class GraftFileCommit(
    path: String, rows: Long, bytes: Long) extends WriterCommitMessage

/** The replacement write: executors append rewritten rows to one parquet
  * file per task (lazily — an empty task emits no file), the driver
  * commit swaps the scan's planned files for the written ones in a
  * single snapshot. Field ids are stamped into the written schema so the
  * files survive field-id-based schema evolution like every other file
  * this library writes.
  */
final class GraftReplaceWrite(
    table: IcebergTable,
    scanRef: () => GraftGroupScan,
    writeSchema: StructType)
    extends Write {

  override def toBatch: BatchWrite = new BatchWrite {
    private val conf = SparkSession.active.sessionState.newHadoopConf()
    private val writeDir =
      s"${table.tableDir}/data/rlo-${java.util.UUID.randomUUID.toString.take(12)}"

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val ids = table.metadata.fieldIds
      val stamped = StructType(writeSchema.fields.map { f =>
        ids.get(f.name) match {
          case Some(id) => f.copy(metadata = new MetadataBuilder()
            .withMetadata(f.metadata).putLong("parquet.field.id", id.toLong).build())
          case None => f
        }
      })
      new GraftReplaceWriterFactory(writeDir, stamped, new SerializableHadoopConf(conf))
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val scan = scanRef()
      require(scan != null,
        "ReplaceData commit without a configured group scan")
      val added = messages.collect {
        case GraftFileCommit(p, rows, bytes) if p != null => (p, rows, bytes)
      }.toSeq
      IcebergWriter.replaceFiles(conf, table.tableDir,
        scan.plannedFiles.map(_.filePath).toSet, added)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(writeDir).getFileSystem(conf)
      fs.delete(new Path(writeDir), true)
    }
  }
}

final class GraftReplaceWriterFactory(
    writeDir: String, schema: StructType, conf: SerializableHadoopConf)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val path = s"$writeDir/part-$partitionId-$taskId.parquet"
      private var rows = 0L
      private var writer: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _
      /** `ReplaceData` rows arrive as `[__row_operation :: dataColumns]`
        * (Spark's group-based rewrites always prepend the operation
        * column, and with no metadata attributes requested the runtime
        * task does NOT strip it — `ReplaceDataExec.writingTask` projects
        * only on the metadata path). Skip it here with the same
        * projecting-row machinery Spark's own tasks use. */
      private val dataProj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
        schema, 1 to schema.length)

      override def write(row: InternalRow): Unit = {
        if (writer == null)
          writer = org.apache.spark.sql.execution.datasources.parquet
            .GraftParquetWriteShim.open(path, schema, conf.value)
        if (row.numFields == schema.length + 1) {
          dataProj.project(row)
          writer.write(dataProj)
        } else writer.write(row)
        rows += 1
      }

      override def commit(): WriterCommitMessage = {
        if (writer == null) return GraftFileCommit(null, 0L, 0L)
        writer.close()
        val p = new Path(path)
        val len = p.getFileSystem(conf.value).getFileStatus(p).getLen
        GraftFileCommit(path, rows, len)
      }

      override def abort(): Unit = {
        if (writer != null) {
          try writer.close() catch { case _: Exception => () }
          val p = new Path(path)
          try p.getFileSystem(conf.value).delete(p, false)
          catch { case _: Exception => () }
        }
      }

      override def close(): Unit = ()
    }
}
