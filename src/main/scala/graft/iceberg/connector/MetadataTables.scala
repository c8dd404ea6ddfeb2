package graft.iceberg.connector

import java.util.{Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.iceberg.IcebergTable

/** Iceberg metadata tables — `SELECT * FROM cat.ns.tbl.snapshots` /
  * `.files` / `.manifests`: the introspection surface every lakehouse
  * user reaches for first when debugging a table (what snapshots exist,
  * which files does the current one read, how are manifests laid out).
  *
  * Rows come from table metadata already parsed on the driver (manifest
  * lists, manifest entries), so a metadata query costs metadata IO only —
  * no data file is opened. Served through the same V1 relation bridge as
  * the main scan.
  */
object MetadataTables {

  val names: Set[String] = Set("snapshots", "files", "manifests")

  def forName(parent: String, kind: String, t: IcebergTable): Table = kind match {
    case "snapshots" => new GraftMetadataTable(s"$parent.snapshots",
      StructType(Seq(
        StructField("snapshot_id", LongType, nullable = false),
        StructField("committed_at_ms", LongType, nullable = false),
        StructField("manifest_list", StringType, nullable = false),
        StructField("is_current", BooleanType, nullable = false))),
      () => t.metadata.snapshots.map(s => Row(
        s.snapshotId, s.timestampMs, s.manifestList,
        t.metadata.currentSnapshotId.contains(s.snapshotId))))
    case "files" => new GraftMetadataTable(s"$parent.files",
      StructType(Seq(
        StructField("file_path", StringType, nullable = false),
        StructField("file_format", StringType, nullable = false),
        StructField("record_count", LongType, nullable = false),
        StructField("file_size_in_bytes", LongType, nullable = false),
        StructField("sequence_number", LongType, nullable = true),
        StructField("partition", StringType, nullable = true))),
      () => t.planFiles().map(f => Row(
        f.filePath, f.fileFormat, f.recordCount, f.fileSizeInBytes,
        f.sequenceNumber.map(Long.box).orNull,
        if (f.partition.isEmpty) null
        else f.partition.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(", "))))
    case "manifests" => new GraftMetadataTable(s"$parent.manifests",
      StructType(Seq(
        StructField("path", StringType, nullable = false),
        StructField("length", LongType, nullable = false),
        StructField("partition_spec_id", IntegerType, nullable = false),
        StructField("content", IntegerType, nullable = false),
        StructField("sequence_number", LongType, nullable = true),
        StructField("added_rows_count", LongType, nullable = true))),
      () => t.manifests.map(m => Row(
        m.path, m.length, m.partitionSpecId, m.content,
        m.sequenceNumber.map(Long.box).orNull,
        m.addedRowsCount.map(Long.box).orNull)))
    case other => throw new IllegalArgumentException(s"unknown metadata table $other")
  }
}

/** A small read-only table whose rows are computed on the driver at scan
  * time (fresh per query — metadata must not be stale).
  */
final class GraftMetadataTable(
    tableName: String,
    tableSchema: StructType,
    rows: () => Seq[Row]) extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = tableSchema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            ctx: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = tableSchema
            override def buildScan(): RDD[Row] =
              ctx.sparkSession.createDataFrame(
                rows().asJava, tableSchema).rdd
          }.asInstanceOf[T]
      }
    }
}
