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

  val names: Set[String] =
    Set("snapshots", "files", "data_files", "manifests", "refs", "history",
      "partitions", "delete_files", "entries", "all_entries", "all_files",
      "all_data_files", "all_delete_files", "all_manifests",
      "metadata_log_entries", "position_deletes", "changes")

  def forName(parent: String, kind: String, t: IcebergTable,
              /** fresh metadata fetch — the changelog STREAM re-loads per
                * batch, and a REST-cataloged table has no metadata.json on
                * disk to re-read; the catalog passes its own store-backed
                * reload */
              reload: () => IcebergTable = null): Table = kind match {
    // the CDC changelog relation (batch + readStream) — not a
    // driver-computed metadata view; see [[GraftChangelogTable]]
    case "changes" => new GraftChangelogTable(parent, t,
      reload = Option(reload).getOrElse(
        () => new IcebergTable(t.tableDir, t.conf)))
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
    // upstream-parity name: the CURRENT snapshot's live data files —
    // exactly what `files` serves here (delete files live under
    // `delete_files`, as upstream's files-table content split does)
    case "data_files" => forName(parent, "files", t, reload) match {
      case g: GraftMetadataTable => g.renamed(s"$parent.data_files")
    }
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
    // branches/tags with their pin — the WAP observability table ("is my
    // staged branch where I think it is?")
    case "refs" => new GraftMetadataTable(s"$parent.refs",
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("type", StringType, nullable = false),
        StructField("snapshot_id", LongType, nullable = false))),
      () => t.metadata.refs.toSeq.sortBy(_._1).map { case (name, sid) => Row(
        name, if (t.metadata.tagRefs.contains(name)) "TAG" else "BRANCH", sid) })
    // main's commit order (the snapshot-log): rollbacks append a repeat
    // entry, so history shows the true sequence of table states
    case "history" => new GraftMetadataTable(s"$parent.history",
      StructType(Seq(
        StructField("made_current_at_ms", LongType, nullable = true),
        StructField("snapshot_id", LongType, nullable = false),
        StructField("parent_id", LongType, nullable = true),
        StructField("is_current_ancestor", BooleanType, nullable = false))),
      () => {
        val byId = t.metadata.snapshots.map(s => s.snapshotId -> s).toMap
        val lineage = t.metadata.snapshotLineage
        val ancestors = {
          // walk parent ids back from the head: entries the current state
          // descends from (a rolled-back fork is history, not an ancestor)
          val head = t.metadata.currentSnapshotId.filter(_ != -1L)
          Iterator.iterate(head.flatMap(byId.get))(
            _.flatMap(_.parentSnapshotId).flatMap(byId.get))
            .takeWhile(_.isDefined).flatten
            .take(t.metadata.snapshots.size).map(_.snapshotId).toSet
        }
        lineage.map { sid => Row(
          byId.get(sid).map(s => Long.box(s.timestampMs)).orNull,
          sid,
          byId.get(sid).flatMap(_.parentSnapshotId).map(Long.box).orNull,
          ancestors.contains(sid)) }
      })
    // per-partition-tuple rollup of the CURRENT snapshot's live files —
    // data AND delete debt, all from manifest metadata (zero data IO):
    // "how big is each partition, and how much merge-on-read debt does
    // it carry" as one daily-driver query
    case "partitions" => new GraftMetadataTable(s"$parent.partitions",
      StructType(Seq(
        StructField("partition", StringType, nullable = true),
        StructField("spec_id", IntegerType, nullable = false),
        StructField("file_count", LongType, nullable = false),
        StructField("record_count", LongType, nullable = false),
        StructField("total_size_in_bytes", LongType, nullable = false),
        StructField("position_delete_file_count", LongType, nullable = false),
        StructField("position_delete_record_count", LongType, nullable = false),
        StructField("equality_delete_file_count", LongType, nullable = false),
        StructField("equality_delete_record_count", LongType, nullable = false))),
      // keyed by (tuple, spec): after partition evolution the same-named
      // value can mean different transforms under different specs — the
      // upstream `partitions` table splits them the same way. Delete
      // attribution, most-specific first: the entry's OWN manifest
      // partition tuple (foreign partition-scoped delete files); else
      // the REFERENCED data file's tuple (v3 deletion vectors and
      // single-target position deletes — this engine's native MoR
      // debt); else the null-partition row, which for multi-file v2
      // position deletes and equality deletes is semantically right —
      // they genuinely apply across partitions. A tuple carrying only
      // delete debt (data fully rewritten, debt not yet compacted)
      // still gets its row.
      () => {
        // spec `partition-statistics` fast path: when the CURRENT
        // snapshot has a stats file ([[graft.iceberg.PartitionStats]]),
        // serve it — one small parquet read, O(partitions), instead of
        // the O(files) manifest recompute below. Same rendering, same
        // rollup definition, so the two paths are bit-identical.
        val entries = t.metadata.currentSnapshotId.filter(_ != -1L)
          .flatMap(sid =>
            t.metadata.partitionStatistics.find(_.snapshotId == sid))
          .flatMap { e =>
            // a foreign/damaged stats file must DEGRADE to the manifest
            // recompute, never fail a query the fallback can answer
            try Some(graft.iceberg.PartitionStats.readFile(
              org.apache.spark.sql.SparkSession.active, t.resolve(e.path)))
            catch { case ex: Exception =>
              System.err.println(
                s"[graft] partitions: stats file ${e.path} unreadable " +
                  s"(${ex.getMessage}); recomputing from manifests")
              None
            }
          }
          .getOrElse(graft.iceberg.PartitionStats.rollup(t))
        entries.map(e => Row(e.partitionRepr, e.specId, e.dataFileCount,
          e.dataRecordCount, e.totalDataFileSizeInBytes,
          e.posDeleteFileCount, e.posDeleteRecordCount,
          e.eqDeleteFileCount, e.eqDeleteRecordCount))
      })
    // v2 delete files in force on the current snapshot — the merge-on-read
    // debt a compaction would materialize
    case "delete_files" => new GraftMetadataTable(s"$parent.delete_files",
      StructType(Seq(
        StructField("file_path", StringType, nullable = false),
        StructField("content", StringType, nullable = false),
        StructField("equality_field_ids", StringType, nullable = true),
        StructField("record_count", LongType, nullable = false),
        StructField("sequence_number", LongType, nullable = true))),
      () => t.planDeletes().map(d => Row(
        d.filePath,
        if (d.content == 1) "POSITION_DELETES" else "EQUALITY_DELETES",
        if (d.equalityIds.isEmpty) null else d.equalityIds.mkString(", "),
        d.recordCount,
        d.sequenceNumber.map(Long.box).orNull)))
    // every manifest entry of the current snapshot, UNFILTERED — DELETED
    // (status 2) entries included, which is how you answer "which commit
    // dropped this file" without diffing snapshots by hand
    case "entries" => new GraftMetadataTable(s"$parent.entries",
      StructType(Seq(
        StructField("status", IntegerType, nullable = false),
        StructField("sequence_number", LongType, nullable = true),
        StructField("content", IntegerType, nullable = false),
        StructField("file_path", StringType, nullable = false),
        StructField("file_format", StringType, nullable = false),
        StructField("record_count", LongType, nullable = false),
        StructField("file_size_in_bytes", LongType, nullable = false))),
      () => t.manifests.flatMap(m =>
        graft.iceberg.ManifestIO.readRawEntries(
          t.resolve(m.path), t.conf, m.sequenceNumber)
          .map(e => Row(e.status, e.sequenceNumber.map(Long.box).orNull,
            e.content, e.filePath, e.fileFormat, e.recordCount,
            e.fileSizeInBytes))))
    // manifests of EVERY snapshot, one row per (manifest, referencing
    // snapshot) — snapshot-lineage debugging ("which commits still pin
    // this manifest", the expire_snapshots pre-flight question)
    case "all_manifests" => new GraftMetadataTable(s"$parent.all_manifests",
      StructType(Seq(
        StructField("reference_snapshot_id", LongType, nullable = false),
        StructField("path", StringType, nullable = false),
        StructField("length", LongType, nullable = false),
        StructField("partition_spec_id", IntegerType, nullable = false),
        StructField("content", IntegerType, nullable = false),
        StructField("added_rows_count", LongType, nullable = true))),
      () => t.metadata.snapshots.flatMap(s =>
        graft.iceberg.ManifestIO.readManifestList(
          t.resolve(s.manifestList), t.conf)
          .map(m => Row(s.snapshotId, m.path, m.length, m.partitionSpecId,
            m.content, m.addedRowsCount.map(Long.box).orNull))))
    // distinct live files (data AND delete — both are what external
    // cleanup must NOT touch, matching upstream's all_files) across ALL
    // snapshots. Each DISTINCT manifest is read once: successive
    // snapshots share most manifests, so the naive per-snapshot plan
    // would re-read O(snapshots × manifests) Avro on a long-history
    // table where this shape reads O(manifests).
    case "all_files" => new GraftMetadataTable(s"$parent.all_files",
      AllFilesSchema, () => allFilesRows(t))
    // upstream-parity slices of the same distinct-manifest read
    case "all_data_files" => new GraftMetadataTable(s"$parent.all_data_files",
      AllFilesSchema, () => allFilesRows(t).filter(_.getInt(0) == 0))
    case "all_delete_files" => new GraftMetadataTable(
      s"$parent.all_delete_files",
      AllFilesSchema, () => allFilesRows(t).filter(_.getInt(0) != 0))
    // every manifest entry across ALL snapshots (each DISTINCT manifest
    // read once, like all_files) — the full audit trail incl. DELETED
    // (status 2) entries of manifests no longer referenced by head
    case "all_entries" => new GraftMetadataTable(s"$parent.all_entries",
      StructType(Seq(
        StructField("status", IntegerType, nullable = false),
        StructField("sequence_number", LongType, nullable = true),
        StructField("content", IntegerType, nullable = false),
        StructField("file_path", StringType, nullable = false),
        StructField("file_format", StringType, nullable = false),
        StructField("record_count", LongType, nullable = false),
        StructField("file_size_in_bytes", LongType, nullable = false))),
      () => t.metadata.snapshots
        .flatMap(s => graft.iceberg.ManifestIO.readManifestList(
          t.resolve(s.manifestList), t.conf))
        .groupBy(m => t.resolve(m.path)).toSeq.sortBy(_._1)
        .map { case (p, ms) => (p, ms.head) }
        .flatMap { case (p, m) =>
          graft.iceberg.ManifestIO.readRawEntries(p, t.conf, m.sequenceNumber)
            .map(e => Row(e.status, e.sequenceNumber.map(Long.box).orNull,
              e.content, e.filePath, e.fileFormat, e.recordCount,
              e.fileSizeInBytes)) })
    // the vN.metadata.json trail the filesystem committer leaves — the
    // spec's metadata-log, served from one directory listing (foreign
    // layouts that don't version metadata files just show no rows)
    case "metadata_log_entries" => new GraftMetadataTable(
      s"$parent.metadata_log_entries",
      StructType(Seq(
        StructField("timestamp_ms", LongType, nullable = false),
        StructField("file", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false))),
      () => try {
        val dir = new org.apache.hadoop.fs.Path(s"${t.tableDir}/metadata")
        val fs = dir.getFileSystem(t.conf)
        val re = "^v(\\d+)\\.metadata\\.json$".r
        fs.listStatus(dir).toSeq.flatMap { st =>
          st.getPath.getName match {
            case re(v) => Some((v.toInt, st))
            case _ => None
          }
        }.sortBy(_._1).map { case (v, st) =>
          Row(st.getModificationTime, st.getPath.toString, v) }
      } catch { case _: java.io.IOException => Nil })
    // the POSITION-DELETE tuples in force (v2 parquet files + v3 DVs
    // expanded) — rows come from a DISTRIBUTED read of the delete files,
    // not driver metadata: a 100 TB table's delete debt can be large
    case "position_deletes" =>
      val pdSchema = StructType(Seq(
        StructField("file_path", StringType, nullable = true),
        StructField("pos", LongType, nullable = true),
        StructField("delete_sequence_number", LongType, nullable = true)))
      new GraftDataFrameMetadataTable(
        s"$parent.position_deletes", pdSchema,
        spark => {
          import org.apache.spark.sql.functions.{col, lit, when}
          t.positionDeleteRows(spark, t.planDeletes().filter(_.content == 1))
            .map(_.select(col("__g_dfpn").as("file_path"),
              col("__g_dpos").as("pos"),
              // Long.MaxValue is positionDeleteRows' INTERNAL "applies
              // to everything" sentinel for entries without a recorded
              // sequence number — surface those as NULL, not garbage
              when(col("__g_delseq") === lit(Long.MaxValue), lit(null))
                .otherwise(col("__g_delseq"))
                .as("delete_sequence_number")))
            .getOrElse(spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], pdSchema))
        })
    case other => throw new IllegalArgumentException(s"unknown metadata table $other")
  }

  private val AllFilesSchema = StructType(Seq(
    StructField("content", IntegerType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("file_format", StringType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    // null for delete files (DeleteFileEntry tracks blob/content
    // size, not the container file's size)
    StructField("file_size_in_bytes", LongType, nullable = true),
    StructField("sequence_number", LongType, nullable = true)))

  /** Distinct live files (data AND delete — both are what external
    * cleanup must NOT touch, matching upstream's all_files) across ALL
    * snapshots. Each DISTINCT manifest is read once: successive
    * snapshots share most manifests, so the naive per-snapshot plan
    * would re-read O(snapshots × manifests) Avro on a long-history
    * table where this shape reads O(manifests). Shared by all_files and
    * its all_data_files / all_delete_files slices. */
  private def allFilesRows(t: IcebergTable): Seq[Row] = {
    val manifests = t.metadata.snapshots
      .flatMap(s => graft.iceberg.ManifestIO.readManifestList(
        t.resolve(s.manifestList), t.conf))
      .groupBy(m => t.resolve(m.path)).toSeq
      .map { case (p, ms) => (p, ms.head) }
    val dataRows = manifests.filter(_._2.content == 0)
      .flatMap { case (p, m) => graft.iceberg.ManifestIO
        .readManifest(p, t.conf, m.sequenceNumber, m.partitionSpecId)
        .map(f => (f.filePath, Row(0, f.filePath, f.fileFormat,
          f.recordCount, f.fileSizeInBytes,
          f.sequenceNumber.map(Long.box).orNull))) }
    val delRows = manifests.filter(_._2.content == 1)
      .flatMap { case (p, m) => graft.iceberg.ManifestIO
        .readDeleteManifest(p, t.conf, m.sequenceNumber)
        .map(d => (d.filePath, Row(d.content, d.filePath,
          d.fileFormat.getOrElse("PARQUET"), d.recordCount,
          null, d.sequenceNumber.map(Long.box).orNull))) }
    // the same file can be referenced by manifests of several
    // snapshots under DIFFERENT sequence numbers; `.head` of an
    // unordered group is nondeterministic across runs, so the
    // representative is pinned to the largest sequence number (the
    // most recent manifest's view; nulls sort first, so any known
    // sequence beats unknown)
    (dataRows ++ delRows).groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.maxBy(r => Option(r._2.get(5))
        .map(_.asInstanceOf[Long]).getOrElse(Long.MinValue))._2)
  }
}

/** A read-only metadata table whose rows come from a DataFrame built at
  * scan time — for metadata surfaces that must read data-scale inputs
  * (position-delete tuples) distributively instead of on the driver. */
final class GraftDataFrameMetadataTable(
    tableName: String,
    tableSchema: StructType,
    df: org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame)
    extends Table with SupportsRead {

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
            override def buildScan(): RDD[Row] = df(ctx.sparkSession).rdd
          }.asInstanceOf[T]
      }
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

  /** The same rows under another table name (upstream alias names). */
  private[connector] def renamed(newName: String): GraftMetadataTable =
    new GraftMetadataTable(newName, tableSchema, rows)

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
