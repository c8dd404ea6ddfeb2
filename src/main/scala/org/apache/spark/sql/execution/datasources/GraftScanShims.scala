package org.apache.spark.sql.execution.datasources

import scala.collection.mutable.LinkedHashMap

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A `PartitioningAwareFileIndex` over an explicit, already-planned file
  * list: sizes come from Iceberg manifest metadata, so constructing it
  * performs ZERO filesystem calls — unlike `InMemoryFileIndex`, which
  * would stat every path on the driver (prohibitive at 100k+ files).
  * Partition handling is empty by design: the planner injects this index
  * only when partition source columns are materialized in the data files.
  */
final class GraftPrunedFileIndex(
    spark: SparkSession,
    files: Seq[(String, Long)]) // (resolved path, size in bytes)
  extends PartitioningAwareFileIndex(spark, Map.empty, None, NoopCache) {

  // Qualify paths (scheme + authority) exactly as the parent's lookups
  // do — `allFiles()` resolves against `fs.makeQualified(rootPath)`, so an
  // unqualified `/x/y` would never match its own `file:/x/y` key. One
  // FileSystem handle hoisted for the whole list; makeQualified itself is
  // purely syntactic (no RPC).
  private val statuses: Seq[FileStatus] =
    if (files.isEmpty) Nil
    else {
      val hconf = spark.sessionState.newHadoopConf()
      val fs = new Path(files.head._1).getFileSystem(hconf)
      files.map { case (p, len) =>
        new FileStatus(len, false, 1, 134217728L, 0L, fs.makeQualified(new Path(p)))
      }
    }

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  // lazy: the planner consults these several times per scan; at 100k+
  // files rebuilding the maps per call is real driver CPU
  private lazy val leafFileMap: LinkedHashMap[Path, FileStatus] = {
    val m = LinkedHashMap.empty[Path, FileStatus]
    statuses.foreach(s => m.put(s.getPath, s))
    m
  }
  private lazy val leafDirMap: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).view.mapValues(_.toArray).toMap

  override protected def leafFiles: LinkedHashMap[Path, FileStatus] = leafFileMap
  override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] = leafDirMap

  override def rootPaths: Seq[Path] = statuses.map(_.getPath)

  override def refresh(): Unit = ()
}

/** A [[FilePartition]] that also reports the Iceberg partition tuple its
  * files belong to (`HasPartitionKey`) — the unit of storage-partitioned
  * join planning. Spark's `FilePartitionReaderFactory` pattern-matches on
  * `FilePartition`, so subclassing keeps the vectorized parquet reader
  * path unchanged while `BatchScanExec` groups tasks by `partitionKey`.
  */
final class KeyedFilePartition(
    idx: Int,
    fs: Array[PartitionedFile],
    key: org.apache.spark.sql.catalyst.InternalRow)
  extends FilePartition(idx, fs)
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow = key
}

/** Access shim for `private[sql]` scan machinery: builds Spark's own
  * vectorized `ParquetScan` (whole-stage codegen, footer pushdown,
  * columnar batches) over a [[GraftPrunedFileIndex]]. This is the
  * execution engine behind the Iceberg DSv2 batch path — the library's
  * value-add is the file list, Spark's is the reading.
  */
object GraftScanShims {

  /** Catalyst predicate → data-source `Filter`, when expressible —
    * `DataSourceStrategy.translateFilter` is `private[sql]`, so the
    * procedure surface (`rewrite_data_files(where => …)`) reaches it
    * through this shim. Untranslatable conjuncts drop out, which for
    * FILE SELECTION is conservative (more files rewritten, none lost). */
  def translateFilters(condition: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.sources.Filter] = {
    def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(condition).flatMap(
      DataSourceStrategy.translateFilter(_, supportNestedPredicatePushdown = true))
  }

  /** Input partitions for a storage-partitioned scan: one or more
    * [[KeyedFilePartition]]s per Iceberg partition tuple. Files still
    * split at `maxSplitBytes` and bin-pack WITHIN their tuple group
    * (Spark's own packing), so parallelism survives when the reported
    * partitioning goes unused; `BatchScanExec` re-groups same-key
    * partitions when a join does use it. Sizes come from manifest
    * metadata — zero filesystem calls, same as [[GraftPrunedFileIndex]].
    *
    * `groups`: (partition-key row, files as (resolved path, bytes)).
    */
  def keyedFilePartitions(
      spark: SparkSession,
      groups: Seq[(org.apache.spark.sql.catalyst.InternalRow, Seq[(String, Long)])])
      : Array[org.apache.spark.sql.connector.read.InputPartition] = {
    import org.apache.spark.sql.catalyst.InternalRow
    val openCost = spark.sessionState.conf.filesOpenCostInBytes
    val maxSplit = FilePartition.maxSplitBytes(spark,
      groups.iterator.flatMap(_._2).map(_._2 + openCost).sum)
    val hconf = spark.sessionState.newHadoopConf()
    val fsHandle =
      groups.headOption.flatMap(_._2.headOption)
        .map(f => new Path(f._1).getFileSystem(hconf))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.connector.read.InputPartition]
    groups.foreach { case (key, files) =>
      val chunks = files.flatMap { case (p, len) =>
        val q = org.apache.spark.paths.SparkPath
          .fromPath(fsHandle.get.makeQualified(new Path(p)))
        (0L until math.max(len, 1L) by maxSplit).map { off =>
          PartitionedFile(InternalRow.empty, q, off,
            math.min(maxSplit, len - off), Array.empty, 0L, len)
        }
      }
      FilePartition.getFilePartitions(spark, chunks, maxSplit).foreach { fp =>
        out += new KeyedFilePartition(out.size, fp.files, key)
      }
    }
    out.toArray
  }
  def parquetBatchScan(
      spark: SparkSession,
      files: Seq[(String, Long)],
      dataSchema: StructType,
      readSchema: StructType,
      pushedFilters: Array[Filter],
      /** catalog-vended per-table Hadoop overrides (storage
        * credentials); scoped to this scan's conf like the field-id
        * flag below */
      confOverrides: Map[String, String] = Map.empty): Scan = {
    val hconf = spark.sessionState.newHadoopConf()
    // Iceberg resolves columns by field id, not name — that is what makes
    // schema-evolution renames read old files correctly. Scoped to this
    // scan's hadoopConf; no session conf is touched.
    hconf.setBoolean("spark.sql.parquet.fieldId.read.enabled", true)
    confOverrides.foreach { case (k, v) => hconf.set(k, v) }
    ParquetScan(
      spark,
      hconf,
      new GraftPrunedFileIndex(spark, files),
      graft.iceberg.DefaultValues.relaxForRead(dataSchema),
      graft.iceberg.DefaultValues.relaxForRead(readSchema),
      StructType(Nil),
      pushedFilters,
      CaseInsensitiveStringMap.empty())
  }

  /** The ORC twin of [[parquetBatchScan]]: Spark's vectorized `OrcScan`
    * over an explicit file list. ORC resolves columns BY NAME (no field
    * ids exist in the format) — callers own the rename-safety guard, the
    * same stance the V1 ORC read path takes. */
  def orcBatchScan(
      spark: SparkSession,
      files: Seq[(String, Long)],
      dataSchema: StructType,
      readSchema: StructType,
      pushedFilters: Array[Filter],
      confOverrides: Map[String, String] = Map.empty): Scan =
    org.apache.spark.sql.execution.datasources.v2.orc.OrcScan(
      spark,
      locally {
        val hconf = spark.sessionState.newHadoopConf()
        confOverrides.foreach { case (k, v) => hconf.set(k, v) }
        hconf
      },
      new GraftPrunedFileIndex(spark, files),
      graft.iceberg.DefaultValues.relaxForRead(dataSchema),
      graft.iceberg.DefaultValues.relaxForRead(readSchema),
      StructType(Nil),
      CaseInsensitiveStringMap.empty(),
      None,
      pushedFilters)

  /** One [[org.apache.spark.sql.connector.read.InputPartition]] of a
    * [[unionBatch]]: remembers which child batch planned it so the
    * factory can route it back to that child's reader. */
  final case class TaggedInputPartition(
      tag: Int, inner: org.apache.spark.sql.connector.read.InputPartition)
    extends org.apache.spark.sql.connector.read.InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  private final class TaggedReaderFactory(
      factories: Seq[org.apache.spark.sql.connector.read.PartitionReaderFactory],
      allColumnar: Boolean)
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
    override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
        : org.apache.spark.sql.connector.read.PartitionReader[
          org.apache.spark.sql.catalyst.InternalRow] = {
      val t = p.asInstanceOf[TaggedInputPartition]
      factories(t.tag).createReader(t.inner)
    }
    override def createColumnarReader(
        p: org.apache.spark.sql.connector.read.InputPartition)
        : org.apache.spark.sql.connector.read.PartitionReader[
          org.apache.spark.sql.vectorized.ColumnarBatch] = {
      val t = p.asInstanceOf[TaggedInputPartition]
      factories(t.tag).createColumnarReader(t.inner)
    }
    // UNIFORM vote, not per-partition routing: `BatchScanExec` requires
    // every partition of one scan to agree on row-vs-columnar, so a mixed
    // parquet+ORC set where vectorization support diverges (nested types,
    // enableVectorizedReader differences) must degrade the WHOLE scan to
    // row-based reads — every file factory supports createReader — rather
    // than fail at execution with the opaque mixed-partition error.
    override def supportColumnarReads(
        p: org.apache.spark.sql.connector.read.InputPartition): Boolean =
      allColumnar
  }

  /** A DataFrame over a DSv2 [[org.apache.spark.sql.connector.catalog.Table]]
    * WITHOUT a catalog registration — the relation Spark's runtime
    * filtering machinery (dynamic partition pruning, AQE broadcast
    * reuse) operates on. `Dataset.ofRows` is `private[sql]`, hence this
    * shim's package. */
  def dsv2DataFrame(
      spark: SparkSession,
      table: org.apache.spark.sql.connector.catalog.Table)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        .create(table, None, None))

  /** Concatenate several Batches into one (a mixed parquet+ORC file set
    * behind a single DSv2 scan): partitions are tagged with their source
    * batch and routed back to that batch's reader factory on executors.
    * Row-vs-columnar is decided ONCE for the whole union at factory-
    * creation time (columnar only when EVERY child factory supports it
    * for EVERY partition; row-based otherwise), because `BatchScanExec`
    * refuses mixed row/columnar partition sets. */
  def unionBatch(batches: Seq[org.apache.spark.sql.connector.read.Batch])
      : org.apache.spark.sql.connector.read.Batch =
    new org.apache.spark.sql.connector.read.Batch {
      // planned once and reused: the factory's columnar vote must be
      // computed over the exact partition set Spark executes
      private lazy val parts
          : Array[org.apache.spark.sql.connector.read.InputPartition] =
        batches.zipWithIndex.flatMap { case (b, i) =>
          b.planInputPartitions().map(p => TaggedInputPartition(i, p))
        }.toArray
      override def planInputPartitions()
          : Array[org.apache.spark.sql.connector.read.InputPartition] = parts
      override def createReaderFactory()
          : org.apache.spark.sql.connector.read.PartitionReaderFactory = {
        val factories = batches.map(_.createReaderFactory())
        val allColumnar = parts.nonEmpty && parts.forall { p =>
          val t = p.asInstanceOf[TaggedInputPartition]
          factories(t.tag).supportColumnarReads(t.inner)
        }
        new TaggedReaderFactory(factories, allColumnar)
      }
    }
}
