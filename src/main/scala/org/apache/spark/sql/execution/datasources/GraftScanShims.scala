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

/** Access shim for `private[sql]` scan machinery: builds Spark's own
  * vectorized `ParquetScan` (whole-stage codegen, footer pushdown,
  * columnar batches) over a [[GraftPrunedFileIndex]]. This is the
  * execution engine behind the Iceberg DSv2 batch path — the library's
  * value-add is the file list, Spark's is the reading.
  */
object GraftScanShims {
  def parquetBatchScan(
      spark: SparkSession,
      files: Seq[(String, Long)],
      dataSchema: StructType,
      readSchema: StructType,
      pushedFilters: Array[Filter]): Scan = {
    val hconf = spark.sessionState.newHadoopConf()
    // Iceberg resolves columns by field id, not name — that is what makes
    // schema-evolution renames read old files correctly. Scoped to this
    // scan's hadoopConf; no session conf is touched.
    hconf.setBoolean("spark.sql.parquet.fieldId.read.enabled", true)
    ParquetScan(
      spark,
      hconf,
      new GraftPrunedFileIndex(spark, files),
      dataSchema,
      readSchema,
      StructType(Nil),
      pushedFilters,
      CaseInsensitiveStringMap.empty())
  }
}
