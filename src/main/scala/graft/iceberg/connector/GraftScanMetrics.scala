package graft.iceberg.connector

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** Custom DSv2 scan metrics: how much metadata pruning saved, surfaced in
  * the SQL UI next to the scan node. On a 100 TB table the interesting
  * number is rarely "rows read" — it is "how many of the 100k files did
  * planning DISCARD without touching them". Every value here is computed
  * from metadata the scan already holds (manifest list summaries, planned
  * entry stats), so reporting costs zero extra IO at any scale.
  */
object GraftScanMetrics {

  val ManifestsTotal = "graft_manifests_total"
  val ManifestsKept = "graft_manifests_kept"
  val FilesStatic = "graft_files_planned"
  val FilesRuntimePruned = "graft_files_runtime_pruned"
  val RecordsPlanned = "graft_records_planned"
  val BytesPlanned = "graft_bytes_planned"

  /** Declared once per scan (Spark requires a fresh array per call).
    * Each metric is its own TOP-LEVEL zero-arg class:
    * `SQLAppStatusListener` re-instantiates metric classes BY NAME to
    * aggregate task values for the UI, and a parameterized inner class
    * made that fail on every query end (logged SparkException, metrics
    * silently absent from the SQL tab). */
  def supported(): Array[CustomMetric] = Array(
    new ManifestsTotalMetric, new ManifestsKeptMetric,
    new FilesPlannedMetric, new FilesRuntimePrunedMetric,
    new RecordsPlannedMetric, new BytesPlannedMetric)

  def taskMetric(metricName: String, v: Long): CustomTaskMetric =
    new CustomTaskMetric {
      override def name(): String = metricName
      override def value(): Long = v
    }
}

final class ManifestsTotalMetric extends CustomSumMetric {
  override def name: String = GraftScanMetrics.ManifestsTotal
  override def description: String = "data manifests in snapshot"
}
final class ManifestsKeptMetric extends CustomSumMetric {
  override def name: String = GraftScanMetrics.ManifestsKept
  override def description: String = "manifests surviving static pruning"
}
final class FilesPlannedMetric extends CustomSumMetric {
  override def name: String = GraftScanMetrics.FilesStatic
  override def description: String =
    "data files the scan will read (after all pruning)"
}
final class FilesRuntimePrunedMetric extends CustomSumMetric {
  override def name: String = GraftScanMetrics.FilesRuntimePruned
  override def description: String = "files pruned by runtime (join) filters"
}
final class RecordsPlannedMetric extends CustomSumMetric {
  override def name: String = GraftScanMetrics.RecordsPlanned
  override def description: String = "records in read files (manifest stats)"
}
final class BytesPlannedMetric extends CustomSumMetric {
  override def name: String = GraftScanMetrics.BytesPlanned
  override def description: String = "bytes in read files (manifest stats)"
}
