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

  private final class Sum(override val name: String,
                          override val description: String)
      extends CustomSumMetric

  val ManifestsTotal = "graft_manifests_total"
  val ManifestsKept = "graft_manifests_kept"
  val FilesStatic = "graft_files_planned"
  val FilesRuntimePruned = "graft_files_runtime_pruned"
  val RecordsPlanned = "graft_records_planned"
  val BytesPlanned = "graft_bytes_planned"

  /** Declared once per scan (Spark requires a fresh array per call). */
  def supported(): Array[CustomMetric] = Array(
    new Sum(ManifestsTotal, "data manifests in snapshot"),
    new Sum(ManifestsKept, "manifests surviving static pruning"),
    new Sum(FilesStatic, "data files the scan will read (after all pruning)"),
    new Sum(FilesRuntimePruned, "files pruned by runtime (join) filters"),
    new Sum(RecordsPlanned, "records in read files (manifest stats)"),
    new Sum(BytesPlanned, "bytes in read files (manifest stats)"))

  def taskMetric(metricName: String, v: Long): CustomTaskMetric =
    new CustomTaskMetric {
      override def name(): String = metricName
      override def value(): Long = v
    }
}
