package graft.iceberg

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.IncrementalView

/** Stored incremental materialized views over Iceberg tables — the SQL
  * face of the q90 maintenance algebra (`CALL cat.system.create_mv` /
  * `refresh_mv`), so a rollup that refreshes for the price of the day's
  * changes is an operator workflow, not a Scala program.
  *
  * The MV is itself an Iceberg table holding
  * [[IncrementalView.aggregateState]]'s schema, with its definition in
  * table properties (`graft.mv.source/keys/sums`) and its refresh
  * CURSOR — the source snapshot it reflects — carried in each refresh
  * snapshot's SUMMARY (`graft.mv.refreshed-through`). The cursor rides
  * the SAME commit that lands the folded state, so there is no window
  * where state and cursor disagree: a crash before the commit leaves the
  * old state + old cursor (refresh re-runs whole), after it the new
  * state + new cursor. A separate property commit would leave a
  * double-fold window in between.
  */
object MaterializedViews {

  val SourceProp = "graft.mv.source"
  val KeysProp = "graft.mv.keys"
  val SumsProp = "graft.mv.sums"
  /** Snapshot-summary key: the source snapshot this refresh reflects. */
  val CursorKey = "graft.mv.refreshed-through"

  private[iceberg] def parseSums(s: String): Seq[(String, String)] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { part =>
      part.split(":") match {
        case Array(v, out) => (v.trim, out.trim)
        case Array(v) => (v.trim, v.trim + "_sum")
        case _ => throw new IllegalArgumentException(
          s"malformed sum spec '$part' (want value:out)")
      }
    }

  /** The source snapshot the MV currently reflects: the youngest lineage
    * snapshot carrying the cursor (maintenance snapshots — compaction —
    * carry none and are skipped), else the create-time pin. */
  private[iceberg] def refreshedThrough(meta: TableMetadata): Long = {
    val byId = meta.snapshots.map(s => s.snapshotId -> s).toMap
    meta.snapshotLineage.reverse.iterator
      .flatMap(id => byId.get(id))
      .flatMap(_.summary.get(CursorKey).flatMap(_.toLongOption))
      .nextOption()
      .getOrElse(meta.properties.getOrElse(SourceSnapProp,
        throw new IllegalStateException(
          "not a graft MV: no refresh cursor and no " + SourceSnapProp))
        .toLong)
  }

  val SourceSnapProp = "graft.mv.snapshot"

  /** Seed state of `sourceDir`'s current snapshot + the MV definition,
    * ready to CTAS. Returns (state, pinned snapshot id). */
  def seed(spark: SparkSession, sourceDir: String, keys: Seq[String],
           sums: Seq[(String, String)]): (DataFrame, Long) = {
    val conf = spark.sessionState.newHadoopConf()
    val src = new IcebergTable(sourceDir, conf)
    val sid = src.metadata.snapshotLineage.lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"MV source $sourceDir has no snapshot yet"))
    (IncrementalView.aggregateState(
      src.atSnapshot(sid).toDF(spark), keys, sums), sid)
  }

  /** Fold the source changes since the last refresh into the stored MV —
    * one ledgered overwrite snapshot; a no-op (returns the unchanged
    * cursor with `refreshed = false`) when the source head has not
    * moved. */
  def refresh(spark: SparkSession, mvDir: String, sourceDir: String,
              committer: Option[TableCommitter] = None): (Long, Boolean) = {
    val conf = spark.sessionState.newHadoopConf()
    val mv = new IcebergTable(mvDir, conf)
    val props = mv.metadata.properties
    val keys = props.getOrElse(KeysProp, throw new IllegalStateException(
      s"$mvDir is not a graft MV (no $KeysProp property)"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sums = parseSums(props.getOrElse(SumsProp,
      throw new IllegalStateException(s"no $SumsProp property")))
    val from = refreshedThrough(mv.metadata)
    val src = new IcebergTable(sourceDir, conf)
    val head = src.metadata.snapshotLineage.lastOption.getOrElse(
      throw new IllegalStateException(
        s"MV source $sourceDir has no snapshot in its lineage — it was " +
          "created-then-emptied or its history was rewritten; reseed the " +
          "MV once the source has data (MaterializedViews.reseed)"))
    if (head == from) (from, false)
    else if (!src.metadata.snapshotLineage.contains(from))
      // the cursor snapshot was expired from the source's lineage
      // (expire_snapshots ran past it): changesBetween can never replay
      // that window again, so incremental refresh is permanently stuck —
      // name the way out instead of surfacing a bare changelog error
      throw new IllegalStateException(
        s"MV cursor snapshot $from is no longer in source $sourceDir's " +
          "lineage (expired or rewritten) — incremental refresh cannot " +
          "recover; call MaterializedViews.reseed to rebuild the MV from " +
          "the source head (full recompute, one overwrite snapshot)")
    else {
      val changes = src.changesBetween(spark, from, head)
      val next = IncrementalView.refresh(mv.toDF(spark), changes, keys, sums)
      IcebergWriter.overwrite(spark, mvDir, next,
        summary = Map(CursorKey -> head.toString), committer = committer)
      (head, true)
    }
  }

  /** Full rebuild of a stuck MV: recompute the aggregate state from the
    * source's CURRENT snapshot and land it as one cursor-carrying
    * overwrite — the recovery path when the refresh cursor's snapshot
    * has been expired from the source lineage (see [[refresh]]). The
    * definition (keys/sums) is read from the MV's own properties, so the
    * rebuilt state has the same shape every future [[refresh]] folds
    * into. Returns the new cursor snapshot id. */
  def reseed(spark: SparkSession, mvDir: String, sourceDir: String,
             committer: Option[TableCommitter] = None): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val mv = new IcebergTable(mvDir, conf)
    val props = mv.metadata.properties
    val keys = props.getOrElse(KeysProp, throw new IllegalStateException(
      s"$mvDir is not a graft MV (no $KeysProp property)"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sums = parseSums(props.getOrElse(SumsProp,
      throw new IllegalStateException(s"no $SumsProp property")))
    val src = new IcebergTable(sourceDir, conf)
    val head = src.metadata.snapshotLineage.lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"MV source $sourceDir has no snapshot yet"))
    val state = IncrementalView.aggregateState(
      src.atSnapshot(head).toDF(spark), keys, sums)
    IcebergWriter.overwrite(spark, mvDir, state,
      summary = Map(CursorKey -> head.toString), committer = committer)
    head
  }
}
