package graft.iceberg.connector

import java.util.{Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => StreamingOffset}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.iceberg.IcebergTable

/** `cat.ns.tbl.changes` — the table's CDC changelog as a readable
  * relation, batch AND streaming:
  *
  *  - `SELECT * FROM cat.ns.t.changes` = the full-history
  *    [[IcebergTable.changesBetween]] rows (insert/delete typed, with
  *    `_commit_snapshot_id` / `_change_ordinal` attribution). The
  *    `start-snapshot-id` read option bounds BATCH reads too — the same
  *    "changes after this snapshot" meaning as on the stream, so a
  *    reader reusing its streaming options gets the same window;
  *  - `spark.readStream.table("cat.ns.t.changes")` = a micro-batch
  *    stream whose every batch is the change rows of the snapshot window
  *    since the last frontier — INCLUDING deletes, updates (as their
  *    delete+insert halves), and merge-on-read rows, which the
  *    append-only table stream ([[GraftMicroBatchStream]]) refuses by
  *    contract. Offsets are the same lineage-positioned snapshot ids,
  *    so checkpoints restart mid-history exactly.
  *
  * Execution shape: each micro-batch materializes the window's
  * `changesBetween` READ PLAN on the driver and ships it through the
  * shuffle-free RDD bridge (the row-level scan's mechanism,
  * [[GraftRddBridgeReaderFactory]]) — narrow scans of the window's
  * added/removed files plus broadcast delete-application joins, IO ∝
  * change volume. A window whose delete set outgrows the broadcast
  * threshold plans a shuffle and is REFUSED loudly (use the batch
  * changelog for bulk backfill) rather than executed wrongly.
  */
final class GraftChangelogTable(
    tableName: String,
    table: IcebergTable) extends Table with SupportsRead {

  /** The changelog schema: the table's columns + change attribution
    * (the exact column set/order `changesBetween` emits). */
  val changeSchema: StructType = StructType(table.metadata.schema.fields ++ Seq(
    StructField("_change_type", StringType, nullable = false),
    StructField("_commit_snapshot_id", LongType, nullable = false),
    StructField("_change_ordinal", IntegerType, nullable = false)))

  override def name(): String = tableName
  override def schema(): StructType = changeSchema

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // admission control: at most N window SNAPSHOTS per micro-batch
    // (commit-granular — summaries carry no per-commit file counts to
    // weight by, and a commit is never split). Without it the first
    // batch is the whole pending history — on a long-lived table one
    // batch replaying everything.
    val maxSnapshots = Option(options.get("maxSnapshotsPerTrigger")).map { v =>
      val n = v.toInt
      require(n > 0, s"maxSnapshotsPerTrigger must be positive, got $n")
      n
    }
    // start the stream AFTER this snapshot instead of from table start
    // (the checkpoint-less "resume from here" upstream streams offer)
    val startSnapshot = Option(options.get("start-snapshot-id")).map(_.toLong)
    new ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      // column pruning, BATCH path only: a CDC consumer projecting
      // (key, _change_type) pushes the pruned schema through
      // changesBetween's select into Catalyst's own scan-level pruning
      // (the change plan is narrow scans + broadcast joins, so the
      // projection reaches the parquet readers). Spark 4.1's
      // MicroBatchExecution builds the streaming scan WITHOUT the
      // pushdown rule (newScanBuilder(options).build()
      // .toMicroBatchStream — pruneColumns is never called on that
      // path), so the STREAM always ships full change rows and Spark
      // projects above the scan; the stream therefore takes the full
      // schema below, deliberately.
      private var pruned: StructType = changeSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        // keep the declared order; Spark may request columns reordered
        pruned = StructType(changeSchema.fields.filter(f =>
          requiredSchema.fieldNames.contains(f.name)))
      override def build(): Scan = new V1Scan {
        private val scanSchema = pruned
        override def readSchema(): StructType = scanSchema
        /** Batch: full-history changes through the V1 relation bridge
          * (plans like any DataFrame — shuffles allowed here). */
        override def toV1TableScan[T <: BaseRelation with TableScan](
            ctx: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = scanSchema
            override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
              val t = new IcebergTable(table.tableDir, table.conf)
              val head = t.metadata.snapshotLineage.lastOption.getOrElse(0L)
              val df = t.changesBetween(ctx.sparkSession,
                startSnapshot.getOrElse(0L), head)
              // df(name), not col(name): a column name containing dots
              // must resolve as the column, never nested-field access
              df.select(scanSchema.fieldNames.toSeq.map(df(_)): _*).rdd
            }
          }.asInstanceOf[T]
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftChangelogMicroBatchStream(table, changeSchema,
            maxSnapshots, startSnapshot)
      }
    }
  }
}

/** Micro-batch CDC source over the snapshot lineage: offsets carry
  * snapshot ids ordered by lineage POSITION (ids themselves carry no
  * order), identical to the append-only stream's offset model — the two
  * sources' checkpoints are interchangeable in meaning, only the row
  * semantics differ. Follows `main`. */
final class GraftChangelogMicroBatchStream(
    table: IcebergTable,
    /** the FULL changelog schema — the stream always ships full change
      * rows (Spark's micro-batch planner applies no column pushdown;
      * see the ScanBuilder note) and drift-validates against this */
    changeSchema: StructType,
    /** `maxSnapshotsPerTrigger`: at most N window snapshots per batch
      * (commit-granular admission control; always ≥1 so progress is
      * guaranteed and a commit is never split across batches). */
    maxSnapshotsPerTrigger: Option[Int] = None,
    /** `start-snapshot-id`: stream changes AFTER this snapshot instead
      * of the whole table history. Must still be in the lineage when
      * the first batch plans — validated there, loudly. */
    startSnapshotId: Option[Long] = None) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles}

  private def fresh(): IcebergTable =
    new IcebergTable(table.tableDir, table.conf)

  private def head(t: IcebergTable): Long =
    t.metadata.currentSnapshotId.filter(_ != -1L)
      .getOrElse(GraftStreamOffset.BeforeAnySnapshot)

  /** AvailableNow pins the drain target at prepare time, so commits
    * landing mid-drain don't extend the run (same contract as the
    * append-only stream). */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(head(fresh()))

  /** ReadMaxFiles is the carrier (there is no ReadMaxSnapshots); the
    * unit here is SNAPSHOTS, interpreted by [[latestOffset]] below. */
  override def getDefaultReadLimit: ReadLimit =
    maxSnapshotsPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  override def reportLatestOffset(): StreamingOffset =
    GraftStreamOffset(availableNowTarget.getOrElse(head(fresh())))

  override def latestOffset(start: StreamingOffset, limit: ReadLimit): StreamingOffset = {
    val t = fresh()
    val headId = availableNowTarget.getOrElse(head(t))
    limit match {
      case mf: ReadMaxFiles =>
        val s = start.asInstanceOf[GraftStreamOffset].snapshotId
        if (headId == s || headId == GraftStreamOffset.BeforeAnySnapshot)
          return GraftStreamOffset(headId)
        val lineage = t.metadata.snapshotLineage
        val sPos = lineagePos(lineage, s, "start")
        val hPos = lineagePos(lineage, headId, "end")
        if (hPos <= sPos) return GraftStreamOffset(headId) // rollback window
        GraftStreamOffset(lineage(math.min(hPos, sPos + mf.maxFiles) - 1))
      case _ => GraftStreamOffset(headId)
    }
  }

  private def lineagePos(lineage: Seq[Long], id: Long, which: String): Int =
    if (id == GraftStreamOffset.BeforeAnySnapshot) 0
    else lineage.lastIndexOf(id) match {
      case -1 => throw new IllegalStateException(
        s"changelog streaming $which offset: snapshot $id is no longer " +
          s"in the table's snapshot lineage — it was expired or the " +
          "history was rewritten; this checkpoint (or start-snapshot-id) " +
          "cannot be resumed safely. Restart from a fresh frontier.")
      case i => i + 1
    }

  override def initialOffset(): StreamingOffset =
    GraftStreamOffset(startSnapshotId
      .getOrElse(GraftStreamOffset.BeforeAnySnapshot))

  override def latestOffset(): StreamingOffset = GraftStreamOffset(head(fresh()))

  override def deserializeOffset(json: String): StreamingOffset =
    GraftStreamOffset(json.trim.toLong)

  override def commit(end: StreamingOffset): Unit = ()
  override def stop(): Unit = ()

  /** The window's change plan, built per batch on the driver; the
    * reader factory ships it to executors via the RDD bridge. Batches
    * plan then execute sequentially, so one slot suffices. */
  @volatile private var currentRdd: org.apache.spark.rdd.RDD[InternalRow] = _

  override def planInputPartitions(
      start: StreamingOffset, end: StreamingOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].snapshotId
    val e = end.asInstanceOf[GraftStreamOffset].snapshotId
    if (e == s || e == GraftStreamOffset.BeforeAnySnapshot)
      return Array.empty
    val spark = org.apache.spark.sql.SparkSession.active
    val t = fresh()
    // a schema evolved mid-stream would change the emitted row shape
    // under the fixed scan schema — refuse loudly, restart picks it up
    require(StructType(t.metadata.schema.fields) ==
        StructType(changeSchema.fields.dropRight(3)),
      s"changelog stream over ${table.tableDir}: the table schema " +
        "evolved mid-stream — restart the stream to adopt the new schema")
    val from = if (s == GraftStreamOffset.BeforeAnySnapshot) 0L else s
    val df = t.changesBetween(spark, from, e)
    val rdd = df.queryExecution.toRdd
    GraftRddBridge.assertNoShuffle(rdd,
      s"changelog stream window [$from, $e] planned a SHUFFLE " +
        "(a delete set beyond the broadcast threshold): the " +
        "micro-batch bridge cannot execute it — drain the backlog " +
        "with the batch changelog (changesBetween / SELECT FROM " +
        "t.changes) and restart the stream past it")
    currentRdd = rdd
    rdd.partitions.map(p => GraftRddBridgePartition(p): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val rdd = currentRdd
    require(rdd != null, "changelog stream: no planned window")
    new GraftRddBridgeReaderFactory(rdd)
  }
}
