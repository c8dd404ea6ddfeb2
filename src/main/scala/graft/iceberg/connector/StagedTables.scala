package graft.iceberg.connector

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.iceberg.{CommitConflictException, IcebergTable, IcebergWriter,
  MetadataCommit, PartitionField, TableCommitter, TableMetadata}

/** [[TableCommitter]] over an IN-MEMORY metadata document: the staged
  * write of an atomic CREATE/REPLACE ... AS SELECT plans and "commits"
  * against this buffer — requirements are checked and updates applied to
  * the in-memory root exactly like a real committer, but nothing becomes
  * durable; the recorded (requirements, updates) stream is replayed as
  * ONE real commit by `commitStagedChanges`. Data/manifest files are
  * still written (under the staging directory) — only the metadata
  * pointer move is deferred.
  */
private[graft] final class BufferingCommitter(
    val tableDir: String,
    val conf: Configuration,
    baseRootJson: String,
    override val vended: Map[String, String] = Map.empty)
    extends TableCommitter {

  private val mapper = new ObjectMapper()
  private var root: ObjectNode =
    mapper.readTree(baseRootJson).asInstanceOf[ObjectNode]

  val recordedRequirements: mutable.Buffer[JsonNode] = mutable.Buffer.empty
  val recordedUpdates: mutable.Buffer[JsonNode] = mutable.Buffer.empty

  override def currentRoot(m: ObjectMapper): ObjectNode =
    synchronized(root.deepCopy())

  override def currentMetadata(): TableMetadata =
    synchronized(TableMetadata.fromJson(mapper.writeValueAsString(root)))

  override def commit(requirements: Seq[JsonNode],
                      updates: Seq[JsonNode]): Unit = synchronized {
    MetadataCommit.checkRequirements(root, requirements).foreach(err =>
      throw new CommitConflictException(
        s"staged commit to $tableDir rejected: $err"))
    root = MetadataCommit.applyUpdates(mapper, root, updates)
    recordedRequirements ++= requirements
    recordedUpdates ++= updates
  }
}

/** The DSv2 staged table: Spark writes the CTAS/RTAS query into it like
  * any table (the inner [[SparkIcebergTable]] plans against the staging
  * directory with a [[BufferingCommitter]]), then calls
  * `commitStagedChanges` — the ONE atomic publish — or
  * `abortStagedChanges`, which removes the staged files and leaves the
  * catalog exactly as it was. */
private[graft] final class GraftStagedTable(
    inner: SparkIcebergTable,
    doCommit: () => Unit,
    doAbort: () => Unit) extends StagedTable with SupportsWrite {

  /** Test seams: the staging directory and buffering committer, so a
    * spec can drive the staged write directly and interleave rival
    * commits between stage and publish. */
  private[graft] def stagedDirForTest: String = inner.table.tableDir
  private[graft] def committerForTest: TableCommitter =
    inner.committerOpt.get

  override def name(): String = inner.name()
  override def schema(): org.apache.spark.sql.types.StructType = inner.schema()
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] =
    inner.partitioning()
  override def properties(): java.util.Map[String, String] = inner.properties()
  override def capabilities(): java.util.Set[TableCapability] =
    inner.capabilities()
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    inner.newWriteBuilder(info)

  override def commitStagedChanges(): Unit = doCommit()
  override def abortStagedChanges(): Unit = doAbort()
}

/** Orchestration of atomic CREATE / REPLACE / CREATE OR REPLACE TABLE
  * (AS SELECT) over a [[CatalogStore]] — what [[GraftCatalog]]'s
  * `StagingTableCatalog` methods delegate to.
  *
  * Shape (both stores): stage a metadata base whose `location` is a
  * fresh `_staged/<uuid>` directory UNDER the table's real location, let
  * Spark run the write against it through a [[BufferingCommitter]]
  * (files land in the staging dir; nothing visible), then publish ONE
  * commit:
  *
  *  - CREATE: the REST spec's staged-create form — `assert-create` +
  *    the update list that builds the table from
  *    [[MetadataCommit.stagedCreateSeed]] (assign-uuid … set-properties)
  *    followed by the recorded snapshot updates. The FS store applies
  *    the same list locally and publishes with exclusive-create of
  *    `v0.metadata.json`; a mid-write failure leaves NO table.
  *  - REPLACE: one commit on the live table carrying the DDL updates
  *    (new schema with FRESH field ids continuing from last-column-id —
  *    old data files stay readable via each snapshot's recorded
  *    schema-id — new partition spec, property overlay, sort-order
  *    reset) plus the recorded snapshot updates. Until it lands, readers
  *    see the old table; a failure leaves it untouched. Rival commits
  *    surface as [[CommitConflictException]] and are retried with a
  *    re-sequenced snapshot id; rival SCHEMA/SPEC evolution aborts
  *    loudly (the staged files carry predicted ids that no longer hold).
  */
private[connector] object StagedTables {

  /** Bounded optimistic retries of the REPLACE publish. */
  private val MaxPublishAttempts = 5

  private def fullName(catalogName: String, ns: Seq[String],
                       name: String): String =
    (catalogName +: ns :+ name).mkString(".")

  /** The staged inner table + buffering committer over a [[StagedBase]]. */
  private def stagedInner(display: String, base: StagedBase)
      : (SparkIcebergTable, BufferingCommitter) = {
    val buffering = new BufferingCommitter(base.stagedDir, base.conf,
      base.baseRootJson, base.vended)
    val table = IcebergTable.fromMetadata(base.stagedDir, base.conf,
      buffering.currentMetadata(), base.vended)
    (new SparkIcebergTable(display, table, writable = true, Some(buffering),
      reload = () => IcebergTable.fromMetadata(base.stagedDir, base.conf,
        buffering.currentMetadata(), base.vended)), buffering)
  }

  // -- CREATE ------------------------------------------------------------------

  def stageCreate(store: CatalogStore, catalogName: String, ns: Seq[String],
                  name: String,
                  schema: org.apache.spark.sql.types.StructType,
                  partitionCols: Seq[(String, String)],
                  properties: Map[String, String],
                  onCommitted: () => Unit): StagedTable = {
    val base = store.stageCreateTable(ns, name, schema, partitionCols,
      properties)
    val (inner, buffering) = stagedInner(fullName(catalogName, ns, name), base)
    new GraftStagedTable(inner,
      doCommit = () => {
        val mapper = new ObjectMapper()
        val baseRoot = mapper.readTree(base.baseRootJson)
          .asInstanceOf[ObjectNode]
        val createUpds = MetadataCommit.rootToCreateUpdates(mapper, baseRoot,
          base.realLocation)
        // recorded requirements (assert-ref main = absent; lineage's
        // assert-next-row-id = 0) all hold on the seed — replay verbatim
        val reqs = MetadataCommit.assertCreate(mapper) +:
          buffering.recordedRequirements.toSeq
        try store.publishStagedCreate(ns, name, base, reqs,
          createUpds ++ buffering.recordedUpdates.toSeq)
        catch {
          case e: Throwable =>
            try store.cleanupStagedCreate(ns, name, base)
            catch { case _: Exception => () }
            throw e
        }
        onCommitted()
      },
      doAbort = () => store.cleanupStagedCreate(ns, name, base))
  }

  // -- REPLACE -----------------------------------------------------------------

  def stageReplace(store: CatalogStore, catalogName: String, ns: Seq[String],
                   name: String,
                   schema: org.apache.spark.sql.types.StructType,
                   partitionCols: Seq[(String, String)],
                   properties: Map[String, String],
                   onCommitted: () => Unit): StagedTable = {
    val mapper = new ObjectMapper()
    val live = store.loadIcebergTable(ns, name)
    val cmtr = store.committerFor(ns, name, live, live.conf)
    val baseRoot = cmtr.currentRoot(mapper)
    val baseMeta = cmtr.currentMetadata()
    val declaredV3 = properties.get("format-version").contains("3")

    // the replacement schema takes FRESH field ids continuing from
    // last-column-id (the Iceberg replacement rule): an id never means
    // two different columns across the table's history, so pre-replace
    // snapshots keep reading correctly under their recorded schema-id
    var nextId = Option(baseRoot.get("last-column-id")).map(_.asInt)
      .getOrElse(baseMeta.fieldIds.values.maxOption.getOrElse(0))
    val schemaNode = IcebergJson.typeNodeWithIds(mapper, schema,
      () => { nextId += 1; nextId }).asInstanceOf[ObjectNode]
    val newFieldIds: Map[String, Int] = schemaNode.get("fields")
      .elements.asScala
      .map(f => f.get("name").asText -> f.get("id").asInt).toMap
    val specFields = partitionCols.map { case (c, transform) =>
      PartitionField(IcebergJson.specFieldName(c, transform), transform,
        newFieldIds.getOrElse(c, throw new IllegalArgumentException(
          s"partition column $c not in the replacement schema")), -1)
    }
    val ddl = Seq.newBuilder[JsonNode]
    if (declaredV3 && baseMeta.formatVersion < 3)
      ddl += MetadataCommit.upgradeFormatVersion(mapper, 3)
    ddl += MetadataCommit.addSchema(mapper, schemaNode.deepCopy(), nextId)
    ddl += MetadataCommit.setCurrentSchema(mapper, -1)
    ddl += MetadataCommit.addPartitionSpec(mapper, specFields)
    ddl += MetadataCommit.setDefaultSpec(mapper, -1)
    // REPLACE defines a new table shape: the old default sort order
    // references field ids the new schema does not carry — reset to
    // unsorted (declare a new one with ALTER/properties afterwards)
    ddl += MetadataCommit.setDefaultSortOrder(mapper, 0)
    if (properties.nonEmpty) {
      val p = mapper.createObjectNode()
      p.put("action", "set-properties")
      val u = p.putObject("updates")
      properties.foreach { case (k, v) => u.put(k, v) }
      ddl += p
    }
    val ddlUpdates = ddl.result()

    // the staged base: the live document with the DDL applied through
    // the SAME applier the publish uses (so every predicted id — schema,
    // spec, partition fields — matches what the publish will assign),
    // snapshots KEPT (snapshot-id/sequence allocation continues,
    // collision-free), refs/current CLEARED (the staged write starts an
    // empty line: both AppendData and truncating overwrites then produce
    // a snapshot holding ONLY the replacement rows)
    val stagedRoot = MetadataCommit.applyUpdates(mapper,
      baseRoot.deepCopy[ObjectNode](), ddlUpdates)
    stagedRoot.remove("refs")
    stagedRoot.put("current-snapshot-id", -1L)
    val stagedDir = s"${cmtr.tableDir}/_staged/" +
      java.util.UUID.randomUUID.toString.take(12)
    stagedRoot.put("location", stagedDir)
    val base = StagedBase(cmtr.tableDir, stagedDir,
      mapper.writeValueAsString(stagedRoot), live.conf, live.vended)

    val baseUuid = Option(baseRoot.get("table-uuid")).map(_.asText)
    val baseSchemaId = Option(baseRoot.get("current-schema-id"))
      .map(_.asInt).getOrElse(0)
    val baseSpecId = Option(baseRoot.get("default-spec-id"))
      .map(_.asInt).getOrElse(0)

    val (inner, buffering) = stagedInner(fullName(catalogName, ns, name), base)
    new GraftStagedTable(inner,
      doCommit = () => {
        try publishReplace(cmtr, ns, name, ddlUpdates, buffering,
          baseUuid, baseSchemaId, baseSpecId)
        catch {
          case e: Throwable =>
            try cleanupStagedDir(base)
            catch { case _: Exception => () }
            throw e
        }
        onCommitted()
      },
      doAbort = () => cleanupStagedDir(base))
  }

  private def cleanupStagedDir(base: StagedBase): Unit = {
    val p = new Path(base.stagedDir)
    p.getFileSystem(base.conf).delete(p, true)
    ()
  }

  /** The REPLACE publish with bounded optimistic retries: rival DATA
    * commits re-sequence the staged snapshot id and retry (replace-wins
    * semantics — the rival's rows are superseded by definition); rival
    * SCHEMA/SPEC evolution or row-id allocation aborts loudly, because
    * the staged files carry predicted ids that no longer hold. */
  private def publishReplace(cmtr: TableCommitter, ns: Seq[String],
                             name: String, ddlUpdates: Seq[JsonNode],
                             buffering: BufferingCommitter,
                             baseUuid: Option[String], baseSchemaId: Int,
                             baseSpecId: Int): Unit = {
    val mapper = new ObjectMapper()
    val ident = (ns :+ name).mkString(".")
    // deep-copy: retries mutate snapshot ids in place
    var snapUpdates: Seq[JsonNode] =
      buffering.recordedUpdates.toSeq.map(_.deepCopy[JsonNode]())
    val lineageReqs = buffering.recordedRequirements.toSeq.filter(r =>
      Option(r.get("type")).exists(_.asText == "assert-next-row-id"))
    def currentSnapId: Option[Long] = snapUpdates.collectFirst {
      case u if Option(u.get("action")).exists(_.asText == "add-snapshot") =>
        u.get("snapshot").get("snapshot-id").asLong
    }

    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      val fresh = cmtr.currentRoot(mapper)
      // non-retryable drift: rival schema/spec evolution or row-id
      // allocation — the staged parquet/manifests embed predicted ids
      val freshSchemaId = Option(fresh.get("current-schema-id"))
        .map(_.asInt).getOrElse(0)
      val freshSpecId = Option(fresh.get("default-spec-id"))
        .map(_.asInt).getOrElse(0)
      if (freshSchemaId != baseSchemaId || freshSpecId != baseSpecId)
        throw new CommitConflictException(
          s"REPLACE TABLE $ident aborted: a rival commit evolved the " +
            s"table's schema or partition spec during the staged write " +
            s"(schema $baseSchemaId->$freshSchemaId, spec " +
            s"$baseSpecId->$freshSpecId) — the staged files carry ids " +
            "that no longer hold; re-run the REPLACE")
      lineageReqs.foreach { r =>
        val expected = r.get("next-row-id").asLong
        val actual = Option(fresh.get("next-row-id")).map(_.asLong)
          .getOrElse(0L)
        if (actual != expected)
          throw new CommitConflictException(
            s"REPLACE TABLE $ident aborted: a rival commit advanced " +
              s"next-row-id ($expected -> $actual) during the staged " +
              "write — the staged manifests carry assigned row-id " +
              "ranges; re-run the REPLACE")
      }
      // rival data commit may have taken the staged snapshot id:
      // re-sequence (rewrite the small manifest LIST; entries inherit)
      val freshIds: Set[Long] = Option(fresh.get("snapshots"))
        .map(_.elements.asScala.map(_.get("snapshot-id").asLong).toSet)
        .getOrElse(Set.empty)
      currentSnapId.filter(freshIds.contains).foreach { oldId =>
        val newId = (freshIds + oldId).max + 1
        snapUpdates = snapUpdates.map { u =>
          Option(u.get("action")).map(_.asText) match {
            case Some("add-snapshot") =>
              val snap = u.get("snapshot").asInstanceOf[ObjectNode]
              val oldList = snap.get("manifest-list").asText
              val newList = new Path(new Path(oldList).getParent,
                s"snap-$newId-r$attempt.avro")
              IcebergWriter.reSequenceManifestList(cmtr.conf, oldList,
                newList, oldId, newId)
              snap.put("snapshot-id", newId)
              snap.put("manifest-list", newList.toString)
              u
            case Some("set-snapshot-ref")
                if u.get("snapshot-id").asLong == oldId =>
              u.asInstanceOf[ObjectNode].put("snapshot-id", newId)
            case _ => u
          }
        }
      }
      val freshHead = Option(fresh.get("current-snapshot-id"))
        .map(_.asLong).filter(_ != -1L)
      val reqs =
        baseUuid.toSeq.map(MetadataCommit.assertTableUuid(mapper, _)) ++ Seq(
          MetadataCommit.assertCurrentSchemaId(mapper, baseSchemaId),
          MetadataCommit.assertDefaultSpecId(mapper, baseSpecId),
          MetadataCommit.assertRefSnapshotId(mapper, "main", freshHead)) ++
          lineageReqs
      // a REPLACE with no staged write (plain REPLACE TABLE) empties the
      // table: main's pointer is removed in the same commit
      val updates = ddlUpdates ++ snapUpdates ++
        (if (currentSnapId.isEmpty) {
          val r = mapper.createObjectNode()
          r.put("action", "remove-snapshot-ref")
          r.put("ref-name", "main")
          Seq(r)
        } else Nil)
      try {
        cmtr.commit(reqs, updates)
        done = true
      } catch {
        case e: CommitConflictException if attempt < MaxPublishAttempts =>
          // a rival landed between read and publish — loop re-reads,
          // re-validates, re-sequences if needed, and retries
          val _ = e
        case e: CommitConflictException =>
          throw new CommitConflictException(
            s"REPLACE TABLE $ident gave up after $MaxPublishAttempts " +
              s"conflicting publish attempts: ${e.getMessage}")
      }
    }
  }
}
