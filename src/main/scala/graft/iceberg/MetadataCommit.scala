package graft.iceberg

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.jdk.CollectionConverters._

/** Optimistic-concurrency commit failure: the table changed underneath
  * the writer (another commit moved the ref) — retry from fresh metadata. */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

/** Where a table's metadata pointer lives and how a commit moves it.
  *
  * Writers ([[IcebergWriter]], [[SchemaEvolution]]) express every commit
  * as the Iceberg REST spec's (requirements, updates) pair — the same
  * vocabulary `CommitTableRequest` sends over the wire — and the
  * committer makes it durable:
  *
  *  - [[FsCommitter]]: re-reads the latest `vN.metadata.json`, checks the
  *    requirements against it, applies the updates with
  *    [[MetadataCommit.applyUpdates]], and writes `v(N+1)` with
  *    create-new as the atomicity primitive (the pre-existing commit
  *    model of the filesystem warehouse);
  *  - `RestCommitter` (connector): POSTs the pair to the catalog service,
  *    which owns the pointer — the reference's REST crate reads through
  *    the same service (`catalog.rs:83-135`) but never commits; this is
  *    the write half it lacks.
  *
  * Data/manifest files are written by the caller under [[tableDir]]
  * BEFORE the commit; a failed commit strands unreferenced files (cleaned
  * by expiration), never a broken table.
  */
trait TableCommitter {
  def tableDir: String
  def conf: Configuration
  /** Catalog-vended per-table Hadoop overrides (REST committers carry
    * them; empty elsewhere). Already merged into [[conf]]; ALSO needed
    * as a map because Spark's file sources build their Hadoop conf from
    * the SESSION — maintenance reads must thread these per-relation
    * exactly like [[IcebergTable.vended]] scans do. */
  def vended: Map[String, String] = Map.empty
  /** Fresh metadata document (mutable root) — the commit base. */
  def currentRoot(mapper: ObjectMapper): ObjectNode
  /** Fresh parsed metadata (convenience over [[currentRoot]]). */
  def currentMetadata(): TableMetadata
  /** Atomically: check `requirements`, apply `updates`, publish. Throws
    * [[CommitConflictException]] when a requirement fails. */
  def commit(requirements: Seq[JsonNode], updates: Seq[JsonNode]): Unit
}

/** Filesystem-warehouse committer: latest metadata file is the table
  * state; `create(path, overwrite = false)` on the next version is the
  * commit point, so two racing writers cannot both win the same version. */
class FsCommitter(val tableDir: String, val conf: Configuration)
    extends TableCommitter {

  /** Test seam: runs between the requirement check and the create-new
    * publish — the window a racing commit can land in. Production no-op. */
  protected def beforePublish(path: Path): Unit = ()

  // The commit point below is create-new; on a store WITHOUT exclusive
  // create (raw S3-style object stores: the PUT of the "create" happily
  // overwrites a racing writer's version) two writers can both "win" the
  // same vN and one table state silently vanishes. Refuse up front
  // rather than corrupt quietly — checked once per scheme process-wide.
  FsCommitter.requireAtomicCreate(tableDir, conf)

  // Resolution split (r21, ADVICE r20): the PUBLISH BASE (rootAndPath /
  // latestPath below) resolves AUTHORITATIVELY — full listing, both name
  // forms — because a commit built on a hint-stale base would silently
  // drop an external engine's uuid-form commit. Pre-publish READS
  // (currentRoot / currentMetadata here, and PinnedFsCommitter's pin)
  // keep the O(1) hint path: whatever they build, the publish re-reads
  // the authoritative base and re-checks every requirement against it,
  // so a hint-lagged pre-read surfaces as a retryable
  // CommitConflictException (assert-refs fail against the true root) or
  // applies cleanly to the true root — never silent loss. Commits are
  // rare relative to loads, so only the publish pays the listing.
  override def currentRoot(mapper: ObjectMapper): ObjectNode = {
    val latest = TableMetadata.latestMetadataPath(tableDir, conf)
    val in = latest.getFileSystem(conf).open(latest)
    try mapper.readTree(in).asInstanceOf[ObjectNode] finally in.close()
  }

  override def currentMetadata(): TableMetadata = TableMetadata.load(tableDir, conf)

  override def commit(requirements: Seq[JsonNode], updates: Seq[JsonNode]): Unit = {
    val mapper = new ObjectMapper()
    val (root, latest) = rootAndPath(mapper)
    MetadataCommit.checkRequirements(root, requirements).foreach(err =>
      throw new CommitConflictException(s"commit to $tableDir rejected: $err"))
    val next = MetadataCommit.applyUpdates(mapper, root, updates)
    publishAfter(mapper, latest, next)
  }

  /** Fresh metadata document plus the path it was read from — the commit
    * base for [[publishAfter]]. */
  private[iceberg] def rootAndPath(mapper: ObjectMapper): (ObjectNode, Path) = {
    val latest = TableMetadata.latestMetadataPathForCommit(tableDir, conf)
    val in = latest.getFileSystem(conf).open(latest)
    val root = try mapper.readTree(in).asInstanceOf[ObjectNode] finally in.close()
    (root, latest)
  }

  /** Current latest metadata path, for is-ours checks during transaction
    * compensation. */
  private[iceberg] def latestPath(): Path =
    TableMetadata.latestMetadataPathForCommit(tableDir, conf)

  /** The publish half of [[commit]]: write `next` as the version after
    * `latest`, create-new as the commit point. Returns the created path.
    * Separated so a multi-table transaction ([[Transactions]]) can
    * validate every table before publishing any. */
  private[iceberg] def publishAfter(mapper: ObjectMapper, latest: Path,
                                    next: ObjectNode): Path = {
    val version = "v(\\d+)".r.findFirstMatchIn(latest.getName)
      .map(_.group(1).toLong)
      .orElse("^(\\d+)".r.findFirstMatchIn(latest.getName).map(_.group(1).toLong))
      .getOrElse(0L)
    val path = new Path(s"$tableDir/metadata/v${version + 1}.metadata.json")
    beforePublish(path)
    // A racing commit can land between the requirement check and the
    // create: surface it as CommitConflictException (the documented
    // catch-and-retry contract), not a raw filesystem error.
    val out =
      try path.getFileSystem(conf).create(path, false) // commit = create-new
      catch {
        case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                  _: java.nio.file.FileAlreadyExistsException) =>
          throw new CommitConflictException(
            s"commit to $tableDir lost the race for ${path.getName}: " +
              s"another writer committed first (${e.getMessage}) — retry " +
              "from fresh metadata")
        case e: java.io.IOException if e.getMessage != null &&
            e.getMessage.contains("already exists") =>
          throw new CommitConflictException(
            s"commit to $tableDir lost the race for ${path.getName}: " +
              s"another writer committed first (${e.getMessage}) — retry " +
              "from fresh metadata")
      }
    try out.write(mapper.writerWithDefaultPrettyPrinter.writeValueAsString(next)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // advisory fast-path pointer for latestMetadataPath: best-effort,
    // AFTER the create-new commit point (a crash here just leaves a
    // stale hint the probe loop heals)
    TableMetadata.writeVersionHint(tableDir, version + 1, conf)
    path
  }
}

/** An [[FsCommitter]] whose READ state is frozen to the table's metadata
  * as of construction: every read a staged write performs through it —
  * and therefore the assert-ref requirement it emits — is against that
  * frozen base, so a rival commit landing ANY time after construction
  * fails the eventual publish with [[CommitConflictException]] instead
  * of being silently built upon. This closes the probe-to-publish race
  * in the streaming admission sinks: PIN first, then read/compute, then
  * publish — a publish succeeds only if the table is still exactly what
  * the probe saw, otherwise the whole attempt (bounded) recomputes
  * against a fresh pin. The PUBLISH itself still arbitrates against the
  * live table (fresh requirement check + create-new), so pinning can
  * only narrow, never widen, what commits. */
final class PinnedFsCommitter(dir: String, hconf: Configuration)
    extends FsCommitter(dir, hconf) {
  private val pinnedJson: String = {
    // hint path is fine here: a hint-lagged pin's staged assert-refs
    // fail against the publish's AUTHORITATIVE base (rootAndPath) and
    // the caller recomputes from a fresh pin — see FsCommitter's
    // resolution-split note
    val p = TableMetadata.latestMetadataPath(dir, hconf)
    val in = p.getFileSystem(hconf).open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
  override def currentRoot(mapper: ObjectMapper): ObjectNode =
    mapper.readTree(pinnedJson).asInstanceOf[ObjectNode]
  override def currentMetadata(): TableMetadata =
    TableMetadata.fromJson(pinnedJson)
}

object FsCommitter {

  /** Filesystems whose `create(path, overwrite = false)` is a true
    * exclusive-create commit point: the local FS, HDFS and its views,
    * and ADLS Gen2 (abfs implements conditional create). Raw S3-style
    * stores (s3/s3a/gs/oss/swift/wasb…) are NOT here — their "create" is
    * a last-writer-wins PUT. */
  private val DefaultAtomicSchemes =
    Set("file", "hdfs", "viewfs", "webhdfs", "abfs", "abfss")

  /** Conf escape hatch: comma-separated extra schemes whose store the
    * operator asserts provides exclusive create (e.g. S3 behind a
    * consistency layer, or a custom FS in tests). */
  val AtomicSchemesConf = "graft.fs.atomic-create.schemes"

  private val verdicts =
    new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()

  private[iceberg] def requireAtomicCreate(tableDir: String,
                                           conf: Configuration): Unit = {
    val scheme = Option(new Path(tableDir).toUri.getScheme)
      .orElse(Option(org.apache.hadoop.fs.FileSystem
        .getDefaultUri(conf).getScheme))
      .getOrElse("file").toLowerCase
    val extras = conf.getTrimmedStrings(AtomicSchemesConf).toSet
      .map((s: String) => s.toLowerCase)
    val err = verdicts.computeIfAbsent(s"$scheme|${extras.mkString(",")}",
      _ =>
        if (DefaultAtomicSchemes(scheme) || extras(scheme)) None
        else Some(
          s"filesystem warehouse commits need exclusive create, and " +
          s"scheme '$scheme' does not guarantee it (an object-store PUT " +
          "overwrites a racing writer's commit — silent table " +
          "corruption). Use an Iceberg REST catalog instead (set " +
          "spark.sql.catalog.<name>.uri to the catalog service — its " +
          "server owns the pointer and serializes commits), or, if this " +
          s"store truly provides conditional create, add '$scheme' to " +
          s"$AtomicSchemesConf"))
    err.foreach(m => throw new UnsupportedOperationException(m))
  }
}

/** The Iceberg REST spec's metadata update actions and requirements,
  * applied to a metadata.json document. ONE implementation serves the
  * filesystem committer, so every local write exercises the same
  * semantics a catalog service applies server-side.
  */
object MetadataCommit {

  // -- builders (the writer side's vocabulary) -------------------------------

  /** Requirement: the table must not exist — the staged-create commit's
    * guard (the REST spec's `assert-create`). The filesystem committer
    * can never see it hold (it reads an existing document), so there the
    * equivalent is the exclusive create of the first metadata file;
    * servers check it against their registry. */
  def assertCreate(mapper: ObjectMapper): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "assert-create")
    n
  }

  def assertTableUuid(mapper: ObjectMapper, uuid: String): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "assert-table-uuid")
    n.put("uuid", uuid)
    n
  }

  def assertRefSnapshotId(mapper: ObjectMapper, ref: String,
                          snapshotId: Option[Long]): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "assert-ref-snapshot-id")
    n.put("ref", ref)
    snapshotId match {
      case Some(id) => n.put("snapshot-id", id)
      case None => n.putNull("snapshot-id")
    }
    n
  }

  def upgradeFormatVersion(mapper: ObjectMapper, to: Int): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("action", "upgrade-format-version")
    n.put("format-version", to)
    n
  }

  def setNextRowId(mapper: ObjectMapper, nextRowId: Long): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("action", "set-next-row-id")
    n.put("next-row-id", nextRowId)
    n
  }

  /** Requirement: the table's row-id counter still equals the base this
    * commit's manifests assigned their `first_row_id` ranges from. The
    * ref assert alone cannot see a rival commit on ANOTHER branch
    * advancing `next-row-id` — without this, two branches could assign
    * overlapping row-id ranges. */
  def assertNextRowId(mapper: ObjectMapper, expected: Long): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "assert-next-row-id")
    n.put("next-row-id", expected)
    n
  }

  def addSnapshot(mapper: ObjectMapper, snapshot: ObjectNode): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("action", "add-snapshot")
    n.set[ObjectNode]("snapshot", snapshot)
    n
  }

  def setSnapshotRef(mapper: ObjectMapper, ref: String, snapshotId: Long,
                     refType: String = "branch",
                     retention: RefRetention = RefRetention(),
                     /** `true` = this update STATES the whole policy:
                       * unset knobs become explicit JSON nulls, which the
                       * applier reads as CLEAR. `false` (plain head
                       * moves) omits them, which the applier reads as
                       * inherit-the-prior-policy. */
                     clearUnsetRetention: Boolean = false): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("action", "set-snapshot-ref")
    n.put("ref-name", ref)
    n.put("type", refType)
    n.put("snapshot-id", snapshotId)
    def knob(k: String, v: Option[Long]): Unit = v match {
      case Some(x) => n.put(k, x); ()
      case None => if (clearUnsetRetention) { n.putNull(k); () }
    }
    knob("max-snapshot-age-ms", retention.maxSnapshotAgeMs)
    knob("min-snapshots-to-keep", retention.minSnapshotsToKeep.map(_.toLong))
    knob("max-ref-age-ms", retention.maxRefAgeMs)
    n
  }

  def removeSnapshots(mapper: ObjectMapper, ids: Seq[Long]): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("action", "remove-snapshots")
    val arr = n.putArray("snapshot-ids")
    ids.foreach(arr.add)
    n
  }

  def assertCurrentSchemaId(mapper: ObjectMapper, schemaId: Int): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "assert-current-schema-id")
    n.put("current-schema-id", schemaId)
    n
  }

  def addSchema(mapper: ObjectMapper, schema: ObjectNode,
                lastColumnId: Int): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("action", "add-schema")
    n.set[ObjectNode]("schema", schema)
    n.put("last-column-id", lastColumnId)
    n
  }

  def setCurrentSchema(mapper: ObjectMapper, schemaId: Int): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("action", "set-current-schema")
    n.put("schema-id", schemaId) // -1 = the schema added in this commit
    n
  }

  def assertDefaultSpecId(mapper: ObjectMapper, specId: Int): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "assert-default-spec-id")
    n.put("default-spec-id", specId)
    n
  }

  /** `add-spec` carrying the new spec's FIELDS only — the APPLIER assigns
    * the spec id and the partition field ids (same ownership rule as
    * schema ids: a client-proposed id is a guess from a racy GET). */
  def addPartitionSpec(mapper: ObjectMapper,
                       fields: Seq[PartitionField]): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("action", "add-spec")
    val spec = n.putObject("spec")
    val arr = spec.putArray("fields")
    fields.foreach { f =>
      val fn = arr.addObject()
      fn.put("name", f.name)
      fn.put("transform", f.transform)
      fn.put("source-id", f.sourceId)
      // field-id -1 = unassigned: the applier reuses the id of an
      // identical (source-id, transform) field from any prior spec, else
      // allocates last-partition-id + 1
      fn.put("field-id", f.fieldId)
    }
    n
  }

  def setDefaultSpec(mapper: ObjectMapper, specId: Int): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("action", "set-default-spec")
    n.put("spec-id", specId) // -1 = the spec added in this commit
    n
  }

  def assertDefaultSortOrderId(mapper: ObjectMapper, orderId: Int): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "assert-default-sort-order-id")
    n.put("default-sort-order-id", orderId)
    n
  }

  /** `add-sort-order` — fields only; the applier assigns the order id. */
  def addSortOrder(mapper: ObjectMapper,
                   fields: Seq[SortOrderField]): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("action", "add-sort-order")
    val order = n.putObject("sort-order")
    val arr = order.putArray("fields")
    fields.foreach { f =>
      val fn = arr.addObject()
      fn.put("transform", f.transform)
      fn.put("source-id", f.sourceId)
      fn.put("direction", f.direction)
      fn.put("null-order",
        if (f.direction == "desc") "nulls-last" else "nulls-first")
    }
    n
  }

  def setDefaultSortOrder(mapper: ObjectMapper, orderId: Int): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("action", "set-default-sort-order")
    n.put("sort-order-id", orderId) // -1 = the order added in this commit
    n
  }

  // -- staged CREATE (atomic CTAS / CREATE OR REPLACE) ------------------------

  /** The empty document a staged-create commit builds on: what a REST
    * server starts from when a `CommitTableRequest` arrives with
    * `assert-create` for a table it does not know, and what the
    * filesystem staging path applies the same update list to — ONE seed,
    * so the two stores cannot drift. */
  def stagedCreateSeed(mapper: ObjectMapper): ObjectNode = {
    val root = mapper.createObjectNode()
    root.put("format-version", 1) // the update list upgrades it
    root.put("last-updated-ms", 0L)
    root.put("current-snapshot-id", -1L)
    root.putArray("snapshots")
    root.putArray("sort-orders").addObject().put("order-id", 0)
      .putArray("fields")
    root.put("default-sort-order-id", 0)
    root
  }

  /** Decompose a complete metadata document (the staged table's base, as
    * [[graft.iceberg.connector.IcebergJson.tableMetadata]] builds it)
    * into the REST spec's staged-create update list: applying these to
    * [[stagedCreateSeed]] reproduces the document — with the applier
    * owning every id assignment, which lands on the SAME ids the base
    * carries (schema 0, spec 0, partition fields 1000…) because the seed
    * is empty. `location` is passed separately: the staged base points
    * at the staging directory, the committed document must point at the
    * table's real location. */
  def rootToCreateUpdates(mapper: ObjectMapper, root: ObjectNode,
                          location: String): Seq[JsonNode] = {
    import scala.jdk.CollectionConverters._
    val upds = Seq.newBuilder[JsonNode]
    val uuidUpd = mapper.createObjectNode()
    uuidUpd.put("action", "assign-uuid")
    // a staged base without a uuid (a minimal server-composed document)
    // takes the location-derived one — the same convention IcebergJson
    // stamps at CREATE
    uuidUpd.put("uuid", Option(root.get("table-uuid")).map(_.asText)
      .getOrElse(java.util.UUID.nameUUIDFromBytes(
        location.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString))
    upds += uuidUpd
    upds += upgradeFormatVersion(mapper,
      Option(root.get("format-version")).map(_.asInt).getOrElse(2))
    val locUpd = mapper.createObjectNode()
    locUpd.put("action", "set-location")
    locUpd.put("location", location)
    upds += locUpd
    // schema: the base's current schema, applier-assigned id (0 on seed)
    val currentSchemaId =
      Option(root.get("current-schema-id")).map(_.asInt).getOrElse(0)
    val schemaNode = Option(root.get("schemas"))
      .flatMap(_.elements.asScala.find(
        _.get("schema-id").asInt == currentSchemaId))
      .orElse(Option(root.get("schema")))
      .getOrElse(throw new IllegalArgumentException(
        "staged metadata has no schema"))
      .deepCopy[ObjectNode]()
    upds += addSchema(mapper, schemaNode,
      Option(root.get("last-column-id")).map(_.asInt).getOrElse(
        schemaNode.get("fields").size))
    upds += setCurrentSchema(mapper, -1)
    // partition spec: fields only, applier-assigned ids (1000… on seed)
    val defaultSpecId =
      Option(root.get("default-spec-id")).map(_.asInt).getOrElse(0)
    val specFields: Seq[PartitionField] = Option(root.get("partition-specs"))
      .flatMap(_.elements.asScala.find(_.get("spec-id").asInt == defaultSpecId))
      .map(_.get("fields").elements.asScala.toSeq.map(f =>
        PartitionField(f.get("name").asText, f.get("transform").asText,
          f.get("source-id").asInt, -1)))
      .getOrElse(Nil)
    upds += addPartitionSpec(mapper, specFields)
    upds += setDefaultSpec(mapper, -1)
    // sort order: only when the base declares a non-unsorted default
    // (the seed already carries order 0 = unsorted)
    val soId =
      Option(root.get("default-sort-order-id")).map(_.asInt).getOrElse(0)
    if (soId != 0) {
      Option(root.get("sort-orders"))
        .flatMap(_.elements.asScala.find(_.get("order-id").asInt == soId))
        .foreach { o =>
          upds += addSortOrder(mapper, o.get("fields").elements.asScala.toSeq
            .map(f => SortOrderField(f.get("source-id").asInt,
              f.get("transform").asText, f.get("direction").asText)))
          upds += setDefaultSortOrder(mapper, -1)
        }
    }
    Option(root.get("properties")).filter(_.properties.asScala.nonEmpty)
      .foreach { props =>
        val p = mapper.createObjectNode()
        p.put("action", "set-properties")
        p.set[JsonNode]("updates", props.deepCopy[JsonNode]())
        upds += p
      }
    upds.result()
  }

  // -- requirement check -----------------------------------------------------

  /** First failed requirement's description, or None when all hold. */
  def checkRequirements(root: ObjectNode,
                        requirements: Seq[JsonNode]): Option[String] = {
    def refSnapshotId(ref: String): Option[Long] = {
      val fromRefs = Option(root.get("refs")).flatMap(r => Option(r.get(ref)))
        .flatMap(n => Option(n.get("snapshot-id"))).map(_.asLong)
      // pre-refs metadata: `main` is the current snapshot pointer
      fromRefs.orElse(
        if (ref == "main")
          Option(root.get("current-snapshot-id")).map(_.asLong).filter(_ != -1L)
        else None)
    }
    requirements.iterator.flatMap { r =>
      Option(r.get("type")).map(_.asText).getOrElse("") match {
        case "assert-ref-snapshot-id" =>
          val ref = r.get("ref").asText
          val expected = Option(r.get("snapshot-id")).filterNot(_.isNull).map(_.asLong)
          val actual = refSnapshotId(ref)
          if (actual == expected) None
          else Some(s"requirement failed: ref '$ref' is at " +
            s"${actual.getOrElse("absent")}, expected ${expected.getOrElse("absent")}")
        case "assert-next-row-id" =>
          val expected = r.get("next-row-id").asLong
          // pre-upgrade metadata has no counter; the upgrade initializes
          // it to 0, so absent compares as 0
          val actual = Option(root.get("next-row-id")).map(_.asLong).getOrElse(0L)
          if (actual == expected) None
          else Some(s"requirement failed: next-row-id is $actual, " +
            s"expected $expected (a rival commit assigned row ids first)")
        case "assert-current-schema-id" =>
          val expected = r.get("current-schema-id").asInt
          val actual = Option(root.get("current-schema-id")).map(_.asInt)
            .orElse(Option(root.get("schema"))
              .flatMap(s => Option(s.get("schema-id"))).map(_.asInt))
            .getOrElse(0)
          if (actual == expected) None
          else Some(s"requirement failed: current-schema-id is $actual, " +
            s"expected $expected")
        case "assert-default-spec-id" =>
          val expected = r.get("default-spec-id").asInt
          val actual = Option(root.get("default-spec-id")).map(_.asInt).getOrElse(0)
          if (actual == expected) None
          else Some(s"requirement failed: default-spec-id is $actual, " +
            s"expected $expected")
        case "assert-default-sort-order-id" =>
          val expected = r.get("default-sort-order-id").asInt
          val actual = Option(root.get("default-sort-order-id")).map(_.asInt).getOrElse(0)
          if (actual == expected) None
          else Some(s"requirement failed: default-sort-order-id is $actual, " +
            s"expected $expected")
        case "assert-table-uuid" =>
          val expected = r.get("uuid").asText
          val actual = Option(root.get("table-uuid")).map(_.asText)
          if (actual.contains(expected)) None
          else Some(s"requirement failed: table-uuid is ${actual.getOrElse("absent")}, " +
            s"expected $expected")
        case "assert-create" =>
          Some("requirement failed: table already exists")
        case other =>
          Some(s"unknown requirement type: $other") // unknown ⇒ refuse, never guess
      }
    }.nextOption()
  }

  // -- applier ---------------------------------------------------------------

  /** Apply update actions to `root` (mutated in place and returned).
    * Unknown actions throw — silently dropping an update would commit a
    * state the writer did not intend. */
  def applyUpdates(mapper: ObjectMapper, root: ObjectNode,
                   updates: Seq[JsonNode]): ObjectNode = {
    val now = System.currentTimeMillis
    // spec id the most recent add-spec in THIS batch resolved to (may be
    // an existing spec's id when the applier deduplicated) — what a
    // following set-default-spec(-1) means
    var lastAddedSpecId: Option[Int] = None
    updates.foreach { u =>
      Option(u.get("action")).map(_.asText).getOrElse("") match {

        case "add-snapshot" =>
          val snaps = Option(root.get("snapshots")).map(_.asInstanceOf[ArrayNode])
            .getOrElse(root.putArray("snapshots"))
          snaps.add(u.get("snapshot"))

        case "set-snapshot-ref" =>
          val ref = u.get("ref-name").asText
          val id = u.get("snapshot-id").asLong
          val refs = Option(root.get("refs")).map(_.asInstanceOf[ObjectNode])
            .getOrElse(root.putObject("refs"))
          // retention fields survive a head move (fastForward, commit-to-
          // branch) unless the update restates them: a PRESENT value sets
          // the knob, a present NULL clears it (setRefRetention's
          // whole-policy form), an ABSENT key inherits the prior policy
          val prior = Option(refs.get(ref)).collect { case o: ObjectNode => o }
          val node = refs.putObject(ref)
          node.put("snapshot-id", id)
          node.put("type", Option(u.get("type")).map(_.asText).getOrElse("branch"))
          Seq("max-snapshot-age-ms", "min-snapshots-to-keep", "max-ref-age-ms")
            .foreach { k =>
              Option(u.get(k)) match {
                case Some(v) if v.isNull => () // explicit null = clear
                case Some(v) => node.set[JsonNode](k, v.deepCopy[JsonNode]()); ()
                case None => prior.flatMap(p => Option(p.get(k))).foreach(v =>
                  node.set[JsonNode](k, v.deepCopy[JsonNode]()))
              }
            }
          if (ref == "main") {
            root.put("current-snapshot-id", id)
            val log = Option(root.get("snapshot-log")).map(_.asInstanceOf[ArrayNode])
              .getOrElse(root.putArray("snapshot-log"))
            val e = log.addObject()
            e.put("snapshot-id", id)
            e.put("timestamp-ms", now)
          }

        case "remove-snapshots" =>
          val dead = u.get("snapshot-ids").elements.asScala.map(_.asLong).toSet
          def filtered(field: String): Unit =
            Option(root.get(field)).foreach { arr =>
              val kept = mapper.createArrayNode()
              arr.elements.forEachRemaining { s =>
                if (!dead(s.get("snapshot-id").asLong)) kept.add(s)
              }
              root.set[JsonNode](field, kept); ()
            }
          filtered("snapshots")
          filtered("snapshot-log")
          // statistics files are keyed to snapshots: drop entries whose
          // snapshot dies (the file itself is collected with the
          // snapshot's other unreachable files)
          filtered("statistics")
          filtered("partition-statistics")

        case "set-partition-statistics" =>
          // spec metadata update: one partition-statistics file per
          // snapshot — replace any prior entry for the same snapshot id
          val sf = u.get("partition-statistics")
          val sid = sf.get("snapshot-id").asLong
          val kept = mapper.createArrayNode()
          Option(root.get("partition-statistics"))
            .foreach(_.elements.forEachRemaining { e =>
              if (e.get("snapshot-id").asLong != sid) { kept.add(e); () }
            })
          kept.add(sf.deepCopy[JsonNode]())
          root.set[JsonNode]("partition-statistics", kept)

        case "remove-partition-statistics" =>
          val sid = u.get("snapshot-id").asLong
          Option(root.get("partition-statistics")).foreach { arr =>
            val kept = mapper.createArrayNode()
            arr.elements.forEachRemaining { e =>
              if (e.get("snapshot-id").asLong != sid) { kept.add(e); () }
            }
            root.set[JsonNode]("partition-statistics", kept); ()
          }

        case "set-statistics" =>
          // spec metadata update: one statistics file per snapshot —
          // replace any prior entry for the same snapshot id
          val sf = u.get("statistics-file")
          val sid = sf.get("snapshot-id").asLong
          val kept = mapper.createArrayNode()
          Option(root.get("statistics")).foreach(_.elements.forEachRemaining {
            e => if (e.get("snapshot-id").asLong != sid) { kept.add(e); () }
          })
          kept.add(sf.deepCopy[JsonNode]())
          root.set[JsonNode]("statistics", kept)

        case "remove-snapshot-ref" =>
          val refName = u.get("ref-name").asText
          Option(root.get("refs")).foreach(
            _.asInstanceOf[ObjectNode].remove(refName): Unit)
          // removing main empties the current table state (REPLACE TABLE
          // without AS SELECT): plain readers key on current-snapshot-id
          if (refName == "main") root.put("current-snapshot-id", -1L)

        // the REST spec's staged-create vocabulary: a commit that BUILDS
        // a table from scratch (assert-create) carries these before its
        // DDL updates — and a server replays them over an empty document
        case "assign-uuid" =>
          root.put("table-uuid", u.get("uuid").asText)

        case "set-location" =>
          root.put("location", u.get("location").asText)

        case "add-schema" =>
          val schema = u.get("schema").deepCopy[ObjectNode]()
          val schemas = Option(root.get("schemas")).map(_.asInstanceOf[ArrayNode])
            .getOrElse {
              // legacy v1 single-schema metadata: seed the list with it
              val a = root.putArray("schemas")
              Option(root.get("schema")).foreach(s => a.add(s.deepCopy[ObjectNode]()))
              a
            }
          // the APPLIER owns id assignment (REST-spec servers reassign
          // schema ids): a client-proposed id is a guess from a racy GET
          // — two concurrent evolutions would propose the same max+1 and
          // the second would silently shadow the first
          val assigned = schemas.elements.asScala
            .map(s => Option(s.get("schema-id")).map(_.asInt).getOrElse(0))
            .maxOption.getOrElse(-1) + 1
          schema.put("schema-id", assigned)
          schemas.add(schema)
          Option(u.get("last-column-id")).foreach(n =>
            root.put("last-column-id", n.asInt): Unit)

        case "set-current-schema" =>
          val requested = u.get("schema-id").asInt
          val schemas = Option(root.get("schemas")).map(_.asInstanceOf[ArrayNode])
            .getOrElse(throw new IllegalArgumentException(
              "set-current-schema on metadata with no schemas list"))
          val id =
            if (requested != -1) requested
            else schemas.get(schemas.size - 1).get("schema-id").asInt
          val chosen = schemas.elements.asScala
            .find(_.get("schema-id").asInt == id)
            .getOrElse(throw new IllegalArgumentException(
              s"set-current-schema: schema-id $id not in schemas"))
          root.put("current-schema-id", id)
          // keep the legacy v1 single-schema field in sync for plain readers
          if (root.has("schema")) root.set[ObjectNode]("schema", chosen.deepCopy())

        case "add-spec" =>
          val spec = u.get("spec").deepCopy[ObjectNode]()
          val specs = Option(root.get("partition-specs")).map(_.asInstanceOf[ArrayNode])
            .getOrElse {
              // legacy v1 flat-spec metadata: seed the list with it
              val a = root.putArray("partition-specs")
              Option(root.get("partition-spec")).foreach { legacy =>
                val seed = a.addObject()
                seed.put("spec-id",
                  Option(root.get("default-spec-id")).map(_.asInt).getOrElse(0))
                val fields = legacy.deepCopy[JsonNode]()
                // v1 flat specs may omit field-id: assign the spec's
                // positional convention (1000 + position) rather than NPE
                // in the prior-id scan below
                fields.elements.asScala.zipWithIndex.foreach { case (fn, i) =>
                  val f = fn.asInstanceOf[ObjectNode]
                  if (!f.has("field-id")) f.put("field-id", 1000 + i)
                  ()
                }
                seed.set[JsonNode]("fields", fields)
              }
              a
            }
          // the APPLIER owns id assignment (same rule as schema ids)
          val assignedSpecId = specs.elements.asScala
            .map(s => Option(s.get("spec-id")).map(_.asInt).getOrElse(0))
            .maxOption.getOrElse(-1) + 1
          spec.put("spec-id", assignedSpecId)
          // partition FIELD ids: an identical (source-id, transform) field
          // from any prior spec keeps its id (its manifest values mean the
          // same thing); genuinely new fields get last-partition-id + 1…
          val priorIds: Map[(Int, String), Int] = specs.elements.asScala.flatMap(s =>
            Option(s.get("fields")).toSeq.flatMap(_.elements.asScala).flatMap(f =>
              Option(f.get("field-id")).map(id =>
                (f.get("source-id").asInt, f.get("transform").asText) ->
                  id.asInt))).toMap
          var lastPartitionId = Option(root.get("last-partition-id")).map(_.asInt)
            .getOrElse(priorIds.values.maxOption.getOrElse(999))
          spec.get("fields").elements.asScala.foreach { fn =>
            val f = fn.asInstanceOf[ObjectNode]
            priorIds.get((f.get("source-id").asInt, f.get("transform").asText)) match {
              case Some(id) => f.put("field-id", id)
              case None =>
                lastPartitionId += 1
                f.put("field-id", lastPartitionId)
            }
            ()
          }
          // Dedup (upstream Iceberg behavior): an existing spec with the
          // IDENTICAL field list keeps its id and nothing is appended —
          // repeated add/drop cycles must not grow partition-specs or
          // churn default-spec-id. Compared AFTER field-id resolution so
          // a re-added field matches its original id.
          def fieldKey(s: JsonNode): Seq[(String, String, Int, Int)] =
            Option(s.get("fields")).toSeq.flatMap(_.elements.asScala).map(f =>
              (Option(f.get("name")).map(_.asText).getOrElse(""),
               f.get("transform").asText, f.get("source-id").asInt,
               f.get("field-id").asInt)).toSeq
          specs.elements.asScala.find(fieldKey(_) == fieldKey(spec)) match {
            case Some(existing) =>
              lastAddedSpecId = Some(existing.get("spec-id").asInt)
            case None =>
              specs.add(spec)
              lastAddedSpecId = Some(assignedSpecId)
          }
          root.put("last-partition-id", lastPartitionId)

        case "set-default-spec" =>
          val requested = u.get("spec-id").asInt
          val specs = Option(root.get("partition-specs")).map(_.asInstanceOf[ArrayNode])
            .getOrElse(throw new IllegalArgumentException(
              "set-default-spec on metadata with no partition-specs list"))
          val id =
            if (requested != -1) requested
            // -1 = "the spec the preceding add-spec landed on" — which is
            // an EXISTING spec's id when add-spec deduplicated, not
            // necessarily the last array element
            else lastAddedSpecId.getOrElse(
              specs.get(specs.size - 1).get("spec-id").asInt)
          val chosen = specs.elements.asScala
            .find(_.get("spec-id").asInt == id)
            .getOrElse(throw new IllegalArgumentException(
              s"set-default-spec: spec-id $id not in partition-specs"))
          root.put("default-spec-id", id)
          // keep the legacy v1 flat-spec field in sync for plain readers
          if (root.has("partition-spec"))
            root.set[JsonNode]("partition-spec", chosen.get("fields").deepCopy[JsonNode]())

        case "add-sort-order" =>
          val order = u.get("sort-order").deepCopy[ObjectNode]()
          val orders = Option(root.get("sort-orders")).map(_.asInstanceOf[ArrayNode])
            .getOrElse(root.putArray("sort-orders"))
          // the APPLIER owns id assignment; 0 is reserved for "unsorted"
          val assigned = math.max(0, orders.elements.asScala
            .map(o => Option(o.get("order-id")).map(_.asInt).getOrElse(0))
            .maxOption.getOrElse(0)) + 1
          order.put("order-id", assigned)
          orders.add(order)

        case "set-default-sort-order" =>
          val requested = u.get("sort-order-id").asInt
          val orders = Option(root.get("sort-orders")).map(_.asInstanceOf[ArrayNode])
          val id =
            if (requested != -1) requested
            else orders.filter(_.size > 0).map(o => o.get(o.size - 1).get("order-id").asInt)
              .getOrElse(throw new IllegalArgumentException(
                "set-default-sort-order(-1) with no sort order added"))
          // id 0 = unsorted, valid even when no order 0 entry exists
          if (id != 0 && !orders.exists(_.elements.asScala
              .exists(o => Option(o.get("order-id")).exists(_.asInt == id))))
            throw new IllegalArgumentException(
              s"set-default-sort-order: order-id $id not in sort-orders")
          root.put("default-sort-order-id", id)

        case "set-properties" =>
          val props = Option(root.get("properties")).map(_.asInstanceOf[ObjectNode])
            .getOrElse(root.putObject("properties"))
          u.get("updates").fields.asScala.foreach { e =>
            props.set[JsonNode](e.getKey, e.getValue); ()
          }

        case "remove-properties" =>
          Option(root.get("properties")).map(_.asInstanceOf[ObjectNode]).foreach {
            props => u.get("removals").elements.asScala.foreach(r =>
              props.remove(r.asText): Unit)
          }

        case "upgrade-format-version" =>
          // spec: format version only moves UP (a downgrade would claim
          // invariants the newer-format files don't honor)
          val cur = Option(root.get("format-version")).map(_.asInt).getOrElse(1)
          val to = u.get("format-version").asInt
          require(to >= cur,
            s"format-version cannot downgrade: $cur -> $to")
          require(to <= 3,
            s"format-version $to is beyond what this writer implements " +
              "(max 3) — stamping it would claim invariants no commit " +
              "here provides")
          root.put("format-version", to)
          // v3 row lineage starts counting at the upgrade: pre-upgrade
          // rows carry no ids (the spec's upgraded-table semantics)
          if (to >= 3 && !root.has("next-row-id")) root.put("next-row-id", 0L)

        case "set-next-row-id" =>
          // row-id ranges once assigned are immutable, so the counter is
          // monotone — a lower value would re-issue ids already handed out
          val cur = Option(root.get("next-row-id")).map(_.asLong).getOrElse(0L)
          val to = u.get("next-row-id").asLong
          require(to >= cur, s"next-row-id cannot move backwards: $cur -> $to")
          root.put("next-row-id", to)

        case other =>
          throw new IllegalArgumentException(s"unknown metadata update action: $other")
      }
    }
    root.put("last-updated-ms", now)
    root
  }
}
