package graft.iceberg.connector

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

import graft.iceberg.{IcebergTable, TableMetadata}

/** Storage/transport seam behind [[GraftCatalog]]: where table and view
  * metadata live and how commits happen. Two implementations:
  *
  *  - [[FsCatalogStore]] — a filesystem warehouse directory tree (the
  *    layout documented on [[GraftCatalog]]);
  *  - [[RestCatalogStore]] — an Iceberg-REST-spec catalog service, parity
  *    with the reference's second crate
  *    (`datafusion_iceberg_catalog_rest/src/catalog.rs:83-135` drives the
  *    same create/load/drop/rename calls against `/v1/...` routes).
  *
  * The Spark-facing catalog class stays transport-agnostic: it converts
  * between Spark's `Identifier`/exception types and these primitive
  * signatures, and owns the load cache (keyed by [[tableToken]]).
  */
trait CatalogStore {

  // -- namespaces ------------------------------------------------------------
  /** Direct child namespaces of `parent` (empty parent = root). */
  def listNamespaces(parent: Seq[String]): Seq[Seq[String]]
  def namespaceExists(ns: Seq[String]): Boolean
  def createNamespace(ns: Seq[String]): Unit
  /** Create with initial properties (`CREATE NAMESPACE … WITH
    * PROPERTIES`). Default: create, then apply the properties as one
    * update — the REST store overrides to ship them in the creation
    * request itself (the spec's CreateNamespaceRequest.properties). */
  def createNamespace(ns: Seq[String], properties: Map[String, String]): Unit = {
    createNamespace(ns)
    if (properties.nonEmpty)
      updateNamespaceProperties(ns,
        properties.toSeq.map { case (k, v) => k -> Some(v) })
  }
  /** Stored namespace properties (empty when the store keeps none). */
  def namespaceProperties(ns: Seq[String]): Map[String, String] = Map.empty
  /** `ALTER NAMESPACE … SET/UNSET PROPERTIES`, applied IN CALLER ORDER —
    * `(k, Some(v))` sets, `(k, None)` removes, and a remove-then-set of
    * the same key must end set (same contract as
    * [[updateViewProperties]]). The warehouse store rewrites its
    * properties document; the REST store POSTs the spec's
    * `UpdateNamespacePropertiesRequest`. */
  def updateNamespaceProperties(ns: Seq[String],
                                changes: Seq[(String, Option[String])]): Unit
  /** False when the namespace does not exist; non-cascade drops of
    * non-empty namespaces must throw `IllegalStateException`. */
  def dropNamespace(ns: Seq[String], cascade: Boolean): Boolean

  // -- tables ----------------------------------------------------------------
  def listTables(ns: Seq[String]): Seq[String]
  def tableExists(ns: Seq[String], name: String): Boolean
  /** Freshness token for the load cache: a load may be served from cache
    * while the token is unchanged. None = never cache (each load already
    * fetches fresh metadata). */
  def tableToken(ns: Seq[String], name: String): Option[String]
  /** Load the Iceberg table (throws `NoSuchElementException` if absent). */
  def loadIcebergTable(ns: Seq[String], name: String): IcebergTable
  /** `partitionCols` entries are (sourceColumn, icebergTransform). */
  def createTable(ns: Seq[String], name: String, schema: StructType,
                  partitionCols: Seq[(String, String)],
                  properties: Map[String, String]): Unit
  def dropTable(ns: Seq[String], name: String): Boolean

  /** `DROP TABLE … PURGE`: deregister AND delete the table's files.
    * Default (filesystem warehouse): drop the entry first — readers stop
    * resolving the table before files disappear — then recursively
    * delete the table location under the LOADED table's conf (so a
    * vended-credential table purges under its own credentials). The REST
    * store overrides this to delegate the data delete to the SERVICE via
    * the spec's `purgeRequested=true`. Callers own the gc.enabled guard
    * (a snapshot clone's files belong to its source). */
  def purgeTable(ns: Seq[String], name: String, table: IcebergTable): Boolean = {
    val dropped = dropTable(ns, name)
    if (dropped) {
      // delete the table DIRECTORY, not metadata.location: the FS store's
      // rename moves the directory without rewriting the stored location
      // (IcebergTable.resolve remaps it on read), so the location can be
      // stale — and might now belong to an unrelated recreated table
      val loc = new Path(table.tableDir)
      val fs = loc.getFileSystem(table.conf)
      // Hadoop FileSystems report failure via the boolean — surface it
      // rather than reporting a purge that left the files behind
      if (fs.exists(loc) && !fs.delete(loc, true))
        throw new IllegalStateException(
          s"DROP TABLE PURGE: the catalog entry is gone but deleting " +
            s"$loc failed — the data files remain; remove them manually")
    }
    dropped
  }
  def renameTable(fromNs: Seq[String], fromName: String,
                  toNs: Seq[String], toName: String): Unit

  // -- views (Iceberg view-spec metadata JSON) -------------------------------
  def isView(ns: Seq[String], name: String): Boolean
  def listViews(ns: Seq[String]): Seq[String]
  def loadViewJson(ns: Seq[String], name: String): JsonNode
  def createView(ns: Seq[String], name: String, viewMetadataJson: String): Unit
  def dropView(ns: Seq[String], name: String): Boolean
  def renameView(fromNs: Seq[String], fromName: String,
                 toNs: Seq[String], toName: String): Unit

  /** Property-only view update (Spark's `ViewChange` surface is
    * SetProperty/RemoveProperty), applied IN CALLER ORDER — `(k, Some(v))`
    * sets, `(k, None)` removes, and a remove-then-set of the same key
    * must end set. The warehouse store rewrites the document; the REST
    * store sends the spec's `CommitViewRequest` (assert-view-uuid + one
    * action per change, order preserved) so the SERVICE applies it under
    * its own concurrency control. */
  def updateViewProperties(ns: Seq[String], name: String,
                           changes: Seq[(String, Option[String])]): Unit

  /** Location a view committed under `ns.name` should record. */
  def viewLocation(ns: Seq[String], name: String): String

  /** Physical location of a namespace, when the store has one. */
  def namespaceLocation(ns: Seq[String]): Option[String] = None

  /** Commit transport for writes to `ns.name`: how a writer's
    * (requirements, updates) pair becomes the table's new state. The
    * filesystem warehouse commits locally (the latest metadata file IS
    * the table state — [[graft.iceberg.FsCommitter]]); REST POSTs a
    * `CommitTableRequest` to the service that owns the pointer. */
  def committerFor(ns: Seq[String], name: String, table: IcebergTable,
                   conf: Configuration): graft.iceberg.TableCommitter =
    new graft.iceberg.FsCommitter(table.tableDir, conf)

  // -- staged CREATE (atomic CTAS half of StagingTableCatalog) ----------------

  /** Stage a CREATE: produce the staging target — the table's eventual
    * location, a staging directory the write's files land in, and the
    * metadata document (its `location` already pointing at the staging
    * dir) the staged write plans against. NOTHING becomes visible to
    * readers: the FS store writes no metadata file (only a dot-marker
    * that hides the half-built directory from namespace listings); the
    * REST store sends the spec's `stage-create = true`, which returns
    * the composed document without registering the table. */
  def stageCreateTable(ns: Seq[String], name: String, schema: StructType,
                       partitionCols: Seq[(String, String)],
                       properties: Map[String, String]): StagedBase

  /** Publish a staged CREATE as ONE atomic step. `updates` is the full
    * REST-spec update list that builds the table from
    * [[graft.iceberg.MetadataCommit.stagedCreateSeed]] (DDL decomposition
    * + the staged write's recorded snapshot updates); `requirements`
    * leads with `assert-create`. The FS store applies the updates
    * locally and publishes with exclusive-create of the first metadata
    * file (its assert-create); the REST store POSTs the pair and the
    * service arbitrates. Throws
    * [[graft.iceberg.CommitConflictException]] when a rival created the
    * table first. */
  def publishStagedCreate(ns: Seq[String], name: String, base: StagedBase,
                          requirements: Seq[JsonNode],
                          updates: Seq[JsonNode]): Unit

  /** Abort a staged CREATE: delete the staged files; the catalog never
    * saw the table. Also called after a failed publish. */
  def cleanupStagedCreate(ns: Seq[String], name: String,
                          base: StagedBase): Unit = {
    val p = new Path(base.stagedDir)
    val fs = p.getFileSystem(base.conf)
    try fs.delete(p, true) catch { case _: Exception => () }
  }
}

/** Staging target of an atomic CREATE/REPLACE: where the committed table
  * lives (`realLocation`), where the staged write's files go
  * (`stagedDir`, removed wholesale on abort), and the metadata document
  * the staged write plans against (location = stagedDir). */
final case class StagedBase(
    realLocation: String,
    stagedDir: String,
    baseRootJson: String,
    conf: Configuration,
    vended: Map[String, String] = Map.empty)

/** Filesystem-warehouse store: `<warehouse>/<ns...>/<name>/metadata/...`
  * through Hadoop `FileSystem`, so `file://`, `s3a://`, … behave alike
  * (the reference's object-store indirection, A10).
  */
final class FsCatalogStore(warehouse: Path, conf: Configuration) extends CatalogStore {

  private lazy val fs: FileSystem = warehouse.getFileSystem(conf)
  private val mapper = new ObjectMapper()

  private def dirFor(parts: Seq[String]): Path =
    parts.foldLeft(warehouse)((p, n) => new Path(p, n))

  private def metaFiles(dir: Path, suffix: String): Seq[Path] =
    try {
      val md = new Path(dir, "metadata")
      if (!fs.exists(md)) Nil
      else fs.listStatus(md).map(_.getPath).filter(_.getName.endsWith(suffix)).toSeq
    } catch { case _: Exception => Nil }

  // Fast path first: FsCommitter leaves an advisory version-hint file
  // after every commit, so two point lookups answer "is this a table"
  // (the hint AND the metadata file it names — a bare leftover hint with
  // no metadata.json must not report a table that would fail at load,
  // ADVICE r20) without listing a metadata directory that also holds
  // every manifest (O(commit history) per existence check otherwise — a
  // hot frame in commit-loop sampling). Freshly created tables (v0/v1
  // only, no commit yet), foreign-written tables, and orphan hints fall
  // back to the listing.
  private def isTableDir(dir: Path): Boolean =
    graft.iceberg.TableMetadata.hintedTableExists(dir.toString, conf) ||
      metaFiles(dir, ".metadata.json").nonEmpty
  // `.view.json` is the pre-view-spec format this catalog wrote before
  // round 3; still recognized (and up-converted on read) so existing
  // warehouses don't lose their views
  private def isViewDir(dir: Path): Boolean =
    metaFiles(dir, ".view-metadata.json").nonEmpty ||
      metaFiles(dir, ".view.json").nonEmpty

  private def childDirs(dir: Path): Seq[Path] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath).toSeq

  /** A directory holding an in-flight staged CREATE (marker file, no
    * metadata yet): invisible to namespace listings and existence checks
    * — without this, the pre-publish window would surface the half-built
    * table directory as a namespace. Once the publish lands a metadata
    * file, `isTableDir` wins regardless of a leftover marker. */
  private def isStagedDir(dir: Path): Boolean =
    try fs.exists(new Path(dir, FsCatalogStore.StagedMarker))
    catch { case _: Exception => false }

  override def listNamespaces(parent: Seq[String]): Seq[Seq[String]] =
    childDirs(dirFor(parent))
      .filterNot(d => isTableDir(d) || isViewDir(d) || isStagedDir(d))
      .map(d => parent :+ d.getName)

  override def namespaceExists(ns: Seq[String]): Boolean = {
    val dir = dirFor(ns)
    ns.isEmpty || (fs.exists(dir) && !isTableDir(dir) && !isViewDir(dir) &&
      !isStagedDir(dir))
  }

  override def createNamespace(ns: Seq[String]): Unit = {
    val dir = dirFor(ns)
    // stale staging debris (a crashed staged CREATE that never published
    // and never aborted) must not block the name forever: clear it.
    // AGE-GATED: a fresh marker is indistinguishable from an IN-FLIGHT
    // staged CTAS, and deleting its half-written staged files would let
    // the publish still succeed (exclusive v0 create) while committing
    // metadata that references now-missing files — a silently corrupt
    // table. Only markers older than StagedDebrisAgeMs (no live staging
    // attempt runs that long) are treated as debris.
    if (isStagedDir(dir) && !isTableDir(dir) && stagedMarkerIsStale(dir)) {
      try {
        fs.delete(new Path(dir, FsCatalogStore.StagedMarker), false)
        fs.delete(new Path(dir, FsCatalogStore.StagedSubdir), true)
      } catch { case _: Exception => () }
    }
    fs.mkdirs(dir)
    ()
  }

  /** True when the staged marker's modification time is old enough that
    * the staging attempt that wrote it is certainly dead. Unreadable
    * mtime counts as fresh — never destroy what we cannot date. */
  private def stagedMarkerIsStale(dir: Path): Boolean =
    try {
      val st = fs.getFileStatus(new Path(dir, FsCatalogStore.StagedMarker))
      System.currentTimeMillis() - st.getModificationTime >
        FsCatalogStore.StagedDebrisAgeMs
    } catch { case _: Exception => false }

  /** Namespace properties live in a dot-file INSIDE the namespace
    * directory — a plain file, so the directory-shaped listings
    * (`childDirs`) never mistake it for a table or child namespace. */
  private def nsPropsPath(ns: Seq[String]): Path =
    new Path(dirFor(ns), ".graft-namespace-properties.json")

  override def namespaceProperties(ns: Seq[String]): Map[String, String] = {
    val p = nsPropsPath(ns)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val node = try mapper.readTree(in.readAllBytes()) finally in.close()
      node.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }
  }

  /** Serializes in-process ALTER NAMESPACE read-merge-write cycles: two
    * concurrent session ALTERs would otherwise both read the same base
    * and one update would silently vanish (the r18 advice). Cross-process
    * rivals remain last-writer-wins — the promote below is a single
    * atomic overwrite, so no crash or race can DROP the whole document. */
  private val nsPropsLock = new Object

  override def updateNamespaceProperties(
      ns: Seq[String], changes: Seq[(String, Option[String])]): Unit =
    nsPropsLock.synchronized {
      if (!namespaceExists(ns)) throw new NoSuchElementException(
        s"namespace ${ns.mkString(".")} does not exist")
      val merged = changes.foldLeft(namespaceProperties(ns)) {
        case (acc, (k, Some(v))) => acc + (k -> v)
        case (acc, (k, None)) => acc - k
      }
      val node = mapper.createObjectNode()
      merged.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
      // write-then-promote (same discipline as table commits): a crash
      // mid-write must never leave a truncated document that wedges every
      // later read. The promote is FileContext.rename with OVERWRITE —
      // one atomic step, so readers see either the old document or the
      // new one, never a missing file (the r18 advice: the previous
      // delete-then-rename had a window where a crash dropped ALL
      // properties permanently).
      val dest = nsPropsPath(ns)
      val tmp = new Path(dest.getParent,
        s".graft-namespace-properties.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
      val out = fs.create(tmp, true)
      try out.write(mapper.writeValueAsBytes(node)) finally out.close()
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          dest.toUri, conf)
        fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case e: java.io.IOException =>
          try fs.delete(tmp, false) catch { case _: Exception => () }
          throw new IllegalStateException(
            s"namespace properties promote failed: could not rename " +
              s"$tmp onto $dest: ${e.getMessage}", e)
      }
    }

  override def dropNamespace(ns: Seq[String], cascade: Boolean): Boolean = {
    val dir = dirFor(ns)
    if (!fs.exists(dir)) false
    else if (!cascade && childDirs(dir).nonEmpty)
      throw new IllegalStateException(s"namespace ${ns.mkString(".")} is not empty")
    else fs.delete(dir, true)
  }

  override def listTables(ns: Seq[String]): Seq[String] =
    childDirs(dirFor(ns)).filter(isTableDir).map(_.getName)

  override def tableExists(ns: Seq[String], name: String): Boolean =
    isTableDir(dirFor(ns :+ name))

  /** Latest metadata file path: an external commit writes a new file and
    * naturally misses the cache. */
  /** Path + length + mtime of the latest metadata file: a dropped and
    * recreated table can reuse the exact metadata path (v1.metadata.json
    * again), so the path alone would serve a stale cached table whose
    * planned data files no longer exist. */
  override def tableToken(ns: Seq[String], name: String): Option[String] = {
    val p = TableMetadata.latestMetadataPath(dirFor(ns :+ name).toString, conf)
    val st = fs.getFileStatus(p)
    Some(s"$p#${st.getLen}#${st.getModificationTime}")
  }

  override def loadIcebergTable(ns: Seq[String], name: String): IcebergTable =
    new IcebergTable(dirFor(ns :+ name).toString, conf)

  override def createTable(ns: Seq[String], name: String, schema: StructType,
                           partitionCols: Seq[(String, String)],
                           properties: Map[String, String]): Unit = {
    val dir = dirFor(ns :+ name)
    val json = IcebergJson.tableMetadata(mapper, dir.toString, schema,
      partitionCols, properties)
    write(new Path(dir, "metadata/v0.metadata.json"), json)
    TableMetadata.writeVersionHint(dir.toString, 0L, conf)
  }

  override def dropTable(ns: Seq[String], name: String): Boolean = {
    val dir = dirFor(ns :+ name)
    isTableDir(dir) && fs.delete(dir, true)
  }

  override def renameTable(fromNs: Seq[String], fromName: String,
                           toNs: Seq[String], toName: String): Unit =
    renameDir(toNs, dirFor(fromNs :+ fromName), dirFor(toNs :+ toName))

  /** Hadoop `FileSystem.rename` reports failure by returning false, not by
    * throwing — surface it. The destination namespace must already exist
    * (creating it here would silently accept bogus targets, e.g. a
    * `RENAME TO cat.ns.t` whose catalog prefix Spark passes through
    * verbatim as a namespace level).
    */
  private def renameDir(toNs: Seq[String], from: Path, to: Path): Unit = {
    if (!namespaceExists(toNs))
      throw new NoSuchElementException(s"namespace ${toNs.mkString(".")} not found")
    if (!fs.rename(from, to))
      throw new IllegalStateException(s"rename failed: $from -> $to")
  }

  override def isView(ns: Seq[String], name: String): Boolean =
    isViewDir(dirFor(ns :+ name))

  override def listViews(ns: Seq[String]): Seq[String] =
    childDirs(dirFor(ns)).filter(isViewDir).map(_.getName)

  override def loadViewJson(ns: Seq[String], name: String): JsonNode = {
    val dir = dirFor(ns :+ name)
    val files = metaFiles(dir, ".view-metadata.json")
    if (files.nonEmpty) {
      val in = fs.open(files.maxBy(_.getName))
      try mapper.readTree(in) finally in.close()
    } else {
      val legacy = metaFiles(dir, ".view.json")
      if (legacy.isEmpty)
        throw new NoSuchElementException(s"view ${(ns :+ name).mkString(".")} not found")
      val in = fs.open(legacy.maxBy(_.getName))
      val old = try mapper.readTree(in) finally in.close()
      legacyToViewSpec(old, dir.toString)
    }
  }

  /** Up-convert the pre-round-3 private view JSON into the Iceberg
    * view-spec shape the catalog reads, so old warehouses keep working. */
  private def legacyToViewSpec(old: JsonNode, location: String): JsonNode = {
    import org.apache.spark.sql.types.DataType
    import scala.jdk.CollectionConverters._
    val root = mapper.createObjectNode()
    root.put("view-uuid", java.util.UUID.nameUUIDFromBytes(
      location.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString)
    root.put("format-version", 1)
    root.put("location", location)
    val schema = DataType.fromJson(old.get("schema").asText)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    root.putArray("schemas").add(IcebergJson.viewSchemaNode(mapper, schema))
    root.put("current-version-id", 1)
    val ver = root.putArray("versions").addObject()
    ver.put("version-id", 1)
    ver.put("schema-id", 0)
    ver.put("timestamp-ms", 0L)
    val rep = ver.putArray("representations").addObject()
    rep.put("type", "sql")
    rep.put("sql", old.get("sql").asText)
    rep.put("dialect", "spark")
    Option(old.get("current-catalog")).foreach(c => ver.put("default-catalog", c.asText))
    val nsArr = ver.putArray("default-namespace")
    Option(old.get("current-namespace"))
      .foreach(_.elements.asScala.foreach(n => nsArr.add(n.asText)))
    val cols = mapper.createArrayNode()
    Option(old.get("query-column-names"))
      .foreach(_.elements.asScala.foreach(n => cols.add(n.asText)))
    root.putObject("properties")
      .put(GraftCatalog.QueryColumnsProp, mapper.writeValueAsString(cols))
    root
  }

  override def createView(ns: Seq[String], name: String, viewMetadataJson: String): Unit =
    write(new Path(dirFor(ns :+ name), "metadata/v1.view-metadata.json"), viewMetadataJson)

  override def updateViewProperties(ns: Seq[String], name: String,
                                    changes: Seq[(String, Option[String])]): Unit = {
    val node = loadViewJson(ns, name).asInstanceOf[ObjectNode]
    val props = Option(node.get("properties"))
      .map(_.asInstanceOf[ObjectNode]).getOrElse(node.putObject("properties"))
    changes.foreach {
      case (k, Some(v)) => props.put(k, v)
      case (k, None) => props.remove(k)
    }
    write(new Path(dirFor(ns :+ name), "metadata/v1.view-metadata.json"),
      mapper.writerWithDefaultPrettyPrinter.writeValueAsString(node))
  }

  override def dropView(ns: Seq[String], name: String): Boolean = {
    val dir = dirFor(ns :+ name)
    isViewDir(dir) && fs.delete(dir, true)
  }

  override def renameView(fromNs: Seq[String], fromName: String,
                          toNs: Seq[String], toName: String): Unit =
    renameDir(toNs, dirFor(fromNs :+ fromName), dirFor(toNs :+ toName))

  override def viewLocation(ns: Seq[String], name: String): String =
    dirFor(ns :+ name).toString

  override def namespaceLocation(ns: Seq[String]): Option[String] =
    Some(dirFor(ns).toString)

  // -- staged CREATE -----------------------------------------------------------

  override def stageCreateTable(ns: Seq[String], name: String,
                                schema: StructType,
                                partitionCols: Seq[(String, String)],
                                properties: Map[String, String]): StagedBase = {
    val dir = dirFor(ns :+ name)
    // hide the half-built directory from namespace listings until the
    // publish lands the first metadata file
    val marker = fs.create(new Path(dir, FsCatalogStore.StagedMarker), true)
    marker.close()
    val stagedDir = new Path(new Path(dir, FsCatalogStore.StagedSubdir),
      java.util.UUID.randomUUID.toString.take(12)).toString
    val baseJson = IcebergJson.tableMetadata(mapper, stagedDir, schema,
      partitionCols, properties)
    StagedBase(dir.toString, stagedDir, baseJson, conf)
  }

  override def publishStagedCreate(ns: Seq[String], name: String,
                                   base: StagedBase,
                                   requirements: Seq[JsonNode],
                                   updates: Seq[JsonNode]): Unit = {
    import graft.iceberg.MetadataCommit
    val dir = dirFor(ns :+ name)
    // assert-create is checked HERE (the seed below is not a table
    // state); the remaining requirements check against the seed exactly
    // as a REST service would
    if (isTableDir(dir))
      throw new graft.iceberg.CommitConflictException(
        s"staged CREATE of ${(ns :+ name).mkString(".")} lost the race: " +
          "the table already exists")
    val rest = requirements.filterNot(r =>
      Option(r.get("type")).exists(_.asText == "assert-create"))
    val seed = MetadataCommit.stagedCreateSeed(mapper)
    MetadataCommit.checkRequirements(seed, rest).foreach(err =>
      throw new graft.iceberg.CommitConflictException(
        s"staged CREATE of ${(ns :+ name).mkString(".")} rejected: $err"))
    val root = MetadataCommit.applyUpdates(mapper, seed, updates)
    // exclusive create of the first metadata file IS the atomic commit
    // point (same primitive as table commits — FsCommitter's rule)
    graft.iceberg.FsCommitter.requireAtomicCreate(dir.toString, conf)
    val path = new Path(dir, "metadata/v0.metadata.json")
    val out =
      try fs.create(path, false)
      catch {
        case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                  _: java.nio.file.FileAlreadyExistsException) =>
          throw new graft.iceberg.CommitConflictException(
            s"staged CREATE of ${(ns :+ name).mkString(".")} lost the " +
              s"race for ${path.getName}: ${e.getMessage}")
        case e: java.io.IOException if e.getMessage != null &&
            e.getMessage.contains("already exists") =>
          throw new graft.iceberg.CommitConflictException(
            s"staged CREATE of ${(ns :+ name).mkString(".")} lost the " +
              s"race for ${path.getName}: ${e.getMessage}")
      }
    try out.write(mapper.writerWithDefaultPrettyPrinter
      .writeValueAsString(root)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    TableMetadata.writeVersionHint(dir.toString, 0L, conf)
    try fs.delete(new Path(dir, FsCatalogStore.StagedMarker), false)
    catch { case _: Exception => () } // stale marker: isTableDir wins
  }

  override def cleanupStagedCreate(ns: Seq[String], name: String,
                                   base: StagedBase): Unit = {
    super.cleanupStagedCreate(ns, name, base)
    val dir = dirFor(ns :+ name)
    try {
      fs.delete(new Path(dir, FsCatalogStore.StagedMarker), false)
      // Only THIS attempt's staging dir (base.stagedDir, removed by
      // super) belongs to the caller. A committed staged table keeps its
      // data/manifest files under `_staged/<uuid>` by absolute path, so
      // when a rival staged CREATE won the publish race (isTableDir),
      // wiping the whole `_staged` subdir would delete the WINNER's
      // just-committed files — data loss on exactly the race path the
      // conflict handling exists for. Leftover sibling debris is the
      // remove_orphan_files sweep's job, not this abort's.
      if (!isTableDir(dir)) {
        // remove the directory itself when the abort left nothing in it
        fs.delete(new Path(dir, FsCatalogStore.StagedSubdir), true)
        if (!isViewDir(dir) && fs.exists(dir) && fs.listStatus(dir).isEmpty)
          fs.delete(dir, false)
      }
    } catch { case _: Exception => () }
  }

  private def write(path: Path, content: String): Unit = {
    val out = fs.create(path, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}

object FsCatalogStore {
  /** Dot-file marking a table directory whose CREATE is staged but not
    * yet published — namespace-shaped listings skip such directories. */
  val StagedMarker = ".graft-staged"
  /** Subdirectory staged writes land their files in (one random child
    * per staging attempt); abort deletes this attempt's child only —
    * committed staged tables keep files under `_staged/<uuid>`. */
  val StagedSubdir = "_staged"

  /** Staged-marker age beyond which createNamespace may treat the
    * directory as crashed-CTAS debris and clear it (1 hour — far longer
    * than any live staging attempt between stage and publish/abort). */
  val StagedDebrisAgeMs: Long = 60L * 60 * 1000
}
