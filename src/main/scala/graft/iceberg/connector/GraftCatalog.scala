package graft.iceberg.connector

import java.util.concurrent.ConcurrentHashMap
import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis._
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.iceberg.IcebergTable

/** Catalog plugin: `catalog.namespace.table` name resolution over Iceberg
  * tables plus persistent SQL views, with the storage/transport behind a
  * [[CatalogStore]] seam:
  *
  *  - `spark.sql.catalog.<name>.warehouse = /path` → filesystem warehouse
  *    ([[FsCatalogStore]]; layout: `<warehouse>/<ns...>/<name>/metadata/
  *    vN.metadata.json` is a table, `.../vN.view-metadata.json` a view in
  *    Iceberg view-spec format, any other directory a namespace);
  *  - `spark.sql.catalog.<name>.uri = http://host/...` → Iceberg-REST-spec
  *    catalog service ([[RestCatalogStore]]), parity with the reference's
  *    REST crate (`datafusion_iceberg_catalog_rest/src/catalog.rs:23-52` +
  *    `schema.rs:23-63` + `mirror.rs:10-184`).
  *
  * Two deliberate divergences SURVEY §2.A calls for:
  *
  *  - **lazy** per-identifier load + cache instead of the reference's
  *    eager full-catalog mirror (`mirror.rs:23-53` issues N+1 remote calls
  *    at construction — at 100 TB / thousands of tables that's a
  *    minutes-long startup; lazy costs one metadata read per first touch);
  *  - create/drop commit **synchronously** — the reference spawns its
  *    commit on a `LocalPool` it never polls (`mirror.rs:123-143`), so the
  *    intended (not literal) behavior is implemented.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces with ViewCatalog
    with FunctionCatalog with StagingTableCatalog {

  /** The Iceberg partition-transform functions ([[GraftFunctions]]),
    * namespace-independent: Spark resolves storage-partitioned-join
    * transforms by bare name through the TABLE's catalog
    * (`V2ExpressionUtils.loadV2FunctionOpt`), so they must exist in every
    * namespace a table can. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    GraftFunctions.names.map(Identifier.of(namespace, _)).toArray

  override def loadFunction(ident: Identifier):
      org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    GraftFunctions.load(ident.name)
      .getOrElse(throw new NoSuchFunctionException(ident))

  private var catalogName: String = _
  private var store: CatalogStore = _
  private[graft] def storeForTest: CatalogStore = store
  private val mapper = new ObjectMapper()

  /** Declares v3 column-default support so Spark's analyzer ACCEPTS
    * `DEFAULT` clauses in CREATE/ALTER DDL against this catalog (the
    * values themselves live in schema-field metadata either way). */
  override def capabilities(): JSet[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** Lazy table cache (A15 without the eager mirror), guarded by the
    * store's freshness token (for the filesystem store, the latest
    * metadata-file path): an external writer committing new metadata
    * naturally misses the cache, so long-lived sessions never keep
    * serving a stale snapshot. Stores that fetch fresh metadata on every
    * load (REST) opt out via token = None.
    */
  private val cache = new ConcurrentHashMap[String, (String, SparkIcebergTable)]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    // Iceberg scans resolve columns by parquet field id (what makes
    // schema-evolution renames/drops read old files correctly). The DSv2
    // batch path scopes that flag to its own hadoopConf, but the V1
    // bridge (limit pushdown, merge-on-read, partition re-injection)
    // plans through the session-conf-driven file source, where per-read
    // options are ignored — so registering this catalog opts the session
    // in. The flag is inert for read schemas without field-id metadata,
    // i.e. every non-Iceberg read in the session.
    org.apache.spark.sql.SparkSession.active.conf
      .set("spark.sql.parquet.fieldId.read.enabled", "true")
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    store = (Option(options.get("uri")), Option(options.get("warehouse"))) match {
      case (Some(uri), _) =>
        new RestCatalogStore(uri, conf, Option(options.get("token")),
          Option(options.get("page-size")).map(_.toInt),
          // OAuth2 client-credentials grant (the Iceberg REST property
          // names: credential = client_id:client_secret, optional
          // oauth2-server-uri + scope); overrides the static token
          credential = Option(options.get("credential")),
          oauthServerUri = Option(options.get("oauth2-server-uri")),
          oauthScope = Option(options.get("scope")))
      case (None, Some(wh)) => new FsCatalogStore(new Path(wh), conf)
      case _ => throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse " +
          s"(filesystem) or spark.sql.catalog.$name.uri (Iceberg REST)")
    }
  }

  override def name(): String = catalogName

  // -- SupportsNamespaces (A13/A14) -----------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    store.listNamespaces(Nil).map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.nonEmpty && !store.namespaceExists(namespace.toSeq))
      throw new NoSuchNamespaceException(namespace)
    store.listNamespaces(namespace.toSeq).map(_.toArray).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    store.namespaceExists(namespace.toSeq)

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    (store.namespaceLocation(namespace.toSeq)
      .map(l => Map("location" -> l)).getOrElse(Map.empty[String, String]) ++
      store.namespaceProperties(namespace.toSeq)).asJava
  }

  /** `location` is warehouse-derived in both stores: storing a
    * user-supplied one as a plain property would make
    * `loadNamespaceMetadata` REPORT a location no table placement
    * honors — refuse instead of lying. */
  private def refuseNamespaceLocation(keys: Iterable[String]): Unit =
    if (keys.exists(_ == "location"))
      throw new UnsupportedOperationException(
        "custom namespace locations are not supported: table locations " +
          "derive from the warehouse layout")

  override def createNamespace(namespace: Array[String], metadata: JMap[String, String]): Unit = {
    val props = Option(metadata).map(_.asScala.toMap).getOrElse(Map.empty)
      // Spark stamps reserved entries (owner) on every CREATE NAMESPACE;
      // they are session facts, not durable namespace properties
      .filter { case (k, _) => k != "owner" }
    refuseNamespaceLocation(props.keys)
    store.createNamespace(namespace.toSeq, props)
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    val mapped = changes.map {
      case s: NamespaceChange.SetProperty => s.property -> Option(s.value)
      case r: NamespaceChange.RemoveProperty => r.property -> None
      case other => throw new UnsupportedOperationException(
        s"alterNamespace: unsupported change ${other.getClass.getSimpleName}")
    }
    // `owner` is dropped from CREATE (Spark auto-stamps it — a session
    // fact, not a durable property), but an EXPLICIT alter must not
    // report success while storing nothing (the r18 advice): refuse.
    if (mapped.exists(_._1 == "owner"))
      throw new UnsupportedOperationException(
        "ALTER NAMESPACE ... owner: namespace ownership is not stored by " +
          "this catalog (it is a session fact Spark stamps at CREATE) — " +
          "storing it here would report an owner no access control honors")
    refuseNamespaceLocation(mapped.map(_._1))
    if (mapped.nonEmpty)
      store.updateNamespaceProperties(namespace.toSeq, mapped.toSeq)
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val ns = namespace.toSeq
    if (!store.namespaceExists(ns)) false
    else if (!cascade && (store.listNamespaces(ns).nonEmpty ||
      store.listTables(ns).nonEmpty || store.listViews(ns).nonEmpty))
      throw new NonEmptyNamespaceException(
        namespace, s"namespace ${namespace.mkString(".")} is not empty", None)
    else store.dropNamespace(ns, cascade)
  }

  // -- TableCatalog (A14/A16/A17) -------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty && !store.namespaceExists(namespace.toSeq))
      throw new NoSuchNamespaceException(namespace)
    store.listTables(namespace.toSeq).map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    store.tableExists(ident.namespace.toSeq, ident.name)

  /** Tables resolve to Iceberg scans; view identifiers resolve to a
    * SQL-backed table provider (the reference's view-expansion path,
    * `table.rs:102-112`) because Spark's analyzer does not consult
    * `ViewCatalog` during SELECT resolution.
    */
  override def loadTable(ident: Identifier): Table = {
    val ns = ident.namespace.toSeq
    if (store.isView(ns, ident.name)) {
      val v = loadView(ident)
      new GraftSqlViewTable(v.name, v.query, v.schema,
        v.currentCatalog, v.currentNamespace)
    }
    else if (!store.tableExists(ns, ident.name)) {
      // metadata tables: `cat.ns.tbl.snapshots` parses as
      // Identifier(ns :+ tbl, "snapshots") — serve it when the prefix is
      // a real table and the trailing name is a known metadata view
      if (ns.nonEmpty && MetadataTables.names.contains(ident.name) &&
          store.tableExists(ns.init, ns.last)) {
        val parent = (ns :+ ident.name).mkString(".")
        MetadataTables.forName(parent, ident.name,
          store.loadIcebergTable(ns.init, ns.last),
          // store-backed reload: REST tables have no metadata.json on
          // disk — per-batch freshness must go through the service
          () => store.loadIcebergTable(ns.init, ns.last))
      }
      else throw new NoSuchTableException(ident)
    }
    else {
      val fullName = (ident.namespace :+ ident.name).mkString(".")
      def build(): SparkIcebergTable = {
        val tbl = store.loadIcebergTable(ns, ident.name)
        new SparkIcebergTable(fullName, tbl, writable = true,
          Some(store.committerFor(ns, ident.name, tbl, tbl.conf)),
          // store-backed per-batch reload: streaming over REST tables
          // must re-fetch through the service (no metadata.json on disk)
          reload = () => store.loadIcebergTable(ns, ident.name))
      }
      store.tableToken(ns, ident.name) match {
        case None => build()
        case Some(token) =>
          val cached = cache.get(fullName)
          if (cached != null && cached._1 == token) cached._2
          else {
            val t = build()
            cache.put(fullName, (token, t))
            t
          }
      }
    }
  }

  /** `VERSION AS OF <snapshot-id | 'ref-name'>` — Spark hands the version
    * string through verbatim; a non-numeric version resolves through the
    * table's snapshot refs (branches/tags), the stable names `createRef`
    * pins. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val base = loadIcebergTable(ident, s"time travel ($version)")
    val snapId = version.toLongOption
      .orElse(base.table.metadata.refs.get(version))
      .getOrElse(throw new IllegalArgumentException(
        s"VERSION AS OF expects an Iceberg snapshot id or ref name, got " +
          s"'$version' (refs: ${base.table.metadata.refs.keys.mkString(", ")})"))
    new SparkIcebergTable(base.name() + s"@$snapId", base.table.atSnapshot(snapId))
  }

  /** `TIMESTAMP AS OF` — Spark passes MICROseconds since epoch; Iceberg
    * snapshot commit times are milliseconds. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val base = loadIcebergTable(ident, "time travel (timestamp)")
    val pinned = base.table.asOfTimestamp(Math.floorDiv(timestampMicros, 1000L))
    new SparkIcebergTable(
      base.name() + s"@${pinned.pinnedSnapshotId.get}", pinned)
  }

  private def loadIcebergTable(ident: Identifier, what: String): SparkIcebergTable =
    loadTable(ident) match {
      case t: SparkIcebergTable => t
      case _ => throw new UnsupportedOperationException(
        s"$what is only supported on Iceberg tables, not views: $ident")
    }

  override def invalidateTable(ident: Identifier): Unit =
    cache.remove((ident.namespace :+ ident.name).mkString("."))

  /** CREATE TABLE: commit v0 metadata (schema + identity partition spec,
    * no snapshot) — parity with the reference registering a
    * `(identifier, metadata_location)` pair (`mirror.rs:103-145`), done
    * synchronously.
    */
  /** Spark's transform surface → Iceberg transform strings. SQL forms:
    * PARTITIONED BY (col), (days(ts)), (bucket(4, id)), (truncate(name, 3)) */
  private def toPartitionCols(partitions: Array[Transform]): Seq[(String, String)] = {
    def refOf(t: Transform): String = t.references.head.fieldNames.mkString(".")
    def intArg(t: Transform): Int = t.arguments.collectFirst {
      case lit: org.apache.spark.sql.connector.expressions.Literal[_] =>
        lit.value.asInstanceOf[Number].intValue
    }.getOrElse(throw new IllegalArgumentException(
      s"transform ${t.name} needs an integer argument: $t"))
    partitions.toSeq.map { t =>
      t.name match {
        case "identity" => refOf(t) -> "identity"
        case "years" | "year" => refOf(t) -> "year"
        case "months" | "month" => refOf(t) -> "month"
        case "days" | "day" => refOf(t) -> "day"
        case "hours" | "hour" => refOf(t) -> "hour"
        case "bucket" => refOf(t) -> s"bucket[${intArg(t)}]"
        case "truncate" => refOf(t) -> s"truncate[${intArg(t)}]"
        case other => throw new UnsupportedOperationException(
          s"unsupported partition transform: $other")
      }
    }
  }

  /** Birth-time shape validation shared by CREATE TABLE and the staged
    * CREATE/REPLACE paths — every rule that would otherwise produce a
    * write-dead or foreign-reader-misread table fails the DDL instead of
    * the first INSERT. `bornV3` = the table WILL be format-version 3
    * (declared now, or — for REPLACE — already upgraded). */
  private def validateTableShape(schema: StructType,
                                 partitionCols: Seq[(String, String)],
                                 props: Map[String, String],
                                 bornV3: Boolean): Unit = {
    // a declared-avro table with an avro-unwritable column would be
    // born write-dead (every INSERT fails) — refuse at CREATE, the same
    // guard surface the ALTER-to-avro flip already has
    if (props.get("write.format-default").exists(_.equalsIgnoreCase("avro")))
      graft.iceberg.AvroDataWrite.requireWritable(schema)
    // column DEFAULTs are a v3 schema feature (initial-/write-default):
    // a table born with them must be born format-version 3 — refuse
    // rather than emit v2 metadata foreign readers would misread
    if (schema.fields.exists(f => f.metadata.contains("CURRENT_DEFAULT") ||
        f.metadata.contains("EXISTS_DEFAULT")) && !bornV3)
      throw new UnsupportedOperationException(
        "CREATE TABLE with column DEFAULTs needs Iceberg format-version 3 " +
          "— add TBLPROPERTIES ('format-version' = '3')")
    // v3 TYPES (variant / VOID=unknown): the same birth rule — refuse to
    // emit them into v2 metadata foreign readers would misparse
    if (schema.fields.exists(f => IcebergJson.containsV3Type(f.dataType)) &&
        !bornV3)
      throw new UnsupportedOperationException(
        "CREATE TABLE with VARIANT / VOID (unknown) columns needs Iceberg " +
          "format-version 3 — add TBLPROPERTIES ('format-version' = '3')")
    // nested unknown has no writable parquet shape (top-level unknown is
    // stripped from data files; a struct field cannot be) — refuse at
    // CREATE, the table would be born write-dead
    schema.fields.find(f => IcebergJson.containsNestedUnknown(f.dataType))
      .foreach { f =>
        throw new UnsupportedOperationException(
          s"column '${f.name}': VOID (unknown) nested inside a composite " +
            "type cannot be stored in data files — declare it as a " +
            "TOP-LEVEL column (never stored, reads null) or use a typed " +
            "field")
      }
    // partition transform/source-type validation at CREATE — the same
    // spec table ADD PARTITION FIELD enforces (identity refuses
    // variant/void; temporal transforms need temporal sources; bad specs
    // fail the DDL, not the first INSERT)
    partitionCols.foreach { case (col, transform) =>
      schema.find(_.name == col).foreach(f =>
        graft.iceberg.PartitionEvolution.validateSourceType(
          transform, f.dataType, col))
    }
    // this engine's ORC kernel has no variant/unknown encoding — a
    // declared-orc table with one would be born write-dead
    if (props.get("write.format-default").exists(_.equalsIgnoreCase("orc")) &&
        schema.fields.exists(f => IcebergJson.containsV3Type(f.dataType)))
      throw new UnsupportedOperationException(
        "write.format-default = orc cannot store VARIANT / VOID (unknown) " +
          "columns — use parquet")
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partitionCols = toPartitionCols(partitions)
    val props = Option(properties).map(_.asScala.toMap).getOrElse(Map.empty)
    validateTableShape(schema, partitionCols, props,
      bornV3 = props.get("format-version").contains("3"))
    store.createTable(ident.namespace.toSeq, ident.name, schema, partitionCols,
      props)
    loadTable(ident)
  }

  // -- StagingTableCatalog: atomic CREATE / REPLACE (AS SELECT) ---------------
  // Spark plans CTAS/RTAS/CREATE OR REPLACE through these when the
  // catalog implements StagingTableCatalog — the write lands in a staged
  // location and `commitStagedChanges` publishes it as ONE metadata
  // swap. Without them Spark falls back to non-atomic drop-then-create
  // (a mid-write failure would leave the table GONE). Orchestration in
  // [[StagedTables]]; the Column[]/TableInfo overloads delegate here.

  override def stageCreate(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): org.apache.spark.sql.connector.catalog.StagedTable = {
    if (tableExists(ident) || viewExists(ident))
      throw new TableAlreadyExistsException(ident)
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(ident.namespace)
    val partitionCols = toPartitionCols(partitions)
    val props = Option(properties).map(_.asScala.toMap).getOrElse(Map.empty)
    validateTableShape(schema, partitionCols, props,
      bornV3 = props.get("format-version").contains("3"))
    StagedTables.stageCreate(store, catalogName, ident.namespace.toSeq,
      ident.name, schema, partitionCols, props,
      onCommitted = () => invalidateTable(ident))
  }

  override def stageReplace(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): org.apache.spark.sql.connector.catalog.StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    stageReplaceInternal(ident, schema, partitions, properties)
  }

  override def stageCreateOrReplace(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): org.apache.spark.sql.connector.catalog.StagedTable =
    if (tableExists(ident)) stageReplaceInternal(ident, schema, partitions, properties)
    else stageCreate(ident, schema, partitions, properties)

  private def stageReplaceInternal(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): org.apache.spark.sql.connector.catalog.StagedTable = {
    if (viewExists(ident))
      throw new UnsupportedOperationException(
        s"REPLACE TABLE on a VIEW: $ident is a view — use CREATE OR " +
          "REPLACE VIEW")
    val partitionCols = toPartitionCols(partitions)
    val props = Option(properties).map(_.asScala.toMap).getOrElse(Map.empty)
    val ns = ident.namespace.toSeq
    // Only "table absent" may downgrade to false — a transient metadata
    // load failure must surface, not silently misjudge the format
    // version and refuse a valid v3 REPLACE with a misleading error.
    val baseV3 =
      try store.loadIcebergTable(ns, ident.name).metadata.formatVersion >= 3
      catch { case _: NoSuchElementException => false }
    validateTableShape(schema, partitionCols, props,
      bornV3 = props.get("format-version").contains("3") || baseV3)
    StagedTables.stageReplace(store, catalogName, ns, ident.name, schema,
      partitionCols, props, onCommitted = () => invalidateTable(ident))
  }

  /** ALTER TABLE as Iceberg schema evolution ([[graft.iceberg.SchemaEvolution]]):
    * a new schema entry + current-schema-id move in the next metadata
    * version — no data file is touched; old files read through field-id
    * resolution. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = loadIcebergTable(ident, "ALTER TABLE")
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    graft.iceberg.SchemaEvolution.alter(t.table.tableDir, conf, changes.toSeq,
      Some(store.committerFor(ident.namespace.toSeq, ident.name, t.table, conf)))
    invalidateTable(ident)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    invalidateTable(ident)
    store.dropTable(ident.namespace.toSeq, ident.name)
  }

  /** `DROP TABLE … PURGE`: deregister and physically delete the data.
    * Refused on snapshot clones (`gc.enabled=false` — their files belong
    * to the source table; plain DROP deregisters only), the same guard
    * the destructive maintenance procedures use. */
  override def purgeTable(ident: Identifier): Boolean = {
    val t =
      try store.loadIcebergTable(ident.namespace.toSeq, ident.name)
      catch {
        // REST maps 404 here; the FS store surfaces a missing directory
        // as FileNotFound / "no metadata.json" — all mean "nothing to
        // purge", the contract's false
        case _: NoSuchElementException => return false
        case _: java.io.FileNotFoundException => return false
        case e: IllegalArgumentException
            if e.getMessage != null &&
              e.getMessage.contains("no metadata.json") => return false
      }
    if (t.metadata.properties.get("gc.enabled").contains("false"))
      throw new UnsupportedOperationException(
        s"DROP TABLE PURGE on ${ident.namespace.mkString(".")}." +
          s"${ident.name} refused: gc.enabled=false (a snapshot clone — " +
          "its data files belong to the source table; purging would " +
          "corrupt it). DROP TABLE without PURGE deregisters only.")
    invalidateTable(ident)
    store.purgeTable(ident.namespace.toSeq, ident.name, t)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    if (!store.namespaceExists(newIdent.namespace.toSeq))
      throw new NoSuchNamespaceException(newIdent.namespace)
    invalidateTable(oldIdent)
    store.renameTable(oldIdent.namespace.toSeq, oldIdent.name,
      newIdent.namespace.toSeq, newIdent.name)
  }

  // -- ViewCatalog (A12: persistent views) ----------------------------------

  override def listViews(namespace: String*): Array[Identifier] =
    store.listViews(namespace).map(Identifier.of(namespace.toArray, _)).toArray

  override def viewExists(ident: Identifier): Boolean =
    store.isView(ident.namespace.toSeq, ident.name)

  /** Read a view from Iceberg view-spec metadata: current version id →
    * version record → `spark`-dialect SQL representation + default
    * catalog/namespace; schema by the version's schema-id, parsed from the
    * Iceberg struct form.
    */
  override def loadView(ident: Identifier): View = {
    val node =
      try store.loadViewJson(ident.namespace.toSeq, ident.name)
      catch { case _: NoSuchElementException => throw new NoSuchViewException(ident) }
    val currentId = node.get("current-version-id").asInt
    val ver = node.get("versions").elements.asScala
      .find(_.get("version-id").asInt == currentId)
      .getOrElse(throw new IllegalStateException(
        s"view $ident: current-version-id $currentId not in versions"))
    val reps = ver.get("representations").elements.asScala.toSeq
      .filter(_.get("type").asText == "sql")
    val rep = reps.find(r => Option(r.get("dialect")).forall(_.asText == "spark"))
      .orElse(reps.headOption)
      .getOrElse(throw new IllegalStateException(
        s"view $ident has no SQL representation"))
    val schemaId = ver.get("schema-id").asInt
    val schemaNode = node.get("schemas").elements.asScala
      .find(_.get("schema-id").asInt == schemaId)
      .getOrElse(throw new IllegalStateException(
        s"view $ident: schema-id $schemaId not in schemas"))
    val queryCols = Option(node.get("properties"))
      .flatMap(p => Option(p.get(GraftCatalog.QueryColumnsProp)))
      .map(t => mapper.readTree(t.asText).elements.asScala.map(_.asText).toArray)
      .getOrElse(Array.empty[String])
    GraftView(
      viewName = (ident.namespace :+ ident.name).mkString("."),
      sql = rep.get("sql").asText,
      catalog = Option(ver.get("default-catalog")).map(_.asText).getOrElse(catalogName),
      namespace = Option(ver.get("default-namespace"))
        .map(_.elements.asScala.map(_.asText).toArray).getOrElse(Array.empty),
      viewSchema = graft.iceberg.TableMetadata.toSparkType(schemaNode)
        .asInstanceOf[StructType],
      queryCols = queryCols)
  }

  /** Persist the view as **Iceberg view-spec metadata** (view-uuid +
    * versions + SQL representations + Iceberg-format schema) — the same
    * commit the reference runs through `ViewBuilder…commit()`
    * (`table.rs:393-403`), and readable by any external Iceberg view
    * consumer. Spark's `queryColumnNames` (not an Iceberg concept) rides
    * in a JSON-array property. A new session loading this catalog sees
    * the view again (tested in `CatalogSpec`).
    */
  override def createView(info: ViewInfo): View = {
    val ident = info.ident
    if (viewExists(ident)) throw new ViewAlreadyExistsException(ident)
    val ns = ident.namespace.toSeq
    val location = store.viewLocation(ns, ident.name)
    val nowMs = System.currentTimeMillis
    val root = mapper.createObjectNode()
    root.put("view-uuid", java.util.UUID.nameUUIDFromBytes(
      location.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString)
    root.put("format-version", 1)
    root.put("location", location)
    root.putArray("schemas").add(IcebergJson.viewSchemaNode(mapper, info.schema))
    root.put("current-version-id", 1)
    val ver = root.putArray("versions").addObject()
    ver.put("version-id", 1)
    ver.put("schema-id", 0)
    ver.put("timestamp-ms", nowMs)
    ver.putObject("summary").put("engine-name", "spark")
    val rep = ver.putArray("representations").addObject()
    rep.put("type", "sql")
    rep.put("sql", info.sql)
    rep.put("dialect", "spark")
    ver.put("default-catalog", Option(info.currentCatalog).getOrElse(catalogName))
    val nsArr = ver.putArray("default-namespace")
    Option(info.currentNamespace).getOrElse(Array.empty[String]).foreach(nsArr.add)
    val vl = root.putArray("version-log").addObject()
    vl.put("timestamp-ms", nowMs)
    vl.put("version-id", 1)
    val cols = mapper.createArrayNode()
    Option(info.queryColumnNames).getOrElse(Array.empty[String]).foreach(cols.add)
    root.putObject("properties")
      .put(GraftCatalog.QueryColumnsProp, mapper.writeValueAsString(cols))
    store.createView(ns, ident.name,
      mapper.writerWithDefaultPrettyPrinter.writeValueAsString(root))
    loadView(ident)
  }

  /** Spark's `ViewChange` surface is property-only (SetProperty /
    * RemoveProperty); SQL-text changes are CREATE OR REPLACE territory.
    * The warehouse store rewrites the document; the REST store commits a
    * `CommitViewRequest` so the service owns concurrency control. */
  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val ordered = changes.map {
      case c: ViewChange.SetProperty => c.property -> Some(c.value)
      case c: ViewChange.RemoveProperty => c.property -> None
      case other => throw new UnsupportedOperationException(
        s"unsupported ViewChange: $other")
    }
    try store.updateViewProperties(ident.namespace.toSeq, ident.name, ordered)
    catch { case _: NoSuchElementException => throw new NoSuchViewException(ident) }
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean =
    store.dropView(ident.namespace.toSeq, ident.name)

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!viewExists(oldIdent)) throw new NoSuchViewException(oldIdent)
    if (viewExists(newIdent)) throw new ViewAlreadyExistsException(newIdent)
    if (!store.namespaceExists(newIdent.namespace.toSeq))
      throw new NoSuchNamespaceException(newIdent.namespace)
    store.renameView(oldIdent.namespace.toSeq, oldIdent.name,
      newIdent.namespace.toSeq, newIdent.name)
  }
}

object GraftCatalog {
  /** Property carrying Spark's view queryColumnNames (a JSON string
    * array) inside Iceberg view-spec metadata, which has no such field. */
  val QueryColumnsProp = "spark.query-column-names"
}

/** Persistent-view record: Spark's analyzer inlines `query()` and
  * re-plans it, the same expansion the reference runs at scan time
  * (`table.rs:102-112`).
  */
final case class GraftView(
    viewName: String,
    sql: String,
    catalog: String,
    namespace: Array[String],
    viewSchema: StructType,
    queryCols: Array[String]) extends View {
  override def name(): String = viewName
  override def query(): String = sql
  override def currentCatalog(): String = catalog
  override def currentNamespace(): Array[String] = namespace
  override def schema(): StructType = viewSchema
  override def queryColumnNames(): Array[String] = queryCols
  override def columnAliases(): Array[String] = Array.empty
  override def columnComments(): Array[String] = Array.empty
  override def properties(): JMap[String, String] = Map.empty[String, String].asJava
}

/** Writer for minimal Iceberg v1 table-metadata JSON (CREATE TABLE). */
object IcebergJson {

  def icebergType(dt: DataType): String = dt match {
    case BooleanType      => "boolean"
    case IntegerType      => "int"
    case ShortType | ByteType => "int"
    case LongType         => "long"
    case FloatType        => "float"
    case DoubleType       => "double"
    case DateType         => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType    => "timestamptz"
    case StringType       => "string"
    case BinaryType       => "binary"
    case d: DecimalType   => s"decimal(${d.precision}, ${d.scale})"
    // v3: Spark's native VariantType ↔ the spec's `variant`; NullType
    // (Spark's VOID, e.g. a CTAS `lit(null)` column) ↔ `unknown` —
    // always-null, never stored in data files. Both v3-gated by callers.
    case VariantType      => "variant"
    case NullType         => "unknown"
    case other => throw new UnsupportedOperationException(s"cannot write type $other")
  }

  /** True when NullType (unknown) appears NESTED inside a composite
    * type. Top-level unknown columns are fine — the writer strips them
    * from data files per the spec's never-stored rule — but a nested
    * unknown has no writable parquet shape (Spark's writer refuses
    * NullType inside groups), so a table holding one would be born
    * write-dead. Refused at CREATE and ADD COLUMN. */
  def containsNestedUnknown(dt: DataType): Boolean = {
    def inner(d: DataType): Boolean = d match {
      case NullType => true
      case s: StructType => s.fields.exists(f => inner(f.dataType))
      case a: ArrayType  => inner(a.elementType)
      case m: MapType    => inner(m.keyType) || inner(m.valueType)
      case _ => false
    }
    dt match {
      case NullType => false
      case s: StructType => s.fields.exists(f => inner(f.dataType))
      case a: ArrayType  => inner(a.elementType)
      case m: MapType    => inner(m.keyType) || inner(m.valueType)
      case _ => false
    }
  }

  /** True when the type tree contains a v3-only type (variant / unknown)
    * — the schema features that must never transit v2 metadata. */
  def containsV3Type(dt: DataType): Boolean = dt match {
    case VariantType | NullType => true
    case s: StructType => s.fields.exists(f => containsV3Type(f.dataType))
    case a: ArrayType  => containsV3Type(a.elementType)
    case m: MapType    => containsV3Type(m.keyType) || containsV3Type(m.valueType)
    case _ => false
  }

  /** THE Iceberg JSON type serializer (struct/list/map with injected id
    * allocation; primitives as text nodes) — shared by view-spec schema
    * nodes, table-metadata schema nodes, and schema evolution's ADD
    * COLUMN, so the spec format cannot drift between write paths. The
    * caller owns the id allocator: views number everything depth-first
    * from 1; table metadata pins top-level ids positionally and
    * allocates nested ids after the top-level block; evolution continues
    * from `last-column-id`. */
  def typeNodeWithIds(mapper: ObjectMapper, dt: DataType,
                      nextId: () => Int): com.fasterxml.jackson.databind.JsonNode =
    dt match {
      case s: StructType =>
        val o = mapper.createObjectNode()
        o.put("type", "struct")
        val arr = o.putArray("fields")
        s.fields.foreach { f =>
          val fn = arr.addObject()
          fn.put("id", nextId())
          fn.put("name", f.name)
          fn.put("required", !f.nullable)
          fn.set[ObjectNode]("type", typeNodeWithIds(mapper, f.dataType, nextId))
          fieldDefaults(mapper, fn, f)
        }
        o
      case a: ArrayType =>
        val o = mapper.createObjectNode()
        o.put("type", "list")
        o.put("element-id", nextId())
        o.put("element-required", !a.containsNull)
        o.set[ObjectNode]("element", typeNodeWithIds(mapper, a.elementType, nextId))
        o
      case m: MapType =>
        val o = mapper.createObjectNode()
        o.put("type", "map")
        o.put("key-id", nextId())
        o.set[ObjectNode]("key", typeNodeWithIds(mapper, m.keyType, nextId))
        o.put("value-id", nextId())
        o.put("value-required", !m.valueContainsNull)
        o.set[ObjectNode]("value", typeNodeWithIds(mapper, m.valueType, nextId))
        o
      case p => mapper.getNodeFactory.textNode(icebergType(p))
    }

  /** Emit the v3 `initial-default` / `write-default` field attributes
    * from Spark's column-default StructField metadata (the CREATE TABLE
    * ... DEFAULT surface): `EXISTS_DEFAULT` → initial-default,
    * `CURRENT_DEFAULT` → write-default, both analyzed against the
    * column's type and folded to the spec's JSON single value. A DEFAULT
    * NULL folds to null and is omitted (absent means no default). */
  def fieldDefaults(mapper: ObjectMapper, fn: ObjectNode,
                    f: org.apache.spark.sql.types.StructField): Unit = {
    def put(metaKey: String, attr: String): Unit =
      if (f.metadata.contains(metaKey)) {
        graft.iceberg.DefaultValues.requireDefaultable(
          f.name, f.dataType, "CREATE TABLE column")
        val v = graft.iceberg.DefaultValues.analyzeSql(
          f.name, f.dataType, f.metadata.getString(metaKey), "CREATE TABLE")
        if (v != null)
          fn.set[ObjectNode](attr, graft.iceberg.DefaultValues
            .catalystToJson(mapper, v, icebergType(f.dataType)))
      }
    put("EXISTS_DEFAULT", "initial-default")
    put("CURRENT_DEFAULT", "write-default")
  }

  /** An Iceberg-format schema node (struct with per-field ids, nested
    * list/map/struct supported) for view-spec metadata and REST
    * CreateTableRequest payloads. Field ids are assigned depth-first; the
    * numbering only needs to be unique and stable per write.
    */
  def viewSchemaNode(mapper: ObjectMapper, schema: StructType): ObjectNode = {
    var id = 0
    def next(): Int = { id += 1; id }
    val root = typeNodeWithIds(mapper, schema, next _).asInstanceOf[ObjectNode]
    root.put("schema-id", 0)
    root
  }

  /** Spec-field name for a (sourceCol, transform) pair — the Iceberg
    * writer convention: identity keeps the column name; transforms
    * suffix it (`ts_day`, `id_bucket`, `s_trunc`). */
  def specFieldName(sourceCol: String, transform: String): String =
    graft.iceberg.PartitionEvolution.specFieldName(sourceCol, transform)

  /** `partitionCols` entries are (sourceColumn, icebergTransform) —
    * e.g. ("ts", "day"), ("id", "bucket[4]"), ("name", "identity"). */
  def tableMetadata(
      mapper: ObjectMapper,
      location: String,
      schema: StructType,
      partitionCols: Seq[(String, String)],
      properties: Map[String, String]): String = {
    val root = mapper.createObjectNode()
    // v2: tables this catalog creates may later carry row-level deletes
    // (DELETE FROM commits equality-delete files), a v2 feature. A table
    // DECLARED v3 (`format-version = 3` property) is stamped v3 at birth
    // — the first-commit upgrade stays for tables that flip later, but a
    // v3-born table can carry v3 schema features (column defaults) in
    // its very first metadata file.
    val bornV3 = properties.get("format-version").contains("3")
    root.put("format-version", if (bornV3) 3 else 2)
    if (bornV3) root.put("next-row-id", 0L)
    root.put("table-uuid", java.util.UUID.nameUUIDFromBytes(
      location.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString)
    root.put("location", location)
    root.put("last-updated-ms", 0L)
    val fieldId = schema.fieldNames.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
    // Nested list/map/struct element ids are allocated AFTER the
    // top-level block (ids 1..n), depth-first — flat schemas keep the
    // exact ids every existing table carries, and partition/sort-order
    // source-id resolution stays positional on the top-level map.
    var lastColumnId = schema.size
    def schemaNode(target: ObjectNode): Unit = {
      var nextNested = schema.size
      def nextId(): Int = { nextNested += 1; nextNested }
      target.put("type", "struct")
      target.put("schema-id", 0)
      val arr = target.putArray("fields")
      schema.fields.foreach { f =>
        val fn = arr.addObject()
        fn.put("id", fieldId(f.name))
        fn.put("name", f.name)
        fn.put("required", !f.nullable)
        fn.set[com.fasterxml.jackson.databind.JsonNode]("type",
          typeNodeWithIds(mapper, f.dataType, nextId _))
        fieldDefaults(mapper, fn, f)
      }
      lastColumnId = nextNested
    }
    schemaNode(root.putObject("schema"))
    root.put("current-schema-id", 0)
    schemaNode(root.putArray("schemas").addObject())
    root.put("last-column-id", lastColumnId)
    val specs = root.putArray("partition-specs")
    val spec = specs.addObject()
    spec.put("spec-id", 0)
    val sf = spec.putArray("fields")
    partitionCols.zipWithIndex.foreach { case ((c, transform), i) =>
      val f = sf.addObject()
      f.put("name", specFieldName(c, transform))
      f.put("transform", transform)
      f.put("source-id", fieldId.getOrElse(c,
        throw new IllegalArgumentException(s"partition column $c not in schema")))
      f.put("field-id", 1000 + i)
    }
    root.put("default-spec-id", 0)
    root.put("last-partition-id", 1000 + partitionCols.size - 1)
    // `sort-order` table property ("col [ASC|DESC], col2 …") becomes the
    // table's default sort order: writes range-cluster + sort by it, so
    // file bounds on the sort key are tight and disjoint — what makes
    // range predicates on a non-partition column prune files at all.
    val sortFields: Seq[(String, String)] =
      properties.get("sort-order").toSeq.flatMap(
        _.split(",").map(_.trim).filter(_.nonEmpty).map { tok =>
          val parts = tok.split("\\s+")
          val dir =
            if (parts.length > 1 && parts(1).equalsIgnoreCase("DESC")) "desc"
            else "asc"
          (parts(0), dir)
        })
    if (sortFields.isEmpty) {
      root.put("default-sort-order-id", 0)
      root.putArray("sort-orders").addObject().put("order-id", 0).putArray("fields")
    } else {
      root.put("default-sort-order-id", 1)
      val so = root.putArray("sort-orders").addObject()
      so.put("order-id", 1)
      val sfArr = so.putArray("fields")
      sortFields.foreach { case (c, dir) =>
        val f = sfArr.addObject()
        f.put("transform", "identity")
        f.put("source-id", fieldId.getOrElse(c,
          throw new IllegalArgumentException(s"sort-order column $c not in schema")))
        f.put("direction", dir)
        f.put("null-order", if (dir == "asc") "nulls-first" else "nulls-last")
      }
    }
    val props = root.putObject("properties")
    // Tables created by this framework always carry EXACT per-file
    // min/max bounds (parquet footer stats, never truncated) — stamp the
    // marker that makes metadata-answered MIN/MAX eligible. The Iceberg
    // spec only requires bounds to be conservative, so foreign tables
    // without this property fall back to a real scan (a user who knows
    // their writer is exact can set it explicitly).
    (Map("graft.exact-bounds" -> "true") ++ properties)
      .foreach { case (k, v) => props.put(k, v) }
    root.put("current-snapshot-id", -1L)
    root.putArray("snapshots")
    mapper.writerWithDefaultPrettyPrinter.writeValueAsString(root)
  }
}
