package graft.iceberg.connector

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

import graft.iceberg.{IcebergTable, TableMetadata}

/** Iceberg-REST-spec catalog client ([[CatalogStore]] over `/v1/...`
  * routes) — parity with the reference's REST crate
  * (`datafusion_iceberg_catalog_rest/src/catalog.rs:83-135`: the same
  * namespace list/create, table create/load/drop/rename calls).
  *
  * Transport notes:
  *  - `GET /v1/config` is consulted once for a route `prefix` override
  *    (the standard multi-tenant deployment shape);
  *  - multi-level namespaces are joined with the unit separator `%1F` in
  *    paths, per the spec;
  *  - `loadTable` parses the `LoadTableResult.metadata` document directly
  *    — no second fetch — and scans proceed against the absolute file
  *    paths inside it, so the data plane (parquet/manifest reads) still
  *    goes through Hadoop FileSystem, exactly like the warehouse store;
  *  - loads are never cached ([[tableToken]] = None): each load already
  *    carries fresh metadata, which is the REST catalog's currency model;
  *  - an optional bearer `token` rides on every request when configured.
  *
  * Views are served through the spec's `/views` routes (the reference's
  * REST crate stops at namespaces + tables): decomposed
  * `CreateViewRequest` on create — the SERVICE composes and owns the
  * stored document — `LoadViewResult` read-back, paged listing,
  * `/views/rename`, and property updates as a `CommitViewRequest`
  * pinned by `assert-view-uuid`.
  */
final class RestCatalogStore(
    baseUri: String, conf: Configuration,
    bearerToken: Option[String],
    /** Page size hint sent on list endpoints (`pageSize=`); None lets the
      * server choose. Independently of the hint, list responses are ALWAYS
      * followed through `next-page-token` — real catalogs (multi-tenant
      * services fronting thousands of namespaces) paginate server-side
      * whether or not the client asked. */
    pageSize: Option[Int] = None,
    /** OAuth2 client-credentials grant: `client_id:client_secret` (the
      * REST spec's `credential` property). When set, a bearer is obtained
      * from [[tokenEndpoint]] before the first request, refreshed before
      * its `expires_in` elapses, and re-fetched once on any 401 (server
      * revoked/rotated the token early). A static [[bearerToken]] is
      * ignored when a credential is configured — the grant owns auth. */
    credential: Option[String] = None,
    /** Token endpoint override (`oauth2-server-uri`); defaults to the
      * spec's `{uri}/v1/oauth/tokens` route on the catalog host. */
    oauthServerUri: Option[String] = None,
    /** OAuth2 `scope` sent with the grant; the spec's default is
      * `catalog`. */
    oauthScope: Option[String] = None) extends CatalogStore
    with graft.iceberg.TransactionalCatalog {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  private val base = baseUri.stripSuffix("/")

  // -- OAuth2 client-credentials flow ----------------------------------------

  private def tokenEndpoint: String =
    oauthServerUri.getOrElse(s"$base/v1/oauth/tokens")

  /** (bearer, absolute expiry ms). Refresh happens 60 s BEFORE expiry so
    * a token never dies mid-request chain; tokens without `expires_in`
    * never expire client-side. */
  @volatile private var oauthToken: Option[(String, Long)] = None

  private def fetchOAuthToken(): String = synchronized {
    // double-check under the lock: a rival thread may have refreshed
    oauthToken match {
      case Some((t, exp)) if System.currentTimeMillis() < exp - 60000 =>
        return t
      case _ =>
    }
    val (id, secret) = credential.map(_.split(":", 2)) match {
      case Some(Array(i, s)) => (i, s)
      case _ => throw new IllegalStateException(
        "credential must take the form client_id:client_secret")
    }
    val form = Seq(
      "grant_type" -> "client_credentials",
      "client_id" -> id,
      "client_secret" -> secret,
      "scope" -> oauthScope.getOrElse("catalog"))
      .map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
    val req = HttpRequest.newBuilder(URI.create(tokenEndpoint))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .method("POST", HttpRequest.BodyPublishers.ofString(form)).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2) throw new IllegalStateException(
      s"OAuth2 token grant at $tokenEndpoint failed: " +
        s"HTTP ${resp.statusCode()}: ${resp.body()}")
    val node = mapper.readTree(resp.body())
    val tok = Option(node.get("access_token")).map(_.asText).getOrElse(
      throw new IllegalStateException(
        s"OAuth2 token response carries no access_token: ${resp.body()}"))
    val expiry = Option(node.get("expires_in"))
      .map(e => System.currentTimeMillis() + e.asLong * 1000L)
      .getOrElse(Long.MaxValue)
    oauthToken = Some((tok, expiry))
    tok
  }

  /** The Authorization bearer for the next request: the OAuth2 grant when
    * a credential is configured (fetched/refreshed as needed), else the
    * static token, else none. */
  private def currentAuth(): Option[String] =
    if (credential.isEmpty) bearerToken
    else oauthToken match {
      case Some((t, exp)) if System.currentTimeMillis() < exp - 60000 =>
        Some(t)
      case _ => Some(fetchOAuthToken())
    }

  /** Route prefix from /v1/config: `overrides.prefix` wins, else
    * `defaults.prefix` (the spec's precedence — overrides beat client
    * config, defaults fill in; multi-tenant catalogs commonly advertise
    * the prefix under defaults). Config fetch failures fall back to no
    * prefix rather than failing catalog registration.
    */
  private lazy val routePrefix: String =
    try {
      val (code, body) = request("GET", s"$base/v1/config", None)
      if (code / 100 != 2) ""
      else {
        val root = mapper.readTree(body)
        def prefixIn(section: String): Option[String] =
          Option(root.get(section)).flatMap(o => Option(o.get("prefix"))).map(_.asText)
        prefixIn("overrides").orElse(prefixIn("defaults")).map(_ + "/").getOrElse("")
      }
    } catch { case _: Exception => "" }

  private def v1(path: String): String = s"$base/v1/$routePrefix$path"

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)
  private def nsPath(ns: Seq[String]): String = enc(ns.mkString("\u001f"))

  private def request(method: String, url: String,
                      body: Option[String],
                      extraHeaders: Seq[(String, String)] = Nil): (Int, String) = {
    def send(auth: Option[String]): (Int, String) = {
      val b = HttpRequest.newBuilder(URI.create(url))
        .header("Content-Type", "application/json")
      extraHeaders.foreach { case (k, v) => b.header(k, v) }
      auth.foreach(t => b.header("Authorization", s"Bearer $t"))
      val req = (body match {
        case Some(json) => b.method(method, HttpRequest.BodyPublishers.ofString(json))
        case None => b.method(method, HttpRequest.BodyPublishers.noBody())
      }).build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    val first = send(currentAuth())
    // 401 under a credential grant = the server revoked/rotated the token
    // before its advertised expiry — re-authenticate ONCE and retry this
    // request; a second 401 surfaces to the caller (bad credential).
    if (first._1 == 401 && credential.isDefined) {
      oauthToken = None
      send(currentAuth())
    } else first
  }

  private def expect2xx(method: String, url: String, body: Option[String]): JsonNode = {
    val (code, resp) = request(method, url, body)
    if (code / 100 != 2)
      throw new IllegalStateException(s"$method $url -> HTTP $code: $resp")
    if (resp == null || resp.isEmpty) mapper.createObjectNode()
    else mapper.readTree(resp)
  }

  /** GET a list endpoint across ALL its pages: every response's
    * `arrayField` elements are concatenated, and `next-page-token` is
    * followed until the server stops returning one (the REST spec's
    * pagination contract). Stopping at page one would silently truncate
    * `SHOW TABLES`/`SHOW NAMESPACES` — and cascade drops — on any
    * catalog large enough to paginate. */
  private def pagedList(urlBase: String, arrayField: String): Seq[JsonNode] = {
    val out = Seq.newBuilder[JsonNode]
    var token: Option[String] = None
    var more = true
    var pages = 0
    while (more) {
      pages += 1
      if (pages > 100000) throw new IllegalStateException(
        s"runaway pagination on $urlBase: >100k pages — server token loop?")
      val params = pageSize.map(n => s"pageSize=$n").toSeq ++
        token.map(t => s"pageToken=${enc(t)}")
      val sep = if (urlBase.contains("?")) "&" else "?"
      val url =
        if (params.isEmpty) urlBase else urlBase + sep + params.mkString("&")
      val node = expect2xx("GET", url, None)
      Option(node.get(arrayField)).foreach(_.elements.asScala.foreach(out += _))
      token = Option(node.get("next-page-token"))
        .filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
      more = token.isDefined
    }
    out.result()
  }

  // -- namespaces ------------------------------------------------------------

  override def listNamespaces(parent: Seq[String]): Seq[Seq[String]] = {
    val url = v1("namespaces") +
      (if (parent.isEmpty) "" else s"?parent=${nsPath(parent)}")
    pagedList(url, "namespaces")
      .map(ns => ns.elements.asScala.map(_.asText).toSeq)
  }

  override def namespaceExists(ns: Seq[String]): Boolean =
    ns.isEmpty || request("GET", v1(s"namespaces/${nsPath(ns)}"), None)._1 / 100 == 2

  override def createNamespace(ns: Seq[String]): Unit =
    createNamespace(ns, Map.empty)

  override def createNamespace(ns: Seq[String],
                               properties: Map[String, String]): Unit = {
    val req = mapper.createObjectNode()
    val arr = req.putArray("namespace")
    ns.foreach(arr.add)
    val props = req.putObject("properties")
    properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    expect2xx("POST", v1("namespaces"), Some(mapper.writeValueAsString(req)))
  }

  override def namespaceProperties(ns: Seq[String]): Map[String, String] = {
    val node = expect2xx("GET", v1(s"namespaces/${nsPath(ns)}"), None)
    Option(node.get("properties"))
      .map(_.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap)
      .getOrElse(Map.empty)
  }

  /** The spec's `POST /namespaces/{ns}/properties`
    * (UpdateNamespacePropertiesRequest): one batch of removals +
    * updates. The caller's in-order contract collapses to a final
    * action per key (the service applies removals before updates, so a
    * key in both would end SET — exactly the remove-then-set rule). */
  override def updateNamespaceProperties(
      ns: Seq[String], changes: Seq[(String, Option[String])]): Unit = {
    val finalAction = scala.collection.mutable.LinkedHashMap[String, Option[String]]()
    changes.foreach { case (k, v) => finalAction.remove(k); finalAction(k) = v }
    val req = mapper.createObjectNode()
    val removals = req.putArray("removals")
    finalAction.collect { case (k, None) => k }.foreach(removals.add)
    val updates = req.putObject("updates")
    finalAction.collect { case (k, Some(v)) => updates.put(k, v) }
    expect2xx("POST", v1(s"namespaces/${nsPath(ns)}/properties"),
      Some(mapper.writeValueAsString(req)))
  }

  override def dropNamespace(ns: Seq[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(ns)) return false
    if (cascade) {
      listTables(ns).foreach(dropTable(ns, _))
      listViews(ns).foreach(dropView(ns, _))
      listNamespaces(ns).foreach(dropNamespace(_, cascade = true))
    }
    val (code, body) = request("DELETE", v1(s"namespaces/${nsPath(ns)}"), None)
    if (code == 409)
      throw new IllegalStateException(s"namespace ${ns.mkString(".")} is not empty")
    if (code / 100 != 2 && code != 404)
      throw new IllegalStateException(s"DROP NAMESPACE -> HTTP $code: $body")
    code / 100 == 2
  }

  // -- tables ----------------------------------------------------------------

  override def listTables(ns: Seq[String]): Seq[String] =
    pagedList(v1(s"namespaces/${nsPath(ns)}/tables"), "identifiers")
      .map(_.get("name").asText)

  override def tableExists(ns: Seq[String], name: String): Boolean =
    request("GET", v1(s"namespaces/${nsPath(ns)}/tables/${enc(name)}"), None)._1 / 100 == 2

  override def tableToken(ns: Seq[String], name: String): Option[String] = None

  override def loadIcebergTable(ns: Seq[String], name: String): IcebergTable = {
    val (code, body) =
      request("GET", v1(s"namespaces/${nsPath(ns)}/tables/${enc(name)}"), None,
        // the spec's opt-in for credential vending: without this header
        // many managed catalogs omit storage-credentials entirely
        extraHeaders = Seq("X-Iceberg-Access-Delegation" -> "vended-credentials"))
    if (code == 404)
      throw new NoSuchElementException(s"table ${(ns :+ name).mkString(".")} not found")
    if (code / 100 != 2)
      throw new IllegalStateException(s"loadTable -> HTTP $code: $body")
    val result = mapper.readTree(body)
    val metaNode = Option(result.get("metadata")).getOrElse(
      throw new IllegalStateException("LoadTableResult has no metadata document"))
    val metadata = TableMetadata.fromJson(mapper.writeValueAsString(metaNode))
    val vended = vendedOverrides(result, metadata.location)
    IcebergTable.fromMetadata(metadata.location,
      if (vended.isEmpty) conf
      else RestCatalogStore.applied(conf, vended),
      metadata, vended)
  }

  /** Per-table storage configuration vended by the catalog, as Hadoop
    * key→value overrides: the spec's `LoadTableResult.config` map plus
    * any `storage-credentials` entry whose `prefix` covers the table
    * location, translated via [[RestCatalogStore.icebergToHadoop]].
    * Applied to a COPY of the base conf (metadata/manifest IO and the
    * committer) AND threaded into every Spark file scan the table plans
    * ([[IcebergTable.vended]]) — other tables and the catalog itself
    * keep the base conf. Catalog-internal response keys with no
    * filesystem meaning translate to nothing and are skipped. */
  private def vendedOverrides(result: JsonNode,
                              location: String): Map[String, String] = {
    val overrides = scala.collection.mutable.LinkedHashMap[String, String]()
    def absorb(node: JsonNode): Unit =
      node.fields.asScala.foreach(e => overrides(e.getKey) = e.getValue.asText)
    Option(result.get("config")).foreach(absorb)
    // the spec's selection rule: apply THE credential whose prefix is the
    // LONGEST match for the table location — absorbing every match in
    // list order would let a broad bucket-wide credential listed later
    // overwrite the table-scoped one. A prefix matches only on a PATH
    // SEGMENT boundary (equal to the location, or followed by '/'):
    // raw startsWith would let `…/foo` claim `…/foobar/…` and, being
    // longer than a bucket-wide prefix, win the election with the wrong
    // credentials (the r17 advice).
    def segmentMatch(prefix: String): Boolean =
      prefix.isEmpty || location == prefix ||
        (location.startsWith(prefix) &&
          (prefix.endsWith("/") || location.charAt(prefix.length) == '/'))
    Option(result.get("storage-credentials")).foreach { creds =>
      val matching = creds.elements.asScala.toSeq
        .map(c => (Option(c.get("prefix")).map(_.asText).getOrElse(""), c))
        .filter { case (p, _) => segmentMatch(p) }
      matching.sortBy(_._1.length).lastOption.foreach { case (_, cred) =>
        Option(cred.get("config")).foreach(absorb)
      }
    }
    overrides.toSeq.flatMap { case (k, v) =>
      RestCatalogStore.icebergToHadoop(k).map(_ -> v)
    }.toMap
  }

  /** The spec's CreateTableRequest body (shared by the registering
    * create and the `stage-create = true` staging create). */
  private def createTableRequest(name: String, schema: StructType,
                                 partitionCols: Seq[(String, String)],
                                 properties: Map[String, String],
                                 stageCreate: Boolean): String = {
    val req = mapper.createObjectNode()
    req.put("name", name)
    if (stageCreate) req.put("stage-create", true)
    val schemaNode = IcebergJson.viewSchemaNode(mapper, schema)
    req.set[JsonNode]("schema", schemaNode)
    val fieldIds = schemaNode.get("fields").elements.asScala
      .map(f => f.get("name").asText -> f.get("id").asInt).toMap
    val spec = req.putObject("partition-spec")
    spec.put("spec-id", 0)
    val sf = spec.putArray("fields")
    partitionCols.zipWithIndex.foreach { case ((c, transform), i) =>
      val f = sf.addObject()
      f.put("name", IcebergJson.specFieldName(c, transform))
      f.put("transform", transform)
      f.put("source-id", fieldIds.getOrElse(c,
        throw new IllegalArgumentException(s"partition column $c not in schema")))
      f.put("field-id", 1000 + i)
    }
    val props = req.putObject("properties")
    properties.foreach { case (k, v) => props.put(k, v) }
    mapper.writeValueAsString(req)
  }

  override def createTable(ns: Seq[String], name: String, schema: StructType,
                           partitionCols: Seq[(String, String)],
                           properties: Map[String, String]): Unit = {
    expect2xx("POST", v1(s"namespaces/${nsPath(ns)}/tables"),
      Some(createTableRequest(name, schema, partitionCols, properties,
        stageCreate = false)))
    ()
  }

  // -- staged CREATE (the spec's stage-create + assert-create commit) ---------

  override def stageCreateTable(ns: Seq[String], name: String,
                                schema: StructType,
                                partitionCols: Seq[(String, String)],
                                properties: Map[String, String]): StagedBase = {
    // spec `stage-create = true`: the service composes (and owns) the
    // initial metadata document — above all the table LOCATION — without
    // registering the table; the later commit carries assert-create
    val result = expect2xx("POST", v1(s"namespaces/${nsPath(ns)}/tables"),
      Some(createTableRequest(name, schema, partitionCols, properties,
        stageCreate = true)))
    val metaNode = Option(result.get("metadata")).getOrElse(
      throw new IllegalStateException(
        "stage-create response has no metadata document"))
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    val realLocation = metaNode.get("location").asText
    val vended = vendedOverrides(result, realLocation)
    val stagedDir = s"$realLocation/_staged/" +
      java.util.UUID.randomUUID.toString.take(12)
    metaNode.put("location", stagedDir)
    StagedBase(realLocation, stagedDir, mapper.writeValueAsString(metaNode),
      if (vended.isEmpty) conf else RestCatalogStore.applied(conf, vended),
      vended)
  }

  override def publishStagedCreate(ns: Seq[String], name: String,
                                   base: StagedBase,
                                   requirements: Seq[JsonNode],
                                   updates: Seq[JsonNode]): Unit =
    // the SERVICE arbitrates assert-create and builds the table from the
    // update list (409 → CommitConflictException via updateTable)
    updateTable(ns, name, requirements, updates)

  /** Spec `POST /v1/{prefix}/namespaces/{ns}/register` — adopt an
    * existing metadata document as a catalog table. Pure pointer
    * registration: the SERVICE reads the document and owns the entry;
    * nothing is rewritten client-side (the filesystem-warehouse
    * equivalent is [[graft.iceberg.TableClone.register]]). */
  def registerTable(ns: Seq[String], name: String,
                    metadataLocation: String): Unit = {
    val req = mapper.createObjectNode()
    req.put("name", name)
    req.put("metadata-location", metadataLocation)
    expect2xx("POST", v1(s"namespaces/${nsPath(ns)}/register"),
      Some(mapper.writeValueAsString(req)))
    ()
  }

  override def dropTable(ns: Seq[String], name: String): Boolean =
    request("DELETE", v1(s"namespaces/${nsPath(ns)}/tables/${enc(name)}"), None)._1 / 100 == 2

  /** REST purge delegates the data delete to the SERVICE (the spec's
    * `purgeRequested=true` on the DELETE route) — the catalog owns the
    * storage there; a client-side recursive delete would race it. */
  override def purgeTable(ns: Seq[String], name: String,
                          table: IcebergTable): Boolean =
    request("DELETE",
      v1(s"namespaces/${nsPath(ns)}/tables/${enc(name)}?purgeRequested=true"),
      None)._1 / 100 == 2

  /** The spec's `CommitTableRequest`: POST requirements + updates to the
    * table route. 409 = a requirement failed server-side (someone else
    * committed first) → [[graft.iceberg.CommitConflictException]], the
    * same signal the filesystem committer raises — callers retry from
    * fresh metadata either way. */
  def updateTable(ns: Seq[String], name: String,
                  requirements: Seq[JsonNode], updates: Seq[JsonNode]): Unit = {
    val req = mapper.createObjectNode()
    val ident = req.putObject("identifier")
    val nsArr = ident.putArray("namespace")
    ns.foreach(nsArr.add)
    ident.put("name", name)
    val reqArr = req.putArray("requirements")
    requirements.foreach(reqArr.add)
    val updArr = req.putArray("updates")
    updates.foreach(updArr.add)
    val url = v1(s"namespaces/${nsPath(ns)}/tables/${enc(name)}")
    val (code, body) = request("POST", url, Some(mapper.writeValueAsString(req)))
    if (code == 409)
      throw new graft.iceberg.CommitConflictException(
        s"commit to ${(ns :+ name).mkString(".")} rejected by catalog: $body")
    if (code == 404)
      throw new NoSuchElementException(s"table ${(ns :+ name).mkString(".")} not found")
    if (code / 100 != 2)
      throw new IllegalStateException(s"POST $url -> HTTP $code: $body")
  }

  /** `POST /v1/{prefix}/transactions/commit` — the REST spec's
    * multi-table transaction (`CommitTransactionRequest`): the service
    * checks every table's requirements and applies every update set as
    * ONE atomic unit. 409 anywhere = nothing applied. */
  override def commitTransaction(
      changes: Seq[(Seq[String], String, Seq[JsonNode], Seq[JsonNode])]): Unit = {
    val req = mapper.createObjectNode()
    val arr = req.putArray("table-changes")
    changes.foreach { case (ns, name, requirements, updates) =>
      val c = arr.addObject()
      val ident = c.putObject("identifier")
      val nsArr = ident.putArray("namespace")
      ns.foreach(nsArr.add)
      ident.put("name", name)
      val reqArr = c.putArray("requirements")
      requirements.foreach(reqArr.add)
      val updArr = c.putArray("updates")
      updates.foreach(updArr.add)
    }
    val url = v1("transactions/commit")
    val (code, body) = request("POST", url, Some(mapper.writeValueAsString(req)))
    if (code == 409)
      throw new graft.iceberg.CommitConflictException(
        s"transaction rejected by catalog (no table committed): $body")
    if (code / 100 != 2)
      throw new IllegalStateException(s"POST $url -> HTTP $code: $body")
  }

  /** Raw metadata document of the current table state (commit base). */
  def loadMetadataRoot(ns: Seq[String], name: String): com.fasterxml.jackson.databind.node.ObjectNode = {
    val (code, body) =
      request("GET", v1(s"namespaces/${nsPath(ns)}/tables/${enc(name)}"), None)
    if (code / 100 != 2)
      throw new IllegalStateException(s"loadTable -> HTTP $code: $body")
    Option(mapper.readTree(body).get("metadata"))
      .map(_.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]())
      .getOrElse(throw new IllegalStateException("LoadTableResult has no metadata"))
  }

  override def committerFor(ns: Seq[String], name: String, table: IcebergTable,
                            hconf: Configuration): graft.iceberg.TableCommitter =
    // the table's conf carries the vended per-table storage credentials
    // from its load — the committer's data plane (manifests, metadata
    // probes) must write under the same credentials the scan read with.
    // `hconf` is deliberately NOT used here (it is the FS store's seam):
    // mixing a session conf into a vended table's commits would leak the
    // wrong credentials into its data plane.
    new RestCommitter(this, ns, name, table.tableDir, table.conf,
      table.vended)

  /** Spec `RenameTableRequest`/`RenameViewRequest` body: {source,
    * destination} identifiers. */
  private def renameRequest(fromNs: Seq[String], fromName: String,
                            toNs: Seq[String], toName: String): String = {
    val req = mapper.createObjectNode()
    def ident(target: com.fasterxml.jackson.databind.node.ObjectNode,
              ns: Seq[String], n: String): Unit = {
      val arr = target.putArray("namespace")
      ns.foreach(arr.add)
      target.put("name", n)
    }
    ident(req.putObject("source"), fromNs, fromName)
    ident(req.putObject("destination"), toNs, toName)
    mapper.writeValueAsString(req)
  }

  override def renameTable(fromNs: Seq[String], fromName: String,
                           toNs: Seq[String], toName: String): Unit = {
    expect2xx("POST", v1("tables/rename"),
      Some(renameRequest(fromNs, fromName, toNs, toName)))
    ()
  }

  // -- views: the REST spec's /views routes ----------------------------------
  // The catalog seam trades in COMPLETE view-spec metadata documents; the
  // REST spec's CreateViewRequest instead decomposes one into {name,
  // location, schema, view-version, properties} and lets the SERVICE
  // compose (and own) the stored document — so createView decomposes the
  // document GraftCatalog built, and loadViewJson reads back whatever the
  // service composed (its uuid/version-log, not necessarily ours).

  override def isView(ns: Seq[String], name: String): Boolean =
    request("GET", v1(s"namespaces/${nsPath(ns)}/views/${enc(name)}"), None)._1 / 100 == 2

  override def listViews(ns: Seq[String]): Seq[String] =
    pagedList(v1(s"namespaces/${nsPath(ns)}/views"), "identifiers")
      .map(_.get("name").asText)

  override def loadViewJson(ns: Seq[String], name: String): JsonNode = {
    val (code, body) =
      request("GET", v1(s"namespaces/${nsPath(ns)}/views/${enc(name)}"), None)
    if (code == 404)
      throw new NoSuchElementException(s"view ${(ns :+ name).mkString(".")} not found")
    if (code / 100 != 2)
      throw new IllegalStateException(s"loadView -> HTTP $code: $body")
    Option(mapper.readTree(body).get("metadata")).getOrElse(
      throw new IllegalStateException("LoadViewResult has no metadata document"))
  }

  override def createView(ns: Seq[String], name: String, json: String): Unit = {
    val meta = mapper.readTree(json)
    val currentId = meta.get("current-version-id").asInt
    val ver = meta.get("versions").elements.asScala
      .find(_.get("version-id").asInt == currentId)
      .getOrElse(throw new IllegalArgumentException(
        s"view metadata: current-version-id $currentId not in versions"))
    val schemaId = ver.get("schema-id").asInt
    val schema = meta.get("schemas").elements.asScala
      .find(_.get("schema-id").asInt == schemaId)
      .getOrElse(throw new IllegalArgumentException(
        s"view metadata: schema-id $schemaId not in schemas"))
    val req = mapper.createObjectNode()
    req.put("name", name)
    Option(meta.get("location")).foreach(l => req.put("location", l.asText))
    req.set[JsonNode]("schema", schema)
    req.set[JsonNode]("view-version", ver)
    req.set[JsonNode]("properties",
      Option(meta.get("properties")).getOrElse(mapper.createObjectNode()))
    expect2xx("POST", v1(s"namespaces/${nsPath(ns)}/views"),
      Some(mapper.writeValueAsString(req)))
    ()
  }

  override def updateViewProperties(ns: Seq[String], name: String,
                                    changes: Seq[(String, Option[String])]): Unit = {
    // CommitViewRequest: the service applies the actions under its own
    // concurrency control; assert-view-uuid pins the document we read.
    // One action per change, caller order preserved (remove-then-set of
    // the same key must end set).
    val uuid = loadViewJson(ns, name).get("view-uuid").asText
    val req = mapper.createObjectNode()
    val reqs = req.putArray("requirements")
    val r0 = reqs.addObject()
    r0.put("type", "assert-view-uuid"); r0.put("uuid", uuid)
    val upds = req.putArray("updates")
    changes.foreach {
      case (k, Some(v)) =>
        val u = upds.addObject()
        u.put("action", "set-properties")
        u.putObject("updates").put(k, v)
      case (k, None) =>
        val u = upds.addObject()
        u.put("action", "remove-properties")
        u.putArray("removals").add(k)
    }
    val (code, body) = request("POST",
      v1(s"namespaces/${nsPath(ns)}/views/${enc(name)}"),
      Some(mapper.writeValueAsString(req)))
    // same translation as the table commit path: 409 is the retry
    // signal, 404 a concurrent drop — not generic transport errors
    if (code == 409)
      throw new graft.iceberg.CommitConflictException(
        s"view commit rejected (assert-view-uuid failed): $body")
    if (code == 404)
      throw new NoSuchElementException(s"view ${(ns :+ name).mkString(".")} not found")
    if (code / 100 != 2)
      throw new IllegalStateException(s"view commit -> HTTP $code: $body")
  }

  override def dropView(ns: Seq[String], name: String): Boolean =
    request("DELETE", v1(s"namespaces/${nsPath(ns)}/views/${enc(name)}"), None)._1 / 100 == 2

  override def renameView(fromNs: Seq[String], fromName: String,
                          toNs: Seq[String], toName: String): Unit = {
    expect2xx("POST", v1("views/rename"),
      Some(renameRequest(fromNs, fromName, toNs, toName)))
    ()
  }

  /** Informational for a REST-served view (a view stores no data files);
    * the service may substitute its own location in the stored document. */
  override def viewLocation(ns: Seq[String], name: String): String =
    v1(s"namespaces/${nsPath(ns)}/views/${enc(name)}")
}

object RestCatalogStore {
  /** A copy of `base` with `overrides` applied (base stays untouched). */
  private[connector] def applied(base: Configuration,
                                 overrides: Map[String, String]): Configuration = {
    val c = new Configuration(base)
    overrides.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Vended-config key translation: Iceberg REST property names → Hadoop
    * conf keys (the S3A family — the storage real managed catalogs vend
    * credentials for — plus a `hadoop.`-prefixed verbatim escape hatch
    * for any other filesystem). Keys with no filesystem meaning
    * (catalog-internal hints like `client.pool-size`) map to None and are
    * skipped — blindly `set`ting them would pollute the Hadoop conf. */
  def icebergToHadoop(key: String): Option[String] = key match {
    case "s3.access-key-id" => Some("fs.s3a.access.key")
    case "s3.secret-access-key" => Some("fs.s3a.secret.key")
    case "s3.session-token" => Some("fs.s3a.session.token")
    case "s3.endpoint" => Some("fs.s3a.endpoint")
    case "s3.path-style-access" => Some("fs.s3a.path.style.access")
    case "client.region" => Some("fs.s3a.endpoint.region")
    case k if k.startsWith("hadoop.") => Some(k.stripPrefix("hadoop."))
    case _ => None
  }
}

/** [[graft.iceberg.TableCommitter]] over the REST catalog: the data plane
  * (parquet, manifests, manifest lists) is written by the caller under
  * the table location exactly as for the warehouse store; the metadata
  * pointer move is a `CommitTableRequest` POST and the SERVICE applies
  * the updates and arbitrates conflicts. This is the write half the
  * reference's REST crate never had (`catalog.rs:83-135` reads only).
  */
final class RestCommitter(
    store: RestCatalogStore, ns: Seq[String], name: String,
    val tableDir: String, val conf: Configuration,
    override val vended: Map[String, String] = Map.empty)
    extends graft.iceberg.CatalogBackedCommitter {

  override def txCatalog: graft.iceberg.TransactionalCatalog = store
  override def txNamespace: Seq[String] = ns
  override def txName: String = name

  override def currentRoot(mapper: ObjectMapper): com.fasterxml.jackson.databind.node.ObjectNode =
    store.loadMetadataRoot(ns, name)

  override def currentMetadata(): graft.iceberg.TableMetadata =
    store.loadIcebergTable(ns, name).metadata

  override def commit(requirements: Seq[JsonNode], updates: Seq[JsonNode]): Unit =
    store.updateTable(ns, name, requirements, updates)
}
