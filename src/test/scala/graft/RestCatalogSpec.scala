package graft

import java.io.File
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.scalatest.BeforeAndAfterAll

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.iceberg.connector.GraftCatalog

/** The Iceberg-REST catalog path ([[graft.iceberg.connector.RestCatalogStore]])
  * driven against an in-test HTTP stub that speaks the spec's `/v1` routes
  * (config with prefix override, namespaces, tables, rename) over an
  * in-memory tabular map — the round-trip parity gate for the reference's
  * REST crate (`datafusion_iceberg_catalog_rest/src/catalog.rs:83-135`,
  * which live-tests the same calls against a local server).
  */
class RestCatalogSpec extends SparkSpec with BeforeAndAfterAll {

  private val mapper = new ObjectMapper()
  private val namespaces = mutable.Set[String]()
  private val nsProps = mutable.Map[String, Map[String, String]]()
  private val tables = mutable.Map[(String, String), ObjectNode]()
  private val views = mutable.Map[(String, String), ObjectNode]()
  private val dataRoot = "/root/repo/target/test-rest-warehouse"

  @volatile private var server: HttpServer = _
  private def port: Int = server.getAddress.getPort
  /** Requirements of every CommitTableRequest the stub received. */
  private val commitRequirementsSeen = mutable.Buffer[Seq[String]]()
  /** Updates of every CommitTableRequest the stub received. */
  private val commitUpdatesSeen = mutable.Buffer[Seq[String]]()
  /** List requests that arrived carrying a pageToken (page 2+). */
  private val pagedRequestsSeen = mutable.Buffer[String]()

  /** /v1/config payload; tests flip between overrides- and
    * defaults-delivered prefixes (spec: overrides win, defaults fill). */
  @volatile private var configJson =
    """{"defaults":{},"overrides":{"prefix":"testwh"}}"""

  // -- OAuth2 stub state -----------------------------------------------------
  /** When true, every non-token route demands the CURRENT server-side
    * bearer (the last one granted, unless a test rotates it out from
    * under the client). */
  @volatile private var requireAuth = false
  @volatile private var serverToken: Option[String] = None
  @volatile private var tokenTtlSeconds: Long = 3600L
  private val tokenCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Raw form bodies of every grant request the stub received. */
  private val tokenGrantsSeen = mutable.Buffer[String]()
  /** Per-table LoadTableResult.config / storage-credentials JSON
    * fragments, appended verbatim to loadResult. */
  private val tableConfigJson = mutable.Map[(String, String), String]()
  /** X-Iceberg-Access-Delegation values seen on table-load GETs. */
  private val delegationSeen = mutable.Buffer[String]()
  /** Tables whose DELETE carried the spec's purgeRequested=true. */
  private val purgesSeen = mutable.Buffer[String]()
  /** CreateTableRequests that arrived with stage-create = true. */
  private val stageCreatesSeen = mutable.Buffer[String]()

  // -- stub server -----------------------------------------------------------

  private def qparams(x: HttpExchange): Map[String, String] =
    Option(x.getRequestURI.getQuery).map(_.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, UTF_8))
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)

  /** Serve pre-rendered JSON `items` in pages of 2 with the REST spec's
    * `next-page-token` contract (token = next page's start offset) — the
    * shape real multi-tenant catalogs answer with, so the client's
    * token-following is what every listing test exercises. */
  private def paged(x: HttpExchange, items: Seq[String], field: String): String = {
    val off = qparams(x).get("pageToken").map(_.toInt).getOrElse(0)
    if (off > 0) pagedRequestsSeen.synchronized {
      pagedRequestsSeen += x.getRequestURI.toString
    }
    val page = items.slice(off, off + 2)
    val tok =
      if (off + 2 < items.size) s""","next-page-token":"${off + 2}"""" else ""
    s"""{"$field":[${page.mkString(",")}]$tok}"""
  }

  private def json(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) x.getResponseBody.write(bytes)
    x.close()
  }

  private def handle(x: HttpExchange): Unit = try {
    val path = x.getRequestURI.getPath
    val method = x.getRequestMethod
    def body: ObjectNode =
      mapper.readTree(new String(x.getRequestBody.readAllBytes(), UTF_8))
        .asInstanceOf[ObjectNode]
    // OAuth2 token endpoint (un-prefixed, like the spec's default
    // {uri}/v1/oauth/tokens): client-credentials grant against the
    // fixed (cid, csec) pair; each grant rotates the server-side token
    if (method == "POST" &&
        path.stripPrefix("/v1/").split("/").toList == List("oauth", "tokens")) {
      val form = new String(x.getRequestBody.readAllBytes(), UTF_8)
      tokenGrantsSeen.synchronized { tokenGrantsSeen += form }
      val params = form.split("&").map(_.split("=", 2)).collect {
        case Array(k, v) => k -> java.net.URLDecoder.decode(v, UTF_8)
      }.toMap
      if (!params.get("grant_type").contains("client_credentials") ||
          !params.get("client_id").contains("cid") ||
          !params.get("client_secret").contains("csec")) {
        json(x, 401, """{"error":{"message":"invalid_client"}}""")
      } else {
        val tok = s"tok-${tokenCounter.incrementAndGet()}"
        serverToken = Some(tok)
        json(x, 200, s"""{"access_token":"$tok","token_type":"bearer",""" +
          s""""expires_in":$tokenTtlSeconds}""")
      }
      return
    }
    if (requireAuth) {
      val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
      if (serverToken.isEmpty || !auth.contains(s"Bearer ${serverToken.get}")) {
        json(x, 401, """{"error":{"message":"unauthorized"}}""")
        return
      }
    }
    (method, path.stripPrefix("/v1/").split("/").toList) match {
      case ("GET", "config" :: Nil) =>
        json(x, 200, configJson)
      case ("GET", "testwh" :: "namespaces" :: Nil) =>
        val items = namespaces.toSeq.sorted.map(n => s"""["${n}"]""")
        json(x, 200, paged(x, items, "namespaces"))
      case ("POST", "testwh" :: "namespaces" :: Nil) =>
        val b = body // the stream reads once
        val ns = b.get("namespace").elements.next().asText
        namespaces += ns
        import scala.jdk.CollectionConverters._
        nsProps(ns) = Option(b.get("properties"))
          .map(_.properties.asScala.map(e => e.getKey -> e.getValue.asText)
            .toMap).getOrElse(Map.empty)
        json(x, 200, s"""{"namespace":["$ns"],"properties":{}}""")
      case ("GET", "testwh" :: "namespaces" :: ns :: Nil) =>
        if (namespaces.contains(ns)) {
          val props = nsProps.getOrElse(ns, Map.empty).toSeq.sortBy(_._1)
            .map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
          json(x, 200, s"""{"namespace":["$ns"],"properties":{$props}}""")
        }
        else json(x, 404, """{"error":{"message":"no such namespace"}}""")
      case ("POST", "testwh" :: "namespaces" :: ns :: "properties" :: Nil) =>
        if (!namespaces.contains(ns))
          json(x, 404, """{"error":{"message":"no such namespace"}}""")
        else {
          import scala.jdk.CollectionConverters._
          val b = body // the stream reads once
          val removals = Option(b.get("removals"))
            .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Nil)
          val updates = Option(b.get("updates"))
            .map(_.properties.asScala.map(e => e.getKey -> e.getValue.asText)
              .toMap).getOrElse(Map.empty)
          nsProps(ns) = (nsProps.getOrElse(ns, Map.empty) -- removals) ++ updates
          json(x, 200,
            s"""{"removed":[],"updated":[],"missing":[]}""")
        }
      case ("DELETE", "testwh" :: "namespaces" :: ns :: Nil) =>
        if (tables.keys.exists(_._1 == ns) || views.keys.exists(_._1 == ns))
          json(x, 409, """{"error":{"message":"namespace not empty"}}""")
        else if (namespaces.remove(ns)) json(x, 204, "")
        else json(x, 404, """{"error":{"message":"no such namespace"}}""")
      case ("GET", "testwh" :: "namespaces" :: ns :: "views" :: Nil) =>
        val ids = views.keys.filter(_._1 == ns).map(_._2).toSeq.sorted
          .map(v => s"""{"namespace":["$ns"],"name":"$v"}""")
        json(x, 200, paged(x, ids, "identifiers"))
      case ("POST", "testwh" :: "namespaces" :: ns :: "views" :: Nil) =>
        // the SERVICE composes + owns the stored document from the
        // decomposed CreateViewRequest (spec contract)
        val req = body
        val name = req.get("name").asText
        if (views.contains((ns, name)))
          json(x, 409, """{"error":{"message":"view exists"}}""")
        else {
          val ver = req.get("view-version").asInstanceOf[ObjectNode]
          val doc = mapper.createObjectNode()
          doc.put("view-uuid",
            java.util.UUID.nameUUIDFromBytes(s"$ns.$name".getBytes(UTF_8)).toString)
          doc.put("format-version", 1)
          doc.put("location",
            Option(req.get("location")).map(_.asText)
              .getOrElse(s"$dataRoot/$ns/$name"))
          doc.putArray("schemas").add(req.get("schema"))
          doc.put("current-version-id", ver.get("version-id").asInt)
          doc.putArray("versions").add(ver)
          val vl = doc.putArray("version-log").addObject()
          vl.put("timestamp-ms", 0L)
          vl.put("version-id", ver.get("version-id").asInt)
          doc.set[ObjectNode]("properties",
            Option(req.get("properties").asInstanceOf[ObjectNode])
              .getOrElse(mapper.createObjectNode()))
          views((ns, name)) = doc
          json(x, 200, s"""{"metadata-location":"$dataRoot/$ns/$name/v1",""" +
            s""""metadata":${mapper.writeValueAsString(doc)}}""")
        }
      case ("GET", "testwh" :: "namespaces" :: ns :: "views" :: v :: Nil) =>
        views.get((ns, v)) match {
          case Some(doc) => json(x, 200,
            s"""{"metadata-location":"$dataRoot/$ns/$v/v1",""" +
              s""""metadata":${mapper.writeValueAsString(doc)}}""")
          case None => json(x, 404, """{"error":{"message":"no such view"}}""")
        }
      case ("POST", "testwh" :: "namespaces" :: ns :: "views" :: v :: Nil) =>
        views.get((ns, v)) match {
          case None => json(x, 404, """{"error":{"message":"no such view"}}""")
          case Some(doc) =>
            val req = body
            val uuidOk = req.get("requirements").elements.asScala.forall { r =>
              r.get("type").asText != "assert-view-uuid" ||
                r.get("uuid").asText == doc.get("view-uuid").asText
            }
            if (!uuidOk) json(x, 409, """{"error":{"message":"uuid mismatch"}}""")
            else {
              val props = doc.get("properties").asInstanceOf[ObjectNode]
              req.get("updates").elements.asScala.foreach { u =>
                u.get("action").asText match {
                  case "set-properties" =>
                    u.get("updates").fields.asScala
                      .foreach(e => props.put(e.getKey, e.getValue.asText))
                  case "remove-properties" =>
                    u.get("removals").elements.asScala
                      .foreach(r => props.remove(r.asText))
                  case other => throw new IllegalArgumentException(other)
                }
              }
              json(x, 200, s"""{"metadata-location":"$dataRoot/$ns/$v/v2",""" +
                s""""metadata":${mapper.writeValueAsString(doc)}}""")
            }
        }
      case ("DELETE", "testwh" :: "namespaces" :: ns :: "views" :: v :: Nil) =>
        if (views.remove((ns, v)).isDefined) json(x, 204, "")
        else json(x, 404, """{"error":{"message":"no such view"}}""")
      case ("POST", "testwh" :: "views" :: "rename" :: Nil) =>
        val req = body
        def ident(k: String) = (
          req.get(k).get("namespace").elements.next().asText,
          req.get(k).get("name").asText)
        views.remove(ident("source")) match {
          case Some(doc) => views(ident("destination")) = doc; json(x, 200, "{}")
          case None => json(x, 404, """{"error":{"message":"no such view"}}""")
        }
      case ("GET", "testwh" :: "namespaces" :: ns :: "tables" :: Nil) =>
        val ids = tables.keys.filter(_._1 == ns).map(_._2).toSeq.sorted
          .map(t => s"""{"namespace":["$ns"],"name":"$t"}""")
        json(x, 200, paged(x, ids, "identifiers"))
      case ("POST", "testwh" :: "namespaces" :: ns :: "tables" :: Nil) =>
        val req = body
        val name = req.get("name").asText
        val doc = mapper.createObjectNode()
        doc.put("format-version", 2)
        doc.put("location", s"$dataRoot/$ns/$name")
        val schema = req.get("schema").asInstanceOf[ObjectNode]
        if (schema.get("schema-id") == null) schema.put("schema-id", 0)
        doc.putArray("schemas").add(schema)
        doc.put("current-schema-id", 0)
        val spec = Option(req.get("partition-spec"))
          .map(_.asInstanceOf[ObjectNode]).getOrElse {
            val s = mapper.createObjectNode()
            s.put("spec-id", 0); s.putArray("fields"); s
          }
        doc.putArray("partition-specs").add(spec)
        doc.put("default-spec-id", 0)
        doc.put("current-snapshot-id", -1L)
        doc.putArray("snapshots")
        // the REST spec keeps CreateTableRequest properties on the table
        Option(req.get("properties"))
          .foreach(p => doc.set[com.fasterxml.jackson.databind.JsonNode](
            "properties", p))
        // spec stage-create: compose (and own) the document — location
        // above all — WITHOUT registering; the later commit carries
        // assert-create and builds the table server-side
        if (Option(req.get("stage-create")).exists(_.asBoolean)) {
          stageCreatesSeen.synchronized { stageCreatesSeen += s"$ns.$name" }
          json(x, 200, loadResult(ns, name, doc))
        } else {
          tables((ns, name)) = doc
          json(x, 200, loadResult(ns, name, doc))
        }
      case ("GET", "testwh" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
        Option(x.getRequestHeaders.getFirst("X-Iceberg-Access-Delegation"))
          .foreach(v => delegationSeen.synchronized { delegationSeen += v })
        tables.get((ns, t)) match {
          case Some(doc) => json(x, 200, loadResult(ns, t, doc))
          case None => json(x, 404, """{"error":{"message":"no such table"}}""")
        }
      // spec RegisterTableRequest: adopt an existing metadata document as
      // a catalog entry — pure pointer registration, nothing rewritten
      case ("POST", "testwh" :: "namespaces" :: ns :: "register" :: Nil) =>
        val req = body
        val name = req.get("name").asText
        if (tables.contains((ns, name)))
          json(x, 409, """{"error":{"message":"table exists"}}""")
        else {
          val doc = mapper.readTree(java.nio.file.Files.readString(
              java.nio.file.Paths.get(req.get("metadata-location").asText)))
            .deepCopy[ObjectNode]()
          tables((ns, name)) = doc
          json(x, 200, loadResult(ns, name, doc))
        }
      // CommitTableRequest: the server checks requirements and applies the
      // update actions — the arbitration a real catalog service performs
      case ("POST", "testwh" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
        val req = body
        import scala.jdk.CollectionConverters._
        val reqs = Option(req.get("requirements"))
          .map(_.elements.asScala.toSeq).getOrElse(Nil)
        val upds = Option(req.get("updates"))
          .map(_.elements.asScala.toSeq).getOrElse(Nil)
        commitRequirementsSeen.synchronized {
          commitRequirementsSeen += reqs.map(_.toString)
        }
        commitUpdatesSeen.synchronized {
          commitUpdatesSeen += upds.map(_.toString)
        }
        def hasAssertCreate = reqs.exists(r =>
          Option(r.get("type")).exists(_.asText == "assert-create"))
        tables.get((ns, t)) match {
          case None if hasAssertCreate =>
            // a staged CREATE completing: build the table from the
            // update list over the shared empty seed (checkRequirements
            // handles assert-create's failure half — table exists —
            // above; here the table is absent so it holds)
            val seed = graft.iceberg.MetadataCommit.stagedCreateSeed(mapper)
            val rest = reqs.filterNot(r =>
              Option(r.get("type")).exists(_.asText == "assert-create"))
            graft.iceberg.MetadataCommit.checkRequirements(seed, rest) match {
              case Some(err) =>
                json(x, 409, s"""{"error":{"message":"${err.replace('"', '\'')}"}}""")
              case None =>
                val next = graft.iceberg.MetadataCommit.applyUpdates(
                  mapper, seed, upds)
                tables((ns, t)) = next
                json(x, 200, loadResult(ns, t, next))
            }
          case None => json(x, 404, """{"error":{"message":"no such table"}}""")
          case Some(doc) =>
            graft.iceberg.MetadataCommit.checkRequirements(doc, reqs) match {
              case Some(err) =>
                json(x, 409, s"""{"error":{"message":"${err.replace('"', '\'')}"}}""")
              case None =>
                val next = graft.iceberg.MetadataCommit.applyUpdates(
                  mapper, doc.deepCopy[ObjectNode](), upds)
                tables((ns, t)) = next
                json(x, 200, loadResult(ns, t, next))
            }
        }
      case ("DELETE", "testwh" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
        if (qparams(x).get("purgeRequested").contains("true"))
          purgesSeen.synchronized { purgesSeen += s"$ns.$t" }
        if (tables.remove((ns, t)).isDefined) json(x, 204, "")
        else json(x, 404, """{"error":{"message":"no such table"}}""")
      // CommitTransactionRequest: every table's requirements are checked
      // BEFORE any update applies — all-or-nothing, the spec's
      // /v1/{prefix}/transactions/commit contract
      case ("POST", "testwh" :: "transactions" :: "commit" :: Nil) =>
        import scala.jdk.CollectionConverters._
        val req = body
        val tableChanges = Option(req.get("table-changes"))
          .map(_.elements.asScala.toSeq).getOrElse(Nil)
        val parsed = tableChanges.map { c =>
          val ident = c.get("identifier")
          val ns = ident.get("namespace").elements.next().asText
          val name = ident.get("name").asText
          val reqs = Option(c.get("requirements"))
            .map(_.elements.asScala.toSeq).getOrElse(Nil)
          val upds = Option(c.get("updates"))
            .map(_.elements.asScala.toSeq).getOrElse(Nil)
          (ns, name, reqs, upds)
        }
        val missing = parsed.collectFirst {
          case (ns, name, _, _) if !tables.contains((ns, name)) => s"$ns.$name"
        }
        val failed = parsed.iterator.flatMap { case (ns, name, reqs, _) =>
          tables.get((ns, name)).flatMap(doc =>
            graft.iceberg.MetadataCommit.checkRequirements(doc, reqs)
              .map(err => s"$ns.$name: $err"))
        }.toSeq.headOption
        (missing, failed) match {
          case (Some(m), _) =>
            json(x, 404, s"""{"error":{"message":"no such table $m"}}""")
          case (_, Some(err)) =>
            json(x, 409, s"""{"error":{"message":"${err.replace('"', '\'')}"}}""")
          case _ =>
            val next = parsed.map { case (ns, name, _, upds) =>
              (ns, name) -> graft.iceberg.MetadataCommit.applyUpdates(
                mapper, tables((ns, name)).deepCopy[ObjectNode](), upds)
            }
            next.foreach { case (k, doc) => tables(k) = doc }
            json(x, 204, "")
        }
      case ("POST", "testwh" :: "tables" :: "rename" :: Nil) =>
        val req = body
        def ident(k: String) = {
          val n = req.get(k)
          (n.get("namespace").elements.next().asText, n.get("name").asText)
        }
        tables.remove(ident("source")) match {
          case Some(doc) => tables(ident("destination")) = doc; json(x, 200, "{}")
          case None => json(x, 404, """{"error":{"message":"no such table"}}""")
        }
      case _ => json(x, 400, s"""{"error":{"message":"unhandled $method $path"}}""")
    }
  } catch {
    case e: Exception => json(x, 500, s"""{"error":{"message":"${e.getMessage}"}}""")
  }

  private def loadResult(ns: String, t: String, doc: ObjectNode): String = {
    val res = mapper.createObjectNode()
    res.put("metadata-location", s"$dataRoot/$ns/$t/metadata/00001.metadata.json")
    res.set[ObjectNode]("metadata", doc)
    val base = mapper.writeValueAsString(res)
    // vended per-table config rides the LoadTableResult, spec-shaped
    tableConfigJson.get((ns, t)) match {
      case Some(extra) => base.dropRight(1) + "," + extra + "}"
      case None => base
    }
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", handle(_))
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def useRest(): Unit = {
    spark.conf.set("spark.sql.catalog.restcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.restcat.uri", s"http://127.0.0.1:$port")
  }

  // -- a real one-snapshot table served through the stub ---------------------

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"}]}""".stripMargin)

  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  private def writeAvro(path: File, schema: Schema, records: Seq[GenericRecord]): Unit = {
    path.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    records.foreach(w.append)
    w.close()
  }

  /** Registers (nsdata, evts) in the stub: real parquet + manifest on
    * disk, metadata document served over HTTP — the data plane stays on
    * the filesystem exactly as a REST catalog deployment would have it.
    */
  private lazy val realTable: Unit = {
    import org.apache.commons.io.FileUtils
    import spark.implicits._
    val root = s"$dataRoot/nsdata/evts"
    FileUtils.deleteQuietly(new File(root))
    val pdir = new File(s"$root/data/f1")
    locally {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.MetadataBuilder
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
        .select(
          col("id").as("id", new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
          col("tag").as("tag", new MetadataBuilder().putLong("parquet.field.id", 2L).build()))
        .coalesce(1).write.mode("overwrite").parquet(pdir.toString)
    }
    val pfile = pdir.listFiles.find(_.getName.endsWith(".parquet")).get
    val dfSchema = manifestSchema.getField("data_file").schema
    val entry = {
      val df = new GenericData.Record(dfSchema)
      df.put("file_path", pfile.toString); df.put("file_format", "PARQUET")
      df.put("record_count", 2L); df.put("file_size_in_bytes", pfile.length)
      val e = new GenericData.Record(manifestSchema)
      e.put("status", 1); e.put("data_file", df)
      e.asInstanceOf[GenericRecord]
    }
    val m = new File(s"$root/metadata/m1.avro")
    writeAvro(m, manifestSchema, Seq(entry))
    val mlRec = new GenericData.Record(manifestListSchema)
    mlRec.put("manifest_path", m.toString)
    mlRec.put("manifest_length", m.length)
    mlRec.put("partition_spec_id", 0)
    writeAvro(new File(s"$root/metadata/snap-1.avro"), manifestListSchema,
      Seq(mlRec.asInstanceOf[GenericRecord]))
    val doc = mapper.readTree(
      s"""{"format-version": 2, "location": "$root",
         |"schema": {"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "id", "required": false, "type": "long"},
         |  {"id": 2, "name": "tag", "required": false, "type": "string"}]},
         |"partition-specs": [{"spec-id": 0, "fields": []}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 7,
         |"snapshots": [{"snapshot-id": 7, "timestamp-ms": 1000,
         |  "manifest-list": "$root/metadata/snap-1.avro"}]}""".stripMargin)
      .asInstanceOf[ObjectNode]
    namespaces += "nsdata"
    tables(("nsdata", "evts")) = doc
  }

  // -- gates -----------------------------------------------------------------

  test("REST: namespace create/list/exists round-trip through /v1 routes") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    assert(namespaces.contains("rns"), "stub should have received the POST")
    val ns = spark.sql("SHOW NAMESPACES IN restcat").collect().map(_.getString(0))
    assert(ns.contains("rns"))
  }

  test("REST: namespace properties — create-with ships them, the " +
      "properties endpoint batches removals+updates (remove-then-set " +
      "ends set), ALTER NAMESPACE routes through it") {
    val store = new graft.iceberg.connector.RestCatalogStore(
      s"http://127.0.0.1:$port", spark.sessionState.newHadoopConf(), None)
    store.createNamespace(Seq("npr"), Map("team" -> "data"))
    assert(store.namespaceProperties(Seq("npr")) == Map("team" -> "data"))
    store.updateNamespaceProperties(Seq("npr"), Seq(
      "team" -> None, "tier" -> Some("gold"), "team" -> Some("ml")))
    assert(store.namespaceProperties(Seq("npr")) ==
      Map("tier" -> "gold", "team" -> "ml"),
      "remove-then-set of one key must end set")
    // the Spark DDL surface drives the same endpoint
    useRest()
    spark.sql("ALTER NAMESPACE restcat.npr SET PROPERTIES ('zone' = 'eu')")
    spark.sql("ALTER NAMESPACE restcat.npr UNSET PROPERTIES ('team')")
    assert(store.namespaceProperties(Seq("npr")) ==
      Map("tier" -> "gold", "zone" -> "eu"))
    val desc = spark.sql("DESCRIBE NAMESPACE EXTENDED restcat.npr")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("Properties").exists(_.contains("zone")), desc.toString)
    namespaces -= "npr"; nsProps -= "npr"
  }

  test("REST: prefix advertised under defaults (not overrides) still routes") {
    val saved = configJson
    configJson = """{"defaults":{"prefix":"testwh"},"overrides":{}}"""
    try {
      // a fresh catalog instance fetches /v1/config anew
      spark.conf.set("spark.sql.catalog.restcat2", classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.restcat2.uri", s"http://127.0.0.1:$port")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat2.rns2")
      assert(namespaces.contains("rns2"),
        "defaults.prefix must route to /v1/testwh/... like overrides.prefix")
    } finally configJson = saved
  }

  test("REST: create / load / drop table round-trip (reference catalog.rs parity)") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.t1")
    spark.sql(
      """CREATE TABLE restcat.rns.t1 (id BIGINT, name STRING, score DOUBLE)
        |PARTITIONED BY (id)""".stripMargin)
    assert(tables.contains(("rns", "t1")), "stub should hold the created table")
    assert(spark.sql("SHOW TABLES IN restcat.rns").collect()
      .map(_.getString(1)).contains("t1"))
    val schema = spark.table("restcat.rns.t1").schema
    assert(schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(spark.sql("SELECT COUNT(*) FROM restcat.rns.t1").collect()(0).getLong(0) == 0L)
    spark.sql("DROP TABLE restcat.rns.t1")
    assert(!tables.contains(("rns", "t1")))
  }

  test("REST: views round-trip — create, expand in SELECT, list, rename, drop") {
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.vns")
    spark.sql("DROP TABLE IF EXISTS restcat.vns.vt")
    spark.sql("CREATE TABLE restcat.vns.vt (id BIGINT, score DOUBLE)")
    spark.sql("INSERT INTO restcat.vns.vt VALUES (1, 0.5), (2, 1.5), (3, 2.5)")
    val cat = spark.sessionState.catalogManager.catalog("restcat")
      .asInstanceOf[ViewCatalog]
    val ident = Identifier.of(Array("vns"), "high")
    if (cat.viewExists(ident)) cat.dropView(ident)
    // CREATE goes through the seam -> the spec's CreateViewRequest; the
    // SERVICE composes + owns the stored document (stock Spark has no v2
    // CREATE VIEW SQL; same API convention as the q3b warehouse path)
    cat.createView(new ViewInfo(ident,
      "SELECT id, score FROM restcat.vns.vt WHERE score > 1.0",
      "restcat", Array.empty[String],
      StructType(Seq(StructField("id", LongType),
        StructField("score", DoubleType))),
      Array("id", "score"), Array.empty, Array.empty,
      new java.util.HashMap[String, String]()))
    assert(views.contains(("vns", "high")), "stub should hold the view document")
    // expansion reads back the document the service composed
    assert(spark.sql("SELECT id FROM restcat.vns.high ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(cat.listViews("vns").map(_.name).toSeq == Seq("high"))
    // alterView commits CommitViewRequest (assert-view-uuid + property
    // actions) and the service applies it to ITS document
    import org.apache.spark.sql.connector.catalog.ViewChange
    cat.alterView(ident,
      ViewChange.setProperty("comment", "reweighted"),
      ViewChange.setProperty("owner", "pipeline"))
    cat.alterView(ident, ViewChange.removeProperty("owner"))
    // caller ORDER is preserved: remove-then-set of one key ends set
    cat.alterView(ident,
      ViewChange.removeProperty("comment"),
      ViewChange.setProperty("comment", "second"))
    val props = views(("vns", "high")).get("properties")
    assert(props.get("comment").asText == "second")
    assert(props.get("owner") == null, "removed property must be gone")
    cat.renameView(ident, Identifier.of(Array("vns"), "high2"))
    assert(!views.contains(("vns", "high")) && views.contains(("vns", "high2")))
    assert(spark.sql("SELECT COUNT(*) FROM restcat.vns.high2")
      .collect()(0).getLong(0) == 2L)
    assert(cat.dropView(Identifier.of(Array("vns"), "high2")))
    assert(!views.contains(("vns", "high2")))
    spark.sql("DROP TABLE restcat.vns.vt")
  }

  test("REST: rename moves the identifier") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.src")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.dst")
    spark.sql("CREATE TABLE restcat.rns.src (id BIGINT)")
    // the target identifier is passed through verbatim (no catalog prefix
    // stripping), so the catalog-relative form is the correct spelling
    spark.sql("ALTER TABLE restcat.rns.src RENAME TO rns.dst")
    assert(!tables.contains(("rns", "src")) && tables.contains(("rns", "dst")))
    spark.sql("DROP TABLE restcat.rns.dst")
  }

  test("REST: INSERT INTO commits via CommitTableRequest and reads back") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.w1")
    spark.sql("CREATE TABLE restcat.rns.w1 (id BIGINT, name STRING)")
    commitRequirementsSeen.clear()
    spark.sql("INSERT INTO restcat.rns.w1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO restcat.rns.w1 VALUES (3, 'c')")
    val rows = spark.sql("SELECT id, name FROM restcat.rns.w1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the appends went over the wire as guarded commits, not local writes
    assert(commitRequirementsSeen.size == 2,
      s"expected 2 CommitTableRequests, saw $commitRequirementsSeen")
    assert(commitRequirementsSeen.forall(_.exists(_.contains("assert-ref-snapshot-id"))))
    val doc = tables(("rns", "w1"))
    assert(doc.get("snapshots").size == 2, "server-side doc should hold both snapshots")
    // DELETE goes through the same protocol (merge-on-read equality delete)
    spark.sql("DELETE FROM restcat.rns.w1 WHERE id = 2")
    assert(spark.sql("SELECT COUNT(*) FROM restcat.rns.w1").collect()(0).getLong(0) == 2L)
    spark.sql("DROP TABLE restcat.rns.w1")
  }

  test("REST: atomic CTAS and RTAS — stage-create = true composes the " +
      "document without registering; the publish is ONE CommitTableRequest " +
      "(assert-create for CTAS); a mid-write failure registers nothing") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.ctas")
    stageCreatesSeen.synchronized(stageCreatesSeen.clear())
    commitRequirementsSeen.synchronized(commitRequirementsSeen.clear())
    spark.sql(
      """CREATE TABLE restcat.rns.ctas AS
        |SELECT id AS k, CAST(id * 3 AS DOUBLE) AS v FROM range(50)""".stripMargin)
    assert(spark.sql("SELECT COUNT(*), SUM(k) FROM restcat.rns.ctas").head
      .toSeq == Seq(50L, 1225L))
    assert(stageCreatesSeen.synchronized(stageCreatesSeen.toSeq)
      .contains("rns.ctas"), "the CREATE must go through stage-create")
    assert(commitRequirementsSeen.synchronized(commitRequirementsSeen.toSeq)
      .exists(_.exists(_.contains("assert-create"))),
      "the publish must carry assert-create")
    // a failing CTAS registers nothing server-side
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE restcat.rns.ctasbad AS
          |SELECT id, CASE WHEN id > 5 THEN raise_error('boom')
          |  ELSE 'x' END AS v FROM range(10)""".stripMargin)
    }
    assert(!tables.contains(("rns", "ctasbad")),
      "a failed staged CREATE must not register the table")
    // RTAS over the service: one commit replaces schema and data; the
    // failed attempt leaves the table untouched
    intercept[Exception] {
      spark.sql(
        """REPLACE TABLE restcat.rns.ctas AS
          |SELECT id, CASE WHEN id > 5 THEN raise_error('boom')
          |  ELSE 'x' END AS v FROM range(10)""".stripMargin)
    }
    assert(spark.sql("SELECT COUNT(*) FROM restcat.rns.ctas").head
      .getLong(0) == 50L, "a failed RTAS must leave the old table intact")
    spark.sql(
      """REPLACE TABLE restcat.rns.ctas AS
        |SELECT CONCAT('n', id) AS name FROM range(4)""".stripMargin)
    assert(spark.sql("SELECT name FROM restcat.rns.ctas ORDER BY name")
      .collect().map(_.getString(0)).toSeq ==
      Seq("n0", "n1", "n2", "n3"))
    spark.sql("DROP TABLE restcat.rns.ctas")
  }

  test("REST: ALTER TABLE schema evolution commits add-schema over the wire") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.ev")
    spark.sql("CREATE TABLE restcat.rns.ev (id BIGINT)")
    spark.sql("ALTER TABLE restcat.rns.ev ADD COLUMN note STRING")
    assert(spark.table("restcat.rns.ev").schema.fieldNames.toSeq == Seq("id", "note"))
    spark.sql("INSERT INTO restcat.rns.ev VALUES (5, 'hi')")
    val r = spark.sql("SELECT id, note FROM restcat.rns.ev").collect()(0)
    assert((r.getLong(0), r.getString(1)) == ((5L, "hi")))
    spark.sql("DROP TABLE restcat.rns.ev")
  }

  test("REST: streaming sources follow commits THROUGH THE SERVICE — the " +
      "append-only table stream and the CDC changelog stream both " +
      "re-fetch per batch (no metadata.json exists on disk)") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.st")
    spark.sql("CREATE TABLE restcat.rns.st (id BIGINT, v STRING)")
    spark.sql("INSERT INTO restcat.rns.st VALUES (1, 'a'), (2, 'b')")
    val ckpt = new java.io.File(graft.Scratch.dir("test-reststream-ckpt"))
    val outDir = new java.io.File(graft.Scratch.dir("test-reststream-out"))
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    org.apache.commons.io.FileUtils.deleteQuietly(outDir)
    def run(): Unit = {
      val q = spark.readStream.table("restcat.rns.st")
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    run()
    spark.sql("INSERT INTO restcat.rns.st VALUES (3, 'c')")
    run() // the new commit is only visible via the service
    assert(spark.read.parquet(outDir.toString).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // CDC changelog stream over the same REST table
    val ckpt2 = new java.io.File(graft.Scratch.dir("test-reststream-ckpt2"))
    val outDir2 = new java.io.File(graft.Scratch.dir("test-reststream-out2"))
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt2)
    org.apache.commons.io.FileUtils.deleteQuietly(outDir2)
    val q2 = spark.readStream.table("restcat.rns.st.changes")
      .writeStream.format("parquet")
      .option("path", outDir2.toString)
      .option("checkpointLocation", ckpt2.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q2.awaitTermination() finally q2.stop()
    assert(spark.read.parquet(outDir2.toString).collect()
      .map(r => (r.getLong(0), r.getString(2))).sorted.toSeq ==
      Seq((1L, "insert"), (2L, "insert"), (3L, "insert")))
    spark.sql("DROP TABLE restcat.rns.st")
  }

  test("REST: v3 column DEFAULTs round-trip through CreateTableRequest " +
      "and the add-schema commit") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.dv")
    // CREATE carries initial-/write-default in the request schema
    spark.sql("CREATE TABLE restcat.rns.dv (id BIGINT, v STRING DEFAULT 'c') " +
      "TBLPROPERTIES ('format-version' = '3')")
    spark.sql("INSERT INTO restcat.rns.dv (id) VALUES (1)")
    // ALTER commits the defaulted column via add-schema over the wire;
    // the pre-column file serves the initial-default on read-back
    spark.sql("ALTER TABLE restcat.rns.dv ADD COLUMN s INT DEFAULT 7")
    spark.sql("INSERT INTO restcat.rns.dv VALUES (2, 'real', 8)")
    assert(spark.sql("SELECT id, v, s FROM restcat.rns.dv ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "c", 7), (2L, "real", 8)))
    spark.sql("DROP TABLE restcat.rns.dv")
  }

  test("REST: v3 VARIANT and unknown columns round-trip the wire schema " +
      "(CreateTableRequest types + add-schema commit)") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.vt")
    spark.sql("""CREATE TABLE restcat.rns.vt (id BIGINT, p VARIANT)
                 TBLPROPERTIES ('format-version' = '3')""")
    spark.sql(
      "INSERT INTO restcat.rns.vt SELECT 1L, parse_json('{\"a\": 5}')")
    // ALTER commits a second variant column via add-schema over the wire
    spark.sql("ALTER TABLE restcat.rns.vt ADD COLUMN q VARIANT")
    spark.sql("INSERT INTO restcat.rns.vt SELECT 2L, parse_json('3'), " +
      "parse_json('{\"b\": [1, 2]}')")
    val got = spark.sql(
      """SELECT id, variant_get(p, '$.a', 'bigint'),
               variant_get(q, '$.b[1]', 'bigint')
         FROM restcat.rns.vt ORDER BY id""").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(got == Seq((1L, Some(5L), None), (2L, None, Some(2L))))
    // the reloaded schema (served from the service's metadata document)
    // still types both as variant
    import org.apache.spark.sql.types.VariantType
    val sch = spark.table("restcat.rns.vt").schema
    assert(sch("p").dataType == VariantType && sch("q").dataType == VariantType)
    spark.sql("DROP TABLE restcat.rns.vt")
  }

  test("REST: SET IDENTIFIER FIELDS round-trips the ids through the " +
      "service's add-schema commit") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.idf")
    spark.sql("CREATE TABLE restcat.rns.idf (id BIGINT NOT NULL, v STRING)")
    spark.sql("ALTER TABLE restcat.rns.idf SET IDENTIFIER FIELDS id")
    // the ids live in the SERVER's metadata document, inside the new
    // current schema (not a property) — and a fresh load serves them
    val doc = tables(("rns", "idf"))
    val curId = doc.get("current-schema-id").asInt
    val schemaNode = {
      val it = doc.get("schemas").elements()
      var found: com.fasterxml.jackson.databind.JsonNode = null
      while (it.hasNext) {
        val n = it.next(); if (n.get("schema-id").asInt == curId) found = n
      }
      found
    }
    assert(schemaNode != null && schemaNode.has("identifier-field-ids"),
      s"server schema missing identifier-field-ids: $schemaNode")
    val loaded = spark.sessionState.catalogManager.catalog("restcat")
      .asInstanceOf[graft.iceberg.connector.GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("rns"), "idf"))
      .asInstanceOf[graft.iceberg.connector.SparkIcebergTable]
    assert(loaded.table.metadata.identifierFieldNames == Seq("id"))
    spark.sql("DROP TABLE restcat.rns.idf")
  }

  test("REST: partition + sort-order evolution commit their update actions over the wire") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.pe")
    spark.sql("CREATE TABLE restcat.rns.pe (id BIGINT, cat STRING) " +
      "PARTITIONED BY (cat)")
    commitUpdatesSeen.synchronized(commitUpdatesSeen.clear())
    commitRequirementsSeen.synchronized(commitRequirementsSeen.clear())
    spark.sql("ALTER TABLE restcat.rns.pe ADD PARTITION FIELD bucket(4, id)")
    spark.sql("ALTER TABLE restcat.rns.pe WRITE ORDERED BY (id DESC)")
    // the wire carried the spec's update actions + concurrency guards —
    // the SERVER (shared applier) owns spec/order id assignment
    val upds = commitUpdatesSeen.synchronized(commitUpdatesSeen.flatten.toSeq)
    val reqs = commitRequirementsSeen.synchronized(commitRequirementsSeen.flatten.toSeq)
    assert(upds.exists(_.contains("add-spec")))
    assert(upds.exists(_.contains("set-default-spec")))
    assert(upds.exists(_.contains("add-sort-order")))
    assert(reqs.exists(_.contains("assert-default-spec-id")))
    assert(reqs.exists(_.contains("assert-default-sort-order-id")))
    // and the evolved table round-trips through LoadTableResult
    spark.sql("INSERT INTO restcat.rns.pe VALUES (7, 'x'), (8, 'y')")
    val loaded = spark.sessionState.catalogManager.catalog("restcat")
      .asInstanceOf[graft.iceberg.connector.GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("rns"), "pe"))
      .asInstanceOf[graft.iceberg.connector.SparkIcebergTable]
    val meta = loaded.table.metadata
    assert(meta.partitionSpec.map(_.transform) == Seq("identity", "bucket[4]"))
    assert(meta.defaultSpecId == 1 && meta.defaultSortOrderId > 0)
    assert(meta.sortOrderFields.map(_.direction) == Seq("desc"))
    assert(spark.table("restcat.rns.pe").count() == 2L)
    spark.sql("DROP TABLE restcat.rns.pe")
  }

  test("REST: stale-base commit is rejected with 409 -> CommitConflictException") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.cf")
    spark.sql("CREATE TABLE restcat.rns.cf (id BIGINT)")
    spark.sql("INSERT INTO restcat.rns.cf VALUES (1)") // table now at snapshot 1
    val store = new graft.iceberg.connector.RestCatalogStore(
      s"http://127.0.0.1:$port", spark.sessionState.newHadoopConf(), None)
    val m = new ObjectMapper()
    // a writer whose base predates snapshot 1 asserts main == absent
    val staleReq = graft.iceberg.MetadataCommit.assertRefSnapshotId(m, "main", None)
    val snap = m.createObjectNode()
    snap.put("snapshot-id", 99L)
    snap.put("timestamp-ms", 1L)
    snap.put("manifest-list", "/nonexistent.avro")
    intercept[graft.iceberg.CommitConflictException] {
      store.updateTable(Seq("rns"), "cf", Seq(staleReq),
        Seq(graft.iceberg.MetadataCommit.addSnapshot(m, snap),
          graft.iceberg.MetadataCommit.setSnapshotRef(m, "main", 99L)))
    }
    // the losing commit changed nothing
    assert(spark.sql("SELECT COUNT(*) FROM restcat.rns.cf").collect()(0).getLong(0) == 1L)
    assert(tables(("rns", "cf")).get("snapshots").size == 1)
    spark.sql("DROP TABLE restcat.rns.cf")
  }

  test("REST: /v1/transactions/commit moves two tables atomically or not at all") {
    useRest()
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.tx1")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.tx2")
    spark.sql("CREATE TABLE restcat.rns.tx1 (id BIGINT, tag STRING)")
    spark.sql("CREATE TABLE restcat.rns.tx2 (id BIGINT, tag STRING)")
    spark.sql("INSERT INTO restcat.rns.tx1 VALUES (1, 'a')")
    spark.sql("INSERT INTO restcat.rns.tx2 VALUES (10, 'b')")
    val conf = spark.sessionState.newHadoopConf()
    val store = new graft.iceberg.connector.RestCatalogStore(
      s"http://127.0.0.1:$port", conf, None)
    def committer(name: String) = {
      val t = store.loadIcebergTable(Seq("rns"), name)
      store.committerFor(Seq("rns"), name, t, conf)
    }
    def df(xs: Seq[Long]) = xs.map(i => (i, s"row$i")).toDF("id", "tag")
    def rows(name: String): Seq[Long] =
      store.loadIcebergTable(Seq("rns"), name).toDF(spark)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq

    // happy path: one CommitTransactionRequest moves both pointers
    val c1 = graft.iceberg.Transactions.stage(committer("tx1")) { c =>
      graft.iceberg.IcebergWriter.append(spark, c.tableDir, df(Seq(2L)),
        committer = Some(c)); ()
    }
    val c2 = graft.iceberg.Transactions.stage(committer("tx2")) { c =>
      graft.iceberg.IcebergWriter.append(spark, c.tableDir, df(Seq(20L)),
        committer = Some(c)); ()
    }
    assert(rows("tx1") == Seq(1L) && rows("tx2") == Seq(10L),
      "staging must not publish")
    graft.iceberg.Transactions.commitAll(Seq(c1, c2))
    assert(rows("tx1") == Seq(1L, 2L))
    assert(rows("tx2") == Seq(10L, 20L))

    // a stale requirement anywhere → 409 → NOTHING applies server-side
    val c3 = graft.iceberg.Transactions.stage(committer("tx1")) { c =>
      graft.iceberg.IcebergWriter.append(spark, c.tableDir, df(Seq(3L)),
        committer = Some(c)); ()
    }
    val c4 = graft.iceberg.Transactions.stage(committer("tx2")) { c =>
      graft.iceberg.IcebergWriter.append(spark, c.tableDir, df(Seq(30L)),
        committer = Some(c)); ()
    }
    spark.sql("INSERT INTO restcat.rns.tx2 VALUES (90, 'rival')") // moves tx2
    intercept[graft.iceberg.CommitConflictException](
      graft.iceberg.Transactions.commitAll(Seq(c3, c4)))
    assert(rows("tx1") == Seq(1L, 2L), "tx1 must not advance")
    assert(rows("tx2") == Seq(10L, 20L, 90L), "tx2 holds only the rival row")
    spark.sql("DROP TABLE restcat.rns.tx1")
    spark.sql("DROP TABLE restcat.rns.tx2")
  }

  test("REST: analyze_table commits its stats properties over the wire") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.rns")
    spark.sql("DROP TABLE IF EXISTS restcat.rns.an")
    spark.sql("CREATE TABLE restcat.rns.an (k BIGINT, cat STRING)")
    spark.sql(
      "INSERT INTO restcat.rns.an SELECT id, concat('c', id % 5) FROM range(0, 100)")
    val Seq(row) = spark.sql(
      "CALL restcat.system.analyze_table(table => 'rns.an')").collect().toSeq
    assert(row.getInt(0) === 2)
    // the SERVER holds the stats: set-properties went out as a
    // CommitTableRequest and the stub's shared applier applied it
    val props = tables(("rns", "an")).get("properties")
    assert(props != null && props.has("graft.stats.ndv.cat"),
      s"stats must land server-side, got $props")
    val ndv = props.get("graft.stats.ndv.cat").asText.toLong
    assert(ndv >= 4 && ndv <= 6, s"approx NDV of 5, got $ndv")
    spark.sql("DROP TABLE restcat.rns.an")
  }

  test("REST: scan executes against the metadata document in LoadTableResult") {
    useRest()
    realTable
    val rows = spark.sql("SELECT id FROM restcat.nsdata.evts ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(spark.sql("SELECT COUNT(*) AS n FROM restcat.nsdata.evts")
      .collect()(0).getLong(0) == 2L)
  }

  test("REST: paged listings are followed across pages (namespaces + tables)") {
    useRest()
    (1 to 5).foreach(i =>
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS restcat.pg$i"))
    pagedRequestsSeen.synchronized(pagedRequestsSeen.clear())
    val ns = spark.sql("SHOW NAMESPACES IN restcat").collect()
      .map(_.getString(0)).toSet
    assert((1 to 5).forall(i => ns.contains(s"pg$i")),
      s"page-2+ namespaces must not be truncated, got $ns")
    assert(pagedRequestsSeen.synchronized(
      pagedRequestsSeen.exists(_.contains("pageToken"))),
      "the client must have followed next-page-token")
    (1 to 5).foreach(i => spark.sql(s"CREATE TABLE restcat.pg1.t$i (id BIGINT)"))
    pagedRequestsSeen.synchronized(pagedRequestsSeen.clear())
    val tbls = spark.sql("SHOW TABLES IN restcat.pg1").collect()
      .map(_.getString(1)).toSet
    assert((1 to 5).map(i => s"t$i").toSet.subsetOf(tbls), s"got $tbls")
    assert(pagedRequestsSeen.synchronized(
      pagedRequestsSeen.exists(_.contains("pageToken"))))
    (1 to 5).foreach(i => spark.sql(s"DROP TABLE restcat.pg1.t$i"))
  }

  test("REST: DDL binds the new schema via -1 and survives server-side id reassignment") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.ddl")
    spark.sql("DROP TABLE IF EXISTS restcat.ddl.sid")
    spark.sql("CREATE TABLE restcat.ddl.sid (id BIGINT)")
    // the server owns schema-id assignment: seed an unrelated high-id
    // schema entry (as a catalog hosting concurrent evolutions would
    // have), so any client-guessed max+1 id would be wrong
    val doc = tables(("ddl", "sid"))
    val extra = doc.get("schemas").get(0)
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    extra.put("schema-id", 5)
    doc.get("schemas").asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
      .add(extra)
    commitUpdatesSeen.synchronized(commitUpdatesSeen.clear())
    spark.sql("ALTER TABLE restcat.ddl.sid ADD COLUMN extra BIGINT")
    // the wire commit used the spec's -1 (last-added) binding and pinned
    // the base schema with a requirement
    val upd = commitUpdatesSeen.synchronized(commitUpdatesSeen.last)
    assert(upd.exists(u => u.contains("set-current-schema") &&
      u.contains("\"schema-id\":-1")), s"got $upd")
    assert(commitRequirementsSeen.synchronized(commitRequirementsSeen.last)
      .exists(_.contains("assert-current-schema-id")))
    // the server assigned the next free id (6, past the seeded 5) and the
    // DDL still reads back — a client-computed id would have collided
    assert(tables(("ddl", "sid")).get("current-schema-id").asInt == 6)
    assert(spark.table("restcat.ddl.sid").schema.fieldNames.toSeq ==
      Seq("id", "extra"))
    spark.sql("DROP TABLE restcat.ddl.sid")
  }

  test("register_table adopts an FS-written table through the /register endpoint") {
    useRest()
    namespaces += "reg"
    // build a real table with history on a filesystem warehouse
    val wh = "/root/repo/target/rest-register-wh"
    new org.apache.hadoop.fs.Path(wh).getFileSystem(
      spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(wh), true)
    spark.conf.set("spark.sql.catalog.regfs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.regfs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS regfs.ns")
    spark.sql("CREATE TABLE regfs.ns.src (k BIGINT)")
    spark.sql("INSERT INTO regfs.ns.src VALUES (1)")
    spark.sql("INSERT INTO regfs.ns.src VALUES (2)")
    val metaFile = graft.iceberg.TableMetadata.latestMetadataPath(
      s"$wh/ns/src", spark.sessionState.newHadoopConf()).toUri.getPath

    val Seq(row) = spark.sql(
      s"CALL restcat.system.register_table(table => 'reg.adopted', " +
        s"metadata_file => '$metaFile')").collect().toSeq
    assert(row.getInt(0) == 2, "both snapshots adopted")
    // reads go through the REST catalog; data files stay where the
    // metadata's own location says (nothing was copied or rewritten)
    assert(spark.sql("SELECT * FROM restcat.reg.adopted ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // double registration refuses (server-side 409)
    val e = intercept[Exception](spark.sql(
      s"CALL restcat.system.register_table(table => 'reg.adopted', " +
        s"metadata_file => '$metaFile')").collect())
    assert(e.getMessage.contains("already exists") ||
      e.getMessage.contains("409"), e.getMessage)
  }

  test("REST: DROP TABLE deregisters only; DROP TABLE PURGE delegates the " +
      "data delete to the service via purgeRequested=true") {
    useRest()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS restcat.purgens")
    spark.sql("DROP TABLE IF EXISTS restcat.purgens.a")
    spark.sql("CREATE TABLE restcat.purgens.a (k BIGINT)")
    spark.sql("DROP TABLE restcat.purgens.a")
    assert(!purgesSeen.contains("purgens.a"),
      "plain DROP must NOT request a purge from the service")
    spark.sql("CREATE TABLE restcat.purgens.b (k BIGINT)")
    spark.sql("DROP TABLE restcat.purgens.b PURGE")
    assert(purgesSeen.contains("purgens.b"),
      "PURGE must delegate the data delete via purgeRequested=true")
    assert(!tables.contains(("purgens", "b")))
  }

  test("REST OAuth2: client-credentials grant, expiry-driven mid-session " +
      "refresh, and a 401 -> re-auth retry") {
    requireAuth = true
    serverToken = None
    tokenTtlSeconds = 61 // refresh margin is 60 s -> client-side life 1 s
    val before = tokenGrantsSeen.size
    try {
      val cat = s"restauth${System.nanoTime()}" // fresh store per run
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.uri", s"http://127.0.0.1:$port")
      spark.conf.set(s"spark.sql.catalog.$cat.credential", "cid:csec")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.oans")
      assert(namespaces.contains("oans"),
        "authed namespace create must reach the stub")
      assert(tokenGrantsSeen.size == before + 1,
        s"one grant must cover config+exists+create: " +
          s"${tokenGrantsSeen.size - before}")
      assert(tokenGrantsSeen.last.contains("grant_type=client_credentials") &&
        tokenGrantsSeen.last.contains("client_id=cid") &&
        tokenGrantsSeen.last.contains("scope=catalog"),
        s"spec-shaped grant body: ${tokenGrantsSeen.last}")

      // mid-session refresh: the 61 s token leaves the 60 s refresh
      // margin after ~1 s — the next call must re-grant BEFORE sending
      Thread.sleep(1200)
      tokenTtlSeconds = 3600 // the refreshed token is long-lived
      assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect()
        .map(_.getString(0)).contains("oans"))
      assert(tokenGrantsSeen.size == before + 2,
        "an expiring token must refresh mid-session, not ride to a 401")

      // 401 retry: rotate the server-side token OUT FROM UNDER the
      // client (its bearer is still client-side-fresh) — the next call
      // gets 401, re-authenticates once, and retries successfully
      serverToken = Some("rotated-out-of-band")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.oans2")
      assert(namespaces.contains("oans2"),
        "the 401'd call must re-auth and retry, not surface the 401")
      assert(tokenGrantsSeen.size == before + 3,
        s"exactly one re-grant for the revocation: " +
          s"${tokenGrantsSeen.size - before}")
    } finally {
      requireAuth = false
      serverToken = None
      tokenTtlSeconds = 3600
    }
  }

  test("REST vended credentials: LoadTableResult.config + " +
      "storage-credentials reach the Hadoop conf the scan reads with") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.MetadataBuilder
    import spark.implicits._
    // A table whose location lives on a scheme the SESSION cannot
    // resolve — only the vended `hadoop.fs.graftvend.impl` mapping makes
    // it readable, so a successful read PROVES the per-table conf is the
    // one the scan used.
    val localRoot = s"$dataRoot/vendns/vt"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(localRoot))
    assert(spark.sessionState.newHadoopConf().get("fs.graftvend.impl") == null,
      "precondition: the session conf must NOT know the vended scheme")
    val pdir = new File(s"$localRoot/data/f1")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag")
      .select(
        col("id").as("id", new MetadataBuilder()
          .putLong("parquet.field.id", 1L).build()),
        col("tag").as("tag", new MetadataBuilder()
          .putLong("parquet.field.id", 2L).build()))
      .coalesce(1).write.mode("overwrite").parquet(pdir.toString)
    val pfile = pdir.listFiles.find(_.getName.endsWith(".parquet")).get
    val dfSchema = manifestSchema.getField("data_file").schema
    val entry = {
      val df = new GenericData.Record(dfSchema)
      df.put("file_path", s"graftvend://${pfile.toString}")
      df.put("file_format", "PARQUET")
      df.put("record_count", 3L); df.put("file_size_in_bytes", pfile.length)
      val e = new GenericData.Record(manifestSchema)
      e.put("status", 1); e.put("data_file", df)
      e.asInstanceOf[GenericRecord]
    }
    val m = new File(s"$localRoot/metadata/m1.avro")
    writeAvro(m, manifestSchema, Seq(entry))
    val mlRec = new GenericData.Record(manifestListSchema)
    mlRec.put("manifest_path", s"graftvend://${m.toString}")
    mlRec.put("manifest_length", m.length)
    mlRec.put("partition_spec_id", 0)
    writeAvro(new File(s"$localRoot/metadata/snap-1.avro"), manifestListSchema,
      Seq(mlRec.asInstanceOf[GenericRecord]))
    val loc = s"graftvend://$localRoot"
    val doc = mapper.readTree(
      s"""{"format-version": 2, "location": "$loc",
         |"schema": {"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "id", "required": false, "type": "long"},
         |  {"id": 2, "name": "tag", "required": false, "type": "string"}]},
         |"partition-specs": [{"spec-id": 0, "fields": []}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 7,
         |"snapshots": [{"snapshot-id": 7, "timestamp-ms": 1000,
         |  "manifest-list": "$loc/metadata/snap-1.avro"}]}""".stripMargin)
      .asInstanceOf[ObjectNode]
    namespaces += "vendns"
    tables(("vendns", "vt")) = doc
    // half the config via LoadTableResult.config (the fs impl — the
    // load-bearing key), half via a prefix-scoped storage-credentials
    // entry (a marker), plus an S3 key exercising the name translation
    // and a catalog-internal key that must NOT leak into the conf
    tableConfigJson(("vendns", "vt")) =
      s""""config":{"hadoop.fs.graftvend.impl":"graft.GraftVendedFileSystem",
         |"s3.access-key-id":"AKVENDED","client.pool-size":"4"},
         |"storage-credentials":[
         |  {"prefix":"$loc","config":{"hadoop.graft.test.cred":"vended"}},
         |  {"prefix":"graftvend://",
         |   "config":{"hadoop.graft.test.cred":"BROAD"}},
         |  {"prefix":"other://elsewhere",
         |   "config":{"hadoop.graft.test.cred":"WRONG"}}]""".stripMargin
    try {
      // store-level: the loaded table's conf carries the translations
      val store = new graft.iceberg.connector.RestCatalogStore(
        s"http://127.0.0.1:$port", spark.sessionState.newHadoopConf(), None)
      val t = store.loadIcebergTable(Seq("vendns"), "vt")
      assert(delegationSeen.contains("vended-credentials"),
        "table loads must opt in to credential vending via the " +
          "X-Iceberg-Access-Delegation header")
      assert(t.conf.get("fs.graftvend.impl") == "graft.GraftVendedFileSystem")
      assert(t.conf.get("fs.s3a.access.key") == "AKVENDED",
        "s3.* keys must translate to fs.s3a.*")
      assert(t.conf.get("graft.test.cred") == "vended",
        "the LONGEST-prefix storage-credentials entry must win — a broad " +
          "scheme-wide credential listed later must not overwrite it")
      assert(t.conf.get("client.pool-size") == null &&
        t.conf.get("pool-size") == null,
        "catalog-internal keys must not leak into the Hadoop conf")
      // prefix matching is PATH-SEGMENT-BOUNDED (r17 advice): a prefix
      // that raw-startsWith-matches mid-segment (s3://b/foo vs
      // s3://b/foobar) must NOT join the election — here the trap is
      // longer than the scheme-wide entry and would win under raw
      // startsWith, applying the wrong credentials
      tables(("vendns", "vt2")) = doc // same location, fresh election
      tableConfigJson(("vendns", "vt2")) =
        s""""config":{"hadoop.fs.graftvend.impl":"graft.GraftVendedFileSystem"},
           |"storage-credentials":[
           |  {"prefix":"${loc.dropRight(1)}",
           |   "config":{"hadoop.graft.test.cred":"TRAP"}},
           |  {"prefix":"graftvend://",
           |   "config":{"hadoop.graft.test.cred":"RIGHT"}}]""".stripMargin
      val t2 = store.loadIcebergTable(Seq("vendns"), "vt2")
      assert(t2.conf.get("graft.test.cred") == "RIGHT",
        "a mid-segment prefix must not match: got " +
          t2.conf.get("graft.test.cred"))
      // end-to-end: the SQL read plans a scan over graftvend:// paths,
      // resolvable only through the vended per-relation conf
      useRest()
      val got = spark.sql("SELECT id, tag FROM restcat.vendns.vt ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")),
        s"vended-scheme scan must serve the rows: $got")
      // the WRITE data plane runs under the vended credentials too: the
      // INSERT's parquet/manifest writes land on the vended-only scheme
      // (they would fail "No FileSystem for scheme" off the session conf)
      spark.sql("INSERT INTO restcat.vendns.vt VALUES (4, 'd')")
      val got2 = spark.sql("SELECT id, tag FROM restcat.vendns.vt ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got2 == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
        s"vended-scheme write + read-back: $got2")
      // MAINTENANCE reads run under the vended credentials too:
      // compaction scans the table through the committer's vended map
      // (a session-conf scan would die No-FileSystem-for-scheme here)
      spark.sql("CALL restcat.system.rewrite_data_files(table => 'vendns.vt')")
        .collect()
      val got3 = spark.sql("SELECT id, tag FROM restcat.vendns.vt ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got3 == got2, s"compaction over the vended scheme: $got3")
      assert(spark.sessionState.newHadoopConf().get("fs.graftvend.impl") == null,
        "the session conf must stay untouched after the read and write")
    } finally {
      tableConfigJson.remove(("vendns", "vt"))
      tables.remove(("vendns", "vt"))
    }
  }
}

/** Local filesystem under a scheme only the vended per-table config
  * registers — the offline stand-in for object storage reachable only
  * with catalog-vended credentials. */
class GraftVendedFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftvend"
  override def getUri: java.net.URI = java.net.URI.create("graftvend:///")
}
