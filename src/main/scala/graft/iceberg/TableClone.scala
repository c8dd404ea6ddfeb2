package graft.iceberg

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Zero-copy table lifecycle primitives (the Iceberg `snapshot` and
  * `register_table` procedures): both create a NEW catalog table whose
  * first metadata document references data that already exists somewhere
  * else, without moving a byte of it. The reference has neither (its
  * catalog only registers tables it is handed — `mirror.rs:103-145`);
  * extension surface.
  *
  *  - [[snapshotClone]]: an independent table seeded with the SOURCE's
  *    current snapshot. History truncates to that one snapshot, future
  *    writes land under the clone's own location, and `gc.enabled=false`
  *    is stamped so the clone's maintenance can never physically delete
  *    the files it borrows ([[IcebergWriter.expireSnapshots]] /
  *    [[IcebergWriter.removeOrphanFiles]] refuse on it) — try a risky
  *    compaction or schema change against 100 TB of production data with
  *    zero copy cost, then drop the clone.
  *
  *    The OTHER direction is the operator's contract, exactly as in
  *    Iceberg's own `snapshot` procedure: the SOURCE does not know its
  *    files are borrowed (catalog entries are independent — there is no
  *    cross-table reference to check), so source-side
  *    `rewrite_data_files` + `expire_snapshots` can physically delete
  *    files a live clone still reads. Clones are for SHORT-LIVED
  *    experiments inside the source's snapshot-retention horizon; a
  *    clone that must outlive source maintenance needs
  *    `rewrite_data_files` run on it first (compaction localizes every
  *    live file under the clone — `TableCloneSpec` pins this), after
  *    which it shares nothing.
  *  - [[register]]: adopt an EXISTING metadata document (full history,
  *    refs, stats) under a new catalog location — catalog migration and
  *    disaster recovery. The table owns its files afterwards, so (as in
  *    Iceberg) registering one metadata file under two live catalog
  *    entries and then expiring from either is operator error; the clone
  *    path above is the safe way to share files on purpose.
  *
  * Path semantics: every kept manifest-list / statistics path is
  * ABSOLUTIZED against the source's own (location → directory) mapping
  * before the new document is written. The new document's `location` is
  * the new table directory, so the reader-side relocation rule
  * (`IcebergTable.resolve`: rebase only paths under `metadata.location`)
  * passes the foreign absolute paths through untouched, while everything
  * the new table writes later resolves under its own location.
  */
object TableClone {

  private def absolutize(origLocation: String, origDir: String,
                         path: String): String =
    if (path.startsWith(origLocation))
      origDir + path.stripPrefix(origLocation)
    else path

  /** Write `root` as the new table's first metadata document
    * (create-new: an existing table at `targetDir` refuses). */
  private def writeFirst(mapper: ObjectMapper, root: ObjectNode,
                         targetDir: String, conf: Configuration): Unit = {
    val path = new Path(s"$targetDir/metadata/v1.metadata.json")
    val fs = path.getFileSystem(conf)
    val out =
      try fs.create(path, false)
      catch {
        case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                  _: java.nio.file.FileAlreadyExistsException) =>
          throw new IllegalArgumentException(
            s"table at $targetDir already exists (${e.getMessage})")
      }
    try out.write(mapper.writerWithDefaultPrettyPrinter
      .writeValueAsString(root)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def loadRoot(mapper: ObjectMapper, metadataFile: Path,
                       conf: Configuration): ObjectNode = {
    val in = metadataFile.getFileSystem(conf).open(metadataFile)
    try mapper.readTree(in).asInstanceOf[ObjectNode] finally in.close()
  }

  /** Snapshot-clone `sourceDir`'s current state into a new independent
    * table at `targetDir`. Returns the adopted snapshot id. */
  def snapshotClone(sourceDir: String, targetDir: String,
                    conf: Configuration): Long = {
    val mapper = new ObjectMapper()
    val srcLatest = TableMetadata.latestMetadataPath(sourceDir, conf)
    val root = loadRoot(mapper, srcLatest, conf)
    val origLocation = root.get("location").asText
    val curId = Option(root.get("current-snapshot-id")).map(_.asLong)
      .filter(_ != -1L)
      .getOrElse(throw new IllegalArgumentException(
        s"cannot snapshot $sourceDir: the table has no current snapshot"))

    root.put("table-uuid", java.util.UUID.randomUUID().toString)
    root.put("location", targetDir)
    root.put("last-updated-ms", System.currentTimeMillis())

    // keep ONLY the current snapshot; sever its parent link (the parent
    // does not exist in the clone) and absolutize its manifest list
    val keptSnap: ObjectNode = {
      val snaps = Option(root.get("snapshots")).collect {
        case a: ArrayNode => a.elements
      }.getOrElse(throw new IllegalArgumentException(
        s"cannot snapshot $sourceDir: metadata has no snapshots array"))
      var found: Option[ObjectNode] = None
      snaps.forEachRemaining { s =>
        if (s.get("snapshot-id").asLong == curId)
          found = Some(s.deepCopy[ObjectNode]())
      }
      found.getOrElse(throw new IllegalArgumentException(
        s"cannot snapshot $sourceDir: current snapshot $curId not in list"))
    }
    keptSnap.remove("parent-snapshot-id")
    keptSnap.put("manifest-list",
      absolutize(origLocation, sourceDir, keptSnap.get("manifest-list").asText))
    val snapArr = mapper.createArrayNode(); snapArr.add(keptSnap)
    root.set[ObjectNode]("snapshots", snapArr)

    val logArr = mapper.createArrayNode()
    val logEntry = mapper.createObjectNode()
    logEntry.put("snapshot-id", curId)
    logEntry.put("timestamp-ms", keptSnap.get("timestamp-ms").asLong)
    logArr.add(logEntry)
    root.set[ObjectNode]("snapshot-log", logArr)
    root.remove("metadata-log")
    // statistics entries reference source-lifecycle'd files the clone
    // neither owns nor maintains — drop rather than share
    root.remove("statistics")
    root.remove("partition-statistics")

    val refs = mapper.createObjectNode()
    val main = mapper.createObjectNode()
    main.put("snapshot-id", curId)
    main.put("type", "branch")
    refs.set[ObjectNode]("main", main)
    root.set[ObjectNode]("refs", refs)

    val props = Option(root.get("properties")).collect {
      case o: ObjectNode => o
    }.getOrElse(root.putObject("properties"))
    props.put("gc.enabled", "false")
    props.put("graft.snapshot.source", sourceDir)

    writeFirst(mapper, root, targetDir, conf)
    curId
  }

  /** Register an existing metadata document as a new table at
    * `targetDir`, keeping full history. Returns (snapshot count,
    * current snapshot id if any). */
  def register(metadataFile: String, targetDir: String,
               conf: Configuration): (Int, Option[Long]) = {
    val mapper = new ObjectMapper()
    val mf = new Path(metadataFile)
    val root = loadRoot(mapper, mf, conf)
    require(root.has("location") && root.has("format-version"),
      s"$metadataFile is not an Iceberg table metadata document")
    val origLocation = root.get("location").asText
    // the table dir the document was loaded from (…/<table>/metadata/x.json)
    val origDir = mf.getParent.getParent.toString

    root.put("location", targetDir)
    root.put("last-updated-ms", System.currentTimeMillis())
    var nSnaps = 0
    Option(root.get("snapshots")).foreach(_.elements.forEachRemaining { s =>
      nSnaps += 1
      val o = s.asInstanceOf[ObjectNode]
      o.put("manifest-list",
        absolutize(origLocation, origDir, o.get("manifest-list").asText))
    })
    Option(root.get("statistics")).foreach(_.elements.forEachRemaining { s =>
      val o = s.asInstanceOf[ObjectNode]
      o.put("statistics-path",
        absolutize(origLocation, origDir, o.get("statistics-path").asText))
    })
    Option(root.get("partition-statistics")).foreach(
      _.elements.forEachRemaining { s =>
        val o = s.asInstanceOf[ObjectNode]
        o.put("statistics-path",
          absolutize(origLocation, origDir, o.get("statistics-path").asText))
      })
    // the old location's metadata files are not adopted
    root.remove("metadata-log")

    writeFirst(mapper, root, targetDir, conf)
    val cur = Option(root.get("current-snapshot-id")).map(_.asLong)
      .filter(_ != -1L)
    (nSnaps, cur)
  }
}
