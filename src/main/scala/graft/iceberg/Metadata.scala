package graft.iceberg

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Iceberg table-metadata model + parser (format-version 1 and 2).
  *
  * Mirrors what the reference reads through iceberg-rs when loading a
  * filesystem table (reference `datafusion_iceberg/src/table.rs:314-327`
  * drives the load; the fields parsed here are the ones its scan path
  * consumes at `table.rs:94-296`): schema → StructType, partition spec,
  * current snapshot → manifest-list location. No Iceberg jar exists in
  * the image, so this is a from-scratch reader pinned to the spec.
  */
final case class PartitionField(name: String, transform: String, sourceId: Int, fieldId: Int)

/** One field of a sort order (spec `sort-orders[i].fields[j]`). */
final case class SortOrderField(sourceId: Int, transform: String, direction: String)

final case class IcebergSnapshot(
    snapshotId: Long,
    timestampMs: Long,
    manifestList: String,
    schemaId: Option[Int],
    summary: Map[String, String],
    /** lineage pointer (spec `parent-snapshot-id`); None for the first
      * snapshot or metadata written by pre-lineage tools */
    parentSnapshotId: Option[Long] = None,
    /** v3 row lineage: the first row id this snapshot's new rows were
      * assigned (spec `first-row-id`); None on v1/v2 tables and on
      * snapshots committed before a v3 upgrade */
    firstRowId: Option[Long] = None)

/** Blob entry of a spec `statistics` file as mirrored in table metadata:
  * the blob-metadata list carries the consumable summary (for theta
  * sketches, the `ndv` property) so statistics SERVING never opens the
  * Puffin file — only sketch-merging maintenance does. */
final case class StatisticsBlobMeta(blobType: String, fields: Seq[Int],
                                    properties: Map[String, String])

/** A spec `statistics` metadata entry: one Puffin statistics file
  * computed against `snapshotId`. */
final case class StatisticsFile(snapshotId: Long, path: String,
                                fileSizeInBytes: Long,
                                fileFooterSizeInBytes: Long,
                                blobs: Seq[StatisticsBlobMeta])

/** A spec `partition-statistics` metadata entry: one partition-stats
  * data file (parquet) computed against `snapshotId` — see
  * [[PartitionStats]]. */
final case class PartitionStatsFile(snapshotId: Long, path: String,
                                    fileSizeInBytes: Long)

/** A snapshot ref's retention knobs (all optional; Iceberg spec v2).
  * `maxSnapshotAgeMs`/`minSnapshotsToKeep` govern how much of a BRANCH's
  * history survives expiration; `maxRefAgeMs` ages out the ref itself
  * (measured from its referenced snapshot's commit timestamp). */
final case class RefRetention(maxSnapshotAgeMs: Option[Long] = None,
                              minSnapshotsToKeep: Option[Int] = None,
                              maxRefAgeMs: Option[Long] = None) {
  def isEmpty: Boolean =
    maxSnapshotAgeMs.isEmpty && minSnapshotsToKeep.isEmpty && maxRefAgeMs.isEmpty
}

final case class TableMetadata(
    formatVersion: Int,
    location: String,
    schema: StructType,
    /** column name → iceberg field id, for bounds-map lookups */
    fieldIds: Map[String, Int],
    partitionSpec: Seq[PartitionField],
    /** spec id the `partitionSpec` belongs to — manifests written under a
      * different spec id must not be pruned positionally against it */
    defaultSpecId: Int,
    /** field ids whose iceberg type is `uuid`: bounds are 16 raw bytes,
      * not UTF-8, so stats decoding must refuse them (keep, never prune) */
    uuidFieldIds: Set[Int],
    /** Field ids of v3 geometry/geography columns: read as WKB binary;
      * their manifest bounds are spec bounding-box points, NOT
      * byte-comparable — pruning must doubt-keep (same rule class as
      * uuid's raw-bytes bounds). */
    geoFieldIds: Set[Int] = Set.empty,
    /** Field ids of v3 `timestamp_ns`/`timestamptz_ns` columns (present
      * only under the BIGINT-nanos read opt-in — otherwise the parse
      * refused): read as epoch-nanos LongType; writes stamp the exact
      * int64 with the parquet NANOS annotation. Their int64 bounds DO
      * decode correctly as longs, so pruning stays on. */
    nsFieldIds: Set[Int] = Set.empty,
    currentSnapshotId: Option[Long],
    snapshots: Seq[IcebergSnapshot],
    properties: Map[String, String],
    /** Column names whose name→field-id mapping differs in ANY historical
      * schema (rename landing on a reused name, drop + re-add). Parquet
      * row-group filter pushdown is NAME-keyed inside parquet-mr, so a
      * pushed predicate on such a column can prune against an old file's
      * same-named-but-different-id column — silently wrong. Scans must
      * exclude these names from parquet-level pushdown (projection is
      * id-resolved and unaffected; manifest/file pruning is id-keyed and
      * stays sound). */
    idShiftedNames: Set[String] = Set.empty,
    /** Default sort order (0 = unsorted): writes cluster + sort by it so
      * file bounds on the sort key stay tight; recorded per data file. */
    defaultSortOrderId: Int = 0,
    sortOrderFields: Seq[SortOrderField] = Nil,
    /** Named snapshot refs (branches/tags): ref name → snapshot id.
      * `main` mirrors `current-snapshot-id`; other refs are time-travel
      * targets and protect their snapshots from expiration. */
    refs: Map[String, Long] = Map.empty,
    /** `snapshot-log` entry snapshot ids, oldest → newest: the COMMIT
      * ORDER of `main`. Snapshot ids themselves carry no order (the spec
      * lets writers pick random 64-bit ids), so anything that needs
      * "which snapshot came first" — the streaming source's offsets above
      * all — must consult this, never compare raw ids. */
    snapshotLog: Seq[Long] = Nil,
    /** Ref names of type `tag` (immutable pointers — writers refuse
      * them; everything else in [[refs]] is a branch). */
    tagRefs: Set[String] = Set.empty,
    /** EVERY partition spec by id — partition evolution keeps old specs
      * alive because their manifests' partition tuples and summaries are
      * typed by them. [[partitionSpec]] is `partitionSpecs(defaultSpecId)`;
      * readers resolving a manifest's `partition_spec_id` look here. */
    partitionSpecs: Map[Int, Seq[PartitionField]] = Map.empty,
    /** Per-ref retention policy (spec ref fields `max-snapshot-age-ms`,
      * `min-snapshots-to-keep`, `max-ref-age-ms`) — what lets a
      * maintenance job express "keep audit branches 7 days, main 100
      * snapshots" in ONE expireSnapshots call. Refs with no policy are
      * absent. */
    refRetention: Map[String, RefRetention] = Map.empty,
    /** Spec `statistics` field: Puffin statistics files by snapshot
      * (`analyze_table` writes one per run; expiration drops entries of
      * removed snapshots). NDV serving reads the mirrored blob
      * properties here, not the files. */
    statistics: Seq[StatisticsFile] = Nil,
    /** v3 row lineage: the next row id to assign (spec `next-row-id`).
      * None on v1/v2 metadata. */
    nextRowId: Option[Long] = None,
    /** Spec `partition-statistics` field: per-snapshot partition-stats
      * files ([[PartitionStats]] maintains them incrementally on append
      * when declared; expiration drops entries of removed snapshots). */
    partitionStatistics: Seq[PartitionStatsFile] = Nil,
    /** The current schema's `identifier-field-ids` (spec schema field;
      * the reference builds its SchemaV2 with them, `table.rs:371`) —
      * the declared row-identity columns. Empty when undeclared. Used to
      * pair CDC updates on v2 tables (no row lineage) and as the
      * default upsert key set. */
    identifierFieldIds: Seq[Int] = Nil,
    /** Schema id of [[schema]] (the document's `current-schema-id`, or
      * the id of whatever schema an override pinned). Commits stamp it
      * into new snapshots so time travel can read each snapshot under
      * the schema it was written with. */
    currentSchemaId: Int = 0,
    /** The metadata document this was parsed from, when parsed from one —
      * what lets [[IcebergTable.atSnapshot]] re-parse under a pinned
      * snapshot's own schema id (REPLACE TABLE / schema evolution assign
      * new field ids; reading an old snapshot with the new ids would
      * serve nulls). Driver-side only; a few KB per loaded table. */
    rawJson: Option[String] = None) {

  def currentSnapshot: Option[IcebergSnapshot] =
    currentSnapshotId.filter(_ != -1L).flatMap(id => snapshots.find(_.snapshotId == id))

  /** Snapshot ids in commit order, oldest → newest: the `snapshot-log`
    * when present (expiration prunes its dead entries, rollback appends a
    * repeat entry — both fine for position lookups via `lastIndexOf`);
    * otherwise the `parent-snapshot-id` chain walked back from the
    * current snapshot (metadata written without a log). */
  def snapshotLineage: Seq[Long] =
    if (snapshotLog.nonEmpty) snapshotLog
    else {
      val byId = snapshots.map(s => s.snapshotId -> s).toMap
      val chain = Iterator.iterate(currentSnapshot)(
        _.flatMap(_.parentSnapshotId).flatMap(byId.get))
        .takeWhile(_.isDefined).flatten.map(_.snapshotId)
        .take(snapshots.size) // cap: a cyclic parent chain must not hang
        .toSeq
      chain.reverse
    }

  /** Commit order of a BRANCH, oldest → newest: main uses the
    * snapshot-log ([[snapshotLineage]]); any other ref walks its
    * parent-snapshot-id chain back from the ref head (branches have no
    * log of their own). Empty when the ref does not exist. */
  def branchLineage(ref: String): Seq[Long] =
    if (ref == "main") snapshotLineage
    else refs.get(ref) match {
      case None => Nil
      case Some(head) =>
        val byId = snapshots.map(s => s.snapshotId -> s).toMap
        Iterator.iterate(byId.get(head))(
          _.flatMap(_.parentSnapshotId).flatMap(byId.get))
          .takeWhile(_.isDefined).flatten.map(_.snapshotId)
          .take(snapshots.size) // cap: a cyclic parent chain must not hang
          .toSeq.reverse
    }

  /** Source-column names of identity partition fields (the only transform
    * the reference supports — fixture `v1.metadata.json:70`). */
  def identityPartitionColumns: Seq[String] =
    partitionSpec.filter(_.transform == "identity").map(_.name)

  /** Top-level column names of [[identifierFieldIds]], in declaration
    * order. An id that resolves to no CURRENT column (dropped without
    * clearing the identifier set — foreign metadata) is refused loudly:
    * silently pairing on a partial key would mis-attribute updates. */
  def identifierFieldNames: Seq[String] = {
    if (identifierFieldIds.isEmpty) Nil
    else {
      val byId = fieldIds.map(_.swap)
      identifierFieldIds.map(id => byId.getOrElse(id,
        throw new IllegalStateException(
          s"identifier-field-id $id resolves to no current schema column " +
            s"(have: ${fieldIds.map { case (n, i) => s"$n=$i" }.mkString(", ")})")))
    }
  }

  /** The spec a manifest with this `partition_spec_id` was written under —
    * None when the id is unknown (foreign metadata that dropped the list),
    * in which case pruning must keep, never guess. */
  def specById(id: Int): Option[Seq[PartitionField]] =
    partitionSpecs.get(id)
      .orElse(if (id == defaultSpecId) Some(partitionSpec) else None)
}

object TableMetadata {

  /** Field-metadata key carrying a column's original iceberg spatial type
    * (`geometry[(crs)]` / `geography[(crs, algorithm)]`). Presence means:
    * the Spark-visible type is WKB `BinaryType`, bounds must NOT be used
    * for pruning (spec geo bounds are bounding-box points), and writes
    * track WKB bounding boxes for the manifest bounds (top-level parquet
    * columns; other shapes refuse — [[graft.iceberg.WriteTypeGuards]]). */
  val GeoTypeKey = "iceberg.geo-type"

  def isGeoType(t: String): Boolean =
    t == "geometry" || t.startsWith("geometry(") ||
      t == "geography" || t.startsWith("geography(")

  /** Field-metadata key carrying a column's original nanosecond timestamp
    * type (`timestamp_ns` / `timestamptz_ns`) when the BIGINT-nanos read
    * opt-in is active. Presence means: the Spark-visible type is BIGINT
    * epoch nanos, and writes stamp the exact int64 with parquet's
    * TIMESTAMP(NANOS) annotation (top-level parquet columns; other
    * shapes refuse — [[graft.iceberg.WriteTypeGuards]]). */
  val NsTypeKey = "iceberg.ns-type"

  /** Opt-in switch (table property; also honored `spark.`-prefixed as a
    * session conf): read `timestamp_ns`/`timestamptz_ns` columns
    * losslessly as BIGINT epoch nanos instead of refusing. Under the
    * opt-in, writes are ALSO accepted: the exact int64 is written with
    * parquet's TIMESTAMP(NANOS) annotation (see
    * [[graft.iceberg.WriteTypeGuards]]).
    *
    * The SESSION-CONF route resolves through the thread-local active
    * session, falling back to the JVM-global DEFAULT session — which is
    * what committer/listener/pool threads without an attached session
    * see — so one operation's parses agree across threads in the
    * single-session driver (the common shape). A thread seeing NEITHER
    * session fails CLOSED (the loud refusal): a cached last-known value
    * would fail OPEN, silently enabling nanos reads/writes for sessions
    * and tables that never opted in. The TABLE-PROPERTY route has no
    * thread dependence at all and is the durable opt-in; prefer it for
    * anything beyond ad-hoc reads. A malformed conf value (anything but
    * true/false) throws rather than being guessed. */
  val NsAsBigintKey = "graft.read.timestamp-ns-as-bigint"

  private def sessionNsOptIn(): Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .exists(_.conf.getOption(s"spark.$NsAsBigintKey").exists(_.toBoolean))

  def isNsType(t: String): Boolean =
    t == "timestamp_ns" || t == "timestamptz_ns"

  /** Does any primitive anywhere in this type JSON (nested struct/list/
    * map included) satisfy `pred`? */
  private def typeTreeContains(node: JsonNode,
                               pred: String => Boolean): Boolean =
    if (node == null) false
    else if (node.isTextual) pred(node.asText)
    else node.get("type").asText match {
      case "struct" => node.get("fields").elements.asScala
        .exists(f => typeTreeContains(f.get("type"), pred))
      case "list" => typeTreeContains(node.get("element"), pred)
      case "map" => typeTreeContains(node.get("key"), pred) ||
        typeTreeContains(node.get("value"), pred)
      case _ => false
    }
  private val mapper = new ObjectMapper()

  /** Parse an Iceberg primitive/nested type string or node to a Spark type.
    * Type table follows the Iceberg spec single-value/primitive list; the
    * reference's supported pruning set is the same shape
    * (`pruning_statistics.rs:202-242`).
    */
  def toSparkType(node: JsonNode): DataType = toSparkType(node, false)

  def toSparkType(node: JsonNode, nsAsBigint: Boolean): DataType =
    if (node.isTextual) primitive(node.asText, nsAsBigint)
    else node.get("type").asText match {
      case "struct" =>
        StructType(node.get("fields").elements.asScala.map { f =>
          val mb = new MetadataBuilder()
          if (f.get("type").isTextual && isGeoType(f.get("type").asText))
            mb.putString(GeoTypeKey, f.get("type").asText)
          if (f.get("type").isTextual && isNsType(f.get("type").asText))
            mb.putString(NsTypeKey, f.get("type").asText)
          StructField(f.get("name").asText,
            toSparkType(f.get("type"), nsAsBigint),
            nullable = !f.get("required").asBoolean,
            metadata = mb.build())
        }.toSeq)
      case "list" =>
        ArrayType(toSparkType(node.get("element"), nsAsBigint),
          containsNull = !Option(node.get("element-required")).exists(_.asBoolean))
      case "map" =>
        MapType(toSparkType(node.get("key"), nsAsBigint),
          toSparkType(node.get("value"), nsAsBigint),
          valueContainsNull = !Option(node.get("value-required")).exists(_.asBoolean))
      case other => throw new IllegalArgumentException(s"unsupported iceberg type: $other")
    }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[(\d+)\]""".r

  def primitive(t: String): DataType = primitive(t, false)

  def primitive(t: String, nsAsBigint: Boolean): DataType = t match {
    case "boolean"       => BooleanType
    case "int"           => IntegerType
    case "long"          => LongType
    case "float"         => FloatType
    case "double"        => DoubleType
    case "date"          => DateType
    case "time"          => LongType // micros since midnight; Spark has no TIME column type
    case "timestamp"     => TimestampNTZType
    case "timestamptz"   => TimestampType
    case "string"        => StringType
    case "uuid"          => StringType
    case "binary"        => BinaryType
    case FixedRe(_)      => BinaryType
    case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
    // v3 semi-structured: Spark 4's native VariantType — the Parquet
    // VARIANT annotated group (metadata/value[/typed_value]) both engines
    // share, so files round-trip bit-compatibly with other v3 readers.
    case "variant"       => VariantType
    // v3 `unknown`: a column whose type is not yet known; always null,
    // never stored in data files. NullType is Spark's exact analogue.
    case "unknown"       => NullType
    // v3 nanosecond timestamps: Spark has no nanos type, so the default
    // is a loud refusal. The explicit opt-in (table property or
    // `spark.`-prefixed session conf `graft.read.timestamp-ns-as-bigint`)
    // serves the column LOSSLESSLY as BIGINT epoch nanos — the exact
    // stored int64, no truncation; the consumer owns the interpretation.
    // Under the same opt-in WRITES are accepted too (the dual rule):
    // the exact int64 is written with parquet's TIMESTAMP(NANOS)
    // annotation so the column keeps meaning a nanosecond timestamp for
    // capable readers; nested/ORC/Avro/partition-source shapes refuse
    // ([[graft.iceberg.WriteTypeGuards]]).
    case "timestamp_ns" | "timestamptz_ns" =>
      if (nsAsBigint) LongType
      else throw new UnsupportedOperationException(
        s"iceberg type $t: Spark has no nanosecond timestamp type, so this " +
          "engine cannot read or write it without silent precision loss — " +
          "read the table with a nanos-capable engine, migrate the column " +
          "to timestamp/timestamptz (microseconds), or opt in to a " +
          "lossless BIGINT-nanos read with the " +
          s"${TableMetadata.NsAsBigintKey} table property (or the " +
          s"spark.${TableMetadata.NsAsBigintKey} session conf)")
    // v3 geometry/geography: the data-file representation IS WKB bytes
    // (the spec's parquet encoding), so a BinaryType passthrough read
    // serves the exact stored values — what the reference already prunes
    // as plain Binary (`pruning_statistics.rs:233-238`). Spark has no
    // spatial type, so the column reads as WKB BinaryType; fields are
    // marked [[TableMetadata.GeoTypeKey]] so (a) pruning doubt-keeps
    // them (the spec's geo bounds are bounding-box points, NOT
    // byte-comparable), and (b) writes track per-file WKB bounding
    // boxes and record the spec's POINT bounds in manifests (top-level
    // parquet columns; exotic WKB kinds and nested/ORC/Avro shapes
    // refuse loudly — [[graft.iceberg.WriteTypeGuards]], [[GeoWkb]]).
    case g if TableMetadata.isGeoType(g) => BinaryType
    case other           => throw new IllegalArgumentException(s"unsupported iceberg primitive: $other")
  }

  private def schemaNode(root: JsonNode,
                         overrideId: Option[Int] = None): JsonNode = {
    val fromList = Option(root.get("schemas")).flatMap { arr =>
      val all = arr.elements.asScala.toSeq
      def byId(i: Option[Int]) =
        i.flatMap(id => all.find(_.get("schema-id").asInt == id))
      // an override naming a schema the document no longer carries falls
      // back to the current schema (degraded, never a silent last-entry
      // guess against an unrelated id)
      byId(overrideId)
        .orElse(byId(Option(root.get("current-schema-id")).map(_.asInt)))
        .orElse(all.lastOption)
    }
    fromList.orElse(Option(root.get("schema")))
      .getOrElse(throw new IllegalArgumentException("metadata has no schema"))
  }

  private def parseSpecFields(fields: Seq[JsonNode]): Seq[PartitionField] =
    fields.map { f =>
      PartitionField(f.get("name").asText, f.get("transform").asText,
        f.get("source-id").asInt, f.get("field-id").asInt)
    }

  /** All partition specs by id. Legacy v1 metadata with only a flat
    * `partition-spec` yields that one spec under the default id. */
  private def allSpecs(root: JsonNode): Map[Int, Seq[PartitionField]] = {
    val defaultId = Option(root.get("default-spec-id")).map(_.asInt).getOrElse(0)
    val fromList = Option(root.get("partition-specs")).map { arr =>
      arr.elements.asScala.toSeq.map { s =>
        s.get("spec-id").asInt ->
          parseSpecFields(s.get("fields").elements.asScala.toSeq)
      }.toMap
    }
    fromList.getOrElse {
      Option(root.get("partition-spec"))
        .map(s => Map(defaultId -> parseSpecFields(s.elements.asScala.toSeq)))
        .getOrElse(Map.empty)
    }
  }

  def fromJson(json: String): TableMetadata = fromJson(json, None)

  /** Parse with the schema pinned to `schemaIdOverride` instead of the
    * document's `current-schema-id` — how a time-traveling scan reads a
    * snapshot under the schema it was written with. Every schema-derived
    * field (fieldIds, geo/ns/uuid sets, identifier fields) follows the
    * pinned schema consistently. */
  def fromJson(json: String, schemaIdOverride: Option[Int]): TableMetadata = {
    val root = mapper.readTree(json)
    // encrypted tables (v3 `encryption-keys`): this engine has no key
    // management — refuse at metadata load with a typed message instead
    // of failing later with a raw Avro/parquet decode error on
    // ciphertext. An empty list means "nothing encrypted": proceed.
    Option(root.get("encryption-keys")).filter(_.elements.hasNext).foreach {
      keys =>
        throw new UnsupportedOperationException(
          "table encryption not supported: the metadata declares " +
            s"${keys.size} encryption key(s) (`encryption-keys`) and this " +
            "engine ships no key-management integration — read the table " +
            "with an encryption-capable engine")
    }
    val sn = schemaNode(root, schemaIdOverride)
    val fields = sn.get("fields").elements.asScala.toSeq
    val propsMap = Option(root.get("properties"))
      .map(n => n.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap)
      .getOrElse(Map.empty[String, String])
    // ns-as-bigint opt-in: table property first (travels with the
    // adopted table), `spark.`-prefixed session conf second (driver-side
    // opt-in without a metadata edit)
    val nsAsBigint = propsMap.get(NsAsBigintKey).exists(_.toBoolean) ||
      sessionNsOptIn()
    val schema = StructType(fields.map { f =>
      // parquet.field.id: Spark's parquet reader resolves an id-bearing
      // read schema BY FIELD ID (the Iceberg contract) — which is what
      // makes schema-evolution RENAMES read old files correctly (a
      // renamed column keeps its id; name-matching would yield nulls).
      // Consequence: data files must carry ids, as the Iceberg spec
      // requires of writers (IcebergWriter stamps them); a non-conformant
      // id-less file now fails fast instead of mis-reading.
      val mb = new MetadataBuilder()
        .putLong("iceberg.field-id", f.get("id").asLong)
        .putLong("parquet.field.id", f.get("id").asLong)
      // v3 default values ride Spark's own column-default field metadata:
      // initial-default → EXISTS_DEFAULT (parquet/ORC readers fill a
      // column ABSENT from the file with it — the spec's read rule,
      // decided per file at footer-open time), write-default →
      // CURRENT_DEFAULT (the analyzer fills INSERTs omitting the column).
      // Parse failures are LOUD: silently dropping a declared default
      // would serve NULL where the table contract says otherwise.
      if (f.get("type").isTextual) {
        val t = f.get("type").asText
        // spatial columns keep their original type string on the field:
        // the read type is WKB binary, but pruning and writes must know
        if (isGeoType(t)) mb.putString(GeoTypeKey, t)
        // nanosecond columns likewise (BIGINT-nanos read; writes refuse)
        if (isNsType(t)) mb.putString(NsTypeKey, t)
        Option(f.get("initial-default")).filterNot(_.isNull).foreach(d =>
          mb.putString("EXISTS_DEFAULT", DefaultValues.jsonToSql(d, t)))
        Option(f.get("write-default")).filterNot(_.isNull).foreach(d =>
          mb.putString("CURRENT_DEFAULT", DefaultValues.jsonToSql(d, t)))
      } else if (f.has("initial-default") || f.has("write-default")) {
        val hasReal = Seq("initial-default", "write-default")
          .exists(k => Option(f.get(k)).exists(!_.isNull))
        if (hasReal) throw new UnsupportedOperationException(
          s"column ${f.get("name").asText}: default values on nested " +
            "types are not supported (primitive columns only)")
      }
      StructField(f.get("name").asText, toSparkType(f.get("type"), nsAsBigint),
        nullable = !f.get("required").asBoolean,
        metadata = mb.build())
    })
    val fieldIds = fields.map(f => f.get("name").asText -> f.get("id").asInt).toMap
    val specs = allSpecs(root)
    val specDefaultId = Option(root.get("default-spec-id")).map(_.asInt).getOrElse(0)
    val spec = specs.getOrElse(specDefaultId,
      specs.values.headOption.getOrElse(Seq.empty))
    val uuidIds = fields.collect {
      case f if f.get("type").isTextual && f.get("type").asText == "uuid" =>
        f.get("id").asInt
    }.toSet
    val snapshots = Option(root.get("snapshots")).map(_.elements.asScala.toSeq).getOrElse(Nil)
      .map { s =>
        // Long.MinValue is reserved as the streaming source's
        // before-any-snapshot offset sentinel (GraftStreamOffset): refuse
        // a table using it as a real id rather than mis-resume a stream.
        require(s.get("snapshot-id").asLong != Long.MinValue,
          s"snapshot id ${Long.MinValue} is reserved (streaming initial-" +
            "offset sentinel); rewrite the table with a different id")
        IcebergSnapshot(
          snapshotId = s.get("snapshot-id").asLong,
          timestampMs = Option(s.get("timestamp-ms")).map(_.asLong).getOrElse(0L),
          manifestList = s.get("manifest-list").asText,
          schemaId = Option(s.get("schema-id")).map(_.asInt),
          summary = Option(s.get("summary"))
            .map(n => n.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap)
            .getOrElse(Map.empty),
          parentSnapshotId = Option(s.get("parent-snapshot-id")).map(_.asLong),
          firstRowId = Option(s.get("first-row-id")).map(_.asLong))
      }
    TableMetadata(
      formatVersion = root.get("format-version").asInt,
      location = root.get("location").asText,
      schema = schema,
      fieldIds = fieldIds,
      partitionSpec = spec,
      defaultSpecId = specDefaultId,
      partitionSpecs = specs,
      uuidFieldIds = uuidIds,
      // recursive: a geo/ns type NESTED in a struct/list/map registers
      // its TOP-LEVEL column too — the write refusals key on these sets,
      // and a nested spatial/nanos value written without its annotation
      // would silently change the column's meaning for capable readers
      geoFieldIds = fields.collect {
        case f if typeTreeContains(f.get("type"), isGeoType) =>
          f.get("id").asInt
      }.toSet,
      nsFieldIds = fields.collect {
        case f if typeTreeContains(f.get("type"), isNsType) =>
          f.get("id").asInt
      }.toSet,
      currentSnapshotId = Option(root.get("current-snapshot-id")).map(_.asLong),
      snapshots = snapshots,
      properties = Option(root.get("properties"))
        .map(n => n.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap)
        .getOrElse(Map.empty),
      idShiftedNames = {
        val historical = Option(root.get("schemas")).map(_.elements.asScala.toSeq)
          .getOrElse(Nil)
          .flatMap(s => Option(s.get("fields")).map(_.elements.asScala.toSeq)
            .getOrElse(Nil))
          .map(f => f.get("name").asText -> f.get("id").asInt)
        historical.collect {
          case (name, id) if fieldIds.get(name).exists(_ != id) => name
        }.toSet
      },
      defaultSortOrderId =
        Option(root.get("default-sort-order-id")).map(_.asInt).getOrElse(0),
      sortOrderFields = {
        val defaultId = Option(root.get("default-sort-order-id")).map(_.asInt).getOrElse(0)
        Option(root.get("sort-orders")).map(_.elements.asScala.toSeq).getOrElse(Nil)
          .find(o => Option(o.get("order-id")).exists(_.asInt == defaultId))
          .map(o => Option(o.get("fields")).map(_.elements.asScala.toSeq).getOrElse(Nil)
            .map(f => SortOrderField(
              f.get("source-id").asInt,
              Option(f.get("transform")).map(_.asText).getOrElse("identity"),
              Option(f.get("direction")).map(_.asText).getOrElse("asc"))))
          .getOrElse(Nil)
      },
      refs = Option(root.get("refs"))
        .map(n => n.properties.asScala.map(e =>
          e.getKey -> e.getValue.get("snapshot-id").asLong).toMap)
        .getOrElse(Map.empty),
      snapshotLog = Option(root.get("snapshot-log"))
        .map(_.elements.asScala.map(_.get("snapshot-id").asLong).toSeq)
        .getOrElse(Nil),
      tagRefs = Option(root.get("refs"))
        .map(n => n.properties.asScala.collect {
          case e if Option(e.getValue.get("type")).exists(_.asText == "tag") =>
            e.getKey
        }.toSet)
        .getOrElse(Set.empty),
      refRetention = Option(root.get("refs"))
        .map(n => n.properties.asScala.flatMap { e =>
          val v = e.getValue
          val r = RefRetention(
            Option(v.get("max-snapshot-age-ms")).map(_.asLong),
            Option(v.get("min-snapshots-to-keep")).map(_.asInt),
            Option(v.get("max-ref-age-ms")).map(_.asLong))
          if (r.isEmpty) None else Some(e.getKey -> r)
        }.toMap)
        .getOrElse(Map.empty),
      nextRowId = Option(root.get("next-row-id")).map(_.asLong),
      partitionStatistics = Option(root.get("partition-statistics"))
        .map(_.elements.asScala.toSeq).getOrElse(Nil)
        .map(s => PartitionStatsFile(
          snapshotId = s.get("snapshot-id").asLong,
          path = s.get("statistics-path").asText,
          fileSizeInBytes = Option(s.get("file-size-in-bytes"))
            .map(_.asLong).getOrElse(0L))),
      identifierFieldIds = Option(sn.get("identifier-field-ids"))
        .map(_.elements.asScala.map(_.asInt).toSeq).getOrElse(Nil),
      currentSchemaId = Option(sn.get("schema-id")).map(_.asInt)
        .orElse(schemaIdOverride)
        .orElse(Option(root.get("current-schema-id")).map(_.asInt))
        .getOrElse(0),
      rawJson = Some(json),
      statistics = Option(root.get("statistics"))
        .map(_.elements.asScala.toSeq).getOrElse(Nil)
        .map { s =>
          StatisticsFile(
            snapshotId = s.get("snapshot-id").asLong,
            path = s.get("statistics-path").asText,
            fileSizeInBytes =
              Option(s.get("file-size-in-bytes")).map(_.asLong).getOrElse(0L),
            fileFooterSizeInBytes = Option(s.get("file-footer-size-in-bytes"))
              .map(_.asLong).getOrElse(0L),
            blobs = Option(s.get("blob-metadata"))
              .map(_.elements.asScala.toSeq).getOrElse(Nil)
              .map(b => StatisticsBlobMeta(
                blobType = b.get("type").asText,
                fields = Option(b.get("fields"))
                  .map(_.elements.asScala.map(_.asInt).toSeq).getOrElse(Nil),
                properties = Option(b.get("properties"))
                  .map(n => n.properties.asScala
                    .map(e => e.getKey -> e.getValue.asText).toMap)
                  .getOrElse(Map.empty))))
        })
  }

  private val VersionedName = """(?:v(\d+)|(\d+)-[-0-9a-fA-F]+)\.metadata\.json""".r

  /** Best-effort pointer at the current metadata version, written by
    * [[FsCommitter.publishAfter]] after every successful commit (the
    * HadoopTableOperations idiom). Purely advisory: a stale (low) hint is
    * healed by probing forward, a hint pointing at an expired/absent
    * version falls back to the listing, and external writers that never
    * write a hint keep the listing path. */
  val VersionHintFile = "version-hint.text"

  /** Latest metadata file under `<tableDir>/metadata/`, supporting both
    * `vN.metadata.json` (fixture style) and `NNNNN-uuid.metadata.json`
    * (Spark-writer style) names. All I/O goes through Hadoop FileSystem so
    * `file://`, `s3a://`, … work alike (reference A10 object-store
    * indirection, `table.rs:116-126`, is this indirection in Spark).
    *
    * Resolution is hint-first (round 20): the metadata directory also
    * holds every manifest and manifest list, so the listing is O(commit
    * history) FS work — measured as the second-hottest driver frame in a
    * commit loop, and on an object store a LIST per table load. With the
    * hint the common case is 3 point lookups (read hint, confirm vN,
    * probe vN+1), independent of history length. The probe loop heals a
    * stale hint left by a crash between publish and hint write; any
    * doubt (missing/corrupt hint, hinted version absent) falls back to
    * the full listing. Engines other than this one only write the
    * uuid-form names — they never write a hint, so their tables always
    * take the listing path.
    */
  def latestMetadataPath(tableDir: String, conf: Configuration): Path = {
    val dir = new Path(tableDir, "metadata")
    val fs = dir.getFileSystem(conf)
    hintedVersion(fs, dir).foreach { h =>
      if (fs.exists(new Path(dir, s"v$h.metadata.json"))) {
        var v = h
        while (fs.exists(new Path(dir, s"v${v + 1}.metadata.json"))) v += 1
        return new Path(dir, s"v$v.metadata.json")
      }
    }
    val candidates = fs.listStatus(dir).map(_.getPath).toSeq
      .flatMap { p =>
        p.getName match {
          case VersionedName(v1, v2) => Some(Option(v1).getOrElse(v2).toLong -> p)
          case _ => None
        }
      }
    if (candidates.isEmpty)
      throw new IllegalArgumentException(s"no metadata.json under $dir")
    candidates.maxBy(_._1)._2
  }

  /** [[latestMetadataPath]] for COMMIT bases. The hint fast path probes
    * only `vN.metadata.json` names, so it can miss a newer
    * `NNNNN-uuid.metadata.json` committed by an EXTERNAL engine (this
    * resolver supports both forms, but only this engine writes hints) —
    * and a commit built on that stale base would silently drop the
    * external commit (ADVICE r20, medium). Commits are rare relative to
    * loads and already perform several FS round-trips, so the commit
    * base always takes the full LISTING (which sees both name forms and
    * strictly dominates the hint); READS keep the O(1) hint path — a
    * hint-lagged read serves a consistent earlier snapshot, never lost
    * data, and the next commit both arbitrates via create-new and
    * re-heals the hint. */
  private[iceberg] def latestMetadataPathForCommit(
      tableDir: String, conf: Configuration): Path = {
    val dir = new Path(tableDir, "metadata")
    val fs = dir.getFileSystem(conf)
    val candidates = fs.listStatus(dir).map(_.getPath).toSeq
      .flatMap { p =>
        p.getName match {
          case VersionedName(v1, v2) => Some(Option(v1).getOrElse(v2).toLong -> p)
          case _ => None
        }
      }
    if (candidates.isEmpty)
      throw new IllegalArgumentException(s"no metadata.json under $dir")
    candidates.maxBy(_._1)._2
  }

  /** Fast table-existence probe: the hint names a version AND that
    * version's metadata file exists — two point lookups, no listing. A
    * bare leftover hint with no metadata.json (external cleanup, partial
    * copy) returns false so callers fall through to their listing check
    * instead of reporting a table that would fail at load (ADVICE r20). */
  private[graft] def hintedTableExists(tableDir: String,
                                       conf: Configuration): Boolean =
    try {
      val dir = new Path(tableDir, "metadata")
      val fs = dir.getFileSystem(conf)
      hintedVersion(fs, dir)
        .exists(h => fs.exists(new Path(dir, s"v$h.metadata.json")))
    } catch { case _: Exception => false }

  private def hintedVersion(fs: org.apache.hadoop.fs.FileSystem,
                            dir: Path): Option[Long] =
    try {
      val p = new Path(dir, VersionHintFile)
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim finally in.close()
      Some(s.toLong).filter(_ >= 0)
    } catch { case _: Exception => None }

  /** Best-effort hint write after a successful commit: overwrite is fine
    * (the hint is advisory and monotone under the create-new commit
    * point), failure is fine (readers heal or fall back). */
  private[iceberg] def writeVersionHint(tableDir: String, version: Long,
                                        conf: Configuration): Unit =
    try {
      val p = new Path(new Path(tableDir, "metadata"), VersionHintFile)
      val out = p.getFileSystem(conf).create(p, true)
      try out.write(version.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch { case _: Exception => () }

  def load(tableDir: String, conf: Configuration): TableMetadata = {
    val p = latestMetadataPath(tableDir, conf)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try fromJson(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }
}
