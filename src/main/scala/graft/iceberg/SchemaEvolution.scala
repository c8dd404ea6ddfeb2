package graft.iceberg

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.TableChange

/** `ALTER TABLE` as Iceberg schema evolution: the evolved schema is
  * committed as a NEW entry in the metadata's `schemas` list (new
  * schema-id, `current-schema-id` moved, `last-column-id` advanced) —
  * data files are never touched. Correct reads fall out of the field-id
  * contract the scan already honors:
  *
  *  - RENAME keeps the field id, so old files resolve the new name by id;
  *  - ADD allocates a fresh id that no old file carries → nulls;
  *  - DROP removes the field from the read schema; the id is never
  *    reused (`last-column-id` is monotone), so a later re-add of the
  *    same NAME cannot resurrect old values;
  *  - type updates are restricted to the Iceberg-safe widenings
  *    (int→long, float→double, decimal precision growth) which the
  *    vectorized parquet reader up-casts in place.
  *
  * Columns referenced by the partition spec refuse rename/drop/retype:
  * spec fields pin their source by id, but identity spec-field NAMES
  * mirror the column name (manifest partition tuples are keyed by it),
  * so a rename would desync tuples from the schema. The reference has no
  * DDL surface at all (SURVEY §2.C) — extension, like the write path.
  */
object SchemaEvolution {

  import graft.iceberg.connector.IcebergJson

  /** Deep copy of the CURRENT schema node (same preference order the
    * reader uses: schemas-list by current-schema-id, last entry, legacy
    * flat `schema`) + the schema id this edit derives from — ONE copy of
    * the selection shared by [[alter]] and the identifier-field rewrites
    * so the commit-base rule cannot drift between DDL families. */
  private def currentSchemaAndBase(root: ObjectNode): (ObjectNode, Int) = {
    val currentId = Option(root.get("current-schema-id")).map(_.asInt)
    val fromList = Option(root.get("schemas")).flatMap { arr =>
      val all = arr.elements.asScala.toSeq
      currentId.flatMap(id => all.find(_.get("schema-id").asInt == id))
        .orElse(all.lastOption)
    }
    val node = fromList.orElse(Option(root.get("schema")))
      .getOrElse(throw new IllegalArgumentException("metadata has no schema"))
      .deepCopy[ObjectNode]()
    val baseId = currentId
      .orElse(Option(node.get("schema-id")).map(_.asInt)).getOrElse(0)
    (node, baseId)
  }

  def alter(tableDir: String, conf: Configuration,
            changes: Seq[TableChange],
            committer: Option[TableCommitter] = None): Unit = {
    val mapper = new ObjectMapper()
    val cmtr = committer.getOrElse(new FsCommitter(tableDir, conf))
    val root = cmtr.currentRoot(mapper)

    val (currentSchema, baseSchemaId) = currentSchemaAndBase(root)
    val fields = currentSchema.get("fields").asInstanceOf[ArrayNode]

    def fieldIdx(name: String): Int =
      (0 until fields.size).find(i => fields.get(i).get("name").asText == name)
        .getOrElse(-1)

    val partitionSourceIds: Set[Int] = {
      val fromList = Option(root.get("partition-specs")).map { arr =>
        arr.elements.asScala.flatMap(s =>
          s.get("fields").elements.asScala.map(_.get("source-id").asInt)).toSet
      }
      val legacy = Option(root.get("partition-spec")).map(
        _.elements.asScala.map(_.get("source-id").asInt).toSet)
      fromList.orElse(legacy).getOrElse(Set.empty)
    }
    def refusePartitionSource(name: String, what: String): Unit = {
      val i = fieldIdx(name)
      if (i >= 0 && partitionSourceIds.contains(fields.get(i).get("id").asInt))
        throw new UnsupportedOperationException(
          s"cannot $what column $name: it is a partition source " +
            "(spec field names and manifest partition tuples are keyed by it)")
    }

    var lastColumnId = Option(root.get("last-column-id")).map(_.asInt).getOrElse {
      (0 until fields.size).map(i => fields.get(i).get("id").asInt).maxOption.getOrElse(0)
    }
    def nextId(): Int = { lastColumnId += 1; lastColumnId }

    /** Iceberg JSON type for an added column, allocating nested ids —
      * the shared serializer with this alter's id allocator injected. */
    def typeNode(dt: org.apache.spark.sql.types.DataType): com.fasterxml.jackson.databind.JsonNode =
      IcebergJson.typeNodeWithIds(mapper, dt, nextId _)

    def single(fieldNames: Array[String], change: String): String = {
      if (fieldNames.length != 1) throw new UnsupportedOperationException(
        s"$change on nested field ${fieldNames.mkString(".")} is not supported")
      fieldNames(0)
    }

    // v3 default values (initial-default/write-default) need format
    // version 3 — stamped, or declared via the `format-version = 3`
    // property with the upgrade pending on the next write commit (the
    // same declared-v3 rule row lineage uses).
    def isV3: Boolean =
      Option(root.get("format-version")).exists(_.asInt >= 3) ||
        Option(root.get("properties"))
          .flatMap(p => Option(p.get("format-version")))
          .exists(_.asText == "3")
    def requireV3(what: String): Unit =
      if (!isV3) throw new UnsupportedOperationException(
        s"$what needs Iceberg format-version 3 (ALTER TABLE ... SET " +
          "TBLPROPERTIES ('format-version' = '3') first)")

    var schemaChanged = false
    val propSets = mapper.createObjectNode()
    def declaredFormat: Option[String] =
      Option(propSets.get("write.format-default")).map(_.asText)
        .orElse(Option(root.get("properties"))
          .flatMap(p => Option(p.get("write.format-default"))).map(_.asText))
    def isAvroTable: Boolean = declaredFormat.exists(_.equalsIgnoreCase("avro"))
    def isOrcTable: Boolean = declaredFormat.exists(_.equalsIgnoreCase("orc"))
    val propRemovals = mapper.createArrayNode()
    changes.foreach {
      case add: TableChange.AddColumn =>
        val name = single(add.fieldNames, "ADD COLUMN")
        if (fieldIdx(name) >= 0) throw new IllegalArgumentException(
          s"column $name already exists")
        // a DEFAULT makes existing rows well-defined, so NOT NULL becomes
        // addable (the v3 spec's required-with-initial-default rule);
        // without one, existing rows have no value for a required column
        if (!add.isNullable && add.defaultValue == null)
          throw new UnsupportedOperationException(
            s"added column $name must be nullable: existing rows have no " +
              "value for it (or declare a DEFAULT — format-version 3)")
        // a declared-avro table must refuse the MUTATION that would
        // brick every later write (INSERT, CoW, delete-debt compaction
        // all re-validate the schema) — not the writes after it: type
        // AND name (Avro rejects names parquet/ORC accept)
        if (isAvroTable) {
          if (!AvroDataWrite.writableType(add.dataType))
            throw new UnsupportedOperationException(
              s"cannot add column $name of type ${add.dataType.simpleString} " +
                "to a table with write.format-default = avro — every later " +
                "write would fail (avro-writable types: bigint, int, string, " +
                "double, float, boolean, date, timestamp)")
          AvroDataWrite.requireValidName(name, "ADD COLUMN")
        }
        // v3 TYPES: variant / unknown (VOID) must not land in v2
        // metadata a v2 reader would misparse — same rule as DEFAULTs
        if (IcebergJson.containsV3Type(add.dataType))
          requireV3(s"ADD COLUMN $name of type ${add.dataType.simpleString}")
        // nested unknown has no writable parquet shape (only TOP-LEVEL
        // unknown columns are stripped from data files) — same
        // born-write-dead refusal as CREATE
        if (IcebergJson.containsNestedUnknown(add.dataType))
          throw new UnsupportedOperationException(
            s"ADD COLUMN $name: VOID (unknown) nested inside a composite " +
              "type cannot be stored in data files — add it as a " +
              "top-level column or use a typed field")
        if (isOrcTable && IcebergJson.containsV3Type(add.dataType))
          throw new UnsupportedOperationException(
            s"cannot add column $name of type ${add.dataType.simpleString} " +
              "to a table with write.format-default = orc — this engine's " +
              "ORC kernel has no variant/unknown encoding (use parquet)")
        val fn = mapper.createObjectNode()
        fn.put("id", nextId())
        fn.put("name", name)
        fn.put("required", !add.isNullable)
        fn.set[ObjectNode]("type", typeNode(add.dataType))
        Option(add.comment).foreach(fn.put("doc", _))
        Option(add.defaultValue).foreach { dv =>
          requireV3(s"ADD COLUMN $name ... DEFAULT")
          DefaultValues.requireDefaultable(name, add.dataType, "ADD COLUMN")
          val v = DefaultValues.analyzeDefault(name, add.dataType, dv,
            "ALTER TABLE ... ADD COLUMN")
          if (v == null) throw new UnsupportedOperationException(
            s"ADD COLUMN $name: DEFAULT NULL is expressed by omitting " +
              "the default")
          // initial-default is fixed at add time (spec: immutable — it is
          // what pre-column files read); write-default starts equal and
          // moves via ALTER COLUMN ... SET DEFAULT
          val json = DefaultValues.catalystToJson(mapper, v,
            IcebergJson.icebergType(add.dataType))
          fn.set[ObjectNode]("initial-default", json)
          fn.set[ObjectNode]("write-default", json)
        }
        fields.add(fn)
        schemaChanged = true

      case upd: TableChange.UpdateColumnDefaultValue =>
        val name = single(upd.fieldNames, "ALTER COLUMN DEFAULT")
        val i = fieldIdx(name)
        if (i < 0) throw new IllegalArgumentException(s"no such column: $name")
        val node = fields.get(i).asInstanceOf[ObjectNode]
        // DROP DEFAULT arrives as a null/empty DefaultValue; a SET with
        // an EXPRESSION-only DefaultValue (null SQL string, the DSv2 API
        // allows either form) must not be misread as a drop
        val dropping = upd.newCurrentDefault == null || {
          val dv = upd.newCurrentDefault
          Option(dv.getSql).forall(_.trim.isEmpty) && dv.getExpression == null
        }
        if (dropping) {
          // DROP DEFAULT removes the WRITE default only — initial-default
          // is immutable (files written before the column still read it)
          node.remove("write-default")
        } else {
          requireV3(s"ALTER COLUMN $name SET DEFAULT")
          if (!node.get("type").isTextual)
            throw new UnsupportedOperationException(
              s"ALTER COLUMN $name SET DEFAULT: defaults are supported " +
                "on primitive columns only")
          val icebergT = node.get("type").asText
          val dt = TableMetadata.primitive(icebergT)
          DefaultValues.requireDefaultable(name, dt, "ALTER COLUMN")
          val v = DefaultValues.analyzeDefault(name, dt,
            upd.newCurrentDefault, "ALTER TABLE ... ALTER COLUMN")
          if (v == null) throw new UnsupportedOperationException(
            s"ALTER COLUMN $name SET DEFAULT NULL: use DROP DEFAULT")
          node.set[ObjectNode]("write-default",
            DefaultValues.catalystToJson(mapper, v, icebergT))
        }
        schemaChanged = true

      case ren: TableChange.RenameColumn =>
        val name = single(ren.fieldNames, "RENAME COLUMN")
        refusePartitionSource(name, "rename")
        val i = fieldIdx(name)
        if (i < 0) throw new IllegalArgumentException(s"no such column: $name")
        if (fieldIdx(ren.newName) >= 0) throw new IllegalArgumentException(
          s"column ${ren.newName} already exists")
        if (isAvroTable)
          AvroDataWrite.requireValidName(ren.newName, "RENAME COLUMN")
        val node = fields.get(i).asInstanceOf[ObjectNode]
        val fid = node.get("id").asInt
        node.put("name", ren.newName)
        // Record the OLD name in `schema.name-mapping.default` (same
        // commit): parquet files resolve renames by field id, but
        // ID-LESS data files (Avro/ORC imports) resolve BY NAME — without
        // the alias, every import written under the old name silently
        // reads NULL after this rename. The mapping merges: an entry per
        // field id accumulates every name the field has gone by.
        val currentMapping =
          Option(propSets.get("schema.name-mapping.default")).map(_.asText)
            .orElse(Option(root.get("properties"))
              .flatMap(p => Option(p.get("schema.name-mapping.default")))
              .map(_.asText))
        val mapArr = currentMapping
          .map(mapper.readTree(_).asInstanceOf[ArrayNode])
          .getOrElse(mapper.createArrayNode())
        (0 until mapArr.size).map(mapArr.get)
          .find(e => Option(e.get("field-id")).exists(_.asInt == fid)) match {
          case Some(e) =>
            val names = e.get("names").asInstanceOf[ArrayNode]
            if (!(0 until names.size).exists(j => names.get(j).asText == name))
              names.add(name)
          case None =>
            val e = mapArr.addObject()
            e.put("field-id", fid)
            e.putArray("names").add(name)
        }
        propSets.put("schema.name-mapping.default",
          mapper.writeValueAsString(mapArr))
        schemaChanged = true

      case del: TableChange.DeleteColumn =>
        val name = single(del.fieldNames, "DROP COLUMN")
        val i = fieldIdx(name)
        if (i < 0) {
          if (!del.ifExists) throw new IllegalArgumentException(s"no such column: $name")
        } else {
          refusePartitionSource(name, "drop")
          // dropping a declared identifier field would leave the
          // identifier set dangling (CDC pairing, upsert defaults) —
          // clear or change the identifier fields first
          val idIds = Option(currentSchema.get("identifier-field-ids"))
            .map(_.elements.asScala.map(_.asInt).toSet).getOrElse(Set.empty)
          if (idIds.contains(fields.get(i).get("id").asInt))
            throw new UnsupportedOperationException(
              s"cannot drop column $name: it is a declared identifier field " +
                "(ALTER TABLE ... SET/DROP IDENTIFIER FIELDS first)")
          if (fields.size == 1) throw new UnsupportedOperationException(
            "cannot drop the last column")
          fields.remove(i)
          schemaChanged = true
        }

      case upd: TableChange.UpdateColumnType =>
        val name = single(upd.fieldNames, "ALTER COLUMN TYPE")
        refusePartitionSource(name, "retype")
        val i = fieldIdx(name)
        if (i < 0) throw new IllegalArgumentException(s"no such column: $name")
        val node = fields.get(i).asInstanceOf[ObjectNode]
        val from = if (node.get("type").isTextual) node.get("type").asText else "nested"
        val to = IcebergJson.icebergType(upd.newDataType)
        val DecRe = """decimal\((\d+),\s*(\d+)\)""".r
        val ok = (from, to) match {
          case ("int", "long") => true
          case ("float", "double") => true
          case (DecRe(p1, s1), DecRe(p2, s2)) => s1 == s2 && p2.toInt >= p1.toInt
          // v3 promotions: `unknown` was never stored in any data file,
          // so promoting it to ANY type serves NULL for every existing
          // row by missing-column resolution — trivially sound; `date`
          // widens to `timestamp` (midnight reading) through Spark 4's
          // parquet type-widening read, INT32 date pages decoded under a
          // timestamp read schema
          case ("unknown", _) => requireV3(s"ALTER COLUMN $name TYPE (from unknown)"); true
          case ("date", "timestamp") =>
            requireV3(s"ALTER COLUMN $name TYPE date -> timestamp")
            // Spark's type-widening read (INT32 date pages under a
            // timestamp read schema) exists for parquet only; ORC/Avro
            // files written before the promotion would fail every later
            // read — refuse the DDL, not the reads after it
            if (isOrcTable || isAvroTable) throw new UnsupportedOperationException(
              s"ALTER COLUMN $name TYPE date -> timestamp is supported on " +
                "parquet tables only (ORC/Avro readers cannot widen date " +
                "pages written before the promotion)")
            true
          case (a, b) => a == b
        }
        if (!ok) throw new UnsupportedOperationException(
          s"unsafe type change $from -> $to for column $name (Iceberg allows " +
            "int->long, float->double, decimal precision growth; v3 adds " +
            "unknown->any and date->timestamp)")
        // a promoted column's stored defaults keep the OLD type's JSON
        // serialization; date -> timestamp is the one promotion whose
        // form changes — re-encode (midnight), or the next metadata load
        // would fail parsing "2024-01-05" as a timestamp and brick the
        // table. Numeric widenings parse unchanged (JSON numbers).
        if (from == "date" && to == "timestamp")
          Seq("initial-default", "write-default").foreach { attr =>
            Option(node.get(attr)).filter(_.isTextual).foreach { d =>
              // explicit pattern, NOT ISO_LOCAL_DATE_TIME: the latter
              // omits the seconds field at midnight ("2024-01-05T00:00"),
              // which stricter spec parsers ("YYYY-MM-DDTHH:MM:SS(.f)")
              // in other engines would refuse to load
              node.put(attr, java.time.LocalDate.parse(d.asText)
                .atStartOfDay()
                .format(java.time.format.DateTimeFormatter
                  .ofPattern("yyyy-MM-dd'T'HH:mm:ss")))
            }
          }
        node.put("type", to)
        schemaChanged = true

      case n: TableChange.UpdateColumnNullability =>
        val name = single(n.fieldNames, "ALTER COLUMN NULLABILITY")
        val i = fieldIdx(name)
        if (i < 0) throw new IllegalArgumentException(s"no such column: $name")
        if (!n.nullable) throw new UnsupportedOperationException(
          s"cannot make column $name required: existing rows may hold nulls")
        // identifier fields must stay required (spec): a nullable key
        // would silently break CDC pairing and identifier-keyed MERGE
        // (NULL never equals NULL) — same guard class as DROP COLUMN
        val nullabilityIdIds = Option(currentSchema.get("identifier-field-ids"))
          .map(_.elements.asScala.map(_.asInt).toSet).getOrElse(Set.empty)
        if (nullabilityIdIds.contains(fields.get(i).get("id").asInt))
          throw new UnsupportedOperationException(
            s"cannot make column $name nullable: it is a declared " +
              "identifier field (ALTER TABLE ... SET/DROP IDENTIFIER " +
              "FIELDS first)")
        fields.get(i).asInstanceOf[ObjectNode].put("required", false)
        schemaChanged = true

      case c: TableChange.UpdateColumnComment =>
        val name = single(c.fieldNames, "ALTER COLUMN COMMENT")
        val i = fieldIdx(name)
        if (i < 0) throw new IllegalArgumentException(s"no such column: $name")
        fields.get(i).asInstanceOf[ObjectNode].put("doc", c.newComment)
        schemaChanged = true

      case p: TableChange.SetProperty =>
        // flipping the write format to avro on a table whose CURRENT
        // schema avro cannot encode is the same brick-every-write trap
        // as adding an unwritable column — refuse at the flip
        if (p.property == "write.format-default" &&
            p.value.equalsIgnoreCase("avro")) {
          val cur = org.apache.spark.sql.types.StructType(
            (0 until fields.size).map { i =>
              val f = fields.get(i)
              org.apache.spark.sql.types.StructField(
                f.get("name").asText,
                // nsAsBigint: this validation only cares about avro
                // encodability — an ns column must not make an unrelated
                // property flip die with the nanos-refusal message
                // (writes to ns tables refuse separately anyway)
                TableMetadata.toSparkType(f.get("type"), nsAsBigint = true),
                nullable = true)
            })
          AvroDataWrite.requireWritable(cur)
        }
        // same trap for ORC when the schema holds v3-only types
        // (variant/unknown) — the ORC kernel has no encoding for them
        if (p.property == "write.format-default" &&
            p.value.equalsIgnoreCase("orc") &&
            (0 until fields.size).exists(i => IcebergJson.containsV3Type(
              TableMetadata.toSparkType(fields.get(i).get("type"),
                nsAsBigint = true))))
          throw new UnsupportedOperationException(
            "cannot set write.format-default = orc: the schema holds " +
              "VARIANT/unknown columns this engine's ORC kernel cannot " +
              "encode (use parquet)")
        propSets.put(p.property, p.value)

      case p: TableChange.RemoveProperty =>
        propRemovals.add(p.property)

      case other => throw new UnsupportedOperationException(
        s"unsupported table change: $other")
    }

    // commit: the DDL as REST-spec update actions through the table's
    // committer. The new schema's id is ASSIGNED BY THE APPLIER (the
    // catalog service, or MetadataCommit.applyUpdates for the filesystem
    // committer) — a client-computed id is a guess from a racy GET, so
    // set-current-schema uses the spec's -1 (= the schema added in this
    // commit) and an assert-current-schema-id requirement pins the base
    // this edit was derived from ([[currentSchemaAndBase]]): a concurrent
    // evolution conflicts loudly instead of being silently shadowed.
    currentSchema.remove("schema-id")

    val updates = Seq.newBuilder[com.fasterxml.jackson.databind.JsonNode]
    if (schemaChanged) {
      updates += MetadataCommit.addSchema(mapper, currentSchema, lastColumnId)
      updates += MetadataCommit.setCurrentSchema(mapper, -1)
    }
    if (propSets.size > 0) {
      val n = mapper.createObjectNode()
      n.put("action", "set-properties")
      n.set[ObjectNode]("updates", propSets)
      updates += n
    }
    if (propRemovals.size > 0) {
      val n = mapper.createObjectNode()
      n.put("action", "remove-properties")
      n.set[ObjectNode]("removals", propRemovals)
      updates += n
    }
    val built = updates.result()
    val requirements =
      if (schemaChanged)
        Seq(MetadataCommit.assertCurrentSchemaId(mapper, baseSchemaId))
      else Nil
    if (built.nonEmpty) cmtr.commit(requirements, built)
  }

  /** `ALTER TABLE t SET IDENTIFIER FIELDS a, b` — declare the spec's
    * `identifier-field-ids` on the current schema (the reference's
    * `SchemaV2.identifier_field_ids`, `table.rs:371`), committed as a
    * NEW schema entry like every other evolution. Validation mirrors the
    * Iceberg spec: identifier fields must be top-level, required
    * (non-null), primitive, and not float/double (NaN breaks equality).
    * A nullable column is refused rather than silently promoted —
    * existing rows may hold nulls the metadata flip could not retract;
    * declare `NOT NULL` at CREATE TABLE. Pass `names = Nil` via
    * [[dropIdentifierFields]] to clear the declaration. */
  def setIdentifierFields(tableDir: String, conf: Configuration,
      names: Seq[String],
      committer: Option[TableCommitter] = None): Unit = {
    require(names.nonEmpty,
      "SET IDENTIFIER FIELDS needs at least one column " +
        "(DROP IDENTIFIER FIELDS clears the declaration)")
    // The spec models identifier-field-ids as a SET: `SET IDENTIFIER
    // FIELDS k, k` declares k once, not twice (duplicated ids would leak
    // into CDC pair columns and MERGE ON clauses downstream).
    val distinctNames = names.distinct
    rewriteIdentifierFields(tableDir, conf, committer) { (fields, fieldAt, _) =>
      distinctNames.map { name =>
        val i = fieldAt(name)
        if (i < 0) throw new IllegalArgumentException(
          s"SET IDENTIFIER FIELDS: no such column: $name")
        val f = fields.get(i)
        if (!f.get("required").asBoolean) throw new UnsupportedOperationException(
          s"identifier field $name must be required (NOT NULL): existing " +
            "rows may hold nulls, so the column cannot be promoted here — " +
            "declare it NOT NULL at CREATE TABLE")
        val tpe = if (f.get("type").isTextual) f.get("type").asText else "nested"
        if (tpe == "float" || tpe == "double" || tpe == "variant" ||
            tpe == "unknown" || !f.get("type").isTextual)
          throw new UnsupportedOperationException(
            s"identifier field $name has type $tpe — identifier fields " +
              "must be primitive and not float/double/variant/unknown " +
              "(Iceberg spec)")
        f.get("id").asInt
      }
    }
  }

  /** `ALTER TABLE t DROP IDENTIFIER FIELDS [a, b]` — remove the named
    * columns from the declaration, or clear it entirely when no names
    * are given. Removing a name that is not declared is refused (the
    * user is operating on a stale mental model of the key). */
  def dropIdentifierFields(tableDir: String, conf: Configuration,
      names: Seq[String] = Nil,
      committer: Option[TableCommitter] = None): Unit =
    rewriteIdentifierFields(tableDir, conf, committer) { (fields, fieldAt, cur) =>
      if (names.isEmpty) Nil
      else {
        val dropIds = names.map { name =>
          val i = fieldAt(name)
          if (i < 0) throw new IllegalArgumentException(
            s"DROP IDENTIFIER FIELDS: no such column: $name")
          val id = fields.get(i).get("id").asInt
          if (!cur.contains(id)) throw new IllegalArgumentException(
            s"DROP IDENTIFIER FIELDS: $name is not a declared identifier " +
              "field")
          id
        }.toSet
        cur.filterNot(dropIds)
      }
    }

  /** Shared SET/DROP machinery: deep-copy the current schema, let
    * `computeIds` produce the new identifier id list from (fields node,
    * name→index, current ids), commit as add-schema + set-current-schema
    * with the same base-schema assertion `alter` uses. */
  private def rewriteIdentifierFields(tableDir: String, conf: Configuration,
      committer: Option[TableCommitter])(
      computeIds: (ArrayNode, String => Int, Seq[Int]) => Seq[Int]): Unit = {
    val mapper = new ObjectMapper()
    val cmtr = committer.getOrElse(new FsCommitter(tableDir, conf))
    val root = cmtr.currentRoot(mapper)
    val (currentSchema, baseSchemaId) = currentSchemaAndBase(root)
    val fields = currentSchema.get("fields").asInstanceOf[ArrayNode]
    def fieldAt(name: String): Int =
      (0 until fields.size).find(i => fields.get(i).get("name").asText == name)
        .getOrElse(-1)
    val curIds = Option(currentSchema.get("identifier-field-ids"))
      .map(_.elements.asScala.map(_.asInt).toSeq).getOrElse(Nil)
    val ids = computeIds(fields, fieldAt, curIds)
    if (ids.isEmpty) currentSchema.remove("identifier-field-ids")
    else {
      val arr = currentSchema.putArray("identifier-field-ids")
      ids.foreach(arr.add)
    }
    currentSchema.remove("schema-id")
    val lastColumnId = Option(root.get("last-column-id")).map(_.asInt)
      .getOrElse((0 until fields.size)
        .map(i => fields.get(i).get("id").asInt).maxOption.getOrElse(0))
    cmtr.commit(
      Seq(MetadataCommit.assertCurrentSchemaId(mapper, baseSchemaId)),
      Seq(MetadataCommit.addSchema(mapper, currentSchema, lastColumnId),
        MetadataCommit.setCurrentSchema(mapper, -1)))
  }
}
