package graft.iceberg

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Row-based reader for AVRO data files — the third data format the
  * Iceberg spec allows (parquet is native, ORC rides Spark's vectorized
  * source, Avro has no Spark source in this runtime, so records decode
  * through avro-core in executors).
  *
  * Two properties shape the design:
  *  - Avro files carry NO column statistics, so imported files are never
  *    pruned (doubt-keeps — sound, just unskippable); row counts are
  *    exact (block headers summed at import, no datum decode).
  *  - Decode order IS the spec's row position (record index within the
  *    file), so unlike ORC this path serves TRUE per-row (file, pos)
  *    identities — merge-on-read delete application (v2 position files,
  *    v3 DVs, equality deletes) works on foreign Avro files.
  *
  * Column resolution happens PER FILE in the executor: each target field
  * carries its candidate source names (current name first, then the
  * table's name-mapping aliases), and the first candidate present in
  * THAT file's writer schema wins — a group mixing files written before
  * and after a rename reads both correctly. Field positions and
  * logical-type conversions are resolved once per file, not per row.
  *
  * Supported: LONG, INT, STRING, DOUBLE, FLOAT, BOOLEAN, DATE (avro
  * `date` logical int), TIMESTAMP (avro `timestamp-micros` or
  * `timestamp-millis` logical long — the unit comes from the file's own
  * logical type, never assumed). Anything else refuses loudly.
  */
object AvroDataRead {

  /** One target column: output name, candidate source names in priority
    * order, the Spark type to decode into, the Iceberg field id (when
    * known), and whether the NAME's id binding shifted across schema
    * history (rename landing on a reused name, drop + re-add). */
  final case class FieldSpec(name: String, sources: Seq[String],
                             dataType: DataType,
                             fieldId: Option[Int] = None,
                             nameIdShifted: Boolean = false,
                             /** v3 `initial-default` as the EXTERNAL
                               * (Row) value: served when per-file
                               * resolution finds the field ABSENT (the
                               * spec's read rule) — a present field's
                               * real null stays null. */
                             default: Any = null)

  /** Resolve one target field against a FILE's schema — the single
    * resolution rule both avro readers (the DataFrame scan and the DSv2
    * group batch) share:
    *
    *  1. a file field whose `field-id` attribute equals the target's id
    *     wins outright (files this engine writes carry the attribute —
    *     spec-required — so renames and re-adds resolve like parquet);
    *  2. a file that CARRIES field ids but has none matching reads the
    *     column as absent (NULL) — never by name: on an id-bearing file
    *     a bare name match would resurrect a renamed-away column's data
    *     under a re-added name;
    *  3. an id-LESS file (foreign import) resolves by candidate names —
    *     but the bare CURRENT name is excluded when its id binding
    *     shifted in schema history (`nameIdShifted`): the import's
    *     same-named column belongs to the OLD field; only explicit
    *     name-mapping aliases may match then.
    */
  def resolveField(fileSchema: Schema, spec: FieldSpec): Option[Schema.Field] = {
    import scala.jdk.CollectionConverters._
    val fileFields = fileSchema.getFields.asScala
    def idOf(f: Schema.Field): Option[Int] =
      Option(f.getObjectProp("field-id")).map(_.toString.toInt)
    val fileHasIds = fileFields.exists(f => idOf(f).nonEmpty)
    spec.fieldId match {
      case Some(id) if fileHasIds => // rules 1 + 2: id-resolved or absent
        fileFields.find(f => idOf(f).contains(id))
      case _ => // rule 3: id-less file (or caller without ids)
        val candidates =
          if (spec.nameIdShifted) spec.sources.filterNot(_ == spec.name)
          else spec.sources
        candidates.flatMap(s => Option(fileSchema.getField(s))).headOption
    }
  }

  /** Distributed decode of `paths` into `fields` (+ optional (file, pos)
    * identity columns). One task per file — an Avro block stream is not
    * splittable without sync handling, and import files are bounded by
    * the writer that made them; compact to parquet for native splittable
    * scans. */
  def rows(spark: SparkSession, paths: Seq[String], fields: Seq[FieldSpec],
           ids: Option[(String, String)],
           /** catalog-vended per-table Hadoop overrides (storage
             * credentials); the session conf stays untouched */
           confOverrides: Map[String, String] = Map.empty): DataFrame = {
    val schema = StructType(
      fields.map(f => StructField(f.name, f.dataType, nullable = true)) ++
        (ids match {
          case None => Nil
          case Some((fp, pos)) => Seq(
            StructField(fp, StringType, nullable = false),
            StructField(pos, LongType, nullable = false))
        }))
    val withIds = ids.nonEmpty
    val confSer = {
      val hc = spark.sessionState.newHadoopConf()
      confOverrides.foreach { case (k, v) => hc.set(k, v) }
      new SerializableHadoopConf(hc)
    }
    val rdd = spark.sparkContext
      .parallelize(paths, math.max(1, math.min(paths.size, 256)))
      .flatMap { p =>
        val reader = new DataFileReader[GenericRecord](
          new FsInput(new Path(p), confSer.value),
          new GenericDatumReader[GenericRecord]())
        // close even on early termination (LIMIT) or decode error — the
        // iterator's own exhaustion close never runs then
        Option(org.apache.spark.TaskContext.get).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try reader.close() catch { case _: Exception => () }))
        // per-FILE resolution: position + converter for each target
        // (field-id first, then guarded name candidates — resolveField)
        val fileSchema = reader.getSchema
        // absent field: -1 position, the row serves the spec default
        // (initial-default for pre-column files; null otherwise)
        val plan: Array[(Int, AnyRef => Any, Any)] =
          fields.map { f =>
            resolveField(fileSchema, f) match {
              case None => (-1, null, f.default)
              case Some(af) =>
                (af.pos, converter(af.schema, f.dataType, f.name, p), null)
            }
          }.toArray
        var idx = -1L
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          override def next(): Row = {
            val rec = reader.next()
            idx += 1
            val vals = new Array[Any](plan.length + (if (withIds) 2 else 0))
            var i = 0
            while (i < plan.length) {
              val (pos, conv, dflt) = plan(i)
              vals(i) =
                if (pos < 0) dflt
                else {
                  val v = rec.get(pos)
                  if (v == null) null else conv(v)
                }
              i += 1
            }
            if (withIds) { vals(plan.length) = p; vals(plan.length + 1) = idx }
            Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Non-null union branch of a (possibly nullable) Avro schema. */
  private def unwrap(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      import scala.jdk.CollectionConverters._
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    }

  /** Per-field conversion resolved ONCE per file from the field's own
    * Avro schema (incl. logical types — a timestamp's unit is read from
    * the file, never assumed). */
  private def converter(fieldSchema: Schema, dt: DataType, field: String,
                        path: String): AnyRef => Any = {
    val s = unwrap(fieldSchema)
    val logical = Option(s.getLogicalType)
    def refuse(why: String): Nothing = throw new UnsupportedOperationException(
      s"avro data read: field '$field' of $path $why")
    dt match {
      case LongType => v => v.asInstanceOf[java.lang.Number].longValue
      case IntegerType => v => v.asInstanceOf[java.lang.Number].intValue
      case DoubleType => v => v.asInstanceOf[java.lang.Number].doubleValue
      case FloatType => v => v.asInstanceOf[java.lang.Number].floatValue
      case BooleanType => v => v.asInstanceOf[java.lang.Boolean].booleanValue
      case StringType => v => v.toString
      case DateType => logical match {
        case Some(_: LogicalTypes.Date) => v =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
            v.asInstanceOf[java.lang.Number].longValue))
        case other => refuse(s"has avro type $s (logical: $other), not a " +
          "`date` logical int — cannot decode as DATE")
      }
      case TimestampType =>
        def fromMicros(us: Long): java.sql.Timestamp = {
          val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
          ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          ts
        }
        logical match {
          case Some(_: LogicalTypes.TimestampMicros) => v =>
            fromMicros(v.asInstanceOf[java.lang.Number].longValue)
          case Some(_: LogicalTypes.TimestampMillis) => v =>
            fromMicros(Math.multiplyExact(
              v.asInstanceOf[java.lang.Number].longValue, 1000L))
          case other => refuse(s"has avro type $s (logical: $other), not a " +
            "timestamp-micros/millis logical long — cannot decode as " +
            "TIMESTAMP (a plain long's unit would be a guess)")
        }
      case t => refuse(s"has Spark type ${t.simpleString}, which this " +
        "reader does not decode")
    }
  }

  /** Driver-side import probe: exact record count from BLOCK HEADERS
    * (no datum decode — O(blocks), not O(values)) and the record
    * schema's field names. */
  def probe(p: Path, conf: Configuration): (Long, Set[String]) = {
    val reader = new DataFileReader[GenericRecord](
      new FsInput(p, conf), new GenericDatumReader[GenericRecord]())
    try {
      import scala.jdk.CollectionConverters._
      val names = reader.getSchema.getFields.asScala.map(_.name).toSet
      var n = 0L
      while (reader.hasNext) {
        n += reader.getBlockCount
        reader.nextBlock()
      }
      (n, names)
    } finally reader.close()
  }

  /** Header-only field-name read (no record decode). */
  def fieldNames(p: Path, conf: Configuration): Set[String] = {
    val reader = new DataFileReader[GenericRecord](
      new FsInput(p, conf), new GenericDatumReader[GenericRecord]())
    try {
      import scala.jdk.CollectionConverters._
      reader.getSchema.getFields.asScala.map(_.name).toSet
    } finally reader.close()
  }

  /** Header-only probe: does ANY record field carry an Iceberg
    * `field-id` property? (id-bearing imports resolve by id; id-less
    * ones fall back to guarded name resolution). */
  def hasFieldIds(p: Path, conf: Configuration): Boolean = {
    val reader = new DataFileReader[GenericRecord](
      new FsInput(p, conf), new GenericDatumReader[GenericRecord]())
    try {
      import scala.jdk.CollectionConverters._
      reader.getSchema.getFields.asScala
        .exists(f => f.getObjectProp("field-id") != null)
    } finally reader.close()
  }
}
