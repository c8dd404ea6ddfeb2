package graft.iceberg

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Executor-side AVRO data-file writer for `InternalRow`s — the third
  * write format behind the fanout kernel (`write.format-default = avro`),
  * closing the spec's format matrix on the WRITE side too.
  *
  * Properties that shape it:
  *  - the supported type set mirrors [[AvroDataRead]] EXACTLY (long,
  *    int, string, double, float, boolean, date, timestamp[-micros]):
  *    anything this writer emits, this engine's own scan decodes — a
  *    column outside the set refuses at PLAN time, not after data lands;
  *  - Avro files carry no column statistics, so written files record
  *    none (doubt-keeps: never pruned, always sound) — the trade a shop
  *    choosing avro accepts; row counts are exact;
  *  - decode order IS the spec's row position, so avro-written files
  *    keep the FULL merge-on-read surface (position deletes, DVs), same
  *    as avro imports;
  *  - `dataSize` for the size-based rollover counts BYTES WRITTEN to the
  *    stream (post-compression, flushed blocks) — the same "flushed
  *    estimate" granularity the ORC writer reports.
  */
object AvroDataWrite {

  /** Iceberg `write.avro.compression-codec` values → avro codec (spec
    * default gzip = avro deflate). Unknown names fail loudly. */
  def codecFactory(codec: String): CodecFactory = codec.toLowerCase match {
    case "gzip" | "deflate" => CodecFactory.deflateCodec(6)
    case "snappy" => CodecFactory.snappyCodec()
    case "zstd" => CodecFactory.zstandardCodec(3)
    case "uncompressed" | "none" => CodecFactory.nullCodec()
    case other => throw new IllegalArgumentException(
      s"unsupported write.avro.compression-codec '$other' " +
        "(supported: gzip, snappy, zstd, uncompressed)")
  }

  /** True iff the type is in the avro-writable (= avro-readable) set. */
  def writableType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | StringType | DoubleType | FloatType |
         BooleanType | DateType | TimestampType => true
    case _ => false
  }

  /** Avro-legal field name check (Avro rejects hyphens, leading digits
    * and other characters parquet/ORC accept) — the schema-evolution
    * guard for avro tables: a column that can't NAME won't write. */
  def requireValidName(name: String, context: String): Unit =
    try { Schema.createRecord("probe", null, "graft", false,
      java.util.List.of(new Schema.Field(name,
        Schema.create(Schema.Type.LONG), null, null.asInstanceOf[AnyRef]))); () }
    catch { case e: org.apache.avro.SchemaParseException =>
      throw new UnsupportedOperationException(
        s"$context: '$name' is not a legal Avro field name " +
          s"(${e.getMessage}) and this table's write.format-default is " +
          "avro — every later write would fail", e)
    }

  /** Refuse-at-plan-time check: every column must be writable AND
    * readable back by [[AvroDataRead]], and the whole record schema must
    * CONSTRUCT (Avro rejects names parquet/ORC accept — hyphens, leading
    * digits — and that must fail the statement, not a mid-job task). */
  def requireWritable(schema: StructType): Unit = {
    schema.fields.foreach { f =>
      if (!writableType(f.dataType))
        throw new UnsupportedOperationException(
          s"write.format-default = avro cannot write column '${f.name}' " +
            s"of type ${f.dataType.simpleString} (supported: bigint, int, " +
            "string, double, float, boolean, date, timestamp — the set " +
            "this engine's avro scan decodes back)")
    }
    try avroSchema(schema)
    catch { case e: org.apache.avro.SchemaParseException =>
      throw new UnsupportedOperationException(
        "write.format-default = avro rejects this schema: " + e.getMessage +
          " (Avro field names are stricter than parquet/ORC — rename the " +
          "column or choose another format)", e)
    }
    ()
  }

  private def avroSchema(schema: StructType): Schema = {
    val fields = new java.util.ArrayList[Schema.Field](schema.length)
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case StringType => Schema.create(Schema.Type.STRING)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType =>
          LogicalTypes.timestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        case other => throw new IllegalStateException(
          s"unreachable: requireWritable admits no ${other.simpleString}")
      }
      // every field nullable (union with null, null default) — matches
      // how the fanout writer's parquet/ORC schemas treat nullability
      val fld = new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), base), null,
        Schema.Field.NULL_DEFAULT_VALUE)
      // the Iceberg spec REQUIRES Avro data-file fields to carry their
      // `field-id` attribute — that is what lets an external id-resolving
      // reader (java Iceberg et al.) survive renames on files this
      // engine wrote. The stamped write schema carries the ids as
      // `parquet.field.id` metadata (the fanout writer stamps every
      // format's schema the same way).
      if (f.metadata.contains("parquet.field.id"))
        fld.addProp("field-id", f.metadata.getLong("parquet.field.id"))
      fields.add(fld)
    }
    Schema.createRecord("r", null, "graft", false, fields)
  }

  /** One open Avro data file. The caller owns close(). */
  final class AvroRowFileWriter(path: String, schema: StructType,
                                conf: Configuration, codec: String) {
    private val avSchema = avroSchema(schema)
    private var written = 0L
    private val raw = new Path(path).getFileSystem(conf)
      .create(new Path(path), false)
    private val counting = new java.io.FilterOutputStream(raw) {
      override def write(b: Int): Unit = { raw.write(b); written += 1 }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        raw.write(b, off, len); written += len
      }
    }
    private val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avSchema))
      .setCodec(codecFactory(codec))
      .create(avSchema, counting)

    /** Per-field extractor resolved once: InternalRow slot → avro value. */
    private val extractors: Array[InternalRow => AnyRef] =
      schema.fields.zipWithIndex.map { case (f, i) =>
        f.dataType match {
          case LongType => (r: InternalRow) => java.lang.Long.valueOf(r.getLong(i))
          case IntegerType => (r: InternalRow) => java.lang.Integer.valueOf(r.getInt(i))
          case StringType => (r: InternalRow) => r.getUTF8String(i).toString
          case DoubleType => (r: InternalRow) => java.lang.Double.valueOf(r.getDouble(i))
          case FloatType => (r: InternalRow) => java.lang.Float.valueOf(r.getFloat(i))
          case BooleanType => (r: InternalRow) => java.lang.Boolean.valueOf(r.getBoolean(i))
          case DateType => // Catalyst days-since-epoch int = avro date int
            (r: InternalRow) => java.lang.Integer.valueOf(r.getInt(i))
          case TimestampType => // Catalyst epoch-micros = timestamp-micros
            (r: InternalRow) => java.lang.Long.valueOf(r.getLong(i))
          case other => throw new IllegalStateException(
            s"unreachable extractor for ${other.simpleString}")
        }
      }

    def write(row: InternalRow): Unit = {
      val rec = new GenericData.Record(avSchema)
      var i = 0
      while (i < extractors.length) {
        rec.put(i, if (row.isNullAt(i)) null else extractors(i)(row))
        i += 1
      }
      w.append(rec)
      ()
    }

    def dataSize: Long = written

    def close(): Unit = w.close() // closes the chained streams
  }
}
