package graft.iceberg.connector

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.iceberg.{AvroDataRead, SerializableHadoopConf}

/** DSv2 `Batch` over Avro data files — what lets copy-on-write rewrites
  * (UPDATE / MERGE / range DELETE under CoW) run on avro-written tables:
  * the group scan concatenates this with the parquet/ORC batches instead
  * of refusing. One `InputPartition` per file (an Avro block stream is
  * not splittable without sync handling, and the fanout writer bounds
  * file sizes); column resolution is per file by candidate names (same
  * name-mapping discipline as [[graft.iceberg.AvroDataRead]]), values
  * decode STRAIGHT to Catalyst representations (UTF8String, epoch-day
  * ints, epoch-micros longs) — no Row intermediary.
  *
  * Row-based only (`supportColumnarReads = false`): fine alone — a
  * declared-avro table's group scan is all-Avro — but Spark's
  * `BatchScanExec` refuses mixed row/columnar partition sets, so a
  * MIXED avro+parquet rewrite still refuses upstream.
  */
object AvroGroupBatch {

  final case class AvroFileInput(path: String) extends InputPartition

  /** `fields`: the shared resolution specs ([[AvroDataRead.FieldSpec]],
    * built by `IcebergTable.avroFieldSpecs`), in required-schema order. */
  def apply(files: Seq[String],
            fields: Seq[AvroDataRead.FieldSpec],
            conf: SerializableHadoopConf): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      files.map(AvroFileInput.apply).toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new AvroReaderFactory(fields, conf)
  }

  private final class AvroReaderFactory(
      fields: Seq[AvroDataRead.FieldSpec],
      conf: SerializableHadoopConf)
      extends PartitionReaderFactory {
    override def supportColumnarReads(p: InputPartition): Boolean = false

    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val path = p.asInstanceOf[AvroFileInput].path
      val reader = new DataFileReader[GenericRecord](
        new FsInput(new Path(path), conf.value),
        new GenericDatumReader[GenericRecord]())
      // plan construction can refuse (wrong logical type) — the reader
      // is already open, so close it on the way out or the file handle
      // leaks on every task retry
      // absent field: the spec default (initial-default, carried on the
      // spec as an EXTERNAL value) converted once to its CATALYST form
      val plan: Array[(Int, AnyRef => Any, Any)] =
        try {
          val fileSchema = reader.getSchema
          fields.map { f =>
            AvroDataRead.resolveField(fileSchema, f) match {
              case None => (-1, null,
                org.apache.spark.sql.catalyst.CatalystTypeConverters
                  .createToCatalystConverter(f.dataType)(f.default))
              case Some(af) =>
                (af.pos, catalystConverter(af.schema, f.dataType, f.name, path),
                  null)
            }
          }.toArray
        } catch { case t: Throwable =>
          try reader.close() catch { case _: Exception => () }
          throw t
        }
      new PartitionReader[InternalRow] {
        private var row: InternalRow = _
        override def next(): Boolean =
          if (!reader.hasNext) false
          else {
            val rec = reader.next()
            val vals = new Array[Any](plan.length)
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
            row = new GenericInternalRow(vals)
            true
          }
        override def get(): InternalRow = row
        override def close(): Unit = reader.close()
      }
    }
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      import scala.jdk.CollectionConverters._
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    }

  /** Avro datum → CATALYST value (the [[graft.iceberg.AvroDataRead]]
    * converter's internal-row twin): dates stay epoch-day ints,
    * timestamps become epoch-micros longs, strings become UTF8String. */
  private def catalystConverter(fieldSchema: Schema, dt: DataType,
                                field: String, path: String): AnyRef => Any = {
    val s = unwrap(fieldSchema)
    val logical = Option(s.getLogicalType)
    def refuse(why: String): Nothing = throw new UnsupportedOperationException(
      s"avro group scan: field '$field' of $path $why")
    dt match {
      case LongType => v => v.asInstanceOf[java.lang.Number].longValue
      case IntegerType => v => v.asInstanceOf[java.lang.Number].intValue
      case DoubleType => v => v.asInstanceOf[java.lang.Number].doubleValue
      case FloatType => v => v.asInstanceOf[java.lang.Number].floatValue
      case BooleanType => v => v.asInstanceOf[java.lang.Boolean].booleanValue
      case StringType => v => UTF8String.fromString(v.toString)
      case DateType => logical match {
        case Some(_: LogicalTypes.Date) =>
          v => v.asInstanceOf[java.lang.Number].intValue // epoch days
        case other => refuse(s"has avro type $s (logical: $other), not a " +
          "`date` logical int")
      }
      case TimestampType => logical match {
        case Some(_: LogicalTypes.TimestampMicros) =>
          v => v.asInstanceOf[java.lang.Number].longValue
        case Some(_: LogicalTypes.TimestampMillis) =>
          v => Math.multiplyExact(
            v.asInstanceOf[java.lang.Number].longValue, 1000L)
        case other => refuse(s"has avro type $s (logical: $other), not a " +
          "timestamp-micros/millis logical long")
      }
      case t => refuse(s"has Spark type ${t.simpleString}, which this " +
        "reader does not decode")
    }
  }
}
