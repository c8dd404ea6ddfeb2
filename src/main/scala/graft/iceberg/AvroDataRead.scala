package graft.iceberg

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
  *    exact (one decode pass at import).
  *  - Decode order IS the spec's row position (record index within the
  *    file), so unlike ORC this path serves TRUE per-row (file, pos)
  *    identities — merge-on-read delete application (v2 position files,
  *    v3 DVs, equality deletes) works on foreign Avro files.
  *
  * Supported Spark types: LONG, INT, STRING, DOUBLE, FLOAT, BOOLEAN,
  * DATE (avro int epoch-day), TIMESTAMP (avro long micros). Anything
  * else refuses loudly at read time. Fields resolve by NAME against the
  * record (nullable unions unwrap transparently); a field the record
  * lacks reads NULL.
  */
object AvroDataRead {

  /** Distributed decode of `paths` under `readSchema` (+ optional
    * (file, pos) identity columns named by `fpCol`/`posCol`). One task
    * per file — an Avro block stream is not splittable without sync
    * handling, and import files are bounded by the writer that made
    * them; compact to parquet for native splittable scans. */
  def rows(spark: SparkSession, paths: Seq[String], readSchema: StructType,
           ids: Option[(String, String)]): DataFrame = {
    val schema = ids match {
      case None => readSchema
      case Some((fp, pos)) => StructType(readSchema.fields ++ Seq(
        StructField(fp, StringType, nullable = false),
        StructField(pos, LongType, nullable = false)))
    }
    val fields = readSchema.fields.map(f => (f.name, f.dataType))
    val confSer = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val rdd = spark.sparkContext
      .parallelize(paths, math.max(1, math.min(paths.size, 256)))
      .flatMap { p =>
        val reader = new DataFileReader[GenericRecord](
          new FsInput(new Path(p), confSer.value),
          new GenericDatumReader[GenericRecord]())
        var idx = -1L
        val it = new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          override def next(): Row = {
            val rec = reader.next()
            idx += 1
            val vals = fields.map { case (n, dt) =>
              convert(Option(rec.getSchema.getField(n))
                .map(f => rec.get(f.pos)).orNull, dt, n, p)
            }
            Row.fromSeq(ids match {
              case None => vals.toSeq
              case Some(_) => vals.toSeq ++ Seq(p, idx)
            })
          }
        }
        it
      }
    spark.createDataFrame(rdd, schema)
  }

  private def convert(v: AnyRef, dt: DataType, field: String,
                      path: String): Any = {
    if (v == null) return null
    (v, dt) match {
      case (n: java.lang.Number, LongType) => n.longValue
      case (n: java.lang.Number, IntegerType) => n.intValue
      case (n: java.lang.Number, DoubleType) => n.doubleValue
      case (n: java.lang.Number, FloatType) => n.floatValue
      case (b: java.lang.Boolean, BooleanType) => b.booleanValue
      case (s, StringType) => s.toString
      case (n: java.lang.Number, DateType) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(n.longValue))
      case (n: java.lang.Number, TimestampType) =>
        val us = n.longValue
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case (other, t) => throw new UnsupportedOperationException(
        s"avro data read: field '$field' of $path holds " +
          s"${other.getClass.getName}, not decodable as ${t.simpleString}")
    }
  }

  /** Driver-side import probe: the record count (one decode pass — Avro
    * has no footer row count) and the record schema's field names (from
    * the HEADER, cheap). */
  def probe(p: Path, conf: Configuration): (Long, Set[String]) = {
    val reader = new DataFileReader[GenericRecord](
      new FsInput(p, conf), new GenericDatumReader[GenericRecord]())
    try {
      import scala.jdk.CollectionConverters._
      val names = reader.getSchema.getFields.asScala.map(_.name).toSet
      var n = 0L
      while (reader.hasNext) { reader.next(); n += 1 }
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
}
