package org.apache.spark.sql.execution.datasources.parquet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Executor-side parquet writer for `InternalRow`s, built on Spark's own
  * [[ParquetWriteSupport]] (the write counterpart of the read shim in
  * `GraftScanShims`): files written here are byte-compatible with what
  * `df.write.parquet` produces — same physical types, same field-id
  * stamping (`parquet.field.id` metadata on the schema), same dictionary/
  * page encodings — so the Iceberg read path (field-id column resolution,
  * footer stats) treats them identically to driver-initiated writes.
  *
  * Needed because DSv2 `ReplaceData` (copy-on-write UPDATE / MERGE /
  * DELETE) hands rows to a [[org.apache.spark.sql.connector.write.DataWriter]]
  * on executors — there is no DataFrame to `.write` from, so the V1
  * `InsertableRelation` bridge the INSERT path uses cannot serve it.
  *
  * Lives in the `parquet` package for access to the `private[parquet]`
  * write support.
  */
object GraftParquetWriteShim {

  /** Rebase behavior is pinned to CORRECTED (write proleptic Gregorian as
    * is): these files are read back exclusively through Spark ≥ 3 readers,
    * and EXCEPTION (the session default) would fail on pre-1582 dates that
    * a rewrite must round-trip untouched. */
  private def writeConf(base: Configuration, schema: StructType): Configuration = {
    val conf = new Configuration(base)
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      SQLConf.ParquetOutputTimestampType.TIMESTAMP_MICROS.toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf
  }

  private final class Builder(path: Path, nanos: Map[String, Boolean])
      extends ParquetWriter.Builder[InternalRow, Builder](path) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      if (nanos.isEmpty) new ParquetWriteSupport
      else new NanosAnnotatingWriteSupport(nanos)
  }

  /** [[ParquetWriteSupport]] whose declared file schema re-types the named
    * int64 columns as `TIMESTAMP(NANOS, isAdjustedToUTC)` — the Iceberg
    * v3 parquet encoding of `timestamp_ns`/`timestamptz_ns`. The engine's
    * Spark-side representation of those columns under the BIGINT-nanos
    * opt-in is LongType (exact epoch nanos), so the physical write path
    * (addLong, page encodings, field ids) is bit-identical to a plain
    * int64 column; only the footer's logical-type annotation changes —
    * which is precisely what keeps the column MEANING a nanosecond
    * timestamp for other readers instead of silently degrading to a bare
    * long (the r17 write-refusal rationale, now written conformantly).
    */
  private final class NanosAnnotatingWriteSupport(nanos: Map[String, Boolean])
      extends ParquetWriteSupport {
    override def init(configuration: Configuration): WriteSupport.WriteContext = {
      val ctx = super.init(configuration)
      import org.apache.parquet.schema._
      import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
      import scala.jdk.CollectionConverters._
      val fields = ctx.getSchema.getFields.asScala.map {
        case p: PrimitiveType if nanos.contains(p.getName) &&
            p.getPrimitiveTypeName ==
              PrimitiveType.PrimitiveTypeName.INT64 =>
          val b = Types.primitive(
              PrimitiveType.PrimitiveTypeName.INT64, p.getRepetition)
            .as(LogicalTypeAnnotation.timestampType(
              nanos(p.getName), TimeUnit.NANOS))
          (if (p.getId != null) b.id(p.getId.intValue) else b)
            .named(p.getName)
        case other => other
      }
      new WriteSupport.WriteContext(
        new MessageType(ctx.getSchema.getName, fields.asJava),
        ctx.getExtraMetaData)
    }
  }

  /** Iceberg `write.parquet.compression-codec` values → parquet codec.
    * Unknown names fail loudly at write time — a typo silently falling
    * back to a default would misreport what 100 TB was written as. */
  def codecName(codec: String): CompressionCodecName = codec.toLowerCase match {
    case "snappy" => CompressionCodecName.SNAPPY
    case "zstd" => CompressionCodecName.ZSTD
    case "gzip" => CompressionCodecName.GZIP
    case "uncompressed" | "none" => CompressionCodecName.UNCOMPRESSED
    case other => throw new IllegalArgumentException(
      s"unsupported write.parquet.compression-codec '$other' " +
        "(supported: snappy, zstd, gzip, uncompressed)")
  }

  /** Open a parquet writer at `path`. The caller owns close().
    * `nanos` names the LongType columns to annotate as
    * `TIMESTAMP(NANOS, isAdjustedToUTC)` (Iceberg `timestamp_ns`
    * columns under the BIGINT-nanos opt-in). */
  def open(path: String, schema: StructType,
           base: Configuration,
           codec: String = "snappy",
           nanos: Map[String, Boolean] = Map.empty): ParquetWriter[InternalRow] =
    new Builder(new Path(path), nanos)
      .withConf(writeConf(base, schema))
      .withCompressionCodec(codecName(codec))
      .build()
}
