package org.apache.spark.sql.execution.datasources.orc

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.orc.{CompressionKind, OrcFile}
import org.apache.orc.mapred.OrcStruct
import org.apache.orc.mapreduce.OrcMapreduceRecordWriter
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Executor-side ORC writer for `InternalRow`s — the ORC counterpart of
  * [[org.apache.spark.sql.execution.datasources.parquet.GraftParquetWriteShim]],
  * built on Spark's own `private[sql]` [[OrcSerializer]] (InternalRow →
  * `OrcStruct` Writable) and [[OrcUtils.orcTypeDescription]] (Catalyst →
  * ORC type tree), so files written here are byte-compatible with what
  * `df.write.orc` produces: same type mapping, same timestamp semantics,
  * same footer statistics orc-core records for every writer.
  *
  * Rows funnel through `OrcMapreduceRecordWriter`, which batches
  * Writables into `VectorizedRowBatch`es internally — the task-side loop
  * stays a plain row push while orc-core still writes columnar stripes.
  *
  * Lives in the `orc` package for access to the `private[sql]` serializer.
  */
object GraftOrcWriteShim {

  /** Iceberg `write.orc.compression-codec` values → ORC codec. Unknown
    * names fail loudly at plan time — a typo silently falling back to a
    * default would misreport what 100 TB was written as. */
  def codecKind(codec: String): CompressionKind = codec.toLowerCase match {
    case "zlib" => CompressionKind.ZLIB
    case "snappy" => CompressionKind.SNAPPY
    case "zstd" => CompressionKind.ZSTD
    case "lz4" => CompressionKind.LZ4
    case "uncompressed" | "none" => CompressionKind.NONE
    case other => throw new IllegalArgumentException(
      s"unsupported write.orc.compression-codec '$other' " +
        "(supported: zlib, snappy, zstd, lz4, uncompressed)")
  }

  /** One open ORC data file. The caller owns close(). */
  final class OrcRowFileWriter(path: String, schema: StructType,
                               base: Configuration, codec: String) {
    private val serializer = new OrcSerializer(schema)
    private val writer = OrcFile.createWriter(new Path(path),
      OrcFile.writerOptions(base)
        .setSchema(OrcUtils.orcTypeDescription(schema))
        .compress(codecKind(codec))
        .overwrite(true))
    private val rw = new OrcMapreduceRecordWriter[OrcStruct](writer)

    def write(row: InternalRow): Unit =
      rw.write(NullWritable.get, serializer.serialize(row))

    /** Uncompressed size of the data flushed so far — updated per memory
      * check/stripe flush, the same granularity the fanout writer's
      * size-based rollover needs (it compares against a ≥64 KiB target,
      * far above one stripe). */
    def dataSize: Long = writer.getRawDataSize

    def close(): Unit = rw.close(null)
  }
}
