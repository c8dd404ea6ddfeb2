package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.iceberg.IcebergTable
import graft.iceberg.connector.GraftCatalog

/** `write.parquet.compression-codec` honored on every data-file write
  * path (INSERT, CTAS, merge-on-read delta inserts), validated loudly on
  * typos, with read-back byte equality. */
class CompressionSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/codec-warehouse"
  private def conf = spark.sessionState.newHadoopConf()

  private def fresh(cat: String): String = {
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    s"$warehouse/ns"
  }

  import scala.jdk.CollectionConverters._

  private def codecsOf(tableDir: String): Set[String] = {
    new IcebergTable(tableDir, conf).planFiles().flatMap { f =>
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.filePath), conf))
      try rd.getFooter.getBlocks.asScala.toSeq
        .flatMap(_.getColumns.asScala.toSeq.map(_.getCodec.name))
      finally rd.close()
    }.toSet
  }

  test("zstd table property reaches every data file; default stays snappy") {
    val ns = fresh("codc")
    spark.sql("CREATE TABLE codc.ns.z (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.parquet.compression-codec' = 'zstd')")
    spark.sql("INSERT INTO codc.ns.z SELECT id, CAST(id AS STRING) FROM range(1000)")
    assert(codecsOf(s"$ns/z") == Set("ZSTD"), codecsOf(s"$ns/z"))
    assert(spark.sql("SELECT COUNT(*), SUM(k) FROM codc.ns.z")
      .head.toSeq == Seq(1000L, 499500L))

    spark.sql("CREATE TABLE codc.ns.s (k BIGINT)")
    spark.sql("INSERT INTO codc.ns.s VALUES (1)")
    assert(codecsOf(s"$ns/s") == Set("SNAPPY"), codecsOf(s"$ns/s"))
  }

  test("merge-on-read UPDATE's insert files carry the table codec") {
    val ns = fresh("codc2")
    spark.sql("CREATE TABLE codc2.ns.m (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.parquet.compression-codec' = 'zstd', " +
      "'write.update.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO codc2.ns.m SELECT id, 'a' FROM range(100)")
    spark.sql("UPDATE codc2.ns.m SET v = 'b' WHERE k < 10")
    assert(codecsOf(s"$ns/m") == Set("ZSTD"), codecsOf(s"$ns/m"))
    assert(spark.sql("SELECT COUNT(*) FROM codc2.ns.m WHERE v = 'b'")
      .head.getLong(0) == 10L)
    // the POSITION-DELETE file follows the delete-codec fallback chain
    // (write.delete.parquet.compression-codec -> data codec): zstd too
    val fs = new Path(s"$ns/m/data").getFileSystem(conf)
    val it = fs.listFiles(new Path(s"$ns/m/data"), true)
    val delFiles = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next().getPath)
      .filter(_.getName.startsWith("del-")).toSeq
    assert(delFiles.nonEmpty, "expected a position-delete file")
    val delCodecs = delFiles.flatMap { p =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try rd.getFooter.getBlocks.asScala.toSeq
        .flatMap(_.getColumns.asScala.toSeq.map(_.getCodec.name))
      finally rd.close()
    }.toSet
    assert(delCodecs == Set("ZSTD"), delCodecs)
  }

  test("write.target-file-size-bytes rolls data files at the target") {
    val ns = fresh("codc4")
    spark.sql("CREATE TABLE codc4.ns.r (k BIGINT, pad STRING) " +
      "TBLPROPERTIES ('write.target-file-size-bytes' = '65536')")
    // one writer task (coalesce through a 1-partition source) with far
    // more than 64 KiB of incompressible-ish data: must roll > 1 file
    spark.sql("INSERT INTO codc4.ns.r " +
      "SELECT id, repeat(uuid(), 4) FROM range(0, 20000, 1, 1)")
    val files = new IcebergTable(s"$ns/r", conf).planFiles()
    assert(files.size > 1, s"expected rolled files, got ${files.size}")
    assert(files.forall(_.fileSizeInBytes < (4L << 20)),
      s"rolled files stay near the target: ${files.map(_.fileSizeInBytes)}")
    assert(spark.sql("SELECT COUNT(*), SUM(k) FROM codc4.ns.r")
      .head.toSeq == Seq(20000L, 199990000L))
    // default table: the same single-task insert stays one file
    spark.sql("CREATE TABLE codc4.ns.one (k BIGINT, pad STRING)")
    spark.sql("INSERT INTO codc4.ns.one " +
      "SELECT id, repeat(uuid(), 4) FROM range(0, 20000, 1, 1)")
    assert(new IcebergTable(s"$ns/one", conf).planFiles().size == 1)
  }

  test("a codec typo fails the statement loudly, not a task") {
    val ns = fresh("codc3")
    spark.sql("CREATE TABLE codc3.ns.t (k BIGINT) " +
      "TBLPROPERTIES ('write.parquet.compression-codec' = 'sznappy')")
    val e = intercept[Exception](
      spark.sql("INSERT INTO codc3.ns.t VALUES (1)"))
    assert(e.getMessage != null || e.getCause != null)
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("sznappy"), s"error must name the bad codec: $e")
  }
}
