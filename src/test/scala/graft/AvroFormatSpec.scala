package graft

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.iceberg.{IcebergTable, IcebergWriter}
import graft.iceberg.connector.GraftCatalog

/** Avro data files as read-path citizens. Unlike ORC, Avro decode order
  * IS the spec's row position (record index), so Avro imports get the
  * FULL merge-on-read surface: position-delete DELETEs target them,
  * and existing delete files (position, equality, DVs) apply on read.
  * No column statistics exist in Avro, so imported files are never
  * pruned (doubt-keeps) but row counts are exact.
  */
class AvroFormatSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/avro-warehouse"

  private def conf = spark.sessionState.newHadoopConf()

  private def freshCatalog(): Unit = {
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set("spark.sql.catalog.avcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.avcat.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS avcat.ns")
  }

  /** Write one Avro file of (k BIGINT, v STRING nullable) rows. */
  private def avroFile(name: String, lo: Long, hi: Long): String = {
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"k","type":"long"},
        |{"name":"v","type":["null","string"],"default":null}]}"""
        .stripMargin)
    val dir = new java.io.File(s"/root/repo/target/avro-src")
    dir.mkdirs()
    val f = new java.io.File(dir, s"$name.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    (lo until hi).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("k", i)
      r.put("v", if (i % 11 == 0) null else s"v$i")
      w.append(r)
    }
    w.close()
    f.getAbsolutePath
  }

  test("add_files imports Avro; scan, nulls, and exact row counts") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS avcat.ns.a1")
    spark.sql("CREATE TABLE avcat.ns.a1 (k BIGINT, v STRING)")
    val f1 = avroFile("a1-lo", 0, 60)
    val f2 = avroFile("a1-hi", 60, 100)
    val dir = s"$warehouse/ns/a1"
    IcebergWriter.addFiles(spark, dir, Seq(f1, f2))
    val t = new IcebergTable(dir, conf)
    assert(t.planFiles().map(f => (f.fileFormat, f.recordCount)).sortBy(_._2)
      == Seq(("AVRO", 40L), ("AVRO", 60L)))
    val r = spark.sql(
      """SELECT COUNT(*) AS n, SUM(k) AS s,
        |       COUNT(CASE WHEN v IS NULL THEN 1 END) AS nulls
        |FROM avcat.ns.a1""".stripMargin).collect()(0)
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) == (0L until 100L).sum)
    assert(r.getLong(2) == (0L until 100L).count(_ % 11 == 0))
    assert(spark.sql("SELECT v FROM avcat.ns.a1 WHERE k = 42")
      .collect()(0).getString(0) == "v42")
  }

  test("merge-on-read position DELETE works on Avro imports") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS avcat.ns.a2")
    spark.sql(
      """CREATE TABLE avcat.ns.a2 (k BIGINT, v STRING)
        |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    val dir = s"$warehouse/ns/a2"
    IcebergWriter.addFiles(spark, dir, Seq(avroFile("a2", 0, 100)))
    // a RANGE delete — not equality-expressible, needs true positions
    spark.sql("DELETE FROM avcat.ns.a2 WHERE k >= 90 AND k < 95")
    val t = new IcebergTable(dir, conf)
    assert(t.hasDeletes, "the range DELETE must be merge-on-read")
    assert(t.planFiles().forall(_.fileFormat == "AVRO"),
      "the data file must not be rewritten")
    val r = spark.sql(
      "SELECT COUNT(*) AS n, SUM(k) AS s FROM avcat.ns.a2").collect()(0)
    assert(r.getLong(0) == 95L)
    assert(r.getLong(1) == (0L until 100L).sum - (90L until 95L).sum)
    // and equality deletes stack on top
    spark.sql("DELETE FROM avcat.ns.a2 WHERE k IN (1, 2)")
    assert(spark.sql("SELECT COUNT(*) FROM avcat.ns.a2")
      .collect()(0).getLong(0) == 93L)
  }

  test("three-format snapshot unions parquet + ORC + Avro") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS avcat.ns.a3")
    spark.sql("CREATE TABLE avcat.ns.a3 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO avcat.ns.a3 SELECT id, concat('v', id) FROM range(30)")
    import spark.implicits._
    val orcDir = "/root/repo/target/avro-src/a3-orc"
    new Path(orcDir).getFileSystem(conf).delete(new Path(orcDir), true)
    spark.range(30, 60).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("v")).coalesce(1)
      .write.mode("overwrite").orc(orcDir)
    val orcPath = new Path(orcDir).getFileSystem(conf)
      .listStatus(new Path(orcDir)).map(_.getPath)
      .find(_.getName.endsWith(".orc")).get.toString
    val dir = s"$warehouse/ns/a3"
    IcebergWriter.addFiles(spark, dir, Seq(orcPath))
    IcebergWriter.addFiles(spark, dir, Seq(avroFile("a3", 60, 90)))
    val t = new IcebergTable(dir, conf)
    assert(t.planFiles().map(_.fileFormat).toSet ==
      Set("PARQUET", "ORC", "AVRO"))
    val got = spark.sql("SELECT k FROM avcat.ns.a3 ORDER BY k").collect()
    assert(got.length == 90 && got.zipWithIndex.forall {
      case (r, i) => r.getLong(0) == i })
  }

  test("mixed-rename Avro group: per-file name resolution via mapping") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS avcat.ns.a5")
    spark.sql("CREATE TABLE avcat.ns.a5 (k BIGINT, v STRING)")
    val dir = s"$warehouse/ns/a5"
    // file A uses the OLD name 'v'
    IcebergWriter.addFiles(spark, dir, Seq(avroFile("a5-old", 0, 10)))
    spark.sql(
      """ALTER TABLE avcat.ns.a5 SET TBLPROPERTIES (
        |'schema.name-mapping.default' =
        |'[{"field-id": 1, "names": ["k"]},
        |  {"field-id": 2, "names": ["v"]}]')""".stripMargin)
    spark.sql("ALTER TABLE avcat.ns.a5 RENAME COLUMN v TO val")
    // file B uses the NEW name 'val'
    val schemaB = new Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"k","type":"long"},
        |{"name":"val","type":["null","string"],"default":null}]}"""
        .stripMargin)
    val fB = new java.io.File("/root/repo/target/avro-src/a5-new.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schemaB))
    w.create(schemaB, fB)
    (10L until 20L).foreach { i =>
      val r = new GenericData.Record(schemaB)
      r.put("k", i); r.put("val", s"v$i")
      w.append(r)
    }
    w.close()
    IcebergWriter.addFiles(spark, dir, Seq(fB.getAbsolutePath))
    // ONE scan covers both files; each resolves against its OWN schema
    val got = spark.sql(
      "SELECT k, val FROM avcat.ns.a5 WHERE k IN (5, 15) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((5L, "v5"), (15L, "v15")),
      s"both name generations must resolve, got $got")
  }

  test("timestamp-millis and timestamp-micros logical types both decode") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS avcat.ns.a6")
    spark.sql("CREATE TABLE avcat.ns.a6 (k BIGINT, ts TIMESTAMP)")
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"k","type":"long"},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}}]}"""
        .stripMargin)
    val f = new java.io.File("/root/repo/target/avro-src/a6.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    val r0 = new GenericData.Record(schema)
    r0.put("k", 1L); r0.put("ts", 1704067200123L) // 2024-01-01T00:00:00.123Z
    w.append(r0); w.close()
    IcebergWriter.addFiles(spark, s"$warehouse/ns/a6", Seq(f.getAbsolutePath))
    val got = spark.sql(
      "SELECT CAST(ts AS STRING) FROM avcat.ns.a6").collect()(0).getString(0)
    assert(got == "2024-01-01 00:00:00.123",
      s"millis logical type must decode at millis, got $got")
  }

  test("identity-partition values NOT in the Avro files re-inject from " +
      "manifest metadata (per partition group)") {
    // Hand-built table: the Avro data files carry only (id, v); the
    // partition column p lives ONLY in the manifest's partition tuple —
    // the layout an external Iceberg writer produces when it doesn't
    // materialize identity source columns. The scan must attach p from
    // metadata per group, exactly like the parquet re-injection path.
    val root = "/root/repo/target/avro-partmeta-table"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    new java.io.File(s"$root/metadata").mkdirs()
    new java.io.File(s"$root/data").mkdirs()
    val dataSchema = new Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},{"name":"v","type":"string"}]}"""
        .stripMargin)
    def dataFile(name: String, ids: Seq[Long]): java.io.File = {
      val f = new java.io.File(s"$root/data/$name.avro")
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](dataSchema))
      w.create(dataSchema, f)
      ids.foreach { i =>
        val r = new GenericData.Record(dataSchema)
        r.put("id", i); r.put("v", s"v$i"); w.append(r)
      }
      w.close(); f
    }
    val f5 = dataFile("p5", Seq(1L, 2L))
    val f7 = dataFile("p7", Seq(3L, 4L, 5L))
    val manifestSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"partition","type":{"type":"record","name":"r102","fields":[
        |    {"name":"p","type":["null","long"],"default":null}]}},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)
    val dfS = manifestSchema.getField("data_file").schema
    val partS = dfS.getField("partition").schema
    def entry(f: java.io.File, p: Long, rows: Long): GenericRecord = {
      val part = new GenericData.Record(partS); part.put("p", p)
      val d = new GenericData.Record(dfS)
      d.put("file_path", f.toString); d.put("file_format", "AVRO")
      d.put("partition", part); d.put("record_count", rows)
      d.put("file_size_in_bytes", f.length)
      val e = new GenericData.Record(manifestSchema)
      e.put("status", 1); e.put("data_file", d); e
    }
    def writeAvro(path: java.io.File, s: Schema,
                  recs: Seq[GenericRecord]): Unit = {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s))
      w.create(s, path); recs.foreach(w.append); w.close()
    }
    val m = new java.io.File(s"$root/metadata/m1.avro")
    writeAvro(m, manifestSchema, Seq(entry(f5, 5L, 2L), entry(f7, 7L, 3L)))
    val mlSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"}]}""".stripMargin)
    val ml = new GenericData.Record(mlSchema)
    ml.put("manifest_path", m.toString); ml.put("manifest_length", m.length)
    ml.put("partition_spec_id", 0)
    writeAvro(new java.io.File(s"$root/metadata/snap-1.avro"), mlSchema,
      Seq(ml))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      s"""{"format-version": 1, "location": "$root",
         |"schema": {"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "id", "required": false, "type": "long"},
         |  {"id": 2, "name": "p", "required": false, "type": "long"},
         |  {"id": 3, "name": "v", "required": false, "type": "string"}]},
         |"partition-specs": [{"spec-id": 0, "fields": [
         |  {"name": "p", "transform": "identity", "source-id": 2, "field-id": 1000}]}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 99,
         |"snapshots": [{"snapshot-id": 99, "timestamp-ms": 0,
         |  "manifest-list": "$root/metadata/snap-1.avro"}]}""".stripMargin)
    val t = new IcebergTable(root, conf)
    assert(t.missingPartitionColumns(spark, t.planFiles()) == Seq("p"),
      "p must be reported metadata-only for the Avro group")
    val rows = t.toDF(spark).select("id", "p", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set((1L, 5L, "v1"), (2L, 5L, "v2"),
      (3L, 7L, "v3"), (4L, 7L, "v4"), (5L, 7L, "v5")),
      s"partition values must re-inject per group, got $rows")
  }

  test("compaction materializes Avro to parquet; no pruning before, after yes") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS avcat.ns.a4")
    spark.sql("CREATE TABLE avcat.ns.a4 (k BIGINT, v STRING)")
    val dir = s"$warehouse/ns/a4"
    IcebergWriter.addFiles(spark, dir,
      Seq(avroFile("a4-lo", 0, 50), avroFile("a4-hi", 50, 100)))
    val t0 = new IcebergTable(dir, conf)
    // no column stats in Avro → predicate keeps both files (sound)
    assert(t0.planFiles(Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("k", 80L))).size == 2)
    IcebergWriter.compact(spark, dir)
    val t1 = new IcebergTable(dir, conf)
    assert(t1.planFiles().forall(_.fileFormat == "PARQUET"))
    assert(spark.sql("SELECT COUNT(*) FROM avcat.ns.a4")
      .collect()(0).getLong(0) == 100L)
  }
}
