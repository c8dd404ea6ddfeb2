package graft

import java.io.File

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.iceberg.IcebergTable
import graft.iceberg.connector.GraftCatalog

/** Time travel (`VERSION AS OF` / `TIMESTAMP AS OF`) over an in-test
  * two-snapshot table, and the Iceberg view-spec metadata format
  * round-trip. The snapshot list was already parsed in round 2
  * (`Metadata.scala`); these gates pin that a pinned scan reads the OLD
  * snapshot's file set, not the current one.
  */
class TimeTravelSpec extends SparkSpec {

  val warehouse = "/root/repo/target/test-tt-warehouse"
  val root = s"$warehouse/ns/tt"

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"}]}""".stripMargin)

  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  private def writeAvro(path: File, schema: Schema, records: Seq[GenericRecord]): Unit = {
    path.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    records.foreach(w.append)
    w.close()
  }

  /** Snapshot 1 (t=1000ms): files f1, f2. Snapshot 2 (t=2000ms, current):
    * f1..f4. One manifest per snapshot generation.
    */
  lazy val table: IcebergTable = {
    import org.apache.commons.io.FileUtils
    FileUtils.deleteQuietly(new File(warehouse))
    new File(s"$root/metadata").mkdirs()

    def writeDataFile(name: String, id: Long): String = {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.MetadataBuilder
      val dir = new File(s"$root/data/$name")
      // iceberg-conformant files carry parquet field ids (the reader
      // resolves id-bearing schemas by id, erroring on id-less files)
      Seq((id, s"row$id")).toDF("id", "tag")
        .select(
          col("id").as("id", new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
          col("tag").as("tag", new MetadataBuilder().putLong("parquet.field.id", 2L).build()))
        .coalesce(1).write.mode("overwrite").parquet(dir.toString)
      dir.listFiles.find(_.getName.endsWith(".parquet")).get.toString
    }
    def manifestFor(name: String, paths: Seq[String]): File = {
      val dfSchema = manifestSchema.getField("data_file").schema
      val recs = paths.map { p =>
        val df = new GenericData.Record(dfSchema)
        df.put("file_path", p); df.put("file_format", "PARQUET")
        df.put("record_count", 1L)
        df.put("file_size_in_bytes", new File(p).length)
        val e = new GenericData.Record(manifestSchema)
        e.put("status", 1); e.put("data_file", df)
        e.asInstanceOf[GenericRecord]
      }
      val f = new File(s"$root/metadata/$name.avro")
      writeAvro(f, manifestSchema, recs)
      f
    }
    def mlRec(m: File): GenericRecord = {
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", m.toString)
      r.put("manifest_length", m.length)
      r.put("partition_spec_id", 0)
      r
    }
    val gen1 = manifestFor("m1", Seq(writeDataFile("f1", 1L), writeDataFile("f2", 2L)))
    val gen2 = manifestFor("m2", Seq(writeDataFile("f3", 3L), writeDataFile("f4", 4L)))
    writeAvro(new File(s"$root/metadata/snap-1.avro"), manifestListSchema,
      Seq(mlRec(gen1)))
    writeAvro(new File(s"$root/metadata/snap-2.avro"), manifestListSchema,
      Seq(mlRec(gen1), mlRec(gen2)))

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$root",
         |"schema": {"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "id", "required": false, "type": "long"},
         |  {"id": 2, "name": "tag", "required": false, "type": "string"}]},
         |"partition-specs": [{"spec-id": 0, "fields": []}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 2,
         |"snapshots": [
         |  {"snapshot-id": 1, "timestamp-ms": 1000,
         |   "manifest-list": "$root/metadata/snap-1.avro"},
         |  {"snapshot-id": 2, "timestamp-ms": 2000,
         |   "manifest-list": "$root/metadata/snap-2.avro"}]}""".stripMargin)

    IcebergTable(spark, root)
  }

  test("current snapshot reads the full file set; pinned reads the old one") {
    assert(table.planFiles().size == 4)
    assert(table.atSnapshot(1L).planFiles().size == 2)
    val oldIds = table.atSnapshot(1L).toDF(spark)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(oldIds == Set(1L, 2L))
  }

  test("asOfTimestamp picks the latest snapshot at or before the bound") {
    assert(table.asOfTimestamp(1500L).pinnedSnapshotId.contains(1L))
    assert(table.asOfTimestamp(2000L).pinnedSnapshotId.contains(2L))
    intercept[IllegalArgumentException](table.asOfTimestamp(999L))
    intercept[IllegalArgumentException](table.atSnapshot(42L))
  }

  test("SQL VERSION AS OF / TIMESTAMP AS OF resolve through the catalog") {
    table.planFiles() // force the fixture
    spark.conf.set("spark.sql.catalog.tt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tt.warehouse", warehouse)
    assert(spark.sql("SELECT count(*) AS n FROM tt.ns.tt").collect()(0).getLong(0) == 4L)
    assert(spark.sql("SELECT count(*) AS n FROM tt.ns.tt VERSION AS OF 1")
      .collect()(0).getLong(0) == 2L)
    // TIMESTAMP AS OF takes a session-zone timestamp; snapshot 1 committed
    // at epoch+1000ms, so one second after epoch (UTC session) sees it
    assert(spark.sql(
      "SELECT count(*) AS n FROM tt.ns.tt TIMESTAMP AS OF '1970-01-01 00:00:01.5'")
      .collect()(0).getLong(0) == 2L)
    val err = intercept[Exception](
      spark.sql("SELECT * FROM tt.ns.tt VERSION AS OF 42").collect())
    assert(err.getMessage.contains("42"))
  }

  test("snapshot-id / as-of-timestamp read options are VERSION/TIMESTAMP AS OF's twins") {
    table.planFiles() // force the fixture
    spark.conf.set("spark.sql.catalog.tt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tt.warehouse", warehouse)
    assert(spark.read.option("snapshot-id", "1").table("tt.ns.tt").count() == 2L)
    assert(spark.read.option("as-of-timestamp", "1500").table("tt.ns.tt").count() == 2L)
    assert(spark.read.table("tt.ns.tt").count() == 4L)
    val both = intercept[Exception](
      spark.read.option("snapshot-id", "1").option("as-of-timestamp", "1500")
        .table("tt.ns.tt").count())
    assert(both.getMessage.contains("mutually exclusive"))
    val unknown = intercept[Exception](
      spark.read.option("snapshot-id", "42").table("tt.ns.tt").count())
    assert(unknown.getMessage.contains("42"))
  }

  test("IcebergWriter chains appends: each snapshot sees cumulative files") {
    import org.apache.commons.io.FileUtils
    import spark.implicits._
    import graft.iceberg.IcebergWriter
    val dir = "/root/repo/target/test-writer-table"
    FileUtils.deleteQuietly(new File(dir))
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    val metaJson = graft.iceberg.connector.IcebergJson.tableMetadata(
      new com.fasterxml.jackson.databind.ObjectMapper(), dir,
      df1.schema, Nil, Map.empty)
    new File(s"$dir/metadata").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"), metaJson)
    val s1 = IcebergWriter.append(spark, dir, df1)
    val s2 = IcebergWriter.append(spark, dir,
      Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "tag"))
    assert(s1 == 1L && s2 == 2L)
    val t = IcebergTable(spark, dir)
    assert(t.pinnedSnapshotId.isEmpty && t.rowCount() == 5L)
    assert(t.atSnapshot(s1).rowCount() == 2L)
    assert(t.atSnapshot(s1).toDF(spark).select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(t.toDF(spark).count() == 5L)
  }

  test("append preserves prior manifests' spec id and partition summaries") {
    import org.apache.commons.io.FileUtils
    import spark.implicits._
    import graft.iceberg.{IcebergWriter, ManifestIO}
    val dir = "/root/repo/target/test-writer-specid"
    FileUtils.deleteQuietly(new File(dir))
    val df1 = Seq((1L, "a")).toDF("id", "tag")
    val metaJson = graft.iceberg.connector.IcebergJson.tableMetadata(
      new com.fasterxml.jackson.databind.ObjectMapper(), dir,
      df1.schema, Nil, Map.empty)
    new File(s"$dir/metadata").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"), metaJson)
    IcebergWriter.append(spark, dir, df1)

    // relabel snapshot 1's manifest as written under an evolved spec (id 7)
    // with a partition summary, as an external writer would record it
    val conf = spark.sessionState.newHadoopConf()
    val richSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"content","type":"int"},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"added_rows_count","type":["null","long"],"default":null},
        |{"name":"partitions","type":["null",{"type":"array","items":
        |  {"type":"record","name":"field_summary","fields":[
        |    {"name":"contains_null","type":"boolean"},
        |    {"name":"contains_nan","type":["null","boolean"],"default":null},
        |    {"name":"lower_bound","type":["null","bytes"],"default":null},
        |    {"name":"upper_bound","type":["null","bytes"],"default":null}]}}],
        | "default":null}]}""".stripMargin)
    val snap1List = graft.iceberg.TableMetadata.load(dir, conf)
      .snapshots.find(_.snapshotId == 1L).get.manifestList
    val orig = ManifestIO.readManifestList(snap1List, conf).head
    val rec = new GenericData.Record(richSchema)
    rec.put("manifest_path", orig.path)
    rec.put("manifest_length", orig.length)
    rec.put("partition_spec_id", 7)
    rec.put("content", 0)
    rec.put("sequence_number", 1L)
    val summaries = new java.util.ArrayList[GenericRecord]()
    val fs = new GenericData.Record(
      richSchema.getField("partitions").schema.getTypes.get(1).getElementType)
    fs.put("contains_null", false)
    fs.put("lower_bound", java.nio.ByteBuffer.wrap(Array[Byte](1, 0, 0, 0)))
    fs.put("upper_bound", java.nio.ByteBuffer.wrap(Array[Byte](9, 0, 0, 0)))
    summaries.add(fs)
    rec.put("partitions", summaries)
    val snap1File = new File(new java.net.URI(
      if (snap1List.startsWith("/")) s"file://$snap1List" else snap1List).getPath)
    writeAvro(snap1File, richSchema, Seq(rec))
    // the writer created the list through Hadoop's checksummed local FS;
    // rewriting the file directly leaves a stale .crc sidecar behind
    new File(snap1File.getParent, s".${snap1File.getName}.crc").delete()

    IcebergWriter.append(spark, dir, Seq((2L, "b")).toDF("id", "tag"))
    val snap2List = graft.iceberg.TableMetadata.load(dir, conf)
      .snapshots.find(_.snapshotId == 2L).get.manifestList
    val after = ManifestIO.readManifestList(snap2List, conf)
    assert(after.size == 2)
    val prior = after.find(_.path == orig.path).get
    assert(prior.partitionSpecId == 7,
      "re-recorded manifest must keep its evolved spec id, not be relabeled 0")
    assert(prior.partitions.size == 1)
    assert(!prior.partitions.head.containsNull)
    assert(prior.partitions.head.lowerBound.get.toSeq == Seq[Byte](1, 0, 0, 0))
    assert(prior.partitions.head.upperBound.get.toSeq == Seq[Byte](9, 0, 0, 0))
    val fresh = after.find(_.path != orig.path).get
    assert(fresh.partitionSpecId == 0 && fresh.partitions.isEmpty)
  }

  test("view-spec metadata format round-trips and resolves in SQL") {
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
    import org.apache.spark.sql.types._
    table.planFiles() // force the fixture (creates the warehouse)
    spark.conf.set("spark.sql.catalog.tt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tt.warehouse", warehouse)
    val cat = spark.sessionState.catalogManager.catalog("tt").asInstanceOf[ViewCatalog]
    val ident = Identifier.of(Array("ns"), "small_ids")
    if (cat.viewExists(ident)) cat.dropView(ident)
    cat.createView(new ViewInfo(ident,
      "SELECT id, tag FROM tt.ns.tt WHERE id <= 2", "tt", Array("ns"),
      StructType(Seq(StructField("id", LongType), StructField("tag", StringType))),
      Array("id", "tag"), Array.empty, Array.empty,
      new java.util.HashMap[String, String]()))

    // the committed file is Iceberg view-spec metadata, not a private shape
    val f = new File(s"$warehouse/ns/small_ids/metadata/v1.view-metadata.json")
    assert(f.exists)
    val json = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    assert(json.get("view-uuid") != null)
    assert(json.get("format-version").asInt == 1)
    val ver = json.get("versions").elements.next()
    val rep = ver.get("representations").elements.next()
    assert(rep.get("type").asText == "sql" && rep.get("dialect").asText == "spark")
    assert(json.get("schemas").elements.next().get("fields").size == 2)

    val v = cat.loadView(ident)
    assert(v.query.contains("id <= 2"))
    assert(v.schema.fieldNames.toSeq == Seq("id", "tag"))
    assert(v.queryColumnNames.toSeq == Seq("id", "tag"))
    assert(spark.sql("SELECT count(*) AS n FROM tt.ns.small_ids")
      .collect()(0).getLong(0) == 2L)
  }
}
