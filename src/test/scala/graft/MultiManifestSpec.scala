package graft

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.sources._

import graft.iceberg._

/** Multi-manifest Iceberg table built in-test (2 manifests × 2 files each,
  * Spark-written parquet data): exercises the paths the 1-manifest
  * reference fixture cannot — parallel manifest reading, per-manifest
  * partition-summary pruning, and the spec-evolution guard (a manifest
  * with a non-default partitionSpecId must never be pruned positionally).
  */
class MultiManifestSpec extends SparkSpec {

  val root = "/root/repo/target/test-mm-table"

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"partitions","type":["null",{"type":"array","items":
      |  {"type":"record","name":"r508","fields":[
      |    {"name":"contains_null","type":"boolean"},
      |    {"name":"lower_bound","type":["null","bytes"],"default":null},
      |    {"name":"upper_bound","type":["null","bytes"],"default":null}]}}],
      | "default":null},
      |{"name":"added_rows_count","type":["null","long"],"default":null}
      |]}""".stripMargin)

  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"partition","type":{"type":"record","name":"r102","fields":[
      |    {"name":"p","type":["null","long"],"default":null}]}},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"lower_bounds","type":["null",{"type":"array","items":
      |    {"type":"record","name":"k126_v127","fields":[
      |      {"name":"key","type":"int"},{"name":"value","type":"bytes"}]},
      |    "logicalType":"map"}],"default":null},
      |  {"name":"upper_bounds","type":["null",{"type":"array","items":
      |    {"type":"record","name":"k128_v129","fields":[
      |      {"name":"key","type":"int"},{"name":"value","type":"bytes"}]},
      |    "logicalType":"map"}],"default":null}
      |]}}]}""".stripMargin)

  private def leLong(v: Long): ByteBuffer =
    ByteBuffer.wrap(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array)
  private def leDouble(v: Double): ByteBuffer =
    ByteBuffer.wrap(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array)

  private def writeAvro(path: File, schema: Schema, records: Seq[GenericRecord]): Unit = {
    path.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    records.foreach(w.append)
    w.close()
  }

  private def boundsMap(schema: Schema, vals: (Int, ByteBuffer)*): java.util.List[GenericRecord] = {
    val itemSchema = schema.getElementType
    val l = new java.util.ArrayList[GenericRecord]()
    vals.foreach { case (k, v) =>
      val r = new GenericData.Record(itemSchema)
      r.put("key", k); r.put("value", v); l.add(r)
    }
    l
  }

  /** Builds the table once: partition p=1 with v in {1.0, 2.0} | {3.0, 4.0},
    * partition p=2 with v in {10.0, 20.0} | {30.0, 40.0}; manifest m1 covers
    * p=1 (2 files), m2 covers p=2 (2 files), 1 row per file. Field ids:
    * id → 1, p → 2, v → 3.
    */
  lazy val table: IcebergTable = {
    import org.apache.commons.io.FileUtils
    FileUtils.deleteQuietly(new File(root))
    new File(s"$root/metadata").mkdirs()

    def writeDataFile(name: String, id: Long, p: Long, v: Double): (String, Double) = {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.MetadataBuilder
      val dir = new File(s"$root/data/$name")
      def fid(c: String, i: Long) =
        col(c).as(c, new MetadataBuilder().putLong("parquet.field.id", i).build())
      Seq((id, p, v)).toDF("id", "p", "v")
        .select(fid("id", 1L), fid("p", 2L), fid("v", 3L))
        .coalesce(1).write.mode("overwrite").parquet(dir.toString)
      val part = dir.listFiles.find(_.getName.endsWith(".parquet")).get
      (part.toString, v)
    }
    val files = Seq(
      ("f1", 1L, 1L, 1.0), ("f2", 2L, 1L, 3.0),
      ("f3", 3L, 2L, 10.0), ("f4", 4L, 2L, 30.0))
      .map { case (n, id, p, v) => (writeDataFile(n, id, p, v)._1, p, v) }

    def manifestFor(name: String, p: Long, fs: Seq[(String, Long, Double)]): File = {
      val dfSchema = manifestSchema.getField("data_file").schema
      val partSchema = dfSchema.getField("partition").schema
      val lbS = dfSchema.getField("lower_bounds").schema.getTypes.get(1)
      val ubS = dfSchema.getField("upper_bounds").schema.getTypes.get(1)
      val recs = fs.map { case (path, pv, v) =>
        val part = new GenericData.Record(partSchema); part.put("p", pv)
        val df = new GenericData.Record(dfSchema)
        df.put("file_path", path); df.put("file_format", "PARQUET")
        df.put("partition", part); df.put("record_count", 1L)
        df.put("file_size_in_bytes", new File(path).length)
        df.put("lower_bounds", boundsMap(lbS, 3 -> leDouble(v)))
        df.put("upper_bounds", boundsMap(ubS, 3 -> leDouble(v)))
        val e = new GenericData.Record(manifestSchema)
        e.put("status", 1); e.put("data_file", df)
        e.asInstanceOf[GenericRecord]
      }
      val f = new File(s"$root/metadata/$name.avro")
      writeAvro(f, manifestSchema, recs)
      f
    }
    val m1 = manifestFor("m1", 1L, files.filter(_._2 == 1L))
    val m2 = manifestFor("m2", 2L, files.filter(_._2 == 2L))

    def summary(lo: Long, hi: Long): java.util.List[GenericRecord] = {
      val sSchema = manifestListSchema.getField("partitions").schema.getTypes.get(1).getElementType
      val s = new GenericData.Record(sSchema)
      s.put("contains_null", false)
      s.put("lower_bound", leLong(lo)); s.put("upper_bound", leLong(hi))
      java.util.List.of(s.asInstanceOf[GenericRecord])
    }
    def mlRec(m: File, specId: Int, lo: Long, hi: Long): GenericRecord = {
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", m.toString); r.put("manifest_length", m.length)
      r.put("partition_spec_id", specId)
      r.put("partitions", summary(lo, hi)); r.put("added_rows_count", 2L)
      r
    }
    writeAvro(new File(s"$root/metadata/snap-1.avro"), manifestListSchema,
      Seq(mlRec(m1, 0, 1L, 1L), mlRec(m2, 0, 2L, 2L)))

    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      s"""{"format-version": 1, "location": "$root",
         |"schema": {"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "id", "required": false, "type": "long"},
         |  {"id": 2, "name": "p", "required": false, "type": "long"},
         |  {"id": 3, "name": "v", "required": false, "type": "double"}]},
         |"partition-specs": [{"spec-id": 0, "fields": [
         |  {"name": "p", "transform": "identity", "source-id": 2, "field-id": 1000}]}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 99,
         |"snapshots": [{"snapshot-id": 99, "timestamp-ms": 0,
         |  "manifest-list": "$root/metadata/snap-1.avro"}]}""".stripMargin)

    IcebergTable(spark, root)
  }

  test("multi-manifest scan reads all files through the parallel path") {
    assert(table.manifests.size == 2)
    assert(table.planFiles().size == 4)
    assert(table.rowCount() == 4L)
    val ids = table.toDF(spark).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 4L))
  }

  test("manifest-level pruning drops the non-matching manifest") {
    val (mk, mt, fk, _) = table.pruneCounts(Seq(EqualTo("p", 2L)))
    assert(mt == 2 && mk == 1 && fk == 2)
  }

  test("file-level pruning drops files on column bounds across manifests") {
    val (_, _, fk, ft) = table.pruneCounts(Seq(GreaterThan("v", 5.0)))
    assert(ft == 4 && fk == 2, "only the p=2 files (v=10,30) survive v > 5")
    val (_, _, one, _) = table.pruneCounts(Seq(LessThan("v", 2.0)))
    assert(one == 1, "only v=1.0 survives v < 2")
  }

  test("pruned scan ≡ unpruned scan + filter (soundness)") {
    val f = Seq(GreaterThan("v", 5.0), LessThan("p", 2L))
    val full = table.toDF(spark).filter("v > 5.0 AND p < 2").count()
    val pruned = table.toDF(spark, f).filter("v > 5.0 AND p < 2").count()
    assert(full == pruned)
  }

  test("manifests of a non-default spec are never pruned positionally") {
    table.manifests // force the lazy fixture even when this test runs alone
    // same table, but the manifest list claims spec-id 7 for m1: its
    // summary must be ignored (kept), not evaluated against default spec
    val m1 = new File(s"$root/metadata/m1.avro")
    writeAvro(new File(s"$root/metadata/snap-2.avro"), manifestListSchema, Seq {
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", m1.toString); r.put("manifest_length", m1.length)
      r.put("partition_spec_id", 7)
      // deliberately WRONG summary: claims p in [99, 99]
      val sSchema = manifestListSchema.getField("partitions").schema.getTypes.get(1).getElementType
      val s = new GenericData.Record(sSchema)
      s.put("contains_null", false)
      s.put("lower_bound", leLong(99L)); s.put("upper_bound", leLong(99L))
      r.put("partitions", java.util.List.of(s.asInstanceOf[GenericRecord]))
      r.put("added_rows_count", 2L)
      r.asInstanceOf[GenericRecord]
    })
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v2.metadata.json"),
      java.nio.file.Files.readString(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"))
        .replace("snap-1.avro", "snap-2.avro"))
    try {
      val t2 = IcebergTable(spark, root)
      // p = 1 would be "pruned" by the bogus [99,99] summary if the spec-id
      // guard were missing; with it the manifest is kept and rows survive
      assert(t2.planFiles(Seq(EqualTo("p", 1L))).size == 2)
      assert(t2.toDF(spark, Seq(EqualTo("p", 1L))).filter("p = 1").count() == 2L)
    } finally {
      new File(s"$root/metadata/v2.metadata.json").delete()
      new File(s"$root/metadata/snap-2.avro").delete()
    }
  }
}
