package graft

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.iceberg.{IcebergTable, PartitionTransforms}

/** Transform-aware partition pruning: `day(ts)` and `bucket(id)` layouts
  * (the dominant warehouse-scale partitioning, absent from the reference)
  * must prune manifests/files from source-column filters. The bucket hash
  * is pinned against the Iceberg spec's published murmur3 test vectors —
  * the one pruning path where a wrong value would prune WRONGLY rather
  * than conservatively.
  */
class TransformPruningSpec extends SparkSpec {

  // -- Iceberg spec Appendix B hash test vectors ----------------------------

  test("bucket hash matches the Iceberg spec test vectors") {
    assert(PartitionTransforms.icebergHash(IntegerType, 34).contains(2017239379))
    assert(PartitionTransforms.icebergHash(LongType, 34L).contains(2017239379))
    assert(PartitionTransforms.icebergHash(StringType, "iceberg").contains(1210000089))
    // date 2017-11-16 = epoch day 17486, hashed as the long form
    assert(PartitionTransforms.icebergHash(DateType, 17486).contains(-653330422))
  }

  test("temporal and truncate transform math") {
    val day = java.time.LocalDate.of(2017, 11, 16).toEpochDay.toInt
    val ts = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(java.time.ZoneOffset.UTC)
    assert(PartitionTransforms.apply("day", TimestampType, ts).contains(day))
    assert(PartitionTransforms.apply("day", DateType, java.time.LocalDate.of(2017, 11, 16))
      .contains(day))
    assert(PartitionTransforms.apply("year", DateType,
      java.time.LocalDate.of(2017, 11, 16)).contains(47))
    assert(PartitionTransforms.apply("month", DateType,
      java.time.LocalDate.of(2017, 11, 16)).contains(47 * 12 + 10))
    assert(PartitionTransforms.apply("hour", TimestampType, ts)
      .contains(Math.floorDiv(ts.getEpochSecond, 3600L).toInt))
    assert(PartitionTransforms.apply("truncate[10]", LongType, 37L).contains(30L))
    assert(PartitionTransforms.apply("truncate[10]", LongType, -7L).contains(-10L))
    assert(PartitionTransforms.apply("truncate[3]", StringType, "iceberg").contains("ice"))
    // code-point truncation: a supplementary char counts as ONE code point
    val emoji = new String(Character.toChars(0x1D54F)) // 2 UTF-16 units
    assert(PartitionTransforms.apply("truncate[2]", StringType, emoji + "ab")
      .contains(emoji + "a"))
    assert(PartitionTransforms.apply("truncate[5]", StringType, emoji + "ab")
      .contains(emoji + "ab"))
  }

  test("rewrite relaxes strict range bounds and refuses bucket ranges") {
    val fi = Seq(PartitionTransforms.FieldInfo(0, "day", TimestampType))
    val lookup = (c: String) => if (c == "ts") fi else Nil
    val ts = java.time.Instant.parse("2017-11-16T22:31:08Z")
    val day = java.time.LocalDate.of(2017, 11, 16).toEpochDay.toInt
    val virt = PartitionTransforms.virtualName(0)
    assert(PartitionTransforms.rewrite(GreaterThan("ts", ts), lookup)
      .contains(GreaterThanOrEqual(virt, day)))
    assert(PartitionTransforms.rewrite(LessThan("ts", ts), lookup)
      .contains(LessThanOrEqual(virt, day)))
    assert(PartitionTransforms.rewrite(EqualTo("ts", ts), lookup)
      .contains(EqualTo(virt, day)))
    val bucket = Seq(PartitionTransforms.FieldInfo(0, "bucket[4]", LongType))
    val bLookup = (c: String) => if (c == "id") bucket else Nil
    assert(PartitionTransforms.rewrite(GreaterThan("id", 5L), bLookup).isEmpty,
      "bucket is not monotone; ranges must not rewrite")
    assert(PartitionTransforms.rewrite(EqualTo("id", 5L), bLookup).isDefined)
    // partially-rewritable conjunction keeps the usable side
    assert(PartitionTransforms.rewrite(
      And(EqualTo("id", 5L), EqualTo("other", 1L)), bLookup).isDefined)
    assert(PartitionTransforms.rewrite(
      Or(EqualTo("id", 5L), EqualTo("other", 1L)), bLookup).isEmpty,
      "OR with an unrewritable arm must not rewrite")
  }

  test("IsNull/IsNotNull rewrite only through null-preserving transforms") {
    // void(x) is null for EVERY x (v1 spec evolution writes it when a
    // partition field is dropped), so its all-null summary says nothing
    // about the source column — rewriting IsNotNull through it would
    // silently prune files that hold non-null matching rows
    val voidFi = Seq(PartitionTransforms.FieldInfo(0, "void", LongType))
    val vLookup = (c: String) => if (c == "id") voidFi else Nil
    assert(PartitionTransforms.rewrite(IsNotNull("id"), vLookup).isEmpty)
    assert(PartitionTransforms.rewrite(IsNull("id"), vLookup).isEmpty)
    // unknown future transforms get the same refusal
    val unk = (c: String) => Seq(PartitionTransforms.FieldInfo(0, "zorder[2]", LongType))
    assert(PartitionTransforms.rewrite(IsNotNull("id"), unk).isEmpty)
    // known null-preserving transforms still rewrite
    val virt = PartitionTransforms.virtualName(0)
    val bLk = (c: String) => Seq(PartitionTransforms.FieldInfo(0, "bucket[4]", LongType))
    assert(PartitionTransforms.rewrite(IsNotNull("id"), bLk).contains(IsNotNull(virt)))
    val dLk = (c: String) => Seq(PartitionTransforms.FieldInfo(0, "day", TimestampType))
    assert(PartitionTransforms.rewrite(IsNull("id"), dLk).contains(IsNull(virt)))
  }

  // -- end-to-end fixture: day-partitioned table ----------------------------

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
      | "default":null}]}""".stripMargin)

  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"partition","type":{"type":"record","name":"r102","fields":[
      |    {"name":"ts_day","type":["null","int"],"default":null}]}},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  private def leInt(v: Int): ByteBuffer =
    ByteBuffer.wrap(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array)

  private def writeAvro(path: File, schema: Schema, records: Seq[GenericRecord]): Unit = {
    path.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    records.foreach(w.append)
    w.close()
  }

  /** m1 covers days [17000, 17001] (files at 17000 and 17001), m2 covers
    * [17500, 17501]. Data files are metadata-only (pruneCounts never opens
    * them).
    */
  lazy val table: IcebergTable = {
    import org.apache.commons.io.FileUtils
    val root = "/root/repo/target/test-transform-table"
    FileUtils.deleteQuietly(new File(root))
    new File(s"$root/metadata").mkdirs()

    def manifestFor(name: String, days: Seq[Int]): File = {
      val dfSchema = manifestSchema.getField("data_file").schema
      val partSchema = dfSchema.getField("partition").schema
      val recs = days.map { d =>
        val part = new GenericData.Record(partSchema); part.put("ts_day", d)
        val df = new GenericData.Record(dfSchema)
        df.put("file_path", s"$root/data/d$d.parquet")
        df.put("file_format", "PARQUET")
        df.put("partition", part)
        df.put("record_count", 1L); df.put("file_size_in_bytes", 100L)
        val e = new GenericData.Record(manifestSchema)
        e.put("status", 1); e.put("data_file", df)
        e.asInstanceOf[GenericRecord]
      }
      val f = new File(s"$root/metadata/$name.avro")
      writeAvro(f, manifestSchema, recs)
      f
    }
    def mlRec(m: File, lo: Int, hi: Int): GenericRecord = {
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", m.toString); r.put("manifest_length", m.length)
      r.put("partition_spec_id", 0)
      val sSchema = manifestListSchema.getField("partitions").schema
        .getTypes.get(1).getElementType
      val s = new GenericData.Record(sSchema)
      s.put("contains_null", false)
      s.put("lower_bound", leInt(lo)); s.put("upper_bound", leInt(hi))
      r.put("partitions", java.util.List.of(s.asInstanceOf[GenericRecord]))
      r
    }
    val m1 = manifestFor("m1", Seq(17000, 17001))
    val m2 = manifestFor("m2", Seq(17500, 17501))
    writeAvro(new File(s"$root/metadata/snap-1.avro"), manifestListSchema,
      Seq(mlRec(m1, 17000, 17001), mlRec(m2, 17500, 17501)))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$root",
         |"schema": {"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "id", "required": false, "type": "long"},
         |  {"id": 2, "name": "ts", "required": false, "type": "timestamptz"}]},
         |"partition-specs": [{"spec-id": 0, "fields": [
         |  {"name": "ts_day", "transform": "day", "source-id": 2, "field-id": 1000}]}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 1,
         |"snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
         |  "manifest-list": "$root/metadata/snap-1.avro"}]}""".stripMargin)
    IcebergTable(spark, root)
  }

  private def tsOfDay(day: Int, hour: Int = 12): java.time.Instant =
    java.time.Instant.ofEpochSecond(day.toLong * 86400L + hour * 3600L)

  test("day-transform filter on the source timestamp prunes manifests") {
    val (mk, mt, fk, ft) = table.pruneCounts(Seq(GreaterThan("ts", tsOfDay(17400))))
    assert(mt == 2 && mk == 1, "only the late-days manifest may match ts > day 17400")
    assert(ft == 4 && fk == 2)
  }

  test("day-transform filter prunes individual files inside a manifest") {
    val (mk, _, fk, _) = table.pruneCounts(Seq(
      GreaterThanOrEqual("ts", tsOfDay(17501, hour = 0))))
    assert(mk == 1 && fk == 1, "only the day-17501 file may match")
    // equality on a timestamp inside day 17000
    val (_, _, one, _) = table.pruneCounts(Seq(EqualTo("ts", tsOfDay(17000))))
    assert(one == 1)
  }

  test("same-day boundary keeps the whole day (monotone relaxation)") {
    // ts > 18:00 on day 17001: day(ts) >= 17001 — the day-17001 file must
    // survive (rows later that day could match); day-17000 must not
    val (_, _, fk, _) = table.pruneCounts(Seq(GreaterThan("ts", tsOfDay(17001, 18))))
    assert(fk == 3, "days 17001, 17500, 17501 remain candidates")
  }
}
