package graft

import java.io.File

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.iceberg.IcebergTable
import graft.iceberg.connector.GraftCatalog

/** Merge-on-read (v2 delete files): position deletes remove rows by
  * (file, position), equality deletes by column values, and sequence
  * numbers gate application (position: data seq <= delete seq; equality:
  * strictly smaller — a row re-appended AFTER an equality delete must
  * survive it). The reference has no delete-file support
  * (`total-delete-files: 0` in its fixture); this is a round-3 extension.
  *
  * Fixture: data f1 = ids 1,2,3 (seq 1), f2 = ids 4,5,6 (seq 1),
  * f3 = id 7 (seq 3). Deletes at seq 2: positions (f1, 0) and (f2, 2)
  * [ids 1 and 6], equality id IN (4, 7). Expected survivors:
  * 2, 3, 5 (plain) and 7 (appended after the equality delete).
  */
class DeleteFilesSpec extends SparkSpec {

  val root = "/root/repo/target/test-mor-table"

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"}]}""".stripMargin)

  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int"},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],
      |   "default":null}]}}]}""".stripMargin)

  private def writeAvro(path: File, schema: Schema, records: Seq[GenericRecord]): Unit = {
    path.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    records.foreach(w.append)
    w.close()
  }

  private def entry(content: Int, path: String, rows: Long, seq: Long,
                    eqIds: Seq[Int] = Nil): GenericRecord = {
    val dfSchema = manifestSchema.getField("data_file").schema
    val df = new GenericData.Record(dfSchema)
    df.put("content", content)
    df.put("file_path", path)
    df.put("file_format", "PARQUET")
    df.put("record_count", rows)
    df.put("file_size_in_bytes", new File(path).length)
    if (eqIds.nonEmpty) {
      val l = new java.util.ArrayList[Integer]()
      eqIds.foreach(i => l.add(i))
      df.put("equality_ids", l)
    }
    val e = new GenericData.Record(manifestSchema)
    e.put("status", 1)
    e.put("sequence_number", seq)
    e.put("data_file", df)
    e.asInstanceOf[GenericRecord]
  }

  lazy val table: IcebergTable = {
    import org.apache.commons.io.FileUtils
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.MetadataBuilder
    FileUtils.deleteQuietly(new File(root))
    new File(s"$root/metadata").mkdirs()

    def fid(c: String, i: Long) =
      col(c).as(c, new MetadataBuilder().putLong("parquet.field.id", i).build())
    def writeData(name: String, rows: Seq[(Long, String)]): String = {
      val dir = new File(s"$root/data/$name")
      rows.toDF("id", "tag").select(fid("id", 1L), fid("tag", 2L))
        .coalesce(1).write.mode("overwrite").parquet(dir.toString)
      dir.listFiles.find(_.getName.endsWith(".parquet")).get.toString
    }
    val f1 = writeData("f1", Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val f2 = writeData("f2", Seq((4L, "d"), (5L, "e"), (6L, "f")))
    val f3 = writeData("f3", Seq((7L, "g")))

    def writeDeletes(name: String, df: org.apache.spark.sql.DataFrame): String = {
      val dir = new File(s"$root/data/$name")
      df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
      dir.listFiles.find(_.getName.endsWith(".parquet")).get.toString
    }
    val posDel = writeDeletes("pd1",
      Seq((f1, 0L), (f2, 2L)).toDF("file_path", "pos"))
    val eqDel = writeDeletes("ed1", Seq(4L, 7L).toDF("id"))

    val mData = new File(s"$root/metadata/m-data.avro")
    writeAvro(mData, manifestSchema, Seq(
      entry(0, f1, 3, seq = 1), entry(0, f2, 3, seq = 1), entry(0, f3, 1, seq = 3)))
    val mDel = new File(s"$root/metadata/m-del.avro")
    writeAvro(mDel, manifestSchema, Seq(
      entry(1, posDel, 2, seq = 2),
      entry(2, eqDel, 2, seq = 2, eqIds = Seq(1))))

    def mlRec(m: File, content: Int): GenericRecord = {
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", m.toString)
      r.put("manifest_length", m.length)
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r
    }
    writeAvro(new File(s"$root/metadata/snap-1.avro"), manifestListSchema,
      Seq(mlRec(mData, 0), mlRec(mDel, 1)))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$root",
         |"schema": {"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "id", "required": false, "type": "long"},
         |  {"id": 2, "name": "tag", "required": false, "type": "string"}]},
         |"partition-specs": [{"spec-id": 0, "fields": []}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 1,
         |"snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
         |  "manifest-list": "$root/metadata/snap-1.avro"}]}""".stripMargin)
    IcebergTable(spark, root)
  }

  test("position + equality deletes apply with sequence gating") {
    assert(table.hasDeletes)
    assert(table.planDeletes().map(_.content).sorted == Seq(1, 2))
    val ids = table.toDF(spark).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 3L, 5L, 7L),
      "1 and 6 go by position, 4 by equality; 7 (appended after the " +
        "equality delete) must survive the sequence gate")
  }

  test("append on a merge-on-read table preserves its delete manifests") {
    import org.apache.commons.io.FileUtils
    import spark.implicits._
    table.hasDeletes // force the fixture
    val root2 = "/root/repo/target/test-mor-append"
    FileUtils.deleteQuietly(new File(root2))
    FileUtils.copyDirectory(new File(root), new File(root2))
    // location in metadata still points at the original root: the copied
    // table resolves data/manifest paths via the location remap
    graft.iceberg.IcebergWriter.append(spark,
      root2, Seq((100L, "z")).toDF("id", "tag"))
    val t2 = IcebergTable(spark, root2)
    assert(t2.hasDeletes, "delete manifests must survive the append commit")
    val ids = t2.toDF(spark).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 3L, 5L, 7L, 100L),
      "deletes still applied; appended row present")
  }

  test("selective DELETE commits a position delete, no data rewrite") {
    import org.apache.commons.io.FileUtils
    val wh = "/root/repo/target/test-posdel-warehouse"
    FileUtils.deleteQuietly(new File(wh))
    spark.conf.set("spark.sql.catalog.pdw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pdw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pdw.ns")
    spark.sql("CREATE TABLE pdw.ns.t (k BIGINT, v STRING)")
    // single-partition insert → one data file of 10 rows
    spark.sql("INSERT INTO pdw.ns.t SELECT /*+ REPARTITION(1) */ " +
      "id, CONCAT('r', id) FROM range(0, 10)")
    val before = IcebergTable(spark, s"$wh/ns/t")
    assert(before.planFiles().size == 1)
    val beforePaths = before.planFiles().map(_.filePath).toSet

    // 1 of 10 rows matches → position delete, not a rewrite
    spark.sql("DELETE FROM pdw.ns.t WHERE k >= 9")
    val t = IcebergTable(spark, s"$wh/ns/t")
    assert(t.hasDeletes, "expected a delete manifest")
    assert(t.planDeletes().exists(_.content == 1),
      s"expected a POSITION delete file, got ${t.planDeletes()}")
    assert(t.planFiles().map(_.filePath).toSet == beforePaths,
      "the 10-row data file must NOT be rewritten")
    assert(spark.sql("SELECT k FROM pdw.ns.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == (0L to 8L))
    // prior snapshot still reads all 10 (time travel unaffected)
    assert(spark.sql("SELECT COUNT(*) FROM pdw.ns.t VERSION AS OF 1")
      .collect()(0).getLong(0) == 10L)
  }

  test("DELETE strategy is per file: drop fully-matched, rewrite large fractions") {
    import org.apache.commons.io.FileUtils
    val wh = "/root/repo/target/test-posdel-mixed"
    FileUtils.deleteQuietly(new File(wh))
    spark.conf.set("spark.sql.catalog.pdm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pdm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pdm.ns")
    spark.sql("CREATE TABLE pdm.ns.t (k BIGINT)")
    // two single-file appends: A = 0..9, B = 100..109
    spark.sql(
      "INSERT INTO pdm.ns.t SELECT /*+ REPARTITION(1) */ id FROM range(0, 10)")
    spark.sql(
      "INSERT INTO pdm.ns.t SELECT /*+ REPARTITION(1) */ id FROM range(100, 110)")
    val before = IcebergTable(spark, s"$wh/ns/t")
    assert(before.planFiles().size == 2)

    // matches 5/10 of A (0.5 > threshold → rewrite) and 10/10 of B (drop)
    spark.sql("DELETE FROM pdm.ns.t WHERE k >= 5")
    val t = IcebergTable(spark, s"$wh/ns/t")
    assert(!t.hasDeletes,
      "large fractions rewrite / fully-matched drop — no delete files here")
    assert(t.planFiles().size == 1, "B dropped, A swapped for one new file")
    assert(t.planFiles().map(_.filePath).toSet
      .intersect(before.planFiles().map(_.filePath).toSet).isEmpty,
      "A must be rewritten (its path replaced)")
    assert(spark.sql("SELECT k FROM pdm.ns.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == (0L to 4L))
  }

  test("MoR read splits: only delete-candidate files pay the anti-join") {
    import org.apache.hadoop.fs.Path
    val wh = "/root/repo/target/test-morsplit-wh"
    new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new Path(wh), true)
    spark.conf.set("spark.sql.catalog.morsp",
      classOf[graft.iceberg.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.morsp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS morsp.ns")
    spark.sql("CREATE TABLE morsp.ns.t (k INT, v STRING)")
    spark.sql("INSERT INTO morsp.ns.t SELECT CAST(id AS INT), 'lo' FROM range(0, 50, 1, 1)")
    spark.sql("INSERT INTO morsp.ns.t SELECT CAST(id AS INT), 'hi' FROM range(1000, 1050, 1, 1)")
    spark.sql("DELETE FROM morsp.ns.t WHERE k IN (1001, 1002)")
    val dir = s"$wh/ns/t"
    val t = new graft.iceberg.IcebergTable(dir,
      spark.sessionState.newHadoopConf())
    // only the hi file is a candidate; the read must still be exact
    assert(t.deleteCandidateFiles(spark, t.planFiles(), t.planDeletes()).size == 1)
    val df = t.toDF(spark)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Union"),
      s"expected the candidate/passthrough split union:\n$plan")
    // exactly one anti-join subtree (the candidate side), not two
    val antis = "LeftAnti".r.findAllIn(plan).length
    assert(antis == 1, s"expected one anti-join, got $antis:\n$plan")
    assert(df.count() == 98)
    assert(df.filter(org.apache.spark.sql.functions.col("k")
      .isin(1001, 1002)).count() == 0)
    assert(df.filter(org.apache.spark.sql.functions.col("k") < 50)
      .count() == 50)
  }

  test("merge-on-read resolves through the catalog (V1 bridge path)") {
    table.hasDeletes // force fixture
    spark.conf.set("spark.sql.catalog.mor", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mor.warehouse", "/root/repo/target")
    val rows = spark.sql(
      "SELECT id, tag FROM mor.`test-mor-table` ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L, 5L, 7L))
    assert(spark.sql("SELECT COUNT(*) FROM mor.`test-mor-table` WHERE tag > 'a'")
      .collect()(0).getLong(0) == 4L)
  }

  test("roaring DV codec: round-trip, corruption refusal, run containers") {
    import graft.iceberg.DeletionVectors
    // multi-container, multi-bucket round trip (array containers)
    val ps = Seq(0L, 2L, 5L, 65535L, 65536L, 131072L,
      (1L << 32) + 7L, (1L << 32) + 8L, (5L << 32))
    assert(DeletionVectors.decode(DeletionVectors.encode(ps)).toSeq
      == ps.sorted)
    assert(DeletionVectors.decode(
        DeletionVectors.encode(Seq(3L, 3L, 1L))).toSeq == Seq(1L, 3L),
      "duplicates collapse, order normalizes")
    // a flipped CRC byte must refuse loudly, not resurrect rows
    val blob = DeletionVectors.encode(ps)
    blob(blob.length - 1) = (blob(blob.length - 1) ^ 1).toByte
    intercept[IllegalArgumentException](DeletionVectors.decode(blob))
    // hand-built RUN-container bitmap (cookie 12347): runs [1..3], [10..11]
    val vec = new java.io.ByteArrayOutputStream()
    def le(n: Long, w: Int): Unit = {
      val b = java.nio.ByteBuffer.allocate(w)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (w == 8) b.putLong(n) else if (w == 4) b.putInt(n.toInt)
      else b.putShort(n.toShort)
      vec.write(b.array())
    }
    le(1, 8); le(0, 4)          // one bucket, high key 0
    le(12347, 4)                // run cookie, (containers-1)=0 in high bits
    vec.write(Array(1.toByte))  // run flag for container 0
    le(0, 2); le(4, 2)          // key 0, cardinality-1 = 4
    le(2, 2)                    // two runs
    le(1, 2); le(2, 2)          // [1, 1+2]
    le(10, 2); le(1, 2)         // [10, 10+1]
    val vb = vec.toByteArray
    val framed = java.nio.ByteBuffer.allocate(12 + vb.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val magic = Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)
    framed.putInt(4 + vb.length).put(magic).put(vb)
    val crc = new java.util.zip.CRC32()
    crc.update(magic); crc.update(vb)
    framed.putInt(crc.getValue.toInt)
    assert(DeletionVectors.decode(framed.array()).toSeq
      == Seq(1L, 2L, 3L, 10L, 11L))
  }

  test("v3 deletion vector reads back like the equivalent v2 position deletes") {
    import org.apache.commons.io.FileUtils
    import org.apache.spark.sql.functions.col
    val wh = "/root/repo/target/test-dv-warehouse"
    FileUtils.deleteQuietly(new File(wh))
    spark.conf.set("spark.sql.catalog.dvc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvc.ns")
    for (t <- Seq("a", "b")) {
      spark.sql(s"CREATE TABLE dvc.ns.$t (id BIGINT, tag STRING)")
      // range(..., numPartitions = 1): ONE data file per insert, with
      // in-file positions equal to the ascending id order
      spark.sql(s"INSERT INTO dvc.ns.$t " +
        "SELECT id, concat('v', id) FROM range(0, 5, 1, 1)")
      spark.sql(s"INSERT INTO dvc.ns.$t " +
        "SELECT id, concat('v', id) FROM range(10, 12, 1, 1)")
    }
    val dirA = s"$wh/ns/a"
    val ta = IcebergTable(spark, dirA)
    // the data file holding ids 0..4, and the in-file positions of 0 and 2
    val f = ta.planFiles().find(_.recordCount == 5).get
    val posOf = spark.read.parquet(ta.resolve(f.filePath))
      .select(col("id"), col("_metadata.row_index").as("pos"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.iceberg.IcebergWriter.addDeletionVector(spark, dirA,
      f.filePath, Seq(posOf(0L), posOf(2L)))
    // v2 twin: the writer's selective DELETE emits position-delete files
    spark.sql("DELETE FROM dvc.ns.b WHERE id IN (0, 2)")

    val got = spark.sql("SELECT id, tag FROM dvc.ns.a ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = spark.sql("SELECT id, tag FROM dvc.ns.b ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == want && got.map(_._1) == Seq(1L, 3L, 4L, 10L, 11L),
      s"DV table must match its v2 twin, got $got")

    // candidate pruning reads the DV's target from the MANIFEST: only the
    // referenced file pays the anti-join, with zero delete-file IO
    val ta2 = IcebergTable(spark, dirA)
    val dels = ta2.planDeletes()
    assert(dels.size == 1 && dels.head.isDv &&
      dels.head.referencedDataFile.contains(f.filePath))
    val cands = ta2.deleteCandidateFiles(spark, ta2.planFiles(), dels)
    assert(cands.map(_.filePath) == Seq(f.filePath),
      s"only the DV's referenced file is a candidate, got ${cands.map(_.filePath)}")

    // the changelog sees the DV commit as row-level deletes
    val lineage = ta2.metadata.snapshotLineage
    val changed = ta2.changesBetween(spark, lineage(1), lineage(2))
      .filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(changed == Set(0L, 2L), s"DV changelog deletes, got $changed")

    // a second DV on the same data file SUPERSEDES: the new vector
    // unions the prior positions (the spec's replacement invariant) and
    // exactly ONE DV entry remains
    graft.iceberg.IcebergWriter.addDeletionVector(spark, dirA,
      f.filePath, Seq(posOf(3L)))
    val ta2b = IcebergTable(spark, dirA)
    val dels2 = ta2b.planDeletes()
    assert(dels2.size == 1 && dels2.head.isDv &&
      dels2.head.recordCount == 3,
      s"one superseding DV carrying the union, got $dels2")
    val afterSupersede = spark.sql("SELECT id FROM dvc.ns.a ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(afterSupersede == Seq(1L, 4L, 10L, 11L))

    // maintenance that would re-stamp v2 position files refuses DVs loudly
    val e = intercept[Exception](
      graft.iceberg.IcebergWriter.rewritePositionDeleteFiles(spark, dirA))
    assert(e.getMessage.contains("deletion vectors"))
    // rewrite_data_files materializes the DV away; rows unchanged
    graft.iceberg.IcebergWriter.compact(spark, dirA)
    val ta3 = IcebergTable(spark, dirA)
    assert(!ta3.hasDeletes, "compaction absorbs the DV")
    val after = spark.sql("SELECT id FROM dvc.ns.a ORDER BY id").collect()
      .map(_.getLong(0)).toSeq
    assert(after == Seq(1L, 4L, 10L, 11L))
  }

  test("DV codec: dense chunks switch to bitmap containers") {
    import graft.iceberg.DeletionVectors
    // > 4096 positions inside one 65536-position chunk forces the bitmap
    // container on encode; sparse neighbours stay array containers
    val dense = (100L until 5200L)
    val ps = dense ++ Seq(70000L, (2L << 32) + 9L)
    assert(DeletionVectors.decode(DeletionVectors.encode(ps)).toSeq
      == ps.sorted)
  }

  test("DV write mode: DELETE and UPDATE commit deletion vectors") {
    import org.apache.commons.io.FileUtils
    val wh = "/root/repo/target/test-dvw-warehouse"
    FileUtils.deleteQuietly(new File(wh))
    spark.conf.set("spark.sql.catalog.dvw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvw.ns")
    spark.sql(
      """CREATE TABLE dvw.ns.t (id BIGINT, tag STRING)
        |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read',
        |               'write.update.mode' = 'merge-on-read')""".stripMargin)
    // two data files with in-file positions == ascending id order
    spark.sql("INSERT INTO dvw.ns.t " +
      "SELECT id, concat('v', id) FROM range(0, 100, 1, 1)")
    spark.sql("INSERT INTO dvw.ns.t " +
      "SELECT id, concat('v', id) FROM range(100, 120, 1, 1)")
    val dir = s"$wh/ns/t"
    def dels() = IcebergTable(spark, dir).planDeletes()
    def ids() = spark.sql("SELECT id FROM dvw.ns.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq

    // v2 era: a range DELETE commits a parquet position-delete file
    spark.sql("DELETE FROM dvw.ns.t WHERE id >= 0 AND id < 2")
    assert(dels().count(d => d.content == 1 && !d.isDv) == 1)

    // opt in, then a DV-era DELETE: the new vector ABSORBS the v2
    // positions for its file (seq-gated superset) and the redundant v2
    // entry DROPS — a DV table's debt converges to one vector per file
    spark.sql("ALTER TABLE dvw.ns.t SET TBLPROPERTIES " +
      "('graft.write.deletes' = 'dv')")
    spark.sql("DELETE FROM dvw.ns.t WHERE id >= 5 AND id < 8")
    val d1 = dels()
    assert(d1.count(_.isDv) == 1 && d1.count(d => d.content == 1 && !d.isDv) == 0,
      s"one DV, absorbed v2 entry dropped, got $d1")
    assert(d1.find(_.isDv).get.recordCount == 5L,
      "the DV absorbs the two v2 positions plus its own three")
    assert(ids() == ((2L until 5L) ++ (8L until 120L)))

    // a DELETE spanning both files: one DV per file, the prior DV for
    // file 1 is SUPERSEDED (exactly one DV entry per data file remains)
    spark.sql("DELETE FROM dvw.ns.t WHERE id >= 98 AND id < 102")
    val d2 = dels()
    assert(d2.count(_.isDv) == 2, s"one DV per touched file, got $d2")
    assert(d2.filter(_.isDv).map(_.recordCount).sorted == Seq(2L, 7L),
      s"supersede unions prior positions, got $d2")
    assert(ids() == ((2L until 5L) ++ (8L until 98L) ++ (102L until 120L)))

    // merge-on-read UPDATE: the delta's staged position-delete parquet
    // converts to DVs at commit; no v2 entries appear and the staging
    // files are gone from disk
    spark.sql("UPDATE dvw.ns.t SET tag = 'x' WHERE id = 110")
    val d3 = dels()
    assert(d3.count(d => d.content == 1 && !d.isDv) == 0,
      s"pure-DV debt, got $d3")
    assert(d3.filter(_.isDv).map(_.recordCount).sorted == Seq(3L, 7L),
      s"file 2's DV gains the updated row's position, got $d3")
    assert(spark.sql("SELECT tag FROM dvw.ns.t WHERE id = 110")
      .collect().head.getString(0) == "x")
    assert(ids() == ((2L until 5L) ++ (8L until 98L) ++ (102L until 120L)))

    // compaction materializes all delete debt away; rows unchanged
    graft.iceberg.IcebergWriter.compact(spark, dir)
    assert(!IcebergTable(spark, dir).hasDeletes)
    assert(ids() == ((2L until 5L) ++ (8L until 98L) ++ (102L until 120L)))

    // write-audit-publish: a DV DELETE staged on a branch leaves main
    // untouched until fast_forward publishes it
    val before = ids()
    spark.conf.set("spark.wap.branch", "audit")
    try spark.sql("DELETE FROM dvw.ns.t WHERE id >= 40 AND id < 43")
    finally spark.conf.unset("spark.wap.branch")
    assert(ids() == before, "main must not see the branch-staged DV delete")
    val staged = IcebergTable(spark, dir)
    val branchDels = staged.atSnapshot(staged.metadata.refs("audit"))
      .planDeletes()
    assert(branchDels.nonEmpty && branchDels.forall(_.isDv),
      s"branch debt must be deletion vectors, got $branchDels")
    spark.sql("CALL dvw.system.fast_forward(table => 'ns.t', " +
      "branch => 'main', to => 'audit')")
    assert(ids() == before.filterNot(id => id >= 40L && id < 43L))
  }
}
