package graft

import org.apache.hadoop.fs.Path

import graft.iceberg.{IcebergTable, IcebergWriter, TableMetadata}
import graft.iceberg.connector.GraftCatalog

/** Declared format-version 3 with row lineage: the `format-version = 3`
  * table property upgrades the metadata on the next commit, every data
  * commit from then on assigns its new rows the id range
  * [first-row-id, first-row-id + added) and advances the table's
  * `next-row-id` in the same commit, and position deletes take the v3
  * deletion-vector form automatically (the spec makes DVs mandatory on
  * v3). Pre-upgrade snapshots carry no `first-row-id` — the spec's
  * upgraded-table semantics.
  */
class FormatV3Spec extends SparkSpec {

  private val warehouse = "/root/repo/target/v3-warehouse"

  private def conf = spark.sessionState.newHadoopConf()

  private def freshCatalog(): Unit = {
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set("spark.sql.catalog.v3cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.v3cat.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS v3cat.ns")
  }

  test("v3 declaration round-trips: upgrade on first commit, first-row-id " +
      "chain contiguous, counter monotone") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE v3cat.ns.t (k BIGINT, v STRING)
        |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
    val dir = s"$warehouse/ns/t"
    spark.sql("INSERT INTO v3cat.ns.t SELECT id, concat('v', id) FROM range(100)")
    val m1 = TableMetadata.load(dir, conf)
    assert(m1.formatVersion == 3, "first commit stamps format-version 3")
    assert(m1.nextRowId.contains(100L), s"counter after 100 rows: ${m1.nextRowId}")
    val s1 = m1.snapshots.last
    assert(s1.firstRowId.contains(0L), s"first snapshot starts at 0: ${s1.firstRowId}")
    spark.sql("INSERT INTO v3cat.ns.t SELECT id, concat('v', id) FROM range(100, 140)")
    val m2 = TableMetadata.load(dir, conf)
    assert(m2.snapshots.last.firstRowId.contains(100L),
      "second commit's range starts where the first ended")
    assert(m2.nextRowId.contains(140L))
    // metadata JSON round-trips through a reload (parse ≡ write)
    assert(spark.sql("SELECT COUNT(*) FROM v3cat.ns.t").head.getLong(0) == 140L)
  }

  test("upgrading an existing v2 table: old snapshots keep no lineage, " +
      "new ones are assigned; counter never moves backwards") {
    freshCatalog()
    spark.sql("CREATE TABLE v3cat.ns.u (k BIGINT)")
    spark.sql("INSERT INTO v3cat.ns.u SELECT id FROM range(50)")
    val dir = s"$warehouse/ns/u"
    assert(TableMetadata.load(dir, conf).formatVersion == 2)
    spark.sql("ALTER TABLE v3cat.ns.u SET TBLPROPERTIES ('format-version' = '3')")
    spark.sql("INSERT INTO v3cat.ns.u SELECT id FROM range(50, 80)")
    val m = TableMetadata.load(dir, conf)
    assert(m.formatVersion == 3)
    assert(m.snapshots.head.firstRowId.isEmpty,
      "pre-upgrade snapshot has no row lineage (spec upgraded-table rule)")
    assert(m.snapshots.last.firstRowId.contains(0L),
      "post-upgrade lineage starts at 0 — pre-upgrade rows are unassigned")
    assert(m.nextRowId.contains(30L))
    // deletes/compaction must not re-issue ids: a rewrite commit adds
    // rewritten rows under NEW ids is wrong — compaction carries no
    // added data manifests in the lineage sense? It does rewrite rows;
    // per spec, rewritten rows KEEP ids via inheritance, but this
    // writer assigns conservatively: the counter only grows.
    IcebergWriter.compact(spark, dir)
    val mc = TableMetadata.load(dir, conf)
    assert(mc.nextRowId.exists(_ >= 30L), "counter is monotone across rewrites")
    assert(spark.sql("SELECT COUNT(*) FROM v3cat.ns.u").head.getLong(0) == 80L)
  }

  test("position deletes on a declared-v3 table take the DV form " +
      "automatically; DV suite semantics hold") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE v3cat.ns.d (k BIGINT, v STRING)
        |TBLPROPERTIES ('format-version' = '3',
        |               'write.delete.mode' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO v3cat.ns.d SELECT id, concat('v', id) FROM range(200)")
    // range DELETE -> position deletes -> must land as deletion vectors
    spark.sql("DELETE FROM v3cat.ns.d WHERE k >= 150 AND k < 170")
    val dir = s"$warehouse/ns/d"
    val t = new IcebergTable(dir, conf)
    assert(t.hasDeletes, "the range DELETE stays merge-on-read")
    // a DV entry is content = 1 with its positions in a Puffin blob
    // (contentOffset/contentSize present) — NOT a parquet delete file
    val dvs = t.planDeletes().filter(d =>
      d.content == 1 && d.contentOffset.nonEmpty)
    assert(dvs.nonEmpty, "v3 table must write deletion vectors, got " +
      t.planDeletes().map(d => (d.content, d.contentOffset, d.fileFormat)))
    assert(dvs.forall(_.filePath.endsWith(".puffin")),
      s"DV blobs live in puffin files: ${dvs.map(_.filePath)}")
    assert(spark.sql("SELECT COUNT(*) FROM v3cat.ns.d").head.getLong(0) == 180L)
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM v3cat.ns.d")
      .head.getLong(0) == (0L until 200L).sum - (150L until 170L).sum)
    // a second overlapping DELETE absorbs into a superseding DV
    spark.sql("DELETE FROM v3cat.ns.d WHERE k >= 160 AND k < 180")
    assert(spark.sql("SELECT COUNT(*) FROM v3cat.ns.d").head.getLong(0) == 170L)
  }

  test("_row_id is served, dense per commit, and STABLE across " +
      "compaction (spec rewrite rule: rewrites materialize lineage)") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE v3cat.ns.rl (k BIGINT, v STRING)
        |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
    spark.sql("INSERT INTO v3cat.ns.rl SELECT id, concat('a', id) FROM range(60)")
    spark.sql("INSERT INTO v3cat.ns.rl SELECT id, concat('b', id) FROM range(60, 100)")
    def lineageMap(): Map[Long, Long] =
      spark.sql("SELECT k, _row_id FROM v3cat.ns.rl").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = lineageMap()
    // both commits' ranges dense and disjoint: [0,60) then [60,100)
    assert(before.values.toSeq.sorted == (0L until 100L),
      s"ids must be dense 0..99: ${before.values.toSeq.sorted.take(10)}…")
    assert((0L until 60L).forall(k => before(k) < 60),
      "first commit's rows take the first range")
    assert((60L until 100L).forall(k => before(k) >= 60),
      "second commit's rows take the second range")
    val dir = s"$warehouse/ns/rl"
    IcebergWriter.compact(spark, dir)
    val after = lineageMap()
    assert(after == before,
      s"compaction must preserve every row's _row_id: " +
        s"${(after.toSet -- before.toSet).take(5)}")
    // and the counter never reuses ids
    assert(TableMetadata.load(dir, conf).nextRowId.exists(_ >= 100L))
    // a second compaction reads the MATERIALIZED column and keeps it
    IcebergWriter.compact(spark, dir)
    assert(lineageMap() == before, "double compaction is still stable")
  }

  test("a partial-file CoW rewrite (position-delete path) keeps the " +
      "surviving rows' _row_id") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE v3cat.ns.rd (k BIGINT, v BIGINT)
        |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
    spark.sql("INSERT INTO v3cat.ns.rd SELECT id, id * 7 FROM range(80)")
    val before = spark.sql("SELECT k, _row_id FROM v3cat.ns.rd").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = s"$warehouse/ns/rd"
    // force the CoW rewrite branch (no merge-on-read): a small range
    // delete rewrites the file, keeping survivors
    IcebergWriter.positionDeleteWhere(spark, dir,
      Seq(org.apache.spark.sql.sources.And(
        org.apache.spark.sql.sources.GreaterThanOrEqual("k", 20L),
        org.apache.spark.sql.sources.LessThan("k", 30L))),
      maxPosDeleteFraction = 0.0) // 0 ⇒ never position-delete, always rewrite
    val after = spark.sql("SELECT k, _row_id FROM v3cat.ns.rd").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.keySet == before.keySet -- (20L until 30L))
    assert(after.forall { case (k, id) => before(k) == id },
      s"survivors keep ids: ${after.filter { case (k, id) => before(k) != id }.take(5)}")
  }

  test("_row_id serves over name-mapped id-less imports (null-safe, " +
      "no field-id read crash) and on a declared-v3 table pre-upgrade") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE v3cat.ns.nm (k BIGINT, v BIGINT)
        |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
    val dir = s"$warehouse/ns/nm"
    // declared-v3, metadata not yet upgraded: the metadata column must
    // already resolve (same predicate as the writer's assignment)
    assert(spark.sql("SELECT k, _row_id FROM v3cat.ns.nm").collect().isEmpty)
    // an id-LESS foreign parquet import + declared name mapping: the
    // lineage read schema must NOT flip the reader into field-id mode
    // (round-13 review finding: it crashed with 'expects field Ids')
    val src = "/root/repo/target/v3-nm-src"
    new Path(src).getFileSystem(conf).delete(new Path(src), true)
    spark.range(30).selectExpr("id AS k", "id * 3 AS v")
      .coalesce(1).write.parquet(src)
    val file = new Path(src).getFileSystem(conf)
      .listStatus(new Path(src)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    IcebergWriter.addFiles(spark, dir, Seq(file.toString))
    spark.sql("""ALTER TABLE v3cat.ns.nm SET TBLPROPERTIES (
      |'schema.name-mapping.default' =
      |'[{"field-id":1,"names":["k"]},{"field-id":2,"names":["v"]}]')"""
      .stripMargin)
    val t = new IcebergTable(dir, conf)
    assert(t.needsNameMapping(spark, t.planFiles()),
      "fixture must actually exercise the name-mapping read branch")
    val rows = spark.sql("SELECT k, _row_id FROM v3cat.ns.nm ORDER BY k")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows.size == 30, s"name-mapped read must still serve rows: ${rows.size}")
    // the import's manifest assigned a base, and parquet row positions
    // exist even without field ids — inherited lineage is served
    assert(rows.values.forall(_.isDefined) &&
      rows.values.flatten.toSeq.sorted == (0L until 30L),
      s"inherited lineage over the id-less import: ${rows.toSeq.sortBy(_._1).take(5)}")
  }

  test("timestamp_ns: refused by default with the opt-in named; the " +
      "BIGINT-nanos opt-in (session conf or table property) serves the " +
      "exact stored int64; writes stamp NANOS-annotated int64") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val root = "/root/repo/target/v3-ns-table"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    new java.io.File(s"$root/metadata").mkdirs()
    def fid(id: Long) = new MetadataBuilder()
      .putLong("parquet.field.id", id).build()
    // synthetic nanos-native layout: int64 epoch-nanos in the data file
    // (a nanos-capable writer's physical representation), timestamp_ns
    // in the metadata document
    val nanos = Seq(1700000000000000001L, 1700000000000000002L)
    val ws = StructType(Seq(
      StructField("k", LongType, nullable = true, fid(1)),
      StructField("ts", LongType, nullable = true, fid(2))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        nanos.zipWithIndex.map { case (n, i) => Row(i.toLong, n) }, 1), ws)
      .write.parquet(s"$root/data/f1")
    val pfile = new java.io.File(s"$root/data/f1").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val ms = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)
    val dfS = ms.getField("data_file").schema
    val d = new GenericData.Record(dfS)
    d.put("file_path", pfile.toString); d.put("file_format", "PARQUET")
    d.put("record_count", 2L); d.put("file_size_in_bytes", pfile.length)
    val e0 = new GenericData.Record(ms)
    e0.put("status", 1); e0.put("data_file", d)
    def writeAvro(path: java.io.File, s: Schema,
                  recs: Seq[GenericRecord]): Unit = {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s))
      w.create(s, path); recs.foreach(w.append); w.close()
    }
    val m = new java.io.File(s"$root/metadata/m1.avro")
    writeAvro(m, ms, Seq(e0))
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
    def metaJson(props: String): String =
      s"""{"format-version": 3, "location": "$root", $props
         |"schema": {"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "k", "required": false, "type": "long"},
         |  {"id": 2, "name": "ts", "required": false,
         |   "type": "timestamp_ns"}]},
         |"partition-specs": [{"spec-id": 0, "fields": []}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 99,
         |"snapshots": [{"snapshot-id": 99, "timestamp-ms": 0,
         |  "manifest-list": "$root/metadata/snap-1.avro"}]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"), metaJson(""))
    val optKey = s"spark.${graft.iceberg.TableMetadata.NsAsBigintKey}"
    spark.conf.unset(optKey)
    // default: LOUD refusal naming the opt-in
    val e = intercept[UnsupportedOperationException] {
      new IcebergTable(root, conf)
    }
    // a malformed opt-in value surfaces, never guesses (fail-closed
    // would silently refuse a deliberate opt-in; fail-open is worse)
    spark.conf.set(optKey, "maybe")
    try intercept[IllegalArgumentException] { new IcebergTable(root, conf) }
    finally spark.conf.unset(optKey)
    assert(e.getMessage.contains("timestamp_ns") &&
      e.getMessage.contains(graft.iceberg.TableMetadata.NsAsBigintKey),
      e.getMessage)
    // session-conf opt-in: lossless BIGINT nanos
    spark.conf.set(optKey, "true")
    try {
      val t = new IcebergTable(root, conf)
      assert(t.metadata.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(t.metadata.schema("ts").metadata
        .getString(graft.iceberg.TableMetadata.NsTypeKey) == "timestamp_ns")
      assert(t.metadata.nsFieldIds == Set(2))
      val got = t.toDF(spark).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(0L -> nanos(0), 1L -> nanos(1)),
        s"exact stored nanos must serve: $got")
      // WRITES under the opt-in (the r17 dual): the exact int64 lands
      // in the data file stamped with parquet's TIMESTAMP(NANOS)
      // annotation, so the column keeps meaning a nanosecond timestamp
      // for capable readers
      import spark.implicits._
      val nsVal = 1700000000000000009L
      graft.iceberg.IcebergWriter.append(spark, root,
        Seq((9L, nsVal)).toDF("k", "ts"))
      val t2r = new IcebergTable(root, conf)
      val got2 = t2r.toDF(spark).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got2 == Map(0L -> nanos(0), 1L -> nanos(1), 9L -> nsVal),
        s"engine-written nanos must round-trip exactly: $got2")
      // footer annotation check on the engine-written file
      val written = t2r.planFiles().map(_.filePath)
        .filterNot(_.contains("/data/f1"))
      assert(written.size == 1, s"expected one engine file, got $written")
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new Path(written.head), conf))
      try {
        val pqSchema = rdr.getFooter.getFileMetaData.getSchema
        val tsType = pqSchema.getType(
          pqSchema.getFieldIndex("ts")).asPrimitiveType()
        val ann = tsType.getLogicalTypeAnnotation
        assert(ann.isInstanceOf[org.apache.parquet.schema
          .LogicalTypeAnnotation.TimestampLogicalTypeAnnotation],
          s"ts must carry a timestamp annotation, got $ann")
        val tsAnn = ann.asInstanceOf[org.apache.parquet.schema
          .LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
        assert(tsAnn.getUnit == org.apache.parquet.schema
          .LogicalTypeAnnotation.TimeUnit.NANOS, s"unit: ${tsAnn.getUnit}")
        assert(!tsAnn.isAdjustedToUTC,
          "timestamp_ns (no tz) must stamp isAdjustedToUTC=false")
      } finally rdr.close()
      // int64 nanos bounds decode as longs, so pruning stays live: a
      // predicate beyond the new file's range prunes it
      val keep = t2r.planFiles(Seq(
        org.apache.spark.sql.sources.GreaterThan("ts", nsVal + 1))).size
      assert(keep < t2r.planFiles().size,
        "ns int64 bounds must prune (new file excluded)")
    } finally spark.conf.unset(optKey)
    // table-property opt-in: no session conf needed (the adopted table
    // carries its own opt-in)
    // v3: the CONTIGUOUS next version after the engine append's v2
    // commit (a fresh file, not an overwrite — LocalFileSystem checksums
    // pin committed versions). Contiguity matters: version resolution is
    // hint-first with a probe-forward (the HadoopTableOperations
    // semantics) — an external writer dropping a GAPPED version number
    // is outside the Hadoop-table layout contract and invisible to
    // Iceberg's own Hadoop catalog too.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/metadata/v3.metadata.json"),
      metaJson(s""""properties": {
        |  "${graft.iceberg.TableMetadata.NsAsBigintKey}": "true"},"""
        .stripMargin))
    val t2 = new IcebergTable(root, conf)
    assert(t2.metadata.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(t2.toDF(spark).count() == 2)

    // a DEFAULT on the ns column must not make the opted-in table
    // unloadable (the single-value ISO form re-encodes as epoch NANOS)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/metadata/v4.metadata.json"),
      metaJson(s""""properties": {
        |  "${graft.iceberg.TableMetadata.NsAsBigintKey}": "true"},"""
        .stripMargin).replace(
        """"type": "timestamp_ns"}""",
        """"type": "timestamp_ns",
          | "initial-default": "2024-01-05T00:00:00.000000001"}""".stripMargin))
    val t3 = new IcebergTable(root, conf)
    val exists = t3.metadata.schema("ts").metadata.getString("EXISTS_DEFAULT")
    assert(exists.contains("1704412800000000001"),
      s"ns default must serve as epoch nanos, got $exists")
  }

  test("NESTED geometry/timestamp_ns register their top-level column for " +
      "the write refusal (r17 review: top-level-only collection let " +
      "nested spatial values be written without their annotation)") {
    val meta = graft.iceberg.TableMetadata.fromJson(
      """{"format-version": 3, "location": "/x",
        |"properties": {"graft.read.timestamp-ns-as-bigint": "true"},
        |"schema": {"type": "struct", "schema-id": 0, "fields": [
        |  {"id": 1, "name": "k", "required": false, "type": "long"},
        |  {"id": 2, "name": "s", "required": false, "type": {
        |    "type": "struct", "fields": [
        |      {"id": 3, "name": "g", "required": false, "type": "geometry"}]}},
        |  {"id": 4, "name": "arr", "required": false, "type": {
        |    "type": "list", "element-id": 5, "element-required": false,
        |    "element": "timestamp_ns"}}]}}""".stripMargin)
    assert(meta.geoFieldIds == Set(2),
      s"struct-nested geometry must register its column: ${meta.geoFieldIds}")
    assert(meta.nsFieldIds == Set(4),
      s"list-nested timestamp_ns must register its column: ${meta.nsFieldIds}")
  }

  test("encrypted tables refuse LOUDLY: typed message at metadata load " +
      "(encryption-keys) and at manifest read (key_metadata), not a raw " +
      "decode error downstream") {
    def meta(keys: String) =
      s"""{"format-version": 3, "location": "/x", $keys
         |"schema": {"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "k", "required": false, "type": "long"}]}}"""
        .stripMargin
    val e1 = intercept[UnsupportedOperationException] {
      graft.iceberg.TableMetadata.fromJson(meta(
        """"encryption-keys": [{"key-id": "k1",
          |  "encrypted-key-metadata": "QUFBQQ=="}],""".stripMargin))
    }
    assert(e1.getMessage.contains("table encryption not supported"),
      e1.getMessage)
    // an EMPTY list means nothing is encrypted — loads normally
    assert(graft.iceberg.TableMetadata.fromJson(
      meta(""""encryption-keys": [],""")).formatVersion == 3)
    assert(graft.iceberg.TableMetadata.fromJson(meta("")).formatVersion == 3)

    // a manifest whose data file carries key_metadata (encrypted content)
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val ms = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"key_metadata","type":["null","bytes"],"default":null}]}}]}"""
        .stripMargin)
    val dfS = ms.getField("data_file").schema
    def entry(keyMeta: Option[Array[Byte]]): GenericRecord = {
      val d = new GenericData.Record(dfS)
      d.put("file_path", "/x/data/f.parquet")
      d.put("file_format", "PARQUET")
      d.put("record_count", 1L); d.put("file_size_in_bytes", 10L)
      keyMeta.foreach(b => d.put("key_metadata", java.nio.ByteBuffer.wrap(b)))
      val e = new GenericData.Record(ms)
      e.put("status", 1); e.put("data_file", d); e
    }
    def write(path: java.io.File, recs: Seq[GenericRecord]): Unit = {
      path.getParentFile.mkdirs()
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](ms))
      w.create(ms, path); recs.foreach(w.append); w.close()
    }
    val root = "/root/repo/target/v3-enc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val enc = new java.io.File(s"$root/m-enc.avro")
    write(enc, Seq(entry(Some(Array[Byte](1, 2, 3)))))
    val e2 = intercept[UnsupportedOperationException] {
      graft.iceberg.ManifestIO.readManifest(enc.toString, conf)
    }
    assert(e2.getMessage.contains("table encryption not supported") &&
      e2.getMessage.contains("f.parquet"), e2.getMessage)
    // a NULL key_metadata field is the unencrypted common case: reads fine
    val plain = new java.io.File(s"$root/m-plain.avro")
    write(plain, Seq(entry(None)))
    assert(graft.iceberg.ManifestIO.readManifest(plain.toString, conf)
      .map(_.filePath) == Seq("/x/data/f.parquet"))
  }

  test("v3 geometry: WKB binary passthrough read, doubt-keep pruning, " +
      "engine writes with bounding-box POINT bounds, exotic-WKB refusal, " +
      "and metadata round-trip of the spatial type") {
    freshCatalog()
    // the external-geo-table shape: data files hold WKB bytes in a
    // binary column; the metadata document declares geometry. Built by
    // writing binary then flipping the declared type in a NEW metadata
    // version (what adopting an externally-written geo table looks like).
    spark.sql("""CREATE TABLE v3cat.ns.geo (k BIGINT, geom BINARY)
                 TBLPROPERTIES ('format-version' = '3')""")
    val dir = s"$warehouse/ns/geo"
    import spark.implicits._
    def wkbPoint(b1: Int, b2: Int): Array[Byte] =
      Array[Byte](1, 1, 0, 0, 0) ++
        Array.fill(8)(b1.toByte) ++ Array.fill(8)(b2.toByte)
    Seq((1L, wkbPoint(3, 7)), (2L, wkbPoint(9, 2))).toDF("k", "geom")
      .createOrReplaceTempView("geo_src")
    spark.sql("INSERT INTO v3cat.ns.geo SELECT k, geom FROM geo_src")
    // flip binary -> geometry(srid:4326) in a NEW metadata version
    locally {
      val fs = new Path(dir).getFileSystem(conf)
      val latest = TableMetadata.latestMetadataPath(dir, conf)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = {
        val in = fs.open(latest)
        try mapper.readTree(in.readAllBytes())
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        finally in.close()
      }
      import scala.jdk.CollectionConverters._
      root.get("schemas").elements.asScala
        .flatMap(_.get("fields").elements.asScala)
        .filter(_.get("name").asText == "geom")
        .foreach(_.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("type", "geometry(srid:4326)"))
      val v = latest.getName.stripPrefix("v").stripSuffix(".metadata.json").toLong
      val out = fs.create(new Path(s"$dir/metadata/v${v + 1}.metadata.json"))
      try out.write(mapper.writeValueAsBytes(root)) finally out.close()
    }
    val t = new IcebergTable(dir, conf)
    // type surface: WKB BinaryType, original type string on the field
    val f = t.metadata.schema("geom")
    assert(f.dataType == org.apache.spark.sql.types.BinaryType)
    assert(f.metadata.getString(graft.iceberg.TableMetadata.GeoTypeKey) ==
      "geometry(srid:4326)")
    assert(t.metadata.geoFieldIds == Set(t.metadata.fieldIds("geom")))
    // values round-trip bit-exactly
    val rows = t.toDF(spark).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("geom")).toMap
    assert(rows.keySet == Set(1L, 2L) &&
      java.util.Arrays.equals(rows(1L), wkbPoint(3, 7)) &&
      java.util.Arrays.equals(rows(2L), wkbPoint(9, 2)),
      "WKB bytes must pass through unchanged")
    // pruning soundness: the file's stored bounds are byte-order (the
    // writer recorded them while the column was declared binary), but
    // geo bounds are bounding-box points in general — a geom predicate
    // must DOUBT-KEEP, never byte-prune
    val above = Array.fill[Byte](20)(0xFF.toByte) // > any stored value
    val filt = Seq[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("geom", above))
    assert(t.planFiles(filt).size == t.planFiles().size,
      "geometry column bounds must never prune")
    // ENGINE WRITES: WKB passthrough with spec bounding-box POINT bounds
    // tracked by the writer's own coordinate scan (r17 refused here)
    def pt(x: Double, y: Double) = graft.iceberg.GeoWkb.pointWkb(x, y)
    graft.iceberg.IcebergWriter.append(spark, dir,
      Seq((3L, pt(2.5, -1.0)), (4L, pt(-3.0, 8.5))).toDF("k", "geom")
        .coalesce(1))
    val tw = new IcebergTable(dir, conf)
    val wrote = tw.toDF(spark).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("geom")).toMap
    assert(wrote.keySet == Set(1L, 2L, 3L, 4L) &&
      java.util.Arrays.equals(wrote(3L), pt(2.5, -1.0)) &&
      java.util.Arrays.equals(wrote(4L), pt(-3.0, 8.5)),
      "engine-written WKB must round-trip bit-exactly")
    // the new file's manifest bounds are the spec's bounding-box POINTs
    // (lower = (minX, minY), upper = (maxX, maxY)), NOT byte-order bytes
    val geoId = tw.metadata.fieldIds("geom")
    val newFile = tw.planFiles().find(_.recordCount == 2).getOrElse(
      fail("expected the 2-row engine-written file in the plan"))
    assert(java.util.Arrays.equals(newFile.lowerBounds(geoId),
      pt(-3.0, -1.0)), "geo lower bound must be POINT(minX minY)")
    assert(java.util.Arrays.equals(newFile.upperBounds(geoId),
      pt(2.5, 8.5)), "geo upper bound must be POINT(maxX maxY)")
    // doubt-keep soundness holds WITH engine-written point bounds too:
    // a geom equality predicate must never byte-prune the new file
    val filt2 = Seq[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("geom", above))
    assert(tw.planFiles(filt2).size == tw.planFiles().size,
      "geo POINT bounds must never byte-prune")
    // ISO Z kinds write since r19: the z ordinate is strided over and the
    // manifest bound stays the exact x/y box
    def msgs(x: Throwable): String = Iterator.iterate(x)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    val zPoint = java.nio.ByteBuffer.allocate(29)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(1001)
      .putDouble(1).putDouble(2).putDouble(3).array()
    graft.iceberg.IcebergWriter.append(spark, dir,
      Seq((5L, zPoint)).toDF("k", "geom").coalesce(1))
    val tz = new IcebergTable(dir, conf)
    val zFile = tz.planFiles().find(f =>
      f.lowerBounds.get(tz.metadata.fieldIds("k")).exists(b =>
        java.nio.ByteBuffer.wrap(b)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong == 5L))
      .getOrElse(fail("expected the Z-point file"))
    assert(java.util.Arrays.equals(zFile.lowerBounds(geoId), pt(1, 2)) &&
      java.util.Arrays.equals(zFile.upperBounds(geoId), pt(1, 2)),
      "Z-point bounds must be the x/y box, z strided over")
    // EWKB flag bits still refuse loudly (never a guessed bound)
    val ewkbPoint = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(0x80000001)
      .putDouble(1).putDouble(2).array()
    val ez = intercept[Exception] {
      graft.iceberg.IcebergWriter.append(spark, dir,
        Seq((6L, ewkbPoint)).toDF("k", "geom"))
    }
    assert(msgs(ez).contains("unsupported WKB"),
      s"EWKB-flagged WKB must refuse loudly: ${msgs(ez)}")
    // the DSv2 row-level path writes geo conformantly too (r17's factory
    // refused on the schema marker): a CoW UPDATE rewrites WKB bit-exact
    spark.sql("UPDATE v3cat.ns.geo SET k = k + 100 WHERE k = 3")
    val tUpd = new IcebergTable(dir, conf)
    val afterUpd = tUpd.toDF(spark).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("geom")).toMap
    assert(afterUpd.keySet == Set(1L, 2L, 103L, 4L, 5L) &&
      java.util.Arrays.equals(afterUpd(103L), pt(2.5, -1.0)),
      "row-level rewrite must carry WKB through unchanged")
    // the REWRITTEN file's geo bounds are POINTs too (never byte-order
    // footer bytes) — pins the DSv2 write path's bound override. The
    // ADOPTED files keep their legacy byte-truncated binary bounds
    // (written while the column was declared binary), so the check
    // targets the rewrite output: the file holding k ∈ {4, 103}.
    val kId = tUpd.metadata.fieldIds("k")
    def kLong(b: Array[Byte]) = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    val rewritten = tUpd.planFiles().find(f =>
      f.lowerBounds.get(kId).exists(kLong(_) == 4L) &&
        f.upperBounds.get(kId).exists(kLong(_) == 103L))
      .getOrElse(fail("expected the rewritten file holding k in {4,103}"))
    Seq(rewritten.lowerBounds(geoId), rewritten.upperBounds(geoId))
      .foreach { b =>
        val bx = new graft.iceberg.GeoWkb.BBox
        bx.merge(b) // throws unless the bound parses as clean 2D WKB
        assert(!bx.isEmpty && bx.minX == bx.maxX,
          "the rewritten file's geo bound must be a single POINT")
      }
    // a file of ONLY empty geometries records NO geo bound at all (an
    // empty bbox must remove, never leak, footer byte bounds)
    val emptyLine = java.nio.ByteBuffer.allocate(9)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(2).putInt(0).array()
    graft.iceberg.IcebergWriter.append(spark, dir,
      Seq((7L, emptyLine)).toDF("k", "geom").coalesce(1))
    val tEmpty = new IcebergTable(dir, conf)
    val ef = tEmpty.planFiles().find(f =>
      f.recordCount == 1 && tEmpty.toDF(spark).count() >= 0 &&
        f.lowerBounds.get(tEmpty.metadata.fieldIds("k"))
          .exists(b => java.nio.ByteBuffer.wrap(b)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong == 7L))
      .getOrElse(fail("expected the empty-geometry file"))
    assert(!ef.lowerBounds.contains(geoId) &&
      !ef.upperBounds.contains(geoId),
      "an all-empty-geometry file must record no geo bounds")
    // metadata round-trip: a property commit preserves the declared
    // spatial type verbatim (commits edit the JSON document, they never
    // re-serialize from the Spark-visible schema)
    spark.sql(
      "ALTER TABLE v3cat.ns.geo SET TBLPROPERTIES ('comment' = 'geo table')")
    val t2 = new IcebergTable(dir, conf)
    assert(t2.metadata.schema("geom").metadata
      .getString(graft.iceberg.TableMetadata.GeoTypeKey) ==
        "geometry(srid:4326)",
      "the spatial type must survive a metadata commit")
  }

  test("v3 geography: Point/MultiPoint engine writes record the exact " +
      "vertex box; edge kinds refuse (a planar box does not bound " +
      "geodesic edges — the r18 advice)") {
    freshCatalog()
    spark.sql("""CREATE TABLE v3cat.ns.geog (k BIGINT, geog BINARY)
                 TBLPROPERTIES ('format-version' = '3')""")
    val dir = s"$warehouse/ns/geog"
    import spark.implicits._
    // seed a row while the column is still binary, then flip the declared
    // type to geography in a new metadata version (the adoption shape)
    spark.sql("INSERT INTO v3cat.ns.geog SELECT CAST(1 AS BIGINT), " +
      "CAST(NULL AS BINARY)")
    locally {
      val fs = new Path(dir).getFileSystem(conf)
      val latest = TableMetadata.latestMetadataPath(dir, conf)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = {
        val in = fs.open(latest)
        try mapper.readTree(in.readAllBytes())
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        finally in.close()
      }
      import scala.jdk.CollectionConverters._
      root.get("schemas").elements.asScala
        .flatMap(_.get("fields").elements.asScala)
        .filter(_.get("name").asText == "geog")
        .foreach(_.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("type", "geography(srid:4326)"))
      val v = latest.getName.stripPrefix("v").stripSuffix(".metadata.json").toLong
      val out = fs.create(new Path(s"$dir/metadata/v${v + 1}.metadata.json"))
      try out.write(mapper.writeValueAsBytes(root)) finally out.close()
    }
    def pt(x: Double, y: Double) = graft.iceberg.GeoWkb.pointWkb(x, y)
    // POINT writes succeed and record the exact vertex box
    graft.iceberg.IcebergWriter.append(spark, dir,
      Seq((2L, pt(170.0, 10.0)), (3L, pt(-65.0, -2.0))).toDF("k", "geog")
        .coalesce(1))
    val t = new IcebergTable(dir, conf)
    val gid = t.metadata.fieldIds("geog")
    val f = t.planFiles().find(_.recordCount == 2).getOrElse(
      fail("expected the 2-row geography file"))
    assert(java.util.Arrays.equals(f.lowerBounds(gid), pt(-65.0, -2.0)) &&
      java.util.Arrays.equals(f.upperBounds(gid), pt(170.0, 10.0)),
      "geography POINT bounds must be the exact vertex box")
    // an antimeridian-crossing LINESTRING refuses: its geodesic lies in
    // the longitude band the vertex box [-170, 170] EXCLUDES — recording
    // that box would prune files holding matching rows
    val line = java.nio.ByteBuffer.allocate(41)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(2).putInt(2)
      .putDouble(170).putDouble(0).putDouble(-170).putDouble(0).array()
    val e = intercept[Exception] {
      graft.iceberg.IcebergWriter.append(spark, dir,
        Seq((4L, line)).toDF("k", "geog"))
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains("GEOGRAPHY"))),
      "edge-bearing geography WKB must refuse loudly")
    // the refused write committed nothing
    assert(new IcebergTable(dir, conf).toDF(spark).count() == 3L)
  }

  test("_last_updated_sequence_number serves through the name-mapping " +
      "branch WITH delete files present (r16 advice: matRowId kept only " +
      "_row_id, so norm() crashed selecting the dropped column)") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE v3cat.ns.nm2 (k BIGINT, v BIGINT)
        |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
    val dir = s"$warehouse/ns/nm2"
    val src = "/root/repo/target/v3-nm2-src"
    new Path(src).getFileSystem(conf).delete(new Path(src), true)
    spark.range(30).selectExpr("id AS k", "id * 3 AS v")
      .coalesce(1).write.parquet(src)
    val file = new Path(src).getFileSystem(conf)
      .listStatus(new Path(src)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    IcebergWriter.addFiles(spark, dir, Seq(file.toString))
    spark.sql("""ALTER TABLE v3cat.ns.nm2 SET TBLPROPERTIES (
      |'schema.name-mapping.default' =
      |'[{"field-id":1,"names":["k"]},{"field-id":2,"names":["v"]}]')"""
      .stripMargin)
    // a merge-on-read delete: the read now routes candidates through the
    // norm() projection that selects BOTH lineage columns
    spark.sql("DELETE FROM v3cat.ns.nm2 WHERE k = 5")
    val t = new IcebergTable(dir, conf)
    assert(t.needsNameMapping(spark, t.planFiles()) && t.hasDeletes,
      "fixture must exercise name-mapping + delete application together")
    val expectSeq = t.planFiles().head.sequenceNumber
    assert(expectSeq.isDefined, "import file must carry a sequence number")
    val rows = spark.sql(
      "SELECT k, _row_id, _last_updated_sequence_number FROM v3cat.ns.nm2")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
         (if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(rows.keySet == (0L until 30L).toSet - 5L,
      s"MoR delete applies under the lineage read: ${rows.keySet.size} rows")
    assert(rows.forall { case (k, (rid, _)) => rid.contains(k) },
      s"inherited _row_id: ${rows.toSeq.sortBy(_._1).take(5)}")
    assert(rows.values.forall(_._2 == expectSeq),
      s"inherited _last_updated_sequence_number = $expectSeq: " +
        s"${rows.toSeq.sortBy(_._1).take(5)}")
  }

  test("_last_updated_sequence_number survives the partition re-injection " +
      "branch, materialized value beating per-file inheritance (r16 " +
      "advice: the dropped column silently fell back to inheritance)") {
    // Hand-built v3 table (external-writer layout): parquet data files
    // carry only (id, v) — identity partition column p lives ONLY in the
    // manifest tuple, forcing the re-injection scan branch. File A also
    // MATERIALIZES _last_updated_sequence_number = 42 (a rewritten file's
    // layout); file B doesn't and must inherit its entry's sequence.
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val root = "/root/repo/target/v3-partmeta-lineage"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    new java.io.File(s"$root/metadata").mkdirs()
    new java.io.File(s"$root/data").mkdirs()
    def fid(id: Long) = new MetadataBuilder()
      .putLong("parquet.field.id", id).build()
    def dataFile(name: String, rows: Seq[Row], s: StructType): java.io.File = {
      val d = s"$root/data/$name"
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), s).write.parquet(d)
      new java.io.File(d).listFiles()
        .find(_.getName.endsWith(".parquet")).get
    }
    val withLineage = StructType(Seq(
      StructField("id", LongType, nullable = true, fid(1)),
      StructField("v", StringType, nullable = true, fid(3)),
      StructField(IcebergTable.LastUpdCol, LongType, nullable = true,
        fid(IcebergTable.LastUpdFieldId))))
    val plain = StructType(withLineage.fields.take(2))
    val fA = dataFile("a", Seq(Row(0L, "v0", 42L), Row(1L, "v1", 42L)),
      withLineage)
    val fB = dataFile("b", Seq(Row(2L, "v2"), Row(3L, "v3"), Row(4L, "v4")),
      plain)
    val manifestSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"partition","type":{"type":"record","name":"r102","fields":[
        |    {"name":"p","type":["null","long"],"default":null}]}},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"first_row_id","type":["null","long"],"default":null}]}}]}"""
        .stripMargin)
    val dfS = manifestSchema.getField("data_file").schema
    val partS = dfS.getField("partition").schema
    def entry(f: java.io.File, p: Long, rows: Long, seq: Long,
              firstRowId: Long): GenericRecord = {
      val part = new GenericData.Record(partS); part.put("p", p)
      val d = new GenericData.Record(dfS)
      d.put("file_path", f.toString); d.put("file_format", "PARQUET")
      d.put("partition", part); d.put("record_count", rows)
      d.put("file_size_in_bytes", f.length)
      d.put("first_row_id", firstRowId)
      val e = new GenericData.Record(manifestSchema)
      e.put("status", 1); e.put("sequence_number", seq); e.put("data_file", d)
      e
    }
    def writeAvro(path: java.io.File, s: Schema,
                  recs: Seq[GenericRecord]): Unit = {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s))
      w.create(s, path); recs.foreach(w.append); w.close()
    }
    val m = new java.io.File(s"$root/metadata/m1.avro")
    writeAvro(m, manifestSchema,
      Seq(entry(fA, 5L, 2L, 7L, 0L), entry(fB, 7L, 3L, 9L, 10L)))
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
      s"""{"format-version": 3, "location": "$root", "next-row-id": 20,
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
      "p must be metadata-only so the scan takes the re-injection branch")
    val out = t.toDF(spark, Nil, keepLineage = true)
      .select("id", "p", IcebergTable.RowIdCol, IcebergTable.LastUpdCol)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      0L -> ((5L, 0L, 42L)), 1L -> ((5L, 1L, 42L)),
      2L -> ((7L, 10L, 9L)), 3L -> ((7L, 11L, 9L)), 4L -> ((7L, 12L, 9L))),
      s"materialized sequence (42) must win on file A, file B inherits: $out")
  }

  test("a rival commit advancing next-row-id between plan and publish is " +
      "REFUSED (assert-next-row-id), not allowed to duplicate id ranges") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE v3cat.ns.race (k BIGINT)
        |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
    spark.sql("INSERT INTO v3cat.ns.race SELECT id FROM range(10)")
    val dir = s"$warehouse/ns/race"
    assert(TableMetadata.load(dir, conf).nextRowId.contains(10L))
    // a committer that lets a rival advance the counter AFTER this
    // write's manifests were stamped (base = 10) but BEFORE its publish
    // — the exact window the branch-ref assert cannot see
    val racing = new graft.iceberg.FsCommitter(dir, conf) {
      @volatile var fired = false
      override def commit(requirements: Seq[com.fasterxml.jackson.databind.JsonNode],
                          updates: Seq[com.fasterxml.jackson.databind.JsonNode]): Unit = {
        if (!fired) {
          fired = true
          val m = new com.fasterxml.jackson.databind.ObjectMapper()
          new graft.iceberg.FsCommitter(dir, conf).commit(Nil,
            Seq(graft.iceberg.MetadataCommit.setNextRowId(m, 500L)))
        }
        super.commit(requirements, updates)
      }
    }
    val df = spark.range(10, 15).selectExpr("id AS k")
    intercept[graft.iceberg.CommitConflictException] {
      IcebergWriter.append(spark, dir, df, committer = Some(racing))
    }
    // the refused commit must not have landed rows
    assert(spark.sql("SELECT COUNT(*) FROM v3cat.ns.race").head.getLong(0) == 10L)
    // the caller's retry (fresh plan) assigns from the rival's counter —
    // no overlap with any previously assigned range
    IcebergWriter.append(spark, dir, df)
    val ids = spark.sql("SELECT _row_id FROM v3cat.ns.race").collect()
      .map(_.getLong(0)).sorted
    assert(ids.length == 15 && ids.distinct.length == 15,
      s"row ids must stay unique: ${ids.mkString(",")}")
    assert(ids.takeRight(5).forall(_ >= 500L),
      s"retry assigns past the rival's counter: ${ids.takeRight(5).mkString(",")}")
  }

  test("manifest-level first_row_id INHERITANCE (the spec's form external " +
      "writers use): null-valued ADDED entries assign sequentially") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = new java.io.File("/root/repo/target/v3-inherit")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    // a FOREIGN manifest: no per-entry first_row_id field at all
    val mSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)
    val mPath = new java.io.File(dir, "m1.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](mSchema))
    w.create(mSchema, mPath)
    Seq(("a.parquet", 7L, 1), ("b.parquet", 5L, 1), ("c.parquet", 3L, 0))
      .foreach { case (p, rc, status) =>
        val d = new GenericData.Record(mSchema.getField("data_file").schema)
        d.put("file_path", p); d.put("file_format", "PARQUET")
        d.put("record_count", rc); d.put("file_size_in_bytes", 10L)
        val e = new GenericData.Record(mSchema)
        e.put("status", status) // c.parquet is EXISTING: must NOT inherit
        e.put("data_file", d)
        w.append(e)
      }
    w.close()
    // a manifest LIST record carrying the manifest's first_row_id
    val mlSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"content","type":"int"},
        |{"name":"first_row_id","type":["null","long"],"default":null}]}"""
        .stripMargin)
    val mlPath = new java.io.File(dir, "snap.avro")
    val lw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](mlSchema))
    lw.create(mlSchema, mlPath)
    val lr = new GenericData.Record(mlSchema)
    lr.put("manifest_path", mPath.getAbsolutePath)
    lr.put("manifest_length", mPath.length)
    lr.put("partition_spec_id", 0)
    lr.put("content", 0)
    lr.put("first_row_id", 100L)
    lw.append(lr); lw.close()
    import graft.iceberg.ManifestIO
    val ml = ManifestIO.readManifestList(mlPath.getAbsolutePath, conf)
    assert(ml.head.firstRowId.contains(100L),
      s"manifest-list first_row_id must parse: ${ml.head}")
    val entries = ManifestIO.readManifest(mPath.getAbsolutePath, conf,
      inheritFirstRowId = ml.head.firstRowId)
    val byPath = entries.map(e => e.filePath -> e.firstRowId).toMap
    assert(byPath("a.parquet").contains(100L), s"first ADDED entry: $byPath")
    assert(byPath("b.parquet").contains(107L),
      s"second ADDED entry inherits base + previous record_count: $byPath")
    assert(byPath("c.parquet").isEmpty,
      s"EXISTING entries never inherit (spec: rewrites write explicit): $byPath")
    // without a base (our own absolute-value manifests), nothing inherits
    assert(ManifestIO.readManifest(mPath.getAbsolutePath, conf)
      .forall(_.firstRowId.isEmpty))
  }

  test("copy-on-write UPDATE, MERGE, and DELETE preserve _row_id (spec " +
      "rewrite rule through Spark's ReplaceData metadata projection)") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE v3cat.ns.cw (k BIGINT, v BIGINT)
        |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
    spark.sql("INSERT INTO v3cat.ns.cw SELECT id, id * 10 FROM range(50)")
    spark.sql("INSERT INTO v3cat.ns.cw SELECT id, id * 10 FROM range(50, 80)")
    def lineage(): Map[Long, Long] =
      spark.sql("SELECT k, _row_id FROM v3cat.ns.cw").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = lineage()
    assert(before.values.toSeq.sorted == (0L until 80L))

    // UPDATE (default copy-on-write): updated AND copied rows keep ids
    spark.sql("UPDATE v3cat.ns.cw SET v = v + 1 WHERE k % 4 = 0")
    val afterUpdate = lineage()
    assert(afterUpdate == before,
      s"CoW UPDATE must preserve every _row_id: " +
        s"${afterUpdate.filter { case (k, id) => before(k) != id }.take(5)}")
    assert(spark.sql(
      "SELECT CAST(SUM(v) AS BIGINT) FROM v3cat.ns.cw").head.getLong(0) ==
      (0L until 80L).map(k => k * 10 + (if (k % 4 == 0) 1 else 0)).sum)

    // MERGE: matched updates preserve, NOT MATCHED inserts get FRESH ids
    spark.sql("CREATE TABLE v3cat.ns.src (k BIGINT, v BIGINT)")
    spark.sql(
      "INSERT INTO v3cat.ns.src SELECT id, id * 100 FROM range(70, 90)")
    spark.sql(
      """MERGE INTO v3cat.ns.cw t USING v3cat.ns.src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
        .stripMargin)
    val afterMerge = lineage()
    assert((0L until 80L).forall(k => afterMerge(k) == before(k)),
      s"MERGE must preserve existing rows' _row_id: " +
        s"${(0L until 80L).filter(k => afterMerge(k) != before(k)).take(5)}")
    val inserted = (80L until 90L).map(afterMerge)
    assert(inserted.forall(_ >= 80L) && inserted.distinct.size == 10,
      s"MERGE-inserted rows take fresh non-overlapping ids: $inserted")
    assert(afterMerge.values.toSeq.distinct.size == 90,
      "no id is served twice after the MERGE")

    // copy-on-write DELETE (declared mode): survivors keep ids
    spark.sql("ALTER TABLE v3cat.ns.cw SET TBLPROPERTIES (" +
      "'write.delete.mode' = 'copy-on-write')")
    spark.sql("DELETE FROM v3cat.ns.cw WHERE k >= 20 AND k < 30")
    val afterDelete = lineage()
    assert(afterDelete.keySet == afterMerge.keySet -- (20L until 30L))
    assert(afterDelete.forall { case (k, id) => afterMerge(k) == id },
      s"CoW DELETE survivors keep ids: " +
        s"${afterDelete.filter { case (k, id) => afterMerge(k) != id }.take(5)}")
    // the counter is monotone: rewrites assign (unserved) ranges, never reuse
    val m = TableMetadata.load(s"$warehouse/ns/cw", conf)
    assert(m.nextRowId.exists(_ >= 90L), s"counter monotone: ${m.nextRowId}")
  }

  test("merge-on-read UPDATE and MERGE preserve _row_id (the reinserted " +
      "half carries it through the delta metadata projection)") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE v3cat.ns.mw (k BIGINT, v BIGINT)
        |TBLPROPERTIES ('format-version' = '3',
        |               'write.update.mode' = 'merge-on-read',
        |               'write.merge.mode' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO v3cat.ns.mw SELECT id, id * 10 FROM range(60)")
    def lineage(): Map[Long, Long] =
      spark.sql("SELECT k, _row_id FROM v3cat.ns.mw").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = lineage()
    assert(before.values.toSeq.sorted == (0L until 60L))
    // MoR UPDATE = position-delete + REINSERT: ids must survive the hop
    spark.sql("UPDATE v3cat.ns.mw SET v = v + 7 WHERE k % 5 = 0")
    val dir = s"$warehouse/ns/mw"
    assert(new IcebergTable(dir, conf).hasDeletes,
      "the UPDATE must stay merge-on-read (delete files outstanding)")
    val afterUpdate = lineage()
    assert(afterUpdate == before,
      s"MoR UPDATE must preserve every _row_id: " +
        s"${afterUpdate.filter { case (k, id) => before(k) != id }.take(5)}")
    assert(spark.sql(
      "SELECT CAST(SUM(v) AS BIGINT) FROM v3cat.ns.mw").head.getLong(0) ==
      (0L until 60L).map(k => k * 10 + (if (k % 5 == 0) 7 else 0)).sum)
    // MoR MERGE: matched rows preserve, NOT MATCHED inserts take fresh ids
    spark.sql("CREATE TABLE v3cat.ns.msrc (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO v3cat.ns.msrc SELECT id, id * 100 FROM range(50, 70)")
    spark.sql(
      """MERGE INTO v3cat.ns.mw t USING v3cat.ns.msrc s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val afterMerge = lineage()
    assert((0L until 60L).forall(k => afterMerge(k) == before(k)),
      s"MoR MERGE must preserve existing rows' _row_id: " +
        s"${(0L until 60L).filter(k => afterMerge(k) != before(k)).take(5)}")
    val inserted = (60L until 70L).map(afterMerge)
    assert(inserted.forall(_ >= 60L) && inserted.distinct.size == 10,
      s"MERGE-inserted rows take fresh non-overlapping ids: $inserted")
    assert(afterMerge.values.toSeq.distinct.size == 70,
      "no id is served twice after the MoR MERGE")
  }

  test("lifecycle ops on a v3 table: model-checked mixed sequence") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE v3cat.ns.f (k BIGINT, v BIGINT)
        |TBLPROPERTIES ('format-version' = '3',
        |               'write.delete.mode' = 'merge-on-read',
        |               'write.update.mode' = 'merge-on-read')""".stripMargin)
    val dir = s"$warehouse/ns/f"
    val model = scala.collection.mutable.Map.empty[Long, Long]
    def check(op: String): Unit = {
      val got = spark.sql("SELECT k, v FROM v3cat.ns.f ORDER BY k").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model.toMap, s"after $op: ${got.size} vs ${model.size}")
    }
    (0L until 40L).foreach(k => model(k) = k * 10)
    spark.sql("INSERT INTO v3cat.ns.f SELECT id, id * 10 FROM range(40)")
    check("insert")
    (10L until 15L).foreach(model.remove)
    spark.sql("DELETE FROM v3cat.ns.f WHERE k >= 10 AND k < 15") // DV path
    check("range delete")
    model.keys.filter(_ % 3 == 0).foreach(k => model(k) = model(k) + 1)
    spark.sql("UPDATE v3cat.ns.f SET v = v + 1 WHERE k % 3 = 0")
    check("update")
    IcebergWriter.compact(spark, dir)
    check("compact")
    Seq(2L, 4L).foreach(model.remove)
    spark.sql("DELETE FROM v3cat.ns.f WHERE k IN (2, 4)")
    check("equality delete")
    val m = TableMetadata.load(dir, conf)
    assert(m.formatVersion == 3 && m.nextRowId.exists(_ >= 40L))
    // every snapshot since the upgrade carries a first-row-id
    assert(m.snapshots.forall(_.firstRowId.nonEmpty),
      "every v3 commit assigns row lineage")
  }

  test("_last_updated_sequence_number: inherits per file, UPDATED rows " +
      "take the new commit's sequence, COPIED rows and compaction " +
      "preserve the old one (CoW and MoR)") {
    freshCatalog()
    spark.sql("""CREATE TABLE v3cat.ns.seq (k BIGINT, v STRING)
                 TBLPROPERTIES ('format-version' = '3')""")
    def seqs(): Map[Long, Long] = {
      val rows = spark.sql(
        "SELECT k, _last_updated_sequence_number FROM v3cat.ns.seq")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(rows.values.forall(_.nonEmpty),
        s"null _last_updated_sequence_number: $rows")
      rows.map { case (k, v) => k -> v.get }
    }
    spark.sql("INSERT INTO v3cat.ns.seq SELECT id, 'a' FROM range(0, 4)")
    spark.sql("INSERT INTO v3cat.ns.seq SELECT id, 'b' FROM range(10, 14)")
    val s0 = seqs()
    val (seqA, seqB) = (s0(0L), s0(10L))
    assert(seqB > seqA, s"second commit must carry a later sequence: $s0")
    assert((0L until 4L).forall(k => s0(k) == seqA) &&
      (10L until 14L).forall(k => s0(k) == seqB),
      s"inheritance serves the file's data sequence: $s0")
    // copy-on-write UPDATE of ONE row: it takes the new sequence, the
    // same file's COPIED rows keep the old one (materialized into the
    // replacement file — its own data sequence is the new commit's)
    spark.sql("UPDATE v3cat.ns.seq SET v = 'hit' WHERE k = 1")
    val s1 = seqs()
    assert(s1(1L) > seqB, s"updated row must take the updating sequence: $s1")
    assert(s1(0L) == seqA && s1(2L) == seqA && s1(3L) == seqA,
      s"copied rows must preserve their old sequence: $s1")
    assert(s1(10L) == seqB, s"untouched files unchanged: $s1")
    // compaction: pure data movement — every value preserved
    graft.iceberg.IcebergWriter.compact(spark, s"$warehouse/ns/seq")
    assert(seqs() == s1, "compaction must not move any row's sequence")
    // merge-on-read UPDATE: the reinserted row takes the new sequence
    spark.sql("""ALTER TABLE v3cat.ns.seq SET TBLPROPERTIES
                 ('write.update.mode' = 'merge-on-read')""")
    spark.sql("UPDATE v3cat.ns.seq SET v = 'mor' WHERE k = 12")
    val s2 = seqs()
    assert(s2(12L) > s1(12L),
      s"merge-on-read updated row must take the new sequence: $s2")
    assert(s2 - 12L == s1 - 12L, s"every other row unchanged: $s2 vs $s1")
    // pre-v3 history: an upgraded table's pre-upgrade files serve null
    spark.sql("CREATE TABLE v3cat.ns.up (k BIGINT)")
    spark.sql("INSERT INTO v3cat.ns.up VALUES (1)")
    spark.sql(
      "ALTER TABLE v3cat.ns.up SET TBLPROPERTIES ('format-version' = '3')")
    spark.sql("INSERT INTO v3cat.ns.up VALUES (2)")
    val up = spark.sql(
      "SELECT k, _last_updated_sequence_number FROM v3cat.ns.up")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(up(1L).isEmpty && up(2L).nonEmpty,
      s"pre-upgrade files serve null lineage, post-upgrade inherit: $up")
  }
}
