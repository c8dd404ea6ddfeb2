package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.iceberg.TableMetadata
import graft.iceberg.connector.GraftCatalog

/** Iceberg v3 `variant` + `unknown` types end-to-end through the catalog:
  * Spark 4's native VariantType maps to the spec's `variant` (stored as
  * the Parquet VARIANT annotated group both engines share), NullType
  * (VOID) maps to `unknown` (always null, never stored in data files).
  * Both are v3-gated: they must never transit v2 metadata.
  */
class VariantSpec extends SparkSpec {

  private val wh = new java.io.File("target/variant-warehouse").getAbsolutePath

  private def freshCatalog(name: String): Unit = {
    new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new Path(wh), true)
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
  }

  test("variant round-trips through a v3 table: typed paths, mixed shapes") {
    freshCatalog("var1")
    spark.sql("""CREATE TABLE var1.ns.t (k BIGINT, v VARIANT)
                 TBLPROPERTIES ('format-version' = '3')""")
    spark.sql("""INSERT INTO var1.ns.t SELECT * FROM VALUES
      (1L, parse_json('{"a": 1, "b": "x", "nested": {"c": [10, 20, 30]}}')),
      (2L, parse_json('{"a": 2, "b": "y", "d": 2.5}')),
      (3L, parse_json('42')),
      (4L, parse_json('null')),
      (5L, CAST(NULL AS VARIANT))""")
    val got = spark.sql("""
      SELECT k,
             variant_get(v, '$.a', 'bigint')   AS a,
             variant_get(v, '$.b', 'string')   AS b,
             variant_get(v, '$.nested.c[1]', 'bigint') AS c1,
             variant_get(v, '$.d', 'double')   AS d,
             try_variant_get(v, '$', 'bigint') AS scalar,
             is_variant_null(v)                AS vnull
      FROM var1.ns.t ORDER BY k""").collect()
    assert(got.map(r => (r.getLong(0),
      Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
      Option(r.get(4)), Option(r.get(5)))).toSeq == Seq(
      (1L, Some(1L), Some("x"), Some(20L), None, None),
      (2L, Some(2L), Some("y"), None, Some(2.5), None),
      (3L, None, None, None, None, Some(42L)),
      (4L, None, None, None, None, None),
      (5L, None, None, None, None, None)))
    // is_variant_null: JSON null (k=4) is true; SQL NULL (k=5) is null-ish false
    assert(got.find(_.getLong(0) == 4L).get.getBoolean(6))
    // the table schema survives a catalog reload as variant
    assert(spark.table("var1.ns.t").schema("v").dataType == VariantType)
  }

  test("variant columns need format-version 3 at birth and at ADD COLUMN") {
    freshCatalog("var2")
    val e1 = intercept[UnsupportedOperationException] {
      spark.sql("CREATE TABLE var2.ns.bad (k BIGINT, v VARIANT)")
    }
    assert(e1.getMessage.contains("format-version"))
    spark.sql("CREATE TABLE var2.ns.t2 (k BIGINT)")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE var2.ns.t2 ADD COLUMN v VARIANT")
    }
    assert(e2.getMessage.contains("format-version 3"))
    // a v3-born table takes the ADD, old rows read NULL variant
    spark.sql("""CREATE TABLE var2.ns.t3 (k BIGINT)
                 TBLPROPERTIES ('format-version' = '3')""")
    spark.sql("INSERT INTO var2.ns.t3 VALUES (1)")
    spark.sql("ALTER TABLE var2.ns.t3 ADD COLUMN v VARIANT")
    spark.sql("INSERT INTO var2.ns.t3 SELECT 2L, parse_json('{\"z\": 9}')")
    val rows = spark.sql(
      """SELECT k, variant_get(v, '$.z', 'bigint') FROM var2.ns.t3
         ORDER BY k""").collect()
    assert(rows.map(r => (r.getLong(0), Option(r.get(1)))).toSeq ==
      Seq((1L, None), (2L, Some(9L))))
  }

  test("merge-on-read DELETE and CoW UPDATE preserve variant payloads") {
    freshCatalog("var3")
    spark.sql("""CREATE TABLE var3.ns.t (k BIGINT, tag STRING, v VARIANT)
                 TBLPROPERTIES ('format-version' = '3',
                                'write.delete.mode' = 'merge-on-read',
                                'write.update.mode' = 'merge-on-read')""")
    spark.sql("""INSERT INTO var3.ns.t
      SELECT id, concat('t', id % 2),
             parse_json(concat('{"n": ', id, ', "s": "row', id, '"}'))
      FROM range(0, 10)""")
    spark.sql("DELETE FROM var3.ns.t WHERE k % 3 = 0") // position deletes
    val afterDelete = spark.sql(
      """SELECT k, variant_get(v, '$.n', 'bigint') FROM var3.ns.t
         ORDER BY k""").collect()
    assert(afterDelete.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (0L until 10L).filter(_ % 3 != 0).map(i => (i, i)))
    // merge-on-read UPDATE: the delta writer streams variant inserts
    spark.sql("UPDATE var3.ns.t SET tag = 'hit' WHERE k = 4")
    val after = spark.sql(
      """SELECT k, tag, variant_get(v, '$.s', 'string') FROM var3.ns.t
         WHERE k IN (4, 5) ORDER BY k""").collect()
    assert(after.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((4L, "hit", "row4"), (5L, "t1", "row5")))
    // copy-on-write UPDATE (clean table): group rewrite carries variant
    spark.sql("""CREATE TABLE var3.ns.cow (k BIGINT, tag STRING, v VARIANT)
                 TBLPROPERTIES ('format-version' = '3')""")
    spark.sql("""INSERT INTO var3.ns.cow
      SELECT id, 'x', parse_json(concat('{"s": "row', id, '"}'))
      FROM range(0, 4)""")
    spark.sql("UPDATE var3.ns.cow SET tag = 'hit' WHERE k = 2")
    val cow = spark.sql(
      """SELECT k, tag, variant_get(v, '$.s', 'string') FROM var3.ns.cow
         ORDER BY k""").collect()
    assert(cow.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      (0L until 4L).map(i => (i, if (i == 2) "hit" else "x", s"row$i")))
  }

  test("partitioned variant table: scans group-prune, variant rides along") {
    freshCatalog("var4")
    spark.sql("""CREATE TABLE var4.ns.t (k BIGINT, part STRING, v VARIANT)
                 PARTITIONED BY (part)
                 TBLPROPERTIES ('format-version' = '3')""")
    spark.sql("""INSERT INTO var4.ns.t
      SELECT id, IF(id % 2 = 0, 'even', 'odd'),
             parse_json(concat('{"n": ', id, '}'))
      FROM range(0, 8)""")
    val evens = spark.sql(
      """SELECT CAST(SUM(variant_get(v, '$.n', 'bigint')) AS BIGINT)
         FROM var4.ns.t WHERE part = 'even'""").collect()(0).getLong(0)
    assert(evens == (0L until 8L).filter(_ % 2 == 0).sum)
    // a variant column can never be a partition source (the shared
    // transform/type table refuses it at CREATE, like ADD PARTITION
    // FIELD does)
    val e = intercept[IllegalArgumentException] {
      spark.sql("""CREATE TABLE var4.ns.bad (k BIGINT, v VARIANT)
                   PARTITIONED BY (v)
                   TBLPROPERTIES ('format-version' = '3')""")
    }
    assert(e.getMessage.contains("cannot partition"))
  }

  test("variant refusals: identifier fields, sort order, ORC, defaults") {
    freshCatalog("var5")
    spark.sql("""CREATE TABLE var5.ns.t (k BIGINT NOT NULL, v VARIANT NOT NULL)
                 TBLPROPERTIES ('format-version' = '3')""")
    val eId = intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE var5.ns.t SET IDENTIFIER FIELDS v")
    }
    assert(eId.getMessage.contains("variant"))
    val eSort = intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE var5.ns.t WRITE ORDERED BY (v)")
    }
    assert(eSort.getMessage.contains("VARIANT"))
    val eOrcFlip = intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE var5.ns.t SET TBLPROPERTIES " +
        "('write.format-default' = 'orc')")
    }
    assert(eOrcFlip.getMessage.contains("orc"))
    val eOrcBorn = intercept[UnsupportedOperationException] {
      spark.sql("""CREATE TABLE var5.ns.orct (k BIGINT, v VARIANT)
                   TBLPROPERTIES ('format-version' = '3',
                                  'write.format-default' = 'orc')""")
    }
    assert(eOrcBorn.getMessage.contains("orc"))
  }

  test("unknown (VOID) column: v3-gated, never stored in data files, reads null") {
    freshCatalog("var6")
    val e = intercept[UnsupportedOperationException] {
      spark.sql("CREATE TABLE var6.ns.bad AS SELECT id, NULL AS u FROM range(3)")
    }
    assert(e.getMessage.contains("format-version"))
    spark.sql("""CREATE TABLE var6.ns.t TBLPROPERTIES ('format-version' = '3')
                 AS SELECT id AS k, NULL AS u FROM range(0, 5)""")
    assert(spark.table("var6.ns.t").schema("u").dataType == NullType)
    assert(spark.sql("SELECT COUNT(*) FROM var6.ns.t WHERE u IS NULL")
      .collect()(0).getLong(0) == 5)
    // spec rule: the unknown column is ABSENT from every data file
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
    // walk the whole table dir: a staged CTAS (r19 StagingTableCatalog)
    // lands its data files under _staged/<uuid>/data
    val files = walk(new java.io.File(s"$wh/ns/t"))
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new Path(f.toString), spark.sessionState.newHadoopConf()))
      try assert(!footer.getFooter.getFileMetaData.getSchema.getFields
        .toString.contains(" u"))
      finally footer.close()
    }
  }

  test("CDC over variant tables: the changes stream replicates through " +
      "the to_json carryover proxy; content-comparing ops refuse loudly") {
    freshCatalog("var7")
    val ckpt = new java.io.File("target/variant-ckpt").getAbsolutePath
    new Path(ckpt).getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new Path(ckpt), true)
    spark.sql("""CREATE TABLE var7.ns.src (k BIGINT NOT NULL, v VARIANT)
                 TBLPROPERTIES ('format-version' = '3',
                                'write.delete.mode' = 'merge-on-read')""")
    spark.sql("ALTER TABLE var7.ns.src SET IDENTIFIER FIELDS k")
    spark.sql("""CREATE TABLE var7.ns.dst (k BIGINT NOT NULL, v VARIANT)
                 TBLPROPERTIES ('format-version' = '3')""")
    spark.sql("ALTER TABLE var7.ns.dst SET IDENTIFIER FIELDS k")
    spark.sql("""INSERT INTO var7.ns.src
      SELECT id, parse_json(concat('{"n": ', id, '}')) FROM range(0, 8)""")
    // copy-on-write UPDATE: the rewritten file's untouched rows become
    // carryovers the sink must drop THROUGH the to_json proxy (variant
    // columns cannot be grouping keys)
    spark.sql("""UPDATE var7.ns.src SET v = parse_json('{"n": -2}')
                 WHERE k = 2""")
    spark.sql("DELETE FROM var7.ns.src WHERE k = 5")
    val q = graft.streaming.EventStream.icebergReplicaSink(
        spark.readStream.option("maxSnapshotsPerTrigger", "1")
          .table("var7.ns.src.changes"),
        "var7.ns.dst")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val got = spark.sql(
      """SELECT k, variant_get(v, '$.n', 'bigint') AS n FROM var7.ns.dst
         ORDER BY k""").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq ==
      (0L until 8L).filter(_ != 5L).map(i => (i, if (i == 2) -2L else i)))
    // full-row content comparison has no variant equality — loud refusal
    val dir = s"$wh/ns/src"
    val conf = spark.sessionState.newHadoopConf()
    val t = new graft.iceberg.IcebergTable(dir, conf)
    val snaps = t.metadata.snapshots.map(_.snapshotId)
    val eUpd = intercept[IllegalArgumentException] {
      t.changesWithUpdates(spark, 0L, snaps.last)
    }
    assert(eUpd.getMessage.contains("variant"))
    val eNet = intercept[IllegalArgumentException] {
      t.netChangesBetween(spark, 0L, snaps.last)
    }
    assert(eNet.getMessage.contains("variant"))
  }

  test("variant columns emit no manifest bounds; sibling-column pruning " +
      "still planned (100 TB soundness: no megabyte bounds, no lost skips)") {
    freshCatalog("var8")
    spark.sql("""CREATE TABLE var8.ns.t (k BIGINT, v VARIANT)
                 TBLPROPERTIES ('format-version' = '3')""")
    // two disjoint-k files (separate INSERTs → separate snapshots/files)
    spark.sql("""INSERT INTO var8.ns.t
      SELECT id, parse_json(concat('{"n": ', id, '}')) FROM range(0, 100)""")
    spark.sql("""INSERT INTO var8.ns.t
      SELECT id, parse_json(concat('{"n": ', id, '}'))
      FROM range(1000, 1100)""")
    val t = new graft.iceberg.IcebergTable(
      s"$wh/ns/t", spark.sessionState.newHadoopConf())
    val vId = t.metadata.fieldIds("v")
    val kId = t.metadata.fieldIds("k")
    t.planFiles().foreach { f =>
      assert(!f.lowerBounds.contains(vId) && !f.upperBounds.contains(vId),
        s"variant column must carry no bounds: ${f.filePath}")
      assert(f.lowerBounds.contains(kId),
        "sibling scalar columns keep their bounds")
    }
    // k-pruning still skips every file of the first (k < 100) insert
    import org.apache.spark.sql.sources.GreaterThan
    val all = t.planFiles()
    val planned = t.planFiles(Seq(GreaterThan("k", 500L)))
    assert(planned.map(_.recordCount).sum == 100L && planned.size < all.size,
      s"bounds on k must prune the first insert's files: " +
        s"${planned.size}/${all.size} planned, " +
        s"${planned.map(_.recordCount).sum} rows")
  }

  test("timestamp_ns metadata refuses loudly, naming the migration path") {
    val json = """{
      "format-version": 3, "table-uuid": "00000000-0000-0000-0000-000000000001",
      "location": "file:///tmp/nst", "last-updated-ms": 0, "last-column-id": 2,
      "schema": {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "k", "required": false, "type": "long"},
        {"id": 2, "name": "ts", "required": false, "type": "timestamp_ns"}]},
      "current-schema-id": 0,
      "schemas": [{"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "k", "required": false, "type": "long"},
        {"id": 2, "name": "ts", "required": false, "type": "timestamp_ns"}]}],
      "partition-specs": [{"spec-id": 0, "fields": []}], "default-spec-id": 0,
      "sort-orders": [], "default-sort-order-id": 0,
      "snapshots": [], "properties": {}
    }"""
    val e = intercept[UnsupportedOperationException] {
      TableMetadata.fromJson(json)
    }
    assert(e.getMessage.contains("nanosecond") &&
      e.getMessage.contains("microseconds"))
    // geometry/geography READ as WKB binary since r17 (refuse-only
    // before): the parse serves BinaryType with the spatial type kept on
    // the field — writes and pruning key off it (FormatV3Spec gates the
    // full surface)
    val geo = TableMetadata.fromJson(json.replace("timestamp_ns", "geometry"))
    assert(geo.schema("ts").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(geo.schema("ts").metadata
      .getString(TableMetadata.GeoTypeKey) == "geometry")
    assert(geo.geoFieldIds == Set(2))
  }
}
