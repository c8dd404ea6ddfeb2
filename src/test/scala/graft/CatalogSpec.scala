package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, ViewCatalog, ViewInfo}
import org.apache.spark.sql.types._

import graft.iceberg.connector.GraftCatalog

/** Catalog-plugin gates (SURVEY §2.A A13–A17 + A11 + A12): 3-part name
  * resolution over the fixture warehouse (parity with the reference's
  * `test_catalog` shape, `catalog.rs:83-135`, filesystem-backed), CBO
  * statistics driving broadcast, create/drop round-trip, and views that
  * survive a session boundary.
  */
class CatalogSpec extends SparkSpec {

  val fixtureWarehouse = "/root/reference/datafusion_iceberg/tests/home/iceberg/warehouse"
  val scratch = "/root/repo/target/test-warehouse"

  private def useCatalogs(): Unit = {
    spark.conf.set("spark.sql.catalog.lakehouse", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakehouse.warehouse", fixtureWarehouse)
    spark.conf.set("spark.sql.catalog.scratch", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.scratch.warehouse", scratch)
  }

  test("catalog resolves lakehouse.nyc.taxis: COUNT(*) = 4") {
    useCatalogs()
    val n = spark.sql("SELECT COUNT(*) AS n FROM lakehouse.nyc.taxis").collect()(0).getLong(0)
    assert(n == 4L)
  }

  test("catalog-qualified aggregate matches reference expectation") {
    useCatalogs()
    val rows = spark.sql(
      """SELECT vendor_id, MIN(trip_distance) AS m FROM lakehouse.nyc.taxis
        |GROUP BY vendor_id ORDER BY vendor_id""".stripMargin).collect()
    val byVendor = rows.map(r => r.getLong(0) -> r.getFloat(1)).toMap
    assert(math.abs(byVendor(1L) - 1.8f) < 0.001 && math.abs(byVendor(2L) - 0.9f) < 0.001)
  }

  test("namespace and table listing") {
    useCatalogs()
    val ns = spark.sql("SHOW NAMESPACES IN lakehouse").collect().map(_.getString(0))
    assert(ns.contains("nyc"))
    val tbls = spark.sql("SHOW TABLES IN lakehouse.nyc").collect().map(_.getString(1))
    assert(tbls.contains("taxis"))
  }

  test("reported statistics make the 6 KB table the broadcast side (A11)") {
    useCatalogs()
    import spark.implicits._
    // no broadcast() hint anywhere: the decision must come from
    // SupportsReportStatistics (sizeInBytes ~6001 << 10 MB threshold)
    (1L to 10000L).map(i => (i % 2 + 1, i)).toDF("vendor_id", "x")
      .createOrReplaceTempView("probe_big")
    val joined = spark.sql(
      """SELECT p.x, t.trip_distance FROM probe_big p
        |JOIN lakehouse.nyc.taxis t ON p.vendor_id = t.vendor_id""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$plan")
    assert(joined.count() == 20000L)
  }

  test("filter pushdown prunes files before the scan (pushed filters visible)") {
    useCatalogs()
    val df = spark.sql(
      "SELECT trip_id FROM lakehouse.nyc.taxis WHERE vendor_id = 1 AND trip_distance > 5.0")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1000374L)) // the 8.4-distance trip
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("GraftIcebergScan(files=1,"),
      s"pruning should leave exactly 1 of 4 files:\n$scanDesc")
  }

  test("create / load / drop table round-trip (A16/A17)") {
    useCatalogs()
    spark.sql("DROP TABLE IF EXISTS scratch.ns1.t1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.ns1")
    spark.sql(
      """CREATE TABLE scratch.ns1.t1 (id BIGINT, name STRING, score DOUBLE)
        |PARTITIONED BY (id)""".stripMargin)
    assert(spark.sql("SHOW TABLES IN scratch.ns1").collect().map(_.getString(1)).contains("t1"))
    val schema = spark.table("scratch.ns1.t1").schema
    assert(schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns1.t1").collect()(0).getLong(0) == 0L)
    spark.sql("DROP TABLE scratch.ns1.t1")
    assert(!spark.sql("SHOW TABLES IN scratch.ns1").collect().map(_.getString(1)).contains("t1"))
  }

  test("SQL INSERT INTO appends a snapshot; INSERT OVERWRITE truncates") {
    useCatalogs()
    spark.sql("DROP TABLE IF EXISTS scratch.ns1.w1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.ns1")
    spark.sql("CREATE TABLE scratch.ns1.w1 (id BIGINT, name STRING)")
    spark.sql("INSERT INTO scratch.ns1.w1 VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns1.w1")
      .collect()(0).getLong(0) == 2L)
    spark.sql("INSERT INTO scratch.ns1.w1 SELECT id + 10, upper(name) FROM scratch.ns1.w1")
    assert(spark.sql("SELECT id FROM scratch.ns1.w1 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 11L, 12L))
    // each INSERT committed a snapshot; time travel sees the first alone
    spark.sql("INSERT OVERWRITE scratch.ns1.w1 VALUES (99, 'z')")
    assert(spark.sql("SELECT id, name FROM scratch.ns1.w1")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((99L, "z")))
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns1.w1 VERSION AS OF 1")
      .collect()(0).getLong(0) == 2L)
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns1.w1 VERSION AS OF 2")
      .collect()(0).getLong(0) == 4L)
    // dataframe API rides the same path
    spark.range(3).selectExpr("id + 100 AS id", "'df' AS name")
      .writeTo("scratch.ns1.w1").append()
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns1.w1")
      .collect()(0).getLong(0) == 4L)
    spark.sql("DROP TABLE scratch.ns1.w1")
  }

  test("snapshot summaries carry spec totals equal to manifest sums") {
    useCatalogs()
    def checkTotals(): Unit = {
      val t = new graft.iceberg.IcebergTable(s"$scratch/ns1/tot",
        spark.sessionState.newHadoopConf())
      val files = t.planFiles()
      val s = t.metadata.currentSnapshot.get.summary
      assert(s("total-records").toLong == files.map(_.recordCount).sum,
        s"total-records: $s vs ${files.map(_.recordCount).sum}")
      assert(s("total-files-size").toLong == files.map(_.fileSizeInBytes).sum)
      assert(s("total-data-files").toLong == files.size)
    }
    spark.sql("DROP TABLE IF EXISTS scratch.ns1.tot")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.ns1")
    spark.sql("CREATE TABLE scratch.ns1.tot (id BIGINT, name STRING)")
    spark.sql("INSERT INTO scratch.ns1.tot VALUES (1, 'a'), (2, 'b')")
    checkTotals()
    spark.sql("INSERT INTO scratch.ns1.tot VALUES (3, 'c')")
    checkTotals()
    // row-level rewrite (copy-on-write file swap): totals updated
    // (before the equality delete — outstanding v2 deletes refuse rewrites)
    spark.sql("UPDATE scratch.ns1.tot SET name = 'x' WHERE id >= 3")
    checkTotals()
    // equality delete: data files untouched, totals carry over
    spark.sql("DELETE FROM scratch.ns1.tot WHERE id = 2")
    checkTotals()
    spark.sql("INSERT OVERWRITE scratch.ns1.tot VALUES (9, 'z')")
    checkTotals()
    spark.sql("DROP TABLE scratch.ns1.tot")
  }

  test("SQL DELETE commits an equality-delete snapshot (merge-on-read)") {
    useCatalogs()
    spark.sql("DROP TABLE IF EXISTS scratch.ns1.d1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.ns1")
    spark.sql("CREATE TABLE scratch.ns1.d1 (id BIGINT, name STRING)")
    spark.sql("INSERT INTO scratch.ns1.d1 VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    spark.sql("DELETE FROM scratch.ns1.d1 WHERE id = 2 OR id = 4")
    assert(spark.sql("SELECT id FROM scratch.ns1.d1 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // merge-on-read: the data snapshot is untouched; time travel sees all 4
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns1.d1 VERSION AS OF 1")
      .collect()(0).getLong(0) == 4L)
    // sequence gating: re-inserting a deleted key survives the old delete
    spark.sql("INSERT INTO scratch.ns1.d1 VALUES (2, 'b2')")
    assert(spark.sql("SELECT name FROM scratch.ns1.d1 WHERE id = 2")
      .collect().map(_.getString(0)).toSeq == Seq("b2"))
    // multi-column AND + IN forms
    spark.sql("DELETE FROM scratch.ns1.d1 WHERE id IN (1, 3) AND name = 'c'")
    assert(spark.sql("SELECT id FROM scratch.ns1.d1 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // non-equality predicates take the POSITION-delete path (no data
    // rewrite, composes with the outstanding equality deletes)
    spark.sql("DELETE FROM scratch.ns1.d1 WHERE id > 1")
    assert(spark.sql("SELECT id FROM scratch.ns1.d1 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // unqualified DELETE truncates
    spark.sql("DELETE FROM scratch.ns1.d1")
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns1.d1")
      .collect()(0).getLong(0) == 0L)
    spark.sql("DROP TABLE scratch.ns1.d1")
  }

  test("metadata tables: snapshots / files / manifests resolve in SQL") {
    useCatalogs()
    spark.sql("DROP TABLE IF EXISTS scratch.ns1.m1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.ns1")
    spark.sql("CREATE TABLE scratch.ns1.m1 (id BIGINT)")
    spark.sql("INSERT INTO scratch.ns1.m1 VALUES (1), (2)")
    spark.sql("INSERT INTO scratch.ns1.m1 VALUES (3)")
    val snaps = spark.sql(
      "SELECT snapshot_id, is_current FROM scratch.ns1.m1.snapshots ORDER BY snapshot_id")
      .collect()
    assert(snaps.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(snaps.map(_.getBoolean(1)).toSeq == Seq(false, true))
    assert(spark.sql("SELECT SUM(record_count) FROM scratch.ns1.m1.files")
      .collect()(0).getLong(0) == 3L)
    val mans = spark.sql(
      "SELECT content, sequence_number FROM scratch.ns1.m1.manifests ORDER BY sequence_number")
      .collect()
    assert(mans.length == 2 && mans.forall(_.getInt(0) == 0))
    assert(mans.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    // metadata freshness: a new snapshot shows up without re-resolving
    spark.sql("INSERT INTO scratch.ns1.m1 VALUES (4)")
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns1.m1.snapshots")
      .collect()(0).getLong(0) == 3L)
    spark.sql("DROP TABLE scratch.ns1.m1")
  }

  test("metadata tables: refs / history / partitions / delete_files") {
    useCatalogs()
    spark.sql("DROP TABLE IF EXISTS scratch.ns1.m2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.ns1")
    spark.sql("CREATE TABLE scratch.ns1.m2 (id BIGINT, part BIGINT) " +
      "PARTITIONED BY (part)")
    spark.sql("INSERT INTO scratch.ns1.m2 SELECT id, id % 2 FROM range(10)")
    spark.sql("ALTER TABLE scratch.ns1.m2 CREATE BRANCH audit")
    spark.sql("ALTER TABLE scratch.ns1.m2 CREATE TAG v1")

    val refs = spark.sql(
      "SELECT name, type FROM scratch.ns1.m2.refs ORDER BY name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toSeq
    assert(refs === Seq("audit" -> "BRANCH", "main" -> "BRANCH", "v1" -> "TAG"))

    val hist = spark.sql(
      "SELECT snapshot_id, is_current_ancestor FROM scratch.ns1.m2.history")
      .collect()
    assert(hist.length === 1 && hist.head.getBoolean(1))

    val parts = spark.sql(
      "SELECT partition, file_count, record_count FROM scratch.ns1.m2.partitions " +
        "ORDER BY partition").collect()
    assert(parts.map(_.getString(0)).toSeq === Seq("part=0", "part=1"))
    assert(parts.map(_.getLong(2)).sum === 10L)

    spark.sql("DELETE FROM scratch.ns1.m2 WHERE id IN (1, 3)") // equality delete
    val dels = spark.sql(
      "SELECT content, record_count FROM scratch.ns1.m2.delete_files").collect()
    assert(dels.length === 1 && dels.head.getString(0) === "EQUALITY_DELETES")
    assert(dels.head.getLong(1) === 2L)

    // partitions table, FRESH after the delete commit: data aggregates
    // must equal a files-table GROUP BY, and the new delete debt must be
    // attributed with matching totals
    val pAfter = spark.sql(
      """SELECT partition, file_count, record_count, total_size_in_bytes,
        |       position_delete_file_count, position_delete_record_count,
        |       equality_delete_file_count, equality_delete_record_count
        |FROM scratch.ns1.m2.partitions""".stripMargin).collect()
    val fAgg = spark.sql(
      """SELECT partition, COUNT(*) AS n,
        |       CAST(SUM(record_count) AS BIGINT) AS rc,
        |       CAST(SUM(file_size_in_bytes) AS BIGINT) AS sz
        |FROM scratch.ns1.m2.files GROUP BY partition""".stripMargin).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    pAfter.filter(_.getLong(1) > 0).foreach { r =>
      val (n, rc, sz) = fAgg(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == rc && r.getLong(3) == sz,
        s"partitions row diverges from files aggregation: $r vs ${fAgg(r.getString(0))}")
    }
    assert(pAfter.map(_.getLong(6)).sum == 1L &&
      pAfter.map(_.getLong(7)).sum == 2L,
      s"equality delete debt must be attributed: ${pAfter.toSeq}")
    assert(pAfter.map(_.getLong(4)).sum == 0L &&
      pAfter.map(_.getLong(5)).sum == 0L)

    // v3 deletion-vector debt attributes to the REFERENCED data file's
    // partition (each DV targets exactly one file) — the native MoR
    // shape where per-partition attribution is exact
    spark.sql("DROP TABLE IF EXISTS scratch.ns1.m2dv")
    spark.sql("CREATE TABLE scratch.ns1.m2dv (id BIGINT, part BIGINT) " +
      "PARTITIONED BY (part) TBLPROPERTIES ('format-version' = '3', " +
      "'write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO scratch.ns1.m2dv SELECT id, id % 2 FROM range(10)")
    spark.sql("DELETE FROM scratch.ns1.m2dv WHERE id >= 6 AND id % 2 = 0")
    val dvParts = spark.sql(
      """SELECT partition, position_delete_record_count
        |FROM scratch.ns1.m2dv.`partitions` ORDER BY partition""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(dvParts == Seq(("part=0", 2L), ("part=1", 0L)),
      s"DV debt must land on the referenced file's partition: $dvParts")
    spark.sql("DROP TABLE scratch.ns1.m2dv")

    // freshness across partition EVOLUTION: rows written under the new
    // spec surface under their own spec_id, old rows keep theirs
    spark.sql("ALTER TABLE scratch.ns1.m2 ADD PARTITION FIELD bucket(2, id)")
    spark.sql("INSERT INTO scratch.ns1.m2 SELECT id, id % 2 FROM range(10, 14)")
    val specs = spark.sql(
      """SELECT spec_id, CAST(SUM(record_count) AS BIGINT) AS rc
        |FROM scratch.ns1.m2.partitions GROUP BY spec_id ORDER BY spec_id"""
        .stripMargin).collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(specs == Seq((0, 10L), (1, 4L)),
      s"per-spec partition rollup wrong: $specs")
    spark.sql("DROP TABLE scratch.ns1.m2")
  }

  test("metadata tables: entries / all_files / all_manifests / " +
      "metadata_log_entries / position_deletes") {
    useCatalogs()
    spark.sql("DROP TABLE IF EXISTS scratch.ns1.m3")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.ns1")
    spark.sql("CREATE TABLE scratch.ns1.m3 (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO scratch.ns1.m3 SELECT id, concat('v', id) FROM range(10)")
    spark.sql("INSERT INTO scratch.ns1.m3 SELECT id, concat('v', id) FROM range(10, 20)")
    // a position-delete MoR DELETE (range predicate → not equality)
    spark.sql("DELETE FROM scratch.ns1.m3 WHERE id >= 18 AND id < 20")

    // entries: every manifest entry of the current snapshot, all statuses
    val liveFiles = spark.sql("SELECT COUNT(*) FROM scratch.ns1.m3.files")
      .collect()(0).getLong(0)
    val entries = spark.sql(
      """SELECT status, content, record_count
        |FROM scratch.ns1.m3.entries ORDER BY content, record_count""".stripMargin)
      .collect()
    assert(entries.count(_.getInt(1) == 0) == liveFiles,
      "one entry per live data file")
    assert(entries.count(_.getInt(1) == 1) == 1, "one position-delete entry")
    assert(entries.map(_.getLong(2)).sum == 22L, "10 + 10 data rows + 2 delete rows")

    // all_manifests: one row per (manifest, referencing snapshot)
    val am = spark.sql(
      """SELECT reference_snapshot_id, COUNT(*) AS n
        |FROM scratch.ns1.m3.all_manifests
        |GROUP BY reference_snapshot_id ORDER BY reference_snapshot_id""".stripMargin)
      .collect()
    assert(am.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 2L), (3L, 3L)),
      s"snapshot N must reference N manifests, got ${am.mkString(",")}")

    // all_files: distinct live files across every snapshot — data AND
    // delete files (both are what external cleanup must never touch)
    val af = spark.sql(
      """SELECT COUNT(*) AS n, SUM(record_count) AS r
        |FROM scratch.ns1.m3.all_files WHERE content = 0""".stripMargin)
      .collect()(0)
    assert(af.getLong(0) == liveFiles && af.getLong(1) == 20L)
    val afDel = spark.sql(
      """SELECT COUNT(*) AS n FROM scratch.ns1.m3.all_files
        |WHERE content = 1""".stripMargin).collect()(0)
    assert(afDel.getLong(0) == 1L, "the position-delete file must be listed")

    // metadata_log_entries: the vN.metadata.json trail, in version order
    val ml = spark.sql(
      "SELECT version FROM scratch.ns1.m3.metadata_log_entries ORDER BY version")
      .collect().map(_.getInt(0)).toSeq
    assert(ml.nonEmpty && ml == ml.sorted && ml.length >= 4,
      s"create + 2 inserts + delete must leave >= 4 metadata versions, got $ml")

    // position_deletes: the expanded delete tuples (distributed read)
    val pd = spark.sql(
      "SELECT pos FROM scratch.ns1.m3.position_deletes ORDER BY pos").collect()
    assert(pd.length == 2, s"two deleted positions, got ${pd.length}")

    // upstream-parity names: data_files ≡ files; all_data_files /
    // all_delete_files ≡ the content slices of all_files; all_entries
    // covers every distinct manifest across snapshots (≥ head's entries)
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns1.m3.data_files")
      .collect()(0).getLong(0) == liveFiles)
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns1.m3.all_data_files")
      .collect()(0).getLong(0) == af.getLong(0))
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns1.m3.all_delete_files")
      .collect()(0).getLong(0) == 1L)
    val allE = spark.sql(
      "SELECT COUNT(*) FROM scratch.ns1.m3.all_entries").collect()(0).getLong(0)
    assert(allE >= entries.length,
      s"all_entries ($allE) must cover at least head's entries (${entries.length})")
    spark.sql("DROP TABLE scratch.ns1.m3")
  }

  test("time-travel-pinned tables refuse writes") {
    useCatalogs()
    spark.sql("DROP TABLE IF EXISTS scratch.ns1.w2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.ns1")
    spark.sql("CREATE TABLE scratch.ns1.w2 (id BIGINT)")
    spark.sql("INSERT INTO scratch.ns1.w2 VALUES (1)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO scratch.ns1.w2 VERSION AS OF 1 VALUES (2)")
    }
    assert(e.getMessage != null)
    spark.sql("DROP TABLE scratch.ns1.w2")
  }

  test("legacy .view.json views are still readable (up-converted)") {
    import graft.iceberg.connector.GraftCatalog
    useCatalogs()
    val dir = new java.io.File(s"$scratch/ns1/legacy_v/metadata")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.getParentFile)
    dir.mkdirs()
    val sparkSchema = StructType(Seq(
      StructField("r_regionkey", LongType), StructField("r_name", StringType)))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/v1.view.json"),
      s"""{"format-version": 1,
         |"sql": "SELECT 1 AS r_regionkey, 'x' AS r_name",
         |"current-catalog": "scratch", "current-namespace": [],
         |"schema": ${com.fasterxml.jackson.databind.json.JsonMapper.builder()
             .build().writeValueAsString(sparkSchema.json)},
         |"query-column-names": ["r_regionkey", "r_name"]}""".stripMargin)
    val cat = spark.sessionState.catalogManager.catalog("scratch")
      .asInstanceOf[ViewCatalog]
    val ident = Identifier.of(Array("ns1"), "legacy_v")
    assert(cat.viewExists(ident))
    val v = cat.loadView(ident)
    assert(v.query.contains("SELECT 1"))
    assert(v.schema.fieldNames.toSeq == Seq("r_regionkey", "r_name"))
    val row = spark.sql("SELECT * FROM scratch.ns1.legacy_v").collect()(0)
    assert(row.getLong(0) == 1L && row.getString(1) == "x")
  }

  test("persistent view survives a new session (A12 full)") {
    useCatalogs()
    val cm = spark.sessionState.catalogManager
    val viewCat = cm.catalog("lakehouse").asInstanceOf[ViewCatalog]
    val ident = Identifier.of(Array("nyc"), "long_trips")
    if (viewCat.viewExists(ident)) viewCat.dropView(ident)
    // NOTE: the view metadata is written under the (read-only in CI
    // semantics, writable here) fixture warehouse only if permitted;
    // use the scratch warehouse instead to avoid writing into /root/reference.
    val scratchCat = cm.catalog("scratch").asInstanceOf[ViewCatalog]
    val sIdent = Identifier.of(Array("ns1"), "long_trips")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.ns1")
    if (scratchCat.viewExists(sIdent)) scratchCat.dropView(sIdent)
    val sql = "SELECT vendor_id, trip_distance FROM lakehouse.nyc.taxis WHERE trip_distance > 2.0"
    scratchCat.createView(new ViewInfo(
      sIdent, sql, "lakehouse", Array("nyc"),
      StructType(Seq(StructField("vendor_id", LongType), StructField("trip_distance", FloatType))),
      Array("vendor_id", "trip_distance"), Array.empty, Array.empty,
      new java.util.HashMap[String, String]()))

    // fresh session state: new catalog instances, nothing cached in-memory
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.lakehouse", classOf[GraftCatalog].getName)
    s2.conf.set("spark.sql.catalog.lakehouse.warehouse", fixtureWarehouse)
    s2.conf.set("spark.sql.catalog.scratch", classOf[GraftCatalog].getName)
    s2.conf.set("spark.sql.catalog.scratch.warehouse", scratch)
    val rows = s2.sql("SELECT * FROM scratch.ns1.long_trips ORDER BY trip_distance").collect()
    assert(rows.map(_.getFloat(1)).toSeq == Seq(2.5f, 8.4f))

    // alterView: property changes rewrite the document in place; the SQL
    // text, schema, and query-columns survive the round-trip
    import org.apache.spark.sql.connector.catalog.ViewChange
    scratchCat.alterView(sIdent,
      ViewChange.setProperty("comment", "long trips only"),
      ViewChange.setProperty("owner", "pipeline"))
    scratchCat.alterView(sIdent, ViewChange.removeProperty("owner"))
    // remove-then-set of one key in a single call must end set (order)
    scratchCat.alterView(sIdent,
      ViewChange.removeProperty("comment"),
      ViewChange.setProperty("comment", "second"))
    val doc = scratchCat.asInstanceOf[GraftCatalog]
      .storeForTest.loadViewJson(Seq("ns1"), "long_trips")
    assert(doc.get("properties").get("comment").asText == "second")
    assert(doc.get("properties").get("owner") == null)
    val rows2 = s2.sql(
      "SELECT * FROM scratch.ns1.long_trips ORDER BY trip_distance").collect()
    assert(rows2.map(_.getFloat(1)).toSeq == Seq(2.5f, 8.4f),
      "expansion still works after the property rewrite")
    scratchCat.dropView(sIdent)
  }

  test("partition-statistics files: maintained incrementally on append " +
      "when declared, served by the partitions table with " +
      "manifest-recompute parity, re-bootstrapped by " +
      "compute_partition_stats, dropped with expired snapshots") {
    import graft.iceberg.{IcebergTable, PartitionStats, TableMetadata}
    useCatalogs()
    val conf = spark.sessionState.newHadoopConf()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.psns")
    spark.sql("DROP TABLE IF EXISTS scratch.psns.p")
    spark.sql(
      """CREATE TABLE scratch.psns.p (k BIGINT, region BIGINT)
        |PARTITIONED BY (region)
        |TBLPROPERTIES ('graft.partition-statistics' = 'true',
        |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
    val dir = s"$scratch/psns/p"
    def meta = TableMetadata.load(dir, conf)
    def servedRows() = spark.sql(
      """SELECT `partition`, spec_id, file_count, record_count,
        |       total_size_in_bytes, position_delete_file_count,
        |       position_delete_record_count, equality_delete_file_count,
        |       equality_delete_record_count
        |FROM scratch.psns.p.`partitions` ORDER BY `partition`""".stripMargin)
      .collect().map(_.toSeq).toSeq
    def recomputedRows() = PartitionStats.rollup(new IcebergTable(dir, conf))
      .map(e => Seq[Any](e.partitionRepr, e.specId, e.dataFileCount,
        e.dataRecordCount, e.totalDataFileSizeInBytes,
        e.posDeleteFileCount, e.posDeleteRecordCount,
        e.eqDeleteFileCount, e.eqDeleteRecordCount))

    spark.sql("INSERT INTO scratch.psns.p SELECT id, id % 3 FROM range(30)")
    spark.sql("INSERT INTO scratch.psns.p SELECT id, id % 3 FROM range(30, 45)")
    // one entry per append snapshot, chained incrementally from birth
    val m1 = meta
    assert(m1.partitionStatistics.size == 2,
      s"entries: ${m1.partitionStatistics}")
    assert(m1.partitionStatistics.map(_.snapshotId).toSet ==
      m1.snapshots.map(_.snapshotId).toSet)
    val fs = new Path(dir).getFileSystem(conf)
    m1.partitionStatistics.foreach { e =>
      assert(fs.getFileStatus(new Path(e.path)).getLen == e.fileSizeInBytes,
        s"recorded size must match the file: $e")
    }
    // file-served output ≡ manifest recompute, bit-identical
    assert(servedRows() == recomputedRows(), s"parity after appends:\n" +
      s" served=${servedRows()}\n recomputed=${recomputedRows()}")
    // the spec's typed tuple is readable by a PLAIN parquet reader
    val current = m1.partitionStatistics
      .find(e => m1.currentSnapshotId.contains(e.snapshotId)).get
    val raw = spark.read.parquet(current.path)
    assert(raw.schema("partition").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq == Seq("region"))
    assert(raw.selectExpr("sum(data_record_count)").collect()(0).getLong(0) == 45L)
    assert(raw.selectExpr("count(distinct partition.region)")
      .collect()(0).getLong(0) == 3L)

    // a merge-on-read DELETE leaves its snapshot WITHOUT an entry — the
    // partitions table falls back to the manifest recompute and still
    // shows the fresh delete debt
    spark.sql("DELETE FROM scratch.psns.p WHERE k % 5 = 0")
    val m2 = meta
    assert(!m2.partitionStatistics.exists(e =>
      m2.currentSnapshotId.contains(e.snapshotId)),
      "row-level commits must not extend the incremental chain")
    val debt = servedRows()
    assert(debt == recomputedRows(), "fallback parity")
    assert(debt.map(r => r(6).asInstanceOf[Long] + r(8).asInstanceOf[Long])
      .sum > 0L,
      s"the fallback must show the outstanding delete debt: $debt")

    // compute_partition_stats bootstraps the chain again — including the
    // debt columns — and the next append extends from it incrementally
    spark.sql("CALL scratch.system.compute_partition_stats(table => 'psns.p')")
    val m3 = meta
    assert(m3.partitionStatistics.exists(e =>
      m3.currentSnapshotId.contains(e.snapshotId)))
    assert(servedRows() == recomputedRows(), "parity after bootstrap")
    spark.sql("INSERT INTO scratch.psns.p SELECT id, id % 3 FROM range(45, 50)")
    val m4 = meta
    assert(m4.partitionStatistics.exists(e =>
      m4.currentSnapshotId.contains(e.snapshotId)),
      "append after bootstrap must extend the chain")
    val afterAppend = servedRows()
    assert(afterAppend == recomputedRows(), "parity after incremental append")
    assert(afterAppend.map(r =>
      r(6).asInstanceOf[Long] + r(8).asInstanceOf[Long]).sum > 0L,
      "carried delete debt must survive the incremental append")

    // an append touching ONE partition must re-emit the untouched
    // partitions' TYPED tuples intact in the new stats file (the spec
    // identity column external readers key on), not null them
    spark.sql("INSERT INTO scratch.psns.p SELECT id, 0 FROM range(50, 53)")
    val m4b = meta
    val cur4b = m4b.partitionStatistics
      .find(e => m4b.currentSnapshotId.contains(e.snapshotId)).get
    val raw4b = spark.read.parquet(cur4b.path)
    assert(raw4b.selectExpr("count(distinct partition.region)")
      .collect()(0).getLong(0) == 3L,
      "carried partitions must keep their typed tuple values")
    assert(servedRows() == recomputedRows(), "parity after one-partition append")

    // snapshot expiration drops entries with their snapshots
    spark.sql("CALL scratch.system.expire_snapshots(table => 'psns.p', " +
      s"older_than => ${System.currentTimeMillis + 60000}, retain_last => 1)")
    val m5 = meta
    assert(m5.partitionStatistics.map(_.snapshotId).toSet.subsetOf(
      m5.snapshots.map(_.snapshotId).toSet),
      s"expired snapshots must shed their entries: ${m5.partitionStatistics}")
    assert(servedRows() == recomputedRows(), "parity after expiration")
    spark.sql("DROP TABLE scratch.psns.p")
  }

  test("DROP TABLE PURGE deletes the files; a snapshot clone " +
      "(gc.enabled=false) refuses the purge") {
    useCatalogs()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.purgens")
    def dirOf(t: String) = new java.io.File(s"$scratch/purgens/$t")

    // NOTE: on the FILESYSTEM warehouse the directory IS the catalog
    // registration, so plain DROP necessarily removes it too — the
    // deregister-vs-purge distinction is real on the REST store
    // (gated in RestCatalogSpec). PURGE here: entry AND files go.
    spark.sql("DROP TABLE IF EXISTS scratch.purgens.gone")
    spark.sql("CREATE TABLE scratch.purgens.gone (k BIGINT)")
    spark.sql("INSERT INTO scratch.purgens.gone VALUES (1), (2), (3)")
    assert(dirOf("gone").exists)
    spark.sql("DROP TABLE scratch.purgens.gone PURGE")
    assert(!spark.sql("SHOW TABLES IN scratch.purgens").collect()
      .map(_.getString(1)).contains("gone"))
    assert(!dirOf("gone").exists,
      "PURGE must physically delete the table location")

    // a clone shares the source's data files: PURGE must refuse loudly
    spark.sql("DROP TABLE IF EXISTS scratch.purgens.src")
    spark.sql("CREATE TABLE scratch.purgens.src (k BIGINT)")
    spark.sql("INSERT INTO scratch.purgens.src VALUES (7)")
    spark.sql("CALL scratch.system.snapshot(" +
      "source_table => 'purgens.src', table => 'purgens.cl')")
    val e = intercept[Exception] {
      spark.sql("DROP TABLE scratch.purgens.cl PURGE")
    }
    def msgs(x: Throwable): String = Iterator.iterate(x)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs(e).contains("gc.enabled"),
      s"clone purge must refuse naming the guard: ${msgs(e)}")
    // the source's data survived the refusal
    assert(spark.sql("SELECT k FROM scratch.purgens.src").collect()
      .map(_.getLong(0)).toSeq == Seq(7L))
    spark.sql("DROP TABLE scratch.purgens.cl") // plain drop is fine
    spark.sql("DROP TABLE scratch.purgens.src PURGE")

    // rename staleness: metadata.location still names the OLD directory
    // after ALTER RENAME (the FS store moves the dir without rewriting
    // the stored location) — purging the renamed table must delete ITS
    // directory, never the old path an unrelated recreated table now owns
    spark.sql("DROP TABLE IF EXISTS scratch.purgens.ra")
    spark.sql("DROP TABLE IF EXISTS scratch.purgens.rb")
    spark.sql("CREATE TABLE scratch.purgens.ra (k BIGINT)")
    spark.sql("INSERT INTO scratch.purgens.ra VALUES (1)")
    spark.sql("ALTER TABLE scratch.purgens.ra RENAME TO purgens.rb")
    spark.sql("CREATE TABLE scratch.purgens.ra (k BIGINT)") // reuses the path
    spark.sql("INSERT INTO scratch.purgens.ra VALUES (42)")
    spark.sql("DROP TABLE scratch.purgens.rb PURGE")
    assert(!dirOf("rb").exists, "purge must delete the RENAMED directory")
    assert(spark.sql("SELECT k FROM scratch.purgens.ra").collect()
      .map(_.getLong(0)).toSeq == Seq(42L),
      "the recreated table at the stale location must survive the purge")
    spark.sql("DROP TABLE scratch.purgens.ra PURGE")
  }

  test("TRUNCATE TABLE: the statement empties the table as one truncate " +
      "snapshot; time travel still sees the prior rows") {
    useCatalogs()
    val fs = new Path(scratch).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(s"$scratch/ns/trunc"), true)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scratch.ns")
    spark.sql("CREATE TABLE scratch.ns.trunc (k BIGINT, v STRING)")
    spark.sql("INSERT INTO scratch.ns.trunc VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val before = spark.sql("SELECT snapshot_id FROM scratch.ns.trunc.snapshots")
      .collect().map(_.getLong(0)).max
    spark.sql("TRUNCATE TABLE scratch.ns.trunc")
    assert(spark.sql("SELECT COUNT(*) FROM scratch.ns.trunc")
      .head.getLong(0) == 0L, "TRUNCATE must empty the current snapshot")
    // one NEW snapshot, prior data untouched on disk: time travel works
    assert(spark.sql(
      s"SELECT COUNT(*) FROM scratch.ns.trunc VERSION AS OF $before")
      .head.getLong(0) == 3L,
      "time travel to the pre-truncate snapshot must see the rows")
    // and the table keeps accepting writes afterwards
    spark.sql("INSERT INTO scratch.ns.trunc VALUES (9, 'z')")
    assert(spark.sql("SELECT k FROM scratch.ns.trunc").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))
  }
}
