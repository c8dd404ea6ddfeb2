package graft

import org.apache.hadoop.fs.Path

import graft.iceberg.TableMetadata
import graft.iceberg.connector.GraftCatalog

/** `CALL cat.system.<procedure>(...)`: the SQL face of maintenance + CDC.
  * Each procedure's effect is asserted through independent reads (table
  * state, metadata, snapshot counts), not just its return row.
  */
class ProceduresSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/proc-warehouse"
  private def conf = spark.sessionState.newHadoopConf()

  private def fresh(cat: String): String = {
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    s"$warehouse/ns"
  }

  test("expire_snapshots trims history and reports the count") {
    val ns = fresh("pcat")
    spark.sql("CREATE TABLE pcat.ns.t (k INT)")
    spark.sql("INSERT INTO pcat.ns.t VALUES (1)")
    spark.sql("INSERT INTO pcat.ns.t VALUES (2)")
    spark.sql("INSERT INTO pcat.ns.t VALUES (3)")
    val dir = s"$ns/t"
    assert(TableMetadata.load(dir, conf).snapshots.size === 3)
    val horizon = System.currentTimeMillis() + 3600 * 1000
    val Seq(row) = spark.sql(
      s"CALL pcat.system.expire_snapshots(table => 'ns.t', " +
        s"older_than => $horizon, retain_last => 1)").collect().toSeq
    assert(row.getInt(0) === 2)
    assert(TableMetadata.load(dir, conf).snapshots.size === 1)
    assert(spark.sql("SELECT * FROM pcat.ns.t").count() === 3)
  }

  test("rewrite_data_files compacts to one file, rows unchanged") {
    val ns = fresh("pcat2")
    spark.sql("CREATE TABLE pcat2.ns.t (k INT)")
    spark.sql("INSERT INTO pcat2.ns.t SELECT CAST(id AS INT) FROM range(10)")
    spark.sql("INSERT INTO pcat2.ns.t SELECT CAST(id AS INT) FROM range(10, 20)")
    val dir = s"$ns/t"
    val filesBefore = new graft.iceberg.IcebergTable(dir, conf).planFiles().size
    assert(filesBefore > 1)
    val Seq(row) = spark.sql(
      "CALL pcat2.system.rewrite_data_files(table => 'ns.t')").collect().toSeq
    assert(row.getLong(0) ===
      TableMetadata.load(dir, conf).currentSnapshotId.get)
    assert(new graft.iceberg.IcebergTable(dir, conf).planFiles().size === 1)
    assert(spark.sql("SELECT COUNT(*) FROM pcat2.ns.t").head.getLong(0) === 20)
  }

  test("rewrite_data_files(where) compacts only the matching partition's files") {
    val ns = fresh("pcat8")
    spark.sql("CREATE TABLE pcat8.ns.t (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    // 3 commits → ≥3 files per partition value
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO pcat8.ns.t SELECT id + ${i * 10}, " +
        "concat('c', id % 2) FROM range(0, 10)")
    }
    val dir = s"$ns/t"
    def filesByCat(): Map[Any, Int] =
      new graft.iceberg.IcebergTable(dir, conf).planFiles()
        .groupBy(_.partition("cat")).view.mapValues(_.size).toMap
    val before = filesByCat()
    assert(before("c0") >= 3 && before("c1") >= 3)

    spark.sql("CALL pcat8.system.rewrite_data_files(table => 'ns.t', " +
      "where => 'cat = ''c0''')").collect()
    val after = filesByCat()
    assert(after("c0") == 1, s"c0 should compact to one file, got ${after("c0")}")
    assert(after("c1") == before("c1"), "the unmatched partition is untouched")
    assert(spark.sql("SELECT COUNT(*) FROM pcat8.ns.t").collect()(0).getLong(0) == 30L)
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM pcat8.ns.t")
      .collect()(0).getLong(0) ==
      (0 until 3).flatMap(i => (0 until 10).map(_ + i * 10)).sum)
    // recorded as data movement, not churn: the changelog skips it
    val meta = TableMetadata.load(dir, conf)
    assert(meta.currentSnapshot.get.summary("operation") == "replace")
    // a whole-table-rewriting where is refused, not silently executed
    val e = intercept[Exception](spark.sql(
      "CALL pcat8.system.rewrite_data_files(table => 'ns.t', " +
        "where => 'k + 0 = k')").collect())
    assert(e.getMessage.contains("no pushable filter"))
  }

  test("rewrite_manifests merges per-commit manifests metadata-only") {
    val ns = fresh("pcat7")
    spark.sql("CREATE TABLE pcat7.ns.t (k INT)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO pcat7.ns.t VALUES ($i)"))
    val dir = s"$ns/t"
    val dataBefore = new graft.iceberg.IcebergTable(dir, conf)
      .planFiles().map(_.filePath).toSet
    assert(new graft.iceberg.IcebergTable(dir, conf).manifests.size === 4)
    val Seq(row) = spark.sql(
      "CALL pcat7.system.rewrite_manifests(table => 'ns.t')").collect().toSeq
    assert(row.getLong(0) > 0)
    val t = new graft.iceberg.IcebergTable(dir, conf)
    assert(t.manifests.size === 1, "four per-commit manifests merged into one")
    assert(t.planFiles().map(_.filePath).toSet === dataBefore,
      "metadata-only: the data files are untouched")
    assert(spark.sql("SELECT COUNT(*) FROM pcat7.ns.t").head.getLong(0) === 4L)
  }

  test("fast_forward publishes a WAP branch from SQL only") {
    val ns = fresh("pcat3")
    spark.sql("CREATE TABLE pcat3.ns.t (k INT)")
    spark.sql("INSERT INTO pcat3.ns.t VALUES (1)")
    spark.sql("ALTER TABLE pcat3.ns.t CREATE BRANCH audit")
    spark.conf.set("spark.wap.branch", "audit")
    try spark.sql("INSERT INTO pcat3.ns.t VALUES (2)")
    finally spark.conf.unset("spark.wap.branch")
    assert(spark.sql("SELECT COUNT(*) FROM pcat3.ns.t").head.getLong(0) === 1)
    val Seq(row) = spark.sql(
      "CALL pcat3.system.fast_forward(table => 'ns.t', branch => 'main', " +
        "to => 'audit')").collect().toSeq
    assert(row.getString(0) === "main")
    assert(spark.sql("SELECT COUNT(*) FROM pcat3.ns.t").head.getLong(0) === 2)
    assert(row.getLong(2) ===
      TableMetadata.load(s"$ns/t", conf).currentSnapshotId.get)
  }

  test("rollback_to_snapshot is a metadata-only undo") {
    val ns = fresh("pcat4")
    spark.sql("CREATE TABLE pcat4.ns.t (k INT)")
    spark.sql("INSERT INTO pcat4.ns.t VALUES (1)")
    val dir = s"$ns/t"
    val first = TableMetadata.load(dir, conf).currentSnapshotId.get
    spark.sql("INSERT INTO pcat4.ns.t VALUES (2)")
    assert(spark.sql("SELECT COUNT(*) FROM pcat4.ns.t").head.getLong(0) === 2)
    spark.sql(
      s"CALL pcat4.system.rollback_to_snapshot(table => 'ns.t', snapshot_id => $first)")
    assert(spark.sql("SELECT COUNT(*) FROM pcat4.ns.t").head.getLong(0) === 1)
    // roll forward again: both snapshots still exist
    val lin = TableMetadata.load(dir, conf)
    assert(lin.snapshots.size === 2)
  }

  test("rollback_to_timestamp resolves TIMESTAMP AS OF then moves main") {
    val ns = fresh("pcat14")
    spark.sql("CREATE TABLE pcat14.ns.t (k INT)")
    spark.sql("INSERT INTO pcat14.ns.t VALUES (1)")
    val dir = s"$ns/t"
    val firstTs = TableMetadata.load(dir, conf).currentSnapshot.get.timestampMs
    spark.sql("INSERT INTO pcat14.ns.t VALUES (2)")
    assert(spark.sql("SELECT COUNT(*) FROM pcat14.ns.t").head.getLong(0) === 2)
    // a bound between the two commits resolves to the FIRST snapshot
    val Seq(row) = spark.sql(
      s"CALL pcat14.system.rollback_to_timestamp(table => 'ns.t', " +
        s"timestamp => $firstTs)").collect().toSeq
    assert(spark.sql("SELECT COUNT(*) FROM pcat14.ns.t").head.getLong(0) === 1)
    assert(row.getLong(0) != row.getLong(1), "main moved")
    // a bound before table creation fails loudly
    val e = intercept[Exception](spark.sql(
      "CALL pcat14.system.rollback_to_timestamp(table => 'ns.t', " +
        "timestamp => 1)").collect())
    assert(e.getMessage.contains("no snapshot at or before"))
  }

  test("create_changelog_view registers a queryable CDC view") {
    val ns = fresh("pcat5")
    spark.sql("CREATE TABLE pcat5.ns.t (k INT)")
    spark.sql("INSERT INTO pcat5.ns.t SELECT CAST(id AS INT) FROM range(5)")
    spark.sql("DELETE FROM pcat5.ns.t WHERE k IN (1, 2)")
    val Seq(row) = spark.sql(
      "CALL pcat5.system.create_changelog_view(table => 'ns.t', " +
        "changelog_view => 'tchanges')").collect().toSeq
    assert(row.getString(0) === "tchanges")
    val byType = spark.sql(
      "SELECT _change_type, COUNT(*) FROM tchanges GROUP BY 1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("insert" -> 5L, "delete" -> 2L))
  }

  test("create_changelog_view(compute_updates => 1) serves update pairs " +
      "from SQL on a v3 table; refuses v2 and net_changes composition") {
    val ns = fresh("pcat15")
    spark.sql(
      """CREATE TABLE pcat15.ns.t (k INT, v STRING)
        |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
    spark.sql("INSERT INTO pcat15.ns.t SELECT CAST(id AS INT), " +
      "concat('v', id) FROM range(10)")
    val s0 = TableMetadata
      .load(s"$ns/t", spark.sessionState.newHadoopConf())
      .snapshotLineage.last
    spark.sql("UPDATE pcat15.ns.t SET v = concat(v, '!') WHERE k < 3")
    spark.sql(
      s"CALL pcat15.system.create_changelog_view(table => 'ns.t', " +
        s"changelog_view => 'tupd', start_snapshot_id => $s0, " +
        "compute_updates => 1)")
    val rows = spark.sql(
      "SELECT k, v, _change_type FROM tupd ORDER BY k, _change_type")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == (0 until 3).flatMap(k => Seq(
      (k, s"v$k!", "update_after"), (k, s"v$k", "update_before"))),
      s"update pairs only (carryovers dropped): $rows")
    // mutually exclusive with net_changes
    val e = intercept[Exception](spark.sql(
      "CALL pcat15.system.create_changelog_view(table => 'ns.t', " +
        "changelog_view => 'x', net_changes => 1, compute_updates => 1)")
      .collect())
    assert(e.getMessage.contains("mutually exclusive"))
    // v2 tables refuse with the documented message
    spark.sql("CREATE TABLE pcat15.ns.t2 (k INT)")
    spark.sql("INSERT INTO pcat15.ns.t2 VALUES (1)")
    val e2 = intercept[Exception](spark.sql(
      "CALL pcat15.system.create_changelog_view(table => 'ns.t2', " +
        "changelog_view => 'y', compute_updates => 1)").collect())
    assert(e2.getMessage.contains("format-version"))
  }

  test("add_files: the documented migration recipe (import -> compact -> mix)") {
    val ns = fresh("pcat7")
    // id-less imports read through schema.name-mapping.default; mixing
    // them with id-stamped native files in one snapshot is refused until
    // a compaction re-stamps ids — so the recipe is import, compact, go
    spark.sql(
      """CREATE TABLE pcat7.ns.t (k BIGINT, tag STRING) TBLPROPERTIES (
        |'schema.name-mapping.default' =
        |'[{"field-id":1,"names":["k"]},{"field-id":2,"names":["tag"]}]')""".stripMargin)
    import spark.implicits._
    val foreign = "/root/repo/target/proc-foreign-parquet"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(foreign))
    Seq((10L, "ext"), (11L, "ext")).toDF("k", "tag")
      .coalesce(1).write.parquet(foreign)
    val dir = s"$ns/t"
    val Seq(row) = spark.sql(
      s"CALL pcat7.system.add_files(table => 'ns.t', source => '$foreign')")
      .collect().toSeq
    assert(row.getInt(0) === 1, "one parquet file registered")
    // metadata-only: the foreign file was NOT copied or moved
    assert(new java.io.File(foreign).listFiles().exists(_.getName.endsWith(".parquet")))
    assert(spark.sql("SELECT COUNT(*) FROM pcat7.ns.t").collect()(0).getLong(0) === 2L)
    // compact re-stamps field ids; native writes can mix in from then on
    spark.sql("CALL pcat7.system.rewrite_data_files(table => 'ns.t')").collect()
    spark.sql("INSERT INTO pcat7.ns.t VALUES (1, 'native')")
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) FROM pcat7.ns.t")
      .collect()(0).getLong(0) === 22L)
    assert(spark.sql("SELECT COUNT(*) FROM pcat7.ns.t WHERE tag = 'ext'")
      .collect()(0).getLong(0) === 2L)
  }

  test("rewrite_position_delete_files folds MoR delete debt into one file") {
    val ns = fresh("pcat9")
    spark.sql("CREATE TABLE pcat9.ns.t (k BIGINT, cat STRING) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read', " +
      "'write.update.mode' = 'merge-on-read')")
    // several small commits so deletes land as several small delete files
    spark.sql("INSERT INTO pcat9.ns.t SELECT id, concat('c', id % 4) FROM range(0, 40)")
    spark.sql("INSERT INTO pcat9.ns.t SELECT id, concat('c', id % 4) FROM range(40, 80)")
    // ranges (never equalities — those take the equality-delete fast
    // path) and partial per file, so each lands a position-delete file
    spark.sql("DELETE FROM pcat9.ns.t WHERE k < 5")
    spark.sql("DELETE FROM pcat9.ns.t WHERE k >= 70")
    spark.sql("DELETE FROM pcat9.ns.t WHERE k >= 30 AND k < 33")
    spark.sql("UPDATE pcat9.ns.t SET cat = 'hot' WHERE k = 20")
    val dir = s"$ns/t"
    def posDeleteFiles(): Int = new graft.iceberg.IcebergTable(dir, conf)
      .planDeletes().count(_.content == 1)
    val before = posDeleteFiles()
    assert(before >= 3, s"q67-style churn should stack delete files, got $before")
    val expected = spark.sql("SELECT * FROM pcat9.ns.t").collect()
      .map(_.toString).sorted.toSeq

    val Seq(row) = spark.sql(
      "CALL pcat9.system.rewrite_position_delete_files(table => 'ns.t')")
      .collect().toSeq
    assert(row.getInt(0) === before, "every position-delete file rewritten")
    val after = posDeleteFiles()
    assert(after === 1, s"debt folds into one merged file, got $after")
    // read-back identical
    val got = spark.sql("SELECT * FROM pcat9.ns.t").collect()
      .map(_.toString).sorted.toSeq
    assert(got === expected, "rewrite must not change live rows")
    // the changelog sees data movement, not change: a replace snapshot
    // contributes no changelog rows
    val lineage = TableMetadata.load(dir, conf).snapshotLineage
    val changes = new graft.iceberg.IcebergTable(dir, conf)
      .changesBetween(spark, lineage(lineage.size - 2), lineage.last)
    assert(changes.count() === 0L,
      "a replace snapshot must contribute no changelog rows")
    // idempotent: a second call is a no-op (single already-merged file)
    val Seq(row2) = spark.sql(
      "CALL pcat9.system.rewrite_position_delete_files(table => 'ns.t')")
      .collect().toSeq
    assert(row2.getInt(1) === 0, "no fully-dead data files on the rerun")
  }

  test("rewrite_position_delete_files folds fully-deleted data files away") {
    val ns = fresh("pcat10")
    spark.sql("CREATE TABLE pcat10.ns.t (k BIGINT, cat STRING) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO pcat10.ns.t SELECT /*+ REPARTITION(1) */ id, 'a' FROM range(0, 10)")
    spark.sql("INSERT INTO pcat10.ns.t SELECT /*+ REPARTITION(1) */ id, 'b' FROM range(10, 20)")
    val dir = s"$ns/t"
    val filesBefore = new graft.iceberg.IcebergTable(dir, conf).planFiles().size
    // kill EVERY row of the second commit's file across TWO partial
    // deletes: each is partial at write time (so it lands as a position
    // delete, not the writer's direct fully-dead drop), and only their
    // UNION kills the file — exactly what the merge must detect
    spark.sql("DELETE FROM pcat10.ns.t WHERE k >= 10 AND k < 15")
    spark.sql("DELETE FROM pcat10.ns.t WHERE k >= 15")
    assert(new graft.iceberg.IcebergTable(dir, conf).hasDeletes)
    val Seq(row) = spark.sql(
      "CALL pcat10.system.rewrite_position_delete_files(table => 'ns.t')")
      .collect().toSeq
    assert(row.getInt(1) >= 1, "fully-deleted data files must fold away")
    val t = new graft.iceberg.IcebergTable(dir, conf)
    assert(t.planFiles().size < filesBefore + 1)
    assert(!t.hasDeletes,
      "all delete entries pointed at fully-dead files — table is delete-free")
    assert(spark.sql("SELECT count(*) FROM pcat10.ns.t").head.getLong(0) === 10L)
    // and the COUNT above can once again be metadata-answered next time
    // (hasDeletes gate cleared) — totals stayed consistent
    assert(spark.sql("SELECT min(k), max(k) FROM pcat10.ns.t").head ===
      org.apache.spark.sql.Row(0L, 9L))
  }

  test("rewrite_data_files on a merge-on-read table materializes deletes for the rewritten files") {
    val ns = fresh("pcat11")
    spark.sql("CREATE TABLE pcat11.ns.t (k BIGINT, cat STRING) " +
      "PARTITIONED BY (cat) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO pcat11.ns.t SELECT id, concat('c', id % 2) FROM range(0, 20)")
    spark.sql("INSERT INTO pcat11.ns.t SELECT id, concat('c', id % 2) FROM range(20, 40)")
    spark.sql("DELETE FROM pcat11.ns.t WHERE k % 10 = 3")
    val expected = spark.sql("SELECT * FROM pcat11.ns.t").collect()
      .map(_.toString).sorted.toSeq
    // partial rewrite of the second commit's files on a delete-bearing
    // table: allowed now — the rewrite applies outstanding deletes on read
    val Seq(row) = spark.sql(
      "CALL pcat11.system.rewrite_data_files(table => 'ns.t', " +
        "where => 'k >= 20')").collect().toSeq
    assert(row.getLong(0) > 0)
    val got = spark.sql("SELECT * FROM pcat11.ns.t").collect()
      .map(_.toString).sorted.toSeq
    assert(got === expected, "rewrite + outstanding deletes must compose")
    // the rewritten partition's delete entries dangle; the other
    // partition's still apply — run the delete compaction to verify the
    // composition end-to-end
    spark.sql("CALL pcat11.system.rewrite_position_delete_files(table => 'ns.t')")
    val got2 = spark.sql("SELECT * FROM pcat11.ns.t").collect()
      .map(_.toString).sorted.toSeq
    assert(got2 === expected)
  }

  test("convert_equality_deletes materializes equality debt; composes with the position merge") {
    val ns = fresh("pcat12")
    spark.sql("CREATE TABLE pcat12.ns.t (k BIGINT, cat STRING) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO pcat12.ns.t SELECT id, concat('c', id % 4) FROM range(0, 40)")
    spark.sql("INSERT INTO pcat12.ns.t SELECT id, concat('c', id % 4) FROM range(40, 80)")
    // equality deletes (IN tuples take the equality fast path) AND a
    // range delete (position path) — conversion must touch only the former
    spark.sql("DELETE FROM pcat12.ns.t WHERE k IN (1, 2, 3)")
    spark.sql("DELETE FROM pcat12.ns.t WHERE k IN (41, 42)")
    spark.sql("DELETE FROM pcat12.ns.t WHERE k >= 70 AND k < 75")
    val dir = s"$ns/t"
    def byKind(): (Int, Int) = {
      val d = new graft.iceberg.IcebergTable(dir, conf).planDeletes()
      (d.count(_.content == 1), d.count(_.content == 2))
    }
    val (posBefore, eqBefore) = byKind()
    assert(eqBefore >= 2, s"IN deletes should land equality files, got $eqBefore")
    assert(posBefore >= 1, s"range delete should land a position file, got $posBefore")
    val expected = spark.sql("SELECT * FROM pcat12.ns.t").collect()
      .map(_.toString).sorted.toSeq
    assert(expected.size === 80 - 3 - 2 - 5)

    val Seq(row) = spark.sql(
      "CALL pcat12.system.convert_equality_deletes(table => 'ns.t')")
      .collect().toSeq
    assert(row.getInt(0) === eqBefore, "every equality file converted")
    assert(row.getLong(1) === 5L, "3 + 2 equality-matched rows materialized")
    val (posAfter, eqAfter) = byKind()
    assert(eqAfter === 0, "no equality deletes survive conversion")
    assert(posAfter === posBefore + 1, "one merged position file added")
    val got = spark.sql("SELECT * FROM pcat12.ns.t").collect()
      .map(_.toString).sorted.toSeq
    assert(got === expected, "conversion must not change live rows")
    // the changelog sees a delete-representation change as data movement
    val lineage = TableMetadata.load(dir, conf).snapshotLineage
    val changes = new graft.iceberg.IcebergTable(dir, conf)
      .changesBetween(spark, lineage(lineage.size - 2), lineage.last)
    assert(changes.count() === 0L)
    // idempotent
    val Seq(row2) = spark.sql(
      "CALL pcat12.system.convert_equality_deletes(table => 'ns.t')")
      .collect().toSeq
    assert(row2.getInt(0) === 0)
    // and the position merge now folds ALL delete debt into one file
    spark.sql("CALL pcat12.system.rewrite_position_delete_files(table => 'ns.t')")
    val (posFinal, eqFinal) = byKind()
    assert(posFinal === 1 && eqFinal === 0)
    val got2 = spark.sql("SELECT * FROM pcat12.ns.t").collect()
      .map(_.toString).sorted.toSeq
    assert(got2 === expected)
    // new rows inserted AFTER conversion are untouched by the converted
    // deletes (they would have escaped the equality gate too)
    spark.sql("INSERT INTO pcat12.ns.t VALUES (1, 'reborn')")
    assert(spark.sql("SELECT count(*) FROM pcat12.ns.t WHERE k = 1")
      .head.getLong(0) === 1L)
  }

  test("convert_equality_deletes on a DV table lands the converted debt " +
      "as deletion vectors — one blob per affected file, no new v2 " +
      "position files, prior DVs absorbed") {
    val ns = fresh("pcat12d")
    spark.sql("CREATE TABLE pcat12d.ns.t (k BIGINT, cat STRING) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read', " +
      "'graft.write.deletes' = 'dv')")
    spark.sql("INSERT INTO pcat12d.ns.t SELECT id, concat('c', id % 4) " +
      "FROM range(0, 40)")
    spark.sql("INSERT INTO pcat12d.ns.t SELECT id, concat('c', id % 4) " +
      "FROM range(40, 80)")
    // a range delete lands a DV (the table's position representation);
    // IN deletes land equality files (representation-independent debt)
    spark.sql("DELETE FROM pcat12d.ns.t WHERE k >= 70 AND k < 75")
    spark.sql("DELETE FROM pcat12d.ns.t WHERE k IN (1, 2, 3)")
    // k = 71 overlaps the DV — conversion must dedup into the superset
    // vector, not double-delete or resurrect
    spark.sql("DELETE FROM pcat12d.ns.t WHERE k IN (41, 42, 71)")
    val dir = s"$ns/t"
    def kinds(): (Int, Int, Int) = {
      val d = new graft.iceberg.IcebergTable(dir, conf).planDeletes()
      (d.count(p => p.content == 1 && p.isDv),
        d.count(p => p.content == 1 && !p.isDv),
        d.count(_.content == 2))
    }
    val (dvBefore, v2Before, eqBefore) = kinds()
    assert(dvBefore >= 1 && eqBefore >= 2 && v2Before == 0,
      s"setup: dv=$dvBefore v2=$v2Before eq=$eqBefore")
    val expected = spark.sql("SELECT * FROM pcat12d.ns.t").collect()
      .map(_.toString).sorted.toSeq
    assert(expected.size === 80 - 5 - 3 - 3 + 1) // k=71 counted once

    val Seq(row) = spark.sql(
      "CALL pcat12d.system.convert_equality_deletes(table => 'ns.t')")
      .collect().toSeq
    assert(row.getInt(0) === eqBefore, "every equality file converted")
    val (dvAfter, v2After, eqAfter) = kinds()
    assert(eqAfter === 0, "no equality deletes survive conversion")
    assert(v2After === 0,
      "a DV table's converted debt must not land as v2 position files")
    // at most ONE vector per referenced data file (spec superset rule):
    // the k=70..74 DV was absorbed into its file's new vector
    val dvs = new graft.iceberg.IcebergTable(dir, conf).planDeletes()
      .filter(_.isDv)
    assert(dvs.size === dvAfter)
    val perFile = dvs.groupBy(_.referencedDataFile.get).values.map(_.size)
    assert(perFile.forall(_ == 1),
      s"one DV per data file after conversion: ${dvs.map(_.referencedDataFile)}")
    val got = spark.sql("SELECT * FROM pcat12d.ns.t").collect()
      .map(_.toString).sorted.toSeq
    assert(got === expected, "conversion must not change live rows")
    // idempotent
    val Seq(row2) = spark.sql(
      "CALL pcat12d.system.convert_equality_deletes(table => 'ns.t')")
      .collect().toSeq
    assert(row2.getInt(0) === 0)
    // rows inserted after conversion escape the converted deletes
    spark.sql("INSERT INTO pcat12d.ns.t VALUES (2, 'reborn')")
    assert(spark.sql("SELECT count(*) FROM pcat12d.ns.t WHERE k = 2")
      .head.getLong(0) === 1L)
  }

  test("analyze_table NDVs reach the CBO through DSv2 column stats") {
    val ns = fresh("pcat13")
    spark.sql("CREATE TABLE pcat13.ns.t (k BIGINT, cat STRING)")
    spark.sql(
      "INSERT INTO pcat13.ns.t SELECT id, concat('c', id % 7) FROM range(0, 1000)")
    val Seq(row) = spark.sql(
      "CALL pcat13.system.analyze_table(table => 'ns.t')").collect().toSeq
    assert(row.getInt(0) === 2, "both columns analyzed")
    val meta = TableMetadata.load(s"$ns/t", conf)
    val ndvCat = meta.properties("graft.stats.ndv.cat").toLong
    assert(ndvCat >= 6 && ndvCat <= 8, s"approx NDV of 7 values, got $ndvCat")
    val ndvK = meta.properties("graft.stats.ndv.k").toLong
    assert(ndvK >= 900 && ndvK <= 1100, s"approx NDV of 1000, got $ndvK")
    assert(meta.properties.contains("graft.stats.avglen.cat"))
    assert(meta.properties("graft.stats.maxlen.cat").toLong === 2L)

    // the stats flow into catalyst column stats under CBO: NDV from the
    // ANALYZE, min/max/nullCount fresh from manifests
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("pcat13.ns.t")
        .queryExecution.optimizedPlan.stats
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.contains("cat") && byName.contains("k"),
        s"expected column stats for both columns, got ${byName.keySet}")
      assert(byName("cat").distinctCount.exists(n => n >= 6 && n <= 8))
      assert(byName("k").min.contains(0L) && byName("k").max.contains(999L),
        s"manifest-derived min/max, got ${byName("k")}")
      assert(byName("k").nullCount.exists(_ == 0))
    } finally spark.conf.unset("spark.sql.cbo.enabled")
    // column subset + unknown column fails loudly
    val e = intercept[Exception](spark.sql(
      "CALL pcat13.system.analyze_table(table => 'ns.t', columns => 'nope')")
      .collect())
    assert(e.getMessage.contains("not analyzable"))
  }

  test("analyze_table writes a Puffin statistics file + metadata entry") {
    val ns = fresh("pcat15")
    spark.sql("CREATE TABLE pcat15.ns.t (k BIGINT, cat STRING)")
    spark.sql(
      "INSERT INTO pcat15.ns.t SELECT id, concat('c', id % 7) FROM range(0, 1000)")
    spark.sql("CALL pcat15.system.analyze_table(table => 'ns.t')").collect()
    val dir = s"$ns/t"
    val meta = TableMetadata.load(dir, conf)

    // metadata carries the spec `statistics` entry for the analyzed snapshot
    assert(meta.statistics.size === 1, s"got ${meta.statistics}")
    val sf = meta.statistics.head
    assert(sf.snapshotId === meta.currentSnapshotId.get)
    assert(sf.blobs.size === 2 &&
      sf.blobs.forall(_.blobType == graft.iceberg.Puffin.ThetaBlobType))
    val katId = meta.fieldIds("cat")
    val catBlob = sf.blobs.find(_.fields == Seq(katId)).get
    val ndvProp = catBlob.properties("ndv").toLong
    assert(ndvProp >= 6 && ndvProp <= 8, s"blob ndv property, got $ndvProp")

    // the Puffin FILE round-trips: footer blobs match the metadata
    // mirror, and the payload is a REAL DataSketches-compact theta
    // sketch whose (exact-mode) estimate agrees with the ndv property
    val pPath = new Path(sf.path)
    assert(pPath.getFileSystem(conf).getFileStatus(pPath).getLen
      === sf.fileSizeInBytes)
    val footer = graft.iceberg.Puffin.readFooter(pPath, conf)
    val blobs = footer.get("blobs").elements()
    var found = false
    while (blobs.hasNext) {
      val b = blobs.next()
      if (b.get("fields").get(0).asInt == katId) {
        found = true
        assert(b.get("type").asText == graft.iceberg.Puffin.ThetaBlobType)
        assert(b.get("properties").get("ndv").asLong == ndvProp)
        val payload = graft.iceberg.Puffin.readBlob(pPath, conf,
          b.get("offset").asLong, b.get("length").asInt)
        val sk = graft.iceberg.ThetaSketch.deserialize(payload)
        // exact mode at this cardinality: the sketch IS the distinct set
        assert(sk.thetaLong == Long.MaxValue &&
          math.round(sk.estimate) >= 6 && math.round(sk.estimate) <= 8,
          s"theta payload estimate ${sk.estimate} vs ndv property $ndvProp")
      }
    }
    assert(found, "cat column blob present in the Puffin footer")

    // re-analyze REPLACES the snapshot's entry instead of stacking; a
    // new snapshot's analyze adds a second entry and serving prefers it
    spark.sql("CALL pcat15.system.analyze_table(table => 'ns.t')").collect()
    assert(TableMetadata.load(dir, conf).statistics.size === 1)
    spark.sql(
      "INSERT INTO pcat15.ns.t SELECT id, concat('d', id % 3) FROM range(1000, 1200)")
    spark.sql("CALL pcat15.system.analyze_table(table => 'ns.t')").collect()
    val meta2 = TableMetadata.load(dir, conf)
    assert(meta2.statistics.size === 2)
    assert(meta2.statistics.last.snapshotId === meta2.currentSnapshotId.get)

    // the CBO NDV serves from the statistics blobs (fresher than any
    // stale property would be), and SNAPSHOT-AWARE: a time-travel scan
    // of the pre-insert snapshot gets the pre-insert analyze's NDV, not
    // the later one
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("pcat15.ns.t")
        .queryExecution.optimizedPlan.stats
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName("cat").distinctCount.exists(n => n >= 9 && n <= 11),
        s"post-insert NDV ~10 from the latest statistics entry, " +
          s"got ${byName("cat").distinctCount}")
      val oldSid = meta2.statistics.head.snapshotId
      val ttStats = spark.sql(
          s"SELECT * FROM pcat15.ns.t VERSION AS OF $oldSid")
        .queryExecution.optimizedPlan.stats
      val ttByName = ttStats.attributeStats.map { case (a, s) => a.name -> s }
      ttByName.get("cat").flatMap(_.distinctCount).foreach(n =>
        assert(n >= 6 && n <= 8,
          s"time-travel scan must serve the OLD analyze's NDV ~7, got $n"))
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("positional args, string timestamps, and bad input fail loudly") {
    val ns = fresh("pcat6")
    spark.sql("CREATE TABLE pcat6.ns.t (k INT)")
    spark.sql("INSERT INTO pcat6.ns.t VALUES (1)")
    // positional + ISO string horizon in the past: expires nothing
    val Seq(r) = spark.sql(
      "CALL pcat6.system.expire_snapshots('ns.t', '2000-01-01T00:00:00Z')")
      .collect().toSeq
    assert(r.getInt(0) === 0)
    val e = intercept[Exception](spark.sql(
      "CALL pcat6.system.no_such_proc(table => 'ns.t')").collect())
    assert(e.getMessage.contains("unknown procedure"))
    val e2 = intercept[Exception](spark.sql(
      "CALL pcat6.system.expire_snapshots(tables => 'ns.t')").collect())
    assert(e2.getMessage.contains("no parameter"))
  }

  test("create_mv / refresh_mv: incremental refresh equals recompute, no-op when current") {
    val ns = fresh("pcat7")
    spark.sql("CREATE TABLE pcat7.ns.src (k STRING, v BIGINT)")
    spark.sql("INSERT INTO pcat7.ns.src SELECT CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, id FROM range(10)")
    val created = spark.sql(
      "CALL pcat7.system.create_mv(table => 'ns.src', mv => 'ns.mv', " +
        "keys => 'k', sums => 'v:sv')").collect()
    assert(created.length == 1 && created.head.getLong(0) > 0)

    def mv(): Seq[(String, Long, Long)] =
      spark.sql("SELECT k, cnt, sv FROM pcat7.ns.mv ORDER BY k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mv() == Seq(("a", 5L, 20L), ("b", 5L, 25L)))

    // refresh with no source movement: no-op, cursor unchanged
    val r0 = spark.sql("CALL pcat7.system.refresh_mv(table => 'ns.mv')").collect()
    assert(r0.head.getInt(1) == 0, "no source movement must be a no-op")

    // source moves: insert + COW update + equality delete (COW before
    // the MoR delete — the writer refuses a rewrite that would escape
    // outstanding delete files, the documented sequencing rule)
    spark.sql("INSERT INTO pcat7.ns.src SELECT 'c', id FROM range(100, 103)")
    spark.sql("UPDATE pcat7.ns.src SET v = v + 1000 WHERE k = 'a'")
    spark.sql("DELETE FROM pcat7.ns.src WHERE k = 'b'")
    val r1 = spark.sql("CALL pcat7.system.refresh_mv(table => 'ns.mv')").collect()
    assert(r1.head.getInt(1) == 1)
    assert(mv() == Seq(("a", 5L, 5020L), ("c", 3L, 303L)),
      s"refreshed MV wrong: ${mv()}")
    // the refresh matches a from-scratch recompute
    val want = spark.sql(
      "SELECT k, COUNT(*) AS cnt, CAST(SUM(v) AS BIGINT) AS sv " +
        "FROM pcat7.ns.src GROUP BY k ORDER BY k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mv() == want)
    // idempotent: an immediate second refresh no-ops and nothing moves
    val r2 = spark.sql("CALL pcat7.system.refresh_mv(table => 'ns.mv')").collect()
    assert(r2.head.getInt(1) == 0 && mv() == want)
    // refusal: refresh of a non-MV table
    val e3 = intercept[Exception](spark.sql(
      "CALL pcat7.system.refresh_mv(table => 'ns.src')").collect())
    assert(e3.getMessage.contains("not a graft MV"))
  }

  test("refresh_mv with an expired cursor fails loudly; reseed recovers") {
    val ns = fresh("pcat14")
    spark.sql("CREATE TABLE pcat14.ns.src (k STRING, v BIGINT)")
    spark.sql("INSERT INTO pcat14.ns.src VALUES ('a', 1)")
    spark.sql("CALL pcat14.system.create_mv(table => 'ns.src', " +
      "mv => 'ns.mv', keys => 'k', sums => 'v:sv')").collect()
    // the source moves on, then history is expired PAST the MV's cursor:
    // the incremental window can never be replayed again
    spark.sql("INSERT INTO pcat14.ns.src VALUES ('b', 2)")
    spark.sql("INSERT INTO pcat14.ns.src VALUES ('c', 3)")
    val horizon = System.currentTimeMillis() + 3600 * 1000
    spark.sql(s"CALL pcat14.system.expire_snapshots(table => 'ns.src', " +
      s"older_than => $horizon, retain_last => 1)").collect()
    val e = intercept[Exception](spark.sql(
      "CALL pcat14.system.refresh_mv(table => 'ns.mv')").collect())
    assert(e.getMessage.contains("reseed"),
      s"stuck refresh must name the recovery path, got: ${e.getMessage}")
    // reseed rebuilds from the source head and re-arms incremental refresh
    graft.iceberg.MaterializedViews.reseed(spark, s"$ns/mv", s"$ns/src")
    def mv(): Seq[(String, Long, Long)] =
      spark.sql("SELECT k, cnt, sv FROM pcat14.ns.mv ORDER BY k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mv() == Seq(("a", 1L, 1L), ("b", 1L, 2L), ("c", 1L, 3L)))
    spark.sql("INSERT INTO pcat14.ns.src VALUES ('d', 4)")
    val r = spark.sql("CALL pcat14.system.refresh_mv(table => 'ns.mv')").collect()
    assert(r.head.getInt(1) == 1, "post-reseed refresh is incremental again")
    assert(mv() ==
      Seq(("a", 1L, 1L), ("b", 1L, 2L), ("c", 1L, 3L), ("d", 1L, 4L)))
  }
}
