package graft

import org.apache.hadoop.fs.Path

import graft.iceberg.TableMetadata
import graft.iceberg.connector.GraftCatalog

/** `CALL cat.system.snapshot(...)` / `register_table(...)`: zero-copy
  * clone + metadata adoption. Every effect asserted through independent
  * reads of BOTH tables — the whole point is that they stay independent
  * while sharing files.
  */
class TableCloneSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/clone-warehouse"
  private def conf = spark.sessionState.newHadoopConf()

  private def fresh(cat: String): String = {
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    s"$warehouse/ns"
  }

  test("snapshot clones current state zero-copy; writes diverge both ways") {
    val ns = fresh("ccat")
    spark.sql("CREATE TABLE ccat.ns.src (k BIGINT, v STRING)")
    spark.sql("INSERT INTO ccat.ns.src VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO ccat.ns.src VALUES (3, 'c')")
    val srcDir = s"$ns/src"
    val srcMetaBefore = TableMetadata.load(srcDir, conf)

    val Seq(row) = spark.sql(
      "CALL ccat.system.snapshot(source_table => 'ns.src', " +
        "table => 'ns.clone')").collect().toSeq
    assert(row.getLong(0) === srcMetaBefore.currentSnapshotId.get)

    // zero-copy: the clone's data directory does not even exist yet
    val cloneDir = s"$ns/clone"
    assert(!new Path(s"$cloneDir/data").getFileSystem(conf)
      .exists(new Path(s"$cloneDir/data")), "clone copied data files")
    val cloneMeta = TableMetadata.load(cloneDir, conf)
    assert(cloneMeta.snapshots.size === 1, "history truncates to one snapshot")
    assert(cloneMeta.snapshots.head.parentSnapshotId.isEmpty)
    assert(cloneMeta.properties.get("gc.enabled").contains("false"))

    // identical content through the catalog
    assert(spark.sql("SELECT * FROM ccat.ns.clone ORDER BY k").collect().toSeq
      === spark.sql("SELECT * FROM ccat.ns.src ORDER BY k").collect().toSeq)

    // clone writes land under the clone; the source never sees them
    spark.sql("INSERT INTO ccat.ns.clone VALUES (100, 'clone-only')")
    assert(spark.sql("SELECT COUNT(*) FROM ccat.ns.clone").head.getLong(0) === 4)
    assert(spark.sql("SELECT COUNT(*) FROM ccat.ns.src").head.getLong(0) === 3)
    val cloneFiles = new graft.iceberg.IcebergTable(cloneDir, conf)
      .planFiles().map(_.filePath)
    assert(cloneFiles.exists(_.contains("/clone/")),
      s"new clone files under the clone location: $cloneFiles")
    assert(cloneFiles.exists(_.contains("/src/")),
      s"borrowed files still under the source location: $cloneFiles")

    // source writes stay invisible to the clone
    spark.sql("INSERT INTO ccat.ns.src VALUES (200, 'src-only')")
    assert(spark.sql("SELECT COUNT(*) FROM ccat.ns.src").head.getLong(0) === 4)
    assert(spark.sql("SELECT COUNT(*) FROM ccat.ns.clone").head.getLong(0) === 4)

    // a clone DELETE (merge-on-read position delete against a borrowed
    // file) must not touch the source either
    spark.sql("DELETE FROM ccat.ns.clone WHERE k = 1")
    assert(spark.sql("SELECT COUNT(*) FROM ccat.ns.clone").head.getLong(0) === 3)
    assert(spark.sql("SELECT COUNT(*) FROM ccat.ns.src").head.getLong(0) === 4)
  }

  test("clone maintenance that deletes files refuses on gc.enabled=false") {
    val ns = fresh("ccat2")
    spark.sql("CREATE TABLE ccat2.ns.src (k BIGINT)")
    spark.sql("INSERT INTO ccat2.ns.src VALUES (1)")
    spark.sql("CALL ccat2.system.snapshot(source_table => 'ns.src', " +
      "table => 'ns.clone')")
    spark.sql("INSERT INTO ccat2.ns.clone VALUES (2)")
    val horizon = System.currentTimeMillis() + 3600 * 1000
    val e1 = intercept[Exception](spark.sql(
      s"CALL ccat2.system.expire_snapshots(table => 'ns.clone', " +
        s"older_than => $horizon)").collect())
    assert(e1.getMessage.contains("gc.enabled"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"CALL ccat2.system.remove_orphan_files(table => 'ns.clone', " +
        s"older_than => $horizon)").collect())
    assert(e2.getMessage.contains("gc.enabled"), e2.getMessage)
    // the source (gc enabled) still expires normally
    val Seq(row) = spark.sql(
      s"CALL ccat2.system.expire_snapshots(table => 'ns.src', " +
        s"older_than => $horizon, retain_last => 1)").collect().toSeq
    assert(row.getInt(0) === 0) // single snapshot: nothing to expire
  }

  test("compaction localizes a clone: borrowed files drop out of its metadata") {
    val ns = fresh("ccat3")
    spark.sql("CREATE TABLE ccat3.ns.src (k BIGINT)")
    spark.sql("INSERT INTO ccat3.ns.src SELECT id FROM range(10)")
    spark.sql("CALL ccat3.system.snapshot(source_table => 'ns.src', " +
      "table => 'ns.clone')")
    spark.sql("CALL ccat3.system.rewrite_data_files(table => 'ns.clone')")
    val cloneFiles = new graft.iceberg.IcebergTable(s"$ns/clone", conf)
      .planFiles().map(_.filePath)
    assert(cloneFiles.nonEmpty && cloneFiles.forall(_.contains("/clone/")),
      s"after compaction every live clone file is clone-owned: $cloneFiles")
    // the borrowed file is metadata-dropped, never physically deleted
    assert(spark.sql("SELECT COUNT(*) FROM ccat3.ns.src").head.getLong(0) === 10)
    assert(spark.sql("SELECT COUNT(*) FROM ccat3.ns.clone").head.getLong(0) === 10)
  }

  test("snapshot refuses empty sources, existing targets, and bad namespaces") {
    val ns = fresh("ccat4")
    spark.sql("CREATE TABLE ccat4.ns.empty (k BIGINT)")
    spark.sql("CREATE TABLE ccat4.ns.src (k BIGINT)")
    spark.sql("INSERT INTO ccat4.ns.src VALUES (1)")
    val e1 = intercept[Exception](spark.sql(
      "CALL ccat4.system.snapshot(source_table => 'ns.empty', " +
        "table => 'ns.c1')").collect())
    assert(e1.getMessage.contains("no current snapshot"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "CALL ccat4.system.snapshot(source_table => 'ns.src', " +
        "table => 'ns.src')").collect())
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      "CALL ccat4.system.snapshot(source_table => 'ns.src', " +
        "table => 'nope.c1')").collect())
    assert(e3.getMessage.contains("does not exist"), e3.getMessage)
  }

  test("register_table adopts a metadata document with full history") {
    val ns = fresh("ccat5")
    spark.sql("CREATE TABLE ccat5.ns.src (k BIGINT, v STRING)")
    spark.sql("INSERT INTO ccat5.ns.src VALUES (1, 'a')")
    spark.sql("INSERT INTO ccat5.ns.src VALUES (2, 'b')")
    val srcDir = s"$ns/src"
    val metaFile = TableMetadata.latestMetadataPath(srcDir, conf).toString
    val firstSnap = TableMetadata.load(srcDir, conf).snapshotLineage.head

    val Seq(row) = spark.sql(
      s"CALL ccat5.system.register_table(table => 'ns.adopted', " +
        s"metadata_file => '$metaFile')").collect().toSeq
    assert(row.getInt(0) === 2, "both snapshots adopted")
    assert(row.getLong(1) ===
      TableMetadata.load(srcDir, conf).currentSnapshotId.get)

    assert(spark.sql("SELECT * FROM ccat5.ns.adopted ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // full history: time travel to the first snapshot works
    assert(spark.sql(
      s"SELECT COUNT(*) FROM ccat5.ns.adopted VERSION AS OF $firstSnap")
      .head.getLong(0) === 1)
  }
}
