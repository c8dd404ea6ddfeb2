package graft

import java.io.File

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import graft.iceberg.{IcebergTable, IcebergWriter}
import graft.iceberg.connector.{GraftCatalog, IcebergJson}

/** Snapshot refs (branches/tags) and incremental append reads:
  *
  *  - `createRef` pins a named snapshot; `VERSION AS OF '<name>'` resolves
  *    it through the catalog; `dropRef` removes it; a ref'd snapshot
  *    survives `expireSnapshots`;
  *  - `appendedBetween` reads exactly the rows appended between two
  *    snapshots via a manifest-level file diff, and REFUSES windows
  *    containing overwrites or new delete files (the diff would not be
  *    "the appended rows").
  */
class SnapshotRefsSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/test-refs-warehouse"

  /** Fresh empty table (no snapshot) at `$warehouse/ns/$name`. */
  private def createTable(name: String, df: org.apache.spark.sql.DataFrame): String = {
    val tableDir = s"$warehouse/ns/$name"
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(tableDir).getFileSystem(conf)
    fs.delete(new Path(tableDir), true)
    val metaJson = IcebergJson.tableMetadata(
      new com.fasterxml.jackson.databind.ObjectMapper(), tableDir,
      df.schema, Nil, Map.empty)
    val out = fs.create(new Path(s"$tableDir/metadata/v1.metadata.json"), true)
    try out.write(metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    tableDir
  }

  private def ids(n: Int, m: Int) = {
    import spark.implicits._
    (n until m).map(i => (i.toLong, s"row$i")).toDF("id", "tag")
  }

  test("createRef pins a tag; VERSION AS OF resolves it; dropRef removes it") {
    val dir = createTable("t1", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, ids(0, 3))
    IcebergWriter.append(spark, dir, ids(3, 5))
    IcebergWriter.createRef(conf, dir, "validated", s1)

    spark.conf.set("spark.sql.catalog.refcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.refcat.warehouse", warehouse)
    assert(spark.sql("SELECT COUNT(*) FROM refcat.ns.t1 VERSION AS OF 'validated'")
      .collect()(0).getLong(0) == 3L)
    assert(spark.sql("SELECT COUNT(*) FROM refcat.ns.t1").collect()(0).getLong(0) == 5L)

    IcebergWriter.dropRef(conf, dir, "validated")
    val err = intercept[Exception] {
      spark.sql("SELECT COUNT(*) FROM refcat.ns.t1 VERSION AS OF 'validated'").collect()
    }
    assert(err.getMessage.contains("validated") || err.getMessage.contains("ref"))
    // `main` remains (every commit maintains it); only the tag is gone
    assert(!new IcebergTable(dir, conf).metadata.refs.contains("validated"))
  }

  test("a ref'd snapshot survives expiration; unref'd history expires") {
    val dir = createTable("t2", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, ids(0, 2))
    IcebergWriter.append(spark, dir, ids(2, 4))
    IcebergWriter.append(spark, dir, ids(4, 6))
    IcebergWriter.createRef(conf, dir, "keepme", s1)

    val expired = IcebergWriter.expireSnapshots(spark, dir,
      olderThanMs = Long.MaxValue, retainLast = 1)
    assert(expired == 1, "only the middle (unref'd, non-current) snapshot expires")
    val t = new IcebergTable(dir, conf)
    assert(t.metadata.snapshots.map(_.snapshotId).toSet ==
      t.metadata.refs.values.toSet + t.metadata.currentSnapshotId.get)
    // the tag still reads its full original content
    assert(t.atSnapshot(s1).toDF(spark).count() == 2L)
  }

  test("rollback: moving main is a metadata-only undo") {
    val dir = createTable("t3", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, ids(0, 3))
    IcebergWriter.append(spark, dir, ids(3, 9))
    IcebergWriter.createRef(conf, dir, "main", s1, refType = "branch")
    assert(new IcebergTable(dir, conf).toDF(spark).count() == 3L,
      "current reads must see the rolled-back state")
  }

  test("appendedBetween returns exactly the appended rows") {
    val dir = createTable("t4", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, ids(0, 3))
    val s2 = IcebergWriter.append(spark, dir, ids(3, 7))
    val s3 = IcebergWriter.append(spark, dir, ids(7, 8))
    val t = new IcebergTable(dir, conf)
    assert(t.appendedBetween(spark, s1, s2).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == (3L until 7L))
    assert(t.appendedBetween(spark, s1, s3).count() == 5L) // spans two commits
    assert(t.appendedBetween(spark, s3, s3).count() == 0L)
  }

  test("appendedBetween refuses non-append windows") {
    val dir = createTable("t5", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, ids(0, 3))
    val s2 = IcebergWriter.overwrite(spark, dir, ids(10, 12))
    val t = new IcebergTable(dir, conf)
    intercept[UnsupportedOperationException] {
      t.appendedBetween(spark, s1, s2)
    }
    // new delete files in the window also refuse
    val dir2 = createTable("t6", ids(0, 1))
    val s3 = IcebergWriter.append(spark, dir2, ids(0, 5))
    import org.apache.spark.sql.sources.EqualTo
    val s4 = IcebergWriter.deleteWhere(spark, dir2, Seq(EqualTo("id", 2L)))
    val t2 = new IcebergTable(dir2, conf)
    intercept[UnsupportedOperationException] {
      t2.appendedBetween(spark, s3, s4)
    }
  }

  // -- write-audit-publish ---------------------------------------------------

  test("WAP: branch writes stack on the branch, main unmoved, fastForward publishes") {
    val dir = createTable("t7", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, ids(0, 3)) // main: 0,1,2
    // stage on the branch: an append AND an equality delete
    IcebergWriter.append(spark, dir, ids(3, 6), branch = "audit")
    import org.apache.spark.sql.sources.In
    IcebergWriter.deleteWhere(spark, dir, Seq(In("id", Array(0L))),
      branch = "audit")
    val t = new IcebergTable(dir, conf)
    assert(t.metadata.currentSnapshotId.contains(s1), "main must not move")
    assert(t.toDF(spark).count() == 3L, "main still reads the pre-WAP rows")
    val branchHead = t.metadata.refs("audit")
    assert(t.atSnapshot(branchHead).toDF(spark).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
      "branch reads staged insert minus staged delete")
    // publish
    val published = IcebergWriter.fastForward(conf, dir, from = "audit")
    val t2 = new IcebergTable(dir, conf)
    assert(t2.metadata.currentSnapshotId.contains(published))
    assert(t2.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("WAP: fastForward refuses a diverged target and a tag target; tags refuse writes") {
    val dir = createTable("t8", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, ids(0, 2))
    IcebergWriter.append(spark, dir, ids(2, 4), branch = "audit")
    // main advances after the fork → publish must refuse (not a FF)
    IcebergWriter.append(spark, dir, ids(10, 11))
    val err = intercept[IllegalArgumentException] {
      IcebergWriter.fastForward(conf, dir, from = "audit")
    }
    assert(err.getMessage.contains("not a fast-forward"))
    // tag targets are immutable: no fast-forward onto them, no writes
    IcebergWriter.createRef(conf, dir, "pinned", s1, refType = "tag")
    val e2 = intercept[IllegalArgumentException] {
      IcebergWriter.fastForward(conf, dir, from = "audit", target = "pinned")
    }
    assert(e2.getMessage.contains("tag"))
    val e3 = intercept[IllegalArgumentException] {
      IcebergWriter.append(spark, dir, ids(20, 21), branch = "pinned")
    }
    assert(e3.getMessage.contains("tag"))
  }

  test("WAP: expiration keeps an unpublished branch's ancestor chain publishable") {
    val dir = createTable("t9", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    IcebergWriter.append(spark, dir, ids(0, 2))
    // three staged commits on the branch — the first two are intermediate
    IcebergWriter.append(spark, dir, ids(2, 3), branch = "audit")
    IcebergWriter.append(spark, dir, ids(3, 4), branch = "audit")
    IcebergWriter.append(spark, dir, ids(4, 5), branch = "audit")
    IcebergWriter.expireSnapshots(spark, dir,
      olderThanMs = Long.MaxValue, retainLast = 1)
    // the chain from the branch head back to main's head survived, so the
    // branch is still publishable
    val published = IcebergWriter.fastForward(conf, dir, from = "audit")
    val t = new IcebergTable(dir, conf)
    assert(t.metadata.currentSnapshotId.contains(published))
    assert(t.toDF(spark).count() == 5L)
  }

  test("WAP: cherry-pick publishes ONE staged append, branch intact") {
    val dir = createTable("t10", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, ids(0, 2)) // main: 0,1
    // two independently staged appends on the branch
    val c1 = IcebergWriter.append(spark, dir, ids(10, 12), branch = "audit")
    val c2 = IcebergWriter.append(spark, dir, ids(20, 22), branch = "audit")
    // main advances past the fork — fastForward is now impossible ...
    IcebergWriter.append(spark, dir, ids(2, 3))
    assertThrows[IllegalArgumentException](
      IcebergWriter.fastForward(conf, dir, from = "audit"))
    // ... but cherry-picking the SECOND staged commit alone still works
    val newId = IcebergWriter.cherrypickSnapshot(conf, dir, c2)
    val t = new IcebergTable(dir, conf)
    assert(t.metadata.currentSnapshotId.contains(newId))
    assert(t.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(0L, 1L, 2L, 20L, 21L),
      "main gains exactly the cherry-picked commit's rows")
    val snap = t.metadata.snapshots.find(_.snapshotId == newId).get
    assert(snap.summary.get("source-snapshot-id").contains(c2.toString))
    assert(snap.summary.get("total-records").contains("5"))
    // the branch did not move and still reads its own staged view
    assert(t.metadata.refs("audit") == c2)
    assert(t.atSnapshot(c2).toDF(spark).count() == 6L)
    // double publish is refused (the ancestry summary guard fires first;
    // the file-granularity overlap guard backstops foreign writers)
    val dup = intercept[IllegalArgumentException](
      IcebergWriter.cherrypickSnapshot(conf, dir, c2))
    assert(dup.getMessage.contains("already cherry-picked") ||
      dup.getMessage.contains("already reachable"))
    // c1 remains independently publishable
    val newId2 = IcebergWriter.cherrypickSnapshot(conf, dir, c1)
    val t2 = new IcebergTable(dir, conf)
    assert(t2.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(0L, 1L, 2L, 10L, 11L, 20L, 21L))
    assert(t2.metadata.currentSnapshotId.contains(newId2))
    assert(s1 > 0)
  }

  test("WAP: cherry-pick refuses non-append and already-published snapshots") {
    val dir = createTable("t11", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, ids(0, 3))
    // a staged DELETE is not an append
    import org.apache.spark.sql.sources.In
    IcebergWriter.deleteWhere(spark, dir, Seq(In("id", Array(0L))),
      branch = "audit")
    val staged = new IcebergTable(dir, conf).metadata.refs("audit")
    val e1 = intercept[IllegalArgumentException](
      IcebergWriter.cherrypickSnapshot(conf, dir, staged))
    assert(e1.getMessage.contains("only pure append"))
    // a snapshot already on main has nothing to publish
    val e2 = intercept[IllegalArgumentException](
      IcebergWriter.cherrypickSnapshot(conf, dir, s1))
    assert(e2.getMessage.contains("already in main's ancestry"))
  }

  test("SQL: CALL cherrypick_snapshot publishes through the catalog") {
    val wh = "/root/repo/target/test-refs-sqlwh"
    new java.io.File(wh).delete()
    spark.conf.set("spark.sql.catalog.cpcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cpcat.warehouse", wh)
    spark.sql("DROP TABLE IF EXISTS cpcat.ns.t")
    spark.sql("CREATE TABLE cpcat.ns.t (id BIGINT, tag STRING)")
    spark.sql("INSERT INTO cpcat.ns.t VALUES (1, 'a')")
    spark.sql("ALTER TABLE cpcat.ns.t CREATE BRANCH audit")
    spark.conf.set("spark.wap.branch", "audit")
    try spark.sql("INSERT INTO cpcat.ns.t VALUES (2, 'staged')")
    finally spark.conf.unset("spark.wap.branch")
    val dir = s"$wh/ns/t"
    val conf = spark.sessionState.newHadoopConf()
    val staged = new IcebergTable(dir, conf).metadata.refs("audit")
    val Seq(row) = spark.sql("CALL cpcat.system.cherrypick_snapshot(" +
      s"table => 'ns.t', snapshot_id => $staged)").collect().toSeq
    assert(row.getLong(0) == staged)
    assert(spark.sql("SELECT id FROM cpcat.ns.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("TIMESTAMP AS OF resolves on MAIN's lineage, never a staged branch snapshot") {
    val dir = createTable("t12", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, ids(0, 2))
    Thread.sleep(5)
    // a commit staged on a branch is NEWER than s1 but not on main
    IcebergWriter.append(spark, dir, ids(10, 12), branch = "audit")
    Thread.sleep(5)
    val after = System.currentTimeMillis
    val t = new IcebergTable(dir, conf)
    // a bound after the staged commit must still resolve to MAIN's head
    assert(t.asOfTimestamp(after).pinnedSnapshotId.contains(s1),
      "timestamp travel must not leak an unpublished staged snapshot")
  }

  test("WAP: cherry-pick refuses a re-pick even after main compaction moved the files") {
    val dir = createTable("t13", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    IcebergWriter.append(spark, dir, ids(0, 3))
    val c1 = IcebergWriter.append(spark, dir, ids(10, 12), branch = "audit")
    IcebergWriter.cherrypickSnapshot(conf, dir, c1)
    // compaction rewrites every published file path — the file-overlap
    // guard alone can no longer catch a second pick
    IcebergWriter.compact(spark, dir)
    val e = intercept[IllegalArgumentException](
      IcebergWriter.cherrypickSnapshot(conf, dir, c1))
    assert(e.getMessage.contains("already cherry-picked"), e.getMessage)
    assert(new IcebergTable(dir, conf).toDF(spark).count() == 5L,
      "no duplicated rows")
    // even EXPIRING the pick commit (its summary gone from main history)
    // cannot re-open the window: the table-property ledger survives
    IcebergWriter.expireSnapshots(spark, dir,
      olderThanMs = Long.MaxValue, retainLast = 1)
    val e2 = intercept[IllegalArgumentException](
      IcebergWriter.cherrypickSnapshot(conf, dir, c1))
    assert(e2.getMessage.contains("already cherry-picked"), e2.getMessage)
    assert(new IcebergTable(dir, conf).toDF(spark).count() == 5L)
  }

  test("SQL: spark.wap.branch routes INSERT, equality DELETE, and UPDATE") {
    val dir = createTable("t10", ids(0, 1))
    IcebergWriter.append(spark, dir, ids(0, 3))
    spark.conf.set("spark.sql.catalog.refcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.refcat.warehouse", warehouse)
    spark.sql("ALTER TABLE refcat.ns.t10 CREATE BRANCH audit")
    spark.conf.set("spark.wap.branch", "audit")
    try {
      spark.sql("INSERT INTO refcat.ns.t10 VALUES (7, 'row7')")
      spark.sql("DELETE FROM refcat.ns.t10 WHERE id = 0")
      // UPDATE under WAP auto-routes to merge-on-read deltas staged on the
      // branch (MergeOnReadSpec pins the full semantics; an explicit
      // write.update.mode=copy-on-write still refuses)
      spark.sql("UPDATE refcat.ns.t10 SET tag = 'x' WHERE id = 1")
    } finally spark.conf.unset("spark.wap.branch")
    assert(spark.sql("SELECT COUNT(*) FROM refcat.ns.t10")
      .head().getLong(0) == 3L, "main unchanged until publish")
    assert(spark.sql("SELECT tag FROM refcat.ns.t10 WHERE id = 1")
      .head().getString(0) != "x", "main must not see the staged UPDATE")
    val branchRows = spark.sql(
      "SELECT id, tag FROM refcat.ns.t10 VERSION AS OF 'audit'")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(branchRows.keySet == Set(1L, 2L, 7L))
    assert(branchRows(1L) == "x", "staged UPDATE visible on the branch")
  }

  test("SQL: CREATE/DROP BRANCH and TAG DDL") {
    val dir = createTable("t11", ids(0, 1))
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, ids(0, 2))
    IcebergWriter.append(spark, dir, ids(2, 5))
    spark.conf.set("spark.sql.catalog.refcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.refcat.warehouse", warehouse)
    spark.sql(s"ALTER TABLE refcat.ns.t11 CREATE TAG v1 AS OF VERSION $s1")
    spark.sql("ALTER TABLE refcat.ns.t11 CREATE BRANCH dev")
    val meta = new IcebergTable(dir, conf).metadata
    assert(meta.refs("v1") == s1 && meta.tagRefs.contains("v1"))
    assert(meta.refs("dev") == meta.currentSnapshotId.get &&
      !meta.tagRefs.contains("dev"))
    assert(spark.sql("SELECT COUNT(*) FROM refcat.ns.t11 VERSION AS OF 'v1'")
      .head().getLong(0) == 2L)
    // duplicate refuses; IF NOT EXISTS no-ops
    intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE refcat.ns.t11 CREATE BRANCH dev")
    }
    spark.sql("ALTER TABLE refcat.ns.t11 CREATE BRANCH IF NOT EXISTS dev")
    // kind must match on drop
    intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE refcat.ns.t11 DROP BRANCH v1")
    }
    spark.sql("ALTER TABLE refcat.ns.t11 DROP TAG v1")
    spark.sql("ALTER TABLE refcat.ns.t11 DROP BRANCH dev")
    spark.sql("ALTER TABLE refcat.ns.t11 DROP BRANCH IF EXISTS dev")
    intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE refcat.ns.t11 DROP BRANCH dev")
    }
    val after = new IcebergTable(dir, conf).metadata.refs.keySet
    assert(after == Set("main"))
  }
}
