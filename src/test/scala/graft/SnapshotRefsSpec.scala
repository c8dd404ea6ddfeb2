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
}
