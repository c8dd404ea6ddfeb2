package graft

import org.apache.hadoop.fs.Path

import graft.iceberg.IcebergTable
import graft.iceberg.connector.GraftCatalog

/** The alternate-scheme FileSystem gate: all storage goes through Hadoop
  * `FileSystem` URIs, and NOTHING may assume the local `file:` scheme —
  * a real deployment's first act is pointing the warehouse at an object
  * store. This suite registers a test scheme (`graftfs`, a
  * RawLocalFileSystem that reports a non-file URI) and drives the full
  * table lifecycle through it: CREATE TABLE → INSERT → merge-on-read
  * DELETE → read → compaction → time travel → streaming sink → CDC.
  * Any component that qualifies, normalizes, or compares paths assuming
  * the local scheme — committer create-new atomicity, `normPath`
  * identity joins, `GraftPrunedFileIndex` qualification, footer probes,
  * manifest IO — fails here.
  */
class AltFsSpec extends SparkSpec {

  private val scheme = "graftfs"
  private val localRoot = "/root/repo/target/altfs-warehouse"
  private val warehouse = s"$scheme://$localRoot"

  private def conf = {
    // visible to every newHadoopConf() derived from the shared context
    spark.sparkContext.hadoopConfiguration
      .set(s"fs.$scheme.impl", classOf[GraftTestFileSystem].getName)
    // the committer's atomicity guard only knows the built-in schemes;
    // graftfs is a RawLocalFileSystem (true exclusive create), so the
    // operator asserts it through the documented escape hatch
    spark.sparkContext.hadoopConfiguration
      .set(graft.iceberg.FsCommitter.AtomicSchemesConf, scheme)
    spark.sessionState.newHadoopConf()
  }

  test("full table lifecycle over a non-file scheme") {
    val c = conf
    new Path(warehouse).getFileSystem(c).delete(new Path(warehouse), true)
    spark.conf.set("spark.sql.catalog.afs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.afs.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS afs.ns")
    spark.sql(
      """CREATE TABLE afs.ns.t (k BIGINT, v STRING)
        |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO afs.ns.t SELECT id, concat('v', id) FROM range(100)")
    spark.sql("INSERT INTO afs.ns.t SELECT id, concat('v', id) FROM range(100, 200)")
    spark.sql("DELETE FROM afs.ns.t WHERE k >= 190")

    val dir = s"$warehouse/ns/t"
    val t0 = new IcebergTable(dir, c)
    assert(t0.hasDeletes, "MoR DELETE must land delete files, not rewrite")
    assert(t0.metadata.location.startsWith(s"$scheme:"),
      s"table location must carry the scheme, got ${t0.metadata.location}")
    def total(): Long =
      spark.sql("SELECT COUNT(*) AS n FROM afs.ns.t").head.getLong(0)
    assert(total() == 190, "merge-on-read scan through the alt scheme")
    assert(spark.sql("SELECT CAST(SUM(k) AS BIGINT) AS s FROM afs.ns.t")
      .head.getLong(0) == (0L until 190L).sum)

    // compaction rewrites data + delete files through the same FS
    spark.sql("CALL afs.system.rewrite_data_files(table => 'ns.t')").collect()
    assert(!new IcebergTable(dir, c).hasDeletes,
      "compaction must absorb the delete files")
    assert(total() == 190, "row set preserved through compaction")

    // time travel: version 2 = after both inserts, before the delete
    assert(spark.sql("SELECT COUNT(*) AS n FROM afs.ns.t VERSION AS OF 2")
      .head.getLong(0) == 200)

    // CDC window across the delete commit
    val lineage = new IcebergTable(dir, c).metadata.snapshotLineage
    val changes = new IcebergTable(dir, c)
      .changesBetween(spark, lineage(1), lineage(2))
    assert(changes.filter(org.apache.spark.sql.functions
      .col("_change_type") === "delete").count() == 10)
  }

  test("streaming sink commits through the alternate scheme") {
    val c = conf
    spark.conf.set("spark.sql.catalog.afs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.afs.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS afs.ns")
    spark.sql("DROP TABLE IF EXISTS afs.ns.st")
    spark.sql("CREATE TABLE afs.ns.st (event_id BIGINT, tag STRING)")
    val dir = s"$warehouse/ns/st"

    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = streaming.EventStream
      .icebergSink(mem.toDF.toDF("event_id", "tag"), dir)
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val t = new IcebergTable(dir, c)
    assert(t.metadata.snapshots.size == 2,
      s"one snapshot per micro-batch, got ${t.metadata.snapshots.size}")
    assert(spark.sql("SELECT COUNT(*) AS n FROM afs.ns.st").head.getLong(0) == 3)
  }

  test("a scheme without exclusive create is REFUSED before any write, " +
      "naming the REST catalog path") {
    // same local FS, different scheme — and deliberately NOT asserted
    // through the escape-hatch conf, so the committer must refuse it
    val bad = "graftblob"
    spark.sparkContext.hadoopConfiguration
      .set(s"fs.$bad.impl", classOf[GraftBlobFileSystem].getName)
    val c = spark.sessionState.newHadoopConf()
    val dir = s"$bad://$localRoot-blob/ns/t"
    val ex = intercept[UnsupportedOperationException](
      new graft.iceberg.FsCommitter(dir, c))
    assert(ex.getMessage.contains(bad) && ex.getMessage.contains("REST"),
      s"refusal must name the scheme and the REST alternative: ${ex.getMessage}")
    assert(ex.getMessage.contains(graft.iceberg.FsCommitter.AtomicSchemesConf),
      "refusal must name the operator escape hatch")
    // the escape hatch unblocks the same scheme
    val c2 = spark.sessionState.newHadoopConf()
    c2.set(graft.iceberg.FsCommitter.AtomicSchemesConf, s"graftfs,$bad")
    new graft.iceberg.FsCommitter(dir, c2) // must not throw
  }
}

/** A second alternate scheme, used UN-allowlisted to drive the
  * atomicity-guard refusal. */
class GraftBlobFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftblob"
  override def getUri: java.net.URI = java.net.URI.create("graftblob:///")
}

/** `file:`-backed local filesystem that REPORTS a different scheme —
  * the offline stand-in for an object-store FileSystem. Raw (no .crc
  * shadow files), so directory listings match what a blob store would
  * show. Registered per-suite via `fs.graftfs.impl`. */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
