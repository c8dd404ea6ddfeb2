package graft

import org.apache.hadoop.fs.Path

import graft.iceberg.{IcebergTable, PartitionStats}

/** Dual-path gate for the r21 driver-direct partition-stats IO: the
  * driver-direct writer/reader (zero Spark jobs) and the one-task Spark
  * job form must be interchangeable — same entries through every
  * writer × reader combination, same parquet schema (field ids included)
  * on disk. Tables whose tuple types fall outside the proven set take
  * the job form automatically (writeFile's simpleTuple guard). */
class PartitionStatsIOSpec extends SparkSpec {

  test("driver-direct and job-form stats files are interchangeable") {
    val wh = Scratch.dir("pstats-io-spec")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(wh).getFileSystem(conf)
    fs.delete(new Path(wh), true)
    spark.conf.set("spark.sql.catalog.psio_cat",
      classOf[graft.iceberg.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.psio_cat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS psio_cat.ns")
    spark.sql(
      """CREATE TABLE psio_cat.ns.t (k BIGINT, s STRING, d DATE)
        |PARTITIONED BY (s, bucket(4, k), days(d))""".stripMargin)
    spark.sql(
      """INSERT INTO psio_cat.ns.t VALUES
        |(1, 'a', DATE'2024-01-01'), (2, 'a', DATE'2024-01-02'),
        |(3, 'b', DATE'2024-01-01'), (4, NULL, NULL),
        |(5, 'c', DATE'1969-07-20')""".stripMargin)
    val dir = s"$wh/ns/t"
    val t = new IcebergTable(dir, conf)
    val meta = t.metadata
    val sid = meta.currentSnapshotId.get
    val rows = PartitionStats.rollup(t).map(e => e.copy(
      lastUpdatedAt = Some(1234567890123L), lastUpdatedSnapshotId = Some(sid)))
    assert(rows.size >= 4, s"want several partitions, got ${rows.size}")

    val schema = PartitionStats.fileSchema(meta)
    val data = PartitionStats.fileRows(schema, rows)
    val direct = new Path(dir, "metadata/psio-direct.parquet")
    PartitionStats.writeDriverDirect(direct, schema, data, conf)
    val (jobPath, _) = PartitionStats.writeViaJob(spark, dir, sid, schema, data)

    // same parquet schema on disk, field ids included
    def footerSchema(p: Path) = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try r.getFooter.getFileMetaData.getSchema.toString finally r.close()
    }
    assert(footerSchema(direct) == footerSchema(new Path(jobPath)))

    // every writer x reader combination returns identical entries
    val combos = for {
      file <- Seq(direct.toString, jobPath)
      viaJob <- Seq(false, true)
    } yield {
      val got =
        if (viaJob) PartitionStats.readFileViaJob(spark, file)
        else PartitionStats.readDriverDirect(file, conf).getOrElse(
          fail(s"driver-direct reader refused $file"))
      (file, viaJob, got)
    }
    val want = combos.head._3
    combos.foreach { case (f, vj, got) =>
      assert(got == want, s"file=$f viaJob=$vj")
    }
    // and the round trip reproduces the logical entries (the repr +
    // counters the partitions metadata table serves)
    assert(want.map(e => (e.partitionRepr, e.specId, e.dataFileCount,
        e.dataRecordCount, e.lastUpdatedAt, e.lastUpdatedSnapshotId)) ==
      rows.map(e => (e.partitionRepr, e.specId, e.dataFileCount,
        e.dataRecordCount, e.lastUpdatedAt, e.lastUpdatedSnapshotId)))
    spark.sql("DROP TABLE psio_cat.ns.t")
  }

  test("maintained chain + partitions metadata table stay bit-identical") {
    val wh = Scratch.dir("pstats-io-spec2")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(wh).getFileSystem(conf)
    fs.delete(new Path(wh), true)
    spark.conf.set("spark.sql.catalog.psio2_cat",
      classOf[graft.iceberg.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.psio2_cat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS psio2_cat.ns")
    spark.sql(
      """CREATE TABLE psio2_cat.ns.t (k BIGINT, s STRING)
        |PARTITIONED BY (s)
        |TBLPROPERTIES ('graft.partition-statistics' = 'true')""".stripMargin)
    spark.sql("INSERT INTO psio2_cat.ns.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO psio2_cat.ns.t VALUES (3, 'a'), (4, 'c')")
    val dir = s"$wh/ns/t"
    val t = new IcebergTable(dir, conf)
    // incremental chain maintained (one stats entry per append snapshot)
    assert(t.metadata.partitionStatistics.nonEmpty)
    val served = spark.sql(
      "SELECT partition, file_count, record_count FROM " +
        "psio2_cat.ns.t.`partitions` ORDER BY partition").collect()
    val recomputed = PartitionStats.rollup(t)
    assert(served.map(_.getString(0)).toSeq ==
      recomputed.map(_.partitionRepr).toSeq)
    assert(served.map(_.getLong(2)).toSeq ==
      recomputed.map(_.dataRecordCount).toSeq)
    spark.sql("DROP TABLE psio2_cat.ns.t")
  }
}
