package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.iceberg.{IcebergTable, IcebergWriter}
import graft.iceberg.connector.GraftCatalog

/** The AVRO write kernel: `write.format-default = avro` routes the
  * shared fanout writer through avro-core — the final cell of the spec's
  * format matrix (reads + writes for parquet, ORC, and Avro). Unlike
  * ORC, avro decode order IS the spec's row position, so avro-WRITTEN
  * files keep the full merge-on-read surface.
  */
class AvroWriteSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/avrow-warehouse"

  private def conf = spark.sessionState.newHadoopConf()

  private def freshCatalog(): Unit = {
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set("spark.sql.catalog.awcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.awcat.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS awcat.ns")
  }

  test("CTAS with avro default writes .avro files; read-back exact " +
      "including nulls; codec lands in the container header") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE awcat.ns.a1
        |TBLPROPERTIES ('write.format-default' = 'avro',
        |               'write.avro.compression-codec' = 'snappy') AS
        |SELECT id AS k,
        |       CASE WHEN id % 7 = 0 THEN NULL ELSE concat('v', id) END AS v
        |FROM range(500)""".stripMargin)
    val t = new IcebergTable(s"$warehouse/ns/a1", conf)
    val files = t.planFiles()
    assert(files.nonEmpty && files.forall(_.fileFormat == "AVRO"))
    assert(files.forall(_.filePath.endsWith(".avro")))
    assert(files.map(_.recordCount).sum == 500L, "exact writer row counts")
    // container header carries the declared codec
    val reader = new org.apache.avro.file.DataFileReader[
        org.apache.avro.generic.GenericRecord](
      new org.apache.avro.mapred.FsInput(
        new Path(t.resolve(files.head.filePath)), conf),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try assert(reader.getMetaString("avro.codec") == "snappy")
    finally reader.close()
    val r = spark.sql(
      """SELECT COUNT(*) AS n, SUM(k) AS s,
        |       COUNT(CASE WHEN v IS NULL THEN 1 END) AS nulls
        |FROM awcat.ns.a1""".stripMargin).collect()(0)
    assert(r.getLong(0) == 500L && r.getLong(1) == (0L until 500L).sum)
    assert(r.getLong(2) == (0L until 500L).count(_ % 7 == 0))
    assert(spark.sql("SELECT v FROM awcat.ns.a1 WHERE k = 43")
      .collect()(0).getString(0) == "v43")
  }

  test("merge-on-read position deletes work on avro-WRITTEN files " +
      "(true row positions — the capability ORC writes cannot have)") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE awcat.ns.a2
        |TBLPROPERTIES ('write.format-default' = 'avro',
        |               'write.delete.mode' = 'merge-on-read') AS
        |SELECT id AS k, concat('v', id) AS v FROM range(300)""".stripMargin)
    // a RANGE delete — not equality-expressible, needs true positions
    spark.sql("DELETE FROM awcat.ns.a2 WHERE k >= 250 AND k < 280")
    val t = new IcebergTable(s"$warehouse/ns/a2", conf)
    assert(t.hasDeletes, "the range DELETE must stay merge-on-read")
    assert(t.planFiles().forall(_.fileFormat == "AVRO"),
      "data files must not be rewritten")
    val r = spark.sql(
      "SELECT COUNT(*) AS n, SUM(k) AS s FROM awcat.ns.a2").collect()(0)
    assert(r.getLong(0) == 270L)
    assert(r.getLong(1) == (0L until 300L).sum - (250L until 280L).sum)
    // equality deletes stack on top
    spark.sql("DELETE FROM awcat.ns.a2 WHERE k IN (1, 2)")
    assert(spark.sql("SELECT COUNT(*) FROM awcat.ns.a2")
      .collect()(0).getLong(0) == 268L)
  }

  test("date and timestamp columns round-trip exactly (micros preserved)") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE awcat.ns.a3
        |TBLPROPERTIES ('write.format-default' = 'avro') AS
        |SELECT id AS k,
        |       date_add(DATE'2024-02-29', CAST(id AS INT)) AS d,
        |       timestamp_micros(1700000000000123 + id) AS ts
        |FROM range(10)""".stripMargin)
    val rows = spark.sql(
      "SELECT k, CAST(d AS STRING), CAST(ts AS STRING) " +
        "FROM awcat.ns.a3 ORDER BY k").collect()
    assert(rows(0).getString(1) == "2024-02-29")
    assert(rows(1).getString(1) == "2024-03-01", "leap-day arithmetic survives")
    assert(rows(0).getString(2).endsWith(".000123"),
      s"micros must survive the round-trip, got ${rows(0).getString(2)}")
  }

  test("partitioned fanout writes avro per partition tuple; pruning via " +
      "partition values still works (no column stats — doubt keeps)") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE awcat.ns.a4 (k BIGINT, g INT, v STRING)
        |PARTITIONED BY (g)
        |TBLPROPERTIES ('write.format-default' = 'avro')""".stripMargin)
    spark.sql(
      "INSERT INTO awcat.ns.a4 SELECT id, CAST(id % 3 AS INT), concat('v', id) FROM range(300)")
    val t = new IcebergTable(s"$warehouse/ns/a4", conf)
    assert(t.planFiles().forall(_.fileFormat == "AVRO"))
    assert(t.planFiles().flatMap(_.partition.get("g")).toSet == Set(0, 1, 2))
    assert(t.planFiles(Seq(org.apache.spark.sql.sources.EqualTo("g", 1)))
      .flatMap(_.partition.get("g")).toSet == Set(1),
      "partition pruning is metadata-keyed, no column stats needed")
    assert(spark.sql("SELECT COUNT(*) FROM awcat.ns.a4 WHERE g = 1")
      .collect()(0).getLong(0) == 100L)
  }

  test("copy-on-write UPDATE and non-equality DELETE work on an " +
      "all-avro table through the avro group batch") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE awcat.ns.a8
        |TBLPROPERTIES ('write.format-default' = 'avro') AS
        |SELECT id AS k, CAST(id AS DOUBLE) AS x,
        |       date_add(DATE'2024-01-01', CAST(id % 5 AS INT)) AS d
        |FROM range(200)""".stripMargin)
    // CoW UPDATE: the group scan must read the avro files (row batch)
    spark.sql("UPDATE awcat.ns.a8 SET x = x + 0.5 WHERE k % 2 = 0")
    // CoW-mode range DELETE over a large fraction forces the rewrite
    // branch too (fraction > 0.3 rewrites rather than position-deletes)
    spark.sql("DELETE FROM awcat.ns.a8 WHERE k < 100")
    val t = new IcebergTable(s"$warehouse/ns/a8", conf)
    assert(t.planFiles().forall(_.fileFormat == "AVRO"),
      "rewrites must honor the declared avro format")
    val r = spark.sql(
      "SELECT COUNT(*) AS n, SUM(x) AS s FROM awcat.ns.a8").collect()(0)
    assert(r.getLong(0) == 100L)
    val want = (100L until 200L).map(k =>
      k.toDouble + (if (k % 2 == 0) 0.5 else 0.0)).sum
    assert(math.abs(r.getDouble(1) - want) < 1e-6,
      s"update+delete must compose exactly: got ${r.getDouble(1)}, want $want")
    // date column survives the rewrite through the catalyst converter
    assert(spark.sql(
      "SELECT CAST(d AS STRING) FROM awcat.ns.a8 WHERE k = 101")
      .collect()(0).getString(0) == "2024-01-02")
  }

  test("written avro schemas carry Iceberg field-id attributes; " +
      "schema evolution refuses mutations that would brick writes") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE awcat.ns.a9
        |TBLPROPERTIES ('write.format-default' = 'avro') AS
        |SELECT id AS k, concat('v', id) AS v FROM range(10)""".stripMargin)
    val t = new IcebergTable(s"$warehouse/ns/a9", conf)
    val reader = new org.apache.avro.file.DataFileReader[
        org.apache.avro.generic.GenericRecord](
      new org.apache.avro.mapred.FsInput(
        new Path(t.resolve(t.planFiles().head.filePath)), conf),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try {
      val fs = reader.getSchema.getFields
      (0 until fs.size).foreach { i =>
        val f = fs.get(i)
        val want = t.metadata.fieldIds(f.name)
        assert(f.getObjectProp("field-id") != null &&
          f.getObjectProp("field-id").toString.toInt == want,
          s"field '${f.name}' must carry field-id $want (spec-required " +
            "for Avro data files; external id-resolving readers key on it)")
      }
    } finally reader.close()
    def msgs(e: Throwable): Seq[String] =
      if (e == null) Nil else Option(e.getMessage).toSeq ++ msgs(e.getCause)
    // ADD COLUMN of an avro-unwritable type must refuse AT THE ALTER
    val ex = intercept[Exception](spark.sql(
      "ALTER TABLE awcat.ns.a9 ADD COLUMN dec DECIMAL(10,2)"))
    assert(msgs(ex).exists(_.contains("write.format-default = avro")),
      s"ALTER must refuse the bricking mutation, got: ${msgs(ex)}")
    // flipping a binary-columned table TO avro must refuse at the flip
    spark.sql("CREATE TABLE awcat.ns.a10 (k BIGINT, b BINARY)")
    val ex2 = intercept[Exception](spark.sql(
      "ALTER TABLE awcat.ns.a10 SET TBLPROPERTIES ('write.format-default' = 'avro')"))
    assert(msgs(ex2).exists(_.contains("avro cannot write column")),
      s"format flip must refuse on unwritable schema, got: ${msgs(ex2)}")
  }

  test("rename then re-add of the same name: old avro files read NULL " +
      "for the new column (field-id resolution), never the old data") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE awcat.ns.a11
        |TBLPROPERTIES ('write.format-default' = 'avro') AS
        |SELECT id AS k, id * 7 AS a FROM range(10)""".stripMargin)
    spark.sql("ALTER TABLE awcat.ns.a11 RENAME COLUMN a TO b")
    spark.sql("ALTER TABLE awcat.ns.a11 ADD COLUMN a BIGINT")
    // old files physically contain a field NAMED 'a' (the data of b);
    // the new column 'a' has a fresh field id no old file carries
    val rows = spark.sql(
      "SELECT k, b, a FROM awcat.ns.a11 ORDER BY k").collect()
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) * 7),
      "renamed column must keep its values (id-resolved)")
    assert(rows.forall(_.isNullAt(2)),
      "re-added name must read NULL from old files, not the old column's " +
        "data — name-first resolution would silently resurrect it")
    // and the CoW path (the group batch) resolves identically
    spark.sql("UPDATE awcat.ns.a11 SET a = 1 WHERE k = 0")
    val r0 = spark.sql("SELECT b, a FROM awcat.ns.a11 WHERE k = 0").collect()(0)
    assert(r0.getLong(0) == 0 && r0.getLong(1) == 1)
    val r1 = spark.sql("SELECT b, a FROM awcat.ns.a11 WHERE k = 1").collect()(0)
    assert(r1.getLong(0) == 7 && r1.isNullAt(1),
      "rewrite must preserve the NULL, not resurrect old 'a' data")
    // avro-illegal names refuse at the ALTER on avro tables
    def msgs(e: Throwable): Seq[String] =
      if (e == null) Nil else Option(e.getMessage).toSeq ++ msgs(e.getCause)
    val ex = intercept[Exception](spark.sql(
      "ALTER TABLE awcat.ns.a11 ADD COLUMN `x-1` STRING"))
    assert(msgs(ex).exists(_.contains("legal Avro field name")),
      s"avro-illegal name must refuse at ALTER, got: ${msgs(ex)}")
    val ex2 = intercept[Exception](spark.sql(
      "ALTER TABLE awcat.ns.a11 RENAME COLUMN b TO `b-2`"))
    assert(msgs(ex2).exists(_.contains("legal Avro field name")),
      s"avro-illegal rename must refuse at ALTER, got: ${msgs(ex2)}")
    // born-bricked CREATE refuses up front
    val ex3 = intercept[Exception](spark.sql(
      """CREATE TABLE awcat.ns.a12 (k BIGINT, b BINARY)
        |TBLPROPERTIES ('write.format-default' = 'avro')""".stripMargin))
    assert(msgs(ex3).exists(_.contains("avro cannot write column")),
      s"CREATE with unwritable column must refuse, got: ${msgs(ex3)}")
  }

  test("compaction honors avro default and absorbs delete debt; " +
      "unsupported column types refuse at plan time") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE awcat.ns.a5
        |TBLPROPERTIES ('write.format-default' = 'avro',
        |               'write.delete.mode' = 'merge-on-read') AS
        |SELECT id AS k FROM range(200)""".stripMargin)
    spark.sql("DELETE FROM awcat.ns.a5 WHERE k >= 150 AND k < 160")
    IcebergWriter.compact(spark, s"$warehouse/ns/a5")
    val t = new IcebergTable(s"$warehouse/ns/a5", conf)
    assert(t.planFiles().forall(_.fileFormat == "AVRO"),
      "compaction must not flip a declared-avro table to parquet")
    assert(!t.hasDeletes, "compaction must absorb the delete files")
    assert(spark.sql("SELECT COUNT(*) FROM awcat.ns.a5")
      .collect()(0).getLong(0) == 190L)
    def msgs(e: Throwable): Seq[String] =
      if (e == null) Nil else Option(e.getMessage).toSeq ++ msgs(e.getCause)
    val ex = intercept[Exception](spark.sql(
      """CREATE TABLE awcat.ns.a6
        |TBLPROPERTIES ('write.format-default' = 'avro') AS
        |SELECT id AS k, array(1, 2) AS a FROM range(5)""".stripMargin))
    // the refusal may come from the table-schema layer (arrays aren't
    // Iceberg-writable here at all) or from the avro writability check —
    // either way it is PLAN-time and loud
    assert(msgs(ex).exists(m => m.contains("avro cannot write column") ||
      m.contains("cannot write type")),
      s"array column must refuse at plan time, got: ${msgs(ex)}")
    // a type Iceberg accepts but avro-write does not (binary) hits the
    // avro-specific check
    val ex2 = intercept[Exception] {
      spark.sql(
        """CREATE TABLE awcat.ns.a7 (k BIGINT, b BINARY)
          |TBLPROPERTIES ('write.format-default' = 'avro')""".stripMargin)
      spark.sql("INSERT INTO awcat.ns.a7 VALUES (1, CAST('x' AS BINARY))")
    }
    assert(msgs(ex2).exists(m => m.contains("avro cannot write column") ||
      m.contains("cannot write type")),
      s"binary column must refuse at plan time, got: ${msgs(ex2)}")
  }
}
