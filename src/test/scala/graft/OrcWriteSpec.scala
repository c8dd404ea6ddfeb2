package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.iceberg.{IcebergTable, IcebergWriter}
import graft.iceberg.connector.GraftCatalog

/** The ORC WRITE kernel: `write.format-default = orc` routes the shared
  * fanout writer through orc-core (Spark's own OrcSerializer), with
  * footer statistics lifted into manifests so pruning stays format-blind.
  * The format matrix's last cell — the reference's engine is parquet-only
  * (`table.rs:291-293`) and has no write path at all.
  */
class OrcWriteSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/orcw-warehouse"

  private def conf = spark.sessionState.newHadoopConf()

  private def freshCatalog(): Unit = {
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set("spark.sql.catalog.owcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.owcat.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS owcat.ns")
  }

  test("CTAS with orc default writes ORC files; read-back matches; codec " +
      "and extension land as declared") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE owcat.ns.w1
        |TBLPROPERTIES ('write.format-default' = 'orc',
        |               'write.orc.compression-codec' = 'zstd') AS
        |SELECT id AS k, CAST(id % 7 AS INT) AS g, concat('v', id) AS v
        |FROM range(1000)""".stripMargin)
    val t = new IcebergTable(s"$warehouse/ns/w1", conf)
    val files = t.planFiles()
    assert(files.nonEmpty && files.forall(_.fileFormat == "ORC"))
    assert(files.forall(_.filePath.endsWith(".orc")))
    val r = org.apache.orc.OrcFile.createReader(
      new Path(t.resolve(files.head.filePath)),
      org.apache.orc.OrcFile.readerOptions(conf))
    try {
      assert(r.getCompressionKind == org.apache.orc.CompressionKind.ZSTD)
      assert(r.getNumberOfRows > 0)
    } finally r.close()
    val back = spark.sql(
      "SELECT COUNT(*) AS n, SUM(k) AS s FROM owcat.ns.w1").collect()(0)
    assert(back.getLong(0) == 1000L && back.getLong(1) == (0L until 1000L).sum)
    assert(spark.sql("SELECT v FROM owcat.ns.w1 WHERE k = 42")
      .collect()(0).getString(0) == "v42")
  }

  test("orc-written footer stats reach manifests: file pruning works " +
      "on a native-ORC table") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE owcat.ns.w2 (k BIGINT, v STRING)
        |TBLPROPERTIES ('write.format-default' = 'orc')""".stripMargin)
    // two inserts with disjoint key ranges -> two files with tight bounds
    spark.sql("INSERT INTO owcat.ns.w2 SELECT id, concat('a', id) FROM range(0, 100)")
    spark.sql("INSERT INTO owcat.ns.w2 SELECT id, concat('b', id) FROM range(1000, 1100)")
    val t = new IcebergTable(s"$warehouse/ns/w2", conf)
    val all = t.planFiles()
    val kept = t.planFiles(Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("k", 1000L)))
    // each INSERT lands >= 1 file; footer bounds must drop every
    // low-range file (exactly the files of the second insert survive)
    assert(kept.nonEmpty && kept.size < all.size,
      s"orc footer bounds must prune low-range files: ${kept.size}/${all.size}")
    assert(kept.forall(f => f.filePath.contains("/s2-")),
      "only second-snapshot files may survive k >= 1000")
    assert(spark.sql("SELECT COUNT(*) FROM owcat.ns.w2 WHERE k >= 1000")
      .collect()(0).getLong(0) == 100L)
  }

  test("copy-on-write DELETE and UPDATE rewrite ORC as ORC") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE owcat.ns.w3
        |TBLPROPERTIES ('write.format-default' = 'orc') AS
        |SELECT id AS k, CAST(id AS DOUBLE) AS x FROM range(500)""".stripMargin)
    spark.sql("DELETE FROM owcat.ns.w3 WHERE k < 100")
    spark.sql("UPDATE owcat.ns.w3 SET x = x + 0.5 WHERE k >= 400")
    val t = new IcebergTable(s"$warehouse/ns/w3", conf)
    assert(t.planFiles().forall(_.fileFormat == "ORC"),
      "row-level rewrites must honor the table's declared format")
    assert(!t.hasDeletes, "default mode is copy-on-write: no delete files")
    val r = spark.sql(
      "SELECT COUNT(*) AS n, SUM(x) AS s FROM owcat.ns.w3").collect()(0)
    assert(r.getLong(0) == 400L)
    assert(math.abs(r.getDouble(1) -
      ((100L until 500L).map(_.toDouble).sum + 100 * 0.5)) < 1e-6)
  }

  test("partitioned fanout writes ORC per partition tuple") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE owcat.ns.w4 (k BIGINT, g INT, v STRING)
        |PARTITIONED BY (g)
        |TBLPROPERTIES ('write.format-default' = 'orc')""".stripMargin)
    spark.sql(
      "INSERT INTO owcat.ns.w4 SELECT id, CAST(id % 3 AS INT), concat('v', id) FROM range(300)")
    val t = new IcebergTable(s"$warehouse/ns/w4", conf)
    val files = t.planFiles()
    assert(files.forall(_.fileFormat == "ORC"))
    assert(files.flatMap(_.partition.get("g")).toSet == Set(0, 1, 2),
      "manifest partition tuples must carry the fanout values")
    // partition pruning over orc-written files
    assert(t.planFiles(Seq(org.apache.spark.sql.sources.EqualTo("g", 1)))
      .flatMap(_.partition.get("g")).toSet == Set(1))
    assert(spark.sql("SELECT COUNT(*) FROM owcat.ns.w4 WHERE g = 1")
      .collect()(0).getLong(0) == 100L)
  }

  test("equality-delete merge-on-read works on native ORC; position-" +
      "needing range delete refuses loudly") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE owcat.ns.w5
        |TBLPROPERTIES ('write.format-default' = 'orc',
        |               'write.delete.mode' = 'merge-on-read') AS
        |SELECT id AS k, concat('v', id) AS v FROM range(200)""".stripMargin)
    spark.sql("DELETE FROM owcat.ns.w5 WHERE k IN (1, 2, 3)")
    val t = new IcebergTable(s"$warehouse/ns/w5", conf)
    assert(t.hasDeletes, "equality DELETE must stay merge-on-read")
    assert(t.planFiles().forall(_.fileFormat == "ORC"))
    assert(spark.sql("SELECT COUNT(*) FROM owcat.ns.w5")
      .collect()(0).getLong(0) == 197L)
    // a range DELETE needs per-row positions ORC cannot serve — loud, not wrong
    val ex = intercept[Exception](
      spark.sql("DELETE FROM owcat.ns.w5 WHERE k >= 10 AND k < 20"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains("rewrite_data_files") ||
      m.contains("row_index") || m.contains("position")),
      s"refusal must explain the ORC position gap, got: ${msgs(ex)}")
  }

  test("mixed parquet+ORC snapshot: copy-on-write UPDATE reads both " +
      "formats through one union batch") {
    freshCatalog()
    // parquet files first (default format), then flip the default to orc
    spark.sql(
      """CREATE TABLE owcat.ns.w8 AS
        |SELECT id AS k, CAST(0 AS DOUBLE) AS x FROM range(100)""".stripMargin)
    spark.sql(
      "ALTER TABLE owcat.ns.w8 SET TBLPROPERTIES ('write.format-default' = 'orc')")
    spark.sql(
      "INSERT INTO owcat.ns.w8 SELECT id, CAST(0 AS DOUBLE) FROM range(100, 200)")
    val t0 = new IcebergTable(s"$warehouse/ns/w8", conf)
    assert(t0.planFiles().map(_.fileFormat).toSet == Set("PARQUET", "ORC"),
      "setup: the snapshot must be mixed-format")
    // the UPDATE's group scan spans files of BOTH formats
    spark.sql("UPDATE owcat.ns.w8 SET x = 1.0 WHERE k % 2 = 0")
    val r = spark.sql(
      "SELECT COUNT(*) AS n, SUM(x) AS s FROM owcat.ns.w8").collect()(0)
    assert(r.getLong(0) == 200L && r.getDouble(1) == 100.0,
      s"every even k in both formats must update, got ${r}")
  }

  test("renamed column + ORC files: CoW and position-delete paths refuse " +
      "instead of nulling the renamed column") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE owcat.ns.w9
        |TBLPROPERTIES ('write.format-default' = 'orc') AS
        |SELECT id AS k, CAST(id AS DOUBLE) AS x FROM range(100)""".stripMargin)
    // the rename records the old name in schema.name-mapping.default —
    // which is exactly the marker the ORC-rewrite guards key on (ORC
    // resolves by name; pre-rename files would read `score` as NULL)
    spark.sql("ALTER TABLE owcat.ns.w9 RENAME COLUMN x TO score")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val exDel = intercept[Exception](
      spark.sql("DELETE FROM owcat.ns.w9 WHERE k >= 10 AND k < 20"))
    assert(msgs(exDel).exists(_.contains("rewrite_data_files")),
      s"range DELETE must refuse, got: ${msgs(exDel)}")
    val exUpd = intercept[Exception](
      spark.sql("UPDATE owcat.ns.w9 SET score = score + 1 WHERE k < 5"))
    assert(msgs(exUpd).exists(m => m.contains("rewrite_data_files") ||
      m.contains("compact")), s"UPDATE must refuse, got: ${msgs(exUpd)}")
    // reads themselves are fine (the name mapping serves them)…
    assert(spark.sql("SELECT COUNT(*) FROM owcat.ns.w9 WHERE score >= 0")
      .collect()(0).getLong(0) == 100L)
    // …and the documented unblock works: compaction rewrites the files
    // under the CURRENT names (still ORC), after which row-level ops
    // stop refusing — the guard probes actual file schemas, not just
    // mapping presence
    IcebergWriter.compact(spark, s"$warehouse/ns/w9")
    spark.sql("UPDATE owcat.ns.w9 SET score = score + 1 WHERE k < 5")
    spark.sql("DELETE FROM owcat.ns.w9 WHERE k >= 10 AND k < 20")
    val t = new IcebergTable(s"$warehouse/ns/w9", conf)
    assert(t.planFiles().forall(_.fileFormat == "ORC"))
    val r = spark.sql(
      "SELECT COUNT(*) AS n, SUM(score) AS s FROM owcat.ns.w9").collect()(0)
    assert(r.getLong(0) == 90L)
    assert(math.abs(r.getDouble(1) -
      ((0L until 100L).filterNot(k => k >= 10 && k < 20).map(_.toDouble).sum
        + 5)) < 1e-6, s"post-unblock ops must apply exactly, got $r")
  }

  test("compaction honors the table's orc default; unknown format refused") {
    freshCatalog()
    spark.sql(
      """CREATE TABLE owcat.ns.w6
        |TBLPROPERTIES ('write.format-default' = 'orc') AS
        |SELECT id AS k FROM range(100)""".stripMargin)
    spark.sql("INSERT INTO owcat.ns.w6 SELECT id FROM range(100, 200)")
    IcebergWriter.compact(spark, s"$warehouse/ns/w6")
    val t = new IcebergTable(s"$warehouse/ns/w6", conf)
    assert(t.planFiles().forall(_.fileFormat == "ORC"),
      "compaction must not silently flip a declared-orc table to parquet")
    assert(spark.sql("SELECT COUNT(*) FROM owcat.ns.w6")
      .collect()(0).getLong(0) == 200L)
    val ex = intercept[Exception](spark.sql(
      """CREATE TABLE owcat.ns.w7
        |TBLPROPERTIES ('write.format-default' = 'csv') AS
        |SELECT id FROM range(5)""".stripMargin))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("write.format-default")),
      s"an unknown format must fail at plan time, got: ${msgs(ex)}")
  }
}
