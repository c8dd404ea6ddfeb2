package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.iceberg.{IcebergTable, IcebergWriter}
import graft.iceberg.connector.GraftCatalog

/** ORC data files as read-path citizens (reference parity note: the
  * reference is parquet-only, `table.rs:291-293` — this is extension
  * surface for foreign tables). `add_files` registers existing ORC files
  * with full footer stats; scans dispatch per-format vectorized readers
  * and mixed parquet+ORC snapshots union; equality deletes apply to ORC
  * (data-column anti-join, file-level sequence gate — no row positions
  * needed); everything that requires per-row positions (position
  * deletes, DVs, changelog) refuses loudly, and `rewrite_data_files`
  * materializes the imports to parquet to unblock them.
  */
class OrcFormatSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/orc-warehouse"

  private def conf = spark.sessionState.newHadoopConf()

  private def freshCatalog(): Unit = {
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set("spark.sql.catalog.orccat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.orccat.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS orccat.ns")
  }

  /** Write one ORC file of (k, v) rows over [lo, hi) and return its path. */
  private def orcFile(dir: String, lo: Long, hi: Long): String = {
    import spark.implicits._
    val d = s"/root/repo/target/orc-src/$dir"
    new Path(d).getFileSystem(conf).delete(new Path(d), true)
    spark.range(lo, hi).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")).coalesce(1)
      .write.mode("overwrite").orc(d)
    val fs = new Path(d).getFileSystem(conf)
    fs.listStatus(new Path(d)).map(_.getPath)
      .find(_.getName.endsWith(".orc")).get.toString
  }

  test("add_files imports ORC with footer stats; scan + pruning work") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS orccat.ns.t1")
    spark.sql("CREATE TABLE orccat.ns.t1 (k BIGINT, v STRING)")
    val f1 = orcFile("t1-a", 0, 100)
    val f2 = orcFile("t1-b", 100, 200)
    val dir = s"$warehouse/ns/t1"
    IcebergWriter.addFiles(spark, dir, Seq(f1, f2))

    val t = new IcebergTable(dir, conf)
    val planned = t.planFiles()
    assert(planned.size == 2)
    assert(planned.forall(_.fileFormat == "ORC"))
    assert(planned.forall(_.recordCount == 100L),
      "ORC footer row counts must land in the manifest")

    // stats pruning: k-bounds from the ORC footer prune the low file
    val pruned = t.planFiles(Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("k", 150L)))
    assert(pruned.size == 1, s"expected 1 file after pruning, got ${pruned.size}")

    // full read through SQL matches the source range
    val rows = spark.sql(
      "SELECT COUNT(*) AS n, SUM(k) AS s FROM orccat.ns.t1").collect()(0)
    assert(rows.getLong(0) == 200L)
    assert(rows.getLong(1) == (0L until 200L).sum)
    // string column survives the per-format scan
    assert(spark.sql(
      "SELECT v FROM orccat.ns.t1 WHERE k = 123").collect()(0).getString(0) == "v123")
  }

  test("mixed parquet + ORC snapshot unions per-format scans") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS orccat.ns.t2")
    spark.sql("CREATE TABLE orccat.ns.t2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO orccat.ns.t2 SELECT id, concat('v', id) FROM range(50)")
    val f = orcFile("t2-a", 50, 100)
    val dir = s"$warehouse/ns/t2"
    IcebergWriter.addFiles(spark, dir, Seq(f))

    val t = new IcebergTable(dir, conf)
    assert(t.planFiles().map(_.fileFormat).toSet == Set("PARQUET", "ORC"))
    val got = spark.sql("SELECT k, v FROM orccat.ns.t2 ORDER BY k").collect()
    assert(got.length == 100)
    assert(got.zipWithIndex.forall { case (r, i) =>
      r.getLong(0) == i && r.getString(1) == s"v$i" })
  }

  test("equality deletes apply to ORC files; position deletes refuse") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS orccat.ns.t3")
    spark.sql(
      """CREATE TABLE orccat.ns.t3 (k BIGINT, v STRING)
        |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    val f = orcFile("t3-a", 0, 100)
    val dir = s"$warehouse/ns/t3"
    IcebergWriter.addFiles(spark, dir, Seq(f))

    // equality-expressible DELETE: commits equality tuples, no data read
    spark.sql("DELETE FROM orccat.ns.t3 WHERE k IN (5, 6, 7)")
    val t = new IcebergTable(dir, conf)
    assert(t.hasDeletes, "the DELETE must be merge-on-read")
    val left = spark.sql(
      "SELECT COUNT(*) AS n, SUM(k) AS s FROM orccat.ns.t3").collect()(0)
    assert(left.getLong(0) == 97L)
    assert(left.getLong(1) == (0L until 100L).sum - 18L)

    // a range DELETE needs row positions → must refuse, naming the fix
    val e = intercept[Exception] {
      spark.sql("DELETE FROM orccat.ns.t3 WHERE k >= 90 AND k < 95")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("rewrite_data_files")),
      s"refusal must name rewrite_data_files, got: ${e.getMessage}")
  }

  test("rewrite_data_files materializes ORC to parquet and unblocks MoR") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS orccat.ns.t4")
    spark.sql(
      """CREATE TABLE orccat.ns.t4 (k BIGINT, v STRING)
        |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    val f = orcFile("t4-a", 0, 100)
    val dir = s"$warehouse/ns/t4"
    IcebergWriter.addFiles(spark, dir, Seq(f))
    spark.sql("DELETE FROM orccat.ns.t4 WHERE k = 10") // equality, applies

    IcebergWriter.compact(spark, dir)
    val t = new IcebergTable(dir, conf)
    assert(t.planFiles().forall(_.fileFormat == "PARQUET"),
      "compaction must materialize ORC imports to parquet")
    assert(spark.sql("SELECT COUNT(*) FROM orccat.ns.t4").collect()(0).getLong(0) == 99L)

    // positions now exist → the range DELETE works
    spark.sql("DELETE FROM orccat.ns.t4 WHERE k >= 90 AND k < 95")
    val n = spark.sql("SELECT COUNT(*) FROM orccat.ns.t4").collect()(0).getLong(0)
    assert(n == 94L)
  }

  test("CALL add_files imports an ORC directory through SQL") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS orccat.ns.t6")
    spark.sql("CREATE TABLE orccat.ns.t6 (k BIGINT, v STRING)")
    orcFile("t6-a", 0, 40) // writes the dir; the procedure lists it
    val res = spark.sql(
      "CALL orccat.system.add_files(table => 'ns.t6', " +
        "source => '/root/repo/target/orc-src/t6-a')").collect()(0)
    assert(res.getInt(0) == 1, "one ORC file registered")
    assert(spark.sql("SELECT COUNT(*) FROM orccat.ns.t6")
      .collect()(0).getLong(0) == 40L)
  }

  test("renamed column resolves on ORC imports via name mapping") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS orccat.ns.t7")
    spark.sql("CREATE TABLE orccat.ns.t7 (k BIGINT, v STRING)")
    val f = orcFile("t7-a", 0, 30)
    IcebergWriter.addFiles(spark, s"$warehouse/ns/t7", Seq(f))
    // declare where the imported files' columns live (spec:
    // schema.name-mapping.default), then rename — ORC files carry no
    // field ids, so without the mapping the new name would read nulls
    spark.sql(
      """ALTER TABLE orccat.ns.t7 SET TBLPROPERTIES (
        |'schema.name-mapping.default' =
        |'[{"field-id": 1, "names": ["k"]},
        |  {"field-id": 2, "names": ["v"]}]')""".stripMargin)
    spark.sql("ALTER TABLE orccat.ns.t7 RENAME COLUMN v TO val")
    val got = spark.sql(
      "SELECT val FROM orccat.ns.t7 WHERE k = 7").collect()
    assert(got.length == 1 && got(0).getString(0) == "v7",
      s"renamed column must resolve through the mapping, got " +
        s"${got.mkString(",")}")
  }

  test("ORC footer-stats pruning is sound under random data and predicates") {
    import org.apache.spark.sql.sources._
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS orccat.ns.t8")
    spark.sql("CREATE TABLE orccat.ns.t8 (k BIGINT, v STRING)")
    val r = new scala.util.Random(99)
    val dir = s"$warehouse/ns/t8"
    // 6 files with random ranges, some null ks, varied strings
    val stored: Seq[(String, Seq[(java.lang.Long, String)])] =
      (0 until 6).map { i =>
        val lo = r.nextInt(1000).toLong
        val rows: Seq[(java.lang.Long, String)] = (0 until 20).map { j =>
          val k: java.lang.Long =
            if (i % 2 == 0 && j % 7 == 0) null
            else java.lang.Long.valueOf(lo + r.nextInt(200))
          (k, s"s${r.nextInt(500)}")
        }
        val d = s"/root/repo/target/orc-src/t8-$i"
        new Path(d).getFileSystem(conf).delete(new Path(d), true)
        import spark.implicits._
        rows.toDF("k", "v").coalesce(1).write.mode("overwrite").orc(d)
        val fs = new Path(d).getFileSystem(conf)
        val p = fs.listStatus(new Path(d)).map(_.getPath)
          .find(_.getName.endsWith(".orc")).get.toString
        (p, rows)
      }
    IcebergWriter.addFiles(spark, dir, stored.map(_._1))
    val t = new graft.iceberg.IcebergTable(dir, conf)

    def matches(f: Filter, k: java.lang.Long, v: String): Boolean = f match {
      case GreaterThan("k", x: Long) => k != null && k > x
      case LessThan("k", x: Long) => k != null && k < x
      case EqualTo("k", x: Long) => k != null && k == x
      case IsNull("k") => k == null
      case GreaterThan("v", x: String) => v > x
      case EqualTo("v", x: String) => v == x
      case _ => true
    }
    val preds: Seq[Filter] = (0 until 40).map { _ =>
      r.nextInt(6) match {
        case 0 => GreaterThan("k", r.nextInt(1400).toLong)
        case 1 => LessThan("k", r.nextInt(1400).toLong)
        case 2 => EqualTo("k", r.nextInt(1400).toLong)
        case 3 => IsNull("k")
        case 4 => GreaterThan("v", s"s${r.nextInt(500)}")
        case 5 => EqualTo("v", s"s${r.nextInt(500)}")
      }
    }
    preds.foreach { f =>
      val kept = t.planFiles(Seq(f)).map(p => t.resolve(p.filePath)).toSet
      stored.foreach { case (path, rows) =>
        val hasMatch = rows.exists { case (k, v) => matches(f, k, v) }
        assert(!hasMatch || kept.contains(path),
          s"UNSOUND: $f pruned $path which contains a matching row")
      }
    }
    // and the stats actually prune SOMETHING across the predicate set
    val totalKept = preds.map(f => t.planFiles(Seq(f)).size).sum
    assert(totalKept < preds.size * stored.size,
      "pruning never skipped a file — stats are not reaching the planner")
  }

  test("add_files rejects files that are neither parquet nor ORC") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS orccat.ns.t5")
    spark.sql("CREATE TABLE orccat.ns.t5 (k BIGINT, v STRING)")
    val junk = "/root/repo/target/orc-src/junk.txt"
    val fs = new Path(junk).getFileSystem(conf)
    val out = fs.create(new Path(junk), true)
    out.write("not a data file".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.addFiles(spark, s"$warehouse/ns/t5", Seq(junk))
    }
    assert(e.getMessage.contains("not a readable parquet, ORC, or Avro file"))
  }
}
