package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}

import graft.iceberg.{IcebergTable, IcebergWriter}
import graft.iceberg.connector.GraftCatalog

/** Z-order rewrite: after `rewrite_data_files(strategy => 'sort',
  * sort_order => 'zorder(x, y)')`, file bounds are tight on BOTH columns,
  * so metadata pruning works for filters on either — the multi-dimensional
  * layout a linear sort cannot give. Asserted on actual `planFiles`
  * pruning counts, plus row preservation and the CALL arg contract.
  */
class ZOrderSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/zorder-warehouse"
  private def conf = spark.sessionState.newHadoopConf()

  private def fresh(cat: String): String = {
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    s"$warehouse/ns"
  }

  test("zorder rewrite prunes files on every clustered dimension") {
    val ns = fresh("zcat")
    spark.sql("CREATE TABLE zcat.ns.t (x INT, y INT)")
    // x cycles fast, y grows slowly: the INSERT order gives tight y bounds
    // but useless x bounds — the one-dimensional worst case for x
    spark.sql(
      """INSERT INTO zcat.ns.t
        |SELECT CAST(id % 100 AS INT) AS x, CAST(id DIV 100 AS INT) AS y
        |FROM range(10000)""".stripMargin)
    val dir = s"$ns/t"

    def pruned(colName: String): (Int, Int) = {
      val t = new IcebergTable(dir, conf)
      val total = t.planFiles().size
      val hit = t.planFiles(Seq(
        GreaterThanOrEqual(colName, 40), LessThan(colName, 50))).size
      (hit, total)
    }

    IcebergWriter.compact(spark, dir, targetFileBytes = 1024,
      zorderCols = Seq("x", "y"))

    val (hitX, totalX) = pruned("x")
    val (hitY, totalY) = pruned("y")
    assert(totalX > 4, s"rewrite should have produced several files, got $totalX")
    assert(hitX < totalX, s"x-filter must prune z-ordered files ($hitX/$totalX)")
    assert(hitY < totalY, s"y-filter must prune z-ordered files ($hitY/$totalY)")

    // rows preserved exactly
    val chk = spark.sql(
      "SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy FROM zcat.ns.t").head()
    assert(chk.getLong(0) === 10000L)
    assert(chk.getLong(1) === (0 until 10000).map(_ % 100).sum.toLong)
    assert(chk.getLong(2) === (0 until 10000).map(_ / 100).sum.toLong)
  }

  test("linear sort rewrite serves its leading column only") {
    val ns = fresh("zcat2")
    spark.sql("CREATE TABLE zcat2.ns.t (x INT, y INT)")
    spark.sql(
      """INSERT INTO zcat2.ns.t
        |SELECT CAST(id % 100 AS INT), CAST(id DIV 100 AS INT) FROM range(10000)""".stripMargin)
    val dir = s"$ns/t"
    IcebergWriter.compact(spark, dir, targetFileBytes = 1024,
      sortCols = Seq("x"))
    val t = new IcebergTable(dir, conf)
    val total = t.planFiles().size
    assert(total > 1, s"rewrite should produce several files, got $total")
    val hitX = t.planFiles(Seq(
      GreaterThanOrEqual("x", 40), LessThan("x", 50))).size
    assert(hitX < total, "sort by x gives x pruning")
  }

  test("CALL rewrite_data_files with zorder sort_order") {
    val ns = fresh("zcat3")
    spark.sql("CREATE TABLE zcat3.ns.t (x INT, y INT)")
    spark.sql(
      """INSERT INTO zcat3.ns.t
        |SELECT CAST(id % 50 AS INT), CAST(id DIV 50 AS INT) FROM range(2500)""".stripMargin)
    spark.sql(
      "CALL zcat3.system.rewrite_data_files(table => 'ns.t', " +
        "strategy => 'sort', sort_order => 'zorder(x, y)', " +
        "target_file_size_bytes => 4096)").collect()
    assert(spark.sql("SELECT COUNT(*) FROM zcat3.ns.t").head.getLong(0) === 2500L)

    val e = intercept[Exception](spark.sql(
      "CALL zcat3.system.rewrite_data_files(table => 'ns.t', " +
        "sort_order => 'zorder(x)')").collect())
    assert(e.getMessage.contains("strategy => 'sort'"))
    val e2 = intercept[Exception](spark.sql(
      "CALL zcat3.system.rewrite_data_files(table => 'ns.t', " +
        "strategy => 'sort')").collect())
    assert(e2.getMessage.contains("needs sort_order"))
  }

  test("zorder refuses string columns and too many dimensions") {
    val ns = fresh("zcat4")
    spark.sql("CREATE TABLE zcat4.ns.t (x INT, s STRING)")
    spark.sql("INSERT INTO zcat4.ns.t VALUES (1, 'a')")
    val dir = s"$ns/t"
    val e = intercept[IllegalArgumentException](
      IcebergWriter.compact(spark, dir, zorderCols = Seq("x", "s")))
    assert(e.getMessage.contains("unsupported type"))
    val e2 = intercept[IllegalArgumentException](
      IcebergWriter.compact(spark, dir,
        zorderCols = Seq("x", "x", "x", "x", "x")))
    assert(e2.getMessage.contains("1..4"))
  }
}
