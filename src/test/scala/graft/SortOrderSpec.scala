package graft

import java.io.File

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.sources.LessThan

import graft.iceberg.IcebergTable
import graft.iceberg.connector.GraftCatalog

/** Write-side sort orders: a table's `sort-order` property becomes an
  * Iceberg default sort order; writes range-cluster + sort by it, so
  * per-file bounds on the sort key are tight and DISJOINT — the property
  * that makes a range predicate on a non-partition column prune files.
  * Without it, file bounds on such a column are whatever insertion order
  * produced (usually the full domain in every file → zero pruning).
  */
class SortOrderSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/test-sort-warehouse"

  test("sorted write clusters files by sort key; range predicates prune") {
    FileUtils.deleteQuietly(new File(warehouse))
    spark.conf.set("spark.sql.catalog.so", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.so.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS so.ns")
    spark.sql(
      """CREATE TABLE so.ns.t (k BIGINT, v BIGINT)
        |TBLPROPERTIES ('sort-order' = 'v')""".stripMargin)
    // v arrives scrambled relative to k: only the sort-order machinery
    // can make per-file v ranges tight. (AQE coalesces the range shuffle
    // by size — shrink the advisory so this toy insert still yields
    // several files, the way a real insert would at real volume.)
    val sizeKeys = Seq(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB")
    val prev = sizeKeys.map { case (k, _) => k -> spark.conf.getOption(k) }
    sizeKeys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      spark.sql(
        """INSERT INTO so.ns.t
          |SELECT id AS k, (id * 2654435761) % 100000 AS v FROM range(0, 20000)""".stripMargin)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }

    val t = IcebergTable(spark, s"$warehouse/ns/t")
    val files = t.planFiles()
    assert(files.size > 1, s"need multiple files to show pruning, got ${files.size}")
    assert(files.forall(_.sortOrderId.contains(1)),
      "data files must record the sort order they were written under")

    // a narrow range on the SORT key keeps a small fraction of the files
    val (_, _, fk, ft) = t.pruneCounts(Seq(LessThan("v", 1000L)))
    assert(fk < ft, s"sort-key range must prune: kept $fk of $ft")
    assert(fk <= math.max(1, ft / 4),
      s"range-clustered files should mostly prune: kept $fk of $ft")

    // values are intact (the sort is a reordering, never a filter)
    val expect = spark.range(0, 20000)
      .selectExpr("id AS k", "(id * 2654435761) % 100000 AS v")
      .where("v < 1000").count()
    assert(spark.sql("SELECT COUNT(*) FROM so.ns.t WHERE v < 1000")
      .collect()(0).getLong(0) == expect)
    assert(spark.sql("SELECT COUNT(*) FROM so.ns.t").collect()(0).getLong(0) == 20000L)
  }

  test("unsorted tables record no sort order id") {
    FileUtils.deleteQuietly(new File(s"$warehouse/ns/u"))
    spark.conf.set("spark.sql.catalog.so", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.so.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS so.ns")
    spark.sql("DROP TABLE IF EXISTS so.ns.u")
    spark.sql("CREATE TABLE so.ns.u (k BIGINT)")
    spark.sql("INSERT INTO so.ns.u VALUES (1), (2)")
    val t = IcebergTable(spark, s"$warehouse/ns/u")
    assert(t.metadata.sortOrderFields.isEmpty)
    assert(t.planFiles().forall(_.sortOrderId.isEmpty))
  }

  test("WRITE ORDERED BY evolves the sort order; UNORDERED resets it") {
    spark.conf.set("spark.sql.catalog.so", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.so.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS so.ns")
    spark.sql("DROP TABLE IF EXISTS so.ns.evo")
    spark.sql("CREATE TABLE so.ns.evo (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO so.ns.evo SELECT id, id * 3 FROM range(0, 50)")
    val before = IcebergTable(spark, s"$warehouse/ns/evo")
    assert(before.metadata.defaultSortOrderId == 0)
    val filesBefore = before.planFiles().map(_.filePath).toSet

    spark.sql("ALTER TABLE so.ns.evo WRITE ORDERED BY (v DESC, k)")
    val t = IcebergTable(spark, s"$warehouse/ns/evo")
    // metadata-only: a new default order, no data file touched
    assert(t.metadata.defaultSortOrderId == 1)
    assert(t.metadata.sortOrderFields.map(_.direction) == Seq("desc", "asc"))
    assert(t.planFiles().map(_.filePath).toSet == filesBefore)
    // pre-DDL files stay unsorted (order id absent/0); new writes record 1
    spark.sql("INSERT INTO so.ns.evo SELECT id, id * 3 FROM range(50, 100)")
    val t2 = IcebergTable(spark, s"$warehouse/ns/evo")
    assert(t2.planFiles().exists(_.sortOrderId.contains(1)),
      "post-DDL files must record the evolved sort order")
    assert(spark.sql("SELECT CAST(SUM(v) AS BIGINT) FROM so.ns.evo")
      .collect()(0).getLong(0) == (0 until 100).map(_ * 3L).sum)

    spark.sql("ALTER TABLE so.ns.evo WRITE UNORDERED")
    val t3 = IcebergTable(spark, s"$warehouse/ns/evo")
    assert(t3.metadata.defaultSortOrderId == 0)
    assert(t3.metadata.sortOrderFields.isEmpty)
    spark.sql("INSERT INTO so.ns.evo VALUES (100, 300)")
    assert(spark.sql("SELECT COUNT(*) FROM so.ns.evo")
      .collect()(0).getLong(0) == 101L)

    // refusals: unknown column, duplicate column
    val bad = intercept[Exception] {
      spark.sql("ALTER TABLE so.ns.evo WRITE ORDERED BY (nope)")
    }
    assert(bad.getMessage.contains("not in schema"))
    val dup = intercept[Exception] {
      spark.sql("ALTER TABLE so.ns.evo WRITE ORDERED BY (v, v DESC)")
    }
    assert(dup.getMessage.contains("duplicate sort columns"))
  }

  test("DESC sort direction round-trips through metadata") {
    spark.conf.set("spark.sql.catalog.so", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.so.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS so.ns")
    spark.sql("DROP TABLE IF EXISTS so.ns.d")
    spark.sql(
      """CREATE TABLE so.ns.d (k BIGINT, v BIGINT)
        |TBLPROPERTIES ('sort-order' = 'v DESC, k')""".stripMargin)
    spark.sql("INSERT INTO so.ns.d SELECT id, id * 7 FROM range(0, 100)")
    val t = IcebergTable(spark, s"$warehouse/ns/d")
    assert(t.metadata.defaultSortOrderId == 1)
    assert(t.metadata.sortOrderFields.map(_.direction) == Seq("desc", "asc"))
    assert(spark.sql("SELECT CAST(SUM(v) AS BIGINT) FROM so.ns.d")
      .collect()(0).getLong(0) == (0 until 100).map(_ * 7L).sum)
  }
}
