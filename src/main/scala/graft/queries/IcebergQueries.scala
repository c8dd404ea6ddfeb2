package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.Tables
import graft.iceberg.connector.GraftCatalog

/** The reference's own surface (SURVEY §2.A): Iceberg fixture scans through
  * the `lakehouse` catalog plugin — metadata → manifests → pruning → scan.
  * Q2 is the reference's integration-test query (`table.rs:330`), expected
  * {1 → 1.8, 2 → 0.9} (`table.rs:348-349`).
  */
object IcebergQueries {

  val fixtureWarehouse = "/root/reference/datafusion_iceberg/tests/home/iceberg/warehouse"
  private val fixtureGlob =
    s"$fixtureWarehouse/nyc/taxis/data/*/*.parquet"

  private def withCatalog(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.catalog.lakehouse", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.lakehouse.warehouse", fixtureWarehouse)
    s
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_iceberg_fixture" -> ((s, _) =>
      withCatalog(s).sql(
        """SELECT vendor_id, ROUND(CAST(MIN(trip_distance) AS DOUBLE), 2) AS m
          |FROM lakehouse.nyc.taxis
          |GROUP BY vendor_id ORDER BY vendor_id ASC NULLS FIRST""".stripMargin)),

    "q2b_catalog_count" -> ((s, _) =>
      withCatalog(s).sql("SELECT COUNT(*) AS n FROM lakehouse.nyc.taxis")),

    // A12 full: the view is committed to catalog metadata and resolved
    // back through loadTable's view-expansion path — not a session temp
    // view (q3 covers that form)
    "q3b_persistent_view" -> ((s, d) => {
      val warehouse = "/root/repo/target/q3b-warehouse"
      Tables.load(s, d, "orders").createOrReplaceTempView("orders")
      s.conf.set("spark.sql.catalog.graftscratch", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graftscratch.warehouse", warehouse)
      val cat = s.sessionState.catalogManager.catalog("graftscratch")
        .asInstanceOf[ViewCatalog]
      val ident = Identifier.of(Array("views"), "big_orders")
      cat.asInstanceOf[GraftCatalog]
        .createNamespace(Array("views"), new java.util.HashMap[String, String]())
      if (cat.viewExists(ident)) cat.dropView(ident)
      cat.createView(new ViewInfo(ident,
        "SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000",
        "graftscratch", Array.empty[String],
        StructType(Seq(StructField("o_custkey", LongType),
          StructField("o_totalprice", org.apache.spark.sql.types.DoubleType))),
        Array("o_custkey", "o_totalprice"), Array.empty, Array.empty,
        new java.util.HashMap[String, String]()))
      s.sql("""SELECT COUNT(*) AS n, MIN(o_custkey) AS mn, MAX(o_custkey) AS mx
              |FROM graftscratch.views.big_orders""".stripMargin)
    }))

  /** DuckDB sees the same bytes by reading the fixture's data files
    * directly (all 4 are live in the current snapshot, so the file set is
    * identical to the snapshot's).
    */
  val oracles: Map[String, String] = Map(
    "q2_iceberg_fixture" ->
      s"""SELECT vendor_id, ROUND(CAST(MIN(trip_distance) AS DOUBLE), 2) AS m
         |FROM read_parquet('$fixtureGlob')
         |GROUP BY vendor_id ORDER BY vendor_id ASC NULLS FIRST""".stripMargin,
    "q2b_catalog_count" ->
      s"SELECT COUNT(*) AS n FROM read_parquet('$fixtureGlob')",
    "q3b_persistent_view" ->
      """SELECT COUNT(*) AS n, MIN(o_custkey) AS mn, MAX(o_custkey) AS mx
        |FROM (SELECT o_custkey, o_totalprice FROM orders
        |      WHERE o_totalprice > 100000) big_orders""".stripMargin)
}
