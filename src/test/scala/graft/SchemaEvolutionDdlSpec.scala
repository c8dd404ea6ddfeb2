package graft

import org.apache.hadoop.fs.Path

import graft.iceberg.connector.GraftCatalog

/** `ALTER TABLE` DDL through the catalog: schema evolution commits a new
  * metadata version; data files are untouched and resolve by field id.
  * (The read-side rename test over hand-built metadata lives in
  * `SchemaEvolutionSpec`; this exercises the full SQL DDL surface.)
  */
class SchemaEvolutionDdlSpec extends SparkSpec {

  private val wh = "/root/repo/target/ddl-warehouse"

  private def freshCatalog(name: String): Unit = {
    new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new Path(wh), true)
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
  }

  test("ADD COLUMN: old rows read null, new writes fill it") {
    freshCatalog("ddl1")
    spark.sql("CREATE TABLE ddl1.ns.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ddl1.ns.t SELECT id, id FROM range(0, 5)")
    spark.sql("ALTER TABLE ddl1.ns.t ADD COLUMN tag STRING")
    assert(spark.table("ddl1.ns.t").schema.fieldNames.toSeq == Seq("k", "v", "tag"))
    assert(spark.sql("SELECT COUNT(*) FROM ddl1.ns.t WHERE tag IS NULL")
      .collect()(0).getLong(0) == 5)
    spark.sql("INSERT INTO ddl1.ns.t VALUES (100, 100, 'new')")
    val got = spark.sql(
      "SELECT COUNT(*), COUNT(tag) FROM ddl1.ns.t").collect()(0)
    assert((got.getLong(0), got.getLong(1)) == (6L, 1L))
  }

  test("RENAME COLUMN keeps old files readable by field id") {
    freshCatalog("ddl2")
    spark.sql("CREATE TABLE ddl2.ns.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ddl2.ns.t SELECT id, id * 7 FROM range(0, 10)")
    spark.sql("ALTER TABLE ddl2.ns.t RENAME COLUMN v TO score")
    assert(spark.sql("SELECT CAST(SUM(score) AS BIGINT) FROM ddl2.ns.t")
      .collect()(0).getLong(0) == (0 until 10).map(_ * 7).sum)
    // write under the new name, read everything back
    spark.sql("INSERT INTO ddl2.ns.t (k, score) VALUES (10, 70)")
    assert(spark.sql("SELECT CAST(SUM(score) AS BIGINT) FROM ddl2.ns.t")
      .collect()(0).getLong(0) == (0 to 10).map(_ * 7).sum)
  }

  test("DROP COLUMN hides values; re-adding the name reads null, not old data") {
    freshCatalog("ddl3")
    spark.sql("CREATE TABLE ddl3.ns.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ddl3.ns.t SELECT id, id FROM range(0, 5)")
    spark.sql("ALTER TABLE ddl3.ns.t DROP COLUMN v")
    assert(spark.table("ddl3.ns.t").schema.fieldNames.toSeq == Seq("k"))
    spark.sql("ALTER TABLE ddl3.ns.t ADD COLUMN v BIGINT")
    // fresh field id: the old files' v column must NOT resurrect
    assert(spark.sql("SELECT COUNT(*) FROM ddl3.ns.t WHERE v IS NULL")
      .collect()(0).getLong(0) == 5)
  }

  test("ALTER COLUMN TYPE widens int to long; old files up-cast") {
    freshCatalog("ddl4")
    spark.sql("CREATE TABLE ddl4.ns.t (k INT, v INT)")
    spark.sql("INSERT INTO ddl4.ns.t SELECT id, id FROM range(0, 5)")
    spark.sql("ALTER TABLE ddl4.ns.t ALTER COLUMN v TYPE BIGINT")
    import org.apache.spark.sql.types.LongType
    assert(spark.table("ddl4.ns.t").schema("v").dataType == LongType)
    assert(spark.sql("SELECT SUM(v) FROM ddl4.ns.t").collect()(0).getLong(0) == 10)
    // narrowing refuses
    val err = intercept[Exception] {
      spark.sql("ALTER TABLE ddl4.ns.t ALTER COLUMN k TYPE SMALLINT")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(m => m.contains("unsafe") || m.contains("NOT_SUPPORTED_CHANGE") ||
      m.contains("not supported")))
  }

  test("partition source columns refuse rename and drop") {
    freshCatalog("ddl5")
    spark.sql(
      "CREATE TABLE ddl5.ns.p (k BIGINT, grp BIGINT) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO ddl5.ns.p SELECT id, id % 2 FROM range(0, 4)")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE ddl5.ns.p RENAME COLUMN grp TO g2")
    }
    assert(msgs(e1).exists(_.contains("partition source")))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE ddl5.ns.p DROP COLUMN grp")
    }
    assert(msgs(e2).exists(_.contains("partition source")))
    // the table still works
    assert(spark.sql("SELECT COUNT(*) FROM ddl5.ns.p").collect()(0).getLong(0) == 4)
  }

  test("SET TBLPROPERTIES round-trips through metadata") {
    freshCatalog("ddl6")
    spark.sql("CREATE TABLE ddl6.ns.t (k BIGINT)")
    spark.sql("ALTER TABLE ddl6.ns.t SET TBLPROPERTIES ('write.owner' = 'graft')")
    val props = spark.sessionState.catalogManager.catalog("ddl6")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "t")).properties()
    assert(props.get("write.owner") == "graft")
    spark.sql("ALTER TABLE ddl6.ns.t UNSET TBLPROPERTIES ('write.owner')")
    val props2 = spark.sessionState.catalogManager.catalog("ddl6")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "t")).properties()
    assert(props2.get("write.owner") == null)
  }

  test("renamed column resolves on the V1 fallback paths (limit, merge-on-read)") {
    freshCatalog("ddl8")
    spark.sql("CREATE TABLE ddl8.ns.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ddl8.ns.t SELECT id, id * 7 FROM range(0, 10)")
    spark.sql("ALTER TABLE ddl8.ns.t RENAME COLUMN v TO score")
    // LIMIT pushdown routes through the V1 bridge (toDF/spark.read), whose
    // field-id resolution must be scoped per read, not session conf
    val lim = spark.sql("SELECT k, score FROM ddl8.ns.t ORDER BY k LIMIT 3")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(lim == Seq(0L -> 0L, 1L -> 7L, 2L -> 14L))
    // merge-on-read also takes the V1 bridge: delete one key, scan the rest
    spark.sql("DELETE FROM ddl8.ns.t WHERE k = 4")
    assert(spark.sql("SELECT CAST(SUM(score) AS BIGINT) FROM ddl8.ns.t")
      .collect()(0).getLong(0) == (0 until 10).filter(_ != 4).map(_ * 7).sum)
    // pushed filter on the re-id-safe renamed column still answers right
    assert(spark.sql("SELECT COUNT(*) FROM ddl8.ns.t WHERE score > 20")
      .collect()(0).getLong(0) == (0 until 10).filter(_ != 4).count(_ * 7 > 20))
  }

  test("SET/DROP IDENTIFIER FIELDS: declared, validated, and round-tripped " +
      "through schema evolution") {
    freshCatalog("ddl9")
    spark.sql("CREATE TABLE ddl9.ns.t (id BIGINT NOT NULL, " +
      "cat STRING NOT NULL, score DOUBLE NOT NULL, note STRING)")
    def meta = graft.iceberg.TableMetadata.load(
      s"$wh/ns/t", spark.sessionState.newHadoopConf())
    spark.sql("ALTER TABLE ddl9.ns.t SET IDENTIFIER FIELDS id, cat")
    assert(meta.identifierFieldNames == Seq("id", "cat"))
    // the declaration SURVIVES unrelated evolution (deep-copied schema)
    spark.sql("ALTER TABLE ddl9.ns.t ADD COLUMN extra BIGINT")
    assert(meta.identifierFieldNames == Seq("id", "cat"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // dropping a declared identifier column refuses
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE ddl9.ns.t DROP COLUMN cat") }
    assert(msgs(e1).exists(_.contains("identifier field")))
    // and so does relaxing its NOT NULL (a nullable key breaks CDC
    // pairing and identifier-keyed MERGE — NULL never equals NULL)
    val e1b = intercept[Exception] {
      spark.sql("ALTER TABLE ddl9.ns.t ALTER COLUMN cat DROP NOT NULL") }
    assert(msgs(e1b).exists(_.contains("identifier field")), msgs(e1b).mkString("|"))
    // a nullable column cannot become an identifier field
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE ddl9.ns.t SET IDENTIFIER FIELDS note") }
    assert(msgs(e2).exists(_.contains("required")))
    // float/double cannot (NaN breaks identity equality)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE ddl9.ns.t SET IDENTIFIER FIELDS score") }
    assert(msgs(e3).exists(_.contains("float/double")))
    // the parenthesized form parses too; SET replaces the whole set
    spark.sql("ALTER TABLE ddl9.ns.t SET IDENTIFIER FIELDS (id)")
    assert(meta.identifierFieldNames == Seq("id"))
    // duplicated names dedupe (identifier-field-ids is a SET per spec;
    // duplicate ids would leak into CDC pair columns and MERGE ON)
    spark.sql("ALTER TABLE ddl9.ns.t SET IDENTIFIER FIELDS id, id, cat")
    assert(meta.identifierFieldNames == Seq("id", "cat"))
    spark.sql("ALTER TABLE ddl9.ns.t SET IDENTIFIER FIELDS id, cat")
    // DROP with names narrows; undeclared names refuse; bare DROP clears
    spark.sql("ALTER TABLE ddl9.ns.t DROP IDENTIFIER FIELDS cat")
    assert(meta.identifierFieldNames == Seq("id"))
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE ddl9.ns.t DROP IDENTIFIER FIELDS cat") }
    assert(msgs(e4).exists(_.contains("not a declared identifier")))
    spark.sql("ALTER TABLE ddl9.ns.t DROP IDENTIFIER FIELDS")
    assert(meta.identifierFieldIds.isEmpty)
    // cleared: the column drop now goes through
    spark.sql("ALTER TABLE ddl9.ns.t DROP COLUMN cat")
    assert(!meta.schema.fieldNames.contains("cat"))
  }

  test("evolution coexists with snapshots: time travel reads the old schema's data") {
    freshCatalog("ddl7")
    spark.sql("CREATE TABLE ddl7.ns.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ddl7.ns.t SELECT id, id FROM range(0, 5)")
    spark.sql("ALTER TABLE ddl7.ns.t ADD COLUMN tag STRING")
    spark.sql("INSERT INTO ddl7.ns.t VALUES (9, 9, 'x')")
    // current: 6 rows with tag; snapshot 1 predates the second insert
    assert(spark.sql("SELECT COUNT(*) FROM ddl7.ns.t").collect()(0).getLong(0) == 6)
    assert(spark.sql("SELECT COUNT(*) FROM ddl7.ns.t VERSION AS OF 1")
      .collect()(0).getLong(0) == 5)
  }
}
