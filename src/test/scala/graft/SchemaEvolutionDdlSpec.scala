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

  test("v3 promotions: unknown -> any serves NULL for history; " +
      "date -> timestamp widens through the parquet read; v2 refuses both") {
    freshCatalog("ddl4b")
    // v2 table: both promotions refuse, naming the v3 requirement
    spark.sql("CREATE TABLE ddl4b.ns.v2t (k BIGINT, d DATE)")
    spark.sql("INSERT INTO ddl4b.ns.v2t VALUES (1, DATE'2024-03-05')")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE ddl4b.ns.v2t ALTER COLUMN d TYPE TIMESTAMP_NTZ")
    }
    assert(e2.getMessage.contains("format-version 3"))
    // v3: unknown (VOID) promotes to BIGINT — pre-promotion rows read
    // NULL (the column was never stored), later inserts store values
    spark.sql("""CREATE TABLE ddl4b.ns.t TBLPROPERTIES ('format-version'='3')
                 AS SELECT id AS k, NULL AS u,
                    DATE'2024-01-01' + CAST(id AS INT) AS d
                 FROM range(0, 4)""")
    spark.sql("ALTER TABLE ddl4b.ns.t ALTER COLUMN u TYPE BIGINT")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    assert(spark.table("ddl4b.ns.t").schema("u").dataType == LongType)
    spark.sql("INSERT INTO ddl4b.ns.t VALUES " +
      "(100, 7, DATE'2024-02-01'), (101, 8, DATE'2024-02-02')")
    val got = spark.sql(
      "SELECT k, u FROM ddl4b.ns.t ORDER BY k").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(got == (0L until 4L).map(i => (i, None)) ++
      Seq((100L, Some(7L)), (101L, Some(8L))))
    // v3: date -> timestamp — old INT32 date pages read as midnight
    // timestamps through Spark's type-widening parquet read
    spark.sql("ALTER TABLE ddl4b.ns.t ALTER COLUMN d TYPE TIMESTAMP_NTZ")
    assert(spark.table("ddl4b.ns.t").schema("d").dataType == TimestampNTZType)
    val days = spark.sql(
      """SELECT k, CAST(d AS STRING) FROM ddl4b.ns.t
         WHERE k IN (0, 100) ORDER BY k""").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(days == Seq((0L, "2024-01-01 00:00:00"),
      (100L, "2024-02-01 00:00:00")), s"widened reads: $days")
    // timestamptz is NOT a legal date promotion (spec: timestamp only)
    val eTz = intercept[Exception] {
      spark.sql("CREATE TABLE ddl4b.ns.t2 (d DATE) " +
        "TBLPROPERTIES ('format-version'='3')")
      spark.sql("ALTER TABLE ddl4b.ns.t2 ALTER COLUMN d TYPE TIMESTAMP_LTZ")
    }
    assert(eTz.getMessage.contains("unsafe") ||
      eTz.getMessage.contains("NOT_SUPPORTED_CHANGE"))
    // declared-ORC tables refuse date -> timestamp at the DDL: the ORC
    // reader cannot widen date pages, so the promotion would brick
    // every later read of pre-promotion files (probed empirically:
    // FAILED_READ_FILE on the first post-DDL scan)
    spark.sql("""CREATE TABLE ddl4b.ns.orct (d DATE)
                 TBLPROPERTIES ('format-version' = '3',
                                'write.format-default' = 'orc')""")
    spark.sql("INSERT INTO ddl4b.ns.orct VALUES (DATE'2024-03-05')")
    val eOrc = intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE ddl4b.ns.orct ALTER COLUMN d TYPE TIMESTAMP_NTZ")
    }
    assert(eOrc.getMessage.contains("parquet tables only"))
    assert(spark.sql("SELECT CAST(d AS STRING) FROM ddl4b.ns.orct")
      .collect()(0).getString(0) == "2024-03-05", "reads must stay healthy")
    // a DATE column carrying a DEFAULT: the promotion must re-encode the
    // stored default to the timestamp JSON form, or the next metadata
    // load fails parsing and bricks the table
    spark.sql("""CREATE TABLE ddl4b.ns.defp (k BIGINT)
                 TBLPROPERTIES ('format-version' = '3')""")
    spark.sql("INSERT INTO ddl4b.ns.defp VALUES (1)")
    spark.sql("ALTER TABLE ddl4b.ns.defp ADD COLUMN d DATE DEFAULT " +
      "DATE'2024-01-05'")
    spark.sql("ALTER TABLE ddl4b.ns.defp ALTER COLUMN d TYPE TIMESTAMP_NTZ")
    spark.sql("INSERT INTO ddl4b.ns.defp (k) VALUES (2)")
    val defGot = spark.sql(
      "SELECT k, CAST(d AS STRING) FROM ddl4b.ns.defp ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(defGot == Seq((1L, "2024-01-05 00:00:00"),
      (2L, "2024-01-05 00:00:00")),
      s"promoted defaults must serve the midnight reading: $defGot")
    // the SERIALIZED form must carry the seconds field: the spec's
    // single-value pattern is "YYYY-MM-DDTHH:MM:SS(.ffffff)", and
    // ISO_LOCAL_DATE_TIME omits ":00" seconds at midnight — stricter
    // engines would then refuse to load the metadata (r16 advice)
    val metaDir = new java.io.File(s"$wh/ns/defp/metadata")
    val latest = metaDir.listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val raw = java.nio.file.Files.readString(latest.toPath)
    assert(raw.contains("2024-01-05T00:00:00"),
      "re-encoded default must serialize with explicit seconds")
    assert(!raw.contains("\"2024-01-05T00:00\""),
      "the seconds-less ISO form must not appear in stored defaults")
  }

  test("nested VOID (unknown) refuses at CREATE and ADD COLUMN — a " +
      "struct field cannot be stripped from data files") {
    freshCatalog("ddl4c")
    val e1 = intercept[UnsupportedOperationException] {
      spark.sql("""CREATE TABLE ddl4c.ns.bad
                   TBLPROPERTIES ('format-version' = '3')
                   AS SELECT id, named_struct('a', NULL) AS s FROM range(3)""")
    }
    assert(e1.getMessage.contains("nested inside a composite"))
    spark.sql("CREATE TABLE ddl4c.ns.t (k BIGINT) " +
      "TBLPROPERTIES ('format-version' = '3')")
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE ddl4c.ns.t ADD COLUMN s STRUCT<a: VOID>")
    }
    assert(e2.getMessage.contains("nested inside a composite"))
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

  test("v3 column DEFAULTs: initial-default serves pre-column files, " +
      "write-default fills INSERT omissions, SET/DROP move only the " +
      "write side") {
    freshCatalog("ddl10")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // defaults are a v3 schema feature: refused on v2 at CREATE and ALTER
    val e0 = intercept[Exception] {
      spark.sql("CREATE TABLE ddl10.ns.bad (k BIGINT, v STRING DEFAULT 'x')") }
    assert(msgs(e0).exists(_.contains("format-version 3")), msgs(e0).mkString("|"))
    spark.sql("CREATE TABLE ddl10.ns.v2t (k BIGINT)")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE ddl10.ns.v2t ADD COLUMN c INT DEFAULT 1") }
    assert(msgs(e1).exists(_.contains("format-version 3")), msgs(e1).mkString("|"))

    spark.sql("CREATE TABLE ddl10.ns.t (k BIGINT, v STRING DEFAULT 'x') " +
      "TBLPROPERTIES ('format-version' = '3')")
    val dir = s"$wh/ns/t"
    def meta = graft.iceberg.TableMetadata.load(
      dir, spark.sessionState.newHadoopConf())
    // born v3: defaults never transit through v2 metadata
    assert(meta.formatVersion == 3)
    spark.sql("INSERT INTO ddl10.ns.t (k) VALUES (1)") // write-default fills
    spark.sql("INSERT INTO ddl10.ns.t VALUES (2, 'real'), (3, NULL)")
    // ADD COLUMN DEFAULT: files written BEFORE the column serve the
    // initial-default (per-file, at the reader); an explicit NULL stays
    spark.sql("ALTER TABLE ddl10.ns.t ADD COLUMN score DOUBLE DEFAULT 1.5")
    // NOT NULL becomes addable WITH a default (v3 required-with-default)
    spark.sql("ALTER TABLE ddl10.ns.t ADD COLUMN tag STRING NOT NULL DEFAULT 'n/a'")
    assert(spark.sql("SELECT k, v, score, tag FROM ddl10.ns.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3))).toSeq ==
      Seq((1L, "x", 1.5, "n/a"), (2L, "real", 1.5, "n/a"),
        (3L, null, 1.5, "n/a")))
    // SET DEFAULT moves the WRITE default; pre-column files keep serving
    // the immutable initial-default
    spark.sql("ALTER TABLE ddl10.ns.t ALTER COLUMN score SET DEFAULT 9.0")
    spark.sql("INSERT INTO ddl10.ns.t (k) VALUES (4)")
    // DROP DEFAULT removes only the write side
    spark.sql("ALTER TABLE ddl10.ns.t ALTER COLUMN score DROP DEFAULT")
    spark.sql("INSERT INTO ddl10.ns.t (k) VALUES (5)")
    val rows = spark.sql("SELECT k, score FROM ddl10.ns.t ORDER BY k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 1.5), (2L, 1.5), (3L, 1.5), (4L, 9.0), (5L, null)),
      rows.toString)
    val scoreField = meta.schema.fields.find(_.name == "score").get
    assert(scoreField.metadata.contains("EXISTS_DEFAULT"),
      "initial-default is immutable — DROP DEFAULT must not remove it")
    assert(!scoreField.metadata.contains("CURRENT_DEFAULT"),
      "DROP DEFAULT removes the write-default")
    // unsupported shapes refuse loudly at declaration
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE ddl10.ns.t ADD COLUMN b BINARY DEFAULT X'0A'") }
    assert(msgs(e2).exists(_.contains("BINARY defaults")), msgs(e2).mkString("|"))
    // NOT NULL without a default still refuses (no value for old rows)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE ddl10.ns.t ADD COLUMN r INT NOT NULL") }
    assert(msgs(e3).exists(_.contains("DEFAULT")), msgs(e3).mkString("|"))
  }

  test("v3 column DEFAULTs serve across all three data formats and " +
      "survive row-level rewrites") {
    freshCatalog("ddl11")
    for ((fmt, tbl) <- Seq("parquet" -> "pt", "orc" -> "ot", "avro" -> "at")) {
      spark.sql(s"CREATE TABLE ddl11.ns.$tbl (k BIGINT) TBLPROPERTIES (" +
        s"'format-version' = '3', 'write.format-default' = '$fmt')")
      spark.sql(s"INSERT INTO ddl11.ns.$tbl VALUES (1)")
      spark.sql(s"ALTER TABLE ddl11.ns.$tbl ADD COLUMN v STRING DEFAULT 'd-$fmt'")
      spark.sql(s"INSERT INTO ddl11.ns.$tbl VALUES (2, 'real')")
      assert(spark.sql(s"SELECT k, v FROM ddl11.ns.$tbl ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, s"d-$fmt"), (2L, "real")), s"format $fmt")
    }
    // typed battery on the parquet path: date/timestamp/decimal/float/bool
    spark.sql("ALTER TABLE ddl11.ns.pt ADD COLUMN d DATE DEFAULT DATE'2020-02-29'")
    spark.sql("ALTER TABLE ddl11.ns.pt ADD COLUMN ts TIMESTAMP_NTZ " +
      "DEFAULT TIMESTAMP_NTZ'2021-03-04 05:06:07.123456'")
    spark.sql("ALTER TABLE ddl11.ns.pt ADD COLUMN dec DECIMAL(9,2) DEFAULT 14.20")
    spark.sql("ALTER TABLE ddl11.ns.pt ADD COLUMN f FLOAT DEFAULT 1.25")
    spark.sql("ALTER TABLE ddl11.ns.pt ADD COLUMN bo BOOLEAN DEFAULT true")
    val t = spark.sql("SELECT COUNT(DISTINCT d), COUNT(DISTINCT ts), " +
      "COUNT(DISTINCT dec), COUNT(DISTINCT f), COUNT(DISTINCT bo), " +
      "MIN(d), MIN(dec) FROM ddl11.ns.pt").collect()(0)
    assert((t.getLong(0), t.getLong(1), t.getLong(2), t.getLong(3),
      t.getLong(4)) == (1L, 1L, 1L, 1L, 1L))
    assert(t.getDate(5).toString == "2020-02-29")
    assert(t.getDecimal(6).toPlainString == "14.20")
    // row-level ops over mixed files: CoW UPDATE + DELETE keep serving
    // the default for untouched pre-column files and materialize it in
    // rewritten ones
    spark.sql("CREATE TABLE ddl11.ns.rl (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('format-version' = '3')")
    spark.sql("INSERT INTO ddl11.ns.rl SELECT id, concat('v', id) FROM range(10)")
    spark.sql("ALTER TABLE ddl11.ns.rl ADD COLUMN s INT NOT NULL DEFAULT 7")
    spark.sql("UPDATE ddl11.ns.rl SET v = 'u' WHERE k = 3")
    spark.sql("DELETE FROM ddl11.ns.rl WHERE k = 5")
    assert(spark.sql("SELECT SUM(s), COUNT(*) FROM ddl11.ns.rl WHERE s = 7")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((63L, 9L)))
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
