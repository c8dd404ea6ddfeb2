package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types._

import graft.iceberg.{IcebergTable, IcebergWriter}
import graft.iceberg.connector.{GraftCatalog, GraftStagedTable}

/** Atomic CREATE / REPLACE TABLE (AS SELECT) through
  * `StagingTableCatalog` ([[graft.iceberg.connector.StagedTables]]) on
  * the filesystem store: the staged write is invisible until ONE
  * metadata swap publishes it; a mid-write failure leaves the catalog
  * exactly as it was (no table for CREATE, the OLD table for REPLACE);
  * rival commits during a REPLACE retry with a re-sequenced snapshot id.
  * The REST-store twin lives in [[RestCatalogSpec]].
  */
class StagedTableSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/staged-warehouse"
  private def conf = spark.sessionState.newHadoopConf()

  private def fresh(cat: String): String = {
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    s"$warehouse/ns"
  }

  private def cat(name: String): GraftCatalog =
    spark.sessionState.catalogManager.catalog(name).asInstanceOf[GraftCatalog]

  test("CTAS is atomic: the result commits as one table; a mid-write " +
      "failure leaves NO table and no namespace debris") {
    val ns = fresh("stg1")
    spark.sql(
      """CREATE TABLE stg1.ns.good AS
        |SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v FROM range(100)""".stripMargin)
    assert(spark.sql("SELECT COUNT(*), SUM(k) FROM stg1.ns.good").head
      .toSeq == Seq(100L, 4950L))
    // the committed table is a REAL one: v0 metadata exists, the staged
    // files live under _staged but are referenced by absolute path
    val t = new IcebergTable(s"$ns/good", conf)
    assert(t.planFiles().nonEmpty &&
      t.planFiles().forall(_.filePath.contains("/_staged/")))
    // a query failing mid-write must leave NOTHING: no table, and the
    // half-built directory must not surface as a namespace either
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE stg1.ns.bad AS
          |SELECT id, CASE WHEN id > 5 THEN raise_error('boom')
          |  ELSE 'x' END AS v FROM range(10)""".stripMargin)
    }
    assert(!spark.catalog.tableExists("stg1.ns.bad"))
    assert(!spark.sql("SHOW NAMESPACES IN stg1.ns").collect()
      .map(_.getString(0)).contains("bad"),
      "a failed staged CREATE must not leave a namespace-shaped dir")
    assert(spark.sql("SHOW TABLES IN stg1.ns").collect()
      .map(_.getString(1)).toSet == Set("good"))
  }

  test("RTAS is atomic: one swap replaces schema AND data; the " +
      "pre-replace snapshot stays readable via time travel UNDER ITS " +
      "OWN SCHEMA; a mid-write failure leaves the old table intact") {
    fresh("stg2")
    spark.sql("CREATE TABLE stg2.ns.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO stg2.ns.t VALUES (1, 'a'), (2, 'b')")
    val oldSnap = spark.sql("SELECT snapshot_id FROM stg2.ns.t.snapshots")
      .collect().map(_.getLong(0)).max
    // mid-write failure: the OLD table stays fully readable
    intercept[Exception] {
      spark.sql(
        """REPLACE TABLE stg2.ns.t AS
          |SELECT id, CASE WHEN id > 5 THEN raise_error('boom')
          |  ELSE 'x' END AS v FROM range(10)""".stripMargin)
    }
    assert(spark.sql("SELECT k, v FROM stg2.ns.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")),
      "a failed RTAS must leave the old table intact")
    // the real RTAS: different schema entirely
    spark.sql(
      """REPLACE TABLE stg2.ns.t AS
        |SELECT CONCAT('n', id) AS name, CAST(id AS DOUBLE) AS score
        |FROM range(3)""".stripMargin)
    val after = spark.sql("SELECT name, score FROM stg2.ns.t ORDER BY name")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(after == Seq(("n0", 0.0), ("n1", 1.0), ("n2", 2.0)))
    // time travel to the pre-replace snapshot serves the OLD schema and
    // rows (the snapshot's recorded schema-id drives the read schema —
    // the new schema's fresh field ids would otherwise read all-null)
    val old = spark.sql(
      s"SELECT * FROM stg2.ns.t VERSION AS OF $oldSnap ORDER BY k")
    assert(old.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(old.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // REPLACE on a missing table refuses; CREATE OR REPLACE creates
    intercept[Exception] {
      spark.sql("REPLACE TABLE stg2.ns.absent AS SELECT 1 AS one")
    }
    spark.sql("CREATE OR REPLACE TABLE stg2.ns.cor AS SELECT 1 AS one")
    assert(spark.sql("SELECT one FROM stg2.ns.cor").head.getInt(0) == 1)
    spark.sql("CREATE OR REPLACE TABLE stg2.ns.cor AS SELECT 7 AS seven")
    assert(spark.sql("SELECT seven FROM stg2.ns.cor").head.getInt(0) == 7)
  }

  test("plain REPLACE TABLE (no AS SELECT) empties the table in one " +
      "commit; history stays time-travelable") {
    fresh("stg3")
    spark.sql("CREATE TABLE stg3.ns.t (k BIGINT)")
    spark.sql("INSERT INTO stg3.ns.t VALUES (1), (2)")
    val oldSnap = spark.sql("SELECT snapshot_id FROM stg3.ns.t.snapshots")
      .collect().map(_.getLong(0)).max
    spark.sql("REPLACE TABLE stg3.ns.t (name STRING, n BIGINT)")
    assert(spark.sql("SELECT COUNT(*) FROM stg3.ns.t").head.getLong(0) == 0L)
    assert(spark.sql("SELECT * FROM stg3.ns.t").schema.fieldNames.toSeq ==
      Seq("name", "n"))
    assert(spark.sql(
      s"SELECT COUNT(*) FROM stg3.ns.t VERSION AS OF $oldSnap")
      .head.getLong(0) == 2L)
    // and the replaced table accepts writes under the new schema
    spark.sql("INSERT INTO stg3.ns.t VALUES ('x', 9)")
    assert(spark.sql("SELECT name, n FROM stg3.ns.t").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("x", 9L)))
  }

  test("a rival append landing between stage and publish 409-retries " +
      "the REPLACE with a re-sequenced snapshot id (replace-wins)") {
    val ns = fresh("stg4")
    spark.sql("CREATE TABLE stg4.ns.t (k BIGINT)")
    spark.sql("INSERT INTO stg4.ns.t VALUES (1), (2)")
    val c = cat("stg4")
    val ident = Identifier.of(Array("ns"), "t")
    val staged = c.stageReplace(ident,
      StructType(Seq(StructField("m", LongType))),
      Array.empty, new java.util.HashMap[String, String]())
      .asInstanceOf[GraftStagedTable]
    // the staged write (what Spark's RTAS exec would run)
    import spark.implicits._
    IcebergWriter.append(spark, staged.stagedDirForTest,
      Seq(100L, 200L).toDF("m"),
      committer = Some(staged.committerForTest))
    // rival append lands on the REAL table AFTER the staged write: it
    // takes the same next snapshot id the staged write predicted
    spark.sql("INSERT INTO stg4.ns.t VALUES (3)")
    staged.commitStagedChanges()
    assert(spark.sql("SELECT m FROM stg4.ns.t ORDER BY m").collect()
      .map(_.getLong(0)).toSeq == Seq(100L, 200L),
      "replace wins: the rival's rows are superseded by definition")
    // every snapshot id in the final history is unique (the staged
    // snapshot was re-sequenced, not collided)
    val ids = new IcebergTable(s"$ns/t", conf).metadata.snapshots
      .map(_.snapshotId)
    assert(ids.distinct.size == ids.size, s"snapshot ids collided: $ids")
    // and a rival SCHEMA evolution during staging aborts loudly
    val staged2 = c.stageReplace(ident,
      StructType(Seq(StructField("z", LongType))),
      Array.empty, new java.util.HashMap[String, String]())
      .asInstanceOf[GraftStagedTable]
    IcebergWriter.append(spark, staged2.stagedDirForTest,
      Seq(7L).toDF("z"), committer = Some(staged2.committerForTest))
    spark.sql("ALTER TABLE stg4.ns.t ADD COLUMN extra STRING")
    val e = intercept[Exception] { staged2.commitStagedChanges() }
    assert(e.getMessage.contains("evolved"), e.getMessage)
    // the abort left the evolved table intact
    assert(spark.sql("SELECT m, extra FROM stg4.ns.t ORDER BY m").collect()
      .map(_.getLong(0)).toSeq == Seq(100L, 200L))
  }

  test("RTAS carries partitioning and properties: the replacement is " +
      "partitioned under the NEW spec with fresh source ids") {
    val ns = fresh("stg5")
    spark.sql("CREATE TABLE stg5.ns.t (k BIGINT)")
    spark.sql("INSERT INTO stg5.ns.t VALUES (1)")
    spark.sql(
      """REPLACE TABLE stg5.ns.t
        |PARTITIONED BY (bucket(4, id))
        |TBLPROPERTIES ('graft.test-marker' = 'yes')
        |AS SELECT id, CONCAT('v', id) AS v FROM range(20)""".stripMargin)
    assert(spark.sql("SELECT COUNT(*) FROM stg5.ns.t").head.getLong(0) == 20L)
    val t = new IcebergTable(s"$ns/t", conf)
    assert(t.metadata.partitionSpec.map(_.transform) == Seq("bucket[4]"))
    // the spec's source id resolves inside the NEW schema
    val idToName = t.metadata.fieldIds.map(_.swap)
    assert(idToName(t.metadata.partitionSpec.head.sourceId) == "id")
    assert(t.metadata.properties.get("graft.test-marker").contains("yes"))
    // partition pruning works over the replacement (files carry tuples)
    assert(t.planFiles().forall(_.partition.nonEmpty))
  }

  test("self-referential RTAS: REPLACE TABLE t AS SELECT ... FROM t " +
      "reads the OLD table while staging the replacement") {
    fresh("stg6")
    spark.sql("CREATE TABLE stg6.ns.t (k BIGINT)")
    spark.sql("INSERT INTO stg6.ns.t VALUES (1), (2), (3)")
    spark.sql(
      """REPLACE TABLE stg6.ns.t AS
        |SELECT k * 10 AS k10 FROM stg6.ns.t WHERE k <> 2""".stripMargin)
    assert(spark.sql("SELECT k10 FROM stg6.ns.t ORDER BY k10").collect()
      .map(_.getLong(0)).toSeq == Seq(10L, 30L))
    // and again on top of the replacement (the chain keeps working)
    spark.sql(
      "REPLACE TABLE stg6.ns.t AS SELECT k10 + 1 AS k11 FROM stg6.ns.t")
    assert(spark.sql("SELECT k11 FROM stg6.ns.t ORDER BY k11").collect()
      .map(_.getLong(0)).toSeq == Seq(11L, 31L))
  }

  test("a LOSING staged CREATE's abort must not delete the winner's " +
      "committed files (both live under the table's _staged area)") {
    val ns = fresh("stg7")
    val c = cat("stg7")
    val ident = Identifier.of(Array("ns"), "t")
    // loser stages first (marker + its own _staged/<uuid> child) ...
    val loser = c.stageCreate(ident,
      StructType(Seq(StructField("m", LongType))),
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      new java.util.HashMap[String, String]())
      .asInstanceOf[GraftStagedTable]
    import spark.implicits._
    IcebergWriter.append(spark, loser.stagedDirForTest,
      Seq(7L).toDF("m"), committer = Some(loser.committerForTest))
    // ... rival CTAS wins the publish race: its data files stay under
    // _staged/<uuid> by absolute path
    spark.sql(
      "CREATE TABLE stg7.ns.t AS SELECT id AS k FROM range(50)")
    assert(spark.sql("SELECT COUNT(*) FROM stg7.ns.t").head.getLong(0) == 50L)
    // the loser's publish loses, and its abort path runs cleanup — which
    // must remove ONLY the loser's staging child, never the whole
    // _staged subdir holding the winner's committed data
    intercept[Exception] { loser.commitStagedChanges() }
    loser.abortStagedChanges()
    assert(spark.sql("SELECT COUNT(*), SUM(k) FROM stg7.ns.t").head
      .toSeq == Seq(50L, 1225L),
      "losing abort wiped the winner's committed data files")
    val t = new IcebergTable(s"$ns/t", conf)
    val fsys = new Path(ns).getFileSystem(conf)
    assert(t.planFiles().forall(f => fsys.exists(new Path(f.filePath))),
      "committed data files missing after rival abort")
  }

  test("createNamespace age-gates staged-debris cleanup: a FRESH marker " +
      "(in-flight staged CTAS) keeps its files; a stale one is cleared") {
    fresh("stg8")
    val fsys = new Path(warehouse).getFileSystem(conf)
    val dir = new Path(s"$warehouse/pending")
    val marker = new Path(dir, ".graft-staged")
    val stagedFile = new Path(dir, "_staged/u1/part-0.parquet")
    fsys.create(marker, true).close()
    val out = fsys.create(stagedFile, true); out.write(1); out.close()
    // fresh marker: an in-flight staged CTAS — CREATE NAMESPACE must not
    // delete its half-written files
    spark.sql("CREATE NAMESPACE stg8.pending")
    assert(fsys.exists(stagedFile),
      "CREATE NAMESPACE deleted an in-flight staged CTAS's files")
    // stale marker (older than the debris age gate): crashed attempt —
    // now the cleanup may clear it so the name is not blocked forever
    val old = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    fsys.setTimes(marker, old, old)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS stg8.pending")
    assert(!fsys.exists(stagedFile) && !fsys.exists(marker),
      "stale staged debris was not cleared")
  }
}
