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
      val warehouse = graft.Scratch.dir("q3b-warehouse")
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
    }),

    // Write path + time travel end-to-end: CREATE TABLE metadata, two
    // append snapshot commits (IcebergWriter), then VERSION AS OF reads
    // the FIRST snapshot while the current read sees both. The oracle
    // states the same split from the source table, so snapshot isolation
    // is hash-gated, not just row-counted.
    "q54_time_travel" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.col
      import graft.iceberg.IcebergWriter
      val warehouse = graft.Scratch.dir("q54-warehouse")
      val tableDir = s"$warehouse/ns/region_tt"
      val conf = s.sessionState.newHadoopConf()
      val fs = new Path(warehouse).getFileSystem(conf)
      fs.delete(new Path(tableDir), true)
      val region = Tables.load(s, d, "region")
        .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
      val metaJson = graft.iceberg.connector.IcebergJson.tableMetadata(
        new com.fasterxml.jackson.databind.ObjectMapper(), tableDir,
        region.schema, Nil, Map.empty)
      val out = fs.create(new Path(s"$tableDir/metadata/v1.metadata.json"), true)
      try out.write(metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val snap1 = IcebergWriter.append(s, tableDir,
        region.filter(col("r_regionkey") < 3))
      IcebergWriter.append(s, tableDir, region.filter(col("r_regionkey") >= 3))
      s.conf.set("spark.sql.catalog.q54cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q54cat.warehouse", warehouse)
      s.sql(
        s"""SELECT v1.n_v1, v1.sk_v1, cur.n_cur FROM
           |  (SELECT COUNT(*) AS n_v1, CAST(SUM(r_regionkey) AS BIGINT) AS sk_v1
           |   FROM q54cat.ns.region_tt VERSION AS OF $snap1) v1
           |CROSS JOIN
           |  (SELECT COUNT(*) AS n_cur FROM q54cat.ns.region_tt) cur""".stripMargin)
    }),

    // SQL write surface end-to-end: CTAS (non-atomic createTable + write),
    // INSERT INTO (append snapshot), INSERT OVERWRITE (truncate snapshot)
    // — all through the DSv2 catalog, then a read back that the oracle
    // restates from the source table. Overwrite semantics are hash-gated:
    // a wrong truncate (rows surviving, or appends lost) changes the
    // group counts.
    "q55_sql_write" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q55-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q55")
      s.conf.set("spark.sql.catalog.q55cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q55cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q55cat.ns")
      s.sql(
        """CREATE TABLE q55cat.ns.nation_w AS
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q55
          |WHERE n_regionkey < 2""".stripMargin)
      s.sql(
        """INSERT INTO q55cat.ns.nation_w
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q55
          |WHERE n_regionkey >= 2""".stripMargin)
      s.sql(
        """INSERT OVERWRITE q55cat.ns.nation_w
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q55
          |WHERE n_regionkey <> 1""".stripMargin)
      s.sql(
        """SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sk
          |FROM q55cat.ns.nation_w
          |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // SQL DELETE end-to-end: rows removed by an equality predicate commit
    // as a v2 equality-delete file (merge-on-read — no data rewrite), and
    // the read back is hash-gated against the oracle stating the same
    // surviving set. Also exercises sequence gating implicitly: the
    // delete snapshot follows the insert snapshot.
    // SQL UPDATE + range DELETE end-to-end: both go through Spark's
    // group-based row-level rewrites onto the copy-on-write scan+write
    // pair (RowLevelOps) — the scan reads only files whose footer bounds
    // may match, the write swaps exactly those files in one snapshot.
    // The range DELETE predicate is NOT expressible as equality tuples,
    // so it exercises the ReplaceData path (q57 covers the merge-on-read
    // equality path).
    "q58_sql_update" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q58-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q58")
      s.conf.set("spark.sql.catalog.q58cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q58cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q58cat.ns")
      s.sql(
        """CREATE TABLE q58cat.ns.nation_u AS
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q58""".stripMargin)
      s.sql(
        """UPDATE q58cat.ns.nation_u SET n_regionkey = n_regionkey + 10
          |WHERE n_nationkey >= 15""".stripMargin)
      s.sql("DELETE FROM q58cat.ns.nation_u WHERE n_regionkey >= 12")
      s.sql(
        """SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sk
          |FROM q58cat.ns.nation_u
          |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // SQL MERGE INTO: matched rows update, unmatched source rows insert —
    // Spark's RewriteMergeIntoTable over the same copy-on-write pair.
    "q59_sql_merge" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q59-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q59")
      s.conf.set("spark.sql.catalog.q59cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q59cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q59cat.ns")
      s.sql(
        """CREATE TABLE q59cat.ns.nation_m AS
          |SELECT n_nationkey, n_regionkey FROM nation_src_q59
          |WHERE n_nationkey < 15""".stripMargin)
      s.sql(
        """MERGE INTO q59cat.ns.nation_m t
          |USING (SELECT n_nationkey, n_regionkey + 100 AS r
          |       FROM nation_src_q59
          |       WHERE n_nationkey BETWEEN 10 AND 24) s
          |ON t.n_nationkey = s.n_nationkey
          |WHEN MATCHED THEN UPDATE SET n_regionkey = s.r
          |WHEN NOT MATCHED THEN INSERT (n_nationkey, n_regionkey)
          |  VALUES (s.n_nationkey, s.r)""".stripMargin)
      s.sql(
        """SELECT COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sk,
          |       CAST(SUM(n_regionkey) AS BIGINT) AS sr,
          |       CAST(MIN(n_regionkey) AS INT) AS mn,
          |       CAST(MAX(n_regionkey) AS INT) AS mx
          |FROM q59cat.ns.nation_m""".stripMargin)
    }),

    // Selective DELETE via POSITION deletes: a range predicate matching a
    // small fraction of one data file writes an O(matched-rows) v2
    // position-delete file — no data rewrite — applied by the existing
    // merge-on-read anti-join. (`DeleteFilesSpec` pins the mechanism; the
    // oracle gates the visible result.)
    "q60_pos_delete" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q60-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q60")
      s.conf.set("spark.sql.catalog.q60cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q60cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q60cat.ns")
      s.sql(
        """CREATE TABLE q60cat.ns.nation_pd AS
          |SELECT /*+ REPARTITION(1) */ n_nationkey, n_regionkey, n_name
          |FROM nation_src_q60""".stripMargin)
      s.sql("DELETE FROM q60cat.ns.nation_pd WHERE n_nationkey >= 20")
      s.sql(
        """SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sk
          |FROM q60cat.ns.nation_pd
          |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // Snapshot expiration: append → compact → expire all but the current
    // snapshot; the table must still read green afterwards (the expired
    // pre-compaction files are physically deleted — `MaintenanceSpec`
    // pins the cleanup; the oracle gates the surviving values).
    "q61_expire" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q61-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "region").createOrReplaceTempView("region_src_q61")
      s.conf.set("spark.sql.catalog.q61cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q61cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q61cat.ns")
      s.sql(
        """CREATE TABLE q61cat.ns.region_e AS
          |SELECT r_regionkey, r_name FROM region_src_q61
          |WHERE r_regionkey < 3""".stripMargin)
      s.sql(
        """INSERT INTO q61cat.ns.region_e
          |SELECT r_regionkey, r_name FROM region_src_q61
          |WHERE r_regionkey >= 3""".stripMargin)
      val dir = s"$warehouse/ns/region_e"
      graft.iceberg.IcebergWriter.compact(s, dir)
      graft.iceberg.IcebergWriter.expireSnapshots(
        s, dir, olderThanMs = Long.MaxValue, retainLast = 1)
      s.sql(
        """SELECT COUNT(*) AS n, CAST(SUM(r_regionkey) AS BIGINT) AS sk,
          |       MIN(r_name) AS mn, MAX(r_name) AS mx
          |FROM q61cat.ns.region_e""".stripMargin)
    }),

    // Incremental append reads + snapshot refs end-to-end: three append
    // snapshots, a tag pinned at the second, then (a) the rows appended
    // BETWEEN snapshots 1 and 2 via the manifest-level file diff
    // (IcebergTable.appendedBetween — no full-table rescan) aggregated by
    // region, and (b) a `VERSION AS OF '<tag>'` read through the catalog.
    // The oracle restates both windows from the source table, so a diff
    // that leaked old files (or a tag resolving to the wrong snapshot)
    // hash-mismatches.
    "q62_incremental" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.col
      import graft.iceberg.{IcebergTable, IcebergWriter}
      val warehouse = graft.Scratch.dir("q62-warehouse")
      val tableDir = s"$warehouse/ns/nation_inc"
      val conf = s.sessionState.newHadoopConf()
      val fs = new Path(warehouse).getFileSystem(conf)
      fs.delete(new Path(tableDir), true)
      val nation = Tables.load(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_regionkey").cast("long").as("n_regionkey"), col("n_name"))
      val metaJson = graft.iceberg.connector.IcebergJson.tableMetadata(
        new com.fasterxml.jackson.databind.ObjectMapper(), tableDir,
        nation.schema, Nil, Map.empty)
      val out = fs.create(new Path(s"$tableDir/metadata/v1.metadata.json"), true)
      try out.write(metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val s1 = IcebergWriter.append(s, tableDir,
        nation.filter(col("n_nationkey") < 10))
      val s2 = IcebergWriter.append(s, tableDir,
        nation.filter(col("n_nationkey").between(10, 19)))
      IcebergWriter.append(s, tableDir, nation.filter(col("n_nationkey") >= 20))
      IcebergWriter.createRef(conf, tableDir, "batch2", s2)
      new IcebergTable(tableDir, conf).appendedBetween(s, s1, s2)
        .createOrReplaceTempView("q62_inc")
      s.conf.set("spark.sql.catalog.q62cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q62cat.warehouse", warehouse)
      s.sql(
        """SELECT inc.n_regionkey, inc.n_inc, inc.sk_inc, ref.n_ref FROM
          |  (SELECT n_regionkey, COUNT(*) AS n_inc,
          |          CAST(SUM(n_nationkey) AS BIGINT) AS sk_inc
          |   FROM q62_inc GROUP BY n_regionkey) inc
          |CROSS JOIN
          |  (SELECT COUNT(*) AS n_ref
          |   FROM q62cat.ns.nation_inc VERSION AS OF 'batch2') ref
          |ORDER BY inc.n_regionkey""".stripMargin)
    }),

    // Write-audit-publish end-to-end: CREATE BRANCH (SQL DDL via the
    // parser extension, API fallback for sessions built without it), then
    // INSERT + equality DELETE staged on the branch via the
    // `spark.wap.branch` conf — a tag pinned at main's head AFTER staging
    // proves main never moved — then fastForward publishes and main sees
    // the audited state. All three reads are hash-gated: a leak to main
    // (n_pre ≠ 10), a lost staged write (n_branch), or a bad publish
    // (n_after/sk_after) each flips a column.
    "q64_wap" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q64-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q64")
      s.conf.set("spark.sql.catalog.q64cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q64cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q64cat.ns")
      s.sql(
        """CREATE TABLE q64cat.ns.nation_wap AS
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q64
          |WHERE n_nationkey < 10""".stripMargin)
      val dir = s"$warehouse/ns/nation_wap"
      def ref(ddl: String, name: String, refType: String): Unit =
        try { s.sql(ddl); () }
        catch { case _: org.apache.spark.sql.catalyst.parser.ParseException =>
          graft.iceberg.IcebergWriter.createRef(conf, dir, name,
            graft.iceberg.TableMetadata.load(dir, conf).currentSnapshotId.get,
            refType)
        }
      ref("ALTER TABLE q64cat.ns.nation_wap CREATE BRANCH audit",
        "audit", "branch")
      s.conf.set("spark.wap.branch", "audit")
      try {
        s.sql(
          """INSERT INTO q64cat.ns.nation_wap
            |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q64
            |WHERE n_nationkey >= 10""".stripMargin)
        s.sql("DELETE FROM q64cat.ns.nation_wap WHERE n_nationkey IN (0, 1, 2)")
      } finally s.conf.unset("spark.wap.branch")
      ref("ALTER TABLE q64cat.ns.nation_wap CREATE TAG before_publish",
        "before_publish", "tag")
      graft.iceberg.IcebergWriter.fastForward(conf, dir, from = "audit")
      s.sql(
        """SELECT pre.n_pre, br.n_branch, cur.n_after, cur.sk_after FROM
          |  (SELECT COUNT(*) AS n_pre
          |   FROM q64cat.ns.nation_wap VERSION AS OF 'before_publish') pre
          |CROSS JOIN
          |  (SELECT COUNT(*) AS n_branch
          |   FROM q64cat.ns.nation_wap VERSION AS OF 'audit') br
          |CROSS JOIN
          |  (SELECT COUNT(*) AS n_after,
          |          CAST(SUM(n_nationkey) AS BIGINT) AS sk_after
          |   FROM q64cat.ns.nation_wap) cur""".stripMargin)
    }),

    // Cherry-pick publish: two commits staged on a WAP branch, main
    // advances past the fork (fastForward impossible), then ONE staged
    // commit is published alone via CALL cherrypick_snapshot — metadata
    // only, no data moves. The result reads main after (base + advance +
    // the picked commit, not the other), the intact branch, and a sum
    // hash-gate over main.
    "q72_cherrypick" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q72-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q72")
      s.conf.set("spark.sql.catalog.q72cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q72cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q72cat.ns")
      s.sql(
        """CREATE TABLE q72cat.ns.nation_cp AS
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q72
          |WHERE n_nationkey < 10""".stripMargin)
      val dir = s"$warehouse/ns/nation_cp"
      s.sql("ALTER TABLE q72cat.ns.nation_cp CREATE BRANCH audit")
      s.conf.set("spark.wap.branch", "audit")
      try {
        s.sql(
          """INSERT INTO q72cat.ns.nation_cp
            |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q72
            |WHERE n_nationkey BETWEEN 10 AND 14""".stripMargin)
        s.sql(
          """INSERT INTO q72cat.ns.nation_cp
            |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q72
            |WHERE n_nationkey BETWEEN 15 AND 19""".stripMargin)
      } finally s.conf.unset("spark.wap.branch")
      // main moves past the fork: all-or-nothing publish is impossible now
      s.sql(
        """INSERT INTO q72cat.ns.nation_cp
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q72
          |WHERE n_nationkey = 20""".stripMargin)
      val picked = graft.iceberg.TableMetadata.load(dir, conf).refs("audit")
      s.sql("CALL q72cat.system.cherrypick_snapshot(table => 'ns.nation_cp', " +
        s"snapshot_id => $picked)")
      s.sql(
        """SELECT cur.n_after, cur.sk_after, br.n_branch FROM
          |  (SELECT COUNT(*) AS n_after,
          |          CAST(SUM(n_nationkey) AS BIGINT) AS sk_after
          |   FROM q72cat.ns.nation_cp) cur
          |CROSS JOIN
          |  (SELECT COUNT(*) AS n_branch
          |   FROM q72cat.ns.nation_cp VERSION AS OF 'audit') br""".stripMargin)
    }),

    // Multi-table transaction: stage appends to TWO tables (facts by
    // region split), publish both in one all-or-nothing commit, then a
    // third staged pair is made stale by a rival commit — the failed
    // transaction must leave BOTH tables exactly as the first left them.
    "q73_multitable_tx" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import graft.iceberg.{FsCommitter, IcebergWriter, Transactions,
        CommitConflictException}
      val warehouse = graft.Scratch.dir("q73-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q73")
      s.conf.set("spark.sql.catalog.q73cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q73cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q73cat.ns")
      s.sql(
        """CREATE TABLE q73cat.ns.low AS
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q73
          |WHERE n_regionkey < 2 AND n_nationkey < 10""".stripMargin)
      s.sql(
        """CREATE TABLE q73cat.ns.high AS
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q73
          |WHERE n_regionkey >= 2 AND n_nationkey < 10""".stripMargin)
      val dLow = s"$warehouse/ns/low"
      val dHigh = s"$warehouse/ns/high"
      def part(pred: String) = s.sql(
        s"""SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q73
           |WHERE $pred""".stripMargin)
      // both halves of the 10..19 band land in ONE transaction
      val c1 = Transactions.stage(new FsCommitter(dLow, conf)) { c =>
        IcebergWriter.append(s, dLow,
          part("n_regionkey < 2 AND n_nationkey BETWEEN 10 AND 19"),
          committer = Some(c)); ()
      }
      val c2 = Transactions.stage(new FsCommitter(dHigh, conf)) { c =>
        IcebergWriter.append(s, dHigh,
          part("n_regionkey >= 2 AND n_nationkey BETWEEN 10 AND 19"),
          committer = Some(c)); ()
      }
      Transactions.commitAll(Seq(c1, c2))
      // a second transaction goes stale (rival moves `high`) — it must
      // publish NOTHING to either table
      val c3 = Transactions.stage(new FsCommitter(dLow, conf)) { c =>
        IcebergWriter.append(s, dLow, part("n_nationkey >= 20"),
          committer = Some(c)); ()
      }
      val c4 = Transactions.stage(new FsCommitter(dHigh, conf)) { c =>
        IcebergWriter.append(s, dHigh, part("n_nationkey >= 20"),
          committer = Some(c)); ()
      }
      IcebergWriter.append(s, dHigh, part("n_nationkey = 20"))
      val failed =
        try { Transactions.commitAll(Seq(c3, c4)); false }
        catch { case _: CommitConflictException => true }
      require(failed, "stale transaction must be rejected")
      val cat = s.sessionState.catalogManager.catalog("q73cat")
        .asInstanceOf[GraftCatalog]
      Seq("low", "high").foreach(t => cat.invalidateTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("ns"), t)))
      s.sql(
        """SELECT lo.n_low, lo.sk_low, hi.n_high, hi.sk_high FROM
          |  (SELECT COUNT(*) AS n_low,
          |          CAST(SUM(n_nationkey) AS BIGINT) AS sk_low
          |   FROM q73cat.ns.low) lo
          |CROSS JOIN
          |  (SELECT COUNT(*) AS n_high,
          |          CAST(SUM(n_nationkey) AS BIGINT) AS sk_high
          |   FROM q73cat.ns.high) hi""".stripMargin)
    }),

    "q57_sql_delete" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q57-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q57")
      s.conf.set("spark.sql.catalog.q57cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q57cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q57cat.ns")
      s.sql(
        """CREATE TABLE q57cat.ns.nation_d AS
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q57""".stripMargin)
      s.sql("DELETE FROM q57cat.ns.nation_d WHERE n_regionkey = 2")
      s.sql("DELETE FROM q57cat.ns.nation_d WHERE n_nationkey IN (0, 1)")
      s.sql(
        """SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sk
          |FROM q57cat.ns.nation_d
          |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // Z-order rewrite end-to-end through SQL: CTAS from lineitem, CALL
    // rewrite_data_files(strategy => 'sort', sort_order => 'zorder(...)'),
    // then an aggregate over a 2-D selective slice is hash-gated (row
    // preservation through the rewrite) — ZOrderSpec pins the pruning
    // physics, the oracle pins the values.
    "q68_zorder" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q68-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "lineitem").createOrReplaceTempView("lineitem_src_q68")
      s.conf.set("spark.sql.catalog.q68cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q68cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q68cat.ns")
      s.sql(
        """CREATE TABLE q68cat.ns.li_z AS
          |SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
          |FROM lineitem_src_q68""".stripMargin)
      s.sql(
        "CALL q68cat.system.rewrite_data_files(table => 'ns.li_z', " +
          "strategy => 'sort', sort_order => 'zorder(l_orderkey, l_partkey)', " +
          "target_file_size_bytes => 262144)").collect()
      s.sql(
        """SELECT COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS sq,
          |       CAST(SUM(l_orderkey) AS BIGINT) AS sk
          |FROM q68cat.ns.li_z
          |WHERE l_orderkey < 300 AND l_partkey < 100""".stripMargin)
    }),

    // Partition evolution end-to-end: the table starts identity-partitioned,
    // `ALTER TABLE … ADD PARTITION FIELD bucket(4, …)` moves the default
    // spec METADATA-ONLY (no data file touched), and the second insert
    // clusters by the evolved spec. The final read crosses both
    // generations: identity pruning still applies to all files, bucket
    // pruning only to the new ones (old manifests keep their own spec),
    // and the hash gate proves no row was lost or double-read across the
    // spec boundary.
    "q69_partition_evolution" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q69-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q69")
      s.conf.set("spark.sql.catalog.q69cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q69cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q69cat.ns")
      s.sql(
        """CREATE TABLE q69cat.ns.nation_pe
          |(n_nationkey INT, n_regionkey INT, n_name STRING)
          |PARTITIONED BY (n_regionkey)""".stripMargin)
      s.sql(
        """INSERT INTO q69cat.ns.nation_pe
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q69
          |WHERE n_nationkey < 13""".stripMargin)
      s.sql("ALTER TABLE q69cat.ns.nation_pe " +
        "ADD PARTITION FIELD bucket(4, n_nationkey)")
      s.sql(
        """INSERT INTO q69cat.ns.nation_pe
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q69
          |WHERE n_nationkey >= 13""".stripMargin)
      s.sql(
        """SELECT CAST(g.n_regionkey AS BIGINT) AS n_regionkey, g.n, g.sk, p.n_pt
          |FROM (SELECT n_regionkey, COUNT(*) AS n,
          |             CAST(SUM(n_nationkey) AS BIGINT) AS sk
          |      FROM q69cat.ns.nation_pe WHERE n_regionkey <> 1
          |      GROUP BY n_regionkey) g
          |CROSS JOIN (SELECT COUNT(*) AS n_pt FROM q69cat.ns.nation_pe
          |            WHERE n_nationkey = 20) p
          |ORDER BY n_regionkey""".stripMargin)
    }),

    // Metadata-answered aggregates: COUNT(*)/MIN/MAX complete from
    // manifest stats as a driver-local row — the builder require()s the
    // LocalTableScan plan (zero file IO), and the oracle restates the
    // values from the source parquet, so BOTH the shortcut's plan shape
    // and its exactness are driver-gated.
    "q71_metadata_agg" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q71-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q71")
      s.conf.set("spark.sql.catalog.q71cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q71cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q71cat.ns")
      s.sql(
        """CREATE TABLE q71cat.ns.orders_m AS
          |SELECT o_orderkey, o_custkey, o_orderdate FROM orders_src_q71""".stripMargin)
      val agg = s.sql(
        """SELECT COUNT(*) AS n, CAST(MIN(o_orderkey) AS BIGINT) AS min_k,
          |       CAST(MAX(o_orderkey) AS BIGINT) AS max_k,
          |       MIN(o_orderdate) AS min_d, MAX(o_orderdate) AS max_d
          |FROM q71cat.ns.orders_m""".stripMargin)
      require(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"),
        "q71: the aggregate must be metadata-answered (LocalTableScan), " +
          s"got:\n${agg.queryExecution.executedPlan}")
      agg
    }),

    // Merge-on-read row-level ops end-to-end: UPDATE, MERGE, and a range
    // DELETE all run in write.<op>.mode=merge-on-read (position-delete +
    // append deltas; no data file rewritten), then every surviving row is
    // hash-gated against the oracle restating the three mutations.
    // Delete-debt maintenance end-to-end: merge-on-read equality deletes
    // (IN fast path) + a position delete (range), then CALL
    // convert_equality_deletes + rewrite_position_delete_files fold the
    // whole debt into ONE sorted position file — and the read is
    // byte-identical to before the maintenance.
    "q74_delete_compaction" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q74-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q74")
      s.conf.set("spark.sql.catalog.q74cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q74cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q74cat.ns")
      s.sql(
        """CREATE TABLE q74cat.ns.nation_dc
          |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read') AS
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q74""".stripMargin)
      s.sql("DELETE FROM q74cat.ns.nation_dc WHERE n_nationkey IN (1, 3, 5)")
      s.sql("DELETE FROM q74cat.ns.nation_dc WHERE n_nationkey IN (7, 9)")
      s.sql(
        "DELETE FROM q74cat.ns.nation_dc WHERE n_nationkey >= 20 AND n_nationkey < 23")
      s.sql("CALL q74cat.system.convert_equality_deletes(table => 'ns.nation_dc')")
      s.sql("CALL q74cat.system.rewrite_position_delete_files(table => 'ns.nation_dc')")
      val t = new graft.iceberg.IcebergTable(s"$warehouse/ns/nation_dc", conf)
      val deletes = t.planDeletes()
      require(deletes.count(_.content == 2) == 0,
        "q74: equality deletes must be converted away")
      require(deletes.count(_.content == 1) == 1,
        s"q74: debt must fold into one position file, got $deletes")
      s.sql(
        """SELECT n_regionkey, COUNT(*) AS n,
          |       CAST(SUM(n_nationkey) AS BIGINT) AS sk
          |FROM q74cat.ns.nation_dc
          |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // v3 deletion-vector READ path end-to-end: a DV (roaring bitmap in a
    // Puffin blob, the v3 writers' position-delete form) lands via the
    // migration utility against the row positions of two chosen keys —
    // resolved from the actual file layout, so the query's OUTPUT is
    // deterministic regardless of how the CTAS split files — and the
    // scan must apply it exactly like the equivalent row filter the
    // oracle runs. The aggregate shape matches q57's.
    "q98_deletion_vector" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.col
      val warehouse = graft.Scratch.dir("q98-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q98")
      s.conf.set("spark.sql.catalog.q98cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q98cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q98cat.ns")
      s.sql(
        """CREATE TABLE q98cat.ns.nation_dv AS
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q98""".stripMargin)
      val dir = s"$warehouse/ns/nation_dv"
      val t = new graft.iceberg.IcebergTable(dir, conf)
      // (file, position) of the rows to delete, from the real layout
      val targets = s.read
        .parquet(t.planFiles().map(f => t.resolve(f.filePath)): _*)
        .filter(col("n_nationkey").isin(2, 11))
        .select(col("_metadata.file_path").as("fp"),
          col("_metadata.row_index").as("pos"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val stored = t.planFiles().map(_.filePath)
      targets.groupBy { case (fp, _) =>
        stored.find(p => fp.endsWith(p.substring(p.lastIndexOf('/')))).get
      }.foreach { case (storedPath, g) =>
        graft.iceberg.IcebergWriter.addDeletionVector(
          s, dir, storedPath, g.map(_._2))
      }
      val t2 = new graft.iceberg.IcebergTable(dir, conf)
      require(t2.planDeletes().nonEmpty && t2.planDeletes().forall(_.isDv),
        "q98: the delete debt must be deletion vectors")
      s.sql(
        """SELECT n_regionkey, COUNT(*) AS n,
          |       CAST(SUM(n_nationkey) AS BIGINT) AS sk
          |FROM q98cat.ns.nation_dv
          |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // v3 deletion-vector WRITE path end-to-end, all through SQL: the
    // table opts in (graft.write.deletes = dv), a range DELETE commits
    // roaring DV blobs instead of v2 parquet, an overlapping second
    // DELETE exercises the supersede-with-absorb invariant (one DV per
    // data file, union of positions), and a merge-on-read UPDATE's
    // staged position deletes convert to DVs at commit. The gate
    // REQUIRES the entire delete debt to be deletion vectors before the
    // aggregate runs; the oracle recomputes the surviving rows (with the
    // update's one-character rename folded in) from the raw table.
    "q100_dv_write" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q100-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q100")
      s.conf.set("spark.sql.catalog.q100cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q100cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q100cat.ns")
      s.sql(
        """CREATE TABLE q100cat.ns.nation_dvw
          |TBLPROPERTIES ('graft.write.deletes' = 'dv',
          |               'write.delete.mode' = 'merge-on-read',
          |               'write.update.mode' = 'merge-on-read')
          |AS SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q100""".stripMargin)
      s.sql("DELETE FROM q100cat.ns.nation_dvw " +
        "WHERE n_nationkey >= 4 AND n_nationkey < 7")
      s.sql("DELETE FROM q100cat.ns.nation_dvw " +
        "WHERE n_nationkey >= 6 AND n_nationkey < 9")
      s.sql("UPDATE q100cat.ns.nation_dvw " +
        "SET n_name = concat(n_name, '!') WHERE n_nationkey = 20")
      val t = new graft.iceberg.IcebergTable(s"$warehouse/ns/nation_dvw", conf)
      val dels = t.planDeletes()
      require(dels.nonEmpty && dels.forall(_.isDv),
        s"q100: the whole delete debt must be deletion vectors, got $dels")
      s.sql(
        """SELECT n_regionkey, COUNT(*) AS n,
          |       CAST(SUM(n_nationkey) AS BIGINT) AS sk,
          |       CAST(SUM(LENGTH(n_name)) AS BIGINT) AS ln
          |FROM q100cat.ns.nation_dvw
          |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // Partition overwrite, both modes, all through SQL: STATIC
    // (`INSERT OVERWRITE … PARTITION (k = v)`) replaces exactly the
    // named identity partition's files — no scan, no shuffle of the
    // others (the nightly partition re-materialization write at
    // 100 TB); DYNAMIC (partitionOverwriteMode = dynamic) replaces
    // exactly the partitions the incoming rows land in. The oracle
    // recomputes the post-overwrite table from the raw rows.
    "q106_partition_overwrite" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q106-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q106")
      s.conf.set("spark.sql.catalog.q106cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q106cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q106cat.ns")
      s.sql(
        """CREATE TABLE q106cat.ns.nation_po
          |(n_nationkey INT, n_regionkey INT, n_name STRING)
          |PARTITIONED BY (n_regionkey)""".stripMargin)
      s.sql(
        """INSERT INTO q106cat.ns.nation_po
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q106""".stripMargin)
      s.sql(
        """INSERT OVERWRITE q106cat.ns.nation_po PARTITION (n_regionkey = 2)
          |SELECT n_nationkey + 100, n_name
          |FROM nation_src_q106 WHERE n_regionkey = 2""".stripMargin)
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try s.sql(
        """INSERT OVERWRITE q106cat.ns.nation_po
          |SELECT n_nationkey + 200, n_regionkey, upper(n_name)
          |FROM nation_src_q106 WHERE n_regionkey = 4""".stripMargin)
      finally s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      s.sql(
        """SELECT n_regionkey, COUNT(*) AS n,
          |       CAST(SUM(n_nationkey) AS BIGINT) AS sk, MIN(n_name) AS mn
          |FROM q106cat.ns.nation_po
          |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // Zero-copy snapshot clone ([[graft.iceberg.TableClone]]): CALL
    // snapshot clones the source's current state without copying a byte,
    // then BOTH tables take divergent writes (clone INSERT + a
    // merge-on-read DELETE against a borrowed file; source INSERT) and
    // the gate reads both back. gc.enabled=false on the clone is
    // require()d — the safety property that makes zero-copy sound.
    "q120_snapshot_clone" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q120-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q120")
      s.conf.set("spark.sql.catalog.q120cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q120cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q120cat.ns")
      s.sql(
        """CREATE TABLE q120cat.ns.src AS
          |SELECT o_orderkey, o_custkey, o_totalprice FROM orders_src_q120
          |WHERE o_orderkey < 1000""".stripMargin)
      s.sql(
        """INSERT INTO q120cat.ns.src
          |SELECT o_orderkey, o_custkey, o_totalprice FROM orders_src_q120
          |WHERE o_orderkey BETWEEN 1000 AND 1999""".stripMargin)
      s.sql("CALL q120cat.system.snapshot(source_table => 'ns.src', " +
        "table => 'ns.clone')")
      val cloneMeta = graft.iceberg.TableMetadata
        .load(s"$warehouse/ns/clone", conf)
      require(cloneMeta.properties.get("gc.enabled").contains("false"),
        "clone must carry gc.enabled=false")
      require(cloneMeta.snapshots.size == 1,
        "clone history must truncate to the adopted snapshot")
      // divergent writes: the clone gains + loses rows, the source gains
      s.sql(
        """INSERT INTO q120cat.ns.clone
          |SELECT o_orderkey, o_custkey, o_totalprice FROM orders_src_q120
          |WHERE o_orderkey BETWEEN 2000 AND 2499""".stripMargin)
      s.sql("DELETE FROM q120cat.ns.clone WHERE o_orderkey < 500")
      s.sql(
        """INSERT INTO q120cat.ns.src
          |SELECT o_orderkey, o_custkey, o_totalprice FROM orders_src_q120
          |WHERE o_orderkey BETWEEN 3000 AND 3499""".stripMargin)
      s.sql(
        """SELECT src.n_src, src.sk_src, cl.n_clone, cl.sk_clone FROM
          |  (SELECT COUNT(*) AS n_src,
          |          CAST(SUM(o_orderkey) AS BIGINT) AS sk_src
          |   FROM q120cat.ns.src) src
          |CROSS JOIN
          |  (SELECT COUNT(*) AS n_clone,
          |          CAST(SUM(o_orderkey) AS BIGINT) AS sk_clone
          |   FROM q120cat.ns.clone) cl""".stripMargin)
    }),

    // ORC data files as read-path citizens: add_files imports existing
    // ORC files (footer stats lifted driver-side, so manifest pruning
    // works format-blind), the scan dispatches a per-format vectorized
    // reader, a mixed parquet+ORC snapshot unions, and an equality
    // MoR DELETE applies to the ORC rows WITHOUT row positions (data-
    // column anti-join, file-level sequence gate). The gate requires
    // the plan to actually hold both formats before aggregating; the
    // oracle recomputes the surviving rows from the raw parquet table.
    "q132_orc_import" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.col
      val warehouse = graft.Scratch.dir("q132-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "supplier").createOrReplaceTempView("supplier_src_q132")
      s.conf.set("spark.sql.catalog.q132cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q132cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q132cat.ns")
      // half the suppliers arrive as native parquet INSERTs…
      s.sql(
        """CREATE TABLE q132cat.ns.supp
          |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read') AS
          |SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier_src_q132
          |WHERE s_suppkey % 2 = 0""".stripMargin)
      // …the other half as a foreign ORC import (two files, disjoint
      // s_suppkey ranges, so footer bounds can prune)
      val orcDir = s"$warehouse/orc-src"
      val half = s.table("supplier_src_q132")
        .filter(col("s_suppkey") % 2 === 1)
        .select("s_suppkey", "s_nationkey", "s_acctbal")
      val mid = half.agg(org.apache.spark.sql.functions
        .expr("percentile_approx(s_suppkey, 0.5)")).collect()(0).getLong(0)
      half.filter(col("s_suppkey") < mid).coalesce(1)
        .write.mode("overwrite").orc(s"$orcDir/lo")
      half.filter(col("s_suppkey") >= mid).coalesce(1)
        .write.mode("overwrite").orc(s"$orcDir/hi")
      val fs = new Path(orcDir).getFileSystem(conf)
      val orcFiles = Seq("lo", "hi").map { part =>
        fs.listStatus(new Path(s"$orcDir/$part")).map(_.getPath)
          .find(_.getName.endsWith(".orc")).get.toString
      }
      val dir = s"$warehouse/ns/supp"
      graft.iceberg.IcebergWriter.addFiles(s, dir, orcFiles)
      // equality MoR DELETE hits rows in BOTH formats
      s.sql("DELETE FROM q132cat.ns.supp WHERE s_suppkey IN (3, 4, 5, 6)")
      val t = new graft.iceberg.IcebergTable(dir, conf)
      require(t.planFiles().map(_.fileFormat).toSet == Set("PARQUET", "ORC"),
        "q132: the snapshot must hold both parquet and ORC files")
      require(t.hasDeletes, "q132: the DELETE must be merge-on-read")
      s.sql(
        """SELECT s_nationkey, COUNT(*) AS n,
          |       CAST(SUM(s_suppkey) AS BIGINT) AS sk
          |FROM q132cat.ns.supp
          |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
    }),

    // Avro data files as read-path citizens — and unlike ORC, with the
    // FULL merge-on-read surface: Avro decode order is the spec's row
    // position, so a RANGE DELETE (not equality-expressible) commits
    // position deletes against the imported file and the scan applies
    // them. The gate requires the data file to stay Avro (no rewrite)
    // and the delete debt to be real; the oracle recomputes survivors.
    "q144_avro_import" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q144-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "supplier").createOrReplaceTempView("supplier_src_q144")
      s.conf.set("spark.sql.catalog.q144cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q144cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q144cat.ns")
      s.sql(
        """CREATE TABLE q144cat.ns.supp (
          |  s_suppkey BIGINT, s_nationkey INT, s_acctbal DOUBLE)
          |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
      // the import: supplier rows re-encoded as ONE foreign Avro file
      // (avro-core writer — no Spark Avro source exists in this runtime)
      val rows = s.sql(
        """SELECT s_suppkey, s_nationkey, s_acctbal
          |FROM supplier_src_q144 ORDER BY s_suppkey""".stripMargin).collect()
      val schema = new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"r","fields":[
          |{"name":"s_suppkey","type":"long"},
          |{"name":"s_nationkey","type":"int"},
          |{"name":"s_acctbal","type":"double"}]}""".stripMargin)
      val avroDir = new java.io.File(graft.Scratch.dir("q144-src"))
      avroDir.mkdirs()
      val f = new java.io.File(avroDir, "supplier.avro")
      val w = new org.apache.avro.file.DataFileWriter[
          org.apache.avro.generic.GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema))
      w.create(schema, f)
      rows.foreach { r =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        rec.put("s_suppkey", r.getLong(0))
        rec.put("s_nationkey", r.getInt(1))
        rec.put("s_acctbal", r.getDouble(2))
        w.append(rec)
      }
      w.close()
      val dir = s"$warehouse/ns/supp"
      graft.iceberg.IcebergWriter.addFiles(s, dir, Seq(f.getAbsolutePath))
      // RANGE delete → position deletes against the Avro file
      s.sql("DELETE FROM q144cat.ns.supp WHERE s_suppkey >= 3 AND s_suppkey < 7")
      val t = new graft.iceberg.IcebergTable(dir, conf)
      require(t.planFiles().forall(_.fileFormat == "AVRO"),
        "q144: the import must stay an Avro file (merge-on-read, no rewrite)")
      require(t.hasDeletes, "q144: the range DELETE must land delete files")
      s.sql(
        """SELECT s_nationkey, COUNT(*) AS n,
          |       CAST(SUM(s_suppkey) AS BIGINT) AS sk
          |FROM q144cat.ns.supp
          |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
    }),

    // The ORC WRITE kernel (closing the format matrix's last cell —
    // the reference's entire engine is parquet-only, table.rs:291-293):
    // CTAS under write.format-default=orc writes native ORC through the
    // same fanout kernel, with footer stats lifted into manifests so
    // pruning stays format-blind; a copy-on-write DELETE then REWRITES
    // orc files as orc. Gates pin the file format, the .orc extension,
    // and the declared codec before the read-back aggregation.
    "q146_orc_write" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q146-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "supplier").createOrReplaceTempView("supplier_src_q146")
      s.conf.set("spark.sql.catalog.q146cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q146cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q146cat.ns")
      s.sql(
        """CREATE TABLE q146cat.ns.supp
          |TBLPROPERTIES ('write.format-default' = 'orc',
          |               'write.orc.compression-codec' = 'snappy') AS
          |SELECT s_suppkey, s_nationkey, s_acctbal
          |FROM supplier_src_q146""".stripMargin)
      val dir = s"$warehouse/ns/supp"
      // copy-on-write DELETE: the rewrite must also produce ORC
      s.sql("DELETE FROM q146cat.ns.supp WHERE s_suppkey % 5 = 0")
      val t = new graft.iceberg.IcebergTable(dir, conf)
      val files = t.planFiles()
      require(files.nonEmpty && files.forall(_.fileFormat == "ORC"),
        s"q146: every data file must be ORC, got ${files.map(_.fileFormat)}")
      require(files.forall(_.filePath.endsWith(".orc")),
        "q146: data files must carry the .orc extension")
      val r = org.apache.orc.OrcFile.createReader(
        new Path(t.resolve(files.head.filePath)),
        org.apache.orc.OrcFile.readerOptions(conf))
      try require(r.getCompressionKind == org.apache.orc.CompressionKind.SNAPPY,
        s"q146: declared codec must land in the footer, got ${r.getCompressionKind}")
      finally r.close()
      s.sql(
        """SELECT s_nationkey, COUNT(*) AS n,
          |       CAST(SUM(s_suppkey) AS BIGINT) AS sk,
          |       SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS bal_cents
          |FROM q146cat.ns.supp
          |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
    }),

    // The AVRO write kernel (final format-matrix cell): CTAS under
    // write.format-default=avro writes native Avro through the fanout
    // kernel, and — because avro decode order IS the spec's row
    // position — a merge-on-read RANGE delete applies position deletes
    // to the files this engine itself wrote. Gates pin format,
    // extension, and no-rewrite before the read-back aggregation.
    "q153_avro_write" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q153-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "supplier").createOrReplaceTempView("supplier_src_q153")
      s.conf.set("spark.sql.catalog.q153cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q153cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q153cat.ns")
      s.sql(
        """CREATE TABLE q153cat.ns.supp
          |TBLPROPERTIES ('write.format-default' = 'avro',
          |               'write.delete.mode' = 'merge-on-read') AS
          |SELECT s_suppkey, s_nationkey, s_acctbal
          |FROM supplier_src_q153""".stripMargin)
      val dir = s"$warehouse/ns/supp"
      // range DELETE → position deletes against avro-WRITTEN files
      s.sql("DELETE FROM q153cat.ns.supp WHERE s_suppkey >= 3 AND s_suppkey < 7")
      val t = new graft.iceberg.IcebergTable(dir, conf)
      val files = t.planFiles()
      require(files.nonEmpty && files.forall(_.fileFormat == "AVRO"),
        s"q153: every data file must be AVRO, got ${files.map(_.fileFormat)}")
      require(files.forall(_.filePath.endsWith(".avro")),
        "q153: data files must carry the .avro extension")
      require(t.hasDeletes,
        "q153: the range DELETE must be merge-on-read (no rewrite)")
      s.sql(
        """SELECT s_nationkey, COUNT(*) AS n,
          |       CAST(SUM(s_suppkey) AS BIGINT) AS sk,
          |       SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS bal_cents
          |FROM q153cat.ns.supp
          |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
    }),

    // Nested types in the catalog's table-schema layer (round 13): CTAS
    // an `array<float>` embeddings table THROUGH THE CATALOG (the
    // round-12 gap — IcebergJson.tableMetadata refused every non-scalar
    // type, so vectors could not live in the lakehouse at all), then
    // copy-on-write DELETE so the fanout rewrite kernel re-writes array
    // rows too, and read back with element-wise aggregates DuckDB
    // reproduces over the source parquet. Gates pin the round-tripped
    // Spark type and the nested element ids in the committed metadata
    // (unique, beyond the top-level block, last-column-id covers them).
    "q154_nested_ctas" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q154-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "embeddings").createOrReplaceTempView("emb_src_q154")
      s.conf.set("spark.sql.catalog.q154cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q154cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q154cat.ns")
      s.sql(
        """CREATE TABLE q154cat.ns.emb AS
          |SELECT vec_id, embedding, label FROM emb_src_q154""".stripMargin)
      val dir = s"$warehouse/ns/emb"
      // copy-on-write DELETE: the rewrite must carry the array column
      s.sql("DELETE FROM q154cat.ns.emb WHERE vec_id % 5 = 0")
      val t = new graft.iceberg.IcebergTable(dir, conf)
      val embType = t.metadata.schema("embedding").dataType
      require(embType == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = true) ||
        embType == org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false),
        s"q154: embedding must round-trip as array<float>, got $embType")
      require(t.metadata.fieldIds.size == 3,
        s"q154: three top-level columns, got ${t.metadata.fieldIds}")
      s.sql(
        """SELECT label, COUNT(*) AS n,
          |       CAST(SUM(size(embedding)) AS BIGINT) AS dims,
          |       CAST(SUM(CAST(ROUND(CAST(element_at(embedding, 1) AS DOUBLE)
          |           * 1000) AS BIGINT)) AS BIGINT) AS e1_milli
          |FROM q154cat.ns.emb
          |GROUP BY label ORDER BY label""".stripMargin)
    }),

    // Capstone bridge (round 13): ANN search over vectors STORED IN THE
    // LAKEHOUSE. The embeddings live as a catalog-managed Iceberg table
    // (array<float> through the nested-type schema layer), take a
    // copy-on-write DELETE (the fanout rewrite must carry the array
    // column through), and then serve Similarity.bruteForceTopK
    // directly: the 4 probe vectors broadcast, the corpus scanned once
    // with no big-side shuffle. The oracle reproduces the exact ranked
    // neighbours — scores included — over the surviving rows of the
    // source parquet, so Iceberg storage must be value-preserving for
    // float arrays AND the scan must serve exactly the rows the DELETE
    // left.
    "q155_ann_iceberg" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.col
      val warehouse = graft.Scratch.dir("q155-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "embeddings").createOrReplaceTempView("emb_src_q155")
      s.conf.set("spark.sql.catalog.q155cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q155cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q155cat.ns")
      s.sql(
        """CREATE TABLE q155cat.ns.emb AS
          |SELECT vec_id, embedding, label FROM emb_src_q155""".stripMargin)
      s.sql("DELETE FROM q155cat.ns.emb WHERE vec_id % 7 = 3")
      val emb = s.table("q155cat.ns.emb")
      graft.functions.Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 5), emb, k = 3)
        .orderBy(col("q_id").asc_nulls_first, col("rank").asc_nulls_first)
    }),

    // Multimodal columns as Iceberg table CITIZENS: binary media payloads
    // + typed metadata CTAS'd into a catalog table (binary bounds land in
    // the manifests — the pruning surface the reference carries for
    // BinaryType), a merge-on-read equality DELETE over the payload rows
    // (delete files, no rewrite of megabyte payloads), and feature
    // extraction running OFF THE ICEBERG SCAN (delete-applied) through
    // the deterministic stub kernel — whose rolling-hash features the
    // oracle reproduces bit-exactly in plain SQL (HUGEINT mod-2^64
    // arithmetic). The real-codec twin stays q145 (rows-only: DuckDB
    // cannot run ImageIO).
    "q159_multimodal_iceberg" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.col
      implicit val spark: SparkSession = s
      val warehouse = graft.Scratch.dir("q159-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "documents").createOrReplaceTempView("docs_src_q159")
      s.conf.set("spark.sql.catalog.q159cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q159cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q159cat.ns")
      s.sql(
        """CREATE TABLE q159cat.ns.media AS
          |SELECT CAST(doc_id AS BIGINT) AS media_id,
          |       CASE WHEN doc_id % 3 = 0 THEN 'image'
          |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
          |       encode(text, 'UTF-8') AS payload,
          |       CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
          |       CAST(16000 AS INT) AS sample_rate,
          |       CAST(doc_id % 32 + 1 AS INT) AS n_frames
          |FROM docs_src_q159""".stripMargin)
      s.sql("DELETE FROM q159cat.ns.media WHERE kind = 'video'")
      val feats = graft.operators.Multimodal
        .extractFeatures(s.table("q159cat.ns.media")).toDF()
      feats.select(Seq(col("media_id"), col("kind"), col("payload_len")) ++
          (0 until graft.operators.Multimodal.FakeDecoder.featureDim).map(i =>
            col("features")(i).cast("double").as(s"f$i")): _*)
        .orderBy(col("media_id").asc_nulls_first)
    }),

    // True CDC update pairing over v3 row lineage (round 14): a
    // copy-on-write UPDATE's changed rows emit as update_before /
    // update_after PAIRS (keyed by the spec's own `_row_id`, not
    // user-declared identifier columns), the rewrite's carried-through
    // untouched rows are DROPPED as carryovers, and a CoW DELETE's
    // removed rows stay plain deletes while its survivors cancel out —
    // the oracle recomputes the whole change stream from relational
    // semantics alone.
    "q160_cdc_updates" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.col
      val warehouse = graft.Scratch.dir("q160-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q160")
      s.conf.set("spark.sql.catalog.q160cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q160cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q160cat.ns")
      s.sql(
        """CREATE TABLE q160cat.ns.cdc (k BIGINT, v STRING)
          |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
      s.sql(
        """INSERT INTO q160cat.ns.cdc
          |SELECT CAST(o_orderkey AS BIGINT), o_orderpriority
          |FROM orders_src_q160 WHERE o_orderkey % 5 = 0""".stripMargin)
      val dir = s"$warehouse/ns/cdc"
      val s0 = new graft.iceberg.IcebergTable(dir, conf)
        .metadata.snapshotLineage.last
      s.sql("UPDATE q160cat.ns.cdc SET v = concat(v, '+') WHERE k % 20 = 0")
      s.sql("DELETE FROM q160cat.ns.cdc WHERE k % 35 = 0")
      s.sql(
        """INSERT INTO q160cat.ns.cdc
          |SELECT -CAST(o_orderkey AS BIGINT), o_orderpriority
          |FROM orders_src_q160 WHERE o_orderkey % 50 = 3""".stripMargin)
      val t = new graft.iceberg.IcebergTable(dir, conf)
      t.changesWithUpdates(s, s0, t.metadata.snapshotLineage.last)
        .select(col("k"), col("v"), col("_change_type"),
          col("_change_ordinal"))
        .orderBy(col("k").asc_nulls_first, col("_change_ordinal").asc_nulls_first,
          col("_change_type").asc_nulls_first)
    }),

    // CDC update pairing on the v2 INSTALLED BASE: no row lineage —
    // pairing is keyed by the schema's declared `identifier-field-ids`
    // (ALTER TABLE ... SET IDENTIFIER FIELDS, the reference's SchemaV2
    // element at table.rs:371). The window spans a copy-on-write UPDATE
    // (rewritten-but-unchanged rows must drop as carryovers), a
    // merge-on-read MERGE (matched update halves pair across the
    // delete+reinsert; the unmatched row stays a plain insert), and a
    // DELETE — the oracle recomputes the whole paired stream from
    // relational semantics alone.
    "q161_cdc_v2_identifier" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.col
      val warehouse = graft.Scratch.dir("q161-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q161")
      s.conf.set("spark.sql.catalog.q161cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q161cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q161cat.ns")
      s.sql("CREATE TABLE q161cat.ns.cdc (k BIGINT NOT NULL, v STRING)")
      s.sql("ALTER TABLE q161cat.ns.cdc SET IDENTIFIER FIELDS k")
      s.sql(
        """INSERT INTO q161cat.ns.cdc
          |SELECT CAST(o_orderkey AS BIGINT), o_orderpriority
          |FROM orders_src_q161 WHERE o_orderkey % 5 = 0""".stripMargin)
      val dir = s"$warehouse/ns/cdc"
      val s0 = new graft.iceberg.IcebergTable(dir, conf)
        .metadata.snapshotLineage.last
      s.sql("UPDATE q161cat.ns.cdc SET v = concat(v, '+') WHERE k % 20 = 0")
      // MoR from here on: the MERGE writes delete+reinsert deltas, and
      // the later DELETE must also stay merge-on-read (a CoW rewrite
      // would refuse against the MERGE's outstanding delete files)
      s.sql("ALTER TABLE q161cat.ns.cdc SET TBLPROPERTIES (" +
        "'write.merge.mode' = 'merge-on-read', " +
        "'write.delete.mode' = 'merge-on-read')")
      s.sql(
        """MERGE INTO q161cat.ns.cdc t
          |USING (SELECT CAST(o_orderkey AS BIGINT) AS k, 'M' AS v
          |       FROM orders_src_q161
          |       WHERE o_orderkey % 5 = 0 AND o_orderkey % 30 = 5
          |       UNION ALL
          |       SELECT -CAST(o_orderkey AS BIGINT), 'N'
          |       FROM orders_src_q161 WHERE o_orderkey % 50 = 7) s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql("DELETE FROM q161cat.ns.cdc WHERE k % 35 = 0")
      val t = new graft.iceberg.IcebergTable(dir, conf)
      t.changesWithUpdates(s, s0, t.metadata.snapshotLineage.last)
        .select(col("k"), col("v"), col("_change_type"),
          col("_change_ordinal"))
        .orderBy(col("k").asc_nulls_first, col("_change_ordinal").asc_nulls_first,
          col("_change_type").asc_nulls_first)
    }),

    // CDC REPLICATION end-to-end: source table (identifier fields
    // declared) takes inserts, a CoW UPDATE, a MoR MERGE, and a DELETE;
    // the replica is synced ONLY through the streaming changelog source
    // (readStream over src.changes, paced one commit per micro-batch)
    // applied by the identifier-keyed replica sink. The emitted rows are
    // the REPLICA's, never the source's — the oracle recomputes the
    // source's final state relationally, so any divergence anywhere in
    // the pipeline (window planning, pairing, net-effect MERGE) is a
    // hash mismatch. At 100 TB: per-batch work ∝ the commit's change
    // volume; neither table is ever rescanned.
    // Spec partition-statistics end-to-end: appends maintain the
    // per-snapshot stats file INCREMENTALLY (prev file + commit delta —
    // O(1) per commit at any table size), a row-level commit breaks the
    // chain, compute_partition_stats bootstraps it again, and the
    // `partitions` metadata table serves FROM THE FILE — one small
    // parquet read instead of the O(files) manifest recompute. The
    // oracle recomputes per-partition record counts relationally.
    "q165_partition_stats" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q165-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "supplier").createOrReplaceTempView("supplier_src_q165")
      s.conf.set("spark.sql.catalog.q165cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q165cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q165cat.ns")
      s.sql(
        """CREATE TABLE q165cat.ns.sup (
          |  s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE)
          |PARTITIONED BY (s_nationkey)
          |TBLPROPERTIES ('graft.partition-statistics' = 'true',
          |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      s.sql(
        """INSERT INTO q165cat.ns.sup
          |SELECT CAST(s_suppkey AS BIGINT), CAST(s_nationkey AS BIGINT),
          |       s_acctbal
          |FROM supplier_src_q165 WHERE s_suppkey % 2 = 0""".stripMargin)
      s.sql(
        """INSERT INTO q165cat.ns.sup
          |SELECT CAST(s_suppkey AS BIGINT), CAST(s_nationkey AS BIGINT),
          |       s_acctbal
          |FROM supplier_src_q165 WHERE s_suppkey % 2 = 1""".stripMargin)
      def meta = graft.iceberg.TableMetadata.load(s"$warehouse/ns/sup", conf)
      require(meta.partitionStatistics.exists(e =>
        meta.currentSnapshotId.contains(e.snapshotId)),
        "q165: appends must maintain the stats file incrementally")
      // a merge-on-read DELETE breaks the chain; the bootstrap restores it
      s.sql("DELETE FROM q165cat.ns.sup WHERE s_suppkey % 3 = 0")
      require(!meta.partitionStatistics.exists(e =>
        meta.currentSnapshotId.contains(e.snapshotId)),
        "q165: a row-level commit must not extend the chain")
      s.sql("CALL q165cat.system.compute_partition_stats(table => 'ns.sup')")
      // further appends extend incrementally from the bootstrapped file
      s.sql(
        """INSERT INTO q165cat.ns.sup
          |SELECT -CAST(s_suppkey AS BIGINT), CAST(s_nationkey AS BIGINT),
          |       s_acctbal
          |FROM supplier_src_q165 WHERE s_suppkey % 5 = 1""".stripMargin)
      require(meta.partitionStatistics.exists(e =>
        meta.currentSnapshotId.contains(e.snapshotId)),
        "q165: append after bootstrap must extend the chain")
      // served FROM the stats file (the entry above is the fast path)
      s.sql(
        """SELECT `partition` AS part, CAST(record_count AS BIGINT)
          |         AS record_count
          |FROM q165cat.ns.sup.`partitions`
          |WHERE record_count > 0 -- the null-partition row carries only
          |                       -- cross-partition delete debt
          |ORDER BY part ASC NULLS FIRST""".stripMargin)
    }),

    // The compute-updates CHANGELOG STREAM end-to-end: per-micro-batch
    // update pairing (v3 _row_id identity) over insert, CoW UPDATE, MoR
    // MERGE, and DELETE commits, drained one commit per batch — the
    // oracle reconstructs the exact typed change stream relationally.
    "q166_cdc_stream_updates" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q166-warehouse")
      val ckpt = graft.Scratch.dir("q166-ckpt")
      val out = graft.Scratch.dir("q166-out")
      val conf = s.sessionState.newHadoopConf()
      Seq(warehouse, ckpt, out).foreach(p =>
        new Path(p).getFileSystem(conf).delete(new Path(p), true))
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q166")
      s.conf.set("spark.sql.catalog.q166cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q166cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q166cat.ns")
      s.sql(
        """CREATE TABLE q166cat.ns.src (k BIGINT NOT NULL, v STRING)
          |TBLPROPERTIES ('format-version' = '3',
          |  'write.merge.mode' = 'merge-on-read',
          |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      s.sql(
        """INSERT INTO q166cat.ns.src
          |SELECT CAST(o_orderkey AS BIGINT), o_orderpriority
          |FROM orders_src_q166 WHERE o_orderkey % 12 = 0""".stripMargin)
      s.sql("UPDATE q166cat.ns.src SET v = concat(v, '!') WHERE k % 24 = 0")
      s.sql(
        """MERGE INTO q166cat.ns.src t
          |USING (SELECT CAST(o_orderkey AS BIGINT) AS k, 'M' AS v
          |       FROM orders_src_q166 WHERE o_orderkey % 36 = 0
          |       UNION ALL
          |       SELECT -CAST(o_orderkey AS BIGINT), 'R'
          |       FROM orders_src_q166 WHERE o_orderkey % 60 = 13) s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql("DELETE FROM q166cat.ns.src WHERE k % 30 = 6")
      // two commits per window: pairing is per-commit, so the split
      // exercises the window-boundary contract at half the batch count
      val q = s.readStream
        .option("compute-updates", "true")
        .option("maxSnapshotsPerTrigger", "2")
        .table("q166cat.ns.src.changes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      // snapshot ids are sequential here (1 = insert … 4 = delete), so
      // the commit id re-bases to a deterministic per-commit ordinal;
      // _row_id stays out (engine-assigned identity, not oracle-stable)
      s.read.parquet(out).createOrReplaceTempView("q166_drained")
      s.sql(
        """SELECT k, v, _change_type,
          |       CAST(_commit_snapshot_id - 1 AS INT) AS _change_ordinal
          |FROM q166_drained
          |ORDER BY k ASC NULLS FIRST, _change_ordinal ASC NULLS FIRST,
          |         _change_type ASC NULLS FIRST""".stripMargin)
    }),

    // Iceberg v3 VARIANT type end-to-end: Spark's native VariantType maps
    // to the spec's `variant` and lands in data files as the Parquet
    // VARIANT annotated group (metadata/value[/typed_value]) every v3
    // reader shares. The gate writes heterogeneous payloads (objects AND
    // bare scalars — the shape a JSON ingest feed actually has), takes
    // merge-on-read position deletes over the variant files, and serves
    // typed path extractions; the oracle reconstructs every extraction
    // relationally from the source columns the JSON was built from.
    "q167_variant_type" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q167-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "documents").createOrReplaceTempView("docs_src_q167")
      s.conf.set("spark.sql.catalog.q167cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q167cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q167cat.ns")
      s.sql(
        """CREATE TABLE q167cat.ns.t (k BIGINT, v VARIANT)
          |TBLPROPERTIES ('format-version' = '3',
          |               'write.delete.mode' = 'merge-on-read')""".stripMargin)
      s.sql(
        """INSERT INTO q167cat.ns.t
          |SELECT CAST(doc_id AS BIGINT),
          |       CASE WHEN doc_id % 5 = 0
          |            THEN parse_json(CAST(n_chars AS STRING))
          |            ELSE parse_json(to_json(named_struct(
          |              'lang', lang, 'chars', n_chars,
          |              'tags', array(lang, source))))
          |       END
          |FROM docs_src_q167 WHERE doc_id % 3 <> 2""".stripMargin)
      // merge-on-read: position deletes apply over untouched variant files
      s.sql("DELETE FROM q167cat.ns.t WHERE k % 7 = 3")
      s.sql(
        """SELECT k,
          |       variant_get(v, '$.lang', 'string')    AS lang,
          |       variant_get(v, '$.chars', 'bigint')   AS chars,
          |       variant_get(v, '$.tags[1]', 'string') AS tag1,
          |       try_variant_get(v, '$', 'bigint')     AS scalar
          |FROM q167cat.ns.t
          |ORDER BY k ASC NULLS FIRST""".stripMargin)
    }),

    // v3 geometry: the data-file representation is WKB bytes, served as
    // a BinaryType passthrough (pruning doubt-keeps geo bounds; writes
    // refuse). The fixture takes the external-geo-table shape: WKB
    // written while the column was declared binary, then the metadata
    // document re-declares geometry — exactly what adopting a
    // spatial-writer's table looks like. The oracle rebuilds each WKB
    // point's hex from the same nation-keyed byte construction.
    "q171_geometry_wkb" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.{col, hex, lower}
      val warehouse = graft.Scratch.dir("q171-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      s.conf.set("spark.sql.catalog.q171cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q171cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q171cat.ns")
      s.sql("""CREATE TABLE q171cat.ns.geo (k BIGINT, geom BINARY)
               TBLPROPERTIES ('format-version' = '3')""")
      // WKB point, little-endian: 01 | 01000000 | x:f64 | y:f64 — the
      // coordinate doubles' byte patterns are single repeated bytes so
      // DuckDB can reconstruct the hex relationally
      val rows = Tables.load(s, d, "nation")
        .select("n_nationkey", "n_regionkey").collect().map { r =>
          val nk = r.get(0).asInstanceOf[Number].longValue
          val rk = r.get(1).asInstanceOf[Number].longValue
          (nk, Array[Byte](1, 1, 0, 0, 0) ++
            Array.fill(8)((nk % 256).toByte) ++
            Array.fill(8)((rk % 256).toByte))
        }.toSeq
      import s.implicits._
      rows.toDF("k", "geom").createOrReplaceTempView("geo_src_q171")
      s.sql("INSERT INTO q171cat.ns.geo SELECT k, geom FROM geo_src_q171")
      // re-declare binary -> geometry in a new metadata version
      val dir = s"$warehouse/ns/geo"
      val fs = new Path(dir).getFileSystem(conf)
      val latest = graft.iceberg.TableMetadata.latestMetadataPath(dir, conf)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = {
        val in = fs.open(latest)
        try mapper.readTree(in.readAllBytes())
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        finally in.close()
      }
      import scala.jdk.CollectionConverters._
      root.get("schemas").elements.asScala
        .flatMap(_.get("fields").elements.asScala)
        .filter(_.get("name").asText == "geom")
        .foreach(_.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("type", "geometry(srid:4326)"))
      val ver = latest.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toLong
      val out = fs.create(new Path(s"$dir/metadata/v${ver + 1}.metadata.json"))
      try out.write(mapper.writeValueAsBytes(root)) finally out.close()
      // read back through the engine's geo surface (WKB passthrough);
      // the geom predicate exercises the doubt-keep pruning path
      val t = new graft.iceberg.IcebergTable(dir, conf)
      require(t.metadata.geoFieldIds.nonEmpty, "fixture must be spatial")
      t.toDF(s)
        .filter(col("geom").isNotNull)
        .select(col("k"), lower(hex(col("geom"))).as("wkb_hex"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // v3 geometry WRITE path (r18): unlike q171's adopt-then-read shape,
    // here the table is declared spatial FIRST and the WKB rows are
    // written BY THE ENGINE — the fanout writer parses each value's WKB
    // coordinates and records the spec's bounding-box POINT bounds in
    // the manifests (gated by a require below), then the read-back
    // serves the bytes bit-exactly. Same DuckDB-reconstructable
    // repeated-byte double patterns as q171.
    "q172_geometry_write" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.{col, hex, lower}
      val warehouse = graft.Scratch.dir("q172-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      s.conf.set("spark.sql.catalog.q172cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q172cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q172cat.ns")
      s.sql("""CREATE TABLE q172cat.ns.geo (k BIGINT, geom BINARY)
               TBLPROPERTIES ('format-version' = '3')""")
      // declare the column spatial BEFORE any data lands
      val dir = s"$warehouse/ns/geo"
      val fs = new Path(dir).getFileSystem(conf)
      val latest = graft.iceberg.TableMetadata.latestMetadataPath(dir, conf)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = {
        val in = fs.open(latest)
        try mapper.readTree(in.readAllBytes())
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        finally in.close()
      }
      import scala.jdk.CollectionConverters._
      root.get("schemas").elements.asScala
        .flatMap(_.get("fields").elements.asScala)
        .filter(_.get("name").asText == "geom")
        .foreach(_.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("type", "geometry(srid:4326)"))
      val ver = latest.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toLong
      val out = fs.create(new Path(s"$dir/metadata/v${ver + 1}.metadata.json"))
      try out.write(mapper.writeValueAsBytes(root)) finally out.close()
      // ENGINE write onto the spatial table: WKB points whose coordinate
      // doubles are repeated single bytes (valid tiny denormals)
      val rows = Tables.load(s, d, "nation")
        .select("n_nationkey", "n_regionkey").collect().map { r =>
          val nk = r.get(0).asInstanceOf[Number].longValue
          val rk = r.get(1).asInstanceOf[Number].longValue
          (nk, Array[Byte](1, 1, 0, 0, 0) ++
            Array.fill(8)((nk % 256).toByte) ++
            Array.fill(8)((rk % 256).toByte))
        }.toSeq
      import s.implicits._
      graft.iceberg.IcebergWriter.append(s, dir, rows.toDF("k", "geom"))
      // the write MUST have recorded spec POINT bounds per data file
      val t = new graft.iceberg.IcebergTable(dir, conf)
      val geoId = t.metadata.fieldIds("geom")
      t.planFiles().foreach { f =>
        require(f.lowerBounds.contains(geoId) &&
          f.upperBounds.contains(geoId),
          s"engine-written geo file ${f.filePath} lacks POINT bounds")
        // each bound parses as a plain 2D point
        Seq(f.lowerBounds(geoId), f.upperBounds(geoId)).foreach { b =>
          val bx = new graft.iceberg.GeoWkb.BBox
          bx.merge(b)
          require(!bx.isEmpty && bx.minX == bx.maxX && bx.minY == bx.maxY,
            "geo bound must be a single POINT")
        }
      }
      t.toDF(s)
        .filter(col("geom").isNotNull)
        .select(col("k"), lower(hex(col("geom"))).as("wkb_hex"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // Atomic CREATE + REPLACE TABLE AS SELECT (r19, StagingTableCatalog):
    // CTAS stages the write and publishes ONE metadata swap; RTAS swaps
    // schema AND data in one commit on the live table — and the
    // pre-replace snapshot stays readable via time travel UNDER ITS OWN
    // SCHEMA (each snapshot records its schema-id; the replacement takes
    // fresh field ids). The gate reads both faces: the replaced table
    // and the time-traveled original.
    "q174_rtas" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.col
      val warehouse = graft.Scratch.dir("q174-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      s.conf.set("spark.sql.catalog.q174cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q174cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q174cat.ns")
      Tables.load(s, d, "customer").createOrReplaceTempView("cust_q174")
      s.sql(
        """CREATE TABLE q174cat.ns.t AS
          |SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS sval
          |FROM cust_q174 WHERE c_custkey % 10 = 3""".stripMargin)
      val dir = s"$warehouse/ns/t"
      val preSnap = new graft.iceberg.IcebergTable(dir, conf)
        .metadata.snapshots.map(_.snapshotId).max
      Tables.load(s, d, "nation").createOrReplaceTempView("nat_q174")
      s.sql(
        """REPLACE TABLE q174cat.ns.t AS
          |SELECT CAST(n_nationkey AS BIGINT) AS nk, n_name
          |FROM nat_q174""".stripMargin)
      s.sql(
        s"""SELECT 'new' AS part, nk AS k, n_name AS sval FROM q174cat.ns.t
           |UNION ALL
           |SELECT 'old', k, sval FROM q174cat.ns.t VERSION AS OF $preSnap
           |""".stripMargin)
        .orderBy(col("part").asc_nulls_first, col("k").asc_nulls_first)
    }),

    // TRUNCATE TABLE statement (r19): one truncate snapshot empties the
    // table, prior rows stay time-travelable, and the table keeps
    // accepting writes — gated against a DuckDB reconstruction of both
    // faces.
    "q175_truncate" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.col
      val warehouse = graft.Scratch.dir("q175-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      s.conf.set("spark.sql.catalog.q175cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q175cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q175cat.ns")
      Tables.load(s, d, "orders").createOrReplaceTempView("ord_q175")
      s.sql(
        """CREATE TABLE q175cat.ns.t AS
          |SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderpriority AS pri
          |FROM ord_q175 WHERE o_orderkey % 7 = 1""".stripMargin)
      val dir = s"$warehouse/ns/t"
      val preSnap = new graft.iceberg.IcebergTable(dir, conf)
        .metadata.snapshots.map(_.snapshotId).max
      s.sql("TRUNCATE TABLE q175cat.ns.t")
      s.sql(
        """INSERT INTO q175cat.ns.t
          |SELECT CAST(o_orderkey AS BIGINT), o_orderpriority
          |FROM ord_q175 WHERE o_orderkey % 13 = 2""".stripMargin)
      s.sql(
        s"""SELECT 'pre' AS part, COUNT(*) AS n
           |FROM q175cat.ns.t VERSION AS OF $preSnap
           |UNION ALL
           |SELECT 'post', COUNT(*) FROM q175cat.ns.t""".stripMargin)
        .orderBy(col("part").asc_nulls_first)
    }),

    // v3 timestamp_ns WRITE path (r18): a BIGINT table's column is
    // re-declared timestamp_ns with the BIGINT-nanos opt-in property,
    // then the ENGINE appends epoch-nanos rows — written as the exact
    // int64 stamped with parquet's TIMESTAMP(NANOS) annotation (the
    // conformant v3 encoding) — and the read-back serves every stored
    // nano losslessly. Pre-flip and post-flip rows interleave to prove
    // plain-int64 and NANOS-annotated files read identically.
    "q173_ns_write" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.functions.col
      val warehouse = graft.Scratch.dir("q173-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      s.conf.set("spark.sql.catalog.q173cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q173cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q173cat.ns")
      s.sql("""CREATE TABLE q173cat.ns.evt (k BIGINT, ts_nanos BIGINT)
               TBLPROPERTIES ('format-version' = '3')""")
      Tables.load(s, d, "nation").selectExpr("CAST(n_nationkey AS BIGINT) AS k",
          "CAST(1700000000000000000 + n_nationkey * 7 AS BIGINT) AS ts_nanos")
        .filter(col("k") % 2 === 0)
        .createOrReplaceTempView("ns_src_q173")
      s.sql("INSERT INTO q173cat.ns.evt SELECT k, ts_nanos FROM ns_src_q173")
      // re-declare long -> timestamp_ns + the opt-in property (the
      // adopt-a-nanos-table shape)
      val dir = s"$warehouse/ns/evt"
      val fs = new Path(dir).getFileSystem(conf)
      val latest = graft.iceberg.TableMetadata.latestMetadataPath(dir, conf)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = {
        val in = fs.open(latest)
        try mapper.readTree(in.readAllBytes())
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        finally in.close()
      }
      import scala.jdk.CollectionConverters._
      root.get("schemas").elements.asScala
        .flatMap(_.get("fields").elements.asScala)
        .filter(_.get("name").asText == "ts_nanos")
        .foreach(_.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("type", "timestamp_ns"))
      root.`with`("properties")
        .put(graft.iceberg.TableMetadata.NsAsBigintKey, "true")
      val ver = latest.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toLong
      val out = fs.create(new Path(s"$dir/metadata/v${ver + 1}.metadata.json"))
      try out.write(mapper.writeValueAsBytes(root)) finally out.close()
      // ENGINE write under the opt-in: the odd keys, exact nanos
      import s.implicits._
      val odd = Tables.load(s, d, "nation")
        .selectExpr("CAST(n_nationkey AS BIGINT) AS k",
          "CAST(1700000000000000000 + n_nationkey * 7 AS BIGINT) AS ts_nanos")
        .filter(col("k") % 2 === 1)
      graft.iceberg.IcebergWriter.append(s, dir, odd)
      new graft.iceberg.IcebergTable(dir, conf).toDF(s)
        .select(col("k"), col("ts_nanos"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // v3 row lineage, BOTH columns: `_last_updated_sequence_number`
    // inherits each file's data sequence number, a copy-on-write UPDATE
    // (here running OVER outstanding merge-on-read delete debt) moves
    // ONLY the updated rows to the updating commit's sequence while
    // copied rows keep theirs through the rewrite — the oracle
    // reconstructs every row's expected sequence from the commit order.
    "q170_lineage_seq" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q170-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q170")
      s.conf.set("spark.sql.catalog.q170cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q170cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q170cat.ns")
      s.sql(
        """CREATE TABLE q170cat.ns.t (k BIGINT, pri STRING)
          |TBLPROPERTIES ('format-version' = '3',
          |               'write.delete.mode' = 'merge-on-read')""".stripMargin)
      s.sql(
        """INSERT INTO q170cat.ns.t
          |SELECT CAST(o_orderkey AS BIGINT), o_orderpriority
          |FROM orders_src_q170 WHERE o_orderkey % 4 = 0""".stripMargin) // seq 1
      s.sql(
        """INSERT INTO q170cat.ns.t
          |SELECT CAST(o_orderkey AS BIGINT), o_orderpriority
          |FROM orders_src_q170 WHERE o_orderkey % 4 = 1""".stripMargin) // seq 2
      s.sql("DELETE FROM q170cat.ns.t WHERE k % 10 = 6") // seq 3, MoR debt
      s.sql("UPDATE q170cat.ns.t SET pri = 'hit' WHERE k % 9 = 3") // seq 4, CoW
      s.sql(
        """SELECT k, pri, _last_updated_sequence_number AS seq
          |FROM q170cat.ns.t ORDER BY k ASC NULLS FIRST""".stripMargin)
    }),

    // Copy-on-write rewrite OVER outstanding merge-on-read delete debt:
    // the rewrite reads delete-applied rows and its replacement files
    // (new sequence number) escape the old delete files — the deletions
    // MATERIALIZE instead of resurrecting, with no compaction step
    // between the deletes and the UPDATE. The oracle replays the same
    // ops relationally.
    "q169_cow_over_debt" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q169-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q169")
      s.conf.set("spark.sql.catalog.q169cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q169cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q169cat.ns")
      s.sql(
        """CREATE TABLE q169cat.ns.t (k BIGINT, pri STRING)
          |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
      s.sql(
        """INSERT INTO q169cat.ns.t
          |SELECT CAST(o_orderkey AS BIGINT), o_orderpriority
          |FROM orders_src_q169 WHERE o_orderkey % 3 = 0""".stripMargin)
      // equality debt + position debt, both still outstanding at UPDATE
      s.sql("DELETE FROM q169cat.ns.t WHERE k % 21 = 6")
      s.sql("DELETE FROM q169cat.ns.t WHERE k >= 3000 AND k < 4000")
      // copy-on-write UPDATE over the debt (write.update.mode default)
      s.sql("UPDATE q169cat.ns.t SET pri = concat(pri, '!') WHERE k % 9 = 3")
      s.sql(
        """SELECT k, pri FROM q169cat.ns.t
          |ORDER BY k ASC NULLS FIRST""".stripMargin)
    }),

    // Iceberg v3 type promotions end-to-end: `unknown -> bigint` (pre-
    // promotion rows serve NULL — the column was never stored; later
    // inserts store values) and `date -> timestamp` (pre-promotion INT32
    // date pages read as midnight timestamps through Spark's parquet
    // type-widening — zero rewrite at any table size). The oracle
    // reconstructs both halves relationally.
    "q168_type_promotion" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q168-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q168")
      s.conf.set("spark.sql.catalog.q168cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q168cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q168cat.ns")
      s.sql(
        """CREATE TABLE q168cat.ns.t TBLPROPERTIES ('format-version' = '3')
          |AS SELECT CAST(o_orderkey AS BIGINT) AS k, NULL AS u,
          |          CAST(o_orderdate AS DATE) AS ts
          |FROM orders_src_q168 WHERE o_orderkey % 4 = 0""".stripMargin)
      s.sql("ALTER TABLE q168cat.ns.t ALTER COLUMN u TYPE BIGINT")
      s.sql("ALTER TABLE q168cat.ns.t ALTER COLUMN ts TYPE TIMESTAMP_NTZ")
      s.sql(
        """INSERT INTO q168cat.ns.t
          |SELECT CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT),
          |       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP_NTZ)
          |FROM orders_src_q168 WHERE o_orderkey % 4 = 1""".stripMargin)
      s.sql(
        """SELECT k, u, CAST(ts AS STRING) AS ts_str
          |FROM q168cat.ns.t ORDER BY k ASC NULLS FIRST""".stripMargin)
    }),

    // Iceberg v3 default values end-to-end: ADD COLUMN ... DEFAULT is
    // METADATA-ONLY at any table size — files written before the column
    // serve the immutable initial-default (decided per file at the
    // reader, zero plan-time IO), INSERTs omitting the column take the
    // current write-default, and ALTER COLUMN SET DEFAULT moves only the
    // write side. The oracle reconstructs the same table relationally.
    "q164_default_values" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q164-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q164")
      s.conf.set("spark.sql.catalog.q164cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q164cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q164cat.ns")
      s.sql(
        """CREATE TABLE q164cat.ns.t (k BIGINT, pri STRING)
          |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
      s.sql(
        """INSERT INTO q164cat.ns.t
          |SELECT CAST(o_orderkey AS BIGINT), o_orderpriority
          |FROM orders_src_q164 WHERE o_orderkey % 3 = 0""".stripMargin)
      // metadata-only: pre-column files below serve these defaults
      s.sql("ALTER TABLE q164cat.ns.t ADD COLUMN seg STRING DEFAULT 'none'")
      s.sql("ALTER TABLE q164cat.ns.t ADD COLUMN w INT NOT NULL DEFAULT 5")
      s.sql(
        """INSERT INTO q164cat.ns.t
          |SELECT CAST(o_orderkey AS BIGINT), o_orderpriority,
          |       o_orderpriority, CAST(o_orderkey % 4 AS INT)
          |FROM orders_src_q164 WHERE o_orderkey % 3 = 1""".stripMargin)
      s.sql("ALTER TABLE q164cat.ns.t ALTER COLUMN w SET DEFAULT 9")
      // write-default fills the omitted column at INSERT analysis
      s.sql(
        """INSERT INTO q164cat.ns.t (k, pri, seg)
          |SELECT CAST(o_orderkey AS BIGINT), o_orderpriority, 'late'
          |FROM orders_src_q164 WHERE o_orderkey % 3 = 2""".stripMargin)
      s.sql(
        """SELECT seg, w, CAST(COUNT(*) AS BIGINT) AS cnt,
          |       CAST(SUM(k) AS BIGINT) AS sum_k
          |FROM q164cat.ns.t GROUP BY seg, w
          |ORDER BY seg ASC NULLS FIRST, w ASC NULLS FIRST""".stripMargin)
    }),

    "q163_cdc_replication" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q163-warehouse")
      val ckpt = graft.Scratch.dir("q163-ckpt")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      new Path(ckpt).getFileSystem(conf).delete(new Path(ckpt), true)
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q163")
      s.conf.set("spark.sql.catalog.q163cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q163cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q163cat.ns")
      s.sql(
        """CREATE TABLE q163cat.ns.src (k BIGINT NOT NULL, v STRING)
          |TBLPROPERTIES ('write.merge.mode' = 'merge-on-read',
          |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      s.sql("ALTER TABLE q163cat.ns.src SET IDENTIFIER FIELDS k")
      s.sql("CREATE TABLE q163cat.ns.dst (k BIGINT NOT NULL, v STRING)")
      s.sql("ALTER TABLE q163cat.ns.dst SET IDENTIFIER FIELDS k")
      s.sql(
        """INSERT INTO q163cat.ns.src
          |SELECT CAST(o_orderkey AS BIGINT), o_orderpriority
          |FROM orders_src_q163 WHERE o_orderkey % 7 = 0""".stripMargin)
      s.sql("UPDATE q163cat.ns.src SET v = concat(v, '*') WHERE k % 21 = 0")
      s.sql(
        """MERGE INTO q163cat.ns.src t
          |USING (SELECT -CAST(o_orderkey AS BIGINT) AS k, 'R' AS v
          |       FROM orders_src_q163 WHERE o_orderkey % 60 = 11) s
          |ON t.k = s.k
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql("DELETE FROM q163cat.ns.src WHERE k % 35 = 7")
      val q = graft.streaming.EventStream.icebergReplicaSink(
          s.readStream.option("maxSnapshotsPerTrigger", "1")
            .table("q163cat.ns.src.changes"),
          "q163cat.ns.dst")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      s.sql("SELECT k, v FROM q163cat.ns.dst ORDER BY k ASC NULLS FIRST")
    }),

    // `partitions` metadata table end-to-end: per-partition data +
    // delete-debt rollup computed from MANIFEST metadata only (zero data
    // IO — the daily "how big is each partition" operator question). The
    // query writes a partitioned table, takes on merge-on-read delete
    // debt (asserted visible in the debt columns), compacts it away, and
    // serves the final per-partition record counts — which the oracle
    // recomputes relationally from the source rows.
    "q162_partitions_metadata" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q162-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "supplier").createOrReplaceTempView("supplier_src_q162")
      s.conf.set("spark.sql.catalog.q162cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q162cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q162cat.ns")
      s.sql(
        """CREATE TABLE q162cat.ns.sup (
          |  s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE)
          |PARTITIONED BY (s_nationkey)
          |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
      s.sql(
        """INSERT INTO q162cat.ns.sup
          |SELECT CAST(s_suppkey AS BIGINT), CAST(s_nationkey AS BIGINT),
          |       s_acctbal
          |FROM supplier_src_q162""".stripMargin)
      s.sql("DELETE FROM q162cat.ns.sup WHERE s_suppkey % 3 = 0")
      // the debt columns must SEE the outstanding merge-on-read deletes
      val debt = s.sql(
        """SELECT CAST(SUM(position_delete_record_count +
          |                equality_delete_record_count) AS BIGINT)
          |FROM q162cat.ns.sup.`partitions`""".stripMargin)
        .collect()(0).getLong(0)
      require(debt > 0L, s"q162: expected visible delete debt, got $debt")
      s.sql("CALL q162cat.system.rewrite_data_files(table => 'ns.sup')")
      val rows = s.sql(
        """SELECT `partition`, spec_id, file_count, record_count,
          |       position_delete_record_count, equality_delete_record_count
          |FROM q162cat.ns.sup.`partitions`""".stripMargin).collect()
      require(rows.forall(r => r.getLong(2) > 0L),
        s"q162: every partition must hold at least one live file")
      require(rows.forall(r => r.getLong(4) == 0L && r.getLong(5) == 0L),
        s"q162: compaction must have materialized the delete debt")
      s.sql(
        """SELECT `partition` AS part, spec_id, record_count
          |FROM q162cat.ns.sup.`partitions`
          |ORDER BY part""".stripMargin)
    }),

    // CBO statistics end-to-end: ANALYZE stores NDVs, the scan serves
    // column stats (NDV from the analyze pass; min/max/nullCount FRESH
    // from manifests), catalyst folds them into attributeStats under
    // spark.sql.cbo.enabled. The emitted row is read FROM THE PLAN's
    // statistics, not from the data — the oracle recomputes the same
    // quantities from the rows, so a wrong manifest bound or a stats
    // plumbing break hash-mismatches.
    "q75_cbo_stats" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q75-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q75")
      s.conf.set("spark.sql.catalog.q75cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q75cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q75cat.ns")
      s.sql(
        """CREATE TABLE q75cat.ns.nation_st AS
          |SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
          |       CAST(n_regionkey AS BIGINT) AS n_regionkey, n_name
          |FROM nation_src_q75""".stripMargin)
      s.sql("CALL q75cat.system.analyze_table(table => 'ns.nation_st')")
      val saved = s.conf.getOption("spark.sql.cbo.enabled")
      s.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val stats = s.table("q75cat.ns.nation_st")
          .queryExecution.optimizedPlan.stats
        val byName = stats.attributeStats.map { case (a, st) => a.name -> st }
        require(byName.contains("n_nationkey") && byName.contains("n_regionkey"),
          s"q75: expected plan column stats, got ${byName.keySet}")
        val nk = byName("n_nationkey")
        val rk = byName("n_regionkey")
        // NDV is approximate — require sane, oracle the exact quantities
        require(nk.distinctCount.exists(n => n >= 20 && n <= 30),
          s"q75: n_nationkey NDV ~25, got ${nk.distinctCount}")
        val rows = stats.rowCount.map(_.toLong)
          .getOrElse(sys.error("q75: CBO row count missing"))
        import s.implicits._
        Seq((
          nk.min.get.asInstanceOf[Long], nk.max.get.asInstanceOf[Long],
          rk.min.get.asInstanceOf[Long], rk.max.get.asInstanceOf[Long],
          nk.nullCount.map(_.toLong).getOrElse(-1L), rows
        )).toDF("min_nk", "max_nk", "min_rk", "max_rk", "nulls_nk", "n_rows")
      } finally saved match {
        case Some(v) => s.conf.set("spark.sql.cbo.enabled", v)
        case None => s.conf.unset("spark.sql.cbo.enabled")
      }
    }),

    // Incremental materialized-view maintenance: a rollup computed ONCE,
    // then kept current by folding the CDC changelog — the refresh reads
    // only the changed rows (changesBetween plans from manifest diffs),
    // never the base table. The window spans an INSERT, a copy-on-write
    // UPDATE (delete+insert pairs), and an equality DELETE that removes a
    // whole group. The oracle recomputes the final rollup from scratch in
    // DuckDB — equality of "seed + fold(changes)" with the full recompute
    // IS the operator's contract. At 100 TB: refresh IO ∝ change volume,
    // one delta-key shuffle, one key join against the state.
    "q90_incremental_mv" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      import graft.operators.IncrementalView
      val warehouse = graft.Scratch.dir("q90-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q90")
      s.conf.set("spark.sql.catalog.q90cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q90cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q90cat.ns")
      s.sql(
        """CREATE TABLE q90cat.ns.orders_mv AS
          |SELECT o_orderkey, o_custkey, o_orderpriority FROM orders_src_q90
          |WHERE o_orderkey % 4 <> 0""".stripMargin)
      val dir = s"$warehouse/ns/orders_mv"
      val keys = Seq("o_orderpriority")
      val sums = Seq("o_orderkey" -> "sk", "o_custkey" -> "sc")
      val t0 = new graft.iceberg.IcebergTable(dir, conf)
      val s0 = t0.metadata.snapshotLineage.last
      // seed state is MATERIALIZED as of s0 (a real MV would persist it);
      // collecting here pins "the fold starts from stale state", so the
      // refresh below cannot silently recompute from the live table
      val state0 = IncrementalView
        .aggregateState(t0.atSnapshot(s0).toDF(s), keys, sums)
        .cache()
      state0.count()
      s.sql(
        """INSERT INTO q90cat.ns.orders_mv
          |SELECT o_orderkey, o_custkey, o_orderpriority FROM orders_src_q90
          |WHERE o_orderkey % 4 = 0""".stripMargin)
      s.sql(
        """UPDATE q90cat.ns.orders_mv SET o_custkey = o_custkey + 1000
          |WHERE o_orderpriority = '1-URGENT'""".stripMargin)
      s.sql("DELETE FROM q90cat.ns.orders_mv WHERE o_orderpriority = '5-LOW'")
      val t1 = new graft.iceberg.IcebergTable(dir, conf)
      val changes = t1.changesBetween(s, s0, t1.metadata.snapshotLineage.last)
      import org.apache.spark.sql.functions.col
      IncrementalView.refresh(state0, changes, keys, sums)
        .select(col("o_orderpriority"), col("cnt"),
          col("sk").cast("long").as("sk"), col("sk_nn"),
          col("sc").cast("long").as("sc"), col("sc_nn"))
        .orderBy("o_orderpriority")
    }),

    // The SQL face of incremental-MV maintenance: CALL create_mv pins the
    // seed, the source moves (INSERT + equality DELETE), CALL refresh_mv
    // folds only the changelog (cursor rides the refresh snapshot's
    // summary — state and cursor move in ONE commit). The oracle is the
    // from-scratch recompute of the final rollup.
    "q97_mv_procedures" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q97-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q97")
      s.conf.set("spark.sql.catalog.q97cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q97cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q97cat.ns")
      s.sql(
        """CREATE TABLE q97cat.ns.src AS
          |SELECT o_orderkey, o_custkey, o_orderpriority FROM orders_src_q97
          |WHERE o_orderkey % 3 <> 0""".stripMargin)
      s.sql("CALL q97cat.system.create_mv(table => 'ns.src', mv => 'ns.mv', " +
        "keys => 'o_orderpriority', sums => 'o_orderkey:sk')").collect()
      s.sql(
        """INSERT INTO q97cat.ns.src
          |SELECT o_orderkey, o_custkey, o_orderpriority FROM orders_src_q97
          |WHERE o_orderkey % 3 = 0""".stripMargin)
      s.sql("DELETE FROM q97cat.ns.src WHERE o_orderpriority = '3-MEDIUM'")
      val r = s.sql("CALL q97cat.system.refresh_mv(table => 'ns.mv')").collect()
      require(r.head.getInt(1) == 1, "q97: refresh must fold")
      // and a second refresh is a no-op (cursor is current)
      require(s.sql("CALL q97cat.system.refresh_mv(table => 'ns.mv')")
        .collect().head.getInt(1) == 0, "q97: repeat refresh must no-op")
      s.sql(
        """SELECT o_orderpriority, cnt, CAST(sk AS BIGINT) AS sk, sk_nn
          |FROM q97cat.ns.mv ORDER BY o_orderpriority""".stripMargin)
    }),

    "q67_mor" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q67-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q67")
      s.conf.set("spark.sql.catalog.q67cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q67cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q67cat.ns")
      s.sql(
        """CREATE TABLE q67cat.ns.nation_mor
          |TBLPROPERTIES ('write.update.mode' = 'merge-on-read',
          |               'write.merge.mode' = 'merge-on-read',
          |               'write.delete.mode' = 'merge-on-read') AS
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q67""".stripMargin)
      s.sql(
        """UPDATE q67cat.ns.nation_mor SET n_regionkey = n_regionkey + 10
          |WHERE n_nationkey >= 15""".stripMargin)
      s.sql(
        """MERGE INTO q67cat.ns.nation_mor t
          |USING (SELECT n_nationkey, n_regionkey + 100 AS r
          |       FROM nation_src_q67 WHERE n_nationkey BETWEEN 5 AND 9) src
          |ON t.n_nationkey = src.n_nationkey
          |WHEN MATCHED THEN UPDATE SET n_regionkey = src.r""".stripMargin)
      s.sql(
        "DELETE FROM q67cat.ns.nation_mor WHERE n_nationkey > 1 AND n_nationkey < 4")
      s.sql(
        """SELECT n_nationkey, n_regionkey, n_name FROM q67cat.ns.nation_mor
          |ORDER BY n_nationkey""".stripMargin)
    }),

    // CDC changelog: CTAS + append + merge-on-read equality DELETE, then
    // changesBetween(table start, head) — inserts for both appends,
    // exactly the matched rows as deletes, ordinals in commit order. The
    // oracle restates the three commits from the source table, so the
    // change ROWS (not just counts) are hash-gated.
    "q66_changelog" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q66-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "nation").createOrReplaceTempView("nation_src_q66")
      s.conf.set("spark.sql.catalog.q66cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q66cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q66cat.ns")
      s.sql(
        """CREATE TABLE q66cat.ns.nation_cdc AS
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q66
          |WHERE n_nationkey < 10""".stripMargin)
      s.sql(
        """INSERT INTO q66cat.ns.nation_cdc
          |SELECT n_nationkey, n_regionkey, n_name FROM nation_src_q66
          |WHERE n_nationkey >= 10""".stripMargin)
      s.sql("DELETE FROM q66cat.ns.nation_cdc WHERE n_nationkey IN (0, 1, 2)")
      val dir = s"$warehouse/ns/nation_cdc"
      val t = new graft.iceberg.IcebergTable(dir, conf)
      t.changesBetween(s, 0L, t.metadata.snapshotLineage.last)
        .select(org.apache.spark.sql.functions.col("n_nationkey"),
          org.apache.spark.sql.functions.col("n_regionkey"),
          org.apache.spark.sql.functions.col("n_name"),
          org.apache.spark.sql.functions.col("_change_type"),
          org.apache.spark.sql.functions.col("_change_ordinal"))
        .orderBy("_change_ordinal", "n_nationkey")
    }),

    // Storage-partitioned join: customer and orders land in Iceberg tables
    // both partitioned by bucket(8, custkey); with v2 bucketing on, the
    // join plans with ZERO shuffle — Catalyst proves co-partitioning from
    // the scans' KeyGroupedPartitioning + the catalog's bucket function.
    // The require() freezes (and gates) the executed plan while the SPJ
    // confs are set; the oracle hash-gates the values. At 100 TB this is
    // the fact-fact join pattern: shuffle neither side, ever.
    "q65_spj" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val warehouse = graft.Scratch.dir("q65-warehouse")
      val conf = s.sessionState.newHadoopConf()
      new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
      Tables.load(s, d, "customer").createOrReplaceTempView("customer_src_q65")
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_src_q65")
      s.conf.set("spark.sql.catalog.q65cat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.q65cat.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS q65cat.ns")
      s.sql(
        """CREATE TABLE q65cat.ns.customer_b (c_custkey BIGINT, c_mktsegment STRING)
          |PARTITIONED BY (bucket(8, c_custkey))""".stripMargin)
      s.sql(
        """INSERT INTO q65cat.ns.customer_b
          |SELECT CAST(c_custkey AS BIGINT), c_mktsegment FROM customer_src_q65""".stripMargin)
      s.sql(
        """CREATE TABLE q65cat.ns.orders_b (o_orderkey BIGINT, o_custkey BIGINT)
          |PARTITIONED BY (bucket(8, o_custkey))""".stripMargin)
      s.sql(
        """INSERT INTO q65cat.ns.orders_b
          |SELECT CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT)
          |FROM orders_src_q65""".stripMargin)
      val spjConfs = Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false")
      val saved = spjConfs.map { case (k, _) => k -> s.conf.getOption(k) }
      spjConfs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        val df = s.sql(
          """SELECT c.c_mktsegment, COUNT(*) AS n,
            |       CAST(SUM(o.o_orderkey) AS BIGINT) AS sk
            |FROM q65cat.ns.customer_b c
            |JOIN q65cat.ns.orders_b o ON c.c_custkey = o.o_custkey
            |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)
        val joinShuffles = df.queryExecution.executedPlan.collectFirst {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
          case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
        }.map(_.collect {
          case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => x
        }.size)
        require(joinShuffles.contains(0),
          s"q65: expected a zero-shuffle storage-partitioned join, got " +
            s"$joinShuffles shuffles:\n${df.queryExecution.executedPlan}")
        df
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
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
        |      WHERE o_totalprice > 100000) big_orders""".stripMargin,
    "q54_time_travel" ->
      """SELECT (SELECT COUNT(*) FROM region WHERE r_regionkey < 3) AS n_v1,
        |       (SELECT CAST(SUM(r_regionkey) AS BIGINT) FROM region
        |        WHERE r_regionkey < 3) AS sk_v1,
        |       (SELECT COUNT(*) FROM region) AS n_cur""".stripMargin,
    "q55_sql_write" ->
      """SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sk
        |FROM nation WHERE n_regionkey <> 1
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q57_sql_delete" ->
      """SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sk
        |FROM nation WHERE n_regionkey <> 2 AND n_nationkey NOT IN (0, 1)
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q98_deletion_vector" ->
      """SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sk
        |FROM nation WHERE n_nationkey NOT IN (2, 11)
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q106_partition_overwrite" ->
      """SELECT n_regionkey, COUNT(*) AS n,
        |       CAST(SUM(n_nationkey) AS BIGINT) AS sk, MIN(n_name) AS mn
        |FROM (
        |  SELECT n_nationkey, n_regionkey, n_name FROM nation
        |  WHERE n_regionkey NOT IN (2, 4)
        |  UNION ALL SELECT n_nationkey + 100, n_regionkey, n_name
        |  FROM nation WHERE n_regionkey = 2
        |  UNION ALL SELECT n_nationkey + 200, n_regionkey, UPPER(n_name)
        |  FROM nation WHERE n_regionkey = 4
        |) GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q100_dv_write" ->
      """SELECT n_regionkey, COUNT(*) AS n,
        |       CAST(SUM(n_nationkey) AS BIGINT) AS sk,
        |       CAST(SUM(LENGTH(n_name))
        |            + SUM(CASE WHEN n_nationkey = 20 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS ln
        |FROM nation WHERE NOT (n_nationkey >= 4 AND n_nationkey < 9)
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q60_pos_delete" ->
      """SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sk
        |FROM nation WHERE n_nationkey < 20
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q61_expire" ->
      """SELECT COUNT(*) AS n, CAST(SUM(r_regionkey) AS BIGINT) AS sk,
        |       MIN(r_name) AS mn, MAX(r_name) AS mx
        |FROM region""".stripMargin,
    "q62_incremental" ->
      """SELECT CAST(inc.n_regionkey AS BIGINT) AS n_regionkey, inc.n_inc,
        |       inc.sk_inc, ref.n_ref FROM
        |  (SELECT n_regionkey, COUNT(*) AS n_inc,
        |          CAST(SUM(n_nationkey) AS BIGINT) AS sk_inc
        |   FROM nation WHERE n_nationkey BETWEEN 10 AND 19
        |   GROUP BY n_regionkey) inc
        |CROSS JOIN
        |  (SELECT COUNT(*) AS n_ref FROM nation WHERE n_nationkey < 20) ref
        |ORDER BY n_regionkey""".stripMargin,
    "q64_wap" ->
      """SELECT (SELECT COUNT(*) FROM nation WHERE n_nationkey < 10) AS n_pre,
        |       (SELECT COUNT(*) FROM nation
        |        WHERE n_nationkey NOT IN (0, 1, 2)) AS n_branch,
        |       (SELECT COUNT(*) FROM nation
        |        WHERE n_nationkey NOT IN (0, 1, 2)) AS n_after,
        |       (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM nation
        |        WHERE n_nationkey NOT IN (0, 1, 2)) AS sk_after""".stripMargin,
    "q97_mv_procedures" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |       CAST(SUM(o_orderkey) AS BIGINT) AS sk,
        |       COUNT(o_orderkey) AS sk_nn
        |FROM orders WHERE o_orderpriority <> '3-MEDIUM'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the final corpus state: everything, the URGENT custkey bump applied,
    // the 5-LOW group deleted — recomputed from scratch; the Spark side
    // reached the same rows by folding only the changelog into stale state
    "q90_incremental_mv" ->
      """WITH cur AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderpriority = '1-URGENT'
        |              THEN o_custkey + 1000 ELSE o_custkey END AS o_custkey,
        |         o_orderpriority
        |  FROM orders WHERE o_orderpriority <> '5-LOW')
        |SELECT o_orderpriority, COUNT(*) AS cnt,
        |       CAST(SUM(o_orderkey) AS BIGINT) AS sk,
        |       COUNT(o_orderkey) AS sk_nn,
        |       CAST(SUM(o_custkey) AS BIGINT) AS sc,
        |       COUNT(o_custkey) AS sc_nn
        |FROM cur GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q75_cbo_stats" ->
      """SELECT CAST(MIN(n_nationkey) AS BIGINT) AS min_nk,
        |       CAST(MAX(n_nationkey) AS BIGINT) AS max_nk,
        |       CAST(MIN(n_regionkey) AS BIGINT) AS min_rk,
        |       CAST(MAX(n_regionkey) AS BIGINT) AS max_rk,
        |       CAST(COUNT(*) - COUNT(n_nationkey) AS BIGINT) AS nulls_nk,
        |       COUNT(*) AS n_rows
        |FROM nation""".stripMargin,
    "q74_delete_compaction" ->
      """SELECT n_regionkey, COUNT(*) AS n,
        |       CAST(SUM(n_nationkey) AS BIGINT) AS sk
        |FROM nation
        |WHERE n_nationkey NOT IN (1, 3, 5, 7, 9)
        |  AND NOT (n_nationkey >= 20 AND n_nationkey < 23)
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    // low = its seed (<10) + its half of the committed band (10..19);
    // high likewise plus the rival row 20; the FAILED transaction
    // (nationkey >= 20 on both) contributed nothing to either table
    "q73_multitable_tx" ->
      """SELECT (SELECT COUNT(*) FROM nation
        |        WHERE n_regionkey < 2 AND n_nationkey < 20) AS n_low,
        |       (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM nation
        |        WHERE n_regionkey < 2 AND n_nationkey < 20) AS sk_low,
        |       (SELECT COUNT(*) FROM nation
        |        WHERE (n_regionkey >= 2 AND n_nationkey < 20)
        |           OR n_nationkey = 20) AS n_high,
        |       (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM nation
        |        WHERE (n_regionkey >= 2 AND n_nationkey < 20)
        |           OR n_nationkey = 20) AS sk_high""".stripMargin,
    // main after = base (<10) + the past-fork append (20) + ONLY the
    // picked staged commit (15..19); the branch still reads 0..19
    "q72_cherrypick" ->
      """SELECT (SELECT COUNT(*) FROM nation
        |        WHERE n_nationkey < 10
        |           OR n_nationkey BETWEEN 15 AND 20) AS n_after,
        |       (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM nation
        |        WHERE n_nationkey < 10
        |           OR n_nationkey BETWEEN 15 AND 20) AS sk_after,
        |       (SELECT COUNT(*) FROM nation
        |        WHERE n_nationkey < 20) AS n_branch""".stripMargin,
    "q120_snapshot_clone" ->
      """SELECT (SELECT COUNT(*) FROM orders
        |        WHERE o_orderkey < 2000
        |           OR o_orderkey BETWEEN 3000 AND 3499) AS n_src,
        |       (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
        |        WHERE o_orderkey < 2000
        |           OR o_orderkey BETWEEN 3000 AND 3499) AS sk_src,
        |       (SELECT COUNT(*) FROM orders
        |        WHERE o_orderkey BETWEEN 500 AND 2499) AS n_clone,
        |       (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
        |        WHERE o_orderkey BETWEEN 500 AND 2499) AS sk_clone""".stripMargin,
    "q144_avro_import" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |       CAST(SUM(s_suppkey) AS BIGINT) AS sk
        |FROM supplier
        |WHERE NOT (s_suppkey >= 3 AND s_suppkey < 7)
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q132_orc_import" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |       CAST(SUM(s_suppkey) AS BIGINT) AS sk
        |FROM supplier
        |WHERE s_suppkey NOT IN (3, 4, 5, 6)
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q146_orc_write" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |       CAST(SUM(s_suppkey) AS BIGINT) AS sk,
        |       CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT)
        |         AS bal_cents
        |FROM supplier
        |WHERE s_suppkey % 5 <> 0
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q153_avro_write" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |       CAST(SUM(s_suppkey) AS BIGINT) AS sk,
        |       CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT)
        |         AS bal_cents
        |FROM supplier
        |WHERE NOT (s_suppkey >= 3 AND s_suppkey < 7)
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q154_nested_ctas" ->
      """SELECT label, COUNT(*) AS n,
        |       CAST(SUM(CAST(len(embedding) AS BIGINT)) AS BIGINT) AS dims,
        |       CAST(SUM(CAST(ROUND(CAST(embedding[1] AS DOUBLE)
        |           * 1000) AS BIGINT)) AS BIGINT) AS e1_milli
        |FROM embeddings
        |WHERE vec_id % 5 <> 0
        |GROUP BY label ORDER BY label""".stripMargin,
    "q160_cdc_updates" ->
      """WITH base AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderpriority AS v
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |upd AS (
        |  SELECT k, v AS v_old, v || '+' AS v_new FROM base WHERE k % 20 = 0),
        |state1 AS (
        |  SELECT b.k, COALESCE(u.v_new, b.v) AS v
        |  FROM base b LEFT JOIN upd u USING (k)),
        |ins AS (
        |  SELECT -CAST(o_orderkey AS BIGINT) AS k,
        |         o_orderpriority AS v
        |  FROM orders WHERE o_orderkey % 50 = 3),
        |stream AS (
        |  SELECT k, v_old AS v, 'update_before' AS _change_type,
        |         0 AS _change_ordinal FROM upd
        |  UNION ALL
        |  SELECT k, v_new, 'update_after', 0 FROM upd
        |  UNION ALL
        |  SELECT k, v, 'delete', 1 FROM state1 WHERE k % 35 = 0
        |  UNION ALL
        |  SELECT k, v, 'insert', 2 FROM ins)
        |SELECT k, v, _change_type,
        |       CAST(_change_ordinal AS INT) AS _change_ordinal
        |FROM stream
        |ORDER BY k ASC NULLS FIRST, _change_ordinal ASC NULLS FIRST,
        |         _change_type ASC NULLS FIRST""".stripMargin,
    "q165_partition_stats" ->
      """WITH rows AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS k,
        |         CAST(s_nationkey AS BIGINT) AS n
        |  FROM supplier
        |  UNION ALL
        |  SELECT -CAST(s_suppkey AS BIGINT), CAST(s_nationkey AS BIGINT)
        |  FROM supplier WHERE s_suppkey % 5 = 1)
        |SELECT 's_nationkey=' || CAST(n AS VARCHAR) AS part,
        |       CAST(COUNT(*) AS BIGINT) AS record_count
        |FROM rows GROUP BY n
        |ORDER BY part ASC NULLS FIRST""".stripMargin,
    "q166_cdc_stream_updates" ->
      """WITH base AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderpriority AS v
        |  FROM orders WHERE o_orderkey % 12 = 0),
        |upd AS (
        |  SELECT k, v AS v_old, v || '!' AS v_new FROM base WHERE k % 24 = 0),
        |afterupd AS (
        |  SELECT k, CASE WHEN k % 24 = 0 THEN v || '!' ELSE v END AS v
        |  FROM base),
        |mrg_new AS (
        |  SELECT -CAST(o_orderkey AS BIGINT) AS k, 'R' AS v
        |  FROM orders WHERE o_orderkey % 60 = 13),
        |mrg_upd AS (
        |  SELECT k, v AS v_old, 'M' AS v_new FROM afterupd WHERE k % 36 = 0),
        |aftermrg AS (
        |  SELECT k, CASE WHEN k % 36 = 0 THEN 'M' ELSE v END AS v
        |  FROM afterupd
        |  UNION ALL SELECT k, v FROM mrg_new),
        |stream AS (
        |  SELECT k, v, 'insert' AS _change_type, 0 AS _change_ordinal
        |  FROM base
        |  UNION ALL SELECT k, v_old, 'update_before', 1 FROM upd
        |  UNION ALL SELECT k, v_new, 'update_after', 1 FROM upd
        |  UNION ALL SELECT k, v_old, 'update_before', 2 FROM mrg_upd
        |  UNION ALL SELECT k, v_new, 'update_after', 2 FROM mrg_upd
        |  UNION ALL SELECT k, v, 'insert', 2 FROM mrg_new
        |  UNION ALL SELECT k, v, 'delete', 3 FROM aftermrg WHERE k % 30 = 6)
        |SELECT k, v, _change_type,
        |       CAST(_change_ordinal AS INT) AS _change_ordinal
        |FROM stream
        |ORDER BY k ASC NULLS FIRST, _change_ordinal ASC NULLS FIRST,
        |         _change_type ASC NULLS FIRST""".stripMargin,
    "q171_geometry_wkb" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS k,
        |       '0101000000'
        |         || repeat(lower(lpad(to_hex(n_nationkey % 256), 2, '0')), 8)
        |         || repeat(lower(lpad(to_hex(n_regionkey % 256), 2, '0')), 8)
        |         AS wkb_hex
        |FROM nation
        |ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q172_geometry_write" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS k,
        |       '0101000000'
        |         || repeat(lower(lpad(to_hex(n_nationkey % 256), 2, '0')), 8)
        |         || repeat(lower(lpad(to_hex(n_regionkey % 256), 2, '0')), 8)
        |         AS wkb_hex
        |FROM nation
        |ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q173_ns_write" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS k,
        |       CAST(1700000000000000000 + n_nationkey * 7 AS BIGINT)
        |         AS ts_nanos
        |FROM nation
        |ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q174_rtas" ->
      """SELECT part, k, sval FROM (
        |  SELECT 'new' AS part, CAST(n_nationkey AS BIGINT) AS k,
        |         n_name AS sval
        |  FROM nation
        |  UNION ALL
        |  SELECT 'old', CAST(c_custkey AS BIGINT), c_mktsegment
        |  FROM customer WHERE c_custkey % 10 = 3
        |) ORDER BY part ASC NULLS FIRST, k ASC NULLS FIRST""".stripMargin,
    "q175_truncate" ->
      """SELECT part, n FROM (
        |  SELECT 'pre' AS part,
        |         (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 = 1) AS n
        |  UNION ALL
        |  SELECT 'post',
        |         (SELECT COUNT(*) FROM orders WHERE o_orderkey % 13 = 2)
        |) ORDER BY part ASC NULLS FIRST""".stripMargin,
    "q170_lineage_seq" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |       CASE WHEN o_orderkey % 9 = 3 THEN 'hit'
        |            ELSE o_orderpriority END AS pri,
        |       CAST(CASE WHEN o_orderkey % 9 = 3 THEN 4
        |                 WHEN o_orderkey % 4 = 0 THEN 1
        |                 ELSE 2 END AS BIGINT) AS seq
        |FROM orders
        |WHERE o_orderkey % 4 IN (0, 1) AND o_orderkey % 10 <> 6
        |ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q169_cow_over_debt" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |       CASE WHEN o_orderkey % 9 = 3
        |            THEN o_orderpriority || '!'
        |            ELSE o_orderpriority END AS pri
        |FROM orders
        |WHERE o_orderkey % 3 = 0
        |  AND o_orderkey % 21 <> 6
        |  AND NOT (o_orderkey >= 3000 AND o_orderkey < 4000)
        |ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q168_type_promotion" ->
      """WITH t AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(NULL AS BIGINT) AS u,
        |         CAST(o_orderdate AS DATE) AS d
        |  FROM orders WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT),
        |         CAST(o_orderdate AS DATE)
        |  FROM orders WHERE o_orderkey % 4 = 1)
        |SELECT k, u,
        |       strftime(CAST(d AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str
        |FROM t ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q167_variant_type" ->
      """SELECT CAST(doc_id AS BIGINT) AS k,
        |       CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang,
        |       CASE WHEN doc_id % 5 = 0 THEN NULL
        |            ELSE CAST(n_chars AS BIGINT) END AS chars,
        |       CASE WHEN doc_id % 5 = 0 THEN NULL ELSE source END AS tag1,
        |       CASE WHEN doc_id % 5 = 0 THEN CAST(n_chars AS BIGINT)
        |            ELSE NULL END AS scalar
        |FROM documents
        |WHERE doc_id % 3 <> 2 AND doc_id % 7 <> 3
        |ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q164_default_values" ->
      """WITH t AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, 'none' AS seg, 5 AS w
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT CAST(o_orderkey AS BIGINT), o_orderpriority,
        |         CAST(o_orderkey % 4 AS INT)
        |  FROM orders WHERE o_orderkey % 3 = 1
        |  UNION ALL
        |  SELECT CAST(o_orderkey AS BIGINT), 'late', 9
        |  FROM orders WHERE o_orderkey % 3 = 2)
        |SELECT seg, CAST(w AS INT) AS w, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM t GROUP BY seg, w
        |ORDER BY seg ASC NULLS FIRST, w ASC NULLS FIRST""".stripMargin,
    "q163_cdc_replication" ->
      """WITH base AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderpriority AS v
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |state1 AS (
        |  SELECT k, CASE WHEN k % 21 = 0 THEN v || '*' ELSE v END AS v
        |  FROM base),
        |merged AS (
        |  SELECT k, v FROM state1
        |  UNION ALL
        |  SELECT -CAST(o_orderkey AS BIGINT) AS k, 'R' AS v
        |  FROM orders WHERE o_orderkey % 60 = 11)
        |SELECT k, v FROM merged
        |WHERE k % 35 <> 7
        |ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q162_partitions_metadata" ->
      """SELECT 's_nationkey=' || CAST(CAST(s_nationkey AS BIGINT) AS VARCHAR)
        |         AS part,
        |       CAST(0 AS INT) AS spec_id,
        |       CAST(COUNT(*) AS BIGINT) AS record_count
        |FROM supplier
        |WHERE s_suppkey % 3 <> 0
        |GROUP BY s_nationkey
        |ORDER BY part""".stripMargin,
    "q161_cdc_v2_identifier" ->
      """WITH base AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderpriority AS v
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |upd AS (
        |  SELECT k, v AS v_old, v || '+' AS v_new FROM base WHERE k % 20 = 0),
        |state1 AS (
        |  SELECT b.k, COALESCE(u.v_new, b.v) AS v
        |  FROM base b LEFT JOIN upd u USING (k)),
        |mupd AS (
        |  SELECT k, v AS v_old, 'M' AS v_new FROM state1 WHERE k % 30 = 5),
        |mins AS (
        |  SELECT -CAST(o_orderkey AS BIGINT) AS k, 'N' AS v
        |  FROM orders WHERE o_orderkey % 50 = 7),
        |state2 AS (
        |  SELECT s.k, COALESCE(m.v_new, s.v) AS v
        |  FROM state1 s LEFT JOIN mupd m USING (k)
        |  UNION ALL SELECT k, v FROM mins),
        |stream AS (
        |  SELECT k, v_old AS v, 'update_before' AS _change_type,
        |         0 AS _change_ordinal FROM upd
        |  UNION ALL
        |  SELECT k, v_new, 'update_after', 0 FROM upd
        |  UNION ALL
        |  SELECT k, v_old, 'update_before', 1 FROM mupd
        |  UNION ALL
        |  SELECT k, v_new, 'update_after', 1 FROM mupd
        |  UNION ALL
        |  SELECT k, v, 'insert', 1 FROM mins
        |  UNION ALL
        |  SELECT k, v, 'delete', 2 FROM state2 WHERE k % 35 = 0)
        |SELECT k, v, _change_type,
        |       CAST(_change_ordinal AS INT) AS _change_ordinal
        |FROM stream
        |ORDER BY k ASC NULLS FIRST, _change_ordinal ASC NULLS FIRST,
        |         _change_type ASC NULLS FIRST""".stripMargin,
    // The stub kernel's rolling hash (h = h*31 + byte over the UTF-8
    // payload, then per-feature golden-ratio mix) reproduced in exact
    // HUGEINT mod-2^64 arithmetic; the REAL cast at the end mirrors the
    // kernel's Float truncation bit-for-bit.
    "q159_multimodal_iceberg" ->
      """WITH media AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |         text
        |  FROM documents),
        |live AS (SELECT * FROM media WHERE kind <> 'video'),
        |hh AS (SELECT media_id, kind,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
        |         -- the kernel hashes UTF-8 BYTES: expand each codepoint
        |         -- to its UTF-8 encoding so parity holds beyond ASCII
        |         list_reduce(
        |           list_prepend(CAST(1125899906842597 AS HUGEINT),
        |             COALESCE(flatten(list_transform(
        |               list_transform(range(1, length(text) + 1),
        |                 i -> CAST(ord(substr(text, CAST(i AS INT), 1))
        |                      AS HUGEINT)),
        |               cp -> CASE
        |                 WHEN cp < 128 THEN [cp]
        |                 WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
        |                 WHEN cp < 65536 THEN [224 + cp // 4096,
        |                   128 + (cp // 64) % 64, 128 + cp % 64]
        |                 ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
        |                   128 + (cp // 64) % 64, 128 + cp % 64]
        |               END)), [])),
        |           (acc, b) -> (acc * 31 + b)
        |             % 18446744073709551616::HUGEINT) AS hv
        |       FROM live),
        |f AS (SELECT media_id, kind, payload_len, i, hv,
        |        (11400714819323198485::HUGEINT * i)
        |          % 18446744073709551616::HUGEINT AS m
        |      FROM hh, unnest(range(1, 9)) AS t(i)),
        |x AS (SELECT media_id, kind, payload_len, i,
        |        xor(CAST(CASE WHEN hv >= 9223372036854775808::HUGEINT
        |                 THEN hv - 18446744073709551616::HUGEINT
        |                 ELSE hv END AS BIGINT),
        |            CAST(CASE WHEN m >= 9223372036854775808::HUGEINT
        |                 THEN m - 18446744073709551616::HUGEINT
        |                 ELSE m END AS BIGINT)) AS xs
        |      FROM f),
        |u AS (SELECT media_id, kind, payload_len, i,
        |        CAST(CAST(CAST(
        |          (CASE WHEN xs < 0
        |           THEN CAST(xs AS HUGEINT) + 18446744073709551616::HUGEINT
        |           ELSE CAST(xs AS HUGEINT) END) // 2048 AS DOUBLE)
        |          / 9007199254740992.0 AS REAL) AS DOUBLE) AS feat
        |      FROM x)
        |SELECT media_id, kind, payload_len,
        |       MAX(CASE WHEN i = 1 THEN feat END) AS f0,
        |       MAX(CASE WHEN i = 2 THEN feat END) AS f1,
        |       MAX(CASE WHEN i = 3 THEN feat END) AS f2,
        |       MAX(CASE WHEN i = 4 THEN feat END) AS f3,
        |       MAX(CASE WHEN i = 5 THEN feat END) AS f4,
        |       MAX(CASE WHEN i = 6 THEN feat END) AS f5,
        |       MAX(CASE WHEN i = 7 THEN feat END) AS f6,
        |       MAX(CASE WHEN i = 8 THEN feat END) AS f7
        |FROM u GROUP BY media_id, kind, payload_len
        |ORDER BY media_id ASC NULLS FIRST""".stripMargin,
    "q155_ann_iceberg" -> {
      def dotD(a: String, b: String) =
        s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"
      def cosD(a: String, b: String) =
        s"${dotD(a, b)} / (sqrt(${dotD(a, a)}) * sqrt(${dotD(b, b)}))"
      s"""WITH live AS (SELECT * FROM embeddings WHERE vec_id % 7 <> 3),
         |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM live
         |      WHERE vec_id < 5),
         |scored AS (SELECT q_id, c.vec_id AS n_id,
         |             ROUND(${cosD("q_vec", "c.embedding")}, 4) AS score
         |           FROM q, live c WHERE c.vec_id <> q_id),
         |ranked AS (SELECT q_id, n_id, score,
         |             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |               ORDER BY score DESC, n_id ASC) AS BIGINT) AS rank
         |           FROM scored)
         |SELECT q_id, n_id, score, rank FROM ranked WHERE rank <= 3
         |ORDER BY q_id ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin
    },
    "q68_zorder" ->
      """SELECT COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS sq,
        |       CAST(SUM(l_orderkey) AS BIGINT) AS sk
        |FROM lineitem
        |WHERE l_orderkey < 300 AND l_partkey < 100""".stripMargin,
    "q69_partition_evolution" ->
      """SELECT CAST(g.n_regionkey AS BIGINT) AS n_regionkey, g.n, g.sk, p.n_pt
        |FROM (SELECT n_regionkey, COUNT(*) AS n,
        |             CAST(SUM(n_nationkey) AS BIGINT) AS sk
        |      FROM nation WHERE n_regionkey <> 1
        |      GROUP BY n_regionkey) g
        |CROSS JOIN (SELECT COUNT(*) AS n_pt FROM nation
        |            WHERE n_nationkey = 20) p
        |ORDER BY n_regionkey""".stripMargin,
    "q71_metadata_agg" ->
      """SELECT COUNT(*) AS n, CAST(MIN(o_orderkey) AS BIGINT) AS min_k,
        |       CAST(MAX(o_orderkey) AS BIGINT) AS max_k,
        |       MIN(o_orderdate) AS min_d, MAX(o_orderdate) AS max_d
        |FROM orders""".stripMargin,
    "q67_mor" ->
      """WITH upd AS (
        |  SELECT n_nationkey,
        |         CASE WHEN n_nationkey BETWEEN 5 AND 9 THEN n_regionkey + 100
        |              WHEN n_nationkey >= 15 THEN n_regionkey + 10
        |              ELSE n_regionkey END AS n_regionkey,
        |         n_name
        |  FROM nation)
        |SELECT n_nationkey, n_regionkey, n_name FROM upd
        |WHERE NOT (n_nationkey > 1 AND n_nationkey < 4)
        |ORDER BY n_nationkey""".stripMargin,
    "q66_changelog" ->
      """SELECT n_nationkey, n_regionkey, n_name,
        |       'insert' AS _change_type, 0 AS _change_ordinal
        |FROM nation WHERE n_nationkey < 10
        |UNION ALL
        |SELECT n_nationkey, n_regionkey, n_name, 'insert', 1
        |FROM nation WHERE n_nationkey >= 10
        |UNION ALL
        |SELECT n_nationkey, n_regionkey, n_name, 'delete', 2
        |FROM nation WHERE n_nationkey IN (0, 1, 2)
        |ORDER BY _change_ordinal, n_nationkey""".stripMargin,
    "q65_spj" ->
      """SELECT c.c_mktsegment, COUNT(*) AS n,
        |       CAST(SUM(o.o_orderkey) AS BIGINT) AS sk
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    "q58_sql_update" ->
      """WITH upd AS (
        |  SELECT n_nationkey,
        |         CASE WHEN n_nationkey >= 15 THEN n_regionkey + 10
        |              ELSE n_regionkey END AS n_regionkey
        |  FROM nation)
        |SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sk
        |FROM upd WHERE n_regionkey < 12
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q59_sql_merge" ->
      """WITH src AS (SELECT n_nationkey, n_regionkey + 100 AS r FROM nation
        |             WHERE n_nationkey BETWEEN 10 AND 24),
        |     tgt AS (SELECT n_nationkey, n_regionkey FROM nation
        |             WHERE n_nationkey < 15),
        |     merged AS (
        |       SELECT t.n_nationkey, COALESCE(s.r, t.n_regionkey) AS n_regionkey
        |       FROM tgt t LEFT JOIN src s ON t.n_nationkey = s.n_nationkey
        |       UNION ALL
        |       SELECT s.n_nationkey, s.r FROM src s
        |       WHERE s.n_nationkey NOT IN (SELECT n_nationkey FROM tgt))
        |SELECT COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sk,
        |       CAST(SUM(n_regionkey) AS BIGINT) AS sr,
        |       CAST(MIN(n_regionkey) AS INT) AS mn,
        |       CAST(MAX(n_regionkey) AS INT) AS mx
        |FROM merged""".stripMargin)
}
