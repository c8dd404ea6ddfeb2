package graft

import org.apache.hadoop.fs.Path

import graft.iceberg.{IcebergTable, IcebergWriter}
import graft.iceberg.connector.GraftCatalog

/** Model-based stateful fuzzing of the table lifecycle: a random (but
  * seeded, reproducible) sequence of INSERT / equality DELETE / range
  * DELETE / UPDATE / compact ops runs through SQL against a
  * merge-on-read table, with an in-memory model of the expected rows
  * checked after EVERY op — and at the end, `VERSION AS OF` replays
  * every intermediate snapshot against the model's history, so a commit
  * that silently corrupted an EARLIER snapshot's reachable state (bad
  * manifest carry, delete misapplied by sequence number, compaction
  * dropping live rows) fails even if the head looks right.
  *
  * This is the stateful complement of DiffFuzz (which fuzzes the READ
  * side against DuckDB): here the oracle is the op semantics themselves.
  */
class LifecycleFuzzSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/lcfuzz-warehouse"

  test("random op sequences match the model at head and via time travel") {
    val conf = spark.sessionState.newHadoopConf()
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set("spark.sql.catalog.lcf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lcf.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lcf.ns")

    var avroImports = 0
    var renames = 0
    var evolutions = 0
    var branchPublishes = 0
    var branchAbandons = 0
    var defaultOps = 0
    var variantOps = 0
    var statsOps = 0
    var geoOps = 0
    var purgeCloneOps = 0
    var replaceOps = 0
    var replaceRivals = 0
    // seed 1207: merge-on-read UPDATEs (delta path); seed 4242:
    // copy-on-write UPDATEs — every UPDATE op then rewrites over
    // whatever merge-on-read delete debt the random sequence left
    // outstanding (the r16 debt-materializing rewrite), while deletes
    // stay merge-on-read so debt keeps accumulating between rewrites
    Seq((1207L, true), (4242L, false)).foreach { case (seed, morUpdate) =>
      val tbl = s"lcf.ns.fz$seed"
      val dir = s"$warehouse/ns/fz$seed"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val updMode = if (morUpdate)
        ", 'write.update.mode' = 'merge-on-read'" else ""
      spark.sql(
        s"""CREATE TABLE $tbl (k BIGINT, v BIGINT) TBLPROPERTIES
           |('write.delete.mode' = 'merge-on-read'$updMode)""".stripMargin)

      val r = new scala.util.Random(seed)
      val model = scala.collection.mutable.Map.empty[Long, Long]
      var nextId = 0L
      var vName = "v" // schema renames move it; every op resolves through it
      var evolved = false // partition spec evolved at most once per table
      // v3 default-column state: once declared, every row's expected `d`
      // is dModel(k) when the row was WRITTEN after the add (it carries
      // the write-default of its insert), else the immutable
      // initial-default (pre-add files and id-less imports missing the
      // column serve it at the reader)
      var dDeclared = false
      var dInit = 0L
      var dWrite = 0L
      val dModel = scala.collection.mutable.Map.empty[Long, Long]
      // v3 VARIANT column state: rows never touched by the set-payload
      // op read NULL (inserts use explicit column lists); touched rows
      // read the JSON the op wrote, compared through to_json
      var isV3 = false
      var pDeclared = false
      val pModel = scala.collection.mutable.Map.empty[Long, String]
      // snapshot id -> (model, dModel, pModel) at that commit (only
      // data-changing ops move the snapshot; compact replaces files,
      // state unchanged)
      // the snapshot's vName rides along: time travel reads a snapshot
      // under ITS OWN recorded schema (r19), so the tail replay must
      // address the column by the name it had at commit time
      val history = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Map[Long, Long], Map[Long, Long], Map[Long, String],
          String)]

      def headSnapshot(): Long =
        new IcebergTable(dir, conf).metadata.currentSnapshotId.get

      def checkHead(op: String): Unit = {
        val dSel = if (dDeclared) ", d" else ""
        val pSel = if (pDeclared) ", to_json(p)" else ""
        val got = spark.sql(s"SELECT k, $vName$dSel$pSel FROM $tbl ORDER BY k")
          .collect().map { row =>
            val k = row.getLong(0)
            var i = 2
            val d = if (dDeclared) { val x = row.getLong(i); i += 1; Some(x) }
              else None
            val p = if (pDeclared) {
              if (row.isNullAt(i)) None else Some(row.getString(i))
            } else None
            k -> ((row.getLong(1), d, p))
          }.toMap
        val want = model.map { case (k, v) =>
          k -> ((v,
            if (dDeclared) Some(dModel.getOrElse(k, dInit)) else None,
            if (pDeclared) pModel.get(k) else None))
        }.toMap
        assert(got == want,
          s"seed=$seed after $op: table ${got.size} rows vs model " +
            s"${want.size}; diff=${(got.toSet diff want.toSet).take(5)} / " +
            s"${(want.toSet diff got.toSet).take(5)}")
      }

      // partition-statistics chain state: once the maintenance property
      // flips on, appends extend the chain incrementally; the stats op
      // cross-checks whatever entry the chain left for the CURRENT
      // snapshot against a from-scratch rollup, then re-bootstraps
      var statsDeclared = false
      // geometry side-fixture state (read-only surface): expected WKB by
      // key, built once per seed
      var geoDir: Option[String] = None
      val geoModel = scala.collection.mutable.Map.empty[Long, Seq[Byte]]
      // REPLACE TABLE assigns the same column names new field ids: from
      // then on id-less imports refuse (ambiguous name resolution) and
      // import files must carry field-id props — the sanctioned producer
      // contract. Asserted once below.
      var replacedOnce = false
      var idlessRefusalSeen = false

      (1 to 40).foreach { step =>
        val op = r.nextInt(23) match {
          case 0 | 1 | 2 | 3 => // INSERT a fresh batch (explicit column
            // list: post-add-column inserts take the write-default for d)
            val n = 5 + r.nextInt(20)
            val rows = (0 until n).map { _ =>
              val k = nextId; nextId += 1
              val v = r.nextInt(1000).toLong
              model(k) = v
              if (dDeclared) dModel(k) = dWrite
              s"($k, $v)"
            }
            spark.sql(
              s"INSERT INTO $tbl (k, $vName) VALUES ${rows.mkString(", ")}")
            s"insert($n)"
          case 4 | 5 => // equality DELETE on sampled keys
            if (model.isEmpty) "noop"
            else {
              val keys = r.shuffle(model.keys.toSeq)
                .take(1 + r.nextInt(4))
              keys.foreach { k =>
                model.remove(k); dModel.remove(k); pModel.remove(k) }
              spark.sql(
                s"DELETE FROM $tbl WHERE k IN (${keys.mkString(", ")})")
              s"delete_eq(${keys.mkString(",")})"
            }
          case 6 => // range DELETE (position-delete path)
            if (nextId < 4) "noop"
            else {
              val a = math.abs(r.nextLong()) % nextId
              val b = math.min(nextId, a + 1 + r.nextInt(10))
              (a until b).foreach { k =>
                model.remove(k); dModel.remove(k); pModel.remove(k) }
              spark.sql(s"DELETE FROM $tbl WHERE k >= $a AND k < $b")
              s"delete_range($a,$b)"
            }
          case 7 | 8 => // UPDATE a residue class
            val m = 2 + r.nextInt(4)
            val rem = r.nextInt(m)
            val bump = 1 + r.nextInt(100)
            val touched = model.keys.filter(k => k % m == rem)
            touched.foreach(k => model(k) = model(k) + bump)
            spark.sql(
              s"UPDATE $tbl SET $vName = $vName + $bump WHERE k % $m = $rem")
            if (touched.isEmpty) "noop_update" else s"update($m,$rem)"
          case 9 => // compact: state must not move
            IcebergWriter.compact(spark, dir)
            "compact"
          case 10 => // INSERT OVERWRITE: table truncates to the batch
            val n = 3 + r.nextInt(8)
            model.clear(); dModel.clear(); pModel.clear()
            val rows = (0 until n).map { _ =>
              val k = nextId; nextId += 1
              val v = r.nextInt(1000).toLong
              model(k) = v
              if (dDeclared) dModel(k) = dWrite
              s"($k, $v)"
            }
            spark.sql(
              s"INSERT OVERWRITE TABLE $tbl (k, $vName) VALUES " +
                rows.mkString(", "))
            s"overwrite($n)"
          case 12 => // import a foreign AVRO file: full MoR citizen, so
                     // every later op (range delete, update, compact,
                     // rollback) must hold on the mixed-format table
            val n = 4 + r.nextInt(10)
            val rows = (0 until n).map { _ =>
              val k = nextId; nextId += 1
              val v = r.nextInt(1000).toLong
              model(k) = v
              (k, v)
            }
            // post-replace the current column names carry FRESH field
            // ids: id-less files refuse at import (their name resolution
            // is ambiguous against the pre-replace history), so the
            // producer stamps avro field-id props — the Iceberg writer
            // contract. Pre-replace the import stays id-less, keeping
            // the name-mapped read path under fuzz.
            val fids = new IcebergTable(dir, conf).metadata.fieldIds
            def fieldJson(n: String): String =
              if (!replacedOnce) s"""{"name":"$n","type":"long"}"""
              else s"""{"name":"$n","type":"long","field-id":${fids(n)}}"""
            val schema = new org.apache.avro.Schema.Parser().parse(
              s"""{"type":"record","name":"r","fields":[
                 |${fieldJson("k")},
                 |${fieldJson(vName)}]}""".stripMargin)
            val af = new java.io.File(
              s"/root/repo/target/lcfuzz-src/fz$seed-$step.avro")
            af.getParentFile.mkdirs()
            val w = new org.apache.avro.file.DataFileWriter[
                org.apache.avro.generic.GenericRecord](
              new org.apache.avro.generic.GenericDatumWriter[
                org.apache.avro.generic.GenericRecord](schema))
            w.create(schema, af)
            rows.foreach { case (k, v) =>
              val rec = new org.apache.avro.generic.GenericData.Record(schema)
              rec.put("k", k); rec.put(vName, v)
              w.append(rec)
            }
            w.close()
            if (replacedOnce && !idlessRefusalSeen) {
              // the id-less twin of this import must refuse LOUDLY on
              // the id-shifted table (silently reading NULL was the bug
              // class this guard closes)
              idlessRefusalSeen = true
              val idless = new org.apache.avro.Schema.Parser().parse(
                s"""{"type":"record","name":"r","fields":[
                   |{"name":"k","type":"long"},
                   |{"name":"$vName","type":"long"}]}""".stripMargin)
              val badF = new java.io.File(
                s"/root/repo/target/lcfuzz-src/fz$seed-$step-idless.avro")
              val bw = new org.apache.avro.file.DataFileWriter[
                  org.apache.avro.generic.GenericRecord](
                new org.apache.avro.generic.GenericDatumWriter[
                  org.apache.avro.generic.GenericRecord](idless))
              bw.create(idless, badF)
              val rec = new org.apache.avro.generic.GenericData.Record(idless)
              rec.put("k", -1L); rec.put(vName, -1L)
              bw.append(rec); bw.close()
              val er = intercept[Exception] {
                IcebergWriter.addFiles(spark, dir, Seq(badF.getAbsolutePath))
              }
              assert(er.getMessage.contains("field ids"),
                s"seed=$seed step $step: id-less import on an id-shifted " +
                  s"table must refuse: $er")
            }
            IcebergWriter.addFiles(spark, dir, Seq(af.getAbsolutePath))
            // copy-on-write rewrites refuse name-mapped (id-less) files;
            // the CoW seed follows the documented recipe — compact to
            // re-stamp field ids — so later UPDATEs stay exercisable
            if (!morUpdate) IcebergWriter.compact(spark, dir)
            avroImports += 1
            s"avro_import($n)"
          case 13 => // schema RENAME of the value column: values and
                     // history must be untouched; field-id resolution
                     // (parquet) and name mapping (orc/avro imports)
                     // keep every older file readable
            val nn = s"v$step"
            spark.sql(s"ALTER TABLE $tbl RENAME COLUMN $vName TO $nn")
            vName = nn
            renames += 1
            s"rename($nn)"
          case 14 => // partition evolution (once): metadata-only commit,
                     // later inserts fan out under the new spec, old
                     // files keep scanning
            if (evolved) "noop"
            else {
              spark.sql(s"ALTER TABLE $tbl ADD PARTITION FIELD bucket(4, k)")
              evolved = true
              evolutions += 1
              "evolve_partition"
            }
          case 15 => // branch WAP cycle: create + staged write, then
                     // either publish via fast_forward (model takes the
                     // batch) or ABANDON (main must never see the rows)
            if (nextId == 0) "noop" // a branch needs a snapshot to anchor
            else {
            val b = s"b$step"
            spark.sql(s"ALTER TABLE $tbl CREATE BRANCH $b")
            val n = 3 + r.nextInt(8)
            val rows = (0 until n).map { _ =>
              val k = nextId; nextId += 1
              (k, r.nextInt(1000).toLong)
            }
            spark.conf.set("spark.wap.branch", b)
            try spark.sql(s"INSERT INTO $tbl (k, $vName) VALUES " +
              rows.map { case (k, v) => s"($k, $v)" }.mkString(", "))
            finally spark.conf.unset("spark.wap.branch")
            // coverage nudge: the r19 op-mix reshuffle starved the
            // abandon outcome — once a publish has fired, the next WAP
            // firing abandons if no abandon has yet; otherwise random
            if (r.nextBoolean() &&
                !(branchAbandons == 0 && branchPublishes >= 2)) {
              spark.sql(s"CALL lcf.system.fast_forward(" +
                s"table => 'ns.fz$seed', branch => 'main', to => '$b')")
              rows.foreach { case (k, v) =>
                model(k) = v
                if (dDeclared) dModel(k) = dWrite
              }
              branchPublishes += 1
              s"wap_publish($b,$n)"
            } else {
              branchAbandons += 1
              s"wap_abandon($b,$n)" // model unchanged — the gate IS that
                                    // checkHead still matches
            }
            }
          case 11 => // rollback to a random recorded snapshot (schema is
            // NOT snapshot-scoped: rows of pre-add snapshots read the
            // current schema and serve the initial-default for d)
            if (history.isEmpty) "noop"
            else {
              val (sid, want, wantD, wantP, _) = history(r.nextInt(history.size))
              spark.sql(s"CALL lcf.system.rollback_to_snapshot(" +
                s"table => 'ns.fz$seed', snapshot_id => $sid)")
              model.clear(); model ++= want
              dModel.clear(); dModel ++= wantD
              pModel.clear(); pModel ++= wantP
              s"rollback($sid)"
            }
          case 16 => // v3 default-column lifecycle: first firing declares
            // v3 (the live-upgrade flow) and adds a defaulted column —
            // metadata-only, pre-add files serve the initial-default;
            // later firings move the WRITE default (initial is immutable)
            if (!dDeclared) {
              if (!isV3) spark.sql(
                s"ALTER TABLE $tbl SET TBLPROPERTIES ('format-version' = '3')")
              isV3 = true
              dInit = 100L + r.nextInt(900); dWrite = dInit
              spark.sql(s"ALTER TABLE $tbl ADD COLUMN d BIGINT DEFAULT $dInit")
              dDeclared = true
              defaultOps += 1
              s"add_default_col($dInit)"
            } else {
              dWrite = 100L + r.nextInt(900)
              spark.sql(s"ALTER TABLE $tbl ALTER COLUMN d SET DEFAULT $dWrite")
              defaultOps += 1
              s"set_default($dWrite)"
            }
          case 17 => // v3 VARIANT column lifecycle: first firing flips v3
            // (if needed) and adds the column — pre-add rows and
            // explicit-column-list inserts read NULL; later firings
            // write per-row JSON payloads through a merge-on-read UPDATE
            // (variant rides the reinsert path) and the model compares
            // them through to_json
            if (!pDeclared) {
              if (!isV3) spark.sql(
                s"ALTER TABLE $tbl SET TBLPROPERTIES ('format-version' = '3')")
              isV3 = true
              spark.sql(s"ALTER TABLE $tbl ADD COLUMN p VARIANT")
              pDeclared = true
              variantOps += 1
              "add_variant_col"
            } else {
              val m = 2 + r.nextInt(4)
              val rem = r.nextInt(m)
              val tag = r.nextInt(1000)
              val touched = model.keys.filter(k => k % m == rem)
              // variant metadata dictionaries SORT keys, so to_json
              // renders them sorted regardless of construction order
              touched.foreach(k => pModel(k) = s"""{"k":$k,"t":$tag}""")
              spark.sql(
                s"""UPDATE $tbl SET p = parse_json(
                   |  concat('{"t": $tag, "k": ', k, '}'))
                   |WHERE k % $m = $rem""".stripMargin)
              variantOps += 1
              if (touched.isEmpty) "noop_variant" else s"set_variant($m,$rem)"
            }
          case 18 => // partition-statistics lifecycle: validate whatever
            // entry the incremental chain left for the CURRENT snapshot
            // against a from-scratch rollup (the chain's correctness
            // invariant), then (re-)bootstrap with the procedure — the
            // random mix breaks the chain (deletes, overwrites,
            // rollbacks) and appends must extend it again afterwards
            if (new IcebergTable(dir, conf).metadata.currentSnapshotId
                .forall(_ == -1L)) "noop"
            else {
              if (!statsDeclared) {
                spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
                  s"'${graft.iceberg.PartitionStats.Prop}' = 'true')")
                statsDeclared = true
              }
              val t0 = new IcebergTable(dir, conf)
              def shape(e: graft.iceberg.PartitionStats.Entry) =
                (e.partitionRepr, e.specId, e.dataFileCount,
                  e.dataRecordCount, e.totalDataFileSizeInBytes,
                  e.posDeleteFileCount, e.posDeleteRecordCount,
                  e.eqDeleteFileCount, e.eqDeleteRecordCount)
              t0.metadata.partitionStatistics
                .find(e => t0.metadata.currentSnapshotId.contains(e.snapshotId))
                .foreach { entry =>
                  val chain = graft.iceberg.PartitionStats
                    .readFile(spark, entry.path).map(shape).sortBy(_.toString)
                  val full = graft.iceberg.PartitionStats
                    .rollup(t0).map(shape).sortBy(_.toString)
                  assert(chain == full,
                    s"seed=$seed step $step: incremental partition-stats " +
                      s"chain drifted from the from-scratch rollup:\n " +
                      s"chain=$chain\n full=$full")
                }
              // r18: unpartitioned tables REFUSE the procedure (the spec
              // file schema requires the partition tuple field) and the
              // incremental chain must have stayed empty; partitioned
              // (post-evolution) tables bootstrap as before
              if (graft.iceberg.PartitionStats
                  .unifiedPartitionType(t0.metadata).fields.isEmpty) {
                assert(t0.metadata.partitionStatistics.isEmpty,
                  s"seed=$seed step $step: unpartitioned table must keep " +
                    "no partition-stats chain")
                val e = intercept[Exception] {
                  spark.sql(s"CALL lcf.system.compute_partition_stats(" +
                    s"table => 'ns.fz$seed')")
                }
                assert(e.getMessage.contains("partitioned table"),
                  s"seed=$seed step $step: ${e.getMessage}")
                statsOps += 1
                "partition_stats_refused"
              } else {
                spark.sql(s"CALL lcf.system.compute_partition_stats(" +
                  s"table => 'ns.fz$seed')")
                statsOps += 1
                "partition_stats"
              }
            }
          case 19 => // geometry side fixture (read-only surface): first
            // firing adopts an external-shape geo table (WKB written as
            // binary, metadata re-declared geometry); every firing
            // re-reads the WKB bit-exactly and re-asserts write refusal
            // under whatever session state the random mix left behind
            geoOps += 1
            if (geoDir.isEmpty) {
              val gtbl = s"lcf.ns.geo$seed"
              val gdir = s"$warehouse/ns/geo$seed"
              spark.sql(s"DROP TABLE IF EXISTS $gtbl")
              spark.sql(s"CREATE TABLE $gtbl (k BIGINT, geom BINARY)")
              val rows = (0 until 3).map { i =>
                val wkb = (Array[Byte](1, 1, 0, 0, 0) ++
                  Array.fill(16)((seed % 97 + i).toByte)).toSeq
                geoModel(i.toLong) = wkb
                (i.toLong, wkb.toArray)
              }
              import spark.implicits._
              rows.toDF("k", "geom").createOrReplaceTempView(s"geo_fz_$seed")
              spark.sql(s"INSERT INTO $gtbl SELECT k, geom FROM geo_fz_$seed")
              val fs = new Path(gdir).getFileSystem(conf)
              val latest = graft.iceberg.TableMetadata
                .latestMetadataPath(gdir, conf)
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
                .foreach(_.asInstanceOf[
                  com.fasterxml.jackson.databind.node.ObjectNode]
                  .put("type", "geometry"))
              val ver = latest.getName.stripPrefix("v")
                .stripSuffix(".metadata.json").toLong
              val out = fs.create(
                new Path(s"$gdir/metadata/v${ver + 1}.metadata.json"))
              try out.write(mapper.writeValueAsBytes(root)) finally out.close()
              geoDir = Some(gdir)
              "geo_adopt"
            } else {
              val t = new IcebergTable(geoDir.get, conf)
              val got = t.toDF(spark).collect()
                .map(row => row.getLong(0) ->
                  row.getAs[Array[Byte]]("geom").toSeq).toMap
              assert(got == geoModel.toMap,
                s"seed=$seed step $step: geo WKB drifted: $got")
              import spark.implicits._
              // r18: ENGINE writes are supported (bbox POINT bounds) —
              // append a fresh valid WKB point and fold it into the model
              val nk = 100L + geoOps
              val wkb = (Array[Byte](1, 1, 0, 0, 0) ++
                Array.fill(16)((seed % 89 + geoOps).toByte)).toSeq
              graft.iceberg.IcebergWriter.append(spark, geoDir.get,
                Seq((nk, wkb.toArray)).toDF("k", "geom"))
              geoModel(nk) = wkb
              val got2 = new IcebergTable(geoDir.get, conf).toDF(spark)
                .collect().map(row => row.getLong(0) ->
                  row.getAs[Array[Byte]]("geom").toSeq).toMap
              assert(got2 == geoModel.toMap,
                s"seed=$seed step $step: geo WKB after engine write: $got2")
              // exotic WKB kinds still refuse loudly (never a guessed
              // bound): an EWKB-flagged point fails the write task (ISO
              // Z/M kinds write since r19 — the x/y box strides them)
              val ge = intercept[Exception] {
                graft.iceberg.IcebergWriter.append(spark, geoDir.get,
                  Seq((999L, java.nio.ByteBuffer.allocate(21)
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                    .put(1.toByte).putInt(0x80000001).putDouble(1)
                    .putDouble(2).array())).toDF("k", "geom"))
              }
              assert(Iterator.iterate(ge: Throwable)(_.getCause)
                .takeWhile(_ != null)
                .exists(x => Option(x.getMessage).exists(_.contains("WKB"))),
                "exotic WKB write must refuse")
              "geo_check"
            }
          case 20 => // purge-vs-clone under random interleaving (the r17
            // purge contract): DROP TABLE PURGE on a snapshot clone
            // refuses on gc.enabled=false and harms nothing; a plain
            // purge really deletes the table directory
            purgeCloneOps += 1
            val pname = s"pg${seed}_$step"
            spark.sql(s"CREATE TABLE lcf.ns.$pname (k BIGINT)")
            spark.sql(s"INSERT INTO lcf.ns.$pname VALUES (1), (2)")
            spark.sql(s"CALL lcf.system.snapshot(" +
              s"source_table => 'ns.$pname', table => 'ns.${pname}_c')")
            val pe = intercept[Exception] {
              spark.sql(s"DROP TABLE lcf.ns.${pname}_c PURGE")
            }
            assert(Iterator.iterate(pe: Throwable)(_.getCause)
              .takeWhile(_ != null).exists(x =>
                Option(x.getMessage).exists(_.contains("gc.enabled"))),
              s"seed=$seed step $step: clone purge must refuse: $pe")
            // the refusal left both tables whole
            assert(spark.sql(s"SELECT COUNT(*) FROM lcf.ns.${pname}_c")
              .head.getLong(0) == 2L, "refused purge must not harm the clone")
            spark.sql(s"DROP TABLE lcf.ns.${pname}_c") // deregister only
            spark.sql(s"DROP TABLE lcf.ns.$pname PURGE")
            val pdir = new Path(s"$warehouse/ns/$pname")
            assert(!pdir.getFileSystem(conf).exists(pdir),
              s"seed=$seed step $step: purge must delete the table dir")
            "purge_clone"
          case 21 | 22 => // atomic CREATE OR REPLACE TABLE AS SELECT (r19,
            // StagingTableCatalog): the whole table resets to the SELECT
            // in ONE staged swap. Half the firings interleave a RIVAL
            // INSERT between stage and publish: the publish must
            // 409-retry with a re-sequenced snapshot id (replace-wins)
            // — except on a v3 table, where the rival advanced
            // next-row-id past the staged manifests' assigned ranges and
            // the publish must ABORT loudly, leaving the rival's state.
            replaceOps += 1
            val n = 3 + r.nextInt(10)
            val pairs = (0 until n).map { _ =>
              val k = nextId; nextId += 1; (k, r.nextInt(1000).toLong)
            }
            val rival = r.nextBoolean()
            def resetTo(rows: Seq[(Long, Long)]): Unit = {
              model.clear(); dModel.clear(); pModel.clear()
              rows.foreach { case (k, v) => model(k) = v }
              dDeclared = false; pDeclared = false; vName = "v"
              replacedOnce = true
              // pre-replace snapshots read under their OWN schema
              // (possibly renamed/extra columns) — the tail replay's
              // fixed column list cannot address them, and rollback
              // across a replace boundary is not modeled
              history.clear()
            }
            if (!rival) {
              spark.sql(
                s"""CREATE OR REPLACE TABLE $tbl AS
                   |SELECT CAST(c1 AS BIGINT) AS k, CAST(c2 AS BIGINT) AS v
                   |FROM VALUES ${pairs.map(p => s"(${p._1}, ${p._2})")
                     .mkString(", ")} AS t(c1, c2)""".stripMargin)
              resetTo(pairs)
              s"replace($n)"
            } else {
              replaceRivals += 1
              val c = spark.sessionState.catalogManager.catalog("lcf")
                .asInstanceOf[GraftCatalog]
              val ident = org.apache.spark.sql.connector.catalog.Identifier
                .of(Array("ns"), s"fz$seed")
              val staged = c.stageReplace(ident,
                new org.apache.spark.sql.types.StructType()
                  .add("k", org.apache.spark.sql.types.LongType)
                  .add("v", org.apache.spark.sql.types.LongType),
                Array.empty, new java.util.HashMap[String, String]())
                .asInstanceOf[graft.iceberg.connector.GraftStagedTable]
              import spark.implicits._
              IcebergWriter.append(spark, staged.stagedDirForTest,
                pairs.toDF("k", "v"),
                committer = Some(staged.committerForTest))
              val rk = nextId; nextId += 1
              spark.sql(s"INSERT INTO $tbl (k, $vName) VALUES ($rk, 1)")
              if (isV3) {
                val e = intercept[Exception] { staged.commitStagedChanges() }
                assert(Iterator.iterate(e: Throwable)(_.getCause)
                  .takeWhile(_ != null).exists(x => Option(x.getMessage)
                    .exists(_.contains("next-row-id"))),
                  s"seed=$seed step $step: v3 replace-vs-rival must " +
                    s"abort on the row-id range: $e")
                model(rk) = 1L
                if (dDeclared) dModel(rk) = dWrite
                s"replace_rival_v3_abort($n)"
              } else {
                staged.commitStagedChanges()
                resetTo(pairs)
                s"replace_rival($n)"
              }
            }
        }
        checkHead(s"step $step: $op")
        val sid = headSnapshot()
        if (op != "noop" && sid > 0)
          history += ((sid, model.toMap, dModel.toMap, pModel.toMap, vName))
      }

      // time-travel coherence: every recorded snapshot still reads the
      // state the model had at its commit (dedup: later ops may re-pin
      // the same snapshot id after noops)
      history.distinctBy(_._1).foreach { case (sid, want, _, _, vAt) =>
        val got = spark.sql(
          s"SELECT k, $vAt FROM $tbl VERSION AS OF $sid ORDER BY k")
          .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
        assert(got == want,
          s"seed=$seed snapshot $sid drifted: ${got.size} rows vs " +
            s"model ${want.size}")
      }
      spark.sql(s"DROP TABLE $tbl")
    }
    assert(avroImports >= 2,
      s"the seeded op mix must exercise avro imports, fired $avroImports")
    assert(renames >= 2, s"op mix must exercise schema renames: $renames")
    assert(evolutions >= 1,
      s"op mix must exercise partition evolution: $evolutions")
    assert(branchPublishes >= 1 && branchAbandons >= 1,
      s"op mix must exercise both WAP outcomes: " +
        s"published=$branchPublishes abandoned=$branchAbandons")
    // threshold 1 since the r19 replace-op reshuffle of the seeded
    // stream (the dedicated default-value gates live in FormatV3Spec)
    assert(defaultOps >= 1,
      s"op mix must exercise the default-column lifecycle: $defaultOps")
    assert(variantOps >= 2,
      s"op mix must exercise the variant-column lifecycle: $variantOps")
    assert(statsOps >= 2,
      s"op mix must exercise partition-statistics maintenance: $statsOps")
    assert(purgeCloneOps >= 1,
      s"op mix must exercise purge-vs-clone: $purgeCloneOps")
    assert(geoOps >= 2,
      s"op mix must exercise the geometry read surface: $geoOps")
    assert(replaceOps >= 2 && replaceRivals >= 1,
      s"op mix must exercise atomic REPLACE (incl. a rival interleaving): " +
        s"fired=$replaceOps rivals=$replaceRivals")
  }

  test("v3 row lineage is a MODEL INVARIANT across random lifecycle ops: " +
      "a key's _row_id never changes, ids are never reused") {
    val conf = spark.sessionState.newHadoopConf()
    spark.conf.set("spark.sql.catalog.lcf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lcf.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lcf.ns")
    // one copy-on-write seed, one merge-on-read seed: BOTH rewrite
    // families must hold the invariant (CoW materializes _row_id into
    // replacement files; MoR reinserts carry it through the delta
    // metadata projection)
    Seq((777L, false), (778L, true)).foreach { case (seed, mor) =>
      val tbl = s"lcf.ns.v3fz$seed"
      val dir = s"$warehouse/ns/v3fz$seed"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val modes =
        if (mor) ", 'write.update.mode' = 'merge-on-read'" +
          ", 'write.merge.mode' = 'merge-on-read'"
        else ""
      spark.sql(
        s"CREATE TABLE $tbl (k BIGINT, v BIGINT) " +
          s"TBLPROPERTIES ('format-version' = '3'$modes)")
      val r = new scala.util.Random(seed)
      val model = scala.collection.mutable.Map.empty[Long, Long]
      // keys are globally unique (nextId monotone), so lineage has one
      // rule: once key k is served with _row_id i, every later read of k
      // serves i — across UPDATE, MERGE, CoW DELETE, compaction — and no
      // id is ever served for two different keys.
      val everSeen = scala.collection.mutable.Map.empty[Long, Long]
      val usedIds = scala.collection.mutable.Map.empty[Long, Long] // id -> k
      var nextId = 0L
      def checkLineage(op: String): Unit = {
        val got = spark.sql(s"SELECT k, v, _row_id FROM $tbl").collect()
          .map(row => (row.getLong(0), row.getLong(1),
            if (row.isNullAt(2)) None else Some(row.getLong(2)))).toSeq
        assert(got.map(g => g._1 -> g._2).toMap == model.toMap,
          s"seed=$seed after $op: data drift")
        got.foreach { case (k, _, idOpt) =>
          assert(idOpt.isDefined, s"seed=$seed after $op: k=$k null _row_id")
          val id = idOpt.get
          everSeen.get(k) match {
            case Some(prev) => assert(prev == id,
              s"seed=$seed after $op: k=$k _row_id drifted $prev -> $id")
            case None =>
              val prior = usedIds.get(id)
              assert(prior.isEmpty,
                s"seed=$seed after $op: fresh key k=$k reuses _row_id " +
                  s"$id of k=$prior")
              everSeen(k) = id
              usedIds(id) = k
          }
        }
      }
      def compactIfDeletes(): Unit =
        if (!mor && new IcebergTable(dir, conf).hasDeletes)
          IcebergWriter.compact(spark, dir)
      (1 to 30).foreach { step =>
        val op = r.nextInt(10) match {
          case 0 | 1 | 2 => // INSERT fresh keys: new contiguous id range
            val n = 5 + r.nextInt(15)
            val rows = (0 until n).map { _ =>
              val k = nextId; nextId += 1
              val v = r.nextInt(1000).toLong; model(k) = v; s"($k, $v)"
            }
            spark.sql(s"INSERT INTO $tbl VALUES ${rows.mkString(", ")}")
            s"insert($n)"
          case 3 | 4 => // CoW UPDATE (compact first if DVs outstanding —
                        // the documented copy-on-write precondition)
            val m = 2 + r.nextInt(4); val rem = r.nextInt(m)
            val bump = 1 + r.nextInt(50)
            compactIfDeletes()
            model.keys.filter(_ % m == rem)
              .foreach(k => model(k) = model(k) + bump)
            spark.sql(s"UPDATE $tbl SET v = v + $bump WHERE k % $m = $rem")
            s"cow_update($m,$rem)"
          case 5 => // equality DELETE (merge-on-read, survivors untouched)
            if (model.isEmpty) "noop"
            else {
              val keys = r.shuffle(model.keys.toSeq).take(1 + r.nextInt(3))
              keys.foreach(model.remove)
              spark.sql(s"DELETE FROM $tbl WHERE k IN (${keys.mkString(", ")})")
              s"delete_eq(${keys.size})"
            }
          case 6 => // CoW range DELETE: survivors of rewritten files keep ids
            if (nextId < 4) "noop"
            else {
              val a = math.abs(r.nextLong()) % nextId
              val b = math.min(nextId, a + 1 + r.nextInt(8))
              compactIfDeletes()
              (a until b).foreach(model.remove)
              spark.sql(s"DELETE FROM $tbl WHERE k >= $a AND k < $b")
              s"delete_range($a,$b)"
            }
          case 7 => // MERGE: matched rows preserve, inserts take fresh ids
            if (model.isEmpty) "noop"
            else {
              compactIfDeletes()
              val hitLo = math.abs(r.nextLong()) % nextId
              val hitHi = math.min(nextId, hitLo + 3)
              val insN = 2 + r.nextInt(4)
              val ins = (0 until insN).map { _ =>
                val k = nextId; nextId += 1
                val v = r.nextInt(1000).toLong; model(k) = v; (k, v)
              }
              val matched = (hitLo until hitHi).filter(model.contains)
              matched.foreach(k => model(k) = model(k) * 2)
              val srcRows = (matched.map(k => (k, 0L)) ++ ins)
                .map { case (k, v) => s"($k, $v)" }
              spark.sql(
                s"""MERGE INTO $tbl t USING
                   |(SELECT * FROM VALUES ${srcRows.mkString(", ")}
                   |  AS s(k, v)) s ON t.k = s.k
                   |WHEN MATCHED THEN UPDATE SET t.v = t.v * 2
                   |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
                  .stripMargin)
              s"merge($hitLo,$hitHi,+$insN)"
            }
          case 8 => // compact: pure rewrite, every id must survive
            IcebergWriter.compact(spark, dir)
            "compact"
          case 9 => // INSERT OVERWRITE: all keys replaced by fresh ones
            val n = 3 + r.nextInt(6)
            model.clear()
            val rows = (0 until n).map { _ =>
              val k = nextId; nextId += 1
              val v = r.nextInt(1000).toLong; model(k) = v; s"($k, $v)"
            }
            spark.sql(
              s"INSERT OVERWRITE TABLE $tbl VALUES ${rows.mkString(", ")}")
            s"overwrite($n)"
        }
        checkLineage(s"step $step: $op")
      }
      // END-OF-RUN CDC REPLAY: the paired update stream over the WHOLE
      // window must reconstruct the final table exactly — inserts add,
      // deletes remove, update_after replaces by _row_id, and dropped
      // carryovers must not be missed state. This closes the loop
      // between the lineage invariant (ids stable) and the changelog
      // built ON those ids.
      val head = new IcebergTable(dir, conf).metadata.snapshotLineage.last
      val stream = new IcebergTable(dir, conf)
        .changesWithUpdates(spark, 0L, head)
        .select("k", "v", "_row_id", "_change_type", "_change_ordinal")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getInt(4)))
        .sortBy(_._5)
      val replay = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      stream.foreach {
        case (k, v, rid, "insert", _) => replay(rid) = (k, v)
        case (_, _, rid, "delete", _) => replay.remove(rid)
        case (k, v, rid, "update_after", _) => replay(rid) = (k, v)
        case (_, _, _, "update_before", _) => ()
        case other => fail(s"unexpected change row: $other")
      }
      assert(replay.values.toMap == model.toMap,
        s"seed=$seed: CDC replay of the update stream must equal the " +
          s"final table (${replay.size} vs ${model.size} rows; " +
          s"diff=${(replay.values.toSet diff model.toSet).take(5)})")
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("v2 identifier-field CDC pairing is a MODEL INVARIANT across " +
      "random lifecycle ops: replaying the paired stream by key " +
      "reconstructs the final table exactly") {
    val conf = spark.sessionState.newHadoopConf()
    spark.conf.set("spark.sql.catalog.lcf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lcf.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lcf.ns")
    // the v3 fuzz's rewrite mix, replayed on the v2 INSTALLED-BASE
    // pairing: identity comes from declared identifier fields, not
    // row lineage. One CoW seed, one MoR seed — both rewrite families.
    Seq((881L, false), (882L, true)).foreach { case (seed, mor) =>
      val tbl = s"lcf.ns.v2fz$seed"
      val dir = s"$warehouse/ns/v2fz$seed"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val modes =
        if (mor) ", 'write.update.mode' = 'merge-on-read'" +
          ", 'write.merge.mode' = 'merge-on-read'" +
          ", 'write.delete.mode' = 'merge-on-read'"
        else ""
      spark.sql(
        s"CREATE TABLE $tbl (k BIGINT NOT NULL, v BIGINT) " +
          s"TBLPROPERTIES ('write.owner' = 'fuzz'$modes)")
      spark.sql(s"ALTER TABLE $tbl SET IDENTIFIER FIELDS k")
      val r = new scala.util.Random(seed)
      val model = scala.collection.mutable.Map.empty[Long, Long]
      var nextId = 0L
      def checkState(op: String): Unit = {
        val got = spark.sql(s"SELECT k, v FROM $tbl").collect()
          .map(row => row.getLong(0) -> row.getLong(1)).toMap
        assert(got == model.toMap, s"seed=$seed after $op: data drift " +
          s"(${got.size} vs ${model.size})")
      }
      def compactIfDeletes(): Unit =
        if (!mor && new IcebergTable(dir, conf).hasDeletes)
          IcebergWriter.compact(spark, dir)
      (1 to 25).foreach { step =>
        val op = r.nextInt(9) match {
          case 0 | 1 | 2 =>
            val n = 5 + r.nextInt(15)
            val rows = (0 until n).map { _ =>
              val k = nextId; nextId += 1
              val v = r.nextInt(1000).toLong; model(k) = v; s"($k, $v)"
            }
            spark.sql(s"INSERT INTO $tbl VALUES ${rows.mkString(", ")}")
            s"insert($n)"
          case 3 | 4 =>
            val m = 2 + r.nextInt(4); val rem = r.nextInt(m)
            val bump = 1 + r.nextInt(50)
            compactIfDeletes()
            model.keys.filter(_ % m == rem)
              .foreach(k => model(k) = model(k) + bump)
            spark.sql(s"UPDATE $tbl SET v = v + $bump WHERE k % $m = $rem")
            s"update($m,$rem)"
          case 5 =>
            if (model.isEmpty) "noop"
            else {
              val keys = r.shuffle(model.keys.toSeq).take(1 + r.nextInt(3))
              keys.foreach(model.remove)
              spark.sql(s"DELETE FROM $tbl WHERE k IN (${keys.mkString(", ")})")
              s"delete_eq(${keys.size})"
            }
          case 6 =>
            if (model.isEmpty) "noop"
            else {
              compactIfDeletes()
              val hitLo = math.abs(r.nextLong()) % nextId
              val hitHi = math.min(nextId, hitLo + 3)
              val insN = 2 + r.nextInt(4)
              val ins = (0 until insN).map { _ =>
                val k = nextId; nextId += 1
                val v = r.nextInt(1000).toLong; model(k) = v; (k, v)
              }
              val matched = (hitLo until hitHi).filter(model.contains)
              matched.foreach(k => model(k) = model(k) * 2)
              val srcRows = (matched.map(k => (k, 0L)) ++ ins)
                .map { case (k, v) => s"($k, $v)" }
              spark.sql(
                s"""MERGE INTO $tbl t USING
                   |(SELECT * FROM VALUES ${srcRows.mkString(", ")}
                   |  AS s(k, v)) s ON t.k = s.k
                   |WHEN MATCHED THEN UPDATE SET t.v = t.v * 2
                   |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
                  .stripMargin)
              s"merge($hitLo,$hitHi,+$insN)"
            }
          case 7 =>
            IcebergWriter.compact(spark, dir)
            "compact"
          case 8 =>
            val n = 3 + r.nextInt(6)
            model.clear()
            val rows = (0 until n).map { _ =>
              val k = nextId; nextId += 1
              val v = r.nextInt(1000).toLong; model(k) = v; s"($k, $v)"
            }
            spark.sql(
              s"INSERT OVERWRITE TABLE $tbl VALUES ${rows.mkString(", ")}")
            s"overwrite($n)"
        }
        checkState(s"step $step: $op")
      }
      // END-OF-RUN: replay the identifier-paired stream BY KEY (keys are
      // globally unique in the op mix, so key identity == row identity)
      val head = new IcebergTable(dir, conf).metadata.snapshotLineage.last
      val stream = new IcebergTable(dir, conf)
        .changesWithUpdates(spark, 0L, head)
        .select("k", "v", "_change_type", "_change_ordinal")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
        .sortBy(_._4)
      val replay = scala.collection.mutable.Map.empty[Long, Long]
      stream.foreach {
        case (k, v, "insert", _) => replay(k) = v
        case (k, _, "delete", _) => replay.remove(k)
        case (k, v, "update_after", _) => replay(k) = v
        case (_, _, "update_before", _) => ()
        case other => fail(s"unexpected change row: $other")
      }
      assert(replay.toMap == model.toMap,
        s"seed=$seed: v2 identifier CDC replay must equal the final " +
          s"table (${replay.size} vs ${model.size} rows; " +
          s"diff=${(replay.toSet diff model.toSet).take(5)})")
      spark.sql(s"DROP TABLE $tbl")
    }
  }
}
