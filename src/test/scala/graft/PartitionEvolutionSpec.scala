package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import graft.iceberg.{IcebergTable, PartitionEvolution}
import graft.iceberg.connector.GraftCatalog

/** Partition-spec evolution: `ALTER TABLE … ADD/DROP PARTITION FIELD` is a
  * metadata-only commit — no data file moves. Old manifests stay on their
  * old spec (and keep pruning under it); new writes cluster by the new
  * default. The applier owns spec/field-id assignment, so a dropped and
  * re-added field round-trips its field id.
  */
class PartitionEvolutionSpec extends SparkSpec {

  private val wh = "/root/repo/target/test-partevo-warehouse"

  private def freshCatalog(name: String): Unit = {
    new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new Path(wh), true)
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
  }

  private def icebergTable(name: String): IcebergTable =
    new IcebergTable(s"$wh/ns/$name", spark.sessionState.newHadoopConf())

  test("ADD PARTITION FIELD: metadata-only commit, both generations scan") {
    freshCatalog("pevo1")
    spark.sql("CREATE TABLE pevo1.ns.t (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO pevo1.ns.t SELECT id, concat('c', id % 2) FROM range(0, 10)")
    val filesBefore = icebergTable("t").planFiles().map(_.filePath).toSet

    spark.sql("ALTER TABLE pevo1.ns.t ADD PARTITION FIELD bucket(4, k)")

    val metaAfterDdl = icebergTable("t").metadata
    assert(metaAfterDdl.partitionSpecs.keySet == Set(0, 1))
    assert(metaAfterDdl.defaultSpecId == 1)
    assert(metaAfterDdl.partitionSpec.map(f => (f.name, f.transform)) ==
      Seq("cat" -> "identity", "k_bucket" -> "bucket[4]"))
    // DDL touched no data file
    assert(icebergTable("t").planFiles().map(_.filePath).toSet == filesBefore)

    spark.sql("INSERT INTO pevo1.ns.t SELECT id, concat('c', id % 2) FROM range(10, 20)")
    assert(spark.table("pevo1.ns.t").count() == 20L)
    assert(spark.sql("SELECT COUNT(*) FROM pevo1.ns.t WHERE cat = 'c1'")
      .collect()(0).getLong(0) == 10L)

    // each generation's manifests carry THEIR spec id
    val t = icebergTable("t")
    assert(t.manifests.map(_.partitionSpecId).toSet == Set(0, 1))
    // file entries are stamped with the spec that wrote them
    val specIds = t.planFiles().map(_.specId).toSet
    assert(specIds == Set(0, 1), s"file spec ids: $specIds")
  }

  test("old data prunes under the old spec, new data under the new") {
    freshCatalog("pevo2")
    spark.sql("CREATE TABLE pevo2.ns.t (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO pevo2.ns.t SELECT id, concat('c', id % 2) FROM range(0, 20)")
    spark.sql("ALTER TABLE pevo2.ns.t ADD PARTITION FIELD bucket(4, k)")
    spark.sql("INSERT INTO pevo2.ns.t SELECT id, concat('c', id % 2) FROM range(0, 20)")

    val t = icebergTable("t")
    // identity filter on `cat` lives in BOTH specs: non-matching files of
    // BOTH generations are pruned — every kept file is genuinely cat=c0
    val (_, _, keptFiles, totalFiles) =
      t.pruneCounts(Seq(org.apache.spark.sql.sources.EqualTo("cat", "c0")))
    val c0Files = t.planFiles().count(_.partition.get("cat").contains("c0"))
    assert(keptFiles == c0Files && keptFiles < totalFiles,
      s"cat=c0 kept $keptFiles of $totalFiles (expected $c0Files)")

    // bucket filter on `k` exists only in the NEW spec: the transformed
    // filter must not prune OLD-generation files (their spec has no
    // bucket field — only their column bounds may drop them), while
    // new-generation files prune to the matching bucket. Both copies of
    // k=15 come back.
    assert(spark.sql("SELECT COUNT(*) FROM pevo2.ns.t WHERE k = 15")
      .collect()(0).getLong(0) == 2L)
    val keptK = t.planFiles(Seq(org.apache.spark.sql.sources.EqualTo("k", 15L)))
    assert(keptK.exists(_.specId == 0),
      "the old-gen file whose column bounds contain k=15 must survive")
    assert(keptK.size < totalFiles, "bucket pruning should drop new-gen files")
  }

  test("DROP PARTITION FIELD: later writes stop clustering by it; re-add reuses the field id") {
    freshCatalog("pevo3")
    spark.sql("CREATE TABLE pevo3.ns.t (k BIGINT, cat STRING) " +
      "PARTITIONED BY (cat, bucket(4, k))")
    spark.sql("INSERT INTO pevo3.ns.t SELECT id, concat('c', id % 2) FROM range(0, 8)")
    val bucketId = icebergTable("t").metadata.partitionSpec
      .find(_.name == "k_bucket").get.fieldId

    spark.sql("ALTER TABLE pevo3.ns.t DROP PARTITION FIELD bucket(4, k)")
    val afterDrop = icebergTable("t").metadata
    assert(afterDrop.partitionSpec.map(_.name) == Seq("cat"))
    assert(afterDrop.defaultSpecId == 1)

    spark.sql("INSERT INTO pevo3.ns.t SELECT id, concat('c', id % 2) FROM range(8, 16)")
    assert(spark.table("pevo3.ns.t").count() == 16L)

    // re-add: same (source, transform) ⇒ the applier hands back the same
    // partition field id (its manifest values mean the same thing)
    spark.sql("ALTER TABLE pevo3.ns.t ADD PARTITION FIELD bucket(4, k)")
    val reAddedMeta = icebergTable("t").metadata
    val reAdded = reAddedMeta.partitionSpec.find(_.name == "k_bucket").get
    assert(reAdded.fieldId == bucketId,
      s"re-added bucket field id ${reAdded.fieldId} != original $bucketId")
    // the re-added spec is field-identical to the ORIGINAL spec: the
    // applier reuses its id instead of appending a third copy — repeated
    // add/drop cycles must not grow partition-specs or churn default-spec-id
    assert(reAddedMeta.defaultSpecId == 0,
      s"identical re-added spec should reuse spec id 0, got " +
        s"${reAddedMeta.defaultSpecId}")
    assert(reAddedMeta.partitionSpecs.size == 2,
      s"partition-specs should not grow on an identical re-add: " +
        s"${reAddedMeta.partitionSpecs.keySet}")

    // and writes/reads keep working on the reused default spec
    spark.sql("INSERT INTO pevo3.ns.t SELECT id, concat('c', id % 2) FROM range(16, 20)")
    assert(spark.table("pevo3.ns.t").count() == 20L)
  }

  test("compaction after evolution rewrites everything under the new spec") {
    freshCatalog("pevo6")
    spark.sql("CREATE TABLE pevo6.ns.t (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO pevo6.ns.t SELECT id, concat('c', id % 2) FROM range(0, 10)")
    spark.sql("ALTER TABLE pevo6.ns.t ADD PARTITION FIELD bucket(4, k)")
    spark.sql("INSERT INTO pevo6.ns.t SELECT id, concat('c', id % 2) FROM range(10, 20)")
    assert(icebergTable("t").planFiles().map(_.specId).toSet == Set(0, 1))

    // "evolve now, rewrite when convenient": compact re-clusters every
    // row by the CURRENT default spec, so the table is single-spec again
    // (mixed-spec penalties — disabled SPJ grouping, kept-not-pruned old
    // files — end here)
    graft.iceberg.IcebergWriter.compact(spark, s"$wh/ns/t")
    val t = icebergTable("t")
    assert(t.planFiles().map(_.specId).toSet == Set(1),
      "compacted files must all carry the new default spec")
    assert(t.manifests.filter(_.content == 0)
      .forall(_.partitionSpecId == t.metadata.defaultSpecId))
    assert(t.planFiles().forall(_.partition.contains("k_bucket")),
      "compacted files must carry the evolved partition tuple")
    assert(spark.table("pevo6.ns.t").count() == 20L)
  }

  test("DDL refusals: duplicate field, unknown drop, shadowing name, bad source") {
    freshCatalog("pevo4")
    spark.sql("CREATE TABLE pevo4.ns.t (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    val dup = intercept[Exception] {
      spark.sql("ALTER TABLE pevo4.ns.t ADD PARTITION FIELD cat")
    }
    assert(dup.getMessage.contains("already partitioned"))
    val unknown = intercept[Exception] {
      spark.sql("ALTER TABLE pevo4.ns.t DROP PARTITION FIELD bucket(4, k)")
    }
    assert(unknown.getMessage.contains("no partition field matches"))
    val shadow = intercept[Exception] {
      spark.sql("ALTER TABLE pevo4.ns.t ADD PARTITION FIELD bucket(4, k) AS cat")
    }
    assert(shadow.getMessage.contains("conflicts with a schema column") ||
      shadow.getMessage.contains("already used"))
    val badCol = intercept[Exception] {
      spark.sql("ALTER TABLE pevo4.ns.t ADD PARTITION FIELD days(nope)")
    }
    assert(badCol.getMessage.contains("not in schema"))
    val badType = intercept[Exception] {
      spark.sql("ALTER TABLE pevo4.ns.t ADD PARTITION FIELD days(k)")
    }
    assert(badType.getMessage.contains("cannot partition"))
  }

  test("REPLACE PARTITION FIELD swaps in one commit") {
    freshCatalog("pevo7")
    spark.sql("CREATE TABLE pevo7.ns.t (k BIGINT, ts TIMESTAMP, cat STRING) " +
      "PARTITIONED BY (cat, bucket(4, k))")
    val versionsBefore = {
      val fs = new Path(s"$wh/ns/t/metadata").getFileSystem(
        spark.sessionState.newHadoopConf())
      fs.listStatus(new Path(s"$wh/ns/t/metadata"))
        .count(_.getPath.getName.endsWith(".metadata.json"))
    }
    spark.sql("ALTER TABLE pevo7.ns.t REPLACE PARTITION FIELD bucket(4, k) " +
      "WITH bucket(16, k)")
    val meta = icebergTable("t").metadata
    assert(meta.partitionSpec.map(_.transform) == Seq("identity", "bucket[16]"))
    assert(meta.defaultSpecId == 1)
    // ONE commit: exactly one new metadata version
    val fs = new Path(s"$wh/ns/t/metadata").getFileSystem(
      spark.sessionState.newHadoopConf())
    val versionsAfter = fs.listStatus(new Path(s"$wh/ns/t/metadata"))
      .count(_.getPath.getName.endsWith(".metadata.json"))
    assert(versionsAfter == versionsBefore + 1,
      s"REPLACE must be one commit ($versionsBefore -> $versionsAfter)")
    spark.sql("INSERT INTO pevo7.ns.t SELECT id, " +
      "TIMESTAMP'2024-01-01 00:00:00', concat('c', id % 2) FROM range(0, 8)")
    assert(spark.table("pevo7.ns.t").count() == 8L)
    assert(icebergTable("t").planFiles().forall(_.partition.contains("k_bucket")))
  }

  test("concurrent evolutions conflict instead of silently shadowing") {
    freshCatalog("pevo5")
    spark.sql("CREATE TABLE pevo5.ns.t (k BIGINT, ts TIMESTAMP, cat STRING) " +
      "PARTITIONED BY (cat)")
    val dir = s"$wh/ns/t"
    val conf = spark.sessionState.newHadoopConf()
    // both evolutions derive the same next metadata version; the racer
    // that lands second loses the create-new race LOUDLY (and a racer
    // re-reading fresh metadata instead trips assert-default-spec-id)
    val base = new graft.iceberg.FsCommitter(dir, conf) {
      override protected def beforePublish(p: Path): Unit =
        PartitionEvolution.addField(dir, conf, "bucket(8, k)")
    }
    intercept[graft.iceberg.CommitConflictException] {
      PartitionEvolution.addField(dir, conf, "days(ts)", committer = Some(base))
    }
    // the racing winner landed; a retry from fresh metadata succeeds
    PartitionEvolution.addField(dir, conf, "days(ts)")
    val spec = icebergTable("t").metadata.partitionSpec
    assert(spec.map(_.name).toSet == Set("cat", "k_bucket", "ts_day"))
  }
}
