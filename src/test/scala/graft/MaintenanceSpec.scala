package graft

import java.io.File

import org.apache.commons.io.FileUtils

import graft.iceberg.{IcebergTable, IcebergWriter}

/** Table maintenance: snapshot expiration + orphan-file cleanup — the
  * other half of the streaming-sink/compaction story (one snapshot per
  * micro-batch is unbounded metadata growth until something expires it).
  * Pinned contracts:
  *  - expiration is reachability-based: a file shared with ANY retained
  *    snapshot survives, even if an expired snapshot also references it;
  *  - the current snapshot and `retainLast` most recent always survive;
  *  - retained history still reads green and time-travels; expired
  *    snapshots become unknown ids (fail fast, not silent empties).
  */
class MaintenanceSpec extends SparkSpec {

  private def freshTable(dir: String, cols: String = "id BIGINT, tag STRING"): Unit = {
    FileUtils.deleteQuietly(new File(dir))
    import spark.implicits._
    val seed = Seq((0L, "seed")).toDF("id", "tag")
    val metaJson = graft.iceberg.connector.IcebergJson.tableMetadata(
      new com.fasterxml.jackson.databind.ObjectMapper(), dir,
      seed.schema, Nil, Map.empty)
    new File(s"$dir/metadata").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"), metaJson)
  }

  private def dataFilesOnDisk(dir: String): Set[String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    val d = new File(s"$dir/data")
    if (d.exists) walk(d).map(_.toString).toSet else Set.empty
  }

  test("expire after compaction deletes the pre-compaction files") {
    import spark.implicits._
    val dir = "/root/repo/target/test-expire"
    freshTable(dir)
    (1L to 3L).foreach(i =>
      IcebergWriter.append(spark, dir, Seq((i, s"row$i")).toDF("id", "tag")))
    IcebergWriter.compact(spark, dir) // snapshot 4: truncate, new files only
    val preCompaction = IcebergTable(spark, dir).atSnapshot(3L)
      .planFiles().map(f => IcebergTable(spark, dir).resolve(f.filePath)).toSet
    assert(preCompaction.nonEmpty)

    val n = IcebergWriter.expireSnapshots(spark, dir,
      olderThanMs = Long.MaxValue, retainLast = 1)
    assert(n == 3, s"three pre-compaction snapshots expire, got $n")

    val t = IcebergTable(spark, dir)
    assert(t.metadata.snapshots.map(_.snapshotId) == Seq(4L))
    assert(t.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L), "current snapshot reads green after expiration")
    // the pre-compaction data files are physically gone
    assert(preCompaction.intersect(dataFilesOnDisk(dir)).isEmpty,
      "expired-only data files must be deleted from disk")
    // time travel to an expired snapshot fails fast
    intercept[IllegalArgumentException] { t.atSnapshot(2L) }
  }

  test("expiration keeps files shared with retained snapshots") {
    import spark.implicits._
    val dir = "/root/repo/target/test-expire-shared"
    freshTable(dir)
    (1L to 3L).foreach(i =>
      IcebergWriter.append(spark, dir, Seq((i, s"row$i")).toDF("id", "tag")))
    // expire s1 only (retain the 2 most recent): s1's file is ALSO
    // referenced by s2 and s3 (appends carry prior manifests) → it must
    // survive, and s2 must still read both its rows
    val n = IcebergWriter.expireSnapshots(spark, dir,
      olderThanMs = Long.MaxValue, retainLast = 2)
    assert(n == 1, s"got $n")
    val t = IcebergTable(spark, dir)
    assert(t.metadata.snapshots.map(_.snapshotId).sorted == Seq(2L, 3L))
    assert(t.atSnapshot(2L).toDF(spark).count() == 2L,
      "retained history must still time-travel with shared files intact")
    assert(t.toDF(spark).count() == 3L)
  }

  test("expiration is a no-op when nothing is old enough") {
    import spark.implicits._
    val dir = "/root/repo/target/test-expire-noop"
    freshTable(dir)
    (1L to 2L).foreach(i =>
      IcebergWriter.append(spark, dir, Seq((i, s"row$i")).toDF("id", "tag")))
    val n = IcebergWriter.expireSnapshots(spark, dir,
      olderThanMs = 0L, retainLast = 1) // everything is newer than epoch 0
    assert(n == 0)
    assert(IcebergTable(spark, dir).metadata.snapshots.size == 2)
  }

  test("per-ref retention: branch keeps min-snapshots-to-keep while main expires") {
    import spark.implicits._
    import graft.iceberg.RefRetention
    val dir = "/root/repo/target/test-expire-refpolicy"
    freshTable(dir)
    val conf = spark.sessionState.newHadoopConf()
    // main history: s1..s3
    val mainSnaps = (1L to 3L).map(i =>
      IcebergWriter.append(spark, dir, Seq((i, s"m$i")).toDF("id", "tag")))
    // dev branches off main's head and stacks 4 commits: s4..s7
    IcebergWriter.createRef(conf, dir, "dev", mainSnaps.last,
      refType = "branch")
    val devSnaps = (4L to 7L).map(i =>
      IcebergWriter.append(spark, dir, Seq((i, s"d$i")).toDF("id", "tag"),
        branch = "dev"))
    // policy: dev keeps its 3 most recent; wap has NO policy (default:
    // whole chain survives — the publishability guarantee)
    IcebergWriter.setRefRetention(conf, dir, "dev",
      RefRetention(minSnapshotsToKeep = Some(3)))
    IcebergWriter.createRef(conf, dir, "wap", mainSnaps.last, refType = "branch")
    val wapSnap = IcebergWriter.append(spark, dir,
      Seq((100L, "w")).toDF("id", "tag"), branch = "wap")

    val n = IcebergWriter.expireSnapshots(spark, dir,
      olderThanMs = Long.MaxValue, retainLast = 1)
    val t = IcebergTable(spark, dir)
    val left = t.metadata.snapshots.map(_.snapshotId).toSet
    // dev's policy keeps exactly its 3 newest commits; dev's oldest
    // branch commit expired
    assert(devSnaps.takeRight(3).forall(left), s"dev keeps 3 newest: $left")
    assert(!left(devSnaps.head), s"dev's oldest must expire: $left")
    // wap (no policy) keeps its WHOLE chain back to the main junction —
    // including main snapshots dev's policy no longer protects
    assert(left(wapSnap) && left(mainSnaps.last), s"wap chain survives: $left")
    // main's unreferenced history expired (s1, s2 were on no surviving chain)
    assert(!left(mainSnaps(0)) && !left(mainSnaps(1)),
      s"main history should expire: $left")
    assert(n == 2 + 1, s"s1, s2 and dev's oldest expire, got $n")
    // the retention policy survived the branch-head moves (set-snapshot-ref
    // preserves retention fields)
    assert(t.metadata.refRetention.get("dev")
      .flatMap(_.minSnapshotsToKeep).contains(3))
    // wap stays publishable: fastForward walks its intact parent chain
    IcebergWriter.fastForward(conf, dir, from = "wap")
    assert(IcebergTable(spark, dir).metadata.currentSnapshotId.contains(wapSnap))
  }

  test("per-ref retention: an aged-out tag is removed; max-snapshot-age-ms bounds a branch") {
    import spark.implicits._
    import graft.iceberg.RefRetention
    val dir = "/root/repo/target/test-expire-refage"
    freshTable(dir)
    val conf = spark.sessionState.newHadoopConf()
    val snaps = (1L to 3L).map(i =>
      IcebergWriter.append(spark, dir, Seq((i, s"r$i")).toDF("id", "tag")))
    // an aged-out tag (max-ref-age-ms = 0 ⇒ any elapsed time ages it out)
    // and a fresh one on the same snapshot
    IcebergWriter.createRef(conf, dir, "stale", snaps.head,
      retention = RefRetention(maxRefAgeMs = Some(0L)))
    IcebergWriter.createRef(conf, dir, "pinned", snaps.head,
      retention = RefRetention(maxRefAgeMs = Some(24L * 3600 * 1000)))
    Thread.sleep(5)
    val n = IcebergWriter.expireSnapshots(spark, dir,
      olderThanMs = Long.MaxValue, retainLast = 1)
    val meta = IcebergTable(spark, dir).metadata
    assert(!meta.refs.contains("stale"), "aged-out tag must be removed")
    assert(meta.refs.contains("pinned"), "fresh tag survives")
    // snaps.head survives (pinned still references it); middle expires
    assert(meta.snapshots.exists(_.snapshotId == snaps.head))
    assert(!meta.snapshots.exists(_.snapshotId == snaps(1)), s"got $meta")
    assert(n == 1)

    // max-snapshot-age-ms on a branch: everything older than the horizon
    // beyond the head expires, younger commits survive
    val dir2 = "/root/repo/target/test-expire-refage2"
    freshTable(dir2)
    val base = IcebergWriter.append(spark, dir2,
      Seq((0L, "b")).toDF("id", "tag"))
    IcebergWriter.createRef(conf, dir2, "b1", base, refType = "branch",
      retention = RefRetention(maxSnapshotAgeMs = Some(0L)))
    val old = IcebergWriter.append(spark, dir2,
      Seq((1L, "o")).toDF("id", "tag"), branch = "b1")
    Thread.sleep(5)
    val young = IcebergWriter.append(spark, dir2,
      Seq((2L, "y")).toDF("id", "tag"), branch = "b1")
    val n2 = IcebergWriter.expireSnapshots(spark, dir2,
      olderThanMs = Long.MaxValue, retainLast = 1)
    val left2 = IcebergTable(spark, dir2).metadata.snapshots
      .map(_.snapshotId).toSet
    assert(left2(young), "branch head always survives")
    assert(!left2(old), s"aged branch history must expire: $left2")
    assert(n2 >= 1)
  }

  test("per-ref retention: max-ref-age-ms ALONE never truncates the chain; empty retention clears") {
    import spark.implicits._
    import graft.iceberg.RefRetention
    val dir = "/root/repo/target/test-expire-refage"
    freshTable(dir)
    val conf = spark.sessionState.newHadoopConf()
    val s1 = IcebergWriter.append(spark, dir, Seq((1L, "m")).toDF("id", "tag"))
    IcebergWriter.createRef(conf, dir, "wap", s1, refType = "branch")
    val w1 = IcebergWriter.append(spark, dir,
      Seq((2L, "a")).toDF("id", "tag"), branch = "wap")
    val w2 = IcebergWriter.append(spark, dir,
      Seq((3L, "b")).toDF("id", "tag"), branch = "wap")
    // an AGE policy on the ref itself says nothing about its SNAPSHOTS:
    // the keep-the-chain publishability default must survive
    IcebergWriter.setRefRetention(conf, dir, "wap",
      RefRetention(maxRefAgeMs = Some(Long.MaxValue)))
    IcebergWriter.expireSnapshots(spark, dir,
      olderThanMs = Long.MaxValue, retainLast = 1)
    val left = IcebergTable(spark, dir).metadata.snapshots.map(_.snapshotId).toSet
    assert(left(w1) && left(w2),
      s"max-ref-age-ms alone must not expire the chain: $left")
    val published = IcebergWriter.fastForward(conf, dir, from = "wap")
    assert(published == w2, "branch stays publishable")

    // whole-policy clearing: a snapshot policy set then REPLACED with an
    // empty retention is gone — the next expiration keeps the chain
    IcebergWriter.createRef(conf, dir, "dev", published, refType = "branch")
    val d1 = IcebergWriter.append(spark, dir,
      Seq((4L, "d")).toDF("id", "tag"), branch = "dev")
    val d2 = IcebergWriter.append(spark, dir,
      Seq((5L, "e")).toDF("id", "tag"), branch = "dev")
    IcebergWriter.setRefRetention(conf, dir, "dev",
      RefRetention(minSnapshotsToKeep = Some(1)))
    IcebergWriter.setRefRetention(conf, dir, "dev", RefRetention())
    assert(IcebergTable(spark, dir).metadata.refRetention
      .get("dev").forall(_.isEmpty), "empty retention must CLEAR the policy")
    IcebergWriter.expireSnapshots(spark, dir,
      olderThanMs = Long.MaxValue, retainLast = 1)
    val left2 = IcebergTable(spark, dir).metadata.snapshots.map(_.snapshotId).toSet
    assert(left2(d1) && left2(d2),
      s"cleared policy reverts to keep-the-chain: $left2")
  }

  test("removeOrphanFiles deletes unreferenced debris, keeps live files") {
    import spark.implicits._
    val dir = "/root/repo/target/test-orphans"
    freshTable(dir)
    (1L to 2L).foreach(i =>
      IcebergWriter.append(spark, dir, Seq((i, s"row$i")).toDF("id", "tag")))
    // debris: an aborted write's task file + a stray root-level file
    val stray1 = new File(s"$dir/data/s99/part-stray.parquet")
    stray1.getParentFile.mkdirs()
    java.nio.file.Files.writeString(stray1.toPath, "junk")
    val stray2 = new File(s"$dir/data/stray-top.parquet")
    java.nio.file.Files.writeString(stray2.toPath, "junk")
    val before = dataFilesOnDisk(dir)

    // horizon in the future → both strays qualify; live files survive
    val n = IcebergWriter.removeOrphanFiles(spark, dir,
      olderThanMs = System.currentTimeMillis + 60000)
    assert(n == 2, s"expected 2 orphans deleted, got $n")
    assert(!stray1.exists && !stray2.exists)
    assert(dataFilesOnDisk(dir) == before -- Set(stray1.toString, stray2.toString))
    // table still reads green
    assert(IcebergTable(spark, dir).toDF(spark).count() == 2L)

    // horizon in the past → nothing qualifies (in-flight-commit safety)
    val stray3 = new File(s"$dir/data/stray-new.parquet")
    java.nio.file.Files.writeString(stray3.toPath, "junk")
    assert(IcebergWriter.removeOrphanFiles(spark, dir, olderThanMs = 1000L) == 0)
    assert(stray3.exists)
    stray3.delete()
  }

  test("removeOrphanFiles sweeps the _staged area: crashed-staging " +
      "debris goes, a committed staged write's referenced files stay") {
    import spark.implicits._
    val dir = "/root/repo/target/test-orphans-staged"
    // the committed-staged shape: a real RTAS through the catalog, so
    // the table's live files sit under _staged/<uuid>/
    val wh = "/root/repo/target/test-orphans-staged-wh"
    val conf = spark.sessionState.newHadoopConf()
    new org.apache.hadoop.fs.Path(wh).getFileSystem(conf)
      .delete(new org.apache.hadoop.fs.Path(wh), true)
    spark.conf.set("spark.sql.catalog.orphcat",
      classOf[graft.iceberg.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.orphcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE orphcat.ns")
    spark.sql("CREATE TABLE orphcat.ns.t (k BIGINT)")
    spark.sql("INSERT INTO orphcat.ns.t VALUES (1), (2)")
    spark.sql("REPLACE TABLE orphcat.ns.t AS SELECT id AS m FROM range(5)")
    val tdir = s"$wh/ns/t"
    // crashed-staging debris: a staging dir that never published/aborted
    val debris = new File(s"$tdir/_staged/deadbeef0000/data/part-crash.parquet")
    debris.getParentFile.mkdirs()
    java.nio.file.Files.writeString(debris.toPath, "junk")
    val n = IcebergWriter.removeOrphanFiles(spark, tdir,
      olderThanMs = System.currentTimeMillis + 60000)
    assert(n >= 1, s"the crashed-staging debris must be collected, got $n")
    assert(!debris.exists)
    assert(!new File(s"$tdir/_staged/deadbeef0000").exists,
      "an emptied staging dir is removed wholesale")
    // the LIVE staged files (referenced by the replace's snapshot,
    // incl. their manifests inside the staging dir) survived
    assert(spark.sql("SELECT m FROM orphcat.ns.t ORDER BY m").collect()
      .map(_.getLong(0)).toSeq == (0L to 4L),
      "referenced staged files must survive the sweep")
    // and time travel across the replace still reads (old data files in
    // data/ referenced by retained snapshots survived too)
    val oldSnap = new IcebergTable(tdir, conf).metadata.snapshots
      .map(_.snapshotId).min
    assert(spark.sql(
      s"SELECT COUNT(*) FROM orphcat.ns.t VERSION AS OF $oldSnap")
      .head.getLong(0) == 2L)
    val _ = dir
  }

  test("rewriteManifests merges per-commit manifests, reads unchanged") {
    import spark.implicits._
    val dir = "/root/repo/target/test-rewrite-manifests"
    freshTable(dir)
    (1L to 4L).foreach(i =>
      IcebergWriter.append(spark, dir, Seq((i, s"row$i")).toDF("id", "tag")))
    def manifests(t: IcebergTable) = {
      val s = t.metadata.currentSnapshot.get
      graft.iceberg.ManifestIO.readManifestList(t.resolve(s.manifestList),
        spark.sessionState.newHadoopConf())
    }
    val before = manifests(IcebergTable(spark, dir))
    assert(before.size == 4, "one manifest per append commit")
    val rows = IcebergTable(spark, dir).toDF(spark).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    val snap = IcebergWriter.rewriteManifests(spark, dir)
    assert(snap > 0)
    val t2 = IcebergTable(spark, dir)
    val after = manifests(t2)
    assert(after.size == 1, s"expected 1 merged manifest, got ${after.size}")
    // METADATA-only: the data file set is byte-identical
    assert(t2.planFiles().map(_.filePath).toSet ==
      IcebergTable(spark, dir).atSnapshot(snap - 1).planFiles()
        .map(_.filePath).toSet)
    assert(t2.toDF(spark).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == rows)
    // prior snapshots still time-travel
    assert(t2.atSnapshot(2).toDF(spark).count() == 2L) // first two appends
  }
}
