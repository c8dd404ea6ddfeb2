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
