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
}
