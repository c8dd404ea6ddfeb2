package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.Path

import graft.iceberg._
import graft.iceberg.connector.IcebergJson

/** Optimistic-concurrency races between two committers sharing a base:
  *
  *  - the commit LOSER must not corrupt the WINNER's already-committed
  *    snapshot (both derive `snapId = max+1` from the same base, so every
  *    pre-commit file write needs a writer-unique name — an overwrite of
  *    `snap-<id>.avro` would silently replace the winner's manifest list);
  *  - the loser sees [[CommitConflictException]] (never a raw filesystem
  *    error) and succeeds on retry from fresh metadata — including the
  *    FsCommitter's create-new race where BOTH requirement checks pass
  *    and only the version-file create detects the collision.
  */
class CommitRaceSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/test-race-warehouse"

  private def createTable(name: String): String = {
    import spark.implicits._
    val tableDir = s"$warehouse/ns/$name"
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(tableDir).getFileSystem(conf)
    fs.delete(new Path(tableDir), true)
    val metaJson = IcebergJson.tableMetadata(
      new ObjectMapper(), tableDir,
      Seq((0L, "x")).toDF("id", "tag").schema, Nil, Map.empty)
    val out = fs.create(new Path(s"$tableDir/metadata/v1.metadata.json"), true)
    try out.write(metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    tableDir
  }

  private def ids(n: Int, m: Int) = {
    import spark.implicits._
    (n until m).map(i => (i.toLong, s"row$i")).toDF("id", "tag")
  }

  /** A committer frozen at the metadata it saw at construction — the
    * write-side view of a racing writer that planned before the other
    * writer's commit landed. `commit` still goes to the real filesystem
    * committer (fresh re-read + requirement check), exactly like
    * [[FsCommitter]] itself. */
  private final class StaleBaseCommitter(dir: String,
      hconf: org.apache.hadoop.conf.Configuration) extends TableCommitter {
    private val inner = new FsCommitter(dir, hconf)
    private val frozen = inner.currentRoot(new ObjectMapper())
    override def tableDir: String = dir
    override def conf: org.apache.hadoop.conf.Configuration = hconf
    override def currentRoot(mapper: ObjectMapper): ObjectNode = frozen.deepCopy()
    override def currentMetadata(): TableMetadata =
      TableMetadata.fromJson(new ObjectMapper().writeValueAsString(frozen))
    override def commit(requirements: Seq[com.fasterxml.jackson.databind.JsonNode],
                        updates: Seq[com.fasterxml.jackson.databind.JsonNode]): Unit =
      inner.commit(requirements, updates)
  }

  test("racing append loser cannot corrupt the winner's snapshot; retry wins") {
    val dir = createTable("race1")
    val conf = spark.sessionState.newHadoopConf()
    IcebergWriter.append(spark, dir, ids(0, 2)) // shared base

    // loser plans from the base…
    val stale = new StaleBaseCommitter(dir, conf)
    // …while the winner commits first
    val winner = IcebergWriter.append(spark, dir, ids(10, 14))
    val winnerRows = new IcebergTable(dir, conf)
      .toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq

    // the loser writes its files (same snapId as the winner's) and fails
    // the ref assert — as CommitConflictException, per the retry contract
    intercept[CommitConflictException] {
      IcebergWriter.append(spark, dir, ids(20, 22), committer = Some(stale))
    }
    // the winner's snapshot is intact: same metadata head, same rows —
    // a loser-overwritten manifest list would change (or break) this read
    val after = new IcebergTable(dir, conf)
    assert(after.metadata.currentSnapshotId.contains(winner))
    assert(after.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == winnerRows)

    // retry from fresh metadata succeeds and stacks on the winner
    IcebergWriter.append(spark, dir, ids(20, 22))
    assert(new IcebergTable(dir, conf).toDF(spark).count() ==
      winnerRows.size + 2L)
  }

  test("create-new version-file collision surfaces as CommitConflictException") {
    val dir = createTable("race2")
    val conf = spark.sessionState.newHadoopConf()
    IcebergWriter.append(spark, dir, ids(0, 3))
    // a racer lands its commit INSIDE the check-then-create window (the
    // beforePublish seam): the requirement check passed, only the
    // create-new detects the collision — which must surface as
    // CommitConflictException, not a raw FileAlreadyExistsException
    val racedInWindow = new FsCommitter(dir, conf) {
      override protected def beforePublish(path: Path): Unit =
        IcebergWriter.createRef(conf, dir, "a", 1L)
    }
    val e = intercept[CommitConflictException] {
      IcebergWriter.createRef(conf, dir, "b", 1L,
        committer = Some(racedInWindow))
    }
    assert(e.getMessage.contains("race") || e.getMessage.contains("retry"))
    // the loser retries freshly and both refs land
    IcebergWriter.createRef(conf, dir, "b", 1L)
    val refs = new IcebergTable(dir, conf).metadata.refs.keySet
    assert(Set("a", "b").subsetOf(refs))
  }

  test("copy-on-write swap aborts when the table moved between plan and commit") {
    val dir = createTable("race3")
    val conf = spark.sessionState.newHadoopConf()
    IcebergWriter.append(spark, dir, ids(0, 4))
    val t = new IcebergTable(dir, conf)
    val planned = t.planFiles()
    val plannedBase = t.metadata.currentSnapshotId.get

    // a concurrent append lands after planning — the pinned-base swap
    // must abort (TOCTOU closed), not commit on top of the moved table
    IcebergWriter.append(spark, dir, ids(10, 12))
    intercept[CommitConflictException] {
      IcebergWriter.replaceFiles(conf, dir,
        removed = planned.map(_.filePath).toSet, added = Nil,
        removedEntries = planned, operation = "replace",
        expectedSnapshotId = Some(plannedBase))
    }
    // nothing was swapped: all six rows still read
    assert(new IcebergTable(dir, conf).toDF(spark).count() == 6L)
  }

  test("copy-on-write swap aborts when a rival rewrite already moved a planned file") {
    val dir = createTable("race4")
    val conf = spark.sessionState.newHadoopConf()
    IcebergWriter.append(spark, dir, ids(0, 4))
    IcebergWriter.append(spark, dir, ids(4, 8))
    val planned = new IcebergTable(dir, conf).planFiles()
    assert(planned.size >= 2)

    // rival compaction swaps the same files first (no base pin — it wins)
    val (snap, n) = IcebergWriter.compactWhere(spark, dir, filters = Nil,
      targetFileBytes = 1L << 30)
    assert(n == planned.size && snap > 0)

    // replaying the stale plan WITHOUT a base pin must still abort: the
    // planned files are no longer live, so the commit-time revalidation
    // (every removed path live exactly once) catches the rival rewrite
    intercept[CommitConflictException] {
      IcebergWriter.replaceFiles(conf, dir,
        removed = planned.map(_.filePath).toSet, added = Nil,
        removedEntries = planned, operation = "replace")
    }
    assert(new IcebergTable(dir, conf).toDF(spark).count() == 8L)
  }
}
