package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path

import graft.iceberg._
import graft.iceberg.connector.IcebergJson

/** Multi-table transactions over the filesystem warehouse:
  *
  *  - two tables' staged writes publish together ([[Transactions.commitAll]]);
  *  - a requirement failure ANYWHERE publishes NOTHING (validate-all-first);
  *  - a commit race lost mid-publish rolls already-published tables back
  *    to their pre-transaction state (compensation), never clobbering a
  *    commit that already built on top.
  */
class TransactionsSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/test-tx-warehouse"

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

  private def rows(dir: String): Seq[Long] =
    new IcebergTable(dir, spark.sessionState.newHadoopConf())
      .toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("two tables commit atomically; both or neither") {
    val conf = spark.sessionState.newHadoopConf()
    val d1 = createTable("t1")
    val d2 = createTable("t2")
    IcebergWriter.append(spark, d1, ids(0, 2))
    IcebergWriter.append(spark, d2, ids(10, 12))

    // happy path: stage both, one commitAll, both advance
    val c1 = Transactions.stage(new FsCommitter(d1, conf)) { c =>
      IcebergWriter.append(spark, d1, ids(2, 4), committer = Some(c)); ()
    }
    val c2 = Transactions.stage(new FsCommitter(d2, conf)) { c =>
      IcebergWriter.append(spark, d2, ids(12, 14), committer = Some(c)); ()
    }
    // staging moved NO pointer: both tables still read the seed rows
    assert(rows(d1) == Seq(0L, 1L) && rows(d2) == Seq(10L, 11L),
      "staging must not publish")
    Transactions.commitAll(Seq(c1, c2))
    assert(rows(d1) == Seq(0L, 1L, 2L, 3L))
    assert(rows(d2) == Seq(10L, 11L, 12L, 13L))
  }

  test("a requirement failure anywhere publishes nothing") {
    val conf = spark.sessionState.newHadoopConf()
    val d1 = createTable("t3")
    val d2 = createTable("t4")
    IcebergWriter.append(spark, d1, ids(0, 2))
    IcebergWriter.append(spark, d2, ids(10, 12))
    val c1 = Transactions.stage(new FsCommitter(d1, conf)) { c =>
      IcebergWriter.append(spark, d1, ids(2, 4), committer = Some(c)); ()
    }
    val c2 = Transactions.stage(new FsCommitter(d2, conf)) { c =>
      IcebergWriter.append(spark, d2, ids(12, 14), committer = Some(c)); ()
    }
    // a rival moves t4 AFTER staging: its assert-ref is now stale
    IcebergWriter.append(spark, d2, ids(90, 91))
    val e = intercept[CommitConflictException](
      Transactions.commitAll(Seq(c1, c2)))
    assert(e.getMessage.contains("no table was committed"))
    assert(rows(d1) == Seq(0L, 1L), "t3 must not advance")
    assert(rows(d2) == Seq(10L, 11L, 90L), "t4 holds the rival's commit only")
    // restaged against fresh metadata, the transaction goes through
    val c1b = Transactions.stage(new FsCommitter(d1, conf)) { c =>
      IcebergWriter.append(spark, d1, ids(2, 4), committer = Some(c)); ()
    }
    val c2b = Transactions.stage(new FsCommitter(d2, conf)) { c =>
      IcebergWriter.append(spark, d2, ids(12, 14), committer = Some(c)); ()
    }
    Transactions.commitAll(Seq(c1b, c2b))
    assert(rows(d1) == Seq(0L, 1L, 2L, 3L))
    assert(rows(d2) == Seq(10L, 11L, 12L, 13L, 90L))
  }

  test("a race lost mid-publish rolls the published tables back") {
    val conf = spark.sessionState.newHadoopConf()
    val d1 = createTable("t5")
    val d2 = createTable("t6")
    IcebergWriter.append(spark, d1, ids(0, 2))
    IcebergWriter.append(spark, d2, ids(10, 12))
    val c1 = Transactions.stage(new FsCommitter(d1, conf)) { c =>
      IcebergWriter.append(spark, d1, ids(2, 4), committer = Some(c)); ()
    }
    // t6's committer loses the create-new race INSIDE the publish window
    // (the beforePublish seam lands a rival commit after validation)
    val raced = new FsCommitter(d2, conf) {
      override protected def beforePublish(path: Path): Unit =
        IcebergWriter.createRef(conf, d2, "rival", 1L)
    }
    val c2 = Transactions.stage(raced) { c =>
      IcebergWriter.append(spark, d2, ids(12, 14), committer = Some(c)); ()
    }
    val e = intercept[CommitConflictException](
      Transactions.commitAll(Seq(c1, c2)))
    assert(e.getMessage.contains("rolled back"), e.getMessage)
    // t5 was published first, then compensated back to its pre-tx state
    assert(rows(d1) == Seq(0L, 1L), "t5 must be rolled back")
    assert(rows(d2) == Seq(10L, 11L), "t6 holds no transaction rows")
    assert(new IcebergTable(d2, conf).metadata.refs.contains("rival"))
    // both tables remain writable after the rollback
    IcebergWriter.append(spark, d1, ids(5, 6))
    assert(rows(d1) == Seq(0L, 1L, 5L))
  }

  test("staging refuses multi-commit writes and double use") {
    val conf = spark.sessionState.newHadoopConf()
    val d1 = createTable("t7")
    IcebergWriter.append(spark, d1, ids(0, 2))
    val s = new Transactions.StagingCommitter(new FsCommitter(d1, conf))
    intercept[IllegalStateException](s.change) // nothing staged yet
    IcebergWriter.append(spark, d1, ids(2, 3), committer = Some(s))
    val e = intercept[IllegalArgumentException](
      IcebergWriter.append(spark, d1, ids(3, 4), committer = Some(s)))
    assert(e.getMessage.contains("second commit"))
    intercept[IllegalArgumentException](
      Transactions.commitAll(Seq(s.change, s.change))) // same table twice
  }
}
