package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo

import graft.iceberg.IcebergTable
import graft.iceberg.connector.{GraftBatchScan, GraftCatalog}

/** Runtime (dynamic) file pruning on the DSv2 batch scan: a dim-side join
  * filter arriving at execution time must shrink the Iceberg file set
  * before tasks are scheduled — the capability round 2 flagged missing
  * ("a dim-filter join over an Iceberg fact table won't prune files
  * dynamically").
  */
class RuntimeFilterSpec extends SparkSpec {

  val fixtureWarehouse = "/root/reference/datafusion_iceberg/tests/home/iceberg/warehouse"

  private def useCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.lakehouse", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakehouse.warehouse", fixtureWarehouse)
  }

  test("filter() contract: runtime filters shrink the planned file set") {
    useCatalog()
    val table = IcebergTable(spark,
      s"$fixtureWarehouse/nyc/taxis")
    val files = table.planFiles(Nil)
    assert(files.size == 4)
    val scan = new GraftBatchScan(spark, table, Array.empty,
      table.metadata.schema, files)
    assert(scan.toBatch.planInputPartitions().nonEmpty)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("vendor_id", 1L)))
    val pruned = scan.currentFiles
    assert(pruned.size < 4 && pruned.nonEmpty,
      s"vendor_id = 1 should keep only vendor 1's files, kept ${pruned.size}")
    assert(pruned.forall(_.partition.get("vendor_id").contains(1L)))
    // the delegate re-plans against the pruned set
    assert(scan.toBatch.planInputPartitions().length <= files.size)
  }

  test("driver metrics report pruning counters with zero extra IO") {
    useCatalog()
    val table = IcebergTable(spark, s"$fixtureWarehouse/nyc/taxis")
    val files = table.planFiles(Nil)
    val scan = new GraftBatchScan(spark, table, Array.empty,
      table.metadata.schema, files)
    val names = scan.supportedCustomMetrics().map(_.name()).toSet
    assert(names.contains("graft_files_planned") &&
      names.contains("graft_manifests_kept"))
    def metric(n: String): Long =
      scan.reportDriverMetrics().find(_.name() == n).get.value()
    assert(metric("graft_files_planned") == 4)
    assert(metric("graft_files_runtime_pruned") == 0)
    assert(metric("graft_manifests_kept") == metric("graft_manifests_total"))
    assert(metric("graft_records_planned") == 4,
      "fixture has one record per file")
    // a runtime filter arrives -> the pruned delta shows up
    scan.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("vendor_id", 1L)))
    assert(metric("graft_files_runtime_pruned") > 0)
    assert(metric("graft_files_planned") < 4)
    assert(metric("graft_bytes_planned") > 0)
  }

  test("SQL dim-filter join inserts a dynamic pruning filter on the scan") {
    useCatalog()
    import spark.implicits._
    // a selective dim: only vendor 1 survives the filter. Parquet-backed
    // on purpose — a LocalRelation dim gets its Filter constant-folded
    // away (ConvertToLocalRelation), and DPP insertion requires a visible
    // selective predicate on the pruning side.
    val vdir = graft.Scratch.dir("test-rf-vendors")
    Seq((1L, "keep"), (2L, "drop")).toDF("vendor_id", "tag")
      .write.mode("overwrite").parquet(vdir)
    spark.read.parquet(vdir).createOrReplaceTempView("vendors")
    val df = spark.sql(
      """SELECT t.trip_id, t.trip_distance FROM lakehouse.nyc.taxis t
        |JOIN (SELECT vendor_id FROM vendors WHERE tag = 'keep') v
        |  ON t.vendor_id = v.vendor_id""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 2, "vendor 1 has 2 trips in the fixture")

    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q) ++ allNodes(q.plan) ++ q.subqueries.flatMap(allNodes)
      case other =>
        Seq(other) ++ other.children.flatMap(allNodes) ++
          other.subqueries.flatMap(allNodes)
    }
    val scans = allNodes(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "expected the iceberg scan to plan as BatchScanExec")
    val iceberg = scans.map(_.scan).collectFirst { case g: GraftBatchScan => g }
    assert(iceberg.nonEmpty, "expected a GraftBatchScan behind BatchScanExec")
    val hasRuntime = scans.exists(_.runtimeFilters.nonEmpty)
    assert(hasRuntime,
      "expected a dynamic pruning (runtime) filter attached to the scan:\n" +
        df.queryExecution.executedPlan.toString)
    // execution pushed the dim values into filter(): files pruned 4 -> 2
    assert(iceberg.get.currentFiles.size == 2,
      s"runtime filter should keep vendor 1's 2 files, " +
        s"kept ${iceberg.get.currentFiles.size}")
  }

  test("RuntimeProbe over a bucket[N]-partitioned index: the dynamic " +
      "pruning filter lands and bucket-transform file pruning bites at " +
      "execution (the LSH admission probe's shape)") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.IcebergWriter
    import graft.operators.Dedup
    val iDir = graft.Scratch.dir("test-rtprobe-bucket-index")
    FileUtils.deleteQuietly(new File(iDir))
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      (i, s"runtime probe corpus document $i with its own body"))
      .toDF("doc_id", "text")
    val idx0 = Dedup.minhashBandIndex(docs, "doc_id", "text",
      numHashes = 32, bands = 16)
    IcebergWriter.seedTable(spark, iDir, idx0.schema,
      Seq("band_hash" -> "bucket[8]"))
    IcebergWriter.append(spark, iDir, idx0)
    val t = IcebergTable(spark, iDir)
    val total = t.planFiles().size
    assert(total >= 4, s"bucketed index should span several files: $total")
    val keys = t.toDF(spark).select(col("band_hash")).limit(2)
      .localCheckpoint(true)
    val probed = graft.iceberg.connector.RuntimeProbe
      .prunedByKeys(spark, t, "band_hash", keys)
    assert(probed.count() > 0)
    probed.collect() // materialize THIS execution for the plan walk
    val scans = allNodes(probed.queryExecution.executedPlan).collect {
      case b: BatchScanExec if b.scan.isInstanceOf[GraftBatchScan] => b
    }
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      "the probe join must carry a dynamic-pruning runtime filter:\n" +
        probed.queryExecution.executedPlan)
    val g = scans.find(_.runtimeFilters.nonEmpty).get.scan
      .asInstanceOf[GraftBatchScan]
    assert(g.currentFiles.size < total,
      s"bucket-transform runtime pruning must bite: " +
        s"${g.currentFiles.size} of $total files survived")
  }

  test("probe correctness survives the rule being dropped (the " +
      "ensureRule registration race): identical rows, just less pruning") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.IcebergWriter
    val iDir = graft.Scratch.dir("test-rtprobe-norule")
    FileUtils.deleteQuietly(new File(iDir))
    import spark.implicits._
    val rows = (0L until 40L).map(i => (i % 8, i, s"payload-$i"))
      .toDF("bucket_key", "row_id", "payload")
    IcebergWriter.seedTable(spark, iDir, rows.schema,
      Seq("bucket_key" -> "identity"))
    IcebergWriter.append(spark, iDir, rows)
    val t = IcebergTable(spark, iDir)
    val keys = Seq(1L, 3L, 1L).toDF("bucket_key")
    val withRule = graft.iceberg.connector.RuntimeProbe
      .prunedByKeys(spark, t, "bucket_key", keys)
      .orderBy("row_id").collect()
    // force the documented race's outcome: a user assignment dropped
    // the rule between registration and planning
    graft.iceberg.connector.RuntimeProbe.removeRuleForTest(spark)
    try {
      val without = graft.iceberg.connector.RuntimeProbe
        .prunedByKeys(spark, t, "bucket_key", keys)
      graft.iceberg.connector.RuntimeProbe.removeRuleForTest(spark)
      val rowsWithout = without.orderBy("row_id").collect()
      assert(rowsWithout.toSeq == withRule.toSeq,
        "the probe join must enforce the key set row-exactly without the rule")
    } finally {
      // leave no half-registered state behind for later suites
      graft.iceberg.connector.RuntimeProbe.removeRuleForTest(spark)
    }
  }

  test("the probe rule never fires on user-composed plans reusing a " +
      "marked column (non-markedKeys build shapes are ignored)") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.IcebergWriter
    val iDir = graft.Scratch.dir("test-rtprobe-usershape")
    FileUtils.deleteQuietly(new File(iDir))
    import spark.implicits._
    val rows = (0L until 20L).map(i => (i % 4, i)).toDF("k", "v")
    IcebergWriter.seedTable(spark, iDir, rows.schema, Nil)
    IcebergWriter.append(spark, iDir, rows)
    val t = IcebergTable(spark, iDir)
    val idx = graft.iceberg.connector.RuntimeProbe.dsv2Read(spark, t)
    // a user plan reusing marked keys BUT not the distinct-aggregate
    // shape markedKeys produces (a union above it — a shape the
    // optimizer cannot collapse back into the aggregate): the rule must
    // decline — results still exact via the join itself. Note a plain
    // projection decoration does NOT count as a user shape: the
    // optimizer hoists it above the join, leaving exactly the probe
    // aggregate, which is semantically a probe and fine to prune.
    val marked = graft.iceberg.connector.RuntimeProbe
      .markedKeys(spark, Seq(1L, 2L).toDF("k"), "k",
        org.apache.spark.sql.types.LongType)
    val userShape = marked.union(Seq(2L, 3L).toDF("k"))
    val joined = idx.join(userShape, Seq("k"))
    joined.collect()
    val scans = allNodes(joined.queryExecution.executedPlan).collect {
      case b: BatchScanExec if b.scan.isInstanceOf[GraftBatchScan] => b
    }
    assert(scans.nonEmpty && scans.forall(_.runtimeFilters.isEmpty),
      "a non-markedKeys build shape must not receive the pruning filter:\n" +
        joined.queryExecution.executedPlan)
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      Seq(q) ++ allNodes(q.plan) ++ q.subqueries.flatMap(allNodes)
    case other =>
      Seq(other) ++ other.children.flatMap(allNodes) ++
        other.subqueries.flatMap(allNodes)
  }
}
