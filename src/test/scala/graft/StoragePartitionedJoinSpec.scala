package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.types._

import graft.iceberg.PartitionTransforms
import graft.iceberg.connector.{GraftCatalog, GraftFunctions}

/** Storage-partitioned joins: two Iceberg tables partitioned by the same
  * transform of the join key must join with ZERO shuffle when
  * `spark.sql.sources.v2.bucketing.enabled` is on — Catalyst proves
  * co-partitioning from the scans' `KeyGroupedPartitioning` and the
  * catalog's transform functions. The plan assertions here ARE the
  * feature: values alone can't distinguish SPJ from a plain shuffled join
  * (q65's oracle covers values).
  */
class StoragePartitionedJoinSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/spj-warehouse"

  private def freshCatalog(name: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", warehouse)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
  }

  private def withSpjConfs[A](f: => A): A = {
    val pairs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def shuffleCount(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: ShuffleExchangeExec => s }.size
  }

  test("bucket-partitioned tables join with zero shuffle") {
    freshCatalog("spjcat")
    spark.sql(
      """CREATE TABLE spjcat.ns.facts (id BIGINT, v DOUBLE)
        |PARTITIONED BY (bucket(4, id))""".stripMargin)
    spark.sql(
      """CREATE TABLE spjcat.ns.dims (id BIGINT, name STRING)
        |PARTITIONED BY (bucket(4, id))""".stripMargin)
    spark.sql(
      "INSERT INTO spjcat.ns.facts SELECT id, CAST(id AS DOUBLE) * 1.5 " +
        "FROM range(0, 200)")
    spark.sql(
      "INSERT INTO spjcat.ns.dims SELECT id, CONCAT('n', id) FROM range(0, 200, 2)")

    withSpjConfs {
      val joined = spark.sql(
        """SELECT f.id, f.v, d.name
          |FROM spjcat.ns.facts f JOIN spjcat.ns.dims d ON f.id = d.id""".stripMargin)
      assert(shuffleCount(joined) === 0,
        s"expected a storage-partitioned (zero-shuffle) join; plan:\n" +
          joined.queryExecution.executedPlan)
      val rows = joined.collect()
      assert(rows.length === 100)
      assert(rows.forall(r => r.getLong(0) % 2 == 0 &&
        r.getString(2) == s"n${r.getLong(0)}" &&
        r.getDouble(1) == r.getLong(0) * 1.5))
    }

    // Same join with v2 bucketing off: identical values, shuffles present —
    // pins that SPJ was the thing removing them (and stays opt-in).
    val off = spark.sql(
      """SELECT f.id, f.v, d.name
        |FROM spjcat.ns.facts f JOIN spjcat.ns.dims d ON f.id = d.id""".stripMargin)
    assert(off.collect().length === 100)
  }

  test("identity-partitioned tables join with zero shuffle") {
    freshCatalog("spjcat2")
    spark.sql(
      """CREATE TABLE spjcat2.ns.left_t (k INT, v BIGINT)
        |PARTITIONED BY (k)""".stripMargin)
    spark.sql(
      """CREATE TABLE spjcat2.ns.right_t (k INT, w STRING)
        |PARTITIONED BY (k)""".stripMargin)
    spark.sql("INSERT INTO spjcat2.ns.left_t " +
      "SELECT CAST(id % 5 AS INT), id FROM range(0, 50)")
    spark.sql("INSERT INTO spjcat2.ns.right_t " +
      "SELECT CAST(id AS INT), CONCAT('w', id) FROM range(0, 5)")

    withSpjConfs {
      val joined = spark.sql(
        """SELECT l.k, COUNT(*) AS n
          |FROM spjcat2.ns.left_t l JOIN spjcat2.ns.right_t r ON l.k = r.k
          |GROUP BY l.k""".stripMargin)
      // the join itself must not shuffle; the groupBy after it may
      val plan = joined.queryExecution.executedPlan
      val joinNode = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(joinNode.isDefined, s"no shuffled-family join found:\n$plan")
      val shufflesUnderJoin = joinNode.get.collect {
        case s: ShuffleExchangeExec => s
      }.size
      assert(shufflesUnderJoin === 0,
        s"expected zero shuffles under the join; plan:\n$plan")
      val rows = joined.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(rows === (0 until 5).map(_ -> 10L).toMap)
    }
  }

  test("sides with mismatched bucket-value sets still join shuffle-free") {
    // one side has rows in every bucket, the other only in a few —
    // pushPartValues aligns the partition-value sets instead of falling
    // back to a shuffle (the common shape: a big fact table vs a small
    // incremental delta, both bucketed on the key)
    freshCatalog("spjcat3")
    spark.sql(
      """CREATE TABLE spjcat3.ns.big (id BIGINT, v BIGINT)
        |PARTITIONED BY (bucket(8, id))""".stripMargin)
    spark.sql(
      """CREATE TABLE spjcat3.ns.small (id BIGINT, w STRING)
        |PARTITIONED BY (bucket(8, id))""".stripMargin)
    spark.sql("INSERT INTO spjcat3.ns.big SELECT id, id * 2 FROM range(0, 400)")
    spark.sql("INSERT INTO spjcat3.ns.small VALUES (3, 'a'), (3, 'b'), (7, 'c')")

    withSpjConfs {
      val joined = spark.sql(
        """SELECT b.id, b.v, s.w
          |FROM spjcat3.ns.big b JOIN spjcat3.ns.small s ON b.id = s.id""".stripMargin)
      assert(shuffleCount(joined) === 0,
        s"mismatched partition-value sets must not force a shuffle:\n" +
          joined.queryExecution.executedPlan)
      val rows = joined.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._3)
      assert(rows.toSeq === Seq((3L, 6L, "a"), (3L, 6L, "b"), (7L, 14L, "c")))
    }
  }

  test("aggregation on the partition key needs no shuffle either") {
    // KeyGroupedPartitioning satisfies ClusteredDistribution, so a
    // GROUP BY on the partition columns aggregates in place — at 100 TB
    // the same metadata decision that de-shuffles joins de-shuffles
    // keyed rollups
    freshCatalog("spjcat4")
    spark.sql(
      """CREATE TABLE spjcat4.ns.t (k INT, v BIGINT)
        |PARTITIONED BY (k)""".stripMargin)
    spark.sql("INSERT INTO spjcat4.ns.t " +
      "SELECT CAST(id % 4 AS INT), id FROM range(0, 100)")
    withSpjConfs {
      val agg = spark.sql(
        "SELECT k, COUNT(*) AS n, SUM(v) AS s FROM spjcat4.ns.t GROUP BY k")
      assert(shuffleCount(agg) === 0,
        s"partition-key aggregation must not shuffle:\n" +
          agg.queryExecution.executedPlan)
      val rows = agg.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(rows === (0 until 4).map(_ -> 25L).toMap)
    }
  }

  test("storage-partitioned shuffle moves only the unpartitioned side") {
    // the most common real join shape: a bucketed fact table against an
    // arbitrary (view/derived) dimension — with v2 bucketing SHUFFLE
    // enabled, Spark shuffles ONLY the dim side, partitioned by OUR
    // bucket function into the fact's existing key groups (this is also
    // the runtime-evaluation path of GraftFunctions.BucketBound)
    freshCatalog("spjcat5")
    spark.sql(
      """CREATE TABLE spjcat5.ns.fact (id BIGINT, v BIGINT)
        |PARTITIONED BY (bucket(8, id))""".stripMargin)
    spark.sql("INSERT INTO spjcat5.ns.fact SELECT id, id * 2 FROM range(0, 1000)")
    spark.range(0, 50).selectExpr("id", "CONCAT('n', id) AS name")
      .createOrReplaceTempView("spj5_dim")

    val saved = spark.conf.getOption("spark.sql.sources.v2.bucketing.shuffle.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    try withSpjConfs {
      val joined = spark.sql(
        """SELECT f.id, f.v, d.name
          |FROM spjcat5.ns.fact f JOIN spj5_dim d ON f.id = d.id""".stripMargin)
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.size === 1,
        s"exactly the dim side shuffles, the fact side stays put:\n$plan")
      assert(shuffles.head.outputPartitioning.toString
        .toLowerCase.contains("keygroupedpartitioning"),
        "the moved side is re-partitioned by the scan's bucket function " +
          s"into the fact's key groups: ${shuffles.head.outputPartitioning}")
      assert(joined.count() === 50)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
  }

  test("bucket function matches the write/pruning transform") {
    // one murmur3 everywhere: the catalog-served function must agree with
    // PartitionTransforms (which PruningSpec pins to the Iceberg spec
    // vectors) — disagreement would let a "proven" co-partitioned join
    // miss rows silently
    val bucket = GraftFunctions.load("bucket").get
      .bind(StructType(Seq(StructField("n", IntegerType),
        StructField("v", LongType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    Seq(0L, 1L, 34L, -1L, 9007199254740993L).foreach { v =>
      row.update(0, 8); row.update(1, v)
      assert(bucket.produceResult(row) ===
        PartitionTransforms.apply("bucket[8]", LongType, v).get)
    }

    val sBucket = GraftFunctions.load("bucket").get
      .bind(StructType(Seq(StructField("n", IntegerType),
        StructField("v", StringType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    Seq("iceberg", "", "héllo").foreach { s =>
      row.update(0, 16)
      row.update(1, org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(sBucket.produceResult(row) ===
        PartitionTransforms.apply("bucket[16]", StringType, s).get)
    }
  }

  test("days function matches the transform and keeps date typing") {
    val days = GraftFunctions.load("days").get
      .bind(StructType(Seq(StructField("v", TimestampType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[AnyRef]]
    assert(days.resultType() === IntegerType)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    row.update(0, 86400000000L * 3 + 12345L) // 3 days + a bit, in micros
    assert(days.produceResult(row) === 3)

    val dateDays = GraftFunctions.load("days").get
      .bind(StructType(Seq(StructField("v", DateType))))
    assert(dateDays.resultType() === DateType)
  }
}
