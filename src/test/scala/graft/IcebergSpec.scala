package graft

import org.apache.spark.sql.sources._
import graft.iceberg._

/** Parity gate with the reference's own integration test
  * (`datafusion_iceberg/src/table.rs:314-350`): same fixture, same query,
  * same ±0.001 tolerance — plus metadata-layer and pruning unit tests the
  * reference lacks (SURVEY §5.2.2).
  */
class IcebergSpec extends SparkSpec {

  val fixture = "/root/reference/datafusion_iceberg/tests/home/iceberg/warehouse/nyc/taxis"
  lazy val table = IcebergTable(spark, fixture)

  test("metadata parses: schema, partition spec, snapshot") {
    val m = table.metadata
    assert(m.formatVersion == 1)
    assert(m.schema.fieldNames.toSeq ==
      Seq("vendor_id", "trip_id", "trip_distance", "fare_amount", "store_and_fwd_flag"))
    assert(m.fieldIds("trip_distance") == 3)
    assert(m.partitionSpec == Seq(PartitionField("vendor_id", "identity", 1, 1000)))
    assert(m.currentSnapshotId.contains(638933773299822130L))
    assert(m.currentSnapshot.get.manifestList.endsWith(".avro"))
  }

  test("manifest list + manifests read: 4 live files, 4 rows, 2 partitions") {
    val ms = table.manifests
    assert(ms.size == 1)
    assert(ms.head.addedRowsCount.contains(4L))
    val files = table.planFiles()
    assert(files.size == 4)
    assert(files.map(_.recordCount).sum == 4L)
    assert(files.map(_.partition("vendor_id")).toSet == Set(1L, 2L))
    // per-file column bounds present for pruning
    assert(files.forall(f => f.lowerBounds.contains(3) && f.upperBounds.contains(3)))
  }

  test("Q2: reference test query returns {1 -> 1.8, 2 -> 0.9} (table.rs:330,348-349)") {
    table.toDF(spark).createOrReplaceTempView("nyc_taxis")
    val rows = spark.sql(
      """SELECT vendor_id, MIN(trip_distance) AS m FROM nyc_taxis
        |GROUP BY vendor_id ORDER BY vendor_id""".stripMargin).collect()
    assert(rows.length == 2)
    val byVendor = rows.map(r => r.getLong(0) -> r.getFloat(1)).toMap
    assert(math.abs(byVendor(1L) - 1.8f) < 0.001)
    assert(math.abs(byVendor(2L) - 0.9f) < 0.001)
  }

  test("manifest-level pruning skips non-matching partitions") {
    // vendor_id = 1 keeps only the 2 files of partition 1
    val (mk, mt, fk, ft) = table.pruneCounts(Seq(EqualTo("vendor_id", 1L)))
    assert(mt == 1 && ft == 4)
    assert(fk == 2, "partition filter must keep exactly vendor_id=1 files")
    // impossible partition value prunes everything
    val (_, _, none, _) = table.pruneCounts(Seq(EqualTo("vendor_id", 99L)))
    assert(none == 0)
  }

  test("file-level pruning uses per-file column bounds") {
    // fixture trip_distance per file: v1 -> {1.8, 8.4}, v2 -> {2.5, 0.9}
    val (_, _, k1, _) = table.pruneCounts(Seq(GreaterThan("trip_distance", 5.0f)))
    assert(k1 == 1, "only the 8.4 file survives > 5.0")
    val (_, _, k2, _) = table.pruneCounts(Seq(LessThan("trip_distance", 1.0f)))
    assert(k2 == 1, "only the 0.9 file survives < 1.0")
    val (_, _, k3, _) = table.pruneCounts(Seq(GreaterThan("fare_amount", 1000.0)))
    assert(k3 == 0, "no fare above 1000 exists")
  }

  test("pruned scan equals unpruned scan + filter (soundness on fixture)") {
    val full = table.toDF(spark).filter("trip_distance > 2.0")
      .select("trip_id").collect().map(_.getLong(0)).toSet
    val pruned = table.toDF(spark, Seq(GreaterThan("trip_distance", 2.0f)))
      .filter("trip_distance > 2.0")
      .select("trip_id").collect().map(_.getLong(0)).toSet
    assert(full == pruned && full.nonEmpty)
  }

  test("statistics: exact row count from record_count sums, not file counts") {
    assert(table.rowCount() == 4L)
    assert(table.sizeInBytes() > 0L)
    assert(table.rowCount(Seq(EqualTo("vendor_id", 1L))) == 2L)
  }
}
