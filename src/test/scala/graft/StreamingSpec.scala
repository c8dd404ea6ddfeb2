package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Structured-Streaming parity: the streaming hourly aggregation must
  * produce exactly the batch result when fed the same files (SURVEY §2.B
  * "Streaming": streaming checked against its own batch run).
  */
class StreamingSpec extends SparkSpec {

  private def canon(rows: Array[org.apache.spark.sql.Row]): Set[String] =
    rows.map(_.mkString("\t")).toSet

  test("streaming hourly agg equals batch hourly agg") {
    val batch = EventStream.hourlyAgg(Tables.load(spark, sf, "events"))
      .collect()

    val stream = EventStream.hourlyAggStream(
      EventStream.readEventStream(spark, sf))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_out").collect()
      assert(canon(got) == canon(batch))
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    val sessions = EventStream.sessionAgg(Tables.load(spark, sf, "events"))
    val rows = sessions.collect()
    assert(rows.nonEmpty)
    // session end >= start for every row, counts positive
    assert(rows.forall(r =>
      !r.getTimestamp(1).before(r.getTimestamp(0)) && r.getLong(3) > 0))
  }

  test("streaming dedup collapses replayed events within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = EventStream.dedupEvents(df, watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      input.addData((1L, t, 1.0), (2L, t, 2.0), (1L, t, 1.0)) // in-batch dup
      q.processAllAvailable()
      input.addData((2L, t, 2.0), (3L, t, 3.0)) // cross-batch replay
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("sliding windows produce ~4x the tumbling rows") {
    val sliding = EventStream.slidingAgg(Tables.load(spark, sf, "events"))
      .count()
    val tumbling = EventStream.hourlyAgg(Tables.load(spark, sf, "events"))
      .count()
    assert(sliding > tumbling)
  }
}
