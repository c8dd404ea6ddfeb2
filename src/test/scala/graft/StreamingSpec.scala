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

  test("sliding windows produce ~4x the tumbling rows") {
    val sliding = EventStream.slidingAgg(Tables.load(spark, sf, "events"))
      .count()
    val tumbling = EventStream.hourlyAgg(Tables.load(spark, sf, "events"))
      .count()
    assert(sliding > tumbling)
  }
}
