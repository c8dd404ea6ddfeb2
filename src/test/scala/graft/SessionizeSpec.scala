package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{EventStream, OpenSession, SessionEvent, Sessionize}

/** Custom-state sessionization parity: the flatMapGroupsWithState stream
  * must emit exactly the sessions the batch `session_window` aggregation
  * computes, once the watermark closes them.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("merge folds events into gap-separated sessions") {
    val gapUs = 60L * 1000000L // 1 min
    def s(a: Long, b: Long) = OpenSession(a * 1000000L, b * 1000000L, 1L, 1.0)
    // 0s and 30s merge; 200s is its own session; order must not matter
    val merged = Sessionize.merge(List(s(200, 200), s(0, 0), s(30, 30)), gapUs)
    assert(merged.map(x => (x.startUs / 1000000L, x.endUs / 1000000L, x.n)) ==
      List((0L, 30L, 2L), (200L, 200L, 1L)))
    // exactly-at-gap boundary starts a NEW session (half-open window)
    val boundary = Sessionize.merge(List(s(0, 0), s(60, 60)), gapUs)
    assert(boundary.size == 2)
  }

  test("streaming sessions equal batch session_window once watermark closes them") {
    val events = Tables.load(spark, sf, "events")
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
      .as[SessionEvent].collect().toSeq

    val input = MemoryStream[SessionEvent](spark)
    val q = Sessionize.sessionize(input.toDF(), gapMinutes = 30, watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      // two far-future sentinels: the first advances the watermark past
      // every real session, the second triggers the timeout batch
      val far1 = SessionEvent(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), 0.0)
      val far2 = SessionEvent(-1L, Timestamp.valueOf("2030-06-01 00:00:00"), 0.0)
      input.addData(far1); q.processAllAvailable()
      input.addData(far2); q.processAllAvailable()

      val got = spark.table("sess_out")
        .filter(col("user_id") >= 0)
        .select("ws", "we", "user_id", "c", "sv")
        .collect().map(_.mkString("\t")).toSet

      val want = EventStream.sessionAgg(Tables.load(spark, sf, "events"))
        .select("ws", "we", "user_id", "c", "sv")
        .collect().map(_.mkString("\t")).toSet

      assert(got == want, {
        val missing = want -- got
        val extra = got -- want
        s"missing=${missing.take(3)} extra=${extra.take(3)} " +
          s"(got ${got.size}, want ${want.size})"
      })
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
