package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** As-of and range join semantics on pinned micro-data: match, no-match
  * (NULL fill), equal-timestamp inclusion, tie-breaking, and interval
  * boundaries.
  */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val lefts = Seq(
    (10L, 1L, ts("2024-01-01 10:00:00")), // after two rights
    (11L, 1L, ts("2024-01-01 08:00:00")), // before every right -> NULL
    (12L, 2L, ts("2024-01-01 09:30:00")), // exactly at a right's ts
    (13L, 3L, ts("2024-01-01 12:00:00"))  // key with no rights -> NULL
  ).toDF("event_id", "user_id", "ts")

  lazy val rights = Seq(
    (100L, 1L, ts("2024-01-01 09:00:00")),
    (101L, 1L, ts("2024-01-01 09:45:00")),
    (102L, 2L, ts("2024-01-01 09:30:00")),
    (103L, 2L, ts("2024-01-01 09:30:00")) // same ts: tie -> max event_id
  ).toDF("event_id", "user_id", "ts")

  test("asOfJoin: latest earlier right, NULL when none, ties by max id") {
    val out = TemporalJoins.asOfJoin(lefts, rights,
        on = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
        rightCols = Seq("event_id"), prefix = "r_")
      .select(col("event_id"), col("r_event_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out == Map(
      10L -> Some(101L), // 09:45 beats 09:00
      11L -> None,       // nothing at or before 08:00
      12L -> Some(103L), // equal ts included; tie -> 103 over 102
      13L -> None))      // no rights for user 3
  }

  test("asOfJoin: NULL keys never match each other (equi-join semantics)") {
    val l = Seq(
      (10L, Option(1L), ts("2024-01-01 10:00:00")),
      (11L, Option.empty[Long], ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val r = Seq(
      (100L, Option(1L), ts("2024-01-01 09:00:00")),
      (101L, Option.empty[Long], ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = TemporalJoins.asOfJoin(l, r,
        on = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
        rightCols = Seq("event_id"), prefix = "r_")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(x.fieldIndex("r_event_id"))) None
         else Some(x.getLong(x.fieldIndex("r_event_id"))))).toMap
    assert(out == Map(
      10L -> Some(100L), // keyed row matches normally
      11L -> None))      // NULL key: NULL-fill, NOT the null-keyed right row
  }

  test("rangeJoin: inclusive boundary, cross-bucket matches, key isolation") {
    val a = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val b = Seq(
      (20L, 1L, ts("2024-01-01 09:55:00")), // -300s: exactly on the boundary
      (21L, 1L, ts("2024-01-01 10:04:59")), // +299s: inside
      (22L, 1L, ts("2024-01-01 10:05:01")), // +301s: outside
      (23L, 2L, ts("2024-01-01 10:00:00"))  // right time, wrong key
    ).toDF("event_id", "user_id", "ts")
    val pairs = TemporalJoins.rangeJoin(a, b,
        on = Seq("user_id"), tsCol = "ts", toleranceSec = 300L,
        aCols = Seq("event_id"), bCols = Seq("event_id"))
      .select(col("b_event_id")).collect().map(_.getLong(0)).toSet
    assert(pairs == Set(20L, 21L))
  }

  test("rangeJoin emits each qualifying pair exactly once") {
    val a = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val b = Seq((20L, 1L, ts("2024-01-01 10:00:30"))).toDF("event_id", "user_id", "ts")
    val n = TemporalJoins.rangeJoin(a, b, Seq("user_id"), "ts", 300L,
      Seq("event_id"), Seq("event_id")).count()
    assert(n == 1L)
  }
}
