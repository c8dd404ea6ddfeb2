package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event entering sessionization. */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** An open (not yet emitted) session held in state; bounds in epoch micros,
  * `endUs` is the LAST EVENT's timestamp (the emitted window end adds the
  * gap, matching `session_window` semantics).
  */
final case class OpenSession(startUs: Long, endUs: Long, n: Long, sum: Double)

final case class UserSessions(sessions: List[OpenSession])

/** A closed session: same shape as `EventStream.sessionAgg` output
  * (ws, we, user_id, c, sv) so streaming state output is directly
  * comparable with the batch `session_window` aggregation.
  */
final case class SessionResult(ws: Timestamp, we: Timestamp, user_id: Long, c: Long, sv: Double)

/** Custom streaming state: gap-based sessionization via
  * `flatMapGroupsWithState` (the `KeyValueGroupedDataset` custom-state
  * hook). Unlike the built-in `session_window` aggregate this keeps an
  * explicit per-user state machine — the pattern for any stateful
  * enrichment the built-ins can't express (counters, ML feature windows,
  * fraud traces).
  *
  * Scale shape: state is partitioned by user (one shuffle), bounded by the
  * watermark (event-time timeout closes sessions; closed sessions leave
  * state), and per-user memory is O(open sessions), not O(events) — events
  * are folded into (start, end, count, sum) aggregates immediately.
  */
object Sessionize {

  /** Merge-step invariant: sessions sorted by start; two sessions merge
    * when the later one starts strictly within `gapUs` of the earlier
    * one's end (mirrors `session_window`'s half-open [start, end+gap)).
    */
  def merge(sessions: List[OpenSession], gapUs: Long): List[OpenSession] =
    sessions.sortBy(s => (s.startUs, s.endUs)).foldLeft(List.empty[OpenSession]) {
      case (acc @ (cur :: rest), next) if next.startUs < cur.endUs + gapUs =>
        OpenSession(cur.startUs, math.max(cur.endUs, next.endUs),
          cur.n + next.n, cur.sum + next.sum) :: rest
      case (acc, next) => next :: acc
    }.reverse

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Microsecond-exact Timestamp (a bare `new Timestamp(ms)` would drop
    * sub-millisecond precision and break batch parity). */
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** The per-group state transition. Top-level (captures only `gapUs`) so
    * the streaming closure stays serializable — a local def would drag the
    * enclosing SparkSession into the task closure.
    */
  private def stateFn(gapUs: Long)(
      user: Long, evs: Iterator[SessionEvent],
      state: GroupState[UserSessions]): Iterator[SessionResult] = {
    val existing = state.getOption.map(_.sessions).getOrElse(Nil)
    val incoming = evs.map(e =>
      OpenSession(micros(e.ts), micros(e.ts), 1L, e.value)).toList
    val all = merge(existing ++ incoming, gapUs)
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    // a session is closed once the watermark guarantees no event can
    // extend it (arrivals earlier than the watermark are dropped upstream)
    val (closed, open) = all.partition(s => wmUs > 0 && s.endUs + gapUs < wmUs)
    if (open.isEmpty) state.remove()
    else {
      state.update(UserSessions(open))
      val timeoutMs = math.max(
        (open.map(_.endUs).min + gapUs) / 1000L + 1L,
        state.getCurrentWatermarkMs() + 1L)
      state.setTimeoutTimestamp(timeoutMs)
    }
    closed.iterator.map(s => SessionResult(
      fromMicros(s.startUs), fromMicros(s.endUs + gapUs), user, s.n,
      BigDecimal(s.sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 watermark: String = "2 hours"): Dataset[SessionResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
      // dirty events (NULL user/ts/value) are DROPPED, not crashed on:
      // the typed encoder's primitive fields reject NULLs mid-batch and
      // a null ts has no event-time — one bad row must not kill a
      // long-running query. (The batch comparator groups them under a
      // NULL key instead; sessions are defined only for keyed, timed
      // events, so exclusion is the streaming contract.)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .as[SessionEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(stateFn(gapUs))
  }
}
