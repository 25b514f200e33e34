package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the stateful twin of
  * [[graft.operators.Sessionize]] and the distributed form of the
  * reference's in-memory session dict with a 30-minute inactivity timeout
  * (reference: utils/session_manager.py).
  *
  * Two forms:
  *  - [[sessionWindows]]: Spark's built-in `session_window` gap windows —
  *    the declarative path, works batch and streaming;
  *  - [[statefulSessions]]: explicit `flatMapGroupsWithState`, the shape
  *    to reach for when session state needs custom fields the built-in
  *    can't carry (e.g. the reference's rolling last-5 QA history).
  */
object SessionStream {

  // Instant (not java.sql.Timestamp): keeps microsecond precision, which
  // the batch twin relies on for session boundaries.
  case class Event(user_id: Long, ts: Instant, event_id: Long, value: Double)
  case class SessionAgg(user_id: Long, session_start: Instant,
                        session_end: Instant, n_events: Long,
                        sum_value: Double)
  /** start/end in epoch micros. */
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)

  private def micros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def instant(us: Long): Instant =
    Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)

  /** Declarative gap-based session windows (batch + streaming). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Custom-state sessionization: one state object per user, closed and
    * emitted either by a later event past the gap or by event-time
    * timeout once the watermark passes end + gap. */
  def statefulSessions(events: Dataset[Event], gapMinutes: Int = 30)
      : Dataset[SessionAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def update(userId: Long, evts: Iterator[Event],
               state: GroupState[SessionState]): Iterator[SessionAgg] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
      var cur = state.getOption
      // events within a micro-batch are not ordered; sort this group's slice
      evts.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val t = micros(e.ts)
        cur match {
          case Some(s) if t > s.end + gapUs =>
            out += SessionAgg(userId, instant(s.start), instant(s.end), s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1,
              s.sum + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      if (state.hasTimedOut) {
        cur.foreach(s => out += SessionAgg(userId, instant(s.start),
          instant(s.end), s.n, s.sum))
        state.remove()
      } else {
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp((s.end + gapUs) / 1000L) // millis API
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
