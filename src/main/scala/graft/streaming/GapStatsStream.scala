package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.EventAnalytics

/** Streaming inter-event-gap telemetry — the stateful twin of the batch
  * `q_gap_stats` profile. The batch operator derives per-user deltas
  * from one window pass; a stream cannot window over history, so
  * [[deltas]] keeps O(1) state per user — the LAST `(sec, event_id)`
  * seen — and emits each event's gap to its predecessor as it arrives
  * (`flatMapGroupsWithState`, append mode, the [[SessionStream]]
  * custom-state shape). Downstream, [[buckets]] folds the deltas onto
  * the capped minute grid — a second, BOUNDED streaming aggregation
  * (≤ capMinutes+1 cells forever) — and the final statistics are served
  * through the SAME fold as batch
  * ([[EventAnalytics.gapStatsFromCells]]).
  *
  * Ordering contract: within a micro-batch a user's slice is sorted by
  * `(sec, event_id)` before the state walk (micro-batch iterators are
  * unordered), and ACROSS micro-batches the source must deliver a
  * user's events in event-time order (the time-split chunk layout the
  * spec replays; a production feed with late data puts
  * [[LateData]]-style watermark handling in front). Under that
  * contract the delta sequence — and therefore every bucket — equals
  * the batch window pass bit for bit, asserted under both state
  * backends. */
object GapStatsStream {

  /** Instant keeps the full timestamp; the delta math truncates to the
    * same integer second as the batch twin's `cast(ts as long)`. */
  case class Ev(user_id: Long, ts: Instant, event_id: Long)
  /** O(1) per-user state: the last event seen, in batch tie-order. */
  case class LastSeen(sec: Long, event_id: Long)
  case class Gap(delta: Long)

  /** Event stream → per-event gap-to-predecessor deltas (append). */
  def deltas(events: Dataset[Ev]): Dataset[Gap] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(user: Long, evts: Iterator[Ev],
               state: GroupState[LastSeen]): Iterator[Gap] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Gap]
      var last = state.getOption
      evts.toSeq.sortBy(e => (e.ts.getEpochSecond, e.event_id)).foreach { e =>
        val sec = e.ts.getEpochSecond
        last.foreach(l => out += Gap(sec - l.sec))
        last = Some(LastSeen(sec, e.event_id))
      }
      last.foreach(state.update)
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Deltas → running capped `(gap_minutes, n)` buckets — the input
    * shape [[EventAnalytics.gapStatsFromCells]] serves from. */
  def buckets(gaps: Dataset[Gap], capMinutes: Int = 120): DataFrame =
    gaps.toDF()
      .select(least(expr("delta div 60"), lit(capMinutes.toLong))
        .as("gap_minutes"))
      .groupBy(col("gap_minutes"))
      .agg(count(lit(1)).as("n"))
}
