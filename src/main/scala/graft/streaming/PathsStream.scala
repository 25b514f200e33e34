package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming session-path mining — the stateful twin of the batch
  * `q_paths` / `q_path_conversion` operators
  * ([[graft.operators.Sessionize.paths]]): per-session ordered
  * event-type journeys emitted as `(path, conv)` cells the moment the
  * session CLOSES (a later event past the gap, or event-time timeout
  * once the watermark passes end + gap — the
  * [[SessionStream.statefulSessions]] contract), then served through
  * the SAME folds as the batch operators
  * ([[graft.operators.Sessionize.pathsFromCells]] /
  * `pathConversionFromCells`) so there is exactly one implementation
  * of the ranking arithmetic.
  *
  * State is bounded BY CONSTRUCTION, mirroring the batch operator's
  * `when(rn <= maxLen)` collect: the per-session buffer holds at most
  * `maxLen` event TYPES plus a length counter and a conversion bit —
  * a pathological million-event session costs `maxLen` strings of
  * state, never its event count (the length counter alone drives the
  * ` > ...` truncation marker, and the conversion flag is evaluated
  * over the WHOLE session — a purchase past the truncation still
  * counts, exactly like batch). After any prefix of a time-ordered
  * stream the emitted cells equal
  * [[graft.operators.Sessionize.sessionPathCells]] over the closed
  * sessions — asserted bit-for-bit in the streaming spec under both
  * state backends. */
object PathsStream {

  /** Instant (not java.sql.Timestamp) keeps microsecond precision —
    * the batch twin's session boundaries rely on it. */
  case class Event(user_id: Long, ts: Instant, event_id: Long,
                   event_type: String)
  /** One CLOSED session: its rendered (truncated) path label and
    * whether any event matched the conversion type. */
  case class PathCell(path: String, conv: Long)
  /** ≤ maxLen types + counters — the by-construction state bound. */
  case class PathState(prefix: List[String], len: Long, conv: Long,
                       endUs: Long)

  private def micros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  /** Event stream → closed-session `(path, conv)` cells (append mode).
    * Rendering matches the batch operator exactly: first `maxLen`
    * types joined with ` > `, plus a ` > ...` marker when the session
    * ran longer (so a cut journey never aliases an exact one). */
  def cells(events: Dataset[Event], gapMinutes: Int = 30, maxLen: Int = 8,
            convType: String = "purchase"): Dataset[PathCell] = {
    require(maxLen >= 1, "maxLen must be ≥ 1")
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def close(s: PathState): PathCell = PathCell(
      s.prefix.mkString(" > ") + (if (s.len > maxLen) " > ..." else ""),
      s.conv)

    def update(userId: Long, evts: Iterator[Event],
               state: GroupState[PathState]): Iterator[PathCell] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[PathCell]
      var cur = state.getOption
      // events within a micro-batch are unordered; sort this group's
      // slice by (ts, event_id) — the batch row_number tie contract.
      // The sort is PER BATCH only: a watermark-admitted late event
      // arriving in a LATER batch is appended in arrival order, so
      // CROSS-BATCH disorder (not just unclosed sessions) breaks batch
      // equivalence — path labels and session splits can diverge from
      // the batch operator even though the watermark admits up-to-gap
      // late data. The stated contract is therefore a TIME-ORDERED
      // PREFIX per user across batches: feed batches whose per-user
      // event times never interleave (the replay/backfill shape), or
      // accept the divergence as the cost of not buffering every open
      // session's events until timeout just to re-sort at close.
      evts.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val t = micros(e.ts)
        val c = if (e.event_type == convType) 1L else 0L
        cur match {
          case Some(s) if t > s.endUs + gapUs =>
            out += close(s)
            cur = Some(PathState(List(e.event_type), 1L, c, t))
          case Some(s) =>
            cur = Some(PathState(
              if (s.len < maxLen) s.prefix :+ e.event_type else s.prefix,
              s.len + 1L, math.max(s.conv, c), math.max(s.endUs, t)))
          case None =>
            cur = Some(PathState(List(e.event_type), 1L, c, t))
        }
      }
      if (state.hasTimedOut) {
        cur.foreach(out += close(_))
        state.remove()
      } else {
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp((s.endUs + gapUs) / 1000L) // millis API
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

  /** Serve the top-k journey table FROM collected cells — the shared
    * batch fold ([[graft.operators.Sessionize.pathsFromCells]]). */
  def topPaths(cells: DataFrame, k: Int = 20): DataFrame =
    graft.operators.Sessionize.pathsFromCells(cells, k)

  /** Serve the conversion table FROM collected cells — the shared
    * batch fold (`pathConversionFromCells`). */
  def pathConversion(cells: DataFrame, k: Int = 20): DataFrame =
    graft.operators.Sessionize.pathConversionFromCells(cells, k)
}
