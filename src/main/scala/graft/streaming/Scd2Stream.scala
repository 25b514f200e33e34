package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD type-2 maintenance — the stateful twin of
  * [[graft.operators.Warehouse.scd2]]: one state object per user carries
  * the OPEN dimension row (current state, its version, its valid_from);
  * an arriving state change CLOSES it (emits the finished version with
  * its `[valid_from, valid_to)` interval) and opens the next. This is
  * the shape a live dimension table is maintained in — the batch
  * operator rebuilds history, the stream appends to it.
  *
  * Emission contract: closed versions only. The open row is state, not
  * output — it closes (and emits) when its successor arrives, exactly
  * like the batch operator's NULL-`valid_to` row never having a
  * downstream version. With in-order input the emitted set equals the
  * batch operator's `valid_to IS NOT NULL` rows verbatim (spec-pinned).
  *
  * Order contract: within a micro-batch the group iterator is sorted by
  * the batch twin's (ts, event_id) total order; ACROSS batches an event
  * at or before the state's last seen (ts, event_id) is DROPPED — a
  * late state change cannot rewrite already-emitted history (the
  * streaming trade every stateful twin in this library documents; route
  * late data through the batch rebuild instead).
  *
  * Scale shape: state is one tiny object per user (the same keyed-state
  * budget as [[SessionStream.statefulSessions]]); output is bounded by
  * the number of state CHANGES, not events. */
object Scd2Stream {

  case class OpenRow(version: Long, state: String, validFromUs: Long,
                     lastTsUs: Long, lastEventId: Long)
  case class ClosedVersion(user_id: Long, version: Long, state: String,
                           valid_from_us: Long, valid_to_us: Long)

  /** Closed dimension versions as they finish. */
  def closedVersions(events: DataFrame): Dataset[ClosedVersion] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[OpenRow, ClosedVersion](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[OpenRow]) =>
          var open = state.getOption.orNull
          val out = Seq.newBuilder[ClosedVersion]
          it.toSeq.sortBy(e => (e._3, e._2)).foreach {
            case (_, eid, ts, typ) =>
              if (open == null)
                open = OpenRow(1L, typ, ts, ts, eid)
              else if (ts > open.lastTsUs ||
                (ts == open.lastTsUs && eid > open.lastEventId)) {
                if (typ != open.state) {
                  out += ClosedVersion(uid, open.version, open.state,
                    open.validFromUs, ts)
                  open = OpenRow(open.version + 1, typ, ts, ts, eid)
                } else
                  open = open.copy(lastTsUs = ts, lastEventId = eid)
              } // else: late event — history is already written
          }
          if (open != null) state.update(open)
          out.result().iterator
      }
  }
}
