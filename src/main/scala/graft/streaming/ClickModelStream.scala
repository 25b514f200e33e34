package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming implicit-feedback mining — the stateful twin of
  * [[graft.operators.Feedback]]: impressions (first view of each item in
  * a session, at its view-rank position, with a session-click flag) are
  * emitted incrementally as sessions CLOSE, and the accumulated marks
  * fold through the SAME [[graft.operators.Feedback.positionBiasFrom]] /
  * [[graft.operators.Feedback.clickModelFrom]] code paths as batch — the
  * propensity table and the IPS relevances cannot diverge between the
  * nightly job and the serve-path stream.
  *
  * Session closing follows [[SessionStream.statefulSessions]]: a later
  * event past the gap, or event-time timeout once the watermark passes
  * end + gap. Per-user state is the OPEN session's distinct-item table
  * (first-view position per item + clicked set) — bounded by the items
  * one user can touch in a 30-minute session, with a hard `maxItems`
  * cap against pathological loggers (first-seen items win, later ones
  * go untracked; the cap is a contract like the dedup family's
  * maxBucket/pairBudget, sized far above organic sessions).
  *
  * Arrival-order contract (the [[SessionStream]] one): per-user
  * event-time order must hold ACROSS triggers; within a micro-batch the
  * fold sorts by (ts, event_id). */
object ClickModelStream {

  /** Null-item sentinel, deliberately outside any plausible id domain:
    * batch [[graft.operators.Feedback.impressions]] keeps every non-null
    * item (including negative ids), so the stream must too — encoding
    * missing as -1 would silently drop a legitimate negative id and
    * break batch/stream fidelity. */
  val MissingItem: Long = Long.MinValue

  case class FeedbackEvent(user_id: Long, ts: Instant, event_id: Long,
                           event_type: String, item: Long)

  /** `session_start` (the open session's first event time in micros) is
    * the session identity a stream can mint without cross-session state:
    * unique per (user, session), stable under replay — and the pair fold
    * ([[graft.operators.Feedback.prefPairsFrom]]) only needs a
    * per-session-unique key, so stream and batch build identical pair
    * tables from differently-VALUED session keys. */
  case class ImpressionMark(user_id: Long, session_start: Long, item: Long,
                            pos: Long, clicked: Boolean)

  /** startUs/endUs = first/last event time; vrn = views so far in the
    * open session; viewed = item → first-view rank; clicked = items
    * clicked. */
  case class ClickState(startUs: Long, endUs: Long, vrn: Long,
                        viewed: Map[Long, Long], clicked: Set[Long])

  private def micros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  private val propsK =
    from_json(col("props"), StructType(Seq(StructField("k", LongType))))
      .getField("k")

  /** Raw `events` stream (`user_id, ts, event_id, event_type, props`) →
    * one [[ImpressionMark]] per (session, item) as sessions close.
    *
    * The view/click-with-item filter lives INSIDE the fold, not as a
    * DataFrame filter: a pre-filter on event_type/props gets pushed
    * below the EventTimeWatermark node by the optimizer (the predicate
    * doesn't reference the time column), so ignored event types would
    * never reach the watermark accumulator — the watermark would track
    * only view/click rows and a quiet tail of other traffic could
    * never flush the final sessions (measured: the last view session
    * sat unflushed because the log's later non-view events didn't
    * advance time). Ingesting the raw log costs shuffling the other
    * event types to their (stateless, immediately-skipped) groups —
    * the same whole-log shuffle [[SessionStream]] pays, and what makes
    * "any event advances time" actually true. Irrelevant events touch
    * neither session gaps nor state, exactly like the batch operator,
    * which sessionizes the filtered series. */
  def marks(events: DataFrame, gapMinutes: Int = 30, maxPos: Int = 10,
            maxItems: Int = 4096): Dataset[ImpressionMark] = {
    require(gapMinutes > 0 && maxPos >= 1 && maxItems >= 1,
      "gap, maxPos and maxItems must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def emit(uid: Long, s: ClickState): Seq[ImpressionMark] =
      s.viewed.toSeq.sortBy(_._2).map { case (item, vrn) =>
        ImpressionMark(uid, s.startUs, item, math.min(vrn, maxPos.toLong),
          s.clicked(item))
      }

    def absorb(s: ClickState, e: FeedbackEvent, t: Long): ClickState = {
      val isView = e.event_type == "view"
      val vrn = if (isView) s.vrn + 1L else s.vrn
      val viewed =
        if (isView && !s.viewed.contains(e.item) && s.viewed.size < maxItems)
          s.viewed + (e.item -> vrn)
        else s.viewed
      val clicked =
        if (!isView && s.clicked.size < maxItems) s.clicked + e.item
        else s.clicked
      ClickState(s.startUs, math.max(s.endUs, t), vrn, viewed, clicked)
    }

    def update(uid: Long, evts: Iterator[FeedbackEvent],
               state: GroupState[ClickState]): Iterator[ImpressionMark] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[ImpressionMark]
      var cur = state.getOption
      evts.toSeq
        .filter(e => (e.event_type == "view" || e.event_type == "click") &&
          e.item != MissingItem)
        .sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val t = micros(e.ts)
        cur match {
          case Some(s) if t > s.endUs + gapUs =>
            out ++= emit(uid, s)
            cur =
              Some(absorb(ClickState(t, t, 0L, Map.empty, Set.empty), e, t))
          case Some(s) =>
            cur = Some(absorb(s, e, t))
          case None =>
            cur =
              Some(absorb(ClickState(t, t, 0L, Map.empty, Set.empty), e, t))
        }
      }
      if (state.hasTimedOut) {
        cur.foreach(s => out ++= emit(uid, s))
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
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("event_type"),
        // a missing item encodes as the MissingItem sentinel (outside
        // the id domain — negative item ids stay valid, matching batch
        // Feedback's item-IS-NOT-NULL scope), filtered inside the fold —
        // a DataFrame-level filter would be pushed below the watermark
        // node (see the method doc)
        coalesce(propsK, lit(MissingItem)).as("item"))
      .as[FeedbackEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Accumulated marks → the batch-identical examination curve. */
  def positionBias(marks: DataFrame): DataFrame =
    graft.operators.Feedback.positionBiasFrom(
      marks.select(col("item"), col("pos"), col("clicked")))

  /** Accumulated marks → the batch-identical IPS relevance table. */
  def clickModel(marks: DataFrame): DataFrame =
    graft.operators.Feedback.clickModelFrom(
      marks.select(col("item"), col("pos"), col("clicked")))

  /** Accumulated marks → the batch-identical preference-pair table:
    * `session_start` serves as the session key for the skip-above
    * self-join (see [[ImpressionMark]] — any per-session-unique key
    * yields the same (winner, loser) rollup as batch's ordinal
    * session_idx). */
  def prefPairs(marks: DataFrame, marginGrid: Long = 100L): DataFrame =
    graft.operators.Feedback.prefPairsFrom(
      marks.select(col("user_id"), col("session_start").as("session_idx"),
        col("item"), col("pos"), col("clicked")),
      marginGrid)
}
