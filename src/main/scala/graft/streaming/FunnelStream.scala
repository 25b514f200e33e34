package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the stateful twin of the batch
  * [[graft.operators.EventAnalytics.funnel]] (min-timestamp chaining).
  *
  * Per-user state is ONE long per stage (the earliest reach, sentinel =
  * unreached) — O(stages), never an event buffer — held in
  * `flatMapGroupsWithState`. Each micro-batch folds its events in
  * (ts, event_id) order: an event of stage k advances the user iff it is
  * STRICTLY after the current stage-(k-1) reach, exactly the batch
  * operator's chaining rule, and a fold over ascending timestamps
  * reproduces it incrementally (stage reaches only ever move earlier
  * with earlier events, which ascending order makes impossible to miss
  * within a batch).
  *
  * Arrival-order contract: cross-batch disorder (an event OLDER than a
  * user's already-folded history) can under-advance later stages — the
  * stream must be fed in per-user event-time order across triggers
  * (time-partitioned sources / watermarked reorder upstream), the same
  * discipline [[SessionStream]] documents. The spec feeds time-split
  * chunks and asserts stage counts equal the batch funnel's exactly.
  *
  * Emission (update mode): one `(user_id, stage_reached)` row whenever a
  * user's progress advances; the funnel table is `max(stage_reached)`
  * per user grouped downstream — a types-sized aggregate, never a
  * rescan of history. */
object FunnelStream {

  case class FunnelState(reach: Seq[Long])

  case class StageReach(user_id: Long, stage_reached: Long)

  private val Unreached = Long.MaxValue

  def progress(events: DataFrame,
               stages: Seq[String] = Seq("view", "click", "signup", "purchase"))
      : Dataset[StageReach] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val typed = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type").cast("string"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, StageReach](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, String, Long)],
         state: GroupState[FunnelState]) =>
          val reach = state.getOption.map(_.reach.toArray)
            .getOrElse(Array.fill(stages.size)(Unreached))
          val before = reach.clone()
          it.toSeq.sortBy(e => (e._4, e._2))
            .foreach { case (_, _, typ, us) =>
              stageIdx.get(typ).foreach { k =>
                val after = k == 0 ||
                  (reach(k - 1) != Unreached && us > reach(k - 1))
                if (after && us < reach(k)) reach(k) = us
              }
            }
          if (java.util.Arrays.equals(reach, before)) Iterator.empty
          else {
            state.update(FunnelState(reach.toSeq))
            val highest = reach.lastIndexWhere(_ != Unreached) + 1
            Iterator.single(StageReach(uid, highest.toLong))
          }
      }
  }
}
