package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming next-event transition counting — the stateful twin of the
  * batch [[graft.operators.EventAnalytics.transitions]] (first-order
  * Markov counts).
  *
  * Per-user state is O(1) BY TYPE: the previous event's (ts micros,
  * event_id, type) — the exact value the batch `lead()` window reads.
  * No event buffer: each arriving event emits one (from, to) pair
  * against the stored predecessor and becomes the new predecessor.
  *
  * Emission (update mode): one `(from_type, to_type)` pair per
  * consecutive same-user event pair. [[TransitionStream.table]] folds
  * accumulated pairs into the batch-identical transition matrix —
  * types²-row aggregate + the row-normalizing window over the aggregate
  * (never a second pass over events); integer÷integer double `p` is
  * IEEE-exact, engine-portable.
  *
  * Arrival-order contract (same as the other event twins): per-user
  * event-time order ACROSS triggers; intra-batch disorder is absorbed by
  * the (ts, event_id) sort inside the fold. */
object TransitionStream {

  case class PrevEvent(ts: Long, eventId: Long, eventType: String)

  case class Transition(user_id: Long, from_type: String, to_type: String)

  def pairs(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[PrevEvent, Transition](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[PrevEvent]) =>
          var prev = state.getOption.orNull
          val out = Seq.newBuilder[Transition]
          it.toSeq.sortBy(e => (e._3, e._2)).foreach {
            case (_, eid, ts, typ) =>
              if (prev != null) out += Transition(uid, prev.eventType, typ)
              prev = PrevEvent(ts, eid, typ)
          }
          if (prev != null) state.update(prev)
          out.result().iterator
      }
  }

  /** Accumulated pairs → the batch-identical transition matrix
    * (`from_type, to_type, n, p`). Pairs in, types² rows out. */
  def table(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type")))
          .cast("double"))
      .orderBy(col("from_type"), col("to_type"))
}
