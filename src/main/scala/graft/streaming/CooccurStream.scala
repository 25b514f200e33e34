package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-type co-occurrence — the stateful twin of the batch
  * `q_event_cooccur` matrix. The batch operator collapses each user to
  * their distinct type SET in one aggregate; the stream keeps that set
  * as O(1) per-user state (bounded by the type vocabulary — the
  * operator's contract) and emits DELTA MARKS only when a user's set
  * grows (`flatMapGroupsWithState`, append mode, the [[GapStatsStream]]
  * custom-state shape):
  *
  *  - `user`   — first type ever seen for this user (the n_users cell);
  *  - `single` — a type newly added to the set (the marginal cells);
  *  - `pair`   — the new type crossed with each type already present,
  *    emitted in sorted order (the co-occurrence cells).
  *
  * Set semantics make the marks ORDER-FREE: whichever of two types
  * arrives first, the same sorted pair is emitted exactly once —
  * duplicate events emit nothing. Downstream, [[cells]] is one bounded
  * streaming aggregation (≤ 1 + |types| + |types|² rows forever), and
  * lift/Jaccard are served through the SAME fold as batch
  * (`EventAnalytics.cooccurrenceFromCells`) — asserted bit-equal to the
  * batch operator over time-split chunks under both state backends. */
object CooccurStream {

  case class TEv(user_id: Long, event_type: String)
  /** A set-growth delta: kind ∈ {user, single, pair}. */
  case class Mark(kind: String, a: String, b: String)

  /** Event stream → set-growth marks (append). */
  def marks(events: Dataset[TEv]): Dataset[Mark] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(user: Long, evts: Iterator[TEv],
               state: GroupState[Set[String]]): Iterator[Mark] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Mark]
      var seen = state.getOption.getOrElse(Set.empty[String])
      // sorted walk for a deterministic emission order; counts are
      // order-free regardless (sets dedupe, pairs emit pre-sorted)
      evts.map(_.event_type).toSeq.distinct.sorted.foreach { t =>
        if (!seen.contains(t)) {
          if (seen.isEmpty) out += Mark("user", null, null)
          seen.foreach { e =>
            val (a, b) = if (e < t) (e, t) else (t, e)
            out += Mark("pair", a, b)
          }
          out += Mark("single", t, null)
          seen = seen + t
        }
      }
      state.update(seen)
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Marks → running `(kind, a, b, n)` cells — the bounded store the
    * serve path splits into the three cell tables the shared batch
    * fold consumes. */
  def cells(ms: Dataset[Mark]): DataFrame =
    ms.toDF()
      .groupBy(col("kind"), col("a"), col("b"))
      .agg(count(lit(1)).as("n"))
}
