package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cohort retention — the stateful twin of the batch
  * [[graft.operators.EventAnalytics.retention]] (first-seen-day cohorts).
  *
  * Per-user state is O(1) BY TYPE, not just by contract: the first-seen
  * epoch day (one long) plus a BITMASK of already-emitted day offsets
  * 0..`maxOffset` in a second long (maxOffset ≤ 62 — the batch default
  * is 14). No event buffer, no per-day map: a user's whole retention
  * contribution compresses into 16 bytes however many events they emit.
  *
  * Emission (update mode): one `(user_id, cohort_day, day_offset)` mark
  * the FIRST time a user is active on each offset — exactly the rows of
  * the batch operator's (user × active-day) collapse, produced
  * incrementally. [[RetentionStream.table]] folds accumulated marks into
  * the batch-identical retention table with a (days × offsets)-sized
  * aggregate; cohort sizes are the offset-0 counts (every user marks
  * offset 0 with their first event), so no second pass over history.
  *
  * Arrival-order contract (same as [[FunnelStream]]/[[SessionStream]]):
  * events must arrive in per-user event-time order ACROSS triggers — an
  * out-of-order event older than a user's recorded first day would
  * belong to an earlier cohort the state has already anchored. Within a
  * micro-batch the fold sorts by (day, event_id), so intra-batch
  * disorder is absorbed. */
object RetentionStream {

  case class RetentionState(firstDay: Long, mask: Long)

  case class RetentionMark(user_id: Long, cohort_day: Long, day_offset: Long)

  private val MicrosPerDay = 86400000000L

  def marks(events: DataFrame, maxOffset: Int = 14): Dataset[RetentionMark] = {
    require(maxOffset >= 0 && maxOffset <= 62,
      "maxOffset must fit the state bitmask (0..62)")
    val spark = events.sparkSession
    import spark.implicits._
    // UTC epoch day via long division — exact for post-1970 data (the
    // table's domain); matches the batch `to_date` under the UTC session
    val typed = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        (unix_micros(col("ts")) / lit(MicrosPerDay)).cast("long").as("day"))
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[RetentionState, RetentionMark](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long)],
         state: GroupState[RetentionState]) =>
          var first = state.getOption.map(_.firstDay).getOrElse(Long.MaxValue)
          var mask = state.getOption.map(_.mask).getOrElse(0L)
          val mask0 = mask
          val out = Seq.newBuilder[RetentionMark]
          it.toSeq.sortBy(e => (e._3, e._2)).foreach { case (_, _, day) =>
            if (first == Long.MaxValue) first = day
            val off = day - first
            if (off >= 0 && off <= maxOffset && (mask & (1L << off)) == 0L) {
              mask |= 1L << off
              out += RetentionMark(uid, first, off)
            }
          }
          if (mask != mask0) state.update(RetentionState(first, mask))
          out.result().iterator
      }
  }

  /** Accumulated marks → the batch-identical retention table
    * (`cohort_day date, day_offset, n_active, cohort_size, retention`).
    * Offsets × days rows in, offsets × days rows out — never events. */
  def table(marks: DataFrame): DataFrame = {
    val counts = marks.groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    // fresh column names break the self-join's conflicting references
    // (counts and sizes share the memory-sink view's attribute ids)
    val sizes = counts.filter(col("day_offset") === 0L)
      .select(col("cohort_day").as("sz_day"),
        col("n_active").as("cohort_size"))
    counts.join(broadcast(sizes), col("cohort_day") === col("sz_day"))
      .drop("sz_day")
      .select(
        date_add(to_date(lit("1970-01-01")), col("cohort_day").cast("int"))
          .as("cohort_day"),
        col("day_offset"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }
}
