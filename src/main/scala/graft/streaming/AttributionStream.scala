package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the stateful twin of the batch
  * [[graft.operators.EventAnalytics.attribution]].
  *
  * Per-user state is O(1) BY TYPE: the most recent touch's event-time
  * micros (one long) and its event type (one short string from the
  * bounded `touchTypes` set) — the exact running value the batch
  * operator's `last(ignoreNulls)` window carries. No touch buffer, no
  * touch×conversion join: each conversion reads the state once and
  * emits one credit row.
  *
  * Emission (update mode): one `(touch_type, value)` credit per
  * conversion — `touch_type` is the last touch STRICTLY BEFORE the
  * conversion in (ts, event_id) order if it falls within `windowDays`,
  * else "none" (the batch bucket). [[AttributionStream.table]] folds
  * accumulated credits into the batch-identical 3-row report (DECIMAL
  * value sums — a partial double sum would be partition-order-dependent).
  *
  * Arrival-order contract (same as [[FunnelStream]]/[[RetentionStream]]):
  * per-user event-time order ACROSS triggers (a touch arriving after its
  * conversion is unattributable once the credit row is out); within a
  * micro-batch the fold sorts by (ts, event_id), so intra-batch disorder
  * is absorbed. */
object AttributionStream {

  case class TouchState(lastTs: Long, lastType: String)

  case class Credit(user_id: Long, event_id: Long, touch_type: String,
                    value: Double)

  private val MicrosPerDay = 86400000000L

  def credits(events: DataFrame,
              touchTypes: Seq[String] = Seq("view", "click"),
              convType: String = "purchase",
              windowDays: Int = 7): Dataset[Credit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val touches = touchTypes.toSet
    val windowMicros = windowDays * MicrosPerDay
    val typed = events
      .filter(col("event_type").isin((touchTypes :+ convType).map(lit): _*))
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        col("value").cast("double"))
      .as[(Long, Long, Long, String, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[TouchState, Credit](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long, String, Double)],
         state: GroupState[TouchState]) =>
          var lastTs = state.getOption.map(_.lastTs).getOrElse(Long.MinValue)
          var lastType = state.getOption.map(_.lastType).orNull
          val out = Seq.newBuilder[Credit]
          // (ts, event_id) — the batch window's ordering; a touch tied on
          // ts with a conversion but with a smaller event_id precedes it
          it.toSeq.sortBy(e => (e._3, e._2)).foreach {
            case (_, eid, ts, typ, value) =>
              if (touches(typ)) { lastTs = ts; lastType = typ }
              else { // conversion: read the strictly-preceding touch state
                val credited =
                  if (lastType != null && ts <= lastTs + windowMicros) lastType
                  else "none"
                out += Credit(uid, eid, credited, value)
              }
          }
          if (lastType != null) state.update(TouchState(lastTs, lastType))
          out.result().iterator
      }
  }

  /** Accumulated credits → the batch-identical attribution report
    * (`touch_type, n_conversions, sum_value`). Credits in, one row per
    * touch bucket out — never events. */
  def table(credits: DataFrame): DataFrame =
    credits.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .orderBy(col("touch_type"))
}
