package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.EventAnalytics

/** Streaming twin of [[graft.operators.EventAnalytics.activeUsers]]:
  * incremental DAU/WAU from an append-only ACTIVITY store.
  *
  * The stream maintains the same collapsed artifact the batch operator
  * derives first — the distinct `(user_id, day)` activity table — via
  * `dropDuplicatesWithinWatermark` (the [[DedupStream]] contract: state
  * bounded to the watermark horizon; a late duplicate past the horizon
  * may append again). The report then runs the batch arithmetic over
  * the store ([[EventAnalytics.activeUsersFrom]]), which re-deduplicates
  * its input — so the at-least-once store still yields the EXACT
  * report, and replays across restarts are harmless (the
  * [[DatasetCardStream]] replay-safety scheme).
  *
  * Per-trigger cost: the batch's new (user, day) pairs — O(1) state per
  * in-horizon pair, no report recompute until asked. */
object ActiveUsersStream {

  /** `(user_id, ts, …)` event stream → append-only distinct activity
    * store at `outPath`. */
  def start(spark: SparkSession, events: DataFrame, outPath: String,
            checkpoint: String, watermarkDelay: String = "1 hour")
      : StreamingQuery =
    events
      .select(col("user_id"), col("ts"), to_date(col("ts")).as("day"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "day")
      .select(col("user_id"), col("day"))
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outPath)
      .start()

  /** The DAU/WAU/stickiness report over the accumulated store — exact
    * regardless of store duplicates (see above). */
  def report(spark: SparkSession, outPath: String,
             windowDays: Int = 7): DataFrame =
    EventAnalytics.activeUsersFrom(spark.read.parquet(outPath), windowDays)
}
