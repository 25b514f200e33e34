package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-streaming twin of [[graft.operators.Relational.eventHourly]]:
  * watermarked tumbling-window aggregation. Works unchanged on a batch
  * DataFrame (Spark's unified API) — the batch oracle `q_events_window`
  * covers the semantics, the streaming test covers incremental execution.
  */
object EventWindows {

  /** Tumbling windows + per-type counts/sums; late data beyond
    * `watermarkDelay` is dropped. */
  def hourly(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
}
