package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming twin of the batch
  * trailing-window join ([[graft.operators.RangeJoin]]): every purchase
  * is attributed to the same user's clicks in the preceding hour, with
  * BOTH sides arriving as streams.
  *
  * This is the one join shape that needs genuine two-sided streaming
  * state: each side buffers rows until the OTHER side's watermark passes
  * the end of the interval they could still match (Spark derives the
  * state-retention bound from the watermark + the time-range predicate,
  * so state is provably bounded — without the range condition the join
  * would be rejected rather than silently unbounded). Inner-join matches
  * emit as soon as both rows have arrived; the watermark only governs
  * state eviction — so results equal the batch join exactly for data
  * that arrives within the delay (late rows are dropped WITH accounting,
  * same contract as [[LateData]]).
  *
  * At 100 TB-pipeline scale this is the funnel's enrichment stage (join
  * impressions to conversions, chunks to their embeddings as both land):
  * state is keyed by user and bounded to one window of events per side,
  * and the RocksDB provider ([[StateBackend]]) keeps it off-heap. */
object JoinStream {

  /** `purchases ⋈ clicks` on user within `[p_ts − window, p_ts]`. Input:
    * a streaming events frame `(event_id, ts, user_id, event_type,
    * value)`; filtered into the two sides internally so one source
    * serves both (Spark plans them as two scans of the stream). */
  def purchaseAttribution(events: DataFrame,
                          window: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", window)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", window)
    purchases.join(clicks,
      col("p_user") === col("user_id") &&
        col("click_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
        col("click_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"), col("p_ts"), col("click_ts"), col("value"))
  }

  /** The batch comparator: the SAME join over a static frame — what the
    * StreamingSpec equality check runs against. */
  def purchaseAttributionBatch(events: DataFrame,
                               window: String = "1 hour"): DataFrame =
    purchaseAttribution(events, window)
}
