package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming anomaly scoring — the online twin of the batch z-score gate
  * ([[graft.operators.EventAnalytics.anomalies]]).
  *
  * Production shape: the reference stats are FROZEN from a batch pass
  * over history (the same DECIMAL-exact per-type moments the batch
  * operator aggregates — order-free, layout-proof) and broadcast to the
  * stream; each incoming event is scored STATELESSLY against them. This
  * is the deployment contract an anomaly detector actually wants:
  * scoring never mutates the reference (no feedback loop where today's
  * outliers poison tomorrow's mean), the stream side is a pure narrow
  * map (no state store, no watermark, restart-safe by construction),
  * and refreshing the reference is re-running the batch aggregate.
  *
  * With IDENTICAL input rows the scores are bit-identical to the batch
  * operator's (same exact-moment arithmetic) — asserted in the
  * streaming spec.
  */
object AnomalyStream {

  /** Frozen per-type reference stats from a BATCH history table:
    * `(event_type, n, sv, svv)` with DECIMAL-exact moments. */
  def referenceStats(history: DataFrame): DataFrame = {
    val dv = col("value").cast("decimal(18,2)")
    history.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dv).as("sv"),
        sum((dv * dv).cast("decimal(38,4)")).as("svv"))
  }

  /** Score an event stream against frozen reference stats: stateless
    * broadcast join + the batch operator's exact z arithmetic. Types
    * unseen in the reference score z = 0 (no evidence, no flag). */
  def score(events: DataFrame, refStats: DataFrame,
            zThreshold: Double = 3.0): DataFrame = {
    val mean = col("sv").cast("double") / col("n").cast("double")
    val varr = greatest(lit(0.0),
      (col("svv").cast("double") -
        col("sv").cast("double") * col("sv").cast("double") /
          col("n").cast("double")) / col("n").cast("double"))
    val sd = sqrt(varr)
    val z = when(col("n").isNotNull && sd > 0.0,
      (col("value") - mean) / sd).otherwise(lit(0.0))
    events.join(broadcast(refStats), Seq("event_type"), "left")
      .select(col("event_id"), col("event_type"), col("value"),
        (floor(z * 1e4) / 1e4).as("z"),
        (abs(z) > zThreshold).as("is_anomaly"))
  }
}
