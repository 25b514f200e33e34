package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.EventAnalytics

/** Streaming robust-outlier monitoring — the stateful twin of the batch
  * `q_mad_outliers` gate: a running `(event_type, vg, c)` value
  * histogram over an event stream, served on demand through the SAME
  * fold as the batch operator ([[EventAnalytics.madFromCells]] — median,
  * MAD and the outlier mass are all integer folds over cells).
  *
  * The histogram is a plain streaming aggregation whose key domain is
  * bounded by the CLAMPED value grid (≤ madGridMax+1 cells per type by
  * construction — the clamp exists precisely so this state cannot grow
  * with the corpus; a raw `floor(value·1e4)` key would make the store
  * ∝ distinct values seen). After any prefix of the stream the cells
  * equal [[EventAnalytics.madHistogram]] over the same rows — asserted
  * bit-for-bit in the streaming spec under both state backends. */
object MadOutliersStream {

  /** Event stream → running capped value histogram (update mode). */
  def histogram(events: DataFrame): DataFrame =
    EventAnalytics.madHistogram(events)
}
