package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.EventAnalytics

/** Streaming hour-of-week seasonality — the stateful twin of the batch
  * `q_seasonality` profile: a running `(dow, hour, n, value_sum)` cell
  * table over an event stream, served on demand through the SAME fold
  * as the batch operator ([[EventAnalytics.seasonalityFromCells]]).
  *
  * The cells are a plain streaming aggregation on the FIXED 7×24 key —
  * the state store holds ≤ 168 counter rows forever, no matter how many
  * events stream through (the [[SketchStream]] fixed-state discipline;
  * epoch arithmetic keeps the grouping key a codegen'd projection, no
  * calendar functions). After any prefix of the stream the cells equal
  * [[EventAnalytics.seasonalityCells]] over the same rows — asserted
  * bit-for-bit in the streaming spec under both state backends. */
object SeasonalityStream {

  /** Event stream → running 168-cell table (update mode: a cell
    * re-emits each micro-batch it grows). */
  def cells(events: DataFrame): DataFrame =
    EventAnalytics.seasonalityCells(events)
}
