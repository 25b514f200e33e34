package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Watermark accounting for streaming aggregations.
  *
  * A watermarked aggregate ([[EventWindows.hourly]] and every stateful
  * twin here) silently DROPS rows older than the watermark — correct for
  * state bounding, but a production pipeline must account for what it
  * drops: a clock-skewed producer or a backfilled partition can turn
  * "occasional stragglers" into losing whole hours of data with no error
  * anywhere. The engine already counts the drops per state operator in
  * its progress stream; this surfaces them as the one number an operator
  * alarms on (tested in StreamingSpec: a crafted late event is provably
  * absent from the output AND shows up here).
  */
object LateData {

  /** Total input rows dropped by the watermark over the query's retained
    * progress history (one figure per micro-batch, summed across state
    * operators). `spark.sql.streaming.numRecentProgressUpdates` bounds
    * the history (default 100 batches); for a long-lived job read each
    * `lastProgress` into a metrics sink instead of polling this. */
  def droppedByWatermark(q: StreamingQuery): Long =
    q.recentProgress.iterator
      .flatMap(_.stateOperators)
      .map(_.numRowsDroppedByWatermark)
      .sum
}
