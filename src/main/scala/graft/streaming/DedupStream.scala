package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.preprocess

/** Structured-streaming twin of [[graft.operators.Dedup.exactGroups]]'
  * canonicalization: first-arrival wins per normalized-text hash.
  *
  * Uses `dropDuplicatesWithinWatermark` so the dedup state is BOUNDED —
  * a key is remembered only for the watermark horizon, which is the only
  * contract that survives an unbounded stream (exact global dedup over an
  * infinite stream needs infinite state; a horizon is what production
  * ingest dedup actually guarantees). Works unchanged on a batch frame
  * via plain `dropDuplicates` — see the streaming spec for both paths.
  */
object DedupStream {

  /** `(doc_id, ts, text, …)` stream → first document per text_hash within
    * the watermark horizon. */
  def exactDedup(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", md5(preprocess(col("text")).cast("binary")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")
}
