package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Streaming twin of [[graft.operators.Dedup.jaccardIncrementalFromStore]]
  * PLUS [[graft.operators.Dedup.appendShingles]]: every micro-batch of
  * documents is probed against the persisted shingle store for its best
  * EARLIER neighbor by EXACT word-shingle jaccard, then the batch's own
  * shingles are appended so later batches see it — the exact-verified
  * twin of [[IncrementalDedupStream]] (whose banded probe estimates
  * similarity from signature collisions; this computes true jaccard
  * from the stored rows).
  *
  * Same 100 TB ingest shape: the store is the only state (bucketed on
  * the probe key `sh`, never re-read in full — the probe broadcasts the
  * batch into the bucketed scan), per-trigger work is ∝ batch size, and
  * probe-then-append order means a batch never matches itself
  * (within-batch duplicates are [[DedupStream.exactDedup]]'s job,
  * composed upstream).
  *
  * TWO contracts stricter than the signature twin's, both inherited
  * from [[graft.operators.Dedup.appendShingles]] and restated here
  * because the STREAM is what a deployment actually runs:
  *  - the store must be CREATED with `minDf = 1`
  *    (`Dedup.persistShingles(..., minDf = 1)`) — an early batch's
  *    singleton shingle may be exactly what a later batch matches;
  *  - replayed micro-batches are NOT harmless (jaccard `inter` counts
  *    rows, unlike the signature store's DISTINCT candidate pairs).
  *    `foreachBatch`'s batch-id is not consulted here, so crash-replay
  *    dedup is the caller's schedule: run
  *    [[graft.operators.Dedup.compactShingleStore]] between triggers
  *    and probes (its rewrite drops exact-duplicate rows), or accept
  *    the documented inflation window until the next compaction. */
object ShingleDedupStream {

  /** Start probing a `(doc_id, text)` stream against the shingle store
    * `table` (created by `Dedup.persistShingles(..., minDf = 1)`),
    * appending per-doc best-earlier-neighbor rows
    * (`doc_id, neighbor_id, jaccard` — docs sharing no shingle with the
    * store emit no row) to `flagsPath` and the batch's shingles to the
    * store. */
  def start(spark: SparkSession, docStream: DataFrame, table: String,
            flagsPath: String, checkpoint: String,
            shingleLen: Int = 3, maxShingleDf: Int = 1000): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Dedup.jaccardIncrementalFromStore(batch, spark, table,
            shingleLen, maxShingleDf)
          .write.mode("append").parquet(flagsPath)
        Dedup.appendShingles(batch, table, shingleLen, maxShingleDf)
        ()
      }
      .start()
}
