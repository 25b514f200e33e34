package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Streaming twin of [[graft.operators.Dedup.incrementalCandidatesFromStore]]:
  * every micro-batch of documents is probed against the persisted
  * signature store — near-dups of ANY earlier document are flagged,
  * across batches and across restarts — and the batch's own signatures
  * are then appended to the store so later batches see it.
  *
  * This is the production ingest-dedup shape at 100 TB: the store is the
  * only state (bucketed on the probe key, never re-read in full), each
  * trigger's work is ∝ batch size, and the flags land as an append-only
  * audit table a downstream filter consumes. Probe-then-append order
  * means a batch never matches itself — within-batch duplicates are
  * [[DedupStream.exactDedup]]'s job (compose them: exactDedup upstream,
  * this stream after). A replayed batch re-appends its signatures, which
  * [[graft.operators.Dedup.appendSignatures]] documents as harmless
  * (candidate pairs are distinct doc-id pairs).
  */
object IncrementalDedupStream {

  /** Start probing a `(doc_id, text)` stream against the signature store
    * `table` (created by `Dedup.persistSignatures`), appending per-doc
    * flag rows (`doc_id, n_base_candidates, min_base_partner,
    * is_dup_of_base`) to `flagsPath` and the batch signatures to the
    * store. */
  def start(spark: SparkSession, docStream: DataFrame, table: String,
            flagsPath: String, checkpoint: String,
            numHashes: Int = 128, bands: Int = 16, shingleLen: Int = 3,
            maxBucket: Int = 1000): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Dedup.incrementalCandidatesFromStore(batch, spark, table,
            numHashes, bands, shingleLen)
          .write.mode("append").parquet(flagsPath)
        Dedup.appendSignatures(batch, table, numHashes, bands, shingleLen,
          maxBucket)
        ()
      }
      .start()
}
