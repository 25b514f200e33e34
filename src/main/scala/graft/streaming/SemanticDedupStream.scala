package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Streaming twin of [[graft.operators.Dedup.semanticIncrementalFromStore]]:
  * every micro-batch of `(vec_id, embedding)` rows is probed against the
  * persisted blocked semantic base (frozen centroids + block-bucketed
  * members, built by [[graft.operators.Dedup.persistSemanticBlocks]]) —
  * the embedding-family analogue of [[IncrementalDedupStream]], which
  * covers only the minhash signature store.
  *
  * This is the embedding-ingest dedup shape at 100 TB: the base is the
  * only state (bucketed on the probe key `block`, never re-read beyond
  * the probed blocks, never re-blocked), each trigger's work is ∝ batch
  * size (the batch assigns against the frozen coarse→fine centroid
  * tables and broadcasts into the bucketed scan), and the flags land as
  * an append-only audit table a downstream filter consumes.
  *
  * Unlike [[IncrementalDedupStream]], the batch is NOT appended to the
  * base: the blocked store is a build-time artifact of its centroid
  * tables (frozen by contract — appending members without re-training
  * centroids would silently skew block occupancy), so increments probe
  * only, and a periodic [[graft.operators.Dedup.persistSemanticBlocks]]
  * rebuild absorbs accumulated mass — the SemDeDup daily-batch shape.
  * That also makes a replayed micro-batch trivially harmless: probing is
  * read-only, so the replay just overwrites its own flag rows' twins
  * (exact duplicates in an append-only audit log, deduplicated by any
  * downstream DISTINCT — the same tolerance the signature store
  * documents for its candidate pairs). */
object SemanticDedupStream {

  /** Start probing a `(vec_id, embedding)` stream against the blocked
    * base `table` (created by `Dedup.persistSemanticBlocks`), appending
    * per-vector flag rows (`vec_id, nn_id, nn_score, is_dup` — the
    * [[graft.operators.Dedup.semanticNeighbors]] contract with
    * neighbors drawn from the BASE only) to `flagsPath`. */
  def start(spark: SparkSession, vecStream: DataFrame, table: String,
            flagsPath: String, checkpoint: String,
            simThreshold: Double = 0.95): StreamingQuery =
    vecStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Dedup.semanticIncrementalFromStore(batch, spark, table,
            simThreshold)
          .write.mode("append").parquet(flagsPath)
        ()
      }
      .start()
}
