package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.TextFunctions.preprocess
import graft.multimodal.Multimodal

/** Streaming cross-modal serve path — the per-micro-batch twin of
  * [[graft.multimodal.Multimodal.crossModalSearch]]: the media tower
  * runs ONCE at index-build time ([[Multimodal.freezeMediaIndex]] — one
  * media pass through the encoder seam, payloads never touched again),
  * and each arriving micro-batch of raw text queries is cleaned,
  * embedded by the text tower, and ranked against the frozen index
  * through the SAME [[Multimodal.crossModalSearchFrom]] the batch path
  * uses.
  *
  * Per-trigger cost: one frozen-index scan (swap an IVF/PQ/sign layout
  * in for a pruned probe) + bounded per-query heaps. Queries are
  * stateless across batches — no watermark, no state store; re-freeze
  * on the media-ingest cadence.
  *
  * Fidelity contract (spec-proved): for any query batch, streamed
  * rankings are identical to the batch `crossModalSearch` over the
  * same media corpus. */
object MmSearchStream {

  /** Serve a stream of raw `(query_id, text)` queries against a frozen
    * media index, appending `(query_id, rank, vec_id, score)` rows to
    * `outPath` per batch. Queries whose cleaned text is empty are
    * dropped (zero vector — no cosine ranking). */
  def start(spark: SparkSession, queryStream: DataFrame, index: DataFrame,
            outPath: String, checkpoint: String, k: Int = 5,
            dim: Int = 64): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val qs = batch
          .filter(length(trim(preprocess(col("text")))) > 0)
          .select(col("query_id"), preprocess(col("text")).as("qtext"))
        Multimodal.crossModalSearchFrom(qs, index, k, dim)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
}
