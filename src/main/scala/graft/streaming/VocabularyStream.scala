package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.functions.{fnv1a64, KmvBuffer}
import graft.functions.TextFunctions.{preprocess, tokens}

/** Streaming vocabulary tracking — the stateful twin of the batch
  * `kmv_distinct` sketch (`q_distinct_sketch`): a running distinct-token
  * estimate per shard over a document stream.
  *
  * State per shard is the KMV bottom-k set itself — exactly k longs, no
  * matter how many documents stream through — so the state store stays
  * bounded forever, which is the only vocabulary tracker an unbounded
  * ingest pipeline can run. Merging a micro-batch is the same set-union
  * the batch aggregate uses, so after any prefix of the stream the
  * estimate equals the batch sketch over the same rows (asserted in the
  * streaming spec).
  */
object VocabularyStream {

  case class TokenHash(shard: Long, h: Long)
  /** `n_seen` counts every hash offered (monotone across micro-batches —
    * the "how much have we ingested" axis the estimate is plotted
    * against, and the discriminator for "latest row per shard" in an
    * update-mode sink once the sketch saturates at k). */
  case class VocabEstimate(shard: Long, est_distinct: Long, kth_min: Long,
                           sketch_size: Int, n_seen: Long)
  case class VocabState(minima: Array[Long], seen: Long)

  /** `(doc_id, text, …)` stream → per-shard running vocabulary estimate
    * (one updated row per shard per micro-batch; use OutputMode.Update). */
  def vocabulary(docs: DataFrame, k: Int = 256, shards: Int = 4)
      : Dataset[VocabEstimate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashes = docs
      .select(pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        explode(tokens(preprocess(col("text")))).as("tok"))
      .select(col("shard"), fnv1a64(col("tok")).as("h"))
      .as[TokenHash]
    hashes.groupByKey(_.shard)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[TokenHash],
         state: GroupState[VocabState]) =>
          val buf = new KmvBuffer(k)
          var seen = 0L
          state.getOption.foreach { s =>
            s.minima.foreach(buf.add); seen = s.seen
          }
          rows.foreach { r => buf.add(r.h); seen += 1 }
          // ascending-unsigned order (TreeSet iteration); restoring via
          // add() above rebuilds the identical set
          val arr = new Array[Long](buf.set.size)
          var i = 0
          buf.set.forEach { x => arr(i) = x; i += 1 }
          state.update(VocabState(arr, seen))
          // same estimator (and overflow clamp) as the batch aggregate —
          // shared code keeps the two bit-identical by construction
          val (est, kth) = buf.estimate
          VocabEstimate(shard, est, kth, arr.length, seen)
      }
  }
}
