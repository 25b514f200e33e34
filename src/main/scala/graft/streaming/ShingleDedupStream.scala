package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
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
  * EXACTLY-ONCE, implemented (not just documented): jaccard `inter`
  * counts rows, so a crash-replayed append would inflate every later
  * probe touching the doubled rows (jaccard can exceed 1.0) — the one
  * replay the signature twin shrugs off (its candidates are DISTINCT
  * id pairs) but this stream must not. The batch body is therefore
  * guarded by the `foreachBatch` batch id, tracked in two tiny marker
  * files under the checkpoint (`markers/intent`, `markers/done` — the
  * [[graft.operators.Dedup.appendShingles]] scaladoc's mandated guard):
  *
  *  - `done ≥ batchId`: the whole body (flags + append) completed in a
  *    previous attempt; the replay is skipped outright.
  *  - `intent == batchId > done`: a previous attempt crashed MID-body.
  *    The flags write is idempotent (each batch overwrites its own
  *    `batch=<id>` subdirectory of `flagsPath`), the probe is immune to
  *    an already-appended own batch (the operator anti-joins the
  *    increment's ids off the base side), and the append runs only if a
  *    doc-id containment check against the store says the crashed
  *    attempt's append did NOT land — so every crash window replays to
  *    exactly-once effects. The containment check scans the store, which
  *    is why it runs ONLY on this rare replay path, never per trigger.
  *  - otherwise (the normal path): write `intent`, probe → flags →
  *    append, write `done`.
  *
  * The store must still be CREATED with `minDf = 1`
  * (`Dedup.persistShingles(..., minDf = 1)`) — an early batch's
  * singleton shingle may be exactly what a later batch matches — and
  * [[graft.operators.Dedup.compactShingleStore]] remains the scheduled
  * small-file compaction (the guard removes its correctness role; the
  * file-count role stays). */
object ShingleDedupStream {

  /** Start probing a `(doc_id, text)` stream against the shingle store
    * `table` (created by `Dedup.persistShingles(..., minDf = 1)`),
    * appending per-doc best-earlier-neighbor rows
    * (`doc_id, neighbor_id, jaccard` — docs sharing no shingle with the
    * store emit no row; a `batch` partition column carries the batch id)
    * to `flagsPath` and the batch's shingles to the store. */
  def start(spark: SparkSession, docStream: DataFrame, table: String,
            flagsPath: String, checkpoint: String,
            shingleLen: Int = 3, maxShingleDf: Int = 1000): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val markers = s"$checkpoint/markers"
        if (batchId > readMarker(spark, s"$markers/done")) {
          val crashedAttempt =
            readMarker(spark, s"$markers/intent") == batchId
          writeMarker(spark, s"$markers/intent", batchId)
          Dedup.jaccardIncrementalFromStore(batch, spark, table,
              shingleLen, maxShingleDf)
            .write.mode("overwrite").parquet(s"$flagsPath/batch=$batchId")
          val alreadyAppended = crashedAttempt && {
            // rare replay-after-crash path only: did the crashed
            // attempt's append land? Stream-unique doc ids make store
            // containment an exact witness.
            !spark.table(table)
              .join(broadcast(batch.select(col("doc_id"))), Seq("doc_id"),
                "left_semi")
              .isEmpty
          }
          if (!alreadyAppended)
            Dedup.appendShingles(batch, table, shingleLen, maxShingleDf)
          writeMarker(spark, s"$markers/done", batchId)
        }
        ()
      }
      .start()

  /** Read a batch-id marker file; -1 when absent (fresh checkpoint). */
  private def readMarker(spark: SparkSession, path: String): Long = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** Overwrite a batch-id marker file (single-writer: the stream). */
  private def writeMarker(spark: SparkSession, path: String,
                          batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(batchId.toString.getBytes("UTF-8"))
    finally out.close()
  }
}
