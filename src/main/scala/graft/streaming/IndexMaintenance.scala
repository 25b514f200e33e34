package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions._
import graft.functions.TextFunctions.preprocess

/** Incremental index maintenance: the streaming form of the reference's
  * POST /refresh-index (controllers/index_controller.py — there, a full
  * rebuild; here, new documents are embedded, assigned to the persisted
  * centroids, and appended to the partitioned posting lists as they
  * arrive). `IvfIndex.searchPersisted` over the growing index stays
  * correct because search prunes by partition directory, not by file
  * manifest.
  */
object IndexMaintenance {

  /** Assign one batch of `(vec_id, embedding)` rows to the persisted
    * centroids and append them to the partitioned posting lists — the
    * per-trigger body of [[start]], public so batch backfills (and the
    * compaction spec) reuse the exact streaming write path. */
  def appendBatch(batch: DataFrame, cents: DataFrame,
                  indexPath: String): Unit = {
    batch
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        (lit(1.0) - cosine_similarity(col("embedding"), col("cv")))
          .as("dist"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("centroid_id"), col("embedding")))
        .as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.centroid_id").as("centroid_id"))
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$indexPath/postings")
    ()
  }

  /** Start appending a document stream (`doc_id`, `text`) to a persisted
    * IVF index at `indexPath` (must already contain `/centroids`).
    * foreachBatch keeps the write idempotent per micro-batch and lets the
    * assignment reuse the batch DataFrame machinery. */
  def start(spark: SparkSession, docStream: DataFrame, indexPath: String,
            dim: Int = 64): StreamingQuery = {
    val cents = spark.read.parquet(s"$indexPath/centroids")
    docStream
      .select(col("doc_id").as("vec_id"),
        hash_embed(preprocess(col("text")), dim).as("embedding"))
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$indexPath/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendBatch(batch, cents, indexPath)
      }
      .start()
  }

  /** Compact a streamed-into index: every micro-batch append leaves up to
    * `shuffle.partitions` small files per posting partition, and after
    * weeks of triggers the open-file and manifest overhead dominates
    * search latency. Rewrites each partition whose file count exceeds
    * `maxFiles` down to `targetFiles` — ONLY oversized partitions are
    * touched, the rows (and so every search result) are unchanged, and
    * partitions compact independently so the pass parallelizes trivially
    * across a fleet. Hadoop `FileSystem` API throughout, so the same code
    * runs on HDFS/S3A. Returns the number of partitions compacted.
    *
    * NOT concurrency-safe with a live append stream: run it between
    * triggers (e.g. from the same foreachBatch every N batches) or while
    * the stream is down. The per-partition swap (write compacted tmp →
    * delete originals → move in) is not atomic either — a production
    * object-store deployment would version the partition directory and
    * flip a manifest pointer instead; the partition-local dataflow is
    * identical. */
  def compact(spark: SparkSession, indexPath: String, maxFiles: Int = 8,
              targetFiles: Int = 1): Int = {
    import org.apache.hadoop.fs.Path
    val postings = new Path(s"$indexPath/postings")
    val fs = postings.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(postings)) return 0
    val parts = fs.listStatus(postings).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("centroid_id="))
    var compacted = 0
    parts.foreach { p =>
      val files = fs.listStatus(p.getPath).filter(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (files.length > maxFiles) {
        val tmp = new Path(p.getPath.getParent, s".compact-${p.getPath.getName}")
        fs.delete(tmp, true)
        // a leaf partition dir reads as plain parquet (no partition
        // columns in the files — they go back into the same directory)
        spark.read.parquet(p.getPath.toString).coalesce(targetFiles)
          .write.mode("overwrite").parquet(tmp.toString)
        files.foreach(f => fs.delete(f.getPath, false))
        fs.listStatus(tmp)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .foreach(f => fs.rename(f.getPath,
            new Path(p.getPath, f.getPath.getName)))
        fs.delete(tmp, true)
        compacted += 1
      }
    }
    compacted
  }
}
