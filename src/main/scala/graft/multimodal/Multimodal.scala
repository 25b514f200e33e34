package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, features extracted per partition.
  *
  * The Spark side — schema, partition-parallel batch iteration, typed
  * output — is real and tested. The actual media decode is STUBBED
  * (`decodeStub`): this container has no image/audio codecs, so a
  * deterministic fake stands in where libjpeg/ffmpeg would be called.
  * Swapping in a real decoder changes only that one function.
  */
object Multimodal {

  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      checksum: Long,
      width: Int,    // stub "decoded" dimensions
      height: Int,
      features: Array[Float])

  /** STUB decoder: deterministic pseudo-decode of a binary payload.
    * Replace with a real codec call in production. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    var checksum = 0xcbf29ce484222325L
    payload.foreach(b => checksum = (checksum ^ (b & 0xffL)) * 0x100000001b3L)
    val width = 16 + (math.abs(checksum % 64)).toInt
    val height = 16 + (math.abs((checksum >> 8) % 64)).toInt
    val features = Array.tabulate(8) { i =>
      (((checksum >>> (8 * i)) & 0xffL).toFloat / 255.0f)
    }
    (width, height, features)
  }

  private def checksum64(payload: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    payload.foreach(b => h = (h ^ (b & 0xffL)) * 0x100000001b3L)
    h
  }

  /** `(doc_id, payload binary)` → typed features, one decoder instance per
    * partition (the shape a real codec needs: init once, stream batches). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.map { case (id, payload) =>
          val (w, h, feats) = decodeStub(payload)
          MediaFeatures(id, payload.length.toLong, checksum64(payload), w, h,
            feats)
        }
      }
  }

  /** Demo pipeline over `documents`: text bytes stand in for media
    * payloads (same plumbing, fake codec). */
  def documentFeatures(docs: DataFrame): DataFrame =
    extractFeatures(
      docs.select(col("doc_id"), col("text").cast("binary").as("payload")))
      .toDF()
      .orderBy(col("doc_id"))
}
