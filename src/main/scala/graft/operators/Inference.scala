package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftHash

/** The batch-inference seam: where a LEARNED encoder plugs into the
  * engine. The reference batch-encodes its corpus with a
  * sentence-transformer (`services/embedding_service.py:18`,
  * `services/index_service.py:66-68`); this engine substitutes a
  * deterministic hashing encoder (SURVEY §2 row 2) — the seam makes that
  * substitution EXPLICIT and swappable instead of baked in.
  *
  * Engine-side contract (the part Spark cares about, all real and
  * spec-pinned):
  *  - `mapPartitions` + `grouped(batchSize)`: the model sees bounded
  *    batches (the GPU/runtime-friendly shape), never row-at-a-time
  *    calls, and never more than one batch of text in flight per task;
  *  - one serialized encoder per task — no driver round-trips, no
  *    collect, no shuffle added (embedding is a narrow map);
  *  - output schema `(id, embedding array<float>)` identical to the
  *    `hash_embed` expression path, so every consumer (KNN, IVF, PQ,
  *    semantic dedup) is agnostic to which encoder made the vectors;
  *  - results must be independent of batchSize and partitioning — pinned
  *    by spec, which is what makes the seam safe to re-batch at scale.
  *
  * A real deployment implements [[BatchEncoder]] over its inference
  * runtime (in-process JNI, Triton/gRPC, …) and changes nothing else.
  * [[HashEncoder]] is the deterministic stand-in: bit-identical to the
  * `hash_embed` Catalyst expression, so the DuckDB oracle replays the
  * seam end-to-end.
  */
object Inference {

  /** The whole integration surface for a learned encoder. */
  trait BatchEncoder extends Serializable {
    def dim: Int

    /** One call per bounded batch; must return exactly one vector (of
      * `dim` floats) per input, in input order. */
    def encode(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Plain-Scala replica of the `hash_embed` expression (whitespace
    * tokens → FNV-1a 64 bucket → counts → L2-normalized float32), same
    * double-accumulator operation order, so vectors are bit-identical
    * to the expression path (pinned in InferenceSpec). */
  final case class HashEncoder(dim: Int = 64) extends BatchEncoder {
    def encode(texts: Seq[String]): Seq[Array[Float]] = texts.map { text =>
      val acc = new Array[Double](dim)
      var start = 0; var i = 0; val len = text.length
      while (i <= len) {
        if (i == len || text.charAt(i) == ' ') {
          if (i > start) {
            val tok = text.substring(start, i)
            val h = GraftHash.fnv1a64(tok.getBytes("UTF-8"))
            val b = ((h % dim) + dim).toInt % dim
            acc(b) += 1.0
          }
          start = i + 1
        }
        i += 1
      }
      var norm = 0.0; i = 0
      while (i < dim) { norm += acc(i) * acc(i); i += 1 }
      val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
      val out = new Array[Float](dim)
      i = 0
      while (i < dim) { out(i) = (acc(i) * inv).toFloat; i += 1 }
      out
    }
  }

  /** Run `encoder` over `(idCol, textCol)` in bounded batches →
    * `(idCol, embedding)`. Null text encodes as the empty string (the
    * zero vector under [[HashEncoder]], matching the expression path's
    * null handling through the digest). */
  def encode(docs: DataFrame, encoder: BatchEncoder,
             idCol: String = "doc_id", textCol: String = "clean_text",
             batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"),
        coalesce(col(textCol).cast("string"), lit("")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val vs = encoder.encode(batch.map(_._2))
          require(vs.length == batch.length,
            s"encoder returned ${vs.length} vectors for ${batch.length} texts")
          batch.iterator.zip(vs.iterator).map { case ((id, _), v) => (id, v) }
        }
      }
      .toDF(idCol, "embedding")
  }
}
