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

  /** Whitespace tokens → FNV-1a 64 bucket → raw counts (the shared
    * feature front of both stand-in encoders; bit-identical to the
    * `hash_embed` expression's bucketing). */
  private def bucketCounts(text: String, dim: Int): Array[Double] = {
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
    acc
  }

  /** Index-order L2 normalization to float32 — same double-accumulator
    * operation order as the `hash_embed` expression (inv FIRST, then one
    * multiply per entry), so both encoders stay bit-replayable. Shared
    * with the media tower ([[graft.multimodal.Multimodal]]) so every
    * encoder seam normalizes identically. */
  private[graft] def l2ToFloat(y: Array[Double]): Array[Float] = {
    var norm = 0.0; var i = 0
    while (i < y.length) { norm += y(i) * y(i); i += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](y.length)
    i = 0
    while (i < y.length) { out(i) = (y(i) * inv).toFloat; i += 1 }
    out
  }

  /** Plain-Scala replica of the `hash_embed` expression (whitespace
    * tokens → FNV-1a 64 bucket → counts → L2-normalized float32), same
    * double-accumulator operation order, so vectors are bit-identical
    * to the expression path (pinned in InferenceSpec). */
  final case class HashEncoder(dim: Int = 64) extends BatchEncoder {
    def encode(texts: Seq[String]): Seq[Array[Float]] =
      texts.map(t => l2ToFloat(bucketCounts(t, dim)))
  }

  /** A LEARNED-weights encoder through the same seam: a dense linear
    * projection `y = W·x` over the bucket-count features, L2-normalized
    * — the shape of the final pooling/projection layer of a real text
    * encoder (reference: `services/embedding_service.py:18`'s
    * sentence-transformer). The weight matrix is shipped to executors
    * via ONE Spark broadcast (fetched once per executor, never re-read
    * per partition or per batch) — exactly how frozen model weights
    * ride along a 1000-executor encode job; a Triton/JNI encoder swaps
    * the matmul and keeps the plumbing.
    *
    * Weights are float32 (model-typical). [[LinearEncoder.frozen]] pins
    * an INTEGER-VALUED frozen matrix so every product and double sum is
    * exact and the DuckDB oracle replays the algebra bit-for-bit
    * (`q_embed_linear`) — determinism by value choice, not by luck. */
  final case class LinearEncoder(
      weights: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]],
      inDim: Int = 64) extends BatchEncoder {
    def dim: Int = weights.value.length
    def encode(texts: Seq[String]): Seq[Array[Float]] = {
      val w = weights.value // one fetch per executor (broadcast-cached)
      texts.map { text =>
        val x = bucketCounts(text, inDim)
        val y = new Array[Double](w.length)
        var j = 0
        while (j < w.length) {
          var s = 0.0; var i = 0
          val row = w(j)
          while (i < inDim) { s += row(i) * x(i); i += 1 }
          y(j) = s; j += 1
        }
        l2ToFloat(y)
      }
    }
  }

  object LinearEncoder {
    /** The frozen stand-in weights: w(j,i) = ((i·31 + j·17) mod 13) − 6
      * — integer-valued (exact in float32 and in every double product /
      * sum below), dense, full-rank-ish, and trivially replayable in
      * SQL. A deployment replaces this factory with a weight-file load;
      * nothing else changes. */
    def frozen(spark: org.apache.spark.sql.SparkSession,
               outDim: Int = 64, inDim: Int = 64): LinearEncoder =
      LinearEncoder(spark.sparkContext.broadcast(
        Array.tabulate(outDim, inDim)((j, i) =>
          (((i * 31 + j * 17) % 13) - 6).toFloat)), inDim)
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
