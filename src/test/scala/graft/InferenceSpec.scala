package graft

import org.apache.spark.sql.functions._
import graft.functions.{hash_embed, TextFunctions}
import graft.operators.Inference
import graft.sources.Tables

/** Pins the batch-inference seam's contract: bit-identity with the
  * `hash_embed` expression path, batch-size/partitioning invariance,
  * bounded batches, and the one-vector-per-input guard. */
class InferenceSpec extends SparkSuite {

  private def cleaned = Tables(spark, sfDir).documents
    .select(col("doc_id"), TextFunctions.preprocess(col("text")).as("clean_text"))

  private def collectVecs(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Seq[Float]] =
    df.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).toList.asInstanceOf[Seq[Float]]).toMap

  test("seam output is bit-identical to the hash_embed expression path") {
    val viaExpr = collectVecs(cleaned.select(col("doc_id"),
      hash_embed(col("clean_text"), 64).as("embedding")))
    val viaSeam = collectVecs(
      Inference.encode(cleaned, Inference.HashEncoder(64), batchSize = 37))
    assert(viaSeam.keySet === viaExpr.keySet)
    viaSeam.foreach { case (id, v) => assert(v === viaExpr(id), s"doc $id") }
  }

  test("results are invariant to batch size and partitioning") {
    val base = collectVecs(
      Inference.encode(cleaned, Inference.HashEncoder(64), batchSize = 1))
    Seq(7, 1000).foreach { bs =>
      val got = collectVecs(
        Inference.encode(cleaned.repartition(5), Inference.HashEncoder(64),
          batchSize = bs))
      assert(got === base, s"batchSize=$bs")
    }
  }

  test("encoder sees bounded batches, never single rows by default") {
    // a probe encoder that fails the task if a batch exceeds the bound
    val probe = new Inference.BatchEncoder {
      val dim = 4
      def encode(texts: Seq[String]): Seq[Array[Float]] = {
        require(texts.nonEmpty && texts.length <= 10,
          s"batch of ${texts.length} violates the bound")
        texts.map(_ => Array.fill(4)(0.5f))
      }
    }
    val n = Inference.encode(cleaned, probe, batchSize = 10).count()
    assert(n === cleaned.count())
  }

  test("a misbehaving encoder (wrong vector count) fails loudly") {
    val bad = new Inference.BatchEncoder {
      val dim = 4
      def encode(texts: Seq[String]): Seq[Array[Float]] =
        texts.drop(1).map(_ => Array.fill(4)(0.1f))
    }
    val e = intercept[org.apache.spark.SparkException] {
      Inference.encode(cleaned, bad, batchSize = 8).count()
    }
    assert(e.getMessage.contains("vectors") ||
      Option(e.getCause).exists(_.getMessage.contains("vectors")))
  }

  // --- the learned-weights (linear) encoder through the same seam ---

  test("linear encoder is invariant to batch size and partitioning") {
    val enc = Inference.LinearEncoder.frozen(spark)
    val base = collectVecs(Inference.encode(cleaned, enc, batchSize = 1))
    Seq(13, 500).foreach { bs =>
      val got = collectVecs(
        Inference.encode(cleaned.repartition(7), enc, batchSize = bs))
      assert(got === base, s"batchSize=$bs")
    }
  }

  test("linear encoder applies the broadcast weights (y = W·x, L2-normed)") {
    val sess = spark
    import sess.implicits._
    // 2-in/2-out identity weights: output = normalized bucket counts
    val id2 = Inference.LinearEncoder(
      spark.sparkContext.broadcast(
        Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))), inDim = 2)
    val df = Seq((1L, "a a b")).toDF("doc_id", "clean_text")
    val got = collectVecs(Inference.encode(df, id2, batchSize = 4))(1L)
    // counts land in the 2-bucket FNV grid; the normalized vector must
    // have unit L2 norm and the 2:1 count ratio preserved
    val norm = math.sqrt(got.map(v => v.toDouble * v).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(math.abs(got.max / got.min - 2.0f) < 1e-6f)
    // and the frozen grid really is the documented closed form
    val w = Inference.LinearEncoder.frozen(spark).weights.value
    assert(w(3)(5) === (((5 * 31 + 3 * 17) % 13) - 6).toFloat)
    assert(w.length === 64 && w(0).length === 64)
  }

  test("linear encoder output differs from the hash encoder (it's a model)") {
    val viaHash = collectVecs(
      Inference.encode(cleaned, Inference.HashEncoder(64), batchSize = 64))
    val viaLin = collectVecs(Inference.encode(cleaned,
      Inference.LinearEncoder.frozen(spark), batchSize = 64))
    assert(viaLin.keySet === viaHash.keySet)
    // same ids, same shape, different geometry
    assert(viaLin.exists { case (id, v) => v !== viaHash(id) })
    viaLin.values.foreach(v => assert(v.length === 64))
  }

  test("null text encodes as the zero vector (empty-string contract)") {
    val sess = spark
    import sess.implicits._
    val df = Seq((1L, "hello world"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "clean_text")
    val got = collectVecs(
      Inference.encode(df, Inference.HashEncoder(8), batchSize = 2))
    assert(got(2L).forall(_ == 0.0f))
    assert(got(1L).exists(_ != 0.0f))
  }
}
