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

  case class FrameSample(
      doc_id: Long,
      frame_idx: Int,
      frame_hash: Long,
      width: Int,   // stub "decoded" frame dims
      height: Int,
      thumb_w: Int, // stub resize: half dims, floor 8
      thumb_h: Int)

  /** Frame sampling + thumbnail resize for "video" payloads: one media
    * row fans out to `nFrames` frame rows — the Spark-side shape a real
    * frame sampler has (per-partition decoder init, row explosion,
    * bounded fan-out). The decode is the same deterministic FNV stub as
    * [[decodeStub]]: frame i hashes the payload checksum bytes plus the
    * frame index, so the pipeline (and its oracle) is reproducible. */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.flatMap { case (id, payload) =>
          val cs = checksum64(payload)
          (0 until nFrames).iterator.map { i =>
            val frameBytes = Array.tabulate[Byte](8)(j =>
              ((cs >>> (8 * j)) & 0xffL).toByte) :+ i.toByte
            val fh = checksum64(frameBytes)
            val w = 16 + math.abs(fh % 64).toInt
            val h = 16 + math.abs((fh >> 8) % 64).toInt
            FrameSample(id, i, fh, w, h, math.max(8, w / 2), math.max(8, h / 2))
          }
        }
      }
  }

  /** Demo frame-sampling pipeline over `documents`. */
  def documentFrames(docs: DataFrame, nFrames: Int = 4): DataFrame =
    sampleFrames(
      docs.select(col("doc_id"), col("text").cast("binary").as("payload")),
      nFrames)
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Checksum-based payload dedup — the REAL (no codec, no stub) first
    * pass on a media corpus: byte-identical payloads collapse on their
    * md5, keeping the smallest doc_id as canonical. At 100 TB this is one
    * map-side-combined groupBy over (16-byte digest, id, length) — the
    * payloads themselves never shuffle — and it typically removes the
    * bulk of crawl duplication before any expensive perceptual pass. */
  def payloadDedup(media: DataFrame): DataFrame =
    media
      .select(md5(col("payload")).as("payload_md5"),
        col("doc_id").cast("long").as("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("payload_md5"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("dup_count"),
        min(col("n_bytes")).as("n_bytes"))
      .orderBy(col("payload_md5"))

  /** Demo payload-dedup pipeline over `documents` (text bytes stand in
    * for media payloads, same convention as [[documentFeatures]]). */
  def documentPayloadDedup(docs: DataFrame): DataFrame =
    payloadDedup(
      docs.select(col("doc_id"), col("text").cast("binary").as("payload")))

  /** Perceptual 64-bit fingerprint per payload: each decoded feature is
    * quantized back to a byte and the 8 bytes packed little-endian — the
    * dHash-shaped step between decode and the banded-hamming near-dup
    * join. With a REAL decoder the features survive re-encoding while the
    * raw bytes don't, so this fingerprint catches the near-dups
    * [[payloadDedup]]'s exact checksum misses; with the stub decoder the
    * features ARE the checksum bytes, so the fingerprint round-trips to
    * the checksum exactly — which is what makes the downstream query
    * oracle-replayable (the DuckDB side recomputes the same FNV64; the
    * byte → float → ×255 → round quantization is the identity on 0..255,
    * so replaying it is mathematically redundant). The plumbing —
    * per-partition decode, quantize, pack, band, verify — is the real,
    * tested shape a production perceptual pass has. */
  def perceptualFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.map { case (id, payload) =>
          val (_, _, feats) = decodeStub(payload)
          var fp = 0L
          var i = 0
          while (i < 8) {
            fp |= (math.round(feats(i) * 255.0f).toLong & 0xffL) << (8 * i)
            i += 1
          }
          (id, fp)
        }
      }.toDF("doc_id", "fp")
  }

  /** Perceptual near-dup pass over a media corpus: fingerprint each
    * payload, then the banded-hamming candidate join + exact verify +
    * per-doc rollup from [[graft.operators.Dedup.fingerprintNearDup]] —
    * the second funnel stage after [[payloadDedup]], catching payloads a
    * re-encode pushed off byte-identity (under a real decoder). Shuffle
    * carries only (doc_id, fp, band, h) — payloads never move. */
  def payloadNearDup(media: DataFrame, maxHamming: Int = 3,
                     maxBucket: Int = 1000): DataFrame =
    graft.operators.Dedup.fingerprintNearDup(
      perceptualFingerprints(media), maxHamming, maxBucket)

  /** Demo perceptual-near-dup pipeline over `documents` (text bytes stand
    * in for media payloads, same convention as [[documentFeatures]]). */
  def documentNearDup(docs: DataFrame): DataFrame =
    payloadNearDup(
      docs.select(col("doc_id"), col("text").cast("binary").as("payload")))

  /** The media half of a TWO-TOWER cross-modal retrieval stack (CLIP
    * shape: text tower and media tower project into one shared space,
    * retrieval is cosine in that space) — the integration surface a
    * real image/audio encoder implements, mirroring
    * [[graft.operators.Inference.BatchEncoder]] for binary payloads:
    * bounded batches via `mapPartitions` + `grouped`, one serialized
    * encoder per task, no shuffle, output schema identical to the text
    * path so every downstream consumer (KNN, IVF, PQ, dedup) is
    * modality-agnostic. */
  trait MediaEncoder extends Serializable {
    def dim: Int

    /** One call per bounded batch; must return exactly one vector (of
      * `dim` floats) per payload, in input order. */
    def encode(payloads: Seq[Array[Byte]]): Seq[Array[Float]]
  }

  /** Deterministic stand-in media tower: the stub decoder's 8 RAW
    * feature bytes (integers 0..255 — quantized features, exactly what
    * [[perceptualFingerprints]] packs) pushed through a frozen linear
    * projection HEAD into the shared `outDim` space, then L2-normalized
    * float32 — the projection-layer shape a real CLIP-style tower has
    * on top of its backbone. The weight matrix ships via ONE Spark
    * broadcast (the [[graft.operators.Inference.LinearEncoder]]
    * model-weights pattern); integer-valued weights × integer features
    * keep every product and double sum exact, so the DuckDB oracle
    * replays the algebra bit-for-bit. A real deployment swaps the
    * decode+matmul and keeps the plumbing. */
  final case class ProjectionMediaEncoder(
      weights: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]])
      extends MediaEncoder {
    def dim: Int = weights.value.length
    def encode(payloads: Seq[Array[Byte]]): Seq[Array[Float]] = {
      val w = weights.value // one fetch per executor (broadcast-cached)
      payloads.map { p =>
        val cs = checksum64(p)
        val x = Array.tabulate(8)(i => ((cs >>> (8 * i)) & 0xffL).toDouble)
        val y = new Array[Double](w.length)
        var j = 0
        while (j < w.length) {
          var s = 0.0; var i = 0
          val row = w(j)
          while (i < row.length) { s += row(i) * x(i); i += 1 }
          y(j) = s; j += 1
        }
        graft.operators.Inference.l2ToFloat(y)
      }
    }
  }

  object ProjectionMediaEncoder {
    /** Frozen stand-in head: the same integer-valued weight formula as
      * `Inference.LinearEncoder.frozen` (`w(j,i) = ((i·31 + j·17) mod
      * 13) − 6`), shaped outDim × 8 for the stub feature width. */
    def frozen(spark: org.apache.spark.sql.SparkSession,
               outDim: Int = 64, inDim: Int = 8): ProjectionMediaEncoder =
      ProjectionMediaEncoder(spark.sparkContext.broadcast(
        Array.tabulate(outDim, inDim)((j, i) =>
          (((i * 31 + j * 17) % 13) - 6).toFloat)))
  }

  /** Run a [[MediaEncoder]] over `(doc_id, payload)` in bounded batches
    * → `(doc_id, embedding array<float>)` — the media twin of
    * [[graft.operators.Inference.encode]]; results are independent of
    * batchSize and partitioning (spec-pinned). */
  def encodeMedia(media: DataFrame, encoder: MediaEncoder,
                  batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val vs = encoder.encode(batch.map(_._2))
          require(vs.length == batch.length,
            s"encoder returned ${vs.length} vectors for ${batch.length} payloads")
          batch.iterator.zip(vs.iterator).map { case ((id, _), v) => (id, v) }
        }
      }
      .toDF("doc_id", "embedding")
  }

  /** Cross-modal retrieval: TEXT queries against a MEDIA corpus — the
    * composition that makes multimodal columns first-class on the query
    * side. Query tower = the `hash_embed` text encoder; media tower =
    * `encoder`; retrieval = exact cosine top-k via the one-scan
    * broadcast-queries shape of [[graft.operators.Search.bruteForceTopK]]
    * (bounded per-partition heaps, shuffle ∝ queries × k — the media
    * corpus is scanned ONCE and payloads never shuffle; at index-serve
    * scale the encoded vectors drop into IVF/PQ/sign unchanged).
    *
    * @param queries `(query_id, qtext)` — pre-normalized query text
    * @param media   `(doc_id, payload binary)`
    */
  def crossModalSearch(queries: DataFrame, media: DataFrame,
                       encoder: MediaEncoder, k: Int = 5,
                       batchSize: Int = 64): DataFrame =
    crossModalSearchFrom(queries,
      encodeMedia(media, encoder, batchSize)
        .select(col("doc_id").as("vec_id"), col("embedding")),
      k, encoder.dim)

  /** Encode and FREEZE the media index for the serve path — one media
    * pass, barriered, re-frozen on the index-rebuild cadence (the
    * [[graft.operators.Bm25.buildIndex]] convention). At index-serve
    * scale the frozen vectors drop into IVF/PQ/sign layouts unchanged. */
  def freezeMediaIndex(media: DataFrame, encoder: MediaEncoder,
                       batchSize: Int = 64): DataFrame = {
    import graft.operators.Barrier.BarrierOps
    encodeMedia(media, encoder, batchSize)
      .select(col("doc_id").as("vec_id"), col("embedding"))
      .barrier()
  }

  /** [[crossModalSearch]] against a pre-encoded `(vec_id, embedding)`
    * index — the serve-path entry the streaming twin calls per
    * micro-batch, so there is exactly one implementation of the
    * cross-modal ranking. `dim` is the shared-space width the text
    * tower embeds into (= the media encoder's output dim). */
  def crossModalSearchFrom(queries: DataFrame, index: DataFrame,
                           k: Int = 5, dim: Int = 64): DataFrame = {
    val qv = queries.select(col("query_id"),
      graft.functions.hash_embed(col("qtext"), dim).as("qv"))
    graft.operators.Search.bruteForceTopK(qv, index, k)
  }

  /** Per-source BYTE-LEVEL payload forensics: document count, byte count,
    * printable / control / high-bit byte shares and byte entropy — the
    * media-corruption gate run before any decode (a truncated file reads
    * as a control/high-bit spike, a mislabeled text-as-image source as
    * all-printable, an encrypted or random blob as entropy ≈ ln 256;
    * none of these need a codec, so the gate is decode-free and cheap).
    *
    * Scale shape: ONE corpus scan — [[graft.functions.ByteHist256]]
    * tallies each payload into a 256-cell array in a single codegen'd
    * pass (never a per-byte explode of the payload column, never O(n²)
    * `substring` indexing); a doc-marker cell (code 256) rides the same
    * array so the doc count needs no second scan. The explode lands in
    * a map-side-combined fold onto the bounded `(source, code)` domain
    * (≤ 257·|sources| cells), barriered once for the totals join.
    *
    * Exactness: byte-class shares are DECIMAL DIVs on the 1e-6 grid;
    * entropy folds per-cell `p·ln p` terms with p on the exact 1e-6
    * probability grid, each term floored to the 1e-8 grid LONG (|term|
    * ≤ 0.37e8, 256 cells — the sum can never overflow at ANY corpus
    * size, unlike count-based `n·ln n` terms), cells whose probability
    * rounds to zero contribute nothing in both engines.
    *
    * NULL payloads coalesce to the empty binary BEFORE the tally: a
    * NULL would otherwise null the whole histogram, drop the doc-marker
    * row, and silently exclude the doc from `n_docs` — while a COUNT(*)
    * oracle counts every row. With the coalesce, a NULL/empty payload
    * contributes its marker (counted doc) and zero byte cells. Edge
    * case, identical in both engines: a source whose payloads are ALL
    * empty has zero byte cells, so it vanishes from the output entirely
    * (there is no byte distribution to profile — and no 0/0 share). */
  def byteProfile(media: DataFrame): DataFrame = {
    import graft.functions.byte_hist256
    import graft.operators.Barrier.BarrierOps
    val cells = media
      .select(col("source"),
        posexplode(concat(
          byte_hist256(coalesce(col("payload"), lit(Array.emptyByteArray))),
          array(lit(1L)))))
      .filter(col("col") > 0)
      .select(col("source"), col("pos").cast("long").as("code"),
        col("col").as("cnt"))
      .groupBy(col("source"), col("code"))
      .agg(sum(col("cnt")).as("cnt"))
      .barrier()
    val tot = cells.groupBy(col("source")).agg(
      sum(when(col("code") === 256, col("cnt")).otherwise(0L)).as("n_docs"),
      sum(when(col("code") < 256, col("cnt")).otherwise(0L)).as("n_bytes"))
    val pd = col("pg").cast("double") / 1e6
    cells
      .filter(col("code") < 256)
      .join(tot, Seq("source"))
      .withColumn("pg",
        expr("cast(cnt as decimal(38,0)) * 1000000 div n_bytes")
          .cast("long"))
      .groupBy(col("source"), col("n_docs"), col("n_bytes"))
      .agg(
        sum(when(col("code").between(32, 126), col("cnt")).otherwise(0L))
          .as("printable"),
        sum(when(col("code") < 32 || col("code") === 127, col("cnt"))
          .otherwise(0L)).as("control"),
        sum(when(col("code") >= 128, col("cnt")).otherwise(0L)).as("highbit"),
        sum(when(col("pg") > 0, floor(pd * log(pd) * 1e8).cast("long"))
          .otherwise(0L)).as("sm"))
      .select(col("source"), col("n_docs"), col("n_bytes"),
        expr("cast(printable as decimal(38,0)) * 1000000 div n_bytes")
          .cast("double") / 1e6 as "printable_share",
        expr("cast(control as decimal(38,0)) * 1000000 div n_bytes")
          .cast("double") / 1e6 as "control_share",
        expr("cast(highbit as decimal(38,0)) * 1000000 div n_bytes")
          .cast("double") / 1e6 as "highbit_share",
        (-col("sm").cast("double") / 1e8).as("byte_entropy"))
      .transform(graft.Determinism.sorted(_)(col("source")))
  }

  /** Demo byte-profile pipeline over `documents` (text bytes stand in
    * for media payloads, same convention as [[documentFeatures]]; the
    * corpus is ASCII, so a SQL oracle replays bytes as char codes). */
  def documentByteProfile(docs: DataFrame): DataFrame =
    byteProfile(docs.select(col("source"),
      col("text").cast("binary").as("payload")))
}
