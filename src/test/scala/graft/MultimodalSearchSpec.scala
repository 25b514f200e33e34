package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.ProjectionMediaEncoder

/** The cross-modal retrieval composition: media-encoder seam contract,
  * projection algebra, and the text-query → media top-k search. */
class MultimodalSearchSpec extends SparkSuite {
  import spark.implicits._

  private def mediaOf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  private val corpusRows: Seq[(Long, String)] = (0L until 40L).map(i =>
    i -> s"payload body $i with some distinguishing tail ${"x" * (i % 7).toInt}")

  test("encodeMedia: results invariant to batch size and partitioning") {
    val enc = ProjectionMediaEncoder.frozen(spark)
    val media = mediaOf(corpusRows)
    def vecs(df: org.apache.spark.sql.DataFrame, bs: Int) =
      Multimodal.encodeMedia(df, enc, batchSize = bs)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    val base = vecs(media, 64)
    assert(base.size == 40)
    assert(vecs(media, 1) == base)
    assert(vecs(media.repartition(7), 3) == base)
  }

  test("projection algebra: W·x over raw checksum bytes, L2 to float32") {
    val enc = ProjectionMediaEncoder.frozen(spark)
    val payload = "exact algebra probe".getBytes("UTF-8")
    // in-test replay: FNV-1a 64 checksum → 8 LE bytes → frozen W → L2
    var cs = 0xcbf29ce484222325L
    payload.foreach(b => cs = (cs ^ (b & 0xffL)) * 0x100000001b3L)
    val x = Array.tabulate(8)(i => ((cs >>> (8 * i)) & 0xffL).toDouble)
    val y = Array.tabulate(64) { j =>
      (0 until 8).map(i => (((i * 31 + j * 17) % 13) - 6).toDouble * x(i)).sum
    }
    var norm = 0.0
    y.foreach(v => norm += v * v)
    val inv = 1.0 / math.sqrt(norm)
    val want = y.map(v => (v * inv).toFloat).toSeq
    val got = enc.encode(Seq(payload)).head.toSeq
    assert(got == want)
    // and the same vector comes out of the DataFrame seam
    val viaSeam = Multimodal.encodeMedia(
      Seq((7L, payload)).toDF("doc_id", "payload"), enc)
      .collect().head.getSeq[Float](1).toSeq
    assert(viaSeam == want)
  }

  test("crossModalSearch: text queries → media top-k, ranked contract") {
    val media = mediaOf(corpusRows)
    val queries = Seq(
      (100L, "payload body 3 with some distinguishing tail"),
      (101L, "totally different wording here")).toDF("query_id", "qtext")
    val got = Multimodal.crossModalSearch(queries, media,
      ProjectionMediaEncoder.frozen(spark), k = 5).collect()
    assert(got.length == 10) // 2 queries × k
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to 5L))
      val scores = byRank.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      scores.foreach(s => assert(s == math.floor(s * 1e6) / 1e6))
      assert(rows.map(_.getLong(2)).distinct.length == 5)
    }
  }

  test("media vectors are unit-length in the shared space") {
    val enc = ProjectionMediaEncoder.frozen(spark)
    val vs = Multimodal.encodeMedia(mediaOf(corpusRows.take(10)), enc)
      .collect().map(_.getSeq[Float](1))
    vs.foreach { v =>
      assert(v.length == 64)
      val n = v.map(f => f.toDouble * f.toDouble).sum
      assert(math.abs(n - 1.0) < 1e-6, s"norm $n")
    }
  }

  test("frozen media index drops into IVF: full probe == exact ranking") {
    // the composition gate behind mm_ivf_search/mm_recall: the SAME
    // frozen (vec_id, embedding) table served to IvfIndex.search must,
    // when every posting list is probed (nprobe = nCentroids), return
    // exactly bruteForceTopK's ranking — proving the media vectors ride
    // the index layout with no media-specific code and no value drift
    val enc = ProjectionMediaEncoder.frozen(spark)
    val idx = Multimodal.freezeMediaIndex(mediaOf(corpusRows), enc)
    val queries = Seq(
      (100L, "payload body 3 with some distinguishing tail"),
      (101L, "totally different wording here")).toDF("query_id", "qtext")
      .select(col("query_id"),
        graft.functions.hash_embed(col("qtext"), 64).as("qv"))
    val exact = operators.Search.bruteForceTopK(queries, idx, 5)
      .collect().map(_.toSeq).toSeq
    val fullProbe = operators.IvfIndex.search(queries, idx,
      nCentroids = 8, nprobe = 8, k = 5).collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty && fullProbe == exact)
    // and the pruned probe's recall audit is well-formed: hits ≤ k,
    // recall on the 1e-6 grid
    val audit = operators.IvfIndex.recallAudit(queries, idx,
      nCentroids = 8, nprobe = 2, k = 5).collect()
    assert(audit.length == 2)
    audit.foreach { r =>
      val (hits, rec) = (r.getLong(1), r.getDouble(2))
      assert(hits >= 0L && hits <= 5L)
      assert(rec == math.floor(hits / 5.0 * 1e6) / 1e6)
    }
  }

  test("sign-bit layout over the frozen media index: Hamming contract") {
    val enc = ProjectionMediaEncoder.frozen(spark)
    val idx = Multimodal.freezeMediaIndex(mediaOf(corpusRows), enc)
    val queries = Seq((100L, "payload body 3 with some distinguishing tail"))
      .toDF("query_id", "qtext")
      .select(col("query_id"),
        graft.functions.hash_embed(col("qtext"), 64).as("qv"))
    val got = operators.Search.signTopK(queries, idx, k = 5).collect()
    assert(got.length == 5)
    val hams = got.sortBy(_.getLong(1)).map(_.getLong(3))
    assert(hams.zip(hams.tail).forall { case (a, b) => a <= b })
    hams.foreach(h => assert(h >= 0L && h <= 64L))
  }

  test("byteProfile: exact class shares and grid entropy per source") {
    val media = Seq(
      // source a: "aa b" twice = bytes {a:4, ' ':2, b:2}, n=8 — the
      // probability grid reads p(a)=0.5, p(' ')=p(b)=0.25
      ("a", "aa b"), ("a", "aa b"),
      // source b: half printable, half control (newlines)
      ("b", "x\n"), ("b", "y\n"))
      .toDF("source", "text")
      .select(col("source"), col("text").cast("binary").as("payload"))
    val got = Multimodal.byteProfile(media).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    // entropy(1/2,1/4,1/4): each term floors to -34657360 on the 1e-8
    // grid (0.5·ln 0.5 = 0.25·ln 0.25 = -0.3465735903), sum of three
    assert(got("a") == ((2L, 8L, 1.0, 0.0, 0.0, 1.0397208)), got("a"))
    val (nb, bytesB, prB, ctB, hbB, entB) = got("b")
    assert((nb, bytesB, prB, ctB, hbB) == ((2L, 4L, 0.5, 0.5, 0.0)),
      got("b"))
    // two equiprobable classes (x|y vs \n): entropy near ln 2... for the
    // exact grid: p(x)=p(y)=0.25, p(\n)=0.5 — same cell values as "a"
    assert(entB == 1.0397208, s"entropy $entB")
  }

  test("byteProfile: NULL payload still counts its doc; all-empty source " +
    "vanishes (no byte distribution to profile)") {
    val spark0 = spark
    import spark0.implicits._
    val media = Seq(
      ("a", Some("xy")), ("a", None), // NULL payload: counted doc, 0 bytes
      ("e", None), ("e", Some("")))   // all empty/NULL: no byte cells
      .toDF("source", "text")
      .select(col("source"), col("text").cast("binary").as("payload"))
    val rows = Multimodal.byteProfile(media).collect()
    // source e has nothing to profile and must not surface (nor 0/0)
    assert(rows.map(_.getString(0)).toSeq == Seq("a"), rows.toSeq)
    val Array(r) = rows
    // n_docs counts the NULL-payload doc (the COUNT(*) contract) ...
    assert(r.getLong(1) == 2L, s"n_docs ${r.getLong(1)}")
    // ... while the byte stats see only the real bytes
    assert(r.getLong(2) == 2L && r.getDouble(3) == 1.0, r.toSeq)
  }

  test("byteProfile: high-bit payload bytes land in the high-bit class") {
    val spark0 = spark
    import spark0.implicits._
    val media = Seq(("bin", Array[Byte](-1, -2, 65, 66)))
      .toDF("source", "payload")
    val Array(r) = Multimodal.byteProfile(media).collect()
    assert(r.getLong(2) == 4L)
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 0.0 &&
      r.getDouble(5) == 0.5, r.toSeq)
  }
}
