package graft

import org.apache.spark.sql.functions._

class EngineSpec extends SparkSuite {

  lazy val engine = new SearchEngine(spark, sfDir)

  test("entry flagship returns search results") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val cols = SparkEntry.entry(spark).columns.toSeq
    assert(cols == Seq("rank", "doc_id", "score", "description"))
  }

  test("search returns k results ordered by rank, scores in [-1,1]") {
    val rows = engine.search("fast hash join on the big table", k = 5).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 5L))
    val scores = rows.map(_.getDouble(2))
    assert(scores.forall(s => s >= -1.0 && s <= 1.0))
    assert(scores.sameElements(scores.sorted.reverse)) // best first
  }

  test("search caps k at 20 (reference: search_controller.py k=min(k,20))") {
    assert(engine.search("table scan", k = 100).count() == 20)
  }

  test("search validates query text like the reference controller") {
    intercept[IllegalArgumentException](engine.search("   "))
    intercept[IllegalArgumentException](engine.search("x" * 501))
  }

  test("qaContext gates on distance < 0.4") {
    val row = engine.qaContext("fast hash join on the big table")
      .collect().head
    assert(!row.isNullAt(1))                 // best match always reported
    val accepted = row.getBoolean(3)
    val score = row.getDouble(2)
    assert(accepted == (1.0 - score < 0.4 + 1e-6) ||
           accepted == (1.0 - score < 0.4)) // gate consistent with score
  }

  test("healthCheck") {
    assert(engine.healthCheck())
  }

  test("queries and oracles are in 1:1 correspondence") {
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty, s"oracle without query: $orphanOracles")
    // a query without an oracle silently downgrades to the driver's
    // rows-only check — every operator this library claims must carry
    // the full hash oracle
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"query without oracle: $unchecked")
  }

  test("bench phase rows live outside every catalog namespace") {
    // phase rows decompose a headline row's wall — they must never leak
    // into the correctness catalog (no oracle) and the '#' convention
    // keeps them unambiguous in any key listing
    SparkEntry.benchPhases.keys.foreach { k =>
      assert(k.contains("#"), s"phase row without '#': $k")
      assert(k.split("#")(0).nonEmpty &&
        SparkEntry.queries.contains(k.split("#")(0)) ||
        k.startsWith("dedup_shingles"),
        s"phase row's parent is not a catalog row: $k")
      assert(!SparkEntry.queries.contains(k), s"phase key collides: $k")
      assert(!SparkEntry.oracleSql.contains(k),
        s"phase row grew an oracle (it must stay bench-only): $k")
    }
  }

  test("graft expressions callable from spark.sql after registration") {
    GraftSql.register(spark)
    val got = spark.sql(
      """SELECT cosine_similarity(array(cast(1.0 as float), cast(2.0 as float), cast(3.0 as float)),
        |                         array(cast(3.0 as float), cast(2.0 as float), cast(1.0 as float))) AS c,
        |       l2_norm(array(cast(3.0 as float), cast(4.0 as float))) AS n,
        |       poly_fingerprint('ab') AS fp""".stripMargin).head()
    assert(math.abs(got.getDouble(0) - 10.0 / 14.0) < 1e-12)
    assert(got.getDouble(1) == 5.0)
    assert(got.getLong(2) == 'a'.toLong * 31 + 'b'.toLong)
  }

  test("GraftExtensions installs all functions without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("rag chunk key: a >48k-token book never collides into the next doc") {
    import spark.implicits._
    // 1000 chunks at stride 48 → chunk_id reaches 1000; under the old
    // doc_id*1000 key, doc 0's chunk 1000 stole doc 1's chunk 0 id.
    // Under doc_id*2³² every doc owns a disjoint id block.
    val book = (0 until 48 * 1001).map(i => s"t$i").mkString(" ")
    val docs = Seq((0L, book), (1L, "short doc here")).toDF("doc_id", "text")
    val ids = operators.TextAnalysis.chunks(docs)
      .select((col("doc_id") * lit(4294967296L) + col("chunk_id"))
        .as("vec_id"), col("doc_id"))
      .as[(Long, Long)].collect()
    assert(ids.length == ids.map(_._1).distinct.length, "vec_id collision")
    // every vec_id decodes back to exactly its own document
    assert(ids.forall { case (v, d) => v / 4294967296L == d },
      "chunk escaped its doc's id block")
    assert(ids.count(_._2 == 0L) > 1000, "long doc must exceed 1000 chunks")
  }

  test("multimodal feature extraction: schema and determinism") {
    val t = sources.Tables(spark, sfDir)
    val f = multimodal.Multimodal.documentFeatures(t.documents)
    assert(f.columns.toSeq ==
      Seq("doc_id", "n_bytes", "checksum", "width", "height", "features"))
    val twice = multimodal.Multimodal.documentFeatures(t.documents)
    assert(f.orderBy(col("doc_id")).collect()
      .sameElements(twice.orderBy(col("doc_id")).collect()))
    val row = f.orderBy(col("doc_id")).head()
    assert(row.getSeq[Float](5).length == 8)
    assert(row.getLong(1) > 0)
  }

  test("multimodal frame sampling: bounded fan-out, per-frame hashes, thumbs") {
    val t = sources.Tables(spark, sfDir)
    val nDocs = t.documents.count()
    val fr = multimodal.Multimodal.documentFrames(t.documents, nFrames = 4)
    assert(fr.count() == nDocs * 4)
    // each doc yields 4 distinct frame indexes with distinct hashes
    val perDoc = fr.groupBy(col("doc_id"))
      .agg(countDistinct(col("frame_idx")).as("ni"),
           countDistinct(col("frame_hash")).as("nh"))
    assert(perDoc.filter(col("ni") =!= 4L).count() == 0)
    assert(perDoc.filter(col("nh") =!= 4L).count() == 0)
    // thumbnails are the half-resolution resize with a floor of 8
    val bad = fr.filter(
      col("thumb_w") =!= greatest(lit(8), (col("width") / 2).cast("int")) ||
      col("thumb_h") =!= greatest(lit(8), (col("height") / 2).cast("int")))
    assert(bad.count() == 0)
  }
}
