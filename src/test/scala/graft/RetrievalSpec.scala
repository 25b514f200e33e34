package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bm25, Pipeline, ProductQuantizer, Search}
import graft.sources.Tables

/** The lexical/hybrid retrieval family: BM25, RRF fusion, the
  * quality-mass mixture planner, and the PQ refine stage. */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  lazy val t = Tables(spark, sfDir)

  private def terms = Seq(
    (0L, "hash"), (0L, "join"), (0L, "table"),
    (1L, "window"), (1L, "agg"), (1L, "stream"))
    .toDF("query_id", "term")

  test("rerank: order follows the pairwise F1, not the stage-1 cosine") {
    import graft.operators.Rerank
    // query doc 0 + candidates; shortlist covers the whole corpus, so
    // the final order is EXACTLY the overlap-F1 order — asserted against
    // an in-test replay of the formula, with no cosine assumptions
    // (hash-bucket collisions can bend stage-1 scores, never stage 2)
    val texts = Map(
      0L -> "apple banana cherry date elder fig",
      10L -> "apple apple apple apple",          // multiset-close, set-poor
      11L -> "apple banana cherry z1 z2 z3 z4 z5 z6 z7 z8 z9",
      12L -> "apple banana cherry date elder fig", // exact copy: F1 = 1
      13L -> "nothing shared at all")
    val docs = texts.toSeq.map { case (id, s) => (id, s) }.toDF("doc_id", "text")
    def f1(a: String, b: String): Double = {
      val (x, y) = (a.split(" ").toSet, b.split(" ").toSet)
      if (x.size + y.size == 0) 0.0
      else 2.0 * x.intersect(y).size / (x.size + y.size)
    }
    val want = texts.keys.toSeq
      .sortBy(id => (-f1(texts(0L), texts(id)), id))
    val got = Rerank.rerankedSearch(docs, queryMaxId = 1, shortlist = 20,
      k = 10).collect()
    assert(got.map(_.getLong(2)).toSeq == want, s"order: ${got.toSeq}")
    // ce_score is the floored F1 of the pair, rank is contiguous
    got.foreach { r =>
      val expect = math.floor(f1(texts(0L), texts(r.getLong(2))) * 1e6) / 1e6
      assert(r.getDouble(3) == expect, s"ce of ${r.getLong(2)}")
    }
    assert(got.map(_.getLong(1)).toSeq == (1L to got.length).toSeq)
    // the planted flip actually flips: doc 10 out-cosines doc 11 on the
    // skewed multiset, but the PAIRWISE set overlap ranks 11 above 10
    val ret = got.map(r => r.getLong(2) -> r.getDouble(4)).toMap
    assert(ret(10L) > ret(11L), s"stage-1 scores: $ret")
    assert(got.map(_.getLong(2)).indexOf(11L) <
      got.map(_.getLong(2)).indexOf(10L))
  }

  test("lateInteraction: a full-coverage doc beats every single-topic doc") {
    import graft.operators.Rag
    // query doc 0 spans TWO topics across its chunks (128 tokens → 3
    // chunks at 64/48); doc 13 covers both topics verbatim, docs 10/11
    // each cover one. MaxSim must rank the full-coverage doc above both
    // single-topic docs — the aspect-wise max a pooled single vector
    // cannot express. Self vs the identical doc 13 tie-breaks by id.
    val topicX = (1 to 64).map(i => s"xx$i").mkString(" ")
    val topicY = (1 to 64).map(i => s"yy$i").mkString(" ")
    val docs = Seq(
      (0L, s"$topicX $topicY"),
      (10L, topicX),
      (11L, topicY),
      (13L, s"$topicX $topicY"),
      (14L, "entirely unrelated filler content here"))
      .toDF("doc_id", "text")
    val got = Rag.lateInteraction(docs, k = 5, queryMaxId = 1).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byDoc = got.map(r => r._2 -> r._3).toMap
    // ranks 1-2: the query itself and its verbatim copy (equal integer
    // msum = 3 full-match aspects, id tie-break), in that order
    assert(got.take(2).map(_._2).toSeq == Seq(0L, 13L), s"got ${got.toSeq}")
    assert(byDoc(0L) == byDoc(13L) && byDoc(0L) >= 2.999997)
    // the full-coverage doc strictly beats both single-topic docs
    assert(byDoc(13L) > byDoc(10L) && byDoc(13L) > byDoc(11L))
    // ranks are contiguous and scores non-increasing
    assert(got.map(_._1).toSeq == (1L to got.length).toSeq)
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.reverse.toSeq)
  }

  test("lateInteraction plan gate: per-aspect max collapses MAP-SIDE") {
    import graft.operators.Rag
    // the scale contract: shuffle rows ∝ query_chunks × docs, NEVER raw
    // corpus chunk pairs — which holds iff the per-aspect max has a
    // PARTIAL aggregate below its exchange. A refactor that loses the
    // partial (e.g. an expression the combiner can't split) would ship
    // every (corpus_chunk × query_chunk) row across the wire; this gate
    // makes that a test failure, not a prod incident.
    val df = Rag.lateInteraction(t.documents)
    val findings = PlanDoctor.audit(df)
    assert(!findings.exists(_.rule == "missing-partial-aggregate"),
      findings.mkString("\n"))
    assert(!findings.exists(_.severity == "error"), findings.mkString("\n"))
    // affirmative form: the plan really does contain map-side partials
    // (the per-aspect partial_max and the cross-aspect partial_sum)
    val plan = planOf(df)
    assert(plan.contains("partial_max"), plan)
    assert(plan.contains("partial_sum"), plan)
  }

  test("contextPack: prefix-packed shortlist under the token budget") {
    import graft.operators.Rag
    val budget = 150L
    val rows = Rag.contextPack(t.documents, budget = budget).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      // contiguous ranks, chunk costs within the window size
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.forall(r => r.getLong(4) >= 1 && r.getLong(4) <= 64))
      // cum is the exact prefix sum; kept is the budget compare and
      // therefore a PREFIX of the ranking (costs are positive)
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(4)
        assert(r.getLong(5) == cum, s"q$q cum at rank ${r.getLong(1)}")
        assert(r.getBoolean(6) == (cum <= budget))
      }
      assert(sorted.head.getBoolean(6) ||
        sorted.head.getLong(4) > budget, s"q$q keeps nothing it could")
    }
  }

  test("rerank: results invariant to batch size and partitioning") {
    import graft.operators.Rerank
    val docs = t.documents.limit(60)
    val base = Rerank.rerankedSearch(docs, queryMaxId = 3).collect().toSeq
    val tiny = Rerank.rerankedSearch(docs, queryMaxId = 3, batchSize = 1)
      .collect().toSeq
    val parts = Rerank.rerankedSearch(docs.repartition(7), queryMaxId = 3)
      .collect().toSeq
    assert(base == tiny, "batchSize must not change results")
    assert(base == parts, "partitioning must not change results")
    assert(base.nonEmpty)
  }

  test("bm25: every hit contains a query term, ranks contiguous, scores non-increasing") {
    val hits = Bm25.topK(t.documents, terms, topK = 10).collect()
    assert(hits.nonEmpty)
    val byQ = hits.groupBy(_.getLong(0))
    for ((_, rows) <- byQ) {
      assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length).toSeq)
      val scores = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(_ > 0.0))
    }
    // membership: a returned doc matches at least one of its query's terms
    val qt = terms.collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val texts = t.documents
      .select($"doc_id", graft.functions.TextFunctions.tokens(
        graft.functions.TextFunctions.preprocess($"text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    hits.foreach { r =>
      val (q, d) = (r.getLong(0), r.getLong(2))
      assert(texts(d).intersect(qt(q)).nonEmpty, s"doc $d has no term of query $q")
    }
  }

  test("bm25: rarer terms weigh more (idf), term saturation bounds tf (k1)") {
    val docs = Seq(
      (0L, "rare common"), // rare term → highest score on the rare query
      (1L, "common stuff"),
      (2L, "common common common common common common filler"),
      (3L, "other words entirely")).toDF("doc_id", "text")
    val q = Seq((0L, "rare"), (1L, "common")).toDF("query_id", "term")
    val res = Bm25.topK(docs, q, topK = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // rare query: only doc 0 matches
    assert(res.filter(_._1 == 0L).map(_._3).toSeq == Seq(0L))
    // common query: df=3, and the rare-doc's idf(rare) doesn't leak in;
    // doc 2 has tf=6 but long dl — saturation keeps its lead bounded
    val common = res.filter(_._1 == 1L)
    assert(common.map(_._3).toSet == Set(0L, 1L, 2L))
    val s2 = common.find(_._3 == 2L).get._4
    val s0 = common.find(_._3 == 0L).get._4
    assert(s2 > s0, "higher tf must still outrank tf=1")
    assert(s2 < s0 * (1.25 + 1.0), "k1 saturation bounds the tf advantage")
  }

  test("bm25 plan: query-term restriction and df join broadcast, no corpus-side sort") {
    val plan = planOf(Bm25.topK(t.documents, terms, topK = 10))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the ranking rides the bounded-heap aggregate, not a window sort
    assert(plan.contains("top_k_by_score"), plan)
    assert(!plan.contains("WindowGroupLimit"), plan)
  }

  test("bm25 persisted index: identical rankings, zero corpus access on probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    Bm25.persist(t.documents, dir)
    val probe = Bm25.topKFrom(Bm25.load(spark, dir), terms, topK = 10)
    assert(probe.collect().toSeq ==
      Bm25.topK(t.documents, terms, topK = 10).collect().toSeq)
    // build-once/search-many: the probe plan reads the persisted
    // postings/stats, never the documents table
    assert(!planOf(probe).contains("documents.parquet"),
      "probe must not rescan the corpus")
  }

  test("rrf fusion: exact grid sums, overlap wins, n_lists counts membership") {
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 11L, 1L), (0L, 13L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val rows = Search.rrfFuse(a, b, topK = 4).collect()
      .map(r => r.getLong(2) ->
        (r.getLong(1), r.getDouble(3), r.getLong(4))).toMap
    def g(rk: Long) = math.floor(1.0 / (60.0 + rk) * 1e9) / 1e9
    // doc 11 (ranks 2+1) beats doc 10 (rank 1 in one list only)
    assert(rows(11L)._1 == 1L)
    assert(math.abs(rows(11L)._2 - (g(2) + g(1))) < 1e-12)
    assert(rows(11L)._3 == 2L)
    assert(rows(10L)._3 == 1L)
    assert(math.abs(rows(10L)._2 - g(1)) < 1e-12)
    // doc 12 in both lists at rank 3+3 still beats single-list doc 10
    assert(rows(12L)._1 == 2L && rows(10L)._1 > 2L)
  }

  test("rrfSweep: k dials single-list winners toward consensus docs") {
    // doc 200 sits mid-list in BOTH rankings; 100/300 each lead one
    // list. Low k rewards the leaders (consensus share 0); high k
    // rewards membership count (200 rises to rank 1)
    val a = Seq((1L, 100L, 1L), (1L, 200L, 5L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 300L, 1L), (1L, 200L, 6L)).toDF("query_id", "doc_id", "rank")
    val got = Search.rrfSweep(a, b, ks = Seq(1, 1000), topK = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // k=1: top-2 = {100, 300} (the two leaders; 200's 1/6+1/7 loses)
    assert(got(1L) == ((1L, 2L, 0.0, 0.5, 0.5)), got(1L))
    // k=1000: 200 ≈ 2/k beats 1/k leaders; 100 wins the leader tie on
    // doc_id -> top-2 = {200, 100}: consensus 1/2, lexical overlap 1/2
    // (100 only; 200 is OUTSIDE a's top-2), vector overlap 0
    assert(got(1000L) == ((1L, 2L, 0.5, 0.5, 0.0)), got(1000L))
  }

  test("mix budget: weights sum to ~1, oversubscribed sources cap at 1, yields consistent") {
    val plan = Pipeline.mixBudget(t.documents).collect()
    assert(plan.length > 1)
    val wsum = plan.map(_.getDouble(4)).sum
    assert(wsum <= 1.0 + 1e-9 && wsum > 1.0 - plan.length * 1e-6 - 1e-9)
    plan.foreach { r =>
      val (ntok, kf, exp) = (r.getLong(2), r.getDouble(5), r.getLong(6))
      assert(kf >= 0.0 && kf <= 1.0)
      assert(exp == math.floor(kf * ntok).toLong)
    }
    // budget respected in expectation: total expected yield ≤ corpus/2
    // (keep_frac caps at 1 so a surplus source can't overspend another's)
    val totTok = plan.map(_.getLong(2)).sum
    assert(plan.map(_.getLong(6)).sum <= (0.5 * totTok).toLong + plan.length)
  }

  test("pq refine: hits come from the PQ shortlist, re-ranked by exact cosine") {
    val qs = t.embeddings.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val refined = ProductQuantizer.searchRefined(qs, t.embeddings).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val shortlist = ProductQuantizer.search(qs, t.embeddings, topK = 20)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(refined.nonEmpty)
    refined.foreach { case (q, _, v, _) =>
      assert(shortlist.contains((q, v)), s"($q,$v) not in PQ top-20") }
    // exact scores: each refined score equals the true cosine, so the
    // refine stage fixed any reconstruction-induced score error
    val exact = qs.crossJoin(t.embeddings)
      .select($"query_id", $"vec_id",
        (floor(graft.functions.cosine_similarity($"qv", $"embedding") * 1e6) / 1e6)
          .as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    refined.foreach { case (q, _, v, s) =>
      assert(math.abs(exact((q, v)) - s) < 1e-12) }
    // within each query the ranking is by exact score desc
    refined.groupBy(_._1).foreach { case (_, rows) =>
      val ss = rows.sortBy(_._2).map(_._4)
      assert(ss.zip(ss.tail).forall { case (a, b) => a >= b })
    }
  }
}
