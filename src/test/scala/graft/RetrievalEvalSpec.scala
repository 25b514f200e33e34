package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bm25, RetrievalEval}
import graft.functions.GraftHash

/** Graded ranking-quality eval (MRR@k / NDCG@k of BM25 vs dense vs RRF
  * hybrid): the planted fusion win, metric arithmetic, and the
  * leave-one-out contract. */
class RetrievalEvalSpec extends SparkSuite {
  import spark.implicits._

  private def bucket(tok: String, dim: Int = 64): Int = {
    val h = GraftHash.fnv1a64(tok.getBytes("UTF-8"))
    ((h % dim) + dim).toInt % dim
  }

  /** A corpus engineered so RRF fusion beats BOTH single systems:
    *  - doc 0 (the query): `qa c1 c2 c3` — one rare term + three common;
    *  - doc 1 (D, the only rel≥2 doc): query terms + one extra token;
    *  - doc 2 (X): the rare term spammed ×10 — BM25's tf-saturated rank-1
    *    false positive (rel 0: one distinct token);
    *  - doc 3 (Y): four tokens that COLLIDE bucket-for-bucket with the
    *    query's under the 64-bucket hash — the dense encoder's cos=1.0
    *    rank-1 false positive (rel 0: zero shared tokens, exactly the
    *    encoder-false-match failure hybrid search exists to cover);
    *  - docs 4..23: twenty common-term diluters (rel 1, below the MRR
    *    cut). Twenty of them on purpose: they push X past the dense
    *    top-20, so X's fused score is its bm25 contribution alone
    *    (f(61) < 2·f(60+r) for every diluter rank) and the fused
    *    ranking is exactly the ideal one.
    * BM25 ranks (X, D, …), dense ranks (Y, D, …); RRF puts D first:
    * 2·f(62) beats every competitor on the floored 1e-9 grid. */
  private lazy val planted: Seq[(Long, String)] = {
    val cand = (0 until 4000).map(i => f"w$i%04d")
    def collider(t: String): String =
      cand.find(c => c != t && bucket(c) == bucket(t)).get
    // four base tokens in four DISTINCT buckets
    val bases = scala.collection.mutable.ArrayBuffer.empty[String]
    val used = scala.collection.mutable.Set.empty[Int]
    val it = cand.iterator
    while (bases.size < 4 && it.hasNext) {
      val c = it.next()
      if (!used(bucket(c))) { bases += c; used += bucket(c) }
    }
    val Seq(qa, c1, c2, c3) = bases.toSeq
    // epsilon + 20 junk tokens OUTSIDE the query buckets (cosine-inert)
    val extras = cand.filter(c => !used(bucket(c)) && !bases.contains(c))
      .take(21)
    val eps = extras.head
    val junk = extras.tail
    val colliders = Seq(qa, c1, c2, c3).map(collider)
    assert(colliders.toSet.intersect(Set(qa, c1, c2, c3)).isEmpty)
    Seq(
      0L -> s"$qa $c1 $c2 $c3",
      1L -> s"$qa $eps $c1 $c2 $c3",
      2L -> Seq.fill(10)(qa).mkString(" "),
      3L -> colliders.mkString(" ")) ++
      junk.zipWithIndex.map { case (j, i) =>
        (4L + i) -> s"$c1 $c2 $c3 $j"
      }
  }

  private lazy val plantedDocs = planted.toDF("doc_id", "text")
  private lazy val plantedIdx = Bm25.buildIndex(plantedDocs)

  test("planted fusion win: hybrid MRR beats both single systems") {
    val per = RetrievalEval.perQuery(plantedDocs, plantedIdx, queryMaxId = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(per.keySet == Set("bm25", "dense", "hybrid_rrf"))
    // first_rel_rank: the relevant doc sits at 2 in BOTH single lists
    // (behind each list's engineered false positive) and at 1 fused
    assert(per("bm25").getLong(4) == 2L, s"bm25 ${per("bm25")}")
    assert(per("dense").getLong(4) == 2L, s"dense ${per("dense")}")
    assert(per("hybrid_rrf").getLong(4) == 1L, s"hybrid ${per("hybrid_rrf")}")
    val sum = RetrievalEval.summary(plantedDocs, plantedIdx, queryMaxId = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(sum("hybrid_rrf").getDouble(3) == 1.0)
    assert(sum("bm25").getDouble(3) == 0.5)
    assert(sum("dense").getDouble(3) == 0.5)
    assert(sum("hybrid_rrf").getDouble(3) > sum("bm25").getDouble(3))
    assert(sum("hybrid_rrf").getDouble(3) > sum("dense").getDouble(3))
    // and the fused ranking is the IDEAL one here: rel-2 doc first, the
    // rel-1 diluters next, both false positives demoted → NDCG = 1
    assert(sum("hybrid_rrf").getDouble(4) == 1.0)
    assert(sum("hybrid_rrf").getDouble(4) > sum("bm25").getDouble(4))
    assert(sum("hybrid_rrf").getDouble(4) > sum("dense").getDouble(4))
  }

  test("leave-one-out: no system ever retrieves the query's own doc") {
    val r = RetrievalEval.rankings(plantedDocs, plantedIdx, queryMaxId = 1)
      .collect()
    assert(r.nonEmpty)
    assert(!r.exists(row => row.getLong(1) == row.getLong(2)))
  }

  test("bm25 excludeSelfDoc drops the self-match but keeps corpus stats") {
    val docs = Seq(
      0L -> "alpha beta gamma",
      1L -> "alpha beta delta",
      2L -> "alpha epsilon zeta").toDF("doc_id", "text")
    val qt = Seq((0L, "alpha"), (0L, "beta")).toDF("query_id", "term")
    val idx = Bm25.buildIndex(docs)
    val base = Bm25.topKFrom(idx, qt).collect()
    val loo = Bm25.topKFrom(idx, qt, excludeSelfDoc = true).collect()
    // self-match was rank 1 (identical term set); now absent
    assert(base.head.getLong(2) == 0L)
    assert(!loo.exists(_.getLong(2) == 0L))
    // remaining docs keep the EXACT scores of the unfiltered run: df/idf
    // were computed before the self filter
    val baseScores = base.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    loo.foreach(r => assert(r.getDouble(3) == baseScores(r.getLong(2))))
    // and ranks compact to 1..n
    assert(loo.map(_.getLong(1)).toSeq == (1L to loo.length).toSeq)
  }

  test("metric arithmetic: DCG/IDCG/MRR replay on a hand-computed case") {
    val per = RetrievalEval.perQuery(plantedDocs, plantedIdx, queryMaxId = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val disc = RetrievalEval.discGrid(10)
    // ideal: rel 2 at rank 1, rel-1 diluters filling ranks 2..10
    val idcgI = 3L * disc(0) + (1 to 9).map(i => disc(i)).sum
    // hybrid ranking IS ideal: D first, diluters after, X/Y demoted
    val hybridDcg = per("hybrid_rrf").getDouble(6)
    assert(hybridDcg == idcgI.toDouble / 1e9)
    assert(per("hybrid_rrf").getDouble(7) == 1.0)
    // bm25: X(rel0) first, D at 2, diluters 3..10 — dcg hand-computed
    val bm25Dcg = 3L * disc(1) + (2 to 9).map(i => disc(i)).sum
    assert(per("bm25").getDouble(6) == bm25Dcg.toDouble / 1e9)
    val wantNdcg = math.floor(bm25Dcg.toDouble / idcgI.toDouble * 1e9) / 1e9
    assert(per("bm25").getDouble(7) == wantNdcg)
    // rr is the floored reciprocal grid at the first rel≥2 rank
    assert(per("bm25").getDouble(5) == RetrievalEval.rrGrid(10)(1).toDouble / 1e9)
  }

  test("cutoff table: MRR monotone in depth, @10 row equals the summary") {
    val t = sources.Tables(spark, sfDir)
    val idx = Bm25.buildIndex(t.documents)
    val cut = RetrievalEval.cutoffSummary(t.documents, idx).collect()
    assert(cut.length == 12) // 3 systems × 4 cutoffs
    // MRR@c can only grow with c (a first hit at rank r counts for all
    // cutoffs ≥ r); n_rel likewise
    cut.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val byC = rows.sortBy(_.getLong(1))
      val mrrs = byC.map(_.getDouble(4))
      assert(mrrs.zip(mrrs.tail).forall { case (a, b) => a <= b }, s"${byC.toSeq}")
      val nrel = byC.map(_.getLong(3))
      assert(nrel.zip(nrel.tail).forall { case (a, b) => a <= b })
    }
    // the deepest cutoff IS the @10 summary
    val sum = RetrievalEval.summary(t.documents, idx)
      .collect().map(r => r.getString(0) -> r).toMap
    cut.filter(_.getLong(1) == 10L).foreach { r =>
      val s = sum(r.getString(0))
      assert(r.getLong(3) == s.getLong(2), s"n_rel ${r.getString(0)}")
      assert(r.getDouble(4) == s.getDouble(3), s"mrr ${r.getString(0)}")
      assert(r.getDouble(5) == s.getDouble(4), s"ndcg ${r.getString(0)}")
    }
  }

  test("planted corpus at cutoff 1: only the fused system has its " +
    "relevant doc visible") {
    val cut = RetrievalEval.cutoffSummary(plantedDocs, plantedIdx,
      queryMaxId = 1).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    // both singles put a false positive at rank 1 (frr = 2): a 1-result
    // UI serves garbage from either — and the eval table SHOWS it
    assert(cut(("bm25", 1L)) == 0.0)
    assert(cut(("dense", 1L)) == 0.0)
    assert(cut(("hybrid_rrf", 1L)) == 1.0)
  }

  test("distill pairs: teacher positive, strict-margin hard negatives") {
    import graft.operators.Rerank
    val got = Rerank.distillPairs(plantedDocs, queryMaxId = 1).collect()
    assert(got.nonEmpty)
    // positive = the teacher-best doc (D, id 1); the #1 hard negative =
    // the hash-collision dense false positive (Y, id 3: retrieval score
    // 1.0, teacher 0) — exactly the confusable the student must learn
    val byRank = got.sortBy(_.getLong(3))
    byRank.foreach(r => assert(r.getLong(1) == 1L, s"pos $r"))
    assert(byRank.head.getLong(4) == 3L, s"neg1 ${byRank.head}")
    assert(byRank.head.getDouble(7) ==
      math.floor(8.0 / 9.0 * 1e6) / 1e6) // margin = pos_ce − 0
    // margins strictly positive, negatives ranked by retrieval score
    got.foreach { r =>
      assert(r.getDouble(7) > 0.0, s"margin $r")
      assert(r.getDouble(5) < r.getDouble(2), s"neg_ce < pos_ce $r")
    }
    val scores = byRank.map(_.getDouble(6))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(got.length <= 4)
  }

  test("distill pairs on the corpus tables: bounded, consistent") {
    import graft.operators.Rerank
    val t = sources.Tables(spark, sfDir)
    val got = Rerank.distillPairs(t.documents).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length <= 4, s"q$q ${rows.length} negatives")
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == (1L to rows.length).toSeq)
      // one positive per query, margins positive
      assert(rows.map(_.getLong(1)).distinct.length == 1)
      rows.foreach(r => assert(r.getDouble(7) > 0.0))
    }
  }

  test("every (system, query) keeps a row; metrics bounded in [0, 1]") {
    val t = sources.Tables(spark, sfDir)
    val idx = Bm25.buildIndex(t.documents)
    val rows = RetrievalEval.perQuery(t.documents, idx).collect()
    assert(rows.length == 15) // 3 systems × 5 queries
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, s"rr $r")
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0, s"ndcg $r")
      assert(r.getLong(2) <= 10L && r.getLong(3) <= r.getLong(2), s"counts $r")
    }
    val sum = RetrievalEval.summary(t.documents, idx).collect()
    assert(sum.length == 3)
    sum.foreach { r =>
      assert(r.getLong(1) == 5L)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
