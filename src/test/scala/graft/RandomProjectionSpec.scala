package graft

import org.apache.spark.sql.functions._
import graft.operators.{RandomProjection, Search}
import graft.sources.Tables

class RandomProjectionSpec extends SparkSuite {
  import spark.implicits._

  lazy val t = Tables(spark, sfDir)
  private def queries = t.embeddings.filter($"vec_id" < 5)
    .select($"vec_id".as("query_id"), $"embedding".as("qv"))

  test("projection preserves identity: every query's self is rank 1") {
    // proj is a pure function of the vector, so cos(proj(q), proj(q)) = 1
    // and the self row must win every ranking despite JL distortion
    val top1 = RandomProjection.searchProjected(queries, t.embeddings, k = 5)
      .filter($"rank" === 1).select($"query_id", $"vec_id")
      .as[(Long, Long)].collect().toMap
    assert((0L until 5L).forall(q => top1(q) == q), top1)
  }

  test("projected vectors have the declared dimension and are full-rank-ish") {
    val dims = t.embeddings
      .select(size(RandomProjection.projectCol($"embedding")).as("d"))
      .distinct().as[Int].collect().toSeq
    assert(dims == Seq(16))
    // degenerate (e.g. checkerboard) sign grids collapse all output dims
    // to one line; distinct projected vectors must not be collinear —
    // cheap proxy: per-dimension values across the corpus are not all
    // proportional to dim 0 (compare two dims' sign patterns)
    val proj = t.embeddings
      .select(RandomProjection.projectCol($"embedding").as("p"))
      .select($"p".getItem(0).as("a"), $"p".getItem(1).as("b"))
      .as[(Float, Float)].collect()
    val ratios = proj.filter(_._1 != 0f).map(x => x._2 / x._1).distinct
    assert(ratios.length > 1, "projection collapsed to rank 1")
  }

  test("recall audit: self-hit guarantees recall >= 1/k and audit is exact") {
    val r = RandomProjection.recallAudit(queries, t.embeddings, k = 5)
      .collect()
    assert(r.length == 5)
    assert(r.forall(_.getAs[Long]("n_hits") >= 1L))
    // audit agrees with a direct overlap computation
    val exact = Search.bruteForceTopK(queries, t.embeddings, 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = RandomProjection.searchProjected(queries, t.embeddings, 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    r.foreach { row =>
      val q = row.getAs[Long]("query_id")
      assert(row.getAs[Long]("n_hits") == (exact(q) & approx(q)).size)
    }
  }

  test("searchRefined: full shortlist recovers the exact brute-force ranking") {
    val n = t.embeddings.count().toInt
    val refined = RandomProjection
      .searchRefined(queries, t.embeddings, k = 5, shortlist = n)
      .collect().toSeq
    val exact = Search.bruteForceTopK(queries, t.embeddings, 5)
      .collect().toSeq
    assert(refined == exact, "exact rerank over the full shortlist must " +
      "equal brute force bit for bit")
  }

  test("searchRefined scores carry no projection distortion") {
    // every refined score must equal the TRUE cosine for that pair —
    // the whole point of the second stage (the projected-space score
    // would differ by JL distortion)
    val refined = RandomProjection.searchRefined(queries, t.embeddings, 5)
      .select($"query_id", $"vec_id", $"score").as[(Long, Long, Double)]
      .collect().toMap2
    val truth = Search.bruteForceTopK(queries, t.embeddings, n)
      .select($"query_id", $"vec_id", $"score").as[(Long, Long, Double)]
      .collect().toMap2
    refined.foreach { case (k, s) => assert(truth(k) == s, s"$k: $s") }
  }
  private lazy val n = t.embeddings.count().toInt
  implicit private class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }

  test("projection is partitioning-invariant") {
    val a = RandomProjection.searchProjected(queries, t.embeddings, 5)
      .collect().toSeq
    val b = RandomProjection.searchProjected(queries,
      t.embeddings.repartition(col("label")), 5).collect().toSeq
    assert(a.sortBy(r => (r.getLong(0), r.getLong(1))) ==
      b.sortBy(r => (r.getLong(0), r.getLong(1))))
  }

  test("recallSweep: prefix slices equal standalone projections, curve is monotone") {
    val sweep = RandomProjection.recallSweep(queries, t.embeddings, 5)
      .collect().sortBy(_.getLong(0))
    assert(sweep.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L))
    // scan cost is exact-by-construction: outDim/inDim on the 1e6 grid
    assert(sweep.map(_.getDouble(3)).toSeq == Seq(0.125, 0.25, 0.5), sweep.toSeq)
    // each sweep point must equal the STANDALONE audit at that dim —
    // the prefix-slice claim (sign(j, i) is outDim-independent)
    val standalone = Seq(8, 16, 32).map { d =>
      RandomProjection.recallAudit(queries, t.embeddings, 5, outDim = d)
        .agg(org.apache.spark.sql.functions.sum($"n_hits")).head.getLong(0)
    }
    assert(sweep.map(_.getLong(1)).toSeq == standalone, standalone)
    // empirical monotonicity on the pinned corpus: more dimensions,
    // never less recall (JL distortion shrinks with outDim)
    val rec = sweep.map(_.getDouble(2)).toSeq
    assert(rec == rec.sorted, s"recall not monotone in outDim: $rec")
  }

  test("the sign matrix folds into the plan: no extra exchange, no broadcast of weights") {
    val plan = planOf(t.embeddings
      .select(RandomProjection.projectCol($"embedding").as("p")))
    assert(!plan.contains("Exchange"), plan) // narrow map-side pass
    assert(plan.contains("dot_product"), plan)
  }
}
