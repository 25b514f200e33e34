package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}

class GraphSpec extends SparkSuite {
  import spark.implicits._

  // symmetric edge table for the path graph 1 — 2 — 3
  private def pathEdges = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("id1", "id2")

  test("rankFrom: hand-computed integer ranks on the 3-node path graph") {
    // unit 1e6, teleport 150000, damping 85/100, all DIV exact:
    // r1: ends 150000 + 85·(1e6/2) DIV 100 = 575000; middle
    //     150000 + 85·2e6 DIV 100 = 1850000
    // r2: middle 150000 + 85·(575000+575000) DIV 100 = 1127500;
    //     ends 150000 + 85·(1850000 DIV 2) DIV 100 = 936250
    val r1 = Graph.rankFrom(pathEdges, iters = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(r1(1L) == ((1L, 575000L)) && r1(3L) == ((1L, 575000L)))
    assert(r1(2L) == ((2L, 1850000L)))
    val r2 = Graph.rankFrom(pathEdges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(r2(1L) == 936250L && r2(3L) == 936250L && r2(2L) == 1127500L)
  }

  test("rankFrom is layout-invariant (order-free integer sums)") {
    val edges = (for {
      i <- 1L to 30L; j <- 1L to 30L
      if i != j && (i + j) % 3 == 0
    } yield (i, j)).toDF("id1", "id2")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.rankFrom(df, iters = 5).collect().toSeq
    assert(run(edges) == run(edges.repartition(17)))
  }

  test("rank mass is non-increasing and hubs outrank leaves") {
    // star: hub 1 linked to 10 leaves
    val star = (2L to 11L).flatMap(i => Seq((1L, i), (i, 1L)))
      .toDF("id1", "id2")
    val got = Graph.rankFrom(star, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val leaf = got(2L)
    assert((3L to 11L).forall(got(_) == leaf)) // symmetry
    assert(got(1L) > leaf * 5)                 // the hub dominates
    // flooring only ever loses mass: total ≤ initial total
    assert(got.values.sum <= 11L * 1000000L)
  }

  test("nearDupRank runs over the production candidate graph") {
    // two near-dup families + an isolated doc: family members appear
    // with degree ≥ 1; the isolated doc is not a graph vertex
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base), (2L, base + " tail"), (3L, base + " tails"),
      (4L, "completely different content with no shared shingles at all " +
        "zebra yak xylophone walrus vulture termite snail rabbit"))
      .toDF("doc_id", "text")
    val got = Graph.nearDupRank(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.contains(1L) && !got.contains(4L))
    assert(got(1L).getLong(1) >= 1L && got(1L).getLong(2) > 0L)
    // vertices match the clusters recursion's vertex set
    val clustered = Dedup.clusters(docs).collect().map(_.getLong(0)).toSet
    assert(got.keySet.subsetOf(clustered))
  }
}
