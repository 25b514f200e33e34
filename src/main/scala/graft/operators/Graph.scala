package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Barrier.BarrierOps

/** Iterative graph computation over the near-dup candidate graph — the
  * one algorithm class (bounded-round link analysis) the catalog's
  * aggregates and windows cannot express.
  *
  * [[nearDupRank]] is PageRank over the capped LSH candidate graph: a
  * document's rank measures how centrally it sits in the corpus's
  * duplication structure. High-rank nodes are TEMPLATE HUBS — the
  * boilerplate sources whose neighborhoods predict most of the dedup
  * win ([[Dedup.clusterSizeHistogram]] sees the same mass shaped as
  * converged clusters; rank sees it BEFORE convergence, weighted by how
  * tightly linked the neighborhood is) — so a curation pass reads the
  * top of this table as "which templates to kill first".
  */
object Graph {

  /** Rank unit: a node's initial mass = 1e6 units. Every intermediate
    * stays below 2^63 for graphs up to ~10^11 vertices (total mass is
    * non-increasing: each node redistributes at most its own mass, and
    * `85 · s` tops out at 85 × total), which covers a 100 TB corpus at
    * ~1 KB/doc with an order of magnitude to spare. */
  private val Scale = 1000000L
  private val Teleport = Scale * 15L / 100L

  /** Integer-grid PageRank (damping 0.85, fixed `iters` rounds) over an
    * explicit SYMMETRIC edge table `(id1, id2)`. All arithmetic is
    * exact-integer and order-free — contributions are `rank DIV deg`,
    * the damped update is `(85 · Σ) DIV 100` (operands non-negative, so
    * Spark's truncating DIV equals DuckDB's flooring `//`) — which makes
    * a 5-round fixpoint bit-identical on any cluster layout AND
    * replayable by a generated SQL iteration chain. Flooring loses < 1
    * unit per division — a deterministic contraction both engines
    * share, not drift.
    *
    * Scale shape: the iteration runs on the CANDIDATE-GRAPH vertex set
    * (the [[Dedup.clusters]] rule — a doc in no pair has the closed-form
    * teleport-only rank and never needs the join); each round is one
    * edge-keyed join of the (vertex, deg, rank) state + one dst-keyed
    * map-side-combined sum — shuffle ∝ edges per round, rounds bounded
    * by contract. State barriers per round cut the exponential lineage
    * ([[Dedup.clusters]]' convergence discipline, minus the convergence
    * test — rank needs fixed rounds for cross-engine replay). */
  private[graft] def rankFrom(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("id1").as("src"), col("id2").as("dst"))
    val deg = e.groupBy(col("src").as("doc_id"))
      .agg(count(lit(1)).as("deg")).barrier()
    var state = deg.select(col("doc_id"), col("deg"),
      lit(Scale).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(state, e("src") === state("doc_id"))
        .select(col("dst").as("doc_id"), expr("rank DIV deg").as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("s"))
      state = deg
        .join(contribs, Seq("doc_id"), "left")
        .select(col("doc_id"), col("deg"),
          (lit(Teleport) +
            expr("(85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100")).as("rank"))
        .barrier()
    }
    state
      .select(col("doc_id"), col("deg").as("degree"),
        col("rank").as("pagerank"))
      .orderBy(col("doc_id"))
  }

  /** [[rankFrom]] over the production capped LSH candidate graph:
    * per candidate-graph vertex its degree and 5-round integer
    * PageRank. Edges are the UNCHANGED [[Dedup.candidateEdges]]
    * generator, so bucket crowding and the `maxBucket` cap shape the
    * graph exactly as they shape the dedup funnel. */
  def nearDupRank(docs: DataFrame, iters: Int = 5,
                  maxBucket: Int = 1000): DataFrame =
    rankFrom(Dedup.candidateEdges(docs, maxBucket).barrier(), iters)

  /** [[nearDupRank]] over an already-materialized
    * [[Dedup.candidatePairs]] table — the materialize-once seam. The
    * symmetric union is rebuilt here (both directions from the
    * one-direction store) and barriered once for the `iters` rounds. */
  def nearDupRankFromPairs(pairs: DataFrame, iters: Int = 5): DataFrame =
    rankFrom(
      pairs.union(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
        .barrier(),
      iters)
}
