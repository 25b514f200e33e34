package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned equi-join: filter the BIG side with a compact bloom filter
  * of the small side's keys BEFORE the join shuffles anything.
  *
  * The scale problem this solves: when the small side is too large to
  * broadcast (tens of millions of keys), Spark falls back to a sort-merge
  * join that shuffles the ENTIRE big side — at 100 TB that shuffle is the
  * job. A bloom filter of the small side's keys is megabytes regardless of
  * the big side's size, rides the task closure to every executor, and
  * drops non-matching rows at the scan stage, so only plausibly-matching
  * rows (matches + the fpp share of false positives) reach the exchange.
  * Spark's own AQE runtime filter does this opportunistically; this
  * operator is the explicit, always-on form with a caller-chosen fpp.
  *
  * Correctness contract: bloom filters have NO false negatives, so the
  * pruned join returns exactly the plain join's rows — the oracle for the
  * checked query IS the plain join.
  *
  * Cost model: building the filter is one extra scan of the SMALL side
  * (the documented ANALYZE step, like `DataFrameStatFunctions`); the big
  * side is still scanned once. Worth it whenever
  * `bigRows × (1 - selectivity)` × row-width dwarfs the small-side rescan
  * — i.e. almost always when the join is selective.
  */
object Bloom {

  /** Inner-join `big ⋈ small` on `bigKey = smallKey` (both BIGINT), with
    * the big side bloom-pruned first.
    *
    * `expectedItems ≤ 0` (the default) sizes the filter from the small
    * side's ACTUAL count — one cheap count job of the side the ANALYZE
    * scan reads anyway. This is the scale-critical choice: a fixed
    * capacity is a time bomb — the r13 sf1→sf10 sweep measured a filter
    * sized for 2^20 keys loaded with 3M keys running at 40% false-
    * positive rate ((1−e^(−kn/m))^k with n ≈ 3× capacity), which turned
    * the pruned big-side shuffle from matches + ~0.5% into 2.6× matches
    * (25.8×/decade growth). Auto-sizing keeps fpp at the requested 1%
    * at EVERY corpus size (n=4M @ 1% ≈ 4.6 MiB — closure-shippable).
    * Pass explicit `expectedItems` only with a known key-count bound. */
  def prunedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 expectedItems: Long = 0L,
                 fpp: Double = 0.01): DataFrame = {
    // The small side is evaluated up to three times (auto-size count,
    // bloom build, join probe). Snapshot it once so a non-deterministic
    // or unstable input cannot diverge between the filter's build set and
    // the join's probe set — the no-false-negatives contract requires the
    // probe rows to be a subset of the build rows. localCheckpoint keeps
    // the ANALYZE-side data executor-local (small by contract: this
    // operator exists because `small` is too big to broadcast but still
    // ≪ big) and makes the count job a cached-block read.
    val s = small.localCheckpoint()
    val bf = s.stat.bloomFilter(smallKey, sizeFor(s, expectedItems), fpp)
    big.filter(graft.functions.bloom_might_contain(col(bigKey), bf))
      .join(s, col(bigKey) === col(smallKey))
  }

  /** The pruning predicate alone (for composing with other join shapes or
    * asserting plans in tests). Unlike [[prunedJoin]] this cannot snapshot
    * the caller's probe side, so the no-false-negatives contract requires
    * `small` to be DETERMINISTIC between this build scan and the caller's
    * own join — pass a checkpointed/persisted frame if it isn't. */
  def pruneAgainst(small: DataFrame, smallKey: String, key: Column,
                   expectedItems: Long = 0L,
                   fpp: Double = 0.01): Column =
    graft.functions.bloom_might_contain(key,
      small.stat.bloomFilter(smallKey, sizeFor(small, expectedItems), fpp))

  private def sizeFor(small: DataFrame, expectedItems: Long): Long =
    if (expectedItems > 0L) expectedItems
    else math.max(small.count(), 64L) // BOUNDED: one count job, no collect
}
