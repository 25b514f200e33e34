package graft.operators

import org.apache.spark.sql.DataFrame

/** The materialization barrier behind every corpus-sized intermediate in
  * the library (shared token tables, signature tables, LM count tables,
  * PQ training slices, candidate-pair tables).
  *
  * Why barriers exist at all: `Generate` re-evaluates its child once per
  * OUTPUT row (an un-materialized tokenize→explode chain runs the regex
  * pipeline per token, the round-1 33 s blowup), and the optimizer moves
  * projections past a mere `repartition()` — materializing the
  * intermediate is the only reliable cut, and it also lets several
  * consumers read one computed table.
  *
  * Two interchangeable mechanisms, selected per session:
  *
  *  - DEFAULT (`spark.graft.reliableBarriers` unset/false):
  *    `localCheckpoint()` — blocks live on executors, no replication, no
  *    lineage. Fastest; right for local mode, tests and short jobs. On a
  *    real cluster a lost executor kills the job instead of recomputing
  *    a partition (no lineage to replay).
  *  - RELIABLE (`spark.conf.set("spark.graft.reliableBarriers", "true")`
  *    plus `sparkContext.setCheckpointDir(<HDFS/S3 path>)`): every
  *    barrier becomes a reliable `checkpoint()` — partitions are written
  *    to replicated storage, so a multi-hour 100 TB run survives
  *    executor loss at the cost of one distributed write per barrier.
  *    This is the [[Dedup.clusters]] `checkpointDir` pattern promoted to
  *    the whole library (clusters keeps its explicit parameter: its
  *    per-iteration state wants opt-in granularity independent of the
  *    session default).
  *
  * Results are identical through either path (spec-proved in
  * BarrierSpec); the switch is pure fault-tolerance posture. Budget
  * reliable-barrier storage ≈ the summed size of the materialized
  * intermediates, and set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` to reap files
  * when the DataFrames are collected. */
object Barrier {

  /** Session flag selecting the reliable path. */
  val ReliableKey = "spark.graft.reliableBarriers"

  /** Materialize `df` as a consumable-many-times barrier (see object doc
    * for the local-vs-reliable contract). */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      spark.conf.getOption(ReliableKey).exists(_.equalsIgnoreCase("true"))
    if (reliable) {
      require(
        org.apache.spark.sql.graft.bridge.checkpointDir(spark).isDefined,
        s"$ReliableKey=true needs sparkContext.setCheckpointDir(<reliable " +
          "path>) — reliable barriers are written there")
      df.checkpoint()
    } else df.localCheckpoint()
    // (a `spark.graft.barrierSerialized` MEMORY_AND_DISK_SER variant was
    // shipped unmeasured in r20 and DELETED in r21 after the A/B it was
    // waiting for: 16-key vector-family subset, same binary, sf0.1
    // 23.15 s deserialized vs 23.13 s serialized, sf1 37.0 s vs 37.7 s —
    // the SizeEstimator sampling it avoids is cheaper than the
    // serialize/deserialize it adds on every consumer read)
  }

  /** Chain syntax: `df.barrier()` ≡ `Barrier(df)`. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def barrier(): DataFrame = Barrier(df)
  }

  /** Build several INDEPENDENT pipeline branches concurrently.
    *
    * Barriers are EAGER actions, so a composite operator that constructs
    * its branches sequentially (curation gates, card constituents)
    * serializes one blocking Spark job per internal barrier — while each
    * job's tail leaves most cores idle. Spark's scheduler happily runs
    * jobs submitted from different threads at once (optimization guide
    * §2.6 "overlap independent jobs"): handing each branch to its own
    * thread lets the next branch's jobs back-fill the idle capacity.
    * FIFO scheduling keeps the earlier branch ahead, which is exactly
    * the back-fill behaviour wanted.
    *
    * Correctness: branches must be mutually independent (each one only
    * reads already-materialized inputs or its own lineage). Results are
    * bit-identical to sequential construction — each branch's lineage is
    * unchanged, only the wall-clock interleaving of their jobs differs.
    * Exceptions from any branch propagate (first failure rethrown). */
  def concurrently[A](thunks: Seq[() => A]): Seq[A] =
    if (thunks.sizeIs <= 1) thunks.map(_())
    else {
      // pool bounded: 2-3 jobs in flight already back-fill the tail
      // (guide §2.6); more threads only pile up planning contention
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(thunks.size, 8))
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[A] {
            override def call(): A = t()
          })
        }
        futs.map { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              // a failing branch must not leak sibling jobs: cancel the
              // outstanding futures (interrupt their barrier actions) and
              // stop the pool before rethrowing, so a caller's retry does
              // not race still-running duplicates of the same build
              futs.foreach(_.cancel(true))
              pool.shutdownNow()
              throw e.getCause
          }
        }
      } finally pool.shutdown()
    }
}
