package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** State-store backend selection for the stateful twins.
  *
  * The tests (and any small deployment) run on Spark's default
  * HDFS-backed store, which keeps EVERY key's state on the executor
  * HEAP — at 100 TB a sessionization or incremental-dedup stream holds
  * hundreds of millions of keys and the heap store's full-snapshot
  * checkpoints and GC pressure kill it. Production deployments run the
  * RocksDB provider: state lives off-heap/on-disk with incremental
  * (changelog) checkpoints, heap stays flat.
  *
  * Switching providers must NEVER change results — the provider is a
  * storage engine under the exact same keyed-state semantics — and
  * StreamingSpec asserts exactly that: the same stream yields identical
  * sessions under both providers, with RocksDB verifiably engaged (its
  * custom metrics appear in the query progress).
  */
object StateBackend {

  private val Key = "spark.sql.streaming.stateStore.providerClass"

  /** Spark's bundled RocksDB provider (rocksdbjni ships with the Spark
    * distribution — no extra dependency). */
  val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The default heap-backed provider. */
  val HdfsBacked =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** Run `body` with the given state-store provider, restoring the prior
    * session setting after. The provider is resolved when a query STARTS
    * (then pinned into its checkpoint), so the switch affects exactly the
    * queries started inside `body` — a restarted query keeps the provider
    * it was born with. */
  def withProvider[T](spark: SparkSession, provider: String)(body: => T): T = {
    val prev = spark.conf.getOption(Key)
    spark.conf.set(Key, provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Key, v)
      case None    => spark.conf.unset(Key)
    }
  }

  def withRocksDB[T](spark: SparkSession)(body: => T): T =
    withProvider(spark, RocksDB)(body)

  /** Per-state-operator size metrics from the query's latest progress:
    * (operator name, keys held, bytes used) — the numbers an operator
    * watches next to [[LateData.droppedByWatermark]]'s drop count to know
    * when state growth (an unbounded key domain, a stuck watermark) is
    * about to take the job down. */
  def stateMetrics(q: StreamingQuery): Seq[(String, Long, Long)] =
    q.recentProgress.lastOption.toSeq.flatMap(_.stateOperators.toSeq)
      .map(so => (so.operatorName, so.numRowsTotal, so.memoryUsedBytes))

  /** True iff the query's state operators report RocksDB custom metrics —
    * the observable proof the provider switch actually engaged. */
  def usesRocksDB(q: StreamingQuery): Boolean = {
    import scala.jdk.CollectionConverters._
    q.recentProgress.lastOption.exists(_.stateOperators.exists(
      _.customMetrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb"))))
  }
}
