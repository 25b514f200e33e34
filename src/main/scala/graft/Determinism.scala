package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Oracle-determinism sorting, made switchable.
  *
  * Many per-row operators end in a trailing global `orderBy` whose ONLY
  * purpose is the driver's hash compare: the oracle SQL carries an
  * `ORDER BY` and the dumped parquet must match it row-for-row. No data
  * consumer needs that order, and at scale it costs a full range
  * Exchange + sort per query. Routing those sorts through here keeps
  * them ON by default (Verify/tests/driver: bit-identical CORRECTNESS)
  * while `Bench` switches them OFF (`-Dgraft.sort=false`), so the bench
  * times the operator, not the oracle contract.
  *
  * Semantic sorts (top-k, rank windows, MMR order) never go through
  * here — they ARE the operator and stay unconditional. */
object Determinism {

  /** Default true; Bench sets the property to "false" before the session
    * starts. Read per-call so tests can flip it around a block. */
  def enabled: Boolean =
    sys.props.get("graft.sort").forall(_.equalsIgnoreCase("true"))

  /** The trailing oracle-determinism sort: applied only when enabled. */
  def sorted(df: DataFrame)(cols: Column*): DataFrame =
    if (enabled) df.orderBy(cols: _*) else df
}
