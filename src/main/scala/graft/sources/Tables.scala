package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver-generated parquet layout.
  *
  * Plain `spark.read.parquet` so Catalyst owns column pruning and filter
  * pushdown — callers select/filter and the scan narrows (verified in
  * PlanSpec via `PushedFilters`/`ReadSchema`).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * read it as long (legacy flag) and truncate to micros — the same
    * normalization the DuckDB oracles apply (`epoch_ns(ts)//1000`). */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts DIV 1000)"))
    else raw
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
