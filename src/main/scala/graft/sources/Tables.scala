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
  /** `events.ts` arrives in whichever flavor the corpus writer used —
    * parquet TIMESTAMP(NANOS) (read as long via the legacy flag, truncated
    * to micros: the DuckDB oracles' `epoch_ns(ts)//1000` normalization),
    * TIMESTAMP_NTZ (micros with `isAdjustedToUTC=false`, what pyarrow
    * writes by default and Spark 4 surfaces as NTZ), or a plain
    * session-zoned TIMESTAMP. All three normalize to TIMESTAMP here, so
    * every downstream operator (`unix_micros`, interval arithmetic,
    * watermarks) sees ONE type. NTZ→TIMESTAMP reinterprets the wall-clock
    * in the session zone — pinned to UTC by every graft session, which is
    * exactly the naive reading the oracles use. */
  def events: DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

/** Corpus ingestion from the formats a user of the reference actually has.
  *
  * The reference reads its corpus from MongoDB with an
  * `{_id: 1, description: 1}` projection
  * (reference: services/index_service.py:52-54); the batch equivalents of
  * that operational store are its export formats — `mongoexport` JSONL
  * and CSV dumps. Both readers return the graft document schema
  * `(doc_id, text)`, so every documents-table operator runs on them
  * unchanged.
  *
  * Scale posture: the JSONL and [[csvLines]] readers split by file AND
  * byte-range exactly like parquet (no single-reader bottleneck). The
  * quoted [[csv]] reader is `multiLine`, which makes each FILE a single
  * read unit — parallel only across files, so exports must be sharded
  * into many files (mongoexport/`COPY TO` sharded output already is).
  * Schemas are DECLARED, not inferred — inference would scan the full
  * 100 TB dump once before the real job starts.
  */
object DocumentSource {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  private val exportSchema = StructType(Seq(
    StructField("_id", LongType),
    StructField("description", StringType)))

  /** `mongoexport`-style JSON lines: one `{"_id": …, "description": …}`
    * object per line. PERMISSIVE mode mirrors the lenient document store:
    * malformed lines become null rows to be filtered, not job failures. */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(exportSchema)
      .option("mode", "PERMISSIVE")
      .json(path)
      .select(col("_id").as("doc_id"), col("description").as("text"))
      .filter(col("doc_id").isNotNull)

  /** CSV export with a `doc_id,text` header. `multiLine` because document
    * text legitimately contains newlines inside quotes — the cost is that
    * each file becomes one read unit (see the object scaladoc); shard the
    * export into many files, or use [[csvLines]] for newline-free dumps. */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)
      .filter(col("doc_id").isNotNull)

  /** Byte-range-splittable CSV variant for exports whose text is
    * guaranteed newline-free (e.g. dumped with newlines escaped as `\n`):
    * without `multiLine`, Spark assigns byte ranges WITHIN a file to
    * different tasks, so even one giant dump file parallelizes. The
    * two-character escape sequences are restored after the parse. */
  def csvLines(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)
      .select(col("doc_id"),
        regexp_replace(col("text"), "\\\\n", "\n").as("text"))
      .filter(col("doc_id").isNotNull)
}
