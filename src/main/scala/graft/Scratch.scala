package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Local profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("warmup")(t.events.count())
    time("events select props")(t.events.select(col("props")).count())
    time("one get_json_object")(
      t.events.select(get_json_object(col("props"), "$.k").as("k")).count())
    time("cast long")(
      t.events.select(get_json_object(col("props"), "$.k").cast("long").as("k")).count())
    time("groupBy k%10")(
      t.events.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
        .agg(count(lit(1))).count())
    time("from_json variant")(
      t.events.select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
        .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
        .agg(count(lit(1))).count())
    time("rollup")(operators.Relational.revenueRollup(t).count())
    time("token_topk current")(SparkEntry.queries("q_token_topk")(spark, sfDir).count())
  }
}
