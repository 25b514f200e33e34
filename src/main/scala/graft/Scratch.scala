package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
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

    time("warmup")(t.documents.count())
    time("preprocess only")(
      t.documents.select(preprocess(col("text")).as("p")).count())
    time("tokens")(
      t.documents.select(tokens(preprocess(col("text"))).as("tk")).count())
    time("shingles")(
      t.documents.select(shingles(tokens(preprocess(col("text"))), 3).as("sh")).count())
    time("shingles exploded")(
      t.documents.select(col("doc_id"),
        explode(array_distinct(shingles(tokens(preprocess(col("text"))), 3))).as("sh")).count())
    val sh = t.documents.select(col("doc_id"),
      explode(array_distinct(shingles(tokens(preprocess(col("text"))), 3))).as("sh"))
    time("self-join count")(
      sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id")).count())
    time("full dedup_jaccard")(graft.operators.Dedup.jaccardNeighbors(t).count())
    spark.stop()
  }
}
