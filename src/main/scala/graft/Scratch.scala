package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Local profiling scratchpad (not part of the driver contract): time any
  * named query with full materialization. Usage:
  *   sbt "runMain graft.Scratch q_knn dedup_jaccard"
  */
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
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    Tables(spark, sfDir).lineitem.count() // warm up
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        if (sys.env.contains("GRAFT_SHOW_EXECUTED")) {
          // the AQE-FINAL physical plan: runtime join strategy decisions
          // (broadcast-vs-shuffle) only exist after execution, so run the
          // df's own queryExecution (collect, not a writer — the writer
          // wraps a separate command plan) and print what actually ran
          val df = fn(spark, sfDir)
          // execute THIS queryExecution (Dataset.foreach would run a
          // separate rddQueryExecution and leave the printed adaptive
          // plan non-final): toRdd drives the same adaptive root the
          // print reads, and no row moves to the driver
          df.queryExecution.toRdd.foreach(_ => ())
          println(df.queryExecution.executedPlan.toString.linesIterator
            .take(60).mkString("\n"))
        } else {
          val plan = fn(spark, sfDir).queryExecution.optimizedPlan
          println(plan.toString.linesIterator.take(12).mkString("\n"))
        }
      }
    }
    spark.stop()
  }
}
