package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Per-query formatted-plan dump for the optimization-round evidence
  * files (`plans/r<N>/<query>_<suffix>.txt` — the judge reads these
  * against the code, so every touched query commits a before/after
  * pair). Usage:
  * `runMain graft.PlanDump <sfDir> <outDir> <suffix> <query...>`;
  * '#'-phase keys are accepted and the '#' is mapped to '_' in the
  * file name. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // match Bench/Verify: trust single-file-bucket sortBy metadata so
      // bucketed-store plans show their sort-free join shape
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val catalog = SparkEntry.queries ++ SparkEntry.benchPhases
    names.foreach { name =>
      val df = catalog(name)(spark, sfDir)
      val txt = s"NOTE: '$suffix' plan, $sfDir.\n\n```\n" +
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode) + "```\n"
      val f = s"$outDir/${name.replace('#', '_')}_$suffix.txt"
      Files.writeString(Paths.get(f), txt)
      println(s"[plandump] wrote $f")
    }
    spark.stop()
  }
}
