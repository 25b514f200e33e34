package graft

import org.apache.spark.sql.SparkSession

/** Per-STAGE shuffle accounting for one query — the drill-down behind
  * Bench's per-query totals (`runMain graft.StageProbe <sfDir> <query>`).
  * When a query's total record ratio exceeds the data ratio, this names
  * the stage that inflates: each completed stage prints its task count,
  * shuffle-write records/bytes and the stage name (which carries the
  * operator line), so "which aggregate stopped combining" is a read,
  * not a theory. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, qname) = args.take(2)
    sys.props("graft.sort") = "false"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_SATURATED=1: the Bench linearity-gate mode (broadcast
    // promotion off) — probe the SAME fixed plan shape the gate measured
    if (sys.env.get("SPARK_GRAFT_SATURATED").contains("1")) {
      builder.config("spark.sql.autoBroadcastJoinThreshold", "-1")
      builder.config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val w = si.taskMetrics.shuffleWriteMetrics
          val r = si.taskMetrics.shuffleReadMetrics
          println(f"[stage ${si.stageId}%3d] tasks=${si.numTasks}%4d " +
            f"wrRec=${w.recordsWritten}%9d wrMB=${w.bytesWritten / 1e6}%8.2f " +
            f"rdRec=${r.recordsRead}%9d  ${si.name.takeWhile(_ != '\n')}")
        }
      })
    val fn = SparkEntry.queries(qname)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    org.apache.spark.sql.graft.bridge.drainListenerBus(spark)
    spark.stop()
  }
}
