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

    {
      import graft.functions._
      import graft.functions.TextFunctions._
      val docs = t.documents
      val sigs = docs.select(col("doc_id"),
        band_hashes(minhash_signature(
          shingles(tokens(preprocess(col("text"))), 3), 128), 16, 8).as("bh"))
      val bucketed = sigs.repartition(col("doc_id"))
        .select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "h")))
      val pairs = bucketed.as("a").join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2")).distinct()
      time("cl: pairs")(pairs.count())
      val edges = pairs.union(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      time("cl: edges ckpt")(edges.localCheckpoint().count())
      val edgesC = edges.localCheckpoint()
      var labels = docs.select(col("doc_id"), col("doc_id").as("cluster_id"))
      time("cl: labels ckpt")({ labels = labels.localCheckpoint(); labels.count() })
      for (i <- 1 to 3) {
        val neighborMin = edgesC.join(labels, edgesC("id2") === labels("doc_id"))
          .groupBy(col("id1").as("doc_id"))
          .agg(min(col("cluster_id")).as("neighbor_min"))
        var updated: org.apache.spark.sql.DataFrame = null
        time(s"cl: iter$i update")({
          updated = labels.join(neighborMin, Seq("doc_id"), "left")
            .select(col("doc_id"), least(col("cluster_id"),
              coalesce(col("neighbor_min"), col("cluster_id"))).as("cluster_id"))
            .localCheckpoint()
          updated.count()
        })
        time(s"cl: iter$i changed")(
          updated.join(labels.withColumnRenamed("cluster_id", "old"), Seq("doc_id"))
            .filter(col("cluster_id") =!= col("old")).count())
        labels = updated
      }
    }

    import graft.functions._
    import graft.functions.TextFunctions._
    val sigs = t.documents.select(col("doc_id"),
      band_hashes(minhash_signature(
        shingles(tokens(preprocess(col("text"))), 3), 128), 16, 8).as("bh"))
    time("sigs")(sigs.count())
    val bucketed = sigs.select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "h")))
    time("bucketed")(bucketed.count())
    val pairs = bucketed.as("a").join(bucketed.as("b"),
      col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2")).distinct()
    time("pairs")(pairs.count())
    time("edges checkpoint")(pairs.union(
      pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .localCheckpoint().count())
    time("full clusters")(operators.Dedup.clusters(t.documents).count())
  }
}
