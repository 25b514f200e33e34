package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Search}
import graft.sources.Tables

class IvfSpec extends SparkSuite {
  import spark.implicits._

  lazy val t = Tables(spark, sfDir)
  lazy val queries = t.embeddings.filter($"vec_id" < 10)
    .select($"vec_id".as("query_id"), $"embedding".as("qv"))

  test("every corpus vector gets exactly one centroid assignment") {
    val assign = IvfIndex.assignments(t.embeddings,
      IvfIndex.centroids(t.embeddings, 16))
    assert(assign.count() == t.embeddings.count())
    assert(assign.select($"vec_id").distinct().count() == t.embeddings.count())
    assert(assign.select($"centroid_id").distinct().count() <= 16)
  }

  test("IVF results are a subset of the corpus and self is always found") {
    val res = IvfIndex.search(queries, t.embeddings,
      nCentroids = 16, nprobe = 4, k = 5)
    // query vectors are corpus members: rank-1 hit must be the vector itself
    val self = res.filter($"rank" === 1)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
    assert(self.forall { case (q, v) => q == v })
  }

  test("IVF recall@5 vs brute force is reasonable at nprobe=4/16") {
    val exact = Search.bruteForceTopK(queries, t.embeddings, 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val approx = IvfIndex.search(queries, t.embeddings, 16, 4, 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall@5 = $recall") // 4/16 probes, random data
    // probing everything must recover brute force exactly
    val full = IvfIndex.search(queries, t.embeddings, 16, 16, 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
  }
}
