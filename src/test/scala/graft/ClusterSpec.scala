package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IvfIndex}
import graft.sources.Tables

class ClusterSpec extends SparkSuite {
  import spark.implicits._

  test("min-label propagation groups transitively connected near-dups") {
    // A≈B (1 edit), B≈C (1 more edit), D unrelated: {A,B,C} one cluster
    val a = (1 to 80).map(i => s"w${i % 37}tok$i").mkString(" ")
    val b = a.split(" ").updated(10, "EDIT1").mkString(" ")
    val c = b.split(" ").updated(50, "EDIT2").mkString(" ")
    val d = (1 to 80).map(i => s"zz${i}qq").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")
    val got = Dedup.clusters(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (1L, 3L))
    assert(got(2L) == (1L, 3L))
    assert(got(3L) == (1L, 3L))
    assert(got(4L) == (4L, 1L))
  }

  test("clusters on real docs: every doc labeled, sizes consistent") {
    val t = Tables(spark, sfDir)
    val cl = Dedup.clusters(t.documents)
    assert(cl.count() == t.documents.count())
    // cluster_id is always the min doc_id of its cluster
    val bad = cl.groupBy($"cluster_id").agg(min($"doc_id").as("mn"))
      .filter($"cluster_id" =!= $"mn").count()
    assert(bad == 0)
  }

  test("canonicalize: exactly one keep per cluster, and it is the min id") {
    val a = (1 to 80).map(i => s"w${i % 37}tok$i").mkString(" ")
    val b = a.split(" ").updated(10, "EDIT1").mkString(" ")
    val c = b.split(" ").updated(50, "EDIT2").mkString(" ")
    val d = (1 to 80).map(i => s"zz${i}qq").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")
    val got = Dedup.canonicalize(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // the dup cluster {1,2,3} keeps only 1; singleton 4 keeps itself
    assert(got.map(r => r._1 -> r._4).toMap ==
      Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
    // `WHERE keep` is the deduplicated corpus: one survivor per cluster
    val perCluster = got.groupBy(_._2).view.mapValues(_.count(_._4))
    assert(perCluster.values.forall(_ == 1), perCluster.toMap.toString)
    // and the survivor is always the cluster's smallest member
    got.filter(_._4).foreach(r => assert(r._1 == r._2, r.toString))
    // on the real corpus: keep count == cluster count
    val t = Tables(spark, sfDir)
    val real = Dedup.canonicalize(t.documents)
    assert(real.filter($"keep").count() ==
      real.select($"cluster_id").distinct().count())
  }

  test("reliable-checkpoint mode produces identical clusters") {
    val t = Tables(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val reliable = Dedup.clusters(t.documents, checkpointDir = Some(dir))
      .collect().toSeq
    val local = Dedup.clusters(t.documents).collect().toSeq
    assert(reliable == local)
    // the reliable run actually wrote its iteration state there
    assert(new java.io.File(dir).listFiles().nonEmpty, dir)
  }

  test("clusters restores the caller's checkpoint dir (including none)") {
    import org.apache.spark.sql.graft.bridge
    val t = Tables(spark, sfDir)
    val before = bridge.checkpointDir(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt2").toString
    Dedup.clusters(t.documents.limit(50), checkpointDir = Some(dir)).count()
    assert(bridge.checkpointDir(spark) == before)
    // and with a caller-configured dir: the exact resolved value comes back
    val callers = java.nio.file.Files.createTempDirectory("graft-prior").toString
    spark.sparkContext.setCheckpointDir(callers)
    val resolved = bridge.checkpointDir(spark)
    assert(resolved.exists(_.contains("graft-prior")))
    Dedup.clusters(t.documents.limit(50), checkpointDir = Some(dir)).count()
    assert(bridge.checkpointDir(spark) == resolved)
    bridge.restoreCheckpointDir(spark, before)
  }

  test("tf-idf embedding: rare shared terms bind docs tighter than common ones") {
    import graft.functions.cosine_similarity
    // 'common' is in every doc; 'rareterm' only in docs 1 and 2
    val docs = Seq(
      (1L, "common rareterm alpha beta"),
      (2L, "common rareterm gamma delta"),
      (3L, "common epsilon zeta eta"),
      (4L, "common theta iota kappa")).toDF("doc_id", "text")
    val vecs = operators.Embeddings.tfidfVectors(docs, dim = 128)
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        cosine_similarity(col("a.embedding"), col("b.embedding")).as("sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // docs 1-2 share the rare term; docs 3-4 share only the common term
    assert(pairs((1L, 2L)) > pairs((3L, 4L)),
      s"rare-shared ${pairs((1L, 2L))} <= common-shared ${pairs((3L, 4L))}")
    // unit norm
    val norms = vecs.select(graft.functions.l2_norm(col("embedding")))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
  }

  test("k-means refinement does not worsen mean assignment distance") {
    val t = Tables(spark, sfDir)
    def meanDist(cents: org.apache.spark.sql.DataFrame): Double =
      t.embeddings.crossJoin(broadcast(cents))
        .select($"vec_id",
          (lit(1.0) - graft.functions.cosine_similarity($"embedding", $"cv"))
            .as("dist"))
        .groupBy($"vec_id").agg(min($"dist").as("d"))
        .agg(avg($"d")).head().getDouble(0)
    val seeded = meanDist(IvfIndex.centroids(t.embeddings, 16))
    val refined = meanDist(IvfIndex.kmeansCentroids(t.embeddings, 16, iters = 3))
    assert(refined <= seeded + 1e-9, s"refined=$refined seeded=$seeded")
  }

  test("snapshotDrift: stationary labels read ~0, a moved label reads its shift") {
    def vecs(rows: (Long, Int, Array[Float])*) =
      rows.toSeq.toDF("vec_id", "label", "embedding")
    // label 0: identical clouds in both snapshots → shift 0, growth 1.
    // label 1: current shard translated +0.5 along dim 0 → shift 0.5.
    // label 2: present only in current → growth -1 (no base), shift =
    // its centroid norm (the "new label" maximal-drift convention).
    val base = vecs(
      (0L, 0, Array(1f, 0f, 0f, 0f)), (2L, 0, Array(0f, 1f, 0f, 0f)),
      (4L, 1, Array(0f, 0f, 1f, 0f)), (6L, 1, Array(0f, 0f, 1f, 0f)))
    val cur = vecs(
      (1L, 0, Array(1f, 0f, 0f, 0f)), (3L, 0, Array(0f, 1f, 0f, 0f)),
      (5L, 1, Array(0.5f, 0f, 1f, 0f)), (7L, 1, Array(0.5f, 0f, 1f, 0f)),
      (9L, 2, Array(0f, 0f, 0f, 2f)))
    val got = operators.Embeddings.snapshotDrift(base, cur).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0) == ((2L, 2L, 1.0, 0.0)), s"stationary: ${got(0)}")
    val (nb1, nc1, g1, s1) = got(1)
    assert(nb1 == 2L && nc1 == 2L && g1 == 1.0)
    assert(math.abs(s1 - 0.5) < 2e-6, s"translated shift: $s1")
    val (nb2, nc2, g2, s2) = got(2)
    assert(nb2 == 0L && nc2 == 1L && g2 == -1.0)
    assert(math.abs(s2 - 2.0) < 2e-6, s"new-label shift: $s2")
  }

  test("normAudit reads exact grid norms per label") {
    // label 0: 3-4-5 vectors (norm exactly 5.0 on the grid) plus a unit
    // vector; label 1: a zero vector (the broken-encoder signal)
    val emb = Seq(
      (0L, 0, Array(3f, 4f, 0f, 0f)),
      (1L, 0, Array(0f, 3f, 4f, 0f)),
      (2L, 0, Array(1f, 0f, 0f, 0f)),
      (3L, 1, Array(0f, 0f, 0f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val got = operators.Embeddings.normAudit(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // mean = floor((5e6 + 5e6 + 1e6) / 3) / 1e6 = 3.666666
    assert(got(0L) == ((3L, 1.0, 5.0, 3.666666)), got(0L))
    assert(got(1L) == ((1L, 0.0, 0.0, 0.0)), got(1L))
  }

  test("dimProfile: exact per-axis moments, signed means, energy shares") {
    // dim0 carries {1,3,2}: mean 2, var 2/3; dim1 is {0,0,6}: mean 2,
    // var 8 — the "one hot axis" shape the audit exists to catch
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(3f, 0f)), (2L, Array(2f, 6f)))
      .toDF("vec_id", "embedding")
    val got = operators.Embeddings.dimProfile(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    // var on the grid: E[x^2]g - mg^2 div 1e6 = 4666666 - 4000000
    assert(got(0L) == ((3L, 2.0, 0.666666, 1.0, 3.0, 0.28)), got(0L))
    assert(got(1L) == ((3L, 2.0, 8.0, 0.0, 6.0, 0.72)), got(1L))
  }

  test("dimProfile: negative means ride the offset DIV exactly") {
    val emb = Seq((0L, Array(-1f)), (1L, Array(-2f)))
      .toDF("vec_id", "embedding")
    val Array(r) = operators.Embeddings.dimProfile(emb).collect()
    assert(r.getDouble(2) == -1.5, s"mean ${r.getDouble(2)}")
    assert(r.getDouble(3) == 0.25, s"var ${r.getDouble(3)}")
    assert(r.getDouble(4) == -2.0 && r.getDouble(5) == -1.0)
  }

  test("anisotropy: identical, orthogonal and opposed corpora read 1/0/-1") {
    def run(vs: Array[Float]*) = {
      val emb = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val Array(r) = operators.Embeddings.anisotropy(emb).collect()
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }
    // three copies of one direction (non-unit input: normalization is
    // part of the contract; scales chosen so x/||x|| is grid-exact):
    // every pair cosine is 1
    assert(run(Array(1f, 0f), Array(2f, 0f), Array(0.5f, 0f)) ==
      ((3L, 3.0, 1.0)))
    // orthogonal pair: E[cos] = 0, resultant = floor(sqrt(2)*1e6)/1e6
    assert(run(Array(1f, 0f), Array(0f, 1f)) == ((2L, 1.414213, 0.0)))
    // opposed pair: E[cos] = -1 (the offset DIV handles the sign)
    assert(run(Array(1f, 0f), Array(-1f, 0f)) == ((2L, 0.0, -1.0)))
    // a zero vector has no direction: excluded, not poisoning the stats
    assert(run(Array(1f, 0f), Array(0f, 1f), Array(0f, 0f)) ==
      ((2L, 1.414213, 0.0)))
  }
}
