package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier
import graft.sources.Tables

/** Nearest-centroid classification: split discipline, prototype
  * geometry, argmin ties, and the plan's broadcast-only inference. */
class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  lazy val t = Tables(spark, sfDir)

  test("classify: held-out rows only, every label predicted from the train set") {
    val rows = Classifier.classify(t.embeddings).collect()
    assert(rows.nonEmpty)
    // exactly the vec_id % 5 == 0 split, each exactly once
    val ids = rows.map(_.getLong(0))
    assert(ids.forall(_ % 5 == 0))
    assert(ids.distinct.length == ids.length)
    assert(ids.length ==
      t.embeddings.filter($"vec_id" % 5 === 0).count())
    // predictions come from the train-split label alphabet
    val trainLabels = t.embeddings.filter($"vec_id" % 5 =!= 0)
      .select($"label".cast("long")).distinct().as[Long].collect().toSet
    rows.foreach { r =>
      assert(trainLabels.contains(r.getLong(2)))
      assert(r.getDouble(3) >= 0.0)
      assert(r.getBoolean(4) == (r.getLong(1) == r.getLong(2)))
    }
  }

  test("classify: a point sitting on a class prototype gets that class") {
    // two tight clusters on orthogonal axes — the held-out member of
    // each (id % 5 == 0) must classify into its own cluster
    def v(axis: Int, eps: Float): Array[Float] = {
      val a = new Array[Float](4); a(axis) = 1.0f; a((axis + 1) % 4) = eps; a
    }
    val df = Seq(
      (0L, v(0, 0.00f), 7), (1L, v(0, 0.01f), 7), (2L, v(0, 0.02f), 7),
      (5L, v(2, 0.00f), 9), (6L, v(2, 0.01f), 9), (7L, v(2, 0.02f), 9))
      .toDF("vec_id", "embedding", "label")
    val got = Classifier.classify(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(got(0L) == (7L, true))
    assert(got(5L) == (9L, true))
  }

  test("eval report: support sums to the held-out count, recall on the 1e-6 grid") {
    val rep = Classifier.evalReport(t.embeddings).collect()
    val heldout = t.embeddings.filter($"vec_id" % 5 === 0).count()
    assert(rep.map(_.getLong(1)).sum == heldout)
    rep.foreach { r =>
      val (n, nc, rec) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nc <= n)
      assert(rec == math.floor(nc.toDouble / n * 1e6) / 1e6)
    }
  }

  test("f1 report: cells reconcile with a driver-side confusion matrix") {
    val cls = Classifier.classify(t.embeddings)
      .select($"label", $"predicted").as[(Long, Long)].collect().toSeq
    val rep = Classifier.f1Report(t.embeddings).collect()
      .map(r => r.getLong(0) -> r).toMap
    val classes = (cls.map(_._1) ++ cls.map(_._2)).distinct
    assert(rep.keySet == classes.toSet)
    classes.foreach { c =>
      val tp = cls.count(x => x._1 == c && x._2 == c).toLong
      val nTrue = cls.count(_._1 == c).toLong
      val nPred = cls.count(_._2 == c).toLong
      val r = rep(c)
      assert(r.getAs[Long]("tp") == tp, s"class $c tp")
      assert(r.getAs[Long]("fp") == nPred - tp, s"class $c fp")
      assert(r.getAs[Long]("fn") == nTrue - tp, s"class $c fn")
      if (nTrue + nPred > 0)
        assert(r.getAs[Double]("f1") ==
          (2 * tp * 1000000L / (nTrue + nPred)).toDouble / 1e6, s"class $c f1")
    }
    // micro-consistency: Σtp over classes = total correct
    assert(rep.values.map(_.getAs[Long]("tp")).sum ==
      cls.count(x => x._1 == x._2).toLong)
  }

  test("classCohesion: tight class reads 1.0, polluted class reads lower") {
    // class 7: three identical vectors -> centroid == member, mean and
    // min cosine exactly 1.0. class 8: two orthogonal vectors -> each
    // member sits at 45 degrees from the centroid (cos = 1/sqrt(2)).
    def v(axis: Int): Array[Float] = {
      val a = new Array[Float](4); a(axis) = 1.0f; a
    }
    val df = Seq(
      (0L, v(0), 7), (1L, v(0), 7), (2L, v(0), 7),
      (3L, v(1), 8), (4L, v(2), 8))
      .toDF("vec_id", "embedding", "label")
    val got = Classifier.classCohesion(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(got(7L) == ((3L, 1.0, 1.0)), got(7L))
    val (n8, mean8, min8) = got(8L)
    assert(n8 == 2L)
    val c45 = math.floor(1.0 / math.sqrt(2.0) * 1e6) / 1e6
    assert(math.abs(mean8 - c45) < 2e-6, s"mean8=$mean8")
    assert(math.abs(min8 - c45) < 2e-6, s"min8=$min8")
    assert(mean8 < 1.0 && min8 <= mean8)
  }

  test("plan: inference is broadcast-only — no shuffle of the corpus side pre-argmin") {
    val plan = planOf(Classifier.classify(t.embeddings))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    // the only wide ops are the VectorAvg training aggregate and the
    // per-vec argmin — no window sort anywhere
    assert(!plan.contains("Window"), plan)
  }
}
