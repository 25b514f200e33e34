package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.MlEval
import graft.sources.Tables

class MlEvalSpec extends SparkSuite {
  import spark.implicits._

  lazy val t = Tables(spark, sfDir)

  // -- AUC ------------------------------------------------------------

  test("auc matches the brute-force tie-aware rank statistic") {
    // reference computation on the collected scored table (tiny at
    // sf0.001): average-rank Mann-Whitney per class
    val scored = MlEval.scoredOneVsRest(t.embeddings)
      .select($"class", $"s_grid", $"pos").as[(Long, Long, Long)]
      .collect().toSeq
    val expect = scored.groupBy(_._1).map { case (cls, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val ranks = scala.collection.mutable.Map[Long, Double]()
      var i = 0
      while (i < sorted.length) {
        val v = sorted(i)._1
        var j = i
        while (j < sorted.length && sorted(j)._1 == v) j += 1
        // average rank of the tie group, 1-based
        ranks(v) = (i + 1 + j) / 2.0
        i = j
      }
      val p = sorted.count(_._2 == 1)
      val n = sorted.length - p
      val rSum = sorted.filter(_._2 == 1).map(r => ranks(r._1)).sum
      val u = rSum - p * (p + 1) / 2.0
      cls -> (if (p == 0 || n == 0) None
              else Some(math.floor(u / (p.toDouble * n) * 1e6) / 1e6))
    }
    val got = MlEval.auc(t.embeddings)
      .select($"label", $"auc").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got.keySet == expect.keySet)
    for ((cls, e) <- expect) assert(got(cls) == e, s"class $cls")
  }

  test("auc is invariant to partitioning") {
    val a = MlEval.auc(t.embeddings).collect().toSeq
    val b = MlEval.auc(t.embeddings.repartition(col("label")))
      .collect().toSeq
    assert(a == b)
  }

  test("auc histogram fold never sorts the corpus: window runs over the grid") {
    val plan = planOf(MlEval.auc(t.embeddings))
    // the scored table is aggregated to (class, s_grid) BEFORE the window
    assert(plan.contains("Window"), plan)
    val aggIdx = plan.indexOf("HashAggregate")
    val winIdx = plan.indexOf("Window")
    assert(aggIdx >= 0 && aggIdx < winIdx,
      "expected a hash aggregate below the window (histogram first)")
  }

  // -- calibration ------------------------------------------------------

  test("calibration bins partition the scored table exactly") {
    val cal = MlEval.calibration(t.embeddings).collect()
    val scoredN = MlEval.scoredOneVsRest(t.embeddings).count()
    assert(cal.map(_.getAs[Long]("n")).sum == scoredN)
    assert(cal.forall { r =>
      val bin = r.getAs[Long]("bin"); bin >= 0 && bin <= 9
    })
    assert(cal.forall { r =>
      r.getAs[Long]("n_pos") <= r.getAs[Long]("n")
    })
    // mean score of a bin must lie inside the bin's score range
    assert(cal.forall { r =>
      val bin = r.getAs[Long]("bin"); val m = r.getAs[Double]("mean_score")
      val lo = bin * 0.2 - 1.0
      // top bin also absorbs s_grid == 1e6 (cosine exactly 1)
      val hi = if (bin == 9) 1.0 + 1e-6 else (bin + 1) * 0.2
      m >= lo - 1e-6 && m <= hi
    })
  }

  test("ece: exact mass-weighted fold of the calibration bins") {
    // bin 0 holds two rows at score -1.0 with one positive: |pos_rate -
    // mean| = |0.5 - (-1.0)| = 1.5; bin 9 holds two perfectly-calibrated
    // positives at score 1.0: diff 0. ECE = (2*1.5 + 2*0)/4 = 0.75
    val scored = Seq(
      (0L, -1000000L, 0L), (0L, -1000000L, 1L),
      (0L, 1000000L, 1L), (0L, 1000000L, 1L))
      .toDF("class", "s_grid", "pos")
    val Array(r) = MlEval.eceFromScored(scored).collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((0L, 2L, 4L, 0.75)), r.toSeq)
    // a perfectly-calibrated table reads 0 in every mass assignment
    val perfect = Seq(
      (1L, 500000L, 1L), (1L, 500000L, 0L),   // bin 7, pos_rate 0.5...
      (1L, 500000L, 1L), (1L, 500000L, 0L))
      .toDF("class", "s_grid", "pos")
    // pos_rate 0.5 vs mean_score 0.5: diff exactly 0 on the grid
    val Array(p) = MlEval.eceFromScored(perfect).collect()
    assert(p.getDouble(3) == 0.0, p.toSeq)
    // consistency on the real corpus: ECE per label lies in [0, 2] and
    // bins/masses agree with the calibration table
    val cal = MlEval.calibration(t.embeddings).collect()
      .groupBy(_.getLong(0))
    val ece = MlEval.eceFromScored(MlEval.scoredOneVsRest(t.embeddings))
      .collect()
    assert(ece.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 2.0))
    ece.foreach { r =>
      val bins = cal(r.getLong(0))
      assert(r.getLong(1) == bins.length.toLong, "bin count mismatch")
      assert(r.getLong(2) == bins.map(_.getAs[Long]("n")).sum, "mass")
    }
  }

  test("pr curve: monotone recall, cross-checked against the scored table") {
    val scored = MlEval.scoredOneVsRest(t.embeddings)
      .select($"class", $"s_grid", $"pos").as[(Long, Long, Long)]
      .collect().toSeq
    val rows = MlEval.prCurve(t.embeddings).collect()
    rows.foreach { r =>
      val cls = r.getAs[Long]("label")
      val thr = math.round(r.getAs[Double]("threshold") * 1e6)
      val sel = scored.filter(s => s._1 == cls && s._2 >= thr)
      assert(r.getAs[Long]("n_pred") == sel.size.toLong)
      assert(r.getAs[Long]("tp") == sel.count(_._3 == 1L).toLong)
    }
    // recall is non-increasing as the threshold rises within a class
    rows.groupBy(_.getAs[Long]("label")).foreach { case (_, rs) =>
      val byBin = rs.sortBy(_.getAs[Long]("bin"))
        .flatMap(r => Option(r.get(r.fieldIndex("recall")))
          .map(_.asInstanceOf[Double]))
      assert(byBin.zip(byBin.tail).forall { case (a, b) => b <= a + 1e-9 })
    }
    // thresholds with nothing predicted positive emit no row
    assert(rows.forall(_.getAs[Long]("n_pred") > 0L))
  }

  // -- A/B test ---------------------------------------------------------

  test("ab test arms partition users and z matches a direct computation") {
    val r = MlEval.abTest(t.events).collect().head
    val nA = r.getAs[Long]("n_a"); val nB = r.getAs[Long]("n_b")
    val cA = r.getAs[Long]("conv_a"); val cB = r.getAs[Long]("conv_b")
    val users = t.events.select($"user_id").distinct().count()
    assert(nA + nB == users)
    assert(cA <= nA && cB <= nB)
    val pa = cA.toDouble / nA; val pb = cB.toDouble / nB
    val pp = (cA + cB).toDouble / (nA + nB)
    val got = Option(r.get(r.fieldIndex("z"))).map(_.asInstanceOf[Double])
    if (pp > 0 && pp < 1) {
      val z = (pb - pa) / math.sqrt(pp * (1.0 - pp) * (1.0 / nA + 1.0 / nB))
      assert(got.contains(math.floor(z * 1e6) / 1e6))
    } else assert(got.isEmpty) // degenerate pool: z undefined, not NaN
  }

  test("ab assignment is stable: same user hashes to the same arm") {
    // variant is a pure function of user_id — re-running over a
    // differently-partitioned log cannot move a user between arms
    val a = MlEval.abTest(t.events).collect().head
    val b = MlEval.abTest(t.events.repartition(col("event_type")))
      .collect().head
    assert(a == b)
  }

  // -- KS test ----------------------------------------------------------

  test("ab power: MDE matches a direct computation, powers consistently") {
    val Array(r) = MlEval.abPower(t.events).collect()
    val (na, ca) = (r.getLong(0), r.getLong(1))
    val (nb, cb) = (r.getLong(2), r.getLong(3))
    val pp = (ca + cb).toDouble / (na + nb).toDouble
    val want = math.floor(2.801585 * math.sqrt(pp * (1.0 - pp) *
      (1.0 / na + 1.0 / nb)) * 1e6) / 1e6
    assert(r.getDouble(6) == want, s"mde ${r.getDouble(6)} vs $want")
    assert(r.getBoolean(7) ==
      (math.abs(r.getDouble(5) - r.getDouble(4)) > r.getDouble(6)))
    // halving the sample raises the detectable floor
    val Array(half) = MlEval.abPower(
      t.events.filter($"user_id" % 2 === 0)).collect()
    assert(half.getDouble(6) > r.getDouble(6),
      s"${half.getDouble(6)} vs ${r.getDouble(6)}")
  }

  test("ks statistic matches a driver-side ECDF computation") {
    val docs = t.documents.select($"source", $"n_chars")
      .as[(String, Long)].collect().toSeq
    val bySource = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val sources = bySource.keys.toSeq.sorted
    val got = MlEval.ksTest(t.documents).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("ks"))
      .toMap
    for {
      (a, ia) <- sources.zipWithIndex; b <- sources.drop(ia + 1)
    } {
      val xa = bySource(a); val xb = bySource(b)
      val grid = (xa ++ xb).distinct.sorted
      val d2 = grid.map { v =>
        math.abs(xa.count(_ <= v).toLong * xb.size -
          xb.count(_ <= v).toLong * xa.size)
      }.max
      val e = (d2 * 1000000L / (xa.size.toLong * xb.size)).toDouble / 1e6
      assert(got((a, b)) == e, s"pair ($a,$b)")
    }
  }

  test("ks of a distribution against itself is zero") {
    // two synthetic sources with identical length histograms
    val docs = Seq(("s1", 10L), ("s1", 20L), ("s1", 20L),
      ("s2", 10L), ("s2", 20L), ("s2", 20L))
      .toDF("source", "n_chars")
    val r = MlEval.ksTest(docs).collect()
    assert(r.length == 1 && r.head.getAs[Double]("ks") == 0.0)
  }

  test("ks detects a planted shift") {
    val docs = ((1 to 50).map(i => ("lo", i.toLong)) ++
      (1 to 50).map(i => ("hi", i + 1000L))).toDF("source", "n_chars")
    val r = MlEval.ksTest(docs).collect().head
    assert(r.getAs[Double]("ks") == 1.0) // disjoint supports
  }
}
