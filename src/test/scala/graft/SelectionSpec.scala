package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Selection}

class SelectionSpec extends SparkSuite {
  import spark.implicits._

  test("dsirScores up-weights target-like docs and keeps the top quarter") {
    // target slice: 'en' docs speak "alpha/beta"; the pool's bulk speaks
    // "gamma/delta" — alpha-heavy docs must outscore gamma-heavy ones
    val docs = (
      (1 to 4).map(i => (i.toLong, "alpha beta alpha beta alpha", "en")) ++
        (5 to 12).map(i => (i.toLong, "gamma delta gamma delta gamma", "de")) ++
        Seq((13L, "alpha beta alpha beta gamma", "fr"),
          (14L, "", "de"))
      ).toDF("doc_id", "text", "lang")
    val rows = Selection.dsirScores(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 14)
    // target-vocabulary docs score strictly above the raw-pool bulk
    assert(rows(1L).getDouble(2) > rows(5L).getDouble(2))
    // the mixed doc sits between the pure cases
    assert(rows(13L).getDouble(2) > rows(5L).getDouble(2))
    assert(rows(13L).getDouble(2) < rows(1L).getDouble(2))
    // empty doc: zero tokens, zero score
    assert(rows(14L).getLong(1) == 0L && rows(14L).getDouble(2) == 0.0)
    // keep = top quarter (14 docs -> at least 4 kept, never the bulk)
    val kept = rows.values.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(kept.intersect(Set(1L, 2L, 3L, 4L)).size == 4)
    assert(kept.intersect((5L to 12L).toSet).isEmpty)
  }

  test("dsirScores keep-cut is an order statistic: >= n/4 docs kept") {
    val docs = (1 to 40).map { i =>
      val lang = if (i % 5 == 0) "en" else "zz"
      (i.toLong, s"tok${i % 7} tok${i % 3} fill$i", lang)
    }.toDF("doc_id", "text", "lang")
    val out = Selection.dsirScores(docs).collect()
    val kept = out.count(_.getBoolean(3))
    assert(kept * 4 >= out.length,
      s"order-statistic cut must keep at least n/4 ($kept of ${out.length})")
  }

  test("dsirScores rejects a non-power-of-two bucket count") {
    val docs = Seq((1L, "a b c", "en")).toDF("doc_id", "text", "lang")
    intercept[IllegalArgumentException] {
      Selection.dsirScores(docs, buckets = 1000)
    }
  }

  test("dsirApply with a frozen model reproduces the batch scorer on any subset") {
    val docs = (1 to 40).map { i =>
      val lang = if (i % 4 == 0) "en" else "xx"
      (i.toLong, s"alpha tok${i % 7} beta tok${i % 3} tail$i", lang)
    }.toDF("doc_id", "text", "lang")
    val model = Selection.trainDsir(docs)
    val full = Selection.dsirScores(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val subset = docs.filter(col("doc_id") % 3 === 0)
    val served = Selection.dsirApply(subset, model).collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      val b = full(r.getLong(0))
      assert(r.getLong(1) == b.getLong(1) &&
        r.getDouble(2) == b.getDouble(2) && r.getBoolean(3) == b.getBoolean(3),
        s"doc ${r.getLong(0)}: served $r != batch $b")
    }
    // a doc with vocabulary entirely unseen at freeze time still scores
    // (ct=0/cr=0 smoothing), it does not crash or go missing
    val novel = Seq((999L, "zzz qqq www")).toDF("doc_id", "text")
    val out = Selection.dsirApply(novel, model).collect()
    assert(out.length == 1 && out(0).getLong(1) == 3L)
  }

  test("weightedSample favors high-quality docs and caps per stratum") {
    // 40 docs per source: 20 long/clean (high quality) vs 20 short
    // (low quality) — the k=10 weighted sample should lean heavily
    // toward the high-quality half in every stratum
    val good = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = (0 until 80).map { i =>
      val src = if (i < 40) "s1" else "s2"
      val text = if (i % 2 == 0) good else "tiny"
      (i.toLong, text, src)
    }.toDF("doc_id", "text", "source")
    val out = Selection.weightedSample(docs, k = 10).collect()
    assert(out.length == 20, "k rows per stratum")
    val bySrc = out.groupBy(_.getString(0))
    assert(bySrc.keySet == Set("s1", "s2"))
    bySrc.values.foreach { rows =>
      assert(rows.length == 10)
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 10L),
        "ranks are 1..k")
      val highQuality = rows.count(_.getLong(2) % 2 == 0)
      assert(highQuality >= 7,
        s"weighted race must favor high-quality docs ($highQuality/10)")
    }
    // deterministic: a second run returns the identical sample
    assert(Selection.weightedSample(docs, k = 10).collect().toSeq ==
      out.toSeq)
  }

  test("mixTemperature flattens shares toward small sources") {
    val docs = (
      (1 to 90).map(i => (i.toLong, "w1 w2 w3 w4 w5 w6 w7 w8", "big")) ++
        (91 to 100).map(i => (i.toLong, "w1 w2 w3 w4 w5 w6 w7 w8", "small"))
      ).toDF("doc_id", "text", "source")
    val rows = Selection.mixTemperature(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val (bigShare, bigW) =
      (rows("big").getDouble(3), rows("big").getDouble(4))
    val (smallShare, smallW) =
      (rows("small").getDouble(3), rows("small").getDouble(4))
    // temperature flattening: the big source's weight drops below its
    // natural share, the small source's rises above it
    assert(bigW < bigShare && smallW > smallShare)
    assert(rows("small").getDouble(5) > 1.0, "small source boost > 1")
    assert(rows("big").getDouble(5) < 1.0, "big source boost < 1")
    // weights still ordered by size and sum to ~1 on the floored grid
    assert(bigW > smallW)
    assert(math.abs(bigW + smallW - 1.0) < 1e-4)
  }

  test("sourceMatrix attributes near-dup pairs to unordered source cells") {
    val boiler = (1 to 30).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, boiler, "srcA"), // near-identical trio across two sources
      (2L, boiler + " tail", "srcB"),
      (3L, boiler, "srcA"),
      (4L, (1 to 30).map(i => s"unrelated$i").mkString(" "), "srcC"))
      .toDF("doc_id", "text", "source")
    val cells = Dedup.sourceMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs (1,2) and (2,3) cross srcA/srcB; (1,3) is intra-srcA
    assert(cells(("srcA", "srcB")) == 2L)
    assert(cells(("srcA", "srcA")) == 1L)
    assert(!cells.keys.exists { case (a, b) => a == "srcC" || b == "srcC" })
    // shares sum to 1 on the floored grid
    val shares = Dedup.sourceMatrix(docs).collect().map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-5)
  }
}
