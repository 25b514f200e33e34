package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{FeatureSelect, Warehouse}
import graft.sources.Tables

class WarehouseSpec extends SparkSuite {
  import spark.implicits._

  lazy val t = Tables(spark, sfDir)

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2 builds contiguous versioned intervals per key") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "view"),
      (1L, ts("2024-01-01 00:05:00"), 11L, "view"),   // no change
      (1L, ts("2024-01-01 00:10:00"), 12L, "click"),  // v2
      (1L, ts("2024-01-01 00:20:00"), 13L, "view"),   // v3 (back is a change)
      (2L, ts("2024-01-01 01:00:00"), 20L, "signup")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Warehouse.scd2(ev).collect()
    val u1 = got.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L, 3L))
    assert(u1.map(_.getAs[String]("state")).toSeq ==
      Seq("view", "click", "view"))
    // intervals chain: each version's valid_to is the next valid_from
    assert(u1.init.zip(u1.tail).forall { case (a, b) =>
      a.getAs[Timestamp]("valid_to") == b.getAs[Timestamp]("valid_from")
    })
    // exactly one open (current) row per user
    assert(got.groupBy(_.getLong(0)).forall(_._2.count(_.getAs[Boolean]("is_current")) == 1))
    assert(u1.last.getAs[Timestamp]("valid_to") == null)
  }

  test("scd2 on the event log: versions are dense and states alternate") {
    val got = Warehouse.scd2(t.events)
    val byUser = got.groupBy($"user_id")
      .agg(max($"version").as("vmax"), count(lit(1)).as("n"))
    // row_number makes versions dense 1..n
    assert(byUser.filter($"vmax" =!= $"n").count() == 0)
    // no two consecutive versions share a state (they'd have been merged)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"version")
    val repeats = got.withColumn("prev", lag($"state", 1).over(w))
      .filter($"prev" === $"state").count()
    assert(repeats == 0)
  }

  test("scd2 shares one user exchange across all three windows") {
    val plan = planOf(Warehouse.scd2(t.events))
    // lag + filter + row_number/lead: ONE hashpartitioning(user_id)
    // exchange feeds both window nodes (the formatted dump carries the
    // partitioning in the Exchange's Arguments detail line)
    val exchanges = plan.linesIterator
      .count(l => l.contains("hashpartitioning(user_id"))
    assert(exchanges == 1, s"expected 1 user exchange, plan:\n$plan")
  }

  test("cdc feed classifies inserts, deletes, and updates; unchanged rows absent") {
    val base = Seq((1L, "kept the same"), (2L, "will be deleted"),
      (3L, "will change")).toDF("doc_id", "text")
    val cur = Seq((1L, "kept the same"), (3L, "changed now"),
      (4L, "brand new")).toDF("doc_id", "text")
    val got = Warehouse.cdc(base, cur).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        r.getAs[Long]("n_chars_base"), r.getAs[Long]("n_chars_cur"))).toMap
    assert(got.keySet == Set(2L, 3L, 4L)) // doc 1 unchanged → absent
    assert(got(2L) == (("delete", 15L, 0L)))
    assert(got(3L) == (("update", 11L, 11L)))
    assert(got(4L) == (("insert", 0L, 9L)))
  }

  test("cdc join is co-partitioned: one exchange per side, no re-shuffle") {
    val (base, cur) = (t.documents.select($"doc_id", $"text"),
      t.documents.select($"doc_id", concat($"text", lit("x")).as("text")))
    val plan = planOf(Warehouse.cdc(base, cur))
    // a doc_id full-outer SMJ: exactly two hashpartitioning(doc_id)
    // exchanges (one per input), nothing downstream re-partitions
    val ex = plan.linesIterator.count(_.contains("hashpartitioning(doc_id"))
    assert(ex == 2, s"expected 2 input exchanges, got $ex:\n$plan")
  }

  test("cdc exchanges carry fingerprints and lengths, never bodies") {
    // the r14 weak mark: both input exchanges carried the raw `text`
    // column — 2× corpus BYTES through the shuffle for a feed whose
    // output needs (doc_id, op, lengths). The fingerprint projection
    // must sit BELOW the exchange (PlanDoctor's width gate sees the
    // exchange input schema; the poly_fingerprint is scan-side).
    val (base, cur) = (t.documents.select($"doc_id", $"text"),
      t.documents.select($"doc_id", concat($"text", lit("x")).as("text")))
    val findings = PlanDoctor.audit(Warehouse.cdc(base, cur))
    assert(!findings.exists(_.rule == "body-width-exchange"),
      findings.mkString("\n"))
  }

  test("bucketed snapshot pair: CDC joins with ZERO input exchanges") {
    // the publish-time layout: both releases bucketed by doc_id, so the
    // full-outer join reads co-located buckets — no hashpartitioning
    // exchange anywhere (the only exchange left is the presentation
    // rangepartitioning sort). Layout must not change the answer.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-snap-bucketed").toString
    val base = t.documents.filter($"doc_id" % 5 =!= 4)
      .select($"doc_id", $"source", $"text")
    val cur = t.documents.filter($"doc_id" % 5 =!= 0)
      .select($"doc_id", $"source",
        when($"doc_id" % 7 === 0,
          concat($"text", lit(" refreshed content v2")))
          .otherwise($"text").as("text"))
    Warehouse.persistSnapshotPair(base, cur,
      "graft_test_snap_base", "graft_test_snap_cur", dir)
    try {
      val bucketed = Warehouse.cdcBucketed(spark,
        "graft_test_snap_base", "graft_test_snap_cur")
      val plan = planOf(bucketed)
      assert(!plan.contains("hashpartitioning(doc_id"),
        s"bucketed CDC still exchanges on doc_id:\n$plan")
      assert(bucketed.collect().toSeq ==
        Warehouse.cdc(base, cur).collect().toSeq,
        "layout changed the answer")
      // the per-source churn rollup reads the SAME pair exchange-free
      // on doc_id (the only exchanges left: the per-source aggregate
      // and the presentation sort — both output-sized)
      val diffB = operators.Governance.snapshotDiff(
        spark.table("graft_test_snap_base"),
        spark.table("graft_test_snap_cur"))
      val diffPlan = planOf(diffB)
      assert(!diffPlan.contains("hashpartitioning(doc_id"),
        s"bucketed snapshotDiff still exchanges on doc_id:\n$diffPlan")
      assert(diffB.collect().toSeq ==
        operators.Governance.snapshotDiff(base, cur).collect().toSeq,
        "layout changed the snapshotDiff answer")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_snap_base")
      spark.sql("DROP TABLE IF EXISTS graft_test_snap_cur")
    }
  }

  test("token-lang MI ranks a perfectly separating token at the top") {
    // synthetic corpus: token 'aaa' appears in ALL lang-x docs and NO
    // lang-y docs (perfect predictor); 'zzz' appears everywhere
    // (uninformative). 30 docs each, minDf low enough for both.
    val docs = ((1 to 30).map(i => (i.toLong, s"aaa zzz filler$i", "x")) ++
      (31 to 60).map(i => (i.toLong, s"bbb zzz filler$i", "y")))
      .toDF("doc_id", "text", "lang")
    val got = FeatureSelect.tokenLangMi(docs, minDf = 25, topK = 10).collect()
    val miOf = got.map(r => r.getString(0) -> r.getAs[Double]("mi")).toMap
    assert(miOf.contains("aaa") && miOf.contains("zzz"))
    // perfect separator carries ln(2) of information; shared token none
    assert(miOf("aaa") > 0.65 && miOf("aaa") < 0.70, miOf("aaa"))
    assert(math.abs(miOf("zzz")) < 1e-6, miOf("zzz"))
    assert(got.head.getString(0) == "aaa" || got.head.getString(0) == "bbb")
  }

  test("token-lang chi2: perfect separator scores N, shared token zero") {
    // 2x2 perfect association gives χ² = N exactly; a token present in
    // every document has expected == observed everywhere → 0
    val docs = ((1 to 30).map(i => (i.toLong, s"aaa zzz filler$i", "x")) ++
      (31 to 60).map(i => (i.toLong, s"bbb zzz filler$i", "y")))
      .toDF("doc_id", "text", "lang")
    val got = FeatureSelect.tokenLangChi2(docs, minDf = 25, topK = 10)
      .collect()
    val of = got.map(r => r.getString(0) -> r.getAs[Double]("chi2")).toMap
    assert(math.abs(of("aaa") - 60.0) < 1e-6, of("aaa"))
    assert(math.abs(of("bbb") - 60.0) < 1e-6, of("bbb"))
    assert(math.abs(of("zzz")) < 1e-6, of("zzz"))
    assert(Set("aaa", "bbb")(got.head.getString(0)))
  }

  test("token-lang MI counts presence, not frequency") {
    val docs = Seq(
      (1L, "dup dup dup dup", "x"),
      (2L, "dup", "x"),
      (3L, "other words here", "y"),
      (4L, "other words here", "y")).toDF("doc_id", "text", "lang")
    val got = FeatureSelect.tokenLangMi(docs, minDf = 1, topK = 100)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("df")).toMap
    assert(got("dup") == 2L) // 2 documents, not 5 occurrences
  }
}
