package graft

import org.apache.spark.sql.functions._
import graft.operators.{Governance, Profile}

class GovernanceSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("snapshotDiff classifies added / removed / changed / unchanged per source") {
    val base = docs(
      (1L, "a", "alpha beta gamma"),
      (2L, "a", "delta epsilon zeta"),
      (3L, "b", "eta theta iota"),
      (4L, "b", "kappa lambda mu"))
    val cur = docs(
      (1L, "a", "alpha beta gamma"),        // unchanged
      (2L, "a", "delta epsilon CHANGED"),   // changed
      (4L, "b", "kappa lambda mu"),         // unchanged (3 removed)
      (5L, "b", "nu xi omicron"))           // added
    val got = Governance.snapshotDiff(base, cur).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4),
      a.getLong(5), a.getLong(6)) == ((2L, 2L, 0L, 0L, 1L, 1L)))
    assert(a.getDouble(7) == 0.5) // 1 changed / 2 base
    val b = got("b")
    assert((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4),
      b.getLong(5), b.getLong(6)) == ((2L, 2L, 1L, 1L, 0L, 1L)))
    assert(b.getDouble(7) == 1.0) // (1 added + 1 removed) / 2 base
  }

  test("snapshotDiff: normalization-invariant edits are NOT churn") {
    val base = docs((1L, "a", "Alpha  Beta"))
    val cur = docs((1L, "a", "alpha beta")) // same normalized content
    val row = Governance.snapshotDiff(base, cur).collect().head
    assert(row.getLong(6) == 1L && row.getDouble(7) == 0.0)
  }

  test("split assignment depends only on content: stable under corpus growth") {
    val small = docs((1L, "a", "some document text here"))
    val big = docs(
      (1L, "a", "some document text here"),
      (2L, "a", "another doc"), (3L, "b", "third doc"))
    def splitOf(df: org.apache.spark.sql.DataFrame) =
      Governance.withSplit(df).filter(col("doc_id") === 1L)
        .select("split").collect().head.getString(0)
    assert(splitOf(small) == splitOf(big))
    // and re-identifying the doc does not move it (content-keyed)
    val reid = docs((999L, "a", "some document text here"))
    assert(splitOf(small) ==
      Governance.withSplit(reid).select("split").collect().head.getString(0))
  }

  test("leakageAudit: id split leaks verbatim duplicates, content split cannot") {
    // docs 1 and 12 are verbatim duplicates with DIFFERENT id buckets
    // (1 % 10 = 1, 12 % 10 = 2); 3/4 are unique
    val d = docs(
      (1L, "a", "duplicated body of text"),
      (12L, "a", "duplicated body of text"),
      (3L, "a", "unique one"),
      (4L, "a", "unique two"))
    val got = Governance.leakageAudit(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val byId = got("by_id"); val byCt = got("by_content")
    assert(byId.getLong(1) == 3L && byId.getLong(2) == 1L) // 3 groups, 1 dup
    assert(byId.getLong(3) == 1L && byId.getLong(4) == 2L) // leaks 1 group / 2 docs
    assert(byCt.getLong(1) == 3L && byCt.getLong(2) == 1L)
    assert(byCt.getLong(3) == 0L && byCt.getLong(4) == 0L) // structurally leak-free
  }

  test("ngramNovelty counts test grams unseen in train") {
    // Force the split via a stub: call the internals through withSplit by
    // crafting texts whose fingerprint buckets land where needed is
    // brittle — instead verify the arithmetic on the REAL operator by
    // checking invariants over the sf0.001 corpus: every test doc appears
    // exactly once, n_novel <= n_grams, and fractions ride the 1e-4 grid.
    val t = graft.sources.Tables(spark, sfDir)
    val out = Governance.ngramNovelty(
      t.documents.select(col("doc_id"), col("text"))).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    out.foreach { r =>
      val (n, nov, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nov >= 0 && nov <= n)
      assert(f >= 0.0 && f <= 1.0)
      assert(math.abs(f * 1e4 - math.floor(f * 1e4 + 1e-9)) < 1e-6)
      if (n > 0)
        assert(f == math.floor(nov.toDouble / n.toDouble * 1e4) / 1e4)
    }
    // the test split is a strict subset of the corpus
    assert(out.length < t.documents.count())
  }

  test("ngramNovelty: a test doc fully covered by train has zero novelty") {
    // search (ONE Spark pass) for a test-bucketed 7-token text, then for
    // a train-bucketed superset that starts with it — the test doc's
    // three 5-grams are then all present in the train doc
    def splits(texts: Seq[String]): Map[String, String] =
      Governance.withSplit(
        texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("doc_id", "text"))
        .select("text", "split").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    val bases = (1 to 300).map(i => s"a$i b$i c$i d$i e$i f$i g$i")
    val testText = {
      val m = splits(bases)
      bases.find(m(_) == "test").get
    }
    val exts = (1 to 300).map(j => s"$testText tail$j more$j words$j")
    val trainText = {
      val m = splits(exts)
      exts.find(m(_) == "train").get
    }
    val d = Seq((1L, trainText), (2L, testText)).toDF("doc_id", "text")
    val out = Governance.ngramNovelty(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.contains(2L) && !out.contains(1L))
    assert(out(2L).getLong(1) == 3L) // 7 tokens → three 5-grams
    assert(out(2L).getLong(2) == 0L, "all test grams occur in the train doc")
    assert(out(2L).getDouble(3) == 0.0)
  }

  test("profile reports nulls, exact distincts and typed min/max") {
    val df = Seq(
      (Some(10L), Some("b")),
      (Some(20L), Some("a")),
      (Some(10L), None),
      (None, Some("a"))).toDF("num", "str")
    val got = Profile.profile(df,
      numSpecs = Seq("num" -> col("num")),
      strSpecs = Seq("str" -> col("str"))).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = got("num")
    assert(n.getLong(1) == 4L && n.getLong(2) == 1L && n.getLong(3) == 2L)
    assert(n.getLong(4) == 10L && n.getLong(5) == 20L)
    assert(n.isNullAt(6) && n.isNullAt(7))
    val s = got("str")
    assert(s.getLong(1) == 4L && s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "b")
  }

  test("profileSketch: under-k est equals exact distinct; estimator equals KmvBuffer replay") {
    val df = Seq(
      (Some(10L), Some("b")),
      (Some(20L), Some("a")),
      (Some(10L), None),
      (None, Some("a"))).toDF("num", "str")
    val specsN = Seq("num" -> col("num")); val specsS = Seq("str" -> col("str"))
    // under-k regime: the KMV set IS the distinct set → est == exact,
    // kth_min == 0, and every other column matches the exact profile
    val exact = Profile.profile(df, specsN, specsS).collect()
      .map(r => r.getString(0) -> r).toMap
    val sk = Profile.profileSketch(df, specsN, specsS, k = 64).collect()
      .map(r => r.getString(0) -> r).toMap
    Seq("num", "str").foreach { c =>
      val (e, s) = (exact(c), sk(c))
      assert(s.getLong(1) == e.getLong(1) && s.getLong(2) == e.getLong(2))
      assert(s.getLong(3) == e.getLong(3), s"$c: under-k est must be exact")
      assert(s.getLong(4) == 0L, s"$c: kth_min is 0 on the exact path")
      (5 to 8).foreach(i => assert(s.get(i) == e.get(i - 1),
        s"$c min/max slot $i"))
    }
    // estimator regime (k=2 < 3 distinct nums): bit-equal to a local
    // KmvBuffer fold over the same ProfileStream.valueHash domain
    val many = Seq(Some(10L), Some(20L), Some(30L), None)
      .map(v => (v, None: Option[String])).toDF("num", "str")
    val got = Profile.profileSketch(many, specsN, Nil, k = 2).collect()
      .map(r => r.getString(0) -> r).toMap
    val buf = new graft.functions.KmvBuffer(2)
    Seq(10L, 20L, 30L).foreach(v =>
      buf.add(graft.streaming.ProfileStream.valueHash(Some(v), None).get))
    val (wantEst, wantKth) = buf.estimate
    assert(got("num").getLong(3) == wantEst && got("num").getLong(4) == wantKth)
    assert(wantKth != 0L, "sanity: k=2 over 3 distincts is the estimator path")
    // and the sketch path is partitioning-invariant (set-union merge)
    val re = Profile.profileSketch(many.repartition(7), specsN, Nil, k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(re("num") == wantEst)
  }

  test("profileSketch shuffle ships column partials, not distinct values") {
    // plan shape: ONE aggregate straight off the unpivot — no
    // (col, value) pre-collapse exchange; the only shuffle key is
    // col_name, so each map partition ships |columns| sketch partials
    val t = graft.sources.Tables(spark, sfDir)
    val plan = planOf(Profile.ordersProfileSketch(t))
    assert(plan.contains("kmv_distinct"))
    // exactly two exchanges: the col_name-keyed aggregate and the
    // presentation sort — NO (col, value) pre-collapse exchange (the
    // exact profile's third), so the shuffle is corpus-independent
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected agg+sort exchanges only, plan:\n$plan")
    assert(plan.contains("hashpartitioning(col_name"),
      s"aggregate must shuffle on col_name only:\n$plan")
  }

  test("signalDrift: exact per-source means, negative deltas floor, one-sided sources") {
    val base = docs(
      (1L, "a", "w1 w2"),           // 2 tokens
      (2L, "a", "w1 w2 w3 w4"))     // 4 tokens → mean 3.0
    val cur = docs(
      (1L, "a", "w1 w2"))           // mean 2.0 → delta -1.0
      .union(docs((9L, "b", "x1 x2 x3")))
    val got = Governance.signalDrift(base, cur,
      graft.functions.TextFunctions.wsTokenCount(col("text"))).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 2L && a.getLong(2) == 1L)
    assert(a.getDouble(3) == 3.0 && a.getDouble(4) == 2.0)
    assert(a.getDouble(5) == -1.0) // floor of a NEGATIVE mean move
    val b = got("b")
    assert(b.getLong(1) == 0L && b.getDouble(3) == 0.0)
    assert(b.getDouble(4) == 3.0 && b.getDouble(5) == 3.0)
  }

  test("profileDiff flags range escapes null-safely per typed pair") {
    val base = Seq((1L, Some("a")), (2L, Some("b")), (3L, None))
      .toDF("num", "str")
    val widerNum = Seq((9L, Some("a")), (1L, Some("b")))
      .toDF("num", "str") // num max escapes; str stays inside
    val specsN = Seq("num" -> col("num")); val specsS = Seq("str" -> col("str"))
    val got = Profile.profileDiff(base, widerNum, specsN, specsS).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("num").getBoolean(7), "max 9 > base max 3 must expand")
    assert(!got("str").getBoolean(7))
    assert(got("str").getDouble(5) == math.floor(1.0 / 3.0 * 1e6) / 1e6)
    assert(got("str").getDouble(6) == 0.0)
    assert(got("num").getLong(1) == 3L && got("num").getLong(2) == 2L)
  }

  test("expectations: direction by suffix, planted failure") {
    val t = graft.sources.Tables(spark, sfDir)
    val ok = Profile.ordersExpectations(t, spark).collect()
    assert(ok.length == 7)
    assert(ok.forall(!_.isNullAt(4)))
    assert(ok.forall(_.getBoolean(4)), "orders satisfies its contract")
    // planted violation: demand ≤1 distinct status
    val bad = Profile.expectations(Profile.ordersProfile(t),
      Seq(("o_orderstatus", "distinct_max", 1.0)), spark).collect()
    assert(bad.length == 1 && !bad.head.getBoolean(4))
    assert(bad.head.getDouble(3) >= 2.0)
  }

  test("profile shuffle collapses to distinct values before the column rollup") {
    // plan shape: the unpivot feeds a two-level aggregate — partial
    // per-(col,value) collapse below the exchange, so the shuffle is
    // bounded by distinct values, not rows
    val t = graft.sources.Tables(spark, sfDir)
    val plan = planOf(Profile.ordersProfile(t))
    assert(plan.contains("HashAggregate"))
    assert(!plan.toLowerCase.contains("cartesianproduct"))
  }

  test("shardBalance conserves doc and token mass and is layout-invariant") {
    val d = docs((1 to 40).map(i =>
      (i.toLong, "s", (1 to (i % 7) + 1).map(j => s"w$j").mkString(" "))): _*)
      .select(col("doc_id"), col("text"))
    val rows = Governance.shardBalance(d, nShards = 4).collect()
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
    assert(rows.map(_.getLong(1)).sum == 40L)
    val totTok = (1 to 40).map(i => (i % 7) + 1).sum.toLong
    assert(rows.map(_.getLong(2)).sum == totTok)
    rows.foreach { r =>
      assert(r.getDouble(3) ==
        math.floor(r.getLong(2).toDouble / totTok * 1e6) / 1e6)
      assert(r.getDouble(4) ==
        math.floor(r.getLong(2).toDouble * 4.0 / totTok * 1e4) / 1e4)
    }
    // the assignment hashes the doc id, so partitioning cannot move docs
    val re = Governance.shardBalance(d.repartition(7), nShards = 4).collect()
    assert(re.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("kAnonymity: generalizing up the ladder can only shrink risk") {
    // five clones + one unique: the unique row is below k at the full
    // QI and at (segment, nation); collapsing to segment alone merges
    // it into a group of six — risk monotonically falls to zero
    val rows = Seq.fill(5)(("A", 1, 150.0)) :+ (("A", 2, 250.0))
    val cust = rows.zipWithIndex.map { case ((seg, nk, bal), i) =>
      (i.toLong, s"c$i", nk, bal, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val got = Governance.kAnonymity(cust, k = 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    // level 0 and 1: groups {5, 1} — one row at risk
    Seq(0L, 1L).foreach { lvl =>
      val r = got(lvl)
      assert(r.getLong(2) == 2L && r.getLong(3) == 6L)
      assert(r.getLong(4) == 1L && r.getLong(5) == 1L)
      assert(r.getDouble(6) == math.floor(1.0 / 6.0 * 1e6) / 1e6)
    }
    // level 2: one group of six — fully k-anonymous
    val r2 = got(2L)
    assert(r2.getLong(2) == 1L && r2.getLong(4) == 6L &&
      r2.getLong(5) == 0L && r2.getDouble(6) == 0.0)
    assert(got(0L).getString(1) == "segment,nation,bal_bucket" &&
      got(2L).getString(1) == "segment")
  }

  test("kAnonymity buckets negative balances toward -inf like the oracle") {
    val cust = Seq((1L, "c1", 1, -50.0, "A"), (2L, "c2", 1, 50.0, "A"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    // -50/100 floors to -1, 50/100 floors to 0: two DISTINCT buckets
    val lvl0 = Governance.kAnonymity(cust, k = 2).collect()
      .find(_.getLong(0) == 0L).get
    assert(lvl0.getLong(2) == 2L)
  }
}
