package graft

import org.scalacheck.Gen
import graft.functions._

/** Property-based invariants for the sketch/vector family, evaluated
  * through the real Catalyst expressions (no reimplementation). */
class PropertySpec extends SparkSuite {

  /** Minimal forAll driver over raw scalacheck Gens (no scalatestplus in
    * the offline cache). */
  private def forAll[A](g: Gen[A], n: Int)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      f(g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).get)
    }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int)(f: (A, B) => Unit): Unit =
    (1 to n).foreach { i =>
      f(ga.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).get,
        gb.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong + 1000)).get)
    }
  import spark.implicits._

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(2, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray))

  private val tokensGen: Gen[Seq[String]] =
    Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf((1 to 25).map(i => s"tok$i"))))

  test("sign search: hamming equals the sign-pattern disagreement count") {
    import graft.operators.Search
    forAll2(vecGen, vecGen, 12) { (a, b) =>
      val n = math.min(a.length, b.length)
      val (aa, bb) = (a.take(n), b.take(n))
      val corpus = Seq((0L, aa), (1L, bb)).toDF("vec_id", "embedding")
      val q = Seq((0L, aa)).toDF("query_id", "qv")
      val got = Search.signTopK(q, corpus, k = 2).collect()
        .map(r => r.getLong(2) -> r.getLong(3)).toMap
      // replay: one disagreement per dimension where exactly one side > 0
      val want = aa.zip(bb).count { case (x, y) => (x > 0f) != (y > 0f) }
      assert(got(0L) == 0L, "self hamming must be 0")
      assert(got(1L) == want.toLong, s"hamming: got ${got(1L)}, want $want")
    }
  }

  test("cosine similarity is symmetric and bounded") {
    forAll2(vecGen, vecGen, 15) { (a, b) =>
      val n = math.min(a.length, b.length)
      val (aa, bb) = (a.take(n), b.take(n))
      val df = Seq((aa, bb), (bb, aa)).toDF("x", "y")
      val Seq(ab, ba) =
        df.select(cosine_similarity($"x", $"y")).as[Double].collect().toSeq
      assert(ab == ba)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }
  }

  test("cosine similarity of a vector with itself is ~1 (or 0 for zero)") {
    forAll(vecGen, 15) { a =>
      val df = Seq((a, a)).toDF("x", "y")
      val s = df.select(cosine_similarity($"x", $"y")).as[Double].head()
      if (a.forall(_ == 0.0f)) assert(s == 0.0)
      else assert(math.abs(s - 1.0) < 1e-9)
    }
  }

  test("minhash agreement is 1 for equal sets and decreases with edits") {
    forAll(tokensGen, 10) { toks =>
      val df = Seq((toks, 1), (toks.reverse, 2)).toDF("t", "id")
      val sigs = df.select($"id", minhash_signature($"t", 64).as("s"))
        .as[(Int, Seq[Long])].collect().toMap
      assert(sigs(1) == sigs(2)) // set semantics: order-invariant
    }
  }

  test("hash_embed output is always unit-norm or zero, fixed dim") {
    forAll(tokensGen, 10) { toks =>
      val df = Seq(toks.mkString(" ")).toDF("t")
      val e = df.select(hash_embed($"t", 24)).as[Seq[Float]].head()
      assert(e.length == 24)
      val norm = math.sqrt(e.map(x => x.toDouble * x).sum)
      assert(norm == 0.0 || math.abs(norm - 1.0) < 1e-5)
    }
  }

  test("simhash of identical token multisets is identical") {
    forAll(tokensGen, 10) { toks =>
      val df = Seq((toks, 1), (scala.util.Random.shuffle(toks), 2))
        .toDF("t", "id")
      val hs = df.select($"id", simhash64($"t")).as[(Int, Long)]
        .collect().toMap
      assert(hs(1) == hs(2))
    }
  }

  test("decontaminate: a doc checked against a bench containing it is flagged") {
    // any training doc with >= n tokens that ALSO appears in the bench set
    // must come back contaminated; docs sharing no token never are
    forAll(Gen.chooseNum(8, 30), 8) { n =>
      val shared = (1 to n).map(i => s"common$i").mkString(" ")
      val training = Seq((1L, shared), (2L, (1 to n).map(i => s"other$i").mkString(" ")))
        .toDF("doc_id", "text")
      val bench = Seq((99L, shared)).toDF("doc_id", "text")
      val out = operators.Pipeline.decontaminate(training, bench, 8)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(out(1L))
      assert(!out(2L))
    }
  }

  test("sampleByHash keeps a subset: rate 1000 keeps all, rate 0 keeps none") {
    val t = sources.Tables(spark, sfDir)
    val all = operators.Pipeline.sampleByHash(t.events,
      Seq("click", "view", "purchase", "signup", "error").map(_ -> 1000))
    assert(all.count() == t.events.count())
    val none = operators.Pipeline.sampleByHash(t.events,
      Seq("click", "view", "purchase", "signup", "error").map(_ -> 0))
    assert(none.count() == 0)
    // monotone: a higher rate keeps a superset
    val lo = operators.Pipeline.sampleByHash(t.events, Seq("click" -> 100))
      .select($"event_id").as[Long].collect().toSet
    val hi = operators.Pipeline.sampleByHash(t.events, Seq("click" -> 500))
      .select($"event_id").as[Long].collect().toSet
    assert(lo.subsetOf(hi))
  }

  test("gopher stats invariants: fractions in [0,1], keep implies bounds") {
    forAll(tokensGen, 8) { toks =>
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val r = operators.Pipeline.gopherStats(df).head()
      val (fu, tf, d2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(fu >= 0 && fu <= 1 && tf >= 0 && tf <= 1 && d2 >= 0 && d2 <= 1)
      if (r.getBoolean(6)) {
        assert(r.getLong(1) >= 10 && fu >= 0.5 - 1e-4 && tf <= 0.2 && d2 <= 0.3)
      }
    }
  }

  test("kmv sketch: exact below k, invariant to duplication and partitioning") {
    val hashGen: Gen[List[Long]] =
      Gen.chooseNum(1, 200).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    forAll(hashGen, 10) { hs =>
      val distinct = hs.distinct
      def run(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.agg(kmv_distinct($"h", 64).as("sk"))
          .select($"sk.est_distinct", $"sk.kth_min").head()
        (r.getLong(0), r.getLong(1))
      }
      val base = run(hs.toDF("h"))
      if (distinct.length < 64) assert(base == ((distinct.length.toLong, 0L)))
      // duplicating every row and reshuffling partitions changes nothing
      assert(run((hs ++ hs).toDF("h").repartition(7)) == base)
    }
  }

  test("bloom filter never produces false negatives") {
    import org.apache.spark.util.sketch.BloomFilter
    val keysGen: Gen[Seq[Long]] = Gen.chooseNum(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    forAll(keysGen, 10) { keys =>
      val bf = BloomFilter.create(1000, 0.01)
      keys.foreach(bf.putLong)
      val hits = keys.distinct.toDF("k")
        .select(graft.functions.bloom_might_contain($"k", bf))
        .as[Boolean].collect()
      assert(hits.forall(identity), "an inserted key tested negative")
    }
  }

  test("count-min estimates never undercount (one-sided error)") {
    forAll(tokensGen, 6) { toks =>
      // one doc per token so the corpus pipeline sees arbitrary streams
      val docs = toks.zipWithIndex
        .map { case (tk, i) => (i.toLong, tk) }.toDF("doc_id", "text")
      val out = operators.Sketches.cmsTokenTopK(docs, depth = 2, width = 8,
        k = 25).collect()
      out.foreach { r =>
        assert(r.getLong(2) >= r.getLong(1),
          s"cms ${r.getLong(2)} < exact ${r.getLong(1)} for ${r.getString(0)}")
      }
    }
  }

  test("pq reconstruction lands every subvector exactly on a codeword") {
    val e = sources.Tables(spark, sfDir).embeddings
    val cbs = operators.ProductQuantizer.codebooks(e, m = 4, k = 16)
    val codewords: Array[Set[Seq[Float]]] =
      cbs.map(_.map(_.toSeq).toSet)
    val recs = operators.ProductQuantizer.reconstructed(e, m = 4, k = 16)
      .select($"embedding").collect().map(_.getSeq[Float](0))
    recs.foreach { v =>
      (0 until 4).foreach { j =>
        val sub = v.slice(j * 16, (j + 1) * 16)
        assert(codewords(j).contains(sub), s"subspace $j off-codebook")
      }
    }
  }

  test("top-k is a prefix: top(k) == top(k+3).take(k) under the same order") {
    val e = sources.Tables(spark, sfDir).embeddings
    val q = e.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val k5 = operators.Search.bruteForceTopK(q, e, 5)
      .select($"query_id", $"rank", $"vec_id").collect().toSeq
    val k8 = operators.Search.bruteForceTopK(q, e, 8)
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"vec_id").collect().toSeq
    assert(k5 == k8)
  }

  test("window-dup coverage: bounded in [0,1]; full-corpus duplication saturates") {
    val docsGen: Gen[Seq[(Long, String)]] =
      Gen.chooseNum(2, 8).flatMap(n =>
        Gen.sequence[Seq[(Long, String)], (Long, String)]((1 to n).map(id =>
          Gen.chooseNum(0, 20).flatMap(len =>
            Gen.listOfN(len, Gen.oneOf((1 to 9).map(i => s"w$i")))
              .map(ts => (id.toLong, ts.mkString(" ")))))))
    forAll(docsGen, 6) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val cov = operators.Dedup.windowDupCoverage(docs)
        .select($"doc_id", $"n_tok", $"dup_coverage").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(cov.forall { case (_, _, c) => c >= 0.0 && c <= 1.0 },
        s"coverage out of [0,1]: ${cov.toSeq}")
      // duplicate the whole corpus: every window now occurs ≥2× somewhere,
      // so every doc with at least one window reads coverage 1.0 (floored
      // at 1e4 the union of all windows covers n_tok positions exactly)
      val doubled = rows.toDF("doc_id", "text").unionByName(
        rows.map { case (id, tx) => (id + 1000L, tx) }.toDF("doc_id", "text"))
      val sat = operators.Dedup.windowDupCoverage(doubled)
        .select($"n_tok", $"n_dup_windows", $"dup_coverage").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(sat.forall { case (n, ndw, c) =>
        if (n >= 5) ndw > 0 && c == 1.0 else ndw == 0 && c == 0.0 },
        s"duplication must saturate coverage: ${sat.toSeq}")
    }
  }

  test("fingerprint near-dup recall: any pair within hamming<=3 is found") {
    // the pigeonhole guarantee behind mm_neardup: 3 flipped bits touch
    // at most 3 of the 4 16-bit bands, so one band survives intact and
    // the pair MUST surface as a candidate and pass the exact verify —
    // checked against random fingerprints with random <=3-bit flips
    val caseGen = for {
      fp <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      k <- Gen.chooseNum(0, 3)
      bits <- Gen.listOfN(k, Gen.chooseNum(0, 63))
    } yield (fp, bits.distinct)
    forAll(caseGen, 25) { case (fp, bits) =>
      val near = bits.foldLeft(fp)((acc, b) => acc ^ (1L << b))
      val fps = Seq((1L, fp), (2L, near)).toDF("doc_id", "fp")
      val got = operators.Dedup.fingerprintNearDup(fps).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(1L) == 1L && got(2L) == 1L,
        s"fp=$fp bits=$bits (hamming=${bits.size}) must pair: $got")
    }
    // and the complement: >3 flips spread across all four bands (one per
    // band plus one more) must NOT pair — either no intact band or the
    // exact hamming verify rejects
    val farGen = for {
      fp <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      extra <- Gen.chooseNum(0, 15)
    } yield (fp, extra)
    forAll(farGen, 10) { case (fp, extra) =>
      val far = fp ^ (1L << 3) ^ (1L << 19) ^ (1L << 35) ^
        (1L << 51) ^ (1L << (16 + (extra % 3)))
      val fps = Seq((1L, fp), (2L, far)).toDF("doc_id", "fp")
      val got = operators.Dedup.fingerprintNearDup(fps).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(1L) == 0L && got(2L) == 0L,
        s"fp=$fp extra=$extra must not pair: $got")
    }
  }

  test("entropy kernel: order-free, bounded by ln(n), zero iff uniform-1") {
    import org.apache.spark.unsafe.types.UTF8String
    def h(s: String, tok: Boolean) =
      graft.functions.TextEntropy.compute(UTF8String.fromString(s), tok)
    forAll(tokensGen, 25) { toks =>
      val s = toks.mkString(" ")
      // order-free: any permutation of tokens/characters scores the same
      val perm = scala.util.Random.shuffle(toks).mkString(" ")
      assert(h(s, tok = true) == h(perm, tok = true))
      assert(h(s, tok = false) == h(s.reverse, tok = false))
      // bounded: 0 ≤ H ≤ ln(n) (+ floor slack) in both modes
      val ht = h(s, tok = true)
      assert(ht >= 0.0 && ht <= math.log(toks.length.toDouble) + 1e-4)
      val hc = h(s, tok = false)
      assert(hc >= 0.0 && hc <= math.log(s.length.toDouble) + 1e-4)
      // all-identical tokens → exactly 0
      assert(h(Seq.fill(toks.length)(toks.head).mkString(" "), tok = true)
        == 0.0)
    }
  }

  private val scoredGen: Gen[Seq[(Long, Long, Long)]] =
    Gen.chooseNum(2, 60).flatMap(n =>
      Gen.listOfN(n, for {
        cls <- Gen.chooseNum(0L, 2L)
        // small grid domain forces heavy ties — the tie-credit path
        s <- Gen.chooseNum(-5L, 5L)
        pos <- Gen.oneOf(0L, 1L)
      } yield (cls, s, pos)))

  test("histogram AUC equals the tie-aware average-rank statistic on random data") {
    import graft.operators.MlEval
    forAll(scoredGen, 10) { rows =>
      val df = rows.toDF("class", "s_grid", "pos")
      val got = MlEval.aucFromScored(df).collect()
        .map(r => r.getLong(0) ->
          Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
      rows.groupBy(_._1).foreach { case (cls, rs) =>
        val sorted = rs.map(r => (r._2, r._3)).sortBy(_._1)
        val p = sorted.count(_._2 == 1L); val n = sorted.length - p
        val want =
          if (p == 0 || n == 0) None
          else {
            // average rank per tie group, 1-based
            val rank = sorted.map(_._1).zipWithIndex
              .groupBy(_._1).map { case (v, xs) =>
                v -> (xs.map(_._2 + 1).sum.toDouble / xs.length) }
            val u = sorted.filter(_._2 == 1L).map(r => rank(r._1)).sum -
              p * (p + 1) / 2.0
            Some(math.floor(u / (p.toDouble * n) * 1e6) / 1e6)
          }
        assert(got(cls) == want, s"class $cls: got ${got(cls)}, want $want")
      }
    }
  }

  test("AUC extremes: perfect separation 1.0, inverted 0.0, one tie group 0.5") {
    import graft.operators.MlEval
    def auc(rows: Seq[(Long, Long, Long)]): Option[Double] =
      Option(MlEval.aucFromScored(rows.toDF("class", "s_grid", "pos"))
        .collect().head.get(3)).map(_.asInstanceOf[Double])
    val pos = (1 to 10).map(i => (0L, 100L + i, 1L))
    val neg = (1 to 10).map(i => (0L, i.toLong, 0L))
    assert(auc(pos ++ neg).contains(1.0))
    assert(auc(pos.map(p => p.copy(_3 = 0L)) ++
      neg.map(_.copy(_3 = 1L))).contains(0.0))
    // every score identical: one tie group, AUC exactly 1/2
    assert(auc(Seq((0L, 7L, 1L), (0L, 7L, 1L), (0L, 7L, 0L), (0L, 7L, 0L)))
      .contains(0.5))
  }

  test("robust stats: cell algebra equals a direct sorted-trim replay") {
    import graft.operators.EventAnalytics
    val valsGen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50.0, 2000.0)))
    forAll(valsGen, 8) { vs =>
      val ev = vs.zipWithIndex.map { case (v, i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L),
          (i % 7).toLong, "x", v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val Array(r) = EventAnalytics.robustStats(ev).collect()
      val g = vs.map(v => math.min(math.max(math.floor(v * 1e4).toLong, 0L),
        10000000L)).sorted
      val n = g.length; val lo = n * 5 / 100
      def div(a: BigInt, b: Long): Long = (a / b).toLong
      val trim = g.slice(lo, n - lo)
      val want = (
        div(g.map(BigInt(_)).sum, n) / 1e4,
        div(trim.map(BigInt(_)).sum, n - 2 * lo) / 1e4,
        div(trim.map(BigInt(_)).sum + BigInt(lo) * (g(lo) + g(n - lo - 1)),
          n) / 1e4,
        g(lo) / 1e4, g(n - lo - 1) / 1e4)
      val got = (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))
      assert(got == want, s"n=$n got=$got want=$want")
    }
  }

  test("co-occurrence: lift and jaccard equal brute-force set counting") {
    import graft.operators.EventAnalytics
    val evGen = Gen.chooseNum(2, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(1L, 6L), Gen.oneOf("a", "b", "c", "d"))))
    forAll(evGen, 8) { rows =>
      val ev = rows.zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
          u, t, 0.0) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = EventAnalytics.cooccurrence(ev).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getDouble(6), r.getDouble(7)))).toMap
      val sets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val u = sets.size.toLong
      val singles = sets.values.toSeq.flatten.groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val pairs = sets.values.toSeq.flatMap(s =>
        s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got.keySet == pairs.keySet, s"${got.keySet} vs ${pairs.keySet}")
      pairs.foreach { case ((a, b), nb) =>
        val (na, nbb) = (singles(a), singles(b))
        val lift = (BigInt(nb) * u * 1000000 / (BigInt(na) * nbb)).toLong / 1e6
        val jac = (BigInt(nb) * 1000000 / (na + nbb - nb)).toLong / 1e6
        assert(got((a, b)) == ((nb, na, nbb, u, lift, jac)),
          s"($a,$b): ${got((a, b))}")
      }
    }
  }

  test("session gap sweep: counts equal per-user sorted-delta counting") {
    import graft.operators.EventAnalytics
    val evGen = Gen.chooseNum(2, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 7200L))))
    forAll(evGen, 8) { rows =>
      val ev = rows.zipWithIndex.map { case ((u, sec), i) =>
        (i.toLong, new java.sql.Timestamp((1700000000L + sec) * 1000L),
          u, "view", 0.0) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = EventAnalytics.sessionGapSweep(ev).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byUser = rows.zipWithIndex
        .map { case ((u, sec), i) => (u, 1700000000L + sec, i.toLong) }
        .groupBy(_._1).view
        .mapValues(_.sortBy(e => (e._2, e._3)).map(_._2)).toMap
      val deltas = byUser.values.toSeq.flatMap(secs =>
        secs.zip(secs.tail).map { case (a, b) => b - a })
      Seq(5, 15, 30, 60).foreach { t =>
        val want = byUser.size.toLong + deltas.count(_ > t * 60L)
        assert(got(t.toLong) == want, s"T=$t: ${got(t.toLong)} vs $want")
      }
    }
  }

  test("PQ filtered search: always-true predicate degenerates to the " +
    "unfiltered search; selective predicates return exactly " +
    "min(k, |eligible|) eligible rows per query") {
    import graft.operators.ProductQuantizer
    import org.apache.spark.sql.functions.col
    // dim-8 vectors (m=4 -> 2-dim subspaces), k=4 seed codebooks
    val corpusGen = Gen.chooseNum(6, 16).flatMap(n =>
      Gen.listOfN(n * 8, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray
        .grouped(8).toSeq))
    forAll(corpusGen, 6) { vecs =>
      val corpus = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, i % 3, v) }
        .toDF("vec_id", "label", "embedding")
      val queries = corpus.filter($"vec_id" < 2)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      // always-true predicate: the filtered path must be EXACTLY the
      // unfiltered search (same codebooks, same ranking) — a codebook
      // build that saw the filter would still pass eligible-only checks
      // but fail this degeneration law
      val unf = ProductQuantizer.search(queries, corpus, m = 4, k = 4,
        topK = 3).collect().toSeq
      val triv = ProductQuantizer.searchFiltered(queries, corpus,
        $"label" >= 0, m = 4, k = 4, topK = 3).collect().toSeq
      assert(triv == unf, "always-true filter changed the ranking")
      // selective predicate: exactly min(k, eligible) rows per query,
      // all eligible
      val eligible = vecs.indices.filter(_ % 3 == 0).map(_.toLong).toSet
      val got = ProductQuantizer.searchFiltered(queries, corpus,
        $"label" === 0, m = 4, k = 4, topK = 3).collect()
      val want = math.min(3, eligible.size)
      got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
        assert(rows.length == want, s"query $q: ${rows.length} != $want")
      }
      assert(got.forall(r => eligible(r.getLong(2))), "ineligible hit")
    }
  }

  test("session path cells: session-count conservation and the maxLen " +
    "render bound on random event logs") {
    import graft.operators.Sessionize
    import org.apache.spark.sql.functions.col
    val evGen = Gen.chooseNum(4, 40).flatMap(n =>
      Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 3L)
        sec <- Gen.chooseNum(0L, 6L * 3600L)
        ty <- Gen.oneOf("view", "click", "purchase", "search")
      } yield (u, sec, ty)))
    forAll(evGen, 8) { rows =>
      val ev = rows.zipWithIndex.map { case ((u, sec, ty), i) =>
        (i.toLong, new java.sql.Timestamp((1700000000L + sec) * 1000L),
          u, ty, 0.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val maxLen = 4
      val cells = Sessionize.sessionPathCells(
        ev, "30 MINUTES", maxLen, "purchase").collect()
      // driver-side sessionization replay (sort per user by (ts, id),
      // split on gap > 1800 s — the strictly-greater batch contract)
      val byUser = rows.zipWithIndex
        .map { case ((u, sec, ty), i) => (u, 1700000000L + sec, i.toLong, ty) }
        .groupBy(_._1).view
        .mapValues(_.sortBy(e => (e._2, e._3))).toMap
      def split(evs: Seq[(Long, Long, Long, String)])
          : Seq[Seq[(Long, Long, Long, String)]] =
        evs.foldLeft(Vector.empty[Vector[(Long, Long, Long, String)]]) {
          (acc, e) =>
            if (acc.isEmpty || e._2 - acc.last.last._2 > 1800L)
              acc :+ Vector(e)
            else acc.init :+ (acc.last :+ e)
        }
      val driverSessions = byUser.values.toSeq.flatMap(split)
      // conservation: one cell per session, exactly
      assert(cells.length == driverSessions.size,
        s"${cells.length} cells vs ${driverSessions.size} sessions")
      // render bound: at most maxLen steps plus the truncation marker
      cells.map(_.getString(0)).foreach { p =>
        val steps = p.split(" > ").toSeq
        assert(steps.length <= maxLen + 1, s"path too long: $p")
        if (steps.length == maxLen + 1)
          assert(steps.last == "...", s"unmarked over-length path: $p")
      }
      // conv mass: Σ conv == driver-replayed sessions containing a
      // purchase ANYWHERE (including past the maxLen truncation)
      val convTotal = cells.map(_.getLong(1)).sum
      val wantConv =
        driverSessions.count(_.exists(_._4 == "purchase")).toLong
      assert(convTotal == wantConv, s"$convTotal vs $wantConv converted")
    }
  }

  test("preprocess: merged 3-pass chain ≡ the 7-pass reference chain") {
    import org.apache.spark.sql.functions._
    // the ORIGINAL 7-pass formulation (reference:
    // services/index_service.py:preprocess_description), kept here as the
    // equivalence oracle for the merged TextFunctions.preprocess
    def reference(c: org.apache.spark.sql.Column) = {
      var x = lower(coalesce(c, lit("")))
      x = regexp_replace(x, "thc:?\\s*(\\d+\\.?\\d*)%?", "thc $1%")
      x = regexp_replace(x, "cbd:?\\s*(\\d+\\.?\\d*)%?", "cbd $1%")
      x = regexp_replace(x, "hybrid[ -]?dominant", "hybrid")
      x = regexp_replace(x, "indica[ -]?dominant", "indica")
      x = regexp_replace(x, "sativa[ -]?dominant", "sativa")
      x = regexp_replace(x, "[^\\w\\s%]", " ")
      trim(regexp_replace(x, "\\s+", " "))
    }
    // adversarial fragments: unit rewrites with/without colon/%/decimals,
    // dominant rewrites with space/dash/nothing, specials, unicode,
    // whitespace runs, and near-miss prefixes that must NOT rewrite
    val frag = Gen.oneOf(
      "THC: 21.5%", "thc21", "cbd:0.3", "CBD 7 %", "bathc 3%", "thc x",
      "Hybrid-Dominant", "indica dominant", "sativadominant", "dominant",
      "sativa--dominant", "hybrid-dominant-dominant", "thcbd 4",
      "a.b,c;d", "  tabs\tand\nnewlines  ", "é€ñ", "under_score", "%",
      "42", "..", "", "thc: 5% cbd: 6%", "(indica) [dominant]")
    val strGen = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, frag).map(_.mkString(" ")))
    forAll(Gen.listOfN(24, strGen), 6) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val rows = df.select($"id",
          graft.functions.TextFunctions.preprocess($"text").as("got"),
          reference($"text").as("want"))
        .collect()
      rows.foreach(r => assert(r.getString(1) == r.getString(2),
        s"preprocess diverged on ${texts(r.getLong(0).toInt)}: " +
          s"'${r.getString(1)}' vs '${r.getString(2)}'"))
    }
  }

  test("skipgram pair conservation: 2·Σ_d max(len−d, 0) directed pairs") {
    forAll(tokensGen, 8) { toks =>
      val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val window = 3
      val total = operators.TextAnalysis
        .skipgrams(docs, window = window, minCount = 1, k = 1000000)
        .agg(org.apache.spark.sql.functions.sum("c")).head()
      val len = toks.length
      val want = 2L * (1 to window).map(d => math.max(len - d, 0)).sum
      val got = if (total.isNullAt(0)) 0L else total.getLong(0)
      assert(got == want, s"len=$len got=$got want=$want")
    }
  }
}
