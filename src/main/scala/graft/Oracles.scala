package graft

/** DuckDB SQL builders for the oracles that replay graft's 64-bit hash
  * machinery (FNV-1a, the splitmix-style minhash mix, SimHash voting).
  *
  * DuckDB errors on BIGINT overflow where the JVM wraps, so all wrapping
  * arithmetic runs in HUGEINT (int128) mod 2^64; xor has no HUGEINT
  * overload, so values round-trip through signed BIGINT (bit patterns are
  * signedness-agnostic); products that would exceed int128 split the
  * constant into 32-bit halves. Every formula here is the SQL image of a
  * loop in `functions/VectorExpressions.scala` — keep them in lockstep.
  */
object Oracles {

  /** The reference text-normalization chain as DuckDB SQL (mirrors
    * [[graft.functions.TextFunctions.preprocess]]). */
  def normSql(in: String): String =
    s"""trim(regexp_replace(
       |  regexp_replace(
       |   regexp_replace(
       |    regexp_replace(
       |     regexp_replace(
       |      regexp_replace(
       |       regexp_replace(lower(coalesce($in,'')), 'thc:?\\s*(\\d+\\.?\\d*)%?', 'thc \\1%', 'g'),
       |      'cbd:?\\s*(\\d+\\.?\\d*)%?', 'cbd \\1%', 'g'),
       |     'hybrid[ -]?dominant', 'hybrid', 'g'),
       |    'indica[ -]?dominant', 'indica', 'g'),
       |   'sativa[ -]?dominant', 'sativa', 'g'),
       |  '[^\\w\\s%]', ' ', 'g'),
       | '\\s+', ' ', 'g'))""".stripMargin

  private val MOD = "18446744073709551616::HUGEINT"

  /** Unsigned-HUGEINT expr → signed-BIGINT reinterpretation. */
  def signed(u: String): String =
    s"CAST(CASE WHEN $u >= 9223372036854775808::HUGEINT " +
      s"THEN $u - $MOD ELSE $u END AS BIGINT)"

  /** Signed-BIGINT expr → unsigned HUGEINT in [0, 2^64). */
  def unsigned(s: String): String =
    s"(CASE WHEN ($s) < 0 THEN CAST($s AS HUGEINT) + $MOD " +
      s"ELSE CAST($s AS HUGEINT) END)"

  /** xor of an unsigned HUGEINT with a small (< 2^63) HUGEINT, unsigned out. */
  private def xor64(a: String, b: String): String =
    unsigned(s"xor(${signed(a)}, CAST($b AS BIGINT))")

  /** FNV-1a 64 over a SQL list of byte values (prime is 2^40-ish, so the
    * running product stays inside int128 without splitting). */
  def fnv(byteList: String): String =
    s"list_reduce(list_prepend(14695981039346656037::HUGEINT, $byteList), " +
      "(acc, x) -> ((acc - acc % 256 + CAST(xor(CAST(acc % 256 AS BIGINT), " +
      "CAST(x AS BIGINT)) AS HUGEINT)) * 1099511628211::HUGEINT) " +
      s"% $MOD)"

  /** FNV of a string's chars (ASCII: code units == UTF-8 bytes). */
  def fnvChars(strExpr: String): String =
    fnv(s"list_transform(string_split($strExpr,''), c -> unicode(c)::HUGEINT)")

  /** Rolling polynomial 64-bit fingerprint of a string expr (the
    * `poly_fingerprint` replay: acc·31 + codepoint mod 2^64, signed out;
    * empty string → 0 — the `text_fingerprint` oracle chain, factored
    * for the governance family so the replays cannot diverge). */
  def polyFp(strExpr: String): String =
    signed(s"(CASE WHEN length($strExpr)=0 THEN 0::HUGEINT " +
      s"ELSE list_reduce(list_prepend(0::HUGEINT, " +
      s"list_transform(string_split($strExpr,''), c -> unicode(c)::HUGEINT)), " +
      s"(acc, x) -> (acc*31 + x) % $MOD) END)")

  /** (a * c) mod 2^64 where a < 2^64 and c is a full 64-bit constant:
    * a*c can exceed int128, so split c = hi·2^32 + lo. */
  private def mulMod(a: String, hi: Long, lo: Long): String =
    s"(($a * $lo::HUGEINT) % $MOD + " +
      s"((($a * $hi::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)) % $MOD"

  private val pow256 = "[" +
    (0 until 8).map(j => s"${BigInt(1) << (8 * j)}::HUGEINT").mkString(",") + "]"
  private val pow2 = "[" +
    (0 until 64).map(j => s"${BigInt(1) << j}::HUGEINT").mkString(",") + "]"

  /** CTE chain `n → … → bh` replaying MinHashSignature + BandHashes: one
    * signed band hash per (doc, band). Stage names mirror the mix:
    * x0 = h + C1·(i+1); x1 = (x0 ⊕ x0»30)·C2; x2 = (x1 ⊕ x1»27)·C3;
    * g = x2 ⊕ x2»31, all mod 2^64, compared SIGNED for the min. Shared by
    * the self-join pair generator ([[dedupMinhashSql]]/[[dedupClustersSql]])
    * and the incremental new-vs-base generator ([[dedupIncrementalSql]]). */
  private def minhashBandsCte: String =
    s"""$minhashSigCte,
       | ${bandingCte(8, "")}""".stripMargin

  /** Re-band the signature table at `r` rows per band (`suffix` keeps
    * multiple configs in one statement distinct) — the CTE twin of the
    * engine's `band_hashes(sig, bands, r)`: group `r` consecutive
    * signature longs, serialize little-endian, FNV the bytes. */
  private def bandingCte(r: Int, suffix: String): String =
    s"""bandbytes$suffix AS (SELECT doc_id, i // $r AS band,
       |    flatten(list_transform(list(su ORDER BY i), l -> list_transform(range(0,8), j -> (l // $pow256[j+1]) % 256))) AS bytes
       |   FROM su GROUP BY doc_id, i // $r),
       | bh$suffix AS (SELECT doc_id, band, ${signed(fnv("bytes"))} AS h FROM bandbytes$suffix)""".stripMargin

  /** The signature chain `n → … → su` (per-(doc, i) signature values,
    * signed in `sigall`, unsigned in `su`) with NO banding — shared by
    * [[minhashBandsCte]] (default 16×8 banding) and the multi-config
    * [[dedupLshSweepSql]]. */
  private def minhashSigCte: String =
    s"""n AS (SELECT doc_id, ${normSql("text")} AS s FROM documents),
       | tok AS (SELECT doc_id, CASE WHEN len(trim(s))=0 THEN []::VARCHAR[] ELSE string_split(s,' ') END AS toks FROM n),
       | shq AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
       |    ELSE list_transform(range(1, len(toks)-1), i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]) END) AS sh FROM tok),
       | shd AS (SELECT DISTINCT doc_id, sh FROM shq),
       | hh AS (SELECT doc_id, ${fnvChars("sh")} AS h FROM shd),
       | m0 AS (SELECT doc_id, i, ((h + 11400714819323198485::HUGEINT * (i+1)::HUGEINT) % $MOD) AS x0
       |   FROM hh, range(128) r(i)),
       | m0x AS (SELECT doc_id, i, (${xor64("x0", "x0 // 1073741824::HUGEINT")}) AS a FROM m0),
       | m1 AS (SELECT doc_id, i, ${mulMod("a", 3210233709L, 484763065L)} AS x1 FROM m0x),
       | m1x AS (SELECT doc_id, i, (${xor64("x1", "x1 // 134217728::HUGEINT")}) AS a FROM m1),
       | m2 AS (SELECT doc_id, i, ${mulMod("a", 2496678331L, 321982955L)} AS x2 FROM m1x),
       | mg AS (SELECT doc_id, i, ${signed(xor64("x2", "x2 // 2147483648::HUGEINT"))} AS g FROM m2),
       | sig AS (SELECT doc_id, i, MIN(g) AS sg FROM mg GROUP BY 1,2),
       | sigall AS (SELECT n.doc_id, r.i, coalesce(sg, 9223372036854775807) AS sg
       |   FROM n CROSS JOIN range(128) r(i) LEFT JOIN sig ON sig.doc_id = n.doc_id AND sig.i = r.i),
       | su AS (SELECT doc_id, i, ${unsigned("sg")} AS su FROM sigall)""".stripMargin

  /** [[minhashBandsCte]] + the capBuckets skew guard + SYMMETRIC candidate
    * pairs (both directions), which both the per-doc summary and the
    * clusters recursion consume directly. */
  private def minhashPairsCte(maxBucket: Int): String =
    s"""$minhashBandsCte,
       | capped AS (SELECT * FROM bh QUALIFY COUNT(*) OVER (PARTITION BY band, h) <= $maxBucket),
       | pairs AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |   FROM capped a JOIN capped b ON a.band = b.band AND a.h = b.h AND a.doc_id <> b.doc_id)""".stripMargin

  /** dedup_edit: exact Levenshtein over the normalized text of the capped
    * LSH candidate pairs (both engines' levenshtein is the unit-cost
    * char-level edit distance; both `len`s count characters). */
  def dedupEditSql(maxBucket: Int = 1000, maxDistFrac: Double = 0.2): String =
    s"""WITH ${minhashPairsCte(maxBucket)},
       | d AS (SELECT p.id1, p.id2, levenshtein(a.s, b.s) AS dist,
       |     greatest(len(a.s), len(b.s)) AS ml
       |   FROM pairs p JOIN n a ON a.doc_id = p.id1 JOIN n b ON b.doc_id = p.id2
       |   WHERE p.id1 < p.id2)
       |SELECT id1, id2, CAST(dist AS BIGINT) AS edit_dist,
       | CAST(ml AS BIGINT) AS max_len,
       | CASE WHEN ml = 0 THEN 1.0 ELSE floor((1 - CAST(dist AS DOUBLE)/ml)*1e6)/1e6 END AS edit_sim,
       | CASE WHEN ml = 0 THEN TRUE ELSE CAST(dist AS DOUBLE)/ml <= $maxDistFrac END AS is_dup
       |FROM d ORDER BY id1, id2""".stripMargin

  /** dedup_minhash_est: jaccard estimates for the capped LSH candidate
    * pairs — matching signature positions / numHashes (m/128 is exact in
    * binary: the denominator is a power of two). */
  def dedupMinhashEstSql(numHashes: Int = 128, maxBucket: Int = 1000): String =
    s"""WITH ${minhashPairsCte(maxBucket)},
       | m AS (SELECT p.id1, p.id2, SUM(CASE WHEN a.sg = b.sg THEN 1 ELSE 0 END) AS nm
       |   FROM pairs p
       |   JOIN sigall a ON a.doc_id = p.id1
       |   JOIN sigall b ON b.doc_id = p.id2 AND b.i = a.i
       |   WHERE p.id1 < p.id2 GROUP BY 1, 2)
       |SELECT id1, id2, CAST(nm AS BIGINT) AS n_match,
       | floor(nm/CAST($numHashes AS DOUBLE)*1e4)/1e4 AS est_jaccard
       |FROM m ORDER BY id1, id2""".stripMargin

  /** dedup_incremental: NEW docs (doc_id ≥ `split`) probed against the
    * BASE corpus (doc_id < `split`) — the bucket cap applies to the BASE
    * side only, exactly like the Spark operator (the new side joins
    * uncapped; QUALIFY runs after the WHERE, so the partition counts are
    * base-only counts). */
  def dedupIncrementalSql(split: Long = 250, maxBucket: Int = 1000): String =
    s"""WITH $minhashBandsCte,
       | cappedb AS (SELECT * FROM bh WHERE doc_id < $split
       |   QUALIFY COUNT(*) OVER (PARTITION BY band, h) <= $maxBucket),
       | pairs AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS base_id
       |   FROM bh a JOIN cappedb b ON a.band = b.band AND a.h = b.h
       |   WHERE a.doc_id >= $split),
       | summ AS (SELECT new_id, COUNT(*) AS n_base_candidates,
       |     MIN(base_id) AS min_base_partner
       |   FROM pairs GROUP BY 1)
       |SELECT n.doc_id, coalesce(n_base_candidates, 0) AS n_base_candidates,
       | min_base_partner, coalesce(n_base_candidates, 0) > 0 AS is_dup_of_base
       |FROM n LEFT JOIN summ ON n.doc_id = summ.new_id
       |WHERE n.doc_id >= $split ORDER BY n.doc_id""".stripMargin

  /** dedup_verified: survivors of the signature-level estimate
    * (n_match ≥ `minMatch` — the integer gate, so no float-edge risk)
    * re-verified with EXACT word-shingle jaccard over the distinct
    * 3-gram sets; two empty sets are exact duplicates (union = 0 ⇒
    * jaccard 1). */
  def dedupVerifiedSql(numHashes: Int = 128, maxBucket: Int = 1000,
                       minMatch: Int = 32, confirm: Double = 0.5): String =
    s"""WITH ${minhashPairsCte(maxBucket)},
       | m AS (SELECT p.id1, p.id2, SUM(CASE WHEN a.sg = b.sg THEN 1 ELSE 0 END) AS nm
       |   FROM pairs p
       |   JOIN sigall a ON a.doc_id = p.id1
       |   JOIN sigall b ON b.doc_id = p.id2 AND b.i = a.i
       |   WHERE p.id1 < p.id2 GROUP BY 1, 2),
       | surv AS (SELECT id1, id2, nm FROM m WHERE nm >= $minMatch),
       | sets AS (SELECT doc_id, list_distinct(
       |     CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
       |          ELSE list_transform(range(1, len(toks)-1), i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]) END) AS shs
       |   FROM tok),
       | j AS (SELECT v.id1, v.id2, v.nm,
       |     len(list_intersect(a.shs, b.shs)) AS i,
       |     len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs)) AS u
       |   FROM surv v JOIN sets a ON a.doc_id = v.id1 JOIN sets b ON b.doc_id = v.id2),
       | jj AS (SELECT id1, id2, nm, CASE WHEN u = 0 THEN 1.0 ELSE CAST(i AS DOUBLE)/u END AS jac FROM j)
       |SELECT id1, id2, CAST(nm AS BIGINT) AS n_match,
       | floor(nm/CAST($numHashes AS DOUBLE)*1e4)/1e4 AS est_jaccard,
       | floor(jac*1e6)/1e6 AS exact_jaccard,
       | jac >= $confirm AS confirmed
       |FROM jj ORDER BY id1, id2""".stripMargin

  private val summaryTail: String =
    """ summ AS (SELECT id1 AS doc_id, COUNT(*) AS n_candidates, MIN(id2) AS min_partner FROM pairs GROUP BY 1)
      |SELECT n.doc_id, coalesce(n_candidates, 0) AS n_candidates, min_partner
      |FROM n LEFT JOIN summ ON n.doc_id = summ.doc_id ORDER BY n.doc_id""".stripMargin

  /** q_sign_search: the sign fingerprint as exact HUGEINT bit math —
    * Σ 2^i over positive dims (i < 64), wrapped to signed 64-bit (a
    * double sum would lose bits past the 53-bit mantissa). */
  def signBitsSql(ev: String): String =
    signed(s"list_sum(list_transform(range(0, 64), i -> " +
      s"CASE WHEN $ev[i+1] > 0 THEN $pow2[i+1] ELSE 0::HUGEINT END))")

  /** dedup_minhash: per-doc candidate summary. */
  def dedupMinhashSql(maxBucket: Int = 1000): String =
    s"WITH ${minhashPairsCte(maxBucket)},\n$summaryTail"

  /** dedup_recall: ground-truth recall/precision of the capped LSH
    * funnel on the `doc_id % sampleMod` sample — truth = exact distinct
    * word-shingle jaccard ≥ threshold over within-sample pairs (from the
    * shared `shd` distinct-shingle table), candidates = the production
    * `pairs` CTE restricted to the sample universe (docs with ≥ 1
    * shingle). Ratios are integer÷integer, floored to 1e-6. */
  def dedupRecallSql(maxBucket: Int = 1000, sampleMod: Int = 4,
                     threshold: Double = 0.5): String =
    s"""WITH ${minhashPairsCte(maxBucket)},
       | ssets AS (SELECT doc_id, sh FROM shd WHERE doc_id % $sampleMod = 0),
       | ssz AS (SELECT doc_id, COUNT(*) AS sz FROM ssets GROUP BY 1),
       | sint AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS i
       |   FROM ssets a JOIN ssets b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |   GROUP BY 1, 2),
       | tr AS (SELECT id1, id2 FROM sint
       |   JOIN ssz a ON a.doc_id = sint.id1 JOIN ssz b ON b.doc_id = sint.id2
       |   WHERE CAST(i AS DOUBLE) / CAST(a.sz + b.sz - i AS DOUBLE) >= $threshold),
       | cs AS (SELECT id1, id2 FROM pairs
       |   WHERE id1 < id2 AND id1 % $sampleMod = 0 AND id2 % $sampleMod = 0
       |     AND id1 IN (SELECT doc_id FROM ssz) AND id2 IN (SELECT doc_id FROM ssz)),
       | ct AS (SELECT COUNT(*) AS n_caught FROM tr JOIN cs USING (id1, id2))
       |SELECT (SELECT COUNT(*) FROM ssz) AS n_sample,
       | (SELECT COUNT(*) FROM tr) AS n_truth,
       | (SELECT COUNT(*) FROM cs) AS n_cand, n_caught,
       | CASE WHEN (SELECT COUNT(*) FROM tr) = 0 THEN 1.0
       |   ELSE floor(CAST(n_caught AS DOUBLE) / (SELECT COUNT(*) FROM tr) * 1e6) / 1e6 END AS recall,
       | CASE WHEN (SELECT COUNT(*) FROM cs) = 0 THEN 1.0
       |   ELSE floor(CAST(n_caught AS DOUBLE) / (SELECT COUNT(*) FROM cs) * 1e6) / 1e6 END AS "precision"
       |FROM ct""".stripMargin

  /** dedup_cap_audit: the maxBucket recall accounting — per band, the
    * bucket census over the UNcapped signature table (capBuckets' input)
    * with capped-bucket row and within-bucket pair totals. */
  def dedupCapAuditSql(maxBucket: Int): String =
    s"""WITH $minhashBandsCte,
       | bs AS (SELECT band, h, COUNT(*) AS bsz FROM bh GROUP BY 1, 2)
       |SELECT CAST(band AS BIGINT) AS band, COUNT(*) AS n_buckets,
       | COUNT(*) FILTER (WHERE bsz > $maxBucket) AS n_capped,
       | CAST(coalesce(SUM(bsz) FILTER (WHERE bsz > $maxBucket), 0) AS BIGINT) AS rows_dropped,
       | CAST(coalesce(SUM(bsz * (bsz - 1) // 2) FILTER (WHERE bsz > $maxBucket), 0) AS BIGINT) AS est_pairs_lost
       |FROM bs GROUP BY band ORDER BY band""".stripMargin

  /** dedup_lsh_sweep: `Dedup.lshSweep` replayed — ONE signature chain,
    * re-banded per config (b bands × r rows); per config the capped
    * `id1 < id2` pair count, the integer `minMatch` gate count, and the
    * floored precision / mean-estimated-jaccard ratios (both derived
    * from integer sums, so addition order never matters). */
  def dedupLshSweepSql(numHashes: Int = 128,
                       configs: Seq[Int] = Seq(32, 16, 8),
                       maxBucket: Int = 1000, minMatch: Int = 64): String = {
    val per = configs.map { nb =>
      val r = numHashes / nb
      s"""${bandingCte(r, s"_$nb")},
         | capped_$nb AS (SELECT * FROM bh_$nb QUALIFY COUNT(*) OVER (PARTITION BY band, h) <= $maxBucket),
         | pairs_$nb AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |   FROM capped_$nb a JOIN capped_$nb b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
         | m_$nb AS (SELECT p.id1, p.id2, SUM(CASE WHEN a.sg = b.sg THEN 1 ELSE 0 END) AS nm
         |   FROM pairs_$nb p JOIN sigall a ON a.doc_id = p.id1
         |   JOIN sigall b ON b.doc_id = p.id2 AND b.i = a.i GROUP BY 1, 2),
         | agg_$nb AS (SELECT $nb AS bands, $r AS rows_per_band,
         |   COUNT(*) AS n_candidates,
         |   coalesce(SUM(CASE WHEN nm >= $minMatch THEN 1 ELSE 0 END), 0) AS n_est_dups,
         |   coalesce(SUM(nm), 0) AS sum_match FROM m_$nb)""".stripMargin
    }.mkString(",\n")
    val union = configs.map(nb => s"SELECT * FROM agg_$nb")
      .mkString(" UNION ALL ")
    s"""WITH $minhashSigCte,
       |$per,
       | allcfg AS ($union)
       |SELECT CAST(bands AS BIGINT) AS bands,
       | CAST(rows_per_band AS BIGINT) AS rows_per_band,
       | CAST(n_candidates AS BIGINT) AS n_candidates,
       | CAST(n_est_dups AS BIGINT) AS n_est_dups,
       | CASE WHEN n_candidates = 0 THEN 0.0
       |   ELSE floor(CAST(n_est_dups AS DOUBLE) / CAST(n_candidates AS DOUBLE) * 1e4) / 1e4 END AS precision_est,
       | CASE WHEN n_candidates = 0 THEN 0.0
       |   ELSE floor(CAST(sum_match AS DOUBLE) / (CAST(n_candidates AS DOUBLE) * $numHashes) * 1e4) / 1e4 END AS mean_est_jaccard
       |FROM allcfg ORDER BY bands DESC""".stripMargin
  }

  /** decontaminate_fuzzy: `Pipeline.decontaminateFuzzy` replayed — the
    * shared signature chain over ALL documents (the engine computes the
    * two sides separately, but the per-position hash family is fixed, so
    * union-then-split is identical), banded at `numHashes / bands` rows
    * per band, (train ≥ `benchBelow`, bench < `benchBelow`) candidates
    * restricted to docs WITH shingles (`sig` has rows only for them;
    * empty docs share the sentinel signature and must not band-collide),
    * matching-position counts from `sigall`, and the per-train-doc
    * (nm DESC, bench_id ASC) argmax. `est_jaccard` divides by a power of
    * two — IEEE-exact both engines, no grid. */
  def decontaminateFuzzySql(numHashes: Int = 128, bands: Int = 16,
                            minMatch: Int = 64,
                            benchBelow: Long = 100L): String =
    s"""WITH $minhashSigCte,
       | ${bandingCte(numHashes / bands, "")},
       | ne AS (SELECT DISTINCT doc_id FROM sig),
       | cand AS (SELECT DISTINCT a.doc_id AS tid, b.doc_id AS bid
       |   FROM bh a JOIN bh b ON a.band = b.band AND a.h = b.h
       |   WHERE a.doc_id >= $benchBelow AND b.doc_id < $benchBelow
       |     AND a.doc_id IN (SELECT doc_id FROM ne)
       |     AND b.doc_id IN (SELECT doc_id FROM ne)),
       | m AS (SELECT tid, bid, SUM(CASE WHEN sa.sg = sb.sg THEN 1 ELSE 0 END) AS nm
       |   FROM cand JOIN sigall sa ON sa.doc_id = cand.tid
       |             JOIN sigall sb ON sb.doc_id = cand.bid AND sb.i = sa.i
       |   GROUP BY 1, 2),
       | best AS (SELECT tid, nm, bid,
       |     COUNT(*) OVER (PARTITION BY tid) AS nb,
       |     ROW_NUMBER() OVER (PARTITION BY tid ORDER BY nm DESC, bid) AS rn
       |   FROM m)
       |SELECT d.doc_id,
       | CAST(coalesce(nb, 0) AS BIGINT) AS n_bench_matches,
       | CAST(coalesce(bid, -1) AS BIGINT) AS best_match,
       | coalesce(CAST(nm AS DOUBLE) / $numHashes, 0.0) AS est_jaccard,
       | coalesce(nm >= $minMatch, false) AS contaminated
       |FROM (SELECT doc_id FROM documents WHERE doc_id >= $benchBelow) d
       | LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.tid
       |ORDER BY d.doc_id""".stripMargin

  /** dedup_source_matrix: the capped LSH candidate pairs rolled up to
    * unordered (source_a ≤ source_b) cells with each cell's share of all
    * candidate pairs — `Dedup.sourceMatrix` replayed. */
  def dedupSourceMatrixSql(maxBucket: Int = 1000): String =
    s"""WITH ${minhashPairsCte(maxBucket)},
       | up AS (SELECT id1, id2 FROM pairs WHERE id1 < id2),
       | lab AS (SELECT least(a.source, b.source) AS source_a,
       |     greatest(a.source, b.source) AS source_b
       |   FROM up u JOIN documents a ON a.doc_id = u.id1
       |   JOIN documents b ON b.doc_id = u.id2),
       | cell AS (SELECT source_a, source_b, COUNT(*) AS n_pairs
       |   FROM lab GROUP BY 1, 2),
       | tot AS (SELECT SUM(n_pairs) AS t FROM cell)
       |SELECT source_a, source_b, CAST(n_pairs AS BIGINT) AS n_pairs,
       | floor(CAST(n_pairs AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE)
       |   * 1e6) / 1e6 AS pair_share
       |FROM cell ORDER BY source_a, source_b""".stripMargin

  /** q_dsir: `Selection.dsirScores` replayed — FNV-1a tokens into a
    * power-of-two bucket grid (unsigned-mod here == Spark's signed pmod
    * exactly because `buckets` divides 2^64), target/raw unigram counts
    * with add-one smoothing, the per-doc log-likelihood-ratio fold in
    * bucket order, the 1e-4 floor, and the integer order-statistic keep
    * cut (largest floored score with cum·4 ≥ n). */
  def dsirSql(targetLang: String = "en", buckets: Int = 4096): String =
    s"""WITH n0 AS (SELECT doc_id, lang, ${normSql("text")} AS s FROM documents),
       | tokq AS (SELECT doc_id, lang, unnest(CASE WHEN len(trim(s))=0 THEN []::VARCHAR[] ELSE string_split(s,' ') END) AS tk FROM n0),
       | bk AS (SELECT doc_id, lang, CAST(${fnvChars("tk")} % $buckets AS BIGINT) AS b FROM tokq),
       | docb AS (SELECT doc_id, lang, b, COUNT(*) AS m FROM bk GROUP BY 1, 2, 3),
       | grid AS (SELECT b, SUM(CASE WHEN lang = '$targetLang' THEN m ELSE 0 END) AS ct,
       |     SUM(m) AS cr FROM docb GROUP BY 1),
       | tot AS (SELECT SUM(CASE WHEN lang = '$targetLang' THEN m ELSE 0 END) AS nt,
       |     SUM(m) AS nr FROM docb),
       | per AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_tokens,
       |   list_reduce(list_prepend(0.0, list(
       |     CAST(m AS DOUBLE) * (
       |       ln(CAST(ct + 1 AS DOUBLE) / CAST((SELECT nt FROM tot) + $buckets AS DOUBLE)) -
       |       ln(CAST(cr + 1 AS DOUBLE) / CAST((SELECT nr FROM tot) + $buckets AS DOUBLE)))
       |     ORDER BY b)), (a, x) -> a + x) AS sc
       |  FROM docb JOIN grid USING (b) GROUP BY doc_id),
       | scored AS (SELECT doc_id, n_tokens,
       |     floor(sc / n_tokens * 1e4) / 1e4 AS score FROM per),
       | vals AS (SELECT score, COUNT(*) AS c FROM scored GROUP BY 1),
       | cm AS (SELECT score, SUM(c) OVER (ORDER BY score DESC) AS cum FROM vals),
       | cut AS (SELECT coalesce(MAX(CASE WHEN cum * 4 >= (SELECT COUNT(*) FROM scored)
       |     THEN score END), 0.0) AS cv FROM cm)
       |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
       | coalesce(score, 0.0) AS dsir_score,
       | coalesce(score, 0.0) >= (SELECT cv FROM cut) AS keep
       |FROM documents d LEFT JOIN scored USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** dedup_clusters: connected components via a recursive reachability
    * closure; min reachable label == the converged min-label propagation
    * (the Spark side caps at 10 rounds, which converges at oracle scale —
    * component diameters are tiny). */
  def dedupClustersSql(maxBucket: Int = 1000): String =
    s"""WITH ${minhashPairsCte(maxBucket)},
       | lab AS (
       |   WITH RECURSIVE reach(doc_id, lbl) AS (
       |     SELECT doc_id, doc_id AS lbl FROM n
       |     UNION
       |     SELECT e.id1 AS doc_id, r.lbl FROM pairs e JOIN reach r ON e.id2 = r.doc_id
       |   )
       |   SELECT doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY 1)
       |SELECT doc_id, cluster_id,
       | COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM lab ORDER BY doc_id""".stripMargin

  /** q_graph_rank: the 5-round integer PageRank replayed as a generated
    * iteration chain (the bpe_train_multi pattern) over the SAME
    * symmetric capped candidate pairs. `//` on non-negative BIGINTs
    * equals Spark's DIV; SUM runs in HUGEINT and the damped update's
    * `85·s` with it, so no intermediate can overflow in the oracle —
    * values stay in long range by the Spark side's mass argument. */
  def graphRankSql(iters: Int = 5, maxBucket: Int = 1000): String = {
    val scale = 1000000L
    val teleport = scale * 15L / 100L
    val rounds = (1 to iters).map { k =>
      s""" r$k AS (SELECT d.doc_id, d.deg,
         |   $teleport + CAST((85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS r
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst AS doc_id, SUM(r.r // r.deg) AS c
         |    FROM e JOIN r${k - 1} r ON e.src = r.doc_id GROUP BY 1) s
         |  USING (doc_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${minhashPairsCte(maxBucket)},
       | e AS (SELECT id1 AS src, id2 AS dst FROM pairs),
       | deg AS (SELECT src AS doc_id, COUNT(*) AS deg FROM e GROUP BY 1),
       | r0 AS (SELECT doc_id, deg, CAST($scale AS BIGINT) AS r FROM deg),
       |$rounds
       |SELECT doc_id, CAST(deg AS BIGINT) AS degree, r AS pagerank
       |FROM r$iters ORDER BY doc_id""".stripMargin
  }

  /** dedup_canonical: the funnel's apply step — keep verdicts projected
    * from the clusters oracle (canonical member = smallest doc_id). */
  def dedupCanonicalSql(maxBucket: Int = 1000): String =
    s"""SELECT doc_id, cluster_id, cluster_size,
       | cluster_id = doc_id AS keep
       |FROM (${dedupClustersSql(maxBucket)}) ORDER BY doc_id""".stripMargin

  /** mm_neardup: the perceptual-fingerprint near-dup pass replayed. The
    * stub decoder's features are the FNV64 checksum's bytes and the
    * quantize-back (byte → float/255 → ×255 → round) is the identity on
    * 0..255, so the fingerprint IS the checksum — the oracle recomputes
    * FNV64 over the payload (= text) bytes and replays the 4×16-bit
    * banding, bucket cap, and exact-hamming verify of
    * `Multimodal.payloadNearDup`. */
  def mmNearDupSql(maxBucket: Int = 1000, maxHamming: Int = 3): String =
    s"""WITH n AS (SELECT doc_id FROM documents),
       | u0 AS (SELECT doc_id,
       |   CASE WHEN length(text)=0 THEN 14695981039346656037::HUGEINT
       |        ELSE ${fnvChars("text")} END AS u FROM documents),
       | banded AS (SELECT doc_id, u, b, CAST((u // $pow2[16*b+1]) % 65536 AS BIGINT) AS chunk
       |   FROM u0, range(4) r(b)),
       | capped AS (SELECT * FROM banded QUALIFY COUNT(*) OVER (PARTITION BY b, chunk) <= $maxBucket),
       | pairs AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |   FROM capped a JOIN capped b ON a.b = b.b AND a.chunk = b.chunk AND a.doc_id <> b.doc_id
       |   WHERE bit_count(xor(${signed("a.u")}, ${signed("b.u")})) <= $maxHamming),
       |$summaryTail"""
      .stripMargin

  /** dedup_simhash: SimHash64 bit votes over tokens (with multiplicity),
    * 4×16-bit banded buckets with the same cap, exact hamming ≤ 3. */
  def dedupSimhashSql(maxBucket: Int = 1000, maxHamming: Int = 3): String =
    s"""WITH n AS (SELECT doc_id, ${normSql("text")} AS s FROM documents),
       | tok AS (SELECT doc_id, unnest(CASE WHEN len(trim(s))=0 THEN []::VARCHAR[] ELSE string_split(s,' ') END) AS tk FROM n),
       | tm AS (SELECT doc_id, tk, COUNT(*) AS m FROM tok WHERE tk <> '' GROUP BY 1,2),
       | hh AS (SELECT doc_id, m, ${fnvChars("tk")} AS h FROM tm),
       | votes AS (SELECT doc_id, j, SUM(m * (CASE WHEN (h // $pow2[j+1]) % 2 = 1 THEN 1 ELSE -1 END)) AS v
       |   FROM hh, range(64) r(j) GROUP BY 1,2),
       | shu AS (SELECT doc_id, SUM(CASE WHEN v > 0 THEN $pow2[j+1] ELSE 0::HUGEINT END) AS u FROM votes GROUP BY 1),
       | shall AS (SELECT n.doc_id, coalesce(u, 0::HUGEINT) AS u FROM n LEFT JOIN shu ON n.doc_id = shu.doc_id),
       | banded AS (SELECT doc_id, u, b, CAST((u // $pow2[16*b+1]) % 65536 AS BIGINT) AS chunk
       |   FROM shall, range(4) r(b)),
       | capped AS (SELECT * FROM banded QUALIFY COUNT(*) OVER (PARTITION BY b, chunk) <= $maxBucket),
       | pairs AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |   FROM capped a JOIN capped b ON a.b = b.b AND a.chunk = b.chunk AND a.doc_id <> b.doc_id
       |   WHERE bit_count(xor(${signed("a.u")}, ${signed("b.u")})) <= $maxHamming),
       |$summaryTail"""
      .stripMargin
}
