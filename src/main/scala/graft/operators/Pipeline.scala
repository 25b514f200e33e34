package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.functions.TextFunctions._
import graft.operators.Barrier.BarrierOps

/** Corpus-curation operators for a large-scale training-data pipeline:
  * repetition/quality gating, PII redaction, benchmark decontamination,
  * deterministic mixing, and sequence packing.
  *
  * All of these run AFTER dedup in a real pipeline and share its scale
  * posture: narrow per-document transforms where possible, doc_id-keyed
  * aggregates where not, and the one corpus-wide join (decontamination)
  * is against a bounded benchmark set, so it broadcasts.
  */
object Pipeline {

  private def r4(c: Column): Column = floor(c * 10000.0) / 10000.0

  /** Gopher-style repetition/quality gates (word-level: the synthetic and
    * most web corpora carry no layout newlines after normalization):
    * unique-token fraction, top-token fraction, duplicate-bigram fraction,
    * mean token length — plus the composite `keep` decision.
    *
    * Two doc_id-keyed shuffles (token mode via explode→count→max) joined
    * back to the narrow array-side stats; everything partial-aggregates
    * map-side. */
  def gopherStats(docs: DataFrame): DataFrame =
    // barrier: explode (Generate) re-evaluates its child per OUTPUT row —
    // the tokenization chain must be materialized first
    gopherStatsFrom(docs
      .select(col("doc_id"), tokens(preprocess(col("text"))).as("toks"))
      .barrier())

  /** [[gopherStats]] over a pre-tokenized, MATERIALIZED `(doc_id, toks)`
    * table — the fused-curation entry point ([[curate]] shares one
    * tokenization pass across all gates). Caller must pass a
    * checkpointed table (read twice, feeds a Generate). */
  private[graft] def gopherStatsFrom(base: DataFrame): DataFrame = {
    val stats = base.select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_tok"),
      size(array_distinct(col("toks"))).cast("long").as("n_unique"),
      size(shingles(col("toks"), 2)).cast("long").as("n_2g"),
      size(array_distinct(shingles(col("toks"), 2))).cast("long").as("n_2g_unique"),
      length(concat_ws("", col("toks"))).cast("long").as("n_chars"))
    val topTok = base
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
    val n = col("n_tok").cast("double")
    val fracUnique = when(n > 0, col("n_unique").cast("double") / n).otherwise(lit(0.0))
    val topFrac = when(n > 0, coalesce(col("top_c"), lit(0L)).cast("double") / n)
      .otherwise(lit(0.0))
    val dup2g = when(col("n_2g") > 0,
      (col("n_2g") - col("n_2g_unique")).cast("double") / col("n_2g").cast("double"))
      .otherwise(lit(0.0))
    val meanLen = when(n > 0, col("n_chars").cast("double") / n).otherwise(lit(0.0))
    stats.join(topTok, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tok"),
        r4(fracUnique).as("frac_unique"),
        r4(topFrac).as("top_token_frac"),
        r4(dup2g).as("dup_2gram_frac"),
        r4(meanLen).as("mean_token_len"),
        (col("n_tok") >= 10 && col("n_tok") <= 100000 &&
          fracUnique >= 0.5 && topFrac <= 0.2 && dup2g <= 0.3).as("keep"))
      .transform(graft.Determinism.sorted(_)(col("doc_id")))
  }

  /** Corpus-wide boilerplate coverage: the fraction of each document's
    * distinct word `n`-grams that are "boilerplate" — shared by at least
    * `minDf` documents corpus-wide (navigation chrome, license headers,
    * templated spans; the C4-style cross-document repetition signal that
    * per-document gates like [[gopherStats]] cannot see).
    *
    * Shape at scale: one explode of per-doc DISTINCT grams (grams travel
    * as their 64-bit FNV — same trick as `Dedup.jaccardNeighbors`), one
    * hash-shuffle groupBy for document frequency, one equi-join back.
    * Both df sides partial-aggregate map-side; no all-pairs step exists
    * anywhere. Output: (doc_id, n_grams, n_boiler, boiler_frac, keep). */
  def boilerplate(docs: DataFrame, n: Int = 5, minDf: Int = 3,
                  maxFrac: Double = 0.5): DataFrame =
    boilerplateFrom(
      docs.select(col("doc_id"), tokens(preprocess(col("text"))).as("toks")),
      n, minDf, maxFrac)

  /** [[boilerplate]] over a pre-tokenized `(doc_id, toks)` table — the
    * fused-curation entry point. The gram build checkpoints its own
    * derived tables below, so `toksDf` may be a plain projection
    * (standalone) or a shared materialized table ([[curate]]).
    *
    * `hotGrams`: the TRAIN/SERVE seam — pass the frozen hot-gram set
    * `(gh)` built from a corpus snapshot
    * ([[graft.streaming.CurationStream.freezeStats]]) and the df groupBy
    * is skipped; docs score against the frozen statistics. Default
    * (None) computes the hot set from `toksDf` itself — the batch
    * semantics. Verdict arithmetic is ONE code path either way; a gram
    * absent from the frozen set is simply not boilerplate. */
  private[graft] def boilerplateFrom(toksDf: DataFrame, n: Int = 5,
                                     minDf: Int = 3, maxFrac: Double = 0.5,
                                     hotGrams: Option[DataFrame] = None)
      : DataFrame = {
    val grams = toksDf
      .select(col("doc_id"),
        array_distinct(shingles(col("toks"), n)).as("gs"))
      // barrier (Generate re-evaluation) + read twice: df and per-doc join
      .barrier()
      .select(col("doc_id"), explode(col("gs")).as("gram"))
      .select(col("doc_id"), graft.functions.fnv1a64(col("gram")).as("gh"))
      .barrier()
    // the hot set stays un-hinted: it grows with corpus content, and a
    // forced broadcast would fail at the hard limit on a large corpus
    // (AQE still broadcasts it while it is small)
    val hot = hotGrams.getOrElse(
        grams.groupBy(col("gh")).agg(count(lit(1)).as("df"))
          .filter(col("df") >= minDf).select(col("gh")))
      .withColumn("__hot", lit(1))
    val per = grams.join(hot, Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__hot").isNotNull, 1L).otherwise(0L)).as("n_boiler"))
    val frac = when(col("n_grams") > 0,
      col("n_boiler").cast("double") / col("n_grams").cast("double"))
      .otherwise(lit(0.0))
    toksDf.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        r4(frac).as("boiler_frac"),
        (frac <= maxFrac).as("keep"))
      .transform(graft.Determinism.sorted(_)(col("doc_id")))
  }

  /** PII patterns shared with the DuckDB oracle. Deliberately free of
    * alternation with overlapping branches so Java (leftmost-first) and
    * RE2 (leftmost-longest) agree on every match. */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhonePattern = "\\+?\\d{3}[- .]?\\d{3}[- .]?\\d{4}"

  /** PII redaction: emails, IPv4 addresses, phone-shaped numbers replaced
    * by typed placeholders, with per-category match counts (counted on the
    * original text; replacements applied email → ip → phone). Pure narrow
    * transform — regex scan per document, no shuffle. */
  def piiRedact(docs: DataFrame): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailPattern, "[EMAIL]"),
          Ipv4Pattern, "[IP]"),
        PhonePattern, "[PHONE]")
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(Ipv4Pattern)).cast("long").as("n_ips"),
      regexp_count(col("text"), lit(PhonePattern)).cast("long").as("n_phones"),
      redacted.as("redacted_text"))
      .transform(graft.Determinism.sorted(_)(col("doc_id")))
  }

  /** Benchmark decontamination: flag training documents sharing any word
    * `n`-gram with the benchmark/eval set (the GPT-3-style 13-gram
    * overlap check, here parameterized). The benchmark side is bounded by
    * contract (an eval suite, not a corpus), so its distinct gram set
    * broadcasts — the training side never shuffles for the probe; the
    * only shuffle is the per-doc hit count, keyed by doc_id. */
  def decontaminate(training: DataFrame, bench: DataFrame, n: Int = 8): DataFrame = {
    def toks(df: DataFrame) = df.select(col("doc_id"),
      tokens(preprocess(col("text"))).as("toks"))
    decontaminateFrom(toks(training), toks(bench), n)
  }

  /** [[decontaminate]] over pre-tokenized `(doc_id, toks)` tables — the
    * fused-curation entry point. The gram-set build keeps its own
    * barrier below, so the inputs may be plain projections (standalone)
    * or slices of a shared materialized table ([[curate]]).
    *
    * `frozenBenchGrams`: the train/serve seam — a pre-built distinct
    * benchmark gram set `(gram)` frozen by
    * [[graft.streaming.CurationStream.freezeStats]]; when given, `bench`
    * is not read. The broadcast hint is correct either way: the
    * benchmark set is bounded by contract (an eval suite). */
  private[graft] def decontaminateFrom(training: DataFrame,
                                       bench: DataFrame, n: Int = 8,
                                       frozenBenchGrams: Option[DataFrame] =
                                         None): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        array_distinct(shingles(col("toks"), n)).as("grams"))
      // ONE barrier, on the finished gram-set arrays: Generate re-evaluates
      // its child per output row, so the array build must be materialized —
      // but tokenize→shingle→distinct is a single narrow projection, and
      // checkpointing its intermediate token arrays too just doubled the
      // block-manager traffic
      .barrier()
      .select(col("doc_id"), explode(col("grams")).as("gram"))
    val benchGrams = frozenBenchGrams.getOrElse(
      grams(bench).select(col("gram")).distinct())
    val hits = grams(training).join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams")) // grams pre-distinct per doc
    training.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n_shared_grams"), lit(0L)) > 0).as("contaminated"))
      .transform(graft.Determinism.sorted(_)(col("doc_id")))
  }

  /** FUZZY benchmark decontamination: MinHash near-match of training docs
    * against the eval set — the companion to [[decontaminate]]'s exact
    * n-gram overlap, which a light paraphrase or whitespace/punctuation
    * churn defeats (every 8-gram changes, yet the doc is still the
    * benchmark item). Here both sides become MinHash(`numHashes`)
    * signatures over word `shingleLen`-shingles; LSH banding proposes
    * (train, bench) pairs and the matching-signature-position fraction
    * estimates jaccard — `contaminated` = any bench doc with
    * `n_match ≥ minMatch` (est ≥ minMatch/numHashes, default 0.5).
    *
    * Scale shape (the reason this beats pairwise jaccard at 100 TB): the
    * eval suite is bounded by contract, so its banded signature table
    * BROADCASTS — the training corpus never shuffles for candidate
    * generation, and the only shuffle is the per-doc summary aggregate,
    * keyed by doc_id with input ∝ banded matches (rare by construction).
    * Everything after the scan runs on signatures (`numHashes` longs per
    * doc), never document text. One aggregate computes the distinct-
    * partner count and the (n_match desc, bench_id asc) argmax — band
    * duplicates of a pair carry identical n_match, so max-of-struct
    * dedups them for free. Docs with zero shingles (shorter than
    * `shingleLen`) have no gram domain to overlap and are excluded from
    * matching on BOTH sides — they'd otherwise share the sentinel
    * signature and band-collide with every other empty doc.
    *
    * `est_jaccard` is `n_match / numHashes` with numHashes a power of
    * two, so the division is IEEE-exact cross-engine; no grid needed.
    * Reference seam: the exact-overlap contract this estimates is
    * [[decontaminate]]'s (GPT-3-style n-gram decontamination). */
  def decontaminateFuzzy(training: DataFrame, bench: DataFrame,
                         numHashes: Int = 128, bands: Int = 16,
                         shingleLen: Int = 3, minMatch: Int = 64): DataFrame = {
    val r = numHashes / bands
    def sigsOf(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        shingles(tokens(preprocess(col("text"))), shingleLen).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhash_signature(col("sh"), numHashes).as("sig"))
    // bench is read twice (bands + the broadcast estimate side would be
    // one more without carrying sig through the explode) — barrier it;
    // the training side is ONE pass: bands and sig travel together
    val benchBanded = sigsOf(bench).barrier()
      .select(col("doc_id").as("bench_id"), col("sig").as("bsig"),
        posexplode(band_hashes(col("sig"), bands, r)).as(Seq("band", "h")))
    val trainBanded = sigsOf(training)
      .select(col("doc_id"), col("sig"),
        posexplode(band_hashes(col("sig"), bands, r)).as(Seq("band", "h")))
    val matches = aggregate(
      zip_with(col("sig"), col("bsig"), (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    val summary = trainBanded
      .join(broadcast(benchBanded), Seq("band", "h"))
      .select(col("doc_id"), col("bench_id"), matches.cast("long").as("n_match"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("bench_id")).as("n_bench_matches"),
        max(struct(col("n_match"), (-col("bench_id")).as("nb"))).as("best"))
    training.select(col("doc_id"))
      .join(summary, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bench_matches"), lit(0L)).as("n_bench_matches"),
        coalesce(-col("best.nb"), lit(-1L)).as("best_match"),
        (coalesce(col("best.n_match"), lit(0L)).cast("double") / numHashes)
          .as("est_jaccard"),
        (coalesce(col("best.n_match"), lit(0L)) >= minMatch).as("contaminated"))
      .transform(graft.Determinism.sorted(_)(col("doc_id")))
  }

  /** SEMANTIC decontamination — the embedding-space member of the
    * decontamination family ([[decontaminate]] = exact n-gram overlap,
    * [[decontaminateFuzzy]] = MinHash near-match, this = encoder-space
    * cosine): flag training docs whose embedding lands within
    * `threshold` cosine of ANY benchmark doc, catching the
    * reworded/translated contamination that survives both token-level
    * passes (under the stand-in hash encoder, "semantic" = bag-of-token
    * profile; a learned encoder via the
    * [[graft.operators.Inference.BatchEncoder]] seam upgrades it to
    * true paraphrase detection with no dataflow change).
    *
    * Scale shape: the benchmark side is SMALL BY CONTRACT (an eval
    * suite), so its vectors BROADCAST into the one training scan; the
    * per-doc best match is a codegen'd struct-max whose partials
    * collapse map-side (shuffle = one row per training doc, never the
    * pair table). Token-less training docs are outside the comparable
    * universe (zero vector, cosine undefined) and are excluded — the
    * [[graft.operators.Rerank.frozenBase]] rule.
    *
    * Determinism: ties on the max cosine break to the LOWEST bench id
    * (the (sim, −id) struct order); the reported sim floors to the
    * 1e-6 grid; the `contaminated` verdict compares the RAW double
    * against the threshold identically in both engines. */
  def decontaminateSemantic(training: DataFrame, bench: DataFrame,
                            threshold: Double = 0.95): DataFrame = {
    def vecsOf(df: DataFrame, idCol: String): DataFrame = df
      .select(col("doc_id").as(idCol), preprocess(col("text")).as("ct"))
      .filter(size(tokens(col("ct"))) > 0)
      .select(col(idCol), graft.functions.hash_embed(col("ct"), 64).as("v"))
    val tv = vecsOf(training, "doc_id")
    val bv = vecsOf(bench, "bench_id")
      .select(col("bench_id"), col("v").as("bv"))
    val best = tv.crossJoin(broadcast(bv))
      .select(col("doc_id"),
        graft.functions.cosine_similarity(col("v"), col("bv")).as("sim"),
        col("bench_id"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("sim"), (-col("bench_id")).as("nb"))).as("m"))
    tv.select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (floor(coalesce(col("m.sim"), lit(0.0)) * 1e6) / 1e6)
          .as("max_bench_sim"),
        coalesce(-col("m.nb"), lit(-1L)).as("nearest_bench_id"),
        coalesce(col("m.sim") >= threshold, lit(false)).as("contaminated"))
      .transform(graft.Determinism.sorted(_)(col("doc_id")))
  }

  /** Pack-fill audit over [[packSequences]] — the quality table for the
    * packing recipe: per pack, the docs assigned (first-chunk rule: an
    * oversized or boundary-spanning doc attributes its full mass to the
    * pack it STARTS in), the token mass, and the fill ratio vs the
    * budget. fill ≪ 1 on many packs = stream fragmentation (too many
    * shards for the corpus); fill > 1 = spanning docs (expected — the
    * concat-and-chunk contract). One extra bounded aggregate over the
    * packing window's output; no new corpus scan. */
  def packAudit(docs: DataFrame, maxTokens: Int = 2048,
                shards: Int = 8): DataFrame =
    packSequences(docs, maxTokens, shards)
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("token_mass"))
      .select(col("shard"), col("pack_id"), col("n_docs"), col("token_mass"),
        (floor(col("token_mass").cast("double") / maxTokens * 1e4) / 1e4)
          .as("fill"))
      .orderBy(col("pack_id"))

  /** Deterministic multiplicative scramble of the row key into [0, 1000).
    * Public (Knuth) constant; inputs reduced mod 1000003 first so the
    * product stays far from Long overflow — DuckDB errors on BIGINT
    * overflow where the JVM wraps, and the oracle must compute the SAME
    * value. Total over NEGATIVE ids too: the inner `%` is truncated
    * (dividend-signed) identically in both engines, and the final pmod is
    * mirrored in the oracle as `(x % 1000 + 1000) % 1000`. */
  private def scramble(a: Column, b: Column): Column =
    pmod((a % 1000003L) * 2654435761L + (b % 1000003L) * 97L, lit(1000L))

  /** Deterministic per-stratum k-sample: rank rows inside each stratum by
    * the 64-bit FNV of their key and keep the first `k` — a reservoir
    * sample whose "random" order is a hash, so it is reproducible,
    * partition-invariant, and needs no RNG state. The rank-filter shape
    * rewrites into `WindowGroupLimit`, so each map task caps its
    * per-stratum rows before the exchange (like `q_group_topk`). The
    * fixed-RATE companion is [[sampleByHash]]; this is the fixed-SIZE
    * form (eval sets, per-source audits, "give me 10k docs per domain"). */
  def stratifiedSample(events: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("h"), col("event_id"))
    events
      .select(col("event_type"), col("event_id"),
        graft.functions.fnv1a64(col("event_id").cast("string")).as("h"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("event_type"), col("rnk").cast("long").as("rnk"),
        col("event_id"))
      .orderBy(col("event_type"), col("rnk"))
  }

  /** Deterministic stratified sampling for corpus mixing: keep a row iff
    * scramble(user_id, event_id) < ratePerMille(event_type). Pure filter —
    * NO shuffle, no global state; every executor decides locally, which is
    * the only mixing strategy that survives 100 TB. Rates are exact in
    * expectation; the realized per-group rate is reported by the
    * mixing-report query. */
  def sampleByHash(events: DataFrame, ratePerMille: Seq[(String, Int)]): DataFrame = {
    val rate = ratePerMille.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col("event_type") === k, lit(v)).otherwise(acc)
    }
    events.filter(scramble(col("user_id"), col("event_id")) < rate)
  }

  /** Default mixing recipe for the events table: downsample the dominant
    * interaction types, keep the rare ones, drop errors. */
  val DefaultMix: Seq[(String, Int)] = Seq(
    "click" -> 250, "view" -> 50, "purchase" -> 1000,
    "signup" -> 1000, "error" -> 0)

  /** Mixing report: per-type totals, kept counts and realized rate. */
  def mixingReport(events: DataFrame,
                   ratePerMille: Seq[(String, Int)] = DefaultMix): DataFrame = {
    val kept = sampleByHash(events, ratePerMille)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_kept"))
    events.groupBy(col("event_type")).agg(count(lit(1)).as("n_total"))
      .join(kept, Seq("event_type"), "left")
      .select(col("event_type"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        r4(coalesce(col("n_kept"), lit(0L)).cast("double") /
          col("n_total").cast("double")).as("realized_rate"))
      .orderBy(col("event_type"))
  }

  /** Token-budget mixture planning (the DoReMi/Pile-style recipe step):
    * given a total token budget (`budgetFrac` × corpus tokens), split it
    * across sources proportionally to each source's QUALITY MASS (sum of
    * per-doc composite quality scores — more docs of higher quality ⇒
    * more budget) and emit the per-source sampling plan: the keep
    * fraction `min(1, budget·weight / tokens_s)` a hash-sampler (
    * [[sampleByHash]]) then applies, plus the expected token yield.
    *
    * Scale shape: ONE quality-scoring scan with `source` carried through
    * (no corpus-sized join-back), one map-side-combined per-source
    * aggregate, then arithmetic over `n_sources` rows against a
    * broadcast 1-row total — at 100 TB the only corpus-cost is the scan.
    *
    * Determinism: quality scores ride their 1e-4 grid as DECIMAL(9,4),
    * so quality mass and its grand total are exact sums (addition-order
    * invariant); weight/keep_frac are IEEE double ops over those exact
    * inputs, floored to the 1e-6 grid, and `exp_tokens` floors the
    * already-floored keep fraction — every derived column sits on a grid
    * both engines compute identically. */
  def mixBudget(docs: DataFrame, budgetFrac: Double = 0.5): DataFrame = {
    val perSrc = graft.operators.TextAnalysis
      .qualityScores(docs, carry = Seq("source"), sorted = false)
      .select(col("source"), col("n_tokens"),
        col("quality_score").cast("decimal(9,4)").as("q"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("q")).as("qmass"))
    val totals = perSrc
      .agg(sum(col("n_tokens")).as("tot_tokens"), sum(col("qmass")).as("tot_qmass"))
    val weighted = perSrc.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("qmass").cast("double").as("quality_mass"),
        (floor(col("qmass").cast("double") / col("tot_qmass").cast("double")
          * 1e6) / 1e6).as("weight"),
        (lit(budgetFrac) * col("tot_tokens").cast("double")).as("budget"))
    weighted
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("quality_mass"), col("weight"),
        (floor(least(lit(1.0), (col("budget") * col("weight")) /
          col("n_tokens").cast("double")) * 1e6) / 1e6).as("keep_frac"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("quality_mass"), col("weight"), col("keep_frac"),
        floor(col("keep_frac") * col("n_tokens").cast("double"))
          .cast("long").as("exp_tokens"))
      .orderBy(col("source"))
  }

  /** The composed curation funnel: every keep/drop gate this library
    * ships, run as ONE pipeline over the corpus — per-doc verdicts from
    * [[gopherStats]] (repetition/quality), [[graft.operators.TextAnalysis.lmScores]]
    * (bigram-LM perplexity proxy), [[boilerplate]] (cross-doc gram
    * coverage), [[graft.operators.Dedup.windowDupCoverage]] (ExactSubstr
    * span coverage) and [[decontaminate]] (benchmark 8-gram overlap;
    * bench = `doc_id < benchSplit`, the repo-wide convention), conjoined
    * into the final `keep`. Corpus-wide statistics (LM counts, gram df,
    * window occurrence) are computed over the FULL corpus — a curation
    * pass filters documents, it doesn't re-estimate its statistics per
    * split — and the verdict rows cover the training split the
    * decontamination gate is defined on.
    *
    * Scale shape: the preprocess/tokenize regex chain — the funnel's
    * hottest CPU — runs ONCE into a shared materialized token table that
    * all five gates consume (measured warm at sf0.1: 6.3 → 5.4 s for the
    * funnel, 6.0 → 4.7 s for the report; the residual is the gates' own
    * downstream work, whose barriers serialize); each gate keeps its own
    * audited downstream plan (map-side-combined aggregates), and the
    * composition adds only doc_id-keyed joins of 1-bit verdict columns —
    * bytes per doc, nothing rescanned. Output: (doc_id, keep_gopher,
    * keep_lm, keep_boiler, keep_windows, keep_decontam, keep). */
  def curate(docs: DataFrame, benchSplit: Long = 100): DataFrame = {
    val toks = docs
      .select(col("doc_id"), tokens(preprocess(col("text"))).as("toks"))
      .barrier() // ONE tokenization pass, shared by all gates
    // the five gates are independent given the shared token table, but
    // each constructs its own barriered intermediates (eager jobs) —
    // built sequentially they serialize ~10 short jobs; concurrently
    // each gate's jobs back-fill the others' idle task slots
    // (Barrier.concurrently; results bit-identical)
    val Seq(g, l, b, w, d) = Barrier.concurrently[DataFrame](Seq(
      () => gopherStatsFrom(toks)
        .select(col("doc_id"), col("keep").as("keep_gopher")),
      () => TextAnalysis.lmScoresFrom(toks)
        .select(col("doc_id"), col("keep").as("keep_lm")),
      () => boilerplateFrom(toks)
        .select(col("doc_id"), col("keep").as("keep_boiler")),
      () => Dedup.windowDupCoverageFrom(toks)
        .select(col("doc_id"), col("keep").as("keep_windows")),
      () => decontaminateFrom(toks.filter(col("doc_id") >= benchSplit),
          toks.filter(col("doc_id") < benchSplit))
        .select(col("doc_id"), (!col("contaminated")).as("keep_decontam"))))
    g.join(l, Seq("doc_id")).join(b, Seq("doc_id")).join(w, Seq("doc_id"))
      .join(d, Seq("doc_id")) // inner: restricts to the training split
      .select(col("doc_id"), col("keep_gopher"), col("keep_lm"),
        col("keep_boiler"), col("keep_windows"), col("keep_decontam"),
        (col("keep_gopher") && col("keep_lm") && col("keep_boiler") &&
          col("keep_windows") && col("keep_decontam")).as("keep"))
      .transform(graft.Determinism.sorted(_)(col("doc_id")))
  }

  /** Per-gate attrition for [[curate]]: the table an operator reads to
    * see WHERE the corpus went — docs entering each stage and surviving
    * it, gates applied in pipeline order (cheap narrow gates first, the
    * corpus-join gates after). One aggregate over the verdict table →
    * five rows via `stack`; at 100 TB this is a second's work on the
    * 1-bit columns, not a rescan. When the funnel's verdicts are already
    * materialized, use [[curationReportFrom]] — the report should never
    * pay the corpus twice. (The banded dedup paths' `maxBucket` /
    * df-cap recall trades are accounted the same one-table way by
    * [[Dedup.bandingCapAudit]] — cite both in a release review.) */
  def curationReport(docs: DataFrame, benchSplit: Long = 100): DataFrame =
    curationReportFrom(curate(docs, benchSplit))

  /** [[curationReport]] over an already-computed [[curate]] verdict
    * table — the single-pass seam: materialize the verdicts once, read
    * `keep` from them AND aggregate this report, and the funnel runs
    * exactly once for both consumers. */
  def curationReportFrom(verdicts: DataFrame): DataFrame = {
    val c = verdicts
    val g1 = col("keep_gopher")
    val g2 = g1 && col("keep_lm")
    val g3 = g2 && col("keep_boiler")
    val g4 = g3 && col("keep_windows")
    val g5 = g4 && col("keep_decontam")
    def s(cond: Column) = sum(when(cond, 1L).otherwise(0L))
    c.agg(count(lit(1)).as("n0"), s(g1).as("s1"), s(g2).as("s2"),
        s(g3).as("s3"), s(g4).as("s4"), s(g5).as("s5"))
      .select(expr(
        "stack(5, " +
          "1L, 'gopher', n0, s1, " +
          "2L, 'lm_score', s1, s2, " +
          "3L, 'boilerplate', s2, s3, " +
          "4L, 'window_dup', s3, s4, " +
          "5L, 'decontaminate', s4, s5) AS (stage, gate, n_in, n_surviving)"))
      .orderBy(col("stage"))
  }

  /** The dataset card: ONE summary row for a corpus release — the
    * numbers a training-data consumer reads before anything else, each
    * drawn from an already-audited pass: size (docs/tokens/vocabulary),
    * exact-duplicate rate ([[graft.operators.Dedup.exactGroups]]),
    * language mix ([[graft.operators.TextAnalysis.languageId]]'s argmax),
    * mean quality ([[graft.operators.TextAnalysis.qualityScores]]),
    * the gopher keep rate and the PII incidence ([[piiRedact]]).
    *
    * Scale/determinism: every constituent is a bounded aggregate over
    * one corpus pass; the single mean over doubles goes through
    * DECIMAL(18,4) (the per-doc scores are already 1e-4-floored, so the
    * cast is exact) because a partial-aggregated double SUM is
    * partition-order-dependent and would break the hash oracle — the
    * same discipline as the money math. The 1-row aggregates cross-join
    * into the card; nothing here adds a corpus pass beyond its source
    * audit. */
  /** Exact-moment Pearson correlation matrix between per-doc curation
    * signals — the signal-REDUNDANCY meta-audit a curation team reads
    * before composing gates (two signals with \|r\| near 1 gate the same
    * documents twice; near 0 they carry independent evidence). Signals:
    * the composite quality score and the char/token entropies, all
    * already on 1e-4 grids.
    *
    * Determinism: the published grid doubles are recovered as exact
    * INTEGERS (`floor(x·1e4 + 0.5)` — the value is within an ulp of the
    * integer, so both engines floor identically), all ten moments
    * (n, Σ, Σ², Σ·cross) accumulate as exact DECIMAL sums of integer
    * products (order-free), and r derives in double from the exact
    * components, floored to 1e-4. Zero-variance signals emit r = 0.
    *
    * Scale shape: two narrow scoring scans joined once on doc_id (the
    * `q_curate` composition rule), then ONE aggregate produces every
    * pair's moments in a single pass — the 3-row matrix is assembled
    * from that one row, no per-pair re-scan. */
  def signalCorrelation(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityScores(docs, sorted = false)
      .select(col("doc_id"), col("quality_score"))
    val e = TextAnalysis.entropyScores(docs)
      .select(col("doc_id"), col("char_entropy"), col("token_entropy"))
    def gi(c: Column) = floor(c * 1e4 + lit(0.5)).cast("long")
    val g = q.join(e, Seq("doc_id"))
      .select(gi(col("quality_score")).as("a"),
        gi(col("char_entropy")).as("b"),
        gi(col("token_entropy")).as("c"))
    def dsum(c: Column) = sum(c.cast("decimal(38,0)"))
    val m = g.agg(count(lit(1)).as("n"),
      dsum(col("a")).as("sa"), dsum(col("b")).as("sb"),
      dsum(col("c")).as("sc"),
      dsum(col("a") * col("a")).as("saa"),
      dsum(col("b") * col("b")).as("sbb"),
      dsum(col("c") * col("c")).as("scc"),
      dsum(col("a") * col("b")).as("sab"),
      dsum(col("a") * col("c")).as("sac"),
      dsum(col("b") * col("c")).as("sbc"))
    val nD = col("n").cast("decimal(38,0)")
    def r(sx: String, sy: String, sxy: String, sxx: String,
          syy: String): Column = {
      val cov = (nD * col(sxy) - col(sx) * col(sy)).cast("double")
      val vx = (nD * col(sxx) - col(sx) * col(sx)).cast("double")
      val vy = (nD * col(syy) - col(sy) * col(sy)).cast("double")
      when(vx > 0.0 && vy > 0.0,
        floor(cov / sqrt(vx * vy) * 1e4) / 1e4).otherwise(lit(0.0))
    }
    m.select(col("n"), explode(array(
        struct(lit("quality_score").as("signal_a"),
          lit("char_entropy").as("signal_b"),
          r("sa", "sb", "sab", "saa", "sbb").as("r")),
        struct(lit("quality_score").as("signal_a"),
          lit("token_entropy").as("signal_b"),
          r("sa", "sc", "sac", "saa", "scc").as("r")),
        struct(lit("char_entropy").as("signal_a"),
          lit("token_entropy").as("signal_b"),
          r("sb", "sc", "sbc", "sbb", "scc").as("r")))).as("p"))
      .select(col("p.signal_a").as("signal_a"),
        col("p.signal_b").as("signal_b"), col("n"), col("p.r").as("r"))
      .orderBy(col("signal_a"), col("signal_b"))
  }

  def datasetCard(t: graft.sources.Tables): DataFrame =
    datasetCardFrom(t.documents)

  /** [[datasetCard]] over any `(doc_id, text)` corpus: ONE preprocess
    * pass (the card's hottest CPU — the normalization regex chain) is
    * materialized and shared by everything derived from normalized text
    * (token counts, vocabulary, language ID, gopher gates, the exact-dup
    * hash); only the constituents DEFINED on raw text (quality's
    * length/alpha counts, PII regexes) scan `docs` again. */
  def datasetCardFrom(docs: DataFrame): DataFrame = {
    val clean = docs
      .select(col("doc_id"), preprocess(col("text")).as("clean"))
      .barrier() // the ONE normalization pass: tokens + dup hash
    val toks = clean
      .select(col("doc_id"), tokens(col("clean")).as("toks"))
      .barrier() // read thrice: sizes, gates, vocabulary
    cardAssemble(cardDocStats(docs, clean, toks),
      toks.select(explode(col("toks")).as("tk")))
  }

  /** Per-document card contributions — every constituent of the card
    * that is DOCUMENT-LOCAL, one row per doc: token count, normalized-
    * text hash (the exact-dup group key), language-ID verdict, quality
    * score, gopher keep and PII incidence. This is the micro-batch unit
    * of the card: contributions are corpus-independent, so a stream can
    * append them per batch ([[graft.streaming.DatasetCardStream]]) and
    * the release card is one aggregate over the store — only the
    * vocabulary and dup-group counts need their distinct-key tables,
    * which the stream accumulates the same append-only way. `cleanDf`
    * `(doc_id, clean)` and `toksDf` `(doc_id, toks)` must be
    * materialized (each feeds multiple consumers). */
  private[graft] def cardDocStats(docs: DataFrame, cleanDf: DataFrame,
                                  toksDf: DataFrame): DataFrame = {
    val lang = TextAnalysis.languageIdFrom(toksDf)
      .select(col("doc_id"), (col("predicted_lang") === "en").as("is_en"))
    val qual = TextAnalysis.qualityScores(docs)
      .select(col("doc_id"), col("quality_score"))
    val goph = gopherStatsFrom(toksDf)
      .select(col("doc_id"), col("keep").as("keep_gopher"))
    val pii = piiRedact(docs)
      .select(col("doc_id"),
        (col("n_emails") + col("n_ips") + col("n_phones") > 0).as("has_pii"))
    toksDf.select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"))
      .join(cleanDf.select(col("doc_id"),
        md5(col("clean").cast("binary")).as("text_hash")), Seq("doc_id"))
      .join(lang, Seq("doc_id")).join(qual, Seq("doc_id"))
      .join(goph, Seq("doc_id")).join(pii, Seq("doc_id"))
  }

  /** The one-row card assembled from [[cardDocStats]] rows plus a token
    * table (deduped here, so redundant appends are harmless).
    *
    * Scale/determinism: bounded aggregates over the per-doc stats; the
    * vocabulary and dup-group counts go through TWO-LEVEL exact
    * distincts — `distinct()` spreads the key hash across shuffle
    * partitions (map-side partial dedup, then per-partition counts),
    * where a bare `count_distinct` funnels every distinct key into ONE
    * final hash table (the card's measured 12.6×-for-10× scaler before
    * this split). The quality mean goes through DECIMAL(18,4) (the
    * per-doc scores are 1e-4-floored, so the cast is exact) because a
    * partial-aggregated double SUM is partition-order-dependent and
    * would break the hash oracle — the money-math discipline. */
  private[graft] def cardAssemble(stats: DataFrame,
                                  tokens: DataFrame): DataFrame = {
    val basic = stats.agg(count(lit(1)).as("n_docs"),
      sum(col("n_toks")).cast("long").as("n_tokens"))
    val vocab = tokens.select(col("tk"))
      .distinct().agg(count(lit(1)).as("vocab_size"))
    val dup = stats.select(col("text_hash")).distinct()
      .agg(count(lit(1)).as("__groups"))
      .crossJoin(stats.agg(count(lit(1)).as("__docs")))
      .select(r4(lit(1.0) - col("__groups").cast("double") /
        col("__docs").cast("double")).as("exact_dup_rate"))
    val rates = stats.agg(
        sum(when(col("is_en"), 1L).otherwise(0L)).as("__en"),
        sum(col("quality_score").cast("decimal(18,4)")).as("__qs"),
        sum(when(col("keep_gopher"), 1L).otherwise(0L)).as("__k"),
        sum(when(col("has_pii"), 1L).otherwise(0L)).as("__p"),
        count(lit(1)).as("__n"))
      .select(
        r4(col("__en").cast("double") / col("__n").cast("double"))
          .as("frac_en"),
        r4(col("__qs").cast("double") / col("__n").cast("double"))
          .as("mean_quality"),
        r4(col("__k").cast("double") / col("__n").cast("double"))
          .as("gopher_keep_rate"),
        r4(col("__p").cast("double") / col("__n").cast("double"))
          .as("pii_doc_frac"))
    basic.crossJoin(vocab).crossJoin(dup).crossJoin(rates)
  }

  /** Release-to-release dataset-card diff — the governance family's
    * release summary: ONE row diffing two [[datasetCardFrom]] cards
    * (doc/token/vocabulary growth on the 1e-4 grid, zero-guarded; dup
    * rate, language mix, quality, gopher keep and PII fraction as raw
    * deltas of the cards' already-1e-4-floored rates, so both engines
    * subtract identical doubles). Served from the two 1-row cards via a
    * broadcast-trivial cross join — ZERO corpus passes beyond the cards
    * themselves, which each release computes once anyway. */
  def cardDiff(baseCard: DataFrame, currentCard: DataFrame): DataFrame = {
    def growth(cur: Column, base: Column): Column =
      when(base > 0L,
        floor(cur.cast("double") / base.cast("double") * 1e4) / 1e4)
        .otherwise(0.0)
    val b = baseCard.select(
      baseCard.columns.map(c => col(c).as(s"${c}_b")).toSeq: _*)
    val c = currentCard.select(
      currentCard.columns.map(c => col(c).as(s"${c}_c")).toSeq: _*)
    b.crossJoin(c).select(
      col("n_docs_b").as("n_docs_base"),
      col("n_docs_c").as("n_docs_current"),
      growth(col("n_docs_c"), col("n_docs_b")).as("doc_growth"),
      col("n_tokens_b").as("n_tokens_base"),
      col("n_tokens_c").as("n_tokens_current"),
      growth(col("n_tokens_c"), col("n_tokens_b")).as("token_growth"),
      col("vocab_size_b").as("vocab_size_base"),
      col("vocab_size_c").as("vocab_size_current"),
      growth(col("vocab_size_c"), col("vocab_size_b")).as("vocab_growth"),
      (col("exact_dup_rate_c") - col("exact_dup_rate_b")).as("dup_rate_delta"),
      (col("frac_en_c") - col("frac_en_b")).as("frac_en_delta"),
      (col("mean_quality_c") - col("mean_quality_b")).as("mean_quality_delta"),
      (col("gopher_keep_rate_c") - col("gopher_keep_rate_b"))
        .as("gopher_keep_delta"),
      (col("pii_doc_frac_c") - col("pii_doc_frac_b")).as("pii_frac_delta"))
  }

  /** Sequence packing: assign documents to fixed-token-budget packs by
    * cumulative token offset, sharded so the running sum is a per-shard
    * window (one shuffle on the shard key, each shard packs
    * independently — exactly how packing parallelizes on a cluster; a
    * global single-partition cumsum would not). Documents larger than
    * `maxTokens` still occupy their pack span (real packers split them;
    * the assignment stays deterministic either way). */
  /** Materialize the packed corpus as training shards: one directory per
    * shard, rows clustered by (pack_id, doc_id) inside the files so a
    * dataloader streams each pack contiguously. One shuffle (the packing
    * window's partitioning, reused for the write) — the sink side of
    * [[packSequences]]. */
  def writeShards(docs: DataFrame, path: String, maxTokens: Int = 2048,
                  shards: Int = 8): Unit =
    packSequences(docs, maxTokens, shards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("pack_id"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  def packSequences(docs: DataFrame, maxTokens: Int = 2048,
                    shards: Int = 8): DataFrame = {
    val base = docs.select(
      col("doc_id"),
      pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
      bpeTokenCount(col("text")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    base
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("cum_tokens"),
        (col("shard") * 1000000L +
          floor((col("cum_tokens") - col("n_tokens")).cast("double") / maxTokens)
            .cast("long")).as("pack_id"))
      .transform(graft.Determinism.sorted(_)(col("doc_id")))
  }

  /** Padding-waste audit for length-bucketed batching — the planning
    * companion to [[packSequences]]: when sequences batch at power-of-two
    * boundaries (the fixed-shape-kernel convention), how much of each
    * bucket's padded token volume is padding? Per bucket (smallest power
    * of two ≥ the doc's BPE-ish token count; empty docs land in bucket
    * 1): doc count, true token mass, padded volume at the bucket
    * boundary, and the padding fraction — the table that says whether
    * bucketing is fine or packing ([[packSequences]]) is worth its
    * shuffle.
    *
    * Scale shape: ONE corpus scan collapses to a (token-count → doc
    * count) table via a map-side-combined groupBy — distinct lengths are
    * bounded by the longest document, not the corpus — and everything
    * after (the non-equi min-join against 33 broadcast powers of two,
    * the per-bucket rollup) runs on that bounded table. The waste ratio
    * divides two longs as doubles identically in both engines and rides
    * the 1e-4 floor grid. */
  def lengthBuckets(docs: DataFrame): DataFrame = {
    val pows = docs.sparkSession.range(0, 33)
      .select(expr("shiftleft(1L, cast(id as int))").as("bucket_max"))
    val byLen = docs
      .select(bpeTokenCount(col("text")).cast("long").as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("c"))
    val padded = col("n_docs") * col("bucket_max")
    byLen
      .join(broadcast(pows), col("bucket_max") >= greatest(col("n"), lit(1L)))
      .groupBy(col("n"), col("c"))
      .agg(min(col("bucket_max")).as("bucket_max"))
      .groupBy(col("bucket_max"))
      .agg(sum(col("c")).as("n_docs"),
        sum(col("n") * col("c")).as("sum_tokens"))
      .select(col("bucket_max"), col("n_docs"), col("sum_tokens"),
        padded.as("padded_tokens"),
        (floor((padded - col("sum_tokens")).cast("double")
          / padded.cast("double") * 1e4) / 1e4).as("waste_frac"))
      .orderBy(col("bucket_max"))
  }

  /** T5-style span-corruption accounting: deterministically select
    * ~15% of each document's token spans (span = 3 consecutive tokens),
    * collapse every selected span to ONE sentinel, and report the
    * numbers a seq2seq data builder budgets with — input length after
    * corruption is `n_tok - n_masked + n_spans`, target length is
    * `n_masked + n_spans` — plus a fingerprint of the corrupted stream
    * so two engines (or two runs) can assert they built the SAME
    * examples.
    *
    * Span selection is a pure integer hash of (doc_id, span index):
    * `h = ((doc_id·1000003 + s) mod 2^31-1) · 2654435761 mod 2^32`,
    * masked iff `h mod 100 < 15` — stateless, reproducible, and exactly
    * replayable in ANSI SQL (every intermediate fits a signed 64-bit
    * integer: the multiplicand is < 2^31, the multiplier < 2^32, the
    * product < 2^63). The fingerprint is the FNV-1a of the corrupted
    * token stream joined by single spaces, the [[TextAnalysis]]
    * fingerprint convention.
    *
    * Scale shape: ZERO shuffle — like `text_diversity`, every output is
    * a per-document statistic, one narrow map-side projection over the
    * corpus scan (HOFs over the in-row token array, no explode). */
  def maskSpans(docs: DataFrame, spanLen: Int = 3,
                pctMasked: Int = 15): DataFrame = {
    require(spanLen >= 1 && pctMasked >= 0 && pctMasked <= 100,
      "spanLen ≥ 1, pctMasked in [0,100]")
    val L = lit(spanLen.toLong)
    val toks = tokens(preprocess(col("text")))
    val n = size(col("toks")).cast("long")
    val spanCnt = ceil(n.cast("double") / spanLen.toDouble).cast("long")
    // span indices 0..spanCnt-1; sequence(0,-1) would DESCEND, so empty
    // docs take the explicit empty array
    val spanIdx = when(col("n_tok") === 0L,
      array().cast("array<bigint>"))
      .otherwise(sequence(lit(0L), col("span_cnt") - 1L))
    def maskPred(s: Column): Column =
      (((col("doc_id") * 1000003L + s) % 2147483647L) * 2654435761L
        % 4294967296L % 100L) < lit(pctMasked.toLong)
    // per-span length: full spanLen except a short final remainder
    def spanSz(s: Column): Column = least(L, col("n_tok") - s * L)
    val nMasked = aggregate(col("masked"), lit(0L),
      (acc, s) => acc + spanSz(s))
    // corrupted stream: masked span → one sentinel, kept span → its
    // tokens (slice is 1-based and clamps at the array end)
    val corrupted = array_join(flatten(transform(col("spans"), s =>
      when(maskPred(s), array(lit("<x>")))
        .otherwise(slice(col("toks"), (s * L + 1L).cast("int"),
          lit(spanLen))))), " ")
    docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"), n.as("n_tok"))
      .select(col("doc_id"), col("toks"), col("n_tok"),
        spanCnt.as("span_cnt"))
      .select(col("doc_id"), col("toks"), col("n_tok"),
        spanIdx.as("spans"))
      .select(col("doc_id"), col("toks"), col("n_tok"), col("spans"),
        filter(col("spans"), maskPred(_)).as("masked"))
      .select(col("doc_id"), col("n_tok"),
        nMasked.as("n_masked"),
        size(col("masked")).cast("long").as("n_spans"),
        fnv1a64(corrupted).as("fp"))
      .select(col("doc_id"), col("n_tok"), col("n_masked"),
        col("n_spans"),
        when(col("n_tok") === 0L, lit(0.0))
          .otherwise(expr("(n_masked * 10000) DIV n_tok")
            .cast("double") / 1e4).as("mask_ratio"),
        col("fp"))
      .transform(graft.Determinism.sorted(_)(col("doc_id")))
  }

  /** Cohen's-kappa agreement matrix between the [[curate]] funnel's five
    * binary gates — the CATEGORICAL twin of [[signalCorrelation]] (Pearson
    * sees redundancy between continuous signals; this sees it between the
    * keep/drop VERDICTS, chance-corrected — two gates with raw agreement
    * 0.95 but kappa near 0 agree only because both pass almost
    * everything, and the second gate buys nothing). The table a curation
    * team reads before paying for a gate the funnel already has.
    *
    * Determinism: all 16 moments (n, five verdict sums, ten pairwise
    * both-keep sums of 0/1 products) accumulate as exact LONG counts in
    * ONE aggregate; the marginal products go through DECIMAL(38,0) (n²
    * overflows long past ~3e9 rows); po, pe and kappa derive in double
    * from exact components with identical operation order in both
    * engines, po floored to 1e-6 and kappa to 1e-4. Degenerate
    * marginals (pe = 1: both gates constant and equal) emit kappa 0.
    *
    * Scale shape: one pass over the verdict table (1-bit columns — at
    * 100 TB this reads bytes per doc, not text), 16 map-side-combined
    * sums to a single row, the 10-pair matrix exploded from that row.
    * Never a per-pair re-scan. */
  def gateAgreement(docs: DataFrame, benchSplit: Long = 100): DataFrame =
    gateAgreementFrom(curate(docs, benchSplit))

  /** [[gateAgreement]] over an already-materialized [[curate]] verdict
    * table (the `curationReportFrom` seam: the funnel runs once for all
    * its consumers). */
  def gateAgreementFrom(verdicts: DataFrame): DataFrame = {
    val gates = Seq("gopher" -> "keep_gopher", "lm" -> "keep_lm",
      "boiler" -> "keep_boiler", "windows" -> "keep_windows",
      "decontam" -> "keep_decontam")
    val bits = verdicts.select(gates.map { case (short, c) =>
      col(c).cast("long").as(short) }: _*)
    val pairs = for {
      i <- gates.indices; j <- gates.indices if i < j
    } yield (gates(i)._1, gates(j)._1)
    val moments = bits.agg(
      count(lit(1)).as("n"),
      gates.map { case (s, _) => sum(col(s)).as(s"s_$s") } ++
        pairs.map { case (a, b) =>
          sum(col(a) * col(b)).as(s"s_${a}_$b") }: _*)
    def kappaStruct(a: String, b: String): Column = {
      val n = col("n")
      val nD = n.cast("decimal(38,0)")
      val sx = col(s"s_$a")
      val sy = col(s"s_$b")
      val sxy = col(s"s_${a}_$b")
      // n_agree = n11 + n00 = 2·sxy + n − sx − sy (exact longs)
      val agree = lit(2L) * sxy + n - sx - sy
      val poD = agree.cast("double") / n.cast("double")
      // pe·n² = sx·sy + (n−sx)(n−sy) — DECIMAL: n² overflows long
      val peNum = (sx.cast("decimal(38,0)") * sy.cast("decimal(38,0)") +
        (nD - sx.cast("decimal(38,0)")) * (nD - sy.cast("decimal(38,0)")))
      val peD = peNum.cast("double") / (n.cast("double") * n.cast("double"))
      struct(lit(a).as("gate_a"), lit(b).as("gate_b"),
        agree.as("n_agree"),
        (floor(poD * 1e6) / 1e6).as("po"),
        when(peD < 1.0, floor((poD - peD) / (lit(1.0) - peD) * 1e4) / 1e4)
          .otherwise(lit(0.0)).as("kappa"))
    }
    moments
      .select(col("n"), explode(array(pairs.map {
        case (a, b) => kappaStruct(a, b) }: _*)).as("p"))
      .select(col("p.gate_a").as("gate_a"), col("p.gate_b").as("gate_b"),
        col("n"), col("p.n_agree").as("n_agree"), col("p.po").as("po"),
        col("p.kappa").as("kappa"))
      .orderBy(col("gate_a"), col("gate_b"))
  }
}
